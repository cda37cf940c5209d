"""PII redaction: kernel edges (multiple hits, adjacency, non-PII
lookalikes) and oracle parity of the seeded corpus query."""

from __future__ import annotations

import pyarrow as pa

from pyofs_ray.pipelines import corpus
from pyofs_ray.stages.text import redact_pii

from .conftest import SF_SMOKE, assert_matches_oracle


def _redact(*texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(list(texts))})
    out = redact_pii(t)
    return (out["redacted_text"].to_pylist(), out["n_emails"].to_pylist(),
            out["n_ips"].to_pylist())


def test_redact_email_and_ip():
    r, ne, ni = _redact("mail a.b+c@x.co.uk or ping 192.168.0.1 twice",
                        "no pii here", "x@y.io and z@w.de")
    assert r[0] == "mail <EMAIL> or ping <IP> twice"
    assert (ne[0], ni[0]) == (1, 1)
    assert r[1] == "no pii here" and (ne[1], ni[1]) == (0, 0)
    assert r[2] == "<EMAIL> and <EMAIL>" and ne[2] == 2


def test_redact_lookalikes_untouched():
    # version strings are not IPv4 (word boundary + 4 octets required);
    # a bare '@' with no domain dot is not an email
    r, ne, ni = _redact("v1.2.3 release", "user@localhost says hi")
    assert r[0] == "v1.2.3 release" and ni[0] == 0
    assert r[1] == "user@localhost says hi" and ne[1] == 0


def test_doc_redact_oracle(duck_smoke):
    assert_matches_oracle(corpus.doc_redact(SF_SMOKE), duck_smoke,
                          corpus.DOC_REDACT_SQL)
