"""URL canonicalization + canonical dedup: per-rule kernel checks, the
no-prefix fallback, and oracle parity of the full seeded pipeline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.pipelines import flagship
from pyofs_ray.registry import QUERIES, ORACLES
from pyofs_ray.stages.canon import canonical_url, canonical_url_dedup

from .conftest import SF_SMOKE, assert_matches_oracle


def _canon(*urls):
    return canonical_url(pa.array(list(urls))).to_pylist()


def test_canonical_rules():
    assert _canon("https://a.com/p/1#frag") == ["https://a.com/p/1"]
    assert _canon("https://a.com/p/1?utm_source=x&utm_campaign=y") == \
        ["https://a.com/p/1"]
    assert _canon("https://a.com/p/1/") == ["https://a.com/p/1"]
    assert _canon("HTTPS://A.COM/P/1") == ["https://a.com/P/1"]  # path kept
    # all rules stacked on one URL
    assert _canon("HTTPS://A.com/P/1/?utm_x=1#f") == ["https://a.com/P/1"]
    # non-utm params survive
    assert _canon("https://a.com/p?id=3") == ["https://a.com/p?id=3"]
    # already-canonical is a fixpoint
    assert _canon("https://a.com/p/1") == ["https://a.com/p/1"]


def test_canonical_no_prefix_passthrough():
    # no scheme://host — canon leaves the string alone (minus suffix rules)
    assert _canon("relative/path#f") == ["relative/path"]


def test_canonical_dedup_keep_first():
    ts = np.array([100, 200, 300], "datetime64[us]")
    tbl = pa.table({
        "url": pa.array(["https://a.com/x", "HTTPS://A.COM/x#f",
                         "https://b.com/y"]),
        "warc_ts": pa.array(ts),
    })
    out = (canonical_url_dedup(ray.data.from_arrow(tbl), num_buckets=4)
           .to_pandas().sort_values("canon_url").reset_index(drop=True))
    assert list(out.canon_url) == ["https://a.com/x", "https://b.com/y"]
    assert list(out.dup_count) == [2, 1]
    assert out.first_ts.astype("int64").tolist() == [100, 300]


def test_dedup_canonical_url_oracle(duck_smoke):
    assert_matches_oracle(QUERIES["dedup_canonical_url"](SF_SMOKE),
                          duck_smoke, ORACLES["dedup_canonical_url"])
