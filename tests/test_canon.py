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


# ------------------------------------------------------- url_policy_filter

def _survivors(urls, **rules):
    from pyofs_ray.stages.canon import url_policy_filter
    ds = ray.data.from_arrow(pa.table({
        "page_key": pa.array(range(len(urls)), pa.int64()),
        "url": pa.array(urls, pa.string())}))
    return list(url_policy_filter(ds, **rules).to_pandas()["url"])


def test_policy_filter_each_rule_kind():
    urls = ["https://h13.example.com/a",      # exact host block
            "https://h23.example.com/b",      # suffix block (…3.example.com)
            "https://h4.example.com/p/10",    # path-prefix block (/p/1…)
            "https://h4.example.com/p/20",    # survives
            "https://h4.example.com/p/2"]     # survives
    got = _survivors(urls, host_exact=("h13.example.com",),
                     host_suffix=("3.example.com",),
                     path_prefix=("/p/1",))
    assert got == urls[3:]


def test_policy_filter_no_rules_is_identity():
    urls = ["https://a.com/x", "https://b.com/y"]
    assert _survivors(urls) == urls


def test_policy_filter_malformed_url_survives():
    # <3 '/'-segments → host '' (SPLIT_PART semantics), path = whole url
    urls = ["nohost", "https://h13.example.com/z"]
    got = _survivors(urls, host_exact=("h13.example.com",))
    assert got == ["nohost"]


def test_url_blocklist_filter_oracle(duck_smoke):
    assert_matches_oracle(QUERIES["url_blocklist_filter"](SF_SMOKE),
                          duck_smoke, ORACLES["url_blocklist_filter"])
