"""SCD2 intervalization, robots longest-prefix policy and containment
pairs: kernel edges (change runs, cross-bucket keys, open intervals;
longest-match overwrite; seeded excerpt direction) and oracle parity of
the registered queries at smoke scale."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.pipelines import webhistory as wh
from pyofs_ray.registry import ORACLES, QUERIES
from pyofs_ray.stages.scd import scd2_intervals

from .conftest import SF_SMOKE, assert_matches_oracle, make_duckdb


def _snaps(rows):
    k, ts, fp = zip(*rows)
    return ray.data.from_arrow(pa.table({
        "page_key": pa.array(k, pa.int64()),
        "epoch": pa.array(ts, pa.int64()),
        "fp": pa.array(fp, pa.string()),
        "url": pa.array([f"u{x}" for x in k])}))


def test_scd2_intervals_runs_and_open_end():
    # key 1: A A B B -> (A,0,2),(B,2,open); key 65 (same bucket mod 64 as
    # key 1): constant -> one open interval; key 2: changes every epoch
    ds = _snaps([(1, 0, "A"), (1, 1, "A"), (1, 2, "B"), (1, 3, "B"),
                 (65, 0, "C"), (65, 1, "C"),
                 (2, 0, "X"), (2, 1, "Y"), (2, 2, "Z")])
    out = (scd2_intervals(ds, key_col="page_key", ts_col="epoch",
                          fp_col="fp", carry=("url",), num_buckets=4,
                          sentinel=999)
           .to_pandas().sort_values(["page_key", "valid_from"])
           .reset_index(drop=True))
    got = list(map(tuple, out[["page_key", "fp", "valid_from",
                               "valid_to"]].itertuples(index=False)))
    assert got == [(1, "A", 0, 2), (1, "B", 2, 999),
                   (2, "X", 0, 1), (2, "Y", 1, 2), (2, "Z", 2, 999),
                   (65, "C", 0, 999)]
    assert list(out.url) == ["u1", "u1", "u2", "u2", "u2", "u65"]


def test_scd2_reverted_fingerprint_reopens_interval():
    # A -> B -> A is three intervals, not a merged A
    ds = _snaps([(7, 0, "A"), (7, 1, "B"), (7, 2, "A")])
    out = (scd2_intervals(ds, key_col="page_key", ts_col="epoch",
                          fp_col="fp", num_buckets=2)
           .to_pandas().sort_values("valid_from"))
    assert list(out.fp) == ["A", "B", "A"]
    assert list(out.valid_to) == [1, 2, 999]


def test_robots_longest_prefix_wins():
    out = wh.robots_policy(SF_SMOKE).to_pandas()
    assert len(out) == 500
    # python reference: longest matching prefix of the url's path
    rules = sorted(wh.ROBOTS_RULES, key=lambda r: len(r[0]), reverse=True)
    for url, matched, allowed in out[["url", "matched_rule",
                                      "allowed"]].itertuples(index=False):
        path = "/p/" + url.rsplit("/", 1)[1]
        want = next(r for r in rules if path.startswith(r[0]))
        assert (matched, allowed) == want, (url, path)
    # the deny prefixes actually fire on this fixture
    assert (out.allowed == 0).any() and (out.allowed == 1).any()


def test_containment_seeded_quotes_directed():
    out = wh.containment_pairs(SF_SMOKE).to_pandas()
    assert len(out) > 0
    quotes = out[out.contained_id >= wh.QUOTE_STRIDE]
    # each seeded excerpt is contained in its OWN host (other word-salad
    # containers of a short quote are legitimate too — the oracle agrees)
    assert len(quotes) > 0
    own = set(map(tuple, quotes[["contained_id",
                                 "container_id"]].itertuples(index=False)))
    hosts_with_quote = {a - wh.QUOTE_STRIDE for a, _ in own}
    assert any((q + wh.QUOTE_STRIDE, q) in own for q in hosts_with_quote)
    hosts_as_contained = out[
        (out.contained_id < wh.QUOTE_STRIDE)
        & (out.container_id == out.contained_id + wh.QUOTE_STRIDE)]
    assert hosts_as_contained.empty  # a 3x-longer host is never 80%-quoted
    # threshold honored exactly
    assert (out.shared * wh.CONTAIN_DEN
            >= wh.CONTAIN_NUM * out.n_contained).all()


def test_webhistory_queries_match_oracle_smoke():
    con = make_duckdb(SF_SMOKE)
    for name in ("scd2_url_history", "robots_policy", "containment_pairs"):
        assert_matches_oracle(QUERIES[name](SF_SMOKE), con, ORACLES[name])


def test_containment_overcap_raises_loudly():
    # exactness contract: a vocabulary-saturated gram (df > bound) must
    # raise, never silently truncate (round-3 ADVICE on jaccard caps)
    import pytest

    orig = wh.CONTAIN_MAX_DF
    wh.CONTAIN_MAX_DF = 1  # every shared gram is now "over cap"
    try:
        with pytest.raises(Exception, match="exactness bound"):
            wh.containment_pairs(SF_SMOKE).materialize()
    finally:
        wh.CONTAIN_MAX_DF = orig


def test_scd2_single_snapshot_key():
    ds = _snaps([(9, 2, "only")])
    out = scd2_intervals(ds, key_col="page_key", ts_col="epoch",
                         fp_col="fp", num_buckets=2).to_pandas()
    assert len(out) == 1
    assert out.valid_from[0] == 2 and out.valid_to[0] == 999


def test_url_revisit_priority_consistent_with_scd2(ray_session):
    """n_changes per url must equal the SCD2 history's version count − 1
    (same seeding arithmetic, independent paths)."""
    from .conftest import SF_SMOKE

    top = wh.url_revisit_priority(SF_SMOKE, k=10_000).to_pandas()
    hist = wh.scd2_url_history(SF_SMOKE).to_pandas()
    versions = hist.groupby("url").size()
    merged = top.set_index("url")
    assert len(merged) == len(versions)
    for url, nv in versions.items():
        assert merged.loc[url, "n_changes"] == nv - 1
    # ordering: n_changes non-increasing, page_key ascending within ties
    nc = top["n_changes"].to_numpy()
    assert (nc[:-1] >= nc[1:]).all()
    pk = top["page_key"].to_numpy()
    same = nc[:-1] == nc[1:]
    assert (pk[:-1][same] < pk[1:][same]).all()
    # revisit interval: unchanged pages wait a full cycle, hot pages don't
    assert (top.loc[top["n_changes"] == 0, "revisit_every"] == 4).all()
    assert (top.loc[top["n_changes"] > 0, "revisit_every"] <= 2).all()
