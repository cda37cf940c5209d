"""Snapshot diff + left-outer bucketed join: kernel edges (identical
snapshots, disjoint snapshots, payload carry-through, cross-bucket keys)
and oracle parity of the registered queries."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from pyofs_ray.registry import ORACLES, QUERIES
from pyofs_ray.stages.diff import snapshot_diff
from pyofs_ray.stages.join import bucketed_hash_join

from .conftest import SF_SMOKE, assert_matches_oracle


def _snap(keys, urls):
    return ray.data.from_arrow(pa.table({
        "page_key": pa.array(keys, pa.int64()),
        "url": pa.array(urls)}))


def test_snapshot_diff_directions():
    a = _snap([1, 2, 3, 65], ["u1", "u2", "u3", "u65"])  # 65 ≡ 1 mod 64
    b = _snap([2, 3, 4], ["u2", "u3", "u4"])
    out = (snapshot_diff(a, b, key="page_key", payload=["url"],
                         num_buckets=4)
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert list(out.url) == ["u1", "u4", "u65"]
    assert list(out.status) == ["removed", "added", "removed"]


def test_snapshot_diff_identical_is_empty():
    a = _snap([5, 6], ["x", "y"])
    b = _snap([6, 5], ["y", "x"])
    assert snapshot_diff(a, b, key="page_key", payload=["url"],
                         num_buckets=2).count() == 0


def test_left_outer_join_null_payload():
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(["a", "b", "c"])}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2], pa.int64()),
        "v": pa.array([20], pa.int64())}))
    out = (bucketed_hash_join(left, right, key="k", num_buckets=2,
                              join_type="left_outer")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert len(out) == 3
    assert out.v.isna().tolist() == [True, False, True]
    assert out.loc[1, "v"] == 20


def test_registered_diff_oracles(duck_smoke):
    for name in ("crawl_diff", "customer_order_totals_outer"):
        assert_matches_oracle(QUERIES[name](SF_SMOKE), duck_smoke,
                              ORACLES[name])


def test_snapshot_diff_modified():
    a = ray.data.from_arrow(pa.table({
        "page_key": pa.array([1, 2, 3], pa.int64()),
        "url": pa.array(["u1", "u2", "u3"]),
        "h": pa.array(["aa", "bb", "cc"])}))
    b = ray.data.from_arrow(pa.table({
        "page_key": pa.array([2, 3, 4], pa.int64()),
        "url": pa.array(["u2", "u3", "u4"]),
        "h": pa.array(["bb", "CHANGED", "dd"])}))
    out = (snapshot_diff(a, b, key="page_key", payload=["url"],
                         compare="h", num_buckets=2)
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert list(out.url) == ["u1", "u3", "u4"]
    assert list(out.status) == ["removed", "modified", "added"]
    assert "h" not in out.columns


def test_crawl_diff_3way_oracle(duck_smoke):
    assert_matches_oracle(QUERIES["crawl_diff_3way"](SF_SMOKE), duck_smoke,
                          ORACLES["crawl_diff_3way"])


def test_snapshot_diff_duplicate_keys_raise():
    import pytest
    a = _snap([1, 1], ["u1", "u1b"])
    b = _snap([2], ["u2"])
    with pytest.raises(Exception, match="repeats key"):
        snapshot_diff(a, b, key="page_key", payload=["url"],
                      num_buckets=1).materialize()


def test_crawl_delta_stats_oracle(duck_smoke):
    assert_matches_oracle(QUERIES["crawl_delta_stats"](SF_SMOKE),
                          duck_smoke, ORACLES["crawl_delta_stats"])
