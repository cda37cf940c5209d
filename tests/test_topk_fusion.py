"""Unit tests for exact_topk, coalesced_int_sum_finish and the fused
per-bucket hooks on bucketed_hash_join (left_fn / post)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from pyofs_ray.stages.agg import (coalesced_int_sum_finish, exact_topk,
                                  partial_group_sums)
from pyofs_ray.stages.join import bucketed_hash_join


def _ds(tbl: pa.Table, blocks: int = 4) -> ray.data.Dataset:
    return ray.data.from_arrow(tbl).repartition(blocks)


def test_exact_topk_matches_full_sort_with_boundary_ties():
    rng = np.random.default_rng(7)
    score = rng.integers(0, 5, 200)  # heavy ties — boundary sits mid-tie
    ids = np.arange(200, dtype=np.int64)
    rng.shuffle(ids)
    t = pa.table({"score": pa.array(score, pa.int64()),
                  "id": pa.array(ids), "payload": pa.array(ids * 3)})
    got = exact_topk(_ds(t, 5), ["score", "id"], [True, False], 17).to_pandas()
    order = np.lexsort((ids, -score))[:17]
    assert list(got.id) == list(ids[order])
    assert list(got.payload) == list(ids[order] * 3)
    # output itself arrives sorted (ORDER BY ... LIMIT semantics)
    assert list(got.score) == sorted(got.score, reverse=True)


def test_exact_topk_float_keys_and_k_larger_than_rows():
    t = pa.table({"v": pa.array([1.5, -2.25, 0.0, 3.125], pa.float64()),
                  "id": pa.array([4, 3, 2, 1], pa.int64())})
    got = exact_topk(_ds(t, 2), ["v", "id"], [True, False], 10).to_pandas()
    assert list(got.v) == [3.125, 1.5, 0.0, -2.25]
    assert len(got) == 4


def test_exact_topk_rejects_string_keys():
    t = pa.table({"s": pa.array(["a", "b"]), "id": pa.array([1, 2])})
    with pytest.raises(Exception, match="non-numeric"):
        exact_topk(_ds(t, 1), ["s"], [True], 1).materialize()


def test_coalesced_finish_equals_global_group_sum():
    rng = np.random.default_rng(3)
    k = rng.integers(0, 7, 500)
    v = rng.integers(-100, 100, 500)
    t = pa.table({"k": pa.array(k, pa.int64()), "v_sum": pa.array(v, pa.int64()),
                  "n": pa.array(np.ones(500, np.int64))})
    got = (coalesced_int_sum_finish(_ds(t, 8), ("k",), ("v_sum", "n"))
           .to_pandas().sort_values("k").reset_index(drop=True))
    for i, kk in enumerate(got.k):
        assert got.v_sum[i] == v[k == kk].sum()
        assert got.n[i] == (k == kk).sum()


def test_join_left_fn_having_semantics():
    # left: per-key values; left_fn keeps keys whose bucket-local sum > 10 —
    # sound because the bucket co-locates every row of a key
    left = pa.table({"k": pa.array([1, 1, 2, 3, 3, 3], pa.int64()),
                     "v": pa.array([6, 6, 4, 5, 5, 5], pa.int64())})
    right = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                      "w": pa.array([10, 20, 30, 40], pa.int64())})

    def having(l: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        g = l.group_by("k").aggregate([("v", "sum")])
        g = pa.table({"k": g["k"], "v_sum": g["v_sum"].cast(pa.int64())})
        return g.filter(pc.greater(g["v_sum"], pa.scalar(10, pa.int64())))

    out = bucketed_hash_join(_ds(left, 3), _ds(right, 2), key="k",
                             num_buckets=4, left_fn=having).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert list(out.k) == [1, 3] and list(out.v_sum) == [12, 15]
    assert list(out.w) == [10, 30]


def test_join_post_partial_sums_then_coalesced_finish():
    left = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                     "g": pa.array([0, 0, 1, 1], pa.int64()),
                     "x": pa.array([10, 20, 30, 40], pa.int64())})
    right = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    joined = bucketed_hash_join(
        _ds(left, 2), _ds(right, 2), key="k", num_buckets=3,
        post=lambda t: partial_group_sums(t, ("g",), ("x",),
                                          count_name="n"))
    out = (coalesced_int_sum_finish(joined, ("g",), ("x_sum", "n"))
           .to_pandas().sort_values("g").reset_index(drop=True))
    assert list(out.g) == [0, 1]
    assert list(out.x_sum) == [30, 30]   # k=4 dropped by the inner join
    assert list(out.n) == [2, 1]


def test_join_post_on_anti_join():
    left = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                     "g": pa.array([7, 7, 8, 8], pa.int64()),
                     "x": pa.array([1, 1, 1, 1], pa.int64())})
    right = pa.table({"k": pa.array([2, 4], pa.int64())})
    joined = bucketed_hash_join(
        _ds(left, 2), _ds(right, 1), key="k", num_buckets=2,
        join_type="anti",
        post=lambda t: partial_group_sums(t, ("g",), ("x",),
                                          count_name="n"))
    out = (coalesced_int_sum_finish(joined, ("g",), ("x_sum", "n"))
           .to_pandas().sort_values("g").reset_index(drop=True))
    assert list(out.g) == [7, 8] and list(out.n) == [1, 1]
