"""Exact grouped low-quantiles: hand-computed selections (ties, repeated
values, single-row groups), cross-block partial-histogram combining, and
oracle parity at smoke scale."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.stages.quantile import (grouped_low_quantiles,
                                       grouped_low_quantiles_sql)

from .conftest import SF_SMOKE, assert_matches_oracle
from pyofs_ray.registry import QUERIES


def _run(keys, vals, blocks=3):
    tbl = pa.table({"k": pa.array(keys, pa.int64()),
                    "v": pa.array(vals, pa.float64())})
    ds = ray.data.from_arrow(tbl).repartition(blocks)
    out = grouped_low_quantiles(ds, "k", "v").to_pandas()
    return out.sort_values("k").reset_index(drop=True)


def test_hand_values_with_ties():
    # group 1: values 1..4 → n=4; p25: 4cc>=n at v=1; median: 2cc>=4 at
    # v=2; p75: 4cc>=12 at v=3. group 2: all-equal values — every
    # quantile is that value. group 3: single row.
    keys = [1, 1, 1, 1, 2, 2, 2, 3]
    vals = [4.0, 1.0, 3.0, 2.0, 7.5, 7.5, 7.5, -1.25]
    out = _run(keys, vals)
    assert list(out.k) == [1, 2, 3]
    assert list(out.n) == [4, 3, 1]
    assert list(out.p25) == [1.0, 7.5, -1.25]
    assert list(out["median"]) == [2.0, 7.5, -1.25]
    assert list(out.p75) == [3.0, 7.5, -1.25]


def test_low_median_even_count_never_interpolates():
    # n=2 with values 10, 20: low median selects 10 (2*cc >= n at the
    # first value) — never 15.0
    out = _run([5, 5], [20.0, 10.0], blocks=2)
    assert list(out["median"]) == [10.0]


def test_partials_combine_across_blocks():
    # the same (key, value) pair repeated across many blocks must merge
    # its partial counts: 7 copies of v=1 and 3 of v=2 → median 1
    keys = [9] * 10
    vals = [1.0] * 7 + [2.0] * 3
    out = _run(keys, vals, blocks=5)
    assert list(out.n) == [10]
    assert list(out["median"]) == [1.0]
    assert list(out.p75) == [2.0]


def test_events_value_quantiles_oracle(duck_smoke):
    assert_matches_oracle(
        QUERIES["events_value_quantiles"](SF_SMOKE), duck_smoke,
        grouped_low_quantiles_sql("events", "user_id", "value"))


def test_grouped_mode_tie_break_and_cross_block():
    from pyofs_ray.stages.agg import grouped_mode
    # key 1: b×2 vs a×2 — tie broken value-ASC → a; key 2: clear winner
    # spread across blocks so partials must combine
    keys = [1, 1, 1, 1, 2, 2, 2, 2, 2]
    vals = ["b", "a", "b", "a", "z", "z", "z", "y", "y"]
    tbl = pa.table({"k": pa.array(keys, pa.int64()),
                    "v": pa.array(vals)})
    out = (grouped_mode(ray.data.from_arrow(tbl).repartition(4), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(out["mode"]) == ["a", "z"]
    assert list(out.mode_count) == [2, 3]


def test_events_modal_type_oracle(duck_smoke):
    from pyofs_ray.stages.agg import grouped_mode_sql
    assert_matches_oracle(
        QUERIES["events_modal_type"](SF_SMOKE), duck_smoke,
        grouped_mode_sql("events", "user_id", "event_type"))


# ------------------------------------------------------ median abs deviation

def _run_mad(keys, vals, blocks=3):
    from pyofs_ray.stages.quantile import grouped_mad
    tbl = pa.table({"k": pa.array(keys, pa.int64()),
                    "v": pa.array(vals, pa.float64())})
    ds = ray.data.from_arrow(tbl).repartition(blocks)
    return (grouped_mad(ds, "k", "v").to_pandas()
            .sort_values("k").reset_index(drop=True))


def test_mad_hand_values():
    # group 1 (odd n): v=[1,2,10] → med=2 (low-median), devs=[1,0,8] →
    # mad=1. group 2 (even n): v=[1,2,3,4] → med=2, devs=[1,0,1,2]
    # sorted [0,1,1,2], 2cc>=4 at the second value → mad=1 (selected,
    # never interpolated). group 3: all equal → mad=0.
    out = _run_mad([1, 1, 1, 2, 2, 2, 2, 3, 3],
                   [1, 2, 10, 1, 2, 3, 4, 7, 7])
    assert out["n"].tolist() == [3, 4, 2]
    assert out["median"].tolist() == [2.0, 2.0, 7.0]
    assert out["mad"].tolist() == [1.0, 1.0, 0.0]


def test_mad_matches_numpy_reference_cross_block():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 23, 5000)
    vals = np.round(rng.normal(0, 10, 5000), 2)
    out = _run_mad(keys.tolist(), vals.tolist(), blocks=7)

    def lowmed(a):
        a = np.sort(a)
        return a[int(np.ceil(len(a) / 2)) - 1]

    for _, r in out.iterrows():
        g = vals[keys == r["k"]]
        assert r["median"] == lowmed(g)
        assert r["mad"] == lowmed(np.abs(g - lowmed(g)))


def test_event_value_mad_oracle(duck_smoke):
    from pyofs_ray.registry import ORACLES
    assert_matches_oracle(QUERIES["event_value_mad"](SF_SMOKE), duck_smoke,
                          ORACLES["event_value_mad"])
