"""Per-key analytic window functions (LAG delta, running SUM): oracle
parity at smoke scale plus adversarial kernel edges (key boundaries,
equal-ts tiebreaks, single-row keys, cross-bucket independence)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from pyofs_ray.pipelines import relational
from pyofs_ray.stages.analytic import lag_delta, running_sum

from .conftest import SF_SMOKE, assert_matches_oracle


@pytest.mark.parametrize("fn,sql", [
    (relational.events_lag_delta, relational.EVENTS_LAG_DELTA_SQL),
    (relational.customer_running_revenue,
     relational.CUSTOMER_RUNNING_REVENUE_SQL),
])
def test_analytic_oracles(fn, sql, duck_smoke):
    assert_matches_oracle(fn(SF_SMOKE), duck_smoke, sql)


def _tbl(keys, ts_us, ids, vals=None):
    cols = {
        "id": pa.array(np.asarray(ids, np.int64)),
        "k": pa.array(np.asarray(keys, np.int64)),
        "ts": pa.array(np.asarray(ts_us, "datetime64[us]")),
    }
    if vals is not None:
        cols["v"] = pa.array(np.asarray(vals, np.int64))
    return ray.data.from_arrow(pa.table(cols))


def test_lag_delta_key_boundaries_and_ties():
    # key 1: two rows at the SAME ts — tiebreak id orders them; key 2:
    # single row (null prev); rows arrive shuffled across keys
    ds = _tbl(keys=[1, 2, 1, 1], ts_us=[100, 50, 100, 300],
              ids=[7, 9, 3, 8])
    out = (lag_delta(ds, key="k", ts="ts", tiebreak="id", num_buckets=4)
           .to_pandas().sort_values(["k", "ts", "id"]).reset_index(drop=True))
    # key 1 order: (100,id3) -> (100,id7) -> (300,id8)
    deltas = out["delta_us"].tolist()
    assert np.isnan(deltas[0])          # first row of key 1
    assert deltas[1] == 0               # same-ts successor via tiebreak
    assert deltas[2] == 200
    assert np.isnan(deltas[3])          # key 2's only row
    assert out["prev_ts"].isna().tolist() == [True, False, False, True]


def test_running_sum_segments_and_negatives():
    # negative values + a key whose rows land amid other keys' rows
    ds = _tbl(keys=[5, 6, 5, 6, 5], ts_us=[1, 1, 2, 2, 3],
              ids=[1, 2, 3, 4, 5], vals=[10, -7, -3, 20, 4])
    out = (running_sum(ds, key="k", ts="ts", tiebreak="id", value="v",
                       out="run", num_buckets=3)
           .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True))
    assert out[out.k == 5]["run"].tolist() == [10, 7, 11]
    assert out[out.k == 6]["run"].tolist() == [-7, 13]


def test_lag_delta_bucket_independence():
    # identical timelines on keys that hash to DIFFERENT buckets must not
    # interleave: every key sees only its own history
    n_keys, per = 17, 5
    keys = np.repeat(np.arange(n_keys, dtype=np.int64), per)
    ts = np.tile(np.arange(per, dtype=np.int64) * 10, n_keys)
    ids = np.arange(n_keys * per, dtype=np.int64)
    ds = _tbl(keys, ts, ids)
    out = (lag_delta(ds, key="k", ts="ts", tiebreak="id", num_buckets=4)
           .to_pandas())
    assert len(out) == n_keys * per
    assert int(out["prev_ts"].isna().sum()) == n_keys  # one start per key
    assert set(out["delta_us"].dropna().astype(int)) == {10}


def test_rank_in_key_ties_and_percent():
    from pyofs_ray.stages.analytic import rank_in_key
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "k": pa.array([7, 7, 7, 8], pa.int64()),
        "v": pa.array([50, 50, 10, 99], pa.int64()),
    }))
    out = (rank_in_key(ds, key="k", value="v", tiebreak="id",
                       num_buckets=4)
           .to_pandas().sort_values(["k", "rn"]).reset_index(drop=True))
    # equal values rank by tiebreak id ASC; single-row key → pct 0.0
    assert out[out.k == 7].rn.tolist() == [1, 2, 3]
    assert out[out.k == 7].id.tolist() == [1, 2, 3]
    assert out[out.k == 7].pct_rank.tolist() == [0.0, 0.5, 1.0]
    assert out[out.k == 8].pct_rank.tolist() == [0.0]


def test_histogram_and_rank_oracles(duck_smoke):
    from pyofs_ray.registry import ORACLES, QUERIES
    for name in ("event_value_histogram", "orders_percent_rank"):
        assert_matches_oracle(QUERIES[name](SF_SMOKE), duck_smoke,
                              ORACLES[name])


def test_lag_delta_string_keys():
    # string-keyed window: buckets by hash, segments by the string —
    # keys sharing a bucket must not merge
    from pyofs_ray.stages.analytic import lag_delta as _lag
    tbl = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "host": pa.array(["a.com", "b.com", "a.com", "b.com"]),
        "ts": pa.array(np.array([10, 20, 30, 40], "datetime64[us]")),
    })
    out = (_lag(ray.data.from_arrow(tbl), key="host", ts="ts",
                tiebreak="id", num_buckets=1)   # force shared bucket
           .to_pandas().sort_values(["host", "ts"]).reset_index(drop=True))
    assert out[out.host == "a.com"].delta_us.dropna().tolist() == [20]
    assert out[out.host == "b.com"].delta_us.dropna().tolist() == [20]
    assert int(out.prev_ts.isna().sum()) == 2


def test_null_key_raises():
    import pytest
    from pyofs_ray.stages.analytic import lag_delta as _lag
    tbl = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "k": pa.array([1, None], pa.int64()),
        "ts": pa.array(np.array([10, 20], "datetime64[us]")),
    })
    with pytest.raises(Exception, match="nulls"):
        _lag(ray.data.from_arrow(tbl), key="k", ts="ts",
             tiebreak="id", num_buckets=2).materialize()
