"""Oracle-parity tests for the relational operator coverage (sf0.001)."""

from __future__ import annotations

import pytest

from pyofs_ray.registry import ORACLES, QUERIES

from .conftest import SF_SMOKE, assert_matches_oracle

REL = ["rel_q1_pricing", "rel_segment_revenue", "rel_topk_orders",
       "rel_distinct_langs", "rel_events_daily", "rel_user_event_means",
       "rel_priority_revenue", "knn_stations"]


@pytest.mark.parametrize("name", REL)
def test_relational_oracle(name, duck_smoke):
    assert_matches_oracle(QUERIES[name](SF_SMOKE), duck_smoke, ORACLES[name])


def test_broadcast_join_semi_anti():
    import pyarrow as pa
    import ray.data

    from pyofs_ray.stages.join import broadcast_join

    left = ray.data.from_arrow(pa.table({"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]}))
    small = pa.table({"k": [2, 4], "w": ["x", "y"]})
    semi = broadcast_join(left, small, keys=["k"], join_type="semi").to_pandas()
    anti = broadcast_join(left, small, keys=["k"], join_type="anti").to_pandas()
    assert sorted(semi.k) == [2, 4]
    assert sorted(anti.k) == [1, 3]
    inner = broadcast_join(left, small, keys=["k"], join_type="inner").to_pandas()
    assert sorted(inner.columns) == ["k", "v", "w"] and len(inner) == 2


def test_new_query_oracles(duck_smoke):
    for name in ("rel_events_ten_min", "quality_filter", "bilinear_cells"):
        assert_matches_oracle(QUERIES[name](SF_SMOKE), duck_smoke, ORACLES[name])


def test_bilinear_weights_sum_to_q2():
    import numpy as np

    from pyofs_ray.core import geom
    from pyofs_ray.stages.interp import Q, _axis_corners

    lon = np.array([-180000, -1, 0, 179999, 42_500], np.int64)
    i0, w0, w1 = _axis_corners(lon + geom.LON_OFFSET, 10, geom.LON_RANGE, 0)
    assert ((w0 + w1) == Q).all()
    n = 1 << 10
    assert i0.min() >= 0 and i0.max() <= n - 2


def test_q6_q3_oracles(duck_smoke):
    for name in ("rel_q6_revenue", "rel_q3_shipping"):
        assert_matches_oracle(QUERIES[name](SF_SMOKE), duck_smoke, ORACLES[name])


def test_round2_query_oracles(duck_smoke):
    for name in ("rel_events_hourly", "ensemble_cell_means", "cell_mean_complete"):
        assert_matches_oracle(QUERIES[name](SF_SMOKE), duck_smoke, ORACLES[name])


def test_timeutil_rounding_and_ranges():
    import numpy as np

    from pyofs_ray.functions.timeutil import (range_daily, range_hourly,
                                              round_to_hour,
                                              round_to_ten_minutes)

    ts = np.array(["2024-03-01T12:29:59", "2024-03-01T12:30:00",
                   "2024-03-01T12:59:59"], dtype="datetime64[us]")
    assert (round_to_hour(ts) == np.datetime64("2024-03-01T12:00:00")).all()
    assert (round_to_hour(ts, "ceil") == np.datetime64("2024-03-01T13:00:00")).all()
    near = round_to_hour(ts, "nearest")
    assert list(near.astype(str)) == ["2024-03-01T12:00:00.000000",
                                      "2024-03-01T13:00:00.000000",
                                      "2024-03-01T13:00:00.000000"]
    assert (round_to_ten_minutes(np.array(["2024-03-01T12:34:56"], "datetime64[us]"))
            == np.datetime64("2024-03-01T12:30:00")).all()
    hrs = range_hourly(np.datetime64("2024-03-01T00:00"), np.datetime64("2024-03-01T06:00"))
    assert len(hrs) == 6 and hrs[1] - hrs[0] == np.timedelta64(3600, "s")
    # descending range when end < start (reference semantics)
    rev = range_daily(np.datetime64("2024-03-05"), np.datetime64("2024-03-01"))
    assert len(rev) == 4 and rev[0] > rev[-1]


def test_sessionize_sorted_equals_map_groups():
    """Scale-form (sort + vectorized + bounded boundary fix-up) must equal
    the per-user map_groups form bit-for-bit at adversarial batch sizes."""
    import numpy as np
    import pandas as pd

    from pyofs_ray.pipelines.windows import sessionize, sessionize_sorted

    ref = (sessionize(SF_SMOKE).to_pandas()
           .sort_values(["user_id", "session_id"]).reset_index(drop=True))
    for bs in (None, 97):
        for em in ("driver", "grouped"):
            got = (sessionize_sorted(SF_SMOKE, batch_size=bs, edge_mode=em)
                   .to_pandas()
                   .sort_values(["user_id", "session_id"]).reset_index(drop=True))
            assert got.equals(ref), f"batch_size={bs} edge_mode={em} diverged"


def test_sessionize_sorted_mega_user_chains(tmp_path):
    """A single user whose sessions span many batches: cross-batch chains
    (including >2-batch chains) must merge with correct ordinals."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyofs_ray.pipelines.windows import (SESSION_GAP_US, sessionize,
                                             sessionize_sorted)

    rng = np.random.default_rng(13)
    rows = []
    t = np.int64(1_700_000_000_000_000)
    for u in (7, 7, 7, 9):  # user 7 dominates; user 9 small
        for _ in range(500 if u == 7 else 20):
            gap = int(rng.choice([60_000_000, SESSION_GAP_US + 1]))
            t += gap
            rows.append((u, t))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["ts"] = df.ts.astype("datetime64[us]")
    d = tmp_path / "sess"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df), d / "events.parquet")
    ref = (sessionize(str(d)).to_pandas()
           .sort_values(["user_id", "session_id"]).reset_index(drop=True))
    for bs in (None, 31, 64):
        for em in ("driver", "grouped"):
            got = (sessionize_sorted(str(d), batch_size=bs, edge_mode=em)
                   .to_pandas()
                   .sort_values(["user_id", "session_id"]).reset_index(drop=True))
            assert got.equals(ref), f"batch_size={bs} edge_mode={em} diverged"


def test_q5_oracle(duck_smoke):
    assert_matches_oracle(QUERIES["rel_q5_regional"](SF_SMOKE), duck_smoke,
                          ORACLES["rel_q5_regional"])


def test_sessionize_sorted_giant_session_and_exact_gap(tmp_path):
    """One session spanning ~17 batches (chain through many single-session
    batches) plus an exact-30-min gap (NOT a break: rule is strictly >)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyofs_ray.pipelines.windows import (SESSION_GAP_US, sessionize,
                                             sessionize_sorted)

    t = np.int64(1_700_000_000_000_000)
    rows = []
    for _ in range(500):          # user 1: one giant session, 1-min gaps
        t += 60_000_000
        rows.append((1, t))
    t += SESSION_GAP_US           # exactly the gap: same session continues
    rows.append((1, t))
    t += SESSION_GAP_US + 1       # strictly greater: new session
    rows.append((1, t))
    for _ in range(5):            # user 2 afterwards
        t += 60_000_000
        rows.append((2, t))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["ts"] = df.ts.astype("datetime64[us]")
    d = tmp_path / "sess2"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df), d / "events.parquet")
    ref = (sessionize(str(d)).to_pandas()
           .sort_values(["user_id", "session_id"]).reset_index(drop=True))
    assert len(ref) == 3  # user 1: 2 sessions (501 + 1 events), user 2: 1
    assert ref.n_events.tolist() == [501, 1, 5]
    for bs in (31, 128):
        for em in ("driver", "grouped"):
            got = (sessionize_sorted(str(d), batch_size=bs, edge_mode=em)
                   .to_pandas()
                   .sort_values(["user_id", "session_id"]).reset_index(drop=True))
            assert got.equals(ref), f"batch_size={bs} edge_mode={em} diverged"


def test_sessionize_sorted_same_timestamp_burst(tmp_path):
    """Bot burst: 100 events at the IDENTICAL microsecond split across many
    batches — content-identical batch keys must not merge distinct batches
    or lose sessions (regression: 2-component batch keys collapsed them)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyofs_ray.pipelines.windows import (SESSION_GAP_US, sessionize,
                                             sessionize_sorted)

    t0 = np.int64(1_700_000_000_000_000)
    rows = [(1, t0)] * 100                    # 100 identical-ts events
    t = t0 + SESSION_GAP_US + 1
    rows += [(1, t + i * 60_000_000) for i in range(5)]   # later session
    rows += [(2, t0)] * 40                    # second bursty user
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["ts"] = df.ts.astype("datetime64[us]")
    d = tmp_path / "burst"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df), d / "events.parquet")
    ref = (sessionize(str(d)).to_pandas()
           .sort_values(["user_id", "session_id"]).reset_index(drop=True))
    assert ref.n_events.tolist() == [100, 5, 40]
    for bs in (None, 16, 37):
        for em in ("driver", "grouped"):
            got = (sessionize_sorted(str(d), batch_size=bs, edge_mode=em)
                   .to_pandas()
                   .sort_values(["user_id", "session_id"]).reset_index(drop=True))
            assert got.equals(ref), f"batch_size={bs} edge_mode={em} diverged:\n{got}"


def test_q3_bloom_prefilter_mode_equal(duck_smoke):
    """The distributed-Bloom prefilter mode must produce the identical Q3
    result (FPs are discarded by the exact join; no false negatives)."""
    from pyofs_ray.pipelines.relational import q3_shipping_priority
    a = q3_shipping_priority(SF_SMOKE).to_pandas()
    b = q3_shipping_priority(SF_SMOKE, bloom=True).to_pandas()
    assert a.equals(b)


def test_distributed_bloom_equals_driver_bloom():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyofs_ray.stages.bloom import (BloomFilter, _bloom_params,
                                        build_bloom_distributed)

    keys = np.arange(0, 50_000, 3, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(8)
    dist = build_bloom_distributed(ds, "k", fpr=0.01)
    ref = BloomFilter(keys, params=_bloom_params(len(keys), 0.01))
    assert np.array_equal(dist.bits, ref.bits) and dist.k == ref.k
    probe = np.arange(100_000, dtype=np.int64)
    got = dist.contains(probe)
    assert got[keys].all()                       # no false negatives
    fp = got[np.setdiff1d(probe, keys)].mean()
    assert fp < 0.03                             # near target FPR


def test_event_value_quantiles_oracle(duck_smoke):
    assert_matches_oracle(QUERIES["event_value_quantiles"](SF_SMOKE),
                          duck_smoke, ORACLES["event_value_quantiles"])


def test_final_mode_grouped_equals_small():
    """The grouped escape hatches must match the coalesced finishes
    exactly (parity with last_per_cell/topk_per_key)."""
    from pyofs_ray.pipelines.flagship import cell_distinct_langs
    from pyofs_ray.pipelines.relational import event_value_quantiles
    a = (cell_distinct_langs(SF_SMOKE).to_pandas()
         .sort_values("cell_id").reset_index(drop=True))
    b = (cell_distinct_langs(SF_SMOKE, final_mode="grouped").to_pandas()
         .sort_values("cell_id").reset_index(drop=True))
    assert a.equals(b)
    qa = (event_value_quantiles(SF_SMOKE).to_pandas()
          .sort_values(["event_type", "q"]).reset_index(drop=True))
    qb = (event_value_quantiles(SF_SMOKE, final_mode="grouped").to_pandas()
          .sort_values(["event_type", "q"]).reset_index(drop=True))
    assert qa.equals(qb)


def test_resample_contour_oracle(duck_smoke):
    """P2 arc-length re-parameterization vs its bit-exact SQL twin."""
    assert_matches_oracle(QUERIES["resample_contour"](SF_SMOKE), duck_smoke,
                          ORACLES["resample_contour"])


def test_hdr_quantile_sketch_accuracy_and_bounded_size(duck_smoke):
    """The HDR log-bucket sketch must (a) bit-match its SQL twin, (b) stay
    within the 2^-QSKETCH_BITS relative-error bound of the exact
    quantiles, (c) keep per-group state bounded by bit width, and (d) be
    monotone (rank-preserving buckets)."""
    import numpy as np
    from pyofs_ray.pipelines.relational import (QSKETCH_BITS, _hdr_bucket_np,
                                                _hdr_rep_np,
                                                event_value_quantiles,
                                                event_value_quantiles_approx)
    assert_matches_oracle(QUERIES["event_value_quantiles_approx"](SF_SMOKE),
                          duck_smoke, ORACLES["event_value_quantiles_approx"])
    exact = (event_value_quantiles(SF_SMOKE).to_pandas()
             .sort_values(["event_type", "q"]).reset_index(drop=True))
    approx = (event_value_quantiles_approx(SF_SMOKE).to_pandas()
              .sort_values(["event_type", "q"]).reset_index(drop=True))
    rel = np.abs(approx.value.to_numpy() - exact.value.to_numpy()) / \
        np.maximum(np.abs(exact.value.to_numpy()), 0.01)
    assert (rel <= 2.0 ** -QSKETCH_BITS + 1e-9).all(), rel.max()
    # bucket function: monotone and invertible to a lower bound
    v = np.unique(np.concatenate([
        np.arange(-100, 101), np.logspace(0, 15, 4000).astype(np.int64),
        -np.logspace(0, 15, 400).astype(np.int64)]))
    v.sort()
    b = _hdr_bucket_np(v)
    assert (np.diff(b) >= 0).all()            # monotone
    reps = _hdr_rep_np(b)
    pos = v > 0
    assert (reps[pos] <= v[pos]).all()        # lower bound
    assert (v[pos] - reps[pos] <= np.maximum(v[pos] >> QSKETCH_BITS, 0)).all()
    # bounded state: buckets for the whole int48 range fit in ~thousands
    assert len(np.unique(b)) < 4000


# ------------------------------------------------- exact trimmed mean

def test_event_value_trimmed_mean_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["event_value_trimmed_mean"](SF_SMOKE),
                          duck_smoke, ORACLES["event_value_trimmed_mean"])


def test_trimmed_mean_histogram_clip_equals_rank_trim():
    """Count-clipping on the histogram must equal trimming by row rank,
    including when the trim boundary lands inside a tie run."""
    import numpy as np
    import pandas as pd
    vals = np.array([1, 2, 2, 2, 2, 3, 3, 9, 9, 50], np.int64)  # n=10, t=1
    # rank-trim reference: drop one lowest, one highest
    ref = np.sort(vals)[1:-1]
    # histogram-clip (the engine kernel's arithmetic)
    uv, cnt = np.unique(vals, return_counts=True)
    cum = cnt.cumsum(); n = cum[-1]; t = n * 10 // 100
    prev = cum - cnt
    kept = np.clip(np.minimum(cum, n - t) - np.maximum(prev, t), 0, None)
    assert int(kept.sum()) == len(ref)
    assert int((uv * kept).sum()) == int(ref.sum())


def test_events_percent_rank_reference(ray_session):
    import numpy as np

    from pyofs_ray.pipelines.relational import events_percent_rank

    out = events_percent_rank(SF_SMOKE).to_pandas()
    c = out["value_cents"].to_numpy()
    n = len(c)
    order = np.sort(c)
    below = np.searchsorted(order, c, side="left")
    want = below / (n - 1)
    assert np.array_equal(out["pr"].to_numpy(), want)
    # ties share a rank; min is 0, max is (n - n_maxties)/(n-1) < 1
    assert out["pr"].min() == 0.0 and out["pr"].max() < 1.0 + 1e-12


def test_events_ntile_shards_equidepth(ray_session):
    """r5: distributed NTILE — shard sizes must be the exact NTILE split
    (first N mod n shards one row bigger), assignment monotone in
    (val_c, event_id)."""
    import numpy as np

    from pyofs_ray.pipelines.relational import events_ntile_shards

    out = (events_ntile_shards(SF_SMOKE, n=16).to_pandas()
           .sort_values(["val_c", "event_id"]).reset_index(drop=True))
    n_rows = len(out)
    assert n_rows > 0
    sizes = out.groupby("shard").size()
    big, small = -(-n_rows // 16), n_rows // 16
    r = n_rows % 16
    assert sorted(sizes.index) == list(range(1, 17))
    assert (sizes.sort_index().to_numpy() ==
            np.array([big] * r + [small] * (16 - r))).all()
    # monotone non-decreasing shard along the total order
    assert (np.diff(out["shard"].to_numpy()) >= 0).all()


def test_events_user_tier_asof(ray_session):
    """r5: temporal SCD2 join — every non-null-user event gets exactly
    the tier valid at its epoch; formula spot-checked row by row."""
    import numpy as np

    from pyofs_ray.pipelines.relational import events_user_tier_asof

    out = events_user_tier_asof(SF_SMOKE).to_pandas()
    assert len(out) > 0
    want = (out["user_id"].to_numpy() * 7
            + out["epoch"].to_numpy() ** 2) % 5
    assert np.array_equal(out["tier"].to_numpy(), want)
    assert out["epoch"].between(0, 3).all()
    assert out["event_id"].is_unique


def test_events_ntile_by_type_equidepth(ray_session):
    """r5: grouped NTILE — within every event_type the shard sizes must
    be the exact per-group NTILE split and monotone in (val_c, id)."""
    import numpy as np

    from pyofs_ray.pipelines.relational import events_ntile_by_type

    out = (events_ntile_by_type(SF_SMOKE, n=8).to_pandas()
           .sort_values(["event_type", "val_c", "event_id"])
           .reset_index(drop=True))
    assert len(out) > 0
    for et, g in out.groupby("event_type"):
        total = len(g)
        big, small, r = -(-total // 8), total // 8, total % 8
        sizes = g.groupby("shard").size().sort_index()
        want = [big] * r + [small] * (8 - r)
        want = [w for w in want if w > 0]
        assert sizes.to_list() == want, et
        assert (np.diff(g["shard"].to_numpy()) >= 0).all(), et


def test_event_value_winsor_mean_properties(ray_session):
    """r5: winsorized mean — clamp preserves counts, bounds are the DISC
    percentiles, and the clamped mean sits between min and max."""
    import numpy as np

    from pyofs_ray.pipelines.relational import (event_value_trimmed_mean,
                                                event_value_winsor_mean)

    w = event_value_winsor_mean(SF_SMOKE)
    t = event_value_trimmed_mean(SF_SMOKE)
    assert len(w) > 0
    # winsorizing PRESERVES n (trimming drops rows)
    assert (w["n"].to_numpy() >= t["kept_n"].to_numpy()).all()
    assert w["winsor_mean"].notna().all()
    # exactness invariant: mean == wsum / (n*100) bitwise
    got = w["wsum_c"].to_numpy() / (w["n"].to_numpy() * 100.0)
    assert np.array_equal(got, w["winsor_mean"].to_numpy())
