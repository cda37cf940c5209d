"""As-of join + sliding range-window: oracle parity and adversarial edges
(equal-ts ties, tiebreaks, tolerance boundary, peer rows, fallback path)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from pyofs_ray.pipelines import temporal
from pyofs_ray.registry import ORACLES, QUERIES
from pyofs_ray.stages.temporal import (asof_join, interval_join,
                                       sliding_window_agg)

from .conftest import SF_SMOKE, assert_matches_oracle


def _ts(*vals):
    return pa.array(np.array(vals, dtype="datetime64[us]"))


@pytest.mark.parametrize("name,fn,sql", [
    ("events_asof_order", temporal.events_asof_order,
     temporal.EVENTS_ASOF_SQL),
    ("events_asof_order_tol", temporal.events_asof_order_tol,
     temporal.EVENTS_ASOF_TOL_SQL),
    ("events_sliding_window", temporal.events_sliding_window,
     temporal.EVENTS_SLIDING_SQL),
    ("events_incident_window", temporal.events_incident_window,
     temporal.EVENTS_INCIDENT_SQL),
    ("clicks_nearest_error", temporal.clicks_nearest_error,
     temporal.CLICKS_NEAREST_ERROR_SQL),
])
def test_temporal_oracles(name, fn, sql, duck_smoke):
    assert_matches_oracle(fn(SF_SMOKE), duck_smoke, sql)


def _asof(left, right, **kw):
    out = asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        key="k", left_ts="ts", right_ts="rts",
        payload=["rts", "tb", "pay"], tiebreak="tb", **kw).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def test_asof_equal_ts_and_tiebreak():
    left = pa.table({"event_id": [1, 2], "k": [7, 7],
                     "ts": _ts("2024-01-10", "2024-01-20")})
    # two right rows at the identical ts: max tiebreak must win; a right row
    # exactly AT the left ts is a match (<= semantics)
    right = pa.table({"k": [7, 7, 7], "rts": _ts("2024-01-10", "2024-01-10",
                                                 "2024-01-15"),
                      "tb": [3, 9, 1], "pay": [30, 90, 10]})
    out = _asof(left, right)
    assert out["pay"].tolist() == [90, 10]
    assert out["tb"].tolist() == [9, 1]


def test_asof_unmatched_rows_are_null():
    left = pa.table({"event_id": [1, 2, 3], "k": [1, 2, 3],
                     "ts": _ts("2024-01-10", "2024-01-10", "2024-01-10")})
    # k=1: only future right rows; k=2: no right rows at all; k=3: match
    right = pa.table({"k": [1, 3], "rts": _ts("2024-02-01", "2024-01-01"),
                      "tb": [1, 1], "pay": [11, 33]})
    out = _asof(left, right)
    assert out["pay"].tolist()[:2] == [None, None] or \
        out["pay"].isna().tolist()[:2] == [True, True]
    assert out["pay"].tolist()[2] == 33


def test_asof_tolerance_boundary_is_inclusive():
    day = 86_400_000_000
    left = pa.table({"event_id": [1, 2], "k": [5, 5],
                     "ts": _ts("2024-01-11", "2024-01-12")})
    right = pa.table({"k": [5], "rts": _ts("2024-01-01"),
                      "tb": [1], "pay": [42]})
    # rts == ts - 10d exactly → match; == ts - 11d → outside tolerance
    out = _asof(left, right, tolerance_us=10 * day)
    assert out["pay"].tolist()[0] == 42
    assert out["pay"].isna().tolist()[1]


def test_asof_forward_direction():
    left = pa.table({"event_id": [1, 2], "k": [7, 7],
                     "ts": _ts("2024-01-10", "2024-01-20")})
    # forward: least (rts, tb) with rts >= ts; a row exactly AT ts matches;
    # equal-rts ties pick MIN tiebreak (mirror of backward's max)
    right = pa.table({"k": [7, 7, 7], "rts": _ts("2024-01-10", "2024-01-10",
                                                 "2024-01-25"),
                      "tb": [3, 9, 1], "pay": [30, 90, 10]})
    out = _asof(left, right, direction="forward")
    assert out["pay"].tolist() == [30, 10]


def test_asof_nearest_tie_prefers_backward():
    left = pa.table({"event_id": [1, 2, 3], "k": [7, 7, 7],
                     "ts": _ts("2024-01-10", "2024-01-19", "2024-01-21")})
    right = pa.table({"k": [7, 7], "rts": _ts("2024-01-05", "2024-01-15"),
                      "tb": [1, 2], "pay": [50, 150]})
    # id1: backward 5d vs forward 5d → exact tie, backward (pay=50)
    # id2: nearest is backward 2024-01-15 (4d vs none forward)
    # id3: only backward candidates → 2024-01-15
    out = _asof(left, right, direction="nearest")
    assert out["pay"].tolist() == [50, 150, 150]


def test_asof_nearest_with_tolerance():
    day = 86_400_000_000
    left = pa.table({"event_id": [1, 2], "k": [7, 7],
                     "ts": _ts("2024-01-10", "2024-02-10")})
    right = pa.table({"k": [7, 7], "rts": _ts("2024-01-04", "2024-01-13"),
                      "tb": [1, 2], "pay": [40, 130]})
    # id1: backward 6d vs forward 3d, both within tol=5d → only forward
    #      qualifies (backward exceeds tolerance) → pay 130
    # id2: nearest candidate (backward 28d) exceeds tol=5d → null
    out = _asof(left, right, direction="nearest", tolerance_us=5 * day)
    assert out["pay"].tolist()[0] == 130
    assert out["pay"].isna().tolist()[1]


def test_null_timestamps_and_tiebreaks_raise():
    # NaT views as INT64_MIN (sorts 'very old') and a null tiebreak as
    # INT64_MIN via NaN — both must raise instead of silently diverging
    # from the SQL twins' NULL semantics
    left = pa.table({"event_id": [1], "k": [7],
                     "ts": pa.array([None], pa.timestamp("us"))})
    right = pa.table({"k": [7], "rts": _ts("2024-01-01"),
                      "tb": [1], "pay": [5]})
    with pytest.raises(Exception, match="null"):
        _asof(left, right)
    left_ok = pa.table({"event_id": [1], "k": [7], "ts": _ts("2024-01-02")})
    right_null_tb = pa.table({"k": [7], "rts": _ts("2024-01-01"),
                              "tb": pa.array([None], pa.int64()),
                              "pay": [5]})
    with pytest.raises(Exception, match="null"):
        _asof(left_ok, right_null_tb)


def test_interval_join_multi_tile_no_duplicates():
    hour = 3_600_000_000
    # one interval spanning three 1h tiles; a point in each tile, plus
    # points exactly AT both inclusive endpoints and one just outside
    pts = pa.table({"pid": [1, 2, 3, 4, 5, 6],
                    "ts": _ts("2024-01-01T10:30:00",  # start tile
                              "2024-01-01T11:30:00",  # middle tile
                              "2024-01-01T12:15:00",  # end tile
                              "2024-01-01T10:30:00",  # == start (inclusive)
                              "2024-01-01T12:30:00",  # == end (inclusive)
                              "2024-01-01T12:30:00.000001")})  # outside
    ivs = pa.table({"iid": [9],
                    "s": _ts("2024-01-01T10:30:00"),
                    "e": _ts("2024-01-01T12:30:00")})
    out = interval_join(ray.data.from_arrow(pts), ray.data.from_arrow(ivs),
                        point_ts="ts", start="s", end="e",
                        payload=["iid"], tile_us=hour).to_pandas()
    assert sorted(out["pid"].tolist()) == [1, 2, 3, 4, 5]
    assert (out["iid"] == 9).all()
    # every match appears exactly once despite the 3-tile replication
    assert out["pid"].is_unique


def test_interval_join_empty_sides():
    pts = pa.table({"pid": [1], "ts": _ts("2024-01-01")})
    no_ivs = pa.table({"iid": pa.array([], pa.int64()),
                       "s": pa.array([], pa.timestamp("us")),
                       "e": pa.array([], pa.timestamp("us"))})
    out = interval_join(ray.data.from_arrow(pts),
                        ray.data.from_arrow(no_ivs),
                        point_ts="ts", start="s", end="e",
                        payload=["iid"], tile_us=3_600_000_000).to_pandas()
    # Ray 2.49 cannot carry a schema through an ALL-empty groupby result
    # (see stages/temporal.py) — row count is the contract here
    assert len(out) == 0


def _window(tbl, **kw):
    out = sliding_window_agg(ray.data.from_arrow(tbl), key="k", ts="ts",
                             value_cents="v", **kw).to_pandas()
    return out.sort_values("eid").reset_index(drop=True)


def _window_fixture():
    hour = 3_600_000_000
    # k=1: three peer rows at the same instant + one exactly window-width
    # earlier (inclusive) + one just outside; k=2 independent
    return pa.table({
        "eid": [1, 2, 3, 4, 5, 6],
        "k": [1, 1, 1, 1, 1, 2],
        "ts": _ts("2024-01-01T12:00:00", "2024-01-01T12:00:00",
                  "2024-01-01T12:00:00", "2024-01-01T10:00:00",
                  "2024-01-01T09:59:59.999999", "2024-01-01T12:00:00"),
        "v": [1, 2, 4, 8, 16, 32]}), 2 * hour


def test_sliding_window_peers_and_boundary():
    tbl, win = _window_fixture()
    out = _window(tbl, window_us=win)
    # peers at 12:00 see each other AND the row exactly 2h earlier; the row
    # at 09:59:59.999999 is outside every 12:00 window
    assert out["w_count"].tolist() == [4, 4, 4, 2, 1, 1]
    assert out["w_sum_c"].tolist() == [15, 15, 15, 24, 16, 32]


def test_sliding_window_fallback_matches_packed():
    tbl, win = _window_fixture()
    packed = _window(tbl, window_us=win)
    looped = _window(tbl, window_us=win, pack_limit=1)
    assert packed.equals(looped)


# ------------------------------------------------- pass-time ephemeris (ST5)

def test_pass_windows_basic_and_boundaries():
    from pyofs_ray.stages import ephemeris as eph
    # one full period: exactly N_PASSES rows, strictly increasing
    t0 = eph.EPOCH_US + 5 * eph.PERIOD_US
    out = eph.pass_windows(t0, t0 + eph.PERIOD_US).to_pandas()
    assert len(out) == eph.N_PASSES
    ts = out.sort_values(["period", "pass_idx"]).pass_us.to_numpy()
    assert (np.diff(ts) > 0).all()
    assert (out.period == 5).all()
    # window straddling a period boundary sees both periods' passes
    mid = eph.EPOCH_US + 6 * eph.PERIOD_US
    strad = eph.pass_windows(mid - eph.SPACING_US * 3,
                             mid + eph.SPACING_US * 3).to_pandas()
    assert set(strad.period) == {5, 6}
    # offsets match the generator arithmetic bit-for-bit
    off = eph.pass_offsets_us()
    assert off[0] == 0
    assert off[7] == 7 * eph.SPACING_US + ((49 * 37) % 97) * 1_000_000


def test_pass_windows_empty_interval_yields_next_pass():
    from pyofs_ray.stages import ephemeris as eph
    # a 1s window between two passes is empty -> the reference guarantees
    # >= 1 result: the first pass at/after t0
    off = eph.pass_offsets_us()
    gap_start = eph.EPOCH_US + off[10] + 200_000_000  # 200s after pass 10
    out = eph.pass_windows(gap_start, gap_start + 1_000_000).to_pandas()
    assert len(out) == 1
    assert out.pass_us.iloc[0] == eph.EPOCH_US + off[11]
    assert out.pass_idx.iloc[0] == 11
    with pytest.raises(ValueError):
        eph.pass_windows(gap_start, gap_start)


def test_attach_last_pass_matches_numpy():
    from pyofs_ray.stages import ephemeris as eph
    rng = np.random.default_rng(3)
    base = eph.EPOCH_US + 2 * eph.PERIOD_US
    tus = base + rng.integers(0, 2 * eph.PERIOD_US, 500)
    ev = ray.data.from_arrow(pa.table({
        "event_id": pa.array(np.arange(500, dtype=np.int64)),
        "ts": pa.array(tus.astype(np.int64))}))
    out = (eph.attach_last_pass(ev, ts_col="ts").to_pandas()
           .sort_values("event_id"))
    passes = eph.pass_times_array(1, 4)
    want = passes[np.searchsorted(passes, tus, side="right") - 1]
    assert np.array_equal(out.pass_us.to_numpy(), want)
    assert (out.pass_us <= out.ts_us).all()
    # an event exactly ON a pass maps to that pass
    ev2 = ray.data.from_arrow(pa.table({
        "event_id": pa.array([0], pa.int64()),
        "ts": pa.array([int(passes[100])], pa.int64())}))
    o2 = eph.attach_last_pass(ev2, ts_col="ts").to_pandas()
    assert o2.pass_us.iloc[0] == passes[100]


def test_events_max_concurrency_half_open_boundary(tmp_path):
    # three 300s intervals: A[0,300) B[300,600) C[250,550).
    # A and B touch at t=300 but MUST NOT count as concurrent (half-open);
    # peak is 2 (A+C overlap in [250,300), B+C in [300,550))
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyofs_ray.pipelines.windows import events_max_concurrency

    ts = np.array([0, 300, 250], dtype="datetime64[us]")
    t = pa.table({"event_id": pa.array([1, 2, 3], pa.int64()),
                  "ts": pa.array(ts),
                  "user_id": pa.array([1, 1, 1], pa.int64()),
                  "event_type": pa.array(["x", "x", "x"]),
                  "value": pa.array([0.0, 0.0, 0.0]),
                  "props": pa.array(["", "", ""])})
    ts2 = np.array([0], dtype="datetime64[us]")
    t2 = pa.table({"event_id": pa.array([4], pa.int64()),
                   "ts": pa.array(ts2),
                   "user_id": pa.array([2], pa.int64()),
                   "event_type": pa.array(["y"]),
                   "value": pa.array([0.0]),
                   "props": pa.array([""])})
    # ts values are seconds-scale epoch offsets; window 300s in us —
    # write ts already in us so intervals are [ts, ts+300e6)
    ts3 = np.array([0, 300_000_000, 250_000_000], dtype="datetime64[us]")
    t = t.set_column(1, "ts", pa.array(ts3))
    pq.write_table(pa.concat_tables([t, t2]), tmp_path / "events.parquet")

    got = (events_max_concurrency(str(tmp_path)).to_pandas()
           .set_index("event_type").peak.to_dict())
    assert got == {"x": 2, "y": 1}


def test_events_max_concurrency_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["events_max_concurrency"](SF_SMOKE),
                          duck_smoke, ORACLES["events_max_concurrency"])


# --------------------- round-4 continuation: session pairs + TWA
def test_session_type_pairs_oracle(duck_smoke):
    assert_matches_oracle(QUERIES["session_type_pairs"](SF_SMOKE),
                          duck_smoke, ORACLES["session_type_pairs"])


def test_session_type_pairs_canonical_order():
    df = QUERIES["session_type_pairs"](SF_SMOKE).to_pandas()
    assert (df.type_a < df.type_b).all()       # unordered, canonicalized
    assert (df.n >= 1).all()
    assert not df.duplicated(["type_a", "type_b"]).any()


def test_events_twa_oracle(duck_smoke):
    assert_matches_oracle(QUERIES["events_time_weighted_avg"](SF_SMOKE),
                          duck_smoke, ORACLES["events_time_weighted_avg"])


def test_events_twa_constant_value_is_exact():
    # a user whose events all share one value must have twa == value
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF_SMOKE}/events.parquet",
                      columns=["user_id", "value"]).to_pandas()
    df = QUERIES["events_time_weighted_avg"](SF_SMOKE).to_pandas()
    g = t.dropna().groupby("user_id").value.nunique()
    const_users = set(g[g == 1].index) & set(df.user_id)
    for u in list(const_users)[:5]:
        v = t[t.user_id == u].value.dropna().iloc[0]
        got = df[df.user_id == u].twa.iloc[0]
        assert abs(got - round(v * 100) / 100) < 1e-9
