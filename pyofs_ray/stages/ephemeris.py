"""Pass-time ephemeris operators (SURVEY.md ST5 full form).

Reference semantics re-expressed Ray-Data-first:

- `store_viirs_pass_times` (`/root/reference/PyOFS/observation/viirs.py:929-1013`)
  extends a 16-day repeating satellite-pass ephemeris across periods — here
  `pass_windows`, a **periodic-key range generator**: a tiny Dataset of
  period indices flat-expands to per-pass rows (`pass_ts = epoch +
  period*P + offset[i]`), filtered to the query window. The base-period
  offsets are deterministic generator arithmetic (spacing + quadratic
  jitter), so the DuckDB twin regenerates them exactly.
- `get_pass_times` (`viirs.py:1016-1075`) queries passes inside a window,
  guaranteeing at least one result (the reference bumps ``end_index`` when
  the searchsorted range is empty) — mirrored by the ``at_least_one``
  fallback.
- The pass table is SMALL-side by construction (360 rows per 16-day
  period ≈ 8k/year): composing it with an event stream is a broadcast
  ``searchsorted`` lookup inside ``map_batches`` (`attach_last_pass`),
  NOT a shuffle join — the as-of machinery (`stages/temporal.py`) exists
  for large×large; a keyless global as-of against a broadcastable side
  would funnel every row through one bucket.

All timestamps are int64 microseconds (exact arithmetic end to end).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

#: ephemeris epoch: 2023-12-25T00:00:00Z (before every fixture's data)
EPOCH_US = 1_703_462_400_000_000
#: the 16-day repeat period (the reference's VIIRS_PERIOD)
PERIOD_US = 16 * 86_400 * 1_000_000
#: passes per period (the reference appends per-period blocks of 360)
N_PASSES = 360
SPACING_US = PERIOD_US // N_PASSES
#: quadratic jitter (seconds, < spacing) — makes offsets non-uniform like
#: a real orbit file while staying pure integer arithmetic for the twin
JITTER_MOD = 97


def pass_offsets_us() -> np.ndarray:
    """Within-period pass offsets, strictly increasing int64 µs."""
    i = np.arange(N_PASSES, dtype=np.int64)
    return i * SPACING_US + ((i * i * 37) % JITTER_MOD) * 1_000_000


def pass_times_array(k0: int, k1: int) -> np.ndarray:
    """All pass timestamps of periods k0..k1 inclusive (sorted int64 µs) —
    the driver-side/broadcast form (bounded: 360 rows per period)."""
    off = pass_offsets_us()
    ks = np.arange(k0, k1 + 1, dtype=np.int64)
    return (EPOCH_US + ks[:, None] * PERIOD_US + off[None, :]).ravel()


def period_of(t_us: int) -> int:
    """Period index containing t (floor semantics, exact int arithmetic)."""
    return (int(t_us) - EPOCH_US) // PERIOD_US


def pass_windows(t0_us: int, t1_us: int,
                 at_least_one: bool = True) -> ray.data.Dataset:
    """(period, pass_idx, pass_us) rows with t0 <= pass_us < t1.

    Distributed shape: ``ray.data.range`` over period indices →
    ``map_batches`` expanding each period to its 360 passes (a century is
    ~2.3k periods / 820k rows — the generator never materializes more than
    the requested window). ``at_least_one`` mirrors the reference's
    guarantee: an empty window yields the single first pass at/after t0.
    """
    if t1_us <= t0_us:
        raise ValueError("pass_windows: empty interval (t1 <= t0)")
    k0, k1 = period_of(t0_us), period_of(t1_us)
    periods = ray.data.range(k1 - k0 + 1)

    def expand(b: pa.Table) -> pa.Table:
        ks = b["id"].to_numpy(zero_copy_only=False).astype(np.int64) + k0
        off = pass_offsets_us()
        ts = (EPOCH_US + ks[:, None] * PERIOD_US + off[None, :]).ravel()
        idx = np.tile(np.arange(N_PASSES, dtype=np.int64), len(ks))
        kk = np.repeat(ks, N_PASSES)
        m = (ts >= t0_us) & (ts < t1_us)
        return pa.table({"period": pa.array(kk[m]),
                         "pass_idx": pa.array(idx[m]),
                         "pass_us": pa.array(ts[m])})

    out = periods.map_batches(expand, batch_format="pyarrow")
    if at_least_one and out.count() == 0:
        # degenerate window between two passes: the reference widens the
        # searchsorted range by one — emit the first pass >= t0 (period
        # k0 or k0+1; both enumerated, single row, driver-bounded)
        ts = pass_times_array(k0, k1 + 1)
        j = int(np.searchsorted(ts, t0_us))
        k, i = divmod(j, N_PASSES)
        return ray.data.from_arrow(pa.table({
            "period": pa.array([k0 + k], pa.int64()),
            "pass_idx": pa.array([i], pa.int64()),
            "pass_us": pa.array([int(ts[j])], pa.int64())}))
    return out


def attach_last_pass(events: ray.data.Dataset, ts_col: str = "ts",
                     t0_us: int | None = None,
                     t1_us: int | None = None) -> ray.data.Dataset:
    """Attach ``pass_us`` = the latest pass timestamp <= each event's
    timestamp (the reference's "which pass covers this observation"
    query composed as a broadcast as-of lookup).

    The pass table spans one period BEFORE the event window, so every
    event has a predecessor; ``ray.put`` once, ``np.searchsorted`` per
    batch — zero exchanges.
    """
    import ray as _ray
    from ray.data.aggregate import Max, Min

    if t0_us is None or t1_us is None:
        def as_us(b: pa.Table) -> pa.Table:
            col = b[ts_col]
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.int64())
            return pa.table({"_us": col})

        mm = (events.map_batches(as_us, batch_format="pyarrow")
                    .aggregate(Min("_us", alias_name="lo"),
                               Max("_us", alias_name="hi")))
        t0_us, t1_us = int(mm["lo"]), int(mm["hi"])
    ts_ref = _ray.put(pass_times_array(period_of(t0_us) - 1,
                                       period_of(t1_us)))

    def attach(b: pa.Table) -> pa.Table:
        passes = _ray.get(ts_ref)
        col = b[ts_col]
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.int64())
        tus = col.to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.searchsorted(passes, tus, side="right") - 1
        if (j < 0).any():
            raise ValueError("attach_last_pass: event precedes the "
                             "expanded ephemeris window")
        return (b.drop_columns([ts_col])
                 .append_column("ts_us", pa.array(tus))
                 .append_column("pass_us", pa.array(passes[j])))

    return events.map_batches(attach, batch_format="pyarrow")


def attach_passes_within(ds: ray.data.Dataset, window_us: int,
                         t0_us: int, t1_us: int,
                         ts_col: str = "warc_ts") -> ray.data.Dataset:
    """Row × every ephemeris pass within ±``window_us`` of its timestamp
    (the windowed sibling of `attach_last_pass`). The pass table for
    [t0−W, t1+W] broadcasts in the task closure (bounded: 360 rows per
    16-day period); each batch resolves candidates with ONE searchsorted —
    at most the two neighbors can fall inside the window whenever
    2·window < the minimum pass gap, so the per-batch expansion is a
    fixed two-candidate mask, never a join."""
    pt = pass_times_array(period_of(t0_us - window_us),
                          period_of(t1_us + window_us))
    if len(pt) > 1:
        min_gap = int(np.min(np.diff(pt)))
        if 2 * window_us >= min_gap:
            raise ValueError(
                f"attach_passes_within: 2·window ({2 * window_us} µs) ≥ the "
                f"minimum pass gap ({min_gap} µs) — the two-candidate mask "
                "would silently drop matches; use a smaller window or a "
                "join-based attach")

    def attach(b: pa.Table) -> pa.Table:
        ts_arr = b[ts_col]
        if pa.types.is_timestamp(ts_arr.type):
            ts_arr = ts_arr.cast(pa.int64())  # µs
        ts = ts_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(pt, ts)
        outs = []
        for ci in (idx - 1, idx):
            valid = (ci >= 0) & (ci < len(pt))
            cc = np.clip(ci, 0, len(pt) - 1)
            p = pt[cc]
            ok = valid & (np.abs(ts - p) <= window_us)
            outs.append(b.filter(pa.array(ok)).append_column(
                "pass_us", pa.array(p[ok])))
        return pa.concat_tables(outs)

    return ds.map_batches(attach, batch_format="pyarrow",
                          zero_copy_batch=True)
