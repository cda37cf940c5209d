"""Ordered temporal joins and windows: backward as-of join and sliding
range-window aggregation.

Reference analogue: PyOFS aligns drifting state to field snapshots by
time-nearest selection (`/root/reference/main/tracking/particle_contour.py:322`,
`model/rtofs.py:264` — ``.sel(time=..., method='nearest')``). The backward
as-of join is the ordered-join generalization of that alignment ("the most
recent right row at or before each left timestamp"), and the sliding range
window is its aggregate counterpart; both are first-class operators a
training-data pipeline needs (event ↔ latest-snapshot attribution, rolling
per-key activity features).

Execution model (both operators):

* ONE ``groupby`` exchange on ``key % num_buckets`` — the bucket is the
  scheduling unit, the key is the correctness unit (a key never splits
  across buckets). Same partitioning contract as
  ``join.bucketed_hash_join``; raise ``num_buckets`` ≳ cluster cores.
* Inside each bucket the kernel is fully vectorized numpy — one lexsort +
  ``maximum.accumulate`` (as-of) or one lexsort + two ``searchsorted``
  sweeps over an offset-packed composite axis (window). No per-key Python
  loop, no driver participation.
* Skew: a hot key concentrates its own rows in one bucket task — inherent
  to ordered-per-key semantics (the key's full history must meet one
  kernel). Salting does not apply; the mitigation is more buckets so other
  keys do not queue behind the hot one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


# packed-axis capacity for the sliding-window kernel: span × #keys above
# this falls back to the per-key-slice path (2^62 keeps headroom below
# int64 overflow); a parameter so tests can force the fallback
_PACK_LIMIT = 1 << 62


# Ray 2.49 quirk: a groupby partition holding no groups emits an empty
# block with NO schema, and map_batches never runs on empty blocks, so an
# ALL-empty join result cannot carry column types out of the pipeline
# (`to_pandas()` yields a column-less frame). Harmless on real corpora
# (results are non-empty); degenerate-input tests assert row counts only.


def _ts_i64(col: pa.ChunkedArray, name: str = "ts") -> np.ndarray:
    """timestamp[us] (or int64) column → int64 numpy, zero-copy wherever
    Arrow allows it. Nulls raise: NaT would view as INT64_MIN and silently
    sort as 'very old' where the SQL twins exclude NULL comparisons."""
    if col.null_count:
        raise ValueError(f"temporal operator: column {name!r} contains "
                         "null timestamps — filter or fill them upstream")
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(a.to_numpy(zero_copy_only=False)).view(np.int64)


# --------------------------------------------------------------- as-of join
def _match_backward(lk: np.ndarray, lt: np.ndarray, rk: np.ndarray,
                    rt: np.ndarray, rtb: np.ndarray,
                    tolerance_us: int | None) -> np.ndarray:
    """Backward as-of matcher: per left row, the index of the right row
    with the greatest ``(rt, rtb)`` such that ``rk == lk`` and
    ``rt <= lt`` (and ``rt >= lt - tolerance_us`` when set); -1 if none.

    Concatenate both sides, lexsort ``(key, ts, side, tiebreak)`` with
    right-before-left at equal ts, then ``maximum.accumulate`` of right
    positions — O(n log n), no per-key loop. Forward matching is this
    function on negated ``lt``/``rt``/``rtb`` (min becomes max).
    """
    nl, nr = len(lk), len(rk)
    if nl == 0 or nr == 0:
        return np.full(nl, -1, np.int64)
    k_all = np.concatenate([rk, lk])
    t_all = np.concatenate([rt, lt])
    s_all = np.concatenate([np.zeros(nr, np.int8), np.ones(nl, np.int8)])
    tb_all = np.concatenate([rtb, np.zeros(nl, np.int64)])
    order = np.lexsort((tb_all, s_all, t_all, k_all))
    n = nl + nr
    pos = np.arange(n, dtype=np.int64)
    is_right = order < nr
    last_right_pos = np.maximum.accumulate(np.where(is_right, pos, -1))
    ks = k_all[order]
    new_seg = np.empty(n, bool)
    new_seg[0] = True
    new_seg[1:] = ks[1:] != ks[:-1]
    seg_start = np.maximum.accumulate(np.where(new_seg, pos, -1))
    valid = (last_right_pos >= 0) & (last_right_pos >= seg_start)

    lmask = ~is_right
    l_orig = order[lmask] - nr
    mvalid = valid[lmask]
    r_orig = order[np.maximum(last_right_pos[lmask], 0)]
    if tolerance_us is not None:
        mvalid = mvalid & (t_all[r_orig] >= t_all[order[lmask]]
                           - tolerance_us)
    match = np.full(nl, -1, np.int64)
    match[l_orig] = np.where(mvalid, r_orig, -1)
    return match


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              key: str, left_ts: str, right_ts: str,
              payload: list[str], tiebreak: str,
              tolerance_us: int | None = None,
              direction: str = "backward",
              num_buckets: int = 64) -> ray.data.Dataset:
    """As-of join: for every left row, attach ``payload`` from the
    matching right row with ``right.key == left.key``; unmatched left rows
    keep null payload (left-outer semantics).

    ``direction`` picks the match among same-key right rows:

    * ``"backward"`` (default): greatest ``(right_ts, tiebreak)`` with
      ``right_ts <= left_ts`` (≥ ``left_ts - tolerance_us`` when set);
    * ``"forward"``: least ``(right_ts, tiebreak)`` with
      ``right_ts >= left_ts`` (≤ ``left_ts + tolerance_us`` when set);
    * ``"nearest"``: whichever of the two is closer in time, backward
      winning exact-distance ties — the ordered-join form of the
      reference's ``.sel(time=..., method='nearest')`` alignment.

    ``tiebreak`` makes equal-timestamp right rows deterministic — required
    for the bit-exact SQL twin (plain ``ASOF JOIN`` leaves that tie
    unspecified).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    if key in payload:
        raise ValueError("asof_join: the join key is already a left "
                         "column — drop it from payload")
    out_payload = list(payload)
    # right_ts / tiebreak travel as internal _ts / _tb columns; they reach
    # the output only if the caller lists them in payload
    r_need = list(dict.fromkeys([key, right_ts, tiebreak] + out_payload))
    right = right.select_columns(r_need)
    l_schema = left.schema()
    l_schema = getattr(l_schema, "base_schema", l_schema)
    lcols = list(l_schema.names)
    r_schema = right.schema()
    r_schema = getattr(r_schema, "base_schema", r_schema)
    clash = [c for c in out_payload if c in lcols]
    if clash:
        raise ValueError(f"asof_join: payload columns {clash} collide "
                         "with left columns — rename before joining")
    all_fields = ([pa.field(n, l_schema.field(n).type) for n in lcols]
                  + [pa.field(n, r_schema.field(n).type) for n in out_payload])

    def tag(side: int, ts_col: str):
        def fn(b: pa.Table) -> pa.Table:
            bucket = pa.array(
                b[key].to_numpy(zero_copy_only=False).astype(np.int64)
                % num_buckets)
            cols = {}
            for f in all_fields:
                cols[f.name] = (b[f.name] if f.name in b.column_names
                                else pa.nulls(len(b), f.type))
            if side == 0:
                if b[tiebreak].null_count:
                    # NaN → INT64_MIN would silently win forward/nearest
                    # 'least tiebreak' ties, diverging from NULLS LAST
                    raise ValueError(
                        f"asof_join: tiebreak column {tiebreak!r} "
                        "contains nulls — fill or filter them upstream")
                tb = (b[tiebreak].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
            else:
                tb = np.zeros(len(b), np.int64)
            t = pa.table(cols)
            return (t.append_column("_bucket", bucket)
                     .append_column("_side", pa.array(
                         np.full(len(b), side, np.int8)))
                     .append_column("_ts", pa.array(_ts_i64(b[ts_col], ts_col)))
                     .append_column("_tb", pa.array(tb)))
        return fn

    both = left.map_batches(tag(1, left_ts), batch_format="pyarrow").union(
        right.map_batches(tag(0, right_ts), batch_format="pyarrow"))

    def join_bucket(g: pa.Table) -> pa.Table:
        lt_tbl = g.filter(pc.equal(g["_side"], pa.scalar(1, pa.int8())))
        rt_tbl = g.filter(pc.equal(g["_side"], pa.scalar(0, pa.int8())))
        nl, nr = len(lt_tbl), len(rt_tbl)
        out = {c: lt_tbl[c] for c in lcols}
        if nl == 0:
            return pa.table(
                {f.name: pa.array([], type=f.type) for f in all_fields})
        if nr == 0:
            for c in out_payload:
                out[c] = pa.nulls(nl, r_schema.field(c).type)
            return pa.table(out)

        lk = lt_tbl[key].to_numpy(zero_copy_only=False).astype(np.int64)
        rk = rt_tbl[key].to_numpy(zero_copy_only=False).astype(np.int64)
        lt, rt = lt_tbl["_ts"].to_numpy(), rt_tbl["_ts"].to_numpy()
        rtb = rt_tbl["_tb"].to_numpy()
        if direction in ("backward", "nearest"):
            mb = _match_backward(lk, lt, rk, rt, rtb, tolerance_us)
        if direction in ("forward", "nearest"):
            mf = _match_backward(lk, -lt, rk, -rt, -rtb, tolerance_us)
        if direction == "backward":
            match = mb
        elif direction == "forward":
            match = mf
        else:
            big = np.iinfo(np.int64).max
            db = np.where(mb >= 0, lt - rt[np.maximum(mb, 0)], big)
            df = np.where(mf >= 0, rt[np.maximum(mf, 0)] - lt, big)
            match = np.where(db <= df, mb, mf)  # exact tie → backward
        idx = pa.array(np.maximum(match, 0).astype(np.int64),
                       mask=(match < 0))
        for c in out_payload:
            out[c] = pc.take(rt_tbl[c].combine_chunks(), idx)
        return pa.table(out)

    return both.groupby("_bucket").map_groups(join_bucket,
                                              batch_format="pyarrow")


# ------------------------------------------------ non-equi interval join
def interval_join(points: ray.data.Dataset, intervals: ray.data.Dataset, *,
                  point_ts: str, start: str, end: str,
                  payload: list[str], tile_us: int) -> ray.data.Dataset:
    """Non-equi range join: every (point, interval) pair with
    ``start <= point_ts <= end`` (both ends inclusive), no equality key.
    Output = point columns ⊕ ``payload`` columns, one row per match.

    Partitioning: time is tiled at ``tile_us``; a point lands in exactly
    ONE tile, an interval replicates to every tile it overlaps — so a pair
    can only meet in the point's own tile and needs no de-duplication (the
    temporal analogue of the engine's spatial cell tiling,
    `stages/pip.py` / `stages/tiles.py`). Pick ``tile_us`` ≳ the typical
    interval length: the replication factor is ``1 + len/tile_us``.

    Per-tile kernel: sort the tile's points once; two vectorized
    ``searchsorted`` sweeps give every interval its matching point range;
    pairs are emitted with ``np.repeat`` + cumulative-offset arithmetic —
    no per-interval Python loop.
    """
    p_schema = points.schema()
    p_schema = getattr(p_schema, "base_schema", p_schema)
    pcols = list(p_schema.names)
    i_schema = intervals.schema()
    i_schema = getattr(i_schema, "base_schema", i_schema)
    clash = [c for c in payload if c in pcols]
    if clash:
        raise ValueError(f"interval_join: payload columns {clash} collide "
                         "with point columns — rename before joining")
    all_fields = ([pa.field(n, p_schema.field(n).type) for n in pcols]
                  + [pa.field(n, i_schema.field(n).type) for n in payload])

    def _pad(b: pa.Table, extra: dict) -> dict:
        cols = {}
        for f in all_fields:
            cols[f.name] = (b[f.name] if f.name in b.column_names
                            else pa.nulls(len(b), f.type))
        cols.update(extra)
        return cols

    def tag_points(b: pa.Table) -> pa.Table:
        t = _ts_i64(b[point_ts], point_ts)
        return pa.table(_pad(b, {
            "_tile": pa.array(t // tile_us),
            "_side": pa.array(np.ones(len(b), np.int8)),
            "_t0": pa.array(t), "_t1": pa.array(t)}))

    def tag_intervals(b: pa.Table) -> pa.Table:
        s, e = _ts_i64(b[start], start), _ts_i64(b[end], end)
        lo_tile, hi_tile = s // tile_us, e // tile_us
        reps = (hi_tile - lo_tile + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(b), dtype=np.int64), reps)
        offs = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(reps)[:-1]]), reps)
        tile = lo_tile[idx] + offs
        rep = b.take(pa.array(idx))
        return pa.table(_pad(rep, {
            "_tile": pa.array(tile),
            "_side": pa.array(np.zeros(len(rep), np.int8)),
            "_t0": pa.array(s[idx]), "_t1": pa.array(e[idx])}))

    both = points.map_batches(tag_points, batch_format="pyarrow").union(
        intervals.map_batches(tag_intervals, batch_format="pyarrow"))

    def join_tile(g: pa.Table) -> pa.Table:
        pts = g.filter(pc.equal(g["_side"], pa.scalar(1, pa.int8())))
        ivs = g.filter(pc.equal(g["_side"], pa.scalar(0, pa.int8())))
        empty = pa.table({f.name: pa.array([], type=f.type)
                          for f in all_fields})
        if len(pts) == 0 or len(ivs) == 0:
            return empty
        pt = pts["_t0"].to_numpy()
        order = np.argsort(pt, kind="stable")
        pt_sorted = pt[order]
        lo = np.searchsorted(pt_sorted, ivs["_t0"].to_numpy(), side="left")
        hi = np.searchsorted(pt_sorted, ivs["_t1"].to_numpy(), side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty
        iv_idx = np.repeat(np.arange(len(ivs), dtype=np.int64), counts)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
        p_idx = order[np.repeat(lo, counts) + offs]
        out = {c: pc.take(pts[c].combine_chunks(), pa.array(p_idx))
               for c in pcols}
        for c in payload:
            out[c] = pc.take(ivs[c].combine_chunks(), pa.array(iv_idx))
        return pa.table(out)

    return both.groupby("_tile").map_groups(join_tile,
                                            batch_format="pyarrow")


# ------------------------------------------------- sliding range window agg
def _window_bounds(ks: np.ndarray, tss: np.ndarray, window_us: int,
                   pack_limit: int = _PACK_LIMIT
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Per-row half-open range-window index bounds ``[lo, hi)`` over arrays
    ALREADY sorted by ``(key, ts)``: row i's window covers rows of the same
    key with ``ts in [ts_i - window_us, ts_i]`` (peers at the identical ts
    included — SQL RANGE-frame semantics).

    Packs ``(segment, ts)`` onto one int64 axis — ``shifted = (ts - tmin)
    + seg_id * offset`` with ``offset > span + window`` — so two global
    ``searchsorted`` sweeps resolve every row at once; falls back to
    per-key slices when ``offset × #keys`` would overflow the packed axis.
    """
    n = len(ks)
    if n == 0:
        z = np.empty(0, np.int64)
        return z, z.copy()
    new_seg = np.empty(n, bool)
    new_seg[0] = True
    new_seg[1:] = ks[1:] != ks[:-1]
    seg_id = np.cumsum(new_seg) - 1
    tmin = int(tss.min())
    offset = (int(tss.max()) - tmin) + window_us + 2
    nseg = int(seg_id[-1]) + 1
    if offset * nseg < pack_limit:
        shifted = (tss - tmin) + seg_id * offset
        hi = np.searchsorted(shifted, shifted, side="right")
        lo = np.searchsorted(shifted, shifted - window_us, side="left")
        return lo, hi
    # packed axis would overflow: per-key slices (multi-century spans)
    lo = np.empty(n, np.int64)
    hi = np.empty(n, np.int64)
    starts = np.flatnonzero(new_seg)
    ends = np.append(starts[1:], n)
    for s, e in zip(starts, ends):
        seg = tss[s:e]
        hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        lo[s:e] = s + np.searchsorted(seg, seg - window_us, side="left")
    return lo, hi

def sliding_window_agg(events: ray.data.Dataset, *, key: str, ts: str,
                       window_us: int, value_cents: str | None = None,
                       num_buckets: int = 64,
                       pack_limit: int = _PACK_LIMIT) -> ray.data.Dataset:
    """Per-row sliding range-window aggregate: for every row, the count
    (and optionally the exact int64-cents sum of ``value_cents``) of rows
    with the same ``key`` whose timestamp lies in ``[ts - window_us, ts]``
    — SQL ``RANGE BETWEEN <window> PRECEDING AND CURRENT ROW`` semantics
    (peer rows at the identical timestamp are all included).

    Kernel: per bucket, sort by ``(key, ts)`` and pack ``(segment, ts)``
    onto one int64 axis — ``shifted = (ts - min_ts) + seg_id * OFFSET``
    with ``OFFSET > span + window`` — so two global ``searchsorted`` calls
    resolve every row's window bounds at once; counts and sums fall out of
    prefix-sum differences. Falls back to a per-key loop only when
    ``span × #keys`` would overflow the packed axis (multi-century spans).
    """
    out_keep = list(events.schema().names)

    def tag(b: pa.Table) -> pa.Table:
        bucket = pa.array(
            b[key].to_numpy(zero_copy_only=False).astype(np.int64)
            % num_buckets)
        return (b.append_column("_bucket", bucket)
                 .append_column("_ts", pa.array(_ts_i64(b[ts], ts))))

    def window_bucket(g: pa.Table) -> pa.Table:
        n = len(g)
        k = g[key].to_numpy(zero_copy_only=False).astype(np.int64)
        t = g["_ts"].to_numpy()
        order = np.lexsort((t, k))
        if value_cents and g[value_cents].null_count:
            # a null would round-trip through float64 NaN → INT64_MIN and
            # silently poison every overlapping window's prefix-sum
            raise ValueError(
                f"sliding_window_agg: {value_cents!r} contains nulls — "
                "fill them upstream (the SQL RANGE-frame twin needs an "
                "explicit COALESCE policy anyway)")
        vals = (g[value_cents].to_numpy(zero_copy_only=False)
                .astype(np.int64)[order] if value_cents else None)
        lo, hi = _window_bounds(k[order], t[order], window_us, pack_limit)
        counts = hi - lo
        if value_cents:
            prefix = np.concatenate([[0], np.cumsum(vals)])
            sums = prefix[hi] - prefix[lo]
        inv = np.empty(n, np.int64)
        inv[order] = np.arange(n)
        out = {c: g[c] for c in out_keep if c in g.column_names}
        out["w_count"] = pa.array(counts[inv])
        if value_cents:
            out["w_sum_c"] = pa.array(sums[inv])
        return pa.table(out)

    tagged = events.map_batches(tag, batch_format="pyarrow")
    # window_bucket emits only the original columns + the window aggregates,
    # so no _bucket/_ts cleanup is needed downstream
    return tagged.groupby("_bucket").map_groups(
        window_bucket, batch_format="pyarrow")
