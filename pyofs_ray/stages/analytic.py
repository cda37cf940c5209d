"""Per-key ordered analytic (window) functions: LAG deltas and running
(cumulative) aggregates.

Reference analogue: PyOFS orders observations per station/pass and walks
consecutive snapshots (`/root/reference/main/tracking/particle_contour.py`
steps trajectories through time-ordered fields; `viirs.py:1016-1075` scans
a time-ordered pass sequence). The SQL-window generalization — "previous
row's value within my key's timeline" (LAG) and "sum of my key's history
up to me" (running SUM) — is a first-class feature a training-data
pipeline needs (inter-event gaps, per-user cumulative exposure, per-host
crawl cadence).

Execution model (same contract as ``temporal.asof_join`` /
``agg.bucketed_group_agg``):

* ONE ``groupby`` exchange on ``key % num_buckets`` — the bucket is the
  scheduling unit, the key the correctness unit (a key never splits
  across buckets).
* Inside each bucket group the kernel is ONE ``np.lexsort`` over
  ``(tiebreak, ts, key)`` plus vectorized segment ops (shift / cumsum) —
  no per-key Python loop, no driver participation.
* Skew: a hot key concentrates its rows in one bucket task (inherent to
  per-key ordered semantics); mitigation is more buckets so other keys
  do not queue behind it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..core.hashing import fnv1a64
from .temporal import _ts_i64


def _bucket_of(col, num_buckets: int) -> np.ndarray:
    """Per-row int64 bucket tag. Integer keys mod directly; string keys
    hash via fnv1a64 — bucketing only, never segmenting, so a 64-bit
    collision cannot merge two keys (ordering compares the strings)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        # a null int key would view as INT64_MIN, a null string as the
        # literal 'None' — both silently diverge from SQL's NULL group
        raise ValueError("analytic window: the partition key contains "
                         "nulls — filter or fill them upstream (SQL "
                         "windows put NULL keys in their own partition; "
                         "mirror that explicitly if you need it)")
    if pa.types.is_integer(col.type):
        return (col.to_numpy(zero_copy_only=False).astype(np.int64)
                % num_buckets)
    return (fnv1a64(col) % np.uint64(num_buckets)).astype(np.int64)


def _key_sortable(col) -> np.ndarray:
    """numpy view of the key column that lexsort compares in C: int64
    for integers, fixed-width '<U' for strings (code-point order ==
    DuckDB's binary collation on ASCII keys)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False).astype(np.int64)
    return np.asarray(col.to_pylist(), dtype=str)


def _tag_bucket(ds: ray.data.Dataset, key: str, cols: list[str],
                num_buckets: int) -> ray.data.Dataset:
    def tag(b: pa.Table) -> pa.Table:
        t = b.select(cols)
        return t.append_column(
            "_bucket", pa.array(_bucket_of(b[key], num_buckets)))
    return ds.map_batches(tag, batch_format="pyarrow")


def _segments(k: np.ndarray) -> np.ndarray:
    """Boolean new-segment mask over a key array already sorted by key."""
    new = np.empty(len(k), bool)
    if len(k):
        new[0] = True
        new[1:] = k[1:] != k[:-1]
    return new


def lag_delta(ds: ray.data.Dataset, *, key: str, ts: str, tiebreak: str,
              num_buckets: int = 64) -> ray.data.Dataset:
    """LAG(ts) OVER (PARTITION BY key ORDER BY ts, tiebreak) plus the
    microsecond delta to it. Output columns: ``tiebreak, key, ts,
    prev_ts (nullable timestamp[us]), delta_us (nullable int64)`` — the
    first row of each key's timeline carries nulls, matching SQL LAG."""
    cols = [tiebreak, key, ts]
    tagged = _tag_bucket(ds, key, cols, num_buckets)

    def kern(g: pa.Table) -> pa.Table:
        k = _key_sortable(g[key])
        t = _ts_i64(g[ts], ts)
        tb = g[tiebreak].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tb, t, k))
        ks, tsrt = k[order], t[order]
        new = _segments(ks)
        prev = np.empty(len(tsrt), np.int64)
        if len(tsrt):
            prev[0] = 0
            prev[1:] = tsrt[:-1]
        valid = ~new
        delta = tsrt - prev
        ts_type = g.schema.field(ts).type
        prev_col = pa.Array.from_pandas(prev, mask=new, type=pa.int64())
        return pa.table({
            tiebreak: pa.array(tb[order]),
            key: g[key].take(pa.array(order)),
            ts: pa.array(tsrt).cast(ts_type),
            "prev_ts": prev_col.cast(ts_type),
            "delta_us": pa.Array.from_pandas(
                np.where(valid, delta, 0), mask=new, type=pa.int64()),
        })

    return tagged.groupby("_bucket").map_groups(kern, batch_format="pyarrow")


def running_sum(ds: ray.data.Dataset, *, key: str, ts: str, tiebreak: str,
                value: str, out: str = "running",
                num_buckets: int = 64) -> ray.data.Dataset:
    """SUM(value) OVER (PARTITION BY key ORDER BY ts, tiebreak ROWS
    UNBOUNDED PRECEDING) — int64 exact (callers pass scaled-cents values;
    the cumsum never leaves int64). Output: ``tiebreak, key, ts, value,
    out``."""
    cols = [tiebreak, key, ts, value]
    tagged = _tag_bucket(ds, key, cols, num_buckets)

    def kern(g: pa.Table) -> pa.Table:
        k = _key_sortable(g[key])
        t = _ts_i64(g[ts], ts)
        tb = g[tiebreak].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g[value].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tb, t, k))
        ks, vs = k[order], v[order]
        cs = np.cumsum(vs)
        new = _segments(ks)
        starts = np.flatnonzero(new)
        n = len(ks)
        if n:
            excl = cs - vs  # exclusive prefix sum
            base = np.repeat(excl[starts], np.diff(np.append(starts, n)))
            run = cs - base
        else:
            run = cs
        ts_type = g.schema.field(ts).type
        return pa.table({
            tiebreak: pa.array(tb[order]),
            key: g[key].take(pa.array(order)),
            ts: pa.array(t[order]).cast(ts_type),
            value: pa.array(vs),
            out: pa.array(run),
        })

    return tagged.groupby("_bucket").map_groups(kern, batch_format="pyarrow")


def rank_in_key(ds: ray.data.Dataset, *, key: str, value: str,
                tiebreak: str, descending: bool = True,
                num_buckets: int = 64) -> ray.data.Dataset:
    """ROW_NUMBER + normalized percent rank per key, ordered by
    ``(value DESC|ASC, tiebreak ASC)`` — the tiebreak makes the ordering
    total, so rank is deterministic and the SQL twin is exact. Output:
    ``tiebreak, key, value, rn (1-based int64), pct_rank (float64;
    (rn-1)/(n-1), 0.0 for single-row keys — ONE IEEE division from exact
    ints)``."""
    cols = [tiebreak, key, value]
    tagged = _tag_bucket(ds, key, cols, num_buckets)

    def kern(g: pa.Table) -> pa.Table:
        k = _key_sortable(g[key])
        v = g[value].to_numpy(zero_copy_only=False).astype(np.int64)
        tb = g[tiebreak].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tb, -v if descending else v, k))
        ks = k[order]
        n = len(ks)
        new = _segments(ks)
        pos = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new, pos, -1))
        rn = pos - seg_start + 1
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        cnt = np.repeat(sizes, sizes)
        pct = np.where(cnt > 1, (rn - 1) / np.maximum(cnt - 1, 1), 0.0)
        return pa.table({
            tiebreak: pa.array(tb[order]),
            key: g[key].take(pa.array(order)),
            value: pa.array(v[order]),
            "rn": pa.array(rn),
            "pct_rank": pa.array(pct),
        })

    return tagged.groupby("_bucket").map_groups(kern, batch_format="pyarrow")


def transition_counts(ds: ray.data.Dataset, *, key: str, ts: str,
                      tiebreak: str, state: str,
                      num_buckets: int = 64) -> ray.data.Dataset:
    """Markov transition counts: for every ADJACENT pair in each key's
    time-ordered state sequence, count (prev_state, next_state) globally
    — the behavioural analogue of the bigram language model (and of the
    reference's consecutive-pass scans). ONE key-bucket exchange, the
    shared lexsort kernel, per-group pair partials, then a trivial
    ≤|states|² groupby.

    Output: ``prev_state, next_state, n`` (int64)."""
    cols = [tiebreak, key, ts, state]
    tagged = _tag_bucket(ds, key, cols, num_buckets)

    def kern(g: pa.Table) -> pa.Table:
        k = _key_sortable(g[key])
        t = _ts_i64(g[ts], ts)
        tb = g[tiebreak].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tb, t, k))
        new = _segments(k[order])
        st = g[state].take(pa.array(order))
        idx = np.flatnonzero(~new)  # rows with a same-key predecessor
        pairs = pa.table({
            "prev_state": st.take(pa.array(idx - 1)),
            "next_state": st.take(pa.array(idx)),
        })
        gg = (pairs.group_by(["prev_state", "next_state"])
              .aggregate([("next_state", "count")]))
        return pa.table({
            "prev_state": gg["prev_state"],
            "next_state": gg["next_state"],
            "n": gg["next_state_count"].combine_chunks().cast(pa.int64()),
        })

    parts = tagged.groupby("_bucket").map_groups(kern,
                                                 batch_format="pyarrow")
    agg = parts.groupby(["prev_state", "next_state"]).sum("n")
    return agg.map_batches(
        lambda b: pa.table({"prev_state": b["prev_state"],
                            "next_state": b["next_state"],
                            "n": b["sum(n)"].cast(pa.int64())}),
        batch_format="pyarrow")
