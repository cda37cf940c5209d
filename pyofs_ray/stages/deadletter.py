"""Dead-letter routing for per-batch transforms.

The reference's error policy is `try/except → warn and continue`
(`write_daily_average.py:223-226, 351-354, 567-570`) — silent partial
output. SURVEY.md §4 calls for the explicit version: failing ROWS are
isolated and routed to a dead-letter table with the error, good rows flow
on, and nothing is silently dropped.

``safe_map_batches(ds, fn)`` wraps a batch transform: a batch that raises is
bisected (binary split, O(log n) fn calls per poisoned row) until the
failing rows are isolated; those rows are emitted to the dead-letter side
tagged with the exception text. Outputs are two Datasets sharing one pass:
rows carry ``_dead: bool`` + ``_error: string`` and are split by filter —
at scale the dead-letter side is written to its own partition for replay.
"""

from __future__ import annotations

import traceback
from collections.abc import Callable

import pyarrow as pa
import ray.data


def _apply_with_bisect(fn: Callable[[pa.Table], pa.Table], batch: pa.Table,
                       good: list[pa.Table], dead: list[tuple[pa.Table, str]]) -> None:
    try:
        good.append(fn(batch))
        return
    except Exception as e:  # noqa: BLE001 — the whole point is routing failures
        if batch.num_rows <= 1:
            dead.append((batch, f"{type(e).__name__}: {e}"))
            return
    mid = batch.num_rows // 2
    _apply_with_bisect(fn, batch.slice(0, mid), good, dead)
    _apply_with_bisect(fn, batch.slice(mid), good, dead)


def safe_map_batches(ds: ray.data.Dataset, fn: Callable[[pa.Table], pa.Table],
                     batch_size: int = 65536,
                     id_col: str | None = None) -> ray.data.Dataset:
    """Apply ``fn`` per batch; rows that make it raise become dead-letter
    rows. Returns one Dataset whose rows are either fn-outputs
    (``_dead=false, _error=null``) or original-row projections
    (``_dead=true, _error=<message>``); split with ``partition_deadletter``.
    """

    def wrapped(batch: pa.Table) -> pa.Table:
        good: list[pa.Table] = []
        dead: list[tuple[pa.Table, str]] = []
        _apply_with_bisect(fn, batch, good, dead)
        out: list[pa.Table] = []
        for g in good:
            if g.num_rows:
                out.append(g.append_column("_dead", pa.array([False] * g.num_rows))
                            .append_column("_error", pa.nulls(g.num_rows, pa.string())))
        if dead:
            # dead rows keep only the id column (or first column) + error —
            # enough to replay from the source without schema conflicts
            key = id_col or batch.column_names[0]
            for d, msg in dead:
                t = pa.table({key: d[key]})
                out.append(t.append_column("_dead", pa.array([True] * t.num_rows))
                            .append_column("_error", pa.array([msg] * t.num_rows)))
        if not out:
            return pa.table({"_dead": pa.array([], pa.bool_()),
                             "_error": pa.array([], pa.string())})
        # unify schemas (good rows have fn's columns, dead rows only the key)
        return pa.concat_tables(out, promote_options="default")

    return ds.map_batches(wrapped, batch_format="pyarrow", batch_size=batch_size)


def partition_deadletter(ds: ray.data.Dataset):
    """Split a safe_map_batches output into (good, dead) Datasets."""
    import pyarrow.compute as pc
    good = ds.map_batches(lambda b: b.filter(pc.equal(b["_dead"], False))
                          .drop_columns(["_dead", "_error"]),
                          batch_format="pyarrow")
    dead = ds.map_batches(lambda b: b.filter(pc.equal(b["_dead"], True)),
                          batch_format="pyarrow")
    return good, dead
