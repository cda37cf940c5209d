"""Ordering-sensitive compositing and neighbor-stencil operators.

- **last_per_cell** — the overlap-compositing mosaic (SURVEY.md A4,
  `viirs.py:660-667`, `abi.py:645-652`): later scenes overwrite earlier
  pixels. Under parallelism block arrival order is meaningless, so the
  "latest" row is selected by an explicit total order ``(warc_ts, page_key)``
  — argmax is associative under a total order, so a per-batch partial
  reduce + a small final reduce is exact regardless of scheduling.

- **neighbor_grad** — the finite-difference stencil (SURVEY.md J5/M7,
  geostrophic `∂ζ/∂ξ` from `particle_contour.py:1171-1220`,
  `wcofs.py:371-396`): per-cell central differences via *message passing* —
  each cell emits ±value contributions keyed by its east/west (north/south)
  neighbors, one groupby-sum collects them. Two addends per target cell,
  and IEEE addition of two terms is commutative, so the result is bit-stable
  without any ordering constraint.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..core import geom


def _group_select(t: pa.Table, keys: list[str], order_cols: list[str],
                  k: int, descending: bool, keep: str) -> pa.Table:
    """Arrow-native per-key head/tail-k: ONE stable table sort
    (`pc.sort_indices` — no pandas hop on the wide input batch) + a
    vectorized segment-boundary mask. ``keep="tail"`` keeps the last row
    per key group (argmax under the total order), ``"head"`` the first k.
    Matches the previous pandas mergesort+groupby bit-for-bit: both sorts
    are stable and place nulls last; NaN-in-order-col behavior is the one
    caller-facing difference (Arrow sorts NaN as largest, pandas always
    last) — order columns here are timestamps/keys, never NaN."""
    t = t.combine_chunks()
    n = t.num_rows
    if n == 0:
        return t
    order = "descending" if descending else "ascending"
    sort_keys = [(c, "ascending") for c in keys] + \
                [(c, order) for c in order_cols]
    t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
    # group boundary: row i starts a new key group
    new_grp = np.zeros(n, bool)
    new_grp[0] = True
    for c in keys:
        col = t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) \
            else t[c]
        neq = pc.fill_null(
            pc.not_equal(col.slice(0, n - 1), col.slice(1)), True)
        new_grp[1:] |= neq.to_numpy(zero_copy_only=False)
    if keep == "tail":
        mask = np.empty(n, bool)
        mask[:-1] = new_grp[1:]
        mask[-1] = True
        return t.filter(pa.array(mask))
    starts = np.flatnonzero(new_grp)
    sizes = np.diff(np.append(starts, n))
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
    return t.filter(pa.array(pos < k))


def last_per_cell(ds: ray.data.Dataset, keys=("cell_id",),
                  order_cols=("warc_ts", "page_key"),
                  payload_cols=("page_key", "warc_ts", "lang"),
                  final_mode: str = "small") -> ray.data.Dataset:
    """One row per cell: the payload of the max-(order_cols) row.

    ``final_mode="small"`` (default) finishes with a coalesced vectorized
    pass — right when distinct keys fit one task (≲10⁷ cells).
    ``"grouped"`` shuffles candidates by key instead (unbounded keys).
    """
    keys = list(keys)
    order_cols = list(order_cols)
    payload_cols = list(payload_cols)
    take_cols = keys + sorted(set(order_cols + payload_cols) - set(keys))

    def partial(b: pa.Table) -> pa.Table:
        # Arrow stable sort + segment mask — no pandas hop on the wide
        # input batch (r5, VERDICT #7); bitwise-equal to the previous
        # pandas mergesort+groupby-tail partial
        return _group_select(b.select(take_cols), keys, order_cols,
                             1, False, "tail")

    from .agg import auto_partitions

    cand = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    # candidates are key-bounded (≤ |keys| rows per input batch). The final
    # reduce is the same vectorized sort+tail, applied once more per
    # candidate partition and then across partitions — argmax under a total
    # order is associative, so two passes suffice and no per-group Python
    # function runs (map_groups costs ~0.5 ms/group; cells can be millions).
    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + order_cols, kind="mergesort")
        return df.groupby(keys, as_index=False, sort=False).tail(1)

    if final_mode == "grouped":
        return (cand.repartition(auto_partitions())
                    .groupby(keys[0] if len(keys) == 1 else keys)
                    .map_groups(lambda g: final(g), batch_format="pandas"))
    cand = cand.repartition(auto_partitions()).map_batches(
        final, batch_format="pandas")
    return cand.repartition(1).map_batches(final, batch_format="pandas")


def topk_per_key(ds: ray.data.Dataset, keys=("cell_id",),
                 order_cols=("warc_ts", "page_key"), k: int = 3,
                 payload_cols=("page_key", "warc_ts"),
                 descending: bool = True,
                 final_mode: str = "small") -> ray.data.Dataset:
    """Top-k rows per key under a total order — `last_per_cell` generalized
    (SURVEY.md A4/O1/O3 composition: per-group "first k records").

    Two-stage: each batch keeps only its own per-key top-k (so the exchange
    moves ≤ k rows per (key, batch)), then a coalesced vectorized pass
    finishes (``final_mode="small"``, right when k×|keys| fits one task) or
    a key-sharded groupby does (``"grouped"``, unbounded key spaces). Exact
    because per-key global top-k ⊆ union of per-batch top-k. Adds a 1-based
    ``rank`` column."""
    keys = list(keys)
    order_cols = list(order_cols)
    payload_cols = list(payload_cols)
    take_cols = keys + sorted(set(order_cols + payload_cols) - set(keys))
    asc = [True] * len(keys) + [not descending] * len(order_cols)

    def partial(b: pa.Table) -> pa.Table:
        # Arrow-native per-key top-k partial (r5, VERDICT #7)
        return _group_select(b.select(take_cols), keys, order_cols,
                             k, descending, "head")

    from .agg import auto_partitions

    cand = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + order_cols, ascending=asc, kind="mergesort")
        df = df.groupby(keys, as_index=False, sort=False).head(k)
        df["rank"] = df.groupby(keys, sort=False).cumcount() + 1
        return df

    if final_mode == "grouped":
        return (cand.repartition(auto_partitions())
                    .groupby(keys[0] if len(keys) == 1 else keys)
                    .map_groups(final, batch_format="pandas"))
    cand = cand.repartition(auto_partitions()).map_batches(
        lambda df: df.sort_values(keys + order_cols, ascending=asc,
                                  kind="mergesort")
                     .groupby(keys, as_index=False, sort=False).head(k),
        batch_format="pandas")
    return cand.repartition(1).map_batches(final, batch_format="pandas",
                                           batch_size=None)


def neighbor_grad(cells: ray.data.Dataset, value_sum: str = "n_chars_sum",
                  count: str = "doc_count") -> ray.data.Dataset:
    """Central x/y differences of the per-cell mean value.

    Input: per-cell aggregate (cell_id, value_sum, count). Output: one row
    per cell having both neighbors on an axis: (cell_id, grad_x?, grad_y?)
    — cells missing a neighbor pair get NaN for that axis.
    """

    def emit(b: pa.Table) -> pa.Table:
        cell = b["cell_id"].to_numpy(zero_copy_only=False)
        z, x, y = geom.unpack_cell(cell)
        v = (b[value_sum].to_numpy(zero_copy_only=False).astype(np.float64)
             / b[count].to_numpy(zero_copy_only=False))
        n = np.int64(1) << z
        targets, cx, nx, cy, ny = [], [], [], [], []
        # v(x,y) contributes +v to grad_x of (x-1,y) and -v to grad_x of (x+1,y)
        for dx, dy, sign in ((-1, 0, 1.0), (1, 0, -1.0), (0, -1, 1.0), (0, 1, -1.0)):
            tx, ty = x + dx, y + dy
            ok = (tx >= 0) & (tx < n) & (ty >= 0) & (ty < n)
            k = int(ok.sum())
            targets.append(geom.pack_cell(0, tx[ok], ty[ok]) | (z[ok] << geom.CELL_Z_SHIFT))
            on_x = dy == 0
            cx.append(sign * v[ok] if on_x else np.zeros(k))
            nx.append(np.full(k, 1 if on_x else 0, np.int64))
            cy.append(np.zeros(k) if on_x else sign * v[ok])
            ny.append(np.full(k, 0 if on_x else 1, np.int64))
        t = pa.table({
            "cell_id": pa.array(np.concatenate(targets)),
            "cx": pa.array(np.concatenate(cx)),
            "nx": pa.array(np.concatenate(nx)),
            "cy": pa.array(np.concatenate(cy)),
            "ny": pa.array(np.concatenate(ny)),
        })
        # batch-local partial combine: the wide exchange moves ≤1 row per
        # (cell, batch). Each axis sum has exactly 2 real addends globally
        # (+v_east, -v_west) plus exact zeros, so any reduction order gives
        # fl(a+b) — bit-stable without per-group Python (map_groups pays
        # ~0.5 ms/group; stencil targets are millions of cells at z≥10).
        g = t.group_by("cell_id").aggregate(
            [("cx", "sum"), ("nx", "sum"), ("cy", "sum"), ("ny", "sum")])
        return pa.table({"cell_id": g["cell_id"], "cx": g["cx_sum"],
                         "nx": g["nx_sum"], "cy": g["cy_sum"],
                         "ny": g["ny_sum"]})

    from ray.data.aggregate import Sum

    from .agg import auto_partitions

    emitted = cells.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
    agg = (emitted.repartition(auto_partitions())
                  .groupby("cell_id")
                  .aggregate(Sum("cx", alias_name="cx"), Sum("nx", alias_name="nx"),
                             Sum("cy", alias_name="cy"), Sum("ny", alias_name="ny")))

    def finish(b: pa.Table) -> pa.Table:
        nx_ = b["nx"].to_numpy(zero_copy_only=False)
        ny_ = b["ny"].to_numpy(zero_copy_only=False)
        gx = np.where(nx_ == 2, b["cx"].to_numpy(zero_copy_only=False), np.nan)
        gy = np.where(ny_ == 2, b["cy"].to_numpy(zero_copy_only=False), np.nan)
        keep = (nx_ == 2) | (ny_ == 2)
        return pa.table({"cell_id": b["cell_id"].to_numpy(zero_copy_only=False)[keep],
                         "grad_x": pa.array(gx[keep]),
                         "grad_y": pa.array(gy[keep])})

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
