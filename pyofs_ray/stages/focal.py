"""Focal (moving-window) raster statistics over the cell grid: each cell's
value smoothed with its 3×3 neighborhood — the vector-side analogue of the
raster focal/convolution step PyOFS applies when it resamples model grids
(`/root/reference/PyOFS/model/wcofs.py:645-711` builds averaged overviews;
a focal mean is the same stencil at CONSTANT zoom instead of the parent
level, and complements the existing gradient stencil
`stages/composite.neighbor_grad`).

Exactness: the focal mean is ``SUM(neighbor char sums) / SUM(neighbor doc
counts)`` — two decomposable int64 sums and ONE IEEE division after the
final reduce, so the result is bit-identical to the DuckDB twin under any
parallel schedule.

Scale shape (100 TB): input is the per-cell aggregate table — bounded by
the GRID (≤ 4^z cells), not the corpus — so the whole operator is one
9-fold expansion ``map_batches`` (pure int cell math: longitude WRAPS at
the antimeridian, latitude CLAMPS at the grid edge, matching
`core.geom.cell_xy` conventions) followed by ONE bucketed key reduce.
Cells whose 3×3 window reaches off-grid in y simply have fewer
contributors (the count denominator shrinks — the nan-aware mean
convention of SURVEY.md A2). Only cells that EXIST in the input emit a
row: existence travels through the same exchange as a summed center flag,
so no second pass and no join is needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..core import geom
from .agg import bucketed_group_agg

OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def focal_mean(cells: ray.data.Dataset, *, cell_col: str = "cell_id",
               sum_col: str = "n_chars_sum", cnt_col: str = "doc_count",
               num_buckets: int | None = None) -> ray.data.Dataset:
    """3×3 focal mean over a per-cell (sum, count) aggregate table.

    Output: ``cell_id, focal_chars_sum, focal_doc_count, focal_mean_chars``
    for every input cell (x wraps mod 2^z; off-grid y rows contribute
    nothing)."""

    def expand(b: pa.Table) -> pa.Table:
        cid = b[cell_col].to_numpy(zero_copy_only=False).astype(np.int64)
        z, x, y = geom.unpack_cell(cid)
        n = np.int64(1) << z
        vs = b[sum_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ct = b[cnt_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tgt, fs, fc, ctr = [], [], [], []
        for dx, dy in OFFSETS:
            tx = (x + dx) % n  # numpy % is non-negative: antimeridian wrap
            ty = y + dy
            ok = (ty >= 0) & (ty < n)
            tgt.append(((z << geom.CELL_Z_SHIFT)
                        | (tx << geom.CELL_X_SHIFT) | ty)[ok])
            fs.append(vs[ok])
            fc.append(ct[ok])
            is_c = np.int64(1) if (dx == 0 and dy == 0) else np.int64(0)
            ctr.append(np.full(int(ok.sum()), is_c, np.int64))
        return pa.table({
            "cell_id": pa.array(np.concatenate(tgt)),
            "fs": pa.array(np.concatenate(fs)),
            "fc": pa.array(np.concatenate(fc)),
            "is_center": pa.array(np.concatenate(ctr)),
        })

    expanded = cells.map_batches(expand, batch_format="pyarrow")
    agg = bucketed_group_agg(
        expanded, keys=["cell_id"],
        aggs=[("fs", "sum", "focal_chars_sum"),
              ("fc", "sum", "focal_doc_count"),
              ("is_center", "sum", "_c")],
        num_buckets=num_buckets,
        coalesce=True)

    def finish(b: pa.Table) -> pa.Table:
        b = b.filter(pa.compute.equal(b["_c"], 1))
        s = b["focal_chars_sum"].to_numpy(zero_copy_only=False)
        c = b["focal_doc_count"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cell_id": b["cell_id"].cast(pa.int64()),
            "focal_chars_sum": b["focal_chars_sum"].cast(pa.int64()),
            "focal_doc_count": b["focal_doc_count"].cast(pa.int64()),
            # single IEEE op from exact int64 sums — order-invariant
            "focal_mean_chars": pa.array(s.astype(np.float64)
                                         / c.astype(np.float64)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def focal_mean_sql(pages_prefix: str, z: int) -> str:
    """Bit-exact DuckDB twin over the same pages CTE: DuckDB ``%`` keeps
    the dividend sign, so the wrap uses the safe-mod form."""
    from ..core import sqlgen

    n = 1 << z
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in OFFSETS)
    return f"""{pages_prefix},
c AS (
  SELECT {sqlgen.x_expr(z)} AS x, {sqlgen.y_expr(z)} AS y,
         CAST(SUM(LENGTH(text)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pages GROUP BY 1, 2
), off AS (SELECT * FROM (VALUES {offs}) t(dx, dy)),
e AS (
  SELECT ((c.x + off.dx) % {n} + {n}) % {n} AS tx, c.y + off.dy AS ty,
         c.s, c.cnt
  FROM c, off
  WHERE c.y + off.dy >= 0 AND c.y + off.dy <= {n - 1}
), a AS (
  SELECT tx, ty, CAST(SUM(s) AS BIGINT) AS fs, CAST(SUM(cnt) AS BIGINT) AS fc
  FROM e GROUP BY 1, 2
)
SELECT ({z} * {1 << geom.CELL_Z_SHIFT} + a.tx * {1 << geom.CELL_X_SHIFT}
        + a.ty) AS cell_id,
       fs AS focal_chars_sum, fc AS focal_doc_count,
       CAST(fs AS DOUBLE) / fc AS focal_mean_chars
FROM a JOIN c ON c.x = a.tx AND c.y = a.ty"""
