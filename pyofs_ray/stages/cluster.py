"""Grid DBSCAN — density-based spatial clustering of the geocoded corpus.

The classic DBSCAN neighborhood query is an all-pairs range join; the
grid-quantized form used here (dense-cell adjacency) is the standard
distributed approximation: a cell at the base zoom is *dense* when it holds
at least ``MINPTS`` pages, and clusters are the 8-connected components of
the dense-cell graph. This mirrors the reference's contour/front detection
over gridded fields (PyOFS builds polygons from dense raster regions,
`wcofs.py` study-area handling + SURVEY.md K4/A7) re-expressed as a Ray
aggregation: ONE two-stage per-cell count exchange, then a
cell-cardinality-bounded coalesced finish (≤4^z rows — same bound the tile
pyramid finish documents) that runs vectorized min-label propagation.

Exactness: cell ids are pure int64 arithmetic (`core.geom`), the component
label is the MIN cell_id of the component, and every output column is an
int64 count — bit-identical to the DuckDB recursive-CTE twin.

Scale shape: the corpus is never pulled to the driver — only the per-cell
count table (bounded by occupied cells at zoom z, ≤4^z) reaches the single
finish block. At z=7 that is ≤16 384 rows worldwide regardless of corpus
size. No antimeridian wrap: x=0 and x=n-1 are NOT adjacent (the SQL twin
applies the identical rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..core import geom
from ..core.sqlgen import cell_expr, x_expr, y_expr, PAGES_CTE

DBSCAN_ZOOM = 7
DBSCAN_MINPTS = 10


def _min_label_components(x: np.ndarray, y: np.ndarray,
                          cell_id: np.ndarray) -> np.ndarray:
    """Vectorized min-label propagation over the 8-neighbor grid graph.

    Returns, per input cell, the minimum cell_id reachable in its
    component. Iterations are bounded by the component diameter in cells
    (tiny: clusters are jitter-sized blobs), each iteration one
    searchsorted + minimum.at pass.
    """
    order = np.argsort(cell_id, kind="stable")
    cid = cell_id[order]
    xs, ys = x[order], y[order]
    # neighbor pair lists (i -> j) via packed-key search
    packed = cid  # cell_id already packs (z, x, y) injectively
    src_list, dst_list = [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nx, ny = xs + dx, ys + dy
            n = np.int64(1) << DBSCAN_ZOOM
            ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
            nk = (np.int64(DBSCAN_ZOOM) << geom.CELL_Z_SHIFT) | \
                 (nx << geom.CELL_X_SHIFT) | ny
            pos = np.searchsorted(packed, nk)
            pos_c = np.clip(pos, 0, len(packed) - 1)
            hit = ok & (packed[pos_c] == nk)
            src_list.append(np.nonzero(hit)[0])
            dst_list.append(pos_c[hit])
    src = np.concatenate(src_list) if src_list else np.empty(0, np.int64)
    dst = np.concatenate(dst_list) if dst_list else np.empty(0, np.int64)

    lbl = cid.copy()
    while True:
        new = lbl.copy()
        if len(src):
            np.minimum.at(new, src, lbl[dst])
        if np.array_equal(new, lbl):
            break
        lbl = new
    out = np.empty_like(lbl)
    out[order] = lbl
    return out


def cell_dbscan(sf_dir: str, zoom: int = DBSCAN_ZOOM,
                minpts: int = DBSCAN_MINPTS) -> ray.data.Dataset:
    """pages → per-cell counts (one exchange) → dense-cell components →
    one row per cluster: (cluster_id, n_cells, n_points)."""
    from ..pipelines.flagship import geocoded_pages
    from .agg import two_stage_cell_agg

    ds = geocoded_pages(sf_dir, zoom).select_columns(["cell_id"])
    counts = two_stage_cell_agg(ds, keys=("cell_id",), int_sum_cols=(),
                                count_name="n")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        dense = df[df.n >= minpts]
        if dense.empty:
            return pd.DataFrame({"cluster_id": pd.Series([], np.int64),
                                 "n_cells": pd.Series([], np.int64),
                                 "n_points": pd.Series([], np.int64)})
        cid = dense.cell_id.to_numpy(np.int64)
        _, x, y = geom.unpack_cell(cid)
        lbl = _min_label_components(x, y, cid)
        g = pd.DataFrame({"cluster_id": lbl, "n": dense.n.to_numpy(np.int64)})
        out = g.groupby("cluster_id", sort=False).agg(
            n_cells=("n", "size"), n_points=("n", "sum")).reset_index()
        return pd.DataFrame({"cluster_id": out.cluster_id.astype(np.int64),
                             "n_cells": out.n_cells.astype(np.int64),
                             "n_points": out.n_points.astype(np.int64)})

    return counts.repartition(1).map_batches(finish, batch_format="pandas",
                                             batch_size=None)


def cell_dbscan_sql(zoom: int = DBSCAN_ZOOM,
                    minpts: int = DBSCAN_MINPTS) -> str:
    return f"""
WITH RECURSIVE {PAGES_CTE},
cells AS (
  SELECT {cell_expr(zoom)} AS cell_id, {x_expr(zoom)} AS x,
         {y_expr(zoom)} AS y, COUNT(*) AS n
  FROM pages GROUP BY 1, 2, 3
),
dense AS (SELECT * FROM cells WHERE n >= {minpts}),
edges AS (
  SELECT a.cell_id AS src, b.cell_id AS dst
  FROM dense a JOIN dense b
    ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
   AND a.cell_id <> b.cell_id
),
reach(cell_id, lbl) AS (
  SELECT cell_id, cell_id FROM dense
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.cell_id
),
lab AS (SELECT cell_id, MIN(lbl) AS cluster_id FROM reach GROUP BY 1)
SELECT l.cluster_id, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(d.n) AS BIGINT) AS n_points
FROM lab l JOIN dense d USING (cell_id)
GROUP BY 1
"""
