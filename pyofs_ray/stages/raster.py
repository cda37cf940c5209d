"""Vector → raster: polygon rasterization onto the cell grid — the inverse
of `flagship.cell_boundary_vector` (raster → vector) and the second half of
the north-star's "raster-to-vector / vector-to-raster tile materialization".
PyOFS rasterizes its study-area polygon onto each model grid the same way
(`/root/reference/main/write_daily_average.py` masks grids by the study
area; `PyOFS/utilities.py:184-195` builds the polygon).

Coverage rule: a cell is covered iff its CENTER (the integer half-cell
midpoint — the same ``(2x+1)·RANGE // 2n`` floor form as `stages/idw`)
passes the even–odd ray-crossing test (`stages/pip.PolygonIndex.contains`,
pure int64) — so the raster is bit-identical to the DuckDB twin, which
evaluates the identical parity predicate over a literal candidate grid.

Scale shape: polygons are the SMALL side (broadcast once); each polygon
expands to its bbox's candidate cells (vectorized meshgrid + one parity
kernel per polygon) inside a flat ``map_batches`` over the polygon table —
so parallelism is per polygon and no corpus data is touched at all. A
continent-sized polygon at a deep zoom should be striped into x-ranges
before this stage; the fixture set needs no striping (documented
assumption, mirrored by `stages/pip`'s broadcast-index assumption).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..core import geom
from ..sources.fixtures import Polygon, study_polygons
from .idw import cell_centers
from .pip import PolygonIndex


def cell_range(lo: int, hi: int, z: int, axis: str) -> tuple[int, int]:
    """Inclusive cell-index range whose centers can fall in [lo, hi]."""
    n = np.int64(1) << z
    a = np.array([lo, hi], np.int64)
    if axis == "x":
        x, _ = geom.cell_xy(a, np.zeros(2, np.int64), z)
        return int(x[0]), int(x[1])
    _, y = geom.cell_xy(np.zeros(2, np.int64), a, z)
    # lat decreases with y (north-up): hi (north) maps to the smaller y
    return int(y[1]), int(y[0])


def rasterize_polygons(polygons: list[Polygon] | None = None,
                       z: int = geom.BASE_ZOOM) -> ray.data.Dataset:
    """Covered-cell rows per polygon: ``polygon_id, cell_id, x, y``."""
    polys = polygons if polygons is not None else study_polygons()
    ref = ray.put(polys)
    ids = ray.data.from_arrow(pa.table({
        "pidx": pa.array(np.arange(len(polys), dtype=np.int64))}))

    def expand(b: pa.Table) -> pa.Table:
        ps = ray.get(ref)
        index = PolygonIndex(ps)
        out_pid, out_cid, out_x, out_y = [], [], [], []
        for pidx in b["pidx"].to_pylist():
            p = ps[pidx]
            w, s, e, nn = p.bbox
            x0, x1 = cell_range(w, e, z, "x")
            y0, y1 = cell_range(s, nn, z, "y")
            gx, gy = np.meshgrid(np.arange(x0, x1 + 1, dtype=np.int64),
                                 np.arange(y0, y1 + 1, dtype=np.int64))
            gx, gy = gx.ravel(), gy.ravel()
            cid = geom.pack_cell(z, gx, gy)
            lon_c, lat_c = cell_centers(cid)
            inside = index.contains(pidx, lon_c, lat_c)
            out_pid.append(np.full(int(inside.sum()), pidx, np.int64))
            out_cid.append(cid[inside])
            out_x.append(gx[inside])
            out_y.append(gy[inside])
        pid = np.concatenate(out_pid) if out_pid else np.array([], np.int64)
        names = np.array([p.polygon_id for p in ps])
        return pa.table({
            "polygon_id": pa.array(names[pid].tolist(), pa.string()),
            "cell_id": pa.array(np.concatenate(out_cid) if out_cid
                                else np.array([], np.int64)),
            "x": pa.array(np.concatenate(out_x) if out_x
                          else np.array([], np.int64)),
            "y": pa.array(np.concatenate(out_y) if out_y
                          else np.array([], np.int64)),
        })

    return ids.map_batches(expand, batch_format="pyarrow")


def rasterize_polygons_sql(polygons: list[Polygon] | None = None,
                           z: int = geom.BASE_ZOOM) -> str:
    """Bit-exact twin: literal candidate ranges (the same integer cell
    math, evaluated here at generation time) + the identical parity
    predicate over the identical integer centers."""
    from ..core.sqlgen_pip import inside_expr

    polys = polygons if polygons is not None else study_polygons()
    n = 1 << z
    parts = []
    for p in polys:
        w, s, e, nn = p.bbox
        x0, x1 = cell_range(w, e, z, "x")
        y0, y1 = cell_range(s, nn, z, "y")
        parts.append(f"""
SELECT '{p.polygon_id}' AS polygon_id,
       {z} * {1 << geom.CELL_Z_SHIFT} + x * {1 << geom.CELL_X_SHIFT} + y
         AS cell_id, x, y
FROM (
  SELECT gx.x AS x, gy.y AS y,
         ((2 * gx.x + 1) * {geom.LON_RANGE}) // {2 * n}
           - {geom.LON_OFFSET} AS lon_c,
         {geom.LAT_OFFSET} - ((2 * gy.y + 1) * {geom.LAT_RANGE})
           // {2 * n} AS lat_c
  FROM generate_series({x0}, {x1}) gx(x)
  CROSS JOIN generate_series({y0}, {y1}) gy(y)
) WHERE {inside_expr(p, lon='lon_c', lat='lat_c')}""")
    return "\nUNION ALL\n".join(parts)


def polygon_cell_area(polygons: list[Polygon] | None = None,
                      z: int = geom.BASE_ZOOM) -> ray.data.Dataset:
    """Raster area estimation per polygon: covered-cell count, bbox
    candidate count, and the coverage share (single IEEE division) — the
    cell-count analogue of the vector area/perimeter op (SURVEY.md A8),
    useful where the ring integral is unavailable (multipolygons after
    masking). Derived from `rasterize_polygons` in the same pass shape."""
    import pyarrow.compute as pc

    polys = polygons if polygons is not None else study_polygons()
    cand = {}
    for p in polys:
        w, s, e, nn = p.bbox
        x0, x1 = cell_range(w, e, z, "x")
        y0, y1 = cell_range(s, nn, z, "y")
        cand[p.polygon_id] = (x1 - x0 + 1) * (y1 - y0 + 1)
    rows = rasterize_polygons(polys, z=z)

    def partial(b: pa.Table) -> pa.Table:
        g = (b.select(["polygon_id"]).group_by("polygon_id")
             .aggregate([("polygon_id", "count")]))
        return pa.table({"polygon_id": g["polygon_id"],
                         "n": g["polygon_id_count"].combine_chunks()
                               .cast(pa.int64())})

    agg = (rows.map_batches(partial, batch_format="pyarrow")
           .groupby("polygon_id").sum("n"))

    def finish(b: pa.Table) -> pa.Table:
        pid = b["polygon_id"].to_pylist()
        n = b["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = np.array([cand[p] for p in pid], np.int64)
        return pa.table({
            "polygon_id": pa.array(pid, pa.string()),
            "n_cells": pa.array(n),
            "bbox_cells": pa.array(bb),
            "coverage": pa.array(n.astype(np.float64)
                                 / bb.astype(np.float64)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def polygon_cell_area_sql(polygons: list[Polygon] | None = None,
                          z: int = geom.BASE_ZOOM) -> str:
    polys = polygons if polygons is not None else study_polygons()
    parts = []
    for p in polys:
        w, s, e, nn = p.bbox
        x0, x1 = cell_range(w, e, z, "x")
        y0, y1 = cell_range(s, nn, z, "y")
        bb = (x1 - x0 + 1) * (y1 - y0 + 1)
        parts.append(
            f"SELECT polygon_id, CAST(COUNT(*) AS BIGINT) AS n_cells,\n"
            f"       CAST({bb} AS BIGINT) AS bbox_cells,\n"
            f"       CAST(COUNT(*) AS DOUBLE) / {bb} AS coverage\n"
            f"FROM (({rasterize_polygons_sql([p], z)}))\n"
            f"GROUP BY 1")
    return "\nUNION ALL\n".join(parts)
