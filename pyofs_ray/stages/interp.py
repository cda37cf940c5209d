"""Bilinear vector→raster interpolation (SURVEY.md J3) — the
`wcofs.py:1791-1827` `interpolate_grid` analogue: scatter page points onto
the regular cell grid with bilinear weights over the 4 surrounding cell
centers (`scipy.interpolate.griddata(method='linear')` re-imagined as a
weighted scatter-add, which is the transpose of gather-interpolation and
expresses as one groupby).

Exact fixed-point scheme (bit-stable vs the DuckDB twin in
`bilinear_sql`):

    Q = 1024 (weight quantum; lower it for >10^10-row corpora so
    Σ w·value stays in int64)
    gx_q = ((lon_milli + 180000) * 2^z * Q) // 360000      # Q-ths of a cell
    sx   = gx_q + OFF - Q//2      # OFF = Q·2^z keeps division positive
    x0   = clamp(sx // Q - 2^z, 0, 2^z - 2); fx = clamp(sx - (x0 + 2^z)·Q, 0, Q)
    weights: (Q - fx) → column x0, fx → column x0 + 1   (same for y)

Each page scatter-adds ``w = wx·wy ∈ [0, Q²]`` and ``w·value`` into its 4
corner cells; per-batch partial combine, then one groupby-sum; the final
``interp_value = wv_sum / w_sum`` is a single IEEE division. Edge pages
clamp to the border cells (the reference's NaN-edge padding analogue,
`wcofs.py:371-396`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from ..core import geom

Q = 1024


def _axis_corners(pos_milli: np.ndarray, z: int, rng: int, off: int):
    """→ (i0, w0, w1): lower cell index + the two weights along one axis."""
    n = np.int64(1) << z
    g = (pos_milli.astype(np.int64) + off) * n * Q // rng
    s = g + Q * n - Q // 2
    i0 = np.clip(s // Q - n, 0, max(n - 2, 0))
    f = np.clip(s - (i0 + n) * Q, 0, Q)
    if n == 1:  # degenerate single-cell grid: all weight to cell 0; the
        f = np.zeros_like(f)  # zero-weight phantom corner is filtered out
    return i0, Q - f, f


def bilinear_corner_rows(b: pa.Table, z: int, value_col: str = "n_chars") -> pa.Table:
    """4 (cell_id, w, wv) rows per page, partial-combined within the batch."""
    lon = b["lon_milli"].to_numpy(zero_copy_only=False)
    lat = b["lat_milli"].to_numpy(zero_copy_only=False)
    val = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
    x0, wx0, wx1 = _axis_corners(lon, z, geom.LON_RANGE, geom.LON_OFFSET)
    # y axis runs north-down: position = 85000 - lat
    y0, wy0, wy1 = _axis_corners(geom.LAT_OFFSET - lat, z, geom.LAT_RANGE, 0)
    cells, ws, wvs = [], [], []
    for xi, wxi in ((x0, wx0), (x0 + 1, wx1)):
        for yi, wyi in ((y0, wy0), (y0 + 1, wy1)):
            w = wxi * wyi
            cells.append(geom.pack_cell(z, xi, yi))
            ws.append(w)
            wvs.append(w * val)
    t = pa.table({
        "cell_id": pa.array(np.concatenate(cells)),
        "w": pa.array(np.concatenate(ws)),
        "wv": pa.array(np.concatenate(wvs)),
    })
    g = t.group_by("cell_id").aggregate([("w", "sum"), ("wv", "sum")])
    return pa.table({"cell_id": g["cell_id"],
                     "w": g["w_sum"].cast(pa.int64()),
                     "wv": g["wv_sum"].cast(pa.int64())})


def bilinear_cells(ds: ray.data.Dataset, z: int = geom.BASE_ZOOM,
                   value_col: str = "n_chars") -> ray.data.Dataset:
    """geocoded pages → per-cell bilinear-interpolated value field."""
    from .agg import auto_partitions

    import pyarrow.compute as pc

    partial = ds.map_batches(lambda b: bilinear_corner_rows(b, z, value_col),
                             batch_format="pyarrow", zero_copy_batch=True)
    agg = (partial.repartition(auto_partitions())
                  .groupby("cell_id")
                  .aggregate(Sum("w", alias_name="w_sum"),
                             Sum("wv", alias_name="wv_sum")))

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["w_sum"], 0))
        val = pc.divide(pc.cast(t["wv_sum"], pa.float64()),
                        pc.cast(t["w_sum"], pa.float64()))
        return t.append_column("interp_value", val)

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def bilinear_sql(z: int = geom.BASE_ZOOM) -> str:
    """DuckDB twin over the pages CTE (LENGTH(text) as the value)."""
    n = 1 << z
    zx = 1 << geom.CELL_X_SHIFT
    zterm = z * (1 << geom.CELL_Z_SHIFT)

    def axis(pos: str, rng: int) -> tuple[str, str]:
        g = f"((({pos}) * {n} * {Q}) // {rng})"
        s = f"({g} + {Q * n} - {Q // 2})"
        i0 = f"LEAST(GREATEST({s} // {Q} - {n}, 0), {n - 2})"
        return i0, s

    ix0, sx = axis(f"lon_milli + {geom.LON_OFFSET}", geom.LON_RANGE)
    iy0, sy = axis(f"{geom.LAT_OFFSET} - lat_milli", geom.LAT_RANGE)
    corners = []
    for dx in (0, 1):
        for dy in (0, 1):
            fx = f"LEAST(GREATEST({sx} - (x0 + {n}) * {Q}, 0), {Q})"
            fy = f"LEAST(GREATEST({sy} - (y0 + {n}) * {Q}, 0), {Q})"
            wx = f"({Q} - {fx})" if dx == 0 else fx
            wy = f"({Q} - {fy})" if dy == 0 else fy
            corners.append(f"""
SELECT {zterm} + (x0 + {dx}) * {zx} + (y0 + {dy}) AS cell_id,
       {wx} * {wy} AS w, {wx} * {wy} * LENGTH(text) AS wv
FROM pts""")
    union = "\nUNION ALL\n".join(corners)
    return f"""
pts AS (SELECT lon_milli, lat_milli, text, {ix0} AS x0, {iy0} AS y0 FROM pages),
corners AS ({union})
SELECT cell_id, CAST(SUM(w) AS BIGINT) AS w_sum, CAST(SUM(wv) AS BIGINT) AS wv_sum,
       CAST(SUM(wv) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS interp_value
FROM corners GROUP BY cell_id HAVING SUM(w) > 0"""
