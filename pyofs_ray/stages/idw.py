"""Inverse-distance-weighted (IDW) interpolation of station observations
onto the cell grid — the third grid re-interpolation kernel (SURVEY.md J3)
next to nearest and bilinear (`stages/interp.py`): PyOFS interpolates buoy /
HFR point observations onto its model grid the same way
(`/root/reference/main/observation/hf_radar.py` grids point obs; the classic
scattered-point → raster method is Shepard IDW).

Determinism contract: the 3 nearest stations per cell center are picked by
pure-integer (d², station_id) order; the IDW value is then a FIXED-SHAPE
IEEE expression over the three (value, d²) pairs —
``(v1/d1 + v2/d2 + v3/d3) / (1/d1 + 1/d2 + 1/d3)`` evaluated in written
order on both sides, so the result is bit-identical to the DuckDB twin
(no reduction-order hazard: the expression has constant arity). An exact
grid hit (d² = 0, only possible at rank 1 after the tie-break) short-
circuits to that station's value before any division.

The station "observation" is synthesized from position
(``(s_lon + s_lat) mod 1000`` with safe-mod) so the oracle can re-derive
it — the pluggable ``value_of`` hook takes a real measurement column.

Scale shape (100 TB): input is the cell table (grid-bounded, ≤ 4^z rows);
stations broadcast once via ``ray.put``; ONE stateless ``map_batches``
pass does the whole kNN + pivot + expression per batch (dense d² matrix
against the ≤10³-station catalog — the `knn.py` ring index takes over for
larger catalogs). Zero exchanges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..core import geom


def station_value(lon_milli: np.ndarray, lat_milli: np.ndarray) -> np.ndarray:
    """Synthetic observation: position-derived so SQL can recompute it."""
    v = (lon_milli.astype(np.int64) + lat_milli.astype(np.int64)) % 1000
    return ((v + 1000) % 1000).astype(np.int64)


def cell_centers(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Integer milli-degree cell-center coordinates (floor of the exact
    half-cell midpoint — the SQL twin uses the identical // form)."""
    z, x, y = geom.unpack_cell(cell_id)
    n = np.int64(1) << z
    lon = ((2 * x + 1) * np.int64(geom.LON_RANGE)) // (2 * n) \
        - geom.LON_OFFSET
    lat = geom.LAT_OFFSET - ((2 * y + 1) * np.int64(geom.LAT_RANGE)) \
        // (2 * n)
    return lon, lat


def idw_interpolate(cells: ray.data.Dataset, station_rows: list[dict],
                    *, cell_col: str = "cell_id", k: int = 3
                    ) -> ray.data.Dataset:
    """Per-cell IDW value from the ``k``(=3) nearest stations.

    Output: ``cell_id, lon_c, lat_c, d2_1, idw_value``."""
    if k != 3:
        raise ValueError("the fixed-arity IEEE expression is k=3; other k "
                         "need their own pivot width")
    rows = sorted(station_rows, key=lambda r: r["station_id"])
    ref = ray.put({
        "lon": np.array([r["lon_milli"] for r in rows], np.int64),
        "lat": np.array([r["lat_milli"] for r in rows], np.int64),
    })

    def interp(b: pa.Table) -> pa.Table:
        st = ray.get(ref)
        sv = station_value(st["lon"], st["lat"])
        cid = b[cell_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = cell_centers(cid)
        # dense integer d² against the broadcast catalog (cells × stations)
        d2 = ((lon[:, None] - st["lon"][None, :]) ** 2
              + (lat[:, None] - st["lat"][None, :]) ** 2)
        # 3 nearest with (d², station index==id order) tie-break: stations
        # are sorted by id, so argsort(kind="stable") IS the tie-break
        near = np.argsort(d2, axis=1, kind="stable")[:, :3]
        rr = np.arange(len(cid))[:, None]
        nd2 = d2[rr, near].astype(np.float64)
        nv = sv[near].astype(np.float64)
        # fixed-shape IEEE expression, written order — matches the twin
        with np.errstate(divide="ignore", invalid="ignore"):
            num = nv[:, 0] / nd2[:, 0] + nv[:, 1] / nd2[:, 1] \
                + nv[:, 2] / nd2[:, 2]
            den = 1.0 / nd2[:, 0] + 1.0 / nd2[:, 1] + 1.0 / nd2[:, 2]
            val = num / den
        hit = nd2[:, 0] == 0.0
        val[hit] = nv[hit, 0]
        return pa.table({
            "cell_id": pa.array(cid),
            "lon_c": pa.array(lon), "lat_c": pa.array(lat),
            "d2_1": pa.array(d2[rr, near][:, 0]),
            "idw_value": pa.array(val),
        })

    return cells.map_batches(interp, batch_format="pyarrow",
                             zero_copy_batch=True)


def idw_interpolate_sql(pages_prefix: str, stations_cte: str,
                        z: int) -> str:
    """Bit-exact DuckDB twin: same integer centers, same (d², station_id)
    ROW_NUMBER pick, same fixed-order IEEE expression."""
    n = 1 << z
    return f"""{pages_prefix},
{stations_cte},
cells AS (
  SELECT DISTINCT {z} * {1 << geom.CELL_Z_SHIFT}
         + ({_x_expr(z)}) * {1 << geom.CELL_X_SHIFT}
         + ({_y_expr(z)}) AS cell_id,
         ((2 * ({_x_expr(z)}) + 1) * {geom.LON_RANGE}) // {2 * n}
           - {geom.LON_OFFSET} AS lon_c,
         {geom.LAT_OFFSET} - ((2 * ({_y_expr(z)}) + 1) * {geom.LAT_RANGE})
           // {2 * n} AS lat_c
  FROM pages
), ranked AS (
  SELECT c.cell_id, c.lon_c, c.lat_c,
         ((s.s_lon + s.s_lat) % 1000 + 1000) % 1000 AS v,
         (c.lon_c - s.s_lon) * (c.lon_c - s.s_lon)
           + (c.lat_c - s.s_lat) * (c.lat_c - s.s_lat) AS d2,
         ROW_NUMBER() OVER (PARTITION BY c.cell_id
                            ORDER BY (c.lon_c - s.s_lon) * (c.lon_c - s.s_lon)
                                   + (c.lat_c - s.s_lat) * (c.lat_c - s.s_lat),
                                     s.station_id) AS rnk
  FROM cells c CROSS JOIN stations s
), piv AS (
  SELECT cell_id, lon_c, lat_c,
         MAX(CASE WHEN rnk = 1 THEN CAST(v AS DOUBLE) END) AS v1,
         MAX(CASE WHEN rnk = 2 THEN CAST(v AS DOUBLE) END) AS v2,
         MAX(CASE WHEN rnk = 3 THEN CAST(v AS DOUBLE) END) AS v3,
         MAX(CASE WHEN rnk = 1 THEN CAST(d2 AS DOUBLE) END) AS d1,
         MAX(CASE WHEN rnk = 2 THEN CAST(d2 AS DOUBLE) END) AS d2_,
         MAX(CASE WHEN rnk = 3 THEN CAST(d2 AS DOUBLE) END) AS d3,
         MAX(CASE WHEN rnk = 1 THEN d2 END) AS d2_1
  FROM ranked WHERE rnk <= 3
  GROUP BY 1, 2, 3
)
SELECT cell_id, lon_c, lat_c, CAST(d2_1 AS BIGINT) AS d2_1,
       CASE WHEN d1 = 0 THEN v1
            ELSE (v1 / d1 + v2 / d2_ + v3 / d3)
                 / (1 / d1 + 1 / d2_ + 1 / d3) END AS idw_value
FROM piv"""


def _x_expr(z: int) -> str:
    from ..core import sqlgen
    return sqlgen.x_expr(z)


def _y_expr(z: int) -> str:
    from ..core import sqlgen
    return sqlgen.y_expr(z)
