"""Model↔obs co-registration + validation metrics and stencil/composite
pipelines (SURVEY.md J5/J6/A4/A6 — the `data_assimilation_validation.py`
analogue re-imagined over web pages).

Two "instruments" are carved from the same corpus: English pages (the
"model" field) vs non-English pages (the "observation" field). Both are
cell-encoded at a shared zoom, aggregated per cell (two-stage), joined on
``cell_id``, and compared with RMSE / R².

Exactness: per-cell means are int64-sum / count (single division); the
difference/variance terms are re-quantized to fixed-point milli-units
(``round(x * 1000)`` int64) before the cross-cell sums, so both sums are
exact integers and RMSE/R² are single IEEE expressions — bit-identical to
the DuckDB oracle regardless of reduction order (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..core import geom, sqlgen
from ..stages.agg import two_stage_cell_agg
from ..stages.composite import last_per_cell, neighbor_grad
from .flagship import geocoded_pages

VAL_ZOOM = 6   # coarse zoom so the two fields overlap on many cells
GRAD_ZOOM = 9  # fine enough that hot clusters span multi-cell stencils


def _field(sf_dir: str, english: bool, zoom: int) -> ray.data.Dataset:
    ds = geocoded_pages(sf_dir, zoom)
    pred = (pc.equal if english else pc.not_equal)

    def filt(b: pa.Table) -> pa.Table:
        return b.filter(pred(b["lang"], pa.scalar("en"))).select(["cell_id", "n_chars"])

    ds = ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
    return two_stage_cell_agg(ds, keys=("cell_id",), int_sum_cols=("n_chars",))


def coregistration_metrics(sf_dir: str, zoom: int = VAL_ZOOM) -> pd.DataFrame:
    """RMSE and R² between per-cell mean text length of en vs non-en pages
    over cells where both exist (the J6 join + A6 metrics)."""
    a = _field(sf_dir, True, zoom).to_pandas()   # model field (small: ≤ #cells)
    b = _field(sf_dir, False, zoom).to_pandas()  # obs field
    m = a.merge(b, on="cell_id", suffixes=("_m", "_o"))
    va = m["n_chars_sum_m"].to_numpy(np.float64) / m["doc_count_m"].to_numpy(np.float64)
    vo = m["n_chars_sum_o"].to_numpy(np.float64) / m["doc_count_o"].to_numpy(np.float64)
    n = len(m)
    if n == 0:
        return pd.DataFrame({"n_cells": [0], "rmse": [np.nan], "r2": [np.nan]})
    # fixed-point quantization: floor(x + 0.5) == DuckDB ROUND for x ≥ 0,
    # avoiding the numpy(half-even) vs SQL(half-away) tie split
    diff_mu = np.floor((va - vo) * 1000 + 0.5).astype(np.int64)
    vo_mu = np.floor(vo * 1000 + 0.5).astype(np.int64)
    ss_res = int((diff_mu * diff_mu).sum())                      # exact int64
    mean_mu = int(np.floor(float(vo_mu.sum()) / n + 0.5))        # quantized mean
    dev = vo_mu - mean_mu
    ss_tot = int((dev * dev).sum())                              # exact int64
    rmse = float(np.sqrt(float(ss_res) / n)) / 1000.0
    r2 = 1.0 - float(ss_res) / float(ss_tot) if ss_tot else np.nan
    return pd.DataFrame({"n_cells": [n], "rmse": [rmse], "r2": [r2]})


def _field_sql(english: bool, zoom: int) -> str:
    op = "=" if english else "!="
    return f"""
  SELECT {sqlgen.cell_expr(zoom)} AS cell_id,
         CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars_sum,
         CAST(COUNT(*) AS BIGINT) AS doc_count
  FROM pages WHERE lang {op} 'en' GROUP BY 1"""


def coregistration_sql(zoom: int = VAL_ZOOM) -> str:
    # FLOOR(x + 0.5) quantization on both sides (see coregistration_metrics)
    return f"""{sqlgen.pages_prefix()},
fa AS ({_field_sql(True, zoom)}),
fb AS ({_field_sql(False, zoom)}),
j AS (
  SELECT CAST(FLOOR((CAST(fa.n_chars_sum AS DOUBLE) / fa.doc_count
                   - CAST(fb.n_chars_sum AS DOUBLE) / fb.doc_count) * 1000 + 0.5) AS BIGINT) AS diff_mu,
         CAST(FLOOR((CAST(fb.n_chars_sum AS DOUBLE) / fb.doc_count) * 1000 + 0.5) AS BIGINT) AS vo_mu
  FROM fa JOIN fb USING (cell_id)
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(SUM(diff_mu * diff_mu) AS BIGINT) AS ss_res,
         CAST(FLOOR(CAST(SUM(vo_mu) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS mean_mu
  FROM j
)
SELECT s.n_cells,
       sqrt(CAST(s.ss_res AS DOUBLE) / s.n_cells) / 1000.0 AS rmse,
       1.0 - CAST(s.ss_res AS DOUBLE)
           / CAST((SELECT SUM((vo_mu - s.mean_mu) * (vo_mu - s.mean_mu)) FROM j) AS DOUBLE) AS r2
FROM s"""


# ------------------------------------------------------------- composite A4
def latest_page_per_cell(sf_dir: str, zoom: int = geom.BASE_ZOOM) -> ray.data.Dataset:
    ds = geocoded_pages(sf_dir, zoom).select_columns(
        ["cell_id", "warc_ts", "page_key", "lang"])
    return last_per_cell(ds, keys=("cell_id",),
                         order_cols=("warc_ts", "page_key"),
                         payload_cols=("page_key", "warc_ts", "lang"))


LATEST_PAGE_SQL = f"""{sqlgen.pages_prefix()}
SELECT cell_id, lang, page_key, warc_ts FROM (
  SELECT {sqlgen.cell_expr(geom.BASE_ZOOM)} AS cell_id, lang, page_key, warc_ts,
         ROW_NUMBER() OVER (PARTITION BY {sqlgen.cell_expr(geom.BASE_ZOOM)}
                            ORDER BY warc_ts DESC, page_key DESC) AS rn
  FROM pages
) WHERE rn = 1"""


# --------------------------------------------------- velocity de-rotation M5
# WCOFS's grid is rotated by a constant angle; de-rotation multiplies every
# (u, v) by the same rotation matrix (`wcofs.py:362-396`). The angle's
# cos/sin are Python-computed once and inlined into the SQL twin as float
# literals, so each output value is the same two-multiply-one-subtract IEEE
# chain on both sides — bit-exact.
ROTATION_DEG = 38.0  # WCOFS-like constant grid rotation


def cell_uv_derotated(sf_dir: str, zoom: int = GRAD_ZOOM) -> ray.data.Dataset:
    """De-rotated per-cell gradient vector field: cells with both gradient
    components get (u, v) rotated into geographic axes plus speed —
    the M5 kernel (`functions/geo.rotate_uv`) as a pipeline stage over the
    J5 stencil output."""
    from ..functions.geo import rotate_uv

    grads = cell_gradients(sf_dir, zoom)
    angle = np.deg2rad(ROTATION_DEG)

    def derotate(b: pa.Table) -> pa.Table:
        gx = b["grad_x"].to_numpy(zero_copy_only=False)
        gy = b["grad_y"].to_numpy(zero_copy_only=False)
        keep = ~(np.isnan(gx) | np.isnan(gy))
        u, v = rotate_uv(gx[keep], gy[keep], angle)
        return pa.table({
            "cell_id": b["cell_id"].to_numpy(zero_copy_only=False)[keep],
            "u_rot": pa.array(u), "v_rot": pa.array(v),
            "speed": pa.array(np.sqrt(u * u + v * v)),
        })

    return grads.map_batches(derotate, batch_format="pyarrow",
                             zero_copy_batch=True)


def cell_uv_derotated_sql(zoom: int = GRAD_ZOOM) -> str:
    c = repr(float(np.cos(np.deg2rad(ROTATION_DEG))))
    s = repr(float(np.sin(np.deg2rad(ROTATION_DEG))))
    c, s = f"CAST('{c}' AS DOUBLE)", f"CAST('{s}' AS DOUBLE)"
    return f"""WITH g AS ({cell_gradients_sql(zoom).lstrip()})
SELECT cell_id,
       grad_x * {c} - grad_y * {s} AS u_rot,
       grad_x * {s} + grad_y * {c} AS v_rot,
       sqrt((grad_x * {c} - grad_y * {s}) * (grad_x * {c} - grad_y * {s})
            + (grad_x * {s} + grad_y * {c}) * (grad_x * {s} + grad_y * {c})) AS speed
FROM g WHERE grad_x IS NOT NULL AND grad_y IS NOT NULL"""


# ------------------------------------------------------------- stencil J5
def cell_gradients(sf_dir: str, zoom: int = GRAD_ZOOM) -> ray.data.Dataset:
    ds = geocoded_pages(sf_dir, zoom).select_columns(["cell_id", "n_chars"])
    cells = two_stage_cell_agg(ds, keys=("cell_id",), int_sum_cols=("n_chars",))
    return neighbor_grad(cells)


def cell_gradients_sql(zoom: int = GRAD_ZOOM) -> str:
    z_term = zoom * (1 << geom.CELL_Z_SHIFT)
    return f"""{sqlgen.pages_prefix()},
cells AS (
  SELECT {sqlgen.x_expr(zoom)} AS x, {sqlgen.y_expr(zoom)} AS y,
         CAST(SUM(LENGTH(text)) AS DOUBLE) / COUNT(*) AS v
  FROM pages GROUP BY 1, 2
),
gx AS (
  SELECT {z_term} + (w.x + 1) * {1 << geom.CELL_X_SHIFT} + w.y AS cell_id,
         e.v - w.v AS grad_x
  FROM cells w JOIN cells e ON e.x = w.x + 2 AND e.y = w.y
),
gy AS (
  SELECT {z_term} + n.x * {1 << geom.CELL_X_SHIFT} + (n.y + 1) AS cell_id,
         s.v - n.v AS grad_y
  FROM cells n JOIN cells s ON s.y = n.y + 2 AND s.x = n.x
)
SELECT COALESCE(gx.cell_id, gy.cell_id) AS cell_id, grad_x, grad_y
FROM gx FULL OUTER JOIN gy ON gx.cell_id = gy.cell_id"""
