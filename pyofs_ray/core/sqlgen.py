"""DuckDB-SQL twins of the fixed-point kernels in `core.geom`.

Every oracle query the driver runs (``__ray_entry__.oracle_sql()``) is built
from these fragments, so the SQL and the numpy kernels encode the *same*
documented arithmetic — integer milli-degrees, integer cell math — and results
are bit-identical. DuckDB's ``%`` keeps the dividend sign (C-style), so any
possibly-negative operand goes through the ``((x % m) + m) % m`` safe-mod.
"""

from __future__ import annotations

from . import geom

# pages := deterministic Common-Crawl-style view of the driver's `documents`
# table per BASELINE.json input_hint (url, warc_ts, html, text, lang).
# html is engine-side only (binary; never part of an oracle-checked result).
PAGES_CTE = f"""
pages AS (
  SELECT
    doc_id AS page_key,
    'https://h' || CAST(h AS VARCHAR) || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
    TIMESTAMP '2024-01-01 00:00:00' + ((doc_id * 37) % 2592000) * INTERVAL 1 SECOND AS warc_ts,
    text,
    lang,
    ((((h * {geom.CLON_MUL} + {geom.CLON_ADD}) % {geom.LON_RANGE})
       + ((doc_id * {geom.JLON_MUL} + {geom.JLON_ADD}) % {geom.JITTER_MOD}) - 2000)
      % {geom.LON_RANGE} + {geom.LON_RANGE}) % {geom.LON_RANGE} - {geom.LON_OFFSET} AS lon_milli,
    LEAST(GREATEST(((h * {geom.CLAT_MUL} + {geom.CLAT_ADD}) % {geom.LAT_RANGE})
       + ((doc_id * {geom.JLAT_MUL} + {geom.JLAT_ADD}) % {geom.JITTER_MOD}) - 2000,
       0), {geom.LAT_RANGE}) - {geom.LAT_OFFSET} AS lat_milli
  FROM (
    SELECT doc_id, text, lang,
           CASE WHEN doc_id % 10 < {geom.HOST_HOT_FRAC} THEN 0
                ELSE doc_id % {geom.HOST_MOD} END AS h
    FROM documents
  )
)"""


def x_expr(z: int, lon: str = "lon_milli") -> str:
    n = 1 << z
    return (f"LEAST(GREATEST((({lon} + {geom.LON_OFFSET}) * {n}) // {geom.LON_RANGE}, 0), {n - 1})")


def y_expr(z: int, lat: str = "lat_milli") -> str:
    n = 1 << z
    return (f"LEAST(GREATEST((({geom.LAT_OFFSET} - {lat}) * {n}) // {geom.LAT_RANGE}, 0), {n - 1})")


def cell_expr(z: int, lon: str = "lon_milli", lat: str = "lat_milli") -> str:
    """int64 cell_id = (z<<52) | (x<<26) | y as pure integer SQL."""
    return (f"({z} * {1 << geom.CELL_Z_SHIFT} + {x_expr(z, lon)} * {1 << geom.CELL_X_SHIFT}"
            f" + {y_expr(z, lat)})")


def pages_prefix() -> str:
    return f"WITH {PAGES_CTE}"
