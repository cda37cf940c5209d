"""Flagship pipeline: pages → geocode/cell-encode → per-cell aggregate →
tile pyramid (→ optional PIP join / parquet sink + manifest).

This is the Ray-Data re-imagining of PyOFS's daily Leaflet conversion
(`main/leaflet/write_daily_average.py:632-709`, SURVEY.md §3.1): read →
crop/transform → time/ensemble average → raster + overviews → manifest,
expressed as one lazy streaming Dataset graph.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..core import geom
from ..sources.pages import pages_dataset
from ..stages.agg import add_mean_column, two_stage_cell_agg
from ..stages.geocode import geocode
from ..stages.tiles import build_pyramid


def _attach_n_chars(batch: pa.Table) -> pa.Table:
    # UTF-8 length of text (matches DuckDB length() on VARCHAR = chars)
    n = pc.utf8_length(batch["text"]).cast(pa.int64())
    return batch.append_column("n_chars", n)


def geocoded_pages(sf_dir: str, zoom: int = geom.BASE_ZOOM) -> ray.data.Dataset:
    """pages + page_key/lon/lat/cell_id + n_chars; html projected away."""
    ds = pages_dataset(sf_dir, with_html=False)
    ds = geocode(ds, zoom=zoom)
    return ds.map_batches(_attach_n_chars, batch_format="pyarrow", zero_copy_batch=True)


def cell_aggregates(sf_dir: str, zoom: int = geom.BASE_ZOOM) -> ray.data.Dataset:
    """Per-cell doc_count / n_chars_sum / mean_chars at the base zoom —
    the two-stage (partial → final) shuffle of SURVEY.md A1."""
    ds = geocoded_pages(sf_dir, zoom)
    ds = ds.select_columns(["cell_id", "n_chars"])
    agg = two_stage_cell_agg(ds, keys=("cell_id",), int_sum_cols=("n_chars",))
    return agg.map_batches(lambda b: add_mean_column(b, "n_chars_sum", "doc_count", "mean_chars"),
                           batch_format="pyarrow", zero_copy_batch=True)


def tile_pyramid(sf_dir: str, z_base: int = geom.BASE_ZOOM, z_min: int = 0) -> ray.data.Dataset:
    """Full pyramid of tile rows (z, x, y, cell_id, doc_count, agg_value)."""
    base = cell_aggregates(sf_dir, z_base).select_columns(["cell_id", "n_chars_sum", "doc_count"])
    return build_pyramid(base, z_base=z_base, z_min=z_min)


def polygon_cell_agg(sf_dir: str, zoom: int = geom.BASE_ZOOM) -> ray.data.Dataset:
    """PIP inner join → per-(polygon, cell) doc_count / n_chars_sum — the
    mask-then-average composition of SURVEY.md J1→A1 as one streaming plan."""
    from ..stages.agg import two_stage_cell_agg
    from ..stages.pip import pip_join

    ds = geocoded_pages(sf_dir, zoom).select_columns(
        ["cell_id", "n_chars", "lon_milli", "lat_milli"])
    joined = pip_join(ds, mode="inner")
    return two_stage_cell_agg(joined, keys=("polygon_id", "cell_id"),
                              int_sum_cols=("n_chars",))


def flagship(sf_dir: str, z_base: int = geom.BASE_ZOOM) -> ray.data.Dataset:
    return tile_pyramid(sf_dir, z_base=z_base)
