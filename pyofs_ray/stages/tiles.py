"""XYZ tile-pyramid materialization — raster↔vector for the web-page corpus.

Analogue of PyOFS raster writes + overview pyramids (`wcofs.py:645-711`
`write_raster` with `build_overviews`, levels from
`PyOFS/__init__.py:202-209`; SURVEY.md K1/A7) and of grid re-interpolation
(`wcofs.py:1791-1827` `interpolate_grid`, SURVEY.md J3):

- **vector→raster**: per-cell aggregates at the base zoom (from
  `stages.agg.two_stage_cell_agg`) become tile rows ``(z, x, y, cell_id,
  doc_count, sum cols, agg_value)``.
- **overview cascade**: each coarser zoom is a ``map_batches`` partial
  re-key to the parent cell + a small groupby-sum — a cascade of shrinking
  shuffles, never touching the original rows again (the `Resampling.average`
  overview analogue, kept exact by carrying int sums + counts, means derived
  at the end).
- **raster→vector**: `tiles_to_cells` unpacks tile rows back to cell records.

Partitioning assumption: the level-z shuffle keys on ``parent cell`` — each
level has ≤ 1/4 the groups of the previous, so the cascade cost is a geometric
series dominated by the base zoom.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from ..core import geom
from .agg import add_mean_column


def _emit_all_levels(batch: pa.Table, z_base: int, z_min: int,
                     sum_cols: Sequence[str]) -> pa.Table:
    """Per base cell, emit one partial row per pyramid level (parent rekey),
    combined within the batch — the whole cascade becomes ONE shuffle whose
    input is ≤ (#levels × #base cells) pre-combined rows."""
    cell = batch["cell_id"].to_numpy(zero_copy_only=False)
    parts = []
    for dz in range(0, z_base - z_min + 1):
        key = cell if dz == 0 else geom.parent_cell(cell, dz)
        parts.append(pa.table({"cell_id": pa.array(key, pa.int64()),
                               **{c: batch[c] for c in sum_cols}}))
    t = pa.concat_tables(parts)
    g = t.group_by("cell_id").aggregate([(c, "sum") for c in sum_cols])
    return pa.table({"cell_id": g["cell_id"],
                     **{c: g[f"{c}_sum"].cast(pa.int64()) for c in sum_cols}})


def _attach_zxy(batch: pa.Table) -> pa.Table:
    z, x, y = geom.unpack_cell(batch["cell_id"].to_numpy(zero_copy_only=False))
    return (batch.append_column("z", pa.array(z.astype("int32")))
                 .append_column("x", pa.array(x.astype("int32")))
                 .append_column("y", pa.array(y.astype("int32"))))


def build_pyramid(
    base_cells: ray.data.Dataset,
    z_base: int = geom.BASE_ZOOM,
    z_min: int = 0,
    sum_cols: Sequence[str] = ("n_chars_sum", "doc_count"),
    value_sum: str = "n_chars_sum",
) -> ray.data.Dataset:
    """Per-cell base aggregates → all pyramid levels z_base..z_min, with
    ``agg_value = value_sum / doc_count`` per tile (exact int sums).

    Single-shuffle cascade: every batch of base cells emits its partial rows
    for ALL levels (rekeyed to each ancestor, combined within the batch),
    then one groupby-sum finishes every level at once. A naive level-by-level
    cascade costs (#levels) sequential shuffles with fixed per-exchange
    latency; here the exchange volume is the same geometric series but paid
    in one all-to-all. ``cell_id`` embeds z, so one key spans the pyramid.
    """
    from .agg import auto_partitions

    emitted = base_cells.select_columns(["cell_id", *sum_cols]).map_batches(
        lambda b: _emit_all_levels(b, z_base, z_min, sum_cols),
        batch_format="pyarrow", zero_copy_batch=True)
    tiles = (emitted.repartition(auto_partitions())
             .groupby("cell_id")
             .aggregate(*[Sum(c, alias_name=c) for c in sum_cols]))
    tiles = tiles.map_batches(_attach_zxy, batch_format="pyarrow", zero_copy_batch=True)
    return tiles.map_batches(
        lambda b: add_mean_column(b, value_sum, "doc_count", "agg_value"),
        batch_format="pyarrow", zero_copy_batch=True)


def pyramid_from_rows(ds: ray.data.Dataset, z_base: int = geom.BASE_ZOOM,
                      z_min: int = 0, value_col: str = "n_chars",
                      batch_size: int = 65536,
                      agg_partitions: int | None = None) -> ray.data.Dataset:
    """Raw (cell_id, value) rows → the COMPLETE tile pyramid in ONE shuffle.

    The per-batch partial combines rows per base cell, rekeys the combined
    partials to every ancestor level, and combines again — so the single
    groupby receives ≤ (#levels × #cells-per-batch) pre-reduced rows and
    produces base + all overview levels at once. This replaces base-agg +
    per-level cascade (N all-to-alls) with one exchange: in this Ray
    version each extra all-to-all in a plan costs seconds of fixed
    scheduling wall regardless of data volume, and at cluster scale each
    is a full barrier.
    """
    from .agg import auto_partitions, partial_group_sums

    sum_cols = [f"{value_col}_sum", "doc_count"]

    def partial(b: pa.Table) -> pa.Table:
        g = partial_group_sums(b, ["cell_id"], [value_col])
        return _emit_all_levels(g, z_base, z_min, sum_cols)

    emitted = ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=batch_size, zero_copy_batch=True)
    # Final combine: the partial stream is bounded by the GRID, not the
    # corpus — ≤ (4/3)·4^z_base rows total (≈1.4M at z=10) no matter how
    # many documents flowed in. A single coalesced Arrow group_by therefore
    # replaces the sort-based all-to-all (which costs seconds of fixed wall
    # per exchange in this Ray version) and stays scale-correct for
    # z_base ≤ ~12; pass agg_partitions to shuffle-reduce instead for
    # finer grids where one task can't hold the cell table.
    if agg_partitions:
        tiles = (emitted.repartition(agg_partitions)
                 .groupby("cell_id")
                 .aggregate(*[Sum(c, alias_name=c) for c in sum_cols]))
    else:
        def combine(b: pa.Table) -> pa.Table:
            g = b.group_by("cell_id").aggregate([(c, "sum") for c in sum_cols])
            return pa.table({"cell_id": g["cell_id"],
                             **{c: g[f"{c}_sum"].cast(pa.int64()) for c in sum_cols}})

        tiles = emitted.repartition(1).map_batches(
            combine, batch_format="pyarrow", zero_copy_batch=True)
    tiles = tiles.map_batches(_attach_zxy, batch_format="pyarrow", zero_copy_batch=True)
    return tiles.map_batches(
        lambda b: add_mean_column(b, sum_cols[0], "doc_count", "agg_value"),
        batch_format="pyarrow", zero_copy_batch=True)


def tiles_to_cells(tiles: ray.data.Dataset) -> ray.data.Dataset:
    """raster→vector: tile rows back to per-cell records (pass-through of the
    packed id plus unpacked coordinates — the `wcofs.py:713-835` record
    builder analogue, minus Python-per-record loops)."""
    return tiles.select_columns(["cell_id", "z", "x", "y", "doc_count", "agg_value"])


def delta_pyramid_from_pages(ds: ray.data.Dataset, split_us: int,
                             z_base: int = geom.BASE_ZOOM, z_min: int = 0,
                             batch_size: int = 65536) -> ray.data.Dataset:
    """Change detection at EVERY zoom level: the two crawl windows'
    per-cell counts and their delta, for the full pyramid, in the SAME
    single exchange as `pyramid_from_rows` — both windows' partials are
    per-batch integer masks riding one rekey cascade, so multi-resolution
    diffing costs exactly one all-to-all.

    Input: rows with ``cell_id`` and ``warc_ts``. Output per tile:
    ``cell_id, z, x, y, doc_count_a, doc_count_b, delta``."""
    sum_cols = ["cnt_a", "cnt_b"]

    def partial(b: pa.Table) -> pa.Table:
        import numpy as np
        us = b["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        in_a = (us < split_us).astype("int64")
        t = pa.table({"cell_id": b["cell_id"],
                      "cnt_a": pa.array(in_a),
                      "cnt_b": pa.array(np.int64(1) - in_a)})
        g = t.group_by("cell_id").aggregate([(c, "sum") for c in sum_cols])
        g = pa.table({"cell_id": g["cell_id"],
                      **{c: g[f"{c}_sum"].cast(pa.int64())
                         for c in sum_cols}})
        return _emit_all_levels(g, z_base, z_min, sum_cols)

    emitted = ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=batch_size, zero_copy_batch=True)

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by("cell_id").aggregate([(c, "sum") for c in sum_cols])
        return pa.table({"cell_id": g["cell_id"],
                         **{c: g[f"{c}_sum"].cast(pa.int64())
                            for c in sum_cols}})

    # grid-bounded finish (≤ (4/3)·4^z_base rows) — see pyramid_from_rows
    tiles = emitted.repartition(1).map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True)
    tiles = tiles.map_batches(_attach_zxy, batch_format="pyarrow",
                              zero_copy_batch=True)

    def finish(b: pa.Table) -> pa.Table:
        import numpy as np
        a = b["cnt_a"].to_numpy(zero_copy_only=False).astype("int64")
        bb = b["cnt_b"].to_numpy(zero_copy_only=False).astype("int64")
        return pa.table({"cell_id": b["cell_id"].cast(pa.int64()),
                         "z": b["z"], "x": b["x"], "y": b["y"],
                         "doc_count_a": pa.array(a),
                         "doc_count_b": pa.array(bb),
                         "delta": pa.array(bb - a)})

    return tiles.map_batches(finish, batch_format="pyarrow",
                             zero_copy_batch=True)
