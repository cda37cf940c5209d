"""Polygon rasterization (stages/raster.py)."""

import numpy as np

from pyofs_ray.core import geom
from pyofs_ray.sources.fixtures import Polygon, study_polygons
from pyofs_ray.stages.idw import cell_centers
from pyofs_ray.stages.pip import PolygonIndex
from pyofs_ray.stages.raster import cell_range, rasterize_polygons


def test_square_polygon_covers_exact_center_grid():
    # an axis-aligned square: covered cells = those whose center is inside
    z = 8
    sq = Polygon("sq", np.array([10_000, 30_000, 30_000, 10_000], np.int64),
                 np.array([5_000, 5_000, 25_000, 25_000], np.int64))
    out = rasterize_polygons([sq], z=z).to_pandas()
    assert len(out) > 0
    lon_c, lat_c = cell_centers(out.cell_id.to_numpy())
    idx = PolygonIndex([sq])
    assert idx.contains(0, lon_c, lat_c).all()
    # completeness: every candidate cell with an inside center is present
    x0, x1 = cell_range(10_000, 30_000, z, "x")
    y0, y1 = cell_range(5_000, 25_000, z, "y")
    gx, gy = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
    cid = geom.pack_cell(z, gx.ravel().astype(np.int64),
                         gy.ravel().astype(np.int64))
    lc, tc = cell_centers(cid)
    want = set(cid[idx.contains(0, lc, tc)].tolist())
    assert set(out.cell_id) == want


def test_fixture_polygons_consistent_with_pip_membership():
    """Every raster cell's center PIP-tests inside its polygon, for the
    real fixture set (concave stars, antimeridian parts included)."""
    out = rasterize_polygons().to_pandas()
    polys = study_polygons()
    pidx = {p.polygon_id: i for i, p in enumerate(polys)}
    index = PolygonIndex(polys)
    assert len(out) > 0
    for pid, grp in out.groupby("polygon_id"):
        lon_c, lat_c = cell_centers(grp.cell_id.to_numpy())
        assert index.contains(pidx[pid], lon_c, lat_c).all()


def test_polygon_cell_area_consistent_with_raster():
    from pyofs_ray.stages.raster import polygon_cell_area
    area = polygon_cell_area().to_pandas().set_index("polygon_id")
    rast = rasterize_polygons().to_pandas()
    counts = rast.groupby("polygon_id").size()
    assert (area.n_cells.sort_index() == counts.sort_index()).all()
    assert ((area.coverage > 0) & (area.coverage <= 1)).all()
    assert (area.n_cells <= area.bbox_cells).all()


# ------------------------------------------------ morphological opening

def test_cell_raster_open_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["cell_raster_open"](SF_SMOKE),
                          duck_smoke, ORACLES["cell_raster_open"])


def test_cell_raster_open_anti_extensive_and_core_consistent():
    """Opening ⊆ the above-threshold set; every core cell has all four
    neighbors above; non-core opened cells are adjacent to a core cell."""
    import duckdb
    from pyofs_ray.registry import QUERIES
    from pyofs_ray.pipelines.flagship import (BOUNDARY_MEAN_CHARS)
    from pyofs_ray.core import sqlgen, geom
    from tests.conftest import SF_SMOKE

    out = QUERIES["cell_raster_open"](SF_SMOKE).to_pandas()
    assert len(out) > 0 and set(out.core.unique()) <= {0, 1}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/documents.parquet')")
    z = geom.BASE_ZOOM
    ab = con.sql(f"""{sqlgen.pages_prefix()},
c AS (SELECT {sqlgen.x_expr(z)} AS x, {sqlgen.y_expr(z)} AS y,
             SUM(LENGTH(text)) AS s, COUNT(*) AS cnt
      FROM pages GROUP BY 1, 2)
SELECT x, y FROM c WHERE s >= {BOUNDARY_MEAN_CHARS} * cnt""").fetchdf()
    above = set(zip(ab.x.astype(int), ab.y.astype(int)))
    opened = set(zip(out.x.astype(int), out.y.astype(int)))
    assert opened <= above  # anti-extensive
    n = 1 << z
    core = set(zip(out[out.core == 1].x.astype(int),
                   out[out.core == 1].y.astype(int)))
    for (x, y) in core:
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            assert ((x + dx) % n, y + dy) in above
    for (x, y) in opened - core:
        assert any(((x + dx) % n, y + dy) in core
                   for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)))
