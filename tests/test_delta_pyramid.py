"""Delta pyramid + host extent (flagship round-4 session ops)."""

import numpy as np

from pyofs_ray.pipelines import flagship


def test_delta_pyramid_levels_consistent():
    """Every level's window counts sum to its children's; level z_base
    matches cell_change_raster exactly; deltas add up per level."""
    sf = "/root/testdata/sf0.001"
    pyr = flagship.tile_pyramid_delta(sf).to_pandas()
    base = pyr[pyr.z == 10]
    flat = flagship.cell_change_raster(sf).to_pandas()
    m = base.merge(flat, on="cell_id", suffixes=("", "_f"))
    assert len(m) == len(flat) == len(base)
    assert (m.doc_count_a == m.doc_count_a_f).all()
    assert (m.delta == m.delta_f).all()
    # per-level totals are invariant (every page in exactly one cell/level)
    tot = pyr.groupby("z")[["doc_count_a", "doc_count_b", "delta"]].sum()
    assert (tot.nunique() == 1).all()
    assert (pyr.delta == pyr.doc_count_b - pyr.doc_count_a).all()
    # root tile exists and holds the global totals
    root = pyr[pyr.z == 0]
    assert len(root) == 1


def test_host_extent_brackets_points():
    sf = "/root/testdata/sf0.001"
    ext = flagship.host_extent(sf).to_pandas().set_index("host")
    pages = flagship.geocoded_pages(sf).to_pandas()
    pages["host"] = pages.url.str.split("/").str[2]
    g = pages.groupby("host").agg(
        lon_min=("lon_milli", "min"), lon_max=("lon_milli", "max"),
        lat_min=("lat_milli", "min"), lat_max=("lat_milli", "max"),
        n_pages=("lon_milli", "size"))
    assert (ext.sort_index() == g.sort_index()).all().all()
