"""Change-detection raster + raster→vector boundary (pipelines/flagship)."""

import numpy as np
import pandas as pd

from pyofs_ray.pipelines import flagship


def test_cell_change_raster_windows_partition(tmp_path):
    """Every cell's two window counts sum to its total count and delta is
    exactly b - a (cross-checked against the plain cell aggregate)."""
    sf = "/root/testdata/sf0.001"
    ch = flagship.cell_change_raster(sf).to_pandas()
    tot = flagship.cell_aggregates(sf).to_pandas()[["cell_id", "doc_count"]]
    m = ch.merge(tot, on="cell_id", how="outer", indicator=True)
    assert (m["_merge"] == "both").all()
    assert (m.doc_count_a + m.doc_count_b == m.doc_count).all()
    assert (m.delta == m.doc_count_b - m.doc_count_a).all()
    assert (ch.doc_count_a + ch.doc_count_b > 0).all()


def test_cell_boundary_subset_of_above_cells():
    """Boundary cells are above-threshold cells; interior cells (all 4
    neighbors above) are excluded; n_above_nbrs < 4 for every row."""
    sf = "/root/testdata/sf0.001"
    T = flagship.BOUNDARY_MEAN_CHARS
    cells = flagship.cell_aggregates(sf).to_pandas()
    above = cells[cells.n_chars_sum >= T * cells.doc_count]
    got = flagship.cell_boundary_vector(sf).to_pandas()
    assert set(got.cell_id) <= set(above.cell_id)
    assert (got.n_above_nbrs < 4).all()
    # reference check with a dict-based neighbor count
    from pyofs_ray.core import geom
    az, ax, ay = geom.unpack_cell(above.cell_id.to_numpy())
    n = 1 << int(az[0]) if len(az) else 0
    above_set = set(zip(ax.tolist(), ay.tolist()))
    want = set()
    for x, y, cid in zip(ax.tolist(), ay.tolist(),
                         above.cell_id.tolist()):
        nbrs = sum(((x + dx) % n, y + dy) in above_set
                   for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
                   if 0 <= y + dy < n)
        if nbrs < 4:
            want.add(cid)
    assert set(got.cell_id) == want


def test_cell_exemplar_is_partitioning_stable_min():
    sf = "/root/testdata/sf0.001"
    got = flagship.cell_exemplar(sf).to_pandas()
    assert got.cell_id.is_unique
    # reference: min (md5(url), page_key) per cell
    import hashlib
    pages = flagship.geocoded_pages(sf).to_pandas()
    pages["h"] = pages.url.map(
        lambda u: hashlib.md5(u.encode()).hexdigest())
    want = (pages.sort_values(["cell_id", "h", "page_key"])
            .groupby("cell_id").head(1))
    m = got.merge(want[["cell_id", "page_key"]], on="cell_id",
                  suffixes=("", "_w"))
    assert (m.page_key == m.page_key_w).all()


def test_cell_day_coverage_bounds():
    sf = "/root/testdata/sf0.001"
    cov = flagship.cell_day_coverage(sf).to_pandas()
    assert cov.n_days.between(1, 30).all()
    assert np.allclose(cov.coverage, cov.n_days / 30.0)
    # totals consistent with the distinct (cell, day) count
    pages = flagship.geocoded_pages(sf).to_pandas()
    days = pages.warc_ts.astype("int64") // flagship.US_PER_DAY
    want = (pd.DataFrame({"cell_id": pages.cell_id, "day": days})
            .drop_duplicates().groupby("cell_id").size())
    got = cov.set_index("cell_id").n_days.sort_index()
    assert (got == want.sort_index()).all()
