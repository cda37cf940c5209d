"""3×3 focal mean over the cell grid (stages/focal.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.core import geom
from pyofs_ray.stages.focal import focal_mean


def _cells(z, triples):
    """triples: (x, y, s, cnt)."""
    x = np.array([t[0] for t in triples], np.int64)
    y = np.array([t[1] for t in triples], np.int64)
    return ray.data.from_arrow(pa.table({
        "cell_id": pa.array(geom.pack_cell(z, x, y)),
        "n_chars_sum": pa.array(np.array([t[2] for t in triples], np.int64)),
        "doc_count": pa.array(np.array([t[3] for t in triples], np.int64)),
    }))


def _by_xy(df, z):
    out = {}
    for r in df.itertuples():
        _, x, y = geom.unpack_cell(np.array([r.cell_id]))
        out[(int(x[0]), int(y[0]))] = r
    return out


def test_focal_mean_isolated_and_adjacent():
    z = 4
    # two adjacent cells + one isolated cell
    ds = _cells(z, [(5, 5, 100, 2), (6, 5, 40, 1), (10, 10, 9, 3)])
    df = focal_mean(ds).to_pandas()
    got = _by_xy(df, z)
    assert set(got) == {(5, 5), (6, 5), (10, 10)}
    a, b, iso = got[(5, 5)], got[(6, 5)], got[(10, 10)]
    assert (a.focal_chars_sum, a.focal_doc_count) == (140, 3)
    assert (b.focal_chars_sum, b.focal_doc_count) == (140, 3)
    assert a.focal_mean_chars == 140 / 3
    assert (iso.focal_chars_sum, iso.focal_doc_count,
            iso.focal_mean_chars) == (9, 3, 3.0)


def test_focal_mean_antimeridian_wrap_and_pole_clamp():
    z = 3  # grid 8×8
    # x=0 and x=7 are wrap-neighbors; y=0 has no north neighbors
    ds = _cells(z, [(0, 0, 10, 1), (7, 0, 30, 1), (0, 7, 7, 7)])
    df = focal_mean(ds).to_pandas()
    got = _by_xy(df, z)
    a, b = got[(0, 0)], got[(7, 0)]
    # each sees the other across the antimeridian; nothing above y=0
    assert (a.focal_chars_sum, a.focal_doc_count) == (40, 2)
    assert (b.focal_chars_sum, b.focal_doc_count) == (40, 2)
    # bottom edge cell: alone, clamped at y=7
    c = got[(0, 7)]
    assert (c.focal_chars_sum, c.focal_doc_count) == (7, 7)


def test_focal_mean_missing_center_not_emitted():
    z = 4
    ds = _cells(z, [(2, 2, 5, 1)])
    df = focal_mean(ds).to_pandas()
    # neighbors of (2,2) receive contributions but don't exist → no rows
    assert len(df) == 1
    _, x, y = geom.unpack_cell(df["cell_id"].to_numpy())
    assert (int(x[0]), int(y[0])) == (2, 2)
