from __future__ import annotations

import numpy as np

from pyofs_ray.core import geom
from pyofs_ray.pipelines import flagship
from pyofs_ray.pipelines.flagship import HEX_H, HEX_W

from .conftest import SF_SMOKE


def _rowcol(lon, lat):
    row = (lat + geom.LAT_OFFSET) // HEX_H
    col = (lon + geom.LON_OFFSET + HEX_W - (row % 2) * (HEX_W // 2)) // HEX_W
    return row, col


def test_hex_rowcol_staggering():
    # two points at the same longitude, one row apart: odd row shifts the
    # column boundary by half a cell width
    # just BEFORE the odd-row half-shifted edge (even-row edge is at W)
    lon = -geom.LON_OFFSET + HEX_W // 2 - 10
    r0, c0 = _rowcol(lon, -geom.LAT_OFFSET + 1)          # row 0 (even)
    r1, c1 = _rowcol(lon, -geom.LAT_OFFSET + HEX_H + 1)  # row 1 (odd)
    assert r0 == 0 and r1 == 1
    assert c1 == c0 - 1  # half-width shift moved the point across an edge


def test_hex_cell_agg_matches_recount(ray_session):
    out = flagship.hex_cell_agg(SF_SMOKE).to_pandas()
    pages = flagship.geocoded_pages(SF_SMOKE).to_pandas()
    row, col = _rowcol(pages["lon_milli"].to_numpy().astype(np.int64),
                       pages["lat_milli"].to_numpy().astype(np.int64))
    pages["hex_id"] = row * (1 << 32) + col
    ref = (pages.groupby("hex_id")
           .agg(n_chars_sum=("n_chars", "sum"), doc_count=("n_chars", "size"))
           .reset_index())
    got = (out[["hex_id", "n_chars_sum", "doc_count"]]
           .sort_values("hex_id").reset_index(drop=True))
    ref = ref.sort_values("hex_id").reset_index(drop=True)
    assert got.astype(int).equals(ref.astype(int))
    # id decode round-trips
    hid = out["hex_id"].to_numpy().astype(np.int64)
    assert (out["hex_row"].to_numpy() == (hid >> 32)).all()
    assert (out["hex_col"].to_numpy() == (hid & ((1 << 32) - 1))).all()
