"""IDW interpolation (stages/idw.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.core import geom
from pyofs_ray.stages.idw import (
    cell_centers, idw_interpolate, station_value)


def _stations(coords):
    return [{"station_id": f"st{i:03d}", "lon_milli": x, "lat_milli": y}
            for i, (x, y) in enumerate(coords)]


def _cells(z, xy):
    x = np.array([p[0] for p in xy], np.int64)
    y = np.array([p[1] for p in xy], np.int64)
    return ray.data.from_arrow(pa.table({
        "cell_id": pa.array(geom.pack_cell(z, x, y))}))


def test_idw_matches_reference_expression():
    z = 6
    st = _stations([(10_000, 5_000), (-40_000, 20_000), (90_000, -30_000),
                    (140_000, 60_000)])
    ds = _cells(z, [(3, 7), (40, 20), (60, 50)])
    out = idw_interpolate(ds, st).to_pandas().sort_values("cell_id")
    lon = np.array([s["lon_milli"] for s in st], np.int64)
    lat = np.array([s["lat_milli"] for s in st], np.int64)
    v = station_value(lon, lat).astype(np.float64)
    cid = out.cell_id.to_numpy()
    clon, clat = cell_centers(cid)
    assert (out.lon_c.to_numpy() == clon).all()
    for i, (cx, cy) in enumerate(zip(clon, clat)):
        d2 = (cx - lon) ** 2 + (cy - lat) ** 2
        near = np.argsort(d2, kind="stable")[:3]
        nd, nv = d2[near].astype(float), v[near]
        want = ((nv[0] / nd[0] + nv[1] / nd[1] + nv[2] / nd[2])
                / (1.0 / nd[0] + 1.0 / nd[1] + 1.0 / nd[2]))
        assert out.idw_value.iloc[i] == want
        assert out.d2_1.iloc[i] == nd[0]


def test_idw_exact_hit_takes_station_value():
    z = 6
    # cell (3, 7) center:
    cid = geom.pack_cell(z, np.array([3], np.int64), np.array([7], np.int64))
    cx, cy = cell_centers(cid)
    st = _stations([(int(cx[0]), int(cy[0])), (0, 0), (50_000, 50_000),
                    (-50_000, -50_000)])
    out = idw_interpolate(_cells(z, [(3, 7)]), st).to_pandas()
    v0 = station_value(np.array([int(cx[0])]), np.array([int(cy[0])]))[0]
    assert out.d2_1.iloc[0] == 0
    assert out.idw_value.iloc[0] == float(v0)


def test_idw_tie_breaks_by_station_id():
    z = 6
    cid = geom.pack_cell(z, np.array([3], np.int64), np.array([7], np.int64))
    cx, cy = int(cell_centers(cid)[0][0]), int(cell_centers(cid)[1][0])
    # two equidistant pairs: ids decide ranks deterministically
    st = _stations([(cx - 1000, cy), (cx + 1000, cy),
                    (cx, cy - 2000), (cx, cy + 2000)])
    out = idw_interpolate(_cells(z, [(3, 7)]), st).to_pandas()
    lon = np.array([s["lon_milli"] for s in st], np.int64)
    lat = np.array([s["lat_milli"] for s in st], np.int64)
    v = station_value(lon, lat).astype(float)
    # ranks: st000, st001 (d²=1e6 each), then st002 (d²=4e6)
    nd = np.array([1e6, 1e6, 4e6])
    nv = np.array([v[0], v[1], v[2]])
    want = ((nv[0] / nd[0] + nv[1] / nd[1] + nv[2] / nd[2])
            / (1 / nd[0] + 1 / nd[1] + 1 / nd[2]))
    assert out.idw_value.iloc[0] == want
