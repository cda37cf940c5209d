"""Grid-DBSCAN: oracle parity + component-kernel unit tests."""

from __future__ import annotations

import numpy as np
import pytest

from pyofs_ray.core import geom
from pyofs_ray.registry import ORACLES, QUERIES
from pyofs_ray.stages.cluster import DBSCAN_ZOOM, _min_label_components

from .conftest import SF_SMOKE, assert_matches_oracle


def test_cell_dbscan_oracle(duck_smoke):
    assert_matches_oracle(QUERIES["cell_dbscan"](SF_SMOKE), duck_smoke,
                          ORACLES["cell_dbscan"])


def _cells(xy):
    x = np.array([p[0] for p in xy], np.int64)
    y = np.array([p[1] for p in xy], np.int64)
    cid = geom.pack_cell(DBSCAN_ZOOM, x, y)
    return x, y, cid


def test_min_label_two_components():
    # L-shaped blob at origin + separate diagonal pair far away: diagonal
    # (8-neighbor) adjacency must connect, a 2-cell gap must not
    x, y, cid = _cells([(0, 0), (1, 0), (1, 1), (5, 5), (6, 6), (9, 9)])
    lbl = _min_label_components(x, y, cid)
    assert lbl[0] == lbl[1] == lbl[2] == cid.min()
    assert lbl[3] == lbl[4] == min(cid[3], cid[4])
    assert lbl[5] == cid[5]  # isolated singleton
    assert len(set(lbl)) == 3


def test_min_label_long_chain_converges():
    # a 40-cell horizontal chain: label must propagate the full diameter
    pts = [(i, 3) for i in range(40)]
    x, y, cid = _cells(pts)
    lbl = _min_label_components(x, y, cid)
    assert (lbl == cid.min()).all()


def test_min_label_no_wraparound():
    # x=0 and x=n-1 share no edge (no antimeridian wrap) — two components
    n = (1 << DBSCAN_ZOOM) - 1
    x, y, cid = _cells([(0, 10), (n, 10)])
    lbl = _min_label_components(x, y, cid)
    assert lbl[0] != lbl[1]


def test_dbscan_clusters_partition_dense_points():
    df = QUERIES["cell_dbscan"](SF_SMOKE).to_pandas()
    # cluster ids are dense-cell ids themselves, so distinct and positive
    assert df.cluster_id.is_unique
    assert (df.n_cells >= 1).all() and (df.n_points >= df.n_cells).all()
