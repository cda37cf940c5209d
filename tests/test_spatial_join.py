"""Big-big spatial self-join (grid blocking + half-plane replication) vs
a brute-force all-pairs reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from pyofs_ray.core import geom
from pyofs_ray.stages.spatial_join import within_radius_pairs


def _brute(key, lon, lat, r):
    out = set()
    for i in range(len(key)):
        for j in range(i + 1, len(key)):
            d2 = (lon[i] - lon[j]) ** 2 + (lat[i] - lat[j]) ** 2
            if d2 <= r * r:
                a, b = sorted((key[i], key[j]))
                out.add((a, b, d2))
    return out


def _ds(key, lon, lat, blocks=3):
    return ray.data.from_arrow(pa.table({
        "page_key": pa.array(np.asarray(key, np.int64)),
        "lon_milli": pa.array(np.asarray(lon, np.int64)),
        "lat_milli": pa.array(np.asarray(lat, np.int64)),
    })).repartition(blocks)


def _got(ds, r, **kw):
    df = within_radius_pairs(ds, r, **kw).to_pandas()
    if df.empty:  # Ray 2.49: an ALL-empty map_groups result drops columns
        return set()
    return set(zip(df.key_a.astype(int), df.key_b.astype(int),
                   df.d2.astype(int)))


def test_pairs_match_brute_force_clustered():
    # dense cluster + sparse tail: exercises same-cell AND every
    # cross-cell direction
    rng = np.random.RandomState(7)
    n = 300
    lon = np.concatenate([rng.randint(-500, 500, n // 2),
                          rng.randint(-170000, 170000, n - n // 2)])
    lat = np.concatenate([rng.randint(-400, 400, n // 2),
                          rng.randint(-80000, 80000, n - n // 2)])
    key = np.arange(n)
    r = 250
    assert _got(_ds(key, lon, lat), r) == _brute(key, lon, lat, r)


def test_boundary_distance_inclusive_and_cell_edges():
    # pairs at EXACTLY distance r, points on cell boundaries (multiples of
    # the grid step), identical points (d2 = 0)
    r = 100
    key = np.arange(6)
    lon = np.array([0, r, 0, 2 * r, 2 * r, 0])
    lat = np.array([0, 0, r, 0, r + 1, 0])   # key 5 duplicates key 0
    got = _got(_ds(key, lon, lat), r)
    assert got == _brute(key, lon, lat, r)
    assert (0, 1, r * r) in got          # exactly r: inclusive
    assert (0, 5, 0) in got              # identical coordinates
    assert not any(a == 3 and b == 4 for a, b, _ in got)  # d=101 > r


def test_bucket_and_block_count_independent():
    rng = np.random.RandomState(11)
    key = np.arange(200)
    lon = rng.randint(-1000, 1000, 200)
    lat = rng.randint(-1000, 1000, 200)
    a = _got(_ds(key, lon, lat, blocks=2), 150, num_buckets=5)
    b = _got(_ds(key, lon, lat, blocks=9), 150, num_buckets=31)
    assert a == b == _brute(key, lon, lat, 150)


def test_domain_edges_no_wraparound():
    # antimeridian: planar metric — points at lon -179999 and +179999 are
    # NOT neighbors (documented; the SQL twin computes the same)
    key = np.arange(2)
    lon = np.array([-179999, 179999])
    lat = np.array([0, 0])
    assert _got(_ds(key, lon, lat), 250) == set()
    # poles clamp: both points at the lat cap still pair by lon distance
    key = np.arange(2)
    lon = np.array([0, 200])
    lat = np.array([geom.LAT_OFFSET, geom.LAT_OFFSET])
    got = _got(_ds(key, lon, lat), 250)
    assert got == {(0, 1, 200 * 200)}


def test_radius_validation():
    with pytest.raises(ValueError):
        within_radius_pairs(_ds([0], [0], [0]), 0)
