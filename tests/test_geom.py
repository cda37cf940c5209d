"""Unit tests for fixed-point geodesy kernels (pure numpy, no Ray needed)."""

from __future__ import annotations

import numpy as np

from pyofs_ray.core import geom


def test_geocode_ranges():
    k = np.arange(0, 100_000, dtype=np.int64)
    lon, lat = geom.geocode_key(k)
    assert lon.min() >= -geom.LON_OFFSET and lon.max() < geom.LON_OFFSET
    assert lat.min() >= -geom.LAT_OFFSET and lat.max() <= geom.LAT_OFFSET


def test_geocode_skew_host0():
    k = np.arange(0, 10_000, dtype=np.int64)
    h = geom.host_of_key(k)
    assert (h == 0).mean() > 0.69  # 70% hot host by construction


def test_geocode_matches_scalar_oracle():
    # independent scalar re-implementation (python ints, mathematical mod)
    for k in [0, 1, 7, 97, 12345, 999_983]:
        h = 0 if k % 10 < 7 else k % 97
        clon = (h * 73939 + 11243) % 360000
        clat = (h * 41387 + 7321) % 170000
        jlon = (k * 7919 + 13) % 4001 - 2000
        jlat = (k * 6563 + 17) % 4001 - 2000
        lon = (clon + jlon) % 360000 - 180000
        lat = min(max(clat + jlat, 0), 170000) - 85000
        glon, glat = geom.geocode_key(np.array([k], dtype=np.int64))
        assert (glon[0], glat[0]) == (lon, lat), k


def test_cell_pack_roundtrip():
    rng = np.random.default_rng(42)
    lon = rng.integers(-180000, 180000, 1000).astype(np.int64)
    lat = rng.integers(-85000, 85001, 1000).astype(np.int64)
    for zoom in (0, 1, 5, 10, 20):
        x, y = geom.cell_xy(lon, lat, zoom)
        n = 1 << zoom
        assert x.min() >= 0 and x.max() < n and y.min() >= 0 and y.max() < n
        cid = geom.pack_cell(zoom, x, y)
        z2, x2, y2 = geom.unpack_cell(cid)
        assert (z2 == zoom).all() and (x2 == x).all() and (y2 == y).all()


def test_parent_cell_halves():
    lon = np.array([-180000, -1, 0, 179999], dtype=np.int64)
    lat = np.array([85000, 0, -85000, 42], dtype=np.int64)
    c10 = geom.cell_of(lon, lat, 10)
    c9 = geom.cell_of(lon, lat, 9)
    assert (geom.parent_cell(c10, 1) == c9).all()
    assert (geom.parent_cell(c10, 10) == geom.cell_of(lon, lat, 0)).all()


def test_edge_cells_clamped():
    # south pole edge (lat=-85000) must clamp y to n-1, not n
    lon = np.array([179999], dtype=np.int64)
    lat = np.array([-85000], dtype=np.int64)
    x, y = geom.cell_xy(lon, lat, 10)
    assert y[0] == (1 << 10) - 1


def test_overview_levels():
    assert geom.overview_levels(3) == [3, 2, 1, 0]


def test_page_key_url_fallback_paths():
    """Non-fixture urls (no trailing integer) fall back to FNV hashing —
    deterministic, and mixed batches parse/hash per row correctly."""
    import pyarrow as pa

    from pyofs_ray.core.hashing import fnv1a64
    from pyofs_ray.stages.geocode import page_key_from_url

    urls = pa.array([
        "https://h0.example.com/p/123",           # parses → 123
        "https://other.site/article-about-rays",  # no digits → fnv
        "https://h5.example.com/p/999",           # parses → 999
    ])
    keys = page_key_from_url(urls)
    assert keys[0] == 123 and keys[2] == 999
    assert keys[1] == np.int64(np.uint64(fnv1a64(pa.array([urls[1].as_py()]))[0]))
    # explicit fnv mode hashes everything
    all_fnv = page_key_from_url(urls, key_fn="fnv")
    assert all_fnv[0] != 123
    again = page_key_from_url(urls)
    assert (keys == again).all()


def test_rotated_pole_roundtrip_and_identity():
    import numpy as np

    from pyofs_ray.functions.geo import find_pole, rotate_pole, unrotate_pole

    rng = np.random.default_rng(7)
    lon = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-85, 85, 500)
    pole = (37.5, 57.5)  # WCOFS-style rotated pole
    rlon, rlat = rotate_pole(lon, lat, pole)
    lon2, lat2 = unrotate_pole(rlon, rlat, pole)
    # unrotate ∘ rotate = identity (mod 360 on longitude)
    dlon = (lon2 - lon + 180.0) % 360.0 - 180.0
    assert np.abs(dlon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9
    # north-pole pole: rotation is a pure longitude shift
    rlon0, rlat0 = rotate_pole(lon, lat, (0.0, 90.0))
    assert np.abs(rlat0 - lat).max() < 1e-9
    # find_pole recovers the pole that flattens an iso-rotated-latitude ring
    ring_rlon = np.linspace(-30, 30, 40)
    ring_rlat = np.full(40, 20.0)
    glon, glat = unrotate_pole(ring_rlon, ring_rlat, pole)
    best = find_pole(glon, glat, starting_pole=(37.0, 57.0), samples=25,
                     sample_radius=1.0)
    assert abs(best[0] - pole[0]) < 0.3 and abs(best[1] - pole[1]) < 0.3


def test_translate_geographic_roundtrip():
    import numpy as np

    from pyofs_ray.functions.geo import translate_geographic_coordinates as tr

    lon = np.array([-122.5, 0.0, 45.0])
    lat = np.array([37.7, 0.0, -30.0])
    lon2, lat2 = tr(lon, lat, 1000.0, -500.0)
    lon3, lat3 = tr(lon2, lat2, -1000.0, 500.0)
    assert np.abs(lon3 - lon).max() < 1e-9 and np.abs(lat3 - lat).max() < 1e-9
    # 1 km east at the equator ≈ 0.008983 degrees
    elon, _ = tr(np.array([0.0]), np.array([0.0]), 1000.0, 0.0)
    assert abs(elon[0] - 0.0089831528) < 1e-6


def test_path_utilities():
    import numpy as np
    import pytest

    from pyofs_ray.functions.paths import (parse_partition_dir, partition_dir,
                                           split_layer_filename)
    from pyofs_ray.functions.timeutil import ten_minute_range

    assert split_layer_filename("out/contours.gpkg:sse") == ("out/contours.gpkg", "sse")
    assert split_layer_filename("plain/file.tiff") == ("plain/file.tiff", None)
    assert split_layer_filename("a:b/c.tiff") == ("a:b/c.tiff", None)
    assert partition_dir("day", "2024-01-01") == "day=2024-01-01"
    assert parse_partition_dir("day=2024-01-01") == ("day", "2024-01-01")
    with pytest.raises(ValueError):
        parse_partition_dir("nokey")
    r = ten_minute_range(np.datetime64("2024-01-01T00:00"),
                         np.datetime64("2024-01-01T01:00"))
    assert len(r) == 6
