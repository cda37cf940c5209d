"""kNN kernel tests: ring index == brute force, tie-break determinism,
k > station count, and e2e oracle parity."""

from __future__ import annotations

import numpy as np

from pyofs_ray.core import geom
from pyofs_ray.registry import ORACLES, QUERIES, _knn_rows
from pyofs_ray.sources.fixtures import stations
from pyofs_ray.stages.knn import StationIndex

from .conftest import SF_SMOKE, assert_matches_oracle


def _rand_points(n=3000, seed=11):
    rng = np.random.default_rng(seed)
    lon = rng.integers(-geom.LON_OFFSET, geom.LON_OFFSET, n).astype(np.int64)
    lat = rng.integers(-geom.LAT_OFFSET, geom.LAT_OFFSET + 1, n).astype(np.int64)
    return lon, lat


def test_rings_equal_bruteforce():
    idx = StationIndex(stations())
    lon, lat = _rand_points()
    for k in (1, 3, 5):
        br_r, br_c, br_d, br_k = idx.topk_brute(lon, lat, k)
        rg_r, rg_c, rg_d, rg_k = idx.topk_rings(lon, lat, k)
        import pandas as pd
        a = pd.DataFrame({"r": br_r, "c": br_c, "d": br_d, "k": br_k}).sort_values(["r", "k"]).reset_index(drop=True)
        b = pd.DataFrame({"r": rg_r, "c": rg_c, "d": rg_d, "k": rg_k}).sort_values(["r", "k"]).reset_index(drop=True)
        assert a.equals(b), f"ring/brute mismatch at k={k}"


def test_tie_break_by_station_id():
    # two stations exactly equidistant from the midpoint → lower id wins rank 1
    rows = [
        {"station_id": "stB", "lon_milli": 1000, "lat_milli": 0},
        {"station_id": "stA", "lon_milli": -1000, "lat_milli": 0},
    ]
    idx = StationIndex(rows)
    r, c, d, k = idx.topk_brute(np.array([0], np.int64), np.array([0], np.int64), 2)
    assert idx.ids[c[0]] == "stA" and idx.ids[c[1]] == "stB"
    assert d[0] == d[1] == 1000 * 1000
    r2, c2, d2, k2 = idx.topk_rings(np.array([0], np.int64), np.array([0], np.int64), 2)
    assert (c == c2).all()


def test_k_exceeds_station_count():
    rows = stations()[:2]
    idx = StationIndex(rows)
    lon, lat = _rand_points(50)
    r, c, d, k = idx.topk_rings(lon, lat, 10)
    assert k.max() == 2  # clamped to available stations


def test_knn_oracle(duck_smoke):
    assert_matches_oracle(QUERIES["knn_stations"](SF_SMOKE), duck_smoke,
                          ORACLES["knn_stations"])


def test_knn_brute_kernel_matches_oracle(duck_smoke):
    assert_matches_oracle(_knn_rows(SF_SMOKE, kernel="brute"), duck_smoke,
                          ORACLES["knn_stations"])


# ------------------------------------------------------------- radius join

def test_radius_kernels_equal_and_inclusive():
    import numpy as np
    from pyofs_ray.sources.fixtures import stations
    from pyofs_ray.stages.knn import (StationIndex, _radius_pairs_brute,
                                      _radius_pairs_rings)
    idx = StationIndex(stations())
    rng = np.random.RandomState(7)
    lon = rng.randint(-179_000, 179_000, 200).astype(np.int64)
    lat = rng.randint(-84_000, 84_000, 200).astype(np.int64)
    # include a query exactly AT a station: d2=0 must be emitted
    lon[0], lat[0] = idx.lon[0], idx.lat[0]
    for radius in (0, 5_000, 10_000, 50_000):
        br, bc, bd = _radius_pairs_brute(idx, lon, lat, radius * radius)
        rr, rc, rd = _radius_pairs_rings(idx, lon, lat, radius)
        b = sorted(zip(br.tolist(), bc.tolist(), bd.tolist()))
        r = sorted(zip(rr.tolist(), rc.tolist(), rd.tolist()))
        assert b == r
    # inclusivity at the exact boundary
    q_lon = np.array([idx.lon[0] + 7], np.int64)
    q_lat = np.array([idx.lat[0]], np.int64)
    br, bc, bd = _radius_pairs_rings(idx, q_lon, q_lat, 7)
    assert (0, 49) in set(zip(bc.tolist(), bd.tolist())) or 49 in bd.tolist()


def test_stations_within_radius_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["stations_within_radius"](SF_SMOKE),
                          duck_smoke, ORACLES["stations_within_radius"])


def test_coverage_gaps_complement_of_radius_semi():
    # gaps ∪ {pages with ≥1 station in radius} = all pages, disjoint
    from pyofs_ray.pipelines import flagship
    from pyofs_ray.stages.knn import coverage_gaps, radius_join
    from tests.conftest import SF_SMOKE

    ds = flagship.geocoded_pages(SF_SMOKE).select_columns(
        ["page_key", "lon_milli", "lat_milli"])
    total = ds.count()
    gaps = set(coverage_gaps(ds, 10_000).to_pandas().page_key)
    near = set(radius_join(ds, 10_000).to_pandas().page_key)
    assert gaps.isdisjoint(near)
    assert len(gaps) + len(near) == total


def test_coverage_gaps_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["station_coverage_gaps"](SF_SMOKE),
                          duck_smoke, ORACLES["station_coverage_gaps"])


# --------------------------------------------- directed Hausdorff audits

def test_host_station_hausdorff_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["host_station_hausdorff"](SF_SMOKE),
                          duck_smoke, ORACLES["host_station_hausdorff"])


def test_station_nearest_page_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["station_nearest_page"](SF_SMOKE),
                          duck_smoke, ORACLES["station_nearest_page"])


def test_host_hausdorff_is_max_of_min_d2():
    """The per-host hausdorff_d2 equals the max over that host's pages of
    the per-page min station distance (coverage_gaps' d2 with radius 0),
    and the witness page is the smallest page_key attaining it."""
    import numpy as np
    from pyofs_ray.pipelines import flagship
    from pyofs_ray.stages.hausdorff import host_station_hausdorff
    from pyofs_ray.stages.knn import coverage_gaps
    from tests.conftest import SF_SMOKE

    ds = flagship.geocoded_pages(SF_SMOKE).select_columns(
        ["page_key", "url", "lon_milli", "lat_milli"])
    out = host_station_hausdorff(ds).to_pandas()
    # reference: every page's min-d2 (radius 0 keeps all pages)
    ref = coverage_gaps(ds.select_columns(
        ["page_key", "lon_milli", "lat_milli"]), 0).to_pandas()
    urls = flagship.geocoded_pages(SF_SMOKE).select_columns(
        ["page_key", "url"]).to_pandas()
    urls["host"] = urls.url.str.split("/").str[2]
    ref = ref.merge(urls[["page_key", "host"]], on="page_key")
    g = ref.groupby("host")["d2"].max()
    assert len(out) == len(g)
    for _, r in out.iterrows():
        assert r.hausdorff_d2 == g[r.host]
        cand = ref[(ref.host == r.host) & (ref.d2 == r.hausdorff_d2)]
        assert r.worst_page == cand.page_key.min()
    assert int(out.n_pages.sum()) == len(urls)
