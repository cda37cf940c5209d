from __future__ import annotations

from itertools import combinations

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.stages.hull import extreme_points, group_extreme_points


def _brute_extreme(pts: set[tuple[int, int]]) -> set[tuple[int, int]]:
    """p is extreme iff p not in conv(others): closed-triangle + segment
    membership over all triples/pairs (O(n^4) reference)."""

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def in_closed_triangle(p, a, b, c):
        d1, d2, d3 = cross(a, b, p), cross(b, c, p), cross(c, a, p)
        if cross(a, b, c) == 0:  # degenerate — fall back to segments
            return False
        has_neg = d1 < 0 or d2 < 0 or d3 < 0
        has_pos = d1 > 0 or d2 > 0 or d3 > 0
        return not (has_neg and has_pos)

    def on_segment(p, a, b):
        if cross(a, b, p) != 0:
            return False
        return (min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
                and min(a[1], b[1]) <= p[1] <= max(a[1], b[1]))

    out = set()
    for p in pts:
        others = [q for q in pts if q != p]
        inside = any(on_segment(p, a, b) for a, b in combinations(others, 2))
        if not inside:
            inside = any(in_closed_triangle(p, a, b, c)
                         for a, b, c in combinations(others, 3))
        if not inside:
            out.add(p)
    return out


def test_extreme_points_matches_brute_force():
    rng = np.random.RandomState(7)
    for trial in range(6):
        n = rng.randint(4, 36)
        x = rng.randint(-50, 50, n).astype(np.int64)
        y = rng.randint(-50, 50, n).astype(np.int64)
        hx, hy = extreme_points(x, y)
        got = set(zip(hx.tolist(), hy.tolist()))
        want = _brute_extreme(set(zip(x.tolist(), y.tolist())))
        assert got == want, f"trial {trial}: {got} != {want}"


def test_extreme_points_collinear_and_degenerate():
    # all collinear: only the two endpoints are extreme
    x = np.array([0, 10, 20, 30], np.int64)
    y = np.array([0, 10, 20, 30], np.int64)
    hx, hy = extreme_points(x, y)
    assert set(zip(hx.tolist(), hy.tolist())) == {(0, 0), (30, 30)}
    # midpoint of a square edge is NOT extreme (strict vertices only)
    x = np.array([0, 10, 10, 0, 5], np.int64)
    y = np.array([0, 0, 10, 10, 0], np.int64)
    hx, hy = extreme_points(x, y)
    assert set(zip(hx.tolist(), hy.tolist())) == {(0, 0), (10, 0),
                                                  (10, 10), (0, 10)}
    # duplicates collapse
    hx, hy = extreme_points(np.array([3, 3, 3], np.int64),
                            np.array([4, 4, 4], np.int64))
    assert list(zip(hx.tolist(), hy.tolist())) == [(3, 4)]


def test_group_extreme_points_decomposes_across_batches():
    rng = np.random.RandomState(11)
    rows = []
    for host in ("a.com", "b.com"):
        for _ in range(120):
            rows.append({"host": host,
                         "lon_milli": int(rng.randint(-2000, 2000)),
                         "lat_milli": int(rng.randint(-1000, 1000))})
    t = pa.Table.from_pylist(rows)
    ds = ray.data.from_arrow(t).repartition(7)  # force multi-batch partials
    out = group_extreme_points(ds).to_pandas()
    for host in ("a.com", "b.com"):
        sub = [r for r in rows if r["host"] == host]
        hx, hy = extreme_points(
            np.array([r["lon_milli"] for r in sub], np.int64),
            np.array([r["lat_milli"] for r in sub], np.int64))
        want = set(zip(hx.tolist(), hy.tolist()))
        g = out[out["host"] == host]
        got = set(zip(g["lon_milli"].tolist(), g["lat_milli"].tolist()))
        assert got == want
