"""Property-based tests (hypothesis): vectorized kernels vs independent
scalar re-implementations over adversarial inputs. No Ray needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyofs_ray.core import geom
from pyofs_ray.sources.fixtures import Polygon
from pyofs_ray.stages.interp import Q, _axis_corners
from pyofs_ray.stages.pip import PolygonIndex

from pyofs_ray.stages.temporal import _match_backward

keys = st.integers(min_value=0, max_value=2**40)
lons = st.integers(min_value=-geom.LON_OFFSET, max_value=geom.LON_OFFSET - 1)
lats = st.integers(min_value=-geom.LAT_OFFSET, max_value=geom.LAT_OFFSET)
zooms = st.integers(min_value=0, max_value=20)


@settings(max_examples=200, deadline=None)
@given(k=keys)
def test_geocode_scalar_parity(k):
    h = 0 if k % 10 < 7 else k % 97
    clon = (h * geom.CLON_MUL + geom.CLON_ADD) % geom.LON_RANGE
    clat = (h * geom.CLAT_MUL + geom.CLAT_ADD) % geom.LAT_RANGE
    jlon = (k * geom.JLON_MUL + geom.JLON_ADD) % geom.JITTER_MOD - 2000
    jlat = (k * geom.JLAT_MUL + geom.JLAT_ADD) % geom.JITTER_MOD - 2000
    exp_lon = (clon + jlon) % geom.LON_RANGE - geom.LON_OFFSET
    exp_lat = min(max(clat + jlat, 0), geom.LAT_RANGE) - geom.LAT_OFFSET
    lon, lat = geom.geocode_key(np.array([k], np.int64))
    assert (lon[0], lat[0]) == (exp_lon, exp_lat)


@settings(max_examples=200, deadline=None)
@given(lon=lons, lat=lats, z=zooms)
def test_cell_scalar_parity_and_bounds(lon, lat, z):
    n = 1 << z
    exp_x = min(max((lon + geom.LON_OFFSET) * n // geom.LON_RANGE, 0), n - 1)
    exp_y = min(max((geom.LAT_OFFSET - lat) * n // geom.LAT_RANGE, 0), n - 1)
    x, y = geom.cell_xy(np.array([lon], np.int64), np.array([lat], np.int64), z)
    assert (x[0], y[0]) == (exp_x, exp_y)
    cid = geom.pack_cell(z, x, y)
    z2, x2, y2 = geom.unpack_cell(cid)
    assert (z2[0], x2[0], y2[0]) == (z, exp_x, exp_y)
    if z > 0:
        p = geom.parent_cell(cid, 1)
        pz, px, py = geom.unpack_cell(p)
        assert (pz[0], px[0], py[0]) == (z - 1, exp_x // 2, exp_y // 2)


def _scalar_inside(xs, ys, px, py):
    inside = False
    n = len(xs)
    for i in range(n):
        x1, y1 = int(xs[i]), int(ys[i])
        x2, y2 = int(xs[(i + 1) % n]), int(ys[(i + 1) % n])
        if (y1 > py) != (y2 > py):
            t = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
            if (t > 0) if y2 > y1 else (t < 0):
                inside = not inside
    return inside


polygon_rings = st.lists(
    st.tuples(st.integers(-50_000, 50_000), st.integers(-50_000, 50_000)),
    min_size=3, max_size=12, unique=True)


@settings(max_examples=100, deadline=None)
@given(ring=polygon_rings, px=st.integers(-60_000, 60_000),
       py=st.integers(-60_000, 60_000))
def test_pip_scalar_parity(ring, px, py):
    xs = np.array([r[0] for r in ring], np.int64)
    ys = np.array([r[1] for r in ring], np.int64)
    idx = PolygonIndex([Polygon("p", xs, ys)])
    got = idx.contains(0, np.array([px], np.int64), np.array([py], np.int64))[0]
    exp = _scalar_inside(xs, ys, px, py)
    # bbox pruning: outside the bbox the parity loop can't fire either
    if not (xs.min() <= px <= xs.max() and ys.min() <= py <= ys.max()):
        exp = False
    assert bool(got) == exp


@settings(max_examples=200, deadline=None)
@given(pos=st.integers(0, geom.LON_RANGE - 1), z=st.integers(0, 14))
def test_bilinear_axis_invariants(pos, z):
    i0, w0, w1 = _axis_corners(np.array([pos], np.int64), z, geom.LON_RANGE, 0)
    n = 1 << z
    assert w0[0] + w1[0] == Q
    assert 0 <= w0[0] <= Q and 0 <= w1[0] <= Q
    if n >= 2:
        assert 0 <= i0[0] <= n - 2
    else:
        assert i0[0] == 0


_small = st.integers(min_value=0, max_value=3)
_ts_vals = st.integers(min_value=-5, max_value=5)


@settings(max_examples=300, deadline=None)
@given(data=st.data())
def test_asof_match_backward_vs_bruteforce(data):
    """The lexsort+maximum.accumulate as-of matcher vs an O(n·m) scalar
    reference over adversarial tiny inputs: colliding keys, peer
    timestamps, tolerance boundaries. Unique tiebreaks keep the expected
    winner well-defined."""
    nl = data.draw(st.integers(min_value=0, max_value=10))
    nr = data.draw(st.integers(min_value=0, max_value=10))
    lk = np.array([data.draw(_small) for _ in range(nl)], np.int64)
    lt = np.array([data.draw(_ts_vals) for _ in range(nl)], np.int64)
    rk = np.array([data.draw(_small) for _ in range(nr)], np.int64)
    rt = np.array([data.draw(_ts_vals) for _ in range(nr)], np.int64)
    rtb = np.array(data.draw(st.permutations(range(nr)))
                   if nr else [], np.int64)
    tol = data.draw(st.one_of(st.none(), st.integers(0, 6)))
    got = _match_backward(lk, lt, rk, rt, rtb, tol)
    for i in range(nl):
        cands = [j for j in range(nr)
                 if rk[j] == lk[i] and rt[j] <= lt[i]
                 and (tol is None or rt[j] >= lt[i] - tol)]
        exp = (max(cands, key=lambda j: (rt[j], rtb[j]))
               if cands else -1)
        assert got[i] == exp, (i, lk[i], lt[i], list(zip(rk, rt, rtb)), tol)


@settings(max_examples=300, deadline=None)
@given(data=st.data())
def test_window_bounds_vs_bruteforce(data):
    """The offset-packed range-window bounds vs an O(n²) scalar reference,
    including a forced fallback-path cross-check (pack_limit=1)."""
    from pyofs_ray.stages.temporal import _window_bounds

    n = data.draw(st.integers(min_value=0, max_value=12))
    rows = sorted((data.draw(_small), data.draw(_ts_vals))
                  for _ in range(n))
    ks = np.array([r[0] for r in rows], np.int64)
    ts = np.array([r[1] for r in rows], np.int64)
    w = data.draw(st.integers(min_value=0, max_value=6))
    lo, hi = _window_bounds(ks, ts, w)
    lo2, hi2 = _window_bounds(ks, ts, w, pack_limit=1)
    assert np.array_equal(lo, lo2) and np.array_equal(hi, hi2)
    for i in range(n):
        members = [j for j in range(n)
                   if ks[j] == ks[i] and ts[i] - w <= ts[j] <= ts[i]]
        # bounds delimit a contiguous run holding exactly those members
        assert members == list(range(lo[i], hi[i]))


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_winnow_vs_scalar_reference(data):
    """Vectorized winnowing vs a direct scalar re-implementation over
    random small-alphabet strings (dense hash collisions, repeated
    k-grams, boundary lengths)."""
    import pyarrow as pa

    from pyofs_ray.stages.text import (WINNOW_BASE, WINNOW_FP_BITS,
                                       WINNOW_K, WINNOW_POS_BITS, WINNOW_W,
                                       winnow_fingerprints)

    s = data.draw(st.text(alphabet="abc", min_size=0, max_size=40))
    out = winnow_fingerprints(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": [s]}))
    got = set(zip(out["pos"].to_pylist(), out["fp"].to_pylist()))

    cp = [ord(c) for c in s]
    n = len(cp) - WINNOW_K + 1
    exp = set()
    if n >= WINNOW_W:
        hs = []
        for i in range(n):
            h = 0
            for j in range(WINNOW_K):
                h = (h + cp[i + j] * WINNOW_BASE ** (WINNOW_K - 1 - j))
            hs.append((h % (1 << 64)) % (1 << WINNOW_FP_BITS))
        pos_mod = 1 << WINNOW_POS_BITS
        for e in range(WINNOW_W - 1, n):
            window = [(hs[i] * pos_mod + (pos_mod - (i + 1)), i)
                      for i in range(e - WINNOW_W + 1, e + 1)]
            v, i = min(window)
            exp.add((i + 1, hs[i]))
    assert got == exp, (s, sorted(got), sorted(exp))
