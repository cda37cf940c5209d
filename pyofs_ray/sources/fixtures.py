"""Deterministic broadcast-side fixtures: polygons and stations.

Analogues of PyOFS's study-area polygon (`wcofs.py:67`,
`utilities.py:184-195` `get_first_record`) and station catalogs
(`data_buoy.py:94-135`, HFR sites `hf_radar.py:198-252`) — the small tables
that are broadcast (`ray.put`) to every worker, never shuffled.

Everything is generated from fixed integer arithmetic (no RNG state, no
floats in any predicate): vertices and station coordinates are integer
milli-degrees, so the numpy kernels and the generated DuckDB SQL literals
agree bit-for-bit. Polygons follow the FIXTURES.md §2 requirements: convex
rings, a concave star, a nested pair, and an antimeridian-straddling pair
pre-split into east/west rings (the documented M8 rule: rings never cross
±180° — any crossing geometry must be split before ingest).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..core import geom


@dataclass(frozen=True)
class Polygon:
    polygon_id: str
    xs: np.ndarray  # int64 milli-deg lon vertices (closed implicitly)
    ys: np.ndarray  # int64 milli-deg lat vertices

    @property
    def bbox(self) -> tuple[int, int, int, int]:
        return (int(self.xs.min()), int(self.ys.min()), int(self.xs.max()), int(self.ys.max()))


def _host_center(h: int) -> tuple[int, int]:
    clon = (h * geom.CLON_MUL + geom.CLON_ADD) % geom.LON_RANGE - geom.LON_OFFSET
    clat = (h * geom.CLAT_MUL + geom.CLAT_ADD) % geom.LAT_RANGE - geom.LAT_OFFSET
    return clon, clat


def _ring(cx: int, cy: int, r_outer: int, nvert: int, r_inner: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Integer polygon ring around (cx, cy); star-shaped when r_inner set.

    Vertices are computed with float trig then rounded to int once — after
    that, all predicate math is integer, so the float step cannot cause
    engine/oracle divergence (both read the same integer literals).
    """
    xs, ys = [], []
    n = nvert * (2 if r_inner else 1)
    for i in range(n):
        r = r_outer if (r_inner is None or i % 2 == 0) else r_inner
        a = 2 * math.pi * i / n
        xs.append(cx + int(round(r * math.cos(a))))
        ys.append(cy + int(round(r * math.sin(a))))
    return np.array(xs, np.int64), np.array(ys, np.int64)


def _clamp_ring(xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    xs = np.clip(xs, -geom.LON_OFFSET, geom.LON_OFFSET - 1)
    ys = np.clip(ys, -geom.LAT_OFFSET, geom.LAT_OFFSET)
    return xs, ys


def study_polygons() -> list[Polygon]:
    """The fixed fixture polygon set (deterministic, version-stable)."""
    polys: list[Polygon] = []
    # convex/concave rings around a spread of host cluster centers,
    # including host 0 (the hot cluster) so joins hit the skewed mass.
    for i, h in enumerate([0, 1, 5, 13, 29, 47, 71]):
        cx, cy = _host_center(h)
        r = 900 + 337 * i
        if i % 3 == 0:  # concave star
            xs, ys = _ring(cx, cy, r_outer=r + 800, nvert=5, r_inner=max(r // 2, 300))
            pid = f"star_h{h}"
        else:
            xs, ys = _ring(cx, cy, r_outer=r, nvert=5 + (i % 4))
            pid = f"poly_h{h}"
        xs, ys = _clamp_ring(xs, ys)
        polys.append(Polygon(pid, xs, ys))
    # nested pair: a small ring strictly inside a big one (host 0 center)
    cx, cy = _host_center(0)
    big = _clamp_ring(*_ring(cx, cy, 1800, 8))
    small = _clamp_ring(*_ring(cx, cy, 600, 6))
    polys.append(Polygon("nest_outer", *big))
    polys.append(Polygon("nest_inner", *small))
    # antimeridian pair: pre-split east/west rectangles hugging ±180°
    east_xs = np.array([geom.LON_OFFSET - 1500, geom.LON_OFFSET - 1,
                        geom.LON_OFFSET - 1, geom.LON_OFFSET - 1500], np.int64)
    west_xs = np.array([-geom.LON_OFFSET, -geom.LON_OFFSET + 1500,
                        -geom.LON_OFFSET + 1500, -geom.LON_OFFSET], np.int64)
    band_ys = np.array([-20000, -20000, 20000, 20000], np.int64)
    polys.append(Polygon("am_east", east_xs, band_ys))
    polys.append(Polygon("am_west", west_xs, band_ys))
    return polys


def stations() -> list[dict]:
    """Fixture station set: clustered near host centers + isolated ones +
    an exact-tie pair (deterministic tie-break test, FIXTURES.md §3)."""
    out = []
    sid = 0
    for h in [0, 0, 0, 1, 5, 13, 29, 47, 71, 90]:
        cx, cy = _host_center(h)
        dx = (sid * 1471) % 3001 - 1500
        dy = (sid * 911) % 3001 - 1500
        out.append({"station_id": f"st{sid:03d}",
                    "lon_milli": int(np.clip(cx + dx, -geom.LON_OFFSET, geom.LON_OFFSET - 1)),
                    "lat_milli": int(np.clip(cy + dy, -geom.LAT_OFFSET, geom.LAT_OFFSET))})
        sid += 1
    # isolated stations far from clusters
    out.append({"station_id": f"st{sid:03d}", "lon_milli": 150_000, "lat_milli": -70_000}); sid += 1
    out.append({"station_id": f"st{sid:03d}", "lon_milli": -150_000, "lat_milli": 70_000}); sid += 1
    # exact equidistant tie pair around host 0 center
    cx, cy = _host_center(0)
    out.append({"station_id": f"st{sid:03d}", "lon_milli": cx - 5000, "lat_milli": cy}); sid += 1
    out.append({"station_id": f"st{sid:03d}", "lon_milli": cx + 5000, "lat_milli": cy}); sid += 1
    return out


def donut_polygon() -> tuple[Polygon, Polygon]:
    """(outer, hole) rings of the donut fixture — an axis-aligned square
    annulus around the hot host-0 cluster (outer ±1500, hole ±600 milli-
    degrees; the ±2000 page jitter puts mass in the hole, the ring AND
    outside, so every region of the even-odd test is non-vacuous)."""
    cx, cy = _host_center(0)
    def square(r):
        return (np.array([cx - r, cx + r, cx + r, cx - r], np.int64),
                np.array([cy - r, cy - r, cy + r, cy + r], np.int64))
    oxs, oys = square(1500)
    hxs, hys = square(600)
    return (Polygon("donut_outer", oxs, oys), Polygon("donut_hole", hxs, hys))
