"""Scalar/vector function library (SURVEY.md §2.8) — the `utilities.py` /
`PyOFS/__init__.py` function analogues as vectorized numpy kernels."""

from __future__ import annotations

import numpy as np

WGS84_A = 6_378_137.0
WGS84_B = 6_356_752.314245


def rotate_uv(u: np.ndarray, v: np.ndarray, angle_rad: np.ndarray):
    """Per-cell velocity de-rotation (SURVEY.md M5, `wcofs.py:362-396`):
    u' = u·cosθ − v·sinθ, v' = u·sinθ + v·cosθ. NaN-safe (NaN propagates)."""
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    return u * c - v * s, u * s + v * c


def dir_mag(u: np.ndarray, v: np.ndarray):
    """dir = (atan2(u, v) + π)·180/π, mag = √(u²+v²) — the `wcofs.py:628-633`
    derived-variable pair (SURVEY.md M6)."""
    return (np.arctan2(u, v) + np.pi) * 180.0 / np.pi, np.sqrt(u * u + v * v)


def geodetic_radius(lat_rad: np.ndarray) -> np.ndarray:
    """WGS84 earth radius at latitude (`utilities.py:388-408`)."""
    ct, st = np.cos(lat_rad), np.sin(lat_rad)
    num = (WGS84_A**2 * ct) ** 2 + (WGS84_B**2 * st) ** 2
    den = (WGS84_A * ct) ** 2 + (WGS84_B * st) ** 2
    return np.sqrt(num / den)


# ---------------------------------------------------- rotated-pole system
# SURVEY.md §2.8 — the `utilities.py:198-289` RotatedPoleCoordinateSystem
# rotate/unrotate pair (WCOFS grids live in rotated-pole coordinates),
# vectorized over coordinate arrays. Standard spherical rotation: tilt the
# pole to (pole_lon, pole_lat); rotate = forward transform, unrotate = its
# inverse (round-trip identity away from the poles).

def rotate_pole(lon_deg: np.ndarray, lat_deg: np.ndarray,
                pole: tuple[float, float]) -> tuple[np.ndarray, np.ndarray]:
    """Geographic lon/lat (degrees) → rotated-pole lon/lat (degrees)."""
    lon = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    plon, plat = np.deg2rad(pole[0]), np.deg2rad(pole[1])
    dlon = lon - plon
    sp, cp = np.sin(plat), np.cos(plat)
    sl, cl = np.sin(lat), np.cos(lat)
    rlon = np.arctan2(np.sin(dlon) * cl,
                      np.cos(dlon) * cl * sp - sl * cp)
    rlat = np.arcsin(np.clip(np.cos(dlon) * cl * cp + sl * sp, -1.0, 1.0))
    return np.rad2deg(rlon), np.rad2deg(rlat)


def unrotate_pole(rlon_deg: np.ndarray, rlat_deg: np.ndarray,
                  pole: tuple[float, float]) -> tuple[np.ndarray, np.ndarray]:
    """Rotated-pole lon/lat (degrees) → geographic lon/lat (degrees)."""
    rlon = np.deg2rad(np.asarray(rlon_deg, dtype=np.float64))
    rlat = np.deg2rad(np.asarray(rlat_deg, dtype=np.float64))
    plon, plat = np.deg2rad(pole[0]), np.deg2rad(pole[1])
    sp, cp = np.sin(plat), np.cos(plat)
    srl, crl = np.sin(rlon), np.cos(rlon)
    srt, crt = np.sin(rlat), np.cos(rlat)
    lon = plon + np.arctan2(srl * crt, crl * crt * sp + srt * cp)
    lat = np.arcsin(np.clip(-crl * crt * cp + srt * sp, -1.0, 1.0))
    return np.rad2deg(lon), np.rad2deg(lat)


_WEBMERC_R = 6_378_137.0  # WebMercator sphere radius


def translate_geographic_coordinates(lon_deg: np.ndarray, lat_deg: np.ndarray,
                                     dx_m: float, dy_m: float
                                     ) -> tuple[np.ndarray, np.ndarray]:
    """Offset geographic points by meters via a WebMercator round-trip
    (`utilities.py:437-456`): project → add (dx, dy) → unproject.
    Vectorized; exact inverse of the spherical-mercator equations."""
    lon = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    x = _WEBMERC_R * lon + dx_m
    y = _WEBMERC_R * np.log(np.tan(np.pi / 4 + lat / 2)) + dy_m
    out_lon = np.rad2deg(x / _WEBMERC_R)
    out_lat = np.rad2deg(2 * np.arctan(np.exp(y / _WEBMERC_R)) - np.pi / 2)
    return out_lon, out_lat


def find_pole(lon_deg: np.ndarray, lat_deg: np.ndarray,
              starting_pole: tuple[float, float], samples: int = 25,
              sample_radius: float = 1.0) -> tuple[float, float]:
    """Grid-search the pole that makes the given points iso-latitude in the
    rotated frame (`utilities.py:292-330` find_pole, minus the plotting):
    minimizes the total spread (max − min) of rotated latitudes over a
    √samples×√samples candidate grid around ``starting_pole``. Spread — not
    max adjacent difference — so the score is ordering-independent and a
    slow monotonic drift cannot beat a genuinely flat ring. Deterministic."""
    side = max(2, int(np.sqrt(samples)))
    deltas = np.linspace(-sample_radius, sample_radius, side)
    best, best_disc = tuple(starting_pole), np.inf
    for dlon in deltas:
        for dlat in deltas:
            cand = (starting_pole[0] + dlon, starting_pole[1] + dlat)
            _, rlat = rotate_pole(lon_deg, lat_deg, cand)
            disc = float(rlat.max() - rlat.min()) if len(rlat) > 1 else 0.0
            if disc < best_disc:
                best, best_disc = cand, disc
    return best
