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
