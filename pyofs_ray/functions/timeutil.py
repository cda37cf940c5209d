"""Datetime rounding / range generators (SURVEY.md M13 — the
`PyOFS/__init__.py:121-199` `round_to_hour` / `round_to_day` /
`range_hourly` / `range_daily` family), vectorized over numpy datetime64.
"""

from __future__ import annotations

import numpy as np

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000
_TEN_MIN_US = 600_000_000


def _floor_us(ts: np.ndarray, quantum_us: int) -> np.ndarray:
    t = ts.astype("datetime64[us]").astype(np.int64)
    return ((t // quantum_us) * quantum_us).astype("datetime64[us]")


def round_to_hour(ts: np.ndarray, direction: str = "floor") -> np.ndarray:
    """Round timestamps to the hour (`round_to_hour`, __init__.py:121-135).
    ``direction``: floor | ceil | nearest."""
    ts = np.asarray(ts, dtype="datetime64[us]")
    t = ts.astype(np.int64)
    if direction == "floor":
        q = t // _HOUR_US
    elif direction == "ceil":
        q = -((-t) // _HOUR_US)
    elif direction == "nearest":
        q = (t + _HOUR_US // 2) // _HOUR_US
    else:
        raise ValueError(f"unknown direction {direction!r}")
    return (q * _HOUR_US).astype("datetime64[us]")


def round_to_day(ts: np.ndarray) -> np.ndarray:
    return _floor_us(np.asarray(ts, dtype="datetime64[us]"), _DAY_US)


def round_to_ten_minutes(ts: np.ndarray) -> np.ndarray:
    return _floor_us(np.asarray(ts, dtype="datetime64[us]"), _TEN_MIN_US)


def range_hourly(start: np.datetime64, end: np.datetime64) -> np.ndarray:
    """Hourly timestamps in [start, end) (`range_hourly`, __init__.py:154-170);
    ``end < start`` yields a descending range, matching the reference."""
    start = np.datetime64(start, "us")
    end = np.datetime64(end, "us")
    step = np.timedelta64(_HOUR_US if end >= start else -_HOUR_US, "us")
    return np.arange(start, end, step)


def ten_minute_range(start: np.datetime64, end: np.datetime64) -> np.ndarray:
    """10-minute timestamps in [start, end) (`ten_minute_range`,
    __init__.py:192-199), descending when end < start."""
    start = np.datetime64(start, "us")
    end = np.datetime64(end, "us")
    step = np.timedelta64(_TEN_MIN_US if end >= start else -_TEN_MIN_US, "us")
    return np.arange(start, end, step)


def range_daily(start: np.datetime64, end: np.datetime64) -> np.ndarray:
    """Daily timestamps in [start, end), descending when end < start
    (`range_daily`, __init__.py:173-189)."""
    start = np.datetime64(start, "us")
    end = np.datetime64(end, "us")
    step = np.timedelta64(_DAY_US if end >= start else -_DAY_US, "us")
    return np.arange(start, end, step)
