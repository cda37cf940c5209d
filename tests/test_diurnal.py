"""Local-solar-hour arithmetic (pipelines/diurnal.py)."""

import numpy as np


def test_tz_offset_matches_floor_over_full_range():
    """The non-negative-numerator form equals floor(lon/15°) rounding to
    the nearest hour, across the whole canonical milli-degree range —
    including the negative side where C-truncation would diverge."""
    lon = np.arange(-180_000, 180_000, 37, dtype=np.int64)
    got = (lon + 187_500) // 15_000 - 12
    want = np.floor((lon + 7_500) / 15_000.0).astype(np.int64)
    assert (got == want).all()
    assert got.min() == -12 and got.max() == 12


def test_local_hour_wraps():
    us_per_hour = 3_600_000_000
    # 23:30 UTC at lon +30° (offset +2) → local hour 1
    us = np.array([23 * us_per_hour + us_per_hour // 2], np.int64)
    lon = np.array([30_000], np.int64)
    off = (lon + 187_500) // 15_000 - 12
    hr = ((us // us_per_hour + off) % 24 + 24) % 24
    assert hr[0] == 1
    # 00:10 UTC at lon -180° (offset -12) → local hour 12
    us = np.array([600_000_000], np.int64)
    lon = np.array([-180_000], np.int64)
    off = (lon + 187_500) // 15_000 - 12
    hr = ((us // us_per_hour + off) % 24 + 24) % 24
    assert off[0] == -12 and hr[0] == 12
