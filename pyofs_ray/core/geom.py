"""Fixed-point geodesy kernels: geocode, hierarchical cell index, tile math.

This is the analogue of PyOFS's grid/CRS machinery — the rotated-pole
transforms (`/root/reference/PyOFS/utilities.py:198-335`), the rasterio affine
transform per grid (`/root/reference/PyOFS/model/wcofs.py:302-306`) and the
halving overview pyramid (`/root/reference/PyOFS/__init__.py:202-209`) — built
from scratch for a web-page corpus.

Design decision (SURVEY.md §7.4 "exact-match determinism"): all canonical
coordinates are **integer milli-degrees** (`lon_milli ∈ [-180000, 180000)`,
`lat_milli ∈ [-85000, 85000]`) and every spatial predicate (cell assignment,
point-in-polygon crossing test, kNN distance) is pure int64 arithmetic. That
makes every result bit-stable across numpy, Python and the DuckDB SQL oracle
with zero float-rounding hazards. Float `lon`/`lat` columns are derived for
display only and never feed a predicate.

Cell index ("H3/S2-style" per BASELINE.json north_star): an XYZ quadtree over
the equirectangular plane. At zoom ``z`` the world is a ``2^z × 2^z`` grid;
``cell_id = (z << 52) | (x << 26) | y`` packs (z, x, y) into one int64
(supports z ≤ 25). ``parent_cell`` is a bit-shift — the pyramid cascade
(SURVEY.md A7) never recomputes geometry.

Longitude wraps at the antimeridian (the `rtofs.py:182-188` analogue, see
SURVEY.md M8); latitude clamps at ±85° (web-mercator-style cutoff).
"""

from __future__ import annotations

import numpy as np

# Canonical fixed-point ranges (milli-degrees).
LON_RANGE = 360_000  # [-180000, 180000)
LAT_RANGE = 170_000  # [-85000, 85000]
LON_OFFSET = 180_000
LAT_OFFSET = 85_000

# cell_id bit layout: z in bits 52+, x in bits 26..51, y in bits 0..25.
CELL_Z_SHIFT = 52
CELL_X_SHIFT = 26
CELL_XY_MASK = (1 << 26) - 1

# Deterministic geocode constants (documented; mirrored in core/sqlgen.py).
HOST_MOD = 97
HOST_HOT_FRAC = 7  # page_key % 10 < 7  → host 0 (the hot-cluster skew fixture)
CLON_MUL, CLON_ADD = 73_939, 11_243
CLAT_MUL, CLAT_ADD = 41_387, 7_321
JLON_MUL, JLON_ADD = 7_919, 13
JLAT_MUL, JLAT_ADD = 6_563, 17
JITTER_MOD = 4_001  # jitter ∈ [-2000, 2000] milli-degrees (±2°)

BASE_ZOOM = 10  # base resolution for the flagship tile pipeline


def host_of_key(key: np.ndarray) -> np.ndarray:
    """Host id for a page key: 70% of keys collapse onto host 0.

    This is the deliberate skew fixture (FIXTURES.md §1 "Zipf-like hosts →
    hot cells") that the salted two-stage aggregate must survive.
    """
    key = key.astype(np.int64, copy=False)
    return np.where(key % 10 < HOST_HOT_FRAC, 0, key % HOST_MOD).astype(np.int64)


def geocode_key(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """page key (int64) → (lon_milli, lat_milli), both int64.

    Point = host cluster center + per-page jitter of ±2°. Longitude wraps
    mod 360°, latitude clamps to [-85°, 85°]. Pure integer arithmetic; the
    SQL twin is ``core.sqlgen.PAGES_CTE``.
    """
    key = key.astype(np.int64, copy=False)
    h = host_of_key(key)
    clon = (h * CLON_MUL + CLON_ADD) % LON_RANGE
    clat = (h * CLAT_MUL + CLAT_ADD) % LAT_RANGE
    jlon = (key * JLON_MUL + JLON_ADD) % JITTER_MOD - 2000
    jlat = (key * JLAT_MUL + JLAT_ADD) % JITTER_MOD - 2000
    lon_milli = (clon + jlon) % LON_RANGE - LON_OFFSET  # numpy % is non-negative
    lat_milli = np.clip(clat + jlat, 0, LAT_RANGE) - LAT_OFFSET
    return lon_milli.astype(np.int64), lat_milli.astype(np.int64)


def cell_xy(lon_milli: np.ndarray, lat_milli: np.ndarray, z: int) -> tuple[np.ndarray, np.ndarray]:
    """Integer tile coordinates at zoom z (north-up: lat=+85° → y=0)."""
    n = np.int64(1) << z
    x = ((lon_milli.astype(np.int64) + LON_OFFSET) * n) // LON_RANGE
    y = ((LAT_OFFSET - lat_milli.astype(np.int64)) * n) // LAT_RANGE
    np.clip(x, 0, n - 1, out=x)
    np.clip(y, 0, n - 1, out=y)
    return x, y


def pack_cell(z: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return (np.int64(z) << CELL_Z_SHIFT) | (x.astype(np.int64) << CELL_X_SHIFT) | y.astype(np.int64)


def unpack_cell(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell_id = cell_id.astype(np.int64, copy=False)
    z = cell_id >> CELL_Z_SHIFT
    x = (cell_id >> CELL_X_SHIFT) & CELL_XY_MASK
    y = cell_id & CELL_XY_MASK
    return z, x, y


def cell_of(lon_milli: np.ndarray, lat_milli: np.ndarray, z: int) -> np.ndarray:
    x, y = cell_xy(lon_milli, lat_milli, z)
    return pack_cell(z, x, y)


def parent_cell(cell_id: np.ndarray, dz: int = 1) -> np.ndarray:
    """Parent cell dz levels up — the overview-pyramid step (SURVEY.md A7,
    analogue of `PyOFS/__init__.py:202-209` + `wcofs.py:707-711`)."""
    z, x, y = unpack_cell(cell_id)
    return ((z - dz) << CELL_Z_SHIFT) | ((x >> dz) << CELL_X_SHIFT) | (y >> dz)


def overview_levels(z_base: int) -> list[int]:
    """Zoom levels of the pyramid, base first (z_base … 0)."""
    return list(range(z_base, -1, -1))


def morton_interleave(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Z-order (Morton) code: bit-interleave x (odd bits) and y (even
    bits). Supports coordinates < 2^26 (every zoom this engine packs).
    Space-filling-curve order keeps spatially-adjacent cells in the same
    range shard — the locality property row-major cell_id order lacks."""
    def part1by1(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.int64)
        v = (v | (v << 16)) & 0x0000FFFF0000FFFF
        v = (v | (v << 8)) & 0x00FF00FF00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v << 2)) & 0x3333333333333333
        v = (v | (v << 1)) & 0x5555555555555555
        return v
    return (part1by1(np.asarray(x)) << 1) | part1by1(np.asarray(y))
