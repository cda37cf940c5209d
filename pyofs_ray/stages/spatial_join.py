"""Big-big spatial self-join: all page pairs within a planar radius.

The one join shape the engine did not yet cover: BOTH sides are the full
corpus (no broadcast small side, unlike `knn.radius_join` /
`pip.coast_distance`). This is the web-scale analogue of PyOFS's
observation-to-observation co-location (`/root/reference/main/validation/
data_assimilation_validation.py:280-353` pairs model/obs points by nearest
grid cell) generalized to a symmetric within-distance pair enumeration.

Scale shape (grid-cell blocking with HALF-PLANE replication)
------------------------------------------------------------
A pair at planar distance <= r must fall in the same or 8-adjacent cells of
a grid with step gs >= r. Each point is emitted ONCE natively into its own
cell and replicated into the four "west/south" neighbors
D = {(-1,0), (-1,-1), (-1,+1), (0,-1)}; since D and -D partition the 8
neighbor offsets, every cross-cell pair meets in EXACTLY one cell as
(native, replica), and same-cell pairs as (native, native) — no dedup pass,
no double counting, 5 rows shuffled per point. ONE hash-bucket exchange on
the cell key, then a fully vectorized per-bucket kernel (segment arithmetic,
no Python loop over cells) enumerates candidates and applies the exact
int64 predicate dx² + dy² <= r².

Candidate volume is bounded by real pair density (cell occupancy is O(1)
when gs ≈ r and the data is not denser than the answer itself), so the
output — not an all-pairs blow-up — dominates cost at any scale.

Exactness: the metric is PLANAR milli-degrees (no antimeridian wrap — a
pair straddling ±180° is not a neighbor in this metric, matching the SQL
twin's arithmetic exactly); all predicate math is int64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..core import geom
from .agg import hash_bucket_tag

# half-plane replication offsets (dx, dy): D ∪ -D = the 8 neighbors, D ∩ -D = ∅
_REPL = ((-1, 0), (-1, -1), (-1, 1), (0, -1))


def _cell_key(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    """(gx, gy) → one int64 key. gx is shifted by +1 so replica cells at
    gx = -1 stay non-negative; gy < 2^21 always (LAT_RANGE/gs <= 170001)."""
    return ((gx + 1) << np.int64(21)) | gy


def _pairs_kernel(g: pa.Table, r2: int) -> pa.Table:
    """One bucket group → exact within-radius pairs (key_a < key_b, d2)."""
    ck = g["ck"].to_numpy().astype(np.int64)
    key = g["k"].to_numpy().astype(np.int64)
    lon = g["lon"].to_numpy().astype(np.int64)
    lat = g["lat"].to_numpy().astype(np.int64)
    nat = g["nat"].to_numpy().astype(np.int8)

    # order by (cell, replica-after-native): natives form each segment's
    # prefix, so "later elements in segment" pairs every native with every
    # following native AND every replica exactly once — native×native and
    # native×replica fall out of ONE segment expansion.
    order = np.lexsort((key, -nat.astype(np.int64), ck))
    ck, key, lon, lat, nat = ck[order], key[order], lon[order], lat[order], nat[order]

    starts = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
    counts = np.diff(np.r_[starts, len(ck)])
    li = np.arange(len(ck)) - np.repeat(starts, counts)
    # natives pair with every later row in the segment; replicas pair with
    # nothing (replica×replica pairs meet natively elsewhere)
    reps = np.where(nat == 1, np.repeat(counts, counts) - 1 - li, 0)
    total = int(reps.sum())
    if not total:
        return pa.table({"key_a": pa.array([], pa.int64()),
                         "key_b": pa.array([], pa.int64()),
                         "d2": pa.array([], pa.int64())})
    a_idx = np.repeat(np.arange(len(ck)), reps)
    head = np.cumsum(reps) - reps
    b_idx = np.arange(total) - np.repeat(head, reps) + a_idx + 1

    dx = lon[a_idx] - lon[b_idx]
    dy = lat[a_idx] - lat[b_idx]
    d2 = dx * dx + dy * dy
    keep = d2 <= r2
    ka, kb = key[a_idx][keep], key[b_idx][keep]
    lo, hi = np.minimum(ka, kb), np.maximum(ka, kb)
    return pa.table({"key_a": pa.array(lo, pa.int64()),
                     "key_b": pa.array(hi, pa.int64()),
                     "d2": pa.array(d2[keep], pa.int64())})


def within_radius_pairs(ds: ray.data.Dataset, radius: int,
                        id_col: str = "page_key",
                        num_buckets: int | None = None) -> ray.data.Dataset:
    """All unordered point pairs with planar distance² <= radius²
    (milli-degrees). ``ds`` needs int64 ``id_col``/``lon_milli``/
    ``lat_milli`` columns (the geocode output). Returns
    (key_a, key_b, d2) with key_a < key_b.
    """
    if radius < 1:
        raise ValueError("radius must be >= 1 milli-degree")
    gs = int(radius)  # grid step >= radius: pairs never span >1 cell
    r2 = int(radius) * int(radius)
    if num_buckets is None:
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else 8
        num_buckets = max(8, cpus)

    def emit(b: pa.Table) -> pa.Table:
        key = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = b["lon_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat = b["lat_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx = (lon + geom.LON_OFFSET) // gs
        gy = (lat + geom.LAT_OFFSET) // gs
        cks = [_cell_key(gx, gy)]
        nats = [np.ones(len(key), np.int8)]
        for dx_off, dy_off in _REPL:
            cks.append(_cell_key(gx + dx_off, gy + dy_off))
            nats.append(np.zeros(len(key), np.int8))
        n_rep = 1 + len(_REPL)
        return pa.table({
            "ck": pa.array(np.concatenate(cks), pa.int64()),
            "k": pa.array(np.tile(key, n_rep), pa.int64()),
            "lon": pa.array(np.tile(lon, n_rep), pa.int64()),
            "lat": pa.array(np.tile(lat, n_rep), pa.int64()),
            "nat": pa.array(np.concatenate(nats), pa.int8()),
        })

    rows = ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
    tagged = rows.map_batches(
        lambda b: hash_bucket_tag(b, ["ck"], num_buckets),
        batch_format="pyarrow")
    return tagged.groupby("_bucket").map_groups(
        lambda g: _pairs_kernel(g, r2), batch_format="pyarrow")


def within_radius_pairs_sql(radius: int) -> str:
    """DuckDB twin: self-join with the identical int64 planar predicate
    (range conditions let the IEJoin prune; the engine's grid blocking is
    the distributed analogue of the same pruning)."""
    r = int(radius)
    return f"""
pts AS (SELECT page_key, lon_milli, lat_milli FROM pages)
SELECT a.page_key AS key_a, b.page_key AS key_b,
       (a.lon_milli - b.lon_milli) * (a.lon_milli - b.lon_milli)
     + (a.lat_milli - b.lat_milli) * (a.lat_milli - b.lat_milli) AS d2
FROM pts a JOIN pts b
  ON a.page_key < b.page_key
 AND b.lon_milli BETWEEN a.lon_milli - {r} AND a.lon_milli + {r}
 AND b.lat_milli BETWEEN a.lat_milli - {r} AND a.lat_milli + {r}
 AND (a.lon_milli - b.lon_milli) * (a.lon_milli - b.lon_milli)
   + (a.lat_milli - b.lat_milli) * (a.lat_milli - b.lat_milli) <= {r * r}
"""
