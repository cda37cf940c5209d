"""Geocode + cell-encode stage — the engine's analogue of PyOFS grid loading
and coordinate transforms (`/root/reference/PyOFS/model/wcofs.py:251-321`,
`utilities.py:198-289` rotate/unrotate trig), re-imagined as a stateless
zero-copy Arrow `map_batches` over web pages.

Input:  pages batch with at least ``url`` (string).
Output: input columns + ``page_key:int64, lon_milli:int64, lat_milli:int64,
lon:float64, lat:float64, cell_id:int64`` (cell at ``zoom``).

The page key is parsed from the url's trailing path segment (deterministic
geocode *of the url* — the fixture urls embed an integer id); for arbitrary
corpora ``key_fn='fnv'`` hashes the whole url with vectorized FNV-1a
(`core.hashing.fnv1a64`) instead. All predicate math is int64 (see
`core.geom`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core import geom
from ..core.hashing import fnv1a64


def page_key_from_url(url: pa.Array, key_fn: str = "parse") -> np.ndarray:
    if key_fn == "fnv":
        return fnv1a64(url).astype(np.int64)
    # trailing integer path segment: .../p/<key>
    tail = pc.extract_regex(url, r"/(?P<key>[0-9]+)$")
    keys = pc.struct_field(tail, "key")
    if keys.null_count > 0:  # non-fixture urls → fall back to hashing those
        mask = pc.is_null(keys)
        parsed = pc.if_else(mask, pa.scalar(0, pa.int64()), keys.cast(pa.int64()))
        hashed = fnv1a64(url).astype(np.int64)
        return np.where(mask.to_numpy(zero_copy_only=False),
                        hashed, parsed.to_numpy(zero_copy_only=False)).astype(np.int64)
    return keys.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)


def geocode_batch(batch: pa.Table, zoom: int = geom.BASE_ZOOM,
                  key_fn: str = "parse", minimal: bool = False) -> pa.Table:
    key = page_key_from_url(batch["url"], key_fn=key_fn)
    lon_m, lat_m = geom.geocode_key(key)
    cell = geom.cell_of(lon_m, lat_m, zoom)
    if minimal:
        # hot-path form: only the columns the spatial join + aggregate
        # consume — the float lon/lat mirrors and page_key are ~24 B/row of
        # pure memory traffic the headline never reads
        return (
            batch.append_column("lon_milli", pa.array(lon_m, pa.int64()))
            .append_column("lat_milli", pa.array(lat_m, pa.int64()))
            .append_column("cell_id", pa.array(cell, pa.int64()))
        )
    return (
        batch.append_column("page_key", pa.array(key, pa.int64()))
        .append_column("lon_milli", pa.array(lon_m, pa.int64()))
        .append_column("lat_milli", pa.array(lat_m, pa.int64()))
        .append_column("lon", pa.array(lon_m / 1000.0, pa.float64()))
        .append_column("lat", pa.array(lat_m / 1000.0, pa.float64()))
        .append_column("cell_id", pa.array(cell, pa.int64()))
    )


def geocode(ds, zoom: int = geom.BASE_ZOOM, key_fn: str = "parse",
            minimal: bool = False):
    """Dataset → Dataset with geocode/cell columns (stateless tasks)."""
    return ds.map_batches(
        lambda b: geocode_batch(b, zoom=zoom, key_fn=key_fn, minimal=minimal),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
