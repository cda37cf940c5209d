"""Diurnal (local-solar-hour) crawl profile: the geo × time composition.

PyOFS's pass-time machinery reasons about WHEN a satellite sees a place
in the place's own solar frame (`/root/reference/main/observation/viirs.py:
1016-1075` windows pass times around a local reference); the webtext
analogue asks when pages at a given longitude were crawled in their LOCAL
solar time — the diurnal activity profile of the crawl. The timezone here
is the pure solar one (15° of longitude = 1 hour), so the answer is exact
integer arithmetic on already-derived columns, composing the geocode stage
with the timestamp derivation in one stateless pass.

Exactness: ``tz_offset = (lon_milli + 187500) // 15000 - 12`` keeps the
division's numerator non-negative for the whole canonical longitude range
(`lon_milli ∈ [-180000, 180000)`) so floor and C-truncation agree between
numpy and DuckDB without a safe-mod dance; the final hour is wrapped with
the ``((x % 24) + 24) % 24`` form on both sides anyway. Counts and char
sums are int64; the mean is ONE IEEE division after the final reduce.

Scale shape (100 TB): stateless ``map_batches`` per-batch partials over
24 possible keys, then a trivial 24-row groupby — no skew hazard (every
batch pre-reduces to ≤24 rows before the exchange).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..core import sqlgen
from .flagship import geocoded_pages

US_PER_HOUR = 3_600_000_000


def local_hour_profile(sf_dir: str) -> ray.data.Dataset:
    """Per local-solar-hour crawl profile: ``local_hour, doc_count,
    n_chars_sum, mean_chars`` (≤24 rows)."""
    ds = geocoded_pages(sf_dir).select_columns(
        ["warc_ts", "lon_milli", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        us = b["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        lon = b["lon_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
        off = (lon + 187_500) // 15_000 - 12
        hr = ((us // US_PER_HOUR + off) % 24 + 24) % 24
        nc = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({"local_hour": pa.array(hr), "nc": pa.array(nc)})
        return (t.group_by("local_hour")
                 .aggregate([("nc", "sum"), ("nc", "count")]))

    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = (parts.groupby("local_hour")
           .sum(["nc_sum", "nc_count"]))  # ≤24 keys: plain groupby is right

    def finish(b: pa.Table) -> pa.Table:
        s = b["sum(nc_sum)"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["sum(nc_count)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "local_hour": b["local_hour"].cast(pa.int64()),
            "doc_count": pa.array(c),
            "n_chars_sum": pa.array(s),
            "mean_chars": pa.array(s.astype(np.float64)
                                   / c.astype(np.float64)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def local_hour_profile_sql() -> str:
    return f"""{sqlgen.pages_prefix()}
SELECT ((epoch_us(warc_ts) // {US_PER_HOUR}
         + ((lon_milli + 187500) // 15000 - 12)) % 24 + 24) % 24
         AS local_hour,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars_sum,
       CAST(SUM(LENGTH(text)) AS DOUBLE) / COUNT(*) AS mean_chars
FROM pages
GROUP BY 1"""
