"""Directed Hausdorff coverage audits between the page point cloud and the
station network (SURVEY.md J4/A9 family).

PyOFS validates model coverage by measuring how far grid points sit from
the observation network (`data_buoy.py:301-323` buoy-to-study-area
matching; `hf_radar.py` station masks). The set-to-set generalization is
the directed Hausdorff distance ``h(A→B) = max_{a∈A} min_{b∈B} d(a,b)``,
computed here in both directions, exactly, in int64 squared
milli-degrees (the repo's spatial fixed-point contract, `core/geom.py`):

- ``host_station_hausdorff`` — h(host's pages → stations) per host: the
  worst-covered page of every host cluster, with the witness page
  (ties broken by ascending ``page_key``). Stations broadcast via
  ``ray.put``; one (batch × S) int64 distance matrix per batch; per-batch
  partial argmax collapses each batch to ≤|hosts| rows, so the single
  exchange moves host partials, not pages — the hot-host skew fixture
  (70 % of pages on one host) costs one extra partial row, not a hot
  reducer.
- ``station_nearest_page`` — h(stations → pages) rows: for every station
  the exact squared distance to its nearest page (the station with the
  MAX of these is the worst-sited observer). Per-batch partial is an
  S-row min vector; the finish is a single coalesced combine
  (``repartition(1)``) — bounded by the station count, the tiny-key
  finish shape (BASELINE.md round-4 lesson: no Ray groupby for ≤2k keys).

Both are bit-exact twins of ``CROSS JOIN`` + ``MIN``/``MAX`` SQL — no
floats anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..sources.fixtures import stations as fixture_stations
from .knn import _memo_index


def _min_d2(batch: pa.Table, index) -> np.ndarray:
    lon = batch["lon_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
    lat = batch["lat_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
    dx = lon[:, None] - index.lon[None, :]
    dy = lat[:, None] - index.lat[None, :]
    return (dx * dx + dy * dy).min(axis=1)


def host_station_hausdorff(ds: ray.data.Dataset,
                           station_rows: list[dict] | None = None,
                           num_buckets: int | None = None,
                           batch_size: int = 65536) -> ray.data.Dataset:
    """Per-host directed Hausdorff to the station network:
    ``(host, n_pages, hausdorff_d2, worst_page)``."""
    from ..pipelines.flagship import url_host
    from .agg import auto_partitions, hash_bucket_tag

    if num_buckets is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        num_buckets = max(8, cpus)
    ref = ray.put(station_rows if station_rows is not None
                  else fixture_stations())

    def _argmax_rows(host: np.ndarray, d2: np.ndarray, page: np.ndarray,
                     cnt: np.ndarray) -> pa.Table:
        """One row per host: (host, max d2, min page among max ties,
        summed count). `host` is a numpy array of str."""
        uh, inv = np.unique(host, return_inverse=True)
        # lexsort: primary host, then d2 DESC, then page ASC — first row
        # of each host segment is the (max d2, tie-min page) witness
        o = np.lexsort((page, -d2, inv))
        inv_s, d2_s, page_s = inv[o], d2[o], page[o]
        first = np.flatnonzero(np.concatenate(
            [[True], inv_s[1:] != inv_s[:-1]])) if len(inv_s) else \
            np.zeros(0, np.int64)
        counts = np.bincount(inv, weights=cnt,
                             minlength=len(uh)).astype(np.int64)
        return pa.table({
            "host": pa.array(uh[inv_s[first]].tolist(), pa.string()),
            "d2": pa.array(d2_s[first]),
            "page_key": pa.array(page_s[first]),
            "cnt": pa.array(counts[inv_s[first]])})

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"host": pa.array([], pa.string()),
                             "d2": pa.array([], pa.int64()),
                             "page_key": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64()),
                             "_bucket": pa.array([], pa.int64())})
        index = _memo_index(ref)
        d2 = _min_d2(b, index)
        host = np.asarray(url_host(b["url"]).to_pylist(), dtype=str)
        page = b["page_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = _argmax_rows(host, d2, page, np.ones(len(d2), np.int64))
        return hash_bucket_tag(t, ["host"], num_buckets)

    def combine(g: pa.Table) -> pa.Table:
        host = np.asarray(g["host"].to_pylist(), dtype=str)
        t = _argmax_rows(
            host,
            g["d2"].to_numpy(zero_copy_only=False).astype(np.int64),
            g["page_key"].to_numpy(zero_copy_only=False).astype(np.int64),
            g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"host": t["host"], "n_pages": t["cnt"],
                         "hausdorff_d2": t["d2"],
                         "worst_page": t["page_key"]})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size, zero_copy_batch=True)
    # host-bounded partials: coalesce before the tiny exchange
    return (partials.repartition(auto_partitions())
            .groupby("_bucket").map_groups(combine, batch_format="pyarrow"))


def station_nearest_page(ds: ray.data.Dataset,
                         station_rows: list[dict] | None = None,
                         batch_size: int = 65536) -> ray.data.Dataset:
    """Per-station exact squared distance to the nearest page:
    ``(station_id, d2_nearest)`` — the station→pages direction."""
    rows = station_rows if station_rows is not None else fixture_stations()
    ref = ray.put(rows)
    sids = sorted(r["station_id"] for r in rows)

    def partial(b: pa.Table) -> pa.Table:
        index = _memo_index(ref)
        lon = b["lon_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat = b["lat_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lon) == 0:
            return pa.table({"station_id": pa.array([], pa.string()),
                             "d2_nearest": pa.array([], pa.int64())})
        dx = lon[:, None] - index.lon[None, :]
        dy = lat[:, None] - index.lat[None, :]
        mins = (dx * dx + dy * dy).min(axis=0)  # per STATION
        return pa.table({"station_id": pa.array(index.ids.tolist(),
                                                pa.string()),
                         "d2_nearest": pa.array(mins.astype(np.int64))})

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["station_id"]).aggregate([("d2_nearest", "min")])
        return pa.table({
            "station_id": g["station_id"],
            "d2_nearest": g["d2_nearest_min"].cast(pa.int64())})

    assert sids  # station fixture is never empty
    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size, zero_copy_batch=True)
            .repartition(1)
            .map_batches(combine, batch_format="pyarrow"))


# --------------------------------------------------------- DuckDB twins

def host_station_hausdorff_sql() -> str:
    from ..core.sqlgen_knn import stations_cte
    return f"""
{stations_cte()},
pd AS (
  SELECT p.page_key, SPLIT_PART(p.url, '/', 3) AS host,
         p.lon_milli, p.lat_milli
  FROM pages p
),
mind AS (
  SELECT page_key, host,
         MIN((lon_milli - s_lon) * (lon_milli - s_lon)
           + (lat_milli - s_lat) * (lat_milli - s_lat)) AS d2
  FROM pd CROSS JOIN stations
  GROUP BY page_key, host
),
sel AS (
  SELECT host, page_key, d2,
         MAX(d2) OVER (PARTITION BY host) AS mx
  FROM mind
)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(MAX(d2) AS BIGINT) AS hausdorff_d2,
       CAST(MIN(CASE WHEN d2 = mx THEN page_key END) AS BIGINT)
         AS worst_page
FROM sel GROUP BY host
"""


def station_nearest_page_sql() -> str:
    from ..core.sqlgen_knn import stations_cte
    return f"""
{stations_cte()}
SELECT s.station_id,
       CAST(MIN((p.lon_milli - s.s_lon) * (p.lon_milli - s.s_lon)
              + (p.lat_milli - s.s_lat) * (p.lat_milli - s.s_lat))
            AS BIGINT) AS d2_nearest
FROM stations s CROSS JOIN pages p
GROUP BY s.station_id
"""
