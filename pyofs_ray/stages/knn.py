"""kNN station lookup (SURVEY.md J4) — actor-pool stage with a per-cell
neighbor-ring index.

Analogue of PyOFS's point-sample interpolation / nearest-fallback
(`particle_contour.py:249-298` `_interpolate`, `:453-458` nearest fallback)
and buoy-to-study-area matching (`data_buoy.py:301-323`), re-imagined as:
"for each web page's geocoded point, attach its k nearest stations".

Semantics (exact, shared with the DuckDB oracle in `core.sqlgen_knn`):
squared planar milli-degree distance ``d2 = (lon-slon)² + (lat-slat)²``
(int64, exact), ties broken by ascending ``station_id``; ranks are 1-based.

Two interchangeable kernels, equal by construction (tested):

- **brute force**: one (batch × stations) int64 distance matrix + stable
  argsort — exact baseline; fine up to ~10⁴ stations per the matmul budget.
- **neighbor rings** (the scale path, north_star requirement): stations are
  bucketed into coarse grid cells once per actor; each query batch is grouped
  by its coarse cell and candidate stations are gathered by expanding
  Chebyshev rings around the cell until (a) ≥k candidates and (b) the next
  ring's distance lower bound ``(r-1)·min_cell_dim`` exceeds every point's
  current kth distance — then the exact top-k is taken within candidates.
  Cost scales with local station density, not total station count.

Stations are broadcast via ``ray.put`` and the index is built once per actor
in ``__init__`` (deterministic rebuild, no locks — vs the reference's
class-attribute caches under GLOBAL_LOCK, `wcofs.py:72,217-321`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..core import geom
from ..sources.fixtures import stations as fixture_stations

RING_ZOOM = 6  # station-bucket grid: 64×64 world


class StationIndex:
    def __init__(self, station_rows: list[dict]):
        rows = sorted(station_rows, key=lambda r: r["station_id"])
        self.ids = np.array([r["station_id"] for r in rows])
        self.lon = np.array([r["lon_milli"] for r in rows], np.int64)
        self.lat = np.array([r["lat_milli"] for r in rows], np.int64)
        self.n = len(rows)
        # bucket stations by coarse cell
        sx, sy = geom.cell_xy(self.lon, self.lat, RING_ZOOM)
        self.buckets: dict[tuple[int, int], np.ndarray] = {}
        for i in range(self.n):
            self.buckets.setdefault((int(sx[i]), int(sy[i])), []).append(i)  # type: ignore[union-attr]
        self.buckets = {k: np.array(v, np.int64) for k, v in self.buckets.items()}
        ncell = 1 << RING_ZOOM
        self.cell_w = geom.LON_RANGE // ncell
        self.cell_h = geom.LAT_RANGE // ncell
        self.min_dim = min(self.cell_w, self.cell_h)

    # -- exact brute force ---------------------------------------------------
    def topk_brute(self, lon: np.ndarray, lat: np.ndarray, k: int):
        k = min(k, self.n)
        d2 = (lon[:, None] - self.lon[None, :]) ** 2 + (lat[:, None] - self.lat[None, :]) ** 2
        order = np.argsort(d2, axis=1, kind="stable")[:, :k]  # stable → id tie-break
        rows = np.repeat(np.arange(len(lon)), k)
        cols = order.ravel()
        return rows, cols, d2[rows, cols], np.tile(np.arange(1, k + 1), len(lon))

    # -- neighbor-ring index -------------------------------------------------
    def _ring_cells(self, cx: int, cy: int, r: int):
        n = 1 << RING_ZOOM
        if r == 0:
            yield (cx, cy)
            return
        for dx in range(-r, r + 1):
            for dy in (-r, r):
                x, y = cx + dx, cy + dy
                if 0 <= x < n and 0 <= y < n:
                    yield (x, y)
        for dy in range(-r + 1, r):
            for dx in (-r, r):
                x, y = cx + dx, cy + dy
                if 0 <= x < n and 0 <= y < n:
                    yield (x, y)

    def topk_rings(self, lon: np.ndarray, lat: np.ndarray, k: int):
        k = min(k, self.n)
        qx, qy = geom.cell_xy(lon, lat, RING_ZOOM)
        cell_key = qx * (1 << RING_ZOOM) + qy
        out_rows, out_cols, out_d2, out_rank = [], [], [], []
        max_r = 1 << RING_ZOOM
        for key in np.unique(cell_key):
            sel = np.nonzero(cell_key == key)[0]
            cx, cy = int(key) >> RING_ZOOM, int(key) & ((1 << RING_ZOOM) - 1)
            cand: list[np.ndarray] = []
            ncand = 0
            r = 0
            kth_max = np.int64(np.iinfo(np.int64).max)
            while r <= max_r:
                lb = max(0, r - 1) * self.min_dim
                if ncand >= k and lb * lb > kth_max:
                    break
                for c in self._ring_cells(cx, cy, r):
                    b = self.buckets.get(c)
                    if b is not None:
                        cand.append(b)
                        ncand += len(b)
                if ncand >= k:
                    ci = np.concatenate(cand)
                    d2 = ((lon[sel][:, None] - self.lon[ci][None, :]) ** 2
                          + (lat[sel][:, None] - self.lat[ci][None, :]) ** 2)
                    part = np.partition(d2, k - 1, axis=1)[:, k - 1]
                    kth_max = part.max()
                r += 1
            ci = np.concatenate(cand) if cand else np.empty(0, np.int64)
            ci = np.sort(ci)  # ascending station index = ascending station_id
            d2 = ((lon[sel][:, None] - self.lon[ci][None, :]) ** 2
                  + (lat[sel][:, None] - self.lat[ci][None, :]) ** 2)
            order = np.argsort(d2, axis=1, kind="stable")[:, :k]
            rows = np.repeat(sel, k)
            cols = ci[order.ravel()]
            out_rows.append(rows)
            out_cols.append(cols)
            out_d2.append(d2[np.repeat(np.arange(len(sel)), k), order.ravel()])
            out_rank.append(np.tile(np.arange(1, k + 1), len(sel)))
        return (np.concatenate(out_rows), np.concatenate(out_cols),
                np.concatenate(out_d2), np.concatenate(out_rank))


class KNNJoiner:
    """map_batches actor: attach k nearest stations to each geocoded page."""

    def __init__(self, stations_ref=None, k: int = 3, kernel: str = "rings"):
        rows = ray.get(stations_ref) if stations_ref is not None else fixture_stations()
        self.index = StationIndex(rows)
        self.k = k
        self.kernel = kernel

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon_milli"].to_numpy(zero_copy_only=False)
        lat = batch["lat_milli"].to_numpy(zero_copy_only=False)
        fn = self.index.topk_rings if self.kernel == "rings" else self.index.topk_brute
        rows, cols, d2, rank = fn(lon, lat, self.k)
        out = batch.take(pa.array(rows))
        return (out.append_column("station_id", pa.array(self.index.ids[cols]))
                   .append_column("d2", pa.array(d2.astype(np.int64), pa.int64()))
                   .append_column("rank", pa.array(rank.astype(np.int64), pa.int64())))


# per-worker memoized index for the stateless-task mode (see stages/pip.py)
def _memo_index(stations_ref) -> StationIndex:
    from ..core.memo import memo_broadcast
    return memo_broadcast(f"knn:{stations_ref.hex()}",
                          lambda: StationIndex(ray.get(stations_ref)))


def knn_join(ds: ray.data.Dataset, station_rows: list[dict] | None = None, k: int = 3,
             kernel: str = "rings", compute: str = "tasks",
             concurrency=(1, 8), batch_size: int = 65536) -> ray.data.Dataset:
    """``compute="tasks"`` (default): stateless tasks with a per-worker
    memoized station index — no actor-pool spawn per pipeline; right when
    the index is cheap to build. ``"actors"``: pin the index in an actor
    pool (large station catalogs)."""
    ref = ray.put(station_rows if station_rows is not None else fixture_stations())
    if compute == "actors":
        return ds.map_batches(
            KNNJoiner,
            fn_constructor_kwargs={"stations_ref": ref, "k": k, "kernel": kernel},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
            zero_copy_batch=True,
        )

    def join_batch(batch: pa.Table) -> pa.Table:
        j = KNNJoiner.__new__(KNNJoiner)
        j.index = _memo_index(ref)
        j.k = k
        j.kernel = kernel
        return j(batch)

    return ds.map_batches(join_batch, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


# ---------------------------------------------------- radius join (J4 range)

def _radius_pairs_brute(index: StationIndex, lon: np.ndarray,
                        lat: np.ndarray, r2: int):
    d2 = ((lon[:, None] - index.lon[None, :]) ** 2
          + (lat[:, None] - index.lat[None, :]) ** 2)
    rows, cols = np.nonzero(d2 <= r2)
    return rows, cols, d2[rows, cols]


def _radius_pairs_rings(index: StationIndex, lon: np.ndarray,
                        lat: np.ndarray, radius: int):
    """Candidate cells = Chebyshev rings until the ring's distance lower
    bound exceeds the radius; exact mask within candidates. Cost scales
    with stations inside the radius, not the catalog size."""
    r2 = radius * radius
    qx, qy = geom.cell_xy(lon, lat, RING_ZOOM)
    cell_key = qx * (1 << RING_ZOOM) + qy
    max_ring = radius // index.min_dim + 1
    out_rows, out_cols, out_d2 = [], [], []
    for key in np.unique(cell_key):
        sel = np.nonzero(cell_key == key)[0]
        cx, cy = int(key) >> RING_ZOOM, int(key) & ((1 << RING_ZOOM) - 1)
        cand = []
        for r in range(0, max_ring + 1):
            for c in index._ring_cells(cx, cy, r):
                b = index.buckets.get(c)
                if b is not None:
                    cand.append(b)
        if not cand:
            continue
        ci = np.concatenate(cand)
        d2 = ((lon[sel][:, None] - index.lon[ci][None, :]) ** 2
              + (lat[sel][:, None] - index.lat[ci][None, :]) ** 2)
        rr, cc = np.nonzero(d2 <= r2)
        out_rows.append(sel[rr])
        out_cols.append(ci[cc])
        out_d2.append(d2[rr, cc])
    if not out_rows:
        e = np.empty(0, np.int64)
        return e, e, e
    return (np.concatenate(out_rows), np.concatenate(out_cols),
            np.concatenate(out_d2))


def radius_join(ds: ray.data.Dataset, radius_milli: int,
                station_rows: list[dict] | None = None,
                kernel: str = "rings",
                batch_size: int = 65536) -> ray.data.Dataset:
    """Spatial range join: every (page, station) pair within
    ``radius_milli`` (inclusive) in squared planar milli-degree distance —
    the range-query sibling of `knn_join` (the reference's fixed-radius
    buoy/study-area matching, `data_buoy.py:301-323`, as a join emitting
    ALL in-range pairs rather than the k nearest).

    Same scale shape as `knn_join`'s task mode: stations broadcast via
    ``ray.put`` + per-worker memoized index, zero exchanges; output rows
    are bounded by pairs-in-radius per batch.
    """
    ref = ray.put(station_rows if station_rows is not None
                  else fixture_stations())
    r2 = radius_milli * radius_milli

    def join_batch(batch: pa.Table) -> pa.Table:
        index = _memo_index(ref)
        lon = batch["lon_milli"].to_numpy(zero_copy_only=False)
        lat = batch["lat_milli"].to_numpy(zero_copy_only=False)
        if kernel == "rings":
            rows, cols, d2 = _radius_pairs_rings(index, lon, lat,
                                                 radius_milli)
        else:
            rows, cols, d2 = _radius_pairs_brute(index, lon, lat, r2)
        out = batch.take(pa.array(rows))
        return (out.append_column("station_id",
                                  pa.array(index.ids[cols]))
                   .append_column("d2", pa.array(d2.astype(np.int64),
                                                 pa.int64())))

    return ds.map_batches(join_batch, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


def coverage_gaps(ds: ray.data.Dataset, radius_milli: int,
                  station_rows: list[dict] | None = None,
                  batch_size: int = 65536) -> ray.data.Dataset:
    """Pages OUTSIDE ``radius_milli`` of EVERY station (the anti form of
    `radius_join`) — PyOFS's out-of-coverage masking as a query: emit
    (page_key, d2) where d2 = the exact min squared distance to any
    station. Stations broadcast; one (n × S) numpy distance matrix per
    batch; zero exchanges."""
    ref = ray.put(station_rows if station_rows is not None
                  else fixture_stations())
    r2 = radius_milli * radius_milli

    def fn(batch: pa.Table) -> pa.Table:
        index = _memo_index(ref)
        lon = batch["lon_milli"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lat = batch["lat_milli"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dx = lon[:, None] - index.lon[None, :]
        dy = lat[:, None] - index.lat[None, :]
        d2 = (dx * dx + dy * dy).min(axis=1)
        mask = d2 > r2
        return pa.table({"page_key": batch["page_key"].filter(pa.array(mask)),
                         "d2": pa.array(d2[mask])})

    return ds.map_batches(fn, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)
