"""Point-in-polygon join — the flagship spatial join (SURVEY.md J1/J2).

Analogue of PyOFS's raster×polygon mask (`rasterio.mask.mask`,
`wcofs.py:671-683`, `:1501-1513`) and point×polygon tests
(`data_buoy.py:301-323` shapely `point.intersects`), rebuilt as a
broadcast-side spatial join:

- the small side (polygons) is put in the object store once (``ray.put``)
  and each **actor** builds its pruning index once in ``__init__`` — the
  Ray-native version of the reference's class-attribute study-area cache
  (`viirs.py:248-269`) without locks;
- the big side streams through ``map_batches`` as zero-copy Arrow batches.

Exactness: the crossing test is the classic even–odd parity rule in pure
int64 arithmetic —

    for each edge (x1,y1)→(x2,y2) with (y1 > y) != (y2 > y):
        t = (x2-x1)*(y-y1) - (x-x1)*(y2-y1)
        crossing  iff  t > 0 when y2 > y1, else t < 0

Boundary rule (documented, half-open): a point exactly on a left/bottom edge
is inside, on a right/top edge outside — the same convention the generated
DuckDB oracle encodes (`core.sqlgen_pip`), so join rows match bit-for-bit.

Pruning: per-polygon integer bbox masks (vectorized) plus a coarse-cell
inverted index (cell at PRUNE_ZOOM → candidate polygon ids) — the STR-tree
analogue; with P polygons only the candidates whose bbox overlaps a batch's
cells are tested. Modes: ``inner`` (one output row per (page, polygon) hit,
pages in several polygons emit several rows), ``semi`` (pages in ≥1 polygon),
``anti`` (pages in none).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..core import geom
from ..sources.fixtures import Polygon, study_polygons

PRUNE_ZOOM = 6  # coarse pruning grid (64×64 world): cells are ~5.6°×2.7°


class PolygonIndex:
    """Immutable polygon set + coarse-cell inverted index (built once)."""

    def __init__(self, polygons: list[Polygon]):
        self.polygons = polygons
        self.bboxes = np.array([p.bbox for p in polygons], np.int64)  # (P, 4) w s e n
        # coarse-cell → candidate polygon ids
        self.cell_to_polys: dict[int, list[int]] = {}
        n = 1 << PRUNE_ZOOM
        for pi, (w, s, e, no) in enumerate(self.bboxes):
            x0, y1 = geom.cell_xy(np.array([w]), np.array([s]), PRUNE_ZOOM)
            x1_, y0 = geom.cell_xy(np.array([e]), np.array([no]), PRUNE_ZOOM)
            for cx in range(int(x0[0]), int(x1_[0]) + 1):
                for cy in range(int(y0[0]), int(y1[0]) + 1):
                    cid = int((PRUNE_ZOOM << geom.CELL_Z_SHIFT) | (cx << geom.CELL_X_SHIFT) | cy)
                    self.cell_to_polys.setdefault(cid, []).append(pi)

    def candidates(self, lon: np.ndarray, lat: np.ndarray) -> list[int]:
        """Polygon ids possibly hit by any point in this batch."""
        cells = geom.cell_of(lon, lat, PRUNE_ZOOM)
        out: set[int] = set()
        for cid in np.unique(cells):
            out.update(self.cell_to_polys.get(int(cid), ()))
        return sorted(out)

    def contains(self, pi: int, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Vectorized exact parity test of polygon pi over points (int64)."""
        p = self.polygons[pi]
        w, s, e, no = self.bboxes[pi]
        cand = (lon >= w) & (lon <= e) & (lat >= s) & (lat <= no)
        res = np.zeros(len(lon), dtype=bool)
        if not cand.any():
            return res
        x, y = lon[cand], lat[cand]
        xs, ys = p.xs, p.ys
        x1, y1 = xs, ys
        x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
        # (points, edges) broadcast — all int64, no overflow for |coord|≤360k
        yy = y[:, None]
        straddle = (y1[None, :] > yy) != (y2[None, :] > yy)
        t = (x2 - x1)[None, :] * (yy - y1[None, :]) - (x[:, None] - x1[None, :]) * (y2 - y1)[None, :]
        up = (y2 > y1)[None, :]
        crossing = straddle & np.where(up, t > 0, t < 0)
        res[cand] = (crossing.sum(axis=1) % 2).astype(bool)
        return res


class PIPJoiner:
    """Actor-pool stage: pages batch → PIP join rows (SURVEY.md §7.2).

    ``polygons_ref`` is a ``ray.put`` handle to the polygon list; the index
    is built once per actor in ``__init__`` (deterministic rebuild on actor
    failure — built from the broadcast table, not from stream order).
    """

    def __init__(self, polygons_ref=None, mode: str = "inner"):
        polys = ray.get(polygons_ref) if polygons_ref is not None else study_polygons()
        self.index = PolygonIndex(polys)
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon_milli"].to_numpy(zero_copy_only=False)
        lat = batch["lat_milli"].to_numpy(zero_copy_only=False)
        cands = self.index.candidates(lon, lat)
        if self.mode == "inner":
            rows_idx: list[np.ndarray] = []
            rows_pid: list[np.ndarray] = []
            for pi in cands:
                hit = self.index.contains(pi, lon, lat)
                idx = np.nonzero(hit)[0]
                if len(idx):
                    rows_idx.append(idx)
                    rows_pid.append(np.full(len(idx), pi, np.int64))
            if not rows_idx:
                idx = np.empty(0, np.int64)
                pid = np.empty(0, np.int64)
            else:
                idx = np.concatenate(rows_idx)
                pid = np.concatenate(rows_pid)
            out = batch.take(pa.array(idx))
            names = [self.index.polygons[int(p)].polygon_id for p in pid]
            return out.append_column("polygon_id", pa.array(names, pa.string()))
        # semi / anti: membership in any polygon
        any_hit = np.zeros(len(lon), dtype=bool)
        for pi in cands:
            any_hit |= self.index.contains(pi, lon, lat)
        keep = any_hit if self.mode == "semi" else ~any_hit
        return batch.filter(pa.array(keep))


# Per-worker-process index memo for the stateless-task fast path: Ray reuses
# worker processes across tasks and datasets within a session, so the index is
# built once per worker without paying an actor-pool spawn per pipeline.
def _memo_index(polygons_ref) -> PolygonIndex:
    from ..core.memo import memo_broadcast
    return memo_broadcast(f"pip:{polygons_ref.hex()}",
                          lambda: PolygonIndex(ray.get(polygons_ref)))


def pip_join(ds: ray.data.Dataset, polygons: list[Polygon] | None = None,
             mode: str = "inner", compute: str = "tasks",
             concurrency=(1, 8), batch_size: int = 65536) -> ray.data.Dataset:
    """Join a geocoded pages Dataset against the polygon set.

    ``compute="tasks"`` (default): stateless tasks with a per-worker memoized
    index — right when the index is cheap to build (broadcast table is
    small); no actor pool to spawn per pipeline run. ``compute="actors"``:
    the ST1/ST2 actor-pool pattern — required when the index build itself is
    expensive (say 10⁵+ polygons) and worth pinning to few processes.
    """
    ref = ray.put(polygons if polygons is not None else study_polygons())
    if compute == "actors":
        return ds.map_batches(
            PIPJoiner,
            fn_constructor_kwargs={"polygons_ref": ref, "mode": mode},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
            zero_copy_batch=True,
        )

    def join_batch(batch: pa.Table) -> pa.Table:
        joiner = PIPJoiner.__new__(PIPJoiner)
        joiner.index = _memo_index(ref)
        joiner.mode = mode
        return joiner(batch)

    return ds.map_batches(join_batch, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


# -------------------------------------------------- distance to coastline
def _vertex_matrix(polygons: list[Polygon] | None = None
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All polygon vertices, sorted by polygon_id so a first-match argmax
    realizes the lexicographic-min tie-break (FIXTURES.md determinism)."""
    polys = sorted(polygons or study_polygons(), key=lambda p: p.polygon_id)
    vx = np.concatenate([p.xs for p in polys])
    vy = np.concatenate([p.ys for p in polys])
    pid = np.array([p.polygon_id for p in polys for _ in p.xs])
    return vx, vy, pid


def coast_distance(ds: ray.data.Dataset,
                   polygons: list[Polygon] | None = None,
                   batch_size: int = 65536) -> ray.data.Dataset:
    """Squared integer distance (milli-deg²) from each page point to the
    nearest study-polygon VERTEX, plus that polygon's id — the webtext
    analogue of PyOFS's distance-to-shore masking
    (`/root/reference/main/PyOFS/model/wcofs.py` study-area buffering).

    The vertex table is tiny (≤ ~70 rows) and rides inside the closure —
    a broadcast side, never a shuffle; per batch it is ONE (n × V) numpy
    distance matrix + argmin. Exact: int64 products (|Δ| ≤ 360 000 →
    d² ≤ 2.6e11, far under 2^62); ties break to the lexicographically
    smallest polygon_id on BOTH sides."""
    vx, vy, pid = _vertex_matrix(polygons)

    def fn(b: pa.Table) -> pa.Table:
        lon = b["lon_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat = b["lat_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
        dx = lon[:, None] - vx[None, :]
        dy = lat[:, None] - vy[None, :]
        d2 = dx * dx + dy * dy
        d2m = d2.min(axis=1)
        first = (d2 == d2m[:, None]).argmax(axis=1)
        return pa.table({"page_key": b["page_key"],
                         "d2_min": pa.array(d2m),
                         "nearest_pid": pa.array(pid[first])})

    return ds.map_batches(fn, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


def coast_distance_sql(polygons: list[Polygon] | None = None) -> str:
    """Exact twin: VALUES vertex table, cross-join distance, window min +
    MIN(pid) among the argmin rows."""
    polys = sorted(polygons or study_polygons(), key=lambda p: p.polygon_id)
    rows = ", ".join(
        f"('{p.polygon_id}', CAST({int(x)} AS BIGINT), CAST({int(y)} AS BIGINT))"
        for p in polys for x, y in zip(p.xs, p.ys))
    return f"""v(pid, vx, vy) AS (SELECT * FROM (VALUES {rows})),
d AS (
  SELECT page_key, pid,
         (lon_milli - vx) * (lon_milli - vx)
         + (lat_milli - vy) * (lat_milli - vy) AS d2
  FROM pages CROSS JOIN v
), w AS (
  SELECT page_key, pid, d2,
         MIN(d2) OVER (PARTITION BY page_key) AS d2_min
  FROM d
)
SELECT page_key, d2_min, MIN(pid) AS nearest_pid
FROM w WHERE d2 = d2_min GROUP BY 1, 2"""
