"""Per-group convex hull (extreme points) — the vector-layer footprint
operator: each host's pages reduce to the exact extreme-point set of their
milli-degree coordinates (the polygonal footprint a vector sink writes).

Reference parity: PyOFS extracts a dataset's convex-hull footprint and
writes it as a vector layer (`write_convex_hull`,
`/root/reference/PyOFS/model/wcofs.py:1843-1901` — walks the grid boundary
and hulls the coordinate points; `SURVEY.md` K4 alongside area/perimeter in
`stages/tracking.py`). Here the hull is a DISTRIBUTED aggregate over
arbitrary point sets per group, not a single in-memory boundary walk.

Distributed shape: the convex hull is a decomposable aggregate — every
extreme point of a union is extreme in its own subset, so hull(S) =
hull(∪ partial hulls). Per batch each host segment reduces to its partial
hull (vectorized quadrilateral prune + monotone chain over the tiny
survivor set), then ONE ``hash(host) % B`` bucket exchange co-locates the
partials and the same kernel finishes per host. Only hull-sized partials
ever shuffle — a hot host's 70 % corpus share moves O(hull) rows per
batch, not its pages.

Exactness: coordinates are int64 milli-degrees; every orientation test is
an int64 cross product (|coord| ≤ 4·10⁵ so products stay < 2⁴¹). Extreme
points = strict hull vertices (collinear boundary points excluded —
`cross ≤ 0` pops in the chain), matching the SQL twin's
"p ∈ conv(others)" NOT-EXISTS characterization. Output is the UNORDERED
extreme-point set, so the twin needs no hull traversal order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

# coordinate packing for vectorized dedup: lon ∈ [-180000, 180000],
# lat ∈ [-90000, 90000] milli-degrees → one int64 key
_LON_OFF = 180_000
_LAT_OFF = 90_000
_PACK = 1 << 19  # > 180001 + 90001


def _dedup_coords(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if np.abs(x).max(initial=0) > _LON_OFF or np.abs(y).max(initial=0) > _LAT_OFF:
        raise ValueError("hull: coordinates outside milli-degree bounds")
    k = np.unique((x + _LON_OFF) * _PACK + (y + _LAT_OFF))
    return k // _PACK - _LON_OFF, k % _PACK - _LAT_OFF


def _quad_prune(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Drop points STRICTLY inside the W-S-E-N extreme quadrilateral —
    never an extreme point. Vectorized; degenerate (collinear / repeated)
    quad vertices make the strict test unsatisfiable, so pruning is
    conservative by construction."""
    corners = [np.lexsort((y, x))[0], np.lexsort((x, y))[0],
               np.lexsort((y, x))[-1], np.lexsort((x, y))[-1]]  # W, S, E, N
    keep = np.zeros(len(x), dtype=bool)
    for i in range(4):
        ax, ay = x[corners[i]], y[corners[i]]
        bx, by = x[corners[(i + 1) % 4]], y[corners[(i + 1) % 4]]
        keep |= (bx - ax) * (y - ay) - (by - ay) * (x - ax) <= 0
    return x[keep], y[keep]


def extreme_points(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact extreme-point set of the int64 point set (Andrew monotone
    chain, strict turns). Dedup + vectorized prune first; the sequential
    stack loop runs only over the pruned survivors (O(hull + boundary
    shell), not O(points))."""
    x, y = _dedup_coords(np.asarray(x, np.int64), np.asarray(y, np.int64))
    if len(x) > 256:
        x, y = _quad_prune(x, y)
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    n = len(xs)
    if n <= 2:
        return xs, ys

    def chain(idx_iter):
        h: list[int] = []
        for i in idx_iter:
            while len(h) >= 2:
                ax, ay, bx, by = xs[h[-2]], ys[h[-2]], xs[h[-1]], ys[h[-1]]
                if (bx - ax) * (ys[i] - ay) - (by - ay) * (xs[i] - ax) <= 0:
                    h.pop()  # clockwise or collinear — not a strict vertex
                else:
                    break
            h.append(i)
        return h[:-1]

    lower = chain(range(n))
    upper = chain(range(n - 1, -1, -1))
    keep = np.array(lower + upper, dtype=np.int64)
    return xs[keep], ys[keep]


def group_extreme_points(ds: ray.data.Dataset, key: str = "host",
                         x_col: str = "lon_milli", y_col: str = "lat_milli",
                         num_buckets: int | None = None) -> ray.data.Dataset:
    """(key, lon_milli, lat_milli) extreme-point rows per group."""
    from .agg import hash_bucket_tag

    if num_buckets is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        num_buckets = max(8, cpus)
    nb = num_buckets

    def per_group(keys: np.ndarray, x: np.ndarray, y: np.ndarray) -> pa.Table:
        order = np.argsort(keys, kind="stable")
        keys, x, y = keys[order], x[order], y[order]
        starts = np.flatnonzero(
            np.r_[True, keys[1:] != keys[:-1]]) if len(keys) else np.array([], np.int64)
        bounds = np.r_[starts, len(keys)]
        ks, xs, ys = [], [], []
        for s, t in zip(bounds[:-1], bounds[1:]):
            hx, hy = extreme_points(x[s:t], y[s:t])
            ks.append(np.full(len(hx), keys[s], dtype=object))
            xs.append(hx)
            ys.append(hy)
        if not ks:
            return pa.table({key: pa.array([], pa.string()),
                             x_col: pa.array([], pa.int64()),
                             y_col: pa.array([], pa.int64())})
        return pa.table({key: pa.array(np.concatenate(ks), pa.string()),
                         x_col: pa.array(np.concatenate(xs)),
                         y_col: pa.array(np.concatenate(ys))})

    def partial(b: pa.Table) -> pa.Table:
        t = per_group(
            np.asarray(b[key].to_pylist(), dtype=object),
            b[x_col].to_numpy(zero_copy_only=False).astype(np.int64),
            b[y_col].to_numpy(zero_copy_only=False).astype(np.int64))
        return hash_bucket_tag(t, [key], nb)

    def finish(g: pa.Table) -> pa.Table:
        return per_group(
            np.asarray(g[key].to_pylist(), dtype=object),
            g[x_col].to_numpy(zero_copy_only=False).astype(np.int64),
            g[y_col].to_numpy(zero_copy_only=False).astype(np.int64))

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("_bucket").map_groups(finish, batch_format="pyarrow"))
