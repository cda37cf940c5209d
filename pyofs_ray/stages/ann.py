"""Similarity search over the embeddings table (`list<float>` column).

Brute-force cosine top-k is the exact baseline — one numpy matmul per batch
against a broadcast query matrix (the `ray.put` small-side pattern). The
scale path is random-hyperplane LSH bucketing: H fixed deterministic
hyperplanes → sign-bit bucket per vector; a query probes its own bucket plus
all Hamming-1 neighbors (multi-probe), then ranks candidates exactly.
Recall is probabilistic, precision exact (candidates re-ranked by true
cosine); the oracle-checked output carries ranks only — float similarity
values are reduction-order-dependent and are excluded from exact compare
(ranks are stable because random embeddings have similarity gaps ≫ ulp).

PyOFS lineage: the nearest/bilinear point-sample interpolation (SURVEY.md
J3/J4, `wcofs.py:1791-1827`, `particle_contour.py:249-298`) is the same
"find closest reference vectors, weighted-combine" shape, lifted from 2-D
grids to d-dim embeddings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..core.hashing import splitmix64


def _embedding_matrix(b: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = b[col].combine_chunks() if isinstance(b[col], pa.ChunkedArray) else b[col]
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.sqrt((m * m).sum(axis=1, keepdims=True))
    norm[norm == 0] = 1.0
    return m / norm


class BruteForceTopK:
    """Actor: per batch, cosine top-k of every base vector against the
    broadcast query matrix → rows (query_id, vec_id, rank)."""

    def __init__(self, queries_ref, k: int = 5):
        qtab = ray.get(queries_ref)
        self.qids = qtab["vec_id"].to_numpy(zero_copy_only=False)
        self.qmat = _normalize(_embedding_matrix(qtab))
        self.k = k

    def __call__(self, b: pa.Table) -> pa.Table:
        vids = b["vec_id"].to_numpy(zero_copy_only=False)
        m = _normalize(_embedding_matrix(b))
        sims = m @ self.qmat.T  # (batch, Q)
        # partial top-k per query WITHIN the batch: only Q×k rows leave each
        # batch (k+ties-exact via (-sim, vec_id) lexsort), not batch×Q.
        k = min(self.k + 1, len(vids))  # +1 headroom for self-exclusion later
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[1]):
            order = np.lexsort((vids, -sims[:, qi]))[:k]
            out_q.append(np.full(len(order), self.qids[qi], np.int64))
            out_v.append(vids[order])
            out_s.append(sims[order, qi])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "sim": pa.array(np.concatenate(out_s)),
        })


def ann_topk_brute(ds: ray.data.Dataset, queries: pa.Table, k: int = 5,
                   exclude_self: bool = True) -> pd.DataFrame:
    """Exact top-k (per query) over the full base set.

    Per-batch sims stream into a per-query top-k reduce on the driver —
    the result is Q×k rows (tiny); the base set is never materialized.
    """
    ref = ray.put(queries)
    sims = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k},
        batch_format="pyarrow", concurrency=(1, 8), num_cpus=1,
        zero_copy_batch=True)

    def topk_group(g: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            g = g[g.vec_id != g.query_id]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["query_id", "vec_id", "rank"]]

    from .agg import auto_partitions
    return (sims.repartition(auto_partitions())
                .groupby("query_id")
                .map_groups(topk_group, batch_format="pandas")
                .to_pandas())


# ---------------------------------------------------------------- LSH path
NUM_PLANES = 5  # few planes + deep multi-probe: tuned for low-similarity corpora


def _hyperplanes(dim: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from splitmix64 bits."""
    n = NUM_PLANES * dim
    u = splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(0xABCDEF))
    # uniform in [-1, 1)
    vals = (u.astype(np.float64) / 2**64) * 2 - 1
    return vals.reshape(NUM_PLANES, dim)


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0  # (n, H)
    keys = np.zeros(len(m), dtype=np.int64)
    for h in range(planes.shape[0]):
        keys |= bits[:, h].astype(np.int64) << h
    return keys


# ----------------------------------------------------------------- IVF path
IVF_LISTS = 16
IVF_LLOYD_ITERS = 3


def ivf_centroids(sample: np.ndarray, nlist: int = IVF_LISTS,
                  iters: int = IVF_LLOYD_ITERS) -> np.ndarray:
    """Deterministic IVF coarse centroids: seed with the first ``nlist``
    sample vectors, then a few Lloyd iterations (cosine/spherical k-means:
    re-normalize means). No RNG — same input → same index."""
    m = _normalize(sample.astype(np.float64))
    cents = m[:nlist].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(len(cents)):
            sel = assign == c
            if sel.any():
                cents[c] = m[sel].mean(axis=0)
        cents = _normalize(cents)
    return cents


def ann_topk_ivf(ds: ray.data.Dataset, queries: pa.Table, k: int = 5,
                 nprobe: int = 4, train_sample: int = 2048,
                 exclude_self: bool = True) -> pd.DataFrame:
    """IVF approximate top-k: vectors partition into ``IVF_LISTS`` coarse
    cells (nearest centroid); each query scans only its ``nprobe`` nearest
    lists, candidates ranked by exact cosine. Centroids train once on a
    deterministic prefix sample (broadcast; at 100 TB train on a fixed
    shard). Recall grows with nprobe (= 1.0 at nprobe=IVF_LISTS)."""
    train = np.stack(ds.limit(train_sample).to_pandas().embedding.to_numpy())
    cents = ivf_centroids(train)
    qmat = _normalize(_embedding_matrix(queries))
    qids = queries["vec_id"].to_numpy(zero_copy_only=False)
    qlists = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    list_to_q: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for li in qlists[qi]:
            list_to_q.setdefault(int(li), []).append(qi)
    payload_ref = ray.put((cents, list_to_q, qmat, qids))

    class Probe:
        def __init__(self):
            self.cents, self.list_to_q, self.qmat, self.qids = ray.get(payload_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = _normalize(_embedding_matrix(b))
            vids = b["vec_id"].to_numpy(zero_copy_only=False)
            assign = np.argmax(m @ self.cents.T, axis=1)
            out_q, out_v, out_s = [], [], []
            for li in np.unique(assign):
                qis = self.list_to_q.get(int(li))
                if not qis:
                    continue
                sel = assign == li
                sims = m[sel] @ self.qmat[qis].T
                out_q.append(np.repeat(self.qids[qis], sel.sum()))
                out_v.append(np.tile(vids[sel], len(qis)))
                out_s.append(sims.T.ravel())
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                             "vec_id": pa.array(np.concatenate(out_v)),
                             "sim": pa.array(np.concatenate(out_s))})

    sims = ds.map_batches(Probe, batch_format="pyarrow",
                          concurrency=(1, 8), num_cpus=1, zero_copy_batch=True)

    def topk_group(g: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            g = g[g.vec_id != g.query_id]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        return g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))[
            ["query_id", "vec_id", "rank"]]

    from .agg import auto_partitions
    return (sims.repartition(auto_partitions())
                .groupby("query_id")
                .map_groups(topk_group, batch_format="pandas").to_pandas())


def embedding_dup_pairs(ds: ray.data.Dataset, threshold: float = 0.95,
                        dim: int | None = None) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold).

    Scale path: vectors land in sign-LSH buckets (near-identical vectors
    agree on every plane with prob → 1), pairs are enumerated within each
    bucket and **exactly verified** by true cosine — precision exact, recall
    the standard LSH guarantee (high for genuine near-dups; each pair is
    caught if it shares any of the probed buckets).
    """
    if dim is None:
        first = ds.take_batch(1, batch_format="pyarrow")
        dim = len(first["embedding"][0].as_py())
    planes = _hyperplanes(dim)

    def bucketize(b: pa.Table) -> pa.Table:
        m = _normalize(_embedding_matrix(b))
        keys = _bucket_of(m, planes)
        return pa.table({"vec_id": b["vec_id"], "bucket": pa.array(keys),
                         "embedding": b["embedding"]})

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=float)})
        g = g.sort_values("vec_id")
        ids = g.vec_id.to_numpy()
        m = _normalize(np.stack(g.embedding.to_numpy()).astype(np.float64))
        sims = m @ m.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] >= threshold
        return pd.DataFrame({"id_a": ids[ii[keep]], "id_b": ids[jj[keep]],
                             "cosine": sims[ii[keep], jj[keep]]})

    pairs = (ds.map_batches(bucketize, batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(pairs_of_bucket, batch_format="pandas")
               .to_pandas())
    if pairs.empty:  # no bucket produced a pair → typed empty result
        return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                             "id_b": pd.Series([], dtype=np.int64),
                             "cosine": pd.Series([], dtype=float)})
    return (pairs.drop_duplicates(["id_a", "id_b"])
                 .sort_values(["id_a", "id_b"]).reset_index(drop=True))


class LSHBucketer:
    def __init__(self, dim: int):
        self.planes = _hyperplanes(dim)

    def __call__(self, b: pa.Table) -> pa.Table:
        m = _normalize(_embedding_matrix(b))
        keys = _bucket_of(m, self.planes)
        return b.append_column("bucket", pa.array(keys))


def ann_topk_lsh(ds: ray.data.Dataset, queries: pa.Table, k: int = 5,
                 dim: int | None = None, exclude_self: bool = True) -> pd.DataFrame:
    """LSH-bucketed approximate top-k: each query probes its bucket + all
    Hamming-1 buckets; candidates ranked by exact cosine."""
    if dim is None:
        dim = len(queries["embedding"][0].as_py())
    planes = _hyperplanes(dim)
    qmat = _normalize(_embedding_matrix(queries))
    qids = queries["vec_id"].to_numpy(zero_copy_only=False)
    qbuckets = _bucket_of(qmat, planes)
    probe: dict[int, list[int]] = {}
    for qi, bkt in enumerate(qbuckets):
        wanted = {int(bkt)}
        for h in range(NUM_PLANES):            # Hamming-1 probes
            wanted.add(int(bkt) ^ (1 << h))
            for h2 in range(h + 1, NUM_PLANES):  # Hamming-2 probes
                wanted.add(int(bkt) ^ (1 << h) ^ (1 << h2))
        for w in wanted:
            probe.setdefault(w, []).append(qi)
    probe_ref = ray.put((probe, qmat, qids))

    class Probe:
        def __init__(self):
            self.planes = planes
            self.probe, self.qmat, self.qids = ray.get(probe_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = _normalize(_embedding_matrix(b))
            keys = _bucket_of(m, self.planes)
            vids = b["vec_id"].to_numpy(zero_copy_only=False)
            out_q, out_v, out_s = [], [], []
            for bkt in np.unique(keys):
                qis = self.probe.get(int(bkt))
                if not qis:
                    continue
                sel = keys == bkt
                sims = m[sel] @ self.qmat[qis].T  # (n_sel, n_q)
                out_q.append(np.repeat(self.qids[qis], sel.sum()))
                out_v.append(np.tile(vids[sel], len(qis)))
                out_s.append(sims.T.ravel())
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                             "vec_id": pa.array(np.concatenate(out_v)),
                             "sim": pa.array(np.concatenate(out_s))})

    sims = ds.map_batches(Probe, batch_format="pyarrow",
                          concurrency=(1, 8), num_cpus=1, zero_copy_batch=True)

    def topk_group(g: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            g = g[g.vec_id != g.query_id]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        return g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))[
            ["query_id", "vec_id", "rank"]]

    from .agg import auto_partitions
    return (sims.repartition(auto_partitions())
                .groupby("query_id")
                .map_groups(topk_group, batch_format="pandas").to_pandas())
