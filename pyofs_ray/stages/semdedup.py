"""SemDeDup: semantic deduplication via within-cluster embedding similarity
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication").

The published recipe: k-means-cluster the embedding corpus, then search for
near-duplicate pairs ONLY inside each cluster (pairwise similarity is
affordable because per-cluster sizes are bounded by choosing K ∝ N), keep
one representative per duplicate component. This composes two operators the
engine already has — nearest-centroid assignment
(`pipelines/corpus.embedding_kmeans_assign`) and exact cosine verification
(`stages/ann`) — into the end-to-end curation stage.

Scale shape: the K-row centroid matrix broadcasts once (``ray.put`` +
memoized stateless tasks); assignment is one matmul+argmax per batch. The
corpus then moves through ONE ``hash(cluster) % B`` bucket exchange (the
high-cardinality-key rule from `agg.bucketed_group_agg` — production K is
~N / target_cluster_size, i.e. cardinality tracks the corpus). Inside each
bucket group every cluster segment runs one vectorized kernel: normalized
matmul → thresholded adjacency → iterative min-label components → keep =
(vec_id == component min). Per-cluster cost is O(c²·D) by design — the
``max_cluster`` guard raises loudly instead of silently degrading when K
was sized wrong for the corpus.

Exactness: all outputs are integers/bools. Pair decisions are float cosine
compares, exact in practice because the fixture's natural similarities sit
far below the 0.95 threshold while injected duplicates are bit-identical
vectors (cosine exactly 1.0) — the same margin argument
`embedding_dup_pairs` documents (`stages/ann.py`). Cluster assignment
inherits `embedding_kmeans_assign`'s near-tie assumption.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .ann import _embedding_matrix, _normalize


def _component_keep(vids: np.ndarray, m: np.ndarray,
                    threshold: float) -> np.ndarray:
    """keep mask for ONE cluster: iterative min-label propagation over the
    thresholded cosine adjacency (diameter-bounded loop; dup components in
    real corpora are tiny cliques, so this converges in 1–2 rounds)."""
    c = len(vids)
    if c <= 1:
        return np.ones(c, dtype=bool)
    sims = m @ m.T
    adj = sims >= threshold
    np.fill_diagonal(adj, False)
    labels = vids.astype(np.int64, copy=True)
    big = np.iinfo(np.int64).max
    while True:
        neigh = np.where(adj, labels[None, :], big).min(axis=1)
        new = np.minimum(labels, neigh)
        if np.array_equal(new, labels):
            break
        labels = new
    return labels == vids


def semdedup(ds: ray.data.Dataset, centroids: pa.Table,
             threshold: float = 0.95, num_buckets: int | None = None,
             max_cluster: int = 4096) -> ray.data.Dataset:
    """(vec_id, cluster_id, keep) for every vector: keep is False exactly
    for the non-minimum members of each within-cluster duplicate component.

    ``centroids``: small (vec_id, embedding) table — broadcast, never
    shuffled. ``max_cluster``: loud ceiling on any single cluster's size
    (the O(c²) pairwise block); size K so clusters stay under it.
    """
    if num_buckets is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        num_buckets = max(8, cpus)
    ref = ray.put(centroids)
    nb = num_buckets

    def assign(b: pa.Table) -> pa.Table:
        from ..core.memo import memo_broadcast
        cmat, cids = memo_broadcast(
            f"semdedup_cent:{ref.hex()}",
            lambda: (_normalize(_embedding_matrix(ray.get(ref))),
                     ray.get(ref)["vec_id"].to_numpy(zero_copy_only=False)
                         .astype(np.int64)))
        m = _normalize(_embedding_matrix(b))
        best = np.argmax(m @ cmat.T, axis=1)  # first max = lowest centroid
        cluster = cids[best]
        return pa.table({
            "vec_id": b["vec_id"],
            "cluster_id": pa.array(cluster),
            "embedding": b["embedding"],
            "_bucket": pa.array((cluster % nb).astype(np.int64)),
        })

    tagged = ds.map_batches(assign, batch_format="pyarrow",
                            zero_copy_batch=True)

    def kernel(g: pa.Table) -> pa.Table:
        vids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = g["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_embedding_matrix(g))
        order = np.lexsort((vids, cl))
        vids, cl, m = vids[order], cl[order], m[order]
        keep = np.ones(len(vids), dtype=bool)
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        bounds = np.r_[starts, len(cl)]
        for s, t in zip(bounds[:-1], bounds[1:]):
            if t - s > max_cluster:
                raise ValueError(
                    f"semdedup: cluster {cl[s]} has {t - s} members "
                    f"(> max_cluster={max_cluster}) — increase K so "
                    "per-cluster pairwise blocks stay bounded")
            keep[s:t] = _component_keep(vids[s:t], m[s:t], threshold)
        return pa.table({"vec_id": pa.array(vids),
                         "cluster_id": pa.array(cl),
                         "keep": pa.array(keep)})

    return tagged.groupby("_bucket").map_groups(kernel,
                                                batch_format="pyarrow")
