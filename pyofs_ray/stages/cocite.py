"""Co-citation analysis over the deterministic link graph: source pairs
that link to the same target, counted and ranked — the web-graph analogue
of the reference's station-pair co-observation comparisons
(`/root/reference/main/validation.py` pairs observation platforms over a
shared grid cell; here the shared key is the link target).

Scale shape
-----------
Edges are generated per batch from the rank-free `linkgraph._out_edges`
generator (never materialized as a table). Exchange 1 co-locates edges by
``hash(dst) % B`` bucket; inside each bucket group ONE vectorized kernel
sorts by (dst, src) and enumerates within-target index pairs (bounded by
in-degree² per target — in-degree is ~Poisson(2.5) under the generator).
Exchange 2 is the pair-count reduce via `bucketed_group_agg` on the
(src_a, src_b) composite key; the finish is per-block partial top-k →
one bounded k-row reduce (exactly `corpus.top_tokens`' shape).

Exactness: pairs are emitted per edge-INSTANCE (multiset semantics), so
the count matches the SQL self-join ``a.dst = b.dst AND a.src < b.src``
bit-for-bit, including duplicate-edge corner cases.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .agg import bucketed_group_agg
from .linkgraph import _out_edges, edges_cte

COCITE_K = 100


def _pair_rows(g: pa.Table) -> pa.Table:
    """One bucket group → (src_a, src_b, one) rows for every unordered
    source pair sharing a dst (src_a < src_b; equal-src instance pairs
    are excluded, matching the strict SQL inequality)."""
    dst = g["dst"].to_numpy().astype(np.int64)
    src = g["src"].to_numpy().astype(np.int64)
    order = np.lexsort((src, dst))
    d, s = dst[order], src[order]
    starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
    counts = np.diff(np.r_[starts, len(d)])
    # per element: number of later elements in its segment
    li = np.arange(len(d)) - np.repeat(starts, counts)
    reps = np.repeat(counts, counts) - 1 - li
    a_idx = np.repeat(np.arange(len(d)), reps)
    head = np.cumsum(reps) - reps
    b_idx = np.arange(int(reps.sum())) - np.repeat(head, reps) + a_idx + 1
    s1, s2 = s[a_idx], s[b_idx]
    keep = s1 != s2
    s1, s2 = s1[keep], s2[keep]
    lo, hi = np.minimum(s1, s2), np.maximum(s1, s2)
    return pa.table({"src_a": pa.array(lo, pa.int64()),
                     "src_b": pa.array(hi, pa.int64()),
                     "one": pa.array(np.ones(len(lo), np.int64))})


def cocitation_topk(doc_ids: ray.data.Dataset, n_nodes: int,
                    id_col: str = "doc_id", k: int = COCITE_K,
                    num_buckets: int | None = None) -> ray.data.Dataset:
    """Top-k co-cited source pairs (count DESC, src_a ASC, src_b ASC)."""
    if num_buckets is None:
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else 8
        num_buckets = max(8, cpus)

    def expand(b: pa.Table) -> pa.Table:
        node = b[id_col].to_numpy().astype(np.int64)
        src_rep, dst, _ = _out_edges(node, n_nodes)
        # same-dst-same-bucket tag (splitmix-style mix of the target id)
        h = dst.view(np.uint64).copy()
        with np.errstate(over="ignore"):
            h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(27)
        return pa.table({
            "src": pa.array(src_rep, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "_bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int64))})

    pair_counts = bucketed_group_agg(
        doc_ids.map_batches(expand, batch_format="pyarrow")
               .groupby("_bucket")
               .map_groups(_pair_rows, batch_format="pyarrow"),
        keys=["src_a", "src_b"],
        aggs=[("one", "sum", "cocitations")])

    def topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[("cocitations", "descending"),
                                            ("src_a", "ascending"),
                                            ("src_b", "ascending")])
        return b.take(idx[:k]).select(["src_a", "src_b", "cocitations"])

    return (pair_counts.map_batches(topk, batch_format="pyarrow")
                       .repartition(1)
                       .map_batches(topk, batch_format="pyarrow"))


def cocitation_sql(k: int = COCITE_K, table: str = "documents",
                   id_col: str = "doc_id") -> str:
    return f"""
WITH {edges_cte(table, id_col)}
SELECT a.src AS src_a, b.src AS src_b,
       CAST(COUNT(*) AS BIGINT) AS cocitations
FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
GROUP BY 1, 2
ORDER BY cocitations DESC, src_a ASC, src_b ASC
LIMIT {k}"""
