"""Link-graph analytics over the page corpus: deterministic synthetic
out-link generation, integer PageRank, and in-degree statistics.

The web-graph analogue of the reference's iterative field propagation
(`/root/reference/main/tracking/particle_contour.py:60-120` advances state
through repeated pure steps; here the state is a rank vector advanced
through repeated sparse matrix-vector products).

Scale shape
-----------
Edges are a pure function of the source id (out-degree ``1 + src % 4``,
targets ``(src*7919 + j*104729 + 1) % n``), so the edge table is NEVER
materialized or shuffled: each iteration is one ``map_batches`` that
flat-expands a rank batch into (dst, contribution) rows — plus a zero
self-row per node so rankless nodes survive the reduce — followed by ONE
`bucketed_int64_group_sum` exchange keyed on the node id. Three
iterations = three exchanges total; ranks never land on the driver.

Exactness
---------
All arithmetic is int64 floor math on non-negative operands (rank scaled
by 10^12, damping as ``(85 * m) // 100``), so contribution sums are
order-independent and the DuckDB twin (unrolled iteration CTEs with the
same generator expressions) is bit-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .agg import bucketed_group_agg, bucketed_int64_group_sum

RANK_SCALE = 10**12
DAMP_NUM = 85      # damping 0.85 as an exact integer ratio
DAMP_DEN = 100
EDGE_MUL = 7919    # src multiplier (prime)
EDGE_JMUL = 104729  # per-slot offset multiplier (prime)


def _out_edges(node: np.ndarray, n_nodes: int
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized deterministic out-links for a batch of node ids.

    Returns (src_repeated, dst, segment_j): ``1 + src % 4`` targets per
    source, ``dst = (src*EDGE_MUL + j*EDGE_JMUL + 1) % n_nodes``.
    """
    deg = 1 + (node % 4)
    src_rep = np.repeat(node, deg)
    starts = np.cumsum(deg) - deg
    j = np.arange(len(src_rep), dtype=np.int64) - np.repeat(starts, deg)
    dst = (src_rep * EDGE_MUL + j * EDGE_JMUL + 1) % n_nodes
    return src_rep, dst, j


def pagerank(ranks: ray.data.Dataset, n_nodes: int, iterations: int = 3,
             num_buckets: int | None = None) -> ray.data.Dataset:
    """Integer PageRank over the deterministic link graph.

    ``ranks``: Dataset with int64 columns (node, rank); every node id in
    [0, n_nodes) must appear exactly once. Returns the same schema after
    ``iterations`` sparse propagation rounds.
    """
    base = (RANK_SCALE * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n_nodes)

    def expand(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy().astype(np.int64)
        rank = b["rank"].to_numpy().astype(np.int64)
        deg = 1 + (node % 4)
        contrib = rank // deg
        src_rep, dst, _ = _out_edges(node, n_nodes)
        out_node = np.concatenate([node, dst])
        out_c = np.concatenate(
            [np.zeros(len(node), np.int64), np.repeat(contrib, deg)])
        return pa.table({"node": pa.array(out_node, pa.int64()),
                         "contrib": pa.array(out_c, pa.int64())})

    def apply_rank(b: pa.Table) -> pa.Table:
        m = b["contrib"].to_numpy().astype(np.int64)
        rank = base + (DAMP_NUM * m) // DAMP_DEN
        return pa.table({"node": b["node"].cast(pa.int64()),
                         "rank": pa.array(rank, pa.int64())})

    for _ in range(iterations):
        ranks = bucketed_int64_group_sum(
            ranks.map_batches(expand, batch_format="pyarrow"),
            "node", ["contrib"], num_buckets=num_buckets
        ).map_batches(apply_rank, batch_format="pyarrow")
    return ranks


def initial_ranks(doc_ids: ray.data.Dataset, n_nodes: int,
                  id_col: str = "doc_id") -> ray.data.Dataset:
    """Uniform starting rank vector (RANK_SCALE // n per node)."""
    r0 = RANK_SCALE // n_nodes

    def init(b: pa.Table) -> pa.Table:
        node = b[id_col].cast(pa.int64())
        return pa.table({"node": node,
                         "rank": pa.array(np.full(len(b), r0, np.int64))})

    return doc_ids.map_batches(init, batch_format="pyarrow")


def indegree_stats(doc_ids: ray.data.Dataset, n_nodes: int,
                   id_col: str = "doc_id",
                   num_buckets: int | None = None) -> ray.data.Dataset:
    """Per-target in-link statistics: in_degree + min source id, for
    targets with at least one in-link (GROUP BY dst semantics)."""

    def expand(b: pa.Table) -> pa.Table:
        node = b[id_col].to_numpy().astype(np.int64)
        src_rep, dst, _ = _out_edges(node, n_nodes)
        return pa.table({"node": pa.array(dst, pa.int64()),
                         "src": pa.array(src_rep, pa.int64()),
                         "one": pa.array(np.ones(len(dst), np.int64))})

    return bucketed_group_agg(
        doc_ids.map_batches(expand, batch_format="pyarrow"),
        ["node"],
        [("one", "sum", "in_degree"), ("src", "min", "min_src")],
        num_buckets=num_buckets)


def _pair_bucket(b: np.ndarray, c: np.ndarray, num_buckets: int
                 ) -> np.ndarray:
    """Bucket tag for an (int64, int64) edge key — same mix on both the
    edge and wedge sides so matching pairs land in the same group."""
    from ..core.hashing import splitmix64
    h = splitmix64(b.view(np.uint64) ^ splitmix64(c.view(np.uint64)))
    return ((h >> np.uint64(3)) % np.uint64(num_buckets)).astype(np.int64)


def triangle_counts(doc_ids: ray.data.Dataset, n_nodes: int,
                    id_col: str = "doc_id",
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Per-node triangle participation over the undirected link graph
    (the clustering-coefficient numerator): for every triangle a<b<c each
    vertex's count increments. Nodes in no triangle are absent (GROUP BY
    semantics).

    Scale shape — THREE bucket exchanges, never an all-pairs step:

    1. ``u``-bucket exchange: dedupe the (u<v)-oriented edges AND
       enumerate wedges ``(a,b,c) = (u, v_i, v_j)`` per source segment in
       the SAME group call (vectorized rank/repeat kernel; wedge count
       per node is ``deg·(deg-1)/2``, bounded by the generator's ≤8
       incident edges — the general-graph guard is degree-ordered
       orientation, which this orientation approximates on the
       near-regular generator graph).
    2. (b,c)-pair-hash exchange carrying BOTH deduped edges (side 0) and
       wedges (side 1): per group, one Acero multi-key semi-join closes
       the wedges; matched triangles flat-expand to 3 (node, 1) rows.
    3. node-keyed `bucketed_int64_group_sum` for the counts.
    """

    def edges_and_wedges(b: pa.Table) -> pa.Table:
        node = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        src, dst, _ = _out_edges(node, n_nodes)
        u = np.minimum(src, dst)
        v = np.maximum(src, dst)
        keep = u != v
        u, v = u[keep], v[keep]
        t = (pa.table({"u": pa.array(u), "v": pa.array(v)})
             .group_by(["u", "v"]).aggregate([]))  # per-batch dedupe
        uu = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"u": t["u"], "v": t["v"],
                         "_bucket": pa.array(uu % num_buckets)})

    tagged = doc_ids.map_batches(edges_and_wedges, batch_format="pyarrow")

    def dedupe_and_wedge(g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        if len(u):
            first = np.empty(len(u), bool)
            first[0] = True
            first[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
            u, v = u[first], v[first]
        n = len(u)
        # segment ranks within each u run (v ascending → emitted b < c)
        new = np.empty(n, bool)
        if n:
            new[0] = True
            new[1:] = u[1:] != u[:-1]
        pos = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new, pos, -1))
        r = pos - seg_start
        # each position j pairs with the r[j] earlier members of its run
        rep = np.repeat(pos, r)
        cum = np.concatenate([[0], np.cumsum(r)])
        i_local = np.arange(len(rep), dtype=np.int64) - np.repeat(cum[:-1], r)
        first_idx = np.repeat(seg_start, r) + i_local
        wb, wc, wa = v[first_idx], v[rep], u[rep]
        out_b = np.concatenate([u, wb])
        out_c = np.concatenate([v, wc])
        out_a = np.concatenate([np.full(n, -1, np.int64), wa])
        side = np.r_[np.zeros(n, np.int8), np.ones(len(wa), np.int8)]
        return pa.table({
            "b": pa.array(out_b), "c": pa.array(out_c),
            "a": pa.array(out_a), "_side": pa.array(side),
            "_b2": pa.array(_pair_bucket(out_b, out_c, num_buckets)),
        })

    mixed = tagged.groupby("_bucket").map_groups(
        dedupe_and_wedge, batch_format="pyarrow")

    def close_wedges(g: pa.Table) -> pa.Table:
        is_edge = pc.equal(g["_side"], pa.scalar(0, pa.int8()))
        edges = g.filter(is_edge).select(["b", "c"])
        wedges = g.filter(pc.invert(is_edge)).select(["a", "b", "c"])
        tri = wedges.join(edges, keys=["b", "c"], join_type="left semi")
        node = pa.concat_arrays([tri["a"].combine_chunks(),
                                 tri["b"].combine_chunks(),
                                 tri["c"].combine_chunks()])
        return pa.table({"node": node,
                         "one": pa.array(np.ones(len(node), np.int64))})

    counted = mixed.groupby("_b2").map_groups(
        close_wedges, batch_format="pyarrow")
    out = bucketed_int64_group_sum(counted, "node", ["one"],
                                   num_buckets=num_buckets)
    return out.map_batches(
        lambda t: pa.table({"node": t["node"], "triangles": t["one"]}),
        batch_format="pyarrow")


def triangles_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    return f"""WITH {edges_cte(table, id_col)},
und AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        FROM edges WHERE src <> dst),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
) GROUP BY node"""


# ------------------------------------------------------------------ SQL twins

def edges_cte(table: str = "documents", id_col: str = "doc_id") -> str:
    """Shared CTE prefix: node count + the deterministic edge generator."""
    return f"""
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {table}),
js AS (SELECT UNNEST([CAST(0 AS BIGINT), 1, 2, 3]) AS j),
edges AS (
  SELECT d.{id_col} AS src,
         (d.{id_col} * {EDGE_MUL} + js.j * {EDGE_JMUL} + 1) % nn.n AS dst
  FROM {table} d CROSS JOIN nn CROSS JOIN js
  WHERE js.j <= d.{id_col} % 4
)"""


def pagerank_sql(iterations: int = 3, table: str = "documents",
                 id_col: str = "doc_id") -> str:
    """Unrolled-iteration DuckDB twin of `pagerank` (bit-exact int64
    floor arithmetic; SUM promoted to HUGEINT then cast back)."""
    parts = [f"WITH {edges_cte(table, id_col)}",
             f"""r0 AS (
  SELECT d.{id_col} AS node,
         CAST({RANK_SCALE} AS BIGINT) // nn.n AS rank
  FROM {table} d CROSS JOIN nn)"""]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(f"""s{i} AS (
  SELECT e.dst AS node,
         CAST(SUM(r.rank // (1 + e.src % 4)) AS BIGINT) AS m
  FROM edges e JOIN {prev} r ON r.node = e.src
  GROUP BY e.dst)""")
        parts.append(f"""r{i} AS (
  SELECT d.{id_col} AS node,
         ({RANK_SCALE} * {DAMP_DEN - DAMP_NUM}) // ({DAMP_DEN} * nn.n)
           + ({DAMP_NUM} * COALESCE(s{i}.m, 0)) // {DAMP_DEN} AS rank
  FROM {table} d CROSS JOIN nn
  LEFT JOIN s{i} ON s{i}.node = d.{id_col})""")
        prev = f"r{i}"
    return (",\n".join(parts)
            + f"\nSELECT node, rank FROM {prev}")


def indegree_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    return f"""WITH {edges_cte(table, id_col)}
SELECT dst AS node,
       CAST(COUNT(*) AS BIGINT) AS in_degree,
       CAST(MIN(src) AS BIGINT) AS min_src
FROM edges GROUP BY dst"""


# ------------------------------------------- redirect resolution (pointer x2)

REDIR_MOD = 4  # chain fixture: k redirects to k-1 unless k % REDIR_MOD == 0


def redirect_pointers(doc_ids: ray.data.Dataset,
                      id_col: str = "doc_id") -> ray.data.Dataset:
    """Initial pointer table for the deterministic redirect fixture:
    every page with ``k % REDIR_MOD != 0`` redirects to ``k-1`` (chains of
    length ≤ REDIR_MOD-1 ending at the multiple-of-REDIR_MOD terminal);
    terminals point at themselves."""

    def init(b: pa.Table) -> pa.Table:
        k = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ptr = np.where(k % REDIR_MOD == 0, k, k - 1)
        return pa.table({"node": pa.array(k),
                         "ptr": pa.array(ptr, pa.int64())})

    return doc_ids.map_batches(init, batch_format="pyarrow")


def resolve_redirects(ptrs: ray.data.Dataset, rounds: int = 2,
                      num_buckets: int = 64) -> ray.data.Dataset:
    """Pointer doubling: after round i every node's pointer has jumped
    2^i hops, so ``rounds = ceil(log2(max_chain))`` resolves every chain —
    the LOG-round iterative primitive (label propagation is the LINEAR
    one; a 1B-long redirect set with chains ≤ 2^r needs only r bucketed
    self-joins, each ONE exchange).

    Self-pointing terminals make the join total: ptr(ptr) always exists,
    so an inner join loses nothing and no driver-side fix-up is needed.

    The pointer table is materialized per round: each round references it
    TWICE (left and right of the self-join), and Ray does not dedupe
    common lazy subplans — un-materialized, round i re-executes every
    earlier round's exchange once per branch (2^i growth; measured 8–9 s
    → 2.8 s at rounds=2). The per-round table is 2 int64 columns × n rows
    in the (spillable) object store — the iteration state any pointer-
    doubling scheme must hold.
    """
    from .join import bucketed_hash_join

    for _ in range(rounds):
        # ptr2(node) = ptr(ptr(node)): join left.ptr against right.node
        left = ptrs.map_batches(
            lambda b: pa.table({"node": b["node"],
                                "join_key": b["ptr"]}),
            batch_format="pyarrow")
        right = ptrs.map_batches(
            lambda b: pa.table({"join_key": b["node"],
                                "ptr": b["ptr"]}),
            batch_format="pyarrow")
        joined = bucketed_hash_join(left, right, key="join_key",
                                    num_buckets=num_buckets)
        ptrs = joined.map_batches(
            lambda b: pa.table({"node": b["node"], "ptr": b["ptr"]}),
            batch_format="pyarrow").materialize()
    return ptrs


def resolve_redirects_sql(rounds: int = 2, table: str = "documents",
                          id_col: str = "doc_id") -> str:
    """Unrolled pointer-doubling twin (pure int64 arithmetic)."""
    parts = [f"""WITH r0 AS (
  SELECT {id_col} AS node,
         CASE WHEN {id_col} % {REDIR_MOD} = 0 THEN {id_col}
              ELSE {id_col} - 1 END AS ptr
  FROM {table})"""]
    prev = "r0"
    for i in range(1, rounds + 1):
        parts.append(f"""r{i} AS (
  SELECT a.node, b.ptr
  FROM {prev} a JOIN {prev} b ON b.node = a.ptr)""")
        prev = f"r{i}"
    return (",\n".join(parts)
            + f"\nSELECT node, ptr AS final_node FROM {prev}")


# ------------------------------------------------------- BFS frontier depth
UNREACHED = np.int64(1 << 40)


def bfs_depth(ids: ray.data.Dataset, n_nodes: int, seeds: tuple[int, ...],
              rounds: int = 4, id_col: str = "doc_id",
              num_buckets: int | None = None) -> ray.data.Dataset:
    """Breadth-first depth from a seed set over the deterministic link
    graph, ``rounds`` frontier expansions (nodes deeper than ``rounds``
    stay UNREACHED and are dropped from the output) — the level-
    structure primitive next to PageRank (value propagation), label
    propagation (components) and pointer doubling (chains).

    Each round is ONE map_batches (the previous round's frontier rows
    flat-expand along their generated out-edges — the edge table is never
    materialized) + ONE bucketed MIN reduce over (node, candidate depth).
    Depth table rows are (node, dist); non-frontier rows pass through as
    self-rows so the reduce is total.

    Output: ``node, dist`` for reached nodes only."""
    seed_arr = np.array(sorted(seeds), np.int64)

    def init(b: pa.Table) -> pa.Table:
        node = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dist = np.where(np.isin(node, seed_arr), np.int64(0), UNREACHED)
        return pa.table({"node": pa.array(node), "dist": pa.array(dist)})

    dist = ids.map_batches(init, batch_format="pyarrow")
    for r in range(1, rounds + 1):
        frontier_d = np.int64(r - 1)

        def expand(b: pa.Table, fd=frontier_d) -> pa.Table:
            node = b["node"].to_numpy(zero_copy_only=False)
            d = b["dist"].to_numpy(zero_copy_only=False)
            on_f = d == fd
            src = node[on_f]
            src_rep, dst, _ = _out_edges(src, n_nodes)
            return pa.table({
                "node": pa.array(np.r_[node, dst]),
                "dist": pa.array(np.r_[d, np.full(len(dst), fd + 1)]),
            })

        dist = bucketed_group_agg(
            dist.map_batches(expand, batch_format="pyarrow"),
            keys=["node"], aggs=[("dist", "min", "dist")],
            num_buckets=num_buckets)

    def finish(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b["dist"], int(UNREACHED)))
        return pa.table({"node": b["node"].cast(pa.int64()),
                         "dist": b["dist"].cast(pa.int64())})

    return dist.map_batches(finish, batch_format="pyarrow")


def bfs_depth_sql(seeds: tuple[int, ...], rounds: int = 4,
                  table: str = "documents", id_col: str = "doc_id") -> str:
    """Unrolled-round twin: d_r = min(d_{r-1}, 1 + min over in-edges from
    the r-1 frontier)."""
    seed_list = ", ".join(str(s) for s in sorted(seeds))
    parts = [f"WITH {edges_cte(table, id_col)}",
             f"""d0 AS (
  SELECT {id_col} AS node,
         CASE WHEN {id_col} IN ({seed_list}) THEN 0 END AS dist
  FROM {table})"""]
    prev = "d0"
    for r in range(1, rounds + 1):
        parts.append(f"""f{r} AS (
  SELECT e.dst AS node, {r} AS nd
  FROM edges e JOIN {prev} p ON p.node = e.src AND p.dist = {r - 1}
  GROUP BY e.dst)""")
        parts.append(f"""d{r} AS (
  SELECT p.node,
         LEAST(COALESCE(p.dist, {int(UNREACHED)}),
               COALESCE(f{r}.nd, {int(UNREACHED)})) AS dist_raw,
         CASE WHEN LEAST(COALESCE(p.dist, {int(UNREACHED)}),
                         COALESCE(f{r}.nd, {int(UNREACHED)}))
                   < {int(UNREACHED)}
              THEN LEAST(COALESCE(p.dist, {int(UNREACHED)}),
                         COALESCE(f{r}.nd, {int(UNREACHED)})) END AS dist
  FROM {prev} p LEFT JOIN f{r} ON f{r}.node = p.node)""")
        prev = f"d{r}"
    return (",\n".join(parts)
            + f"\nSELECT node, CAST(dist AS BIGINT) AS dist FROM {prev}"
            + "\nWHERE dist IS NOT NULL")


# ------------------------------------------------- connected components
COMP_MOD = 13  # confine component edges to residue classes (intra-"site"
               # links): the raw modulo graph is one giant component, which
               # makes a components op vacuous — real web graphs fragment by
               # host, modeled here by snapping dst into src's class mod 13


def _component_edges(node: np.ndarray, n_nodes: int
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic intra-class edges: generator targets snapped to the
    source's residue class mod COMP_MOD (wrapped back below n)."""
    src, dst, _ = _out_edges(node, n_nodes)
    cand = dst - dst % COMP_MOD + src % COMP_MOD
    dst2 = np.where(cand < n_nodes, cand, cand - COMP_MOD)
    return src, dst2


def link_components(ids: ray.data.Dataset, n_nodes: int,
                    id_col: str = "doc_id",
                    general: bool = False) -> ray.data.Dataset:
    """Connected components of the UNDIRECTED intra-class link graph:
    (id, label) rows with label = the component's min node id.

    Default path exploits the PARTITIONING ASSUMPTION that edges never
    cross residue classes (`_component_edges` snaps targets into the
    source's class — the stand-in for "web links stay within a host"):
    the class key is component-closed, so components run embarrassingly
    parallel — ONE exchange keyed on ``id % COMP_MOD``, then a
    path-compressed union-find per class group. No iteration, no
    per-round fixed wall (the iterative propagation cost 58 s at sf0.1;
    this shape costs one exchange).

    ``general=True`` drops the assumption and runs the iterative
    distributed min-label propagation from the dedup path
    (`dedup.label_propagation_components`) — rounds ∝ component diameter,
    for graphs with no component-closed key."""
    def expand(b: pa.Table) -> pa.Table:
        node = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        src, dst = _component_edges(node, n_nodes)
        return pa.table({"id_a": pa.array(src), "id_b": pa.array(dst)})

    pairs = ids.map_batches(expand, batch_format="pyarrow")
    if general:
        from .dedup import label_propagation_components
        return label_propagation_components(pairs)

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_cls", pc.cast(pc.subtract(
                b["id_a"], pc.multiply(pc.divide(b["id_a"], COMP_MOD),
                                       COMP_MOD)), pa.int64()))

    def cc_group(g: pa.Table) -> pa.Table:
        a = g["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b_ = g["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(np.r_[a, b_])
        idx = {int(v): i for i, v in enumerate(uniq)}
        parent = np.arange(len(uniq))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(a, b_):
            rx, ry = find(idx[int(x)]), find(idx[int(y)])
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        # min node id per root: uniq is sorted, so the root's own id IS the
        # min of its set under min-root union
        label = uniq[np.fromiter((find(i) for i in range(len(uniq))),
                                 np.int64, len(uniq))]
        return pa.table({"id": pa.array(uniq), "label": pa.array(label)})

    return (pairs.map_batches(tag, batch_format="pyarrow")
                 .groupby("_cls").map_groups(cc_group,
                                             batch_format="pyarrow"))


def link_components_sql(table: str = "documents",
                        id_col: str = "doc_id") -> str:
    """Fixpoint twin: recursive CTE enumerating each node's reachable set
    over the undirected edges, then MIN per node — exact CC, the same
    answer label propagation converges to."""
    return f"""
WITH RECURSIVE
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {table}),
js AS (SELECT UNNEST([CAST(0 AS BIGINT), 1, 2, 3]) AS j),
raw AS (
  SELECT d.{id_col} AS src,
         (d.{id_col} * {EDGE_MUL} + js.j * {EDGE_JMUL} + 1) % nn.n AS dst,
         nn.n AS n
  FROM {table} d CROSS JOIN nn CROSS JOIN js
  WHERE js.j <= d.{id_col} % 4
),
edges AS (
  SELECT src,
         CASE WHEN dst - dst % {COMP_MOD} + src % {COMP_MOD} < n
              THEN dst - dst % {COMP_MOD} + src % {COMP_MOD}
              ELSE dst - dst % {COMP_MOD} + src % {COMP_MOD} - {COMP_MOD}
         END AS dst
  FROM raw
),
ue AS (
  SELECT src AS a, dst AS b FROM edges
  UNION ALL
  SELECT dst AS a, src AS b FROM edges
),
r AS (
  SELECT {id_col} AS id, {id_col} AS reach FROM {table}
  UNION
  SELECT r.id, ue.b AS reach FROM r JOIN ue ON ue.a = r.reach
)
SELECT id, CAST(MIN(reach) AS BIGINT) AS label FROM r GROUP BY id"""


def link_reciprocity(doc_ids: ray.data.Dataset, n_nodes: int,
                     num_buckets: int = 32) -> ray.data.Dataset:
    """Edge reciprocity of the link graph — the mutual-link rate
    (blog-roll / link-exchange detector): distinct non-loop directed
    edges, mutual (a⇄b) pairs, and reciprocity = 2·pairs/edges.

    Shape: ONE hash-bucket exchange on the UNORDERED pair key (both
    directions of a pair land in the same bucket by construction), a
    vectorized per-bucket kernel (sort packed keys, a pair is mutual iff
    its key owns both directions), 2-int partials coalesced into the
    single summary row. The one division is the final IEEE op.
    """
    from .agg import hash_bucket_tag

    def expand(b: pa.Table) -> pa.Table:
        node = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src, dst, _ = _out_edges(node, n_nodes)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        lo, hi = np.minimum(src, dst), np.maximum(src, dst)
        pair = lo * np.int64(n_nodes) + hi
        fwd = (src < dst).astype(np.int64)  # direction bit
        t = pa.table({"pair": pa.array(pair), "fwd": pa.array(fwd)})
        return hash_bucket_tag(t, ["pair"], num_buckets)

    def kernel(g: pa.Table) -> pa.Table:
        pair = g["pair"].to_numpy(zero_copy_only=False)
        fwd = g["fwd"].to_numpy(zero_copy_only=False)
        # distinct directed edges: unique (pair, dir)
        key = pair * 2 + fwd
        uk = np.unique(key)
        upair = uk // 2
        n_edges = len(uk)
        # mutual iff a pair value appears with both direction bits
        up, cnt = np.unique(upair, return_counts=True)
        n_recip = int((cnt == 2).sum())
        return pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                         "n_recip": pa.array([n_recip], pa.int64())})

    parts = (doc_ids.map_batches(expand, batch_format="pyarrow")
             .groupby("_bucket").map_groups(kernel, batch_format="pyarrow"))

    def finish(b: pa.Table) -> pa.Table:
        e = int(pa.compute.sum(b["n_edges"]).as_py() or 0)
        r = int(pa.compute.sum(b["n_recip"]).as_py() or 0)
        rec = float(2 * r) / float(e) if e else 0.0
        return pa.table({"n_edges": pa.array([e], pa.int64()),
                         "n_recip_pairs": pa.array([r], pa.int64()),
                         "reciprocity": pa.array([rec], pa.float64())})

    return parts.repartition(1).map_batches(finish, batch_format="pyarrow",
                                            batch_size=None)


def link_reciprocity_sql(table: str = "documents",
                         id_col: str = "doc_id") -> str:
    return f"""
WITH {edges_cte(table, id_col)},
e2 AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
r AS (
  SELECT a.src AS na, a.dst AS nb
  FROM e2 a JOIN e2 b ON a.src = b.dst AND a.dst = b.src
  WHERE a.src < a.dst
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e2) AS n_edges,
       CAST(COUNT(*) AS BIGINT) AS n_recip_pairs,
       CAST(2 * COUNT(*) AS DOUBLE)
         / CAST((SELECT COUNT(*) FROM e2) AS DOUBLE) AS reciprocity
FROM r
"""


# ------------------------------------------------- HITS hubs & authorities

def hits_scores(doc_ids: ray.data.Dataset, n_nodes: int,
                iterations: int = 2, id_col: str = "doc_id",
                num_buckets: int | None = None) -> ray.data.Dataset:
    """Unnormalized integer HITS over the deterministic link graph:
    per iteration ``auth(v) = Σ_{u→v} hub(u)`` then
    ``hub(u) = Σ_{u→v} auth(v)`` — the REVERSE-propagation complement of
    PageRank (which only pushes along out-edges).

    Scale shape: two exchanges per iteration. Exchange A is keyed on the
    edge TARGET v and fuses three roles into one all-to-all — each edge row
    (v, u, hub(u)) is simultaneously the auth contribution AND the
    reverse-routing request, and a zero self-row keeps in-linkless nodes
    alive; its kernel reduces auth(v) per cell group and immediately
    re-emits per-u hub partials (auth(v) summed over the group's edges of
    u), so the reverse join costs NO extra exchange. Exchange B is one
    bucketed segment-sum keyed on the node that finalizes (node, hub, auth).
    Edges are generated, never materialized (`_out_edges`).

    Exactness: pure int64 sums of non-negative iterates (hub₀ = 1), so any
    reduce order gives identical results and the DuckDB twin
    (`hits_sql`, unrolled-iteration CTEs) is bit-exact. Unnormalized HITS
    grows ≤ (max_in·max_out)^iterations — a loud guard raises long before
    int64 wraps (normalization would need floats and break bit-parity;
    rank ORDER is what HITS is used for and it is normalization-invariant).
    """
    if num_buckets is None:
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else 8
        num_buckets = max(8, cpus)
    from .agg import hash_bucket_tag

    state = doc_ids.map_batches(
        lambda b: pa.table({
            "node": b[id_col].cast(pa.int64()),
            "hub": pa.array(np.ones(len(b), np.int64)),
            "auth": pa.array(np.zeros(len(b), np.int64))}),
        batch_format="pyarrow")

    def expand(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy().astype(np.int64)
        hub = b["hub"].to_numpy().astype(np.int64)
        if len(hub) and int(hub.max()) > (1 << 56):
            raise OverflowError(
                "HITS iterate exceeds 2^56 — reduce iterations "
                "(unnormalized integer HITS grows geometrically)")
        deg = 1 + (node % 4)
        src_rep, dst, _ = _out_edges(node, n_nodes)
        # edge rows (key=v, u, hub(u)) + zero self-rows (key=v, u=-1, 0)
        key = np.concatenate([dst, node])
        u = np.concatenate([src_rep, np.full(len(node), -1, np.int64)])
        c = np.concatenate([np.repeat(hub, deg), np.zeros(len(node), np.int64)])
        return pa.table({"key": pa.array(key, pa.int64()),
                         "u": pa.array(u, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    def kernel_a(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy().astype(np.int64)
        u = g["u"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        order = np.argsort(key, kind="stable")
        k_s, u_s, c_s = key[order], u[order], c[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]])
        seg = np.cumsum(np.r_[True, k_s[1:] != k_s[:-1]]) - 1
        auth = np.add.reduceat(c_s, starts)
        # auth rows (kind 0): one per v in this group — final, since a key
        # lives in exactly one bucket
        out_n = [k_s[starts]]
        out_v = [auth]
        out_k = [np.zeros(len(starts), np.int8)]
        # hub partials (kind 1): auth(v) routed back to each edge's u,
        # pre-combined per u within the group
        em = u_s >= 0
        if em.any():
            uu = u_s[em]
            av = auth[seg[em]]
            uo = np.argsort(uu, kind="stable")
            uu, av = uu[uo], av[uo]
            ust = np.flatnonzero(np.r_[True, uu[1:] != uu[:-1]])
            out_n.append(uu[ust])
            out_v.append(np.add.reduceat(av, ust))
            out_k.append(np.ones(len(ust), np.int8))
        return pa.table({"node": pa.array(np.concatenate(out_n), pa.int64()),
                         "val": pa.array(np.concatenate(out_v), pa.int64()),
                         "kind": pa.array(np.concatenate(out_k), pa.int8())})

    def kernel_b(g: pa.Table) -> pa.Table:
        node = g["node"].to_numpy().astype(np.int64)
        val = g["val"].to_numpy().astype(np.int64)
        kind = g["kind"].to_numpy().astype(np.int64)
        order = np.argsort(node, kind="stable")
        n_s, v_s, k_s = node[order], val[order], kind[order]
        starts = np.flatnonzero(np.r_[True, n_s[1:] != n_s[:-1]])
        auth = np.add.reduceat(np.where(k_s == 0, v_s, 0), starts)
        hub = np.add.reduceat(np.where(k_s == 1, v_s, 0), starts)
        return pa.table({"node": pa.array(n_s[starts], pa.int64()),
                         "hub": pa.array(hub, pa.int64()),
                         "auth": pa.array(auth, pa.int64())})

    for _ in range(iterations):
        rows = state.map_batches(expand, batch_format="pyarrow")
        mixed = (rows.map_batches(
                     lambda b: hash_bucket_tag(b, ["key"], num_buckets),
                     batch_format="pyarrow")
                 .groupby("_bucket").map_groups(kernel_a,
                                                batch_format="pyarrow"))
        state = (mixed.map_batches(
                     lambda b: hash_bucket_tag(b, ["node"], num_buckets),
                     batch_format="pyarrow")
                 .groupby("_bucket").map_groups(kernel_b,
                                                batch_format="pyarrow"))
    return state


def hits_sql(iterations: int = 2, table: str = "documents",
             id_col: str = "doc_id") -> str:
    """Unrolled-iteration DuckDB twin of `hits_scores` (bit-exact int64)."""
    parts = [f"WITH {edges_cte(table, id_col)}",
             f"h0 AS (SELECT {id_col} AS node, CAST(1 AS BIGINT) AS hub "
             f"FROM {table})"]
    prev = "h0"
    for i in range(1, iterations + 1):
        parts.append(f"""a{i} AS (
  SELECT d.{id_col} AS node,
         COALESCE(s.a, CAST(0 AS BIGINT)) AS auth
  FROM {table} d LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(h.hub) AS BIGINT) AS a
    FROM edges e JOIN {prev} h ON h.node = e.src GROUP BY e.dst
  ) s ON s.node = d.{id_col})""")
        parts.append(f"""h{i} AS (
  SELECT e.src AS node, CAST(SUM(a.auth) AS BIGINT) AS hub
  FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY e.src)""")
        prev = f"h{i}"
    return (",\n".join(parts)
            + f"""
SELECT d.{id_col} AS node,
       COALESCE(h.hub, CAST(0 AS BIGINT)) AS hub,
       a.auth
FROM {table} d
LEFT JOIN h{iterations} h ON h.node = d.{id_col}
JOIN a{iterations} a ON a.node = d.{id_col}""")


# ------------------------------------------------------- k-core decomposition

def _degrees_among(active: ray.data.Dataset, n_nodes: int, k: int,
                   num_buckets: int) -> ray.data.Dataset:
    """One peeling round: degrees of each active node counted over the
    simple undirected graph INDUCED by the active set, filtered to deg>=k.

    Two bucket exchanges: (1) candidate directed edges keyed by dst,
    unioned with active-presence markers, semi-filtered per bucket (src is
    active by construction — only dst needs the membership test); (2) the
    surviving edges' endpoint rows keyed by node, deduplicated to distinct
    neighbors (parallel + bidirectional generator edges collapse, matching
    the DISTINCT LEAST/GREATEST twin) and counted.
    """
    B = num_buckets

    def expand(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy().astype(np.int64)
        src_rep, dst, _ = _out_edges(node, n_nodes)
        keep = src_rep != dst  # simple graph: self-loops never count
        src_rep, dst = src_rep[keep], dst[keep]
        return pa.table({"key": pa.array(dst, pa.int64()),
                         "src": pa.array(src_rep, pa.int64()),
                         "is_edge": pa.array(np.ones(len(dst), np.int64)),
                         "_bucket": pa.array(dst % B)})

    def marker(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy().astype(np.int64)
        return pa.table({"key": pa.array(node, pa.int64()),
                         "src": pa.array(np.zeros(len(node), np.int64)),
                         "is_edge": pa.array(np.zeros(len(node), np.int64)),
                         "_bucket": pa.array(node % B)})

    def semi(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = g["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_edge = g["is_edge"].to_numpy(zero_copy_only=False).astype(np.int64)
        present = key[is_edge == 0]
        m = (is_edge == 1) & np.isin(key, present)
        u, w = src[m], key[m]
        node = np.concatenate([u, w])
        nbr = np.concatenate([w, u])
        return pa.table({"node": pa.array(node, pa.int64()),
                         "nbr": pa.array(nbr, pa.int64()),
                         "_b2": pa.array(node % B)})

    def deg_filter(g: pa.Table) -> pa.Table:
        node = g["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        nbr = g["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((nbr, node))
        node, nbr = node[order], nbr[order]
        first = np.empty(len(node), bool)
        first[0] = True
        first[1:] = (node[1:] != node[:-1]) | (nbr[1:] != nbr[:-1])
        node = node[first]  # distinct (node, nbr) -> simple-graph degree
        newn = np.empty(len(node), bool)
        newn[0] = True
        newn[1:] = node[1:] != node[:-1]
        starts = np.flatnonzero(newn)
        deg = np.diff(np.r_[starts, len(node)])
        keep = deg >= k
        return pa.table({"node": pa.array(node[starts][keep], pa.int64()),
                         "deg": pa.array(deg[keep].astype(np.int64))})

    edges = active.map_batches(expand, batch_format="pyarrow")
    marks = active.map_batches(marker, batch_format="pyarrow")
    survivors = (edges.union(marks).groupby("_bucket")
                 .map_groups(semi, batch_format="pyarrow"))
    return survivors.groupby("_b2").map_groups(
        deg_filter, batch_format="pyarrow")


def kcore(ids: ray.data.Dataset, n_nodes: int, k: int = 3,
          id_col: str = "doc_id", max_rounds: int = 12,
          num_buckets: int | None = None) -> ray.data.Dataset:
    """Members of the k-core of the deterministic undirected link graph,
    with each member's degree WITHIN the core.

    Iterative peeling (Batagelj–Zaveršnik shape, distributed): each round
    recomputes induced degrees over the current active set (two bucket
    exchanges, see `_degrees_among`) and drops nodes with deg<k, until a
    fixpoint. Only row COUNTS ever land on the driver; the active set
    stays distributed (materialized per round so Ray's lazy plan doesn't
    recompute the whole history). Raises if the peel hasn't converged in
    ``max_rounds`` rounds — the SQL twin unrolls exactly ``max_rounds``,
    so an unconverged result would silently diverge instead.

    Graph analogue of the reference's iterative mask erosion (repeatedly
    shrinking a study area until stable); re-imagined over the link graph.
    """
    if num_buckets is None:
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else 8
        num_buckets = max(8, cpus)

    def to_nodes(b: pa.Table) -> pa.Table:
        return pa.table({"node": b[id_col].cast(pa.int64())})

    empty = pa.table({"node": pa.array([], pa.int64()),
                      "deg": pa.array([], pa.int64())})
    active = ids.map_batches(to_nodes, batch_format="pyarrow").materialize()
    n_active = active.count()
    if n_active == 0:
        return ray.data.from_arrow(empty)
    for _ in range(max_rounds):
        nxt = _degrees_among(active, n_nodes, k, num_buckets).materialize()
        n_next = nxt.count()
        if n_next == n_active:
            return nxt  # fixpoint: degrees were computed over the core
        if n_next == 0:
            # the core emptied — the empty set is trivially the fixpoint.
            # Ray 2.49: an ALL-empty map_groups result loses its schema,
            # so return the typed empty (node, deg) frame explicitly.
            return ray.data.from_arrow(empty)
        active = nxt.select_columns(["node"]).materialize()
        n_active = n_next
    raise RuntimeError(
        f"k-core peel did not converge within {max_rounds} rounds "
        f"(raise max_rounds AND regenerate the SQL twin together)")


def kcore_sql(k: int = 3, max_rounds: int = 12, table: str = "documents",
              id_col: str = "doc_id") -> str:
    """Unrolled-peel DuckDB twin of `kcore`. Extra rounds past the
    fixpoint are idempotent, so unrolling ``max_rounds`` matches any run
    that converged earlier (and `kcore` raises when it would not).

    Every per-round CTE is MATERIALIZED: each round references the
    previous active set four times (two joins × two UNION branches), and
    DuckDB inlines plain CTEs — un-materialized, the expression tree
    grows 4^rounds and the query never finishes."""
    parts = [f"WITH {edges_cte(table, id_col)}",
             """und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS w
  FROM edges WHERE src <> dst)""",
             f"a0 AS MATERIALIZED (SELECT {id_col} AS node FROM {table})"]
    for i in range(1, max_rounds + 1):
        p = f"a{i - 1}"
        parts.append(f"""d{i} AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT e.u AS node FROM und e
      JOIN {p} p ON p.node = e.u JOIN {p} q ON q.node = e.w
    UNION ALL
    SELECT e.w AS node FROM und e
      JOIN {p} p ON p.node = e.u JOIN {p} q ON q.node = e.w) t
  GROUP BY node)""")
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {k})")
    return (",\n".join(parts)
            + f"\nSELECT node, deg FROM d{max_rounds} WHERE deg >= {k}")


def degree_assortativity(ids: ray.data.Dataset, n_nodes: int,
                         num_buckets: int | None = None) -> ray.data.Dataset:
    """Directed out→in degree assortativity: Pearson correlation, over
    EDGES, between the source's out-degree (x = 1 + src % 4, closed form)
    and the target's in-degree (y). Newman 2002's mixing coefficient for
    the crawl graph — disassortative webs (hubs pointing at leaves) go
    negative.

    Shape: because y is constant per target, every edge moment factors
    through the target —  Σxy = Σ_dst indeg·sx(dst), Σy² = Σ indeg³ — so
    ONE dst-bucketed exchange of (indeg, sx, sxx) partials plus a
    batch-local scalar fold replaces any edge-level join. The correlation
    is a fixed IEEE expression over six exact int64 sums after the final
    reduce (`lineitem_qty_disc_corr` recipe); a loud guard raises before
    any product could leave int64 (DuckDB's BIGINT would error equally)."""
    def expand(b: pa.Table) -> pa.Table:
        node = b[b.column_names[0]].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        src, dst, _ = _out_edges(node, n_nodes)
        x = 1 + src % 4
        return pa.table({"dst": pa.array(dst), "one": pa.array(
            np.ones(len(dst), np.int64)), "x": pa.array(x),
            "xx": pa.array(x * x)})

    edges = ids.map_batches(expand, batch_format="pyarrow",
                            zero_copy_batch=True)
    ind = bucketed_group_agg(edges, ["dst"],
                             [("one", "sum", "indeg"),
                              ("x", "sum", "sx"),
                              ("xx", "sum", "sxx")],
                             num_buckets=num_buckets)

    def fold(b: pa.Table) -> pa.Table:
        indeg = b["indeg"].to_numpy(zero_copy_only=False).astype(np.int64)
        sx = b["sx"].to_numpy(zero_copy_only=False).astype(np.int64)
        sxx = b["sxx"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "m": pa.array([int(indeg.sum())]),
            "sx": pa.array([int(sx.sum())]),
            "sxx": pa.array([int(sxx.sum())]),
            "sy": pa.array([int((indeg * indeg).sum())]),
            "syy": pa.array([int((indeg * indeg * indeg).sum())]),
            "sxy": pa.array([int((indeg * sx).sum())])})

    def finish(b: pa.Table) -> pa.Table:
        m = int(pc.sum(b["m"]).as_py() or 0)
        sx = int(pc.sum(b["sx"]).as_py() or 0)
        sxx = int(pc.sum(b["sxx"]).as_py() or 0)
        sy = int(pc.sum(b["sy"]).as_py() or 0)
        syy = int(pc.sum(b["syy"]).as_py() or 0)
        sxy = int(pc.sum(b["sxy"]).as_py() or 0)
        vx, vy = m * sxx - sx * sx, m * syy - sy * sy
        cov = m * sxy - sx * sy
        for v in (vx, vy, cov, m * sxx, m * syy, m * sxy):
            if not -(2**63) <= v < 2**63:
                raise OverflowError(
                    "degree_assortativity: moment product leaves int64 — "
                    "widen to two-limb sums before this corpus size")
        r = (float(cov) / (np.sqrt(float(vx)) * np.sqrt(float(vy)))
             if vx > 0 and vy > 0 else None)
        return pa.table({"m_edges": pa.array([m]),
                         "assortativity": pa.array([r], pa.float64())})

    return (ind.map_batches(fold, batch_format="pyarrow")
            .repartition(1).map_batches(finish, batch_format="pyarrow"))


def degree_assortativity_sql(table: str = "documents",
                             id_col: str = "doc_id") -> str:
    return f"""
WITH {edges_cte(table, id_col)},
ind AS (
  SELECT dst, CAST(COUNT(*) AS BIGINT) AS indeg,
         CAST(SUM(1 + src % 4) AS BIGINT) AS sx,
         CAST(SUM((1 + src % 4) * (1 + src % 4)) AS BIGINT) AS sxx
  FROM edges GROUP BY dst),
s AS (
  SELECT CAST(SUM(indeg) AS BIGINT) AS m,
         CAST(SUM(sx) AS BIGINT) AS sx,
         CAST(SUM(sxx) AS BIGINT) AS sxx,
         CAST(SUM(indeg * indeg) AS BIGINT) AS sy,
         CAST(SUM(indeg * indeg * indeg) AS BIGINT) AS syy,
         CAST(SUM(indeg * sx) AS BIGINT) AS sxy
  FROM ind)
SELECT m AS m_edges,
       CASE WHEN m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
            THEN CAST(m * sxy - sx * sy AS DOUBLE)
                 / (SQRT(CAST(m * sxx - sx * sx AS DOUBLE))
                    * SQRT(CAST(m * syy - sy * sy AS DOUBLE)))
            END AS assortativity
FROM s
"""


# ------------------------------------------------ personalized PageRank
PPR_SEED_MOD = 37  # seed set S = {node : node % 37 == 0}


def personalized_pagerank(ranks: ray.data.Dataset, n_nodes: int,
                          seed_mod: int = PPR_SEED_MOD,
                          iterations: int = 3,
                          num_buckets: int | None = None) -> ray.data.Dataset:
    """Topic-sensitive / personalized PageRank (Haveliwala 2002): the
    teleport mass restarts ONLY at the seed set instead of uniformly —
    the crawl-prioritization and related-page ranker. Same ONE-exchange-
    per-iteration shape and exact int64 floor arithmetic as `pagerank`;
    only the base term differs (seeds get RANK_SCALE·(1−d)/|S|, others
    zero), so the unrolled twin stays bit-exact."""
    n_seeds = (n_nodes + seed_mod - 1) // seed_mod
    base_seed = (RANK_SCALE * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n_seeds)

    def expand(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy().astype(np.int64)
        rank = b["rank"].to_numpy().astype(np.int64)
        deg = 1 + (node % 4)
        contrib = rank // deg
        src_rep, dst, _ = _out_edges(node, n_nodes)
        out_node = np.concatenate([node, dst])
        out_c = np.concatenate(
            [np.zeros(len(node), np.int64), np.repeat(contrib, deg)])
        return pa.table({"node": pa.array(out_node, pa.int64()),
                         "contrib": pa.array(out_c, pa.int64())})

    def apply_rank(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy().astype(np.int64)
        m = b["contrib"].to_numpy().astype(np.int64)
        base = np.where(node % seed_mod == 0, base_seed, 0)
        rank = base + (DAMP_NUM * m) // DAMP_DEN
        return pa.table({"node": pa.array(node, pa.int64()),
                         "rank": pa.array(rank, pa.int64())})

    for _ in range(iterations):
        ranks = bucketed_int64_group_sum(
            ranks.map_batches(expand, batch_format="pyarrow"),
            "node", ["contrib"], num_buckets=num_buckets
        ).map_batches(apply_rank, batch_format="pyarrow")
    return ranks


def ppr_initial_ranks(doc_ids: ray.data.Dataset, n_nodes: int,
                      seed_mod: int = PPR_SEED_MOD,
                      id_col: str = "doc_id") -> ray.data.Dataset:
    """All restart mass on the seed set: RANK_SCALE // |S| per seed."""
    n_seeds = (n_nodes + seed_mod - 1) // seed_mod
    r0 = RANK_SCALE // n_seeds

    def init(b: pa.Table) -> pa.Table:
        node = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rank = np.where(node % seed_mod == 0, r0, 0)
        return pa.table({"node": pa.array(node, pa.int64()),
                         "rank": pa.array(rank, pa.int64())})

    return doc_ids.map_batches(init, batch_format="pyarrow",
                               zero_copy_batch=True)


def personalized_pagerank_sql(iterations: int = 3,
                              seed_mod: int = PPR_SEED_MOD,
                              table: str = "documents",
                              id_col: str = "doc_id") -> str:
    """Unrolled twin of `personalized_pagerank` (seed-CASE base term)."""
    parts = [f"WITH {edges_cte(table, id_col)}",
             f"""ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {table}
  WHERE {id_col} % {seed_mod} = 0)""",
             f"""r0 AS (
  SELECT d.{id_col} AS node,
         CASE WHEN d.{id_col} % {seed_mod} = 0
              THEN CAST({RANK_SCALE} AS BIGINT) // ns.n ELSE 0 END AS rank
  FROM {table} d CROSS JOIN ns)"""]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(f"""s{i} AS (
  SELECT e.dst AS node,
         CAST(SUM(r.rank // (1 + e.src % 4)) AS BIGINT) AS m
  FROM edges e JOIN {prev} r ON r.node = e.src
  GROUP BY e.dst)""")
        parts.append(f"""r{i} AS (
  SELECT d.{id_col} AS node,
         CASE WHEN d.{id_col} % {seed_mod} = 0
              THEN ({RANK_SCALE} * {DAMP_DEN - DAMP_NUM})
                     // ({DAMP_DEN} * ns.n) ELSE 0 END
           + ({DAMP_NUM} * COALESCE(s{i}.m, 0)) // {DAMP_DEN} AS rank
  FROM {table} d CROSS JOIN ns
  LEFT JOIN s{i} ON s{i}.node = d.{id_col})""")
        prev = f"r{i}"
    return (",\n".join(parts)
            + f"\nSELECT node, rank FROM {prev}")


# ------------------------------------------------ deterministic random walks
WALK_SALT = 0x9A7C_55AA
WALK_STEPS = 4


def walk_visit_counts(doc_ids: ray.data.Dataset, n_nodes: int,
                      steps: int = WALK_STEPS,
                      id_col: str = "doc_id",
                      num_buckets: int | None = None) -> ray.data.Dataset:
    """Random-walk visit frequencies (the node2vec/DeepWalk corpus
    generator, deterministic form): ONE walker starts at every node and
    takes ``steps`` splitmix-chosen out-edges; output is the per-node
    visit count over steps 1..K. Because the link graph's edges are
    CLOSED-FORM (dst = f(src, j)), the whole K-step walk runs inside one
    vectorized map — no per-step lookup, no per-step exchange; the only
    shuffle is the final visit-count reduce (`bucketed_int64_group_sum`).
    pick_i = splitmix64(v_i ^ (SALT + i)) % deg(v_i) — mirrored
    step-for-step by the unrolled CTE twin."""
    from ..core.hashing import splitmix64

    def walk(b: pa.Table) -> pa.Table:
        v = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        visited = []
        for i in range(steps):
            deg = 1 + (v % 4)
            pick = (splitmix64(v.view(np.uint64)
                               ^ np.uint64(WALK_SALT + i))
                    % deg.view(np.uint64)).astype(np.int64)
            v = (v * EDGE_MUL + pick * EDGE_JMUL + 1) % n_nodes
            visited.append(v.copy())
        allv = np.concatenate(visited)
        # per-batch partial counts before the exchange
        uv, cnt = np.unique(allv, return_counts=True)
        return pa.table({"node": pa.array(uv),
                         "visits": pa.array(cnt.astype(np.int64))})

    parts = doc_ids.map_batches(walk, batch_format="pyarrow",
                                zero_copy_batch=True)
    return bucketed_int64_group_sum(parts, "node", ["visits"],
                                    num_buckets=num_buckets)


def walk_visit_counts_sql(steps: int = WALK_STEPS,
                          table: str = "documents",
                          id_col: str = "doc_id") -> str:
    """Unrolled twin: one splitmix CTE chain per step (linear growth),
    HUGEINT 32-bit-limb multiplies via `sqlgen_sample._mulmod64`."""
    from ..core.sqlgen_sample import (_C1, _C2, _GOLDEN, MOD64, _mulmod64,
                                      to_u64)

    parts = [f"""WITH nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {table}),
w0 AS (SELECT {id_col} AS v FROM {table})"""]
    prev = "w0"
    for i in range(1, steps + 1):
        key = f"xor({to_u64('v')}, {WALK_SALT + i - 1})"
        parts.append(f"""m{i}a AS (
  SELECT v, (({key}) + {_GOLDEN}) % {MOD64} AS z0 FROM {prev})""")
        parts.append(f"""m{i}b AS (
  SELECT *, {_mulmod64('xor(z0, z0 >> 30)', _C1)} AS z1 FROM m{i}a)""")
        parts.append(f"""m{i}c AS (
  SELECT *, {_mulmod64('xor(z1, z1 >> 27)', _C2)} AS z2 FROM m{i}b)""")
        parts.append(f"""w{i} AS (
  SELECT (v * {EDGE_MUL}
          + CAST(xor(z2, z2 >> 31) % (1 + v % 4) AS BIGINT) * {EDGE_JMUL}
          + 1) % nn.n AS v
  FROM m{i}c CROSS JOIN nn)""")
        prev = f"w{i}"
    union = "\nUNION ALL\n".join(f"SELECT v FROM w{i}"
                                 for i in range(1, steps + 1))
    return (",\n".join(parts)
            + f""",
visits AS ({union})
SELECT v AS node, CAST(COUNT(*) AS BIGINT) AS visits
FROM visits GROUP BY v""")
