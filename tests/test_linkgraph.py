"""Link-graph analytics: integer PageRank + in-degree vs brute numpy."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from pyofs_ray.stages import linkgraph as lg


def _brute_pagerank(n: int, iterations: int) -> np.ndarray:
    node = np.arange(n, dtype=np.int64)
    rank = np.full(n, lg.RANK_SCALE // n, np.int64)
    base = (lg.RANK_SCALE * (lg.DAMP_DEN - lg.DAMP_NUM)) \
        // (lg.DAMP_DEN * n)
    for _ in range(iterations):
        deg = 1 + node % 4
        contrib = rank // deg
        m = np.zeros(n, np.int64)
        for j in range(4):
            mask = j <= node % 4
            dst = (node[mask] * lg.EDGE_MUL + j * lg.EDGE_JMUL + 1) % n
            np.add.at(m, dst, contrib[mask])
        rank = base + (lg.DAMP_NUM * m) // lg.DAMP_DEN
    return rank


def _ids_ds(n: int, blocks: int = 4) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table({"doc_id": np.arange(n, dtype=np.int64)})
    ).repartition(blocks)


@pytest.mark.parametrize("n,iters", [(97, 1), (500, 3)])
def test_pagerank_bitwise_vs_brute(n, iters):
    got = (lg.pagerank(lg.initial_ranks(_ids_ds(n), n), n, iterations=iters)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert np.array_equal(got["node"].to_numpy(), np.arange(n))
    assert np.array_equal(got["rank"].to_numpy(), _brute_pagerank(n, iters))


def test_pagerank_bucket_count_independent():
    n = 211
    a = (lg.pagerank(lg.initial_ranks(_ids_ds(n), n), n, num_buckets=3)
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (lg.pagerank(lg.initial_ranks(_ids_ds(n, blocks=1), n), n,
                     num_buckets=16)
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert a.equals(b)


def test_pagerank_mass_bounded():
    # floor divisions only LOSE mass: total rank stays <= RANK_SCALE
    n = 256
    got = lg.pagerank(lg.initial_ranks(_ids_ds(n), n), n).to_pandas()
    total = int(got["rank"].sum())
    assert total <= lg.RANK_SCALE
    assert total >= int(0.9 * lg.RANK_SCALE)  # and doesn't collapse


def test_indegree_vs_brute():
    n = 300
    node = np.arange(n, dtype=np.int64)
    deg = 1 + node % 4
    src_rep = np.repeat(node, deg)
    starts = np.cumsum(deg) - deg
    j = np.arange(len(src_rep), dtype=np.int64) - np.repeat(starts, deg)
    dst = (src_rep * lg.EDGE_MUL + j * lg.EDGE_JMUL + 1) % n

    got = (lg.indegree_stats(_ids_ds(n), n)
           .to_pandas().sort_values("node").reset_index(drop=True))
    want_nodes = np.unique(dst)
    assert np.array_equal(got["node"].to_numpy(), want_nodes)
    want_deg = np.bincount(dst, minlength=n)[want_nodes]
    assert np.array_equal(got["in_degree"].to_numpy(), want_deg)
    order = np.lexsort((src_rep, dst))
    first_src = src_rep[order][np.searchsorted(dst[order], want_nodes)]
    # min per dst: sorted by (dst, src) -> first src in each dst segment
    assert np.array_equal(got["min_src"].to_numpy(), first_src)


def test_link_queries_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    for name in ("link_pagerank", "link_indegree", "link_triangles"):
        assert_matches_oracle(QUERIES[name](SF_SMOKE), duck_smoke,
                              ORACLES[name])


def test_triangles_vs_brute():
    # brute-force all undirected edges, enumerate triangles with three
    # nested membership tests, compare per-node participation counts
    n = 300
    node = np.arange(n, dtype=np.int64)
    src_rep, dst, _ = lg._out_edges(node, n)
    u = np.minimum(src_rep, dst)
    v = np.maximum(src_rep, dst)
    keep = u != v
    pairs = set(zip(u[keep].tolist(), v[keep].tolist()))
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    want = {}
    for a, nbrs in adj.items():
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                if (ns[i], ns[j]) in pairs:
                    for x in (a, ns[i], ns[j]):
                        want[x] = want.get(x, 0) + 1
    got = (lg.triangle_counts(_ids_ds(n, blocks=5), n)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert dict(zip(got.node, got.triangles)) == want
    assert sum(want.values()) % 3 == 0 and sum(want.values()) > 0


def test_redirect_resolution_terminals():
    from pyofs_ray.stages import linkgraph as lgm
    n = 203  # not a multiple of REDIR_MOD: last chain is partial
    ids = _ids_ds(n)
    ids = ids.map_batches(
        lambda b: b.rename_columns(["doc_id"]), batch_format="pyarrow")
    got = (lgm.resolve_redirects(lgm.redirect_pointers(ids), rounds=2)
           .to_pandas().sort_values("node").reset_index(drop=True))
    node = np.arange(n)
    want = (node // lgm.REDIR_MOD) * lgm.REDIR_MOD
    assert np.array_equal(got["node"].to_numpy(), node)
    assert np.array_equal(got["ptr"].to_numpy(), want)


def test_redirect_one_round_insufficient_two_enough():
    # chain length 3 (k=3 -> 2 -> 1 -> 0): one doubling round reaches only
    # 2 hops; two rounds reach 4 — the log-round contract
    from pyofs_ray.stages import linkgraph as lgm
    ids = ray.data.from_arrow(pa.table({"doc_id": np.arange(4, dtype=np.int64)}))
    one = (lgm.resolve_redirects(lgm.redirect_pointers(ids), rounds=1)
           .to_pandas().sort_values("node"))
    assert one.loc[one.node == 3, "ptr"].item() == 1
    two = (lgm.resolve_redirects(lgm.redirect_pointers(ids), rounds=2)
           .to_pandas().sort_values("node"))
    assert two.loc[two.node == 3, "ptr"].item() == 0


def test_redirect_resolution_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["redirect_resolution"](SF_SMOKE),
                          duck_smoke, ORACLES["redirect_resolution"])


def test_link_components_labels_are_class_consistent():
    # edges never leave a residue class mod COMP_MOD, and every label must
    # be the min id actually REACHABLE (not just the class min by fiat)
    from pyofs_ray.stages import linkgraph as lgm
    n = 60
    ids = ray.data.from_arrow(pa.table({"doc_id": np.arange(n, dtype=np.int64)}))
    got = lgm.link_components(ids, n).to_pandas().sort_values("id")
    assert len(got) == n
    # labels stay within the node's residue class
    assert ((got.label % lgm.COMP_MOD) == (got.id % lgm.COMP_MOD)).all()
    # independent check: union-find over the same generated edges
    import numpy as np_
    parent = np_.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    src, dst = lgm._component_edges(np_.arange(n, dtype=np_.int64), n)
    for a, b in zip(src, dst):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {i: min(j for j in range(n) if find(j) == find(i))
              for i in range(n)}
    assert {int(r.id): int(r.label) for r in got.itertuples()} == expect


def test_link_components_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["link_components"](SF_SMOKE),
                          duck_smoke, ORACLES["link_components"])


def test_link_components_general_path_matches_partitioned():
    from pyofs_ray.stages import linkgraph as lgm
    n = 40
    ids = ray.data.from_arrow(pa.table({"doc_id": np.arange(n, dtype=np.int64)}))
    fast = lgm.link_components(ids, n).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    gen = lgm.link_components(ids, n, general=True).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert fast.equals(gen)


def test_link_reciprocity_oracle(duck_smoke):
    from pyofs_ray.registry import ORACLES, QUERIES

    from .conftest import SF_SMOKE, assert_matches_oracle
    assert_matches_oracle(QUERIES["link_reciprocity"](SF_SMOKE), duck_smoke,
                          ORACLES["link_reciprocity"])


def test_link_reciprocity_matches_setcheck():
    from pyofs_ray.registry import QUERIES

    from .conftest import SF_SMOKE
    import pyarrow.parquet as pq
    from pyofs_ray.stages.linkgraph import _out_edges
    df = QUERIES["link_reciprocity"](SF_SMOKE).to_pandas()
    n = pq.read_metadata(f"{SF_SMOKE}/documents.parquet").num_rows
    src, dst, _ = _out_edges(np.arange(n, dtype=np.int64), n)
    es = {(a, b) for a, b in zip(src.tolist(), dst.tolist()) if a != b}
    recip = sum(1 for (a, b) in es if (b, a) in es and a < b)
    assert int(df.n_edges.iloc[0]) == len(es)
    assert int(df.n_recip_pairs.iloc[0]) == recip


# ------------------------------------------------------------------- HITS

def _brute_hits(n: int, iterations: int) -> tuple[np.ndarray, np.ndarray]:
    node = np.arange(n, dtype=np.int64)
    hub = np.ones(n, np.int64)
    auth = np.zeros(n, np.int64)
    for _ in range(iterations):
        auth = np.zeros(n, np.int64)
        for j in range(4):
            mask = j <= node % 4
            dst = (node[mask] * lg.EDGE_MUL + j * lg.EDGE_JMUL + 1) % n
            np.add.at(auth, dst, hub[mask])
        hub = np.zeros(n, np.int64)
        for j in range(4):
            mask = j <= node % 4
            dst = (node[mask] * lg.EDGE_MUL + j * lg.EDGE_JMUL + 1) % n
            np.add.at(hub, node[mask], auth[dst])
    return hub, auth


@pytest.mark.parametrize("n,iters", [(97, 1), (400, 2), (400, 3)])
def test_hits_bitwise_vs_brute(n, iters):
    got = (lg.hits_scores(_ids_ds(n), n, iterations=iters)
           .to_pandas().sort_values("node").reset_index(drop=True))
    hub, auth = _brute_hits(n, iters)
    assert np.array_equal(got["node"].to_numpy(), np.arange(n))
    assert np.array_equal(got["hub"].to_numpy(), hub)
    assert np.array_equal(got["auth"].to_numpy(), auth)


def test_hits_bucket_count_independent():
    a = (lg.hits_scores(_ids_ds(200), 200, iterations=2, num_buckets=3)
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (lg.hits_scores(_ids_ds(200, blocks=7), 200, iterations=2,
                        num_buckets=17)
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert a.equals(b)


def test_hits_overflow_guard():
    # 40 unnormalized iterations would blow well past 2^56 on any graph
    # with in/out degree > 1 — the guard must raise loudly, not wrap
    # Ray wraps the worker's OverflowError in RayTaskError — match message
    with pytest.raises(Exception, match="HITS iterate exceeds"):
        lg.hits_scores(_ids_ds(100), 100, iterations=40).materialize()


# ------------------------------------------------------------------- k-core

def _brute_kcore(n: int, k: int):
    """Pure-numpy peel over the generator graph (simple, undirected)."""
    node = np.arange(n, dtype=np.int64)
    src, dst, _ = lg._out_edges(node, n)
    m = src != dst
    u = np.minimum(src[m], dst[m])
    w = np.maximum(src[m], dst[m])
    pairs = np.unique(np.stack([u, w], 1), axis=0)
    active = np.ones(n, bool)
    while True:
        em = active[pairs[:, 0]] & active[pairs[:, 1]]
        deg = np.zeros(n, np.int64)
        np.add.at(deg, pairs[em, 0], 1)
        np.add.at(deg, pairs[em, 1], 1)
        keep = active & (deg >= k)
        if (keep == active).all():
            return np.flatnonzero(active), deg[active]
        active = keep


def test_kcore_vs_brute_peel():
    n, k = 200, 4
    nodes, degs = _brute_kcore(n, k)
    assert 0 < len(nodes) < n  # the fixture actually peels something
    got = (lg.kcore(_ids_ds(n), n, k=k, num_buckets=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert np.array_equal(got["node"].to_numpy(), nodes)
    assert np.array_equal(got["deg"].to_numpy(), degs)


def test_kcore_degrees_are_within_core():
    # every member's deg counts CORE neighbors only, hence >= k but also
    # <= its full-graph degree
    n, k = 150, 3
    got = lg.kcore(_ids_ds(n), n, k=k).to_pandas()
    assert (got["deg"] >= k).all()
    full_nodes, full_degs = _brute_kcore(n, 0)  # k=0: nobody peels
    full = dict(zip(full_nodes.tolist(), full_degs.tolist()))
    assert all(d <= full[v] for v, d in zip(got["node"], got["deg"]))


def test_kcore_empty_core_keeps_schema():
    n = 64
    got = lg.kcore(_ids_ds(n), n, k=50)
    assert got.count() == 0
    assert set(got.schema().names) == {"node", "deg"}


def test_link_kcore_oracle_smoke():
    from .conftest import SF_SMOKE, assert_matches_oracle, make_duckdb
    from pyofs_ray.registry import QUERIES, ORACLES
    con = make_duckdb(SF_SMOKE)
    assert_matches_oracle(QUERIES["link_kcore"](SF_SMOKE), con,
                          ORACLES["link_kcore"])


# ------------------------------------------------- degree assortativity

def test_link_assortativity_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["link_assortativity"](SF_SMOKE),
                          duck_smoke, ORACLES["link_assortativity"])


def test_link_assortativity_matches_numpy_pearson():
    """The factored-through-target moment sums equal the naive per-edge
    Pearson correlation computed densely on the same deterministic graph."""
    import numpy as np
    import ray.data
    from pyofs_ray.stages.linkgraph import (_out_edges,
                                            degree_assortativity)

    n = 97
    node = np.arange(n, dtype=np.int64)
    src, dst, _ = _out_edges(node, n)
    x = 1 + src % 4
    indeg = np.bincount(dst, minlength=n)
    y = indeg[dst]
    r_ref = np.corrcoef(x.astype(float), y.astype(float))[0, 1]

    ids = ray.data.from_items([{"doc_id": int(i)} for i in range(n)])
    out = degree_assortativity(ids, n).to_pandas()
    assert out.m_edges[0] == len(src)
    assert abs(out.assortativity[0] - r_ref) < 1e-12


def test_personalized_pagerank_seed_locality(ray_session):
    """Mass restarts only at seeds: (1) total mass stays ≈ RANK_SCALE
    (floor losses only); (2) zeroing the seed set's restart would leave
    pure decayed propagation — seeds must out-rank the uniform variant's
    relative boost; (3) matches a dense numpy reference exactly."""
    import numpy as np
    import ray.data

    from pyofs_ray.stages.linkgraph import (DAMP_DEN, DAMP_NUM, PPR_SEED_MOD,
                                            RANK_SCALE, _out_edges,
                                            personalized_pagerank,
                                            ppr_initial_ranks)

    n = 123
    ids = ray.data.range(n).map_batches(
        lambda b: b.rename_columns(["doc_id"]), batch_format="pyarrow")
    out = (personalized_pagerank(ppr_initial_ranks(ids, n), n, iterations=3)
           .to_pandas().sort_values("node").reset_index(drop=True))

    # dense reference with identical integer floor arithmetic
    n_seeds = (n + PPR_SEED_MOD - 1) // PPR_SEED_MOD
    rank = np.where(np.arange(n) % PPR_SEED_MOD == 0,
                    RANK_SCALE // n_seeds, 0).astype(np.int64)
    base_seed = (RANK_SCALE * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n_seeds)
    for _ in range(3):
        deg = 1 + (np.arange(n) % 4)
        contrib = rank // deg
        m = np.zeros(n, np.int64)
        src_rep, dst, _ = _out_edges(np.arange(n, dtype=np.int64), n)
        np.add.at(m, dst, np.repeat(contrib, deg))
        rank = np.where(np.arange(n) % PPR_SEED_MOD == 0, base_seed, 0) \
            + (DAMP_NUM * m) // DAMP_DEN
    assert (out["rank"].to_numpy() == rank).all()
    assert 0 < out["rank"].sum() <= RANK_SCALE


def test_walk_visit_counts_reference(ray_session):
    import numpy as np
    import ray.data

    from pyofs_ray.core.hashing import splitmix64
    from pyofs_ray.stages.linkgraph import (EDGE_JMUL, EDGE_MUL, WALK_SALT,
                                            walk_visit_counts)

    n = 211
    ids = ray.data.range(n).map_batches(
        lambda b: b.rename_columns(["doc_id"]), batch_format="pyarrow")
    out = (walk_visit_counts(ids, n, steps=4).to_pandas()
           .set_index("node")["visits"])
    # independent scalar walk
    from collections import Counter
    want = Counter()
    for start in range(n):
        v = start
        for i in range(4):
            deg = 1 + v % 4
            h = int(splitmix64(np.array([v], np.uint64)
                               ^ np.uint64(WALK_SALT + i))[0])
            pick = h % deg  # python ints: uint64 % int would go float64
            v = (v * EDGE_MUL + pick * EDGE_JMUL + 1) % n
            want[v] += 1
    assert dict(out) == dict(want)
    assert out.sum() == 4 * n  # every step lands somewhere, exactly once
