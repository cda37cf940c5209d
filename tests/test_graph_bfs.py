"""BFS depth + event transitions (round-4 session ops)."""

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.stages.linkgraph import _out_edges, bfs_depth


def test_bfs_depth_matches_python_reference():
    n = 120
    ids = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64))}))
    got = bfs_depth(ids, n, seeds=(0, 7), rounds=3).to_pandas()
    # python BFS over the same generator
    dist = {0: 0, 7: 0}
    frontier = [0, 7]
    for r in range(1, 4):
        nxt = []
        for u in frontier:
            _, dsts, _ = _out_edges(np.array([u], np.int64), n)
            for v in dsts.tolist():
                if v not in dist:
                    dist[v] = r
                    nxt.append(v)
        frontier = nxt
    want = dist
    gotd = dict(zip(got.node, got.dist))
    assert gotd == want
    assert (got.dist <= 3).all() and (got.dist >= 0).all()


def test_event_transitions_match_pandas_reference():
    from pyofs_ray.pipelines.relational import event_transitions
    got = event_transitions("/root/testdata/sf0.001").to_pandas()
    import pandas as pd
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    prev = ev.groupby("user_id")["event_type"].shift(1)
    mask = prev.notna()
    want = (pd.DataFrame({"prev_state": prev[mask],
                          "next_state": ev.event_type[mask]})
            .groupby(["prev_state", "next_state"]).size().rename("n")
            .reset_index())
    g = got.sort_values(["prev_state", "next_state"]).reset_index(drop=True)
    w = want.sort_values(["prev_state", "next_state"]).reset_index(drop=True)
    assert g.equals(w.astype({"n": "int64"}))
