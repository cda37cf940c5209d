"""Sparse lexical retrieval (stages/tfidf.sparse_query_topk)."""

import pyarrow as pa
import ray.data

from pyofs_ray.stages.tfidf import sparse_query_topk


def _ds(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts}))


def test_rare_term_outweighs_common():
    # 'rare' in 1 of 8 docs → bitlen(8//1)=4; 'common' in all 8 → bitlen(1)=1
    texts = ["common rare"] + ["common word"] * 7
    out = sparse_query_topk(_ds(texts), ("common", "rare"), 8, k=3)
    df = out.to_pandas()
    assert list(df["doc_id"])[0] == 0
    assert df["score"][0] == 1 * 1 + 1 * 4
    assert set(df["score"][1:]) == {1}


def test_tf_adds_linearly_and_ties_break_by_id():
    texts = ["q q q", "q q q", "q", "x"]
    out = sparse_query_topk(_ds(texts), ("q",), 4, k=3).to_pandas()
    # df=3 → w = bitlen(4//3)=1; scores 3,3,1; tie 0<1
    assert list(out["doc_id"]) == [0, 1, 2]
    assert list(out["score"]) == [3, 3, 1]


def test_absent_query_token_is_ignored():
    texts = ["a b", "b c"]
    out = sparse_query_topk(_ds(texts), ("b", "zzz-not-there"), 2,
                            k=5).to_pandas()
    assert len(out) == 2
    assert (out["score"] == 1).all()  # df=2 → bitlen(1)=1


def test_embedding_second_moment_oracle(duck_smoke):
    from tests.conftest import SF_SMOKE, assert_matches_oracle
    from pyofs_ray.registry import ORACLES, QUERIES
    assert_matches_oracle(QUERIES["embedding_second_moment"](SF_SMOKE),
                          duck_smoke, ORACLES["embedding_second_moment"])


def test_embedding_second_moment_matches_numpy():
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from pyofs_ray.stages.ann import embedding_second_moment
    from tests.conftest import SF_SMOKE

    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet",
                      columns=["embedding"])
    flat = t["embedding"].combine_chunks().flatten()
    q = pc.cast(pc.round(pc.multiply(pc.cast(flat, pa.float64()), 1e6),
                         round_mode="half_towards_infinity"),
                pa.int64()).to_numpy().reshape(len(t), -1)
    expect = q.T @ q
    got = embedding_second_moment(
        ray.data.from_arrow(t).repartition(3)).to_pandas()
    for r in got.itertuples():
        assert expect[r.i, r.j] == r.qq_sum
    assert len(got) == 64 * 65 // 2
