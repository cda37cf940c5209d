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
