from __future__ import annotations

import hashlib

import pyarrow as pa

from pyofs_ray.stages.text import linear_classifier_score


def _w(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 2001 - 1000


def test_classifier_score_matches_hand_computation():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["alpha beta alpha", "  ", "gamma"]})
    out = linear_classifier_score(t)
    assert out["n_tokens"].to_pylist() == [3, 0, 1]
    assert out["score"].to_pylist() == [
        2 * _w("alpha") + _w("beta"), 0, _w("gamma")]
    assert out["keep"].to_pylist() == [
        2 * _w("alpha") + _w("beta") >= 0, True, _w("gamma") >= 0]


def test_classifier_weight_range_and_determinism():
    ws = [_w(f"tok{i}") for i in range(200)]
    assert all(-1000 <= w <= 1000 for w in ws)
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": [" ".join(f"tok{i}" for i in range(200))]})
    a = linear_classifier_score(t)["score"].to_pylist()
    b = linear_classifier_score(t)["score"].to_pylist()
    assert a == b == [sum(ws)]


def test_curate_corpus_semantic_composition(tmp_path, ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from pyofs_ray.pipelines import corpus

    # doc 0/1 share text (dup — keep 0); doc 2 unique; all same lang.
    # classifier gate decided by the real scorer — compute expectations.
    texts = ["alpha beta gamma", "alpha beta gamma", "delta epsilon zeta",
             "eta theta iota", "kappa"]
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string())}),
        tmp_path / "documents.parquet")
    out = corpus.curate_corpus_semantic(str(tmp_path)).to_pandas()
    ids = set(out["doc_id"])
    # expected survivors: classifier-kept docs minus non-min dups
    def keep(t):
        toks = [w for w in t.split() if w]
        return sum(_w(w) for w in toks) >= 0
    expect = {i for i, t in enumerate(texts) if keep(t)}
    if keep(texts[0]):
        assert 0 in ids or 0 not in expect
    assert 1 not in ids                      # dup of doc 0, never kept
    assert ids <= expect
    # every emitted row carries >= 1 copy and a valid lang
    assert (out["n_copies"] >= 1).all()
    assert set(out["lang"]) <= {"en"}
