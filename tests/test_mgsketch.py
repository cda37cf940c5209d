from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.stages.mgsketch import mg_compress, top_tokens_mg


def test_mg_compress_bound_and_size():
    rng = np.random.RandomState(3)
    toks = np.array([f"t{i}" for i in range(500)], dtype=object)
    counts = rng.zipf(1.5, 500).astype(np.int64)
    k = 32
    st, sc, dec = mg_compress(toks, counts, k)
    assert len(st) <= k
    true = dict(zip(toks, counts))
    est = dict(zip(st, sc))
    for t, c in true.items():
        e = est.get(t, 0)
        assert e <= c <= e + dec  # the MG sandwich per compress


def test_top_tokens_mg_sandwich_and_guaranteed_recall(ray_session):
    # Zipf-ish corpus: heavy token 'hot' appears in every doc many times
    rng = np.random.RandomState(5)
    docs = []
    for i in range(400):
        words = ["hot"] * 5 + [f"w{rng.randint(2000)}" for _ in range(30)]
        rng.shuffle(words)
        docs.append(" ".join(words))
    true = Counter(w for d in docs for w in d.split())
    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs)})).repartition(8)
    out = top_tokens_mg(ds, k=64, out_k=10)
    d = int(out["max_err"].iloc[0])
    for _, r in out.iterrows():
        assert r["est_count"] <= true[r["token"]] <= r["est_count"] + d
    # any token with true count > D is guaranteed in the summary;
    # 'hot' (count 2000) dominates every possible D here
    assert "hot" in set(out["token"])
    assert out.iloc[0]["token"] == "hot"


def test_top_tokens_mg_exact_when_vocab_fits(ray_session):
    docs = ["a a b", "b c", "a"]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs)}))
    out = top_tokens_mg(ds, k=100, out_k=3)
    assert out["max_err"].eq(0).all()
    assert list(out["token"]) == ["a", "b", "c"]
    assert list(out["est_count"]) == [3, 2, 1]
