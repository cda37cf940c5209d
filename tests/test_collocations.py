"""PMI-ordered bigram collocations (stages/tfidf.bigram_collocations)."""

import numpy as np
import pyarrow as pa
import ray.data

from pyofs_ray.stages.tfidf import COLLOC_SCALE, bigram_collocations


def _ds(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts}))


def test_collocation_score_matches_reference():
    # "new york" always adjacent (high PMI); "the of" frequent but
    # independent (low PMI)
    texts = (["new york is big the end of it"] * 6
             + ["the of the of spam words here now"] * 6)
    ds = _ds(texts).repartition(4)
    # N = total tokens
    n = sum(len(t.split()) for t in texts)
    out = bigram_collocations(ds, n, k=50, min_support=5).to_pandas()
    out = out.set_index(["w1", "w2"])
    ny = out.loc[("new", "york")]
    assert ny.n_xy == 6 and ny.n_x == 6 and ny.n_y == 6
    assert ny.score == (6 * n * COLLOC_SCALE) // (6 * 6)
    # rarer-but-always-together ranks above frequent-independent
    assert ny.score > out.loc[("the", "of")].score
    # every row respects min support
    assert (out.n_xy >= 5).all()


def test_collocation_partitioning_invariance():
    texts = [f"a b c d{i % 7} a b" for i in range(60)]
    n = sum(len(t.split()) for t in texts)
    a = bigram_collocations(_ds(texts), n, k=10).to_pandas()
    b = bigram_collocations(_ds(texts).repartition(16), n,
                            k=10).to_pandas()
    assert a.equals(b)
    assert ("a", "b") in set(zip(a.w1, a.w2))
