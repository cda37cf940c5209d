"""Tests for sliding token-window chunking and token-budget selection."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from pyofs_ray.registry import ORACLES, QUERIES
from pyofs_ray.stages.chunk import doc_token_chunks, token_budget_select

from .conftest import SF_SMOKE, assert_matches_oracle


@pytest.mark.parametrize("name", ["doc_chunks", "doc_budget_select"])
def test_chunk_oracles_smoke(name, duck_smoke):
    assert_matches_oracle(QUERIES[name](SF_SMOKE), duck_smoke, ORACLES[name])


def test_chunk_boundaries_exact():
    # 0 tokens -> no chunk; n<=size -> one truncated chunk; exact multiple;
    # one-past boundary spawns a final short chunk
    texts = ["", "one two three", " ".join(["t"] * 32),
             " ".join(["t"] * 33), " ".join(["t"] * 80)]
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array([0, 1, 2, 3, 4],
                                                          pa.int64()),
                                       "text": pa.array(texts)}))
    out = doc_token_chunks(ds, size=32, overlap=8).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    got = {d: list(zip(g.tok_start, g.tok_end))
           for d, g in out.groupby("doc_id")}
    assert 0 not in got
    assert got[1] == [(0, 3)]
    assert got[2] == [(0, 32)]
    # 33 tokens, stride 24: windows [0,32), [24,33)
    assert got[3] == [(0, 32), (24, 33)]
    # 80 tokens: [0,32), [24,56), [48,80)
    assert got[4] == [(0, 32), (24, 56), (48, 80)]
    # every doc's chunks cover [0, n) with overlap exactly `overlap` except
    # possibly the last
    assert (out.chunk_tokens == out.tok_end - out.tok_start).all()


def test_budget_select_boundary_cut_matches_window_cumsum():
    # synthetic corpus engineered so the budget cut lands INSIDE a score
    # tie group: 6 docs share the top score, budget fits 2.5 of them
    rng = np.random.default_rng(11)
    stop_text = "the and of to in "  # 5 stopwords, 5 tokens -> one score
    docs, ids = [], []
    for i in range(6):
        docs.append(stop_text * 20)  # 100 tokens each, identical score
        ids.append(i)
    for i in range(6, 30):
        docs.append("zz " * int(rng.integers(5, 40)))  # score 0 fillers
        ids.append(i)
    ds_tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                       "text": pa.array(docs)})

    got = token_budget_select(
        lambda: ray.data.from_arrow(ds_tbl).repartition(4),
        budget=250).to_pandas().sort_values("doc_id")
    # 100 tokens per top doc, budget 250 -> exactly docs 0 and 1
    assert list(got.doc_id) == [0, 1]
    assert (got.n_tokens == 100).all()


def test_budget_select_all_fit():
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["the cat", "a dog"])})
    got = token_budget_select(lambda: ray.data.from_arrow(tbl),
                              budget=10**9).to_pandas()
    assert sorted(got.doc_id) == [1, 2]
