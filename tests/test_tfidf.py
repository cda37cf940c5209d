"""Distinctive-term (TF-IDF-style) extraction: oracle parity at smoke
scale plus kernel edges — tf/df/token tie-breaks, docs with fewer than k
tokens, df partials combined across multiple input blocks."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from pyofs_ray.pipelines import corpus
from pyofs_ray.stages.tfidf import distinctive_terms, token_surprisal

from .conftest import SF_SMOKE, assert_matches_oracle


def test_distinctive_terms_oracle(duck_smoke):
    assert_matches_oracle(corpus.doc_distinctive_terms(SF_SMOKE),
                          duck_smoke, corpus.DISTINCTIVE_TERMS_SQL)


def _run(texts, k, blocks=1):
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl)
    if blocks > 1:
        ds = ds.repartition(blocks)
    out = distinctive_terms(ds, k=k, num_buckets=4).to_pandas()
    return out.sort_values(["doc_id", "tf", "df", "token"],
                           ascending=[True, False, True, True]
                           ).reset_index(drop=True)


def test_tie_breaks_and_short_docs():
    # doc 0: 'b b a a c' — tf ties (a,b)=2 broken by df (b rarer than a,
    # which also appears in doc 1), then token; doc 1: single token < k
    out = _run(["b b a a c", "a"], k=2)
    d0 = out[out.doc_id == 0]
    assert list(d0.token) == ["b", "a"]          # tf 2,2 — df 1 < df 2
    assert list(d0.tf) == [2, 2] and list(d0.df) == [1, 2]
    d1 = out[out.doc_id == 1]
    assert list(d1.token) == ["a"] and list(d1.df) == [2]


def test_df_combines_across_blocks():
    # 'z' appears in 4 docs spread over 4 blocks — the per-block df
    # partials (1 each) must sum to 4 through the bucket exchange
    texts = ["z q0", "z q1", "z q2", "z q3"]
    out = _run(texts, k=2, blocks=4)
    z = out[out.token == "z"]
    assert len(z) == 4 and set(z.df) == {4}
    uniq = out[out.token.str.startswith("q")]
    assert set(uniq.df) == {1}
    # rarest-first: each doc ranks its unique qN token before shared z
    first = out.groupby("doc_id").head(1)
    assert all(first.token.str.startswith("q"))


def test_bigram_successors_oracle(duck_smoke):
    assert_matches_oracle(corpus.doc_bigram_successors(SF_SMOKE),
                          duck_smoke, corpus.BIGRAM_SUCCESSORS_SQL)


def test_bigram_adjacency_never_crosses_docs():
    from pyofs_ray.stages.tfidf import bigram_successors
    # doc 0 ends with 'x', doc 1 starts with 'y': (x,y) must NOT appear
    tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(["a b x", "y a b"])})
    out = (bigram_successors(ray.data.from_arrow(tbl).repartition(2), k=5,
                             num_buckets=4).to_pandas())
    pairs = set(zip(out.token, out.next_token))
    assert ("x", "y") not in pairs
    assert ("a", "b") in pairs
    # (a,b) occurs in both docs → count 2
    assert out[(out.token == "a") & (out.next_token == "b")].n.iloc[0] == 2


def test_token_surprisal_oracle(duck_smoke):
    assert_matches_oracle(corpus.doc_token_surprisal(SF_SMOKE),
                          duck_smoke, corpus.TOKEN_SURPRISAL_SQL)


def test_token_surprisal_hand_values():
    # N=4 docs. df: a=4 (w=bitlen(4//4=1)=1), b=2 (w=bitlen(2)=2),
    # u0..u3 unique df=1 (w=bitlen(4)=3).
    texts = ["a a b u0", "a b u1", "a u2", "a u3 u3 u3"]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts)})
    out = (token_surprisal(ray.data.from_arrow(tbl).repartition(3), 4,
                           num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # doc0: 2·1 + 1·2 + 1·3 = 7; doc1: 1+2+3 = 6; doc2: 1+3 = 4;
    # doc3: 1 + 3·3 = 10
    assert list(out.surprisal) == [7, 6, 4, 10]
    assert list(out.total_tf) == [4, 3, 2, 4]
    assert list(out.n_terms) == [3, 3, 2, 2]
