"""Distinctive-term (TF-IDF-style) extraction: oracle parity at smoke
scale plus kernel edges — tf/df/token tie-breaks, docs with fewer than k
tokens, df partials combined across multiple input blocks."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from pyofs_ray.pipelines import corpus
from pyofs_ray.stages.tfidf import distinctive_terms

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
