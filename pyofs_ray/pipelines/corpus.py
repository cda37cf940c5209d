"""Corpus-quality pipelines: text analysis, dedup, similarity search —
the training-data-pipeline operator set over `documents` / `embeddings`."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..stages import ann, dedup
from ..stages.text import fingerprint, lang_id, text_stats
from ..sources.readers import read_parquet_clean


def _docs(sf_dir: str, columns=("doc_id", "text")) -> ray.data.Dataset:
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=list(columns))


def _docs_count(sf_dir: str) -> int:
    """Corpus row count from parquet metadata (no scan) — feeds the
    near-dup family's spill auto-selection (`pairs.candidate_pairs`)."""
    return pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


def doc_text_stats(sf_dir: str) -> ray.data.Dataset:
    return (_docs(sf_dir)
            .map_batches(text_stats, batch_format="pyarrow", zero_copy_batch=True)
            .select_columns(["doc_id", "n_chars", "n_tokens", "n_punct",
                             "n_digits", "token_ratio", "punct_ratio"]))


def doc_lang_id(sf_dir: str) -> ray.data.Dataset:
    return (_docs(sf_dir)
            .map_batches(lang_id, batch_format="pyarrow", zero_copy_batch=True)
            .select_columns(["doc_id", "lang_pred", "lang_score"]))


def doc_fingerprint(sf_dir: str) -> ray.data.Dataset:
    return (_docs(sf_dir)
            .map_batches(fingerprint, batch_format="pyarrow", zero_copy_batch=True)
            .select_columns(["doc_id", "text_hash"]))


def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    return dedup.exact_dedup(_docs(sf_dir))


def minhash_pairs(sf_dir: str) -> pd.DataFrame:
    return dedup.minhash_dedup_pairs(_docs(sf_dir), threshold=0.8,
                                     docs_hint=_docs_count(sf_dir))


def simhash_pairs(sf_dir: str) -> pd.DataFrame:
    return dedup.simhash_dup_pairs(_docs(sf_dir), max_hamming=3,
                                   docs_hint=_docs_count(sf_dir))


def dedup_near_corpus(sf_dir: str) -> ray.data.Dataset:
    """Keep-one near-dup dedup: surviving doc ids (min id per Jaccard-≥0.8
    connected component)."""
    return dedup.minhash_dedup_corpus(_docs(sf_dir), threshold=0.8)


def dedup_near_corpus_distributed(sf_dir: str) -> ray.data.Dataset:
    """Same keep-one dedup through the DISTRIBUTED connected-components
    path (min-label propagation over the pair Dataset) — the extreme-dup-
    rate form, oracle-gated against the identical recursive-CTE twin."""
    return dedup.minhash_dedup_corpus(_docs(sf_dir), threshold=0.8,
                                      distributed_cc=True)


NUM_QUERIES = 8
TOPK = 5


def _query_vectors(sf_dir: str) -> pa.Table:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return t.filter(pa.compute.less(t["vec_id"], NUM_QUERIES)).combine_chunks()


def ann_topk(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return ann.ann_topk_brute(ds, _query_vectors(sf_dir), k=TOPK)


def ann_topk_lsh(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    # corpus_rows from parquet METADATA: ds.count() on the cleaned read
    # would execute a full scan just to size the bands
    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    return ann.ann_topk_lsh(ds, _query_vectors(sf_dir), k=TOPK, corpus_rows=n)


ANN_TOPK_SQL = f"""
SELECT query_id, vec_id, rank FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                      e.vec_id ASC) AS rank
  FROM embeddings e
  CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {NUM_QUERIES}) q
  WHERE e.vec_id != q.vec_id
) WHERE rank <= {TOPK}
"""


def embedding_dup_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs over the embeddings table (the corpus
    has no true dups at τ=0.95 — injected-dup behavior is unit-tested)."""
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    return ann.embedding_dup_pairs(ds, threshold=0.95, docs_hint=n)


def ann_topk_ivf(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    return ann.ann_topk_ivf(ds, _query_vectors(sf_dir), k=TOPK, nprobe=6,
                            corpus_rows=n)
