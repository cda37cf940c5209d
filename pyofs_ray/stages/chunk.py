"""Sliding-window document chunking and global token-budget selection —
the two ops a RAG / LLM-training ingest needs between curation and
tokenizer packing.

Reference analogue: PyOFS slices continuous fields into fixed tile/window
grids with deterministic boundary arithmetic (SURVEY.md K1/K2 overview
windows; `/root/reference/main/PyOFS/model/wcofs.py` grid slicing); here the
"grid" is token index space over each document.

Scale shape
-----------
* ``doc_token_chunks`` is a pure per-batch flat-expand (np.repeat /
  cumsum index arithmetic — no Python loop, no shuffle at all): a 100 TB
  corpus chunks embarrassingly parallel.
* ``token_budget_select`` ("take the best documents until the global token
  budget is spent") finds the greedy prefix of the (score DESC, id ASC)
  order WITHOUT a global sort: the integer score space is bounded
  (≤ SCORE_SCALE+1 values), so per-score token sums are a bounded-key
  aggregate; the driver cumsums ~10^6 rows max to locate the boundary
  score, and only the docs AT the boundary score (tie-bounded) are pulled
  to resolve the exact cutoff id. Two scans + one bounded exchange — never
  a full-corpus sort.

Exactness
---------
Scores are exact integers (``n_stopwords * SCORE_SCALE // (n_tokens+1)``
— same counts as `stages.text.quality_scores`), chunk boundaries are pure
int arithmetic, and the DuckDB twins replay the same expressions
(window-cumsum for the budget; correlated ``UNNEST(range(nc))`` for the
chunk expansion).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .text import STOPWORD_RE, TOKEN_RE

SCORE_SCALE = 1_000_000


# ------------------------------------------------------------- chunking
def doc_token_chunks(ds: ray.data.Dataset, size: int = 32,
                     overlap: int = 8, id_col: str = "doc_id",
                     text_col: str = "text") -> ray.data.Dataset:
    """Sliding token-window chunks per document.

    Windows of ``size`` tokens advancing by ``stride = size - overlap``;
    the last window is truncated at the document end; empty documents
    (0 tokens) emit no chunks. Output: (id, chunk_idx, tok_start,
    tok_end, chunk_tokens) — token INDICES, so downstream slicing stays
    tokenizer-agnostic.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    stride = size - overlap

    def expand(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(b[text_col], TOKEN_RE) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        nchunks = np.where(n == 0, 0,
                           np.where(n <= size, 1,
                                    1 + (n - size + stride - 1) // stride))
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rep_id = np.repeat(ids, nchunks)
        starts = np.cumsum(nchunks) - nchunks
        idx = np.arange(len(rep_id), dtype=np.int64) - np.repeat(starts, nchunks)
        tok_start = idx * stride
        n_rep = np.repeat(n, nchunks)
        tok_end = np.minimum(tok_start + size, n_rep)
        return pa.table({id_col: pa.array(rep_id),
                         "chunk_idx": pa.array(idx),
                         "tok_start": pa.array(tok_start),
                         "tok_end": pa.array(tok_end),
                         "chunk_tokens": pa.array(tok_end - tok_start)})

    return ds.map_batches(expand, batch_format="pyarrow",
                          zero_copy_batch=True)


def doc_token_chunks_sql(size: int = 32, overlap: int = 8,
                         table: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    stride = size - overlap
    tok = TOKEN_RE.replace("'", "''")
    return f"""
WITH d AS (
  SELECT {id_col},
         CAST(len(regexp_extract_all({text_col}, '{tok}')) AS BIGINT) AS n
  FROM {table}
), c AS (
  SELECT {id_col}, n,
         CASE WHEN n = 0 THEN 0
              WHEN n <= {size} THEN 1
              ELSE 1 + (n - {size} + {stride} - 1) // {stride} END AS nc
  FROM d
), e AS (
  SELECT {id_col}, n, UNNEST(range(nc)) AS g FROM c
)
SELECT {id_col}, CAST(g AS BIGINT) AS chunk_idx,
       CAST(g * {stride} AS BIGINT) AS tok_start,
       CAST(LEAST(g * {stride} + {size}, n) AS BIGINT) AS tok_end,
       CAST(LEAST(g * {stride} + {size}, n) - g * {stride} AS BIGINT)
         AS chunk_tokens
FROM e"""


# ----------------------------------------------------- budget selection
def _score_tokens(b: pa.Table, id_col: str, text_col: str) -> pa.Table:
    n_tok = pc.cast(pc.count_substring_regex(b[text_col], TOKEN_RE),
                    pa.int64())
    n_stop = pc.cast(pc.count_substring_regex(b[text_col], STOPWORD_RE),
                     pa.int64())
    score = pc.divide(pc.multiply(n_stop, pa.scalar(SCORE_SCALE, pa.int64())),
                      pc.add(n_tok, pa.scalar(1, pa.int64())))
    return pa.table({id_col: b[id_col], "score_q": score, "n_tokens": n_tok})


def token_budget_select(ds_fn, budget: int, id_col: str = "doc_id",
                        text_col: str = "text") -> ray.data.Dataset:
    """Greedy prefix of the (score_q DESC, id ASC) order whose cumulative
    ``n_tokens`` stays ≤ ``budget`` — SQL: ``SUM(n_tokens) OVER (ORDER BY
    score_q DESC, id)`` ≤ budget.

    ``ds_fn``: zero-arg callable returning a fresh Dataset over the corpus.
    The regex scoring runs ONCE — the pinned (id, score, tokens)
    projection feeds (1) the per-score (tokens, docs) reduce over the
    ≤ SCORE_SCALE+1 bounded score space, cumsummed ON THE DRIVER to find
    the boundary score, (2) the tie-bounded boundary-doc pull that fixes
    the exact cutoff id, and (3) the final broadcast-threshold filter —
    no global sort ever runs.
    """
    from .agg import partial_group_sums

    # ONE regex pass: pin the 3-int-column projection (≈24 B/doc — at
    # 10^12 docs spill it through the corpus.curate_docs parquet-checkpoint
    # pattern instead of the object store) and reuse it for the per-score
    # reduce, the boundary pull and the final filter
    proj = ds_fn().map_batches(
        lambda b: _score_tokens(b, id_col, text_col),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    # per-block partials, merged ON THE DRIVER (the r4 sketch rule: a
    # small-key finish must not pay a Ray exchange — measured 1.6 s of
    # fixed wall for 457 distinct scores). The pull is bounded by
    # blocks × |score space|; at extreme block counts insert one
    # repartition-combine level before the pull.
    partials = proj.map_batches(
        lambda b: partial_group_sums(b, ("score_q",), ("n_tokens",),
                                     count_name="n_docs"),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    ps = (partials.groupby("score_q", as_index=False)
          .agg(tok=("n_tokens_sum", "sum"), n_docs=("n_docs", "sum"))
          .sort_values("score_q", ascending=False))
    cum = ps.tok.cumsum()
    full = cum <= budget
    n_full = int(full.sum())
    if n_full == len(ps):  # everything fits
        bscore, cutoff_id, remaining = None, None, None
    else:
        bscore = int(ps.score_q.iloc[n_full])
        spent = int(cum.iloc[n_full - 1]) if n_full else 0
        remaining = budget - spent

    ds2 = proj
    if bscore is None:
        return ds2

    # resolve the boundary: docs AT bscore, id-ascending greedy under the
    # remaining budget (tie-bounded pull — the per-score doc count is known)
    bthr = pa.scalar(bscore, pa.int64())
    bnd = ds2.map_batches(
        lambda b: b.filter(pc.equal(b["score_q"], bthr)),
        batch_format="pyarrow").to_pandas() \
        .sort_values(id_col).reset_index(drop=True)
    c = bnd.n_tokens.cumsum()
    take = bnd[c <= remaining]
    cutoff_id = int(take[id_col].max()) if len(take) else None

    thr = pa.scalar(bscore, pa.int64())

    def keep(b: pa.Table) -> pa.Table:
        mask = pc.greater(b["score_q"], thr)
        if cutoff_id is not None:
            at = pc.and_(pc.equal(b["score_q"], thr),
                         pc.less_equal(b[id_col],
                                       pa.scalar(cutoff_id, pa.int64())))
            mask = pc.or_(mask, at)
        return b.filter(mask)

    return ds2.map_batches(keep, batch_format="pyarrow",
                           zero_copy_batch=True)


def token_budget_select_sql(budget: int, table: str = "documents",
                            id_col: str = "doc_id",
                            text_col: str = "text") -> str:
    tok = TOKEN_RE.replace("'", "''")
    stop = STOPWORD_RE.replace("'", "''")
    return f"""
WITH s AS (
  SELECT {id_col},
         CAST(len(regexp_extract_all({text_col}, '{tok}')) AS BIGINT)
           AS n_tokens,
         CAST(len(regexp_extract_all({text_col}, '{stop}')) AS BIGINT)
           AS n_stop
  FROM {table}
), q AS (
  SELECT {id_col}, n_tokens,
         n_stop * {SCORE_SCALE} // (n_tokens + 1) AS score_q
  FROM s
), w AS (
  SELECT {id_col}, score_q, n_tokens,
         SUM(n_tokens) OVER (ORDER BY score_q DESC, {id_col}
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM q
)
SELECT {id_col}, CAST(score_q AS BIGINT) AS score_q, n_tokens
FROM w WHERE cum <= {budget}"""
