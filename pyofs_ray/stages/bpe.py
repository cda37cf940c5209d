"""BPE tokenizer-training prep: the first merge-selection pass.

Byte-pair encoding training (Sennrich et al. 2016) iteratively merges the
most frequent adjacent symbol pair. This stage computes that selection
exactly over the corpus: counts of every adjacent code-point pair that
does not cross a whitespace (word) boundary, ranked (count DESC, pair
ASC) with a deterministic top-k — the data a tokenizer trainer consumes
to pick merge #1.

Reference capability analogue: the reference's per-file token/variable
scans are whole-unit; this is the sub-token refinement the LLM-pipeline
brief asks for (token counting family, `stages/text.py`).

Shape: the alphabet is tiny next to the corpus, so per-batch ``np.unique``
partials collapse each batch to ≤|alphabet|² rows and the finish is a
single coalesced combine (``repartition(1)``) — the ≤2k-key finish shape
(BASELINE.md round-4 lesson), zero wide exchanges. Pair identity is the
exact int64 ``cp1·2²¹ + cp2`` (code points < 2²¹ by Unicode), mirrored
literally in the DuckDB twin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

PAIR_SHIFT = 21  # code points < 0x110000 < 2^21 — injective pair key
SPACE = 32


def _pair_partial(b: pa.Table) -> pa.Table:
    texts = pc.fill_null(b["text"], "").to_pylist()
    blob = "".join(texts)
    cp = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.int64)
    lens = pc.utf8_length(pc.fill_null(b["text"], "")).to_numpy(
        zero_copy_only=False).astype(np.int64)
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})
    if len(cp) < 2:
        return empty
    offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])
    doc_ix = np.repeat(np.arange(len(texts)), lens)
    a, c = cp[:-1], cp[1:]
    same_doc = doc_ix[:-1] == doc_ix[1:]
    valid = same_doc & (a != SPACE) & (c != SPACE)
    if not valid.any():
        return empty
    k = (a[valid] << PAIR_SHIFT) | c[valid]
    uk, cnt = np.unique(k, return_counts=True)
    return pa.table({"k": pa.array(uk),
                     "cnt": pa.array(cnt.astype(np.int64))})


def bpe_merge_candidates(ds: ray.data.Dataset, k: int = 20
                         ) -> ray.data.Dataset:
    """Top-``k`` BPE merge candidates: ``(rank, pair, pair_count)``,
    rank 1 = the pair BPE training would merge first."""
    def finish(b: pa.Table) -> pa.Table:
        key = b["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        tot = np.bincount(inv, weights=cnt, minlength=len(uk)) \
            .astype(np.int64)
        order = np.lexsort((uk, -tot))[:k]
        c1 = (uk[order] >> PAIR_SHIFT).astype(np.int64)
        c2 = (uk[order] & ((1 << PAIR_SHIFT) - 1)).astype(np.int64)
        pairs = [chr(int(x)) + chr(int(y)) for x, y in zip(c1, c2)]
        return pa.table({
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "pair": pa.array(pairs, pa.string()),
            "pair_count": pa.array(tot[order])})

    return (ds.map_batches(_pair_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .repartition(1)
            .map_batches(finish, batch_format="pyarrow"))


def bpe_merge_candidates_sql(k: int = 20, table: str = "documents"
                             ) -> str:
    return f"""
WITH ch AS (
  SELECT CAST(unicode(substr(text, CAST(i AS INT), 1)) AS BIGINT) AS c1,
         CAST(unicode(substr(text, CAST(i + 1 AS INT), 1)) AS BIGINT) AS c2
  FROM (SELECT text, UNNEST(generate_series(1, length(text) - 1)) AS i
        FROM {table})
),
p AS (
  SELECT c1 * {1 << PAIR_SHIFT} + c2 AS k, MIN(c1) AS c1, MIN(c2) AS c2,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ch WHERE c1 <> {SPACE} AND c2 <> {SPACE}
  GROUP BY c1 * {1 << PAIR_SHIFT} + c2
),
r AS (
  SELECT c1, c2, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, k ASC) AS rank
  FROM p
)
SELECT CAST(rank AS BIGINT) AS rank, chr(CAST(c1 AS INT)) ||
       chr(CAST(c2 AS INT)) AS pair, cnt AS pair_count
FROM r WHERE rank <= {k}
"""


MERGE_SYM = 0xE000  # private-use code point standing in for merge #1


def bpe_apply_merge(ds: ray.data.Dataset, pair: str,
                    sym: int = MERGE_SYM) -> ray.data.Dataset:
    """Apply one BPE merge: replace every non-overlapping occurrence of
    ``pair`` (left-to-right, the greedy BPE rule — both Arrow
    ``replace_substring`` and DuckDB ``replace`` implement exactly this)
    with the single private-use symbol ``sym``."""
    rep = chr(sym)

    def apply(b: pa.Table) -> pa.Table:
        t = pc.replace_substring(pc.fill_null(b["text"], ""),
                                 pattern=pair, replacement=rep)
        return pa.table({"text": t})

    return ds.map_batches(apply, batch_format="pyarrow",
                          zero_copy_batch=True)


def bpe_second_merge(ds_factory, k: int = 20) -> ray.data.Dataset:
    """BPE training iteration 2: select merge #1 (a 1-row driver pull —
    the merge table IS driver-sized by definition), apply it, recount.
    ``ds_factory()`` returns a fresh text Dataset per pass (two corpus
    scans by semantics — pair statistics change after the merge)."""
    top = bpe_merge_candidates(ds_factory(), k=1).to_pandas()
    if len(top) == 0:
        return bpe_merge_candidates(ds_factory(), k=k)
    return bpe_merge_candidates(
        bpe_apply_merge(ds_factory(), str(top.pair.iloc[0])), k=k)


def bpe_second_merge_sql(k: int = 20, table: str = "documents") -> str:
    """Twin: the same two passes, merge #1 chosen by the same
    (count DESC, key ASC) rule, applied with REPLACE (same
    non-overlapping left-to-right semantics)."""
    def pair_rank_cte(src: str, tag: str) -> str:
        return f"""
ch{tag} AS (
  SELECT CAST(unicode(substr(text, CAST(i AS INT), 1)) AS BIGINT) AS c1,
         CAST(unicode(substr(text, CAST(i + 1 AS INT), 1)) AS BIGINT) AS c2
  FROM (SELECT text, UNNEST(generate_series(1, length(text) - 1)) AS i
        FROM {src})
),
p{tag} AS (
  SELECT c1 * {1 << PAIR_SHIFT} + c2 AS k, MIN(c1) AS c1, MIN(c2) AS c2,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ch{tag} WHERE c1 <> {SPACE} AND c2 <> {SPACE}
  GROUP BY c1 * {1 << PAIR_SHIFT} + c2
),
r{tag} AS (
  SELECT c1, c2, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, k ASC) AS rank
  FROM p{tag}
)"""
    return f"""
WITH {pair_rank_cte(table, '1')},
m1 AS (
  SELECT chr(CAST(c1 AS INT)) || chr(CAST(c2 AS INT)) AS mp
  FROM r1 WHERE rank = 1
),
t2 AS (
  SELECT replace(text, (SELECT mp FROM m1), chr({MERGE_SYM})) AS text
  FROM {table}
),
{pair_rank_cte('t2', '2')}
SELECT CAST(rank AS BIGINT) AS rank,
       chr(CAST(c1 AS INT)) || chr(CAST(c2 AS INT)) AS pair,
       cnt AS pair_count
FROM r2 WHERE rank <= {k}
"""
