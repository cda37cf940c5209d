"""Fuzzy vocabulary matching — FastSS deletion-neighborhood blocking.

`token_typo_pairs` finds every pair of corpus tokens at Levenshtein
distance EXACTLY 1 (the vocabulary-cleaning / typo-clustering primitive)
without an all-pairs edit-distance join: two words are within distance 1
iff one is a 1-deletion of the other, or both share a common 1-deletion
(same length, one substitution). So each token emits its *self* key plus
its ≤L 1-deletion keys; ONE hash-bucket exchange on the key co-locates
every candidate pair, and the only verification ever needed is a
vectorized Hamming==1 check on the equal-length pairs (unequal-length
candidates are distance-1 by construction — see kernel comment).

Because the fixture vocabulary is clean (no organic typos), the query
seeds one deterministic substitution typo per token (position
(7L+3) mod L → '0') in BOTH engines, so the gate measures a non-vacuous
pair set — the same pattern the seeded embedding-dup gate uses.

Exactness: outputs are string pairs, canonicalized lo < hi in binary
(ASCII) order on both sides; the DuckDB twin is a restricted
`levenshtein(a,b) = 1` self-join over the identical seeded vocabulary.

Scale: key-row volume is occurrences × (L+1) but per-batch distinct
compression collapses the Zipf head first; candidate enumeration is
per-key-segment (loud 4096 guard — a hotter key means a degenerate
vocabulary, not a bigger corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .agg import hash_bucket_tag
from .cocite import _pair_rows

MIN_LEN, MAX_LEN = 3, 12
_SEG_CAP = 4096


def _token_matrix(tok: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, MAX_LEN) uint8 byte matrix + int64 lengths (NUL-padded)."""
    s = tok.astype(f"S{MAX_LEN}")
    lens = np.char.str_len(s).astype(np.int64)
    buf = np.zeros((len(s), MAX_LEN), np.uint8)
    buf[:, :s.dtype.itemsize] = s.view(np.uint8).reshape(len(s), -1)
    return buf, lens


def _seed_typos(tok: np.ndarray) -> np.ndarray:
    """Deterministic substitution typo per token: byte at position
    (7L+3) mod L becomes '0' (tokens are alphabetic, so always ≠)."""
    buf, lens = _token_matrix(tok)
    p = (7 * lens + 3) % lens
    buf[np.arange(len(tok)), p] = ord("0")
    return buf.view(f"S{MAX_LEN}").ravel().astype("U")


def _deletion_keys(tok: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All (key, token) rows: self key + every 1-deletion key."""
    buf, lens = _token_matrix(tok)
    keys, owners = [tok], [np.arange(len(tok))]
    for p in range(MAX_LEN):
        m = lens > p
        if not m.any():
            break
        sub = np.delete(buf[m], p, axis=1)
        pad = np.zeros((sub.shape[0], 1), np.uint8)
        d = np.hstack([sub, pad]).view(f"S{MAX_LEN}").ravel().astype("U")
        keys.append(d)
        owners.append(np.nonzero(m)[0])
    return np.concatenate(keys), np.concatenate(owners)


def token_typo_pairs(docs: ray.data.Dataset,
                     text_col: str = "text") -> ray.data.Dataset:
    """documents → (token_a, token_b) pairs at edit distance exactly 1
    over the seeded vocabulary (see module docstring)."""

    def emit_keys(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(b[text_col], r"\s+"))
        ln = pc.utf8_length(toks)
        toks = toks.filter(pc.and_(pc.greater_equal(ln, MIN_LEN),
                                   pc.less_equal(ln, MAX_LEN)))
        uniq = np.unique(toks.to_numpy(zero_copy_only=False))
        if len(uniq) == 0:
            return pa.table({"key": pa.array([], pa.string()),
                             "token": pa.array([], pa.string())})
        vocab = np.unique(np.concatenate([uniq, _seed_typos(uniq)]))
        keys, owners = _deletion_keys(vocab)
        return pa.table({"key": pa.array(keys),
                         "token": pa.array(vocab[owners])})

    keyed = docs.map_batches(emit_keys, batch_format="pyarrow",
                             zero_copy_batch=True)
    tagged = keyed.map_batches(lambda b: hash_bucket_tag(b, ["key"], 32),
                               batch_format="pyarrow")

    def kernel(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy(zero_copy_only=False)
        tok = g["token"].to_numpy(zero_copy_only=False)
        # global (key, token) dedup inside the bucket
        both = np.char.add(np.char.add(key.astype("U"), "\x00"),
                           tok.astype("U"))
        _, idx = np.unique(both, return_index=True)
        key, tok = key[idx], tok[idx]
        ukey, kcode = np.unique(key, return_inverse=True)
        utok, tcode = np.unique(tok, return_inverse=True)
        seg_sizes = np.bincount(kcode)
        if len(seg_sizes) and seg_sizes.max() > _SEG_CAP:
            raise ValueError(
                f"token_typo_pairs: a deletion key owns {seg_sizes.max()} "
                f"tokens (> {_SEG_CAP}) — degenerate vocabulary")
        pairs = _pair_rows(pa.table({"dst": pa.array(kcode.astype(np.int64)),
                                     "src": pa.array(tcode.astype(np.int64))}))
        a = utok[pairs["src_a"].to_numpy(zero_copy_only=False)]
        b_ = utok[pairs["src_b"].to_numpy(zero_copy_only=False)]
        if len(a) == 0:
            return pa.table({"token_a": pa.array([], pa.string()),
                             "token_b": pa.array([], pa.string())})
        ba, la = _token_matrix(a)
        bb, lb = _token_matrix(b_)
        # unequal length ⟹ the shared key was one side's self key ⟹
        # the other is its 1-deletion ⟹ distance exactly 1.
        # equal length ⟹ need Hamming == 1 (shared deletion alone only
        # bounds distance ≤ 2).
        keep = (la != lb) | ((ba != bb).sum(axis=1) == 1)
        a, b_ = a[keep], b_[keep]
        lo = np.minimum(a, b_)
        hi = np.maximum(a, b_)
        return pa.table({"token_a": pa.array(lo.astype(object), pa.string()),
                         "token_b": pa.array(hi.astype(object), pa.string())})

    pairs = tagged.groupby("_bucket").map_groups(kernel,
                                                 batch_format="pyarrow")

    def dedup(b: pa.Table) -> pa.Table:
        g = b.group_by(["token_a", "token_b"]).aggregate([])
        return g

    # pair-bounded coalesced distinct (a pair can surface under several
    # shared keys, possibly in different buckets via its self keys)
    return pairs.repartition(1).map_batches(dedup, batch_format="pyarrow",
                                            batch_size=None)


def token_typo_pairs_sql(table: str = "documents",
                         text_col: str = "text") -> str:
    return rf"""
WITH toks AS (
  SELECT DISTINCT token FROM (
    SELECT unnest(regexp_split_to_array({text_col}, '\s+')) AS token
    FROM {table}
  ) WHERE LENGTH(token) BETWEEN {MIN_LEN} AND {MAX_LEN}
),
seeded AS (
  SELECT token FROM toks
  UNION
  SELECT substr(token, 1, p) || '0' || substr(token, p + 2)
  FROM (SELECT token,
               (7 * LENGTH(token) + 3) % LENGTH(token) AS p FROM toks)
)
SELECT a.token AS token_a, b.token AS token_b
FROM seeded a JOIN seeded b ON a.token < b.token
WHERE levenshtein(a.token, b.token) = 1
"""
