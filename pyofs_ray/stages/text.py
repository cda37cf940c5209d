"""Text-analysis stages over the documents/pages text column: token counts,
quality scoring, n-gram language ID, document fingerprints.

These are the webtext analogues of PyOFS's per-grid derived variables
(dir/mag `wcofs.py:628-633`, unit conversions `viirs.py:331-353` — SURVEY.md
M2/M6): stateless vectorized ``map_batches`` adding columns.

Exactness: the regex counts use RE2 via ``pyarrow.compute.count_substring_regex``
— the same engine DuckDB's ``regexp_extract_all`` uses — with identical
patterns, so counts match the SQL oracle bit-for-bit. Ratios are single IEEE
divisions of exact int64 counts. The language-ID heuristic is an argmax over
per-language stopword-hit counts with lexicographic tie-break — fully
mirrored in generated SQL (`core.sqlgen_text`).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[A-Za-z0-9]+"
PUNCT_RE = r"[.,;:!?]"
DIGIT_RE = r"[0-9]"

# tiny per-language stopword markers (word-boundary regexes, RE2 on both
# sides); langs sorted so argmax tie-break = first alphabetically.
LANG_MARKERS: dict[str, list[str]] = {
    "de": [r"\bder\b", r"\bdie\b", r"\bund\b", r"\bnicht\b", r"\bist\b"],
    "en": [r"\bthe\b", r"\band\b", r"\bof\b", r"\bto\b", r"\bis\b"],
    "es": [r"\bel\b", r"\bla\b", r"\bde\b", r"\bque\b", r"\by\b"],
    "fr": [r"\ble\b", r"\bla\b", r"\bet\b", r"\bles\b", r"\bdes\b"],
}


def text_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Add n_chars / n_tokens / n_punct / n_digits + quality ratios."""
    t = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(t), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(t, TOKEN_RE), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(t, PUNCT_RE), pa.int64())
    n_digits = pc.cast(pc.count_substring_regex(t, DIGIT_RE), pa.int64())
    denom = pc.cast(pc.add(n_chars, pa.scalar(1, pa.int64())), pa.float64())
    token_ratio = pc.divide(pc.cast(n_tokens, pa.float64()), denom)
    punct_ratio = pc.divide(pc.cast(n_punct, pa.float64()), denom)
    return (batch.append_column("n_chars", n_chars)
                 .append_column("n_tokens", n_tokens)
                 .append_column("n_punct", n_punct)
                 .append_column("n_digits", n_digits)
                 .append_column("token_ratio", token_ratio)
                 .append_column("punct_ratio", punct_ratio))


# GPT-2-style pre-tokenizer pattern, restricted to RE2 (no lookahead):
# contractions, space-prefixed letter runs, digit runs, punctuation runs.
# RE2 is the engine on BOTH sides (pyarrow.compute and DuckDB regexp_*),
# so non-overlapping match counts agree exactly.
BPE_TOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Add n_bpe_tokens: BPE-ish pre-tokenization count — the token-budget
    estimator an LLM data pipeline runs over every document."""
    n = pc.cast(pc.count_substring_regex(batch[text_col], BPE_TOKEN_RE),
                pa.int64())
    return batch.append_column("n_bpe_tokens", n)


def lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n-gram/stopword language-ID heuristic: per-language marker-hit counts,
    argmax with lexicographic tie-break; 'und' (undetermined) when all 0."""
    t = batch[text_col]
    langs = sorted(LANG_MARKERS)
    scores = []
    for lang in langs:
        s = None
        for pat in LANG_MARKERS[lang]:
            c = pc.count_substring_regex(t, pat)
            s = c if s is None else pc.add(s, c)
        scores.append(pc.cast(s, pa.int64()).to_numpy(zero_copy_only=False))
    mat = np.stack(scores, axis=1)  # (rows, langs)
    best = np.argmax(mat, axis=1)  # first max → lexicographic tie-break
    pred = np.array(langs, dtype=object)[best]
    pred = np.where(mat.max(axis=1) == 0, "und", pred)
    score = mat[np.arange(len(best)), best].astype(np.int64)
    return (batch.append_column("lang_pred", pa.array(pred, pa.string()))
                 .append_column("lang_score", pa.array(score, pa.int64())))


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """MD5 hex fingerprint of the text bytes (matches DuckDB ``md5(text)``).

    hashlib runs in C per row (~1 μs); used for exact-dedup partitioning and
    byte-identity audits, not in per-batch numeric hot loops.
    """
    texts = batch[text_col].to_pylist()
    digests = [hashlib.md5(s.encode("utf-8")).hexdigest() if s is not None else None
               for s in texts]
    return batch.append_column("text_hash", pa.array(digests, pa.string()))
