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


# ------------------------------------------------------ winnowing (MOSS)
WINNOW_K = 8       # k-gram length in characters
WINNOW_W = 4       # window of consecutive k-gram hashes
WINNOW_BASE = 257  # rolling polynomial base (mod 2^64 by uint64 wrap)
WINNOW_FP_BITS = 44   # fingerprint = low 44 bits of the k-gram hash
WINNOW_POS_BITS = 20  # packed position field; docs > 2^20 chars unsupported


def winnow_fingerprints(batch: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """MOSS-style winnowing fingerprints: polynomial k-gram hash over code
    points (base 257 mod 2⁶⁴ — numpy uint64 wrap ≡ the SQL twin's HUGEINT
    sum then % 2⁶⁴), fingerprint = low 44 bits, then each w-window selects
    its minimum with the RIGHTMOST position winning ties — pinned by
    packing ``v = fp·2²⁰ + (2²⁰ − pos)`` so one vectorized sliding-min
    decides both. Output: distinct ``(doc_id, pos, fp)`` rows, ``pos``
    1-based to match SQL ``substr`` indexing. Docs with fewer than
    ``k + w − 1`` characters emit nothing.
    """
    one = np.uint64(1)
    pos_mod = np.uint64(1) << np.uint64(WINNOW_POS_BITS)
    fp_mask = (one << np.uint64(WINNOW_FP_BITS)) - one
    pw = np.array([WINNOW_BASE ** (WINNOW_K - 1 - j) % (1 << 64)
                   for j in range(WINNOW_K)], dtype=np.uint64)
    out_ids, out_pos, out_fp = [], [], []
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    for did, s in zip(ids, batch[text_col].to_pylist()):
        if s is None:
            continue
        cp = np.frombuffer(s.encode("utf-32-le"),
                           dtype=np.uint32).astype(np.uint64)
        if len(cp) >= (1 << WINNOW_POS_BITS):
            # beyond the packed position field the uint64 borrow would
            # corrupt fp bits silently AND diverge from the SQL twin
            raise ValueError(
                f"winnow_fingerprints: doc {did} has {len(cp)} chars — "
                f"the packed position field caps docs at "
                f"{(1 << WINNOW_POS_BITS) - 1} chars; split or truncate "
                "upstream")
        n = len(cp) - WINNOW_K + 1
        if n < WINNOW_W:
            continue
        win = np.lib.stride_tricks.sliding_window_view(cp, WINNOW_K)
        h = (win * pw).sum(axis=1, dtype=np.uint64)
        fp = h & fp_mask
        i = np.arange(1, n + 1, dtype=np.uint64)
        v = (fp << np.uint64(WINNOW_POS_BITS)) + (pos_mod - i)
        sel = np.unique(
            np.lib.stride_tricks.sliding_window_view(v, WINNOW_W)
            .min(axis=1))
        out_ids.append(np.full(len(sel), did, np.int64))
        out_pos.append((pos_mod - (sel % pos_mod)).astype(np.int64))
        out_fp.append((sel >> np.uint64(WINNOW_POS_BITS)).astype(np.int64))
    if not out_ids:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64()),
                         "fp": pa.array([], pa.int64())})
    return pa.table({"doc_id": pa.array(np.concatenate(out_ids)),
                     "pos": pa.array(np.concatenate(out_pos)),
                     "fp": pa.array(np.concatenate(out_fp))})


# word-boundary English stopword markers — RE2 on BOTH sides (pyarrow
# count_substring_regex and DuckDB regexp_extract_all), case-insensitive
STOPWORD_RE = (r"(?i)\b(?:the|a|an|and|or|of|to|in|is|it|that|was|for|on"
               r"|with|as|at|by|be|this)\b")


def quality_scores(batch: pa.Table, text_col: str = "text",
                   id_col: str = "doc_id") -> pa.Table:
    """Quality-scoring signals: token count, stopword hits, and the
    stopword ratio (stopwords / (tokens + 1)) — the classic natural-text
    vs boilerplate/gibberish discriminator; ratio derived by ONE IEEE
    division from exact int64 counts (bit-reproducible, SQL-mirrored)."""
    t = batch[text_col]
    n_tokens = pc.cast(pc.count_substring_regex(t, TOKEN_RE), pa.int64())
    n_stop = pc.cast(pc.count_substring_regex(t, STOPWORD_RE), pa.int64())
    denom = pc.cast(pc.add(n_tokens, pa.scalar(1, pa.int64())), pa.float64())
    ratio = pc.divide(pc.cast(n_stop, pa.float64()), denom)
    return pa.table({id_col: batch[id_col], "n_tokens": n_tokens,
                     "n_stopwords": n_stop, "stopword_ratio": ratio})


def token_repetition(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Within-document token repetition (Gopher-style quality signal):
    whitespace-token count, distinct-token count, and
    ``repetition_ratio = (total - distinct) / (total + 1)`` — high values
    flag boilerplate/keyword-stuffed pages. All-Arrow: split → flatten
    with parent indices → (row, token) distinct via one Arrow group_by;
    the ratio is ONE IEEE division of exact int64 counts (SQL-mirrored)."""
    import numpy as np
    arr = batch[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lists = pc.split_pattern_regex(arr, r"\s+")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")
    flat_t = flat.filter(mask)
    parent_t = parent.filter(mask).to_numpy(zero_copy_only=False)
    n = len(batch)
    total = np.bincount(parent_t, minlength=n).astype(np.int64)
    g = (pa.table({"p": pa.array(parent_t), "t": flat_t})
         .group_by(["p", "t"]).aggregate([]))
    distinct = np.bincount(g["p"].to_numpy(zero_copy_only=False),
                           minlength=n).astype(np.int64)
    rep = (total - distinct).astype(np.float64) / (total + 1).astype(np.float64)
    return pa.table({id_col: batch[id_col],
                     "n_ws_tokens": pa.array(total),
                     "n_distinct_tokens": pa.array(distinct),
                     "repetition_ratio": pa.array(rep)})


# ---------------------------------------------- normalization / cleaning
# tiny cleaning stoplist (fixture-hot function words); real deployments
# broadcast a per-language list — the kernel shape is identical
CLEAN_STOPWORDS = ("the", "and", "of", "a", "is", "in", "to", "it")


def normalize_clean(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id",
                    stopwords: tuple[str, ...] = CLEAN_STOPWORDS) -> pa.Table:
    """Text normalization for training-data prep: lowercase → collapse
    whitespace runs → trim → drop stopword tokens → re-join. Fully
    vectorized: RE2 + one flatten/filter/rebuild of the token list array
    (offsets recomputed by a bincount — no per-row Python). Mirrors the
    DuckDB ``list_filter(string_split(...))`` twin byte-for-byte on ASCII
    (no NFC — DuckDB has no normalization kernel, so it is out of the
    oracle-checked contract; documented, not silently approximated)."""
    t = pc.utf8_lower(batch[text_col])
    t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
    t = pc.utf8_trim_whitespace(t)
    toks = t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
    toks = pc.split_pattern(toks, " ")
    flat = pc.list_flatten(toks)
    keep = pc.invert(pc.is_in(flat, value_set=pa.array(list(stopwords))))
    keep_np = keep.to_numpy(zero_copy_only=False)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    counts = np.bincount(parents[keep_np], minlength=len(batch))
    offsets = np.concatenate([[0], np.cumsum(counts)])
    rebuilt = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                       flat.filter(keep))
    clean = pc.binary_join(rebuilt, " ")
    return pa.table({id_col: batch[id_col], "clean_text": clean,
                     "n_kept_tokens": pa.array(counts.astype(np.int64))})


# ---------------------------------------------------------- PII redaction
# RE2 on both sides (pyarrow.compute and DuckDB regexp_*) — identical
# non-overlapping leftmost matching, so counts AND rewritten strings agree
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def redact_pii(batch: pa.Table, text_col: str = "text",
               id_col: str = "doc_id") -> pa.Table:
    """PII redaction pass (training-data prep): replace emails and IPv4
    addresses with typed sentinels, counting each. Emails first — the
    ``<EMAIL>`` sentinel contains no digits, so the IP pass can never
    match inside it. Stateless vectorized RE2; real deployments extend
    the pattern set, the kernel shape is identical."""
    t = batch[text_col]
    n_email = pc.cast(pc.count_substring_regex(t, EMAIL_RE), pa.int64())
    n_ip = pc.cast(pc.count_substring_regex(t, IPV4_RE), pa.int64())
    r = pc.replace_substring_regex(t, pattern=EMAIL_RE,
                                   replacement="<EMAIL>")
    r = pc.replace_substring_regex(r, pattern=IPV4_RE, replacement="<IP>")
    return pa.table({id_col: batch[id_col], "redacted_text": r,
                     "n_emails": n_email, "n_ips": n_ip})


# --------------------------------------- hashed linear quality classifier
# fastText-style model-based filtering (the CCNet / FineWeb quality-
# classifier stage): score(doc) = Σ_tokens w[h(token)] with a feature-hashed
# weight table. The weight "table" here is the hash itself — w(token) =
# (md5_low60(token) mod 2001) − 1000 — so BOTH engines derive identical
# weights with no shipped model artifact: md5 is byte-stable everywhere and
# DuckDB computes the same value via CAST(('0x' || substr(md5(t),1,15)) AS
# BIGINT). A real deployment swaps `_token_weight` for a learned table
# broadcast via ray.put; the pipeline shape (one streaming scan, zero
# exchanges, per-batch vectorized segment sums) is identical.

_W_MOD = 2001
_W_CACHE: dict[str, int] = {}


def _token_weight(tok: str) -> int:
    w = _W_CACHE.get(tok)
    if w is None:
        h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
        w = h % _W_MOD - 1000
        if len(_W_CACHE) > 4_000_000:  # vocab cap — never grows unbounded
            _W_CACHE.clear()
        _W_CACHE[tok] = w
    return w


def linear_classifier_score(batch: pa.Table, text_col: str = "text",
                            id_col: str = "doc_id") -> pa.Table:
    """Per-doc (n_tokens, score, keep): whitespace tokens, feature-hashed
    integer weights summed per doc (exact int64 — |w| ≤ 1000 so the sum is
    bounded by 1000·doc_tokens), keep = score ≥ 0. The md5-per-token loop
    runs once per DISTINCT token per batch (np.unique + per-worker cache) —
    vocabulary-bounded, not token-bounded."""
    toks = batch[text_col]
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    lists = pc.split_pattern_regex(toks, r"\s+")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat_np = flat.to_numpy(zero_copy_only=False)[mask]
    parents = parents[mask]
    uniq, inv = np.unique(flat_np, return_inverse=True)
    w_uniq = np.fromiter((_token_weight(u) for u in uniq),
                         dtype=np.int64, count=len(uniq))
    w = w_uniq[inv]
    n = len(batch)
    # bincount weights are float64: exact here (|Σ| ≤ 1000·tokens ≪ 2^53)
    score = np.bincount(parents, weights=w, minlength=n).astype(np.int64)
    ntok = np.bincount(parents, minlength=n).astype(np.int64)
    return pa.table({id_col: batch[id_col],
                     "n_tokens": pa.array(ntok),
                     "score": pa.array(score),
                     "keep": pa.array(score >= 0)})
