"""Misra-Gries mergeable heavy-hitters summary (Misra & Gries 1982;
mergeability per Agarwal et al. 2012, "Mergeable Summaries").

Completes the sketch family (HLL distinct `stages/sketch.py`, log-histogram
quantiles `stages/qsketch.py`, Count-Min frequencies `stages/cmsketch.py`)
with the DETERMINISTIC-guarantee frequent-items sketch: a k-counter summary
whose estimates satisfy  true − D ≤ est ≤ true  where D is the exact total
decrement (D ≤ N/(k+1)), so every token with count > D is guaranteed
present — no hash collisions, no probability.

Distributed shape (the repo's sketch rule — `CLAUDE.md`: tiny-key finishes
must NOT pay a Ray groupby): each block reduces to an exact Arrow
``group_by`` count table COMPRESSED to ≤ k entries (exact counts are a
zero-error MG summary; compression subtracts the (k+1)-th largest count and
keeps positives — one vectorized ``np.partition``), and the ≤ k-row blobs
merge on the driver with the same compress — the HLL driver-merge shape.
Each block also emits one sentinel row carrying its decrement, so the error
bound D ships exactly WITH the result.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def mg_compress(tokens: np.ndarray, counts: np.ndarray,
                k: int) -> tuple[np.ndarray, np.ndarray, int]:
    """(tokens, counts, decrement): ≤ k surviving entries. The classic MG
    step — subtract the (k+1)-th largest count everywhere, keep > 0."""
    if len(tokens) <= k:
        return tokens, counts, 0
    dec = int(np.partition(counts, -(k + 1))[-(k + 1)])
    keep = counts > dec
    return tokens[keep], counts[keep] - dec, dec


def top_tokens_mg(ds: ray.data.Dataset, k: int = 4096,
                  out_k: int = 25, text_col: str = "text") -> pd.DataFrame:
    """(token, est_count, max_err) top-out_k by MG estimate (ties token-
    ascending). ``max_err`` is the exact total decrement D across all
    compressions: every true count lies in [est_count, est_count + D], and
    any token with true count > D is guaranteed to have survived."""

    def summary(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(b[text_col], r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        g = pa.table({"token": toks}).group_by("token").aggregate(
            [("token", "count")])
        t = np.asarray(g["token"].to_pylist(), dtype=object)
        c = g["token_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        t, c, dec = mg_compress(t, c, k)
        # sentinel row (null token) carries this block's decrement
        return pa.table({
            "token": pa.array([None] + list(t), pa.string()),
            "cnt": pa.array(np.r_[0, c]),
            "dec": pa.array(np.r_[dec, np.zeros(len(t), np.int64)])})

    parts = (ds.map_batches(summary, batch_format="pyarrow",
                            zero_copy_batch=True)
               .to_pandas())  # ≤ (k+1) rows per block — HLL driver-merge shape
    dec_total = int(parts["dec"].sum())
    data = parts[parts["token"].notna()]
    merged = data.groupby("token", sort=False)["cnt"].sum()
    t = merged.index.to_numpy(dtype=object)
    c = merged.to_numpy().astype(np.int64)
    t, c, dec = mg_compress(t, c, k)
    dec_total += dec
    out = pd.DataFrame({"token": t, "est_count": c})
    out = (out.sort_values(["est_count", "token"],
                           ascending=[False, True])
              .head(out_k).reset_index(drop=True))
    out["max_err"] = np.int64(dec_total)
    return out.astype({"est_count": np.int64, "max_err": np.int64})
