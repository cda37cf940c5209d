"""Count-min sketch: constant-memory token-frequency estimation — the
frequency member of the sketch family (HLL = distinct, log-histogram =
quantiles, CM = point frequency). At 100 TB the exact `top_tokens`
partial-top-k path answers "which tokens are hot"; CM answers "how hot is
THIS token" for any ad-hoc probe without a vocabulary-sized state.

Standard Cormode–Muthukrishnan structure: D independent hash rows × W
counters; update adds each token's batch count to one counter per row;
estimate = min over rows (one-sided: never an underestimate, overshoot
bounded by ε·N with ε = e/W at the usual depth). Hashes are
``splitmix64(fnv1a64(token) ^ row_salt)`` — deterministic, no RNG state.

Scale shape: per-batch Arrow token counts scatter-add (``np.add.at``) into
a local (D, W) int64 matrix; ONE blob per batch leaves the task (the HLL
merge shape — `sketch.approx_distinct`); blobs merge by addition on the
driver (tree-merge via a tiny groupby at cluster scale). Sketch size is
independent of corpus and vocabulary size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..core.hashing import fnv1a64, splitmix64

CM_DEPTH = 4
CM_WIDTH = 8192
_SALTS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                   0x165667B19E3779F9, 0x27D4EB2F165667C5], np.uint64)


def _cm_cols(tokens: pa.Array) -> np.ndarray:
    """(n, D) counter column per token per row."""
    h = fnv1a64(tokens)
    return np.stack([
        (splitmix64(h ^ _SALTS[d]) % np.uint64(CM_WIDTH)).astype(np.int64)
        for d in range(CM_DEPTH)], axis=1)


def cm_sketch_tokens(ds: ray.data.Dataset, text_col: str = "text",
                     batch_size: int = 65536) -> np.ndarray:
    """Merged (D, W) count-min matrix of whitespace-token occurrences."""

    def sketch(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(b[text_col], r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = (pa.table({"t": flat}).group_by("t")
             .aggregate([("t", "count")]))
        cm = np.zeros((CM_DEPTH, CM_WIDTH), np.int64)
        if len(g):
            cols = _cm_cols(g["t"].combine_chunks())
            cnt = g["t_count"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            for d in range(CM_DEPTH):
                np.add.at(cm[d], cols[:, d], cnt)
        return pa.table({"cm": pa.array([cm.tobytes()], pa.binary())})

    blobs = ds.map_batches(sketch, batch_format="pyarrow",
                           batch_size=batch_size).to_pandas().cm
    out = np.zeros((CM_DEPTH, CM_WIDTH), np.int64)
    for blob in blobs:
        out += np.frombuffer(blob, np.int64).reshape(CM_DEPTH, CM_WIDTH)
    return out


def cm_estimate(cm: np.ndarray, tokens: list[str]) -> np.ndarray:
    """Point estimates (min over rows) for each probe token."""
    cols = _cm_cols(pa.array(tokens, pa.string()))
    return np.min(
        np.stack([cm[d, cols[:, d]] for d in range(CM_DEPTH)], axis=0),
        axis=0)
