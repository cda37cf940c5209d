"""Deterministic hash sampling — the reproducible corpus subsample every
training-data pipeline needs (split/holdout/rate-limit), as a pure filter:
a row survives iff ``splitmix64(key ^ salt) % den < num``. No RNG state, no
coordination, stable under re-partitioning and resume — the same rows are
selected on every run and on any cluster shape.

DuckDB twin: the same splitmix64 finalizer in HUGEINT arithmetic
(`core.sqlgen_sample`), so samples are oracle-checkable bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..core.hashing import splitmix64


def hash_sample(ds: ray.data.Dataset, key_col: str, rate: float,
                salt: int = 0) -> ray.data.Dataset:
    """Keep ~``rate`` of rows, selected by hash of ``key_col`` (int64).

    ``rate`` is quantized to 1/2²⁰ (≈1e-6) so the SQL twin uses exact
    integer thresholds."""
    den = 1 << 20
    num = int(round(rate * den))

    def filt(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(k.view(np.uint64) ^ np.uint64(salt))
        keep = (h % np.uint64(den)) < np.uint64(num)
        return b.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def split_bounds(splits: dict[str, float]) -> tuple[np.ndarray, np.ndarray]:
    """(bounds, labels) for `split_labels` — bounds from ROUNDED CUMULATIVE
    fractions (rounding each fraction separately can overflow the
    denominator by the accumulated rounding error); remainder label ''."""
    den = 1 << 20
    bounds, labels, cum = [], [], 0.0
    for name, frac in splits.items():
        cum += frac
        bounds.append(int(round(cum * den)))
        labels.append(name)
    if bounds and bounds[-1] > den:
        raise ValueError(f"hash_split: fractions sum to {cum:.4f} > 1")
    labels.append("")
    return np.array(bounds, dtype=np.uint64), np.array(labels)


def split_labels(keys: np.ndarray, splits: dict[str, float],
                 salt: int = 0) -> np.ndarray:
    """Split label per int64 key — the pure-function kernel under
    `hash_split`; usable anywhere a key is at hand (no join needed)."""
    b_arr, lab_arr = split_bounds(splits)
    h = splitmix64(keys.astype(np.int64).view(np.uint64)
                   ^ np.uint64(salt)) % np.uint64(1 << 20)
    return lab_arr[np.searchsorted(b_arr, h, side="right")]


def hash_split(ds: ray.data.Dataset, key_col: str,
               splits: dict[str, float], salt: int = 0,
               out_col: str = "split") -> ray.data.Dataset:
    """Deterministic train/val/test assignment: each row gets the label of
    the half-open hash-bucket range its ``splitmix64(key ^ salt)`` draw
    falls in, in ``splits`` iteration order (fractions must sum to ≤1;
    any remainder is labeled ``""``). Exhaustive and disjoint by
    construction, stable under re-partitioning/resume, and consistent
    with ``hash_sample`` at the same salt (the first split IS that
    sample)."""
    split_bounds(splits)  # validate fractions eagerly, not per batch

    def assign(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False)
        return b.append_column(out_col,
                               pa.array(split_labels(k, splits, salt)))

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def stratified_hash_sample(ds: ray.data.Dataset, key_col: str,
                           stratum_col: str, rates: dict[str, float],
                           default_rate: float,
                           salt: int = 0) -> ray.data.Dataset:
    """Per-stratum deterministic sampling — the corpus-balancing form
    (down-sample a dominant language/source, keep minority strata at a
    higher rate). Same splitmix64 filter as ``hash_sample`` with the
    threshold looked up from the row's ``stratum_col``; strata absent from
    ``rates`` use ``default_rate``. Deterministic, coordination-free,
    stable under re-partitioning — and a row keeps the SAME hash draw
    across strata, so changing one stratum's rate never reshuffles
    another's sample."""
    den = 1 << 20
    nums = {s: int(round(r * den)) for s, r in rates.items()}
    default_num = int(round(default_rate * den))

    def filt(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(k.view(np.uint64) ^ np.uint64(salt))
        col = b[stratum_col]
        # null strata take default_rate — matching the SQL twin, whose
        # CASE matches no arm on NULL (np.unique would choke on None)
        isnull = pc.is_null(col).to_numpy(zero_copy_only=False)
        strat = pc.fill_null(col, "").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(strat, return_inverse=True)
        thr = np.array([nums.get(s, default_num) for s in uniq],
                       dtype=np.uint64)[inv]
        thr[isnull] = default_num
        keep = (h % np.uint64(den)) < thr
        return b.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def weighted_hash_sample(ds: ray.data.Dataset, key_col: str,
                         weight_col: str, cap: int, per_unit: int,
                         salt: int = 0) -> ray.data.Dataset:
    """Importance sampling with a per-ROW keep probability proportional to
    an integer weight column (e.g. keep long documents more often when
    balancing a corpus by content volume): keep iff
    ``splitmix64(key ^ salt) % 2^20 < min(weight, cap) * per_unit``.

    Exact-integer thresholds (``cap * per_unit`` must stay < 2^20 for a
    true probability; at the cap the keep rate is ``cap*per_unit/2^20``).
    Same draw as ``hash_sample`` — deterministic, coordination-free,
    stable under re-partitioning and resume."""
    den = 1 << 20
    if cap * per_unit > den:
        raise ValueError(
            f"weighted_hash_sample: cap*per_unit = {cap * per_unit} "
            f"exceeds the 2^20 draw range (keep rate would saturate)")

    def filt(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(k.view(np.uint64) ^ np.uint64(salt))
        # NULL/negative weights drop the row, matching the SQL twin
        # (NULL comparison and a negative threshold are both never-true)
        w = pc.fill_null(b[weight_col], -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        thr = (np.clip(w, 0, cap) * per_unit).astype(np.uint64)
        keep = ((h % np.uint64(den)) < thr) & (w >= 0)
        return b.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
