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
        strat = b[stratum_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(strat, return_inverse=True)
        thr = np.array([nums.get(s, default_num) for s in uniq],
                       dtype=np.uint64)[inv]
        keep = (h % np.uint64(den)) < thr
        return b.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
