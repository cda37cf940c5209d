"""Bloom-filter semi-join prefilter (Ray guide: "broadcast the key set
(or a Bloom filter of it) and filter inside map_batches").

At cluster scale a semi-join's small side can still be millions of keys;
broadcasting a Bloom filter of m bits instead of the key set shrinks the
per-worker payload ~10× at 1% FPR. The filter never drops a true match
(no false negatives); with ``exact=True`` a second pass verifies the
surviving candidates against the true key set, making the result exactly
the semi-join while the Bloom pass has already discarded ≥99% of
non-matching rows cheaply.

Vectorized double hashing: idx_i = (h1 + i·h2) mod m with h1/h2 from
splitmix64 — k probes are k vectorized passes, no per-row Python.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..core.hashing import splitmix64

_H2_SALT = np.uint64(0x9E3779B97F4A7C15)


def _bloom_params(n: int, fpr: float) -> tuple[int, int]:
    """(m bits, k probes) for ``n`` keys at target FPR (m rounded to words)."""
    n = max(n, 1)
    m = max(int(-n * math.log(fpr) / (math.log(2) ** 2)), 64)
    m = ((m + 63) // 64) * 64
    k = max(int(round(m / n * math.log(2))), 1)
    return m, k


class BloomFilter:
    def __init__(self, keys: np.ndarray, fpr: float = 0.01,
                 params: tuple[int, int] | None = None):
        m, k = params if params is not None else _bloom_params(len(keys), fpr)
        self.m = np.uint64(m)
        self.k = k
        self.bits = np.zeros(int(self.m) // 64, dtype=np.uint64)
        self._set(np.asarray(keys).astype(np.uint64))

    def _indices(self, keys: np.ndarray, i: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            h1 = splitmix64(keys)
            h2 = splitmix64(keys ^ _H2_SALT) | np.uint64(1)
            return (h1 + np.uint64(i) * h2) % self.m

    def _set(self, keys: np.ndarray) -> None:
        for i in range(self.k):
            idx = self._indices(keys, i)
            np.bitwise_or.at(self.bits, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = keys.astype(np.uint64, copy=False)
        out = np.ones(len(keys), dtype=bool)
        for i in range(self.k):
            idx = self._indices(keys, i)
            word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
        return out


def build_bloom_distributed(keys_ds: ray.data.Dataset, key_col: str,
                            fpr: float = 0.01, n_rows: int | None = None,
                            materialize: bool = True) -> BloomFilter:
    """Bloom filter of a key Dataset built distributed: fixed (m, k) sized
    from the (materialized) row count, one partial bit array per batch,
    OR-merged on the driver via a STREAMING iterator — the driver holds one
    m/8-byte blob at a time plus the accumulator, never the blob set and
    never the keys. Pass ``materialize=False`` when the caller already
    materialized ``keys_ds`` (it usually reuses it for the exact join — a
    second materialize would re-execute the whole upstream plan)."""
    if materialize:
        keys_ds = keys_ds.materialize()
    n = n_rows or keys_ds.count()
    m, k = _bloom_params(n, fpr)

    def partial(b: pa.Table) -> pa.Table:
        bf = BloomFilter(b[key_col].to_numpy(zero_copy_only=False),
                         params=(m, k))
        return pa.table({"bits": pa.array([bf.bits.tobytes()], pa.binary())})

    blobs = keys_ds.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    out = BloomFilter(np.array([], np.int64), params=(m, k))
    for batch in blobs.iter_batches(batch_size=1, batch_format="pyarrow"):
        for blob in batch["bits"].to_pylist():
            out.bits |= np.frombuffer(blob, dtype=np.uint64)
    return out


def bloom_prefilter(ds: ray.data.Dataset, key_col: str, bf: BloomFilter,
                    batch_size: int = 65536) -> ray.data.Dataset:
    """Filter ``ds`` to rows whose key *may* be in the Bloom filter (no
    false negatives; FPs survive — follow with an exact join)."""
    bf_ref = ray.put(bf)

    def filt(b: pa.Table) -> pa.Table:
        mask = ray.get(bf_ref).contains(
            b[key_col].to_numpy(zero_copy_only=False))
        return b.filter(pa.array(mask))

    return ds.map_batches(filt, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


def bloom_semi_join(ds: ray.data.Dataset, key_col: str, keys: np.ndarray,
                    fpr: float = 0.01, exact: bool = True,
                    batch_size: int = 65536) -> ray.data.Dataset:
    """Semi-join ``ds`` against an int64 key set via a broadcast Bloom
    prefilter; ``exact=True`` verifies candidates with the true set (the
    result is then exactly the semi-join)."""
    keys = np.asarray(keys, dtype=np.int64)
    bf_ref = ray.put(BloomFilter(keys, fpr))
    exact_set = pa.array(np.unique(keys), pa.int64()) if exact else None

    def filt(b: pa.Table) -> pa.Table:
        bf = ray.get(bf_ref)
        mask = bf.contains(b[key_col].to_numpy(zero_copy_only=False))
        cand = b.filter(pa.array(mask))
        if exact_set is not None and cand.num_rows:
            cand = cand.filter(pc.is_in(cand[key_col], value_set=exact_set))
        return cand

    return ds.map_batches(filt, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)
