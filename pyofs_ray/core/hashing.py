"""Vectorized string/byte hashing kernels (numpy, no Python-per-row loops).

Used for: url→key geocoding of arbitrary (non-fixture) corpora, exact-dedup
hash partitioning, SimHash/MinHash document fingerprints. The fixture path
(testdata) parses the integer page key straight out of the url instead, so
hash-algorithm choice never affects oracle-checked results.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)
_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _string_bytes_matrix(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string/binary array → (N, maxlen) uint8 matrix + lengths.

    Zero-copy view of the Arrow buffer; padding bytes are 0 and masked out
    by `lengths` in the per-position hash loop (O(maxlen) vectorized passes,
    not O(rows) Python iterations).
    """
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    else:
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] is not None else np.empty(0, np.uint8)
    lengths = np.diff(offsets).astype(np.int64)
    n, maxlen = len(arr), int(lengths.max()) if len(lengths) else 0
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    # Gather: index matrix of byte positions, clipped; mask picks valid bytes.
    if maxlen:
        idx = offsets[:-1, None].astype(np.int64) + np.arange(maxlen, dtype=np.int64)[None, :]
        valid = np.arange(maxlen, dtype=np.int64)[None, :] < lengths[:, None]
        np.clip(idx, 0, max(len(data) - 1, 0), out=idx)
        mat = np.where(valid, data[idx], 0).astype(np.uint8)
    return mat, lengths


def fnv1a64(arr: pa.Array | list[str]) -> np.ndarray:
    """FNV-1a 64-bit over each string/binary element, vectorized.

    Matches the canonical byte-wise FNV-1a: h = offset; for b: h ^= b;
    h *= prime (mod 2^64).
    """
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr)
    mat, lengths = _string_bytes_matrix(arr)
    h = np.full(mat.shape[0], FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(mat.shape[1]):
            live = lengths > j
            hj = h[live]
            hj = (hj ^ mat[live, j].astype(np.uint64)) * FNV_PRIME
            h[live] = hj
    return h


def gram_hash_matrix(arr: pa.Array, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized char-k-gram FNV-1a hashes for a whole string batch.

    Returns ``(grams, valid)``: ``grams`` is (N, maxlen-k+1) uint64 where
    column j is the FNV-1a hash of bytes[j:j+k]; ``valid[i, j]`` marks grams
    fully inside row i. One O(k) loop of vectorized passes over the byte
    matrix — no per-document Python. (Byte-level k-grams; equals per-string
    FNV of each k-byte window.)
    """
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr)
    mat, lengths = _string_bytes_matrix(arr)
    n, maxlen = mat.shape
    g = max(maxlen - k + 1, 1)
    h = np.full((n, g), FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            win = mat[:, j:j + g] if maxlen >= k else np.zeros((n, g), np.uint8)
            h = (h ^ win.astype(np.uint64)) * FNV_PRIME
    valid = (np.arange(g)[None, :] + k) <= lengths[:, None]
    return h, valid


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Stateless splitmix64 finalizer — cheap key→uniform-uint64 mix."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z = (z + _GOLDEN)
        z = (z ^ (z >> np.uint64(30))) * _SPLITMIX_C1
        z = (z ^ (z >> np.uint64(27))) * _SPLITMIX_C2
        z = z ^ (z >> np.uint64(31))
    return z
