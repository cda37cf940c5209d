from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyofs_ray.core.hashing import fnv1a64, splitmix64


def _fnv_scalar(s: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in s:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def test_fnv1a64_matches_scalar():
    strings = ["", "a", "hello world", "https://h0.example.com/p/123", "ünïcode☃"]
    got = fnv1a64(pa.array(strings))
    for s, g in zip(strings, got):
        assert int(g) == _fnv_scalar(s.encode("utf-8")), s


def test_fnv1a64_large_string_type():
    arr = pa.array(["abc", "xyzw"], type=pa.large_string())
    assert int(fnv1a64(arr)[0]) == _fnv_scalar(b"abc")


def test_fnv1a64_sliced_array():
    arr = pa.array(["aa", "bb", "cc", "dd"]).slice(1, 2)
    got = fnv1a64(arr)
    assert [int(x) for x in got] == [_fnv_scalar(b"bb"), _fnv_scalar(b"cc")]


def test_splitmix_deterministic_uniformish():
    x = np.arange(10_000, dtype=np.uint64)
    h = splitmix64(x)
    assert len(np.unique(h)) == len(h)
    assert (h % 2 == 0).mean() > 0.45 and (h % 2 == 0).mean() < 0.55
