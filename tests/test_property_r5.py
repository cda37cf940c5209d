"""Property-based tests (hypothesis) for the round-5 kernels: vectorized
implementations vs independent scalar re-implementations. No Ray needed."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from pyofs_ray.core.hashing import fnv1a64, splitmix64
from pyofs_ray.stages.composite import _group_select
from pyofs_ray.stages.segstrip import _doc_segments
from pyofs_ray.stages.sketch import HLL_P, hll_idx_rho

token = st.text(alphabet="ab ", min_size=0, max_size=24)
docs_strategy = st.lists(token, min_size=1, max_size=8)


@settings(max_examples=120, deadline=None)
@given(docs=docs_strategy, k=st.integers(min_value=1, max_value=5))
def test_doc_segments_scalar_parity(docs, k):
    b = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    rows, seg_idx, segs = _doc_segments(b, k, "doc_id", "text")
    got = list(zip(rows.tolist(), seg_idx.tolist(), segs.to_pylist()))
    want = []
    for i, t in enumerate(docs):
        toks = [w for w in t.split(" ") if w]
        for s in range(0, len(toks), k):
            want.append((i, s // k, " ".join(toks[s:s + k])))
    assert got == want


@settings(max_examples=120, deadline=None)
@given(vals=st.lists(st.integers(min_value=-3, max_value=3),
                     min_size=1, max_size=40),
       n=st.integers(min_value=1, max_value=7))
def test_ntile_formula_scalar_parity(vals, n):
    """The big/small NTILE split formula used by events_ntile_shards
    must equal the definitional assignment for every rank."""
    total = len(vals)
    big = -(-total // n)
    small = total // n
    r_big = total % n
    # definitional: first r_big buckets take `big` rows, rest `small`
    want = []
    for bucket in range(1, n + 1):
        want.extend([bucket] * (big if bucket <= r_big else small))
    want = want[:total]
    rn = np.arange(1, total + 1, dtype=np.int64)
    if r_big and big:
        shard = np.where(rn <= r_big * big, (rn - 1) // big + 1,
                         r_big + (rn - r_big * big - 1)
                         // max(small, 1) + 1)
    else:
        shard = (rn - 1) // max(small, 1) + 1
    assert shard.tolist() == want


@settings(max_examples=100, deadline=None)
@given(rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50),
                               st.integers(0, 10**6)),
                     min_size=0, max_size=60),
       k=st.integers(min_value=1, max_value=4),
       descending=st.booleans())
def test_group_select_matches_pandas(rows, k, descending):
    """Arrow lexsort+segment partial == the pandas mergesort+groupby it
    replaced, for head-k and tail-1, on adversarial duplicate keys."""
    ids = list(range(len(rows)))  # unique tiebreaker → total order
    t = pa.table({"key": [r[0] for r in rows],
                  "ord": [r[1] for r in rows],
                  "uid": ids,
                  "payload": [r[2] for r in rows]})
    got_head = _group_select(t, ["key"], ["ord", "uid"], k, descending,
                             "head").to_pandas()
    df = t.to_pandas()
    asc = [True, not descending, not descending]
    want_head = (df.sort_values(["key", "ord", "uid"], ascending=asc,
                                kind="mergesort")
                   .groupby("key", as_index=False, sort=False).head(k)
                   .reset_index(drop=True))
    assert got_head.reset_index(drop=True).equals(want_head)

    got_tail = _group_select(t, ["key"], ["ord", "uid"], 1, False,
                             "tail").to_pandas()
    want_tail = (df.sort_values(["key", "ord", "uid"], kind="mergesort")
                   .groupby("key", as_index=False, sort=False).tail(1)
                   .reset_index(drop=True))
    assert got_tail.reset_index(drop=True).equals(want_tail)


@settings(max_examples=200, deadline=None)
@given(x=st.integers(min_value=0, max_value=2**64 - 1))
def test_hll_idx_rho_scalar_parity(x):
    h = np.array([x], dtype=np.uint64)
    idx, rho = hll_idx_rho(h)
    assert idx[0] == x >> (64 - HLL_P)
    rest = (x << HLL_P) & (2**64 - 1)
    want_rho = (64 - HLL_P + 1) if rest == 0 else 65 - rest.bit_length()
    assert rho[0] == want_rho


@settings(max_examples=100, deadline=None)
@given(s=st.text(alphabet=st.characters(min_codepoint=1,
                                        max_codepoint=127),
                 min_size=0, max_size=20))
def test_fnv_splitmix_scalar_parity(s):
    """The exact hash chain the HLL SQL twin mirrors, re-derived
    scalar-wise byte by byte."""
    h = 14695981039346656037
    for ch in s.encode():
        h = ((h ^ ch) * 1099511628211) % 2**64
    assert int(fnv1a64(pa.array([s]))[0]) == h
    z = (h + 0x9E3779B97F4A7C15) % 2**64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % 2**64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % 2**64
    z = z ^ (z >> 31)
    assert int(splitmix64(np.array([h], np.uint64))[0]) == z


@settings(max_examples=100, deadline=None)
@given(key=st.text(alphabet="xy", min_size=0, max_size=30),
       pad_to=st.integers(min_value=0, max_value=40))
def test_hash_bucket_tag_padding_invariant(key, pad_to):
    """r5 regression: a key's bucket must not depend on the OTHER
    strings in its batch (batch max width drives the word count)."""
    from pyofs_ray.stages.agg import hash_bucket_tag

    alone = pa.table({"k": [key]})
    padded = pa.table({"k": [key, "z" * pad_to]})
    b1 = hash_bucket_tag(alone, ["k"], 64)["_bucket"][0].as_py()
    b2 = hash_bucket_tag(padded, ["k"], 64)["_bucket"][0].as_py()
    assert b1 == b2
