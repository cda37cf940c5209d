"""Content-defined chunking: the locality property (an edit re-chunks
only its neighborhood), boundary semantics on constructed docs, dup
accounting, and oracle parity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyofs_ray.stages import cdc
from pyofs_ray.registry import ORACLES, QUERIES

from .conftest import SF_SMOKE, assert_matches_oracle, make_duckdb


def _chunks_of(text: str, doc_id: int = 0):
    t = pa.table({"doc_id": pa.array([doc_id], pa.int64()),
                  "text": pa.array([text], pa.string())})
    out = cdc.chunk_batch(t)
    return list(zip(out["start_pos"].to_pylist(),
                    out["chunk_len"].to_pylist(),
                    out["sig"].to_pylist()))


def test_chunks_tile_the_document():
    rng = np.random.default_rng(7)
    text = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 3000))
    ch = _chunks_of(text)
    assert ch[0][0] == 0
    pos = 0
    for start, length, _ in ch:
        assert start == pos
        pos += length
    assert pos == len(text)


def test_edit_locality():
    """Insert 5 chars near the head: every chunk that starts at least a
    window past the edit keeps its exact signature — the property that
    makes CDC dedup survive byte-offset shifts (whole-doc hashing and
    fixed-size blocking both lose everything after the edit)."""
    rng = np.random.default_rng(11)
    text = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 4000))
    edited = text[:50] + "XYZQW" + text[50:]
    sig_a = {s for *_, s in _chunks_of(text)}
    chunks_b = _chunks_of(edited, doc_id=1)
    # all chunks fully past the edit+window survive with identical sigs
    surviving = [s for start, _, s in chunks_b
                 if start > 50 + 5 + cdc.CDC_WINDOW]
    assert surviving, "expected chunks after the edit"
    missed = [s for s in surviving if s not in sig_a]
    assert not missed, f"{len(missed)}/{len(surviving)} post-edit chunks lost"
    # and the first chunk (before the edit) only survives if no boundary
    # moved into it; the share of shared sigs must dominate
    shared = sum(1 for *_, s in chunks_b if s in sig_a)
    assert shared >= len(chunks_b) - 3


def test_empty_and_short_docs():
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["", "ab", "x" * 40], pa.string())})
    out = cdc.chunk_batch(t)
    ids = out["doc_id"].to_pylist()
    assert 0 not in ids                     # empty doc -> no chunks
    sub = [(i, s, l) for i, s, l in zip(ids, out["start_pos"].to_pylist(),
                                        out["chunk_len"].to_pylist())
           if i == 1]
    assert sub == [(1, 0, 2)]               # shorter than window: 1 chunk


def test_dup_chunks_counts_identical_texts(ray_session):
    import ray.data
    texts = ["the quick brown fox " * 20] * 3 + ["unique body " * 25]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = cdc.cdc_dup_chunks(ds).to_pandas()
    assert (out.n_copies == 3).all()
    assert (out.n_docs == 3).all()
    assert (out.saved_chars == 2 * out.chunk_len).all()
    # the three identical docs share ALL their chunks
    ref = cdc.chunk_batch(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array([texts[0]], pa.string())}))
    assert len(out) == len(set(ref["sig"].to_pylist()))


def test_doc_overlap_finds_shared_boilerplate(ray_session):
    import ray.data
    boiler = "shared footer boilerplate text common to both pages " * 4
    texts = ["unique alpha body " * 12 + boiler,
             "unique beta body " * 12 + boiler,
             "totally unrelated gamma " * 20]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = cdc.cdc_doc_overlap(ds).to_pandas()
    pairs = set(map(tuple, out[["doc_a", "doc_b"]].itertuples(index=False)))
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)
    assert out.set_index(["doc_a", "doc_b"]).loc[(0, 1), "n_shared"] >= 2


def test_doc_overlap_hot_sig_raises(ray_session):
    import pytest
    import ray.data
    from ray.exceptions import RayTaskError
    texts = ["identical page body " * 10] * 40
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    with pytest.raises((ValueError, RayTaskError),
                       match="template boilerplate"):
        cdc.cdc_doc_overlap(ds, max_df=8).materialize()


def test_cdc_matches_oracle_smoke():
    con = make_duckdb(SF_SMOKE)
    assert_matches_oracle(QUERIES["cdc_chunks"](SF_SMOKE), con,
                          ORACLES["cdc_chunks"])
    assert_matches_oracle(QUERIES["cdc_dup_chunks"](SF_SMOKE), con,
                          ORACLES["cdc_dup_chunks"])


def test_host_content_drift_semantics(ray_session):
    """Prepended-edit pages drift PARTIALLY (CDC locality keeps tail
    chunks); hosts whose pages all dodge the key%3 edit have drift 0."""
    out = (QUERIES["host_content_drift"](SF_SMOKE).to_pandas()
           .set_index("host_id"))
    assert (out.inter <= out[["n0", "n1"]].min(axis=1)).all()
    assert (out.uni == out.n0 + out.n1 - out.inter).all()
    assert (out.drift_ppm == (out.uni - out.inter) * 1_000_000
            // out.uni).all()
    assert (out.drift_ppm > 0).any() and (out.drift_ppm == 0).any()
    # the hot host (0) carries ~70% of pages; a third get edited, but
    # CDC locality keeps its drift well below the fully-rechunked bound
    assert 0 < out.loc[0, "drift_ppm"] < 500_000


def test_host_content_drift_matches_oracle_smoke():
    con = make_duckdb(SF_SMOKE)
    assert_matches_oracle(QUERIES["host_content_drift"](SF_SMOKE), con,
                          ORACLES["host_content_drift"])
