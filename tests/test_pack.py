"""Sequence packing: exclusive-scan semantics (boundary crossing, range
segmentation, empty docs) on a constructed corpus + oracle parity."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from pyofs_ray.pipelines import corpus
from pyofs_ray.registry import ORACLES, QUERIES

from .conftest import SF_SMOKE, assert_matches_oracle, make_duckdb


def test_pack_sequences_boundaries(tmp_path):
    # token counts: 5, 3, 0, 7, 4 -> starts 0, 5, 8, 8, 15; seq_len=8
    texts = ["a b c d e", "x y z", "", "t u v w q r s", "m n o p"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")
    for dist in (False, True):  # coalesced finish AND the 3-step scan
        out = (corpus.pack_sequences(str(tmp_path), seq_len=8, range_w=2,
                                     force_distributed=dist)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(out.n_tokens) == [5, 3, 0, 7, 4], dist
        assert list(out.tok_start) == [0, 5, 8, 8, 15], dist
        assert list(out.seq_id) == [0, 0, 1, 1, 1], dist
        assert list(out.seq_off) == [0, 5, 0, 0, 7], dist


def test_pack_sequences_matches_oracle_smoke():
    con = make_duckdb(SF_SMOKE)
    assert_matches_oracle(QUERIES["pack_sequences"](SF_SMOKE), con,
                          ORACLES["pack_sequences"])


def test_pack_shuffled_both_paths_agree(tmp_path):
    """Shuffled order: coalesced and distributed scans produce identical
    offsets, the stream is a permutation (same token total), and the
    order is NOT the id order (the draw actually shuffles)."""
    texts = [f"{'tok ' * (i % 7 + 1)}" for i in range(40)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")
    outs = []
    for dist in (False, True):
        outs.append(corpus.pack_sequences(str(tmp_path), seq_len=8,
                                          force_distributed=dist,
                                          shuffled=True)
                    .to_pandas().sort_values("doc_id")
                    .reset_index(drop=True))
    assert outs[0].equals(outs[1])
    out = outs[0]
    total = out.n_tokens.sum()
    assert sorted(out.tok_start + out.n_tokens)[-1] == total
    # the id-ordered prefix sum differs from the shuffled one somewhere
    id_ts = out.n_tokens.cumsum() - out.n_tokens
    assert (out.tok_start != id_ts).any()


def test_pack_seq_stats_composition(tmp_path):
    # counts 5, 3, 0, 20, 4 -> starts 0, 5, 8, 8, 28; seq_len=8:
    #   doc0 seqs [0], doc1 [0], doc2 none (empty), doc3 [1,2,3], doc4 [3]
    texts = ["a b c d e", "x y z", "", " ".join(["t"] * 20), "m n o p"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")
    out = (corpus.pack_seq_stats(str(tmp_path), seq_len=8, range_w=2)
           .to_pandas().sort_values("seq_id").reset_index(drop=True))
    assert list(out.seq_id) == [0, 1, 2, 3]
    assert list(out.n_docs) == [2, 1, 1, 2]
    assert list(out.n_starters) == [2, 1, 0, 1]   # doc3 starts in seq 1
    assert list(out.n_crossers) == [0, 1, 1, 0]   # doc3 crosses 1->2->3


def test_pack_seq_stats_matches_oracle_smoke():
    con = make_duckdb(SF_SMOKE)
    assert_matches_oracle(QUERIES["pack_seq_stats"](SF_SMOKE), con,
                          ORACLES["pack_seq_stats"])


def test_pack_bins_bucketed_semantics(tmp_path):
    # token counts 1, 3, 3, 9, 20 with seq_len=16:
    #   slots 1, 4, 4, 16, 16(truncated); bins: 1x(1/16-slot), 1x(2 of 4
    #   slots used of 4-per-bin), 2x(16-slot singleton bins)
    texts = ["a", "a b c", "x y z", " ".join("t" * 1 for _ in range(9)),
             " ".join("u" for _ in range(20))]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")
    out = (corpus.pack_bins_bucketed(str(tmp_path), seq_len=16)
           .to_pandas().set_index("blen").sort_index())
    assert list(out.index) == [1, 4, 16]
    assert list(out.n_docs) == [1, 2, 2]
    assert list(out.n_trunc) == [0, 0, 1]        # the 20-token doc is cut
    assert list(out.n_bins) == [1, 1, 2]
    assert list(out.sum_tokens) == [1, 6, 25]    # 9 + min(20,16)
    assert list(out.waste_tokens) == [15, 10, 7]
    assert (out.fill_ppm
            == out.sum_tokens * 1_000_000 // (out.n_bins * 16)).all()


def test_pack_bins_matches_oracle_smoke():
    con = make_duckdb(SF_SMOKE)
    assert_matches_oracle(QUERIES["pack_bins_bucketed"](SF_SMOKE), con,
                          ORACLES["pack_bins_bucketed"])
