"""Corpus-quality pipelines: text analysis, dedup, similarity search —
the training-data-pipeline operator set over `documents` / `embeddings`."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..stages import ann, cdc, dedup
from ..stages.text import fingerprint, lang_id, text_stats
from ..sources.readers import read_parquet_clean


def _docs(sf_dir: str, columns=("doc_id", "text")) -> ray.data.Dataset:
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=list(columns))


def _docs_count(sf_dir: str) -> int:
    """Corpus row count from parquet metadata (no scan) — feeds the
    near-dup family's spill auto-selection (`pairs.candidate_pairs`)."""
    return pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


def doc_text_stats(sf_dir: str) -> ray.data.Dataset:
    return (_docs(sf_dir)
            .map_batches(text_stats, batch_format="pyarrow", zero_copy_batch=True)
            .select_columns(["doc_id", "n_chars", "n_tokens", "n_punct",
                             "n_digits", "token_ratio", "punct_ratio"]))


def doc_lang_id(sf_dir: str) -> ray.data.Dataset:
    return (_docs(sf_dir)
            .map_batches(lang_id, batch_format="pyarrow", zero_copy_batch=True)
            .select_columns(["doc_id", "lang_pred", "lang_score"]))


def doc_fingerprint(sf_dir: str) -> ray.data.Dataset:
    return (_docs(sf_dir)
            .map_batches(fingerprint, batch_format="pyarrow", zero_copy_batch=True)
            .select_columns(["doc_id", "text_hash"]))


def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    return dedup.exact_dedup(_docs(sf_dir))


def minhash_pairs(sf_dir: str) -> pd.DataFrame:
    return dedup.minhash_dedup_pairs(_docs(sf_dir), threshold=0.8,
                                     docs_hint=_docs_count(sf_dir))


def simhash_pairs(sf_dir: str) -> pd.DataFrame:
    return dedup.simhash_dup_pairs(_docs(sf_dir), max_hamming=3,
                                   docs_hint=_docs_count(sf_dir))


def ngram_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """EXACT 5-gram-Jaccard >= 0.6 pairs via prefix-filtered AllPairs — the
    sixth dedup family member; equals the SQL twin at any threshold by the
    prefix theorem (no LSH recall assumption)."""
    return dedup.jaccard_dedup_pairs(_docs(sf_dir), threshold=0.6,
                                     docs_hint=_docs_count(sf_dir))


WINNOW_PAIR_MIN_SHARED = 4   # pair qualifies at >= this many shared fps
WINNOW_FP_DF_CAP = 8         # drop fingerprints appearing in > this many docs


def winnow_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Winnow-based near-dup pairs — the fifth dedup family member
    (exact / MinHash / SimHash / embedding / winnow): docs sharing ≥
    ``WINNOW_PAIR_MIN_SHARED`` selected fingerprints, after dropping
    fingerprints common to > ``WINNOW_FP_DF_CAP`` docs (boilerplate —
    standard DF cap, mirrored exactly in the SQL twin).

    Shape: distinct (doc, fp) per doc computed in-kernel (a doc never
    spans batches); ONE fp-bucket exchange enumerates within-fingerprint
    pairs vectorized AND partial-counts them per bucket (segment sizes ≤
    the DF cap, so per-fp pair contributions are ≤ C(cap,2)); the partial
    pair table — bounded by the corpus dup structure, not its size — then
    coalesces through a single repartition(1) Arrow group_by, the
    CLAUDE.md small-input finish (no second all-to-all). Ids travel as
    two int64 columns throughout (no packed-key range limits). Related:
    `stages/pairs.py` is the sketch-based candidate machinery (minhash/
    simhash/embedding — max_bucket TRUNCATES hot buckets for recall-bound
    sketches); winnowing instead DROPS over-cap fingerprints entirely (a
    DF cap is a semantic filter mirrored in the SQL twin), hence the
    standalone enumeration here.
    """
    import pyarrow.compute as _pc

    from ..stages.text import winnow_fingerprints

    num_buckets = 256
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "shared": pa.array([], pa.int64())})

    def distinct_fp(b: pa.Table) -> pa.Table:
        t = winnow_fingerprints(b)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        f = t["fp"].to_numpy(zero_copy_only=False)
        order = np.lexsort((f, d))
        d, f = d[order], f[order]
        keep = np.empty(len(d), bool)
        if len(d):
            keep[0] = True
            keep[1:] = (d[1:] != d[:-1]) | (f[1:] != f[:-1])
        d, f = d[keep], f[keep]
        return pa.table({"doc_id": pa.array(d), "fp": pa.array(f),
                         "_bucket": pa.array(f % num_buckets)})

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        f = g["fp"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        if len(f) == 0:
            return empty
        order = np.lexsort((d, f))
        fs, ds_ = f[order], d[order]
        new = np.empty(len(fs), bool)
        new[0] = True
        new[1:] = fs[1:] != fs[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(fs)))
        keep = (sizes >= 2) & (sizes <= WINNOW_FP_DF_CAP)
        pa_, pb_ = [], []
        for s, sz in zip(starts[keep], sizes[keep]):
            seg = ds_[s:s + sz]          # sz ≤ cap: tiny, docs distinct
            a, b2 = np.triu_indices(sz, k=1)
            pa_.append(seg[a])
            pb_.append(seg[b2])
        if not pa_:
            return empty
        a = np.concatenate(pa_)
        b = np.concatenate(pb_)
        # partial count within the bucket (the same pair recurs here when
        # several of its shared fps hash to this bucket)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.empty(len(a), bool)
        new[0] = True
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(a)))
        return pa.table({"id_a": pa.array(a[starts]),
                         "id_b": pa.array(b[starts]),
                         "shared": pa.array(cnt.astype(np.int64))})

    fps = _docs(sf_dir).map_batches(distinct_fp, batch_format="pyarrow",
                                    zero_copy_batch=True)
    partials = fps.groupby("_bucket").map_groups(pairs_in_bucket,
                                                 batch_format="pyarrow")

    # The partial pair table is dup-bounded (per-fp contribution ≤
    # C(cap,2)), so the cross-bucket merge happens driver-side — the
    # near-dup family's bounded-driver convention (union-find in
    # minhash_dedup_corpus) — leaving ONE all-to-all in the whole plan.
    # pandas return: Ray 2.49 drops the schema of ANY zero-row Dataset in
    # to_pandas, so a Dataset could never carry typed-empty to the gate.
    tbls = [t for t in ray.get(partials.to_arrow_refs()) if t.num_columns]
    if not tbls:
        return empty.to_pandas()
    t = (pa.concat_tables(tbls).group_by(["id_a", "id_b"])
         .aggregate([("shared", "sum")]))
    t = pa.table({"id_a": t["id_a"], "id_b": t["id_b"],
                  "shared": t["shared_sum"]})
    return t.filter(_pc.greater_equal(
        t["shared"], pa.scalar(WINNOW_PAIR_MIN_SHARED,
                               pa.int64()))).to_pandas()


def dedup_near_corpus(sf_dir: str) -> ray.data.Dataset:
    """Keep-one near-dup dedup: surviving doc ids (min id per Jaccard-≥0.8
    connected component)."""
    return dedup.minhash_dedup_corpus(_docs(sf_dir), threshold=0.8)


def dedup_near_corpus_distributed(sf_dir: str) -> ray.data.Dataset:
    """Same keep-one dedup through the DISTRIBUTED connected-components
    path (min-label propagation over the pair Dataset) — the extreme-dup-
    rate form, oracle-gated against the identical recursive-CTE twin."""
    return dedup.minhash_dedup_corpus(_docs(sf_dir), threshold=0.8,
                                      distributed_cc=True)


# ------------------------------------------------------- end-to-end curation
CURATE_CHECKPOINT_ROWS = 2_000_000


def _curate_qualify(b: pa.Table, lang: str, min_tokens: int,
                    max_punct: float) -> pa.Table:
    """Stage 1 of curation: language + quality gate (shared by the lazy
    and the manifest-checkpointed flows)."""
    from ..stages.text import lang_id, text_stats

    b = lang_id(text_stats(b))
    keep = pc.and_(
        pc.and_(pc.equal(b["lang_pred"], lang),
                pc.greater_equal(b["n_tokens"], min_tokens)),
        pc.less(b["punct_ratio"], max_punct))
    return b.filter(keep).select(["doc_id", "text", "n_tokens",
                                  "lang_score"])


def curate_docs(ds: ray.data.Dataset, *, lang: str = "en",
                min_tokens: int = 20, max_punct: float = 0.05,
                threshold: float = 0.8, rate: float = 0.5, salt: int = 13,
                docs_hint: int | None = None,
                checkpoint: bool | None = None) -> ray.data.Dataset:
    """The composed LLM-training-data curation flow over a (doc_id, text)
    Dataset — each stage an already-tested operator, chained streaming:

    1. quality + language gate (vectorized RE2 stats, one map_batches);
    2. exact dedup — keep min id per identical text; only (md5, id) pairs
       shuffle, the dup map (bounded by dup clusters) broadcasts back;
    3. near-dup dedup — verified Jaccard-≥``threshold`` pairs → connected
       components → keep each component's min id (drop set broadcast);
    4. deterministic splitmix64 sample at ``rate`` (stable under
       repartition/resume);
    5. project (doc_id, n_tokens, lang_score).

    The filtered corpus feeds three consumers (exact-dedup agg, near-dup
    sketching, the final filter pass). By default it stays lazy — three
    scans of the pruned source, each cheap. At scale (``docs_hint`` >
    ``CURATE_CHECKPOINT_ROWS``, or ``checkpoint=True``) it is spilled to
    parquet once (`stages.pairs.spill_to_parquet` — cluster-visible via
    ``$PYOFS_SPILL_DIR``) so the raw corpus is scanned exactly once and
    nothing is pinned in the object store.
    """
    import ray as _ray

    from ..stages.dedup import (exact_dedup, minhash_dedup_pairs,
                                union_find_components)
    from ..stages.sample import hash_sample
    from ..stages.text import fingerprint, lang_id, text_stats

    filtered = ds.map_batches(
        lambda b: _curate_qualify(b, lang, min_tokens, max_punct),
        batch_format="pyarrow", zero_copy_batch=True)
    if checkpoint or (checkpoint is None
                      and (docs_hint or 0) > CURATE_CHECKPOINT_ROWS):
        from ..stages.pairs import spill_to_parquet
        filtered = spill_to_parquet(filtered)

    # exact-dup map: hashes with >1 member, each with its min id — bounded
    # by dup clusters, so a broadcast (the minhash_dedup_corpus pattern)
    dup_tbl = (exact_dedup(filtered)
               .map_batches(lambda b: b.filter(pc.greater(b["dup_count"], 1)),
                            batch_format="pyarrow")
               .to_pandas())
    if len(dup_tbl):
        dup_ref = _ray.put((pa.array(dup_tbl["text_hash"]),
                            dup_tbl["doc_id"].to_numpy(dtype=np.int64)))

        def drop_exact_dups(b: pa.Table) -> pa.Table:
            hashes, min_ids = _ray.get(dup_ref)
            pos = pc.index_in(fingerprint(b)["text_hash"], value_set=hashes)
            hit = pc.is_valid(pos).to_numpy(zero_copy_only=False)
            idx = (pc.fill_null(pos, 0).to_numpy(zero_copy_only=False)
                   .astype(np.int64))
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            keep = ~hit | (ids == min_ids[idx])
            return b.filter(pa.array(keep))

        survivors = filtered.map_batches(drop_exact_dups,
                                         batch_format="pyarrow")
    else:
        survivors = filtered

    pairs = minhash_dedup_pairs(survivors, threshold, docs_hint=docs_hint)
    comp = union_find_components(pairs)
    near_drop = np.array(sorted(x for x, rep in comp.items() if rep != x),
                         np.int64)
    if len(near_drop):
        drop_ref = _ray.put(pa.array(near_drop, pa.int64()))

        def drop_near_dups(b: pa.Table) -> pa.Table:
            return b.filter(pc.invert(
                pc.is_in(b["doc_id"], value_set=_ray.get(drop_ref))))

        survivors = survivors.map_batches(drop_near_dups,
                                          batch_format="pyarrow")

    return (hash_sample(survivors, "doc_id", rate=rate, salt=salt)
            .map_batches(lambda b: b.select(["doc_id", "n_tokens",
                                             "lang_score"]),
                         batch_format="pyarrow"))


def curate_corpus(sf_dir: str) -> ray.data.Dataset:
    """Registry entry: curate the `documents` table end to end."""
    return curate_docs(_docs(sf_dir), docs_hint=_docs_count(sf_dir))


def curate_docs_checkpointed(sf_dir: str, out_dir: str, *,
                             lang: str = "en", min_tokens: int = 20,
                             max_punct: float = 0.05,
                             threshold: float = 0.8, rate: float = 0.5,
                             salt: int = 13,
                             fail_after: int | None = None
                             ) -> ray.data.Dataset:
    """Manifest-checkpointed curation (VERDICT r4 #5): the same four-stage
    flow as `curate_docs`, with each expensive intermediate committed
    atomically through `state/manifest.py` so a crashed run resumes from
    the last committed stage instead of restarting from zero. Units:

    1. ``filtered`` — the quality/language-gated corpus parquet. This is
       the ONLY stage that scans the raw corpus; every later stage (and
       every restart) reads this checkpoint.
    2. ``exact_dup_map`` — (text_hash, doc_id, dup_count>1) exact-dup map.
    3. ``near_drop`` — near-dup drop ids (MinHash pairs → components →
       non-representative members).
    4. ``curated`` — the final sampled projection.

    ``fail_after=N`` injects a crash after N commits (kill/restart test,
    same contract as `run_partitioned`). Returns the curated Dataset read
    from the committed output; results are bit-identical to
    `curate_docs` on the same inputs (asserted in tests/test_resume.py).
    """
    import ray as _ray

    from ..sources.readers import read_parquet_clean as _rpc
    from ..state.manifest import Manifest, write_and_commit
    from ..stages.dedup import (exact_dedup, minhash_dedup_pairs,
                                union_find_components)
    from ..stages.sample import hash_sample
    from ..stages.text import fingerprint

    man = Manifest(out_dir)
    ran = 0

    def read_ckpt(unit: str, empty_schema: pa.Schema) -> pa.Table:
        """Committed-unit readback tolerant of EMPTY partitions (an empty
        Dataset may commit a file-less directory)."""
        import os
        d = f"{out_dir}/{unit}"
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        if not files:
            return empty_schema.empty_table()
        return pq.read_table(d)

    def pending(unit: str) -> bool:
        return unit not in man.committed()

    def guard() -> None:
        if fail_after is not None and ran >= fail_after:
            raise RuntimeError(f"injected failure after {ran} commits")

    if pending("filtered"):
        guard()
        write_and_commit(
            man, out_dir, "filtered",
            _docs(sf_dir).map_batches(
                lambda b: _curate_qualify(b, lang, min_tokens, max_punct),
                batch_format="pyarrow", zero_copy_batch=True),
            f"qualify(lang={lang},min_tokens={min_tokens},"
            f"max_punct={max_punct})")
        ran += 1
    filtered = _rpc(f"{out_dir}/filtered")

    if pending("exact_dup_map"):
        guard()
        write_and_commit(
            man, out_dir, "exact_dup_map",
            exact_dedup(filtered).map_batches(
                lambda b: b.filter(pc.greater(b["dup_count"], 1)),
                batch_format="pyarrow"),
            "exact_dedup(md5 min-id, dup clusters only)")
        ran += 1
    dup_tbl = read_ckpt("exact_dup_map", pa.schema(
        [("text_hash", pa.string()), ("doc_id", pa.int64()),
         ("dup_count", pa.int64())])).to_pandas()

    if len(dup_tbl):
        dup_ref = _ray.put((pa.array(dup_tbl["text_hash"]),
                            dup_tbl["doc_id"].to_numpy(dtype=np.int64)))

        def drop_exact_dups(b: pa.Table) -> pa.Table:
            hashes, min_ids = _ray.get(dup_ref)
            pos = pc.index_in(fingerprint(b)["text_hash"], value_set=hashes)
            hit = pc.is_valid(pos).to_numpy(zero_copy_only=False)
            idx = (pc.fill_null(pos, 0).to_numpy(zero_copy_only=False)
                   .astype(np.int64))
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            keep = ~hit | (ids == min_ids[idx])
            return b.filter(pa.array(keep))

        survivors = filtered.map_batches(drop_exact_dups,
                                         batch_format="pyarrow")
    else:
        survivors = filtered

    if pending("near_drop"):
        guard()
        comp = union_find_components(
            minhash_dedup_pairs(survivors, threshold))
        near = np.array(sorted(x for x, rep in comp.items() if rep != x),
                        np.int64)
        write_and_commit(
            man, out_dir, "near_drop",
            ray.data.from_arrow(pa.table({"doc_id": pa.array(near)})),
            f"minhash_pairs(tau={threshold})→components→non-reps")
        ran += 1
    near_tbl = read_ckpt("near_drop",
                         pa.schema([("doc_id", pa.int64())]))

    if near_tbl.num_rows:
        drop_ref = _ray.put(near_tbl["doc_id"].combine_chunks())

        def drop_near_dups(b: pa.Table) -> pa.Table:
            return b.filter(pc.invert(
                pc.is_in(b["doc_id"], value_set=_ray.get(drop_ref))))

        survivors = survivors.map_batches(drop_near_dups,
                                          batch_format="pyarrow")

    if pending("curated"):
        guard()
        write_and_commit(
            man, out_dir, "curated",
            hash_sample(survivors, "doc_id", rate=rate, salt=salt)
            .map_batches(lambda b: b.select(["doc_id", "n_tokens",
                                             "lang_score"]),
                         batch_format="pyarrow"),
            f"hash_sample(rate={rate},salt={salt})+project")
        ran += 1
    return _rpc(f"{out_dir}/curated")


NUM_QUERIES = 8
TOPK = 5


def _query_vectors(sf_dir: str) -> pa.Table:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return t.filter(pa.compute.less(t["vec_id"], NUM_QUERIES)).combine_chunks()


def ann_topk(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return ann.ann_topk_brute(ds, _query_vectors(sf_dir), k=TOPK)


def ann_topk_quantized(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    return ann.ann_topk_quantized(ds, _query_vectors(sf_dir), k=TOPK)


def ann_topk_lsh(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    # corpus_rows from parquet METADATA: ds.count() on the cleaned read
    # would execute a full scan just to size the bands
    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    return ann.ann_topk_lsh(ds, _query_vectors(sf_dir), k=TOPK, corpus_rows=n)


ANN_TOPK_SQL = f"""
SELECT query_id, vec_id, rank FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                      e.vec_id ASC) AS rank
  FROM embeddings e
  CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {NUM_QUERIES}) q
  WHERE e.vec_id != q.vec_id
) WHERE rank <= {TOPK}
"""


def ann_hybrid_fusion(sf_dir: str) -> pd.DataFrame:
    """Hybrid retrieval: Borda-fuse the DENSE ranking (exact cosine
    top-k, `ann_topk`) with a second deterministic ranking (label
    affinity — the stand-in for a sparse/metadata scorer: candidates
    ranked by |label − query_label| ASC, vec_id ASC). Each list
    contributes ``TOPK+1 − rank`` integer points; fused rank orders by
    (points DESC, vec_id ASC). All-integer fusion → bit-exact twin.

    Scale shape: BOTH rankings stream the corpus once with per-batch
    partial top-k against the broadcast query set (`_finish_topk`), so
    only Q×k rows per ranking reach the driver; the fusion itself is a
    Q×2k-row combine."""
    cos = ann_topk(sf_dir)

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "label"])
    qt = qt.filter(pa.compute.less(qt["vec_id"], NUM_QUERIES))
    qids = qt["vec_id"].to_numpy().astype(np.int64)
    qlabels = qt["label"].to_numpy().astype(np.int64)

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "label"])

    def probe(b: pa.Table) -> pa.Table:
        vids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = -np.abs(lab[:, None] - qlabels[None, :])  # higher = closer
        k = min(TOPK + 1, len(vids))
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[1]):
            order = np.lexsort((vids, -sims[:, qi]))[:k]
            out_q.append(np.full(len(order), qids[qi], np.int64))
            out_v.append(vids[order])
            out_s.append(sims[order, qi])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "sim": pa.array(np.concatenate(out_s)),
        })

    lab_rank = ann._finish_topk(
        ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True),
        TOPK, exclude_self=True)

    pts = TOPK + 1
    u = pd.concat([
        cos.assign(pts=pts - cos["rank"]),
        lab_rank.assign(pts=pts - lab_rank["rank"]),
    ])[["query_id", "vec_id", "pts"]]
    g = (u.groupby(["query_id", "vec_id"], as_index=False).pts.sum()
         .rename(columns={"pts": "borda"}))
    g = g.sort_values(["query_id", "borda", "vec_id"],
                      ascending=[True, False, True], kind="mergesort")
    g["rank"] = g.groupby("query_id", sort=False).cumcount() + 1
    out = g[g["rank"] <= TOPK].reset_index(drop=True)
    return out.astype({"query_id": "int64", "vec_id": "int64",
                       "borda": "int64", "rank": "int64"})


ANN_HYBRID_FUSION_SQL = f"""
WITH q AS (
  SELECT vec_id, embedding, label FROM embeddings
  WHERE vec_id < {NUM_QUERIES}
), cosr AS (
  SELECT query_id, vec_id, rank FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                      e.vec_id ASC) AS rank
    FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.vec_id
  ) WHERE rank <= {TOPK}
), labr AS (
  SELECT query_id, vec_id, rank FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ABS(e.label - q.label) ASC, e.vec_id ASC) AS rank
    FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.vec_id
  ) WHERE rank <= {TOPK}
), u AS (
  SELECT query_id, vec_id, {TOPK + 1} - rank AS pts FROM cosr
  UNION ALL
  SELECT query_id, vec_id, {TOPK + 1} - rank AS pts FROM labr
), b AS (
  SELECT query_id, vec_id, CAST(SUM(pts) AS BIGINT) AS borda
  FROM u GROUP BY 1, 2
)
SELECT query_id, vec_id, borda, CAST(rn AS BIGINT) AS rank FROM (
  SELECT query_id, vec_id, borda,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY borda DESC, vec_id ASC) AS rn
  FROM b
) WHERE rn <= {TOPK}
"""


def embedding_dup_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs over the embeddings table (the corpus
    has no true dups at τ=0.95 — injected-dup behavior is unit-tested)."""
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    return ann.embedding_dup_pairs(ds, threshold=0.95, docs_hint=n)


def ann_topk_ivf(sf_dir: str) -> pd.DataFrame:
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    return ann.ann_topk_ivf(ds, _query_vectors(sf_dir), k=TOPK, nprobe=6,
                            corpus_rows=n)


TOP_TOKENS_K = 25


def top_tokens(sf_dir: str, k: int = TOP_TOKENS_K) -> ray.data.Dataset:
    """Corpus heavy hitters: top-k whitespace tokens by global count
    (ties broken token-ascending). Classic vocabulary/boilerplate audit.

    Scale shape: per-batch Arrow group_by compresses each block to its
    distinct tokens before the ONE vocab-bounded exchange; the finish is
    per-block partial top-k (any global top-k row is necessarily inside
    its block's top-k under the same total order) coalesced into a single
    bounded k-row reduce — no sort all-to-all."""
    ds = _docs(sf_dir, columns=("text",))

    def partial_counts(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(b["text"], r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        g = pa.table({"token": toks}).group_by("token").aggregate(
            [("token", "count")])
        return pa.table({"token": g["token"],
                         "cnt": g["token_count"].cast(pa.int64())})

    from ray.data.aggregate import Sum
    counts = (ds.map_batches(partial_counts, batch_format="pyarrow",
                             zero_copy_batch=True)
                .groupby("token").aggregate(Sum("cnt", alias_name="n")))

    def topk(b: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            b, sort_keys=[("n", "descending"), ("token", "ascending")])
        return b.take(idx[:k]).select(["token", "n"])

    return (counts.map_batches(topk, batch_format="pyarrow")
                  .repartition(1)
                  .map_batches(topk, batch_format="pyarrow"))


def doc_classifier_score(sf_dir: str) -> ray.data.Dataset:
    """Model-based quality filtering (the fastText-classifier stage of
    CCNet / FineWeb): feature-hashed linear scorer over whitespace tokens,
    keep = score ≥ 0. One streaming scan, zero exchanges — the classifier
    weights derive from the token hash itself (`stages/text._token_weight`),
    so no model artifact ships; a learned table would broadcast via
    ray.put with the identical per-batch kernel."""
    from ..stages.text import linear_classifier_score

    return _docs(sf_dir).map_batches(linear_classifier_score,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True)


CLASSIFIER_SCORE_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS token
  FROM documents
), w AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % 2001 - 1000
             AS wt
  FROM toks WHERE token <> ''
), g AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(wt) AS BIGINT) AS score
  FROM w GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(g.n_tokens, 0) AS n_tokens,
       COALESCE(g.score, 0) AS score, COALESCE(g.score, 0) >= 0 AS keep
FROM documents d LEFT JOIN g USING (doc_id)
"""


TOP_TOKENS_SQL = f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(text, '\\s+')) AS token FROM documents
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM toks WHERE token <> ''
GROUP BY token ORDER BY n DESC, token ASC LIMIT {TOP_TOKENS_K}
"""


SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}
SPLIT_SALT = 23
CONTAM_TAU = 0.6


def split_contamination(sf_dir: str) -> pd.DataFrame:
    """Train/eval contamination audit: exact-Jaccard near-dup pairs that
    CROSS split boundaries (a train doc near-duplicating a val/test doc
    leaks eval data into training). Composes the prefix-filtered AllPairs
    join with the deterministic hash splits; the split label is a pure
    function of doc_id, so it attaches to the pair-bounded result with a
    vectorized kernel — no corpus join, no extra exchange."""
    from ..stages.sample import split_labels

    pairs = dedup.jaccard_dedup_pairs(_docs(sf_dir), threshold=CONTAM_TAU,
                                      docs_hint=_docs_count(sf_dir))
    sa = split_labels(pairs["id_a"].to_numpy(), SPLITS, SPLIT_SALT)
    sb = split_labels(pairs["id_b"].to_numpy(), SPLITS, SPLIT_SALT)
    pairs = pairs.assign(split_a=sa, split_b=sb)
    return (pairs[sa != sb]
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


def dedup_near_corpus_keep_best(sf_dir: str) -> ray.data.Dataset:
    """Keep-best near-dup dedup: per Jaccard-≥0.8 component keep the
    longest doc (n_chars, ties min id) — the curation rule real pipelines
    prefer over keep-min-id."""
    docs = _docs(sf_dir, columns=("doc_id", "text", "n_chars"))
    return dedup.minhash_dedup_corpus_keep_best(
        docs, threshold=0.8, docs_hint=_docs_count(sf_dir))


def corpus_lang_report(sf_dir: str) -> ray.data.Dataset:
    """Per-language curation dashboard: doc count, char volume, token and
    stopword totals, mean length and corpus-level stopword ratio — the
    summary a data curator reads before setting per-language sampling
    rates. One skew-tolerant exchange (per-batch Arrow partials over lang);
    every float derives from exact int64 sums by a single IEEE division."""
    from ..stages.text import quality_scores

    ds = _docs(sf_dir, columns=("doc_id", "text", "lang"))

    def partial(b: pa.Table) -> pa.Table:
        q = quality_scores(b)
        t = pa.table({"lang": b["lang"],
                      "n_chars": pc.utf8_length(b["text"]).cast(pa.int64()),
                      "n_tokens": q["n_tokens"],
                      "n_stopwords": q["n_stopwords"]})
        g = t.group_by("lang").aggregate(
            [("n_chars", "sum"), ("n_tokens", "sum"),
             ("n_stopwords", "sum"), ("lang", "count")])
        return pa.table({"lang": g["lang"],
                         "chars": g["n_chars_sum"].cast(pa.int64()),
                         "toks": g["n_tokens_sum"].cast(pa.int64()),
                         "stops": g["n_stopwords_sum"].cast(pa.int64()),
                         "cnt": g["lang_count"].cast(pa.int64())})

    from ray.data.aggregate import Sum
    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby("lang")
             .aggregate(Sum("chars", alias_name="n_chars_sum"),
                        Sum("toks", alias_name="n_tokens_sum"),
                        Sum("stops", alias_name="n_stopwords_sum"),
                        Sum("cnt", alias_name="doc_count")))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "lang": b["lang"], "doc_count": b["doc_count"],
            "n_chars_sum": b["n_chars_sum"],
            "n_tokens_sum": b["n_tokens_sum"],
            "n_stopwords_sum": b["n_stopwords_sum"],
            "mean_chars": pc.divide(
                pc.cast(b["n_chars_sum"], pa.float64()),
                pc.cast(b["doc_count"], pa.float64())),
            "stopword_ratio": pc.divide(
                pc.cast(b["n_stopwords_sum"], pa.float64()),
                pc.cast(pc.add(b["n_tokens_sum"],
                               pa.scalar(1, pa.int64())), pa.float64())),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


# -------------------------- Zipfian-vocabulary exact Jaccard (scale form)
# The driver fixture's word-salad corpus SATURATES its gram vocabulary at
# sf0.1, degenerating ANY exact inverted-index join (round-3 note). This
# variant synthesizes a Zipf-shaped vocabulary from doc ids — half the
# positions draw a HEAD token (64-word boilerplate vocabulary → high-df
# grams the prefix filter must exclude), half draw a TAIL token (uniform
# over 2^20 → the long df≈1 gram tail the AllPairs prefix exploits; a
# head-only vocabulary re-creates the saturation bug: every prefix bucket
# goes hot and candidates grow quadratically). Exact-copy dups are seeded
# (doc_id % 41 == 0 re-emitted at +1e9) so the pair set is non-empty and
# known by construction: the oracle is pure id arithmetic.
ZIPF_TOKENS_PER_DOC = 48
ZIPF_HEAD_VOCAB = 64
ZIPF_TAIL_VOCAB = 1 << 20
ZIPF_SEED_MOD = 41
ZIPF_SEED_OFFSET = 1_000_000_000

_B36 = np.frombuffer(b"0123456789abcdefghijklmnopqrstuvwxyz", np.uint8)


def _b36_tokens(vals: np.ndarray, width: int = 5) -> np.ndarray:
    """Base-36 token strings (vectorized): digit-only tokens would fold the
    byte-5-gram space to ~10^5 combos and saturate it at bench scale (the
    exact bug this corpus exists to avoid); 36^5 ≈ 60M keeps tail grams at
    df≈1. Width 5 ⇒ each token is itself one 5-gram plus 4 token-crossing
    grams with its successor."""
    out = np.empty((len(vals), width), np.uint8)
    v = vals.astype(np.int64).copy()
    for i in range(width - 1, -1, -1):
        out[:, i] = _B36[v % 36]
        v //= 36
    return out.view(f"S{width}").ravel()


def zipf_text_batch(b: pa.Table) -> pa.Table:
    """Deterministic Zipf-ish synthetic text per doc_id + seeded dup copies
    (single scan, copies appended in-batch like the embedding seeding)."""
    from ..core.hashing import splitmix64

    ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    j = np.arange(ZIPF_TOKENS_PER_DOC, dtype=np.uint64)
    keys = ids.astype(np.uint64)[:, None] * np.uint64(64) + j[None, :]
    h = splitmix64(keys.ravel())
    head = ((h >> np.uint64(1)) % np.uint64(ZIPF_HEAD_VOCAB)).astype(np.int64)
    tail = (ZIPF_HEAD_VOCAB
            + ((h >> np.uint64(7)) % np.uint64(ZIPF_TAIL_VOCAB)).astype(np.int64))
    tok = np.where((h & np.uint64(1)).astype(bool), head, tail)
    words = _b36_tokens(tok).reshape(n, ZIPF_TOKENS_PER_DOC)
    sp = np.full((n, ZIPF_TOKENS_PER_DOC), b" ", dtype="S1")
    sp[:, -1] = b""
    joined = np.char.add(words, sp).view(
        f"S{ZIPF_TOKENS_PER_DOC * 6}").ravel()
    texts = pa.array(joined.astype("U"))
    mask = ids % ZIPF_SEED_MOD == 0
    out_ids = np.concatenate([ids, ids[mask] + ZIPF_SEED_OFFSET])
    out_txt = pa.concat_arrays([texts, texts.take(pa.array(np.flatnonzero(mask)))])
    return pa.table({"doc_id": pa.array(out_ids), "text": out_txt})


def ngram_jaccard_pairs_zipf(sf_dir: str) -> pd.DataFrame:
    """Exact n-gram Jaccard over the Zipfian corpus via the DISTRIBUTED
    prefix path (partial-df + bucketed join + doc-keyed prefix groups) —
    the 100 TB shape the saturated fixture can't exercise; benched at
    sf0.1 where the broadcast-vocab variants are gated out."""
    ds = (_docs(sf_dir, columns=("doc_id",))
          .map_batches(zipf_text_batch, batch_format="pyarrow"))
    n = _docs_count(sf_dir)
    return dedup.jaccard_dedup_pairs(ds, threshold=0.8,
                                     distributed_prefix=True,
                                     docs_hint=n + n // ZIPF_SEED_MOD + 1)


DISTINCTIVE_K = 3


def doc_distinctive_terms(sf_dir: str, k: int = DISTINCTIVE_K) -> ray.data.Dataset:
    """TF-IDF-style distinctive terms: per doc, the top-k whitespace
    tokens by (tf DESC, df ASC, token ASC) — see `stages/tfidf.py` for
    the two-exchange scale shape and the pure-integer ranking rationale."""
    from ..stages.tfidf import distinctive_terms
    return distinctive_terms(_docs(sf_dir), k=k)


DISTINCTIVE_TERMS_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE token <> '' GROUP BY doc_id, token
), df AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, token FROM toks WHERE token <> '')
  GROUP BY token
), ranked AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.token ASC)
             AS rn
  FROM tf JOIN df USING (token)
)
SELECT doc_id, token, tf, df FROM ranked WHERE rn <= {DISTINCTIVE_K}
"""


def doc_token_surprisal(sf_dir: str) -> ray.data.Dataset:
    """Per-document integer surprisal ``Σ tf · bitlen(N // df)`` — the
    corpus-statistics doc-quality score (PyOFS ranks fields against
    dataset-wide statistics the same way; here the statistic is the
    global document frequency). See `stages/tfidf.token_surprisal` for
    the partials-only two-exchange shape."""
    from ..stages.tfidf import token_surprisal
    return token_surprisal(_docs(sf_dir), _docs_count(sf_dir))


TOKEN_SURPRISAL_SQL = """
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE token <> '' GROUP BY doc_id, token
), df AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
), w AS (
  SELECT token, CAST(LENGTH(BIN(n.n // df.df)) AS BIGINT) AS w
  FROM df CROSS JOIN n
)
SELECT tf.doc_id,
       CAST(SUM(tf.tf * w.w) AS BIGINT) AS surprisal,
       CAST(SUM(tf.tf) AS BIGINT) AS total_tf,
       CAST(COUNT(*) AS BIGINT) AS n_terms
FROM tf JOIN w USING (token)
GROUP BY tf.doc_id
"""


BIGRAM_K = 3


def doc_bigram_successors(sf_dir: str, k: int = BIGRAM_K
                          ) -> ray.data.Dataset:
    """Bigram-LM successor counts: for every token, its top-k next-tokens
    with exact counts. See `stages/tfidf.bigram_successors` for the
    single-exchange shape."""
    from ..stages.tfidf import bigram_successors
    return bigram_successors(_docs(sf_dir), k=k)


BIGRAM_SUCCESSORS_SQL = f"""
WITH raw AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(text, '\\s+')) AS tok,
         UNNEST(range(1, len(regexp_split_to_array(text, '\\s+')) + 1))
           AS ord
  FROM documents
), toks AS (
  SELECT doc_id, tok,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ord) AS pos
  FROM raw WHERE tok <> ''
), big AS (
  SELECT a.tok AS token, b.tok AS next_token,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2
)
SELECT token, next_token, n, CAST(rn AS BIGINT) AS rank FROM (
  SELECT token, next_token, n,
         ROW_NUMBER() OVER (PARTITION BY token
                            ORDER BY n DESC, next_token ASC) AS rn
  FROM big
) WHERE rn <= {BIGRAM_K}
"""


# ------------------------------------------------- boilerplate prefixes
PREFIX_K = 48        # chars of shared head that define a cluster
PREFIX_SEED_MOD = 5  # every 5th doc gets a same-prefix copy injected


def doc_prefix_clusters(sf_dir: str, k: int = PREFIX_K) -> ray.data.Dataset:
    """Boilerplate-prefix clustering: documents sharing their first ``k``
    characters (template pages, mirrored headers — the cheap precursor to
    MinHash when dup pages share a generated preamble). The dup-free
    fixture would make this vacuous, so — like `dedup_canonical_url` —
    the query SEEDS deterministic same-prefix copies (every
    ``PREFIX_SEED_MOD``-th doc, new id ``doc_id + N``, a changed tail)
    inside both the Ray pipeline and the SQL twin.

    Scale shape: prefix extraction + seed expansion per batch, ONE
    string-keyed `bucketed_group_agg` (count + min id), cluster filter.
    Output rows are cluster-bounded."""
    from ..stages.agg import bucketed_group_agg

    n = _docs_count(sf_dir)
    ds = _docs(sf_dir)

    def seed_and_prefix(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        copies = b.filter(pa.array(did % PREFIX_SEED_MOD == 0))
        all_ids = pa.concat_arrays([
            b["doc_id"].combine_chunks().cast(pa.int64()),
            pa.array(copies["doc_id"].to_numpy(zero_copy_only=False)
                     .astype(np.int64) + n)])
        all_text = pa.concat_arrays([
            b["text"].combine_chunks(),
            pc.binary_join_element_wise(
                copies["text"].combine_chunks(), " copytail",
                null_handling="skip")])
        prefix = pc.utf8_slice_codeunits(all_text, 0, k)
        return pa.table({
            "prefix": prefix, "doc_id": all_ids,
            "one": pa.array(np.ones(len(all_ids), np.int64)),
        })

    agg = bucketed_group_agg(
        ds.map_batches(seed_and_prefix, batch_format="pyarrow"),
        ["prefix"],
        [("one", "sum", "n_docs"), ("doc_id", "min", "min_doc")])
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_docs"], 2)),
        batch_format="pyarrow")


DOC_PREFIX_CLUSTERS_SQL = f"""
WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
alldocs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + nn.n, text || ' copytail'
  FROM documents CROSS JOIN nn WHERE doc_id % {PREFIX_SEED_MOD} = 0
)
SELECT SUBSTR(text, 1, {PREFIX_K}) AS prefix,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc
FROM alldocs
GROUP BY 1 HAVING COUNT(*) >= 2
"""


def doc_clean(sf_dir: str) -> ray.data.Dataset:
    """Normalization + stopword-removal pass over the corpus (training-
    data prep: the transform every LLM pipeline runs before tokenization).
    Stateless vectorized map_batches — see `stages/text.normalize_clean`."""
    from ..stages.text import normalize_clean
    return _docs(sf_dir).map_batches(normalize_clean,
                                     batch_format="pyarrow")


def _clean_stoplist_sql() -> str:
    from ..stages.text import CLEAN_STOPWORDS
    return ", ".join(f"'{w}'" for w in CLEAN_STOPWORDS)


DOC_CLEAN_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(
           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                        ' '),
           x -> x NOT IN ({_clean_stoplist_sql()})) AS kept
  FROM documents
)
SELECT doc_id, array_to_string(kept, ' ') AS clean_text,
       CAST(len(kept) AS BIGINT) AS n_kept_tokens
FROM toks
"""


_PII_SUFFIXES = (" contact bob@example.com now",
                 " server at 10.1.2.3 replied",
                 " mail ann.lee+x@sub.domain.org or 192.168.0.255 end",
                 "")


def doc_redact(sf_dir: str) -> ray.data.Dataset:
    """PII redaction over the corpus. The fixture corpus carries no PII,
    so the query seeds deterministic emails/IPs by doc_id % 4 on BOTH
    gate sides (like the seeded embedding dups) — the redaction kernel
    itself is `stages/text.redact_pii`."""
    import numpy as np

    from ..stages.text import redact_pii
    suffixes = np.array(_PII_SUFFIXES)

    def seed_and_redact(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        text = b["text"].combine_chunks() if isinstance(
            b["text"], pa.ChunkedArray) else b["text"]
        seeded = pc.binary_join_element_wise(
            text, pa.array(suffixes[d % 4]), "")
        return redact_pii(b.set_column(
            b.schema.get_field_index("text"), "text", seeded))

    return _docs(sf_dir).map_batches(seed_and_redact,
                                     batch_format="pyarrow")


def _doc_redact_sql() -> str:
    from ..stages.text import EMAIL_RE, IPV4_RE
    cases = "\n".join(
        f"           WHEN {i} THEN '{s.replace(chr(39), chr(39)*2)}'"
        for i, s in enumerate(_PII_SUFFIXES[:3]))
    return f"""
WITH seeded AS (
  SELECT doc_id,
         text || CASE doc_id % 4
{cases}
           ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                      '{IPV4_RE}', '<IP>', 'g') AS redacted_text,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT) AS n_ips
FROM seeded
"""


DOC_REDACT_SQL = _doc_redact_sql()


# ---------------------------------------------- geo-constrained ANN (r4)

BBOX_W, BBOX_E = -90_000, 90_000   # milli-degrees
BBOX_S, BBOX_N = -45_000, 45_000


def ann_topk_bbox(sf_dir: str) -> pd.DataFrame:
    """Geo-constrained exact top-k: candidates restricted to embeddings
    whose page geocodes inside a bbox (the graft's geospatial × webtext
    fusion — 'similar pages NEAR here'). Query vectors stay unrestricted.

    Scale shape: the in-bbox id set comes from the geocode pipeline as a
    Dataset (never the driver) and meets the embeddings in ONE bucketed
    semi-join exchange (`join.bucketed_hash_join(join_type="semi")` —
    the is_in-mask form carries the list<float> payload Acero refuses);
    the filtered base then streams through the brute top-k probe against
    the broadcast query matrix.
    """
    from ..pipelines import flagship
    from ..stages.join import bucketed_hash_join

    ids = (flagship.geocoded_pages(sf_dir)
           .map_batches(_bbox_ids, batch_format="pyarrow"))
    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    in_bbox = bucketed_hash_join(emb, ids, key="vec_id", join_type="semi")
    return ann.ann_topk_brute(in_bbox, _query_vectors(sf_dir), k=TOPK,
                              exclude_self=True)


def _bbox_ids(b: "pa.Table") -> "pa.Table":
    import pyarrow.compute as _pc
    lon, lat = b["lon_milli"], b["lat_milli"]
    keep = _pc.and_(
        _pc.and_(_pc.greater_equal(lon, BBOX_W), _pc.less_equal(lon, BBOX_E)),
        _pc.and_(_pc.greater_equal(lat, BBOX_S), _pc.less_equal(lat, BBOX_N)))
    return pa.table({"vec_id": b["page_key"].filter(keep).cast(pa.int64())})


ANN_TOPK_BBOX_SQL = """
SELECT query_id, vec_id, rank FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                      e.vec_id ASC) AS rank
  FROM (
    SELECT em.* FROM embeddings em
    JOIN (SELECT page_key FROM pages
          WHERE lon_milli BETWEEN {w} AND {e}
            AND lat_milli BETWEEN {s} AND {n}) p
      ON em.vec_id = p.page_key
  ) e
  CROSS JOIN (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id < {nq}) q
  WHERE e.vec_id != q.vec_id
) WHERE rank <= {k}
"""


# --------------------------------------------- percentile length outliers
OUTLIER_PCT = 99  # integer percent: threshold = min v with 100·cum ≥ pct·N


def doc_length_outliers(sf_dir: str, pct: int = OUTLIER_PCT
                        ) -> ray.data.Dataset:
    """Documents longer than the corpus's exact ``pct``-th length
    percentile (the distribution-aware form of a fixed length cutoff —
    PyOFS filters fields by DOP/quality thresholds the same way, e.g.
    `hf_radar.py:136-173`; here the cutoff is derived from the data).

    Scale shape: pass 1 collapses the corpus to its length HISTOGRAM
    (two-stage count per distinct n_chars — value-bounded, never
    row-bounded); the threshold (smallest v with ``100·cumcount ≥
    pct·N`` — all-integer, no float percentile) is a one-row driver pull.
    Pass 2 streams the corpus once more with a broadcast scalar filter.
    Output is outlier-bounded (~(100-pct)% of rows)."""
    from ..stages.agg import two_stage_cell_agg

    ds = _docs(sf_dir, columns=("doc_id", "n_chars"))
    hist = two_stage_cell_agg(ds, keys=("n_chars",), int_sum_cols=(),
                              count_name="cnt")
    hdf = hist.to_pandas()  # value-bounded: distinct lengths, not rows
    hdf = hdf.sort_values("n_chars")
    cum = hdf.cnt.to_numpy(np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return ds.filter(lambda _: False)
    pos = int(np.searchsorted(100 * cum, pct * n))
    thr = int(hdf.n_chars.to_numpy()[pos])

    def filt(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["n_chars"], thr))

    return ds.map_batches(filt, batch_format="pyarrow",
                          zero_copy_batch=True)


def doc_length_outliers_sql(pct: int = OUTLIER_PCT) -> str:
    return f"""
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
h AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY 1),
cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cc FROM h),
thr AS (SELECT MIN(v) AS t FROM cum CROSS JOIN n
        WHERE 100 * cc >= {pct} * n.n)
SELECT doc_id, n_chars FROM documents CROSS JOIN thr
WHERE n_chars > thr.t"""


# ------------------------------------------------- length-weighted sample
WSAMPLE_CAP = 2000      # chars at which the keep rate saturates
WSAMPLE_PER_UNIT = 131  # ≈ 25% keep rate at the cap (2000·131 / 2^20)
WSAMPLE_SALT = 41


def doc_weighted_sample(sf_dir: str) -> ray.data.Dataset:
    """Length-proportional corpus sampling: a document's keep probability
    grows with ``n_chars`` up to a cap — the deterministic splitmix64
    variant of importance sampling by content volume."""
    from ..stages.sample import weighted_hash_sample

    ds = _docs(sf_dir, columns=("doc_id", "lang", "n_chars"))
    return weighted_hash_sample(ds, "doc_id", "n_chars",
                                cap=WSAMPLE_CAP, per_unit=WSAMPLE_PER_UNIT,
                                salt=WSAMPLE_SALT)


def doc_weighted_sample_sql() -> str:
    from ..core.sqlgen_sample import weighted_sample_sql
    return weighted_sample_sql(
        "documents", "doc_id", "n_chars",
        cap=WSAMPLE_CAP, per_unit=WSAMPLE_PER_UNIT, salt=WSAMPLE_SALT,
        select="doc_id, lang, n_chars")


RETRIEVAL_QUERY = ("column", "dup", "join", "merge")  # head + one rare term
RETRIEVAL_K = 20


def doc_sparse_retrieval(sf_dir: str):
    """Lexical top-k retrieval for a fixed query — the sparse complement
    of the dense ANN / hybrid-fusion rankers: integer-exact BM25-style
    score Σ tf·bitlen(N/df) (see `stages/tfidf.sparse_query_topk`)."""
    from ..stages.tfidf import sparse_query_topk
    return sparse_query_topk(_docs(sf_dir), RETRIEVAL_QUERY,
                             _docs_count(sf_dir), k=RETRIEVAL_K)


def split_balance(sf_dir: str) -> ray.data.Dataset:
    """Split-assignment audit: per (split, lang) doc counts and char
    volume — the sanity table checked after any re-split (are strata
    represented proportionally in train/val/test?). Split label is a pure
    function of doc_id; ≤ |splits|·|langs| keys, per-batch partials."""
    from ..stages.sample import split_labels

    ds = _docs(sf_dir, columns=("doc_id", "lang", "n_chars"))

    def partial(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "split": pa.array(split_labels(ids, SPLITS, SPLIT_SALT)),
            "lang": b["lang"],
            "nc": b["n_chars"].cast(pa.int64()),
            "one": pa.array(np.ones(len(b), np.int64)),
        })
        g = t.group_by(["split", "lang"]).aggregate(
            [("nc", "sum"), ("one", "sum")])
        return pa.table({"split": g["split"], "lang": g["lang"],
                         "nc": g["nc_sum"].combine_chunks().cast(pa.int64()),
                         "one": g["one_sum"].combine_chunks()
                                 .cast(pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["split", "lang"]).sum(["nc", "one"]))

    def finish(b: pa.Table) -> pa.Table:
        s = b["sum(nc)"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["sum(one)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"split": b["split"], "lang": b["lang"],
                         "doc_count": pa.array(c),
                         "n_chars_sum": pa.array(s),
                         "mean_chars": pa.array(s.astype(np.float64)
                                                / c.astype(np.float64))})

    return agg.map_batches(finish, batch_format="pyarrow")


def _corpus_token_total(sf_dir: str) -> int:
    """Total non-empty token count — one slim pre-scan (the N of PMI)."""
    import pyarrow.compute as pc

    def cnt(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(b["text"], r"\s+")
        flat = pc.list_flatten(toks)
        n = pc.sum(pc.not_equal(flat, "").cast(pa.int64())).as_py() or 0
        return pa.table({"n": pa.array([n], pa.int64())})

    return int(_docs(sf_dir, columns=("text",))
               .map_batches(cnt, batch_format="pyarrow").sum("n"))


def doc_bigram_collocations(sf_dir: str):
    """Top-k PMI-ordered collocations (integer cross-multiplied score —
    see `stages/tfidf.bigram_collocations`)."""
    from ..stages.tfidf import bigram_collocations

    return bigram_collocations(_docs(sf_dir), _corpus_token_total(sf_dir))


def lang_confusion(sf_dir: str) -> ray.data.Dataset:
    """Language-ID confusion matrix: labeled ``lang`` × predicted
    ``lang_pred`` counts — the model-evaluation composition every
    classifier stage needs (PyOFS validates fields against reference
    observations the same way, SURVEY.md J6/A6). ONE pass (the lang_id
    kernel inline), per-batch partials, ≤ |langs|·(|langs|+1) keys."""

    def partial(b: pa.Table) -> pa.Table:
        p = lang_id(b)
        t = pa.table({"lang": b["lang"], "lang_pred": p["lang_pred"],
                      "one": pa.array(np.ones(len(b), np.int64))})
        g = t.group_by(["lang", "lang_pred"]).aggregate([("one", "sum")])
        return pa.table({"lang": g["lang"], "lang_pred": g["lang_pred"],
                         "n": g["one_sum"].combine_chunks()
                               .cast(pa.int64())})

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "lang_pred"]).aggregate([("n", "sum")])
        return pa.table({"lang": g["lang"], "lang_pred": g["lang_pred"],
                         "n": g["n_sum"].combine_chunks()
                               .cast(pa.int64())})

    # ≤ |langs|·(|langs|+1) keys: a coalesced Arrow combine, NOT a Ray
    # groupby — the sort-based all-to-all costs ~5 s fixed for a 30-row
    # result (same lesson as the sketch finishes)
    return (_docs(sf_dir, columns=("doc_id", "text", "lang"))
            .map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(combine, batch_format="pyarrow",
                         batch_size=None))


# ------------------------------------------- k-means partition (assignment)
KMEANS_K = 8  # centroids := embeddings with vec_id < KMEANS_K


def embedding_kmeans_assign(sf_dir: str) -> ray.data.Dataset:
    """Nearest-centroid partition of the embedding corpus (the Lloyd
    assignment step / SemDeDup-style semantic bucketing): every vector is
    assigned to the most-cosine-similar of K deterministic centroids
    (the vec_id < K rows), ties to the lowest centroid id.

    Scale shape: the K-row centroid matrix is broadcast once (`ray.put` +
    memoized stateless tasks); each batch does ONE matmul + argmax; only
    K-row per-batch partials (count / id-sum / id-min per centroid) leave
    each task, merged in a K-row coalesced finish — the corpus is never
    shuffled and never lands on the driver. Output is all-integer, so the
    DuckDB `list_cosine_similarity` ROW_NUMBER twin is exact (same
    near-tie assumption `ann_topk` documents).
    """
    cent = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cent = cent.filter(pc.less(cent["vec_id"], KMEANS_K))
    cent = cent.take(pc.sort_indices(cent["vec_id"]))
    ref = ray.put(cent)

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])

    def assign_partial(b: pa.Table) -> pa.Table:
        from ..core.memo import memo_broadcast
        cmat, cids = memo_broadcast(
            f"kmeans_cent:{ref.hex()}",
            lambda: (ann._normalize(ann._embedding_matrix(ray.get(ref))),
                     ray.get(ref)["vec_id"].to_numpy(zero_copy_only=False)
                         .astype(np.int64)))
        vids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = ann._normalize(ann._embedding_matrix(b))
        best = np.argmax(m @ cmat.T, axis=1)  # first max = lowest centroid
        kk = len(cids)
        n = np.bincount(best, minlength=kk).astype(np.int64)
        vsum = np.bincount(best, weights=vids, minlength=kk).astype(np.int64)
        vmin = np.full(kk, np.iinfo(np.int64).max)
        np.minimum.at(vmin, best, vids)
        keep = n > 0
        return pa.table({"centroid_id": pa.array(cids[keep]),
                         "n_members": pa.array(n[keep]),
                         "vec_id_sum": pa.array(vsum[keep]),
                         "vec_id_min": pa.array(vmin[keep])})

    parts = ds.map_batches(assign_partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("centroid_id", sort=True).agg(
            n_members=("n_members", "sum"), vec_id_sum=("vec_id_sum", "sum"),
            vec_id_min=("vec_id_min", "min")).reset_index()
        return g.astype({"centroid_id": np.int64, "n_members": np.int64,
                         "vec_id_sum": np.int64, "vec_id_min": np.int64})

    return parts.repartition(1).map_batches(merge, batch_format="pandas",
                                            batch_size=None)


KMEANS_ASSIGN_SQL = f"""
WITH c AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings
  WHERE vec_id < {KMEANS_K}
), a AS (
  SELECT e.vec_id, c.centroid_id,
         ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.embedding, c.embedding) DESC,
                      c.centroid_id ASC) AS rnk
  FROM embeddings e CROSS JOIN c
)
SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(vec_id) AS BIGINT) AS vec_id_sum,
       CAST(MIN(vec_id) AS BIGINT) AS vec_id_min
FROM a WHERE rnk = 1
GROUP BY 1
"""


# ----------------------------------- split-drift audit (total variation)
@ray.remote(num_cpus=0)
def _c01_block_totals(t: pa.Table) -> tuple[int, int]:
    """Per-block (Σc0, Σc1) for `split_token_tv` — module-level so the
    remote function exports once per session, not once per call."""
    if t.num_rows == 0 or "c0" not in t.column_names:
        return (0, 0)  # Ray 2.49 exchanges emit schema-less empties
    return (int(pc.sum(t["c0"]).as_py() or 0),
            int(pc.sum(t["c1"]).as_py() or 0))



def split_token_tv(sf_dir: str) -> ray.data.Dataset:
    """Token-distribution drift between the two halves of a split
    (doc_id % 2): exact total-variation distance
    TV = ½ Σ_t |p_t − q_t| = Σ_t |c0_t·N1 − c1_t·N0| / (2·N0·N1),
    the standard train/validation distribution-shift audit.

    Exactness: the numerator Σ|c0·N1 − c1·N0| is pure int64 (loud guard:
    N0·N1 < 2⁶¹ keeps every product and the total inside int64 —
    DuckDB runs the identical expression in HUGEINT and casts down); TV
    derives from it by ONE IEEE division after the final reduce.

    Scale shape: per-batch Arrow group_by compresses each block to its
    distinct (token, split) partials; ONE vocab-cardinality bucket
    exchange (`bucketed_group_agg` — token cardinality tracks corpus, so
    never a Ray sort-groupby) produces the per-token count table, which
    is materialized ONCE (vocab-bounded) and consumed twice: a partial-sum
    pass for the split totals, then the |cross-product| partial-sum pass.
    The corpus text is tokenized exactly once.
    """
    from ..stages.agg import bucketed_group_agg

    ds = _docs(sf_dir, columns=("doc_id", "text"))

    def partial(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern_regex(b["text"], r"\s+")
        n_tok = pc.list_value_length(parts).cast(pa.int64())
        toks = pc.list_flatten(parts)
        split = pc.bit_wise_and(b["doc_id"], pa.scalar(1, pa.int64()))
        rep = np.repeat(split.to_numpy(zero_copy_only=False),
                        n_tok.to_numpy(zero_copy_only=False))
        t = pa.table({"token": toks, "split": pa.array(rep)})
        t = t.filter(pc.not_equal(t["token"], ""))
        g = t.group_by(["token", "split"]).aggregate([("split", "count")])
        c = g["split_count"].cast(pa.int64())
        is0 = pc.equal(g["split"], pa.scalar(0, pa.int64()))
        zero = pa.scalar(0, pa.int64())
        return pa.table({"token": g["token"],
                         "c0": pc.if_else(is0, c, zero),
                         "c1": pc.if_else(is0, zero, c)})

    per_tok = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["token"], aggs=[("c0", "sum", "c0"), ("c1", "sum", "c1")]
    ).materialize()

    # split totals from the ALREADY-materialized blocks via raw Ray tasks
    # (2-int partials summed on the driver) — a Dataset execution for this
    # costs ~1 s of fixed Ray-2.49 wall; tasks on resident block refs are
    # ~free and the result is bitwise-identical (exact int64 sums).
    # (_c01_block_totals is MODULE-level: a per-call @ray.remote def
    # re-exports the function every invocation, which costs ~1-2 s in an
    # aged session — measured in the r5 bench at query #140.)
    import ray as _ray

    parts_tot = _ray.get([_c01_block_totals.remote(r)
                          for r in per_tok.to_arrow_refs()])
    n0 = sum(p[0] for p in parts_tot)
    n1 = sum(p[1] for p in parts_tot)
    if n0 * n1 >= (1 << 61):
        raise ValueError("split_token_tv: N0·N1 ≥ 2^61 — the int64 "
                         "numerator would overflow; shard the token space "
                         "and sum per-shard numerators in python ints")

    def num_partial(b: pa.Table) -> pa.Table:
        c0 = b["c0"].to_numpy(zero_copy_only=False).astype(np.int64)
        c1 = b["c1"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = int(np.abs(c0 * n1 - c1 * n0).sum())
        return pa.table({"num": pa.array([s], pa.int64())})

    parts = per_tok.map_batches(num_partial, batch_format="pyarrow",
                                zero_copy_batch=True)

    def finish(b: pa.Table) -> pa.Table:
        num = int(pc.sum(b["num"]).as_py() or 0)
        den = 2 * n0 * n1
        tv = float(num) / float(den) if den else 0.0
        return pa.table({"tokens_a": pa.array([n0], pa.int64()),
                         "tokens_b": pa.array([n1], pa.int64()),
                         "tv_num": pa.array([num], pa.int64()),
                         "tv": pa.array([tv], pa.float64())})

    return parts.repartition(1).map_batches(finish, batch_format="pyarrow",
                                            batch_size=None)


SPLIT_TOKEN_TV_SQL = r"""
WITH toks AS (
  SELECT doc_id % 2 AS split,
         unnest(regexp_split_to_array(text, '\s+')) AS token
  FROM documents
), t AS (
  SELECT token,
         SUM(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS c0,
         SUM(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS c1
  FROM toks WHERE token <> '' GROUP BY 1
), tot AS (
  SELECT SUM(c0) AS n0, SUM(c1) AS n1 FROM t
), num AS (
  SELECT SUM(ABS(CAST(c0 AS HUGEINT) * tot.n1
               - CAST(c1 AS HUGEINT) * tot.n0)) AS num
  FROM t, tot
)
SELECT CAST(tot.n0 AS BIGINT) AS tokens_a,
       CAST(tot.n1 AS BIGINT) AS tokens_b,
       CAST(num.num AS BIGINT) AS tv_num,
       CAST(num.num AS DOUBLE)
         / CAST(2 * tot.n0 * tot.n1 AS DOUBLE) AS tv
FROM tot, num
"""


# --------------------------------------------- order-invariant checksum
_CHK_K1 = 0x9E6C63D0876A3F45  # odd multiplier decorrelating (doc_id, n_chars)


def docs_checksum(sf_dir: str) -> ray.data.Dataset:
    """Order-invariant table fingerprint: Σ splitmix64(doc_id·K1 + n_chars)
    mod 2⁶⁴ plus the row count — the anti-entropy check two replicas (or a
    migration source/target) compare without moving data. Sum-of-hashes is
    commutative, so ANY partitioning/ordering yields the same digest;
    per-batch partial sums wrap in uint64 exactly like the HUGEINT
    `% 2⁶⁴` twin (`core/sqlgen_sample` mix chain, one shared copy).
    """
    from ..core.hashing import splitmix64

    ds = _docs(sf_dir, columns=("doc_id", "n_chars"))

    def partial(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            mix = splitmix64(d * np.uint64(_CHK_K1) + n)
            s = np.uint64(mix.sum())  # wraps mod 2^64 — intended
        return pa.table({"n": pa.array([len(d)], pa.int64()),
                         "s": pa.array([int(s.view(np.int64))], pa.int64())})

    def finish(b: pa.Table) -> pa.Table:
        n = int(pa.compute.sum(b["n"]).as_py() or 0)
        tot = np.uint64(0)
        with np.errstate(over="ignore"):
            for v in b["s"].to_numpy(zero_copy_only=False):
                tot += np.int64(v).view(np.uint64)
        return pa.table({"n_rows": pa.array([n], pa.int64()),
                         "checksum": pa.array([int(tot.view(np.int64))],
                                              pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .repartition(1)
            .map_batches(finish, batch_format="pyarrow", batch_size=None))


def docs_checksum_sql() -> str:
    from ..core.sqlgen_sample import MOD64, _mix_ctes
    key = f"((CAST(doc_id AS HUGEINT) * {_CHK_K1} + n_chars) % {MOD64})"
    chain = _mix_ctes("documents", key, 0, "doc_id, n_chars",
                      "docs_checksum")
    half = 1 << 63
    return f"""{chain}
SELECT n_rows,
       CAST(CASE WHEN s >= {half} THEN s - {MOD64} ELSE s END AS BIGINT)
         AS checksum
FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             SUM(xor(z2, z2 >> 31)) % {MOD64} AS s FROM q2)
"""


# ------------------------------- per-cluster distinctive vocabulary
CLUSTER_TOP_T = 5


def cluster_top_tokens(sf_dir: str) -> ray.data.Dataset:
    """Semantic-cluster characterization: k-means-assign every embedding
    (same broadcast argmax as `embedding_kmeans_assign`), join the
    assignment to the documents table, and report each cluster's top-5
    tokens by member token count — the "what is this cluster about"
    readout every SemDeDup/clustered-curation pipeline needs.

    Shape: assignment rows and per-doc token partials meet in ONE
    bucketed hash join on doc_id (both sides corpus-sized — no broadcast,
    `join.bucketed_hash_join` with the token expansion fused in via
    left_fn); (cluster, token) counts reduce through the vocab bucket
    exchange; the per-cluster top-5 is per-block partial top-5 (any
    global top row is in its block's top-5 under the same total order)
    coalesced into a K·5-row finish. Ties (n DESC, token ASC) exact.
    """
    from ..stages.agg import bucketed_group_agg
    from ..stages.join import bucketed_hash_join

    cent = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cent = cent.filter(pc.less(cent["vec_id"], KMEANS_K))
    cent = cent.take(pc.sort_indices(cent["vec_id"]))
    ref = ray.put(cent)

    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])

    def assign(b: pa.Table) -> pa.Table:
        from ..core.memo import memo_broadcast
        cmat = memo_broadcast(
            f"kmeans_cmat:{ref.hex()}",
            lambda: ann._normalize(ann._embedding_matrix(ray.get(ref))))
        m = ann._normalize(ann._embedding_matrix(b))
        best = np.argmax(m @ cmat.T, axis=1).astype(np.int64)
        return pa.table({"doc_id": b["vec_id"], "cluster_id": pa.array(best)})

    asn = emb.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)

    docs = _docs(sf_dir, columns=("doc_id", "text"))

    def doc_tokens(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern_regex(b["text"], r"\s+")
        n_tok = pc.list_value_length(parts).cast(pa.int64())
        toks = pc.list_flatten(parts)
        ids = np.repeat(b["doc_id"].to_numpy(zero_copy_only=False),
                        n_tok.to_numpy(zero_copy_only=False))
        t = pa.table({"doc_id": pa.array(ids), "token": toks})
        t = t.filter(pc.not_equal(t["token"], ""))
        g = t.group_by(["doc_id", "token"]).aggregate([("token", "count")])
        return pa.table({"doc_id": g["doc_id"], "token": g["token"],
                         "cnt": g["token_count"].cast(pa.int64())})

    tok = docs.map_batches(doc_tokens, batch_format="pyarrow",
                           zero_copy_batch=True)

    joined = bucketed_hash_join(tok, asn, key="doc_id")

    def pre(b: pa.Table) -> pa.Table:
        g = b.group_by(["cluster_id", "token"]).aggregate([("cnt", "sum")])
        return pa.table({"cluster_id": g["cluster_id"], "token": g["token"],
                         "cnt": g["cnt_sum"].cast(pa.int64())})

    ct = bucketed_group_agg(joined.map_batches(pre, batch_format="pyarrow"),
                            keys=["cluster_id", "token"],
                            aggs=[("cnt", "sum", "n")])

    def topt(b: pa.Table) -> pa.Table:
        cl = b["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        tk = b["token"].to_numpy(zero_copy_only=False)
        _, tcode = np.unique(tk, return_inverse=True)  # ASCII order == SQL
        order = np.lexsort((tcode, -n, cl))
        c_s = cl[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
        counts = np.diff(np.r_[starts, len(c_s)])
        rank = np.arange(len(c_s)) - np.repeat(starts, counts)
        keep = order[rank < CLUSTER_TOP_T]
        rk = rank[rank < CLUSTER_TOP_T] + 1
        return pa.table({"cluster_id": pa.array(cl[keep]),
                         "token": pa.array(tk[keep]),
                         "n": pa.array(n[keep]),
                         "rank": pa.array(rk)})

    # per-block partial top-5 per cluster (rank column recomputed in the
    # coalesced finish over ≤ 5·K·blocks survivors)
    head = ct.map_batches(topt, batch_format="pyarrow")
    return head.repartition(1).map_batches(topt, batch_format="pyarrow",
                                           batch_size=None)


CLUSTER_TOP_TOKENS_SQL = rf"""
WITH c AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings
  WHERE vec_id < {KMEANS_K}
), a AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
           ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(e.embedding, c.embedding)
                            DESC,
                        c.centroid_id ASC) AS rnk
    FROM embeddings e CROSS JOIN c
  ) WHERE rnk = 1
), tk AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
  FROM documents
), ct AS (
  SELECT a.centroid_id AS cluster_id, token, COUNT(*) AS n
  FROM tk JOIN a ON tk.doc_id = a.vec_id
  WHERE token <> ''
  GROUP BY 1, 2
), r AS (
  SELECT cluster_id, token, n,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
                            ORDER BY n DESC, token ASC) AS rank
  FROM ct
)
SELECT cluster_id, token, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {CLUSTER_TOP_T}
"""


def dup_cluster_histogram(sf_dir: str,
                          distributed: bool = False) -> ray.data.Dataset:
    """Near-dup cluster-SIZE histogram — the dedup health report (how much
    of the corpus sits in 2-clusters vs mega-clusters decides keep-one vs
    drop-all policy): Jaccard-≥0.8 components (same pair generator and
    min-label semantics as `dedup_near_corpus`) → members per component →
    (size, n_clusters) rows.

    Shape: like keep-one dedup, two forms share one semantics — the
    default pulls the dup-bounded verified pair set and runs driver
    union-find (pairs ≪ corpus; saves the ~4 fixed plan-execution walls
    the iterative propagation pays at fixture scale, 6.1 → 2.6 s);
    ``distributed=True`` is the extreme-dup-rate form: pairs stay a
    Dataset (`minhash_dedup_pairs_ds`), components via min-label
    propagation, member counts per label through ONE bucket exchange.
    The histogram finish is size-bounded either way. Singleton
    (dup-free) docs are not clusters and emit nothing — same as the SQL
    twin's `rep` set.
    """
    from ..stages.agg import bucketed_int64_group_sum

    if not distributed:
        pdf = dedup.minhash_dedup_pairs(_docs(sf_dir), threshold=0.8,
                                        docs_hint=_docs_count(sf_dir))
        rep = dedup.union_find_components(pdf[["id_a", "id_b"]])
        import collections
        # union_find_components maps only NON-root members (the root —
        # the component's min id — never enters `parent`), so each
        # component's size is its value-count plus the root itself
        sizes = collections.Counter(rep.values())
        hist = collections.Counter(v + 1 for v in sizes.values())
        out = pa.table({
            "size": pa.array(sorted(hist), pa.int64()),
            "n_clusters": pa.array([hist[k] for k in sorted(hist)],
                                   pa.int64())})
        return ray.data.from_arrow(out)

    pairs = dedup.minhash_dedup_pairs_ds(_docs(sf_dir), threshold=0.8,
                                         docs_hint=_docs_count(sf_dir))
    comp = dedup.label_propagation_components(pairs)

    def one(b: pa.Table) -> pa.Table:
        return pa.table({"label": b["label"],
                         "one": pa.array(np.ones(len(b), np.int64))})

    sizes = bucketed_int64_group_sum(
        comp.map_batches(one, batch_format="pyarrow"), key="label",
        sum_cols=["one"])

    def hist(b: pa.Table) -> pa.Table:
        g = pa.table({"size": b["one"]}).group_by("size").aggregate(
            [("size", "count")])
        return pa.table({"size": g["size"],
                         "n_clusters": g["size_count"].cast(pa.int64())})

    def merge(b: pa.Table) -> pa.Table:
        g = b.group_by("size").aggregate([("n_clusters", "sum")])
        return pa.table({"size": g["size"],
                         "n_clusters": g["n_clusters_sum"].cast(pa.int64())})

    return (sizes.map_batches(hist, batch_format="pyarrow")
            .repartition(1)
            .map_batches(merge, batch_format="pyarrow", batch_size=None))


def dup_cluster_histogram_sql() -> str:
    from ..core.sqlgen_dedup import component_ctes
    return f"""
WITH RECURSIVE {component_ctes()},
sizes AS (SELECT rep, COUNT(*) AS size FROM rep GROUP BY rep)
SELECT CAST(size AS BIGINT) AS size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY size
"""


# ------------------------------------------------- LLM sequence packing
PACK_SEQ_LEN = 2048   # training sequence length (tokens)
PACK_RANGE_W = 256    # doc_id range width — pick ≈ rows-per-block at scale


PACK_DRIVER_MAX = 2_000_000  # narrow (3×int64) rows ≈ 50 MB — coalesce OK


PACK_SHUFFLE_SHIFT = 54   # draw >> shift → 2^10 hash-prefix ranges


def pack_sequences(sf_dir: str, seq_len: int = PACK_SEQ_LEN,
                   range_w: int = PACK_RANGE_W,
                   force_distributed: bool = False,
                   shuffled: bool = False) -> ray.data.Dataset:
    """Concat-and-chunk sequence packing — the standard LLM-pretraining
    step that lays the token stream of the doc_id-ordered corpus into
    fixed-length training sequences: each doc gets its global token
    offset ``tok_start`` (exclusive prefix sum of token counts), the
    sequence it starts in (``seq_id = tok_start // seq_len``) and its
    offset inside it (``seq_off``); a doc crossing a boundary continues
    into the next sequence, exactly as a packed-dataset loader reads it.

    Distributed exclusive SCAN in three narrow steps after ONE corpus
    text scan (the `curate_corpus` single-scan discipline — token counts
    are materialized as a 3-int-column table and the text is never read
    again): (1) per-range token totals via per-batch partials + a
    range-count-bounded coalesced prefix (the `cell_shard_plan` finish
    shape — range width ≈ rows-per-block keeps that table block-count
    sized), (2) offsets broadcast once via ``ray.put``, (3) ONE
    range-bucket exchange whose kernel lexsorts (range, doc_id) segments
    and adds the broadcast base to the in-segment exclusive cumsum.

    Below ``PACK_DRIVER_MAX`` rows (parquet metadata, no scan) the scan
    collapses to ONE execution — counts → single coalesced exclusive
    cumsum (the narrow table is 3 int64 columns, the same bounded-finish
    judgment as `dup_cluster_histogram`'s driver default); plan
    executions, not compute, dominate fixture-scale pipelines.

    ``shuffled=True`` packs in DETERMINISTIC-SHUFFLE order — the
    pretraining loader's epoch permutation: stream position follows
    ``(splitmix64(doc_id), doc_id)`` instead of ``doc_id``. The same
    three-step scan applies unchanged because the draw's high bits ARE
    contiguous prefixes of the shuffled order: ranges become
    ``draw >> PACK_SHUFFLE_SHIFT`` (uniform by construction — better
    balanced than id-ranges on a skewed id space). The draw column
    stores the uint64 bit pattern int64-signed; every sort views it
    back (``.view(np.uint64)``) so ordering matches the HUGEINT twin.
    """
    import ray as _ray

    from ..core.hashing import splitmix64
    from ..stages.agg import hash_bucket_tag
    from ..stages.text import TOKEN_RE

    def counts(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(b["text"], TOKEN_RE),
                    pa.int64())
        key = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if shuffled:
            draw = splitmix64(key.view(np.uint64))
            rng = (draw >> np.uint64(PACK_SHUFFLE_SHIFT)).astype(np.int64)
            return pa.table({"doc_id": b["doc_id"], "n_tokens": n,
                             "rng": pa.array(rng),
                             "draw": pa.array(draw.view(np.int64))})
        return pa.table({"doc_id": b["doc_id"], "n_tokens": n,
                         "rng": pa.array(key // range_w)})

    def _order(key: np.ndarray, draw: np.ndarray | None,
               rng: np.ndarray | None = None) -> np.ndarray:
        """Sort order of the packing stream (optionally rng-major)."""
        cols = [key] if draw is None else [key, draw.view(np.uint64)]
        if rng is not None:
            cols.append(rng)
        return np.lexsort(tuple(cols))

    narrow = _docs(sf_dir).map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True)

    if not force_distributed and _docs_count(sf_dir) <= PACK_DRIVER_MAX:
        def finish(b: pa.Table) -> pa.Table:
            key = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            n = b["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
            draw = b["draw"].to_numpy(zero_copy_only=False) \
                .astype(np.int64) if shuffled else None
            order = _order(key, draw)
            key, n = key[order], n[order]
            tok_start = np.cumsum(n) - n
            return pa.table({"doc_id": pa.array(key),
                             "n_tokens": pa.array(n),
                             "tok_start": pa.array(tok_start),
                             "seq_id": pa.array(tok_start // seq_len),
                             "seq_off": pa.array(tok_start % seq_len)})

        return narrow.repartition(1).map_batches(
            finish, batch_format="pyarrow", batch_size=None)

    narrow = narrow.materialize()

    def range_partials(b: pa.Table) -> pa.Table:
        g = b.select(["rng", "n_tokens"]).group_by("rng").aggregate(
            [("n_tokens", "sum")])
        return pa.table({"rng": g["rng"],
                         "tot": g["n_tokens_sum"].cast(pa.int64())})

    def prefix(b: pa.Table) -> pa.Table:
        r = b["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = b["tot"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(r, kind="stable")
        r, t = r[order], t[order]
        ur, inv = np.unique(r, return_inverse=True)
        tot = np.zeros(len(ur), np.int64)
        np.add.at(tot, inv, t)
        return pa.table({"rng": pa.array(ur),
                         "offset": pa.array(np.cumsum(tot) - tot)})

    offsets = (narrow.map_batches(range_partials, batch_format="pyarrow")
               .repartition(1)
               .map_batches(prefix, batch_format="pyarrow", batch_size=None)
               .to_arrow_refs())
    off_tbl = pa.concat_tables([_ray.get(ref) for ref in offsets])
    off_ref = _ray.put((off_tbl["rng"].to_numpy().astype(np.int64),
                        off_tbl["offset"].to_numpy().astype(np.int64)))

    cpus = int(_ray.cluster_resources().get("CPU", 8)) \
        if _ray.is_initialized() else 8
    nb = max(8, cpus)
    tagged = narrow.map_batches(lambda b: hash_bucket_tag(b, ["rng"], nb),
                                batch_format="pyarrow")

    def kernel(g: pa.Table) -> pa.Table:
        rkeys, roffs = _ray.get(off_ref)
        key = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        rng = g["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
        draw = g["draw"].to_numpy(zero_copy_only=False) \
            .astype(np.int64) if shuffled else None
        order = _order(key, draw, rng)
        key, n, rng = key[order], n[order], rng[order]
        base = np.cumsum(n) - n
        starts = np.flatnonzero(np.r_[True, rng[1:] != rng[:-1]])
        seg_base = np.repeat(base[starts],
                             np.diff(np.r_[starts, len(rng)]))
        tok_start = base - seg_base + roffs[np.searchsorted(rkeys, rng)]
        return pa.table({"doc_id": pa.array(key),
                         "n_tokens": pa.array(n),
                         "tok_start": pa.array(tok_start),
                         "seq_id": pa.array(tok_start // seq_len),
                         "seq_off": pa.array(tok_start % seq_len)})

    return tagged.groupby("_bucket").map_groups(kernel,
                                                batch_format="pyarrow")


def pack_sequences_sql(seq_len: int = PACK_SEQ_LEN,
                       table: str = "documents") -> str:
    from ..core.sqlgen_text import _count
    from ..stages.text import TOKEN_RE
    return f"""
WITH n AS (
  SELECT doc_id, {_count('text', TOKEN_RE)} AS n_tokens FROM {table}
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_start
  FROM n
)
SELECT doc_id, n_tokens, tok_start,
       tok_start // {seq_len} AS seq_id,
       tok_start % {seq_len} AS seq_off
FROM c
"""


def pack_sequences_shuffled_sql(seq_len: int = PACK_SEQ_LEN,
                                table: str = "documents") -> str:
    """Twin of ``pack_sequences(shuffled=True)``: the shared splitmix64
    CTE chain supplies the HUGEINT draw; the window orders by it."""
    from ..core.sqlgen_sample import _mix_ctes
    from ..core.sqlgen_text import _count
    from ..stages.text import TOKEN_RE
    return f"""{_mix_ctes(table, 'doc_id', 0, 'doc_id, text',
                          'pack_sequences_shuffled_sql')},
n AS (
  SELECT doc_id, xor(z2, z2 >> 31) AS draw,
         {_count('text', TOKEN_RE)} AS n_tokens
  FROM q2
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY draw, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_start
  FROM n
)
SELECT doc_id, n_tokens, tok_start,
       tok_start // {seq_len} AS seq_id,
       tok_start % {seq_len} AS seq_off
FROM c
"""


def pack_seq_stats(sf_dir: str, seq_len: int = PACK_SEQ_LEN,
                   range_w: int = PACK_RANGE_W) -> ray.data.Dataset:
    """Per-SEQUENCE composition of the packed token stream: how many docs
    each fixed-length training sequence touches (``n_docs``), how many
    START inside it (``n_starters``) and how many continue past its end
    (``n_crossers``) — the attention-mask / document-boundary accounting
    a packed-pretraining loader needs (cross-doc attention contamination
    is proportional to ``n_docs - 1``).

    Shape: `pack_sequences`' doc-offset table (never the text again) →
    vectorized ``np.repeat`` range expansion of each doc over the
    sequences it overlaps (expansion factor = doc_len/seq_len + 1, so
    output ≈ input rows + total_tokens/seq_len) → `bucketed_group_agg`
    by seq_id (sequence cardinality tracks corpus size — the plain
    groupby pathology documented on `agg.bucketed_group_agg`)."""
    from ..stages.agg import bucketed_group_agg

    packed = pack_sequences(sf_dir, seq_len=seq_len, range_w=range_w)

    def expand(b: pa.Table) -> pa.Table:
        n = b["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = b["tok_start"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n > 0
        n, ts = n[keep], ts[keep]
        s0 = ts // seq_len
        s1 = (ts + n - 1) // seq_len
        reps = s1 - s0 + 1
        seq = np.repeat(s0, reps) + _ranges_within(reps)
        return pa.table({
            "seq_id": pa.array(seq),
            "one": pa.array(np.ones(len(seq), np.int64)),
            "st": pa.array((seq == np.repeat(s0, reps)).astype(np.int64)),
            "cr": pa.array((seq < np.repeat(s1, reps)).astype(np.int64))})

    expanded = packed.map_batches(expand, batch_format="pyarrow")
    return bucketed_group_agg(expanded, ["seq_id"],
                              [("one", "sum", "n_docs"),
                               ("st", "sum", "n_starters"),
                               ("cr", "sum", "n_crossers")])


def _ranges_within(reps: np.ndarray) -> np.ndarray:
    """[0,1,..,reps[0]-1, 0,1,..,reps[1]-1, ...] without a Python loop."""
    total = int(reps.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    starts = np.cumsum(reps) - reps
    out = np.ones(total, np.int64)
    out[0] = 0
    out[starts[1:]] = 1 - reps[:-1]
    return np.cumsum(out)


def pack_seq_stats_sql(seq_len: int = PACK_SEQ_LEN,
                       table: str = "documents") -> str:
    from ..core.sqlgen_text import _count
    from ..stages.text import TOKEN_RE
    return f"""
WITH n AS (
  SELECT doc_id, {_count('text', TOKEN_RE)} AS n_tokens FROM {table}
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_start
  FROM n
),
exp AS (
  SELECT tok_start, n_tokens,
         UNNEST(generate_series(tok_start // {seq_len},
                                (tok_start + n_tokens - 1) // {seq_len}))
           AS seq_id
  FROM c WHERE n_tokens > 0
)
SELECT seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN tok_start // {seq_len} = seq_id
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_starters,
       CAST(SUM(CASE WHEN (tok_start + n_tokens - 1) // {seq_len} > seq_id
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_crossers
FROM exp GROUP BY seq_id
"""


# --------------------------------------- content-defined chunking (CDC)

def cdc_doc_chunks(sf_dir: str) -> ray.data.Dataset:
    """Anchor rolling-hash chunk table of the corpus (`stages/cdc.py`)."""
    return cdc.cdc_chunks(_docs(sf_dir))


def cdc_dup_chunk_stats(sf_dir: str) -> ray.data.Dataset:
    """Chunk-store dedup accounting: signatures stored more than once."""
    return cdc.cdc_dup_chunks(_docs(sf_dir))


# ------------------------------------- pretraining data-mixture planning
MIX_PPM = 1_000_000


def lang_mixture_plan(sf_dir: str) -> ray.data.Dataset:
    """Temperature-scaled mixture plan over the per-language corpus
    slices — the multilingual-pretraining sampling schedule (XLM-R's
    exponent-smoothed sampling with alpha = 0.5): a language's sampling
    weight is sqrt(n_docs), so low-resource slices are up-weighted
    relative to their raw share without ever dominating.

    Integer-exact end to end: ``weight_s = floor(sqrt(n_docs))`` is ONE
    correctly-rounded IEEE op both sides (n_docs < 2^53), everything
    after is int64 floor arithmetic — ``share_ppm`` (parts-per-million
    of the training stream), ``target_docs`` (share of the corpus-sized
    budget), ``epochs_ppm`` (how often the slice repeats: > 1M means
    the slice is seen more than once per epoch).

    ONE execution: per-batch (lang, count) partials (languages are a
    ~100-key space — the documented small-key finish shape, NOT a Ray
    groupby) coalesced to a single finish kernel that computes the whole
    plan vectorized; overflow-guarded (share_ppm × corpus_size must stay
    in int64 — raises loudly past ~9·10^12 docs)."""
    return mixture_plan_over(_docs(sf_dir, columns=("doc_id", "lang")))


def mixture_plan_over(ds: ray.data.Dataset) -> ray.data.Dataset:
    """`lang_mixture_plan`'s plan kernel over ANY (doc_id, lang) Dataset —
    shared by the standalone plan query and the curation compositions."""

    def partials(b: pa.Table) -> pa.Table:
        g = b.group_by("lang").aggregate([("doc_id", "count")])
        return pa.table({"lang": g["lang"],
                         "n": g["doc_id_count"].cast(pa.int64())})

    def finish(b: pa.Table) -> pa.Table:
        langs = np.asarray(b["lang"].to_pylist(), dtype=object)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(langs, kind="stable")
        langs, n = langs[order], n[order]
        ul, inv = np.unique(langs, return_inverse=True)
        cnt = np.zeros(len(ul), np.int64)
        np.add.at(cnt, inv, n)
        w = np.floor(np.sqrt(cnt.astype(np.float64))).astype(np.int64)
        tot_w, tot_n = int(w.sum()), int(cnt.sum())
        if tot_n >= (1 << 63) // MIX_PPM:
            raise OverflowError(
                "lang_mixture_plan: share_ppm * corpus_size leaves int64 "
                f"(corpus {tot_n} docs) — plan in shards or raise to HUGEINT")
        share = w * MIX_PPM // tot_w
        target = share * tot_n // MIX_PPM
        epochs = target * MIX_PPM // cnt
        return pa.table({"lang": pa.array(list(ul), pa.string()),
                         "n_docs": pa.array(cnt),
                         "weight_s": pa.array(w),
                         "share_ppm": pa.array(share),
                         "target_docs": pa.array(target),
                         "epochs_ppm": pa.array(epochs)})

    return (ds.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True)
              .repartition(1)
              .map_batches(finish, batch_format="pyarrow", batch_size=None))


def lang_mixture_plan_sql(table: str = "documents") -> str:
    return f"""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM {table} GROUP BY lang
),
w AS (
  SELECT lang, n_docs,
         CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT) AS weight_s
  FROM counts
),
t AS (
  SELECT CAST(SUM(weight_s) AS BIGINT) AS tot_w,
         CAST(SUM(n_docs) AS BIGINT) AS tot_n
  FROM w
),
s AS (
  SELECT lang, n_docs, weight_s,
         weight_s * {MIX_PPM} // t.tot_w AS share_ppm,
         t.tot_n AS tot_n
  FROM w, t
)
SELECT lang, n_docs, weight_s,
       CAST(share_ppm AS BIGINT) AS share_ppm,
       CAST(share_ppm * tot_n // {MIX_PPM} AS BIGINT) AS target_docs,
       CAST((share_ppm * tot_n // {MIX_PPM}) * {MIX_PPM} // n_docs
            AS BIGINT) AS epochs_ppm
FROM s
"""


MIX_APPLY_SALT = 0xA5A50F0F


def lang_mixture_apply(sf_dir: str) -> ray.data.Dataset:
    """The APPLY half of the temperature-sampling schedule: realize
    `lang_mixture_plan`'s per-language ``epochs_ppm`` as a deterministic
    per-document copy count — ``floor(epochs_ppm / 1M)`` whole epochs for
    every doc, plus one extra copy for docs whose splitmix64 draw falls
    under the fractional part (the standard hash-thresholded fractional
    epoch). Output (doc_id, lang, n_copies) for n_copies > 0 — the exact
    materialization order a training-data writer replays.

    Scale shape: the plan is pulled once (bounded by |langs| ≈ 100 rows)
    and rides the task closure; the apply is ONE streaming scan with a
    vectorized per-batch kernel (np.unique over ~100 langs + hash draw),
    zero exchanges. Exactness: draw·1M < frac_ppm·2²⁰ is pure int64 on
    both sides (draw < 2²⁰ so every product < 2⁴⁰)."""
    plan = lang_mixture_plan(sf_dir).to_pandas()
    emap = dict(zip(plan["lang"], plan["epochs_ppm"].astype(np.int64)))
    return apply_mixture_copies(
        _docs(sf_dir, columns=("doc_id", "lang")), emap)


def apply_mixture_copies(ds: ray.data.Dataset,
                         emap: dict[str, int]) -> ray.data.Dataset:
    """The shared apply kernel: (doc_id, lang) Dataset + per-lang
    epochs_ppm map → (doc_id, lang, n_copies > 0) rows."""
    from ..core.hashing import splitmix64

    den = 1 << 20

    def tag(b: pa.Table) -> pa.Table:
        langs = np.asarray(b["lang"].to_pylist(), dtype=object)
        if len(langs) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string()),
                             "n_copies": pa.array([], pa.int64())})
        ul, inv = np.unique(langs, return_inverse=True)
        ue = np.fromiter((emap[l] for l in ul), np.int64, len(ul))
        eppm = ue[inv]
        vid = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        draw = (splitmix64(vid.view(np.uint64) ^ np.uint64(MIX_APPLY_SALT))
                % np.uint64(den)).astype(np.int64)
        extra = (draw * MIX_PPM) < (eppm % MIX_PPM) * den
        nc = eppm // MIX_PPM + extra
        keep = nc > 0
        return pa.table({"doc_id": pa.array(vid[keep]),
                         "lang": pa.array(langs[keep], pa.string()),
                         "n_copies": pa.array(nc[keep])})

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def lang_mixture_apply_sql(table: str = "documents") -> str:
    from ..core.sqlgen_sample import _mix_ctes

    mix = _mix_ctes(table, "doc_id", MIX_APPLY_SALT, "doc_id, lang",
                    "lang_mixture_apply_sql")
    return f"""{mix},
counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM {table} GROUP BY lang
),
w AS (
  SELECT lang, n_docs,
         CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT) AS weight_s
  FROM counts
),
t AS (
  SELECT CAST(SUM(weight_s) AS BIGINT) AS tot_w,
         CAST(SUM(n_docs) AS BIGINT) AS tot_n
  FROM w
),
ep AS (
  SELECT lang,
         CAST((weight_s * {MIX_PPM} // t.tot_w) * t.tot_n // {MIX_PPM}
              AS BIGINT) * {MIX_PPM} // n_docs AS epochs_ppm
  FROM w, t
),
drawn AS (
  SELECT doc_id, lang,
         CAST(xor(z2, z2 >> 31) % 1048576 AS BIGINT) AS draw
  FROM q2
),
nc AS (
  SELECT d.doc_id, d.lang,
         ep.epochs_ppm // {MIX_PPM}
         + CASE WHEN d.draw * {MIX_PPM}
                     < (ep.epochs_ppm % {MIX_PPM}) * 1048576
                THEN 1 ELSE 0 END AS n_copies
  FROM drawn d JOIN ep USING (lang)
)
SELECT doc_id, lang, CAST(n_copies AS BIGINT) AS n_copies
FROM nc WHERE n_copies > 0
"""


def pack_bins_bucketed(sf_dir: str,
                       seq_len: int = 128) -> ray.data.Dataset:
    """Length-bucketed bin packing — the OTHER production packing scheme
    (dynamic/bucketed batching): docs are padded up to the nearest
    power-of-two slot ``blen`` (truncated to ``seq_len`` first), bins of
    capacity ``seq_len`` hold ``seq_len // blen`` same-bucket docs, so
    intra-bin padding is bounded by 2× and attention never crosses docs
    (the trade against `pack_sequences`' zero-waste concat-and-chunk).

    Per power-of-two bucket: ``n_docs``, ``n_trunc`` (docs cut to
    seq_len), ``n_bins`` (ceil-div by slots-per-bin), ``sum_tokens``
    (post-truncation), ``waste_tokens = n_bins*seq_len - sum_tokens``
    and ``fill_ppm`` — the padding-efficiency report a loader tunes
    bucket boundaries with. All integer arithmetic.

    ONE execution: token counts → per-batch per-bucket partials (≤
    log2(seq_len)+1 keys) → coalesced finish (the small-key rule)."""
    from ..stages.text import TOKEN_RE

    if seq_len & (seq_len - 1):
        raise ValueError(f"seq_len must be a power of two, got {seq_len}")
    powers = 2 ** np.arange(0, int(np.log2(seq_len)) + 1, dtype=np.int64)

    def partials(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(b["text"], TOKEN_RE),
                    pa.int64()).to_numpy(zero_copy_only=False)
        n = n[n > 0]
        trunc = n > seq_len
        eff = np.minimum(n, seq_len)
        blen = powers[np.searchsorted(powers, eff)]
        ub, inv = np.unique(blen, return_inverse=True)
        cnt = np.zeros(len(ub), np.int64)
        tok = np.zeros(len(ub), np.int64)
        ntr = np.zeros(len(ub), np.int64)
        np.add.at(cnt, inv, 1)
        np.add.at(tok, inv, eff)
        np.add.at(ntr, inv, trunc.astype(np.int64))
        return pa.table({"blen": pa.array(ub), "n_docs": pa.array(cnt),
                         "sum_tokens": pa.array(tok),
                         "n_trunc": pa.array(ntr)})

    def finish(b: pa.Table) -> pa.Table:
        bl = b["blen"].to_numpy(zero_copy_only=False).astype(np.int64)
        ub, inv = np.unique(bl, return_inverse=True)
        cnt = np.zeros(len(ub), np.int64)
        tok = np.zeros(len(ub), np.int64)
        ntr = np.zeros(len(ub), np.int64)
        np.add.at(cnt, inv,
                  b["n_docs"].to_numpy(zero_copy_only=False))
        np.add.at(tok, inv,
                  b["sum_tokens"].to_numpy(zero_copy_only=False))
        np.add.at(ntr, inv,
                  b["n_trunc"].to_numpy(zero_copy_only=False))
        dpb = seq_len // ub
        bins = (cnt + dpb - 1) // dpb
        waste = bins * seq_len - tok
        return pa.table({"blen": pa.array(ub), "n_docs": pa.array(cnt),
                         "n_trunc": pa.array(ntr),
                         "n_bins": pa.array(bins),
                         "sum_tokens": pa.array(tok),
                         "waste_tokens": pa.array(waste),
                         "fill_ppm": pa.array(
                             tok * MIX_PPM // (bins * seq_len))})

    return (_docs(sf_dir)
            .map_batches(partials, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(finish, batch_format="pyarrow", batch_size=None))


def pack_bins_bucketed_sql(seq_len: int = 128,
                           table: str = "documents") -> str:
    from ..core.sqlgen_text import _count
    from ..stages.text import TOKEN_RE
    pws = ", ".join(f"({1 << k})"
                    for k in range(int(seq_len).bit_length()))
    return f"""
WITH p(blen) AS (VALUES {pws}),
n AS (
  SELECT doc_id, {_count('text', TOKEN_RE)} AS n_tokens FROM {table}
),
e AS (
  SELECT doc_id, LEAST(n_tokens, {seq_len}) AS eff,
         CASE WHEN n_tokens > {seq_len} THEN 1 ELSE 0 END AS trunc
  FROM n WHERE n_tokens > 0
),
sl AS (
  SELECT e.doc_id, e.eff, e.trunc, MIN(p.blen) AS blen
  FROM e JOIN p ON p.blen >= e.eff
  GROUP BY e.doc_id, e.eff, e.trunc
),
g AS (
  SELECT blen,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(trunc) AS BIGINT) AS n_trunc,
         CAST(SUM(eff) AS BIGINT) AS sum_tokens
  FROM sl GROUP BY blen
)
SELECT blen, n_docs, n_trunc,
       (n_docs + ({seq_len} // blen) - 1) // ({seq_len} // blen) AS n_bins,
       sum_tokens,
       ((n_docs + ({seq_len} // blen) - 1) // ({seq_len} // blen))
         * {seq_len} - sum_tokens AS waste_tokens,
       sum_tokens * {MIX_PPM}
         // (((n_docs + ({seq_len} // blen) - 1) // ({seq_len} // blen))
             * {seq_len}) AS fill_ppm
FROM g
"""


def cdc_doc_overlap_pairs(sf_dir: str) -> ray.data.Dataset:
    """Sub-document near-dup pairs via shared CDC chunk signatures."""
    return cdc.cdc_doc_overlap(_docs(sf_dir))


def dup_span_report(sf_dir: str) -> ray.data.Dataset:
    """Exact duplicated-substring coverage per doc (stages/dupspan.py)."""
    from ..stages.dupspan import dup_span_coverage
    return dup_span_coverage(
        _docs(sf_dir, columns=("doc_id", "text", "n_chars")))


def source_quality_report(sf_dir: str) -> ray.data.Dataset:
    """Per-source corpus accounting — the data-mixture card a release
    pipeline prints per provenance bucket: doc_count / n_chars_sum /
    mean_chars / n_langs. Same skew-neutral two-level shape as
    `flagship.host_stats`: per-batch Arrow partials over (source, lang)
    compress each batch to ≤|sources|·|langs| rows before the tiny
    exchange; mean is ONE IEEE division from exact int64 sums."""
    from ..stages.agg import partial_group_sums, two_stage_cell_agg

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["source", "lang", "n_chars"])
    agg = two_stage_cell_agg(ds, keys=("source", "lang"),
                             int_sum_cols=("n_chars",),
                             count_name="doc_count")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=True).agg(
            doc_count=("doc_count", "sum"),
            n_chars_sum=("n_chars_sum", "sum"),
            n_langs=("lang", "nunique")).reset_index()
        return pd.DataFrame({
            "source": g.source,
            "doc_count": g.doc_count.astype(np.int64),
            "n_chars_sum": g.n_chars_sum.astype(np.int64),
            "mean_chars": g.n_chars_sum.astype(np.int64).to_numpy()
            .astype(np.float64)
            / g.doc_count.astype(np.int64).to_numpy().astype(np.float64),
            "n_langs": g.n_langs.astype(np.int64)})

    return agg.repartition(1).map_batches(finish, batch_format="pandas",
                                          batch_size=None)


# ------------------------------------- FineWeb-style curation composition
def curate_corpus_semantic(sf_dir: str) -> ray.data.Dataset:
    """Second-generation curation composition (the FineWeb/CCNet recipe
    shape): model-based quality gate → exact dedup → temperature-rebalanced
    emission, each stage an already-oracle-checked operator:

    1. hashed linear classifier gate (`stages/text.linear_classifier_score`,
       keep score ≥ 0) — one streaming scan, zero exchanges;
    2. exact dedup among SURVIVORS (gate first, dedup after — order is part
       of the contract): (md5, id) partials through one bucket exchange,
       dup map (bounded by dup clusters) broadcast back, keep min id;
    3. mixture plan over the surviving per-lang counts (floor-sqrt α=0.5
       schedule) realized as deterministic per-doc copy counts
       (`apply_mixture_copies`).

    Like `curate_docs`, the gated stream stays lazy at fixture scale (the
    narrow re-scans are cheap); at corpus scale spill it once via
    `stages.pairs.spill_to_parquet` so raw text is read exactly once."""
    import ray as _ray

    from ..stages.dedup import exact_dedup
    from ..stages.text import fingerprint, linear_classifier_score

    docs = _docs(sf_dir, columns=("doc_id", "text", "lang"))

    def gate(b: pa.Table) -> pa.Table:
        sc = linear_classifier_score(b)
        return b.filter(sc["keep"])

    gated = docs.map_batches(gate, batch_format="pyarrow",
                             zero_copy_batch=True)

    dup_tbl = (exact_dedup(gated)
               .map_batches(lambda b: b.filter(pc.greater(b["dup_count"], 1)),
                            batch_format="pyarrow")
               .to_pandas())  # bounded by dup clusters (curate_docs shape)
    if len(dup_tbl):
        dup_ref = _ray.put((pa.array(dup_tbl["text_hash"]),
                            dup_tbl["doc_id"].to_numpy(dtype=np.int64)))

        def drop_exact_dups(b: pa.Table) -> pa.Table:
            hashes, min_ids = _ray.get(dup_ref)
            pos = pc.index_in(fingerprint(b)["text_hash"], value_set=hashes)
            hit = pc.is_valid(pos).to_numpy(zero_copy_only=False)
            idx = (pc.fill_null(pos, 0).to_numpy(zero_copy_only=False)
                   .astype(np.int64))
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            keep = ~hit | (ids == min_ids[idx])
            return b.filter(pa.array(keep))

        survivors = gated.map_batches(drop_exact_dups,
                                      batch_format="pyarrow")
    else:
        survivors = gated

    pairs = survivors.map_batches(
        lambda b: b.select(["doc_id", "lang"]), batch_format="pyarrow")
    plan = mixture_plan_over(pairs).to_pandas()  # ≤ |langs| rows
    emap = dict(zip(plan["lang"], plan["epochs_ppm"].astype(np.int64)))
    return apply_mixture_copies(pairs, emap)


def curate_corpus_semantic_sql() -> str:
    from ..core.sqlgen_sample import _mix_ctes

    surv = """(
  SELECT doc_id, lang FROM (
    SELECT k.doc_id, k.lang,
           ROW_NUMBER() OVER (PARTITION BY k.fp ORDER BY k.doc_id) AS rn
    FROM (
      SELECT d.doc_id, d.lang, md5(d.text) AS fp
      FROM documents d LEFT JOIN (
        SELECT doc_id,
               SUM(CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT)
                   % 2001 - 1000) AS s
        FROM (SELECT doc_id,
                     unnest(regexp_split_to_array(text, '\\s+')) AS token
              FROM documents) t
        WHERE token <> '' GROUP BY doc_id) g USING (doc_id)
      WHERE COALESCE(g.s, 0) >= 0
    ) k
  ) r WHERE rn = 1
) surv"""
    mix = _mix_ctes(surv, "doc_id", MIX_APPLY_SALT, "doc_id, lang",
                    "curate_corpus_semantic_sql")
    return f"""{mix},
counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM q2 GROUP BY lang
),
w AS (
  SELECT lang, n_docs,
         CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT) AS weight_s
  FROM counts
),
t AS (
  SELECT CAST(SUM(weight_s) AS BIGINT) AS tot_w,
         CAST(SUM(n_docs) AS BIGINT) AS tot_n
  FROM w
),
ep AS (
  SELECT lang,
         CAST((weight_s * {MIX_PPM} // t.tot_w) * t.tot_n // {MIX_PPM}
              AS BIGINT) * {MIX_PPM} // n_docs AS epochs_ppm
  FROM w, t
),
nc AS (
  SELECT d.doc_id, d.lang,
         ep.epochs_ppm // {MIX_PPM}
         + CASE WHEN CAST(xor(d.z2, d.z2 >> 31) % 1048576 AS BIGINT)
                     * {MIX_PPM}
                     < (ep.epochs_ppm % {MIX_PPM}) * 1048576
                THEN 1 ELSE 0 END AS n_copies
  FROM q2 d JOIN ep USING (lang)
)
SELECT doc_id, lang, CAST(n_copies AS BIGINT) AS n_copies
FROM nc WHERE n_copies > 0
"""


# ---------------------------------------- cross-source duplication matrix
SRC_MIRROR_MOD = 17


def source_dup_matrix(sf_dir: str) -> ray.data.Dataset:
    """Cross-source duplicate accounting (the RefinedWeb/Dolma mixture
    audit): for every unordered source pair, how many DISTINCT texts
    appear in both — tells a mixture builder which provenances to dedup
    against each other before weighting. The dup-free fixture gets seeded
    'mirror' copies (doc_id % 17) INSIDE the query — same construction in
    the twin, which joins on real md5 fingerprints (not id arithmetic).

    Scale shape: per-batch DISTINCT (fp, source) partials (md5 runs once
    per doc), ONE fp-bucket exchange, per-bucket vectorized pair expansion
    (`cocite._pair_rows` — sources per fp are tiny), |sources|²-bounded
    coalesced count. Source catalog collected once (bounded)."""
    import hashlib

    from ..stages.agg import hash_bucket_tag
    from ..stages.cocite import _pair_rows

    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))

    src_parts = docs.map_batches(
        lambda b: pa.table({"source": b["source"]}).group_by(
            "source").aggregate([]),
        batch_format="pyarrow").to_pandas()
    names = sorted(set(src_parts["source"]) | {"mirror"})
    smap = {s: i for i, s in enumerate(names)}
    rev = np.asarray(names, dtype=object)

    import ray as _ray
    cpus = int(_ray.cluster_resources().get("CPU", 8)) \
        if _ray.is_initialized() else 8
    nb = max(8, cpus)

    def fps(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = b["text"].to_pylist()
        fp = np.asarray([hashlib.md5(t.encode("utf-8")).hexdigest()
                         for t in texts], dtype=object)
        src = np.fromiter((smap[s] for s in b["source"].to_pylist()),
                          np.int64, len(b))
        mirror = ids % SRC_MIRROR_MOD == 0
        fp_all = np.concatenate([fp, fp[mirror]])
        src_all = np.concatenate([src,
                                  np.full(int(mirror.sum()),
                                          smap["mirror"], np.int64)])
        # batch-local distinct (fp, source)
        uf, finv = np.unique(fp_all, return_inverse=True)
        key = finv * len(names) + src_all
        uk = np.unique(key)
        t = pa.table({"fp": pa.array(uf[uk // len(names)], pa.string()),
                      "src": pa.array(uk % len(names))})
        return hash_bucket_tag(t, ["fp"], nb)

    def kernel(g: pa.Table) -> pa.Table:
        f = np.asarray(g["fp"].to_pylist(), dtype=object)
        s = g["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        uf, finv = np.unique(f, return_inverse=True)
        key = finv * len(names) + s
        uk = np.unique(key)  # global distinct (fp, source) after combine
        pairs = _pair_rows(pa.table({"dst": pa.array(uk // len(names)),
                                     "src": pa.array(uk % len(names))}))
        if len(pairs) == 0:
            return pa.table({"src_a": pa.array([], pa.int64()),
                             "src_b": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        gg = pairs.group_by(["src_a", "src_b"]).aggregate([("one", "sum")])
        return pa.table({"src_a": gg["src_a"], "src_b": gg["src_b"],
                         "c": gg["one_sum"].cast(pa.int64())})

    parts = (docs.map_batches(fps, batch_format="pyarrow",
                              zero_copy_batch=True)
                 .groupby("_bucket").map_groups(kernel,
                                                batch_format="pyarrow"))

    def finish(b: pa.Table) -> pa.Table:
        a = b["src_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["src_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = a * len(names) + bb
        uk, inv = np.unique(key, return_inverse=True)
        tot = np.zeros(len(uk), np.int64)
        np.add.at(tot, inv, c)
        return pa.table({
            "src_a": pa.array(rev[uk // len(names)], pa.string()),
            "src_b": pa.array(rev[uk % len(names)], pa.string()),
            "n_dup_texts": pa.array(tot)})

    return (parts.repartition(1)
            .map_batches(finish, batch_format="pyarrow", batch_size=None))


SOURCE_DUP_MATRIX_SQL = f"""
WITH seeded AS (
  SELECT md5(text) AS fp, source FROM documents
  UNION ALL
  SELECT md5(text) AS fp, 'mirror' AS source FROM documents
  WHERE doc_id % {SRC_MIRROR_MOD} = 0
),
ds AS (SELECT DISTINCT fp, source FROM seeded)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(COUNT(*) AS BIGINT) AS n_dup_texts
FROM ds a JOIN ds b ON a.fp = b.fp AND a.source < b.source
GROUP BY 1, 2
"""


def split_vocab_jaccard(sf_dir: str) -> ray.data.Dataset:
    """Vocabulary OVERLAP between the two corpus halves (doc_id % 2) —
    the set-level companion of `split_token_tv` (which measures count
    drift): jaccard = |V0 ∩ V1| / |V0 ∪ V1| over distinct whitespace
    tokens. A low value flags a split whose halves don't even share a
    vocabulary (leaky stratification or a shard-ordered corpus).

    Scale shape: per-batch distinct (token, split) presence partials,
    ONE vocab-cardinality bucket exchange (`bucketed_group_agg` max),
    per-bucket 3-int partials (both / only-0 / only-1), coalesced finish;
    jaccard is ONE IEEE division of exact int64 counts."""
    from ..stages.agg import bucketed_group_agg

    ds = _docs(sf_dir, columns=("doc_id", "text"))

    def partial(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern_regex(b["text"], r"\s+")
        n_tok = pc.list_value_length(parts).cast(pa.int64())
        toks = pc.list_flatten(parts)
        split = pc.bit_wise_and(b["doc_id"], pa.scalar(1, pa.int64()))
        rep = np.repeat(split.to_numpy(zero_copy_only=False),
                        n_tok.to_numpy(zero_copy_only=False))
        t = pa.table({"token": toks, "split": pa.array(rep)})
        t = t.filter(pc.not_equal(t["token"], ""))
        g = t.group_by(["token", "split"]).aggregate([("split", "count")])
        is0 = pc.equal(g["split"], pa.scalar(0, pa.int64()))
        one = pa.scalar(1, pa.int64())
        zero = pa.scalar(0, pa.int64())
        return pa.table({"token": g["token"],
                         "in0": pc.if_else(is0, one, zero),
                         "in1": pc.if_else(is0, zero, one)})

    per_tok = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["token"], aggs=[("in0", "max", "in0"), ("in1", "max", "in1")])

    def counts(b: pa.Table) -> pa.Table:
        i0 = b["in0"].to_numpy(zero_copy_only=False).astype(np.int64)
        i1 = b["in1"].to_numpy(zero_copy_only=False).astype(np.int64)
        both = int(((i0 == 1) & (i1 == 1)).sum())
        return pa.table({"n_both": pa.array([both], pa.int64()),
                         "n0": pa.array([int(i0.sum())], pa.int64()),
                         "n1": pa.array([int(i1.sum())], pa.int64())})

    def finish(b: pa.Table) -> pa.Table:
        both = int(pc.sum(b["n_both"]).as_py() or 0)
        n0 = int(pc.sum(b["n0"]).as_py() or 0)
        n1 = int(pc.sum(b["n1"]).as_py() or 0)
        union = n0 + n1 - both
        if union == 0:
            # match the twin: SUMs over zero `pres` rows are NULL, and so
            # is the jaccard — don't invent 1.0 for an empty vocabulary
            return pa.table({"vocab_a": pa.array([None], pa.int64()),
                             "vocab_b": pa.array([None], pa.int64()),
                             "vocab_both": pa.array([None], pa.int64()),
                             "jaccard": pa.array([None], pa.float64())})
        jac = float(both) / float(union)
        return pa.table({"vocab_a": pa.array([n0], pa.int64()),
                         "vocab_b": pa.array([n1], pa.int64()),
                         "vocab_both": pa.array([both], pa.int64()),
                         "jaccard": pa.array([jac], pa.float64())})

    return (per_tok.map_batches(counts, batch_format="pyarrow")
                   .repartition(1)
                   .map_batches(finish, batch_format="pyarrow",
                                batch_size=None))


SPLIT_VOCAB_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id % 2 AS split,
         unnest(regexp_split_to_array(text, '\\s+')) AS token
  FROM documents
),
pres AS (
  SELECT token,
         CAST(MAX(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS BIGINT) AS in0,
         CAST(MAX(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS BIGINT) AS in1
  FROM toks WHERE token <> '' GROUP BY token
)
SELECT CAST(SUM(in0) AS BIGINT) AS vocab_a,
       CAST(SUM(in1) AS BIGINT) AS vocab_b,
       CAST(SUM(in0 * in1) AS BIGINT) AS vocab_both,
       CAST(SUM(in0 * in1) AS DOUBLE)
         / (SUM(in0) + SUM(in1) - SUM(in0 * in1)) AS jaccard
FROM pres
"""
