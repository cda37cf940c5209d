"""Query registry: every implemented operator/pipeline (SURVEY.md §2) with its
DuckDB oracle twin. `__ray_entry__.py` re-exports these for the driver.

Each query callable takes ``sf_dir`` and returns a Dataset / DataFrame /
Table; computed column names match the oracle SQL exactly (driver hashes
values under sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from .core import geom, sqlgen, sqlgen_knn, sqlgen_pip
from .sources.readers import read_parquet_clean
from .pipelines import flagship, relational
from .stages.knn import knn_join
from .stages.pip import pip_join

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLES: dict[str, str] = {}

# Approximate queries whose output cannot bit-match a SQL twin, gated
# instead on recall against an oracle-EXACT baseline query: the checker
# computes |approx ∩ exact| / |exact| over the gate's key columns
# (default (query_id, vec_id); pair queries use (id_a, id_b)) and fails
# below tau. Taus are set from measured recall across sf0.001/0.01/0.1
# (LSH 0.62–0.80, IVF 0.85–0.95) with headroom. An empty baseline makes
# the gate vacuously pass (recall 1.0) — such gates lean on their
# injected-dup pytests for real recall evidence.
RECALL_GATES: dict[str, tuple[str, float, tuple[str, ...]]] = {}

# Scalar-sketch queries gated on RELATIVE ERROR against an exact SQL value:
# the checker runs ``exact_sql`` in DuckDB and fails the query if
# ``|approx - exact| / exact > max_rel_err``. Bounds are set from the
# sketch's published error (HLL at p=12: 1.04/sqrt(4096) ≈ 1.6% standard
# error; the 5% gate is ≈3 sigma).
ERROR_GATES: dict[str, tuple[str, str, float]] = {}


def register_error_gated(name: str, fn: Callable[[str], Any],
                         exact_sql: str, col: str,
                         max_rel_err: float) -> None:
    QUERIES[name] = fn
    ERROR_GATES[name] = (exact_sql, col, max_rel_err)


def register(name: str, fn: Callable[[str], Any], sql: str | None = None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


def register_recall_gated(name: str, fn: Callable[[str], Any],
                          baseline: str, tau: float,
                          cols: tuple[str, ...] = ("query_id", "vec_id")
                          ) -> None:
    QUERIES[name] = fn
    RECALL_GATES[name] = (baseline, tau, cols)


# ---------------------------------------------------------------- geocode/cells
register(
    "geocode_cells",
    lambda sf: flagship.geocoded_pages(sf).select_columns(
        ["page_key", "url", "lon_milli", "lat_milli", "cell_id"]),
    f"""{sqlgen.pages_prefix()}
SELECT page_key, url, lon_milli, lat_milli,
       {sqlgen.cell_expr(geom.BASE_ZOOM)} AS cell_id
FROM pages""",
)

register(
    "cell_agg",
    flagship.cell_aggregates,
    f"""{sqlgen.pages_prefix()}
SELECT {sqlgen.cell_expr(geom.BASE_ZOOM)} AS cell_id,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars_sum,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(LENGTH(text)) AS DOUBLE) / COUNT(*) AS mean_chars
FROM pages
GROUP BY 1""",
)


def _pyramid_oracle(z_base: int = geom.BASE_ZOOM, z_min: int = 0) -> str:
    levels = []
    for z in range(z_base, z_min - 1, -1):
        levels.append(f"""
SELECT {sqlgen.cell_expr(z)} AS cell_id,
       CAST({z} AS INTEGER) AS z,
       CAST({sqlgen.x_expr(z)} AS INTEGER) AS x,
       CAST({sqlgen.y_expr(z)} AS INTEGER) AS y,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars_sum,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(LENGTH(text)) AS DOUBLE) / COUNT(*) AS agg_value
FROM pages GROUP BY 1, 2, 3, 4""")
    return sqlgen.pages_prefix() + "\n" + "\nUNION ALL\n".join(levels)


register("tile_pyramid", flagship.tile_pyramid, _pyramid_oracle())

# r5: incremental maintenance composed through the pyramid — stored
# per-level sums merged with the delta shard's pyramid partials;
# shares tile_pyramid's oracle verbatim
register("tile_pyramid_incremental", flagship.tile_pyramid_incremental,
         _pyramid_oracle())

# r5: incremental view maintenance — stored even-day aggregate merged
# with the odd-day delta's partials; bit-identical to the full
# recompute, so it shares cell_agg's oracle verbatim
register(
    "cell_agg_incremental",
    flagship.cell_agg_incremental,
    f"""{sqlgen.pages_prefix()}
SELECT {sqlgen.cell_expr(geom.BASE_ZOOM)} AS cell_id,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars_sum,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(LENGTH(text)) AS DOUBLE) / COUNT(*) AS mean_chars
FROM pages
GROUP BY 1""",
)


# ------------------------------------------------------------ PIP join (J1/J2)
def _pip_rows(sf_dir: str, mode: str):
    ds = flagship.geocoded_pages(sf_dir).select_columns(
        ["page_key", "url", "lon_milli", "lat_milli"])
    return pip_join(ds, mode=mode)


register(
    "pip_join_inner",
    lambda sf: _pip_rows(sf, "inner"),
    f"{sqlgen.pages_prefix()}\n{sqlgen_pip.pip_inner_select()}",
)

register(
    "pip_semi",
    lambda sf: _pip_rows(sf, "semi"),
    f"""{sqlgen.pages_prefix()}
SELECT page_key, url, lon_milli, lat_milli FROM pages
WHERE {sqlgen_pip.any_inside_expr()}""",
)

register(
    "pip_anti",
    lambda sf: _pip_rows(sf, "anti"),
    f"""{sqlgen.pages_prefix()}
SELECT page_key, url, lon_milli, lat_milli FROM pages
WHERE NOT {sqlgen_pip.any_inside_expr()}""",
)

# polygon join → per-(polygon, cell) aggregate: the J1→A1 composition the
# reference runs as mask-then-average (`wcofs.py:671-683` → `:420-453`).
# ----------------------------------------------------------------- kNN (J4)
def _knn_rows(sf_dir: str, kernel: str = "rings"):
    ds = flagship.geocoded_pages(sf_dir).select_columns(
        ["page_key", "url", "lon_milli", "lat_milli"])
    return knn_join(ds, k=3, kernel=kernel).select_columns(
        ["page_key", "url", "station_id", "d2", "rank"])


register(
    "knn_stations",
    _knn_rows,
    f"WITH {sqlgen.PAGES_CTE},\n{sqlgen_knn.stations_cte()}\n{sqlgen_knn.knn_select(3)}",
)

register(
    "pip_cell_agg",
    flagship.polygon_cell_agg,
    f"""{sqlgen.pages_prefix()}
SELECT polygon_id, {sqlgen.cell_expr(geom.BASE_ZOOM)} AS cell_id,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars_sum
FROM ({sqlgen_pip.pip_inner_select(cols=("page_key", "text", "lon_milli", "lat_milli"))})
GROUP BY 1, 2""",
)


# --------------------------------------------------- relational coverage
register("rel_q1_pricing", relational.q1_pricing, relational.Q1_SQL)
register("rel_segment_revenue", relational.segment_revenue, relational.SEGMENT_REVENUE_SQL)
register("rel_topk_orders", relational.topk_orders, relational.TOPK_ORDERS_SQL)
register("rel_distinct_langs", relational.distinct_langs, relational.DISTINCT_LANGS_SQL)
register("rel_events_daily", relational.events_daily, relational.EVENTS_DAILY_SQL)
register("rel_user_event_means", relational.user_event_means, relational.USER_EVENT_MEANS_SQL)
register("rel_priority_revenue", relational.priority_revenue, relational.PRIORITY_REVENUE_SQL)


# -------------------------------------------- corpus-quality (text / dedup / ann)
from .core import sqlgen_text  # noqa: E402
from .pipelines import corpus  # noqa: E402

register(
    "text_stats",
    corpus.doc_text_stats,
    f"SELECT doc_id, {sqlgen_text.text_stats_select()} FROM documents",
)
register("lang_id", corpus.doc_lang_id, sqlgen_text.lang_id_query())


def _bpe_tokens(sf_dir: str):
    from .stages.text import bpe_token_count

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return (ds.map_batches(bpe_token_count, batch_format="pyarrow",
                           zero_copy_batch=True)
              .select_columns(["doc_id", "n_bpe_tokens"]))


from .stages.text import BPE_TOKEN_RE as _BPE_RE  # noqa: E402

register(
    "bpe_token_counts", _bpe_tokens,
    # DuckDB string literals are raw: only quotes need escaping
    "SELECT doc_id, CAST(length(regexp_extract_all(text, '"
    + _BPE_RE.replace("'", "''")
    + "')) AS BIGINT) AS n_bpe_tokens FROM documents")
register("doc_fingerprint", corpus.doc_fingerprint,
         "SELECT doc_id, md5(text) AS text_hash FROM documents")
register(
    "dedup_exact",
    corpus.dedup_exact,
    """SELECT md5(text) AS text_hash,
       CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS dup_count
FROM documents GROUP BY md5(text)""",
)
from .core import sqlgen_dedup  # noqa: E402

register("ann_topk", corpus.ann_topk, corpus.ANN_TOPK_SQL)


def _embedding_dim_ranges(sf_dir: str):
    from .stages import ann as _ann
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])
    return _ann.embedding_dim_ranges(ds)


def _embedding_dim_ranges_sql() -> str:
    from .stages.ann import EMBEDDING_DIM_RANGES_SQL
    return EMBEDDING_DIM_RANGES_SQL


register("embedding_dim_ranges", _embedding_dim_ranges,
         _embedding_dim_ranges_sql())


def _embedding_quantize(sf_dir: str):
    from .stages import ann as _ann
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    return _ann.embedding_quantize(ds)


def _embedding_quantize_sql() -> str:
    from .stages.ann import embedding_quantize_sql
    return embedding_quantize_sql()


# int8 scalar quantization (long-form codes — the quantized store):
# broadcast per-dim ranges + one streaming codes scan, bit-exact twin
register("embedding_quantize", _embedding_quantize,
         _embedding_quantize_sql())

from .core import sqlgen_ann  # noqa: E402

# r5: both approximate serving paths now have EXACT twins (verified
# EQUAL at sf0.001/0.01/0.1): the LSH twin mirrors the splitmix64
# hyperplanes + sign-band candidate keys op-for-op; the ADC twin runs
# the quantize→dequantize IEEE chain of embedding_quantize_sql and
# ranks by cosine. Integer rank output — same no-near-ties ordering
# assumption the brute ann_topk twin has relied on since round 1.
register("ann_topk_lsh", corpus.ann_topk_lsh,
         sqlgen_ann.ann_topk_lsh_sql())
register("ann_topk_quantized", corpus.ann_topk_quantized,
         sqlgen_ann.ann_topk_quantized_sql())
register("ann_hybrid_fusion", corpus.ann_hybrid_fusion,
         corpus.ANN_HYBRID_FUSION_SQL)
register("minhash_pairs", corpus.minhash_pairs,
         sqlgen_dedup.minhash_pairs_sql(0.8))


# r5: incremental near-dup — new shard (odd doc_ids) deduped against the
# stored even-shard signature store without re-sketching it; twin = the
# exact-Jaccard pair SQL restricted to pairs touching a new doc
def _minhash_pairs_incremental(sf_dir: str):
    from .stages.dedup import minhash_pairs_incremental

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    import pyarrow.parquet as _pq
    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return minhash_pairs_incremental(ds, threshold=0.8, docs_hint=n)


register("minhash_pairs_incremental", _minhash_pairs_incremental,
         f"SELECT * FROM ({sqlgen_dedup.minhash_pairs_sql(0.8)})\n"
         "WHERE id_a % 2 = 1 OR id_b % 2 = 1")
register("simhash_pairs", corpus.simhash_pairs,
         sqlgen_dedup.simhash_pairs_sql(3))
# exact n-gram Jaccard (prefix-filter AllPairs) — same exact-Jaccard twin
# as minhash_pairs but at tau=0.6 and with recall 1.0 by THEOREM, so this
# equality holds at any threshold, not only where LSH recall is 1.0
register("ngram_jaccard_pairs", corpus.ngram_jaccard_pairs,
         sqlgen_dedup.minhash_pairs_sql(0.6))
register("top_tokens", corpus.top_tokens, corpus.TOP_TOKENS_SQL)


def _top_tokens_mg(sf_dir: str):
    """Misra-Gries heavy hitters — the deterministic-guarantee frequent-
    items sketch (constant memory per block, driver-merged ≤k-row blobs;
    the scale path where `top_tokens`' exact vocab exchange stops being
    affordable). PARTITION-DEPENDENT BY CONSTRUCTION (r5, closing the
    last driver `no_oracle` row): which candidates survive each block's
    k-counter eviction depends on where block boundaries fall, so no SQL
    twin can be bit-exact without pinning the physical block layout —
    this is a true sketch, like HLL/CM. It is therefore recall-gated
    against the exact `top_tokens` (measured 1.0 at sf0.01) and the
    formal sandwich bound est ≤ true ≤ est + max_err is pytest-asserted;
    those two checks together are the right correctness statement for a
    frequency sketch."""
    from .stages.mgsketch import top_tokens_mg

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])
    return top_tokens_mg(ds, k=4096, out_k=corpus.TOP_TOKENS_K)


register_recall_gated("top_tokens_mg", _top_tokens_mg, "top_tokens", 0.8,
                      cols=("token",))
register("dedup_near_corpus", corpus.dedup_near_corpus,
         sqlgen_dedup.dedup_corpus_sql(0.8))
register("dedup_near_corpus_distributed", corpus.dedup_near_corpus_distributed,
         sqlgen_dedup.dedup_corpus_sql(0.8))
register("dedup_near_corpus_keep_best", corpus.dedup_near_corpus_keep_best,
         sqlgen_dedup.dedup_corpus_keep_best_sql(0.8))

from .core.sqlgen_curate import curate_corpus_sql  # noqa: E402

register("curate_corpus", corpus.curate_corpus, curate_corpus_sql())


def _doc_sample(sf_dir: str):
    """Deterministic 10% corpus subsample by splitmix64(doc_id) — stable
    under re-partitioning/resume, reproducible on any cluster shape."""
    from .stages.sample import hash_sample

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang"])
    return hash_sample(ds, "doc_id", rate=0.1, salt=7)


from .core.sqlgen_sample import hash_sample_sql  # noqa: E402

register("doc_sample", _doc_sample,
         hash_sample_sql("documents", "doc_id", 0.1, salt=7,
                         select="doc_id, lang"))

_STRATA_RATES = {"en": 0.25}  # down-sample the dominant language
_STRATA_DEFAULT = 0.75  # minority languages kept at 3× the en rate


def _doc_stratified_sample(sf_dir: str):
    """Corpus-balancing sample: per-language rates, same splitmix64 draw
    per doc across strata (changing one stratum's rate never reshuffles
    another's sample)."""
    from .stages.sample import stratified_hash_sample

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang", "n_chars"])
    return stratified_hash_sample(ds, "doc_id", "lang", _STRATA_RATES,
                                  _STRATA_DEFAULT, salt=17)


from .core.sqlgen_sample import stratified_sample_sql  # noqa: E402

register("doc_stratified_sample", _doc_stratified_sample,
         stratified_sample_sql("documents", "doc_id", "lang",
                               _STRATA_RATES, _STRATA_DEFAULT, salt=17,
                               select="doc_id, lang, n_chars"))

_SPLITS = corpus.SPLITS  # one definition — split_contamination shares it


def _doc_splits(sf_dir: str):
    """Deterministic train/val/test assignment over the corpus — disjoint
    and exhaustive hash-bucket ranges, stable under repartition/resume."""
    from .stages.sample import hash_split

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang"])
    return hash_split(ds, "doc_id", _SPLITS, salt=23)


from .core.sqlgen_sample import hash_split_sql  # noqa: E402

register("doc_splits", _doc_splits,
         hash_split_sql("documents", "doc_id", _SPLITS, salt=23,
                        select="doc_id, lang"))

# train/eval contamination: exact-Jaccard pairs crossing split boundaries —
# the AllPairs join composed with the hash splits (split label is a pure
# function of doc_id on the Ray side; the twin joins the split CTE twice)
register(
    "split_contamination", corpus.split_contamination,
    f"""WITH {sqlgen_dedup.pairs_ctes('documents', corpus.CONTAM_TAU)},
sp AS ({hash_split_sql('documents', 'doc_id', _SPLITS,
                       salt=corpus.SPLIT_SALT, select='doc_id')})
SELECT p.id_a, p.id_b, p.jaccard,
       sa.split AS split_a, sb.split AS split_b
FROM pairs p
JOIN sp sa ON sa.doc_id = p.id_a
JOIN sp sb ON sb.doc_id = p.id_b
WHERE sa.split <> sb.split""")


# passage-level decontamination: eval docs sharing a verbatim token 8-gram
# (at ANY token position — alignment-free) with any train doc; the leakage
# the doc-level Jaccard audit misses. Two bounded bucket exchanges, split
# label a pure fn of doc_id.
def _shingle_contamination(sf_dir: str):
    from .stages.decontam import shingle_contamination

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return shingle_contamination(ds, _SPLITS, corpus.SPLIT_SALT)


from .stages.decontam import shingle_contamination_sql  # noqa: E402

register(
    "shingle_contamination", _shingle_contamination,
    shingle_contamination_sql(
        "documents",
        hash_split_sql("documents", "doc_id", _SPLITS,
                       salt=corpus.SPLIT_SALT, select="doc_id")))


# -------------------------------- compositing / stencil / validation (A4/J5/J6/A6)
from .pipelines import validation  # noqa: E402

register("latest_page_per_cell", validation.latest_page_per_cell,
         validation.LATEST_PAGE_SQL)
register("cell_gradients", validation.cell_gradients,
         validation.cell_gradients_sql())


# 3×3 focal-mean smoothing over the cell raster (constant-zoom stencil:
# x wraps the antimeridian, y clamps; grid-bounded — one 9-fold expansion
# + one bucketed reduce, existence via a summed center flag, no join)
def _cell_focal_mean(sf_dir: str):
    from .stages.focal import focal_mean

    return focal_mean(flagship.cell_aggregates(sf_dir))


def _cell_focal_mean_sql() -> str:
    from .stages.focal import focal_mean_sql

    return focal_mean_sql(sqlgen.pages_prefix(), geom.BASE_ZOOM)


register("cell_focal_mean", _cell_focal_mean, _cell_focal_mean_sql())


# diurnal crawl profile: local-solar-hour histogram (geo × time — the
# pass-time-in-local-frame analogue); ≤24 keys, per-batch pre-reduce
def _local_hour_profile(sf_dir: str):
    from .pipelines.diurnal import local_hour_profile

    return local_hour_profile(sf_dir)


def _local_hour_profile_sql() -> str:
    from .pipelines.diurnal import local_hour_profile_sql

    return local_hour_profile_sql()


register("local_hour_profile", _local_hour_profile,
         _local_hour_profile_sql())
register("coregistration_metrics", validation.coregistration_metrics,
         validation.coregistration_sql())
register("cell_uv_derotated", validation.cell_uv_derotated,
         validation.cell_uv_derotated_sql())  # M5 de-rotation as a pipeline


# ------------------------------------- multimodal + tracking (rows-only checks)
def _media_features(sf_dir: str):
    """Synthesize FAKE1 media from doc ids, decode in the actor pool, and
    emit exact integer-moment features. The oracle recomputes the features
    from the generator arithmetic alone — it never sees the binary, so a
    match proves the encode → decode → feature path end-to-end."""
    import ray.data as _rd

    from .stages.multimodal import decode_media, synth_media_batch

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = ds.map_batches(synth_media_batch, batch_format="pyarrow",
                           batch_size=256)
    return decode_media(media, resize=None)  # thumb is pytest-covered


MEDIA_FEATURES_SQL = """
WITH dims AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 17 = 0 THEN (16 + (doc_id % 13) * 4) * 8
              ELSE 16 + (doc_id % 13) * 4 END AS width,
         CASE WHEN doc_id % 17 = 0 THEN (12 + (doc_id % 7) * 4) * 2
              ELSE 12 + (doc_id % 7) * 4 END AS height,
         doc_id % 16777216 AS seed
  FROM documents
),
px AS (
  SELECT media_id, width, height,
         SUM((r.r * 31 + c.c * 7 + seed) % 256) AS s1,
         SUM(((r.r * 31 + c.c * 7 + seed) % 256)
             * ((r.r * 31 + c.c * 7 + seed) % 256)) AS s2
  FROM dims,
       LATERAL (SELECT unnest(generate_series(0, height - 1)) AS r) r,
       LATERAL (SELECT unnest(generate_series(0, width - 1)) AS c) c
  GROUP BY 1, 2, 3
)
SELECT media_id, CAST(width AS INTEGER) AS width,
       CAST(height AS INTEGER) AS height,
       CAST(s1 AS DOUBLE) / CAST(width * height AS DOUBLE) AS px_mean,
       CASE WHEN CAST(s2 AS DOUBLE) / CAST(width * height AS DOUBLE)
                 - (CAST(s1 AS DOUBLE) / CAST(width * height AS DOUBLE))
                   * (CAST(s1 AS DOUBLE) / CAST(width * height AS DOUBLE)) > 0
            THEN sqrt(CAST(s2 AS DOUBLE) / CAST(width * height AS DOUBLE)
                 - (CAST(s1 AS DOUBLE) / CAST(width * height AS DOUBLE))
                   * (CAST(s1 AS DOUBLE) / CAST(width * height AS DOUBLE)))
            ELSE 0.0 END AS px_std
FROM px
"""


def _particle_track(sf_dir: str):
    from .stages.tracking import RankineVortexField, circle_seeds, track

    return track(circle_seeds(64, radius=500.0),
                 field=RankineVortexField(radius=1000.0, period=3600.0),
                 dt=30.0, steps=20, snapshot_every=5, order=4)


register("media_features", _media_features, MEDIA_FEATURES_SQL)


def _audio_features(sf_dir: str):
    """Synthesize FAKA1 clips from doc ids, decode in the task pool, emit
    exact acoustic features (RMS from int64 square sums, zero crossings).
    The oracle recomputes every sample from the generator arithmetic — it
    never sees the binary, proving encode → decode → feature end-to-end."""
    from .stages.multimodal import decode_audio, synth_audio_batch

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    clips = ds.map_batches(synth_audio_batch, batch_format="pyarrow",
                           batch_size=256)
    return decode_audio(clips)


_SAMPLE = "((j.j * 37 + seed) % 4096 - 2048)"
_PREV = "(((j.j - 1) * 37 + seed) % 4096 - 2048)"

AUDIO_FEATURES_SQL = f"""
WITH dims AS (
  SELECT doc_id AS media_id,
         256 + (doc_id % 11) * 64 AS n,
         8000 + (doc_id % 3) * 4000 AS rate,
         doc_id % 16777216 AS seed
  FROM documents
),
smp AS (
  SELECT media_id, n, rate,
         SUM(CAST({_SAMPLE} AS BIGINT) * CAST({_SAMPLE} AS BIGINT)) AS s2,
         SUM(CASE WHEN j.j > 0
                   AND (({_SAMPLE} >= 0) != ({_PREV} >= 0))
              THEN 1 ELSE 0 END) AS zc
  FROM dims,
       LATERAL (SELECT unnest(generate_series(0, n - 1)) AS j) j
  GROUP BY 1, 2, 3
)
SELECT media_id, CAST(n AS INTEGER) AS n_samples,
       CAST(rate AS INTEGER) AS sample_rate,
       CAST(n AS DOUBLE) / CAST(rate AS DOUBLE) AS duration_s,
       sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) AS rms,
       CAST(zc AS BIGINT) AS zero_crossings
FROM smp
"""

register("audio_features", _audio_features, AUDIO_FEATURES_SQL)


def _doc_winnow(sf_dir: str):
    """MOSS-style winnowing fingerprints over the corpus — the
    plagiarism/near-dup primitive: every w-window of rolling k-gram hashes
    contributes its rightmost minimum, so any match ≥ k+w−1 chars between
    two documents shares at least one selected fingerprint."""
    from .stages.text import winnow_fingerprints

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(winnow_fingerprints, batch_format="pyarrow",
                          zero_copy_batch=True)


from .core.sqlgen_text import winnow_sql  # noqa: E402

register("doc_winnow_fp", _doc_winnow, winnow_sql())

from .core.sqlgen_text import winnow_pairs_sql  # noqa: E402

register("winnow_dup_pairs", corpus.winnow_dup_pairs, winnow_pairs_sql())


def _doc_quality(sf_dir: str):
    from .stages.text import quality_scores

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(quality_scores, batch_format="pyarrow",
                          zero_copy_batch=True)


from .core.sqlgen_text import quality_scores_sql, token_repetition_sql  # noqa: E402

register("doc_quality", _doc_quality, quality_scores_sql())

# model-based quality filtering (fastText-classifier stage): feature-hashed
# linear scorer, exact integer weights from md5 on BOTH sides
register("doc_classifier_score", corpus.doc_classifier_score,
         corpus.CLASSIFIER_SCORE_SQL)


def _doc_repetition(sf_dir: str):
    """Within-document token-repetition quality signal (Gopher-style):
    repeated-token fraction flags boilerplate/keyword-stuffed pages."""
    from .stages.text import token_repetition

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(token_repetition, batch_format="pyarrow",
                          zero_copy_batch=True)


register("doc_repetition", _doc_repetition, token_repetition_sql())


def _corpus_lang_report_sql() -> str:
    from .core.sqlgen_text import _count
    from .stages.text import STOPWORD_RE, TOKEN_RE
    return f"""
WITH per AS (
  SELECT lang,
         CAST(LENGTH(text) AS BIGINT) AS chars,
         {_count('text', TOKEN_RE)} AS toks,
         {_count('text', STOPWORD_RE)} AS stops
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(chars) AS BIGINT) AS n_chars_sum,
       CAST(SUM(toks) AS BIGINT) AS n_tokens_sum,
       CAST(SUM(stops) AS BIGINT) AS n_stopwords_sum,
       CAST(SUM(chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_chars,
       CAST(SUM(stops) AS DOUBLE) / CAST(SUM(toks) + 1 AS DOUBLE) AS stopword_ratio
FROM per GROUP BY lang"""


register("corpus_lang_report", corpus.corpus_lang_report,
         _corpus_lang_report_sql())


# The fixture corpus is dup-free at τ=0.95 (max pairwise cosine ≈ 0.51), so
# an unseeded recall gate is vacuous (0-pair baseline → recall ≡ 1.0). The
# seeded variants below inject exact-copy dups deterministically INSIDE the
# query — every vec_id % SEED_MOD == 0 re-appears as vec_id + SEED_OFFSET —
# so the exact baseline emits one pair per seed (cosine exactly at the 1.0
# ceiling vs the 0.51 fixture gap: no borderline) and the IVF gate measures
# a real, non-empty recall.
_SEED_MOD = 29
_SEED_OFFSET = 1_000_000_000


def _seeded_embeddings(sf_dir: str):
    """Single-scan seeding: each batch appends copies of its seed rows."""
    import pyarrow as _pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    n = _pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])

    def seed(b: _pa.Table) -> _pa.Table:
        import numpy as _np

        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(_np.int64)
        dup = b.filter(_pa.array(vid % _SEED_MOD == 0))
        dup = dup.set_column(dup.schema.get_field_index("vec_id"), "vec_id",
                             _pc.add(dup["vec_id"], _SEED_OFFSET))
        return _pa.concat_tables([b, dup])

    seeded = ds.map_batches(seed, batch_format="pyarrow")
    return seeded, n + (n + _SEED_MOD - 1) // _SEED_MOD


def _embedding_dup_pairs_seeded(sf_dir: str):
    """Oracle-EXACT baseline on the seeded corpus: banded LSH + exact
    verify finds precisely the injected (i, i + SEED_OFFSET) pairs; ids
    only in the output, so the SQL twin is pure generator arithmetic."""
    from .stages.ann import embedding_dup_pairs

    seeded, n = _seeded_embeddings(sf_dir)
    pairs = embedding_dup_pairs(seeded, threshold=0.95, docs_hint=n)
    return (pairs[["id_a", "id_b"]].sort_values(["id_a", "id_b"])
            .reset_index(drop=True))


register("embedding_dup_pairs_seeded", _embedding_dup_pairs_seeded,
         f"""SELECT vec_id AS id_a, vec_id + {_SEED_OFFSET} AS id_b
FROM embeddings WHERE vec_id % {_SEED_MOD} = 0""")

# exact Jaccard through the DISTRIBUTED prefix path on a Zipfian-vocabulary
# corpus (the saturated fixture can't exercise it — round-3 item 4); seeded
# exact copies make the pair set known by construction, so the twin is id
# arithmetic and jaccard is exactly 1.0 (n/n in one IEEE divide)
register("ngram_jaccard_pairs_zipf", corpus.ngram_jaccard_pairs_zipf,
         f"""SELECT doc_id AS id_a, doc_id + {corpus.ZIPF_SEED_OFFSET} AS id_b,
       CAST(1.0 AS DOUBLE) AS jaccard
FROM documents WHERE doc_id % {corpus.ZIPF_SEED_MOD} = 0""")


def _embedding_dup_pairs_ivf(sf_dir: str):
    """IVF-bucketed embedding near-dup — the higher-dup-rate scale path;
    recall-gated against the seeded oracle-exact banded-LSH pairs (a
    NON-empty baseline: round-3 verdict flagged the unseeded gate as
    vacuous on the dup-free fixture)."""
    from .stages.ann import embedding_dup_pairs_ivf

    seeded, n = _seeded_embeddings(sf_dir)
    return embedding_dup_pairs_ivf(seeded, threshold=0.95, corpus_rows=n)


register_recall_gated("embedding_dup_pairs_ivf", _embedding_dup_pairs_ivf,
                      "embedding_dup_pairs_seeded", 0.8,
                      cols=("id_a", "id_b"))


def _semdedup_keep(sf_dir: str):
    """SemDeDup end-to-end (Abbas et al. 2023): k-means cluster → pairwise
    cosine ONLY within clusters → keep one per duplicate component. Runs on
    the seeded corpus (injected exact copies — the non-vacuous gate
    pattern); the twin reuses the kmeans-assign CTE over the seeded corpus
    and decides keep by id arithmetic, valid because no natural pair
    reaches 0.95 (the `embedding_dup_pairs` margin fact) while seeded
    copies are bit-identical vectors that always co-cluster."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    from .pipelines.corpus import KMEANS_K
    from .stages.semdedup import semdedup

    seeded, _ = _seeded_embeddings(sf_dir)
    cent = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    cent = cent.filter(_pc.less(cent["vec_id"], KMEANS_K))
    cent = cent.take(_pc.sort_indices(cent["vec_id"]))
    return semdedup(seeded, cent, threshold=0.95)


register("semdedup_keep", _semdedup_keep, f"""
WITH seeded AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {_SEED_OFFSET} AS vec_id, embedding
  FROM embeddings WHERE vec_id % {_SEED_MOD} = 0
), c AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings
  WHERE vec_id < {corpus.KMEANS_K}
), a AS (
  SELECT s.vec_id, c.centroid_id,
         ROW_NUMBER() OVER (
             PARTITION BY s.vec_id
             ORDER BY list_cosine_similarity(s.embedding, c.embedding) DESC,
                      c.centroid_id ASC) AS rnk
  FROM seeded s CROSS JOIN c
)
SELECT vec_id, centroid_id AS cluster_id,
       (vec_id < {_SEED_OFFSET}) AS keep
FROM a WHERE rnk = 1""")


def _video_frame_features(sf_dir: str):
    """FAKV1 clips from doc ids → actor-pool frame sampling (every 2nd
    frame) → exact per-frame mean. Oracle recomputes from the generator
    arithmetic — proves the video encode → decode → sample path."""
    from .stages.multimodal import sample_frames, synth_video_batch

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = ds.map_batches(synth_video_batch, batch_format="pyarrow",
                           batch_size=256)
    return sample_frames(media, every=2)


VIDEO_FRAMES_SQL = """
WITH dims AS (
  SELECT doc_id AS media_id,
         8 + (doc_id % 5) * 4 AS width,
         6 + (doc_id % 3) * 4 AS height,
         4 + (doc_id % 11) AS n_frames,
         doc_id % 16777216 AS seed
  FROM documents
),
fr AS (
  SELECT media_id, width, height, seed, f.f AS frame_idx
  FROM dims, LATERAL (SELECT unnest(generate_series(0, n_frames - 1, 2)) AS f) f
)
SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(SUM((r.r * 31 + c.c * 7 + frame_idx * 13 + seed) % 256) AS DOUBLE)
         / CAST(width * height AS DOUBLE) AS px_mean
FROM fr,
     LATERAL (SELECT unnest(generate_series(0, height - 1)) AS r) r,
     LATERAL (SELECT unnest(generate_series(0, width - 1)) AS c) c
GROUP BY media_id, frame_idx, width, height
"""

register("video_frame_features", _video_frame_features, VIDEO_FRAMES_SQL)

from .core.sqlgen_track import (  # noqa: E402
    particle_track_gridded_sql, particle_track_sql)

# bit-exact recursive-CTE twin of the RK4 advection loop
register("particle_track", _particle_track, particle_track_sql())

TRACK_DENSITY_CELL = 100  # meters per density cell


def _track_density(sf_dir: str):
    """Trajectory density map: RK4 snapshot positions binned per cell —
    the reference renders particle/contour tracks onto its raster grid
    the same way (`particle_contour.py` plotting path); here the raster
    is a (cx, cy, count) table. The advection is the existing exact
    pipeline; the binning floor-divides the SAME float64 positions on
    both engines, so the cells match bit for bit."""
    import pyarrow.compute as _pc

    from .stages.agg import two_stage_cell_agg

    out = _particle_track(sf_dir)

    def binit(b):
        import pyarrow as _pa
        cell = _pa.scalar(float(TRACK_DENSITY_CELL), _pa.float64())
        return _pa.table({
            "cx": _pc.floor(_pc.divide(b["x"], cell)).cast(_pa.int64()),
            "cy": _pc.floor(_pc.divide(b["y"], cell)).cast(_pa.int64()),
        })

    return two_stage_cell_agg(out.map_batches(binit, batch_format="pyarrow"),
                              keys=("cx", "cy"), int_sum_cols=(),
                              count_name="n")


register("track_density", _track_density, f"""
SELECT CAST(FLOOR(x / {TRACK_DENSITY_CELL}) AS BIGINT) AS cx,
       CAST(FLOOR(y / {TRACK_DENSITY_CELL}) AS BIGINT) AS cy,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ({particle_track_sql()}) t
GROUP BY 1, 2""")


def _particle_track_gridded(sf_dir: str):
    """ST4/J4 full form: RK4 advection through a bilinear-space ×
    linear-time interpolated velocity cube (reference
    `particle_contour.py:249-298`), cube held by the stepper (actor state
    at scale), particles carrying their clock in the rows."""
    from .stages.tracking import circle_seeds, default_gridded_field, track

    out = track(circle_seeds(48, radius=400.0), field=default_gridded_field(),
                dt=30.0, steps=20, snapshot_every=5, order=4, t_start=0.0)
    return out.select_columns(["step", "particle_id", "x", "y", "t"])


register("particle_track_gridded", _particle_track_gridded,
         particle_track_gridded_sql())


# ------------------------------------------ pass-time ephemeris (ST5 full)
def _pass_windows(sf_dir: str):
    """Periodic ephemeris expanded over the events table's time span
    (reference `viirs.py:929-1013` store_viirs_pass_times +
    `:1016-1075` get_pass_times)."""
    import pyarrow as _pa
    from ray.data.aggregate import Max, Min

    from .stages.ephemeris import pass_windows

    def as_us(b: "_pa.Table") -> "_pa.Table":
        return _pa.table({"ts": b["ts"].cast(_pa.int64())})

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts"])
    mm = ev.map_batches(as_us, batch_format="pyarrow").aggregate(
        Min("ts", alias_name="lo"), Max("ts", alias_name="hi"))
    return pass_windows(int(mm["lo"]), int(mm["hi"]))


def _events_pass_asof(sf_dir: str):
    """Latest pass <= each event ts: broadcast-searchsorted as-of against
    the small ephemeris side (`viirs.py:1016-1075` composed with the
    event stream)."""
    from .stages.ephemeris import attach_last_pass

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts"])
    return attach_last_pass(ev, ts_col="ts").select_columns(
        ["event_id", "ts_us", "pass_us"])


def _eph_sql_parts(extra_before: int = 0) -> str:
    from .stages.ephemeris import (EPOCH_US, JITTER_MOD, N_PASSES, PERIOD_US,
                                   SPACING_US)
    return f"""w AS (SELECT CAST(epoch_us(MIN(ts)) AS BIGINT) AS t0,
           CAST(epoch_us(MAX(ts)) AS BIGINT) AS t1 FROM events),
ks AS (SELECT unnest(generate_series((t0 - {EPOCH_US}) // {PERIOD_US} - {extra_before},
                                     (t1 - {EPOCH_US}) // {PERIOD_US})) AS period,
              t0, t1 FROM w),
px AS (SELECT unnest(generate_series(0, {N_PASSES - 1})) AS pass_idx),
allp AS (SELECT period, pass_idx,
                {EPOCH_US} + period * {PERIOD_US} + pass_idx * {SPACING_US}
                  + ((pass_idx * pass_idx * 37) % {JITTER_MOD}) * 1000000 AS pass_us,
                t0, t1
         FROM ks CROSS JOIN px)"""


register("pass_windows", _pass_windows, f"""
WITH {_eph_sql_parts()}
SELECT period, pass_idx, pass_us FROM allp
WHERE pass_us >= t0 AND pass_us < t1""")


_PASS_WINDOW_US = 20 * 60 * 1_000_000  # ±20 min (2W < the 64-min pass gap)
_RADIUS_MILLI = 10_000  # shared with the radius-join family below


def _pages_pass_radius(sf_dir: str):
    """Spatio-temporal pass join — the VIIRS matchup shape (`viirs.py`
    pass times × `data_buoy.py` radius matching composed): pages within
    the station radius whose crawl timestamp falls inside ±W of a
    satellite pass. Both small sides broadcast (stations via the memoized
    index, the pass table in the task closure); zero exchanges."""
    from ray.data.aggregate import Max, Min

    from .stages.ephemeris import attach_passes_within

    base = flagship.pages_dataset(sf_dir, with_text=False)
    mm = base.map_batches(
        lambda b: b.select(["url"]).append_column(
            "ts", b["warc_ts"].cast("int64")).select(["ts"]),
        batch_format="pyarrow").aggregate(
        Min("ts", alias_name="lo"), Max("ts", alias_name="hi"))

    ds = flagship.geocoded_pages(sf_dir).select_columns(
        ["page_key", "warc_ts", "lon_milli", "lat_milli"])
    hits = radius_join(ds, _RADIUS_MILLI)
    matched = attach_passes_within(hits, _PASS_WINDOW_US,
                                   int(mm["lo"]), int(mm["hi"]))
    return matched.select_columns(["page_key", "station_id", "d2",
                                   "pass_us"])


def _pages_pass_sql() -> str:
    from .stages.ephemeris import (EPOCH_US, JITTER_MOD, N_PASSES,
                                   PERIOD_US, SPACING_US)
    w = _PASS_WINDOW_US
    return f"""{sqlgen.pages_prefix()},
{sqlgen_knn.stations_cte()},
w AS (SELECT CAST(epoch_us(MIN(warc_ts)) AS BIGINT) AS t0,
             CAST(epoch_us(MAX(warc_ts)) AS BIGINT) AS t1 FROM pages),
ks AS (SELECT unnest(generate_series((t0 - {w} - {EPOCH_US}) // {PERIOD_US},
                                     (t1 + {w} - {EPOCH_US}) // {PERIOD_US}))
           AS period FROM w),
px AS (SELECT unnest(generate_series(0, {N_PASSES - 1})) AS pass_idx),
allp AS (SELECT {EPOCH_US} + period * {PERIOD_US} + pass_idx * {SPACING_US}
                  + ((pass_idx * pass_idx * 37) % {JITTER_MOD}) * 1000000
                  AS pass_us
         FROM ks CROSS JOIN px)
SELECT p.page_key, s.station_id,
       (p.lon_milli - s.s_lon) * (p.lon_milli - s.s_lon)
         + (p.lat_milli - s.s_lat) * (p.lat_milli - s.s_lat) AS d2,
       a.pass_us
FROM pages p
CROSS JOIN stations s
CROSS JOIN allp a
WHERE (p.lon_milli - s.s_lon) * (p.lon_milli - s.s_lon)
        + (p.lat_milli - s.s_lat) * (p.lat_milli - s.s_lat)
      <= {_RADIUS_MILLI} * {_RADIUS_MILLI}
  AND ABS(CAST(epoch_us(p.warc_ts) AS BIGINT) - a.pass_us) <= {w}"""


register("pages_pass_radius", _pages_pass_radius, _pages_pass_sql())


def _pip_donut(sf_dir: str):
    """Point-in-polygon-with-HOLE (even-odd multipolygon rule): pages in
    the annulus = parity(outer) AND NOT parity(hole) — for nested rings
    the even-odd XOR reduces to exactly that. Same broadcast PolygonIndex
    machinery as `pip_join` (memoized per worker, zero exchanges); the
    twin composes the identical per-ring parity expressions."""
    import ray as _ray

    from .sources.fixtures import donut_polygon
    from .stages.pip import _memo_index

    outer, hole = donut_polygon()
    ref = _ray.put([outer, hole])

    ds = flagship.geocoded_pages(sf_dir).select_columns(
        ["page_key", "url", "lon_milli", "lat_milli"])

    def inside(b):
        import pyarrow as _pa
        idx = _memo_index(ref)
        lon = b["lon_milli"].to_numpy(zero_copy_only=False)
        lat = b["lat_milli"].to_numpy(zero_copy_only=False)
        keep = idx.contains(0, lon, lat) & ~idx.contains(1, lon, lat)
        return b.filter(_pa.array(keep))

    return ds.map_batches(inside, batch_format="pyarrow",
                          zero_copy_batch=True)


def _pip_donut_sql() -> str:
    from .sources.fixtures import donut_polygon

    outer, hole = donut_polygon()
    return f"""{sqlgen.pages_prefix()}
SELECT page_key, url, lon_milli, lat_milli
FROM pages
WHERE {sqlgen_pip.inside_expr(outer)}
  AND NOT {sqlgen_pip.inside_expr(hole)}"""


register("pip_donut", _pip_donut, _pip_donut_sql())

# zonal language-diversity raster (per-cell Simpson index)
register("cell_lang_simpson", flagship.cell_lang_simpson,
         flagship.cell_lang_simpson_sql())

# per-host crawl-volume anomaly audit (selection-exact MAD outlier flag)
register("host_anomalous_slots", flagship.host_anomalous_slots,
         f"{sqlgen.pages_prefix()},{flagship.host_anomalous_slots_sql()}")

# cross-source duplicate matrix (mixture-dedup audit; seeded mirror copies
# keep the dup-free fixture non-vacuous, twin joins real md5 fingerprints)
register("source_dup_matrix", corpus.source_dup_matrix,
         corpus.SOURCE_DUP_MATRIX_SQL)

# vocabulary-overlap audit between split halves (set companion of
# split_token_tv's count drift)
register("split_vocab_jaccard", corpus.split_vocab_jaccard,
         corpus.SPLIT_VOCAB_JACCARD_SQL)

register("events_pass_asof", _events_pass_asof, f"""
WITH {_eph_sql_parts(extra_before=1)}
SELECT e.event_id, CAST(epoch_us(e.ts) AS BIGINT) AS ts_us,
       (SELECT MAX(pass_us) FROM allp
        WHERE pass_us <= epoch_us(e.ts)) AS pass_us
FROM events e""")


# ------------------------------------------ contour arc-length resample (P2)
# Deterministic test ring: an axis-aligned staircase around a 400×300
# rectangle with UNEQUAL vertex spacing (perimeter positions below; corners
# are vertices, so every segment is axis-aligned with an INTEGER length —
# the cumulative arc length is then exact under any summation order, and
# the only float ops are the interpolation's single IEEE divide/mul/add,
# reproduced verbatim in the SQL twin).
_RING_P = (0, 50, 120, 200, 270, 330,        # bottom edge  (y=0)
           400, 480, 540, 620,               # right edge   (x=400)
           700, 820, 890, 1010,              # top edge     (y=300)
           1100, 1190, 1260, 1340)           # left edge    (x=0)
_RING_PERIM = 1400
_RING_N_OUT = 32


def _ring_xy(p: int) -> tuple[int, int]:
    if p < 400:
        return p, 0
    if p < 700:
        return 400, p - 400
    if p < 1100:
        return 1100 - p, 300
    return 0, 1400 - p


def _resample_contour(sf_dir: str):
    """P2 arc-length re-parameterization (`particle_contour.py:1031-1062`)
    over the deterministic staircase ring → 32 equally-spaced vertices."""
    import numpy as np
    import pyarrow as pa

    from .stages.tracking import resample_contour

    xy = [_ring_xy(p) for p in _RING_P]
    ring = pa.table({
        "particle_id": pa.array(np.arange(len(_RING_P), dtype=np.int64)),
        "x": pa.array(np.array([c[0] for c in xy], np.float64)),
        "y": pa.array(np.array([c[1] for c in xy], np.float64)),
    })
    return resample_contour(ring, _RING_N_OUT)


def _resample_contour_sql() -> str:
    vals = ", ".join(f"({i}, {p})" for i, p in enumerate(_RING_P))
    n = len(_RING_P)
    return f"""
WITH ring(i, p) AS (VALUES {vals}),
pts AS (
  SELECT i,
         CAST(CASE WHEN p < 400 THEN p WHEN p < 700 THEN 400
                   WHEN p < 1100 THEN 1100 - p ELSE 0 END AS DOUBLE) AS x,
         CAST(CASE WHEN p < 400 THEN 0 WHEN p < 700 THEN p - 400
                   WHEN p < 1100 THEN 300 ELSE 1400 - p END AS DOUBLE) AS y
  FROM ring
),
closed AS (  -- ring closure: vertex n repeats vertex 0
  SELECT i, x, y FROM pts
  UNION ALL SELECT {n}, x, y FROM pts WHERE i = 0
),
hops AS (
  SELECT i, x, y, LEAD(x) OVER (ORDER BY i) AS x2,
         LEAD(y) OVER (ORDER BY i) AS y2
  FROM closed QUALIFY i < {n}
),
segs AS (    -- integer segment lengths (axis-aligned staircase) → exact
  SELECT i, x, y, x2, y2,
         SUM(ABS(x2 - x) + ABS(y2 - y))
             OVER (ORDER BY i ROWS UNBOUNDED PRECEDING)
           - (ABS(x2 - x) + ABS(y2 - y)) AS s_lo,
         SUM(ABS(x2 - x) + ABS(y2 - y))
             OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS s_hi
  FROM hops
),
tgt AS (
  SELECT CAST(t.t AS BIGINT) AS particle_id,
         CAST(t.t AS DOUBLE) * (CAST({_RING_PERIM} AS DOUBLE)
                                / {_RING_N_OUT}) AS s
  FROM (SELECT unnest(generate_series(0, {_RING_N_OUT - 1})) AS t) t
)
SELECT tgt.particle_id,
       ((segs.x2 - segs.x) / (segs.s_hi - segs.s_lo)) * (tgt.s - segs.s_lo)
         + segs.x AS x,
       ((segs.y2 - segs.y) / (segs.s_hi - segs.s_lo)) * (tgt.s - segs.s_lo)
         + segs.y AS y
FROM tgt JOIN segs ON tgt.s >= segs.s_lo AND tgt.s < segs.s_hi
"""


register("resample_contour", _resample_contour, _resample_contour_sql())

register("rel_events_ten_min", relational.events_ten_min,
         relational.EVENTS_TEN_MIN_SQL)

from .core.sqlgen_text import text_stats_select as _tss  # noqa: E402

register(
    "quality_filter", relational.quality_filter,
    """SELECT doc_id, n_tokens, punct_ratio FROM (
  SELECT doc_id, """ + _tss() + """
  FROM documents
) WHERE n_tokens >= 20 AND punct_ratio < 0.05""",
)


# --------------------------------------------------- bilinear interp (J3)
from .stages.interp import bilinear_cells, bilinear_sql  # noqa: E402


def _bilinear(sf_dir: str):
    ds = flagship.geocoded_pages(sf_dir).select_columns(
        ["lon_milli", "lat_milli", "n_chars"])
    return bilinear_cells(ds)


register("bilinear_cells", _bilinear,
         f"{sqlgen.pages_prefix()},{bilinear_sql()}")


# -------------------------------------------- windows / sessions (streaming-shaped)
from .pipelines import windows  # noqa: E402

register("events_sessionize", windows.sessionize, windows.SESSIONIZE_SQL)
register("events_sessionize_sorted", windows.sessionize_sorted,
         windows.SESSIONIZE_SQL)  # scale form, same oracle
register("top_order_per_customer", windows.top_order_per_customer,
         windows.TOP_ORDER_PER_CUSTOMER_SQL)
register("top3_orders_per_customer", windows.top3_orders_per_customer,
         windows.TOP3_ORDERS_SQL)

# ------------------------------------------ ordered temporal join / window
from .pipelines import temporal  # noqa: E402

register("events_asof_order", temporal.events_asof_order,
         temporal.EVENTS_ASOF_SQL)
register("events_asof_order_tol", temporal.events_asof_order_tol,
         temporal.EVENTS_ASOF_TOL_SQL)
register("events_sliding_window", temporal.events_sliding_window,
         temporal.EVENTS_SLIDING_SQL)
register("events_incident_window", temporal.events_incident_window,
         temporal.EVENTS_INCIDENT_SQL)
register("clicks_nearest_error", temporal.clicks_nearest_error,
         temporal.CLICKS_NEAREST_ERROR_SQL)


# ---------------------------------------- byte-identity audit (north_rule)
def _pages_passthrough(sf_dir: str):
    """text must be byte-identical per url after flowing through the full
    geocode pipeline (north_rule invariant; `input_hint`)."""
    ds = flagship.geocoded_pages(sf_dir)
    return ds.select_columns(["url", "text"])


register(
    "pages_passthrough",
    _pages_passthrough,
    f"{sqlgen.pages_prefix()}\nSELECT url, text FROM pages",
)
# exact all-pairs twin: the fixture's max pairwise cosine is ~0.51, so both
# sides are deterministically empty — the oracle proves the 0-row answer is
# correct-empty, not broken-empty (injected-dup recall is pytest-gated).
register(
    "embedding_dup_pairs", corpus.embedding_dup_pairs,
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95""")
register("events_watermark", relational.events_watermark,
         relational.EVENTS_WATERMARK_SQL)
register_recall_gated("ann_topk_ivf", corpus.ann_topk_ivf,
                      baseline="ann_topk", tau=0.75)
register("rel_q6_revenue", relational.q6_forecast_revenue, relational.Q6_SQL)
register("rel_q3_shipping", relational.q3_shipping_priority, relational.Q3_SQL)
register("rel_q5_regional", relational.q5_regional_revenue, relational.Q5_SQL)
register("event_value_quantiles", relational.event_value_quantiles,
         relational.event_value_quantiles_sql())
# deterministic HDR log-bucket sketch: the APPROXIMATION itself is exact
# integer arithmetic, so it gets a bit-exact twin too
register("event_value_quantiles_approx", relational.event_value_quantiles_approx,
         relational.event_value_quantiles_approx_sql())


# ------------------------------- per-document tile assignment (metric core)
def _doc_tile_assignment(sf_dir: str):
    """Explicit per-document tile assignment (z, x, y) at the base zoom —
    the BASELINE.json metric's 'per-doc tile assignments' artifact."""
    import numpy as np
    import pyarrow as pa

    from .core import geom as _g

    def unpack(b: pa.Table) -> pa.Table:
        z, x, y = _g.unpack_cell(b["cell_id"].to_numpy(zero_copy_only=False))
        return (b.select(["page_key", "url", "cell_id"])
                 .append_column("z", pa.array(z.astype(np.int32)))
                 .append_column("x", pa.array(x.astype(np.int32)))
                 .append_column("y", pa.array(y.astype(np.int32))))

    return flagship.geocoded_pages(sf_dir).map_batches(
        unpack, batch_format="pyarrow", zero_copy_batch=True)


register(
    "doc_tile_assignment",
    _doc_tile_assignment,
    f"""{sqlgen.pages_prefix()}
SELECT page_key, url, {sqlgen.cell_expr(geom.BASE_ZOOM)} AS cell_id,
       CAST({geom.BASE_ZOOM} AS INTEGER) AS z,
       CAST({sqlgen.x_expr(geom.BASE_ZOOM)} AS INTEGER) AS x,
       CAST({sqlgen.y_expr(geom.BASE_ZOOM)} AS INTEGER) AS y
FROM pages""",
)


register(
    "host_stats",
    flagship.host_stats,
    f"""{sqlgen.pages_prefix()},
per AS (
  SELECT SPLIT_PART(url, '/', 3) AS host, lang,
         CAST(SUM(LENGTH(text)) AS BIGINT) AS chars,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pages GROUP BY 1, 2
)
SELECT host,
       CAST(SUM(cnt) AS BIGINT) AS doc_count,
       CAST(SUM(chars) AS BIGINT) AS n_chars_sum,
       CAST(COUNT(*) AS BIGINT) AS n_langs,
       CAST(SUM(chars) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS mean_chars
FROM per GROUP BY host""",
)

register(
    "cell_distinct_langs",
    flagship.cell_distinct_langs,
    f"""{sqlgen.pages_prefix()}
SELECT {sqlgen.cell_expr(geom.BASE_ZOOM)} AS cell_id,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
FROM pages GROUP BY 1""",
)


def _approx_distinct_texts(sf_dir: str):
    """HLL approximate distinct texts (mergeable-sketch pattern); rows-only
    — exact twin is dedup_exact's row count."""
    import pandas as pd
    import ray.data as _rd

    from .stages.sketch import approx_distinct

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])
    return pd.DataFrame({"approx_distinct": [approx_distinct(ds, "text")]})


register_error_gated(
    "approx_distinct_texts", _approx_distinct_texts,
    exact_sql="SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS v FROM documents",
    col="approx_distinct", max_rel_err=0.05)
register("rel_priority_revenue_native", relational.priority_revenue_native,
         relational.PRIORITY_REVENUE_SQL)

register("rel_events_hourly", relational.events_hourly,
         relational.EVENTS_HOURLY_SQL)

_DELTA_EXPR = ("((epoch_us(warc_ts) - 1704067200000000) // 86400000000)")

register(
    "ensemble_cell_means",
    flagship.ensemble_cell_means,
    f"""{sqlgen.pages_prefix()}
SELECT {sqlgen.cell_expr(geom.BASE_ZOOM)} AS cell_id,
       CAST({_DELTA_EXPR} AS BIGINT) AS time_delta,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars_sum,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(LENGTH(text)) AS DOUBLE) / COUNT(*) AS mean_chars
FROM pages GROUP BY 1, 2""",
)

_HOUR_DELTA_EXPR = "((epoch_us(warc_ts) - 1704067200000000) // 3600000000)"

register(
    "cell_mean_complete",
    flagship.cell_mean_complete,
    f"""{sqlgen.pages_prefix()},
hourly AS (
  SELECT {sqlgen.cell_expr(4)} AS cell_id,
         CAST({_HOUR_DELTA_EXPR} AS BIGINT) AS time_delta,
         CAST(SUM(LENGTH(text)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM pages GROUP BY 1, 2
)
SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n_steps,
       CASE WHEN COUNT(*) = (SELECT COUNT(DISTINCT time_delta) FROM hourly)
            THEN CAST(SUM(s) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
            ELSE NULL END AS mean_chars
FROM hourly GROUP BY 1""",
)

register("events_lag_delta", relational.events_lag_delta,
         relational.EVENTS_LAG_DELTA_SQL)
register("customer_running_revenue", relational.customer_running_revenue,
         relational.CUSTOMER_RUNNING_REVENUE_SQL)
register("doc_distinctive_terms", corpus.doc_distinctive_terms,
         corpus.DISTINCTIVE_TERMS_SQL)
register("doc_token_surprisal", corpus.doc_token_surprisal,
         corpus.TOKEN_SURPRISAL_SQL)
register("doc_prefix_clusters", corpus.doc_prefix_clusters,
         corpus.DOC_PREFIX_CLUSTERS_SQL)
register("doc_bigram_successors", corpus.doc_bigram_successors,
         corpus.BIGRAM_SUCCESSORS_SQL)

register("dedup_canonical_url", flagship.dedup_canonical_url, f"""
{sqlgen.pages_prefix()},
messy AS (
  SELECT url, warc_ts AS ts FROM pages
  UNION ALL
  SELECT CASE page_key % 4
           WHEN 0 THEN UPPER(regexp_extract(url, '^[^/]*//[^/]*'))
                       || regexp_replace(url, '^[^/]*//[^/]*', '')
           WHEN 1 THEN url || '#frag'
           WHEN 2 THEN url || '?utm_source=x&utm_campaign=y'
           ELSE url || '/'
         END AS url,
         warc_ts + INTERVAL 1 SECOND AS ts
  FROM pages
),
canon AS (
  SELECT LOWER(regexp_extract(c3, '^[^/]*//[^/]*'))
           || regexp_replace(c3, '^[^/]*//[^/]*', '') AS canon_url,
         ts
  FROM (
    SELECT regexp_replace(regexp_replace(regexp_replace(url, '#.*$', ''),
             '[?&]utm_[^&#]*', '', 'g'), '/$', '') AS c3, ts
    FROM messy)
)
SELECT canon_url, MIN(ts) AS first_ts,
       CAST(COUNT(*) AS BIGINT) AS dup_count
FROM canon GROUP BY canon_url
""")

register("customer_order_totals_outer", relational.customer_order_totals_outer,
         relational.CUSTOMER_ORDER_TOTALS_OUTER_SQL)

register("crawl_diff", flagship.crawl_diff, f"""
{sqlgen.pages_prefix()},
snap_a AS (SELECT page_key, url FROM pages),
snap_b AS (
  SELECT page_key, url FROM pages WHERE page_key % 7 <> 3
  UNION ALL
  SELECT doc_id + 10000000 AS page_key,
         'https://h' || CAST(CASE WHEN (doc_id + 10000000) % 10 < 7 THEN 0
                                  ELSE (doc_id + 10000000) % 97 END AS VARCHAR)
           || '.example.com/p/' || CAST(doc_id + 10000000 AS VARCHAR) AS url
  FROM documents WHERE doc_id % 5 = 0
)
SELECT url, 'removed' AS status
FROM (SELECT url FROM snap_a EXCEPT SELECT url FROM snap_b)
UNION ALL
SELECT url, 'added' AS status
FROM (SELECT url FROM snap_b EXCEPT SELECT url FROM snap_a)
""")

register("crawl_diff_3way", flagship.crawl_diff_3way, f"""
{sqlgen.pages_prefix()},
snap_a AS (SELECT page_key, url, md5(text) AS h FROM pages),
snap_b AS (
  SELECT page_key, url,
         md5(CASE WHEN page_key % 11 = 5 THEN text || ' v2' ELSE text END)
             AS h
  FROM pages WHERE page_key % 7 <> 3
  UNION ALL
  SELECT doc_id + 10000000 AS page_key,
         'https://h' || CAST(CASE WHEN (doc_id + 10000000) % 10 < 7 THEN 0
                                  ELSE (doc_id + 10000000) % 97 END AS VARCHAR)
           || '.example.com/p/' || CAST(doc_id + 10000000 AS VARCHAR) AS url,
         md5(text) AS h
  FROM documents WHERE doc_id % 5 = 0
)
SELECT a.url, 'removed' AS status FROM snap_a a
LEFT JOIN snap_b b USING (page_key) WHERE b.page_key IS NULL
UNION ALL
SELECT b.url, 'added' AS status FROM snap_b b
LEFT JOIN snap_a a USING (page_key) WHERE a.page_key IS NULL
UNION ALL
SELECT a.url, 'modified' AS status FROM snap_a a
JOIN snap_b b USING (page_key) WHERE a.h <> b.h
""")

register("doc_clean", corpus.doc_clean, corpus.DOC_CLEAN_SQL)

register("doc_redact", corpus.doc_redact, corpus.DOC_REDACT_SQL)

register("event_value_histogram", relational.event_value_histogram,
         relational.EVENT_VALUE_HISTOGRAM_SQL)
register("orders_percent_rank", relational.orders_percent_rank,
         relational.ORDERS_PERCENT_RANK_SQL)

# GLOBAL percent-rank without a sort: value-bounded cent CDF broadcast +
# streaming rank attach (rows never shuffle)
register("events_percent_rank", relational.events_percent_rank,
         relational.EVENTS_PERCENT_RANK_SQL)

register("host_crawl_cadence", flagship.host_crawl_cadence, f"""
{sqlgen.pages_prefix()}
SELECT page_key, SPLIT_PART(url, '/', 3) AS host, warc_ts,
       LAG(warc_ts) OVER w AS prev_ts,
       CAST(epoch_us(warc_ts) - epoch_us(LAG(warc_ts) OVER w) AS BIGINT)
           AS delta_us
FROM pages
WINDOW w AS (PARTITION BY SPLIT_PART(url, '/', 3)
             ORDER BY warc_ts, page_key)
""")

register("crawl_delta_stats", flagship.crawl_delta_stats, f"""
{sqlgen.pages_prefix()},
snap_a AS (SELECT page_key, url, md5(text) AS h, LENGTH(text) AS nc
           FROM pages),
snap_b AS (
  SELECT page_key, url,
         md5(CASE WHEN page_key % 11 = 5 THEN text || ' v2' ELSE text END)
             AS h,
         LENGTH(CASE WHEN page_key % 11 = 5 THEN text || ' v2'
                     ELSE text END) AS nc
  FROM pages WHERE page_key % 7 <> 3
  UNION ALL
  SELECT doc_id + 10000000 AS page_key,
         'https://h' || CAST(CASE WHEN (doc_id + 10000000) % 10 < 7 THEN 0
                                  ELSE (doc_id + 10000000) % 97 END AS VARCHAR)
           || '.example.com/p/' || CAST(doc_id + 10000000 AS VARCHAR) AS url,
         md5(text) AS h, LENGTH(text) AS nc
  FROM documents WHERE doc_id % 5 = 0
),
delta AS (
  SELECT a.nc, 'removed' AS status FROM snap_a a
  LEFT JOIN snap_b b USING (page_key) WHERE b.page_key IS NULL
  UNION ALL
  SELECT b.nc, 'added' AS status FROM snap_b b
  LEFT JOIN snap_a a USING (page_key) WHERE a.page_key IS NULL
  UNION ALL
  SELECT a.nc, 'modified' AS status FROM snap_a a
  JOIN snap_b b USING (page_key) WHERE a.h <> b.h
)
SELECT status, CAST(SUM(nc) AS BIGINT) AS total_chars,
       CAST(COUNT(*) AS BIGINT) AS n_pages
FROM delta GROUP BY status
""")


# ------------------------------------------------- link-graph analytics (r4)
from .stages import linkgraph  # noqa: E402


def _doc_count(sf_dir: str) -> int:
    """Row count of the documents table, VERIFIED contiguous 0..n−1 from
    parquet row-group statistics (metadata-only, no scan). The whole
    linkgraph family (pagerank base term, PPR's n_seeds = ceil(n/37),
    closed-form edge generators) assumes doc_ids are exactly 0..n−1; a
    gapped id space would silently desynchronize the engine from its SQL
    twins, so fail loudly here instead."""
    import pyarrow.parquet as pq
    md = pq.read_metadata(f"{sf_dir}/documents.parquet")
    n = md.num_rows
    try:
        idx = md.schema.names.index("doc_id")
        lo = min(md.row_group(i).column(idx).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max
                 for i in range(md.num_row_groups))
    except (AttributeError, ValueError):
        return n  # no stats — fixture generators always write them
    if lo != 0 or hi != n - 1:
        raise ValueError(
            f"linkgraph: doc_id range [{lo}, {hi}] with {n} rows is not "
            "contiguous 0..n−1 — seed counts / edge generators would "
            "desynchronize from the SQL twins")
    return n


def _link_pagerank(sf_dir: str):
    n = _doc_count(sf_dir)
    ids = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
    return linkgraph.pagerank(linkgraph.initial_ranks(ids, n), n)


def _link_indegree(sf_dir: str):
    n = _doc_count(sf_dir)
    ids = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
    return linkgraph.indegree_stats(ids, n)


def _link_triangles(sf_dir: str):
    n = _doc_count(sf_dir)
    ids = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
    return linkgraph.triangle_counts(ids, n)


register("link_pagerank", _link_pagerank, linkgraph.pagerank_sql())


def _link_ppr(sf_dir: str):
    """Personalized PageRank from the node%37 seed set (topic-sensitive
    restart — the crawl-prioritization ranker)."""
    n = _doc_count(sf_dir)
    ids = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
    return linkgraph.personalized_pagerank(
        linkgraph.ppr_initial_ranks(ids, n), n)


register("link_ppr", _link_ppr, linkgraph.personalized_pagerank_sql())


def _link_walk_visits(sf_dir: str):
    """Deterministic random-walk visit frequencies (node2vec corpus
    generator shape): closed-form edges ⇒ the whole K-step walk is one
    vectorized map; only the count reduce shuffles."""
    n = _doc_count(sf_dir)
    ids = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
    return linkgraph.walk_visit_counts(ids, n)


register("link_walk_visits", _link_walk_visits,
         linkgraph.walk_visit_counts_sql())
register("link_indegree", _link_indegree, linkgraph.indegree_sql())
register("link_triangles", _link_triangles, linkgraph.triangles_sql())


# -------------------------------------------- exact grouped quantiles (r4)
from .stages import quantile  # noqa: E402


def _events_value_quantiles(sf_dir: str):
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])
    return quantile.grouped_low_quantiles(ev, "user_id", "value")


register("events_value_quantiles", _events_value_quantiles,
         quantile.grouped_low_quantiles_sql("events", "user_id", "value"))


# ------------------------------------------------- inverted index (r4)
from .stages import postings  # noqa: E402
from .sources.pages import pages_dataset  # noqa: E402


def _url_token_index(sf_dir: str):
    pages = pages_dataset(sf_dir, with_text=False, keep_key=True)
    return postings.url_token_index(pages)


register("url_token_index", _url_token_index,
         postings.url_token_index_sql(sqlgen.pages_prefix()))


# ------------------------------------------------- crawl policy filter (r4)
from .stages.canon import url_policy_filter  # noqa: E402

_BLOCK_HOST_EXACT = ("h13.example.com",)
_BLOCK_HOST_SUFFIX = ("3.example.com",)
_BLOCK_PATH_PREFIX = ("/p/1",)


def _url_blocklist_filter(sf_dir: str):
    pages = pages_dataset(sf_dir, with_text=False, keep_key=True)
    return url_policy_filter(
        pages.select_columns(["page_key", "url"]),
        host_exact=_BLOCK_HOST_EXACT,
        host_suffix=_BLOCK_HOST_SUFFIX,
        path_prefix=_BLOCK_PATH_PREFIX)


register("url_blocklist_filter", _url_blocklist_filter, f"""
{sqlgen.pages_prefix()}
SELECT page_key, url FROM pages
WHERE NOT (
  SPLIT_PART(url, '/', 3) IN ('h13.example.com')
  OR SPLIT_PART(url, '/', 3) LIKE '%3.example.com'
  OR regexp_replace(url, '^[^/]*//[^/]*', '') LIKE '/p/1%'
)""")


# ------------------------------------------------- html -> text (r4)
from .stages.extract import extract_text  # noqa: E402


def _html_extract_text(sf_dir: str):
    """WET extraction: the text column is DROPPED and re-derived from the
    html bytes; the oracle's `SELECT url, text FROM pages` then proves the
    extraction byte-identical per url (the north-star clause)."""
    pages = pages_dataset(sf_dir, with_html=True, keep_key=True)
    raw = pages.drop_columns(["text"]).select_columns(
        ["page_key", "url", "html"])
    return extract_text(raw).select_columns(["page_key", "url", "text"])


register("html_extract_text", _html_extract_text, f"""
{sqlgen.pages_prefix()}
SELECT page_key, url, text FROM pages""")


# ------------------------------------------------- geo-constrained ANN (r4)
register(
    "ann_topk_bbox", corpus.ann_topk_bbox,
    sqlgen.pages_prefix() + corpus.ANN_TOPK_BBOX_SQL.format(
        w=corpus.BBOX_W, e=corpus.BBOX_E, s=corpus.BBOX_S, n=corpus.BBOX_N,
        nq=corpus.NUM_QUERIES, k=corpus.TOPK))


register("host_authority", flagship.host_authority, f"""
{sqlgen.pages_prefix()},
{linkgraph.edges_cte()},
ind AS (
  SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS in_degree
  FROM edges GROUP BY dst
)
SELECT SPLIT_PART(p.url, '/', 3) AS host,
       CAST(SUM(i.in_degree) AS BIGINT) AS in_links_total,
       CAST(COUNT(*) AS BIGINT) AS n_pages_linked,
       CAST(MAX(i.in_degree) AS BIGINT) AS max_in_degree
FROM ind i JOIN pages p ON p.page_key = i.node
GROUP BY 1""")


from .core.sqlgen_sample import MOD64 as _SM_MOD64  # noqa: E402
from .core.sqlgen_sample import _C1 as _SM_C1  # noqa: E402
from .core.sqlgen_sample import _C2 as _SM_C2  # noqa: E402
from .core.sqlgen_sample import _GOLDEN as _SM_GOLDEN  # noqa: E402
from .core.sqlgen_sample import _mulmod64, to_u64  # noqa: E402


def _host_quota_sql(k: int) -> str:
    key = to_u64("page_key")
    return f"""{sqlgen.pages_prefix()},
q0 AS (SELECT page_key, url,
              (({key}) + {_SM_GOLDEN}) % {_SM_MOD64} AS z0 FROM pages),
q1 AS (SELECT *, {_mulmod64('xor(z0, z0 >> 30)', _SM_C1)} AS z1 FROM q0),
q2 AS (SELECT *, {_mulmod64('xor(z1, z1 >> 27)', _SM_C2)} AS z2 FROM q1),
drawn AS (
  SELECT page_key, url, SPLIT_PART(url, '/', 3) AS host,
         xor(z2, z2 >> 31) AS draw
  FROM q2
)
SELECT host, page_key, url, CAST(rn AS BIGINT) AS rank FROM (
  SELECT host, page_key, url,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY draw, page_key) AS rn
  FROM drawn)
WHERE rn <= {k}"""


register("host_quota_sample",
         lambda sf: flagship.host_quota_sample(sf),
         _host_quota_sql(flagship.HOST_QUOTA_K))


# ------------------------------------------------- spatial radius join (r4)
from .stages.knn import radius_join  # noqa: E402


def _stations_within_radius(sf_dir: str):
    ds = flagship.geocoded_pages(sf_dir).select_columns(
        ["page_key", "url", "lon_milli", "lat_milli"])
    return radius_join(ds, _RADIUS_MILLI).select_columns(
        ["page_key", "url", "station_id", "d2"])


register("stations_within_radius", _stations_within_radius, f"""
{sqlgen.pages_prefix()},
{sqlgen_knn.stations_cte()}
SELECT page_key, url, station_id, d2 FROM (
  SELECT p.page_key, p.url, s.station_id,
         (p.lon_milli - s.s_lon) * (p.lon_milli - s.s_lon)
           + (p.lat_milli - s.s_lat) * (p.lat_milli - s.s_lat) AS d2
  FROM pages p CROSS JOIN stations s
) WHERE d2 <= {_RADIUS_MILLI} * {_RADIUS_MILLI}""")


# ------------------------------------------------- redirect resolution (r4)
_REDIR_ROUNDS = 2  # chains ≤ 3 hops → 2 pointer-doubling rounds


def _redirect_resolution(sf_dir: str):
    import pyarrow as _pa

    ids = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
    resolved = linkgraph.resolve_redirects(
        linkgraph.redirect_pointers(ids), rounds=_REDIR_ROUNDS)
    return resolved.map_batches(
        lambda b: _pa.table({"node": b["node"],
                             "final_node": b["ptr"]}),
        batch_format="pyarrow")


register("redirect_resolution", _redirect_resolution,
         linkgraph.resolve_redirects_sql(_REDIR_ROUNDS))


register("cell_top_hosts", flagship.cell_top_hosts, f"""
{sqlgen.pages_prefix()},
counts AS (
  SELECT {sqlgen.cell_expr(flagship.CELL_TOP_HOSTS_ZOOM)} AS cell_id,
         SPLIT_PART(url, '/', 3) AS host,
         CAST(COUNT(*) AS BIGINT) AS n_pages
  FROM pages GROUP BY 1, 2
)
SELECT cell_id, host, n_pages, CAST(rn AS BIGINT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY cell_id ORDER BY n_pages DESC, host ASC) AS rn
  FROM counts)
WHERE rn <= {flagship.CELL_TOP_HOSTS_K}""")


# ------------------------------------- hierarchical rollup + analytics (r4)
from .pipelines import rollups  # noqa: E402

register("orders_rollup_revenue", rollups.orders_rollup_revenue,
         rollups.ORDERS_ROLLUP_SQL)
register("events_funnel", rollups.events_funnel, rollups.EVENTS_FUNNEL_SQL)
register("lineitem_qty_disc_corr", rollups.lineitem_qty_disc_corr,
         rollups.LINEITEM_CORR_SQL)
register("events_decayed_counts", rollups.events_decayed_counts,
         rollups.EVENTS_DECAYED_SQL)
register("events_retention_cohorts", rollups.events_retention_cohorts,
         rollups.EVENTS_RETENTION_SQL)
register("events_rolling_active_users", rollups.events_rolling_active_users,
         rollups.EVENTS_WAU_SQL)


def _events_modal_type(sf_dir: str):
    from .stages.agg import grouped_mode
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    return grouped_mode(ev, "user_id", "event_type")


def _events_modal_type_sql() -> str:
    from .stages.agg import grouped_mode_sql
    return grouped_mode_sql("events", "user_id", "event_type")


register("events_modal_type", _events_modal_type, _events_modal_type_sql())
register("events_burst_days", rollups.events_burst_days,
         rollups.EVENTS_BURST_SQL)
register("events_props_stats", rollups.events_props_stats,
         rollups.EVENTS_PROPS_SQL)
register("events_day_type_pivot", rollups.events_day_type_pivot,
         rollups.EVENTS_PIVOT_SQL)


# ------------------------------------------------------- co-citation (r4)
from .stages import cocite  # noqa: E402


def _link_cocitation(sf_dir: str):
    n = _doc_count(sf_dir)
    ids = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
    return cocite.cocitation_topk(ids, n)


register("link_cocitation", _link_cocitation, cocite.cocitation_sql())


# ------------------------------- percentile outliers + weighted sample (r4)
register("doc_length_outliers", corpus.doc_length_outliers,
         corpus.doc_length_outliers_sql())
register("doc_weighted_sample", corpus.doc_weighted_sample,
         corpus.doc_weighted_sample_sql())

# sparse lexical retrieval (BM25-style integer rank): broadcast query set,
# |Q|-group df attach, doc reduce, partial-top-k finish — one corpus scan
from .stages.tfidf import sparse_query_topk_sql  # noqa: E402

register("doc_sparse_retrieval", corpus.doc_sparse_retrieval,
         sparse_query_topk_sql("documents", corpus.RETRIEVAL_QUERY,
                               k=corpus.RETRIEVAL_K))


# cross-window change-detection raster (one scan, both windows' partials on
# the same exchange) and raster→vector boundary extraction (integer
# cross-multiplied threshold, flags-through-the-exchange existence)
register("cell_change_raster", flagship.cell_change_raster,
         flagship.cell_change_raster_sql())
register("cell_boundary_vector", flagship.cell_boundary_vector,
         flagship.cell_boundary_vector_sql())


# range-ring histograms (broadcast-index radius join, zero exchanges) and
# per-host duplication rate (fingerprints move, texts never)
register("station_ring_histogram", flagship.station_ring_histogram,
         flagship.station_ring_histogram_sql())
register("host_dup_stats", flagship.host_dup_stats,
         flagship.host_dup_stats_sql())

from .core.sqlgen_sample import hash_split_sql as _hs_sql  # noqa: E402

register("split_balance", corpus.split_balance, f"""
WITH sp AS ({_hs_sql('documents', 'doc_id', _SPLITS,
                     salt=corpus.SPLIT_SALT, select='doc_id')})
SELECT sp.split, d.lang,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(d.n_chars) AS BIGINT) AS n_chars_sum,
       CAST(SUM(d.n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
FROM documents d JOIN sp USING (doc_id)
GROUP BY 1, 2""")


# image perceptual-hash (aHash) near-dup groups: decode-where-it-lives,
# integer-thresholded 8x8 thumbnail bits packed as two uint32 halves;
# the oracle recomputes every thumb pixel from the generator arithmetic
def _image_ahash_dups(sf_dir: str):
    from .stages.multimodal import image_ahash_groups, synth_media_batch

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])
    clips = ds.map_batches(synth_media_batch, batch_format="pyarrow",
                           batch_size=256)
    return image_ahash_groups(clips)


IMAGE_AHASH_SQL = """
WITH dims AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 17 = 0 THEN (16 + (doc_id % 13) * 4) * 8
              ELSE 16 + (doc_id % 13) * 4 END AS w,
         CASE WHEN doc_id % 17 = 0 THEN (12 + (doc_id % 7) * 4) * 2
              ELSE 12 + (doc_id % 7) * 4 END AS h,
         doc_id % 16777216 AS seed
  FROM documents
),
t AS (
  SELECT media_id, w, h,
         CAST(g.k AS BIGINT) AS k,
         (((h - 1) * (g.k // 8)) // 7 * 31
          + ((w - 1) * (g.k % 8)) // 7 * 7 + seed) % 256 AS px
  FROM dims CROSS JOIN generate_series(0, 63) AS g(k)
),
s AS (SELECT media_id, CAST(SUM(px) AS BIGINT) AS s FROM t GROUP BY 1),
per AS (
  SELECT t.media_id, MAX(t.w) AS width, MAX(t.h) AS height,
         CAST(SUM(CASE WHEN t.k >= 32 AND t.px * 64 >= s.s
                       THEN CAST(1 AS BIGINT) << CAST(t.k - 32 AS INTEGER)
                       ELSE 0 END) AS BIGINT) AS ahash_hi,
         CAST(SUM(CASE WHEN t.k < 32 AND t.px * 64 >= s.s
                       THEN CAST(1 AS BIGINT) << CAST(t.k AS INTEGER)
                       ELSE 0 END) AS BIGINT) AS ahash_lo
  FROM t JOIN s USING (media_id)
  GROUP BY t.media_id
)
SELECT ahash_hi, ahash_lo, width, height,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(MIN(media_id) AS BIGINT) AS min_media_id
FROM per
GROUP BY 1, 2, 3, 4
HAVING COUNT(*) >= 2"""

register("image_ahash_dups", _image_ahash_dups, IMAGE_AHASH_SQL)


# IDW grid interpolation (J3's third kernel: scattered stations → raster)
def _cell_idw_interp(sf_dir: str):
    from .sources.fixtures import stations as _stations
    from .stages.idw import idw_interpolate

    cells = flagship.cell_aggregates(sf_dir).select_columns(["cell_id"])
    return idw_interpolate(cells, _stations())


def _cell_idw_interp_sql() -> str:
    from .core import sqlgen_knn
    from .stages.idw import idw_interpolate_sql

    return idw_interpolate_sql(sqlgen.pages_prefix(),
                               sqlgen_knn.stations_cte(), geom.BASE_ZOOM)


register("cell_idw_interp", _cell_idw_interp, _cell_idw_interp_sql())


# constant-memory quantile sketch, error-gated vs the exact selection
# quantile (same contract as the HLL distinct sketch)
def _events_value_p90_sketch(sf_dir: str):
    from .stages.qsketch import quantile_sketch

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["value"])
    return quantile_sketch(ds, "value")


register_error_gated(
    "events_value_p90_sketch", _events_value_p90_sketch,
    exact_sql="SELECT quantile_disc(value, 0.9) AS v FROM events",
    col="p90", max_rel_err=0.05)


# geo × time argmax (peak crawl day per cell) and zonal categorical mode
# (modal language per study polygon)
register("cell_peak_day", flagship.cell_peak_day,
         flagship.cell_peak_day_sql())
register("polygon_modal_lang", flagship.polygon_modal_lang,
         flagship.polygon_modal_lang_sql())


# vector → raster: polygon rasterization (covered cells by center parity)
def _polygon_raster(sf_dir: str):
    from .stages.raster import rasterize_polygons

    return rasterize_polygons()


def _polygon_raster_sql() -> str:
    from .stages.raster import rasterize_polygons_sql

    return rasterize_polygons_sql()


register("polygon_raster", _polygon_raster, _polygon_raster_sql())


# count-min frequency sketch (the third sketch family): constant-memory
# point-frequency estimate for an ad-hoc probe token, error-gated vs the
# exact token count (CM never underestimates; 4x8192 counters make the
# one-sided overshoot negligible at fixture vocabulary sizes)
def _token_freq_cm(sf_dir: str):
    import pandas as pd

    from .stages.cmsketch import cm_estimate, cm_sketch_tokens

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])
    cm = cm_sketch_tokens(ds)
    est = cm_estimate(cm, ["merge"])
    return pd.DataFrame({"cm_count": [int(est[0])]})


register_error_gated(
    "token_freq_cm", _token_freq_cm,
    exact_sql="""
SELECT CAST(COUNT(*) AS BIGINT) AS v FROM (
  SELECT UNNEST(list_filter(string_split_regex(text, '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents
) WHERE tok = 'merge'""",
    col="cm_count", max_rel_err=0.05)


# Bloom-prefiltered decontamination: same oracle (bit-identical output —
# Bloom has no false negatives; FPs die in the exact in-bucket compare),
# exchange shrunk to eval rows + Bloom survivors. r5: "auto" — the Bloom
# build only pays when the gram exchange crosses a network AND the split
# leaves a large droppable train majority (break-even documented on the
# function); single-node it resolves to the direct path, so this entry
# can never be slower than the path it claims to optimize (VERDICT #3).
# The forced-bloom machinery keeps its own equality pytest
# (tests/test_decontam.py) and FPR sweep.
def _shingle_contamination_bloom(sf_dir: str):
    from .stages.decontam import shingle_contamination

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return shingle_contamination(ds, _SPLITS, corpus.SPLIT_SALT,
                                 prefilter="auto")


register("shingle_contamination_bloom", _shingle_contamination_bloom,
         ORACLES["shingle_contamination"])


# PMI-ordered bigram collocations without a log: score is the exact
# integer (n_xy·N·2^20)//(n_x·n_y) — PMI's order, HUGEINT twin
from .stages.tfidf import bigram_collocations_sql  # noqa: E402

_N_TOKENS_SQL = ("(SELECT CAST(SUM(len(list_filter("
                 "string_split_regex(text, '\\s+'), x -> x <> ''))) "
                 "AS HUGEINT) FROM documents)")
register("doc_bigram_collocations", corpus.doc_bigram_collocations,
         bigram_collocations_sql("documents", _N_TOKENS_SQL))


# multi-resolution change detection (one exchange for every zoom level)
# and per-host spatial extents (granule-extent registration analogue)
register("tile_pyramid_delta", flagship.tile_pyramid_delta,
         flagship.tile_pyramid_delta_sql())
register("host_extent", flagship.host_extent,
         f"{sqlgen.pages_prefix()}{flagship.HOST_EXTENT_SQL_BODY}")

# per-host convex-hull extreme points (exact polygonal footprint)
register("host_hull_points", flagship.host_hull_points,
         f"{sqlgen.pages_prefix()}{flagship.HOST_HULL_SQL_BODY}")

# staggered hex-like lattice binning (H3-flavoured cells, 6 equidistant
# lateral neighbors; integer-exact row/col both sides)
register("hex_cell_agg", flagship.hex_cell_agg,
         sqlgen.pages_prefix() + flagship.HEX_CELL_SQL_BODY.format(
             lat_off=geom.LAT_OFFSET, lon_off=geom.LON_OFFSET))

# per-day vocabulary growth (Heaps-law audit): first-seen day per token,
# new/cumulative distinct counts
register("vocab_growth", flagship.vocab_growth,
         sqlgen.pages_prefix() + flagship.VOCAB_GROWTH_SQL_BODY)

# static range-table enrichment (geoip/ASN shape): broadcast sorted
# boundaries + per-batch binary search, never a shuffle join
register("ip_block_lookup", flagship.ip_block_lookup,
         sqlgen.pages_prefix() + flagship.ip_block_lookup_sql())

# host token-profile cosine pairs (dense small-cardinality Gram pattern:
# one int64 matmul per bucket group, never a sum-of-df^2 pair expansion)
register("host_token_similarity", flagship.host_token_similarity,
         sqlgen.pages_prefix() + flagship.host_token_similarity_sql())


# per-user event-type Markov transitions (the behavioural bigram table)
register("event_transitions", relational.event_transitions,
         relational.EVENT_TRANSITIONS_SQL)


# BFS frontier depth over the generated link graph (level structure —
# the fourth iterative-graph primitive beside rank/label/pointer-doubling)
_BFS_SEEDS = (0,)
_BFS_ROUNDS = 4


def _link_bfs_depth(sf_dir: str):
    n = _doc_count(sf_dir)
    ids = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
    return linkgraph.bfs_depth(ids, n, _BFS_SEEDS, rounds=_BFS_ROUNDS)


register("link_bfs_depth", _link_bfs_depth,
         linkgraph.bfs_depth_sql(_BFS_SEEDS, rounds=_BFS_ROUNDS))


# conversion-window funnel (first purchase at/after first signup, ≤7d)
register("events_funnel_windowed", rollups.events_funnel_windowed,
         rollups.EVENTS_FUNNEL_WINDOWED_SQL)


# 8-sector compass histograms per station (integer octant classification)
register("station_sector_histogram", flagship.station_sector_histogram,
         flagship.station_sector_histogram_sql())


# language-ID confusion matrix (label × prediction counts — the
# classifier-evaluation composition, exact via the lang_id CASE twin)
register("lang_confusion", corpus.lang_confusion, f"""
WITH pred AS ({sqlgen_text.lang_id_query()})
SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n
FROM documents d JOIN pred p USING (doc_id)
GROUP BY 1, 2""")


# Q4-shaped EXISTS (semi-join semantics) and polygon raster-area stats
register("rel_q4_exists", relational.q4_exists_priority,
         relational.Q4_EXISTS_SQL)


def _polygon_cell_area(sf_dir: str):
    from .stages.raster import polygon_cell_area

    return polygon_cell_area()


def _polygon_cell_area_sql() -> str:
    from .stages.raster import polygon_cell_area_sql

    return polygon_cell_area_sql()


register("polygon_cell_area", _polygon_cell_area, _polygon_cell_area_sql())


# video scene-cut counts (multimodal × temporal): integer frame-sum
# deltas vs T·h·w; the oracle recomputes every frame sum from the
# FAKV1 generator arithmetic and LAGs over frames
def _video_scene_changes(sf_dir: str):
    from .stages.multimodal import synth_video_batch, video_scene_changes

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])
    clips = ds.map_batches(synth_video_batch, batch_format="pyarrow",
                           batch_size=256)
    return video_scene_changes(clips)


VIDEO_SCENE_SQL = """
WITH dims AS (
  SELECT doc_id AS media_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 4 AS h,
         4 + (doc_id % 11) AS nf,
         doc_id % 16777216 AS seed
  FROM documents
), fs AS (
  SELECT media_id, nf, w, h, CAST(f.f AS BIGINT) AS f,
         CAST(SUM((r.r * 31 + c.c * 7 + f.f * 13 + seed) % 256)
              AS BIGINT) AS s
  FROM dims
  CROSS JOIN generate_series(0, 13) AS f(f)
  CROSS JOIN generate_series(0, 13) AS r(r)
  CROSS JOIN generate_series(0, 35) AS c(c)
  WHERE f.f < nf AND r.r < h AND c.c < w
  GROUP BY 1, 2, 3, 4, 5
), d AS (
  SELECT media_id, nf, w, h, s,
         LAG(s) OVER (PARTITION BY media_id ORDER BY f) AS prev_s
  FROM fs
)
SELECT media_id, CAST(MAX(nf) AS BIGINT) AS n_frames,
       CAST(SUM(CASE WHEN prev_s IS NOT NULL
                      AND ABS(s - prev_s) > 2 * h * w
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_changes
FROM d GROUP BY 1"""

register("video_scene_changes", _video_scene_changes, VIDEO_SCENE_SQL)


# deterministic per-cell exemplar page + per-cell crawl-day completeness
register("cell_exemplar", flagship.cell_exemplar,
         flagship.cell_exemplar_sql())
register("cell_day_coverage", flagship.cell_day_coverage,
         flagship.cell_day_coverage_sql())


# growth accounting (cumulative distinct users) and per-host split-half
# consistency (interleaved-sampling stability)
register("events_cumulative_users", relational.events_cumulative_users,
         relational.EVENTS_CUMULATIVE_USERS_SQL)
register("host_split_half", flagship.host_split_half,
         flagship.host_split_half_sql())


# deeper TPC-H-shaped distributed-join coverage (tpch_extra.py): nation-pair
# volume shipping, returned-item top customers, large-volume HAVING self-join,
# dormant above-average customers (integer cross-multiplied predicate + ANTI)
from .pipelines import tpch_extra  # noqa: E402

register("rel_q7_volume", tpch_extra.q7_volume_shipping, tpch_extra.Q7_SQL)
register("rel_q10_returned", tpch_extra.q10_returned_items,
         tpch_extra.Q10_SQL)
register("rel_q18_large_volume", tpch_extra.q18_large_volume,
         tpch_extra.Q18_SQL)
register("rel_q22_dormant", tpch_extra.q22_dormant_customers,
         tpch_extra.Q22_SQL)


# RAG-style sliding token-window chunking + global token-budget curation
# (greedy quality-ranked prefix under a corpus-wide token budget, found
# via a bounded per-score aggregate instead of a global sort)
from .stages import chunk as _chunk  # noqa: E402


def _doc_chunks(sf_dir: str):
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return _chunk.doc_token_chunks(ds)


def _doc_budget_select(sf_dir: str, budget: int = 20000):
    return _chunk.token_budget_select(
        lambda: read_parquet_clean(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"]),
        budget=budget)


register("doc_chunks", _doc_chunks, _chunk.doc_token_chunks_sql())
register("doc_budget_select", _doc_budget_select,
         _chunk.token_budget_select_sql(20000))


# connected components over the undirected intra-class link graph
# (distributed min-label propagation; recursive-CTE fixpoint twin)
def _link_components(sf_dir: str):
    n = _doc_count(sf_dir)
    ids = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
    return linkgraph.link_components(ids, n)


register("link_components", _link_components, linkgraph.link_components_sql())


# peak interval concurrency per event type (boundary sweep)
register("events_max_concurrency", windows.events_max_concurrency,
         windows.EVENTS_MAX_CONCURRENCY_SQL)


# Q17 correlated-average predicate (one-exchange) and Q11 global-share HAVING
register("rel_q17_small_qty", tpch_extra.q17_small_quantity,
         tpch_extra.q17_sql())
register("rel_q11_important_parts", tpch_extra.q11_important_parts,
         tpch_extra.q11_sql())


# distance-to-coast: nearest polygon vertex (broadcast vertex matrix,
# exact int64 milli-deg² distances, lexicographic-min pid tie-break)
from .stages.pip import coast_distance, coast_distance_sql  # noqa: E402


def _coast_distance(sf_dir: str):
    ds = flagship.geocoded_pages(sf_dir).select_columns(
        ["page_key", "lon_milli", "lat_milli"])
    return coast_distance(ds)


register("coast_distance", _coast_distance,
         f"{sqlgen.pages_prefix()},\n{coast_distance_sql()}")


# Q21 sole-straggler shape: unique latest shipper in multi-supplier orders
register("rel_q21_stragglers", tpch_extra.q21_straggler_suppliers,
         tpch_extra.Q21_SQL)


# VAD-style audio segmentation (energy-gated frame runs over FAKA1 clips)
def _audio_vad(sf_dir: str):
    from .stages.multimodal import audio_vad_segments, synth_audio_batch

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])
    clips = ds.map_batches(synth_audio_batch, batch_format="pyarrow",
                           batch_size=256)
    return audio_vad_segments(clips)


from .stages.multimodal import AUDIO_VAD_SQL  # noqa: E402

register("audio_vad_segments", _audio_vad, AUDIO_VAD_SQL)


# exact quantized second-moment (PCA precursor) over the embedding column
def _embedding_second_moment(sf_dir: str):
    from .stages import ann as _ann
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])
    return _ann.embedding_second_moment(ds)


def _embedding_second_moment_sql() -> str:
    from .stages.ann import embedding_second_moment_sql
    return embedding_second_moment_sql(dim=64)


register("embedding_second_moment", _embedding_second_moment,
         _embedding_second_moment_sql())


# out-of-coverage masking: pages beyond _RADIUS_MILLI of EVERY station
def _station_coverage_gaps(sf_dir: str):
    from .stages.knn import coverage_gaps
    ds = flagship.geocoded_pages(sf_dir).select_columns(
        ["page_key", "lon_milli", "lat_milli"])
    return coverage_gaps(ds, _RADIUS_MILLI)


register("station_coverage_gaps", _station_coverage_gaps, f"""
{sqlgen.pages_prefix()},
{sqlgen_knn.stations_cte()},
m AS (
  SELECT page_key,
         MIN((p.lon_milli - s.s_lon) * (p.lon_milli - s.s_lon)
             + (p.lat_milli - s.s_lat) * (p.lat_milli - s.s_lat)) AS d2
  FROM pages p CROSS JOIN stations s GROUP BY 1
)
SELECT page_key, d2 FROM m
WHERE d2 > {_RADIUS_MILLI} * {_RADIUS_MILLI}""")


# the remaining ten classic TPC-H shapes (tpch_full.py) — 22/22 coverage
from .pipelines import tpch_full  # noqa: E402

register("rel_q2_min_cost", tpch_full.q2_min_cost_supplier,
         tpch_full.Q2_SQL)
register("rel_q8_market_share", tpch_full.q8_market_share,
         tpch_full.Q8_SQL)
register("rel_q9_profit", tpch_full.q9_product_profit, tpch_full.Q9_SQL)
register("rel_q12_shipmode", tpch_full.q12_shipmode_priority,
         tpch_full.Q12_SQL)
register("rel_q13_custdist", tpch_full.q13_customer_distribution,
         tpch_full.Q13_SQL)
register("rel_q14_promo", tpch_full.q14_promo_share, tpch_full.Q14_SQL)
register("rel_q15_top_supplier", tpch_full.q15_top_supplier,
         tpch_full.Q15_SQL)
register("rel_q16_supplier_counts", tpch_full.q16_supplier_counts,
         tpch_full.Q16_SQL)
register("rel_q19_brackets", tpch_full.q19_bracket_revenue,
         tpch_full.Q19_SQL)
register("rel_q20_excess", tpch_full.q20_excess_suppliers,
         tpch_full.Q20_SQL)

# ---- round-4 continuation block C: grouping sets, skyline ----------------
register("events_cube_counts", rollups.events_cube_counts,
         rollups.EVENTS_CUBE_SQL)
register("orders_pareto", rollups.orders_pareto, rollups.ORDERS_PARETO_SQL)

from .stages import cluster as _cluster  # noqa: E402

register("cell_dbscan", _cluster.cell_dbscan, _cluster.cell_dbscan_sql())
register("embedding_kmeans_assign", corpus.embedding_kmeans_assign,
         corpus.KMEANS_ASSIGN_SQL)
register("host_lang_gini", flagship.host_lang_gini,
         flagship.host_lang_gini_sql())
register("split_token_tv", corpus.split_token_tv, corpus.SPLIT_TOKEN_TV_SQL)
register("session_type_pairs", windows.session_type_pairs,
         windows.SESSION_TYPE_PAIRS_SQL)
register("events_time_weighted_avg", windows.events_time_weighted_avg,
         windows.EVENTS_TWA_SQL)
register("docs_checksum", corpus.docs_checksum, corpus.docs_checksum_sql())
register("host_capped_topk", flagship.host_capped_topk,
         flagship.host_capped_topk_sql())

from .stages import fuzzy as _fuzzy  # noqa: E402


def _token_typo_pairs(sf_dir: str):
    from .sources.readers import read_parquet_clean
    return _fuzzy.token_typo_pairs(
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"]))


register("token_typo_pairs", _token_typo_pairs, _fuzzy.token_typo_pairs_sql())
register("host_trend_slope", flagship.host_trend_slope,
         flagship.host_trend_slope_sql())
register("cluster_top_tokens", corpus.cluster_top_tokens,
         corpus.CLUSTER_TOP_TOKENS_SQL)
register("cell_centroid_drift", flagship.cell_centroid_drift,
         flagship.cell_centroid_drift_sql())
register("cell_shard_plan", flagship.cell_shard_plan,
         flagship.cell_shard_plan_sql())


def _link_reciprocity(sf_dir: str):
    n = _doc_count(sf_dir)
    ids = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
    return linkgraph.link_reciprocity(ids, n)


register("link_reciprocity", _link_reciprocity,
         linkgraph.link_reciprocity_sql())
register("dup_cluster_histogram", corpus.dup_cluster_histogram,
         corpus.dup_cluster_histogram_sql())


# ------------------------------------- round-4 continuation: HITS + big-big
# spatial self-join (the two remaining graph/join shapes)

def _link_hits(sf_dir: str):
    n = _doc_count(sf_dir)
    ids = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
    return linkgraph.hits_scores(ids, n, iterations=2)


register("link_hits", _link_hits, linkgraph.hits_sql(2))


def _spatial_pairs(sf_dir: str):
    from .stages.geocode import geocode
    from .stages.spatial_join import within_radius_pairs
    pages = geocode(pages_dataset(sf_dir, with_text=False))
    return within_radius_pairs(pages, 250)


from .stages.spatial_join import within_radius_pairs_sql  # noqa: E402

register("spatial_pairs_250", _spatial_pairs,
         f"{sqlgen.pages_prefix()},\n{within_radius_pairs_sql(250)}")


# per-host boilerplate vocabulary (site-level curation: tokens in >=90% of
# a host's docs)
# r5: per-host distinct-token HLL register table — grouped cardinality
# sketches with a bit-exact construction twin (recursive-CTE FNV-1a +
# splitmix64 + exact bit-length ρ); the float estimate is pytest-gated
register("host_distinct_tokens_hll", flagship.host_distinct_tokens_hll,
         f"{sqlgen.pages_prefix()},\n{flagship.host_distinct_tokens_hll_sql()}")

register("host_boilerplate_tokens", flagship.host_boilerplate_tokens,
         f"{sqlgen.pages_prefix()},\n{flagship.HOST_BOILERPLATE_SQL}")


register("host_boilerplate_strip", flagship.host_boilerplate_strip,
         f"{sqlgen.pages_prefix()},\n{flagship.HOST_BOILERPLATE_STRIP_SQL}")


# r5: GLOBAL frequent-segment removal (CCNet/RefinedWeb line-level dedup
# over a newline-free corpus: aligned k-token pseudo-paragraphs) — the
# cross-site counterpart of host_boilerplate_strip. One segment-keyed df
# exchange + broadcast apply; see stages/segstrip.py for the 100-TB notes.
def _segment_dedup_strip(sf_dir: str):
    from .stages.segstrip import frequent_segment_strip

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return frequent_segment_strip(ds)


from .stages.segstrip import segment_dedup_strip_sql  # noqa: E402

register("segment_dedup_strip", _segment_dedup_strip,
         segment_dedup_strip_sql())


# cross-host mirror detection (seeded, like embedding_dup_pairs_ivf)
register("host_mirror_pairs", flagship.host_mirror_pairs,
         f"{sqlgen.pages_prefix()},\n{flagship.host_mirror_pairs_sql()}")


# Z-order (Morton) range-shard planning — spatially compact shards
register("cell_morton_plan", flagship.cell_morton_plan,
         flagship.cell_morton_plan_sql())


# stop-token-normalized dedup (template-varied copies surface only after
# normalization; seeded variants, like host_mirror_pairs)
register("dedup_template_normalized", flagship.dedup_template_normalized,
         f"{sqlgen.pages_prefix()},\n{flagship.dedup_template_normalized_sql()}")


# k-core of the link graph (iterative distributed peel; unrolled-peel twin)
def _link_kcore(sf_dir: str):
    n = _doc_count(sf_dir)
    ids = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
    return linkgraph.kcore(ids, n, k=4)


register("link_kcore", _link_kcore, linkgraph.kcore_sql(k=4))


# per-user exact median absolute deviation (robust spread, by selection)
def _event_value_mad(sf_dir: str):
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])
    return quantile.grouped_mad(ev, "user_id", "value")


register("event_value_mad", _event_value_mad,
         quantile.grouped_mad_sql("events", "user_id", "value"))


# crawl-history + crawl-policy family (pipelines/webhistory.py): SCD2
# version intervals over seeded crawl epochs, robots.txt-style
# longest-prefix policy application, and directed (containment) near-dup
from .pipelines import webhistory

register("scd2_url_history", webhistory.scd2_url_history,
         f"{sqlgen.pages_prefix()},\n{webhistory.scd2_url_history_sql()}")

register("robots_policy", webhistory.robots_policy,
         f"{sqlgen.pages_prefix()},\n{webhistory.robots_policy_sql()}")

# change-rate-ordered recrawl schedule (Cho & Garcia-Molina revisit
# policy over the SCD2 seeded epochs); zero text bytes read
register("url_revisit_priority", webhistory.url_revisit_priority,
         sqlgen.pages_prefix() + webhistory.url_revisit_priority_sql())

# exact directed containment (quote/excerpt detection). Gate-scale like
# ngram_jaccard_pairs: the per-gram pair expansion is the SAME Σ df² the
# DuckDB twin pays, and both degenerate identically on vocabulary-
# saturated corpora — raises loudly past CONTAIN_MAX_DF instead of
# silently truncating.
register("containment_pairs", webhistory.containment_pairs,
         f"{sqlgen.pages_prefix()},\n{webhistory.containment_pairs_sql()}")


# LLM sequence packing (concat-and-chunk): distributed exclusive prefix
# sum of token counts over the doc_id order; window-cumsum twin
register("pack_sequences", corpus.pack_sequences,
         corpus.pack_sequences_sql())

# deterministic-shuffle packing (the epoch permutation): stream order =
# (splitmix64(doc_id), doc_id); same 3-step scan, hash-prefix ranges
register("pack_sequences_shuffled",
         lambda sf: corpus.pack_sequences(sf, shuffled=True),
         corpus.pack_sequences_shuffled_sql())

# per-sequence composition (docs touched / started / crossing — the
# attention-mask boundary accounting); seq_len=128 so the fixture packs
# into ~2-4 docs per sequence instead of one giant sequence
register("pack_seq_stats",
         lambda sf: corpus.pack_seq_stats(sf, seq_len=128),
         corpus.pack_seq_stats_sql(seq_len=128))

# length-bucketed bin packing (power-of-two slots, no cross-doc
# attention) — the padding-efficiency counterpart of concat-and-chunk
register("pack_bins_bucketed", corpus.pack_bins_bucketed,
         corpus.pack_bins_bucketed_sql())


# Content-defined chunking (anchor/Gear rolling hash, stages/cdc.py):
# boundaries move WITH the content, so chunk-level dedup survives edits
# that shift byte offsets. cdc_chunks = the chunk table (one streaming
# scan, no exchange); cdc_dup_chunks = chunk-store dedup accounting
# (one sig-bucket exchange). Twins run the same splitmix64/2^k-window
# arithmetic in HUGEINT.
from .stages import cdc as _cdc  # noqa: E402

register("cdc_chunks", corpus.cdc_doc_chunks, _cdc.cdc_chunks_sql())
register("cdc_dup_chunks", corpus.cdc_dup_chunk_stats,
         _cdc.cdc_dup_chunks_sql())

# sub-document near-dup: doc pairs sharing >=1 distinct chunk signature
# (boilerplate/quote overlap below whole-doc granularity); Σ df² cost =
# the twin's, loud guard past CDC_OVERLAP_MAX_DF
register("cdc_doc_overlap", corpus.cdc_doc_overlap_pairs,
         _cdc.cdc_doc_overlap_sql())

# temperature-scaled (alpha=0.5) multilingual mixture plan — integer-
# exact sampling schedule (share_ppm / target_docs / epochs_ppm)
register("lang_mixture_plan", corpus.lang_mixture_plan,
         corpus.lang_mixture_plan_sql())

# the APPLY half: deterministic per-doc copy counts realizing epochs_ppm
# (whole epochs + hash-thresholded fractional epoch)
register("lang_mixture_apply", corpus.lang_mixture_apply,
         corpus.lang_mixture_apply_sql())

# FineWeb-style curation v2: classifier gate -> exact dedup -> temperature
# rebalance, all stages fused streaming with broadcast-back dup map
register("curate_corpus_semantic", corpus.curate_corpus_semantic,
         corpus.curate_corpus_semantic_sql())

# politeness-wave crawl schedule: per-host frontier counts -> count
# histogram -> suffix-cumsum wave profile (hot-host skew = the tail)
register("crawl_wave_plan", webhistory.crawl_wave_plan,
         f"{sqlgen.pages_prefix()},\n{webhistory.crawl_wave_plan_sql()}")

# rendezvous (HRW) shard plan: populations under S and S+1 shards plus
# per-shard movement (≈N/(S+1) total — the consistent-placement win)
from .stages import placement as _placement  # noqa: E402

register("hrw_shard_plan", webhistory.hrw_doc_shards,
         _placement.hrw_shard_plan_sql(8))

# max-min-fair crawl budget (water-filling): saturate small hosts, clamp
# the hot host to the waterline; remainder +1 by host order
# cross-epoch content drift at CDC-chunk granularity: prepend-edit
# seeded epoch pair; drift = 1 - Jaccard of per-host chunk-sig sets
register("host_content_drift", webhistory.host_content_drift,
         webhistory.host_content_drift_sql())

register("crawl_budget_alloc", webhistory.crawl_budget_alloc,
         f"""{sqlgen.pages_prefix()},
hc AS (
  SELECT SPLIT_PART(url, '/', 3) AS host,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pages GROUP BY host
),
{_placement.crawl_budget_waterfill_sql(webhistory.CRAWL_BUDGET)}""")


# exact duplicated-substring span coverage (Lee et al. 2022 exact
# substring dedup accounting): per doc, the union size of [pos, pos+L)
# intervals whose L-gram occurs in ANOTHER doc. Gram key = the raw
# utf-32 window bytes (string-exact, not hash-exact); two bucketed
# exchanges, every kernel vectorized (stages/dupspan.py)
from .stages import dupspan as _dupspan  # noqa: E402

register("dup_span_coverage", corpus.dup_span_report,
         _dupspan.dup_span_coverage_sql())


# directed Hausdorff coverage audits (stages/hausdorff.py): exact int64
# max-min squared milli-degree distances between the page cloud and the
# broadcast station network, both directions. Host partials collapse
# per batch (hot-host skew costs one partial row, not a hot reducer);
# the station direction finishes coalesced (station-bounded).
from .stages import hausdorff as _hausdorff  # noqa: E402


def _host_station_hausdorff(sf_dir: str):
    ds = flagship.geocoded_pages(sf_dir).select_columns(
        ["page_key", "url", "lon_milli", "lat_milli"])
    return _hausdorff.host_station_hausdorff(ds)


register("host_station_hausdorff", _host_station_hausdorff,
         f"{sqlgen.pages_prefix()},{_hausdorff.host_station_hausdorff_sql()}")


def _station_nearest_page(sf_dir: str):
    ds = flagship.geocoded_pages(sf_dir).select_columns(
        ["lon_milli", "lat_milli"])
    return _hausdorff.station_nearest_page(ds)


register("station_nearest_page", _station_nearest_page,
         f"{sqlgen.pages_prefix()},{_hausdorff.station_nearest_page_sql()}")


# directed out->in degree assortativity (Newman 2002 mixing): six exact
# int64 moment sums factored through the target (one dst-bucket
# exchange, no edge join), fixed IEEE finish (stages/linkgraph.py)
def _link_assortativity(sf_dir: str):
    n = _doc_count(sf_dir)
    ids = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
    return linkgraph.degree_assortativity(ids, n)


register("link_assortativity", _link_assortativity,
         linkgraph.degree_assortativity_sql())


# BPE training merge selection (Sennrich 2016 pass 1): exact adjacent
# code-point pair counts within words, deterministic top-k; alphabet-
# bounded partials, coalesced finish, zero wide exchanges
from .stages import bpe as _bpe  # noqa: E402


def _bpe_merge_candidates(sf_dir: str):
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])
    return _bpe.bpe_merge_candidates(ds)


register("bpe_merge_candidates", _bpe_merge_candidates,
         _bpe.bpe_merge_candidates_sql())


# BPE training iteration 2: greedy-apply merge #1 (REPLACE semantics on
# both sides), recount, re-rank — the iterative step of tokenizer
# training as a two-scan pipeline (stages/bpe.py)
def _bpe_second_merge(sf_dir: str):
    return _bpe.bpe_second_merge(
        lambda: read_parquet_clean(f"{sf_dir}/documents.parquet",
                                   columns=["text"]))


register("bpe_second_merge", _bpe_second_merge,
         _bpe.bpe_second_merge_sql())


# leading principal component by exact fixed-point power iteration:
# distributed int64 Gram partials + a D-sized driver eigensolve whose
# shift/truncate arithmetic is mirrored bit-for-bit in the twin
from .stages import pca as _pca  # noqa: E402


def _embedding_pca_power(sf_dir: str):
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])
    return _pca.embedding_pca_power(ds)


register("embedding_pca_power", _embedding_pca_power,
         _pca.embedding_pca_power_sql())


# all-but-the-top debias (Mu & Viswanath 2018): orthogonal-projection
# residual cross-multiplied by ||v||^2 (no division — exact int64),
# dominant direction broadcast, one streaming corpus scan
def _embedding_debias(sf_dir: str):
    return _pca.embedding_debias(
        lambda: read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                   columns=["vec_id", "embedding"]))


register("embedding_debias", _embedding_debias,
         _pca.embedding_debias_sql())


# greedy k-center coreset (Gonzalez farthest-point): k argmax scans over
# the materialized quantized corpus, chosen set driver-sized, candidate
# vectors ride partials as blobs — no wide exchange
from .stages import kcenter as _kcenter  # noqa: E402


def _embedding_kcenter(sf_dir: str):
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    return _kcenter.embedding_kcenter(ds)


register("embedding_kcenter", _embedding_kcenter,
         _kcenter.embedding_kcenter_sql())


# exact grouped trimmed mean (robust location): value-histogram shape
# (no row sort), trim as cumulative-count clipping, one IEEE division
# r5: exact distributed NTILE (equi-depth re-partitioner) without a
# global sort — value-CDF broadcast + one val_c-keyed bucket exchange
register("events_ntile_shards", relational.events_ntile_shards,
         relational.events_ntile_shards_sql())

register("events_ntile_by_type", relational.events_ntile_by_type,
         relational.events_ntile_by_type_sql())

# r5: stream × SCD2 temporal as-of dimension join (fact never shuffles;
# dimension dense-resolved on the driver and broadcast)
register("events_user_tier_asof", relational.events_user_tier_asof,
         relational.EVENTS_USER_TIER_ASOF_SQL)

# r5: winsorized mean (clamp at exact DISC percentiles) — the
# count-preserving robust-mean companion of the trimmed mean; fully
# histogram-derived, one streaming execution
register("event_value_winsor_mean", relational.event_value_winsor_mean,
         relational.event_value_winsor_mean_sql())

register("event_value_trimmed_mean", relational.event_value_trimmed_mean,
         relational.event_value_trimmed_mean_sql())


# train/eval EMBEDDING leakage: the seeded exact near-dup pairs whose
# endpoints land in different hash splits — the semantic-dup counterpart
# of split_contamination (which only sees token n-grams). Split label is
# a pure function of vec_id on both sides; pairs are the oracle-exact
# seeded baseline, so the twin is generator arithmetic + the split CTE.
def _split_embedding_leakage(sf_dir: str):
    from .stages.ann import embedding_dup_pairs
    from .stages.sample import split_labels

    seeded, n = _seeded_embeddings(sf_dir)
    pairs = embedding_dup_pairs(seeded, threshold=0.95,
                                docs_hint=n)[["id_a", "id_b"]]
    import numpy as _np
    sa = split_labels(pairs.id_a.to_numpy().astype(_np.int64),
                      _SPLITS, salt=23)
    sb = split_labels(pairs.id_b.to_numpy().astype(_np.int64),
                      _SPLITS, salt=23)
    out = pairs.assign(split_a=sa, split_b=sb)
    out = out[out.split_a != out.split_b]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


register("split_embedding_leakage", _split_embedding_leakage, f"""
WITH sp AS ({hash_split_sql(
    f'''(SELECT vec_id FROM embeddings
     UNION ALL
     SELECT vec_id + {_SEED_OFFSET} FROM embeddings
     WHERE vec_id % {_SEED_MOD} = 0)''',
    'vec_id', _SPLITS, salt=23, select='vec_id')})
SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b
FROM (SELECT vec_id AS id_a, vec_id + {_SEED_OFFSET} AS id_b
      FROM embeddings WHERE vec_id % {_SEED_MOD} = 0) p
JOIN sp sa ON sa.vec_id = p.id_a
JOIN sp sb ON sb.vec_id = p.id_b
WHERE sa.split <> sb.split""")


# morphological opening of the coverage raster (erode -> dilate, 5-cell
# cross): the speckle filter of the raster family, two grid-bounded
# flag exchanges, integer-only predicates
register("cell_raster_open", flagship.cell_raster_open,
         flagship.cell_raster_open_sql())


# per-source data-mixture card (provenance accounting over the fixture's
# `source` column): skew-neutral (source, lang) partials, tiny finish
register("source_quality_report", corpus.source_quality_report, """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars_sum,
       CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS mean_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
FROM documents GROUP BY source""")
