"""Benchmark harness (driver contract).

Runs the headline spatial-join + tile-assignment pipeline plus a
representative query set over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "docs": N, "docs_per_sec": ...}

``--scaling``: runs the headline twice in fresh processes
(num_cpus=8 then 32) on the same input and reports both throughputs plus
scaling efficiency (recorded in BASELINE.md per north_rule).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "geocode_cells", "cell_agg", "tile_pyramid", "pip_join_inner",
    "pip_cell_agg", "knn_stations", "dedup_exact", "text_stats",
    "lang_id", "latest_page_per_cell", "rel_q1_pricing",
    "rel_priority_revenue", "ann_topk", "minhash_pairs",
    "simhash_pairs", "events_sessionize", "bilinear_cells",
    # round 2 additions
    "events_sessionize_sorted", "ensemble_cell_means", "cell_gradients",
    "rel_q3_shipping", "dedup_near_corpus", "media_features",
    "embedding_dup_pairs", "ann_topk_ivf",
    # round 3 additions
    "curate_corpus", "events_asof_order", "events_sliding_window",
    "events_incident_window", "clicks_nearest_error", "audio_features",
    "winnow_dup_pairs", "embedding_dup_pairs_ivf",
    # round 3 late block. ngram_jaccard_pairs / split_contamination are
    # NOT benched at sf0.1: the synthetic word-salad corpus saturates its
    # tiny vocabulary there, degenerating ANY exact inverted-index join
    # (the DuckDB twin alike) — a fixture artifact, not an engine path;
    # both stay in the sf0.01 correctness gate where buckets are tiny.
    "host_stats", "top_tokens",
    "dedup_near_corpus_keep_best", "doc_repetition",
    # round 4: exact Jaccard through the DISTRIBUTED prefix path on a
    # Zipfian-vocabulary corpus (the broadcast-path queries above stay
    # gated out of sf0.1 per the saturation note)
    "ngram_jaccard_pairs_zipf",
    # round 4 continuation: window analytics, tf-idf, canonical-url /
    # incremental-crawl ops, text prep
    "events_lag_delta", "customer_running_revenue", "doc_distinctive_terms",
    "dedup_canonical_url", "crawl_diff_3way", "doc_clean", "doc_redact",
    # round 4 late block: link-graph analytics, inverted index, crawl policy
    "link_pagerank", "link_indegree", "url_token_index",
    "url_blocklist_filter",
    # round 4 late block 2: WET extraction, geo-constrained ANN, host
    # authority rollup, per-host crawl budget
    "html_extract_text", "ann_topk_bbox", "host_authority",
    "host_quota_sample", "stations_within_radius", "redirect_resolution",
    "cell_top_hosts",
    # round 4 late block 3: doc surprisal (shares the tf/df exchange),
    # exact grouped quantiles
    "doc_token_surprisal", "events_value_quantiles",
    # round 4 late block 4: raster stencils / change detection / boundary
    # vectorization, diurnal profile, range rings, curation audits,
    # sparse retrieval, passage decontamination
    "cell_focal_mean", "local_hour_profile", "cell_change_raster",
    "cell_boundary_vector", "station_ring_histogram", "host_dup_stats",
    "split_balance", "doc_sparse_retrieval", "shingle_contamination",
    # round 4 late block 5: IDW interpolation, multimodal aHash dedup,
    # quantile sketch, geo×time argmax, zonal mode, vector→raster
    "cell_idw_interp", "image_ahash_dups", "events_value_p90_sketch",
    "cell_peak_day", "polygon_modal_lang", "polygon_raster",
    # round 4 late block 6: CM frequency sketch, PMI collocations,
    # Bloom-prefiltered decontamination
    "token_freq_cm", "doc_bigram_collocations",
    "shingle_contamination_bloom",
    # round 4 late block 7: multi-resolution change detection, extents,
    # behavioural transitions, BFS levels
    "tile_pyramid_delta", "host_extent", "event_transitions",
    "link_bfs_depth", "station_sector_histogram", "events_funnel_windowed",
    # round 4 late block 8: classifier eval, EXISTS semantics, raster
    # area, video scene cuts, spatial exemplars, temporal completeness
    "lang_confusion", "rel_q4_exists", "polygon_cell_area",
    "video_scene_changes", "cell_exemplar", "cell_day_coverage",
    "events_cumulative_users", "host_split_half",
    # round 4 late block 9: deep TPC-H distributed-join shapes
    "rel_q7_volume", "rel_q10_returned", "rel_q18_large_volume",
    "rel_q22_dormant", "rel_q17_small_qty", "rel_q11_important_parts",
    # round 4 late block 10: RAG chunking, token-budget curation, graph
    # components, interval concurrency
    "doc_chunks", "doc_budget_select", "link_components",
    "events_max_concurrency",
    # round 4 late block 11: coast distance, Q21 stragglers, audio VAD,
    # embedding second moment, coverage gaps
    "coast_distance", "rel_q21_stragglers", "audio_vad_segments",
    "embedding_second_moment", "station_coverage_gaps",
    # round 4 late block 12: the remaining TPC-H join shapes (22/22)
    "rel_q2_min_cost", "rel_q8_market_share", "rel_q9_profit",
    "rel_q12_shipmode", "rel_q13_custdist", "rel_q14_promo",
    "rel_q15_top_supplier", "rel_q16_supplier_counts", "rel_q19_brackets",
    "rel_q20_excess",
    # round 4 late block 13: grouping sets, skyline, clustering, drift,
    # session baskets, TWA, checksum
    "events_cube_counts", "orders_pareto", "cell_dbscan",
    "embedding_kmeans_assign", "host_lang_gini", "split_token_tv",
    "session_type_pairs", "events_time_weighted_avg", "docs_checksum",
    # round 4 late block 14: capped selection, fuzzy vocab, trends,
    # cluster characterization, drift, shard planning
    "host_capped_topk", "token_typo_pairs", "host_trend_slope",
    "cluster_top_tokens", "cell_centroid_drift", "cell_shard_plan",
    "link_reciprocity", "dup_cluster_histogram",
    # round 4 late block 15: HITS reverse propagation, big-big spatial
    # self-join (grid blocking + half-plane replication)
    "link_hits", "spatial_pairs_250", "host_boilerplate_tokens",
    "host_boilerplate_strip", "host_mirror_pairs", "cell_morton_plan",
    "dedup_template_normalized",
    # round 4 late block 16: SCD2 crawl history, robots longest-prefix
    # policy (containment_pairs stays gate-scale — exact Σ df² family,
    # saturated-vocabulary pathology at sf0.1, like ngram_jaccard_pairs)
    "scd2_url_history", "robots_policy", "pack_sequences",
    # round 4 late block 17: packed-sequence accounting, content-defined
    # chunking (storage dedup), int8 quantization, mixture/crawl planning
    "pack_seq_stats", "cdc_chunks", "cdc_dup_chunks",
    "embedding_quantize", "lang_mixture_plan", "crawl_wave_plan",
    # round 4 late block 18: shuffle-order packing, bucketed bins,
    # ADC retrieval over the int8 store
    "pack_sequences_shuffled", "pack_bins_bucketed", "ann_topk_quantized",
    # round 4 late block 19: placement planning
    "hrw_shard_plan", "crawl_budget_alloc",
    # round 4 late block 20: sub-doc overlap + cross-epoch drift (CDC)
    "cdc_doc_overlap", "host_content_drift",
    # round 4 session 5: exact duplicated-substring span coverage;
    # directed Hausdorff coverage audits (both directions)
    "dup_span_coverage", "host_station_hausdorff", "station_nearest_page",
    "link_assortativity", "bpe_merge_candidates", "bpe_second_merge",
    "embedding_pca_power", "embedding_debias", "embedding_kcenter",
    "event_value_trimmed_mean", "split_embedding_leakage",
    "cell_raster_open", "source_quality_report",
    # round 4 session 6: SemDeDup end-to-end (cluster-bucketed
    # within-cluster pairwise + keep-one); hashed linear quality classifier
    "semdedup_keep", "doc_classifier_score", "lang_mixture_apply",
    "host_hull_points", "hex_cell_agg", "top_tokens_mg", "vocab_growth",
    "url_revisit_priority", "curate_corpus_semantic", "ip_block_lookup",
    "host_token_similarity", "pages_pass_radius", "pip_donut",
    "host_anomalous_slots", "source_dup_matrix", "split_vocab_jaccard",
    "link_ppr", "link_walk_visits", "events_percent_rank",
    "cell_lang_simpson",
    # round 5: exact ANN serving twins, global segment dedup (CCNet line
    # analogue), grouped per-host HLL cardinality sketches
    "ann_topk_lsh", "segment_dedup_strip", "host_distinct_tokens_hll",
    "events_ntile_shards", "events_user_tier_asof",
    "cell_agg_incremental", "events_ntile_by_type",
    "minhash_pairs_incremental", "tile_pyramid_incremental",
    "event_value_winsor_mean",
]


def _consume(res) -> int:
    """Force execution; return row count without materializing to the driver."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, (pd.DataFrame, pa.Table)):
        return len(res)
    return 0


REPLICATE = int(os.environ.get("GRAFT_BENCH_REPLICATE", "200"))
PAGES_CACHE = os.environ.get("GRAFT_PAGES_CACHE", "/tmp/pyofs_ray_bench_pages")


def pages_fixture(sf_dir: str, replicate: int) -> str:
    """Materialize the replicated pages corpus to parquet once (untimed) —
    the timed pipeline then reads the same layout a real deployment would
    (WARC-derived parquet shards). Cached across processes/runs."""
    from pyofs_ray.sources.pages import materialize_pages_parquet
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    out = f"{PAGES_CACHE}/{tag}_x{replicate}"
    return materialize_pages_parquet(sf_dir, out, replicate=replicate)


def headline(pages_dir: str) -> int:
    """End-to-end over the pages layout: read → geocode/cell-encode → PIP
    join → two-stage cell aggregate → tile pyramid (BASELINE.json metric)."""
    from pyofs_ray.pipelines.flagship import flagship_from_pages
    return _consume(flagship_from_pages(pages_dir,
                                        override_num_blocks=NUM_CPUS * 2))


def run_bench() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # Round-3 profiling findings (stats-driven, see BASELINE.md):
    # 1. 128 MB target blocks gave 0.3M–2.8M-row blocks out of
    #    ReadParquet's SplitBlocks — 9× map-task skew, so end-of-pipeline
    #    stragglers idled ~40% of CPUs. 32 MB blocks even them out.
    # 2. The per-operator resource reservation throttled the fused map
    #    chain to ~half the CPUs while the read was live (remote-CPU sum
    #    45 s vs 8×11.4 s wall). Disabling it lets idle CPUs drain any
    #    stage; single-job benchmark semantics, where cross-job fairness
    #    is moot. Measured: 50M docs at 8 CPUs 11.4 → 5.9 s, at 2 CPUs
    #    39 → 20 s (2→8 efficiency 0.86 at 32 MB blocks).
    ctx.target_max_block_size = 32 * 1024 * 1024
    ctx.op_resource_reservation_enabled = False

    import pyarrow.parquet as pq
    docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows * REPLICATE
    pages_dir = pages_fixture(SF_DIR, REPLICATE)  # untimed, cached
    # warm the OS page cache so we measure compute + shuffle, not cold disk
    for root, _d, files in os.walk(pages_dir):
        for fn in files:
            with open(os.path.join(root, fn), "rb") as f:
                while f.read(1 << 24):
                    pass
    # steady-state: one untimed full headline pass warms the worker pool,
    # the parquet reader path and the page cache end-to-end
    headline(pages_dir)

    # min of N timed passes — the steady-state capability number, robust
    # to transient scheduler / page-cache noise (one contended pass
    # measured 1.8 s where min-of-5 on the same host gave 0.547 s)
    reps = int(os.environ.get("GRAFT_HEADLINE_REPS", "3"))
    times = []
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        headline(pages_dir)
        times.append(time.perf_counter() - t0)
    headline_sec = min(times)

    qtimes = {}
    if os.environ.get("GRAFT_HEADLINE_ONLY") != "1":
        from pyofs_ray.registry import QUERIES
        # Ray 2.49 can fatally abort a session after ~160 back-to-back
        # pipeline executions (reference_count.cc / task_manager.cc
        # Check-failure — observed on this exact list at query ~163).
        # Recycle the session every GRAFT_SESSION_CHUNK queries: ~2 s
        # re-init per chunk buys crash-free full-list runs and resets
        # the session-age slowdown.
        chunk = int(os.environ.get("GRAFT_SESSION_CHUNK", "60"))
        for i, name in enumerate(BENCH_QUERIES):
            if i and i % chunk == 0:
                ray.shutdown()
                ray.init(address="local", num_cpus=NUM_CPUS,
                         include_dashboard=False, ignore_reinit_error=True,
                         logging_level="ERROR")
                ctx = DataContext.get_current()
                ctx.enable_progress_bars = False
                ctx.execution_options.verbose_progress = False
                ctx.target_max_block_size = 32 * 1024 * 1024
                ctx.op_resource_reservation_enabled = False
            t0 = time.perf_counter()
            _consume(QUERIES[name](SF_DIR))
            qtimes[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "spatial-join+tile-assignment end-to-end",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": docs,
        "docs_per_sec": round(docs / headline_sec, 1),
    }


def run_scaling() -> dict:
    """N → 4N scaling on the same input in fresh processes — MEDIAN of
    ``GRAFT_SCALE_PAIRS`` (default 3) independent lo/hi pairs, each leg the
    min of ``GRAFT_HEADLINE_REPS`` (default 3) steady-state passes.
    Single-pair single-pass reporting was the round-2 defect: one noisy leg
    (scheduler or page-cache state) swings the ratio ±0.08.

    Default pair is 2 → 8 CPUs: this sandbox VM's memory bandwidth
    saturates at ~8 concurrent memory-heavy workers (a 32-process
    memory-bound microbenchmark runs its per-task work 9× slower than at
    8 — see BASELINE.md), so 8→32 measures the host's memory bus, not the
    engine. Override with GRAFT_SCALE_LO/GRAFT_SCALE_HI. The default input
    is 50M docs (GRAFT_SCALE_REPLICATE=10000) so the few hundred ms of
    fixed per-plan wall is <5% of the fast leg instead of ~15%.
    """
    import statistics

    lo_n = int(os.environ.get("GRAFT_SCALE_LO", "2"))
    hi_n = int(os.environ.get("GRAFT_SCALE_HI", "8"))
    pairs = int(os.environ.get("GRAFT_SCALE_PAIRS", "3"))
    scale_rep = os.environ.get("GRAFT_SCALE_REPLICATE", "10000")
    reps = os.environ.get("GRAFT_HEADLINE_REPS", "3")

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_HEADLINE_ONLY="1",
                   GRAFT_BENCH_REPLICATE=scale_rep, GRAFT_HEADLINE_REPS=reps)
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    pair_rows = []
    for _ in range(max(pairs, 1)):
        lo, hi = run(lo_n), run(hi_n)
        eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (hi_n / lo_n)
        pair_rows.append({f"sec_{lo_n}": lo["value"], f"sec_{hi_n}": hi["value"],
                          f"docs_per_sec_{lo_n}": lo["docs_per_sec"],
                          f"docs_per_sec_{hi_n}": hi["docs_per_sec"],
                          "eff": round(eff, 3)})
    effs = [p["eff"] for p in pair_rows]
    med_eff = statistics.median(effs)
    # report the MEDIAN pair's legs so the record is self-consistent:
    # (docs_per_sec_hi / docs_per_sec_lo) / (hi/lo) reproduces
    # scaling_efficiency exactly
    med = min(pair_rows, key=lambda p: abs(p["eff"] - med_eff))
    return {"metric": f"scaling-efficiency {lo_n}→{hi_n} cpus",
            f"sec_{lo_n}": med[f"sec_{lo_n}"], f"sec_{hi_n}": med[f"sec_{hi_n}"],
            f"docs_per_sec_{lo_n}": med[f"docs_per_sec_{lo_n}"],
            f"docs_per_sec_{hi_n}": med[f"docs_per_sec_{hi_n}"],
            "scaling_efficiency": med["eff"],
            "eff_pairs": effs, "eff_min": min(effs), "eff_max": max(effs),
            "sf": SF_DIR}


def run_sustained() -> dict:
    """Sustained streaming throughput: the headline pipeline over a
    ~200M-doc (≈25 GB) replicated pages layout in a fresh process —
    the big-corpus number BASELINE.md records (object-store streaming
    with backpressure; the fixture materializes once, untimed, under
    $GRAFT_PAGES_CACHE and is reused across runs). Override size with
    GRAFT_SUSTAINED_REPLICATE (default 40000 × the sf0.1 fixture)."""
    rep = os.environ.get("GRAFT_SUSTAINED_REPLICATE", "40000")
    env = dict(os.environ, GRAFT_HEADLINE_ONLY="1",
               GRAFT_BENCH_REPLICATE=rep,
               GRAFT_HEADLINE_REPS=os.environ.get("GRAFT_HEADLINE_REPS",
                                                  "2"))
    out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                         env=env, capture_output=True, text=True,
                         check=True).stdout
    r = json.loads(out.strip().splitlines()[-1])
    r["metric"] = "sustained streaming throughput (replicated corpus)"
    return r


def _spill_leg() -> None:
    """Inner runner for --spill: time the MinHash dup-pair enumeration in
    THIS process (PYOFS_SPILL_EMITTED_ROWS decides the path) and report
    whether the parquet spill actually engaged."""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from pyofs_ray.registry import QUERIES
    from pyofs_ray.stages import pairs as _pairs

    QUERIES["minhash_pairs"](SF_DIR)  # untimed warm pass
    t0 = time.perf_counter()
    n = _consume(QUERIES["minhash_pairs"](SF_DIR))
    sec = time.perf_counter() - t0
    ray.shutdown()
    print(json.dumps({"sec": round(sec, 3), "pairs": n,
                      "spill_engaged": _pairs.SPILL_ENGAGED}))


def run_spill() -> dict:
    """VERDICT r4 #4: measure the parquet spill path END-TO-END, not just
    in a lowered-threshold pytest. Two fresh processes run the identical
    MinHash dup-pair pipeline over $GRAFT_SF_DIR: one on the default
    in-memory materialize, one with PYOFS_SPILL_EMITTED_ROWS=1 so every
    emitted sketch table takes the spill-to-parquet round-trip (the
    100-TB shape). Reports both times + the overhead ratio; the forced
    leg asserts the spill actually engaged."""
    import pyarrow.parquet as pq

    def leg(force: bool) -> dict:
        env = dict(os.environ)
        if force:
            env["PYOFS_SPILL_EMITTED_ROWS"] = "1"
        else:
            env.pop("PYOFS_SPILL_EMITTED_ROWS", None)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--spill-leg"],
            env=env, capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    mem, spill = leg(False), leg(True)
    if not spill["spill_engaged"]:
        raise RuntimeError("--spill: forced leg did not engage the "
                           "parquet spill path")
    if spill["pairs"] != mem["pairs"]:
        raise RuntimeError("--spill: spill and in-memory paths disagree "
                           f"({spill['pairs']} vs {mem['pairs']} pairs)")
    docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    return {"metric": "dup-pair enumeration, spill-to-parquet vs in-memory",
            "sec_memory": mem["sec"], "sec_spill": spill["sec"],
            "spill_overhead_x": round(spill["sec"] / mem["sec"], 3),
            "pairs": mem["pairs"], "docs": docs,
            "docs_per_sec_spill": round(docs / spill["sec"], 1),
            "sf": SF_DIR, "num_cpus": NUM_CPUS}


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        result = run_scaling()
    elif "--sustained" in sys.argv:
        result = run_sustained()
    elif "--spill-leg" in sys.argv:
        _spill_leg()
        sys.exit(0)
    elif "--spill" in sys.argv:
        result = run_spill()
    else:
        result = run_bench()
    print(json.dumps(result))
