#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing methodology: one warm shared SparkSession (session startup is
excluded — it is per-cluster fixed cost, not per-query), each query
timed over plan-build + full execution.  Two honesty rules:

1. CONSUME EVERYTHING (r7): the timed action is a write to Spark's
   no-op sink, which materializes EVERY output column with zero write
   cost.  A ``count()`` action lets Catalyst column-prune the expensive
   projections right out of a map-only query — r5's
   ``quantize_embeddings_int8`` benched at 0.16 s because its int8
   column was never computed.  The no-op sink makes a pruned-work bench
   structurally impossible (tests/test_bench_honesty.py pins this with
   an accumulator probe: count() skips the expensive column, the bench
   consumer evaluates it row-for-row).
2. MEDIAN OF N WARM RUNS (r7): single-run timings swing ±30% on this
   host (cold vs warm page cache / JIT); each headline query runs
   ``--runs`` times (default 3) and the median is recorded, so
   round-over-round regression triage stops chasing noise.  Raw
   per-run timings go to the ``*_runs.json`` sidecar.

A small untimed warmup job runs first so the first timed query does not
absorb one-time JVM/JIT/scan-machinery initialization (the BASELINE.md
reference numbers likewise exclude interpreter startup); steady-state
per-operator cost is what the numbers compare.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from wrangle_pypes_spark.session import get_session

# Headline set: the scale-relevant operators (joins, aggs, windows,
# asof/range, dedup/LSH, knn, text) — not the trivial projections.
HEADLINE = [
    "wrangle_flat_orders",
    "wrangle_nested_customer",
    "wrangle_get_or_create",
    "q1_pricing_summary",
    "q3_topk_revenue",
    "q5_revenue_by_nation",
    "q2_min_cost_supplier",
    "q9_profit_by_nation",
    "q21_suppliers_kept_waiting",
    "topk_orders_per_customer",
    "window_running_total",
    "sessionize_events",
    "asof_latest_order_per_event",
    "range_join_event_pairs",
    "dedup_exact",
    "doc_fingerprint",
    "text_stats",
    "lang_id",
    "knn_cosine_top5",
    "hard_negatives_emb",
    "mine_triplets_emb",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_near_dup_lsh",
    "ivf_ann_top5",
    "lsh_ann_top5",
    "multimodal_features",
    "resize_images",
    "sample_frames",
    "image_decode_stats_docs",
    "image_resize_bmp_docs",
    "audio_wav_stats_docs",
    "zorder_col",
    "wrangle_nested_lineitems",
    "wrangle_array_ops",
    "cube_orders",
    "corpus_clean_pipeline",
    "tfidf_top_terms",
    "fuzzy_dedup_canonical",
    "pack_sequences",
    "grouped_ewma",
    "udtf_chunk_text",
    "wrangle_get_or_create_arrays",
    "q10_returned_revenue",
    "scd2_customer_history",
    "mix_corpus_sources",
    "temperature_mix_sources",
    "c4_clean_docs",
    "unigram_logprob",
    "inverted_index_stats",
    "text_index_topk_docs",
    "text_index_topk_served_docs",
    "text_index_phrase_docs",
    "vector_index_topk_emb",
    "vector_index_filtered_emb",
    "funnel_events",
    "cohort_retention_weekly",
    "embedding_label_centroids",
    "rollup_events_hourly",
    "profile_customer",
    "profile_customer_approx",
    "stream_tumbling_events",
    "stream_session_events",
    "stream_stream_join",
    "stream_dedup_events",
    "async_get_or_create_dim",
    "gopher_quality",
    "repetition_stats",
    "pii_scrub",
    "decontaminate_docs",
    "train_val_test_split",
    "shuffle_documents",
    "stream_static_enrich",
    "stream_rollup_events",
    "stream_scd2_user_status",
    "compact_roundtrip_orders",
    "delta_roundtrip_orders",
    "iceberg_roundtrip_orders",
    "delta_dv_orders",
    "delta_column_mapping_orders",
    "iceberg_transform_prune_orders",
    "avro_roundtrip_orders",
    "stream_delta_ingest_orders",
    "gif_frame_stats_docs",
    "iceberg_eq_delete_orders",
    # r13 additions: the new table-lifecycle surfaces
    "delta_column_mapping_write_orders",
    "delta_id_mode_orders",
    "iceberg_pos_delete_orders",
    "delta_optimize_orders",
    "delta_convert_clone_orders",
    "iceberg_cdf_orders",
    "iceberg_convert_orders",
    "iceberg_optimize_orders",      # NEW r14: rewrite_data_files
    "iceberg_v3_defaults_orders",   # NEW r14: v3 field defaults
    "iceberg_puffin_dv_orders",     # NEW r14: puffin deletion vectors
    "iceberg_dv_write_orders",      # NEW r14: puffin DV writes
    "delta_schema_evolution_orders",   # NEW r14: merge_schema writes
    "iceberg_schema_evolution_orders",  # NEW r14: merge_schema writes
    "delta_data_skipping_orders",   # NEW r14: stats file pruning
    "iceberg_bounds_prune_orders",  # NEW r14: manifest bounds pruning
    "delta_column_ddl_orders",      # NEW r14: mapping+rename+drop
    "iceberg_column_ddl_orders",    # NEW r14: name-mapping rename+drop
    "scd2_rebuild_heal",
    "paragraph_dedup_docs",
    "quality_quantile_filter",
    "dsir_weights_docs",
    "cap_per_source",
    "stream_dedup_keep_best",
    "boilerplate_lines_docs",
    "resample_user_6h",
    "rolling_zscore_events",
    "weighted_sample_docs",
    "topp_quality_per_source",
    "bucketize_order_totals",
    "merge_intervals_user",
    "snapshot_diff_docs",
    "rolling_median_orders",
    "pagerank_trade_graph",
    "ngram_containment_docs",
    "standardize_orders",
    "rollup_hist_percentiles",
    "span_dedup_docs",
    "bm25_search_docs",
    "stream_zscore_events",
    "winsorize_order_totals",
    "dedup_pair_audit",
    "dsir_select_docs",
    "bpe_merges_docs",
    "ccnet_buckets_docs",
    "zipf_fit_corpus",
    "corpus_data_card",
    "html_extract_docs",
    "bigram_logprob",
    "source_kl_drift",
    "snapshot_js_drift",
    "stream_drift_hourly",
    "url_parse_docs",
    "url_blocklist_docs",
    "domain_stats_docs",
    "normalize_text_docs",
    "fuzzy_part_names",
    "link_graph_docs",
    "source_overlap_docs",
    "web_ingest_docs",
    "training_shards_manifest",
    "incremental_ingest_orders",
    "classifier_score_docs",
    "quantize_embeddings_int8",
    "anchor_text_docs",
    "compression_ratio_docs",
    "cdc_apply_orders",
    "stream_cdc_store",
    "cdc_vacuum_store",
    "stream_minhash_index",
    "stream_embedding_index",
    "curriculum_order_docs",
    "token_fertility_lang",
    "group_split_sources",
    "random_projection_emb",
    "sequential_ids_orders",
    "flatten_nested_customer",
    "binary_ingest_docs",
    "split_leakage_audit",
    "vocab_diversity_sources",
    "key_skew_orders",
    "script_mix_docs",
]


def _consume(df) -> None:
    """The timed action: materialize EVERY output column via the no-op
    sink.  count() would let Catalyst prune unconsumed expensive columns
    (the r5 bench-honesty hole); the no-op sink computes the full result
    and discards the bytes JVM-side — the standard Spark benchmarking
    idiom.  tests/test_bench_honesty.py pins the force-all-columns
    property with an accumulator probe."""
    df.write.format("noop").mode("overwrite").save()


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def _cpu_sample() -> tuple[int, int]:
    """(total, steal) jiffies from /proc/stat — the host runs in a
    shared microVM whose neighbors steal CPU in multi-second windows
    (OPTIMIZATION_r15.md Finding A: identical code read 2.9 s and
    9.0 s for the same query in back-to-back benches, with untouched
    queries inflating 3-4x in roving clusters).  Sampling steal around
    every timed run lets a reader discount noise-hit readings instead
    of chasing phantom regressions.  Additive only: no timing-loop or
    JSON-contract change — a new "host_steal_pct" map rides along."""
    try:
        parts = open("/proc/stat").readline().split()
        vals = [int(x) for x in parts[1:9]]
        return sum(vals), vals[7]
    except (OSError, ValueError, IndexError):
        return 0, 0


def main() -> None:
    # --all: time EVERY registered query (registry order) so each of
    # the operators has a recorded wall time; the default headline
    # set stays fixed for round-over-round comparability.
    # --runs N: warm repeats per query (headline default 3, --all
    # default 1 to keep the full sweep's wall time bounded).
    argv = sys.argv[1:]
    run_all = "--all" in argv
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS",
                              "1" if run_all else "3"))
    if "--runs" in argv:
        runs = int(argv[argv.index("--runs") + 1])
    # --only a,b,c: time just the named queries (isolated-measurement
    # tool for optimization triage — guide §1.1's empirical loop).
    # The driver invokes bench.py with no arguments, so the recorded
    # headline methodology is untouched.
    only = None
    if "--only" in argv:
        only = [s for s in argv[argv.index("--only") + 1].split(",") if s]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # sweep OUR OWN abandoned per-query temp stores (tempfile.mkdtemp
    # prefixes "wps_*") before timing: thousands of them accumulate in
    # /tmp over a round and the small-file I/O tax lands exactly on
    # the job-count-heavy streaming queries, skewing round-over-round
    # comparisons.  Only the wps_ prefix — never spark-*/temporary-*,
    # which may belong to live sessions.
    import glob
    import shutil
    for d in glob.glob(os.path.join(tempfile.gettempdir(), "wps_*")):
        shutil.rmtree(d, ignore_errors=True)
    spark = get_session("wrangle-bench", cpus=cpus)
    qs = entrymod.queries()
    names = list(qs) if run_all else HEADLINE
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            # a typo must not masquerade as a successful (shorter) run
            raise SystemExit(
                f"--only names not in the query registry: {unknown}")
        names = list(only)

    # untimed warmup: init scan/codegen/shuffle machinery once, and
    # pull EVERY table through the page cache — the host occasionally
    # drops it wholesale (observed r9: buff/cache collapsed to 2 GB
    # mid-round and q1 went 0.4 s -> 3 s with zero code churn), and
    # steady-state per-operator cost is the stated methodology
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"):
        f = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(f):
            _consume(spark.read.parquet(f))
    warm = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    warm.groupBy("o_orderstatus").count().count()

    # host calibration probe (r9, VERDICT r8 #6): the same fixed query
    # (q1) timed CAL_RUNS times before the sweep.  r8's +7.4% headline
    # "regression" was host drift (the idle-host q1 probe moved
    # 0.40 -> 0.54 s with zero code churn under it); recording the
    # probe with every bench makes drift measurable instead of argued.
    # host_factor = probe_median / reference (r7 idle-host 0.40 s);
    # queries_normalized divides raw times by it for round-over-round
    # comparison on a drifted host.  The probe runs are NOT part of
    # the timed totals.
    CAL_REFERENCE_SEC = 0.40  # r7 idle-host q1 median, the fixed anchor
    CAL_RUNS = 5
    cal_fn = qs["q1_pricing_summary"]
    cal_samples = []
    for _ in range(CAL_RUNS):
        t0 = time.perf_counter()
        _consume(cal_fn(spark, sf_dir))
        cal_samples.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    # median of the LAST 3: the first probe runs absorb residual
    # JIT/codegen warmup (observed 1.5 s -> 0.52 s across 5 runs) and
    # would overstate the host factor
    cal_median = _median(cal_samples[-3:])
    host_factor = round(cal_median / CAL_REFERENCE_SEC, 3)

    timings: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    steal_pct: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        samples = []
        steals = []
        for _ in range(runs):
            c0, s0 = _cpu_sample()
            t0 = time.perf_counter()
            _consume(fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
            c1, s1 = _cpu_sample()
            if c1 > c0:
                steals.append(100.0 * (s1 - s0) / (c1 - c0))
            # untimed hygiene between runs AND queries: queries that
            # persist intermediates (LSH/minhash/near-dup) would
            # otherwise accumulate cached blocks and GC pressure that
            # bleeds into the next timing; every timed run starts from
            # a clean executor cache (its own persists still apply
            # within its timed region).
            spark.catalog.clearCache()
        timings[name] = _median(samples)
        raw_runs[name] = samples
        if steals:
            steal_pct[name] = round(max(steals), 1)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    record = json.dumps({
        "metric": ("all_queries_total_sec" if run_all
                   else "headline_queries_total_sec"),
        "value": total,
        # the round-comparison number (VERDICT r9 #5): total divided
        # by the measured host drift factor, so a raw-vs-raw diff
        # against a differently-loaded host stops reading as a
        # phantom regression — compare value_normalized across rounds
        "value_normalized": round(total / host_factor, 3)
        if host_factor > 0 else total,
        "host_factor": host_factor,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(timings),
        "runs_per_query": runs,
        "aggregation": "median" if runs > 1 else "single",
        "consume": "noop_sink_all_columns",
        "cpus": cpus,
        "calibration": {
            "probe": "q1_pricing_summary",
            "runs": cal_samples,
            "median_sec": cal_median,
            "reference_sec": CAL_REFERENCE_SEC,
            "host_factor": host_factor,
        },
        "queries_normalized": {
            n: round(t / host_factor, 3) if host_factor > 0 else t
            for n, t in timings.items()},
        # ADDITIVE (r15): worst per-query host CPU-steal fraction seen
        # across the timed runs — a reading taken at >~3% steal is a
        # noisy-neighbor window, not a code delta (Finding A)
        "host_steal_pct": steal_pct,
    })
    # sidecar copy: the driver's stdout tail-capture truncated the
    # one-line JSON once (BENCH_r03 "parsed": null) — the file is the
    # truncation-proof record of the same line
    sidecar = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_local_all.json" if run_all
                     else "BENCH_local.json"))
    try:
        with open(sidecar, "w") as f:
            f.write(record + "\n")
        if runs > 1:
            with open(sidecar.replace(".json", "_runs.json"), "w") as f:
                json.dump({"runs_per_query": runs, "runs": raw_runs}, f)
    except OSError:
        pass  # a read-only checkout must not fail the bench itself
    print(record)


if __name__ == "__main__":
    main()
