"""Physical-plan audits: the scale properties the engine promises are
asserted here so they cannot silently regress — UDF-free hot paths,
scan-level filter pushdown, column pruning, broadcast of small dims
(SURVEY.md section 4.2; every check reads `.explain("formatted")`).
"""

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# queries whose plans must stay entirely JVM-side (no Python eval nodes).
# Excluded by design: multimodal_features (mapInPandas decode plumbing),
# ivf_ann_top5 (numpy cell assignment), stream_* (streaming sinks).
PURE_JVM_QUERIES = [
    "wrangle_flat_orders",
    "wrangle_nested_customer",
    "wrangle_array_ops",
    "wrangle_map_ops",
    "wrangle_create_multiple",
    "q1_pricing_summary",
    "q3_topk_revenue",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q19_bracketed_revenue",
    "topk_orders_per_customer",
    "asof_latest_order_per_event",
    "range_join_event_pairs",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "knn_cosine_top5",
    "embedding_near_dup",
    "text_stats",
    "lang_id",
    "window_rank_family",
    "date_functions_orders",
    "string_functions_customer",
    "mix_corpus_sources",
    "scd2_customer_history",
    "rollup_events_hourly",
    "top_ngrams_corpus",
    "token_pmi_pairs",
    "dedup_keep_longest",
    "chunk_documents_overlap",
    "temperature_mix_sources",
    "c4_clean_docs",
    "unigram_logprob",
    "inverted_index_stats",
    "funnel_events",
    "cohort_retention_weekly",
    "embedding_label_centroids",
    "boilerplate_lines_docs",
    "resample_user_6h",
    "rolling_zscore_events",
    "weighted_sample_docs",
    "topp_quality_per_source",
    "bucketize_order_totals",
    "merge_intervals_user",
    "snapshot_diff_docs",
    "rolling_median_orders",
    "ngram_containment_docs",
    "standardize_orders",
    "rollup_hist_percentiles",
    "span_dedup_docs",
    "bm25_search_docs",
    "winsorize_order_totals",
    # r6 additions: the rest of the r6 verification window that must
    # stay UDF-free (excluded: write-path read-backs, stream_*, the
    # documented pandas ops — compression_ratio, semantic kmeans,
    # grouped_ewma)
    "url_parse_docs",
    "url_blocklist_docs",
    "domain_stats_docs",
    "link_graph_docs",
    "fuzzy_part_names",
    "random_projection_emb",
    "quantize_embeddings_int8",
    "dedup_pair_audit",
    "dsir_select_docs",
    "ccnet_buckets_docs",
    "zipf_fit_corpus",
    "corpus_data_card",
    "html_extract_docs",
    "bigram_logprob",
    "source_kl_drift",
    "snapshot_js_drift",
    "normalize_text_docs",
    "anchor_text_docs",
    "script_mix_docs",
    "vocab_diversity_sources",
    "key_skew_orders",
    "split_leakage_audit",
    "sequential_ids_orders",
    "flatten_nested_customer",
    "curriculum_order_docs",
    "token_fertility_lang",
    "group_split_sources",
    "classifier_score_docs",
    "cap_per_source",
    "quality_quantile_filter",
    "paragraph_dedup_docs",
    "dsir_weights_docs",
    "source_overlap_docs",
]


@pytest.mark.parametrize("name", PURE_JVM_QUERIES)
def test_no_python_eval_in_hot_path(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    p = plan_of(df)
    assert "BatchEvalPython" not in p, f"{name}: row-at-a-time python UDF"
    assert "ArrowEvalPython" not in p, f"{name}: pandas UDF in pure-JVM query"
    assert "MapInPandas" not in p, f"{name}: mapInPandas in pure-JVM query"


def test_unigram_logprob_broadcasts_freq_table(spark, sf_dir):
    df = entrymod.queries()["unigram_logprob"](spark, sf_dir)
    p = plan_of(df)
    assert "BroadcastHashJoin" in p, \
        "token-frequency join must broadcast, not shuffle the corpus"


def test_funnel_and_centroids_partial_aggregate(spark, sf_dir):
    # both collapse data map-side before their single keyed shuffle
    from wrangle_pypes_spark.plans import audit

    for name in ("funnel_events", "embedding_label_centroids"):
        df = entrymod.queries()[name](spark, sf_dir)
        rep = audit(df)
        assert rep.partial_aggregates >= 1, f"{name}: no map-side combine"


def test_q6_filter_pushdown_and_pruning(spark, sf_dir):
    """Filters must reach the parquet scan; ReadSchema must be pruned to
    the referenced columns (not the full 11-column lineitem)."""
    df = entrymod.queries()["q6_forecast_revenue"](spark, sf_dir)
    p = plan_of(df)
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert pushed and "l_quantity" in pushed.group(1), p
    read = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert read is not None
    cols = {c.split(":")[0] for c in read.group(1).split(",") if c}
    assert cols == {"l_shipdate", "l_discount", "l_quantity",
                    "l_extendedprice"}, cols


def test_broadcast_joins_used_for_small_dims(spark, sf_dir):
    for name in ("q5_revenue_by_nation", "q14_promo_revenue",
                 "wrangle_nested_customer"):
        p = plan_of(entrymod.queries()[name](spark, sf_dir))
        assert "BroadcastHashJoin" in p, f"{name} lost its broadcast join"


def test_semi_anti_join_operators(spark, sf_dir):
    p = plan_of(entrymod.queries()["semi_join_customers"](spark, sf_dir))
    assert "LeftSemi" in p
    p = plan_of(entrymod.queries()["customers_without_orders"](spark, sf_dir))
    assert "LeftAnti" in p


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    """q1 must plan partial (map-side) + final hash aggregation around a
    single exchange — the shape that scales."""
    p = plan_of(entrymod.queries()["q1_pricing_summary"](spark, sf_dir))
    n_agg = len(re.findall(r"\(\d+\) HashAggregate", p))
    n_ex = len(re.findall(r"\(\d+\) Exchange", p))
    assert n_agg == 2, f"expected partial+final agg, got {n_agg}"
    assert n_ex == 1, f"expected single shuffle, got {n_ex}"


def test_wrangle_compiles_to_single_projection(spark, sf_dir):
    """The whole flat wrangle pipeline must be ONE codegen'd Project over
    the scan — no shuffle, no python."""
    df = entrymod.queries()["wrangle_flat_orders"](spark, sf_dir)
    p = plan_of(df)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 0
    # formatted mode marks fused stages with "[codegen id : N]"
    assert "codegen id" in p
    assert len(re.findall(r"\(\d+\) Project", p)) == 1


def test_asof_join_is_union_window_not_range_join(spark, sf_dir):
    """The as-of join must plan as union + single window pass (linear),
    never a nested-loop/cartesian range join (quadratic per key)."""
    p = plan_of(entrymod.queries()["asof_latest_order_per_event"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert re.search(r"\(\d+\) Window", p), "expected window-based as-of plan"


def test_range_join_is_equi_join_on_buckets(spark, sf_dir):
    """The bucketed range join must candidate-generate via an EQUI join
    (hash/sort-merge on (key, bucket)) — the bucketization is pointless
    if Spark still plans a nested loop."""
    p = plan_of(entrymod.queries()["range_join_event_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert ("SortMergeJoin" in p) or ("BroadcastHashJoin" in p) or \
           ("ShuffledHashJoin" in p)


def test_salted_join_spreads_key(spark, sf_dir):
    p = plan_of(entrymod.queries()["salted_join_revenue"](spark, sf_dir))
    assert "_salt" in p  # the salt is part of the join key
    assert "CartesianProduct" not in p


def test_get_or_create_broadcasts_small_dim(spark, sf_dir):
    """The lookup-join must broadcast the (small) dimension side — a
    shuffled get_or_create on a 100-row dim is the wrong plan."""
    p = plan_of(entrymod.queries()["wrangle_get_or_create"](spark, sf_dir))
    assert "BroadcastHashJoin" in p, p


def test_multimodal_ops_are_map_only(spark, sf_dir):
    """resize/frame fan-out must be pure mapInPandas — any Exchange here
    means a pointless shuffle of large binary payloads."""
    for name in ("resize_images", "sample_frames"):
        p = plan_of(entrymod.queries()[name](spark, sf_dir))
        assert "MapInPandas" in p, f"{name}: expected mapInPandas plumbing"
        assert len(re.findall(r"\(\d+\) Exchange", p)) == 0, \
            f"{name}: shuffle in a map-only op"


def test_zorder_expression_stays_jvm_side(spark, sf_dir):
    """The Morton interleave must compile to a codegen'd projection —
    no Python eval, no shuffle (min/max ranges are a separate tiny agg
    pass at build time)."""
    p = plan_of(entrymod.queries()["zorder_col"](spark, sf_dir))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 0
    assert "codegen id" in p


def test_new_tpch_shapes_stay_jvm_and_broadcast(spark, sf_dir):
    """The q2/q9/q11/q15/q16/q17/q20 adaptations: dims broadcast, no
    Python eval anywhere, scans pruned."""
    qs = entrymod.queries()
    for name in ("q2_min_cost_supplier", "q9_profit_by_nation",
                 "q11_important_parts", "q15_top_supplier",
                 "q16_supplier_part_counts", "q17_small_quantity_revenue",
                 "q20_bulk_suppliers"):
        p = plan_of(qs[name](spark, sf_dir))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name
        assert "BroadcastHashJoin" in p, f"{name} lost its broadcast join"
        assert "CartesianProduct" not in p, name


def test_q9_star_join_prunes_lineitem(spark, sf_dir):
    """The 5-way star join must not read lineitem columns it doesn't
    use (l_comment-class columns stay out of ReadSchema)."""
    p = plan_of(entrymod.queries()["q9_profit_by_nation"](spark, sf_dir))
    reads = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    li_reads = [r for r in reads if "l_partkey" in r]
    assert li_reads, p
    cols = {c.split(":")[0] for c in li_reads[0].split(",") if c}
    assert cols == {"l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                    "l_extendedprice", "l_discount"}, cols


def test_random_projection_literal_signs_fold_out_of_plan(spark, sf_dir):
    """dim= pre-folds the md5 Rademacher signs driver-side: the
    physical plan must contain NO md5 call (the whole point — 512
    per-row hashes become plan literals) and no Python eval nodes."""
    from wrangle_pypes_spark.operators.similarity import random_projection

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    p = plan_of(random_projection(e, "embedding", out_dim=8,
                                  hash_scheme="md5", dim=64))
    assert "md5" not in p, "signs were not folded into literals"
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the hash path keeps md5 at runtime — the contract the literal
    # path is verified against
    p_hash = plan_of(random_projection(e, "embedding", out_dim=8,
                                       hash_scheme="md5"))
    assert "md5" in p_hash


def test_scd2_single_shuffle(spark, sf_dir):
    """SCD2 build: both window passes share ONE key-partitioned
    exchange (same partitioning, no re-shuffle between passes)."""
    p = plan_of(entrymod.queries()["scd2_customer_history"](spark, sf_dir))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    n_ex = len(re.findall(r"\(\d+\) Exchange", p))
    assert n_ex == 1, f"expected one key shuffle, got {n_ex}"


def test_rollup_merge_keeps_partial_aggregation(spark, sf_dir):
    """The rollup merge path must plan map-side partial aggregates
    (mergeable states are the whole point)."""
    p = plan_of(entrymod.queries()["rollup_events_hourly"](spark, sf_dir))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert len(re.findall(r"HashAggregate", p)) >= 2, p


def test_plan_audit_reads_scan_and_join_facts(spark, tables):
    """plans.audit distills the facts the scale story depends on:
    pushdown, pruning, broadcast-vs-shuffle, partial aggregation,
    python-eval detection."""
    from wrangle_pypes_spark.plans import assert_jvm_only, audit

    o, c = tables["orders"], tables["customer"]
    q = (o.filter(F.col("o_totalprice") > 100.0)
         .join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               o.o_custkey == F.col("c_custkey"))
         .groupBy("c_mktsegment")
         .agg(F.sum("o_totalprice").alias("rev")))
    rep = audit(q)
    assert rep.jvm_only()
    assert rep.broadcast_joins == 1 and rep.sortmerge_joins == 0
    assert rep.pushdown_ok()               # price filter reached the scan
    assert rep.partial_aggregates >= 1     # map-side combine before shuffle
    assert_jvm_only(q)                     # does not raise

    # pruning: the scan reads only the joined/aggregated columns
    assert all("o_comment" not in s for s in rep.read_schemas)

    # python stages ARE reported when present
    from wrangle_pypes_spark.operators.timeseries import grouped_ewma
    ewma = grouped_ewma(tables["events"], key_col="user_id",
                        ts_col="ts", value_col="value")
    rep2 = audit(ewma)
    assert not rep2.jvm_only()
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        assert_jvm_only(ewma)

    # a map-only projection shows zero exchanges
    from wrangle_pypes_spark.operators import split_assign
    rep3 = audit(split_assign(tables["documents"], "doc_id"))
    assert rep3.shuffle_count() == 0


def test_plan_audit_robust_to_codegen_stars_and_python_aggs(spark, tables):
    """audit() must count nodes on NON-AQE plans (lines start '*(n) '),
    detect pandas-UDAF python stages, and pass pushdown_ok on
    filterless projections."""
    import pandas as pd

    from wrangle_pypes_spark.plans import audit

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        o = tables["orders"]
        q = (o.filter(F.col("o_totalprice") > 100.0)
             .groupBy("o_orderstatus")
             .agg(F.sum("o_totalprice").alias("rev")))
        rep = audit(q)
        assert rep.partial_aggregates >= 1, rep.plan  # '*(n) ' stripped
        assert rep.final_aggregates >= 1
        assert rep.pushdown_ok()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)

    # pandas UDAF is a python stage and must be detected
    @F.pandas_udf("double")
    def pd_mean(v: pd.Series) -> float:
        return float(v.mean())

    agg = tables["orders"].groupBy("o_orderstatus").agg(
        pd_mean(F.col("o_totalprice")).alias("m"))
    assert not audit(agg).jvm_only()

    # filterless projection: nothing to push, pushdown_ok stays True
    rep2 = audit(tables["orders"].select("o_orderkey", "o_totalprice"))
    assert rep2.pushdown_ok()
    assert rep2.filter_nodes == 0


def test_resample_shares_one_key_partitioning(spark, sf_dir):
    """The (key, bucket) aggregate, the grid join, and the forward-fill
    window must reuse one key-based distribution — a second corpus-wide
    exchange on the same key would double the op's shuffle cost."""
    from wrangle_pypes_spark.operators import resample
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = resample(e, key_col="user_id", ts_col="ts",
                  value_col="value", interval_sec=6 * 3600)
    p = plan_of(df)
    # the only exchanges over event-scale data hash on the key (or
    # key+bucket for the partial agg); no single-partition exchange
    assert "SinglePartition" not in p
    assert p.count("Exchange hashpartitioning") <= 3


def test_bucketize_assignment_is_map_only(spark, sf_dir):
    """After the cut-point aggregate, assignment must be a literal-array
    projection: no join, no exchange in the output plan."""
    from wrangle_pypes_spark.operators import bucketize
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df = bucketize(o, "o_totalprice")
    p = plan_of(df)
    assert "Join" not in p and "Exchange" not in p


def test_weighted_sample_pps_is_map_only_filter(spark, sf_dir):
    """The accept test is a pure projection over the scan — pushdown-
    friendly, no exchange, no join."""
    from wrangle_pypes_spark.operators import weighted_sample_pps
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = weighted_sample_pps(d, key_col="doc_id",
                             weight_col="n_chars", k=50)
    p = plan_of(df)
    assert "Join" not in p and "Exchange" not in p


def test_perplexity_buckets_approx_never_sorts_corpus(spark, sf_dir):
    """The 100 TB path: per-group cutoffs broadcast back onto the scored
    stream, bucket assignment is a map-only CASE — no window sort of a
    language stratum, no Python eval anywhere."""
    from wrangle_pypes_spark.operators import perplexity_buckets
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = perplexity_buckets(d)
    p = plan_of(df)
    assert "BroadcastHashJoin" in p
    assert "Window" not in p, "approx path must not window-sort strata"
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_zipf_fit_topk_is_distributed(spark, sf_dir):
    """Vocab top-k compiles to TakeOrdered (per-partition partial top-k),
    never a global sort of the vocabulary; the row_number window only
    ever sees the top_k survivors."""
    from wrangle_pypes_spark.functions import zipf_fit
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = zipf_fit(d, top_k=100)
    p = plan_of(df)
    assert "TakeOrderedAndProject" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_html_to_text_is_map_only(spark, sf_dir):
    """The strip chain is a pure projection: no exchange, no join, no
    Python eval — it composes into the ingest scan."""
    from wrangle_pypes_spark.functions import html_to_text
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = d.select("doc_id", html_to_text(F.col("text")).alias("t"))
    p = plan_of(df)
    assert "Exchange" not in p and "Join" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_corpus_data_card_single_corpus_shuffle(spark, sf_dir):
    """Exactly one exchange reads corpus-scale data (the (source,lang)
    hash aggregate, partial-aggregated map-side); the rollup, top-lang
    window and share windows all run on the k-row table."""
    from wrangle_pypes_spark.operators import corpus_data_card
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reg = []
    card = corpus_data_card(d, cache_registry=reg)
    p = plan_of(card)
    assert "HashAggregate" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the (source,lang) aggregate is persisted: both consuming branches
    # read the cache, so the corpus is scanned/aggregated exactly once
    assert "InMemoryTableScan" in p, \
        "per-(source,lang) aggregate must be cached, not recomputed"
    for df in reg:
        df.unpersist()


def test_bigram_logprob_shuffle_joins_bigram_counts(spark, sf_dir):
    """Only the vocab-sized unigram/prefix tables carry a broadcast
    HINT; the bigram count table must not (a web-scale bigram vocab is
    data-sized — at real scale it shuffle-joins).  With size-based
    auto-broadcast off, hinted joins still broadcast and the unhinted
    bigram join falls to a shuffle join — proving no hint exists."""
    from wrangle_pypes_spark.functions import bigram_logprob_score
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(bigram_logprob_score(d))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" in p, "unigram/prefix tables broadcast"
    assert ("SortMergeJoin" in p or "ShuffledHashJoin" in p), \
        "bigram counts must shuffle-join, not broadcast"
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_source_kl_single_corpus_shuffle(spark, sf_dir):
    """The (source, token) aggregate is the only corpus-scale shuffle
    and is persisted for its two consumers; corpus marginals broadcast
    back; no Python eval."""
    from wrangle_pypes_spark.operators import source_kl_divergence
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reg = []
    p = plan_of(source_kl_divergence(d, cache_registry=reg))
    assert "InMemoryTableScan" in p, "(source,token) aggregate cached"
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    for df in reg:
        df.unpersist()


def test_js_divergence_merges_vocab_not_corpus(spark, sf_dir):
    """Both sides collapse to persisted vocab-sized count tables before
    the full-outer merge; no corpus-scale join, no Python eval."""
    from wrangle_pypes_spark.operators import corpus_js_divergence
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reg = []
    df = corpus_js_divergence(d.filter(F.col("doc_id") % 2 == 0),
                              d.filter(F.col("doc_id") % 2 == 1),
                              cache_registry=reg)
    p = plan_of(df)
    assert p.count("InMemoryTableScan") >= 2, \
        "BOTH count tables must be cached"
    assert "FullOuter" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    for c in reg:
        c.unpersist()


def test_bloom_probe_is_broadcast_and_jvm_only(spark, sf_dir):
    """The bloom path's whole point at scale: the bitmap table joins
    by BROADCAST (never shuffling the probe side by word) and every
    expression stays JVM-side."""
    from wrangle_pypes_spark import plans
    from wrangle_pypes_spark.operators import bloom_bitmap, bloom_probe

    hist = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    bm = bloom_bitmap(hist, "doc_id", n_bits=1 << 14)
    probed = bloom_probe(hist.limit(100), bm, "doc_id",
                         n_bits=1 << 14)
    rep = plans.audit(probed)
    assert rep.python_eval_nodes == []
    assert rep.broadcast_joins >= 1
    assert rep.sortmerge_joins == 0


def test_manifest_lookup_prunes_and_broadcasts(spark, sf_dir, tmp_path):
    """manifest_lookup must plan a broadcast semi-join of the probe
    keys (never a shuffle of the store side) and its scan must list
    only the touched buckets' directories."""
    from wrangle_pypes_spark import plans
    from wrangle_pypes_spark.sources import manifest_lookup, manifest_merge

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_totalprice")
    store = str(tmp_path / "dim")
    manifest_merge(orders, store, ["o_orderkey"], epoch_id=0,
                   n_buckets=32)
    probe = spark.createDataFrame([(1,), (7,)], "o_orderkey bigint")
    out = manifest_lookup(spark, store, probe)
    rep = plans.audit(out)
    assert rep.python_eval_nodes == []
    assert rep.broadcast_joins >= 1 and rep.sortmerge_joins == 0
    assert "LeftSemi" in rep.plan
    # scan location covers at most the two probed buckets: the plan's
    # file index lists <= 2 root paths (explain TRUNCATES the path
    # string itself, so the count is the only robust evidence)
    import re as _re
    counts = [int(m) for m in
              _re.findall(r"InMemoryFileIndex\((\d+) paths?\)", rep.plan)]
    assert counts and all(c <= 2 for c in counts)


def test_nested_lineitems_single_shuffle_two_broadcasts(spark, sf_dir):
    """The r9 nested-amortization query's plan IS the plan: one
    exchange (the lineitem group, which the explicit repartition
    pre-positions and the aggregate reuses), orders and customer
    broadcast, zero sort-merge joins, no Python anywhere."""
    import __spark_entry__ as entry
    from wrangle_pypes_spark import plans

    out = entry.queries()["wrangle_nested_lineitems"](spark, sf_dir)
    rep = plans.audit(out)
    assert rep.python_eval_nodes == []
    assert rep.sortmerge_joins == 0
    assert rep.broadcast_joins >= 2
    # one repartition exchange; AQE may add a read-side coalesce but
    # never a second hash shuffle of the data
    hash_ex = [e for e in rep.exchanges if "hashpartitioning" in e]
    assert len(hash_ex) <= 1, rep.exchanges


def test_hard_negatives_lsh_is_equi_join(spark, sf_dir):
    """The mining scale path joins on the LSH code — a plain
    broadcast/shuffle EQUI join, never a nested-loop cross product;
    the exact twin is the whitelisted bounded-broadcast baseline."""
    from wrangle_pypes_spark import plans
    from wrangle_pypes_spark.operators import hard_negatives_lsh
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = hard_negatives_lsh(emb, id_col="vec_id", vec_col="embedding",
                             label_col="label", k=5,
                             queries=emb.filter(F.col("vec_id") < 10))
    rep = plans.audit(out)
    assert rep.python_eval_nodes == []
    assert "CartesianProduct" not in rep.plan
    assert "BroadcastNestedLoopJoin" not in rep.plan


def test_vector_index_probe_plan(spark, sf_dir, tmp_path):
    """The IVF serving probe (r10): candidate join is a broadcast
    EQUI join on the cell id — no cross product — and the only
    Python-eval node is the deliberate Arrow cell-assignment UDF on
    the (small) query side, never on the stored candidates."""
    from pyspark.sql import functions as F

    from wrangle_pypes_spark import plans
    from wrangle_pypes_spark.operators import (build_vector_index,
                                               vector_index_topk)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    store = str(tmp_path / "vxplan")
    build_vector_index(emb, store, vec_col="embedding",
                       id_col="vec_id", n_centroids=8, n_buckets=8)
    out = vector_index_topk(spark, store,
                            emb.filter(F.col("vec_id") < 5),
                            k=5, n_probe=2)
    rep = plans.audit(out)
    assert "CartesianProduct" not in rep.plan
    assert "BroadcastNestedLoopJoin" not in rep.plan
    assert rep.broadcast_joins >= 1  # queries broadcast into the join
    # the stored-candidate side is JVM-only: the probe frame was
    # checkpointed AFTER its Arrow assignment, so the executed plan
    # re-ranks without any Python eval over candidates
    assert rep.python_eval_nodes == []


def test_phrase_search_plan(spark, sf_dir, tmp_path):
    """Phrase serving (r10): postings equi-join on doc, no cross
    product, no Python eval, and the lookup plans only the phrase
    terms' bucket dirs."""
    import re

    from wrangle_pypes_spark import plans
    from wrangle_pypes_spark.operators import (build_text_index,
                                               text_index_phrase)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    store = str(tmp_path / "phplan")
    build_text_index(docs, store, n_buckets=32, with_positions=True)
    out = text_index_phrase(spark, store, "slow hash batch")
    rep = plans.audit(out)
    assert rep.python_eval_nodes == []
    assert "CartesianProduct" not in rep.plan
    assert "BroadcastNestedLoopJoin" not in rep.plan
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    counts = {int(n) for n in
              re.findall(r"InMemoryFileIndex\((\d+) paths?\)", plan)}
    assert counts and max(counts) <= 3  # <= |distinct terms| buckets
