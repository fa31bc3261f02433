"""Structured Streaming surface.

The reference's ``async/`` package is IO-concurrency for lookups, not
streaming (SURVEY.md section 2.2 — and it is partially broken,
section 2.3.5).  We do not mirror a sync/async split; Spark Structured
Streaming is the engine's answer to the same use-case: incremental
processing with event-time semantics.
"""

from .stateful import stateful_running_counts, stateful_zscore
from .windows import (
    run_available_now_to_memory,
    session_window_agg,
    sliding_window_agg,
    stream_dedup,
    stream_events,
    stream_table,
    stream_stream_interval_join,
    tumbling_window_agg,
    foreach_batch_cdc_apply,
    foreach_batch_embedding_index,
    foreach_batch_get_or_create,
    bloom_resize_store,
    cdc_store_lookup,
    bloom_store_occupancy,
    cms_store,
    foreach_batch_bloom_dedup,
    foreach_batch_bks,
    foreach_batch_cms,
    foreach_batch_minhash_index,
    foreach_batch_text_index,
    foreach_batch_zonemap_append,
    foreach_batch_get_or_create_upsert,
    foreach_batch_dedup_keep_best,
    foreach_batch_rollup_upsert,
    foreach_batch_scd2_merge,
    read_cdc_store,
    stream_static_enrich,
    StreamMetricsCollector,
)

__all__ = (
    "stream_events",
    "stream_table",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "stateful_running_counts",
    "stateful_zscore",
    "stream_dedup",
    "stream_stream_interval_join",
    "run_available_now_to_memory",
    "foreach_batch_cdc_apply",
    "foreach_batch_embedding_index",
    "foreach_batch_get_or_create",
    "bloom_resize_store",
    "cdc_store_lookup",
    "bloom_store_occupancy",
    "cms_store",
    "foreach_batch_bloom_dedup",
    "foreach_batch_bks",
    "foreach_batch_cms",
    "foreach_batch_minhash_index",
    "foreach_batch_text_index",
    "foreach_batch_zonemap_append",
    "foreach_batch_get_or_create_upsert",
    "foreach_batch_dedup_keep_best",
    "foreach_batch_rollup_upsert",
    "foreach_batch_scd2_merge",
    "read_cdc_store",
    "stream_static_enrich",
    "StreamMetricsCollector",
)
