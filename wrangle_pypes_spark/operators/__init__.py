"""Relational + large-scale data-pipeline operators.

The reference has no relational algebra beyond its lookup-join analog
(SURVEY.md section 2.2) — everything here is the [EXT] surface: the
operators a user of a full engine needs, each designed Spark-first for
100 TB scale (broadcast/bucket/window strategies documented per op).
"""

from .relational import (
    asof_join,
    bucketed_range_join,
    cohort_retention,
    funnel_steps,
    pivot_table,
    profile,
    salted_join,
    sessionize,
    topk_per_group,
    unpivot,
    validate,
    zorder_col,
)
from .dedup import (
    connected_components,
    embedding_near_dup_pairs,
    exact_dedup,
    fuzzy_dedup_keep_canonical,
    minhash_banded,
    minhash_lsh_dup_pairs,
    minhash_lsh_pairs_against,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
    simhash_dup_pairs,
    simhash_signatures,
)
from .sampling import (
    deterministic_sample,
    deterministic_shuffle,
    histogram,
    mix_corpus,
    mix_plan,
    temperature_mix,
    temperature_mix_plan,
    pack_sequences,
    split_assign,
    stratified_sample,
)
from .rollup import (
    rollup_build,
    rollup_finalize,
    rollup_merge,
    time_bucket,
)
from .scd import (
    scd2_build,
    scd2_merge,
    scd2_rebuild_store,
    scd2_snapshot,
)
from .quality import (
    c4_line_clean,
    decontaminate,
    gopher_quality_flags,
    pii_scrub,
    repetition_stats,
)
from .timeseries import grouped_ewma
from .similarity import (
    cosine_topk,
    embedding_centroids,
    ivf_topk,
    kmeans_fit,
    lsh_bucket_topk,
    normalize_embeddings,
)

__all__ = (
    "asof_join",
    "cohort_retention",
    "funnel_steps",
    "bucketed_range_join",
    "pivot_table",
    "profile",
    "salted_join",
    "sessionize",
    "topk_per_group",
    "unpivot",
    "validate",
    "zorder_col",
    "connected_components",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "fuzzy_dedup_keep_canonical",
    "minhash_banded",
    "minhash_signatures",
    "minhash_lsh_dup_pairs",
    "minhash_lsh_pairs_against",
    "ngram_jaccard_pairs",
    "shingles",
    "simhash64",
    "simhash_dup_pairs",
    "simhash_signatures",
    "deterministic_sample",
    "deterministic_shuffle",
    "split_assign",
    "grouped_ewma",
    "histogram",
    "pack_sequences",
    "mix_corpus",
    "mix_plan",
    "temperature_mix",
    "temperature_mix_plan",
    "rollup_build",
    "rollup_finalize",
    "rollup_merge",
    "scd2_build",
    "scd2_merge",
    "scd2_rebuild_store",
    "scd2_snapshot",
    "stratified_sample",
    "c4_line_clean",
    "gopher_quality_flags",
    "repetition_stats",
    "pii_scrub",
    "decontaminate",
    "cosine_topk",
    "embedding_centroids",
    "ivf_topk",
    "kmeans_fit",
    "lsh_bucket_topk",
    "normalize_embeddings",
)
