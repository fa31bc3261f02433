"""Sampling / mixing / packing operators for training-data pipelines.

Everything here is DETERMINISTIC — re-running a pipeline over the same
corpus yields byte-identical samples (hash-based membership, never RNG
state), which is what makes 100 TB runs resumable and auditable.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def deterministic_sample(df: DataFrame, key_col: str, fraction: float, *,
                         seed: int = 42) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — stable across
    runs, partitionings, and cluster sizes (unlike ``df.sample``, whose
    output depends on partition layout).  Same key ⇒ same decision, so
    joins between two tables sampled on the same key stay consistent.
    """
    if not (0.0 <= fraction <= 1.0):
        raise ValueError("fraction must be in [0, 1]")
    bucket = F.pmod(F.xxhash64(F.lit(seed), F.col(key_col)), F.lit(1_000_000))
    return df.filter(bucket < int(fraction * 1_000_000))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: Mapping, key_col: str, *,
                      seed: int = 42) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample by language:
    ``{"en": 0.1, "de": 1.0}``).  Unlisted strata are dropped — the
    data-mixing primitive for corpus re-weighting."""
    bucket = F.pmod(F.xxhash64(F.lit(seed), F.col(key_col)), F.lit(1_000_000))
    cond = F.lit(False)
    for stratum, frac in fractions.items():
        cond = cond | ((F.col(strata_col) == F.lit(stratum)) &
                       (bucket < int(float(frac) * 1_000_000)))
    return df.filter(cond)


def pack_sequences(df: DataFrame, *, token_col: str, max_tokens: int,
                   order_col: str,
                   partition_col: Optional[str] = None) -> DataFrame:
    """Assign a ``pack_id`` grouping consecutive documents into
    ~``max_tokens`` context windows (sequence packing for training).

    Formulation: deterministic order -> running token total -> pack =
    floor((cumsum - tokens) / max_tokens), i.e. a document starts a new
    pack when the budget is already full.  One window pass, one shuffle;
    a document longer than the remaining budget overflows its pack by
    at most itself (the standard streaming-packing approximation —
    exact bin packing needs a sequential reset, which does not
    parallelize).
    """
    parts = [partition_col] if partition_col else []
    w = (Window.partitionBy(*parts).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = F.sum(token_col).over(w)
    pack = F.floor((cum - F.col(token_col)) / F.lit(max_tokens))
    return df.withColumn("pack_id", pack.cast("long"))


def histogram(df: DataFrame, col: str, *, lo: float, hi: float,
              nbins: int) -> DataFrame:
    """Fixed-width histogram: (bin, lo, hi, n).  Explicit bounds (no
    extra min/max pass); out-of-range rows clamp to the edge bins."""
    w = (hi - lo) / nbins
    bin_ = F.least(F.greatest(F.floor((F.col(col) - F.lit(lo)) / F.lit(w)),
                              F.lit(0)), F.lit(nbins - 1)).cast("long")
    return (df.withColumn("bin", bin_)
            .groupBy("bin").agg(F.count("*").alias("n"))
            .select("bin",
                    (F.lit(lo) + F.col("bin") * w).alias("bin_lo"),
                    (F.lit(lo) + (F.col("bin") + 1) * w).alias("bin_hi"),
                    "n"))
