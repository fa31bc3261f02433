"""Count-min sketch as a TABLE — mergeable frequency state in
O(depth × width) rows, however many distinct keys the data holds.

The companion to :func:`wrangle_pypes_spark.operators.dedup.bloom_bitmap`
(set membership in O(n_bits) state): the CMS answers "how OFTEN has
this key occurred" with the same state-bound philosophy.  A sketch is
``(d int, pos int, cnt bigint)`` with at most ``depth * width`` rows:
for each item, every row ``d`` increments one counter at
``pos = pmod(xxhash64(d, key), width)``.  A point estimate is the MIN
over the ``depth`` counters — each counter only ever over-counts
(collisions add), so the estimate is an UPPER bound on the true count:

* estimate >= true count, always (no false negatives for any
  threshold query);
* estimate <= true count + eps * N with probability 1 - delta, for
  eps = e / width, delta = e ** -depth, N = total items — the
  standard Cormode-Muthukrishnan bound.

Sketches MERGE by cell-wise addition, which makes the streaming story
exact: maintain a CMS store incrementally (one ``additive``
manifest-store merge per micro-batch —
``streaming.windows.foreach_batch_cms``) and the merged sketch equals
the one-shot sketch of all rows.  Heavy-hitter queries then run
sketch-first: the upper-bound property means every true heavy hitter
survives the sketch filter, and one exact, semi-join-pruned count
over the CANDIDATES (a vanishing fraction of the keys) removes the
false positives — output is exact, cost is sketch + candidates, not
a full-cardinality aggregate held as state.

Built-in aggregates, no UDFs: one explode(depth) + groupBy(d, pos)
with map-side partials (shuffle bounded by depth × width per
partition, not by row count).

Reference analog: none — the reference (an 881-LoC record-at-a-time
dict mapper) has no aggregation surface; this is the bounded-state
frequency machinery a 100 TB stream needs.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["bks_build", "bks_merge", "bks_quantiles",
           "cms_build", "cms_merge", "cms_estimate",
           "cms_heavy_hitters_against", "cms_depth_width"]


def cms_depth_width(*, eps: float, delta: float) -> tuple:
    """(depth, width) sized for additive error <= eps * N with
    probability 1 - delta: width = ceil(e / eps), depth =
    ceil(ln(1 / delta))."""
    import math
    if not (0 < eps < 1) or not (0 < delta < 1):
        raise ValueError("eps and delta must be in (0, 1)")
    return (math.ceil(math.log(1.0 / delta)),
            math.ceil(math.e / eps))


def _positions(key_col: str, depth: int, width: int):
    return F.explode(F.array(*[
        F.struct(F.lit(d).cast("int").alias("d"),
                 F.pmod(F.xxhash64(F.lit(d), F.col(key_col)),
                        F.lit(width)).cast("int").alias("pos"))
        for d in range(depth)])).alias("_dp")


def _check_shape(depth: int, width: int) -> None:
    if depth < 1:
        raise ValueError("depth must be >= 1")
    if width < 2:
        raise ValueError("width must be >= 2")


def cms_build(df: DataFrame, key_col: str, *, depth: int = 5,
              width: int = 8192,
              weight_col: Optional[str] = None) -> DataFrame:
    """One-pass sketch of ``df[key_col]`` frequencies (or summed
    ``weight_col``): ``(d, pos, cnt)``, <= depth * width rows.  Null
    keys are EXCLUDED (a null has no identity to count; filter or
    coalesce upstream to count them as a sentinel value)."""
    _check_shape(depth, width)
    w = (F.col(weight_col).cast("bigint") if weight_col is not None
         else F.lit(1).cast("bigint"))
    return (df.filter(F.col(key_col).isNotNull())
            .select(_positions(key_col, depth, width), w.alias("_w"))
            .groupBy(F.col("_dp.d").alias("d"),
                     F.col("_dp.pos").alias("pos"))
            .agg(F.sum("_w").alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shaped sketches:
    ``merge(build(A), build(B)) == build(A UNION ALL B)`` exactly
    (integer addition is associative/commutative) — the property the
    streaming maintainer rests on.  Shapes are the caller's contract:
    sketches built with different depth/width occupy different hash
    families and must never be merged (the maintainer pins them via
    a sidecar)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "pos").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(cms: DataFrame, keys: DataFrame, key_col: str, *,
                 depth: int = 5, width: int = 8192) -> DataFrame:
    """Point estimates for every distinct key in ``keys``: ``(key_col,
    est bigint)``, est = min over the depth counters (0 for a cell no
    item ever hashed into).  est >= true count always; depth/width
    must match the sketch's hash family.  The sketch broadcasts
    (<= depth * width rows); cost is one explode + broadcast join +
    key aggregate over the PROBES, independent of the sketched data
    size."""
    _check_shape(depth, width)
    probes = (keys.select(key_col).filter(F.col(key_col).isNotNull())
              .distinct()
              .select(key_col, _positions(key_col, depth, width))
              .select(key_col, F.col("_dp.d").alias("d"),
                      F.col("_dp.pos").alias("pos")))
    return (probes.join(F.broadcast(cms), ["d", "pos"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .cast("bigint").alias("est")))


def cms_heavy_hitters_against(cms: DataFrame, df: DataFrame,
                              key_col: str, *, threshold: int,
                              depth: int = 5, width: int = 8192,
                              weight_col: Optional[str] = None
                              ) -> DataFrame:
    """EXACT heavy hitters of ``df`` (count or summed ``weight_col``
    >= threshold) found sketch-first: (1) estimate every candidate
    key against the sketch — est >= true, so NO true heavy hitter is
    lost; (2) one exact aggregate over ONLY the rows whose key
    survived, via a broadcast semi-join; (3) threshold on the exact
    count.  Returns ``(key_col, cnt bigint)``.

    The sketch must COVER ``df`` (be built or incrementally
    maintained over a superset of its rows) — an under-counting
    sketch would violate the upper-bound argument.  At 100 TB the
    win is topology: the full-cardinality groupBy never happens;
    state is the sketch (O(depth × width)) plus an aggregate over
    the candidate rows only."""
    cand = (cms_estimate(cms, df.select(key_col), key_col,
                         depth=depth, width=width)
            .filter(F.col("est") >= threshold)
            .select(key_col))
    w = (F.col(weight_col).cast("bigint") if weight_col is not None
         else F.lit(1).cast("bigint"))
    return (df.join(F.broadcast(cand), [key_col], "left_semi")
            .groupBy(key_col)
            .agg(F.sum(w).alias("cnt"))
            .filter(F.col("cnt") >= threshold))


# ---------------------------------------------------------------- BKS
# bottom-k-sample quantile state: the quantile sibling of the CMS.
# A KLL/t-digest needs sequential compaction (a poor fit for
# DataFrame ops); a BOTTOM-K HASH SAMPLE gives mergeable quantile
# state with pure Column operators and an exactness property the
# fancier sketches lack: bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪
# bottom-k(B)) EXACTLY, because membership depends only on each row's
# own deterministic md5 draw.  The sample is a uniform k-subset
# without replacement, so quantile error is the classic sampling
# bound (~sqrt(p(1-p)/k) in rank space — k=1024 gives ~1.5 rank
# points at the median); groups with <= k rows are EXACT.  md5 makes
# the state bit-identical across engines (same contract as
# sampling._md5_unit_key), so even the sketch CONTENT value-oracles.

def bks_build(df: DataFrame, *, value_col: str, id_col: str,
              k: int = 1024, by: Sequence[str] = (),
              seed: int = 42) -> DataFrame:
    """Quantile state: one row per group — ``(by..., bks)`` where
    ``bks`` is the group's k rows with the smallest md5 draws, as a
    draw-sorted ``array<struct<h, id, v>>`` (≤ k elements, the
    bounded-state guarantee).  ``id_col`` must be unique per row (the
    draw is a pure function of it).  Cost: one key shuffle + sort
    (row_number window) over the input, then a k-BOUNDED collect per
    group — the unbounded-collect_list trap does not apply because
    rows are capped BEFORE aggregation."""
    from pyspark.sql import Window

    from .sampling import _md5_unit_key

    if k < 1:
        raise ValueError("k must be >= 1")
    cols = list(by)
    draw = _md5_unit_key(id_col, seed)
    w = Window.partitionBy(*[F.col(c) for c in cols]) \
        .orderBy(draw, F.col(id_col))
    capped = (df.withColumn("_bks_rn", F.row_number().over(w))
              .filter(F.col("_bks_rn") <= k))
    return (capped.groupBy(*cols)
            .agg(F.array_sort(F.collect_list(F.struct(
                draw.alias("h"),
                F.col(id_col).cast("string").alias("id"),
                F.col(value_col).cast("double").alias("v"))))
                .alias("bks")))


def bks_merge(*states: DataFrame, k: int,
              by: Sequence[str] = ()) -> DataFrame:
    """Merge quantile states: per group, concatenate the samples,
    re-sort by draw, keep the k smallest — EXACTLY the state a
    one-shot :func:`bks_build` over the union of the inputs would
    produce (pinned by tests).  Pure aggregate; arrays stay
    k-bounded throughout.  Entries dedupe on merge (set semantics),
    so merging a state with itself — an at-least-once replay — is a
    no-op: the merge is IDEMPOTENT as well as exact."""
    cols = list(by)
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return (out.groupBy(*cols)
            .agg(F.slice(F.array_sort(F.array_distinct(F.flatten(
                F.collect_list("bks")))), 1, k).alias("bks")))


def bks_quantiles(state: DataFrame, probs: Sequence[float], *,
                  by: Sequence[str] = (),
                  round_digits: int = 4) -> DataFrame:
    """Quantile estimates off the state: one row per (group, p) with
    the linearly-interpolated percentile of the SAMPLE values —
    exact for groups the sample holds entirely (≤ k rows), a
    ~sqrt(p(1-p)/k) rank-error estimate beyond.  Output columns:
    ``by..., p, q``."""
    cols = list(by)
    ps = [float(p) for p in probs]
    if not ps or any(not (0.0 <= p <= 1.0) for p in ps):
        raise ValueError("probs must be non-empty, each in [0, 1]")
    vals = state.select(
        *cols, F.explode(F.col("bks.v")).alias("_v"))
    agg = vals.groupBy(*cols).agg(
        F.percentile(F.col("_v"),
                     F.array(*[F.lit(p) for p in ps])).alias("_qs"))
    pairs = F.arrays_zip(F.array(*[F.lit(p) for p in ps]).alias("p"),
                         F.col("_qs").alias("q"))
    return (agg.select(*cols, F.explode(pairs).alias("_pq"))
            .select(*cols, F.col("_pq.p").alias("p"),
                    F.round(F.col("_pq.q"), round_digits).alias("q")))
