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

__all__ = ["cms_build", "cms_merge", "cms_estimate",
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
