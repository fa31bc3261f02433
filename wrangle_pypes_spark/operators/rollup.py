"""Continuous-aggregate / rollup-table maintenance (hypertable-style).

A rollup table holds PARTIAL, MERGEABLE aggregate state per
(time-bucket, dims) group: counts and sums (merge = sum), mins/maxes
(merge = min/max), and HyperLogLog sketches for distinct counts
(merge = sketch union, ``F.hll_union_agg`` — Apache DataSketches,
public Spark 3.5+ API).  Because every state is mergeable:

* a NEW batch of raw events folds in with one ``rollup_merge`` over the
  touched groups — the steady-state cost is proportional to the batch,
  never to the accumulated history;
* coarser rollups (hour → day) derive from finer ones without touching
  raw data (same merge);
* partitions of the fact table can be rolled up independently and
  merged — the map-side-combine property that makes this linear at
  100 TB.

``rollup_merge(a, b) == rollup_build(a_raw UNION b_raw)`` exactly for
count/sum/min/max and sketch-identically for HLL (union of sketches IS
the sketch of the union) — pinned in tests/test_rollup.py.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ("rollup_build", "rollup_merge", "rollup_finalize",
           "time_bucket")

# metric kind -> (build aggregate, merge aggregate)
_KINDS = {
    "count": (lambda c: F.count(F.lit(1) if c in ("*", None) else F.col(c)),
              F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "approx_distinct": (F.hll_sketch_agg, F.hll_union_agg),
}


def time_bucket(ts: Column, width: str = "hour") -> Column:
    """Truncate a timestamp to its bucket start (``date_trunc``)."""
    return F.date_trunc(width, ts)


def _check(metrics: Mapping[str, Tuple[str, str]]) -> None:
    for name, (kind, _col) in metrics.items():
        if kind not in _KINDS:
            raise ValueError(
                f"metric {name!r}: unknown kind {kind!r} "
                f"(expected one of {sorted(_KINDS)})")


def rollup_build(df: DataFrame, *, group_cols: Sequence[str],
                 metrics: Mapping[str, Tuple[str, str]]) -> DataFrame:
    """Aggregate raw rows into rollup state.

    ``metrics`` maps output column -> (kind, source column), e.g.::

        {"n": ("count", "*"), "sum_value": ("sum", "value"),
         "users": ("approx_distinct", "user_id")}

    One hash-aggregate (partial map-side combine applies); sketch
    columns are binary HLL state, readable via :func:`rollup_finalize`.
    """
    _check(metrics)
    aggs = [_KINDS[kind][0](col).alias(name)
            for name, (kind, col) in metrics.items()]
    return df.groupBy(*group_cols).agg(*aggs)


def rollup_merge(*rollups: DataFrame, group_cols: Sequence[str],
                 metrics: Mapping[str, Tuple[str, str]]) -> DataFrame:
    """Fold rollup tables (or a stored rollup + a new batch's rollup)
    into one: union then per-group merge aggregates.  Only groups
    present in more than one input do real work after the map-side
    combine; untouched groups stream through."""
    _check(metrics)
    if not rollups:
        raise ValueError("need at least one rollup")
    unioned = rollups[0]
    for r in rollups[1:]:
        unioned = unioned.unionByName(r)
    aggs = [_KINDS[kind][1](name).alias(name)
            for name, (kind, _col) in metrics.items()]
    return unioned.groupBy(*group_cols).agg(*aggs)


def rollup_finalize(rollup: DataFrame, *,
                    metrics: Mapping[str, Tuple[str, str]]) -> DataFrame:
    """Readable view of rollup state: HLL sketch columns become
    estimates (bigint); scalar states pass through unchanged."""
    _check(metrics)
    cols = []
    metric_names = set(metrics)
    for c in rollup.columns:
        if c in metric_names and metrics[c][0] == "approx_distinct":
            cols.append(F.hll_sketch_estimate(F.col(c)).alias(c))
        else:
            cols.append(F.col(c))
    return rollup.select(*cols)
