"""Time-series operators.

Two surfaces:

* Column/window ops (:func:`resample`, :func:`rolling_zscore`) — pure
  DataFrame expressions, JVM-side end to end; the shuffle budget is one
  key-partitioning that every downstream window/aggregate reuses.
* ``applyInPandas`` ops (:func:`grouped_ewma`) — the ops that are
  genuinely RECURSIVE along the time axis (each output depends on the
  previous output), so no window frame or aggregate expresses them; the
  idiomatic Spark shape is a grouped-map pandas function: one shuffle on
  the key, then a vectorized per-group computation (state never leaves
  the group, groups parallelize across executors; a single huge group is
  the scale limit, same as any window-over-key).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def grouped_ewma(df: DataFrame, *, key_col: str, ts_col: str,
                 value_col: str, alpha: float = 0.3) -> DataFrame:
    """Exponentially-weighted moving average of ``value_col`` per key,
    ordered by ``ts_col``: ``ewma_t = alpha*x_t + (1-alpha)*ewma_{t-1}``.

    Output: (key, ts, value, ewma).  Deterministic: rows are sorted by
    (ts, value) inside each group before the recursion.
    """
    schema = T.StructType([
        df.schema[key_col], df.schema[ts_col], df.schema[value_col],
        T.StructField("ewma", T.DoubleType()),
    ])

    def _partition(batches):
        # One Python call per Arrow batch instead of one per KEY
        # (applyInPandas pays pandas-frame construction + function
        # dispatch per group; with many small keys that overhead
        # dominates).  Rows arrive sorted by (key, ts, value), so each
        # key's rows are contiguous; groupby(sort=False).ewm replays
        # the identical adjust=False recurrence per key in one C pass.
        # A key split across batch boundaries is continued by seeding
        # the next batch's first group with the carried ewma: with
        # adjust=False, y_t = (1-a)*y_{t-1} + a*x_t, so prepending the
        # carried value and dropping it reproduces the unbroken
        # recurrence bit-for-bit.
        # carry_started distinguishes "no batch seen yet" from "last key
        # was null" — a None/NaN carry_key is a legitimate key value
        # (null-keyed rows form their own group; dropna=False below
        # keeps them, and the carry comparison is null-safe)
        carry_started = False
        carry_key = None
        carry_val = None
        for pdf in batches:
            if not len(pdf):
                continue
            keys = pdf[key_col]
            vals = pdf[value_col].astype("float64")
            ewma = (vals.groupby(keys.values, sort=False, dropna=False)
                    .ewm(alpha=alpha, adjust=False).mean()
                    .reset_index(drop=True))
            first_key = keys.iloc[0]
            same_key = (pd.isna(first_key) and pd.isna(carry_key)) \
                if (pd.isna(first_key) or pd.isna(carry_key)) \
                else bool(first_key == carry_key)
            if carry_started and same_key:
                mask = (keys.isna().values if pd.isna(first_key)
                        else keys.values == first_key)
                n0 = len(keys) if mask.all() else int(mask.argmin())
                seeded = (pd.concat([pd.Series([carry_val]),
                                     vals.iloc[:n0]],
                                    ignore_index=True)
                          .ewm(alpha=alpha, adjust=False).mean()
                          .iloc[1:].reset_index(drop=True))
                ewma.iloc[:n0] = seeded.values
            carry_started = True
            carry_key = keys.iloc[-1]
            carry_val = float(ewma.iloc[-1])
            yield pd.DataFrame({
                key_col: keys, ts_col: pdf[ts_col],
                value_col: pdf[value_col], "ewma": ewma,
            })

    return (df.select(key_col, ts_col, value_col)
            .repartition(key_col)
            .sortWithinPartitions(key_col, ts_col, value_col)
            .mapInPandas(_partition, schema=schema))


_RESAMPLE_AGGS = {
    "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
    "count": F.count,
}


def resample(df: DataFrame, *, key_col: str, ts_col: str,
             value_col: str, interval_sec: int, agg: str = "sum",
             fill: bool = True) -> DataFrame:
    """Fixed-interval resampling with gap materialization and optional
    forward fill: bucket events into ``interval_sec`` windows per key,
    aggregate ``value_col`` (``sum``/``avg``/``min``/``max``/``count``),
    emit a row for EVERY bucket between each key's first and last
    observation (gaps included), and carry the last observed value
    across gaps (``filled``; ``is_gap`` marks materialized buckets).

    Bucketing is integer microsecond arithmetic (``unix_micros`` minus
    its remainder), never float epoch math — the bucket boundary is
    bit-identical in any engine, which is what makes the op
    value-level oracle-checkable.

    Scale shape: one (key, bucket) aggregate with map-side partials;
    the per-key grid comes from a k-row span aggregate exploded
    map-side (`sequence` — no driver round-trip, no cross join); the
    grid↔observation join and the forward-fill window share the key
    partitioning, so AQE plans ONE shuffle for all three.  Grid size
    is span/interval rows per key — choose ``interval_sec`` so a key's
    grid stays executor-bounded (same contract as any per-key window).
    """
    if agg not in _RESAMPLE_AGGS:
        raise ValueError(f"agg must be one of {sorted(_RESAMPLE_AGGS)}")
    step = int(interval_sec) * 1_000_000
    if step <= 0:
        raise ValueError("interval_sec must be positive")
    # cast handles TIMESTAMP_NTZ sources (unix_micros requires LTZ;
    # under the engine's fixed UTC session zone the cast is identity
    # on the wall-clock value)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    obs = (df.select(F.col(key_col).alias("_k"),
                     (us - F.pmod(us, F.lit(step))).alias("_b"),
                     F.col(value_col).alias("_v"))
           .groupBy("_k", "_b")
           .agg(_RESAMPLE_AGGS[agg]("_v").alias("_agg")))
    grid = (obs.groupBy("_k")
            .agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
            .select("_k", F.explode(F.sequence(
                F.col("_lo"), F.col("_hi"), F.lit(step))).alias("_b")))
    out = grid.join(obs, ["_k", "_b"], "left")
    cols = [F.col("_k").alias(key_col),
            F.timestamp_micros(F.col("_b")).alias("bucket"),
            F.col("_agg").alias(f"{agg}_{value_col}"),
            F.col("_agg").isNull().alias("is_gap")]
    if fill:
        w = (Window.partitionBy("_k").orderBy("_b")
             .rowsBetween(Window.unboundedPreceding, 0))
        cols.append(F.last("_agg", ignorenulls=True).over(w)
                    .alias("filled"))
    return out.select(*cols)


def rolling_zscore(df: DataFrame, *, key_col: str, ts_col: str,
                   value_col: str, n: int = 20, min_periods: int = 5,
                   threshold: float = 3.0,
                   tiebreak_cols: tuple = ()) -> DataFrame:
    """Per-key rolling anomaly score: z = (x − mean) / stddev over the
    ``n`` observations STRICTLY BEFORE the current row (ROWS frame
    −n..−1 — the current value never deflates its own baseline), with
    ``is_anomaly`` set when ``|z| > threshold``.  ``z`` is NULL until
    ``min_periods`` prior observations accumulate or when the baseline
    window is constant (stddev 0) — a cold-start row is "unknown", not
    "normal".

    Ordering inside a key is (``ts_col``, *tiebreak_cols); pass a
    unique tiebreak (an event id) when timestamps can collide, or the
    frame contents — and therefore z — are partition-order dependent.

    Scale shape: one shuffle on the key, one sorted window pass, all
    JVM-side; per-key data volume is the only skew bound (same as any
    window-over-key).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    w = (Window.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-n, -1))
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    cnt = F.count(value_col).over(w)
    z = F.when((cnt >= min_periods) & (std > 0),
               (F.col(value_col) - mean) / std)
    return df.select(
        key_col, ts_col, value_col,
        *[c for c in tiebreak_cols if c not in (key_col, ts_col, value_col)],
        cnt.alias("n_obs"), z.alias("zscore"),
        F.when(z.isNotNull(), F.abs(z) > threshold).alias("is_anomaly"))


def rolling_median(df: DataFrame, *, key_col: str, ts_col: str,
                   value_col: str, n: int,
                   tiebreak_cols: tuple = ()) -> DataFrame:
    """Per-key rolling median over the trailing ``n`` observations
    (ROWS frame including the current row) — the robust smoother for
    outlier-laden metrics, where a rolling mean chases every spike.
    Even-sized frames average the two middle values (the
    ``quantile_cont(0.5)`` convention, so any engine mirrors it).

    Scale shape: one shuffle on the key, one sorted window pass.  The
    frame is materialized per row (``collect_list`` + ``sort_array``
    inside the window — O(n log n) per row), so keep ``n`` modest
    (tens-to-hundreds); this is the exact-order-statistic trade-off,
    not a skew bug.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    w = (Window.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-(n - 1), 0))
    arr = F.sort_array(F.collect_list(value_col).over(w))
    sz = F.size(arr)
    odd = F.element_at(arr, ((sz + 1) / 2).cast("int"))
    even = (F.element_at(arr, (sz / 2).cast("int"))
            + F.element_at(arr, (sz / 2 + 1).cast("int"))) / 2
    med = F.when(sz % 2 == 1, odd).otherwise(even)
    return df.select(
        key_col, ts_col, value_col,
        *[c for c in tiebreak_cols if c not in (key_col, ts_col, value_col)],
        sz.cast("long").alias("n_obs"), med.alias("rolling_median"))
