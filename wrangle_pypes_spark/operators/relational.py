"""Relational operators Spark lacks as single calls, composed scale-first.

Each operator documents its shuffle/partition strategy — the difference
between "works on 60k rows" and "works on 100 TB" is almost entirely
which of these strategies the plan picks.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from ..localdf import local_df
from pyspark.sql import functions as F


def _epoch(col: Column) -> Column:
    """Epoch seconds (double, µs fraction preserved) for timestamp,
    timestamp_ntz (interpreted in the UTC session tz), or numeric input."""
    return col.cast("timestamp").cast("double")


def topk_per_group(df: DataFrame, group_cols: Sequence[str], order_col: str,
                   k: int, *, descending: bool = True,
                   tie_breakers: Sequence[str] = ()) -> DataFrame:
    """Top-k rows per group via window row_number.

    Scale: one shuffle on ``group_cols``; within-partition sort is
    bounded by the group size, and AQE handles skewed groups.  For very
    hot groups (one group >> executor memory) pre-aggregate with a
    per-partition partial top-k first — not needed for k << group size
    because Spark's WindowExec spills.
    """
    ordering = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    ordering += [F.col(c).asc() for c in tie_breakers]
    w = Window.partitionBy(*group_cols).orderBy(*ordering)
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= k)
              .drop("_rn"))


def sessionize(df: DataFrame, key_col: str, ts_col: str,
               gap_seconds: int) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same key exceeds ``gap_seconds``.

    Classic lag + running-sum-of-boundaries; one shuffle on ``key_col``,
    both windows share the same partitioning so Catalyst plans a single
    exchange + sort.  (Streaming variant: ``F.session_window`` — see
    ``wrangle_pypes_spark.streaming``.)
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    gap = _epoch(F.col(ts_col)) - _epoch(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0))
    return (df.withColumn("_new_session", is_new)
              .withColumn("session_seq",
                          F.sum("_new_session").over(
                              w.rowsBetween(Window.unboundedPreceding, 0)))
              .drop("_new_session"))


def funnel_steps(df: DataFrame, *, key_col: str, ts_col: str,
                 type_col: str, steps: Sequence[str],
                 max_events_per_key: Optional[int] = 100_000) -> DataFrame:
    """Ordered funnel analysis: per key, how many of ``steps`` were
    completed IN ORDER (each step's event strictly follows the state
    reached by the previous step).  Output: (key, steps_completed).

    One shuffle (groupBy key), then a JVM ``aggregate`` fold over the
    key's time-sorted event structs advancing a step counter — the
    subsequence-matching greedy (earliest matching event per step),
    which is optimal.  Per-key event lists live in executor memory like
    any ``collect_list``; only events whose type appears in ``steps``
    survive the scan, and ``max_events_per_key`` caps the list AFTER
    the sort (``F.slice``) so one bot key cannot blow an executor at
    100× scale.  Truncation semantics: the EARLIEST ``max_events_per_key``
    funnel-type events are kept — the greedy matcher prefers earliest
    events anyway, so a truncated key can only UNDER-count steps whose
    qualifying events all fall past the cap.  ``None`` disables the cap.

    Tie order contract: simultaneous events sort by ``(ts, type)``
    LEXICOGRAPHICALLY on the type string — an event at the exact
    timestamp of the event that completed the previous step advances
    the funnel only if its type string sorts after it (e.g. a
    ``purchase`` at the same ts as the qualifying ``click`` counts, a
    ``click`` at the same ts as the qualifying ``view`` does not).
    Pick step names (or pre-map them to ordered labels) so the
    funnel's step order agrees with lexicographic order when
    same-timestamp advancement should count.
    """
    typed = df.filter(F.col(type_col).isin(*steps)) \
              .select(key_col, ts_col, type_col)
    sorted_evs = F.sort_array(F.collect_list(F.struct(ts_col, type_col)))
    if max_events_per_key is not None:
        sorted_evs = F.slice(sorted_evs, 1, max_events_per_key)
    evs = typed.groupBy(key_col).agg(sorted_evs.alias("_evs"))

    def advance(acc: Column, e: Column) -> Column:
        matched = F.lit(False)
        for i, s in enumerate(steps):
            matched = matched | ((acc == F.lit(i)) &
                                 (e[type_col] == F.lit(s)))
        return F.when(matched, acc + F.lit(1)).otherwise(acc)

    done = F.aggregate(F.col("_evs"), F.lit(0), advance)
    return evs.select(F.col(key_col),
                      done.cast("int").alias("steps_completed"))


def cohort_retention(df: DataFrame, *, key_col: str, ts_col: str,
                     bucket: str = "week") -> DataFrame:
    """Cohort retention matrix: keys are cohorted by the time bucket of
    their FIRST event; each (cohort, offset) cell counts the distinct
    keys active ``offset`` buckets after their cohort bucket.

    Two shuffles, both key-partitioned: the first-seen aggregate and
    the (cohort, bucket) distinct-count — the standard retention
    topology, with the first-seen side joined back on the key so the
    activity scan stays map-side after one co-partitioned join.
    """
    b = F.date_trunc(bucket, F.col(ts_col))
    first_seen = (df.groupBy(key_col)
                  .agg(F.min(b).alias("_cohort")))
    days = {"week": 7, "day": 1}.get(bucket)
    if days is None:
        raise ValueError("bucket must be 'week' or 'day'")
    act = (df.select(key_col, b.alias("_b")).distinct()
           .join(first_seen, key_col)
           .select(key_col, "_cohort",
                   (F.datediff(F.col("_b"), F.col("_cohort"))
                    / F.lit(days)).cast("int").alias("offset")))
    return (act.groupBy(F.col("_cohort").alias("cohort"), "offset")
            .agg(F.count_distinct(key_col).alias("n_active"))
            .orderBy("cohort", "offset"))


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str, *,
              right_value_cols: Optional[Sequence[str]] = None,
              direction: str = "backward") -> DataFrame:
    """As-of join: for each left row, the single right row with the
    latest ``right_ts`` <= ``left_ts`` (direction="backward"; "forward"
    mirrors it) for the same key.

    Spark-first strategy (no native as-of operator): union both sides
    tagged, sort within key, and carry the most recent right row forward
    as ONE struct with ``last(..., ignorenulls=True)`` — the struct of a
    matched right row is non-null even when individual value fields are
    NULL, so the as-of row's actual NULLs are preserved (a per-column
    fill would skip them and report a stale older value).  This costs
    ONE shuffle of (left ∪ right) on the key — versus the naive
    range-join which is O(|L|·|R|) per key.  This is the standard
    scalable formulation and survives 100× data growth as long as
    per-key history fits a window sort (spillable).
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    rcols = list(right_value_cols) if right_value_cols is not None else [
        c for c in right.columns if c not in (on, right_ts)]
    clash = set(rcols) & set(left.columns)
    if clash:
        raise ValueError(f"right value columns {sorted(clash)} collide with "
                         "left columns; rename before asof_join")

    right_types = dict((f.name, f.dataType) for f in right.schema.fields)
    rrow_t = T.StructType(
        [T.StructField(c, right_types[c], True) for c in rcols])
    lrow_t = T.StructType(left.schema.fields)
    lhs_sel = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(rrow_t).alias("_rrow"))
    rhs_sel = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lrow_t).alias("_lrow"),
        F.struct(*[F.col(c) for c in rcols]).alias("_rrow"))
    unioned = lhs_sel.unionByName(rhs_sel)

    if direction == "backward":
        # right rows sort before left rows at equal ts => "<=" semantics
        w = (Window.partitionBy(on).orderBy(F.col("_ts").asc(),
                                            F.col("_is_left").asc())
             .rowsBetween(Window.unboundedPreceding, 0))
    else:
        w = (Window.partitionBy(on).orderBy(F.col("_ts").desc(),
                                            F.col("_is_left").asc())
             .rowsBetween(Window.unboundedPreceding, 0))

    # left rows carry a NULL _rrow, so ignorenulls finds the latest RIGHT row
    filled = unioned.withColumn(
        "_rmatch", F.last(F.col("_rrow"), ignorenulls=True).over(w))
    out = filled.filter(F.col("_is_left") == 1)
    return out.select(*[F.col("_lrow").getField(c).alias(c) for c in left.columns],
                      *[F.col("_rmatch").getField(c).alias(c) for c in rcols])


def bucketed_range_join(left: DataFrame, right: DataFrame, on: str,
                        left_ts: str, right_ts: str,
                        lower_seconds: int, upper_seconds: int,
                        *, bucket_seconds: Optional[int] = None) -> DataFrame:
    """Join rows where ``right_ts`` ∈ [left_ts + lower, left_ts + upper]
    for the same key.

    A raw inequality join degenerates to a per-key cross product.  Here
    the time axis is bucketized: each left row explodes to the (few)
    buckets its window overlaps, then an EQUI-join on (key, bucket)
    prunes candidates before the exact filter.  Shuffle cost:
    |L|·(window/bucket) + |R| — linear, broadcast-able, AQE-friendly;
    this is the scalable interval-join formulation (Flink/KDB do the
    same under the hood).
    """
    if bucket_seconds is None:
        bucket_seconds = max(upper_seconds - lower_seconds, 1)
    clash = (set(left.columns) & set(right.columns)) - {on}
    if clash:
        raise ValueError(f"columns {sorted(clash)} exist on both sides; "
                         "rename before bucketed_range_join")
    lb = F.floor((_epoch(F.col(left_ts)) + lower_seconds) / bucket_seconds)
    ub = F.floor((_epoch(F.col(left_ts)) + upper_seconds) / bucket_seconds)
    # explicit aliases: a self-range-join would otherwise resolve both
    # sides of the condition to the same column lineage
    l = left.withColumn("_bucket", F.explode(F.sequence(lb, ub))).alias("_l")
    r = right.withColumn("_bucket",
                         F.floor(_epoch(F.col(right_ts)) / bucket_seconds)).alias("_r")
    cond = (
        (F.col(f"_l.{on}") == F.col(f"_r.{on}")) &
        (F.col("_l._bucket") == F.col("_r._bucket")) &
        (_epoch(F.col(f"_r.{right_ts}")) >= _epoch(F.col(f"_l.{left_ts}")) + lower_seconds) &
        (_epoch(F.col(f"_r.{right_ts}")) <= _epoch(F.col(f"_l.{left_ts}")) + upper_seconds)
    )
    out = l.join(r, cond, "inner")
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_r.{c}").alias(c) for c in right.columns if c != on])


def salted_join(left: DataFrame, right: DataFrame, on: str, *,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with key salting for a skewed LEFT key distribution.

    A hot key sends all its rows to one reducer; salting splits it:
    every left row gets a deterministic salt in ``[0, salt)`` (hash of
    the full row, so re-runs are stable), the right side is replicated
    ``salt`` times, and the join key becomes ``(key, salt)`` — the hot
    key's rows now spread over ``salt`` tasks.  Cost: right side
    shuffles ``salt``x (use for skewed-left x small-right shapes; AQE's
    skew-join handles the symmetric case).  Results are identical to the
    plain join — the oracle query asserts exactly that.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (the skewed-left shapes)")
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                   F.lit(salt)).cast("int")
    l = left.withColumn("_salt", lsalt)
    r = right.withColumn("_salt", F.explode(
        F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>")))
    out = l.join(r, [on, "_salt"], how)
    return out.drop("_salt")


def key_skew_profile(df: DataFrame, key_cols: Sequence[str], *,
                     k: int = 20, round_digits: int = 6) -> DataFrame:
    """Top-``k`` heaviest keys with their share of the table — the
    measurement that decides whether a join/agg needs
    :func:`salted_join`, AQE skew handling, or a broadcast instead.
    At 100 TB you profile BEFORE you shuffle: one hot key discovered
    in production costs a re-run; discovered here it costs one
    aggregate.

    Output per heavy key: ``(rank, *key_cols, n, share, cume_share)``
    — ``share`` is the key's fraction of all rows, ``cume_share`` the
    running total over the ranked heavy keys (top-k rows covering 80%
    of the table = salt those keys; top key at 1/partitions = data is
    fine).  Rank ties break by key value, so the output is
    deterministic and value-level checkable.

    Plan shape: one groupBy shuffle on the keys, a 1-row total
    aggregate broadcast back, and a TakeOrdered top-k (no global sort
    materializes — Spark plans orderBy+limit as a per-partition heap +
    driver merge of k·partitions rows).
    """
    keys = list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("_tot"))
    top = (counts.join(F.broadcast(total))
           .orderBy(F.col("n").desc(), *[F.col(c).asc() for c in keys])
           .limit(k))
    w = (Window.orderBy(F.col("n").desc(),
                        *[F.col(c).asc() for c in keys])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return top.select(
        F.row_number().over(
            Window.orderBy(F.col("n").desc(),
                           *[F.col(c).asc() for c in keys]))
        .alias("rank"),
        *keys,
        F.col("n"),
        F.round(F.col("n") / F.col("_tot"), round_digits)
         .alias("share"),
        F.round(F.sum("n").over(w) / F.col("_tot"), round_digits)
         .alias("cume_share"))


def zorder_col(df: DataFrame, cols: Sequence[str], *, bits: int = 16,
               out_col: str = "_zorder") -> DataFrame:
    """Add a Z-order (Morton) value interleaving ``cols``' bits.

    Sorting/range-partitioning by the Z-value before writing clusters
    rows that are close in EVERY dimension into the same files, so
    parquet min/max row-group stats prune multi-dimensional predicates
    (the Delta OPTIMIZE ZORDER layout, as a plain column expression).
    Each column is min/max-scaled to ``bits`` bits (one small agg pass);
    bit k of column j lands at position ``k*len(cols)+j``.  Total bits
    must fit a long: ``bits * len(cols) <= 63``.

    Usage: ``write_parquet(zorder_col(df, ["a","b"]), path,
    sort_by=["_zorder"])`` or ``df.repartitionByRange("_zorder")`` for
    file-level clustering.
    """
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits*len(cols) = {bits * n} exceeds long range")
    ranges = df.agg(*[F.min(c).alias(f"_lo{i}") for i, c in enumerate(cols)],
                    *[F.max(c).alias(f"_hi{i}") for i, c in enumerate(cols)]
                    ).first()
    scaled = []
    for i, c in enumerate(cols):
        lo = float(ranges[f"_lo{i}"])
        hi = float(ranges[f"_hi{i}"])
        width = (hi - lo) or 1.0
        # clamp to [0, 2^bits - 1]
        scaled.append(
            f"least(greatest(CAST(floor((CAST(`{c}` AS DOUBLE) - {lo!r}) "
            f"/ {width!r} * {(1 << bits)}) AS BIGINT), CAST(0 AS BIGINT)), "
            f"CAST({(1 << bits) - 1} AS BIGINT))")
    terms = []
    for j, s in enumerate(scaled):
        for k in range(bits):
            terms.append(f"shiftleft(shiftright({s}, {k}) & 1, {k * n + j})")
    return df.withColumn(out_col, F.expr(" | ".join(terms)))


def validate(df: DataFrame, rules: "dict[str, Column]", *,
             id_cols: Sequence[str]) -> DataFrame:
    """Constraint checking: one output row per (row, violated rule).

    ``rules`` maps rule name -> predicate Column that must hold.  The
    result carries ``id_cols`` plus ``rule`` — the violations table a
    data-quality gate feeds to quarantine/alerting.  Single scan, no
    shuffle: all rules evaluate in one projection and the per-row rule
    array is exploded (rows violating nothing produce nothing).
    """
    checks = F.array(*[
        F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
        for name, pred in rules.items()])
    out = df.select(*id_cols,
                    F.explode(F.filter(checks, lambda x: x.isNotNull()))
                    .alias("rule"))
    return out


def pivot_table(df: DataFrame, group_cols: Sequence[str], pivot_col: str,
                values: Sequence, agg: Column) -> DataFrame:
    """Pivot with an explicit value list.

    Always pass ``values``: without it Spark runs an extra distinct scan
    to discover them, and an unbounded pivot width is a scale hazard.
    """
    return df.groupBy(*group_cols).pivot(pivot_col, list(values)).agg(agg)


def unpivot(df: DataFrame, id_cols: Sequence[str], value_cols: Sequence[str],
            var_name: str = "variable", value_name: str = "value") -> DataFrame:
    """Melt columns to rows (native ``unpivot`` — no shuffle, no UDF)."""
    return df.unpivot(list(id_cols), list(value_cols), var_name, value_name)


def profile(df: DataFrame, cols: Optional[Sequence[str]] = None, *,
            exact_distinct: bool = False) -> DataFrame:
    """Column profile: one output row per column with
    ``(column, dtype, n, n_null, n_distinct, min_value, max_value,
    mean)`` — the engine's SUMMARIZE.

    ONE aggregate pass produces every statistic (min/max/mean/null
    counts are all partial-aggregatable), then the single wide row is
    unpivoted driver-side into k rows — no second scan, no shuffle
    beyond the aggregate's.  ``min_value``/``max_value`` are cast to
    string so one schema covers numeric, string, and timestamp columns;
    ``mean`` is NULL for non-numeric columns.

    ``exact_distinct=True`` uses ``count(DISTINCT)`` (k distinct aggs →
    one Expand of the scan by k — fine at audit scale, wrong default
    for 100 TB); the default is HyperLogLog++
    (``approx_count_distinct``, single-pass mergeable sketch, ~2%
    relative error).
    """
    names = list(cols) if cols is not None else list(df.columns)
    numeric = {f.name for f in df.schema.fields
               if f.name in names and
               f.dataType.typeName() in
               ("byte", "short", "integer", "long", "float", "double",
                "decimal")}
    dtypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in names:
        distinct = (F.countDistinct(c) if exact_distinct
                    else F.approx_count_distinct(c))
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            distinct.alias(f"_dist_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
            (F.avg(F.col(c).cast("double")) if c in numeric
             else F.lit(None).cast("double")).alias(f"_mean_{c}"),
        ]
    # ONE job: the aggregate collapses to a single wide row; collect it
    # and fan out driver-side (k stats rows, not data).  Unioning k
    # projections of the aggregate would re-run the scan per column —
    # Spark does not reliably reuse the exchange across union branches.
    row = df.agg(*aggs).collect()[0]
    records = [
        (c, dtypes[c], row["_n"], row[f"_null_{c}"], row[f"_dist_{c}"],
         row[f"_min_{c}"], row[f"_max_{c}"], row[f"_mean_{c}"])
        for c in names]
    return local_df(
        df.sparkSession, records,
        "column string, dtype string, n bigint, n_null bigint, "
        "n_distinct bigint, min_value string, max_value string, "
        "mean double")


def bucketize(df: DataFrame, value_col: str, *,
              probs: Sequence[float] = (0.25, 0.5, 0.75),
              exact: bool = True, round_cuts: int = 6,
              out_col: str = "bucket") -> DataFrame:
    """Quantile binning (feature bucketization): compute the
    ``probs``-quantile cut points of ``value_col`` over the whole
    DataFrame, then assign each row the bucket index
    ``#{cuts c : value > c}`` (0 .. len(probs)) — equal-frequency bins
    from the data itself, no hand-tuned boundaries.

    * ``exact=True`` — exact linear-interpolation ``percentile``: a
      full-sort aggregate per partition merge; cut points match any
      engine's ``quantile_cont`` after rounding to ``round_cuts``
      decimals, which makes downstream bucket assignment value-level
      oracle-checkable.
    * ``exact=False`` — ``approx_percentile`` (Greenwald-Khanna, no
      sort): the 100 TB default; bucket boundaries are approximate so
      checks are rows-only.

    Scale shape: ONE aggregate collapsing to a k-cut row collected to
    the driver (k scalars, not data), then a map-only codegen'd
    assignment (`size(filter(...))` over a literal array) — no second
    shuffle, no join.  NULL values get a NULL bucket.
    """
    probs = [float(p) for p in probs]
    if not probs or any(not 0.0 < p < 1.0 for p in probs):
        raise ValueError("probs must be within (0, 1)")
    if sorted(probs) != probs:
        raise ValueError("probs must be ascending")
    pcts = F.array(*[F.lit(p) for p in probs])
    fn = F.percentile if exact else F.approx_percentile
    cuts_row = df.agg(
        fn(F.col(value_col), pcts).alias("c")).collect()[0]["c"]
    if cuts_row is None:
        # empty input / all-NULL column: no cut points exist — every
        # row (there may be none, or only NULLs) gets a NULL bucket
        return df.withColumn(out_col, F.lit(None).cast("int"))
    cuts = [round(float(c), round_cuts) for c in cuts_row]
    cut_arr = F.array(*[F.lit(c) for c in cuts])
    v = F.col(value_col).cast("double")
    bucket = F.when(v.isNotNull(), F.size(
        F.filter(cut_arr, lambda c: v > c)))
    return df.withColumn(out_col, bucket)


def merge_intervals(df: DataFrame, key_col: str, start_col: str,
                    end_col: str, *, gap: float = 0) -> DataFrame:
    """Coalesce overlapping / near-adjacent intervals per key (the
    gaps-and-islands move): intervals whose start is within ``gap``
    seconds of the running maximum end so far merge into one island.
    Output: one row per island — (key, start, end, n_merged).

    Works on timestamp or numeric interval bounds (timestamps compare
    via exact integer microseconds, so island boundaries are
    bit-identical in any engine).

    Scale shape: one shuffle on the key, one sorted window pass (the
    running-max-end frame and the island running sum share the sort),
    then a (key, island) aggregate with map-side partials on the SAME
    partitioning — AQE plans a single exchange end to end.
    """
    is_ts = df.schema[start_col].dataType.typeName().startswith("timestamp")
    if is_ts:
        s = F.unix_micros(F.col(start_col).cast("timestamp"))
        e = F.unix_micros(F.col(end_col).cast("timestamp"))
        gap_u = int(gap * 1_000_000)
    else:
        s, e = F.col(start_col), F.col(end_col)
        gap_u = gap
    w = Window.partitionBy(key_col).orderBy(s, e)
    prev_max_end = F.max(e).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prev_max_end.isNull() | (s > prev_max_end + F.lit(gap_u)),
        F.lit(1)).otherwise(F.lit(0))
    island = F.sum(new_island).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    merged = (df.select(F.col(key_col), s.alias("_s"), e.alias("_e"),
                        island.alias("_island"))
              .groupBy(key_col, "_island")
              .agg(F.min("_s").alias("_lo"), F.max("_e").alias("_hi"),
                   F.count("*").alias("n_merged")))
    if is_ts:
        out_s = F.timestamp_micros(F.col("_lo"))
        out_e = F.timestamp_micros(F.col("_hi"))
    else:
        out_s, out_e = F.col("_lo"), F.col("_hi")
    return merged.select(key_col, out_s.alias(start_col),
                         out_e.alias(end_col), "n_merged")


def snapshot_diff(old: DataFrame, new: DataFrame, id_col: str, *,
                  compare_cols: Sequence[str]) -> DataFrame:
    """Corpus version diff: classify every id across two snapshots as
    ``added`` (new only), ``removed`` (old only), ``changed`` (both,
    differing md5 over ``compare_cols``) or ``unchanged`` — the audit
    that makes a regrown 100 TB corpus reviewable before training on
    it.  Output: (id, status, old_hash, new_hash).

    Scale shape: each side collapses to (id, hash) map-side — the
    full-outer join ships two narrow columns per row, never document
    bodies.  One shuffle on the id (or zero with co-bucketed stores).
    md5 over a '\\x1f'-joined canonical encoding is engine-portable, so
    the whole diff is value-level oracle-checkable.
    """
    def hashed(df: DataFrame, alias: str) -> DataFrame:
        parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                 for c in compare_cols]
        return df.select(F.col(id_col),
                         F.md5(F.concat_ws("\x1f", *parts)).alias(alias))

    o = hashed(old, "old_hash")
    n = hashed(new, "new_hash")
    j = o.join(n, id_col, "full_outer")
    status = (F.when(F.col("old_hash").isNull(), F.lit("added"))
              .when(F.col("new_hash").isNull(), F.lit("removed"))
              .when(F.col("old_hash") == F.col("new_hash"),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select(id_col, status.alias("status"), "old_hash", "new_hash")


def standardize(df: DataFrame, value_cols: Sequence[str], *,
                group_cols: Optional[Sequence[str]] = None,
                round_digits: Optional[int] = None) -> DataFrame:
    """Z-normalize numeric columns — globally or per group — appending
    ``{col}_z = (x − mean) / stddev`` (sample stddev; NULL when the
    group is constant or a singleton).  The feature-scaling step before
    embedding math, anomaly thresholds, or mixed-unit scoring.

    Scale shape: one partial-aggregated stats pass (k×groups rows) that
    BROADCASTS back onto the corpus — a map-only transform, never a
    single-partition global window (``avg() OVER ()`` is the classic
    scale trap this op exists to avoid).  ``round_digits`` applies the
    cross-engine float-tolerance contract when oracle comparison is
    intended.
    """
    gcols = list(group_cols or [])
    aggs = []
    for c in value_cols:
        aggs += [F.avg(c).alias(f"_mu_{c}"),
                 F.stddev_samp(c).alias(f"_sd_{c}")]
    if gcols:
        stats = df.groupBy(*gcols).agg(*aggs)
        # null-safe: a NULL group key is a group like any other (the
        # same contract as quantile_filter/cap_per_group)
        cond = None
        for g in gcols:
            c = df[g].eqNullSafe(stats[g])
            cond = c if cond is None else (cond & c)
        joined = df.join(F.broadcast(stats), cond, "left") \
            .drop(*[stats[g] for g in gcols])
    else:
        stats = df.agg(*aggs)
        joined = df.crossJoin(F.broadcast(stats))
    out_cols = list(df.columns)
    for c in value_cols:
        z = F.when(F.col(f"_sd_{c}") > 0,
                   (F.col(c) - F.col(f"_mu_{c}")) / F.col(f"_sd_{c}"))
        if round_digits is not None:
            z = F.round(z, round_digits)
        out_cols.append(z.alias(f"{c}_z"))
    return joined.select(*out_cols)


def winsorize(df: DataFrame, value_col: str, *,
              lower: float = 0.01, upper: float = 0.99,
              exact: bool = True, round_cuts: int = 6,
              out_col: Optional[str] = None) -> DataFrame:
    """Percentile clipping (winsorization): cap ``value_col`` into its
    [``lower``, ``upper``] quantile range — the outlier-taming step
    before means/regressions that :func:`standardize` and friends
    assume.  ``exact=True`` uses exact interpolated percentiles
    (oracle-checkable after rounding to ``round_cuts``);
    ``exact=False`` uses ``approx_percentile`` — the 100 TB default.

    Scale shape: one aggregate collapsing to two scalars, then a
    map-only ``least(greatest(...))`` projection.  NULLs pass through
    unchanged.
    """
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError("need 0 <= lower < upper <= 1")
    fn = F.percentile if exact else F.approx_percentile
    row = df.agg(fn(F.col(value_col),
                    F.array(F.lit(lower), F.lit(upper))).alias("c")) \
        .collect()[0]["c"]
    if row is None:
        # empty input / all-NULL column: nothing to clip against
        return df.withColumn(out_col or f"{value_col}_winsor",
                             F.col(value_col).cast("double"))
    lo, hi = (round(float(c), round_cuts) for c in row)
    clipped = F.when(
        F.col(value_col).isNotNull(),
        F.least(F.greatest(F.col(value_col).cast("double"), F.lit(lo)),
                F.lit(hi)))
    return df.withColumn(out_col or f"{value_col}_winsor", clipped)


def assign_sequential_ids(df: DataFrame, order_cols: Sequence[str], *,
                          out_col: str = "seq_id", start: int = 0,
                          num_partitions: Optional[int] = None
                          ) -> DataFrame:
    """Dense global sequential ids (``start``, ``start+1``, …) in
    ``order_cols`` order — WITHOUT the single-partition window that
    ``row_number() OVER (ORDER BY …)`` plans (one task sorting the
    whole table is the canonical 100 TB anti-pattern), and without
    ``monotonically_increasing_id``'s gaps and partition-layout
    dependence.

    Two-pass offset scheme (the standard distributed enumeration):

    1. range-partition + sort by ``order_cols`` (one shuffle — the
       global sort an ordered enumeration needs anyway);
    2. count rows per partition (a k-row aggregate), prefix-sum the
       counts driver-side (k scalars, not data), broadcast the offsets
       back, and add each row's partition-local record index — read
       from ``monotonically_increasing_id``'s documented layout
       (partition id in the upper 31 bits, record number within the
       partition in the lower 33), so NO second shuffle and no window:
       the post-shuffle plan is a broadcast join plus a projection.

    ``order_cols`` should be a total order (include a unique column
    last) or equal rows get an engine-arbitrary relative id.  The ids
    are DENSE and DETERMINISTIC for a total order; unlike a hash
    surrogate they change when rows are inserted upstream — use a hash
    key where stability-under-growth matters, this where downstream
    needs compact 0..n-1 ids (tensor row indices, shard offsets,
    matrix factorization).
    """
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")
    ordered = (df.repartitionByRange(int(n),
                                     *[F.col(c) for c in order_cols])
               .sortWithinPartitions(*order_cols)
               .withColumn("_pid", F.spark_partition_id()))
    # PIN one physical partitioning: the counts job and the final job
    # must see identical partitions, but an un-materialized
    # repartitionByRange re-SAMPLES its boundaries per job — offsets
    # from one sampling applied to another silently corrupt the ids
    ordered = ordered.localCheckpoint(eager=True)
    counts = (ordered.groupBy("_pid")
              .agg(F.count(F.lit(1)).alias("_n")).collect())
    offsets, acc = {}, int(start)
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = acc
        acc += r["_n"]
    spark = df.sparkSession
    off = local_df(
        spark, [(int(p), int(o)) for p, o in offsets.items()],
        "_pid int, _off long")
    # partition-local record index WITHOUT a window (a window
    # partitioned by _pid would re-shuffle the whole table — the
    # ExistingRDD scan carries no distribution info Catalyst could
    # reuse): monotonically_increasing_id is documented as
    # (partition id << 33) | record-number-within-partition, and the
    # checkpointed partitions iterate in their stored (sorted) order
    local_idx = F.monotonically_increasing_id() \
        .bitwiseAND(F.lit((1 << 33) - 1))
    return (ordered.withColumn("_lidx", local_idx)
            .join(F.broadcast(off), "_pid")
            .withColumn(out_col,
                        (F.col("_off") + F.col("_lidx")).cast("long"))
            .drop("_pid", "_off", "_lidx"))


def flatten_structs(df: DataFrame, *, sep: str = "_",
                    max_depth: int = 16) -> DataFrame:
    """Recursively flatten every struct column into top-level columns
    with ``sep``-joined path names (``customer.address.city`` →
    ``customer_address_city``) — the generic inverse of the wrangle
    ``Create``/nested-model builders, for sinks and BI layers that
    want flat relational schemas.  Arrays and maps are NOT entered
    (flattening across an array changes cardinality — explode first
    if that is intended); a NULL struct yields NULLs in all its
    leaves, matching SQL's ``s.f`` semantics.

    Pure projection — one select list, map-only, no UDF; column
    pruning still pushes into the parquet scan because the select is
    ordinary field access.  Name collisions after joining raise
    rather than silently shadowing.  ``max_depth`` guards against
    pathological recursive schemas.
    """
    from pyspark.sql import types as T

    cols: list = []
    names: list = []

    def walk(col, name: str, dtype, depth: int):
        if isinstance(dtype, T.StructType) and depth < max_depth:
            for f in dtype.fields:
                walk(col[f.name], f"{name}{sep}{f.name}",
                     f.dataType, depth + 1)
        else:
            cols.append(col.alias(name))
            names.append(name)

    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            walk(F.col(f.name), f.name, f.dataType, 1)
        else:
            cols.append(F.col(f.name))
            names.append(f.name)
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(
            f"flatten_structs: flattened names collide: {sorted(dupes)}"
            f" — use a different sep or rename before flattening")
    return df.select(*cols)
