"""Tests for the relational operator compositions (asof, range join,
sessionize, topk) against hand-computed expectations."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wrangle_pypes_spark.operators.relational import (
    asof_join,
    bucketed_range_join,
    sessionize,
    topk_per_group,
    unpivot,
)


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        "k string, id long, v double")
    out = topk_per_group(df, ["k"], "v", 2, tie_breakers=["id"])
    got = sorted((r.k, r.id) for r in out.collect())
    assert got == [("a", 2), ("a", 3), ("b", 4)]


def test_topk_tie_break_deterministic(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 10.0), ("a", 3, 10.0)],
        "k string, id long, v double")
    out = topk_per_group(df, ["k"], "v", 2, tie_breakers=["id"])
    assert sorted(r.id for r in out.collect()) == [1, 2]


def test_sessionize(spark):
    rows = [
        (1, 100, ts("2024-01-01T00:00:00")),
        (1, 101, ts("2024-01-01T00:10:00")),   # same session (gap 600 < 1800)
        (1, 102, ts("2024-01-01T01:00:00")),   # new session (gap 3000)
        (2, 200, ts("2024-01-01T00:00:00")),
    ]
    df = spark.createDataFrame(rows, "user long, event long, ts timestamp")
    out = sessionize(df, "user", "ts", 1800)
    got = {r.event: r.session_seq for r in out.collect()}
    assert got == {100: 1, 101: 1, 102: 2, 200: 1}


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, 10, ts("2024-01-05T00:00:00")),
         (1, 11, ts("2024-01-01T00:00:00")),   # before any right row
         (2, 20, ts("2024-01-05T00:00:00"))],
        "k long, lid long, lts timestamp")
    right = spark.createDataFrame(
        [(1, ts("2024-01-02T00:00:00"), "r1"),
         (1, ts("2024-01-04T00:00:00"), "r2"),
         (1, ts("2024-01-06T00:00:00"), "r3"),
         (2, ts("2024-01-05T00:00:00"), "r4")],  # equal ts: inclusive
        "k long, rts timestamp, val string")
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts")
    got = {r.lid: r.val for r in out.collect()}
    assert got == {10: "r2", 11: None, 20: "r4"}


def test_asof_join_forward(spark):
    left = spark.createDataFrame([(1, 10, ts("2024-01-03T00:00:00"))],
                                 "k long, lid long, lts timestamp")
    right = spark.createDataFrame(
        [(1, ts("2024-01-02T00:00:00"), "past"),
         (1, ts("2024-01-04T00:00:00"), "next")],
        "k long, rts timestamp, val string")
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                    direction="forward")
    assert out.collect()[0].val == "next"


def test_bucketed_range_join_matches_naive(spark, tables):
    e = tables["events"].limit(2000)
    a = e.select("user_id", F.col("event_id").alias("id_a"),
                 F.col("ts").alias("ts_a"))
    b = e.select("user_id", F.col("event_id").alias("id_b"),
                 F.col("ts").alias("ts_b"))
    fast = bucketed_range_join(a, b, on="user_id", left_ts="ts_a",
                               right_ts="ts_b", lower_seconds=0,
                               upper_seconds=3600)
    fast_pairs = {(r.id_a, r.id_b) for r in
                  fast.filter(F.col("ts_b") > F.col("ts_a")).collect()}
    a2, b2 = a.alias("a"), b.alias("b")
    naive = a2.join(b2, (F.col("a.user_id") == F.col("b.user_id")) &
                    (F.col("b.ts_b") > F.col("a.ts_a")) &
                    (F.col("b.ts_b").cast("timestamp").cast("double") <=
                     F.col("a.ts_a").cast("timestamp").cast("double") + 3600))
    naive_pairs = {(r.id_a, r.id_b) for r in naive.collect()}
    assert fast_pairs == naive_pairs
    assert len(fast_pairs) > 0


def test_range_join_name_clash_raises(spark):
    df = spark.createDataFrame([(1, ts("2024-01-01T00:00:00"))],
                               "k long, t timestamp")
    with pytest.raises(ValueError, match="both sides"):
        bucketed_range_join(df, df, on="k", left_ts="t", right_ts="t",
                            lower_seconds=0, upper_seconds=10)


def test_unpivot(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0)], "id long, a double, b double")
    out = unpivot(df, ["id"], ["a", "b"])
    got = sorted((r.variable, r.value) for r in out.collect())
    assert got == [("a", 2.0), ("b", 3.0)]


def test_salted_join_equals_plain_join(spark, tables):
    from wrangle_pypes_spark.operators.relational import salted_join

    li = tables["lineitem"].select("l_orderkey", "l_quantity")
    o = tables["orders"].select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    salted = salted_join(li, o, "l_orderkey", salt=4)
    plain = li.join(o, "l_orderkey")
    a = sorted((r.l_orderkey, r.l_quantity, r.o_orderpriority)
               for r in salted.collect())
    b = sorted((r.l_orderkey, r.l_quantity, r.o_orderpriority)
               for r in plain.collect())
    assert a == b

    # the join key must actually include the salt (that is the point)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan


def test_salted_left_join_keeps_unmatched(spark):
    from wrangle_pypes_spark.operators.relational import salted_join

    l = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    r = spark.createDataFrame([(1, "x")], "k long, w string")
    out = salted_join(l, r, "k", salt=3, how="left")
    got = sorted((row.k, row.w) for row in out.collect())
    assert got == [(1, "x"), (2, None)]


def test_approx_count_distinct_accuracy(spark, tables):
    e = tables["events"]
    approx = {r.event_type: r.a for r in
              e.groupBy("event_type")
              .agg(F.approx_count_distinct("user_id", 0.02).alias("a"))
              .collect()}
    exact = {r.event_type: r.x for r in
             e.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("x")).collect()}
    for k, x in exact.items():
        assert abs(approx[k] - x) / max(x, 1) < 0.05, (k, approx[k], x)


def test_validate_reports_violations_with_null_semantics(spark):
    from wrangle_pypes_spark.operators.relational import validate

    df = spark.createDataFrame(
        [(1, 10, "a"), (2, -5, "b"), (3, None, "zz"), (4, 7, None)],
        "id long, v long, s string")
    out = validate(df, {
        "v_positive": F.col("v") > 0,           # null v -> violation
        "s_short": F.length("s") <= 1,          # null s -> violation
    }, id_cols=["id"])
    got = sorted((r.id, r.rule) for r in out.collect())
    assert got == [(2, "v_positive"), (3, "s_short"), (3, "v_positive"),
                   (4, "s_short")]


def test_zorder_interleave_matches_python_replica(spark):
    from wrangle_pypes_spark.operators.relational import zorder_col

    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = {(r.x, r.y): r._zorder
           for r in zorder_col(df, ["x", "y"], bits=3).collect()}

    def scale(v, lo, hi, bits):
        width = (hi - lo) or 1.0
        return min(max(int((v - lo) / width * (1 << bits)), 0),
                   (1 << bits) - 1)

    def morton(x, y, bits, n=2):
        z = 0
        for k in range(bits):
            z |= ((x >> k) & 1) << (k * n + 0)
            z |= ((y >> k) & 1) << (k * n + 1)
        return z

    for (x, y), z in out.items():
        assert z == morton(scale(x, 0, 7, 3), scale(y, 0, 7, 3), 3), (x, y, z)

    # locality: neighbors in both dims stay within a bounded z distance
    assert abs(out[(3, 3)] - out[(3, 4)]) < 64


def test_zorder_clusters_files_for_pruning(spark, tables, tmp_path):
    """Write orders z-ordered by (custkey, totalprice): a 2-d predicate
    must scan fewer row groups than a random layout would (verified via
    parquet min/max stats on the z-sorted files)."""
    from wrangle_pypes_spark.operators.relational import zorder_col
    from wrangle_pypes_spark.sources import write_parquet

    o = tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    z = zorder_col(o, ["o_custkey", "o_totalprice"], bits=10)
    out = str(tmp_path / "zordered")
    write_parquet(z.repartitionByRange(8, "_zorder"), out,
                  sort_by=["_zorder"])
    back = spark.read.parquet(out)
    assert back.count() == o.count()
    # each file covers a narrow custkey band -> stats become selective
    import pyarrow.parquet as pq
    import glob as g
    spans = []
    for f in g.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(1)  # o_custkey
            los.append(col.statistics.min)
            his.append(col.statistics.max)
        spans.append(max(his) - min(los))
    full_span = 1500  # customers at sf0.01
    assert sorted(spans)[0] < full_span / 2  # at least some narrow files


def test_approx_percentile_accuracy(spark, tables):
    """approx_percentile must track exact percentile within the declared
    accuracy on real data (audited, like the HLL sketch)."""
    o = tables["orders"]
    approx = o.agg(F.percentile_approx("o_totalprice", 0.5, 1000)
                   .alias("m")).first().m
    exact = o.agg(F.percentile("o_totalprice", 0.5).alias("m")).first().m
    assert abs(approx - exact) / exact < 0.02


def test_grouped_ewma_matches_replica(spark, tables):
    from wrangle_pypes_spark.operators.timeseries import grouped_ewma

    e = tables["events"].filter(F.col("user_id") < 10)
    out = grouped_ewma(e, key_col="user_id", ts_col="ts",
                       value_col="value", alpha=0.3)
    got = {}
    for r in out.collect():
        got.setdefault(r.user_id, []).append((r.ts, r.value, r.ewma))
    rows = [(r.user_id, r.ts, r.value) for r in
            e.select("user_id", "ts", "value").collect()]
    by_user = {}
    for u, ts, v in sorted(rows, key=lambda t: (t[0], t[1], t[2])):
        by_user.setdefault(u, []).append((ts, v))
    for u, seq in by_user.items():
        ewma = None
        expected = []
        for ts, v in seq:
            ewma = v if ewma is None else 0.3 * v + 0.7 * ewma
            expected.append((ts, v, ewma))
        spark_seq = sorted(got[u])
        assert len(spark_seq) == len(expected)
        for (ts1, v1, e1), (ts2, v2, e2) in zip(spark_seq, expected):
            assert ts1 == ts2 and v1 == v2 and abs(e1 - e2) < 1e-9


def test_grouped_ewma_null_keys_and_batch_spans(spark):
    """Null keys form their own group (ADVICE r14: dropna must be False
    or the positional realignment corrupts every row at/after the null
    run), and the carry comparison is null-safe across pandas-batch
    boundaries.  Tiny Arrow batches force a key (including the null
    key) to span batches."""
    import datetime as dt

    from wrangle_pypes_spark.operators.timeseries import grouped_ewma

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    # null-keyed run long enough to span several 4-row batches, plus
    # two real keys around it in sort order
    for i in range(10):
        rows.append((None, t0 + dt.timedelta(minutes=i), float(i)))
    for i in range(7):
        rows.append((1, t0 + dt.timedelta(minutes=i), 10.0 + i))
    for i in range(6):
        rows.append((2, t0 + dt.timedelta(minutes=i), 20.0 + i))
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        out = grouped_ewma(df.repartition(1), key_col="user_id",
                           ts_col="ts", value_col="value", alpha=0.3)
        got = {}
        for r in out.collect():
            got.setdefault(r.user_id, []).append((r.ts, r.value, r.ewma))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    assert sum(len(v) for v in got.values()) == len(rows)
    for key, seq in ((None, 10), (1, 7), (2, 6)):
        series = sorted(got[key])
        assert len(series) == seq
        ewma = None
        for ts, v, e in series:
            ewma = v if ewma is None else 0.3 * v + 0.7 * ewma
            assert abs(e - ewma) < 1e-9, (key, ts, e, ewma)


def test_asof_join_null_value_preserved(spark):
    """The as-of matched right row's legitimately-NULL value must come
    through as NULL — not be skipped in favor of a stale older value."""
    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12, 0, 0))], "k bigint, lts timestamp")
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 0, 0), 100.0),
         (1, dt.datetime(2024, 1, 1, 11, 0, 0), None)],
        "k bigint, rts timestamp, price double")
    out = asof_join(left, right, "k", "lts", "rts").collect()
    assert len(out) == 1
    assert out[0].price is None  # the 11:00 row matched; its NULL survives


def test_profile_stats(spark, tables):
    from wrangle_pypes_spark.operators import profile

    c = tables["customer"]
    p = {r.column: r for r in
         profile(c, exact_distinct=True).collect()}
    assert set(p) == set(c.columns)
    n = c.count()
    row = p["c_acctbal"]
    assert row.n == n and row.n_null == 0
    assert row.dtype == "double"
    exact = c.selectExpr(
        "min(c_acctbal) mn", "max(c_acctbal) mx", "avg(c_acctbal) av",
        "count(DISTINCT c_acctbal) nd").collect()[0]
    assert row.min_value == str(exact.mn) and row.max_value == str(exact.mx)
    assert row.mean == pytest.approx(exact.av)
    assert row.n_distinct == exact.nd
    # non-numeric column: mean is NULL, distinct is exact
    seg = p["c_mktsegment"]
    assert seg.mean is None
    assert seg.n_distinct == c.select("c_mktsegment").distinct().count()
    # approx path close to exact
    ap = {r.column: r for r in profile(c).collect()}
    assert ap["c_custkey"].n_distinct == pytest.approx(n, rel=0.05)


def test_funnel_steps_order_matters(spark):
    import datetime as dt

    from wrangle_pypes_spark.operators import funnel_steps

    def t(h):
        return dt.datetime(2024, 1, 1, h)

    rows = [
        # user 1: full ordered funnel
        (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        # user 2: purchase BEFORE click -> stops after step 2
        (2, "view", t(1)), (2, "purchase", t(2)), (2, "click", t(3)),
        # user 3: never views -> 0 despite click+purchase
        (3, "click", t(1)), (3, "purchase", t(2)),
        # user 4: only a view
        (4, "view", t(5)),
        # user 5: repeated steps don't double-advance
        (5, "view", t(1)), (5, "view", t(2)), (5, "click", t(3)),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_type string, ts timestamp")
    got = {r.user_id: r.steps_completed
           for r in funnel_steps(df, key_col="user_id", ts_col="ts",
                                 type_col="event_type",
                                 steps=("view", "click", "purchase"))
           .collect()}
    assert got == {1: 3, 2: 2, 3: 0, 4: 1, 5: 2}


def test_funnel_steps_caps_events_per_key(spark):
    """max_events_per_key slices the sorted list: a bot key keeps only
    its EARLIEST events, so a qualifying event past the cap
    under-counts (documented truncation) while normal keys are
    untouched."""
    import datetime as dt

    from wrangle_pypes_spark.operators import funnel_steps

    rows = [(1, "view", dt.datetime(2024, 1, 1, 0, m)) for m in range(50)]
    rows.append((1, "click", dt.datetime(2024, 1, 2)))  # after the flood
    rows += [(2, "view", dt.datetime(2024, 1, 1)),
             (2, "click", dt.datetime(2024, 1, 2))]
    df = spark.createDataFrame(
        rows, "user_id int, event_type string, ts timestamp")
    kw = dict(key_col="user_id", ts_col="ts", type_col="event_type",
              steps=("view", "click"))
    capped = {r.user_id: r.steps_completed
              for r in funnel_steps(df, max_events_per_key=10, **kw)
              .collect()}
    assert capped == {1: 1, 2: 2}  # bot's late click truncated away
    uncapped = {r.user_id: r.steps_completed
                for r in funnel_steps(df, max_events_per_key=None, **kw)
                .collect()}
    assert uncapped == {1: 2, 2: 2}


def test_cohort_retention_offsets(spark):
    import datetime as dt

    from wrangle_pypes_spark.operators import cohort_retention

    # Mondays: 2024-01-01, 2024-01-08, 2024-01-15
    rows = [
        (1, dt.datetime(2024, 1, 2)),   # cohort wk0
        (1, dt.datetime(2024, 1, 10)),  # wk0 offset 1
        (1, dt.datetime(2024, 1, 16)),  # wk0 offset 2
        (2, dt.datetime(2024, 1, 3)),   # cohort wk0
        (3, dt.datetime(2024, 1, 9)),   # cohort wk1
        (3, dt.datetime(2024, 1, 18)),  # wk1 offset 1
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {(str(r.cohort)[:10], r.offset): r.n_active
           for r in cohort_retention(df, key_col="user_id", ts_col="ts")
           .collect()}
    assert got == {
        ("2024-01-01", 0): 2, ("2024-01-01", 1): 1, ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1, ("2024-01-08", 1): 1,
    }


def test_bucketize_quartiles(spark):
    """Exact quartile cuts of 1..8 are (2.75, 4.5, 6.25); bucket index
    counts cuts strictly below the value; NULLs get a NULL bucket; the
    assignment is map-only (no join, no second shuffle)."""
    from wrangle_pypes_spark.operators import bucketize

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 9)] + [(None,)], "v double")
    out = bucketize(df, "v")
    got = {r.v: r.bucket for r in out.collect()}
    assert got[1.0] == 0 and got[2.0] == 0
    assert got[3.0] == 1 and got[4.0] == 1
    assert got[5.0] == 2 and got[6.0] == 2
    assert got[7.0] == 3 and got[8.0] == 3
    assert got[None] is None
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan

    ap = bucketize(df, "v", exact=False)
    assert {r.bucket for r in ap.collect() if r.v is not None} <= {0, 1, 2, 3}


def test_resample_gap_fill(spark):
    """Every bucket between a key's first and last observation appears;
    gaps carry the last observed value forward and are flagged."""
    from wrangle_pypes_spark.operators import resample

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:30", 10.0),
         (1, "2024-01-01 00:00:45", 5.0),
         # 00:01 missing entirely
         (1, "2024-01-01 00:02:10", 7.0),
         (2, "2024-01-01 00:05:00", 1.0)],
        "user_id long, ts string, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample(df, key_col="user_id", ts_col="ts",
                   value_col="value", interval_sec=60)
    rows = {(r.user_id, str(r.bucket)): r for r in out.collect()}
    assert len(rows) == 4  # 3 buckets for user 1, 1 for user 2
    k0 = rows[(1, "2024-01-01 00:00:00")]
    assert k0.sum_value == 15.0 and not k0.is_gap and k0.filled == 15.0
    k1 = rows[(1, "2024-01-01 00:01:00")]
    assert k1.sum_value is None and k1.is_gap and k1.filled == 15.0
    k2 = rows[(1, "2024-01-01 00:02:00")]
    assert k2.sum_value == 7.0 and k2.filled == 7.0
    assert rows[(2, "2024-01-01 00:05:00")].sum_value == 1.0


def test_rolling_zscore_flags_spike(spark):
    """A spike after a stable run is flagged; cold-start rows stay NULL
    until min_periods observations accumulate."""
    from wrangle_pypes_spark.operators import rolling_zscore

    vals = [10.0, 10.5, 9.5, 10.2, 9.8, 10.1, 50.0]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)],
        "key long, t long, value double")
    out = sorted(rolling_zscore(
        df, key_col="key", ts_col="t", value_col="value",
        n=10, min_periods=4).collect(), key=lambda r: r.t)
    assert all(r.zscore is None for r in out[:4])      # cold start
    assert out[-1].is_anomaly and out[-1].zscore > 3.0
    assert all(not r.is_anomaly for r in out[4:-1])


def test_merge_intervals_islands(spark):
    """Overlapping and gap-adjacent intervals coalesce per key;
    disjoint ones stay separate; timestamps merge on exact
    microsecond arithmetic."""
    from wrangle_pypes_spark.operators import merge_intervals

    df = spark.createDataFrame(
        [(1, 0, 10), (1, 5, 20), (1, 25, 30),   # [0,20] and [25,30]
         (2, 0, 1), (2, 100, 110)],
        "k long, s long, e long")
    out = {(r.k, r.s): (r.e, r.n_merged)
           for r in merge_intervals(df, "k", "s", "e").collect()}
    assert out == {(1, 0): (20, 2), (1, 25): (30, 1),
                   (2, 0): (1, 1), (2, 100): (110, 1)}
    # gap tolerance bridges the 5-unit hole
    bridged = merge_intervals(df.filter("k = 1"), "k", "s", "e", gap=5)
    assert [(r.s, r.e, r.n_merged) for r in bridged.collect()] == [(0, 30, 3)]

    ts = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
         (1, "2024-01-01 00:30:00", "2024-01-01 02:00:00"),
         (1, "2024-01-01 05:00:00", "2024-01-01 06:00:00")],
        "k long, s string, e string") \
        .select("k", F.col("s").cast("timestamp").alias("s"),
                F.col("e").cast("timestamp").alias("e"))
    got = sorted((str(r.s), str(r.e)) for r in
                 merge_intervals(ts, "k", "s", "e").collect())
    assert got == [("2024-01-01 00:00:00", "2024-01-01 02:00:00"),
                   ("2024-01-01 05:00:00", "2024-01-01 06:00:00")]


def test_snapshot_diff_statuses(spark):
    """added/removed/changed/unchanged classified by id + content hash;
    the join ships hashes, not documents."""
    from wrangle_pypes_spark.operators import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, text string")
    new = spark.createDataFrame(
        [(2, "b"), (3, "C!"), (4, "d")], "id long, text string")
    got = {r.id: r.status for r in snapshot_diff(
        old, new, "id", compare_cols=["text"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_rolling_median_even_odd_frames(spark):
    """Median over growing frames: odd frame takes the middle element,
    even frame averages the two middles."""
    from wrangle_pypes_spark.operators import rolling_median

    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate([10.0, 2.0, 8.0, 4.0])],
        "k long, t long, v double")
    out = sorted(rolling_median(df, key_col="k", ts_col="t",
                                value_col="v", n=3).collect(),
                 key=lambda r: r.t)
    assert [r.rolling_median for r in out] == [10.0, 6.0, 8.0, 4.0]
    assert [r.n_obs for r in out] == [1, 2, 3, 3]


def test_pagerank_matches_replica(spark):
    """Ranks on a small directed graph match a driver-side python
    replica to 1e-9, sum to 1, and dangling mass redistributes."""
    from wrangle_pypes_spark.operators import pagerank

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]  # 4 -> dangling? no: 4 has out-edge; no dangling
    edges.append((3, 5))                              # 5 is dangling
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in
           pagerank(df, max_iter=50, tol=1e-12).collect()}

    # python replica
    from collections import defaultdict
    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    nodes = sorted({n for e in edges for n in e})
    N = len(nodes)
    ranks = {v: 1.0 / N for v in nodes}
    for _ in range(200):
        dangling = sum(r for v, r in ranks.items() if v not in out)
        contrib = defaultdict(float)
        for s, ds in out.items():
            for d in ds:
                contrib[d] += ranks[s] / len(ds)
        ranks = {v: 0.15 / N + 0.85 * (contrib[v] + dangling / N)
                 for v in nodes}
    assert abs(sum(got.values()) - 1.0) < 1e-6
    for v in nodes:
        assert abs(got[v] - ranks[v]) < 1e-9, (v, got[v], ranks[v])


def test_standardize_global_and_grouped(spark):
    """Per-group z-scores match hand math (ddof=1); constant groups get
    NULL; the stats side broadcasts (no global window)."""
    from wrangle_pypes_spark.operators import standardize

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 5.0)],
        "g string, v double")
    out = standardize(df, ["v"], group_cols=["g"])
    got = sorted((r.g, r.v, r.v_z) for r in out.collect())
    # group a: mean 2, sd sqrt(2) -> z = +-1/sqrt(2)
    import math
    assert abs(got[0][2] + 1 / math.sqrt(2)) < 1e-12
    assert abs(got[1][2] - 1 / math.sqrt(2)) < 1e-12
    assert got[2][2] is None and got[3][2] is None   # constant group

    glob = standardize(df, ["v"])
    assert abs(sum(r.v_z for r in glob.collect())) < 1e-9
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_winsorize_clips_to_quantile_range(spark):
    """Values clip into the [lower, upper] quantile range; interior
    values and NULLs pass through; the clip is map-only."""
    from wrangle_pypes_spark.operators import winsorize

    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 101)] + [(None,)], "v double")
    out = winsorize(df, "v", lower=0.05, upper=0.95)
    got = {r.v: r.v_winsor for r in out.collect()}
    lo, hi = got[1.0], got[100.0]
    assert lo == got[2.0] and hi == got[99.0]      # tails clipped flat
    assert 5.0 <= lo <= 7.0 and 94.0 <= hi <= 96.0
    assert got[50.0] == 50.0 and got[None] is None
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_bucketize_winsorize_empty_and_all_null_inputs(spark):
    """No rows / all-NULL value columns: bucketize yields NULL buckets
    and winsorize passes values through — no driver TypeError."""
    from wrangle_pypes_spark.operators import bucketize, winsorize

    empty = spark.createDataFrame([], "v double")
    assert bucketize(empty, "v").count() == 0
    assert winsorize(empty, "v").count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    assert [r.bucket for r in bucketize(nulls, "v").collect()] == [None, None]
    assert [r.v_winsor for r in winsorize(nulls, "v").collect()] == \
        [None, None]


def test_key_skew_profile(spark):
    from wrangle_pypes_spark.operators.relational import key_skew_profile
    rows = ([("hot",)] * 60 + [("warm",)] * 30 + [("a",)] * 5 +
            [("b",)] * 5)
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_profile(df, ["k"], k=3).collect()
    assert [(r.rank, r.k, r.n) for r in out] == \
        [(1, "hot", 60), (2, "warm", 30), (3, "a", 5)]
    assert out[0].share == 0.6
    assert out[1].cume_share == 0.9
    assert out[2].cume_share == 0.95
    # top-k must plan as TakeOrdered, not a global sort
    top_plan = key_skew_profile(df, ["k"], k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in top_plan


def test_assign_sequential_ids(spark):
    from wrangle_pypes_spark.operators.relational import (
        assign_sequential_ids)
    from wrangle_pypes_spark.plans import audit
    import random
    vals = list(range(500))
    random.Random(7).shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    out = assign_sequential_ids(df, ["x"], num_partitions=8)
    rows = {r.x: r.seq_id for r in out.collect()}
    # dense 0..n-1, exactly the rank of x
    assert rows == {v: v for v in range(500)}
    # start offset
    out2 = assign_sequential_ids(df, ["x"], start=1000,
                                 num_partitions=8)
    assert {r.seq_id for r in out2.collect()} == \
        set(range(1000, 1500))
    # no single-partition global-sort window, and no SECOND shuffle
    # after the checkpointed range sort (the ExistingRDD scan feeds a
    # broadcast join + projection only)
    rep = audit(out)
    assert rep.jvm_only()
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "singlepartition" not in plan
    assert "existingrdd" in plan
    assert "exchange hashpartitioning" not in plan
    assert "window" not in plan


def test_flatten_structs(spark):
    from wrangle_pypes_spark.operators.relational import flatten_structs
    df = spark.sql("""
      SELECT 1 AS id,
             named_struct('name', 'a',
                          'addr', named_struct('city', 'x', 'zip', 7),
                          'tags', array(1, 2)) AS cust,
             CAST(NULL AS struct<a:int, b:string>) AS opt,
             array(named_struct('k', 1)) AS arr
    """)
    out = flatten_structs(df)
    assert out.columns == ["id", "cust_name", "cust_addr_city",
                           "cust_addr_zip", "cust_tags", "opt_a",
                           "opt_b", "arr"]
    r = out.collect()[0]
    assert (r.cust_addr_city, r.cust_addr_zip) == ("x", 7)
    assert r.cust_tags == [1, 2]          # arrays pass through whole
    assert r.opt_a is None and r.opt_b is None  # NULL struct -> NULLs
    assert r.arr == [{"k": 1}] or r.arr[0].k == 1

    import pytest
    clash = spark.sql("SELECT named_struct('b', 1) AS a, 2 AS a_b")
    with pytest.raises(ValueError, match="collide"):
        flatten_structs(clash)
