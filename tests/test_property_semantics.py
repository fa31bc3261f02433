"""Property-style oracle (SURVEY.md section 5.2.5): random records run
through the Spark engine must match a ~40-line in-process Python
interpreter implementing the PINNED intended semantics of section 2.3
(the reference code itself is too buggy to be the oracle):

* ``Get`` with default: missing key -> default, present-None -> None.
* ``Default``: Python-truthiness replacement (None/0/""/[] replaced).
* ``Filter``: per-element predicate.
* ``Map``: per-element function.

One Spark job per hypothesis example is expensive, so each example is a
BATCH of records (the whole batch is one DataFrame).
"""

from dataclasses import dataclass
from typing import Optional

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wrangle_pypes_spark import Default, Expr, Filter, Get, Map, Pipeline


@dataclass
class OutM:
    a_filled: int
    b_filled: str
    c_doubled: Optional[list]
    d_x: int
    d_y: Optional[int]


SCHEMA = T.StructType([
    T.StructField("a", T.LongType(), True),
    T.StructField("b", T.StringType(), True),
    T.StructField("c", T.ArrayType(T.LongType(), False), True),
    T.StructField("d", T.MapType(T.StringType(), T.LongType(), True), True),
])


def build_pipeline() -> Pipeline:
    return Pipeline(strict=False, transformations={OutM: {
        "a_filled": Get("a") | Default(99),
        "b_filled": Get("b") | Default("?"),
        "c_doubled": Get("c") | Filter(lambda x: x > 0) | Map(lambda x: x * 2),
        "d_x": Get("d") | Get("x", default=-1),
        "d_y": Get("d") | Get("y", default=None),  # None = NO default (2.3.3)
    }})


def interpret(rec: dict):
    """The pinned-semantics reference interpreter."""
    def get(data, key, default, has_default):
        if data is None:
            return None
        if key in data:
            return data[key]
        if has_default:
            return default
        raise KeyError(key)

    a = rec["a"]
    b = rec["b"]
    c = rec["c"]
    d = rec["d"]
    return (
        a if a else 99,                                   # Default truthiness
        b if b else "?",
        None if c is None else [x * 2 for x in c if x > 0],
        get(d, "x", -1, True),
        None,  # placeholder; d_y handled by caller (may raise)
    )


records = st.fixed_dictionaries({
    "a": st.one_of(st.none(), st.integers(-5, 5)),
    "b": st.one_of(st.none(), st.sampled_from(["", "hi", "x y", "0"])),
    "c": st.one_of(st.none(), st.lists(st.integers(-4, 4), max_size=5)),
    "d": st.one_of(st.none(), st.dictionaries(
        st.sampled_from(["x", "y", "z"]),
        st.one_of(st.none(), st.integers(-3, 3)), max_size=3)),
})


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(batch=st.lists(records, min_size=1, max_size=12))
def test_engine_matches_reference_interpreter(spark, batch):
    df = spark.createDataFrame(
        [(r["a"], r["b"], r["c"], r["d"]) for r in batch], SCHEMA)
    out = build_pipeline().create_multiple(OutM, df)
    got = [(r.a_filled, r.b_filled,
            None if r.c_doubled is None else list(r.c_doubled),
            r.d_x, r.d_y) for r in out.collect()]

    expected = []
    for rec in batch:
        a_f, b_f, c_d, d_x, _ = interpret(rec)
        d = rec["d"]
        # Get("y") with NO default on a map: strict raises on missing;
        # lenient (strict=False) nulls out — this test runs lenient
        d_y = d.get("y") if d else None
        expected.append((a_f, b_f, c_d, d_x, d_y))

    key = lambda t: tuple((v is None, v if not isinstance(v, list) else tuple(v))
                          for v in t)  # noqa: E731
    assert sorted(got, key=key) == sorted(expected, key=key)


# ---------------------------------------------------------------------------
# interval coalescing vs a brute-force union replica
# ---------------------------------------------------------------------------

_intervals = st.lists(
    st.tuples(st.integers(0, 60), st.integers(0, 30)),
    min_size=1, max_size=12)


def _union_replica(ivs, gap):
    """Brute-force interval union with gap tolerance."""
    ivs = sorted((s, s + ln) for s, ln in ivs)
    out = []
    for s, e in ivs:
        if out and s <= out[-1][1] + gap:
            out[-1][1] = max(out[-1][1], e)
            out[-1][2] += 1
        else:
            out.append([s, e, 1])
    return [(s, e, n) for s, e, n in out]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ivs=_intervals, gap=st.sampled_from([0, 3]))
def test_merge_intervals_matches_union_replica(spark, ivs, gap):
    from wrangle_pypes_spark.operators import merge_intervals

    df = spark.createDataFrame(
        [(1, s, s + ln) for s, ln in ivs], "k long, s long, e long")
    got = sorted((r.s, r.e, r.n_merged) for r in
                 merge_intervals(df, "k", "s", "e", gap=gap).collect())
    assert got == _union_replica(ivs, gap)


# ---------------------------------------------------------------------------
# resample invariants: full grid, no observation lost, fill correctness
# ---------------------------------------------------------------------------

_obs = st.lists(
    st.tuples(st.integers(0, 500), st.integers(1, 9)),  # (second, value)
    min_size=1, max_size=15, unique_by=lambda t: t[0])


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(obs=_obs)
def test_resample_grid_and_fill_invariants(spark, obs):
    from wrangle_pypes_spark.operators import resample

    df = spark.createDataFrame(
        [(1, s, float(v)) for s, v in obs], "k long, sec long, v double") \
        .select("k", F.timestamp_seconds(F.col("sec")).alias("ts"), "v")
    rows = sorted(resample(df, key_col="k", ts_col="ts", value_col="v",
                           interval_sec=60).collect(),
                  key=lambda r: r.bucket)
    buckets = [int(r.bucket.timestamp()) for r in rows]
    # 1. contiguous grid from first to last observed bucket
    assert buckets == list(range(min(buckets), max(buckets) + 60, 60))
    # 2. no observation lost: bucket sums add up to the input total
    assert sum(r.sum_v for r in rows if r.sum_v is not None) == \
        pytest.approx(sum(v for _, v in obs))
    # 3. fill semantics: filled equals the last non-gap sum seen so far
    last = None
    for r in rows:
        if not r.is_gap:
            last = r.sum_v
        assert r.filled == last


# ---------------------------------------------------------------------------
# CDC apply: random feeds vs a dict-based reference interpreter
# ---------------------------------------------------------------------------

_cdc_change = st.tuples(
    st.integers(0, 9),                        # key
    st.sampled_from(["I", "U", "D"]),         # op
    st.integers(0, 20),                       # seq
    st.integers(-100, 100),                   # payload v
)


def _cdc_reference(base_rows, changes):
    """Latest-image semantics in ~10 lines of Python: per key the
    lexicographically maximal (seq, op, v) change wins — the same
    total order as max_by(struct) with tiebreak_cols=["op", "v"];
    delete removes, others upsert."""
    latest = {}
    for k, op, seq, v in changes:
        cand = (seq, op, v)
        if k not in latest or cand > latest[k]:
            latest[k] = cand
    table = dict(base_rows)
    for k, (seq, op, v) in latest.items():
        if op == "D":
            table.pop(k, None)
        else:
            table[k] = v
    return table


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(changes=st.lists(_cdc_change, min_size=0, max_size=40))
def test_cdc_apply_matches_reference_model(spark, changes):
    base_rows = {k: k * 10 for k in range(0, 10, 2)}  # keys 0,2,4,6,8
    base = spark.createDataFrame(
        [(k, v) for k, v in base_rows.items()], "id int, v int")
    if changes:
        feed = spark.createDataFrame(
            [(k, op, seq, v) for k, op, seq, v in changes],
            "id int, op string, seq int, v int")
    else:
        feed = spark.createDataFrame(
            [], "id int, op string, seq int, v int")
    from wrangle_pypes_spark.operators.cdc import cdc_apply
    out = cdc_apply(base, feed, key_cols=["id"], seq_col="seq",
                    tiebreak_cols=["op", "v"])
    got = {r.id: r.v for r in out.collect()}
    assert got == _cdc_reference(base_rows, changes)
