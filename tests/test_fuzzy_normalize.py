"""Blocked fuzzy string pairs + unicode text normalization."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wrangle_pypes_spark.functions.text import normalize_text
from wrangle_pypes_spark.operators.fuzzy import fuzzy_string_pairs
from wrangle_pypes_spark.plans import audit


def test_normalize_text_chain(spark):
    messy = ("‘Hi’ “there” – ok…"
             "​x\x07y\t z  w\n\n\n\nnext  line ")
    [r] = spark.createDataFrame([Row(t=messy)]).select(
        normalize_text(F.col("t")).alias("c")).collect()
    assert r.c == "'Hi' \"there\" - ok...xy z w\n\nnext line"


def test_normalize_text_idempotent_and_null(spark):
    df = spark.createDataFrame([Row(t="plain  text"), Row(t=None)])
    out = df.select(normalize_text(F.col("t")).alias("c"),
                    normalize_text(normalize_text(F.col("t"))).alias("c2"))
    rows = out.collect()
    assert rows[0].c == "plain text" and rows[0].c == rows[0].c2
    assert rows[1].c is None


@pytest.fixture(scope="module")
def names(spark):
    return spark.createDataFrame(
        [Row(name=n) for n in
         ["red widget", "red widgets", "red gadget", "blue bolt",
          "blue bolts", "ned widget", "red widget"]])  # dup on purpose


def test_fuzzy_self_pairs(names):
    out = fuzzy_string_pairs(
        names, names, left_col="name", right_col="name",
        max_distance=2, block="prefix", block_len=1,
        dedup_self_pairs=True)
    pairs = {(r.name_l, r.name_r): r.distance for r in out.collect()}
    assert pairs[("red widget", "red widgets")] == 1
    assert pairs[("blue bolt", "blue bolts")] == 1
    # "ned widget" vs "red widget" is d=1 but blocked apart on prefix
    assert ("ned widget", "red widget") not in pairs
    # values are deduped: no (x, x) diagonal, each pair once
    assert all(l < r for (l, r) in pairs)


def test_fuzzy_block_both_recovers_prefix_miss(names):
    out = fuzzy_string_pairs(
        names, names, left_col="name", right_col="name",
        max_distance=2, block="both", block_len=1,
        dedup_self_pairs=True)
    pairs = {(r.name_l, r.name_r) for r in out.collect()}
    assert ("ned widget", "red widget") in pairs  # suffix block catches it
    assert ("blue bolt", "blue bolts") in pairs   # prefix block kept


def test_fuzzy_two_table_and_plan(spark, names):
    other = spark.createDataFrame([Row(label="red midget"),
                                   Row(label="zzz")])
    out = fuzzy_string_pairs(
        names, other, left_col="name", right_col="label",
        max_distance=2, block="prefix", block_len=1)
    rows = {(r.name, r.label) for r in out.collect()}
    assert ("red widget", "red midget") in rows
    assert not any(l == "zzz" or r == "zzz" for l, r in rows)
    rep = audit(out)
    assert rep.jvm_only()
    assert "CartesianProduct" not in rep.plan
    assert "BroadcastNestedLoopJoin" not in rep.plan
