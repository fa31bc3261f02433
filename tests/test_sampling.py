"""Sampling / packing / histogram: determinism, rate accuracy, budget
properties."""

import pytest
from pyspark.sql import functions as F

from wrangle_pypes_spark.operators.sampling import (
    deterministic_sample,
    histogram,
    pack_sequences,
    stratified_sample,
)


def test_deterministic_sample_rate_and_stability(spark, tables):
    o = tables["orders"]
    s1 = deterministic_sample(o, "o_orderkey", 0.3)
    s2 = deterministic_sample(o.repartition(7), "o_orderkey", 0.3)
    ids1 = {r.o_orderkey for r in s1.select("o_orderkey").collect()}
    ids2 = {r.o_orderkey for r in s2.select("o_orderkey").collect()}
    assert ids1 == ids2  # invariant to partitioning
    rate = len(ids1) / o.count()
    assert 0.25 < rate < 0.35
    # nested: a 0.1 sample with same seed is a subset of the 0.3 sample
    ids3 = {r.o_orderkey for r in
            deterministic_sample(o, "o_orderkey", 0.1)
            .select("o_orderkey").collect()}
    assert ids3 <= ids1


def test_stratified_sample_rates(spark, tables):
    d = tables["documents"]
    s = stratified_sample(d, "lang", {"en": 0.5, "de": 1.0}, key_col="doc_id")
    got = {r.lang: r.n for r in
           s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r.lang: r.n for r in
            d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(got) == {"en", "de"}  # unlisted strata dropped
    assert got["de"] == full["de"]
    assert 0.3 * full["en"] < got["en"] < 0.7 * full["en"]


def test_pack_sequences_budget(spark):
    rows = [(i, 1000) for i in range(10)]  # 10 docs x 1000 tokens
    df = spark.createDataFrame(rows, "doc_id long, n long")
    packed = pack_sequences(df, token_col="n", max_tokens=2500,
                            order_col="doc_id")
    by_pack = {r.pack_id: r.s for r in
               packed.groupBy("pack_id").agg(F.sum("n").alias("s")).collect()}
    # budget 2500: packs hold 3 docs (cumsum-start formulation) except tail
    assert all(s <= 2500 + 1000 for s in by_pack.values())  # <=1 doc overflow
    assert sum(by_pack.values()) == 10000  # nothing lost
    # deterministic
    again = {r.doc_id: r.pack_id for r in packed.collect()}
    assert again == {r.doc_id: r.pack_id for r in pack_sequences(
        df.repartition(5), token_col="n", max_tokens=2500,
        order_col="doc_id").collect()}


def test_histogram_totals_and_clamping(spark, tables):
    c = tables["customer"]
    h = histogram(c, "c_acctbal", lo=0.0, hi=1000.0, nbins=4)
    rows = h.collect()
    assert sum(r.n for r in rows) == c.count()  # out-of-range clamped, kept
    assert all(0 <= r.bin <= 3 for r in rows)
