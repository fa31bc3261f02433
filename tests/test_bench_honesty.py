"""Bench-honesty guard (VERDICT r6 #4): the benched action must force
every output column, or a map-only query whose expensive projection is
never consumed benches as a column-pruned no-op (r5:
``quantize_embeddings_int8`` recorded 0.16 s for work it never did).

The guard pins the property at the CONSUMER: ``bench._consume`` routes
through Spark's no-op sink, which materializes all columns JVM-side.
The probe is an accumulator-counting UDF column — ``count()`` (the old
consumer, the deliberately-pruned-work fixture) leaves it unevaluated;
the bench consumer must evaluate it row-for-row."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

import bench
from bench import HEADLINE, _consume, _median


def test_count_prunes_but_bench_consumer_forces_columns(spark):
    sc = spark.sparkContext
    acc = sc.accumulator(0)

    def probe(x):
        acc.add(1)
        return x

    probe_udf = F.udf(probe, LongType())
    df = spark.range(64).withColumn("expensive", probe_udf(F.col("id")))

    # the deliberately pruned-work fixture: count() never evaluates the
    # expensive column (this is exactly the hole the guard exists for —
    # if Spark ever stops pruning here, the bench was already honest)
    df.count()
    assert acc.value == 0

    # the bench consumer must force it, once per row
    _consume(df)
    assert acc.value == 64


def test_consumer_handles_complex_output_columns(spark):
    # rows-only registry queries emit array/struct columns; the no-op
    # sink must consume those too (count() was type-agnostic, the
    # replacement must not regress on schema coverage)
    df = spark.range(8).select(
        F.col("id"),
        F.array(F.col("id"), F.col("id") + 1).alias("arr"),
        F.struct(F.col("id").alias("a")).alias("st"),
        F.create_map(F.lit("k"), F.col("id")).alias("mp"))
    _consume(df)  # must not raise


def test_every_registered_query_is_consumable(spark):
    # cheap structural check: HEADLINE references only registered
    # queries, so the bench cannot silently skip a renamed query
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    missing = [n for n in HEADLINE if n not in qs]
    assert missing == []


def test_median():
    assert _median([3.0]) == 3.0
    assert _median([4.0, 1.0, 3.0]) == 3.0
    assert _median([1.0, 2.0, 3.0, 10.0]) == 2.5
