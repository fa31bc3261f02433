"""local_df: Arrow-exact local metadata DataFrames.

Pins the ADVICE-r13 exactness contract: an int64 column containing
``None`` must round-trip values above 2**53 exactly (a pandas-based
conversion silently promotes to float64 and mangles them without
raising), and conversion failures must fall back to the pickled
``createDataFrame`` path rather than producing wrong values.
"""
import datetime
import decimal

from pyspark.sql import types as T

from wrangle_pypes_spark.localdf import local_df

BIG = 2**53 + 1  # not representable in float64: float(BIG) == 2**53


def test_int64_with_null_stays_exact(spark):
    df = local_df(spark, [(BIG,), (None,), (BIG + 2,)], "v bigint")
    got = sorted((r.v for r in df.collect()),
                 key=lambda x: (x is None, x))
    assert got == [BIG, BIG + 2, None]


def test_mixed_types_roundtrip(spark):
    schema = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.TimestampType()),
        T.StructField("d", T.ArrayType(T.IntegerType())),
        T.StructField("e", T.StructType([
            T.StructField("x", T.IntegerType()),
            T.StructField("y", T.StringType())])),
        T.StructField("f", T.DecimalType(10, 2)),
        T.StructField("g", T.BinaryType()),
        T.StructField("h", T.DateType()),
    ])
    ts = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
    rows = [
        (BIG, "hi", ts, [1, None, 3], (7, "z"),
         decimal.Decimal("12345678.25"), b"\x00\xff", datetime.date(2024, 3, 1)),
        (None, None, None, None, None, None, None, None),
    ]
    got = local_df(spark, rows, schema).collect()
    byname = {r.a: r for r in got}
    r = byname[BIG]
    assert r.b == "hi" and r.c == ts and r.d == [1, None, 3]
    assert (r.e.x, r.e.y) == (7, "z")
    assert r.f == decimal.Decimal("12345678.25")
    assert bytes(r.g) == b"\x00\xff" and r.h == datetime.date(2024, 3, 1)
    r0 = byname[None]
    assert all(v is None for v in (r0.b, r0.c, r0.d, r0.e, r0.f, r0.g, r0.h))


def test_timestamp_matches_plain_createdataframe(spark):
    # Naive datetimes must get the same (session-timezone) reading the
    # plain pickled path gives them.
    ts = datetime.datetime(2021, 7, 4, 23, 59, 59)
    a = local_df(spark, [(ts,)], "t timestamp").collect()[0].t
    b = spark.createDataFrame([(ts,)], "t timestamp").collect()[0].t
    assert a == b == ts


def test_empty_rows_gives_typed_zero_row_plan(spark):
    df = local_df(spark, [], "a bigint, b string")
    assert df.count() == 0
    assert [f.dataType for f in df.schema.fields] == [
        T.LongType(), T.StringType()]


def test_unrepresentable_value_falls_back(spark):
    # A string where the schema says bigint: Arrow refuses; the plain
    # path must take over and raise the same error plain
    # createDataFrame would (loud, not silent nulls).
    import pytest
    with pytest.raises(Exception):
        local_df(spark, [("notanint",)], "v bigint").collect()
