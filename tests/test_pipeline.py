"""Pipeline-level tests: nested models (README acceptance), dataclass
schema derivation, get_or_create join protocol."""

import datetime as dt
from dataclasses import dataclass
from typing import Optional

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wrangle_pypes_spark import (
    Cast,
    Create,
    CreateMultiple,
    Get,
    Pipeline,
    SpecError,
    spark_schema_for,
)


@dataclass
class Point:
    x: int
    y: int


@dataclass
class Square:
    A: Point
    B: Point


def test_readme_acceptance(spark):
    """The corrected README example (SURVEY §2.3.6) as golden test."""
    data = [
        Row(A=Row(x="0", y="0"), B=Row(x="1", y="1")),
        Row(A=Row(x="10", y="10"), B=Row(x="11", y="11")),
    ]
    df = spark.createDataFrame(
        data, "A struct<x: string, y: string>, B struct<x: string, y: string>")
    pipeline = Pipeline({
        Square: {"A": Get("A") | Create(Point),
                 "B": Get("B") | Create(Point)},
        Point: {"x": Get("x") | Cast(int),
                "y": Get("y") | Cast(int)},
    })
    out = pipeline.create_multiple(Square, df)
    assert [f.dataType.simpleString() for f in out.schema.fields] == \
        ["struct<x:bigint,y:bigint>"] * 2
    rows = out.collect()
    assert rows == [
        Row(A=Row(x=0, y=0), B=Row(x=1, y=1)),
        Row(A=Row(x=10, y=10), B=Row(x=11, y=11)),
    ]


def test_create_multiple_nested_list(spark):
    @dataclass
    class Poly:
        pts: list

    df = spark.createDataFrame(
        [Row(pts=[Row(x="1", y="2"), Row(x="3", y="4")])],
        "pts array<struct<x: string, y: string>>")
    p = Pipeline({
        Poly: {"pts": Get("pts") | CreateMultiple(Point)},
        Point: {"x": Get("x") | Cast(int), "y": Get("y") | Cast(int)},
    })
    rows = p.create_multiple(Poly, df).collect()
    assert rows[0].pts == [Row(x=1, y=2), Row(x=3, y=4)]


def test_spec_cycle_detection(spark):
    @dataclass
    class A:
        b: object

    df = spark.createDataFrame([(1,)], "x long")
    p = Pipeline({A: {"b": Create(A)}})
    with pytest.raises(SpecError, match="cycle"):
        p.create_multiple(A, df)


def test_missing_model_spec(spark):
    @dataclass
    class Nope:
        x: int

    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(SpecError, match="no spec"):
        Pipeline({}).create_multiple(Nope, df)


def test_schema_derivation():
    @dataclass
    class M:
        i: int
        f: float
        s: str
        b: bool
        ts: dt.datetime
        maybe: Optional[int]
        tags: list
        child: Point

    sch = spark_schema_for(M)
    by_name = {f.name: f.dataType for f in sch.fields}
    assert isinstance(by_name["i"], T.LongType)
    assert isinstance(by_name["f"], T.DoubleType)
    assert isinstance(by_name["s"], T.StringType)
    assert isinstance(by_name["b"], T.BooleanType)
    assert isinstance(by_name["ts"], T.TimestampType)
    assert isinstance(by_name["maybe"], T.LongType)
    assert isinstance(by_name["child"], T.StructType)


def test_audit_column(spark):
    @dataclass
    class M:
        x: int

    df = spark.createDataFrame([("1",), ("bad",)], "x string")
    p = Pipeline({M: {"x": Get("x") | Cast(int)}}, strict=False)
    rows = p.create_multiple(M, df, audit=True).collect()
    assert rows[0]._nulled_fields == []
    assert rows[1]._nulled_fields == ["x"]


# --- get_or_create ----------------------------------------------------------

@dataclass
class User:
    email: str
    name: str


def test_get_or_create_join(spark):
    dim = spark.createDataFrame(
        [("a@x.com", "Dim Alice"), ("b@x.com", "Dim Bob")],
        "email string, name string")
    incoming = spark.createDataFrame(
        [("a@x.com", "New Alice"), ("c@x.com", "New Carol")],
        "email string, name string")
    p = Pipeline({User: {"email": Get("email"), "name": Get("name")}})
    result, new_dim = p.get_or_create(User, incoming, dim,
                                      match_targets=["email"])
    got = {r.email: (r.name, r.created) for r in result.collect()}
    # hit: dim's values win, created=False; miss: built values, created=True
    assert got == {"a@x.com": ("Dim Alice", False),
                   "c@x.com": ("New Carol", True)}
    emails = sorted(r.email for r in new_dim.collect())
    assert emails == ["a@x.com", "b@x.com", "c@x.com"]


def test_get_or_create_all_fields_match(spark):
    dim = spark.createDataFrame([("a@x.com", "Alice")], "email string, name string")
    incoming = spark.createDataFrame(
        [("a@x.com", "Alice"), ("a@x.com", "Different")],
        "email string, name string")
    p = Pipeline({User: {"email": Get("email"), "name": Get("name")}})
    result, _ = p.get_or_create(User, incoming, dim)  # match on ALL fields
    got = sorted((r.email, r.name, r.created) for r in result.collect())
    assert got == [("a@x.com", "Alice", False), ("a@x.com", "Different", True)]


def test_get_or_create_null_key_dim_match(spark):
    """A dim row whose match-key IS NULL must count as a hit (eqNullSafe),
    not be re-created and re-appended to the dim on every call."""
    dim = spark.createDataFrame([(None, "Dim Null"), ("a@x.com", "Alice")],
                                "email string, name string")
    incoming = spark.createDataFrame([(None, "New Null")],
                                     "email string, name string")
    p = Pipeline({User: {"email": Get("email"), "name": Get("name")}})
    result, new_dim = p.get_or_create(User, incoming, dim,
                                      match_targets=["email"])
    rows = result.collect()
    assert len(rows) == 1
    assert rows[0].created is False  # null-key dim row matched
    assert rows[0].name == "Dim Null"  # dim values win on a hit
    assert new_dim.count() == 2  # nothing appended
    # idempotent across repeated calls (the foreach-batch topology)
    _, dim2 = p.get_or_create(User, incoming, new_dim,
                              match_targets=["email"])
    assert dim2.count() == 2


def test_get_or_create_in_arrays_empty_and_null(spark):
    """Empty arrays come back as empty item lists; NULL arrays stay
    NULL; neither row is dropped (reference GetOrCreateMultiple returns
    [] for empty input)."""
    from pyspark.sql import types as T

    elem = T.StructType([T.StructField("email", T.StringType()),
                         T.StructField("name", T.StringType())])
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("members", T.ArrayType(elem))])
    df = spark.createDataFrame(
        [(1, [("a@x.com", "New Alice"), ("c@x.com", "Carol")]),
         (2, []),
         (3, None)], schema)
    dim = spark.createDataFrame([("a@x.com", "Dim Alice")],
                                "email string, name string")
    p = Pipeline({User: {"email": Get("email"), "name": Get("name")}})
    result, new_dim = p.get_or_create_in_arrays(
        User, df, "members", dim, ["email"], id_col="id")
    got = {r.id: r.items for r in result.collect()}
    assert set(got) == {1, 2, 3}
    assert [ (i.email, i.created) for i in got[1] ] == [
        ("a@x.com", False), ("c@x.com", True)]
    assert got[1][0].name == "Dim Alice"
    assert got[2] == []
    assert got[3] is None
    assert sorted(r.email for r in new_dim.collect()) == ["a@x.com", "c@x.com"]


def test_to_instances_materializes_dataclasses(spark):
    """API-shape parity with the reference: the final hand-off yields
    real dataclass instances with nested models (reference
    pipeline.py:41 model(**kwargs))."""
    from wrangle_pypes_spark import to_instances

    data = [
        Row(A=Row(x="0", y="0"), B=Row(x="1", y="1")),
        Row(A=Row(x="10", y="10"), B=Row(x="11", y="11")),
    ]
    df = spark.createDataFrame(
        data, "A struct<x: string, y: string>, B struct<x: string, y: string>")
    pipeline = Pipeline({
        Square: {"A": Get("A") | Create(Point),
                 "B": Get("B") | Create(Point)},
        Point: {"x": Get("x") | Cast(int),
                "y": Get("y") | Cast(int)},
    })
    built = pipeline.create_multiple(Square, df)
    out = sorted(to_instances(Square, built), key=lambda s: s.A.x)
    assert all(isinstance(s, Square) for s in out)
    assert all(isinstance(s.A, Point) and isinstance(s.B, Point) for s in out)
    assert out == [Square(A=Point(x=0, y=0), B=Point(x=1, y=1)),
                   Square(A=Point(x=10, y=10), B=Point(x=11, y=11))]
    # extra columns (e.g. the created flag) are ignored
    flagged = built.withColumn("created", F.lit(True))
    again = list(to_instances(Square, flagged))
    assert len(again) == 2 and isinstance(again[0], Square)


def test_pipeline_explain_reports_spec_and_plan(spark, tables):
    from dataclasses import dataclass

    @dataclass
    class Flat:
        key: int

    p = Pipeline({Flat: {"key": Get("o_orderkey")}})
    text = p.explain(Flat, tables["orders"])
    assert "Pipeline spec for Flat" in text
    assert "key <-" in text
    assert "jvm_only=True" in text and "shuffles=0" in text
