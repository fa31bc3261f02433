"""Unit tests for the scalar/collection/map operator surface.

Each test pins a reference behavior (citations in the operator
docstrings) including the intended-semantics fixes from SURVEY.md §2.3.
"""

import datetime as dt
from dataclasses import dataclass
from typing import Dict, List, Optional

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wrangle_pypes_spark import (
    MISSING,
    Cast,
    Chain,
    Constant,
    Default,
    Expr,
    Filter,
    Flatten,
    FoldInKeys,
    FoldInValue,
    ForEach,
    Gather,
    Get,
    GetKeys,
    GetValues,
    Id,
    If,
    Map,
    Pipeline,
    TransformationError,
)


@dataclass
class Flat:
    a: int
    b: str


def run_chain(spark, chain, data, schema):
    """Compile a single-field pipeline {M: {out: chain}} over `data`."""

    @dataclass
    class M:
        out: object

    df = spark.createDataFrame(data, schema=schema)
    p = Pipeline({M: {"out": chain}})
    return [r.out for r in p.create_multiple(M, df).collect()]


# --- group A ---------------------------------------------------------------

def test_id_constant(spark):
    df = spark.createDataFrame([(1,), (2,)], "x long")

    @dataclass
    class M:
        x: int
        c: str

    p = Pipeline({M: {"x": Get("x") | Id(), "c": Constant("k")}})
    rows = p.create_multiple(M, df).collect()
    assert rows == [Row(x=1, c="k"), Row(x=2, c="k")]


def test_cast_strict_vs_lenient(spark):
    df = spark.createDataFrame([("12",), ("nope",)], "x string")

    @dataclass
    class M:
        x: int

    strict = Pipeline({M: {"x": Get("x") | Cast(int)}})
    with pytest.raises(Exception):
        strict.create_multiple(M, df).collect()

    lenient = Pipeline({M: {"x": Get("x") | Cast(int)}}, strict=False)
    assert [r.x for r in lenient.create_multiple(M, df).collect()] == [12, None]


def test_default_truthiness(spark):
    # null, "", present value — reference Default replaces falsy values
    out = run_chain(spark, Get("x") | Default("fallback"),
                    [("",), (None,), ("v",)], "x string")
    assert out == ["fallback", "fallback", "v"]


def test_default_numeric_zero(spark):
    out = run_chain(spark, Get("x") | Default(99),
                    [(0,), (5,), (None,)], "x long")
    assert out == [99, 5, 99]


def test_default_custom_cond(spark):
    out = run_chain(spark, Get("x") | Default(0, cond=lambda c: c > 10),
                    [(5,), (11,)], "x long")
    assert out == [0, 11]


def test_if_with_else(spark):
    chain = Get("x") | If(lambda c: c > 0, then=Expr(lambda c: c * 2),
                          else_=Constant(-1))
    out = run_chain(spark, chain, [(3,), (-4,)], "x long")
    assert out == [6, -1]


def test_if_no_else_yields_null(spark):
    chain = Get("x") | If(lambda c: c > 0, then=Id())
    out = run_chain(spark, chain, [(3,), (-4,)], "x long")
    assert out == [3, None]


# --- group B ---------------------------------------------------------------

def test_get_struct_and_missing_key_raises_at_compile(spark):
    df = spark.createDataFrame([Row(s=Row(a=1))],
                               "s struct<a: long>")

    @dataclass
    class M:
        out: int

    with pytest.raises(TransformationError, match="M.out: Get"):
        Pipeline({M: {"out": Get("s") | Get("zz")}}).create_multiple(M, df)


def test_get_struct_missing_key_with_default(spark):
    out = run_chain(spark, Get("s") | Get("zz", default=7),
                    [Row(s=Row(a=1))], "s struct<a: long>")
    assert out == [7]


def test_get_map_default_vs_present_null(spark):
    # SURVEY §2.3.3: missing key → default; present-but-null stays null
    schema = "m map<string, long>"
    data = [({"k": None},), ({"other": 1},), ({"k": 5},)]
    out = run_chain(spark, Get("m") | Get("k", default=42), data, schema)
    assert out == [None, 42, 5]


def test_get_array_python_indexing(spark):
    schema = "a array<long>"
    data = [([10, 20, 30],)]
    assert run_chain(spark, Get("a") | Get(0), data, schema) == [10]
    assert run_chain(spark, Get("a") | Get(-1), data, schema) == [30]
    assert run_chain(spark, Get("a") | Get(5, default=-1), data, schema) == [-1]


def test_gather_struct(spark):
    out = run_chain(spark, Get("s") | Gather(["b", "a"]),
                    [Row(s=Row(a=1, b=2, c=3))],
                    "s struct<a: long, b: long, c: long>")
    assert out == [Row(b=2, a=1)]


def test_gather_map(spark):
    out = run_chain(spark, Get("m") | Gather(["x"]),
                    [({"x": 1, "y": 2},)], "m map<string, long>")
    assert out == [{"x": 1}]


# --- group C ---------------------------------------------------------------

def test_filter_per_element(spark):
    # pinned fix: reference bug applies predicate to whole collection
    out = run_chain(spark, Get("a") | Filter(lambda x: x % 2 == 0),
                    [([1, 2, 3, 4],)], "a array<long>")
    assert out == [[2, 4]]


def test_map_expression(spark):
    out = run_chain(spark, Get("a") | Map(lambda x: x * 10),
                    [([1, 2],)], "a array<long>")
    assert out == [[10, 20]]


def test_foreach_chain(spark):
    chain = Get("a") | ForEach(Get("v") | Cast(float))
    out = run_chain(spark, chain, [([{"v": "1.5"}, {"v": "2.5"}],)],
                    "a array<map<string,string>>")
    assert out == [[1.5, 2.5]]


def test_flatten_depths(spark):
    out = run_chain(spark, Get("a") | Flatten(),
                    [([[1, 2], [3]],)], "a array<array<long>>")
    assert out == [[1, 2, 3]]
    out = run_chain(spark, Get("a") | Flatten(depth=2),
                    [([[[1], [2]], [[3]]],)], "a array<array<array<long>>>")
    assert out == [[1, 2, 3]]


# --- group D ---------------------------------------------------------------

def test_fold_in_keys_map(spark):
    chain = Get("m") | FoldInKeys("name")
    out = run_chain(spark, chain,
                    [({"p1": Row(a=1, b=2), "p2": Row(a=3, b=4)},)],
                    "m map<string, struct<a: long, b: long>>")
    got = sorted(out[0], key=lambda r: r.name)
    assert got == [Row(name="p1", a=1, b=2), Row(name="p2", a=3, b=4)]


def test_fold_in_value(spark):
    chain = Get("m") | FoldInValue("meta", "m")
    out = run_chain(spark, chain,
                    [({"meta": Row(a=9, b=9), "x": Row(a=1, b=2)},)],
                    "m map<string, struct<a: long, b: long>>")
    assert out[0] == {"x": Row(m=Row(a=9, b=9), a=1, b=2)}


def test_get_keys_values_map(spark):
    data = [({"x": 1, "y": 2},)]
    keys = run_chain(spark, Get("m") | GetKeys(), data, "m map<string, long>")
    assert sorted(keys[0]) == ["x", "y"]
    vals = run_chain(spark, Get("m") | GetValues(), data, "m map<string, long>")
    assert sorted(vals[0]) == [1, 2]


def test_get_keys_struct(spark):
    out = run_chain(spark, Get("s") | GetKeys(),
                    [Row(s=Row(a=1, b=2))], "s struct<a: long, b: long>")
    assert out == [["a", "b"]]


# --- chain immutability (SURVEY §2.3.4) ------------------------------------

def test_chain_immutable():
    base = Get("a") | Cast(int)
    c1 = base | Default(0)
    c2 = base | Default(1)
    assert len(base.nodes) == 2
    assert len(c1.nodes) == 3 and len(c2.nodes) == 3
    assert c1.nodes[:2] == base.nodes
