"""wrangle_pypes_spark — a PySpark-native model-based wrangling + analytics engine.

A ground-up Spark reimplementation of the capabilities of
``timfi/wrangle_pypes`` (model-based declarative data wrangling;
reference surface documented in SURVEY.md), extended with a full
relational operator surface and large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns,
streaming).

Quick start::

    from dataclasses import dataclass
    from wrangle_pypes_spark import Pipeline
    from wrangle_pypes_spark.transformations import Get, Create, Cast

    @dataclass
    class Point:
        x: int
        y: int

    @dataclass
    class Square:
        A: Point
        B: Point

    pipeline = Pipeline({
        Square: {"A": Get("A") | Create(Point),
                 "B": Get("B") | Create(Point)},
        Point:  {"x": Get("x") | Cast(int),
                 "y": Get("y") | Cast(int)},
    })
    squares_df = pipeline.create_multiple(Square, raw_df)   # lazy DataFrame

(This is the corrected version of the reference README example —
``README.md:11-54`` has a duplicate-key / invalid-JSON bug set pinned in
SURVEY.md section 2.3.6.)
"""

from .aio import AsyncCustom, async_get_or_create
from .errors import SpecError, TransformationError, WrangleError
from .models import spark_schema_for, spark_type_for
from .pipeline import Pipeline, to_instances
from .plans import PlanReport, audit, assert_jvm_only
from .session import get_session
from .transformations import (
    MISSING,
    Attr,
    Cast,
    Chain,
    Constant,
    Create,
    CreateMultiple,
    Custom,
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
    GetOrCreate,
    GetOrCreateMultiple,
    GetValues,
    Id,
    If,
    Map,
    Transformation,
)

__version__ = "0.1.0"

__all__ = (
    "Pipeline",
    "to_instances",
    "get_session",
    "PlanReport",
    "audit",
    "assert_jvm_only",
    "spark_schema_for",
    "spark_type_for",
    "WrangleError",
    "SpecError",
    "TransformationError",
    "MISSING",
    "Transformation",
    "Chain",
    "Id",
    "Constant",
    "Cast",
    "Custom",
    "Expr",
    "Default",
    "Get",
    "Attr",
    "Filter",
    "Map",
    "ForEach",
    "Flatten",
    "Gather",
    "FoldInKeys",
    "FoldInValue",
    "GetKeys",
    "GetValues",
    "If",
    "Create",
    "CreateMultiple",
    "GetOrCreate",
    "GetOrCreateMultiple",
    "AsyncCustom",
    "async_get_or_create",
)
