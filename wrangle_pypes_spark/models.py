"""Model (dataclass) <-> Spark StructType derivation.

Parity: the reference's "model" is any callable type taking keyword
args, in practice a ``@dataclass`` (reference ``README.md:18-27``,
``pipeline.py:41`` -- ``model(**kwargs)``).  In the Spark engine the
model's declared fields become a ``StructType``; a built model instance
is one (possibly nested) struct row.

Mapping (SURVEY.md section 1.2):
    int            -> LongType
    float          -> DoubleType
    str            -> StringType
    bool           -> BooleanType
    bytes          -> BinaryType
    datetime       -> TimestampType
    date           -> DateType
    Decimal        -> DecimalType(38, 18)
    Optional[T]    -> T with nullable=True
    List[T]        -> ArrayType(T)
    Dict[K, V]     -> MapType(K, V)
    nested model   -> nested StructType
"""

from __future__ import annotations

import dataclasses
import datetime as _dt
import decimal
import typing
from typing import Any, Union, get_args, get_origin

from pyspark.sql import types as T

_ATOMIC: dict[type, T.DataType] = {
    int: T.LongType(),
    float: T.DoubleType(),
    str: T.StringType(),
    bool: T.BooleanType(),
    bytes: T.BinaryType(),
    _dt.datetime: T.TimestampType(),
    _dt.date: T.DateType(),
    decimal.Decimal: T.DecimalType(38, 18),
}


def spark_type_for(py_type: Any) -> tuple[T.DataType, bool]:
    """Return ``(DataType, nullable)`` for a Python type annotation."""
    import types as _types

    origin = get_origin(py_type)
    if origin is Union or origin is _types.UnionType:
        args = [a for a in get_args(py_type) if a is not type(None)]
        nullable = len(args) != len(get_args(py_type))
        if len(args) != 1:
            raise TypeError(f"unsupported union type: {py_type!r}")
        inner, inner_null = spark_type_for(args[0])
        return inner, nullable or inner_null
    if origin in (list, tuple):
        (elem,) = get_args(py_type) or (str,)
        elem_t, elem_null = spark_type_for(elem)
        return T.ArrayType(elem_t, containsNull=elem_null), False
    if origin is dict:
        key, val = get_args(py_type) or (str, str)
        key_t, _ = spark_type_for(key)
        val_t, val_null = spark_type_for(val)
        return T.MapType(key_t, val_t, valueContainsNull=val_null), False
    if isinstance(py_type, type) and dataclasses.is_dataclass(py_type):
        return spark_schema_for(py_type), False
    if isinstance(py_type, T.DataType):
        return py_type, True
    if py_type in _ATOMIC:
        return _ATOMIC[py_type], False
    if py_type in (Any, None, type(None), object, list, tuple, dict):
        # "unknown" — the pipeline keeps whatever type the chain produced
        return T.NullType(), True
    raise TypeError(f"cannot map python type {py_type!r} to a Spark type")


def spark_schema_for(model: type) -> T.StructType:
    """Derive a StructType from a dataclass's field annotations."""
    if not dataclasses.is_dataclass(model):
        raise TypeError(f"{model!r} is not a dataclass model")
    hints = typing.get_type_hints(model)
    fields = []
    for f in dataclasses.fields(model):
        dtype, _nullable = spark_type_for(hints.get(f.name, Any))
        # Output fields are always nullable: every Spark expression can
        # produce null (lenient mode, outer joins), and Parquet round-trips
        # drop non-null enforcement anyway.
        fields.append(T.StructField(f.name, dtype, nullable=True))
    return T.StructType(fields)


def field_types(model: type) -> dict[str, T.DataType]:
    """field name -> declared Spark type for a dataclass model."""
    return {f.name: f.dataType for f in spark_schema_for(model).fields}
