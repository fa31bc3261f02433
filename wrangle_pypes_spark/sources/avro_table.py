"""Avro as a user-facing TABLE format — ``read_avro`` / ``write_avro``
over the self-contained container codec in sources/avro_io.py (which
otherwise serves only Iceberg manifests).

Why this exists: Avro container files are a common landing format for
event feeds and CDC dumps; the north-star engine should ingest and
publish them without jars.  The reference engine has no file
connectors at all (its ingress is ``json.loads`` rows —
reference ``README.md:41-53``), so this is [EXT] surface beside the
parquet/orc/json readers in sources/sinks.py.

Scale shape: both directions keep the codec work IN executors —
``write_avro`` emits one container file per input partition from a
``mapInPandas`` pass (the driver sees only the O(partitions) file
manifest), and ``read_avro`` decodes files in a ``mapInPandas`` over
the file list, so ingest parallelism is the file count.  Only the
first file's embedded writer schema is read driver-side (to derive
the DataFrame schema — Avro containers are self-describing).

Supported column types: long/int/double/float/boolean/string/binary,
nullable throughout (encoded as ``["null", T]`` unions).  Anything
else gates loudly — no silent coercion.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .. import fsutil
from ..localdf import local_df
from .avro_io import AvroError, read_container, write_container

_SPARK_TO_AVRO = {
    T.LongType(): "long", T.IntegerType(): "int",
    T.DoubleType(): "double", T.FloatType(): "float",
    T.BooleanType(): "boolean", T.StringType(): "string",
    T.BinaryType(): "bytes",
}
_AVRO_TO_SPARK = {
    "long": T.LongType(), "int": T.IntegerType(),
    "double": T.DoubleType(), "float": T.FloatType(),
    "boolean": T.BooleanType(), "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def _avro_schema_for(schema: T.StructType, name: str) -> dict:
    fields = []
    for f in schema.fields:
        avro_t = _SPARK_TO_AVRO.get(f.dataType)
        if avro_t is None:
            raise AvroError(
                f"write_avro: column {f.name!r} type "
                f"{f.dataType.simpleString()} unsupported (supported: "
                + ", ".join(sorted(t.simpleString()
                                   for t in _SPARK_TO_AVRO)) + ")")
        fields.append({"name": f.name, "type": ["null", avro_t]})
    return {"type": "record", "name": name, "fields": fields}


def _spark_schema_for(avro_schema: dict) -> T.StructType:
    if not isinstance(avro_schema, dict) \
            or avro_schema.get("type") != "record":
        raise AvroError(
            f"read_avro: top-level schema must be a record, got "
            f"{avro_schema!r}")
    out = []
    for f in avro_schema["fields"]:
        ft = f["type"]
        if isinstance(ft, list):  # union: null + one primitive
            branches = [b for b in ft if b != "null"]
            if len(branches) != 1 or not isinstance(branches[0], str):
                raise AvroError(
                    f"read_avro: field {f['name']!r} union {ft!r} "
                    "unsupported (want [\"null\", primitive])")
            ft = branches[0]
        if not isinstance(ft, str) or ft not in _AVRO_TO_SPARK:
            raise AvroError(
                f"read_avro: field {f['name']!r} type {ft!r} "
                "unsupported")
        out.append(T.StructField(f["name"], _AVRO_TO_SPARK[ft], True))
    return T.StructType(out)


def _read_bytes_anywhere(path: str) -> bytes:
    """Executor-safe byte read (same approach as sources/dv.py)."""
    if "://" not in path or path.startswith("file:"):
        local = path[5:] if path.startswith("file:") else path
        while local.startswith("//"):
            local = local[1:]
        with open(local, "rb") as f:
            return f.read()
    from pyarrow import fs as pafs
    f, p = pafs.FileSystem.from_uri(path)
    with f.open_input_stream(p) as stream:
        return stream.read()


def write_avro(df: DataFrame, path: str, *,
               codec: str = "deflate") -> int:
    """Write ``df`` as a directory of Avro container files (one per
    input partition, encoded inside executors); returns the number of
    files written.  Files land under unique names; the directory is
    created fresh (mkdir semantics like DataFrameWriter overwrite are
    the caller's choice — existing ``part-*.avro`` files are left in
    place, so pre-clean for overwrite)."""
    avro_schema = _avro_schema_for(df.schema, "row")
    spark = df.sparkSession
    fsutil.ensure_dir(path, spark)
    out_root = fsutil._strip_file_scheme(path) \
        if fsutil.is_local(path) else path
    col_names = [f.name for f in df.schema.fields]
    bin_cols = {f.name for f in df.schema.fields
                if isinstance(f.dataType, T.BinaryType)}

    def _write(batches):
        import pandas as pd
        rows = []
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                clean = {}
                for c in col_names:
                    v = rec.get(c)
                    if v is None or (isinstance(v, float)
                                     and v != v):  # NaN -> null
                        clean[c] = None
                    elif c in bin_cols:
                        clean[c] = bytes(v)
                    elif hasattr(v, "item"):  # numpy scalar
                        clean[c] = v.item()
                    else:
                        clean[c] = v
                rows.append(clean)
        if not rows:
            return
        data = write_container(avro_schema, rows, codec=codec)
        name = f"part-{uuid.uuid4().hex}.avro"
        dest = os.path.join(out_root, name)
        if "://" not in dest:
            with open(dest, "wb") as f:
                f.write(data)
        else:
            from pyarrow import fs as pafs
            f, p = pafs.FileSystem.from_uri(dest)
            with f.open_output_stream(p) as stream:
                stream.write(data)
        yield pd.DataFrame({"file": [name], "n": [len(rows)]})

    manifest = df.mapInPandas(_write, "file string, n long").collect()
    return len(manifest)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of Avro container files (or one file) as a
    DataFrame.  The writer schema embedded in the FIRST file drives
    the DataFrame schema; every file decodes inside executors, one
    task per file."""
    names = []
    if fsutil.dir_exists(path, spark):
        names = [os.path.join(path, n)
                 for n in sorted(fsutil.list_dir(path, spark))
                 if n.endswith(".avro")]
    else:
        names = [path]
    if not names:
        raise FileNotFoundError(f"no .avro files under {path}")
    # schema probe: decode ONE file driver-side (bounded by the
    # largest single container file, never the dataset)
    head = _read_bytes_anywhere(
        fsutil._strip_file_scheme(names[0])
        if fsutil.is_local(names[0]) else names[0])
    avro_schema, _ = read_container(head)
    schema = _spark_schema_for(avro_schema)
    col_names = [f.name for f in schema.fields]

    def _read(batches):
        import pandas as pd
        for pdf in batches:
            for p in pdf["path"]:
                _, records = read_container(_read_bytes_anywhere(p))
                if not records:
                    continue
                yield pd.DataFrame(
                    {c: [r.get(c) for r in records]
                     for c in col_names})

    paths_df = local_df(
        spark,
        [(fsutil._strip_file_scheme(n) if fsutil.is_local(n) else n,)
         for n in names], "path string")
    n_tasks = max(1, min(len(names),
                         spark.sparkContext.defaultParallelism))
    return (paths_df.repartition(n_tasks)
            .mapInPandas(_read, schema))
