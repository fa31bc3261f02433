"""Apache Iceberg read interop — jar-less, against the PUBLIC Iceberg
table spec (https://iceberg.apache.org/spec/).

Companion to sources/delta.py: "a user with an existing Iceberg table
can read it here".  Iceberg's control plane is table-metadata JSON
(``metadata/v*.metadata.json`` + ``version-hint.text``) pointing at a
snapshot whose *manifest list* and *manifests* are Avro container
files — decoded with the self-contained codec in sources/avro_io.py
(Avro files embed their writer schema, so foreign manifests decode
without any schema input).  The resolved data files are then read by
the stock vectorized parquet/orc scan.

The read path is the point — ingesting existing lakehouse tables into
the pipeline, INCLUDING v2 merge-on-read: position deletes resolve via
Spark's ``_metadata.file_path``/``row_index`` row addresses (an equi
anti-join gated on data_seq <= delete_seq) and equality deletes via a
sequence-aware key join (strict data_seq < delete_seq, so rows
re-inserted after a delete survive — the spec's rule).  A minimal
writer (append / full overwrite, identity partitioning, spec-shaped v2
metadata with put-if-absent ``vN.metadata.json`` publish) plus
``write_iceberg_deletes`` (equality-delete snapshots — the GDPR /
recall retraction shape) round out the lifecycle; richer mutation
stays with the engine's native stores.

Honest gates (loud, never a silent wrong answer): format-version 3+,
unknown data_file content codes, non-parquet delete files, data
formats other than parquet/orc, and non-identity partition columns
whose values exist only in metadata.

Scale notes: metadata resolution reads JSON + manifest Avro only —
O(manifest entries), never O(rows) — mirroring Iceberg's own planning
path; identity-partition columns missing from data files are attached
per file group from manifest partition tuples (typed literals, no
shuffle); the data scan itself is the native columnar reader, so
predicate pushdown / column pruning / AQE all apply downstream.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import fsutil
from .avro_io import read_container_file


class IcebergProtocolError(NotImplementedError):
    """Table uses spec features this reader does not implement."""


@dataclass
class IcebergSnapshot:
    path: str
    snapshot_id: int
    schema: T.StructType
    partition_spec: list[dict]
    files: list[dict] = field(repr=False)  # {path,format,partition,records,seq}
    metadata: dict = field(default_factory=dict, repr=False)
    delete_files: list[dict] = field(default_factory=list, repr=False)

    @property
    def file_paths(self) -> list[str]:
        return sorted(f["path"] for f in self.files)


_DECIMAL_RE = re.compile(r"^decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)$")
_FIXED_RE = re.compile(r"^fixed\[(\d+)\]$")

_PRIMITIVE_TYPES = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "string": T.StringType(),
    "uuid": T.StringType(),
    "binary": T.BinaryType(),
}


def _to_spark_type(ice) -> T.DataType:
    if isinstance(ice, str):
        if ice in _PRIMITIVE_TYPES:
            return _PRIMITIVE_TYPES[ice]
        m = _DECIMAL_RE.match(ice)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        m = _FIXED_RE.match(ice)
        if m:
            return T.BinaryType()
        raise IcebergProtocolError(f"iceberg type {ice!r} unsupported")
    t = ice.get("type")
    if t == "struct":
        return T.StructType([
            T.StructField(f["name"], _to_spark_type(f["type"]),
                          not f.get("required", False))
            for f in ice["fields"]])
    if t == "list":
        return T.ArrayType(_to_spark_type(ice["element"]),
                           not ice.get("element-required", False))
    if t == "map":
        return T.MapType(_to_spark_type(ice["key"]),
                         _to_spark_type(ice["value"]),
                         not ice.get("value-required", False))
    raise IcebergProtocolError(f"iceberg type {ice!r} unsupported")


def _normalize_path(p: str, table: str) -> str:
    if p.startswith("file:"):
        return fsutil._strip_file_scheme(p)
    if "://" in p or os.path.isabs(p):
        return p
    return os.path.join(table, p)


def _current_metadata_file(table: str, spark) -> str:
    meta_dir = os.path.join(table, "metadata")
    hint = fsutil.read_text(os.path.join(meta_dir, "version-hint.text"),
                            spark)
    names = fsutil.list_dir(meta_dir, spark)
    if hint is not None:
        v = hint.strip()
        for cand in (f"v{v}.metadata.json",):
            if cand in names:
                return os.path.join(meta_dir, cand)
    # no (or stale) hint: newest by embedded version number — handles
    # both HadoopCatalog (vN.metadata.json) and object-store layouts
    # (NNNNN-<uuid>.metadata.json)
    best, best_v = None, -1
    for n in names:
        if not n.endswith(".metadata.json"):
            continue
        m = re.match(r"^v?(\d+)", n)
        v = int(m.group(1)) if m else 0
        if v > best_v:
            best, best_v = n, v
    if best is None:
        raise FileNotFoundError(
            f"not an Iceberg table (no metadata json): {table}")
    return os.path.join(meta_dir, best)


def _schema_from_metadata(meta: dict) -> tuple[T.StructType, dict]:
    """(spark schema, field-id -> name) for the CURRENT schema."""
    if "schemas" in meta:
        cur = meta.get("current-schema-id", 0)
        ice = next(s for s in meta["schemas"]
                   if s.get("schema-id", 0) == cur)
    else:
        ice = meta["schema"]  # format v1
    by_id = {f["id"]: f["name"] for f in ice["fields"]}
    return _to_spark_type(ice), by_id


def iceberg_snapshot(spark: SparkSession, table: str, *,
                     snapshot_id: Optional[int] = None
                     ) -> IcebergSnapshot:
    """Resolve an Iceberg snapshot to its live data-file list.  Reads
    metadata JSON + manifest Avro only (O(manifest entries))."""
    meta_file = _current_metadata_file(table, spark)
    meta = json.loads(fsutil.read_text(meta_file, spark))
    fv = int(meta.get("format-version", 1))
    if fv > 2:
        raise IcebergProtocolError(
            f"iceberg format-version {fv} not implemented (v1/v2)")
    schema, _ = _schema_from_metadata(meta)
    specs = {s["spec-id"]: s["fields"]
             for s in meta.get("partition-specs", [])}
    if not specs and "partition-spec" in meta:  # v1 inline
        specs = {0: meta["partition-spec"]}

    snaps = {int(s["snapshot-id"]): s for s in meta.get("snapshots", [])}
    target = (int(snapshot_id) if snapshot_id is not None
              else meta.get("current-snapshot-id"))
    if target is None or int(target) == -1 or not snaps:
        return IcebergSnapshot(table, -1, schema,
                               specs.get(0, []), [], meta)
    if int(target) not in snaps:
        raise ValueError(f"snapshot {target} not in table metadata "
                         f"(have {sorted(snaps)})")
    snap = snaps[int(target)]

    if "manifest-list" in snap:
        ml_path = _normalize_path(snap["manifest-list"], table)
        _, ml_entries = read_container_file(ml_path, spark)
    else:  # v1 alternative: inline manifest paths
        ml_entries = [{"manifest_path": p, "content": 0}
                      for p in snap.get("manifests", [])]

    files: list[dict] = []
    delete_files: list[dict] = []
    snap_seq = int(snap.get("sequence-number") or 0)
    spec_fields = specs.get(0, [])
    for ent in ml_entries:
        content = int(ent.get("content") or 0)
        m_path = _normalize_path(ent["manifest_path"], table)
        _, entries = read_container_file(m_path, spark)
        spec_fields = specs.get(
            int(ent.get("partition_spec_id") or 0), spec_fields)
        ml_seq = ent.get("sequence_number")
        for e in entries:
            status = int(e.get("status") or 0)
            if status == 2:  # DELETED
                continue
            # sequence inheritance (spec v2): entry seq, else the
            # manifest-list entry's.  Beyond that the fallback is
            # ASYMMETRIC by design: seq-less DATA defaults to 0
            # (oldest — a v1/seq-less table's rows must stay
            # deletable), while a seq-less DELETE defaults to the
            # snapshot's seq (newest — it was committed by some
            # snapshot while the data was already present).
            seq = e.get("sequence_number")
            if seq is None:
                seq = ml_seq
            df_rec = e["data_file"]
            fcontent = int(df_rec.get("content") or 0)
            fmt = str(df_rec.get("file_format") or "PARQUET").lower()
            if fcontent == 0:
                if content != 0:
                    raise IcebergProtocolError(
                        "data file inside a delete manifest")
                if fmt not in ("parquet", "orc"):
                    raise IcebergProtocolError(
                        f"data file format {fmt!r} unsupported")
                files.append({
                    "path": _normalize_path(df_rec["file_path"], table),
                    "format": fmt,
                    "partition": dict(df_rec.get("partition") or {}),
                    "records": int(df_rec.get("record_count") or 0),
                    "seq": int(seq if seq is not None else 0),
                })
            elif fcontent in (1, 2):  # position / equality deletes
                if fmt != "parquet":
                    raise IcebergProtocolError(
                        f"delete file format {fmt!r} unsupported")
                delete_files.append({
                    "path": _normalize_path(df_rec["file_path"], table),
                    "content": fcontent,
                    "seq": int(seq if seq is not None else snap_seq),
                    "equality_ids": list(
                        df_rec.get("equality_ids") or []),
                })
            else:
                raise IcebergProtocolError(
                    f"unknown data_file content {fcontent}")
    return IcebergSnapshot(table, int(target), schema, spec_fields,
                           files, meta, delete_files=delete_files)


def read_iceberg(spark: SparkSession, table: str, *,
                 snapshot_id: Optional[int] = None) -> DataFrame:
    """Read an Iceberg table snapshot as a DataFrame.

    Data files normally embed every column (Iceberg writers store
    identity-partition columns in the data); when a table carries
    metadata-only identity partition columns, they are re-attached per
    file group from the manifest partition tuples.  Non-identity
    transforms (bucket/truncate/days/…) never lose source columns, so
    no reconstruction is needed for them."""
    snap = iceberg_snapshot(spark, table, snapshot_id=snapshot_id)
    if not snap.files:
        return spark.createDataFrame([], snap.schema)
    want = [f.name for f in snap.schema.fields]
    # merge-on-read: with live delete files, every data row carries
    # (file, row_index, data sequence) so the delete joins can apply
    with_meta = bool(snap.delete_files)
    meta_cols = ["_ice_fp", "_ice_ri"] if with_meta else []

    out = None
    for fmt in ("parquet", "orc"):
        paths = [f["path"] for f in snap.files if f["format"] == fmt]
        if not paths:
            continue
        d = getattr(spark.read, fmt)(*paths)
        missing = [c for c in want if c not in d.columns]
        if missing:
            d = _attach_identity_partitions(
                spark, snap, fmt, missing, with_meta=with_meta)
        elif with_meta:
            d = d.select(
                "*",
                F.col("_metadata.file_path").alias("_ice_fp"),
                F.col("_metadata.row_index").alias("_ice_ri"))
        d = d.select(*([F.col(c).cast(snap.schema[c].dataType)
                        for c in want]
                       + [F.col(c) for c in meta_cols]))
        out = d if out is None else out.unionByName(d)
    if with_meta:
        out = _apply_row_deletes(spark, snap, out)
        out = out.select(*want)
    return out


def _norm_uri(col):
    """Canonicalize 'file:'-scheme URIs so manifest paths, delete-file
    ``file_path`` values, and Spark's ``_metadata.file_path`` compare
    equal ('file:/x', 'file:///x', '/x' -> '/x')."""
    return F.regexp_replace(col, "^file:/+", "/")


def _apply_row_deletes(spark, snap: IcebergSnapshot, d: DataFrame):
    """Merge-on-read per the v2 spec: a POSITION delete removes row
    ``pos`` of ``file_path`` when data_seq <= delete_seq; an EQUALITY
    delete removes any row matching its key tuple when
    data_seq < delete_seq (strictly older), so rows re-inserted after
    the delete survive.  Both are joins — position deletes an equi
    anti-join on (file, pos), equality deletes a broadcast-friendly
    key join against per-key max delete sequences."""
    seq_rows = [(f["path"], int(f["seq"])) for f in snap.files]
    seq_df = spark.createDataFrame(seq_rows, "_ice_p string, _ice_seq long") \
        .withColumn("_ice_p", _norm_uri(F.col("_ice_p")))
    d = (d.withColumn("_ice_np", _norm_uri(F.col("_ice_fp")))
         .join(F.broadcast(seq_df),
               F.col("_ice_np") == F.col("_ice_p"), "left")
         .drop("_ice_p")
         .withColumn("_ice_seq", F.coalesce("_ice_seq", F.lit(0))))

    pos = [f for f in snap.delete_files if f["content"] == 1]
    if pos:
        dels = None
        for f in pos:
            x = (spark.read.parquet(f["path"])
                 .select(_norm_uri(F.col("file_path")).alias("_dp"),
                         F.col("pos").cast("long").alias("_dpos"),
                         F.lit(int(f["seq"])).alias("_dseq")))
            dels = x if dels is None else dels.unionByName(x)
        d = d.join(dels, (d["_ice_np"] == dels["_dp"])
                   & (d["_ice_ri"] == dels["_dpos"])
                   & (d["_ice_seq"] <= dels["_dseq"]), "left_anti")

    eqs = [f for f in snap.delete_files if f["content"] == 2]
    if eqs:
        _, by_id = _schema_from_metadata(snap.metadata)
        from collections import defaultdict
        groups = defaultdict(list)
        for f in eqs:
            groups[tuple(f["equality_ids"])].append(f)
        for ids, fs in sorted(groups.items()):
            if not ids:
                raise IcebergProtocolError(
                    "equality delete file without equality_ids")
            try:
                names = [by_id[i] for i in ids]
            except KeyError as e:
                raise IcebergProtocolError(
                    f"equality_ids reference unknown field id {e}")
            keys = None
            for f in fs:
                x = (spark.read.parquet(f["path"])
                     .select(*[F.col(n) for n in names])
                     .withColumn("_dseq", F.lit(int(f["seq"]))))
                keys = x if keys is None else keys.unionByName(x)
            agg = (keys.groupBy(*names)
                   .agg(F.max("_dseq").alias("_mds"))
                   .select(*[F.col(n).alias(f"_k_{n}") for n in names],
                           "_mds"))
            cond = None
            for n in names:
                c = d[n].eqNullSafe(agg[f"_k_{n}"])
                cond = c if cond is None else cond & c
            d = (d.join(agg, cond, "left")
                 .where(~(F.col("_mds").isNotNull()
                          & (F.col("_mds") > F.col("_ice_seq"))))
                 .drop("_mds", *[f"_k_{n}" for n in names]))
    return d


def _hive_consistent_ice(snap: IcebergSnapshot, fmt: str,
                         missing: list) -> bool:
    from urllib.parse import unquote
    for f in snap.files:
        if f["format"] != fmt:
            continue
        segs = {}
        for seg in f["path"].split("/")[:-1]:
            if "=" in seg:
                k, v = seg.split("=", 1)
                segs[k] = unquote(v)
        for c in missing:
            sv = segs.get(c)
            v = f["partition"].get(c)
            if sv is None:
                return False
            if sv == "__HIVE_DEFAULT_PARTITION__":
                if v is not None:
                    return False
            elif v is None or sv != str(v):
                return False
    return True


def _attach_identity_partitions(spark, snap: IcebergSnapshot,
                                fmt: str, missing: list[str], *,
                                with_meta: bool = False):
    """Metadata-only partition columns: group files by partition tuple
    and attach typed literals from the manifests (mirrors the Delta
    reader; one scan per live partition tuple).  ``with_meta`` adds
    the (_ice_fp, _ice_ri) row-address columns for delete merging."""
    ident = {f["name"] for f in snap.partition_spec
             if f.get("transform") == "identity"}
    not_identity = [c for c in missing if c not in ident]
    if not_identity:
        raise IcebergProtocolError(
            f"columns {not_identity} absent from data files and not "
            "identity partition fields — cannot reconstruct")
    fields = {f.name: f.dataType for f in snap.schema.fields}
    # single-scan fast path (mirrors sources/delta.py): when every
    # file path carries hive segments agreeing with its manifest
    # partition tuple, one basePath scan infers the partition columns
    # typed per the table schema — no per-partition driver unions
    if fmt == "parquet" and _hive_consistent_ice(snap, fmt, missing):
        want = T.StructType(
            [f for f in snap.schema.fields])
        d = (spark.read.schema(want)
             .option("basePath", snap.path)
             .parquet(*[f["path"] for f in snap.files
                        if f["format"] == fmt]))
        if with_meta:
            d = d.select(
                "*",
                F.col("_metadata.file_path").alias("_ice_fp"),
                F.col("_metadata.row_index").alias("_ice_ri"))
        return d
    groups: dict[tuple, list[str]] = {}
    pvals: dict[tuple, dict] = {}
    for f in snap.files:
        if f["format"] != fmt:
            continue
        key = tuple(repr(f["partition"].get(c)) for c in missing)
        groups.setdefault(key, []).append(f["path"])
        pvals[key] = f["partition"]
    parts = []
    for key in sorted(groups):
        d = getattr(spark.read, fmt)(*groups[key])
        if with_meta:
            d = d.select(
                "*",
                F.col("_metadata.file_path").alias("_ice_fp"),
                F.col("_metadata.row_index").alias("_ice_ri"))
        for c in missing:
            v = pvals[key].get(c)
            d = d.withColumn(c, F.lit(v).cast(fields[c]))
        parts.append(d)
    out = parts[0]
    for d in parts[1:]:
        out = out.unionByName(d)
    return out


# ---------------------------------------------------------------------------
# minimal writer (spec-shaped v2: append / full overwrite, identity
# partitioning) — enough to publish pipeline outputs as Iceberg and to
# drive the reader's value-oracled check; rich write features
# (row-level deletes, schema evolution, compaction) stay with the
# native stores
# ---------------------------------------------------------------------------

_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "added_snapshot_id", "type": "long"},
    ]}

_SPARK_TO_ICE = {T.LongType(): "long", T.IntegerType(): "int",
                 T.StringType(): "string", T.DoubleType(): "double",
                 T.FloatType(): "float", T.BooleanType(): "boolean",
                 T.DateType(): "date", T.BinaryType(): "binary"}
_ICE_TO_AVRO = {"long": "long", "int": "int", "string": "string",
                "double": "double", "float": "float",
                "boolean": "boolean"}


def _ice_schema_from_spark(schema: T.StructType) -> dict:
    fields = []
    for i, f in enumerate(schema.fields):
        ice = _SPARK_TO_ICE.get(f.dataType)
        if ice is None:
            raise IcebergProtocolError(
                f"write_iceberg: column {f.name!r} type "
                f"{f.dataType.simpleString()} unsupported by the "
                "minimal writer")
        fields.append({"id": i + 1, "name": f.name,
                       "required": False, "type": ice})
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _parse_pv(raw: Optional[str], ice_type: str):
    if raw is None:
        return None
    if ice_type in ("int", "long"):
        return int(raw)
    if ice_type == "double":
        return float(raw)
    if ice_type == "boolean":
        return raw == "true"
    return raw


def write_iceberg(df: DataFrame, table: str, *, mode: str = "append",
                  partition_by: Optional[list] = None) -> int:
    """Publish a DataFrame as an Iceberg v2 snapshot; returns the
    snapshot id.  Append adds a manifest on top of the current
    snapshot's manifest list; overwrite starts a fresh manifest list
    (prior snapshots stay time-travelable).  Metadata publish is
    put-if-absent on ``v{N}.metadata.json`` (the HadoopCatalog commit
    rule), so racing writers cannot silently clobber each other."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    spark = df.sparkSession
    mdir = os.path.join(table, "metadata")
    fsutil.ensure_dir(mdir, spark)
    try:
        meta_file = _current_metadata_file(table, spark)
        meta = json.loads(fsutil.read_text(meta_file, spark))
        cur_version = int(re.match(
            r"^v?(\d+)", os.path.basename(meta_file)).group(1))
    except FileNotFoundError:
        meta = None
        cur_version = 0

    if meta is None:
        partition_by = list(partition_by or [])
        ice_schema = _ice_schema_from_spark(df.schema)
        name_to_id = {f["name"]: f["id"] for f in ice_schema["fields"]}
        spec = [{"name": c, "transform": "identity",
                 "source-id": name_to_id[c],
                 "field-id": 1000 + i}
                for i, c in enumerate(partition_by)]
        meta = {"format-version": 2,
                "table-uuid": uuid_hex(table),
                "location": table, "last-sequence-number": 0,
                "last-updated-ms": 0,
                "last-column-id": len(ice_schema["fields"]),
                "current-schema-id": 0, "schemas": [ice_schema],
                "default-spec-id": 0,
                "partition-specs": [{"spec-id": 0, "fields": spec}],
                "last-partition-id": 1000 + len(spec),
                "default-sort-order-id": 0,
                "sort-orders": [{"order-id": 0, "fields": []}],
                "current-snapshot-id": -1, "snapshots": []}
    else:
        schema_struct, _ = _schema_from_metadata(meta)
        if [f.name for f in df.schema.fields] \
                != [f.name for f in schema_struct.fields]:
            raise ValueError(
                "schema mismatch: write columns "
                f"{df.schema.fieldNames()} vs table "
                f"{schema_struct.fieldNames()} (no evolution support)")
        spec = meta["partition-specs"][0]["fields"]
        want_p = [f["name"] for f in spec]
        if partition_by is not None and list(partition_by) != want_p:
            raise ValueError(f"partition_by {list(partition_by)} != "
                             f"table's {want_p}")
        partition_by = want_p
        ice_schema = next(s for s in meta["schemas"]
                          if s.get("schema-id", 0)
                          == meta.get("current-schema-id", 0))

    ice_types = {f["name"]: f["type"] for f in ice_schema["fields"]}
    # stage parquet data files (hive layout drops partition cols from
    # the files; the reader re-attaches them from the manifests)
    import uuid as _uuid
    staging = os.path.join(table, f"_staging_{_uuid.uuid4().hex}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    entries = []
    data_dir = os.path.join(table, "data")
    fsutil.ensure_dir(data_dir, spark)

    def _walk(rel: str) -> None:
        full = os.path.join(staging, rel) if rel else staging
        for name in fsutil.list_dir(full, spark):
            child_rel = os.path.join(rel, name) if rel else name
            child = os.path.join(staging, child_rel)
            if name.endswith(".parquet"):
                pv = {}
                for seg in child_rel.split(os.sep)[:-1]:
                    if "=" in seg:
                        k, v = seg.split("=", 1)
                        pv[k] = None if v == "__HIVE_DEFAULT_PARTITION__" \
                            else v
                # keep the hive segments under data/ so readers (ours
                # included) can take a single-scan basePath fast path
                # instead of per-partition unions
                subdir = os.path.dirname(child_rel)
                dest_dir = (os.path.join(data_dir, subdir) if subdir
                            else data_dir)
                fsutil.ensure_dir(dest_dir, spark)
                dest = os.path.join(
                    dest_dir, f"d-{_uuid.uuid4().hex}.parquet")
                fsutil.rename(child, dest, spark)
                entries.append({
                    "status": 1, "snapshot_id": None,
                    "data_file": {
                        "content": 0, "file_path": dest,
                        "file_format": "PARQUET",
                        "partition": {
                            c: _parse_pv(pv.get(c), ice_types[c])
                            for c in partition_by},
                        "record_count": 0,
                        "file_size_in_bytes": int(
                            os.path.getsize(
                                fsutil._strip_file_scheme(dest))
                            if fsutil.is_local(dest) else 0),
                    }})
            elif "." not in name or "=" in name:
                _walk(child_rel)

    _walk("")
    fsutil.delete(staging, spark=spark)

    from .avro_io import write_container_file
    snap_id = (max((int(s["snapshot-id"])
                    for s in meta["snapshots"]), default=0) + 1)
    part_avro_fields = []
    for c in partition_by:
        avro_t = _ICE_TO_AVRO.get(ice_types[c])
        if avro_t is None:
            raise IcebergProtocolError(
                f"partition column {c!r} type {ice_types[c]!r} "
                "unsupported by the minimal writer")
        part_avro_fields.append({"name": c, "type": ["null", avro_t]})
    manifest_schema = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102",
                        "fields": part_avro_fields}},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ]}}]}
    m_path = os.path.join(mdir, f"m-{_uuid.uuid4().hex}.avro")
    write_container_file(m_path, manifest_schema, entries)

    prev_manifests = []
    if mode == "append" and meta.get("current-snapshot-id", -1) != -1:
        cur_snap = next(s for s in meta["snapshots"]
                        if s["snapshot-id"]
                        == meta["current-snapshot-id"])
        _, prev = read_container_file(
            _normalize_path(cur_snap["manifest-list"], table), spark)
        prev_manifests = prev
    seq = int(meta.get("last-sequence-number", 0)) + 1
    ml_entries = ([{"sequence_number": None, **e}
                   for e in prev_manifests]
                  + [{"manifest_path": m_path, "manifest_length": 1,
                      "partition_spec_id": 0, "content": 0,
                      "sequence_number": seq,
                      "added_snapshot_id": snap_id}])
    ml_path = os.path.join(mdir, f"snap-{snap_id}-{_uuid.uuid4().hex}.avro")
    write_container_file(ml_path, _MANIFEST_LIST_SCHEMA, ml_entries)

    meta["snapshots"] = meta["snapshots"] + [{
        "snapshot-id": snap_id, "sequence-number": seq,
        "timestamp-ms": 0, "manifest-list": ml_path,
        "summary": {"operation": mode}}]
    meta["current-snapshot-id"] = snap_id
    meta["last-sequence-number"] = seq
    new_version = cur_version + 1
    new_meta_path = os.path.join(mdir, f"v{new_version}.metadata.json")
    from .delta import _create_exclusive
    if not _create_exclusive(new_meta_path, json.dumps(meta), spark):
        raise RuntimeError(
            f"concurrent iceberg commit won v{new_version}; re-run")
    fsutil.write_text_atomic(
        os.path.join(mdir, "version-hint.text"), str(new_version),
        spark)
    return snap_id


def uuid_hex(seed: str) -> str:
    """Deterministic table uuid from the location (no RNG: keeps
    fixture builds reproducible)."""
    import hashlib
    return hashlib.md5(seed.encode()).hexdigest()


def write_iceberg_deletes(keys_df: DataFrame, table: str, *,
                          equality_cols: list) -> int:
    """Publish an EQUALITY-delete snapshot (v2 merge-on-read): every
    row in ``keys_df`` (columns = ``equality_cols``) deletes all data
    rows with that key tuple whose data sequence is strictly older
    than this snapshot's.  Returns the snapshot id.

    Position deletes are read-supported but not written — the engine's
    own row-level mutation story is the manifest store's MERGE; this
    writer exists so pipeline-side retractions (GDPR keys, recalled
    docs) can be expressed against an Iceberg table without rewriting
    data files."""
    spark = keys_df.sparkSession
    meta_file = _current_metadata_file(table, spark)
    meta = json.loads(fsutil.read_text(meta_file, spark))
    cur_version = int(re.match(
        r"^v?(\d+)", os.path.basename(meta_file)).group(1))
    if int(meta.get("format-version", 1)) < 2:
        raise IcebergProtocolError(
            "equality deletes need format-version 2")
    _, by_id = _schema_from_metadata(meta)
    name_to_id = {v: k for k, v in by_id.items()}
    unknown = [c for c in equality_cols if c not in name_to_id]
    if unknown:
        raise ValueError(f"equality_cols {unknown} not in table schema")
    if sorted(keys_df.columns) != sorted(equality_cols):
        raise ValueError(
            f"keys_df columns {keys_df.columns} must equal "
            f"equality_cols {list(equality_cols)}")

    import uuid as _uuid
    mdir = os.path.join(table, "metadata")
    data_dir = os.path.join(table, "data")
    fsutil.ensure_dir(data_dir, spark)
    staging = os.path.join(table, f"_staging_{_uuid.uuid4().hex}")
    keys_df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(n for n in fsutil.list_dir(staging, spark)
                if n.endswith(".parquet"))
    del_path = os.path.join(
        data_dir, f"eqdel-{_uuid.uuid4().hex}.parquet")
    fsutil.rename(os.path.join(staging, part), del_path, spark)
    fsutil.delete(staging, spark=spark)

    manifest_schema = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102",
                        "fields": []}},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {"name": "equality_ids",
                     "type": ["null", {"type": "array",
                                       "items": "int"}]},
                ]}}]}
    snap_id = (max((int(s["snapshot-id"])
                    for s in meta.get("snapshots", [])), default=0) + 1)
    seq = int(meta.get("last-sequence-number", 0)) + 1
    from .avro_io import write_container_file
    m_path = os.path.join(mdir, f"m-del-{_uuid.uuid4().hex}.avro")
    write_container_file(m_path, manifest_schema, [{
        "status": 1, "snapshot_id": None,
        "data_file": {
            "content": 2, "file_path": del_path,
            "file_format": "PARQUET", "partition": {},
            "record_count": 0, "file_size_in_bytes": 0,
            "equality_ids": [int(name_to_id[c])
                             for c in equality_cols],
        }}])

    prev_manifests = []
    if meta.get("current-snapshot-id", -1) != -1:
        cur_snap = next(s for s in meta["snapshots"]
                        if s["snapshot-id"]
                        == meta["current-snapshot-id"])
        _, prev_manifests = read_container_file(
            _normalize_path(cur_snap["manifest-list"], table), spark)
    ml_entries = ([{"sequence_number": None, **e}
                   for e in prev_manifests]
                  + [{"manifest_path": m_path, "manifest_length": 1,
                      "partition_spec_id": 0, "content": 1,
                      "sequence_number": seq,
                      "added_snapshot_id": snap_id}])
    ml_path = os.path.join(
        mdir, f"snap-{snap_id}-{_uuid.uuid4().hex}.avro")
    write_container_file(ml_path, _MANIFEST_LIST_SCHEMA, ml_entries)

    meta["snapshots"] = meta.get("snapshots", []) + [{
        "snapshot-id": snap_id, "sequence-number": seq,
        "timestamp-ms": 0, "manifest-list": ml_path,
        "summary": {"operation": "delete"}}]
    meta["current-snapshot-id"] = snap_id
    meta["last-sequence-number"] = seq
    new_meta_path = os.path.join(
        mdir, f"v{cur_version + 1}.metadata.json")
    from .delta import _create_exclusive
    if not _create_exclusive(new_meta_path, json.dumps(meta), spark):
        raise RuntimeError(
            f"concurrent iceberg commit won v{cur_version + 1}; re-run")
    fsutil.write_text_atomic(
        os.path.join(mdir, "version-hint.text"),
        str(cur_version + 1), spark)
    return snap_id
