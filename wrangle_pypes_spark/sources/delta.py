"""Delta Lake interop — jar-less reader + minimal writer against the
PUBLIC Delta transaction-log protocol (https://github.com/delta-io/delta
PROTOCOL.md).

The container ships no delta-spark jars, but the protocol needs none:
a Delta table is parquet data files plus ``_delta_log/`` holding
ordered JSON commits (``%020d.json`` of newline-delimited action
objects: ``protocol`` / ``metaData`` / ``add`` / ``remove``) and
optional parquet checkpoints.  This module implements the seam the
north star needs — "a user with an existing Delta table can read it,
and our outputs are readable by any Delta engine" — in pure Python +
Spark DataFrame calls:

- **Reader**: replay the log (latest checkpoint parquet + later JSON
  commits, or pure JSON), resolve the live file set, prune partitions
  from log ``partitionValues`` BEFORE touching data, and read with the
  native parquet scan.  ``metaData.schemaString`` is Spark's own JSON
  schema format, so types round-trip exactly.  Time travel via
  ``version=``.
- **Writer**: ``mode='append' | 'overwrite'`` + ``replace_where=``
  (partition-scoped overwrite), hive-style partition layout, commits
  published with PUT-IF-ABSENT (O_EXCL locally, ``fs.create(path,
  overwrite=false)`` on HDFS) and optimistic retry for appends —
  the same commit rule the Delta spec mandates.  ``txn_app_id``/
  ``txn_version`` ride the spec's ``txn`` action for idempotent
  (exactly-once) streaming appends — see
  ``streaming.foreach_batch_delta_append``.  ``delta_checkpoint``
  writes a spec-shaped parquet checkpoint (txn state included) +
  ``_last_checkpoint`` so both halves of the reader path are
  exercised; ``delta_history`` / ``delta_vacuum`` cover the ops
  surface (DESCRIBE HISTORY / VACUUM semantics).

Honest gates (loud, never silent): reader-protocol features we don't
implement (deletion vectors, column mapping) raise
``NotImplementedError`` naming the feature; object stores without
atomic create-if-absent (S3 without a commit coordinator) are exactly
as unsupported here as in Delta itself and fail on the exclusive
create.

Scale notes: log replay touches ONLY the log (checkpoint parquet +
tail JSON commits — O(commits since checkpoint), independent of data
size); partition pruning happens on log metadata so a pruned read
never lists or opens pruned data files; the data scan is the stock
vectorized parquet reader (pushdown/pruning/AQE all apply).  Readers
group files by hive layout when the paths allow (single scan,
partition columns inferred under ``basePath``) and fall back to
per-partition-value unions for foreign layouts.

Reference parity: the reference engine (wrangle_pypes) has no table
format; this is [EXT] north-star surface alongside sources/acid.py
(whose docstring names Delta as the real-world answer).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import fsutil

_LOG_DIR = "_delta_log"
_LAST_CHECKPOINT = "_last_checkpoint"
# reader features we actually implement; anything else in a v3+
# protocol's readerFeatures is a loud gate
_SUPPORTED_READER_FEATURES = {"timestampNtz", "v2Checkpoint"}
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


class DeltaProtocolError(NotImplementedError):
    """The table uses a protocol feature this reader does not
    implement — refusing is the only correct behavior (the spec forbids
    reading tables whose reader version/features you don't support)."""


class DeltaConcurrentWriteError(RuntimeError):
    """Another writer committed the version we tried to publish and
    the operation is not safely retryable (overwrite/replace_where)."""


@dataclass
class DeltaSnapshot:
    path: str
    version: int
    schema: T.StructType
    partition_columns: list[str]
    files: dict[str, dict] = field(repr=False)  # path -> add action
    protocol: dict = field(default_factory=dict)
    metadata: dict = field(default_factory=dict, repr=False)
    txns: dict = field(default_factory=dict)  # appId -> last version

    @property
    def file_paths(self) -> list[str]:
        return sorted(self.files)


def _log_path(table: str, name: str) -> str:
    return os.path.join(table, _LOG_DIR, name)


def _commit_name(version: int) -> str:
    return f"{version:020d}.json"


def _checkpoint_name(version: int) -> str:
    return f"{version:020d}.checkpoint.parquet"


def _create_exclusive(path: str, text: str, spark=None) -> bool:
    """Put-if-absent publish of one commit file.  True if we won the
    race, False if the name already exists (someone else committed this
    version).  Local: O_CREAT|O_EXCL.  Remote: ``fs.create(path,
    overwrite=false)`` — atomic on HDFS; stores without this primitive
    fail here, which is the honest Delta-on-S3 story."""
    if fsutil.is_local(path):
        p = fsutil._strip_file_scheme(path)
        try:
            fd = os.open(p, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(text)
        return True
    fs, jpath, _ = fsutil._hadoop(fsutil._require_spark(spark, path), path)
    try:
        out = fs.create(jpath, False)
    except Exception:
        return False
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    return True


def _check_protocol(proto: dict) -> None:
    reader = int(proto.get("minReaderVersion", 1))
    if reader <= 1:
        return
    if reader == 2:
        # column mapping may be active; caught via metadata check below
        return
    feats = set(proto.get("readerFeatures") or [])
    unsupported = feats - _SUPPORTED_READER_FEATURES
    if unsupported:
        raise DeltaProtocolError(
            f"Delta reader features {sorted(unsupported)} not "
            "implemented (supported: "
            f"{sorted(_SUPPORTED_READER_FEATURES)})")


def _check_metadata(meta: dict) -> None:
    conf = meta.get("configuration") or {}
    mapping = conf.get("delta.columnMapping.mode", "none")
    if mapping not in ("none", ""):
        raise DeltaProtocolError(
            f"Delta column mapping mode {mapping!r} not implemented")
    if conf.get("delta.enableDeletionVectors", "false") == "true":
        raise DeltaProtocolError("Delta deletion vectors not implemented")


def _replay_json_commit(text: str, state: dict) -> None:
    """Apply one commit's actions to the replay state (spec: last
    metaData/protocol wins; add/remove reconcile by path)."""
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        action = json.loads(line)
        if "add" in action:
            a = action["add"]
            if a.get("deletionVector"):
                raise DeltaProtocolError(
                    "Delta deletion vectors not implemented")
            state["files"][a["path"]] = a
        elif "remove" in action:
            state["files"].pop(action["remove"]["path"], None)
        elif "metaData" in action:
            state["meta"] = action["metaData"]
        elif "protocol" in action:
            state["proto"] = action["protocol"]
        elif "txn" in action:
            t = action["txn"]
            app = t.get("appId")
            if app is not None:
                state["txns"][app] = max(
                    int(t.get("version", -1)),
                    int(state["txns"].get(app, -1)))
        # commitInfo / domainMetadata are informational for reads


def _load_checkpoint(spark: SparkSession, table: str,
                     version: int, parts: Optional[int]) -> dict:
    """Load replay state from a parquet checkpoint (single or
    multi-part)."""
    if parts:
        names = [
            f"{version:020d}.checkpoint.{i:010d}.{parts:010d}.parquet"
            for i in range(1, parts + 1)]
    else:
        names = [_checkpoint_name(version)]
    cp = spark.read.parquet(*[_log_path(table, n) for n in names])
    state = {"files": {}, "meta": None, "proto": None, "txns": {}}
    cols = set(cp.columns)
    if "protocol" in cols:
        for r in (cp.select("protocol.*")
                  .filter(F.col("protocol").isNotNull()
                          if "protocol" in cols else F.lit(True))
                  .collect()):
            d = {k: v for k, v in r.asDict(True).items() if v is not None}
            if d:
                state["proto"] = d
    if "metaData" in cols:
        for r in cp.filter(F.col("metaData.id").isNotNull()) \
                   .select("metaData.*").collect():
            state["meta"] = r.asDict(True)
    if "txn" in cols:
        for r in cp.filter(F.col("txn.appId").isNotNull()) \
                   .select("txn.appId", "txn.version").collect():
            state["txns"][r["appId"]] = max(
                int(r["version"]),
                int(state["txns"].get(r["appId"], -1)))
    add_rows = cp.filter(F.col("add.path").isNotNull()) \
                 .select("add.path", "add.partitionValues", "add.size") \
                 .collect()
    for r in add_rows:
        state["files"][r["path"]] = {
            "path": r["path"],
            "partitionValues": dict(r["partitionValues"] or {}),
            "size": r["size"],
        }
    return state


def delta_snapshot(spark: SparkSession, table: str, *,
                   version: Optional[int] = None) -> DeltaSnapshot:
    """Resolve a table snapshot from the log: newest eligible
    checkpoint (skipped entirely for time travel before it), then JSON
    commits through the target version.  O(log), never O(data)."""
    log_names = fsutil.list_dir(os.path.join(table, _LOG_DIR), spark)
    commits = {}
    cp_versions = set()
    for n in log_names:
        if n.endswith(".json") and n[:20].isdigit():
            commits[int(n[:20])] = n
        elif ".checkpoint." in n and n.endswith(".parquet") \
                and n[:20].isdigit():
            cp_versions.add(int(n[:20]))
    if not commits and not cp_versions:
        raise FileNotFoundError(f"not a Delta table (no commits): {table}")
    # a checkpoint-only log is valid: the spec allows cleaning JSON
    # commits at or below the newest checkpoint
    latest = max(set(commits) | cp_versions)
    target = latest if version is None else int(version)
    if target > latest:
        raise ValueError(
            f"version {target} not available (latest {latest})")

    # newest checkpoint at or below target, via _last_checkpoint hint
    # first, then the listing scan (hint can be stale/absent)
    cp_version, cp_parts = -1, None
    hint = fsutil.read_text(_log_path(table, _LAST_CHECKPOINT), spark)
    if hint:
        h = json.loads(hint)
        if int(h.get("version", -1)) <= target:
            cp_version = int(h["version"])
            cp_parts = h.get("parts")
    if cp_version < 0:
        eligible = [v for v in cp_versions if v <= target]
        if eligible:
            cp_version = max(eligible)

    if cp_version >= 0:
        state = _load_checkpoint(spark, table, cp_version, cp_parts)
        start = cp_version + 1
    else:
        if not commits or target < min(commits):
            raise ValueError(
                f"version {target} not reconstructable (no checkpoint "
                f"at or below it and the earliest commit is "
                f"{min(commits) if commits else 'absent'})")
        state = {"files": {}, "meta": None, "proto": None, "txns": {}}
        start = min(commits)

    for v in range(start, target + 1):
        if v not in commits:
            raise ValueError(
                f"log is missing commit {v} (vacuumed?); cannot "
                f"reconstruct version {target}")
        text = fsutil.read_text(_log_path(table, commits[v]), spark)
        if text is None:
            raise ValueError(f"unreadable commit {commits[v]}")
        _replay_json_commit(text, state)

    if state["meta"] is None:
        raise ValueError(f"no metaData action found in log: {table}")
    _check_protocol(state["proto"] or {})
    _check_metadata(state["meta"])
    schema = T.StructType.fromJson(
        json.loads(state["meta"]["schemaString"]))
    return DeltaSnapshot(
        path=table, version=target, schema=schema,
        partition_columns=list(state["meta"].get("partitionColumns")
                               or []),
        files=state["files"], protocol=state["proto"] or {},
        metadata=state["meta"], txns=dict(state.get("txns") or {}))


def _hive_consistent(adds: list, pcols: list) -> bool:
    """True when every add's relative path carries hive segments that
    EXACTLY match its log partitionValues for all partition columns —
    the precondition for the single-scan basePath fast path."""
    from urllib.parse import unquote
    for a in adds:
        pv = a.get("partitionValues") or {}
        segs = {}
        for seg in a["path"].split("/")[:-1]:
            if "=" in seg:
                k, v = seg.split("=", 1)
                segs[k] = unquote(v)
        for c in pcols:
            sv = segs.get(c)
            if sv is None:
                return False
            v = pv.get(c)
            if sv == _HIVE_NULL:
                if v is not None and v != _HIVE_NULL:
                    return False
            elif v is None or sv != str(v):
                return False
    return True


def _partition_expr(value: Optional[str], dtype: T.DataType):
    """A log partitionValue (string or null) as a typed literal column
    (spec: values are serialized strings; null encodes missing)."""
    if value is None or value == _HIVE_NULL:
        return F.lit(None).cast(dtype)
    return F.lit(value).cast(dtype)


def read_delta(spark: SparkSession, table: str, *,
               version: Optional[int] = None,
               partition_filter: Optional[dict] = None) -> DataFrame:
    """Read a Delta table snapshot as a DataFrame.

    ``partition_filter`` ({col: value-string}) prunes on the LOG's
    partitionValues before any data file is listed or opened — the
    I/O-bound guarantee partition pruning exists for.  Data columns
    come from the native parquet scan (schema enforced from
    ``schemaString``); partition columns are re-attached from the log,
    typed per the table schema, so tables whose data files omit
    partition columns (the Delta norm) read correctly.
    """
    snap = delta_snapshot(spark, table, version=version)
    fields = {f.name: f.dataType for f in snap.schema.fields}
    pcols = snap.partition_columns
    data_schema = T.StructType(
        [f for f in snap.schema.fields if f.name not in pcols])

    adds = list(snap.files.values())
    if partition_filter:
        unknown = set(partition_filter) - set(pcols)
        if unknown:
            raise ValueError(
                f"partition_filter keys {sorted(unknown)} are not "
                f"partition columns {pcols}")
        adds = [a for a in adds
                if all((a.get("partitionValues") or {}).get(k)
                       == str(v)
                       for k, v in partition_filter.items())]

    if not adds:
        return spark.createDataFrame([], snap.schema)

    # Fast path: when every add's path is hive-laid-out AND the dir
    # segments agree with the LOG's partitionValues (the log stays
    # authoritative — any disagreement falls back), one basePath scan
    # reads all files with partition columns inferred per the provided
    # schema.  This is the 10k-partition-safe shape: no per-partition
    # DataFrame unions in the driver plan.
    if pcols and _hive_consistent(adds, pcols):
        d = (spark.read.schema(snap.schema)
             .option("basePath", table)
             .parquet(*[os.path.join(table, a["path"]) for a in adds]))
        return d.select([f.name for f in snap.schema.fields])

    # group by partition tuple; each group is one parquet scan with the
    # log-typed partition literals attached
    groups: dict[tuple, list[str]] = {}
    pvals: dict[tuple, dict] = {}
    for a in adds:
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in pcols)
        groups.setdefault(key, []).append(
            os.path.join(table, a["path"]))
        pvals[key] = pv
    parts_df = []
    for key, paths in sorted(groups.items(),
                             key=lambda kv: tuple(map(repr, kv[0]))):
        d = spark.read.schema(data_schema).parquet(*paths)
        for c in pcols:
            d = d.withColumn(c, _partition_expr(pvals[key].get(c),
                                                fields[c]))
        parts_df.append(d.select([f.name for f in snap.schema.fields]))
    out = parts_df[0]
    for d in parts_df[1:]:
        out = out.unionByName(d)
    return out


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _schema_string(schema: T.StructType) -> str:
    return json.dumps(schema.jsonValue())


def _new_metadata(schema: T.StructType,
                  partition_by: Sequence[str]) -> dict:
    return {
        "id": str(uuid.uuid4()),
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(schema),
        "partitionColumns": list(partition_by),
        "configuration": {},
        "createdTime": None,
    }


def _stage_data_files(df: DataFrame, table: str,
                      partition_by: Sequence[str]) -> list[dict]:
    """Write df's parquet files into the table directory (hive layout
    when partitioned) and return their add actions.  Files land under
    unique names BEFORE the commit that references them — invisible to
    readers until the commit publishes (the Delta crash-safety story:
    orphaned data files are garbage, never corruption)."""
    spark = df.sparkSession
    staging = os.path.join(table, f"_staging_{uuid.uuid4().hex}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)

    adds = []
    sc = spark.sparkContext
    hadoop = sc._jvm.org.apache.hadoop.fs.Path
    fs_root = hadoop(staging).getFileSystem(sc._jsc.hadoopConfiguration())

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
                        pv[k] = None if v == _HIVE_NULL else v
                fname = f"part-{uuid.uuid4().hex}.snappy.parquet"
                dest_rel = (os.path.join(os.path.dirname(child_rel),
                                         fname)
                            if os.path.dirname(child_rel) else fname)
                dest = os.path.join(table, dest_rel)
                fsutil.ensure_dir(os.path.dirname(dest), spark)
                fsutil.rename(child, dest, spark)
                size = (os.path.getsize(
                            fsutil._strip_file_scheme(dest))
                        if fsutil.is_local(dest) else
                        fs_root.getFileStatus(hadoop(dest)).getLen())
                adds.append({
                    "path": dest_rel.replace(os.sep, "/"),
                    "partitionValues": pv,
                    "size": int(size),
                    "modificationTime": 0,
                    "dataChange": True,
                })
            elif "." not in name or "=" in name:
                _walk(child_rel)

    _walk("")
    fsutil.delete(staging, spark=spark)
    return adds


def write_delta(df: DataFrame, table: str, *, mode: str = "append",
                partition_by: Optional[Sequence[str]] = None,
                replace_where: Optional[dict] = None,
                txn_app_id: Optional[str] = None,
                txn_version: Optional[int] = None,
                max_retries: int = 10) -> int:
    """Write a DataFrame as a Delta commit; returns the version.

    ``mode='append'`` adds files (optimistically retried on commit
    races — a blind append composes with any concurrent commit).
    ``mode='overwrite'`` removes every live file first; with
    ``replace_where`` ({partition_col: value}) only that partition's
    files — the partition-scoped backfill idiom.  Overwrites do NOT
    retry through a race (the removed set would be stale) — they raise
    ``DeltaConcurrentWriteError`` for the caller to re-run.

    ``txn_app_id``/``txn_version`` ride the spec's ``txn`` action —
    the protocol's own idempotent-streaming mechanism: if the table
    has already recorded this app at a version >= ``txn_version``,
    the write is SKIPPED (current version returned), so a replayed
    micro-batch cannot double-append.  A crash between data staging
    and the commit leaves only orphan files (invisible; reclaimed by
    :func:`delta_vacuum`) and the replay commits exactly once.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if replace_where and mode != "overwrite":
        raise ValueError("replace_where requires mode='overwrite'")
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version go together")
    spark = df.sparkSession
    fsutil.ensure_dir(os.path.join(table, _LOG_DIR), spark)

    try:
        current = delta_snapshot(spark, table)
    except FileNotFoundError:
        current = None

    if current is not None and txn_app_id is not None \
            and int(current.txns.get(txn_app_id, -1)) \
            >= int(txn_version):
        return current.version  # idempotent replay: already committed

    if current is None:
        partition_by = list(partition_by or [])
        meta = _new_metadata(df.schema, partition_by)
        proto = {"minReaderVersion": 1, "minWriterVersion": 2}
        base_actions = [{"protocol": proto}, {"metaData": meta}]
        next_version = 0
    else:
        if partition_by is not None \
                and list(partition_by) != current.partition_columns:
            raise ValueError(
                f"partition_by {list(partition_by)} != table's "
                f"{current.partition_columns}")
        partition_by = current.partition_columns
        if [f.name for f in df.schema.fields] \
                != [f.name for f in current.schema.fields]:
            raise ValueError(
                "schema mismatch: write columns "
                f"{df.schema.fieldNames()} vs table "
                f"{current.schema.fieldNames()} (no evolution support)")
        base_actions = []
        next_version = current.version + 1

    adds = _stage_data_files(df, table, partition_by)

    for attempt in range(max_retries):
        removes = []
        if mode == "overwrite" and current is not None:
            victims = current.files.values()
            if replace_where:
                unknown = set(replace_where) - set(partition_by)
                if unknown:
                    raise ValueError(
                        f"replace_where keys {sorted(unknown)} are not "
                        f"partition columns {list(partition_by)}")
                victims = [
                    a for a in victims
                    if all((a.get("partitionValues") or {}).get(k)
                           == str(v) for k, v in replace_where.items())]
            removes = [{"remove": {"path": a["path"],
                                   "dataChange": True,
                                   "deletionTimestamp": 0}}
                       for a in victims]
        txn_actions = ([{"txn": {"appId": txn_app_id,
                                 "version": int(txn_version)}}]
                       if txn_app_id is not None else [])
        actions = (base_actions + txn_actions + removes
                   + [{"add": a} for a in adds]
                   + [{"commitInfo": {
                       "operation": ("WRITE" if mode == "append"
                                     else "OVERWRITE"),
                       "engineInfo": "wrangle_pypes_spark-delta",
                   }}])
        text = "\n".join(json.dumps(a, separators=(",", ":"))
                         for a in actions)
        commit_path = _log_path(table, _commit_name(next_version))
        if _create_exclusive(commit_path, text, spark):
            return next_version
        # lost the race
        if mode == "overwrite" or current is None:
            raise DeltaConcurrentWriteError(
                f"version {next_version} was committed concurrently; "
                "overwrite/create must re-read the table and re-run")
        current = delta_snapshot(spark, table)
        if txn_app_id is not None \
                and int(current.txns.get(txn_app_id, -1)) \
                >= int(txn_version):
            return current.version  # racer was our own replay twin
        next_version = current.version + 1
    raise DeltaConcurrentWriteError(
        f"gave up after {max_retries} commit races on {table}")


_CHECKPOINT_SCHEMA = T.StructType([
    T.StructField("txn", T.StructType([
        T.StructField("appId", T.StringType()),
        T.StructField("version", T.LongType()),
    ])),
    T.StructField("protocol", T.StructType([
        T.StructField("minReaderVersion", T.IntegerType()),
        T.StructField("minWriterVersion", T.IntegerType()),
    ])),
    T.StructField("metaData", T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("schemaString", T.StringType()),
        T.StructField("partitionColumns", T.ArrayType(T.StringType())),
        T.StructField("configuration",
                      T.MapType(T.StringType(), T.StringType())),
    ])),
    T.StructField("add", T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("partitionValues",
                      T.MapType(T.StringType(), T.StringType())),
        T.StructField("size", T.LongType()),
        T.StructField("dataChange", T.BooleanType()),
    ])),
])


def delta_checkpoint(spark: SparkSession, table: str) -> int:
    """Write a spec-shaped parquet checkpoint of the CURRENT version and
    publish ``_last_checkpoint``.  Readers then replay only later JSON
    commits — log replay cost stays O(commits since checkpoint)."""
    snap = delta_snapshot(spark, table)
    rows = [{"txn": None, "protocol": {
                "minReaderVersion":
                    int(snap.protocol.get("minReaderVersion", 1)),
                "minWriterVersion":
                    int(snap.protocol.get("minWriterVersion", 2))},
             "metaData": None, "add": None},
            {"txn": None, "protocol": None, "metaData": {
                "id": snap.metadata["id"],
                "schemaString": snap.metadata["schemaString"],
                "partitionColumns": snap.partition_columns,
                "configuration":
                    snap.metadata.get("configuration") or {}},
             "add": None}]
    for app, v in sorted(snap.txns.items()):
        rows.append({"txn": {"appId": app, "version": int(v)},
                     "protocol": None, "metaData": None, "add": None})
    for a in snap.files.values():
        rows.append({"txn": None, "protocol": None, "metaData": None,
                     "add": {
            "path": a["path"],
            "partitionValues": a.get("partitionValues") or {},
            "size": int(a.get("size") or 0),
            "dataChange": False}})
    cp_tmp = os.path.join(table, _LOG_DIR,
                          f"_cp_tmp_{uuid.uuid4().hex}")
    spark.createDataFrame(rows, _CHECKPOINT_SCHEMA) \
        .coalesce(1).write.mode("overwrite").parquet(cp_tmp)
    part = next(n for n in fsutil.list_dir(cp_tmp, spark)
                if n.endswith(".parquet"))
    fsutil.rename(os.path.join(cp_tmp, part),
                  _log_path(table, _checkpoint_name(snap.version)),
                  spark)
    fsutil.delete(cp_tmp, spark=spark)
    fsutil.write_text_atomic(
        _log_path(table, _LAST_CHECKPOINT),
        json.dumps({"version": snap.version, "size": len(rows)}),
        spark)
    return snap.version


def delta_history(spark: SparkSession, table: str) -> list[dict]:
    """Commit history, newest first (the DESCRIBE HISTORY surface):
    one dict per version with the commitInfo action (if any) plus
    add/remove counts.  Reads the log only."""
    log_names = fsutil.list_dir(os.path.join(table, _LOG_DIR), spark)
    out = []
    for n in sorted(log_names, reverse=True):
        if not (n.endswith(".json") and n[:20].isdigit()):
            continue
        text = fsutil.read_text(_log_path(table, n), spark) or ""
        info, n_add, n_remove = {}, 0, 0
        for line in text.splitlines():
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if "commitInfo" in action:
                info = action["commitInfo"]
            elif "add" in action:
                n_add += 1
            elif "remove" in action:
                n_remove += 1
        out.append({"version": int(n[:20]),
                    "operation": info.get("operation"),
                    "engineInfo": info.get("engineInfo"),
                    "n_added": n_add, "n_removed": n_remove})
    return out


def delta_vacuum(spark: SparkSession, table: str) -> int:
    """Delete data files not referenced by the CURRENT snapshot —
    removed-by-overwrite files and crash orphans from writes that
    never committed.  Returns the number of files deleted.

    Same contract as Delta's VACUUM with retention elapsed: time
    travel to versions whose files are dropped stops working (the log
    itself is kept, so history/metadata remain readable).  Walks the
    table's data directories; never touches ``_delta_log``."""
    snap = delta_snapshot(spark, table)
    live = {a["path"] for a in snap.files.values()}
    deleted = 0

    def _walk(rel: str) -> None:
        nonlocal deleted
        full = os.path.join(table, rel) if rel else table
        for name in fsutil.list_dir(full, spark):
            if name == _LOG_DIR:
                continue
            child_rel = (os.path.join(rel, name) if rel else name)
            child = os.path.join(table, child_rel)
            if name.endswith(".parquet"):
                if child_rel.replace(os.sep, "/") not in live:
                    fsutil.delete(child, spark=spark)
                    deleted += 1
            elif "=" in name or "." not in name:
                _walk(child_rel)

    _walk("")
    return deleted
