"""``delta_jarless`` — a Spark 4 PYTHON DATA SOURCE exposing the
jar-less Delta reader as a real format::

    spark.dataSource.register(DeltaJarlessDataSource)
    spark.read.format("delta_jarless").load("/path/to/table")
    spark.readStream.format("delta_jarless") \\
         .option("startingVersion", "0").load("/path/to/table")

Why: sources/delta.py's ``read_delta`` composes the NATIVE vectorized
parquet scan and is the right batch path; what it cannot provide is a
``readStream`` surface, because Structured Streaming sources must
implement the offset protocol.  Spark 4's Python Data Source API
(``pyspark.sql.datasource``) closes that: this module implements

- **batch read**: one input partition per live add file; workers read
  parquet via pyarrow, drop deletion-vector positions with a row-index
  mask, and attach typed partition values — a fully distributed scan
  with no JVM extension points.
- **streaming read**: the commit log IS the offset log.  Offsets are
  ``{"version": N}`` (all commits ≤ N consumed); ``latestOffset`` is
  the table head, ``partitions(start, end)`` parses exactly the JSON
  commits in ``(start, end]`` and emits one partition per added file,
  so each micro-batch reads precisely the new data — the same
  incremental contract delta-spark's streaming source has.  Non-append
  changes (remove actions, deletion-vector rewrites) raise unless
  ``ignoreChanges=true`` (again mirroring delta-spark), in which case
  DV-rewrite adds are SKIPPED (their rows were already emitted by the
  commit that first added the file).  ``maxFilesPerTrigger=N`` bounds
  each micro-batch: ``latestOffset`` admits commits (snapshots, for
  the Iceberg twin) only until N data files are in the batch, so a
  large backlog drains in bounded steps instead of one giant batch
  (delta-spark's admission-control semantics; the first batch after a
  checkpoint restart is unthrottled because the reader only learns
  the restart offset at ``partitions()``).

Workers have no SparkSession, so everything here reads the log and
data through plain file I/O + pyarrow; local/POSIX-visible paths are
the supported surface (the honest statement for a Python source).
Column-mapping tables gate loudly — use ``read_delta`` for those.

Scale: driver work is O(commits in the micro-batch) JSON parses;
reads parallelize per file.  Python/Arrow decode is slower per byte
than the JVM scan — stated tradeoff for the streaming capability.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_LOG_DIR = "_delta_log"


class DeltaSourceError(Exception):
    pass


def _log_dir(path: str) -> str:
    p = path[5:] if path.startswith("file:") else path
    while p.startswith("//"):
        p = p[1:]
    return os.path.join(p, _LOG_DIR)


def _table_root(path: str) -> str:
    p = path[5:] if path.startswith("file:") else path
    while p.startswith("//"):
        p = p[1:]
    return p


def _commit_versions(path: str) -> list[int]:
    d = _log_dir(path)
    if not os.path.isdir(d):
        raise DeltaSourceError(f"not a Delta table (no log): {path}")
    return sorted(int(n[:20]) for n in os.listdir(d)
                  if n.endswith(".json") and n[:20].isdigit())


def _commit_actions(path: str, version: int) -> list[dict]:
    p = os.path.join(_log_dir(path), f"{version:020d}.json")
    with open(p) as f:
        return [json.loads(line) for line in f
                if line.strip()]


def _latest_checkpoint_parts(log_dir: str) -> tuple[int, list[str]]:
    """(version, ALL part paths) of the newest checkpoint, or
    (-1, []).  Multi-part checkpoints
    (``NNN.checkpoint.K.of.M.parquet``) must be read whole — any
    single part holds only a slice of the add set."""
    by_version: dict[int, list[str]] = {}
    for n in os.listdir(log_dir):
        if ".checkpoint." in n and n.endswith(".parquet") \
                and n[:20].isdigit():
            by_version.setdefault(int(n[:20]), []).append(
                os.path.join(log_dir, n))
    if not by_version:
        return -1, []
    v = max(by_version)
    return v, sorted(by_version[v])


def _checkpoint_adds(log_dir: str, part_path: str):
    """Add actions of one checkpoint file, following V2 sidecar
    pointers (where the file actions actually live) when present."""
    import pyarrow.parquet as pq
    pf = pq.ParquetFile(part_path)
    names = set(pf.schema_arrow.names)
    srcs = [part_path]
    if "sidecar" in names:
        t = pq.read_table(part_path, columns=["sidecar"])
        for row in t.to_pylist():
            sc = row.get("sidecar")
            if sc and sc.get("path"):
                p = sc["path"]
                if "://" not in p and not os.path.isabs(p):
                    p = os.path.join(log_dir, "_sidecars", p)
                srcs.append(p)
    for src in srcs:
        spf = pq.ParquetFile(src)
        if "add" not in set(spf.schema_arrow.names):
            continue
        for row in pq.read_table(src, columns=["add"]).to_pylist():
            a = row.get("add")
            if a and a.get("path"):
                yield a


def _resolve_meta(path: str) -> dict:
    """Last metaData action — newest JSON commit that carries one,
    else the newest checkpoint's metaData rows (pyarrow, every
    part)."""
    versions = _commit_versions(path)
    for v in reversed(versions):
        for a in _commit_actions(path, v):
            if "metaData" in a:
                return a["metaData"]
    _, parts = _latest_checkpoint_parts(_log_dir(path))
    if parts:
        import pyarrow.parquet as pq
        for part in parts:
            pf = pq.ParquetFile(part)
            if "metaData" not in set(pf.schema_arrow.names):
                continue
            t = pq.read_table(part, columns=["metaData"])
            for row in t.to_pylist():
                m = row.get("metaData")
                if m and m.get("id"):
                    return m
    raise DeltaSourceError(f"no metaData action found: {path}")


def _schema_of(meta: dict) -> T.StructType:
    conf = meta.get("configuration") or {}
    if (conf.get("delta.columnMapping.mode") or "none") \
            not in ("none", ""):
        raise DeltaSourceError(
            "delta_jarless does not support column-mapping tables — "
            "use wrangle_pypes_spark.sources.read_delta")
    return T.StructType.fromJson(json.loads(meta["schemaString"]))


def _pv_to_python(value: Optional[str], dtype: T.DataType):
    """A log partitionValue string as the python value pyarrow needs
    for a typed constant column."""
    import datetime as _dt
    if value is None or value == "__HIVE_DEFAULT_PARTITION__":
        return None
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType,
                          T.ByteType)):
        return int(value)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return float(value)
    if isinstance(dtype, T.BooleanType):
        return value == "true"
    if isinstance(dtype, T.DateType):
        return _dt.date.fromisoformat(value[:10])
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return _dt.datetime.fromisoformat(value)
    return value


def _read_add_rows(table_root: str, payload: dict,
                   schema: T.StructType) -> Iterator[tuple]:
    """Worker-side read of ONE add file: pyarrow parquet scan, DV
    position mask, typed partition constants, schema-ordered
    tuples."""
    import numpy as np
    import pyarrow.parquet as pq

    fpath = os.path.join(table_root, payload["path"])
    tbl = pq.read_table(fpath)
    n = tbl.num_rows
    if payload.get("dv"):
        from . import dv as _dv
        positions = _dv.decode_descriptor(payload["dv"], table_root)
        mask = np.ones(n, dtype=bool)
        mask[positions[positions < n]] = False
        tbl = tbl.filter(mask)
    cols = {}
    pv = payload.get("pv") or {}
    for f in schema.fields:
        if f.name in tbl.column_names:
            cols[f.name] = tbl.column(f.name).to_pylist()
        else:
            cols[f.name] = [
                _pv_to_python(pv.get(f.name), f.dataType)
            ] * tbl.num_rows
    names = [f.name for f in schema.fields]
    for i in range(tbl.num_rows):
        yield tuple(cols[c][i] for c in names)


def _dv_payload(a: dict) -> Optional[dict]:
    dvd = a.get("deletionVector")
    if not dvd:
        return None
    return {"storageType": dvd.get("storageType"),
            "pathOrInlineDv": dvd.get("pathOrInlineDv"),
            "offset": dvd.get("offset"),
            "sizeInBytes": dvd.get("sizeInBytes"),
            "cardinality": dvd.get("cardinality")}


class _BatchReader(DataSourceReader):
    def __init__(self, path: str, schema: T.StructType):
        self._root = _table_root(path)
        self._schema = schema
        # resolve the live file set by replaying JSON commits (plus
        # checkpoint adds) driver-side — pure file I/O, no session
        files: dict[str, dict] = {}
        d = _log_dir(self._root)
        cpv, parts = _latest_checkpoint_parts(d)
        start = 0
        if parts:
            for part in parts:  # EVERY part — adds are sliced across
                for a in _checkpoint_adds(d, part):
                    files[a["path"]] = a
            start = cpv + 1
        for v in _commit_versions(self._root):
            if v < start:
                continue
            for action in _commit_actions(self._root, v):
                if "add" in action:
                    files[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    files.pop(action["remove"]["path"], None)
        self._files = list(files.values())

    def partitions(self):
        return [InputPartition({
            "path": a["path"],
            "pv": dict(a.get("partitionValues") or {}),
            "dv": _dv_payload(a)}) for a in self._files]

    def read(self, partition) -> Iterator[tuple]:
        yield from _read_add_rows(self._root, partition.value,
                                  self._schema)


def _opt(options: dict, name: str):
    """Spark stores data source options with case-insensitive
    (lowercased) keys — accept either spelling."""
    if name in options:
        return options[name]
    return options.get(name.lower())


class _StreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema: T.StructType,
                 options: dict):
        self._root = _table_root(path)
        self._schema = schema
        self._ignore_changes = str(
            _opt(options, "ignoreChanges") or "false").lower() \
            == "true"
        sv = _opt(options, "startingVersion")
        self._starting = int(sv) if sv is not None else None
        mft = _opt(options, "maxFilesPerTrigger")
        self._max_files = int(mft) if mft is not None else None
        if self._max_files is not None and self._max_files < 1:
            raise DeltaSourceError("maxFilesPerTrigger must be >= 1")
        # the version through which batches have been planned — lets
        # latestOffset admit a BOUNDED slice of the backlog per
        # trigger (delta-spark's maxFilesPerTrigger admission
        # control).  None until the first initialOffset/partitions
        # call; after a checkpoint restart the first batch is
        # unthrottled (we don't see the checkpointed offset until
        # partitions()), every later one is capped.
        self._planned = None

    def initialOffset(self) -> dict:
        if self._starting is not None:
            self._planned = self._starting - 1
            return {"version": self._starting - 1}
        # default: start from the current head (new data only), the
        # delta-spark streaming default
        versions = _commit_versions(self._root)
        head = versions[-1] if versions else -1
        self._planned = head
        return {"version": head}

    def latestOffset(self) -> dict:
        versions = _commit_versions(self._root)
        head = versions[-1] if versions else -1
        planned = self._planned
        if planned is None and self._starting is not None:
            # latestOffset can run before initialOffset — a
            # configured start still lets the FIRST batch throttle
            planned = self._starting - 1
        if self._max_files is None or planned is None \
                or head <= planned:
            return {"version": head}
        # admit commits until the data-file budget is spent
        admitted = planned
        budget = self._max_files
        for v in versions:
            if v <= planned:
                continue
            n_adds = sum(
                1 for a in _commit_actions(self._root, v)
                if "add" in a and a["add"].get("dataChange", True))
            admitted = v
            budget -= n_adds
            if budget <= 0:
                break
        return {"version": admitted}

    def partitions(self, start: dict, end: dict):
        self._planned = int(end["version"])
        return self._partitions(start, end)

    def _partitions(self, start: dict, end: dict):
        out = []
        for v in _commit_versions(self._root):
            if not (int(start["version"]) < v <= int(end["version"])):
                continue
            actions = _commit_actions(self._root, v)
            removes = {a["remove"]["path"] for a in actions
                       if "remove" in a
                       and a["remove"].get("dataChange", True)}
            for a in actions:
                if "add" not in a \
                        or not a["add"].get("dataChange", True):
                    continue
                add = a["add"]
                is_dv_rewrite = (add.get("deletionVector")
                                 and add["path"] in removes)
                if removes and not self._ignore_changes:
                    raise DeltaSourceError(
                        f"commit {v} contains non-append changes; "
                        "set ignoreChanges=true to skip them "
                        "(delta streaming-source semantics)")
                if is_dv_rewrite:
                    continue  # rows already emitted by the first add
                out.append(InputPartition({
                    "path": add["path"],
                    "pv": dict(add.get("partitionValues") or {}),
                    "dv": _dv_payload(add)}))
            if removes and not self._ignore_changes:
                raise DeltaSourceError(
                    f"commit {v} contains non-append changes; set "
                    "ignoreChanges=true to skip them")
        return out

    def read(self, partition) -> Iterator[tuple]:
        yield from _read_add_rows(self._root, partition.value,
                                  self._schema)

    def commit(self, end: dict) -> None:
        pass  # the checkpoint holds the offset; nothing to clean


class DeltaJarlessDataSource(DataSource):
    """The registrable format class (see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "delta_jarless"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise DeltaSourceError(
                "delta_jarless requires a path: .load('/table')")
        return p

    def schema(self):
        return _schema_of(_resolve_meta(self._path()))

    def reader(self, schema) -> DataSourceReader:
        return _BatchReader(self._path(), schema)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _StreamReader(self._path(), schema, dict(self.options))


# ---------------------------------------------------------------------------
# iceberg_jarless — the Iceberg twin (batch + streaming by snapshot)
# ---------------------------------------------------------------------------

def _ice_meta(path: str) -> dict:
    root = _table_root(path)
    mdir = os.path.join(root, "metadata")
    if not os.path.isdir(mdir):
        raise DeltaSourceError(f"not an Iceberg table: {path}")
    hint = os.path.join(mdir, "version-hint.text")
    name = None
    if os.path.exists(hint):
        with open(hint) as f:
            cand = f"v{f.read().strip()}.metadata.json"
        if os.path.exists(os.path.join(mdir, cand)):
            name = cand
    if name is None:
        import re as _re
        best, best_v = None, -1
        for n in os.listdir(mdir):
            if not n.endswith(".metadata.json"):
                continue
            m = _re.match(r"^v?(\d+)", n)
            v = int(m.group(1)) if m else 0
            if v > best_v:
                best, best_v = n, v
        name = best
    if name is None:
        raise DeltaSourceError(f"no metadata json under {path}")
    with open(os.path.join(mdir, name)) as f:
        return json.load(f)


def _ice_added_count(root: str, snap: dict) -> int:
    """Added DATA files of one snapshot when its summary is silent:
    the manifest-list's added-files counts when recorded, else a
    decode of the added manifests counting status==1 data entries —
    metadata-scale either way, never a guess of 1."""
    from .avro_io import read_container_file
    from .iceberg import _normalize_path
    sid = int(snap["snapshot-id"])
    _, ml_entries = read_container_file(
        _normalize_path(snap["manifest-list"], root))
    total = 0
    for ent in ml_entries:
        if int(ent.get("added_snapshot_id") or -1) != sid:
            continue
        if int(ent.get("content") or 0) != 0:
            continue  # delete manifests add no data files
        n = ent.get("added_data_files_count")
        if n is None:
            n = ent.get("added_files_count")
        if n is not None:
            total += int(n)
            continue
        _, entries = read_container_file(
            _normalize_path(ent["manifest_path"], root))
        total += sum(
            1 for e in entries
            if int(e.get("status") or 0) == 1
            and int((e.get("data_file") or {})
                    .get("content") or 0) == 0)
    return total


def _ice_added_partitions(root: str, meta: dict,
                          snap_ids: list[int],
                          ignore_changes: bool) -> list:
    """InputPartitions for the data files ADDED by the given
    snapshots (manifest-list entries keyed by added_snapshot_id,
    entry status == 1), driver-side via the pure-Python Avro codec."""
    from .avro_io import read_container_file
    from .iceberg import _normalize_path, _schema_from_metadata
    _, by_id = _schema_from_metadata(meta)
    specs = {s["spec-id"]: s["fields"]
             for s in meta.get("partition-specs", [])}
    snaps = {int(s["snapshot-id"]): s
             for s in meta.get("snapshots", [])}
    out = []
    for sid in snap_ids:
        snap = snaps[sid]
        ml_path = _normalize_path(snap["manifest-list"], root)
        _, ml_entries = read_container_file(ml_path)
        for ent in ml_entries:
            if int(ent.get("added_snapshot_id") or -1) != sid:
                continue
            if int(ent.get("content") or 0) != 0:
                if ignore_changes:
                    continue
                raise DeltaSourceError(
                    f"snapshot {sid} adds DELETE files; "
                    "iceberg_jarless streams appends only — set "
                    "ignoreChanges=true to skip, or use read_iceberg")
            m_path = _normalize_path(ent["manifest_path"], root)
            _, entries = read_container_file(m_path)
            spec = specs.get(
                int(ent.get("partition_spec_id") or 0), [])
            ident = {f["name"] for f in spec
                     if f.get("transform", "identity") == "identity"}
            for e in entries:
                if int(e.get("status") or 0) != 1:  # ADDED only
                    continue
                df_rec = e["data_file"]
                if int(df_rec.get("content") or 0) != 0:
                    if ignore_changes:
                        continue
                    raise DeltaSourceError(
                        f"snapshot {sid} contains delete files; set "
                        "ignoreChanges=true or use read_iceberg")
                pv = {k: v
                      for k, v in (df_rec.get("partition")
                                   or {}).items()
                      if k in ident}
                out.append(InputPartition({
                    "abs_path": _normalize_path(
                        df_rec["file_path"], root),
                    "pv": pv}))
    return out


def _ice_read_rows(payload: dict,
                   schema: T.StructType) -> Iterator[tuple]:
    import pyarrow.parquet as pq
    tbl = pq.read_table(payload["abs_path"])
    pv = payload.get("pv") or {}
    cols = {}
    for f in schema.fields:
        if f.name in tbl.column_names:
            cols[f.name] = tbl.column(f.name).to_pylist()
        else:
            v = pv.get(f.name)
            if isinstance(v, str) and v != "":
                v = _pv_to_python(v, f.dataType)
            cols[f.name] = [v] * tbl.num_rows
    names = [f.name for f in schema.fields]
    for i in range(tbl.num_rows):
        yield tuple(cols[c][i] for c in names)


class _IceBatchReader(DataSourceReader):
    def __init__(self, path: str, schema: T.StructType):
        self._root = _table_root(path)
        self._schema = schema
        meta = _ice_meta(path)
        cur = meta.get("current-snapshot-id")
        if cur is None or int(cur) == -1:
            self._parts = []
            return
        snaps = {int(s["snapshot-id"]): s
                 for s in meta.get("snapshots", [])}
        # live file set = every manifest of the CURRENT snapshot's
        # manifest list, existing+added entries; delete files gate
        from .avro_io import read_container_file
        from .iceberg import _normalize_path, _schema_from_metadata
        specs = {s["spec-id"]: s["fields"]
                 for s in meta.get("partition-specs", [])}
        snap = snaps[int(cur)]
        _, ml_entries = read_container_file(
            _normalize_path(snap["manifest-list"], self._root))
        parts = []
        for ent in ml_entries:
            if int(ent.get("content") or 0) != 0:
                raise DeltaSourceError(
                    "iceberg_jarless batch does not support "
                    "merge-on-read delete files — use read_iceberg")
            _, entries = read_container_file(_normalize_path(
                ent["manifest_path"], self._root))
            spec = specs.get(
                int(ent.get("partition_spec_id") or 0), [])
            ident = {f["name"] for f in spec
                     if f.get("transform", "identity") == "identity"}
            for e in entries:
                if int(e.get("status") or 0) == 2:  # DELETED
                    continue
                df_rec = e["data_file"]
                if int(df_rec.get("content") or 0) != 0:
                    raise DeltaSourceError(
                        "iceberg_jarless batch does not support "
                        "delete files — use read_iceberg")
                pv = {k: v for k, v in (df_rec.get("partition")
                                        or {}).items() if k in ident}
                parts.append(InputPartition({
                    "abs_path": _normalize_path(df_rec["file_path"],
                                                self._root),
                    "pv": pv}))
        self._parts = parts

    def partitions(self):
        return self._parts

    def read(self, partition) -> Iterator[tuple]:
        yield from _ice_read_rows(partition.value, self._schema)


class _IceStreamReader(DataSourceStreamReader):
    """Offsets are the table's monotonic SEQUENCE NUMBERS: an offset
    ``{"seq": N}`` means every snapshot with sequence-number ≤ N is
    consumed; each micro-batch emits the data files ADDED by the
    snapshots in ``(start, end]``."""

    def __init__(self, path: str, schema: T.StructType,
                 options: dict):
        self._path = path
        self._root = _table_root(path)
        self._schema = schema
        self._ignore_changes = str(
            _opt(options, "ignoreChanges") or "false").lower() \
            == "true"
        from_start = str(
            _opt(options, "fromStart") or "false").lower() == "true"
        self._initial_seq = -1 if from_start else None
        mft = _opt(options, "maxFilesPerTrigger")
        self._max_files = int(mft) if mft is not None else None
        if self._max_files is not None and self._max_files < 1:
            raise DeltaSourceError("maxFilesPerTrigger must be >= 1")
        self._planned = None  # see _StreamReader._planned

    def initialOffset(self) -> dict:
        if self._initial_seq is not None:
            self._planned = self._initial_seq
            return {"seq": self._initial_seq}
        off = self._head_offset()
        self._planned = off["seq"]
        return off

    def _head_offset(self) -> dict:
        meta = _ice_meta(self._path)
        seqs = [int(s.get("sequence-number") or 0)
                for s in meta.get("snapshots", [])]
        return {"seq": max(seqs) if seqs else -1}

    def latestOffset(self) -> dict:
        planned = self._planned
        if planned is None and self._initial_seq is not None:
            planned = self._initial_seq  # latestOffset before init
        if self._max_files is None or planned is None:
            return self._head_offset()
        meta = _ice_meta(self._path)
        snaps = sorted(meta.get("snapshots", []),
                       key=lambda s: int(
                           s.get("sequence-number") or 0))
        admitted = planned
        budget = self._max_files
        for s in snaps:
            seq = int(s.get("sequence-number") or 0)
            if seq <= planned:
                continue
            # summaries carry added-data-files (our writer records
            # it); when a FOREIGN writer omitted the summary, count
            # the snapshot's data-file manifest entries instead of
            # assuming 1 — a many-file snapshot admitted as "one
            # file" would blow the trigger budget arbitrarily.  An
            # explicit '0' is 0 (metadata-only snapshot rides free).
            if (s.get("summary") or {}).get("operation") == "replace":
                n = 0  # compaction: no logical rows, rides free
            else:
                raw = (s.get("summary") or {}).get("added-data-files")
                n = (int(raw) if raw is not None
                     else _ice_added_count(self._root, s))
            admitted = seq
            budget -= n
            if budget <= 0:
                break
        return {"seq": admitted}

    def partitions(self, start: dict, end: dict):
        self._planned = int(end["seq"])
        meta = _ice_meta(self._path)
        sids = [int(s["snapshot-id"])
                for s in sorted(meta.get("snapshots", []),
                                key=lambda s: int(
                                    s.get("sequence-number") or 0))
                if int(start["seq"])
                < int(s.get("sequence-number") or 0)
                <= int(end["seq"])
                # replace = compaction: the rewritten files carry no
                # new logical rows — re-emitting them would duplicate
                and (s.get("summary") or {}).get("operation")
                != "replace"]
        return _ice_added_partitions(self._root, meta, sids,
                                     self._ignore_changes)

    def read(self, partition) -> Iterator[tuple]:
        yield from _ice_read_rows(partition.value, self._schema)

    def commit(self, end: dict) -> None:
        pass


class IcebergJarlessDataSource(DataSource):
    """``iceberg_jarless`` — the registrable Iceberg format: batch
    scans of append-only tables and a streaming source whose offset
    log is the snapshot sequence (see ``_IceStreamReader``).
    Merge-on-read tables belong to ``read_iceberg``."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_jarless"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise DeltaSourceError(
                "iceberg_jarless requires a path: .load('/table')")
        return p

    def schema(self):
        from .iceberg import _schema_from_metadata
        s, _ = _schema_from_metadata(_ice_meta(self._path()))
        return s

    def reader(self, schema) -> DataSourceReader:
        return _IceBatchReader(self._path(), schema)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _IceStreamReader(self._path(), schema,
                                dict(self.options))
