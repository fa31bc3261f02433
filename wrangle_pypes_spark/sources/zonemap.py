"""Zone-map clustered tables: file-level data skipping on plain parquet.

The repo's other layouts prune by KEY (the manifest store's hash
buckets) or by partition VALUE (the partitioned manifest store) —
neither helps a RANGE predicate over an ordered column, because hash
bucketing deliberately destroys value locality.  This module is the
third layout: rows are range-clustered by the cluster columns (linear
``repartitionByRange`` for one column, Z-order interleaving via
:func:`~wrangle_pypes_spark.operators.relational.zorder_col` for
several), written as parquet, and a JSON sidecar records per-FILE
min/max/null stats for the stats columns:

```
table/
  _zonemap.json      {"cluster_by": [...], "schema": ...,
                      "files": {"part-...parquet":
                                {"rows": N,
                                 "stats": {"col": {"min": .., "max": ..,
                                                   "nulls": N}}}}}
  part-*.parquet     range-clustered data files
```

A read with a range/equality predicate prunes the file list DRIVER-side
against the sidecar (cost: one tiny JSON read — no file listing, no
footer fetches), hands Spark only the surviving files, and re-applies
the predicate exactly, so pruning is a pure I/O optimization and the
result is identical to a full scan + filter.  At 100 TB this is the
difference between "scan the table" and "scan the week you asked for":
a predicate selecting f of the cluster-column's range reads ~f of the
files (+1 boundary file per edge).  Parquet's own row-group stats give
the same skip INSIDE a file; the sidecar avoids opening the other
files' footers at all — the same division of labour as Delta/Iceberg
file stats over parquet row groups.

Zone maps only pay for themselves when the layout correlates with the
predicate column — that is exactly what :func:`zonemap_write` enforces
by clustering before writing.  Pruning on a NON-cluster stats column
still works but degrades toward "keep everything" as that column
decorrelates from the layout; ``zonemap_files`` measures the actual
skip rate so callers can verify their layout serves their queries.

This is a WRITE-ONCE snapshot layout (like training shards), not an
incremental store: re-cluster by rewriting (the table-format
``OPTIMIZE`` cadence).  For incremental keyed state use the manifest
store; for value-partitioned state the pmanifest store.

Reference analog: none — the reference (pipeline.py:33) holds data in
caller-provided dict stores; clustered layouts are a scale concern its
record-at-a-time model never meets.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
from typing import Mapping, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsutil
from ..localdf import local_df

_SIDECAR = "_zonemap.json"
_ZV = "_zm_zorder"  # transient cluster column for the multi-column path
_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"  # fixed width -> lexicographic == chrono

# stats are recorded only for orderable ATOMIC types whose min/max
# survive a JSON round-trip exactly; everything else must be excluded
# from stats_cols (cluster_by additionally requires these types)
_STATS_TYPES = ("tinyint", "smallint", "int", "bigint", "float",
                "double", "string", "date", "timestamp",
                "timestamp_ntz")


def _join(path: str, rel: str) -> str:
    return path.rstrip("/") + "/" + rel


def _type_name(df: DataFrame, col: str) -> str:
    t = dict(df.dtypes)[col]
    return "decimal" if t.startswith("decimal") else t


def _to_json(v, type_name: str):
    """One JSON-safe, ORDER-preserving encoding per supported type:
    numerics stay numbers, strings stay strings, date/timestamp become
    fixed-width ISO strings (lexicographic order == chronological),
    decimals become exact digit strings (compared as Decimal again on
    the prune side)."""
    if v is None:
        return None
    if type_name == "date":
        return v.isoformat()
    if type_name in ("timestamp", "timestamp_ntz"):
        return v.strftime(_TS_FMT)
    if type_name == "decimal":
        return str(v)
    return v


def _bound(v, type_name: str):
    """Coerce a caller-supplied predicate bound (or a sidecar value)
    into the comparison domain of :func:`_to_json`."""
    if v is None:
        return None
    if type_name == "date":
        if isinstance(v, _dt.datetime):
            v = v.date()
        return v.isoformat() if isinstance(v, _dt.date) else str(v)
    if type_name in ("timestamp", "timestamp_ntz"):
        if isinstance(v, _dt.datetime):
            return v.strftime(_TS_FMT)
        # "YYYY-MM-DD[ HH:MM[:SS[.ffffff]]]" -> fixed width
        s = str(v)
        pad = "0001-01-01 00:00:00.000000"
        return s + pad[len(s):] if len(s) < len(pad) else s
    if type_name == "decimal":
        return _decimal.Decimal(str(v))
    return v


def zonemap_write(df: DataFrame, path: str, *,
                  cluster_by: Sequence[str],
                  stats_cols: Optional[Sequence[str]] = None,
                  target_files: int = 32, zorder_bits: int = 16,
                  mode: str = "errorifexists",
                  epoch_id: int = -1,
                  compression: str = "zstd") -> int:
    """Write ``df`` range-clustered by ``cluster_by`` with a per-file
    min/max sidecar; returns the number of data files written.

    One cluster column: ``repartitionByRange`` + in-file sort — files
    tile the column's value range, so a range predicate touches the
    overlapping files only.  Several: a Z-order (Morton) value is
    interleaved from the columns and the table is range-clustered by
    it — every listed column keeps locality, so min/max prunes
    multi-dimensional predicates (the Delta ``OPTIMIZE ZORDER BY``
    layout).

    ``stats_cols`` (default: ``cluster_by``) may add non-cluster
    columns; their stats are recorded but prune well only as far as
    they correlate with the layout.  Stats require orderable atomic
    types; anything else raises.  Cost beyond the write itself: ONE
    column-pruned scan of the written files computing all stats in a
    single aggregate — no per-file jobs, no footer reads.
    """
    cluster = list(cluster_by)
    if not cluster:
        raise ValueError("cluster_by must be non-empty")
    stats = list(stats_cols) if stats_cols is not None else list(cluster)
    for c in dict.fromkeys(cluster + stats):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame "
                             f"(has {df.columns})")
        t = _type_name(df, c)
        if t not in _STATS_TYPES and t != "decimal":
            raise ValueError(
                f"column {c!r} has type {t!r} — zone-map stats need an "
                f"orderable atomic type ({', '.join(_STATS_TYPES)}, "
                "decimal)")
    if len(cluster) > 1:
        numeric = ("tinyint", "smallint", "int", "bigint", "float",
                   "double", "decimal")
        bad = [c for c in cluster if _type_name(df, c) not in numeric]
        if bad:
            raise ValueError(
                f"multi-column clustering Z-orders the columns, which "
                f"needs numeric types; {bad} are not (pre-encode "
                "strings/dates, e.g. unix_date / xxhash64)")
    if _ZV in df.columns:
        raise ValueError(f"{_ZV!r} is reserved for the Z-order layout")
    if target_files < 1:
        raise ValueError("target_files must be >= 1")
    if mode not in ("errorifexists", "overwrite"):
        raise ValueError(f"mode {mode!r}: use 'errorifexists' or "
                         "'overwrite'")

    spark = df.sparkSession
    if mode == "overwrite":
        fsutil.delete(path, spark=spark)

    if len(cluster) == 1:
        clustered = (df.repartitionByRange(target_files, cluster[0])
                       .sortWithinPartitions(cluster[0]))
    else:
        from ..operators.relational import zorder_col
        clustered = (zorder_col(df, cluster, bits=zorder_bits,
                                out_col=_ZV)
                     .repartitionByRange(target_files, _ZV)
                     .sortWithinPartitions(_ZV)
                     .drop(_ZV))
    (clustered.write.mode("errorifexists")
     .option("compression", compression).parquet(path))

    # per-file stats: ONE job over the written files, reading only the
    # stats columns (column-pruned scan), attributed via the file name
    schema_json = df.schema.jsonValue()
    types = {c: _type_name(df, c) for c in stats}
    written = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for i, c in enumerate(stats):
        aggs += [F.min(c).alias(f"_lo{i}"), F.max(c).alias(f"_hi{i}"),
                 F.sum(F.col(c).isNull().cast("long")).alias(f"_nl{i}")]
    per_file = (written
                .groupBy(F.element_at(F.split(F.input_file_name(), "/"),
                                      -1).alias("_file"))
                .agg(*aggs).collect())
    files = {}
    for r in per_file:
        files[r["_file"]] = {
            "rows": int(r["_rows"]),
            "stats": {c: {"min": _to_json(r[f"_lo{i}"], types[c]),
                          "max": _to_json(r[f"_hi{i}"], types[c]),
                          "nulls": int(r[f"_nl{i}"])}
                      for i, c in enumerate(stats)}}
    fsutil.write_text_atomic(
        _join(path, _SIDECAR),
        json.dumps({"version": 1, "cluster_by": cluster,
                    "stats_cols": stats, "types": types,
                    "epoch": int(epoch_id),
                    "schema": schema_json, "files": files},
                   sort_keys=True),
        spark=spark)
    return len(files)


def _load_sidecar(path: str, spark=None) -> dict:
    txt = fsutil.read_text(_join(path, _SIDECAR), spark=spark)
    if txt is None:
        raise FileNotFoundError(
            f"{path!r} has no {_SIDECAR} — not a zonemap table "
            "(write it with zonemap_write)")
    return json.loads(txt)


def _normalize_preds(side: dict,
                     between: Optional[Mapping] = None,
                     eq: Optional[Mapping] = None) -> dict:
    """-> {col: (lo, hi)} in the sidecar's comparison domain; either
    bound may be None (open)."""
    preds = {}
    for col, (lo, hi) in (between or {}).items():
        preds[col] = (lo, hi)
    for col, v in (eq or {}).items():
        if col in preds:
            raise ValueError(f"column {col!r} in both between= and eq=")
        preds[col] = (v, v)
    out = {}
    for col, (lo, hi) in preds.items():
        if col not in side["stats_cols"]:
            raise ValueError(
                f"no zone-map stats for column {col!r} (stats cover "
                f"{side['stats_cols']}); re-write with stats_cols=")
        t = side["types"][col]
        out[col] = (_bound(lo, t), _bound(hi, t))
    return out


def zonemap_files(path: str, *, between: Optional[Mapping] = None,
                  eq: Optional[Mapping] = None,
                  spark=None) -> Tuple[list, int]:
    """(surviving file names, total file count) for the predicates —
    the measurement half: ``1 - len(kept)/total`` is the skip rate a
    layout actually delivers for a query shape.  Driver cost: one JSON
    read; no file listing, no Spark job."""
    side = _load_sidecar(path, spark=spark)
    preds = _normalize_preds(side, between, eq)
    kept = []
    for fname, meta in sorted(side["files"].items()):
        ok = True
        for col, (lo, hi) in preds.items():
            st = meta["stats"][col]
            t = side["types"][col]
            mn, mx = _bound(st["min"], t), _bound(st["max"], t)
            if mn is None:  # every value in this file is NULL:
                ok = False  # no range/eq predicate can match
                break
            if (lo is not None and lo > mx) or \
                    (hi is not None and hi < mn):
                ok = False
                break
        if ok:
            kept.append(fname)
    return kept, len(side["files"])


def zonemap_read(spark: SparkSession, path: str, *,
                 between: Optional[Mapping] = None,
                 eq: Optional[Mapping] = None) -> DataFrame:
    """Read the table with file-level skipping: prune the file list
    against the sidecar, scan only the survivors under the recorded
    schema, and re-apply the predicates exactly.  Identical rows to a
    full scan + filter — pruning is purely an I/O win.  ``between``
    maps column -> (lo, hi) (either side None = open, bounds
    inclusive, SQL BETWEEN semantics); ``eq`` maps column -> value.
    No predicates = plain full read."""
    from pyspark.sql import types as T

    side = _load_sidecar(path, spark=spark)
    schema = T.StructType.fromJson(side["schema"])
    kept, _total = zonemap_files(path, between=between, eq=eq,
                                 spark=spark)
    if not kept:
        return local_df(spark, [], schema)
    df = spark.read.schema(schema).parquet(
        *[_join(path, f) for f in kept])
    for col, (lo, hi) in (between or {}).items():
        if lo is not None and hi is not None:
            df = df.filter(F.col(col).between(F.lit(lo), F.lit(hi)))
        elif lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        elif hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
    for col, v in (eq or {}).items():
        df = df.filter(F.col(col) == F.lit(v))
    return df


def zonemap_append(df: DataFrame, path: str, *,
                   target_files: int = 4,
                   epoch_id: int = -1,
                   evolve_schema: bool = False,
                   compression: str = "zstd") -> int:
    """Append a batch to an existing zonemap table: the BATCH is
    clustered by the table's recorded cluster columns and written as
    new files whose stats join the sidecar — reads stay exact and
    still prune, but global clustering DECAYS (each append tiles its
    own value range, so ranges now overlap across appends).  Measure
    the decay with :func:`zonemap_overlap` and restore it with
    :func:`zonemap_compact` — the append → measure → OPTIMIZE
    lifecycle of any clustered table format.  Returns the number of
    files appended.  Single-writer by contract (the sidecar is
    read-modify-write).

    ``evolve_schema=True`` allows ADDITIVE widening (the manifest
    store's contract, r9): the batch may carry columns the table
    lacks — the widened schema is recorded in the sidecar atomically
    with the stats update, and reads null-fill the new columns for
    files written before the widening (the read schema comes from
    the sidecar, and parquet resolves by name).  The batch must
    still carry every RECORDED column at its recorded type (no
    narrowing, no type drift), and the new columns get no zone-map
    stats (``stats_cols`` is fixed at creation — pruning on them
    needs a rewrite).  Off by default: schema drift you did not opt
    into fails loudly."""
    spark = df.sparkSession
    side = _load_sidecar(path, spark=spark)
    if epoch_id >= 0 and int(side.get("epoch", -1)) >= epoch_id:
        return 0  # replayed batch: the sidecar publish is the commit
        # point, so a crash AFTER the parquet write but BEFORE it
        # leaves only orphans (invisible to reads, reclaimed by
        # zonemap_vacuum) and the replay appends exactly once
    cluster, stats_cols = side["cluster_by"], side["stats_cols"]
    from pyspark.sql import types as T
    want = T.StructType.fromJson(side["schema"])
    want_names = [f.name for f in want.fields]
    extras = [c for c in df.columns if c not in set(want_names)]
    if evolve_schema:
        missing = [n for n in want_names if n not in df.columns]
        if missing:
            raise ValueError(
                f"append batch lacks recorded columns {missing} — "
                "evolve_schema widens additively, never narrows")
        batch_fields = {f.name: f for f in df.schema.fields}
        drift = [(n, batch_fields[n].dataType.simpleString(),
                  f.dataType.simpleString())
                 for n, f in ((f.name, f) for f in want.fields)
                 if batch_fields[n].dataType != f.dataType]
    else:
        if df.columns != want_names:
            raise ValueError(
                f"append schema {df.columns} != table schema "
                f"{want_names} (pass evolve_schema=True for additive "
                "widening; anything else needs a rewrite)")
        # types too, BEFORE any file lands: a type-drifted batch
        # would write parquet whose physical types mismatch the
        # sidecar schema and only fail at read time, after the files
        # are already on disk
        drift = [(f.name, g.dataType.simpleString(),
                  f.dataType.simpleString())
                 for f, g in zip(want.fields, df.schema.fields)
                 if f.dataType != g.dataType]
    if drift:
        raise ValueError(
            "append column types drifted from the table schema "
            "(types never change, with or without evolve_schema): "
            + ", ".join(f"{n}: batch {got} != table {exp}"
                        for n, got, exp in drift))
    if extras:  # evolve path: widen (recorded order first, new last)
        want = T.StructType(list(want.fields)
                            + [df.schema[c] for c in extras])

    before = {n for n in fsutil.list_dir(path, spark=spark)
              if n.endswith(".parquet")}
    if len(cluster) == 1:
        clustered = (df.repartitionByRange(target_files, cluster[0])
                       .sortWithinPartitions(cluster[0]))
    else:
        from ..operators.relational import zorder_col
        clustered = (zorder_col(df, cluster, out_col=_ZV)
                     .repartitionByRange(target_files, _ZV)
                     .sortWithinPartitions(_ZV).drop(_ZV))
    (clustered.write.mode("append")
     .option("compression", compression).parquet(path))
    new = sorted({n for n in fsutil.list_dir(path, spark=spark)
                  if n.endswith(".parquet")} - before)
    if not new:
        return 0
    written = spark.read.schema(want).parquet(
        *[_join(path, n) for n in new])
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for i, c in enumerate(stats_cols):
        aggs += [F.min(c).alias(f"_lo{i}"), F.max(c).alias(f"_hi{i}"),
                 F.sum(F.col(c).isNull().cast("long")).alias(f"_nl{i}")]
    per_file = (written
                .groupBy(F.element_at(F.split(F.input_file_name(), "/"),
                                      -1).alias("_file"))
                .agg(*aggs).collect())
    types = side["types"]
    for r in per_file:
        side["files"][r["_file"]] = {
            "rows": int(r["_rows"]),
            "stats": {c: {"min": _to_json(r[f"_lo{i}"], types[c]),
                          "max": _to_json(r[f"_hi{i}"], types[c]),
                          "nulls": int(r[f"_nl{i}"])}
                      for i, c in enumerate(stats_cols)}}
    if epoch_id >= 0:
        side["epoch"] = int(epoch_id)
    if extras:
        # widened schema publishes atomically WITH the stats: a crash
        # before this leaves the new files as unreferenced orphans
        # (reads never see them; zonemap_vacuum reclaims)
        side["schema"] = want.jsonValue()
    fsutil.write_text_atomic(_join(path, _SIDECAR),
                             json.dumps(side, sort_keys=True),
                             spark=spark)
    return len(new)


def zonemap_overlap(path: str, col: Optional[str] = None,
                    spark=None) -> float:
    """Clustering-decay gauge: the sum of per-file range widths over
    the global range width, for ``col`` (default: the first cluster
    column).  A perfect tiling scores ~1.0 (each point of the domain
    covered by one file); K independent appends push it toward K —
    at 2–3, reads still return exact rows but prune K× worse than
    they could, which is the :func:`zonemap_compact` trigger.
    Driver-side sidecar arithmetic only; numeric/date/timestamp
    columns (strings have no width)."""
    side = _load_sidecar(path, spark=spark)
    col = col or side["cluster_by"][0]
    if col not in side["stats_cols"]:
        raise ValueError(f"no stats for {col!r}")
    t = side["types"][col]

    def _num(v):
        if t == "date":
            import datetime as _d
            return _d.date.fromisoformat(v).toordinal()
        if t in ("timestamp", "timestamp_ntz"):
            import datetime as _d
            return _d.datetime.strptime(v, _TS_FMT).timestamp()
        if t == "decimal":
            return float(_decimal.Decimal(v))
        if t == "string":
            raise ValueError("string columns have no range width — "
                             "pick a numeric/temporal stats column")
        return float(v)

    spans = [(_num(m["stats"][col]["min"]), _num(m["stats"][col]["max"]))
             for m in side["files"].values()
             if m["stats"][col]["min"] is not None]
    if not spans:
        return 0.0
    lo = min(s[0] for s in spans)
    hi = max(s[1] for s in spans)
    width = hi - lo
    if width <= 0:
        return 1.0  # single-point domain: nothing to tile
    return sum(b - a for a, b in spans) / width


def zonemap_compact(spark: SparkSession, path: str, *,
                    target_files: Optional[int] = None,
                    compression: str = "zstd") -> int:
    """Restore clustering after appends: full re-cluster rewrite (the
    table-format OPTIMIZE).  Reads everything, rewrites a fresh
    zonemap table in a staging dir, then swaps it into place.  The
    swap is delete+rename (NOT atomic — a reader racing the swap can
    see a missing table, and a crash between the two leaves the table
    missing with the staging complete; heal with
    :func:`zonemap_recover_compact` at writer startup); run it in the
    maintenance window the single-writer contract already implies.
    ``target_files``
    defaults to the current file count.  Returns the new file
    count."""
    side = _load_sidecar(path, spark=spark)
    n = target_files or len(side["files"])
    from pyspark.sql import types as T
    schema = T.StructType.fromJson(side["schema"])
    current = spark.read.schema(schema).parquet(
        *[_join(path, f) for f in sorted(side["files"])])
    staging = _staging_path(path)
    fsutil.delete(staging, spark=spark)
    out = zonemap_write(current, staging,
                        cluster_by=side["cluster_by"],
                        stats_cols=side["stats_cols"],
                        target_files=n,
                        epoch_id=int(side.get("epoch", -1)),
                        compression=compression)
    fsutil.delete(path, spark=spark)
    fsutil.rename(staging, path, spark=spark)
    return out


def _staging_path(path: str) -> str:
    return path.rstrip("/") + "__compact_staging"


def zonemap_recover_compact(path: str, spark=None) -> bool:
    """Heal a compact that crashed in its one dangerous window (table
    deleted, staging not yet renamed): if ``path`` has no sidecar but
    the staging dir holds a complete one, rename staging into place
    and return True.  A crash BEFORE the delete needs no healing (the
    original is intact and the next compact clears the staging
    orphan); call this at writer startup, the same place the upsert
    sink calls ``recover_upsert_backup``.  False = nothing to do."""
    staging = _staging_path(path)
    try:
        _load_sidecar(path, spark=spark)
        return False  # table intact; staging (if any) is an orphan
    except FileNotFoundError:
        pass
    try:
        _load_sidecar(staging, spark=spark)
    except FileNotFoundError:
        return False  # no complete staging either: nothing to heal
    fsutil.delete(path, spark=spark)  # husk dirs from a partial swap
    fsutil.rename(staging, path, spark=spark)
    return True


def zonemap_vacuum(path: str, spark=None) -> int:
    """Delete parquet files the sidecar does not reference — orphans
    from an append that crashed between the parquet write and the
    sidecar publish (reads never see them: the sidecar's file list IS
    the table).  Returns the number of files removed.  Safe anytime
    under the single-writer contract: a concurrent append's files are
    only unreferenced until its sidecar write, so like every vacuum
    here, run it from the writer, not beside it."""
    side = _load_sidecar(path, spark=spark)
    removed = 0
    for name in fsutil.list_dir(path, spark=spark):
        if name.endswith(".parquet") and name not in side["files"]:
            fsutil.delete(_join(path, name), spark=spark)
            removed += 1
    return removed


def zonemap_stats(spark: SparkSession, path: str) -> DataFrame:
    """The sidecar as a DataFrame: one row per (file, stats column)
    with rows/min/max/nulls (min/max in their JSON encoding) — the
    ops view for verifying a layout's health (overlapping ranges
    between files mean the clustering decayed; rewrite)."""
    side = _load_sidecar(path, spark=spark)
    rows = []
    for fname, meta in sorted(side["files"].items()):
        for col in side["stats_cols"]:
            st = meta["stats"][col]
            rows.append((fname, int(meta["rows"]), col,
                         None if st["min"] is None else str(st["min"]),
                         None if st["max"] is None else str(st["max"]),
                         int(st["nulls"])))
    return local_df(
        spark, rows, "file string, rows bigint, col string, "
                     "min string, max string, nulls bigint")
