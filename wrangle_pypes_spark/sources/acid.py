"""Versioned-snapshot parquet tables with an atomic pointer commit —
the minimal native closure of the swap-store crash window.

The swap-based durable stores (``upsert_parquet`` + epoch marker)
commit DATA and the EPOCH in two separate filesystem operations; a
crash exactly between them leaves one batch that re-merges on recovery.
Harmless for idempotent keyed upserts, corrupting for ADDITIVE merges
(the rollup maintainer doubles whatever that batch counted).  Table
formats (Delta/Iceberg) close this with a transaction log; none of
their jars exist in this environment, so this module implements the
essential 1% of that idea directly:

```
store/
  _ptr.json      {"version": N, "epoch": E}   <- the ONE commit point
  _v000001/      full parquet snapshot
  _v000002/
```

A commit writes the next ``_vN`` directory COMPLETELY, then publishes
it by writing ``_ptr.json`` via temp-file + rename.  The pointer is
the single atomic commit point and it carries the epoch, so data and
epoch can never disagree: a crash before the pointer write leaves an
orphan ``_vN`` directory (invisible to readers, removed by
:func:`acid_vacuum`) and the old pointer — the replayed batch merges
onto the OLD snapshot, exactly once.  Readers resolve the pointer and
read one immutable snapshot directory, so they are never exposed to a
half-written table and never block writers (MVCC-by-directory).

Cost model, stated honestly: every commit writes a FULL snapshot, so
the per-batch write cost is O(store size) regardless of how little
changed.  That is the right trade for COMPACT stores — rollup/aggregate
state, dimension tables, manifests — where the store is orders of
magnitude smaller than the stream it summarizes and the crash-window
correctness is worth a small rewrite.  For a huge keyed store, use the
partitioned swap path (touched-partitions-only rewrite, idempotent
merge) or a real table format whose log commits file-level deltas.

Single-writer by contract, like every swap store here (streaming
``foreachBatch`` guarantees one instance per sink).  Control files go
through :mod:`wrangle_pypes_spark.fsutil`: POSIX/HDFS renames are
atomic; on S3-like stores the pointer rename is copy+delete of one
small object — the window shrinks from "data vs epoch disagree" to
"one tiny object", but a real table format remains the answer there
(fsutil's docstring says the same).

Reference analog: none — the reference (pipeline.py:33) hands
persistence to the caller's ``lookup`` store; this is the storage
contract a 100 TB incremental pipeline needs under crash-recovery.
"""

from __future__ import annotations

import json
import re
from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession

from .. import fsutil

_PTR = "_ptr.json"
_VDIR_RE = re.compile(r"^_v(\d{6})$")


def _ptr_path(path: str) -> str:
    return path.rstrip("/") + "/" + _PTR


def _version_dir(path: str, version: int) -> str:
    return path.rstrip("/") + f"/_v{version:06d}"


def acid_current(path: str, spark=None) -> Optional[Tuple[int, int]]:
    """(version, epoch) of the last committed snapshot, None if no
    commit ever happened (missing or unreadable pointer)."""
    txt = fsutil.read_text(_ptr_path(path), spark=spark)
    if txt is None:
        return None
    try:
        doc = json.loads(txt)
        return int(doc["version"]), int(doc["epoch"])
    except (ValueError, KeyError, TypeError):
        # a torn pointer can only happen on non-atomic-rename stores;
        # treat as uncommitted rather than guessing
        return None


def acid_read(spark: SparkSession, path: str) -> Optional[DataFrame]:
    """The committed snapshot as a DataFrame, None when nothing has
    been committed yet.  Readers only ever see whole snapshots."""
    cur = acid_current(path, spark=spark)
    if cur is None:
        return None
    return spark.read.parquet(_version_dir(path, cur[0]))


def _existing_versions(path: str, spark=None) -> list[int]:
    out = []
    for name in fsutil.list_dir(path, spark=spark):
        m = _VDIR_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def acid_commit(df: DataFrame, path: str, *, epoch_id: int = -1,
                partition_by: Sequence[str] = (),
                compression: str = "zstd") -> int:
    """Commit ``df`` as the next full snapshot; returns its version.

    Write order is the whole correctness argument: (1) the new
    ``_vN`` directory is written completely (N = one past the highest
    EXISTING directory, committed or orphaned, so a crashed write's
    leftovers are never reused), (2) ``_ptr.json`` with
    ``{version: N, epoch: epoch_id}`` is renamed into place.  Step 2
    is the only visible state change.  The snapshot is read from its
    own directory, so committing a DataFrame derived from
    ``acid_read`` of the SAME store needs no localCheckpoint — the
    read and the write never touch the same files.
    """
    spark = df.sparkSession
    versions = _existing_versions(path, spark=spark) \
        if fsutil.dir_exists(path, spark=spark) else []
    version = (versions[-1] + 1) if versions else 1
    writer = df.write.mode("errorifexists").option(
        "compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(_version_dir(path, version))
    fsutil.write_text_atomic(
        _ptr_path(path),
        json.dumps({"version": version, "epoch": int(epoch_id)}),
        spark=spark)
    return version


def acid_vacuum(path: str, *, keep: int = 1, spark=None) -> int:
    """Delete snapshot directories that are neither the committed one,
    its ``keep - 1`` predecessors, nor needed at all (orphans from
    crashed commits are NEWER than the pointer and always removed).
    Returns the number of directories deleted.  Safe any time under
    the single-writer contract: readers resolve the pointer first and
    the committed window is never touched.
    """
    if keep < 1:
        raise ValueError("keep must be >= 1")
    cur = acid_current(path, spark=spark)
    if cur is None:
        return 0
    committed = cur[0]
    removed = 0
    for v in _existing_versions(path, spark=spark):
        if v > committed or v <= committed - keep:
            fsutil.delete(_version_dir(path, v), spark=spark)
            removed += 1
    return removed
