"""SparkSession factory with scale-appropriate defaults.

Local test/bench configuration mirrors what a cluster deployment would
set per-job: AQE on (runtime re-planning, skew-join handling, partition
coalescing), shuffle partitions sized to cores (not the 200 default),
UTC session timezone (oracle comparability + sane timestamp semantics),
and Arrow enabled for the pandas boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(app_name: str = "wrangle_pypes_spark",
                cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "true")
        # testdata events.ts is parquet TIMESTAMP(NANOS) which Spark cannot
        # read natively; read as long and convert (sources.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Spark 4.1's ChecksumCheckpointFileManager leaks its per-state-
        # store thread pool when a streaming query stops (measured: +128
        # threads per stream-stream-join drain; a session running many
        # short streaming queries accumulates thousands of threads and
        # every later job slows through safepoint/scheduler overhead —
        # bench tail queries read 3-6x their isolated cost).  Checkpoint
        # file checksums only add corruption DETECTION; any long-lived
        # driver that starts/stops streaming queries needs this off
        # until the upstream pool shutdown lands.
        .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
                "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
