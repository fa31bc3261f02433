"""The delta_jarless Python Data Source (sources/datasource.py):
batch parity with read_delta (deletion vectors included) and the
streaming offset protocol over the commit log."""

import json
import os

import pytest
from pyspark.sql import functions as F

from wrangle_pypes_spark.sources.datasource import (
    DeltaJarlessDataSource,
)
from wrangle_pypes_spark.sources.delta import (
    delta_delete_where,
    read_delta,
    write_delta,
)


@pytest.fixture
def registered(spark):
    spark.dataSource.register(DeltaJarlessDataSource)
    return spark


@pytest.fixture
def tbl(tmp_path):
    return str(tmp_path / "tbl")


class TestBatch:
    def test_parity_with_read_delta(self, registered, tbl):
        spark = registered
        df = spark.range(0, 60).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("p"),
            (F.col("id") * 1.5).alias("x"))
        write_delta(df, tbl, partition_by=["p"])
        write_delta(df.filter("k < 5"), tbl)
        delta_delete_where(spark, tbl, "k % 4 = 0")
        got = spark.read.format("delta_jarless").load(tbl)
        # nullability differs by design: the native scan relaxes it,
        # the python source keeps the log schema verbatim
        assert [(f.name, f.dataType) for f in got.schema.fields] \
            == [(f.name, f.dataType)
                for f in read_delta(spark, tbl).schema.fields]
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, read_delta(spark, tbl).collect()))

    def test_schema_resolution(self, registered, tbl):
        spark = registered
        df = spark.range(3).select(F.col("id").alias("k"))
        write_delta(df, tbl)
        got = spark.read.format("delta_jarless").load(tbl)
        assert got.schema.fieldNames() == ["k"]

    def test_multipart_checkpoint_reads_all_parts(self, registered,
                                                  tbl):
        """Regression: a multi-part checkpoint sliced the add set
        across parts; reading only the last part silently dropped
        rows (and start=cpv+1 skipped the commits that could have
        recovered them)."""
        from wrangle_pypes_spark.sources.delta import (
            delta_checkpoint,
            delta_log_cleanup,
        )
        spark = registered
        df = spark.range(0, 20).select(F.col("id").alias("k"))
        write_delta(df, tbl)
        write_delta(df.select((F.col("k") + 20).alias("k")), tbl)
        write_delta(df.select((F.col("k") + 40).alias("k")), tbl)
        delta_checkpoint(spark, tbl, parts=3)
        got = spark.read.format("delta_jarless").load(tbl)
        assert sorted(r["k"] for r in got.collect()) \
            == list(range(60))
        # …and schema/metaData resolution must survive log cleanup,
        # where the checkpoint parts are the only metaData source
        delta_log_cleanup(spark, tbl, retention_seconds=0.0)
        got = spark.read.format("delta_jarless").load(tbl)
        assert got.schema.fieldNames() == ["k"]
        assert got.count() == 60


class TestStream:
    def _drain(self, spark, tbl, ckpt, out):
        q = (spark.readStream.format("delta_jarless")
             .option("startingVersion", "0").load(tbl)
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    def test_incremental_offsets(self, registered, tbl, tmp_path):
        spark = registered
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        df = spark.range(0, 10).select(F.col("id").alias("k"))
        write_delta(df, tbl)
        write_delta(df.select((F.col("k") + 10).alias("k")), tbl)
        self._drain(spark, tbl, ckpt, out)
        assert sorted(r["k"] for r in
                      spark.read.parquet(out).collect()) \
            == list(range(20))
        # append after the first drain: ONLY the new commit is read
        write_delta(df.select((F.col("k") + 20).alias("k")), tbl)
        self._drain(spark, tbl, ckpt, out)
        assert sorted(r["k"] for r in
                      spark.read.parquet(out).collect()) \
            == list(range(30))

    def test_non_append_changes_gate(self, registered, tbl,
                                     tmp_path):
        spark = registered
        df = spark.range(0, 10).select(F.col("id").alias("k"))
        write_delta(df, tbl)
        delta_delete_where(spark, tbl, "k < 3")
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        q = (spark.readStream.format("delta_jarless")
             .option("startingVersion", "0").load(tbl)
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        with pytest.raises(Exception, match="non-append"):
            q.awaitTermination(180)
            raise RuntimeError(str(q.exception() or "no error"))

    def test_ignore_changes_skips_dv_rewrites(self, registered, tbl,
                                              tmp_path):
        spark = registered
        df = spark.range(0, 10).select(F.col("id").alias("k"))
        write_delta(df, tbl)
        delta_delete_where(spark, tbl, "k < 3")
        write_delta(df.select((F.col("k") + 10).alias("k")), tbl)
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        q = (spark.readStream.format("delta_jarless")
             .option("startingVersion", "0")
             .option("ignoreChanges", "true").load(tbl)
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        # original 10 rows emitted once (DV rewrite skipped), plus the
        # appended 10 — the delta-spark ignoreChanges contract
        assert sorted(r["k"] for r in
                      spark.read.parquet(out).collect()) \
            == list(range(20))


class TestIcebergJarless:
    @pytest.fixture
    def ice_registered(self, spark):
        from wrangle_pypes_spark.sources.datasource import (
            IcebergJarlessDataSource,
        )
        spark.dataSource.register(IcebergJarlessDataSource)
        return spark

    def test_batch_parity(self, ice_registered, tbl):
        from wrangle_pypes_spark.sources.iceberg import (
            read_iceberg,
            write_iceberg,
        )
        spark = ice_registered
        df = spark.range(0, 40).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("string").alias("p"))
        write_iceberg(df, tbl, partition_by=["p"])
        write_iceberg(df.filter("k < 6"), tbl)
        got = spark.read.format("iceberg_jarless").load(tbl)
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, read_iceberg(spark, tbl).collect()))

    def test_merge_on_read_gates(self, ice_registered, tbl):
        from wrangle_pypes_spark.sources.iceberg import (
            write_iceberg,
            write_iceberg_deletes,
        )
        spark = ice_registered
        df = spark.range(0, 10).select(F.col("id").alias("k"))
        write_iceberg(df, tbl)
        write_iceberg_deletes(
            spark.createDataFrame([(1,)], "k long"), tbl,
            equality_cols=["k"])
        with pytest.raises(Exception, match="read_iceberg"):
            spark.read.format("iceberg_jarless").load(tbl).collect()

    def test_streaming_by_snapshot(self, ice_registered, tbl,
                                   tmp_path):
        from wrangle_pypes_spark.sources.iceberg import write_iceberg
        spark = ice_registered
        df = spark.range(0, 10).select(F.col("id").alias("k"))
        write_iceberg(df, tbl)
        write_iceberg(df.select((F.col("k") + 10).alias("k")), tbl)
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")

        def drain():
            q = (spark.readStream.format("iceberg_jarless")
                 .option("fromStart", "true").load(tbl)
                 .writeStream.format("parquet")
                 .option("path", out)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(180)

        drain()
        assert sorted(r["k"] for r in
                      spark.read.parquet(out).collect()) \
            == list(range(20))
        write_iceberg(df.select((F.col("k") + 20).alias("k")), tbl)
        drain()
        assert sorted(r["k"] for r in
                      spark.read.parquet(out).collect()) \
            == list(range(30))


class TestThrottling:
    """maxFilesPerTrigger: a backlog drains in bounded micro-batches
    instead of one giant batch."""

    def _drain_throttled(self, reader, ckpt, want_total):
        """Run with the DEFAULT trigger (repeated micro-batches —
        availableNow bypasses per-trigger admission in the Python
        source API) until want_total rows arrived, return per-batch
        counts."""
        import time as _time
        batches = []

        def sink(batch_df, batch_id):
            batches.append((batch_id, batch_df.count()))

        q = (reader.writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(processingTime="0 seconds").start())
        try:
            deadline = _time.time() + 180
            while _time.time() < deadline:
                if sum(n for _, n in batches) >= want_total:
                    break
                _time.sleep(0.5)
        finally:
            q.stop()
        return [n for _, n in batches if n]

    def test_delta_backlog_drains_in_bounded_batches(
            self, registered, tbl, tmp_path):
        spark = registered
        df = spark.range(0, 10).select(F.col("id").alias("k"))
        for i in range(4):  # 4 commits, 1 file each
            write_delta(
                df.select((F.col("k") + 10 * i).alias("k"))
                  .coalesce(1), tbl)
        reader = (spark.readStream.format("delta_jarless")
                  .option("startingVersion", "0")
                  .option("maxFilesPerTrigger", "1").load(tbl))
        nonempty = self._drain_throttled(
            reader, str(tmp_path / "ckpt"), 40)
        # one file per trigger -> 4 bounded batches of 10 rows
        assert nonempty == [10, 10, 10, 10], nonempty

    def test_iceberg_backlog_drains_in_bounded_batches(
            self, tbl, tmp_path, spark):
        from wrangle_pypes_spark.sources.datasource import (
            IcebergJarlessDataSource,
        )
        from wrangle_pypes_spark.sources.iceberg import write_iceberg
        spark.dataSource.register(IcebergJarlessDataSource)
        df = spark.range(0, 10).select(F.col("id").alias("k"))
        for i in range(3):
            write_iceberg(
                df.select((F.col("k") + 10 * i).alias("k"))
                  .coalesce(1), tbl)
        reader = (spark.readStream.format("iceberg_jarless")
                  .option("fromStart", "true")
                  .option("maxFilesPerTrigger", "1").load(tbl))
        nonempty = self._drain_throttled(
            reader, str(tmp_path / "ckpt"), 30)
        assert nonempty == [10, 10, 10], nonempty

    def test_iceberg_summaryless_snapshots_count_real_files(
            self, tbl, tmp_path, spark):
        """ADVICE r13: a foreign snapshot with NO summary must be
        admitted at its true manifest file count (decoded from the
        manifest list), not assumed to be 1 file — and an explicit
        '0' counts 0."""
        import glob as _glob

        from wrangle_pypes_spark.sources.datasource import (
            IcebergJarlessDataSource,
            _ice_added_count,
            _ice_meta,
        )
        from wrangle_pypes_spark.sources.iceberg import write_iceberg
        spark.dataSource.register(IcebergJarlessDataSource)
        df = spark.range(0, 12).select(F.col("id").alias("k"))
        write_iceberg(df.filter("k < 6").repartition(3), tbl)
        write_iceberg(df.filter("k >= 6").repartition(2), tbl)
        # strip every summary, as a metadata-only foreign writer may
        for mj in _glob.glob(os.path.join(tbl, "metadata",
                                          "*.metadata.json")):
            meta = json.load(open(mj))
            for s in meta.get("snapshots", []):
                s.pop("summary", None)
            json.dump(meta, open(mj, "w"))
        meta = _ice_meta(tbl)
        snaps = sorted(meta["snapshots"],
                       key=lambda s: int(s["sequence-number"]))
        assert _ice_added_count(tbl, snaps[0]) == 3
        assert _ice_added_count(tbl, snaps[1]) == 2
        # budget 3 admits exactly snapshot 1, then snapshot 2
        reader = (spark.readStream.format("iceberg_jarless")
                  .option("fromStart", "true")
                  .option("maxFilesPerTrigger", "3").load(tbl))
        nonempty = self._drain_throttled(
            reader, str(tmp_path / "ckpt"), 12)
        assert nonempty == [6, 6], nonempty
        # explicit '0' rides free: both snapshots in ONE batch
        for mj in _glob.glob(os.path.join(tbl, "metadata",
                                          "*.metadata.json")):
            meta = json.load(open(mj))
            for s in meta.get("snapshots", []):
                s["summary"] = {"operation": "append",
                                "added-data-files": "0"}
            json.dump(meta, open(mj, "w"))
        reader = (spark.readStream.format("iceberg_jarless")
                  .option("fromStart", "true")
                  .option("maxFilesPerTrigger", "1").load(tbl))
        nonempty = self._drain_throttled(
            reader, str(tmp_path / "ckpt0"), 12)
        assert nonempty == [12], nonempty

    def test_bad_max_files_is_loud(self, registered, tbl):
        spark = registered
        write_delta(spark.range(3).select(F.col("id").alias("k")),
                    tbl)
        with pytest.raises(Exception, match="maxFilesPerTrigger"):
            (spark.readStream.format("delta_jarless")
             .option("startingVersion", "0")
             .option("maxFilesPerTrigger", "0").load(tbl)
             .writeStream.format("noop").start()
             .awaitTermination(60))
