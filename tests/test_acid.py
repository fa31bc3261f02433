"""Versioned-snapshot acid store: atomic pointer commits close the
swap store's data-vs-epoch crash window (sources/acid.py)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from wrangle_pypes_spark.sources.acid import (
    _version_dir, acid_commit, acid_current, acid_read, acid_vacuum)


def test_commit_read_roundtrip_and_versions(spark, tmp_path):
    store = str(tmp_path / "acid")
    assert acid_read(spark, store) is None
    assert acid_current(store) is None

    v1 = acid_commit(spark.range(3).withColumn("x", F.lit("a")), store,
                     epoch_id=0)
    assert v1 == 1 and acid_current(store) == (1, 0)
    assert acid_read(spark, store).count() == 3

    v2 = acid_commit(spark.range(5).withColumn("x", F.lit("b")), store,
                     epoch_id=1)
    assert v2 == 2 and acid_current(store) == (2, 1)
    got = acid_read(spark, store)
    assert got.count() == 5 and got.select("x").distinct().first().x == "b"


def test_crashed_commit_is_invisible_and_never_reused(spark, tmp_path):
    """Simulate a crash AFTER the snapshot write but BEFORE the pointer
    write: readers still see the old version, the epoch is unchanged
    (so the batch replays exactly once), and the next commit skips the
    orphan's version number."""
    store = str(tmp_path / "acid")
    acid_commit(spark.range(3), store, epoch_id=0)
    # crashed commit: _v000002 exists, pointer still says version 1
    spark.range(99).write.parquet(_version_dir(store, 2))
    assert acid_current(store) == (1, 0)
    assert acid_read(spark, store).count() == 3
    # recovery commit (the replayed batch) must not collide with the
    # orphan directory
    v = acid_commit(spark.range(7), store, epoch_id=0)
    assert v == 3
    assert acid_read(spark, store).count() == 7
    # vacuum removes the orphan (newer-than-pointer dirs are never
    # committed state) and old versions beyond keep
    removed = acid_vacuum(store, keep=1)
    assert removed == 2  # orphan _v2 + superseded _v1
    assert acid_read(spark, store).count() == 7


def test_torn_pointer_reads_as_uncommitted(spark, tmp_path):
    store = str(tmp_path / "acid")
    acid_commit(spark.range(3), store, epoch_id=5)
    with open(os.path.join(store, "_ptr.json"), "w") as f:
        f.write('{"vers')  # torn write (non-atomic-rename store)
    assert acid_current(store) is None
    assert acid_read(spark, store) is None


def test_vacuum_keep_window_and_validation(spark, tmp_path):
    store = str(tmp_path / "acid")
    for e in range(4):
        acid_commit(spark.range(e + 1), store, epoch_id=e)
    assert acid_vacuum(store, keep=2) == 2   # v1, v2 go; v3, v4 stay
    assert acid_read(spark, store).count() == 4
    assert acid_vacuum(store, keep=2) == 0   # idempotent
    with pytest.raises(ValueError):
        acid_vacuum(store, keep=0)


def _two_file_stream(spark, events, tmp_path):
    import glob
    import shutil

    src_dir = str(tmp_path / "stream_src")
    events.filter(F.col("event_id") % 2 == 0).coalesce(1) \
        .write.parquet(src_dir + "/a")
    events.filter(F.col("event_id") % 2 == 1).coalesce(1) \
        .write.parquet(src_dir + "/b")
    files = [f for d in ("a", "b")
             for f in glob.glob(f"{src_dir}/{d}/*.parquet")]
    for i, f in enumerate(files):
        shutil.move(f, f"{src_dir}/part-{i}.parquet")
    shutil.rmtree(src_dir + "/a"), shutil.rmtree(src_dir + "/b")
    return (spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .format("parquet").load(src_dir)
            .select("bucket", "event_type", "value", "user_id"))


@pytest.fixture()
def events(spark, tables):
    from wrangle_pypes_spark.operators.rollup import time_bucket
    return tables["events"].withColumn("bucket",
                                       time_bucket(F.col("ts"), "hour"))


METRICS = {"n": ("count", "*"), "total": ("sum", "value")}


def test_streaming_rollup_acid_store_equals_batch_and_survives_crash(
        spark, events, tmp_path):
    """The acid-backed rollup maintainer matches the one-shot rollup,
    skips re-delivered epochs, and — the window the swap store cannot
    close — recovers EXACTLY-ONCE from a crash between snapshot write
    and pointer publish."""
    from wrangle_pypes_spark.operators.rollup import rollup_build
    from wrangle_pypes_spark.streaming import foreach_batch_rollup_upsert

    stream = _two_file_stream(spark, events, tmp_path)
    store = str(tmp_path / "rollup_acid")
    q = foreach_batch_rollup_upsert(
        stream, store, group_cols=["bucket", "event_type"],
        metrics=METRICS, store_format="acid")
    q.awaitTermination()

    want = {(r.bucket, r.event_type): (r.n, r.total) for r in rollup_build(
        events, group_cols=["bucket", "event_type"],
        metrics=METRICS).collect()}
    got = {(r.bucket, r.event_type): (r.n, round(r.total, 9))
           for r in acid_read(spark, store).collect()}
    assert {k: (n, round(t, 9)) for k, (n, t) in want.items()} == got

    # byte-identical re-drain: epochs <= committed epoch are skipped
    with pytest.warns(UserWarning, match="WITHOUT a checkpoint"):
        q2 = foreach_batch_rollup_upsert(
            stream, store, group_cols=["bucket", "event_type"],
            metrics=METRICS, store_format="acid")
    q2.awaitTermination()
    assert {(r.bucket, r.event_type): (r.n, round(r.total, 9))
            for r in acid_read(spark, store).collect()} == got

    # crash injection: a snapshot written but never published must not
    # change what replays see, and the re-drain must still be a no-op
    ver, epoch = acid_current(store)
    spark.range(1).write.parquet(_version_dir(store, ver + 1))
    with pytest.warns(UserWarning, match="WITHOUT a checkpoint"):
        q3 = foreach_batch_rollup_upsert(
            stream, store, group_cols=["bucket", "event_type"],
            metrics=METRICS, store_format="acid")
    q3.awaitTermination()
    assert {(r.bucket, r.event_type): (r.n, round(r.total, 9))
            for r in acid_read(spark, store).collect()} == got
    acid_vacuum(store, keep=1)
    assert {(r.bucket, r.event_type): (r.n, round(r.total, 9))
            for r in acid_read(spark, store).collect()} == got


def test_rollup_store_format_validation(spark, events, tmp_path):
    from wrangle_pypes_spark.streaming import foreach_batch_rollup_upsert

    stream = _two_file_stream(spark, events, tmp_path)
    with pytest.raises(ValueError):
        foreach_batch_rollup_upsert(
            stream, str(tmp_path / "x"), group_cols=["bucket"],
            metrics=METRICS, store_format="delta")
