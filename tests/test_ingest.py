"""Incremental file ingestion: ledger discovery/commit semantics."""

import os

from pyspark.sql import functions as F

from wrangle_pypes_spark.sources.ingest import (
    commit_ingest, discover_new_files, ingest_new_files, read_ledger)


def _land(spark, d, name, lo, hi):
    spark.range(lo, hi).withColumnRenamed("id", "v") \
        .coalesce(1).write.mode("overwrite").parquet(os.path.join(d, name))


def test_two_wave_ingest_exactly_once(spark, tmp_path):
    data = str(tmp_path / "landing")
    ledger = str(tmp_path / "ledger")
    _land(spark, data, "a", 0, 10)
    _land(spark, data, "b", 10, 30)
    pat = data + "/*/*.parquet"

    df1, new1 = ingest_new_files(spark, pat, ledger_path=ledger)
    assert df1.count() == 30
    assert commit_ingest(spark, new1, ledger_path=ledger,
                         batch_id="b1") == new1.count() > 0

    # nothing new -> no data, empty listing
    df2, new2 = ingest_new_files(spark, pat, ledger_path=ledger)
    assert df2 is None and new2.count() == 0

    # second wave: only the new file's rows surface
    _land(spark, data, "c", 30, 35)
    df3, new3 = ingest_new_files(spark, pat, ledger_path=ledger)
    assert df3.count() == 5
    assert set(r.v for r in df3.collect()) == set(range(30, 35))
    commit_ingest(spark, new3, ledger_path=ledger, batch_id="b2")
    assert read_ledger(spark, ledger).count() == \
        discover_new_files(spark, pat, ledger_path=ledger).count() + \
        read_ledger(spark, ledger).count()  # nothing pending


def test_commit_replay_is_noop(spark, tmp_path):
    data = str(tmp_path / "landing")
    ledger = str(tmp_path / "ledger")
    _land(spark, data, "a", 0, 10)
    pat = data + "/*/*.parquet"
    new = discover_new_files(spark, pat, ledger_path=ledger)
    n1 = commit_ingest(spark, new, ledger_path=ledger, batch_id="b1")
    n2 = commit_ingest(spark, new, ledger_path=ledger, batch_id="b1-replay")
    assert n1 > 0 and n2 == 0
    led = read_ledger(spark, ledger)
    assert led.count() == led.select("file").distinct().count()


def test_crash_before_commit_resurfaces_files(spark, tmp_path):
    data = str(tmp_path / "landing")
    ledger = str(tmp_path / "ledger")
    _land(spark, data, "a", 0, 10)
    pat = data + "/*/*.parquet"
    new = discover_new_files(spark, pat, ledger_path=ledger)
    assert new.count() > 0
    # no commit (simulated crash): the same files are discovered again
    again = discover_new_files(spark, pat, ledger_path=ledger)
    assert sorted(r.file for r in again.collect()) == \
        sorted(r.file for r in new.collect())


def test_resized_file_is_renew(spark, tmp_path):
    data = str(tmp_path / "landing")
    ledger = str(tmp_path / "ledger")
    _land(spark, data, "a", 0, 10)
    pat = data + "/*/*.parquet"
    new = discover_new_files(spark, pat, ledger_path=ledger)
    commit_ingest(spark, new, ledger_path=ledger, batch_id="b1")
    # repair-land the same logical file with different contents/size
    _land(spark, data, "a", 0, 1000)
    renew = discover_new_files(spark, pat, ledger_path=ledger)
    assert renew.count() >= 1  # size changed -> treated as new
