"""Incremental file ingestion: ledger discovery/commit semantics."""

import os

from pyspark.sql import functions as F

from wrangle_pypes_spark.sources.ingest import (
    commit_ingest, discover_new_files, ingest_all_waves, ingest_new_files,
    read_ledger)


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


def test_capped_waves_drain_backlog(spark, tmp_path):
    """A forced multi-wave backlog: 5 landed files with a 2-file wave
    cap must drain in 3 waves, each wave bounded, no file processed
    twice, restart-safe at every wave boundary (VERDICT r5 scale
    killer: uncapped driver-side path list)."""
    data = str(tmp_path / "landing")
    ledger = str(tmp_path / "ledger")
    for i in range(5):
        _land(spark, data, f"f{i}", i * 10, i * 10 + 10)
    pat = data + "/*/*.parquet"

    seen_rows = []
    wave_sizes = []

    def process(df, wave):
        seen_rows.extend(r.v for r in df.collect())
        wave_sizes.append(wave.count())

    waves = ingest_all_waves(spark, pat, ledger_path=ledger,
                             process=process, max_files_per_wave=2)
    assert waves == 3
    assert all(n <= 2 for n in wave_sizes) and sum(wave_sizes) == 5
    # every row exactly once across waves
    assert sorted(seen_rows) == list(range(50))
    # backlog drained: nothing pending, ledger covers all 5 files
    assert discover_new_files(spark, pat, ledger_path=ledger).count() == 0
    assert read_ledger(spark, ledger).count() == 5
    # ledger is restart-safe: draining again is a no-op
    assert ingest_all_waves(spark, pat, ledger_path=ledger,
                            process=process, max_files_per_wave=2) == 0


def test_capped_wave_single_call_is_bounded_and_oldest_first(spark,
                                                             tmp_path):
    import pytest

    data = str(tmp_path / "landing")
    ledger = str(tmp_path / "ledger")
    for i in range(3):
        _land(spark, data, f"f{i}", i, i + 1)
    pat = data + "/*/*.parquet"
    df, wave = ingest_new_files(spark, pat, ledger_path=ledger,
                                max_files_per_wave=2)
    assert wave.count() == 2 and df.count() == 2
    # deterministic boundary: re-running the SAME wave (no commit)
    # re-selects the same files
    df2, wave2 = ingest_new_files(spark, pat, ledger_path=ledger,
                                  max_files_per_wave=2)
    assert sorted(r.file for r in wave.collect()) == \
        sorted(r.file for r in wave2.collect())
    with pytest.raises(ValueError):
        ingest_new_files(spark, pat, ledger_path=ledger,
                         max_files_per_wave=0)


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
