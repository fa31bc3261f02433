"""Zone-map clustered tables (sources/zonemap.py): range/Z-order
clustering + per-file min/max sidecar + driver-side file skipping.
The invariant under test everywhere: pruning NEVER changes results —
zonemap_read(pred) == full scan + filter — while zonemap_files proves
files were actually skipped."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wrangle_pypes_spark.sources.zonemap import (
    zonemap_files, zonemap_read, zonemap_stats, zonemap_write)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_roundtrip_and_linear_prune(spark, tmp_path):
    path = str(tmp_path / "zm")
    df = spark.range(10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"))
    n = zonemap_write(df, path, cluster_by=["k"], target_files=16)
    assert n == 16

    # full read == original content
    assert _rows(zonemap_read(spark, path), "k", "v") == \
        _rows(df, "k", "v")

    # a 10% range predicate keeps ~10% of files, never the whole table
    kept, total = zonemap_files(path, between={"k": (4000, 4999)})
    assert total == 16 and 1 <= len(kept) <= 4

    got = zonemap_read(spark, path, between={"k": (4000, 4999)})
    exp = df.filter(F.col("k").between(4000, 4999))
    assert _rows(got, "k", "v") == _rows(exp, "k", "v")

    # open-ended bounds
    got = zonemap_read(spark, path, between={"k": (9500, None)})
    assert got.count() == 500
    got = zonemap_read(spark, path, between={"k": (None, 99)})
    assert got.count() == 100


def test_eq_prune_and_empty_result_schema(spark, tmp_path):
    path = str(tmp_path / "zm")
    df = spark.range(1000).select(F.col("id").alias("k"),
                                  F.lit("x").alias("s"))
    zonemap_write(df, path, cluster_by=["k"], target_files=8)
    got = zonemap_read(spark, path, eq={"k": 17})
    assert [r.k for r in got.collect()] == [17]
    kept, total = zonemap_files(path, eq={"k": 17})
    assert len(kept) == 1 and total == 8

    # predicate outside the domain: zero files, EMPTY frame with the
    # recorded schema (not None, not a crash)
    out = zonemap_read(spark, path, eq={"k": -5})
    assert out.count() == 0
    assert out.columns == ["k", "s"]


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    path = str(tmp_path / "zz")
    df = spark.range(20_000).select(
        (F.col("id") % 141).alias("x"),
        (F.col("id") % 139).alias("y"),
        F.col("id").alias("payload"))
    zonemap_write(df, path, cluster_by=["x", "y"], target_files=16)

    for pred in ({"x": (0, 17)}, {"y": (120, 138)},
                 {"x": (0, 17), "y": (120, 138)}):
        kept, total = zonemap_files(path, between=pred)
        assert total == 16
        assert len(kept) < total, f"no pruning for {pred}"
        got = zonemap_read(spark, path, between=pred)
        exp = df
        for c, (lo, hi) in pred.items():
            exp = exp.filter(F.col(c).between(lo, hi))
        assert _rows(got, "x", "y", "payload") == \
            _rows(exp, "x", "y", "payload")

    # the 2-D box prunes harder than either 1-D band: that is the
    # Z-order payoff over linear clustering
    kx, _ = zonemap_files(path, between={"x": (0, 17)})
    kxy, _ = zonemap_files(path, between={"x": (0, 17),
                                          "y": (120, 138)})
    assert len(kxy) <= len(kx)


def test_date_timestamp_decimal_bounds(spark, tmp_path):
    path = str(tmp_path / "zd")
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [Row(d=(base + dt.timedelta(days=i)).date(),
             ts=base + dt.timedelta(hours=i),
             i=i)
         for i in range(400)])
    zonemap_write(df, path, cluster_by=["d"], stats_cols=["d", "ts"],
                  target_files=8)

    # date bounds as date objects AND as ISO strings
    for lo, hi in ((dt.date(2024, 2, 1), dt.date(2024, 2, 29)),
                   ("2024-02-01", "2024-02-29")):
        got = zonemap_read(spark, path, between={"d": (lo, hi)})
        assert got.count() == 29
        kept, total = zonemap_files(path, between={"d": (lo, hi)})
        assert len(kept) < total

    # timestamp equality at a second boundary: a bare-seconds bound
    # must not lexicographically mis-prune against stored microseconds
    kept, _ = zonemap_files(path, between={
        "ts": ("2024-01-01 05:00:00", "2024-01-01 05:00:00")})
    assert kept  # the file holding hour 5 survives
    got = zonemap_read(
        spark, path,
        between={"ts": (dt.datetime(2024, 1, 1, 5),
                        dt.datetime(2024, 1, 1, 5))})
    assert got.count() == 1


def test_all_null_stats_column_prunes_file(spark, tmp_path):
    path = str(tmp_path / "zn")
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 50, F.col("id")).alias("maybe"))
    zonemap_write(df, path, cluster_by=["k"],
                  stats_cols=["k", "maybe"], target_files=4)
    # files where `maybe` is entirely NULL can never match a range
    kept, total = zonemap_files(path, between={"maybe": (0, 200)})
    assert len(kept) < total
    got = zonemap_read(spark, path, between={"maybe": (0, 200)})
    assert got.count() == 50


def test_validation_errors(spark, tmp_path):
    df = spark.range(10).select(
        F.col("id").alias("k"),
        F.array(F.col("id")).alias("arr"),
        F.lit("s").alias("s"))
    with pytest.raises(ValueError, match="non-empty"):
        zonemap_write(df, str(tmp_path / "a"), cluster_by=[])
    with pytest.raises(ValueError, match="not in DataFrame"):
        zonemap_write(df, str(tmp_path / "b"), cluster_by=["nope"])
    with pytest.raises(ValueError, match="orderable atomic"):
        zonemap_write(df, str(tmp_path / "c"), cluster_by=["arr"])
    with pytest.raises(ValueError, match="numeric"):
        zonemap_write(df, str(tmp_path / "d"), cluster_by=["k", "s"])
    path = str(tmp_path / "e")
    zonemap_write(df, path, cluster_by=["k"], target_files=2)
    with pytest.raises(ValueError, match="no zone-map stats"):
        zonemap_read(spark, path, between={"s": ("a", "b")})
    with pytest.raises(ValueError, match="both between= and eq="):
        zonemap_read(spark, path, between={"k": (1, 2)}, eq={"k": 1})
    with pytest.raises(FileNotFoundError, match="not a zonemap table"):
        zonemap_read(spark, str(tmp_path / "missing"))
    # second write to the same path fails unless overwrite
    with pytest.raises(Exception):
        zonemap_write(df, path, cluster_by=["k"], target_files=2)
    zonemap_write(df, path, cluster_by=["k"], target_files=3,
                  mode="overwrite")
    kept, total = zonemap_files(path)
    assert total == 3 and len(kept) == 3


def test_pruned_plan_scans_only_kept_files(spark, tmp_path):
    """The skip is real at the PLAN level: the scan's file index holds
    exactly the surviving files (counted, per the explain-truncation
    pitfall), not the whole table."""
    path = str(tmp_path / "zp")
    df = spark.range(50_000).select(F.col("id").alias("k"))
    zonemap_write(df, path, cluster_by=["k"], target_files=20)
    kept, total = zonemap_files(path, between={"k": (0, 2499)})
    assert len(kept) < total
    plan = (zonemap_read(spark, path, between={"k": (0, 2499)})
            ._jdf.queryExecution().executedPlan().toString())
    assert f"InMemoryFileIndex({len(kept)} paths)" in plan


def test_stats_view(spark, tmp_path):
    path = str(tmp_path / "zs")
    df = spark.range(1000).select(F.col("id").alias("k"))
    zonemap_write(df, path, cluster_by=["k"], target_files=5)
    st = zonemap_stats(spark, path)
    rows = st.collect()
    assert len(rows) == 5 and sum(r.rows for r in rows) == 1000
    # files tile the range: max of one file < min of the next
    ordered = sorted(((int(r.min), int(r.max)) for r in rows))
    for (aa, ab), (ba, _bb) in zip(ordered, ordered[1:]):
        assert aa <= ab < ba


def test_append_overlap_compact_lifecycle(spark, tmp_path):
    from wrangle_pypes_spark.sources.zonemap import (
        zonemap_append, zonemap_compact, zonemap_overlap)

    path = str(tmp_path / "life")
    full = spark.range(12_000).select(F.col("id").alias("k"),
                                      (F.col("id") % 7).alias("v"))
    a = full.filter(F.col("k") < 4000)
    b = full.filter(F.col("k").between(4000, 7999))
    c = full.filter(F.col("k") >= 8000)

    zonemap_write(a, path, cluster_by=["k"], target_files=4)
    base_overlap = zonemap_overlap(path)
    assert 0.9 <= base_overlap <= 1.2  # clean tiling

    # two appends: reads stay EXACT while clustering decays
    assert zonemap_append(b, path, target_files=4) == 4
    assert zonemap_append(c, path, target_files=4) == 4
    got = zonemap_read(spark, path, between={"k": (3500, 4500)})
    exp = full.filter(F.col("k").between(3500, 4500))
    assert sorted(r.k for r in got.collect()) == \
        sorted(r.k for r in exp.collect())
    # disjoint appends keep tiling ~1 here; the gauge's job is the
    # OVERLAPPING case:
    overlap_append = spark.createDataFrame(
        [(i, 0) for i in range(0, 12_000, 3)], "k bigint, v bigint")
    zonemap_append(overlap_append, path, target_files=4)
    assert zonemap_overlap(path) > 1.5  # decay is visible

    # compact restores clustering AND content
    n = zonemap_compact(spark, path, target_files=8)
    assert n == 8
    assert 0.9 <= zonemap_overlap(path) <= 1.2
    total = full.count() + overlap_append.count()
    assert zonemap_read(spark, path).count() == total
    kept, tot = zonemap_files(path, between={"k": (0, 1499)})
    assert tot == 8 and len(kept) <= 2  # pruning is sharp again


def test_append_schema_mismatch_raises(spark, tmp_path):
    from wrangle_pypes_spark.sources.zonemap import zonemap_append

    path = str(tmp_path / "mis")
    zonemap_write(spark.range(100).select(F.col("id").alias("k")),
                  path, cluster_by=["k"], target_files=2)
    with pytest.raises(ValueError, match="append schema"):
        zonemap_append(spark.range(5).select(
            F.col("id").alias("k"), F.lit(1).alias("extra")), path)


def test_append_type_drift_raises_before_writing(spark, tmp_path):
    """ADVICE r8: names/order alone passed the schema check, so a
    type-drifted batch wrote parquet whose physical types mismatched
    the sidecar and only failed at read time — AFTER the files were
    on disk.  Types are validated up front now, and nothing lands."""
    import os

    from wrangle_pypes_spark.sources.zonemap import zonemap_append

    path = str(tmp_path / "drift")
    zonemap_write(spark.range(100).select(F.col("id").alias("k")),
                  path, cluster_by=["k"], target_files=2)
    before = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    with pytest.raises(ValueError, match="types drifted"):
        zonemap_append(spark.range(5).select(
            F.col("id").cast("string").alias("k")), path)
    after = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    assert after == before  # the failed append left no files behind
    # and reads still work
    assert spark.read.parquet(path).count() == 100


def test_streaming_append_equals_batch_and_replays(spark, tmp_path):
    from wrangle_pypes_spark.sources.zonemap import (_load_sidecar,
                                                     zonemap_vacuum)
    from wrangle_pypes_spark.streaming import \
        foreach_batch_zonemap_append

    full = spark.range(6000).select(F.col("id").alias("k"),
                                    (F.col("id") % 5).alias("v"))
    src = str(tmp_path / "src")
    full.repartition(3).write.parquet(src)
    path = str(tmp_path / "zstream")
    ckpt = str(tmp_path / "ckpt")

    def _drain():
        stream = (spark.readStream.schema("k bigint, v bigint")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = foreach_batch_zonemap_append(
            stream, path, cluster_by=["k"],
            target_files_per_batch=3, compact_every=2,
            compact_target_files=6, checkpoint=ckpt)
        q.awaitTermination()

    _drain()
    got = zonemap_read(spark, path)
    assert got.count() == 6000
    pred = {"k": (1000, 1999)}
    assert zonemap_read(spark, path, between=pred).count() == 1000
    kept, total = zonemap_files(path, between=pred)
    assert len(kept) < total  # still prunes after streaming ingest

    # replay with the same checkpoint: nothing doubles
    side_before = _load_sidecar(path)
    _drain()
    assert _load_sidecar(path) == side_before
    assert zonemap_read(spark, path).count() == 6000

    # orphan hygiene: an unreferenced parquet file gets vacuumed
    import shutil
    some = sorted(side_before["files"])[0]
    orphan = str(tmp_path / "zstream" / "part-orphan.parquet")
    shutil.copy(str(tmp_path / "zstream" / some), orphan)
    assert zonemap_vacuum(path) == 1
    assert zonemap_read(spark, path).count() == 6000


def test_randomized_predicates_never_change_results(spark, tmp_path):
    """Seeded sweep over many interval shapes (empty, point, narrow,
    wide, open-ended, out-of-domain): the pruned read must equal the
    full scan + filter for every one — the core soundness claim under
    inputs no hand-picked case covers."""
    import random

    path = str(tmp_path / "rand")
    df = spark.range(8000).select(
        ((F.col("id") * 37) % 10000).alias("k"),
        (F.col("id") % 11).alias("v"))
    zonemap_write(df, path, cluster_by=["k"], target_files=13)
    full = {(r.k, r.v) for r in df.collect()}

    rng = random.Random(42)
    cases = [(-50, -1), (10001, 10500), (0, 9999), (5000, 5000),
             (None, 123), (9876, None)]
    for _ in range(14):
        a = rng.randint(-100, 10100)
        b = rng.randint(-100, 10100)
        cases.append((min(a, b), max(a, b)))
    for lo, hi in cases:
        got = {(r.k, r.v) for r in
               zonemap_read(spark, path,
                            between={"k": (lo, hi)}).collect()}
        exp = {kv for kv in full
               if (lo is None or kv[0] >= lo)
               and (hi is None or kv[0] <= hi)}
        assert got == exp, f"mismatch for [{lo}, {hi}]"


def test_recover_compact_heals_the_crash_window(spark, tmp_path):
    """Simulate compact's one dangerous crash window (table deleted,
    staging complete-but-unrenamed): recovery renames staging into
    place and the table reads back whole; with the table intact,
    recovery is a no-op that leaves the orphan staging alone."""
    import shutil

    from wrangle_pypes_spark.sources.zonemap import (
        zonemap_recover_compact)

    path = str(tmp_path / "rc")
    df = spark.range(500).select(F.col("id").alias("k"))
    zonemap_write(df, path, cluster_by=["k"], target_files=4)

    # intact table + stray staging: no-op
    staging = path + "__compact_staging"
    shutil.copytree(path, staging)
    assert zonemap_recover_compact(path) is False
    assert zonemap_read(spark, path).count() == 500

    # the crash window: table gone, staging complete
    shutil.rmtree(path)
    assert zonemap_recover_compact(path) is True
    assert zonemap_read(spark, path).count() == 500
    # and it is idempotent / quiet afterwards
    assert zonemap_recover_compact(path) is False

    # nothing anywhere: no-op
    assert zonemap_recover_compact(str(tmp_path / "void")) is False


def test_streaming_first_batch_crash_replay_recovers(spark, tmp_path):
    """A first batch that crashed between its parquet write and the
    sidecar publish leaves a sidecar-less dir; the replay must clear
    it and index cleanly instead of wedging on 'path exists'."""
    from wrangle_pypes_spark.streaming import \
        foreach_batch_zonemap_append

    full = spark.range(300).select(F.col("id").alias("k"))
    src = str(tmp_path / "src")
    full.coalesce(1).write.parquet(src)
    path = str(tmp_path / "ztab")
    # simulate the crash debris: parquet files, NO _zonemap.json
    full.limit(10).write.parquet(path)

    stream = (spark.readStream.schema("k bigint")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = foreach_batch_zonemap_append(stream, path, cluster_by=["k"],
                                     target_files_per_batch=2,
                                     checkpoint=str(tmp_path / "ck"))
    q.awaitTermination()
    assert zonemap_read(spark, path).count() == 300  # debris gone


def test_streaming_heals_compact_crash_before_appending(spark, tmp_path):
    """A compact_every OPTIMIZE that crashed mid-swap (table gone,
    staging complete) must be healed by the next batch — NOT replaced
    by a table built from that batch alone."""
    import shutil

    from wrangle_pypes_spark.streaming import \
        foreach_batch_zonemap_append

    history = spark.range(1000).select(F.col("id").alias("k"))
    path = str(tmp_path / "zheal")
    # ad-hoc epoch (-1): the fresh stream's batch 0 must not collide
    # with the pre-seeded history (a real resume shares the
    # checkpoint lineage, so its batch ids are already past the
    # sidecar's epoch)
    zonemap_write(history, path, cluster_by=["k"], target_files=4)
    # simulate the compact crash window
    shutil.move(path, path + "__compact_staging")

    newdata = spark.range(1000, 1100).select(F.col("id").alias("k"))
    src = str(tmp_path / "src")
    newdata.coalesce(1).write.parquet(src)
    stream = (spark.readStream.schema("k bigint")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = foreach_batch_zonemap_append(stream, path, cluster_by=["k"],
                                     checkpoint=str(tmp_path / "ck"))
    q.awaitTermination()
    # history healed AND the batch appended
    assert zonemap_read(spark, path).count() == 1100


def test_inloop_compact_crash_cadence_soak(spark, tmp_path, monkeypatch):
    """VERDICT r8 #8: the zonemap mirror of the manifest vacuum soak.
    Many append batches with a compact every 3rd; every OTHER compact
    crashes in its one dangerous window (table deleted, staging
    complete but unrenamed — injected by failing the swap rename).
    The writer heals with zonemap_recover_compact at the next batch,
    exactly as the streaming maintainer does.  Invariants at every
    step: reads are EXACT (the accumulated row set, never a torn or
    doubled view) and every completed-or-healed compact restores
    clustering (zonemap_overlap drops back to the clustered floor)."""
    from wrangle_pypes_spark.sources import zonemap as zm

    path = str(tmp_path / "soak")
    expected = set()
    real_rename = zm.fsutil.rename
    crash_next = {"armed": False}

    def flaky_rename(src, dst, spark=None):
        if crash_next["armed"] and src.endswith("__compact_staging"):
            crash_next["armed"] = False
            raise RuntimeError("injected swap crash")
        return real_rename(src, dst, spark=spark)

    monkeypatch.setattr(zm.fsutil, "rename", flaky_rename)

    def batch_df(e):
        # interleaved ranges so every append overlaps every file
        return spark.range(40).select(
            (F.col("id") * 12 + e).alias("k"))

    overlaps_after_compact = []
    for e in range(12):
        # writer startup: heal a previous crash before touching the
        # table (the streaming maintainer's exact discipline)
        zm.zonemap_recover_compact(path)
        if e == 0:
            zm.zonemap_write(batch_df(e), path, cluster_by=["k"],
                             target_files=4, epoch_id=e)
        else:
            zm.zonemap_append(batch_df(e), path, target_files=4,
                              epoch_id=e)
        expected |= {e + 12 * i for i in range(40)}
        got = {r.k for r in zm.zonemap_read(spark, path).collect()}
        assert got == expected, f"read torn after batch {e}"
        if e % 3 == 2:
            crash_next["armed"] = (e % 2 == 0)  # every other compact
            try:
                zm.zonemap_compact(spark, path, target_files=4)
                crashed = False
            except RuntimeError:
                crashed = True
            if crashed:
                # between crash and heal: the NEXT writer step heals;
                # a zonemap_read here would find no sidecar (the
                # documented non-atomic swap window) — heal and check
                assert zm.zonemap_recover_compact(path) is True
            got = {r.k for r in zm.zonemap_read(spark, path).collect()}
            assert got == expected, f"read torn after compact {e}"
            ov = zm.zonemap_overlap(path, "k")
            overlaps_after_compact.append(ov)
            # compact (completed or healed) restores the clustered
            # floor: 4 tiled files over one dense range score ~1.0
            assert ov <= 1.05, (e, ov)
    # the soak ends healthy: vacuum finds at most crash debris, reads
    # stay exact afterwards
    zm.zonemap_vacuum(path)
    got = {r.k for r in zm.zonemap_read(spark, path).collect()}
    assert got == expected
    assert len(overlaps_after_compact) == 4


def test_append_evolve_schema_additive_widening(spark, tmp_path):
    """r9: evolve_schema=True mirrors the manifest store's additive
    contract — a batch carrying a NEW column widens the recorded
    schema atomically with the stats publish, pre-widening files
    null-fill on read, narrowing/type-drift still fail loudly, and
    pruning semantics are unchanged (the new column has no stats)."""
    from wrangle_pypes_spark.sources.zonemap import zonemap_append

    path = str(tmp_path / "ev")
    zonemap_write(spark.range(100).select(F.col("id").alias("k")),
                  path, cluster_by=["k"], target_files=2)
    # off by default: extra column fails loudly
    widened = spark.range(100, 150).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("extra"))
    with pytest.raises(ValueError, match="evolve_schema"):
        zonemap_append(widened, path)
    n = zonemap_append(widened, path, evolve_schema=True)
    assert n > 0
    got = zonemap_read(spark, path)
    assert got.columns == ["k", "extra"]
    rows = {r.k: r.extra for r in got.collect()}
    assert len(rows) == 150
    assert rows[5] is None          # pre-widening file null-fills
    assert rows[120] == 240
    # pruning on the cluster column still works across the widening
    kept, total = zonemap_files(path, between={"k": (0, 49)})
    assert len(kept) < total
    assert zonemap_read(spark, path,
                        between={"k": (0, 49)}).count() == 50
    # the new column has no stats: range-pruning it raises, as for
    # any non-stats column
    with pytest.raises(ValueError, match="no zone-map stats"):
        zonemap_read(spark, path, between={"extra": (0, 10)})
    # post-widening: a batch missing the recorded column narrows ->
    # refuse, even with evolve_schema
    with pytest.raises(ValueError, match="never narrows"):
        zonemap_append(spark.range(5).select(F.col("id").alias("k")),
                       path, evolve_schema=True)
    # type drift still refused on the evolve path
    with pytest.raises(ValueError, match="types never change"):
        zonemap_append(
            spark.range(5).select(F.col("id").cast("string").alias("k"),
                                  F.col("id").alias("extra")),
            path, evolve_schema=True)
    # a later plain append carrying the widened schema is ordinary
    assert zonemap_append(
        spark.range(150, 160).select(F.col("id").alias("k"),
                                     (F.col("id") * 2).alias("extra")),
        path) > 0
    assert zonemap_read(spark, path).count() == 160
