"""Source/sink round-trips: partitioned parquet layout, partition
pruning on read-back, jsonl/csv interchange."""

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wrangle_pypes_spark.sources import (
    read_csv,
    read_jsonl,
    write_csv,
    write_json,
    write_parquet,
)


def test_partitioned_parquet_roundtrip_and_pruning(spark, tables, tmp_path):
    out = str(tmp_path / "orders_by_status")
    o = tables["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice")
    write_parquet(o, out, partition_by=["o_orderstatus"],
                  sort_by=["o_orderkey"])

    # hive layout on disk: one dir per status value
    dirs = {os.path.basename(p) for p in glob.glob(f"{out}/o_orderstatus=*")}
    statuses = {r.o_orderstatus for r in
                o.select("o_orderstatus").distinct().collect()}
    assert dirs == {f"o_orderstatus={s}" for s in statuses}

    back = spark.read.parquet(out)
    assert back.count() == o.count()

    # partition filter must prune at plan time: the scan's PartitionFilters
    # carry the predicate and fewer files are read
    plan = back.filter(F.col("o_orderstatus") == "F") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters", 1)[1][:200]


def test_target_file_rows_controls_file_count(spark, tables, tmp_path):
    out = str(tmp_path / "sized")
    o = tables["orders"].select("o_orderkey", "o_totalprice")
    n = o.count()
    write_parquet(o, out, target_file_rows=max(1, n // 4))
    files = glob.glob(f"{out}/*.parquet")
    assert 3 <= len(files) <= 5  # ~4 files, AQE may coalesce +-1


def test_jsonl_roundtrip(spark, tables, tmp_path):
    out = str(tmp_path / "j")
    d = tables["documents"].select("doc_id", "lang")
    write_json(d, out)
    back = read_jsonl(spark, out, schema="doc_id bigint, lang string")
    assert sorted((r.doc_id, r.lang) for r in back.collect()) == \
           sorted((r.doc_id, r.lang) for r in d.collect())


def test_csv_roundtrip(spark, tables, tmp_path):
    out = str(tmp_path / "c")
    d = tables["nation"].select("n_nationkey", "n_name")
    write_csv(d, out)
    back = read_csv(spark, out, schema="n_nationkey bigint, n_name string")
    assert sorted((r.n_nationkey, r.n_name) for r in back.collect()) == \
           sorted((r.n_nationkey, r.n_name) for r in d.collect())


def test_bucketed_join_eliminates_shuffle(spark, tables):
    """Two tables bucketed by the join key into the same bucket count
    must join with ZERO exchanges (the write-once-shuffle contract)."""
    import re

    from wrangle_pypes_spark.sources import write_bucketed_table

    write_bucketed_table(tables["orders"].select("o_orderkey", "o_totalprice"),
                         "b_orders", buckets=8, bucket_by=["o_orderkey"],
                         sort_by=["o_orderkey"])
    write_bucketed_table(tables["lineitem"].select("l_orderkey", "l_quantity"),
                         "b_lineitem", buckets=8, bucket_by=["l_orderkey"],
                         sort_by=["l_orderkey"])
    o = spark.table("b_orders")
    li = spark.table("b_lineitem")
    joined = o.join(li, o.o_orderkey == li.l_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"Exchange hashpartitioning", plan), plan
    # and it still computes the right thing
    n = joined.count()
    plain = (tables["orders"].join(
        tables["lineitem"],
        tables["orders"].o_orderkey == tables["lineitem"].l_orderkey).count())
    assert n == plain


def test_parse_json_col_infers_richer_payload(spark):
    """A props payload richer than the assumed {"k": long} keeps all its
    keys when the schema is inferred (round-1 advice: the hard-coded
    schema silently nulled unknown keys)."""
    from wrangle_pypes_spark.sources.tables import infer_json_schema, parse_json_col

    df = spark.createDataFrame(
        [(1, '{"k": 7, "extra": "x", "nested": {"a": 1.5}}'),
         (2, '{"k": 8}'),
         (3, None)],
        "event_id bigint, props string")
    schema = infer_json_schema(df, "props")
    names = [f.name for f in schema.fields]
    assert set(names) == {"k", "extra", "nested"}
    parsed = parse_json_col(df, "props", out="p")
    rows = {r.event_id: r.p for r in parsed.collect()}
    assert rows[1].k == 7 and rows[1].extra == "x" and rows[1].nested.a == 1.5
    assert rows[2].k == 8 and rows[2].extra is None
    assert rows[3] is None


def test_orc_roundtrip(spark, tables, tmp_path):
    from wrangle_pypes_spark.sources import read_orc, write_orc

    path = str(tmp_path / "nation_orc")
    write_orc(tables["nation"], path)
    back = read_orc(spark, path)
    assert sorted(r.n_nationkey for r in back.collect()) == \
        sorted(r.n_nationkey for r in tables["nation"].collect())


def test_upsert_parquet_replaces_and_inserts(spark, tmp_path):
    from wrangle_pypes_spark.sources import upsert_parquet

    path = str(tmp_path / "dim")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    upsert_parquet(base, path, ["k"])                 # create
    batch = spark.createDataFrame(
        [(2, "B"), (4, "d"), (4, "d")], "k int, v string")  # dup in batch
    upsert_parquet(batch, path, ["k"])                # merge
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # replay the same batch: idempotent
    upsert_parquet(batch, path, ["k"])
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_upsert_parquet_recovers_from_crash_window(spark, tmp_path):
    """A crash between the two swap renames leaves only the ._upsert_bak
    dir; the next upsert must restore it as the table instead of
    bootstrapping from the incoming batch (silent full-table loss)."""
    import os

    from wrangle_pypes_spark.sources import upsert_parquet

    path = str(tmp_path / "dim")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    upsert_parquet(base, path, ["k"])
    # simulate the crash window: table renamed to backup, swap not done
    os.rename(path, path + "._upsert_bak")
    batch = spark.createDataFrame([(2, "B"), (4, "d")], "k int, v string")
    upsert_parquet(batch, path, ["k"])
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    assert not os.path.isdir(path + "._upsert_bak")
    # stale backup WITH a live table (crash after the swap): cleared,
    # upsert proceeds
    os.makedirs(path + "._upsert_bak/garbage")
    upsert_parquet(spark.createDataFrame([(5, "e")], "k int, v string"),
                   path, ["k"])
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d", 5: "e"}
    assert not os.path.isdir(path + "._upsert_bak")


def test_upsert_parquet_partitioned_rewrites_only_touched(spark, tmp_path):
    import glob
    import os

    from wrangle_pypes_spark.sources import upsert_parquet

    path = str(tmp_path / "facts")
    base = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-01", 20.0),
         (3, "2024-01-02", 30.0)],
        "k int, day string, val double")
    upsert_parquet(base, path, ["k"], partition_by=["day"])
    untouched = sorted(glob.glob(f"{path}/day=2024-01-02/*.parquet"))
    mtimes = [os.path.getmtime(f) for f in untouched]

    batch = spark.createDataFrame(
        [(2, "2024-01-01", 99.0), (9, "2024-01-01", 9.0)],
        "k int, day string, val double")
    upsert_parquet(batch, path, ["k"], partition_by=["day"])

    # partition-column type inference reads day= back as a date
    got = {r.k: (str(r.day), r.val)
           for r in spark.read.parquet(path).collect()}
    assert got == {1: ("2024-01-01", 10.0), 2: ("2024-01-01", 99.0),
                   3: ("2024-01-02", 30.0), 9: ("2024-01-01", 9.0)}
    # the 01-02 partition was not rewritten — same files, same mtimes
    after = sorted(glob.glob(f"{path}/day=2024-01-02/*.parquet"))
    assert after == untouched
    assert [os.path.getmtime(f) for f in after] == mtimes


def test_compact_parquet_reduces_files_preserves_data(spark, tables,
                                                      tmp_path):
    import glob

    from wrangle_pypes_spark.sources import compact_parquet

    path = str(tmp_path / "frag")
    orders = tables["orders"].select("o_orderkey", "o_totalprice")
    orders.repartition(20).write.parquet(path)
    before = glob.glob(f"{path}/*.parquet")
    assert len(before) >= 20
    want = sorted((r.o_orderkey, r.o_totalprice)
                  for r in spark.read.parquet(path).collect())

    n_out = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert n_out == 1
    after = glob.glob(f"{path}/*.parquet")
    assert len(after) == 1
    # compaction is content-neutral
    got = sorted((r.o_orderkey, r.o_totalprice)
                 for r in spark.read.parquet(path).collect())
    assert got == want
    # crash garbage from a previous run would have been cleaned up
    assert not glob.glob(f"{path}._compact_tmp")
    assert not glob.glob(f"{path}._upsert_bak")


def test_compact_parquet_targets_file_size(spark, tables, tmp_path):
    import glob

    from wrangle_pypes_spark.sources import compact_parquet
    from wrangle_pypes_spark.sources.sinks import _dir_bytes

    path = str(tmp_path / "sized")
    tables["lineitem"].write.parquet(path)
    total = _dir_bytes(path)
    # pick a target that implies 3-5 output files
    target = max(1, total // 4)
    n_out = compact_parquet(spark, path, target_file_bytes=target)
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == n_out
    assert 2 <= n_out <= 8


def test_compact_parquet_preserves_hive_partition_layout(spark, tables,
                                                         tmp_path):
    """Compacting a Hive-partitioned ROOT must keep the key=value
    directory layout (ADVICE r3): a later partitioned upsert on the
    same store would otherwise meet a mixed flat/partitioned tree."""
    import glob

    from wrangle_pypes_spark.sources import compact_parquet

    path = str(tmp_path / "hive")
    orders = tables["orders"].select(
        "o_orderkey", "o_totalprice", "o_orderpriority")
    (orders.repartition(6).write.partitionBy("o_orderpriority")
     .parquet(path))
    want = sorted((r.o_orderkey, r.o_totalprice, r.o_orderpriority)
                  for r in spark.read.parquet(path).collect())
    parts_before = sorted(
        os.path.basename(d) for d in glob.glob(f"{path}/o_orderpriority=*"))
    assert parts_before  # sanity: layout is partitioned

    compact_parquet(spark, path, target_file_bytes=1 << 30)
    parts_after = sorted(
        os.path.basename(d) for d in glob.glob(f"{path}/o_orderpriority=*"))
    assert parts_after == parts_before
    # no stray flat data files at the root
    assert not glob.glob(f"{path}/*.parquet")
    # ~one file per partition value after compaction
    for d in glob.glob(f"{path}/o_orderpriority=*"):
        assert len(glob.glob(f"{d}/*.parquet")) == 1
    got = sorted((r.o_orderkey, r.o_totalprice, r.o_orderpriority)
                 for r in spark.read.parquet(path).collect())
    assert got == want


def test_compact_parquet_recovers_crashed_swap(spark, tables, tmp_path):
    import os

    from wrangle_pypes_spark.sources import compact_parquet

    path = str(tmp_path / "crashed")
    tables["orders"].limit(200).repartition(5).write.parquet(path)
    want = spark.read.parquet(path).count()
    # simulate a crash between the two renames: table moved to backup,
    # replacement never landed
    os.rename(path, path + "._upsert_bak")
    n_out = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert n_out == 1
    assert spark.read.parquet(path).count() == want


def test_read_text_line_and_wholefile(spark, tmp_path):
    from wrangle_pypes_spark.sources import read_text

    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("solo doc body\n")
    lines = read_text(spark, str(d))
    assert sorted(r.value for r in lines.collect()) == \
        ["line one", "line two", "solo doc body"]
    docs = read_text(spark, str(d), whole_file=True, with_path=True)
    got = {r.path.rsplit("/", 1)[-1]: r.value for r in docs.collect()}
    assert got["a.txt"] == "line one\nline two\n"
    assert got["b.txt"] == "solo doc body\n"


def test_read_binary_files_glob(spark, tmp_path):
    from wrangle_pypes_spark.sources import read_binary_files

    d = tmp_path / "blobs"
    d.mkdir()
    (d / "x.bin").write_bytes(b"\x00\x01\x02")
    (d / "y.txt").write_bytes(b"nope")
    out = read_binary_files(spark, str(d), glob="*.bin").collect()
    assert len(out) == 1
    assert out[0].content == b"\x00\x01\x02" and out[0].length == 3


def test_training_shards_roundtrip_and_validate(spark, tables, tmp_path):
    from wrangle_pypes_spark.sources.sinks import (
        validate_shards, write_training_shards)
    docs = spark.read.parquet(os.path.join(
        os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
        "documents.parquet"))
    out = str(tmp_path / "shards")
    man = write_training_shards(docs, out, id_col="doc_id", num_shards=8)
    rows = man.collect()
    assert [r.shard for r in rows] == list(range(8))
    assert sum(r.n_rows for r in rows) == docs.count()
    # one data file per shard directory
    for k in range(8):
        files = [f for f in glob.glob(os.path.join(out, f"shard={k}", "*"))
                 if f.endswith(".parquet")]
        assert len(files) == 1, files
    # validation from files alone agrees with the manifest
    v = validate_shards(spark, out, id_col="doc_id").collect()
    assert all(r.rows_ok and r.content_ok for r in v)
    # deterministic: rewriting yields the identical manifest
    man2 = write_training_shards(docs, str(tmp_path / "shards2"),
                                 id_col="doc_id", num_shards=8)
    assert sorted(map(tuple, man.collect())) == sorted(
        map(tuple, man2.collect()))


def test_training_shards_detect_tamper(spark, tmp_path):
    from wrangle_pypes_spark.sources.sinks import (
        validate_shards, write_training_shards)
    df = spark.range(200).withColumnRenamed("id", "k") \
        .withColumn("payload", F.col("k") * 2)
    out = str(tmp_path / "sh")
    write_training_shards(df, out, id_col="k", num_shards=4, seed=7)
    # drop one shard's file: both checks must flag that shard only
    import shutil
    shutil.rmtree(os.path.join(out, "shard=2"))
    v = {r.shard: r for r in validate_shards(
        spark, out, id_col="k", seed=7).collect()}
    assert not v[2].rows_ok and not v[2].content_ok
    assert all(v[k].rows_ok and v[k].content_ok for k in (0, 1, 3))


def test_audit_parquet_layout_drives_compaction(spark, tmp_path):
    """The audit reports the fragmented layout, compact_parquet fixes
    it, and the audit confirms — content unchanged throughout."""
    from wrangle_pypes_spark.sources import (audit_parquet_layout,
                                             compact_parquet)

    path = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(path)

    before = audit_parquet_layout(spark, path).collect()[0]
    assert before.n_files == 40
    assert before.total_rows == 10_000
    assert before.n_small_files == 40          # all tiny
    assert before.min_rows_per_file >= 1
    assert abs(before.avg_rows_per_file - 250.0) < 1e-9

    compact_parquet(spark, path, target_file_bytes=1 << 30)
    after = audit_parquet_layout(spark, path).collect()[0]
    assert after.n_files < before.n_files
    assert after.total_rows == 10_000


def test_audit_parquet_layout_counts_empty_files(spark, tmp_path):
    """Zero-row part files are invisible to _metadata but ARE the
    small-file pathology — the listing-based counts must include them."""
    import shutil

    from wrangle_pypes_spark.sources import audit_parquet_layout

    path = str(tmp_path / "with_empty")
    spark.range(100).write.parquet(path)
    # plant an empty-but-valid parquet part file
    empty_src = str(tmp_path / "empty_src")
    spark.range(0).write.parquet(empty_src)
    import glob
    [empty_part] = glob.glob(empty_src + "/part-*.parquet")
    shutil.copy(empty_part, path + "/part-99999-empty.parquet")

    r = audit_parquet_layout(spark, path).collect()[0]
    files = glob.glob(path + "/part-*.parquet")
    assert r.n_files == len(files)           # empty file counted
    assert r.total_rows == 100
    assert r.min_rows_per_file == 0          # flags the empty file
    assert r.n_small_files == r.n_files


class TestAvroTable:
    """User-facing Avro source (sources/avro_table.py): executor-side
    encode/decode round trips, nulls, schema gates."""

    def test_round_trip_partitioned(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.avro_table import (
            read_avro,
            write_avro,
        )
        df = spark.range(0, 500).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).cast("double").alias("x"),
            F.concat(F.lit("s"), F.col("id")).alias("s"),
            (F.col("id") % 2 == 0).alias("flag"))
        p = str(tmp_path / "t")
        n_files = write_avro(df.repartition(5), p)
        assert n_files == 5
        back = read_avro(spark, p)
        assert back.schema == T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("s", T.StringType()),
            T.StructField("flag", T.BooleanType())])
        assert sorted(map(tuple, back.collect())) \
            == sorted(map(tuple, df.collect()))

    def test_nulls_and_binary(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.avro_table import (
            read_avro,
            write_avro,
        )
        df = spark.createDataFrame(
            [(1, None, b"xy"), (None, "a", None)],
            "k long, v string, b binary")
        p = str(tmp_path / "t")
        write_avro(df, p)
        assert sorted(((r["k"], r["v"], r["b"])
                       for r in read_avro(spark, p).collect()),
                      key=str) \
            == sorted([(None, "a", None), (1, None, b"xy")], key=str)

    def test_unsupported_type_is_loud(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.avro_io import AvroError
        from wrangle_pypes_spark.sources.avro_table import write_avro
        df = spark.range(1).select(
            F.array(F.lit(1)).alias("a"))
        with pytest.raises(AvroError, match="unsupported"):
            write_avro(df, str(tmp_path / "t"))

    def test_missing_dir_is_loud(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.avro_table import read_avro
        with pytest.raises(FileNotFoundError):
            read_avro(spark, str(tmp_path / "nope"))
