"""Iceberg read seam + the pure-Python Avro codec under it.

Avro decode correctness is pinned two ways: encoder round-trips AND a
container file assembled BY HAND from raw bytes straight out of the
Avro 1.11 spec (magic, metadata map, zigzag varints, deflate block) —
a path the encoder never touches.  Iceberg fixtures are spec-shaped
(field names from the Iceberg table spec's manifest/manifest-list
schemas) so the reader exercises the same shapes a real engine writes.
"""

import json
import os
import struct
import zlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wrangle_pypes_spark.sources import avro_io as A
from wrangle_pypes_spark.sources.iceberg import (
    IcebergProtocolError,
    iceberg_snapshot,
    read_iceberg,
)


class TestAvroSpecVectors:
    def test_zigzag_spec_table(self):
        # the exact example table from the Avro spec
        for value, enc in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                           (-2, b"\x03"), (2, b"\x04"),
                           (-64, b"\x7f"), (64, b"\x80\x01")]:
            assert A._zigzag(value) == enc
            assert A._Reader(enc).read_long() == value

    def test_hand_assembled_container(self):
        """Decode a container built from raw bytes only — independent
        of our encoder."""
        schema = {"type": "record", "name": "t", "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
            {"name": "c", "type": ["null", "double"]}]}
        schema_raw = json.dumps(schema).encode()

        def zz(n):  # local, independent zigzag varint
            u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
            out = b""
            while True:
                byte = u & 0x7F
                u >>= 7
                if u:
                    out += bytes([byte | 0x80])
                else:
                    return out + bytes([byte])

        # two records: (3, "hi", null), (-1, "", 2.5)
        body = (zz(3) + zz(2) + b"hi" + zz(0)
                + zz(-1) + zz(0) + zz(1) + struct.pack("<d", 2.5))
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        payload = comp.compress(body) + comp.flush()
        sync = bytes(range(16))
        blob = (b"Obj\x01"
                + zz(2)  # 2 metadata entries
                + zz(len(b"avro.schema")) + b"avro.schema"
                + zz(len(schema_raw)) + schema_raw
                + zz(len(b"avro.codec")) + b"avro.codec"
                + zz(len(b"deflate")) + b"deflate"
                + zz(0)
                + sync
                + zz(2) + zz(len(payload)) + payload
                + sync)
        got_schema, records = A.read_container(blob)
        assert got_schema["name"] == "t"
        assert records == [{"a": 3, "b": "hi", "c": None},
                           {"a": -1, "b": "", "c": 2.5}]

    def test_corruption_is_loud(self):
        schema = {"type": "record", "name": "t",
                  "fields": [{"name": "a", "type": "long"}]}
        blob = bytearray(A.write_container(schema, [{"a": 1}]))
        with pytest.raises(A.AvroError, match="magic"):
            A.read_container(b"Nope" + bytes(blob[4:]))
        blob[-1] ^= 0xFF  # trailing sync marker
        with pytest.raises(A.AvroError, match="sync"):
            A.read_container(bytes(blob))

    def test_unknown_codec_gates(self):
        schema = {"type": "record", "name": "t",
                  "fields": [{"name": "a", "type": "long"}]}
        blob = A.write_container(schema, [{"a": 1}], codec="null")
        blob = blob.replace(b"null", b"lzo4")
        with pytest.raises(NotImplementedError, match="lzo4"):
            A.read_container(blob)

    def test_roundtrip_kitchen_sink(self):
        schema = {"type": "record", "name": "ks", "fields": [
            {"name": "i", "type": "int"},
            {"name": "f", "type": "float"},
            {"name": "by", "type": "bytes"},
            {"name": "bo", "type": "boolean"},
            {"name": "arr", "type": {"type": "array",
                                     "items": ["null", "long"]}},
            {"name": "mp", "type": {"type": "map", "values": "string"}},
            {"name": "en", "type": {"type": "enum", "name": "E",
                                    "symbols": ["X", "Y", "Z"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "F8",
                                    "size": 8}}]}
        recs = [{"i": -5, "f": 1.5, "by": b"\x00\xff", "bo": True,
                 "arr": [1, None, 3], "mp": {"k": "v", "": "w"},
                 "en": "Z", "fx": b"12345678"},
                {"i": 0, "f": -0.5, "by": b"", "bo": False,
                 "arr": [], "mp": {}, "en": "X", "fx": b"abcdefgh"}]
        for codec in ("null", "deflate"):
            _, out = A.read_container(
                A.write_container(schema, recs, codec=codec))
            assert out == recs


# --------------------------------------------------------------------------
# Iceberg fixtures (spec-shaped)
# --------------------------------------------------------------------------

_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
    ]}


def _manifest_schema(partition_fields):
    return {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102",
                        "fields": partition_fields}},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ]}}]}


def _one_parquet(spark, df, dest: str) -> None:
    stage = dest + "_stage"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(n for n in os.listdir(stage) if n.endswith(".parquet"))
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    os.replace(os.path.join(stage, part), dest)
    import shutil
    shutil.rmtree(stage)


def _write_metadata(tbl, *, schemas, specs, snapshots, current,
                    version=1, fmt=2):
    meta = {
        "format-version": fmt, "table-uuid": "0" * 32, "location": tbl,
        "last-sequence-number": len(snapshots),
        "last-updated-ms": 0, "last-column-id": 99,
        "current-schema-id": 0, "schemas": schemas,
        "default-spec-id": 0, "partition-specs": specs,
        "last-partition-id": 1000, "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": current, "snapshots": snapshots,
    }
    mdir = os.path.join(tbl, "metadata")
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, f"v{version}.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write(str(version))


_SCHEMA_KP = [{"type": "struct", "schema-id": 0, "fields": [
    {"id": 1, "name": "k", "required": False, "type": "long"},
    {"id": 2, "name": "p", "required": False, "type": "int"},
]}]
_SPEC_P = [{"spec-id": 0, "fields": [
    {"name": "p", "transform": "identity", "source-id": 2,
     "field-id": 1000}]}]


def _build_table(spark, tbl, *, embed_partition_col: bool):
    """Two snapshots: s1 adds files A+B, s2 marks B deleted and adds C.
    Live at s2: A + C."""
    pf = [{"name": "p", "type": ["null", "int"]}]
    data = {}
    for name, lo, p in (("A", 0, 1), ("B", 100, 2), ("C", 200, 1)):
        df = spark.range(lo, lo + 5).select(
            F.col("id").alias("k"), F.lit(p).alias("p"))
        if not embed_partition_col:
            df = df.select("k")
        dest = os.path.join(tbl, "data", f"{name}.parquet")
        _one_parquet(spark, df, dest)
        data[name] = (dest, p)

    def entry(name, status):
        dest, p = data[name]
        return {"status": status, "snapshot_id": None,
                "data_file": {"content": 0, "file_path": dest,
                              "file_format": "PARQUET",
                              "partition": {"p": p},
                              "record_count": 5,
                              "file_size_in_bytes": 1}}

    mdir = os.path.join(tbl, "metadata")
    m1 = os.path.join(mdir, "m1.avro")
    A.write_container_file(m1, _manifest_schema(pf),
                           [entry("A", 1), entry("B", 1)])
    m2 = os.path.join(mdir, "m2.avro")
    A.write_container_file(m2, _manifest_schema(pf),
                           [entry("A", 0), entry("B", 2),
                            entry("C", 1)])

    def mlist(path, manifests):
        A.write_container_file(path, _MANIFEST_LIST_SCHEMA, [
            {"manifest_path": m, "manifest_length": 1,
             "partition_spec_id": 0, "content": 0,
             "added_snapshot_id": 1} for m in manifests])

    ml1 = os.path.join(mdir, "snap-1.avro")
    mlist(ml1, [m1])
    ml2 = os.path.join(mdir, "snap-2.avro")
    mlist(ml2, [m2])
    snapshots = [
        {"snapshot-id": 1, "sequence-number": 1, "timestamp-ms": 0,
         "manifest-list": ml1,
         "summary": {"operation": "append"}},
        {"snapshot-id": 2, "sequence-number": 2, "timestamp-ms": 0,
         "manifest-list": ml2,
         "summary": {"operation": "overwrite"}},
    ]
    _write_metadata(tbl, schemas=_SCHEMA_KP, specs=_SPEC_P,
                    snapshots=snapshots, current=2)


class TestIcebergRead:
    def test_snapshot_resolution_and_read(self, spark, tmp_path):
        tbl = str(tmp_path / "ice")
        _build_table(spark, tbl, embed_partition_col=True)
        snap = iceberg_snapshot(spark, tbl)
        assert snap.snapshot_id == 2 and len(snap.files) == 2
        out = read_iceberg(spark, tbl)
        ks = sorted(r["k"] for r in out.collect())
        assert ks == list(range(0, 5)) + list(range(200, 205))
        assert out.schema["p"].dataType == T.IntegerType()
        # time travel to snapshot 1: A + B live
        old = read_iceberg(spark, tbl, snapshot_id=1)
        assert sorted(r["k"] for r in old.collect()) \
            == list(range(0, 5)) + list(range(100, 105))

    def test_metadata_only_partition_column(self, spark, tmp_path):
        tbl = str(tmp_path / "ice2")
        _build_table(spark, tbl, embed_partition_col=False)
        out = read_iceberg(spark, tbl)
        rows = sorted((r["k"], r["p"]) for r in out.collect())
        assert rows == [(k, 1) for k in range(0, 5)] \
            + [(k, 1) for k in range(200, 205)]
        assert out.schema["p"].dataType == T.IntegerType()

    def test_format_version_gate(self, spark, tmp_path):
        # v3 without v3-only row features reads like v2 (r13)…
        tbl = str(tmp_path / "ice3")
        _write_metadata(tbl, schemas=_SCHEMA_KP, specs=_SPEC_P,
                        snapshots=[], current=-1, fmt=3)
        assert iceberg_snapshot(spark, tbl).files == []
        # …v4 still gates
        tbl4 = str(tmp_path / "ice4v")
        _write_metadata(tbl4, schemas=_SCHEMA_KP, specs=_SPEC_P,
                        snapshots=[], current=-1, fmt=4)
        with pytest.raises(IcebergProtocolError, match="format-version"):
            iceberg_snapshot(spark, tbl4)

    def test_unknown_content_gate(self, spark, tmp_path):
        """content values beyond the v2 spec (0/1/2) gate loudly."""
        tbl = str(tmp_path / "ice4")
        mdir = os.path.join(tbl, "metadata")
        pf = [{"name": "p", "type": ["null", "int"]}]
        m1 = os.path.join(mdir, "m1.avro")
        A.write_container_file(m1, _manifest_schema(pf), [
            {"status": 1, "snapshot_id": None,
             "data_file": {"content": 3, "file_path": "d.parquet",
                           "file_format": "PARQUET",
                           "partition": {"p": 1}, "record_count": 1,
                           "file_size_in_bytes": 1}}])
        ml = os.path.join(mdir, "snap-1.avro")
        A.write_container_file(ml, _MANIFEST_LIST_SCHEMA, [
            {"manifest_path": m1, "manifest_length": 1,
             "partition_spec_id": 0, "content": 0,
             "added_snapshot_id": 1}])
        _write_metadata(tbl, schemas=_SCHEMA_KP, specs=_SPEC_P,
                        snapshots=[{"snapshot-id": 1,
                                    "sequence-number": 1,
                                    "timestamp-ms": 0,
                                    "manifest-list": ml,
                                    "summary": {}}],
                        current=1)
        with pytest.raises(IcebergProtocolError,
                           match="unknown data_file content"):
            iceberg_snapshot(spark, tbl)

    def test_non_parquet_delete_file_gate(self, spark, tmp_path):
        tbl = str(tmp_path / "ice5")
        mdir = os.path.join(tbl, "metadata")
        pf = [{"name": "p", "type": ["null", "int"]}]
        m1 = os.path.join(mdir, "m1.avro")
        A.write_container_file(m1, _manifest_schema(pf), [
            {"status": 1, "snapshot_id": None,
             "data_file": {"content": 1, "file_path": "d.orc",
                           "file_format": "ORC",
                           "partition": {"p": 1}, "record_count": 1,
                           "file_size_in_bytes": 1}}])
        ml = os.path.join(mdir, "snap-1.avro")
        A.write_container_file(ml, _MANIFEST_LIST_SCHEMA, [
            {"manifest_path": m1, "manifest_length": 1,
             "partition_spec_id": 0, "content": 1,
             "added_snapshot_id": 1}])
        _write_metadata(tbl, schemas=_SCHEMA_KP, specs=_SPEC_P,
                        snapshots=[{"snapshot-id": 1,
                                    "sequence-number": 1,
                                    "timestamp-ms": 0,
                                    "manifest-list": ml,
                                    "summary": {}}],
                        current=1)
        with pytest.raises(IcebergProtocolError,
                           match="delete file format"):
            iceberg_snapshot(spark, tbl)

    def test_empty_table(self, spark, tmp_path):
        tbl = str(tmp_path / "ice6")
        _write_metadata(tbl, schemas=_SCHEMA_KP, specs=_SPEC_P,
                        snapshots=[], current=-1)
        out = read_iceberg(spark, tbl)
        assert out.count() == 0
        assert out.schema.fieldNames() == ["k", "p"]

    def test_not_a_table(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError, match="metadata"):
            iceberg_snapshot(spark, str(tmp_path / "nope"))

    def test_type_conversion(self):
        from wrangle_pypes_spark.sources.iceberg import _to_spark_type
        ice = {"type": "struct", "fields": [
            {"id": 1, "name": "d", "required": True,
             "type": "decimal(10, 2)"},
            {"id": 2, "name": "ts", "required": False,
             "type": "timestamptz"},
            {"id": 3, "name": "xs", "required": False,
             "type": {"type": "list", "element-id": 4,
                      "element": "string",
                      "element-required": False}},
            {"id": 5, "name": "m", "required": False,
             "type": {"type": "map", "key-id": 6, "key": "string",
                      "value-id": 7, "value": "double",
                      "value-required": False}},
            {"id": 8, "name": "fx", "required": False,
             "type": "fixed[16]"},
        ]}
        st = _to_spark_type(ice)
        assert st["d"].dataType == T.DecimalType(10, 2)
        assert not st["d"].nullable
        assert st["ts"].dataType == T.TimestampType()
        assert st["xs"].dataType == T.ArrayType(T.StringType(), True)
        assert st["m"].dataType == T.MapType(T.StringType(),
                                             T.DoubleType(), True)
        assert st["fx"].dataType == T.BinaryType()
        with pytest.raises(IcebergProtocolError):
            _to_spark_type("geometry")


class TestIcebergWriter:
    def test_write_read_roundtrip(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import write_iceberg

        tbl = str(tmp_path / "w1")
        df = spark.range(0, 60).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("p"),
            (F.col("id") * 2).alias("v"))
        s1 = write_iceberg(df, tbl, partition_by=["p"])
        assert s1 == 1
        out = read_iceberg(spark, tbl)
        assert out.count() == 60
        # hive staging drops partition cols from data files; reader
        # must reattach them typed from the manifests
        assert out.schema["p"].dataType == T.LongType()
        assert out.filter("p = k % 3").count() == 60

        s2 = write_iceberg(df.filter("k < 10"), tbl)
        assert s2 == 2
        assert read_iceberg(spark, tbl).count() == 70
        # snapshot time travel
        assert read_iceberg(spark, tbl, snapshot_id=s1).count() == 60

        s3 = write_iceberg(df.filter("k >= 50"), tbl, mode="overwrite")
        assert read_iceberg(spark, tbl).count() == 10
        assert read_iceberg(spark, tbl, snapshot_id=s2).count() == 70
        snap = iceberg_snapshot(spark, tbl)
        assert snap.snapshot_id == s3

    def test_writer_guards(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import write_iceberg

        tbl = str(tmp_path / "w2")
        df = spark.range(0, 5).select(F.col("id").alias("k"),
                                      F.lit("a").alias("p"))
        write_iceberg(df, tbl, partition_by=["p"])
        with pytest.raises(ValueError, match="partition_by"):
            write_iceberg(df, tbl, partition_by=["k"])
        with pytest.raises(ValueError, match="schema mismatch"):
            write_iceberg(df.select("p", F.col("k").alias("x")), tbl)
        with pytest.raises(IcebergProtocolError, match="unsupported"):
            write_iceberg(
                spark.range(1).select(F.array(F.lit(1)).alias("a")),
                str(tmp_path / "w3"))

    def test_commit_race_is_loud(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import write_iceberg

        tbl = str(tmp_path / "w4")
        df = spark.range(0, 5).select(F.col("id").alias("k"))
        write_iceberg(df, tbl)
        # steal v2.metadata.json before the writer publishes it
        from wrangle_pypes_spark.sources import iceberg as imod
        real = imod._create_exclusive if hasattr(
            imod, "_create_exclusive") else None
        from wrangle_pypes_spark.sources import delta as dmod
        orig = dmod._create_exclusive

        def steal(path, text, spark=None):
            if path.endswith("v2.metadata.json"):
                with open(path, "w") as f:
                    f.write("{}")
            return orig(path, text, spark)

        import wrangle_pypes_spark.sources.delta
        try:
            wrangle_pypes_spark.sources.delta._create_exclusive = steal
            with pytest.raises(RuntimeError, match="concurrent"):
                write_iceberg(df, tbl)
        finally:
            wrangle_pypes_spark.sources.delta._create_exclusive = orig


class TestAvroSnappy:
    def test_snappy_container_decodes(self):
        """A snappy container hand-assembled per spec (raw-snappy block
        + CRC32 suffix) — real Iceberg writers commonly use snappy."""
        import pyarrow as pa

        schema = {"type": "record", "name": "t", "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"}]}
        recs = [{"a": 1, "b": "x"}, {"a": -2, "b": "yy"}]
        body = b"".join(
            A._zigzag(r["a"]) + A._zigzag(len(r["b"]))
            + r["b"].encode() for r in recs)
        payload = (pa.Codec("snappy").compress(body, asbytes=True)
                   + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))
        schema_raw = json.dumps(schema).encode()
        sync = bytes(range(16))
        blob = (b"Obj\x01" + A._zigzag(2)
                + A._zigzag(11) + b"avro.schema"
                + A._zigzag(len(schema_raw)) + schema_raw
                + A._zigzag(10) + b"avro.codec"
                + A._zigzag(6) + b"snappy"
                + A._zigzag(0) + sync
                + A._zigzag(2) + A._zigzag(len(payload)) + payload
                + sync)
        _, out = A.read_container(blob)
        assert out == recs

    def test_snappy_crc_mismatch_is_loud(self):
        import pyarrow as pa

        body = b"payload bytes here"
        bad = (pa.Codec("snappy").compress(body, asbytes=True)
               + struct.pack(">I", 0))
        with pytest.raises(A.AvroError, match="CRC"):
            A._decompress(bad, "snappy")


def test_iceberg_fast_path_no_unions(spark, tmp_path):
    """Writer-produced tables (hive segments under data/) read as ONE
    basePath scan — no per-partition unions in the driver plan."""
    from wrangle_pypes_spark.sources.iceberg import write_iceberg

    tbl = str(tmp_path / "fp")
    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("p"))
    write_iceberg(df, tbl, partition_by=["p"])
    out = read_iceberg(spark, tbl)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert out.count() == 40
    assert out.schema["p"].dataType == T.LongType()
    assert out.filter("p = k % 4").count() == 40


class TestRowLevelDeletes:
    """v2 merge-on-read: position + equality deletes with sequence
    semantics."""

    def test_equality_delete_lifecycle(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            write_iceberg,
            write_iceberg_deletes,
        )

        tbl = str(tmp_path / "eq")
        df = spark.range(0, 20).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
        write_iceberg(df, tbl)  # seq 1
        keys = spark.range(0, 20).filter("id % 3 = 0") \
            .select(F.col("id").alias("k"))
        sid = write_iceberg_deletes(keys, tbl, equality_cols=["k"])
        out = read_iceberg(spark, tbl)
        ks = sorted(r["k"] for r in out.collect())
        assert ks == [k for k in range(20) if k % 3 != 0]
        # rows RE-INSERTED after the delete survive (data_seq >= del)
        write_iceberg(df.filter("k IN (0, 3)"), tbl)  # seq 3
        ks2 = sorted(r["k"] for r in read_iceberg(spark, tbl).collect())
        assert 0 in ks2 and 3 in ks2 and 6 not in ks2
        # time travel to before the delete still sees everything
        assert read_iceberg(spark, tbl, snapshot_id=1).count() == 20
        snap = iceberg_snapshot(spark, tbl)
        assert len(snap.delete_files) == 1
        assert snap.delete_files[0]["content"] == 2

    def test_equality_delete_guards(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            write_iceberg,
            write_iceberg_deletes,
        )

        tbl = str(tmp_path / "eqg")
        df = spark.range(0, 5).select(F.col("id").alias("k"))
        write_iceberg(df, tbl)
        with pytest.raises(ValueError, match="not in table schema"):
            write_iceberg_deletes(
                df.select(F.col("k").alias("zzz")), tbl,
                equality_cols=["zzz"])
        with pytest.raises(ValueError, match="must equal"):
            write_iceberg_deletes(
                df.select(F.col("k"), F.lit(1).alias("extra")), tbl,
                equality_cols=["k"])

    def test_position_delete_with_sequence_gating(self, spark,
                                                  tmp_path):
        """Foreign-shaped fixture: position deletes kill (file, pos)
        pairs only for data at or below the delete's sequence."""
        from wrangle_pypes_spark.sources.iceberg import write_iceberg

        tbl = str(tmp_path / "pos")
        df = spark.range(0, 8).select(F.col("id").alias("k"))
        write_iceberg(df.filter("k < 4"), tbl)   # file A, seq 1
        write_iceberg(df.filter("k >= 4"), tbl)  # file B, seq 2
        snap = iceberg_snapshot(spark, tbl)
        by_seq = {f["seq"]: f["path"] for f in snap.files}
        assert set(by_seq) == {1, 2}

        # which k lives at position 0 of each file?
        probe = (spark.read.parquet(*[f["path"] for f in snap.files])
                 .select("k", F.col("_metadata.file_path").alias("fp"),
                         F.col("_metadata.row_index").alias("ri"))
                 .collect())
        import re as _re
        k_at = {( _re.sub("^file:/+", "/", r["fp"]), r["ri"]): r["k"]
                for r in probe}
        kill_a = k_at[(by_seq[1], 0)]  # applies: data seq 1 <= del 1
        kill_b = k_at[(by_seq[2], 0)]  # must NOT apply: seq 2 > del 1

        # hand-build a position-delete file + delete manifest at seq 1
        deld = spark.createDataFrame(
            [(by_seq[1], 0), (by_seq[2], 0)],
            "file_path string, pos long")
        _one_parquet(spark, deld,
                     os.path.join(tbl, "data", "posdel.parquet"))
        mdir = os.path.join(tbl, "metadata")
        mdel_schema = {
            "type": "record", "name": "manifest_entry", "fields": [
                {"name": "status", "type": "int"},
                {"name": "snapshot_id", "type": ["null", "long"]},
                {"name": "data_file", "type": {
                    "type": "record", "name": "r2", "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "partition",
                         "type": {"type": "record", "name": "r102",
                                  "fields": []}},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes",
                         "type": "long"}]}}]}
        mpath = os.path.join(mdir, "m-posdel.avro")
        A.write_container_file(mpath, mdel_schema, [{
            "status": 1, "snapshot_id": None,
            "data_file": {"content": 1,
                          "file_path": os.path.join(
                              tbl, "data", "posdel.parquet"),
                          "file_format": "PARQUET", "partition": {},
                          "record_count": 2,
                          "file_size_in_bytes": 1}}])
        # splice a snapshot 3 whose manifest list = current + deletes
        # (delete manifest at sequence 1 — OLDER than file B's data)
        meta = json.loads(open(os.path.join(
            mdir, "v3.metadata.json")).read()) if os.path.exists(
            os.path.join(mdir, "v3.metadata.json")) else None
        import json as _json
        mf = os.path.join(mdir, "v2.metadata.json")
        meta = _json.loads(open(mf).read())
        cur = next(s for s in meta["snapshots"]
                   if s["snapshot-id"] == meta["current-snapshot-id"])
        _, prev = A.read_container_file(cur["manifest-list"])
        mlpath = os.path.join(mdir, "snap-3-del.avro")
        A.write_container_file(
            mlpath, A.read_container_file(cur["manifest-list"])[0],
            [{"sequence_number": None, **e} for e in prev]
            + [{"manifest_path": mpath, "manifest_length": 1,
                "partition_spec_id": 0, "content": 1,
                "sequence_number": 1, "added_snapshot_id": 3}])
        meta["snapshots"].append(
            {"snapshot-id": 3, "sequence-number": 3, "timestamp-ms": 0,
             "manifest-list": mlpath, "summary": {"operation": "delete"}})
        meta["current-snapshot-id"] = 3
        with open(os.path.join(mdir, "v3.metadata.json"), "w") as f:
            f.write(_json.dumps(meta))
        with open(os.path.join(mdir, "version-hint.text"), "w") as f:
            f.write("3")

        ks = sorted(r["k"] for r in read_iceberg(spark, tbl).collect())
        expect = sorted(set(range(8)) - {kill_a})
        assert ks == expect, (ks, kill_a, kill_b)
        assert kill_b in ks  # survived: its data is newer than the del

    def test_delete_where_position_writer(self, spark, tmp_path):
        """r13 iceberg_delete_where: predicate rows vanish, appended
        rows after the delete survive even at matching positions,
        repeated deletes compose, already-dead rows don't re-match."""
        import pyarrow.parquet as pq

        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_delete_where,
            write_iceberg,
        )

        tbl = str(tmp_path / "pdw")
        df = spark.range(0, 30).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("p"))
        write_iceberg(df, tbl, partition_by=["p"])        # seq 1
        sid = iceberg_delete_where(spark, tbl, "k % 4 = 0")
        assert sorted(r["k"] for r in
                      read_iceberg(spark, tbl).collect()) \
            == [k for k in range(30) if k % 4 != 0]
        # second predicate composes; multiples of 12 already dead
        iceberg_delete_where(spark, tbl, "k % 6 = 0")
        assert sorted(r["k"] for r in
                      read_iceberg(spark, tbl).collect()) \
            == [k for k in range(30) if k % 4 != 0 and k % 6 != 0]
        # append AFTER the deletes: new rows survive (newer data seq)
        write_iceberg(df.filter("k IN (0, 4, 6)"), tbl)
        ks = sorted(r["k"] for r in read_iceberg(spark, tbl).collect())
        assert 0 in ks and 4 in ks and 6 in ks and 8 not in ks
        # time travel to before the deletes sees everything
        assert read_iceberg(spark, tbl, snapshot_id=1).count() == 30
        # no-match predicate commits nothing
        snap0 = iceberg_snapshot(spark, tbl)
        same = iceberg_delete_where(spark, tbl, "k = 99999")
        assert same == snap0.snapshot_id
        # the delete file is spec-shaped: reserved field ids + sorted
        snap = iceberg_snapshot(spark, tbl)
        pos_files = [f for f in snap.delete_files
                     if f["content"] == 1]
        assert len(pos_files) == 2
        s = pq.ParquetFile(pos_files[0]["path"]).schema_arrow
        assert s.field("file_path").metadata[b"PARQUET:field_id"] \
            == b"2147483546"
        assert s.field("pos").metadata[b"PARQUET:field_id"] \
            == b"2147483545"
        t = pq.read_table(pos_files[0]["path"]).to_pylist()
        assert t == sorted(t, key=lambda r: (r["file_path"],
                                             r["pos"]))

    def test_delete_where_needs_v2(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            IcebergProtocolError,
            iceberg_delete_where,
            write_iceberg,
        )
        tbl = str(tmp_path / "pdv1")
        write_iceberg(spark.range(3).select(F.col("id").alias("k")),
                      tbl)
        import json as _json
        mdir = os.path.join(tbl, "metadata")
        mf = os.path.join(mdir, "v1.metadata.json")
        meta = _json.loads(open(mf).read())
        meta["format-version"] = 1
        with open(mf, "w") as f:
            f.write(_json.dumps(meta))
        with pytest.raises(IcebergProtocolError, match="format-ver"):
            iceberg_delete_where(spark, tbl, "k = 1")


class TestTransforms:
    """Partition transforms: spec Appendix B hash vectors, transform
    evaluation, the transform-partitioned writer, and manifest-tuple
    file pruning (r12)."""

    def test_spec_hash_vectors(self):
        """The published Appendix B reference values."""
        import datetime as dt

        from wrangle_pypes_spark.sources.iceberg import (
            _bucket_hash_bytes,
            murmur3_32,
        )
        assert murmur3_32(_bucket_hash_bytes(34, "int")) == 2017239379
        assert murmur3_32(_bucket_hash_bytes(34, "long")) == 2017239379
        assert murmur3_32(
            _bucket_hash_bytes("iceberg", "string")) == 1210000089
        assert murmur3_32(_bucket_hash_bytes(
            dt.date(2017, 11, 16), "date")) \
            == (-653330422) & 0xFFFFFFFF
        assert murmur3_32(_bucket_hash_bytes(
            dt.datetime(2017, 11, 16, 22, 31, 8), "timestamp")) \
            == (-2047944441) & 0xFFFFFFFF

    def test_eval_transform(self):
        import datetime as dt

        from wrangle_pypes_spark.sources.iceberg import eval_transform
        d = dt.date(2017, 11, 16)
        assert eval_transform("day", d, "date") == 17486
        assert eval_transform("month", "2017-11-16", "date") == 574
        assert eval_transform("year", d, "date") == 47
        assert eval_transform("truncate[10]", -1, "int") == -10
        assert eval_transform("truncate[3]", "iceberg", "string") \
            == "ice"
        assert eval_transform("identity", 5, "int") == 5
        assert eval_transform("void", 5, "int") is None

    def test_transform_write_prune_read(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_snapshot,
            read_iceberg,
            write_iceberg,
        )
        tbl = str(tmp_path / "t")
        df = spark.range(0, 400).select(
            F.col("id").alias("k"),
            F.expr("date_add(DATE'1995-01-01', "
                   "CAST(id % 120 AS INT))").alias("d"),
            (F.col("id") % 50).alias("u"))
        write_iceberg(df, tbl,
                      partition_by=[("month", "d"),
                                    ("bucket[4]", "u")])
        snap = iceberg_snapshot(spark, tbl)
        assert {f["name"] for f in snap.partition_spec} \
            == {"d_month", "u_bucket"}
        # unpruned read: source columns survive in data files
        assert read_iceberg(spark, tbl).count() == 400
        # month pruning by SOURCE value: only that month's files open
        out = read_iceberg(
            spark, tbl, partition_filter={"d": "1995-02-10"})
        n_all = len(snap.files)
        pruned = out.select(
            F.input_file_name().alias("f")).distinct().count()
        assert pruned < n_all
        got = out.filter("d >= DATE'1995-02-01' "
                         "AND d < DATE'1995-03-01'")
        want = df.filter("d >= DATE'1995-02-01' "
                         "AND d < DATE'1995-03-01'")
        assert got.count() == want.count() > 0
        # bucket pruning: filtering u=7 keeps every k with u==7
        b = read_iceberg(spark, tbl, partition_filter={"u": 7})
        assert sorted(r["k"] for r in
                      b.filter("u = 7").collect()) \
            == sorted(r["k"] for r in
                      df.filter("u = 7").collect())
        bf = b.select(F.input_file_name().alias("f")) \
            .distinct().count()
        assert bf < n_all
        # both filters compose
        both = read_iceberg(spark, tbl,
                            partition_filter={"d": "1995-02-10",
                                              "u": 7})
        assert both.select(F.input_file_name().alias("f")) \
            .distinct().count() <= min(pruned, bf)
        # unknown key is loud
        with pytest.raises(ValueError, match="neither"):
            read_iceberg(spark, tbl, partition_filter={"zz": 1})

    def test_manifest_stats_are_real(self, spark, tmp_path):
        """ADVICE r11: record_count/file sizes/manifest_length must be
        real so a foreign engine's metadata-only planning is right."""
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_snapshot,
            write_iceberg,
        )
        tbl = str(tmp_path / "t")
        df = spark.range(0, 97).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("p"))
        write_iceberg(df, tbl, partition_by=["p"])
        snap = iceberg_snapshot(spark, tbl)
        assert sum(f["records"] for f in snap.files) == 97
        assert all(f["records"] > 0 for f in snap.files)
        # manifest list entries carry the true manifest byte length
        meta = snap.metadata
        cur = next(s for s in meta["snapshots"]
                   if s["snapshot-id"] == meta["current-snapshot-id"])
        _, ml = A.read_container_file(cur["manifest-list"])
        for e in ml:
            assert e["manifest_length"] == os.path.getsize(
                e["manifest_path"])
        # manifest avro schemas carry the spec's field ids
        schema, _ = A.read_container_file(ml[0]["manifest_path"])
        by_name = {f["name"]: f for f in schema["fields"]}
        assert by_name["status"]["field-id"] == 0
        df_fields = {f["name"]: f for f in
                     by_name["data_file"]["type"]["fields"]}
        assert df_fields["file_path"]["field-id"] == 100
        assert df_fields["record_count"]["field-id"] == 103

    def test_append_type_drift_is_loud(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import write_iceberg
        tbl = str(tmp_path / "t")
        df = spark.range(0, 5).select(F.col("id").alias("k"),
                                      F.lit("x").alias("p"))
        write_iceberg(df, tbl, partition_by=["p"])
        with pytest.raises(ValueError, match="type mismatch"):
            write_iceberg(
                df.select(F.col("k").cast("int").alias("k"), "p"),
                tbl)

    def test_parallel_manifest_decode(self, spark, tmp_path):
        """6 appends -> >=6 manifests: planning takes the
        executor-parallel decode path; with a filter, the driver
        receives only the pruned entry list."""
        from wrangle_pypes_spark.sources import iceberg as I
        tbl = str(tmp_path / "t")
        df = spark.range(0, 60).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("p"))
        for i in range(6):
            I.write_iceberg(df.filter(F.col("k") % 6 == i), tbl,
                            partition_by=["p"] if i == 0 else None)
        snap = I.iceberg_snapshot(spark, tbl)
        # one manifest per append; with hash write distribution each
        # append (a single p value here) stages exactly one file
        assert len(snap.files) >= 6
        assert I.read_iceberg(spark, tbl).count() == 60
        pruned = I.iceberg_snapshot(spark, tbl,
                                    partition_filter={"p": "1"})
        assert 0 < len(pruned.files) < len(snap.files)
        assert all(f["partition"].get("p") == "1"
                   for f in pruned.files)
        out = I.read_iceberg(spark, tbl, partition_filter={"p": "1"})
        assert sorted(r["k"] for r in out.collect()) \
            == sorted(r["k"] for r in
                      df.filter("p = '1'").collect())

    def test_snapshot_as_of_timestamp(self, spark, tmp_path):
        import time as _time

        from wrangle_pypes_spark.sources.iceberg import (
            read_iceberg,
            write_iceberg,
        )
        tbl = str(tmp_path / "t")
        df = spark.range(0, 5).select(F.col("id").alias("k"))
        write_iceberg(df, tbl)
        mid = int(_time.time() * 1000)
        _time.sleep(0.05)
        write_iceberg(df, tbl)
        assert read_iceberg(spark, tbl,
                            as_of_timestamp_ms=mid).count() == 5
        assert read_iceberg(spark, tbl).count() == 10
        with pytest.raises(ValueError, match="no snapshot at or"):
            read_iceberg(spark, tbl, as_of_timestamp_ms=mid - 10**7)
        with pytest.raises(ValueError, match="mutually exclusive"):
            read_iceberg(spark, tbl, snapshot_id=1,
                         as_of_timestamp_ms=mid)

    def test_snapshot_summary_is_honest(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_snapshot,
            write_iceberg,
        )
        tbl = str(tmp_path / "t")
        df = spark.range(0, 42).select(F.col("id").alias("k"))
        write_iceberg(df, tbl)
        meta = iceberg_snapshot(spark, tbl).metadata
        s = meta["snapshots"][-1]
        assert s["timestamp-ms"] > 0
        assert s["summary"]["added-records"] == "42"
        assert int(s["summary"]["added-data-files"]) >= 1
        assert meta["last-updated-ms"] == s["timestamp-ms"]

    def test_rollback_and_expire(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_expire_snapshots,
            iceberg_rollback,
            iceberg_snapshot,
            read_iceberg,
            write_iceberg,
        )
        tbl = str(tmp_path / "t")
        df = spark.range(0, 10).select(F.col("id").alias("k"))
        s1 = write_iceberg(df, tbl)
        s2 = write_iceberg(df.select((F.col("k") + 10).alias("k")),
                           tbl)
        s3 = write_iceberg(df.select((F.col("k") + 20).alias("k")),
                           tbl)
        # rollback: metadata-only, everything stays travelable
        assert iceberg_rollback(spark, tbl, snapshot_id=s2) == s2
        assert read_iceberg(spark, tbl).count() == 20
        assert read_iceberg(spark, tbl,
                            snapshot_id=s3).count() == 30
        # roll forward again, then expire all but the current
        iceberg_rollback(spark, tbl, snapshot_id=s3)
        out = iceberg_expire_snapshots(spark, tbl, keep_last=1)
        assert out["expired_snapshots"] == 2
        # append-commit manifest lists reference earlier manifests,
        # so every data file stays reachable from the kept snapshot
        assert out["deleted_files"] == 0
        assert read_iceberg(spark, tbl).count() == 30
        with pytest.raises(ValueError):
            read_iceberg(spark, tbl, snapshot_id=s1).collect()
        # overwrite starts a fresh manifest list: expiring the old
        # lineage now deletes genuinely unreachable manifests + files
        write_iceberg(df, tbl, mode="overwrite")
        out2 = iceberg_expire_snapshots(spark, tbl, keep_last=1)
        assert out2["expired_snapshots"] == 1
        assert out2["deleted_manifests"] >= 1
        assert out2["deleted_files"] >= 1
        assert read_iceberg(spark, tbl).count() == 10

    def test_expire_lost_race_leaves_table_intact(self, spark,
                                                  tmp_path,
                                                  monkeypatch):
        """Regression: expire deleted manifests/files BEFORE the
        metadata commit — a lost commit race left the still-current
        metadata pointing at deleted files.  Deletion must follow a
        successful publish."""
        from wrangle_pypes_spark.sources import delta as _delta_mod
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_expire_snapshots,
            read_iceberg,
            write_iceberg,
        )
        tbl = str(tmp_path / "t")
        df = spark.range(0, 10).select(F.col("id").alias("k"))
        s1 = write_iceberg(df, tbl)
        write_iceberg(df.select((F.col("k") + 10).alias("k")), tbl,
                      mode="overwrite")
        monkeypatch.setattr(_delta_mod, "_create_exclusive",
                            lambda *a, **k: False)
        with pytest.raises(RuntimeError, match="concurrent"):
            iceberg_expire_snapshots(spark, tbl, keep_last=1)
        monkeypatch.undo()
        # nothing was deleted: the current snapshot AND the snapshot
        # the failed expire targeted both still resolve
        assert sorted(r["k"] for r in
                      read_iceberg(spark, tbl).collect()) \
            == list(range(10, 20))
        assert sorted(r["k"] for r in
                      read_iceberg(spark, tbl,
                                   snapshot_id=s1).collect()) \
            == list(range(10))
        # and a clean retry succeeds end-to-end
        out = iceberg_expire_snapshots(spark, tbl, keep_last=1)
        assert out["expired_snapshots"] == 1
        assert out["deleted_files"] >= 1

    def test_temporal_transform_utc_under_nonutc_tz(self, spark,
                                                    tmp_path):
        """Regression: write-path day(ts) evaluated in the SESSION
        timezone while read-path pruning treats values as UTC — a
        non-UTC session silently dropped matching files near day
        boundaries."""
        import datetime as dt

        from wrangle_pypes_spark.sources.iceberg import (
            read_iceberg,
            write_iceberg,
        )
        tz0 = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone",
                       "America/Los_Angeles")
        try:
            tbl = str(tmp_path / "t")
            base = dt.datetime(1995, 2, 10, 1, 0,
                               tzinfo=dt.timezone.utc).timestamp()
            # hourly instants: 1995-02-10T01:00Z .. 02-12T00:00Z;
            # in LA wall-clock the first 7 fall on 02-09
            df = spark.range(0, 48).select(
                F.col("id").alias("k"),
                F.timestamp_seconds(
                    F.lit(base) + F.col("id") * 3600).alias("ts"))
            write_iceberg(df, tbl, partition_by=[("day", "ts")])
            assert read_iceberg(spark, tbl).count() == 48
            out = read_iceberg(
                spark, tbl,
                partition_filter={"ts": "1995-02-10T12:00:00"})
            # UTC day 1995-02-10 holds ids 0..22 — all must be there
            # (epoch-second bounds are instant-based, tz-immune)
            lo = dt.datetime(1995, 2, 10,
                             tzinfo=dt.timezone.utc).timestamp()
            hi = dt.datetime(1995, 2, 11,
                             tzinfo=dt.timezone.utc).timestamp()
            got = sorted(
                r["k"] for r in out.filter(
                    (F.unix_timestamp("ts") >= F.lit(int(lo)))
                    & (F.unix_timestamp("ts") < F.lit(int(hi))))
                .collect())
            assert got == list(range(23))
        finally:
            spark.conf.set("spark.sql.session.timeZone", tz0)

    def test_rollback_unknown_snapshot_is_loud(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_rollback,
            write_iceberg,
        )
        tbl = str(tmp_path / "t")
        write_iceberg(spark.range(3).select(F.col("id").alias("k")),
                      tbl)
        with pytest.raises(ValueError, match="not in table"):
            iceberg_rollback(spark, tbl, snapshot_id=999)


class TestVectorizedBucketHash:
    def test_vec_matches_scalar_and_spec_vector(self):
        import random

        import numpy as np

        from wrangle_pypes_spark.sources.iceberg import (
            _bucket_hash_bytes,
            murmur3_32,
            murmur3_32_i64_vec,
        )
        rng = random.Random(13)
        vals = ([0, 1, -1, 34, 2**62, -(2**62), 2**63 - 1, -(2**63)]
                + [rng.randint(-2**63, 2**63 - 1) for _ in range(5000)])
        vec = murmur3_32_i64_vec(np.array(vals, dtype=np.int64))
        ref = [murmur3_32(_bucket_hash_bytes(v, "long"))
               for v in vals]
        assert list(vec) == ref
        # spec Appendix B: bucket hash of int 34 is 2017239379
        assert int(murmur3_32_i64_vec(np.array([34]))[0]) == 2017239379


class TestFormatV3:
    def test_v3_metadata_reads_like_v2(self, spark, tmp_path):
        """v3 metadata without v3-only row features reads normally."""
        from wrangle_pypes_spark.sources.iceberg import write_iceberg
        tbl = str(tmp_path / "v3")
        write_iceberg(spark.range(7).select(F.col("id").alias("k")),
                      tbl)
        mdir = os.path.join(tbl, "metadata")
        mf = os.path.join(mdir, "v1.metadata.json")
        meta = json.loads(open(mf).read())
        meta["format-version"] = 3
        with open(mf, "w") as f:
            f.write(json.dumps(meta))
        assert sorted(r["k"] for r in
                      read_iceberg(spark, tbl).collect()) \
            == list(range(7))

    def test_v3_field_defaults_materialize_per_file(self, spark,
                                                    tmp_path):
        """r14: rows from files written BEFORE a defaulted field
        existed read the initial-default; files that CARRY the column
        keep their own values (nulls included) — a merged-schema scan
        can't tell the two apart, so the fills are footer-grouped."""
        tbl = str(tmp_path / "v3def")
        mdir = os.path.join(tbl, "metadata")
        # file A: pre-evolution (k only); file B: k + tag (with a
        # real null); file C: pre-evolution again
        a = spark.range(0, 3).select(F.col("id").alias("k"))
        b = spark.createDataFrame(
            [(10, "x"), (11, None)], "k long, tag string")
        c = spark.range(20, 22).select(F.col("id").alias("k"))
        files = {}
        for name, d in (("A", a), ("B", b), ("C", c)):
            dest = os.path.join(tbl, "data", f"{name}.parquet")
            _one_parquet(spark, d, dest)
            files[name] = dest
        pf = []
        m1 = os.path.join(mdir, "m1.avro")
        A.write_container_file(m1, _manifest_schema(pf), [
            {"status": 1, "snapshot_id": None,
             "data_file": {"content": 0, "file_path": files[n],
                           "file_format": "PARQUET", "partition": {},
                           "record_count": 1,
                           "file_size_in_bytes": 1}}
            for n in ("A", "B", "C")])
        ml = os.path.join(mdir, "snap-1.avro")
        A.write_container_file(ml, _MANIFEST_LIST_SCHEMA, [
            {"manifest_path": m1, "manifest_length": 1,
             "partition_spec_id": 0, "content": 0,
             "added_snapshot_id": 1}])
        _write_metadata(
            tbl,
            schemas=[{"type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "k", "required": False,
                 "type": "long"},
                {"id": 2, "name": "tag", "required": False,
                 "type": "string", "initial-default": "unk",
                 "write-default": "w"},
                {"id": 3, "name": "num", "required": False,
                 "type": "long", "initial-default": 7},
            ]}],
            specs=[{"spec-id": 0, "fields": []}],
            snapshots=[{"snapshot-id": 1, "sequence-number": 1,
                        "timestamp-ms": 0, "manifest-list": ml,
                        "summary": {"operation": "append"}}],
            current=1, fmt=3)
        rows = sorted(((r["k"], r["tag"], r["num"])
                       for r in read_iceberg(spark, tbl).collect()),
                      key=lambda t: t[0])
        assert rows == [
            (0, "unk", 7), (1, "unk", 7), (2, "unk", 7),
            (10, "x", 7), (11, None, 7),  # B keeps its OWN tag/null
            (20, "unk", 7), (21, "unk", 7)]

    def test_v3_nested_default_single_level_reads(self, spark,
                                                  tmp_path):
        """r14 late: an initial-default on a DIRECT CHILD of a
        top-level struct materializes — files carrying the parent
        but not the child get the default inside every non-null
        parent (null parents stay null); files predating the whole
        parent read a null parent (a child default fills a missing
        FIELD, it does not conjure structs)."""
        tbl = str(tmp_path / "v3nd1")
        mdir = os.path.join(tbl, "metadata")
        # A: no parent at all; B: parent {y} without child x
        a = spark.range(0, 2).select(F.col("id").alias("k"))
        b = spark.createDataFrame(
            [(10, ("hi",)), (11, None)],
            "k long, s struct<y: string>")
        files = {}
        for name, d in (("A", a), ("B", b)):
            dest = os.path.join(tbl, "data", f"{name}.parquet")
            _one_parquet(spark, d, dest)
            files[name] = dest
        m1 = os.path.join(mdir, "m1.avro")
        A.write_container_file(m1, _manifest_schema([]), [
            {"status": 1, "snapshot_id": None,
             "data_file": {"content": 0, "file_path": files[n],
                           "file_format": "PARQUET", "partition": {},
                           "record_count": 2,
                           "file_size_in_bytes": 1}}
            for n in ("A", "B")])
        ml = os.path.join(mdir, "snap-1.avro")
        A.write_container_file(ml, _MANIFEST_LIST_SCHEMA, [
            {"manifest_path": m1, "manifest_length": 1,
             "partition_spec_id": 0, "content": 0,
             "added_snapshot_id": 1}])
        _write_metadata(
            tbl,
            schemas=[{"type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "k", "required": False,
                 "type": "long"},
                {"id": 2, "name": "s", "required": False,
                 "type": {"type": "struct", "fields": [
                     {"id": 3, "name": "y", "required": False,
                      "type": "string"},
                     {"id": 4, "name": "x", "required": False,
                      "type": "long", "initial-default": 1}]}},
            ]}],
            specs=[{"spec-id": 0, "fields": []}],
            snapshots=[{"snapshot-id": 1, "sequence-number": 1,
                        "timestamp-ms": 1, "manifest-list": ml}],
            current=1, fmt=3)
        out = read_iceberg(spark, tbl).orderBy("k")
        rows = out.collect()
        got = [(r["k"], None if r["s"] is None
                else (r["s"]["y"], r["s"]["x"])) for r in rows]
        assert got == [(0, None), (1, None),
                       (10, ("hi", 1)), (11, None)], got

    def test_v3_deeper_nested_default_still_gates(self, spark,
                                                  tmp_path):
        from wrangle_pypes_spark.sources.iceberg import write_iceberg
        tbl = str(tmp_path / "v3nd2")
        write_iceberg(spark.range(3).select(F.col("id").alias("k")),
                      tbl)
        mf = os.path.join(tbl, "metadata", "v1.metadata.json")
        meta = json.loads(open(mf).read())
        meta["format-version"] = 3
        meta["schemas"][0]["fields"].append({
            "id": 9, "name": "s", "required": False,
            "type": {"type": "struct", "fields": [
                {"id": 10, "name": "inner", "required": False,
                 "type": {"type": "struct", "fields": [
                     {"id": 11, "name": "x", "required": False,
                      "type": "long", "initial-default": 1}]}}]}})
        with open(mf, "w") as f:
            f.write(json.dumps(meta))
        with pytest.raises(IcebergProtocolError, match="deeper"):
            read_iceberg(spark, tbl).collect()

    def test_v3_puffin_deletion_vector(self, spark, tmp_path):
        """r14: a puffin deletion-vector blob (4-byte BE length +
        magic-prefixed 64-bit roaring bitmap + BE CRC-32) kills the
        referenced rows; compaction then materializes it away."""
        import struct as _struct
        import zlib as _zlib

        import numpy as np

        from wrangle_pypes_spark.sources.dv import rba_serialize
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_rewrite_data_files,
        )
        tbl = str(tmp_path / "v3dv")
        mdir = os.path.join(tbl, "metadata")
        data = os.path.join(tbl, "data", "A.parquet")
        _one_parquet(spark,
                     spark.range(0, 10).select(F.col("id").alias("k"))
                     .coalesce(1).sortWithinPartitions("k"), data)
        body = rba_serialize(np.array([1, 3, 8]))
        blob = (_struct.pack(">i", len(body)) + body
                + _struct.pack(">I", _zlib.crc32(body) & 0xFFFFFFFF))
        puf = os.path.join(tbl, "data", "dv.puffin")
        with open(puf, "wb") as f:
            f.write(b"PFA1" + blob)
        pf = []
        m1 = os.path.join(mdir, "m1.avro")
        A.write_container_file(m1, _manifest_schema(pf), [
            {"status": 1, "snapshot_id": None,
             "data_file": {"content": 0, "file_path": data,
                           "file_format": "PARQUET", "partition": {},
                           "record_count": 10,
                           "file_size_in_bytes": 10}}])
        dv_schema = {
            "type": "record", "name": "manifest_entry", "fields": [
                {"name": "status", "type": "int"},
                {"name": "snapshot_id", "type": ["null", "long"]},
                {"name": "data_file", "type": {
                    "type": "record", "name": "r2", "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "partition", "type": {
                            "type": "record", "name": "r102",
                            "fields": []}},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes",
                         "type": "long"},
                        {"name": "referenced_data_file",
                         "type": ["null", "string"]},
                        {"name": "content_offset",
                         "type": ["null", "long"]},
                        {"name": "content_size_in_bytes",
                         "type": ["null", "long"]},
                    ]}}]}
        m2 = os.path.join(mdir, "m2.avro")
        A.write_container_file(m2, dv_schema, [
            {"status": 1, "snapshot_id": None,
             "data_file": {"content": 1, "file_path": puf,
                           "file_format": "PUFFIN", "partition": {},
                           "record_count": 3,
                           "file_size_in_bytes": len(blob) + 4,
                           "referenced_data_file": data,
                           "content_offset": 4,
                           "content_size_in_bytes": len(blob)}}])
        ml = os.path.join(mdir, "snap-2.avro")
        A.write_container_file(ml, _MANIFEST_LIST_SCHEMA, [
            {"manifest_path": m1, "manifest_length": 1,
             "partition_spec_id": 0, "content": 0,
             "added_snapshot_id": 1},
            {"manifest_path": m2, "manifest_length": 1,
             "partition_spec_id": 0, "content": 1,
             "added_snapshot_id": 2}])
        _write_metadata(
            tbl,
            schemas=[{"type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "k", "required": False,
                 "type": "long"}]}],
            specs=[{"spec-id": 0, "fields": []}],
            snapshots=[
                {"snapshot-id": 1, "sequence-number": 1,
                 "timestamp-ms": 0, "manifest-list": ml,
                 "summary": {"operation": "append"}},
                {"snapshot-id": 2, "sequence-number": 2,
                 "timestamp-ms": 0, "manifest-list": ml,
                 "summary": {"operation": "delete"}}],
            current=2, fmt=3)
        live = [k for k in range(10) if k not in (1, 3, 8)]
        assert sorted(r["k"] for r in
                      read_iceberg(spark, tbl).collect()) == live
        # compaction materializes the DV into the rewritten file
        res = iceberg_rewrite_data_files(spark, tbl, min_files=1)
        assert res["removed_files"] == 1
        assert sorted(r["k"] for r in
                      read_iceberg(spark, tbl).collect()) == live
        snap = iceberg_snapshot(spark, tbl)
        raw = spark.read.parquet(*[f["path"] for f in snap.files])
        assert sorted(r["k"] for r in raw.collect()) == live

    def test_v4_still_gates(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import write_iceberg
        tbl = str(tmp_path / "v4")
        write_iceberg(spark.range(3).select(F.col("id").alias("k")),
                      tbl)
        mf = os.path.join(tbl, "metadata", "v1.metadata.json")
        meta = json.loads(open(mf).read())
        meta["format-version"] = 4
        with open(mf, "w") as f:
            f.write(json.dumps(meta))
        with pytest.raises(IcebergProtocolError, match="format-ver"):
            read_iceberg(spark, tbl).collect()


class TestIcebergChanges:
    def test_changelog_across_writer_shapes(self, spark, tmp_path):
        """inserts (append), deletes (position + equality), and the
        remove/add halves of an overwrite, with already-dead rows
        never re-reporting."""
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_changes,
            iceberg_delete_where,
            write_iceberg,
            write_iceberg_deletes,
        )
        tbl = str(tmp_path / "t")
        df = spark.range(0, 30).select(F.col("id").alias("k"))
        write_iceberg(df.filter("k % 2 = 0"), tbl)           # seq 1
        write_iceberg(df.filter("k % 2 = 1"), tbl)           # seq 2
        iceberg_delete_where(spark, tbl, "k % 6 = 0")        # seq 3
        write_iceberg_deletes(
            spark.createDataFrame([(10,), (12,), (15,)], "k long"),
            tbl, equality_cols=["k"])                        # seq 4
        write_iceberg(df.filter("k >= 28"), tbl,
                      mode="overwrite")                      # seq 5
        ch = iceberg_changes(spark, tbl, from_seq=1)
        got = sorted((r["k"], r["_change_type"], r["_commit_seq"])
                     for r in ch.collect())
        evens = [k for k in range(30) if k % 2 == 0]
        odds = [k for k in range(30) if k % 2 == 1]
        live4 = [k for k in range(30)
                 if k % 6 != 0 and k not in (10, 15)]
        # 12 is a multiple of 6: dead at seq 3, must NOT re-report
        want = sorted(
            [(k, "insert", 1) for k in evens]
            + [(k, "insert", 2) for k in odds]
            + [(k, "delete", 3) for k in range(30) if k % 6 == 0]
            + [(k, "delete", 4) for k in (10, 15)]
            + [(k, "delete", 5) for k in live4]
            + [(k, "insert", 5) for k in (28, 29)])
        assert got == want
        # range clipping
        ch34 = iceberg_changes(spark, tbl, from_seq=3, to_seq=4)
        assert sorted((r["k"], r["_commit_seq"])
                      for r in ch34.collect()) \
            == sorted([(k, 3) for k in range(30) if k % 6 == 0]
                      + [(10, 4), (15, 4)])

    def test_empty_range(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_changes,
            write_iceberg,
        )
        tbl = str(tmp_path / "t")
        write_iceberg(spark.range(3).select(F.col("id").alias("k")),
                      tbl)
        ch = iceberg_changes(spark, tbl, from_seq=5, to_seq=9)
        assert ch.count() == 0
        assert ch.schema.fieldNames() == ["k", "_change_type",
                                          "_commit_seq"]


class TestConvertToIceberg:
    def test_convert_plain_and_lifecycle(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            convert_to_iceberg,
            iceberg_delete_where,
            iceberg_snapshot,
            write_iceberg,
        )
        tbl = str(tmp_path / "cvt")
        df = spark.range(0, 20).select(
            F.col("id").alias("k"), (F.col("id") * 1.5).alias("x"))
        df.repartition(3).write.parquet(tbl)
        assert convert_to_iceberg(spark, tbl) == 1
        got = read_iceberg(spark, tbl)
        assert sorted(r["k"] for r in got.collect()) \
            == list(range(20))
        # real footer stats in the manifests
        snap = iceberg_snapshot(spark, tbl)
        assert sum(f["records"] for f in snap.files) == 20
        with pytest.raises(ValueError, match="already"):
            convert_to_iceberg(spark, tbl)
        # full citizen: append + position delete compose
        write_iceberg(df.select((F.col("k") + 20).alias("k"),
                                F.col("x")), tbl)
        iceberg_delete_where(spark, tbl, "k % 10 = 0")
        assert sorted(r["k"] for r in
                      read_iceberg(spark, tbl).collect()) \
            == [k for k in range(40) if k % 10 != 0]

    def test_convert_hive_identity_partitions(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            convert_to_iceberg,
        )
        tbl = str(tmp_path / "cvth")
        df = spark.range(0, 30).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("int").alias("p"))
        df.write.partitionBy("p").parquet(tbl)
        with pytest.raises(ValueError, match="partition_schema"):
            convert_to_iceberg(spark, tbl)
        convert_to_iceberg(
            spark, tbl,
            partition_schema=T.StructType(
                [T.StructField("p", T.IntegerType())]))
        got = read_iceberg(spark, tbl)
        assert got.schema["p"].dataType == T.IntegerType()
        assert got.filter("p = 2").count() == 10
        # manifest-tuple pruning works on the converted table
        pruned = read_iceberg(spark, tbl, partition_filter={"p": 1})
        assert pruned.select(
            F.input_file_name().alias("f")).distinct().count() \
            < got.select(
                F.input_file_name().alias("f")).distinct().count()
        assert pruned.filter("p = 1").count() == 10


class TestRewriteDataFiles:
    """iceberg_rewrite_data_files: bin-pack compaction with a
    stats-preserving manifest rewrite (carried entries round-trip
    through each manifest's own writer schema)."""

    def test_compaction_roundtrip_and_carry_by_reference(
            self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_rewrite_data_files,
            write_iceberg,
        )
        tbl = str(tmp_path / "rw")
        df = spark.range(0, 30).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("int").alias("p"))
        for i in range(3):  # 3 snapshots, 2 small files each (p=0/1)
            write_iceberg(
                df.filter((F.col("k") % 3) == i).repartition(1), tbl,
                partition_by=["p"])
        before = iceberg_snapshot(spark, tbl)
        assert len(before.files) == 6
        res = iceberg_rewrite_data_files(spark, tbl)
        assert res["removed_files"] == 6 and res["added_files"] == 2
        after = iceberg_snapshot(spark, tbl)
        assert len(after.files) == 2
        assert sorted(r["k"] for r in
                      read_iceberg(spark, tbl).collect()) \
            == list(range(30))
        # idempotent: a second run finds nothing (each tuple is 1 file)
        res2 = iceberg_rewrite_data_files(spark, tbl)
        assert res2["removed_files"] == 0
        assert res2["snapshot_id"] == res["snapshot_id"]
        # summary says replace
        meta = json.loads(open(os.path.join(
            tbl, "metadata",
            "v%d.metadata.json" % 4)).read())
        snap = next(s for s in meta["snapshots"]
                    if s["snapshot-id"] == res["snapshot_id"])
        assert snap["summary"]["operation"] == "replace"
        # time travel to a pre-compaction snapshot still works
        old = iceberg_snapshot(spark, tbl, snapshot_id=1)
        assert sum(f["records"] for f in old.files) == 10

    def test_survivor_manifest_carried_by_reference(self, spark,
                                                    tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_rewrite_data_files,
            write_iceberg,
        )
        tbl = str(tmp_path / "rwref")
        big = spark.range(0, 60000).select(
            F.col("id").alias("k"), F.lit(0).alias("p"))
        write_iceberg(big.coalesce(1), tbl,
                      partition_by=["p"])  # 1 big file
        smalls = spark.range(60000, 60010).select(
            F.col("id").alias("k"), F.lit(1).alias("p"))
        write_iceberg(smalls.filter("k < 60005").coalesce(1), tbl)
        write_iceberg(smalls.filter("k >= 60005").coalesce(1), tbl)
        from wrangle_pypes_spark.sources.avro_io import (
            read_container_file,
        )
        meta = json.loads(open(os.path.join(
            tbl, "metadata", "v3.metadata.json")).read())
        cur = next(s for s in meta["snapshots"]
                   if s["snapshot-id"] == meta["current-snapshot-id"])
        pre_paths = {e["manifest_path"] for e in
                     read_container_file(cur["manifest-list"])[1]}
        res = iceberg_rewrite_data_files(
            spark, tbl, target_file_bytes=100_000)
        # the big file's partition had ONE small candidate (none) —
        # p=1's two smalls compact; big file survives untouched
        assert res["removed_files"] == 2 and res["added_files"] == 1
        meta2 = json.loads(open(os.path.join(
            tbl, "metadata", "v4.metadata.json")).read())
        cur2 = next(s for s in meta2["snapshots"]
                    if s["snapshot-id"] == res["snapshot_id"])
        rows = read_container_file(cur2["manifest-list"])[1]
        carried = [e for e in rows
                   if e["manifest_path"] in pre_paths]
        # the untouched manifest rode along BY REFERENCE
        assert len(carried) == 1
        assert sorted(r["k"] for r in
                      read_iceberg(spark, tbl).collect()) \
            == list(range(60010))

    def test_position_delete_materializes_away(self, spark,
                                               tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_delete_where,
            iceberg_rewrite_data_files,
            write_iceberg,
        )
        tbl = str(tmp_path / "rwdel")
        df = spark.range(0, 20).select(F.col("id").alias("k"))
        write_iceberg(df, tbl)
        iceberg_delete_where(spark, tbl, "k % 4 = 0")
        res = iceberg_rewrite_data_files(spark, tbl, min_files=1)
        assert res["removed_files"] >= 1
        live = [k for k in range(20) if k % 4 != 0]
        assert sorted(r["k"] for r in
                      read_iceberg(spark, tbl).collect()) == live
        # the NEW data files already exclude the deleted rows — read
        # them raw, without any delete application
        after = iceberg_snapshot(spark, tbl)
        raw = spark.read.parquet(*[f["path"] for f in after.files])
        assert sorted(r["k"] for r in raw.collect()) == live

    def test_foreign_stats_round_trip(self, spark, tmp_path):
        """The stats-preservation byte contract: a FOREIGN manifest
        carrying stats columns our writer does not model
        (value_counts, lower_bounds) loses a victim entry; the
        rewritten manifest must keep the survivor's stats intact and
        keep the foreign writer schema itself."""
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_rewrite_data_files,
        )
        tbl = str(tmp_path / "rwstats")
        mdir = os.path.join(tbl, "metadata")
        files = {}
        for name, lo in (("A", 0), ("B", 100), ("BIG", 200)):
            n = 5 if name != "BIG" else 50000
            d = spark.range(lo, lo + n).select(F.col("id").alias("k"))
            dest = os.path.join(tbl, "data", f"{name}.parquet")
            _one_parquet(spark, d, dest)
            files[name] = (dest, n)
        kv = {"type": "array", "items": {
            "type": "record", "name": "k117_v118", "fields": [
                {"name": "key", "type": "int"},
                {"name": "value", "type": "long"}]}}
        kvb = {"type": "array", "items": {
            "type": "record", "name": "k126_v127", "fields": [
                {"name": "key", "type": "int"},
                {"name": "value", "type": "bytes"}]}}
        foreign_schema = {
            "type": "record", "name": "manifest_entry", "fields": [
                {"name": "status", "type": "int"},
                {"name": "snapshot_id", "type": ["null", "long"]},
                {"name": "data_file", "type": {
                    "type": "record", "name": "r2", "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "partition", "type": {
                            "type": "record", "name": "r102",
                            "fields": []}},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes",
                         "type": "long"},
                        {"name": "value_counts",
                         "type": ["null", kv]},
                        {"name": "lower_bounds",
                         "type": ["null", kvb]},
                    ]}}]}

        def entry(name, *, size):
            dest, n = files[name]
            return {"status": 1, "snapshot_id": None,
                    "data_file": {
                        "content": 0, "file_path": dest,
                        "file_format": "PARQUET", "partition": {},
                        "record_count": n,
                        "file_size_in_bytes": size,
                        "value_counts": [{"key": 1, "value": n}],
                        "lower_bounds": [
                            {"key": 1, "value": b"\x01\x02"}]}}

        m1 = os.path.join(mdir, "m-foreign.avro")
        A.write_container_file(
            m1, foreign_schema,
            [entry("A", size=10), entry("B", size=10),
             entry("BIG", size=10**9)])
        ml = os.path.join(mdir, "snap-1.avro")
        A.write_container_file(ml, _MANIFEST_LIST_SCHEMA, [
            {"manifest_path": m1, "manifest_length": 1,
             "partition_spec_id": 0, "content": 0,
             "added_snapshot_id": 1}])
        _write_metadata(
            tbl,
            schemas=[{"type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "k", "required": False,
                 "type": "long"}]}],
            specs=[{"spec-id": 0, "fields": []}],
            snapshots=[{"snapshot-id": 1, "sequence-number": 1,
                        "timestamp-ms": 0, "manifest-list": ml,
                        "summary": {"operation": "append"}}],
            current=1)
        res = iceberg_rewrite_data_files(spark, tbl)
        assert res["removed_files"] == 2 and res["added_files"] == 1
        assert sorted(r["k"] for r in
                      read_iceberg(spark, tbl).collect()) \
            == sorted(list(range(5)) + list(range(100, 105))
                      + list(range(200, 50200)))
        # find the rewritten foreign manifest in the new list
        from wrangle_pypes_spark.sources.avro_io import (
            read_container_file,
        )
        meta2 = json.loads(open(os.path.join(
            mdir, "v2.metadata.json")).read())
        cur2 = next(s for s in meta2["snapshots"]
                    if s["snapshot-id"] == res["snapshot_id"])
        rows = read_container_file(cur2["manifest-list"])[1]
        carried = [e for e in rows
                   if e["manifest_path"] != m1
                   and int(e.get("content") or 0) == 0
                   and e["added_snapshot_id"] == 1]
        assert len(carried) == 1
        ws, recs = read_container_file(carried[0]["manifest_path"])
        # foreign writer schema preserved verbatim
        assert ws == foreign_schema
        assert len(recs) == 1
        surv = recs[0]["data_file"]
        assert surv["file_path"] == files["BIG"][0]
        assert surv["value_counts"] == [{"key": 1, "value": 50000}]
        assert surv["lower_bounds"] \
            == [{"key": 1, "value": b"\x01\x02"}]

    def test_changes_and_stream_skip_replace(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.datasource import (
            IcebergJarlessDataSource,
        )
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_changes,
            iceberg_rewrite_data_files,
            write_iceberg,
        )
        tbl = str(tmp_path / "rwch")
        df = spark.range(0, 12).select(F.col("id").alias("k"))
        write_iceberg(df.filter("k < 6").coalesce(1), tbl)
        write_iceberg(df.filter("k >= 6").coalesce(1), tbl)
        res = iceberg_rewrite_data_files(spark, tbl)
        assert res["removed_files"] == 2
        ch = iceberg_changes(spark, tbl, from_seq=1)
        got = sorted((r["k"], r["_change_type"], r["_commit_seq"])
                     for r in ch.collect())
        assert got == [(k, "insert", 1 if k < 6 else 2)
                       for k in range(12)]
        # the jarless stream from scratch emits each row exactly once
        spark.dataSource.register(IcebergJarlessDataSource)
        out = str(tmp_path / "out")
        q = (spark.readStream.format("iceberg_jarless")
             .option("fromStart", "true").load(tbl)
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        assert sorted(r["k"] for r in
                      spark.read.parquet(out).collect()) \
            == list(range(12))


class TestChangesPlanBatching:
    def test_append_runs_coalesce_to_one_scan(self, spark, tmp_path):
        """r14: N consecutive append-only snapshots must assemble ONE
        scan node (file->seq via broadcast map), not N — the plan
        width over a long append-only history is O(regimes)."""
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_changes,
            iceberg_delete_where,
            write_iceberg,
        )
        tbl = str(tmp_path / "batch")
        df = spark.range(0, 100).select(F.col("id").alias("k"))
        n_commits = 20
        for i in range(n_commits):
            write_iceberg(
                df.filter(f"k % {n_commits} = {i}").coalesce(1), tbl)
        ch = iceberg_changes(spark, tbl, from_seq=1)
        # plan BEFORE any action (AQE finalization reprints stage
        # subtrees, which would double-count)
        import io
        import re as _re
        from contextlib import redirect_stdout
        buf = io.StringIO()
        with redirect_stdout(buf):
            ch.explain("formatted")
        n_parquet_scans = len(_re.findall(r"\(\d+\) Scan parquet",
                                          buf.getvalue()))
        # one parquet scan for all 20 appends (+ a broadcast map)
        assert n_parquet_scans == 1, buf.getvalue()
        got = sorted((r["k"], r["_commit_seq"])
                     for r in ch.collect())
        assert got == sorted((k, k % n_commits + 1)
                             for k in range(100))

    def test_mixed_regimes_still_correct(self, spark, tmp_path):
        """appends + a delete + more appends: three regimes, exact
        changelog, and the plan stays narrow (2 data scans + the
        delete machinery)."""
        import io
        from contextlib import redirect_stdout

        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_changes,
            iceberg_delete_where,
            write_iceberg,
        )
        tbl = str(tmp_path / "mix")
        df = spark.range(0, 40).select(F.col("id").alias("k"))
        for i in range(4):
            write_iceberg(
                df.filter(f"k % 8 = {i}").coalesce(1), tbl)
        iceberg_delete_where(spark, tbl, "k % 16 = 0")  # seq 5
        for i in range(4, 8):
            write_iceberg(
                df.filter(f"k % 8 = {i}").coalesce(1), tbl)
        ch = iceberg_changes(spark, tbl, from_seq=1)
        # plan first (pre-AQE; finalization reprints stage subtrees)
        buf = io.StringIO()
        with redirect_stdout(buf):
            ch.explain("formatted")
        import re as _re
        n_scans = len(_re.findall(r"\(\d+\) Scan parquet",
                                  buf.getvalue()))
        # 2 batched insert scans + the delete half's bounded scans —
        # far fewer than the 9 per-snapshot scans the naive plan had
        assert n_scans <= 5, n_scans
        rows = sorted((r["k"], r["_change_type"], r["_commit_seq"])
                      for r in ch.collect())
        want = sorted(
            [(k, "insert", k % 8 + 1) for k in range(40)
             if k % 8 < 4]
            + [(k, "delete", 5) for k in range(40) if k % 16 == 0]
            + [(k, "insert", k % 8 + 2) for k in range(40)
               if k % 8 >= 4])
        assert rows == want


class TestManifestListSummaries:
    def test_writer_publishes_partition_summaries(self, spark,
                                                  tmp_path):
        """r14: our manifest-list entries carry the spec's field_
        summary rows (contains_null + LE-serialized bounds) so
        foreign planners can skip whole manifests."""
        import struct as _struct

        from wrangle_pypes_spark.sources.avro_io import (
            read_container_file,
        )
        from wrangle_pypes_spark.sources.iceberg import write_iceberg
        tbl = str(tmp_path / "sumt")
        df = spark.range(0, 20).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("int").alias("p"))
        write_iceberg(df.coalesce(1), tbl, partition_by=["p"])
        meta = json.loads(open(os.path.join(
            tbl, "metadata", "v1.metadata.json")).read())
        snap = meta["snapshots"][0]
        _, rows = read_container_file(snap["manifest-list"])
        assert len(rows) == 1
        ent = rows[0]
        assert ent["added_data_files_count"] == 4  # one per p value
        assert ent["added_rows_count"] == 20
        (summ,) = (ent["partitions"],)
        assert len(summ) == 1
        s0 = summ[0]
        assert s0["contains_null"] is False
        assert _struct.unpack("<i", bytes(s0["lower_bound"]))[0] == 0
        assert _struct.unpack("<i", bytes(s0["upper_bound"]))[0] == 3


class TestPuffinDVWrites:
    """iceberg_delete_where(puffin=True): the v3 DELETE writer —
    deletion vectors in a spec-shaped puffin container, one blob per
    file, one DV per file enforced by merge+supersede."""

    def test_dv_delete_roundtrip_and_merge(self, spark, tmp_path):
        import struct as _struct

        from wrangle_pypes_spark.sources.avro_io import (
            read_container_file,
        )
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_delete_where,
            write_iceberg,
        )
        tbl = str(tmp_path / "dvw")
        df = spark.range(0, 20).select(F.col("id").alias("k"))
        write_iceberg(df.coalesce(1), tbl)
        v1 = iceberg_delete_where(spark, tbl, "k % 4 = 0",
                                  puffin=True)
        assert v1 == 2
        meta = json.loads(open(os.path.join(
            tbl, "metadata", "v2.metadata.json")).read())
        assert meta["format-version"] == 3
        live1 = [k for k in range(20) if k % 4 != 0]
        assert sorted(r["k"] for r in
                      read_iceberg(spark, tbl).collect()) == live1
        # second delete MERGES into one DV per file: the old entry
        # is superseded, the new bitmap covers both predicates
        iceberg_delete_where(spark, tbl, "k % 6 = 0", puffin=True)
        live2 = [k for k in live1 if k % 6 != 0]
        assert sorted(r["k"] for r in
                      read_iceberg(spark, tbl).collect()) == live2
        snap = iceberg_snapshot(spark, tbl)
        dvs = [f for f in snap.delete_files
               if f.get("format") == "puffin"]
        assert len(dvs) == 1, dvs  # ONE DV for the one data file
        # the puffin container is spec-shaped: header magic, blob,
        # footer payload + size + flags + closing magic
        raw = open(dvs[0]["path"], "rb").read()
        assert raw[:4] == b"PFA1" and raw[-4:] == b"PFA1"
        psize = _struct.unpack("<i", raw[-12:-8])[0]
        payload = json.loads(raw[-12 - psize:-12])
        assert payload["blobs"][0]["type"] == "deletion-vector-v1"
        assert payload["blobs"][0]["properties"][
            "referenced-data-file"]
        # v2-style parquet position deletes now refuse on this table
        with pytest.raises(IcebergProtocolError, match="puffin"):
            iceberg_delete_where(spark, tbl, "k = 1")
        # ...and compaction materializes the DV away
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_rewrite_data_files,
        )
        res = iceberg_rewrite_data_files(spark, tbl, min_files=1)
        assert res["removed_files"] == 1
        assert sorted(r["k"] for r in
                      read_iceberg(spark, tbl).collect()) == live2

    def test_gate_on_v2_pos_delete_files(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_delete_where,
            write_iceberg,
        )
        tbl = str(tmp_path / "dvg")
        df = spark.range(0, 10).select(F.col("id").alias("k"))
        write_iceberg(df.coalesce(1), tbl)
        iceberg_delete_where(spark, tbl, "k = 0")  # v2 parquet shape
        with pytest.raises(IcebergProtocolError,
                           match="rewrite_data_files"):
            iceberg_delete_where(spark, tbl, "k = 1", puffin=True)

    def test_changelog_sees_dv_deletes(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_changes,
            iceberg_delete_where,
            write_iceberg,
        )
        tbl = str(tmp_path / "dvc")
        df = spark.range(0, 12).select(F.col("id").alias("k"))
        write_iceberg(df.coalesce(1), tbl)
        iceberg_delete_where(spark, tbl, "k >= 9", puffin=True)
        ch = iceberg_changes(spark, tbl, from_seq=1)
        got = sorted((r["k"], r["_change_type"]) for r in ch.collect())
        assert got == sorted([(k, "insert") for k in range(12)]
                             + [(k, "delete") for k in (9, 10, 11)])


class TestSchemaEvolution:
    """merge_schema=True appends new write columns under a NEW
    schema-id (Iceberg spec: "schemas" is append-only history,
    current-schema-id moves, last-column-id allocates fresh field
    ids); files written before the evolution lack the column and the
    scan null-fills them via footer grouping."""

    def test_append_column_and_metadata(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import write_iceberg

        tbl = str(tmp_path / "ev1")
        df0 = spark.range(5).select(F.col("id").alias("k"),
                                    F.lit("a").alias("s"))
        write_iceberg(df0.coalesce(1), tbl)
        df1 = spark.range(5, 8).select(
            F.col("id").alias("k"), F.lit("b").alias("s"),
            (F.col("id") * 2).alias("extra"))
        with pytest.raises(ValueError, match="merge_schema=True"):
            write_iceberg(df1, tbl)
        write_iceberg(df1.coalesce(1), tbl, merge_schema=True)
        out = read_iceberg(spark, tbl).orderBy("k")
        assert out.columns == ["k", "s", "extra"]
        assert [r["extra"] for r in out.collect()] \
            == [None] * 5 + [10, 12, 14]
        meta = iceberg_snapshot(spark, tbl).metadata
        assert len(meta["schemas"]) == 2          # history kept
        assert meta["current-schema-id"] == 1
        old = next(s for s in meta["schemas"]
                   if s.get("schema-id", 0) == 0)
        assert [f["name"] for f in old["fields"]] == ["k", "s"]
        new = next(s for s in meta["schemas"]
                   if s.get("schema-id", 0) == 1)
        ids = [f["id"] for f in new["fields"]]
        assert len(set(ids)) == 3 and max(ids) \
            == int(meta["last-column-id"])

    def test_requires_every_existing_column(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import write_iceberg

        tbl = str(tmp_path / "ev2")
        df0 = spark.range(5).select(F.col("id").alias("k"),
                                    F.lit("a").alias("s"))
        write_iceberg(df0, tbl)
        bad = spark.range(3).select(F.col("id").alias("k"),
                                    F.lit(1).alias("n"))
        with pytest.raises(ValueError, match="missing"):
            write_iceberg(bad, tbl, merge_schema=True)
        retyped = spark.range(3).select(
            F.col("id").cast("int").alias("k"),
            F.lit("b").alias("s"), F.lit(1).alias("n"))
        with pytest.raises(ValueError, match="never retypes"):
            write_iceberg(retyped, tbl, merge_schema=True)

    def test_partitioned_evolution(self, spark, tmp_path):
        """Identity partition columns of PRE-evolution files still
        re-attach from manifest tuples — they must not be clobbered
        by the evolved-column null-fill."""
        from wrangle_pypes_spark.sources.iceberg import write_iceberg

        tbl = str(tmp_path / "ev3")
        p0 = spark.range(10).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("string").alias("p"))
        write_iceberg(p0.coalesce(1), tbl, partition_by=["p"])
        p1 = spark.range(10, 13).select(
            F.col("id").alias("k"), F.lit("1").alias("p"),
            F.lit(9.5).alias("w"))
        write_iceberg(p1.coalesce(1), tbl, merge_schema=True)
        out = read_iceberg(spark, tbl).orderBy("k")
        rows = out.collect()
        assert [r["w"] for r in rows] == [None] * 10 + [9.5] * 3
        assert all(r["p"] == str(r["k"] % 2) for r in rows[:10])
        # partition pruning still works across the evolution
        pruned = read_iceberg(spark, tbl,
                              partition_filter={"p": "0"})
        assert sorted(r["k"] for r in pruned.collect()) \
            == [0, 2, 4, 6, 8]

    def test_jarless_batch_reads_evolved_table(self, spark,
                                               tmp_path):
        """The Python Data Source batch reader null-fills evolved
        columns per file (schema = current metadata; old files lack
        the column)."""
        from wrangle_pypes_spark.sources.datasource import (
            IcebergJarlessDataSource,
        )
        from wrangle_pypes_spark.sources.iceberg import write_iceberg

        spark.dataSource.register(IcebergJarlessDataSource)
        tbl = str(tmp_path / "ev4")
        df0 = spark.range(4).select(F.col("id").alias("k"),
                                    F.lit("a").alias("s"))
        write_iceberg(df0.coalesce(1), tbl)
        df1 = spark.range(4, 6).select(
            F.col("id").alias("k"), F.lit("b").alias("s"),
            (F.col("id") * 3).alias("extra"))
        write_iceberg(df1.coalesce(1), tbl, merge_schema=True)
        out = (spark.read.format("iceberg_jarless").load(tbl)
               .orderBy("k"))
        assert out.columns == ["k", "s", "extra"]
        assert [r["extra"] for r in out.collect()] \
            == [None] * 4 + [12, 15]


class TestBoundsPruning:
    """Per-column manifest stats on write (value/null counts +
    Appendix-D lower/upper bounds, spec fields 109/110/125/128) and
    ``read_iceberg(where_range=)`` manifest-side file skipping."""

    def _four_files(self, spark, tbl):
        from wrangle_pypes_spark.sources.iceberg import write_iceberg
        for i in range(4):
            df = spark.range(i * 100, (i + 1) * 100).select(
                F.col("id").alias("k"),
                (F.col("id") * 1.5).alias("v"),
                F.lit(f"s{i}").alias("tag"))
            write_iceberg(df.coalesce(1), tbl)

    def test_bounds_written_appendix_d(self, spark, tmp_path):
        import glob
        import struct

        from wrangle_pypes_spark.sources.avro_io import (
            read_container_file,
        )
        tbl = str(tmp_path / "b1")
        self._four_files(spark, tbl)
        m = sorted(glob.glob(
            os.path.join(tbl, "metadata", "m-*.avro")))[0]
        _, recs = read_container_file(m)
        d = recs[0]["data_file"]
        lo = {kv["key"]: bytes(kv["value"])
              for kv in d["lower_bounds"]}
        hi = {kv["key"]: bytes(kv["value"])
              for kv in d["upper_bounds"]}
        ks = sorted(r["data_file"]["partition"] is not None
                    for r in recs)
        lo_k = struct.unpack("<q", lo[1])[0]
        hi_k = struct.unpack("<q", hi[1])[0]
        assert hi_k - lo_k == 99
        assert struct.unpack("<d", hi[2])[0] == lo_k * 1.5 + 148.5
        assert lo[3].decode() == hi[3].decode()  # constant tag
        vc = {kv["key"]: kv["value"] for kv in d["value_counts"]}
        nv = {kv["key"]: kv["value"]
              for kv in d["null_value_counts"]}
        assert vc == {1: 100, 2: 100, 3: 100}
        assert nv == {1: 0, 2: 0, 3: 0}

    def test_where_range_prunes_and_filters(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            _build_range_tests,
            iceberg_snapshot,
        )
        tbl = str(tmp_path / "b2")
        self._four_files(spark, tbl)
        s = iceberg_snapshot(spark, tbl,
                             range_tests=_build_range_tests(
                                 spark, tbl, {"k": (150, 160)}))
        assert len(s.files) == 1   # three files skipped on bounds
        out = read_iceberg(spark, tbl, where_range={"k": (150, 160)})
        assert sorted(r["k"] for r in out.collect()) \
            == list(range(150, 161))
        assert read_iceberg(
            spark, tbl, where_range={"tag": ("s3", None)}) \
            .count() == 100
        with pytest.raises(ValueError, match="not in table schema"):
            read_iceberg(spark, tbl, where_range={"zz": (0, 1)})

    def test_foreign_manifest_without_bounds_survives(self, spark,
                                                      tmp_path):
        """Entries lacking the stats maps (pre-r14 tables, minimal
        foreign writers) must always reach the exact filter."""
        import glob

        from wrangle_pypes_spark.sources.avro_io import (
            read_container_file,
            write_container_file,
        )
        from wrangle_pypes_spark.sources.iceberg import (
            _manifest_avro_schema,
            write_iceberg,
        )
        tbl = str(tmp_path / "b3")
        df = spark.range(20).select(F.col("id").alias("k"))
        write_iceberg(df.coalesce(1), tbl)
        # rewrite the manifest through the stats-less schema
        m = sorted(glob.glob(
            os.path.join(tbl, "metadata", "m-*.avro")))[0]
        _, recs = read_container_file(m)
        for r in recs:
            for k in ("value_counts", "null_value_counts",
                      "lower_bounds", "upper_bounds"):
                r["data_file"].pop(k, None)
        write_container_file(m, _manifest_avro_schema([]), recs)
        out = read_iceberg(spark, tbl, where_range={"k": (5, 7)})
        assert sorted(r["k"] for r in out.collect()) == [5, 6, 7]

    def test_bounds_survive_compaction(self, spark, tmp_path):
        import glob

        from wrangle_pypes_spark.sources.avro_io import (
            read_container_file,
        )
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_rewrite_data_files,
            iceberg_snapshot,
            write_iceberg,
            _build_range_tests,
        )
        tbl = str(tmp_path / "b4")
        self._four_files(spark, tbl)
        out = iceberg_rewrite_data_files(spark, tbl,
                                         target_file_bytes=1 << 30)
        assert out["added_files"] >= 1
        # the compacted file's manifest still carries bounds
        snap = iceberg_snapshot(spark, tbl)
        cur = next(s for s in snap.metadata["snapshots"]
                   if s["snapshot-id"]
                   == snap.metadata["current-snapshot-id"])
        _, ml = read_container_file(cur["manifest-list"])
        newest = [e for e in ml if int(e.get("content") or 0) == 0]
        found = False
        for e in newest:
            _, recs = read_container_file(e["manifest_path"])
            for r in recs:
                if r["data_file"].get("lower_bounds"):
                    found = True
        assert found
        # and the whole 0..399 range now prunes to the single file
        s = iceberg_snapshot(spark, tbl,
                             range_tests=_build_range_tests(
                                 spark, tbl, {"k": (390, None)}))
        assert len(s.files) == 1   # bounds on the compacted file
        assert read_iceberg(spark, tbl,
                            where_range={"k": (390, None)}) \
            .count() == 10

    def test_date_and_timestamp_ranges(self, spark, tmp_path):
        import datetime

        from wrangle_pypes_spark.sources.iceberg import (
            _build_range_tests,
            iceberg_snapshot,
            write_iceberg,
        )
        tbl = str(tmp_path / "b5")
        for lo in (0, 3):
            df = spark.range(lo, lo + 3).select(
                F.col("id").alias("k"),
                F.expr("date('2024-01-01') + cast(id as int)")
                 .cast("date").alias("d"),
                F.expr("timestamp('2024-01-01 00:00:00') + "
                       "make_interval(0,0,0,id,0,0,0)").alias("ts"))
            write_iceberg(df.coalesce(1), tbl)
        out = read_iceberg(spark, tbl, where_range={
            "d": (datetime.date(2024, 1, 5), None)})
        assert sorted(r["k"] for r in out.collect()) == [4, 5]
        s = iceberg_snapshot(spark, tbl,
                             range_tests=_build_range_tests(
                                 spark, tbl,
                                 {"d": (datetime.date(2024, 1, 5),
                                        None)}))
        assert len(s.files) == 1
        out2 = read_iceberg(spark, tbl, where_range={
            "ts": (None, datetime.datetime(2024, 1, 2, 12))})
        assert sorted(r["k"] for r in out2.collect()) == [0, 1]


class TestColumnDDL:
    """iceberg_rename_column / iceberg_drop_column — metadata-only
    schema DDL: columns are field-id addressed, renames publish a
    name-mapping so files written under the old name keep resolving,
    drops never reuse ids, and name re-adds refuse (the name-matched
    scan would resurrect dropped data)."""

    def test_rename_reads_old_and_new_files(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_rename_column,
            iceberg_snapshot,
            write_iceberg,
        )
        tbl = str(tmp_path / "r1")
        df = spark.range(5).select(F.col("id").alias("k"),
                                   (F.col("id") * 1.5).alias("v"))
        write_iceberg(df.coalesce(1), tbl)
        iceberg_rename_column(spark, tbl, "v", "score")
        meta = iceberg_snapshot(spark, tbl).metadata
        nm = json.loads(
            meta["properties"]["schema.name-mapping.default"])
        assert nm == [{"field-id": 2, "names": ["v", "score"]}]
        assert len(meta["schemas"]) == 2
        out = read_iceberg(spark, tbl).orderBy("k")
        assert out.columns == ["k", "score"]
        assert [r["score"] for r in out.collect()] \
            == [i * 1.5 for i in range(5)]
        # append under the new name; both vintages read together
        df2 = spark.range(5, 8).select(
            F.col("id").alias("k"), (F.col("id") * 1.5).alias("score"))
        write_iceberg(df2.coalesce(1), tbl)
        out = read_iceberg(spark, tbl).orderBy("k")
        assert [r["score"] for r in out.collect()] \
            == [i * 1.5 for i in range(8)]

    def test_rename_on_partitioned_table(self, spark, tmp_path):
        """Identity-partitioned tables take the attach path — the
        explicit-schema scan must read renamed columns under the old
        file-side name, not null-fill them."""
        from wrangle_pypes_spark.sources.iceberg import (
            IcebergProtocolError,
            iceberg_rename_column,
            write_iceberg,
        )
        tbl = str(tmp_path / "r2")
        df = spark.range(6).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("string").alias("p"),
            (F.col("id") * 1.5).alias("v"))
        write_iceberg(df.coalesce(1), tbl, partition_by=["p"])
        iceberg_rename_column(spark, tbl, "v", "score")
        out = read_iceberg(spark, tbl).orderBy("k")
        rows = out.collect()
        assert [r["score"] for r in rows] \
            == [i * 1.5 for i in range(6)]
        assert all(r["p"] == str(r["k"] % 2) for r in rows)
        # partition source columns refuse to rename
        with pytest.raises(IcebergProtocolError, match="partition"):
            iceberg_rename_column(spark, tbl, "p", "bucket")

    def test_bounds_pruning_across_rename(self, spark, tmp_path):
        """lower/upper bounds are field-id keyed — a rename must not
        break data skipping on files written under the old name."""
        from wrangle_pypes_spark.sources.iceberg import (
            _build_range_tests,
            iceberg_rename_column,
            iceberg_snapshot,
            write_iceberg,
        )
        tbl = str(tmp_path / "r3")
        for i in range(3):
            df = spark.range(i * 10, (i + 1) * 10).select(
                F.col("id").alias("k"),
                (F.col("id") * 1.0).alias("v"))
            write_iceberg(df.coalesce(1), tbl)
        iceberg_rename_column(spark, tbl, "v", "score")
        s = iceberg_snapshot(spark, tbl,
                             range_tests=_build_range_tests(
                                 spark, tbl, {"score": (25.0, None)}))
        assert len(s.files) == 1
        out = read_iceberg(spark, tbl,
                           where_range={"score": (25.0, None)})
        assert sorted(r["k"] for r in out.collect()) \
            == list(range(25, 30))

    def test_drop_and_resurrect_guard(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            IcebergProtocolError,
            iceberg_drop_column,
            iceberg_snapshot,
            write_iceberg,
        )
        tbl = str(tmp_path / "r4")
        df = spark.range(5).select(F.col("id").alias("k"),
                                   (F.col("id") * 1.5).alias("v"))
        write_iceberg(df.coalesce(1), tbl)
        iceberg_drop_column(spark, tbl, "v")
        out = read_iceberg(spark, tbl)
        assert out.columns == ["k"] and out.count() == 5
        meta = iceberg_snapshot(spark, tbl).metadata
        assert int(meta["last-column-id"]) == 2  # never decreases
        # re-adding the dropped NAME refuses — the name-matched scan
        # would read the dead physical data back
        df2 = spark.range(5, 6).select(F.col("id").alias("k"),
                                       F.lit(0.0).alias("v"))
        with pytest.raises(IcebergProtocolError, match="earlier"):
            write_iceberg(df2, tbl, merge_schema=True)
        with pytest.raises(ValueError, match="no column"):
            iceberg_drop_column(spark, tbl, "zz")


class TestIceSnapshotCache:
    """Session snapshot cache (the Delta cache's Iceberg twin): a
    resolved (metadata text, target) is immutable and reused;
    commits invalidate via the text hash; recreation at the same
    path can never serve a stale snapshot; filtered resolutions
    bypass."""

    def test_reuse_invalidate_and_recreate(self, spark, tmp_path):
        import shutil

        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_snapshot,
            write_iceberg,
        )
        tbl = str(tmp_path / "c1")
        df = spark.range(6).select(F.col("id").alias("k"))
        write_iceberg(df.coalesce(1), tbl)
        s1 = iceberg_snapshot(spark, tbl)
        assert iceberg_snapshot(spark, tbl) is s1
        # a commit changes the metadata text -> new resolution
        write_iceberg(df.coalesce(1), tbl)
        s2 = iceberg_snapshot(spark, tbl)
        assert s2 is not s1 and len(s2.files) == 2
        # time travel by snapshot id caches independently
        old = iceberg_snapshot(spark, tbl,
                               snapshot_id=s1.snapshot_id)
        assert len(old.files) == 1
        assert iceberg_snapshot(
            spark, tbl, snapshot_id=s1.snapshot_id) is old
        # recreate the table at the same path: different metadata
        # text -> different entry, never the stale snapshot
        shutil.rmtree(tbl)
        write_iceberg(spark.range(3).select(F.col("id").alias("k"))
                      .coalesce(1), tbl)
        s3 = iceberg_snapshot(spark, tbl)
        assert s3 is not s1 and len(s3.files) == 1

    def test_filtered_resolutions_bypass(self, spark, tmp_path):
        from wrangle_pypes_spark.sources.iceberg import (
            iceberg_snapshot,
            write_iceberg,
        )
        tbl = str(tmp_path / "c2")
        df = spark.range(9).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("p"))
        write_iceberg(df.coalesce(1), tbl, partition_by=["p"])
        full = iceberg_snapshot(spark, tbl)
        pruned = iceberg_snapshot(spark, tbl,
                                  partition_filter={"p": "1"})
        assert len(pruned.files) < len(full.files)
        # and the unfiltered cache entry is untouched by the pruned
        # resolution
        assert iceberg_snapshot(spark, tbl) is full
