"""Deletion-vector codec (sources/dv.py): Z85 vectors from the public
ZeroMQ spec, roaring round-trips across container kinds, the 64-bit
RoaringBitmapArray format, DV file packing + checksums, and descriptor
resolution.  Pure-Python — no Spark session needed."""

import random
import struct
import uuid

import numpy as np
import pytest

from wrangle_pypes_spark.sources import dv


class TestZ85:
    def test_rfc_vector(self):
        # the ZeroMQ RFC 32 reference vector
        raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
        assert dv.z85_encode(raw) == "HelloWorld"
        assert dv.z85_decode("HelloWorld") == raw

    def test_round_trip_random(self):
        rng = random.Random(3)
        for n in (0, 4, 16, 64):
            raw = bytes(rng.randrange(256) for _ in range(n))
            assert dv.z85_decode(dv.z85_encode(raw)) == raw

    def test_bad_lengths_and_chars(self):
        with pytest.raises(dv.DeletionVectorError):
            dv.z85_encode(b"abc")
        with pytest.raises(dv.DeletionVectorError):
            dv.z85_decode("abcd")
        with pytest.raises(dv.DeletionVectorError):
            dv.z85_decode('ab"de')


class TestRoaring:
    @pytest.mark.parametrize("values", [
        [],
        [0],
        [0, 1, 5, 100_000],
        [2**32 + 5, 2**33 + 7, 12, 2**32 - 1],
        list(range(70_000, 90_000)),  # dense: bitmap containers
    ])
    def test_round_trip(self, values):
        got = dv.rba_deserialize(dv.rba_serialize(values))
        assert list(got) == sorted(set(values))

    def test_round_trip_random_mixed(self):
        rng = random.Random(11)
        vals = (rng.sample(range(300_000), 9_000)
                + [2**32 + v for v in rng.sample(range(10_000), 50)])
        got = dv.rba_deserialize(dv.rba_serialize(vals))
        assert list(got) == sorted(set(vals))

    def test_run_container_decode(self):
        """Foreign writers may emit run containers (cookie 12346);
        hand-build one straight from the RoaringFormatSpec."""
        runs = [(10, 10), (100, 2)]  # [start, extra-length] pairs
        cookie = dv._SERIAL_COOKIE_RUN  # 1 container -> size bits 0
        body = struct.pack("<i", cookie) + bytes([0b1])
        body += struct.pack("<HH", 0, 13)  # key 0, cardinality-1
        body += struct.pack("<H", len(runs))
        for s, ln in runs:
            body += struct.pack("<HH", s, ln)
        vals, used = dv._deserialize_roaring32(body, 0)
        assert used == len(body)
        assert list(vals) == list(range(10, 21)) + [100, 101, 102]

    def test_bad_magic_is_loud(self):
        good = dv.rba_serialize([1, 2])
        bad = struct.pack("<i", 999) + good[4:]
        with pytest.raises(dv.DeletionVectorError, match="magic"):
            dv.rba_deserialize(bad)


class TestDvFile:
    def test_pack_unpack_multiple(self):
        bms = [dv.rba_serialize([1, 2, 3]),
               dv.rba_serialize(range(5000))]
        data, offsets = dv.pack_dv_file(bms)
        assert data[0] == dv.DV_FILE_VERSION
        for off, bm in zip(offsets, bms):
            assert dv.unpack_dv_at(data, off, len(bm)) == bm

    def test_checksum_mismatch_is_loud(self):
        bm = dv.rba_serialize([7])
        data, offs = dv.pack_dv_file([bm])
        corrupted = bytearray(data)
        corrupted[offs[0] + 5] ^= 0xFF
        with pytest.raises(dv.DeletionVectorError, match="checksum"):
            dv.unpack_dv_at(bytes(corrupted), offs[0], len(bm))

    def test_uuid_path_resolution(self):
        u = uuid.uuid4()
        assert dv.resolve_dv_path("/t", "u", dv.encode_uuid_path(u)) \
            == f"/t/deletion_vector_{u}.bin"
        assert dv.resolve_dv_path("/t", "u",
                                  dv.encode_uuid_path(u, "ab")) \
            == f"/t/ab/deletion_vector_{u}.bin"
        assert dv.resolve_dv_path("/t", "p", "/abs/x.bin") \
            == "/abs/x.bin"

    def test_inline_descriptor_decode(self):
        bm = dv.rba_serialize([3, 9, 2**32 + 1])
        text, size = dv.inline_encode(bm)
        desc = {"storageType": "i", "pathOrInlineDv": text,
                "sizeInBytes": size, "cardinality": 3}
        assert list(dv.decode_descriptor(desc, "/t")) \
            == [3, 9, 2**32 + 1]

    def test_cardinality_guard(self):
        bm = dv.rba_serialize([1])
        text, size = dv.inline_encode(bm)
        desc = {"storageType": "i", "pathOrInlineDv": text,
                "sizeInBytes": size, "cardinality": 2}
        with pytest.raises(dv.DeletionVectorError, match="cardinality"):
            dv.decode_descriptor(desc, "/t")

    def test_file_descriptor_via_cache(self, tmp_path):
        bm = dv.rba_serialize([0, 4])
        data, offs = dv.pack_dv_file([bm])
        u = uuid.uuid4()
        p = tmp_path / f"deletion_vector_{u}.bin"
        p.write_bytes(data)
        desc = {"storageType": "u",
                "pathOrInlineDv": dv.encode_uuid_path(u),
                "offset": offs[0], "sizeInBytes": len(bm),
                "cardinality": 2}
        cache = {}
        got = dv.decode_descriptor(desc, str(tmp_path), cache)
        assert list(got) == [0, 4]
        assert len(cache) == 1  # second decode hits the cache
        assert list(dv.decode_descriptor(desc, str(tmp_path),
                                         cache)) == [0, 4]
