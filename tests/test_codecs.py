"""Codec correctness: pure-stdlib PNG/BMP/PNM/WAV vs independent
reference constructions.

The roundtrip tests alone would be self-consistent (a matched
encoder+decoder bug passes them), so the decode tests here also check
against PNG/BMP bytes built INDEPENDENTLY in the test with raw
struct/zlib — a different code path from the encoder — and against
hand-computed filter reconstructions straight from the PNG spec.
"""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wrangle_pypes_spark.operators import codecs as C


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _raw_png(w, h, colortype, scanlines: bytes, extra=b"") -> bytes:
    """Independent minimal PNG writer (filter bytes included by caller)."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (C._PNG_SIG + _chunk(b"IHDR", ihdr) + extra
            + _chunk(b"IDAT", zlib.compress(scanlines))
            + _chunk(b"IEND", b""))


class TestPngDecodeIndependent:
    def test_filter0_rgb(self):
        rng = np.random.RandomState(1)
        a = rng.randint(0, 256, (4, 3, 3)).astype(np.uint8)
        scan = b"".join(b"\x00" + a[y].tobytes() for y in range(4))
        assert (C.png_decode(_raw_png(3, 4, 2, scan)) == a).all()

    def test_each_filter_reconstruction_per_spec(self):
        # one 2-row gray image per filter type; expected reconstruction
        # computed by hand from the PNG spec recurrences
        prev = [10, 20, 30, 40]
        raw = [7, 250, 3, 128]
        cases = {
            0: raw,
            1: [7, (250 + 7) % 256, (3 + 257 % 256) % 256,
                (128 + 260 % 256) % 256],
            2: [(7 + 10) % 256, (250 + 20) % 256, (3 + 30) % 256,
                (128 + 40) % 256],
        }
        # filters 3/4 via explicit spec loops
        rec3, left = [], 0
        for i in range(4):
            left = (raw[i] + ((left + prev[i]) >> 1)) & 255
            rec3.append(left)
        cases[3] = rec3
        rec4, left, ul = [], 0, 0
        for i in range(4):
            up = prev[i]
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if (pa <= pb and pa <= pc) else (
                up if pb <= pc else ul)
            left = (raw[i] + pred) & 255
            rec4.append(left)
            ul = up
        cases[4] = rec4
        for ft, expected in cases.items():
            scan = (b"\x00" + bytes(prev)
                    + bytes([ft]) + bytes(raw))
            img = C.png_decode(_raw_png(4, 2, 0, scan))
            assert img[0].tolist() == prev
            assert img[1].tolist() == expected, f"filter {ft}"

    def test_palette(self):
        pal = np.arange(12, dtype=np.uint8).reshape(4, 3) * 20
        idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
        scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
        png = _raw_png(3, 2, 3, scan, extra=_chunk(b"PLTE", pal.tobytes()))
        assert (C.png_decode(png) == pal[idx]).all()

    def test_crc_corruption_is_loud(self):
        png = bytearray(C.png_encode(np.zeros((2, 2), np.uint8)))
        png[40] ^= 0xFF
        with pytest.raises(ValueError, match="CRC|truncated|mismatch"):
            C.png_decode(bytes(png))

    def test_unsupported_variants_are_loud(self):
        ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        png = (C._PNG_SIG + _chunk(b"IHDR", ihdr16)
               + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
               + _chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError, match="bit depth"):
            C.png_decode(png)
        with pytest.raises(ValueError, match="signature"):
            C.png_decode(b"nope" * 4)

    def test_bad_filter_id_is_loud(self):
        scan = b"\x09" + bytes(2)
        with pytest.raises(ValueError, match="filter type"):
            C.png_decode(_raw_png(2, 1, 0, scan))

    def test_pixel_length_mismatch_is_loud(self):
        scan = b"\x00" + bytes(5)  # stride should be 2
        with pytest.raises(ValueError, match="length mismatch"):
            C.png_decode(_raw_png(2, 1, 0, scan))


class TestPngRoundtrip:
    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 12), st.integers(1, 12),
           st.sampled_from([1, 2, 3, 4]),
           st.sampled_from([0, 1, 2, 3, 4, "cycle", "adaptive"]),
           st.integers(0, 2**32 - 1))
    def test_roundtrip(self, h, w, ch, fm, seed):
        rng = np.random.RandomState(seed)
        shape = (h, w) if ch == 1 else (h, w, ch)
        a = rng.randint(0, 256, shape).astype(np.uint8)
        out = C.png_decode(C.png_encode(a, filter_mode=fm))
        assert out.shape == a.shape and (out == a).all()

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError, match="uint8"):
            C.png_encode(np.zeros((2, 2), np.int32))
        with pytest.raises(ValueError, match="shape"):
            C.png_encode(np.zeros((2, 2, 5), np.uint8))
        with pytest.raises(ValueError, match="empty"):
            C.png_encode(np.zeros((0, 2), np.uint8))


class TestBmp:
    def test_decode_independent_bytes(self):
        # hand-built 2x2 bottom-up BGR BMP with row padding (w=2 ->
        # 6 bytes/row -> 2 pad bytes)
        px_topdown = np.array([[[1, 2, 3], [4, 5, 6]],
                               [[7, 8, 9], [10, 11, 12]]], np.uint8)
        rows = b""
        for y in (1, 0):  # bottom-up
            for x in range(2):
                r, g, b = px_topdown[y, x]
                rows += bytes([b, g, r])
            rows += b"\x00\x00"
        header = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
        info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                           len(rows), 0, 0, 0, 0)
        assert (C.bmp_decode(header + info + rows) == px_topdown).all()

    @settings(max_examples=20, deadline=None)
    @given(st.integers(1, 9), st.integers(1, 9),
           st.integers(0, 2**32 - 1))
    def test_roundtrip_with_padding(self, h, w, seed):
        rng = np.random.RandomState(seed)
        a = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        assert (C.bmp_decode(C.bmp_encode(a)) == a).all()

    def test_gray_replicates(self):
        g = np.arange(6, dtype=np.uint8).reshape(2, 3)
        out = C.bmp_decode(C.bmp_encode(g))
        assert (out == np.repeat(g[:, :, None], 3, axis=2)).all()

    def test_unsupported_is_loud(self):
        data = bytearray(C.bmp_encode(np.zeros((2, 2, 3), np.uint8)))
        data[28] = 8  # bpp
        with pytest.raises(NotImplementedError, match="bpp"):
            C.bmp_decode(bytes(data))


class TestPnm:
    def test_roundtrip(self):
        rng = np.random.RandomState(3)
        a = rng.randint(0, 256, (5, 4, 3)).astype(np.uint8)
        g = rng.randint(0, 256, (3, 7)).astype(np.uint8)
        assert (C.pnm_decode(C.pnm_encode(a)) == a).all()
        assert (C.pnm_decode(C.pnm_encode(g)) == g).all()

    def test_header_comments_and_whitespace(self):
        body = bytes(range(6))
        data = b"P5 # comment\n# another\n 3\t2 #x\n255\n" + body
        img = C.pnm_decode(data)
        assert img.shape == (2, 3) and img.tobytes() == body

    def test_truncation_is_loud(self):
        with pytest.raises(ValueError, match="truncated"):
            C.pnm_decode(b"P5\n4 4\n255\n" + bytes(3))


class TestWav:
    @settings(max_examples=15, deadline=None)
    @given(st.integers(1, 500), st.sampled_from([1, 2]),
           st.sampled_from([8000, 16000, 44100]),
           st.integers(0, 2**32 - 1))
    def test_roundtrip(self, n, ch, rate, seed):
        rng = np.random.RandomState(seed)
        shape = (n,) if ch == 1 else (n, ch)
        s = rng.randint(-32768, 32768, shape).astype(np.int16)
        out, r = C.wav_decode(C.wav_encode(s, rate=rate))
        assert r == rate and out.shape == s.shape and (out == s).all()

    def test_rejects_bad_dtype(self):
        with pytest.raises(ValueError, match="int16"):
            C.wav_encode(np.zeros(4, np.float64), rate=8000)


class TestDispatch:
    def test_sniff(self):
        a = np.zeros((2, 2, 3), np.uint8)
        assert C.sniff_format(C.png_encode(a)) == "png"
        assert C.sniff_format(C.bmp_encode(a)) == "bmp"
        assert C.sniff_format(C.pnm_encode(a)) == "ppm"
        assert C.sniff_format(C.pnm_encode(a[:, :, 0])) == "pgm"
        assert C.sniff_format(
            C.wav_encode(np.zeros(4, np.int16), rate=8000)) == "wav"
        assert C.sniff_format(b"\xff\xd8\xff\xe0JFIF") == "jpeg"
        assert C.sniff_format(b"hello world!") is None
        assert C.sniff_format(None) is None

    def test_decode_dispatch_roundtrip(self):
        a = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
        for fmt in ("png", "bmp", "ppm"):
            assert (C.image_decode(C.image_encode(a, fmt)) == a).all()

    def test_gated_formats_name_the_dependency(self):
        with pytest.raises(NotImplementedError, match="libjpeg"):
            C.image_decode(b"\xff\xd8\xff\xe0JFIF....")
        with pytest.raises(NotImplementedError, match="libjpeg"):
            C.image_encode(np.zeros((2, 2, 3), np.uint8), "jpeg")
        with pytest.raises(ValueError, match="unrecognized"):
            C.image_decode(b"some random bytes here")


class TestGif:
    def _pack_codes(self, codes, widths):
        """Independent LSB-first bit packer (spec path, not the
        encoder's)."""
        acc = nbits = 0
        out = bytearray()
        for code, w in zip(codes, widths):
            acc |= code << nbits
            nbits += w
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    def test_lzw_decode_hand_built_stream(self):
        # min_code_size=2: clear=4, eoi=5; emit literals 1,2,3,0 with
        # a mid-stream clear — all 3-bit codes, packed independently
        codes = [4, 1, 2, 4, 3, 0, 5]
        data = self._pack_codes(codes, [3] * len(codes))
        assert list(C._lzw_decode(data, 2)) == [1, 2, 3, 0]

    def test_lzw_decode_dictionary_growth_per_spec(self):
        # the classic KwKwK case: codes [clear, 1, 2, 6, eoi] where 6
        # is defined AS IT IS USED (prev + prev[0]) -> 1,2,(2,1)? no:
        # after (1),(2): code 6 = (2,)+(2,) first element = (2,2)
        codes = [4, 1, 2, 7, 5]
        # dict after "1": nothing new; after "2": 6=(1,2); code 7 is
        # next_code -> entry = (2,)+(2,) = (2,2)
        data = self._pack_codes(codes, [3] * len(codes))
        assert list(C._lzw_decode(data, 2)) == [1, 2, 2, 2]

    def test_lzw_roundtrip_growth(self):
        import numpy as np
        rng = np.random.RandomState(5)
        for n in (1, 10, 5000):
            seq = rng.randint(0, 256, n).tolist()
            assert list(C._lzw_decode(C._lzw_encode(seq, 8), 8)) == seq
        # low-entropy input exercises long dictionary chains
        seq = ([7] * 1000) + list(range(16)) * 50
        assert list(C._lzw_decode(C._lzw_encode(seq, 8), 8)) == seq

    def test_gif_roundtrip_animated(self):
        import numpy as np
        rng = np.random.RandomState(6)
        frames = [rng.randint(0, 256, (9, 11)).astype(np.uint8)
                  for _ in range(5)]
        out = C.gif_decode(C.gif_encode(frames))
        assert len(out) == 5
        for fin, fout in zip(frames, out):
            assert (fout == np.stack([fin] * 3, axis=2)).all()

    def test_gif_interlaced_frame(self):
        import numpy as np
        # hand-build a single interlaced frame: permute rows per the
        # 4-pass spec order and set the interlace flag
        import struct as _s
        h, w = 10, 3
        img = np.arange(h * w, dtype=np.uint8).reshape(h, w)
        order = (list(range(0, h, 8)) + list(range(4, h, 8))
                 + list(range(2, h, 4)) + list(range(1, h, 2)))
        permuted = img[order]
        g = np.arange(256, dtype=np.uint8)
        pal = np.stack([g, g, g], axis=1)
        out = bytearray()
        out += b"GIF89a" + _s.pack("<HHBBB", w, h, 0xF7, 0, 0)
        out += pal.tobytes()
        out += b"\x2c" + _s.pack("<HHHHB", 0, 0, w, h, 0x40)
        out.append(8)
        lzw = C._lzw_encode(permuted.reshape(-1).tolist(), 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
        out += b"\x3b"
        dec = C.gif_decode(bytes(out))
        assert (dec[0][:, :, 0] == img).all()

    def test_gif_transparency_composites_over_previous(self):
        import numpy as np
        import struct as _s
        g = np.arange(256, dtype=np.uint8)
        pal = np.stack([g, g, g], axis=1)
        f0 = np.full((4, 4), 10, np.uint8)
        f1 = np.full((4, 4), 99, np.uint8)
        f1[0, 0] = 77  # 77 will be the transparent index
        out = bytearray()
        out += b"GIF89a" + _s.pack("<HHBBB", 4, 4, 0xF7, 0, 0)
        out += pal.tobytes()
        for fr, gce in ((f0, None), (f1, 77)):
            if gce is not None:
                out += b"\x21\xf9\x04\x01\x00\x00" + bytes([gce, 0])
            out += b"\x2c" + _s.pack("<HHHHB", 0, 0, 4, 4, 0)
            out.append(8)
            lzw = C._lzw_encode(fr.reshape(-1).tolist(), 8)
            out.append(len(lzw))
            out += lzw
            out.append(0)
        out += b"\x3b"
        frames = C.gif_decode(bytes(out))
        assert frames[1][0, 0, 0] == 10  # transparent px kept previous
        assert frames[1][1, 1, 0] == 99

    def test_gif_disposal3_gates(self):
        import numpy as np
        import struct as _s
        g = np.arange(256, dtype=np.uint8)
        pal = np.stack([g, g, g], axis=1)
        fr = np.zeros((2, 2), np.uint8)
        out = bytearray()
        out += b"GIF89a" + _s.pack("<HHBBB", 2, 2, 0xF7, 0, 0)
        out += pal.tobytes()
        out += b"\x21\xf9\x04" + bytes([3 << 2]) + b"\x00\x00\x00\x00"
        out += b"\x2c" + _s.pack("<HHHHB", 0, 0, 2, 2, 0)
        out.append(8)
        lzw = C._lzw_encode(fr.reshape(-1).tolist(), 8)
        out.append(len(lzw))
        out += lzw
        out.append(0)
        out += b"\x3b"
        with pytest.raises(NotImplementedError, match="disposal 3"):
            C.gif_decode(bytes(out))

    def test_sniff_and_dispatch(self):
        import numpy as np
        single = C.gif_encode([np.zeros((2, 2), np.uint8)])
        multi = C.gif_encode([np.zeros((2, 2), np.uint8)] * 2)
        assert C.sniff_format(single) == "gif"
        assert C.image_decode(single).shape == (2, 2, 3)
        with pytest.raises(ValueError, match="animated"):
            C.image_decode(multi)
