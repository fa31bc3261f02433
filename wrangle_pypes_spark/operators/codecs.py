"""Pure-stdlib image/audio codecs for the multimodal operators.

The container has no PIL/opencv/ffmpeg, but the *container-native*
formats need none of them: PNG is zlib (stdlib) + per-scanline
unfiltering, BMP/PPM/PGM are raw pixel dumps with fixed headers, and
WAV rides the stdlib ``wave`` module.  This module implements REAL
encode/decode for those formats with ``zlib``/``struct``/``wave`` +
numpy, which upgrades ``operators/multimodal.py`` from "deterministic
stub" to real pixel/sample processing for every format the standard
library can express.  JPEG/WebP/MP3/video stay environment-gated (they
need external codec libraries) and raise a loud ``NotImplementedError``
naming the missing dependency — never a silent fake.

Reference parity note: the reference engine (wrangle_pypes) has no
multimodal surface at all — this module is part of the [EXT]
training-data-pipeline mandate, not a port.

Scale shape: codecs are pure per-payload functions invoked from
Arrow-batched ``mapInPandas`` in multimodal.py — map-only, no shuffle,
parallelism == partition count.  Decode cost is linear in payload
bytes; PNG filters 0/1/2 unfilter fully vectorized (numpy cumsum for
Sub), filters 3/4 (Average/Paeth) fall back to a per-scanline Python
loop — fine for thumbnail-scale rows; a 100 TB pipeline decoding
photo-scale JPEGs would swap in libjpeg-turbo behind the same
``image_decode`` dispatch.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# colortype -> channel count (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_COLORTYPE_FOR_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


def sniff_format(data: bytes) -> str | None:
    """Best-effort container sniff from magic bytes; None if unknown."""
    if data is None or len(data) < 4:
        return None
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] in (b"P5", b"P6") and data[2:3] in b" \t\r\n#":
        return "pgm" if data[:2] == b"P5" else "ppm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    return None


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _paeth_predict(left: np.ndarray, up: np.ndarray,
                   ul: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9, int arithmetic)."""
    p = left.astype(np.int32) + up.astype(np.int32) - ul.astype(np.int32)
    pa = np.abs(p - left)
    pb = np.abs(p - up)
    pc = np.abs(p - ul)
    return np.where((pa <= pb) & (pa <= pc), left,
                    np.where(pb <= pc, up, ul)).astype(np.int32)


def png_encode(arr: np.ndarray, *, filter_mode: str | int = 0,
               level: int = 6) -> bytes:
    """Encode a uint8 array as PNG: (H,W) gray, (H,W,2) gray+alpha,
    (H,W,3) RGB, (H,W,4) RGBA.

    ``filter_mode``: a fixed filter id 0-4, or ``"cycle"`` (row % 5 —
    deterministically exercises every filter type, used by the oracle
    queries so a decoder bug in ANY filter breaks the value hash), or
    ``"adaptive"`` (min-sum-of-abs heuristic, the libpng default).
    Filtering on encode is non-recursive, so all modes are vectorized.
    """
    a = np.ascontiguousarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"png_encode wants uint8, got {a.dtype}")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _PNG_COLORTYPE_FOR_CHANNELS:
        raise ValueError(f"unsupported image shape {arr.shape}")
    h, w, ch = a.shape
    if h < 1 or w < 1:
        raise ValueError("empty image")
    colortype = _PNG_COLORTYPE_FOR_CHANNELS[ch]
    flat = a.reshape(h, w * ch).astype(np.int32)
    prev = np.zeros(w * ch, dtype=np.int32)
    # per-row candidate filtered outputs (encode-side filters have no
    # recurrence: they reference RECONSTRUCTED bytes, which on encode
    # are just the source bytes)
    out = bytearray()
    for y in range(h):
        row = flat[y]
        left = np.concatenate([np.zeros(ch, np.int32), row[:-ch]])
        upl = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
        cands = {
            0: row,
            1: (row - left) & 255,
            2: (row - prev) & 255,
            3: (row - ((left + prev) >> 1)) & 255,
            4: (row - _paeth_predict(left, prev, upl)) & 255,
        }
        if filter_mode == "cycle":
            ft = y % 5
        elif filter_mode == "adaptive":
            # minimum sum of absolute differences heuristic
            def _cost(v):
                s = v.astype(np.int32)
                return int(np.minimum(s, 256 - s).sum())
            ft = min(cands, key=lambda k: (_cost(cands[k]), k))
        else:
            ft = int(filter_mode)
            if ft not in cands:
                raise ValueError(f"bad filter_mode {filter_mode!r}")
        out.append(ft)
        out += cands[ft].astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out), level))
            + _png_chunk(b"IEND", b""))


def _png_unfilter_row(ft: int, raw: np.ndarray, prev: np.ndarray,
                      bpp: int) -> np.ndarray:
    """Reconstruct one scanline (int32 in, int32 out, values 0-255)."""
    if ft == 0:
        return raw.copy()
    if ft == 2:
        return (raw + prev) & 255
    if ft == 1:
        # Sub is a per-lane prefix sum mod 256 — vectorized via cumsum
        cur = np.empty_like(raw)
        for c in range(bpp):
            cur[c::bpp] = np.cumsum(raw[c::bpp]) & 255
        return cur
    if ft == 3:
        # Average references reconstructed-left — sequential per lane
        cur = np.empty_like(raw)
        for c in range(bpp):
            lane_raw = raw[c::bpp]
            lane_prev = prev[c::bpp]
            lane = np.empty_like(lane_raw)
            left = 0
            for i in range(len(lane_raw)):
                left = (lane_raw[i] + ((left + lane_prev[i]) >> 1)) & 255
                lane[i] = left
            cur[c::bpp] = lane
        return cur
    if ft == 4:
        cur = np.empty_like(raw)
        for c in range(bpp):
            lane_raw = raw[c::bpp]
            lane_prev = prev[c::bpp]
            lane = np.empty_like(lane_raw)
            left = 0
            ul = 0
            for i in range(len(lane_raw)):
                up = int(lane_prev[i])
                p = left + up - ul
                pa = abs(p - left)
                pb = abs(p - up)
                pc = abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (
                    up if pb <= pc else ul)
                left = (int(lane_raw[i]) + pred) & 255
                lane[i] = left
                ul = up
            cur[c::bpp] = lane
        return cur
    raise ValueError(f"invalid PNG filter type {ft}")


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (gray / gray+alpha / RGB /
    RGBA / palette) to a uint8 array (H,W) or (H,W,C).

    Loud errors on corruption (CRC, truncation, bad filter ids) and on
    unsupported variants (16-bit, interlaced) — never a silent guess.
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError(f"truncated PNG chunk {tag!r}")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"PNG CRC mismatch in chunk {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, colortype, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} unsupported "
                                  "(8-bit only)")
    if interlace != 0:
        raise NotImplementedError("interlaced PNG unsupported")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if colortype not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {colortype} unsupported")
    ch = _PNG_CHANNELS[colortype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG pixel data length mismatch")
    rows = raw.reshape(h, 1 + stride)
    out = np.empty((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        prev = _png_unfilter_row(int(rows[y, 0]),
                                 rows[y, 1:].astype(np.int32), prev, ch)
        out[y] = prev
    img = out.astype(np.uint8)
    if colortype == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        if int(img.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        return palette[img.reshape(h, w)]
    if ch == 1:
        return img.reshape(h, w)
    return img.reshape(h, w, ch)


# --------------------------------------------------------------------------
# BMP (24-bit uncompressed BI_RGB)
# --------------------------------------------------------------------------

def bmp_encode(arr: np.ndarray) -> bytes:
    """Encode uint8 (H,W,3) RGB (or (H,W) gray, replicated) as a 24-bit
    bottom-up BI_RGB BMP."""
    a = np.ascontiguousarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"bmp_encode wants uint8, got {a.dtype}")
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"bmp_encode wants (H,W,3)/(H,W), got {arr.shape}")
    h, w, _ = a.shape
    pad = (-3 * w) % 4
    row_bytes = 3 * w + pad
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, :3 * w] = a[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, BGR
    pixdata = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixdata), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(pixdata), 2835, 2835, 0, 0)
    return header + info + pixdata


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BI_RGB BMP to uint8 (H,W,3) RGB.
    Handles bottom-up and top-down row order."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (_, _, _, _, offset) = struct.unpack_from("<2sIHHI", data, 0)
    (hsize, w, h_signed, planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", data, 14)
    if hsize < 40:
        raise NotImplementedError(f"BMP header size {hsize} unsupported")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression} unsupported "
            "(24-bit BI_RGB only)")
    h = abs(h_signed)
    pad = (-3 * w) % 4
    row_bytes = 3 * w + pad
    need = offset + row_bytes * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    body = np.frombuffer(data[offset:need], np.uint8).reshape(h, row_bytes)
    img = body[:, :3 * w].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h_signed > 0:
        img = img[::-1]  # bottom-up -> top-down
    return np.ascontiguousarray(img)


# --------------------------------------------------------------------------
# PPM / PGM (binary P6 / P5, maxval 255)
# --------------------------------------------------------------------------

def pnm_encode(arr: np.ndarray) -> bytes:
    """Encode uint8 (H,W) as binary PGM (P5) or (H,W,3) as PPM (P6)."""
    a = np.ascontiguousarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"pnm_encode wants uint8, got {a.dtype}")
    if a.ndim == 2:
        magic = b"P5"
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
        h, w, _ = a.shape
    else:
        raise ValueError(f"pnm_encode wants (H,W)/(H,W,3), got {arr.shape}")
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def pnm_decode(data: bytes) -> np.ndarray:
    """Decode binary PGM (P5) / PPM (P6) with maxval 255; tolerates
    comments and arbitrary whitespace in the header per the spec."""
    if data[:2] not in (b"P5", b"P6"):
        raise NotImplementedError("only binary P5/P6 PNM supported")
    ch = 1 if data[:2] == b"P5" else 3
    pos = 2
    fields = []
    while len(fields) < 3:
        if pos >= len(data):
            raise ValueError("truncated PNM header")
        c = data[pos:pos + 1]
        if c == b"#":
            while pos < len(data) and data[pos:pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(data) and not data[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError(f"PNM maxval {maxval} unsupported")
    need = w * h * ch
    body = data[pos:pos + need]
    if len(body) != need:
        raise ValueError("truncated PNM pixel data")
    img = np.frombuffer(body, np.uint8)
    return img.reshape(h, w) if ch == 1 else img.reshape(h, w, 3)


# --------------------------------------------------------------------------
# WAV (PCM 16-bit via stdlib wave)
# --------------------------------------------------------------------------

def wav_encode(samples: np.ndarray, *, rate: int) -> bytes:
    """Encode int16 samples — (N,) mono or (N, ch) — as PCM16 WAV."""
    a = np.ascontiguousarray(samples)
    if a.dtype != np.int16:
        raise ValueError(f"wav_encode wants int16, got {a.dtype}")
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"wav_encode wants (N,)/(N,ch), got {samples.shape}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(a.shape[1])
        wv.setsampwidth(2)
        wv.setframerate(int(rate))
        wv.writeframes(a.astype("<i2").tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 WAV to (int16 array (N,) mono / (N,ch), rate)."""
    with wave.open(io.BytesIO(data), "rb") as wv:
        if wv.getsampwidth() != 2:
            raise NotImplementedError(
                f"WAV sample width {wv.getsampwidth()} unsupported "
                "(PCM16 only)")
        nch = wv.getnchannels()
        rate = wv.getframerate()
        n = wv.getnframes()
        raw = wv.readframes(n)
    a = np.frombuffer(raw, "<i2")
    if nch > 1:
        a = a.reshape(-1, nch)
    return a, rate


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

_GATED = {
    "jpeg": "libjpeg (PIL/opencv) not present in this environment",
    "webp": "libwebp (PIL) not present in this environment",
}


def image_decode(data: bytes) -> np.ndarray:
    """Decode any supported still-image payload by magic-byte sniff.

    Raises ``NotImplementedError`` naming the missing system dependency
    for formats that need external codec libraries (jpeg/webp), and
    ``ValueError`` for unrecognized bytes — the multimodal operators
    surface both loudly rather than fabricating features.
    """
    fmt = sniff_format(data)
    if fmt == "png":
        return png_decode(data)
    if fmt == "bmp":
        return bmp_decode(data)
    if fmt in ("ppm", "pgm"):
        return pnm_decode(data)
    if fmt == "gif":
        frames = gif_decode(data)
        if len(frames) > 1:
            raise ValueError(
                "animated GIF: use gif_decode() / sample_frames_real "
                "for the frame list (image_decode returns ONE image)")
        return frames[0]
    if fmt in _GATED:
        raise NotImplementedError(f"{fmt} decode gated: {_GATED[fmt]}")
    raise ValueError(f"unrecognized image payload (sniffed {fmt!r})")


def image_encode(arr: np.ndarray, fmt: str, **kw) -> bytes:
    if fmt == "png":
        return png_encode(arr, **kw)
    if fmt == "bmp":
        return bmp_encode(arr)
    if fmt in ("ppm", "pgm"):
        return pnm_encode(arr)
    if fmt in _GATED:
        raise NotImplementedError(f"{fmt} encode gated: {_GATED[fmt]}")
    raise ValueError(f"unknown image format {fmt!r}")


# --------------------------------------------------------------------------
# GIF (87a/89a, LZW) — the container-native ANIMATED format, so frame
# sampling can be REAL without ffmpeg
# --------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """GIF-flavor LZW: variable code width from min+1 to 12 bits,
    CLEAR resets the dictionary, EOI terminates.  Returns the decoded
    symbol stream as a ``bytearray`` (GIF symbols are palette indices
    < 256 by construction): dictionary entries are ``bytes`` values so
    every append to the output is a memcpy, not a per-symbol Python
    loop — the dominant cost of the tuple-valued variant this
    replaces."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader, LSB-first per spec
    acc = 0
    nbits = 0
    pos = 0
    n_data = len(data)
    width = min_code_size + 1
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]
    dict_ = list(base)  # index == code; clear/eoi slots never read
    next_code = eoi + 1
    prev = None
    while True:
        while nbits < width:
            if pos >= n_data:
                raise ValueError("truncated GIF LZW stream (no EOI)")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dict_ = list(base)
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= next_code:
                raise ValueError(f"corrupt GIF LZW code {code}")
            entry = dict_[code]
        elif code < next_code:
            entry = dict_[code]
            if next_code <= 4095:
                dict_.append(prev + entry[:1])
                next_code += 1
        elif code == next_code:
            entry = prev + prev[:1]
            if next_code <= 4095:
                dict_.append(entry)
                next_code += 1
        else:
            raise ValueError(f"corrupt GIF LZW code {code}")
        out += entry
        prev = entry
        if next_code - 1 == (1 << width) - 1 and width < 12:
            width += 1
    raise ValueError("unreachable")


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """Real dictionary-growing GIF LZW encoder (not the
    uncompressed-GIF trick), so decode's growth path round-trips."""
    clear = 1 << min_code_size
    eoi = clear + 1
    dict_ = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    seq = ()
    for px in indices:
        cand = seq + (int(px),)
        if cand in dict_:
            seq = cand
            continue
        emit(dict_[seq])
        if next_code <= 4095:
            dict_[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            dict_ = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = (int(px),)
    if seq:
        emit(dict_[seq])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_encode(frames, *, palette=None, delay_cs: int = 4) -> bytes:
    """Encode uint8 index frames [(H,W) arrays] as an animated GIF89a
    with one global 256-entry palette ((256,3) uint8; default = gray
    identity ramp).  Full-canvas frames, disposal 'draw on previous'."""
    import numpy as np
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g], axis=1)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    out += palette.astype(np.uint8).tobytes()
    # netscape loop extension (real-world shape; decoder must skip it)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must be full-canvas")
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) \
            + b"\x00\x00"  # GCE: no transparency, disposal 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(8)  # LZW min code size
        lzw = _lzw_encode(fr.reshape(-1).tolist(), 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def gif_decode(data: bytes):
    """Decode an animated GIF to a list of full-canvas uint8 (H,W,3)
    RGB frames.  Supports GCT/LCT, interlace, transparency, disposal
    0/1 (draw over previous) and 2 (restore background); disposal 3
    (restore previous) gates loudly.  Trailing NETSCAPE/comment/plain-
    text extensions are skipped per spec."""
    import numpy as np
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, packed, bg, _ = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            np.uint8).reshape(-1, 3)
        pos += 3 * n
    frames = []
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    transparent = None
    disposal = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                flags = data[pos + 1]
                disposal = (flags >> 2) & 0x07
                transparent = (data[pos + 4]
                               if flags & 1 else None)
                pos += size + 1
            while data[pos] != 0:  # skip (remaining) sub-blocks
                pos += data[pos] + 1
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB",
                                                        data, pos)
        pos += 9
        pal = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            pal = np.frombuffer(data[pos:pos + 3 * n],
                                np.uint8).reshape(-1, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame without any palette")
        interlaced = bool(fpacked & 0x40)
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1:pos + 1 + ln]
            pos += ln + 1
        pos += 1
        idx = np.frombuffer(
            bytes(_lzw_decode(bytes(lzw), min_code)),
            dtype=np.uint8).astype(np.int32)
        if len(idx) != fw * fh:
            raise ValueError("GIF frame pixel count mismatch")
        idx = idx.reshape(fh, fw)
        if interlaced:
            de = np.empty_like(idx)
            rows = (list(range(0, fh, 8)) + list(range(4, fh, 8))
                    + list(range(2, fh, 4)) + list(range(1, fh, 2)))
            de[rows] = idx
            idx = de
        if disposal == 3:
            raise NotImplementedError(
                "GIF disposal 3 (restore previous) not implemented")
        region = canvas[top:top + fh, left:left + fw]
        rgb = pal[np.clip(idx, 0, len(pal) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            bgc = pal[bg] if bg < len(pal) else 0
            canvas[top:top + fh, left:left + fw] = bgc
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image frames")
    return frames
