"""Delta deletion-vector codec — pure-Python/numpy implementation of
the PUBLIC formats a DV-enabled Delta table uses (delta-io PROTOCOL.md,
"Deletion Vectors" + "Deletion Vector Descriptor Schema" + "Deletion
Vector Format" sections, and the RoaringBitmap interoperable
serialization spec, github.com/RoaringBitmap/RoaringFormatSpec):

- **Z85** (ZeroMQ RFC 32/Z85): the text encoding Delta uses for DV
  uuids and inline DV payloads inside JSON actions.  Input length must
  be a multiple of 4; Delta pads payloads with zero bytes and records
  the true length in ``sizeInBytes``, so the decoder takes an expected
  length and truncates the padding.
- **32-bit RoaringBitmap, portable serialization**: cookie 12347
  (no run containers) or 12346 (with runs); array containers
  (sorted uint16 lists), bitmap containers (8 KiB fixed bitsets) and
  run containers ([start,length] pairs) are all decoded; the encoder
  emits array/bitmap containers only (always spec-valid).
- **RoaringBitmapArray, "portable" format** (the 64-bit extension the
  Delta protocol mandates): little-endian magic ``1681511377``, an
  int64 bitmap count, then per bucket a uint32 key + one 32-bit
  bitmap; value ``v`` lives in bucket ``v >> 32`` as ``v & 0xffffffff``.
- **DV file layout** (storageType ``u``/``p``): a 1-byte format
  version (``1``), then per stored vector ``<dataSize:int32 BE>
  <RoaringBitmapArray bytes> <CRC-32 of those bytes:int32 BE>``; a
  descriptor's ``offset`` addresses the size field and ``sizeInBytes``
  is the payload length.  storageType ``u`` derives the file name from
  a z85-encoded uuid (``deletion_vector_<uuid>.bin`` under an optional
  random prefix); ``p`` is an absolute path; ``i`` inlines the payload
  in the descriptor itself.

Everything here is metadata-scale: a DV is O(deleted rows in one data
file) and decoding happens where the caller runs it — sources/delta.py
expands descriptors to (file, position) rows INSIDE executors via
``mapInPandas``, so the driver never holds decoded positions.

No reference-engine counterpart (the reference has no table formats);
this is [EXT] interop surface beside sources/delta.py.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuidlib
import zlib

import numpy as np

_Z85_ALPHABET = ("0123456789abcdefghijklmnopqrstuvwxyz"
                 "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_ORD = {c: i for i, c in enumerate(_Z85_ALPHABET)}

MAGIC_PORTABLE = 1681511377  # RoaringBitmapArray portable magic
_SERIAL_COOKIE_NO_RUN = 12347
_SERIAL_COOKIE_RUN = 12346
_NO_OFFSET_THRESHOLD = 4  # run-format bitmaps this small omit offsets
_ARRAY_MAX = 4096  # container cardinality above which bitmaps win

DV_FILE_VERSION = 1


class DeletionVectorError(ValueError):
    """Malformed deletion-vector bytes or descriptor."""


# ---------------------------------------------------------------------------
# Z85
# ---------------------------------------------------------------------------

def z85_encode(data: bytes) -> str:
    """Z85-encode ``data`` (length must be a multiple of 4)."""
    if len(data) % 4:
        raise DeletionVectorError(
            f"z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i:i + 4], "big")
        chunk = [""] * 5
        for j in range(4, -1, -1):
            chunk[j] = _Z85_ALPHABET[n % 85]
            n //= 85
        out.append("".join(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    """Decode a Z85 string (length must be a multiple of 5)."""
    if len(text) % 5:
        raise DeletionVectorError(
            f"z85 text length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i:i + 5]:
            try:
                n = n * 85 + _Z85_ORD[c]
            except KeyError:
                raise DeletionVectorError(
                    f"invalid z85 character {c!r}") from None
        if n > 0xFFFFFFFF:
            raise DeletionVectorError("z85 group overflows 32 bits")
        out += n.to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# 32-bit roaring bitmap (portable serialization)
# ---------------------------------------------------------------------------

def _serialize_roaring32(values: np.ndarray) -> bytes:
    """Serialize sorted uint32 values as one 32-bit roaring bitmap
    (cookie 12347: array/bitmap containers, offsets included)."""
    keys = (values >> 16).astype(np.uint32)
    uniq, starts = np.unique(keys, return_index=True)
    bounds = np.append(starts, len(values))
    headers = bytearray()
    bodies = []
    for i, k in enumerate(uniq):
        lows = (values[bounds[i]:bounds[i + 1]] & 0xFFFF).astype(np.uint16)
        card = len(lows)
        headers += struct.pack("<HH", int(k), card - 1)
        if card <= _ARRAY_MAX:
            bodies.append(lows.tobytes())
        else:
            bits = np.zeros(1 << 16, dtype=bool)
            bits[lows] = True
            bodies.append(np.packbits(bits, bitorder="little").tobytes())
    n = len(uniq)
    out = bytearray(struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, n))
    out += headers
    # per-container absolute byte offsets (required by cookie 12347)
    pos = len(out) + 4 * n
    for b in bodies:
        out += struct.pack("<i", pos)
        pos += len(b)
    for b in bodies:
        out += b
    return bytes(out)


def _deserialize_roaring32(data: bytes, at: int) -> tuple[np.ndarray, int]:
    """Decode one 32-bit roaring bitmap starting at ``at``; returns
    (sorted uint32 values, bytes consumed)."""
    start = at
    if len(data) - at < 4:
        raise DeletionVectorError("truncated roaring bitmap (cookie)")
    cookie = struct.unpack_from("<i", data, at)[0]
    at += 4
    run_flags = None
    if (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        flags = np.frombuffer(data, np.uint8, nbytes, at)
        run_flags = np.unpackbits(flags, bitorder="little")[:n].astype(bool)
        at += nbytes
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        n = struct.unpack_from("<i", data, at)[0]
        at += 4
    else:
        raise DeletionVectorError(f"bad roaring cookie {cookie}")
    if n < 0:
        raise DeletionVectorError(f"negative container count {n}")
    hdr = np.frombuffer(data, np.uint16, 2 * n, at).reshape(n, 2)
    at += 4 * n
    if run_flags is None or n >= _NO_OFFSET_THRESHOLD:
        at += 4 * n  # offsets: sequential parse doesn't need them
    chunks = []
    for i in range(n):
        key = int(hdr[i, 0]) << 16
        card = int(hdr[i, 1]) + 1
        if run_flags is not None and run_flags[i]:
            n_runs = struct.unpack_from("<H", data, at)[0]
            at += 2
            runs = np.frombuffer(data, np.uint16, 2 * n_runs, at) \
                .reshape(n_runs, 2).astype(np.uint32)
            at += 4 * n_runs
            for s, ln in runs:
                chunks.append(np.arange(s, s + ln + 1, dtype=np.uint32)
                              + key)
        elif card <= _ARRAY_MAX:
            lows = np.frombuffer(data, np.uint16, card, at)
            at += 2 * card
            chunks.append(lows.astype(np.uint32) + key)
        else:
            bits = np.unpackbits(
                np.frombuffer(data, np.uint8, 8192, at),
                bitorder="little")
            at += 8192
            chunks.append(np.nonzero(bits)[0].astype(np.uint32) + key)
    vals = (np.concatenate(chunks) if chunks
            else np.empty(0, dtype=np.uint32))
    return vals, at - start


# ---------------------------------------------------------------------------
# RoaringBitmapArray (64-bit, portable)
# ---------------------------------------------------------------------------

def rba_serialize(positions) -> bytes:
    """Serialize row positions (any int64 iterable / array) as a
    RoaringBitmapArray in the portable format Delta mandates."""
    vals = np.asarray(sorted(set(int(p) for p in positions)),
                      dtype=np.uint64)
    if len(vals) and int(vals.max()) >> 32 >= 1 << 32:
        raise DeletionVectorError("position exceeds 64-bit bitmap range")
    high = (vals >> np.uint64(32)).astype(np.uint32)
    uniq, starts = np.unique(high, return_index=True)
    bounds = np.append(starts, len(vals))
    out = bytearray(struct.pack("<iq", MAGIC_PORTABLE, len(uniq)))
    for i, k in enumerate(uniq):
        lows = (vals[bounds[i]:bounds[i + 1]]
                & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        out += struct.pack("<I", int(k))
        out += _serialize_roaring32(lows)
    return bytes(out)


def rba_deserialize(data: bytes) -> np.ndarray:
    """Decode a portable RoaringBitmapArray into a sorted int64 array
    of positions."""
    if len(data) < 12:
        raise DeletionVectorError("truncated RoaringBitmapArray")
    magic, n = struct.unpack_from("<iq", data, 0)
    if magic != MAGIC_PORTABLE:
        raise DeletionVectorError(
            f"bad RoaringBitmapArray magic {magic} "
            f"(want {MAGIC_PORTABLE})")
    at = 12
    chunks = []
    for _ in range(n):
        key = struct.unpack_from("<I", data, at)[0]
        at += 4
        vals, used = _deserialize_roaring32(data, at)
        at += used
        chunks.append(vals.astype(np.int64) + (int(key) << 32))
    return (np.concatenate(chunks) if chunks
            else np.empty(0, dtype=np.int64))


# ---------------------------------------------------------------------------
# DV descriptors: inline payloads, file layout, uuid paths
# ---------------------------------------------------------------------------

def inline_encode(bitmap: bytes) -> tuple[str, int]:
    """(z85 text, sizeInBytes) for an inline (storageType 'i')
    descriptor — zero-padded to a 4-byte multiple as Delta does."""
    pad = (-len(bitmap)) % 4
    return z85_encode(bitmap + b"\x00" * pad), len(bitmap)


def inline_decode(text: str, size_in_bytes: int) -> bytes:
    raw = z85_decode(text)
    if size_in_bytes > len(raw):
        raise DeletionVectorError(
            f"inline DV sizeInBytes {size_in_bytes} > payload {len(raw)}")
    return raw[:size_in_bytes]


def encode_uuid_path(dv_uuid: _uuidlib.UUID, prefix: str = "") -> str:
    """The ``pathOrInlineDv`` value for storageType 'u': an optional
    random prefix followed by the 20-char z85 uuid."""
    return prefix + z85_encode(dv_uuid.bytes)


def resolve_dv_path(table: str, storage_type: str,
                    path_or_inline: str) -> str:
    """Absolute path of a file-stored DV per the spec's naming rule."""
    if storage_type == "p":
        return path_or_inline
    if storage_type != "u":
        raise DeletionVectorError(
            f"storageType {storage_type!r} has no file path")
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    dv_uuid = _uuidlib.UUID(bytes=z85_decode(enc))
    name = f"deletion_vector_{dv_uuid}.bin"
    return os.path.join(table, prefix, name) if prefix \
        else os.path.join(table, name)


def pack_dv_file(bitmaps: list[bytes]) -> tuple[bytes, list[int]]:
    """Assemble a DV .bin file holding ``bitmaps`` (each a serialized
    RoaringBitmapArray); returns (file bytes, per-bitmap offsets) with
    offsets addressing each <size> field as descriptors expect."""
    out = bytearray([DV_FILE_VERSION])
    offsets = []
    for bm in bitmaps:
        offsets.append(len(out))
        out += struct.pack(">i", len(bm))
        out += bm
        out += struct.pack(">I", zlib.crc32(bm) & 0xFFFFFFFF)
    return bytes(out), offsets


def unpack_dv_at(data: bytes, offset: int, size_in_bytes: int) -> bytes:
    """Extract + checksum-verify one DV payload from file bytes."""
    if not data or data[0] != DV_FILE_VERSION:
        raise DeletionVectorError(
            f"unsupported DV file version {data[0] if data else '??'}")
    size = struct.unpack_from(">i", data, offset)[0]
    if size != size_in_bytes:
        raise DeletionVectorError(
            f"DV size field {size} != descriptor sizeInBytes "
            f"{size_in_bytes}")
    body = data[offset + 4:offset + 4 + size]
    if len(body) != size:
        raise DeletionVectorError("truncated DV payload")
    want = struct.unpack_from(">I", data, offset + 4 + size)[0]
    got = zlib.crc32(body) & 0xFFFFFFFF
    if want != got:
        raise DeletionVectorError(
            f"DV checksum mismatch (stored {want}, computed {got})")
    return body


def _read_file_bytes(path: str) -> bytes:
    """Executor-safe byte read: local paths via open(); other schemes
    via pyarrow's filesystem layer (no JVM access inside Python
    workers)."""
    if "://" not in path or path.startswith("file:"):
        local = path[5:] if path.startswith("file:") else path
        while local.startswith("//"):
            local = local[1:]
        with open(local, "rb") as f:
            return f.read()
    from pyarrow import fs as pafs
    f, p = pafs.FileSystem.from_uri(path)
    with f.open_input_stream(p) as stream:
        return stream.read()


def _write_file_bytes(path: str, data: bytes) -> None:
    """Executor-safe byte write, mirroring ``_read_file_bytes``:
    local paths via open(); other schemes via pyarrow's filesystem
    layer.  Without this, a DV written inside an executor on a
    multi-node cluster would land on that executor's local disk while
    the committed descriptor points at the table root."""
    if "://" not in path or path.startswith("file:"):
        local = path[5:] if path.startswith("file:") else path
        while local.startswith("//"):
            local = local[1:]
        with open(local, "wb") as f:
            f.write(data)
        return
    from pyarrow import fs as pafs
    f, p = pafs.FileSystem.from_uri(path)
    with f.open_output_stream(p) as stream:
        stream.write(data)


def decode_descriptor(desc: dict, table: str,
                      _cache: dict | None = None) -> np.ndarray:
    """Positions deleted by one descriptor dict ({storageType,
    pathOrInlineDv, offset, sizeInBytes, cardinality}).  ``_cache``
    (path -> bytes) lets callers amortize reads when many descriptors
    share one .bin file."""
    st = desc["storageType"]
    if st == "i":
        bitmap = inline_decode(desc["pathOrInlineDv"],
                               int(desc["sizeInBytes"]))
    elif st in ("u", "p"):
        path = resolve_dv_path(table, st, desc["pathOrInlineDv"])
        if _cache is not None and path in _cache:
            data = _cache[path]
        else:
            data = _read_file_bytes(path)
            if _cache is not None:
                _cache[path] = data
        bitmap = unpack_dv_at(data, int(desc.get("offset") or 1),
                              int(desc["sizeInBytes"]))
    else:
        raise DeletionVectorError(f"unknown DV storageType {st!r}")
    positions = rba_deserialize(bitmap)
    card = desc.get("cardinality")
    if card is not None and int(card) != len(positions):
        raise DeletionVectorError(
            f"DV cardinality {card} != decoded {len(positions)}")
    return positions
