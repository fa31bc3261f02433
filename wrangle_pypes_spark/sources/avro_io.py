"""Minimal pure-Python Avro object-container codec.

Exists for ONE consumer: the Iceberg read seam (sources/iceberg.py).
Iceberg's table metadata is JSON, but its manifest lists and manifests
are Avro container files, and this environment has neither spark-avro
jars nor any Python avro package — so the interop seam carries its own
decoder for the subset the Avro 1.11 spec defines for container files:

- container framing: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema`` / ``avro.codec``), 16-byte sync marker, blocks of
  ``(count, byte-size, payload, sync)``;
- codecs ``null`` and ``deflate`` (raw zlib, the spec's wbits=-15),
  plus ``snappy`` when pyarrow carries the codec (raw-snappy block +
  CRC32 suffix per spec) — anything else is a loud gate;
- the full binary encoding driven by the WRITER schema embedded in the
  header (Avro files are self-describing, so no schema-resolution
  pass is needed to read foreign files): zigzag varint int/long,
  little-endian float/double, length-prefixed bytes/string, records,
  enums, fixed, arrays and maps (including negative-count blocks with
  a byte size to skip), unions, and named-type references.

An encoder for the same subset exists so tests can build spec-shaped
fixtures and the Iceberg tests can round-trip — but reader correctness
is NOT argued from round-trips alone: tests/test_avro_io.py pins
byte-level vectors straight from the spec (zigzag cases, a container
file assembled by hand from raw bytes).

Scale note: manifests are control-plane metadata (KBs–MBs, thousands
of entries), decoded on the driver exactly like the JSON logs of the
native stores; data files are read by the JVM parquet scan.  This
decoder is never on a data path.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"
_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


class AvroError(ValueError):
    pass


# ---------------------------------------------------------------------------
# schema registry (named-type references)
# ---------------------------------------------------------------------------

def _full_name(schema: dict, enclosing_ns: str | None) -> str:
    name = schema["name"]
    if "." in name:
        return name
    ns = schema.get("namespace", enclosing_ns)
    return f"{ns}.{name}" if ns else name


def _register_named(schema, names: dict, enclosing_ns=None) -> None:
    """Walk a schema collecting record/enum/fixed definitions so later
    string references resolve (spec: 'A name must be defined before it
    is used')."""
    if isinstance(schema, list):
        for s in schema:
            _register_named(s, names, enclosing_ns)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "enum", "fixed", "error"):
        fn = _full_name(schema, enclosing_ns)
        names[fn] = schema
        names.setdefault(schema["name"], schema)
        ns = fn.rsplit(".", 1)[0] if "." in fn else enclosing_ns
        if t in ("record", "error"):
            for f in schema.get("fields", []):
                _register_named(f.get("type"), names, ns)
    elif t == "array":
        _register_named(schema.get("items"), names, enclosing_ns)
    elif t == "map":
        _register_named(schema.get("values"), names, enclosing_ns)
    elif isinstance(t, (dict, list)):
        _register_named(t, names, enclosing_ns)


def _resolve(schema, names: dict):
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return schema
        if schema in names:
            return names[schema]
        raise AvroError(f"unresolved named type {schema!r}")
    if isinstance(schema, dict) and isinstance(schema.get("type"), str) \
            and schema["type"] in _PRIMITIVES \
            and "name" not in schema and "items" not in schema \
            and "values" not in schema:
        return schema["type"]  # {"type": "long", ...annotations}
    return schema


# ---------------------------------------------------------------------------
# binary decoder
# ---------------------------------------------------------------------------

class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise AvroError("truncated Avro data")
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
            if shift > 70:
                raise AvroError("varint too long")
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_bytes(self) -> bytes:
        n = self.read_long()
        if n < 0:
            raise AvroError("negative byte length")
        return self.read(n)


def _decode(r: _Reader, schema, names: dict):
    schema = _resolve(schema, names)
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return r.read(1) != b"\x00"
        if schema in ("int", "long"):
            return r.read_long()
        if schema == "float":
            return struct.unpack("<f", r.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", r.read(8))[0]
        if schema == "bytes":
            return r.read_bytes()
        if schema == "string":
            return r.read_bytes().decode("utf-8")
        raise AvroError(f"unknown type {schema!r}")
    if isinstance(schema, list):  # union: index then value
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise AvroError(f"union index {idx} out of range")
        return _decode(r, schema[idx], names)
    t = schema["type"]
    if t in ("record", "error"):
        return {f["name"]: _decode(r, f["type"], names)
                for f in schema["fields"]}
    if t == "enum":
        syms = schema["symbols"]
        idx = r.read_long()
        if not 0 <= idx < len(syms):
            raise AvroError(f"enum index {idx} out of range")
        return syms[idx]
    if t == "fixed":
        return r.read(int(schema["size"]))
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:  # negative count: byte size follows (skippable)
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(_decode(r, schema["items"], names))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode(r, schema["values"], names)
        return out
    return _decode(r, t, names)  # {"type": <nested schema>}


def _decompress(block: bytes, codec: str) -> bytes:
    if codec in ("null", ""):
        return block
    if codec == "deflate":
        return zlib.decompress(block, -15)
    if codec == "snappy":
        try:
            import pyarrow as pa
            # raw snappy leads with the uncompressed length as a
            # base-128 varint; pyarrow wants it passed explicitly
            size, shift = 0, 0
            for i, b in enumerate(block):
                size |= (b & 0x7F) << shift
                if not (b & 0x80):
                    break
                shift += 7
            out = pa.Codec("snappy").decompress(
                block[:-4], decompressed_size=size)
            out = out.to_pybytes() if hasattr(out, "to_pybytes") \
                else bytes(out)
        except Exception as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                f"avro snappy codec unavailable: {e}") from e
        if zlib.crc32(out) & 0xFFFFFFFF != struct.unpack(
                ">I", block[-4:])[0]:
            raise AvroError("avro snappy block CRC mismatch")
        return out
    raise NotImplementedError(f"avro codec {codec!r} not implemented")


def read_container(data: bytes) -> tuple[dict | str | list, list]:
    """Decode a full Avro object-container file -> (writer schema,
    records).  Self-describing: the embedded writer schema drives the
    decode, so foreign files need no schema input."""
    r = _Reader(data)
    if r.read(4) != _MAGIC:
        raise AvroError("not an Avro container (bad magic)")
    meta = _decode(r, {"type": "map", "values": "bytes"}, {})
    if "avro.schema" not in meta:
        raise AvroError("container missing avro.schema")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = r.read(16)
    names: dict = {}
    _register_named(schema, names)
    records = []
    while r.pos < len(r.data):
        count = r.read_long()
        size = r.read_long()
        payload = _decompress(r.read(size), codec)
        br = _Reader(payload)
        for _ in range(count):
            records.append(_decode(br, schema, names))
        if br.pos != len(payload):
            raise AvroError("trailing bytes in Avro block")
        if r.read(16) != sync:
            raise AvroError("Avro sync marker mismatch")
    return schema, records


def read_container_file(path: str, spark=None) -> tuple[object, list]:
    from .. import fsutil
    if fsutil.is_local(path):
        with open(fsutil._strip_file_scheme(path), "rb") as f:
            return read_container(f.read())
    fs, jpath, jvm = fsutil._hadoop(
        fsutil._require_spark(spark, path), path)
    stream = fs.open(jpath)
    try:
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(
            stream))
    finally:
        stream.close()
    return read_container(data)


# ---------------------------------------------------------------------------
# binary encoder (fixtures + round-trip tests; same subset)
# ---------------------------------------------------------------------------

def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(buf: io.BytesIO, schema, names: dict, value) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, str):
        if schema == "null":
            return
        if schema == "boolean":
            buf.write(b"\x01" if value else b"\x00")
        elif schema in ("int", "long"):
            buf.write(_zigzag(int(value)))
        elif schema == "float":
            buf.write(struct.pack("<f", value))
        elif schema == "double":
            buf.write(struct.pack("<d", value))
        elif schema == "bytes":
            buf.write(_zigzag(len(value)))
            buf.write(bytes(value))
        elif schema == "string":
            raw = value.encode("utf-8")
            buf.write(_zigzag(len(raw)))
            buf.write(raw)
        else:
            raise AvroError(f"unknown type {schema!r}")
        return
    if isinstance(schema, list):  # union: first branch matching
        for i, branch in enumerate(schema):
            b = _resolve(branch, names)
            bt = b if isinstance(b, str) else b.get("type")
            if value is None and bt == "null":
                buf.write(_zigzag(i))
                return
            if value is not None and bt != "null":
                buf.write(_zigzag(i))
                _encode(buf, branch, names, value)
                return
        raise AvroError(f"no union branch for {value!r}")
    t = schema["type"]
    if t in ("record", "error"):
        for f in schema["fields"]:
            if f["name"] in value:
                _encode(buf, f["type"], names, value[f["name"]])
                continue
            # a missing key encodes as null when the field is a
            # null-union (optional per the schema); required fields
            # stay loud
            ft = f["type"]
            branches = (ft if isinstance(ft, list) else [ft])
            if any((b if isinstance(b, str) else b.get("type"))
                   == "null" for b in branches):
                _encode(buf, ft, names, None)
            else:
                raise AvroError(
                    f"missing required record field {f['name']!r}")
    elif t == "enum":
        buf.write(_zigzag(schema["symbols"].index(value)))
    elif t == "fixed":
        if len(value) != int(schema["size"]):
            raise AvroError("fixed size mismatch")
        buf.write(bytes(value))
    elif t == "array":
        if value:
            buf.write(_zigzag(len(value)))
            for v in value:
                _encode(buf, schema["items"], names, v)
        buf.write(_zigzag(0))
    elif t == "map":
        if value:
            buf.write(_zigzag(len(value)))
            for k, v in value.items():
                raw = k.encode("utf-8")
                buf.write(_zigzag(len(raw)))
                buf.write(raw)
                _encode(buf, schema["values"], names, v)
        buf.write(_zigzag(0))
    else:
        _encode(buf, t, names, value)


def write_container(schema, records: list, *,
                    codec: str = "deflate") -> bytes:
    """Encode records as one Avro container file (single block)."""
    names: dict = {}
    _register_named(schema, names)
    body = io.BytesIO()
    for rec in records:
        _encode(body, schema, names, rec)
    payload = body.getvalue()
    if codec == "deflate":
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        payload = c.compress(payload) + c.flush()
    elif codec != "null":
        raise NotImplementedError(f"write codec {codec!r}")
    # deterministic sync marker derived from content (no RNG needed)
    import hashlib
    sync = hashlib.md5(payload + str(len(records)).encode()).digest()
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    out.write(_zigzag(len(meta)))
    for k, v in meta.items():
        raw = k.encode()
        out.write(_zigzag(len(raw)))
        out.write(raw)
        out.write(_zigzag(len(v)))
        out.write(v)
    out.write(_zigzag(0))
    out.write(sync)
    out.write(_zigzag(len(records)))
    out.write(_zigzag(len(payload)))
    out.write(payload)
    out.write(sync)
    return out.getvalue()


def write_container_file(path: str, schema, records: list, *,
                         codec: str = "deflate") -> None:
    data = write_container(schema, records, codec=codec)
    from .. import fsutil
    if fsutil.is_local(path):
        p = fsutil._strip_file_scheme(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)
        return
    raise NotImplementedError("remote avro fixture writes unsupported")
