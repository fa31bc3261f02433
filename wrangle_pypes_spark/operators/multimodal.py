"""Multimodal column conventions + processing plumbing.

Convention: a modality column is an opaque ``binary`` payload plus a
typed metadata struct (Dremel-style nested columnar — the payload stays
a single column so Parquet stores it contiguously and column pruning
skips it unless selected):

    image  binary,
    image_meta struct<format: string, width: int, height: int>

The decode/feature steps run as Arrow-batched ``mapInPandas``.  Decode
is REAL for every container-native format — PNG / BMP / PPM / PGM /
WAV via ``operators/codecs.py`` (zlib/struct/wave + numpy, no external
libraries) — covering decode, pixel stats, nearest-neighbor resize
with re-encode, and PCM audio features, each with a full DuckDB value
oracle (the oracled corpora synthesize pixels from a SQL-expressible
formula, so the oracle computes ground truth without touching the
container format at all; any encoder/filter/decoder bug breaks the
value hash).  Only formats needing external codec libraries
(JPEG/WebP/video) stay stubbed/gated, loudly marked below.

Scale notes: payload rows are large → cap ``spark.sql.files.
maxPartitionBytes`` so a partition of binaries fits executor memory;
feature extraction parallelism == partition count, no shuffle at all
(map-only); write features to a separate table keyed by content hash so
re-extraction is incremental.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("format", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("content_id", T.LongType(), True),
    T.StructField("content_hash", T.StringType(), True),
    T.StructField("byte_len", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
])


def attach_binary_payload(df: DataFrame, src_col: str, *,
                          id_col: str) -> DataFrame:
    """Build a multimodal-shaped frame from any source column (used by
    tests to synthesize payloads: text bytes stand in for image bytes)."""
    return df.select(
        F.col(id_col).alias("content_id"),
        F.encode(F.col(src_col).cast("string"), "utf-8").alias("payload"),
        F.struct(F.lit("fake").alias("format"),
                 F.lit(None).cast("int").alias("width"),
                 F.lit(None).cast("int").alias("height")).alias("image_meta"),
    )


def _byte_histogram_feature(payload: bytes) -> list:
    """Legacy fallback feature for UNRECOGNIZED payloads: byte
    histogram folded to 8 buckets, L1-normalized.  Pinned — the
    ``multimodal_features`` driver query hashes it."""
    if payload is None:
        return [0.0] * 8
    buckets = [0] * 8
    for by in payload:
        buckets[by % 8] += 1
    total = sum(buckets) or 1
    return [b / total for b in buckets]


def image_feature(arr) -> list:
    """REAL 16-dim image descriptor from decoded pixels (the pre-
    embedding signal dedup/ANN stages consume): per-channel mean and
    std scaled to [0,1] (gray replicated), an 8-bucket luminance
    histogram (L1-normalized), aspect w/(w+h), and channels/4."""
    import numpy as np
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    px = arr.reshape(-1, ch).astype(np.float64)
    means = px.mean(axis=0) / 255.0
    stds = px.std(axis=0) / 255.0
    if ch == 1:
        means = np.repeat(means, 3)
        stds = np.repeat(stds, 3)
    lum = px.mean(axis=1)
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 256.0))
    hist = hist / max(int(hist.sum()), 1)
    return ([float(v) for v in means[:3]] + [float(v) for v in stds[:3]]
            + [float(v) for v in hist]
            + [w / (w + h), ch / 4.0])


def audio_feature(samples, rate: int) -> list:
    """REAL 8-dim PCM descriptor: rms/peak/mean scaled by 2^15,
    zero-crossing rate, and 4 L1-normalized rfft band energies."""
    import numpy as np
    mono = samples if samples.ndim == 1 else samples[:, 0]
    s = mono.astype(np.float64)
    n = max(len(s), 1)
    nn = s >= 0
    zcr = float((nn[1:] != nn[:-1]).sum()) / max(n - 1, 1)
    spec = np.abs(np.fft.rfft(s))
    bands = np.array_split(spec, 4)
    energy = np.array([float(b.sum()) for b in bands])
    energy = energy / max(float(energy.sum()), 1e-12)
    return [float(np.sqrt((s * s).mean()) / 32768.0),
            float(np.abs(s).max(initial=0.0) / 32768.0),
            float(s.mean() / 32768.0), zcr] + [float(v) for v in energy]


def extract_features(df: DataFrame, *, batch_limit: int = 1024,
                     decode: str = "auto") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decode='auto'`` (default): payloads that sniff as a
    container-native format get REAL features — PNG/BMP/PNM decode to
    pixels -> :func:`image_feature` (16-dim), WAV decodes to samples ->
    :func:`audio_feature` (8-dim) — via operators/codecs.py; anything
    unrecognized falls back to the pinned legacy byte-histogram (8-dim),
    which keeps the existing driver oracle byte-stable for non-media
    payloads.  ``decode='off'`` forces the legacy path everywhere.
    Formats needing external codec libraries (jpeg/webp) raise loudly
    per codecs.py rather than silently degrading to the fallback.
    """
    if decode not in ("auto", "off"):
        raise ValueError(f"decode must be auto|off, got {decode!r}")

    import hashlib

    from . import codecs

    def _feature(payload):
        if payload is None or decode == "off":
            return _byte_histogram_feature(payload)
        fmt = codecs.sniff_format(payload)
        if fmt in ("png", "bmp", "ppm", "pgm"):
            return image_feature(codecs.image_decode(bytes(payload)))
        if fmt == "wav":
            samples, rate = codecs.wav_decode(bytes(payload))
            return audio_feature(samples, rate)
        if fmt == "gif":
            return image_feature(codecs.gif_decode(bytes(payload))[0])
        if fmt in ("jpeg", "webp"):
            codecs.image_decode(bytes(payload))  # raises the loud gate
        return _byte_histogram_feature(payload)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # bound per-batch memory for large payloads
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start:start + batch_limit]
                payloads = chunk["payload"]
                yield pd.DataFrame({
                    "content_id": chunk["content_id"],
                    "content_hash": payloads.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()),
                    "byte_len": payloads.map(lambda b: len(b or b"")),
                    "feature": payloads.map(_feature),
                })

    return df.mapInPandas(_batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("content_id", T.LongType(), True),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("image_meta", IMAGE_META_SCHEMA, True),
])


def resize_images(df: DataFrame, *, width: int, height: int) -> DataFrame:
    """Resize the image payload column (map-only, no shuffle).

    STUB decode: no codecs in this container (PIL/opencv) — the stand-in
    deterministically truncates/pads payload bytes to width*height and
    rewrites the metadata struct, so schema flow, Arrow batching, and
    metadata propagation are real.  Swap ``_fake_resize`` for
    ``PIL.Image.resize`` in production.
    """

    def _fake_resize(payload: bytes) -> bytes:
        if payload is None:
            return None
        n = width * height
        return (payload * (n // max(len(payload), 1) + 1))[:n]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "content_id": pdf["content_id"],
                "payload": pdf["payload"].map(_fake_resize),
                "image_meta": [
                    {"format": "fake", "width": width, "height": height}
                    for _ in range(len(pdf))],
            })

    return df.mapInPandas(_batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("content_id", T.LongType(), True),
    T.StructField("frame_idx", T.IntegerType(), True),
    T.StructField("frame", T.BinaryType(), True),
])


def sample_frames(df: DataFrame, *, every_n: int = 10,
                  max_frames: int = 8) -> DataFrame:
    """Sample frames from a video payload: ONE input row fans out to
    ``<= max_frames`` frame rows (a mapInPandas generator — the UDTF
    shape; output cardinality differs from input, no shuffle).

    STUB decode: without ffmpeg the stand-in treats each ``every_n``-th
    64-byte slice of the payload as a "frame".  The fan-out plumbing,
    schema, and batch iteration are the real thing.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"content_id": [], "frame_idx": [], "frame": []}
            for cid, payload in zip(pdf["content_id"], pdf["payload"]):
                if payload is None:
                    continue
                for k in range(max_frames):
                    start = k * every_n * 64
                    if start >= len(payload):
                        break
                    out["content_id"].append(cid)
                    out["frame_idx"].append(k)
                    out["frame"].append(bytes(payload[start:start + 64]))
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# REAL decode path (PNG/BMP/PNM/WAV via operators/codecs.py — no stubs)
# ---------------------------------------------------------------------------

# Pixel contracts for the oracled synthetic corpora.  These formulas are
# the *interface* between the Spark side (renders + encodes + decodes
# real container bytes) and the DuckDB oracle (recomputes the same
# values from `range()` cross-joins, never touching the container
# format).  Change one side and the driver's value hash breaks.
#
#   gray:  v(y, x, id) = (x + 7*y + id) % 256
#   rgb:   r = (x + id) % 256
#          g = (y + 2*id) % 256
#          b = (x + y + 3*id) % 256
#   wav:   s(i, id) = ((i * ((id % 97) + 3) + id) % 65536) - 32768

def _spread(df: DataFrame) -> DataFrame:
    """Round-robin a metadata-thin id table across the session's
    default parallelism before a heavy Python codec stage: a
    single-file scan yields ONE input partition, which would serialize
    the whole synthesize/encode fan-out onto one core.  Only the id
    rows move (a few bytes each) — payloads are produced after the
    exchange, so this never shuffles heavy bytes (guide §8 shape).

    Unconditional: probing the incoming partition count via
    ``df.rdd.getNumPartitions()`` forces a full plan-to-RDD conversion
    per call (VERDICT r14 #9), which costs more than the round-robin
    exchange of a few thousand id rows ever could."""
    spark = df.sparkSession
    return df.repartition(spark.sparkContext.defaultParallelism)


def _render_gray(cid: int, width: int, height: int):
    import numpy as np
    x = np.arange(width, dtype=np.int64)[None, :]
    y = np.arange(height, dtype=np.int64)[:, None]
    return ((x + 7 * y + int(cid)) % 256).astype(np.uint8)


def _render_rgb(cid: int, width: int, height: int):
    import numpy as np
    x = np.arange(width, dtype=np.int64)[None, :]
    y = np.arange(height, dtype=np.int64)[:, None]
    i = int(cid)
    r = (x + i) % 256 + np.zeros_like(y)
    g = (y + 2 * i) % 256 + np.zeros_like(x)
    b = (x + y + 3 * i) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def synthesize_image_corpus(df: DataFrame, *, id_col: str,
                            width: int, height: int,
                            mode: str = "rgb", fmt: str = "png",
                            filter_mode="cycle") -> DataFrame:
    """Render one REAL image payload per input row from the pinned
    pixel contract above and encode it with the named container codec
    (map-only; the default ``filter_mode='cycle'`` varies the PNG
    filter per scanline so decoding exercises all five filter types).
    """
    from . import codecs

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col]
            payloads = []
            for cid in ids:
                arr = (_render_rgb if mode == "rgb" else _render_gray)(
                    cid, width, height)
                kw = {"filter_mode": filter_mode} if fmt == "png" else {}
                payloads.append(codecs.image_encode(arr, fmt, **kw))
            yield pd.DataFrame({
                "content_id": ids.astype("int64"),
                "payload": payloads,
                "image_meta": [
                    {"format": fmt, "width": width, "height": height}
                    for _ in range(len(pdf))],
            })

    return _spread(df).mapInPandas(_batches, schema=RESIZED_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType([
    T.StructField("content_id", T.LongType(), True),
    T.StructField("fmt", T.StringType(), True),
    T.StructField("width", T.LongType(), True),
    T.StructField("height", T.LongType(), True),
    T.StructField("channels", T.LongType(), True),
    T.StructField("sum_r", T.LongType(), True),
    T.StructField("sum_g", T.LongType(), True),
    T.StructField("sum_b", T.LongType(), True),
    T.StructField("pixel_min", T.LongType(), True),
    T.StructField("pixel_max", T.LongType(), True),
])


def decode_image_stats(df: DataFrame, *,
                       batch_limit: int = 256) -> DataFrame:
    """REAL image decode -> exact integer pixel statistics (map-only).

    Per payload: sniffed container format, dimensions, channel count,
    per-channel pixel sums (a 1-channel image reports its sum in all
    three columns — the BMP gray->RGB replication convention), and the
    min/max pixel value.  Integer outputs on purpose: the driver's
    value hash compares them exactly, so the full
    render->filter->deflate->decode chain is verified bit-for-bit
    against a DuckDB oracle that knows nothing about PNG/BMP.

    Decode failures raise loudly (corrupt payloads must not become
    silent nulls in a training pipeline).
    """
    import numpy as np

    from . import codecs

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start:start + batch_limit]
                out = {k.name: [] for k in IMAGE_STATS_SCHEMA}
                for cid, payload in zip(chunk["content_id"],
                                        chunk["payload"]):
                    fmt = codecs.sniff_format(payload)
                    arr = codecs.image_decode(bytes(payload))
                    if arr.ndim == 2:
                        arr = arr[:, :, None]
                    h, w, ch = arr.shape
                    sums = arr.reshape(-1, ch).sum(
                        axis=0, dtype=np.int64)
                    if ch == 1:
                        sr = sg = sb = int(sums[0])
                    else:
                        sr, sg, sb = (int(sums[0]), int(sums[1]),
                                      int(sums[2]))
                    out["content_id"].append(int(cid))
                    out["fmt"].append(fmt)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(ch)
                    out["sum_r"].append(sr)
                    out["sum_g"].append(sg)
                    out["sum_b"].append(sb)
                    out["pixel_min"].append(int(arr.min()))
                    out["pixel_max"].append(int(arr.max()))
                yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=IMAGE_STATS_SCHEMA)


def resize_images_real(df: DataFrame, *, width: int, height: int,
                       out_format: str = "bmp",
                       batch_limit: int = 256) -> DataFrame:
    """REAL resize: decode -> nearest-neighbor resample -> re-encode.

    Nearest-neighbor index map is ``src = (dst * src_dim) // dst_dim``
    (floor), which is SQL-expressible — the oracled query verifies the
    decode->resize->encode->decode chain end-to-end.  Map-only, no
    shuffle; output payloads carry refreshed metadata.
    """
    import numpy as np

    from . import codecs

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start:start + batch_limit]
                payloads = []
                for payload in chunk["payload"]:
                    arr = codecs.image_decode(bytes(payload))
                    sh, sw = arr.shape[0], arr.shape[1]
                    ys = (np.arange(height, dtype=np.int64) * sh) // height
                    xs = (np.arange(width, dtype=np.int64) * sw) // width
                    resized = arr[ys][:, xs]
                    payloads.append(codecs.image_encode(
                        resized, out_format))
                yield pd.DataFrame({
                    "content_id": chunk["content_id"].astype("int64"),
                    "payload": payloads,
                    "image_meta": [
                        {"format": out_format, "width": width,
                         "height": height} for _ in range(len(chunk))],
                })

    return df.mapInPandas(_batches, schema=RESIZED_SCHEMA)


def synthesize_wav_corpus(df: DataFrame, *, id_col: str,
                          n_samples: int, rate: int = 8000) -> DataFrame:
    """Render one REAL PCM16 WAV payload per input row from the pinned
    sample contract (see module constants above).  Map-only."""
    import numpy as np

    from . import codecs

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col]
            payloads = []
            for cid in ids:
                i = np.arange(n_samples, dtype=np.int64)
                k = (int(cid) % 97) + 3
                s = ((i * k + int(cid)) % 65536 - 32768).astype(np.int16)
                payloads.append(codecs.wav_encode(s, rate=rate))
            yield pd.DataFrame({
                "content_id": ids.astype("int64"),
                "payload": payloads,
                "image_meta": [
                    {"format": "wav", "width": None, "height": None}
                    for _ in range(len(pdf))],
            })

    return _spread(df).mapInPandas(_batches, schema=RESIZED_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType([
    T.StructField("content_id", T.LongType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("sample_rate", T.LongType(), True),
    T.StructField("channels", T.LongType(), True),
    T.StructField("sum_abs", T.LongType(), True),
    T.StructField("peak", T.LongType(), True),
    T.StructField("zero_crossings", T.LongType(), True),
])


def audio_stats(df: DataFrame, *, batch_limit: int = 256) -> DataFrame:
    """REAL WAV decode -> exact integer signal statistics (map-only).

    ``zero_crossings`` counts sign-boundary flips with the pinned
    convention ``sign(s) := s >= 0`` (channel 0 for multi-channel), so
    the DuckDB oracle reproduces it with a LAG window over the sample
    contract.  All-integer outputs hash exactly.
    """
    import numpy as np

    from . import codecs

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start:start + batch_limit]
                out = {k.name: [] for k in AUDIO_STATS_SCHEMA}
                for cid, payload in zip(chunk["content_id"],
                                        chunk["payload"]):
                    samples, rate = codecs.wav_decode(bytes(payload))
                    ch = 1 if samples.ndim == 1 else samples.shape[1]
                    mono = samples if samples.ndim == 1 else samples[:, 0]
                    s64 = mono.astype(np.int64)
                    nn = (mono >= 0)
                    out["content_id"].append(int(cid))
                    out["n_samples"].append(len(mono))
                    out["sample_rate"].append(int(rate))
                    out["channels"].append(ch)
                    out["sum_abs"].append(int(np.abs(s64).sum()))
                    out["peak"].append(int(np.abs(s64).max(initial=0)))
                    out["zero_crossings"].append(
                        int((nn[1:] != nn[:-1]).sum()))
                yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=AUDIO_STATS_SCHEMA)


# Contract for the oracled GIF corpus (SQL-expressible, like the
# image/wav contracts above):
#   frame f, gray palette index: v(y, x, f, id) = (x + 7*y + 11*f + id) % 256

def synthesize_gif_corpus(df: DataFrame, *, id_col: str, width: int,
                          height: int, n_frames: int) -> DataFrame:
    """Render one REAL animated GIF per input row from the pinned
    frame contract (grayscale 256-entry palette, real LZW encode with
    dictionary growth).  Map-only."""
    import numpy as np

    from . import codecs

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col]
            payloads = []
            x = np.arange(width, dtype=np.int64)[None, :]
            y = np.arange(height, dtype=np.int64)[:, None]
            for cid in ids:
                frames = [
                    ((x + 7 * y + 11 * f + int(cid)) % 256
                     ).astype(np.uint8)
                    for f in range(n_frames)]
                payloads.append(codecs.gif_encode(frames))
            yield pd.DataFrame({
                "content_id": ids.astype("int64"),
                "payload": payloads,
                "image_meta": [
                    {"format": "gif", "width": width, "height": height}
                    for _ in range(len(pdf))],
            })

    return _spread(df).mapInPandas(_batches, schema=RESIZED_SCHEMA)


FRAME_STATS_SCHEMA = T.StructType([
    T.StructField("content_id", T.LongType(), True),
    T.StructField("frame_idx", T.LongType(), True),
    T.StructField("width", T.LongType(), True),
    T.StructField("height", T.LongType(), True),
    T.StructField("sum_px", T.LongType(), True),
    T.StructField("pixel_min", T.LongType(), True),
    T.StructField("pixel_max", T.LongType(), True),
])


def sample_frames_real(df: DataFrame, *, every_n: int = 2,
                       max_frames: int = 4,
                       batch_limit: int = 128) -> DataFrame:
    """REAL video-frame sampling over animated GIF payloads: decode
    (LZW + palette + composition), take every ``every_n``-th frame up
    to ``max_frames``, and emit exact integer stats per sampled frame
    (channel 0 of the composed RGB canvas — the gray palette value).
    One input row fans out to <= max_frames rows (the UDTF shape);
    map-only, no shuffle.  Decode failures raise loudly."""
    import numpy as np

    from . import codecs

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start:start + batch_limit]
                out = {k.name: [] for k in FRAME_STATS_SCHEMA}
                for cid, payload in zip(chunk["content_id"],
                                        chunk["payload"]):
                    frames = codecs.gif_decode(bytes(payload))
                    for k in range(max_frames):
                        fi = k * every_n
                        if fi >= len(frames):
                            break
                        g = frames[fi][:, :, 0].astype(np.int64)
                        out["content_id"].append(int(cid))
                        out["frame_idx"].append(fi)
                        out["width"].append(g.shape[1])
                        out["height"].append(g.shape[0])
                        out["sum_px"].append(int(g.sum()))
                        out["pixel_min"].append(int(g.min()))
                        out["pixel_max"].append(int(g.max()))
                yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=FRAME_STATS_SCHEMA)
