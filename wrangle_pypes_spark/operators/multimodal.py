"""Multimodal column conventions + processing plumbing.

Convention: a modality column is an opaque ``binary`` payload plus a
typed metadata struct (Dremel-style nested columnar — the payload stays
a single column so Parquet stores it contiguously and column pruning
skips it unless selected):

    image  binary,
    image_meta struct<format: string, width: int, height: int>

The decode/feature steps run as Arrow-batched ``mapInPandas`` — the
image/audio libraries are NOT in this container, so the actual decode
is stubbed (deterministic fake features clearly marked below); the
Spark-side plumbing (schemas, batch iteration, partition sizing) is
real and tested.

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


def extract_features(df: DataFrame, *, batch_limit: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    STUB: real decode (PIL/ffmpeg/torchvision) is unavailable in this
    container.  The stub derives a deterministic 8-dim feature from the
    payload bytes so the full pipeline (schema, batching, hashing,
    downstream joins) is exercised end-to-end.  Swap ``_fake_feature``
    for the real decoder in production — the Spark plumbing is final.
    """

    def _fake_feature(payload: bytes) -> list[float]:
        # Deterministic stand-in for an image embedding: byte histogram
        # folded to 8 buckets, L1-normalized.
        if payload is None:
            return [0.0] * 8
        buckets = [0] * 8
        for by in payload:
            buckets[by % 8] += 1
        total = sum(buckets) or 1
        return [b / total for b in buckets]

    import hashlib

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
                    "feature": payloads.map(_fake_feature),
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
