"""Multimodal column plumbing: opaque `binary` payloads + typed metadata.

Image/audio/video payloads are carried as BinaryType columns with a metadata
struct alongside (format, width/height or sample-rate, byte length). The
Spark-side plumbing — schema, partitioning, Arrow batch shape through
`mapInPandas` — is real and tested; the actual codec step is STUBBED (the
container ships no image/audio libraries): `decode_image_batch` raises
NotImplementedError unless `fake=True`, where a deterministic fake decoder
(dimensions derived from the payload hash) stands in so the distributed
plumbing can be exercised end-to-end.

Scale notes: binary payloads ride the normal columnar path (parquet binary +
Arrow); mapInPandas streams record batches so a 100 MB image never needs a
row-at-a-time Python hop; `spark.sql.execution.arrow.maxRecordsPerBatch`
bounds batch memory. Feature extraction keyed per doc stays embarrassingly
parallel — no shuffle at all until a later aggregation.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Magic prefixes for cheap JVM-side format sniffing (real formats).
_MAGIC = {
    "png": b"\x89PNG",
    "jpeg": b"\xff\xd8\xff",
    "gif": b"GIF8",
    "riff": b"RIFF",  # wav/avi containers
}

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_format", StringType()),
        StructField("payload_len", LongType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_format", StringType()),
        StructField("payload_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a deterministic binary payload column from text (test stand-in
    for reading real media bytes): payload = UTF-8 bytes, format sniffed from
    magic bytes (falls back to 'bin'). All JVM-side."""
    payload = F.encode(F.col(text_col), "UTF-8")
    fmt = F.lit("bin")
    for name, magic in _MAGIC.items():
        fmt = F.when(
            F.startswith(F.col("payload"), F.lit(magic)), F.lit(name)
        ).otherwise(fmt)
    return (
        df.withColumn("payload", payload)
        .withColumn("media_format", fmt)
        .withColumn("payload_len", F.octet_length(F.col("payload")))
    )


def decode_image_batch(pdf: pd.DataFrame, fake: bool) -> pd.DataFrame:
    """Decode one Arrow batch of payloads → dimensions.

    REAL path: would call PIL/ffmpeg here — not available in this container.
    """
    if not fake:
        raise NotImplementedError(
            "image/audio codecs not available in this environment; "
            "run with fake=True for the deterministic stand-in decoder"
        )
    # Deterministic fake: dimensions derived from payload length/bytes.
    lens = pdf["payload"].map(len)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "media_format": pdf["media_format"],
            "payload_len": lens,
            "width": (lens % 640 + 1).astype("int32"),
            "height": (lens % 480 + 1).astype("int32"),
            "n_frames": pdf["payload"].map(lambda b: (b[0] if len(b) else 0) % 16 + 1).astype(
                "int32"
            ),
        }
    )


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Distributed decode via mapInPandas (Arrow-batched)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_image_batch(pdf, fake=fake)

    cols = ["doc_id", "payload", "media_format"]
    return df.select(*cols).mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_payload", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame, target_w: int = 224, target_h: int = 224, fake: bool = True
) -> DataFrame:
    """Resize stage (Arrow-batched mapInPandas). REAL path would call
    PIL.Image.resize — stubbed; the fake produces a deterministic payload of
    exactly target_w*target_h bytes tiled from the source bytes, so byte
    lengths, schema, and batch shape are all real and testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = target_w * target_h
        for pdf in batches:
            if not fake:
                raise NotImplementedError("image codecs unavailable; use fake=True")
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "resized_payload": pdf["payload"].map(
                        lambda b: (b * (n // max(len(b), 1) + 1))[:n] if len(b) else b"\x00" * n
                    ),
                }
            )
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            yield out

    return df.select("doc_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_sec", StringType()),  # fixed 3dp string: cross-engine stable
        StructField("rms", StringType()),
        StructField("zero_crossings", LongType()),
    ]
)


def extract_audio_features(
    df: DataFrame, sample_rate: int = 16_000, fake: bool = True
) -> DataFrame:
    """Audio feature extraction (Arrow-batched mapInPandas).

    REAL path would decode with soundfile/librosa — stubbed (no audio libs
    in this container). The fake treats the payload bytes as signed 8-bit
    PCM and computes REAL signal math over them (duration at the nominal
    sample rate, RMS energy, zero-crossing count), so the UDF signature,
    batch shape, and numeric plumbing are exercised honestly; only the
    codec is fake. Deterministic: pure function of the payload bytes.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("audio codecs unavailable; use fake=True")
            durs, rmss, zcs = [], [], []
            for payload in pdf["payload"]:
                samples = np.frombuffer(payload, dtype=np.int8).astype(np.float64)
                n = len(samples)
                durs.append(f"{n / sample_rate:.3f}")
                rmss.append(f"{float(np.sqrt(np.mean(samples**2))) if n else 0.0:.3f}")
                zcs.append(int(np.sum(np.signbit(samples[:-1]) != np.signbit(samples[1:]))) if n > 1 else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.Series([sample_rate] * len(pdf), dtype="int32"),
                    "duration_sec": durs,
                    "rms": rmss,
                    "zero_crossings": pd.Series(zcs, dtype="int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 4, max_frames: int = 8,
                  fake: bool = True) -> DataFrame:
    """Video frame sampling (1→N rows per input — the exploding mapInPandas
    shape). REAL path would demux with ffmpeg — stubbed; the fake splits the
    payload into fixed 64-byte 'frames' and keeps every ``every_n``-th."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_payload": []}
        for pdf in batches:
            if not fake:
                raise NotImplementedError("video codecs unavailable; use fake=True")
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                chunks = [payload[i : i + 64] for i in range(0, len(payload), 64)]
                for k, idx in enumerate(range(0, len(chunks), every_n)):
                    if k >= max_frames:
                        break
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_payload"].append(chunks[idx])
        out = pd.DataFrame(rows)
        if len(out):
            out["frame_idx"] = out["frame_idx"].astype("int32")
        yield out

    return df.select("doc_id", "payload").mapInPandas(run, schema=FRAMES_SCHEMA)
