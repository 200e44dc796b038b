"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container ships no image/audio codecs, so the *decode* kernels are
deterministic stubs (clearly marked); everything Spark-side — schemas,
binary columns, Arrow batch shapes, partitioning, the mapInPandas
signatures — is real and tested. Swapping a stub for PIL/librosa later
changes only the body of one pandas function.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, modality string, byte_len long, feat array<float>"
)


def media_from_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from the documents fixture: payload
    = utf-8 bytes of the text (stands in for encoded image/audio)."""
    mod = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        mod.alias("modality"),
        F.concat(F.lit("application/x-fake-"), mod).alias("mime"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _decode_stub(payload: bytes, modality: str, dim: int = 8) -> np.ndarray:
    """STUB decode/feature-extract: a real implementation would decode the
    image/audio and run a feature extractor. Here: deterministic byte
    histogram, normalized — keeps the Arrow plumbing and batch shapes
    honest without codecs. Raises on unknown modality like a real decoder
    would on a corrupt payload."""
    if modality not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for modality {modality!r}")
    if payload is None:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
    total = hist.sum() or 1
    return (hist / total).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Decode + feature-extract via mapInPandas: Arrow batches of binary
    payloads in, fixed-dim float vectors out. This is the exact operator
    shape a real image/audio featurizer plugs into (batch-parallel,
    no shuffle, column-pruned to the payload)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(p, m, dim).tolist()
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "byte_len": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "feat": feats,
                }
            )

    return media.select("media_id", "modality", "payload").mapInPandas(
        _batches, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame timestamp (the
    decode itself is the stub above). Demonstrates the explode-based 1→N
    expansion that keeps frame extraction distributed."""
    n = F.greatest((F.coalesce(F.col("duration_ms"), F.octet_length("payload")) / every_ms).cast("int"), F.lit(1))
    return (
        media.where(F.col("modality") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n - 1)))
        .select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("frame_ts_ms"))
    )
