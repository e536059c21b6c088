"""Multimodal binary-column plumbing (north star, BASELINE.json:6).

Images/audio/video are opaque ``binary`` columns + typed metadata structs.
The Spark-side machinery — schema, Arrow batching via mapInPandas,
partition sizing — is real and tested; the codec kernels are STUBBED
(``decode_stub``) because no image/audio library ships in this container.
Swapping ``decode_stub`` for a real decoder (PIL/torchaudio/ffmpeg) is a
one-function change: the batch shape and schema contract stay identical.

Scale notes: mapInPandas streams Arrow record batches, so peak memory is
one batch of payloads per core — size ``spark.sql.execution.arrow.
maxRecordsPerBatch`` so batch_bytes ≈ rows × payload fits the executor.
Payloads never pass through the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The asset table schema: opaque payload + typed metadata.
ASSET_SCHEMA = (
    "asset_id BIGINT, doc_id BIGINT, media_type STRING, payload BINARY, "
    "meta STRUCT<width: INT, height: INT, sample_rate: INT>"
)

FEATURE_SCHEMA = (
    "asset_id BIGINT, doc_id BIGINT, media_type STRING, n_bytes BIGINT, "
    "digest STRING, feat ARRAY<DOUBLE>"
)


def make_assets(documents: DataFrame) -> DataFrame:
    """Derive a deterministic fake asset table from ``documents``: the
    text bytes stand in for an encoded media payload."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """STUB for the codec kernel (no media libs in this container).

    Deterministic fake: 8 float features derived from the payload's
    sha256. A real implementation decodes pixels/samples here —
    signature and return contract are what downstream code relies on.
    """
    digest = hashlib.sha256(payload).digest()
    return np.frombuffer(digest[:8], dtype=np.uint8).astype(np.float64) / 255.0


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    "feat": payloads.combine(
                        pdf["media_type"],
                        lambda b, m: decode_stub(bytes(b), m).tolist(),
                    ),
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over the opaque payload: one row per sampled
    offset (the video-frame-extraction access pattern, minus the codec).
    Pure builtin expressions — the payload is sliced JVM-side."""
    n = F.length("payload")
    offsets = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(every_n_bytes))
    return assets.select(
        "asset_id",
        "media_type",
        F.posexplode(offsets).alias("frame_no", "offset"),
    ).withColumn("frame_no", F.col("frame_no").cast("long"))


def resize_features(features: DataFrame, out_dim: int = 4) -> DataFrame:
    """'Resize' stage: average-pool the feature vector to ``out_dim``
    (the image-resize access pattern over decoded data — with a real
    decoder this pools pixel blocks; the pooling arithmetic and Arrow
    batch flow are identical). Pure builtin expressions — stays JVM-side.
    """
    n = F.size("feat")
    block = (n / out_dim).cast("int")
    pooled = F.transform(
        F.sequence(F.lit(0), F.lit(out_dim - 1)),
        lambda i: F.aggregate(
            F.slice("feat", i * block + 1, block),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / block,
    )
    return features.select("asset_id", "media_type", pooled.alias("feat_small"))
