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


# ---------------------------------------------------------------------------
# REAL codec kernels for the two self-describing formats that need no
# external library: RIFF/WAVE PCM16 (audio) and BMP 24bpp (image), both
# pure struct + numpy. Video stays honestly stubbed (no container parser
# ships here); its decode_stub swap point is unchanged.
# ---------------------------------------------------------------------------

import struct


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono PCM16 WAV bytes from an int16 sample array (RIFF header)."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from mono PCM16 WAV bytes."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (fmt_size, audio_fmt, n_ch, rate) = struct.unpack("<IHHI", payload[16:28])
    if audio_fmt != 1 or n_ch != 1 or fmt_size != 16:
        raise ValueError("only mono PCM16 supported")
    data_size = struct.unpack("<I", payload[40:44])[0]
    samples = np.frombuffer(payload[44 : 44 + data_size], dtype="<i2")
    return rate, samples


def encode_bmp(pixels: np.ndarray) -> bytes:
    """24bpp bottom-up BMP bytes from an (H, W, 3) uint8 RGB array."""
    h, w, _ = pixels.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = b"".join(
        pixels[y, :, ::-1].astype(np.uint8).tobytes() + b"\x00" * pad
        for y in range(h - 1, -1, -1)  # BGR, bottom-up
    )
    hdr = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB array from 24bpp bottom-up BMP bytes."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack("<I", payload[10:14])[0]
    w, h, _planes, bpp = struct.unpack("<iiHH", payload[18:30])
    if bpp != 24 or h <= 0:
        raise ValueError("only 24bpp bottom-up BMP supported")
    row = w * 3
    pad = (4 - row % 4) % 4
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        start = off + y * (row + pad)
        out[h - 1 - y] = np.frombuffer(payload[start : start + row], dtype=np.uint8).reshape(
            w, 3
        )[:, ::-1]
    return out


def decode_real(payload: bytes, media_type: str) -> np.ndarray:
    """REAL decode for audio (WAV PCM16: duration/rms/peak/zero-crossing
    + 4 band-energy proxies) and image (BMP 24bpp: per-channel means,
    width, height, luma mean/std, aspect); video falls back to
    decode_stub. Same 8-float contract as decode_stub, so the Arrow
    batch flow, schema, and downstream pooling are untouched."""
    if media_type == "audio":
        rate, s = decode_wav(payload)
        x = s.astype(np.float64) / 32768.0
        n = max(len(x), 1)
        quarters = [x[i * n // 4 : (i + 1) * n // 4] for i in range(4)]
        return np.array(
            [
                n / rate,
                float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
                float(np.max(np.abs(x))) if len(x) else 0.0,
                float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
                if len(x) > 1
                else 0.0,
            ]
            + [float(np.sqrt(np.mean(q * q))) if len(q) else 0.0 for q in quarters]
        )
    if media_type == "image":
        px = decode_bmp(payload).astype(np.float64)
        h, w, _ = px.shape
        luma = px @ np.array([0.299, 0.587, 0.114])
        return np.array(
            [
                px[..., 0].mean() / 255.0,
                px[..., 1].mean() / 255.0,
                px[..., 2].mean() / 255.0,
                float(w),
                float(h),
                luma.mean() / 255.0,
                luma.std() / 255.0,
                w / h,
            ]
        )
    return decode_stub(payload, media_type)


def extract_features(assets: DataFrame, decoder=decode_stub) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decoder`` is the codec kernel: ``decode_stub`` (default — the
    metadata-only fake) or ``decode_real`` (WAV/BMP via pure numpy;
    video still stubbed). The batch flow is identical either way."""

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
                        lambda b, m: decoder(bytes(b), m).tolist(),
                    ),
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def make_media_assets(spark) -> DataFrame:
    """A small REAL media asset table: deterministic WAV tones and BMP
    gradients synthesized per asset id (pure numpy — no media libs), for
    exercising decode_real end to end through the Arrow batch path."""
    rows = []
    for i in range(12):
        if i % 2 == 0:
            t = np.arange(1600 + 160 * i)
            freq = 220.0 * (1 + i / 4)
            samples = (10000 * np.sin(2 * np.pi * freq * t / 16000)).astype(np.int16)
            payload, mtype = encode_wav(samples, 16000), "audio"
            meta = (0, 0, 16000)
        else:
            h, w = 8 + i, 12 + i
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack(
                [
                    (xx * 255 // max(w - 1, 1)),
                    (yy * 255 // max(h - 1, 1)),
                    np.full((h, w), i * 20),
                ],
                axis=-1,
            ).astype(np.uint8)
            payload, mtype = encode_bmp(px), "image"
            meta = (w, h, 0)
        rows.append((i, i, mtype, bytearray(payload), meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


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
