"""Multimodal binary-column plumbing (north star, BASELINE.json:6).

Images/audio/video are opaque ``binary`` columns + typed metadata structs.
The Spark-side machinery — schema, Arrow batching via mapInPandas,
partition sizing — is real and tested. Codec kernels come in two tiers:
``decode_stub`` (deterministic metadata-only fake, the default for the
fixture-driven oracle queries whose payloads are not real media) and
``decode_real`` — REAL pure-struct+numpy decoders for WAV PCM16, BMP
24bpp, and uncompressed-DIB AVI video, pytest-pinned end to end through
the Arrow path. Swapping in a compressed-codec library (PIL/ffmpeg) is a
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
# REAL codec kernels for three self-describing formats that need no
# external library, all pure struct + numpy: RIFF/WAVE PCM16 (audio),
# BMP 24bpp (image), and uncompressed-DIB AVI (video — raw 24bpp frames
# in a standard RIFF/AVI container with an idx1 index). Compressed
# codecs (JPEG/H.264/AAC) would still need a real media library; the
# decode_real swap point is where one plugs in.
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


def _riff_chunks(payload: bytes, start: int) -> Iterator[tuple[bytes, int, int]]:
    """Walk RIFF subchunks from ``start``: yields (fourcc, body_off, size).
    Chunk bodies are word-aligned (odd sizes carry a pad byte)."""
    pos = start
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from mono PCM16 WAV bytes.

    Walks the RIFF chunk list rather than assuming fmt/data at fixed
    offsets, so WAVs carrying extra chunks (LIST/fact/cue) decode
    correctly instead of silently yielding garbage samples."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    rate, data = None, None
    for fourcc, off, size in _riff_chunks(payload, 12):
        if off + size > len(payload):
            raise ValueError(f"truncated {fourcc!r} chunk")
        # first fmt/data win — a payload carrying duplicates decodes its
        # leading chunks rather than silently switching to the last pair
        if fourcc == b"fmt " and rate is None:
            if size < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, n_ch, rate = struct.unpack("<HHI", payload[off : off + 8])
            if audio_fmt != 1 or n_ch != 1:
                raise ValueError("only mono PCM16 supported")
        elif fourcc == b"data" and data is None:
            data = payload[off : off + size]
        if rate is not None and data is not None:
            break
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return rate, np.frombuffer(data, dtype="<i2")


def encode_bmp(pixels: np.ndarray) -> bytes:
    """24bpp bottom-up BMP bytes from an (H, W, 3) uint8 RGB array."""
    h, w, _ = pixels.shape
    body = _dib_rows(pixels)
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
    return _dib_decode(payload[off:], w, h)


def _dib_rows(pixels: np.ndarray) -> bytes:
    """Bottom-up BGR rows padded to 4-byte boundaries (shared by BMP
    bodies and AVI '00db' frame chunks — the same DIB wire format)."""
    h, w, _ = pixels.shape
    pad = (4 - (w * 3) % 4) % 4
    return b"".join(
        pixels[y, :, ::-1].astype(np.uint8).tobytes() + b"\x00" * pad
        for y in range(h - 1, -1, -1)
    )


def _dib_decode(body: bytes, w: int, h: int) -> np.ndarray:
    """(H, W, 3) uint8 RGB from bottom-up padded BGR rows."""
    row = w * 3
    pad = (4 - row % 4) % 4
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        start = y * (row + pad)
        out[h - 1 - y] = np.frombuffer(body[start : start + row], dtype=np.uint8).reshape(
            w, 3
        )[:, ::-1]
    return out


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Uncompressed-DIB AVI bytes from an (N, H, W, 3) uint8 RGB array.

    Standard RIFF/AVI layout: LIST('hdrl') with avih + one 'vids' stream
    (handler 'DIB ', i.e. raw 24bpp bottom-up frames), LIST('movi') of
    '00db' chunks, and a trailing idx1 index whose offsets are relative
    to the 'movi' fourcc — the index a real player seeks with."""
    n, h, w, _ = frames.shape
    bodies = [_dib_rows(frames[i]) for i in range(n)]
    frame_size = len(bodies[0]) if bodies else 0

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return struct.pack("<4sI", fourcc, len(body)) + body + b"\x00" * (len(body) & 1)

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1), frame_size * fps, 0, 0x10, n, 0, 1,
        frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00db", b) for b in bodies)
    movi = lst(b"movi", movi_body)
    # idx1 offsets point at each chunk header, relative to the 'movi' fourcc
    idx_entries, off = [], 4
    for b in bodies:
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off, len(b)))
        off += 8 + len(b) + (len(b) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return struct.pack("<4sI", b"RIFF", len(riff_body)) + riff_body


def _parse_avi(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """(fps, w, h, movi_pos, idx1) from a RIFF/AVI container.

    Shared header walk for decode_avi and sample_avi_frames. Tolerates
    extra chunks (JUNK padding, INFO lists) anywhere in the top-level
    chunk list — only hdrl/movi/idx1 are interpreted. Nested hdrl chunk
    bodies are bounds-checked against the enclosing LIST slice, and a
    short avih raises ValueError instead of struct.error."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = fps = None
    movi_pos = idx1 = None
    for fourcc, off, size in _riff_chunks(payload, 12):
        if off + size > len(payload):
            raise ValueError(f"truncated {fourcc!r} chunk")
        if fourcc == b"LIST":
            list_type = payload[off : off + 4]
            if list_type == b"hdrl":
                body = payload[off + 4 : off + size]
                for fc2, off2, size2 in _riff_chunks(body, 0):
                    if off2 + size2 > len(body):
                        raise ValueError(f"nested {fc2!r} chunk overruns its LIST")
                    if fc2 == b"avih":
                        if size2 < 40:
                            raise ValueError("avih chunk too short")
                        vals = struct.unpack("<10I", body[off2 : off2 + 40])
                        us_per_frame, w, h = vals[0], vals[8], vals[9]
                        fps = round(1_000_000 / us_per_frame) if us_per_frame else 0
            elif list_type == b"movi":
                movi_pos = off  # position of the 'movi' fourcc
        elif fourcc == b"idx1":
            idx1 = payload[off : off + size]
    if w is None or movi_pos is None or idx1 is None:
        raise ValueError("missing hdrl, movi, or idx1")
    return fps, w, h, movi_pos, idx1


def decode_avi(payload: bytes) -> tuple[int, np.ndarray]:
    """(fps, (N, H, W, 3) uint8 RGB frames) from uncompressed-DIB AVI.

    Frame access goes through the idx1 index (seek to chunk header,
    read exactly size bytes) — the same random-access pattern a frame
    sampler uses to pull every k-th frame of a large file without
    scanning the movi list."""
    fps, w, h, movi_pos, idx1 = _parse_avi(payload)
    frames = []
    for i in range(0, len(idx1) - 15, 16):
        fourcc, _flags, rel, size = struct.unpack("<4sIII", idx1[i : i + 16])
        if fourcc != b"00db":
            continue
        start = movi_pos + rel + 8  # skip the chunk header the offset points at
        if start + size > len(payload):
            raise ValueError("idx1 entry past end of payload")
        frames.append(_dib_decode(payload[start : start + size], w, h))
    return fps, np.stack(frames) if frames else np.empty((0, h, w, 3), dtype=np.uint8)


def sample_avi_frames(payload: bytes, every_k: int = 2) -> tuple[int, np.ndarray]:
    """(fps, every k-th frame) decoded via the idx1 index WITHOUT touching
    the skipped frames' bytes — decode cost is proportional to the frames
    SAMPLED, not the file size. This is the access pattern a video
    frame-sampling stage runs at scale: seek offsets come from the index,
    each read is exactly one frame chunk."""
    fps, w, h, movi_pos, idx1 = _parse_avi(payload)
    frames, frame_no = [], 0
    for i in range(0, len(idx1) - 15, 16):
        fourcc, _flags, rel, size = struct.unpack("<4sIII", idx1[i : i + 16])
        if fourcc != b"00db":
            continue
        if frame_no % every_k == 0:
            start = movi_pos + rel + 8
            frames.append(_dib_decode(payload[start : start + size], w, h))
        frame_no += 1
    return fps, np.stack(frames) if frames else np.empty((0, h, w, 3), dtype=np.uint8)


def decode_real(payload: bytes, media_type: str) -> np.ndarray:
    """REAL decode for audio (WAV PCM16: duration/rms/peak/zero-crossing
    + 4 band-energy proxies), image (BMP 24bpp: per-channel means,
    width, height, luma mean/std, aspect), and video (DIB-in-AVI:
    n_frames/width/height/fps, luma mean/std across frames, mean
    temporal luma delta, aspect). Same 8-float contract as decode_stub,
    so the Arrow batch flow, schema, and downstream pooling are
    untouched. Any other media_type falls back to decode_stub."""
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
    if media_type == "video":
        fps, frames = decode_avi(payload)
        n, h, w, _ = frames.shape
        luma = frames.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        motion = (
            float(np.mean(np.abs(np.diff(luma, axis=0)))) / 255.0 if n > 1 else 0.0
        )
        return np.array(
            [
                float(n),
                float(w),
                float(h),
                float(fps),
                luma.mean() / 255.0 if n else 0.0,
                luma.std() / 255.0 if n else 0.0,
                motion,
                w / h,
            ]
        )
    return decode_stub(payload, media_type)


def extract_features(assets: DataFrame, decoder=decode_stub) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decoder`` is the codec kernel: ``decode_stub`` (default — the
    metadata-only fake) or ``decode_real`` (WAV/BMP/DIB-AVI via pure
    numpy). The batch flow is identical either way."""

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
    """A small REAL media asset table: deterministic WAV tones, BMP
    gradients, and DIB-AVI clips synthesized per asset id (pure numpy —
    no media libs), for exercising decode_real end to end through the
    Arrow batch path."""
    rows = []
    for i in range(12):
        if i % 3 == 0:
            t = np.arange(1600 + 160 * i)
            freq = 220.0 * (1 + i / 4)
            samples = (10000 * np.sin(2 * np.pi * freq * t / 16000)).astype(np.int16)
            payload, mtype = encode_wav(samples, 16000), "audio"
            meta = (0, 0, 16000)
        elif i % 3 == 1:
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
        else:
            n, h, w = 4 + i // 3, 6 + i, 8 + i
            ff, yy, xx = np.mgrid[0:n, 0:h, 0:w]
            frames = np.stack(
                [
                    (xx * 255 // max(w - 1, 1) + ff * 11) % 256,
                    (yy * 255 // max(h - 1, 1)) % 256,
                    (ff * 37 + i * 5) % 256,  # frame index drives motion
                ],
                axis=-1,
            ).astype(np.uint8)
            payload, mtype = encode_avi(frames, fps=10), "video"
            meta = (w, h, 10)
        rows.append((i, i, mtype, bytearray(payload), meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


REAL_ASSET_SCHEMA = "asset_id BIGINT, doc_id BIGINT, media_type STRING, payload BINARY"


def make_real_assets(documents: DataFrame) -> DataFrame:
    """REAL media assets synthesized from fixture text bytes, built
    *inside executors* (mapInPandas — payloads never touch the driver):
    each doc's UTF-8 bytes seed a 8x8 24bpp BMP (doc_id%3==0), 96
    PCM16 WAV samples (==1), or a 3-frame 4x4 DIB-AVI clip (==2),
    encoded with the same encode_wav/encode_bmp/encode_avi kernels the
    decoders are pytest-pinned against. This is the scale-true shape of
    a media ingest stage: per-row encode work, Arrow record batches, no
    driver-side materialization.
    """

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "doc_id", "media_type", "payload")}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8") or b"\x00"
                b = (b * (192 // len(b) + 1))[:192]
                u8 = np.frombuffer(b, dtype=np.uint8)
                m = int(doc_id) % 3
                if m == 0:
                    payload, mtype = encode_bmp(u8.reshape(8, 8, 3).copy()), "image"
                elif m == 1:
                    samples = (u8[:96].astype(np.int16) - 128) * 256
                    payload, mtype = encode_wav(samples, 16000), "audio"
                else:
                    payload, mtype = encode_avi(u8[:144].reshape(3, 4, 4, 3).copy(), fps=10), "video"
                out["asset_id"].append(int(doc_id))
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mtype)
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    return documents.select("doc_id", "text").mapInPandas(build, REAL_ASSET_SCHEMA)


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


def dhash_image(payload: bytes) -> int:
    """56-bit difference hash (dHash) of a decoded BMP: integer luma
    (299R + 587G + 114B — scaled BT.601, no floats so there are no
    rounding ties), one bit per horizontally adjacent pixel pair
    (1 = right pixel brighter), rows concatenated MSB-first. Near-
    identical images (small pixel deltas) keep the same bits wherever
    the luma gradient's margin exceeds the perturbation; structurally
    different images flip ~half the bits."""
    px = decode_bmp(payload).astype(np.int64)
    luma = 299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
    bits = 0
    h, w = luma.shape
    for y in range(h):
        for x in range(w - 1):
            bits = (bits << 1) | (1 if luma[y, x + 1] > luma[y, x] else 0)
    return bits


PHASH_SCHEMA = "doc_id BIGINT, n_bytes BIGINT, phash STRING"


def phash_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched perceptual hashing over image payloads — the same
    mapInPandas flow as extract_features, emitting the 14-hex dHash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "phash": payloads.map(
                        lambda b: format(dhash_image(bytes(b)), "014x")
                    ),
                }
            )

    return assets.mapInPandas(run, PHASH_SCHEMA)
