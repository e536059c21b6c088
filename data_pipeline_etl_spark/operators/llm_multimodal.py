"""Group J — multimodal columns (SURVEY.md §2.J).

``documents ⋈ embeddings`` on doc_id=vec_id is the fixture's multimodal
key (FIXTURES.md). Binary payload plumbing (decode/resize/frame-sample as
Arrow-batched Pandas UDFs) lives in streaming/multimodal.py, with REAL
pure-numpy codec kernels for WAV/BMP/DIB-AVI (pytest-pinned); the
fixture-driven queries here run the same Arrow path with the
deterministic stub kernel, since the fixture payloads are text bytes,
not media.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_etl_spark.registry import query
from data_pipeline_etl_spark.sources.tables import table

_NORM_SQL = (
    "sqrt(list_sum(list_transform(generate_series(1, len(embedding)), "
    "i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))"
)


def _l2_norm(col: str):
    """Sequential float64 fold of the L2 norm (bit-equal on both engines)."""
    return F.sqrt(
        F.expr(
            f"aggregate(zip_with({col}, {col}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    )


@query(
    "q_multimodal_join",
    oracle=f"""
    SELECT lang,
           count(*) AS n_docs,
           round(avg({_NORM_SQL}), 6) AS avg_norm,
           round(avg(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
    FROM documents JOIN embeddings ON doc_id = vec_id
    GROUP BY lang
    """,
)
def q_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text⋈vector join: per-language average embedding norm + doc length."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(_l2_norm("embedding")), 6).alias("avg_norm"),
            F.round(F.avg(F.col("n_chars").cast("double")), 6).alias("avg_chars"),
        )
    )


@query(
    "q_multimodal_framesample",
    oracle="""
    SELECT doc_id AS asset_id,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(floor((greatest(octet_length(encode(text)), 1) - 1) / 64) + 1
                AS BIGINT) AS n_frames,
           CAST(1 + 64 * floor((greatest(octet_length(encode(text)), 1) - 1) / 64)
                AS BIGINT) AS last_offset
    FROM documents
    """,
)
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling surface: one sampled offset per 64 payload bytes per
    asset (the video-frame-extraction access pattern), aggregated back to
    per-asset frame counts.

    Drives the real ``frame_sample`` plumbing (streaming/multimodal.py):
    offsets come from a per-row sequence explode over the opaque binary
    payload — linear in payload bytes, no join, no Python — then one
    groupBy on asset_id. The oracle closes the telescope arithmetically
    (n_frames = floor((len-1)/64)+1), which also documents the sampling
    contract.
    """
    from data_pipeline_etl_spark.streaming import multimodal

    d = table(spark, sf_dir, "documents")
    frames = multimodal.frame_sample(multimodal.make_assets(d), every_n_bytes=64)
    return frames.groupBy("asset_id", "media_type").agg(
        F.count("*").alias("n_frames"),
        F.max("offset").cast("long").alias("last_offset"),
    )


@query(
    "q_multimodal_binmeta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text)                                  AS payload_md5,
           to_base64(encode(substring(text, 1, 8)))   AS head_b64
    FROM documents
    WHERE octet_length(encode(text)) >= 64
    """,
)
def q_multimodal_binmeta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native binary-column metadata — the bytes path WITHOUT Python.

    Complements q_multimodal_decode (which drives the Arrow/mapInPandas
    plumbing): here the opaque payload is a real BinaryType column and
    every operation on it — byte length, md5 digest, base64 of the
    8-byte header — is a JVM builtin inside whole-stage codegen. This is
    the triage tier of a 100 TB multimodal pipeline: dedup keys, size
    partitioning, and magic-byte sniffing must run at scan throughput on
    the binary column itself, long before any Python codec touches a
    batch. The byte-length predicate also shows binary metadata is
    filterable mid-pipeline.
    """
    d = table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return (
        d.select(
            "doc_id",
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("payload_md5"),
            F.base64(F.encode(F.substring("text", 1, 8), "UTF-8")).alias("head_b64"),
        )
        .where(F.col("n_bytes") >= 64)
    )


@query(
    "q_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS digest
    FROM documents
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload decode surface through the driver contract.

    Drives the real multimodal plumbing — binary column construction +
    Arrow-batched mapInPandas (streaming/multimodal.py) — and checks its
    deterministic outputs (payload size, sha256 digest, media routing)
    against a pure-SQL oracle. The stubbed feature vector is excluded
    (sha256-byte-slicing is not expressible in the oracle dialect).
    """
    from data_pipeline_etl_spark.streaming import multimodal

    d = table(spark, sf_dir, "documents")
    feats = multimodal.extract_features(multimodal.make_assets(d))
    return feats.select("doc_id", "media_type", "n_bytes", "digest")


# rows-only: payloads are REAL WAV/BMP/DIB-AVI media synthesized in
# executors from fixture text bytes, then decoded by the real codec
# kernels — a cross-engine SQL oracle cannot decode media containers.
@query("q_multimodal_decode_real")
def q_multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec decode through the driver contract.

    encode→decode roundtrip entirely inside executors: each document's
    text bytes seed a real BMP image / PCM16 WAV clip / DIB-AVI video
    (streaming/multimodal.py make_real_assets), which decode_real then
    parses back — RIFF chunk walk, DIB row unpacking, idx1 frame index —
    into the 8-float feature contract over the same Arrow mapInPandas
    path the stub queries use. Deterministic end to end (features are
    pure functions of the fixture text), so row count, schema, and
    values are stable across runs; rounded to 6 dp like every declared
    float surface.
    """
    from data_pipeline_etl_spark.streaming import multimodal

    d = table(spark, sf_dir, "documents")
    feats = multimodal.extract_features(
        multimodal.make_real_assets(d), decoder=multimodal.decode_real
    )
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "digest",
        # stringified (declared outputs must be scalar for the driver's
        # pandas canonicalizer), rounded to 6 dp like every float surface
        F.array_join(
            F.transform("feat", lambda v: F.round(v, 6).cast("string")), ","
        ).alias("feat_csv"),
    )


# rows-only: the dHash is computed from DECODED BMP pixels (RIFF/DIB
# parse + integer-luma gradient bits) — no cross-engine SQL oracle can
# decode the container. Determinism pinned in tests/test_rows_only.py;
# near-dup/distinct semantics planted in tests/test_planted_ops.py.
@query("q_multimodal_phash")
def q_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup via perceptual hash — the multimodal member of the
    dedup family: every image asset gets a 56-bit dHash (integer-luma
    horizontal gradient bits over the DECODED pixels, not the bytes —
    re-encoded / metadata-touched copies that defeat q_multimodal_binmeta's
    md5 still collide here), plus its 4x14-bit band keys and the size of
    its exact-hash group. Hamming-0 dedup is the groupBy on phash;
    hamming<=k near-dup at corpus scale is the SAME band-bucket
    candidate topology as q_dedup_lsh_candidates — a pair must agree on
    some 14-bit band, so the band columns ARE the index delta a
    production image-dedup store appends (mirroring q_dedup_incremental's
    contract, swapped from MinHash bands to phash bands).

    Scale shape: payloads are built AND hashed executor-side over Arrow
    batches (mapInPandas — bytes never touch the driver); the image
    filter runs before the encode so audio/video rows never pay the
    codec; the only shuffles downstream of hashing carry (doc_id, 14-hex
    string) rows — hash-sized, never pixel-sized.
    """
    from data_pipeline_etl_spark.streaming import multimodal

    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    hashed = multimodal.phash_assets(multimodal.make_real_assets(d))
    counts = hashed.groupBy("phash").agg(F.count("*").alias("n_same_hash"))
    bits = F.conv(F.col("phash"), 16, 10).cast("long")
    return (
        hashed.join(counts, "phash")
        .select(
            "doc_id",
            "phash",
            *[
                F.lower(
                    F.lpad(
                        F.conv(
                            (
                                F.shiftright(bits, 14 * i).bitwiseAND(F.lit(0x3FFF))
                            ).cast("string"),
                            10,
                            16,
                        ),
                        4,
                        "0",
                    )
                ).alias(f"band{i}")
                for i in range(4)
            ],
            "n_same_hash",
        )
    )
