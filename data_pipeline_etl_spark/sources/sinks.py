"""Sinks (SURVEY.md §2.A tests-only rows): partitioned parquet load,
csv/json interchange.

This is the reference genre's "load" step re-expressed Spark-native: the
warehouse table becomes a partitioned parquet dataset whose directory
layout *is* the index (partition pruning replaces warehouse indexes at
100 TB — readers of ``year=1997/month=3`` touch only those files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_fact_partitioned(orders: DataFrame, out_dir: str) -> None:
    """Write orders partitioned by (year, month) of the order date."""
    (
        orders.withColumn("o_year", F.year("o_orderdate"))
        .withColumn("o_month", F.month("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year", "o_month")
        .parquet(out_dir)
    )


def read_fact_partitioned(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)


def roundtrip_csv(df: DataFrame, spark: SparkSession, out_dir: str) -> DataFrame:
    """CSV write + schema-preserving read-back (header + explicit schema —
    CSV carries no types, so the reader is given the writer's schema)."""
    df.write.mode("overwrite").option("header", True).csv(out_dir)
    return spark.read.schema(df.schema).option("header", True).csv(out_dir)


def roundtrip_json(df: DataFrame, spark: SparkSession, out_dir: str) -> DataFrame:
    """JSON-lines write + schema-preserving read-back."""
    df.write.mode("overwrite").json(out_dir)
    return spark.read.schema(df.schema).json(out_dir)


def roundtrip_xml(
    df: DataFrame, spark: SparkSession, out_dir: str, row_tag: str = "row"
) -> DataFrame:
    """XML file write + schema-pinned read-back via Spark 4's built-in
    XML source — the third text interchange format after csv/json (the
    expression-level codec lives in operators/semistructured.py;
    this is the file-level source/sink). The explicit schema matters
    for the same reason as the json helper: inference re-reads the
    data and can widen types, while a pinned schema makes the read a
    single pass that must reproduce the written values exactly."""
    df.write.format("xml").option("rowTag", row_tag).mode("overwrite").save(out_dir)
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .schema(df.schema)
        .load(out_dir)
    )


def write_bucketed(
    df: DataFrame, n_buckets: int, key: str, path: str, table_name: str
) -> DataFrame:
    """Persist a frame hash-bucketed (and sorted) on `key` and return the
    catalog-backed read — the storage layout that makes repeated joins
    and aggregations on `key` SHUFFLE-FREE: two tables bucketed with the
    same bucket count co-locate matching keys per bucket file, so the
    join plan carries ZERO Exchange on either side (pinned in
    tests/test_sinks.py). At 100 TB this is the difference between
    re-shuffling a fact table for every join against its dimension and
    paying the shuffle ONCE at write time — the layout the dedup-store
    docstrings (llm_dedup.py: 'bucketed by band_key') assume; Spark
    needs a catalog entry for bucket metadata, hence saveAsTable with an
    explicit external path rather than a bare parquet write."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table_name)
    )
    return df.sparkSession.table(table_name)


def roundtrip_variant(df: DataFrame, spark: SparkSession, out_dir: str) -> DataFrame:
    """Parquet write + read-back of a frame carrying VARIANT columns —
    the PHYSICAL half of the open-schema story q_variant_extract proves
    in memory: Spark 4 stores VariantType as the Parquet variant binary
    encoding (metadata + value byte pair), so the read-back is a
    byte-offset-probe column again, never a re-parse of JSON text. At
    100 TB this is the lakehouse storage path for schemaless event
    props: parse once at ingest (try_parse_json), pay binary probes
    forever after, keep producer-added fields without schema migration.
    The read pins no schema — parquet carries the variant logical type,
    and the assertion that it arrives back AS VariantType (not string /
    struct) is part of the test contract."""
    df.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir)


# Manifest fingerprint algorithm version. v1 was plain bit_xor(xxhash64(line))
# (even-count duplicate lines XOR-cancel); v2 salts the hash with the
# within-shard line count, closing that blind spot. The version rides in
# every manifest row so a validator reading a manifest written by a
# different exporter version FAILS LOUDLY as a version mismatch instead of
# silently reporting the data as corrupt (ADVICE r10: writer/validator
# divergence must be distinguishable from real corruption).
FINGERPRINT_VERSION = 2


class ManifestVersionError(ValueError):
    """Stored shard manifest was written by a different fingerprint
    version — the data may be intact; re-export (or validate with the
    matching exporter version) instead of treating this as corruption."""


def export_training_shards(df: DataFrame, out_dir: str, key: str, n_shards: int) -> DataFrame:
    """Training-data export: write ``df`` as JSONL shards with a
    content manifest — the hand-off format an LLM training job consumes
    (one worker streams one shard; the manifest is the integrity +
    progress contract between the data pipeline and the trainer).

    Sharding is DETERMINISTIC (``pmod(xxhash64(key), n_shards)``), so a
    re-export after an upstream fix reproduces the same doc→shard map
    and the trainer's resume bookkeeping stays valid. ``repartition``
    on the shard id co-locates each shard before ``partitionBy``, so
    every shard is one task writing one file — no small-file spray.

    The manifest carries, per shard: row count, total JSONL chars, and
    an ORDER-INDEPENDENT, MULTIPLICITY-AWARE content fingerprint
    (``bit_xor`` of ``xxhash64(line, n)`` over distinct lines with
    their within-shard counts — commutative, so parallel writers and
    readers need no sort, and no overflow under ANSI arithmetic, unlike
    a SUM of hashes). Hashing the count alongside the line closes the
    plain-XOR blind spot where any line present an even number of times
    cancels itself out of the fingerprint: dropping one copy of a
    duplicated line changes that line's ``n`` and therefore the XOR.
    Everything is computed executor-side from the same ``to_json``
    bytes the writer emits; only |shards| manifest rows exist anywhere.
    Each row also records ``fp_version`` (= :data:`FINGERPRINT_VERSION`)
    so validators can reject version-skewed manifests loudly instead of
    misreading them as corruption.

    ``df`` must not already carry a ``shard`` column: the sharding
    column is injected under that name, and silently overwriting a
    user column would make the written files (partition column dropped)
    permanently disagree with the manifest's ``to_json`` lines.
    """
    # case-insensitive: Spark resolves columns case-insensitively by
    # default, so a 'Shard' column would be silently replaced too
    if any(c.lower() == "shard" for c in df.columns):
        raise ValueError(
            "export_training_shards: input already has a 'shard' column; "
            "rename it — the export injects its own deterministic shard id"
        )
    cols = list(df.columns)
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(key)), F.lit(n_shards)).cast("int")
    )
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(out_dir + "/data")
    )
    line = F.to_json(F.struct(*[F.col(c) for c in cols]))
    manifest = _shard_manifest(sharded.select("shard", line.alias("line")))
    manifest.coalesce(1).write.mode("overwrite").json(out_dir + "/_manifest")
    return manifest


def _shard_manifest(lines: DataFrame) -> DataFrame:
    """Per-shard (n_rows, n_chars, fingerprint) from a (shard, line)
    frame. Two-level aggregate: the per-(shard, line) count rides into
    the fingerprint hash so duplicate lines cannot cancel under XOR;
    both groupBys partial-aggregate map-side, so at 100 TB only
    distinct-line rows shuffle, then |shards| rows."""
    per_line = lines.groupBy("shard", "line").agg(F.count("*").alias("n"))
    return per_line.groupBy("shard").agg(
        F.sum("n").alias("n_rows"),
        F.sum(F.length("line").cast("long") * F.col("n")).alias("n_chars"),
        F.expr("bit_xor(xxhash64(line, n))").alias("fingerprint"),
        F.lit(FINGERPRINT_VERSION).alias("fp_version"),
    )


def validate_training_shards(spark: SparkSession, out_dir: str) -> bool:
    """Re-derive the shard manifest from the written JSONL files and
    compare to the stored one — the post-export integrity gate (and the
    pre-training gate on the consumer side). A lost line, a truncated
    file, or a flipped byte changes count/chars/fingerprint for exactly
    one shard — including a dropped copy of a duplicated line (the
    fingerprint hashes each distinct line WITH its multiplicity, so
    even-count duplicates cannot XOR-cancel).

    Reads the shards as RAW TEXT, not JSON: the manifest fingerprints
    the writer's exact bytes (``to_json`` output), so a byte-level
    text read reproduces them with no parser in the loop — a corrupted
    line that would crash or null out a JSON parse still just changes
    one shard's fingerprint here. Distributed end-to-end: only the
    |shards|-row comparison exists anywhere.

    Version gate first: a manifest whose ``fp_version`` is absent (the
    v1 exporter predates the field) or differs from this validator's
    ``FINGERPRINT_VERSION`` raises :class:`ManifestVersionError` rather
    than returning ``False`` — the data may be perfectly intact, and a
    version skew must never masquerade as a corruption signal. The
    skew diagnosis itself is gated both ways (r11 review + ADVICE r11:
    each direction of the confusion has bitten once):
    - a manifest Spark cannot parse into the v1 shape at all (truncated
      file, binary garbage — only ``_corrupt_record`` comes back) is
      NOT version skew, it is corruption → ``False``;
    - a PARTIALLY garbled manifest (some rows unparseable, or missing /
      non-numeric ``fp_version`` while others carry it, or a mix of
      versions) cannot come from one consistent foreign exporter → also
      corruption → ``False`` — in the legacy no-``fp_version`` branch
      too (ADVICE r12): a pre-v2 manifest with corrupt rows or null v1
      fields is corruption, not skew;
    - garbled-but-valid JSON that makes Spark INFER a manifest column
      as struct/array/map cannot come from the exporter at any version
      → corruption → ``False`` (guarded up front — a ``try_cast`` from
      a complex type is an ANALYSIS-time error, not a runtime null).
    ``ManifestVersionError`` is raised only when EVERY row parses and
    carries the SAME non-current version."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    stored_raw = spark.read.json(out_dir + "/_manifest")
    v1_cols = {"shard", "n_rows", "n_chars", "fingerprint"}
    fields = {f.name: f.dataType for f in stored_raw.schema.fields}
    # Complex-inferred manifest column (ADVICE r12): try_cast suppresses
    # RUNTIME cast failures only; struct/array/map → int is rejected at
    # analysis time and would crash the validator with AnalysisException
    # instead of reading as corruption. No exporter version ever writes
    # a complex-typed manifest column, so the inference itself is the
    # corruption signal.
    if any(
        isinstance(fields[c], (ArrayType, MapType, StructType))
        for c in (v1_cols | {"fp_version"}) & set(fields)
    ):
        return False
    # The corrupt-record column name is session-configurable (ADVICE
    # r12); keying on the literal default would silently miss per-row
    # garbage in sessions that renamed it.
    corrupt_col = (
        spark.conf.get("spark.sql.columnNameOfCorruptRecord", "_corrupt_record")
        or "_corrupt_record"
    )
    has_corrupt_col = corrupt_col in stored_raw.columns
    if "fp_version" not in stored_raw.columns:
        if not v1_cols.issubset(set(stored_raw.columns)):
            return False  # unparseable/garbled manifest: corruption, not skew
        # Pre-v2 manifest with SOME corrupt/binary rows or null v1
        # fields (ADVICE r12): per-row damage to a legacy manifest is
        # corruption — only a FULLY intact v1 shape diagnoses skew.
        if has_corrupt_col:
            return False
        legacy_probe = stored_raw.select(
            [F.col(c).isNull().alias(c) for c in sorted(v1_cols)]
        ).collect()
        if any(r[c] for r in legacy_probe for c in sorted(v1_cols)):
            return False
        raise ManifestVersionError(
            "shard manifest has no fp_version field (written by a pre-v2 "
            "exporter); re-export the shards — this is a version skew, "
            "not evidence of corruption"
        )
    # Per-row garbling gate (ADVICE r11): a manifest where SOME rows are
    # unparseable (corrupt-record column) or miss/garble fp_version
    # while others carry it is per-row manifest corruption — exactly
    # what this gate must never relabel as benign skew. Skew is
    # diagnosed only when EVERY row parses and carries the SAME
    # non-current version. The manifest is |shards| rows by
    # construction, so one driver-side pass over it is validation
    # metadata, not a hot path — and it sidesteps Spark's refusal to
    # run a query referencing only the internal corrupt-record column
    # of an unmaterialized JSON scan.
    # try_cast, not cast: under ANSI SQL a garbled value ("two") would
    # THROW out of the validator; here it must null out and read as
    # corruption like any other per-row damage
    probe_cols = [F.col("fp_version").try_cast("int").alias("v")]
    if has_corrupt_col:
        probe_cols.append(F.col(corrupt_col).isNotNull().alias("bad"))
    probe = stored_raw.select(*probe_cols).collect()
    if has_corrupt_col and any(r["bad"] for r in probe):
        return False  # partially garbled manifest: corruption, not skew
    versions = sorted({r["v"] for r in probe}, key=lambda v: (v is None, v))
    if None in versions or len(versions) != 1:
        # a null (row missing the field, or a non-numeric value) or a
        # version MIX cannot come from one consistent foreign exporter
        return False
    if versions != [FINGERPRINT_VERSION]:
        raise ManifestVersionError(
            f"shard manifest fingerprint version {versions} != validator "
            f"version {FINGERPRINT_VERSION}; re-export the shards — this "
            "is a version skew, not evidence of corruption"
        )
    back = spark.read.text(out_dir + "/data/shard=*").select(
        F.regexp_extract(F.input_file_name(), r"shard=(\d+)", 1)
        .cast("int")
        .alias("shard"),
        F.col("value").alias("line"),
    )
    recomputed = _shard_manifest(back)
    stored = stored_raw.select(
        F.col("shard").try_cast("int").alias("shard"),
        F.col("n_rows").try_cast("long").alias("n_rows"),
        F.col("n_chars").try_cast("long").alias("n_chars"),
        F.col("fingerprint").try_cast("long").alias("fingerprint"),
        F.col("fp_version").try_cast("int").alias("fp_version"),
    )
    return (
        recomputed.exceptAll(stored).isEmpty()
        and stored.exceptAll(recomputed).isEmpty()
    )
