"""Sink round-trip tests (SURVEY.md §2.A tests-only rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_etl_spark.sources import sinks
from data_pipeline_etl_spark.sources.tables import table
from tests.conftest import SF_DIR


def _multiset(df, cols):
    from collections import Counter

    return Counter(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def test_partitioned_write_roundtrip(spark, tmp_path):
    out = str(tmp_path / "fact")
    orders = table(spark, SF_DIR, "orders")
    sinks.write_fact_partitioned(orders, out)
    back = sinks.read_fact_partitioned(spark, out)
    assert back.count() == orders.count()
    # partition layout: year/month directories exist and prune correctly
    pruned = back.where((F.col("o_year") == 1997) & (F.col("o_month") == 3))
    expect = orders.where(
        (F.year("o_orderdate") == 1997) & (F.month("o_orderdate") == 3)
    ).count()
    assert pruned.count() == expect
    # partition pruning reaches the scan: only the matching directory is read
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_csv_roundtrip(spark, tmp_path):
    out = str(tmp_path / "csv")
    cust = table(spark, SF_DIR, "customer")
    back = sinks.roundtrip_csv(cust, spark, out)
    assert back.schema == cust.schema
    assert _multiset(back, cust.columns) == _multiset(cust, cust.columns)


def test_json_roundtrip(spark, tmp_path):
    out = str(tmp_path / "json")
    nation = table(spark, SF_DIR, "nation")
    back = sinks.roundtrip_json(nation, spark, out)
    assert back.schema == nation.schema
    assert _multiset(back, nation.columns) == _multiset(nation, nation.columns)


def test_orc_roundtrip(spark, tmp_path):
    """ORC source/sink parity with the parquet-loaded table: Spark's
    second built-in columnar format preserves values and the NTZ
    timestamp discipline (cluster deployments mixing warehouse formats
    must read back identically)."""
    out = str(tmp_path / "orders_orc")
    orders = table(spark, SF_DIR, "orders")
    orders.write.orc(out)
    back = spark.read.orc(out)
    assert back.schema == orders.schema
    cols = ["o_orderkey", "o_totalprice", "o_orderdate", "o_orderstatus"]
    assert _multiset(back, cols) == _multiset(orders, cols)


def test_sorted_layout_bounds_rowgroup_overlap(spark, tmp_path):
    """Data layout as a scan-pruning lever: writing the fact sorted by
    the hot filter key gives each parquet row group a tight min/max for
    that key, so a pushed key predicate prunes all but O(1) row groups
    at read time; the unsorted layout leaves every row group a
    candidate. This is the cheap half of Z-ordering / liquid
    clustering — at 100 TB it is the difference between decoding one
    row group and decoding the table. Pinned via footer statistics:
    with small row groups, exactly one sorted row group can contain a
    given user_id while (with a shuffled layout) nearly all unsorted
    ones can."""
    import glob
    import os

    import pyarrow.parquet as pq

    from data_pipeline_etl_spark.sources.tables import table
    from tests.conftest import SF_DIR

    e = table(spark, SF_DIR, "events")
    layouts = {
        "sorted": e.orderBy("user_id", "ts").coalesce(1),
        "unsorted": e.orderBy(F.md5(F.col("event_id").cast("string"))).coalesce(1),
    }
    overlap = {}
    n_groups = {}
    for tag, df in layouts.items():
        p = str(tmp_path / tag)
        df.write.option("parquet.block.size", 16 * 1024).parquet(p)
        f = glob.glob(os.path.join(p, "part-*.parquet"))[0]
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ci = names.index("user_id")
        rngs = [
            (
                md.row_group(rg).column(ci).statistics.min,
                md.row_group(rg).column(ci).statistics.max,
            )
            for rg in range(md.num_row_groups)
        ]
        probe = 42
        overlap[tag] = sum(1 for lo, hi in rngs if lo <= probe <= hi)
        n_groups[tag] = md.num_row_groups
    assert n_groups["sorted"] >= 5, n_groups  # small groups actually took effect
    assert overlap["sorted"] <= 2, (overlap, n_groups)
    assert overlap["unsorted"] >= n_groups["unsorted"] // 2, (overlap, n_groups)


def test_training_shard_export_manifest(spark, tmp_path):
    """JSONL shard export: deterministic sharding, one file per shard,
    manifest validates the written bytes, and a corrupted shard is
    caught. The export/validate pair is the pipeline→trainer hand-off
    contract."""
    import glob
    import os

    docs = table(spark, SF_DIR, "documents")
    out = str(tmp_path / "shards")
    manifest = sinks.export_training_shards(docs, out, key="doc_id", n_shards=8)
    rows = {r["shard"]: r for r in manifest.collect()}
    assert set(rows) == set(range(8))
    assert sum(r["n_rows"] for r in rows.values()) == docs.count()
    # one file per shard (repartition co-located each shard before write)
    for s in range(8):
        files = glob.glob(os.path.join(out, "data", f"shard={s}", "part-*"))
        assert len(files) == 1, (s, files)
    # the written bytes reproduce the manifest
    assert sinks.validate_training_shards(spark, out)
    # deterministic re-export: identical shard map and fingerprints
    out2 = str(tmp_path / "shards2")
    manifest2 = sinks.export_training_shards(docs, out2, key="doc_id", n_shards=8)
    assert {tuple(r) for r in manifest.collect()} == {
        tuple(r) for r in manifest2.collect()
    }
    # a flipped byte in one shard fails validation
    victim = glob.glob(os.path.join(out, "data", "shard=3", "part-*"))[0]
    # drop Hadoop's local-FS .crc sidecar: object stores don't have one,
    # and with it present the checksum layer (not our gate) trips first
    crc = os.path.join(os.path.dirname(victim), "." + os.path.basename(victim) + ".crc")
    os.remove(crc)
    with open(victim, "r+b") as f:
        f.seek(20)
        b = f.read(1)
        f.seek(20)
        f.write(b"X" if b != b"X" else b"Y")
    assert not sinks.validate_training_shards(spark, out)


def test_training_shard_fingerprint_multiplicity(spark, tmp_path):
    """The fingerprint is multiplicity-aware: replacing BOTH copies of a
    duplicated line with two more copies of another SAME-LENGTH line
    ({A,A,B,B} -> {B,B,B,B}) keeps n_rows, n_chars, AND the plain
    per-line XOR all unchanged (even counts cancel: h(A)^h(A)^h(B)^h(B)
    = 0 = h(B)^h(B)^h(B)^h(B)) — only the count-salted hash catches it,
    so a regression back to bit_xor(xxhash64(line)) fails here. Also: a
    pre-existing 'shard' column is rejected (case-insensitively) instead
    of silently overwritten."""
    import glob
    import os

    from pyspark.sql import functions as F

    df = spark.range(4).select(
        F.lit(0).alias("k"),
        F.when(F.col("id") < 2, F.lit("aaaa")).otherwise(F.lit("bbbb")).alias("v"),
    )  # one shard holds lines {A, A, B, B}
    out = str(tmp_path / "dupshards")
    sinks.export_training_shards(df, out, key="k", n_shards=1)
    assert sinks.validate_training_shards(spark, out)
    victim = glob.glob(os.path.join(out, "data", "shard=0", "part-*"))[0]
    crc = os.path.join(
        os.path.dirname(victim), "." + os.path.basename(victim) + ".crc"
    )
    os.remove(crc)
    with open(victim) as f:
        lines = f.read().splitlines()
    a = next(l for l in lines if "aaaa" in l)
    b = next(l for l in lines if "bbbb" in l)
    lines.remove(a)
    lines.remove(a)
    lines += [b, b]  # {B,B,B,B}: counts/chars AND plain XOR all preserved
    with open(victim, "w") as f:
        f.write("\n".join(lines) + "\n")
    assert not sinks.validate_training_shards(spark, out)

    for bad in ("shard", "Shard"):
        with pytest.raises(ValueError, match="shard"):
            sinks.export_training_shards(
                df.withColumn(bad, F.lit(1)), str(tmp_path / "x"), key="k", n_shards=1
            )


def test_training_shard_manifest_version_gate(spark, tmp_path):
    """Fingerprint version skew raises ManifestVersionError instead of
    returning False (ADVICE r10): a manifest written by a different
    exporter version must not masquerade as data corruption. Three
    cases: current version validates; a manifest missing fp_version
    (the v1 exporter predates the field) raises; a manifest with a
    wrong fp_version value raises. The data files are untouched in all
    three — only the manifest metadata varies."""
    import glob
    import json
    import os

    from pyspark.sql import functions as F

    df = spark.range(6).select(
        F.lit(0).alias("k"), F.concat(F.lit("doc"), F.col("id")).alias("v")
    )
    out = str(tmp_path / "vshards")
    manifest = sinks.export_training_shards(df, out, key="k", n_shards=1)
    assert [r["fp_version"] for r in manifest.collect()] == [
        sinks.FINGERPRINT_VERSION
    ]
    assert sinks.validate_training_shards(spark, out)

    mpath = glob.glob(os.path.join(out, "_manifest", "part-*"))[0]
    crc = os.path.join(
        os.path.dirname(mpath), "." + os.path.basename(mpath) + ".crc"
    )
    os.remove(crc)
    with open(mpath) as f:
        rows = [json.loads(l) for l in f.read().splitlines()]

    def rewrite(rows_out):
        with open(mpath, "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows_out) + "\n")

    # v1-era manifest: field absent but the v1 shape intact
    rewrite([{k: v for k, v in r.items() if k != "fp_version"} for r in rows])
    with pytest.raises(sinks.ManifestVersionError, match="no fp_version"):
        sinks.validate_training_shards(spark, out)

    # garbage manifest: not parseable into ANY manifest shape — this is
    # corruption, and must FAIL validation, not read as benign version
    # skew (the legacy-column gate distinguishes the two)
    with open(mpath, "w") as f:
        f.write("\x00\x01 not json at all {{{\n")
    assert not sinks.validate_training_shards(spark, out)

    # future/foreign version: field present but mismatched
    rewrite([{**r, "fp_version": sinks.FINGERPRINT_VERSION + 1} for r in rows])
    with pytest.raises(sinks.ManifestVersionError, match="version"):
        sinks.validate_training_shards(spark, out)

    # PARTIAL garbling (ADVICE r11): these must FAIL as corruption, not
    # raise as skew — a mix of parseable-current and damaged rows cannot
    # come from one consistent foreign exporter. Exercised on a 2-row
    # manifest so "some rows fine, some damaged" is real.
    two = [dict(rows[0]), {**rows[0], "shard": rows[0]["shard"] + 1}]

    # (a) one row is unparseable bytes alongside a valid v2 row
    with open(mpath, "w") as f:
        f.write(json.dumps(two[0]) + "\n" + "\x00\x01 not json {{{\n")
    assert not sinks.validate_training_shards(spark, out)

    # (b) one row parses but lacks fp_version while the other carries it
    rewrite([two[0], {k: v for k, v in two[1].items() if k != "fp_version"}])
    assert not sinks.validate_training_shards(spark, out)

    # (c) one row carries a non-numeric fp_version
    rewrite([two[0], {**two[1], "fp_version": "two"}])
    assert not sinks.validate_training_shards(spark, out)

    # (d) a MIX of two versions (one of them current) is not a
    # consistent foreign export either
    rewrite([two[0], {**two[1], "fp_version": sinks.FINGERPRINT_VERSION + 1}])
    assert not sinks.validate_training_shards(spark, out)

    # (e) ADVICE r12 (medium): a PRE-V2 manifest with SOME corrupt rows
    # must read as corruption, not as benign version skew — per-row
    # damage to a legacy manifest is still damage
    legacy = [{k: v for k, v in r.items() if k != "fp_version"} for r in two]
    with open(mpath, "w") as f:
        f.write(json.dumps(legacy[0]) + "\n" + "\x00\x01 not json {{{\n")
    assert not sinks.validate_training_shards(spark, out)

    # (f) a pre-v2 manifest row MISSING a v1 field (null after schema
    # union) is corruption too, not skew
    rewrite([legacy[0], {k: v for k, v in legacy[1].items() if k != "n_rows"}])
    assert not sinks.validate_training_shards(spark, out)

    # (g) ADVICE r12: garbled-but-VALID JSON that makes Spark infer a
    # manifest column as a STRUCT must return False as corruption —
    # not crash the validator with an analysis-time cast error
    rewrite([two[0], {**two[1], "fp_version": {"v": 2}}])
    assert not sinks.validate_training_shards(spark, out)
    rewrite([two[0], {**two[1], "fingerprint": [1, 2]}])
    assert not sinks.validate_training_shards(spark, out)

    # (h) ADVICE r12: the corrupt-record column name is read from the
    # session config — per-row garbage is still detected (False, not a
    # skew raise) when the session renamed it
    prev = spark.conf.get(
        "spark.sql.columnNameOfCorruptRecord", "_corrupt_record"
    )
    spark.conf.set("spark.sql.columnNameOfCorruptRecord", "_bad_row")
    try:
        with open(mpath, "w") as f:
            f.write(json.dumps(two[0]) + "\n" + "\x00\x01 not json {{{\n")
        assert not sinks.validate_training_shards(spark, out)
    finally:
        spark.conf.set("spark.sql.columnNameOfCorruptRecord", prev)

    # restoring the true version restores a clean pass
    rewrite(rows)
    assert sinks.validate_training_shards(spark, out)


def test_corrupt_record_quarantine_routes_bad_lines(spark, tmp_path):
    """Landing-zone dead-letter routing: PERMISSIVE JSON read with
    columnNameOfCorruptRecord parses good lines into typed columns and
    carries each malformed line BYTE-EXACT in the corrupt column; the
    quarantine split writes bad lines to a dead-letter sink for replay
    while good rows continue — the no-job-failure ingest contract.
    (The .cache() is Spark's documented requirement for referencing
    only the corrupt column in a filter.)"""
    import pathlib

    src = tmp_path / "landing"
    src.mkdir()
    good = ['{"id": 1, "v": "a"}', '{"id": 2, "v": "b"}', '{"id": 3, "v": "c"}']
    bad = ['{"id": 4, "v": ', "not json at all"]
    pathlib.Path(src, "part-0.jsonl").write_text(
        "\n".join([good[0], good[1], bad[0], good[2], bad[1]]) + "\n"
    )
    df = (
        spark.read.schema("id BIGINT, v STRING, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(src))
        .cache()
    )
    ok = df.where(F.col("_corrupt_record").isNull())
    dead = df.where(F.col("_corrupt_record").isNotNull())
    dl = str(tmp_path / "dead_letter")
    dead.select("_corrupt_record").write.parquet(dl)
    assert sorted(r["id"] for r in ok.collect()) == [1, 2, 3]
    back = [r["_corrupt_record"] for r in spark.read.parquet(dl).collect()]
    assert sorted(back) == sorted(bad)
    df.unpersist()


def test_xml_file_roundtrip(spark, tmp_path):
    """XML source/sink parity (Spark 4 built-in XML data source): nation
    (strings + ints) survives a write/read cycle with pinned schema and
    exact values — the file-level counterpart of the expression codec
    proven by q_xml_roundtrip."""
    out = str(tmp_path / "nation_xml")
    nation = table(spark, SF_DIR, "nation")
    back = sinks.roundtrip_xml(nation, spark, out)
    assert back.schema == nation.schema
    assert _multiset(back, nation.columns) == _multiset(nation, nation.columns)


def test_xml_file_roundtrip_doubles_and_escapes(spark, tmp_path):
    """The XML file path must preserve shortest-roundtrip doubles and
    escape markup in values, same contract the expression codec pins."""
    src = spark.createDataFrame(
        [(1, "A<B&C", 0.1), (2, 'q"u\'o', 1.0 / 3.0), (3, "plain", 2.5)],
        "id long, s string, p double",
    )
    out = str(tmp_path / "esc_xml")
    back = sinks.roundtrip_xml(src, spark, out)
    assert back.schema == src.schema
    assert _multiset(back, src.columns) == _multiset(src, src.columns)


def test_dynamic_partition_pruning(spark, tmp_path):
    """The partition-layout payoff at join time: a fact table
    partitioned on the join key, joined against a dim with a selective
    predicate, must get a runtime `dynamicpruningexpression` in its
    PartitionFilters — the scan reads ONLY the partitions whose keys
    survive the dim filter, decided at execution from the dim's actual
    rows (at 100 TB: skip years/months wholesale instead of scanning
    and discarding). Caveat discovered while pinning this: Spark's
    PartitionPruning rule requires a LIKELY-SELECTIVE predicate shape
    (equality/IN/LIKE) on the dim side — a bare boolean column filter
    does not qualify and silently falls back to a full scan."""
    out = str(tmp_path / "dpp_fact")
    orders = table(spark, SF_DIR, "orders")
    sinks.write_fact_partitioned(orders, out)
    fact = sinks.read_fact_partitioned(spark, out)
    dim = (
        fact.select("o_year")
        .distinct()
        .withColumn(
            "tag", F.when(F.col("o_year") % 2 == 0, "even").otherwise("odd")
        )
    )
    dim.write.mode("overwrite").parquet(str(tmp_path / "dpp_dim"))
    dimr = spark.read.parquet(str(tmp_path / "dpp_dim"))
    j = (
        fact.join(dimr.where(F.col("tag") == "even"), "o_year")
        .groupBy("o_year")
        .count()
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan, plan
    got = {r["o_year"]: r["count"] for r in j.collect()}
    expect = {
        r["o_year"]: r["count"]
        for r in fact.where(F.col("o_year") % 2 == 0)
        .groupBy("o_year")
        .count()
        .collect()
    }
    assert got == expect and len(got) > 0


def test_bucketed_join_shuffle_free(spark, tmp_path):
    """The co-located-join storage layout: orders and customer written
    bucketed+sorted on the join key with the SAME bucket count must join
    with ZERO Exchange on either side (the shuffle was paid once at
    write time — the 100 TB fact/dimension pattern the dedup-store
    docstrings assume), and the shuffle-free plan must produce exactly
    the same multiset as the plain shuffled join."""
    orders = table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo = sinks.write_bucketed(
            orders, 8, "o_custkey", str(tmp_path / "bo"), "t_skbj_orders"
        )
        bc = sinks.write_bucketed(
            cust, 8, "o_custkey", str(tmp_path / "bc"), "t_skbj_cust"
        )
        j = bo.join(bc, "o_custkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        cols = ["o_orderkey", "o_custkey", "c_name"]
        assert _multiset(j, cols) == _multiset(orders.join(cust, "o_custkey"), cols)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_skbj_orders")
        spark.sql("DROP TABLE IF EXISTS t_skbj_cust")


def test_variant_parquet_roundtrip(spark, tmp_path):
    """VARIANT survives the Parquet storage path as the variant LOGICAL
    TYPE (the shredded binary encoding), not a string or struct
    downgrade: heterogeneous per-row schemas, nested arrays/objects,
    a NULL variant (from a malformed payload via try_parse_json) and
    typed field probes must all read back exactly — the physical half
    of q_variant_extract's open-schema contract."""
    from pyspark.sql.types import VariantType

    rows = [
        (1, '{"k": 4, "s": "x"}'),
        (2, '{"k": 7, "arr": [1, {"deep": true}]}'),
        (3, '{"other": 1.5}'),  # no k: typed probe must be NULL
        (4, None),
        (5, '{"k": 9'),  # malformed: NULL variant via try_parse_json
    ]
    src = spark.createDataFrame(rows, "id long, props string").select(
        "id", F.try_parse_json("props").alias("v")
    )
    out = str(tmp_path / "var_parquet")
    back = sinks.roundtrip_variant(src, spark, out)
    assert isinstance(back.schema["v"].dataType, VariantType)

    def probe(df):
        return df.select(
            "id",
            F.variant_get("v", "$.k", "int").alias("k"),
            F.try_variant_get("v", "$.arr[1].deep", "boolean").alias("deep"),
            F.to_json("v").alias("j"),
        )

    assert _multiset(probe(back), ["id", "k", "deep", "j"]) == _multiset(
        probe(src), ["id", "k", "deep", "j"]
    )
    got = {r["id"]: r for r in probe(back).collect()}
    assert got[1]["k"] == 4 and got[2]["k"] == 7
    assert got[2]["deep"] is True
    assert got[3]["k"] is None and got[3]["j"] == '{"other":1.5}'
    assert got[4]["j"] is None and got[5]["j"] is None
