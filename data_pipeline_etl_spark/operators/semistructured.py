"""Group K — semi-structured interchange: XML codec and VARIANT ingestion.

Two Spark-4-native surfaces a lakehouse ETL engine must cover beyond
JSON (scans.py already proves from_json/to_json/from_csv both ways):

* **XML** — `to_xml` / `from_xml` / the `xpath_*` expression family.
  B2B feeds (EDI bridges, SOAP exports, config dumps) still arrive as
  XML; the engine proves the codec by a full serialize → parse → re-
  aggregate roundtrip whose result is hash-checked against the same
  aggregate over the ORIGINAL columns, so any formatting loss (double
  precision, timestamp formatting, entity escaping) breaks parity.
* **VARIANT** — `parse_json` → `variant_get` / `try_variant_get`, the
  open-schema binary JSON type (Spark 4 / Parquet VARIANT). At 100 TB
  the practical difference vs. string JSON is that the shredded binary
  encoding is parsed ONCE at ingest and field access is a byte-offset
  probe, not a per-row re-parse; here the probes run map-side inside
  the partial aggregate, so only aggregate states ever shuffle.

Scale shape: both operators are single-scan map-side transforms feeding
one partial+final HashAggregate — no joins, no windows; shuffle volume
is |groups|, corpus-size-independent. Float-fold discipline per
llm_similarity.py: double sums round at 2 dp (house convention for
o_totalprice sums) / 6 dp (means) on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_etl_spark.registry import query
from data_pipeline_etl_spark.sources.tables import fanout, table


@query(
    "q_xml_roundtrip",
    oracle="""
    SELECT o_orderstatus AS status,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total,
           CAST(sum(o_orderkey) AS BIGINT) AS sum_k
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML codec proof: serialize each order to an XML document with
    `to_xml`, parse it back with `from_xml`, and aggregate ONLY parsed
    values — serialize + ONE parse per row.

    The oracle aggregates the original columns directly, so the hash
    check proves the roundtrip is lossless for BIGINT (`sum_k` folds the
    parsed keys), VARCHAR (the group key itself) and DOUBLE (Spark
    formats doubles with Java's shortest-roundtrip representation, which
    `from_xml` re-parses bit-exactly — verified, not assumed).

    The xpath-vs-struct two-reader agreement proof that used to run here
    as a third XML pass per row (`xpath_long`, ~1/3 of the codec cost,
    the suite's slowest query two rounds running — VERDICT r14 item 1)
    now lives in tests/test_planted_ops.py::test_xml_two_readers_agree,
    where it checks every row of the sf0.001 fixture once per suite run
    instead of re-parsing the corpus in every bench.

    Scale: per-row codec work is map-side, followed by one
    |status|-group aggregate — the plan a 100 TB XML-interchange
    validation pass wants: no second scan, no join, shuffle carries only
    partial aggregate states. The StAX serialize/parse pair is the cost
    (~60 us/row, far above codegen'd expressions), so the input takes
    the fanout() parallelism floor: a single-row-group local fixture
    scans as ONE task, which serialized the whole codec behind one core
    (measured 8.96 s at sf0.1 -> 1.6-1.7 s warm fanned out); at cluster
    scale multi-split layouts make fanout() a no-op.
    """
    o = fanout(table(spark, sf_dir, "orders"))
    xml = F.to_xml(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("s"),
            F.col("o_totalprice").alias("p"),
        )
    )
    docs = o.select(xml.alias("doc"))
    parsed = docs.select(F.from_xml("doc", "k BIGINT, s STRING, p DOUBLE").alias("r"))
    return (
        parsed.groupBy(F.col("r.s").alias("status"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("r.p"), 2).alias("total"),
            F.sum("r.k").alias("sum_k"),
        )
    )


@query(
    "q_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           round(avg(k), 6) AS avg_k,
           CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k,
           CAST(sum(CASE WHEN missing IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_absent
    FROM (
      SELECT event_type,
             CASE WHEN json_valid(props)
                  THEN TRY_CAST(json_extract(props, '$.k') AS INTEGER) END AS k,
             CASE WHEN json_valid(props)
                  THEN json_extract(props, '$.missing') END AS missing
      FROM events
    )
    GROUP BY event_type
    """,
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-schema ingestion through the VARIANT type: `try_parse_json`
    the event properties ONCE into a variant column, carry the variant
    through the groupBy shuffle, and probe every field with
    `try_variant_get` — NULL instead of throwing on BOTH failure axes a
    schemaless 100 TB event firehose has: a field that is absent
    (`$.missing`) and a field that is present but not castable to the
    probe type (`$.k` carrying a non-numeric string).

    `try_parse_json` (not strict `parse_json`) is the parse-side half of
    the same contract (ADVICE r13): a genuinely malformed payload — a
    producer bug, a truncated write — becomes a NULL variant whose field
    probes are NULL (counted in `n`, excluded from sum/avg/distinct)
    instead of erroring the scan and killing the whole ingest job.
    `try_variant_get` for `$.k` is the cast-side half (ADVICE r14): a
    VALID payload like `{"k": "oops"}` yields a NULL probe, not a scan
    error. The oracle mirrors both in lockstep: a `json_valid` guard for
    the parse axis, `TRY_CAST` for the cast axis (DuckDB's plain CAST of
    JSON '"oops"' errors exactly like strict variant_get did). The
    planted test feeds a truncated-JSON row AND a valid-but-uncastable
    row through both paths. One asymmetry stays out of scope by
    construction: a NUMERIC STRING payload (`{"k": "12"}`) casts to 12
    under both engines' string->int rules, so it exercises nothing — the
    planted rows use a non-numeric string where both sides agree on
    NULL.

    Contrast with q_events_enrich (scans.py), which re-parses the JSON
    string per access via get_json_object: VARIANT is decoded to the
    shredded binary form at scan time, so each field probe afterwards is
    an offset lookup. At 100 TB that is the difference between one parse
    per row and one parse per row PER FIELD.

    Scale: single events scan, map-side parse, one partial+final
    HashAggregate on |event_type| groups; the distinct-count adds the
    standard two-level expand+agg, still keyed on the same column. The
    int sum is exact (int64); the mean rounds at 6 dp on both engines.
    """
    e = table(spark, sf_dir, "events")
    v = e.select("event_type", F.try_parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "int")
    absent = F.try_variant_get("v", "$.missing", "string")
    return (
        v.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).cast("bigint").alias("sum_k"),
            F.round(F.avg(k), 6).alias("avg_k"),
            F.countDistinct(k).alias("n_distinct_k"),
            F.sum(F.when(absent.isNull(), F.lit(1)).otherwise(0)).alias("n_absent"),
        )
    )
