"""Group A — scans / sources (SURVEY.md §2.A).

Scale notes: both queries are scan→project pipelines; Catalyst pushes the
column projection into the parquet reader (ReadSchema pruning) and the JSON
parse stays inside whole-stage codegen (from_json is a JVM expression, not
a Python UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_etl_spark.registry import query
from data_pipeline_etl_spark.sources.tables import table


@query(
    "q_scan_project",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS nation_key,
           upper(n_name)               AS nation_name,
           r_name                      AS region_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dimension scan with projection, rename and cast."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return n.join(r, n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").cast("long").alias("nation_key"),
        F.upper("n_name").alias("nation_name"),
        F.col("r_name").alias("region_name"),
    )


@query(
    "q_json_ingest",
    oracle="""
    SELECT event_id,
           event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
    """,
)
def q_json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the semi-structured JSON ``props`` column into typed columns."""
    e = table(spark, sf_dir, "events")
    parsed = e.select(
        "event_id",
        "event_type",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )
    return parsed.where(F.col("k") >= 50)


@query(
    "q_csv_ingest",
    oracle="""
    WITH raw AS (
      SELECT concat_ws(',', CAST(event_id AS VARCHAR), CAST(user_id AS VARCHAR),
                       event_type, strftime(ts, '%Y-%m-%d %H:%M:%S')) AS line
      FROM events
    ), parsed AS (
      SELECT string_split(line, ',') AS p FROM raw
    )
    SELECT CAST(p[1] AS BIGINT)    AS event_id,
           CAST(p[2] AS BIGINT)    AS user_id,
           p[3]                    AS event_type,
           CAST(p[4] AS TIMESTAMP) AS ts_parsed
    FROM parsed
    WHERE p[3] IN ('click', 'purchase')
    """,
)
def q_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw CSV-line ingestion through ``from_csv`` with an explicit schema.

    The §2.A interchange path made driver-visible without temp files: a
    deterministic CSV line is synthesized from events (identically on both
    engines — integer keys, an enum string, a second-truncated timestamp;
    no raw doubles, whose string formatting is engine-specific), then
    parsed back through Spark's ``from_csv`` — a JVM expression inside
    whole-stage codegen, not a Python csv reader — while the oracle parses
    the same line with DuckDB ``string_split`` + casts. The post-parse
    predicate proves the parsed columns are real (filterable) columns.

    At 100 TB this is the schema-on-read pattern for text landing zones:
    the parse is per-row, pipelined, and shuffle-free; malformed rows
    surface as NULLs (PERMISSIVE mode) rather than job failures.
    """
    e = table(spark, sf_dir, "events")
    line = F.concat_ws(
        ",",
        F.col("event_id").cast("string"),
        F.col("user_id").cast("string"),
        F.col("event_type"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
    )
    parsed = e.select(
        F.from_csv(
            line,
            "event_id BIGINT, user_id BIGINT, event_type STRING, ts_parsed TIMESTAMP_NTZ",
        ).alias("r")
    ).select("r.*")
    return parsed.where(F.col("event_type").isin("click", "purchase"))


@query(
    "q_json_build",
    oracle="""
    SELECT o_orderkey,
           to_json(struct_pack(k := o_orderkey,
                               s := o_orderstatus,
                               p := o_totalprice,
                               tags := [o_orderpriority, o_orderstatus]))::VARCHAR AS doc
    FROM orders
    """,
)
def q_json_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize rows to JSON documents (nested struct + array).

    The write side of the reference's JSON interchange; both engines
    produce byte-identical compact JSON (verified including double
    formatting), so the string itself is hash-checked.
    """
    o = table(spark, sf_dir, "orders")
    doc = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("s"),
            F.col("o_totalprice").alias("p"),
            F.array(F.col("o_orderpriority"), F.col("o_orderstatus")).alias("tags"),
        )
    )
    return o.select("o_orderkey", doc.alias("doc"))


@query(
    "q_events_enrich",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           CAST(hour(ts) AS BIGINT)          AS ev_hour,
           CAST(dayofweek(ts) + 1 AS BIGINT) AS ev_dow,
           round(value, 4)                   AS value_r,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT)                   AS seq_no
    FROM events
    """,
)
def q_events_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite event enrichment — the reference's log-transform step in
    one pass: JSON parse + time-dimension derivation + per-user sequence
    numbering. One window shuffle on user_id; everything else per-row."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.from_json("props", "k INT").getField("k").alias("k"),
        F.hour("ts").cast("long").alias("ev_hour"),
        F.dayofweek("ts").cast("long").alias("ev_dow"),
        F.round("value", 4).alias("value_r"),
        F.row_number().over(w).cast("long").alias("seq_no"),
    )
