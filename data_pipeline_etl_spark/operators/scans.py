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
