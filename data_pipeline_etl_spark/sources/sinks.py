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
