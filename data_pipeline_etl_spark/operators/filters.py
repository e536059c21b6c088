"""Group B — projections / filters / predicates (SURVEY.md §2.B).

All predicates here are Catalyst-pushable: ``.explain`` shows them in
``PushedFilters`` on the parquet scan, with ReadSchema pruned to the
referenced columns. Per-row double arithmetic (q_project_expr) is left
UNROUNDED: identical expression trees evaluate bit-identically on both
engines, whereas decimal rounding of boundary values is engine-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_etl_spark.registry import query
from data_pipeline_etl_spark.sources.tables import table


@query(
    "q_filter_range",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
    """,
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: date range + BETWEEN + < predicates, single agg."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 25)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q_project_expr",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projection; bit-deterministic per-row double arithmetic."""
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
    )


@query(
    "q_filter_in_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_type LIKE 'PROMO%'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
      AND p_brand NOT IN ('Brand#1', 'Brand#2')
    """,
)
def q_filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + LIKE prefix + negated IN."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
        & ~F.col("p_brand").isin("Brand#1", "Brand#2")
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@query(
    "q_case_bucket",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice BETWEEN 50000 AND 150000 THEN 'medium'
                ELSE 'large' END AS bucket,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           count(*) AS n
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_case_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / BETWEEN / coalesce / nullif bucketing + count."""
    o = table(spark, sf_dir, "orders")
    bucket = F.expr(
        "CASE WHEN o_totalprice < 50000 THEN 'small' "
        "WHEN o_totalprice BETWEEN 50000 AND 150000 THEN 'medium' "
        "ELSE 'large' END"
    ).alias("bucket")
    status_norm = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
        "status_norm"
    )
    return o.select(bucket, status_norm).groupBy("bucket", "status_norm").agg(
        F.count("*").alias("n")
    )
