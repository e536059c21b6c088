"""Group G — set operations (SURVEY.md §2.G).

Spark's ``intersect``/``subtract`` implement SQL's distinct set semantics
(matching DuckDB's INTERSECT / EXCEPT); ``unionByName`` is UNION ALL by
column name. All three shuffle on the full row — at scale prefer keyed
semi/anti joins where only a key column matters (cf. q_join_semi/anti).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_etl_spark.registry import query
from data_pipeline_etl_spark.sources.tables import table


@query(
    "q_set_union",
    oracle="""
    SELECT tag, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM (
      SELECT o_custkey, 'urgent' AS tag, o_totalprice
      FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_custkey, 'low' AS tag, o_totalprice
      FROM orders WHERE o_orderpriority = '5-LOW'
    )
    GROUP BY tag
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two filtered projections + aggregate."""
    o = table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey", F.lit("urgent").alias("tag"), "o_totalprice"
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        "o_custkey", F.lit("low").alias("tag"), "o_totalprice"
    )
    return (
        urgent.unionByName(low)
        .groupBy("tag")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@query(
    "q_set_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ordering in both 1996 and 1997 (distinct intersection)."""
    o = table(spark, sf_dir, "orders")

    def year_custs(y0: str, y1: str) -> DataFrame:
        return o.filter(
            (F.col("o_orderdate") >= F.lit(y0).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(y1).cast("timestamp_ntz"))
        ).select("o_custkey")

    return year_custs("1996-01-01", "1997-01-01").intersect(
        year_custs("1997-01-01", "1998-01-01")
    )


@query(
    "q_set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers minus those with a finalized order (distinct EXCEPT)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    finalized = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.select("c_custkey").subtract(finalized)


@query(
    "q_set_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with distinct semantics (union + dropDuplicates)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.unionByName(b).distinct()


@query(
    "q_union_schema_evolution",
    oracle="""
    SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority,
           'v1' AS src_ver
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_totalprice, o_orderpriority, 'v2' AS src_ver
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: merge an old-schema extract (no priority
    column) with a new-schema extract, NULL-filling the missing column.

    ``unionByName(allowMissingColumns=True)`` is the multi-source staging
    pattern when upstream schemas drift — name-based alignment, not
    positional, so reordered or added columns never silently mis-map.
    """
    o = table(spark, sf_dir, "orders")
    v1 = (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
        .withColumn("src_ver", F.lit("v1"))
    )
    v2 = (
        o.filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .withColumn("src_ver", F.lit("v2"))
    )
    return v1.unionByName(v2, allowMissingColumns=True).select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "src_ver"
    )
