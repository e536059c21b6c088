"""Reshape operators: pivot / unpivot (melt) — the wide<->long transforms
of the reference's reporting/staging layer, Spark-native.

Scale notes: pivot with an explicit value list is a single partial+final
aggregate (one shuffle, |groups| rows); never call pivot without the value
list at scale — the implicit distinct-scan is a second full pass. Unpivot
is a zero-shuffle Expand (each input row fans out to k output rows
map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_etl_spark.registry import query
from data_pipeline_etl_spark.sources.tables import table


@query(
    "q_pivot",
    oracle="""
    SELECT o_orderpriority,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_F,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_O,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts to one column per status (explicit value list)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_F"),
            F.coalesce("O", F.lit(0)).alias("n_O"),
            F.coalesce("P", F.lit(0)).alias("n_P"),
        )
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT l_returnflag, metric,
           count(*) AS n,
           round(sum(val), 4) AS total,
           round(avg(val), 6) AS mean
    FROM (
      SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
    )
    GROUP BY l_returnflag, metric
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt three measure columns into (metric, val) long form + rollup.

    unpivot is a map-side Expand (zero shuffle); the aggregate on top
    bounds the result to |flags|x|metrics| rows regardless of input size.
    """
    l = table(spark, sf_dir, "lineitem")
    melted = l.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "val",
    )
    return melted.groupBy("l_returnflag", "metric").agg(
        F.count("*").alias("n"),
        F.round(F.sum("val"), 4).alias("total"),
        F.round(F.avg("val"), 6).alias("mean"),
    )
