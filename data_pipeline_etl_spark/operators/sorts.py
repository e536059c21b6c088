"""Group F — sorts / limits / top-k (SURVEY.md §2.F).

``orderBy().limit(k)`` plans as TakeOrderedAndProject: each partition keeps
its local top-k and only k rows per partition reach the driver-side merge —
no global sort materialization even at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_etl_spark.registry import query
from data_pipeline_etl_spark.sources.tables import table


@query(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by total price with key tiebreak (deterministic)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
