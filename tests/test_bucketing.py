"""Bucketed co-located join (SCALE.md: the fact⋈fact shuffle eliminator).

At 100 TB the lineitem⋈orders shuffle is the dominant cost; bucketing both
tables on the join key at load time removes the exchange entirely. This
test materializes bucketed copies of the fixture tables and asserts the
join plan is exchange-free while producing identical results.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from data_pipeline_etl_spark.sources.tables import table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # spark.sql.warehouse.dir is a static conf — bucketed tables land in
    # ./spark-warehouse (gitignored) and are dropped on teardown.
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    (
        table(spark, SF_DIR, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .format("parquet")
        .mode("overwrite")
        .saveAsTable("li_b")
    )
    (
        table(spark, SF_DIR, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .format("parquet")
        .mode("overwrite")
        .saveAsTable("ord_b")
    )
    yield spark.table("li_b"), spark.table("ord_b")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def _agg(li, ords):
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n"),
        )
    )


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li, ords = bucketed
    # disable auto-broadcast so the join must exploit bucketing, as it
    # would for two large fact tables on a cluster
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(ords, li.l_orderkey == ords.o_orderkey).select(
            "l_orderkey", "o_orderstatus"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing co-locates both sides
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_same_results(spark, bucketed):
    li, ords = bucketed
    base = _agg(table(spark, SF_DIR, "lineitem"), table(spark, SF_DIR, "orders"))
    b = _agg(li, ords)
    assert sorted(map(tuple, b.collect())) == sorted(map(tuple, base.collect()))
