"""End-to-end ETL pipeline test (reference lifecycle analog, SURVEY.md §3.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_etl_spark.plans import pipeline
from data_pipeline_etl_spark.sources.tables import table
from tests.conftest import SF_DIR


def test_full_etl_run(spark, tmp_path):
    out = str(tmp_path / "warehouse")
    counts = pipeline.run_etl(spark, SF_DIR, out)
    n_cust = table(spark, SF_DIR, "customer").count()
    n_orders = table(spark, SF_DIR, "orders").count()
    assert counts["customer_dim"] == n_cust
    assert counts["order_fact"] == n_orders
    n_dates = table(spark, SF_DIR, "orders").select("o_orderdate").distinct().count()
    assert counts["time_dim"] == n_dates

    # fact measures reconcile with the source
    fact = spark.read.parquet(f"{out}/order_fact")
    src_rev = (
        table(spark, SF_DIR, "lineitem")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2))
        .collect()[0][0]
    )
    fact_rev = fact.agg(F.round(F.sum("revenue"), 2)).collect()[0][0]
    assert abs(fact_rev - src_rev) < 1.0  # per-order rounding to 4dp accumulates

    # partition layout prunes
    pruned = fact.where(F.col("o_year") == 1997)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_dq_gate_catches_violations(spark, tmp_path):
    """Corrupt staging data must fail the quality gate (orphan FK)."""
    import pytest
    from data_pipeline_etl_spark.operators import quality
    from data_pipeline_etl_spark.sources import tables

    bad_dir = str(tmp_path / "bad_sf")
    for t in ("orders", "customer", "lineitem"):
        df = table(spark, SF_DIR, t)
        if t == "orders":
            # point some orders at a customer that doesn't exist
            df = df.withColumn(
                "o_custkey",
                F.when(F.col("o_orderkey") % 100 == 0, F.lit(999999999)).otherwise(
                    F.col("o_custkey")
                ),
            )
        df.write.mode("overwrite").parquet(f"{bad_dir}/{t}.parquet")

    checks = {r["check_name"]: r["n_bad"] for r in quality.q_dq_checks(spark, bad_dir).collect()}
    assert checks["orders_orphan_custkey"] > 0
    assert checks["customer_dup_pk"] == 0
