"""Sink round-trip tests (SURVEY.md §2.A tests-only rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_etl_spark.sources import sinks
from data_pipeline_etl_spark.sources.tables import table
from tests.conftest import SF_DIR


def _multiset(df, cols):
    from collections import Counter

    return Counter(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def test_partitioned_write_roundtrip(spark, tmp_path):
    out = str(tmp_path / "fact")
    orders = table(spark, SF_DIR, "orders")
    sinks.write_fact_partitioned(orders, out)
    back = sinks.read_fact_partitioned(spark, out)
    assert back.count() == orders.count()
    # partition layout: year/month directories exist and prune correctly
    pruned = back.where((F.col("o_year") == 1997) & (F.col("o_month") == 3))
    expect = orders.where(
        (F.year("o_orderdate") == 1997) & (F.month("o_orderdate") == 3)
    ).count()
    assert pruned.count() == expect
    # partition pruning reaches the scan: only the matching directory is read
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_csv_roundtrip(spark, tmp_path):
    out = str(tmp_path / "csv")
    cust = table(spark, SF_DIR, "customer")
    back = sinks.roundtrip_csv(cust, spark, out)
    assert back.schema == cust.schema
    assert _multiset(back, cust.columns) == _multiset(cust, cust.columns)


def test_json_roundtrip(spark, tmp_path):
    out = str(tmp_path / "json")
    nation = table(spark, SF_DIR, "nation")
    back = sinks.roundtrip_json(nation, spark, out)
    assert back.schema == nation.schema
    assert _multiset(back, nation.columns) == _multiset(nation, nation.columns)


def test_orc_roundtrip(spark, tmp_path):
    """ORC source/sink parity with the parquet-loaded table: Spark's
    second built-in columnar format preserves values and the NTZ
    timestamp discipline (cluster deployments mixing warehouse formats
    must read back identically)."""
    out = str(tmp_path / "orders_orc")
    orders = table(spark, SF_DIR, "orders")
    orders.write.orc(out)
    back = spark.read.orc(out)
    assert back.schema == orders.schema
    cols = ["o_orderkey", "o_totalprice", "o_orderdate", "o_orderstatus"]
    assert _multiset(back, cols) == _multiset(orders, cols)
