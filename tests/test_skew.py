"""Salted-join equivalence: structural skew mitigation must not change
results (SCALE.md)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_etl_spark.operators.skew import salted_join
from data_pipeline_etl_spark.sources.tables import table
from tests.conftest import SF_DIR


def _multiset(df):
    from collections import Counter

    return Counter(tuple(str(v) for v in r) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    l = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderstatus")
    plain = l.join(o, l.l_orderkey == o.o_orderkey)
    salted = salted_join(l, o, "l_orderkey", "o_orderkey", n_salts=4)
    assert _multiset(salted.select(*plain.columns)) == _multiset(plain)


def test_salted_join_on_synthetic_hot_key(spark):
    """90% of rows share one key — the canonical straggler scenario."""
    hot = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(10_000).select(F.col("id").alias("dk"), (F.col("id") * 2).alias("dv"))
    plain = hot.join(dim, hot.k == dim.dk)
    salted = salted_join(hot, dim, "k", "dk", n_salts=8)
    assert salted.count() == plain.count()
    assert _multiset(salted.select("k", "v", "dv")) == _multiset(plain.select("k", "v", "dv"))
    # the whole-row salt spreads the hot key's rows across buckets
    spread = (
        hot.withColumn("s", F.abs(F.hash(F.col("k"), F.col("v"), F.lit("salt"))) % 8)
        .where(F.col("k") == 7)
        .select("s")
        .distinct()
        .count()
    )
    assert spread == 8  # the straggler task is now 8 tasks
