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


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join: the hot key's oversized shuffle partition must be
    SPLIT at runtime (SortMergeJoin(skew=true) + 'AQEShuffleRead ...
    skewed' in the final adaptive plan) — the zero-code-change
    counterpart to salted_join for when skew is discovered at runtime
    rather than known up front. Thresholds are scaled down to fixture
    size; on a cluster the defaults (256MB / factor 5) play the same
    role. Results are unaffected: the split partitions re-join the same
    rows (count pinned)."""
    saved = {}
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    for k, v in confs.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        hot = spark.range(200_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(200_000).select(
            F.col("id").alias("dk"), (F.col("id") * 2).alias("dv")
        )
        j = hot.join(dim, hot.k == dim.dk)
        # materialize WITHOUT a downstream shuffle: skew splitting is
        # skipped when it would break a later stage's partitioning
        j.foreach(lambda r: None)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan
        assert j.count() == 200_000
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
