"""Warehouse-pattern operators: SCD-2 history, SQL CTE entry point,
correlated subqueries — the reference genre's dimension-management and
reporting-SQL surface, Spark-native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_etl_spark.registry import query
from data_pipeline_etl_spark.sources.tables import table


@query(
    "q_scd2",
    oracle="""
    WITH daily AS (
      SELECT o_custkey, o_orderdate, o_totalprice FROM (
        SELECT o_custkey, o_orderdate, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    )
    SELECT o_custkey,
           o_orderdate AS valid_from,
           coalesce(lead(o_orderdate) OVER w, TIMESTAMP '2099-12-31 00:00:00') AS valid_to,
           o_totalprice AS state_price,
           CAST(lead(o_orderdate) OVER w IS NULL AS BOOLEAN) AS is_current
    FROM daily
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: effective-dated state rows.

    Each customer's *last* order per day is a state change (collapsing
    same-day orders first — otherwise ties produce degenerate
    valid_from == valid_to rows, caught by an interval-invariant probe);
    valid_to is the next change's date, open-ended 2099 sentinel for the
    current row (9999-12-31 overflows pandas datetime64[ns] on collect).
    Two window passes over the same partitioning — one shuffle, no
    self-join: the scalable SCD-2 build.
    """
    o = table(spark, sf_dir, "orders")
    dayw = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.desc("o_orderkey"))
    daily = (
        o.withColumn("rn", F.row_number().over(dayw))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderdate", "o_totalprice")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    nxt = F.lead("o_orderdate").over(w)
    return daily.select(
        "o_custkey",
        F.col("o_orderdate").alias("valid_from"),
        F.coalesce(nxt, F.lit("2099-12-31").cast("timestamp_ntz")).alias("valid_to"),
        F.col("o_totalprice").alias("state_price"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "q_sql_cte",
    oracle="""
    WITH seg_stats AS (
      SELECT c_mktsegment, round(avg(c_acctbal), 6) AS seg_avg
      FROM customer GROUP BY c_mktsegment
    ),
    flagged AS (
      SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal, s.seg_avg
      FROM customer c JOIN seg_stats s ON c.c_mktsegment = s.c_mktsegment
    )
    SELECT c_mktsegment,
           count(CASE WHEN c_acctbal > seg_avg THEN 1 END) AS n_above,
           count(*) AS n_total
    FROM flagged
    GROUP BY c_mktsegment
    """,
)
def q_sql_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL entry point with chained CTEs (identical text on both engines)."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_cte_v")
    return spark.sql(
        """
        WITH seg_stats AS (
          SELECT c_mktsegment, round(avg(c_acctbal), 6) AS seg_avg
          FROM customer_cte_v GROUP BY c_mktsegment
        ),
        flagged AS (
          SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal, s.seg_avg
          FROM customer_cte_v c JOIN seg_stats s ON c.c_mktsegment = s.c_mktsegment
        )
        SELECT c_mktsegment,
               count(CASE WHEN c_acctbal > seg_avg THEN 1 END) AS n_above,
               count(*) AS n_total
        FROM flagged
        GROUP BY c_mktsegment
        """
    )


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
                       WHERE i.c_nationkey = c.c_nationkey)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Catalyst decorrelates to an agg+join)."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_sub_v")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer_sub_v c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_sub_v i
                           WHERE i.c_nationkey = c.c_nationkey)
        """
    )


@query(
    "q_cdc_compact",
    oracle="""
    WITH ranked AS (
      SELECT user_id, ts, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_versions
      FROM events
    )
    SELECT user_id, CAST(n_versions AS BIGINT) AS n_versions,
           ts AS last_ts, event_type AS last_type, value AS last_value
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
)
def q_cdc_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog compaction (latest-wins merge): collapse the event
    stream to each key's current state, treating 'error' as the
    tombstone op — a key whose newest entry is a tombstone is absent
    from the compacted output. The merge-on-read -> compact step of the
    Delta/Hudi/Iceberg upsert genre, expressed engine-side.

    Plan: ONE aggregate with max(struct(ts, event_id, payload...)) —
    (ts, event_id) leads the struct, and event_id is unique, so the
    lexicographic max IS the deterministic latest row. The aggregate
    combines map-side: every mapper keeps one candidate struct per key,
    so the single shuffle carries ~|keys| rows per mapper, NOT the
    changelog — the window formulation the oracle uses for clarity
    would instead shuffle and sort every version of every key
    (row_number has no partial phase). The tombstone filter runs after
    the aggregate: it must see the final winner, not pre-filter the
    stream (an 'error'-last key would wrongly resurrect its previous
    version). At warehouse scale this is the plan a nightly table
    compaction wants: linear scan, one exchange keyed on the merge key,
    output bounded by live keys.
    """
    e = table(spark, sf_dir, "events")
    last = e.groupBy("user_id").agg(
        F.count("*").alias("n_versions"),
        F.max(F.struct("ts", "event_id", "event_type", "value")).alias("last"),
    )
    return last.where(F.col("last.event_type") != "error").select(
        "user_id",
        "n_versions",
        F.col("last.ts").alias("last_ts"),
        F.col("last.event_type").alias("last_type"),
        F.col("last.value").alias("last_value"),
    )


@query(
    "q_rollup_incremental",
    oracle="""
    WITH state AS (
      SELECT o_orderpriority, round(sum(o_totalprice), 4) AS s,
             CAST(count(*) AS BIGINT) AS n, max(o_orderdate) AS hi
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY o_orderpriority
    ),
    delta AS (
      SELECT o_orderpriority, round(sum(o_totalprice), 4) AS s,
             CAST(count(*) AS BIGINT) AS n, max(o_orderdate) AS hi
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      GROUP BY o_orderpriority
    ),
    both_halves AS (
      SELECT * FROM state UNION ALL SELECT * FROM delta
    )
    SELECT o_orderpriority,
           round(sum(s), 4) AS total_price,
           CAST(sum(n) AS BIGINT) AS n_orders,
           round(sum(s) / sum(n), 6) AS avg_price,
           max(hi) AS last_orderdate
    FROM both_halves GROUP BY o_orderpriority
    """,
)
def q_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: merge an incumbent aggregate
    STATE table with a new partition's delta aggregate — without
    re-aggregating the incumbent's raw rows. The nightly-load pattern
    for any additive rollup: keep (sum, count, max) per key, aggregate
    only the arriving partition, merge by summing sums / summing
    counts / maxing maxes; non-mergeable reports (avg here) are derived
    from the merged state at read time, never stored.

    Both halves come from the fixture in this declared form (there is
    no persisted state table to read), but the plan IS the incremental
    shape: two partition-pruned scans (the date predicates push to the
    parquet scan), each collapsed to a |keys|-row state frame map-side,
    then a |keys|-sized union + re-aggregate — the merge step a real
    deployment runs against a stored state table costs exactly the
    second stage, which is corpus-size-independent. The same
    decomposition is why sum/count/min/max/approx-sketches stream and
    avg/stddev must be derived: only mergeable state survives
    incremental maintenance. Sums are rounded at 4 dp pre-merge on
    both engines (the state table stores rounded doubles; merging
    rounded state is deterministic), the derived avg at 6 dp.
    """
    o = table(spark, sf_dir, "orders")
    split = F.lit("1997-01-01").cast("timestamp")

    def half(pred):
        return (
            o.where(pred)
            .groupBy("o_orderpriority")
            .agg(
                F.round(F.sum("o_totalprice"), 4).alias("s"),
                F.count("*").alias("n"),
                F.max("o_orderdate").alias("hi"),
            )
        )

    merged = half(F.col("o_orderdate") < split).unionByName(
        half(F.col("o_orderdate") >= split)
    )
    return merged.groupBy("o_orderpriority").agg(
        F.round(F.sum("s"), 4).alias("total_price"),
        F.sum("n").alias("n_orders"),
        F.round(F.sum("s") / F.sum("n"), 6).alias("avg_price"),
        F.max("hi").alias("last_orderdate"),
    )
