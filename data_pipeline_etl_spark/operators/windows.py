"""Group E — window functions (SURVEY.md §2.E).

Every window here partitions on a key before ordering, so execution is one
hash shuffle + per-partition sort — no global sort, no driver collection.
All orderings carry a unique-key tiebreak for determinism. Timestamp deltas
are computed in epoch microseconds (exact integers on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_etl_spark.registry import query
from data_pipeline_etl_spark.sources.tables import table


@query(
    "q_win_topn",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 2
    """,
)
def q_win_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer by price, deterministic key tiebreak."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .withColumn("rn", F.col("rn").cast("long"))
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "q_win_rank",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderpriority)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank with real ties (priority has 5 values)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@query(
    "q_win_pct_dist",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderpriority)
    """,
)
def q_win_pct_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist — relative-position window statistics.

    Both engines compute the textbook definitions ((rank-1)/(n-1) and
    rows<=current/n) as one float64 division, so 6-dp rounding hashes
    identically. Same single-shuffle window profile as q_win_rank.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "q_win_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS delta_us,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event deltas (µs) + next event type."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    um = F.unix_micros(F.col("ts").cast("timestamp"))
    return e.select(
        "user_id",
        "event_id",
        (um - F.lag(um).over(w)).alias("delta_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "q_win_moving",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg
    FROM orders
    """,
)
def q_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average per customer over order time."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", F.round(F.avg("o_totalprice").over(w), 6).alias("mov_avg")
    )


@query(
    "q_win_range_frame",
    oracle="""
    SELECT o_orderstatus, o_orderkey, o_totalprice,
           count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_in_range
    FROM orders
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range frame: orders within $1000 below the current price."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return o.select(
        "o_orderstatus",
        "o_orderkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_in_range"),
    )


@query(
    "q_win_cumulative",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_total
    FROM orders
    """,
)
def q_win_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue total per customer (sequential fold — deterministic)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 4).alias("run_total"),
    )


@query(
    "q_win_ntile",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist()    OVER w, 6) AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles + percent_rank + cume_dist per market segment."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "q_win_firstlast",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth order value per customer over the full partition
    frame (the latest-record-lookup pattern of the reference's dims)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "q_win_gaps_islands",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn_all,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn_type
      FROM events
    )
    SELECT user_id, event_type,
           count(*) AS streak_len,
           min(ts) AS streak_start
    FROM seq
    GROUP BY user_id, event_type, rn_all - rn_type
    HAVING count(*) >= 3
    """,
)
def q_win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: runs of >=3 consecutive same-type events per user.

    The classic streak detector: two row_numbers whose difference is
    constant within a run — both windows share one shuffle on user_id,
    and the island key (rn_all - rn_type) feeds a plain aggregate. No
    self-join, no iteration; state is one partition's sort.
    """
    e = table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("island"),
    )
    return (
        seq.groupBy("user_id", "event_type", "island")
        .agg(F.count("*").alias("streak_len"), F.min("ts").alias("streak_start"))
        .where(F.col("streak_len") >= 3)
        .drop("island")
    )


@query(
    "q_win_share",
    oracle="""
    WITH rev AS (
      SELECT n.n_name,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name,
           round(revenue, 4) AS revenue,
           round(revenue / sum(revenue) OVER (), 6) AS share
    FROM rev
    """,
)
def q_win_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of total revenue.

    The grand total comes from a one-row aggregate broadcast back onto the
    25-row group frame (same shape as q_text_tfidf's corpus-size join) —
    no keyless window anywhere, so no single-task WindowExec and no
    "No Partition Defined" warning at any scale. The oracle keeps DuckDB's
    idiomatic `sum() OVER ()`; both compute the same double.
    """
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    total = rev.agg(F.sum("revenue").alias("total_rev"))
    return rev.crossJoin(F.broadcast(total)).select(
        "n_name",
        F.round("revenue", 4).alias("revenue"),
        F.round(F.col("revenue") / F.col("total_rev"), 6).alias("share"),
    )


@query(
    "q_win_distinct_rolling",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT d AS day FROM ud)
    SELECT days.day, count(DISTINCT ud.user_id) AS actives_7d
    FROM days JOIN ud
      ON ud.d BETWEEN days.day - INTERVAL 6 DAY AND days.day
    GROUP BY days.day
    """,
)
def q_win_distinct_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per observed day — the DAU/WAU
    engagement staple, computed EXACTLY without a distinct-over-window
    (Spark has none) and without per-day user sets.

    Scale shape: COUNT(DISTINCT) over a sliding frame is re-expressed as
    a coverage-interval explode. Dedup to (user, day) rows (one shuffle,
    map-side combine); per user, each active day covers target days
    [d, min(d+6, next_active-1)] — only the user's MOST RECENT activity
    covers a target day, so each (user, target-day) pair appears exactly
    once and a plain count per target day is the distinct count. The
    per-user lead() is a second shuffle on user_id; the explode emits at
    most 7 rows per active day (bounded fan-out, no giant collect_set
    whose per-day set would be hundreds of millions at 100 TB). Final
    inner join restricts to observed days (broadcast-sized frame:
    |days|).
    """
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("timestamp_ntz")
    ud = e.select(day.alias("d"), "user_id").distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    horizon = F.col("d") + F.expr("INTERVAL 6 DAY")
    covered = (
        ud.withColumn("nxt", F.lead("d").over(w))
        .select(
            F.explode(
                F.sequence(
                    F.col("d"),
                    F.least(
                        horizon,
                        F.coalesce(
                            F.col("nxt") - F.expr("INTERVAL 1 DAY"), horizon
                        ),
                    ),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("day"),
        )
    )
    counts = covered.groupBy("day").agg(F.count("*").alias("actives_7d"))
    obs_days = ud.select(F.col("d").alias("day")).distinct()
    return counts.join(F.broadcast(obs_days), "day", "inner").select(
        "day", "actives_7d"
    )


@query(
    "q_win_moving_median",
    oracle="""
    SELECT event_id, event_type, value,
           median(value) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS med7
    FROM events
    """,
)
def q_win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row moving MEDIAN per feed — the robust-smoothing twin
    of q_win_moving's mean (a median shrugs off the single spike that
    drags a mean).

    Spark has no median-over-window; the frame is materialized with
    collect_list over the same ROWS frame (bounded: ≤7 doubles per row,
    constant state regardless of corpus size), sorted, and the middle
    element(s) picked — (a+b)/2 for even counts, exactly DuckDB's
    interpolating median at 0.5. One shuffle on event_type + partition
    sort, same cost shape as any other windowed query here.
    """
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    arr = F.sort_array(F.collect_list("value").over(w))
    n = F.size(arr)
    odd = F.element_at(arr, ((n + 1) / 2).cast("int"))
    even = (
        F.element_at(arr, (n / 2).cast("int"))
        + F.element_at(arr, (n / 2 + 1).cast("int"))
    ) / 2.0
    return e.select(
        "event_id",
        "event_type",
        "value",
        F.when(n % 2 == 1, odd).otherwise(even).alias("med7"),
    )
