"""Group C — joins (SURVEY.md §2.C).

Scale notes (100 TB design point):
- dimension joins (nation/region/supplier/part) are broadcast-able; the
  planner picks BroadcastHashJoin automatically under the 10 MB threshold
  and ``q_join_broadcast`` pins it explicitly for the regression test;
- fact⋈fact joins (lineitem⋈orders) shuffle on the join key — at cluster
  scale pre-bucket both tables on orderkey to eliminate the exchange;
- the theta/as-of shapes keep an equi component (user_id) so Spark plans a
  hash join with a range post-filter instead of a nested-loop cross join;
- AQE (left on) handles skewed key splits at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_etl_spark.registry import query
from data_pipeline_etl_spark.sources.tables import table

def _revenue():
    return F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))


@query(
    "q_join_inner",
    oracle="""
    SELECT o_orderstatus,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join of the two fact tables + rollup."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderstatus")
        .agg(F.round(_revenue(), 4).alias("revenue"), F.count("*").alias("n"))
    )


@query(
    "q_join_chain",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join chain, revenue per nation.

    Written selective-first (filtered orders joined before lineitem) so the
    largest table only meets pre-reduced inputs; dims broadcast themselves.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == o.o_orderkey)
        .join(s, (F.col("l_suppkey") == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(_revenue(), 4).alias("revenue"))
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: every customer, order counts including zero."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with at least one open order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no urgent orders.

    (Against *all* orders the result is empty at every fixture SF — a
    hash check over zero rows proves nothing — so the anti-join excludes
    on a selective subset to keep the check data-carrying.)
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_broadcast",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n
    FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicitly broadcast small dimensions into the fact scan."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(_revenue(), 4).alias("revenue"), F.count("*").alias("n"))
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    WHERE r_regionkey <> n_regionkey
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cross join (dims only) + filter."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).filter(F.col("r_regionkey") != F.col("n_regionkey")).select(
        "r_name", "n_name"
    )


@query(
    "q_join_theta",
    oracle="""
    SELECT e1.user_id AS user_id, count(*) AS n_pairs
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 30 MINUTE
     AND e1.event_id < e2.event_id
    GROUP BY e1.user_id
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: event pairs within 30 minutes, same user.

    The equi component (user_id) keeps this a hash join with a range
    residual — never a full cross product.
    """
    e = table(spark, sf_dir, "events")
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    cond = (
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e2.ts") > F.col("e1.ts"))
        & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 30 MINUTES"))
        & (F.col("e1.event_id") < F.col("e2.event_id"))
    )
    return (
        e1.join(e2, cond)
        .groupBy(F.col("e1.user_id").alias("user_id"))
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT event_id, user_id, ts, prev_ts, prev_type
    FROM (
      SELECT event_id, user_id, ts, event_type,
             lag(ts)         OVER w AS prev_ts,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE event_type = 'purchase'
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of lookup: each purchase matched to the latest prior event.

    Spark has no native DataFrame as-of join; the scalable expression is a
    single window pass (one shuffle on user_id) rather than a range join.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            F.lag("ts").over(w).alias("prev_ts"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("event_type") == "purchase")
        .drop("event_type")
    )


@query(
    "q_join_right",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal < 0
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: all (filtered) customers, orders where present."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    o = table(spark, sf_dir, "orders")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_full",
    oracle="""
    WITH open_orders AS (
      SELECT o_custkey, count(*) AS n_open FROM orders
      WHERE o_orderstatus = 'O' GROUP BY o_custkey
    ),
    final_orders AS (
      SELECT o_custkey, count(*) AS n_final FROM orders
      WHERE o_orderstatus = 'F' GROUP BY o_custkey
    )
    SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey,
           coalesce(a.n_open, 0)  AS n_open,
           coalesce(b.n_final, 0) AS n_final
    FROM open_orders a FULL OUTER JOIN final_orders b ON a.o_custkey = b.o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two keyed aggregates with NULL-side coalesce."""
    o = table(spark, sf_dir, "orders")
    open_orders = (
        o.filter(F.col("o_orderstatus") == "O").groupBy("o_custkey").agg(F.count("*").alias("n_open"))
    )
    final_orders = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("f_custkey"))
        .agg(F.count("*").alias("n_final"))
    )
    j = open_orders.join(
        final_orders, open_orders.o_custkey == final_orders.f_custkey, "full_outer"
    )
    return j.select(
        F.coalesce("o_custkey", "f_custkey").alias("custkey"),
        F.coalesce("n_open", F.lit(0)).alias("n_open"),
        F.coalesce("n_final", F.lit(0)).alias("n_final"),
    )


@query(
    "q_join_lateral",
    oracle="""
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
    """,
)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 customers by balance per nation.

    Identical SQL text on both engines (LATERAL is ANSI). Catalyst
    decorrelates the ORDER BY .. LIMIT subquery into a partitioned
    window/top-k — same physical shape as q_win_topn, so the per-group
    LIMIT never becomes a per-row rescan at scale.
    """
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat_v")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat_v")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation_lat_v n, LATERAL (
          SELECT c_name, c_acctbal FROM customer_lat_v
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        """
    )


@query(
    "q_join_nullsafe",
    oracle="""
    WITH a AS (
      SELECT nullif(o_orderpriority, '4-NOT SPECIFIED') AS prio,
             count(*) AS n_open
      FROM orders WHERE o_orderstatus = 'O' GROUP BY prio
    ),
    b AS (
      SELECT nullif(o_orderpriority, '4-NOT SPECIFIED') AS prio,
             count(*) AS n_final
      FROM orders WHERE o_orderstatus = 'F' GROUP BY prio
    )
    SELECT a.prio AS prio, a.n_open, b.n_final
    FROM a JOIN b ON a.prio IS NOT DISTINCT FROM b.prio
    """,
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (``<=>`` / IS NOT DISTINCT FROM): per-priority
    open vs final order counts where the 'NOT SPECIFIED' tier is a NULL
    key on both sides.

    A plain inner join silently drops the NULL=NULL group; the null-safe
    comparator keeps it — the ETL-merge behavior needed whenever a join
    key is itself the product of NULL-ification (scrubbed or optional
    dimensions). Catalyst plans ``<=>`` as a hash join (EqualNullSafe is
    still an equi-key), not a nested loop.
    """
    o = table(spark, sf_dir, "orders")
    prio = F.expr("nullif(o_orderpriority, '4-NOT SPECIFIED')")
    a = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(prio.alias("prio"))
        .agg(F.count("*").alias("n_open"))
    )
    b = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(prio.alias("prio_b"))
        .agg(F.count("*").alias("n_final"))
    )
    return (
        a.join(b, F.col("prio").eqNullSafe(F.col("prio_b")))
        .select("prio", "n_open", "n_final")
    )


@query(
    "q_join_salted",
    oracle="""
    SELECT e.event_type,
           count(*) AS n,
           round(sum(e.value), 4) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.event_type
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join through the declared surface: the salted join
    (operators/skew.py) must produce results identical to the plain equi
    join — the oracle IS the plain join.

    Salting spreads a known hot key over n_salts (key, salt) buckets:
    the large/skewed side gets a deterministic whole-row-hash salt, the
    small side is replicated n_salts times. At 100 TB this converts one
    straggler task into n_salts even tasks for bot users/sentinel keys
    that AQE's runtime skew split can't always catch (e.g. when the hot
    key also explodes the post-join row count).
    """
    from data_pipeline_etl_spark.operators.skew import salted_join

    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer")
    joined = salted_join(
        e.select("user_id", "event_type", "value"),
        c.select("c_custkey"),
        "user_id",
        "c_custkey",
        n_salts=8,
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@query(
    "q_join_pointrange",
    oracle="""
    WITH deltas AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id,
             min(ts) - INTERVAL 15 MINUTE AS lo,
             max(ts) + INTERVAL 15 MINUTE AS hi
      FROM (
        SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS sid
        FROM deltas
      )
      GROUP BY user_id, sid
    ),
    err AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    )
    SELECT e.event_id, count(*) AS n_sessions
    FROM err e JOIN sess s
      ON s.user_id <> e.user_id AND e.ts >= s.lo AND e.ts <= s.hi
    GROUP BY e.event_id
    """,
)
def q_join_pointrange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join at scale: every error event matched to the
    padded activity sessions of OTHER users that contain its timestamp
    (concurrency attribution: "who else was active when this failed").

    The scale problem: a point-in-range predicate has no equi key, so a
    naive formulation is a nested-loop product — quadratic at 100 TB.
    The bucketed-range-join technique manufactures one: each session
    interval explodes into the hour buckets it covers (intervals are
    minutes-long, so 1-3 buckets each, not a blowup), each point maps to
    exactly one bucket, and the join becomes bucket-equi + residual
    range filter. Every (session, point) pair meets in exactly one
    bucket — the point's own — so no post-join dedup is needed. The
    plan gate pins the hash join; CartesianProduct here is a perf bug.

    Sessions: 30-minute-gap sessionization (lag + running sum, the
    gaps-islands idiom mirrored exactly in the oracle), padded +-15
    minutes so single-event sessions still span an interval. Padding <
    half the gap keeps same-user sessions non-overlapping.
    """
    e = table(spark, sf_dir, "events")
    um = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.when(
            F.lag("ts").over(w).isNull() | (um - F.lag(um).over(w) > 1_800_000_000),
            1,
        )
        .otherwise(0)
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = (
        e.select("user_id", "ts", "event_id", brk.alias("brk"))
        .withColumn("sid", F.sum("brk").over(run))
        .groupBy("user_id", "sid")
        .agg(
            (F.min("ts") - F.expr("INTERVAL 15 MINUTES")).alias("lo"),
            (F.max("ts") + F.expr("INTERVAL 15 MINUTES")).alias("hi"),
        )
    )
    buckets = sess.select(
        F.col("user_id").alias("s_user"),
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("lo")),
                F.date_trunc("hour", F.col("hi")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket"),
    )
    err = e.where(F.col("event_type") == "error").select(
        "event_id",
        F.col("user_id").alias("e_user"),
        "ts",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
    )
    return (
        err.join(
            buckets,
            (err.bucket == buckets.bucket)
            & (F.col("s_user") != F.col("e_user"))
            & (F.col("ts") >= F.col("lo"))
            & (F.col("ts") <= F.col("hi")),
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("n_sessions"))
    )


@query(
    "q_join_interval",
    oracle="""
    WITH li AS (
      SELECT l_partkey, l_orderkey, l_linenumber,
             CAST(l_shipdate AS DATE) AS s,
             CAST(l_shipdate AS DATE)
               + to_days(CAST(l_quantity AS INT) % 14 + 1) AS r
      FROM lineitem WHERE l_quantity >= 30
    ),
    pairs AS (
      SELECT a.l_partkey,
             CAST(date_diff('day', greatest(a.s, b.s), least(a.r, b.r))
                  AS INT) + 1 AS overlap_days
      FROM li a JOIN li b
        ON a.l_partkey = b.l_partkey
       AND (a.l_orderkey < b.l_orderkey
            OR (a.l_orderkey = b.l_orderkey
                AND a.l_linenumber < b.l_linenumber))
       AND a.s <= b.r AND b.s <= a.r
    )
    SELECT l_partkey, count(*) AS n_pairs,
           max(overlap_days) AS max_overlap_days
    FROM pairs GROUP BY l_partkey
    """,
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap SELF-join: pairs of same-part shipments whose
    transit windows [shipdate, shipdate + (quantity %% 14 + 1) days]
    overlap, rolled up per part (pair count + widest overlap). The
    interval end is derived deterministically because the fixture
    carries only l_shipdate.

    The interval x interval case the point-in-range bucketization
    (q_join_pointrange) can't cover: BOTH sides span buckets. Shape:
    one scan chops each interval into epoch-day/14 buckets — width >=
    the max span (14 days), so each interval lands in at most TWO
    buckets — then pair expansion happens INSIDE each (part, bucket)
    group via sort_array(collect_list) + combination explode with the
    overlap predicate applied in the lambda, exactly the in-bucket
    machinery the LSH band path uses (llm_similarity.band_pairs_from_bits):
    ONE shuffle, no aliased self-join (which would re-scan and
    re-shuffle both sides — Catalyst does not share the subtree), no
    CartesianProduct, no theta join. A pair co-bucketed twice (both
    endpoints in both buckets) is collapsed by the pre-aggregate
    distinct; group sizes are bounded by shipments-per-part-per-
    fortnight, which is flat in corpus growth, so the quadratic
    in-bucket term never sees |table|. At 100 TB the only global
    exchange is the (part, bucket) hash — same key family the part
    dimension already clusters on.
    """
    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 30)
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            F.to_date("l_shipdate").alias("s"),
            F.date_add(
                F.to_date("l_shipdate"),
                F.col("l_quantity").cast("int") % 14 + 1,
            ).alias("r"),
        )
    )
    bucketed = li.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_date("s") / F.lit(14)),
                F.floor(F.unix_date("r") / F.lit(14)),
            )
        ),
    )
    groups = (
        bucketed.groupBy("l_partkey", "bucket")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("l_orderkey", "l_linenumber", "s", "r"))
            ).alias("items")
        )
        .where(F.size("items") >= 2)
    )
    pairs = (
        groups.select(
            "l_partkey",
            F.explode(
                F.expr(
                    "flatten(transform(items, (x, i) -> "
                    "transform("
                    "  filter(slice(items, i + 2, size(items) - i - 1), "
                    "         y -> x.s <= y.r AND y.s <= x.r), "
                    "  y -> struct("
                    "    x.l_orderkey AS a_ok, x.l_linenumber AS a_ln, "
                    "    y.l_orderkey AS b_ok, y.l_linenumber AS b_ln, "
                    "    CAST(datediff(least(x.r, y.r), greatest(x.s, y.s)) "
                    "         AS INT) + 1 AS overlap_days))))"
                )
            ).alias("p"),
        )
        .select("l_partkey", "p.*")
        .distinct()
    )
    return pairs.groupBy("l_partkey").agg(
        F.count("*").alias("n_pairs"),
        F.max("overlap_days").alias("max_overlap_days"),
    )


@query(
    "q_join_asof_nearest",
    oracle="""
    WITH m AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'click' THEN event_id END AS c_id,
             CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS c_us
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    x AS (
      SELECT *,
        last_value(c_id IGNORE NULLS) OVER w_prev AS prev_c_id,
        last_value(c_us IGNORE NULLS) OVER w_prev AS prev_c_us,
        first_value(c_id IGNORE NULLS) OVER w_next AS next_c_id,
        first_value(c_us IGNORE NULLS) OVER w_next AS next_c_us
      FROM m
      WINDOW
        w_prev AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        w_next AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id,
           CASE WHEN next_c_us IS NULL
                  OR (prev_c_us IS NOT NULL
                      AND epoch_us(ts) - prev_c_us <= next_c_us - epoch_us(ts))
                THEN prev_c_id ELSE next_c_id END AS click_id,
           CASE WHEN next_c_us IS NULL
                  OR (prev_c_us IS NOT NULL
                      AND epoch_us(ts) - prev_c_us <= next_c_us - epoch_us(ts))
                THEN epoch_us(ts) - prev_c_us
                ELSE next_c_us - epoch_us(ts) END AS gap_us
    FROM x WHERE event_type = 'purchase'
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-as-of join: each purchase matched to the temporally
    NEAREST click of the same user, in either direction (backward-only
    is q_join_asof's lag shape). Ties (equidistant prev/next) take the
    earlier click; purchases with no click at all keep a NULL match
    (left semantics).

    The scalable expression is the tagged-union single window pass:
    union both event kinds into one stream, carry click attributes in
    nullable columns, and resolve prev/next via last/first
    IGNORE NULLS over the two half-open frames — ONE shuffle on
    user_id, zero joins, where a range-join formulation would shuffle
    both sides and explode candidates by the time radius. Gap
    arithmetic is exact integer microseconds (the live family's
    canonicalization discipline), so the hash check is immune to
    timestamp formatting.
    """
    e = table(spark, sf_dir, "events")
    m = e.where(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("c_id"),
        F.when(
            F.col("event_type") == "click",
            F.unix_micros(F.col("ts").cast("timestamp")),
        ).alias("c_us"),
    )
    # "Next click" runs over the REVERSED sort with a growing frame:
    # Spark streams UNBOUNDED PRECEDING frames incrementally but
    # re-evaluates an UNBOUNDED FOLLOWING frame from scratch at every
    # row — O(rows^2) inside a single power-user partition at scale
    # (same rewrite as q_time_interp; the (ts, event_id) order is a
    # strict total order, so the reversal is exact). Both windows share
    # the user_id hash partitioning: still one shuffle, two sorts.
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    x = (
        m.withColumn("prev_c_id", F.last("c_id", ignorenulls=True).over(w_prev))
        .withColumn("prev_c_us", F.last("c_us", ignorenulls=True).over(w_prev))
        .withColumn("next_c_id", F.last("c_id", ignorenulls=True).over(w_next))
        .withColumn("next_c_us", F.last("c_us", ignorenulls=True).over(w_next))
        .where(F.col("event_type") == "purchase")
    )
    p_us = F.unix_micros(F.col("ts").cast("timestamp"))
    pick_prev = F.col("next_c_us").isNull() | (
        F.col("prev_c_us").isNotNull() & (p_us - F.col("prev_c_us") <= F.col("next_c_us") - p_us)
    )
    return x.select(
        "event_id",
        "user_id",
        F.when(pick_prev, F.col("prev_c_id")).otherwise(F.col("next_c_id")).alias("click_id"),
        F.when(pick_prev, p_us - F.col("prev_c_us"))
        .otherwise(F.col("next_c_us") - p_us)
        .alias("gap_us"),
    )
