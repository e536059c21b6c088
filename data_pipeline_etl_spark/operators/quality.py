"""Data-quality checks (reference analog: the genre's DataQualityOperator /
post-load assert step, SURVEY.md §5.1) as a declared, oracle-checked query.

One row per check with its violation count — the warehouse-native shape:
run after load, alert on any n_bad > 0. Each check is a semi/anti join or
aggregate, so the whole suite is a handful of shuffles regardless of scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_etl_spark.registry import query
from data_pipeline_etl_spark.sources.tables import table


@query(
    "q_dq_checks",
    oracle="""
    SELECT 'orders_null_custkey' AS check_name,
           count(CASE WHEN o_custkey IS NULL THEN 1 END) AS n_bad FROM orders
    UNION ALL
    SELECT 'orders_orphan_custkey',
           count(*) FROM orders WHERE NOT EXISTS
             (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           count(*) FROM lineitem WHERE NOT EXISTS
             (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
    UNION ALL
    SELECT 'customer_dup_pk',
           CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) FROM customer
    UNION ALL
    SELECT 'lineitem_nonpositive_qty',
           count(CASE WHEN l_quantity <= 0 THEN 1 END) FROM lineitem
    UNION ALL
    SELECT 'orders_bad_status',
           count(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 END) FROM orders
    """,
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-load data-quality suite: NULL keys, FK orphans, dup PKs, domains."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    l = table(spark, sf_dir, "lineitem")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(name).alias("check_name"), F.col("n_bad").cast("long"))

    null_cust = o.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_bad")
    )
    orphan_orders = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(F.count("*").alias("n_bad"))
    )
    orphan_lineitems = (
        l.join(o, l.l_orderkey == o.o_orderkey, "left_anti").agg(F.count("*").alias("n_bad"))
    )
    dup_cust = c.agg(
        (F.count("*") - F.countDistinct("c_custkey")).alias("n_bad")
    )
    bad_qty = l.agg(F.count(F.when(F.col("l_quantity") <= 0, 1)).alias("n_bad"))
    bad_status = o.agg(
        F.count(F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1)).alias("n_bad")
    )
    return (
        check("orders_null_custkey", null_cust)
        .unionByName(check("orders_orphan_custkey", orphan_orders))
        .unionByName(check("lineitem_orphan_orderkey", orphan_lineitems))
        .unionByName(check("customer_dup_pk", dup_cust))
        .unionByName(check("lineitem_nonpositive_qty", bad_qty))
        .unionByName(check("orders_bad_status", bad_status))
    )


@query(
    "q_profile_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           count(*) AS n_orders,
           round(min(o_totalprice), 6) AS lo,
           round(max(o_totalprice), 6) AS hi
    FROM orders
    GROUP BY bucket
    """,
)
def q_profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram of o_totalprice (data-profiling shape).

    Bucketing is a pure projection (floor division), so the histogram is
    one partial+final aggregate regardless of table size — the profiling
    primitive that replaces a full sort at 100 TB.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 6).alias("lo"),
            F.round(F.max("o_totalprice"), 6).alias("hi"),
        )
    )


# Columns profiled by q_profile_colstats: (name, is_numeric)
_PROFILE_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_totalprice", True),
    ("o_orderstatus", False),
    ("o_orderpriority", False),
]


@query(
    "q_profile_colstats",
    oracle="""
    WITH agg AS (
      SELECT count(*) AS n_rows,
             {cols}
      FROM orders
    )
    SELECT * FROM (
      {rows}
    )
    """.format(
        cols=",\n             ".join(
            f"count({c}) AS nn_{c}, count(DISTINCT {c}) AS nd_{c}"
            + (
                f", round(min({c}), 6) AS mn_{c}, round(max({c}), 6) AS mx_{c}"
                if num
                else ""
            )
            for c, num in _PROFILE_COLS
        ),
        rows="\n      UNION ALL ".join(
            "SELECT '{c}' AS col, n_rows, CAST(n_rows - nn_{c} AS BIGINT) AS n_nulls, "
            "CAST(nd_{c} AS BIGINT) AS n_distinct, {mn} AS min_num, {mx} AS max_num "
            "FROM agg".format(
                c=c,
                mn=f"CAST(mn_{c} AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)",
                mx=f"CAST(mx_{c} AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)",
            )
            for c, num in _PROFILE_COLS
        ),
    ),
)
def q_profile_colstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column data profile (null count, distinct count, numeric
    min/max) in ONE aggregate pass over the table.

    The schema-profiling primitive: all per-column statistics are
    expressions of a single partial→final aggregate — one scan, one
    tiny shuffle — then unpivoted to a row per column from the 1-row
    aggregate output (driver-free; the unpivot is over one row, not the
    fact table). Profiling k columns costs the same scan as profiling
    one.
    """
    o = table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c, num in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
        if num:
            aggs.append(F.round(F.min(c), 6).alias(f"mn_{c}"))
            aggs.append(F.round(F.max(c), 6).alias(f"mx_{c}"))
    agg = o.agg(*aggs)
    # stack() unpivots the 1-row aggregate in one generate pass (a
    # per-column unionByName would re-plan the full-table aggregate per
    # column — the q_text_langid lesson)
    stack_args = ", ".join(
        f"'{c}', CAST(n_rows - nn_{c} AS BIGINT), CAST(nd_{c} AS BIGINT), "
        + (
            f"CAST(mn_{c} AS DOUBLE), CAST(mx_{c} AS DOUBLE)"
            if num
            else "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)"
        )
        for c, num in _PROFILE_COLS
    )
    return agg.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (col, n_nulls, n_distinct, min_num, max_num)"
        ),
        "n_rows",
    )


@query(
    "q_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m ON e.event_type = m.event_type
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type,
           round(e.value, 6) AS value,
           round((e.value - m.med) / (1.4826 * d.mad), 6) AS robust_z
    FROM events e
    JOIN med m ON e.event_type = m.event_type
    JOIN mad d ON e.event_type = d.event_type
    WHERE d.mad > 0
      AND abs((e.value - m.med) / (1.4826 * d.mad)) > 3.5
    """,
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: |value - median| / (1.4826 * MAD) > 3.5
    per event type — the median-absolute-deviation analog of
    q_anomaly_zscore, immune to the outliers it hunts.

    Same two-broadcast-pass shape as zscore with one extra tiny
    aggregate: per-type median (|event_types| rows, broadcast back),
    per-type MAD over the deviations (broadcast back), then a map-side
    filter — never a window over the full stream. Spark's exact
    percentile() interpolation matches DuckDB quantile_cont bit-wise on
    float64 (cf. q_agg_percentile); the mad > 0 guard keeps the
    degenerate >50%-identical-values stratum out (division semantics at
    0 differ across engines).
    """
    e = table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    rz = (F.col("value") - F.col("med")) / (1.4826 * F.col("mad"))
    return (
        e.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .where((F.col("mad") > 0) & (F.abs(rz) > 3.5))
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round(rz, 6).alias("robust_z"),
        )
    )


@query(
    "q_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             avg(value) AS mu,
             stddev_samp(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round(e.value, 6) AS value,
           round((e.value - s.mu) / s.sigma, 6) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs((e.value - s.mu) / s.sigma) > 3
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection: events whose value is >3σ from the
    per-type mean.

    Two-pass shape: tiny per-type stats aggregate, broadcast back, filter
    — no window over the full stream, so the anomaly scan stays
    map-side after one |event_types|-row shuffle. avg/stddev matched
    DuckDB bit-exactly in probes (SURVEY.md §2.1 #6); the >3 cut sits far
    from any fixture value's ULP boundary.
    """
    e = table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        e.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > 3)
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round(z, 6).alias("zscore"),
        )
    )


# PSI oracle text, shared with the streaming live twin
# (streaming/batch_windows.py q_stream_psi_live): the live contract's
# final-sink state reduces to the identical batch answer.
_PSI_ORACLE = """
    WITH base AS (
      SELECT event_type,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a,
             CAST(least(floor(value / 50), 9) AS INT) AS bucket
      FROM events
    ),
    counts AS (
      SELECT event_type, bucket,
             CAST(sum(is_a) AS BIGINT) AS n_a,
             CAST(sum(1 - is_a) AS BIGINT) AS n_b
      FROM base GROUP BY event_type, bucket
    ),
    spine AS (
      SELECT et.event_type, g.b AS bucket
      FROM (SELECT DISTINCT event_type FROM base) et,
           unnest(generate_series(0, 9)) AS g(b)
    ),
    filled AS (
      SELECT s.event_type, s.bucket,
             coalesce(c.n_a, 0) AS n_a, coalesce(c.n_b, 0) AS n_b
      FROM spine s LEFT JOIN counts c
        ON s.event_type = c.event_type AND s.bucket = c.bucket
    ),
    tot AS (
      SELECT event_type, CAST(sum(n_a) AS BIGINT) AS ta,
             CAST(sum(n_b) AS BIGINT) AS tb
      FROM counts GROUP BY event_type
    )
    SELECT f.event_type, max(t.ta) AS n_a, max(t.tb) AS n_b,
           round(sum(((f.n_a + 0.5) / (t.ta + 5.0)
                      - (f.n_b + 0.5) / (t.tb + 5.0))
                     * ln(((f.n_a + 0.5) / (t.ta + 5.0))
                          / ((f.n_b + 0.5) / (t.tb + 5.0)))), 6) AS psi
    FROM filled f JOIN tot t ON f.event_type = t.event_type
    GROUP BY f.event_type
    """


@query("q_profile_psi", oracle=_PSI_ORACLE)
def q_profile_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index per event_type between two snapshot
    halves (user_id parity plays the role of yesterday's load vs
    today's): PSI = sum over bins (pA - pB) * ln(pA / pB) on a FIXED
    10-bin value spine with Laplace smoothing (+0.5 per bin), so empty
    bins are defined and both engines see the identical bin set — the
    drift gate a warehouse runs between loads before trusting a
    snapshot (PSI > 0.1-ish pages a human).

    Shape: one corpus scan into a (type, bucket) count aggregate (the
    only data-sized shuffle; counts carry partial sums map-side), then
    everything downstream is |types| x 10 rows: spine fill via a left
    join against a generated frame, totals re-aggregated from the
    count table (never a second corpus scan), per-bin terms as exact
    int64 counts pushed through one double division chain, summed and
    rounded at 6 dp per the float-fold discipline (llm_corpus.py).
    """
    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("is_a"),
        F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("int").alias("bucket"),
    )
    counts = e.groupBy("event_type", "bucket").agg(
        F.sum("is_a").alias("n_a"), F.sum(1 - F.col("is_a")).alias("n_b")
    )
    return psi_from_counts(counts)


def psi_from_counts(counts: DataFrame) -> DataFrame:
    """PSI reduction over a (event_type, bucket, n_a, n_b) count frame —
    frame-parameterized so the batch profile (q_profile_psi) and the
    streaming live twin (q_stream_psi_live, whose count frame is the
    memory-sink state of a streaming aggregation) share one formula
    tree. Everything here is |types| x 10 rows."""
    spark = counts.sparkSession
    spine = (
        counts.select("event_type")
        .distinct()
        .crossJoin(spark.range(10).select(F.col("id").cast("int").alias("bucket")))
    )
    filled = (
        spine.join(counts, ["event_type", "bucket"], "left")
        .fillna(0, ["n_a", "n_b"])
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    pa = (F.col("n_a") + 0.5) / (F.col("ta") + 5.0)
    pb = (F.col("n_b") + 0.5) / (F.col("tb") + 5.0)
    return (
        filled.join(tot, "event_type")
        .groupBy("event_type")
        .agg(
            F.max("ta").alias("n_a"),
            F.max("tb").alias("n_b"),
            F.round(F.sum((pa - pb) * F.log(pa / pb)), 6).alias("psi"),
        )
    )


@query(
    "q_skew_diagnose",
    oracle="""
    WITH stacked AS (
      SELECT 'l_orderkey' AS key_name, l_orderkey AS key_value FROM lineitem
      UNION ALL
      SELECT 'l_partkey', l_partkey FROM lineitem
      UNION ALL
      SELECT 'l_suppkey', l_suppkey FROM lineitem
    ),
    counts AS (
      SELECT key_name, key_value, count(*) AS n
      FROM stacked GROUP BY key_name, key_value
    )
    SELECT key_name,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(n) AS BIGINT) AS max_per_key,
           round(max(n) * count(*) / CAST(sum(n) AS DOUBLE), 4) AS skew_ratio,
           min(key_value) FILTER (WHERE n = (SELECT max(c2.n) FROM counts c2
                                             WHERE c2.key_name = counts.key_name))
             AS top_key
    FROM counts GROUP BY key_name
    """,
)
def q_skew_diagnose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler: for each candidate shuffle key of the
    fact table, the key cardinality, the heaviest key's row count, the
    max/avg skew ratio, and the heaviest key itself (smallest id on
    ties) — the diagnostic a pipeline runs BEFORE choosing salting /
    AQE-skew-join / broadcast strategy for a 100 TB join, and the
    source of the salt-factor number q_join_salted hardcodes.

    One scan: the three key columns stack map-side into (name, value)
    rows (3x row amplification before the partial aggregate, which
    collapses it immediately), then a (name, value) count aggregate and
    a 3-row rollup. The argmax key resolves deterministically via
    max(struct(n, -key)) — no second pass, no window; the oracle's
    correlated-subquery formulation is the clarity twin of the same
    selection.
    """
    l = table(spark, sf_dir, "lineitem")
    stacked = l.select(
        F.expr(
            "stack(3, 'l_orderkey', l_orderkey, "
            "'l_partkey', l_partkey, 'l_suppkey', l_suppkey)"
        ).alias("key_name", "key_value")
    )
    counts = stacked.groupBy("key_name", "key_value").agg(F.count("*").alias("n"))
    return counts.groupBy("key_name").agg(
        F.sum("n").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("n").alias("max_per_key"),
        F.round(
            F.max("n") * F.count("*") / F.sum("n").cast("double"), 4
        ).alias("skew_ratio"),
        (-F.max(F.struct(F.col("n"), (-F.col("key_value")).alias("neg_key")))[
            "neg_key"
        ]).alias("top_key"),
    )


@query(
    "q_dq_freshness",
    oracle="""
    WITH per AS (
      SELECT event_type, max(epoch_us(ts)) AS last_us,
             count(*) AS n
      FROM events GROUP BY event_type
    ),
    hd AS (SELECT max(last_us) AS head_us FROM per)
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST((g.head_us - last_us) // 1000000 AS BIGINT) AS lag_sec,
           CAST(CASE WHEN g.head_us - last_us > CAST(3600000000 AS BIGINT)
                     THEN 1 ELSE 0 END AS INT) AS stale
    FROM per CROSS JOIN hd g
    """,
)
def q_dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness gate: each feed's (event_type's) lag behind the
    newest record anywhere, with a staleness flag at 1 hour — the
    post-load check that catches a silently-stalled upstream producer
    before consumers read a partial day.

    One |feeds|-row aggregate carries max-ts and counts (map-side
    combining max, shuffle is |feeds| partial rows); the head-of-log
    scalar is a one-row aggregate OF THAT FRAME — the corpus is
    scanned once — broadcast back as a cross join. Lag arithmetic in
    exact integer microseconds (integer division to whole seconds), so
    the hash check is canonicalization-immune.
    """
    e = table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("last_us"),
        F.count("*").alias("n"),
    )
    glob = per.agg(F.max("last_us").alias("head_us"))
    lag_us = F.col("head_us") - F.col("last_us")
    return per.crossJoin(F.broadcast(glob)).select(
        "event_type",
        "n",
        F.expr("(head_us - last_us) div 1000000").cast("long").alias("lag_sec"),
        F.when(lag_us > F.lit(3600000000).cast("long"), 1)
        .otherwise(0)
        .cast("int")
        .alias("stale"),
    )


@query(
    "q_profile_ks",
    oracle="""
    WITH rng AS (
      SELECT event_type, min(value) AS vmin, max(value) AS vmax
      FROM events GROUP BY event_type
    ),
    binned AS (
      SELECT e.event_type,
             CASE WHEN e.user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a,
             CASE WHEN r.vmax = r.vmin THEN 0
                  ELSE CAST(least(floor((e.value - r.vmin)
                                        / ((r.vmax - r.vmin) / 256.0)),
                                  255) AS INT)
             END AS bucket
      FROM events e JOIN rng r ON e.event_type = r.event_type
    ),
    counts AS (
      SELECT event_type, bucket,
             CAST(sum(is_a) AS BIGINT) AS n_a,
             CAST(sum(1 - is_a) AS BIGINT) AS n_b
      FROM binned GROUP BY event_type, bucket
    ),
    tot AS (
      SELECT event_type, CAST(sum(n_a) AS BIGINT) AS ta,
             CAST(sum(n_b) AS BIGINT) AS tb
      FROM counts GROUP BY event_type
    ),
    ecdf AS (
      SELECT event_type, bucket,
             sum(n_a) OVER (PARTITION BY event_type ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS ca,
             sum(n_b) OVER (PARTITION BY event_type ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS cb
      FROM counts
    )
    SELECT e.event_type, max(t.ta) AS n_a, max(t.tb) AS n_b,
           round(max(abs(CAST(e.ca AS DOUBLE) / t.ta
                         - CAST(e.cb AS DOUBLE) / t.tb)), 6) AS ks_stat
    FROM ecdf e JOIN tot t ON e.event_type = t.event_type
    GROUP BY e.event_type
    """,
)
def q_profile_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic per event_type
    between the same snapshot halves as q_profile_psi (user_id parity =
    yesterday's load vs today's): KS = sup over bin edges of
    |ECDF_A - ECDF_B| on a 256-bin equi-width spine spanning the
    per-type [min, max]. PSI is bin-mass-sensitive (chi-square-ish,
    loud on fat-bin shifts); KS is the location-sensitive complement
    that catches a pure median shift PSI underweights — warehouses run
    both before trusting a load.

    Scale shape: the only data-sized work is one corpus scan into a
    (type, bucket) count aggregate (partial sums map-side; <= 256 rows
    per type survive). The running ECDF window orders by bucket WITHIN
    each type — 256-row partitions regardless of corpus size, never a
    global sort. The sup needs no empty-bin spine fill: the ECDF gap is
    constant across empty bins, so its max over occupied bins equals
    the max over all bins. Degenerate constant-valued types collapse to
    bucket 0 by an explicit CASE (vmax = vmin) so neither engine
    touches a 0/0 NaN (the q_time_autocorr lesson: NaN-vs-NULL is a
    cross-engine divergence).
    """
    e = table(spark, sf_dir, "events")
    rng = e.groupBy("event_type").agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    width = (F.col("vmax") - F.col("vmin")) / 256.0
    binned = e.join(F.broadcast(rng), "event_type").select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("is_a"),
        F.when(F.col("vmax") == F.col("vmin"), 0)
        .otherwise(
            F.least(
                F.floor((F.col("value") - F.col("vmin")) / width), F.lit(255)
            )
        )
        .cast("int")
        .alias("bucket"),
    )
    counts = binned.groupBy("event_type", "bucket").agg(
        F.sum("is_a").alias("n_a"), F.sum(1 - F.col("is_a")).alias("n_b")
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ecdf = counts.select(
        "event_type",
        F.sum("n_a").over(w).alias("ca"),
        F.sum("n_b").over(w).alias("cb"),
    )
    gap = F.abs(
        F.col("ca").cast("double") / F.col("ta")
        - F.col("cb").cast("double") / F.col("tb")
    )
    return (
        ecdf.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("ta").alias("n_a"),
            F.max("tb").alias("n_b"),
            F.round(F.max(gap), 6).alias("ks_stat"),
        )
    )


@query(
    "q_dq_kanon",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           count(*) AS k,
           count(*) = 1 AS is_unique
    FROM customer
    GROUP BY 1, 2, 3
    HAVING count(*) < 5
    """,
)
def q_dq_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity screen over the quasi-identifier tuple
    (nation, market segment, account-balance kilobucket): every QI group
    smaller than k=5 is a re-identification risk — an attacker who knows
    those three attributes narrows a "anonymized" record to <5 people
    (k=1 = unique = fully identified). The privacy gate a training-data
    pipeline runs BEFORE releasing structured records: PII scrubbing
    (q_text_pii) removes direct identifiers; this catches the indirect
    ones that survive scrubbing.

    Scale: one partial+final aggregate; output is bounded by the QI-space
    cardinality (|nations| x |segments| x |buckets|), never by row count,
    so the report stays broadcast-sized at 100 TB. Production iterates:
    groups flagged here get a coarser generalization (wider balance
    buckets, region instead of nation) and re-screen — each pass is this
    same single aggregate.
    """
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
        )
        .agg(F.count("*").alias("k"))
        .where(F.col("k") < 5)
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_bucket",
            "k",
            (F.col("k") == 1).alias("is_unique"),
        )
    )


@query(
    "q_profile_benford",
    oracle="""
    WITH d AS (
      SELECT substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
               AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    n AS (SELECT count(*) AS total FROM d)
    SELECT digit,
           count(*) AS n_orders,
           round(count(*) / CAST(total AS DOUBLE), 6) AS obs_share,
           round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_share
    FROM d CROSS JOIN n
    GROUP BY digit, total
    """,
)
def q_profile_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen on order totals: observed
    leading-digit shares next to the log10(1 + 1/d) expectation — the
    classic fabricated-/synthetic-data tell for financial columns (real
    multiplicative amounts lean toward small leading digits; invented or
    uniformly generated ones don't). A corpus-health dashboard runs this
    per source feed; a share drifting from the curve flags the feed, not
    the row.

    One map-side digit projection + one 9-group aggregate; the total is
    a broadcast one-row frame. Deviation is reported PER DIGIT rather
    than folded into a single chi-square so the output carries no
    cross-row float accumulation to hash-diverge on — the fold, if
    wanted, is 9-term driver arithmetic downstream. obs_share divides
    two exact integers and benford_share is a per-row log10 — identical
    operand pairs on both engines, 6 dp absorbing the 1-ulp log wobble.
    """
    o = table(spark, sf_dir, "orders")
    d = o.where(F.col("o_totalprice") >= 1).select(
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1).alias(
            "digit"
        )
    )
    n = d.agg(F.count("*").alias("total"))
    return (
        d.crossJoin(F.broadcast(n))
        .groupBy("digit", "total")
        .agg(F.count("*").alias("n_orders"))
        .select(
            "digit",
            "n_orders",
            F.round(F.col("n_orders") / F.col("total").cast("double"), 6).alias(
                "obs_share"
            ),
            F.round(F.log10(1.0 + 1.0 / F.col("digit").cast("double")), 6).alias(
                "benford_share"
            ),
        )
    )
