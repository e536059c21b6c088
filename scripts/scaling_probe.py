#!/usr/bin/env python
"""10x scaling probe: replicate sf0.1's lineitem/orders 10x (with key
remapping so join fan-out stays realistic) and measure headline query
wall time at 1x vs 10x. The point is the SLOPE: a scale-correct plan
costs ~10x (ideally less, because fixed overhead amortizes) — a
quadratic or skew-bound plan blows past it. Results are recorded in
BASELINE.md; run on a quiet host.

    python scripts/scaling_probe.py [factor]
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import functions as F

    from data_pipeline_etl_spark.session import get_spark

    spark = get_spark("scaling-probe")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    sf = "/root/testdata/sf0.1"
    tmp = tempfile.mkdtemp(prefix="scaling_probe_")

    l = spark.read.parquet(f"{sf}/lineitem.parquet")
    o = spark.read.parquet(f"{sf}/orders.parquet")
    max_ok = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    big_l = l.crossJoin(reps).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("rep") * max_ok
    ).drop("rep")
    big_o = o.crossJoin(reps).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("rep") * max_ok
    ).drop("rep")
    big_l.write.parquet(os.path.join(tmp, "lineitem"))
    big_o.write.parquet(os.path.join(tmp, "orders"))

    def q1(ldf):
        return ldf.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*")
        )

    def join_agg(ldf, odf):
        return (
            ldf.join(odf, ldf.l_orderkey == odf.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*"), F.sum("l_extendedprice"))
        )

    def dedup(ldf):
        # summarize instead of returning |distinct| rows to the driver —
        # at scale the dedup output goes to a sink, and an early probe
        # version that materialized 4.5M digest rows measured Arrow
        # transfer (18.6x slope), not the operator (~6x)
        return (
            ldf.groupBy(
                F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber")).alias("d")
            )
            .count()
            .agg(F.count("*").alias("n_unique"), F.sum("count").alias("n_rows"))
        )

    def wtopn(ldf):
        from pyspark.sql import Window

        w = Window.partitionBy("l_returnflag").orderBy(
            F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
        )
        return ldf.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 10)

    cases = {
        "q1_groupby": lambda L, O: q1(L),
        "join_agg": join_agg,
        "dedup_exact": lambda L, O: dedup(L),
        "win_topn": lambda L, O: wtopn(L),
    }

    results = {}
    for tag, (lp, op) in {
        "1x": (f"{sf}/lineitem.parquet", f"{sf}/orders.parquet"),
        f"{factor}x": (os.path.join(tmp, "lineitem"), os.path.join(tmp, "orders")),
    }.items():
        L = spark.read.parquet(lp)
        O = spark.read.parquet(op)
        n = L.count()
        for name, fn in cases.items():
            fn(L, O).toPandas()  # warm
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(L, O).toPandas()
                ts.append(time.perf_counter() - t0)
            results[(tag, name)] = statistics.median(ts)
        print(f"{tag}: rows={n}")
    print(f"\n{'query':14s} {'1x':>8s} {factor:>6d}x  slope (ideal <= {factor})")
    for name in cases:
        a, b = results[("1x", name)], results[(f"{factor}x", name)]
        print(f"{name:14s} {a:8.3f} {b:7.3f}  {b / a:5.1f}x")
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
