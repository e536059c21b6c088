"""A/B the CC fixpoint edge layout (SCALE.md r17 queue item).

Variants over the same materialized near-dup pair frame at sf0.1:
  plain  — edges.localCheckpoint(eager=True)            (current)
  dst    — edges.repartition("dst") before checkpoint    (pagerank rule)
  srcbc  — edges.repartition("src") + F.broadcast(labels) in the hop
           join (the only variant where the layout can collapse the
           groupBy(src) partial-agg fan-in, because the broadcast join
           preserves edge partitioning)

Each variant warm x3 after one discard rep; values cross-checked.
Experiment-only: not part of the package surface.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

from data_pipeline_etl_spark.operators.llm_dedup import (
    _connected_components,
    neardup_pairs_table,
)
from data_pipeline_etl_spark.sources.tables import table

SF = "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .appName("exp_cc_layout")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

d = table(spark, SF, "documents")
pairs = neardup_pairs_table(spark, SF).select("doc_a", "doc_b")
pairs.count()  # materialize the artifact outside the timed region

bidir = pairs.unionByName(
    pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))


def cc_broadcast_labels(edges, max_rounds=20):
    """The CC loop with F.broadcast on the labels side of the hop join."""
    labels = (
        edges.select(F.col("src").alias("doc_id"), F.col("dst").alias("cluster_id"))
        .unionByName(
            edges.select(F.col("src").alias("doc_id"), F.col("src").alias("cluster_id"))
        )
        .groupBy("doc_id")
        .agg(F.min("cluster_id").alias("cluster_id"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_rounds):
        neighbor = edges.join(
            F.broadcast(labels), edges.dst == labels.doc_id
        ).select(
            F.col("src").alias("doc_id"),
            "cluster_id",
            F.lit(None).cast("long").alias("old"),
        )
        hopped = (
            labels.select("doc_id", "cluster_id", F.col("cluster_id").alias("old"))
            .unionByName(neighbor)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"), F.min("old").alias("old"))
            .localCheckpoint(eager=False)
        )
        changed = hopped.where(F.col("cluster_id") != F.col("old")).count()
        if changed == 0:
            return hopped.select("doc_id", "cluster_id")
        labels = (
            hopped.alias("a")
            .join(
                F.broadcast(
                    hopped.select(
                        F.col("doc_id").alias("jid"),
                        F.col("cluster_id").alias("jlab"),
                    )
                ).alias("b"),
                F.col("a.cluster_id") == F.col("b.jid"),
            )
            .select(
                F.col("a.doc_id").alias("doc_id"),
                F.least(F.col("a.cluster_id"), F.col("b.jlab")).alias("cluster_id"),
            )
        )
    raise RuntimeError("no converge")


def run(variant):
    if variant == "plain":
        edges = bidir.localCheckpoint(eager=True)
        labels = _connected_components(edges)
    elif variant == "dst":
        edges = bidir.repartition("dst").localCheckpoint(eager=True)
        labels = _connected_components(edges)
    elif variant == "srcbc":
        edges = bidir.repartition("src").localCheckpoint(eager=True)
        labels = cc_broadcast_labels(edges)
    out = (
        d.select("doc_id")
        .join(labels, "doc_id", "left")
        .select("doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"))
    )
    n, s = out.agg(F.count("*"), F.sum(F.col("doc_id") * F.col("cluster_id"))).first()
    return n, s


results = {}
for variant in ["plain", "dst", "srcbc"]:
    run(variant)  # discard (JIT/warm)
    times = []
    check = None
    for _ in range(3):
        t0 = time.time()
        check = run(variant)
        times.append(round(time.time() - t0, 2))
    results[variant] = (times, check)
    print(variant, times, check, flush=True)

checks = {v: c for v, (t, c) in results.items()}
assert len(set(checks.values())) == 1, f"value mismatch: {checks}"
print("values identical across variants")
