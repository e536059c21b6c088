#!/usr/bin/env python
"""Before/after probe for the r16 materialize-once experiment (VERDICT
r15 item 4): times the five cluster-rider queries and the four PCA
queries at sf0.1 on the bench session setup — per-query cold (first
call in session) then two warm repeats, so the cache's effect on the
bench's median-of-3 is measured, not assumed."""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

NAMES = [
    "q_dedup_cluster",
    "q_dedup_cluster_stats",
    "q_split_leakage_safe",
    "q_mix_dedup_aware",
    "q_split_incremental",
    "q_embed_pca",
    "q_embed_pca2",
    "q_embed_pca_project",
    "q_embed_pca_project2",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators
    from data_pipeline_etl_spark.session import get_spark
    from data_pipeline_etl_spark.sources.tables import load_all

    load_all_operators()
    spark = get_spark("mat_probe")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    for df in load_all(spark, sf_dir).values():
        df.cache().count()
    QUERIES["q_agg_groupby"](spark, sf_dir).toPandas()

    out = {}
    for name in NAMES:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).toPandas()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = runs
        print(name, runs, flush=True)
    print(json.dumps({"probe": "materialize_once", "sf_dir": sf_dir, "runs": out}))


if __name__ == "__main__":
    main()
