#!/usr/bin/env python
"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Timing = full query wall time (plan + execute + collect) on a warm,
shared SparkSession — the session cold start (~7 s, SURVEY.md §6) is
excluded because it amortizes to zero across a real workload.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators
    from data_pipeline_etl_spark.session import get_spark

    load_all_operators()
    spark = get_spark("bench")

    # Warm the JVM + parquet footers with a trivial action.
    QUERIES["q_agg_groupby"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": f"total_wall_sec_{len(timings)}_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
