#!/usr/bin/env python
"""Fixed per-query-floor breakdown (VERDICT r16 item 3).

The r16 bench spends ~90 s of its 149-157 s total on 217 sub-1.0 s
queries whose 8-vs-32-core ratios are ~1 — i.e. fixed per-query
overhead, not data. This probe splits that floor on representative
sub-second queries, warm, median-of-5:

  build    — Python DSL construction + analysis (df.schema)
  noop     — execution only (noop sink, guide §1.4)
  topandas — execution + Arrow materialize (the bench's timed action)

and re-times the same queries with AQE off to isolate the adaptive
re-planning round trips. Numbers land in SCALE.md / OPTIMIZATION_r17.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

NAMES = [
    "q_scan_project",
    "q_agg_groupby",
    "q_join_inner",
    "q_win_topn",
    "q_text_topterms",
    "q_stream_tumbling",
]

REPS = 5


def med(fn) -> float:
    runs = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators
    from data_pipeline_etl_spark.session import get_spark
    from data_pipeline_etl_spark.sources.tables import load_all

    load_all_operators()
    spark = get_spark("floor_probe")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    for df in load_all(spark, sf_dir).values():
        df.cache().count()
    QUERIES["q_agg_groupby"](spark, sf_dir).toPandas()

    out: dict[str, dict[str, float]] = {}
    for name in NAMES:
        q = QUERIES[name]
        q(spark, sf_dir).toPandas()  # warm codegen for this query
        row = {
            "build": med(lambda: q(spark, sf_dir).schema),
            "noop": med(
                lambda: q(spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
                .save()
            ),
            "topandas": med(lambda: q(spark, sf_dir).toPandas()),
        }
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        row["noop_noaqe"] = med(
            lambda: q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        )
        row["topandas_noaqe"] = med(lambda: q(spark, sf_dir).toPandas())
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        out[name] = row
        print(name, row, flush=True)
    print(json.dumps({"probe": "floor", "sf_dir": sf_dir, "rows": out}))


if __name__ == "__main__":
    main()
