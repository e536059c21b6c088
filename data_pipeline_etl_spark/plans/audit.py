"""Plan auditor: extracts the scale-relevant physical-plan features of
every registered query (shuffle count, join strategies, pushdown, Python
eval nodes) so plan quality is reviewable as data, not anecdotes.

Usage:  python -m data_pipeline_etl_spark.plans.audit [sf_dir] > PLANS.md
"""

from __future__ import annotations

import re
import sys

from pyspark.sql import SparkSession


def _features(plan: str) -> dict:
    return {
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition"),
        "broadcasts": plan.count("BroadcastExchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "nested_loop": plan.count("BroadcastNestedLoopJoin") + plan.count("CartesianProduct"),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "python_eval": any(
            m in plan for m in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas")
        ),
        "take_ordered": "TakeOrderedAndProject" in plan,
    }


def audit_plans(spark: SparkSession, sf_dir: str) -> dict[str, dict]:
    from data_pipeline_etl_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    out = {}
    for name in sorted(QUERIES):
        plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        out[name] = _features(plan)
    return out


def main() -> None:
    from data_pipeline_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    feats = audit_plans(get_spark("plan-audit"), sf_dir)
    cols = [
        "exchanges",
        "broadcasts",
        "sort_merge_joins",
        "broadcast_joins",
        "nested_loop",
        "pushed_filters",
        "python_eval",
        "take_ordered",
    ]
    print(f"# Physical-plan audit @ {sf_dir}\n")
    print("| query | " + " | ".join(cols) + " |")
    print("|---|" + "---|" * len(cols))
    for name, f in feats.items():
        print(f"| {name} | " + " | ".join(str(f[c]) for c in cols) + " |")


if __name__ == "__main__":
    main()
