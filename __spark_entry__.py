"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_pipeline_etl_spark/`` (SURVEY.md §7.4);
this module is a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def _registry():
    """Registry dicts in driver-grading priority order.

    The driver's correctness pass grades queries() in dict-insertion order
    under a finite budget, so the LLM north-star surface is ordered first
    (registry.ordered_names)."""
    from data_pipeline_etl_spark.registry import (
        QUERIES,
        ORACLES,
        load_all_operators,
        ordered_names,
    )

    load_all_operators()
    names = ordered_names()
    queries_ = {n: QUERIES[n] for n in names}
    oracles_ = {n: ORACLES[n] for n in names if n in ORACLES}
    return queries_, oracles_


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from data_pipeline_etl_spark.session import configure

    configure(spark)
    queries_, _ = _registry()
    return queries_["q_agg_groupby"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    queries_, _ = _registry()
    return dict(queries_)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every hash-checked query."""
    _, oracles_ = _registry()
    return dict(oracles_)
