"""Query registry: the SURVEY.md §2 contract surface.

Every declared operator registers itself here with a name (exactly the §2
key), a callable ``(spark, sf_dir) -> DataFrame``, and (when the semantics
are ANSI-SQL-expressible) a DuckDB oracle SQL string. ``__spark_entry__.py``
exposes these dicts verbatim to the driver.

Rules enforced by convention (SURVEY.md §5.3):
- every computed column is aliased identically in the Spark query and the
  oracle SQL (schema participates in the driver's hash check);
- float aggregates of float32 inputs and similarity scores are rounded to
  <= 6 dp on both sides;
- no bare LIMIT without a total order + key tiebreak.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared operator. ``oracle=None`` => rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module so decorators run (idempotent)."""
    import data_pipeline_etl_spark.operators  # noqa: F401
    import data_pipeline_etl_spark.functions  # noqa: F401
    import data_pipeline_etl_spark.streaming  # noqa: F401
