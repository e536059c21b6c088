"""Parquet table sources for the fixture star schema.

All timestamp columns are surfaced as TIMESTAMP_NTZ (naive, matching
DuckDB's TIMESTAMP) so every downstream comparison is timezone-free.

``events.ts`` trap (SURVEY.md §1.3, FIXTURES.md): the parquet type is INT64
TIMESTAMP(NANOS). With ``spark.sql.legacy.parquet.nanosAsLong=true`` it
arrives as a nanosecond long; we convert with *integer* division
``ts div 1000`` (exact — a double-division path could lose ULPs at 1e18 ns)
then ``timestamp_micros`` → NTZ cast under the UTC session timezone. This
equals DuckDB's native ns→µs truncation bit-for-bit for the fixture's
positive timestamps.

Scale note (100 TB): reads are plain ``spark.read.parquet`` so partition
pruning / predicate pushdown / column pruning all apply; at cluster scale
point this at a partitioned table root instead of a single file — the
operator code is agnostic to layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_etl_spark.session import configure

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Logical-plan cache: keyed by (session id, sf_dir, table). DataFrames are
# lazy; caching avoids re-reading parquet footers per query, not data.
_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir.rstrip("/"), name)
    if key not in _CACHE:
        configure(spark)
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
        if name == "events":
            # ns long → µs (exact integer div) → NTZ timestamp (UTC session).
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        _CACHE[key] = df
    return _CACHE[key]


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}
