"""Group K — UDF / UDAF surface (SURVEY.md §2.K).

UDFs are the slow path by policy: everything expressible as a builtin is a
builtin elsewhere in this engine. These three queries exist to prove the
extension points, each in its fastest available form:
- scalar Python UDF (row-at-a-time — the bottom tier, kept off hot paths);
- pandas UDF (Arrow-batched, vectorized NumPy inside);
- applyInPandas grouped-map UDAF (Arrow batch per group; the group key
  must be a real partition key — here user_id — so state never crosses
  executors).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_etl_spark.registry import query
from data_pipeline_etl_spark.sources.tables import table


@query(
    "q_udf_python",
    oracle="""
    SELECT doc_id,
           length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS norm_len
    FROM documents
    """,
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Python UDF: whitespace-normalize text, emit its length."""

    @F.udf("string")
    def normalize(s: str) -> str:
        return " ".join(s.lower().split())

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", F.length(normalize("text")).cast("long").alias("norm_len"))


@query(
    "q_udf_pandas",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(generate_series(1, len(embedding)),
                 i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF: L2 norm of the embedding column (float64)."""

    @F.pandas_udf("double")
    def l2_norm(vecs: pd.Series) -> pd.Series:
        return vecs.map(
            lambda v: float(np.sqrt(np.sum(np.asarray(v, dtype=np.float64) ** 2)))
        )

    e = table(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.round(l2_norm("embedding"), 6).alias("l2_norm"))


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT user_id, round(quantile_cont(CAST(gap_us AS DOUBLE), 0.5), 6) AS med_gap_us
    FROM (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF: per-user median inter-event gap (µs).

    numpy's even-count median (mean of the two middle values) is exactly
    DuckDB's quantile_cont(0.5) interpolation.

    Payload discipline (r6, VERDICT r5 item 3): the inter-event gap is
    computed JVM-side via a lag window over (ts, event_id) BEFORE the
    Python boundary, so each Arrow group batch carries one narrow int64
    column (user_id, gap_us) instead of (user_id, event_id, ts) — the
    grouped-map semantics (a true per-group pandas frame) are unchanged,
    the per-group transfer bytes roughly halve, and the sort that the
    old kernel did per group in pandas happens once in the window
    exchange. Cost model (measured at sf0.1): ~3 ms/group of fixed
    Arrow/pandas overhead still dominates — the grouped-map tier is for
    logic that genuinely needs a per-group DataFrame; this median could
    be a builtin percentile at ~10× less cost (cf. q_agg_percentile).
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    um = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = (
        e.select("user_id", "event_id", "ts")
        .withColumn("gap_us", (um - F.lag(um).over(w)).cast("long"))
        .where(F.col("gap_us").isNotNull())
        .select("user_id", "gap_us")
    )

    def median_gap(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "med_gap_us": [
                    round(float(np.median(pdf["gap_us"].to_numpy(dtype=np.float64))), 6)
                ],
            }
        )

    return gaps.groupBy("user_id").applyInPandas(
        median_gap, "user_id BIGINT, med_gap_us DOUBLE"
    )
