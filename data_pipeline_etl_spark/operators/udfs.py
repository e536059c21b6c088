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

    Cost model (measured at sf0.1): ~3 ms per group of Arrow/pandas
    overhead dominates — 1500 users ≈ 5 s regardless of row count. The
    grouped-map tier is for logic that genuinely needs a per-group
    DataFrame; this median could be a builtin percentile over a lag
    window at ~10× less cost (cf. q_agg_percentile, q_win_lag_lead).
    """
    e = table(spark, sf_dir, "events")

    def median_gap(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        gaps = pdf["ts"].astype("int64").diff().dropna()
        if len(pdf) and pdf["ts"].dtype != "datetime64[us]":
            # arrow may hand us datetime64[ns]; normalize to µs
            gaps = pdf["ts"].astype("datetime64[us]").astype("int64").diff().dropna()
        if gaps.empty:
            return pd.DataFrame({"user_id": [], "med_gap_us": []})
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "med_gap_us": [round(float(np.median(gaps.to_numpy(dtype=np.float64))), 6)],
            }
        )

    grouped = e.select("user_id", "event_id", "ts").groupBy("user_id")
    return grouped.applyInPandas(median_gap, "user_id BIGINT, med_gap_us DOUBLE")
