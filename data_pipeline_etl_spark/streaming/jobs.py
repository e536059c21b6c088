"""True Structured Streaming jobs (SURVEY.md §2.I tests-only rows).

Batch/stream equivalence is the correctness contract: each job reuses the
*same* transformation functions as the batch-checked group-I queries, fed
from a file-source stream, and the tests assert the streamed result equals
the batch result (tests/test_streaming.py).

Scale notes: watermarks bound state (late events beyond the watermark are
dropped, so per-key state is finite); ``availableNow`` triggers process a
backlog with bounded batches; file sources list directories incrementally.
On a cluster the same code runs against Kafka by swapping the source.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_file_stream(spark: SparkSession, src_dir: str, with_watermark: str | None = None) -> DataFrame:
    """A streaming DataFrame over parquet files shaped like ``events``.

    ``src_dir`` holds parquet part-files (the tests split the fixture's
    rows into several files to force multiple micro-batches).
    """
    schema = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src_dir)
    if with_watermark:
        stream = stream.withWatermark("ts", with_watermark)
    return stream


def tumbling_counts(df: DataFrame) -> DataFrame:
    """1-day tumbling counts per event type — same expression as the
    batch-checked q_stream_tumbling."""
    return (
        df.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("day_start"), "event_type", "n", "total")
    )


def sessionize(df: DataFrame) -> DataFrame:
    """30-minute-gap session windows per user (streaming-capable agg)."""
    return (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.min("ts").alias("sess_start"), F.count("*").alias("n_events"))
        .select("user_id", "sess_start", "n_events")
    )


def dedup_within_watermark(df: DataFrame) -> DataFrame:
    """Stateful exact dedup on event_id, state bounded by the watermark."""
    return df.dropDuplicatesWithinWatermark(["event_id"])


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Execute a streaming query to an in-memory sink until the file
    backlog is drained (availableNow trigger)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """foreachBatch sink: append each micro-batch to partitioned parquet —
    the streaming flavor of the reference's warehouse-load step."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(os.path.join(out_dir, f"batch={batch_id}"))
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
