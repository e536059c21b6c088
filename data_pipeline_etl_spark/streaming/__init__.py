"""Streaming surface: batch-checked window/session/dedup queries (group I)
plus true Structured Streaming jobs (tests-only, see streaming/jobs.py)."""

import data_pipeline_etl_spark.streaming.batch_windows  # noqa: F401
