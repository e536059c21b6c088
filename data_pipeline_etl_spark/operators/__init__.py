"""Operator modules. Importing this package registers every declared query."""

import data_pipeline_etl_spark.operators.scans  # noqa: F401
import data_pipeline_etl_spark.operators.filters  # noqa: F401
import data_pipeline_etl_spark.operators.joins  # noqa: F401
import data_pipeline_etl_spark.operators.aggregates  # noqa: F401
import data_pipeline_etl_spark.operators.windows  # noqa: F401
import data_pipeline_etl_spark.operators.sorts  # noqa: F401
import data_pipeline_etl_spark.operators.setops  # noqa: F401
import data_pipeline_etl_spark.operators.reshape  # noqa: F401
import data_pipeline_etl_spark.operators.llm_dedup  # noqa: F401
import data_pipeline_etl_spark.operators.llm_similarity  # noqa: F401
import data_pipeline_etl_spark.operators.llm_text  # noqa: F401
import data_pipeline_etl_spark.operators.llm_multimodal  # noqa: F401
import data_pipeline_etl_spark.operators.llm_pipeline  # noqa: F401
import data_pipeline_etl_spark.operators.llm_corpus  # noqa: F401
import data_pipeline_etl_spark.operators.udfs  # noqa: F401
import data_pipeline_etl_spark.operators.quality  # noqa: F401
import data_pipeline_etl_spark.operators.warehouse  # noqa: F401
import data_pipeline_etl_spark.operators.semistructured  # noqa: F401
