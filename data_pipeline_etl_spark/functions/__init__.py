"""Scalar-function surface. Importing registers the group-H queries."""

import data_pipeline_etl_spark.functions.scalar  # noqa: F401
import data_pipeline_etl_spark.functions.scalar2  # noqa: F401
