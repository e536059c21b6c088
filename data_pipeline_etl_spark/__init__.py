"""data_pipeline_etl_spark — a PySpark-native analytics/ETL engine.

A ground-up, Spark-first re-expression of the capability surface of the
reference repo ``biglala89/Data_Pipeline_ETL`` (see SURVEY.md §0: the
reference mount is empty; SURVEY.md §2's operator inventory is the binding
contract), extended with LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) designed for 100 TB scale.

Everything is a DataFrame: operators are declarative Catalyst plans, never
driver-side loops. See ``registry.py`` for the query/oracle contract.
"""

from data_pipeline_etl_spark.registry import QUERIES, ORACLES, query
from data_pipeline_etl_spark.session import get_spark, configure
from data_pipeline_etl_spark.sources.tables import table, load_all

__all__ = ["QUERIES", "ORACLES", "query", "get_spark", "configure", "table", "load_all"]
