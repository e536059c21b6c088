from data_pipeline_etl_spark.sources.tables import table, load_all

__all__ = ["table", "load_all"]
