from data_pipeline_etl_spark.plans.audit import audit_plans

__all__ = ["audit_plans"]
