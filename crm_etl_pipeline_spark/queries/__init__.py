"""Query modules — importing this package fills registry.REGISTRY."""

from crm_etl_pipeline_spark.queries import relational  # noqa: F401
