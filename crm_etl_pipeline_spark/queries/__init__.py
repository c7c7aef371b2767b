"""Query modules — importing this package fills registry.REGISTRY."""

from crm_etl_pipeline_spark.queries import (  # noqa: F401
    aggregates,
    bucketing_q,
    catalog_q,
    decode_q,
    embeddings_q,
    events_q,
    joins,
    llmops,
    multimodal_q,
    relational,
    scd_q,
    streaming_q,
    transforms,
    windows,
)
