"""crm_etl_pipeline_spark — a PySpark-native analytics & ETL engine.

Brand-new engine with the query and data-processing capabilities of the
bseljes/CRM-ETL-Pipeline reference (see SURVEY.md), re-expressed
Spark-first: DataFrame/SQL declarative plans optimized by Catalyst,
Structured Streaming for the event pipeline, and LLM-data-pipeline
extension operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.
"""

__version__ = "0.1.0"
