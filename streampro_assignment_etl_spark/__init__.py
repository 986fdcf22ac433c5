"""streampro_assignment_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``ndias021/streampro-assignment-etl``
(medallion ETL: landing -> raw -> trusted zones + a DuckDB/Trino analytics
workload), extended with large-scale training-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).

Design stance (see SURVEY.md §7.0):
  * Declarative DataFrame/SQL plans; Catalyst + AQE pick physical strategy.
  * Columnar Parquet at rest, Hive-style ``ingestion_date`` partitioning.
  * Structured Streaming as the idiomatic upgrade for the event feed.
  * Python UDFs only where built-ins genuinely cannot express semantics,
    and then always Arrow-batched (pandas UDF / mapInPandas).
"""

__version__ = "0.1.0"
