"""PySpark-native analytics engine with the capabilities of the reference
Kafka-streaming ETL pipeline (Thevic16/trainee-scala-module-8-Kafka-streaming-ETL-pipeline).

The reference expresses its entire query surface as ksqlDB statements +
Kafka Connect connector configs (see /root/repo/SURVEY.md). This package
re-expresses that surface — and a superset needed by large-scale training
data pipelines — as idiomatic PySpark: DataFrame/SQL logical plans that
Catalyst/Tungsten optimize, plus Structured Streaming for the continuous
(EMIT CHANGES) semantics.

Layout:
    session     — tuned SparkSession builder (AQE, UTC, broadcast thresholds)
    catalog     — table registry over the driver's parquet test data
    operators/  — compaction (latest_by_offset), joins (enrichment,
                  interval, as-of), CDC envelope unwrap, dedup, similarity
    functions/  — text analysis & vector helpers (JVM-side expressions)
    plans/      — composed pipelines (the flagship shipped_orders plan)
    streaming/  — Structured Streaming equivalents + keyed upsert sink
    sources/    — batch/streaming source helpers (parquet, file-stream, CDC)
"""

__version__ = "0.1.0"
