"""Streaming sources (reference S5/S7).

The reference declares streams over Kafka topics with Avro schemas from
Schema Registry and ``auto.offset.reset=earliest``
(/root/reference/README.md:346, 396-400).  Two source forms here:

- ``file_stream``: the broker-free stand-in (SURVEY.md §7.2 phase 1) —
  a directory of parquet/json files is the topic, file arrival order is
  offset order, and the checkpoint's processed-file log plays the
  consumer offset (a restarted query resumes exactly after the last
  processed file; a fresh checkpoint replays from the beginning =
  ``earliest``).
- ``kafka_source_options``: the exact option surface a real Kafka
  deployment swaps in (``subscribe``, ``startingOffsets``); kept as a
  builder because this container ships no Kafka broker or connector jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Continuous stream over a growing directory of files.

    ``max_files_per_trigger`` bounds micro-batch size the way
    ``maxOffsetsPerTrigger`` does for Kafka — at scale it is the
    backpressure knob that keeps state-store updates amortized.
    """
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def kafka_source_options(
    topic: str,
    brokers: str = "localhost:9092",
    starting_offsets: str = "earliest",
) -> dict[str, str]:
    """Option dict for ``spark.readStream.format("kafka")`` mirroring the
    reference's consumer config: ``subscribe`` = the CDC topic
    (README.md:397, 411, 422), ``startingOffsets='earliest'`` =
    ``SET 'auto.offset.reset'='earliest'`` (README.md:346)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def kafka_stream(spark: SparkSession, topic: str, **overrides: str) -> DataFrame:
    """Kafka source (requires the spark-sql-kafka connector jar on the
    classpath; not bundled in this container — use :func:`file_stream`
    for local runs)."""
    opts = kafka_source_options(topic)
    opts.update(overrides)
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()
