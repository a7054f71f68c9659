"""Kafka / Avro connector smoke tests (reference S5/S8: Kafka topics
with value_format='avro', /root/reference/README.md:396-400, 464-466).

This container ships neither the spark-sql-kafka nor the spark-avro jar,
so these tests DETECT jar availability at runtime and skip cleanly when
absent; on a jar-equipped deployment they run for real:

- kafka: building the source plan via ``kafka_stream`` succeeds without
  any broker (connection happens at query start), so the smoke asserts
  the canonical Kafka record schema end-to-end through our builder.
- avro: a batch encode -> decode round-trip through ``to_avro`` /
  ``from_avro`` using the registry-shaped schema from
  ``avro_schema_for``.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources import avro
from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.streaming import (
    sources,
)


def _kafka_available(spark) -> bool:
    try:
        sources.kafka_stream(spark, "smoke-topic")
        return True
    except Exception as exc:  # noqa: BLE001 - jar-absent is the expected path
        assert "kafka" in str(exc).lower(), f"unexpected failure: {exc}"
        return False


def _avro_available(spark) -> bool:
    try:
        avro._require_avro(spark)
        return True
    except RuntimeError as exc:
        # the availability error must carry the actionable install hint
        assert "--packages" in str(exc)
        return False


def test_kafka_source_smoke_or_clean_skip(spark):
    if not _kafka_available(spark):
        pytest.skip("spark-sql-kafka jar not on the classpath")
    df = sources.kafka_stream(spark, "smoke-topic")
    assert df.isStreaming
    cols = set(df.columns)
    assert {"key", "value", "topic", "partition", "offset", "timestamp"} <= cols


def test_avro_roundtrip_or_clean_skip(spark):
    value_schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("age", T.IntegerType(), True),
        ]
    )
    schema_json = avro.avro_schema_for(value_schema, name="customer")
    if not _avro_available(spark):
        # the schema half is pure Python and must work regardless
        import json

        rec = json.loads(schema_json)
        assert rec["type"] == "record"
        assert [f["name"] for f in rec["fields"]] == ["id", "name", "age"]
        pytest.skip("spark-avro jar not on the classpath")
    rows = [("1", "sue", 25), ("2", "victor", 23)]
    df = spark.createDataFrame(rows, value_schema)
    encoded = df.select(
        avro.encode_value(spark, F.struct("id", "name", "age")).alias("value")
    )
    decoded = encoded.select(
        avro.decode_value(spark, "value", schema_json).alias("v")
    ).select("v.*")
    assert sorted(tuple(r) for r in decoded.collect()) == sorted(rows)


def test_avro_roundtrip_pure_python_always_runs(spark):
    """The jar-free half: the SAME Schema-Registry-shaped schema from
    avro_schema_for drives the pure-Python wire-format codec
    (sources/avro_codec.py), so the Avro value path EXECUTES in this
    container — only the spark-avro-jar variant above may skip."""
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_codec import (
        from_avro_py,
        to_avro_py,
    )

    value_schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("age", T.IntegerType(), True),
        ]
    )
    schema_json = avro.avro_schema_for(value_schema, name="customer")
    rows = [("1", "sue", 25), ("2", "victor", 23), ("3", None, None)]
    df = spark.createDataFrame(rows, value_schema)
    enc = to_avro_py(df, ["id", "name", "age"], schema_json)
    dec = from_avro_py(
        enc, "value", schema_json, "id string, name string, age int"
    )
    assert sorted(
        (r.id, r.name, r.age) for r in dec.collect()
    ) == sorted(rows)
