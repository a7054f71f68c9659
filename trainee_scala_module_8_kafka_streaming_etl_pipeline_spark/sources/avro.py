"""Avro value-format surface (reference S5: ``value_format='avro'``).

The reference's streams carry Avro-encoded values whose schemas live in
Schema Registry (/root/reference/README.md:389, 398, 412, 423;
docker-compose.yml:102-103). In Spark the equivalent is
``from_avro(value, schema)`` over a Kafka source. This module supplies
the two halves of that surface:

- :func:`avro_schema_for` — the Schema-Registry-shaped schema: a pure
  StructType -> Avro record-schema mapping (what the registry would
  store for each topic). Pure Python, fully unit-tested.
- :func:`decode_value` / :func:`encode_value` — thin wrappers over
  ``pyspark.sql.avro.functions``. The spark-avro datasource is an
  external jar (``--packages org.apache.spark:spark-avro_2.13:<ver>``);
  this container does not ship it, so the wrappers raise a clear
  RuntimeError at *call* time when the jar is absent instead of an
  opaque AnalysisException at action time. On a cluster with the jar
  present they are zero-overhead pass-throughs.
"""

from __future__ import annotations

import json

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PRIMITIVES: dict[type, str] = {
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.BinaryType: "bytes",
    T.DateType: {"type": "int", "logicalType": "date"},
    T.TimestampType: {"type": "long", "logicalType": "timestamp-micros"},
    T.TimestampNTZType: {"type": "long", "logicalType": "local-timestamp-micros"},
}


def _field_type(dt: T.DataType):
    for spark_t, avro_t in _PRIMITIVES.items():
        if isinstance(dt, spark_t):
            return avro_t
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.ArrayType):
        items = _field_type(dt.elementType)
        if dt.containsNull:
            items = ["null", items]
        return {"type": "array", "items": items}
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise TypeError("Avro maps require string keys")
        values = _field_type(dt.valueType)
        if dt.valueContainsNull:
            values = ["null", values]
        return {"type": "map", "values": values}
    if isinstance(dt, T.StructType):
        return _record(dt, "nested")
    raise TypeError(f"no Avro mapping for Spark type {dt!r}")


def _record(schema: T.StructType, name: str) -> dict:
    fields = []
    for f in schema.fields:
        ft = _field_type(f.dataType)
        if f.nullable:
            ft = ["null", ft]
        fields.append({"name": f.name, "type": ft})
    return {"type": "record", "name": name, "fields": fields}


def avro_schema_for(schema: T.StructType, name: str = "value") -> str:
    """Avro record schema (JSON string) for a Spark StructType — the
    document Schema Registry would hold for the topic's value."""
    return json.dumps(_record(schema, name))


def _require_avro(spark) -> None:
    jvm_check = spark._jvm.org.apache.spark.sql.execution.datasources.DataSource
    try:
        jvm_check.lookupDataSource("avro", spark._jsparkSession.sessionState().conf())
    except Exception as exc:  # jar absent
        raise RuntimeError(
            "spark-avro is not on the classpath; start the session with "
            "--packages org.apache.spark:spark-avro_2.13:<spark version> "
            "to decode Avro topic values"
        ) from exc


def decode_value(spark, value_col: Column | str, schema_json: str) -> Column:
    """``from_avro(value, schema)`` with an actionable availability check."""
    _require_avro(spark)
    from pyspark.sql.avro.functions import from_avro

    return from_avro(F.col(value_col) if isinstance(value_col, str) else value_col,
                     schema_json)


def encode_value(spark, cols: Column) -> Column:
    """``to_avro(struct)`` with an actionable availability check."""
    _require_avro(spark)
    from pyspark.sql.avro.functions import to_avro

    return to_avro(cols)
