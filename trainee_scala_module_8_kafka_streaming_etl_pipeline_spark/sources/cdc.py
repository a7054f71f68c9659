"""CDC source surface (reference S1/S2).

A Debezium change record is modeled as columns:

    after   STRUCT<...>   -- new row/document state (null for tombstone)
    op      STRING        -- 'c'reate / 'u'pdate / 'd'elete / 'r'ead
    _offset BIGINT        -- topic offset (arrival order)

matching the field names Debezium emits, so the unwrap transforms
(operators.cdc) apply unchanged to a real Debezium topic decoded with
``from_avro``/``from_json``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..streaming.sources import file_stream


def envelope_schema(state_schema: StructType) -> StructType:
    """Debezium-shaped envelope schema around a row-state struct."""
    return StructType(
        [
            StructField("after", state_schema),
            StructField("op", StringType()),
            StructField("_offset", LongType()),
        ]
    )


def cdc_envelope_stream(
    spark: SparkSession,
    path: str,
    state_schema: StructType,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Continuous CDC stream over a growing directory of change-record
    files — the reference's snapshot-then-tail behavior falls out of the
    file source: existing files are the snapshot (S7 ``earliest``), new
    files are the tail, and the checkpoint resumes exactly after the
    last processed file."""
    return file_stream(
        spark,
        path,
        envelope_schema(state_schema),
        fmt=fmt,
        max_files_per_trigger=max_files_per_trigger,
    )


def postgres_source_config(
    db: str = "postgres",
    table_whitelist: str = "public.customers",
    slot_name: str = "customers_reader",
) -> dict[str, str]:
    """The reference's Postgres CDC connector options
    (/root/reference/README.md:352-365): logical-decoding source with the
    ExtractNewRecordState unwrap, tombstones kept, deletes rewritten."""
    return {
        "connector.class": "io.debezium.connector.postgresql.PostgresConnector",
        "database.dbname": db,
        "table.whitelist": table_whitelist,
        "slot.name": slot_name,
        "transforms": "unwrap",
        "transforms.unwrap.type": "io.debezium.transforms.ExtractNewRecordState",
        "transforms.unwrap.drop.tombstones": "false",
        "transforms.unwrap.delete.handling.mode": "rewrite",
    }


def mongo_source_config(
    replica_set: str = "my-replica-set",
    collection_whitelist: str = "logistics.*",
) -> dict[str, str]:
    """The reference's MongoDB CDC connector options
    (/root/reference/README.md:371-385): oplog-tail source with the
    document unwrap, deletes dropped, op carried in a header."""
    return {
        "connector.class": "io.debezium.connector.mongodb.MongoDbConnector",
        "mongodb.name": replica_set,
        "collection.whitelist": collection_whitelist,
        "transforms": "unwrap",
        "transforms.unwrap.type": (
            "io.debezium.connector.mongodb.transforms.ExtractNewDocumentState"
        ),
        "transforms.unwrap.drop.tombstones": "false",
        "transforms.unwrap.delete.handling.mode": "drop",
        "transforms.unwrap.operation.header": "true",
    }
