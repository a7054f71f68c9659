"""Table catalog over the driver's parquet test data.

The reference pulls schemas from Schema Registry at declaration time
(/root/reference/README.md:389); our equivalent is parquet footers plus
this central registry, so every operator sees one consistent schema
source (SURVEY.md §1.2).

At scale these would be external tables (Hive/Unity/Glue) over
partitioned parquet; the loader keeps the same ``load(spark, dir, name)``
surface so swapping in a metastore is a one-liner.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

# Driver-provided tables (/root/repo/TESTDATA.md): TPC-H-ish star schema
# plus an event stream, documents and embeddings for the LLM-pipeline ops.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Tables whose parquet files carry INT64 TIMESTAMP(NANOS) columns, which
# Spark's vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL).  With
# `spark.sql.legacy.parquet.nanosAsLong` those columns surface as raw
# nanosecond longs; we convert back to microsecond timestamps here so every
# consumer sees a true TimestampType.  (DuckDB's native TIMESTAMP is also
# microseconds, so the oracle comparison sees identical values.)
_NANOS_TS_COLS = {"events": ("ts",)}


def _apply_session_confs(spark: SparkSession) -> None:
    # Load-bearing confs live here (not in a session factory) because the
    # driver owns the SparkSession; both are safe to set at runtime.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Deterministic event-time rendering/hashing across engines.
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table. Column pruning + predicate pushdown reach
    the parquet scan because this is a plain declarative source."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    _apply_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        dt = df.schema[col].dataType
        if isinstance(dt, LongType):
            # `div` = exact integer division (float division of ~1.7e18-ns
            # values loses sub-microsecond precision in a double).
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
        elif isinstance(dt, TimestampNTZType):
            # Newer generator writes legal timestamp[us] without a zone;
            # with the session zone pinned to UTC this cast is value-exact
            # and gives every consumer the TimestampType they were built
            # against (unix_micros etc. reject NTZ inputs).
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` queries mirror
    the DuckDB oracle environment exactly."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
