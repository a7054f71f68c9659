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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table. Column pruning + predicate pushdown reach
    the parquet scan because this is a plain declarative source."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` queries mirror
    the DuckDB oracle environment exactly."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
