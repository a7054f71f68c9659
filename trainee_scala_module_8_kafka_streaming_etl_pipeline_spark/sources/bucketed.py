"""Bucketed-table materialization: the batch analogue of Kafka's keyed
topic partitioning.

In the reference, co-partitioned topics are what make the keyed joins
cheap: customers are re-keyed by ``GROUP BY id`` so the stream-table
join reads co-located partitions (/root/reference/README.md:434-441,
:457), and derived streams persist to keyed topics
(/root/reference/README.md:464-466) that downstream queries consume
without re-partitioning.  On Spark, the same contract is a bucketed
table: ``bucketBy(n, key)`` at write time records the hash-partitioning
in the catalog, and every later equi-join or aggregation on that key
skips its shuffle (``Bucketed: true`` scans feeding a SortMergeJoin
with no Exchange).

At 100 TB this is the difference between shuffling the fact table once
per query and shuffling it once per *ingest*: pay the partitioning when
the data lands, amortize it over every downstream join.  Pick the
bucket count to target healthy task sizes (~128-512 MB of post-filter
data per bucket) and bucket both sides of a recurring join with the
SAME count — mismatched counts fall back to a shuffle on one side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def materialize_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed by ``keys`` (and optionally sorted
    within buckets, which lets merge joins skip their per-bucket sort
    too).  The bucketing metadata lives in the session catalog; read it
    back with :func:`bucketed`."""
    writer = df.write.bucketBy(n_buckets, *keys)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.mode(mode).saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; joins/aggs on the bucket keys are
    exchange-free."""
    return spark.table(table)
