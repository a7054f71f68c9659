"""Data-layout operators: Z-order (Morton) interleaving for
multi-dimensional clustering.

Why at 100 TB: range-partitioning by a single column prunes scans on
that column only. Interleaving the bits of two columns into one Morton
key and range-partitioning/sorting by it gives every file a tight
bounding box in BOTH dimensions, so min/max file statistics prune scans
filtered on either column (the Delta/Iceberg ``ZORDER BY`` technique).
The key is a pure projection — computing it adds no shuffle; the
clustering itself is the one range exchange you were already paying
for the write.

The expression is emitted as engine-neutral SQL text (floor/division/
modulo only — no shift operators, which differ between dialects), so
the same string drives Spark's ``F.expr`` and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension -> 32-bit Morton key


def morton_sql(x_expr: str, y_expr: str, bits: int = ZBITS) -> str:
    """SQL text for the interleaved Morton key of two non-negative ints.

    Bit i of x lands at position 2i, bit i of y at 2i+1:
    ``sum_i (x DIV 2^i % 2) * 2^(2i)  +  (y DIV 2^i % 2) * 2^(2i+1)``.
    Uses only floor/'/'/%, valid and identical in Spark SQL and DuckDB.
    """
    terms = []
    for i in range(bits):
        p = 1 << i
        terms.append(f"(CAST(floor(({x_expr}) / {p}) AS BIGINT) % 2) * {1 << (2 * i)}")
        terms.append(
            f"(CAST(floor(({y_expr}) / {p}) AS BIGINT) % 2) * {1 << (2 * i + 1)}"
        )
    return "(" + " + ".join(terms) + ")"


def morton_key(x_expr: str, y_expr: str, bits: int = ZBITS) -> Column:
    return F.expr(morton_sql(x_expr, y_expr, bits))


def zorder_cluster(
    df: DataFrame,
    x_expr: str,
    y_expr: str,
    n_buckets: int,
    bits: int = ZBITS,
) -> DataFrame:
    """Assign each row to one of ``n_buckets`` contiguous Morton ranges.

    Bucket = z DIV (2^(2*bits) / n_buckets) — fixed-width ranges, no
    sampling pass, deterministic. For a real write you'd
    ``repartitionByRange(n, zkey).sortWithinPartitions(zkey)``; the
    bucket id here stands in for the file a row would land in, so the
    per-bucket min/max stats below are exactly the file-skipping stats
    the lakehouse would get.
    """
    span = (1 << (2 * bits)) // n_buckets
    # floor-then-cast: CAST(double AS BIGINT) truncates in Spark but
    # rounds in DuckDB — floor() first makes both engines agree.
    zb = f"CAST(floor({morton_sql(x_expr, y_expr, bits)} / {span}) AS BIGINT)"
    return df.withColumn("zbucket", F.expr(zb))


def write_zordered(
    df: DataFrame,
    path: str,
    x_expr: str,
    y_expr: str,
    n_files: int,
    bits: int = ZBITS,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of (x, y).

    ``repartitionByRange`` samples the key to cut ``n_files`` contiguous
    z-ranges (one range exchange — the shuffle any clustered write
    pays), and ``sortWithinPartitions`` orders rows inside each file so
    parquet row-group statistics are tight too. Every output file then
    covers a contiguous Morton range, giving bounded min/max extents in
    BOTH x and y — the file-skipping property ``zorder_cluster``'s
    stats report, here made physical.
    """
    keyed = df.withColumn("_zkey", morton_key(x_expr, y_expr, bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def backfill_partitions(
    df: DataFrame,
    path: str,
    partition_col: str,
) -> None:
    """Idempotent partition backfill: rewrite ONLY the partitions
    present in ``df``, leaving every other partition of the table
    untouched (Spark's dynamic partition overwrite).

    Why at 100 TB: reprocessing one bad day must not truncate the other
    ~1000 days (static overwrite mode deletes the whole table root),
    and appending instead of overwriting duplicates the day on every
    retry.  Dynamic overwrite makes the backfill job idempotent —
    rerunning it converges to the same table state — which is the
    property every scheduled/auto-retried pipeline needs from its
    sink.  The write itself adds no extra shuffle beyond the
    partitionBy clustering.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
