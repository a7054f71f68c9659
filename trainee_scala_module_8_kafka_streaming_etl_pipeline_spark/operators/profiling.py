"""Dataset profiling: one-pass per-column QA statistics.

The first step of any large-scale data pipeline is knowing what's in
the table — null rates, cardinalities, value ranges — the "profile the
source" stage a warehouse runs before trusting a feed (the reference
trusts Schema Registry for shape but nothing checks content;
/root/reference/README.md:389).

Scale shape: profiling N columns with per-column aggregate expressions
plans an EXPAND of N × rows when distinct counts are involved.  This
operator instead melts the selected columns into (column, value)
pairs — a narrow in-partition explode — and runs ONE grouped aggregate
keyed by column name.  The distinct count is planned as a two-level
aggregate (partial distinct on (column, value), then count), so every
step map-side combines and no executor ever holds more than its
partition's distinct values.  Values are profiled through a canonical
string rendering chosen per-type by the caller (decimal-cast for
floats), which keeps min/max deterministic and engine-portable
(lexicographic on the rendered form).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[tuple[str, Column]]
) -> DataFrame:
    """Profile ``cols`` (name, string-rendered expression) in one pass.

    Returns one row per column: total rows, null fraction, distinct
    count, and lexicographic min/max of the rendered values.
    """
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("column"),
                        expr.cast("string").alias("value"),
                    )
                    for name, expr in cols
                ]
            )
        ).alias("kv")
    ).select("kv.*")
    return stacked.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            (F.count(F.lit(1)) - F.count("value")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("null_frac"),
        F.countDistinct("value").alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
