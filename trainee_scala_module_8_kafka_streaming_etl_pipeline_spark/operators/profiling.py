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


def assign_drift_bins(
    df: DataFrame,
    mid_us,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    n_bins: int = 20,
    bin_width: float = 25.0,
) -> DataFrame:
    """Per-row (grp, period, bin) assignment against a snapshot boundary
    ``mid_us`` (epoch micros; a Column or literal).  Narrow projection —
    the shared front half of batch and streaming PSI."""
    return df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.when(F.unix_micros(ts_col) < mid_us, F.lit("ref"))
        .otherwise(F.lit("cur"))
        .alias("period"),
        F.greatest(
            F.lit(0),
            F.least(
                F.floor(F.col(value_col) / F.lit(bin_width)), F.lit(n_bins - 1)
            ),
        ).cast("int").alias("bin"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust outlier screen by median absolute deviation: exact median
    per group, then the median of absolute deviations, then a count of
    points beyond ``k``×MAD.  Three passes over the fact table, but each
    reduction is a group-cardinality aggregate whose result BROADCASTS
    back — the raw table is never shuffled, so the plan is three scans +
    map-side joins, the right trade at 100 TB (percentile state stays
    tiny)."""
    e = df.select(group_col, value_col)
    med = e.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5D)").alias("median_value")
    )
    dev = e.join(F.broadcast(med), group_col).withColumn(
        "adev", F.abs(F.col(value_col) - F.col("median_value"))
    )
    stats = dev.groupBy(group_col).agg(
        F.round(F.any_value("median_value"), 6).alias("median_value"),
        F.round(F.expr("percentile(adev, 0.5D)"), 6).alias("mad"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        e.join(F.broadcast(stats), group_col)
        .groupBy(group_col, "median_value", "mad", "n_events")
        .agg(
            F.count(
                F.when(
                    F.abs(F.col(value_col) - F.col("median_value"))
                    > F.lit(k) * F.col("mad"),
                    1,
                )
            ).alias("n_outliers")
        )
    )


def psi_from_counts(
    counts: DataFrame,
    group_col: str = "event_type",
    n_bins: int = 20,
    threshold: float = 0.1,
) -> DataFrame:
    """PSI per group from a (grp, period, bin, c) count table — the
    mergeable histogram state both the batch operator and the streaming
    monitor reduce to.  Builds the full bin spine (so Laplace smoothing
    covers bins no row hit), then one O(groups x bins) aggregate."""
    spine = (
        counts.select("grp")
        .distinct()
        .crossJoin(
            F.broadcast(
                counts.sparkSession.range(1)
                .select(F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"))
                .select(F.col("bin").cast("int").alias("bin"))
            )
        )
    )
    full = (
        spine.join(
            counts.groupBy("grp", "bin").pivot("period", ["ref", "cur"]).sum("c"),
            ["grp", "bin"],
            "left",
        )
        .select(
            "grp",
            "bin",
            F.coalesce("ref", F.lit(0)).alias("c_ref"),
            F.coalesce("cur", F.lit(0)).alias("c_cur"),
        )
    )
    totals = full.groupBy("grp").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    p_ref = (F.col("c_ref") + 1).cast("double") / (F.col("n_ref") + n_bins)
    p_cur = (F.col("c_cur") + 1).cast("double") / (F.col("n_cur") + n_bins)
    return (
        full.join(totals, "grp")
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.first("n_ref").alias("n_ref"),
            F.first("n_cur").alias("n_cur"),
            F.round(F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)), 6).alias("psi"),
        )
        .withColumn("drifted", (F.col("psi") >= threshold).cast("int"))
    )


def psi_drift(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    n_bins: int = 20,
    bin_width: float = 25.0,
    threshold: float = 0.1,
) -> DataFrame:
    """Population Stability Index between the first and second half of
    the table's time span, per group — the standard drift check a
    pipeline runs between a reference snapshot and a fresh ingest
    before retraining on it.

    Semantics: rows split into 'ref' (ts before the midpoint of
    [min_ts, max_ts]) and 'cur'; values bucket into ``n_bins``
    fixed-width bins (last bin open-ended); per group,
    PSI = sum_bins (p_cur - p_ref) * ln(p_cur / p_ref) with add-one
    (Laplace) smoothing so empty bins are defined.  PSI >= ``threshold``
    flags the group (0.1 is the conventional "some drift" cutoff).

    Scale shape: ONE pass computes the global time bounds (two scalars
    broadcast back), one narrow projection assigns (group, period, bin),
    and ONE map-side-combined aggregate reduces to at most
    groups x bins x 2 rows — everything after the scan is
    O(groups x bins), independent of row count.  No rand(), no window
    over the fact table, no driver-side row data.  The streaming
    monitor (streaming/drift.py) maintains the same count state
    incrementally and shares :func:`psi_from_counts`.
    """
    bounds = df.agg(
        F.min(ts_col).alias("_min_ts"), F.max(ts_col).alias("_max_ts")
    ).select(
        (
            (F.unix_micros("_min_ts") + F.unix_micros("_max_ts")) / F.lit(2)
        ).cast("bigint").alias("_mid_us")
    )
    binned = assign_drift_bins(
        df.crossJoin(F.broadcast(bounds)),
        F.col("_mid_us"),
        group_col, value_col, ts_col, n_bins, bin_width,
    )
    counts = binned.groupBy("grp", "period", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    return psi_from_counts(counts, group_col, n_bins, threshold)
