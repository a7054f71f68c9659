"""Continuously-maintained cohort-retention matrix.

The A3 pattern (materialized-table maintenance) applied to a composed
analytic: the cohort matrix needs each user's FIRST-seen week (which a
late-arriving earlier event can retroactively change) and the distinct
(user, week) activity set.  Maintaining the matrix cells directly would
need retraction logic; maintaining the two UPSTREAM states makes every
merge idempotent:

  - first-seen: per-user min(week) — min is associative, commutative,
    idempotent; a late earlier event simply lowers the min, silently
    re-cohorting the user;
  - activity:   distinct (user, week) — set union, likewise idempotent.

The matrix (cohort_week, week_offset, n_active, retention) is DERIVED
at read time from the tiny state (O(users) + O(users x active-weeks)
rows), so retroactive cohort moves need no retraction — the next read
just sees the new assignment.  Idempotence means re-delivered batches
are harmless, so the state commits with the plain versioned pointer
swap (streaming/upsert.write_version), not the version-per-batch
protocol the additive sinks need.

Batch-split invariance holds under ANY arrival order — stronger than
the id-ordered contract the dedup streams require — because both
merges are order-insensitive.  The DuckDB oracle is therefore the
batch cohort_matrix SQL over the same rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .upsert import read_state, write_version

_COLS = ["user_id", "wk", "kind"]


def _batch_state(batch_df: DataFrame) -> DataFrame:
    ev = batch_df.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    )
    first = (
        ev.groupBy("user_id")
        .agg(F.min("wk").alias("wk"))
        .select("user_id", "wk", F.lit("first").alias("kind"))
    )
    act = ev.distinct().select("user_id", "wk", F.lit("act").alias("kind"))
    return first.unionByName(act)


def merge_cohort_batch(batch_df: DataFrame, state_dir: str) -> None:
    """state' = idempotent merge(state, batch): per-user min for the
    'first' rows, distinct union for the 'act' rows."""
    bs = _batch_state(batch_df)
    prior = read_state(batch_df.sparkSession, state_dir)
    both = bs if prior is None else prior.select(*_COLS).unionByName(bs)
    first = (
        both.filter(F.col("kind") == "first")
        .groupBy("user_id")
        .agg(F.min("wk").alias("wk"))
        .select("user_id", "wk", F.lit("first").alias("kind"))
    )
    act = (
        both.filter(F.col("kind") == "act")
        .select("user_id", "wk")
        .distinct()
        .select("user_id", "wk", F.lit("act").alias("kind"))
    )
    write_version(first.unionByName(act), state_dir)


def run_cohort_stream(stream_df: DataFrame, state_dir: str) -> None:
    q = (
        stream_df.writeStream.foreachBatch(
            lambda b, _i: merge_cohort_batch(b, state_dir)
        )
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_cohort_matrix(spark: SparkSession, state_dir: str) -> DataFrame:
    """Derive the retention matrix from the maintained state — the
    identical shape as the batch cohort_matrix operator."""
    state = read_state(spark, state_dir)
    first = state.filter(F.col("kind") == "first").select(
        "user_id", F.col("wk").alias("cohort_week")
    )
    act = state.filter(F.col("kind") == "act").select("user_id", "wk")
    size_ = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = (
        act.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(F.datediff("wk", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return cells.join(F.broadcast(size_), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_size"), 6
        ).alias("retention"),
    )

