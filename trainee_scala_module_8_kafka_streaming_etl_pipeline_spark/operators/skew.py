"""Skew-aware join: explicit key salting for hot keys.

AQE's skew-join split (enabled in session.build_session) handles most
skew at runtime by splitting oversized partitions, but it only helps
sort-merge joins and only after a shuffle materializes the skew.
Explicit salting is the planning-time tool for the pathological case —
a handful of keys holding a double-digit percentage of a 100 TB fact
table:

  fact side:  key -> (key, salt) with salt = pmod(hash(row id), S)
              — each hot key's rows spread over S sub-partitions
  dim side:   each row replicated S times, once per salt value

The join runs on (key, salt); results are identical to the unsalted
join (each fact row meets each matching dim row exactly once, under
exactly one salt).  Cost: dim side x S replication — use only when the
dim side is small relative to the skew being dissolved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as PyWindow
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[tuple[str, str]],
    salt_partitions: int = 8,
    salt_by: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on ``on`` = [(fact_col, dim_col)]
    with the fact side salted across ``salt_partitions`` sub-keys.

    ``salt_by`` defaults to a hash of the whole fact row — any
    expression with high cardinality within a hot key works.  Results
    match ``fact.join(dim, ...)`` exactly (one output row per matching
    fact x dim pair).
    """
    if salt_by is None:
        salt_by = F.hash(*[F.col(c) for c in fact.columns])
    f = fact.withColumn(SALT_COL, F.pmod(salt_by, F.lit(salt_partitions)))
    d = dim.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salt_partitions - 1))),
    )
    cond = f[SALT_COL] == d[SALT_COL]
    for fc, dc in on:
        cond = cond & (f[fc] == d[dc])
    return f.join(d, cond, how).drop(SALT_COL)


def coarse_group_rank(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    n_slices: int | None = None,
    slice_col: str | None = None,
    extra_order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Distributed rank/cume counts within LOW-CARDINALITY groups — the
    two-pass quantile-sliced rank (round 10).

    ``Window.partitionBy(coarse_key)`` funnels each group's whole row
    set through ONE task (25 nations over 1.5B customers = 60M rows per
    window buffer at the 100 TB design point) and, as with any window,
    AQE cannot split the partition.  Ranking has no algebraic escape —
    it inherently needs a per-group total order — so the scalable form
    is the classic two-pass:

    1. Slice the ORDER domain by approx quantiles of ``order_col``
       (one sampling pass; the boundaries come back to the driver and
       become LITERALS, so slice assignment is a pure value function —
       deterministic however many times Catalyst re-executes the
       subtree.  A first cut derived slices from
       repartitionByRange + spark_partition_id and was REJECTED: the
       two consumers of the sliced frame re-sampled different range
       boundaries and the offsets disagreed with the local ranks.)
    2. Local rank inside each (slice, group): a window keyed on BOTH,
       so every window partition is bounded by the quantile width
       (~|data| / n_slices), never by group size — and the window's
       hash exchange is the ONLY full-data shuffle, same count as the
       naive window form.
    3. One tiny aggregate of per-(slice, group) row counts -> running
       offsets per group (a window over the O(slices x groups) count
       table), broadcast-joined back.  ``rank = local_rank + offset``:
       every row in a lower slice of the same group orders strictly
       below (boundary comparisons are on the order value), and ties
       never straddle slices (equal values get equal slice ids), so
       min-rank tie semantics survive.

    Output: the input columns plus ``rnk`` (rank, ties share min),
    ``n_le`` (rows ordered <= current, ties included — the cume_dist
    numerator) and ``np`` (group size).  Values are IDENTICAL to the
    single-window form — callers can gate on group cardinality and
    keep the plain window for fine-grained groups.

    Non-numeric or composite orders: ``slice_col`` takes a SQL
    expression (evaluating to double) that is MONOTONE NON-DECREASING
    in the order — e.g. the first 15 hex digits of an md5 string as a
    bigint — so boundary comparisons respect the real ordering while
    the fine-grained comparisons stay inside the per-slice window.
    ``extra_order_cols`` appends tiebreak columns to the window's
    ORDER BY; correctness holds because order_col ties always share a
    slice (the surrogate maps equal prefixes to equal slices), so the
    tiebreak comparisons never cross slices.

    Limit: a single value holding >1/n_slices of a group stays hot
    (ties MUST share a slice for exact rank semantics); such a value's
    rank is degenerate anyway, and the quantile boundaries bound every
    other slice.  Measured on a planted single-group corpus in
    SCALING.md (round 10).
    """
    spark = df.sparkSession
    if n_slices is None:
        n_slices = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if slice_col is None:
        slice_col = f"cast(`{order_col}` as double)"
    probs = [i / n_slices for i in range(1, n_slices)]
    bounds = (
        df.selectExpr(f"{slice_col} as _ob")
        .approxQuantile("_ob", probs, max(0.001, 1.0 / (4 * n_slices)))
    )
    bounds = sorted(set(bounds))
    if bounds:
        arr = "array({})".format(
            ",".join(f"cast({b!r} as double)" for b in bounds)
        )
        slice_expr = F.expr(f"size(filter({arr}, b -> b <= ({slice_col})))")
    else:
        slice_expr = F.lit(0)
    sliced = df.withColumn("_slice", slice_expr)

    wloc = PyWindow.partitionBy("_slice", *group_cols).orderBy(
        order_col, *extra_order_cols
    )
    local = (
        sliced.withColumn("_lrnk", F.rank().over(wloc))
        # default frame RANGE UNBOUNDED PRECEDING..CURRENT ROW: peers
        # included — the local n_le
        .withColumn("_lle", F.count(F.lit(1)).over(wloc))
    )

    counts = local.groupBy("_slice", *group_cols).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    woff = (
        PyWindow.partitionBy(*group_cols)
        .orderBy("_slice")
        .rowsBetween(PyWindow.unboundedPreceding, -1)
    )
    wtot = PyWindow.partitionBy(*group_cols)
    offsets = counts.select(
        "_slice",
        *group_cols,
        F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(wtot).alias("np"),
    )
    out = local.join(
        F.broadcast(offsets), ["_slice", *group_cols], "inner"
    ).select(
        *[c for c in df.columns],
        (F.col("_lrnk") + F.col("_off")).alias("rnk"),
        (F.col("_lle") + F.col("_off")).alias("n_le"),
        F.col("np"),
    )
    return out


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    salt_partitions: int | None = None,
) -> DataFrame:
    """Exact top-k rows per LOW-CARDINALITY group without a hot window
    partition — the quota-sampling / leaderboard shape of the round-10
    window-skew audit (``row_number() <= k`` over a coarse key ranks
    the ENTIRE group through one task to keep k rows).

    Two-level tournament, all JVM:

    1. Salt each row by a hash of its own columns (value-based, so
       deterministic under retries) and take the top-k of every
       (group, salt) cell — each cell's window partition holds
       ~|group| / S rows, and any row in the group's global top-k is
       necessarily in its cell's top-k.
    2. Re-rank the <= k*S survivors per group — a bounded window
       (k*S rows max, independent of data size) — and keep k.

    ``order_cols`` are Column expressions (e.g. ``F.desc(...)``); the
    caller must make the order TOTAL (unique tiebreak column last) for
    the emitted ``rnk`` to be reproducible — the same requirement the
    plain-window form has.

    Returns the input columns plus ``rnk`` (1..k within each group).
    """
    spark = df.sparkSession
    if salt_partitions is None:
        salt_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    salted = df.withColumn(
        SALT_COL,
        F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_partitions)),
    )
    wcell = PyWindow.partitionBy(SALT_COL, *group_cols).orderBy(*order_cols)
    survivors = (
        salted.withColumn("_crk", F.row_number().over(wcell))
        .filter(F.col("_crk") <= k)
        .drop(SALT_COL, "_crk")
    )
    wfin = PyWindow.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        survivors.withColumn("rnk", F.row_number().over(wfin))
        .filter(F.col("rnk") <= k)
    )
