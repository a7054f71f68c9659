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


def _slice_expr(df: DataFrame, slice_col: str, n_slices: int):
    """Deterministic slice id for the two-pass window algebra: approx
    quantile boundaries of ``slice_col`` collected to the driver ONCE
    and baked in as literals, so slice assignment is a pure value
    function however many times Catalyst re-executes the subtree (the
    repartitionByRange first cut re-sampled different boundaries per
    consumer and was rejected by test — SCALING.md round 10)."""
    probs = [i / n_slices for i in range(1, n_slices)]
    bounds = (
        df.selectExpr(f"{slice_col} as _ob")
        .approxQuantile("_ob", probs, max(0.001, 1.0 / (4 * n_slices)))
    )
    bounds = sorted(set(bounds))
    if not bounds:
        return F.lit(0)
    arr = "array({})".format(
        ",".join(f"cast({b!r} as double)" for b in bounds)
    )
    return F.expr(f"size(filter({arr}, b -> b <= ({slice_col})))")


def coarse_group_rank(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    n_slices: int | None = None,
    slice_col: str | None = None,
    extra_order_cols: tuple[str, ...] = (),
    sum_col: str | None = None,
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

    ``sum_col`` (round 11) additionally emits ``cum_sum`` — the
    row-order cumulative sum of that column, inclusive of the current
    row (SQL ``SUM(x) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``)
    — and ``sum_tot`` (the group total).  The same offset algebra
    applies with the per-(slice, group) SUM in place of the COUNT;
    because the ROWS frame is row-positional, ``cum_sum`` requires the
    full ORDER BY (order_col + extra_order_cols) to be a TOTAL order
    within each group, exactly as the single-window form would.

    NULL group keys form their own group (matching SQL window
    PARTITION BY semantics): the offset join is null-safe (round-11
    ADVICE fix — a plain equi-join silently dropped NULL-key rows).

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
    sliced = df.withColumn("_slice", _slice_expr(df, slice_col, n_slices))

    wloc = PyWindow.partitionBy("_slice", *group_cols).orderBy(
        order_col, *extra_order_cols
    )
    local = (
        sliced.withColumn("_lrnk", F.rank().over(wloc))
        # default frame RANGE UNBOUNDED PRECEDING..CURRENT ROW: peers
        # included — the local n_le
        .withColumn("_lle", F.count(F.lit(1)).over(wloc))
    )
    if sum_col is not None:
        local = local.withColumn(
            "_lcs",
            F.sum(sum_col).over(
                wloc.rowsBetween(PyWindow.unboundedPreceding, 0)
            ),
        )

    cell_aggs = [F.count(F.lit(1)).alias("_cnt")]
    if sum_col is not None:
        cell_aggs.append(F.sum(sum_col).alias("_scnt"))
    counts = local.groupBy("_slice", *group_cols).agg(*cell_aggs)
    woff = (
        PyWindow.partitionBy(*group_cols)
        .orderBy("_slice")
        .rowsBetween(PyWindow.unboundedPreceding, -1)
    )
    wtot = PyWindow.partitionBy(*group_cols)
    off_cols = [
        F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(wtot).alias("np"),
    ]
    if sum_col is not None:
        off_cols += [
            F.coalesce(F.sum("_scnt").over(woff), F.lit(0)).alias("_soff"),
            F.sum("_scnt").over(wtot).alias("sum_tot"),
        ]
    offsets = counts.select("_slice", *group_cols, *off_cols)
    out_cols = [
        *[c for c in df.columns],
        (F.col("_lrnk") + F.col("_off")).alias("rnk"),
        (F.col("_lle") + F.col("_off")).alias("n_le"),
        F.col("np"),
    ]
    if sum_col is not None:
        out_cols += [
            (F.col("_lcs") + F.col("_soff")).alias("cum_sum"),
            F.col("sum_tot"),
        ]
    return _offset_join(local, offsets, group_cols).select(*out_cols)


def _offset_join(
    local: DataFrame, offsets: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Broadcast-join the tiny per-(slice, group) offsets table back to
    the sliced rows, NULL-SAFELY on the group keys: SQL window
    PARTITION BY keeps a NULL-key partition, so a plain equi-join here
    would silently drop those rows (round-11 ADVICE fix).  The offsets
    side's key columns are renamed to avoid ambiguity; callers select
    away everything but the payload."""
    ren = offsets.withColumnRenamed("_slice", "_oslice")
    cond = F.col("_slice") == F.col("_oslice")
    for i, gc in enumerate(group_cols):
        ren = ren.withColumnRenamed(gc, f"_og{i}")
        cond = cond & F.col(gc).eqNullSafe(F.col(f"_og{i}"))
    return local.join(F.broadcast(ren), cond, "inner")


def coarse_running_max(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    n_slices: int | None = None,
    slice_col: str | None = None,
    out_col: str = "run_max",
) -> DataFrame:
    """Distributed strictly-preceding running max — the prefix-MAX
    variant of the round-10 offset algebra (round-11 window-skew audit
    row `out_of_order_audit`):

        MAX(value) OVER (PARTITION BY group ORDER BY order
                         ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING)

    over a LOW-CARDINALITY group key funnels each group's full row
    mass through one unsplittable window task (events/|types| at
    100 TB for a disorder audit that by definition scans the whole
    log).  Max is associative, so the two-pass form is even simpler
    than rank: slice the order domain by driver-collected quantile
    literals (deterministic slice assignment — same rationale as
    coarse_group_rank), run the local strictly-preceding running max
    inside each bounded (slice, group) window, aggregate one MAX per
    cell, prefix-MAX those over earlier slices per group (an
    O(slices x groups) window), and combine:

        run_max = greatest(local_run_max, max over ALL earlier slices)

    with greatest()'s null-skipping giving exactly the empty-frame
    NULL of the single window (first row overall per group).

    Requires ``order_col`` to be UNIQUE within each group — the ROWS
    frame is order-dependent, so a non-total order is nondeterministic
    in the single-window form too.  ``slice_col``/``n_slices`` as in
    coarse_group_rank.  NULL group keys are kept (null-safe offset
    join).  Returns the input columns plus ``out_col``.
    """
    spark = df.sparkSession
    if n_slices is None:
        n_slices = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if slice_col is None:
        slice_col = f"cast(`{order_col}` as double)"
    sliced = df.withColumn(
        "_slice", _slice_expr(df, slice_col, n_slices)
    )
    wloc = (
        PyWindow.partitionBy("_slice", *group_cols)
        .orderBy(order_col)
        .rowsBetween(PyWindow.unboundedPreceding, -1)
    )
    local = sliced.withColumn("_lmax", F.max(value_col).over(wloc))
    cells = local.groupBy("_slice", *group_cols).agg(
        F.max(value_col).alias("_cmax")
    )
    woff = (
        PyWindow.partitionBy(*group_cols)
        .orderBy("_slice")
        .rowsBetween(PyWindow.unboundedPreceding, -1)
    )
    offsets = cells.select(
        "_slice", *group_cols, F.max("_cmax").over(woff).alias("_omax")
    )
    return _offset_join(local, offsets, group_cols).select(
        *[c for c in df.columns],
        F.greatest("_lmax", "_omax").alias(out_col),
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    salt_partitions: int | None = None,
    salt_by: Column | None = None,
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

    ``salt_by`` defaults to a hash of the WHOLE row — deterministic
    under task retries (value-based; monotonically_increasing_id is
    not), but it degenerates when a group is dominated by DUPLICATE
    rows: every copy hashes to one (group, salt) cell and the
    first-level window collapses back to the hot single-task shape
    (results stay correct — only the skew protection is lost; round-11
    ADVICE).  Callers with low-distinct data should pass a salt
    expression over a column that distinguishes the copies (their
    unique tiebreak column — which the total-order requirement above
    obliges them to have anyway).

    Returns the input columns plus ``rnk`` (1..k within each group).
    """
    spark = df.sparkSession
    if salt_partitions is None:
        salt_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    if salt_by is None:
        salt_by = F.hash(*[F.col(c) for c in df.columns])
    salted = df.withColumn(
        SALT_COL, F.pmod(salt_by, F.lit(salt_partitions))
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
