"""Probabilistic sketch operators: HyperLogLog cardinality and
count-min-sketch heavy hitters.

At 100 TB these are the tools that replace exact `count(DISTINCT ...)`
and exact per-key counts: the sketch state is O(m) / O(d*w) per group
regardless of input size, merges associatively across partitions, and
every stage below is an ordinary map-side-combining hash aggregate — no
sort, no full distinct shuffle of the raw keys.

Cross-engine determinism (the DuckDB oracle must hash-match): every
hash is the shared md5-derived 60-bit substrate of operators/dedup.py,
and the HLL register arithmetic is *integer-only* — the classic
"position of the lowest set bit" rank is carried as the power-of-two
value ``v = w & -w`` itself, and ``2^(55-rho)`` terms are computed as
exact integer divisions ``2^54 // v``, so no engine ever calls a libm
function (log2 in particular is not guaranteed correctly rounded) on
the estimation path.  The only floating-point step is one final
constant/Sum division, identical in both engines.

The reference has no sketch surface (SURVEY.md §2.7: no UDFs at all);
this extends the engine for the LLM-pipeline workloads the survey's §8
inventory covers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# HLL geometry: m = 64 registers (b = 6 bucket bits).  Standard-error
# ~ 1.04/sqrt(64) = 13% — the demo setting; m is a parameter and the
# arithmetic below holds for any power of two up to 2^10.
HLL_M = 64
# Bias constant alpha_m = 0.7213 / (1 + 1.079/m); computed once in
# Python so Spark and the SQL oracle embed the *identical* double.
def hll_alpha(m: int) -> float:
    return 0.7213 / (1 + 1.079 / m)


# The 60-bit hash leaves w = h // m with < 2^54 usable bits; a zero w
# (probability 2^-54 per key) is pinned to the max rank's value.
_W_ZERO_V = 1 << 53
_NUM = 1 << 54  # numerator of the exact 2^(55-rho) = 2^54 // v identity
_EMPTY_TERM = 1 << 55  # empty register: rho = 0 -> 2^(55-0)

# CMS geometry: d independent hash rows, w columns.  Collision bias is
# ~ n/w per row; min over d rows keeps the overestimate tight.
CMS_D = 4
CMS_W = 256


def _h60(col: F.Column) -> F.Column:
    """The shared portable 60-bit hash (dedup.py substrate)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    m: int = HLL_M,
) -> DataFrame:
    """Per-(group, bucket) HLL register state: ``v_max`` is the maximum
    lowest-set-bit value of the rank bits — the exact-integer carrier of
    the classic register M_j = max(rho) (v = 2^(rho-1) is monotone in
    rho, so max over v IS max over rho).  This frame IS the mergeable
    sketch: to union two datasets, union the frames and re-aggregate
    max(v_max)."""
    h = _h60(F.col(key_col))
    w = F.expr(f"_hll_h div {m}")
    v = F.when(w == 0, F.lit(_W_ZERO_V)).otherwise(
        w.bitwiseAND(-w)
    )
    return (
        df.select(*group_cols, h.alias("_hll_h"))
        .select(
            *group_cols,
            (F.col("_hll_h") % m).alias("bucket"),
            v.alias("v"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("v").alias("v_max"))
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: Sequence[str] = (),
    m: int = HLL_M,
) -> DataFrame:
    """Estimate from a register frame (hll_registers output or any
    max-merge of such frames).  The estimate column is
    ``alpha*m^2*2^55 / S`` with S an exact integer, so both engines
    divide the same two numbers."""
    scale = hll_alpha(m) * m * m * float(1 << 55)
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("buckets_used"),
        F.sum(F.expr(f"{_NUM} div v_max")).alias("_s_used"),
    )
    s_total = F.col("_s_used") + (m - F.col("buckets_used")) * F.lit(_EMPTY_TERM)
    return agg.select(
        *group_cols,
        "buckets_used",
        F.round(F.lit(scale) / s_total.cast("double"), 2).alias("hll_estimate"),
    )


def hll_estimate(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    m: int = HLL_M,
) -> DataFrame:
    """Raw HLL cardinality estimate per group.  Two map-side-combining
    aggregates; state per group is m registers independent of input
    rows."""
    return hll_estimate_from_registers(
        hll_registers(df, key_col, group_cols, m), group_cols, m
    )


def cms_cells(
    df: DataFrame, key_col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Count-min-sketch table: (row i, column, count) cells.  One
    explode (factor d) + one hash aggregate over d*w cells; the cell
    frame is the mergeable sketch (sum counts cell-wise)."""
    hashes = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                (_h60(F.concat(F.lit(f"{i}_"), F.col(key_col).cast("string"))) % w)
                .alias("col"),
            )
            for i in range(d)
        ]
    )
    return (
        df.select(F.explode(hashes).alias("c"))
        .groupBy(F.col("c.i").alias("i"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_topk(
    df: DataFrame,
    key_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
    k: int = 10,
) -> DataFrame:
    """Heavy hitters by CMS estimate: probe every candidate key's d
    cells and take the min, then rank.  The cell table (d*w rows) is
    broadcast, so probing is shuffle-free; the candidate set here is
    the exact distinct keys (at 100 TB you'd feed a sampled or
    domain-known candidate list instead — the probe path is the same).
    Estimates are exact integers -> deterministic ordering, ties broken
    by key."""
    cells = cms_cells(df, key_col, d, w)
    return cms_estimate_topk(cells, df.select(key_col).distinct(), key_col, d, w, k)


def cms_estimate_topk(
    cells: DataFrame,
    candidates: DataFrame,
    key_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
    k: int = 10,
) -> DataFrame:
    """Top-k estimate probe against an existing cell table — the read
    path shared by the batch sketch and the streaming-maintained one
    (streaming/sketches.py sum-merges cells across micro-batches; sum
    is associative/commutative, so the merged cells equal the batch
    cells over the same rows and this probe is state-source agnostic).
    """
    probes = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                (_h60(F.concat(F.lit(f"{i}_"), F.col(key_col).cast("string"))) % w)
                .alias("col"),
            )
            for i in range(d)
        ]
    )
    est = (
        candidates
        .select(key_col, F.explode(probes).alias("c"))
        .select(key_col, F.col("c.i").alias("i"), F.col("c.col").alias("col"))
        .join(F.broadcast(cells), ["i", "col"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cms_count"))
    )
    from pyspark.sql import Window

    rank = F.row_number().over(
        Window.orderBy(F.desc("cms_count"), F.col(key_col))
    )
    return est.withColumn("rank", rank).filter(F.col("rank") <= k)


# --- mergeable equi-width histogram quantile sketch ------------------------

HIST_BIN_WIDTH = 5.0


def hist_bins(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    width: float = HIST_BIN_WIDTH,
) -> DataFrame:
    """Histogram sketch state: (group, bin, c) counts at fixed bin
    width. Counts are sum-mergeable across partitions, batches, and
    days — the property that lets a 100 TB quantile run as map-side
    partials plus a tiny rollup, or stream as foreachBatch state."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            F.floor(F.col(value_col) / width).cast("bigint").alias("bin"),
        )
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def hist_quantiles(
    bins: DataFrame,
    group_cols: Sequence[str] = (),
    width: float = HIST_BIN_WIDTH,
    probs: Sequence[tuple[str, float]] = (
        ("p50_est", 0.5),
        ("p90_est", 0.9),
        ("p99_est", 0.99),
    ),
) -> DataFrame:
    """Quantile estimates off the cumulative histogram with within-bin
    linear interpolation. Integer counts + one double expression =>
    deterministic regardless of aggregation order (why this is
    oracle-checkable and percentile_approx is not)."""
    wcum = Window.partitionBy(*group_cols).orderBy("bin")
    wall = Window.partitionBy(*group_cols)
    cum = bins.select(
        *group_cols,
        "bin",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )

    def _est(q: float) -> F.Column:
        # Interpolate ONLY inside the bin that contains the k-th value:
        # cum >= k qualifies that bin and every later one, but for later
        # bins k - (cum - c) is negative and the interpolation falls
        # below the bin floor (can even go negative), so the second
        # conjunct (cum - c < k) pins the estimate to the first
        # qualifying bin.  min() is then just "the one non-null value".
        k = F.ceil(F.lit(q) * F.col("n")).cast("bigint")
        return F.min(
            F.when(
                (F.col("cum") >= k) & (F.col("cum") - F.col("c") < k),
                F.col("bin") * width
                + width * (k - (F.col("cum") - F.col("c"))) / F.col("c"),
            )
        )

    est = cum.groupBy(*group_cols, "n").agg(
        *[_est(q).alias(name) for name, q in probs]
    )
    return est.select(
        *group_cols,
        F.col("n").cast("bigint").alias("n"),
        *[F.round(name, 6).alias(name) for name, _ in probs],
    )
