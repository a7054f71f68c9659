"""Time-series / hypertable operators: OHLC bars, time-weighted
average, and gap-fill with last-observation-carried-forward.

These extend the reference's event-stream surface (the events topic of
SURVEY.md §2.1, event-time semantics of §2.4) with the rollup shapes a
time-series store (continuous aggregate / hypertable rollup) provides.
The reference itself materializes per-key latest state
(/root/reference/README.md:434-441); these operators materialize
per-bucket summaries of the same streams.

Spark-first design notes (100 TB):

* ``ohlc_bars`` is ONE hash aggregate — ``min_by``/``max_by`` on the
  offset give open/close without any window sort, so map-side partial
  aggregation reduces each input split to one row per (key, bucket)
  before the exchange. The window formulation (``first_value`` /
  ``last_value`` over a sorted partition) would shuffle and sort every
  raw tick; at 100 TB the sort never happens here.
* ``time_weighted_avg`` needs each sample's *next* timestamp, which is
  inherently a per-key ordered scan: one shuffle on the key, one
  in-partition sort, then a single exact-decimal aggregate. The decimal
  accumulation (value × Δt in microseconds) keeps the result
  order-independent, so the plan is free to combine partials in any
  order.
* ``gap_fill_locf`` builds the day grid with ``sequence``/``explode``
  (rows bounded by key-count × day-span, independent of raw event
  volume), left-joins the per-day compacted state on (key, day) — both
  sides hash-partitioned on the same key — and fills with a running
  ``last(ignorenulls)`` window. All heavy reduction (raw events →
  per-day last value) happens BEFORE the grid join, so the join and
  window see only compacted rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ohlc_bars(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    offset_col: str,
    bucket: str = "day",
) -> DataFrame:
    """Per-(key, time-bucket) open/high/low/close + volume bars.

    Open/close are taken by arrival order (``offset_col``, unique), so
    ties in event time cannot make the result nondeterministic — the
    same rule ksqlDB's latest_by_offset uses for "latest".
    """
    bucket_col = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    return (
        df.groupBy(*key_cols, bucket_col)
        .agg(
            F.min_by(value_col, offset_col).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, offset_col).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    offset_col: str,
) -> DataFrame:
    """LOCF time-weighted average per key over the observed span.

    Each sample holds its value until the next sample of the same key
    (last-observation-carried-forward); the average weights each value
    by that holding time. The last sample of a key has no successor and
    contributes no weight (half-open span), matching the usual
    time_weight('locf') definition over a closed observation window.

    Exactness: value is accumulated as DECIMAL(18,6) × Δt(µs), so the
    sum is exact and associative; only the final divide is double.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, offset_col)
    nxt = F.lead(ts_col).over(w)
    dt_us = F.unix_micros(nxt) - F.unix_micros(F.col(ts_col))
    weighted = df.select(
        *key_cols,
        (F.col(value_col).cast("decimal(18,6)") * dt_us).alias("wv"),
        dt_us.alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return weighted.groupBy(*key_cols).agg(
        # try_divide: a key whose samples all share one timestamp has a
        # zero total span -> NULL average (DuckDB's x/0 is NULL too).
        F.try_divide(
            F.sum("wv").cast("double"),
            F.sum("dt_us").cast("double"),
        ).alias("twa_value"),
        F.sum("dt_us").alias("span_us"),
        F.count(F.lit(1)).alias("n_spans"),
    )


def gap_fill_locf(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    offset_col: str,
) -> DataFrame:
    """Daily grid per key between its first and last observation, with
    missing days filled by the last observed per-day closing value.

    Returns (keys…, day, value, is_filled): ``is_filled`` marks grid
    days that had no raw observation. The per-day "observed" value is
    the day's close by arrival order (deterministic under ts ties).
    """
    day = F.date_trunc("day", F.col(ts_col))
    daily = (
        df.groupBy(*key_cols, day.alias("day"))
        .agg(F.max_by(value_col, offset_col).alias("obs_value"))
    )
    return gap_fill_from_daily(daily, key_cols)


def gap_fill_from_daily(daily: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Grid + LOCF over an already-compacted (keys…, day, obs_value)
    table — shared by the batch operator above and the streaming rollup
    (streaming/bars.py maintains exactly this shape incrementally)."""
    grid = (
        daily.groupBy(*key_cols)
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            *key_cols,
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    # explicit observation marker: a day whose close is NULL (every raw
    # value that day was NULL) is still an OBSERVED day — deriving
    # is_filled from obs_value IS NULL conflated the two (found by the
    # gap-fill hypothesis property; the mirrored oracle had the same bug)
    filled = grid.join(
        daily.withColumn("_observed", F.lit(True)), [*key_cols, "day"], "left"
    )
    locf = Window.partitionBy(*key_cols).orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return filled.select(
        *key_cols,
        "day",
        F.last("obs_value", ignorenulls=True).over(locf).alias("value"),
        F.col("_observed").isNull().alias("is_filled"),
    )


def ewma(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    offset_col: str,
    alpha: float = 0.3,
    lags: int = 8,
) -> DataFrame:
    """Truncated exponentially-weighted moving average per key.

    ``ewma = Σ_{i<lags} (1-α)^i · x_{t-i} / Σ_{i<lags} (1-α)^i`` over the
    lags actually present (ramp-up rows normalize by the weights of the
    rows they have) — pandas' ``ewm(adjust=True)`` truncated to a fixed
    window, which makes the statistic exactly computable in one pass.

    Spark-first (100 TB): the untruncated recursive EWMA is a sequential
    scan per key — unparallelizable within a key and not expressible
    without a stateful UDF.  Truncation to ``lags`` terms turns it into
    ``lags`` ``lag()`` expressions inside ONE window (one shuffle on the
    key, one in-partition sort, whole-stage-codegen'd arithmetic): the
    weight of the dropped tail is (1-α)^lags (≈0.058 for α=.3, L=8),
    a documented approximation bound, while the plan stays embarrassingly
    parallel across keys.  No UDF, no iteration, no state.

    Determinism: ties in ``ts_col`` are broken by ``offset_col`` (unique
    arrival order — the same rule latest_by_offset uses,
    /root/reference/README.md:436), and both numerator and denominator
    are fixed-length left-associated float chains, so any engine
    evaluating IEEE doubles in source order reproduces the bits.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, offset_col)
    num = None
    den = None
    for i in range(lags):
        wt = float((1.0 - alpha) ** i)
        x = F.col(value_col) if i == 0 else F.lag(value_col, i).over(w)
        term = F.when(x.isNotNull(), x * F.lit(wt)).otherwise(F.lit(0.0))
        dterm = F.when(x.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    return df.select(
        *key_cols,
        F.col(offset_col),
        F.col(ts_col),
        F.col(value_col),
        # try_divide: if the value and all lags in the window are NULL
        # the weight sum is 0 and the EWMA is undefined — NULL, matching
        # DuckDB's x/0 (found by the all-NULL-measure degenerate sweep)
        F.round(F.try_divide(num, den), 6).alias("ewma"),
    )


def changepoint_cusum(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """CUSUM change-point locator per group: the day where the
    cumulative deviation from the series mean peaks — the classic
    mean-shift detector.

    The fact-sized daily rollup accumulates as exact DECIMAL (partial-
    order independent); the per-day deviations then accumulate as
    doubles INSIDE the ordered window, where any engine performs the
    identical sequential IEEE additions — the one place double math is
    reproducible by construction.  One daily rollup (fact-sized), then
    O(groups x days) window + argmax.
    """
    daily = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, F.date_trunc("day", ts_col).alias("day"))
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    tot = daily.groupBy(group_col).agg(
        F.sum("s").alias("ts_"), F.sum("c").alias("tc")
    )
    w = Window.partitionBy(group_col).orderBy("day")
    cus = daily.join(tot, group_col).select(
        group_col,
        "day",
        F.sum(
            F.col("s").cast("double")
            - F.col("c")
            * (F.col("ts_").cast("double") / F.col("tc").cast("double"))
        ).over(w).alias("cusum"),
    )
    return cus.groupBy(group_col).agg(
        F.max_by("day", F.abs("cusum")).alias("change_day"),
        F.round(F.max(F.abs("cusum")), 4).alias("max_cusum"),
    )


def winsorized_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Winsorized mean per group: clip each value into its group's
    [p_lo, p_hi] band, then average — the robust central tendency that,
    unlike trimming or MAD filtering, keeps every row's vote.

    Exact percentiles come from one ``percentile`` aggregate (linear
    interpolation, rounded to 6 dp); the boundary table is group-
    cardinality so it broadcasts back onto the fact rows, and the
    clipped sum accumulates in integer micro-units so the mean is
    engine-exact.  At 100 TB swap the exact percentile for the
    mergeable histogram sketch (sketches.hist_quantiles) — the
    clip-join shape is unchanged.

    NULL measurements are dropped up front: without the filter,
    ``greatest(least(NULL, p_hi), p_lo)`` collapses a missing value to
    p_hi (least/greatest skip NULLs) while ``count(*)`` still counts
    the row — inflating the mean as if every gap were a 95th-percentile
    observation.
    """
    df = df.filter(F.col(value_col).isNotNull())
    b = df.groupBy(group_col).agg(
        F.round(
            F.expr(f"percentile(cast({value_col} as double), {lo})"), 6
        ).alias("p_lo"),
        F.round(
            F.expr(f"percentile(cast({value_col} as double), {hi})"), 6
        ).alias("p_hi"),
    )
    wv = F.greatest(F.least(F.col(value_col), F.col("p_hi")), F.col("p_lo"))
    micro = F.sum(F.round(wv * 1e6).cast("bigint")).cast("bigint")
    return (
        df.join(F.broadcast(b), group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(micro / F.lit(1e6) / F.count(F.lit(1)), 6).alias(
                "winsorized_mean"
            ),
        )
    )


def dow_seasonality(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Day-of-week seasonal profile per key: mean value per weekday and
    its ratio to the key's overall mean (seasonal index).

    One hash aggregate to (key, weekday) — map-side combined, so the
    exchange carries ≤ 7 rows per key regardless of input volume — then
    window functions over that tiny aggregated frame for the key totals
    (no second shuffle over raw data).  Sums accumulate in DECIMAL so
    partials combine associatively; only the final divides are double.

    weekday is ISO Monday=0 … Sunday=6 (Spark ``weekday`` ≡ DuckDB
    ``isodow - 1``), chosen because the engines' default ``dayofweek``
    origins differ.
    """
    y = F.col(value_col).cast("decimal(18,6)")
    daily = df.groupBy(
        *key_cols, F.weekday(ts_col).alias("weekday")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum(y).alias("s"))
    kw = Window.partitionBy(*key_cols)
    tot_n = F.sum("n").over(kw)
    tot_s = F.sum("s").over(kw)
    dow_mean = F.col("s").cast("double") / F.col("n")
    all_mean = tot_s.cast("double") / tot_n
    # try_divide: a key whose corpus mean is exactly 0 (e.g. an
    # all-zero value column) has no defined seasonal index — emit NULL
    # like DuckDB's x/0, instead of the ANSI DIVIDE_BY_ZERO crash the
    # replay property found on the all-zero corpus.
    return daily.select(
        *key_cols,
        "weekday",
        F.col("n").alias("n_events"),
        F.round(dow_mean, 6).alias("dow_mean"),
        F.round(F.try_divide(dow_mean, all_mean), 6).alias("seasonal_index"),
    )


def linear_trend(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    epoch_origin_us: int,
) -> DataFrame:
    """Per-key least-squares trend of value over time (exact-sum form).

    Closed-form simple linear regression computed from five exact
    sufficient statistics — n, Σx, Σy, Σx², Σxy (+ Σy² for r²) — in ONE
    hash aggregate with map-side partial combine: the canonical
    map-reduce regression, no window, no second pass.  Equivalent to
    ``regr_slope``/``regr_intercept``, but accumulating in DECIMAL so
    partials combine associatively (a float-sum formulation would be
    partition-order dependent and non-reproducible across cluster
    layouts; the exact sums also make the result oracle-checkable
    bit-for-bit).

    ``x`` is seconds since ``epoch_origin_us`` (pass an origin near the
    data's start): centering keeps x ≤ ~1e7 for year-scale spans so
    x² sums stay far inside DECIMAL(38) at trillions of rows.  Only the
    final slope/intercept/r² arithmetic is double.
    """
    x = F.expr(f"(unix_micros({ts_col}) - {epoch_origin_us}) div 1000000")
    y = F.col(value_col).cast("decimal(18,6)")
    xd = x.cast("decimal(12,0)")
    stats = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * x).cast("decimal(38,0)")).alias("sxx"),
        F.sum(xd * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_n = n * sxx - sx * sx
    slope = F.try_divide(cov_n, var_n)
    r2 = F.try_divide(cov_n * cov_n, var_n * (n * syy - sy * sy))
    return stats.select(
        *key_cols,
        F.col("n").alias("n_events"),
        F.round(slope, 6).alias("slope_per_sec"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )
