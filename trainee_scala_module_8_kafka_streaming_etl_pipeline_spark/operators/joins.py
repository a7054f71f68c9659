"""Join operators: enrichment (stream-table), interval (windowed
stream-stream), and as-of.

Reference parity:
  J1 — stream-table LEFT join (/root/reference/README.md:448-458)
  J2 — stream-stream INNER join WITHIN 7 DAYS (/root/reference/README.md:464-479)
As-of is an extension (the natural "enrich with most recent prior fact"
operator); DuckDB expresses it natively (ASOF JOIN), Spark needs the
union+window formulation below.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: Column,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-table enrichment join (reference J1).

    ksqlDB does a keyed lookup of the *current* dimension state per fact
    record. Batch-equivalently: a left equi-join against the compacted
    dimension (see compaction.latest_by_offset).

    Scale: the dimension is broadcast by default — a 100 TB fact table
    must not shuffle to meet a dimension that fits in executor memory.
    Catalyst would usually decide this itself via
    autoBroadcastJoinThreshold, but compacted dims come from an
    aggregation whose size estimate is poor, so the explicit hint
    matters. Pass ``broadcast_dim=False`` for a dimension too large to
    broadcast (falls back to sort-merge with AQE skew handling).
    """
    dim_side = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(dim_side, on, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    *,
    lower: str = "-INTERVAL 1 DAY",
    upper: str = "INTERVAL 1 DAY",
    how: str = "inner",
    time_bucket_seconds: int | None = None,
    window_span_seconds: int | None = None,
) -> DataFrame:
    """Stream-stream interval join (reference J2, ``WITHIN n``): match
    rows with equal keys whose event times differ by at most the window.

    Default plan: equi-join on the keys with the time range as a join
    predicate — Catalyst plans a hash/sort-merge join on the keys and
    evaluates the range inside the join, which is optimal when per-key
    row counts are modest.

    ``time_bucket_seconds`` enables the *bucketed* variant for scale:
    when single keys span years of data but the window is small, a pure
    key join materializes the per-key cross product before the range
    filter. Bucketing assigns the left row to bucket floor(ts/b) and
    explodes each right row into its adjacent buckets, joining on
    (key, bucket) so only temporally-near rows ever meet. Each matching
    pair meets in exactly one bucket (the left row's), so no dedup is
    needed.

    The explode span is ±K buckets around the right row's own bucket
    with K = ceil(window_span / b): a matching left row's timestamp is
    within the window span of the right row's, so its bucket index can
    differ by at most that many buckets. Pass ``window_span_seconds``
    as max(|lower|, |upper|) whenever the window may exceed the bucket
    width; when omitted, K defaults to 1, which is complete ONLY when
    b >= window span (the recommended sizing, b = window span — a
    larger K multiplies the right side's explode factor).
    """
    lcond = [F.col(f"l.{lk}") == F.col(f"r.{rk}") for lk, rk in keys]
    l_df, r_df = left.alias("l"), right.alias("r")
    range_cond = (
        (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + F.expr(lower))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(upper))
    )
    if time_bucket_seconds:
        b = int(time_bucket_seconds)
        k = (
            1
            if window_span_seconds is None
            else max(1, -(-int(window_span_seconds) // b))
        )
        l_df = l_df.withColumn("_bkt", (F.unix_timestamp(F.col(f"l.{left_ts}")) / b).cast("long"))
        r_bkt = (F.unix_timestamp(F.col(f"r.{right_ts}")) / b).cast("long")
        r_df = r_df.withColumn(
            "_bkt", F.explode(F.array(*[r_bkt + i for i in range(-k, k + 1)]))
        )
        cond = reduce(lambda a, c: a & c, lcond)
        joined = l_df.join(r_df, (l_df["_bkt"] == r_df["_bkt"]) & cond & range_cond, how)
        return joined.drop("_bkt")
    cond = lcond[0]
    for c in lcond[1:]:
        cond = cond & c
    return l_df.join(r_df, cond & range_cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    prefix: str = "matched_",
) -> DataFrame:
    """As-of join: each left row picks the latest right row with the same
    key and ``right_ts <= left_ts`` (ties included).

    Spark has no native as-of join; the scalable formulation is the
    union + running-last trick: tag both sides, union, sort within each
    key by (ts, side) and carry the last-seen right payload forward with
    ``last(..., ignorenulls=True)``. One shuffle + one sort total —
    equivalent to a distributed merge join, with no per-key cross
    product (a naive join+filter+row_number would materialize every
    (left, right-earlier) pair first).

    Right rows sort before left rows at equal ts (side 0 < 1), so a left
    row at exactly t matches a right row at t — DuckDB ASOF JOIN
    (``ON l.ts >= r.ts``) semantics, which the oracle uses.
    """
    payload = F.struct(*[F.col(c) for c in right_cols], F.col(right_ts).alias("_rts"))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != key],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c) for c in left.columns if c != key],
    )
    # `_payload` is the final orderBy term so that right rows tied on
    # (key, ts) carry a deterministic winner (the struct-max payload)
    # across runs and engines instead of whichever row the sort happened
    # to place last.
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side", F.asc("_payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l.unionByName(r).withColumn(
        "_carried", F.last("_payload", ignorenulls=True).over(w)
    )
    out = unioned.filter(F.col("_side") == 1)
    for c in right_cols:
        out = out.withColumn(prefix + c, F.col(f"_carried.{c}"))
    out = out.withColumn(prefix + right_ts, F.col("_carried._rts"))
    return out.drop("_ts", "_side", "_payload", "_carried")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_span: tuple[str, str],
    right_span: tuple[str, str],
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join interval rows that OVERLAP: l.start <= r.end AND
    r.start <= l.end.

    A raw overlap predicate has no equi-key, so Catalyst can only plan
    a broadcast nested-loop / cartesian — O(|L|·|R|) comparisons, the
    classic range-join scale-killer. This operator decomposes each
    interval into the fixed-width time buckets it covers (``sequence``
    + ``explode``), equi-joins on the bucket id (overlapping intervals
    must share at least one covered bucket), de-duplicates the pair
    hits, and re-applies the exact predicate to discard same-bucket
    near-misses. Cost: O((|L|+|R|)·spans + |candidate pairs|), all
    hash-partitioned — the standard interval-decomposition range join.

    Pick ``bucket_seconds`` near the typical interval length: too small
    multiplies the explode factor, too large multiplies false-positive
    candidates.
    """
    ls, le = left_span
    rs, re_ = right_span

    def bucketed(df: DataFrame, s: str, e: str) -> DataFrame:
        b = F.explode(
            F.sequence(
                F.expr(f"unix_seconds(`{s}`) div {bucket_seconds}"),
                F.expr(f"unix_seconds(`{e}`) div {bucket_seconds}"),
            )
        )
        return df.withColumn("__bucket", b)

    lb = bucketed(left, ls, le)
    rb = bucketed(right, rs, re_)
    pairs = (
        lb.join(rb, "__bucket", how)
        .drop("__bucket")
        .distinct()
        .filter((F.col(ls) <= F.col(re_)) & (F.col(rs) <= F.col(le)))
    )
    return pairs


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    prefix: str = "next_",
) -> DataFrame:
    """Forward as-of join: each left row picks the EARLIEST right row
    with the same key and ``right_ts >= left_ts`` (ties included) —
    the 'next event after' direction (pandas merge_asof
    direction='forward').

    Same union + running-carry shape as :func:`asof_join`, with the
    sort reversed: within each key, order by (ts DESC, side) and carry
    the last-seen right payload — which, scanned in descending time, is
    the nearest FUTURE right row. One shuffle + one sort, no per-key
    cross product. Right rows sort before left rows at equal ts so an
    exact-tie matches, mirroring DuckDB's ``ON l.ts <= r.ts`` ASOF.
    """
    payload = F.struct(*[F.col(c) for c in right_cols], F.col(right_ts).alias("_rts"))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != key],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c) for c in left.columns if c != key],
    )
    # Deterministic tiebreak for right rows sharing (key, ts): descending
    # payload order makes the struct-min payload the carried winner.
    w = (
        Window.partitionBy(key)
        .orderBy(F.desc("_ts"), F.asc("_side"), F.desc("_payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l.unionByName(r).withColumn(
        "_carried", F.last("_payload", ignorenulls=True).over(w)
    )
    out = unioned.filter(F.col("_side") == 1)
    for c in right_cols:
        out = out.withColumn(prefix + c, F.col(f"_carried.{c}"))
    out = out.withColumn(prefix + right_ts, F.col("_carried._rts"))
    return out.drop("_ts", "_side", "_payload", "_carried")
