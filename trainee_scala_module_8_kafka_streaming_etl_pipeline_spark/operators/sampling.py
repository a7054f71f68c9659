"""Dataset-assembly operators for training pipelines: deterministic
splits and token-budget shard packing.

Both are the "last mile" of a 100 TB corpus build — after dedup and
quality filtering, the surviving documents must be (a) assigned to
train/val/test reproducibly and (b) packed into shards of a bounded
token budget for the trainer's data loader.

Design rules:

- **Hash the key, never rand().** ``rand()`` changes under retries,
  task re-execution, and partition count; a content-keyed md5 bucket is
  stable across reruns and cluster layouts, and a later incremental
  batch lands in the same splits without touching earlier data.  The
  md5→bigint substrate is the same portable one used by
  :mod:`.dedup`, so the DuckDB oracle reproduces assignments exactly.
- **Pack within key groups, not globally.** A single global
  running-sum would serialize the corpus through one sorted stream; a
  per-group (language, source, date, ...) prefix sum is an
  embarrassingly parallel window per group.  At 100 TB, pick group
  keys with enough cardinality that each group's stream is modest
  (lang x source x day), or run two-level packing (pack per group,
  then round-robin groups onto trainers).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SPLIT_BUCKETS = 100
# cumulative bucket upper-bounds: [0,80) train, [80,90) val, [90,100) test
DEFAULT_SPLITS = (("train", 80), ("val", 90), ("test", SPLIT_BUCKETS))


def hash_bucket(id_col: str, n_buckets: int = SPLIT_BUCKETS) -> F.Column:
    """Deterministic bucket in [0, n_buckets) from the row key: the
    60-bit md5 prefix of the key's decimal string, mod n_buckets.
    Portable bit-for-bit to DuckDB (same substrate as dedup hashing)."""
    h = F.expr(
        f"cast(conv(substr(md5(cast({id_col} as string)), 1, 15), 16, 10) as bigint)"
    )
    return F.pmod(h, F.lit(n_buckets))


def split_col(
    id_col: str, splits: Sequence[tuple[str, int]] = DEFAULT_SPLITS
) -> F.Column:
    """Split label from the hash bucket via cumulative upper bounds."""
    bucket = hash_bucket(id_col)
    result = F.lit(splits[-1][0])
    for name, upper in reversed(splits[:-1]):
        result = F.when(bucket < upper, F.lit(name)).otherwise(result)
    return result


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: Sequence[tuple[str, int]] = DEFAULT_SPLITS,
) -> DataFrame:
    """Assign every row a stable train/val/test split.

    Pure narrow projection — no shuffle, no state; the assignment is a
    function of the key alone, so any re-run, retry, or incremental
    append produces consistent splits.
    """
    return df.withColumn("bucket", hash_bucket(id_col)).withColumn(
        "split", split_col(id_col, splits)
    )


def weighted_sample(
    df: DataFrame,
    rate_pct: F.Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-row weighted downsampling: keep a row iff its
    md5 hash bucket falls below ``rate_pct`` (a per-row column in
    [0, 100], typically derived from the source/domain).

    This is the mixture-weighting step of a corpus build (e.g. upsample
    curated sources, downsample crawl) done without ``rand()``: the
    same row always gets the same verdict, so reruns, retries, and
    incremental appends are consistent, and the realized rate
    concentrates tightly around ``rate_pct`` per source.  Narrow
    projection + filter — no shuffle, pushed to the scan.
    """
    return df.filter(hash_bucket(id_col) < rate_pct)


def pack_shards(
    df: DataFrame,
    token_col: F.Column | str,
    group_cols: Sequence[str] = ("lang",),
    order_col: str = "doc_id",
    budget: int = 4096,
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy token-budget shard packing per group.

    shard_id = floor(exclusive-prefix-sum(tokens) / budget) within each
    group, ordered by ``order_col``: each shard holds consecutive docs
    until the running total crosses the budget (a shard may overflow by
    at most one document — bounded, deterministic, and exactly
    reproducible by a SQL window, unlike bin-packing heuristics).

    One shuffle: the window partition by ``group_cols``.  Groups pack
    in parallel; scale the group key's cardinality with the corpus
    (see module docstring).
    """
    tokens = F.col(token_col) if isinstance(token_col, str) else token_col
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens).over(w)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in group_cols],
        tokens.alias("n_tok"),
        F.floor((cum - tokens) / F.lit(budget)).cast("long").alias("shard_id"),
    )


def es_topk_sample(
    df: DataFrame,
    weight_col: str,
    k: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size weighted sampling WITHOUT replacement via the
    Efraimidis–Spirakis one-pass key: key = -ln(u) / w with u a
    deterministic per-row uniform in (0,1); the k smallest keys are a
    correct weighted sample (equivalent to ranking by u^(1/w)).

    Complements :func:`weighted_sample` (Bernoulli, rate-per-row, output
    size varies) when the contract is an EXACT sample size — eval-set
    carving, per-source quotas, debugging slices.  rand()-free: u comes
    from the row key's 60-bit md5 prefix, so reruns and retries pick the
    identical sample.

    Scale shape: key assignment is a narrow projection; the k-smallest
    selection is ``orderBy(key).limit(k)``, which Spark plans as
    TakeOrderedAndProject — each partition keeps a k-sized heap and the
    driver merges P heaps, no global sort shuffle.  Keys round to 12 dp
    (with the id tiebreak) so both engines rank identically.
    """
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("samp_key", es_key(weight_col, id_col))
        .orderBy("samp_key", id_col)
        .limit(k)
    )


def es_key(weight_col: str, id_col: str) -> F.Column:
    """The Efraimidis-Spirakis sort key: -ln(u)/w with u a deterministic
    md5-derived uniform in (0,1).  Exposed separately so the streaming
    reservoir (streaming/reservoir.py) assigns the IDENTICAL key per
    row — which is what makes the streamed sample equal the batch
    sample and the min-k state merge associative."""
    h = F.expr(
        f"cast(conv(substr(md5(cast({id_col} as string)), 1, 15), 16, 10) as bigint)"
    )
    u = (F.pmod(h, F.lit(1 << 30)).cast("double") + 0.5) / F.lit(float(1 << 30))
    return F.round(-F.log(u) / F.col(weight_col), 12)
