"""Bloom-filter semi-join pruning — the distributed runtime-filter
pattern (Spark's own `spark.sql.optimizer.runtime.bloomFilter` injects
the same shape; here it is explicit and composable).

Why this matters at 100 TB: a fact-side shuffle join against a
selective dimension moves ALL fact rows to the exchange before the join
drops 98% of them. Building a tiny bitmap from the dimension keys and
evaluating membership IN THE SCAN PROJECTION drops those rows before
any shuffle — the bloom is a pure whole-stage-codegen expression over a
literal array, no explode, no extra join, no Python. False positives
are then removed by the exact join, so results are exactly the plain
semi-join's (which is what the oracle checks).

Build cost: one map-side-combined ``bit_or`` aggregate over the
dimension (m/64 longs per partial), one driver collect of m/64 longs
(8 KiB at m=2^16) — the broadcast-variable pattern, not a data collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M = 1 << 16  # bits
BLOOM_K = 5  # hash functions


def _positions(key_col: str, m: int, k: int) -> list[str]:
    """k bit positions per key as SQL text: xxhash64 with k seeds, mod m.

    SQL-expression form because PySpark's shiftleft/shiftright wrappers
    take a Python-int bit count; the Catalyst operators underneath
    accept expressions, reachable via ``F.expr``.
    """
    return [f"pmod(xxhash64({key_col}, {i}), {m})" for i in range(k)]


def build_bloom(
    df: DataFrame, key_col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> list[int]:
    """Aggregate the build side into an m-bit bitmap (m/64 longs).

    ``bit_or`` is associative/commutative/idempotent, so every input
    split pre-reduces to at most m/64 rows before one tiny exchange.
    """
    pos = F.explode(
        F.array(*[F.expr(p) for p in _positions(key_col, m, k)])
    ).alias("pos")
    words = (
        df.select(pos)
        .select(
            F.expr("CAST(pos DIV 64 AS INT)").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    bitmap = [0] * (m // 64)
    for r in words:
        bitmap[r["word"]] = r["bits"]
    return bitmap


def might_contain(
    bitmap: list[int], key_col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> Column:
    """Membership test as a pure projection over the literal bitmap.

    All k probes must hit set bits. Evaluates inside whole-stage
    codegen at the scan — the pruning happens before any exchange.
    """
    words = "array(" + ",".join(f"{w}L" for w in bitmap) + ")"
    probes = []
    for p in _positions(key_col, m, k):
        word = f"element_at({words}, CAST(({p}) DIV 64 AS INT) + 1)"
        bit = f"shiftleft(CAST(1 AS BIGINT), CAST(({p}) % 64 AS INT))"
        probes.append(f"(({word} & {bit}) != 0)")
    return F.expr(" AND ".join(probes))


# Forced-broadcast cap for the exact-join side: past ~5M distinct dim
# keys (two longs + hash-relation overhead, ~256 MiB built) drop the
# hint and let AQE decide from runtime stats — same policy as
# operators/graph.py's degree-table gate.
_BCAST_DIM_MAX_KEYS = 5_000_000


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    n_dim: int | None = None,
) -> DataFrame:
    """Exact semi join with bloom pre-pruning.

    Plan: scan-side bloom filter (drops ~98% of fact rows for a 2%
    dimension before the exchange) → exact left-semi join removes the
    bloom's false positives. Result rows are exactly
    ``fact SEMI JOIN dim``.

    ``n_dim`` (distinct dim keys, when the caller knows it) size-gates
    the broadcast hint on the exact-join side: the bloom bitmap is
    fixed-size however big the dimension, but the key list is O(dim) —
    forcing it broadcast at 100x dimension scale OOMs the driver.
    ``None`` self-estimates with one ``count()`` over the distinct key
    projection — a map-side-combined aggregate over a scan the bloom
    build already pays, so the gate holds even when the caller cannot
    bound the dimension (the earlier behavior kept the forced
    broadcast for ``None``, which is exactly the OOM the gate exists
    to prevent).
    """
    bitmap = build_bloom(dim, dim_key, m, k)
    pruned = fact.filter(might_contain(bitmap, fact_key, m, k))
    keys = dim.select(dim_key).distinct()
    if n_dim is None:
        n_dim = keys.count()
    if n_dim <= _BCAST_DIM_MAX_KEYS:
        keys = F.broadcast(keys)
    return pruned.join(
        keys,
        F.col(fact_key) == F.col(dim_key),
        "left_semi",
    )
