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
