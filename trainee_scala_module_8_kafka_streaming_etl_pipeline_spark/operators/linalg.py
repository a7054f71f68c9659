"""Distributed linear algebra over embedding columns.

PCA-style power iteration, split into the two pieces that matter at
100 TB:

  1. ``gram_cells`` — the only data-scale pass: X^T X computed as
     per-partition partial gram matrices inside ``mapInPandas`` (one
     Arrow-batched numpy GEMM-ish accumulation per partition, emitting
     dim^2 rows per partition, NOT per input row).  Shuffle volume is
     O(partitions * dim^2), independent of row count — the canonical
     tree-aggregate shape.  Cell values are integer-quantized
     (``trunc(x_i * x_j * SCALE)`` per row, summed exactly in int64),
     so the distributed sum is order-independent and bit-identical to
     any other engine's sum of the same per-row integers — no float
     summation-order drift between Spark and the DuckDB oracle.
  2. ``power_iteration_int`` — fixed-iteration power method on the
     collected dim x dim integer matrix.  The matrix is a reduction
     RESULT (4096 cells for dim=64), not data, so driver-side exact
     integer arithmetic is legitimate — the same shape as k-means
     collecting its k centroids per round.  All iteration math is
     integer (HUGEINT-scale products, truncating division by the max
     component), so a SQL oracle can replay it exactly, iteration by
     iteration, with zero float ambiguity.

Sign/direction: iteration starts from the all-ones vector, so the
returned direction is deterministic (up to the usual eigenvector sign,
which the fixed start vector pins down).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 64
SCALE = 10**9  # per-row product quantization: trunc(x_i*x_j*SCALE)
VSCALE = 10**6  # iteration vector fixed-point scale
ITERS = 4


def gram_cells(
    emb: DataFrame, vec_col: str = "embedding", dim: int = DIM, scale: int = SCALE
) -> DataFrame:
    """(i, j, s) cells of the integer-quantized gram matrix X^T X.

    i/j are 1-based (matching SQL ``generate_series`` indexing).  Each
    per-row product is truncated to an int64 at ``scale`` before
    summation, so every engine summing the same rows gets the same
    cell, in any order.  Magnitude bound: |x|<=B rows N => cell <=
    B^2*scale*N; at B~8, scale=1e9, that allows N ~ 1e5 per int64 cell
    partial and ~1e14 rows for the global bigint sum — far above any
    real corpus before you'd shard the accumulation.
    """
    import numpy as np
    import pandas as pd

    emb = emb.filter(F.col(vec_col).isNotNull())  # vectorless rows cannot participate

    idx = np.arange(1, dim + 1, dtype=np.int32)
    ii = np.repeat(idx, dim)
    jj = np.tile(idx, dim)

    def part(batches):
        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # sub-chunk so the (rows, dim, dim) product tensor stays small
            for s in range(0, len(X), 512):
                xs = X[s : s + 512]
                P = np.trunc((xs[:, :, None] * xs[:, None, :]) * scale)
                acc += P.astype(np.int64).sum(axis=0)
        if seen:
            yield pd.DataFrame({"i": ii, "j": jj, "s": acc.ravel()})

    partials = emb.select(vec_col).mapInPandas(part, schema="i int, j int, s long")
    return partials.groupBy("i", "j").agg(F.sum("s").alias("s"))


def power_iteration_int(
    cells: list[tuple[int, int, int]],
    dim: int = DIM,
    iters: int = ITERS,
    vscale: int = VSCALE,
) -> list[int]:
    """Fixed-count power iteration in exact integer arithmetic.

    v0 = all ones (at ``vscale``); each round computes w = A v with
    exact (unbounded) Python ints, then renormalizes to max-abs
    ``vscale`` with truncating division on non-negative operands —
    the one integer-division form that Python ``//`` and SQL ``//``
    agree on.  Returns the final fixed-point vector (1-based order).
    """
    A = [[0] * dim for _ in range(dim)]
    for i, j, s in cells:
        A[i - 1][j - 1] = int(s)
    v = [vscale] * dim
    for _ in range(iters):
        w = [sum(A[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in w)
        if m == 0:
            break
        v = [(abs(x) * vscale) // m * (1 if x >= 0 else -1) for x in w]
    return v


def top_component(
    emb: DataFrame, vec_col: str = "embedding", dim: int = DIM
) -> DataFrame:
    """Dominant principal direction (uncentered PCA / top right singular
    vector of X): distributed gram pass + driver-side integer power
    iteration, returned as (dim, component) rows rounded to 6 dp."""
    spark = emb.sparkSession
    cells = [(r["i"], r["j"], r["s"]) for r in gram_cells(emb, vec_col, dim).collect()]
    v = power_iteration_int(cells, dim)
    rows = [(i + 1, vi) for i, vi in enumerate(v)]
    out = spark.createDataFrame(rows, "dim int, v_fp long")
    return out.select(
        "dim", F.round(F.col("v_fp") / VSCALE, 6).alias("component")
    )
