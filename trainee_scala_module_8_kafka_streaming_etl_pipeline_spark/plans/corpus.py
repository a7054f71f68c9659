"""Composed training-corpus build: the LLM-data flagship.

The reference's flagship (plans/flagship.py) composes its relational
operators end-to-end; this is the same idea for the training-data side
of the engine — one declarative plan that chains the corpus operators
a pretraining data build actually runs, in their canonical order:

    near-dup clustering -> keep best copy   (operators/dedup.py)
    -> quality gate                         (functions/text.py)
    -> deterministic train/val/test split   (operators/sampling.py)
    -> per-(split, source) token packing    (cumulative-sum binning)

Everything stays one logical plan: the cluster keep-list is O(docs)
ids, the quality gate is a codegen projection, the split is a pure
hash function of the key, and packing is a windowed prefix sum
partitioned by (split, source) — so the only exchanges after the dedup
stage are one id join and one window shuffle. At 100 TB each stage's
scale posture is inherited from the operator it reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import dedup, sampling

QUALITY_MIN = 0.3
PACK_BUDGET = 2000


def build_corpus(
    docs: DataFrame,
    quality_min: float = QUALITY_MIN,
    pack_budget: int = PACK_BUDGET,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Shard manifest of the cleaned, deduped, split, packed corpus.

    Returns one row per (split, source, bin): doc count, packed token
    total, and the doc-id range of the bin — the manifest a shard
    writer would consume.

    ``clusters`` optionally injects precomputed near-dup labels so the
    CC fixpoint (the pipeline's most expensive stage) is shared with
    the standalone dedup entries instead of recomputed here.
    """
    keep = dedup.keep_best_per_cluster(
        docs, quality_col=T.quality_score(), clusters=clusters
    )
    kept = docs.join(
        keep.select(F.col("keep_doc_id").alias("doc_id"), "keep_quality"),
        "doc_id",
    ).filter(F.col("keep_quality") >= quality_min)
    split = sampling.hash_split(kept).select(
        "doc_id", "source", "split", T.n_tokens().alias("tok")
    )
    w = Window.partitionBy("split", "source").orderBy("doc_id")
    packed = split.withColumn("cum", F.sum("tok").over(w)).withColumn(
        "bin", F.expr(f"(cum - tok) div {pack_budget}")
    )
    return packed.groupBy("split", "source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").cast("bigint").alias("tokens_packed"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
