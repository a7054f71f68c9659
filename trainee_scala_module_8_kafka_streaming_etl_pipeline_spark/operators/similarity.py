"""Similarity search over embedding columns (array<float>).

Two paths:
  brute-force cosine top-k — the exactness baseline; broadcast the
    (small) query set against the full corpus, compute cosine JVM-side
    with higher-order array functions (zip_with/aggregate — no Python
    UDF), rank per query.
  IVF (inverted-file) top-k — the 100 TB path: pick K centroids,
    assign every vector to its nearest centroid (one broadcast pass),
    then probe only the `nprobe` nearest clusters per query. Search
    cost drops by ~K/nprobe; the cluster assignment is reusable state.

All float math accumulates in double, sequentially over the array, so
the DuckDB oracle (same formula, DOUBLE[] casts) reproduces the values.
Cosines are rounded to 6 dp in both engines before comparison/ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

COS_SQL = (
    "round(aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "0D, (acc, v) -> acc + v) "
    "/ (sqrt(aggregate({a}, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))) "
    "* sqrt(aggregate({b}, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))), 6)"
)


def cosine_col(a: str, b: str) -> F.Column:
    """Cosine similarity between two array<float> columns, JVM-side."""
    return F.expr(COS_SQL.format(a=a, b=b))


def brute_force_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for the first ``n_queries`` vectors.

    The query side is tiny → broadcast nested-loop join (each corpus
    partition scans the broadcast queries locally; no shuffle of the
    corpus). Ranking shuffles only (query_id, cos, vec_id) tuples —
    never the vectors themselves.
    """
    q = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    scored = (
        emb.alias("c")
        .join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine_col(vec_col, "q_vec").alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    centroid_stride: int = 50,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: deterministic centroids (every ``centroid_stride``-th
    vector), cluster assignment by max cosine, queries probe the
    ``nprobe`` closest clusters.

    At scale: centroids are broadcast (K ~ sqrt(N) rows); assignment is
    one narrow pass; the probe join hits only nprobe/K of the corpus.
    Results are approximate when the true neighbor lives in an
    unprobed cluster — that's the accuracy/cost dial.
    """
    cent = emb.filter(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("c_vec")
    )
    # assign every vector to its best centroid (broadcast join + rank)
    assigned_scored = emb.join(F.broadcast(cent)).select(
        id_col, vec_col, "centroid_id", cosine_col(vec_col, "c_vec").alias("ccos")
    )
    w_assign = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.asc("centroid_id"))
    assigned = (
        assigned_scored.withColumn("r", F.row_number().over(w_assign))
        .filter(F.col("r") == 1)
        .select(id_col, vec_col, "centroid_id")
    )
    # queries pick their nprobe nearest centroids
    q = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    q_probe_scored = q.join(F.broadcast(cent)).select(
        "query_id", "q_vec", "centroid_id", cosine_col("q_vec", "c_vec").alias("ccos")
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("centroid_id"))
    probes = (
        q_probe_scored.withColumn("r", F.row_number().over(w_probe))
        .filter(F.col("r") <= nprobe)
        .select("query_id", "q_vec", "centroid_id")
    )
    # search only within probed clusters
    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine_col(vec_col, "q_vec").alias("cos"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


def neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold).

    Correctness baseline is the blocked self-join below; at 100 TB this
    becomes IVF/LSH-bucketed (join within cluster only) — the cluster
    assignment from :func:`ivf_topk` is the blocking key.
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_col("v_a", "v_b").alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
