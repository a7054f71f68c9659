"""Distributed graph primitives over DataFrames: undirected edge
derivation from co-occurrence and degree-oriented triangle counting.

Triangle counting is THE canonical "orient by degree" scale pattern:
joining raw undirected edges wedge-wise explodes on hub nodes (a node
of degree d contributes d² wedges). Orienting every edge from its
lower-(degree, id) endpoint to the higher one makes the edge set a DAG
where each node's out-degree is O(sqrt(|E|)) for any graph — hub nodes
become join *targets*, not join *sources* — so the wedge join's
per-key fan-out is bounded and skew-safe. Two hash joins on node ids,
all map-side combinable aggregates, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(df: DataFrame, group_col: str, item_col: str) -> DataFrame:
    """Distinct undirected edges (u < v) between items sharing a group.

    Pair expansion is per-group quadratic, which is safe when group
    sizes are bounded (order line counts here, shingle buckets in LSH);
    the distinct() collapses repeated co-occurrence into one edge.
    """
    a = df.select(F.col(group_col).alias("g"), F.col(item_col).alias("u")).distinct()
    b = a.select("g", F.col("u").alias("v"))
    return (
        a.join(b, "g")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


def orient_by_degree(edges: DataFrame) -> DataFrame:
    """Orient each undirected edge from lower (degree, id) to higher.

    The (degree, id) tuple is a total order, so orientation is
    deterministic and acyclic. One aggregate for degrees, two
    broadcast-or-shuffle joins to attach them, one projection to flip.
    """
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    e = edges.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count of an undirected (u < v) edge set.

    wedges(a→b, a→c) ⋈ closing edge (b→c) over the degree-oriented
    DAG; each triangle is counted exactly once because orientation is a
    total order. Returns one row: n_nodes, n_edges, n_triangles.
    """
    o = orient_by_degree(edges).cache()
    o.count()  # materialize before the self-join branches race the cache
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b")
    e3 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = wedges.join(e3, ["a", "c"]).agg(F.count(F.lit(1)).alias("n_triangles"))
    nodes = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .agg(F.countDistinct("n").alias("n_nodes"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return nodes.crossJoin(n_edges).crossJoin(tri)
