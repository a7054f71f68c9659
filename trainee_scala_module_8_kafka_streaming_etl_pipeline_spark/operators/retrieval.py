"""Keyword retrieval: BM25 ranking over the whitespace-token corpus.

The lexical complement to the ANN family (operators/similarity.py):
production retrieval stacks pair a keyword index with a vector index
and fuse the two rankings, so an engine claiming the similarity-search
surface needs the keyword side too.  The reference has no retrieval
surface (SURVEY.md §2.7 — no scalar functions at all); this extends
the engine for the LLM-pipeline workloads of SURVEY.md §8.

Scale shape (100 TB): the tokenize/explode pass is the same one the
inverted-index build pays; term filtering happens immediately after the
explode, so only the query terms' postings survive into the tf
aggregate (at deploy scale you'd read them from the materialized
inverted index instead — the scoring math below is unchanged).  The
corpus statistics (N, avgdl) are a 1-row broadcast; document length is
a fact-sized aggregate joined on doc_id; the final ranking shuffles
only (doc, score) pairs for the matched documents.

Cross-engine determinism: idf is rounded to 6 dp straight after the
single `ln` call (the one libm operation), each document's per-term
score is rounded to 6 dp and quantized to integer micro-units, and the
doc score is the integer SUM of those micro-units — so aggregation
order cannot change the result, and ties rank by doc_id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b + b·dl/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  (the Lucene form —
    non-negative for any df).
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    tok = docs.select(
        id_col, F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term")
    )
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    # exact-integer sums so the double division is identical cross-engine
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("term").isin(*query_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ),
        6,
    )
    den = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    smic = F.round(
        F.round(idf * F.col("tf") * F.lit(k1 + 1.0) / den, 6) * 1e6
    ).cast("bigint")
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(id_col, smic.alias("smic"))
        .groupBy(id_col)
        .agg(F.sum("smic").alias("smic"))
    )
    w = Window.orderBy(F.desc("smic"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            id_col,
            F.round(F.col("smic") / F.lit(1e6), 6).alias("bm25"),
            "rnk",
        )
    )
