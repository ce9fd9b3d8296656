"""Lexical retrieval: inverted-index BM25 scoring over the corpus.

The retrieval-side companion to the embedding ANN family
(functions/similarity.py): rank documents for a bag-of-terms query with
Okapi BM25 [Robertson & Zaragoza 2009, "The Probabilistic Relevance
Framework: BM25 and Beyond"] —

    score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) /
                  (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))
    idf(t)      = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)

Scale shape: document length comes from ``size(split(...))`` — a
map-only expression, no explode for the length pass; only the QUERY
TERMS' postings are exploded and shuffled (filter before the explode's
groupBy, so the inverted index materializes for |q| terms, not the
vocabulary); df and the (N, total_tokens) corpus scalars are tiny
aggregates broadcast back into the scoring join; the final top-k is a
TakeOrdered heap, never a global sort. At 100 TB the shuffled volume is
the query-term postings only — the same bound a search engine's posting
lists give.

Cross-engine determinism: per-(doc, term) partial scores are rounded to
6 digits and summed in DECIMAL(18,6) (exact, order-independent), the
q162 discipline, so libm ``ln`` ulp noise and float summation order
cannot flip the hash; the final score rounds to 4.

Reference parity: the reference's only text surface is LIKE/grep
(refused at that — ``TableHandler.scala``); retrieval is an extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_topk"]


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
) -> DataFrame:
    """Top-k (doc_id, bm25) for a bag-of-terms query. Ties broken by
    doc id so the selected rows are engine-independent."""
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    toks = F.split(F.lower(F.col(text_col)), " ")
    dl = df.select(F.col(id_col).alias("id"), F.size(toks).alias("dl"))
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    )
    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    norm_len = 1 - b + b * F.col("dl") * F.col("n_docs") / F.col("total_tokens")
    partial = F.round(
        idf * F.col("tf") * (k1 + 1) / (F.col("tf") + k1 * norm_len), 6
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(totals))
        .withColumn("s", partial.cast("decimal(18,6)"))
        .groupBy(F.col("id").alias(id_col))
        .agg(F.round(F.sum("s").cast("double"), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), id_col)
        .limit(topk)
    )
