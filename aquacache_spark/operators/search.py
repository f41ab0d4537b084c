"""BM25 retrieval over the document corpus.

The curation-side use of lexical search in a training-data pipeline:
eval-set decontamination beyond exact n-grams, targeted corpus audits
("which documents score highest for this probe query"), and mixture
debugging. Complements the embedding-space ANN tier
(operators/similarity.py) with the classic sparse ranking.

Scale shape (the 100 TB argument):

- postings are one ``explode`` + a partial-aggregable (doc, term)
  count — map-side combine does most of the work;
- the probe queries are catalog-sized, so the postings join that
  restricts the corpus to query terms is a BROADCAST join (no shuffle
  of the postings on term);
- document frequencies are computed only for query terms (bounded by
  the query vocabulary, not the corpus vocabulary) and broadcast
  back;
- per-term score contributions are quantized to 1e-6 and summed as
  longs (the repo-wide exact-sum idiom), so ranking is
  order-independent under any partitioning;
- top-k per query is a rank window over the tiny per-query candidate
  set (WindowGroupLimit pushes the limit into the sort).

Reference analog: the reference has no text search (it is a
hydrometric store); this operator belongs to the training-data
extension tier the engine adds on top (SURVEY north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

_Q = 1e6  # score quantum (matches the unigram-surprisal idiom)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """Okapi BM25 top-k per probe query.

    Output: (query_id, doc_id, score) with score = the quantized
    contribution sum / 1e6, ranked per query by (score DESC, doc_id
    ASC), at most ``k`` rows per query.
    """
    base = docs.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__toks")
    ).withColumn("__dl", F.size("__toks"))
    # corpus stats as a 1-row broadcast (no driver action):
    # avgdl = exact integer sum / count, identically derivable in SQL
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__dl").alias("__sumdl"))
    tf = (
        base.select(id_col, "__dl", F.explode("__toks").alias("term"))
        .groupBy(id_col, "__dl", "term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    qt = queries.select(
        query_id, F.explode(tokens(F.lower(F.col(query_col)))).alias("term")
    ).distinct()
    # restrict postings to query terms FIRST (broadcast); document
    # frequency is a count window over the restricted set (one row per
    # (doc, term)), so the postings subtree is scanned ONCE — a
    # groupBy-and-join-back would recompute the explode+aggregate
    cand = tf.join(F.broadcast(qt.select("term").distinct()), "term")
    cand = cand.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    scored = (
        cand.join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("__sumdl").cast("double") / F.col("__n")
    idf = F.log(
        1.0 + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5))
    contrib = (
        idf * F.col("__tf") * (k1 + 1.0)
        / (F.col("__tf")
           + k1 * (1.0 - b + b * F.col("__dl") / avgdl))
    )
    q = F.floor(contrib * _Q + F.lit(0.5)).cast("long")
    per_doc = scored.select(query_id, id_col, q.alias("__q")).groupBy(
        query_id, id_col).agg(F.sum("__q").alias("__ql"))
    w = Window.partitionBy(query_id).orderBy(
        F.desc("__ql"), F.asc(id_col))
    return (
        per_doc.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(query_id, id_col,
                (F.col("__ql") / F.lit(_Q)).alias("score"))
    )
