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


def _bm25_contribs(
    docs: DataFrame,
    queries: DataFrame,
    k1: float,
    b: float,
    id_col: str,
    text_col: str,
    query_id: str,
    query_col: str,
) -> DataFrame:
    """Per-(query, doc, term) quantized BM25 contributions — the
    shared core of :func:`bm25_topk` and :func:`bm25_phrase_topk`.
    Returns (query_id, id_col, __q)."""
    from .dedup import _spread_scan

    # tokenization + the token explode run in the SCAN stage; a
    # single-row-group parquet reads as one task and serializes them
    # (r12, guide §2.5) — spread when under-split, no-op at real
    # split counts
    base = _spread_scan(docs.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__toks")
    ), id_col).withColumn("__dl", F.size("__toks"))
    # corpus stats as a 1-row broadcast (no driver action):
    # avgdl = exact integer sum / count, identically derivable in SQL
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__dl").alias("__sumdl"))
    qt = queries.select(
        query_id, F.explode(tokens(F.lower(F.col(query_col)))).alias("term")
    ).distinct()
    # restrict postings to query terms BEFORE the per-(doc, term)
    # aggregation (broadcast semi-join on the exploded tokens): a
    # term's in-doc count is unaffected by dropping other terms, so
    # the count shuffle carries only query-term hits — bounded by
    # query vocabulary x docs — instead of the corpus's entire
    # (doc, term) space. Unmeasurable at the bench SF (its fixture
    # vocabulary is ~40 words, A/B'd at parity), but at web scale the
    # dropped shuffle is the full corpus vocabulary x docs. Document
    # frequency is then a count window over the restricted set (one
    # row per (doc, term)), so the postings subtree is scanned ONCE.
    cand = (
        base.select(id_col, "__dl", F.explode("__toks").alias("term"))
        .join(F.broadcast(qt.select("term").distinct()), "term", "left_semi")
        .groupBy(id_col, "__dl", "term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
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
    return scored.select(query_id, id_col, q.alias("__q"))


def _rank_topk(per_doc, k, id_col, query_id):
    w = Window.partitionBy(query_id).orderBy(
        F.desc("__ql"), F.asc(id_col))
    return (
        per_doc.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(query_id, id_col,
                (F.col("__ql") / F.lit(_Q)).alias("score"))
    )


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
    contribs = _bm25_contribs(
        docs, queries, k1, b, id_col, text_col, query_id, query_col)
    per_doc = contribs.groupBy(query_id, id_col).agg(
        F.sum("__q").alias("__ql"))
    return _rank_topk(per_doc, k, id_col, query_id)


def bm25_phrase_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    w_bigram: float = 0.5,
    w_phrase: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """BM25 + phrase/proximity scoring:

    score = BM25
          + w_bigram * Σ_{query bigrams g}  ln(1 + tf_g(doc))
          + w_phrase * ln(1 + tf_phrase(doc))        [phrases of >= 2]

    where tf_g counts the bigram's occurrences among the document's
    adjacent token pairs (the order-sensitive proximity signal BM25
    lacks) and tf_phrase counts occurrences of the FULL query as a
    consecutive token run. Every component is 1e-6-quantized and
    exact-summed, so ranking is order-independent.

    Scale shape: probe queries are catalog-sized BY DEFINITION, so
    their phrases are collected driver-side (the PSL-pivot precedent)
    and the document side builds one partial-aggregable L-gram count
    per DISTINCT gram length needed (2 for bigrams + each phrase
    length) — each is explode → map-side-combined count → broadcast
    semi-restriction to query grams. No corpus shuffle beyond the
    per-(doc, gram) aggregation; no UDFs.
    """
    from .dedup import _spread_scan

    contribs = _bm25_contribs(
        docs, queries, k1, b, id_col, text_col, query_id, query_col)
    grams: dict[int, list[tuple]] = {}
    for r in queries.select(query_id, query_col).collect():
        toks = str(r[query_col]).lower().split()
        qid = r[query_id]
        for i in range(len(toks) - 1):
            grams.setdefault(2, []).append(
                (qid, toks[i] + " " + toks[i + 1], w_bigram))
        if len(toks) >= 2:
            grams.setdefault(len(toks), []).append(
                (qid, " ".join(toks), w_phrase))
    spark = docs.sparkSession
    # spread the gram-construction scan for the same reason as
    # _bm25_contribs (the per-doc L-gram transform + explode is the
    # phrase path's CPU mass)
    base = _spread_scan(docs.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__toks")
    ), id_col).withColumn("__n", F.size("__toks"))
    parts = [contribs]
    if grams:
        # ONE corpus pass for all needed gram lengths: the per-L gram
        # arrays concatenate before a single explode + count, and an
        # L-gram string can never equal an L'-gram string (different
        # word counts), so one combined query-gram dim joins once —
        # the 3-scan/3-join version benched 2.5x slower
        toks = F.col("__toks")

        def arr(L: int):
            return F.when(
                F.col("__n") >= L,
                F.transform(
                    F.sequence(F.lit(1), F.col("__n") - (L - 1)),
                    lambda i: F.concat_ws(" ", *[
                        F.element_at(toks, i + j) for j in range(L)]),
                ),
            ).otherwise(F.array().cast("array<string>"))

        all_arr = F.concat(*[arr(L) for L in sorted(grams)]) \
            if len(grams) > 1 else arr(next(iter(grams)))
        # the query-id field type follows the queries frame (string /
        # bigint ids must survive; a hardcoded int would raise or
        # truncate)
        from pyspark.sql import types as T

        from ..session import local_df

        # LocalRelation, not an RDD scan: each broadcast of a
        # createDataFrame(list) frame runs a separate Py4J RDD job
        # (~0.2-0.4s fixed) and blocks codegen for the joined stage —
        # local_df folds the rows in driver-side (session.py)
        gdim = local_df(
            spark,
            sorted({g for v in grams.values() for g in v}),
            schema=T.StructType([
                T.StructField(query_id,
                              queries.schema[query_id].dataType),
                T.StructField("__gram", T.StringType()),
                T.StructField("__w", T.DoubleType()),
            ]))
        # broadcast-semi restrict to QUERY grams before counting: the
        # count's shuffle then carries only matching grams (bounded by
        # query vocabulary x docs), not the corpus's entire gram space
        gtf = (
            base.select(id_col, F.explode(all_arr).alias("__gram"))
            .join(F.broadcast(gdim.select("__gram").distinct()),
                  "__gram", "left_semi")
            .groupBy(id_col, "__gram")
            .agg(F.count(F.lit(1)).alias("__gtf"))
        )
        bonus = F.floor(
            F.col("__w") * F.log(1.0 + F.col("__gtf")) * _Q + F.lit(0.5)
        ).cast("long")
        parts.append(
            gtf.join(F.broadcast(gdim), "__gram")
            .select(query_id, id_col, bonus.alias("__q"))
        )
    allq = parts[0]
    for p in parts[1:]:
        allq = allq.unionByName(p)
    per_doc = allq.groupBy(query_id, id_col).agg(
        F.sum("__q").alias("__ql"))
    return _rank_topk(per_doc, k, id_col, query_id)


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF terms per document — the corpus-keyword /
    datacard-vocabulary primitive (and the feature extractor classic
    sparse classifiers sit on).

    score(term, doc) = tf * ln((n_docs + 1) / (df + 1))   [+1 smoothing]

    quantized to 1e-6 before ranking so ties and ordering are
    bit-stable across engines; rank ties break (score DESC, term ASC).

    Scale shape: (doc, term, tf) is one explode + partial-aggregable
    count; df aggregates the SAME postings frame on term (corpus-
    VOCAB-sized — far too big to broadcast at web scale, so the score
    join stays an equi-join on term for AQE to plan); n_docs is an
    agg + 1-row broadcast cross-join; top-k is a rank window per doc
    (WindowGroupLimit pushes the limit into the sort).
    """
    postings = (
        docs.select(F.col(id_col),
                    F.explode(tokens(F.lower(F.col(text_col))))
                    .alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"))
    ndocs = docs.select(id_col).distinct().agg(
        F.count(F.lit(1)).alias("n_docs"))
    scored = (
        postings.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .select(
            id_col, "term",
            F.floor(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0)))
                * 1e6 + F.lit(0.5)
            ).cast("long").alias("__q"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__q"), F.asc("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(id_col, "term", F.col("__rn").cast("long").alias("rank"),
                (F.col("__q") / F.lit(_Q)).alias("tfidf"))
    )


def rrf_fuse(
    rankings: list[DataFrame],
    topk: int = 5,
    k_const: int = 60,
    query_id: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of independent retrieval rankings —
    the standard hybrid-search combiner (lexical BM25 + vector ANN):

        rrf(d) = sum_sources 1 / (k + rank_source(d))

    Each input frame carries (query_id, id_col, rank). Contributions
    quantize to integer nano-units (floor(1e9 / (k + rank))) before
    the exact sum, so fusion is order-independent for ANY number of
    sources and bit-stable across engines; ties break on the doc id.

    Scale: each ranking is already top-k-per-query (query-catalog
    sized), so the union + fused aggregation is tiny regardless of
    corpus size — the expensive parts are the upstream retrievers.
    Output: (query_id, id_col, rrf_score, rank).
    """
    parts = [
        r.select(
            query_id, id_col,
            F.floor(F.lit(1e9) / (F.lit(k_const) + F.col("rank")))
            .cast("long").alias("__u"),
        )
        for r in rankings
    ]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    fused = allp.groupBy(query_id, id_col).agg(
        F.sum("__u").alias("__units"))
    w = Window.partitionBy(query_id).orderBy(
        F.desc("__units"), F.asc(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(query_id, id_col,
                (F.col("__units") / F.lit(1e9)).alias("rrf_score"),
                F.col("rank").cast("long").alias("rank"))
    )
