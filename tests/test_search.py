"""BM25 unit cases (operators/search.py) not covered by the oracled
queries: query-id dtype fidelity in the phrase gram dim."""

from pyspark.sql import functions as F


def _docs(spark):
    return spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "quick brown foxes are quick brown and quick"),
         (3, "nothing relevant here at all today folks")],
        "doc_id long, text string")


def test_bm25_phrase_string_query_ids(spark):
    """The gram dim must inherit the queries frame's query_id type: a
    string id used to raise in createDataFrame against the hardcoded
    'int' schema."""
    from aquacache_spark.operators.search import bm25_phrase_topk

    queries = spark.createDataFrame(
        [("q-alpha", "quick brown"), ("q-beta", "lazy dog")],
        "query_id string, query string")
    out = bm25_phrase_topk(_docs(spark), queries, k=2)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {"q-alpha", "q-beta"}
    top = {r["query_id"]: r["doc_id"] for r in rows
           if r["score"] == max(x["score"] for x in rows
                                if x["query_id"] == r["query_id"])}
    # doc 2 repeats the 'quick brown' bigram; doc 1 holds 'lazy dog'
    assert top["q-alpha"] == 2
    assert top["q-beta"] == 1


def test_bm25_phrase_64bit_query_ids(spark):
    """Ids above 2^31 must survive the gram dim round trip (the old
    'int' schema silently overflowed them)."""
    from aquacache_spark.operators.search import bm25_phrase_topk

    big = 2**40 + 7
    queries = spark.createDataFrame(
        [(big, "quick brown")], "query_id long, query string")
    out = bm25_phrase_topk(_docs(spark), queries, k=1).collect()
    assert len(out) == 1 and out[0]["query_id"] == big
