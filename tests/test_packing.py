"""Training-batch assembly invariants (operators/packing.py)."""

from pyspark.sql import functions as F

from aquacache_spark.operators.packing import (
    importance_weights, mixture_sample, pack_sequences,
)
from aquacache_spark.session import local_df


def _docs(spark, rows):
    return local_df(spark, rows, "doc_id long, n_tokens long")


class TestPackSequences:
    def test_bins_respect_budget(self, spark):
        rows = [(i, 100 + (i * 37) % 400) for i in range(200)]
        out = pack_sequences(_docs(spark, rows), budget=1000,
                             n_shards=4).toPandas()
        fills = out.groupby(["shard", "bin_id"])["n_tokens"].sum()
        assert (fills <= 1000).all()

    def test_oversized_doc_gets_own_bin(self, spark):
        rows = [(1, 300), (2, 5000), (3, 300)]
        out = pack_sequences(_docs(spark, rows), budget=1000,
                             n_shards=1).toPandas().set_index("doc_id")
        assert out.loc[2, "bin_offset"] == 0
        # the oversized doc shares its bin with nobody
        b = out.loc[2, "bin_id"]
        assert (out["bin_id"] == b).sum() == 1

    def test_offsets_are_running_fills(self, spark):
        rows = [(i, 250) for i in range(8)]
        out = pack_sequences(_docs(spark, rows), budget=1000, n_shards=1) \
            .toPandas().sort_values("doc_id")
        assert list(out["bin_offset"]) == [0, 250, 500, 750] * 2
        assert list(out["bin_id"]) == [0] * 4 + [1] * 4

    def test_deterministic_across_partitionings(self, spark):
        rows = [(i, 50 + i % 700) for i in range(300)]
        a = pack_sequences(_docs(spark, rows).repartition(1), budget=2048,
                           n_shards=4).toPandas()
        b = pack_sequences(_docs(spark, rows).repartition(13), budget=2048,
                           n_shards=4).toPandas()
        key = ["doc_id"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert a.equals(b)


class TestMixtureSample:
    def rows(self):
        return [(i, ["web", "code", "wiki"][i % 3], 1000) for i in range(600)]

    def test_scarce_domain_kept_fully(self, spark):
        docs = local_df(spark, self.rows(),
                        "doc_id long, domain string, n_tokens long")
        out = mixture_sample(docs, {"web": 0.1, "code": 0.8, "wiki": 0.1})
        fr = {r["domain"]: r["keep_frac"]
              for r in out.select("domain", "keep_frac").distinct().collect()}
        # code anchors the mixture (highest demand): kept at 1.0
        assert fr["code"] == 1.0
        assert fr["web"] < 1.0 and fr["wiki"] < 1.0
        # relative rates follow the weights (equal domain sizes)
        assert abs(fr["web"] - fr["wiki"]) < 1e-12

    def test_unweighted_domain_dropped(self, spark):
        rows = self.rows() + [(1000, "books", 1000)]
        docs = local_df(spark, rows,
                        "doc_id long, domain string, n_tokens long")
        out = mixture_sample(docs, {"web": 0.5, "code": 0.3, "wiki": 0.2})
        assert out.where(F.col("domain") == "books").count() == 0

    def test_kept_fraction_tracks_keep_frac(self, spark):
        docs = local_df(spark, [(i, "web", 100) for i in range(2000)]
                        + [(10_000 + i, "code", 100) for i in range(200)],
                        "doc_id long, domain string, n_tokens long")
        out = mixture_sample(docs, {"web": 0.5, "code": 0.5}).toPandas()
        web = out[out.domain == "web"]
        got = web.kept.mean()
        want = web.keep_frac.iloc[0]
        assert abs(got - want) < 0.08  # hash-uniformity, 2000 trials


class TestImportanceWeights:
    def test_target_docs_score_higher(self, spark):
        tgt_rows = [(i, "alpha beta gamma delta " * 5) for i in range(10)]
        other_rows = [(100 + i, "zeta eta theta iota " * 5) for i in range(40)]
        corpus = local_df(spark, tgt_rows + other_rows,
                          "doc_id long, text string")
        target = corpus.where(F.col("doc_id") < 10)
        out = importance_weights(corpus, target, num_buckets=256).toPandas()
        tgt_mean = out[out.doc_id < 10].importance.mean()
        other_mean = out[out.doc_id >= 10].importance.mean()
        assert tgt_mean > other_mean

    def test_empty_doc_scores_zero(self, spark):
        corpus = local_df(spark, [(1, "a b c d"), (2, "x")],
                          "doc_id long, text string")
        out = importance_weights(corpus, corpus.where(F.col("doc_id") == 1),
                                 num_buckets=64).toPandas().set_index("doc_id")
        assert out.loc[2, "n_bigrams"] == 0
        assert out.loc[2, "importance"] == 0.0


def test_chunk_documents_closed_form(spark):
    """Edge math: short doc -> one chunk; exact-boundary doc -> one
    chunk; one-past-boundary -> two chunks whose overlap region is
    shared verbatim; reconstruction: stitching chunks (dropping each
    successor's overlap prefix) rebuilds the original text."""
    import pytest

    from aquacache_spark.operators.packing import chunk_documents

    words = " ".join(f"w{i}" for i in range(9))      # n=9
    exact = " ".join(f"w{i}" for i in range(6))      # n=6 == max
    short = "a b"
    df = spark.createDataFrame(
        [(1, words), (2, exact), (3, short)], "doc_id long, text string")
    out = chunk_documents(df, max_tokens=6, overlap=2)  # stride 4
    rows = sorted([(r["doc_id"], r["chunk_id"], r["chunk_text"],
                    r["n_tokens"], r["start_token"])
                   for r in out.collect()])
    assert rows == [
        (1, 0, "w0 w1 w2 w3 w4 w5", 6, 0),
        (1, 1, "w4 w5 w6 w7 w8", 5, 4),
        (2, 0, "w0 w1 w2 w3 w4 w5", 6, 0),
        (3, 0, "a b", 2, 0),
    ]
    # stitch doc 1: chunk0 + chunk1 minus its 2-token overlap prefix
    stitched = rows[0][2] + " " + " ".join(rows[1][2].split()[2:])
    assert stitched == words
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)
