"""ANN quality gates: the LSH-bucketed and IVF paths must recover a
reasonable fraction of the brute-force top-k (they trade recall for a
bucket-/list-local search — the 100 TB paths)."""

from pyspark.sql import functions as F

from aquacache_spark.catalog import table
from aquacache_spark.operators.similarity import (
    ann_topk_ivf,
    ann_topk_lsh,
    cosine_topk,
)
from conftest import SF_SMOKE


def test_lsh_ann_recall_vs_brute_force(spark):
    emb = table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ann_topk_lsh(emb, queries, k=5, planes=4).collect()

    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # 4 hyperplanes -> 16 buckets over 500 *uniform random* vectors (no
    # cluster structure, the hardest case for LSH): recall is partial by
    # design but must stay far above chance (5/500 ≈ 1%). Observed ~13%.
    assert recall >= 0.08, f"LSH recall collapsed: {recall:.2%}"
    # and every returned neighbor must be genuinely bucket-consistent:
    # cosine values must match the exact computation for the same pair
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert abs(r["cosine"] - exact_cos[key]) < 1e-9


def test_ivf_ann_recall_vs_brute_force(spark):
    emb = table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ann_topk_ivf(emb, queries, k=5, nlist=16, nprobe=4).collect()

    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # nprobe/nlist = 4/16 of uniform random vectors scanned per query —
    # recall must beat the ~25% scanned-fraction floor by a clear margin
    # (neighbors concentrate in the nearest lists). Observed ~60%.
    assert recall >= 0.4, f"IVF recall collapsed: {recall:.2%}"
    # every returned pair's cosine must equal the exact computation
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert abs(r["cosine"] - exact_cos[key]) < 1e-9


def test_ivf_trained_centroids_raise_recall(spark):
    """Deterministic k-means refinement (train_iters=3) must beat the
    raw seed centroids' recall floor: observed 0.62 untrained vs 0.656
    trained at vec_id<50, nprobe=4/nlist=16."""
    emb = table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ann_topk_ivf(
        emb, queries, k=5, nlist=16, nprobe=4, train_iters=3
    ).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.55, f"trained IVF recall collapsed: {recall:.2%}"


def test_kmeans_centroids_deterministic(spark):
    from aquacache_spark.operators.similarity import kmeans_centroids

    emb = table(spark, SF_SMOKE, "embeddings")
    a = kmeans_centroids(emb, nlist=8, iters=2).collect()
    b = kmeans_centroids(
        emb.repartition(13), nlist=8, iters=2
    ).collect()
    av = {r["centroid_id"]: r["__centv"] for r in a}
    bv = {r["centroid_id"]: r["__centv"] for r in b}
    # quantized integer-sum updates => bit-identical across partitionings
    assert av == bv


def test_ivf_probes_bound_work(spark):
    # each query joins against exactly nprobe inverted lists
    from aquacache_spark.operators.similarity import ivf_assign, ivf_centroids

    emb = table(spark, SF_SMOKE, "embeddings")
    cent = ivf_centroids(emb, nlist=16)
    probes = ivf_assign(
        emb.where(F.col("vec_id") < 20), cent, nprobe=4, out_id="query_id"
    )
    counts = probes.groupBy("query_id").count().collect()
    assert all(r["count"] == 4 for r in counts)
    # build-side assignment is a partition of the corpus
    lists = ivf_assign(emb, cent, nprobe=1, out_id="neighbor_id")
    assert lists.count() == emb.count()


def test_pq_recall_and_rank_agreement(spark):
    """PQ ranks by cosine against code reconstructions: with 8-codeword
    seed codebooks over uniform random vectors the approximate order
    must still recover a clear-above-chance share of the exact top-5,
    and the top-1 reconstruction scores must correlate with the exact
    cosine (sanity: reconstruction is not degenerate)."""
    from aquacache_spark.operators.similarity import ann_topk_pq

    emb = table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ann_topk_pq(emb, queries, k=5, m=4, ksub=8).collect()

    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # chance = 5/500 = 1%; 8 codewords x 4 subspaces on uniform random
    # vectors is deliberately coarse — must still be well above chance
    assert recall >= 0.05, f"PQ recall collapsed: {recall:.2%}"
    # scores live in cosine range and every query returns exactly k
    by_q = {}
    for r in approx:
        by_q.setdefault(r["query_id"], []).append(r)
        assert -1.0 <= r["cosine"] <= 1.0
    assert all(len(v) == 5 for v in by_q.values())


def test_pq_encode_deterministic_across_partitionings(spark):
    from aquacache_spark.operators.similarity import pq_codebooks, pq_encode

    emb = table(spark, SF_SMOKE, "embeddings")
    cb = pq_codebooks(emb, m=4, ksub=8)
    a = {r["vec_id"]: (r["code_0"], r["code_1"], r["code_2"], r["code_3"])
         for r in pq_encode(emb, cb).collect()}
    b = {r["vec_id"]: (r["code_0"], r["code_1"], r["code_2"], r["code_3"])
         for r in pq_encode(emb.repartition(13), cb).collect()}
    assert a == b


def test_ivfpq_prunes_and_recalls(spark):
    """The IVF x PQ composition must (a) only score within probed
    lists — every returned neighbor's list must be among the query's
    nprobe probes — and (b) keep recall above chance."""
    from aquacache_spark.operators.similarity import (
        ann_topk_ivfpq, ivf_assign, ivf_centroids,
    )

    emb = table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    approx = ann_topk_ivfpq(emb, queries, k=5, nlist=16, nprobe=4).collect()
    exact = cosine_topk(emb, queries, k=5).collect()

    cent = ivf_centroids(emb, nlist=16)
    probes = {
        (r["query_id"], r["centroid_id"])
        for r in ivf_assign(queries, cent, nprobe=4, out_id="query_id").collect()
    }
    lists = {
        r["neighbor_id"]: r["centroid_id"]
        for r in ivf_assign(emb, cent, nprobe=1, out_id="neighbor_id").collect()
    }
    for r in approx:
        assert (r["query_id"], lists[r["neighbor_id"]]) in probes

    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.05, f"IVF-PQ recall collapsed: {recall:.2%}"


def test_semantic_dedup_drops_twin_not_original_rule(spark):
    """SemDeDup semantics: a scaled twin (cosine exactly 1) loses to
    whichever member ranks first (lower centroid sim, then id); the
    rule is 'similar to ANY earlier member', set-wise."""
    from pyspark.sql import functions as F

    from aquacache_spark.operators.similarity import semantic_dedup

    import math

    base = [(i, [math.sin(i * 1.7 + k * 0.3) for k in range(8)])
            for i in range(1, 9)]
    twins = [(100 + i, [x * 2.0 for x in v]) for i, v in base[:3]]
    df = spark.createDataFrame(base + twins,
                               "vec_id bigint, embedding array<double>")
    out = semantic_dedup(df, threshold=0.999, nlist=2, iters=2, dim=8)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 11
    # each twin pair contributes exactly one drop
    for i in (1, 2, 3):
        pair_kept = [rows[i]["kept"], rows[100 + i]["kept"]]
        assert sorted(pair_kept) == [False, True], (i, pair_kept)
        # same cluster by construction (identical direction)
        assert rows[i]["centroid_id"] == rows[100 + i]["centroid_id"]
    # vectors without a twin all survive
    assert all(rows[i]["kept"] for i in range(4, 9))
