"""Arrow+BLAS kernel twins vs their JVM-expression baselines: on
fixtures whose cosines sit far from both the 1e-6 quantization grid
and each other, the two paths must agree exactly — pins the semantic
relationship the ~1e-6 input-quantization variance could otherwise
silently erode."""

from pyspark.sql import functions as F


def _vec_corpus(spark, n=40, dim=8):
    # deterministic well-separated directions: distinct cosines at the
    # 1e-2 scale, far from any 1e-6 quantization boundary flip
    rows = []
    for i in range(n):
        v = [((i * 7 + j * 3) % 11 - 5) / 7.0 + 0.01 * (j + 1)
             for j in range(dim)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_blas_matches_jvm_exact(spark):
    from aquacache_spark.operators.similarity import (cosine_topk,
                                                      cosine_topk_blas)

    corpus = _vec_corpus(spark)
    qs = corpus.where(F.col("vec_id") < 4)
    jvm = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in cosine_topk(corpus, qs, k=5).collect()}
    blas = {(r["query_id"], r["rank"]): r["neighbor_id"]
            for r in cosine_topk_blas(corpus, qs, k=5).collect()}
    assert jvm == blas
    # cosines agree to the quantization-induced tolerance
    jc = {(r["query_id"], r["neighbor_id"]): r["cosine"]
          for r in cosine_topk(corpus, qs, k=5).collect()}
    bc = {(r["query_id"], r["neighbor_id"]): r["cosine"]
          for r in cosine_topk_blas(corpus, qs, k=5).collect()}
    for key in jc:
        assert abs(jc[key] - bc[key]) < 1e-5, key


def test_semdedup_blas_matches_jvm_decisions(spark):
    from aquacache_spark.operators.similarity import (semantic_dedup,
                                                      semantic_dedup_blas)

    # 3 direction groups x 6 members: in-group cosines ~0.999 (far
    # above the 0.95 gate), cross-group well below — both paths must
    # keep exactly one member per group
    rows = []
    base = [[1.0, 0.1, 0.0, 0.0], [0.0, 1.0, 0.1, 0.0],
            [0.0, 0.1, 0.0, 1.0]]
    vid = 0
    for g, b in enumerate(base):
        for m in range(6):
            eps = 0.001 * (m + 1)
            rows.append((vid, [x + eps * ((g + m + j) % 3 - 1) * 0.01
                               for j, x in enumerate(b)]))
            vid += 1
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    kw = dict(threshold=0.95, nlist=3, iters=2, dim=4)
    jvm = {r["vec_id"]: r["kept"]
           for r in semantic_dedup(corpus, **kw).collect()}
    blas = {r["vec_id"]: r["kept"]
            for r in semantic_dedup_blas(corpus, **kw).collect()}
    assert jvm == blas
    # near-duplicates collapse: 18 members -> a handful of keepers
    # (>= 3: the groups are mutually dissimilar so at least one per
    # direction survives; k-means may split a group across clusters,
    # which adds a keeper — the parity above is the real pin)
    assert 3 <= sum(jvm.values()) <= 6
    # capped variant parity too (cap below group size exercises the
    # banding in both implementations)
    jvm_c = {r["vec_id"]: r["kept"] for r in
             semantic_dedup(corpus, max_cluster=2, **kw).collect()}
    blas_c = {r["vec_id"]: r["kept"] for r in
              semantic_dedup_blas(corpus, max_cluster=2, **kw).collect()}
    assert jvm_c == blas_c


def test_model_quality_blas_matches_jvm_exact(spark):
    from aquacache_spark.functions.text import (hashed_linear_score,
                                                hashed_linear_score_frame,
                                                tokens)

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the the the the repeated token stress case"),
        (2, "single"),
        (3, ""),  # empty text -> split gives [''], n_features = 1
        (6, None),  # NULL text -> NULL features / NULL score, no crash
        (4, "two words"),
        (5, "a much longer document " * 12 + "with a tail"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = tokens(F.lower(F.col("text")))
    n = F.size(toks)
    jvm = {r["doc_id"]: (r["n_features"], r["quality_prob"]) for r in
           docs.select(
               "doc_id",
               (n + F.greatest(n - 1, F.lit(0))).cast("long")
               .alias("n_features"),
               hashed_linear_score(F.col("text"), num_buckets=4096)
               .alias("quality_prob")).collect()}
    kern = {r["doc_id"]: (r["n_features"], r["quality_prob"]) for r in
            hashed_linear_score_frame(docs, num_buckets=4096).collect()}
    assert set(jvm) == set(kern)
    for d in jvm:
        assert jvm[d][0] == kern[d][0], d            # n_features exact
        # the integer q and the two IEEE divisions are identical by
        # construction; only exp() libm ulps could differ — require
        # bit-equality here (same host libm through JVM and CPython
        # on these inputs) to pin the contract
        assert jvm[d][1] == kern[d][1], (d, jvm[d], kern[d])


def test_mann_kendall_twin_bit_parity(spark):
    """The kernel-twin contract pin (functions/kernel_twin) for
    mann_kendall_blas: exact equality — floats by bit pattern, NULL
    == NULL — against the JVM operator on a fixture exercising every
    NULL arm (NULL values pairing with valid ones, an all-tied group
    with var_s = 0 -> z NULL, a group below the pair threshold, even
    and odd slope counts for both interpolation branches)."""
    import datetime as dt

    from aquacache_spark.functions.kernel_twin import assert_bit_parity
    from aquacache_spark.operators.trend import (
        mann_kendall, mann_kendall_blas)

    d0 = dt.date(2020, 1, 1)
    rows = []
    # g1: plain increasing with a tie and a NULL in the middle
    for i, v in enumerate([1.0, 2.0, 2.0, None, 3.5, 0.5]):
        rows.append(("g1", d0 + dt.timedelta(days=i), v))
    # g2: all tied -> S=0, var_s=0, z NULL
    for i in range(4):
        rows.append(("g2", d0 + dt.timedelta(days=i), 7.25))
    # g3: single row -> drops from both
    rows.append(("g3", d0, 1.0))
    # g4: two NULLs + one value -> no valid pair, S=0, sen NULL
    for i, v in enumerate([None, 4.0, None]):
        rows.append(("g4", d0 + dt.timedelta(days=i), v))
    # g5: odd pair count (3 values -> 3 slopes, exact-middle branch)
    for i, v in enumerate([3.0, 1.0, 2.0]):
        rows.append(("g5", d0 + dt.timedelta(days=i), v))
    daily = spark.createDataFrame(
        rows, "series string, date date, value double")
    jvm = mann_kendall(daily, ["series"])
    twin = mann_kendall_blas(daily, ["series"])
    assert_bit_parity(jvm, twin, ["series"])


def test_mann_kendall_twin_exactness_guard(spark):
    """The twin refuses values whose quantized pair differences could
    leave int64 (kernel_twin.assert_exact_int64)."""
    import datetime as dt

    import pytest

    from aquacache_spark.operators.trend import mann_kendall_blas

    d0 = dt.date(2020, 1, 1)
    daily = spark.createDataFrame(
        [("g", d0, 1e13), ("g", d0 + dt.timedelta(days=1), 9.3e12)],
        "series string, date date, value double")
    with pytest.raises(Exception, match="exceeds the exact"):
        mann_kendall_blas(daily, ["series"]).collect()


def test_task_cache_caches_none_values():
    """r12 review find: ``get_or`` used ``is None`` as the miss
    sentinel, so a legitimately-None computed value was recomputed on
    every lookup — a twin memoizing a nullable result got a silent 0%
    hit rate. None must cache like any other value, and the cap must
    still bound inserts."""
    from aquacache_spark.functions.kernel_twin import TaskCache

    calls = []

    def compute(key):
        calls.append(key)
        return None if key == "null-key" else key.upper()

    c = TaskCache(cap=2)
    assert c.get_or("null-key", compute) is None
    assert c.get_or("null-key", compute) is None
    assert calls == ["null-key"]  # second lookup was a HIT
    assert c.get_or("a", compute) == "A"
    # cap reached: further inserts skipped, lookups still compute
    assert c.get_or("b", compute) == "B"
    assert c.get_or("b", compute) == "B"
    assert calls == ["null-key", "a", "b", "b"]


def test_hard_negative_mining_excludes_positives(spark):
    """Closed-form: 1-D-ish vectors make the ranking obvious; labeled
    positives vanish from the mined set and ranks renumber 1..k; an
    empty label set degenerates to cosine_topk exactly."""
    from aquacache_spark.operators.similarity import (
        cosine_topk, hard_negative_mining)

    # corpus on a line: cosine to the query orders by angle
    rows = [(i, [1.0, float(i) / 10.0]) for i in range(6)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") == 0)
    top = cosine_topk(emb, q, k=5).collect()
    order = [r["neighbor_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert order == [1, 2, 3, 4, 5]  # closest angles first
    pos = spark.createDataFrame(
        [(0, 1), (0, 3)], "query_id long, neighbor_id long")
    mined = hard_negative_mining(emb, q, pos, k=3).collect()
    got = [(r["rank"], r["neighbor_id"]) for r in
           sorted(mined, key=lambda r: r["rank"])]
    assert got == [(1, 2), (2, 4), (3, 5)]
    empty = spark.createDataFrame(
        [], "query_id long, neighbor_id long")
    degen = [(r["rank"], r["neighbor_id"]) for r in sorted(
        hard_negative_mining(emb, q, empty, k=5).collect(),
        key=lambda r: r["rank"])]
    assert degen == [(i + 1, n) for i, n in enumerate(order)]
