"""Similarity search over embedding columns.

- **Brute-force cosine top-k** (the exactness baseline): broadcast the
  (small) query set against the corpus; cosine in pure JVM expressions
  (``zip_with`` product + ``aggregate`` sum — sequential fold, so the
  result is deterministic and engine-portable); top-k via per-query
  ``row_number``. One pass over the corpus, no shuffle of the corpus
  itself — scales to 100 TB as a map + per-query top-k tree-reduce.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signs bucket
  vectors; per-bucket brute force. Hyperplanes are derived
  deterministically from md5 so the operator needs no RNG state.
- **IVF ANN** (the alternate scale path): corpus vectors are assigned
  to their nearest centroid (inverted lists); each query probes its
  ``nprobe`` nearest lists and brute-forces only those. Centroid
  *refinement* (k-means||) is pluggable; the default seeds are the
  ``nlist`` lowest-id corpus vectors so the whole operator is
  deterministic and oracle-checkable. The list assignment is the
  partitioning key at scale — a 100 TB corpus shuffles once at build
  time, and each query touches ``nprobe``/``nlist`` of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_int


def _as_double(arr):
    return F.transform(arr, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    Output: query_id, neighbor_id, cosine, rank.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("__cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    )
    dot = _dot(F.col("__qv"), F.col("__cv"))
    nq = F.sqrt(_dot(F.col("__qv"), F.col("__qv")))
    nc = F.sqrt(_dot(F.col("__cv"), F.col("__cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot / (nq * nc))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _md5_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def hyperplanes(planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random directions, no RNG state: plane p
    component d = (md5_int('p|d') % 2001 - 1000)/1000. Exposed so the
    DuckDB oracle can inline the exact same literals."""
    return [
        [((_md5_py(f"{p}|{d}") % 2001) - 1000) / 1000.0 for d in range(dim)]
        for p in range(planes)
    ]


def lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: sign-bit string of
    the projections onto `hyperplanes`."""
    v = _as_double(F.col(vec_col))
    bits = []
    for comps_vals in hyperplanes(planes, dim):
        comps = F.array(*[F.lit(c) for c in comps_vals])
        proj = F.aggregate(
            F.zip_with(v, comps, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.select(
        F.col(id_col), F.concat(*bits).alias("bucket")
    )


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: brute force only within the query's bucket."""
    cb = lsh_buckets(corpus, id_col, vec_col, planes, dim).join(
        corpus.select(id_col, vec_col), id_col
    )
    qb = lsh_buckets(queries, id_col, vec_col, planes, dim).join(
        queries.select(id_col, vec_col), id_col
    )
    c = cb.select(
        F.col("bucket"), F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
    )
    q = qb.select(
        F.col("bucket"), F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__qv"),
    )
    dot = _dot(F.col("__qv"), F.col("__cv"))
    nq = F.sqrt(_dot(F.col("__qv"), F.col("__qv")))
    nc = F.sqrt(_dot(F.col("__cv"), F.col("__cv")))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot / (nq * nc))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def ivf_centroids(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    nlist: int = 16,
) -> DataFrame:
    """Deterministic centroid seeds: the ``nlist`` lowest-id corpus
    vectors. Production would refine these with MLlib k-means|| — the
    assignment/probe machinery below is identical either way, and the
    deterministic seed keeps the operator RNG-free and DuckDB-checkable.

    Output: ``centroid_id``, ``__centv``.
    """
    return (
        corpus.orderBy(F.col(id_col)).limit(nlist)
        .select(
            F.col(id_col).alias("centroid_id"),
            _as_double(F.col(vec_col)).alias("__centv"),
        )
    )


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    iters: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Deterministic Lloyd refinement of the IVF seed centroids.

    k-means with a fixed seed set (the ``nlist`` lowest-id vectors,
    quantized to 1e-6), a fixed iteration count, and 1e-6 quantization
    of every centroid update. The update is then an integer sum /
    count — order-independent, so the trained centroids are
    bit-reproducible across engines and runs (the DuckDB oracle replays
    the same iterations). Per iteration: one map-only assignment pass
    (centroids are literals — no join, no corpus shuffle) and one
    ``groupBy(nlist)`` aggregation; the driver holds nlist × dim
    numbers. At 100 TB this is exactly MLlib's k-means shape (per-pass
    assignment + tree-aggregated sums), minus RNG.
    """
    import math

    Q = 1000000.0
    vec = _as_double(F.col(vec_col))
    seeds = (
        corpus.orderBy(F.col(id_col))
        .limit(nlist)
        .select(vec.alias("__cv"))
        .collect()
    )
    cents: list[list[float]] = [
        [math.floor(x * Q + 0.5) / Q for x in row["__cv"]] for row in seeds
    ]

    nv = F.sqrt(_dot(vec, vec))
    qarr = F.transform(vec, lambda x: F.floor(x * Q + F.lit(0.5)))
    for _ in range(iters):
        choices = []
        for cid, cv in enumerate(cents):
            carr = F.array(*[F.lit(c) for c in cv])
            sim = _dot(vec, carr) / (nv * F.sqrt(_dot(carr, carr)))
            choices.append(
                F.struct(sim.alias("s"), F.lit(-cid).alias("nc"))
            )
        best = F.array_max(F.array(*choices))
        rows = (
            corpus.select((-best["nc"]).alias("cid"), qarr.alias("__q"))
            .groupBy("cid")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.col("__q")[i]).alias(f"s{i}") for i in range(dim)],
            )
            .collect()
        )
        by_cid = {r["cid"]: r for r in rows}
        cents = [
            (
                [
                    math.floor(by_cid[cid][f"s{i}"] / by_cid[cid]["n"] + 0.5) / Q
                    for i in range(dim)
                ]
                if cid in by_cid
                else cv  # empty cluster keeps its previous centroid
            )
            for cid, cv in enumerate(cents)
        ]

    spark = corpus.sparkSession
    return spark.createDataFrame(
        [(cid, cv) for cid, cv in enumerate(cents)],
        "centroid_id bigint, __centv array<double>",
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    out_id: str = "vec_id",
) -> DataFrame:
    """Top-``nprobe`` nearest centroids per vector (``nprobe=1`` is the
    build-side inverted-list assignment). Centroids are catalog-sized →
    broadcast; the scoring is a map-only pass over ``df``."""
    scored = (
        df.select(F.col(id_col).alias(out_id), _as_double(F.col(vec_col)).alias("__v"))
        .crossJoin(F.broadcast(centroids))
        .withColumn("__sim", _cosine(F.col("__v"), F.col("__centv")))
    )
    w = Window.partitionBy(out_id).orderBy(F.desc("__sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= nprobe)
        .select(out_id, "centroid_id", "__v")
    )


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    train_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: brute force only within the query's
    ``nprobe`` probed inverted lists.

    Each corpus vector lives in exactly one list, so the probe join
    yields each (query, neighbor) pair at most once — no dedupe needed.
    The probe join shuffles the corpus on ``centroid_id`` once
    (query side broadcast), which is exactly the IVF partitioning a
    1000-executor cluster wants; each query then touches ~nprobe/nlist
    of the data instead of all of it.

    ``train_iters > 0`` refines the seed centroids with that many
    deterministic Lloyd iterations (``kmeans_centroids``) before
    assignment — better-balanced lists, higher recall at the same
    nprobe.
    """
    if train_iters > 0:
        cent = kmeans_centroids(corpus, id_col, vec_col, nlist, train_iters)
    else:
        cent = ivf_centroids(corpus, id_col, vec_col, nlist)
    lists = ivf_assign(corpus, cent, id_col, vec_col, nprobe=1, out_id="neighbor_id")
    probes = ivf_assign(
        queries, cent, id_col, vec_col, nprobe=nprobe, out_id="query_id"
    ).withColumnRenamed("__v", "__qv")
    scored = (
        lists.join(F.broadcast(probes), "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine(F.col("__qv"), F.col("__v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
