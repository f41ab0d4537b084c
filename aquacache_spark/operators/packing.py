"""Training-batch assembly operators: sequence packing into fixed
token-budget context windows, deterministic domain-mixture sampling,
and DSIR-style hashed n-gram importance weights.

These extend the engine beyond the reference's surface into the
operations a large-scale training-data pipeline needs after curation
(north star, SURVEY.md §7.1 item 12).  All deterministic: re-running
at any partitioning produces identical assignments.

Scale shapes:

- ``pack_sequences`` shards by a portable hash of the doc id, then runs
  the (inherently sequential) next-fit scan per shard with one Arrow
  stream per partition — the same economics as the increments kernel
  (operators/_grouped.py).  Shards are independent, so parallelism is
  ``n_shards``; bin quality is unaffected by shard count (each bin
  lives inside one shard).
- ``mixture_sample`` needs one catalog-sized aggregate (per-domain
  token totals) + a map-only keep/drop pass — no per-doc shuffle.
- ``importance_weights`` builds bucket log-ratios with two aggregates
  over hashed bigrams (target sample vs raw corpus), broadcasts the
  bucket table (size = num_buckets, fixed), and scores docs map-only.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import md5_int, tokens
from ._grouped import grouped_apply


def scan_pack(
    tokens, budget: int, state: tuple[int, int] = (0, 0)
) -> tuple[list[int], list[int], tuple[int, int]]:
    """The next-fit recurrence over a token-count sequence, resumable:
    ``state`` is (open bin id, its fill).  Returns (bin ids, offsets,
    final state) — shared by the batch kernel and the streaming
    operator (streaming/stateful.streaming_pack) so both produce
    identical assignments."""
    bin_id, fill = state
    bins, offsets = [], []
    for t in tokens:
        t = int(t)
        if fill > 0 and fill + t > budget:
            bin_id += 1
            fill = 0
        offsets.append(fill)
        bins.append(bin_id)
        fill += t
    return bins, offsets, (bin_id, fill)


def _pack_kernel(budget: int, id_col: str, token_col: str):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, offsets, _ = scan_pack(pdf[token_col].astype("int64"), budget)
        out = pdf.copy()
        out["bin_id"] = pd.Series(bins, dtype="int64")
        out["bin_offset"] = pd.Series(offsets, dtype="int64")
        return out

    return kernel


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 32,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    group_cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """Next-fit packing of documents into fixed token-budget bins.

    Within a shard (md5 of the id mod ``n_shards``) documents pack in
    id order; a document that would overflow the open bin starts a new
    one; an oversized document occupies a bin alone (splitting it into
    budget-size pieces is the trainer's concern).  Output adds
    (shard, bin_id, bin_offset) — bin ids are per-shard.

    Next-fit is a prefix-dependent recurrence (each assignment depends
    on the running fill), so the scan is a per-shard Arrow kernel, not
    a window: a cumulative-sum split would let documents straddle
    bins.
    """
    if group_cols is None:
        keys = ["shard"]
        sharded = docs.select(
            F.col(id_col).cast("long").alias(id_col),
            F.col(token_col).cast("long").alias(token_col),
            (md5_int(F.col(id_col).cast("string")) % n_shards)
            .alias("shard"),
        )
        key_fields = [T.StructField("shard", T.LongType())]
    else:
        # caller-supplied packing groups (e.g. (split, shard)): bins
        # never span a group, parallelism = group count
        keys = list(group_cols)
        sharded = docs.select(
            F.col(id_col).cast("long").alias(id_col),
            F.col(token_col).cast("long").alias(token_col),
            *keys,
        )
        key_fields = [sharded.schema[k] for k in keys]
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField(token_col, T.LongType()),
        *key_fields,
        T.StructField("bin_id", T.LongType()),
        T.StructField("bin_offset", T.LongType()),
    ])
    return grouped_apply(
        sharded, keys, _pack_kernel(budget, id_col, token_col), schema
    )


def mixture_sample(
    docs: DataFrame,
    target_weights: dict[str, float],
    domain_col: str = "domain",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic down-sampling to a target domain token mixture.

    Given per-domain target weights, the largest feasible corpus
    keeping every domain at (or naturally below) its target share is
    the one anchored by the domain with the highest tokens/weight
    deficit: scale = min over domains of (domain_tokens / weight).
    Each domain keeps ``weight * scale`` tokens via a hash-of-id keep
    rule (keep_frac of docs, stable under re-runs and immune to doc
    order).  Domains missing from ``target_weights`` are dropped.

    Output: docs + (keep_frac, kept).  Filtering to ``kept`` realizes
    the mixture in expectation over the id hash.
    """
    spark = docs.sparkSession
    totals = {
        r[domain_col]: r["t"]
        for r in docs.groupBy(domain_col)
        .agg(F.sum(F.col(token_col).cast("long")).alias("t"))
        .collect()
    }
    # a requested domain with no tokens cannot anchor the mixture —
    # it is skipped (the produced corpus under-represents it)
    scale = min(
        totals[d] / w
        for d, w in target_weights.items()
        if w > 0 and totals.get(d)
    )
    fracs = [
        (d, min(1.0, (w * scale) / totals[d]))
        for d, w in target_weights.items()
        if totals.get(d)
    ]
    from ..session import local_df

    frac_df = local_df(spark, fracs, f"{domain_col} string, keep_frac double")
    # uniform [0,1) from a 12-hex-digit md5 prefix (48 bits)
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(salt),
                                          F.col(id_col).cast("string"))), 1, 12),
            16, 10,
        ).cast("double") / F.lit(float(16 ** 12))
    )
    return (
        docs.join(F.broadcast(frac_df), domain_col, "inner")
        .withColumn("kept", u < F.col("keep_frac"))
    )


def importance_weights(
    corpus: DataFrame,
    target: DataFrame,
    num_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 1.0,
) -> DataFrame:
    """DSIR-style data-selection weights (hashed-bigram importance
    sampling): per-doc mean log-likelihood ratio between a target
    distribution and the raw corpus over hashed word-bigram features.

    Both distributions are add-``smoothing`` estimates over
    ``num_buckets`` hash buckets; a doc's weight is
    mean over its bigrams of ``ln(p_target(b) / p_raw(b))`` — higher
    means the doc looks more like the target set.  The log-ratio table
    is ``num_buckets`` rows -> broadcast; corpus docs are scored in one
    map-side pass + one explode-aggregate keyed by doc.
    """

    def bigram_buckets(df: DataFrame, keep_empty: bool = False) -> DataFrame:
        toks = tokens(F.lower(F.col(text_col)))
        bigrams = F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        # explode_outer keeps bigram-less docs as one NULL row, so the
        # final score aggregate covers every doc without a corpus-scale
        # reattachment join
        exp = F.explode_outer(bigrams) if keep_empty else F.explode(bigrams)
        # r13 (guide §2.5): the md5-per-bigram mass ran in the single
        # scan split; spread is a no-op at real split counts
        from .dedup import _spread_scan

        return _spread_scan(df, id_col).select(
            F.col(id_col), exp.alias("bigram")).select(
            id_col,
            (md5_int(F.col("bigram")) % num_buckets).alias("bucket"),
        )

    tgt = bigram_buckets(target).groupBy("bucket").agg(
        F.count("*").alias("tn"))
    raw = bigram_buckets(corpus).groupBy("bucket").agg(
        F.count("*").alias("rn"))
    tgt_total = tgt.agg(F.sum("tn")).first()[0] or 0
    raw_total = raw.agg(F.sum("rn")).first()[0] or 0
    # the per-bucket log ratio is quantized to 1e-6 so the per-doc mean
    # can accumulate through exact integer micro-units — order
    # independent across partitionings (see operators/daily.exact_mean)
    lr = (
        F.log(
            (F.coalesce(F.col("tn"), F.lit(0)) + F.lit(smoothing))
            / F.lit(float(tgt_total) + smoothing * num_buckets)
        )
        - F.log(
            (F.coalesce(F.col("rn"), F.lit(0)) + F.lit(smoothing))
            / F.lit(float(raw_total) + smoothing * num_buckets)
        )
    )
    ratios = tgt.join(raw, "bucket", "full_outer").select(
        "bucket",
        (F.floor(lr * 1e6 + F.lit(0.5)) / 1e6).alias("log_ratio"),
    )
    from .daily import exact_mean

    # one pass over the corpus: broadcast-join the bucket table (a
    # NULL bucket from a bigram-less doc matches nothing), aggregate
    # per doc — no corpus-vs-corpus shuffle join anywhere
    return (
        bigram_buckets(corpus, keep_empty=True)
        .join(F.broadcast(ratios), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("log_ratio").alias("n_bigrams"),
            F.coalesce(
                exact_mean(F.col("log_ratio")), F.lit(0.0)
            ).alias("importance"),
        )
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split long documents into training-window chunks with overlap —
    the standard pre-tokenization windowing stage (every chunk at most
    ``max_tokens`` whitespace tokens; consecutive chunks share
    ``overlap`` tokens so no context is lost at boundaries).

    Chunk starts advance by ``stride = max_tokens - overlap``; the
    last chunk may be shorter, and a chunk is emitted at a start
    position only when it contributes at least one NEW token (so a
    doc of <= max_tokens yields exactly one chunk). Deterministic:
    chunk_id = start // stride.

    Pure map-side: one staged token-array column, a sequence() of
    chunk starts, slice + concat_ws per chunk, one explode — no
    shuffle at all, embarrassingly parallel at 100 TB. Output:
    (id, chunk_id, chunk_text, n_tokens, start_token).
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    stride = max_tokens - overlap
    base = df.select(
        F.col(id_col),
        F.split(F.col(text_col), " ").alias("__toks"),
    ).withColumn("__n", F.size("__toks"))
    n = F.col("__n")
    # starts: 0, stride, 2*stride, ... while start < n (and the chunk
    # adds new tokens: start + overlap < n for start > 0 — equivalent
    # to start < n - overlap, i.e. last start index floor((n-1-overlap)
    # / stride) for n > max_tokens; <= max_tokens docs -> one chunk)
    last = F.greatest(
        F.floor((n - 1 - F.lit(overlap)).cast("double") / stride)
        .cast("int"), F.lit(0))
    chunks = F.transform(
        F.sequence(F.lit(0), last),
        lambda i: F.struct(
            i.alias("cid"),
            F.concat_ws(
                " ",
                F.slice(F.col("__toks"), i * stride + 1,
                        F.lit(max_tokens))).alias("txt"),
            F.least(n - i * stride, F.lit(max_tokens)).alias("nt"),
            (i * stride).alias("st"),
        ),
    )
    return base.select(
        F.col(id_col),
        F.explode(chunks).alias("__c"),
    ).select(
        id_col,
        F.col("__c.cid").cast("long").alias("chunk_id"),
        F.col("__c.txt").alias("chunk_text"),
        F.col("__c.nt").cast("long").alias("n_tokens"),
        F.col("__c.st").cast("long").alias("start_token"),
    )


def temperature_mixture_sample(
    docs: DataFrame,
    budget_frac: float = 0.5,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    salt: str = "temp-v1",
) -> DataFrame:
    """Temperature-scaled mixture sampling (the multilingual-LM
    rebalancing rule, temperature alpha = 0.5): target share
    q_d ∝ n_d^alpha flattens the natural distribution toward uniform,
    up-weighting small domains. alpha = 0.5 keeps the power function
    as IEEE sqrt — correctly rounded on both engines, unlike pow(x,
    0.3) whose libm rounding may differ.

    The sqrt normalizer accumulates as exact micro-units (bigint sum
    of floor(sqrt(n_d)*1e6+0.5)) so the shares are independent of the
    domain-count frame's merge order. Token budget T = floor(
    budget_frac * total_tokens); keep_frac_d = min(1, q_d * T / n_d),
    realized by the engine-wide hash-of-id keep rule. All in-plan:
    the totals are a domain-cardinality aggregate broadcast back — no
    driver collect.

    Output: docs + (q, keep_frac, kept).
    """
    tot = docs.groupBy(domain_col).agg(
        F.sum(F.col(token_col).cast("long")).alias("__n"))
    tot = tot.withColumn(
        "__squ", F.floor(F.sqrt(F.col("__n")) * 1e6 + F.lit(0.5))
        .cast("long"))
    norm = tot.agg(F.sum("__squ").alias("__ssum"),
                   F.sum("__n").alias("__grand"))
    rates = (
        tot.crossJoin(F.broadcast(norm))
        .withColumn("q", F.col("__squ") / F.col("__ssum"))
        .withColumn(
            "keep_frac",
            F.least(
                F.lit(1.0),
                F.col("__squ") / F.col("__ssum")
                * F.floor(F.lit(budget_frac) * F.col("__grand"))
                / F.col("__n")))
        .select(domain_col, "q", "keep_frac")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}|"),
                               F.col(id_col).cast("string"))), 1, 12),
            16, 10).cast("long")
        / F.lit(float(1 << 48))
    )
    return (
        docs.join(F.broadcast(rates), domain_col)
        .withColumn("kept", u < F.col("keep_frac"))
    )
