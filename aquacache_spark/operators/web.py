"""URL normalization + domain-level curation rollups.

Standard web-corpus pipeline stage (the domain axis of curation, next
to the per-doc quality gates in functions/text.py): canonicalize raw
URLs, resolve the registered domain, and aggregate per-domain corpus
statistics that drive domain filtering / mixture decisions.

Everything is codegen'd string expressions — split/regexp/array ops,
no UDFs — and every rule is mirrored 1:1 in the DuckDB oracle
(queries.url_domain_rollup):

- lowercase; strip scheme; strip one leading ``www.``;
- host / path split at the first ``/``, query at the first ``?``;
- default ports ``:80``/``:443`` dropped;
- tracking params (``utm_*``, ``fbclid``, ``gclid``, ``ref``)
  dropped, the rest sorted for a canonical query string;
- registered domain = last two host labels, or three when the
  two-label tail is a multi-part public suffix (small embedded set —
  a deployment swaps in the full public-suffix list as a broadcast
  table without changing the shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MULTI_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "com.br", "gc.ca", "on.ca", "qc.ca",
)
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "ref=")


def parse_url(url: Column) -> dict[str, Column]:
    """-> dict of host, registered_domain, path, query_norm, url_norm,
    is_https column expressions."""
    u = F.lower(F.trim(url))
    is_https = u.startswith("https://")
    rest = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"^www\.", "")
    hostport = F.split(rest, "[/?]", 2).getItem(0)
    host = F.regexp_replace(hostport, r":(80|443)$", "")
    after_host = F.substring(rest, F.length(hostport) + 1, 1 << 20)
    path = F.split(after_host, r"\?", 2).getItem(0)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    raw_query = F.when(
        after_host.contains("?"),
        F.substring_index(after_host, "?", -1),
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(raw_query, "&"),
        lambda p: (p != "")
        & ~F.exists(
            F.array(*[F.lit(t) for t in TRACKING_PREFIXES]),
            lambda t: p.startswith(t),
        ),
    )
    query_norm = F.array_join(F.array_sort(params), "&")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # try_element_at: single-label hosts (localhost) have no -2 index
    tail2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)),
        F.try_element_at(labels, F.lit(-1)))
    is_multi = tail2.isin(*MULTI_SUFFIXES) & (n >= 3)
    registered = F.when(
        is_multi,
        F.concat_ws(".", F.try_element_at(labels, F.lit(-3)), tail2),
    ).when(n >= 2, tail2).otherwise(host)
    url_norm = F.concat(
        host, path,
        F.when(query_norm == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), query_norm)),
    )
    return {
        "host": host,
        "registered_domain": registered,
        "path": path,
        "query_norm": query_norm,
        "url_norm": url_norm,
        "is_https": is_https,
    }


def with_parsed_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append the parse_url columns — pure map-side."""
    parts = parse_url(F.col(url_col))
    return df.withColumns(parts)


def domain_rollup(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-registered-domain curation statistics: doc count, distinct
    hosts, canonical-URL duplicate count (same url_norm appearing
    more than once), token mass, https share. One shuffle keyed on the
    domain (plus one distinct on url_norm — both partial-aggregable)."""
    from ..functions.text import tokens

    p = with_parsed_url(df, url_col)
    base = p.select(
        id_col, "registered_domain", "host", "url_norm", "is_https",
        F.size(tokens(F.lower(F.col(text_col)))).cast("long")
        .alias("__ntok"),
    )
    per_url = base.groupBy("registered_domain", "url_norm").agg(
        F.count(F.lit(1)).alias("__n")
    )
    url_dups = per_url.groupBy("registered_domain").agg(
        F.sum(F.col("__n") - 1).alias("dup_url_docs"),
        F.count(F.lit(1)).alias("n_urls"),
    )
    stats = base.groupBy("registered_domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("host").alias("n_hosts"),
        F.sum("__ntok").alias("total_tokens"),
        F.sum(F.when(F.col("is_https"), 1).otherwise(0)).alias("n_https"),
    )
    return stats.join(url_dups, "registered_domain").select(
        "registered_domain", "n_docs", "n_hosts", "n_urls",
        "dup_url_docs", "total_tokens",
        (F.col("n_https") / F.col("n_docs")).alias("https_frac"),
    )
