"""Ranked-merge BPE tokenizer (GPT-2 style) for exact token budgeting.

``functions/text.bpe_token_count`` estimates token counts with a
pre-tokenizer regex only; training-data budgets need merge-table-exact
counts. This module implements the real algorithm: a regex
pre-tokenizer, then the classic min-rank merge loop over a ranked
merge table (Sennrich et al. 2016 "Neural Machine Translation of Rare
Words with Subword Units"; the encoder shape of GPT-2's public
``encoder.py``).

Scale design — the kernel cost is VOCABULARY-bounded, not corpus-
bounded: documents are pre-tokenized and counted JVM-side
(regexp_extract_all + explode + map-side-combined groupBy, Zipf makes
the distinct-word frame tiny relative to the corpus), and the Python
merge loop runs ONCE per distinct pre-token over an Arrow batch. At
100 TB the shuffle carries (word, count) pairs — vocabulary-sized —
and the encode stage is a dataframe of maybe 10^7 distinct words, not
10^12 running words.

Oracle replay: the merge table is WELL-FORMED — every rule's two
symbols are either single characters or the output of a strictly
lower-ranked rule, and no two rules produce the same output string.
For such tables a SINGLE pass applying rules in rank order (each rule
merging all non-overlapping occurrences left-to-right) produces
exactly the min-rank iteration's result: a merge never makes two
pre-existing symbols newly adjacent (it only replaces a sibling pair
with a new symbol), so occurrences of rule r's pair can only be
created by the rules producing its two symbols — both ranked below r
and therefore already applied. The DuckDB oracle exploits this with a
chained ``replace()`` over a pipe-separated symbol string (leading
'|', '||' between symbols: the pattern '|x||y|' -> '|xy|' is
boundary-safe because '|' cannot occur inside a symbol, and SQL
replace's left-to-right non-overlapping scan matches the merge-step
semantics). ``bpe_encode_rank_order`` is the Python twin of that
replay; tests pin its equality with the min-rank loop.

Reference analog: none (training-data extension tier); the merge
table is a deterministic fixture, not a learned vocabulary — swap in
a real table file for production.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: pre-tokenizer: lowercased alpha runs and digit runs (a deliberately
#: RE2-and-Java-compatible subset of the GPT-2 pattern; no lookahead)
PRETOKEN_RE = "[a-z]+|[0-9]+"

#: ranked merge table (rank = list index). WELL-FORMED by construction:
#: each side is a single char or the output of an earlier rule, and
#: outputs are unique — tests/test_bpe.py validates both properties.
MERGES: list[tuple[str, str]] = [
    ("t", "h"),        # th
    ("th", "e"),       # the
    ("i", "n"),        # in
    ("e", "r"),        # er
    ("a", "n"),        # an
    ("r", "e"),        # re
    ("t", "i"),        # ti
    ("o", "n"),        # on
    ("a", "t"),        # at
    ("e", "n"),        # en
    ("o", "r"),        # or
    ("e", "s"),        # es
    ("s", "t"),        # st
    ("an", "d"),       # and
    ("in", "g"),       # ing
    ("o", "u"),        # ou
    ("a", "r"),        # ar
    ("t", "o"),        # to
    ("i", "s"),        # is
    ("i", "t"),        # it
    ("a", "l"),        # al
    ("l", "e"),        # le
    ("c", "h"),        # ch
    ("s", "e"),        # se
    ("m", "e"),        # me
    ("d", "e"),        # de
    ("w", "h"),        # wh
    ("wh", "i"),       # whi
    ("whi", "ch"),     # which
    ("ti", "on"),      # tion
    ("a", "tion"),     # ation
    ("er", "s"),       # ers
    ("1", "2"),        # 12
    ("0", "0"),        # 00
    ("2", "0"),        # 20
    ("20", "00"),      # 2000
]

_RANKS: dict[tuple[str, str], int] = {p: i for i, p in enumerate(MERGES)}


def _merge_all(symbols: tuple[str, ...], pair: tuple[str, str]
               ) -> tuple[str, ...]:
    """Merge every non-overlapping occurrence of ``pair``, scanning
    left to right (the standard BPE merge step)."""
    out: list[str] = []
    i, n = 0, len(symbols)
    a, b = pair
    while i < n:
        if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


@lru_cache(maxsize=65536)
def bpe_encode(word: str) -> tuple[str, ...]:
    """Min-rank iteration (the GPT-2 encoder loop): repeatedly merge
    the lowest-ranked pair present until none applies."""
    symbols = tuple(word)
    while len(symbols) > 1:
        best, best_rank = None, None
        for pair in zip(symbols, symbols[1:]):
            r = _RANKS.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = pair, r
        if best is None:
            break
        symbols = _merge_all(symbols, best)
    return symbols


def bpe_encode_rank_order(word: str) -> tuple[str, ...]:
    """Single pass in rank order — the oracle's replace-chain twin.
    Equal to :func:`bpe_encode` for well-formed tables (see module
    docstring); kept un-cached and separate so tests can pin the
    equivalence."""
    symbols = tuple(word)
    for pair in MERGES:
        if len(symbols) < 2:
            break
        symbols = _merge_all(symbols, pair)
    return symbols


def bpe_token_frequencies(
    docs: DataFrame, text_col: str = "text",
) -> DataFrame:
    """Corpus-wide BPE token frequencies: (token, n_occurrences).

    JVM-side pre-tokenize + count, Arrow-side encode of DISTINCT
    words only, vocab-sized aggregation — see module docstring for
    the 100 TB shape."""
    return token_frequencies_from_words(word_counts(docs, text_col))


def token_frequencies_from_words(words: DataFrame) -> DataFrame:
    """The encode+aggregate stage over an already-counted (w, cnt)
    vocabulary frame (exposed for scale pins and callers that manage
    their own pre-tokenization)."""

    def encode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            toks: list[str] = []
            weights: list[int] = []
            for w, cnt in zip(pdf["w"], pdf["cnt"]):
                counts: dict[str, int] = {}
                for t in bpe_encode(w):
                    counts[t] = counts.get(t, 0) + 1
                for t, k in counts.items():
                    toks.append(t)
                    weights.append(int(cnt) * k)
            yield pd.DataFrame({"token": toks, "weight": weights})

    enc = words.mapInPandas(encode_batches, "token string, weight long")
    return enc.groupBy("token").agg(
        F.sum("weight").cast("long").alias("n_occurrences"))


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Pre-tokenize + count: the vocabulary frame (w, cnt) every BPE
    stage runs over — map-side-combined, Zipf-small vs the corpus."""
    return (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}),"
                       f" '{PRETOKEN_RE}', 0)")
            ).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _sym_string(w_col) -> "F.Column":
    """Initial pipe-separated symbol encoding: 'ab' -> '|a||b||'."""
    return F.concat(F.lit("|"),
                    F.regexp_replace(w_col, "(.)", "$1||"))


def _pairs_of(words: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word count (overlapping
    occurrences all counted — the BPE get_stats convention)."""
    syms = F.split(F.expr("trim(BOTH '|' FROM s)"), r"\|\|")
    base = words.select("cnt", syms.alias("__sy")) \
        .withColumn("__n", F.size("__sy"))
    pr = base.where(F.col("__n") >= 2).select(
        "cnt",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.col("__n") - 1),
            lambda i: F.struct(
                F.element_at(F.col("__sy"), i).alias("a"),
                F.element_at(F.col("__sy"), i + 1).alias("b")),
        )).alias("pr"))
    return pr.groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b")) \
        .agg(F.sum("cnt").alias("c"))


def bpe_train(
    words: DataFrame, n_merges: int = 8,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn a BPE merge table from a (w, cnt) vocabulary — the
    training side of the Sennrich 2016 algorithm, distributed:

    per round, one vocabulary-sized pair-count aggregation, a global
    argmax via orderBy+limit(1) (takeOrdered tree-reduce, no
    single-partition exchange), and a map-only merge applied through
    the boundary-safe pipe-string replace. The argmax row is collected
    to the driver (1 row per round — catalog-class, the
    kmeans-centroid idiom) so the next round's replace runs with
    literal patterns; lineage is localCheckpoint-truncated per round
    (the PageRank lesson: without it round r replays rounds 0..r-1).

    Ties break on (count DESC, left ASC, right ASC) — deterministic on
    both engines. Returns (merges, final_words): merges as
    [(rank, left, right, pair_count)], final_words the vocabulary with
    its trained symbol string ``s`` (the encoded corpus vocabulary for
    free).
    """
    w = words.select("w", "cnt", _sym_string(F.col("w")).alias("s")) \
        .localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):
        best = _pairs_of(w).orderBy(
            F.desc("c"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not best:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((r, a, b, c))
        w = w.withColumn(
            "s", F.replace(F.col("s"), F.lit(f"|{a}||{b}|"),
                           F.lit(f"|{a}{b}|"))
        ).localCheckpoint(eager=True)
    return merges, w


def word_token_counts(words: DataFrame) -> DataFrame:
    """(w, ...) -> (w, n_bpe_tokens): the encoder run once per
    DISTINCT word (vocabulary-bounded) — join back against per-slice
    word counts to get exact BPE token totals for any grouping
    without re-encoding."""
    def encode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({
                "w": pdf["w"],
                "n_bpe_tokens": [len(bpe_encode(w)) for w in pdf["w"]],
            })

    return words.select("w").distinct().mapInPandas(
        encode_batches, "w string, n_bpe_tokens long")


def oracle_train_ctes(n_merges: int) -> str:
    """DuckDB replay of :func:`bpe_train`: one (pairs, argmax, merge)
    CTE triple per round over the same pipe encoding, plus a final
    ``merges`` CTE of all argmax rows. Expects a ``wc(w, cnt)`` CTE
    upstream."""
    parts = ["""
    w0 AS (
      SELECT w, cnt, '|' || regexp_replace(w, '(.)', '\\1||', 'g') AS s
      FROM wc
    )"""]
    for r in range(n_merges):
        parts.append(f"""
    , p{r} AS (
      SELECT pr[1] AS a, pr[2] AS b, sum(cnt) AS c
      FROM (SELECT cnt, unnest(list_zip(syms, syms[2:])) AS pr
            FROM (SELECT string_split(trim(s, '|'), '||') AS syms, cnt
                  FROM w{r}))
      WHERE pr[2] IS NOT NULL GROUP BY 1, 2
    ), m{r} AS (
      SELECT {r} AS rank, a, b, c FROM p{r}
      ORDER BY c DESC, a ASC, b ASC LIMIT 1
    ), w{r + 1} AS (
      SELECT w, cnt,
             replace(s, '|' || m.a || '||' || m.b || '|',
                     '|' || m.a || m.b || '|') AS s
      FROM w{r} CROSS JOIN m{r} m
    )""")
    union = " UNION ALL ".join(f"SELECT * FROM m{r}"
                               for r in range(n_merges))
    parts.append(f"""
    , merges AS ({union})""")
    return "".join(parts)


def oracle_replace_chain(expr: str) -> str:
    """Render the rank-order pass as a nested SQL ``replace()`` chain
    over the pipe-separated symbol encoding of ``expr`` (a SQL string
    expression yielding the initial '|c1||c2||...||cn||' form)."""
    out = expr
    for a, b in MERGES:
        out = f"replace({out}, '|{a}||{b}|', '|{a}{b}|')"
    return out
