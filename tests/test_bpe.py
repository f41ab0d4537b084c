"""Ranked-merge BPE: table well-formedness, golden tokenizations, and
the min-rank <-> rank-order-pass equivalence the DuckDB oracle relies
on (functions/bpe.py module docstring)."""

import random

from aquacache_spark.functions.bpe import (
    MERGES,
    bpe_encode,
    bpe_encode_rank_order,
    bpe_token_frequencies,
)
from aquacache_spark.catalog import table
from conftest import SF_SMOKE


def test_merge_table_well_formed():
    # every side is a single char or the output of a STRICTLY earlier
    # rule, and outputs are unique — the preconditions for the oracle's
    # single rank-order pass to equal the min-rank iteration
    seen: dict[str, int] = {}
    for i, (a, b) in enumerate(MERGES):
        for side in (a, b):
            assert len(side) == 1 or seen[side] < i, (i, side)
        out = a + b
        assert out not in seen, f"duplicate output {out}"
        assert "|" not in out  # '|' is the oracle's separator
        seen[out] = i


def test_golden_tokenizations():
    # hand-traced through the merge table
    assert bpe_encode("the") == ("the",)
    assert bpe_encode("and") == ("and",)
    assert bpe_encode("which") == ("which",)
    assert bpe_encode("thinking") == ("th", "in", "k", "ing")
    assert bpe_encode("nation") == ("n", "ation")
    assert bpe_encode("stores") == ("st", "o", "re", "s")
    # overlapping-pair semantics: (0,0) merges left-to-right
    assert bpe_encode("2000") == ("2", "00", "0")
    assert bpe_encode("a") == ("a",)
    assert bpe_encode("xyz") == ("x", "y", "z")
    # tokens always reassemble the word
    for w in ("the", "thinking", "nation", "2000", "attention"):
        assert "".join(bpe_encode(w)) == w


def test_rank_order_pass_equals_min_rank_loop():
    # the equivalence the oracle's replace chain depends on, over an
    # adversarial sample: every alphabet pair/triple plus seeded
    # random words skewed toward merge-table characters
    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    hot = "theinrsandog012"
    words = [a + b for a in "aeionrst" for b in "aeionrst"]
    words += [a + b + c for a in "teo" for b in "hin" for c in "egs"]
    words += ["".join(rng.choice(hot) for _ in range(rng.randint(1, 12)))
              for _ in range(500)]
    words += ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
              for _ in range(200)]
    for w in words:
        assert bpe_encode(w) == bpe_encode_rank_order(w), w


def test_distributed_frequencies_match_local(spark):
    import re

    docs = table(spark, SF_SMOKE, "documents").limit(60)
    got = {r["token"]: r["n_occurrences"]
           for r in bpe_token_frequencies(docs, "text").collect()}
    want: dict[str, int] = {}
    for row in docs.select("text").collect():
        for w in re.findall(r"[a-z]+|[0-9]+", row["text"].lower()):
            for t in bpe_encode(w):
                want[t] = want.get(t, 0) + 1
    assert got == want


def test_bpe_train_closed_form(spark):
    # corpus {aaab: 2, ab: 3} — hand-traced:
    # r0: pairs (a,a)=4, (a,b)=5 -> merge (a,b); words [a,a,ab],[ab]
    # r1: (a,a)=2, (a,ab)=2 tie -> lexicographic (a,a); words [aa,ab]
    # r2: (aa,ab)=2 -> merge; r3: no pairs left -> early stop
    from aquacache_spark.functions.bpe import bpe_train

    words = spark.createDataFrame(
        [("aaab", 2), ("ab", 3)], "w string, cnt long")
    merges, final_words = bpe_train(words, n_merges=8)
    assert merges == [(0, "a", "b", 5), (1, "a", "a", 2),
                      (2, "aa", "ab", 2)]
    got = {r["w"]: r["s"] for r in final_words.collect()}
    assert got == {"aaab": "|aaab||", "ab": "|ab||"}
