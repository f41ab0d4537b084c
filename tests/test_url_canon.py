"""URL canonicalization invariants: idempotence (canonicalizing a
canonical URL is a no-op), golden cases, and the dot-segment fold
against a test-local Python reference of the documented semantics
(RFC 3986 5.2.4 with empty-segment collapse)."""

from pyspark.sql import functions as F

from aquacache_spark.operators.web import url_canonicalize


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i int, url string")
    rows = url_canonicalize(df, "url").orderBy("i").collect()
    return [r["canonical_url"] for r in rows], rows


GOLDENS = [
    ("HTTP://User@Example.COM:80/a/./b/../c?b=2&a=1#frag",
     "http://User@example.com/a/c?a=1&b=2"),
    ("https://X.org:443/", "https://x.org/"),
    ("https://x.org", "https://x.org/"),
    ("http://x.org:8080/a//b/.", "http://x.org:8080/a/b/"),
    ("http://x.org/../up", "http://x.org/up"),
    ("http://x.org/dots/..", "http://x.org/"),
    ("http://x.org/keep/me/", "http://x.org/keep/me/"),
    ("HttpS://x.org:80/p", "https://x.org:80/p"),  # 80 not https default
]


def test_golden_canonicalizations(spark):
    got, _ = _canon(spark, [u for u, _ in GOLDENS])
    for (u, want), g in zip(GOLDENS, got):
        assert g == want, (u, g, want)


def test_idempotence(spark):
    messy = [u for u, _ in GOLDENS] + [
        f"HTTP://H{i}.Example.COM:80/a{i % 7}/./b/../c{i % 5}/"
        f"?z={i % 3}&a=1#f{i}" for i in range(300)
    ]
    first, _ = _canon(spark, messy)
    second, _ = _canon(spark, first)
    assert first == second


def _ref_fold(path: str) -> str:
    """The documented dot-segment semantics: stack fold, empty
    segments collapse, '..' at root stays at root."""
    out = []
    for seg in path.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if out:
                out.pop()
        else:
            out.append(seg)
    base = "/" + "/".join(out) if out else ""
    trailing = path.endswith(("/", "/.", "/..")) or path == ""
    if base == "":
        return "/"
    return base + ("/" if trailing else "")


def test_dot_segment_fold_matches_reference(spark):
    paths = [
        "/a/./b/../c", "/x/y/z/../../w", "/../up", "/a//b/.",
        "/dots/..", "/keep/me/", "", "/", "/..", "/.", "/a/../..",
        "/a/b/c/../../../d", "/a/../../b", "/./././x", "/a/..../b",
        "/..a/b", "/a/b/...",
    ]
    urls = [f"http://h.org{p}" for p in paths]
    _, rows = _canon(spark, urls)
    for p, r in zip(paths, rows):
        assert r["path"] == _ref_fold(p), (p, r["path"])
