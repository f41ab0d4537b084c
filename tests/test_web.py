"""URL canonicalization unit cases (operators/web.py)."""

from pyspark.sql import functions as F

from aquacache_spark.operators.web import with_parsed_url


def _parse(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return with_parsed_url(df).collect()[0]


def test_scheme_www_port_and_tracking_params_stripped(spark):
    r = _parse(spark,
               "HTTPS://WWW.News.Example.COM:443/a/b?utm_source=x&z=1&a=2")
    assert r["host"] == "news.example.com"
    assert r["registered_domain"] == "example.com"
    assert r["path"] == "/a/b"
    assert r["query_norm"] == "a=2&z=1"  # sorted, tracking dropped
    assert r["url_norm"] == "news.example.com/a/b?a=2&z=1"
    assert r["is_https"]


def test_multi_part_public_suffix(spark):
    r = _parse(spark, "http://a.b.gov.uk/x")
    assert r["registered_domain"] == "b.gov.uk"
    r = _parse(spark, "http://gov.uk/")
    assert r["registered_domain"] == "gov.uk"


def test_bare_host_defaults(spark):
    r = _parse(spark, "http://example.org")
    assert r["path"] == "/"
    assert r["query_norm"] == ""
    assert r["url_norm"] == "example.org/"
    assert not r["is_https"]


def test_single_label_host(spark):
    r = _parse(spark, "http://localhost:80/admin")
    assert r["host"] == "localhost"
    assert r["registered_domain"] == "localhost"


def test_nondefault_port_kept_in_url_not_domain(spark):
    r = _parse(spark, "http://shop.example.com:8080/x?a=1")
    assert r["host"] == "shop.example.com"       # no port in host
    assert r["registered_domain"] == "example.com"
    assert r["url_norm"] == "shop.example.com:8080/x?a=1"  # port survives


def test_tracking_params_match_by_name_not_prefix(spark):
    r = _parse(spark,
               "http://e.com/x?gclidx=1&gclid=zz&refresh=2&ref=aa&fbclid=b")
    # exact names fbclid/gclid/ref drop; gclidx/refresh are different
    # params and survive
    assert r["query_norm"] == "gclidx=1&refresh=2"


def test_registered_domain_psl_longest_match(spark):
    from aquacache_spark.operators.web import load_psl, registered_domain_psl

    psl = load_psl(spark)
    hosts = ["a.b.k12.ca.us", "b.k12.ca.us", "k12.ca.us", "x.ca.us",
             "shop.acme.com.mx", "acme.co.nz", "plain.example.org",
             "localhost", "gov.uk"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = {r["host"]: r["registered_domain"]
           for r in registered_domain_psl(df, psl).collect()}
    assert out["a.b.k12.ca.us"] == "b.k12.ca.us"  # 3-label rule wins
    assert out["b.k12.ca.us"] == "b.k12.ca.us"
    assert out["k12.ca.us"] == "k12.ca.us"        # host == suffix
    assert out["x.ca.us"] == "x.ca.us"            # 2-label rule ca.us
    assert out["shop.acme.com.mx"] == "acme.com.mx"
    assert out["acme.co.nz"] == "acme.co.nz"
    assert out["plain.example.org"] == "example.org"  # default rule
    assert out["localhost"] == "localhost"
    assert out["gov.uk"] == "gov.uk"


def test_registered_domain_psl_wildcard_exception(spark):
    from aquacache_spark.operators.web import load_psl, registered_domain_psl

    psl = load_psl(spark)
    hosts = [
        "a.example.ck",       # *.ck: pub suffix example.ck
        "example.ck",         # host IS a wildcard public suffix
        "www.ck",             # !www.ck exception: pub suffix ck
        "b.www.ck",           # under the exception: registered www.ck
        "ck",                 # bare TLD
        "x.y.kawasaki.jp",    # *.kawasaki.jp: pub suffix y.kawasaki.jp
        "city.kawasaki.jp",   # exception: registered city.kawasaki.jp
        "a.city.kawasaki.jp",
        "s.cdn.prod.atlassian-dev.net",  # 4-label literal rule
        "cdn.prod.atlassian-dev.net",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = {r["host"]: r["registered_domain"]
           for r in registered_domain_psl(df, psl).collect()}
    assert out["a.example.ck"] == "a.example.ck"
    assert out["example.ck"] == "example.ck"
    assert out["www.ck"] == "www.ck"
    assert out["b.www.ck"] == "www.ck"
    assert out["ck"] == "ck"
    assert out["x.y.kawasaki.jp"] == "x.y.kawasaki.jp"
    assert out["city.kawasaki.jp"] == "city.kawasaki.jp"
    assert out["a.city.kawasaki.jp"] == "city.kawasaki.jp"
    assert out["s.cdn.prod.atlassian-dev.net"] == \
        "s.cdn.prod.atlassian-dev.net"
    assert out["cdn.prod.atlassian-dev.net"] == \
        "cdn.prod.atlassian-dev.net"


def test_psl_joins_are_broadcast(spark):
    from aquacache_spark.operators.web import (load_psl, psl_rules,
                                               registered_domain_psl)

    psl = load_psl(spark)
    n_lens = len(psl_rules(psl))  # one hash probe per rule length...
    df = spark.createDataFrame([("a.co.uk",)], "host string")
    out = registered_domain_psl(df, psl)
    out.collect()  # materialize so the AQE final plan is available
    p = out._jdf.queryExecution().executedPlan().toString()
    p = p.split("== Initial Plan ==")[0]  # count the FINAL plan only
    assert p.count("BroadcastHashJoin") == n_lens
    # ...but ONE materialized broadcast: the shared single-key rule dim
    # makes every build subtree identical, so all later probes reuse
    # the first exchange instead of paying a driver round trip each
    assert "ReusedExchange" in p
    assert p.count("BroadcastExchange") - p.count("ReusedExchange") == 1
    assert "SortMergeJoin" not in p and "Exchange hashpartitioning" not in p


def test_registered_domain_psl_empty_rule_table(spark):
    from aquacache_spark.operators.web import registered_domain_psl

    psl = spark.createDataFrame([], "suffix string")
    df = spark.createDataFrame(
        [("a.b.co.uk",), ("example.com",), ("localhost",)], "host string")
    out = {r["host"]: r["registered_domain"]
           for r in registered_domain_psl(df, psl).collect()}
    # only the implicit '*' rule applies: last two labels
    assert out["a.b.co.uk"] == "co.uk"
    assert out["example.com"] == "example.com"
    assert out["localhost"] == "localhost"


def _psl_reference(host: str, rules: list) -> str:
    """Pure-Python publicsuffix.org algorithm (the spec, independently
    re-implemented): all matching rules considered, exception beats
    all, else most labels wins, no match -> implicit '*'."""
    labels = host.split(".")
    n = len(labels)
    matches = []
    for rule in rules:
        if rule.startswith("!"):
            body = rule[1:].split(".")
            k = len(body)
            if n >= k and labels[-k:] == body:
                matches.append((10 ** 9, k - 1))
        elif rule.startswith("*."):
            body = rule[2:].split(".")
            k = len(body)
            if n >= k + 1 and labels[-k:] == body:
                matches.append((k + 1, k + 1))
        else:
            body = rule.split(".")
            k = len(body)
            if n >= k and labels[-k:] == body:
                matches.append((k, k))
    pub = max(matches)[1] if matches else 1
    return host if n <= pub else ".".join(labels[-(pub + 1):])


def test_registered_domain_psl_exhaustive_vs_reference(spark):
    """Exhaustive differential check over EVERY host of 1-4 labels on
    {a, b, c} against a tricky rule set: same-key literal+wildcard
    collision ('b' vs '*.b'), exception overriding a same-key literal
    ('!a.b' vs 'a.b'), a 1-label literal, and a 3-label literal — one
    Spark job for all 120 hosts."""
    from itertools import product

    from aquacache_spark.operators.web import registered_domain_psl

    rules = ["b", "*.b", "!a.b", "a.b", "b.a", "c.c.c"]
    hosts = [".".join(p)
             for k in (1, 2, 3, 4)
             for p in product("abc", repeat=k)]
    psl = spark.createDataFrame([(r,) for r in rules], "suffix string")
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r["host"]: r["registered_domain"]
           for r in registered_domain_psl(df, psl).collect()}
    for h in hosts:
        assert got[h] == _psl_reference(h, rules), (
            h, got[h], _psl_reference(h, rules))


def test_robots_rfc9309_semantics(spark):
    """Closed-form RFC 9309 checks: exact-agent group precedence (the
    '*' group is IGNORED when the agent has its own), wildcard + '$'
    anchor matching, longest-match with Allow winning ties, and
    rule-less hosts allowed."""
    from aquacache_spark.operators.web import parse_robots, robots_allowed

    txt = ("# c\nUser-agent: *\nDisallow: /private\nAllow: /private/ok\n"
           "User-agent: aquabot\nUser-agent: other\n"
           "Disallow: /tmp*\nAllow: /tmp/keep$\nDisallow: /exact$\n")
    robots = spark.createDataFrame(
        [("h1", txt), ("h2", "User-agent: *\nDisallow: /\nDisallow:\n")],
        "host string, content string")
    rules = parse_robots(robots)
    got = {(r["host"], r["agent"], r["rule"], r["path"])
           for r in rules.collect()}
    assert ("h1", "aquabot", "disallow", "/tmp*") in got
    assert ("h1", "other", "allow", "/tmp/keep$") in got
    assert ("h2", "*", "disallow", "/") in got
    assert not any(p == "" for (_, _, _, p) in got)  # empty Disallow drops

    urls = spark.createDataFrame(
        [("h1", "/private/x", 1), ("h1", "/tmp9/f", 2),
         ("h1", "/tmp/keep", 3), ("h1", "/tmp/keepx", 4),
         ("h1", "/exact", 5), ("h1", "/exactly", 6),
         ("h2", "/a", 7), ("h9", "/b", 8)],
        "host string, path string, doc_id int")
    out = {r["doc_id"]: r["allowed"]
           for r in robots_allowed(urls, rules, agent="AquaBot").collect()}
    # exact-agent group: '*' rules (incl. /private) do NOT apply
    assert out == {1: True, 2: False, 3: True, 4: False,
                   5: False, 6: True, 7: False, 8: True}


def test_parse_robots_size_cap(spark):
    """RFC 9309 §2.5 parse limit: content past max_bytes is ignored
    (tail truncation), bounding per-host rule mass against
    adversarial multi-megabyte robots files."""
    from aquacache_spark.operators.web import parse_robots

    head = "User-agent: *\nDisallow: /a\n"
    tail = "Disallow: /bomb\n" * 1000
    robots = spark.createDataFrame(
        [("h1", head + tail)], "host string, content string")
    capped = parse_robots(robots, max_bytes=len(head))
    rules = {(r["rule"], r["path"]) for r in capped.collect()}
    assert rules == {("disallow", "/a")}
    full = parse_robots(robots, max_bytes=None)
    assert full.count() == 1001


def _robots_reference(text: str, max_bytes=None):
    """Pure-Python RFC 9309 group parser, independently re-implemented
    (the spec, not the operator): returns {(host-agnostic) (agent,
    rule, path)} for one file."""
    if max_bytes is not None:
        text = text[:max_bytes]
    out = []
    groups: list[tuple[list[str], int]] = []  # (agent run, n rules)
    agents: list[str] = []
    nrules = 0
    in_header = False
    for raw in text.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue  # blank or invalid (no directive separator)
        d = line.split(":", 1)[0].strip().lower()
        v = line.split(":", 1)[1].strip()
        if d == "user-agent":
            if not in_header:
                if agents:
                    groups.append((agents, nrules))
                agents, nrules = [], 0
                in_header = True
            agents.append(v.lower())
        else:
            in_header = False
            if d in ("allow", "disallow") and v != "":
                nrules += 1
                for a in agents:
                    out.append((a, d, v))
    if agents:
        groups.append((agents, nrules))
    # a group that binds no rules still registers agent presence
    # (NULL rule/path) — RFC 9309 group selection needs it
    for ag, n in groups:
        if n == 0:
            for a in ag:
                out.append((a, None, None))
    return set(out)


def test_parse_robots_random_vs_reference(spark):
    """Randomized differential check: 60 generated robots files (agent
    runs, comments, blanks, empty values, rule blocks appended after
    agent-specific groups) parsed by the operator must equal the
    independent pure-Python RFC parser — one Spark job for all files."""
    import random

    from aquacache_spark.operators.web import parse_robots

    rng = random.Random(20260815)
    agents = ["*", "aquabot", "Crawler-X", "other"]
    paths = ["/a", "/a/b", "/tmp*", "/x$", "/deep/path/seg", ""]
    files = []
    for h in range(60):
        lines = []
        for _ in range(rng.randint(2, 14)):
            r = rng.random()
            if r < 0.35:
                lines.append(f"User-agent: {rng.choice(agents)}")
            elif r < 0.75:
                lines.append(
                    f"{rng.choice(['Allow', 'Disallow'])}: "
                    f"{rng.choice(paths)}")
            elif r < 0.85:
                lines.append("# comment line")
            elif r < 0.9:
                lines.append("")
            elif r < 0.95:
                lines.append("Crawl-delay: 10")
            else:
                lines.append(rng.choice(
                    ["Disallow", "User-agent", "garbage words here"]))
        files.append((f"h{h}", "\n".join(lines)))
    robots = spark.createDataFrame(files, "host string, content string")
    got: dict = {}
    for r in parse_robots(robots).collect():
        got.setdefault(r["host"], set()).add(
            (r["agent"], r["rule"], r["path"]))
    for host, text in files:
        assert got.get(host, set()) == _robots_reference(text), host


def test_robots_ruleless_named_group_beats_star(spark):
    """RFC 9309: a named group that binds NO rules ('User-agent:
    aquabot' + empty 'Disallow:') is still the MATCHED group for that
    agent — allow everything — and the '*' group's restrictions must
    not apply. parse_robots registers the group as an agent-presence
    row (NULL rule/path)."""
    from aquacache_spark.operators.web import parse_robots, robots_allowed

    txt = ("User-agent: *\nDisallow: /\n"
           "User-agent: aquabot\nDisallow:\n")
    robots = spark.createDataFrame(
        [("h1", txt)], "host string, content string")
    rules = parse_robots(robots)
    got = {(r["agent"], r["rule"], r["path"]) for r in rules.collect()}
    assert ("aquabot", None, None) in got
    assert ("*", "disallow", "/") in got

    urls = spark.createDataFrame(
        [("h1", "/anything", 1)], "host string, path string, doc_id int")
    out = robots_allowed(urls, rules, agent="aquabot").collect()
    assert len(out) == 1 and out[0]["allowed"] is True
    assert out[0]["matched_rule"] is None
    # a different agent still hits the '*' group
    out2 = robots_allowed(urls, rules, agent="otherbot").collect()
    assert out2[0]["allowed"] is False


def test_robots_null_passthru_and_duplicate_rows(spark):
    """The verdict restore join keys on a synthetic row id: URL rows
    with NULL passthru values must keep their DISALLOWED verdict (a
    name-based join-back silently fails open on NULLs), and exact
    duplicate URL rows each keep one verdict row."""
    from aquacache_spark.operators.web import parse_robots, robots_allowed

    robots = spark.createDataFrame(
        [("h1", "User-agent: *\nDisallow: /private\n")],
        "host string, content string")
    rules = parse_robots(robots)
    urls = spark.createDataFrame(
        [("h1", "/private/x", None), ("h1", "/private/x", None),
         ("h1", "/ok", None), ("h1", "/private/y", 7)],
        "host string, path string, meta int")
    out = robots_allowed(urls, rules, agent="aquabot")
    rows = out.collect()
    assert len(rows) == 4  # duplicates preserved
    verdicts = sorted((r["path"], bool(r["allowed"])) for r in rows)
    assert verdicts == [("/ok", True), ("/private/x", False),
                        ("/private/x", False), ("/private/y", False)]
    assert all(r["matched_rule"] == "disallow" for r in rows
               if r["path"].startswith("/private"))
