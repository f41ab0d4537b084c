"""Generate the public-suffix snapshot fixture (multi-label rules).

A SNAPSHOT SUBSET of the Mozilla Public Suffix List
(publicsuffix.org): the well-known country-code second-level
registries, the US state k12/cc/lib third-level families, the
wildcard ccTLDs with their exceptions (``*.ck`` / ``!www.ck``, the
Japanese city wildcards ``*.kawasaki.jp`` / ``!city.kawasaki.jp``,
...), and representative 4-label private-section rules. Single-label
TLDs are implicit (the default "last two labels" rule needs no table
entry). A deployment regenerates this file from the full PSL — same
one-column schema holding RAW rule text (literal / ``*.`` / ``!``
forms), no code change (operators/web.py parses + broadcasts it).

Run from the repo root: python fixtures/gen_psl.py
"""

import csv
import os

HERE = os.path.dirname(os.path.abspath(__file__))

SECOND_LEVEL = {
    "uk": ["co", "org", "me", "ltd", "plc", "net", "sch", "ac", "gov",
           "nhs", "police"],
    "au": ["com", "net", "org", "edu", "gov", "asn", "id"],
    "nz": ["co", "net", "org", "govt", "ac", "school", "geek", "gen",
           "kiwi", "maori"],
    "mx": ["com", "net", "org", "edu", "gob"],
    "br": ["com", "net", "org", "gov", "edu", "mil", "art", "eco"],
    "jp": ["co", "ne", "or", "go", "ac", "ad", "ed", "gr", "lg"],
    "cn": ["com", "net", "org", "gov", "edu", "ac", "mil"],
    "tw": ["com", "net", "org", "edu", "gov", "idv"],
    "hk": ["com", "net", "org", "edu", "gov", "idv"],
    "in": ["co", "net", "org", "firm", "gen", "ind", "ac", "edu", "res",
           "gov", "nic", "mil"],
    "za": ["co", "net", "org", "gov", "ac", "web"],
    "kr": ["co", "ne", "or", "re", "pe", "go", "mil", "ac", "hs", "ms",
           "es", "sc", "kg"],
    "id": ["co", "net", "or", "web", "sch", "ac", "go", "mil", "my",
           "biz"],
    "my": ["com", "net", "org", "gov", "edu", "mil", "name"],
    "sg": ["com", "net", "org", "gov", "edu", "per"],
    "th": ["co", "net", "or", "ac", "go", "in", "mi"],
    "ph": ["com", "net", "org", "gov", "edu", "ngo", "mil", "i"],
    "vn": ["com", "net", "org", "edu", "gov", "int", "ac", "biz",
           "info", "name", "pro", "health"],
    "tr": ["com", "net", "org", "gov", "edu", "mil", "bel", "pol", "av",
           "dr", "k12", "gen", "web"],
    "ua": ["com", "net", "org", "edu", "gov", "in"],
    "ru": ["ac", "edu", "gov", "int", "mil"],
    "pl": ["com", "net", "org", "edu", "gov", "info", "waw", "biz"],
    "ar": ["com", "net", "org", "edu", "gob", "gov", "int", "mil",
           "tur"],
    "co": ["com", "net", "org", "edu", "gov", "nom", "mil"],
    "pe": ["com", "net", "org", "edu", "gob", "mil", "nom"],
    "ve": ["com", "net", "org", "edu", "gob", "mil", "web", "co",
           "info"],
    "cl": ["gob", "gov"],
    "uy": ["com", "net", "org", "edu", "gub", "mil"],
    "py": ["com", "net", "org", "edu", "gov", "mil", "coop"],
    "bo": ["com", "net", "org", "edu", "gob", "mil", "int", "tv",
           "web"],
    "ec": ["com", "net", "org", "edu", "gob", "gov", "mil", "fin",
           "med", "pro", "info"],
    "eg": ["com", "net", "org", "edu", "gov", "mil", "sci", "eun",
           "name"],
    "sa": ["com", "net", "org", "edu", "gov", "med", "pub", "sch"],
    "il": ["co", "net", "org", "ac", "gov", "idf", "k12", "muni"],
    "ke": ["co", "or", "ne", "go", "ac", "sc", "me", "mobi", "info"],
    "ng": ["com", "net", "org", "edu", "gov", "name", "sch", "mobi",
           "mil", "i"],
    "gh": ["com", "edu", "gov", "org", "mil"],
    "tz": ["co", "ac", "go", "or", "ne", "sc", "mil", "hotel", "info",
           "me", "mobi", "tv"],
    "ca": ["gc", "ab", "bc", "mb", "nb", "nf", "nl", "ns", "nt", "nu",
           "on", "pe", "qc", "sk", "yk"],
    "es": ["com", "nom", "org", "gob", "edu"],
    "it": ["gov", "edu"],
    "fr": ["asso", "com", "gouv", "nom", "prd", "tm", "avocat",
           "aeroport"],
    "at": ["ac", "co", "gv", "or"],
    "be": ["ac"],
    "pt": ["com", "edu", "gov", "int", "net", "nome", "org", "publ"],
    "gr": ["com", "edu", "net", "org", "gov"],
    "ro": ["com", "org", "tm", "nt", "nom", "info", "rec", "arts",
           "firm", "store", "www"],
    "ie": ["gov"],
    "pk": ["com", "net", "edu", "org", "fam", "biz", "web", "gov",
           "gob", "gok", "gon", "gop", "gos"],
    "bd": ["com", "edu", "ac", "net", "gov", "org", "mil"],
    "lk": ["com", "org", "edu", "ngo", "soc", "web", "ltd", "assn",
           "grp", "hotel", "ac", "net", "gov", "sch", "int"],
    "np": ["com", "edu", "gov", "org", "net", "mil", "aero", "asia",
           "biz", "coop", "info", "museum", "name", "pro"],
    "ae": ["co", "net", "org", "sch", "ac", "gov", "mil"],
    "qa": ["com", "edu", "gov", "mil", "name", "net", "org", "sch"],
    "kw": ["com", "edu", "emb", "gov", "ind", "net", "org"],
    "om": ["com", "co", "edu", "ac", "gov", "net", "org", "med",
           "museum", "pro"],
    "jo": ["com", "org", "net", "edu", "sch", "gov", "mil", "name"],
    "lb": ["com", "edu", "gov", "net", "org"],
    "ir": ["ac", "co", "gov", "id", "net", "org", "sch"],
}

US_STATES = [
    "ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de", "fl", "ga",
    "hi", "ia", "id", "il", "in", "ks", "ky", "la", "ma", "md", "me",
    "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj", "nm",
    "nv", "ny", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx",
    "ut", "va", "vt", "wa", "wi", "wv", "wy",
]


# Wildcard ccTLDs / city registries with their exception rules, as
# published in the ICANN section of the real PSL.
WILDCARDS = [
    "*.ck", "*.bd", "*.er", "*.jm", "*.kh", "*.mm",
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
]
EXCEPTIONS = [
    "!www.ck",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
]
# Representative 4-label rules (private-section style, e.g. managed
# platform subdomains) so the resolver's longer-than-3-label path is
# exercised by the snapshot itself.
FOUR_LABEL = [
    "cdn.prod.atlassian-dev.net",
    "eu.pages.dev.example-paas.net",
]


def main():
    suffixes = []
    for tld, seconds in SECOND_LEVEL.items():
        for s in seconds:
            suffixes.append(f"{s}.{tld}")
    for st in US_STATES:
        suffixes.append(f"{st}.us")
        for third in ("k12", "cc", "lib"):
            suffixes.append(f"{third}.{st}.us")
    suffixes.extend(WILDCARDS)
    suffixes.extend(EXCEPTIONS)
    suffixes.extend(FOUR_LABEL)
    suffixes.sort()
    path = os.path.join(HERE, "public_suffix_snapshot.csv")
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["suffix"])
        w.writerows([[s] for s in suffixes])
    print(path, len(suffixes), "multi-label suffix rules")


if __name__ == "__main__":
    main()
