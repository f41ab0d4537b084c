"""Emit the full-battery validation artifact (VALIDATION_r{N}.json).

Runs every `__spark_entry__.queries()` entry against its DuckDB oracle
at the driver's gate scale (sf0.01 by default) and records the
driver-format per-query status — rows/schema/hash match booleans and
row counts — so the round's correctness claims ship with committed
evidence (ADVICE r11).

Usage: python scripts_validate.py [round_number] [sf_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "x"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import pandas as pd

    import __spark_entry__ as entry_mod
    from aquacache_spark.session import get_spark
    from conftest import duck_con, normalize

    spark = get_spark("validate", cpus=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()

    out, n_bad = {}, 0
    t_start = time.perf_counter()
    for name in sorted(queries):
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        try:
            a = normalize(queries[name](spark, sf_dir).toPandas())
            b = normalize(con.execute(oracles[name]).fetchdf())
            rec["spark_rows"], rec["oracle_rows"] = len(a), len(b)
            rec["rows_match"] = len(a) == len(b)
            rec["schema_match"] = list(a.columns) == list(b.columns)
            if rec["rows_match"] and rec["schema_match"]:
                try:
                    pd.testing.assert_frame_equal(
                        a, b.astype(a.dtypes.to_dict()))
                    rec["hash_match"] = True
                except AssertionError as e:
                    rec["err"] = f"values: {str(e)[:200]}"
            spark.catalog.clearCache()
        except Exception as e:  # record, keep going
            rec["err"] = f"{type(e).__name__}: {str(e)[:200]}"
        if not rec["hash_match"]:
            n_bad += 1
            print(f"FAIL {name}: {rec['err']}", file=sys.stderr)
        out[name] = rec

    artifact = {
        "round": rnd, "sf_dir": sf_dir, "n_queries": len(queries),
        "n_green": len(queries) - n_bad,
        "wall_s": round(time.perf_counter() - t_start, 1),
        "queries": out,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"VALIDATION_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=0)
    print(json.dumps({"n_queries": len(queries),
                      "n_green": len(queries) - n_bad,
                      "wall_s": artifact["wall_s"], "path": path}))
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
