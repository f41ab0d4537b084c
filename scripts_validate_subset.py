"""Targeted oracle validation: run a named subset of the battery.

Usage: python scripts_validate_subset.py sf_dir name1 name2 ...
Exit 0 iff every named query hash-matches its DuckDB oracle.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    import pandas as pd

    import __spark_entry__ as entry_mod
    from aquacache_spark.session import get_spark
    from conftest import duck_con, normalize

    spark = get_spark("validate-subset",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()

    n_bad = 0
    for name in names:
        t0 = time.perf_counter()
        status = "OK"
        try:
            a = normalize(queries[name](spark, sf_dir).toPandas())
            b = normalize(con.execute(oracles[name]).fetchdf())
            if len(a) != len(b):
                status = f"ROWS {len(a)} vs {len(b)}"
            elif list(a.columns) != list(b.columns):
                status = "SCHEMA"
            else:
                try:
                    pd.testing.assert_frame_equal(
                        a, b.astype(a.dtypes.to_dict()))
                except AssertionError as e:
                    status = f"VALUES {str(e)[:160]}"
            spark.catalog.clearCache()
        except Exception as e:  # record, keep going
            status = f"ERR {type(e).__name__}: {str(e)[:160]}"
        if status != "OK":
            n_bad += 1
        print(f"{name:40s} {time.perf_counter()-t0:6.2f}s  {status}",
              flush=True)
    print(f"bad={n_bad}/{len(names)}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
