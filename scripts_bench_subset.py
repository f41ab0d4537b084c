"""Bench a named subset of queries with the same methodology as
bench.py (warm noop run, timed noop run, clearCache between queries) —
the fast inner loop for the optimization rounds.

Usage: python scripts_bench_subset.py q1 q2 ...   [env as bench.py]
       python scripts_bench_subset.py --reps 3 q1 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aquacache_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 1
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("aquacache-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    unknown = [n for n in args if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    timings: dict[str, list[float]] = {}
    for name in args:
        runs = []
        for _ in range(reps):
            df = queries[name](spark, sf_dir)
            spark.sparkContext.setJobDescription(f"warm:{name}")
            df.write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobDescription(f"timed:{name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        timings[name] = runs
        print(f"{name}: {runs}", flush=True)

    print(json.dumps({"sf_dir": sf_dir, "timings": timings}))


if __name__ == "__main__":
    main()
