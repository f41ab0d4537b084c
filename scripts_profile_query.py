"""Per-query cost split: Catalyst planning vs execution.

For each named query: build the DataFrame, time physical planning
(executedPlan materialization on a FRESH copy of the logical plan),
then warm + timed noop writes (bench methodology), and report job and
stage counts via the status tracker.

Usage: python scripts_profile_query.py q1 q2 ...
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
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("aquacache-profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    tracker = spark.sparkContext.statusTracker()

    out = {}
    for name in names:
        df = queries[name](spark, sf_dir)
        # planning: fresh QueryExecution over the analyzed plan
        t0 = time.perf_counter()
        qe = df._jdf.queryExecution()
        qe.executedPlan()
        plan_s = time.perf_counter() - t0
        # warm
        df.write.format("noop").mode("overwrite").save()
        jobs_before = tracker.getJobIdsForGroup(None)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        run_s = time.perf_counter() - t0
        jobs_after = tracker.getJobIdsForGroup(None)
        new_jobs = set(jobs_after) - set(jobs_before)
        n_stages = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji:
                n_stages += len(ji.stageIds)
        spark.catalog.clearCache()
        out[name] = {"plan_s": round(plan_s, 3),
                     "timed_run_s": round(run_s, 3),
                     "n_jobs": len(new_jobs), "n_stages": n_stages}
        print(f"{name}: plan={plan_s:.3f}s run={run_s:.3f}s "
              f"jobs={len(new_jobs)} stages={n_stages}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
