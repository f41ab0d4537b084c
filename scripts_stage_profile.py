"""Per-stage wall profile of a query's TIMED noop run (bench
methodology: build, warm noop, timed noop), via AppStatusStore.

Usage: python scripts_stage_profile.py q1 [q2 ...]
Prints per stage: duration_ms, numTasks, shuffle read/write MB, name.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aquacache_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("aquacache-stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    for name in names:
        df = queries[name](spark, sf_dir)
        spark.sparkContext.setJobDescription(f"warm:{name}")
        df.write.format("noop").mode("overwrite").save()
        seen = {(s.stageId(), s.attemptId()) for s in _stages(spark)}
        spark.sparkContext.setJobDescription(f"timed:{name}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        rows = []
        for s in _stages(spark):
            if (s.stageId(), s.attemptId()) in seen:
                continue
            sub, comp = s.submissionTime(), s.completionTime()
            dur = -1
            if sub.isDefined() and comp.isDefined():
                dur = comp.get().getTime() - sub.get().getTime()
            rows.append((dur, s.numTasks(),
                         s.shuffleReadBytes() / 1e6,
                         s.shuffleWriteBytes() / 1e6,
                         s.stageId(), str(s.name())[:80]))
        rows.sort(reverse=True)
        print(f"== {name}: wall={wall:.3f}s, {len(rows)} stages "
              f"(sum {sum(r[0] for r in rows)}ms)")
        for dur, nt, rd, wr, sid, nm in rows[:25]:
            print(f"  {dur:6d}ms tasks={nt:4d} sread={rd:7.2f}MB "
                  f"swrite={wr:7.2f}MB [{sid}] {nm}", flush=True)
        spark.catalog.clearCache()
        for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()


def _stages(spark):
    jvm = spark.sparkContext._jvm
    store = spark._jsparkSession.sparkContext().statusStore()
    empty_d = spark.sparkContext._gateway.new_array(jvm.double, 0)
    lst = store.stageList(jvm.java.util.ArrayList(), False, False,
                          empty_d, jvm.java.util.ArrayList())
    it = lst.iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


if __name__ == "__main__":
    main()
