"""Full bench with per-query JVM telemetry — finds cumulative session
degradation (the 308-query run times individual queries far above
their fresh-session cost). Logs one CSV row per query:

  name, seconds, heap_used_mb, gc_ms_total, n_persistent_rdds,
  storage_mem_mb, metaspace_mb, codecache_mb, classes_loaded

Methodology per query matches bench.py exactly (warm noop, timed
noop, clearCache).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aquacache_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def jvm_stats(spark):
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    heap = mf.getMemoryMXBean().getHeapMemoryUsage().getUsed() / 1e6
    gc_ms = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        gc_ms += it.next().getCollectionTime()
    meta = code = 0.0
    pit = mf.getMemoryPoolMXBeans().iterator()
    while pit.hasNext():
        p = pit.next()
        n = p.getName()
        if "Metaspace" in n:
            meta += p.getUsage().getUsed() / 1e6
        if "CodeHeap" in n or "Code Cache" in n:
            code += p.getUsage().getUsed() / 1e6
    classes = mf.getClassLoadingMXBean().getLoadedClassCount()
    jsc = spark.sparkContext._jsc.sc()
    n_rdds = jsc.getPersistentRDDs().size()
    storage = 0.0
    for s in jsc.getExecutorMemoryStatus().values().toList().toString():
        pass  # string form; use storage status below instead
    try:
        st = jsc.env().blockManager().master().getStorageStatus()
        storage = sum(x.memUsed() for x in st) / 1e6
    except Exception:
        storage = -1
    return heap, gc_ms, n_rdds, storage, meta, code, classes


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("aquacache-bench-telemetry")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    print("name,seconds,heap_mb,gc_ms,n_rdds,storage_mb,metaspace_mb,"
          "codecache_mb,classes", flush=True)
    for name in sorted(queries):
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        h, g, n, s, m, c, cl = jvm_stats(spark)
        print(f"{name},{dt},{h:.0f},{g},{n},{s:.0f},{m:.0f},{c:.0f},{cl}",
              flush=True)


if __name__ == "__main__":
    main()
