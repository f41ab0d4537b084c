"""Stress the ivf_kmeans_centroids oracle comparison (VERDICT r2 #7):
N runs per core count, fresh JVM each, full-frame diff on mismatch.

Usage: python scripts_kmeans_stress.py [runs_per_cores]
"""
import os
import subprocess
import sys

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 7

CHILD = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from aquacache_spark.session import configure
import duckdb

cores = sys.argv[1]
spark = configure(
    SparkSession.builder.master(f"local[{cores}]")
).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as m

sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
name = "ivf_kmeans_centroids"
sdf = m.queries()[name](spark, sf).toPandas()
odf = con.execute(m.oracle_sql()[name]).df()
cols = sorted(sdf.columns)
sdf = sdf[cols].sort_values(cols).reset_index(drop=True)
odf = odf[cols].sort_values(cols).reset_index(drop=True)
if sdf.shape != odf.shape:
    print("SHAPE MISMATCH", sdf.shape, odf.shape)
    sys.exit(1)
bad = False
for c in cols:
    neq = sdf[c].astype(str).values != odf[c].astype(str).values
    if neq.any():
        bad = True
        print(f"COLUMN {c} mismatch rows:")
        import pandas as pd
        pd.set_option("display.max_rows", None)
        print(sdf[neq].join(odf[neq], rsuffix="_oracle").to_string())
if bad:
    sys.exit(1)
print("ok")
"""

def run_child(cores: str):
    return subprocess.run(
        [sys.executable, "-c", CHILD, str(cores)],
        capture_output=True, text=True, cwd="/tmp",
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cores)},
    )


fails = 0
crashes = 0
total = 0
for cores in (5, 8, 32):
    for i in range(RUNS):
        total += 1
        r = run_child(cores)
        # distinguish a VALUE mismatch (the thing this stress hunts)
        # from an infrastructure crash (JVM death under repeated
        # spawn: empty stdout, no verdict printed) — crashes retry
        # once and are reported separately, they say nothing about
        # determinism
        if r.returncode != 0 and "MISMATCH" not in r.stdout \
                and not r.stdout.strip().endswith("ok"):
            crashes += 1
            print(f"cores={cores} run={i}: CRASH (retrying once)",
                  flush=True)
            r = run_child(cores)
        ok = r.returncode == 0 and r.stdout.strip().endswith("ok")
        print(f"cores={cores} run={i}: {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            fails += 1
            print("STDOUT:", r.stdout[-8000:])
            print("STDERR:", r.stderr[-3000:])
print(f"done: {total - fails}/{total} ok ({crashes} infra crash-retries)")
