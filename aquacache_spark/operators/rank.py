"""Distributed global order statistics.

A global ``row_number()`` in Spark needs an unpartitioned window —
one task holding the whole table, the exact single-task bottleneck
this repo pins against elsewhere (LM corpus totals). This module
computes EXACT global ranks with no single-partition exchange:

1. ``repartitionByRange`` on the order key — each bucket holds a
   contiguous key range (equal keys land in one bucket);
2. within-bucket ``row_number`` — a P-way parallel window keyed on
   the bucket id;
3. bucket sizes (P rows, P = shuffle parallelism — catalog class)
   collected to the driver, turned into cumulative offsets, and
   broadcast back;
4. global rank = bucket offset + within-bucket rank.

Range boundaries come from Spark's reservoir sampling, so the BUCKET
SPLIT varies run to run — but offsets are recomputed per run, so the
final ranks are exactly the ranks of the total order defined by
``order_cols`` (pass a unique tiebreaker column for full
determinism). The driver-side collect is P rows, the same altitude
as the repo's dependency-closure loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "global_rank",
) -> DataFrame:
    """Exact 1-based global row_number over ``order_cols`` (ascending
    Columns or names; pass e.g. ``F.desc("x")``-free total orders with
    a unique tiebreaker) — distributed as described in the module
    docstring. Output: the input columns + ``rank_col`` (bigint)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    b = df.repartitionByRange(*cols).withColumn(
        "__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(*cols)
    b = b.withColumn("__lr", F.row_number().over(w))
    # localCheckpoint (NOT persist): the size probe and the final
    # projection must see the SAME sampled range boundaries
    # (repartitionByRange re-samples on re-execution, which would
    # desynchronize the collected offsets from recomputed ranks).
    # A persist()ed block can be silently evicted and recomputed —
    # producing wrong ranks; a checkpointed block that is lost fails
    # the job loudly instead. Lineage truncation also releases the
    # blocks via the ContextCleaner once callers drop the frame.
    b = b.localCheckpoint(eager=True)
    sizes = {r["__pid"]: r["n"] for r in
             b.groupBy("__pid").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    spark = df.sparkSession
    odf = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
        "__pid int, __off long")
    return (
        b.join(F.broadcast(odf), "__pid", "left")
        .withColumn(rank_col,
                    (F.coalesce("__off", F.lit(0)) + F.col("__lr"))
                    .cast("long"))
        .drop("__pid", "__lr", "__off")
    )
