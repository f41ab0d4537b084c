"""Grouped sequential kernels with mapInPandas economics.

``groupBy().applyInPandas`` pays a per-group Arrow round-trip — with
many small groups (the typical timeseries layout: thousands of series,
modest points each) that overhead dominates by ~10x (measured: 6.7s
identity applyInPandas vs 0.8s for this pattern on 100k rows / 150
groups). This helper keeps applyInPandas *semantics* but ships one
Arrow stream per partition: hash-partition by the keys (all rows of a
group land together), buffer the partition, run the kernel per group
with an in-memory pandas groupby.

Memory contract at scale: a whole partition is buffered, so size
``num_partitions`` such that (total rows / partitions) fits an
executor — the same planning already required to keep shuffle
partitions spill-free.
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def grouped_apply(
    df: DataFrame,
    keys: Sequence[str],
    kernel: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType,
    num_partitions: int | None = None,
) -> DataFrame:
    keys = list(keys)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        for _, g in pdf.groupby(keys, sort=False):
            yield kernel(g)

    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    return df.repartition(num_partitions, *keys).mapInPandas(run, schema)
