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
        # One concatenated yield per partition, not one per group: every
        # yielded frame becomes its own Arrow record batch, and with
        # thousands of small series the per-batch conversion dominates
        # the kernels themselves. Kernels may return a list of frames
        # (e.g. scanned rows + a NULL pad holding only spine/keys —
        # missing columns NaN-fill here) so no kernel pays a per-group
        # concat either.
        outs: list[pd.DataFrame] = []
        for _, g in pdf.groupby(keys, sort=False):
            r = kernel(g)
            outs.extend(r) if isinstance(r, list) else outs.append(r)
        yield pd.concat(outs, ignore_index=True)

    if num_partitions is None:
        # shuffle.partitions + 1, deliberately: if the kernel's upstream
        # already hash-partitions on these keys with the default count
        # (e.g. a window over the same series key), a repartition with
        # an IDENTICAL spec is elided and the stage inherits the
        # upstream ENSURE_REQUIREMENTS exchange — which AQE's byte-based
        # coalescing is free to merge into ONE task, serializing the
        # whole Python stage (measured: 1500-series kernel ran 1-task,
        # 3.4s; 33 tasks, ~1s). A differing count forces a real
        # REPARTITION_BY_NUM exchange, whose partition count AQE must
        # preserve. Byte-blind coalescing is the wrong policy for
        # CPU-bound-per-row Python stages.
        num_partitions = 1 + int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    return df.repartition(num_partitions, *keys).mapInPandas(run, schema)
