"""Custom stateful streaming operators (``applyInPandasWithState``).

The batch engine runs the reset-aware increments scan
(R/compute_increments.R:82-121) per series inside ``applyInPandas``;
this module is the Structured Streaming variant: the scan state
(running post-reset max, previous value, previous timestamp) is carried
across micro-batches in the Spark state store, so a continuously
arriving gauge series yields exactly the increments a batch recompute
over the full history would.

Scale: state is one tiny 3-field tuple per series, keyed on the same
``timeseries_id`` the batch shuffle uses — a 1000-executor cluster
distributes the state store across executors with no hot spots, and
the per-batch work is one Arrow exchange per touched series.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

STATE_SCHEMA = (
    "running_max double, prev_value double, prev_ts_micros bigint"
)


def streaming_increments(
    stream: DataFrame,
    keys: Sequence[str] = ("timeseries_id",),
    dt_col: str = "datetime",
    value_col: str = "value",
    reset_drop: float = 10.0,
    min_pos: float = 0.0,
    max_gap_seconds: float | None = None,
) -> DataFrame:
    """Reset-aware increments over a stream, state kept per series.

    Rows within one micro-batch are sorted by ``dt_col`` before the
    scan; cross-batch ordering is the arrival order (the file-source
    landing zone appends monotonically, mirroring the reference's
    high-watermark ingest, R/getNewContinuous.R:469-477).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.increments import scan_increments

    out_schema = T.StructType(
        list(stream.schema.fields) + [T.StructField("increment", T.DoubleType())]
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            rm, pv, ptm = state.get
            st = (rm, pv, None if ptm is None else pd.Timestamp(ptm, unit="us"))
        else:
            st = (None, None, None)
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(dt_col).reset_index(drop=True)
            out, st = scan_increments(
                pdf[dt_col], pdf[value_col],
                reset_drop, min_pos, max_gap_seconds, st,
            )
            pdf["increment"] = pd.array(out, dtype="float64")
            yield pdf
        rm, pv, pts = st
        state.update((
            rm, pv, None if pts is None else int(pd.Timestamp(pts).value // 1000),
        ))

    return stream.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
