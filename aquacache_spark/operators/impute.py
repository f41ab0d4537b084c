"""Gap imputation methods (imputeMissing, R/imputeMissing.R:23).

Three fill methods, mirroring the reference's user-selectable menu:

- donor + mean offset (:1106-1107) — donor resampled to the target
  cadence, offset-adjusted; candidate scoring in
  queries.donor_offset_scoring.
- linear interpolation (:1123-1128, stats::approx) — pure window
  expressions (queries.linear_interpolation).
- cubic spline with ±context points (:1129-1145, stats::spline) —
  implemented here as a *natural cubic spline* solved with a pure-numpy
  tridiagonal algorithm (no scipy in this environment), run per series
  via the grouped-map kernel. Deterministic: same knots -> same
  coefficients everywhere.

Writes carry ``imputed = TRUE`` downstream, matching the reference's
flagging contract.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def natural_cubic_spline(x: np.ndarray, y: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """Evaluate the natural cubic spline through (x, y) at xq.

    Classic tridiagonal solve for the second derivatives (Thomas
    algorithm); natural boundary (y'' = 0 at both ends). x strictly
    increasing, len >= 2 (falls back to linear for exactly 2 knots).
    """
    n = len(x)
    if n == 2:
        return np.interp(xq, x, y)
    h = np.diff(x)
    # tridiagonal system for interior second derivatives m[1..n-2]
    a = h[:-1]
    b = 2.0 * (h[:-1] + h[1:])
    c = h[1:]
    d = 6.0 * ((y[2:] - y[1:-1]) / h[1:] - (y[1:-1] - y[:-2]) / h[:-1])
    # Thomas algorithm
    cp = np.zeros_like(b)
    dp = np.zeros_like(b)
    cp[0] = c[0] / b[0]
    dp[0] = d[0] / b[0]
    for i in range(1, len(b)):
        denom = b[i] - a[i] * cp[i - 1]
        cp[i] = c[i] / denom if i < len(b) - 1 else 0.0
        dp[i] = (d[i] - a[i] * dp[i - 1]) / denom
    m_int = np.zeros(len(b))
    m_int[-1] = dp[-1]
    for i in range(len(b) - 2, -1, -1):
        m_int[i] = dp[i] - cp[i] * m_int[i + 1]
    m = np.concatenate(([0.0], m_int, [0.0]))

    idx = np.clip(np.searchsorted(x, xq) - 1, 0, n - 2)
    x0, x1 = x[idx], x[idx + 1]
    y0, y1 = y[idx], y[idx + 1]
    m0, m1 = m[idx], m[idx + 1]
    hseg = x1 - x0
    t = (xq - x0) / hseg
    # explicit products (no pow()): the SQL oracle mirrors this exact
    # operation sequence, keeping results bit-identical across engines
    u = 1 - t
    return (
        y0 * u
        + y1 * t
        + (hseg * hseg / 6.0)
        * ((m0 * (u * u * u - u)) + (m1 * (t * t * t - t)))
    )


def spline_fill_pd(
    pdf: pd.DataFrame,
    dt_col: str,
    value_col: str,
    context_points: int = 20,
) -> pd.DataFrame:
    """Fill NULL values per series with a natural cubic spline fitted on
    up to ±context_points known neighbors around each gap
    (R/imputeMissing.R:1129-1145)."""
    pdf = pdf.sort_values(dt_col).reset_index(drop=True)
    # x in *seconds* (epoch): nanos overflow double precision (ulp at
    # 1.7e18 ns is ~256 ns) and the spline h-diffs would inherit that
    # noise; seconds keep microsecond exactness and match DuckDB's
    # epoch() doubles bit-for-bit
    x = (
        pd.to_datetime(pdf[dt_col]).astype("datetime64[us]").astype("int64")
        .to_numpy(dtype="float64")  # micros < 2^53: exact in float64
    ) / 1e6
    y = pdf[value_col].to_numpy(dtype="float64")
    known = ~np.isnan(y)
    filled = y.copy()
    imputed = np.zeros(len(y), dtype=bool)
    if known.sum() >= 2 and (~known).any():
        kx, ky = x[known], y[known]
        for i in np.flatnonzero(~known):
            pos = np.searchsorted(kx, x[i])
            lo = max(0, pos - context_points)
            hi = min(len(kx), pos + context_points)
            if hi - lo >= 2:
                filled[i] = natural_cubic_spline(kx[lo:hi], ky[lo:hi],
                                                 np.array([x[i]]))[0]
                imputed[i] = True
    pdf[value_col] = filled
    pdf["imputed"] = imputed
    return pdf


def spline_fill(
    df: DataFrame,
    keys: Sequence[str],
    dt_col: str = "datetime",
    value_col: str = "value",
    context_points: int = 20,
) -> DataFrame:
    from ._grouped import grouped_apply

    schema = T.StructType(
        [f for f in df.schema.fields]
        + ([T.StructField("imputed", T.BooleanType())]
           if "imputed" not in df.columns else [])
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return spline_fill_pd(pdf, dt_col, value_col, context_points)

    return grouped_apply(df, keys, fn, schema)
