"""Nonparametric trend analysis: Mann-Kendall test + Sen's slope.

The standard hydrologic trend toolkit (Mann 1945, Kendall 1975, Sen
1968; Hirsch et al. 1982 for the seasonal variant): for each series,
S = sum over ordered day pairs of sign(x_j - x_i), the tie-corrected
variance Var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18, the
normal-approximation Z with the +/-1 continuity correction, and Sen's
slope = median over pairs of (x_j - x_i)/(t_j - t_i). The reference
stores the hydrometric data this is run on but has no trend surface;
this is extension-tier depth on the reference's own domain.

Determinism: values are quantized to integer micro-units BEFORE the
pairwise comparison, so every sign() and every tie group is exact on
both engines; S and the tie sums are integer aggregates; the only
float math is the final Var/Z closed form and the slope median
(quantile_cont/percentile interpolate identically).

Scale shape: the pairwise self-join is keyed per (series..., and
whatever period column the caller folds into the keys — e.g. year),
so pair mass is bounded by construction at (days-per-period choose 2)
~ 66k rows PER GROUP no matter how large the corpus: total work is
linear in the number of series-periods. Never an unkeyed cross join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def mann_kendall(
    daily: DataFrame,
    keys: list[str],
    date_col: str = "date",
    value_col: str = "value",
) -> DataFrame:
    """Mann-Kendall S / Var(S) / Z + Sen's slope per key group.

    ``daily`` must hold ONE row per (keys..., date) — feed it a daily
    rollup. Output: (keys..., n_days, s_stat, var_s, z, sen_slope);
    groups with fewer than 2 days drop out (no pairs); Z is 0 when
    S = 0 and NULL when Var(S) = 0 (all values tied).
    """
    t = F.datediff(F.col(date_col), F.lit("1970-01-01").cast("date"))
    vq = F.floor(F.col(value_col).cast("double") * 1e6 + F.lit(0.5)) \
        .cast("long")
    d = daily.select(*keys, t.alias("__t"), vq.alias("__v"))

    a = d.select(*keys, F.col("__t").alias("__ta"),
                 F.col("__v").alias("__va"))
    b = d.select(*keys, F.col("__t").alias("__tb"),
                 F.col("__v").alias("__vb"))
    pairs = a.join(b, keys).where(F.col("__tb") > F.col("__ta"))
    sgn = (
        F.when(F.col("__vb") > F.col("__va"), 1)
        .when(F.col("__vb") < F.col("__va"), -1)
        .otherwise(0)
    )
    slope = (
        (F.col("__vb") - F.col("__va")).cast("double") / F.lit(1e6)
        / (F.col("__tb") - F.col("__ta"))
    )
    st = (
        pairs.withColumn("__sgn", sgn).withColumn("__slope", slope)
        .groupBy(*keys)
        .agg(F.sum("__sgn").cast("long").alias("s_stat"),
             F.expr("percentile(__slope, 0.5)").alias("sen_slope"))
    )
    nd = d.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_days"))
    # tie correction: sum t(t-1)(2t+5) over tie groups (t=1 terms are 0)
    ties = (
        d.groupBy(*keys, "__v").agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(*keys)
        .agg(F.sum(F.col("__c") * (F.col("__c") - 1)
                   * (2 * F.col("__c") + 5)).alias("__tiesum"))
    )
    n = F.col("n_days")
    var_s = (
        (n * (n - 1) * (2 * n + 5) - F.col("__tiesum")).cast("double")
        / F.lit(18.0)
    )
    s = F.col("s_stat")
    z = (
        F.when(s > 0, (s - 1) / F.sqrt(F.col("var_s")))
        .when(s < 0, (s + 1) / F.sqrt(F.col("var_s")))
        .otherwise(F.lit(0.0))
    )
    return (
        st.join(nd, keys).join(ties, keys)
        # var18 = 18 * Var(S), an EXACT bigint — composable across
        # seasons (seasonal_mann_kendall sums it as integers so the
        # combined variance is independent of aggregation order)
        .withColumn("var18",
                    (n * (n - 1) * (2 * n + 5) - F.col("__tiesum"))
                    .cast("long"))
        .withColumn("var_s", var_s)
        .withColumn("z", F.when(F.col("var_s") > 0, z))
        .where(n >= 2)
        .select(*keys, n.alias("n_days"), "s_stat", "var18", "var_s",
                "z", "sen_slope")
    )


def seasonal_mann_kendall(
    daily: DataFrame,
    keys: list[str],
    season_col: str,
    date_col: str = "date",
    value_col: str = "value",
) -> DataFrame:
    """Seasonal Mann-Kendall (Hirsch, Slack & Smith 1982): run the MK
    test independently per season (pairs only compare the SAME season
    across periods), then combine S' = sum S_g and Var' = sum Var_g —
    both summed as exact integers (S and 18*Var), so the combination
    is aggregation-order independent. Z uses the same continuity
    correction on the totals.

    Output: (keys..., n_seasons, s_total, var_total, z)."""
    per = mann_kendall(daily, [*keys, season_col], date_col, value_col)
    tot = per.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_seasons"),
        F.sum("s_stat").cast("long").alias("s_total"),
        F.sum("var18").cast("long").alias("__v18"),
    )
    var_total = F.col("__v18").cast("double") / F.lit(18.0)
    s = F.col("s_total")
    z = (
        F.when(s > 0, (s - 1) / F.sqrt(var_total))
        .when(s < 0, (s + 1) / F.sqrt(var_total))
        .otherwise(F.lit(0.0))
    )
    return tot.select(
        *keys, "n_seasons", "s_total", var_total.alias("var_total"),
        F.when(F.col("__v18") > 0, z).alias("z"))


def flow_duration_curve(
    daily: DataFrame,
    keys: list[str],
    probs: list[int],
    date_col: str = "date",
    value_col: str = "value",
) -> DataFrame:
    """Empirical flow-duration curve: the flow exceeded p% of the time
    per series, at integer exceedance probabilities ``probs``, using
    Weibull plotting positions (P_m = m / (n + 1) over the descending
    sort). Q_p = the value at the smallest rank m with
    100*m >= p*(n+1) — a pure-integer rank test, bit-stable on both
    engines; p beyond n/(n+1) (rank past the record) yields NULL.

    The per-series window runs over daily values — bounded by record
    length (365 x years per station), the catalog class, never
    corpus-cardinality. Output: (keys..., exceedance_pct, flow)."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(value_col).desc(), F.col(date_col).asc())
    wn = Window.partitionBy(*keys)
    ranked = daily.select(
        *keys, F.col(value_col).alias("__v"),
        F.row_number().over(w).alias("__m"),
        F.count(F.lit(1)).over(wn).alias("__n"))
    parts = []
    for p in probs:
        hit = (
            ranked.where(100 * F.col("__m") >= p * (F.col("__n") + 1))
            .groupBy(*keys)
            .agg(F.max("__v").alias("flow"))
            .withColumn("exceedance_pct", F.lit(p).cast("int"))
        )
        parts.append(hit)
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out.select(*keys, "exceedance_pct", "flow")


def low_flow_frequency(
    daily: DataFrame,
    keys: list[str],
    year_col: str,
    date_col: str = "date",
    value_col: str = "value",
    window_days: int = 7,
) -> DataFrame:
    """Low-flow frequency analysis (the 7Q family): per series, the
    N-day moving-mean minimum of each year, ranked ascending across
    years with Weibull return periods T = (n_years + 1) / rank.

    Daily values quantize to integer micro-units BEFORE the moving
    sum, so the N-day means are exact on both engines (a float window
    sum is evaluation-order dependent under segment-tree windowing);
    only complete N-day windows count. Windows are per-series ordered
    scans bounded by record length — the FDC cost class.

    Output: (keys..., year, qn_min, rank, return_period)."""
    vq = F.floor(F.col(value_col).cast("double") * 1e6 + F.lit(0.5)) \
        .cast("long")
    w = Window.partitionBy(*keys).orderBy(date_col) \
        .rowsBetween(-(window_days - 1), 0)
    rolled = daily.select(
        *keys, F.col(year_col).alias("yr"), F.col(date_col),
        vq.alias("__vq")
    ).withColumn("__s", F.sum("__vq").over(w)) \
        .withColumn("__c", F.count(F.lit(1)).over(w)) \
        .where(F.col("__c") == window_days)
    annual = rolled.groupBy(*keys, "yr").agg(
        F.min("__s").alias("__smin"))
    wr = Window.partitionBy(*keys).orderBy(
        F.asc("__smin"), F.asc("yr"))
    wn = Window.partitionBy(*keys)
    return (
        annual
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .select(
            *keys, "yr",
            (F.col("__smin") / F.lit(1e6) / F.lit(float(window_days)))
            .alias("qn_min"),
            "rank",
            ((F.col("__n") + 1).cast("double") / F.col("rank"))
            .alias("return_period"),
        )
    )


def baseflow_separation(
    daily: DataFrame,
    keys: list[str],
    date_col: str = "date",
    value_col: str = "value",
    alpha: float = 0.925,
) -> DataFrame:
    """Lyne-Hollick digital baseflow filter (one forward pass):

        f_t = alpha * f_{t-1} + (1 + alpha) / 2 * (q_t - q_{t-1})

    with f_1 = q_1, baseflow b_t = clamp(q_t - max(f_t, 0), 0, q_t),
    and the baseflow index as the per-series ratio of exact
    micro-quantized sums. The recurrence is prefix-dependent, so it
    runs as a per-series Arrow kernel (operators/_grouped economics —
    one stream per partition); cost is linear in record length, and
    the sequential double arithmetic replays exactly in the oracle's
    recursive CTE (same IEEE op order).

    Output: (keys..., date, value, quickflow, baseflow).
    """
    k = (1 + alpha) / 2

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(date_col).reset_index(drop=True)
        q = pdf[value_col].astype("float64").to_numpy()
        f = 0.0
        quick = []
        for i, qt in enumerate(q):
            f = qt if i == 0 else alpha * f + k * (qt - q[i - 1])
            quick.append(f)
        base = [min(max(qt - max(ft, 0.0), 0.0), qt)
                for qt, ft in zip(q, quick)]
        out = pdf.copy()
        out["quickflow"] = pd.Series(quick, dtype="float64")
        out["baseflow"] = pd.Series(base, dtype="float64")
        return out

    import pandas as pd  # noqa: F811 (kernel closure import)

    from pyspark.sql import types as T

    from ._grouped import grouped_apply

    base = daily.select(*keys, date_col, F.col(value_col)
                        .cast("double").alias(value_col))
    fields = [base.schema[c] for c in (*keys, date_col, value_col)]
    schema = T.StructType(list(fields) + [
        T.StructField("quickflow", T.DoubleType()),
        T.StructField("baseflow", T.DoubleType()),
    ])
    return grouped_apply(base, keys, kernel, schema)


# Acklam's rational approximation to the standard normal quantile
# (Peter J. Acklam, 2003, public algorithm; |relative error| < 1.15e-9
# over (0, 1)). Pure fixed-parenthesization arithmetic + one sqrt/ln
# per tail — the same cross-engine-exact footing as the repo's
# ln/exp-chain oracles (tests pin bit-parity against DuckDB over a
# dense p grid including both tails).
_ACKLAM_A = (-3.969683028665376e+01, 2.209460984245205e+02,
             -2.759285104469687e+02, 1.383577518672690e+02,
             -3.066479806614716e+01, 2.506628277459239e+00)
_ACKLAM_B = (-5.447609879822406e+01, 1.615858368580409e+02,
             -1.556989798598866e+02, 6.680131188771972e+01,
             -1.328068155288572e+01)
_ACKLAM_C = (-7.784894002430293e-03, -3.223964580411365e-01,
             -2.400758277161838e+00, -2.549732539343734e+00,
             4.374664141464968e+00, 2.938163982698783e+00)
_ACKLAM_D = (7.784695709041462e-03, 3.224671290700398e-01,
             2.445134137142996e+00, 3.754408661907416e+00)
ACKLAM_P_LOW = 0.02425


def _horner(q: Column, coefs) -> Column:
    out = F.lit(coefs[0])
    for c in coefs[1:]:
        out = out * q + F.lit(c)
    return out


def inv_normal_cdf(p: Column) -> Column:
    """Phi^-1(p) via Acklam's three-region rational approximation.
    NULL outside (0, 1). Map-only codegen; the DuckDB mirror is
    built by :func:`inv_normal_sql` with the identical operation
    order, so quantized comparisons are exact cross-engine."""
    q_c = p - F.lit(0.5)
    r_c = q_c * q_c
    central = (_horner(r_c, _ACKLAM_A) * q_c
               / (_horner(r_c, _ACKLAM_B) * r_c + F.lit(1.0)))
    q_lo = F.sqrt(F.lit(-2.0) * F.log(p))
    lower = (_horner(q_lo, _ACKLAM_C)
             / (_horner(q_lo, _ACKLAM_D) * q_lo + F.lit(1.0)))
    q_hi = F.sqrt(F.lit(-2.0) * F.log(F.lit(1.0) - p))
    upper = -(_horner(q_hi, _ACKLAM_C)
              / (_horner(q_hi, _ACKLAM_D) * q_hi + F.lit(1.0)))
    return (
        F.when((p <= 0) | (p >= 1), F.lit(None).cast("double"))
        .when(p < ACKLAM_P_LOW, lower)
        .when(p <= F.lit(1.0 - ACKLAM_P_LOW), central)
        .otherwise(upper)
    )


def _horner_sql(q: str, coefs) -> str:
    out = repr(coefs[0])
    for c in coefs[1:]:
        out = f"({out} * {q} + {c!r})"
    return out


def inv_normal_sql(p: str) -> str:
    """The DuckDB text of :func:`inv_normal_cdf` — same coefficients,
    same parenthesization, same region gates."""
    qc = f"(({p}) - 0.5)"
    rc = f"({qc} * {qc})"
    central = (f"({_horner_sql(rc, _ACKLAM_A)} * {qc}"
               f" / ({_horner_sql(rc, _ACKLAM_B)} * {rc} + 1.0))")
    qlo = f"sqrt(-2.0 * ln({p}))"
    lower = (f"({_horner_sql(qlo, _ACKLAM_C)}"
             f" / ({_horner_sql(qlo, _ACKLAM_D)} * {qlo} + 1.0))")
    qhi = f"sqrt(-2.0 * ln(1.0 - ({p})))"
    upper = (f"(-({_horner_sql(qhi, _ACKLAM_C)}"
             f" / ({_horner_sql(qhi, _ACKLAM_D)} * {qhi} + 1.0)))")
    return (f"CASE WHEN ({p}) <= 0 OR ({p}) >= 1 THEN NULL"
            f" WHEN ({p}) < {ACKLAM_P_LOW} THEN {lower}"
            f" WHEN ({p}) <= {1.0 - ACKLAM_P_LOW!r} THEN {central}"
            f" ELSE {upper} END")


def spi_empirical(
    monthly: DataFrame,
    keys: Sequence[str] = ("series",),
    k: int = 3,
) -> DataFrame:
    """Standardized precipitation index, empirical variant (McKee 1993
    structure; the Gamma MoM fit is replaced by the Weibull plotting
    position + inverse-normal standardization — the incomplete-gamma
    CDF has no cross-engine-exact form, the empirical CDF does).

    ``monthly``: one row per (keys..., yr, mon, value) — monthly
    precipitation totals. Pipeline, all window functions over
    catalog-bounded cells:

    1. k-month accumulation: rows-window sum over the k most recent
       PRESENT months per series (micro-quantized ints — exact),
       rows with fewer than k months dropped;
    2. per (series, CALENDAR MONTH) ranking across years (the
       seasonality removal that defines SPI), ties broken by year so
       the plotting position is total-ordered and deterministic;
    3. p = rank / (n + 1); SPI = Phi^-1(p) via :func:`inv_normal_cdf`.

    Scale: per-series-month cells hold one row per YEAR of record
    (<= a few hundred forever), so every window is bounded; the only
    shuffle is on (keys, mon).
    """
    ks = [F.col(c) for c in keys]
    vq = F.floor(F.col("value").cast("double") * 1e6 + F.lit(0.5)) \
        .cast("long")
    w_roll = Window.partitionBy(*ks).orderBy("yr", "mon") \
        .rowsBetween(-(k - 1), 0)
    rolled = (
        monthly.withColumn("__vq", vq)
        .withColumn("__sumq", F.sum("__vq").over(w_roll))
        .withColumn("__nwin", F.count("__vq").over(w_roll))
        .where(F.col("__nwin") == k)
    )
    w_rank = Window.partitionBy(*ks, F.col("mon")) \
        .orderBy("__sumq", "yr")
    w_cell = Window.partitionBy(*ks, F.col("mon"))
    out = (
        rolled
        .withColumn("rank", F.row_number().over(w_rank))
        .withColumn("n_years", F.count(F.lit(1)).over(w_cell))
        .withColumn(
            "p",
            F.col("rank").cast("double")
            / (F.col("n_years") + F.lit(1)).cast("double"))
        .withColumn("spi", inv_normal_cdf(F.col("p")))
    )
    return out.select(
        *keys, "yr", "mon",
        (F.col("__sumq").cast("double") / 1e6).alias(f"precip_{k}mo"),
        "rank", "n_years", "p", "spi")
