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


# ---------------------------------------------------------------------------
# Regional flood frequency: index-flood procedure with the Hosking &
# Wallis L-moment heterogeneity statistic (Hosking & Wallis 1993,
# "Some statistics useful in regional frequency analysis", WRR 29(2);
# Hosking & Wallis 1997 ch. 4 & 6; Dalrymple 1960 index-flood).
# The reference's flood machinery (fasstr/WRB workflows feeding the
# plotting layer) is single-site; the regional pooling generalizes the
# same L-moment base already used by flood_frequency_lmoments.
#
# Cross-engine exactness contract (the repo's quantized-sum idiom):
# every AGGREGATION is over exact integers (ranked probability-
# weighted-moment sums, quantized L-CV ratios, quantized simulated
# values), every double operation is a SCALAR expression written with
# the identical parenthesization on the Spark and DuckDB sides. The
# Monte-Carlo step of the H statistic is replaced by a DETERMINISTIC
# low-discrepancy driver (Knuth multiplicative-hash uniforms over the
# (sim, site, year) grid) so mu_V / sigma_V are reproducible bit-for-
# bit in both engines — same trade the SPI query makes in replacing
# the incomplete-gamma CDF with the empirical CDF.
# ---------------------------------------------------------------------------

_LM_INV_LN2 = 1.4426950408889634
_LM_GAMMA = 0.5772156649015329
_LM_TQ = 1_000_000_000_000      # quantization of L-moment ratios
_LM_XQ = 1_000_000_000          # quantization of simulated values


def _pwm_ratios(ranked: DataFrame, part_cols: Sequence[str],
                vq: str = "vq") -> DataFrame:
    """Exact integer probability-weighted moments over pre-ranked
    integer values -> per-group (n, s0, s1, s2) plus the scalar-double
    L-moment ratios t (L-CV) and t3 (L-skewness) and their quantized
    integer twins tq/t3q. ``ranked`` must carry an ``i`` rank column
    (1-based, total order within the group)."""
    i, v = F.col("i"), F.col(vq)
    g = ranked.groupBy(*part_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).alias("s0"),
        F.sum((i - 1) * v).alias("s1"),
        F.sum((i - 1) * (i - 2) * v).alias("s2"),
        F.sum((i - 1) * (i - 2) * (i - 3) * v).alias("s3"))
    n, s0, s1, s2 = F.col("n"), F.col("s0"), F.col("s1"), F.col("s2")
    s3 = F.col("s3")
    l1 = s0.cast("double") / n
    b1 = s1.cast("double") / (n * (n - 1))
    b2 = s2.cast("double") / (n * (n - 1) * (n - 2))
    b3 = s3.cast("double") / (n * (n - 1) * (n - 2) * (n - 3))
    l2 = 2 * b1 - l1
    l3 = 6 * b2 - 6 * b1 + l1
    l4 = 20 * b3 - 30 * b2 + 12 * b1 - l1
    t = l2 / l1
    t3 = l3 / l2
    t4 = l4 / l2
    return g.select(
        *part_cols, "n", "s0",
        l1.alias("l1"), t.alias("t"), t3.alias("t3"), t4.alias("t4"),
        F.floor(t * _LM_TQ + F.lit(0.5)).cast("long").alias("tq"),
        F.floor(t3 * _LM_TQ + F.lit(0.5)).cast("long").alias("t3q"),
        F.floor(t4 * _LM_TQ + F.lit(0.5)).cast("long").alias("t4q"))


def site_lmoment_ratios(annual: DataFrame) -> DataFrame:
    """Per-site sample L-moment ratios from quantized annual maxima.
    ``annual``: (region, site, yr, mq) with mq an exact integer
    (centi-quantized annual maximum). Sites with n < 4 are dropped
    (t3 needs n >= 3; one extra year keeps the ratios stable)."""
    w = Window.partitionBy("region", "site").orderBy("mq", "yr")
    ranked = annual.withColumn("i", F.row_number().over(w))
    return _pwm_ratios(ranked, ["region", "site"], "mq") \
        .where(F.col("n") >= 4)


def _region_dispersion(sites: DataFrame,
                       part_cols: Sequence[str]) -> DataFrame:
    """Exact-integer weighted L-CV dispersion per group: with
    n_tot = sum(n_i), S_t = sum(n_i * tq_i) and
    e_i = n_tot * tq_i - S_t, V = sqrt(sum(n_i * e_i^2) / n_tot)
    / (n_tot * TQ) — the integer core makes the weighted variance
    order-independent; only the final sqrt/division chain is double
    math (identical text both engines). NB the total is named n_tot,
    not N: both Spark and DuckDB resolve column names
    case-insensitively, so an ``N`` beside the per-site ``n`` is a
    silent collision in BOTH engines.

    One-pass shape (r12, guide §2.4): the former Window(n_tot, S_t) +
    groupBy needed two exchanges per call site; the deviation sum
    expands algebraically to sum(n_i e_i^2) = n_tot^2 * sum(n_i tq_i^2)
    - n_tot * S_t^2 — every term an exact integer — so ONE aggregation
    computes the identical SE (same decimal value, hence bit-identical
    doubles downstream)."""
    n, tq = F.col("n"), F.col("tq")
    n_dec = n.cast("decimal(38,0)")
    tq_dec = tq.cast("decimal(38,0)")
    g = sites.groupBy(*part_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_sites"),
        F.sum(n).alias("n_tot"),
        F.sum(n * tq).alias("S_t"),
        F.sum(F.col("n") * F.col("t3q")).alias("S_t3"),
        F.sum(n_dec * tq_dec * tq_dec).alias("__A"))
    nt = F.col("n_tot")
    nt_dec = nt.cast("decimal(38,0)")
    st_dec = F.col("S_t").cast("decimal(38,0)")
    se = nt_dec * (nt_dec * F.col("__A") - st_dec * st_dec)
    g = g.withColumn("SE", se)
    v = (F.sqrt(F.col("SE").cast("double") / nt)
         / (nt * F.lit(float(_LM_TQ))))
    return g.select(
        *part_cols, "n_sites", "n_tot", "S_t", "S_t3",
        ((F.col("S_t").cast("double") / nt) / F.lit(float(_LM_TQ)))
        .alias("t_r"),
        ((F.col("S_t3").cast("double") / nt) / F.lit(float(_LM_TQ)))
        .alias("t3_r"),
        v.alias("v"))


def regional_lmoment_homogeneity(annual: DataFrame,
                                 nsim: int = 40,
                                 sites: DataFrame | None = None) -> DataFrame:
    """Hosking & Wallis heterogeneity H per region: observed weighted
    L-CV dispersion V against the dispersion distribution of ``nsim``
    simulated homogeneous regions with the SAME site-year layout, each
    drawn from the region's fitted Gumbel growth curve (alpha =
    t_R / ln 2, xi = 1 - gamma * alpha — the index-flood-normalized
    regional L-moments). H > 1 possibly heterogeneous, H > 2
    definitely (H&W 1997 §4.3.3 thresholds).

    The uniform driver is deterministic: u = (md5_60(sim * 1000003 +
    site_ord * 8191 + j) + 0.5) / 2^60 over the (sim, site,
    year-rank) grid — the UNIFORMS are integer-exact cross-engine
    (md5 of the decimal key string, the engine-wide portable hash).
    An md5-class mixer is REQUIRED here, not a convenience: the r11
    driver multiplied the same grid key by the Knuth constant mod
    2^32, and consecutive year-ranks j then produced a golden-ratio
    Weyl sequence — a LOW-DISCREPANCY point set whose per-site sample
    L-CVs were ~3.4x underdispersed vs iid Gumbel (measured: lcv std
    0.013 vs 0.044 at n=25), so mu_v/sigma_v were ~3.5x too small and
    H over-flagged heterogeneity by ~10 sigma on perfectly
    homogeneous regions. Both engines mirrored the formula, so the
    cross-engine gate could never see it (the r2-minhash risk class);
    test_regional_h_driver_matches_iid_ground_truth pins the
    simulated moments against numpy iid Monte Carlo.
    The Gumbel transform -ln(-ln(u)) then runs through
    each engine's libm ``log`` (not correctly rounded), so a draw
    whose x*XQ+0.5 lands within ulps of an integer can, in principle,
    quantize differently per engine and perturb the 1e-6-rounded
    h_stat — the same rare-boundary class as every -ln oracle idiom
    in the engine, NOT a bit-for-bit guarantee. In practice the
    battery pins it green at both gate SFs; a provably-stable variant
    would precompute a quantized y-grid over the 2^32 hash values.

    ``site_ord`` is the site's dense rank within its
    region, NOT the raw site id: ids may be strings ('08MF005') or
    large enough that id * 8191 would overflow int64 — the rank is a
    small dense integer for any orderable id type. Simulated values
    are quantized to integers BEFORE ranking/PWM sums, keeping every
    aggregation order-independent.

    Scale: everything after the annual-max rollup is catalog-sized
    (sites x years x nsim rows); windows partition on (region[, sim,
    site]) — nothing global."""
    if sites is None:
        sites = site_lmoment_ratios(annual)
    obs = _region_dispersion(sites, ["region"])

    # site_ord from the CATALOG-SIZED site list, broadcast back onto
    # the annual rows (r12, guide §2.4): the former dense_rank window
    # ran over every annual row — a second full exchange of the fact —
    # for a rank that is constant per site. Ranking the per-site frame
    # (one row per retained site) yields the identical ordinal, and
    # the inner broadcast join doubles as the former left-semi
    # membership filter.
    wj = Window.partitionBy("region", "site").orderBy("yr")
    word = Window.partitionBy("region").orderBy("site")
    ords = (sites.select("region", "site")
            .withColumn("site_ord", F.dense_rank().over(word)))
    grid = (annual
            .join(F.broadcast(ords), ["region", "site"])
            .withColumn("j", F.row_number().over(wj))
            .select("region", "site", "site_ord", "j")
            .withColumn("sim", F.explode(
                F.sequence(F.lit(1), F.lit(int(nsim))))))
    g = grid.join(F.broadcast(obs.select("region", "t_r")), "region")
    from ..functions.text import md5_int

    k = (F.col("sim").cast("long") * F.lit(1000003)
         + F.col("site_ord").cast("long") * F.lit(8191)
         + F.col("j").cast("long"))
    hnum = md5_int(k.cast("string"), 15)      # 60 uniform bits
    u = (hnum.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    alpha = F.col("t_r") * F.lit(_LM_INV_LN2)
    y = -F.log(-F.log(u))
    x = (F.lit(1.0) - F.lit(_LM_GAMMA) * alpha) + alpha * y
    sim_vals = g.select(
        "region", "site", "sim", "j",
        F.floor(x * F.lit(float(_LM_XQ)) + F.lit(0.5)).cast("long")
        .alias("xq"))
    wr = Window.partitionBy("region", "site", "sim") \
        .orderBy("xq", "j")
    ranked = sim_vals.withColumn("i", F.row_number().over(wr))
    sim_sites = _pwm_ratios(ranked, ["region", "sim", "site"], "xq")
    sim_v = _region_dispersion(sim_sites, ["region", "sim"]).select(
        "region",
        F.floor(F.col("v") * F.lit(float(_LM_TQ)) + F.lit(0.5))
        .cast("long").alias("vqs"))
    vq_dec = F.col("vqs").cast("decimal(38,0)")
    sims = sim_v.groupBy("region").agg(
        F.count(F.lit(1)).cast("long").alias("n_sim"),
        F.sum("vqs").alias("SV"),
        F.sum(vq_dec * vq_dec).alias("SV2"))
    ns = F.col("n_sim")
    num = (ns.cast("decimal(38,0)") * F.col("SV2")
           - F.col("SV").cast("decimal(38,0)")
           * F.col("SV").cast("decimal(38,0)"))
    mu_v = (F.col("SV").cast("double") / ns) / F.lit(float(_LM_TQ))
    sigma_v = (F.sqrt(num.cast("double") / (ns * (ns - 1)))
               / F.lit(float(_LM_TQ)))
    joined = obs.join(F.broadcast(sims), "region")
    h = (F.col("v") - mu_v) / sigma_v
    return joined.select(
        "region", "n_sites", F.col("n_tot").alias("total_years"),
        "t_r", "t3_r", F.col("v").alias("v_obs"),
        mu_v.alias("mu_v"), sigma_v.alias("sigma_v"),
        h.alias("h_stat"),
        (h > F.lit(1.0)).alias("possibly_heterogeneous"),
        (h > F.lit(2.0)).alias("definitely_heterogeneous"))


def regional_index_flood(annual: DataFrame,
                         quantile_k: dict | None = None) -> DataFrame:
    """Index-flood site quantiles (Dalrymple 1960; H&W 1997 ch. 6):
    the region's dimensionless Gumbel growth curve (fitted from the
    weighted regional L-moment ratios, index flood normalized to 1)
    scaled by each site's own index flood (its mean annual maximum).
    ``quantile_k``: {label: Gumbel reduced-variate K_T} — defaults to
    the 10- and 100-year factors used by flood_frequency_gumbel."""
    if quantile_k is None:
        quantile_k = {"q10": 2.2503673273124454,
                      "q100": 4.600149226776579}
    sites = site_lmoment_ratios(annual)
    reg = _region_dispersion(sites, ["region"])
    j = sites.join(F.broadcast(reg.select("region", "t_r")), "region")
    alpha = F.col("t_r") * F.lit(_LM_INV_LN2)
    xi = F.lit(1.0) - F.lit(_LM_GAMMA) * alpha
    index_flood = (F.col("s0").cast("double") / F.col("n")) / F.lit(100.0)
    cols = [
        "region", "site", F.col("n").alias("n_years"),
        index_flood.alias("index_flood"), "t_r",
    ]
    for label, kt in quantile_k.items():
        growth = xi + alpha * F.lit(float(kt))
        cols.append((index_flood * growth).alias(label))
    return j.select(*cols)


# Hosking & Wallis 1997 Table 3.1 critical discordancy values by
# number of sites (<= 5 -> 1.333, >= 15 -> 3.0)
_DISCORDANCY_CRIT = {5: 1.333, 6: 1.648, 7: 1.917, 8: 2.140,
                     9: 2.329, 10: 2.491, 11: 2.632, 12: 2.757,
                     13: 2.869, 14: 2.971}


def regional_discordancy(annual: DataFrame,
                         sites: DataFrame | None = None) -> DataFrame:
    """Hosking & Wallis discordancy D_i (1993 WRR; 1997 §3.2.3): the
    per-site Mahalanobis-style screen over u_i = (t, t3, t4) —
    D_i = (n_sites / 3) * (u_i - ubar)' A^{-1} (u_i - ubar) with
    A = sum (u_i - ubar)(u_i - ubar)'. Completes the regional
    screening trio next to the H statistic (discordancy -> drop or
    inspect a site BEFORE testing regional homogeneity).

    Exactness: with uq_i the TQ-quantized integer ratio vectors and
    d_i = n_sites * uq_i - sum(uq), the (n_sites * TQ) scale factors
    cancel: D_i = (n_sites / 3) * d_i' M^{-1} d_i where M = sum d d'
    is an EXACT decimal integer matrix. M entries (~1e26) exceed the
    53-bit double mantissa, so the one int->double cast rounds — but
    IEEE round-to-nearest from the same exact integer is identical in
    both engines, and the 3x3 adjugate/determinant chain after it is
    scalar double math with mirrored text.

    ``discordant`` flags D_i above the H&W Table 3.1 critical value
    for the region's site count. Regions need >= 4 sites (A is rank
    <= n_sites - 1; with 3 sites D_i = 1 identically)."""
    if sites is None:
        sites = site_lmoment_ratios(annual)
    w = Window.partitionBy("region")
    x = (sites
         .withColumn("ns", F.count(F.lit(1)).over(w))
         .withColumn("Su1", F.sum("tq").over(w))
         .withColumn("Su2", F.sum("t3q").over(w))
         .withColumn("Su3", F.sum("t4q").over(w))
         .withColumn("d1", F.col("ns") * F.col("tq") - F.col("Su1"))
         .withColumn("d2", F.col("ns") * F.col("t3q") - F.col("Su2"))
         .withColumn("d3", F.col("ns") * F.col("t4q") - F.col("Su3"))
         .where(F.col("ns") >= 4))
    dd = lambda a, b: F.sum(  # noqa: E731
        F.col(a).cast("decimal(38,0)") * F.col(b).cast("decimal(38,0)"))
    m = x.groupBy("region").agg(
        dd("d1", "d1").alias("m11"), dd("d1", "d2").alias("m12"),
        dd("d1", "d3").alias("m13"), dd("d2", "d2").alias("m22"),
        dd("d2", "d3").alias("m23"), dd("d3", "d3").alias("m33"))
    j = x.join(F.broadcast(m), "region")
    m11 = F.col("m11").cast("double")
    m12 = F.col("m12").cast("double")
    m13 = F.col("m13").cast("double")
    m22 = F.col("m22").cast("double")
    m23 = F.col("m23").cast("double")
    m33 = F.col("m33").cast("double")
    det = (m11 * (m22 * m33 - m23 * m23)
           - m12 * (m12 * m33 - m13 * m23)
           + m13 * (m12 * m23 - m13 * m22))
    c11 = m22 * m33 - m23 * m23
    c12 = -(m12 * m33 - m13 * m23)
    c13 = m12 * m23 - m13 * m22
    c22 = m11 * m33 - m13 * m13
    c23 = -(m11 * m23 - m12 * m13)
    c33 = m11 * m22 - m12 * m12
    d1 = F.col("d1").cast("double")
    d2 = F.col("d2").cast("double")
    d3 = F.col("d3").cast("double")
    quad = (d1 * d1 * c11 + d2 * d2 * c22 + d3 * d3 * c33
            + 2 * (d1 * d2 * c12) + 2 * (d1 * d3 * c13)
            + 2 * (d2 * d3 * c23))
    # singular moment matrix (linearly dependent deviation vectors —
    # e.g. bit-identical site L-moments) -> D undefined: emit NULL
    # rather than quad/0 (NaN sorts ABOVE every double in Spark, so an
    # unguarded NaN would flag every site discordant); the discordant
    # flag coalesces to FALSE so a degenerate region is left intact
    # for the H stage instead of being silently emptied
    d_stat = F.when(det != F.lit(0.0),
                    (F.col("ns") / F.lit(3.0)) * (quad / det))
    crit = F.lit(1.333)
    for k in sorted(_DISCORDANCY_CRIT):
        if k == 5:
            continue
        crit = F.when(F.col("ns") >= k,
                      F.lit(_DISCORDANCY_CRIT[k])).otherwise(crit)
    crit = F.when(F.col("ns") >= 15, F.lit(3.0)).otherwise(crit)
    return j.select(
        "region", "site", F.col("n").alias("n_years"),
        "t", "t3", "t4",
        d_stat.alias("d_stat"),
        crit.alias("d_critical"),
        F.coalesce(d_stat > crit, F.lit(False)).alias("discordant"))


def regional_screening_report(annual: DataFrame,
                              nsim: int = 40) -> DataFrame:
    """The full Hosking & Wallis regional screening procedure as one
    composition (1997 ch. 3-6 workflow): per-site discordancy D_i ->
    DROP discordant sites -> heterogeneity H over the retained sites
    -> the regional Gumbel growth-curve factors an index-flood user
    would apply. One row per region:

    (region, n_sites_initial, n_discordant, n_sites_used, total_years,
    t_r, h_stat, possibly/definitely_heterogeneous, growth_q10,
    growth_q100) — t_r and the growth factors are computed from the
    RETAINED sites only, which is the point of screening first.
    """
    # r12 single-derivation shape (guide §2.4/§5): the per-site
    # L-moment ratios feed BOTH the discordancy screen and (filtered
    # to survivors) the H statistic — they are per-site stats, so
    # dropping other sites cannot change them. The former composition
    # re-derived the full ranked-PWM chain from `annual` a second time
    # inside regional_lmoment_homogeneity; this one computes it once,
    # persists the catalog-sized result (one row per site), and the H
    # stage starts from the filtered ratios.
    sites_all = site_lmoment_ratios(annual).persist()
    # disc feeds two consumers (counts + keep) and keep feeds two more
    # (kept fact rows + kept site ratios): persist the one-row-per-site
    # frame so the D-statistic subtree runs once, not four times
    disc = regional_discordancy(annual, sites=sites_all).persist()
    counts = disc.groupBy("region").agg(
        F.count(F.lit(1)).cast("long").alias("n_sites_initial"),
        F.sum(F.col("discordant").cast("long")).alias("n_discordant"))
    keep = disc.where(~F.col("discordant")).select("region", "site")
    kept = annual.join(F.broadcast(keep), ["region", "site"],
                       "left_semi")
    kept_sites = sites_all.join(F.broadcast(keep), ["region", "site"],
                                "left_semi")
    h = regional_lmoment_homogeneity(kept, nsim, sites=kept_sites)
    alpha = F.col("t_r") * F.lit(_LM_INV_LN2)
    xi = F.lit(1.0) - F.lit(_LM_GAMMA) * alpha
    return h.join(F.broadcast(counts), "region").select(
        "region", "n_sites_initial", "n_discordant",
        F.col("n_sites").alias("n_sites_used"), "total_years",
        "t_r", "h_stat",
        "possibly_heterogeneous", "definitely_heterogeneous",
        (xi + alpha * F.lit(2.2503673273124454)).alias("growth_q10"),
        (xi + alpha * F.lit(4.600149226776579)).alias("growth_q100"))


# lnGamma(1+k) truncated Taylor series (Abramowitz & Stegun 6.1.33):
# ln G(1+k) = -gamma*k + sum_{j>=2} (-1)^j zeta(j)/j * k^j. BOTH
# engines evaluate the identical Horner text over these literal
# coefficients, so the (fixed, documented) truncation error cancels
# cross-engine — the hash gate NEVER sees it. The series converges for
# |k| < 1 (pole at k = -1); truncation accuracy vs true Gamma is
# ~1e-12 for |k| <= 0.5 and degrades toward |k| -> 1 (the growth-curve
# OUTPUT stays ~1e-5 relative there because Gamma enters alpha and xi
# with cancelling sensitivities — verified against math.gamma).
_GEV_ZETA = [
    1.6449340668482264, 1.2020569031595943, 1.0823232337111382,
    1.0369277551433699, 1.0173430619844491, 1.0083492773819228,
    1.0040773561979443, 1.0020083928260822, 1.0009945751278181,
    1.0004941886041195, 1.0002460865533080, 1.0001227133475785,
    1.0000612481350587,
]
_GEV_LNG_COEFS = [-0.5772156649015329] + [
    ((-1.0) ** j) * z / j for j, z in enumerate(_GEV_ZETA, start=2)
]
_GEV_LN2_OVER_LN3 = 0.6309297535714574   # log(2)/log(3)
_GEV_LN2 = 0.6931471805599453
# c_F = ln(-ln F) for the standard return periods, as FIXED double
# literals shared with the oracle SQL (computing them via the running
# host's math.log would tie the Spark plan to that libm while the
# oracle bakes repr literals — a systematic, every-row divergence
# channel instead of the accepted rare-boundary class). Other F values
# fall back to math.log and are documented as host-libm-dependent.
_GEV_CF = {0.9: -2.2503673273124454, 0.99: -4.600149226776579,
           0.5: -0.36651292058166435, 0.98: -3.9019386579358333,
           0.995: -5.295812142535025}


def _ln_gamma_1p(k: Column) -> Column:
    """Horner form of the series above; mirrored verbatim in SQL.
    Accurate (~1e-6 or better) only for |k| <= 0.5 — callers reduce
    the argument into that window first (see _gamma_1p)."""
    acc = F.lit(_GEV_LNG_COEFS[-1])
    for c in reversed(_GEV_LNG_COEFS[:-1]):
        acc = F.lit(c) + k * acc
    return k * acc


def _gamma_1p(k: Column) -> Column:
    """Gamma(1+k) with argument reduction into the series' accurate
    window (r11 review fix — the bare series degrades from ~0.3% at
    k=0.85 to garbage past the k=1 convergence radius):
    Gamma(1+k) = k * Gamma(1+(k-1)) for k > 0.5 (k-1 in (-0.5, 0.5]);
    Gamma(1+k) = Gamma(1+(k+1)) / (1+k) for k < -0.5 (pole at k=-1).
    Both arms are mirrored CASE text in the oracle SQL."""
    return (
        F.when(k > 0.5, k * F.exp(_ln_gamma_1p(k - 1)))
        .when(k < -0.5, F.exp(_ln_gamma_1p(k + 1)) / (F.lit(1.0) + k))
        .otherwise(F.exp(_ln_gamma_1p(k)))
    )


def regional_index_flood_gev(annual: DataFrame,
                             quantile_F: dict | None = None) -> DataFrame:
    """Index-flood site quantiles under a regional GEV growth curve
    (Hosking & Wallis 1997 ch. 6 fit the GEV, not only Gumbel): shape
    from the closed-form Hosking approximation
    z = 2/(3 + t3_R) - ln2/ln3, k = 7.8590 z + 2.9554 z^2 (H&W A.55),
    then alpha = t_R k / ((1 - 2^-k) Gamma(1+k)) and
    xi = 1 - alpha (1 - Gamma(1+k))/k for the index-flood-normalized
    distribution (lambda1 = 1, lambda2 = t_R); site quantile =
    index_flood * (xi + alpha (1 - (-ln F)^k)/k).

    Determinism: Gamma(1+k) is exp of a truncated lnGamma Taylor
    series whose Horner text both engines evaluate identically (the
    truncation cancels cross-engine), with argument reduction via the
    mirrored Gamma recurrence so the series only ever evaluates at
    |k'| <= 0.5 (_gamma_1p); (-ln F)^k = exp(k * c_F) with c_F a FIXED
    double literal from _GEV_CF (never the running host's math.log for
    the standard return periods); the k -> 0 Gumbel limit is an
    explicit mirrored CASE guard. VALIDITY: quantiles are NULL outside
    k in (-0.9, 1.5] — below, the k = -1 Gamma pole makes the fit
    meaningless; above, the reduced argument leaves the series'
    accurate window (and such k come from |t3_R| far outside the
    closed-form approximation's own domain). Extends
    regional_index_flood with a second distribution family — same
    broadcast-only plan shape.
    """
    import math

    if quantile_F is None:
        quantile_F = {"q10": 0.9, "q100": 0.99}
    sites = site_lmoment_ratios(annual)
    reg = _region_dispersion(sites, ["region"])
    j = sites.join(F.broadcast(reg.select("region", "t_r", "t3_r")),
                   "region")
    # staged fit (r12): see _with_gev_fit — same arithmetic, small plan
    j = _with_gev_fit(j, F.col("t3_r"), F.col("t_r"), F.lit(1.0))
    kk = F.col("__gev_k")
    alpha, xi = F.col("__gev_alpha"), F.col("__gev_xi")
    valid = (kk > F.lit(-0.9)) & (kk <= F.lit(1.5))
    index_flood = (F.col("s0").cast("double") / F.col("n")) / F.lit(100.0)
    cols = [
        "region", "site", F.col("n").alias("n_years"),
        index_flood.alias("index_flood"), "t_r", "t3_r",
        kk.alias("k_gev"),
    ]
    for label, Fp in quantile_F.items():
        c_f = _GEV_CF.get(Fp, math.log(-math.log(Fp)))
        growth = _gev_growth(kk, alpha, xi, c_f)
        cols.append(
            F.when(valid, index_flood * growth).alias(label))
    return j.select(*cols)


def mann_kendall_blas(
    daily: DataFrame,
    keys: list[str],
    date_col: str = "date",
    value_col: str = "value",
    max_group_rows: int = 8192,
) -> DataFrame:
    """Kernel twin of :func:`mann_kendall` (the
    functions/kernel_twin contract; VERDICT r11 #4): the per-group
    pairwise S statistic, tie sums, and Sen-slope median are one
    triangular numpy pass inside ``applyInPandas`` — the JVM path
    shuffles the full PAIR mass ((days choose 2) rows per group)
    through a self-join, the twin shuffles only the n daily rows per
    group and builds the triangle in-kernel: shuffle drops from
    O(n^2) to O(n) per group with identical output.

    Bit-parity contract (pinned by
    tests/test_blas_kernels.py::test_mann_kendall_twin_bit_parity):
    values quantize to the same integer micro-units in the same Spark
    projection; S and the tie sums are exact int64; var_s/z evaluate
    the same double expressions in the same order; the slope median
    mirrors Spark's Percentile interpolation TEXTUALLY (lower +
    (higher - lower) * frac — numpy's np.percentile lerps from the
    other end for frac >= 0.5 and can differ in the last ulp). NULL
    algebra mirrored: a NULL value contributes sgn 0 to every pair
    (JVM: when().otherwise(0)), its slopes drop from the median
    (percentile skips NULLs), it ties with other NULLs (groupBy
    collates NULLs), and it still counts toward n_days.

    ``max_group_rows`` bounds the in-kernel triangle (8192 rows ->
    ~33M pairs, ~0.5 GB of transient slope doubles); the year-keyed
    hydrologic use sits at <= 366. Groups with fewer than 2 rows (or
    no t-distinct pair) drop, as in the JVM path.
    """
    import numpy as np
    import pandas as pd

    from ..functions.kernel_twin import assert_exact_int64, nullable_series

    t = F.datediff(F.col(date_col), F.lit("1970-01-01").cast("date"))
    vq = F.floor(F.col(value_col).cast("double") * 1e6 + F.lit(0.5)) \
        .cast("long")
    d = daily.select(*keys, t.alias("__t"), vq.alias("__v"))
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in d.schema.fields if f.name in keys)
    out_schema = (key_schema + ", n_days bigint, s_stat bigint,"
                  " var18 bigint, var_s double, z double,"
                  " sen_slope double")
    def empty_of(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            **{k: pdf[k].iloc[0:0] for k in keys},
            **{c: pd.array([], dtype="Int64")
               for c in ("n_days", "s_stat", "var18")},
            **{c: pd.array([], dtype="Float64")
               for c in ("var_s", "z", "sen_slope")},
        })[[*keys, "n_days", "s_stat", "var18", "var_s", "z",
            "sen_slope"]]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        n = len(pdf)
        if n < 2:
            return empty_of(pdf)
        if n > max_group_rows:
            raise ValueError(
                f"mann_kendall_blas: group of {n} rows exceeds "
                f"max_group_rows={max_group_rows} — raise the cap or "
                "key the test per period")
        tarr = pdf["__t"].to_numpy(np.int64)
        order = np.argsort(tarr, kind="stable")
        tarr = tarr[order]
        v = pdf["__v"].iloc[order]
        mask = v.notna().to_numpy()
        # all-NULL tie group still contributes to the tie sum; NULL
        # rows count toward n_days but never toward S or the median
        m = int(mask.sum())
        tv = tarr[mask]
        if m >= 1:
            vi = v[mask].to_numpy(np.int64)
            assert_exact_int64(int(np.abs(vi).max(initial=0)) * 2,
                               1, "mann_kendall_blas pair difference")
        else:
            vi = np.empty(0, np.int64)
        s_stat = 0
        sen = None
        if m >= 2:
            iu, ju = np.triu_indices(m, 1)
            # identical t cannot pair (the JVM join requires tb > ta)
            keep = tv[ju] > tv[iu]
            dv = vi[ju[keep]] - vi[iu[keep]]
            dt = tv[ju[keep]] - tv[iu[keep]]
            s_stat = int(np.sign(dv).sum())
            slopes = np.sort((dv.astype(np.float64) / 1e6) / dt)
            if slopes.size:
                pos = 0.5 * (slopes.size - 1)
                lo = math.floor(pos)
                hi = math.ceil(pos)
                sen = (float(slopes[lo]) if lo == hi else
                       float(slopes[lo])
                       + (float(slopes[hi]) - float(slopes[lo]))
                       * (pos - lo))
        # the JVM path drops groups whose pair join is empty (all
        # rows share one t) — they never reach st
        n_pairs_any = int((tarr[1:] != tarr[:-1]).any())
        if not n_pairs_any:
            return empty_of(pdf)
        # tie groups over the valid ints; NULLs collate as ONE group,
        # mirroring groupBy's NULL collation
        n_null = n - m
        _, cv = np.unique(vi, return_counts=True)
        groups = list(cv) + ([n_null] if n_null else [])
        tiesum = int(sum(g * (g - 1) * (2 * g + 5) for g in groups))
        var18 = n * (n - 1) * (2 * n + 5) - tiesum
        var_s = var18 / 18.0
        if var_s > 0:
            if s_stat > 0:
                z = (s_stat - 1) / math.sqrt(var_s)
            elif s_stat < 0:
                z = (s_stat + 1) / math.sqrt(var_s)
            else:
                z = 0.0
        else:
            z = None
        return pd.DataFrame({
            **{k: [pdf[k].iloc[0]] for k in keys},
            "n_days": nullable_series([n], "Int64"),
            "s_stat": nullable_series([s_stat], "Int64"),
            "var18": nullable_series([var18], "Int64"),
            "sen_slope": nullable_series([sen], "Float64"),
            "var_s": nullable_series([var_s], "Float64"),
            "z": nullable_series([z], "Float64"),
        })[[*keys, "n_days", "s_stat", "var18", "var_s", "z",
            "sen_slope"]]

    return d.groupBy(*keys).applyInPandas(kernel, out_schema)


def _gev_growth(kk: Column, alpha: Column, xi: Column, c_f: float):
    small = F.abs(kk) < F.lit(1e-12)
    return F.when(small, xi + alpha * F.lit(-c_f)).otherwise(
        xi + alpha * (F.lit(1.0) - F.exp(kk * F.lit(c_f))) / kk)


def _with_gev_fit(df: DataFrame, t3_r: Column, scale: Column,
                  loc: Column) -> DataFrame:
    """The index-flood GEV fit from L-moment ratios (H&W A.55
    closed-form shape z = 2/(3+t3) - ln2/ln3, k = 7.8590z + 2.9554z^2,
    plus the mirrored Gamma machinery), staged through NAMED
    projections: ``__gev_k``,
    ``__gev_g1``, ``__gev_alpha``, ``__gev_xi`` each become a column
    computed once instead of a subtree re-inlined at every reference.
    The un-staged trees grow multiplicatively — the Horner lnGamma
    series references k ~12x, Gamma(1+k) holds three series arms,
    alpha embeds Gamma, xi embeds alpha twice, the growth factor
    embeds all of them — so a single fit column reached ~50k
    expression nodes and Catalyst re-analyzed + re-codegenned the
    whole tree on every action (r12, guide §7.2/§7.3: plan size as
    the bottleneck; regional_gev_uncertainty spent ~3.5s/run on ~100
    rows). CollapseProject keeps the stages separate because every
    alias is non-cheap and multiply-referenced. Each staged column
    evaluates the identical double expression on identical inputs, so
    results are bit-identical and the mirrored oracle SQL text is
    untouched.

    ``scale``/``loc`` are lambda2-and-lambda1-like inputs: the
    regional (index-flood-normalized) fits pass (t_R, 1.0); the
    at-site low-flow fit passes (l2, l1).
    """
    z = F.lit(2.0) / (F.lit(3.0) + t3_r) - F.lit(_GEV_LN2_OVER_LN3)
    kk = F.lit(7.8590) * z + F.lit(2.9554) * z * z
    df = df.withColumn("__gev_k", kk)
    k = F.col("__gev_k")
    df = df.withColumn("__gev_g1", _gamma_1p(k))
    g1 = F.col("__gev_g1")
    small = F.abs(k) < F.lit(1e-12)
    df = df.withColumn(
        "__gev_alpha",
        F.when(small, scale * F.lit(_LM_INV_LN2))
        .otherwise(scale * k
                   / ((F.lit(1.0) - F.exp(-k * F.lit(_GEV_LN2))) * g1)))
    alpha = F.col("__gev_alpha")
    return df.withColumn(
        "__gev_xi",
        F.when(small, loc - F.lit(0.5772156649015329) * alpha)
        .otherwise(loc - alpha * (F.lit(1.0) - g1) / k))


def regional_gev_uncertainty(annual: DataFrame,
                             nsim: int = 40,
                             Fp: float = 0.99) -> DataFrame:
    """Simulation confidence bounds for the regional GEV growth factor
    (H&W 1997 ch. 6 assessment machinery, VERDICT r11 #8): fit the
    regional growth curve, simulate ``nsim`` homogeneous regions with
    the SAME site-year layout by inverse-CDF draws from the fitted
    normalized GEV, REFIT the growth curve per simulation, and report
    the simulated mean / sd / central-90% rank bounds of the
    ``Fp``-quantile growth factor beside the point estimate.

    Determinism (the H-statistic argument): uniforms are
    (md5_60('gevu|' + grid key) + 0.5)/2^60 — integer-exact
    cross-engine; simulated draws and per-sim growth factors quantize
    to 1e-9 integers before any aggregation, so the mean/sd are exact
    integer sums and the bounds are integer RANK selections (never an
    interpolated quantile); the only float divergence channel is the
    usual exp/ln libm ulp class at quantization boundaries.
    Simulations whose refit shape leaves the validity window
    (-0.9, 1.5] drop, and n_sim reports the survivors — rank
    positions adapt (lo = max(1, n DIV 20), hi = n + 1 - lo).

    Scale: everything past the annual rollup is catalog-sized
    (sites x years x nsim); broadcast-only joins, windows keyed per
    (region[, sim, site]).
    """
    import math

    from ..functions.text import md5_int

    c_f = _GEV_CF.get(Fp, math.log(-math.log(Fp)))
    sites = site_lmoment_ratios(annual)
    reg = _region_dispersion(sites, ["region"])
    # staged fit (r12): see _with_gev_fit — same arithmetic, small plan
    regfit = _with_gev_fit(
        reg.select("region", "n_sites", "t_r", "t3_r"),
        F.col("t3_r"), F.col("t_r"), F.lit(1.0)
    ).select(
        "region", "n_sites", "t_r", "t3_r",
        F.col("__gev_k").alias("k_gev"),
        F.col("__gev_alpha").alias("__alpha"),
        F.col("__gev_xi").alias("__xi"),
        _gev_growth(F.col("__gev_k"), F.col("__gev_alpha"),
                    F.col("__gev_xi"), c_f).alias("growth_point"))

    # site_ord from the per-site frame (r12): same restructure as
    # regional_lmoment_homogeneity — rank the catalog-sized site list,
    # broadcast it back; the inner join doubles as the semi filter.
    wj = Window.partitionBy("region", "site").orderBy("yr")
    word = Window.partitionBy("region").orderBy("site")
    ords = (sites.select("region", "site")
            .withColumn("site_ord", F.dense_rank().over(word)))
    grid = (annual
            .join(F.broadcast(ords), ["region", "site"])
            .withColumn("j", F.row_number().over(wj))
            .select("region", "site", "site_ord", "j")
            .withColumn("sim", F.explode(
                F.sequence(F.lit(1), F.lit(int(nsim))))))
    g = grid.join(
        F.broadcast(regfit.select("region", "k_gev", "__alpha", "__xi")),
        "region")
    key = (F.col("sim").cast("long") * F.lit(1000003)
           + F.col("site_ord").cast("long") * F.lit(8191)
           + F.col("j").cast("long"))
    u = (md5_int(F.concat(F.lit("gevu|"), key.cast("string")), 15)
         .cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    ksh = F.col("k_gev")
    small = F.abs(ksh) < F.lit(1e-12)
    y = F.log(-F.log(u))                      # ln(-ln u)
    x = F.when(small, F.col("__xi") + F.col("__alpha") * (-y)) \
        .otherwise(F.col("__xi") + F.col("__alpha")
                   * (F.lit(1.0) - F.exp(ksh * y)) / ksh)
    draws = g.select(
        "region", "site", "sim", "j",
        F.floor(x * F.lit(float(_LM_XQ)) + F.lit(0.5)).cast("long")
        .alias("xq"))
    wr = Window.partitionBy("region", "site", "sim").orderBy("xq", "j")
    ranked = draws.withColumn("i", F.row_number().over(wr))
    spwm = _pwm_ratios(ranked, ["region", "sim", "site"], "xq")
    sreg = _with_gev_fit(_region_dispersion(spwm, ["region", "sim"]),
                         F.col("t3_r"), F.col("t_r"), F.lit(1.0))
    ks = F.col("__gev_k")
    growth_s = _gev_growth(ks, F.col("__gev_alpha"),
                           F.col("__gev_xi"), c_f)
    valid = (ks > F.lit(-0.9)) & (ks <= F.lit(1.5))
    simg = sreg.where(valid).select(
        "region",
        F.floor(growth_s * F.lit(1e9) + F.lit(0.5)).cast("long")
        .alias("gq"))
    gq_dec = F.col("gq").cast("decimal(38,0)")
    agg = simg.groupBy("region").agg(
        F.count(F.lit(1)).cast("long").alias("n_sim"),
        F.sum("gq").alias("__SV"),
        F.sum(gq_dec * gq_dec).alias("__SV2"),
        F.array_sort(F.collect_list("gq")).alias("__arr"))
    ns = F.col("n_sim")
    lo_rank = F.greatest(F.lit(1), F.expr("n_sim div 20")).cast("int")
    hi_rank = (ns + 1 - lo_rank).cast("int")
    num = (ns.cast("decimal(38,0)") * F.col("__SV2")
           - F.col("__SV").cast("decimal(38,0)")
           * F.col("__SV").cast("decimal(38,0)"))
    mean_g = (F.col("__SV").cast("double") / ns) / F.lit(1e9)
    sd_g = F.when(
        ns > 1,
        F.sqrt(num.cast("double") / (ns * (ns - 1))) / F.lit(1e9))
    return regfit.join(F.broadcast(agg), "region").select(
        "region", "n_sites", "n_sim", "t_r", "t3_r", "k_gev",
        F.col("growth_point").alias("growth_q"),
        mean_g.alias("sim_mean_q"),
        sd_g.alias("sim_sd_q"),
        (F.element_at("__arr", lo_rank).cast("double") / F.lit(1e9))
        .alias("lo90_q"),
        (F.element_at("__arr", hi_rank).cast("double") / F.lit(1e9))
        .alias("hi90_q"))


def low_flow_gev_fit(
    daily: DataFrame,
    keys: Sequence[str],
    date_col: str = "date",
    value_col: str = "value",
    window_days: int = 7,
    Fq: float = 0.1,
) -> DataFrame:
    """T-year W-day low flow (the classic 7Q10 when window_days=7 and
    Fq=0.1): annual minima of the W-day moving mean, fitted with a GEV
    by L-moments on the NEGATED minima (minima of X are maxima of -X;
    the reversed-GEV a.k.a. Weibull-type low-flow fit), quantile at
    non-exceedance Fq mapped back, i.e. q = -q_{-X}(1 - Fq).

    Exactness: daily values quantize to 1e-6 longs; the moving-window
    sum, annual min, rank PWMs (s0/s1/s2) are all exact integer
    arithmetic; the only float math is the shared z->k->Gamma(1+k)
    fit chain (_with_gev_fit's constants + _gamma_1p, mirrored
    textually in the oracle) and the final unit conversion. Shape
    validity window (-0.9, 1.5] as in the regional fits; series with
    < 4 annual minima drop (t3 needs n >= 3).

    The moving window is ROW-based over the series' date order — the
    engine's resample/gap operators densify a sparse series first
    when calendar-exact windows are required (same contract as the
    rolling operators in operators/daily.py).

    Scale: one shuffle on the series key for the window, one
    map-side-combinable annual aggregation, then catalog-sized fit
    math. Reference analog: none (the reference stores daily means,
    patch_2 calculated_daily; low-flow statistics are the
    WSC-published product of such a store).
    """
    import math

    c_f = _GEV_CF.get(1.0 - Fq, math.log(-math.log(1.0 - Fq)))
    vq = F.floor(F.col(value_col) * 1e6 + F.lit(0.5)).cast("long")
    w = Window.partitionBy(*keys).orderBy(date_col) \
        .rowsBetween(-(window_days - 1), 0)
    rolled = (
        daily.select(*keys, F.col(date_col), vq.alias("__vq"))
        .withColumn("__s", F.sum("__vq").over(w))
        .withColumn("__c", F.count(F.lit(1)).over(w))
        .where(F.col("__c") == window_days)
    )
    annual = rolled.groupBy(
        *keys, F.year(date_col).cast("int").alias("yr")
    ).agg(F.min("__s").alias("__m"))
    # negate: minima of X are maxima of Y = -X; exact integer ranks
    yv = annual.select(*keys, "yr", (-F.col("__m")).alias("__y"))
    wr = Window.partitionBy(*keys).orderBy("__y", "yr")
    ranked = yv.withColumn("i", F.row_number().over(wr))
    # inline exact PWMs (not _pwm_ratios: the fit below needs l2
    # itself, and deriving it as l1*t would add a mult/div round-trip
    # the oracle text doesn't have — same-expression-shape discipline)
    i, y = F.col("i"), F.col("__y")
    g = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(y).alias("s0"),
        F.sum((i - 1) * y).alias("s1"),
        F.sum((i - 1) * (i - 2) * y).alias("s2"))
    n, s0, s1, s2 = F.col("n"), F.col("s0"), F.col("s1"), F.col("s2")
    l1c = s0.cast("double") / n
    b1 = s1.cast("double") / (n * (n - 1))
    b2 = s2.cast("double") / (n * (n - 1) * (n - 2))
    l2c = 2 * b1 - l1c
    l3c = 6 * b2 - 6 * b1 + l1c
    pw = g.where(n >= 4).select(
        *keys, "n", l1c.alias("l1"), l2c.alias("l2"),
        (l3c / l2c).alias("t3"))
    l1y, l2y = F.col("l1"), F.col("l2")
    t3y = F.col("t3")
    # staged fit (r12): see _with_gev_fit — same arithmetic, small plan
    pw = _with_gev_fit(pw, t3y, l2y, l1y)
    kk = F.col("__gev_k")
    q_y = _gev_growth(kk, F.col("__gev_alpha"), F.col("__gev_xi"), c_f)
    scale = float(window_days) * 1e6
    valid = (kk > F.lit(-0.9)) & (kk <= F.lit(1.5))
    return pw.select(
        *keys, F.col("n").alias("n_years"),
        (-l1y / F.lit(scale)).alias("mean_low"),
        (-t3y).alias("t3_min"),
        kk.alias("k_gev"),
        F.when(valid, -q_y / F.lit(scale)).alias("q_low"))


def drought_spells(
    daily: DataFrame,
    keys: Sequence[str],
    date_col: str = "date",
    value_col: str = "value",
    threshold_exceedance: float = 0.9,
) -> DataFrame:
    """Threshold-level drought runs (Yevjevich run theory, the
    standard low-flow spell analysis): consecutive days strictly
    below the series' Q90 dependable flow (the value exceeded
    ``threshold_exceedance`` of the time, from the same exact
    rank-selection the FDC uses) collapse to spells with start/end,
    duration and cumulative deficit sum(threshold - value).

    Exactness: the threshold and deficits are exact integer
    arithmetic over 1e-6-quantized values; spells number 1..k per
    series by start date. Runs use the gaps-and-islands window idiom
    shared with operators/segments.rle_segments.

    Scale: one shuffle for the per-series threshold (bounded sorted
    array per series, as the FDC), one for the run window — both
    keyed on the series; spells are catalog-sized output.
    """
    vq = F.floor(F.col(value_col) * 1e6 + F.lit(0.5)).cast("long")
    d = daily.select(*keys, F.col(date_col), vq.alias("__vq"))
    pr = 1.0 - threshold_exceedance
    thr = d.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.array_sort(F.collect_list("__vq")).alias("__arr"))
    rank = F.greatest(
        F.lit(1), F.ceil(F.lit(pr) * F.col("__n")).cast("long")).cast("int")
    thr = thr.select(*keys, F.element_at("__arr", rank).alias("__tq"))
    j = d.join(thr, list(keys))
    w = Window.partitionBy(*keys).orderBy(date_col)
    below = F.col("__vq") < F.col("__tq")
    runs = (
        j.withColumn("__b", below)
        .withColumn(
            "__chg",
            F.when(F.col("__b").eqNullSafe(
                F.lag("__b").over(w)), 0).otherwise(1))
        .withColumn("__seg", F.sum("__chg").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    spells = (
        runs.where(F.col("__b"))
        .groupBy(*keys, "__seg")
        .agg(
            F.min(date_col).alias("start_date"),
            F.max(date_col).alias("end_date"),
            F.count(F.lit(1)).cast("long").alias("duration_days"),
            F.sum(F.col("__tq") - F.col("__vq")).alias("__def"))
    )
    ws = Window.partitionBy(*keys).orderBy("start_date")
    return spells.select(
        *keys,
        F.row_number().over(ws).alias("spell_id"),
        "start_date", "end_date", "duration_days",
        (F.col("__def") / F.lit(1e6)).alias("deficit"))
