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

from pyspark.sql import DataFrame
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
        .withColumn("var_s", var_s)
        .withColumn("z", F.when(F.col("var_s") > 0, z))
        .where(n >= 2)
        .select(*keys, n.alias("n_days"), "s_stat", "var_s", "z",
                "sen_slope")
    )
