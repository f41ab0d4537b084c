"""Closed-form Mann-Kendall / Sen's slope checks."""

import math

from pyspark.sql import functions as F

from aquacache_spark.operators.trend import mann_kendall


def test_strictly_increasing_series(spark):
    # x = [1..6] daily: every pair ascending -> S = C(6,2) = 15,
    # no ties -> Var = 6*5*17/18 = 28.333..., slope = 1 everywhere
    rows = [("a", f"2020-01-0{i}", float(i)) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "k string, date string, value double") \
        .withColumn("date", F.col("date").cast("date"))
    out = mann_kendall(df, ["k"]).collect()[0]
    assert out["n_days"] == 6 and out["s_stat"] == 15
    assert abs(out["var_s"] - 6 * 5 * 17 / 18) < 1e-9
    assert abs(out["z"] - (15 - 1) / math.sqrt(6 * 5 * 17 / 18)) < 1e-9
    assert abs(out["sen_slope"] - 1.0) < 1e-9


def test_all_tied_series_has_null_z(spark):
    rows = [("a", f"2020-01-0{i}", 2.5) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "k string, date string, value double") \
        .withColumn("date", F.col("date").cast("date"))
    out = mann_kendall(df, ["k"]).collect()[0]
    # S = 0, tie group of 4 -> Var = [4*3*13 - 4*3*13]/18 = 0 -> z NULL
    assert out["s_stat"] == 0 and out["var_s"] == 0.0
    assert out["z"] is None and out["sen_slope"] == 0.0


def test_decreasing_with_tie(spark):
    # values [3, 3, 1]: pairs (3,3)->0, (3,1)->-1, (3,1)->-1 => S=-2;
    # ties: one group t=2 -> tiesum = 2*1*9 = 18;
    # Var = [3*2*11 - 18]/18 = 48/18
    rows = [("a", "2020-01-01", 3.0), ("a", "2020-01-02", 3.0),
            ("a", "2020-01-03", 1.0)]
    df = spark.createDataFrame(rows, "k string, date string, value double") \
        .withColumn("date", F.col("date").cast("date"))
    out = mann_kendall(df, ["k"]).collect()[0]
    assert out["s_stat"] == -2
    assert abs(out["var_s"] - 48 / 18) < 1e-9
    assert abs(out["z"] - (-2 + 1) / math.sqrt(48 / 18)) < 1e-9


def test_inv_normal_literature_values(spark):
    from pyspark.sql import functions as F

    from aquacache_spark.operators.trend import inv_normal_cdf

    df = spark.createDataFrame(
        [(0.001,), (0.01,), (0.025,), (0.5,), (0.975,), (0.99,),
         (0.999,), (0.0,), (1.0,)], "p double")
    out = {r["p"]: r["z"] for r in
           df.select("p", inv_normal_cdf(F.col("p")).alias("z"))
           .collect()}
    # literature quantiles; Acklam |rel err| < 1.15e-9
    assert abs(out[0.001] - -3.090232306167814) < 1e-8
    assert abs(out[0.01] - -2.3263478740408408) < 1e-8
    assert abs(out[0.025] - -1.9599639845400545) < 1e-8
    assert out[0.5] == 0.0
    assert abs(out[0.975] - 1.9599639845400545) < 1e-8
    assert abs(out[0.999] - 3.090232306167814) < 1e-8
    assert out[0.0] is None and out[1.0] is None
    # symmetry through the tail/central region boundary
    assert abs(out[0.001] + out[0.999]) < 1e-12


def test_inv_normal_cross_engine_bit_parity(spark):
    # dense p grid spanning BOTH Acklam tails and the central region:
    # id-weighted quantized sum must match DuckDB exactly (the
    # weighting defeats the symmetric-cancellation false pass)
    import duckdb
    from pyspark.sql import functions as F

    from aquacache_spark.operators.trend import (inv_normal_cdf,
                                                 inv_normal_sql)

    grid = spark.range(1, 10000).select(
        F.col("id"), (F.col("id") / 10000.0).alias("p"))
    s = grid.select(
        (F.col("id") * F.floor(inv_normal_cdf(F.col("p")) * 1e9
                               + F.lit(0.5)).cast("long")).alias("q")
    ).agg(F.sum("q")).collect()[0][0]
    sql = inv_normal_sql("p")
    d = duckdb.sql(
        f"SELECT sum(id * CAST(floor(({sql}) * 1e9 + CAST(0.5 AS"
        " DOUBLE)) AS BIGINT)) FROM (SELECT id, id / 10000.0 AS p"
        " FROM (SELECT unnest(generate_series(1, 9999)) AS id))"
    ).fetchone()[0]
    assert s == d


def test_spi_empirical_closed_form(spark):
    from pyspark.sql import functions as F

    from aquacache_spark.operators.trend import spi_empirical

    # 3 years x 12 months, one series; July total is yr-dependent so
    # July's 3-month sums rank 1..3 across years
    rows = [("s", 2000 + y, m,
             100.0 + (10.0 * y if m == 7 else 0.0))
            for y in range(3) for m in range(1, 13)]
    monthly = spark.createDataFrame(
        rows, "series string, yr int, mon int, value double")
    out = spi_empirical(monthly, keys=["series"], k=3)
    rws = {(r["yr"], r["mon"]): r for r in out.collect()}
    # first two months of the record lack a full 3-month window
    assert (2000, 1) not in rws and (2000, 2) not in rws
    assert (2000, 3) in rws
    # July..September windows include the yr-dependent July value
    for mon in (7, 8, 9):
        ranks = [rws[(2000 + y, mon)]["rank"] for y in range(3)]
        assert ranks == [1, 2, 3]
        assert rws[(2000, mon)]["p"] == 0.25
        assert rws[(2002, mon)]["p"] == 0.75
        assert rws[(2000, mon)]["spi"] < 0 < rws[(2002, mon)]["spi"]
        assert abs(rws[(2000, mon)]["spi"]
                   + rws[(2002, mon)]["spi"]) < 1e-12
    # months whose window excludes July tie -> year breaks the tie
    assert [rws[(2000 + y, 12)]["rank"] for y in range(3)] == [1, 2, 3]
    # 3-month accumulation is exact
    assert rws[(2001, 9)]["precip_3mo"] == 310.0


def _rff_rows(spread_by_site=None):
    # 3 sites x 12 years; site s has mean 1000*(s+1) (differing index
    # floods) and identical RELATIVE spread unless spread_by_site
    # overrides it — L-moment ratios are scale-invariant, so equal
    # relative spread = a perfectly homogeneous region
    rows = []
    base = [-6, -4, -3, -1, 0, 1, 2, 3, 4, 5, 7, 9]  # zero-skew-ish
    for s in range(3):
        rel = (spread_by_site or {}).get(s, 0.02)
        for j, b in enumerate(base):
            mean = 1000.0 * (s + 1)
            rows.append((0, s, 2000 + j,
                         int(round(mean * (1 + rel * b) * 100))))
    return rows


def test_regional_homogeneity_flags_inflated_site(spark):
    from aquacache_spark.operators.trend import (
        regional_lmoment_homogeneity)

    schema = "region long, site long, yr int, mq long"
    homog = spark.createDataFrame(_rff_rows(), schema)
    h0 = regional_lmoment_homogeneity(homog, nsim=40).collect()[0]
    # identical scaled distributions -> observed dispersion is EXACTLY
    # zero -> H strictly negative (V below the simulated mean)
    assert h0["v_obs"] == 0.0
    assert h0["h_stat"] < 0.0
    assert not h0["possibly_heterogeneous"]
    # one site with 5x the relative spread -> dispersion >> simulated
    hetero = spark.createDataFrame(
        _rff_rows(spread_by_site={1: 0.10}), schema)
    h1 = regional_lmoment_homogeneity(hetero, nsim=40).collect()[0]
    assert h1["v_obs"] > 10 * max(h0["v_obs"], 1e-12)
    assert h1["h_stat"] > 2.0 and h1["definitely_heterogeneous"]
    assert h0["total_years"] == h1["total_years"] == 36
    assert h0["n_sites"] == 3


def test_regional_index_flood_scales_with_site_mean(spark):
    from aquacache_spark.operators.trend import regional_index_flood

    schema = "region long, site long, yr int, mq long"
    out = {r["site"]: r for r in regional_index_flood(
        spark.createDataFrame(_rff_rows(), schema)).collect()}
    # index flood = site mean annual max (de-quantized):
    # 1000*(s+1) * (1 + 0.02 * mean(base)), mean(base) = 17/12
    for s in range(3):
        expect = 1000.0 * (s + 1) * (1 + 0.02 * 17 / 12)
        assert abs(out[s]["index_flood"] - expect) < 0.01
    # homogeneous region: quantiles proportional to the index flood
    # (shared growth curve), and q100 > q10 > index flood
    r10 = [out[s]["q10"] / out[s]["index_flood"] for s in range(3)]
    r100 = [out[s]["q100"] / out[s]["index_flood"] for s in range(3)]
    assert max(r10) - min(r10) < 1e-12
    assert max(r100) - min(r100) < 1e-12
    assert r100[0] > r10[0] > 1.0


def test_regional_discordancy_invariant_and_flagging(spark):
    from aquacache_spark.operators.trend import regional_discordancy

    schema = "region long, site long, yr int, mq long"
    # 6 sites (critical value 1.648): five near-homogeneous + one with
    # a wildly different L-moment shape (huge spread, heavy skew).
    # The five background sites carry a small deterministic per-site
    # SHAPE jitter — five sites with bit-identical (t, t3, t4) vectors
    # would make A exactly singular (rank 1) and D degenerate, a
    # configuration real records never produce
    rows = []
    base = [-6, -4, -3, -1, 0, 1, 2, 3, 4, 5, 7, 9]
    for s in range(5):
        for j, b in enumerate(base):
            jit = 0.004 * ((s * 5 + j * 3) % 7 - 3)
            rows.append((0, s, 2000 + j,
                         int(round(1000.0 * (s + 1)
                                   * (1 + 0.02 * b + jit) * 100))))
    skewed = [100, 101, 102, 103, 104, 105, 106, 107, 108, 109, 110,
              400]  # one extreme outlier year -> high t, t3, t4
    for j, v in enumerate(skewed):
        rows.append((0, 5, 2000 + j, v * 100))
    out = regional_discordancy(
        spark.createDataFrame(rows, schema)).collect()
    by_site = {r["site"]: r for r in out}
    # exact-statistic invariant: sum of D_i over the region = n_sites
    assert abs(sum(r["d_stat"] for r in out) - 6.0) < 1e-6
    assert all(r["d_critical"] == 1.648 for r in out)
    # the shape outlier is the (only) discordant site
    assert by_site[5]["discordant"]
    assert by_site[5]["d_stat"] == max(r["d_stat"] for r in out)
    assert sum(r["discordant"] for r in out) == 1


def test_regional_discordancy_degenerate_region_not_flagged(spark):
    # bit-identical site L-moment vectors -> singular moment matrix
    # -> D undefined: d_stat must be NULL and discordant FALSE (an
    # unguarded quad/0 NaN would flag EVERY site in Spark's ordering),
    # leaving the region intact for the downstream H stage
    from aquacache_spark.operators.trend import (
        regional_discordancy, regional_screening_report)

    schema = "region long, site long, yr int, mq long"
    rows = [(0, s, 2000 + j, int(round(1000.0 * (s + 1) * (1 + 0.02 * b)
                                       * 100)))
            for s in range(5)
            for j, b in enumerate(
                [-6, -4, -3, -1, 0, 1, 2, 3, 4, 5, 7, 9])]
    df = spark.createDataFrame(rows, schema)
    out = regional_discordancy(df).collect()
    assert len(out) == 5
    assert all(r["d_stat"] is None for r in out)
    assert all(not r["discordant"] for r in out)
    rep = regional_screening_report(df, nsim=10).collect()[0]
    assert rep["n_sites_used"] == 5 and rep["n_discordant"] == 0


def test_gev_gamma_argument_reduction(spark):
    # r11 review fix: the bare lnGamma series degrades past |k|=0.5
    # and diverges past k=1; _gamma_1p reduces the argument via the
    # Gamma recurrence so every branch stays within ~1e-5 of the true
    # Gamma over the whole validity window (-0.9, 1.5]
    import math

    from pyspark.sql import functions as F

    from aquacache_spark.operators.trend import _gamma_1p

    ks = [-0.85, -0.6, -0.3, 0.0, 0.25, 0.5, 0.7, 1.0, 1.4, 1.5]
    df = spark.createDataFrame([(float(k),) for k in ks], "k double")
    out = {r["k"]: r["g"] for r in
           df.select("k", _gamma_1p(F.col("k")).alias("g")).collect()}
    for k in ks:
        true = math.gamma(1 + k)
        assert abs(out[k] - true) / true < 2e-5, (k, out[k], true)


def test_gev_quantiles_null_outside_validity(spark):
    # a region whose fitted k falls outside (-0.9, 1.5] must emit NULL
    # quantiles (not series garbage): t3_R ~ -0.62 gives k ~ 1.9.
    # Build 5 sites x 12 years whose annual maxima share one strongly
    # left-skewed shape (values quantized integers).
    from pyspark.sql import functions as F  # noqa: F401

    from aquacache_spark.operators.trend import regional_index_flood_gev

    vals = [100, 990, 995, 997, 998, 999, 1000, 1001, 1002, 1003,
            1005, 1006]
    rows = [("r", s, 2000 + y, v * 100 + s)  # tiny per-site offset
            for s in range(5) for y, v in enumerate(vals)]
    annual = spark.createDataFrame(
        rows, "region string, site long, yr int, mq long")
    out = regional_index_flood_gev(annual).collect()
    assert out, "no sites emitted"
    for r in out:
        if r["k_gev"] > 1.5 or r["k_gev"] <= -0.9:
            assert r["q10"] is None and r["q100"] is None, r
    # the fixture is engineered to actually land outside the window
    assert all(r["k_gev"] > 1.5 for r in out), out[0]["k_gev"]


def test_regional_h_driver_matches_iid_ground_truth(spark):
    """Behavioral pin for the H-statistic simulation driver (VERDICT
    r11 #1, the r2-minhash risk class): the simulated dispersion
    moments (mu_v, sigma_v) must match an iid-Gumbel Monte Carlo
    ground truth computed independently in numpy — the r11 Weyl
    driver ((k * 2654435761) mod 2^32 over consecutive year-ranks)
    was a low-discrepancy lattice whose mu_v/sigma_v came out ~3.5x
    TOO SMALL, inflating H by ~10 sigma on homogeneous regions while
    both engines agreed; this pin fails on that variant."""
    import numpy as np

    from aquacache_spark.operators.trend import (
        regional_lmoment_homogeneity)

    # homogeneous region: 12 sites x 30 years of genuinely iid Gumbel
    # annual maxima (seeded numpy), site index floods differing
    rng = np.random.default_rng(7)
    nsites, nyears = 12, 30
    rows = []
    for s in range(nsites):
        mean = 500.0 * (s + 1)
        draws = -np.log(-np.log(rng.random(nyears)))
        for j, y in enumerate(draws):
            rows.append((0, s, 2000 + j,
                         int(round(mean * (1.0 + 0.15 * y) * 1000))))
    annual = spark.createDataFrame(
        rows, "region long, site long, yr int, mq long")
    out = regional_lmoment_homogeneity(annual, nsim=40).collect()[0]

    # numpy iid Monte Carlo of the SAME procedure (sample L-CV via
    # unbiased PWMs, n-weighted dispersion) at the fitted t_R
    t_r = out["t_r"]
    gamma_e = 0.5772156649015329
    alpha = t_r / np.log(2.0)
    xi = 1.0 - gamma_e * alpha

    def lcv(x):
        x = np.sort(x)
        n = len(x)
        b0 = x.mean()
        b1 = (np.arange(n) * x).sum() / (n * (n - 1))
        return (2 * b1 - b0) / b0

    def vdisp(ts):
        tbar = ts.mean()          # equal n per site
        return np.sqrt(((ts - tbar) ** 2).mean())

    vs = []
    for _ in range(400):
        ts = np.array([
            lcv(xi + alpha * (-np.log(-np.log(rng.random(nyears)))))
            for _ in range(nsites)])
        vs.append(vdisp(ts))
    mu_ref, sd_ref = float(np.mean(vs)), float(np.std(vs, ddof=1))

    # nsim=40 estimate vs 400-rep ground truth: generous bands that
    # the 3.5x-degenerate variant cannot pass
    assert 0.6 * mu_ref < out["mu_v"] < 1.4 * mu_ref, (
        out["mu_v"], mu_ref)
    assert 0.4 * sd_ref < out["sigma_v"] < 2.2 * sd_ref, (
        out["sigma_v"], sd_ref)
    # and the homogeneous region must NOT be flagged
    assert abs(out["h_stat"]) < 3.0
    assert not out["definitely_heterogeneous"]


def test_low_flow_7q10_recovers_known_distribution(spark):
    """GROUND-TRUTH pin (not the DuckDB mirror): plant 200 annual
    minima drawn from a KNOWN reversed GEV by inverse CDF (each year
    is seven constant days, so the 7-day rolling annual min IS the
    planted value) and require the fitted 7Q10 to sit near the true
    0.1 quantile and the shape near the true k."""
    import datetime as dt
    import math
    import random

    from aquacache_spark.operators.trend import low_flow_gev_fit

    xi, alpha, k = 100.0, 20.0, 0.1
    rng = random.Random(77)
    rows = []
    true_qy = xi + alpha * (1.0 - (-math.log(0.9)) ** k) / k
    for yr in range(200):
        u = rng.random()
        y = xi + alpha * (1.0 - (-math.log(u)) ** k) / k
        x = -y   # minima series value (negative, below the shoulders)
        # 6 TRAILING shoulder days at 0 isolate the planted block:
        # row-based windows legitimately span year boundaries (a
        # drought can straddle Dec 31), so each year must END with
        # shoulders — any window mixing a shoulder day averages above
        # the (negative) x, hence the annual minimum IS the planted x
        for day in range(7):
            rows.append(("s", dt.date(1800 + yr, 6, 1)
                         + dt.timedelta(days=day), x))
        for day in range(6):
            rows.append(("s", dt.date(1800 + yr, 6, 8)
                         + dt.timedelta(days=day), 0.0))
    daily = spark.createDataFrame(
        rows, "series string, date date, value double")
    r = low_flow_gev_fit(daily, ["series"]).collect()[0]
    assert r["n_years"] == 200
    true_q = -true_qy
    assert r["q_low"] is not None
    # n=200 L-moment sampling error: generous 4-sigma-ish bands
    # (the same seed's faithful pure-Python fit gives q_y = 144.1
    # vs true 140.3; the operator must land on the SAMPLE's fit)
    assert abs(r["q_low"] - true_q) < 8.0, (r["q_low"], true_q)
    assert abs(r["k_gev"] - k) < 0.15, r["k_gev"]
    assert abs(r["mean_low"] - (-(xi + alpha * (1 - math.gamma(1 + k))
                                  / k))) < 5.0


def test_drought_spells_closed_form(spark):
    """Run-theory closed form: a 10-day series with two planted
    below-threshold runs -> two spells with exact durations and
    integer deficits; boundary days AT the threshold do not count
    (strictly below)."""
    import datetime as dt

    from aquacache_spark.operators.trend import drought_spells

    d0 = dt.date(2001, 1, 1)
    # values: threshold = value at rank ceil(0.1*10)=1 of sorted ->
    # the minimum... so use a wider series where Q90 is meaningful:
    # 20 days, sorted rank ceil(0.1*20)=2 -> 2nd smallest = 3.0
    vals = [10.0] * 20
    vals[4] = 1.0   # the only value strictly below the threshold
    vals[5] = 2.0   # becomes the threshold itself (2nd smallest)
    vals[10] = 3.0  # above the threshold
    vals[15] = 2.5  # above the threshold
    rows = [("s", d0 + dt.timedelta(days=i), v)
            for i, v in enumerate(vals)]
    daily = spark.createDataFrame(
        rows, "series string, date date, value double")
    out = drought_spells(daily, ["series"]).collect()
    got = [(r["spell_id"], r["start_date"], r["end_date"],
            r["duration_days"], round(r["deficit"], 6)) for r in out]
    # threshold = 2nd smallest = 2.0? sorted: [1.0, 2.0, 2.5, 3.0,
    # 10.0 x16] -> rank 2 = 2.0; strictly below 2.0 -> only day 5
    assert got == [(1, d0 + dt.timedelta(days=4),
                    d0 + dt.timedelta(days=4), 1, 1.0)], got
