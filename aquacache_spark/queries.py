"""Query registry: every SURVEY.md §2 operator as a (Spark plan, DuckDB
oracle SQL) pair over the driver's parquet tables.

Determinism conventions (these make the driver's order-insensitive
value-hash reproducible across engines and partition layouts):

- Rounding is the explicit idiom ``floor(v * 10^n + 0.5) / 10^n`` on
  BOTH sides — engine ``round()`` implementations disagree on exact
  half-way doubles, this formula cannot.
- Sums/means over many doubles accumulate through an exact DECIMAL and
  cast back to double, so results do not depend on accumulation order
  (partition count, AQE coalescing) — see operators/daily.py.
- Percentiles are exact (``percentile`` / ``quantile_cont``), never
  approximate.
- ``events.ts`` is nanosecond-precision parquet; both sides truncate to
  microseconds (see catalog.table).

Table roles: ``events`` (ts, user_id, event_type, value) plays the
continuous-measurement fact (event_type ≈ series key for QC operators);
``orders`` is the multi-year fact for day-of-year history; ``documents``
/ ``embeddings`` feed the training-data operators.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import catalog
from .session import local_df as _ldf
from .operators.corrections import Correction, apply_corrections
from .operators.daily import daily_rollup
from .operators.doy import doy_stats

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog.table(spark, sf_dir, name)


def _round(df: DataFrame, cols: dict[str, int]) -> DataFrame:
    """Deterministic half-up rounding: floor(v*10^n + 0.5)/10^n."""
    for c, n in cols.items():
        scale = float(10**n)
        df = df.withColumn(
            c, F.floor(F.col(c).cast("double") * scale + F.lit(0.5)) / scale
        )
    return df


def _exact_sum_col(col: str):
    """Order-independent double sum (see operators/daily.exact_sum):
    partition-merge order perturbs a raw float sum in the last ulps,
    which can flip the rounding quantum vs the single-threaded oracle."""
    from .operators.daily import exact_sum

    return exact_sum(F.col(col))


def _exact_mean_of(col):
    """Order-independent mean of a double expression (micro-quantized);
    see _exact_sum_col."""
    from .operators.daily import exact_mean

    return exact_mean(col)


def R(expr: str, n: int) -> str:
    """The same deterministic rounding idiom, as oracle SQL text."""
    return f"floor(({expr}) * {10**n} + 0.5) / {10**n}"


def DSUM(col: str) -> str:
    """Order-independent exact sum in DuckDB (matches
    operators/daily.py exact_sum): integer micro-unit accumulation,
    exact for values with <= 6 decimals."""
    return f"sum(CAST(floor(({col}) * 1000000 + 0.5) AS BIGINT)) / 1000000.0"


# ---------------------------------------------------------------------------
# §2.3 + §2.5: scan -> filter -> project -> grouped aggregation (TPC-H Q1
# shape). Reference analog: time-window filter + grouped daily statistics
# (inst/patches/patch_53.R:1732-1736; patch_48.R:326-390).
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {R(DSUM('l_quantity'), 2)}                                   AS sum_qty,
           {R(DSUM('l_extendedprice'), 2)}                              AS sum_base_price,
           {R(DSUM('l_extendedprice * (1 - l_discount)'), 2)}           AS sum_disc_price,
           {R(DSUM('l_quantity') + ' / count(*)', 4)}                   AS avg_qty,
           {R(DSUM('l_extendedprice') + ' / count(*)', 4)}              AS avg_price,
           {R(DSUM('l_discount') + ' / count(*)', 4)}                   AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.daily import exact_sum as dsum

    li = _t(spark, sf_dir, "lineitem")

    n = F.count(F.lit(1))
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            (dsum(F.col("l_quantity")) / n).alias("avg_qty"),
            (dsum(F.col("l_extendedprice")) / n).alias("avg_price"),
            (dsum(F.col("l_discount")) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )
    return _round(
        out,
        {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2,
         "avg_qty": 4, "avg_price": 4, "avg_disc": 4},
    )


# ---------------------------------------------------------------------------
# §2.5 daily rollup with aggregation-type dispatch (patch_48.R:326-390)
# ---------------------------------------------------------------------------

_DAILY_ROLLUP_ORACLE = f"""
    SELECT event_type,
           CAST(ts AS DATE)                          AS date,
           {R(DSUM('value') + ' / count(value)', 4)} AS value,
           {R('min(value)', 4)}                      AS min,
           {R('max(value)', 4)}                      AS max,
           {R(DSUM('value') + ' / count(value)', 4)} AS mean,
           count(value)                              AS count
    FROM events
    GROUP BY event_type, CAST(ts AS DATE)
    HAVING count(value) > 0
"""


@register("daily_rollup", oracle=_DAILY_ROLLUP_ORACLE)
def daily_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = daily_rollup(
        ev, keys=["event_type"], dt_col="ts", value_col="value", agg_type="mean"
    )
    return _round(out, {"value": 4, "min": 4, "max": 4, "mean": 4})


# Named-timezone daily bucketing with real DST arithmetic
# (patch_48.R timezone_daily_calc generalized beyond integer offsets):
# events are spread across the year so both America/Vancouver
# transitions (spring-forward/fall-back) land inside the data, and the
# local-day bucket must agree with DuckDB's ICU zone rules.
_TZ_DAILY_ORACLE = f"""
    WITH ev AS (
      SELECT event_type,
             CAST(ts AS TIMESTAMP)
               + to_days(CAST(event_id % 300 AS INT)) AS dt,
             value
      FROM events
    ), local AS (
      SELECT event_type,
             timezone('America/Vancouver', timezone('UTC', dt)) AS ldt,
             value
      FROM ev
    )
    SELECT event_type,
           CAST(ldt AS DATE)                         AS date,
           {R(DSUM('value') + ' / count(value)', 4)} AS value,
           {R('min(value)', 4)}                      AS min,
           {R('max(value)', 4)}                      AS max,
           {R(DSUM('value') + ' / count(value)', 4)} AS mean,
           count(value)                              AS count
    FROM local
    GROUP BY event_type, CAST(ldt AS DATE)
    HAVING count(value) > 0
"""


@register("tz_daily_rollup_dst", oracle=_TZ_DAILY_ORACLE)
def tz_daily_rollup_dst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """daily_rollup(tz='America/Vancouver'): named-zone local days via
    the JVM tz database (from_utc_timestamp), exercised across both
    DST transitions."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.timestamp_add(
            "DAY", (F.col("event_id") % 300).cast("int"), F.col("ts")
        ).alias("dt"),
        "value",
    )
    out = daily_rollup(
        ev, keys=["event_type"], dt_col="dt", value_col="value",
        agg_type="mean", tz="America/Vancouver",
    )
    return _round(out, {"value": 4, "min": 4, "max": 4, "mean": 4})


_DAILY_MEDIAN_ORACLE = f"""
    SELECT event_type,
           CAST(ts AS DATE)                          AS date,
           {R('quantile_cont(value, 0.5)', 4)}       AS value,
           {R('min(value)', 4)}                      AS min,
           {R('max(value)', 4)}                      AS max,
           {R(DSUM('value') + ' / count(value)', 4)} AS mean,
           count(value)                              AS count
    FROM events
    GROUP BY event_type, CAST(ts AS DATE)
    HAVING count(value) > 0
"""


@register("daily_rollup_median", oracle=_DAILY_MEDIAN_ORACLE)
def daily_rollup_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = daily_rollup(
        ev, keys=["event_type"], dt_col="ts", value_col="value", agg_type="median"
    )
    return _round(out, {"value": 4, "min": 4, "max": 4, "mean": 4})


# ---------------------------------------------------------------------------
# §2.11 corrections chain: ordered per-row transform fold
# (inst/patches/patch_55.R:345-455; fast-path patch_53.R:1871-1936)
# ---------------------------------------------------------------------------

EVENT_CORRECTIONS = [
    Correction(1, "error", "2024-01-01 00:00:00", "2024-02-01 00:00:00", "trim",
               value1=5.0, value2=45.0),
    Correction(2, "click", "2024-01-05 00:00:00", "2024-01-10 00:00:00",
               "offset_linear", value1=0.25),
    Correction(3, "view", "2024-01-03 00:00:00", "2024-01-08 00:00:00",
               "offset_two_point", value1=1.0, value2=3.0),
    Correction(4, "purchase", "2024-01-10 00:00:00", "2024-01-20 00:00:00",
               "scale", value1=110.0),
    Correction(5, "signup", "2024-01-02 00:00:00", "2024-01-12 00:00:00",
               "drift_linear", value1=2.5, timestep_window_seconds=86400.0),
    Correction(6, "view", "2024-01-15 00:00:00", "2024-01-20 00:00:00",
               "drift_equation",
               equation="value * 1.01 + ln(1 + elapsed_seconds / 86400.0)"),
    Correction(7, "click", "2024-01-05 00:00:00", "2024-01-10 00:00:00",
               "scale", value1=95.0),
]

_CORRECTIONS_ORACLE = f"""
    WITH c1 AS (  -- trim [5,45] on error (priority 2)
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
             CASE WHEN event_type = 'error'
                       AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
                       AND (value < 5.0 OR value > 45.0)
                  THEN NULL ELSE value END AS v
      FROM events
    ), c2 AS (   -- offset +0.25 on click (priority 3)
      SELECT event_id, ts, user_id, event_type,
             CASE WHEN event_type = 'click' AND v IS NOT NULL
                       AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-10'
                  THEN v + 0.25 ELSE v END AS v
      FROM c1
    ), c3 AS (   -- two-point offset 1->3 on view (priority 4)
      SELECT event_id, ts, user_id, event_type,
             CASE WHEN event_type = 'view' AND v IS NOT NULL
                       AND ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-08'
                  THEN v + 1.0 + (3.0 - 1.0)
                       * date_diff('second', TIMESTAMP '2024-01-03', ts)
                       / date_diff('second', TIMESTAMP '2024-01-03', TIMESTAMP '2024-01-08')
                  ELSE v END AS v
      FROM c2
    ), c4 AS (   -- scale 110% on purchase (priority 5)
      SELECT event_id, ts, user_id, event_type,
             CASE WHEN event_type = 'purchase' AND v IS NOT NULL
                       AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
                  THEN v * 110.0 / 100.0 ELSE v END AS v
      FROM c3
    ), c5 AS (   -- drift +2.5/day on signup (priority 6)
      SELECT event_id, ts, user_id, event_type,
             CASE WHEN event_type = 'signup' AND v IS NOT NULL
                       AND ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-12'
                  THEN v + 2.5 / 86400.0
                       * date_diff('second', TIMESTAMP '2024-01-02', ts)
                  ELSE v END AS v
      FROM c4
    ), c7 AS (   -- scale 95% on click (same window as c2; ordered by id)
      SELECT event_id, ts, user_id, event_type,
             CASE WHEN event_type = 'click' AND v IS NOT NULL
                       AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-10'
                  THEN v * 95.0 / 100.0 ELSE v END AS v
      FROM c5
    ), c6 AS (   -- drift equation on view (priority 7: runs after scale)
      SELECT event_id, ts, user_id, event_type,
             CASE WHEN event_type = 'view' AND v IS NOT NULL
                       AND ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-20'
                  THEN v * 1.01
                       + ln(1 + date_diff('second', TIMESTAMP '2024-01-15', ts) / 86400.0)
                  ELSE v END AS v
      FROM c7
    )
    SELECT event_id, event_type, ts, {R('v', 4)} AS corrected_value
    FROM c6
"""


@register("corrections_chain", oracle=_CORRECTIONS_ORACLE)
def corrections_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = apply_corrections(
        ev,
        EVENT_CORRECTIONS,
        ts_col="event_type",
        dt_col="ts",
        value_col="value",
        out_col="corrected_value",
    )
    return _round(
        out.select("event_id", "event_type", "ts", "corrected_value"),
        {"corrected_value": 4},
    )


# ---------------------------------------------------------------------------
# §2.5 DOY historical stats + percent_historic_range
# (inst/patches/patch_48.R:416-511), DOY normalization patch_41.R:2471-2492
# ---------------------------------------------------------------------------

_DOY_ORACLE = f"""
    WITH daily AS (
      SELECT o_orderpriority AS priority,
             CAST(o_orderdate AS DATE) AS date,
             sum(CAST(floor(o_totalprice * 1000000 + 0.5) AS BIGINT))
               / 1000000.0 AS value
      FROM orders
      GROUP BY 1, 2
    ), dd AS (
      SELECT *,
             CAST(CASE
               WHEN month(date) = 2 AND day(date) = 29 THEN NULL
               WHEN (year(date) % 4 = 0 AND (year(date) % 100 <> 0 OR year(date) % 400 = 0))
                    AND dayofyear(date) > 60 THEN dayofyear(date) - 1
               ELSE dayofyear(date) END AS INTEGER) AS doy
      FROM daily
    ), joined AS (
      SELECT t.priority, t.date, t.value, t.doy,
             count(h.value)                          AS doy_count,
             min(h.value)                            AS hist_min,
             max(h.value)                            AS hist_max,
             sum(CAST(floor(h.value * 1000000 + 0.5) AS BIGINT))
               / 1000000.0 / count(h.value) AS hist_mean,
             quantile_cont(h.value, 0.10)            AS q10,
             quantile_cont(h.value, 0.25)            AS q25,
             quantile_cont(h.value, 0.50)            AS q50,
             quantile_cont(h.value, 0.75)            AS q75,
             quantile_cont(h.value, 0.90)            AS q90
      FROM dd t
      LEFT JOIN dd h
        ON t.priority = h.priority AND t.doy = h.doy AND h.date < t.date
      GROUP BY t.priority, t.date, t.value, t.doy
    )
    SELECT priority, date, {R('value', 4)} AS value, doy, doy_count,
           {R('hist_min', 4)} AS hist_min, {R('hist_max', 4)} AS hist_max,
           {R('hist_mean', 4)} AS hist_mean,
           {R('q10', 4)} AS q10, {R('q25', 4)} AS q25, {R('q50', 4)} AS q50,
           {R('q75', 4)} AS q75, {R('q90', 4)} AS q90,
           {R('CASE WHEN doy_count > 1 AND doy IS NOT NULL '
              'THEN (value - hist_min) / nullif(hist_max - hist_min, 0) * 100.0 END', 4)}
               AS percent_historic_range
    FROM joined
"""


@register("doy_historic_stats", oracle=_DOY_ORACLE)
def doy_historic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.to_date("o_orderdate").alias("date"),
        )
        .agg(_exact_sum_col("o_totalprice").alias("value"))
    )
    out = doy_stats(daily, keys=["priority"], date_col="date",
                    value_col="value", exact_hist_mean=True)
    return _round(
        out,
        {"value": 4, "hist_min": 4, "hist_max": 4, "hist_mean": 4,
         "q10": 4, "q25": 4, "q50": 4, "q75": 4, "q90": 4,
         "percent_historic_range": 4},
    )


# ---------------------------------------------------------------------------
# §2.5 DOY 30-year-window variant (patch_48.R:463-494; 3-year window
# here so the 6.5-year orders span actually truncates history)
# ---------------------------------------------------------------------------

_DOY_30YR_ORACLE = f"""
    WITH daily AS (
      SELECT o_orderpriority AS priority,
             CAST(o_orderdate AS DATE) AS date,
             sum(CAST(floor(o_totalprice * 1000000 + 0.5) AS BIGINT))
               / 1000000.0 AS value
      FROM orders
      GROUP BY 1, 2
    ), dd AS (
      SELECT *,
             CAST(CASE
               WHEN month(date) = 2 AND day(date) = 29 THEN NULL
               WHEN (year(date) % 4 = 0 AND (year(date) % 100 <> 0 OR year(date) % 400 = 0))
                    AND dayofyear(date) > 60 THEN dayofyear(date) - 1
               ELSE dayofyear(date) END AS INTEGER) AS doy
      FROM daily
    ), joined AS (
      SELECT t.priority, t.date, t.value, t.doy,
             count(h.value)               AS doy_count,
             min(h.value)                 AS hist_min,
             max(h.value)                 AS hist_max,
             sum(CAST(floor(h.value * 1000000 + 0.5) AS BIGINT))
               / 1000000.0 / count(h.value) AS hist_mean,
             quantile_cont(h.value, 0.50) AS q50
      FROM dd t
      LEFT JOIN dd h
        ON t.priority = h.priority AND t.doy = h.doy AND h.date < t.date
       AND h.date >= t.date - INTERVAL 36 MONTH
      GROUP BY t.priority, t.date, t.value, t.doy
    )
    SELECT priority, date, {R('value', 4)} AS value, doy, doy_count,
           {R('hist_min', 4)} AS hist_min, {R('hist_max', 4)} AS hist_max,
           {R('hist_mean', 4)} AS hist_mean, {R('q50', 4)} AS q50
    FROM joined
"""


@register("doy_stats_30yr_window", oracle=_DOY_30YR_ORACLE)
def doy_stats_30yr_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.to_date("o_orderdate").alias("date"),
        )
        .agg(_exact_sum_col("o_totalprice").alias("value"))
    )
    out = doy_stats(daily, keys=["priority"], date_col="date",
                    value_col="value", years_window=3,
                    exact_hist_mean=True)
    out = out.select("priority", "date", "value", "doy", "doy_count",
                     "hist_min", "hist_max", "hist_mean", "q50")
    return _round(out, {"value": 4, "hist_min": 4, "hist_max": 4,
                        "hist_mean": 4, "q50": 4})


# ---------------------------------------------------------------------------
# §2.5 Feb-29 smoothing (patch_48.R:604-686): leap-day stats from the
# average of Feb-28/Mar-1 neighbors, LEAST of counts
# ---------------------------------------------------------------------------

_FEB29_ORACLE = f"""
    WITH daily AS (
      SELECT o_orderpriority AS priority,
             CAST(o_orderdate AS DATE) AS date,
             sum(CAST(floor(o_totalprice * 1000000 + 0.5) AS BIGINT))
               / 1000000.0 AS value
      FROM orders
      GROUP BY 1, 2
    ), dd AS (
      SELECT *,
             CAST(CASE
               WHEN month(date) = 2 AND day(date) = 29 THEN NULL
               WHEN (year(date) % 4 = 0 AND (year(date) % 100 <> 0 OR year(date) % 400 = 0))
                    AND dayofyear(date) > 60 THEN dayofyear(date) - 1
               ELSE dayofyear(date) END AS INTEGER) AS doy
      FROM daily
    ), joined AS (
      SELECT t.priority, t.date, t.value, t.doy,
             count(h.value)               AS doy_count,
             min(h.value)                 AS hist_min,
             max(h.value)                 AS hist_max,
             sum(CAST(floor(h.value * 1000000 + 0.5) AS BIGINT))
               / 1000000.0 / count(h.value) AS hist_mean,
             quantile_cont(h.value, 0.50) AS q50
      FROM dd t
      LEFT JOIN dd h
        ON t.priority = h.priority AND t.doy = h.doy AND h.date < t.date
      GROUP BY t.priority, t.date, t.value, t.doy
    ), final AS (
      SELECT * FROM joined WHERE NOT (month(date) = 2 AND day(date) = 29)
      UNION ALL
      SELECT l.priority, l.date, l.value, l.doy,
             least(p.doy_count, n.doy_count) AS doy_count,
             (p.hist_min + n.hist_min) / 2.0 AS hist_min,
             (p.hist_max + n.hist_max) / 2.0 AS hist_max,
             (p.hist_mean + n.hist_mean) / 2.0 AS hist_mean,
             (p.q50 + n.q50) / 2.0 AS q50
      FROM joined l
      LEFT JOIN joined p ON p.priority = l.priority AND p.date = l.date - 1
      LEFT JOIN joined n ON n.priority = l.priority AND n.date = l.date + 1
      WHERE month(l.date) = 2 AND day(l.date) = 29
    )
    SELECT priority, date, {R('value', 4)} AS value, doy, doy_count,
           {R('hist_min', 4)} AS hist_min, {R('hist_max', 4)} AS hist_max,
           {R('hist_mean', 4)} AS hist_mean, {R('q50', 4)} AS q50
    FROM final
"""


@register("doy_feb29_smoothed", oracle=_FEB29_ORACLE)
def doy_feb29_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.doy import feb29_smooth

    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.to_date("o_orderdate").alias("date"),
        )
        .agg(_exact_sum_col("o_totalprice").alias("value"))
    )
    stats = doy_stats(daily, keys=["priority"], date_col="date",
                      value_col="value", exact_hist_mean=True)
    stats = stats.select("priority", "date", "value", "doy", "doy_count",
                         "hist_min", "hist_max", "hist_mean", "q50")
    # feb29_smooth joins stats against itself twice (Feb-28 / Mar-1
    # neighbors); a barrier stops each leg re-deriving the DOY chain
    stats = stats.persist()
    out = feb29_smooth(stats, keys=["priority"])
    return _round(out, {"value": 4, "hist_min": 4, "hist_max": 4,
                        "hist_mean": 4, "q50": 4})


# ---------------------------------------------------------------------------
# §2.4 as-of join with tolerance, 1:1 mutual-nearest
# (inst/patches/patch_53.R:1216-1256)
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
    WITH l AS (
      SELECT event_id AS lid, user_id, CAST(ts AS TIMESTAMP) AS lts, value AS lv
      FROM events WHERE event_type = 'click'
    ), r AS (
      SELECT event_id AS rid, user_id, CAST(ts AS TIMESTAMP) AS rts, value AS rv
      FROM events WHERE event_type = 'view'
    ), cand AS (
      SELECT l.user_id, l.lid, l.lts, l.lv, r.rid, r.rv,
             abs(epoch_us(l.lts) - epoch_us(r.rts)) AS d
      FROM l JOIN r ON l.user_id = r.user_id
       AND abs(epoch_us(l.lts) - epoch_us(r.rts)) <= 600 * 1000000
    ), ranked AS (
      SELECT *,
        row_number() OVER (PARTITION BY user_id, lid ORDER BY d, rid) AS ar,
        row_number() OVER (PARTITION BY user_id, rid ORDER BY d, lid) AS mr
      FROM cand
    ), pairs AS (
      SELECT user_id, lid, rid, rv FROM ranked WHERE ar = 1 AND mr = 1
    )
    SELECT l.lid AS event_id, l.user_id, l.lts AS ts, l.lv AS value,
           p.rid AS match_event_id, p.rv AS right_value
    FROM l LEFT JOIN pairs p ON l.user_id = p.user_id AND l.lid = p.lid
"""


@register("asof_join_1to1", oracle=_ASOF_ORACLE)
def asof_join_1to1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, views, keys=["user_id"], left_ts="ts", right_ts="ts",
        left_id="event_id", right_id="event_id", tolerance_seconds=600,
        one_to_one=True, right_cols=["value"],
    )
    return out.select("event_id", "user_id", "ts", "value",
                      "match_event_id", "right_value")


# ---------------------------------------------------------------------------
# §2.5 resample: dense bin spine + per-bin stats (patch_53.R:2024-2085)
# ---------------------------------------------------------------------------

_RESAMPLE_ORACLE = f"""
    WITH b AS (
      SELECT event_type,
             TIMESTAMP '1970-01-01'
               + CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 21600) * 21600 AS BIGINT)
                 * INTERVAL 1 SECOND                         AS bin_start,
             count(*)                                        AS n,
             {R('min(value)', 4)}                            AS min,
             {R('max(value)', 4)}                            AS max,
             {R(DSUM('value') + ' / count(value)', 4)}       AS mean,
             {R('quantile_cont(value, 0.5)', 4)}             AS median
      FROM events
      GROUP BY 1, 2
    ), bounds AS (
      SELECT event_type, min(bin_start) AS lo, max(bin_start) AS hi FROM b GROUP BY 1
    ), spine AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 21600 SECOND)) AS bin_start
      FROM bounds
    )
    SELECT s.event_type, s.bin_start, b.n, b.min, b.max, b.mean, b.median
    FROM spine s LEFT JOIN b ON s.event_type = b.event_type AND s.bin_start = b.bin_start
"""


@register("resample_6h_dense", oracle=_RESAMPLE_ORACLE)
def resample_6h_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.resample import resample

    ev = _t(spark, sf_dir, "events")
    out = resample(ev, keys=["event_type"], dt_col="ts", value_col="value",
                   seconds=21600, dense=True)
    return _round(out, {"min": 4, "max": 4, "mean": 4, "median": 4})


# ---------------------------------------------------------------------------
# §2.6 run-length segmentation (R/adjust_functions.R:585-595)
# ---------------------------------------------------------------------------

_RLE_ORACLE = """
    WITH flagged AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN event_type IS DISTINCT FROM
                       lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS chg
      FROM events
    ), runs AS (
      SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS seg
      FROM flagged
    )
    SELECT user_id, event_type, min(ts) AS start, max(ts) AS "end",
           count(*) AS n
    FROM runs GROUP BY user_id, event_type, seg
"""


@register("rle_segments", oracle=_RLE_ORACLE)
def rle_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.segments import rle_segments

    ev = _t(spark, sf_dir, "events")
    return rle_segments(
        ev, keys=["user_id"], order_col=["ts", "event_id"], value_col="event_type"
    )


# ---------------------------------------------------------------------------
# Gap-based sessionization via Spark's native session_window (the
# dynamic-gap analog of the RLE/segment family; in a training-data
# pipeline: user/crawl session assembly before per-session features).
# Spark merges events whose [ts, ts+gap) windows OVERLAP, so a gap of
# EXACTLY 30 minutes starts a new session (>=, not >, in the oracle).
# One shuffle on user_id; the session assembly is a single
# aggregation, no self-join.
# ---------------------------------------------------------------------------

_SESSION_ORACLE = """
    WITH m AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS nb
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT user_id, ts,
             sum(nb) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
"""


@register("event_sessionization", oracle=_SESSION_ORACLE)
def event_sessionization_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user over the event stream."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", "30 minutes").alias("win"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


# Per-user session features on top of the session assembly: the
# engagement profile (session counts, exact-summed active seconds,
# busiest session) — sessionization COMPOSED with aggregation. Active
# seconds = last-minus-first event per session (integer epoch diff,
# exact), not the gap-padded window end.
_SESSION_FEATURES_ORACLE = """
    WITH m AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS nb
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT user_id, ts,
             sum(nb) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    ), sess AS (
      SELECT user_id, sid,
             CAST(count(*) AS BIGINT) AS n_events,
             (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
               AS active_seconds
      FROM s GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS total_events,
           CAST(sum(active_seconds) AS BIGINT) AS total_active_seconds,
           CAST(max(n_events) AS BIGINT) AS busiest_session_events
    FROM sess GROUP BY 1
"""


@register("session_features", oracle=_SESSION_FEATURES_ORACLE)
def session_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user engagement profile from 30-minute-gap sessions —
    two partial-aggregable groupBys on the same user key (the second
    shuffle is AQE-coalesced), all-integer arithmetic."""
    ev = _t(spark, sf_dir, "events")
    sess = (
        ev.groupBy(
            "user_id",
            F.session_window("ts", "30 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.expr("(unix_micros(max(ts)) - unix_micros(min(ts)))"
                   " div 1000000").alias("active_seconds"),
        )
    )
    return sess.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("total_events"),
        F.sum("active_seconds").cast("long")
        .alias("total_active_seconds"),
        F.max("n_events").cast("long").alias("busiest_session_events"),
    )


# ---------------------------------------------------------------------------
# §2.6 forward/backward fill (R/calculate_period.R:132-135)
# ---------------------------------------------------------------------------

_FFILL_ORACLE = """
    WITH masked AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id, user_id, ts,
           coalesce(
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING),
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           ) AS filled_value
    FROM masked
"""


@register("ffill_bfill", oracle=_FFILL_ORACLE)
def ffill_bfill_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.gaps import ffill_bfill

    ev = _t(spark, sf_dir, "events")
    masked = ev.select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    out = ffill_bfill(masked, keys=["user_id"], order_col=["ts", "event_id"],
                      value_col="v", out_col="filled_value")
    return out.select("event_id", "user_id", "ts", "filled_value")


# ---------------------------------------------------------------------------
# §2.7 top-k per group (ORDER BY … LIMIT patterns, R/adjust_functions.R:551-560)
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
"""


@register("topk_per_group", oracle=_TOPK_ORACLE)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
    )


# ---------------------------------------------------------------------------
# §2.4 multi-dim broadcast join chain (code-table lookups,
# R/getNewContinuous.R:131; patch_48.R:243-246)
# ---------------------------------------------------------------------------

_REGION_REVENUE_ORACLE = f"""
    SELECT r_name,
           {R(DSUM('o_totalprice'), 2)} AS revenue,
           count(*)                     AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE c_acctbal > 0
    GROUP BY r_name
"""


@register("region_revenue", oracle=_REGION_REVENUE_ORACLE)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0)
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    from .operators.daily import exact_sum

    out = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            exact_sum(F.col("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    return _round(out, {"revenue": 2})


# ---------------------------------------------------------------------------
# §2.4 anti join (NOT EXISTS guards, patch_48.R:256-263) — customers with
# no orders in a window
# ---------------------------------------------------------------------------

_ANTI_ORACLE = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    )
"""


@register("customers_without_recent_orders", oracle=_ANTI_ORACLE)
def customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# §2.4 compound timeseries: priority fallback (patch_53.R:899-948) and
# expression compound (patch_53.R:1273-1294) over hourly member series
# ---------------------------------------------------------------------------

_HOURLY_MEMBER = (
    "SELECT TIMESTAMP '1970-01-01' + CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) "
    "* 3600 AS BIGINT) * INTERVAL 1 SECOND AS datetime, "
    + "sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) / 1000000.0"
    " / count(value) AS value "
    "FROM events WHERE event_type = '{etype}' GROUP BY 1"
)

_PRIORITY_COALESCE_ORACLE = f"""
    WITH purchase AS ({_HOURLY_MEMBER.format(etype="purchase")}),
    click AS ({_HOURLY_MEMBER.format(etype="click")}),
    view_m AS ({_HOURLY_MEMBER.format(etype="view")}),
    u AS (
      SELECT datetime, value, 1 AS prio, 'primary' AS alias FROM purchase
      UNION ALL
      SELECT datetime, value, 2 AS prio, 'backup' AS alias FROM click
        WHERE datetime >= TIMESTAMP '2024-01-15 00:00:00'
      UNION ALL
      SELECT datetime, value, 3 AS prio, 'tertiary' AS alias FROM view_m
    )
    SELECT datetime, {R('value', 4)} AS value, alias AS source_alias
    FROM (
      SELECT *, row_number() OVER (PARTITION BY datetime ORDER BY prio, alias) AS rn
      FROM u WHERE value IS NOT NULL
    ) WHERE rn = 1
"""


def _hourly_member(spark: SparkSession, sf_dir: str, etype: str) -> DataFrame:
    from .operators.resample import resample

    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == etype)
    return resample(ev, keys=[], dt_col="ts", value_col="value",
                    seconds=3600, dense=False).select(
        F.col("bin_start").alias("datetime"), F.col("mean").alias("value")
    )


@register("compound_priority_coalesce", oracle=_PRIORITY_COALESCE_ORACLE)
def compound_priority_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.compound import Member, priority_coalesce

    out = priority_coalesce(
        [
            Member("primary", _hourly_member(spark, sf_dir, "purchase"), 1),
            Member("backup", _hourly_member(spark, sf_dir, "click"), 2,
                   use_from="2024-01-15 00:00:00"),
            Member("tertiary", _hourly_member(spark, sf_dir, "view"), 3),
        ],
        dt_col="datetime",
        value_col="value",
    )
    return _round(out, {"value": 4})


_EXPR_COMPOUND_ORACLE = f"""
    WITH temp_m AS ({_HOURLY_MEMBER.format(etype="view")}),
    cond_m AS ({_HOURLY_MEMBER.format(etype="click")})
    SELECT t.datetime,
           {R('c.value / (1 + 0.0191 * (t.value - 25))', 4)} AS value,
           {R('t.value', 4)} AS temp, {R('c.value', 4)} AS cond
    FROM temp_m t JOIN cond_m c ON t.datetime = c.datetime
"""


@register("compound_expression", oracle=_EXPR_COMPOUND_ORACLE)
def compound_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.compound import Member, expression_compound

    out = expression_compound(
        [
            Member("temp", _hourly_member(spark, sf_dir, "view"), 1),
            Member("cond", _hourly_member(spark, sf_dir, "click"), 1),
        ],
        expression="cond / (1 + 0.0191 * (temp - 25))",
        dt_col="datetime",
        value_col="value",
    )
    return _round(out, {"value": 4, "temp": 4, "cond": 4})


# ---------------------------------------------------------------------------
# §2.12 sync reconciliation: full-outer null-safe diff + MERGE actions
# (R/synchronize_continuous.R:566-742)
# ---------------------------------------------------------------------------

_RECONCILE_ORACLE = """
    WITH local AS (
      SELECT event_id, value,
             (event_id % 11 = 0) AS no_update
      FROM events
    ), remote AS (
      SELECT event_id,
             CASE WHEN event_id % 5 = 0 THEN value * 1.01 ELSE value END AS value
      FROM events WHERE event_id % 7 <> 0
      UNION ALL
      SELECT event_id + 10000000 AS event_id, value
      FROM events WHERE event_id % 13 = 0
    )
    SELECT coalesce(l.event_id, r.event_id) AS event_id,
           CASE
             WHEN l.no_update THEN 'unchanged'
             WHEN l.event_id IS NULL THEN 'insert'
             WHEN r.event_id IS NULL THEN 'delete'
             WHEN l.value IS NOT DISTINCT FROM r.value THEN 'unchanged'
             ELSE 'update'
           END AS action,
           l.value AS local_value, r.value AS remote_value
    FROM local l FULL OUTER JOIN remote r ON l.event_id = r.event_id
"""


@register("sync_reconcile", oracle=_RECONCILE_ORACLE)
def sync_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sync import reconcile

    ev = _t(spark, sf_dir, "events")
    local = ev.select(
        "event_id", "value", (F.col("event_id") % 11 == 0).alias("no_update")
    )
    remote = ev.where(F.col("event_id") % 7 != 0).select(
        "event_id",
        F.when(F.col("event_id") % 5 == 0, F.col("value") * 1.01)
        .otherwise(F.col("value"))
        .alias("value"),
    ).unionByName(
        ev.where(F.col("event_id") % 13 == 0).select(
            (F.col("event_id") + 10000000).alias("event_id"), "value"
        )
    )
    out = reconcile(local, remote, keys=["event_id"], compare_cols=["value"],
                    no_update_col="no_update")
    return out.select("event_id", "action", "local_value", "remote_value")


_CUTOFF_ORACLE = """
    WITH l AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ), r AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
                  THEN value + 0.5 ELSE value END AS value
      FROM events
    ), d AS (
      (SELECT * FROM l EXCEPT ALL SELECT * FROM r)
      UNION ALL
      (SELECT * FROM r EXCEPT ALL SELECT * FROM l)
    )
    SELECT user_id, min(ts) AS cutoff FROM d GROUP BY user_id
"""


@register("divergence_cutoff", oracle=_CUTOFF_ORACLE)
def divergence_cutoff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sync import divergence_cutoff

    ev = _t(spark, sf_dir, "events")
    local = ev.select("user_id", "ts", "value")
    remote = ev.select(
        "user_id", "ts",
        F.when(
            F.col("ts") >= F.lit("2024-01-20 00:00:00").cast("timestamp"),
            F.col("value") + 0.5,
        ).otherwise(F.col("value")).alias("value"),
    )
    return divergence_cutoff(local, remote, keys=["user_id"], dt_col="ts",
                             value_col="value")


# ---------------------------------------------------------------------------
# §2.6 lag diff + rolling median (calculate_period core,
# R/calculate_period.R:82-83)
# ---------------------------------------------------------------------------

_LAG_DIFF_ORACLE = f"""
    WITH g AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             (epoch_us(CAST(ts AS TIMESTAMP))
              - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w)) / 1000000.0 AS gap_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, ts, {R('gap_s', 6)} AS gap_s,
           {R('quantile_cont(gap_s, 0.5) OVER (PARTITION BY user_id ORDER BY ts, event_id '
              'ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)', 6)} AS smoothed_gap_s
    FROM g
"""


@register("lag_diff_period", oracle=_LAG_DIFF_ORACLE)
def lag_diff_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "event_id", "user_id", "ts",
        ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) / 1e6).alias("gap_s"),
    )
    out = g.withColumn(
        "smoothed_gap_s",
        F.expr("percentile(gap_s, 0.5D)").over(w.rowsBetween(-1, 1)),
    )
    return _round(out, {"gap_s": 6, "smoothed_gap_s": 6})


# ---------------------------------------------------------------------------
# Training-data pipeline: deduplication (exact, MinHash-LSH, SimHash,
# n-gram Jaccard) over `documents`
# ---------------------------------------------------------------------------

_DEDUP_EXACT_ORACLE = """
    SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint,
           count(*) AS n_docs, min(doc_id) AS representative
    FROM documents
    GROUP BY 1
"""


@register("dedup_exact", oracle=_DEDUP_EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import exact_duplicates

    docs = _t(spark, sf_dir, "documents")
    return exact_duplicates(docs).select("fingerprint", "n_docs", "representative")


_TEXT_METRICS_ORACLE = f"""
    WITH m AS (
      SELECT doc_id,
             string_split(text, ' ') AS toks,
             string_split(lower(text), ' ') AS ltoks,
             length(text) AS n_chars_calc,
             length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
                 AS n_punct
      FROM documents
    ), r AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                 / greatest(len(toks), 1) AS mean_token_len,
             CAST(n_punct AS DOUBLE) / greatest(n_chars_calc, 1) AS punct_ratio,
             CAST(len(list_filter(ltoks, t -> t IN
               ('the','a','an','and','or','of','to','in','is','it',
                'that','for','on','with','as','are','was','at','by','be')))
               AS DOUBLE) / greatest(len(ltoks), 1) AS stopword_ratio,
             n_chars_calc
      FROM m
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           {R('mean_token_len', 6)} AS mean_token_len,
           {R('punct_ratio', 6)} AS punct_ratio,
           {R('stopword_ratio', 6)} AS stopword_ratio,
           {R('(least(n_chars_calc / 200.0, 1.0)'
              ' + least(stopword_ratio * 5.0, 1.0)'
              ' + (1.0 - least(punct_ratio * 4.0, 1.0))) / 3.0', 6)} AS quality,
           CASE WHEN stopword_ratio >= 0.05 THEN 'en' ELSE 'und' END AS lang_guess
    FROM r
"""


@register("text_metrics", oracle=_TEXT_METRICS_ORACLE)
def text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions import text as X

    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    out = docs.select(
        "doc_id",
        X.token_count(t).cast("long").alias("n_tokens"),
        X.mean_token_length(t).alias("mean_token_len"),
        X.punct_ratio(t).alias("punct_ratio"),
        X.stopword_ratio(t).alias("stopword_ratio"),
        X.quality_score(t).alias("quality"),
        X.lang_id(t).alias("lang_guess"),
    )
    return _round(out, {"mean_token_len": 6, "punct_ratio": 6,
                        "stopword_ratio": 6, "quality": 6})


# ---------------------------------------------------------------------------
# Training-data tier: multi-language ID — per-language stopword-hit
# scores in ONE pass (filter against literal arrays, pure codegen),
# argmax with alphabetical tie-break, 'und' floor. The oracle's CASE
# chain (de wins ties over en over es over fr) is the same ordering as
# the engine's min over (-score, lang).
# ---------------------------------------------------------------------------

def _lang_filter_sql(lang: str) -> str:
    from .functions.text import LANG_STOPWORDS

    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return (f"CAST(len(list_filter(toks, t -> t IN ({words}))) AS DOUBLE)"
            f" / greatest(len(toks), 1)")


_LANG_ID_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ), s AS (
      SELECT doc_id,
             {_lang_filter_sql('de')} AS de,
             {_lang_filter_sql('en')} AS en,
             {_lang_filter_sql('es')} AS es,
             {_lang_filter_sql('fr')} AS fr
      FROM t
    )
    SELECT doc_id,
           {R('de', 6)} AS de, {R('en', 6)} AS en,
           {R('es', 6)} AS es, {R('fr', 6)} AS fr,
           CASE
             WHEN greatest(de, en, es, fr) < 0.05 THEN 'und'
             WHEN de >= en AND de >= es AND de >= fr THEN 'de'
             WHEN en >= es AND en >= fr THEN 'en'
             WHEN es >= fr THEN 'es'
             ELSE 'fr'
           END AS lang
    FROM s
"""


@register("language_id", oracle=_LANG_ID_ORACLE)
def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-language ID over the documents table: all language scores
    from one bound token array per row (no re-tokenization per
    language), map-only, no shuffle — linear over a 100 TB corpus."""
    from .functions import text as X

    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    sc = X.lang_scores(t)
    out = docs.select(
        "doc_id",
        sc["de"].alias("de"), sc["en"].alias("en"),
        sc["es"].alias("es"), sc["fr"].alias("fr"),
        X.lang_id_multi(t).alias("lang"),
    )
    return _round(out, {"de": 6, "en": 6, "es": 6, "fr": 6})


# shared shingle/minhash SQL fragments (k=3 word shingles, 8 hashes)
def _shingles_sql(where: str = "") -> str:
    return f"""
    shingled AS (
      SELECT doc_id, toks, n,
             unnest(generate_series(0, greatest(n - 3, 0))) AS i
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks,
                   len(string_split(lower(text), ' ')) AS n
            FROM documents {where})
    ), shingles AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[i + 1 : i + 3], ' ') AS sh
      FROM shingled
    )
"""


_MINHASH_MOD = 2305843009213693951  # matches operators/dedup.MINHASH_MOD

_MINHASH_SQL = _shingles_sql() + """
    , hashed AS (
      SELECT doc_id, CAST('0x' || substr(md5(sh), 1, 13) AS BIGINT) AS base
      FROM shingles
    ), sig AS (
      SELECT doc_id,
    """ + ",\n".join(
    f"min(({2 * i + 3} * base + {(i + 1) * 2654435769}) % {_MINHASH_MOD}) AS h{i}"
    for i in range(8)
) + """
      FROM hashed GROUP BY doc_id
    )
"""


_MINHASH_ORACLE = "WITH " + _MINHASH_SQL + """
    SELECT doc_id, h0, h1, h2, h3, h4, h5, h6, h7 FROM sig
"""


@register("minhash_signatures", oracle=_MINHASH_ORACLE)
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import minhash_signatures

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, num_hashes=8, shingle_k=3)
    return sig.select(
        "doc_id", *[F.col("sig")[i].alias(f"h{i}") for i in range(8)]
    )


_LSH_PAIRS_ORACLE = "WITH " + _MINHASH_SQL + """
    , banded AS (
      SELECT doc_id, band, key FROM (
        SELECT doc_id,
               unnest([0, 1, 2, 3]) AS band,
               unnest([CAST(h0 AS VARCHAR) || ',' || CAST(h1 AS VARCHAR),
                       CAST(h2 AS VARCHAR) || ',' || CAST(h3 AS VARCHAR),
                       CAST(h4 AS VARCHAR) || ',' || CAST(h5 AS VARCHAR),
                       CAST(h6 AS VARCHAR) || ',' || CAST(h7 AS VARCHAR)]) AS key
        FROM sig
      )
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
    WHERE a.doc_id < b.doc_id
"""


@register("minhash_lsh_pairs", oracle=_LSH_PAIRS_ORACLE)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import lsh_candidate_pairs, minhash_signatures

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, num_hashes=8, shingle_k=3)
    return lsh_candidate_pairs(sig, num_hashes=8, bands=4)


# Hot-bucket cap differential: max_bucket=2 makes buckets of >=3 docs
# (which exist at both test SFs) take the star short-circuit — anchor
# (min doc id) to every member, m-1 edges instead of m(m-1)/2 — so the
# cap semantics themselves are DuckDB-verified, not just the uncapped
# path. At 100 TB this is what bounds a boilerplate bucket of 10^6
# docs to linear pair mass (operators/dedup.py:lsh_candidate_pairs).
_LSH_CAPPED_ORACLE = "WITH " + _MINHASH_SQL + """
    , banded AS (
      SELECT doc_id, band, key FROM (
        SELECT doc_id,
               unnest([0, 1, 2, 3]) AS band,
               unnest([CAST(h0 AS VARCHAR) || ',' || CAST(h1 AS VARCHAR),
                       CAST(h2 AS VARCHAR) || ',' || CAST(h3 AS VARCHAR),
                       CAST(h4 AS VARCHAR) || ',' || CAST(h5 AS VARCHAR),
                       CAST(h6 AS VARCHAR) || ',' || CAST(h7 AS VARCHAR)]) AS key
        FROM sig
      )
    ), stats AS (
      SELECT band, key, count(*) AS n, min(doc_id) AS anchor
      FROM banded GROUP BY 1, 2
    )
    SELECT DISTINCT id_a, id_b FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.key = b.key
      JOIN stats s ON s.band = a.band AND s.key = a.key
      WHERE s.n <= 2 AND a.doc_id < b.doc_id
      UNION ALL
      SELECT s.anchor AS id_a, a.doc_id AS id_b
      FROM banded a
      JOIN stats s ON s.band = a.band AND s.key = a.key
      WHERE s.n > 2 AND a.doc_id <> s.anchor
    )
"""


@register("lsh_capped_pairs", oracle=_LSH_CAPPED_ORACLE)
def lsh_capped_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import lsh_candidate_pairs, minhash_signatures

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, num_hashes=8, shingle_k=3)
    return lsh_candidate_pairs(sig, num_hashes=8, bands=4, max_bucket=2)


@register("incremental_lsh_parity", oracle=_LSH_PAIRS_ORACLE)
def incremental_lsh_parity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB daily-drop dedup story, two-batch vs one-shot: batch
    1 (doc_id % 3 != 0) seeds a persisted band-key store
    (ParquetMergeStore, bucketed on the band key), batch 2 probes ONLY
    the store buckets its own keys hash into, and the union of the two
    incremental outputs must equal the one-shot LSH of the full corpus
    — the same parity contract the streaming mirrors pin."""
    import tempfile

    from .operators.dedup import incremental_lsh_pairs, minhash_signatures
    from .sources.store import ParquetMergeStore

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, num_hashes=8, shingle_k=3)
    b1 = sig.where(F.col("doc_id") % 3 != 0)
    b2 = sig.where(F.col("doc_id") % 3 == 0)
    store = ParquetMergeStore(
        spark, tempfile.mkdtemp(prefix="aquacache_inclsh_"),
        key_cols=["band", "key", "doc_id"], series_col="key",
        n_buckets=64)
    p1 = incremental_lsh_pairs(store, b1, num_hashes=8, bands=4)
    p2 = incremental_lsh_pairs(store, b2, num_hashes=8, bands=4)
    return p1.unionByName(p2).distinct()


_SIMHASH_ORACLE = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), hashed AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
      FROM tok
    ), bits AS (
      SELECT doc_id, j,
             sum(CASE WHEN (h // CAST(pow(2, j) AS BIGINT)) % 2 = 1
                      THEN 1 ELSE -1 END) AS s
      FROM hashed, (SELECT unnest(generate_series(0, 31)) AS j)
      GROUP BY doc_id, j
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
"""


@register("simhash_signatures", oracle=_SIMHASH_ORACLE)
def simhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import simhash

    docs = _t(spark, sf_dir, "documents")
    return simhash(docs, bits=32)


_JACCARD_ORACLE = "WITH " + _MINHASH_SQL + f"""
    , banded AS (
      SELECT doc_id, band, key FROM (
        SELECT doc_id,
               unnest([0, 1, 2, 3]) AS band,
               unnest([CAST(h0 AS VARCHAR) || ',' || CAST(h1 AS VARCHAR),
                       CAST(h2 AS VARCHAR) || ',' || CAST(h3 AS VARCHAR),
                       CAST(h4 AS VARCHAR) || ',' || CAST(h5 AS VARCHAR),
                       CAST(h6 AS VARCHAR) || ',' || CAST(h7 AS VARCHAR)]) AS key
        FROM sig
      )
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
      WHERE a.doc_id < b.doc_id
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id
    ), inter AS (
      SELECT c.id_a, c.id_b, count(*) AS inter
      FROM cand c
      JOIN shingles a ON a.doc_id = c.id_a
      JOIN shingles b ON b.doc_id = c.id_b AND b.sh = a.sh
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
           {R('CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter)', 6)} AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.05
"""


@register("ngram_jaccard_pairs", oracle=_JACCARD_ORACLE)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard verification composed with LSH candidate
    generation — the 100 TB dedup pipeline as ONE declared query:
    minhash signatures -> banded LSH candidate pairs -> exact Jaccard
    restricted to those pairs. Cost is proportional to candidate mass,
    never n² in hot-shingle collisions (the round-1 sampled variant's
    weakness). Reference parity: near-dup verification tier of the
    training-data pipeline; dedup.py:jaccard_on_candidates."""
    from .operators.dedup import (jaccard_on_candidates,
                                  lsh_candidate_pairs, minhash_signatures)

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, num_hashes=8, shingle_k=3)
    cand = lsh_candidate_pairs(sig, num_hashes=8, bands=4)
    out = jaccard_on_candidates(docs, cand, shingle_k=3, threshold=0.05)
    return _round(out, {"jaccard": 6})


def _near_dup_oracle(threshold: float, planes: int) -> str:
    from .operators.similarity import hyperplanes

    hp = hyperplanes(planes, 64)
    bucket = " || ".join(
        "(CASE WHEN list_dot_product(v, ["
        + ", ".join(repr(c) for c in plane)
        + "]) >= 0 THEN '1' ELSE '0' END)"
        for plane in hp
    )
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), b AS (
      SELECT vec_id, v, {bucket} AS bucket FROM e
    ), p AS (
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
             list_dot_product(a.v, b2.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b2.v, b2.v))) AS cosine
      FROM b a JOIN b b2 USING (bucket) WHERE a.vec_id < b2.vec_id
    )
    SELECT id_a, id_b, {R('cosine', 6)} AS cosine
    FROM p WHERE floor(cosine * 1000000000.0 + 0.5)
               >= floor({threshold!r} * 1000000000.0 + 0.5)
"""


@register("embedding_near_dup")
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (LSH-bucketed, exact
    cosine verify) — the fifth dedup tier over the embeddings table.

    The 0.3 threshold is tuned to the synthetic corpus (near-random
    vectors, max pairwise cosine ~0.44) so the declared query returns
    real pairs; production near-dup removal would run 0.85-0.95."""
    from .operators.dedup import embedding_near_duplicates

    emb = _t(spark, sf_dir, "embeddings")
    out = embedding_near_duplicates(emb, threshold=0.3, planes=6)
    return _round(out, {"cosine": 6})


ORACLES["embedding_near_dup"] = _near_dup_oracle(0.3, 6)


# ---------------------------------------------------------------------------
# Similarity search: exact brute-force cosine top-k over embeddings
# ---------------------------------------------------------------------------

_COSINE_TOPK_ORACLE = f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings
    ), s AS (
      SELECT query_id, neighbor_id,
             list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
               AS cosine
      FROM q, c WHERE query_id <> neighbor_id
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY floor(cosine * 1000000000.0 + 0.5) DESC,
                                            neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, {R('cosine', 6)} AS cosine, rank
    FROM r WHERE rank <= 5
"""


@register("embedding_cosine_topk", oracle=_COSINE_TOPK_ORACLE)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    out = cosine_topk(emb, emb.where(F.col("vec_id") < 10), k=5)
    return _round(out, {"cosine": 6})


# ---------------------------------------------------------------------------
# §2.6 stateful sequential operators. Each sequential kernel is
# oracle-checked end-to-end: the DuckDB side replays the same scan with
# a recursive CTE (increments, calculate_period) or the same closed-form
# arithmetic (4-knot spline), every float op mirrored in order so the
# deterministic rounding idiom hash-matches.
# ---------------------------------------------------------------------------

# 6h-binned cumulative gauge (integer micro-units so the cumsum is
# exact and order-independent), wrapped at 100.0, dense cadence grid,
# then the reference scan (R/compute_increments.R:82-121) replayed row
# by row in a recursive CTE carrying (increment, last_max).
_INC_BASE = lambda rd, mp, mg: f"""
    WITH RECURSIVE b AS (
      SELECT user_id,
             TIMESTAMP '1970-01-01'
               + CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 21600) * 21600 AS BIGINT)
                 * INTERVAL 1 SECOND AS bt,
             sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS sm
      FROM events GROUP BY 1, 2
    ), c AS (
      SELECT user_id, bt,
             (sum(sm) OVER (PARTITION BY user_id ORDER BY bt)) % 100000000 AS gm
      FROM b
    ), spine AS (
      SELECT user_id,
             unnest(generate_series(min(bt), max(bt), INTERVAL 6 HOUR)) AS bt
      FROM c GROUP BY user_id
    ), g AS (
      SELECT s.user_id, s.bt, c.gm / 1000000.0 AS v
      FROM spine s LEFT JOIN c USING (user_id, bt)
    ), gi AS (
      SELECT user_id, bt, v,
             row_number() OVER (PARTITION BY user_id ORDER BY bt) AS rn,
             sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY bt) AS grp
      FROM g
    ), runlen AS (
      SELECT user_id, bt, v, rn,
             sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id, grp) AS na_len
      FROM gi
    ), base AS (
      SELECT user_id, rn, bt, v,
             lag(v) OVER (PARTITION BY user_id ORDER BY rn) AS pv,
             coalesce(lag(CASE WHEN v IS NULL THEN na_len ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY rn), 0) AS prev_run
      FROM runlen
    ), scan AS (
      SELECT user_id, rn, bt, v, CAST(NULL AS DOUBLE) AS inc, v AS lm
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.user_id, b.rn, b.bt, b.v,
        CASE WHEN b.pv IS NULL AND b.prev_run > {mg} THEN NULL
             WHEN b.v IS NULL OR b.pv IS NULL THEN NULL
             WHEN b.v - b.pv <= -{rd} THEN 0.0
             WHEN b.v - (CASE WHEN s.lm >= b.pv THEN s.lm ELSE b.pv END) >= {mp}
               THEN b.v - (CASE WHEN s.lm >= b.pv THEN s.lm ELSE b.pv END)
             ELSE 0.0 END AS inc,
        CASE WHEN b.pv IS NULL AND b.prev_run > {mg} THEN coalesce(b.v, s.lm)
             WHEN b.v IS NULL OR b.pv IS NULL THEN s.lm
             WHEN b.v - b.pv <= -{rd} THEN b.v
             WHEN b.v - (CASE WHEN s.lm >= b.pv THEN s.lm ELSE b.pv END) >= {mp}
               THEN b.v
             ELSE s.lm END AS lm
      FROM scan s JOIN base b ON b.user_id = s.user_id AND b.rn = s.rn + 1
    )
"""

_INCREMENTS_ORACLE = _INC_BASE("20.0", "0.25", 3) + f"""
    SELECT user_id, bt, {R('v', 6)} AS gauge, {R('inc', 6)} AS increment
    FROM scan
"""


@register("increments_stateful", oracle=_INCREMENTS_ORACLE)
def increments_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reset-aware increments (R/compute_increments.R:82-121) on a
    6h-binned cumulative-with-wraparound gauge built from events, with
    the reference's NA-cadence gap rows emitted (:33-67). The DuckDB
    oracle replays the identical scan as a recursive CTE, so this row
    is a full rows+schema+hash check of the sequential kernel."""
    from pyspark.sql import Window
    from .operators.increments import compute_increments

    ev = _t(spark, sf_dir, "events")
    b = ev.groupBy(
        "user_id",
        F.timestamp_seconds(
            F.floor(F.unix_timestamp("ts") / 21600) * 21600
        ).alias("bt"),
    ).agg(
        F.sum(F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long"))
        .alias("sm")
    )
    w = Window.partitionBy("user_id").orderBy("bt")
    g = b.select(
        "user_id", "bt",
        ((F.sum("sm").over(w) % F.lit(100000000)) / 1000000.0).alias("gauge"),
    )
    out = compute_increments(
        g, keys=["user_id"], dt_col="bt", value_col="gauge",
        reset_drop=20.0, min_pos=0.25, period_seconds=21600.0, max_gap=3,
        emit_gap_rows=True,
    )
    return _round(out.select("user_id", "bt", "gauge", "increment"),
                  {"gauge": 6, "increment": 6})


# 4-knot natural cubic spline: interior single-point gaps get exactly
# two known knots on each side, so the tridiagonal solve collapses to
# the fixed Thomas-algorithm op sequence mirrored here step by step
# (operators/impute.py:natural_cubic_spline with context_points=2).
_SPLINE_ORACLE = f"""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events
    ), m AS (
      SELECT user_id, ts, event_id, rn,
             CASE WHEN rn % 17 = 4 AND rn > 2 AND rn <= n - 2
                  THEN NULL ELSE value END AS value
      FROM e
    ), k AS (
      SELECT user_id, ts, event_id, value,
             epoch(lag(ts, 2) OVER w)  AS x0, lag(value, 2) OVER w  AS y0,
             epoch(lag(ts, 1) OVER w)  AS x1, lag(value, 1) OVER w  AS y1,
             epoch(lead(ts, 1) OVER w) AS x2, lead(value, 1) OVER w AS y2,
             epoch(lead(ts, 2) OVER w) AS x3, lead(value, 2) OVER w AS y3,
             epoch(ts) AS xq
      FROM m
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), h AS (
      SELECT *, x1 - x0 AS h0, x2 - x1 AS h1, x3 - x2 AS h2 FROM k
    ), dd AS (
      SELECT *,
             6.0 * ((y2 - y1) / h1 - (y1 - y0) / h0) AS d1,
             6.0 * ((y3 - y2) / h2 - (y2 - y1) / h1) AS d2,
             2.0 * (h0 + h1) AS b0, 2.0 * (h1 + h2) AS b1
      FROM h
    ), th AS (
      SELECT *, h1 / b0 AS cp0, d1 / b0 AS dp0 FROM dd
    ), th2 AS (
      SELECT *, (d2 - h1 * dp0) / (b1 - h1 * cp0) AS m2 FROM th
    ), th3 AS (
      SELECT *, dp0 - cp0 * m2 AS m1 FROM th2
    ), ev2 AS (
      SELECT user_id, ts, event_id, value,
             (xq - x1) / (x2 - x1) AS t, x2 - x1 AS hseg, y1, y2, m1, m2
      FROM th3
    ), sv AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value IS NOT NULL THEN NULL ELSE
               y1 * (1 - t) + y2 * t
               + (hseg * hseg / 6.0)
                 * ((m1 * ((1 - t) * (1 - t) * (1 - t) - (1 - t)))
                    + (m2 * (t * t * t - t)))
             END AS fill
      FROM ev2
    )
    SELECT user_id, ts, event_id,
           {R('coalesce(value, fill)', 4)} AS value,
           (value IS NULL AND fill IS NOT NULL) AS imputed
    FROM sv
"""


@register("spline_imputation", oracle=_SPLINE_ORACLE)
def spline_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cubic-spline gap fill (imputeMissing spline path,
    R/imputeMissing.R:1129-1145): every 17th row (interior only, so two
    known neighbors exist on each side) is masked and re-estimated from
    the 4 surrounding knots; the DuckDB oracle mirrors the Thomas-solve
    arithmetic op for op."""
    from pyspark.sql import Window
    from .operators.impute import spline_fill

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    masked = (
        ev.select("user_id", "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wn))
        .withColumn(
            "value",
            F.when(
                (F.col("rn") % 17 == 4)
                & (F.col("rn") > 2) & (F.col("rn") <= F.col("n") - 2),
                F.lit(None),
            ).otherwise(F.col("value")),
        )
        .select("user_id", "ts", "event_id", "value")
    )
    out = spline_fill(masked, keys=["user_id"], dt_col="ts",
                      value_col="value", context_points=2)
    return _round(out.select("user_id", "ts", "event_id", "value", "imputed"),
                  {"value": 4})


# The reference change-point scan (R/calculate_period.R:87-107) replayed
# in a recursive CTE: hours-unit diffs, centered 3-median with NA edges,
# a consecutive-difference counter that adopts the third differing
# smoothed diff backdated 2 rows, then ffill/bfill (:132-135) and the
# hours->ISO-8601 float chain (:111-129).
_PERIOD_ORACLE = f"""
    WITH RECURSIVE e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), d AS (
      SELECT l.user_id, l.rn AS j,
             (epoch_us(r.ts) - epoch_us(l.ts)) / 3600000000.0 AS diff
      FROM e l JOIN e r ON r.user_id = l.user_id AND r.rn = l.rn + 1
    ), dm AS (
      SELECT user_id, max(j) AS maxj FROM d GROUP BY user_id
    ), sm AS (
      SELECT d.user_id, d.j,
             CASE WHEN d.j = 1 OR d.j = dm.maxj THEN NULL ELSE
               CASE
                 WHEN (pd <= diff AND diff <= nd) OR (nd <= diff AND diff <= pd)
                   THEN diff
                 WHEN (diff <= pd AND pd <= nd) OR (nd <= pd AND pd <= diff)
                   THEN pd
                 ELSE nd
               END
             END AS smoothed
      FROM (
        SELECT user_id, j, diff,
               lag(diff)  OVER (PARTITION BY user_id ORDER BY j) AS pd,
               lead(diff) OVER (PARTITION BY user_id ORDER BY j) AS nd
        FROM d
      ) d JOIN dm USING (user_id)
    ), scan AS (
      SELECT user_id, 1 AS j, 0 AS cnt, CAST(0.0 AS DOUBLE) AS last_p,
             CAST(NULL AS DOUBLE) AS change
      FROM sm WHERE j = 1
      UNION ALL
      SELECT s.user_id, d.j,
        CASE WHEN d.smoothed IS NOT NULL AND d.smoothed <> s.last_p
             THEN CASE WHEN s.cnt + 1 = 3 THEN 0 ELSE s.cnt + 1 END
             ELSE 0 END AS cnt,
        CASE WHEN d.smoothed IS NOT NULL AND d.smoothed <> s.last_p
                  AND s.cnt + 1 = 3
             THEN d.smoothed ELSE s.last_p END AS last_p,
        CASE WHEN d.smoothed IS NOT NULL AND d.smoothed <> s.last_p
                  AND s.cnt + 1 = 3
             THEN d.smoothed ELSE NULL END AS change
      FROM scan s JOIN sm d ON d.user_id = s.user_id AND d.j = s.j + 1
    ), ch AS (
      SELECT user_id, j - 2 AS rn, change FROM scan WHERE change IS NOT NULL
    ), fills AS (
      SELECT e.user_id, e.rn, e.ts, e.event_id,
             coalesce(
               ch.change,
               last_value(ch.change IGNORE NULLS) OVER
                 (PARTITION BY e.user_id ORDER BY e.rn
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               first_value(ch.change IGNORE NULLS) OVER
                 (PARTITION BY e.user_id ORDER BY e.rn
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             ) AS ph
      FROM e LEFT JOIN ch ON ch.user_id = e.user_id AND ch.rn = e.rn
    )
    SELECT user_id, ts, event_id, {R('ph', 6)} AS period_hours,
           CASE WHEN ph IS NULL THEN NULL ELSE
             'P' || CAST(CAST(floor(ph / 24) AS BIGINT) AS VARCHAR)
             || 'DT' || CAST(CAST(floor(ph % 24) AS BIGINT) AS VARCHAR)
             || 'H' || CAST(CAST(floor(((ph % 24) - floor(ph % 24)) * 60) AS BIGINT) AS VARCHAR)
             || 'M' || CAST(CAST(floor(((((ph % 24) - floor(ph % 24)) * 60)
                          - floor(((ph % 24) - floor(ph % 24)) * 60)) * 60 + 0.5) AS BIGINT) AS VARCHAR)
             || 'S'
           END AS period
    FROM fills
"""


@register("calculate_period", oracle=_PERIOD_ORACLE)
def calculate_period_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cadence detection + ISO-8601 period (R/calculate_period.R:82-135)
    — the sequential adopt/backdate scan oracle-checked via a DuckDB
    recursive CTE replay."""
    from .operators.period import calculate_period

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    out = calculate_period(ev, keys=["user_id"], dt_col="ts")
    return _round(
        out.select("user_id", "ts", "event_id", "period_hours", "period"),
        {"period_hours": 6},
    )


_MULTIMODAL_ORACLE = """
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
"""


@register("multimodal_features", oracle=_MULTIMODAL_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction plumbing (decode stubbed — see
    operators/multimodal.py): treats document text bytes as media blobs.
    The byte-count and content digest are oracle-checked; the decoded
    feature vector itself is the stubbed step."""
    from .operators.multimodal import extract_media_features

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
    )
    out = extract_media_features(docs)
    return out.select("media_id", "n_bytes", "sha256")


# ---------------------------------------------------------------------------
# §2.4 recursive dependency closure (WITH RECURSIVE
# downstream_timeseries_ids, patch_41.R:2516-2538) — driver-loop fixpoint
# ---------------------------------------------------------------------------

_CLOSURE_EDGES = [(1, 6), (2, 6), (2, 10), (9, 10), (10, 20), (20, 30), (7, 8)]

_CLOSURE_ORACLE = f"""
    WITH RECURSIVE edges(src, dst) AS (
      SELECT * FROM (VALUES {", ".join(f"({a}, {b})" for a, b in _CLOSURE_EDGES)})
    ), closure(id) AS (
      SELECT unnest([2, 9])
      UNION
      SELECT e.dst FROM closure c JOIN edges e ON c.id = e.src
    )
    SELECT CAST(id AS BIGINT) AS id FROM closure
"""


@register("recursive_downstream_closure", oracle=_CLOSURE_ORACLE)
def recursive_downstream_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.incremental import downstream_closure

    members = _ldf(spark, 
        [(b, a) for a, b in _CLOSURE_EDGES],
        ["timeseries_id", "member_timeseries_id"],
    )
    seeds = _ldf(spark, [(2,), (9,)], ["id"])
    return downstream_closure(members, seeds).select(F.col("id").cast("long"))


# ---------------------------------------------------------------------------
# §2.6 gap expansion: dense cadence inside observed range
# (R/compute_increments.R:33-67)
# ---------------------------------------------------------------------------

_GAP_ORACLE = """
    WITH pts AS (
      SELECT event_type,
             TIMESTAMP '1970-01-01'
               + CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) * 3600 AS BIGINT)
                 * INTERVAL 1 SECOND AS t
      FROM events WHERE event_type IN ('signup', 'error')
    ), dedup AS (SELECT DISTINCT event_type, t FROM pts),
    nxt AS (
      SELECT event_type, t,
             lead(t) OVER (PARTITION BY event_type ORDER BY t) AS t2
      FROM dedup
    ), ticks AS (
      SELECT DISTINCT event_type,
             unnest(generate_series(t, t2, INTERVAL 3600 SECOND)) AS t
      FROM nxt WHERE t2 IS NOT NULL
    )
    SELECT k.event_type, k.t AS ts,
           CASE WHEN d.t IS NOT NULL THEN 1 ELSE 0 END AS observed
    FROM ticks k LEFT JOIN dedup d
      ON k.event_type = d.event_type AND k.t = d.t
"""


@register("gap_expansion", oracle=_GAP_ORACLE)
def gap_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.gaps import expand_gaps

    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("signup", "error")
    )
    # hour-floor the irregular events to a cadence grid first
    pts = ev.select(
        "event_type",
        F.timestamp_seconds(
            F.floor(F.unix_timestamp("ts") / 3600) * 3600
        ).alias("ts"),
    ).distinct().withColumn("observed", F.lit(1))
    out = expand_gaps(pts, keys=["event_type"], dt_col="ts", period_seconds=3600)
    return out.select(
        "event_type", "ts", F.coalesce("observed", F.lit(0)).alias("observed")
    )


# ---------------------------------------------------------------------------
# §2.3 grade-based exclusion: interval-table range anti-join
# (patch_48.R:280-290,343-350) — segments marking unusable windows
# ---------------------------------------------------------------------------

_GRADE_EXCL_ORACLE = """
    WITH grades AS (
      SELECT * FROM (VALUES
        ('click',  TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-08'),
        ('error',  TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-31'),
        ('view',   TIMESTAMP '2024-01-10', TIMESTAMP '2024-01-12')
      ) AS g(event_type, start_dt, end_dt)
    )
    SELECT e.event_id, e.event_type, CAST(e.ts AS TIMESTAMP) AS ts, e.value
    FROM events e
    WHERE NOT EXISTS (
      SELECT 1 FROM grades g
      WHERE g.event_type = e.event_type
        AND CAST(e.ts AS TIMESTAMP) >= g.start_dt
        AND CAST(e.ts AS TIMESTAMP) <  g.end_dt
    )
"""

_GRADE_SEGMENTS = [
    ("click", "2024-01-05 00:00:00", "2024-01-08 00:00:00"),
    ("error", "2024-01-01 00:00:00", "2024-01-31 00:00:00"),
    ("view", "2024-01-10 00:00:00", "2024-01-12 00:00:00"),
]


@register("grade_exclusion_antijoin", oracle=_GRADE_EXCL_ORACLE)
def grade_exclusion_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    grades = _ldf(spark, 
        _GRADE_SEGMENTS, ["event_type", "start_dt", "end_dt"]
    ).select(
        "event_type",
        F.col("start_dt").cast("timestamp").alias("start_dt"),
        F.col("end_dt").cast("timestamp").alias("end_dt"),
    )
    cond = (
        (ev["event_type"] == grades["event_type"])
        & (ev["ts"] >= grades["start_dt"])
        & (ev["ts"] < grades["end_dt"])
    )
    # QC tables are tiny: broadcast range anti-join (SURVEY §2.4)
    return ev.join(F.broadcast(grades), cond, "left_anti").select(
        "event_id", "event_type", "ts", "value"
    )


# ---------------------------------------------------------------------------
# §2.9 JSON args parsing (source_fx_args jsonb, R/getNewContinuous.R:481-484)
# ---------------------------------------------------------------------------

_JSON_ORACLE = f"""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           count(*) OVER (PARTITION BY CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS k_freq
    FROM events
"""


@register("json_extract_args", oracle=_JSON_ORACLE)
def json_extract_args(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", k.alias("k")).withColumn(
        "k_freq", F.count(F.lit(1)).over(Window.partitionBy("k"))
    )


# ---------------------------------------------------------------------------
# §2.12 audit as-of reconstruction: latest version per key at a past
# timestamp (patch_55.R:2336-2420 *_as_of functions)
# ---------------------------------------------------------------------------

_ASOF_AUDIT_ORACLE = """
    WITH versions AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS modified_at, event_id, value
      FROM events
    ), visible AS (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY modified_at DESC, event_id DESC) AS rn
      FROM versions
      WHERE modified_at <= TIMESTAMP '2024-01-15 00:00:00'
    )
    SELECT user_id, event_id AS version_event_id, modified_at, value
    FROM visible WHERE rn = 1
"""


@register("audit_as_of", oracle=_ASOF_AUDIT_ORACLE)
def audit_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    versions = ev.select(
        "user_id", F.col("ts").alias("modified_at"), "event_id", "value"
    ).where(F.col("modified_at") <= F.lit("2024-01-15 00:00:00").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(
        F.desc("modified_at"), F.desc("event_id")
    )
    return (
        versions.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_id").alias("version_event_id"),
                "modified_at", "value")
    )


# ---------------------------------------------------------------------------
# §2.12 audit as-of for interval QC tables
# (audit.continuous_qc_rows_as_of, inst/patches/patch_55.R:2336-2520):
# current grades/approvals FULL OUTER first-post-as_of-log-change, the
# log's original_data wins, row_created cutoff, zero-width-interval
# window rule. Modeled: current intervals + audit log derived from
# orders; updates (original wins), a second later change that must NOT
# win, deletes (resurrected from the log), and post-as_of creations
# (dropped by the row_created filter).
# ---------------------------------------------------------------------------

_QC_ASOF_SQL = """
    cur AS (
      SELECT o_orderkey AS row_id,
             o_custkey % 10 AS timeseries_id,
             o_orderkey % 4 AS type_id,
             CAST(o_orderdate AS TIMESTAMP) AS start_dt,
             CASE WHEN o_orderkey % 17 = 0 THEN CAST(o_orderdate AS TIMESTAMP)
                  ELSE CAST(o_orderdate AS TIMESTAMP)
                       + (o_orderkey % 30 + 1) * INTERVAL 1 DAY END AS end_dt,
             CAST(o_orderdate AS TIMESTAMP) AS row_created
      FROM orders WHERE o_orderkey % 3 = 0
    ), upd1 AS (  -- first post-as_of update: original_data = as-of state
      SELECT o_orderkey * 10 + 1 AS log_id,
             TIMESTAMP '1997-06-01' + (o_orderkey % 50) * INTERVAL 1 DAY
               AS action_timestamp,
             o_orderkey AS orig_row_id,
             o_custkey % 10 AS orig_timeseries_id,
             (o_orderkey + 1) % 4 AS orig_type_id,
             CAST(o_orderdate AS TIMESTAMP) - INTERVAL 3 DAY AS orig_start_dt,
             CASE WHEN o_orderkey % 17 = 0
                  THEN CAST(o_orderdate AS TIMESTAMP) - INTERVAL 3 DAY
                  ELSE CAST(o_orderdate AS TIMESTAMP) - INTERVAL 3 DAY
                       + (o_orderkey % 30 + 1) * INTERVAL 1 DAY END
               AS orig_end_dt,
             CAST(NULL AS BIGINT) AS new_row_id,
             CAST(o_orderdate AS TIMESTAMP) - INTERVAL 3 DAY AS row_created
      FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 IN (1, 2)
    ), upd2 AS (  -- later second change: must NOT win over upd1
      SELECT o_orderkey * 10 + 2 AS log_id,
             TIMESTAMP '1998-01-01' + (o_orderkey % 50) * INTERVAL 1 DAY
               AS action_timestamp,
             o_orderkey AS orig_row_id,
             o_custkey % 10 AS orig_timeseries_id,
             99 AS orig_type_id,
             CAST(o_orderdate AS TIMESTAMP) AS orig_start_dt,
             CAST(o_orderdate AS TIMESTAMP) AS orig_end_dt,
             CAST(NULL AS BIGINT) AS new_row_id,
             CAST(o_orderdate AS TIMESTAMP) AS row_created
      FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 10 = 1
    ), del AS (  -- deleted after as_of: only the log remembers them
      SELECT o_orderkey * 10 + 3 AS log_id,
             TIMESTAMP '1997-09-01' AS action_timestamp,
             o_orderkey AS orig_row_id,
             o_custkey % 10 AS orig_timeseries_id,
             o_orderkey % 4 AS orig_type_id,
             CAST(o_orderdate AS TIMESTAMP) AS orig_start_dt,
             CAST(o_orderdate AS TIMESTAMP)
               + (o_orderkey % 30 + 1) * INTERVAL 1 DAY AS orig_end_dt,
             CAST(NULL AS BIGINT) AS new_row_id,
             CAST(o_orderdate AS TIMESTAMP) AS row_created
      FROM orders WHERE o_orderkey % 3 = 1 AND o_orderkey % 7 = 2
    ), lg AS (
      SELECT * FROM upd1 UNION ALL SELECT * FROM upd2
      UNION ALL SELECT * FROM del
    )
"""

_QC_ASOF_ORACLE = "WITH " + _QC_ASOF_SQL + """
    , fut AS (
      SELECT * FROM (
        SELECT COALESCE(orig_row_id, new_row_id) AS key,
               orig_timeseries_id, orig_type_id, orig_start_dt,
               orig_end_dt, row_created,
               row_number() OVER (
                 PARTITION BY COALESCE(orig_row_id, new_row_id)
                 ORDER BY action_timestamp, log_id) AS rn
        FROM lg WHERE action_timestamp > TIMESTAMP '1997-01-01'
      ) WHERE rn = 1
    ), snap AS (
      SELECT COALESCE(f.key, c.row_id) AS row_id,
             CASE WHEN f.key IS NOT NULL THEN f.orig_timeseries_id
                  ELSE c.timeseries_id END AS timeseries_id,
             CASE WHEN f.key IS NOT NULL THEN f.orig_type_id
                  ELSE c.type_id END AS type_id,
             CASE WHEN f.key IS NOT NULL THEN f.orig_start_dt
                  ELSE c.start_dt END AS start_dt,
             CASE WHEN f.key IS NOT NULL THEN f.orig_end_dt
                  ELSE c.end_dt END AS end_dt,
             CASE WHEN f.key IS NOT NULL THEN f.row_created
                  ELSE c.row_created END AS row_created
      FROM cur c FULL OUTER JOIN fut f ON f.key = c.row_id
    )
    SELECT 'grade' AS qc_type, row_id, timeseries_id, type_id,
           start_dt, end_dt
    FROM snap
    WHERE row_created <= TIMESTAMP '1997-01-01'
      AND (end_dt > TIMESTAMP '1996-06-01'
           OR (start_dt = end_dt AND start_dt >= TIMESTAMP '1996-06-01'))
      AND start_dt < TIMESTAMP '1998-06-01'
"""


@register("qc_intervals_as_of", oracle=_QC_ASOF_ORACLE)
def qc_intervals_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval QC audit as-of (patch_55.R:2336-2520): grades table
    reconstructed at 1997-01-01 from the current state + audit log —
    first-change-wins, delete resurrection, row_created cutoff, and the
    zero-width-interval window rule."""
    from .operators.audit import qc_rows_as_of

    o = _t(spark, sf_dir, "orders")
    start = F.col("o_orderdate").cast("timestamp")
    ndays = (F.col("o_orderkey") % 30 + 1).cast("int")
    end = F.when(F.col("o_orderkey") % 17 == 0, start).otherwise(
        F.timestamp_add("DAY", ndays, start)
    )
    cur = o.where(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("row_id"),
        (F.col("o_custkey") % 10).alias("timeseries_id"),
        (F.col("o_orderkey") % 4).alias("type_id"),
        start.alias("start_dt"),
        end.alias("end_dt"),
        start.alias("row_created"),
    )
    shifted = F.timestamp_add("DAY", F.lit(-3), start)
    act1 = F.timestamp_add(
        "DAY", (F.col("o_orderkey") % 50).cast("int"),
        F.lit("1997-06-01 00:00:00").cast("timestamp"),
    )
    upd1 = o.where(
        (F.col("o_orderkey") % 3 == 0) & (F.col("o_orderkey") % 5).isin(1, 2)
    ).select(
        (F.col("o_orderkey") * 10 + 1).alias("log_id"),
        act1.alias("action_timestamp"),
        F.col("o_orderkey").alias("orig_row_id"),
        (F.col("o_custkey") % 10).alias("orig_timeseries_id"),
        ((F.col("o_orderkey") + 1) % 4).alias("orig_type_id"),
        shifted.alias("orig_start_dt"),
        F.when(F.col("o_orderkey") % 17 == 0, shifted)
        .otherwise(F.timestamp_add("DAY", ndays, shifted))
        .alias("orig_end_dt"),
        F.lit(None).cast("long").alias("new_row_id"),
        shifted.alias("row_created"),
    )
    act2 = F.timestamp_add(
        "DAY", (F.col("o_orderkey") % 50).cast("int"),
        F.lit("1998-01-01 00:00:00").cast("timestamp"),
    )
    upd2 = o.where(
        (F.col("o_orderkey") % 3 == 0) & (F.col("o_orderkey") % 10 == 1)
    ).select(
        (F.col("o_orderkey") * 10 + 2).alias("log_id"),
        act2.alias("action_timestamp"),
        F.col("o_orderkey").alias("orig_row_id"),
        (F.col("o_custkey") % 10).alias("orig_timeseries_id"),
        F.lit(99).cast("long").alias("orig_type_id"),
        start.alias("orig_start_dt"),
        start.alias("orig_end_dt"),
        F.lit(None).cast("long").alias("new_row_id"),
        start.alias("row_created"),
    )
    dele = o.where(
        (F.col("o_orderkey") % 3 == 1) & (F.col("o_orderkey") % 7 == 2)
    ).select(
        (F.col("o_orderkey") * 10 + 3).alias("log_id"),
        F.lit("1997-09-01 00:00:00").cast("timestamp")
        .alias("action_timestamp"),
        F.col("o_orderkey").alias("orig_row_id"),
        (F.col("o_custkey") % 10).alias("orig_timeseries_id"),
        (F.col("o_orderkey") % 4).alias("orig_type_id"),
        start.alias("orig_start_dt"),
        F.timestamp_add("DAY", ndays, start).alias("orig_end_dt"),
        F.lit(None).cast("long").alias("new_row_id"),
        start.alias("row_created"),
    )
    log = upd1.unionByName(upd2).unionByName(dele)
    out = qc_rows_as_of(
        cur, log, as_of="1997-01-01 00:00:00",
        window_start="1996-06-01 00:00:00",
        window_end="1998-06-01 00:00:00",
    )
    return out.select(
        F.lit("grade").alias("qc_type"), "row_id", "timeseries_id",
        "type_id", "start_dt", "end_dt",
    )


# ---------------------------------------------------------------------------
# §2.14 imputation: linear interpolation across masked gaps
# (R/imputeMissing.R:1123-1128, stats::approx analog)
# ---------------------------------------------------------------------------

_INTERP_ORACLE = f"""
    WITH masked AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN event_id % 10 = 3 THEN NULL ELSE value END AS v
      FROM events
    ), ctx AS (
      SELECT *,
             last_value(v IGNORE NULLS) OVER w_prev AS prev_v,
             first_value(v IGNORE NULLS) OVER w_next AS next_v,
             last_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
                 OVER w_prev AS prev_t,
             first_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
                 OVER w_next AS next_t
      FROM masked
      WINDOW
        w_prev AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        w_next AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id, ts,
           {R('''CASE
             WHEN v IS NOT NULL THEN v
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
               prev_v + (next_v - prev_v)
                 * (epoch_us(ts) - epoch_us(prev_t))
                 / (epoch_us(next_t) - epoch_us(prev_t))
             ELSE coalesce(prev_v, next_v)
           END''', 6)} AS imputed_value,
           (v IS NULL) AS imputed
    FROM ctx
"""


@register("linear_interpolation", oracle=_INTERP_ORACLE)
def linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    masked = ev.select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_id") % 10 == 3, F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    w_next = w.rowsBetween(1, Window.unboundedFollowing)
    vt = F.when(F.col("v").isNotNull(), F.col("ts"))
    ctx = (
        masked.withColumn("prev_v", F.last("v", ignorenulls=True).over(w_prev))
        .withColumn("next_v", F.first("v", ignorenulls=True).over(w_next))
        .withColumn("prev_t", F.last(vt, ignorenulls=True).over(w_prev))
        .withColumn("next_t", F.first(vt, ignorenulls=True).over(w_next))
    )
    frac = (
        (F.unix_micros("ts") - F.unix_micros("prev_t")).cast("double")
        / (F.unix_micros("next_t") - F.unix_micros("prev_t")).cast("double")
    )
    imputed_value = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac,
        )
        .otherwise(F.coalesce("prev_v", "next_v"))
    )
    out = ctx.select(
        "event_id", "user_id", "ts",
        imputed_value.alias("imputed_value"),
        F.col("v").isNull().alias("imputed"),
    )
    return _round(out, {"imputed_value": 6})


# ---------------------------------------------------------------------------
# §2.3 row-level security: share_with array visibility filter
# (R/create_test_DB.R:741; R/dbAppendTableRLS.R:3)
# ---------------------------------------------------------------------------

_RLS_ORACLE = """
    WITH tagged AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 3 = 0 THEN ['public_reader']
                  WHEN doc_id % 3 = 1 THEN ['admin']
                  ELSE ['admin', 'public_reader'] END AS share_with
      FROM documents
    )
    SELECT doc_id, source
    FROM tagged
    WHERE list_contains(share_with, 'public_reader')
"""


@register("rls_share_with_filter", oracle=_RLS_ORACLE)
def rls_share_with_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    share = (
        F.when(F.col("doc_id") % 3 == 0, F.array(F.lit("public_reader")))
        .when(F.col("doc_id") % 3 == 1, F.array(F.lit("admin")))
        .otherwise(F.array(F.lit("admin"), F.lit("public_reader")))
    )
    return (
        docs.withColumn("share_with", share)
        .where(F.array_contains("share_with", "public_reader"))
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# §2.1 update_hydat-style merge: daily historical rows only on days
# lacking sub-daily data (R/update_hydat.R:7-9) — left-anti on day + union
# ---------------------------------------------------------------------------

_HYDAT_ORACLE = f"""
    WITH subdaily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, value
      FROM events WHERE event_type IN ('click', 'view')
    ), historical_daily AS (
      -- synthetic archive: one row per (type, day) over a wider range
      SELECT event_type, day, {R('avg_v', 4)} AS value
      FROM (
        SELECT event_type, CAST(ts AS DATE) AS day,
               {R(DSUM('value') + ' / count(value)', 4)} AS avg_v
        FROM events WHERE event_type IN ('click', 'view', 'error')
        GROUP BY 1, 2
      )
    ), merged AS (
      SELECT event_type, day, value, 'subdaily' AS src FROM subdaily
      UNION ALL
      SELECT h.event_type, h.day, h.value, 'hydat' AS src
      FROM historical_daily h
      WHERE NOT EXISTS (
        SELECT 1 FROM subdaily s
        WHERE s.event_type = h.event_type AND s.day = h.day
      )
    )
    SELECT event_type, day, {R('value', 4)} AS value, src FROM merged
"""


@register("hydat_daily_merge", oracle=_HYDAT_ORACLE)
def hydat_daily_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    subdaily = ev.where(F.col("event_type").isin("click", "view")).select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    from .operators.daily import exact_mean

    historical = (
        ev.where(F.col("event_type").isin("click", "view", "error"))
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(exact_mean(F.col("value")).alias("value"))
    )
    historical = _round(historical, {"value": 4})
    hydat_only = historical.join(
        subdaily.select("event_type", "day").distinct(),
        ["event_type", "day"], "left_anti",
    )
    merged = subdaily.withColumn("src", F.lit("subdaily")).unionByName(
        hydat_only.withColumn("src", F.lit("hydat"))
    )
    return _round(merged, {"value": 4})


# ---------------------------------------------------------------------------
# §2.12 incremental daily refresh: changed-range recompute + change-only
# merge classification (patch_41.R:2998-3060; patch_48.R:401-408)
# ---------------------------------------------------------------------------

_INCR_ORACLE = f"""
    WITH fresh AS (
      SELECT event_type, CAST(ts AS DATE) AS date,
             {R(DSUM('value') + ' / count(value)', 4)} AS value,
             count(value) AS count
      FROM events
      WHERE event_type IN ('click', 'error')
        AND CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-15'
      GROUP BY 1, 2
      HAVING count(value) > 0
    ), existing AS (
      -- stale store: click rows doubled (stale), error rows missing
      SELECT event_type, CAST(ts AS DATE) AS date,
             {R(DSUM('value') + ' * 2 / count(value)', 4)} AS value
      FROM events
      WHERE event_type = 'click'
      GROUP BY 1, 2
    )
    SELECT f.event_type, f.date, f.value, f.count,
           CASE WHEN e.value IS NULL AND f.value IS NOT NULL THEN 'insert'
                WHEN f.value IS NOT DISTINCT FROM e.value THEN 'unchanged'
                ELSE 'update' END AS merge_action
    FROM fresh f LEFT JOIN existing e
      ON f.event_type = e.event_type AND f.date = e.date
"""


@register("incremental_daily_refresh", oracle=_INCR_ORACLE)
def incremental_daily_refresh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.daily import daily_rollup
    from .streaming.incremental import incremental_daily_refresh

    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("timeseries_id"),
        F.col("ts").alias("datetime"),
        "value",
    )
    from .operators.daily import exact_sum

    existing = (
        ev.where(F.col("timeseries_id") == "click")
        .groupBy("timeseries_id", F.to_date("datetime").alias("date"))
        .agg((exact_sum(F.col("value")) * 2 / F.count("value")).alias("value"))
    )
    existing = _round(existing, {"value": 4})
    changes = _ldf(spark, 
        [("click", "2024-01-10 00:00:00", "2024-01-15 23:59:59"),
         ("error", "2024-01-10 00:00:00", "2024-01-15 23:59:59")],
        ["timeseries_id", "min_dt", "max_dt"],
    )

    def rollup(df):
        rolled = daily_rollup(df, keys=["timeseries_id"], dt_col="datetime",
                              value_col="value", agg_type="mean")
        return _round(rolled, {"value": 4}).select(
            "timeseries_id", "date", "value", "count"
        )

    out = incremental_daily_refresh(ev, changes, existing, rollup)
    return out.select(
        F.col("timeseries_id").alias("event_type"), "date", "value", "count",
        "merge_action",
    )


# ---------------------------------------------------------------------------
# §2.9 unit conversions (downloadNWIS imperial->metric, R/downloadNWIS.R:5)
# + inf_to_na cleaning (R/utils.R:785)
# ---------------------------------------------------------------------------

_UNIT_CONV_ORACLE = f"""
    WITH conv AS (
      SELECT * FROM (VALUES
        ('click',    0.3048,  0.0),   -- ft -> m
        ('view',     0.02832, 0.0),   -- cfs -> cms
        ('purchase', 1.0,     0.0),
        ('signup',   0.5556, -17.7778), -- F -> C
        ('error',    1.0,     0.0)
      ) AS c(event_type, factor, delta)
    ), converted AS (
      SELECT e.event_id, e.event_type,
             CASE WHEN e.event_id % 97 = 0 THEN CAST('infinity' AS DOUBLE)
                  ELSE e.value * c.factor + c.delta END AS converted
      FROM events e JOIN conv c ON e.event_type = c.event_type
    )
    SELECT event_id, event_type,
           {R("CASE WHEN isinf(converted) OR isnan(converted) THEN NULL "
              "ELSE converted END", 6)} AS converted_value
    FROM converted
"""

_UNIT_DIM = [
    ("click", 0.3048, 0.0),
    ("view", 0.02832, 0.0),
    ("purchase", 1.0, 0.0),
    ("signup", 0.5556, -17.7778),
    ("error", 1.0, 0.0),
]


@register("unit_conversions", oracle=_UNIT_CONV_ORACLE)
def unit_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.cleaning import inf_to_na

    ev = _t(spark, sf_dir, "events")
    conv = _ldf(spark, _UNIT_DIM, ["event_type", "factor", "delta"])
    converted = (
        ev.join(F.broadcast(conv), "event_type")
        .withColumn(
            "converted",
            F.when(F.col("event_id") % 97 == 0, F.lit(float("inf"))).otherwise(
                F.col("value") * F.col("factor") + F.col("delta")
            ),
        )
    )
    out = converted.select(
        "event_id", "event_type", inf_to_na(F.col("converted")).alias("converted_value")
    )
    return _round(out, {"converted_value": 6})


# ---------------------------------------------------------------------------
# §2.9 ISO-8601 period serialization (R/calculate_period.R:109-129)
# ---------------------------------------------------------------------------

_ISO_ORACLE = """
    WITH g AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP))
              - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER
                  (PARTITION BY event_type ORDER BY ts, event_id))) / 1000000.0 AS gap_s
      FROM events
    ), m AS (
      SELECT event_type,
             CAST(floor(quantile_cont(gap_s, 0.5)) AS BIGINT) AS s
      FROM g WHERE gap_s IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, s AS median_gap_seconds,
           'P' || (s // 86400) || 'DT' || ((s % 86400) // 3600) || 'H'
               || ((s % 3600) // 60) || 'M' || (s % 60) || 'S' AS period_iso
    FROM m
"""


@register("iso_period_format", oracle=_ISO_ORACLE)
def iso_period_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from .operators.period import iso8601_period

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) / 1e6).alias(
            "gap_s"
        ),
    ).where(F.col("gap_s").isNotNull())
    m = g.groupBy("event_type").agg(
        F.floor(F.expr("percentile(gap_s, 0.5D)")).cast("long").alias(
            "median_gap_seconds"
        )
    )
    return m.withColumn(
        "period_iso", iso8601_period(F.col("median_gap_seconds"))
    )


# ---------------------------------------------------------------------------
# §2.6 interval segment overlay: boundary split + new-wins resolution +
# adjacent-equal merge (R/adjust_functions.R:18-250)
# ---------------------------------------------------------------------------

_EXISTING_SEGS = [
    ("click", "2024-01-01 00:00:00", "2024-01-10 00:00:00", "A"),
    ("click", "2024-01-10 00:00:00", "2024-01-20 00:00:00", "B"),
    ("view", "2024-01-01 00:00:00", "2024-01-31 00:00:00", "A"),
    ("error", "2024-01-05 00:00:00", "2024-01-15 00:00:00", "N"),
]
_NEW_SEGS = [
    ("click", "2024-01-05 00:00:00", "2024-01-12 00:00:00", "C"),
    ("click", "2024-01-12 00:00:00", "2024-01-15 00:00:00", "B"),
    ("view", "2024-01-08 00:00:00", "2024-01-09 00:00:00", "A"),
    ("error", "2024-01-20 00:00:00", "2024-01-25 00:00:00", "B"),
]


def _segs_values(rows) -> str:
    return ", ".join(
        f"('{k}', TIMESTAMP '{s}', TIMESTAMP '{e}', '{v}')" for k, s, e, v in rows
    )


_SEGMENT_OVERLAY_ORACLE = f"""
    WITH existing(key, start_dt, end_dt, v) AS (
      VALUES {_segs_values(_EXISTING_SEGS)}
    ), new_segs(key, start_dt, end_dt, v) AS (
      VALUES {_segs_values(_NEW_SEGS)}
    ), allseg AS (
      SELECT key, start_dt, end_dt, v, 0 AS src FROM existing
      UNION ALL
      SELECT key, start_dt, end_dt, v, 1 AS src FROM new_segs
    ), bounds AS (
      SELECT DISTINCT key, b FROM (
        SELECT key, start_dt AS b FROM allseg
        UNION ALL SELECT key, end_dt FROM allseg
      )
    ), elems AS (
      SELECT key, b AS es, lead(b) OVER (PARTITION BY key ORDER BY b) AS ee
      FROM bounds
    ), covered AS (
      SELECT e.key, e.es, e.ee, a.v, a.src,
             row_number() OVER (PARTITION BY e.key, e.es, e.ee ORDER BY a.src DESC)
                 AS pick
      FROM elems e JOIN allseg a
        ON e.key = a.key AND a.start_dt <= e.es AND a.end_dt >= e.ee
      WHERE e.ee IS NOT NULL
    ), resolved AS (
      SELECT key, es, ee, v FROM covered WHERE pick = 1
    ), runs AS (
      SELECT *, CASE WHEN v IS NOT DISTINCT FROM lag(v) OVER w
                      AND lag(ee) OVER w = es THEN 0 ELSE 1 END AS new_run
      FROM resolved
      WINDOW w AS (PARTITION BY key ORDER BY es)
    ), numbered AS (
      SELECT *, sum(new_run) OVER (PARTITION BY key ORDER BY es
                                   ROWS UNBOUNDED PRECEDING) AS run
      FROM runs
    )
    SELECT key AS event_type, min(es) AS start_dt, max(ee) AS end_dt,
           min(v) AS value
    FROM numbered GROUP BY key, run
"""


@register("segment_overlay", oracle=_SEGMENT_OVERLAY_ORACLE)
def segment_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.segments import split_segments

    def seg_df(rows):
        return _ldf(spark, 
            rows, ["event_type", "start_dt", "end_dt", "value"]
        ).select(
            "event_type",
            F.col("start_dt").cast("timestamp").alias("start_dt"),
            F.col("end_dt").cast("timestamp").alias("end_dt"),
            "value",
        )

    out = split_segments(
        seg_df(_EXISTING_SEGS), seg_df(_NEW_SEGS), keys=["event_type"]
    )
    return out.select("event_type", "start_dt", "end_dt", "value")


# ---------------------------------------------------------------------------
# Similarity scale path: LSH-bucketed ANN (rows-only; recall vs the
# brute-force baseline asserted in tests/test_ann_recall.py)
# ---------------------------------------------------------------------------

def _ann_oracle() -> str:
    from .operators.similarity import hyperplanes

    planes = hyperplanes(6, 64)
    bucket = " || ".join(
        "(CASE WHEN list_dot_product(cv, ["
        + ", ".join(repr(c) for c in plane)
        + "]) >= 0 THEN '1' ELSE '0' END)"
        for plane in planes
    )
    return f"""
    WITH c AS (
      SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
    ), b AS (
      SELECT nid, cv, {bucket} AS bucket FROM c
    ), q AS (
      SELECT nid AS qid, cv AS qv, bucket FROM b WHERE nid < 10
    ), s AS (
      SELECT q.qid AS query_id, b.nid AS neighbor_id,
             list_dot_product(q.qv, b.cv)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(b.cv, b.cv))) AS cosine
      FROM q JOIN b USING (bucket) WHERE b.nid <> q.qid
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY floor(cosine * 1000000000.0 + 0.5) DESC,
                                            neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, {R('cosine', 6)} AS cosine, rank
    FROM r WHERE rank <= 5
"""


@register("ann_lsh_topk")
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import ann_topk_lsh

    emb = _t(spark, sf_dir, "embeddings")
    out = ann_topk_lsh(emb, emb.where(F.col("vec_id") < 10), k=5, planes=6)
    return _round(out, {"cosine": 6})


ORACLES["ann_lsh_topk"] = _ann_oracle()


# ---------------------------------------------------------------------------
# Similarity scale path: product quantization (asymmetric top-k over
# reconstructed codes). Deterministic codebooks (lowest-id seed slices,
# 1e-6-quantized) + 1e-6-quantized argmin keep every engine choosing
# the same codes; the oracle replays codebook build, encode, and the
# reconstruction ranking in SQL.
# ---------------------------------------------------------------------------

_PQ_ORACLE = f"""
    WITH c AS (
      SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
    ), seeds AS (
      SELECT cv, CAST(row_number() OVER (ORDER BY h, nid) - 1 AS INTEGER)
               AS seed
      FROM (SELECT nid,
                   CAST('0x' || substr(md5(CAST(nid AS VARCHAR)), 1, 15)
                     AS BIGINT) AS h,
                   cv
            FROM c ORDER BY h, nid LIMIT 8)
    ), cw AS (
      SELECT s.sub, seeds.seed AS code,
             list_transform(cv[s.sub * 16 + 1 : s.sub * 16 + 16],
                            x -> floor(x * 1000000 + 0.5) / 1000000) AS w
      FROM seeds, (SELECT unnest([0, 1, 2, 3]) AS sub) s
    ), subs AS (
      SELECT nid, s.sub, cv[s.sub * 16 + 1 : s.sub * 16 + 16] AS sv
      FROM c, (SELECT unnest([0, 1, 2, 3]) AS sub) s
    ), enc AS (
      SELECT nid, sub, code FROM (
        SELECT subs.nid, subs.sub, cw.code,
               row_number() OVER (
                 PARTITION BY subs.nid, subs.sub
                 ORDER BY CAST(floor(list_sum(list_transform(
                            generate_series(1, 16),
                            i -> (sv[i] - w[i]) * (sv[i] - w[i])))
                          * 1000000 + 0.5) AS BIGINT), cw.code) AS rk
        FROM subs JOIN cw USING (sub)
      ) WHERE rk = 1
    ), rec AS (
      SELECT e.nid, flatten(list(w ORDER BY e.sub)) AS xhat
      FROM enc e JOIN cw ON cw.sub = e.sub AND cw.code = e.code
      GROUP BY e.nid
    ), q AS (
      SELECT nid AS qid, cv AS qv FROM c WHERE nid < 10
    ), s AS (
      SELECT q.qid AS query_id, r2.nid AS neighbor_id,
             list_dot_product(q.qv, r2.xhat)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(r2.xhat, r2.xhat))) AS cosine
      FROM q, rec r2 WHERE q.qid <> r2.nid
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY floor(cosine * 1000000000.0 + 0.5) DESC,
                                            neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, {R('cosine', 6)} AS cosine, rank
    FROM r WHERE rank <= 5
"""


@register("ann_pq_topk", oracle=_PQ_ORACLE)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ compression tier: 64-dim floats -> m=4 one-byte codes (the
    64x memory reduction that keeps a 100 TB embedding index in
    cluster RAM); asymmetric ranking against full-precision queries.
    Recall vs the exact baseline gated in tests/test_ann_recall.py."""
    from .operators.similarity import ann_topk_pq

    emb = _t(spark, sf_dir, "embeddings")
    out = ann_topk_pq(emb, emb.where(F.col("vec_id") < 10), k=5, m=4, ksub=8)
    return _round(out, {"cosine": 6})




# ---------------------------------------------------------------------------
# §2.1 import-mapping DSL: source codes -> canonical ids with fallback
# (R/import_mappings.R:26; downloadEQWin parameter mapping,
# R/downloadEQWin.R:43)
# ---------------------------------------------------------------------------

_MAPPING_ORACLE = """
    WITH mapping AS (
      SELECT * FROM (VALUES
        ('BRASS',  'alloy'), ('COPPER', 'metal'), ('STEEL', 'metal'),
        ('TIN',    'metal'), ('NICKEL', 'metal')
      ) AS m(src_token, category)
    )
    SELECT p_partkey, p_type,
           coalesce(m.category, 'unmapped') AS category
    FROM part p
    LEFT JOIN mapping m
      ON upper(p.p_type) LIKE '%' || m.src_token || '%'
"""


@register("import_mapping_join", oracle=_MAPPING_ORACLE)
def import_mapping_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    mapping = _ldf(spark, 
        [("BRASS", "alloy"), ("COPPER", "metal"), ("STEEL", "metal"),
         ("TIN", "metal"), ("NICKEL", "metal")],
        ["src_token", "category"],
    )
    joined = part.join(
        F.broadcast(mapping),
        F.upper(part["p_type"]).contains(mapping["src_token"]),
        "left",
    )
    return joined.select(
        "p_partkey", "p_type",
        F.coalesce("category", F.lit("unmapped")).alias("category"),
    )


# ---------------------------------------------------------------------------
# §2.14 imputeMissing donor scoring: avg offset + sd per candidate
# (R/imputeMissing.R:883-887) over hourly-aligned series pairs
# ---------------------------------------------------------------------------

_DONOR_ORACLE = f"""
    WITH hourly AS (
      SELECT event_type,
             TIMESTAMP '1970-01-01'
               + CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) * 3600 AS BIGINT)
                 * INTERVAL 1 SECOND AS h,
             sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) / 1000000.0
               / count(value) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT t.event_type AS target, d.event_type AS donor,
           count(*) AS n_overlap,
           {R('sum(CAST(floor((d.v - t.v) * 1000000 + 0.5) AS BIGINT))'
              ' / 1000000.0 / count(*)', 4)} AS avg_offset,
           {R('stddev_samp(d.v - t.v)', 4)} AS sd_offset
    FROM hourly t JOIN hourly d
      ON t.h = d.h AND t.event_type <> d.event_type
    GROUP BY 1, 2
"""


@register("donor_offset_scoring", oracle=_DONOR_ORACLE)
def donor_offset_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.daily import exact_mean

    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            F.timestamp_seconds(
                F.floor(F.unix_timestamp("ts") / 3600) * 3600
            ).alias("h"),
        )
        .agg(exact_mean(F.col("value")).alias("v"))
    )
    t = hourly.select(F.col("event_type").alias("target"), "h",
                      F.col("v").alias("tv"))
    d = hourly.select(F.col("event_type").alias("donor"), "h",
                      F.col("v").alias("dv"))
    out = (
        t.join(d, "h")
        .where(F.col("target") != F.col("donor"))
        .groupBy("target", "donor")
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            _exact_mean_of(F.col("dv") - F.col("tv")).alias("avg_offset"),
            F.stddev_samp(F.col("dv") - F.col("tv")).alias("sd_offset"),
        )
    )
    return _round(out, {"avg_offset": 4, "sd_offset": 4})


# ---------------------------------------------------------------------------
# §2.14 imputeMissing donor fill, end to end (R/imputeMissing.R:1106-1107
# with min_gap/max_gap bounds :16-17): dense hourly grid for the target
# series, gaps of 2..24 missing points filled from the donor minus the
# mean donor-minus-target offset (:1106-1107 subtracts).
# Full pipeline: operators/impute_pipeline.py.
# ---------------------------------------------------------------------------

_FILL_ORACLE = f"""
    WITH pairs(tgt, d_et) AS (VALUES ('error', 'click'), ('signup', 'view')),
    bins AS (
      SELECT event_type AS et,
             TIMESTAMP '1970-01-01'
               + CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) * 3600 AS BIGINT)
                 * INTERVAL 1 SECOND AS h,
             sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) / 1000000.0
               / count(value) AS v
      FROM events
      WHERE event_type IN ('error', 'click', 'signup', 'view')
      GROUP BY 1, 2
    ),
    t AS (SELECT p.tgt, b.h, b.v AS tv FROM pairs p JOIN bins b ON b.et = p.tgt),
    d AS (SELECT p.tgt, b.h, b.v AS dv FROM pairs p JOIN bins b ON b.et = p.d_et),
    off AS (
      SELECT t.tgt,
             sum(CAST(floor((d.dv - t.tv) * 1000000 + 0.5) AS BIGINT))
               / 1000000.0 / count(*) AS avg_offset
      FROM t JOIN d ON d.tgt = t.tgt AND d.h = t.h GROUP BY 1
    ),
    bounds AS (SELECT tgt, min(h) AS lo, max(h) AS hi FROM t GROUP BY 1),
    spine AS (
      SELECT tgt, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ),
    g AS (
      SELECT s.tgt, s.h, t.tv, d.dv
      FROM spine s
      LEFT JOIN t ON t.tgt = s.tgt AND t.h = s.h
      LEFT JOIN d ON d.tgt = s.tgt AND d.h = s.h
    ),
    g2 AS (
      SELECT *, sum(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END)
                  OVER (PARTITION BY tgt ORDER BY h) AS gap_id
      FROM g
    ),
    g3 AS (
      SELECT *, sum(CASE WHEN tv IS NULL THEN 1 ELSE 0 END)
                  OVER (PARTITION BY tgt, gap_id) AS gap_len,
                (tv IS NULL AND dv IS NOT NULL
                 AND gap_len BETWEEN 2 AND 24) AS fillable
      FROM g2
    )
    SELECT g3.tgt AS target,
           h AS bin_start,
           {R('CASE WHEN tv IS NOT NULL THEN tv '
              'WHEN fillable THEN dv - off.avg_offset END', 4)}
             AS value,
           coalesce(tv IS NULL AND fillable, FALSE) AS imputed
    FROM g3 JOIN off ON off.tgt = g3.tgt
"""


@register("impute_donor_fill", oracle=_FILL_ORACLE)
def impute_donor_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-target donor fill (imputeMissing.R:1106-1107): two target
    series filled in ONE pass, every window partitioned by target — the
    per-catalog scale shape (round-1 ran one global ordered window).
    Offsets are donor-minus-target and are SUBTRACTED from the donor.
    """
    from pyspark.sql import Window
    from .operators.daily import exact_mean

    ev = _t(spark, sf_dir, "events")
    pairs = F.broadcast(_ldf(ev.sparkSession, 
        [("error", "click"), ("signup", "view")], ["tgt", "d_et"]
    ))
    # target/donor legs, offsets and the spine all branch from the
    # hourly bins — materialize them once instead of re-aggregating
    # the fact table per branch
    bins = (
        ev.where(F.col("event_type").isin("error", "click", "signup", "view"))
        .groupBy(
            F.col("event_type").alias("et"),
            F.timestamp_seconds(
                F.floor(F.unix_timestamp("ts") / 3600) * 3600
            ).alias("h"),
        )
        .agg(exact_mean(F.col("value")).alias("v"))
        .persist()
    )
    t = bins.join(pairs, bins["et"] == pairs["tgt"]).select(
        "tgt", "h", F.col("v").alias("tv")
    )
    d = bins.join(pairs, bins["et"] == pairs["d_et"]).select(
        "tgt", "h", F.col("v").alias("dv")
    )
    off = (
        t.join(d, ["tgt", "h"])
        .groupBy("tgt")
        .agg(_exact_mean_of(F.col("dv") - F.col("tv")).alias("avg_offset"))
    )
    spine = (
        t.groupBy("tgt")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select("tgt", F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"))
    )
    g = (
        spine.join(t, ["tgt", "h"], "left").join(d, ["tgt", "h"], "left")
        .join(F.broadcast(off), "tgt")
    )
    w = Window.partitionBy("tgt").orderBy("h")
    g = g.withColumn(
        "gap_id", F.sum(F.when(F.col("tv").isNotNull(), 1).otherwise(0)).over(w)
    )
    g = g.withColumn(
        "gap_len",
        F.sum(F.when(F.col("tv").isNull(), 1).otherwise(0)).over(
            Window.partitionBy("tgt", "gap_id")
        ),
    )
    fillable = (
        F.col("tv").isNull() & F.col("dv").isNotNull()
        & F.col("gap_len").between(2, 24)
    )
    out = g.select(
        F.col("tgt").alias("target"),
        F.col("h").alias("bin_start"),
        F.when(F.col("tv").isNotNull(), F.col("tv"))
        .when(fillable, F.col("dv") - F.col("avg_offset"))
        .alias("value"),
        (F.col("tv").isNull() & fillable).alias("imputed"),
    )
    return _round(out, {"value": 4})


# ---------------------------------------------------------------------------
# Similarity scale path #2: IVF ANN (inverted lists over deterministic
# centroid seeds; nprobe probed lists per query). Recall vs brute force
# asserted in tests/test_ann_recall.py.
# ---------------------------------------------------------------------------

_IVF_COS = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)


def _dot_sql(a: str, b: str, dim: int = 64) -> str:
    """Explicit left-associative dot product — bit-identical to the
    Spark side's sequential ``F.aggregate`` fold (((0+x1)+x2)+…), so
    argmax decisions in iterated k-means cannot drift between engines."""
    return "(" + " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(1, dim + 1)) + ")"


def _cos_sql(a: str, b: str, dim: int = 64) -> str:
    return (
        f"{_dot_sql(a, b, dim)} / (sqrt({_dot_sql(a, a, dim)})"
        f" * sqrt({_dot_sql(b, b, dim)}))"
    )


def _kmeans_cte(nlist: int = 16, iters: int = 3, dim: int = 64,
                corp_sql: str | None = None) -> str:
    """CTE chain replaying operators/similarity.kmeans_centroids: seeds
    = nlist lowest-id vectors quantized to 1e-6; each iteration assigns
    by cosine argmax (ties -> lowest cid) and re-centers with the
    quantized integer-sum mean. Ends with ``cent_f(cid, centv)``.
    ``corp_sql`` overrides the corpus CTE body (must yield
    (vec_id, emb DOUBLE[]))."""
    Q = "1000000.0"
    seed_list = "[" + ", ".join(
        f"floor(emb[{i}] * {Q} + 0.5) / {Q}" for i in range(1, dim + 1)
    ) + "]"
    mean_list = "[" + ", ".join(
        f"floor(sum(CAST(floor(emb[{i}] * {Q} + 0.5) AS BIGINT)) * 1.0"
        f" / count(*) + 0.5) / {Q}"
        for i in range(1, dim + 1)
    ) + "]"
    corp_body = corp_sql or (
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings"
    )
    sql = f"""
    corp AS (
      {corp_body}
    ), cent_0 AS (
      SELECT (row_number() OVER (ORDER BY h, vec_id)) - 1 AS cid,
             {seed_list} AS centv
      FROM (SELECT vec_id,
                   CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                     AS BIGINT) AS h,
                   emb
            FROM corp ORDER BY h, vec_id LIMIT {nlist})
    )"""
    for t in range(iters):
        sql += f"""
    , assign_{t} AS (
      SELECT vec_id, emb, cid FROM (
        SELECT corp.vec_id, corp.emb, c.cid,
               row_number() OVER (PARTITION BY corp.vec_id
                 ORDER BY floor(({_cos_sql('corp.emb', 'c.centv', dim)})
                                * 1000000000.0 + 0.5) DESC,
                          c.cid) AS rn
        FROM corp, cent_{t} c) WHERE rn = 1
    ), upd_{t} AS (
      SELECT cid, {mean_list} AS centv FROM assign_{t} GROUP BY cid
    ), cent_{t + 1} AS (
      SELECT c.cid, COALESCE(u.centv, c.centv) AS centv
      FROM cent_{t} c LEFT JOIN upd_{t} u USING (cid)
    )"""
    return sql + f"""
    , cent_f AS (SELECT cid, centv FROM cent_{iters})"""


_KMEANS_CENTROIDS_ORACLE = "WITH " + _kmeans_cte(16, 3, 64) + f"""
    SELECT cid AS centroid_id, CAST(i AS BIGINT) AS pos,
           {R('centv[CAST(i AS INTEGER)]', 6)} AS value
    FROM cent_f, (SELECT unnest(generate_series(1, 64)) AS i)
"""


# SemDeDup (Abbas et al. 2023): deterministic k-means partition, then
# within-cluster "similar to any lower-centroid-sim member -> drop".
# The corpus is the embeddings table UNIONed with perturbed twins
# (v'_k = v_k + 0.05 * v_{(k mod 64)+1}, ids +100000) so the prune has
# real semantic duplicates to find; every stage — Lloyd iterations,
# final assignment, rank, pairwise cosine gate — replays in SQL.
_SEMDEDUP_CORP_SQL = """
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      UNION ALL
      SELECT vec_id + 100000,
             [CAST(embedding[i] AS DOUBLE)
              + 0.05 * CAST(embedding[(i % 64) + 1] AS DOUBLE)
              for i in generate_series(1, 64)] AS emb
      FROM embeddings WHERE vec_id % 5 = 0
"""

_SEMDEDUP_ORACLE = "WITH " + _kmeans_cte(
    16, 3, 64, corp_sql=_SEMDEDUP_CORP_SQL) + f"""
    , afin AS MATERIALIZED (
      SELECT vec_id, emb, cid, s FROM (
        SELECT corp.vec_id, corp.emb, c.cid,
               floor(({_cos_sql('corp.emb', 'c.centv', 64)})
                     * 1000000000.0 + 0.5) AS s,
               row_number() OVER (PARTITION BY corp.vec_id
                 ORDER BY floor(({_cos_sql('corp.emb', 'c.centv', 64)})
                                * 1000000000.0 + 0.5) DESC,
                          c.cid) AS rn
        FROM corp, cent_f c) WHERE rn = 1
    ), dropped AS (
      SELECT DISTINCT a.vec_id
      FROM afin a JOIN afin b ON a.cid = b.cid
      WHERE (b.s < a.s OR (b.s = a.s AND b.vec_id < a.vec_id))
        AND floor(({_cos_sql('a.emb', 'b.emb', 64)})
                  * 1000000000.0 + 0.5) >= 950000000
    )
    SELECT a.vec_id, a.cid AS centroid_id,
           {R('a.s / 1000000000.0', 6)} AS centroid_sim,
           d.vec_id IS NULL AS kept
    FROM afin a LEFT JOIN dropped d USING (vec_id)
"""


@register("semdedup_prune", oracle=_SEMDEDUP_ORACLE)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    twins = emb.where(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            vec,
            lambda x, i: x.cast("double")
            + 0.05 * F.element_at(vec, ((i + 1) % 64 + 1).cast("int"))
            .cast("double"),
        ).alias("embedding"),
    )
    corpus = emb.select(
        "vec_id",
        F.transform(vec, lambda x: x.cast("double")).alias("embedding"),
    ).unionByName(twins)
    out = semantic_dedup(corpus, threshold=0.95)
    return _round(out, {"centroid_sim": 6})


# Capped variant: max_cluster=2 restricts the comparison side to each
# cluster's top-2 keep-priority members (rank by centroid-sim ASC, id
# ASC) — the degenerate-cluster guard that makes pair mass linear at
# 100 TB. cap=2 is far below real cluster sizes at test SFs, so the
# capped code path (rank window + restricted join) is what the hash
# verifies, not a no-op.
_SEMDEDUP_CAPPED_ORACLE = "WITH " + _kmeans_cte(
    16, 3, 64, corp_sql=_SEMDEDUP_CORP_SQL) + f"""
    , afin AS MATERIALIZED (
      SELECT vec_id, emb, cid, s FROM (
        SELECT corp.vec_id, corp.emb, c.cid,
               floor(({_cos_sql('corp.emb', 'c.centv', 64)})
                     * 1000000000.0 + 0.5) AS s,
               row_number() OVER (PARTITION BY corp.vec_id
                 ORDER BY floor(({_cos_sql('corp.emb', 'c.centv', 64)})
                                * 1000000000.0 + 0.5) DESC,
                          c.cid) AS rn
        FROM corp, cent_f c) WHERE rn = 1
    ), banded AS MATERIALIZED (
      SELECT vec_id, emb, cid, s FROM (
        SELECT vec_id, emb, cid, s,
               row_number() OVER (PARTITION BY cid
                 ORDER BY s ASC, vec_id ASC) AS crank
        FROM afin) WHERE crank <= 2
    ), dropped AS (
      SELECT DISTINCT a.vec_id
      FROM afin a JOIN banded b ON a.cid = b.cid
      WHERE (b.s < a.s OR (b.s = a.s AND b.vec_id < a.vec_id))
        AND floor(({_cos_sql('a.emb', 'b.emb', 64)})
                  * 1000000000.0 + 0.5) >= 950000000
    )
    SELECT a.vec_id, a.cid AS centroid_id,
           {R('a.s / 1000000000.0', 6)} AS centroid_sim,
           d.vec_id IS NULL AS kept
    FROM afin a LEFT JOIN dropped d USING (vec_id)
"""


@register("semdedup_capped_prune", oracle=_SEMDEDUP_CAPPED_ORACLE)
def semdedup_capped_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    twins = emb.where(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            vec,
            lambda x, i: x.cast("double")
            + 0.05 * F.element_at(vec, ((i + 1) % 64 + 1).cast("int"))
            .cast("double"),
        ).alias("embedding"),
    )
    corpus = emb.select(
        "vec_id",
        F.transform(vec, lambda x: x.cast("double")).alias("embedding"),
    ).unionByName(twins)
    out = semantic_dedup(corpus, threshold=0.95, max_cluster=2)
    return _round(out, {"centroid_sim": 6})


@register("ivf_kmeans_centroids", oracle=_KMEANS_CENTROIDS_ORACLE)
def ivf_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained IVF centroids: 3 deterministic Lloyd iterations over the
    embedding corpus (quantized integer-sum updates — engine- and
    partitioning-reproducible). The oracle replays the identical
    iterations in SQL; a drift in any assignment or mean surfaces as a
    hash mismatch on the exploded (centroid, component) table."""
    from .operators.similarity import kmeans_centroids

    emb = _t(spark, sf_dir, "embeddings")
    cent = kmeans_centroids(emb, nlist=16, iters=3, dim=64)
    out = cent.select(
        "centroid_id", F.posexplode("__centv").alias("pos", "value")
    ).withColumn("pos", (F.col("pos") + 1).cast("long"))
    return _round(out, {"value": 6})


_IVF_ORACLE = f"""
    WITH corp AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cent AS (
      SELECT vec_id AS centroid_id, v AS cv FROM corp
      ORDER BY CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                 AS BIGINT), vec_id LIMIT 16
    ), lists AS (
      SELECT vec_id AS neighbor_id, centroid_id, v FROM (
        SELECT corp.vec_id, cent.centroid_id, corp.v,
               row_number() OVER (
                 PARTITION BY corp.vec_id
                 ORDER BY floor(({_IVF_COS.format(a='corp.v', b='cent.cv')})
                                * 1000000000.0 + 0.5) DESC,
                          cent.centroid_id) AS rn
        FROM corp, cent) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, centroid_id, v AS qv FROM (
        SELECT corp.vec_id, cent.centroid_id, corp.v,
               row_number() OVER (
                 PARTITION BY corp.vec_id
                 ORDER BY floor(({_IVF_COS.format(a='corp.v', b='cent.cv')})
                                * 1000000000.0 + 0.5) DESC,
                          cent.centroid_id) AS rn
        FROM corp, cent WHERE corp.vec_id < 10) WHERE rn <= 4
    ), s AS (
      SELECT probes.query_id, lists.neighbor_id,
             {_IVF_COS.format(a='probes.qv', b='lists.v')} AS cosine
      FROM probes JOIN lists USING (centroid_id)
      WHERE lists.neighbor_id <> probes.query_id
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY floor(cosine * 1000000000.0 + 0.5) DESC,
                                            neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, {R('cosine', 6)} AS cosine, rank
    FROM r WHERE rank <= 5
"""


@register("ann_ivf_topk", oracle=_IVF_ORACLE)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (SURVEY north-star similarity scale path): inverted-list
    assignment on deterministic centroid seeds, nprobe=4 of nlist=16
    lists probed per query."""
    from .operators.similarity import ann_topk_ivf

    emb = _t(spark, sf_dir, "embeddings")
    out = ann_topk_ivf(
        emb, emb.where(F.col("vec_id") < 10), k=5, nlist=16, nprobe=4
    )
    return _round(out, {"cosine": 6})


# ---------------------------------------------------------------------------
# IVF x PQ composition — probe-pruned AND compressed, the production
# serving shape. The oracle glues the IVF list/probe CTEs to the PQ
# codebook/encode/reconstruct CTEs and ranks within probed lists only.
# ---------------------------------------------------------------------------

_IVFPQ_ORACLE = f"""
    WITH corp AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cent AS (
      SELECT vec_id AS centroid_id, v AS cv FROM corp
      ORDER BY CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                 AS BIGINT), vec_id LIMIT 16
    ), lists AS (
      SELECT vec_id AS neighbor_id, centroid_id, v FROM (
        SELECT corp.vec_id, cent.centroid_id, corp.v,
               row_number() OVER (
                 PARTITION BY corp.vec_id
                 ORDER BY floor(({_IVF_COS.format(a='corp.v', b='cent.cv')})
                                * 1000000000.0 + 0.5) DESC,
                          cent.centroid_id) AS rn
        FROM corp, cent) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, centroid_id, v AS qv FROM (
        SELECT corp.vec_id, cent.centroid_id, corp.v,
               row_number() OVER (
                 PARTITION BY corp.vec_id
                 ORDER BY floor(({_IVF_COS.format(a='corp.v', b='cent.cv')})
                                * 1000000000.0 + 0.5) DESC,
                          cent.centroid_id) AS rn
        FROM corp, cent WHERE corp.vec_id < 10) WHERE rn <= 4
    ), seeds AS (
      SELECT v AS scv,
             CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INTEGER)
               AS seed
      FROM (SELECT vec_id,
                   CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                     AS BIGINT) AS h,
                   v
            FROM corp ORDER BY h, vec_id LIMIT 8)
    ), cw AS (
      SELECT s.sub, seeds.seed AS code,
             list_transform(scv[s.sub * 16 + 1 : s.sub * 16 + 16],
                            x -> floor(x * 1000000 + 0.5) / 1000000) AS w
      FROM seeds, (SELECT unnest([0, 1, 2, 3]) AS sub) s
    ), subs AS (
      SELECT neighbor_id AS nid, centroid_id, s.sub,
             v[s.sub * 16 + 1 : s.sub * 16 + 16] AS sv
      FROM lists, (SELECT unnest([0, 1, 2, 3]) AS sub) s
    ), enc AS (
      SELECT nid, centroid_id, sub, code FROM (
        SELECT subs.nid, subs.centroid_id, subs.sub, cw.code,
               row_number() OVER (
                 PARTITION BY subs.nid, subs.sub
                 ORDER BY CAST(floor(list_sum(list_transform(
                            generate_series(1, 16),
                            i -> (sv[i] - w[i]) * (sv[i] - w[i])))
                          * 1000000 + 0.5) AS BIGINT), cw.code) AS rk
        FROM subs JOIN cw USING (sub)
      ) WHERE rk = 1
    ), rec AS (
      SELECT e.nid, e.centroid_id, flatten(list(w ORDER BY e.sub)) AS xhat
      FROM enc e JOIN cw ON cw.sub = e.sub AND cw.code = e.code
      GROUP BY e.nid, e.centroid_id
    ), s AS (
      SELECT probes.query_id, rec.nid AS neighbor_id,
             list_dot_product(probes.qv, rec.xhat)
               / (sqrt(list_dot_product(probes.qv, probes.qv))
                  * sqrt(list_dot_product(rec.xhat, rec.xhat))) AS cosine
      FROM probes JOIN rec USING (centroid_id)
      WHERE rec.nid <> probes.query_id
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY floor(cosine * 1000000000.0 + 0.5) DESC,
                                            neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, {R('cosine', 6)} AS cosine, rank
    FROM r WHERE rank <= 5
"""


@register("ann_ivfpq_topk", oracle=_IVFPQ_ORACLE)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe pruning x PQ compression: each query scans ~nprobe/
    nlist of the corpus AND reads only 4 one-byte codes per scanned
    vector — compute and memory pruned together, which is how a 100 TB
    embedding store actually serves."""
    from .operators.similarity import ann_topk_ivfpq

    emb = _t(spark, sf_dir, "embeddings")
    out = ann_topk_ivfpq(
        emb, emb.where(F.col("vec_id") < 10),
        k=5, nlist=16, nprobe=4, m=4, ksub=8,
    )
    return _round(out, {"cosine": 6})


# ---------------------------------------------------------------------------
# §2.4 nearest-station spatial search (R/imputeMissing.R:546-548,896):
# ST_DWithin radius filter + ST_Distance ordering, re-expressed as a
# haversine expression over broadcast target stations. Locations are
# synthesized deterministically from keys (the driver tables carry no
# lat/lon); the same arithmetic runs on both engines.
# ---------------------------------------------------------------------------

def _latlon_sql(key: str) -> tuple[str, str]:
    lat = f"(({key}) * 7919 % 18000) / 100.0 - 90.0"
    lon = f"(({key}) * 104729 % 36000) / 100.0 - 180.0"
    return lat, lon


_SLAT, _SLON = _latlon_sql("s_suppkey")
_CLAT, _CLON = _latlon_sql("c_custkey")

_HAVERSINE_SQL = """
    2 * 6371.0088 * asin(sqrt(
      sin(radians(({lat2}) - ({lat1})) / 2) * sin(radians(({lat2}) - ({lat1})) / 2)
      + cos(radians({lat1})) * cos(radians({lat2}))
        * sin(radians(({lon2}) - ({lon1})) / 2) * sin(radians(({lon2}) - ({lon1})) / 2)
    ))
"""

_NEAREST_ORACLE = f"""
    WITH stations AS (
      SELECT s_suppkey AS station_id, {_SLAT} AS lat, {_SLON} AS lon
      FROM supplier
    ), targets AS (
      SELECT c_custkey AS target_id, {_CLAT} AS lat, {_CLON} AS lon
      FROM customer WHERE c_custkey <= 20
    ), scored AS (
      -- dist quantized to 1e-6 km at computation: sin/cos/asin differ
      -- in last ulps between JVM Math and libm, so every downstream
      -- comparison (radius, rank, 1e-3 rounding) uses the quantum
      SELECT t.target_id, s.station_id,
             floor(({_HAVERSINE_SQL.format(lat1='t.lat', lon1='t.lon',
                                           lat2='s.lat', lon2='s.lon')})
                   * 1000000 + 0.5) / 1000000 AS dist_km
      FROM targets t, stations s
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY target_id
                                   ORDER BY dist_km, station_id) AS rank
      FROM scored WHERE dist_km <= 3000.0
    )
    SELECT target_id, station_id, {R('dist_km', 3)} AS dist_km, rank
    FROM ranked WHERE rank <= 3
"""


@register("nearest_station_search", oracle=_NEAREST_ORACLE)
def nearest_station_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 stations within 3000 km of each target, by haversine.

    The target set is catalog-sized → broadcast; the station scan is
    map-only (no shuffle of the big side), so the plan is a single pass
    over stations + a per-target top-k — the 100 TB shape."""
    from pyspark.sql import Window

    def latlon(key):
        return (
            (key * 7919 % 18000) / 100.0 - 90.0,
            (key * 104729 % 36000) / 100.0 - 180.0,
        )

    sup = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    slat, slon = latlon(F.col("s_suppkey"))
    clat, clon = latlon(F.col("c_custkey"))
    stations = sup.select(
        F.col("s_suppkey").alias("station_id"),
        slat.alias("s_lat"), slon.alias("s_lon"),
    )
    targets = cust.where(F.col("c_custkey") <= 20).select(
        F.col("c_custkey").alias("target_id"),
        clat.alias("t_lat"), clon.alias("t_lon"),
    )

    def hav2(x):
        s = F.sin(F.radians(x) / 2)
        return s * s

    dist = (
        2 * 6371.0088 * F.asin(F.sqrt(
            hav2(F.col("s_lat") - F.col("t_lat"))
            + F.cos(F.radians("t_lat")) * F.cos(F.radians("s_lat"))
            * hav2(F.col("s_lon") - F.col("t_lon"))
        ))
    )
    w = Window.partitionBy("target_id").orderBy("dist_km", "station_id")
    out = (
        stations.crossJoin(F.broadcast(targets))
        # 1e-6 km quantization — see the oracle note
        .withColumn("dist_km", F.floor(dist * 1e6 + F.lit(0.5)) / 1e6)
        .where(F.col("dist_km") <= 3000.0)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("target_id", "station_id", "dist_km", "rank")
    )
    return _round(out, {"dist_km": 3})


# ---------------------------------------------------------------------------
# §2.1 connector payload parsing, end to end on canned fixtures — the
# reference's own network-free strategy (tests/testthat/test-downloadWSC.R;
# fixtures/swob-minute-0000.xml). The Spark side runs the real parser +
# code mapping (sources/wsc.py, nwis.py, xml_swob.py); the oracle reads
# the same fixture file and replays the mapping in SQL.
# ---------------------------------------------------------------------------

import pathlib as _pathlib

from .sources.dims import (APPROVAL_CODES as _AC, GRADE_CODES as _GC,
                           QUALIFIER_CODES as _QC, type_code_to_id as _tid)

_FIXDIR = _pathlib.Path(__file__).resolve().parent.parent / "fixtures" / "connectors"
_AID, _QID, _GID = _tid(_AC), _tid(_QC), _tid(_GC)

_WSC_ORACLE = f"""
    WITH raw AS (
      SELECT CAST("Date" AS TIMESTAMP) AS datetime,
             TRY_CAST("Value/Valeur" AS DOUBLE) AS value,
             "Approval/Approbation" AS approval_raw,
             TRY_CAST("Qualifiers/Qualificatifs" AS INTEGER) AS qualifier_raw
      FROM read_csv('{_FIXDIR / "wsc_09EA004.csv"}', header=true,
                    all_varchar=true)
    ), mapped AS (
      SELECT datetime, value,
        CASE approval_raw
          WHEN 'Final/Finales' THEN {_AID['A']}
          WHEN 'Approved/Approuvée' THEN {_AID['A']}
          WHEN 'Provisional/Provisoire' THEN {_AID['N']}
          WHEN 'Preliminary/Préliminaire' THEN {_AID['N']}
          WHEN 'Checked/Verifiée' THEN {_AID['R']}
          WHEN 'Unspecified/Non spécifié' THEN {_AID['UNS']}
          WHEN 'Undefined/Non défini' THEN {_AID['UNS']}
          ELSE 6 END AS approval,
        CASE qualifier_raw
          WHEN -1 THEN {_QID['UNS']} WHEN 10 THEN {_QID['ICE']}
          WHEN 20 THEN {_QID['EST']} WHEN 30 THEN {_QID['UNK']}
          WHEN 40 THEN {_QID['DRY']} WHEN 50 THEN {_QID['UNK']}
          WHEN -2 THEN {_QID['UNK']} WHEN 0 THEN {_QID['UNK']}
          ELSE {_QID['UNK']} END AS qualifier
      FROM raw WHERE value IS NOT NULL
    )
    SELECT CAST(datetime AS DATE) AS date,
           {R(DSUM('value') + ' / count(*)', 6)} AS value,
           count(*) AS n,
           CAST(sum(CASE WHEN qualifier = {_QID['ICE']} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ice,
           CAST(sum(CASE WHEN approval = {_AID['A']} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_approved
    FROM mapped GROUP BY 1
"""


@register("wsc_connector_daily", oracle=_WSC_ORACLE)
def wsc_connector_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canned WSC realtime payload through the full connector path:
    parse (header-mapped CSV) -> qualifier/approval/grade code mapping
    (R/downloadWSC.R:107-231) -> contract validation -> daily rollup."""
    from .operators.daily import exact_sum
    from .sources.registry import get_source, validate_contract

    out = get_source("downloadWSC")(
        spark, location="09EA004", parameter=47,
        start_datetime="2026-03-01 00:00:00",
        end_datetime="2026-03-03 00:00:00",
        payload_path=str(_FIXDIR / "wsc_09EA004.csv"),
    )
    rolled = (
        validate_contract(out)
        .groupBy(F.to_date("datetime").alias("date"))
        .agg(
            (exact_sum(F.col("value")) / F.count("*")).alias("value"),
            F.count("*").alias("n"),
            F.sum(F.when(F.col("qualifier") == _QID["ICE"], 1).otherwise(0))
            .alias("n_ice"),
            F.sum(F.when(F.col("approval") == _AID["A"], 1).otherwise(0))
            .alias("n_approved"),
        )
    )
    return _round(rolled, {"value": 6})


_NWIS_ORACLE = f"""
    WITH raw AS (
      -- RDB datetimes carry no seconds; DuckDB's cast requires them
      SELECT CAST(datetime || ':00' AS TIMESTAMP) AS datetime,
             TRY_CAST("69928_00060" AS DOUBLE) AS value,
             "69928_00060_cd" AS combined
      FROM read_csv('{_FIXDIR / "nwis_09380000.rdb"}', delim='\t',
                    header=true, skip=5, all_varchar=true)
      WHERE agency_cd = 'USGS'
    ), conv AS (
      SELECT datetime, value * 0.028316832 AS value, combined,
             regexp_extract(combined, '^([APR])', 1) AS lead_letter,
             CASE WHEN trim(regexp_replace(combined, '^[APR](.*)$', '\\1')) = ''
                  THEN 'U'
                  ELSE trim(regexp_replace(combined, '^[APR](.*)$', '\\1'))
             END AS rest
      FROM raw WHERE value IS NOT NULL
    )
    SELECT datetime, {R('value', 6)} AS value,
      CASE lead_letter WHEN 'A' THEN {_AID['A']} WHEN 'P' THEN {_AID['N']}
           WHEN 'R' THEN {_AID['A']} ELSE {_AID['UNK']} END AS approval,
      CASE rest WHEN 'e' THEN {_QID['EST']} WHEN 'ice' THEN {_QID['ICE']}
           WHEN 'Ice i' THEN {_QID['ICE']} WHEN '<' THEN {_QID['EST']}
           WHEN '>' THEN {_QID['EST']} ELSE {_QID['UNK']} END AS qualifier
    FROM conv
"""


@register("nwis_connector_normalize", oracle=_NWIS_ORACLE)
def nwis_connector_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canned NWIS RDB payload through the connector: header-mapped
    parse, NA drop, cfs->cms conversion, approval/qualifier extraction
    from the combined code (R/downloadNWIS.R:135-207)."""
    from .sources.registry import get_source

    out = get_source("downloadNWIS")(
        spark, location="09380000", parameter="00060",
        start_datetime="2026-03-01 00:00:00",
        end_datetime="2026-03-03 00:00:00",
        payload_path=str(_FIXDIR / "nwis_09380000.rdb"),
    )
    return _round(out.select("datetime", "value", "approval", "qualifier"),
                  {"value": 6})


_SWOB_ORACLE = f"""
    WITH raw AS (
      SELECT file_idx,
             CAST(replace(left(datetime, 23), 'T', ' ') AS TIMESTAMP)
               AS datetime,
             TRY_CAST(value AS DOUBLE) AS value
      FROM read_csv('{_FIXDIR / "swob_expected.csv"}', header=true,
                    all_varchar=true)
      WHERE name = 'air_temp'
    ), dedup AS (
      SELECT datetime, value,
             row_number() OVER (PARTITION BY datetime
                                ORDER BY file_idx DESC) AS rk
      FROM raw WHERE value IS NOT NULL
    )
    SELECT datetime, {R('value', 4)} AS value,
           {_GID['UNS']} AS grade, {_AID['UNS']} AS approval,
           {_QID['UNS']} AS qualifier, 2 AS owner, 2 AS contributor
    FROM dedup WHERE rk = 1
"""


@register("swob_minute_normalize", oracle=_SWOB_ORACLE)
def swob_minute_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canned SWOB-ML minute files through the connector: om: XML parse,
    alias resolution, keep-last datetime dedupe, QC defaults
    (R/downloadECCCwxMinute.R:36-159). The oracle reads the expected-
    values mirror of the same fixtures, so a Spark XML parsing bug
    surfaces as a value mismatch."""
    from .sources.registry import get_source

    out = get_source("downloadECCCwxMinute")(
        spark, location="CVXY", parameter="temp",
        start_datetime="2026-03-15 00:00:00",
        end_datetime="2026-03-15 23:59:59",
        path=str(_FIXDIR / "swob"),
    )
    return _round(out, {"value": 4})


_AQ_EXPECTED = _FIXDIR / "aquarius_expected.csv"

_AQUARIUS_ORACLE = f"""
    SELECT CAST(datetime AS TIMESTAMP) AS datetime,
           {R('CAST(value AS DOUBLE)', 4)} AS value,
           CAST(grade AS BIGINT) AS grade,
           CAST(approval AS BIGINT) AS approval,
           qualifier
    FROM read_csv('{_AQ_EXPECTED}', header=true, all_varchar=true)
"""


@register("aquarius_connector_normalize", oracle=_AQUARIUS_ORACLE)
def aquarius_connector_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canned Aquarius payload through the full connector
    (R/downloadAquarius.R:30-574): offset-timestamp parse, NA drop,
    exact-dup drop, approval/grade/qualifier code mapping with UNK
    fallback, per-level qualifier overlap collapse, boundary SNAPPING
    to point times, later-interval overwrite, qualifier comma-append,
    UNS fills. The oracle reads the expected mirror computed by an
    independent loop-based replica of the R semantics
    (fixtures/connectors/gen_aquarius.py)."""
    from .sources.registry import get_source

    out = get_source("downloadAquarius")(
        spark, location="09AA-M3", parameter="Wind Gust Vel.Corrected",
        start_datetime="2025-01-10 00:00:00",
        end_datetime="2025-01-11 00:00:00",
        payload_path=str(_FIXDIR / "aquarius_09AA-M3.json"),
    )
    return _round(
        out.select("datetime", "value", "grade", "approval", "qualifier"),
        {"value": 4},
    )


_ECCC_ORACLE = f"""
    SELECT CAST(time AS TIMESTAMP) AS datetime,
           {R('TRY_CAST(wind_dir AS DOUBLE) * 10.0', 4)} AS value,
           8 AS grade, 6 AS approval, 6 AS qualifier,
           2 AS owner, 2 AS contributor
    FROM read_csv('{_FIXDIR / "ecccwx_hourly_50430.csv"}', header=true,
                  all_varchar=true)
    WHERE CAST(time AS TIMESTAMP) >= TIMESTAMP '2024-03-01 06:00:00'
      AND CAST(time AS TIMESTAMP) <= TIMESTAMP '2024-03-02 18:00:00'
      AND TRY_CAST(wind_dir AS DOUBLE) IS NOT NULL
"""


@register("eccc_connector_fanout", oracle=_ECCC_ORACLE)
def eccc_connector_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canned weathercan hourly table through the ECCC weather
    connector (R/downloadECCCwx.R:17-188): wide-table column fan-out,
    inclusive window filter, NA drop, wind_dir tens-of-degrees ×10,
    UNS QC defaults, ECCC organization stamping."""
    from .sources.registry import get_source

    out = get_source("downloadECCCwx")(
        spark, location="50430", parameter="wind_dir",
        start_datetime="2024-03-01 06:00:00",
        end_datetime="2024-03-02 18:00:00", interval="hour",
        payload_path=str(_FIXDIR / "ecccwx_hourly_50430.csv"),
    )
    return _round(out, {"value": 4})


# ---------------------------------------------------------------------------
# §2.12 refresh_calculated_daily END-TO-END (patch_48.R:215-702): corrected
# read -> daily rollup -> dense spine -> DOY stats -> hist-count NULL
# ladder -> Feb-29 smoothing (skip-guarded) -> tail trim, as ONE
# composition. The stages are individually green elsewhere; this query
# pins their ORDER (e.g. trim-before-smooth would starve a trailing
# Feb-29 row of its Mar-1 neighbor).
# ---------------------------------------------------------------------------

ORDER_CORRECTIONS = [
    Correction(1, "1-URGENT", "1996-01-01 00:00:00", "1997-01-01 00:00:00",
               "trim", value1=20000.0, value2=400000.0),
    Correction(2, "2-HIGH", "1996-06-01 00:00:00", "1997-06-01 00:00:00",
               "offset_linear", value1=5000.0),
    Correction(3, "3-MEDIUM", "1995-03-01 00:00:00", "1996-03-01 00:00:00",
               "scale", value1=110.0),
    Correction(4, "5-LOW", "1997-01-01 00:00:00", "1997-07-01 00:00:00",
               "drift_linear", value1=1000.0,
               timestep_window_seconds=2592000.0),
]

_REFRESH_LADDER_AVG = ("q90", "q75", "q50", "q25", "q10", "mean")

def _refresh_tail_sql(last_raw_sql: str) -> str:
    """The refresh_calculated_daily ladder tail as DuckDB SQL
    (patch_48.R:215-702): dense per-series spine -> DOY historical
    stats -> hist-count NULL ladder -> Feb-29 smoothing -> tail trim.

    Continues a WITH chain whose (still-open) last CTE is
    ``daily(priority, date, value)`` — the returned text closes it.
    ``last_raw_sql`` supplies the per-series last real-measurement
    day (the trim bound), which differs per caller: raw facts for
    the live refresh, the as-of snapshot for point-in-time replay."""
    return (
        f"""
    ), bounds AS (
      SELECT priority, min(date) AS min_d FROM daily GROUP BY 1
    ), spine AS (
      SELECT priority,
             CAST(unnest(generate_series(CAST(min_d AS TIMESTAMP),
                  (SELECT CAST(max(date) AS TIMESTAMP) FROM daily),
                  INTERVAL 1 DAY)) AS DATE) AS date
      FROM bounds
    ), sp AS (
      SELECT s.priority, s.date, d.value
      FROM spine s LEFT JOIN daily d USING (priority, date)
    ), dd AS (
      SELECT *,
             CAST(CASE
               WHEN month(date) = 2 AND day(date) = 29 THEN NULL
               WHEN (year(date) % 4 = 0 AND (year(date) % 100 <> 0 OR year(date) % 400 = 0))
                    AND dayofyear(date) > 60 THEN dayofyear(date) - 1
               ELSE dayofyear(date) END AS INTEGER) AS doy
      FROM sp
    ), hist AS (
      SELECT t.priority, t.date, t.value, t.doy,
             count(h.value)               AS hist_count,
             min(h.value)                 AS hist_min,
             max(h.value)                 AS hist_max,
             {DSUM('h.value')} / count(h.value) AS hist_mean,
             quantile_cont(h.value, 0.10) AS q10,
             quantile_cont(h.value, 0.25) AS q25,
             quantile_cont(h.value, 0.50) AS q50,
             quantile_cont(h.value, 0.75) AS q75,
             quantile_cont(h.value, 0.90) AS q90
      FROM dd t
      LEFT JOIN dd h
        ON h.priority = t.priority AND h.doy = t.doy
       AND h.date < t.date AND h.value IS NOT NULL
      GROUP BY 1, 2, 3, 4
    ), lad AS (
      SELECT priority, date, value, doy,
        CASE WHEN hist_count > 1 AND value IS NOT NULL
             THEN (value - hist_min) / NULLIF(hist_max - hist_min, 0) * 100
        END AS percent_historic_range,
        CASE WHEN hist_count = 0 AND value IS NOT NULL THEN value
             WHEN hist_count > 0 THEN hist_max END AS max,
        CASE WHEN hist_count = 0 AND value IS NOT NULL THEN value
             WHEN hist_count > 0 THEN hist_min END AS min,
        CASE WHEN hist_count > 0 THEN hist_mean END AS mean,
        CASE WHEN hist_count > 0 THEN q10 END AS q10,
        CASE WHEN hist_count > 0 THEN q25 END AS q25,
        CASE WHEN hist_count > 0 THEN q50 END AS q50,
        CASE WHEN hist_count > 0 THEN q75 END AS q75,
        CASE WHEN hist_count > 0 THEN q90 END AS q90,
        CAST(CASE WHEN hist_count = 0 AND value IS NOT NULL THEN 1
                  WHEN hist_count > 0 THEN hist_count
                       + CASE WHEN value IS NULL THEN 0 ELSE 1 END
        END AS BIGINT) AS doy_count
      FROM hist
    ), sm AS (
      SELECT f.priority, f.date, f.value, f.doy,
        CASE WHEN b.percent_historic_range IS NOT NULL
                  AND a.percent_historic_range IS NOT NULL
             THEN (b.percent_historic_range + a.percent_historic_range) / 2
        END AS percent_historic_range,
        CASE WHEN b.max IS NOT NULL AND a.max IS NOT NULL THEN (b.max + a.max) / 2
             WHEN b.max IS NULL AND a.max IS NULL AND f.value IS NOT NULL
             THEN f.value END AS max,
        CASE WHEN b.min IS NOT NULL AND a.min IS NOT NULL THEN (b.min + a.min) / 2
             WHEN b.min IS NULL AND a.min IS NULL AND f.value IS NOT NULL
             THEN f.value END AS min,
        """
        + ",\n        ".join(
            f"CASE WHEN b.{c} IS NOT NULL AND a.{c} IS NOT NULL"
            f" THEN (b.{c} + a.{c}) / 2 END AS {c}"
            for c in _REFRESH_LADDER_AVG
        )
        + f""",
        CAST(CASE WHEN b.doy_count IS NOT NULL AND a.doy_count IS NOT NULL
                  THEN LEAST(b.doy_count, a.doy_count)
                  WHEN b.doy_count IS NULL AND a.doy_count IS NULL
                       AND f.value IS NOT NULL THEN 1
        END AS BIGINT) AS doy_count
      FROM (SELECT * FROM lad WHERE month(date) = 2 AND day(date) = 29) f
      LEFT JOIN lad b ON b.priority = f.priority AND b.date = f.date - 1
      LEFT JOIN lad a ON a.priority = f.priority AND a.date = f.date + 1
    ), final AS (
      SELECT * FROM lad WHERE NOT (month(date) = 2 AND day(date) = 29)
      UNION ALL BY NAME
      SELECT * FROM sm
    ), last_raw AS (
      {last_raw_sql}
    )
    SELECT f.priority, f.date, {R('f.value', 4)} AS value, f.doy,
           {R('f.percent_historic_range', 4)} AS percent_historic_range,
           {R('f.max', 4)} AS max, {R('f.min', 4)} AS min,
           {R('f.mean', 4)} AS mean,
           {R('f.q10', 4)} AS q10, {R('f.q25', 4)} AS q25,
           {R('f.q50', 4)} AS q50, {R('f.q75', 4)} AS q75,
           {R('f.q90', 4)} AS q90, f.doy_count
    FROM final f JOIN last_raw l ON l.priority = f.priority
    WHERE f.date <= l.last_d
"""
    )


_REFRESH_E2E_ORACLE = f"""
    WITH raw AS (
      SELECT o_orderpriority AS priority,
             CAST(o_orderdate AS TIMESTAMP) AS ts,
             CAST(o_totalprice AS DOUBLE) AS value
      FROM orders
    ), c1 AS (  -- trim [20000,400000] on 1-URGENT
      SELECT priority, ts,
             CASE WHEN priority = '1-URGENT'
                       AND ts >= TIMESTAMP '1996-01-01' AND ts < TIMESTAMP '1997-01-01'
                       AND (value < 20000.0 OR value > 400000.0)
                  THEN NULL ELSE value END AS v
      FROM raw
    ), c2 AS (  -- offset +5000 on 2-HIGH
      SELECT priority, ts,
             CASE WHEN priority = '2-HIGH' AND v IS NOT NULL
                       AND ts >= TIMESTAMP '1996-06-01' AND ts < TIMESTAMP '1997-06-01'
                  THEN v + 5000.0 ELSE v END AS v
      FROM c1
    ), c3 AS (  -- scale 110% on 3-MEDIUM
      SELECT priority, ts,
             CASE WHEN priority = '3-MEDIUM' AND v IS NOT NULL
                       AND ts >= TIMESTAMP '1995-03-01' AND ts < TIMESTAMP '1996-03-01'
                  THEN v * 110.0 / 100.0 ELSE v END AS v
      FROM c2
    ), corr AS (  -- drift +1000/30d on 5-LOW
      SELECT priority, ts,
             CASE WHEN priority = '5-LOW' AND v IS NOT NULL
                       AND ts >= TIMESTAMP '1997-01-01' AND ts < TIMESTAMP '1997-07-01'
                  THEN v + 1000.0 / 2592000.0
                       * date_diff('second', TIMESTAMP '1997-01-01', ts)
                  ELSE v END AS v
      FROM c3
    ), daily AS (
      SELECT priority, CAST(ts AS DATE) AS date,
             {DSUM('v')} / count(v) AS value
      FROM corr GROUP BY 1, 2 HAVING count(v) > 0""" + _refresh_tail_sql(
    """SELECT o_orderpriority AS priority,
             max(CAST(o_orderdate AS DATE)) AS last_d
      FROM orders GROUP BY 1"""
)


@register("refresh_daily_e2e", oracle=_REFRESH_E2E_ORACLE)
def refresh_daily_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """refresh_calculated_daily end to end in one composition
    (patch_48.R:215-702): 4-correction chain -> exact-mean daily rollup
    -> per-series dense spine to the global max date -> DOY historical
    stats -> hist-count NULL ladder -> Feb-29 smoothing (today not in
    the 02-29/03-01/03-02 skip window) -> per-series tail trim. Stale
    series (3-MEDIUM, 4-NOT SPECIFIED end days before the global max)
    get genuine trailing spine rows that ONLY the trim removes."""
    from .operators.refresh import refresh_calculated_daily

    raw = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("timestamp").alias("ts"),
        F.col("o_totalprice").cast("double").alias("value"),
    )
    out = refresh_calculated_daily(
        raw, ORDER_CORRECTIONS, series_col="priority", dt_col="ts",
        value_col="value", agg_type="mean", today="2026-01-15",
    )
    return _round(
        out,
        {"value": 4, "percent_historic_range": 4, "max": 4, "min": 4,
         "mean": 4, "q10": 4, "q25": 4, "q50": 4, "q75": 4, "q90": 4},
    )


# ---------------------------------------------------------------------------
# §2.12 measurements_calculated_daily_at (patch_50.R:128-420): POINT-IN-TIME
# daily recomputation. The reference replays the audit log to the requested
# timestamp (latest committed version per measurement key wins, delete
# images drop the key) and then runs the exact same daily ladder as the
# live table. Orders play a versioned measurement log here: key =
# (priority, order-date, custkey-bucket), version commit time = order-date
# + (orderkey % 997) hours, and a latest version with status 'P' is a
# tombstone. Everything downstream of the snapshot is the already-audited
# refresh composition — reusing _refresh_tail_sql pins BOTH queries to one
# ladder definition.
# ---------------------------------------------------------------------------

_DAILY_AT_ASOF_SEC = 929404800  # 1999-06-15 00:00:00 UTC

_DAILY_AT_ORACLE = f"""
    WITH ver AS (
      SELECT o_orderpriority AS priority,
             CAST(o_orderdate AS DATE) AS date,
             o_custkey % 4 AS bucket,
             o_orderkey AS vid,
             CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)
               + 3600 * (o_orderkey % 997) AS mod_sec,
             o_orderstatus AS status,
             CAST(o_totalprice AS DOUBLE) AS value
      FROM orders
    ), vis AS (
      SELECT *, row_number() OVER (
        PARTITION BY priority, date, bucket
        ORDER BY mod_sec DESC, vid DESC) AS rn
      FROM ver WHERE mod_sec <= {_DAILY_AT_ASOF_SEC}
    ), snap AS (
      SELECT priority, date, value FROM vis WHERE rn = 1 AND status <> 'P'
    ), daily AS (
      SELECT priority, date, {DSUM('value')} / count(value) AS value
      FROM snap GROUP BY 1, 2 HAVING count(value) > 0""" + _refresh_tail_sql(
    """SELECT priority, max(date) AS last_d FROM snap GROUP BY 1"""
)


@register("daily_calculated_at", oracle=_DAILY_AT_ORACLE)
def daily_calculated_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """measurements_calculated_daily_at (patch_50.R:128-420): as-of
    snapshot of a versioned measurement log (key-partitioned row_number
    over commit time, tombstones dropped) -> the SAME
    refresh_calculated_daily ladder as the live table (rollup -> dense
    spine -> DOY stats -> NULL ladder -> Feb-29 smoothing -> tail trim).

    Scale: the snapshot is one shuffle on the measurement key (the same
    key any ingest partitions by); the version filter is a pushed-down
    scan predicate; downstream is the audited refresh plan unchanged."""
    from .operators.refresh import refresh_calculated_daily

    o = _t(spark, sf_dir, "orders")
    ver = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("date"),
        (F.col("o_custkey") % 4).alias("bucket"),
        F.col("o_orderkey").alias("vid"),
        (
            F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
            + 3600 * (F.col("o_orderkey") % 997)
        ).alias("mod_sec"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("double").alias("value"),
    ).where(F.col("mod_sec") <= F.lit(_DAILY_AT_ASOF_SEC))
    w = Window.partitionBy("priority", "date", "bucket").orderBy(
        F.desc("mod_sec"), F.desc("vid")
    )
    snap = (
        ver.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("status") != "P"))
        .select(
            "priority", F.col("date").cast("timestamp").alias("ts"), "value"
        )
    )
    out = refresh_calculated_daily(
        snap, [], series_col="priority", dt_col="ts", value_col="value",
        agg_type="mean", today="2026-01-15",
    )
    return _round(
        out,
        {"value": 4, "percent_historic_range": 4, "max": 4, "min": 4,
         "mean": 4, "q10": 4, "q25": 4, "q50": 4, "q75": 4, "q90": 4},
    )


# ---------------------------------------------------------------------------
# §2.1/§2.12 synchronize_discrete (R/synchronize_discrete.R): import-
# source-scoped sample gap deletes + null-safe-key result
# reconciliation, as set-based action classifications.
# ---------------------------------------------------------------------------

_DISCRETE_SAMPLES_SQL = """
    base0 AS (
      SELECT user_id % 16 AS series,
             date_trunc('second', CAST(ts AS TIMESTAMP)) AS datetime,
             event_id,
             row_number() OVER (
               PARTITION BY user_id % 16,
                            date_trunc('second', CAST(ts AS TIMESTAMP))
               ORDER BY event_id) AS rn
      FROM events WHERE event_type = 'click'
    ), base AS (
      SELECT series, datetime, event_id FROM base0 WHERE rn = 1
    ), locl AS (
      SELECT series, datetime,
             CASE WHEN event_id % 4 = 0 THEN 'other' ELSE 'srcA' END
               AS import_source,
             (event_id % 7 = 0) AS no_update
      FROM base WHERE event_id % 11 <> 3
    ), rem AS (
      SELECT series, datetime FROM base WHERE event_id % 5 NOT IN (0, 1)
    )
"""

_DISCRETE_SAMPLE_ACTIONS_ORACLE = "WITH " + _DISCRETE_SAMPLES_SQL + """
    , nrem AS (
      SELECT series, count(*) AS n_remote FROM rem GROUP BY 1
    ), univ AS (
      SELECT series, datetime, 0 AS is_r FROM locl
      UNION ALL
      SELECT series, datetime, 1 AS is_r FROM rem
    ), marked AS (
      SELECT series, datetime, is_r, epoch(datetime) AS sec,
        max(CASE WHEN is_r = 1 THEN epoch(datetime) END) OVER (
          PARTITION BY series ORDER BY epoch(datetime)
          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_r,
        min(CASE WHEN is_r = 1 THEN epoch(datetime) END) OVER (
          PARTITION BY series ORDER BY epoch(datetime)
          RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_r
      FROM univ
    ), loc AS (
      SELECT m.series, m.datetime, l.import_source, l.no_update,
             m.sec, m.prev_r, m.next_r, COALESCE(n.n_remote, 0) AS n_remote
      FROM marked m
      JOIN locl l USING (series, datetime)
      LEFT JOIN nrem n USING (series)
      WHERE m.is_r = 0
    )
    SELECT series, datetime, import_source, no_update,
      CASE WHEN prev_r = sec OR next_r = sec THEN 'matched'
           WHEN import_source = 'srcA' AND NOT no_update AND (
                (prev_r IS NULL AND next_r IS NOT NULL
                 AND sec > epoch(TIMESTAMP '2024-01-02') AND sec < next_r)
             OR (prev_r IS NOT NULL AND next_r IS NOT NULL
                 AND sec >= prev_r + 1 AND sec <= next_r - 1)
             OR (prev_r IS NOT NULL AND next_r IS NULL AND n_remote >= 2
                 AND sec > prev_r AND sec < epoch(TIMESTAMP '2024-01-28'))
           ) THEN 'delete'
           ELSE 'keep' END AS action
    FROM loc
    UNION ALL BY NAME
    SELECT r.series, r.datetime, 'srcA' AS import_source,
           FALSE AS no_update, 'insert' AS action
    FROM rem r
    WHERE NOT EXISTS (
      SELECT 1 FROM locl l
      WHERE l.series = r.series AND l.datetime = r.datetime
    )
"""


@register("discrete_sample_sync", oracle=_DISCRETE_SAMPLE_ACTIONS_ORACLE)
def discrete_sample_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """synchronize_discrete sample-level actions
    (R/synchronize_discrete.R:280-388): remote datetimes partition the
    window into gaps; local samples in a gap are deleted only when
    import_source matches and no_update is false, with the reference's
    asymmetric boundary rules (strict head/tail, ±1s middle margins,
    tail needs >= 2 remote samples). Remote-only datetimes classify as
    inserts carrying import_source = source_fx (:902)."""
    from .operators.discrete_sync import sample_sync_actions

    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "click")
    # keep-first dedupe as min() aggregation: partial map-side combine,
    # no full partition sort (row_number would force one) — same rows
    base = (
        ev.select(
            (F.col("user_id") % 16).alias("series"),
            F.date_trunc("second", F.col("ts")).alias("datetime"),
            "event_id",
        )
        .groupBy("series", "datetime")
        .agg(F.min("event_id").alias("event_id"))
    )
    local = base.where(F.col("event_id") % 11 != 3).select(
        "series", "datetime",
        F.when(F.col("event_id") % 4 == 0, F.lit("other"))
        .otherwise(F.lit("srcA"))
        .alias("import_source"),
        (F.col("event_id") % 7 == 0).alias("no_update"),
    )
    remote = base.where(~(F.col("event_id") % 5).isin(0, 1)).select(
        "series", "datetime"
    )
    return sample_sync_actions(
        local, remote, keys=["series"],
        start="2024-01-02 00:00:00", end="2024-01-28 00:00:00",
        source_fx="srcA",
    )


_DISCRETE_RESULTS_SQL = """
    lbase AS (
      SELECT l_orderkey AS sample_id,
             l_partkey % 20 AS parameter_id,
             CASE WHEN l_suppkey % 3 = 0 THEN NULL
                  ELSE l_suppkey % 3 END AS fraction_id,
             CAST(l_quantity AS DOUBLE) AS result,
             (l_orderkey % 9 = 0) AS no_update,
             row_number() OVER (
               PARTITION BY l_orderkey, l_partkey % 20,
                            CASE WHEN l_suppkey % 3 = 0 THEN NULL
                                 ELSE l_suppkey % 3 END
               ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
             ) AS rn
      FROM lineitem WHERE l_linenumber = 1
    ), locl AS (
      SELECT sample_id, parameter_id, fraction_id, result, no_update
      FROM lbase WHERE rn = 1
    ), rbase AS (
      SELECT l_orderkey AS sample_id,
             l_partkey % 20 AS parameter_id,
             CASE WHEN l_suppkey % 3 = 0 THEN NULL
                  ELSE l_suppkey % 3 END AS fraction_id,
             CASE WHEN l_orderkey % 5 = 0
                  THEN CAST(l_quantity AS DOUBLE) + 1.0
                  ELSE CAST(l_quantity AS DOUBLE) END AS result,
             row_number() OVER (
               PARTITION BY l_orderkey, l_partkey % 20,
                            CASE WHEN l_suppkey % 3 = 0 THEN NULL
                                 ELSE l_suppkey % 3 END
               ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
             ) AS rn
      FROM lineitem
      WHERE l_linenumber IN (1, 2) AND l_orderkey % 6 <> 2
    ), rmt AS (
      SELECT sample_id, parameter_id, fraction_id, result
      FROM rbase WHERE rn = 1
    )
"""

_DISCRETE_RESULT_ACTIONS_ORACLE = "WITH " + _DISCRETE_RESULTS_SQL + """
    SELECT COALESCE(l.sample_id, r.sample_id) AS sample_id,
           COALESCE(l.parameter_id, r.parameter_id) AS parameter_id,
           COALESCE(l.fraction_id, r.fraction_id) AS fraction_id,
           l.result AS local_result,
           r.result AS remote_result,
           CASE WHEN l.sample_id IS NULL THEN 'insert'
                WHEN r.sample_id IS NULL THEN
                  CASE WHEN l.no_update THEN 'protected' ELSE 'delete' END
                WHEN l.no_update THEN 'protected'
                WHEN l.result IS NOT DISTINCT FROM r.result THEN 'unchanged'
                ELSE 'update' END AS action
    FROM locl l
    FULL OUTER JOIN rmt r
      ON l.sample_id = r.sample_id
     AND l.parameter_id = r.parameter_id
     AND l.fraction_id IS NOT DISTINCT FROM r.fraction_id
"""


@register("discrete_result_sync", oracle=_DISCRETE_RESULT_ACTIONS_ORACLE)
def discrete_result_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """synchronize_discrete result-level reconciliation
    (R/synchronize_discrete.R:500-860): null-safe composite-key match
    (a missing remote key matches only NULL locally), value-diff
    updates, no_update protection, delete-unchecked, insert-new."""
    from .operators.discrete_sync import result_sync_actions

    li = _t(spark, sf_dir, "lineitem")
    frac = F.when(
        F.col("l_suppkey") % 3 == 0, F.lit(None).cast("long")
    ).otherwise(F.col("l_suppkey") % 3)
    key_w = Window.partitionBy(
        "sample_id", "parameter_id", "fraction_id"
    ).orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_quantity")

    def prep(df):
        return (
            df.withColumn("rn", F.row_number().over(key_w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )

    local = prep(
        li.where(F.col("l_linenumber") == 1).select(
            F.col("l_orderkey").alias("sample_id"),
            (F.col("l_partkey") % 20).alias("parameter_id"),
            frac.alias("fraction_id"),
            F.col("l_quantity").cast("double").alias("result"),
            (F.col("l_orderkey") % 9 == 0).alias("no_update"),
            "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
        )
    ).drop("l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
    remote = prep(
        li.where(
            F.col("l_linenumber").isin(1, 2) & (F.col("l_orderkey") % 6 != 2)
        ).select(
            F.col("l_orderkey").alias("sample_id"),
            (F.col("l_partkey") % 20).alias("parameter_id"),
            frac.alias("fraction_id"),
            F.when(
                F.col("l_orderkey") % 5 == 0,
                F.col("l_quantity").cast("double") + 1.0,
            )
            .otherwise(F.col("l_quantity").cast("double"))
            .alias("result"),
            "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
        )
    ).drop("l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
    return result_sync_actions(
        local, remote,
        key_cols=["sample_id", "parameter_id", "fraction_id"],
        value_col="result", no_update_col="no_update",
    )


# ---------------------------------------------------------------------------
# §2.6 segment id recycling: split/overlay + the reference writer's
# positional id contract (R/adjust_functions.R:132-142) as one
# oracle-checked composition. Existing/new interval sets are derived
# from orders, made non-overlapping per side via lead() capping (the
# overlay's new-wins tie-break is only deterministic across engines
# when segments within one side don't overlap).
# ---------------------------------------------------------------------------

_SEG_IDS_SQL = """
    ex0 AS (
      SELECT o_orderpriority AS series, o_orderkey AS segment_id,
             CAST(o_orderdate AS TIMESTAMP) AS start_dt,
             CAST(o_orderdate AS TIMESTAMP)
               + (o_orderkey % 20 + 5) * INTERVAL 1 DAY AS raw_end,
             lead(CAST(o_orderdate AS TIMESTAMP)) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_orderdate, o_orderkey) AS next_start,
             o_orderkey % 3 AS value
      FROM orders WHERE o_orderkey % 97 = 0
    ), ex AS (
      SELECT series, segment_id, start_dt,
             LEAST(raw_end, COALESCE(next_start, raw_end)) AS end_dt, value
      FROM ex0
      WHERE LEAST(raw_end, COALESCE(next_start, raw_end)) > start_dt
    ), nw0 AS (
      SELECT o_orderpriority AS series,
             CAST(o_orderdate AS TIMESTAMP) AS start_dt,
             CAST(o_orderdate AS TIMESTAMP)
               + (o_orderkey % 15 + 3) * INTERVAL 1 DAY AS raw_end,
             lead(CAST(o_orderdate AS TIMESTAMP)) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_orderdate, o_orderkey) AS next_start,
             o_orderkey % 3 AS value
      FROM orders WHERE o_orderkey % 89 = 1
    ), nw AS (
      SELECT series, start_dt,
             LEAST(raw_end, COALESCE(next_start, raw_end)) AS end_dt, value
      FROM nw0
      WHERE LEAST(raw_end, COALESCE(next_start, raw_end)) > start_dt
    )
"""

_SEG_IDS_ORACLE = "WITH " + _SEG_IDS_SQL + """
    , allseg AS (
      SELECT series, start_dt, end_dt, value, 0 AS src FROM ex
      UNION ALL
      SELECT series, start_dt, end_dt, value, 1 AS src FROM nw
    ), bounds AS (
      SELECT DISTINCT series, b FROM (
        SELECT series, start_dt AS b FROM allseg
        UNION ALL SELECT series, end_dt AS b FROM allseg
      )
    ), elems AS (
      SELECT series, b AS es,
             lead(b) OVER (PARTITION BY series ORDER BY b) AS ee
      FROM bounds
    ), covered AS (
      SELECT e.series, e.es, e.ee, s.value, s.src
      FROM elems e
      JOIN allseg s ON s.series = e.series
       AND s.start_dt <= e.es AND s.end_dt >= e.ee
      WHERE e.ee IS NOT NULL
    ), resolved AS (
      SELECT series, es, ee, value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY series, es, ee ORDER BY src DESC) AS pick
        FROM covered
      ) WHERE pick = 1
    ), runs AS (
      SELECT *, sum(new_run) OVER (
        PARTITION BY series ORDER BY es
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM (
        SELECT *, CASE WHEN value IS NOT DISTINCT FROM
                         lag(value) OVER (PARTITION BY series ORDER BY es)
                       AND lag(ee) OVER (PARTITION BY series ORDER BY es) = es
                  THEN 0 ELSE 1 END AS new_run
        FROM resolved
      )
    ), final AS (
      SELECT series, min(es) AS start_dt, max(ee) AS end_dt,
             min(value) AS value
      FROM runs GROUP BY series, run
    ), fpos AS (
      SELECT *, row_number() OVER (
        PARTITION BY series ORDER BY start_dt, end_dt) AS pos
      FROM final
    ), epos AS (
      SELECT series, segment_id, start_dt, end_dt,
             row_number() OVER (
               PARTITION BY series
               ORDER BY start_dt, end_dt, segment_id) AS pos
      FROM ex
    )
    SELECT COALESCE(f.series, e.series) AS series,
           CASE WHEN f.pos IS NOT NULL THEN f.start_dt
                ELSE e.start_dt END AS start_dt,
           CASE WHEN f.pos IS NOT NULL THEN f.end_dt
                ELSE e.end_dt END AS end_dt,
           CASE WHEN f.pos IS NOT NULL THEN f.value END AS value,
           e.segment_id,
           CASE WHEN f.pos IS NOT NULL THEN 'upsert' ELSE 'delete' END
             AS action
    FROM fpos f
    FULL OUTER JOIN epos e ON e.series = f.series AND e.pos = f.pos
"""


@register("segment_id_recycling", oracle=_SEG_IDS_ORACLE)
def segment_id_recycling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlay + positional id recycling (R/adjust_functions.R:18-142):
    new segments split the existing ones (new wins per elementary
    interval, adjacent equal values merge), then the rebuilt rows take
    existing ids BY POSITION; surplus rebuilt rows get NULL ids and
    surplus existing rows become delete actions."""
    from .operators.segments import recycle_split_ids, split_segments

    o = _t(spark, sf_dir, "orders")
    start = F.col("o_orderdate").cast("timestamp")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_orderdate", "o_orderkey"
    )

    def intervals(mod, rem, span_mod, span_base, with_id):
        d = o.where(F.col("o_orderkey") % mod == rem).select(
            F.col("o_orderpriority").alias("series"),
            *( [F.col("o_orderkey").alias("segment_id")] if with_id else [] ),
            start.alias("start_dt"),
            F.timestamp_add(
                "DAY",
                (F.col("o_orderkey") % span_mod + span_base).cast("int"),
                start,
            ).alias("raw_end"),
            F.lead(start).over(w).alias("next_start"),
            (F.col("o_orderkey") % 3).alias("value"),
        )
        end = F.least(F.col("raw_end"), F.coalesce("next_start", "raw_end"))
        return (
            d.withColumn("end_dt", end)
            .where(F.col("end_dt") > F.col("start_dt"))
            .drop("raw_end", "next_start")
        )

    # the overlay references each interval set several times (boundary
    # union + both value lookups + positional recycle) — materialize
    # the catalog-sized interval tables once
    existing = intervals(97, 0, 20, 5, with_id=True).persist()
    new = intervals(89, 1, 15, 3, with_id=False).persist()
    final = split_segments(
        existing.drop("segment_id"), new, keys=["series"],
        start_col="start_dt", end_col="end_dt", value_col="value",
    )
    return recycle_split_ids(
        existing, final, keys=["series"], id_col="segment_id",
        start_col="start_dt", end_col="end_dt",
    )


# ---------------------------------------------------------------------------
# Flagship composition used by entry(): corrections -> daily -> DOY stats
# ---------------------------------------------------------------------------

def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    corrected = apply_corrections(
        ev, EVENT_CORRECTIONS, ts_col="event_type", dt_col="ts",
        value_col="value", out_col="value",
    )
    daily = daily_rollup(
        corrected, keys=["event_type"], dt_col="ts", value_col="value", agg_type="mean"
    )
    out = doy_stats(daily, keys=["event_type"], date_col="date",
                    value_col="value", exact_hist_mean=True)
    return _round(out, {"value": 4, "hist_min": 4, "hist_max": 4, "hist_mean": 4,
                        "q10": 4, "q25": 4, "q50": 4, "q75": 4, "q90": 4,
                        "percent_historic_range": 4})


# ---------------------------------------------------------------------------
# Raster subsystem (writeRaster.R tiled model, insertACRaster.R:4-8,
# getNewRasters.R:393-447, createRasterPyramids.R). Cells are derived
# deterministically from driver tables (x/y from event_id), mirrored in
# the oracle, so both engines see the same grid without synthesizing
# side data. Tiles carry bbox metadata -> parquet min/max pruning is the
# PostGIS-spatial-index analog at 100 TB.
# ---------------------------------------------------------------------------

_RASTER_CELLS_SQL = """
      SELECT (event_id % 100) AS x,
             CAST(floor(event_id / 100) AS INT) AS y,
             value
      FROM events
"""

_RASTER_ZONES_SQL = """
      SELECT n_nationkey AS zone_id,
             (n_nationkey * 13) % 80 AS zxmin,
             (n_nationkey * 29) % 80 AS zymin,
             (n_nationkey * 13) % 80 + 19 AS zxmax,
             (n_nationkey * 29) % 80 + 19 AS zymax
      FROM nation
"""


def _raster_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        (F.col("event_id") % 100).cast("int").alias("x"),
        F.floor(F.col("event_id") / 100).cast("int").alias("y"),
        "value",
    )


@register(
    "raster_zonal_stats",
    oracle=f"""
    WITH cells AS ({_RASTER_CELLS_SQL}),
         zones AS ({_RASTER_ZONES_SQL})
    SELECT zone_id,
           {R(DSUM('c.value') + ' / count(*)', 6)} AS zmean,
           min(c.value) AS zmin,
           max(c.value) AS zmax,
           count(*) AS zcount
    FROM cells c JOIN zones z
      ON c.x BETWEEN z.zxmin AND z.zxmax
     AND c.y BETWEEN z.zymin AND z.zymax
    GROUP BY zone_id
    """,
)
def raster_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal mean/min/max/count over a tiled raster (zonal statistics on
    spatial.rasters; the read path of R/writeRaster.R:6-10 tiling).

    Spark plan: tile once (shuffle keyed by tile), broadcast the
    catalog-sized zone table, bbox-join *tiles* so only intersecting
    tiles explode, aggregate per zone with exact sums. The oracle joins
    raw cells — same result, different (non-scalable) plan."""
    from .operators.raster import tile_cells, zonal_stats

    nation = _t(spark, sf_dir, "nation")
    zones = nation.select(
        F.col("n_nationkey").cast("int").alias("zone_id"),
        ((F.col("n_nationkey") * 13) % 80).cast("int").alias("zxmin"),
        ((F.col("n_nationkey") * 29) % 80).cast("int").alias("zymin"),
        ((F.col("n_nationkey") * 13) % 80 + 19).cast("int").alias("zxmax"),
        ((F.col("n_nationkey") * 29) % 80 + 19).cast("int").alias("zymax"),
    )
    tiles = tile_cells(_raster_cells(spark, sf_dir), tile=16)
    out = zonal_stats(tiles, zones)
    return _round(out, {"zmean": 6})


@register(
    "raster_pyramid",
    oracle=f"""
    WITH cells AS ({_RASTER_CELLS_SQL})
    SELECT CAST(floor(x / 4) AS INT) AS px,
           CAST(floor(y / 4) AS INT) AS py,
           {R(DSUM('value') + ' / count(*)', 6)} AS pvalue,
           count(*) AS pcount
    FROM cells
    GROUP BY 1, 2
    """,
)
def raster_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overview-level generation (createRasterPyramids.R): factor-4
    mean resample from tiles. One shuffle keyed by the coarse cell;
    exact mean keeps levels bit-reproducible across partitionings."""
    from .operators.raster import pyramid, tile_cells

    tiles = tile_cells(_raster_cells(spark, sf_dir), tile=16)
    out = pyramid(tiles, 4)
    return _round(out, {"pvalue": 6})


_RASTER_REF_SQL = """
      SELECT o_orderkey AS reference_id,
             o_custkey % 7 AS raster_series_id,
             CAST(o_orderdate AS TIMESTAMP)
               + to_days(CAST(o_orderkey % 5 AS INT)) AS valid_from,
             CAST(o_orderdate AS TIMESTAMP) AS issued,
             CASE WHEN o_orderkey % 3 = 0 THEN 'PRELIMINARY'
                  ELSE 'FINAL' END AS flag
      FROM orders
      WHERE o_orderkey % 11 = 0
"""


def _raster_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 11 == 0).select(
        F.col("o_orderkey").alias("reference_id"),
        (F.col("o_custkey") % 7).alias("raster_series_id"),
        (F.col("o_orderdate").cast("timestamp")
         + (F.col("o_orderkey") % 5).cast("int")
         * F.expr("INTERVAL 1 DAY")).alias("valid_from"),
        F.col("o_orderdate").cast("timestamp").alias("issued"),
        F.when(F.col("o_orderkey") % 3 == 0, "PRELIMINARY")
        .otherwise("FINAL").alias("flag"),
    )


@register(
    "raster_forecast_selective",
    oracle=f"""
    WITH ref AS ({_RASTER_REF_SQL}),
         m AS (
           SELECT *, max(issued) OVER (PARTITION BY raster_series_id)
                       AS new_issue
           FROM ref
         ),
         nv AS (
           SELECT DISTINCT raster_series_id, valid_from
           FROM m
           WHERE abs(epoch(issued) - epoch(new_issue)) <= 5
         )
    SELECT m.reference_id, m.raster_series_id, m.valid_from, m.issued
    FROM m
    LEFT JOIN nv ON nv.raster_series_id = m.raster_series_id
                AND nv.valid_from = m.valid_from
    WHERE abs(epoch(m.issued) - epoch(m.new_issue)) <= 5
       OR nv.valid_from IS NULL
    """,
)
def raster_forecast_selective(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective forecast replacement (getNewRasters.R:393-425): keep
    rasters issued with the newest cycle, plus older rasters whose
    valid time the new cycle does not cover. Window max + broadcast
    semi-join — no per-row DML, one job for every series at once."""
    from .operators.raster import forecast_survivors

    ref = _raster_reference(spark, sf_dir)
    return forecast_survivors(ref, keep="selective").select(
        "reference_id", "raster_series_id", "valid_from", "issued"
    )


@register(
    "raster_model_asof",
    oracle=f"""
    WITH ref AS ({_RASTER_REF_SQL}),
         ranked AS (
           SELECT *, row_number() OVER (
             PARTITION BY raster_series_id, valid_from
             ORDER BY CASE WHEN flag = 'PRELIMINARY' THEN 1 ELSE 0 END,
                      issued DESC, reference_id DESC
           ) AS rn
           FROM ref
         )
    SELECT reference_id, raster_series_id, valid_from, issued, flag
    FROM ranked WHERE rn = 1
    """,
)
def raster_model_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-available raster per (series, valid time): FINAL beats
    PRELIMINARY, then latest issue (insertACRaster.R:302-345 replace-
    on-final + insertACModelRaster issue ranking) as one window."""
    from .operators.raster import model_asof

    ref = _raster_reference(spark, sf_dir)
    return model_asof(ref).select(
        "reference_id", "raster_series_id", "valid_from", "issued", "flag"
    )


# ---------------------------------------------------------------------------
# Vector subsystem (insertACVector.R:5-23 feature store, load_nhn.R).
# Geometry rings are array<struct<x,y>> so containment runs in JVM
# higher-order functions; polygons broadcast; the big point side
# streams map-only through a bbox pre-filter + exact ray-cast refine.
# ---------------------------------------------------------------------------

@register(
    "vector_point_in_polygon",
    oracle="""
    WITH tri AS (
      SELECT n_nationkey AS poly_id,
             CAST((n_nationkey * 37) % 180 AS DOUBLE) AS ax,
             CAST((n_nationkey * 53) % 180 AS DOUBLE) AS ay,
             CAST((n_nationkey * 37) % 180 + 15 + n_nationkey % 7 AS DOUBLE) AS bx,
             CAST((n_nationkey * 53) % 180 + 3 + n_nationkey % 5 AS DOUBLE) AS by,
             CAST((n_nationkey * 37) % 180 + 5 + n_nationkey % 4 AS DOUBLE) AS cx,
             CAST((n_nationkey * 53) % 180 + 17 + n_nationkey % 6 AS DOUBLE) AS cy
      FROM nation
    ),
    pts AS (
      SELECT c_custkey AS point_id,
             ((c_custkey * 7919) % 1800) / 10.0 + 0.137 AS px,
             ((c_custkey * 104729) % 1800) / 10.0 + 0.269 AS py
      FROM customer
    )
    -- triangles are CCW by construction: strict half-plane sign tests
    SELECT poly_id, count(*) AS n_points,
           CAST(sum(point_id) AS BIGINT) AS sum_point_ids
    FROM tri JOIN pts
      ON (bx - ax) * (py - ay) - (by - ay) * (px - ax) > 0
     AND (cx - bx) * (py - by) - (cy - by) * (px - bx) > 0
     AND (ax - cx) * (py - cy) - (ay - cy) * (px - cx) > 0
    GROUP BY poly_id
    """,
)
def vector_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial containment join (the read path insertACVector enables:
    which points fall in which basins/waterbodies).

    Spark: broadcast catalog-sized polygons, bbox pre-filter, exact
    ray-casting in codegen'd array lambdas (operators/vector.py) — the
    point table never shuffles. The oracle proves the same containment
    set through independent math (half-plane sign tests on the CCW
    triangles), so the ray-cast kernel is cross-checked, not mirrored."""
    from .operators.vector import point_in_polygon_join

    nation = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    ax, ay = (k * 37) % 180, (k * 53) % 180
    verts = [
        (ax, ay),
        (ax + 15 + k % 7, ay + 3 + k % 5),
        (ax + 5 + k % 4, ay + 17 + k % 6),
    ]
    polys = nation.select(
        k.cast("int").alias("poly_id"),
        F.array(*[
            F.struct(x.cast("double").alias("x"), y.cast("double").alias("y"))
            for x, y in verts
        ]).alias("ring"),
    )
    cust = _t(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("point_id"),
        (((F.col("c_custkey") * 7919) % 1800) / 10.0 + 0.137).alias("px"),
        (((F.col("c_custkey") * 104729) % 1800) / 10.0 + 0.269).alias("py"),
    )
    hits = point_in_polygon_join(pts, polys)
    return hits.groupBy("poly_id").agg(
        F.count("*").alias("n_points"),
        F.sum("point_id").alias("sum_point_ids"),
    )


_NHN_FIX = _FIXDIR / "nhn_basins.csv"

@register(
    "nhn_layer_upsert",
    oracle=f"""
    WITH raw AS (
      SELECT dataset_name, description, area_km2, province
      FROM read_csv('{_NHN_FIX}', header=true)
    ),
    feats AS (
      SELECT 'National Hydro Network - Basins' AS layer_name,
             'NHN basin ' || dataset_name AS feature_name,
             'polygon' AS geom_type,
             description,
             '{{"area_km2":' || CAST(area_km2 AS VARCHAR)
               || ',"province":"' || province || '"}}' AS attributes
      FROM raw
    ),
    existing AS (
      SELECT 'National Hydro Network - Basins' AS layer_name,
             'NHN basin basin_0' || CAST(i AS VARCHAR) AS feature_name,
             'polygon' AS geom_type,
             9001 + i AS geom_id
      FROM range(3) t(i)
    )
    SELECT f.feature_name, f.geom_type, f.description, f.attributes,
           CASE WHEN e.geom_id IS NULL THEN 'insert' ELSE 'update' END AS action,
           COALESCE(e.geom_id,
             CAST('0x' || substr(md5(f.layer_name || '|' || f.feature_name
                                 || '|' || f.geom_type), 1, 15) AS BIGINT)
           ) AS geom_id
    FROM feats f
    LEFT JOIN existing e
      ON e.layer_name = f.layer_name AND e.feature_name = f.feature_name
     AND e.geom_type = f.geom_type
    """,
)
def nhn_layer_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """load_nhn basins layer end-to-end (load_nhn.R:158-196): decoded-
    GPKG payload -> WKT decode kernel -> feature_name construction ->
    attribute JSON routing -> overwrite upsert with geom_id recycling
    (insertACVector.R:263-293). The WKB/ring columns are exercised (the
    kernel runs) but the compared output is the relational contract."""
    from .sources.vector import load_nhn_layer

    existing = spark.range(3).select(
        F.lit("National Hydro Network - Basins").alias("layer_name"),
        F.concat(F.lit("NHN basin basin_0"), F.col("id").cast("string"))
        .alias("feature_name"),
        F.lit("polygon").alias("geom_type"),
        (F.col("id") + 9001).alias("geom_id"),
    )
    out = load_nhn_layer(
        spark, "basins", existing,
        payload_path=str(_NHN_FIX), overwrite=True,
    )
    return out.select("feature_name", "geom_type", "description",
                      "attributes", "action", "geom_id")


_NHN_GPKG = _FIXDIR / "nhn_sample.gpkg"

@register(
    "nhn_gpkg_layer_upsert",
    oracle=f"""
    WITH raw AS (
      SELECT dataset_name, description, geometry, area_km2, province
      FROM read_csv('{_NHN_FIX}', header=true)
    ),
    feats AS (
      SELECT 'National Hydro Network - Basins' AS layer_name,
             'NHN basin ' || dataset_name AS feature_name,
             'polygon' AS geom_type,
             -- WKT ring vertices minus the closing point == decoded
             -- ring length (proves the GPB/WKB decode, not just the
             -- attribute passthrough)
             len(string_split(geometry, ',')) - 1 AS n_vertices,
             description,
             '{{"area_km2":' || CAST(area_km2 AS VARCHAR)
               || ',"province":"' || province || '"}}' AS attributes
      FROM raw
    ),
    existing AS (
      SELECT 'National Hydro Network - Basins' AS layer_name,
             'NHN basin basin_0' || CAST(i AS VARCHAR) AS feature_name,
             'polygon' AS geom_type,
             9001 + i AS geom_id
      FROM range(3) t(i)
    )
    SELECT f.feature_name, f.geom_type, f.n_vertices, f.description,
           f.attributes,
           CASE WHEN e.geom_id IS NULL THEN 'insert' ELSE 'update' END AS action,
           COALESCE(e.geom_id,
             CAST('0x' || substr(md5(f.layer_name || '|' || f.feature_name
                                 || '|' || f.geom_type), 1, 15) AS BIGINT)
           ) AS geom_id
    FROM feats f
    LEFT JOIN existing e
      ON e.layer_name = f.layer_name AND e.feature_name = f.feature_name
     AND e.geom_type = f.geom_type
    """,
)
def nhn_gpkg_layer_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """load_nhn from the NATIVE GeoPackage container
    (R/load_nhn.R:96-115,228-243): executors read disjoint rowid
    ranges of the SQLite feature table, strip the GPB header, decode
    WKB to rings, then run the same feature_name / attribute-JSON /
    upsert pipeline. The oracle reads the CSV twin of the same
    features — the container read must reproduce it exactly,
    including the decoded ring length."""
    from .sources.vector import load_nhn_layer

    existing = spark.range(3).select(
        F.lit("National Hydro Network - Basins").alias("layer_name"),
        F.concat(F.lit("NHN basin basin_0"), F.col("id").cast("string"))
        .alias("feature_name"),
        F.lit("polygon").alias("geom_type"),
        (F.col("id") + 9001).alias("geom_id"),
    )
    out = load_nhn_layer(
        spark, "basins", existing,
        gpkg_path=str(_NHN_GPKG), gpkg_table="basins", overwrite=True,
    )
    return out.select(
        "feature_name", "geom_type",
        F.size("ring").cast("bigint").alias("n_vertices"),
        "description", "attributes", "action", "geom_id",
    )


# ---------------------------------------------------------------------------
# Media stores (insertACImage.R ON CONFLICT(file_hash) merge,
# getNewImages.R watermarks, insertACDocument.R type validation).
# Binary mass is opaque; hashes computed JVM-side; merges are
# relational classifications keyed on the content hash.
# ---------------------------------------------------------------------------

_IMG_INCOMING_SQL = """
      SELECT sha256(text) AS file_hash,
             CASE WHEN doc_id % 3 = 0 THEN NULL
                  ELSE doc_id % 20 END AS img_series_id,
             TIMESTAMP '2024-03-01 00:00:00'
               + to_minutes(CAST(doc_id AS INT)) AS datetime,
             CASE WHEN doc_id % 4 = 0 THEN NULL
                  ELSE 'img of doc ' || CAST(doc_id AS VARCHAR)
                  END AS description
      FROM documents
"""

_IMG_EXISTING_SQL = """
      SELECT sha256(text) AS file_hash,
             doc_id % 7 AS img_series_id,
             TIMESTAMP '2024-01-01 00:00:00'
               + to_minutes(CAST(doc_id AS INT)) AS datetime,
             'old desc ' || CAST(doc_id AS VARCHAR) AS description
      FROM documents WHERE doc_id % 5 = 0
"""


@register(
    "image_hash_upsert",
    oracle=f"""
    WITH incoming AS ({_IMG_INCOMING_SQL}),
         existing AS ({_IMG_EXISTING_SQL})
    SELECT i.file_hash,
           CASE WHEN e.file_hash IS NULL THEN 'insert' ELSE 'update' END
             AS action,
           COALESCE(i.img_series_id, e.img_series_id) AS img_series_id,
           i.datetime,
           COALESCE(i.description, e.description) AS description
    FROM incoming i LEFT JOIN existing e ON e.file_hash = i.file_hash
    """,
)
def image_hash_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed image upsert (insertACImage.R ON CONFLICT
    (file_hash) DO UPDATE): series/description coalesce to the stored
    value, capture datetime takes the new value. Binary mass derived
    from documents.text; the hash join is the store's bucketing key so
    the merge is co-located at scale. 'keep' rows (untouched existing)
    are excluded so the oracle stays a pure left join."""
    from .sources.media import image_upsert

    docs = _t(spark, sf_dir, "documents")
    blob = F.col("text").cast("binary")
    base = dict(
        fetch_datetime=F.lit(None).cast("timestamp"),
        share_with=F.lit("public_reader"),
        location_id=F.lit(None).cast("int"),
        latitude=F.lit(60.0), longitude=F.lit(-135.0), format=F.lit("jpg"),
    )
    incoming = docs.select(
        F.sha2(blob, 256).alias("file_hash"),
        F.when(F.col("doc_id") % 3 == 0, None)
        .otherwise(F.col("doc_id") % 20).cast("int").alias("img_series_id"),
        (F.to_timestamp(F.lit("2024-03-01 00:00:00"))
         + F.col("doc_id").cast("int") * F.expr("INTERVAL 1 MINUTE"))
        .alias("datetime"),
        F.when(F.col("doc_id") % 4 == 0, None)
        .otherwise(F.concat(F.lit("img of doc "), F.col("doc_id").cast("string")))
        .alias("description"),
        *[v.alias(k) for k, v in base.items()],
    )
    existing = docs.where(F.col("doc_id") % 5 == 0).select(
        F.sha2(blob, 256).alias("file_hash"),
        (F.col("doc_id") % 7).cast("int").alias("img_series_id"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.col("doc_id").cast("int") * F.expr("INTERVAL 1 MINUTE"))
        .alias("datetime"),
        F.concat(F.lit("old desc "), F.col("doc_id").cast("string"))
        .alias("description"),
        *[v.alias(k) for k, v in base.items()],
    )
    out = image_upsert(existing, incoming)
    return out.where(F.col("action") != "keep").select(
        "file_hash", "action", "img_series_id", "datetime", "description"
    )


@register(
    "image_series_watermarks",
    oracle="""
    SELECT user_id % 20 AS img_series_id,
           max(ts) AS last_img,
           max(ts) + INTERVAL 1 SECOND AS next_fetch
    FROM events
    GROUP BY 1
    """,
)
def image_series_watermarks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series incremental image fetch start (getNewImages.R:86-88):
    one second past the newest stored capture — one partial-aggregated
    groupBy, the same watermark shape as the continuous pipeline."""
    from .sources.media import image_series_watermarks

    ev = _t(spark, sf_dir, "events")
    imgs = ev.select(
        (F.col("user_id") % 20).cast("long").alias("img_series_id"),
        F.col("ts").alias("datetime"),
    )
    return image_series_watermarks(imgs).select(
        "img_series_id", F.col("last_img"), "next_fetch"
    )


@register(
    "image_share_with_restriction",
    oracle="""
    WITH images AS (
      SELECT doc_id AS img_id,
             CASE WHEN doc_id % 3 = 0 THEN NULL
                  ELSE CAST(doc_id % 20 AS INT) END AS img_series_id,
             CASE WHEN doc_id % 2 = 0
                  THEN ['public_reader', 'yg_reader']
                  ELSE ['yg_reader'] END AS share_with
      FROM documents
    ), idx AS (
      SELECT CAST(sid AS INT) AS img_series_id,
             CASE WHEN sid % 4 = 0 THEN ['public_reader']
                  ELSE ['yg_reader_group'] END AS share_with
      FROM (SELECT unnest(range(0, 15)) AS sid)
    ), j AS (
      SELECT i.img_id, i.img_series_id,
             coalesce(NOT list_contains(x.share_with, 'public_reader'),
                      FALSE) AS parent_restrictive,
             list_contains(i.share_with, 'public_reader') AS child_public
      FROM images i LEFT JOIN idx x
        ON x.img_series_id = i.img_series_id
    )
    SELECT img_id, img_series_id, parent_restrictive,
           (img_series_id IS NOT NULL AND parent_restrictive
            AND child_public) AS violation,
           CASE WHEN img_series_id IS NOT NULL AND parent_restrictive
                     AND child_public
                THEN 'images_index entry for img_series_id '
                     || CAST(img_series_id AS VARCHAR)
                     || ' has a restrictive share_with, '
                     || 'images.share_with cannot be {public_reader}'
           END AS reject_reason
    FROM j
    """,
)
def image_share_with_restriction(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """files.enforce_share_with_restriction (patch_26.R:137-160): an
    image under a restrictively-shared series cannot carry
    public_reader. NULL-series and index-absent rows skip; the series
    dim broadcasts."""
    from .sources.media import image_share_with_validation

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    images = docs.select(
        d.alias("img_id"),
        F.when(d % 3 == 0, F.lit(None))
        .otherwise(d % 20).cast("int").alias("img_series_id"),
        F.when(d % 2 == 0,
               F.array(F.lit("public_reader"), F.lit("yg_reader")))
        .otherwise(F.array(F.lit("yg_reader"))).alias("share_with"),
    )
    # series 15..19 deliberately absent: the trigger's PERFORM finds
    # nothing there, so those rows pass
    idx = spark.range(15).select(
        F.col("id").cast("int").alias("img_series_id"),
        F.when(F.col("id") % 4 == 0, F.array(F.lit("public_reader")))
        .otherwise(F.array(F.lit("yg_reader_group"))).alias("share_with"),
    )
    return image_share_with_validation(images, idx).select(
        "img_id", "img_series_id", "parent_restrictive", "violation",
        "reject_reason")


@register(
    "document_type_validation",
    oracle="""
    WITH dim AS (
      SELECT * FROM (VALUES ('src0', 1), ('src1', 2), ('src2', 3),
                            ('src4', 5)) t(document_type_en, document_type_id)
    ),
    docs AS (
      SELECT 'doc ' || CAST(doc_id AS VARCHAR) AS name,
             source AS type,
             substr(text, 1, CAST(doc_id % 8 AS INT)) AS description,
             doc_id
      FROM documents
    )
    SELECT d.doc_id, d.type,
           dim.document_type_id,
           CASE WHEN dim.document_type_id IS NULL
                  THEN 'unknown document type: ' || d.type
                WHEN length(COALESCE(d.description, '')) < 5
                  THEN 'description must be at least 5 characters'
                ELSE 'ok' END AS status
    FROM docs d LEFT JOIN dim ON dim.document_type_en = d.type
    """,
)
def document_type_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """insertACDocument's gate (R/insertACDocument.R:66-133) as a
    split-validation pass: type resolved against the broadcast dim
    (src3 deliberately missing), short descriptions rejected — every
    violation reported in one scan instead of fail-fast."""
    from .sources.media import validate_documents

    docs = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("doc "), F.col("doc_id").cast("string")).alias("name"),
        F.col("source").alias("type"),
        F.expr("substr(text, 1, CAST(doc_id % 8 AS INT))").alias("description"),
        "doc_id",
    )
    dim = _ldf(spark, 
        [("src0", 1), ("src1", 2), ("src2", 3), ("src4", 5)],
        "document_type_en string, document_type_id int",
    )
    ok, rejects = validate_documents(docs, dim)
    out = ok.withColumn("status", F.lit("ok")).unionByName(
        rejects.withColumnRenamed("reject_reason", "status")
    )
    return out.select("doc_id", "type", "document_type_id", "status")


# ---------------------------------------------------------------------------
# Discrete water-quality + snow-course connectors (downloadECCCwq.R,
# downloadSnowCourse.R).
# ---------------------------------------------------------------------------

_WQ_FIX = _FIXDIR / "ecccwq_lt.csv"
_WQ_KEY = _FIXDIR / "ecccwq_key.csv"


@register(
    "ecccwq_results",
    oracle=f"""
    WITH f AS (
      SELECT SITE_NO AS site,
             CAST(DATE_TIME_HEURE AS TIMESTAMP) + INTERVAL 7 HOURS AS datetime,
             COALESCE(FLAG_MARQUEUR, '') AS flag,
             CAST(VALUE_VALEUR AS DOUBLE) AS raw_value,
             UNIT_UNITE AS input_unit, VARIABLE AS input_param
      FROM read_csv('{_WQ_FIX}', header=true, all_varchar=true)
      WHERE SITE_NO = 'YT08AA0017'
    ),
    k AS (SELECT * FROM read_csv('{_WQ_KEY}', header=true)),
    mapped AS (
      SELECT f.datetime, k.result_type, k.parameter_id,
             k.sample_fraction_id, k.matrix_state_id, f.flag,
             f.raw_value * k.conversion + k.result_offset AS conv
      FROM f JOIN k ON k.input_param = f.input_param
                   AND k.input_unit = f.input_unit
      WHERE f.flag IN ('', '<', '>')
    )
    SELECT datetime, result_type, parameter_id, sample_fraction_id,
           matrix_state_id,
           CASE WHEN flag IN ('<', '>') THEN NULL
                ELSE {R('conv', 6)} END AS result,
           CASE WHEN flag = '<' THEN 1 WHEN flag = '>' THEN 2
                ELSE NULL END AS result_condition,
           CASE WHEN flag IN ('<', '>') THEN {R('conv', 6)}
                ELSE NULL END AS result_condition_value
    FROM mapped
    """,
)
def ecccwq_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canned ECCC water-quality payload through the full connector
    (R/downloadECCCwq.R:230-392): bilingual-header CSV -> MST->UTC
    shift -> import-key mapping with unit conversion -> censoring-flag
    dispatch ('<' below / '>' above detection, other flags rejected)."""
    from .sources.ecccwq import download_ecccwq

    key = spark.read.option("header", True).option("inferSchema", True) \
        .csv(str(_WQ_KEY))
    out = download_ecccwq(
        spark, "YT08AA0017", key,
        "2024-01-01 00:00:00", "2024-12-31 23:59:59", tz="MST",
        payload_path=str(_WQ_FIX),
    )
    return _round(out["results"], {"result": 6, "result_condition_value": 6})


@register(
    "snowcourse_station_merge",
    oracle="""
    WITH meas AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'OLD' ELSE 'NEW' END AS location,
             CAST(ts AS DATE) AS survey_date,
             value AS swe, value * 0.5 AS depth,
             event_type = 'error' AS exclude_flag
      FROM events
    ),
    means AS (
      SELECT location, survey_date,
             CAST(survey_date AS TIMESTAMP) + INTERVAL 68400 SECONDS
               AS datetime,
             p.parameter,
             CASE p.parameter WHEN 'swe'
               THEN sum(CAST(floor(swe * 1000000 + 0.5) AS BIGINT))
                    / 1000000.0 / count(swe)
               ELSE sum(CAST(floor(depth * 1000000 + 0.5) AS BIGINT))
                    / 1000000.0 / count(depth) END AS result
      FROM meas, (VALUES ('swe'), ('depth')) p(parameter)
      WHERE NOT exclude_flag AND (swe IS NOT NULL OR depth IS NOT NULL)
      GROUP BY location, survey_date, p.parameter
    ),
    old_m AS (SELECT * FROM means WHERE location = 'OLD'),
    new_m AS (SELECT * FROM means WHERE location = 'NEW'),
    common AS (
      SELECT DISTINCT o.datetime FROM old_m o JOIN new_m n USING (datetime)
    ),
    offsets AS (
      SELECT n.parameter,
             (SELECT sum(CAST(floor(n2.result * 1000000 + 0.5) AS BIGINT))
                       / 1000000.0 / count(*)
              FROM new_m n2 JOIN common c ON c.datetime = n2.datetime
              WHERE n2.parameter = n.parameter)
             / (SELECT sum(CAST(floor(o2.result * 1000000 + 0.5) AS BIGINT))
                       / 1000000.0 / count(*)
                FROM old_m o2 JOIN common c ON c.datetime = o2.datetime
                WHERE o2.parameter = n.parameter) AS offset
      FROM (SELECT DISTINCT parameter FROM new_m) n
    )
    SELECT parameter, datetime,
           floor(result * 1000000 + 0.5) / 1000000 AS result,
           FALSE AS adjusted
    FROM new_m
    UNION ALL
    SELECT o.parameter, o.datetime,
           floor(o.result * COALESCE(f.offset, 1.0) * 1000000 + 0.5)
             / 1000000 AS result,
           TRUE AS adjusted
    FROM old_m o
    LEFT JOIN offsets f ON f.parameter = o.parameter
    WHERE o.datetime NOT IN (SELECT datetime FROM new_m)
    """,
)
def snowcourse_station_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snow-course station move (downloadSnowCourse.R:184-330): per-
    survey SWE/depth means (exclusion-filtered, noon-MST shifted),
    ratio calibration over common survey dates, old history scaled and
    deduplicated against the new station — one relational pass."""
    from .sources.snowcourse import station_move_adjust, survey_means

    ev = _t(spark, sf_dir, "events")
    meas = ev.select(
        F.when(F.col("user_id") % 2 == 0, "OLD").otherwise("NEW")
        .alias("location"),
        F.lit(0).alias("survey_id"),
        F.col("ts").cast("date").alias("survey_date"),
        F.col("ts").cast("date").alias("target_date"),
        F.col("value").alias("swe"),
        (F.col("value") * 0.5).alias("depth"),
        (F.col("event_type") == "error").alias("exclude_flag"),
    )
    # station_move_adjust references both stations' means repeatedly
    # (common dates, ratio offsets, dedupe) — one materialization of
    # the per-survey means instead of re-aggregating the fact per leg
    means = survey_means(meas).select("location", "parameter", "datetime",
                                      "result").persist()
    old = means.where(F.col("location") == "OLD").drop("location")
    new = means.where(F.col("location") == "NEW").drop("location")
    out = station_move_adjust(old, new)
    return _round(out.select("parameter", "datetime", "result", "adjusted"),
                  {"result": 6})


# ---------------------------------------------------------------------------
# Training-data tier: winnowing rolling-hash fingerprints (MOSS scheme).
# Local-overlap dedup complement to exact/MinHash — guarantees any shared
# substring of length >= k + window - 1 produces a shared fingerprint.
# ---------------------------------------------------------------------------

_WINNOW_ORACLE = """
    WITH s AS (
      SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
      FROM documents
    ), g AS (
      SELECT doc_id, i,
             CAST('0x' || substr(md5(substr(s, CAST(i AS INT), 8)), 1, 15)
                  AS BIGINT) AS h,
             length(s) - 7 AS m
      FROM s, LATERAL (
        SELECT unnest(generate_series(1, greatest(length(s) - 7, 0))) AS i
      ) t
    ), w AS (
      SELECT doc_id, i, m,
             min(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM g
    )
    SELECT DISTINCT doc_id, fp FROM w WHERE i <= m - 3
"""


@register("winnow_fingerprints", oracle=_WINNOW_ORACLE)
def winnow_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import winnow_fingerprints

    docs = _t(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, k=8, window=4)


# ---------------------------------------------------------------------------
# Training-data tier: token budgeting — whitespace vs BPE-ish subword
# boundary counts + chars/token (the LLM corpus-sizing statistics).
# ---------------------------------------------------------------------------

_TOKEN_STATS_ORACLE = f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))
               AS bpe_tokens,
           {R("CAST(length(text) AS DOUBLE) / greatest(len(regexp_extract_all("
              "text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')), 1)", 6)}
               AS chars_per_token
    FROM documents
"""


@register("token_stats", oracle=_TOKEN_STATS_ORACLE)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import bpe_token_count, token_count

    docs = _t(spark, sf_dir, "documents")
    bpe = bpe_token_count(F.col("text"))
    out = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        (F.length("text").cast("double") / F.greatest(bpe, F.lit(1)))
        .alias("chars_per_token"),
    )
    return _round(out, {"chars_per_token": 6})


# ---------------------------------------------------------------------------
# maintain.R housekeeping as oracle-checked operators
# (operators/maintenance.py): visibility expiry flip, timeseries bounds
# refresh, orphan/missing-point location checks, and NHN-based location
# code generation (generateACLocationCode.R).
# ---------------------------------------------------------------------------

_VIS_ORACLE = """
    WITH base AS (
      SELECT doc_id,
             CASE doc_id % 3
               WHEN 0 THEN ['public_reader']
               WHEN 1 THEN ['admin']
               ELSE ['admin', 'public_reader'] END AS share_with,
             CASE WHEN doc_id % 5 = 0 THEN NULL
                  ELSE DATE '2026-01-01' + (doc_id % 200) * INTERVAL 1 DAY
             END AS private_expiry
      FROM documents
    ), flipped AS (
      SELECT doc_id,
             CASE WHEN private_expiry IS NOT NULL
                       AND private_expiry < DATE '2026-04-01'
                       AND share_with != ['public_reader']
                  THEN ['public_reader'] ELSE share_with END AS share_with,
             private_expiry
      FROM base
    )
    SELECT doc_id,
           array_to_string(share_with, ',') AS share_csv,
           CASE WHEN share_with = ['public_reader'] THEN NULL
                ELSE private_expiry END AS private_expiry
    FROM flipped
"""


@register("visibility_expiry_maintenance", oracle=_VIS_ORACLE)
def visibility_expiry_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maintain.R:204-242 visibility_check — private rows whose expiry
    has passed become public, and expiry clears on public rows."""
    from .operators.maintenance import visibility_expiry_flip

    docs = _t(spark, sf_dir, "documents")
    share = (
        F.when(F.col("doc_id") % 3 == 0, F.array(F.lit("public_reader")))
        .when(F.col("doc_id") % 3 == 1, F.array(F.lit("admin")))
        .otherwise(F.array(F.lit("admin"), F.lit("public_reader")))
    )
    expiry = F.when(
        F.col("doc_id") % 5 != 0,
        F.date_add(F.lit("2026-01-01").cast("date"),
                   (F.col("doc_id") % 200).cast("int")),
    )
    staged = docs.select("doc_id", share.alias("share_with"),
                         expiry.alias("private_expiry"))
    out = visibility_expiry_flip(staged, F.lit("2026-04-01").cast("date"))
    return out.select(
        "doc_id",
        F.array_join("share_with", ",").alias("share_csv"),
        "private_expiry",
    )


_BOUNDS_ORACLE = """
    WITH actual AS (
      SELECT event_type, min(CAST(ts AS TIMESTAMP)) AS lo,
             max(CAST(ts AS TIMESTAMP)) AS hi
      FROM events GROUP BY event_type
    ), dim AS (
      SELECT event_type, date_trunc('day', lo) AS start_datetime,
             date_trunc('day', hi) AS end_datetime
      FROM actual
    )
    SELECT d.event_type,
           CASE WHEN d.start_datetime != a.lo OR d.end_datetime != a.hi
                THEN a.lo ELSE d.start_datetime END AS start_datetime,
           CASE WHEN d.start_datetime != a.lo OR d.end_datetime != a.hi
                THEN a.hi ELSE d.end_datetime END AS end_datetime,
           (d.start_datetime != a.lo OR d.end_datetime != a.hi)
               AS bounds_changed
    FROM dim d JOIN actual a USING (event_type)
"""


@register("timeseries_bounds_check", oracle=_BOUNDS_ORACLE)
def timeseries_bounds_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maintain.R:51-93 timeseries_check — stale dim bounds (here: the
    day-truncated actuals) get patched from the measurement min/max."""
    from .operators.maintenance import timeseries_bounds_refresh

    ev = _t(spark, sf_dir, "events")
    actual = ev.groupBy("event_type").agg(
        F.min("ts").alias("__lo0"), F.max("ts").alias("__hi0")
    )
    dim = actual.select(
        "event_type",
        F.date_trunc("day", "__lo0").alias("start_datetime"),
        F.date_trunc("day", "__hi0").alias("end_datetime"),
    )
    out = timeseries_bounds_refresh(dim, ev, ts_col="event_type", dt_col="ts")
    return out.select("event_type", "start_datetime", "end_datetime",
                      "bounds_changed")


_LOC_CHECKS_ORACLE = """
    WITH used AS (
      SELECT DISTINCT l_suppkey AS uid FROM lineitem WHERE l_quantity > 30
    ), feats AS (
      SELECT lower('LOC-' || CAST(s_suppkey AS VARCHAR)) AS feat
      FROM supplier WHERE s_suppkey % 2 = 0
    )
    SELECT s_suppkey AS location_id,
           (uid IS NULL) AS orphan,
           (feat IS NULL) AS missing_point
    FROM supplier
    LEFT JOIN used ON used.uid = s_suppkey
    LEFT JOIN feats
      ON feats.feat = lower('LOC-' || CAST(s_suppkey AS VARCHAR))
"""


@register("location_checks", oracle=_LOC_CHECKS_ORACLE)
def location_checks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maintain.R:95-201 locations_check — unreferenced locations and
    locations lacking a point feature in the vector store."""
    from .operators.maintenance import location_checks

    supp = _t(spark, sf_dir, "supplier")
    locations = supp.select(
        F.col("s_suppkey").alias("location_id"),
        F.concat(F.lit("LOC-"), F.col("s_suppkey").cast("string"))
        .alias("location_code"),
    )
    used = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 30)
        .select(F.col("l_suppkey").alias("location_id"))
    )
    feats = supp.where(F.col("s_suppkey") % 2 == 0).select(
        F.lit("Locations").alias("layer_name"),
        F.concat(F.lit("LOC-"), F.col("s_suppkey").cast("string"))
        .alias("feature_name"),
    )
    out = location_checks(locations, used, feats)
    return out.select("location_id", "orphan", "missing_point")


_CODE_GEN_ORACLE = """
    WITH tri AS (
      SELECT n_nationkey AS bid,
             CAST((n_nationkey * 37) % 180 AS DOUBLE) AS ax,
             CAST((n_nationkey * 53) % 180 AS DOUBLE) AS ay,
             CAST((n_nationkey * 37) % 180 + 15 + n_nationkey % 7 AS DOUBLE) AS bx,
             CAST((n_nationkey * 53) % 180 + 3 + n_nationkey % 5 AS DOUBLE) AS by,
             CAST((n_nationkey * 37) % 180 + 5 + n_nationkey % 4 AS DOUBLE) AS cx,
             CAST((n_nationkey * 53) % 180 + 17 + n_nationkey % 6 AS DOUBLE) AS cy,
             lpad(CAST((n_nationkey * 7) % 90 + 10 AS VARCHAR), 2, '0')
               || chr(65 + n_nationkey % 26)
               || chr(65 + (n_nationkey * 3) % 26)
               || ' Basin' AS feature_name
      FROM nation
    ),
    pts AS (
      SELECT c_custkey AS point_id,
             ((c_custkey * 7919) % 1800) / 10.0 + 0.137 AS px,
             ((c_custkey * 104729) % 1800) / 10.0 + 0.269 AS py,
             c_custkey % 3 AS type_id
      FROM customer
    ),
    types(type_id, type_suffix) AS (VALUES (0, 'WL'), (1, 'HG'), (2, NULL)),
    hits AS (
      SELECT point_id, px, py, type_id, feature_name,
             abs((bx - ax) * (cy - ay) - (cx - ax) * (by - ay)) AS area2
      FROM tri JOIN pts
        ON (bx - ax) * (py - ay) - (by - ay) * (px - ax) > 0
       AND (cx - bx) * (py - by) - (cy - by) * (px - bx) > 0
       AND (ax - cx) * (py - cy) - (ay - cy) * (px - cx) > 0
    ),
    assigned AS (
      SELECT *, row_number() OVER (
        PARTITION BY point_id ORDER BY area2, feature_name) AS rn
      FROM hits
    ),
    prefixed AS (
      SELECT a.point_id, a.feature_name,
             regexp_extract(a.feature_name, '^([0-9]{2}[A-Za-z]{2,3})', 1)
               || '-' || coalesce(t.type_suffix, 'OT') AS prefix
      FROM assigned a LEFT JOIN types t USING (type_id)
      WHERE rn = 1
    ),
    existing AS (
      SELECT lpad(CAST((n_nationkey * 7) % 90 + 10 AS VARCHAR), 2, '0')
               || chr(65 + n_nationkey % 26)
               || chr(65 + (n_nationkey * 3) % 26)
               || '-WL-00007' AS code
      FROM nation WHERE n_nationkey = 1
    ),
    base AS (
      SELECT regexp_extract(code, '^(.*)-([0-9]+)$', 1) AS prefix,
             max(CAST(regexp_extract(code, '([0-9]+)$', 1) AS BIGINT)) AS b
      FROM existing GROUP BY 1
    )
    SELECT p.point_id, p.feature_name, p.prefix,
           p.prefix || '-' ||
           CASE WHEN length(CAST(coalesce(b.b, 0) + rn2 AS VARCHAR)) > 5
                THEN CAST(coalesce(b.b, 0) + rn2 AS VARCHAR)
                ELSE lpad(CAST(coalesce(b.b, 0) + rn2 AS VARCHAR), 5, '0')
           END AS location_code
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY prefix ORDER BY point_id) AS rn2
      FROM prefixed
    ) p LEFT JOIN base b ON b.prefix = p.prefix
"""


@register("location_code_generation", oracle=_CODE_GEN_ORACLE)
def location_code_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generateACLocationCode.R:120-188 — smallest containing basin ->
    'NNAA-TT-#####' codes continuing after the existing per-prefix max.
    The oracle proves containment + numbering through independent math
    (half-plane tests vs the ray-cast kernel)."""
    from .operators.maintenance import generate_location_codes

    nation = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    ax, ay = (k * 37) % 180, (k * 53) % 180
    verts = [
        (ax, ay),
        (ax + 15 + k % 7, ay + 3 + k % 5),
        (ax + 5 + k % 4, ay + 17 + k % 6),
    ]
    fname = F.concat(
        F.lpad(((k * 7) % 90 + 10).cast("string"), 2, "0"),
        F.expr("chr(65 + n_nationkey % 26)"),
        F.expr("chr(65 + (n_nationkey * 3) % 26)"),
        F.lit(" Basin"),
    )
    basins = nation.select(
        fname.alias("feature_name"),
        F.array(*[
            F.struct(x.cast("double").alias("x"), y.cast("double").alias("y"))
            for x, y in verts
        ]).alias("ring"),
    )
    cust = _t(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("point_id"),
        (((F.col("c_custkey") * 7919) % 1800) / 10.0 + 0.137).alias("px"),
        (((F.col("c_custkey") * 104729) % 1800) / 10.0 + 0.269).alias("py"),
        (F.col("c_custkey") % 3).cast("int").alias("type_id"),
    )
    types = _ldf(spark, 
        [(0, "WL"), (1, "HG"), (2, None)], "type_id int, type_suffix string"
    )
    existing = nation.where(k == 1).select(
        F.concat(fname.substr(F.lit(1), F.length(fname) - F.lit(6)),
                 F.lit("-WL-00007")).alias("code")
    )
    return generate_location_codes(pts, basins, types, existing)


# ---------------------------------------------------------------------------
# Training-data tier: duplicate-cluster formation — connected components
# over the MinHash-LSH candidate pairs (the step that turns pairwise
# near-dup hits into transitive "keep one per group" clusters). Oracle:
# a recursive CTE computes each node's min reachable id over the same
# symmetrized edge list.
# ---------------------------------------------------------------------------

_COMP_SQL = "WITH RECURSIVE " + _MINHASH_SQL + """
    , banded AS (
      SELECT doc_id, band, key FROM (
        SELECT doc_id,
               unnest([0, 1, 2, 3]) AS band,
               unnest([CAST(h0 AS VARCHAR) || ',' || CAST(h1 AS VARCHAR),
                       CAST(h2 AS VARCHAR) || ',' || CAST(h3 AS VARCHAR),
                       CAST(h4 AS VARCHAR) || ',' || CAST(h5 AS VARCHAR),
                       CAST(h6 AS VARCHAR) || ',' || CAST(h7 AS VARCHAR)]) AS key
        FROM sig
      )
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
      WHERE a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, lab) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node, min(lab) AS cluster_rep FROM reach GROUP BY node)
"""

_CLUSTERS_ORACLE = _COMP_SQL + """
    SELECT c.node AS doc_id, c.cluster_rep,
           count(*) OVER (PARTITION BY c.cluster_rep) AS cluster_size
    FROM comp c
"""


@register("dedup_clusters", oracle=_CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import (
        duplicate_clusters,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, num_hashes=8, shingle_k=3)
    pairs = lsh_candidate_pairs(sig, num_hashes=8, bands=4)
    return duplicate_clusters(pairs, docs.select("doc_id"))


# ---------------------------------------------------------------------------
# Training-data tier: CLUSTER-SAFE corpus split. A naive per-doc split
# leaks training data: two near-duplicate documents can land in train
# and test. Keying the deterministic split assignment by cluster_rep
# (instead of doc_id) puts every member of a near-dup cluster in the
# same partition — the leakage-prevention step a 100 TB pretraining
# pipeline runs between dedup and sharding.
# ---------------------------------------------------------------------------

_CLUSTER_SPLIT_ORACLE = _COMP_SQL + """
    , cb AS (
      SELECT node AS doc_id, cluster_rep,
             count(*) OVER (PARTITION BY cluster_rep) AS cluster_size,
             CAST('0x' || substr(md5(CAST(cluster_rep AS VARCHAR)
                                     || '|split-v1'), 1, 8) AS BIGINT)
               % 100 AS bucket
      FROM comp
    )
    SELECT doc_id, cluster_rep, cluster_size, bucket,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
    FROM cb
"""


# ---------------------------------------------------------------------------
# Training-data tier CAPSTONE: the corpus-curation pipeline END TO END —
# quality gate -> near-dup clustering -> keep one representative per
# cluster (min surviving id) -> cluster-safe split -> per-split doc /
# cluster / token budget. Every stage is individually ⊕ elsewhere; this
# row pins their composition (filter-before-dedup ordering, rep chosen
# among survivors, budget on the BPE-ish count).
# ---------------------------------------------------------------------------

def _split_bucket(idc) -> F.Column:
    """The deterministic split bucket (same idiom as
    operators/dedup.stratified_split): md5 of "<id>|split-v1", first 8
    hex chars as int, mod 100."""
    from .functions.text import md5_int

    return md5_int(F.concat(idc.cast("string"), F.lit("|split-v1")), 8) % 100


_CURATION_QUALITY_SQL = """
      SELECT doc_id,
             floor(((least(length(text) / 200.0, 1.0)
               + least(CAST(len(list_filter(string_split(lower(text), ' '),
                   t -> t IN ('the','a','an','and','or','of','to','in','is',
                              'it','that','for','on','with','as','are','was',
                              'at','by','be'))) AS DOUBLE)
                 / greatest(len(string_split(lower(text), ' ')), 1) * 5.0, 1.0)
               + (1.0 - least((length(text) - length(regexp_replace(
                   text, '[^a-zA-Z0-9 ]', '', 'g')))
                 / greatest(length(text), 1) * 4.0, 1.0))) / 3.0)
               * 1000000 + 0.5) / 1000000 AS q,
             len(regexp_extract_all(text,
                 ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS bpe_tokens
      FROM documents
"""

_CURATION_ORACLE = _COMP_SQL + f"""
    , qual AS ({_CURATION_QUALITY_SQL})
    , kept AS (
      SELECT q2.doc_id, q2.bpe_tokens, c.cluster_rep
      FROM qual q2 JOIN comp c ON c.node = q2.doc_id
      WHERE q2.q >= 0.7
    ), reps AS (
      SELECT *, min(doc_id) OVER (PARTITION BY cluster_rep) AS surv_rep
      FROM kept
    ), uniq AS (
      SELECT doc_id, bpe_tokens, cluster_rep,
             CAST('0x' || substr(md5(CAST(cluster_rep AS VARCHAR)
                                     || '|split-v1'), 1, 8) AS BIGINT)
               % 100 AS bucket
      FROM reps WHERE doc_id = surv_rep
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(count(DISTINCT cluster_rep) AS BIGINT) AS n_clusters,
           CAST(sum(bpe_tokens) AS BIGINT) AS total_tokens
    FROM uniq GROUP BY 1
"""


@register("corpus_curation", oracle=_CURATION_ORACLE)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation end to end: quality-gate (composite heuristic,
    1e-6-rounded threshold compare so both engines cut identically) ->
    LSH near-dup clusters -> keep the minimum surviving id per cluster
    -> split keyed by cluster_rep -> per-split document count, cluster
    count, and BPE-ish token budget.

    Scale: quality/token metrics are map-only; clustering is the
    audited label-propagation pass; the rep selection is one window
    over (cluster_rep); the final agg is 3 groups. Nothing here adds a
    shuffle beyond the already-audited stages."""
    from .functions.text import bpe_token_count, quality_score
    from .operators.dedup import (
        duplicate_clusters,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, num_hashes=8, shingle_k=3)
    pairs = lsh_candidate_pairs(sig, num_hashes=8, bands=4)
    clusters = duplicate_clusters(pairs, docs.select("doc_id"))

    q = F.floor(quality_score(F.col("text")) * 1000000.0 + F.lit(0.5)) / 1000000.0
    qual = docs.select(
        "doc_id", q.alias("q"), bpe_token_count(F.col("text")).alias("bpe_tokens")
    )
    kept = qual.where(F.col("q") >= 0.7).join(
        clusters.select("doc_id", "cluster_rep"), "doc_id"
    )
    surv = F.min("doc_id").over(Window.partitionBy("cluster_rep"))
    uniq = (
        kept.withColumn("__surv", surv)
        .where(F.col("doc_id") == F.col("__surv"))
        .withColumn(
            "bucket",
            _split_bucket(F.col("cluster_rep")),
        )
    )
    return uniq.groupBy(
        F.when(F.col("bucket") < 90, "train")
        .when(F.col("bucket") < 95, "val")
        .otherwise("test")
        .alias("split")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster_rep").cast("long").alias("n_clusters"),
        F.sum("bpe_tokens").cast("long").alias("total_tokens"),
    )


@register("cluster_safe_split", oracle=_CLUSTER_SPLIT_ORACLE)
def cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware train/val/test split: LSH candidate pairs -> connected
    components -> deterministic split keyed by the cluster representative,
    so near-duplicates never straddle splits. Scale: clusters are one
    label-propagation pass over the (pruned) LSH edge list; the split is
    a pure projection of cluster_rep — no extra shuffle beyond the
    cluster join itself."""
    from .operators.dedup import (
        duplicate_clusters,
        lsh_candidate_pairs,
        minhash_signatures,
        stratified_split,
    )

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, num_hashes=8, shingle_k=3)
    pairs = lsh_candidate_pairs(sig, num_hashes=8, bands=4)
    clusters = duplicate_clusters(pairs, docs.select("doc_id"))
    out = stratified_split(clusters, id_col="cluster_rep")
    return out.select(
        "doc_id", "cluster_rep", "cluster_size",
        F.col("__bucket").alias("bucket"), "split",
    )


# ---------------------------------------------------------------------------
# Training-data tier: deterministic stratified train/val/test split —
# assignment is a pure function of (doc_id, salt), reproducible across
# engines/partitionings; per-source fraction overrides.
# ---------------------------------------------------------------------------

_SPLIT_ORACLE = """
    WITH b AS (
      SELECT doc_id, source,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|split-v1'),
                                 1, 8) AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, source, bucket,
           CASE
             WHEN source = 'src0' THEN
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val' ELSE 'test' END
             WHEN source = 'src1' THEN
               CASE WHEN bucket < 95 THEN 'train'
                    WHEN bucket < 98 THEN 'val' ELSE 'test' END
             ELSE
               CASE WHEN bucket < 90 THEN 'train'
                    WHEN bucket < 95 THEN 'val' ELSE 'test' END
           END AS split
    FROM b
"""


@register("stratified_split", oracle=_SPLIT_ORACLE)
def stratified_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import stratified_split

    docs = _t(spark, sf_dir, "documents")
    out = stratified_split(
        docs, fractions={"src0": (80, 10), "src1": (95, 3)}
    )
    return out.select("doc_id", "source", F.col("__bucket").alias("bucket"),
                      "split")


# ---------------------------------------------------------------------------
# Deterministic exact-k-per-stratum sampling: rank by salted id hash,
# keep the k smallest — the reproducible reservoir-sampling
# replacement (inspection panels, per-domain pilots).
# ---------------------------------------------------------------------------

_HASH_SAMPLE_ORACLE = """
    WITH h AS (
      SELECT doc_id, source,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                     || '|sample-v1'), 1, 15) AS BIGINT)
               AS hh
      FROM documents
    ), r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY hh ASC, doc_id ASC)
               AS sample_rank
      FROM h
    )
    SELECT doc_id, source, CAST(sample_rank AS BIGINT) AS sample_rank
    FROM r WHERE sample_rank <= 7
"""


@register("hash_stratified_sample", oracle=_HASH_SAMPLE_ORACLE)
def hash_stratified_sample_q(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Exact 7 docs per source, drawn by salted-hash rank (no RNG:
    same salt -> same sample on any engine/partitioning)."""
    from .operators.dedup import hash_stratified_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return hash_stratified_sample(docs, k=7)


# ---------------------------------------------------------------------------
# Weighted A-ES sampling: inclusion probability proportional to a
# per-doc weight, without replacement, no RNG — key = ln(u)/w from the
# salted id hash, nano-quantized before the per-stratum rank.
# ---------------------------------------------------------------------------

_WSAMPLE_ORACLE = """
    WITH h AS (
      SELECT doc_id, source, (doc_id % 10) + 1 AS weight,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                     || '|wsample-v1'), 1, 15) AS BIGINT)
               AS hh
      FROM documents
    ), keyed AS (
      SELECT doc_id, source, weight,
             CAST(floor(
               ln((hh + 1) / CAST(1152921504606846976 AS DOUBLE))
               / CAST(weight AS DOUBLE) * 1000000000.0) AS BIGINT) AS k
      FROM h WHERE weight > 0
    ), r AS (
      SELECT doc_id, source, weight,
             row_number() OVER (PARTITION BY source
                                ORDER BY k DESC, doc_id ASC)
               AS sample_rank
      FROM keyed
    )
    SELECT doc_id, source, CAST(weight AS BIGINT) AS weight,
           CAST(sample_rank AS BIGINT) AS sample_rank
    FROM r WHERE sample_rank <= 7
"""


@register("weighted_stratified_sample", oracle=_WSAMPLE_ORACLE)
def weighted_stratified_sample_q(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """7 docs per source, weight-proportional (A-ES) with weight =
    doc_id % 10 + 1."""
    from .operators.dedup import weighted_stratified_sample

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source",
        (F.col("doc_id") % 10 + 1).alias("weight"))
    return weighted_stratified_sample(docs, k=7, weight_col="weight")


# ---------------------------------------------------------------------------
# TF-IDF top-k terms per document (operators/search.tfidf_top_terms):
# corpus-keyword extraction; df join stays an equi-join (vocab-sized,
# never broadcast at web scale), n_docs is an agg + 1-row broadcast.
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = """
    WITH postings AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
      GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, count(*) AS df FROM postings GROUP BY 1
    ), nd AS (
      SELECT count(DISTINCT doc_id) AS n_docs FROM documents
    ), scored AS (
      SELECT p.doc_id, p.term,
             CAST(floor(p.tf * ln((nd.n_docs + CAST(1 AS DOUBLE))
                                  / (d.df + CAST(1 AS DOUBLE)))
                        * 1000000.0 + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS q
      FROM postings p JOIN dfreq d USING (term) CROSS JOIN nd
    ), ranked AS (
      SELECT doc_id, term, q,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY q DESC, term ASC) AS rank
      FROM scored
    )
    SELECT doc_id, term, CAST(rank AS BIGINT) AS rank,
           q / 1000000.0 AS tfidf
    FROM ranked WHERE rank <= 3
"""


@register("tfidf_top_terms", oracle=_TFIDF_ORACLE)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document."""
    from .operators.search import tfidf_top_terms

    docs = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, k=3)


# ---------------------------------------------------------------------------
# Sketch tier (operators/sketch.py): bounded-state corpus statistics.
# Deterministic by construction — md5-prefix hashing, integer register
# max / counter sums, one final float closed form over exactly-summed
# integers — so the full sketch STATE hash-matches the oracle, unlike
# approx_count_distinct's engine-private HLL++ registers.
# ---------------------------------------------------------------------------

_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256)

_HLL_ORACLE = f"""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS tokk
      FROM documents
    ), h AS (
      SELECT source,
             CAST('0x' || substr(md5(tokk), 1, 15) AS BIGINT) AS hh
      FROM tok
    ), r AS (
      SELECT source, hh % 256 AS idx, hh // 256 AS w FROM h
    ), regs AS (
      SELECT source, idx,
             max(CASE WHEN w > 0 THEN 52 - (length(bin(w)) - 1)
                      ELSE 53 END) AS m
      FROM r GROUP BY 1, 2
    ), pg AS (
      SELECT source, count(*) AS n_registers,
             sum(CAST(1 AS BIGINT) << (53 - m)) AS s_present
      FROM regs GROUP BY 1
    ), fin AS (
      SELECT source, n_registers,
             256 - n_registers AS zeros,
             s_present + (256 - n_registers)
               * (CAST(1 AS BIGINT) << 53) AS s_units
      FROM pg
    )
    SELECT source, CAST(n_registers AS BIGINT) AS n_registers,
           CAST(zeros AS BIGINT) AS zeros,
           CAST(s_units AS BIGINT) AS s_units,
           {R(f'''CASE WHEN CAST({_HLL_ALPHA!r} AS DOUBLE) * 256.0
                       * 256.0 * 9007199254740992.0 / s_units <= 640.0
                       AND zeros > 0
                  THEN 256.0 * ln(CAST(256 AS DOUBLE) / zeros)
                  ELSE CAST({_HLL_ALPHA!r} AS DOUBLE) * 256.0 * 256.0
                       * 9007199254740992.0 / s_units END''', 6)}
             AS estimate
    FROM fin
"""


@register("hll_token_distinct", oracle=_HLL_ORACLE)
def hll_token_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-token estimate from 256 HLL registers —
    register state AND estimate both hash-matched."""
    from .functions.text import tokens
    from .operators.sketch import hll_distinct

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tokens(F.lower(F.col("text")))).alias("tokk"))
    out = hll_distinct(tok, "tokk", group_cols=["source"], p=8)
    return _round(out, {"estimate": 6})


_HISTQ_ORACLE = """
    WITH v AS (
      SELECT source, len(string_split(text, ' ')) AS nv FROM documents
    ), binned AS (
      SELECT source,
             CAST(least(greatest(floor(
               (CAST(nv AS DOUBLE) - CAST(0 AS DOUBLE))
               / CAST(512 AS DOUBLE) * 128), 0), 127) AS INT) AS bin
      FROM v
    ), counts AS (
      SELECT source, bin, count(*) AS c FROM binned GROUP BY 1, 2
    ), cum AS (
      SELECT source, bin, c,
             sum(c) OVER (PARTITION BY source ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY source) AS n
      FROM counts
    ), hits AS (
      SELECT source, p.pct, min(bin) AS bin, min(n) AS n
      FROM cum CROSS JOIN (SELECT unnest([50, 90, 99]) AS pct) p
      WHERE 100 * cum >= p.pct * n
      GROUP BY 1, 2
    )
    SELECT source, CAST(pct AS INT) AS pct, CAST(bin AS BIGINT) AS bin,
           CAST(0 AS DOUBLE) + (bin + 1) * CAST(512 AS DOUBLE) / 128
             AS upper_edge,
           CAST(n AS BIGINT) AS n
    FROM hits
"""


@register("histogram_length_quantiles", oracle=_HISTQ_ORACLE)
def histogram_length_quantiles_q(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """p50/p90/p99 of per-doc token length per source from a 128-bin
    histogram sketch (bounded, mergeable state; integer rank test —
    the exact-quantile's full-sort replacement for dashboards)."""
    from .functions.text import tokens
    from .operators.sketch import histogram_quantiles

    docs = _t(spark, sf_dir, "documents")
    lens = docs.select(
        "source", F.size(tokens(F.col("text"))).alias("nv"))
    return histogram_quantiles(
        lens, "nv", [50, 90, 99], group_cols=["source"],
        lo=0.0, hi=512.0, bins=128)


_CMS_PROBES = ["the", "and", "of", "data", "zzz-unseen"]

_CMS_ORACLE = """
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS tokk
      FROM documents
    ), cells AS (
      SELECT i,
             CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || tokk),
                                 1, 15) AS BIGINT) % 1024 AS cell
      FROM tok, (SELECT unnest(range(0, 4)) AS i)
    ), sk AS (
      SELECT i AS row, cell, count(*) AS cnt FROM cells GROUP BY 1, 2
    ), probes AS (
      SELECT unnest(['the', 'and', 'of', 'data', 'zzz-unseen']) AS word
    ), pc AS (
      SELECT word, i AS row,
             CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || word),
                                 1, 15) AS BIGINT) % 1024 AS cell
      FROM probes, (SELECT unnest(range(0, 4)) AS i)
    ), est AS (
      SELECT word, min(coalesce(cnt, 0)) AS est
      FROM pc LEFT JOIN sk USING (row, cell) GROUP BY 1
    ), ex AS (
      SELECT p.word, count(t.tokk) AS exact
      FROM probes p LEFT JOIN tok t ON t.tokk = p.word GROUP BY 1
    )
    SELECT e.word, CAST(e.est AS BIGINT) AS est,
           CAST(x.exact AS BIGINT) AS exact,
           e.est >= x.exact AS never_under
    FROM est e JOIN ex x ON x.word = e.word
"""


_BLOOM_ORACLE = """
    WITH src0 AS (
      SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS word
      FROM documents WHERE source = 'src0'
    ), positions AS (
      SELECT word,
             CAST('0x' || substr(md5('b' || CAST(i AS VARCHAR) || '|'
                                     || word), 1, 15) AS BIGINT)
               % 16384 AS idx
      FROM src0, (SELECT unnest(range(0, 7)) AS i)
    ), bits AS (
      SELECT idx // 32 AS word_idx,
             bit_or(CAST(1 AS BIGINT) << CAST(idx % 32 AS INT)) AS word
      FROM positions GROUP BY 1
    ), vocab AS (
      SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ), pc AS (
      SELECT v.word AS probe, p.idx // 32 AS word_idx,
             CAST(1 AS BIGINT) << CAST(p.idx % 32 AS INT) AS mask
      FROM vocab v, LATERAL (
        SELECT CAST('0x' || substr(md5('b' || CAST(i AS VARCHAR) || '|'
                                       || v.word), 1, 15) AS BIGINT)
                 % 16384 AS idx
        FROM (SELECT unnest(range(0, 7)) AS i)) p
    ), hits AS (
      SELECT probe AS word,
             min(CASE WHEN (coalesce(b.word, 0) & mask) = mask
                      THEN 1 ELSE 0 END) = 1 AS maybe_present
      FROM pc LEFT JOIN bits b USING (word_idx) GROUP BY 1
    )
    SELECT h.word, h.maybe_present,
           s.word IS NOT NULL AS actually_present,
           (h.maybe_present OR s.word IS NULL) AS no_false_negative
    FROM hits h LEFT JOIN src0 s ON s.word = h.word
"""


@register("bloom_membership", oracle=_BLOOM_ORACLE)
def bloom_membership_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter (16384 bits / 7 hashes) built over source-src0's
    token vocabulary, probed with the WHOLE corpus vocabulary: never a
    false negative (pinned per row); false positives priced by the
    maybe/actual columns."""
    from .functions.text import tokens
    from .operators.sketch import bloom_build, bloom_probe

    docs = _t(spark, sf_dir, "documents")

    def vocab_of(df):
        return df.select(
            F.explode(tokens(F.lower(F.col("text")))).alias("word")
        ).distinct()

    src0 = vocab_of(docs.where(F.col("source") == "src0"))
    bloom = bloom_build(src0, "word", m_bits=16384, k_hashes=7)
    probed = bloom_probe(bloom, vocab_of(docs), "word",
                         m_bits=16384, k_hashes=7)
    return (
        probed.join(src0.withColumn("__in", F.lit(True)), "word", "left")
        .select(
            "word", "maybe_present",
            F.coalesce("__in", F.lit(False)).alias("actually_present"),
            (F.col("maybe_present") | ~F.coalesce("__in", F.lit(False)))
            .alias("no_false_negative"),
        )
    )


@register("countmin_heavy_hitters", oracle=_CMS_ORACLE)
def countmin_heavy_hitters_q(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """4x1024 count-min sketch over the token stream, probed for four
    known-hot words and one absent word; est >= exact always (the CMS
    one-sided error), exact equality for the absent word unless all 4
    of its counters collide."""
    from .functions.text import tokens
    from .operators.sketch import countmin_build, countmin_estimate

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("tokk"))
    sk = countmin_build(tok, "tokk", d=4, w=1024)
    probes = spark.createDataFrame(
        [(w,) for w in _CMS_PROBES], "word string")
    est = countmin_estimate(sk, probes, "word", d=4, w=1024)
    # exact side: pre-aggregate the corpus, then RIGHT join with the
    # tiny probe list broadcast — never build a hash table of the
    # corpus side
    cnts = tok.groupBy("tokk").agg(F.count(F.lit(1)).alias("__c"))
    exact = (
        cnts.join(F.broadcast(probes),
                  cnts["tokk"] == probes["word"], "right")
        .select("word",
                F.coalesce("__c", F.lit(0)).cast("long").alias("exact"))
    )
    return est.join(F.broadcast(exact), "word").select(
        "word", "est", "exact",
        (F.col("est") >= F.col("exact")).alias("never_under"))


# ---------------------------------------------------------------------------
# addACTimeseries.R constraint ladder (operators/catalog_admin.py): the
# reference's ~850-line imperative validator as one set-wise pass —
# FK checks against dims, NULL guards, existing-catalog and in-batch
# duplicate detection, first-failing reason per row.
# ---------------------------------------------------------------------------

_TS_INSERT_ORACLE = """
    WITH batch AS (
      SELECT o_orderkey AS row_id,
             o_custkey AS location_id,
             o_orderkey % 300 AS parameter_id,
             o_orderkey % 7 AS media_id,
             CASE o_orderkey % 4 WHEN 0 THEN 'mean' WHEN 1 THEN 'instantaneous'
                  WHEN 2 THEN 'sum' ELSE 'bogus' END AS aggregation_type,
             o_orderkey % 3 AS record_rate,
             CASE WHEN o_orderkey % 11 = 0 THEN NULL
                  ELSE CAST(o_orderdate AS TIMESTAMP) END AS start_datetime
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    locs AS (SELECT DISTINCT c_custkey FROM customer),
    params AS (SELECT DISTINCT p_partkey FROM part WHERE p_partkey <= 250),
    medias(media_id) AS (VALUES (0), (1), (2), (3), (4)),
    aggs(agg) AS (VALUES ('mean'), ('instantaneous'), ('sum'), ('median')),
    existing AS (
      SELECT DISTINCT o_custkey AS location_id,
             o_orderkey % 300 AS parameter_id,
             o_orderkey % 7 AS media_id,
             CASE o_orderkey % 4 WHEN 0 THEN 'mean' WHEN 1 THEN 'instantaneous'
                  WHEN 2 THEN 'sum' ELSE 'bogus' END AS aggregation_type,
             o_orderkey % 3 AS record_rate
      FROM orders WHERE o_orderkey % 20 = 0
    ),
    marked AS (
      SELECT b.*,
             (l.c_custkey IS NULL) AS no_loc,
             (p.p_partkey IS NULL) AS no_param,
             (m.media_id IS NULL) AS no_media,
             (a.agg IS NULL) AS no_agg,
             (e.location_id IS NOT NULL) AS dup_exist,
             row_number() OVER (
               PARTITION BY b.location_id, b.parameter_id, b.media_id,
                            b.aggregation_type, b.record_rate
               ORDER BY b.row_id) AS brn
      FROM batch b
      LEFT JOIN locs l ON l.c_custkey = b.location_id
      LEFT JOIN params p ON p.p_partkey = b.parameter_id
      LEFT JOIN medias m ON m.media_id = b.media_id
      LEFT JOIN aggs a ON a.agg = b.aggregation_type
      LEFT JOIN existing e
        ON e.location_id = b.location_id AND e.parameter_id = b.parameter_id
       AND e.media_id = b.media_id AND e.aggregation_type = b.aggregation_type
       AND e.record_rate = b.record_rate
    )
    SELECT row_id, location_id, parameter_id, media_id, aggregation_type,
           record_rate, start_datetime,
           CASE WHEN start_datetime IS NULL THEN 'start_datetime_null'
                WHEN no_loc THEN 'unknown_location'
                WHEN no_param THEN 'unknown_parameter'
                WHEN no_media THEN 'unknown_media'
                WHEN no_agg THEN 'unknown_aggregation_type'
                WHEN dup_exist THEN 'duplicate_of_existing'
                WHEN brn > 1 THEN 'duplicate_in_batch'
           END AS reject_reason
    FROM marked
"""


@register("timeseries_insert_validation", oracle=_TS_INSERT_ORACLE)
def timeseries_insert_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.catalog_admin import validate_new_timeseries

    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    agg = (
        F.when(k % 4 == 0, "mean").when(k % 4 == 1, "instantaneous")
        .when(k % 4 == 2, "sum").otherwise("bogus")
    )
    batch = orders.where(k % 2 == 0).select(
        k.alias("row_id"),
        F.col("o_custkey").alias("location_id"),
        (k % 300).alias("parameter_id"),
        (k % 7).alias("media_id"),
        agg.alias("aggregation_type"),
        (k % 3).alias("record_rate"),
        F.when(k % 11 != 0, F.col("o_orderdate").cast("timestamp"))
        .alias("start_datetime"),
    )
    existing = orders.where(k % 20 == 0).select(
        F.col("o_custkey").alias("location_id"),
        (k % 300).alias("parameter_id"),
        (k % 7).alias("media_id"),
        agg.alias("aggregation_type"),
        (k % 3).alias("record_rate"),
    ).distinct()
    locations = _t(spark, sf_dir, "customer").select("c_custkey")
    parameters = (
        _t(spark, sf_dir, "part").where(F.col("p_partkey") <= 250)
        .select("p_partkey")
    )
    media = _ldf(spark, [(i,) for i in range(5)], "media_id bigint")
    aggs = _ldf(spark, 
        [("mean",), ("instantaneous",), ("sum",), ("median",)], "agg string")
    out = validate_new_timeseries(batch, locations, parameters, media, aggs,
                                  existing)
    return out.select(
        "row_id", "location_id", "parameter_id", "media_id",
        "aggregation_type", "record_rate", "start_datetime", "reject_reason",
    )


# ---------------------------------------------------------------------------
# Training-data tier: SimHash near-dup pairs — pigeonhole banding over
# contiguous bit-chunks (a pair within Hamming distance < bands agrees
# exactly on >= 1 chunk), exact bit_count(xor) verify. Completes the
# SimHash family (signatures -> candidate pairs).
# ---------------------------------------------------------------------------

_SIMHASH_PAIRS_ORACLE = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), hashed AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
      FROM tok
    ), bits AS (
      SELECT doc_id, j,
             sum(CASE WHEN (h // CAST(pow(2, j) AS BIGINT)) % 2 = 1
                      THEN 1 ELSE -1 END) AS s
      FROM hashed, (SELECT unnest(generate_series(0, 31)) AS j)
      GROUP BY doc_id, j
    ), sig AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    ), banded AS (
      SELECT doc_id, simhash, b.band,
             (simhash // CAST(pow(2, b.band * 8) AS BIGINT)) % 256 AS chunk
      FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) b
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM banded a JOIN banded b ON a.band = b.band AND a.chunk = b.chunk
    WHERE a.doc_id < b.doc_id
      AND bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@register("simhash_near_pairs", oracle=_SIMHASH_PAIRS_ORACLE)
def simhash_near_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import simhash, simhash_near_pairs

    docs = _t(spark, sf_dir, "documents")
    sig = simhash(docs, bits=32)
    return simhash_near_pairs(sig, bits=32, bands=4, max_hamming=3)


# Capped-mode variant: the hot-bucket star cap ACTIVE at test SF
# (max_bucket=2 — with 8-bit chunks most (band, chunk) buckets exceed
# 2 members, so the oracle genuinely replays the star semantics:
# min-id anchor, m-1 anchor-verified edges, Hamming filter after).
_SIMHASH_CAPPED_ORACLE = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), hashed AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
      FROM tok
    ), bits AS (
      SELECT doc_id, j,
             sum(CASE WHEN (h // CAST(pow(2, j) AS BIGINT)) % 2 = 1
                      THEN 1 ELSE -1 END) AS s
      FROM hashed, (SELECT unnest(generate_series(0, 31)) AS j)
      GROUP BY doc_id, j
    ), sig AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    ), banded AS (
      SELECT doc_id, simhash, b.band,
             (simhash // CAST(pow(2, b.band * 8) AS BIGINT)) % 256 AS chunk
      FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) b
    ), stats AS (
      SELECT band, chunk, count(*) AS n, min(doc_id) AS anchor,
             arg_min(simhash, doc_id) AS asig
      FROM banded GROUP BY 1, 2
    )
    SELECT DISTINCT id_a, id_b, hamming FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             bit_count(xor(a.simhash, b.simhash)) AS hamming
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.chunk = b.chunk
      JOIN stats s ON s.band = a.band AND s.chunk = a.chunk
      WHERE s.n <= 2 AND a.doc_id < b.doc_id
      UNION ALL
      SELECT s.anchor AS id_a, a.doc_id AS id_b,
             bit_count(xor(s.asig, a.simhash)) AS hamming
      FROM banded a
      JOIN stats s ON s.band = a.band AND s.chunk = a.chunk
      WHERE s.n > 2 AND a.doc_id <> s.anchor
    )
    WHERE hamming <= 3
"""


@register("simhash_capped_pairs", oracle=_SIMHASH_CAPPED_ORACLE)
def simhash_capped_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import simhash, simhash_near_pairs

    docs = _t(spark, sf_dir, "documents")
    sig = simhash(docs, bits=32)
    return simhash_near_pairs(sig, bits=32, bands=4, max_hamming=3,
                              max_bucket=2)


# ---------------------------------------------------------------------------
# Training-data tier: benchmark decontamination — n-gram overlap of the
# training corpus against a held-out eval set (the GPT-3/PaLM
# "13-gram dedup" sweep shape, k=5 here because the synthetic docs are
# 10-100 tokens). Eval shingles broadcast; the corpus side is map-only
# + partial-aggregable count — no shuffle of corpus text at 100 TB.
# ---------------------------------------------------------------------------

_DECONTAM_ORACLE = """
    WITH docs AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ), g AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(0, len(toks) - 4),
               i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3],
                              toks[i+4], toks[i+5])))) AS sh
      FROM docs
    ), ev AS (
      SELECT DISTINCT sh FROM g WHERE doc_id % 19 = 3
    ), hits AS (
      SELECT g.doc_id, count(*) AS overlap_ngrams
      FROM g JOIN ev USING (sh)
      WHERE g.doc_id % 19 != 3
      GROUP BY 1
    )
    SELECT d.doc_id,
           COALESCE(h.overlap_ngrams, 0) AS overlap_ngrams,
           COALESCE(h.overlap_ngrams, 0) >= 8 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 19 != 3) d
    LEFT JOIN hits h USING (doc_id)
"""


@register("eval_decontamination", oracle=_DECONTAM_ORACLE)
def eval_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import contamination_overlap

    docs = _t(spark, sf_dir, "documents")
    evalset = docs.where(F.col("doc_id") % 19 == 3)
    train = docs.where(F.col("doc_id") % 19 != 3)
    return contamination_overlap(train, evalset, ngram_k=5, threshold=8)


# ---------------------------------------------------------------------------
# Training-data tier: Gopher/C4-style repetition metrics — all
# WITHIN-ROW array kernels (sort + fold for top-element multiplicity),
# so the per-document statistics are map-only and linear over a 100 TB
# corpus; the oracle reaches the same numbers via unnest + groupBy.
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ), b AS (
      SELECT doc_id, toks,
             list_transform(range(0, len(toks) - 1),
               i -> concat_ws(' ', toks[i+1], toks[i+2])) AS bigrams,
             list_transform(range(0, len(toks) - 2),
               i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3])) AS trigrams
      FROM d
    ), tt AS (
      SELECT doc_id, max(c) AS top_tok FROM (
        SELECT doc_id, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS x FROM d) GROUP BY doc_id, x
      ) GROUP BY doc_id
    ), tb AS (
      SELECT doc_id, max(c) AS top_big FROM (
        SELECT doc_id, count(*) AS c
        FROM (SELECT doc_id, unnest(bigrams) AS x FROM b) GROUP BY doc_id, x
      ) GROUP BY doc_id
    ), m AS (
      SELECT b.doc_id,
             len(toks) AS n_tokens,
             CAST(len(list_distinct(toks)) AS DOUBLE)
               / greatest(len(toks), 1) AS unique_token_ratio,
             CAST(tt.top_tok AS DOUBLE) / greatest(len(toks), 1) AS top_token_frac,
             CAST(tb.top_big AS DOUBLE) / greatest(len(bigrams), 1) AS top_bigram_frac,
             1.0 - CAST(len(list_distinct(trigrams)) AS DOUBLE)
               / greatest(len(trigrams), 1) AS dup_trigram_frac
      FROM b JOIN tt USING (doc_id) JOIN tb USING (doc_id)
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           {R('unique_token_ratio', 6)} AS unique_token_ratio,
           {R('top_token_frac', 6)} AS top_token_frac,
           {R('top_bigram_frac', 6)} AS top_bigram_frac,
           {R('dup_trigram_frac', 6)} AS dup_trigram_frac,
           (unique_token_ratio >= 0.2 AND top_bigram_frac <= 0.2
            AND dup_trigram_frac <= 0.6) AS gopher_keep
    FROM m
"""


@register("repetition_metrics", oracle=_REPETITION_ORACLE)
def repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions import text as X

    docs = _t(spark, sf_dir, "documents")

    # all five metrics inside ONE nested bind (token array, bigrams,
    # trigrams each evaluated once per row), surfaced through inline()
    # — a generator node projection collapse cannot inline, so the
    # shared subtrees are not re-evaluated per output column (measured
    # 2.1s -> see commit; the per-column form recomputed the ngram
    # arrays up to 2x each)
    def metrics(toks: F.Column) -> F.Column:
        n = F.greatest(F.size(toks), F.lit(1))

        def grams(k: int) -> F.Column:
            idx = F.sequence(F.lit(0), F.size(toks) - k)
            return F.when(
                F.size(toks) >= k,
                F.transform(
                    idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
                ),
            ).otherwise(F.array().cast("array<string>"))

        def with_big(bg: F.Column) -> F.Column:
            def with_tri(tr: F.Column) -> F.Column:
                return F.struct(
                    F.size(toks).cast("long").alias("n_tokens"),
                    (F.size(F.array_distinct(toks)) / n)
                    .alias("unique_token_ratio"),
                    (X.top_count(toks) / n).alias("top_token_frac"),
                    (X.top_count(bg) / F.greatest(F.size(bg), F.lit(1)))
                    .alias("top_bigram_frac"),
                    (1.0 - F.size(F.array_distinct(tr))
                     / F.greatest(F.size(tr), F.lit(1)))
                    .alias("dup_trigram_frac"),
                )

            return X.bind(grams(3), with_tri)

        return X.bind(grams(2), with_big)

    m = X.bind(X.tokens(F.lower(F.col("text"))), metrics)
    out = docs.select("doc_id", F.inline(F.array(m))).withColumn(
        "gopher_keep",
        (F.col("unique_token_ratio") >= 0.2)
        & (F.col("top_bigram_frac") <= 0.2)
        & (F.col("dup_trigram_frac") <= 0.6),
    )
    return _round(out, {"unique_token_ratio": 6, "top_token_frac": 6,
                        "top_bigram_frac": 6, "dup_trigram_frac": 6})


# ---------------------------------------------------------------------------
# Training-data tier: PII redaction — deterministic synthetic PII is
# injected from doc_id on BOTH engines (the raw synthetic corpus has
# none), then typed-placeholder redaction + audit counts. Map-only
# regexp work, codegen'd; the patterns are restricted to the
# java.util.regex ∩ RE2 common subset.
# ---------------------------------------------------------------------------

_PII_ORACLE = r"""
    WITH aug AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0
                     THEN ' contact user' || doc_id || '@example.com'
                     ELSE '' END
             || CASE WHEN doc_id % 4 = 1
                     THEN ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END
             || CASE WHEN doc_id % 5 = 2
                     THEN ' host 192.168.' || (doc_id % 256) || '.' || (doc_id % 100)
                     ELSE '' END AS text
      FROM documents
    ), red AS (
      SELECT doc_id,
             len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
             len(regexp_extract_all(text,
               '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS n_ips,
             regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
               '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g')
               AS redacted
      FROM aug
    )
    SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
           CAST(n_phones AS BIGINT) AS n_phones,
           CAST(n_ips AS BIGINT) AS n_ips,
           CAST(length(redacted) AS BIGINT) AS redacted_len,
           md5(redacted) AS redacted_hash
    FROM red
"""


@register("pii_redaction", oracle=_PII_ORACLE)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions import text as X

    docs = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(k % 3 == 0,
               F.concat(F.lit(" contact user"), k.cast("string"),
                        F.lit("@example.com"))).otherwise(""),
        F.when(k % 4 == 1,
               F.concat(F.lit(" call 555-867-"),
                        F.lpad((k % 10000).cast("string"), 4, "0"))
               ).otherwise(""),
        F.when(k % 5 == 2,
               F.concat(F.lit(" host 192.168."), (k % 256).cast("string"),
                        F.lit("."), (k % 100).cast("string"))).otherwise(""),
    )
    a = docs.select("doc_id", aug.alias("__aug"))
    n_emails, n_phones, n_ips = X.pii_counts(F.col("__aug"))
    return a.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        n_ips.cast("long").alias("n_ips"),
        F.length(X.redact_pii(F.col("__aug"))).cast("long").alias("redacted_len"),
        F.md5(X.redact_pii(F.col("__aug"))).alias("redacted_hash"),
    )


# ---------------------------------------------------------------------------
# addNewContinuous (R/addNewContinuous.R:16): direct-append with
# overwrite modes, set-wise over many series. The query runs the most
# complex mode ('all': wipe-and-replace the incoming temporal range) —
# NA drop, UNS/catalog defaults, instantaneous-period assignment,
# basic-only rejection, existence probe, and range deletes in one
# classified-actions frame. Modes 'no'/'conflict' in tests/test_add_new.py.
# ---------------------------------------------------------------------------

_ADD_NEW_ORACLE = f"""
    WITH ev AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
      FROM events
    ), cat AS (
      SELECT event_type AS tsid,
             CASE WHEN event_type = 'error' THEN 'compound'
                  ELSE 'basic' END AS tstype,
             CASE WHEN length(event_type) % 2 = 0 THEN 'instantaneous'
                  ELSE 'mean' END AS agg,
             'org_' || event_type AS def_owner,
             CAST(length(event_type) AS BIGINT) AS def_dsa
      FROM (SELECT DISTINCT event_type FROM ev)
    ), existing AS (
      SELECT event_type AS tsid, ts AS datetime FROM ev WHERE event_id % 2 = 0
    ), incoming0 AS (
      SELECT event_type AS tsid, ts AS datetime,
             CASE WHEN event_id % 30 != 0 THEN value * 2 END AS value,
             CASE WHEN event_id % 5 != 0 THEN 'contrib' END AS owner
      FROM ev WHERE event_id % 3 = 0
    ), norm AS (
      SELECT i.tsid, i.datetime, i.value,
             COALESCE(i.owner, c.def_owner) AS owner,
             'UNS' AS grade, 'UNS' AS approval, 'UNS' AS qualifier,
             c.def_dsa AS data_sharing_agreement_id,
             CAST(0 AS INT) AS imputed, CAST(0 AS INT) AS no_update,
             CASE WHEN c.agg = 'instantaneous' THEN 0.0 END AS period_seconds,
             (c.tstype IS NULL OR c.tstype != 'basic') AS rej
      FROM incoming0 i LEFT JOIN cat c ON c.tsid = i.tsid
      WHERE i.value IS NOT NULL
    ), probed AS (
      SELECT n.*, (e.tsid IS NOT NULL) AS ex
      FROM norm n LEFT JOIN existing e
        ON e.tsid = n.tsid AND e.datetime = n.datetime
    ), upserts AS (
      SELECT tsid AS timeseries_id, datetime, {R('value', 6)} AS value,
             owner, grade, approval, qualifier,
             data_sharing_agreement_id, imputed, no_update, period_seconds,
             CASE WHEN rej THEN 'reject'
                  WHEN ex THEN 'update' ELSE 'insert' END AS action
      FROM probed
    ), bounds AS (
      SELECT tsid, min(datetime) AS lo, max(datetime) AS hi
      FROM norm WHERE NOT rej GROUP BY 1
    ), dels AS (
      SELECT e.tsid AS timeseries_id, e.datetime,
             CAST(NULL AS DOUBLE) AS value, CAST(NULL AS VARCHAR) AS owner,
             CAST(NULL AS VARCHAR) AS grade, CAST(NULL AS VARCHAR) AS approval,
             CAST(NULL AS VARCHAR) AS qualifier,
             CAST(NULL AS BIGINT) AS data_sharing_agreement_id,
             CAST(NULL AS INT) AS imputed, CAST(NULL AS INT) AS no_update,
             CAST(NULL AS DOUBLE) AS period_seconds,
             'delete' AS action
      FROM existing e JOIN bounds b ON b.tsid = e.tsid
      WHERE e.datetime BETWEEN b.lo AND b.hi
        AND NOT EXISTS (SELECT 1 FROM norm n
                        WHERE NOT n.rej AND n.tsid = e.tsid
                          AND n.datetime = e.datetime)
    )
    SELECT * FROM upserts UNION ALL SELECT * FROM dels
"""


# Unit-change guard (inst/patches/patch_52.R): a units_{phase} update
# is blocked iff the old unit is set, IS DISTINCT FROM the new one,
# and the parameter has discrete results OR measured continuous
# timeseries in that matrix state.
_UNIT_GUARD_ORACLE = """
    WITH params AS (
      SELECT p_partkey AS parameter_id,
             CASE p_partkey % 4 WHEN 1 THEN NULL
                  WHEN 0 THEN 'mg/L' ELSE 'ug/L' END AS units_liquid,
             CASE WHEN p_partkey % 3 = 0 THEN 'mg/kg' END AS units_solid,
             CASE WHEN p_partkey % 5 = 0 THEN 'ppm' END AS units_gas
      FROM part
    ), updates AS (
      SELECT parameter_id,
             CASE parameter_id % 3 WHEN 0 THEN 'g/L' WHEN 1 THEN NULL
                  ELSE units_liquid END AS units_liquid,
             CASE WHEN parameter_id % 2 = 0 THEN 'g/kg'
                  ELSE units_solid END AS units_solid,
             units_gas
      FROM params
    ), ms AS (
      SELECT * FROM (VALUES (1, 'liquid'), (2, 'solid'), (3, 'gas'))
        AS t(matrix_state_id, matrix_state_code)
    ), results AS (
      SELECT l_partkey AS parameter_id,
             1 + l_orderkey % 3 AS matrix_state_id
      FROM lineitem
    ), ts AS (
      SELECT p_partkey * 10 AS timeseries_id,
             p_partkey AS parameter_id,
             1 + p_partkey % 3 AS matrix_state_id
      FROM part WHERE p_partkey % 7 = 0
    ), meas AS (
      SELECT p_partkey * 10 AS timeseries_id FROM part
      WHERE p_partkey % 14 = 0
    ), usage AS (
      SELECT DISTINCT r.parameter_id, m.matrix_state_code AS phase
      FROM results r JOIN ms m USING (matrix_state_id)
      UNION
      SELECT DISTINCT t.parameter_id, m.matrix_state_code AS phase
      FROM ts t JOIN ms m USING (matrix_state_id)
      WHERE EXISTS (SELECT 1 FROM meas
                    WHERE meas.timeseries_id = t.timeseries_id)
    ), melted AS (
      SELECT p.parameter_id, 'liquid' AS phase,
             p.units_liquid AS old_unit, u.units_liquid AS new_unit
      FROM params p JOIN updates u USING (parameter_id)
      UNION ALL
      SELECT p.parameter_id, 'solid', p.units_solid, u.units_solid
      FROM params p JOIN updates u USING (parameter_id)
      UNION ALL
      SELECT p.parameter_id, 'gas', p.units_gas, u.units_gas
      FROM params p JOIN updates u USING (parameter_id)
    )
    SELECT m.parameter_id, m.phase, m.old_unit, m.new_unit,
           CASE
             WHEN m.old_unit IS NOT DISTINCT FROM m.new_unit THEN 'noop'
             WHEN m.old_unit IS NOT NULL AND us.phase IS NOT NULL
             THEN 'blocked'
             ELSE 'update' END AS action
    FROM melted m
    LEFT JOIN usage us
      ON us.parameter_id = m.parameter_id AND us.phase = m.phase
"""


@register("parameter_unit_guard", oracle=_UNIT_GUARD_ORACLE)
def parameter_unit_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.catalog_admin import classify_unit_updates

    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    pk = F.col("p_partkey")
    params = part.select(
        pk.alias("parameter_id"),
        F.when(pk % 4 == 0, "mg/L").when(pk % 4 == 1, None)
        .otherwise("ug/L").alias("units_liquid"),
        F.when(pk % 3 == 0, "mg/kg").alias("units_solid"),
        F.when(pk % 5 == 0, "ppm").alias("units_gas"),
    )
    pid = F.col("parameter_id")
    updates = params.select(
        "parameter_id",
        F.when(pid % 3 == 0, "g/L").when(pid % 3 == 1, None)
        .otherwise(F.col("units_liquid")).alias("units_liquid"),
        F.when(pid % 2 == 0, "g/kg").otherwise(F.col("units_solid"))
        .alias("units_solid"),
        "units_gas",
    )
    ms = _ldf(spark, [(1, "liquid"), (2, "solid"), (3, "gas")],
              ["matrix_state_id", "matrix_state_code"])
    results = li.select(
        F.col("l_partkey").alias("parameter_id"),
        (1 + F.col("l_orderkey") % 3).alias("matrix_state_id"),
    )
    ts = part.where(pk % 7 == 0).select(
        (pk * 10).alias("timeseries_id"), pk.alias("parameter_id"),
        (1 + pk % 3).alias("matrix_state_id"),
    )
    meas = part.where(pk % 14 == 0).select(
        (pk * 10).alias("timeseries_id"))
    return classify_unit_updates(params, updates, ms, results, ts, meas)


# addNewDiscrete parity (R/addNewDiscrete.R:30-120): dim-validated
# sample inserts with sequential sample_id assignment and the result
# NA/detection-limit-condition ladder, classified batch-set-wise.
_ADD_DISCRETE_ORACLE = f"""
    WITH orgs AS (
      SELECT n_name AS name, n_nationkey AS organization_id FROM nation
    ), approvals AS (SELECT unnest(['A', 'UNS', 'C']) AS code
    ), grades AS (SELECT unnest(['A', 'B', 'UNS']) AS code
    ), qualifiers AS (SELECT unnest(['ICE', 'EST', 'UNS']) AS code
    ), samples AS (
      SELECT c_custkey AS batch_id,
             c_custkey % 50 AS location_id,
             TIMESTAMP '2024-01-01 00:00:00'
               + to_hours(c_custkey % 1000) AS datetime,
             CASE WHEN c_custkey % 11 = 0 THEN 'NO SUCH ORG'
                  ELSE (SELECT n_name FROM nation
                        WHERE n_nationkey = c_nationkey) END AS owner,
             CASE WHEN c_custkey % 7 = 0 THEN 'WHO DIS'
                  WHEN c_custkey % 7 = 1 THEN NULL
                  ELSE (SELECT n_name FROM nation
                        WHERE n_nationkey = c_nationkey)
             END AS contributor,
             CASE c_custkey % 5 WHEN 0 THEN 'A' WHEN 1 THEN 'BOGUS'
                  ELSE NULL END AS approval,
             CASE c_custkey % 4 WHEN 0 THEN 'B' WHEN 1 THEN 'Z9'
                  ELSE NULL END AS grade,
             CASE c_custkey % 6 WHEN 0 THEN 'ICE' WHEN 1 THEN 'XX'
                  ELSE NULL END AS qualifier
      FROM customer
    ), judged AS (
      SELECT s.*,
             o.organization_id AS owner_id,
             co.organization_id AS contrib_id,
             a.code AS a_ok, g.code AS g_ok, q.code AS q_ok,
             CASE
               WHEN o.organization_id IS NULL
               THEN 'reject_unknown_owner'
               WHEN s.contributor IS NOT NULL
                    AND co.organization_id IS NULL
               THEN 'reject_unknown_contributor'
               WHEN s.approval IS NOT NULL AND a.code IS NULL
               THEN 'reject_unknown_approval'
               WHEN s.grade IS NOT NULL AND g.code IS NULL
               THEN 'reject_unknown_grade'
               WHEN s.qualifier IS NOT NULL AND q.code IS NULL
               THEN 'reject_unknown_qualifier'
             END AS reason
      FROM samples s
      LEFT JOIN orgs o ON s.owner = o.name
      LEFT JOIN orgs co ON s.contributor = co.name
      LEFT JOIN approvals a ON s.approval = a.code
      LEFT JOIN grades g ON s.grade = g.code
      LEFT JOIN qualifiers q ON s.qualifier = q.code
    ), numbered AS (
      SELECT batch_id, location_id,
             CAST(100 + row_number() OVER (
               ORDER BY location_id, datetime, batch_id) AS BIGINT)
               AS sid
      FROM judged WHERE reason IS NULL
    ), sample_actions AS (
      SELECT 'sample' AS entity, j.batch_id,
             CAST(j.location_id AS BIGINT) AS entity_id,
             COALESCE(j.reason, 'insert') AS action,
             n.sid AS sample_id
      FROM judged j LEFT JOIN numbered n USING (batch_id)
    ), results AS (
      SELECT o_custkey AS batch_id, o_orderkey AS result_id,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE (o_orderkey % 1000) * 0.1 END AS result,
             CASE o_orderkey % 5 WHEN 0 THEN 1 WHEN 1 THEN 2
                  WHEN 2 THEN 3 ELSE NULL END AS result_condition,
             CASE WHEN o_orderkey % 3 <> 0
                  THEN (o_orderkey % 90) * 0.01 END
               AS result_condition_value
      FROM orders
    ), result_actions AS (
      SELECT 'result' AS entity, r.batch_id,
             CAST(r.result_id AS BIGINT) AS entity_id,
             CASE
               WHEN j.reason IS NOT NULL THEN j.reason
               WHEN r.result IS NULL AND r.result_condition IS NULL
               THEN 'drop_na_result'
               WHEN r.result_condition IN (1, 2)
                    AND r.result_condition_value IS NULL
               THEN 'reject_condition_value_missing'
               ELSE 'insert' END AS action,
             n.sid AS sample_id
      FROM results r
      JOIN judged j USING (batch_id)
      LEFT JOIN numbered n USING (batch_id)
    )
    SELECT * FROM sample_actions UNION ALL SELECT * FROM result_actions
"""


@register("add_new_discrete_actions", oracle=_ADD_DISCRETE_ORACLE)
def add_new_discrete_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.add_new import add_new_discrete

    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    k = F.col("c_custkey")
    nat_name = nat.select(F.col("n_nationkey").alias("c_nationkey"),
                          F.col("n_name").alias("__nn"))
    samples = cust.join(nat_name, "c_nationkey").select(
        k.alias("batch_id"),
        (k % 50).alias("location_id"),
        F.timestamp_add("HOUR", (k % 1000).cast("int"),
                        F.lit("2024-01-01 00:00:00").cast("timestamp"))
        .alias("datetime"),
        F.when(k % 11 == 0, "NO SUCH ORG").otherwise(F.col("__nn"))
        .alias("owner"),
        F.when(k % 7 == 0, "WHO DIS")
        .when(k % 7 == 1, F.lit(None).cast("string"))
        .otherwise(F.col("__nn")).alias("contributor"),
        F.when(k % 5 == 0, "A").when(k % 5 == 1, "BOGUS")
        .alias("approval"),
        F.when(k % 4 == 0, "B").when(k % 4 == 1, "Z9").alias("grade"),
        F.when(k % 6 == 0, "ICE").when(k % 6 == 1, "XX")
        .alias("qualifier"),
    )
    ok_ = F.col("o_orderkey")
    results = orders.select(
        F.col("o_custkey").alias("batch_id"),
        ok_.alias("result_id"),
        F.when(ok_ % 7 != 0, (ok_ % 1000) * 0.1).alias("result"),
        F.when(ok_ % 5 == 0, 1).when(ok_ % 5 == 1, 2)
        .when(ok_ % 5 == 2, 3).alias("result_condition"),
        F.when(ok_ % 3 != 0, (ok_ % 90) * 0.01)
        .alias("result_condition_value"),
    )
    orgs = nat.select(F.col("n_name").alias("name"),
                      F.col("n_nationkey").alias("organization_id"))
    approvals = _ldf(spark, [("A",), ("UNS",), ("C",)], ["code"])
    grades = _ldf(spark, [("A",), ("B",), ("UNS",)], ["code"])
    qualifiers = _ldf(spark, [("ICE",), ("EST",), ("UNS",)], ["code"])
    return add_new_discrete(samples, results, orgs, approvals, grades,
                            qualifiers, max_sample_id=100)


@register("add_new_continuous_actions", oracle=_ADD_NEW_ORACLE)
def add_new_continuous_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.add_new import add_new_continuous

    ev = _t(spark, sf_dir, "events")
    k = F.col("event_id")
    existing = ev.where(k % 2 == 0).select(
        F.col("event_type").alias("timeseries_id"),
        F.col("ts").alias("datetime"),
    )
    incoming = ev.where(k % 3 == 0).select(
        F.col("event_type").alias("timeseries_id"),
        F.col("ts").alias("datetime"),
        F.when(k % 30 != 0, F.col("value") * 2).alias("value"),
        F.when(k % 5 != 0, F.lit("contrib")).alias("owner"),
    )
    catalog = ev.select("event_type").distinct().select(
        F.col("event_type").alias("timeseries_id"),
        F.when(F.col("event_type") == "error", "compound")
        .otherwise("basic").alias("timeseries_type"),
        F.when(F.length("event_type") % 2 == 0, "instantaneous")
        .otherwise("mean").alias("aggregation_type"),
        F.concat(F.lit("org_"), F.col("event_type")).alias("default_owner"),
        F.length("event_type").cast("long")
        .alias("default_data_sharing_agreement_id"),
    )
    out = add_new_continuous(incoming, existing, catalog, overwrite="all")
    # nullable booleans cross the pandas bridge differently per engine
    # (None vs NaN); ints compare NULL-safe numerically
    out = out.withColumn("imputed", F.col("imputed").cast("int")) \
             .withColumn("no_update", F.col("no_update").cast("int"))
    return _round(out, {"value": 6})


# ---------------------------------------------------------------------------
# Gridded-model raster connector normalization (downloadHRDPA.R:80-181):
# a synthetic directory listing is built from orders on BOTH engines
# (finals + preliminary variants with overlapping datetimes), then the
# connector's parse -> start filter -> prelim-supersession dedup ->
# accumulation-window derivation runs. HRDPS run selection/expansion in
# tests/test_gridded.py.
# ---------------------------------------------------------------------------

_HRDPA_ORACLE = """
    WITH base AS (
      SELECT o_orderkey AS k,
             CAST(o_orderdate AS TIMESTAMP)
               + to_hours(CAST((o_orderkey % 4) * 6 AS INT)) AS dt
      FROM orders WHERE o_orderkey % 7 = 0
    ), listing AS (
      SELECT strftime(dt, '%Y%m%dT%H')
               || 'Z_MSC_HRDPA_APCP-Accum6h_Sfc.grib2' AS file
      FROM base WHERE k % 3 = 0
      UNION ALL
      SELECT strftime(dt, '%Y%m%dT%H')
               || 'Z_MSC_HRDPA_APCP-Accum6h_Sfc_Prelim.grib2'
      FROM base WHERE k % 5 = 0
    ), parsed AS (
      SELECT file, 'https://dd/' || file AS path,
             strptime(substr(file, 1, 11), '%Y%m%dT%H') AS datetime,
             contains(file, 'Prelim') AS prelim
      FROM listing
    ), filtered AS (
      SELECT * FROM parsed WHERE datetime >= TIMESTAMP '1994-01-01'
    ), counted AS (
      SELECT *, count(*) OVER (PARTITION BY datetime) AS n FROM filtered
    )
    SELECT file, path, datetime, prelim,
           datetime - INTERVAL 6 HOUR AS valid_from,
           datetime AS valid_to,
           CASE WHEN prelim THEN 'PRELIMINARY' END AS flag,
           'HRDPA' AS model, FALSE AS forecast
    FROM counted
    WHERE NOT (prelim AND n > 1)
"""


@register("hrdpa_listing_normalize", oracle=_HRDPA_ORACLE)
def hrdpa_listing_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.gridded import hrdpa_normalize

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    base = o.where(k % 7 == 0).select(
        k.alias("k"),
        (F.col("o_orderdate").cast("timestamp")
         + ((k % 4) * 6).cast("int") * F.expr("INTERVAL 1 HOUR")).alias("dt"),
    )
    stamp = F.date_format("dt", "yyyyMMdd'T'HH")
    finals = base.where(F.col("k") % 3 == 0).select(
        F.concat(stamp, F.lit("Z_MSC_HRDPA_APCP-Accum6h_Sfc.grib2"))
        .alias("file")
    )
    prelims = base.where(F.col("k") % 5 == 0).select(
        F.concat(stamp, F.lit("Z_MSC_HRDPA_APCP-Accum6h_Sfc_Prelim.grib2"))
        .alias("file")
    )
    listing = finals.unionByName(prelims).select(
        "file", F.concat(F.lit("https://dd/"), F.col("file")).alias("path")
    )
    import datetime as _dt

    return hrdpa_normalize(
        listing, "APCP-Accum6h_Sfc", _dt.datetime(1994, 1, 1)
    )


# ---------------------------------------------------------------------------
# HRDPA raster ingest END-TO-END (downloadHRDPA.R:80-181): directory
# listing -> prelim/analysis dedup -> real GRIB2 decode (pure-stdlib
# codec, functions/grib2.py) -> per-cell daily accumulation -> tiled
# store -> zonal stats. The oracle reads the fixture generator's
# decoded-cell CSV twin, so the binary decode itself is differentially
# checked, not just the relational plumbing.
# ---------------------------------------------------------------------------

_HRDPA_GRIB_DIR = _FIXDIR / "hrdpa_grib"
_HRDPA_CELLS = _FIXDIR / "hrdpa_cells.csv"
_HRDPA_COMPLEX_DIR = _FIXDIR / "hrdpa_complex_grib"
_HRDPA_COMPLEX_CELLS = _FIXDIR / "hrdpa_complex_cells.csv"


def _hrdpa_oracle(cells_csv) -> str:
    return f"""
    WITH raw AS (
      SELECT file, CAST(datetime AS TIMESTAMP) AS datetime, x, y,
             CAST(value AS DOUBLE) AS value
      FROM read_csv('{cells_csv}', header=true)
    ), kept AS (
      SELECT DISTINCT file FROM raw
      WHERE NOT (file LIKE '%Prelim%' AND EXISTS (
        SELECT 1 FROM raw r2 WHERE r2.datetime = raw.datetime
          AND r2.file NOT LIKE '%Prelim%'))
    ), cells AS (
      SELECT r.x, r.y, r.value
      FROM raw r JOIN kept k USING (file)
      WHERE r.value IS NOT NULL
    ), daily AS (
      SELECT x, y, {DSUM('value')} AS dsum
      FROM cells GROUP BY x, y
    ), zones AS (
      SELECT * FROM (VALUES (1,0,0,5,4),(2,6,0,11,4),
                            (3,0,5,5,9),(4,6,5,11,9))
        AS z(zone_id, zxmin, zymin, zxmax, zymax)
    )
    SELECT z.zone_id,
           {R(DSUM('dsum') + ' / COUNT(dsum)', 6)} AS zmean,
           {R('MIN(dsum)', 6)} AS zmin,
           {R('MAX(dsum)', 6)} AS zmax,
           COUNT(dsum) AS zcount
    FROM daily d JOIN zones z
      ON d.x BETWEEN z.zxmin AND z.zxmax
     AND d.y BETWEEN z.zymin AND z.zymax
    GROUP BY z.zone_id
"""


_HRDPA_GRIB_ORACLE = _hrdpa_oracle(_HRDPA_CELLS)


def _hrdpa_pipeline(spark: SparkSession, grib_dir) -> DataFrame:
    """Listing -> dedup -> GRIB2 decode -> daily accumulation -> tiles
    -> zonal stats, one pipeline (shared by the simple- and
    complex-packed fixture sets)."""
    import datetime as _dt
    import os as _os

    from .operators.raster import tile_cells, zonal_stats
    from .sources.gridded import grib_cells, hrdpa_normalize

    names = sorted(_os.listdir(grib_dir))
    listing = _ldf(spark, [(n, n) for n in names], ["file", "path"])
    kept = hrdpa_normalize(listing, "APCP-Accum6h",
                           _dt.datetime(2024, 1, 1))
    cells = grib_cells(spark, str(grib_dir) + "/*.grib2")
    cells = cells.join(F.broadcast(kept.select("file")), "file",
                       "left_semi")
    daily = cells.groupBy("x", "y").agg(
        _exact_sum_col("value").alias("value"))
    tiles = tile_cells(daily, tile=8)
    zones = _ldf(
        spark,
        [(1, 0, 0, 5, 4), (2, 6, 0, 11, 4), (3, 0, 5, 5, 9),
         (4, 6, 5, 11, 9)],
        ["zone_id", "zxmin", "zymin", "zxmax", "zymax"],
    )
    zs = zonal_stats(tiles, zones)
    return _round(
        zs.select("zone_id", "zmean", "zmin", "zmax", "zcount"),
        {"zmean": 6, "zmin": 6, "zmax": 6},
    )


@register("hrdpa_grib_ingest", oracle=_HRDPA_GRIB_ORACLE)
def hrdpa_grib_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Listing -> dedup -> GRIB2 decode -> daily accumulation -> tiles
    -> zonal stats, one pipeline."""
    return _hrdpa_pipeline(spark, _HRDPA_GRIB_DIR)


_HRDPA_ROT_DIR = _FIXDIR / "hrdpa_rot_grib"
_HRDPA_ROT_CELLS = _FIXDIR / "hrdpa_rot_cells.csv"

# Rotated-grid ingest (grid template 3.1 + complex packing — the real
# shape of an ECCC 'RLatLon' file): per-cell TRUE geographic
# coordinates come out of the unrotation (functions/grib2.py
# _unrotate), and the oracle's lat/lon come from the fixture
# generator's INDEPENDENT matrix implementation — aggregating per
# true-latitude band makes the rotation math itself hash-checked.
_HRDPA_ROT_ORACLE = f"""
    WITH raw AS (
      SELECT file, x, y, CAST(lat AS DOUBLE) AS lat,
             CAST(lon AS DOUBLE) AS lon, CAST(value AS DOUBLE) AS value
      FROM read_csv('{_HRDPA_ROT_CELLS}', header=true)
      WHERE value IS NOT NULL
    )
    SELECT CAST(floor(lat) AS BIGINT) AS lat_band,
           count(*) AS n_cells,
           count(DISTINCT file) AS n_files,
           {R(DSUM('value') + ' / count(value)', 6)} AS vmean,
           {R('min(lon)', 6)} AS lon_min,
           {R('max(lon)', 6)} AS lon_max
    FROM raw GROUP BY 1
"""


@register("hrdpa_rotated_ingest", oracle=_HRDPA_ROT_ORACLE)
def hrdpa_rotated_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rotated lat/lon GRIB2 decode -> true-coordinate latitude-band
    stats (template 3.1 + complex packing, the production ECCC file
    shape)."""
    from .sources.gridded import grib_cells

    cells = grib_cells(spark, str(_HRDPA_ROT_DIR) + "/*.grib2")
    out = cells.groupBy(
        F.floor(F.col("lat")).cast("bigint").alias("lat_band")
    ).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.count_distinct("file").alias("n_files"),
        _exact_mean_of(F.col("value")).alias("vmean"),
        F.min("lon").alias("lon_min"),
        F.max("lon").alias("lon_max"),
    )
    return _round(out, {"vmean": 6, "lon_min": 6, "lon_max": 6})


@register("hrdpa_complex_ingest", oracle=_hrdpa_oracle(_HRDPA_COMPLEX_CELLS))
def hrdpa_complex_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same end-to-end HRDPA pipeline over COMPLEX-packed payloads
    (data representation templates 5.2 and 5.3, spatial differencing
    orders 1-2 — what production ECCC files actually carry,
    R/downloadHRDPA.R:80-181 via terra/GDAL). The oracle reads the
    fixture generator's decoded-cell CSV twin, so the grouped
    bit-unpacking and un-differencing are differentially checked."""
    return _hrdpa_pipeline(spark, _HRDPA_COMPLEX_DIR)


_HRDPS_GRIB_DIR = _FIXDIR / "hrdps_grib"
_HRDPS_CELLS = _FIXDIR / "hrdps_cells.csv"

# HRDPS forecast ingest end-to-end (downloadHRDPS.R:39-199): run
# listing -> latest-COMPLETE-run selection (the 06Z run has only 3 of
# the required 5 steps and must lose to 12Z) -> per-step references ->
# real GRIB2 decode -> per-step zonal stats, with the decoded
# section-4 forecast hour cross-checking the filename-derived step.
_HRDPS_GRIB_ORACLE = f"""
    WITH raw AS (
      SELECT file, CAST(issue AS TIMESTAMP) AS issue, step, x, y,
             CAST(value AS DOUBLE) AS value
      FROM read_csv('{_HRDPS_CELLS}', header=true)
    ), runs AS (
      SELECT issue, count(DISTINCT step) AS n_steps FROM raw GROUP BY 1
    ), sel_run AS (
      SELECT issue FROM runs
      WHERE n_steps >= 5 AND issue > TIMESTAMP '2024-01-09 00:00:00'
      ORDER BY issue DESC LIMIT 1
    ), sel AS (
      SELECT r.* FROM raw r JOIN sel_run USING (issue)
      WHERE r.value IS NOT NULL AND r.step <= 4
    )
    SELECT CAST(step AS BIGINT) AS step,
           issue AS issued,
           issue + to_hours(step) AS valid_from,
           issue + to_hours(step + 1) AS valid_to,
           CAST(step AS BIGINT) AS decoded_fh,
           count(*) AS n_cells,
           {R(DSUM('value') + ' / count(value)', 6)} AS zmean,
           {R('min(value)', 6)} AS zmin,
           {R('max(value)', 6)} AS zmax
    FROM sel GROUP BY step, issue
"""


@register("hrdps_grib_ingest", oracle=_HRDPS_GRIB_ORACLE)
def hrdps_grib_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-complete-run selection -> step expansion -> GRIB2 decode
    -> per-step stats; decoded forecast hours must equal the step."""
    import os as _os

    from .sources.gridded import (grib_cells, hrdps_forecast_steps,
                                  hrdps_select_run)

    names = sorted(_os.listdir(_HRDPS_GRIB_DIR))
    listing = _ldf(spark, [(n,) for n in names], ["file"])
    runs = (
        listing.select(
            F.to_timestamp(F.substring("file", 1, 11), "yyyyMMdd'T'HH")
            .alias("issue"))
        .groupBy("issue").agg(F.count(F.lit(1)).alias("n_steps"))
        .withColumn("base_url", F.lit("https://dd/model_hrdps/2.5km"))
    )
    sel = hrdps_select_run(runs, last_issued="2024-01-09 00:00:00",
                           min_steps=5)
    steps = hrdps_forecast_steps(sel, "TMP_AGL-2m", n_steps=4)
    refs = steps.select(
        F.col("step").cast("long").alias("step"), "issued",
        "valid_from", "valid_to",
        F.substring_index("source", "/", -1).alias("file"),
    )
    cells = grib_cells(spark, str(_HRDPS_GRIB_DIR) + "/*.grib2")
    j = cells.join(F.broadcast(refs), "file")
    out = j.groupBy("step", "issued", "valid_from", "valid_to").agg(
        F.min("fhours").cast("long").alias("decoded_fh"),
        F.count(F.lit(1)).alias("n_cells"),
        _exact_mean_of(F.col("value")).alias("zmean"),
        F.min("value").alias("zmin"),
        F.max("value").alias("zmax"),
    )
    return _round(
        out.select("step", "issued", "valid_from", "valid_to",
                   "decoded_fh", "n_cells", "zmean", "zmin", "zmax"),
        {"zmean": 6, "zmin": 6, "zmax": 6},
    )


_ERA5_NC = _FIXDIR / "era5_tp.nc"
_ERA5_CELLS = _FIXDIR / "era5_cells.csv"
_ERA5_NC4 = _FIXDIR / "era5_tp_nc4.nc"
_ERA5_NC4_CELLS = _FIXDIR / "era5_nc4_cells.csv"


# ERA5 NetCDF ingest end-to-end (downloadERA5.R payload half): real
# NetCDF-3 decode (packed shorts + scale/offset + fill, record-dim
# time slabs — functions/netcdf3.py) -> hourly cells -> daily
# accumulation per cell -> half-grid zonal stats; oracle reads the
# fixture generator's decoded CSV twin so the binary decode itself is
# differentially checked.
def _era5_oracle(cells_csv) -> str:
    return f"""
    WITH raw AS (
      SELECT hour, x, y, CAST(tp AS DOUBLE) AS tp
      FROM read_csv('{cells_csv}', header=true)
      WHERE tp IS NOT NULL
    ), stamped AS (
      SELECT TIMESTAMP '1900-01-01 00:00:00' + to_hours(hour) AS dt,
             x, y, tp
      FROM raw
    ), daily AS (
      SELECT CAST(dt AS DATE) AS date, x, y,
             {DSUM('tp')} AS dsum, count(*) AS n_hours
      FROM stamped GROUP BY 1, 2, 3
    )
    SELECT date, CASE WHEN x < 3 THEN 'west' ELSE 'east' END AS zone,
           count(*) AS n_cells,
           {R(DSUM('dsum') + ' / count(dsum)', 6)} AS zmean,
           {R('min(dsum)', 6)} AS zmin,
           {R('max(dsum)', 6)} AS zmax,
           CAST(sum(n_hours) AS BIGINT) AS total_hours
    FROM daily
    GROUP BY 1, 2
"""


_ERA5_NC_ORACLE = _era5_oracle(_ERA5_CELLS)


def _era5_pipeline(spark: SparkSession, nc_path) -> DataFrame:
    """NetCDF decode -> hourly cells -> per-cell daily accumulation
    -> half-grid zonal stats (shared by the CDF-1 and HDF5 payloads)."""
    from .sources.gridded import netcdf_cells

    cells = netcdf_cells(spark, str(nc_path), "tp")
    stamped = cells.select(
        F.timestamp_add("HOUR", F.col("hour").cast("int"),
                        F.lit("1900-01-01 00:00:00").cast("timestamp"))
        .alias("dt"),
        "x", "y", "value",
    )
    daily = stamped.groupBy(
        F.to_date("dt").alias("date"), "x", "y"
    ).agg(
        _exact_sum_col("value").alias("dsum"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    out = daily.groupBy(
        "date",
        F.when(F.col("x") < 3, "west").otherwise("east").alias("zone"),
    ).agg(
        F.count(F.lit(1)).alias("n_cells"),
        _exact_mean_of(F.col("dsum")).alias("zmean"),
        F.min("dsum").alias("zmin"),
        F.max("dsum").alias("zmax"),
        F.sum("n_hours").cast("bigint").alias("total_hours"),
    )
    return _round(out, {"zmean": 6, "zmin": 6, "zmax": 6})


@register("era5_netcdf_ingest", oracle=_ERA5_NC_ORACLE)
def era5_netcdf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NetCDF-3 decode -> hourly cells -> per-cell daily accumulation
    -> half-grid zonal stats."""
    return _era5_pipeline(spark, _ERA5_NC)


@register("era5_netcdf4_ingest", oracle=_era5_oracle(_ERA5_NC4_CELLS))
def era5_netcdf4_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same ERA5 pipeline over a NetCDF-4 (HDF5) payload — the format
    the CDS API frequently serves (R/downloadERA5.R:149-200): chunked
    int16 with the netCDF default shuffle+deflate pipeline, decoded by
    the pure-stdlib HDF5 subset reader (functions/hdf5.py); the oracle
    reads the fixture generator's decoded-cell CSV twin, so chunk
    B-tree walking, unshuffling, and inflation are differentially
    checked."""
    return _era5_pipeline(spark, _ERA5_NC4)


_CALDAS_GRIB_DIR = _FIXDIR / "caldas_grib"
_CALDAS_CELLS = _FIXDIR / "caldas_cells.csv"

# CaLDAS analysis ingest (downloadCaLDAS.R:36-51 + decode): requested
# hours pass the 3-hourly cadence gate, per-(day, hour) references
# select the staged analyses (the 21Z file exists but is NOT in the
# request), GRIB2 decode, per-analysis stats.
_CALDAS_ORACLE = f"""
    WITH raw AS (
      SELECT file, CAST(datetime AS TIMESTAMP) AS datetime, x, y,
             CAST(value AS DOUBLE) AS value
      FROM read_csv('{_CALDAS_CELLS}', header=true)
    ), sel AS (
      SELECT * FROM raw
      WHERE hour(datetime) IN (0, 6, 12) AND value IS NOT NULL
    )
    SELECT datetime,
           count(*) AS n_cells,
           {R(DSUM('value') + ' / count(value)', 6)} AS zmean,
           {R('min(value)', 6)} AS zmin,
           {R('max(value)', 6)} AS zmax
    FROM sel GROUP BY datetime
"""


@register("caldas_grib_ingest", oracle=_CALDAS_ORACLE)
def caldas_grib_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cadence-gated hour selection -> analysis decode -> per-analysis
    stats (the fourth gridded connector, decode-wired)."""
    from .sources.gridded import caldas_validate_hours, grib_cells

    hrs = caldas_validate_hours("0,6,12")
    refs = _ldf(spark, [
        (f"20240110T{h:02d}Z_MSC_CaLDAS-NSRPS_SD_Veg_"
         f"RLatLon0.009_PT0H.grib2",
         f"2024-01-10 {h:02d}:00:00")
        for h in hrs
    ], ["file", "dt"]).select(
        "file", F.col("dt").cast("timestamp").alias("datetime"))
    cells = grib_cells(spark, str(_CALDAS_GRIB_DIR) + "/*.grib2")
    j = cells.join(F.broadcast(refs), "file")
    out = j.groupBy("datetime").agg(
        F.count(F.lit(1)).alias("n_cells"),
        _exact_mean_of(F.col("value")).alias("zmean"),
        F.min("value").alias("zmin"),
        F.max("value").alias("zmax"),
    )
    return _round(out, {"zmean": 6, "zmin": 6, "zmax": 6})


# ---------------------------------------------------------------------------
# ERA5/CDS request batching (downloadERA5.R:149-200): full months become
# one request, partial head/tail months go day-by-day — planned set-wise
# for a catalog of ranges with a months-spine explode + days explode.
# ---------------------------------------------------------------------------

_ERA5_PLAN_ORACLE = """
    WITH r AS (
      SELECT o_orderkey AS req_id,
             CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE)
               + CAST((o_orderkey % 90) + 10 AS INT) AS e
      FROM orders WHERE o_orderkey % 41 = 5
    ), m AS (
      SELECT req_id, s, e,
             CAST(unnest(generate_series(
               date_trunc('month', s), date_trunc('month', e),
               INTERVAL 1 MONTH)) AS DATE) AS mth
      FROM r
    ), rng AS (
      SELECT req_id, s, e, mth, last_day(mth) AS me,
             greatest(s, mth) AS rs, least(e, last_day(mth)) AS re
      FROM m
    ), days AS (
      SELECT req_id,
             CAST(unnest(generate_series(CAST(rs AS TIMESTAMP),
                                         CAST(re AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS d
      FROM rng WHERE NOT (rs = mth AND re = me)
    )
    SELECT req_id, 'month' AS request_type,
           rs AS range_start, re AS range_end
    FROM rng WHERE rs = mth AND re = me
    UNION ALL
    SELECT req_id, 'day', d, d FROM days
"""


@register("era5_request_plan", oracle=_ERA5_PLAN_ORACLE)
def era5_request_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.gridded import era5_request_plan

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    ranges = o.where(k % 41 == 5).select(
        k.alias("req_id"),
        F.to_date("o_orderdate").alias("start_ts"),
        F.date_add(F.to_date("o_orderdate"),
                   (k % 90 + 10).cast("int")).alias("end_ts"),
    )
    return era5_request_plan(ranges)


# ---------------------------------------------------------------------------
# Matrix-state resolution ladder for discrete results (patch_39.R:798-970
# + utils.R:861-1131): explicit id > numeric/text label (with unknown/
# ambiguous rejection) > media default gated by parameter units >
# unique-parameter-state fallback. Dims from nation/part; every arm of
# the ladder is exercised by the o_orderkey residue classes.
# ---------------------------------------------------------------------------

_MATRIX_STATE_ORACLE = """
    WITH ms(matrix_state_id, code, name, name_fr) AS (
      VALUES (1, 'liquid', 'Aqueous', 'Liquide'),
             (2, 'solid', 'Solid', 'Solide'),
             (3, 'gas', 'Gas', 'aqueous')
    ), labels AS (
      SELECT lab, count(*) AS n_lab, min(matrix_state_id) AS lab_id FROM (
        SELECT DISTINCT matrix_state_id,
               unnest([lower(code), lower(name), lower(name_fr)]) AS lab
        FROM ms
      ) GROUP BY lab
    ), med AS (
      SELECT n_nationkey AS media_id,
             CASE n_nationkey % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
                  WHEN 2 THEN 3 END AS med_def
      FROM nation
    ), par AS (
      SELECT p_partkey AS param_id,
             CASE WHEN p_partkey % 3 = 0 THEN 10 END AS units_liquid,
             CASE WHEN p_partkey % 5 = 0 THEN 20 END AS units_solid,
             CASE WHEN p_partkey % 7 = 0 THEN 30 END AS units_gas
      FROM part
    ), par_states AS (
      SELECT param_id,
             CASE WHEN count(*) = 1 THEN min(ms.matrix_state_id) END AS uniq_id
      FROM (
        SELECT param_id, unnest([
          CASE WHEN units_liquid IS NOT NULL THEN 'liquid' END,
          CASE WHEN units_solid IS NOT NULL THEN 'solid' END,
          CASE WHEN units_gas IS NOT NULL THEN 'gas' END]) AS c
        FROM par) s
      JOIN ms ON ms.code = s.c
      GROUP BY param_id
    ), res AS (
      SELECT o_orderkey AS result_id,
             o_custkey % 25 AS sample_media_id,
             CASE WHEN o_orderkey % 17 = 0 THEN NULL
                  ELSE o_orderkey % 400 + 1 END AS parameter_id,
             CASE WHEN o_orderkey % 11 = 0
                  THEN CAST(o_orderkey % 3 + 1 AS INT) END AS matrix_state_id,
             CASE o_orderkey % 13 WHEN 0 THEN 'liquid' WHEN 1 THEN 'SOLID'
                  WHEN 2 THEN ' Liquide ' WHEN 3 THEN '2' WHEN 4 THEN 'bogus'
                  WHEN 5 THEN 'aqueous' WHEN 6 THEN '' WHEN 7 THEN 'NA'
             END AS matrix_state
      FROM orders
    ), norm AS (
      SELECT *, CASE WHEN lower(trim(matrix_state)) IN ('', 'na', 'null')
                     THEN NULL ELSE lower(trim(matrix_state)) END AS nrm
      FROM res
    ), flags AS (
      SELECT *, COALESCE(regexp_full_match(nrm, '[+-]?[0-9]+'), FALSE)
                  AS is_num
      FROM norm
    ), j AS (
      SELECT f.*, l.n_lab, l.lab_id, m.med_def, mc.code AS med_code,
             p.units_liquid, p.units_solid, p.units_gas, ps.uniq_id,
             CASE mc.code WHEN 'liquid' THEN p.units_liquid
                  WHEN 'solid' THEN p.units_solid
                  WHEN 'gas' THEN p.units_gas END AS med_unit
      FROM flags f
      LEFT JOIN labels l ON f.nrm = l.lab AND NOT f.is_num
      LEFT JOIN med m ON m.media_id = f.sample_media_id
      LEFT JOIN ms mc ON mc.matrix_state_id = m.med_def
      LEFT JOIN par p ON p.param_id = f.parameter_id
      LEFT JOIN par_states ps ON ps.param_id = f.parameter_id
    )
    SELECT result_id, sample_media_id, parameter_id,
           CAST(CASE
             WHEN matrix_state_id IS NOT NULL THEN matrix_state_id
             WHEN nrm IS NOT NULL AND is_num THEN CAST(nrm AS INT)
             WHEN nrm IS NOT NULL AND n_lab = 1 THEN lab_id
             WHEN nrm IS NOT NULL THEN NULL
             WHEN med_def IS NOT NULL AND (parameter_id IS NULL
                  OR med_unit IS NOT NULL) THEN med_def
             ELSE uniq_id END AS INT) AS matrix_state_id,
           CASE
             WHEN matrix_state_id IS NOT NULL THEN 'explicit'
             WHEN nrm IS NOT NULL AND is_num THEN 'numeric_label'
             WHEN nrm IS NOT NULL AND n_lab = 1 THEN 'label'
             WHEN nrm IS NOT NULL THEN NULL
             WHEN med_def IS NOT NULL AND (parameter_id IS NULL
                  OR med_unit IS NOT NULL) THEN 'media_default'
             WHEN uniq_id IS NOT NULL THEN 'unique_parameter_state'
             ELSE 'unresolved' END AS resolved_via,
           CASE WHEN matrix_state_id IS NULL AND nrm IS NOT NULL
                     AND NOT is_num AND n_lab IS NULL
                  THEN 'unknown_matrix_state'
                WHEN matrix_state_id IS NULL AND nrm IS NOT NULL
                     AND NOT is_num AND n_lab > 1
                  THEN 'ambiguous_matrix_state' END AS reject_reason
    FROM j
"""


@register("matrix_state_resolution", oracle=_MATRIX_STATE_ORACLE)
def matrix_state_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.discrete import resolve_matrix_states

    matrix_states = _ldf(spark, 
        [(1, "liquid", "Aqueous", "Liquide"),
         (2, "solid", "Solid", "Solide"),
         (3, "gas", "Gas", "aqueous")],
        "matrix_state_id int, matrix_state_code string,"
        " matrix_state_name string, matrix_state_name_fr string",
    )
    n = _t(spark, sf_dir, "nation")
    nk = F.col("n_nationkey")
    media_types = n.select(
        nk.alias("media_id"),
        F.when(nk % 4 == 0, 1).when(nk % 4 == 1, 2).when(nk % 4 == 2, 3)
        .alias("default_matrix_state_id"),
    )
    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    parameters = p.select(
        pk.alias("parameter_id"),
        F.when(pk % 3 == 0, 10).alias("units_liquid"),
        F.when(pk % 5 == 0, 20).alias("units_solid"),
        F.when(pk % 7 == 0, 30).alias("units_gas"),
    )
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    results = o.select(
        k.alias("result_id"),
        (F.col("o_custkey") % 25).alias("sample_media_id"),
        F.when(k % 17 != 0, k % 400 + 1).alias("parameter_id"),
        F.when(k % 11 == 0, (k % 3 + 1).cast("int")).alias("matrix_state_id"),
        F.when(k % 13 == 0, "liquid").when(k % 13 == 1, "SOLID")
        .when(k % 13 == 2, " Liquide ").when(k % 13 == 3, "2")
        .when(k % 13 == 4, "bogus").when(k % 13 == 5, "aqueous")
        .when(k % 13 == 6, "").when(k % 13 == 7, "NA")
        .alias("matrix_state"),
    )
    return resolve_matrix_states(results, matrix_states, media_types,
                                 parameters)


# ---------------------------------------------------------------------------
# Training-data tier: unigram-LM surprisal (the CCNet-style quality
# axis) — corpus-trained token frequencies, per-doc mean -ln p(token)
# in order-independent micro-nat accumulation.
# ---------------------------------------------------------------------------

_SURPRISAL_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), freq AS (
      SELECT tok, count(*) AS cnt FROM tok GROUP BY tok
    ), tot AS (
      SELECT sum(cnt) AS total FROM freq
    ), surp AS (
      SELECT tok, CAST(floor(-ln(cnt / total) * 1000000 + 0.5) AS BIGINT) AS q
      FROM freq, tot
    ), d AS (
      SELECT t.doc_id, sum(q) AS sq, count(*) AS n
      FROM tok t JOIN surp USING (tok) GROUP BY 1
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           {R('sq / 1000000.0 / n', 6)} AS mean_surprisal
    FROM d
"""


@register("unigram_surprisal", oracle=_SURPRISAL_ORACLE)
def unigram_surprisal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import unigram_surprisal

    docs = _t(spark, sf_dir, "documents")
    return _round(unigram_surprisal(docs), {"mean_surprisal": 6})


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets: rank every document by its corpus-LM
# mean surprisal and cut the ranking into exact terciles (head =
# lowest surprisal = most fluent). The global ranking uses
# operators/rank.global_rank — range partition + per-bucket window +
# offset join, NO single-partition exchange (the weak-flag class a
# global row_number window would be). Ranking key is the micro-nat
# QUANTIZED mean (an integer, identical on both engines), doc_id
# tiebreak.
# ---------------------------------------------------------------------------

_PPL_BUCKETS_ORACLE = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), freq AS (
      SELECT tok, count(*) AS cnt FROM tok GROUP BY tok
    ), tot AS (
      SELECT sum(cnt) AS total FROM freq
    ), surp AS (
      SELECT tok, CAST(floor(-ln(cnt / total) * 1000000 + 0.5) AS BIGINT) AS q
      FROM freq, tot
    ), d AS (
      SELECT t.doc_id, sum(q) AS sq, count(*) AS n
      FROM tok t JOIN surp USING (tok) GROUP BY 1
    ), keyed AS (
      SELECT doc_id,
             CAST(floor((sq / 1000000.0 / n) * 1000000 + 0.5) AS BIGINT)
               AS mq
      FROM d
    ), nd AS (
      SELECT count(*) AS n_docs FROM keyed
    ), r AS (
      SELECT doc_id, mq,
             row_number() OVER (ORDER BY mq ASC, doc_id ASC) AS rank
      FROM keyed
    )
    SELECT doc_id, mq / 1000000.0 AS mean_surprisal,
           CAST(rank AS BIGINT) AS rank,
           CASE WHEN rank * 3 <= nd.n_docs THEN 'head'
                WHEN rank * 3 <= nd.n_docs * 2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM r CROSS JOIN nd
"""


@register("surprisal_quality_buckets", oracle=_PPL_BUCKETS_ORACLE)
def surprisal_quality_buckets_q(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Exact surprisal terciles over the corpus (head/middle/tail)."""
    from .operators.dedup import unigram_surprisal
    from .operators.rank import global_rank

    docs = _t(spark, sf_dir, "documents")
    surp = unigram_surprisal(docs)
    keyed = surp.select(
        "doc_id",
        F.floor(F.col("mean_surprisal").cast("double") * 1e6
                + F.lit(0.5)).cast("long").alias("__mq"))
    ranked = global_rank(keyed, ["__mq", "doc_id"], rank_col="rank")
    nd = keyed.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        ranked.crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            (F.col("__mq") / F.lit(1e6)).alias("mean_surprisal"),
            "rank",
            F.when(F.col("rank") * 3 <= F.col("n_docs"), "head")
            .when(F.col("rank") * 3 <= F.col("n_docs") * 2, "middle")
            .otherwise("tail").alias("bucket"),
        )
    )


# ---------------------------------------------------------------------------
# The public read API end-to-end (§2.13, patch_53.R:1844-2260), oracle-
# checked: a NESTED compound (8 = coalesce(compound 6, basic 5); 6 =
# coalesce(corrected basic 1, basic 2)) with a member-level correction,
# a correction on the outer compound itself, and a resampled 'mean'
# statistic — one call through measurements_continuous_corrected
# exercises plan dispatch, recursive member resolution, correction
# fast-paths, and the dense resample tail in a single hash-matched
# result.
# ---------------------------------------------------------------------------

_API_READ_ORACLE = f"""
    WITH m AS (
      SELECT CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                  WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4
                  ELSE 5 END AS tsid,
             CAST(ts AS TIMESTAMP) AS datetime, value
      FROM events
    ), win AS (
      SELECT * FROM m
      WHERE datetime >= TIMESTAMP '2024-01-03 00:00:00'
        AND datetime <= TIMESTAMP '2024-01-25 00:00:00'
    ), c1 AS (
      SELECT datetime,
             CASE WHEN datetime >= TIMESTAMP '2024-01-05 00:00:00'
                       AND datetime < TIMESTAMP '2024-01-15 00:00:00'
                       AND value IS NOT NULL
                  THEN value + 0.5 ELSE value END AS value
      FROM win WHERE tsid = 1
    ), c6 AS (
      SELECT datetime, value FROM (
        SELECT datetime, value,
               row_number() OVER (PARTITION BY datetime ORDER BY prio, al) rn
        FROM (
          SELECT datetime, value, 1 AS prio, 'a' AS al FROM c1
          WHERE value IS NOT NULL
          UNION ALL
          SELECT datetime, value, 2, 'b' FROM win
          WHERE tsid = 2 AND value IS NOT NULL
        )
      ) WHERE rn = 1
    ), c8raw AS (
      SELECT datetime, value FROM (
        SELECT datetime, value,
               row_number() OVER (PARTITION BY datetime ORDER BY prio, al) rn
        FROM (
          SELECT datetime, value, 1 AS prio, 'm6' AS al FROM c6
          WHERE value IS NOT NULL
          UNION ALL
          SELECT datetime, value, 2, 'm5' FROM win
          WHERE tsid = 5 AND value IS NOT NULL
        )
      ) WHERE rn = 1
    ), c8 AS (
      SELECT datetime,
             CASE WHEN datetime >= TIMESTAMP '2024-01-10 00:00:00'
                       AND datetime < TIMESTAMP '2024-01-20 00:00:00'
                       AND value IS NOT NULL
                  THEN value * 110.0 / 100 ELSE value END AS cv
      FROM c8raw
    ), b AS (
      SELECT TIMESTAMP '1970-01-01'
               + CAST(floor(epoch(datetime) / 21600) * 21600 AS BIGINT)
                 * INTERVAL 1 SECOND AS bin_start,
             {DSUM('cv')} / count(cv) AS mean
      FROM c8 WHERE cv IS NOT NULL
      GROUP BY 1
    ), bounds AS (
      SELECT min(bin_start) AS lo, max(bin_start) AS hi FROM b
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 21600 SECOND))
               AS bin_start
      FROM bounds
    )
    SELECT s.bin_start, {R('b.mean', 6)} AS corrected_value
    FROM spine s LEFT JOIN b USING (bin_start)
"""


@register("api_corrected_read", oracle=_API_READ_ORACLE)
def api_corrected_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .api import measurements_continuous_corrected
    from .fixtures import FixtureStore
    from .operators.corrections import Correction

    ev = _t(spark, sf_dir, "events")
    tsid = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "purchase", 3)
        .when(F.col("event_type") == "signup", 4)
        .otherwise(5)
    )
    meas = ev.select(
        tsid.alias("timeseries_id"), F.col("ts").alias("datetime"), "value"
    )
    timeseries = _ldf(spark, 
        [(i, "basic", "mean") for i in range(1, 6)]
        + [(6, "compound", "mean"), (8, "compound", "mean")],
        "timeseries_id int, timeseries_type string, aggregation_type string",
    )
    corrections = [
        Correction(1, 1, "2024-01-05 00:00:00", "2024-01-15 00:00:00",
                   "offset_linear", value1=0.5),
        Correction(2, 8, "2024-01-10 00:00:00", "2024-01-20 00:00:00",
                   "scale", value1=110.0),
    ]
    compounds = {
        6: {"expression": None, "members": [
            {"alias": "a", "timeseries_id": 1, "priority": 1,
             "use_from": None, "use_to": None},
            {"alias": "b", "timeseries_id": 2, "priority": 2,
             "use_from": None, "use_to": None},
        ]},
        8: {"expression": None, "members": [
            {"alias": "m6", "timeseries_id": 6, "priority": 1,
             "use_from": None, "use_to": None},
            {"alias": "m5", "timeseries_id": 5, "priority": 2,
             "use_from": None, "use_to": None},
        ]},
    }
    store = FixtureStore(
        timeseries=timeseries, measurements=meas,
        corrections=corrections, compounds=compounds,
    )
    out = measurements_continuous_corrected(
        store, 8, "2024-01-03 00:00:00", "2024-01-25 00:00:00",
        statistic="mean", resample_seconds=21600,
    )
    return _round(out.select("bin_start", "corrected_value"),
                  {"corrected_value": 6})


# ---------------------------------------------------------------------------
# Tolerant-alignment expression compound (§2.4 'compound member
# alignment, tolerant' composed with §2.10): clicks anchor a spine,
# views align 1:1 mutually-nearest within 10 min, and the compound
# expression projects over the aligned aliases (NULL where unmatched).
# ---------------------------------------------------------------------------

_COMPOUND_ASOF_ORACLE = f"""
    WITH l AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS datetime, value AS a,
             epoch_us(CAST(ts AS TIMESTAMP)) AS lus
      FROM events WHERE event_type = 'click'
    ), r AS (
      SELECT CAST(ts AS TIMESTAMP) AS rts, value AS b,
             epoch_us(CAST(ts AS TIMESTAMP)) AS rus
      FROM events WHERE event_type = 'view'
    ), cand AS (
      SELECT l.datetime, l.lus, r.rus, r.b, abs(l.lus - r.rus) AS d
      FROM l JOIN r ON abs(l.lus - r.rus) <= 600 * 1000000
    ), ranked AS (
      SELECT *,
        row_number() OVER (PARTITION BY lus ORDER BY d, rus) AS ar,
        row_number() OVER (PARTITION BY rus ORDER BY d, lus) AS mr
      FROM cand
    ), pairs AS (
      SELECT lus, b FROM ranked WHERE ar = 1 AND mr = 1
    )
    SELECT l.datetime, {R('l.a + 0.1 * p.b', 6)} AS value,
           {R('l.a', 6)} AS a, {R('p.b', 6)} AS b
    FROM l LEFT JOIN pairs p USING (lus)
"""


@register("compound_asof_expression", oracle=_COMPOUND_ASOF_ORACLE)
def compound_asof_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.compound import Member, expression_compound_asof

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("ts").alias("datetime"), "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("ts").alias("datetime"), "value"
    )
    out = expression_compound_asof(
        [Member("a", clicks, 1), Member("b", views, 2)],
        "a + 0.1 * b", tolerance_seconds=600,
    )
    return _round(out, {"value": 6, "a": 6, "b": 6})


# ---------------------------------------------------------------------------
# Water-quality guideline (criteria) evaluation, §patch_51: input
# resolution with result-type preference ranks + condition-value
# fallback + single/avg/max aggregation + calibrated-bound clamp and
# reject, then rule algorithms (constant / narrative / linear /
# log-linear) with output caps and per-rule rounding, then the
# bound-preferring scalar. Dims are VALUES on both engines; the results
# fact derives from orders so every status arm fires somewhere.
# ---------------------------------------------------------------------------

_GUIDELINE_RESULTS_SQL = """
      SELECT o_orderkey AS result_id,
             o_custkey % 120 AS sample_id,
             CASE o_orderkey % 3 WHEN 0 THEN 7 WHEN 1 THEN 8 ELSE 9 END
               AS parameter_id,
             CASE WHEN o_orderkey % 19 = 0 THEN NULL
                  ELSE (o_orderkey % 400) * 0.1 + 0.2 END AS result,
             CASE WHEN o_orderkey % 19 = 0
                  THEN (o_orderkey % 50) * 0.1 + 0.1 END
               AS result_condition_value,
             CASE o_orderkey % 4 WHEN 0 THEN 'field' WHEN 1 THEN 'lab'
                  WHEN 2 THEN 'other' END AS result_type,
             o_orderkey % 2 + 1 AS matrix_state_id,
             o_orderkey % 3 + 1 AS sample_fraction_id,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  ELSE o_orderkey % 4 + 1 END AS result_speciation_id
      FROM orders
"""

_GUIDELINE_EVAL_CTE = f"""
    WITH res AS ({_GUIDELINE_RESULTS_SQL}),
    samples AS (SELECT DISTINCT sample_id FROM res),
    inputs(input_id, parameter_id, matrix_state_id, sample_fraction_id,
           result_speciation_id, result_type, allow_condition_value,
           aggregate_method, lower_calibrated_bound, upper_calibrated_bound,
           bounds_action) AS (
      VALUES (1, 7, NULL, NULL, NULL, NULL, TRUE, 'avg', 1.0, 30.0, 'clamp'),
             (2, 8, 1, NULL, NULL, NULL, FALSE, 'single', 0.5, 35.0, 'reject'),
             (3, 9, NULL, NULL, NULL, 'field', FALSE, 'max', NULL, NULL, 'warn')
    ),
    cand AS (
      SELECT r.sample_id, i.input_id, r.result_id,
             CASE WHEN i.input_id = 1 THEN
               CASE r.result_type WHEN 'field' THEN 1 WHEN 'lab' THEN 2 END
             ELSE 1 END AS rnk,
             CASE WHEN r.result IS NOT NULL THEN r.result
                  WHEN i.allow_condition_value THEN r.result_condition_value
             END AS v
      FROM res r JOIN inputs i ON r.parameter_id = i.parameter_id
       AND (i.matrix_state_id IS NULL
            OR r.matrix_state_id = i.matrix_state_id)
       AND (i.result_type IS NULL
            OR r.result_type IS NOT DISTINCT FROM i.result_type)
       AND (i.input_id <> 1 OR r.result_type IN ('field', 'lab'))
    ),
    agg AS (
      SELECT sample_id, input_id, count(*) AS matching, count(v) AS usable,
             min(rnk) FILTER (WHERE v IS NOT NULL) AS sel_rank
      FROM cand GROUP BY 1, 2
    ),
    at_rank AS (
      SELECT c.sample_id, c.input_id, count(*) AS n_pref,
             sum(CAST(floor(c.v * 1000000 + 0.5) AS BIGINT))
               / 1000000.0 / count(*) AS vavg,
             min(c.v) AS vmin, max(c.v) AS vmax
      FROM cand c JOIN agg a USING (sample_id, input_id)
      WHERE c.v IS NOT NULL AND c.rnk = a.sel_rank
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT s.sample_id, i.input_id, i.aggregate_method,
             i.lower_calibrated_bound, i.upper_calibrated_bound,
             i.bounds_action
      FROM samples s CROSS JOIN inputs i
    ),
    iv AS (
      SELECT g.sample_id, g.input_id,
             CASE WHEN st = 'value' THEN clamped END AS input_value,
             st AS status
      FROM (
        SELECT g.*, a.matching, a.usable, p.n_pref,
               CASE g.aggregate_method WHEN 'avg' THEN p.vavg
                    WHEN 'max' THEN p.vmax ELSE p.vmin END AS raw
        FROM grid g
        LEFT JOIN agg a USING (sample_id, input_id)
        LEFT JOIN at_rank p USING (sample_id, input_id)
      ) g,
      LATERAL (SELECT
        CASE WHEN g.lower_calibrated_bound IS NOT NULL
                  AND g.raw < g.lower_calibrated_bound
                  AND g.bounds_action = 'clamp'
               THEN g.lower_calibrated_bound
             WHEN g.upper_calibrated_bound IS NOT NULL
                  AND g.raw > g.upper_calibrated_bound
                  AND g.bounds_action = 'clamp'
               THEN g.upper_calibrated_bound
             ELSE g.raw END AS clamped,
        CASE WHEN g.matching IS NULL OR g.matching = 0 THEN 'missing_input'
             WHEN g.usable = 0 THEN 'missing_input_value'
             WHEN g.aggregate_method = 'single' AND g.n_pref > 1
               THEN 'ambiguous_input'
             WHEN ((g.lower_calibrated_bound IS NOT NULL
                    AND g.raw < g.lower_calibrated_bound)
                   OR (g.upper_calibrated_bound IS NOT NULL
                       AND g.raw > g.upper_calibrated_bound))
                  AND g.bounds_action = 'reject'
               THEN 'outside_calibrated_range'
             ELSE 'value' END AS st) x
    ),
    rules(rule_id, guideline_id, bound_code, rule_priority, algorithm_code,
          fixed_value, input_id, intercept, slope, min_output_value,
          max_output_value, rounding_digits, rounding_method) AS (
      VALUES (1, 1, 'upper', 1, 'constant', 25.456, NULL, NULL, NULL, NULL,
              NULL, 1, 'round'),
             (2, 1, 'lower', 2, 'narrative', NULL, NULL, NULL, NULL, NULL,
              NULL, NULL, NULL),
             (3, 2, 'upper', 1, 'linear', NULL, 1, 2.0, 0.3, 5.0, 40.0,
              1, 'floor'),
             (4, 2, 'upper', 2, 'log_linear', NULL, 2, 0.7, 0.74, NULL,
              NULL, 3, 'round'),
             (5, 3, 'upper', 1, 'log_linear', NULL, 3, 0.2, 0.5, NULL,
              NULL, 2, 'ceiling')
    ),
    ev0 AS (
      SELECT s.sample_id, r.*, v.input_value, v.status AS in_status
      FROM samples s CROSS JOIN rules r
      LEFT JOIN iv v ON v.sample_id = s.sample_id AND v.input_id = r.input_id
    ),
    ev1 AS (
      SELECT *,
        CASE algorithm_code
          WHEN 'constant' THEN fixed_value
          WHEN 'linear' THEN intercept + slope * input_value
          WHEN 'log_linear' THEN exp(intercept + slope * ln(input_value))
        END AS rawv
      FROM ev0
      -- ln() of a non-positive input errors in DuckDB rather than
      -- yielding NULL: mask it before the projection
      WHERE NOT (algorithm_code = 'log_linear'
                 AND COALESCE(input_value <= 0, FALSE))
      UNION ALL
      SELECT *, NULL AS rawv FROM ev0
      WHERE algorithm_code = 'log_linear'
        AND COALESCE(input_value <= 0, FALSE)
    ),
    ev2 AS (
      SELECT *,
        CASE WHEN rawv IS NULL THEN NULL
             WHEN max_output_value IS NOT NULL
                  AND (CASE WHEN min_output_value IS NOT NULL
                                 AND rawv < min_output_value
                            THEN min_output_value ELSE rawv END)
                      > max_output_value
               THEN max_output_value
             WHEN min_output_value IS NOT NULL AND rawv < min_output_value
               THEN min_output_value
             ELSE rawv END AS capv
      FROM ev1
    ),
    ev AS (
      SELECT sample_id, rule_id, guideline_id, bound_code, rule_priority,
        CASE WHEN st = 'value' THEN rounded END AS guideline_value,
        st AS output_status
      FROM (
        SELECT *,
          CASE WHEN capv IS NULL OR rounding_method IS NULL
                    OR rounding_method = 'none' THEN capv
               WHEN rounding_method = 'round'
                 THEN floor(capv * pow(10, COALESCE(rounding_digits, 0))
                            + 0.5) / pow(10, COALESCE(rounding_digits, 0))
               WHEN rounding_method = 'floor'
                 THEN floor(capv * pow(10, COALESCE(rounding_digits, 0)))
                      / pow(10, COALESCE(rounding_digits, 0))
               WHEN rounding_method = 'ceiling'
                 THEN ceiling(capv * pow(10, COALESCE(rounding_digits, 0)))
                      / pow(10, COALESCE(rounding_digits, 0))
          END AS rounded,
          CASE WHEN algorithm_code = 'narrative' THEN 'narrative'
               WHEN algorithm_code IN ('linear', 'log_linear')
                    AND in_status <> 'value' THEN in_status
               WHEN algorithm_code = 'log_linear' AND in_status = 'value'
                    AND input_value <= 0 THEN 'invalid_input_value'
               WHEN CASE WHEN capv IS NULL OR rounding_method IS NULL
                              OR rounding_method = 'none' THEN capv
                         ELSE capv END IS NULL THEN 'no_value'
               ELSE 'value' END AS st
        FROM ev2
      )
    )
"""

_GUIDELINE_EVAL_ORACLE = _GUIDELINE_EVAL_CTE + f"""
    SELECT sample_id, rule_id, guideline_id, bound_code,
           {R('guideline_value', 6)} AS guideline_value, output_status
    FROM ev
"""


def _guideline_frames(spark: SparkSession, sf_dir: str):
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    results = o.select(
        k.alias("result_id"),
        (F.col("o_custkey") % 120).alias("sample_id"),
        F.when(k % 3 == 0, 7).when(k % 3 == 1, 8).otherwise(9)
        .alias("parameter_id"),
        F.when(k % 19 != 0, (k % 400) * 0.1 + 0.2).alias("result"),
        F.when(k % 19 == 0, (k % 50) * 0.1 + 0.1)
        .alias("result_condition_value"),
        F.when(k % 4 == 0, "field").when(k % 4 == 1, "lab")
        .when(k % 4 == 2, "other").alias("result_type"),
        (k % 2 + 1).alias("matrix_state_id"),
        (k % 3 + 1).alias("sample_fraction_id"),
        F.when(k % 5 != 0, k % 4 + 1).alias("result_speciation_id"),
    )
    samples = results.select("sample_id").distinct()
    inputs = _ldf(spark, 
        [
            (1, 7, None, None, None, None, ["field", "lab"], True, "avg",
             1.0, 30.0, "clamp"),
            (2, 8, 1, None, None, None, None, False, "single",
             0.5, 35.0, "reject"),
            (3, 9, None, None, None, "field", None, False, "max",
             None, None, "warn"),
        ],
        "input_id int, parameter_id int, matrix_state_id int,"
        " sample_fraction_id int, result_speciation_id int,"
        " result_type string, result_type_preference array<string>,"
        " allow_condition_value boolean, aggregate_method string,"
        " lower_calibrated_bound double, upper_calibrated_bound double,"
        " bounds_action string",
    )
    rules = _ldf(spark, 
        [
            (1, 1, "upper", 1, "constant", 25.456, None, None, None, None,
             None, None, 1, "round"),
            (2, 1, "lower", 2, "narrative", None, None, None, None, None,
             None, None, None, None),
            (3, 2, "upper", 1, "linear", None, 1, 2.0, 0.3, None, 5.0, 40.0,
             1, "floor"),
            (4, 2, "upper", 2, "log_linear", None, 2, 0.7, 0.74, None, None,
             None, 3, "round"),
            (5, 3, "upper", 1, "log_linear", None, 3, 0.2, 0.5, None, None,
             None, 2, "ceiling"),
        ],
        "rule_id int, guideline_id int, bound_code string,"
        " rule_priority int, algorithm_code string, fixed_value double,"
        " input_id int, intercept double, slope double,"
        " formula_expr string, min_output_value double,"
        " max_output_value double, rounding_digits int,"
        " rounding_method string",
    )
    return samples, results, inputs, rules


@register("guideline_rule_evaluation", oracle=_GUIDELINE_EVAL_ORACLE)
def guideline_rule_evaluation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.guidelines import (
        evaluate_guideline_rules, guideline_input_values,
    )

    samples, results, inputs, rules = _guideline_frames(spark, sf_dir)
    iv = guideline_input_values(samples, results, inputs)
    ev = evaluate_guideline_rules(rules, iv)
    out = ev.select("sample_id", "rule_id", "guideline_id", "bound_code",
                    "guideline_value", "output_status")
    return _round(out, {"guideline_value": 6})


_GUIDELINE_SCALAR_ORACLE = _GUIDELINE_EVAL_CTE + f"""
    , vals AS (SELECT * FROM ev WHERE output_status = 'value')
    , best AS (
      SELECT guideline_id, sample_id,
             min(struct_pack(o := CASE bound_code WHEN 'upper' THEN 1
                                       WHEN 'lower' THEN 2 ELSE 4 END,
                             r := rule_id, v := guideline_value)) AS b
      FROM vals GROUP BY 1, 2
    )
    SELECT guideline_id, sample_id, {R('b.v', 6)} AS guideline_value
    FROM best
"""


@register("guideline_scalar", oracle=_GUIDELINE_SCALAR_ORACLE)
def guideline_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.guidelines import (
        evaluate_guideline_rules, get_guideline_values,
        guideline_input_values,
    )

    samples, results, inputs, rules = _guideline_frames(spark, sf_dir)
    iv = guideline_input_values(samples, results, inputs)
    ev = evaluate_guideline_rules(rules, iv)
    return _round(get_guideline_values(ev), {"guideline_value": 6})


# ---------------------------------------------------------------------------
# Public location masking (DEV_locs_masking.R:397-462): stable
# md5-seeded bearing/distance, spherical forward projection. Map-only.
# ---------------------------------------------------------------------------

_MASKED_LOC_ORACLE = f"""
    WITH loc AS (
      SELECT c_custkey AS location_id,
             (c_custkey % 140) - 70 + 0.123 AS lat,
             (c_custkey % 340) - 170 + 0.456 AS lon,
             'loc-' || c_custkey AS seed
      FROM customer
    ), un AS (
      SELECT *,
        CAST('0x' || substr(md5(seed || ':bearing'), 1, 8) AS BIGINT)
          / 4294967295.0 AS ub,
        CAST('0x' || substr(md5(seed || ':distance'), 1, 8) AS BIGINT)
          / 4294967295.0 AS ud
      FROM loc
    ), prj AS (
      SELECT location_id, lat, lon,
             50.0 + 450.0 * ud AS dist,
             2.0 * pi() * ub AS brg,
             radians(lat) AS lat1, radians(lon) AS lon1,
             (50.0 + 450.0 * ud) / 6371008.8 AS delta
      FROM un
    ), out1 AS (
      SELECT location_id, lat, lon, dist, brg,
             asin(sin(lat1) * cos(delta)
                  + cos(lat1) * sin(delta) * cos(brg)) AS lat2r,
             lon1, delta, lat1
      FROM prj
    )
    SELECT location_id,
           {R('degrees(lat2r)', 6)} AS masked_lat,
           {R('degrees(lon1 + atan2(sin(brg) * sin(delta) * cos(lat1),'
              ' cos(delta) - sin(lat1) * sin(lat2r)))', 6)} AS masked_lon,
           {R('dist', 3)} AS offset_m,
           {R('brg', 6)} AS bearing_rad
    FROM out1
"""


@register("location_masking", oracle=_MASKED_LOC_ORACLE)
def location_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.maintenance import masked_location_points

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    locs = c.select(
        k.alias("location_id"),
        ((k % 140) - 70 + 0.123).alias("lat"),
        ((k % 340) - 170 + 0.456).alias("lon"),
        F.concat(F.lit("loc-"), k.cast("string")).alias("seed"),
    )
    out = masked_location_points(locs, 50.0, 500.0)
    return _round(
        out.select("location_id", "masked_lat", "masked_lon",
                   "offset_m", "bearing_rad"),
        {"masked_lat": 6, "masked_lon": 6, "offset_m": 3, "bearing_rad": 6},
    )


# ---------------------------------------------------------------------------
# Interval non-overlap validator (exclusion-constraint analog,
# patch_23.R:356-379 / patch_55.R:227-255): a borehole-geology-shaped
# batch checked against existing intervals and earlier in-batch rows.
# ---------------------------------------------------------------------------

_NO_OVERLAP_ORACLE = """
    WITH ex AS (
      SELECT o_custkey % 60 AS borehole_id,
             (o_orderkey % 40) * 5.0 AS depth_from_m,
             (o_orderkey % 40) * 5.0 + (o_orderkey % 4 + 1) * 1.5
               AS depth_to_m
      FROM orders WHERE o_orderkey % 7 = 0
    ), batch AS (
      SELECT o_orderkey AS rec_id,
             o_custkey % 60 AS borehole_id,
             (o_orderkey % 45) * 4.5 AS depth_from_m,
             (o_orderkey % 45) * 4.5 + (o_orderkey % 5 + 1) * 1.2
               AS depth_to_m
      FROM orders WHERE o_orderkey % 11 = 3
    ), he AS (
      SELECT DISTINCT b.rec_id FROM batch b JOIN ex e
        ON b.borehole_id = e.borehole_id
       AND b.depth_from_m < e.depth_to_m AND b.depth_to_m > e.depth_from_m
    ), hb AS (
      SELECT DISTINCT b.rec_id FROM batch b JOIN batch b2
        ON b.borehole_id = b2.borehole_id
       AND b.depth_from_m < b2.depth_to_m AND b.depth_to_m > b2.depth_from_m
       AND b2.rec_id < b.rec_id
    )
    SELECT b.rec_id, b.borehole_id, b.depth_from_m, b.depth_to_m,
           CASE WHEN he.rec_id IS NOT NULL THEN 'overlaps_existing'
                WHEN hb.rec_id IS NOT NULL THEN 'overlaps_in_batch'
           END AS reject_reason
    FROM batch b
    LEFT JOIN he ON he.rec_id = b.rec_id
    LEFT JOIN hb ON hb.rec_id = b.rec_id
"""


@register("interval_overlap_validation", oracle=_NO_OVERLAP_ORACLE)
def interval_overlap_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.catalog_admin import validate_no_overlap

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    existing = o.where(k % 7 == 0).select(
        (F.col("o_custkey") % 60).alias("borehole_id"),
        ((k % 40) * 5.0).alias("depth_from_m"),
        ((k % 40) * 5.0 + (k % 4 + 1) * 1.5).alias("depth_to_m"),
    )
    batch = o.where(k % 11 == 3).select(
        k.alias("rec_id"),
        (F.col("o_custkey") % 60).alias("borehole_id"),
        ((k % 45) * 4.5).alias("depth_from_m"),
        ((k % 45) * 4.5 + (k % 5 + 1) * 1.2).alias("depth_to_m"),
    )
    return validate_no_overlap(
        batch, existing, keys=["borehole_id"],
        start_col="depth_from_m", end_col="depth_to_m", order_col="rec_id",
    )


# ---------------------------------------------------------------------------
# Compound metadata rollup (patch_41.R:684-806 + patch_53.R:306-318):
# union bounds for coalesce compounds, intersection (all-members-valid)
# for expression compounds, fastest member record rate — two nested
# levels resolved level by level.
# ---------------------------------------------------------------------------

_COMPOUND_META_ORACLE = """
    WITH m AS (
      SELECT CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                  WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4
                  ELSE 5 END AS tsid,
             CAST(ts AS TIMESTAMP) AS ts
      FROM events
    ), b AS (
      SELECT tsid, min(ts) AS s, max(ts) AS e,
             CAST(tsid * 300 AS DOUBLE) AS rr
      FROM m GROUP BY tsid
    ), mem(cid, mid, uf, ut) AS (
      VALUES
        (6, 1, TIMESTAMP '2024-01-05 00:00:00', CAST(NULL AS TIMESTAMP)),
        (6, 2, CAST(NULL AS TIMESTAMP), TIMESTAMP '2024-01-20 00:00:00'),
        (7, 3, CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP)),
        (7, 4, TIMESTAMP '2024-01-10 00:00:00', CAST(NULL AS TIMESTAMP)),
        (8, 6, CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP)),
        (8, 5, CAST(NULL AS TIMESTAMP), TIMESTAMP '2024-01-15 00:00:00')
    ), eff1 AS (
      SELECT mem.cid,
        CASE WHEN b.s IS NULL THEN NULL
             WHEN mem.uf IS NULL THEN b.s
             ELSE greatest(b.s, mem.uf) END AS es,
        CASE WHEN b.e IS NULL THEN NULL
             WHEN mem.ut IS NULL THEN b.e
             ELSE least(b.e, mem.ut) END AS ee,
        b.rr
      FROM mem JOIN b ON b.tsid = mem.mid WHERE mem.cid IN (6, 7)
    ), agg1 AS (
      SELECT cid, count(*) AS n,
        count(*) FILTER (es IS NOT NULL AND ee IS NOT NULL AND ee >= es)
          AS nv,
        min(es) FILTER (es IS NOT NULL AND ee IS NOT NULL AND ee >= es)
          AS u_s,
        max(ee) FILTER (es IS NOT NULL AND ee IS NOT NULL AND ee >= es)
          AS u_e,
        max(es) FILTER (es IS NOT NULL AND ee IS NOT NULL AND ee >= es)
          AS i_s,
        min(ee) FILTER (es IS NOT NULL AND ee IS NOT NULL AND ee >= es)
          AS i_e,
        min(rr) AS rr
      FROM eff1 GROUP BY cid
    ), lvl1 AS (
      SELECT cid AS timeseries_id,
        CASE WHEN cid = 7
             THEN CASE WHEN n > 0 AND nv = n AND i_s <= i_e THEN i_s END
             ELSE u_s END AS start_datetime,
        CASE WHEN cid = 7
             THEN CASE WHEN n > 0 AND nv = n AND i_s <= i_e THEN i_e END
             ELSE u_e END AS end_datetime,
        rr AS record_rate_seconds
      FROM agg1
    ), src2 AS (
      SELECT tsid, s, e, rr FROM b
      UNION ALL
      SELECT timeseries_id, start_datetime, end_datetime,
             record_rate_seconds
      FROM lvl1
    ), eff2 AS (
      SELECT mem.cid,
        CASE WHEN src2.s IS NULL THEN NULL
             WHEN mem.uf IS NULL THEN src2.s
             ELSE greatest(src2.s, mem.uf) END AS es,
        CASE WHEN src2.e IS NULL THEN NULL
             WHEN mem.ut IS NULL THEN src2.e
             ELSE least(src2.e, mem.ut) END AS ee,
        src2.rr
      FROM mem JOIN src2 ON src2.tsid = mem.mid WHERE mem.cid = 8
    ), lvl2 AS (
      SELECT cid AS timeseries_id,
        min(es) FILTER (es IS NOT NULL AND ee IS NOT NULL AND ee >= es)
          AS start_datetime,
        max(ee) FILTER (es IS NOT NULL AND ee IS NOT NULL AND ee >= es)
          AS end_datetime,
        min(rr) AS record_rate_seconds
      FROM eff2 GROUP BY cid
    )
    SELECT * FROM lvl1 UNION ALL SELECT * FROM lvl2
"""


@register("compound_metadata_rollup", oracle=_COMPOUND_META_ORACLE)
def compound_metadata_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.compound import compound_metadata_rollup

    ev = _t(spark, sf_dir, "events")
    tsid = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "purchase", 3)
        .when(F.col("event_type") == "signup", 4)
        .otherwise(5)
    )
    basics = ev.select(tsid.alias("timeseries_id"), "ts").groupBy(
        "timeseries_id"
    ).agg(
        F.min("ts").alias("start_datetime"),
        F.max("ts").alias("end_datetime"),
        (F.col("timeseries_id") * 300.0).alias("record_rate_seconds"),
    )
    import datetime as _dt

    T = _dt.datetime
    members = _ldf(spark, 
        [
            (6, 1, T(2024, 1, 5), None),
            (6, 2, None, T(2024, 1, 20)),
            (7, 3, None, None),
            (7, 4, T(2024, 1, 10), None),
            (8, 6, None, None),
            (8, 5, None, T(2024, 1, 15)),
        ],
        "timeseries_id int, member_timeseries_id int,"
        " use_from timestamp, use_to timestamp",
    )
    has_expr = _ldf(spark, 
        [(6, False), (7, True), (8, False)],
        "timeseries_id int, has_expression boolean",
    )
    return compound_metadata_rollup(basics, members, has_expr)


# ---------------------------------------------------------------------------
# audit.jsonb_changed_fields (patch_37.R:2759-2773): the row-image diff
# at the heart of the audit triggers — keys of the new image whose
# value IS DISTINCT FROM the old image's. Old/new JSON images derive
# from orders on both engines; map_filter keeps it map-only.
# ---------------------------------------------------------------------------

_CHANGED_FIELDS_ORACLE = """
    WITH imgs AS (
      SELECT o_orderkey AS row_id,
             json_object(
               'value', CAST((o_orderkey % 50) * 0.5 AS VARCHAR),
               'grade', CASE o_orderkey % 3 WHEN 0 THEN 'A' ELSE 'B' END,
               'approval', 'APP') AS old_row,
             json_object(
               'value', CAST(
                 CASE WHEN o_orderkey % 4 = 0
                      THEN (o_orderkey % 50) * 0.5 + 1
                      ELSE (o_orderkey % 50) * 0.5 END AS VARCHAR),
               'grade', CASE o_orderkey % 2 WHEN 0 THEN 'A' ELSE 'B' END,
               'approval', 'APP',
               'qualifier', CASE WHEN o_orderkey % 5 = 0 THEN 'EST' END
             ) AS new_row
      FROM orders WHERE o_orderkey % 13 = 1
    )
    SELECT row_id,
           COALESCE(array_to_string(list_sort(list_filter(
             json_keys(new_row),
             k -> json_extract_string(old_row, '$.' || k)
                  IS DISTINCT FROM json_extract_string(new_row, '$.' || k)
           )), ','), '') AS changed_fields
    FROM imgs
"""


@register("audit_changed_fields", oracle=_CHANGED_FIELDS_ORACLE)
def audit_changed_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import bind

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    old_row = F.to_json(F.struct(
        ((k % 50) * 0.5).cast("string").alias("value"),
        F.when(k % 3 == 0, "A").otherwise("B").alias("grade"),
        F.lit("APP").alias("approval"),
    ))
    new_row = F.to_json(F.struct(
        F.when(k % 4 == 0, (k % 50) * 0.5 + 1).otherwise((k % 50) * 0.5)
        .cast("string").alias("value"),
        F.when(k % 2 == 0, "A").otherwise("B").alias("grade"),
        F.lit("APP").alias("approval"),
        F.when(k % 5 == 0, "EST").alias("qualifier"),
    ))
    imgs = o.where(k % 13 == 1).select(
        k.alias("row_id"), old_row.alias("old_row"), new_row.alias("new_row"))
    om = F.from_json(F.col("old_row"), "map<string,string>")
    nm = F.from_json(F.col("new_row"), "map<string,string>")

    def diff(o_map: F.Column) -> F.Column:
        def inner(n_map: F.Column) -> F.Column:
            return F.concat_ws(",", F.array_sort(F.map_keys(F.map_filter(
                n_map,
                lambda kk, vv: ~F.element_at(o_map, kk).eqNullSafe(vv),
            ))))
        return bind(nm, inner)

    return imgs.select("row_id", bind(om, diff).alias("changed_fields"))


# ---------------------------------------------------------------------------
# Training-data CAPSTONE v2 — the full modern curation gate: heuristic
# quality AND Gopher repetition rules AND benchmark decontamination
# (eval docs excluded, contaminated train docs dropped), then near-dup
# clusters -> one representative -> cluster-safe split -> per-split
# budgets. Every constituent is individually ⊕; this pins the composed
# ordering with 1e-6-rounded threshold compares on both engines.
# ---------------------------------------------------------------------------

_FULL_GATE_ORACLE = _COMP_SQL + f"""
    , qual AS ({_CURATION_QUALITY_SQL})
    , rtoks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ), rb AS (
      SELECT doc_id, toks,
             list_transform(range(0, len(toks) - 1),
               i -> concat_ws(' ', toks[i+1], toks[i+2])) AS bigrams,
             list_transform(range(0, len(toks) - 2),
               i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]))
               AS trigrams
      FROM rtoks
    ), rtb AS (
      SELECT doc_id, max(c) AS top_big FROM (
        SELECT doc_id, count(*) AS c
        FROM (SELECT doc_id, unnest(bigrams) AS x FROM rb)
        GROUP BY doc_id, x
      ) GROUP BY doc_id
    ), rep AS (
      SELECT rb.doc_id,
        floor(CAST(len(list_distinct(toks)) AS DOUBLE)
              / greatest(len(toks), 1) * 1000000 + 0.5) / 1000000 AS utr,
        floor(CAST(rtb.top_big AS DOUBLE)
              / greatest(len(bigrams), 1) * 1000000 + 0.5) / 1000000 AS tbf,
        floor((1.0 - CAST(len(list_distinct(trigrams)) AS DOUBLE)
               / greatest(len(trigrams), 1)) * 1000000 + 0.5) / 1000000
          AS dtf
      FROM rb JOIN rtb USING (doc_id)
    ), dsh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(0, len(toks) - 4),
        i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3], toks[i+4],
                       toks[i+5])))) AS sh5
      FROM rtoks
    ), evsh AS (
      SELECT DISTINCT sh5 FROM dsh WHERE doc_id % 19 = 3
    ), dhits AS (
      SELECT d.doc_id, count(*) AS n
      FROM dsh d JOIN evsh USING (sh5)
      WHERE d.doc_id % 19 != 3 GROUP BY 1
    ), gate AS (
      SELECT q.doc_id, q.bpe_tokens, c.cluster_rep
      FROM qual q
      JOIN comp c ON c.node = q.doc_id
      JOIN rep r ON r.doc_id = q.doc_id
      LEFT JOIN dhits h ON h.doc_id = q.doc_id
      WHERE q.doc_id % 19 != 3
        AND q.q >= 0.7
        AND r.utr >= 0.2 AND r.tbf <= 0.2 AND r.dtf <= 0.6
        AND COALESCE(h.n, 0) < 8
    ), reps2 AS (
      SELECT *, min(doc_id) OVER (PARTITION BY cluster_rep) AS surv
      FROM gate
    ), uniq2 AS (
      SELECT doc_id, bpe_tokens, cluster_rep,
             CAST('0x' || substr(md5(CAST(cluster_rep AS VARCHAR)
                                     || '|split-v1'), 1, 8) AS BIGINT)
               % 100 AS bucket
      FROM reps2 WHERE doc_id = surv
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(count(DISTINCT cluster_rep) AS BIGINT) AS n_clusters,
           CAST(sum(bpe_tokens) AS BIGINT) AS total_tokens
    FROM uniq2 GROUP BY 1
"""


@register("curation_full_gate", oracle=_FULL_GATE_ORACLE)
def curation_full_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import (
        bpe_token_count, quality_score, tokens, top_count, word_ngrams,
    )
    from .operators.dedup import (
        contamination_overlap, duplicate_clusters, lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, num_hashes=8, shingle_k=3)
    pairs = lsh_candidate_pairs(sig, num_hashes=8, bands=4)
    clusters = duplicate_clusters(pairs, docs.select("doc_id"))

    def r6(c):
        return F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0

    t = F.col("text")
    toks = tokens(F.lower(t))
    n = F.greatest(F.size(toks), F.lit(1))
    big = word_ngrams(t, 2)
    tri = word_ngrams(t, 3)
    metrics = docs.select(
        "doc_id",
        r6(quality_score(t)).alias("q"),
        bpe_token_count(t).alias("bpe_tokens"),
        r6(F.size(F.array_distinct(toks)) / n).alias("utr"),
        r6(top_count(big) / F.greatest(F.size(big), F.lit(1))).alias("tbf"),
        r6(1.0 - F.size(F.array_distinct(tri))
           / F.greatest(F.size(tri), F.lit(1))).alias("dtf"),
    )
    evalset = docs.where(F.col("doc_id") % 19 == 3)
    train = docs.where(F.col("doc_id") % 19 != 3)
    clean = contamination_overlap(train, evalset, ngram_k=5, threshold=8) \
        .where(~F.col("contaminated")).select("doc_id")
    kept = (
        metrics.where(F.col("doc_id") % 19 != 3)  # eval docs never train
        .where((F.col("q") >= 0.7) & (F.col("utr") >= 0.2)
               & (F.col("tbf") <= 0.2) & (F.col("dtf") <= 0.6))
        .join(clean, "doc_id", "left_semi")
        .join(clusters.select("doc_id", "cluster_rep"), "doc_id")
    )
    surv = F.min("doc_id").over(Window.partitionBy("cluster_rep"))
    uniq = (
        kept.withColumn("__surv", surv)
        .where(F.col("doc_id") == F.col("__surv"))
        .withColumn("bucket", _split_bucket(F.col("cluster_rep")))
    )
    return uniq.groupBy(
        F.when(F.col("bucket") < 90, "train")
        .when(F.col("bucket") < 95, "val")
        .otherwise("test").alias("split")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster_rep").cast("long").alias("n_clusters"),
        F.sum("bpe_tokens").cast("long").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# REAL image decode end to end: deterministic BMPs are written with the
# actual 24-bit encoder, then the actual parser extracts dimensions and
# per-channel means inside an Arrow mapInPandas stage; the oracle
# averages the same pixel closed form without parsing. (The generic
# decoder hook stays stubbed for codec-library formats.)
# ---------------------------------------------------------------------------

_BMP_ORACLE = f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id % 3 = 1
    ), grid AS (
      SELECT r, c
      FROM (SELECT unnest(range(0, 8)) AS r), (SELECT unnest(range(0, 8)) AS c)
    ), px AS (
      SELECT media_id,
             (media_id * 7 + r * 16 + c) % 256 AS pr,
             (media_id * 11 + r * 5 + c * 3) % 256 AS pg,
             (media_id * 13 + r * 2 + c * 7) % 256 AS pb
      FROM ids CROSS JOIN grid
    )
    SELECT media_id, TRUE AS decoded,
           CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
           {R('avg(pr)', 6)} AS mean_r,
           {R('avg(pg)', 6)} AS mean_g,
           {R('avg(pb)', 6)} AS mean_b
    FROM px GROUP BY media_id
"""


# writeRaster's BINARY path (R/writeRaster.R:330-361): tiles -> real
# PostGIS raster WKB (raster2pgsql wire format, functions/pgraster.py)
# -> decode back -> per-tile stats. The oracle recomputes the stats
# and the deterministic WKB geometry (fixed header + 64BF band ->
# 2118 bytes per 16x16 tile) straight from the cell grid, so the
# binary encode/decode pair surviving value-exact is hash-checked.
_PGRASTER_ORACLE = f"""
    WITH cells AS ({_RASTER_CELLS_SQL}),
    tiled AS (
      SELECT CAST(floor(x / 16) AS INT) AS tile_x,
             CAST(floor(y / 16) AS INT) AS tile_y,
             value
      FROM cells
    )
    SELECT tile_x, tile_y,
           CAST(61 + 9 + 16 * 16 * 8 AS BIGINT) AS wkb_bytes,
           {R('200.0 + tile_x * 16 * 0.25', 6)} AS ip_x,
           {R('65.0 - tile_y * 16 * 0.25', 6)} AS ip_y,
           count(value) AS n_cells,
           {R(DSUM('value') + ' / count(value)', 6)} AS vmean
    FROM tiled GROUP BY 1, 2
"""


@register("pgraster_wkb_export", oracle=_PGRASTER_ORACLE)
def pgraster_wkb_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.pgraster import decode_pgraster
    from .operators.raster import export_pgraster, tile_cells

    cells = _raster_cells(spark, sf_dir)
    tiles = tile_cells(cells, tile=16)
    exp = export_pgraster(tiles, origin_x=200.0, origin_y=65.0,
                          scale_x=0.25, scale_y=-0.25)

    def kernel(batches):
        import math as _math

        import pandas as pd

        for pdf in batches:
            rows = []
            for tx, ty, wkb in zip(pdf["tile_x"], pdf["tile_y"],
                                   pdf["wkb"]):
                d = decode_pgraster(bytes(wkb))
                present = [v for v in d["values"] if v is not None]
                vsum = sum(
                    int(_math.floor(v * 1e6 + 0.5)) for v in present)
                rows.append((int(tx), int(ty), len(wkb), d["ip_x"],
                             d["ip_y"], len(present),
                             vsum / 1e6 / len(present)))
            yield pd.DataFrame(rows, columns=[
                "tile_x", "tile_y", "wkb_bytes", "ip_x", "ip_y",
                "n_cells", "vmean"])

    out = exp.select("tile_x", "tile_y", "wkb").mapInPandas(
        kernel,
        schema=("tile_x int, tile_y int, wkb_bytes bigint, "
                "ip_x double, ip_y double, n_cells bigint, "
                "vmean double"))
    return _round(out, {"ip_x": 6, "ip_y": 6, "vmean": 6})


@register("bmp_decode_features", oracle=_BMP_ORACLE)
def bmp_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import extract_bmp_features, synthesize_bmps

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").alias("media_id"))
    bmps = synthesize_bmps(ids, width=8, height=8)
    out = extract_bmp_features(bmps)
    return _round(
        out.select("media_id", "decoded", F.col("width").cast("int"),
                   F.col("height").cast("int"), "mean_r", "mean_g", "mean_b"),
        {"mean_r": 6, "mean_g": 6, "mean_b": 6},
    )


# PNG sibling: same closed-form pixels, different id slice; the bytes
# under decode are genuine deflate streams with cycling row filters
# (every unfilter path: None/Sub/Up/Average/Paeth), so inflation,
# CRC checking, and filter reconstruction are all differentially
# verified (operators/multimodal.py:decode_png).
_PNG_ORACLE = f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id % 3 = 2
    ), grid AS (
      SELECT r, c
      FROM (SELECT unnest(range(0, 8)) AS r), (SELECT unnest(range(0, 8)) AS c)
    ), px AS (
      SELECT media_id,
             (media_id * 7 + r * 16 + c) % 256 AS pr,
             (media_id * 11 + r * 5 + c * 3) % 256 AS pg,
             (media_id * 13 + r * 2 + c * 7) % 256 AS pb
      FROM ids CROSS JOIN grid
    )
    SELECT media_id, TRUE AS decoded,
           CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
           {R('avg(pr)', 6)} AS mean_r,
           {R('avg(pg)', 6)} AS mean_g,
           {R('avg(pb)', 6)} AS mean_b
    FROM px GROUP BY media_id
"""


# JPEG tier: real baseline decode (Huffman entropy decode, dequant,
# batch IDCT, color convert — functions/jpeg.py) under the features.
# Fixtures are quality-100 block-constant grayscale, the regime where
# the baseline round trip is bit-exact, so the oracle averages the
# closed-form block values directly; any drift anywhere in the codec
# (zigzag, Huffman table build, predictor, IDCT scaling) breaks the
# hash.
_JPEG_ORACLE = f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id % 4 = 2
    ), blocks AS (
      SELECT media_id, b,
             (media_id * 7 + b * 37) % 200 + 28 AS v
      FROM ids, (SELECT unnest(range(0, 4)) AS b)
    )
    SELECT media_id, TRUE AS decoded,
           CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
           {R('avg(v)', 6)} AS mean_r,
           {R('avg(v)', 6)} AS mean_g,
           {R('avg(v)', 6)} AS mean_b
    FROM blocks GROUP BY media_id
"""


@register("jpeg_decode_features", oracle=_JPEG_ORACLE)
def jpeg_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import (extract_jpeg_features,
                                       synthesize_jpegs)

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 4 == 2).select(
        F.col("doc_id").alias("media_id"))
    jpegs = synthesize_jpegs(ids)
    out = extract_jpeg_features(jpegs)
    return _round(
        out.select("media_id", "decoded", F.col("width").cast("int"),
                   F.col("height").cast("int"), "mean_r", "mean_g",
                   "mean_b"),
        {"mean_r": 6, "mean_g": 6, "mean_b": 6},
    )


# Progressive sibling: the fixtures are multi-scan SOF2 streams
# (spectral selection bands 1-5/6-63, DC+AC successive approximation,
# EOB runs — functions/jpeg.py:encode_jpeg_progressive), so the full
# progressive decode path (_ac_first_block/_ac_refine_block, DC
# refinement) is differentially verified, not just unit-tested.
_JPEG_PROG_ORACLE = f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id % 4 = 1
    ), blocks AS (
      SELECT media_id, b,
             (media_id * 9 + b * 31) % 200 + 30 AS v
      FROM ids, (SELECT unnest(range(0, 4)) AS b)
    )
    SELECT media_id, TRUE AS decoded,
           CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
           {R('avg(v)', 6)} AS mean_r,
           {R('avg(v)', 6)} AS mean_g,
           {R('avg(v)', 6)} AS mean_b
    FROM blocks GROUP BY media_id
"""


@register("jpeg_progressive_features", oracle=_JPEG_PROG_ORACLE)
def jpeg_progressive_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import (extract_jpeg_features,
                                       synthesize_progressive_jpegs)

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 4 == 1).select(
        F.col("doc_id").alias("media_id"))
    jpegs = synthesize_progressive_jpegs(ids)
    out = extract_jpeg_features(jpegs)
    return _round(
        out.select("media_id", "decoded", F.col("width").cast("int"),
                   F.col("height").cast("int"), "mean_r", "mean_g",
                   "mean_b"),
        {"mean_r": 6, "mean_g": 6, "mean_b": 6},
    )


# VIDEO tier: MJPEG-in-AVI container walk + frame sampling + per-frame
# baseline JPEG decode (functions/avi.py + functions/jpeg.py). Every
# sampled frame runs the full entropy-decode/IDCT pipeline in the
# bit-exact q100 regime; unsampled payloads are never decoded.
_VIDEO_ORACLE = f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id % 5 = 3
    ), cells AS (
      SELECT media_id, f, b,
             (media_id * 7 + f * 11 + b * 37) % 200 + 28 AS v
      FROM ids,
           (SELECT unnest([0, 2, 4]) AS f),
           (SELECT unnest(range(0, 4)) AS b)
    )
    SELECT media_id, TRUE AS decoded,
           CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
           CAST(10 AS INT) AS fps,
           CAST(6 AS BIGINT) AS n_frames,
           CAST(3 AS BIGINT) AS n_sampled,
           {R('avg(v)', 6)} AS mean_luma
    FROM cells GROUP BY media_id
"""


@register("video_frame_features", oracle=_VIDEO_ORACLE)
def video_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import (extract_video_features,
                                       synthesize_avis)

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 5 == 3).select(
        F.col("doc_id").alias("media_id"))
    avis = synthesize_avis(ids, n_frames=6, fps=10)
    out = extract_video_features(avis, sample_every=2)
    return _round(
        out.select("media_id", "decoded", "width", "height", "fps",
                   "n_frames", "n_sampled", "mean_luma"),
        {"mean_luma": 6},
    )


# WAV sibling for the AUDIO tier: real RIFF/PCM decode under the
# features; integer closed-form samples make every aggregate exact on
# both sides (sum and sum-of-squares stay in int64 range).
_WAV_ORACLE = f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id % 4 = 1
    ), grid AS (
      SELECT unnest(range(0, 256)) AS k
    ), s AS (
      SELECT media_id, k,
             ((media_id * 37 + k * 101) % 4001) - 2000 AS samp
      FROM ids CROSS JOIN grid
    ), lagged AS (
      SELECT media_id, k, samp,
             lag(samp) OVER (PARTITION BY media_id ORDER BY k) AS prev
      FROM s
    ), zc AS (
      SELECT media_id,
             sum(CASE WHEN prev IS NOT NULL
                       AND ((samp >= 0) <> (prev >= 0))
                 THEN 1 ELSE 0 END) AS zero_crossings
      FROM lagged GROUP BY 1
    ), agg AS (
      SELECT media_id,
             sum(samp) AS ssum, sum(samp * samp) AS ssq,
             max(abs(samp)) AS peak
      FROM s GROUP BY 1
    )
    SELECT a.media_id, TRUE AS decoded,
           CAST(8000 AS INT) AS sample_rate,
           CAST(256 AS BIGINT) AS n_frames,
           {R('256.0 / 8000', 6)} AS duration_s,
           {R('a.ssum / 256.0', 6)} AS mean_amp,
           {R('sqrt(a.ssq / 256.0)', 6)} AS rms,
           CAST(a.peak AS INT) AS peak,
           CAST(z.zero_crossings AS BIGINT) AS zero_crossings
    FROM agg a JOIN zc z USING (media_id)
"""


@register("wav_decode_features", oracle=_WAV_ORACLE)
def wav_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import extract_wav_features, synthesize_wavs

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 4 == 1).select(
        F.col("doc_id").alias("media_id"))
    wavs = synthesize_wavs(ids, n_samples=256, sample_rate=8000)
    out = extract_wav_features(wavs)
    return _round(
        out.select("media_id", "decoded", "sample_rate", "n_frames",
                   "duration_s", "mean_amp", "rms", "peak",
                   "zero_crossings"),
        {"duration_s": 6, "mean_amp": 6, "rms": 6},
    )


@register("png_decode_features", oracle=_PNG_ORACLE)
def png_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import extract_png_features, synthesize_pngs

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").alias("media_id"))
    pngs = synthesize_pngs(ids, width=8, height=8)
    out = extract_png_features(pngs)
    return _round(
        out.select("media_id", "decoded", F.col("width").cast("int"),
                   F.col("height").cast("int"), "mean_r", "mean_g", "mean_b"),
        {"mean_r": 6, "mean_g": 6, "mean_b": 6},
    )


# ---------------------------------------------------------------------------
# The DAILY read API end to end (§2.13): corrected read (offset window)
# -> unusable-grade-N interval exclusion -> exact-mean daily rollup ->
# DOY historical stats + percent_historic_range, all through one
# measurements_calculated_daily call over a multi-year orders-derived
# store — the refresh ladder as the USER-facing read, hash-matched.
# ---------------------------------------------------------------------------

_API_DAILY_ORACLE = f"""
    WITH meas AS (
      SELECT 1 AS timeseries_id,
             CAST(o_orderdate AS TIMESTAMP)
               + to_hours(CAST(o_orderkey % 24 AS INT)) AS datetime,
             (o_orderkey % 1000) * 0.1 AS value
      FROM orders
    ), corrected AS (
      SELECT timeseries_id, datetime,
             CASE WHEN datetime >= TIMESTAMP '1995-01-01 00:00:00'
                       AND datetime < TIMESTAMP '1996-01-01 00:00:00'
                  THEN value + 0.5 ELSE value END AS cv
      FROM meas
    ), kept AS (
      SELECT * FROM corrected
      WHERE NOT (datetime BETWEEN TIMESTAMP '1996-03-01 00:00:00'
                              AND TIMESTAMP '1996-04-15 00:00:00')
    ), daily AS (
      SELECT timeseries_id, CAST(datetime AS DATE) AS date,
             {DSUM('cv')} / count(cv) AS value
      FROM kept GROUP BY 1, 2
    ), dd AS (
      SELECT *,
             CAST(CASE
               WHEN month(date) = 2 AND day(date) = 29 THEN NULL
               WHEN (year(date) % 4 = 0
                     AND (year(date) % 100 <> 0 OR year(date) % 400 = 0))
                    AND dayofyear(date) > 60 THEN dayofyear(date) - 1
               ELSE dayofyear(date) END AS INTEGER) AS doy
      FROM daily
    ), joined AS (
      SELECT t.timeseries_id, t.date, t.value, t.doy,
             count(h.value) AS doy_count,
             min(h.value) AS hist_min,
             max(h.value) AS hist_max,
             sum(CAST(floor(h.value * 1000000 + 0.5) AS BIGINT))
               / 1000000.0 / count(h.value) AS hist_mean,
             quantile_cont(h.value, 0.10) AS q10,
             quantile_cont(h.value, 0.25) AS q25,
             quantile_cont(h.value, 0.50) AS q50,
             quantile_cont(h.value, 0.75) AS q75,
             quantile_cont(h.value, 0.90) AS q90
      FROM dd t
      LEFT JOIN dd h ON t.doy = h.doy AND h.date < t.date
      GROUP BY t.timeseries_id, t.date, t.value, t.doy
    )
    SELECT timeseries_id, date, {R('value', 4)} AS value, doy, doy_count,
           {R('hist_min', 4)} AS hist_min, {R('hist_max', 4)} AS hist_max,
           {R('hist_mean', 4)} AS hist_mean,
           {R('q10', 4)} AS q10, {R('q25', 4)} AS q25, {R('q50', 4)} AS q50,
           {R('q75', 4)} AS q75, {R('q90', 4)} AS q90,
           {R('CASE WHEN doy_count > 1 AND doy IS NOT NULL '
              'THEN (value - hist_min) / nullif(hist_max - hist_min, 0)'
              ' * 100.0 END', 4)} AS percent_historic_range
    FROM joined
"""


@register("api_daily_read", oracle=_API_DAILY_ORACLE)
def api_daily_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .api import measurements_calculated_daily
    from .fixtures import FixtureStore
    from .operators.corrections import Correction

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    meas = o.select(
        F.lit(1).alias("timeseries_id"),
        (F.col("o_orderdate").cast("timestamp")
         + (k % 24).cast("int") * F.expr("INTERVAL 1 HOUR")).alias("datetime"),
        ((k % 1000) * 0.1).alias("value"),
    )
    timeseries = _ldf(spark, 
        [(1, "basic", "mean")],
        "timeseries_id int, timeseries_type string, aggregation_type string",
    )
    grades = _ldf(spark, 
        [
            (1, "N", "1996-03-01 00:00:00", "1996-04-15 00:00:00"),
            (1, "N", "1997-01-01 00:00:00", "1997-01-01 00:00:00"),  # zero-width
            (1, "A", "1994-01-01 00:00:00", "1999-01-01 00:00:00"),
        ],
        "timeseries_id int, grade_code string, start_dt string, end_dt string",
    ).select(
        "timeseries_id", "grade_code",
        F.col("start_dt").cast("timestamp").alias("start_dt"),
        F.col("end_dt").cast("timestamp").alias("end_dt"),
    )
    store = FixtureStore(
        timeseries=timeseries, measurements=meas,
        corrections=[Correction(1, 1, "1995-01-01 00:00:00",
                                "1996-01-01 00:00:00", "offset_linear",
                                value1=0.5)],
        grades=grades,
    )
    out = measurements_calculated_daily(store, 1)
    return _round(
        out,
        {"value": 4, "hist_min": 4, "hist_max": 4, "hist_mean": 4,
         "q10": 4, "q25": 4, "q50": 4, "q75": 4, "q90": 4,
         "percent_historic_range": 4},
    )


# ---------------------------------------------------------------------------
# Hardness-dependent guideline end to end (patch_51.R:1780-1905 +
# safe_expr): per-sample hardness from the Ca/Mg/CaCO3 fallback ladder
# feeds the CCME-shaped exp/ln guideline expression through the §2.10
# safety gate, with an output cap and rounding.
# ---------------------------------------------------------------------------

_HARDNESS_ORACLE = f"""
    WITH res AS (
      SELECT o_custkey % 150 AS sample_id,
             CASE o_orderkey % 6 WHEN 0 THEN 1 WHEN 1 THEN 2
                  WHEN 2 THEN 3 ELSE 4 END AS parameter_id,
             CASE o_orderkey % 4 WHEN 0 THEN 10 ELSE 11 END
               AS sample_fraction_id,
             CASE WHEN o_orderkey % 5 = 0 THEN 20
                  ELSE CAST(o_orderkey % 3 AS INT) END
               AS result_speciation_id,
             (o_orderkey % 90) * 1.5 + 4.0 AS result
      FROM orders WHERE o_orderkey % 7 != 0
    ), agg AS (
      SELECT sample_id,
        max(result) FILTER (parameter_id = 1 AND sample_fraction_id = 10)
          AS ca_d,
        max(result) FILTER (parameter_id = 2 AND sample_fraction_id = 10)
          AS mg_d,
        max(result) FILTER (parameter_id = 3 AND sample_fraction_id = 10
                            AND result_speciation_id = 20) AS h_d_caco3,
        max(result) FILTER (parameter_id = 3 AND sample_fraction_id = 10)
          AS h_d_any,
        max(result) FILTER (parameter_id = 1 AND sample_fraction_id = 11)
          AS ca_t,
        max(result) FILTER (parameter_id = 2 AND sample_fraction_id = 11)
          AS mg_t,
        max(result) FILTER (parameter_id = 3 AND sample_fraction_id = 11
                            AND result_speciation_id = 20) AS h_t_caco3,
        max(result) FILTER (parameter_id = 3 AND sample_fraction_id = 11)
          AS h_t_any
      FROM res GROUP BY 1
    ), hard AS (
      SELECT sample_id, CASE
        WHEN ca_d > 0 AND mg_d > 0 THEN 2.497 * ca_d + 4.118 * mg_d
        WHEN h_d_caco3 > 0 THEN h_d_caco3
        WHEN h_d_any > 0 THEN h_d_any
        WHEN ca_t > 0 AND mg_t > 0 THEN 2.497 * ca_t + 4.118 * mg_t
        WHEN h_t_caco3 > 0 THEN h_t_caco3
        WHEN h_t_any > 0 THEN h_t_any END AS hardness
      FROM agg
    ), ev AS (
      SELECT sample_id, hardness,
             CASE WHEN hardness IS NOT NULL
                  THEN least(exp(0.736 * ln(hardness) + 0.6951), 150.0)
             END AS raw
      FROM hard
    )
    SELECT sample_id, {R('hardness', 4)} AS hardness,
           CASE WHEN raw IS NULL THEN NULL
                ELSE floor(raw * 100 + 0.5) / 100 END AS guideline_value,
           CASE WHEN raw IS NULL THEN 'no_value' ELSE 'value' END
             AS output_status
    FROM ev
"""


@register("hardness_guideline", oracle=_HARDNESS_ORACLE)
def hardness_guideline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.guidelines import (
        evaluate_guideline_rules, sample_hardness,
    )

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    res = o.where(k % 7 != 0).select(
        (F.col("o_custkey") % 150).alias("sample_id"),
        F.when(k % 6 == 0, 1).when(k % 6 == 1, 2).when(k % 6 == 2, 3)
        .otherwise(4).alias("parameter_id"),
        F.when(k % 4 == 0, 10).otherwise(11).alias("sample_fraction_id"),
        F.when(k % 5 == 0, 20).otherwise((k % 3).cast("int"))
        .alias("result_speciation_id"),
        ((k % 90) * 1.5 + 4.0).alias("result"),
    )
    hard = sample_hardness(res, calcium_pid=1, magnesium_pid=2,
                           hardness_pid=3, dissolved_fid=10, total_fid=11,
                           caco3_sid=20)
    iv = hard.select("sample_id", F.lit(None).cast("int").alias("input_id"),
                     F.lit(None).cast("double").alias("input_value"),
                     F.lit(None).cast("string").alias("status"))
    rules = _ldf(spark, 
        [(1, 1, "upper", 1, "safe_expr", None, None, None, None,
          "exp(0.736 * ln(hardness) + 0.6951)", None, 150.0, 2, "round")],
        "rule_id int, guideline_id int, bound_code string,"
        " rule_priority int, algorithm_code string, fixed_value double,"
        " input_id int, intercept double, slope double,"
        " formula_expr string, min_output_value double,"
        " max_output_value double, rounding_digits int,"
        " rounding_method string",
    )
    ev = evaluate_guideline_rules(rules, iv, hard)
    out = ev.join(hard, "sample_id").select(
        "sample_id", "hardness", "guideline_value", "output_status")
    return _round(out, {"hardness": 4})


# ---------------------------------------------------------------------------
# §2.1 downloadEQWin end to end on canned Access-export fixtures
# (R/downloadEQWin.R:43-742): result parsing with detection-limit
# conditions, conversion+offset, the SampleClass/blank-wording sample
# type ladder, station-type defaults, unknown-time datetimes -> UTC,
# required fraction/speciation drops, ordered-unique note collapse,
# result-less sample drops.
# ---------------------------------------------------------------------------

_EQ_TYPES = {"sample-routine": 1, "QC-sample-field replicate": 3,
             "QC-sample-field blank": 4, "QC-sample-trip blank": 5,
             "QC-sample-lab blank": 6, "sample-other": 7, "unknown": 8}
_EQ_MEDIA = {"surface water": 1, "groundwater": 2}
_EQ_COLLECT = {"Water Bottle (direct fill)": 27, "Pump": 14}

_EQWIN_ORACLE = f"""
    WITH stations AS (
      SELECT * FROM read_csv('{_FIXDIR / "eqwin_stations.csv"}',
                             header=true, all_varchar=true)
    ), samples0 AS (
      SELECT * FROM read_csv('{_FIXDIR / "eqwin_samples.csv"}',
                             header=true, all_varchar=true)
    ), results0 AS (
      SELECT * FROM read_csv('{_FIXDIR / "eqwin_results.csv"}',
                             header=true, all_varchar=true)
    ), mapping AS (
      SELECT input_param, input_unit,
             CAST(parameter_id AS BIGINT) AS parameter_id,
             TRY_CAST(conversion AS DOUBLE) AS conversion,
             TRY_CAST(result_offset AS DOUBLE) AS result_offset,
             CAST(result_type AS BIGINT) AS result_type,
             TRY_CAST(sample_fraction_id AS BIGINT) AS sample_fraction_id,
             TRY_CAST(result_speciation_id AS BIGINT) AS result_speciation_id,
             CAST(matrix_state_id AS BIGINT) AS matrix_state_id
      FROM read_csv('{_FIXDIR / "eqwin_mapping.csv"}', header=true,
                    all_varchar=true)
    ), params AS (
      SELECT CAST(parameter_id AS BIGINT) AS pid,
             CAST(sample_fraction AS BOOLEAN) AS need_frac,
             CAST(result_speciation AS BOOLEAN) AS need_spec
      FROM read_csv('{_FIXDIR / "eqwin_parameters.csv"}', header=true,
                    all_varchar=true)
    ), res AS (
      SELECT CAST(r.SampleId AS BIGINT) AS sample_key,
             m.parameter_id, m.result_type, m.sample_fraction_id,
             m.result_speciation_id, m.matrix_state_id,
             CASE WHEN trim(r.Result) LIKE '<%' THEN 1
                  WHEN trim(r.Result) LIKE '>%' THEN 2 END AS result_condition,
             TRY_CAST(regexp_replace(trim(r.Result), '^[<>]\\s*', '')
                      AS DOUBLE)
               * coalesce(m.conversion, 1.0)
               + coalesce(m.result_offset, 0.0) AS xval,
             nullif(concat_ws('; ',
               nullif(trim(r.ResultCode), ''),
               CASE WHEN nullif(trim(r.ResultQuality), '')
                         IS DISTINCT FROM nullif(trim(r.ResultCode), '')
                    THEN nullif(trim(r.ResultQuality), '') END,
               CASE WHEN nullif(trim(r.DetailComment), '')
                         IS DISTINCT FROM nullif(trim(r.ResultCode), '')
                    AND nullif(trim(r.DetailComment), '')
                         IS DISTINCT FROM nullif(trim(r.ResultQuality), '')
                    THEN nullif(trim(r.DetailComment), '') END), '')
               AS result_note
      FROM results0 r
      JOIN mapping m
        ON r.ParamCode = m.input_param AND r.Units = m.input_unit
      WHERE TRY_CAST(regexp_replace(trim(r.Result), '^[<>]\\s*', '')
                     AS DOUBLE) IS NOT NULL
    ), res_kept AS (
      SELECT res.* FROM res
      LEFT JOIN params ON res.parameter_id = params.pid
      WHERE NOT (coalesce(need_frac, false) AND sample_fraction_id IS NULL)
        AND NOT (coalesce(need_spec, false) AND result_speciation_id IS NULL)
    ), samp AS (
      SELECT CAST(s.SampleId AS BIGINT) AS sample_key,
             st.StnCode AS location_code,
             CAST(regexp_replace(
                    CASE WHEN length(trim(s.CollectDateTime)) = 10
                         THEN trim(s.CollectDateTime) || ' 00:00:00'
                         ELSE trim(s.CollectDateTime) END,
                    ' 00:00:00$', ' 12:00:00') AS TIMESTAMP)
               + INTERVAL 7 HOUR AS datetime,
             CASE WHEN upper(trim(st.StnType)) IN ('GW', 'GROUNDWATER')
                  THEN {_EQ_MEDIA['groundwater']}
                  ELSE {_EQ_MEDIA['surface water']} END AS media_id,
             CASE WHEN upper(trim(st.StnType)) IN ('GW', 'GROUNDWATER')
                  THEN {_EQ_COLLECT['Pump']}
                  ELSE {_EQ_COLLECT['Water Bottle (direct fill)']} END
               AS collection_method,
             CASE
               WHEN regexp_matches(
                      concat_ws(' ', lower(trim(s.SampleNo)),
                                lower(trim(s.SampleComments))),
                      '\\btrip\\s+blank\\b')
                 THEN {_EQ_TYPES['QC-sample-trip blank']}
               WHEN regexp_matches(
                      concat_ws(' ', lower(trim(s.SampleNo)),
                                lower(trim(s.SampleComments))),
                      '\\blab(oratory)?\\s+blank\\b|\\blabblank\\b')
                 THEN {_EQ_TYPES['QC-sample-lab blank']}
               WHEN regexp_matches(
                      concat_ws(' ', lower(trim(s.SampleNo)),
                                lower(trim(s.SampleComments))),
                      '\\bfield\\s+blank\\b|\\bblank\\b')
                 THEN {_EQ_TYPES['QC-sample-field blank']}
               WHEN upper(trim(s.SampleClass)) = 'D'
                 THEN {_EQ_TYPES['QC-sample-field replicate']}
               WHEN upper(trim(s.SampleClass)) = 'I'
                 THEN {_EQ_TYPES['sample-other']}
               WHEN upper(trim(s.SampleClass)) = 'XX'
                 THEN {_EQ_TYPES['unknown']}
               ELSE {_EQ_TYPES['sample-routine']} END AS sample_type,
             'EQWin-' || s.SampleId AS import_source_id,
             nullif(concat_ws('; ',
               nullif(trim(s.SampleNo), ''),
               CASE WHEN ('EQWin SampleClass: ' || trim(s.SampleClass))
                         IS DISTINCT FROM nullif(trim(s.SampleNo), '')
                    THEN 'EQWin SampleClass: ' || trim(s.SampleClass) END,
               CASE WHEN nullif(trim(s.SampleComments), '')
                         IS DISTINCT FROM nullif(trim(s.SampleNo), '')
                    AND nullif(trim(s.SampleComments), '')
                         IS DISTINCT FROM
                           ('EQWin SampleClass: ' || trim(s.SampleClass))
                    THEN nullif(trim(s.SampleComments), '') END), '')
               AS sample_note
      FROM samples0 s
      JOIN stations st ON s.StnId = st.StnId
      WHERE EXISTS (SELECT 1 FROM res_kept k
                    WHERE k.sample_key = CAST(s.SampleId AS BIGINT))
    )
    SELECT s.import_source_id, s.location_code, s.datetime, s.media_id,
           s.collection_method, s.sample_type, s.sample_note,
           r.parameter_id, r.result_type,
           {R('CASE WHEN r.result_condition IS NULL THEN r.xval END', 6)}
             AS result,
           r.result_condition,
           {R('CASE WHEN r.result_condition IS NOT NULL THEN r.xval END', 6)}
             AS result_condition_value,
           r.sample_fraction_id, r.result_speciation_id, r.matrix_state_id,
           r.result_note
    FROM samp s JOIN res_kept r USING (sample_key)
"""


@register("eqwin_normalize", oracle=_EQWIN_ORACLE)
def eqwin_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canned EQWin Access export through the full connector
    normalization (sources/eqwin.py; R/downloadEQWin.R:43-742)."""
    from .sources.eqwin import normalize_eqwin, resolve_type_ids

    def csv(name: str) -> DataFrame:
        return spark.read.csv(str(_FIXDIR / name), header=True)

    samp, res = normalize_eqwin(
        stations=csv("eqwin_stations.csv"),
        samples=csv("eqwin_samples.csv"),
        results=csv("eqwin_results.csv"),
        mapping=csv("eqwin_mapping.csv"),
        parameters=csv("eqwin_parameters.csv"),
        type_ids=resolve_type_ids(_EQ_TYPES),
        media_ids=_EQ_MEDIA,
        collection_ids=_EQ_COLLECT,
    )
    out = (
        samp.withColumnRenamed("note", "sample_note")
        .join(res.withColumnRenamed("note", "result_note"), "sample_key")
        .drop("sample_key")
        .withColumn("media_id", F.col("media_id").cast("int"))
        .withColumn("collection_method", F.col("collection_method").cast("int"))
        .withColumn("sample_type", F.col("sample_type").cast("int"))
    )
    return _round(out, {"result": 6, "result_condition_value": 6})


# ---------------------------------------------------------------------------
# §2.1 import-mapping resolution with subset-match criteria and
# specificity ranking (R/import_mappings.R:1266-1315): best match by
# priority ASC, criteria-count DESC, mapping id ASC; equal-priority
# equal-specificity ties are ambiguous; inactive and unmatchable
# mappings ignored.  (import_mapping_join covers the simple LIKE-join
# shape; this is the full DSL.)
# ---------------------------------------------------------------------------

_RESOLVE_ORACLE = """
    WITH mapping(import_mapping_id, priority, active, m_brand, m_size,
                 badkey, parameter_id) AS (VALUES
      (1, 1, true,  'Brand#13', NULL, 0, 101),
      (2, 1, true,  'Brand#13', '7',  0, 102),
      (3, 0, true,  NULL,       '3',  0, 103),
      (4, 1, true,  'Brand#22', NULL, 0, 104),
      (5, 1, true,  'Brand#22', NULL, 0, 105),
      (6, 1, true,  'Brand#13', '19', 0, 106),
      (7, 2, false, 'Brand#34', NULL, 0, 107),
      (8, 3, true,  NULL,       NULL, 1, 108),
      (9, 1, true,  'Brand#21', NULL, 0, 109)
    ), m AS (
      SELECT *,
             CAST(m_brand IS NOT NULL AS INT)
             + CAST(m_size IS NOT NULL AS INT) + badkey AS match_size
      FROM mapping WHERE active
    ), hits AS (
      SELECT p.p_partkey AS record_id, m.import_mapping_id, m.priority,
             m.match_size, m.parameter_id
      FROM part p JOIN m
        ON (m_brand IS NULL OR m_brand = coalesce(p.p_brand, ''))
       AND (m_size IS NULL
            OR m_size = coalesce(CAST(p.p_size AS VARCHAR), ''))
       AND badkey = 0
    ), rk AS (
      SELECT *,
             row_number() OVER (PARTITION BY record_id
               ORDER BY priority, match_size DESC, import_mapping_id) AS rk,
             count(*) OVER (PARTITION BY record_id, priority, match_size)
               AS n_tied
      FROM hits
    ), best AS (SELECT * FROM rk WHERE rk = 1)
    SELECT p.p_partkey AS record_id, p.p_brand AS brand,
           CAST(p.p_size AS VARCHAR) AS size,
           CASE WHEN b.record_id IS NULL THEN 'unmapped'
                WHEN b.n_tied > 1 THEN 'ambiguous'
                ELSE 'matched' END AS status,
           CASE WHEN b.n_tied = 1 THEN b.import_mapping_id END
             AS import_mapping_id,
           CASE WHEN b.n_tied = 1 THEN b.parameter_id END AS parameter_id
    FROM part p LEFT JOIN best b ON b.record_id = p.p_partkey
"""


@register("import_mapping_resolution", oracle=_RESOLVE_ORACLE)
def import_mapping_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full import-mapping DSL over the part table as source records
    (sources/import_mappings.resolve_mappings)."""
    from .sources.import_mappings import resolve_mappings

    part = _t(spark, sf_dir, "part")
    records = part.select(
        F.col("p_partkey").alias("record_id"),
        F.col("p_brand").alias("brand"),
        F.col("p_size").cast("string").alias("size"),
    )
    rows = [
        (1, 1, True, {"brand": "Brand#13"}, 101),
        (2, 1, True, {"brand": "Brand#13", "size": "7"}, 102),
        (3, 0, True, {"size": "3"}, 103),
        (4, 1, True, {"brand": "Brand#22"}, 104),
        (5, 1, True, {"brand": "Brand#22"}, 105),
        (6, 1, True, {"brand": "Brand#13", "size": "19"}, 106),
        (7, 2, False, {"brand": "Brand#34"}, 107),
        (8, 3, True, {"no_such_key": "x"}, 108),
        (9, 1, True, {"brand": "Brand#21"}, 109),
    ]
    mappings = _ldf(spark, 
        rows,
        "import_mapping_id int, priority int, active boolean,"
        " source_match map<string,string>, parameter_id int",
    )
    out = resolve_mappings(records, mappings, payload_cols=("parameter_id",))
    return out.select(
        "record_id", "brand", "size", "status",
        "import_mapping_id", "parameter_id",
    )


# ---------------------------------------------------------------------------
# Training-batch assembly tier (operators/packing.py): sequence packing
# into fixed context windows, deterministic domain-mixture sampling,
# DSIR-style importance weights.
# ---------------------------------------------------------------------------

_PACK_BUDGET, _PACK_SHARDS = 2048, 8

_PACK_ORACLE = f"""
    WITH RECURSIVE docs AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % {_PACK_SHARDS} AS shard
      FROM documents
    ), ord AS (
      SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id)
               AS rn
      FROM docs
    ), pack AS (
      SELECT shard, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS bin_id,
             CAST(0 AS BIGINT) AS bin_offset,
             n_tokens AS fill
      FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
             CASE WHEN p.fill + o.n_tokens > {_PACK_BUDGET}
                  THEN p.bin_id + 1 ELSE p.bin_id END,
             CASE WHEN p.fill + o.n_tokens > {_PACK_BUDGET}
                  THEN CAST(0 AS BIGINT) ELSE p.fill END,
             CASE WHEN p.fill + o.n_tokens > {_PACK_BUDGET}
                  THEN o.n_tokens ELSE p.fill + o.n_tokens END
      FROM ord o JOIN pack p ON o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT doc_id, n_tokens, shard, bin_id, bin_offset FROM pack
"""


@register("sequence_packing", oracle=_PACK_ORACLE)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit packing of the corpus into 2048-token context windows,
    8 independent shards (operators/packing.pack_sequences); oracle
    replays the prefix recurrence as a recursive CTE."""
    from .operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return pack_sequences(docs, budget=_PACK_BUDGET, n_shards=_PACK_SHARDS)


_MIX_ORACLE = f"""
    WITH w(domain, wt) AS (VALUES
      ('web', 0.5), ('code', 0.3), ('wiki', 0.2)
    ), docs AS (
      SELECT doc_id,
             CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN 'web' WHEN 1 THEN 'code'
               WHEN 2 THEN 'wiki' ELSE 'books' END AS domain,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), tot AS (
      SELECT domain, sum(n_tokens) AS t FROM docs GROUP BY 1
    ), sc AS (
      SELECT min(CAST(t AS DOUBLE) / wt) AS scale
      FROM tot JOIN w USING (domain) WHERE wt > 0 AND t > 0
    ), fr AS (
      SELECT w.domain,
             least(1.0, wt * scale / CAST(t AS DOUBLE)) AS keep_frac
      FROM w JOIN tot USING (domain), sc WHERE t > 0
    )
    SELECT d.doc_id, d.domain, d.n_tokens,
           {R('f.keep_frac', 6)} AS keep_frac,
           (CAST('0x' || substr(md5('mix-v1|' || CAST(d.doc_id AS VARCHAR)),
                                1, 12) AS BIGINT)
            / CAST(281474976710656 AS DOUBLE)) < f.keep_frac AS kept
    FROM docs d JOIN fr f USING (domain)
"""


@register("mixture_domain_sample", oracle=_MIX_ORACLE)
def mixture_domain_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-mixture rebalancing across four synthetic
    domains (operators/packing.mixture_sample); 'books' has no target
    weight and drops out."""
    from .operators.packing import mixture_sample

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, "web")
        .when(F.col("doc_id") % 4 == 1, "code")
        .when(F.col("doc_id") % 4 == 2, "wiki")
        .otherwise("books").alias("domain"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    out = mixture_sample(
        docs, {"web": 0.5, "code": 0.3, "wiki": 0.2}
    ).select("doc_id", "domain", "n_tokens", "keep_frac", "kept")
    return _round(out, {"keep_frac": 6})


_DSIR_BUCKETS = 512

_DSIR_ORACLE = f"""
    WITH docs AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks
      FROM documents
    ), bg AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(toks[i] || ' ' || toks[i + 1]), 1, 15)
                  AS BIGINT) % {_DSIR_BUCKETS} AS bucket
      FROM docs, unnest(generate_series(1, len(toks) - 1)) AS t(i)
    ), counts AS (
      SELECT bucket,
             count(*) FILTER (WHERE doc_id % 17 = 2) AS tn,
             count(*) AS rn
      FROM bg GROUP BY bucket
    ), totals AS (
      SELECT sum(tn) AS tt, sum(rn) AS rt FROM counts
    ), ratios AS (
      SELECT bucket,
             {R("ln((CAST(tn AS DOUBLE) + 1.0)"
                f" / (CAST(tt AS DOUBLE) + {float(_DSIR_BUCKETS)}))"
                " - ln((CAST(rn AS DOUBLE) + 1.0)"
                f" / (CAST(rt AS DOUBLE) + {float(_DSIR_BUCKETS)}))", 6)}
               AS log_ratio
      FROM counts, totals
    ), scored AS (
      SELECT bg.doc_id, count(*) AS n_bigrams,
             sum(CAST(floor(log_ratio * 1000000 + 0.5) AS BIGINT))
               / 1000000.0 / count(*) AS importance
      FROM bg JOIN ratios USING (bucket)
      GROUP BY bg.doc_id
    )
    SELECT d.doc_id,
           coalesce(s.n_bigrams, 0) AS n_bigrams,
           {R('coalesce(s.importance, 0.0)', 6)} AS importance
    FROM docs d LEFT JOIN scored s USING (doc_id)
"""


@register("dsir_importance", oracle=_DSIR_ORACLE)
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-bigram importance weights of every corpus doc against a
    deterministic pseudo-target subset (doc_id % 17 == 2), the
    data-selection-for-LM recipe (operators/packing.importance_weights).
    """
    from .operators.packing import importance_weights

    docs = _t(spark, sf_dir, "documents")
    out = importance_weights(
        docs, docs.where(F.col("doc_id") % 17 == 2),
        num_buckets=_DSIR_BUCKETS,
    )
    return _round(out, {"importance": 6})


# ---------------------------------------------------------------------------
# §2.1 readSnowWorkbook QA/QC rules, set-wise over a synthesized batch
# (readSnowWorkbook.R:139-330,629-700): method resolution ladder,
# required dates, no-sample reconciliation, note-only drops, zero-depth
# rule, cm->mm SWE, apostrophe strip.
# ---------------------------------------------------------------------------

_SNOWQC_ORACLE = f"""
    WITH surveys AS (
      SELECT o_orderkey AS survey_id,
             'SC-' || CAST(o_custkey % 50 AS VARCHAR) AS location_name,
             CASE WHEN o_orderkey % 13 = 0 THEN NULL
                  ELSE CAST(o_orderdate AS VARCHAR) END AS target_date,
             CASE WHEN o_orderkey % 17 = 0 THEN NULL
                  ELSE CAST(o_orderdate AS VARCHAR) END AS survey_date,
             'O''Brien ' || CAST(o_custkey % 7 AS VARCHAR) AS sampler,
             CASE WHEN o_orderkey % 5 = 0 THEN 'Bulk sample'
                  WHEN o_orderkey % 5 = 1 THEN 'No sample'
                  ELSE 'standard survey' END AS method,
             CASE WHEN o_orderkey % 3 = 0 THEN 1.5 END AS est_avg,
             CASE WHEN o_orderkey % 4 = 0 THEN 'it''s cold' END AS notes
      FROM orders WHERE o_orderkey % 9 = 0
    ), meas AS (
      SELECT l_orderkey AS survey_id,
             CASE WHEN l_partkey % 31 = 0 THEN NULL
                  WHEN l_partkey % 7 = 0 THEN 0.0
                  ELSE l_quantity END AS depth,
             CASE WHEN l_partkey % 31 = 0 THEN NULL
                  WHEN l_partkey % 5 = 0 THEN NULL
                  ELSE l_quantity * 0.35 END AS swe,
             l_partkey % 11 = 0 AS excluded
      FROM lineitem
      WHERE l_orderkey % 9 = 0 AND l_linenumber <= 4
        AND l_orderkey % 45 <> 9
    ), m_clean AS (
      SELECT survey_id,
             depth,
             CASE WHEN depth = 0 THEN 0.0 ELSE swe END AS swe,
             CAST(floor(CASE WHEN depth = 0 THEN 0.0 ELSE swe END * 10 + 0.5)
                  AS BIGINT) AS swe_mm,
             excluded
      FROM meas WHERE depth IS NOT NULL OR swe IS NOT NULL
    ), counts AS (
      SELECT survey_id, count(*) AS n FROM m_clean GROUP BY 1
    ), s AS (
      SELECT sv.*, coalesce(c.n, 0) AS n_meas,
             CASE WHEN est_avg IS NOT NULL
                       AND lower(method) <> 'bulk sample'
                  THEN 'average' ELSE method END AS method0
      FROM surveys sv LEFT JOIN counts c USING (survey_id)
    ), graded AS (
      SELECT survey_id, location_name,
             CASE WHEN n_meas = 0 AND lower(method0) <> 'no sample'
                  THEN 'no sample' ELSE method0 END AS method_resolved,
             CASE WHEN target_date IS NULL
                    THEN 'rejected_missing_target_date'
                  WHEN survey_date IS NULL
                    THEN 'rejected_missing_survey_date'
                  WHEN n_meas > 0 AND lower(method0) = 'no sample'
                    THEN 'rejected_no_sample_conflict'
                  ELSE 'ok' END AS status,
             replace(sampler, '''', '') AS sampler,
             replace(notes, '''', '') AS notes
      FROM s
    )
    SELECT g.survey_id, g.location_name, g.method_resolved, g.status,
           g.sampler, g.notes,
           CAST(coalesce(count(m.survey_id), 0) AS BIGINT) AS n_meas,
           sum(m.swe_mm) AS sum_swe_mm,
           {R(DSUM('m.depth') + ' / count(m.depth)', 6)} AS mean_depth,
           CAST(coalesce(sum(CASE WHEN m.excluded THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_excluded
    FROM graded g
    LEFT JOIN m_clean m ON m.survey_id = g.survey_id AND g.status = 'ok'
    GROUP BY 1, 2, 3, 4, 5, 6
"""


@register("snow_workbook_qc", oracle=_SNOWQC_ORACLE)
def snow_workbook_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Workbook QA/QC ladder over a synthesized survey batch
    (sources/snow_workbook.qc_survey_batch)."""
    from .operators.daily import exact_sum
    from .sources.snow_workbook import qc_survey_batch

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    surveys = o.where(k % 9 == 0).select(
        k.alias("survey_id"),
        F.concat(F.lit("SC-"), (F.col("o_custkey") % 50).cast("string"))
        .alias("location_name"),
        F.when(k % 13 != 0, F.col("o_orderdate").cast("string"))
        .alias("target_date"),
        F.when(k % 17 != 0, F.col("o_orderdate").cast("string"))
        .alias("survey_date"),
        F.concat(F.lit("O'Brien "), (F.col("o_custkey") % 7).cast("string"))
        .alias("sampler"),
        F.when(k % 5 == 0, "Bulk sample")
        .when(k % 5 == 1, "No sample")
        .otherwise("standard survey").alias("method"),
        F.when(k % 3 == 0, F.lit(1.5)).alias("est_avg"),
        F.when(k % 4 == 0, F.lit("it's cold")).alias("notes"),
    )
    li = _t(spark, sf_dir, "lineitem")
    lk, pk = F.col("l_orderkey"), F.col("l_partkey")
    meas = (
        li.where((lk % 9 == 0) & (F.col("l_linenumber") <= 4)
                 & (lk % 45 != 9))
        .select(
            lk.alias("survey_id"),
            F.when(pk % 31 == 0, F.lit(None).cast("double"))
            .when(pk % 7 == 0, F.lit(0.0))
            .otherwise(F.col("l_quantity").cast("double")).alias("depth"),
            F.when(pk % 31 == 0, F.lit(None).cast("double"))
            .when(pk % 5 == 0, F.lit(None).cast("double"))
            .otherwise(F.col("l_quantity").cast("double") * 0.35)
            .alias("swe"),
            (pk % 11 == 0).alias("excluded"),
        )
    )
    s, m = qc_survey_batch(surveys, meas)
    rollup = m.groupBy("survey_id").agg(
        F.count("*").alias("__n"),
        F.sum("swe_mm").alias("__swe"),
        (exact_sum(F.col("depth")) / F.count("depth")).alias("__d"),
        F.sum(F.when(F.col("excluded"), 1).otherwise(0)).cast("long")
        .alias("__ex"),
    )
    out = (
        s.join(rollup, "survey_id", "left")
        .select(
            "survey_id", "location_name", "method_resolved", "status",
            "sampler", "notes",
            F.coalesce("__n", F.lit(0)).cast("long").alias("n_meas"),
            F.col("__swe").alias("sum_swe_mm"),
            F.col("__d").alias("mean_depth"),
            F.coalesce("__ex", F.lit(0)).cast("long").alias("n_excluded"),
        )
    )
    return _round(out, {"mean_depth": 6})


# ---------------------------------------------------------------------------
# §2.12 high-watermark ingest + bounds maintenance + tail trim in one
# composition (getNewContinuous.R:469-477,514-518; patch_41.R:1007-1051;
# patch_48.R:113-200) — previously unit-only, now oracle-checked.
# ---------------------------------------------------------------------------

_WM_CUTOFF = "2024-03-01 00:00:00"

_WM_ORACLE = f"""
    WITH ev AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS datetime, value,
             event_id
      FROM events
    ), existing AS (
      SELECT * FROM ev WHERE datetime < TIMESTAMP '{_WM_CUTOFF}'
    ), wm AS (
      SELECT event_type, max(datetime) AS last_data_point
      FROM existing GROUP BY 1
    ), remote AS (
      -- the source re-serves everything; NA values dropped at the
      -- contract gate (getNewContinuous.R:514-518)
      SELECT event_type, datetime,
             CASE WHEN event_id % 97 = 0 THEN NULL ELSE value END AS value
      FROM ev
    ), new_rows AS (
      SELECT r.event_type, r.datetime, r.value
      FROM remote r JOIN wm USING (event_type)
      WHERE r.datetime > wm.last_data_point AND r.value IS NOT NULL
    ), merged AS (
      SELECT event_type, datetime FROM existing
      UNION ALL
      SELECT event_type, datetime FROM new_rows
    ), bounds AS (
      SELECT event_type, min(datetime) AS start_datetime,
             max(datetime) AS end_datetime
      FROM merged GROUP BY 1
    ), daily AS (
      SELECT event_type, CAST(datetime AS DATE) AS date
      FROM ev GROUP BY 1, 2
    ), last_day AS (
      SELECT event_type, max(CAST(datetime AS DATE)) AS d
      FROM existing GROUP BY 1
    ), trim AS (
      SELECT daily.event_type, count(*) AS n_trim
      FROM daily JOIN last_day USING (event_type)
      WHERE daily.date > last_day.d
      GROUP BY 1
    )
    SELECT wm.event_type, wm.last_data_point,
           (SELECT count(*) FROM new_rows n
            WHERE n.event_type = wm.event_type) AS n_new,
           b.start_datetime, b.end_datetime,
           coalesce(t.n_trim, 0) AS n_trim
    FROM wm
    JOIN bounds b ON b.event_type = wm.event_type
    LEFT JOIN trim t ON t.event_type = wm.event_type
"""


@register("watermark_ingest_trim", oracle=_WM_ORACLE)
def watermark_ingest_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest cycle: per-series watermark -> contract-gated
    new rows -> bounds refresh -> daily tail trim
    (streaming/incremental.py + sources/registry.validate_contract)."""
    from .streaming.incremental import (
        high_watermarks, series_bounds, trim_daily_tail,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.col("ts").alias("datetime"), "value", "event_id"
    )
    existing = ev.where(F.col("datetime") < F.lit(_WM_CUTOFF).cast("timestamp"))
    wm = high_watermarks(existing, ts_col="event_type")
    remote = ev.withColumn(
        "value",
        F.when(F.col("event_id") % 97 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value")),
    )
    new_rows = (
        remote.join(F.broadcast(wm), "event_type")
        .where(
            (F.col("datetime") > F.col("last_data_point"))
            & F.col("value").isNotNull()
        )
        .select("event_type", "datetime", "value")
    )
    merged = existing.select("event_type", "datetime").unionByName(
        new_rows.select("event_type", "datetime")
    )
    bounds = series_bounds(merged, ts_col="event_type")
    daily = ev.select(
        "event_type", F.to_date("datetime").alias("date")
    ).distinct()
    trims = (
        trim_daily_tail(daily, existing, ts_col="event_type",
                        dt_col="datetime")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_trim"))
    )
    counts = new_rows.groupBy("event_type").agg(F.count("*").alias("n_new"))
    return (
        wm.join(bounds, "event_type")
        .join(counts, "event_type", "left")
        .join(trims, "event_type", "left")
        .select(
            "event_type", "last_data_point",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            "start_datetime", "end_datetime",
            F.coalesce("n_trim", F.lit(0)).alias("n_trim"),
        )
    )


# ---------------------------------------------------------------------------
# §2.12 point-in-time corrected read (apply_corrections_at +
# measurements_continuous_corrected_at, patch_55.R:460-545,3282-3600):
# the corrections table is reconstructed from its audit log at p_as_of,
# then the ordered chain applies to the measurements. Log fixture
# exercises: future update (original wins), future insert (excluded),
# future delete (resurrected), past delete (stays absent), untouched.
# ---------------------------------------------------------------------------

_CRA_AS_OF = "2024-06-01 00:00:00"

_CRA_ORACLE = f"""
    WITH current AS (
      SELECT * FROM (VALUES
        (1, 'click', TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-10',
         'offset_linear', 0.9, CAST(NULL AS DOUBLE),
         TIMESTAMP '2024-02-01'),
        (2, 'purchase', TIMESTAMP '2024-01-10', TIMESTAMP '2024-01-20',
         'scale', 110.0, CAST(NULL AS DOUBLE), TIMESTAMP '2024-07-15'),
        (4, 'view', TIMESTAMP '2024-01-03', TIMESTAMP '2024-01-08',
         'offset_two_point', 1.0, 3.0, TIMESTAMP '2024-01-20')
      ) AS t(row_id, event_type, start_dt, end_dt, ctype, value1, value2,
             row_created)
    ), log AS (
      SELECT * FROM (VALUES
        (101, TIMESTAMP '2024-07-01', 1, 'click', TIMESTAMP '2024-01-05',
         TIMESTAMP '2024-01-10', 'offset_linear', 0.25,
         CAST(NULL AS DOUBLE), 1, TIMESTAMP '2024-02-01'),
        (102, TIMESTAMP '2024-07-15', CAST(NULL AS INT),
         CAST(NULL AS VARCHAR), CAST(NULL AS TIMESTAMP),
         CAST(NULL AS TIMESTAMP), CAST(NULL AS VARCHAR),
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), 2,
         TIMESTAMP '2024-07-15'),
        (103, TIMESTAMP '2024-08-01', 3, 'error', TIMESTAMP '2024-01-01',
         TIMESTAMP '2024-02-01', 'trim', 5.0, 45.0, CAST(NULL AS INT),
         TIMESTAMP '2024-01-15'),
        (104, TIMESTAMP '2024-05-01', 5, 'signup', TIMESTAMP '2024-01-02',
         TIMESTAMP '2024-01-12', 'drift_linear', 2.5,
         CAST(NULL AS DOUBLE), CAST(NULL AS INT), TIMESTAMP '2024-03-01')
      ) AS t(log_id, action_timestamp, orig_row_id, orig_event_type,
             orig_start_dt, orig_end_dt, orig_ctype, orig_value1,
             orig_value2, new_row_id, row_created)
    ), fut AS (
      SELECT *, coalesce(orig_row_id, new_row_id) AS key,
             row_number() OVER (
               PARTITION BY coalesce(orig_row_id, new_row_id)
               ORDER BY action_timestamp, log_id) AS rn
      FROM log WHERE action_timestamp > TIMESTAMP '{_CRA_AS_OF}'
    ), first_chg AS (SELECT * FROM fut WHERE rn = 1
    ), snap AS (
      SELECT coalesce(f.key, c.row_id) AS row_id,
             CASE WHEN f.key IS NOT NULL THEN f.orig_event_type
                  ELSE c.event_type END AS event_type,
             CASE WHEN f.key IS NOT NULL THEN f.orig_start_dt
                  ELSE c.start_dt END AS start_dt,
             CASE WHEN f.key IS NOT NULL THEN f.orig_end_dt
                  ELSE c.end_dt END AS end_dt,
             CASE WHEN f.key IS NOT NULL THEN f.orig_ctype
                  ELSE c.ctype END AS ctype,
             CASE WHEN f.key IS NOT NULL THEN f.orig_value1
                  ELSE c.value1 END AS value1,
             CASE WHEN f.key IS NOT NULL THEN f.orig_value2
                  ELSE c.value2 END AS value2,
             CASE WHEN f.key IS NOT NULL THEN f.row_created
                  ELSE c.row_created END AS row_created
      FROM current c FULL OUTER JOIN first_chg f ON c.row_id = f.key
    ), ao AS (
      SELECT * FROM snap
      WHERE row_created <= TIMESTAMP '{_CRA_AS_OF}'
        AND event_type IS NOT NULL
    ),
    -- the as-of set is (trim error; offset_linear 0.25 click;
    -- two-point view) — apply in (type priority, id) order
    c_trim AS (
      SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts, e.event_type,
             CASE WHEN a.row_id IS NOT NULL
                       AND (e.value < a.value1 OR e.value > a.value2)
                  THEN NULL ELSE e.value END AS v
      FROM events e
      LEFT JOIN ao a
        ON a.ctype = 'trim' AND e.event_type = a.event_type
       AND CAST(e.ts AS TIMESTAMP) >= a.start_dt
       AND CAST(e.ts AS TIMESTAMP) < a.end_dt
    ), c_off AS (
      SELECT t.event_id, t.ts, t.event_type,
             CASE WHEN a.row_id IS NOT NULL AND t.v IS NOT NULL
                  THEN t.v + a.value1 ELSE t.v END AS v
      FROM c_trim t
      LEFT JOIN ao a
        ON a.ctype = 'offset_linear' AND t.event_type = a.event_type
       AND t.ts >= a.start_dt AND t.ts < a.end_dt
    ), c_two AS (
      SELECT t.event_id, t.ts, t.event_type,
             CASE WHEN a.row_id IS NOT NULL AND t.v IS NOT NULL
                  THEN t.v + a.value1 + (a.value2 - a.value1)
                       * date_diff('second', a.start_dt, t.ts)
                       / date_diff('second', a.start_dt, a.end_dt)
                  ELSE t.v END AS v
      FROM c_off t
      LEFT JOIN ao a
        ON a.ctype = 'offset_two_point' AND t.event_type = a.event_type
       AND t.ts >= a.start_dt AND t.ts < a.end_dt
    )
    SELECT event_id, event_type, ts, {R('v', 4)} AS corrected_value
    FROM c_two
"""


@register("corrected_read_at", oracle=_CRA_ORACLE)
def corrected_read_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrections reconstructed from their audit log at a past
    timestamp (operators/audit.rows_as_of), compiled into the ordered
    chain and applied to the fact (apply_corrections_at)."""
    from .operators.audit import rows_as_of

    current, log = _cra_frames(spark)
    snap = rows_as_of(current, log, _CRA_AS_OF,
                      field_cols=_CRA_FIELDS)
    rows = sorted(
        (r for r in snap.collect() if r["event_type"] is not None),
        key=lambda r: r["row_id"],
    )
    corrections = [
        Correction(r["row_id"], r["event_type"], str(r["start_dt"]),
                   str(r["end_dt"]), r["ctype"], value1=r["value1"],
                   value2=r["value2"])
        for r in rows
    ]
    ev = _t(spark, sf_dir, "events")
    out = apply_corrections(
        ev, corrections, ts_col="event_type", dt_col="ts",
        value_col="value", out_col="v",
    ).select("event_id", "event_type", "ts", "v")
    return _round(out, {"v": 4}).withColumnRenamed("v", "corrected_value")


_CRA_FIELDS = ("event_type", "start_dt", "end_dt", "ctype", "value1",
               "value2")


def _cra_frames(spark: SparkSession):
    """The corrections current-table + audit-log fixture shared by
    corrected_read_at and daily_corrected_at."""
    current = _ldf(spark, [
        (1, "click", "2024-01-05 00:00:00", "2024-01-10 00:00:00",
         "offset_linear", 0.9, None, "2024-02-01 00:00:00"),
        (2, "purchase", "2024-01-10 00:00:00", "2024-01-20 00:00:00",
         "scale", 110.0, None, "2024-07-15 00:00:00"),
        (4, "view", "2024-01-03 00:00:00", "2024-01-08 00:00:00",
         "offset_two_point", 1.0, 3.0, "2024-01-20 00:00:00"),
    ], "row_id int, event_type string, start_dt string, end_dt string,"
       " ctype string, value1 double, value2 double, row_created string")
    log = _ldf(spark, [
        (101, "2024-07-01 00:00:00", 1, "click", "2024-01-05 00:00:00",
         "2024-01-10 00:00:00", "offset_linear", 0.25, None, 1,
         "2024-02-01 00:00:00"),
        (102, "2024-07-15 00:00:00", None, None, None, None, None,
         None, None, 2, "2024-07-15 00:00:00"),
        (103, "2024-08-01 00:00:00", 3, "error", "2024-01-01 00:00:00",
         "2024-02-01 00:00:00", "trim", 5.0, 45.0, None,
         "2024-01-15 00:00:00"),
        (104, "2024-05-01 00:00:00", 5, "signup", "2024-01-02 00:00:00",
         "2024-01-12 00:00:00", "drift_linear", 2.5, None, None,
         "2024-03-01 00:00:00"),
    ], "log_id int, action_timestamp string, orig_row_id int,"
       " orig_event_type string, orig_start_dt string,"
       " orig_end_dt string, orig_ctype string, orig_value1 double,"
       " orig_value2 double, new_row_id int, row_created string")
    for c in ("start_dt", "end_dt", "row_created"):
        current = current.withColumn(c, F.col(c).cast("timestamp"))
    for c in ("action_timestamp", "orig_start_dt", "orig_end_dt",
              "row_created"):
        log = log.withColumn(c, F.col(c).cast("timestamp"))
    return current, log


# ---------------------------------------------------------------------------
# RLS share_with maintenance (public.cleanup_share_with_role,
# patch_45.R:104-210; public.validate_share_with trigger,
# patch_11.R:415-424): role removal with sole-entry blocking, role
# replacement with distinct+sort, unknown-role validation.
# ---------------------------------------------------------------------------

_SHARE_ORACLE = """
    WITH tagged AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN ['yg_reader']
                  WHEN doc_id % 5 = 1 THEN ['admin', 'yg_reader']
                  WHEN doc_id % 5 = 2 THEN ['public_reader']
                  WHEN doc_id % 5 = 3 THEN ['admin', 'ghost_role']
                  ELSE ['yg_reader', 'public_reader', 'yg_reader'] END
               AS share_with
      FROM documents
    ), removal AS (
      SELECT doc_id, share_with,
             list_contains(share_with, 'yg_reader') AS matched,
             list_contains(share_with, 'yg_reader')
               AND len(list_filter(share_with,
                                   x -> x <> 'yg_reader')) = 0
               AS only_role
      FROM tagged
    )
    SELECT doc_id,
           array_to_string(share_with, ',') AS share_with,
           matched, only_role,
           CASE WHEN only_role THEN 'blocked'
                WHEN matched THEN 'updated'
                ELSE 'unchanged' END AS action,
           array_to_string(
             CASE WHEN matched AND NOT only_role
                  THEN list_filter(share_with, x -> x <> 'yg_reader')
                  ELSE share_with END, ',') AS removed_arr,
           array_to_string(
             CASE WHEN matched
                  THEN list_sort(list_distinct(list_transform(
                         share_with,
                         x -> CASE WHEN x = 'yg_reader'
                                   THEN 'public_reader' ELSE x END)))
                  ELSE share_with END, ',') AS replaced_arr,
           coalesce(array_to_string(
             list_sort(list_filter(list_distinct(share_with),
               x -> NOT list_contains(
                 ['admin', 'public_reader', 'yg_reader'], x))), ','), '')
             AS unknown_roles,
           len(list_filter(list_distinct(share_with),
               x -> NOT list_contains(
                 ['admin', 'public_reader', 'yg_reader'], x))) = 0
             AS share_with_valid
    FROM removal
"""


@register("share_with_maintenance", oracle=_SHARE_ORACLE)
def share_with_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role removal (sole-entry blocked), role replacement, and
    unknown-role validation over synthesized share_with arrays
    (operators/maintenance.cleanup_share_with / validate_share_with).
    """
    from .operators.maintenance import cleanup_share_with, validate_share_with

    docs = _t(spark, sf_dir, "documents")
    k = F.col("doc_id") % 5
    tagged = docs.select(
        "doc_id",
        F.when(k == 0, F.array(F.lit("yg_reader")))
        .when(k == 1, F.array(F.lit("admin"), F.lit("yg_reader")))
        .when(k == 2, F.array(F.lit("public_reader")))
        .when(k == 3, F.array(F.lit("admin"), F.lit("ghost_role")))
        .otherwise(F.array(F.lit("yg_reader"), F.lit("public_reader"),
                           F.lit("yg_reader"))).alias("share_with"),
    )
    removed = cleanup_share_with(tagged, "yg_reader")
    replaced = cleanup_share_with(
        tagged, "yg_reader", replacement="public_reader"
    ).select("doc_id", F.col("share_with_new").alias("__rep"))
    roles = _ldf(spark, [("admin",), ("public_reader",), ("yg_reader",)],
                 ["role_name"])
    out = (
        validate_share_with(
            removed.join(replaced, "doc_id"),
            roles,
        )
        .select(
            "doc_id",
            F.array_join("share_with", ",").alias("share_with"),
            "matched", "only_role", "action",
            F.array_join("share_with_new", ",").alias("removed_arr"),
            F.array_join("__rep", ",").alias("replaced_arr"),
            F.array_join("unknown_roles", ",").alias("unknown_roles"),
            "share_with_valid",
        )
    )
    return out


# ---------------------------------------------------------------------------
# Training-data tier: C4-style line filtering + page flags, and a
# per-domain top-share quality gate with deterministic tie-breaks.
# ---------------------------------------------------------------------------

_C4_ORACLE = """
    WITH lines AS (
      SELECT doc_id, lower(text) AS low,
             string_split(text, '. ') AS ls
      FROM documents
    ), f AS (
      SELECT doc_id,
             list_filter(ls, x ->
               regexp_matches(trim(x), '[.!?"]$')
               AND len(regexp_split_to_array(trim(x), '\\s+')) >= 5)
               AS kept,
             len(ls) AS n_total,
             contains(low, '{') AS has_brace,
             contains(low, 'lorem ipsum') AS has_lorem
      FROM lines
    )
    SELECT doc_id, CAST(len(kept) AS INT) AS n_kept,
           CAST(n_total AS INT) AS n_total, has_brace, has_lorem,
           len(kept) >= 3 AND NOT has_brace AND NOT has_lorem AS doc_kept
    FROM f
"""


@register("c4_line_filter", oracle=_C4_ORACLE)
def c4_line_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line retention + page flags over sentence-segmented docs
    (functions/text.c4_line_filter; the corpus has no newlines, so
    '. ' plays the line separator)."""
    from .functions.text import c4_doc_flags, c4_line_filter

    docs = _t(spark, sf_dir, "documents")
    lf = c4_line_filter(F.col("text"), sep=r"\. ")
    brace, lorem = c4_doc_flags(F.col("text"))
    out = docs.select(
        "doc_id",
        F.size(lf["kept_lines"]).alias("n_kept"),
        lf["n_total"].alias("n_total"),
        brace.alias("has_brace"),
        lorem.alias("has_lorem"),
    ).withColumn(
        "doc_kept",
        (F.col("n_kept") >= 3) & ~F.col("has_brace") & ~F.col("has_lorem"),
    )
    return out


# Full Gopher rule set (Rae et al. 2021 Appendix A) over documents
# with a synthesized line structure: ' a ' becomes a bullet line
# break, ' the ' an ellipsis line break, and every 7th doc gets two
# '#' symbols — so every rule (bullet fraction, ellipsis fraction,
# symbol ratio, stopword hits, word/length bounds) discriminates at
# test SF instead of being constant. Word rules run on the original
# text, line rules on the synthesized line text, mirrored exactly.
_GOPHER_LT_SQL = """
      '- ' || replace(replace(text, ' a ', chr(10) || '- '),
                      ' the ', '...' || chr(10))
      || (CASE WHEN doc_id % 7 = 0 THEN ' # #' ELSE '' END)
"""

_GOPHER_ORACLE = f"""
    WITH lt AS (
      SELECT doc_id, text, {_GOPHER_LT_SQL} AS lt FROM documents
    ), m AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             (len(text) - (len(string_split(text, ' ')) - 1))
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mlen,
             (len(lt) - len(replace(lt, '#', ''))
              + (len(lt) - len(replace(lt, '...', ''))) / 3.0)
               / len(string_split(text, ' ')) AS sym,
             len(list_filter(string_split(lt, chr(10)),
                 l -> starts_with(l, '- ') OR starts_with(l, '* ')))
               / CAST(len(string_split(lt, chr(10))) AS DOUBLE) AS bf,
             len(list_filter(string_split(lt, chr(10)),
                 l -> ends_with(l, '...')))
               / CAST(len(string_split(lt, chr(10))) AS DOUBLE) AS ef,
             len(list_filter(string_split(text, ' '),
                 w -> regexp_matches(w, '[A-Za-z]')))
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS af,
             (CASE WHEN list_contains(string_split(text, ' '), 'the')
                   THEN 1 ELSE 0 END)
             + (CASE WHEN list_contains(string_split(text, ' '), 'be')
                     THEN 1 ELSE 0 END)
             + (CASE WHEN list_contains(string_split(text, ' '), 'to')
                     THEN 1 ELSE 0 END)
             + (CASE WHEN list_contains(string_split(text, ' '), 'of')
                     THEN 1 ELSE 0 END)
             + (CASE WHEN list_contains(string_split(text, ' '), 'and')
                     THEN 1 ELSE 0 END)
             + (CASE WHEN list_contains(string_split(text, ' '), 'that')
                     THEN 1 ELSE 0 END)
             + (CASE WHEN list_contains(string_split(text, ' '), 'have')
                     THEN 1 ELSE 0 END)
             + (CASE WHEN list_contains(string_split(text, ' '), 'with')
                     THEN 1 ELSE 0 END) AS hits
      FROM lt
    )
    SELECT doc_id, n_words,
           {R('mlen', 6)} AS mean_word_len,
           {R('sym', 6)} AS symbol_ratio,
           {R('bf', 6)} AS bullet_frac,
           {R('ef', 6)} AS ellipsis_frac,
           {R('af', 6)} AS alpha_frac,
           hits AS stopword_hits,
           (n_words >= 50 AND n_words <= 100000
            AND mlen >= 3.0 AND mlen <= 10.0 AND sym <= 0.1
            AND bf <= 0.9 AND ef <= 0.3 AND af >= 0.8
            AND hits >= 2) AS keep
    FROM m
"""


@register("gopher_quality_gate", oracle=_GOPHER_ORACLE)
def gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Gopher quality rules (functions/text.gopher_flags): word
    bounds, mean word length, symbol ratio, bullet/ellipsis line
    fractions, alpha-word fraction, required-stopword hits."""
    from .functions.text import gopher_flags

    docs = _t(spark, sf_dir, "documents")
    lt = F.concat(
        F.lit("- "),
        F.replace(
            F.replace(F.col("text"), F.lit(" a "),
                      F.concat(F.lit("\n"), F.lit("- "))),
            F.lit(" the "), F.concat(F.lit("..."), F.lit("\n"))),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" # #")).otherwise(F.lit("")),
    )
    flags = gopher_flags(F.col("text"), line_text=lt)
    out = docs.select("doc_id", *[
        flags[name].alias(name)
        for name in ("n_words", "mean_word_len", "symbol_ratio",
                     "bullet_frac", "ellipsis_frac", "alpha_frac",
                     "stopword_hits", "keep")
    ])
    return _round(out, {"mean_word_len": 6, "symbol_ratio": 6,
                        "bullet_frac": 6, "ellipsis_frac": 6,
                        "alpha_frac": 6})


# BM25 top-k per probe query (operators/search.py): postings restricted
# to query terms via broadcast, df computed on the restricted set,
# per-term contributions quantized at 1e-6 and summed as longs so the
# ranking is order-independent; ties broken by doc_id. The oracle
# replays the identical quantized pipeline.
_BM25_QUERIES = [(0, "spark join key"), (1, "table scan fast value"),
                 (2, "window agg batch"), (3, "customer query line slow")]

_BM25_VALUES = ", ".join(f"({i}, '{q}')" for i, q in _BM25_QUERIES)

# shared through `ranked` so the hybrid-RRF oracle reuses the chain
_BM25_CTES = f"""q(query_id, query) AS (VALUES {_BM25_VALUES}),
    base AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks
      FROM documents
    ), dl AS (
      SELECT doc_id, len(toks) AS dl FROM base
    ), stats AS (
      SELECT count(*) AS n, sum(dl) AS sumdl FROM dl
    ), post AS (
      SELECT doc_id, unnest(toks) AS term FROM base
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM post GROUP BY 1, 2
    ), qt AS (
      SELECT DISTINCT query_id, term FROM (
        SELECT query_id, unnest(string_split(lower(query), ' ')) AS term
        FROM q)
    ), qterms AS (
      SELECT DISTINCT term FROM qt
    ), dfq AS (
      SELECT term, count(*) AS df
      FROM tf JOIN qterms USING (term) GROUP BY 1
    ), contrib AS (
      SELECT qt.query_id, tf.doc_id,
             CAST(floor(
               ln(1 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
               * tf.tf * (1.2 + 1.0)
               / (tf.tf + 1.2 * (1.0 - 0.75
                  + 0.75 * dl.dl / (CAST(s.sumdl AS DOUBLE) / s.n)))
               * 1000000.0 + 0.5) AS BIGINT) AS c
      FROM tf
      JOIN qt USING (term)
      JOIN dfq ON tf.term = dfq.term
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats s
    ), sc AS (
      SELECT query_id, doc_id, sum(c) AS cl FROM contrib GROUP BY 1, 2
    ), ranked AS (
      SELECT query_id, doc_id, cl,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cl DESC, doc_id) AS rn
      FROM sc
    )
"""

_BM25_ORACLE = f"""
    WITH {_BM25_CTES}
    SELECT query_id, doc_id,
           {R('cl / 1000000.0', 6)} AS score
    FROM ranked WHERE rn <= 5
"""


@register("bm25_topk", oracle=_BM25_ORACLE)
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 per probe query (operators/search.bm25_topk)."""
    from .operators.search import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        _BM25_QUERIES, "query_id int, query string")
    out = bm25_topk(docs, queries, k=5)
    return _round(out, {"score": 6})


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
# vector (cosine top-k) rankings — the standard two-tower serving
# combiner. Contributions quantize to integer nano-units before the
# exact sum, so fusion is order-independent for any source count.
# Probe ids 0..3 name BOTH a text query and an embedding row.
# ---------------------------------------------------------------------------

_HYBRID_ORACLE = f"""
    WITH {_BM25_CTES},
    lex AS (
      SELECT query_id, doc_id, rn AS rank FROM ranked WHERE rn <= 10
    ), qv AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 4
    ), cvv AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings
    ), vs AS (
      SELECT query_id, neighbor_id,
             list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv))
                  * sqrt(list_dot_product(cv, cv))) AS cosine
      FROM qv, cvv WHERE query_id <> neighbor_id
    ), vec AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT query_id, neighbor_id AS doc_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY floor(cosine * 1000000000.0 + 0.5) DESC,
                          neighbor_id) AS rank
        FROM vs) WHERE rank <= 10
    ), uni AS (
      SELECT query_id, doc_id,
             CAST(floor(1000000000.0 / (60 + rank)) AS BIGINT) AS u
      FROM lex
      UNION ALL
      SELECT query_id, doc_id,
             CAST(floor(1000000000.0 / (60 + rank)) AS BIGINT) AS u
      FROM vec
    ), fused AS (
      SELECT query_id, doc_id, sum(u) AS units FROM uni GROUP BY 1, 2
    ), fr AS (
      SELECT query_id, doc_id, units,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY units DESC, doc_id) AS rank
      FROM fused
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
           CAST(units AS BIGINT) / 1000000000.0 AS rrf_score,
           CAST(rank AS BIGINT) AS rank
    FROM fr WHERE rank <= 5
"""


@register("hybrid_rrf_topk", oracle=_HYBRID_ORACLE)
def hybrid_rrf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion of BM25 top-10 and cosine top-10 per probe query."""
    from pyspark.sql import Window as W

    from .operators.search import bm25_topk, rrf_fuse
    from .operators.similarity import cosine_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    queries = spark.createDataFrame(
        _BM25_QUERIES, "query_id int, query string")
    lex = bm25_topk(docs, queries, k=10)
    wl = W.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    lex = lex.select(
        F.col("query_id").cast("long").alias("query_id"), "doc_id",
        "score").withColumn("rank", F.row_number().over(wl))
    vec = cosine_topk(emb, emb.where(F.col("vec_id") < 4), k=10).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse([lex.select("query_id", "doc_id", "rank"), vec],
                    topk=5)


# Image near-duplicate detection via perceptual hashing
# (operators/multimodal.phash64 + extract_image_phash + dedup.
# simhash_near_pairs): lossless cosine-pattern BMPs -> real BMP decode
# -> 32x32 DCT -> 63-bit signature (fixed-threshold oracle regime;
# every bit decided by a wide margin) -> pigeonhole-banded pairs.
# Items sharing a pattern key are near-duplicates (hamming 0 despite
# per-item amplitude jitter moving pixels). The oracle replays pixels
# -> DCT -> hash -> pairs numerically; hamming <= 2 < 4 bands makes
# the pigeonhole banding lossless, so the oracle's all-pairs filter is
# the same set.
_PHASH_ORACLE = """
    WITH ids AS (
      SELECT doc_id AS media_id, doc_id % 16 AS p
      FROM documents WHERE doc_id % 4 = 2
    ), grid AS (
      SELECT unnest(range(0, 32)) AS t
    ), px AS (
      SELECT i.media_id, yy.t AS y, xx.t AS x,
             least(CAST(255 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
               floor(128.0
                 + (40 + i.media_id % 3)
                   * cos((2*xx.t+1) * (i.p % 7 + 1) * pi() / 64.0)
                   * cos((2*yy.t+1) * (i.p % 5 + 1) * pi() / 64.0)
                 + 25 * cos((2*xx.t+1) * (i.p % 6 + 1) * pi() / 64.0)
                      * cos((2*yy.t+1) * (i.p % 4 + 2) * pi() / 64.0)
                 + 15 * cos((2*xx.t+1) * (i.p % 5 + 2) * pi() / 64.0)
                      * cos((2*yy.t+1) * (i.p % 3 + 3) * pi() / 64.0)
                 + 0.5))) AS v
      FROM ids i, grid xx, grid yy
    ), uv AS (
      SELECT uu.t AS u, vv.t AS v
      FROM (SELECT unnest(range(0, 8)) AS t) uu,
           (SELECT unnest(range(0, 8)) AS t) vv
      WHERE NOT (uu.t = 0 AND vv.t = 0)
    ), coef AS (
      SELECT p.media_id, uv.u, uv.v,
             CAST(floor(sum(p.v
               * (CASE WHEN uv.u = 0 THEN sqrt(1.0/32.0)
                       ELSE sqrt(2.0/32.0) END)
               * cos((2*p.x+1) * uv.u * pi() / 64.0)
               * (CASE WHEN uv.v = 0 THEN sqrt(1.0/32.0)
                       ELSE sqrt(2.0/32.0) END)
               * cos((2*p.y+1) * uv.v * pi() / 64.0)
             ) * 1000000.0 + 0.5) AS BIGINT) AS q
      FROM px p, uv GROUP BY 1, 2, 3
    ), hashes AS (
      SELECT media_id,
             CAST(sum(CASE WHEN q > 100000000
                      THEN (CAST(1 AS BIGINT) << (u * 8 + v - 1))
                      ELSE 0 END) AS BIGINT) AS phash
      FROM coef GROUP BY 1
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           bit_count(xor(a.phash, b.phash)) AS hamming
    FROM hashes a JOIN hashes b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 2
"""


@register("image_phash_near_dup", oracle=_PHASH_ORACLE)
def image_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pHash near-duplicate pairs over decoded images: BMP decode ->
    32x32 DCT signature -> pigeonhole-banded pair join."""
    from .operators.dedup import simhash_near_pairs
    from .operators.multimodal import (extract_image_phash,
                                       synthesize_pattern_bmps)

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 4 == 2).select(
        F.col("doc_id").alias("media_id"))
    hashes = extract_image_phash(
        synthesize_pattern_bmps(ids), method="fixed", tau=100.0)
    return simhash_near_pairs(
        hashes, id_col="media_id", sig_col="phash",
        bits=64, bands=4, max_hamming=2)


# Audio near-duplicate detection (operators/multimodal.
# audio_fingerprint64): real WAV decode -> per-frame per-band EXACT
# integer energies -> sign-of-delta bits -> pigeonhole-banded pairs.
# Group twins are re-levelled copies (1-3x gain) that must fingerprint
# identically (energies scale uniformly, comparisons unchanged). The
# oracle replays samples -> energies -> bits -> pairs in exact integer
# arithmetic; hamming <= 3 < 4 bands keeps the banding lossless.
_AUDIO_FP_ORACLE = """
    WITH ids AS (
      SELECT doc_id AS media_id, doc_id % 8 AS g, 1 + doc_id % 3 AS fac
      FROM documents WHERE doc_id % 4 = 3
    ), t AS (
      SELECT unnest(range(0, 4096)) AS k
    ), s AS (
      SELECT media_id, k // 256 AS f, (k % 256) // 64 AS b,
             fac * (((g * 37 + k * 101) % 4001) - 2000) AS v
      FROM ids, t
    ), e AS (
      SELECT media_id, f, b, sum(v * v) AS e FROM s GROUP BY 1, 2, 3
    ), bits AS (
      SELECT a.media_id, a.b * 15 + a.f AS idx, (n.e > a.e) AS bit
      FROM e a JOIN e n ON a.media_id = n.media_id AND a.b = n.b
                        AND n.f = a.f + 1
      WHERE a.f < 15
    ), fp AS (
      SELECT media_id,
             CAST(sum(CASE WHEN bit
                      THEN (CAST(1 AS BIGINT) << idx) ELSE 0 END)
                  AS BIGINT) AS fingerprint
      FROM bits GROUP BY 1
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           bit_count(xor(a.fingerprint, b.fingerprint)) AS hamming
    FROM fp a JOIN fp b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 3
"""


@register("audio_fingerprint_near_dup", oracle=_AUDIO_FP_ORACLE)
def audio_fingerprint_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs: WAV decode -> integer band-energy
    fingerprint -> pigeonhole-banded pair join."""
    from .operators.dedup import simhash_near_pairs
    from .operators.multimodal import (extract_audio_fingerprint,
                                       synthesize_tone_wavs)

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 4 == 3).select(
        F.col("doc_id").alias("media_id"))
    fps = extract_audio_fingerprint(synthesize_tone_wavs(ids))
    return simhash_near_pairs(
        fps, id_col="media_id", sig_col="fingerprint",
        bits=60, bands=4, max_hamming=3)


# Video temporal fingerprint (operators/multimodal.
# extract_video_fingerprint): every frame entropy-decoded through the
# real MJPEG/JPEG path, exact integer luma sums, rise/fall bits across
# adjacent frames. Group twins are uniformly re-graded copies (offset
# cancels in deltas). 15-bit code, 3 pigeonhole bands, hamming <= 2
# keeps the banding lossless; all-integer oracle.
_VIDEO_FP_ORACLE = """
    WITH ids AS (
      SELECT doc_id AS media_id, doc_id % 8 AS g,
             (doc_id % 3) * 4 AS off
      FROM documents WHERE doc_id % 3 = 0
    ), fr AS (
      SELECT unnest(range(0, 16)) AS f
    ), bl AS (
      SELECT unnest(range(0, 4)) AS b
    ), luma AS (
      SELECT media_id, f,
             sum(CAST(64 AS BIGINT)
                 * ((g * 7 + f * 11 + b * 37) % 200 + 28 + off)) AS s
      FROM ids, fr, bl GROUP BY 1, 2
    ), bits AS (
      SELECT a.media_id, a.f AS idx, (n.s > a.s) AS bit
      FROM luma a JOIN luma n
        ON a.media_id = n.media_id AND n.f = a.f + 1
      WHERE a.f < 15
    ), fp AS (
      SELECT media_id,
             CAST(sum(CASE WHEN bit
                      THEN (CAST(1 AS BIGINT) << idx) ELSE 0 END)
                  AS BIGINT) AS fingerprint
      FROM bits GROUP BY 1
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           bit_count(xor(a.fingerprint, b.fingerprint)) AS hamming
    FROM fp a JOIN fp b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 2
"""


@register("video_fingerprint_near_dup", oracle=_VIDEO_FP_ORACLE)
def video_fingerprint_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup pairs: full-frame MJPEG decode -> integer
    luma-rhythm fingerprint -> pigeonhole-banded pair join."""
    from .operators.dedup import simhash_near_pairs
    from .operators.multimodal import (extract_video_fingerprint,
                                       synthesize_group_avis)

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("media_id"))
    fps = extract_video_fingerprint(synthesize_group_avis(ids))
    return simhash_near_pairs(
        fps, id_col="media_id", sig_col="fingerprint",
        bits=15, bands=3, max_hamming=2)


# Corpus health monitoring: EXACT per-source token/char quantiles
# (p50/p90/p99, linear interpolation over sorted values — Spark
# percentile == DuckDB quantile_cont definition; integer inputs keep
# the interpolation arithmetic deterministic) plus doc counts — the
# distribution dashboard a curation pipeline watches between rounds.
_TOKEN_QUANTILES_ORACLE = f"""
    WITH m AS (
      SELECT source, len(string_split(text, ' ')) AS n_tok, n_chars
      FROM documents
    )
    SELECT source, count(*) AS n_docs,
           {R('quantile_cont(n_tok, 0.5)', 6)} AS tok_p50,
           {R('quantile_cont(n_tok, 0.9)', 6)} AS tok_p90,
           {R('quantile_cont(n_tok, 0.99)', 6)} AS tok_p99,
           {R('quantile_cont(n_chars, 0.5)', 6)} AS chars_p50,
           {R('quantile_cont(n_chars, 0.99)', 6)} AS chars_p99
    FROM m GROUP BY source
"""


@register("corpus_token_quantiles", oracle=_TOKEN_QUANTILES_ORACLE)
def corpus_token_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source token/char quantiles (no approx sketch — the
    exact percentile is a single per-group sort, the right tool at
    dashboard cardinality; sketches belong on the full-corpus axis)."""
    from .functions.text import token_count

    docs = _t(spark, sf_dir, "documents")
    m = docs.select(
        "source", token_count(F.col("text")).alias("n_tok"), "n_chars")
    out = m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.percentile("n_tok", F.lit(0.5)).alias("tok_p50"),
        F.percentile("n_tok", F.lit(0.9)).alias("tok_p90"),
        F.percentile("n_tok", F.lit(0.99)).alias("tok_p99"),
        F.percentile("n_chars", F.lit(0.5)).alias("chars_p50"),
        F.percentile("n_chars", F.lit(0.99)).alias("chars_p99"),
    )
    return _round(out, {c: 6 for c in ("tok_p50", "tok_p90", "tok_p99",
                                       "chars_p50", "chars_p99")})


# Image resize kernel (operators/multimodal.resize_images): block-mean
# downscale in EXACT integer arithmetic (sum // block-size per output
# pixel), re-encoded through the real BMP writer, then features
# re-extracted through the real decoder — the thumbnail/normalization
# step of an image-corpus pipeline, fully differentially verified
# because every stage is integer-exact.
_RESIZE_ORACLE = f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id % 5 = 1
    ), rc AS (
      SELECT rr.t AS r, cc.t AS c
      FROM (SELECT unnest(range(0, 16)) AS t) rr,
           (SELECT unnest(range(0, 16)) AS t) cc
    ), cells AS (
      SELECT media_id, r // 4 AS cr, c // 4 AS cc,
             sum((media_id * 7 + r * 16 + c) % 256) // 16 AS vr,
             sum((media_id * 11 + r * 5 + c * 3) % 256) // 16 AS vg,
             sum((media_id * 13 + r * 2 + c * 7) % 256) // 16 AS vb
      FROM ids, rc GROUP BY 1, 2, 3
    )
    SELECT media_id, TRUE AS decoded,
           CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
           {R('sum(vr) / 16.0', 6)} AS mean_r,
           {R('sum(vg) / 16.0', 6)} AS mean_g,
           {R('sum(vb) / 16.0', 6)} AS mean_b
    FROM cells GROUP BY media_id
"""


@register("image_resize_features", oracle=_RESIZE_ORACLE)
def image_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16x16 BMPs block-mean-resized to 4x4 (integer-exact), features
    re-extracted through the real decoder."""
    from .operators.multimodal import (extract_bmp_features, resize_images,
                                       synthesize_bmps)

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 5 == 1).select(
        F.col("doc_id").alias("media_id"))
    small = resize_images(synthesize_bmps(ids, width=16, height=16),
                          out_h=4, out_w=4)
    out = extract_bmp_features(small)
    return _round(out, {"mean_r": 6, "mean_g": 6, "mean_b": 6})


# Cross-modal asset dedup CAPSTONE: one asset = a document with a text
# body, an image rendition, and an audio track; near-duplicate edges
# come from THREE independent modality detectors — text MinHash-LSH
# band collisions, image pHash (hamming <= 2), audio band-energy
# fingerprint (hamming <= 3) — unioned into one edge list and resolved
# to asset-level clusters by distributed min-label propagation. An
# edge in ANY modality merges the assets, so a cluster can be held
# together by a text-only edge on one side and an audio-only edge on
# the other (the cross-modal story a single-modality dedup misses).
# The oracle replays all three pair pipelines + a recursive-CTE
# component closure.
_ASSET_PRED = "doc_id % 6 = 0"

_ASSET_DEDUP_ORACLE = ("WITH RECURSIVE "
    + _shingles_sql(f"WHERE {_ASSET_PRED}") + """
    , hashed AS (
      SELECT doc_id, CAST('0x' || substr(md5(sh), 1, 13) AS BIGINT) AS base
      FROM shingles
    ), sig AS (
      SELECT doc_id,
    """ + ",\n".join(
    f"min(({2 * i + 3} * base + {(i + 1) * 2654435769}) % {_MINHASH_MOD})"
    f" AS h{i}"
    for i in range(8)
) + """
      FROM hashed GROUP BY doc_id
    ), t_banded AS (
      SELECT doc_id, band, key FROM (
        SELECT doc_id,
               unnest([0, 1, 2, 3]) AS band,
               unnest([CAST(h0 AS VARCHAR) || ',' || CAST(h1 AS VARCHAR),
                       CAST(h2 AS VARCHAR) || ',' || CAST(h3 AS VARCHAR),
                       CAST(h4 AS VARCHAR) || ',' || CAST(h5 AS VARCHAR),
                       CAST(h6 AS VARCHAR) || ',' || CAST(h7 AS VARCHAR)])
                 AS key
        FROM sig
      )
    ), text_pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM t_banded a JOIN t_banded b
        ON a.band = b.band AND a.key = b.key
      WHERE a.doc_id < b.doc_id
    ), img_ids AS (
      SELECT doc_id AS media_id, doc_id % 16 AS p
      FROM documents WHERE """ + _ASSET_PRED + """
    ), grid AS (
      SELECT unnest(range(0, 32)) AS t
    ), img_px AS (
      SELECT i.media_id, yy.t AS y, xx.t AS x,
             least(CAST(255 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
               floor(128.0
                 + (40 + i.media_id % 3)
                   * cos((2*xx.t+1) * (i.p % 7 + 1) * pi() / 64.0)
                   * cos((2*yy.t+1) * (i.p % 5 + 1) * pi() / 64.0)
                 + 25 * cos((2*xx.t+1) * (i.p % 6 + 1) * pi() / 64.0)
                      * cos((2*yy.t+1) * (i.p % 4 + 2) * pi() / 64.0)
                 + 15 * cos((2*xx.t+1) * (i.p % 5 + 2) * pi() / 64.0)
                      * cos((2*yy.t+1) * (i.p % 3 + 3) * pi() / 64.0)
                 + 0.5))) AS v
      FROM img_ids i, grid xx, grid yy
    ), uv AS (
      SELECT uu.t AS u, vv.t AS v
      FROM (SELECT unnest(range(0, 8)) AS t) uu,
           (SELECT unnest(range(0, 8)) AS t) vv
      WHERE NOT (uu.t = 0 AND vv.t = 0)
    ), img_coef AS (
      SELECT p.media_id, uv.u, uv.v,
             CAST(floor(sum(p.v
               * (CASE WHEN uv.u = 0 THEN sqrt(1.0/32.0)
                       ELSE sqrt(2.0/32.0) END)
               * cos((2*p.x+1) * uv.u * pi() / 64.0)
               * (CASE WHEN uv.v = 0 THEN sqrt(1.0/32.0)
                       ELSE sqrt(2.0/32.0) END)
               * cos((2*p.y+1) * uv.v * pi() / 64.0)
             ) * 1000000.0 + 0.5) AS BIGINT) AS q
      FROM img_px p, uv GROUP BY 1, 2, 3
    ), img_hash AS (
      SELECT media_id,
             CAST(sum(CASE WHEN q > 100000000
                      THEN (CAST(1 AS BIGINT) << (u * 8 + v - 1))
                      ELSE 0 END) AS BIGINT) AS phash
      FROM img_coef GROUP BY 1
    ), img_pairs AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b
      FROM img_hash a JOIN img_hash b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.phash, b.phash)) <= 2
    ), aud_ids AS (
      SELECT doc_id AS media_id, doc_id % 8 AS g, 1 + doc_id % 3 AS fac
      FROM documents WHERE """ + _ASSET_PRED + """
    ), aud_t AS (
      SELECT unnest(range(0, 4096)) AS k
    ), aud_s AS (
      SELECT media_id, k // 256 AS f, (k % 256) // 64 AS b,
             fac * (((g * 37 + k * 101) % 4001) - 2000) AS v
      FROM aud_ids, aud_t
    ), aud_e AS (
      SELECT media_id, f, b, sum(v * v) AS e FROM aud_s GROUP BY 1, 2, 3
    ), aud_bits AS (
      SELECT a.media_id, a.b * 15 + a.f AS idx, (n.e > a.e) AS bit
      FROM aud_e a JOIN aud_e n ON a.media_id = n.media_id
                                AND a.b = n.b AND n.f = a.f + 1
      WHERE a.f < 15
    ), aud_fp AS (
      SELECT media_id,
             CAST(sum(CASE WHEN bit
                      THEN (CAST(1 AS BIGINT) << idx) ELSE 0 END)
                  AS BIGINT) AS fp
      FROM aud_bits GROUP BY 1
    ), aud_pairs AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b
      FROM aud_fp a JOIN aud_fp b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.fp, b.fp)) <= 3
    ), all_pairs AS (
      SELECT id_a, id_b FROM text_pairs
      UNION SELECT id_a, id_b FROM img_pairs
      UNION SELECT id_a, id_b FROM aud_pairs
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM all_pairs
      UNION SELECT id_b, id_a FROM all_pairs
    ), reach(node, lab) AS (
      SELECT doc_id, doc_id FROM documents WHERE """ + _ASSET_PRED + """
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    ), comp AS (
      SELECT node, min(lab) AS cluster_rep FROM reach GROUP BY node
    )
    SELECT node AS doc_id, cluster_rep,
           count(*) OVER (PARTITION BY cluster_rep) AS cluster_size
    FROM comp
""")


@register("asset_cross_modal_dedup", oracle=_ASSET_DEDUP_ORACLE)
def asset_cross_modal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset-level near-dup clusters from the UNION of text (MinHash
    LSH), image (pHash), and audio (band-energy fingerprint) edges —
    distributed min-label propagation over the combined edge list."""
    from .operators.dedup import (duplicate_clusters, lsh_candidate_pairs,
                                  minhash_signatures, simhash_near_pairs)
    from .operators.multimodal import (extract_audio_fingerprint,
                                       extract_image_phash,
                                       synthesize_pattern_bmps,
                                       synthesize_tone_wavs)

    docs = _t(spark, sf_dir, "documents")
    assets = docs.where(F.col("doc_id") % 6 == 0)
    ids = assets.select(F.col("doc_id").alias("media_id"))

    sig = minhash_signatures(assets, num_hashes=8, shingle_k=3)
    text_pairs = lsh_candidate_pairs(sig, num_hashes=8, bands=4) \
        .select("id_a", "id_b")
    img_pairs = simhash_near_pairs(
        extract_image_phash(synthesize_pattern_bmps(ids),
                            method="fixed", tau=100.0),
        id_col="media_id", sig_col="phash",
        bits=64, bands=4, max_hamming=2,
    ).select("id_a", "id_b")
    aud_pairs = simhash_near_pairs(
        extract_audio_fingerprint(synthesize_tone_wavs(ids)),
        id_col="media_id", sig_col="fingerprint",
        bits=60, bands=4, max_hamming=3,
    ).select("id_a", "id_b")

    pairs = text_pairs.unionByName(img_pairs).unionByName(aud_pairs) \
        .distinct()
    return duplicate_clusters(pairs, assets.select("doc_id"))


# Stream cross-section hydraulics (inst/patches/patch_54.R views 1-4,
# operators/cross_section.py): points -> panel calculated hydraulics
# -> manual/calculated preference -> section rollup (wetted width, net
# /total area incl. ice+slush, discharge) -> preference again.
# Synthesized hierarchy: orders rows are panels (orderkey % 37 -> 37
# sections x ~400 panels at sf0.01), lineitems are point velocity
# readings. All synthetic magnitudes are dyadic (k/16 multiples) so
# products are exact; DERIVED sums/means go through the repo exact-sum
# idiom on both sides.
_XS_V_SQL = """
      SELECT o_orderkey AS vertical_id,
             o_orderkey % 37 AS xsection_id,
             (o_orderkey % 13 + 1) * CAST(0.25 AS DOUBLE) AS panel_width_m,
             CASE WHEN o_orderkey % 11 <> 0
                  THEN (o_custkey % 17 + 1) * CAST(0.125 AS DOUBLE)
             END AS panel_flowing_water_depth_m,
             CASE WHEN o_orderkey % 5 = 0
                  THEN (o_orderkey % 8) * CAST(0.25 AS DOUBLE)
             END AS ice_thickness_m,
             CASE WHEN o_orderkey % 10 = 1
                  THEN (o_orderkey % 4 + 1) * CAST(0.125 AS DOUBLE)
             END AS slush_ice_thickness_m,
             CASE WHEN o_orderkey % 7 = 0
                  THEN (o_orderkey % 9 + 2) * CAST(0.5 AS DOUBLE)
             END AS panel_area_m2,
             CASE WHEN o_orderkey % 6 = 0
                  THEN (o_orderkey % 5 + 1) * CAST(0.0625 AS DOUBLE)
             END AS panel_mean_velocity_m_s,
             CASE WHEN o_orderkey % 9 = 0
                  THEN (o_orderkey % 11 + 1) * CAST(0.25 AS DOUBLE)
             END AS panel_discharge_m3_s,
             o_orderkey % 2 = 0 AS use_calculated_values
      FROM orders
"""

_XS_P_SQL = """
      SELECT l_orderkey AS vertical_id,
             (CAST(l_quantity AS BIGINT) % 30) * CAST(0.0625 AS DOUBLE)
               + CAST(0.25 AS DOUBLE) AS velocity_m_s
      FROM lineitem
"""

_XS_VV_SQL = f"""
    v AS ({_XS_V_SQL}),
    p AS ({_XS_P_SQL}),
    pv AS (
      SELECT vertical_id,
             sum(CAST(floor(velocity_m_s * 1000000.0 + 0.5) AS BIGINT))
               / 1000000.0 / count(velocity_m_s) AS pt_vel
      FROM p GROUP BY 1
    ), vc AS (
      SELECT v.vertical_id,
             CASE WHEN panel_width_m IS NOT NULL
                   AND panel_flowing_water_depth_m IS NOT NULL
                  THEN panel_width_m * panel_flowing_water_depth_m
             END AS area_c,
             pv.pt_vel AS vel_c,
             CASE WHEN panel_width_m IS NOT NULL
                   AND panel_flowing_water_depth_m IS NOT NULL
                   AND pv.pt_vel IS NOT NULL
                  THEN panel_width_m * panel_flowing_water_depth_m
                       * pv.pt_vel
             END AS dis_c
      FROM v LEFT JOIN pv USING (vertical_id)
    ), vv AS (
      SELECT v.vertical_id, v.xsection_id, v.panel_width_m,
             v.panel_flowing_water_depth_m, v.ice_thickness_m,
             v.slush_ice_thickness_m, v.use_calculated_values,
             CASE WHEN v.use_calculated_values
                  THEN coalesce(vc.area_c, v.panel_area_m2)
                  ELSE coalesce(v.panel_area_m2, vc.area_c)
             END AS panel_area_m2,
             CASE WHEN v.use_calculated_values
                  THEN coalesce(vc.vel_c, v.panel_mean_velocity_m_s)
                  ELSE coalesce(v.panel_mean_velocity_m_s, vc.vel_c)
             END AS panel_mean_velocity_m_s,
             CASE WHEN v.use_calculated_values
                  THEN coalesce(vc.dis_c, v.panel_discharge_m3_s)
                  ELSE coalesce(v.panel_discharge_m3_s, vc.dis_c)
             END AS panel_discharge_m3_s
      FROM v LEFT JOIN vc USING (vertical_id)
    )
"""

_XS_PANEL_ORACLE = f"""
    WITH {_XS_VV_SQL}
    SELECT vertical_id, xsection_id,
           {R('panel_area_m2', 6)} AS panel_area_m2,
           {R('panel_mean_velocity_m_s', 6)} AS panel_mean_velocity_m_s,
           {R('panel_discharge_m3_s', 6)} AS panel_discharge_m3_s
    FROM vv
"""


def _xs_inputs(spark: SparkSession, sf_dir: str):
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    verticals = o.select(
        k.alias("vertical_id"),
        (k % 37).alias("xsection_id"),
        ((k % 13 + 1) * 0.25).alias("panel_width_m"),
        F.when(k % 11 != 0, (F.col("o_custkey") % 17 + 1) * 0.125)
        .alias("panel_flowing_water_depth_m"),
        F.when(k % 5 == 0, (k % 8) * 0.25).alias("ice_thickness_m"),
        F.when(k % 10 == 1, (k % 4 + 1) * 0.125)
        .alias("slush_ice_thickness_m"),
        F.when(k % 7 == 0, (k % 9 + 2) * 0.5).alias("panel_area_m2"),
        F.when(k % 6 == 0, (k % 5 + 1) * 0.0625)
        .alias("panel_mean_velocity_m_s"),
        F.when(k % 9 == 0, (k % 11 + 1) * 0.25)
        .alias("panel_discharge_m3_s"),
        (k % 2 == 0).alias("use_calculated_values"),
    )
    li = _t(spark, sf_dir, "lineitem")
    points = li.select(
        F.col("l_orderkey").alias("vertical_id"),
        ((F.col("l_quantity").cast("long") % 30) * 0.0625 + 0.25)
        .alias("velocity_m_s"),
    )
    return verticals, points


@register("cross_section_panel_hydraulics", oracle=_XS_PANEL_ORACLE)
def cross_section_panel_hydraulics(
        spark: SparkSession, sf_dir: str) -> DataFrame:
    """patch_54 views 1+2: per-panel calculated hydraulics from point
    velocities, resolved through the manual/calculated preference."""
    from .operators.cross_section import verticals_view

    verticals, points = _xs_inputs(spark, sf_dir)
    out = verticals_view(verticals, points).select(
        "vertical_id", "xsection_id", "panel_area_m2",
        "panel_mean_velocity_m_s", "panel_discharge_m3_s")
    return _round(out, {"panel_area_m2": 6, "panel_mean_velocity_m_s": 6,
                        "panel_discharge_m3_s": 6})


_XS_CS_SQL = """
      SELECT DISTINCT o_orderkey % 37 AS xsection_id,
             CASE WHEN (o_orderkey % 37) % 3 = 0
                  THEN ((o_orderkey % 37) % 6 + 3) * CAST(0.5 AS DOUBLE)
             END AS wetted_width_m,
             CASE WHEN (o_orderkey % 37) % 4 = 1
                  THEN ((o_orderkey % 37) % 7 + 5) * CAST(0.25 AS DOUBLE)
             END AS total_area_m2,
             CASE WHEN (o_orderkey % 37) % 4 = 2
                  THEN ((o_orderkey % 37) % 5 + 4) * CAST(0.25 AS DOUBLE)
             END AS net_area_m2,
             CASE WHEN (o_orderkey % 37) % 5 = 0
                  THEN ((o_orderkey % 37) % 9 + 1) * CAST(0.125 AS DOUBLE)
             END AS avg_total_depth_m,
             CASE WHEN (o_orderkey % 37) % 5 = 1
                  THEN ((o_orderkey % 37) % 3 + 1) * CAST(0.125 AS DOUBLE)
             END AS avg_velocity_m_s,
             CASE WHEN (o_orderkey % 37) % 6 = 3
                  THEN ((o_orderkey % 37) % 13 + 2) * CAST(0.5 AS DOUBLE)
             END AS discharge_m3_s,
             CASE WHEN (o_orderkey % 37) % 7 = 2
                  THEN ((o_orderkey % 37) % 4 + 1) * CAST(0.125 AS DOUBLE)
             END AS ice_avg_thickness_m,
             CASE WHEN (o_orderkey % 37) % 7 = 4
                  THEN ((o_orderkey % 37) % 6 + 1) * CAST(0.25 AS DOUBLE)
             END AS ice_area_m2,
             CASE WHEN (o_orderkey % 37) % 8 = 5
                  THEN ((o_orderkey % 37) % 3 + 1) * CAST(0.0625 AS DOUBLE)
             END AS slush_avg_thickness_m,
             CASE WHEN (o_orderkey % 37) % 8 = 6
                  THEN ((o_orderkey % 37) % 5 + 1) * CAST(0.125 AS DOUBLE)
             END AS slush_area_m2,
             (o_orderkey % 37) % 2 = 0 AS use_calculated_values
      FROM orders
"""

_XS_ESUM = "sum(CAST(floor({x} * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0"
_XS_EMEAN = _XS_ESUM + " / count({x})"

_XS_SECTION_ORACLE = f"""
    WITH {_XS_VV_SQL},
    cs AS ({_XS_CS_SQL}),
    agg AS (
      SELECT xsection_id,
             {_XS_ESUM.format(x='panel_width_m')} AS ww_c,
             {_XS_ESUM.format(x='panel_area_m2')} AS na_c,
             {_XS_EMEAN.format(x='panel_flowing_water_depth_m')} AS ad_c,
             {_XS_EMEAN.format(x='panel_mean_velocity_m_s')} AS av_c,
             {_XS_ESUM.format(x='panel_discharge_m3_s')} AS q_c,
             {_XS_EMEAN.format(x='ice_thickness_m')} AS it_c,
             {_XS_ESUM.format(x='panel_width_m * ice_thickness_m')} AS ia_c,
             {_XS_EMEAN.format(x='slush_ice_thickness_m')} AS st_c,
             {_XS_ESUM.format(x='panel_width_m * slush_ice_thickness_m')}
               AS sa_c
      FROM vv GROUP BY 1
    ), calc AS (
      SELECT cs.xsection_id, a.ww_c, a.na_c, a.ad_c, a.av_c, a.q_c,
             a.it_c, a.ia_c, a.st_c, a.sa_c,
             CASE WHEN a.na_c IS NOT NULL OR a.ia_c IS NOT NULL
                   OR a.sa_c IS NOT NULL
                  THEN coalesce(a.na_c, 0) + coalesce(a.ia_c, 0)
                       + coalesce(a.sa_c, 0)
             END AS ta_c
      FROM cs LEFT JOIN agg a USING (xsection_id)
    )
    SELECT cs.xsection_id, cs.use_calculated_values,
           {R("CASE WHEN cs.use_calculated_values THEN coalesce(c.ww_c, cs.wetted_width_m) ELSE coalesce(cs.wetted_width_m, c.ww_c) END", 6)} AS wetted_width_m,
           {R("CASE WHEN cs.use_calculated_values THEN coalesce(c.ta_c, cs.total_area_m2) ELSE coalesce(cs.total_area_m2, c.ta_c) END", 6)} AS total_area_m2,
           {R("CASE WHEN cs.use_calculated_values THEN coalesce(c.na_c, cs.net_area_m2) ELSE coalesce(cs.net_area_m2, c.na_c) END", 6)} AS net_area_m2,
           {R("CASE WHEN cs.use_calculated_values THEN coalesce(c.ad_c, cs.avg_total_depth_m) ELSE coalesce(cs.avg_total_depth_m, c.ad_c) END", 6)} AS avg_total_depth_m,
           {R("CASE WHEN cs.use_calculated_values THEN coalesce(c.av_c, cs.avg_velocity_m_s) ELSE coalesce(cs.avg_velocity_m_s, c.av_c) END", 6)} AS avg_velocity_m_s,
           {R("CASE WHEN cs.use_calculated_values THEN coalesce(c.q_c, cs.discharge_m3_s) ELSE coalesce(cs.discharge_m3_s, c.q_c) END", 6)} AS discharge_m3_s,
           {R("CASE WHEN cs.use_calculated_values THEN coalesce(c.it_c, cs.ice_avg_thickness_m) ELSE coalesce(cs.ice_avg_thickness_m, c.it_c) END", 6)} AS ice_avg_thickness_m,
           {R("CASE WHEN cs.use_calculated_values THEN coalesce(c.ia_c, cs.ice_area_m2) ELSE coalesce(cs.ice_area_m2, c.ia_c) END", 6)} AS ice_area_m2,
           {R("CASE WHEN cs.use_calculated_values THEN coalesce(c.st_c, cs.slush_avg_thickness_m) ELSE coalesce(cs.slush_avg_thickness_m, c.st_c) END", 6)} AS slush_avg_thickness_m,
           {R("CASE WHEN cs.use_calculated_values THEN coalesce(c.sa_c, cs.slush_area_m2) ELSE coalesce(cs.slush_area_m2, c.sa_c) END", 6)} AS slush_area_m2
    FROM cs JOIN calc c USING (xsection_id)
"""


@register("cross_section_discharge", oracle=_XS_SECTION_ORACLE)
def cross_section_discharge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """patch_54 views 3+4 end-to-end: section hydraulics rolled up
    from preferred panel values, then resolved through the section
    preference ladder (operators/cross_section.cross_sections_view)."""
    from .operators.cross_section import cross_sections_view

    verticals, points = _xs_inputs(spark, sf_dir)
    x = F.col("xsection_id")
    cs = verticals.select("xsection_id").distinct().select(
        "xsection_id",
        F.when(x % 3 == 0, (x % 6 + 3) * 0.5).alias("wetted_width_m"),
        F.when(x % 4 == 1, (x % 7 + 5) * 0.25).alias("total_area_m2"),
        F.when(x % 4 == 2, (x % 5 + 4) * 0.25).alias("net_area_m2"),
        F.when(x % 5 == 0, (x % 9 + 1) * 0.125).alias("avg_total_depth_m"),
        F.when(x % 5 == 1, (x % 3 + 1) * 0.125).alias("avg_velocity_m_s"),
        F.when(x % 6 == 3, (x % 13 + 2) * 0.5).alias("discharge_m3_s"),
        F.when(x % 7 == 2, (x % 4 + 1) * 0.125)
        .alias("ice_avg_thickness_m"),
        F.when(x % 7 == 4, (x % 6 + 1) * 0.25).alias("ice_area_m2"),
        F.when(x % 8 == 5, (x % 3 + 1) * 0.0625)
        .alias("slush_avg_thickness_m"),
        F.when(x % 8 == 6, (x % 5 + 1) * 0.125).alias("slush_area_m2"),
        (x % 2 == 0).alias("use_calculated_values"),
    )
    out = cross_sections_view(cs, verticals, points).select(
        "xsection_id", "use_calculated_values", "wetted_width_m",
        "total_area_m2", "net_area_m2", "avg_total_depth_m",
        "avg_velocity_m_s", "discharge_m3_s", "ice_avg_thickness_m",
        "ice_area_m2", "slush_avg_thickness_m", "slush_area_m2")
    return _round(out, {c: 6 for c in out.columns
                        if c not in ("xsection_id",
                                     "use_calculated_values")})


_GATE_ORACLE = f"""
    WITH m AS (
      SELECT doc_id,
             CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN 'web' WHEN 1 THEN 'code'
               WHEN 2 THEN 'wiki' ELSE 'books' END AS domain,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]',
                                                  '', 'g')) AS n_punct,
             string_split(lower(text), ' ') AS ltoks
      FROM documents
    ), q AS (
      SELECT doc_id, domain,
             {R('(least(n_chars / 200.0, 1.0)'
                " + least(CAST(len(list_filter(ltoks, t -> t IN"
                " ('the','a','an','and','or','of','to','in','is','it',"
                "'that','for','on','with','as','are','was','at','by','be')))"
                ' AS DOUBLE) / greatest(len(ltoks), 1) * 5.0, 1.0)'
                ' + (1.0 - least(CAST(n_punct AS DOUBLE)'
                ' / greatest(n_chars, 1) * 4.0, 1.0))) / 3.0', 6)} AS quality
      FROM m
    ), ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY domain
                                ORDER BY quality DESC, doc_id) AS rnk,
             count(*) OVER (PARTITION BY domain) AS n
      FROM q
    )
    SELECT doc_id, domain, quality, CAST(rnk AS BIGINT) AS rnk,
           rnk <= CAST(ceil(0.3 * n) AS BIGINT) AS kept
    FROM ranked
"""


# ---------------------------------------------------------------------------
# URL normalization + domain-level curation rollup (operators/web.py):
# canonical URLs, registered domains (public-suffix-aware), per-domain
# doc/host/url-dup/token/https statistics — the domain axis of corpus
# curation. URLs are synthesized deterministically from documents
# (the fixture carries none); every normalization rule mirrors 1:1.
# ---------------------------------------------------------------------------

_URL_SQL = """
      lower(
        (CASE WHEN doc_id % 4 = 0 THEN 'https://' ELSE 'http://' END)
        || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
        || (CASE WHEN doc_id % 7 = 0 THEN 'cdn.' ELSE '' END)
        || source
        || (CASE WHEN doc_id % 5 = 0 THEN '.co.uk' ELSE '.example.com' END)
        || (CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END)
        || '/p/' || CAST(doc_id % 50 AS VARCHAR)
        || (CASE WHEN doc_id % 2 = 0
            THEN '?b=2&utm_source=x&a=' || CAST(doc_id % 3 AS VARCHAR)
            ELSE '' END)
      )
"""

_URL_ROLLUP_ORACLE = f"""
    WITH raw AS (
      SELECT doc_id, text, {_URL_SQL} AS url FROM documents
    ), parsed0 AS (
      SELECT doc_id, text,
             regexp_replace(regexp_replace(url, '^[a-z][a-z0-9+.-]*://', ''),
                            '^www\\.', '') AS rest,
             starts_with(url, 'https://') AS is_https
      FROM raw
    ), parsed1 AS (
      SELECT *, string_split_regex(rest, '[/?]')[1] AS hostport
      FROM parsed0
    ), parsed2 AS (
      SELECT *,
             regexp_replace(hostport, ':\\d+$', '') AS host,
             CASE WHEN regexp_extract(hostport, ':(\\d+)$', 1)
                       IN ('', '80', '443') THEN ''
                  ELSE ':' || regexp_extract(hostport, ':(\\d+)$', 1)
             END AS port_norm,
             substr(rest, len(hostport) + 1) AS after_host
      FROM parsed1
    ), parsed3 AS (
      SELECT *,
             CASE WHEN string_split_regex(after_host, '\\?')[1] = ''
                  THEN '/' ELSE string_split_regex(after_host, '\\?')[1]
             END AS path,
             CASE WHEN position('?' IN after_host) > 0
                  THEN substr(after_host, position('?' IN after_host) + 1)
                  ELSE '' END AS raw_query
      FROM parsed2
    ), parsed4 AS (
      SELECT *,
             -- array_to_string([]) is NULL in DuckDB (Spark
             -- array_join gives '') — coalesce to match
             coalesce(array_to_string(list_sort(list_filter(
               string_split(raw_query, '&'),
               p -> p <> '' AND NOT (starts_with(p, 'utm_')
                 OR string_split(p, '=')[1] IN ('fbclid', 'gclid',
                                                'ref')))), '&'), '')
               AS query_norm,
             string_split(host, '.') AS labels
      FROM parsed3
    ), parsed AS (
      SELECT doc_id, host, is_https,
             len(string_split(lower(text), ' ')) AS ntok,
             host || port_norm || path
               || (CASE WHEN query_norm = '' THEN ''
                   ELSE '?' || query_norm END) AS url_norm,
             CASE
               WHEN labels[-2] || '.' || labels[-1] IN
                    ('co.uk','ac.uk','gov.uk','com.au','net.au','org.au',
                     'co.jp','com.br','gc.ca','on.ca','qc.ca')
                    AND len(labels) >= 3
               THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
               WHEN len(labels) >= 2 THEN labels[-2] || '.' || labels[-1]
               ELSE host END AS registered_domain
      FROM parsed4
    ), per_url AS (
      SELECT registered_domain, url_norm, count(*) AS n
      FROM parsed GROUP BY 1, 2
    ), url_dups AS (
      SELECT registered_domain, sum(n - 1) AS dup_url_docs,
             count(*) AS n_urls
      FROM per_url GROUP BY 1
    ), stats AS (
      SELECT registered_domain, count(*) AS n_docs,
             count(DISTINCT host) AS n_hosts,
             sum(ntok) AS total_tokens,
             sum(CASE WHEN is_https THEN 1 ELSE 0 END) AS n_https
      FROM parsed GROUP BY 1
    )
    SELECT s.registered_domain, s.n_docs, s.n_hosts, u.n_urls,
           u.dup_url_docs, s.total_tokens,
           {R('s.n_https / CAST(s.n_docs AS DOUBLE)', 6)} AS https_frac
    FROM stats s JOIN url_dups u USING (registered_domain)
"""


@register("url_domain_rollup", oracle=_URL_ROLLUP_ORACLE)
def url_domain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + registered-domain rollup
    (operators/web.domain_rollup)."""
    from .operators.web import domain_rollup

    docs = _t(spark, sf_dir, "documents")
    url = F.lower(F.concat(
        F.when(F.col("doc_id") % 4 == 0, "https://").otherwise("http://"),
        F.when(F.col("doc_id") % 3 == 0, "www.").otherwise(""),
        F.when(F.col("doc_id") % 7 == 0, "cdn.").otherwise(""),
        F.col("source"),
        F.when(F.col("doc_id") % 5 == 0, ".co.uk").otherwise(".example.com"),
        F.when(F.col("doc_id") % 11 == 0, ":443").otherwise(""),
        F.lit("/p/"), (F.col("doc_id") % 50).cast("string"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("?b=2&utm_source=x&a="),
                     (F.col("doc_id") % 3).cast("string")),
        ).otherwise(""),
    ))
    out = domain_rollup(docs.withColumn("url", url))
    return _round(out, {"https_frac": 6})


# PSL-table variant: registered domains resolve against the broadcast
# public-suffix snapshot (fixtures/public_suffix_snapshot.csv) instead
# of the embedded 11-suffix set — .com.mx / .co.nz / 3-label k12.ca.us
# hosts roll up correctly, non-default :8080 ports stay in the
# canonical URL but out of the domain, and gclidx=1 (prefix of a
# tracking NAME, not the name itself) survives canonicalization.
_URL_PSL_SQL = """
      lower(
        (CASE WHEN doc_id % 4 = 0 THEN 'https://' ELSE 'http://' END)
        || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
        || (CASE WHEN doc_id % 7 = 0 THEN 'shop.' ELSE '' END)
        || source
        || (CASE doc_id % 6 WHEN 0 THEN '.com.mx' WHEN 1 THEN '.co.nz'
            WHEN 2 THEN '.k12.ca.us' WHEN 3 THEN '.example.org'
            WHEN 4 THEN '.com.au' ELSE '.io' END)
        || (CASE WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END)
        || '/p/' || CAST(doc_id % 50 AS VARCHAR)
        || (CASE WHEN doc_id % 2 = 0
            THEN '?b=2&utm_source=x&gclidx=1&ref=abc&a='
                 || CAST(doc_id % 3 AS VARCHAR)
            ELSE '' END)
      )
"""

_PSL_CSV = _FIXDIR.parent / "public_suffix_snapshot.csv"

_URL_PSL_ORACLE = f"""
    WITH psl AS (
      SELECT suffix FROM read_csv('{_PSL_CSV}', header=true)
    ), raw AS (
      SELECT doc_id, text, {_URL_PSL_SQL} AS url FROM documents
    ), parsed0 AS (
      SELECT doc_id, text,
             regexp_replace(regexp_replace(url, '^[a-z][a-z0-9+.-]*://', ''),
                            '^www\\.', '') AS rest,
             starts_with(url, 'https://') AS is_https
      FROM raw
    ), parsed1 AS (
      SELECT *, string_split_regex(rest, '[/?]')[1] AS hostport
      FROM parsed0
    ), parsed2 AS (
      SELECT *,
             regexp_replace(hostport, ':\\d+$', '') AS host,
             CASE WHEN regexp_extract(hostport, ':(\\d+)$', 1)
                       IN ('', '80', '443') THEN ''
                  ELSE ':' || regexp_extract(hostport, ':(\\d+)$', 1)
             END AS port_norm,
             substr(rest, len(hostport) + 1) AS after_host
      FROM parsed1
    ), parsed3 AS (
      SELECT *,
             CASE WHEN string_split_regex(after_host, '\\?')[1] = ''
                  THEN '/' ELSE string_split_regex(after_host, '\\?')[1]
             END AS path,
             CASE WHEN position('?' IN after_host) > 0
                  THEN substr(after_host, position('?' IN after_host) + 1)
                  ELSE '' END AS raw_query
      FROM parsed2
    ), parsed4 AS (
      SELECT *,
             coalesce(array_to_string(list_sort(list_filter(
               string_split(raw_query, '&'),
               p -> p <> '' AND NOT (starts_with(p, 'utm_')
                 OR string_split(p, '=')[1] IN ('fbclid', 'gclid',
                                                'ref')))), '&'), '')
               AS query_norm,
             string_split(host, '.') AS labels
      FROM parsed3
    ), tails AS (
      SELECT *,
             CASE WHEN len(labels) >= 2
                  THEN labels[-2] || '.' || labels[-1] END AS tail2,
             CASE WHEN len(labels) >= 3
                  THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
             END AS tail3
      FROM parsed4
    ), joined AS (
      SELECT t.*, s2.suffix AS m2, s3.suffix AS m3
      FROM tails t
      LEFT JOIN psl s2 ON t.tail2 = s2.suffix
      LEFT JOIN psl s3 ON t.tail3 = s3.suffix
    ), parsed AS (
      SELECT doc_id, host, is_https,
             len(string_split(lower(text), ' ')) AS ntok,
             host || port_norm || path
               || (CASE WHEN query_norm = '' THEN ''
                   ELSE '?' || query_norm END) AS url_norm,
             CASE
               WHEN m3 IS NOT NULL AND len(labels) >= 4
               THEN labels[-4] || '.' || tail3
               WHEN m3 IS NOT NULL THEN host
               WHEN m2 IS NOT NULL AND len(labels) >= 3
               THEN labels[-3] || '.' || tail2
               WHEN m2 IS NOT NULL THEN host
               WHEN len(labels) >= 2 THEN tail2
               ELSE host END AS registered_domain
      FROM joined
    ), per_url AS (
      SELECT registered_domain, url_norm, count(*) AS n
      FROM parsed GROUP BY 1, 2
    ), url_dups AS (
      SELECT registered_domain, sum(n - 1) AS dup_url_docs,
             count(*) AS n_urls
      FROM per_url GROUP BY 1
    ), stats AS (
      SELECT registered_domain, count(*) AS n_docs,
             count(DISTINCT host) AS n_hosts,
             sum(ntok) AS total_tokens,
             sum(CASE WHEN is_https THEN 1 ELSE 0 END) AS n_https
      FROM parsed GROUP BY 1
    )
    SELECT s.registered_domain, s.n_docs, s.n_hosts, u.n_urls,
           u.dup_url_docs, s.total_tokens,
           {R('s.n_https / CAST(s.n_docs AS DOUBLE)', 6)} AS https_frac
    FROM stats s JOIN url_dups u USING (registered_domain)
"""


@register("url_domain_rollup_psl", oracle=_URL_PSL_ORACLE)
def url_domain_rollup_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain rollup with the public-suffix table broadcast
    (operators/web.registered_domain_psl): longest-suffix matching on
    the PSL snapshot dim, mixed 2-/3-label suffixes, non-default
    ports, name-exact tracking-param dropping."""
    from .operators.web import domain_rollup, load_psl

    docs = _t(spark, sf_dir, "documents")
    url = F.lower(F.concat(
        F.when(F.col("doc_id") % 4 == 0, "https://").otherwise("http://"),
        F.when(F.col("doc_id") % 3 == 0, "www.").otherwise(""),
        F.when(F.col("doc_id") % 7 == 0, "shop.").otherwise(""),
        F.col("source"),
        F.when(F.col("doc_id") % 6 == 0, ".com.mx")
        .when(F.col("doc_id") % 6 == 1, ".co.nz")
        .when(F.col("doc_id") % 6 == 2, ".k12.ca.us")
        .when(F.col("doc_id") % 6 == 3, ".example.org")
        .when(F.col("doc_id") % 6 == 4, ".com.au")
        .otherwise(".io"),
        F.when(F.col("doc_id") % 11 == 0, ":8080").otherwise(""),
        F.lit("/p/"), (F.col("doc_id") % 50).cast("string"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("?b=2&utm_source=x&gclidx=1&ref=abc&a="),
                     (F.col("doc_id") % 3).cast("string")),
        ).otherwise(""),
    ))
    out = domain_rollup(docs.withColumn("url", url), psl=load_psl(spark))
    return _round(out, {"https_frac": 6})


# Full publicsuffix.org algorithm (operators/web.registered_domain_psl
# + psl_rule_dim): wildcard rules (*.ck, *.kawasaki.jp) match one
# extra host label, exception rules (!www.ck, !city.kawasaki.jp) beat
# everything and shorten the suffix by one label, 4-label literal
# rules resolve 5-label hosts, hosts that ARE a public suffix resolve
# to themselves, and unmatched TLDs fall back to the implicit '*'
# rule. The oracle replays the algorithm rule-by-rule from the SAME
# snapshot CSV (tiny non-equi join + arg_max), not a hand-coded
# per-case table.
_PSL_WILD_HOST_SQL = """
  CASE doc_id % 9
    WHEN 0 THEN 'h' || CAST(doc_id % 5 AS VARCHAR) || '.example.ck'
    WHEN 1 THEN 'www.ck'
    WHEN 2 THEN 'a' || CAST(doc_id % 3 AS VARCHAR) || '.b.kawasaki.jp'
    WHEN 3 THEN 'city.kawasaki.jp'
    WHEN 4 THEN 's' || CAST(doc_id % 4 AS VARCHAR)
                || '.cdn.prod.atlassian-dev.net'
    WHEN 5 THEN 'cdn.prod.atlassian-dev.net'
    WHEN 6 THEN 'deep' || CAST(doc_id % 2 AS VARCHAR)
                || '.example.k12.ca.us'
    WHEN 7 THEN 'foo' || CAST(doc_id % 3 AS VARCHAR) || '.ck'
    ELSE 'plain' || CAST(doc_id % 6 AS VARCHAR) || '.example.io'
  END
"""

_PSL_WILD_ORACLE = f"""
    WITH rules0 AS (
      SELECT suffix AS rule FROM read_csv('{_PSL_CSV}', header=true)
    ), rules AS (
      SELECT CASE WHEN rule LIKE '!%' THEN substr(rule, 2)
                  WHEN rule LIKE '*.%' THEN substr(rule, 3)
                  ELSE rule END AS match_key,
             (rule LIKE '*.%') AS wild,
             CASE WHEN rule LIKE '!%' THEN 10000
                  WHEN rule LIKE '*.%'
                  THEN len(string_split(substr(rule, 3), '.')) + 1
                  ELSE len(string_split(rule, '.')) END AS prio,
             CASE WHEN rule LIKE '!%'
                  THEN len(string_split(substr(rule, 2), '.')) - 1
                  WHEN rule LIKE '*.%'
                  THEN len(string_split(substr(rule, 3), '.')) + 1
                  ELSE len(string_split(rule, '.')) END AS pub_len
      FROM rules0
    ), hosts AS (
      SELECT doc_id, {_PSL_WILD_HOST_SQL} AS host FROM documents
    ), lab AS (
      SELECT doc_id, host, string_split(host, '.') AS labels FROM hosts
    ), matches AS (
      SELECT l.doc_id, r.prio * 16 + r.pub_len AS ord, r.pub_len
      FROM lab l JOIN rules r
        ON len(l.labels) >= len(string_split(r.match_key, '.'))
            + (CASE WHEN r.wild THEN 1 ELSE 0 END)
       AND array_to_string(list_slice(l.labels,
             len(l.labels) - len(string_split(r.match_key, '.')) + 1,
             len(l.labels)), '.') = r.match_key
    ), best AS (
      SELECT doc_id, arg_max(pub_len, ord) AS pub_len
      FROM matches GROUP BY doc_id
    ), resolved AS (
      SELECT l.doc_id, l.host,
             CASE WHEN len(l.labels) > coalesce(b.pub_len, 1)
                  THEN array_to_string(list_slice(l.labels,
                        len(l.labels) - coalesce(b.pub_len, 1),
                        len(l.labels)), '.')
                  ELSE l.host END AS registered_domain
      FROM lab l LEFT JOIN best b USING (doc_id)
    )
    SELECT registered_domain,
           count(*) AS n_docs,
           count(DISTINCT host) AS n_hosts
    FROM resolved GROUP BY 1
"""


@register("psl_wildcard_resolution", oracle=_PSL_WILD_ORACLE)
def psl_wildcard_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain resolution under the complete PSL rule
    grammar: wildcards, exceptions, 4-label literals, suffix-only
    hosts, implicit-'*' fallback."""
    from .operators.web import load_psl, registered_domain_psl

    docs = _t(spark, sf_dir, "documents")
    host = (
        F.when(F.col("doc_id") % 9 == 0,
               F.concat(F.lit("h"), (F.col("doc_id") % 5).cast("string"),
                        F.lit(".example.ck")))
        .when(F.col("doc_id") % 9 == 1, F.lit("www.ck"))
        .when(F.col("doc_id") % 9 == 2,
              F.concat(F.lit("a"), (F.col("doc_id") % 3).cast("string"),
                       F.lit(".b.kawasaki.jp")))
        .when(F.col("doc_id") % 9 == 3, F.lit("city.kawasaki.jp"))
        .when(F.col("doc_id") % 9 == 4,
              F.concat(F.lit("s"), (F.col("doc_id") % 4).cast("string"),
                       F.lit(".cdn.prod.atlassian-dev.net")))
        .when(F.col("doc_id") % 9 == 5, F.lit("cdn.prod.atlassian-dev.net"))
        .when(F.col("doc_id") % 9 == 6,
              F.concat(F.lit("deep"), (F.col("doc_id") % 2).cast("string"),
                       F.lit(".example.k12.ca.us")))
        .when(F.col("doc_id") % 9 == 7,
              F.concat(F.lit("foo"), (F.col("doc_id") % 3).cast("string"),
                       F.lit(".ck")))
        .otherwise(
            F.concat(F.lit("plain"), (F.col("doc_id") % 6).cast("string"),
                     F.lit(".example.io")))
    )
    resolved = registered_domain_psl(
        docs.select("doc_id", host.alias("host")), load_psl(spark))
    return resolved.groupBy("registered_domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("host").alias("n_hosts"),
    )


@register("domain_quality_gate", oracle=_GATE_ORACLE)
def domain_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the top 30% of each domain by quality score with a
    deterministic (quality DESC, doc_id) tie-break — rank-based rather
    than interpolated-percentile so the cut reproduces bit-exactly at
    any partitioning.  (At 100 TB swap the full sort for a sampled
    threshold + filter; the rank form is the correctness oracle.)"""
    from .functions.text import quality_score

    docs = _t(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, "web")
        .when(F.col("doc_id") % 4 == 1, "code")
        .when(F.col("doc_id") % 4 == 2, "wiki")
        .otherwise("books").alias("domain"),
        (F.floor(quality_score(F.col("text")) * 1e6 + F.lit(0.5)) / 1e6)
        .alias("quality"),
    )
    w = Window.partitionBy("domain").orderBy(F.desc("quality"), "doc_id")
    wc = Window.partitionBy("domain")
    return (
        q.withColumn("rnk", F.row_number().over(w).cast("long"))
        .withColumn("__n", F.count("*").over(wc))
        .withColumn(
            "kept", F.col("rnk") <= F.ceil(0.3 * F.col("__n")).cast("long")
        )
        .drop("__n")
    )


# ---------------------------------------------------------------------------
# Training-data tier: within-doc token-distribution entropy (the
# low-entropy-boilerplate signal), exact integer micro-nat accumulation.
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), counts AS (
      SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
    ), totals AS (
      SELECT doc_id, sum(c) AS n FROM counts GROUP BY 1
    ), per_doc AS (
      SELECT counts.doc_id,
             sum(CAST(floor(
               (CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)
               * 1000000 + 0.5) AS BIGINT)) AS acc,
             CAST(count(*) AS INT) AS n_distinct
      FROM counts JOIN totals USING (doc_id)
      GROUP BY counts.doc_id
    )
    SELECT doc_id, {R('-CAST(acc AS DOUBLE) / 1000000.0', 6)} AS entropy,
           n_distinct
    FROM per_doc
"""


@register("token_entropy", oracle=_ENTROPY_ORACLE)
def token_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token entropy + distinct count via staged array
    columns (functions/text.token_entropy_cols)."""
    from .functions.text import token_entropy_cols

    docs = _t(spark, sf_dir, "documents")
    out = token_entropy_cols(docs).select("doc_id", "entropy", "n_distinct")
    return _round(out, {"entropy": 6})


# ---------------------------------------------------------------------------
# §2.6/§2.11 adjust() end to end (R/adjust_functions.R:18-250,540-620):
# incoming point-wise QC codes -> run-length segments (prevailing until
# the next change) -> overlay onto the existing interval table (new
# wins, adjacent equal values merge) -> positional id recycling with
# delete actions. The overlay+recycle tail is shared verbatim with the
# segment_id_recycling oracle.
# ---------------------------------------------------------------------------

_ADJUST_SRC_SQL = """
    ex AS (
      SELECT * FROM (VALUES
        ('click', 1, TIMESTAMP '2024-01-03', TIMESTAMP '2024-01-08 12:00:00', 'A'),
        ('click', 2, TIMESTAMP '2024-01-08 12:00:00', TIMESTAMP '2024-01-09 06:00:00', 'B'),
        ('click', 3, TIMESTAMP '2024-01-09 06:00:00', TIMESTAMP '2024-01-11', 'A'),
        ('error', 4, TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-09', 'C'),
        ('error', 5, TIMESTAMP '2024-01-09', TIMESTAMP '2024-01-12', 'B')
      ) AS t(series, segment_id, start_dt, end_dt, value)
    ), pts AS (
      SELECT event_type AS series, CAST(ts AS TIMESTAMP) AS t, event_id,
             CASE WHEN value < 10 THEN 'A'
                  WHEN value < 30 THEN 'B' ELSE 'C' END AS g
      FROM events
      -- one fetch batch's worth of points: the interval algebra
      -- operates on catalog-sized QC segment sets (a batch's runs),
      -- never a month of raw points (adjust_functions.R applies per
      -- getNewContinuous fetch)
      WHERE event_type IN ('click', 'error')
        AND ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-10'
    ), rle0 AS (
      SELECT *, CASE WHEN g IS NOT DISTINCT FROM
                       lag(g) OVER (PARTITION BY series ORDER BY t, event_id)
                THEN 0 ELSE 1 END AS new_run
      FROM pts
    ), rle1 AS (
      SELECT *, sum(new_run) OVER (
        PARTITION BY series ORDER BY t, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM rle0
    ), seg AS (
      SELECT series, min(t) AS rs, max(t) AS re, min(g) AS value
      FROM rle1 GROUP BY series, run
    ), nw0 AS (
      SELECT *, lead(rs) OVER (PARTITION BY series ORDER BY rs) AS nxt
      FROM seg
    ), nw AS (
      SELECT series, rs AS start_dt, COALESCE(nxt, re) AS end_dt, value
      FROM nw0 WHERE COALESCE(nxt, re) > rs
    )
"""

_ADJUST_ORACLE = (
    "WITH " + _ADJUST_SRC_SQL
    + ", allseg AS" + _SEG_IDS_ORACLE.split(", allseg AS", 1)[1]
)


@register("qc_adjust_e2e", oracle=_ADJUST_ORACLE)
def qc_adjust_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """adjust() composition: rle_segments -> prevailing-interval
    conversion -> split_segments -> recycle_split_ids."""
    from .operators.segments import (
        recycle_split_ids, rle_segments, split_segments,
    )

    ev = _t(spark, sf_dir, "events")
    pts = ev.where(
        F.col("event_type").isin("click", "error")
        & (F.col("ts") >= F.lit("2024-01-08").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-10").cast("timestamp"))
    ).select(
        F.col("event_type").alias("series"), "ts", "event_id",
        F.when(F.col("value") < 10, "A")
        .when(F.col("value") < 30, "B").otherwise("C").alias("g"),
    )
    runs = rle_segments(pts, keys=["series"], order_col=["ts", "event_id"],
                        value_col="g")
    w = Window.partitionBy("series").orderBy("start")
    new = (
        runs.withColumn("__nxt", F.lead("start").over(w))
        .withColumn("end_dt", F.coalesce("__nxt", "end"))
        .where(F.col("end_dt") > F.col("start"))
        .select("series", F.col("start").alias("start_dt"), "end_dt",
                F.col("g").alias("value"))
    )
    existing = _ldf(spark, [
        ("click", 1, "2024-01-03 00:00:00", "2024-01-08 12:00:00", "A"),
        ("click", 2, "2024-01-08 12:00:00", "2024-01-09 06:00:00", "B"),
        ("click", 3, "2024-01-09 06:00:00", "2024-01-11 00:00:00", "A"),
        ("error", 4, "2024-01-05 00:00:00", "2024-01-09 00:00:00", "C"),
        ("error", 5, "2024-01-09 00:00:00", "2024-01-12 00:00:00", "B"),
    ], "series string, segment_id int, start_dt string, end_dt string,"
       " value string")
    for c in ("start_dt", "end_dt"):
        existing = existing.withColumn(c, F.col(c).cast("timestamp"))
    final = split_segments(
        existing.drop("segment_id"), new, keys=["series"],
        start_col="start_dt", end_col="end_dt", value_col="value",
    )
    return recycle_split_ids(
        existing, final, keys=["series"], id_col="segment_id",
        start_col="start_dt", end_col="end_dt",
    )


# ---------------------------------------------------------------------------
# Raster x vector composition: per-polygon (basin) raster statistics —
# ST_SummaryStats(ST_Clip(rast, geom)) over tiled storage. The oracle
# proves containment through independent half-plane math on the CCW
# triangles (as in vector_point_in_polygon), not a mirrored ray cast.
# ---------------------------------------------------------------------------

_BASIN_ORACLE = f"""
    WITH cells AS ({_RASTER_CELLS_SQL}),
    tri AS (
      SELECT n_nationkey AS poly_id,
             CAST((n_nationkey * 11) % 70 AS DOUBLE) AS ax,
             CAST((n_nationkey * 23) % 70 AS DOUBLE) AS ay,
             CAST((n_nationkey * 11) % 70 + 20 + n_nationkey % 7 AS DOUBLE) AS bx,
             CAST((n_nationkey * 23) % 70 + 4 + n_nationkey % 5 AS DOUBLE) AS by,
             CAST((n_nationkey * 11) % 70 + 6 + n_nationkey % 4 AS DOUBLE) AS cx,
             CAST((n_nationkey * 23) % 70 + 24 + n_nationkey % 6 AS DOUBLE) AS cy
      FROM nation
    )
    , pts AS (
      SELECT x + 0.137 AS sx, y + 0.269 AS sy, value FROM cells
    )
    SELECT poly_id,
           {R(DSUM('c.value') + ' / count(*)', 6)} AS zmean,
           min(c.value) AS zmin, max(c.value) AS zmax,
           count(*) AS zcount
    FROM tri JOIN pts c
      ON (bx - ax) * (c.sy - ay) - (by - ay) * (c.sx - ax) > 0
     AND (cx - bx) * (c.sy - by) - (cy - by) * (c.sx - bx) > 0
     AND (ax - cx) * (c.sy - cy) - (ay - cy) * (c.sx - cx) > 0
    GROUP BY poly_id
"""


@register("raster_basin_stats", oracle=_BASIN_ORACLE)
def raster_basin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basin-averaged raster values: tiles bbox-pruned against
    broadcast CCW triangle basins, ray-cast refine on cell centers
    (operators/raster.zonal_stats_polygon)."""
    from .operators.raster import tile_cells, zonal_stats_polygon

    nation = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    ax, ay = (k * 11) % 70, (k * 23) % 70
    verts = [
        (ax, ay),
        (ax + 20 + k % 7, ay + 4 + k % 5),
        (ax + 6 + k % 4, ay + 24 + k % 6),
    ]
    polys = nation.select(
        k.cast("int").alias("poly_id"),
        F.array(*[
            F.struct(x.cast("double").alias("x"), y.cast("double").alias("y"))
            for x, y in verts
        ]).alias("ring"),
    )
    tiles = tile_cells(_raster_cells(spark, sf_dir), tile=16)
    out = zonal_stats_polygon(tiles, polys)
    return _round(out, {"zmean": 6})


# ---------------------------------------------------------------------------
# §2.12 measurements_calculated_daily_corrected_at (patch_55.R:3282-3600):
# the daily table recomputed from the point-in-time CORRECTED fact —
# corrections reconstructed from their audit log at p_as_of, then the
# exact same refresh ladder as the live table (the oracle reuses
# _refresh_tail_sql, pinning all three daily queries to one definition).
# ---------------------------------------------------------------------------

_DAILY_CORR_AT_ORACLE = (
    _CRA_ORACLE.split("SELECT event_id, event_type, ts,")[0]
    + f""", daily AS (
      SELECT event_type AS priority, CAST(ts AS DATE) AS date,
             {DSUM('v')} / count(v) AS value
      FROM c_two GROUP BY 1, 2 HAVING count(v) > 0"""
    + _refresh_tail_sql(
        """SELECT event_type AS priority,
             max(CAST(ts AS DATE)) AS last_d
      FROM events GROUP BY 1"""
    )
)


@register("daily_corrected_at", oracle=_DAILY_CORR_AT_ORACLE)
def daily_corrected_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of corrections (operators/audit.rows_as_of) -> corrected
    fact -> full daily refresh ladder (operators/refresh)."""
    from .operators.audit import rows_as_of
    from .operators.refresh import refresh_calculated_daily

    current, log = _cra_frames(spark)
    snap = rows_as_of(current, log, _CRA_AS_OF, field_cols=_CRA_FIELDS)
    rows = sorted(
        (r for r in snap.collect() if r["event_type"] is not None),
        key=lambda r: r["row_id"],
    )
    corrections = [
        Correction(r["row_id"], r["event_type"], str(r["start_dt"]),
                   str(r["end_dt"]), r["ctype"], value1=r["value1"],
                   value2=r["value2"])
        for r in rows
    ]
    raw = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("priority"),
        F.col("ts"), F.col("value"),
    )
    out = refresh_calculated_daily(
        raw, corrections, series_col="priority", dt_col="ts",
        value_col="value", agg_type="mean", today="2026-01-15",
    )
    return _round(
        out,
        {"value": 4, "percent_historic_range": 4, "max": 4, "min": 4,
         "mean": 4, "q10": 4, "q25": 4, "q50": 4, "q75": 4, "q90": 4},
    )


# ---------------------------------------------------------------------------
# Capstone: curated corpus -> packed training manifest. The curation
# head (quality gate -> LSH clusters -> one rep per cluster ->
# cluster-safe split) is shared verbatim with corpus_curation's oracle;
# the kept docs then pack next-fit into 2048-token context windows per
# (split, shard) — the manifest a trainer consumes.
# ---------------------------------------------------------------------------

_MANIFEST_ORACLE = _CURATION_ORACLE.split("    SELECT CASE WHEN bucket")[0] + f"""
    , sel AS (
      SELECT doc_id, bpe_tokens AS n_tokens,
             CASE WHEN bucket < 90 THEN 'train'
                  WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 4 AS shard
      FROM uniq
    ), ord AS (
      SELECT *, row_number() OVER (PARTITION BY split, shard
                                   ORDER BY doc_id) AS rn
      FROM sel
    ), pack AS (
      SELECT split, shard, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS bin_id,
             CAST(0 AS BIGINT) AS bin_offset,
             n_tokens AS fill
      FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.split, o.shard, o.rn, o.doc_id, o.n_tokens,
             CASE WHEN p.fill + o.n_tokens > 2048
                  THEN p.bin_id + 1 ELSE p.bin_id END,
             CASE WHEN p.fill + o.n_tokens > 2048
                  THEN CAST(0 AS BIGINT) ELSE p.fill END,
             CASE WHEN p.fill + o.n_tokens > 2048
                  THEN o.n_tokens ELSE p.fill + o.n_tokens END
      FROM ord o JOIN pack p
        ON o.split = p.split AND o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT split, shard, doc_id, n_tokens, bin_id, bin_offset FROM pack
"""


@register("curation_packed_manifest", oracle=_MANIFEST_ORACLE)
def curation_packed_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate -> near-dup clusters -> cluster reps ->
    cluster-safe split -> next-fit packing per (split, shard): the
    end-to-end path from raw corpus to trainer manifest."""
    from .functions.text import bpe_token_count, quality_score, md5_int
    from .operators.dedup import (
        duplicate_clusters, lsh_candidate_pairs, minhash_signatures,
    )
    from .operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, num_hashes=8, shingle_k=3)
    pairs = lsh_candidate_pairs(sig, num_hashes=8, bands=4)
    clusters = duplicate_clusters(pairs, docs.select("doc_id"))
    q = F.floor(quality_score(F.col("text")) * 1e6 + F.lit(0.5)) / 1e6
    qual = docs.select(
        "doc_id", q.alias("q"),
        bpe_token_count(F.col("text")).alias("n_tokens"),
    )
    kept = qual.where(F.col("q") >= 0.7).join(
        clusters.select("doc_id", "cluster_rep"), "doc_id"
    )
    surv = F.min("doc_id").over(Window.partitionBy("cluster_rep"))
    sel = (
        kept.withColumn("__surv", surv)
        .where(F.col("doc_id") == F.col("__surv"))
        .withColumn("bucket", _split_bucket(F.col("cluster_rep")))
        .select(
            "doc_id", "n_tokens",
            F.when(F.col("bucket") < 90, "train")
            .when(F.col("bucket") < 95, "val").otherwise("test")
            .alias("split"),
            (md5_int(F.col("doc_id").cast("string")) % 4).alias("shard"),
        )
    )
    return pack_sequences(sel, budget=2048, group_cols=["split", "shard"])


# ---------------------------------------------------------------------------
# Sensor-QC spike detection: Hampel identifier (rolling median ± MAD)
# per series — the automated detector in front of the reference's
# manual grade/qualifier workflow (operators/spike.py).
# ---------------------------------------------------------------------------

_HAMPEL_ORACLE = f"""
    WITH s AS (
      SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value,
             list_sort(list_filter(list(value) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING),
               x -> x IS NOT NULL)) AS win
      FROM events
    ), m AS (
      SELECT *,
             CASE WHEN len(win) % 2 = 1 THEN win[len(win) // 2 + 1]
                  ELSE (win[len(win) // 2] + win[len(win) // 2 + 1]) / 2.0
             END AS wmed
      FROM s
    ), d AS (
      SELECT *, list_sort(list_transform(win, x -> abs(x - wmed))) AS devs
      FROM m
    ), md AS (
      SELECT *,
             CASE WHEN len(devs) % 2 = 1 THEN devs[len(devs) // 2 + 1]
                  ELSE (devs[len(devs) // 2] + devs[len(devs) // 2 + 1]) / 2.0
             END AS mad
      FROM d
    )
    SELECT event_id, event_type, ts,
           {R('wmed', 6)} AS window_median, {R('mad', 6)} AS mad,
           coalesce(CASE WHEN value IS NOT NULL
                         THEN abs(value - wmed) > 3.0 * 1.4826 * mad END,
                    false) AS is_spike
    FROM md
"""


@register("hampel_spike_flags", oracle=_HAMPEL_ORACLE)
def hampel_spike_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel spike flags over events, ±5-point windows, t=3."""
    from .operators.spike import hampel_flags

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    out = hampel_flags(
        ev, keys=["event_type"], dt_col="ts", value_col="value", k=5,
        t=3.0, tiebreak_cols=["event_id"],
    ).select("event_id", "event_type", "ts", "window_median", "mad",
             "is_spike")
    return _round(out, {"window_median": 6, "mad": 6})


# NULL-bearing variant: events.value has zero NULLs at every fixture
# scale factor, so the NULL path of the detector (collect_list drops
# NULLs; the oracle's list() must list_filter them) was latent — this
# query nullifies a deterministic slice so both engines exercise it.
_HAMPEL_NULLS_ORACLE = _HAMPEL_ORACLE.replace(
    "FROM events",
    "FROM (SELECT event_id, event_type, ts,"
    " CASE WHEN event_id % 37 = 0 THEN NULL ELSE value END AS value"
    " FROM events)",
)


@register("hampel_spike_nulls", oracle=_HAMPEL_NULLS_ORACLE)
def hampel_spike_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel flags with every 37th value NULLed: NULLs are excluded
    from the median/MAD window and never flag as spikes."""
    from .operators.spike import hampel_flags

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts",
        F.when(F.col("event_id") % 37 == 0, F.lit(None))
        .otherwise(F.col("value")).alias("value"),
    )
    out = hampel_flags(
        ev, keys=["event_type"], dt_col="ts", value_col="value", k=5,
        t=3.0, tiebreak_cols=["event_id"],
    ).select("event_id", "event_type", "ts", "window_median", "mad",
             "is_spike")
    return _round(out, {"window_median": 6, "mad": 6})


# ---------------------------------------------------------------------------
# Automated QC proposal: Hampel spike flags -> run-length spike
# segments — the interval rows adjust() would then reconcile into the
# qualifier table (detector in front of adjust_functions.R).
# ---------------------------------------------------------------------------

_SPIKE_SEG_ORACLE = f"""
    WITH s AS (
      SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value,
             list_sort(list_filter(list(value) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING),
               x -> x IS NOT NULL)) AS win
      FROM events
    ), m AS (
      SELECT *,
             CASE WHEN len(win) % 2 = 1 THEN win[len(win) // 2 + 1]
                  ELSE (win[len(win) // 2] + win[len(win) // 2 + 1]) / 2.0
             END AS wmed
      FROM s
    ), d AS (
      SELECT *, list_sort(list_transform(win, x -> abs(x - wmed))) AS devs
      FROM m
    ), md AS (
      SELECT event_id, event_type, ts,
             coalesce(CASE WHEN value IS NOT NULL
                  THEN abs(value - (CASE WHEN len(win) % 2 = 1
                                    THEN win[len(win) // 2 + 1]
                                    ELSE (win[len(win) // 2]
                                          + win[len(win) // 2 + 1]) / 2.0 END))
                       > 3.0 * 1.4826
                         * (CASE WHEN len(devs) % 2 = 1
                            THEN devs[len(devs) // 2 + 1]
                            ELSE (devs[len(devs) // 2]
                                  + devs[len(devs) // 2 + 1]) / 2.0 END)
                  END, false) AS is_spike
      FROM d
    ), rle0 AS (
      SELECT *, CASE WHEN is_spike IS NOT DISTINCT FROM
                       lag(is_spike) OVER (PARTITION BY event_type
                                           ORDER BY ts, event_id)
                THEN 0 ELSE 1 END AS new_run
      FROM md
    ), rle1 AS (
      SELECT *, sum(new_run) OVER (
        PARTITION BY event_type ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM rle0
    )
    SELECT event_type, min(ts) AS start, max(ts) AS "end",
           count(*) AS n
    FROM rle1 WHERE is_spike
    GROUP BY event_type, run
"""


@register("spike_qc_segments", oracle=_SPIKE_SEG_ORACLE)
def spike_qc_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hampel_flags -> rle_segments over the boolean flag -> proposed
    spike intervals per series."""
    from .operators.segments import rle_segments
    from .operators.spike import hampel_flags

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    flagged = hampel_flags(
        ev, keys=["event_type"], dt_col="ts", value_col="value", k=5,
        t=3.0, tiebreak_cols=["event_id"],
    ).select("event_type", "ts", "event_id", "is_spike")
    runs = rle_segments(flagged, keys=["event_type"],
                        order_col=["ts", "event_id"], value_col="is_spike")
    return runs.where(F.col("is_spike")).select(
        "event_type", "start", "end", "n"
    )


# ---------------------------------------------------------------------------
# Training-data tier: fragment-level exact-substring duplication — the
# per-doc fraction of tokens covered by k-grams repeated verbatim in
# other documents (the suffix-array dedup signal, approximated with a
# hashed positional-gram inverted index; operators/dedup.py).
# ---------------------------------------------------------------------------

_SPAN_K = 8

_SPAN_COV_ORACLE = f"""
    WITH docs0 AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks
      FROM documents
    ), base AS (
      SELECT doc_id, len(toks) AS n_tokens, toks FROM docs0
    ), grams AS (
      SELECT doc_id, i - 1 AS pos,
             CAST('0x' || substr(md5(array_to_string(
               toks[i : i + {_SPAN_K} - 1], ' ')), 1, 15) AS BIGINT) AS h
      FROM base, unnest(generate_series(1, len(toks) - {_SPAN_K} + 1)) AS t(i)
      WHERE len(toks) >= {_SPAN_K}
    ), repeated AS (
      SELECT h FROM grams GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ), dup AS (
      SELECT g.doc_id, g.pos FROM grams g JOIN repeated USING (h)
    ), cov AS (
      SELECT doc_id,
             CAST(sum(contrib) AS BIGINT) AS dup_tokens,
             count(*) AS dup_spans
      FROM (
        SELECT doc_id, pos,
               CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         IS NULL THEN {_SPAN_K}
                    ELSE LEAST({_SPAN_K},
                               pos - lag(pos) OVER (PARTITION BY doc_id
                                                    ORDER BY pos))
               END AS contrib
        FROM dup
      ) GROUP BY doc_id
    )
    SELECT b.doc_id, CAST(b.n_tokens AS INT) AS n_tokens,
           coalesce(c.dup_spans, 0) AS dup_spans,
           coalesce(c.dup_tokens, 0) AS dup_tokens,
           {R('coalesce(c.dup_tokens, 0)'
              ' / CAST(greatest(b.n_tokens, 1) AS DOUBLE)', 6)}
             AS coverage_frac
    FROM base b LEFT JOIN cov c USING (doc_id)
"""


@register("repeated_span_coverage", oracle=_SPAN_COV_ORACLE)
def repeated_span_coverage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc verbatim-duplication coverage over 8-token grams
    (operators/dedup.repeated_span_coverage)."""
    from .operators.dedup import repeated_span_coverage

    docs = _t(spark, sf_dir, "documents")
    out = repeated_span_coverage(docs, k=_SPAN_K)
    return _round(out, {"coverage_frac": 6})


_SPAN_RM_ORACLE = f"""
    WITH docs0 AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks
      FROM documents
    ), base AS (
      SELECT doc_id, len(toks) AS n_tokens, toks FROM docs0
    ), grams AS (
      SELECT doc_id, i - 1 AS pos,
             CAST('0x' || substr(md5(array_to_string(
               toks[i : i + {_SPAN_K} - 1], ' ')), 1, 15) AS BIGINT) AS h
      FROM base, unnest(generate_series(1, len(toks) - {_SPAN_K} + 1)) AS t(i)
      WHERE len(toks) >= {_SPAN_K}
    ), repeated AS (
      SELECT h FROM grams GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ), dup AS (
      SELECT g.doc_id, g.pos FROM grams g JOIN repeated USING (h)
    ), covered AS (
      SELECT DISTINCT doc_id, pos + j AS idx
      FROM dup, unnest(generate_series(0, {_SPAN_K} - 1)) AS t(j)
    ), tokidx AS (
      SELECT doc_id, i - 1 AS idx, toks[i] AS tok
      FROM base, unnest(generate_series(1, len(toks))) AS t(i)
    ), kept AS (
      SELECT t.doc_id, t.idx, t.tok
      FROM tokidx t LEFT JOIN covered c
        ON c.doc_id = t.doc_id AND c.idx = t.idx
      WHERE c.idx IS NULL
    ), agg AS (
      SELECT doc_id, count(*) AS kept_tokens,
             string_agg(tok, ' ' ORDER BY idx) AS cleaned_text
      FROM kept GROUP BY doc_id
    )
    SELECT b.doc_id, CAST(b.n_tokens AS INT) AS n_tokens,
           coalesce(a.kept_tokens, 0) AS kept_tokens,
           coalesce(a.cleaned_text, '') AS cleaned_text
    FROM base b LEFT JOIN agg a USING (doc_id)
"""


@register("repeated_span_removal", oracle=_SPAN_RM_ORACLE)
def repeated_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup ACTION: cut every token covered by a
    cross-document repeated {_SPAN_K}-gram and reassemble the text
    (operators/dedup.remove_repeated_spans)."""
    from .operators.dedup import remove_repeated_spans

    docs = _t(spark, sf_dir, "documents")
    return remove_repeated_spans(docs, k=_SPAN_K)


# ---------------------------------------------------------------------------
# Instruments metadata validation (inst/patches/patch_44.R): the
# sensor-current-assignment uniqueness trigger (:1290-1342, with the
# 'BLANK' exemption), the connection-signal/timeseries consistency
# trigger (:552-642), and the deferred deployment-overlap constraint
# (:716-755) — each replayed set-wise over a synthetic instruments
# schema derived from the TPC-H keys.
# ---------------------------------------------------------------------------

_SENSOR_ASSIGN_ORACLE = """
    WITH ev AS (
      SELECT o_orderkey AS event_id, o_custkey % 120 AS instrument_id,
             CAST(o_orderdate AS TIMESTAMP) AS obs_datetime
      FROM orders WHERE o_orderkey % 3 = 0
    ), sl AS (
      SELECT o_orderkey AS event_id,
             1 + (o_orderkey // 3) % 4 AS slot_number,
             CASE WHEN o_orderkey % 13 = 0 THEN NULL
                  ELSE 1 + (o_orderkey * 7) % 300 END AS sensor_id
      FROM orders WHERE o_orderkey % 3 = 0
    ), sn AS (
      SELECT p_partkey AS sensor_id,
             CASE WHEN p_partkey % 29 = 0 THEN '  Blank '
                  ELSE 'SN-' || CAST(p_partkey AS VARCHAR)
             END AS sensor_serial
      FROM part WHERE p_partkey <= 300
    ), cur AS (
      SELECT instrument_id, slot_number, sensor_id FROM (
        SELECT ev.instrument_id, sl.slot_number, sl.sensor_id,
               row_number() OVER (
                 PARTITION BY ev.instrument_id, sl.slot_number
                 ORDER BY ev.obs_datetime DESC, ev.event_id DESC) AS rn
        FROM ev JOIN sl ON ev.event_id = sl.event_id
      ) WHERE rn = 1
    ), asg AS (
      SELECT c.sensor_id, sn.sensor_serial, c.instrument_id, c.slot_number
      FROM cur c LEFT JOIN sn ON c.sensor_id = sn.sensor_id
      WHERE c.sensor_id IS NOT NULL
    )
    SELECT sensor_id, sensor_serial,
           CAST(count(*) AS BIGINT) AS n_assignments,
           string_agg('instrument ' || CAST(instrument_id AS VARCHAR)
                      || ' slot ' || CAST(slot_number AS VARCHAR), ', '
                      ORDER BY instrument_id, slot_number)
             AS assignment_summary,
           upper(trim(coalesce(sensor_serial, ''))) = 'BLANK' AS exempt,
           count(*) > 1
             AND NOT upper(trim(coalesce(sensor_serial, ''))) = 'BLANK'
             AS violation
    FROM asg
    GROUP BY sensor_id, sensor_serial
"""


@register("sensor_assignment_validation", oracle=_SENSOR_ASSIGN_ORACLE)
def sensor_assignment_validation_q(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """patch_44.R:1290-1342 assert_sensor_current_assignment_is_unique
    for every sensor at once: latest event per (instrument, slot) via
    the DISTINCT ON replay, then per-sensor assignment counts with the
    trigger's string_agg diagnostic; ' Blank ' serials exempt."""
    from .operators.instruments import sensor_assignment_validation

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 3 == 0)
    k = F.col("o_orderkey")
    events = o.select(
        k.alias("event_id"),
        (F.col("o_custkey") % 120).alias("instrument_id"),
        (F.col("o_custkey") % 40).alias("observer"),
        F.col("o_orderdate").cast("timestamp").alias("obs_datetime"),
    )
    slots = o.select(
        k.alias("event_id"),
        (F.lit(1) + F.floor(k / 3) % 4).alias("slot_number"),
        F.when(k % 13 != 0, F.lit(1) + (k * 7) % 300).alias("sensor_id"),
        F.when(k % 13 == 0, F.lit("sensor removed")).alias("note"),
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") <= 300)
    sensors = p.select(
        F.col("p_partkey").alias("sensor_id"),
        F.when(F.col("p_partkey") % 29 == 0, F.lit("  Blank "))
        .otherwise(F.concat(F.lit("SN-"),
                            F.col("p_partkey").cast("string")))
        .alias("sensor_serial"),
        (F.col("p_partkey") % 6).alias("sensor_type"),
    )
    return sensor_assignment_validation(events, slots, sensors)


def _instruments_fixture(spark, sf_dir):
    """Shared synthetic instruments schema (deployments / timeseries /
    connections / signals) keyed off dense customer keys so reference
    existence is SF-proportional: custkey %3==0 -> deployment AND
    timeseries, %3==1 -> connection (instrument side = ck-1, every
    11th points at a nonexistent deployment), %3==2 -> signal
    (connection = sk-1, every 13th unknown; timeseries normally sk-2 =
    the connection's own deployment key, with NULL / unknown / shared
    branches to exercise every trigger arm)."""
    c = _t(spark, sf_dir, "customer")
    m = F.col("c_custkey")
    d0 = F.lit("2020-01-01").cast("date")
    dep = c.where(m % 3 == 0).select(
        m.alias("metadata_id"),
        (m % 10).alias("location_id"),
        F.when(m % 4 != 0, m % 5).alias("sub_location_id"),
        F.when(m % 6 == 0, m % 7).alias("z_id"),
        F.when(m % 19 != 0, F.lit(1) + m % 400).alias("instrument_id"),
        F.date_add(d0, (m % 100).cast("int")).cast("timestamp")
        .alias("start_datetime"),
        F.when(m % 9 != 0,
               F.date_add(d0, (m % 100 + 400).cast("int"))
               .cast("timestamp")).alias("end_datetime"),
    )
    ts = c.where(m % 3 == 0).select(
        m.alias("timeseries_id"),
        (m % 40).alias("parameter_id"),
        F.when(m % 8 == 0, m % 10 + 1).otherwise(m % 10)
        .alias("location_id"),
        F.when(m % 4 == 0, F.lit(None).cast("bigint"))
        .when(m % 13 == 0, m % 5 + 1).otherwise(m % 5)
        .alias("sub_location_id"),
        F.when(m % 6 == 0,
               F.when(m % 12 == 0, m % 7).otherwise(m % 7 + 1))
        .alias("z_id"),
    )
    conn = c.where(m % 3 == 1).select(
        m.alias("connection_id"),
        F.when(m % 11 == 0, m).otherwise(m - 1)
        .alias("instrument_metadata_id"),
        F.when(m % 7 == 0, m - 1).otherwise(m - 31)
        .alias("logger_metadata_id"),
        (m % 5).alias("protocol_id"),
        F.date_add(d0, (180 + m % 100).cast("int")).cast("timestamp")
        .alias("start_datetime"),
        F.when(m % 5 != 0,
               F.date_add(d0, (m % 100 + 270).cast("int"))
               .cast("timestamp")).alias("end_datetime"),
    )
    sig = c.where(m % 3 == 2).select(
        m.alias("connection_signal_id"),
        F.when(m % 13 == 0, m).otherwise(m - 1).alias("connection_id"),
        F.when(m % 7 == 0, F.lit(None).cast("bigint"))
        .when(m % 17 == 0, 3 * m + 1)
        .when(m % 10 == 7, m - 14)
        .otherwise(m - 2).alias("timeseries_id"),
        F.when(m % 6 == 0, F.lit(None).cast("bigint"))
        .when(m % 10 == 3, (m - 2) % 40 + 1)
        .otherwise((m - 2) % 40).alias("parameter_id"),
    )
    return dep, ts, conn, sig


_INSTR_FIXTURE_SQL = """
    dep AS (
      SELECT c_custkey AS metadata_id,
             c_custkey % 10 AS location_id,
             CASE WHEN c_custkey % 4 = 0 THEN NULL
                  ELSE c_custkey % 5 END AS sub_location_id,
             CASE WHEN c_custkey % 6 = 0 THEN c_custkey % 7 END AS z_id,
             CASE WHEN c_custkey % 19 = 0 THEN NULL
                  ELSE 1 + c_custkey % 400 END AS instrument_id,
             CAST(DATE '2020-01-01' + (c_custkey % 100) * INTERVAL 1 DAY
                  AS TIMESTAMP) AS start_datetime,
             CASE WHEN c_custkey % 9 = 0 THEN NULL
                  ELSE CAST(DATE '2020-01-01'
                            + (c_custkey % 100 + 400) * INTERVAL 1 DAY
                            AS TIMESTAMP) END AS end_datetime
      FROM customer WHERE c_custkey % 3 = 0
    ), ts AS (
      SELECT c_custkey AS timeseries_id,
             c_custkey % 40 AS parameter_id,
             CASE WHEN c_custkey % 8 = 0 THEN c_custkey % 10 + 1
                  ELSE c_custkey % 10 END AS location_id,
             CASE WHEN c_custkey % 4 = 0 THEN NULL
                  WHEN c_custkey % 13 = 0 THEN c_custkey % 5 + 1
                  ELSE c_custkey % 5 END AS sub_location_id,
             CASE WHEN c_custkey % 6 = 0 THEN
                  CASE WHEN c_custkey % 12 = 0 THEN c_custkey % 7
                       ELSE c_custkey % 7 + 1 END
             END AS z_id
      FROM customer WHERE c_custkey % 3 = 0
    ), conn AS (
      SELECT c_custkey AS connection_id,
             CASE WHEN c_custkey % 11 = 0 THEN c_custkey
                  ELSE c_custkey - 1 END AS instrument_metadata_id,
             CASE WHEN c_custkey % 7 = 0 THEN c_custkey - 1
                  ELSE c_custkey - 31 END AS logger_metadata_id,
             c_custkey % 5 AS protocol_id,
             CAST(DATE '2020-01-01'
                  + (180 + c_custkey % 100) * INTERVAL 1 DAY
                  AS TIMESTAMP) AS start_datetime,
             CASE WHEN c_custkey % 5 = 0 THEN NULL
                  ELSE CAST(DATE '2020-01-01'
                            + (c_custkey % 100 + 270) * INTERVAL 1 DAY
                            AS TIMESTAMP) END AS end_datetime
      FROM customer WHERE c_custkey % 3 = 1
    ), sig AS (
      SELECT c_custkey AS connection_signal_id,
             CASE WHEN c_custkey % 13 = 0 THEN c_custkey
                  ELSE c_custkey - 1 END AS connection_id,
             CASE WHEN c_custkey % 7 = 0 THEN NULL
                  WHEN c_custkey % 17 = 0 THEN 3 * c_custkey + 1
                  WHEN c_custkey % 10 = 7 THEN c_custkey - 14
                  ELSE c_custkey - 2 END AS timeseries_id,
             CASE WHEN c_custkey % 6 = 0 THEN NULL
                  WHEN c_custkey % 10 = 3 THEN (c_custkey - 2) % 40 + 1
                  ELSE (c_custkey - 2) % 40 END AS parameter_id
      FROM customer WHERE c_custkey % 3 = 2
    )
"""


_CONN_SIGNAL_ORACLE = "WITH " + _INSTR_FIXTURE_SQL + """
    , j AS (
      SELECT s.connection_signal_id, s.connection_id, s.timeseries_id,
             s.parameter_id,
             c.connection_id IS NOT NULL AS has_con,
             c.start_datetime AS cs,
             coalesce(c.end_datetime, TIMESTAMP '9999-01-01') AS ce,
             d.metadata_id IS NOT NULL AS has_dep,
             d.location_id AS d_loc, d.sub_location_id AS d_sub,
             d.z_id AS d_z,
             t.timeseries_id IS NOT NULL AS has_ts,
             t.parameter_id AS t_param, t.location_id AS t_loc,
             t.sub_location_id AS t_sub, t.z_id AS t_z
      FROM sig s
      LEFT JOIN conn c ON c.connection_id = s.connection_id
      LEFT JOIN dep d ON d.metadata_id = c.instrument_metadata_id
      LEFT JOIN ts t ON t.timeseries_id = s.timeseries_id
    ), linked AS (
      SELECT DISTINCT j.connection_signal_id
      FROM j
      JOIN sig o ON o.timeseries_id = j.timeseries_id
              AND o.connection_signal_id <> j.connection_signal_id
      JOIN conn oc ON oc.connection_id = o.connection_id
      WHERE j.cs < coalesce(oc.end_datetime, TIMESTAMP '9999-01-01')
        AND j.ce > oc.start_datetime
    )
    SELECT j.connection_signal_id, j.connection_id, j.timeseries_id,
           j.parameter_id,
           CASE WHEN j.timeseries_id IS NULL THEN NULL
                WHEN NOT has_con THEN 'unknown_connection'
                WHEN NOT has_dep THEN 'unknown_deployment'
                WHEN NOT has_ts THEN 'unknown_timeseries'
                WHEN t_loc <> d_loc OR t_sub IS DISTINCT FROM d_sub
                  THEN 'location_mismatch'
                WHEN d_z IS NOT NULL AND t_z IS DISTINCT FROM d_z
                  THEN 'z_mismatch'
                WHEN j.parameter_id IS NOT NULL
                     AND t_param IS DISTINCT FROM j.parameter_id
                  THEN 'parameter_mismatch'
                WHEN l.connection_signal_id IS NOT NULL
                  THEN 'timeseries_already_linked'
           END AS reject_reason
    FROM j LEFT JOIN linked l
      ON l.connection_signal_id = j.connection_signal_id
"""


@register("instrument_connection_signal_check", oracle=_CONN_SIGNAL_ORACLE)
def instrument_connection_signal_check(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """patch_44.R:552-642 check_instrument_connection_signal_timeseries
    set-wise: every connection-signal row labelled with the first
    failing trigger check (unknown refs, location/z/parameter
    consistency, overlapping duplicate timeseries link)."""
    from .operators.instruments import connection_signal_validation

    dep, ts, conn, sig = _instruments_fixture(spark, sf_dir)
    return connection_signal_validation(sig, conn, dep, ts)


_DEPLOY_OVERLAP_ORACLE = "WITH " + _INSTR_FIXTURE_SQL + """
    , links AS (
      SELECT c_custkey - 1 AS metadata_id,
             (c_custkey - 1) % 90 AS timeseries_id
      FROM customer WHERE c_custkey % 3 = 1
    ), ld AS (
      SELECT l.timeseries_id, l.metadata_id, d.start_datetime AS s,
             coalesce(d.end_datetime, TIMESTAMP '9999-01-01') AS e
      FROM links l JOIN dep d ON d.metadata_id = l.metadata_id
    )
    SELECT DISTINCT a.timeseries_id, a.metadata_id AS metadata_a,
           b.metadata_id AS metadata_b
    FROM ld a JOIN ld b
      ON a.timeseries_id = b.timeseries_id
     AND a.metadata_id < b.metadata_id
     AND a.s < b.e AND a.e > b.s
"""


@register("instrument_deployment_overlap", oracle=_DEPLOY_OVERLAP_ORACLE)
def instrument_deployment_overlap(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """patch_44.R:716-755 deferred tstzrange && constraint replay: the
    (timeseries, deployment-pair) conflicts where one timeseries is
    linked to two deployments with overlapping periods."""
    from .operators.instruments import deployment_timeseries_overlap

    dep, _, _, _ = _instruments_fixture(spark, sf_dir)
    c = _t(spark, sf_dir, "customer")
    m = F.col("c_custkey")
    links = c.where(m % 3 == 1).select(
        (m - 1).alias("metadata_id"),
        ((m - 1) % 90).alias("timeseries_id"),
    )
    return deployment_timeseries_overlap(links, dep)


_ACQ_DEP_ORACLE = "WITH " + _INSTR_FIXTURE_SQL + """
    , instr AS (
      SELECT p_partkey AS instrument_id,
             CASE WHEN p_partkey % 17 = 0 THEN NULL
                  ELSE p_partkey % 3 <> 1 END AS can_be_logger
      FROM part WHERE p_partkey <= 400
    ), prot AS (
      SELECT * FROM (VALUES (0, 'internal'), (1, 'sdi12'), (2, 'modbus'),
                            (3, 'analog'), (4, 'rs232'))
        AS t(protocol_id, family_code)
    ), cj AS (
      SELECT c.instrument_metadata_id, c.logger_metadata_id,
             c.start_datetime AS c_s,
             coalesce(c.end_datetime, TIMESTAMP '9999-01-01') AS c_e,
             i.instrument_id AS i_inst, i.location_id AS i_loc,
             i.start_datetime AS i_s,
             coalesce(i.end_datetime, TIMESTAMP '9999-01-01') AS i_e,
             l.instrument_id AS l_inst, l.location_id AS l_loc,
             l.start_datetime AS l_s,
             coalesce(l.end_datetime, TIMESTAMP '9999-01-01') AS l_e,
             p.family_code, li.can_be_logger
      FROM conn c
      LEFT JOIN dep i ON i.metadata_id = c.instrument_metadata_id
      LEFT JOIN dep l ON l.metadata_id = c.logger_metadata_id
      LEFT JOIN prot p ON p.protocol_id = c.protocol_id
      LEFT JOIN instr li ON li.instrument_id = l.instrument_id
    ), bad AS (
      SELECT * FROM cj WHERE
        i_inst IS NULL OR l_inst IS NULL
        OR can_be_logger IS DISTINCT FROM TRUE
        OR (family_code = 'internal'
            AND instrument_metadata_id <> logger_metadata_id)
        OR (family_code <> 'internal'
            AND instrument_metadata_id = logger_metadata_id)
        OR i_loc <> l_loc
        OR c_s < i_s OR c_s < l_s
        OR c_e > i_e OR c_e > l_e
    ), f1 AS (
      SELECT DISTINCT metadata_id FROM (
        SELECT instrument_metadata_id AS metadata_id FROM bad
        UNION ALL
        SELECT logger_metadata_id AS metadata_id FROM bad
      ) WHERE metadata_id IS NOT NULL
    ), f2 AS (
      SELECT DISTINCT d.metadata_id
      FROM sig s
      JOIN conn c ON c.connection_id = s.connection_id
      JOIN ts t ON t.timeseries_id = s.timeseries_id
      JOIN dep d ON d.metadata_id = c.instrument_metadata_id
      WHERE s.timeseries_id IS NOT NULL AND (
        t.location_id <> d.location_id
        OR t.sub_location_id IS DISTINCT FROM d.sub_location_id
        OR (d.z_id IS NOT NULL AND t.z_id IS DISTINCT FROM d.z_id)
        OR (s.parameter_id IS NOT NULL
            AND t.parameter_id IS DISTINCT FROM s.parameter_id))
    )
    SELECT d.metadata_id,
           f1.metadata_id IS NOT NULL AS invalid_connection_metadata,
           f2.metadata_id IS NOT NULL AS invalid_signal_mapping,
           NOT (f1.metadata_id IS NOT NULL OR f2.metadata_id IS NOT NULL)
             AS valid
    FROM dep d
    LEFT JOIN f1 ON f1.metadata_id = d.metadata_id
    LEFT JOIN f2 ON f2.metadata_id = d.metadata_id
"""


@register("instrument_acquisition_validation", oracle=_ACQ_DEP_ORACLE)
def instrument_acquisition_validation(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """patch_44.R:645-714
    check_locations_metadata_instruments_acquisition_dependents for
    every deployment at once: probe 1 flags deployments whose
    dependent connections violate the instrument/logger/protocol/
    period rules; probe 2 flags deployments whose signal->timeseries
    mappings disagree on location / sub-location / z / parameter."""
    from .operators.instruments import deployment_acquisition_validation

    dep, ts, conn, sig = _instruments_fixture(spark, sf_dir)
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") <= 400)
    instruments = p.select(
        F.col("p_partkey").alias("instrument_id"),
        F.when(F.col("p_partkey") % 17 != 0, F.col("p_partkey") % 3 != 1)
        .alias("can_be_logger"),
    )
    protocols = _ldf(
        spark,
        [(0, "internal"), (1, "sdi12"), (2, "modbus"), (3, "analog"),
         (4, "rs232")],
        "protocol_id bigint, family_code string",
    )
    return deployment_acquisition_validation(
        dep, conn, instruments, protocols, sig, ts)


# ---------------------------------------------------------------------------
# Data-sharing agreements + CSW layer (inst/patches/patch_32.R): the
# agreement-overlap constraint trigger (:259-289), the
# default-agreement document-type trigger (:304-330), and the
# get_csw_layer() catalog read view (:1415-1520).
# ---------------------------------------------------------------------------

_SHARING_OVERLAP_ORACLE = """
    WITH ag AS (
      SELECT o_orderkey AS timeseries_data_sharing_agreement_id,
             o_custkey % 150 AS timeseries_id,
             (o_orderkey * 11) % 500 AS data_sharing_agreement_id,
             CAST(o_orderdate AS TIMESTAMP) AS start_dt,
             CASE WHEN o_orderkey % 6 = 0 THEN NULL
                  ELSE CAST(CAST(o_orderdate AS DATE) + 120 AS TIMESTAMP)
             END AS end_dt
      FROM orders WHERE o_orderkey % 4 = 1
    )
    SELECT a.timeseries_data_sharing_agreement_id, a.timeseries_id,
           a.data_sharing_agreement_id, a.start_dt, a.end_dt,
           EXISTS (
             SELECT 1 FROM ag b
             WHERE b.timeseries_id = a.timeseries_id
               AND b.timeseries_data_sharing_agreement_id
                   <> a.timeseries_data_sharing_agreement_id
               AND a.start_dt < coalesce(b.end_dt, TIMESTAMP '9999-01-01')
               AND coalesce(a.end_dt, TIMESTAMP '9999-01-01') > b.start_dt
           ) AS violation
    FROM ag a
"""


@register("sharing_agreement_overlap_check",
          oracle=_SHARING_OVERLAP_ORACLE)
def sharing_agreement_overlap_check(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """patch_32.R:259-289 check_timeseries_data_sharing_agreements_
    overlap replayed for the whole table: both members of an
    overlapping same-timeseries pair flag."""
    from .operators.sharing import sharing_agreement_overlap_validation

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 4 == 1)
    k = F.col("o_orderkey")
    ag = o.select(
        k.alias("timeseries_data_sharing_agreement_id"),
        (F.col("o_custkey") % 150).alias("timeseries_id"),
        ((k * 11) % 500).alias("data_sharing_agreement_id"),
        F.col("o_orderdate").cast("timestamp").alias("start_dt"),
        F.when(k % 6 != 0,
               F.date_add(F.col("o_orderdate"), 120).cast("timestamp"))
        .alias("end_dt"),
    )
    return sharing_agreement_overlap_validation(ag)


_DEFAULT_AGREEMENT_ORACLE = """
    WITH ts AS (
      SELECT c_custkey AS timeseries_id,
             CASE WHEN c_custkey % 5 = 0 THEN NULL
                  ELSE (c_custkey * 3) % 520
             END AS default_data_sharing_agreement_id
      FROM customer
    ), doc AS (
      SELECT p_partkey AS document_id, p_partkey % 8 AS document_type_id
      FROM part WHERE p_partkey <= 500
    ), ok AS (
      SELECT document_id FROM doc WHERE document_type_id = 3
    )
    SELECT t.timeseries_id, t.default_data_sharing_agreement_id,
           CASE WHEN t.default_data_sharing_agreement_id IS NOT NULL
                     AND o.document_id IS NULL
                THEN 'invalid_document_type' END AS reject_reason
    FROM ts t
    LEFT JOIN ok o ON o.document_id = t.default_data_sharing_agreement_id
"""


@register("default_sharing_agreement_check",
          oracle=_DEFAULT_AGREEMENT_ORACLE)
def default_sharing_agreement_check(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """patch_32.R:304-330 files.check_default_data_sharing_agreement:
    non-NULL default agreement ids must reference a document typed
    'data sharing agreement' (type_id 3 in the fixture's type table)."""
    from .operators.sharing import default_agreement_type_validation

    c = _t(spark, sf_dir, "customer")
    m = F.col("c_custkey")
    ts = c.select(
        m.alias("timeseries_id"),
        F.when(m % 5 != 0, (m * 3) % 520)
        .alias("default_data_sharing_agreement_id"),
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") <= 500)
    docs = p.select(
        F.col("p_partkey").alias("document_id"),
        (F.col("p_partkey") % 8).alias("document_type_id"),
    )
    types = _ldf(
        spark,
        [(i, "data sharing agreement" if i == 3 else f"report-{i}")
         for i in range(8)],
        "document_type_id bigint, type string",
    )
    return default_agreement_type_validation(ts, docs, types)


_CSW_LAYER_ORACLE = """
    WITH loc AS (
      SELECT c_custkey AS location_id,
             'LOC-' || CAST(c_custkey AS VARCHAR) AS location_code,
             'Station ' || CAST(c_custkey AS VARCHAR) AS name,
             'Poste ' || CAST(c_custkey AS VARCHAR) AS name_fr,
             (c_custkey % 120) - 60 + CAST(0.5 AS DOUBLE) AS latitude,
             (c_custkey % 300) - 150 + CAST(0.25 AS DOUBLE) AS longitude,
             1 + c_custkey % 20 AS location_type,
             c_custkey % 7 <> 0 AS jurisdictional_relevance
      FROM customer WHERE c_custkey % 2 = 0
    ), lt AS (
      SELECT type_id, 'type-' || CAST(type_id AS VARCHAR) AS type
      FROM (SELECT unnest(generate_series(1, 20)) AS type_id)
    ), tser AS (
      SELECT c_custkey AS timeseries_id,
             c_custkey - 1 AS location_id,
             CASE WHEN c_custkey % 9 = 0 THEN 999
                  WHEN c_custkey % 8 = 1 THEN 1150
                  WHEN c_custkey % 8 = 3 THEN 1165
                  WHEN c_custkey % 8 = 5 THEN 21
                  ELSE 1220 END AS parameter_id,
             CASE WHEN c_custkey % 3 = 0 THEN NULL
                  ELSE c_custkey % 6 END AS sub_location_id
      FROM customer WHERE c_custkey % 2 = 1
    ), subl AS (
      SELECT sub_location_id,
             'Sub ' || CAST(sub_location_id AS VARCHAR)
               AS sub_location_name,
             'Sous ' || CAST(sub_location_id AS VARCHAR)
               AS sub_location_name_fr
      FROM (SELECT unnest(generate_series(0, 5)) AS sub_location_id)
    ), par AS (
      SELECT * FROM (VALUES
        (1150, 'water level', 'niveau d''eau', 'm'),
        (1165, 'discharge', 'debit', 'm3/s'),
        (21, 'air temperature', 'temperature de l''air', 'C'),
        (1220, 'snow depth', 'profondeur de neige', 'cm'),
        (999, 'turbidity', 'turbidite', 'NTU'))
        AS t(parameter_id, param_name, param_name_fr, param_units)
    ), daily AS (
      SELECT (o_custkey % 750) * 2 + 1 AS timeseries_id,
             CAST(o_orderdate AS DATE) AS date,
             CAST(o_orderkey % 1000 AS DOUBLE) / 10 AS value,
             CAST(o_orderkey % 200 AS DOUBLE) / 2
               AS percent_historic_range,
             CAST(o_orderkey % 1000 AS DOUBLE) / 10 - 1 AS mean,
             CAST(o_orderkey % 1000 AS DOUBLE) / 10 - 5 AS min,
             CAST(o_orderkey % 1000 AS DOUBLE) / 10 + 5 AS max,
             o_orderkey % 40 AS doy_count
      FROM orders
    ), dr AS (
      SELECT 'LOC-' || CAST(p_partkey AS VARCHAR) AS feature_name,
             CAST(p_partkey AS DOUBLE) / 4 AS drainage_area_km2
      FROM part WHERE p_partkey % 3 = 0
    ), cdat AS (
      SELECT c_custkey AS location_id,
             CAST(c_custkey % 9 AS DOUBLE) / 4 AS conversion_m,
             'datum-en-' || CAST(c_custkey % 5 AS VARCHAR)
               AS datum_name_en,
             'datum-fr-' || CAST(c_custkey % 5 AS VARCHAR)
               AS datum_name_fr
      FROM customer WHERE c_custkey % 10 = 0 AND c_custkey % 20 = 0
    ), own AS (
      SELECT c_custkey AS timeseries_id, c_custkey % 12 AS organization_id,
             CAST(DATE '2015-01-01' + ((c_custkey * 13) % 3000)
                  * INTERVAL 1 DAY AS TIMESTAMP) AS start_dt,
             CAST(DATE '2015-01-01' + ((c_custkey * 13) % 3000 + 200)
                  * INTERVAL 1 DAY AS TIMESTAMP) AS end_dt
      FROM customer WHERE c_custkey % 2 = 1
      UNION ALL
      SELECT c_custkey, (c_custkey + 5) % 12,
             CAST(DATE '2015-01-01'
                  + ((c_custkey * 13) % 3000 + c_custkey % 7 - 3)
                  * INTERVAL 1 DAY AS TIMESTAMP),
             CAST(DATE '2015-01-01'
                  + ((c_custkey * 13) % 3000 + c_custkey % 7 + 97)
                  * INTERVAL 1 DAY AS TIMESTAMP)
      FROM customer WHERE c_custkey % 4 = 1
    ), own1 AS (
      SELECT location_id,
             'Org-' || CAST(organization_id AS VARCHAR) AS owner_name,
             'OrgFR-' || CAST(organization_id AS VARCHAR) AS owner_name_fr
      FROM (
        SELECT t.location_id, o.organization_id,
               row_number() OVER (
                 PARTITION BY t.location_id
                 ORDER BY o.start_dt DESC, o.end_dt DESC,
                          o.organization_id DESC) AS rn
        FROM own o JOIN tser t ON t.timeseries_id = o.timeseries_id
      ) WHERE rn = 1
    )
    SELECT l.location_code AS location,
           CASE WHEN s.sub_location_name IS NOT NULL
                THEN l.name || ' - ' || s.sub_location_name
                ELSE l.name END AS station_name,
           CASE WHEN s.sub_location_name_fr IS NOT NULL
                THEN l.name_fr || ' - ' || s.sub_location_name_fr
                ELSE l.name_fr END AS station_name_fr,
           l.latitude, l.longitude, lt.type,
           ow.owner_name, ow.owner_name_fr,
           t.timeseries_id, t.parameter_id, p.param_name, p.param_name_fr,
           p.param_units, d.date,
           CASE WHEN p.param_name = 'water level'
                THEN d.value + coalesce(c.conversion_m, CAST(0 AS DOUBLE))
                ELSE d.value END AS value,
           d.percent_historic_range,
           CASE WHEN p.param_name = 'water level'
                THEN d.mean + coalesce(c.conversion_m, CAST(0 AS DOUBLE))
                ELSE d.mean END AS mean,
           CASE WHEN p.param_name = 'water level'
                THEN d.min + coalesce(c.conversion_m, CAST(0 AS DOUBLE))
                ELSE d.min END AS min,
           CASE WHEN p.param_name = 'water level'
                THEN d.max + coalesce(c.conversion_m, CAST(0 AS DOUBLE))
                ELSE d.max END AS max,
           d.doy_count, dr.drainage_area_km2,
           CASE WHEN p.param_name = 'water level'
                THEN c.datum_name_en END AS datum_name_en,
           CASE WHEN p.param_name = 'water level'
                THEN c.datum_name_fr END AS datum_name_fr
    FROM daily d
    JOIN tser t ON t.timeseries_id = d.timeseries_id
    JOIN loc l ON l.location_id = t.location_id
    JOIN lt ON lt.type_id = l.location_type
    LEFT JOIN subl s ON s.sub_location_id = t.sub_location_id
    JOIN par p ON p.parameter_id = t.parameter_id
    LEFT JOIN dr ON dr.feature_name = l.location_code
    LEFT JOIN cdat c ON c.location_id = l.location_id
    LEFT JOIN own1 ow ON ow.location_id = l.location_id
    WHERE l.jurisdictional_relevance
      AND lt.type_id IN (1, 2, 16)
      AND t.parameter_id IN (1150, 1165, 21, 1220)
      AND d.date >= DATE '1998-08-02' - 30
"""


@register("csw_layer_read", oracle=_CSW_LAYER_ORACLE)
def csw_layer_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """patch_32.R:1415-1520 public.get_csw_layer(): the CSW catalog
    view — trailing-30-day corrected daily values joined to station /
    parameter / latest-owner / drainage / datum metadata, with the
    water-level datum offset applied to value/mean/min/max."""
    from .operators.sharing import csw_layer

    c = _t(spark, sf_dir, "customer")
    m = F.col("c_custkey")
    locations = c.where(m % 2 == 0).select(
        m.alias("location_id"),
        F.concat(F.lit("LOC-"), m.cast("string")).alias("location_code"),
        F.concat(F.lit("Station "), m.cast("string")).alias("name"),
        F.concat(F.lit("Poste "), m.cast("string")).alias("name_fr"),
        ((m % 120) - 60 + F.lit(0.5)).alias("latitude"),
        ((m % 300) - 150 + F.lit(0.25)).alias("longitude"),
        (F.lit(1) + m % 20).alias("location_type"),
        (m % 7 != 0).alias("jurisdictional_relevance"),
    )
    location_types = _ldf(
        spark, [(i, f"type-{i}") for i in range(1, 21)],
        "type_id bigint, type string")
    timeseries = c.where(m % 2 == 1).select(
        m.alias("timeseries_id"),
        (m - 1).alias("location_id"),
        F.when(m % 9 == 0, 999).when(m % 8 == 1, 1150)
        .when(m % 8 == 3, 1165).when(m % 8 == 5, 21)
        .otherwise(1220).alias("parameter_id"),
        F.when(m % 3 != 0, m % 6).alias("sub_location_id"),
    )
    sub_locations = _ldf(
        spark, [(i, f"Sub {i}", f"Sous {i}") for i in range(6)],
        "sub_location_id bigint, sub_location_name string, "
        "sub_location_name_fr string")
    parameters = _ldf(
        spark,
        [(1150, "water level", "niveau d'eau", "m"),
         (1165, "discharge", "debit", "m3/s"),
         (21, "air temperature", "temperature de l'air", "C"),
         (1220, "snow depth", "profondeur de neige", "cm"),
         (999, "turbidity", "turbidite", "NTU")],
        "parameter_id bigint, param_name string, param_name_fr string, "
        "unit_default string")
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    v = (k % 1000).cast("double") / 10
    daily = o.select(
        ((F.col("o_custkey") % 750) * 2 + 1).alias("timeseries_id"),
        F.col("o_orderdate").cast("date").alias("date"),
        v.alias("value"),
        ((k % 200).cast("double") / 2).alias("percent_historic_range"),
        (v - 1).alias("mean"), (v - 5).alias("min"), (v + 5).alias("max"),
        (k % 40).alias("doy_count"),
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") % 3 == 0)
    drainage = p.select(
        F.concat(F.lit("LOC-"), F.col("p_partkey").cast("string"))
        .alias("feature_name"),
        (F.col("p_partkey").cast("double") / 4).alias("drainage_area_km2"),
    )
    datum_conversions = c.where(m % 10 == 0).select(
        m.alias("location_id"),
        (m % 5).alias("datum_id_to"),
        ((m % 9).cast("double") / 4).alias("conversion_m"),
        (m % 20 == 0).alias("current"),
    )
    datum_list = _ldf(
        spark, [(i, f"datum-en-{i}", f"datum-fr-{i}") for i in range(5)],
        "datum_id bigint, datum_name_en string, datum_name_fr string")
    d0 = F.lit("2015-01-01").cast("date")
    own_a = c.where(m % 2 == 1).select(
        m.alias("timeseries_id"), (m % 12).alias("organization_id"),
        F.date_add(d0, ((m * 13) % 3000).cast("int")).cast("timestamp")
        .alias("start_dt"),
        F.date_add(d0, ((m * 13) % 3000 + 200).cast("int"))
        .cast("timestamp").alias("end_dt"),
    )
    own_b = c.where(m % 4 == 1).select(
        m.alias("timeseries_id"), ((m + 5) % 12).alias("organization_id"),
        F.date_add(d0, ((m * 13) % 3000 + m % 7 - 3).cast("int"))
        .cast("timestamp").alias("start_dt"),
        F.date_add(d0, ((m * 13) % 3000 + m % 7 + 97).cast("int"))
        .cast("timestamp").alias("end_dt"),
    )
    owners = own_a.unionByName(own_b)
    organizations = _ldf(
        spark, [(i, f"Org-{i}", f"OrgFR-{i}") for i in range(12)],
        "organization_id bigint, name string, name_fr string")
    return csw_layer(
        locations, location_types, timeseries, sub_locations, parameters,
        daily, drainage, datum_conversions, datum_list, owners,
        organizations, as_of_date="1998-08-02")


# ---------------------------------------------------------------------------
# Spectral (DFT) audio fingerprint variant (operators/multimodal.
# audio_spectral_fingerprint64): real WAV decode -> 4-sample chunk
# pre-sums -> EXACT fixed-point integer DFT (basis table shared
# verbatim with this oracle, so no cross-engine trig drift) -> 4
# frequency bands x 16 bins -> rise/fall bits across adjacent frames.
# Gain invariance exact (energies quadratic in the samples), so group
# twins fingerprint identically.
# ---------------------------------------------------------------------------

def _audio_spec_oracle() -> str:
    from .operators.multimodal import _spec_basis

    bc, bs = _spec_basis()
    lc = ",".join(str(v) for row in bc for v in row)
    ls = ",".join(str(v) for row in bs for v in row)
    return f"""
    WITH ids AS (
      SELECT doc_id AS media_id, doc_id % 8 AS g, 1 + doc_id % 3 AS fac
      FROM documents WHERE doc_id % 4 = 1
    ), t AS (
      SELECT unnest(range(0, 4096)) AS k
    ), s AS (
      SELECT media_id, k // 256 AS f, (k % 256) // 4 AS j,
             fac * (((g * 37 + k * 101) % 4001) - 2000) AS v
      FROM ids, t
    ), ch AS (
      SELECT media_id, f, j, sum(v) AS cs FROM s GROUP BY 1, 2, 3
    ), bas AS (
      SELECT [{lc}] AS bc, [{ls}] AS bs
    ), bins AS (
      SELECT unnest(range(1, 17)) AS n
    ), sp AS (
      SELECT media_id, f, (n - 1) // 4 AS b,
             sum(cs * bc[(n - 1) * 64 + j + 1]) AS cr,
             sum(cs * bs[(n - 1) * 64 + j + 1]) AS ci
      FROM ch, bins, bas
      GROUP BY media_id, f, b, n
    ), e AS (
      SELECT media_id, f, b, sum(cr * cr + ci * ci) AS e
      FROM sp GROUP BY 1, 2, 3
    ), bits AS (
      SELECT a.media_id, a.b * 15 + a.f AS idx, (n.e > a.e) AS bit
      FROM e a JOIN e n ON a.media_id = n.media_id AND a.b = n.b
                        AND n.f = a.f + 1
      WHERE a.f < 15
    ), fp AS (
      SELECT media_id,
             CAST(sum(CASE WHEN bit
                      THEN (CAST(1 AS BIGINT) << idx) ELSE 0 END)
                  AS BIGINT) AS fingerprint
      FROM bits GROUP BY 1
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           bit_count(xor(a.fingerprint, b.fingerprint)) AS hamming
    FROM fp a JOIN fp b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 3
"""


_AUDIO_SPEC_ORACLE = _audio_spec_oracle()


@register("audio_spectral_near_dup", oracle=_AUDIO_SPEC_ORACLE)
def audio_spectral_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral audio near-dup pairs: WAV decode -> fixed-point
    integer DFT band energies -> rise/fall fingerprint -> pigeonhole-
    banded pair join."""
    from .operators.dedup import simhash_near_pairs
    from .operators.multimodal import (extract_audio_spectral_fingerprint,
                                       synthesize_tone_wavs)

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 4 == 1).select(
        F.col("doc_id").alias("media_id"))
    fps = extract_audio_spectral_fingerprint(synthesize_tone_wavs(ids))
    return simhash_near_pairs(
        fps, id_col="media_id", sig_col="fingerprint",
        bits=60, bands=4, max_hamming=3)


# ---------------------------------------------------------------------------
# BM25 + phrase/proximity scoring (operators/search.bm25_phrase_topk):
# base BM25 plus w_bigram * ln(1+tf) per query bigram matched among a
# document's adjacent token pairs, plus w_phrase * ln(1+tf) for the
# full query as a consecutive run (a 2-word query earns BOTH — it IS
# its own bigram). Every component 1e-6-quantized + exact-summed.
# ---------------------------------------------------------------------------

_BM25P_QUERIES = [(0, "batch batch"), (1, "merge slow join"),
                  (2, "the fast key"), (3, "small part fast value")]
_BM25P_W_BIGRAM = 0.5
_BM25P_W_PHRASE = 1.0


def _bm25p_grams() -> dict[int, list[tuple]]:
    grams: dict[int, list[tuple]] = {}
    for qid, q in _BM25P_QUERIES:
        toks = q.split()
        for i in range(len(toks) - 1):
            grams.setdefault(2, []).append(
                (qid, toks[i] + " " + toks[i + 1], _BM25P_W_BIGRAM))
        if len(toks) >= 2:
            grams.setdefault(len(toks), []).append(
                (qid, " ".join(toks), _BM25P_W_PHRASE))
    return {L: sorted(set(v)) for L, v in grams.items()}


def _bm25p_oracle() -> str:
    values = ", ".join(f"({i}, '{q}')" for i, q in _BM25P_QUERIES)
    gram_ctes, bonus_selects = [], []
    for L in sorted(_bm25p_grams()):
        rows = ", ".join(
            f"({qid}, '{g}', CAST({w} AS DOUBLE))"
            for qid, g, w in _bm25p_grams()[L])
        cat = " || ' ' || ".join(f"toks[i + {j}]" for j in range(L))
        gram_ctes.append(f"""
    qg{L}(query_id, gram, w) AS (VALUES {rows}),
    dg{L} AS (
      SELECT doc_id, {cat} AS gram
      FROM base, unnest(generate_series(1, len(toks) - {L - 1}))
           AS t(i)
    ), gtf{L} AS (
      SELECT doc_id, gram, count(*) AS tf FROM dg{L}
      JOIN (SELECT DISTINCT gram FROM qg{L}) USING (gram)
      GROUP BY 1, 2
    )""")
        bonus_selects.append(f"""
      SELECT q.query_id, g.doc_id,
             CAST(floor(q.w * ln(1 + g.tf) * 1000000.0 + 0.5)
                  AS BIGINT) AS c
      FROM gtf{L} g JOIN qg{L} q USING (gram)""")
    grams_sql = ",".join(gram_ctes)
    bonuses = " UNION ALL ".join(bonus_selects)
    return f"""
    WITH q(query_id, query) AS (VALUES {values}),
    base AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks
      FROM documents
    ),{grams_sql}, dl AS (
      SELECT doc_id, len(toks) AS dl FROM base
    ), stats AS (
      SELECT count(*) AS n, sum(dl) AS sumdl FROM dl
    ), post AS (
      SELECT doc_id, unnest(toks) AS term FROM base
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM post GROUP BY 1, 2
    ), qt AS (
      SELECT DISTINCT query_id, term FROM (
        SELECT query_id, unnest(string_split(lower(query), ' ')) AS term
        FROM q)
    ), qterms AS (
      SELECT DISTINCT term FROM qt
    ), dfq AS (
      SELECT term, count(*) AS df
      FROM tf JOIN qterms USING (term) GROUP BY 1
    ), contrib AS (
      SELECT qt.query_id, tf.doc_id,
             CAST(floor(
               ln(1 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
               * tf.tf * (1.2 + 1.0)
               / (tf.tf + 1.2 * (1.0 - 0.75
                  + 0.75 * dl.dl / (CAST(s.sumdl AS DOUBLE) / s.n)))
               * 1000000.0 + 0.5) AS BIGINT) AS c
      FROM tf
      JOIN qt USING (term)
      JOIN dfq ON tf.term = dfq.term
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats s
      UNION ALL {bonuses}
    ), sc AS (
      SELECT query_id, doc_id, sum(c) AS cl FROM contrib GROUP BY 1, 2
    ), ranked AS (
      SELECT query_id, doc_id, cl,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cl DESC, doc_id) AS rn
      FROM sc
    )
    SELECT query_id, doc_id,
           {R('cl / 1000000.0', 6)} AS score
    FROM ranked WHERE rn <= 5
"""


_BM25P_ORACLE = _bm25p_oracle()


@register("bm25_phrase_topk", oracle=_BM25P_ORACLE)
def bm25_phrase_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 + bigram-proximity + full-phrase top-5 per probe query
    (operators/search.bm25_phrase_topk)."""
    from .operators.search import bm25_phrase_topk

    docs = _t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        _BM25P_QUERIES, "query_id int, query string")
    out = bm25_phrase_topk(
        docs, queries, k=5,
        w_bigram=_BM25P_W_BIGRAM, w_phrase=_BM25P_W_PHRASE)
    return _round(out, {"score": 6})


# 12-bit sibling: SOF1 extended-sequential streams with precision 12
# (functions/jpeg.encode_jpeg_12bit), so the high-bit-depth decode
# path (16-category DC Huffman, 2048 level shift, uint16 output) is
# differentially verified in the bit-exact q100 block-constant regime.
_JPEG12_ORACLE = f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id % 5 = 4
    ), blocks AS (
      SELECT media_id, b,
             (media_id * 13 + b * 911) % 4000 + 48 AS v
      FROM ids, (SELECT unnest(range(0, 4)) AS b)
    )
    SELECT media_id, TRUE AS decoded,
           CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
           {R('avg(v)', 6)} AS mean_r,
           {R('avg(v)', 6)} AS mean_g,
           {R('avg(v)', 6)} AS mean_b
    FROM blocks GROUP BY media_id
"""


@register("jpeg12_decode_features", oracle=_JPEG12_ORACLE)
def jpeg12_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import (extract_jpeg_features,
                                       synthesize_jpegs12)

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 5 == 4).select(
        F.col("doc_id").alias("media_id"))
    out = extract_jpeg_features(synthesize_jpegs12(ids))
    return _round(
        out.select("media_id", "decoded", F.col("width").cast("int"),
                   F.col("height").cast("int"), "mean_r", "mean_g",
                   "mean_b"),
        {"mean_r": 6, "mean_g": 6, "mean_b": 6},
    )


# ---------------------------------------------------------------------------
# Raster-reference cell-size sync (inst/patches/patch_33.R:473-560):
# the statement-level triggers keeping rasters_reference's
# cell_size_{x,y}_deg equal to MIN(ABS(scale)) over the reference's
# tiles, replayed set-wise for the whole index.
# ---------------------------------------------------------------------------

_RR_CELL_SIZE_ORACLE = """
    WITH r AS (
      SELECT CASE WHEN o_orderkey % 13 = 0 THEN NULL
                  ELSE o_custkey % 80 END AS reference_id,
             CASE WHEN o_orderkey % 2 = 0
                  THEN CAST(1 + o_orderkey % 20 AS DOUBLE) / 400
                  ELSE -CAST(1 + o_orderkey % 20 AS DOUBLE) / 400
             END AS scale_x,
             -CAST(1 + o_orderkey % 15 AS DOUBLE) / 200 AS scale_y
      FROM orders WHERE o_orderkey % 3 = 1
    ), rr AS (
      SELECT p_partkey % 100 AS reference_id,
             CASE WHEN p_partkey % 4 = 0 THEN NULL
                  ELSE CAST(p_partkey % 7 + 1 AS DOUBLE) / 100
             END AS cell_size_x_deg,
             CASE WHEN p_partkey % 4 = 0 THEN NULL
                  ELSE CAST(p_partkey % 5 + 1 AS DOUBLE) / 100
             END AS cell_size_y_deg
      FROM part WHERE p_partkey <= 100
    ), agg AS (
      SELECT reference_id, min(abs(scale_x)) AS cx, min(abs(scale_y)) AS cy
      FROM r WHERE reference_id IS NOT NULL GROUP BY 1
    )
    SELECT rr.reference_id,
           coalesce(agg.cx, rr.cell_size_x_deg) AS cell_size_x_deg,
           coalesce(agg.cy, rr.cell_size_y_deg) AS cell_size_y_deg
    FROM rr LEFT JOIN agg ON agg.reference_id = rr.reference_id
"""


@register("raster_reference_cell_size_sync", oracle=_RR_CELL_SIZE_ORACLE)
def raster_reference_cell_size_sync(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """patch_33.R:473-560 cell-size sync: references take
    MIN(ABS(scale)) over their tiles; tile-less references keep their
    existing values."""
    from .operators.raster import sync_reference_cell_sizes

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 3 == 1)
    k = F.col("o_orderkey")
    rasters = o.select(
        F.when(k % 13 != 0, F.col("o_custkey") % 80).alias("reference_id"),
        (F.when(k % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
         * (1 + k % 20).cast("double") / 400).alias("scale_x"),
        (-(1 + k % 15).cast("double") / 200).alias("scale_y"),
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") <= 100)
    m = F.col("p_partkey")
    references = p.select(
        (m % 100).alias("reference_id"),
        F.when(m % 4 != 0, (m % 7 + 1).cast("double") / 100)
        .alias("cell_size_x_deg"),
        F.when(m % 4 != 0, (m % 5 + 1).cast("double") / 100)
        .alias("cell_size_y_deg"),
    )
    return sync_reference_cell_sizes(rasters, references)


# ---------------------------------------------------------------------------
# robots.txt tier (RFC 9309, public spec; no reference analog): parse
# a robots corpus into a rules table and evaluate crawl permission per
# URL — exact-agent group precedence over '*', longest-pattern wins,
# Allow beats Disallow on ties, '*' wildcards and '$' end anchors.
# ---------------------------------------------------------------------------

_ROBOTS_SQL = """
    robots AS (
      SELECT 'h' || CAST(k AS VARCHAR) AS host,
             'User-agent: *' || chr(10)
             || 'Disallow: /private' || chr(10)
             || 'Allow: /private/ok' || chr(10)
             || CASE WHEN k % 3 = 0 THEN
                  'User-agent: aquabot' || chr(10)
                  || 'Disallow: /tmp*' || chr(10)
                  || 'Allow: /tmp/keep$' || chr(10)
                ELSE '' END
             || CASE WHEN k % 5 = 0 THEN
                  'Disallow: /blog' || chr(10) ELSE '' END
             || CASE WHEN k % 7 = 3 THEN
                  -- rule-less named group: RFC 9309 still selects it
                  -- over '*' (allow-everything for the named agent)
                  'User-agent: aquabot' || chr(10)
                  || 'Disallow:' || chr(10) ELSE '' END
             || CASE WHEN k % 4 = 1 THEN
                  'User-agent: *' || chr(10)
                  || 'Disallow: /search' || chr(10) ELSE '' END
               AS content
      FROM (SELECT unnest(range(0, 50)) AS k)
    ), rl AS (
      SELECT host, i AS pos,
             trim(split_part(ls[i], '#', 1)) AS line
      FROM (SELECT host, string_split(content, chr(10)) AS ls
            FROM robots),
           unnest(generate_series(1, len(ls))) AS t(i)
    ), parsed AS (
      SELECT host, pos,
             lower(trim(split_part(line, ':', 1))) AS d,
             trim(substr(line, strpos(line, ':') + 1)) AS v
      FROM rl WHERE line <> '' AND strpos(line, ':') > 0
    ), blocks AS (
      SELECT host, pos, d, v,
             d = 'user-agent' AS ia,
             CASE WHEN d = 'user-agent' AND NOT coalesce(
                    lag(d = 'user-agent') OVER
                      (PARTITION BY host ORDER BY pos), FALSE)
                  THEN 1 ELSE 0 END AS nb
      FROM parsed
    ), grouped AS (
      SELECT host, pos, d, v, ia,
             sum(nb) OVER (PARTITION BY host ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS grp
      FROM blocks
    ), agents AS (
      SELECT host, grp, lower(v) AS agent FROM grouped WHERE ia
    ), rules AS (
      -- LEFT: rule-less named groups still register agent presence
      SELECT a.host, a.agent, g.rule, g.path FROM agents a LEFT JOIN (
        SELECT host, grp, d AS rule, v AS path FROM grouped
        WHERE d IN ('allow', 'disallow') AND v <> ''
      ) g ON a.host = g.host AND a.grp = g.grp
    )
"""


_ROBOTS_RULES_ORACLE = "WITH " + _ROBOTS_SQL + """
    SELECT host, agent, rule, path FROM rules
"""


def _robots_fixture(spark):
    nl = F.lit("\n")
    k = F.col("id")
    content = F.concat(
        F.lit("User-agent: *"), nl,
        F.lit("Disallow: /private"), nl,
        F.lit("Allow: /private/ok"), nl,
        F.when(k % 3 == 0, F.concat(
            F.lit("User-agent: aquabot"), nl,
            F.lit("Disallow: /tmp*"), nl,
            F.lit("Allow: /tmp/keep$"), nl)).otherwise(F.lit("")),
        F.when(k % 5 == 0, F.concat(
            F.lit("Disallow: /blog"), nl)).otherwise(F.lit("")),
        F.when(k % 7 == 3, F.concat(
            F.lit("User-agent: aquabot"), nl,
            F.lit("Disallow:"), nl)).otherwise(F.lit("")),
        F.when(k % 4 == 1, F.concat(
            F.lit("User-agent: *"), nl,
            F.lit("Disallow: /search"), nl)).otherwise(F.lit("")),
    )
    return spark.range(50).select(
        F.concat(F.lit("h"), k.cast("string")).alias("host"),
        content.alias("content"),
    )


@register("robots_rules_parse", oracle=_ROBOTS_RULES_ORACLE)
def robots_rules_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 group-structure parse: consecutive User-agent lines
    open a group, its Allow/Disallow lines bind to every named agent;
    comments strip, empty Disallow drops (but the GROUP still emits an
    agent-presence row with NULL rule/path, so a rule-less named group
    beats '*' downstream), a rule block appended after an
    agent-specific group extends THAT group."""
    from .operators.web import parse_robots

    return parse_robots(_robots_fixture(spark))


# urls + verdict chain shared with the crawl-frontier capstone
_ROBOTS_VERDICT_CTES = """
    , urls AS (
      SELECT 'h' || CAST(o_custkey % 50 AS VARCHAR) AS host,
             CASE o_orderkey % 8
               WHEN 0 THEN '/private/doc' || CAST(o_orderkey % 20 AS VARCHAR)
               WHEN 1 THEN '/private/ok/p' || CAST(o_orderkey % 20 AS VARCHAR)
               WHEN 2 THEN '/tmp' || CAST(o_orderkey % 10 AS VARCHAR) || '/x'
               WHEN 3 THEN '/tmp/keep'
               WHEN 4 THEN '/blog/post' || CAST(o_orderkey % 30 AS VARCHAR)
               WHEN 5 THEN '/search/q' || CAST(o_orderkey % 9 AS VARCHAR)
               WHEN 6 THEN '/public/a' || CAST(o_orderkey % 40 AS VARCHAR)
               ELSE '/tmp/keepx' END AS path,
             o_orderkey AS doc_id
      FROM orders WHERE o_orderkey % 6 = 2
    ), exact AS (
      SELECT * FROM rules WHERE agent = 'aquabot'
    ), eff AS (
      SELECT * FROM exact
      UNION ALL
      SELECT * FROM rules r WHERE r.agent = '*'
        AND NOT EXISTS (SELECT 1 FROM exact e WHERE e.host = r.host)
    ), pats AS (
      SELECT host, rule, path, length(path) AS plen,
             CASE WHEN ends_with(esc, '$')
                  THEN replace(left(esc, length(esc) - 1), '*', '%')
                  ELSE replace(esc, '*', '%') || '%' END AS likepat
      FROM (SELECT host, rule, path,
                   replace(replace(replace(path, '\\', '\\\\'),
                                   '%', '\\%'), '_', '\\_') AS esc
            FROM eff)
    ), joined AS (
      SELECT u.host, u.path AS upath, u.doc_id, p.rule, p.path, p.plen,
             p.likepat IS NOT NULL
               AND u.path LIKE p.likepat ESCAPE '\\' AS hit
      FROM urls u LEFT JOIN pats p ON p.host = u.host
    ), ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY host, upath, doc_id
               ORDER BY hit DESC, plen DESC, rule = 'allow' DESC,
                        path ASC) AS rn
      FROM joined
    ), verdicts AS (
      SELECT host, upath AS path, doc_id,
             CASE WHEN coalesce(hit, FALSE) THEN rule = 'allow'
                  ELSE TRUE END AS allowed,
             CASE WHEN hit THEN rule END AS matched_rule,
             CASE WHEN hit THEN path END AS matched_path
      FROM ranked WHERE rn = 1
    )
"""

_ROBOTS_FILTER_ORACLE = ("WITH " + _ROBOTS_SQL + _ROBOTS_VERDICT_CTES
                         + """
    SELECT host, path, doc_id, allowed, matched_rule, matched_path
    FROM verdicts
""")


@register("robots_url_filter", oracle=_ROBOTS_FILTER_ORACLE)
def robots_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-permission verdict per URL: exact-agent group beats '*',
    longest pattern wins, Allow beats Disallow on ties, '$' anchors,
    rule-less hosts allowed."""
    from .operators.web import parse_robots, robots_allowed

    rules = parse_robots(_robots_fixture(spark))
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 6 == 2)
    k = F.col("o_orderkey")
    path = (
        F.when(k % 8 == 0, F.concat(F.lit("/private/doc"),
                                    (k % 20).cast("string")))
        .when(k % 8 == 1, F.concat(F.lit("/private/ok/p"),
                                   (k % 20).cast("string")))
        .when(k % 8 == 2, F.concat(F.lit("/tmp"), (k % 10).cast("string"),
                                   F.lit("/x")))
        .when(k % 8 == 3, F.lit("/tmp/keep"))
        .when(k % 8 == 4, F.concat(F.lit("/blog/post"),
                                   (k % 30).cast("string")))
        .when(k % 8 == 5, F.concat(F.lit("/search/q"),
                                   (k % 9).cast("string")))
        .when(k % 8 == 6, F.concat(F.lit("/public/a"),
                                   (k % 40).cast("string")))
        .otherwise(F.lit("/tmp/keepx"))
    )
    urls = o.select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 50).cast("string"))
        .alias("host"),
        path.alias("path"),
        k.alias("doc_id"),
    )
    return robots_allowed(urls, rules, agent="aquabot")


# ---------------------------------------------------------------------------
# Host-graph PageRank (operators/graph.host_pagerank): the link-based
# quality prior. INTEGER power iteration — bigint micro-units, floor
# divisions — so every iteration is bit-equal between engines under
# any partitioning; the oracle unrolls the 5 iterations as CTEs.
# Nodes 50..59 appear only as destinations -> dangling mass exercised.
# ---------------------------------------------------------------------------

def _pr_cte_chain(iterations: int, e: str = "e", pfx: str = "",
                  init_join: str | None = None) -> str:
    """deg/nn/pr0..prN CTE text over a preceding CTE ``{e}(src, dst)``
    (shared by host_pagerank, the crawl-frontier capstone, and the
    incremental warm-start replay). ``pfx`` namespaces the CTEs so two
    chains can coexist; ``init_join`` names a prior chain's final
    rank CTE to seed pr{pfx}0 from (new nodes fall back to
    PR_UNIT)."""
    if init_join is None:
        init = f"""
      SELECT node, outdeg, CAST(1000000000 AS BIGINT) AS pr
      FROM deg{pfx}"""
    else:
        init = f"""
      SELECT d.node, d.outdeg,
             coalesce(p.pr, CAST(1000000000 AS BIGINT)) AS pr
      FROM deg{pfx} d LEFT JOIN {init_join} p USING (node)"""
    sql = f"""nodes{pfx} AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM {e} UNION ALL SELECT dst FROM {e})
    ), deg{pfx} AS (
      SELECT n.node, coalesce(o.outdeg, 0) AS outdeg
      FROM nodes{pfx} n LEFT JOIN (
        SELECT src AS node, count(*) AS outdeg FROM {e} GROUP BY 1) o
        USING (node)
    ), nn{pfx} AS (
      SELECT count(*) AS n FROM deg{pfx}
    ), pr{pfx}0 AS ({init}
    )"""
    for i in range(1, iterations + 1):
        p = f"pr{pfx}{i - 1}"
        sql += f""", pr{pfx}{i} AS (
      SELECT d.node, d.outdeg,
             150000000 + 85 * (coalesce(s.insum, 0)
                               + dg.dang // nn{pfx}.n)
               // 100 AS pr
      FROM deg{pfx} d
      LEFT JOIN (
        SELECT {e}.dst AS node, sum(p.pr // p.outdeg) AS insum
        FROM {e} JOIN {p} p ON p.node = {e}.src AND p.outdeg > 0
        GROUP BY 1) s ON s.node = d.node
      CROSS JOIN (SELECT coalesce(sum(pr), 0) AS dang
                  FROM {p} WHERE outdeg = 0) dg
      CROSS JOIN nn{pfx}
    )"""
    return sql


def _pagerank_oracle() -> str:
    return f"""
    WITH e AS (
      SELECT DISTINCT o_custkey % 50 AS src, o_orderkey % 60 AS dst
      FROM orders
    ), {_pr_cte_chain(5)}
    SELECT node, CAST(pr AS BIGINT) AS rank_units,
           CAST(pr AS BIGINT) / 1000000000.0 AS rank
    FROM pr5
"""


@register("host_pagerank", oracle=_pagerank_oracle())
def host_pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-iteration integer-exact PageRank over a synthesized host
    link graph (damping 0.85, dangling mass shared uniformly)."""
    from .operators.graph import host_pagerank

    o = _t(spark, sf_dir, "orders")
    edges = o.select(
        (F.col("o_custkey") % 50).alias("src"),
        (F.col("o_orderkey") % 60).alias("dst"),
    ).distinct()
    return host_pagerank(edges, iterations=5)


# Link-graph degree profile: in/out degree, distinct peers, and
# reciprocity (mutual links) per host — the spam/seed triage columns
# next to PageRank. Reciprocity = edges whose reverse edge exists:
# one self-equi-join on the reversed key, pair mass = edge count.
_LINK_STATS_ORACLE = """
    WITH e AS (
      SELECT DISTINCT o_custkey % 50 AS src, o_orderkey % 60 AS dst
      FROM orders
    ), recip AS (
      SELECT a.src, count(*) AS mutual
      FROM e a JOIN e b ON b.src = a.dst AND b.dst = a.src
      GROUP BY 1
    ), outs AS (
      SELECT src AS node, count(*) AS out_degree,
             count(DISTINCT dst) AS out_peers
      FROM e GROUP BY 1
    ), ins AS (
      SELECT dst AS node, count(*) AS in_degree FROM e GROUP BY 1
    )
    SELECT coalesce(o.node, i.node) AS node,
           CAST(coalesce(o.out_degree, 0) AS BIGINT) AS out_degree,
           CAST(coalesce(o.out_peers, 0) AS BIGINT) AS out_peers,
           CAST(coalesce(i.in_degree, 0) AS BIGINT) AS in_degree,
           CAST(coalesce(r.mutual, 0) AS BIGINT) AS mutual_links
    FROM outs o
    FULL OUTER JOIN ins i ON i.node = o.node
    LEFT JOIN recip r ON r.src = coalesce(o.node, i.node)
"""


@register("host_link_stats", oracle=_LINK_STATS_ORACLE)
def host_link_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host degree/reciprocity profile over the synthesized link
    graph — three partial-aggregable groupBys + one reversed-edge
    equi-join (pair mass = edge count, never quadratic)."""
    o = _t(spark, sf_dir, "orders")
    e = o.select(
        (F.col("o_custkey") % 50).alias("src"),
        (F.col("o_orderkey") % 60).alias("dst"),
    ).distinct()
    recip = (
        e.alias("a")
        .join(e.alias("b"),
              (F.col("b.src") == F.col("a.dst"))
              & (F.col("b.dst") == F.col("a.src")))
        .groupBy(F.col("a.src").alias("node"))
        .agg(F.count(F.lit(1)).alias("mutual"))
    )
    outs = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree"),
        F.countDistinct("dst").alias("out_peers"))
    ins = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree"))
    return (
        outs.join(ins, "node", "full_outer")
        .join(recip, "node", "left")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).cast("long")
            .alias("out_degree"),
            F.coalesce("out_peers", F.lit(0)).cast("long")
            .alias("out_peers"),
            F.coalesce("in_degree", F.lit(0)).cast("long")
            .alias("in_degree"),
            F.coalesce("mutual", F.lit(0)).cast("long")
            .alias("mutual_links"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 curation capstone: LM perplexity buckets x exact-dedup
# canonicalization x weighted A-ES sampling composed into a training
# manifest — keep head/middle-bucket canonicals, then draw 20 docs per
# source with head weighted 3:1 over middle. Each component is
# independently oracled (surprisal_quality_buckets, dedup_exact,
# weighted_stratified_sample); this verifies the COMPOSITION.
# ---------------------------------------------------------------------------

_SCORED_MANIFEST_ORACLE = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), freq AS (
      SELECT tok, count(*) AS cnt FROM tok GROUP BY tok
    ), tot AS (
      SELECT sum(cnt) AS total FROM freq
    ), surp AS (
      SELECT tok, CAST(floor(-ln(cnt / total) * 1000000 + 0.5) AS BIGINT) AS q
      FROM freq, tot
    ), d AS (
      SELECT t.doc_id, sum(q) AS sq, count(*) AS n
      FROM tok t JOIN surp USING (tok) GROUP BY 1
    ), keyed AS (
      SELECT doc_id,
             CAST(floor((sq / 1000000.0 / n) * 1000000 + 0.5) AS BIGINT)
               AS mq
      FROM d
    ), nd AS (
      SELECT count(*) AS n_docs FROM keyed
    ), r AS (
      SELECT doc_id, mq,
             row_number() OVER (ORDER BY mq ASC, doc_id ASC) AS rank
      FROM keyed
    ), bucketed AS (
      SELECT doc_id,
             CASE WHEN rank * 3 <= nd.n_docs THEN 'head'
                  WHEN rank * 3 <= nd.n_docs * 2 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM r CROSS JOIN nd
    ), canon AS (
      SELECT d.doc_id, d.source, b.bucket,
             min(d.doc_id) OVER (
               PARTITION BY md5(regexp_replace(lower(d.text), '\\s+',
                                               ' ', 'g'))
             ) = d.doc_id AS canonical
      FROM documents d JOIN bucketed b ON b.doc_id = d.doc_id
      WHERE b.bucket <> 'tail'
    ), pool AS (
      SELECT doc_id, source, bucket,
             CASE WHEN bucket = 'head' THEN 3 ELSE 1 END AS weight
      FROM canon WHERE canonical
    ), drawn AS (
      SELECT doc_id, source, bucket, weight,
             row_number() OVER (
               PARTITION BY source
               ORDER BY CAST(floor(
                 ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                     || '|manifest-v1'), 1, 15) AS BIGINT) + 1)
                    / CAST(1152921504606846976 AS DOUBLE))
                 / CAST(weight AS DOUBLE) * 1000000000.0) AS BIGINT)
                 DESC, doc_id ASC) AS sample_rank
      FROM pool
    )
    SELECT doc_id, source, bucket, CAST(weight AS BIGINT) AS weight,
           CAST(sample_rank AS BIGINT) AS sample_rank
    FROM drawn WHERE sample_rank <= 20
"""


@register("scored_curation_manifest", oracle=_SCORED_MANIFEST_ORACLE)
def scored_curation_manifest_q(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Training manifest: fluent-bucket canonicals sampled 3:1
    head-over-middle, 20 per source."""
    from .functions.text import fingerprint
    from .operators.dedup import (unigram_surprisal,
                                  weighted_stratified_sample)
    from .operators.rank import global_rank
    from pyspark.sql import Window as W

    docs = _t(spark, sf_dir, "documents")
    surp = unigram_surprisal(docs)
    keyed = surp.select(
        "doc_id",
        F.floor(F.col("mean_surprisal").cast("double") * 1e6
                + F.lit(0.5)).cast("long").alias("__mq"))
    ranked = global_rank(keyed, ["__mq", "doc_id"], rank_col="__r")
    nd = keyed.agg(F.count(F.lit(1)).alias("n_docs"))
    bucketed = (
        ranked.crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            F.when(F.col("__r") * 3 <= F.col("n_docs"), "head")
            .when(F.col("__r") * 3 <= F.col("n_docs") * 2, "middle")
            .otherwise("tail").alias("bucket"))
        .where(F.col("bucket") != "tail")
    )
    wfp = W.partitionBy("__fp")
    canon = (
        docs.join(bucketed, "doc_id")
        .withColumn("__fp", fingerprint(F.col("text")))
        .withColumn("__canon",
                    F.min("doc_id").over(wfp) == F.col("doc_id"))
        .where(F.col("__canon"))
    )
    pool = canon.select(
        "doc_id", "source", "bucket",
        F.when(F.col("bucket") == "head", 3).otherwise(1)
        .cast("long").alias("weight"))
    return weighted_stratified_sample(
        pool, k=20, weight_col="weight", salt="manifest-v1")


# ---------------------------------------------------------------------------
# Deep-graph connected components (operators/graph.connected_components,
# pointer jumping): 97-node chains are the adversarial shape for plain
# min-label propagation (depth rounds); path halving converges in
# O(log depth). Chain-break fixture has a closed-form answer.
# ---------------------------------------------------------------------------

_CHAIN_CC_ORACLE = """
    WITH nd AS (SELECT count(*) AS n FROM documents)
    SELECT doc_id,
           (doc_id // 97) * 97 AS component_rep,
           CAST(least(97, nd.n - (doc_id // 97) * 97) AS BIGINT)
             AS component_size
    FROM documents CROSS JOIN nd
"""


@register("chain_components", oracle=_CHAIN_CC_ORACLE)
def chain_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over consecutive-id chains broken at
    multiples of 97 (depth-97 paths — the min-label worst case,
    solved in ~8 pointer-jumping rounds)."""
    from .operators.graph import connected_components

    ids = _t(spark, sf_dir, "documents").select("doc_id")
    a = ids.select(F.col("doc_id").alias("id_a"))
    b = ids.select(F.col("doc_id").alias("id_b"))
    edges = a.join(
        b, (b["id_b"] == a["id_a"] + 1)
        & ((a["id_a"] + 1) % 97 != 0))
    return connected_components(edges, ids)


# ---------------------------------------------------------------------------
# Z-order layout key (operators/vector.zorder_key): the OPTIMIZE-ZORDER
# story as a plain codegen'd sort key — bbox queries over a z-sorted table
# prune on
# row-group min/max stats instead of scanning every file.
# ---------------------------------------------------------------------------

_Z_INTERLEAVE = " + ".join(
    f"(((qx >> {i}) & 1) << {2 * i}) + (((qy >> {i}) & 1) << {2 * i + 1})"
    for i in range(16))

_ZORDER_ORACLE = f"""
    WITH pts AS (
      SELECT c_custkey,
             50.0 + (c_custkey % 2000) / CAST(100 AS DOUBLE) AS lat,
             -140.0 + (c_custkey % 3500) / CAST(100 AS DOUBLE) AS lon
      FROM customer
    ), q AS (
      SELECT c_custkey,
             CAST(floor(least(greatest(
               (lat - CAST(50 AS DOUBLE)) / CAST(20 AS DOUBLE),
               CAST(0 AS DOUBLE)), CAST(1 AS DOUBLE)) * 65535)
               AS BIGINT) AS qx,
             CAST(floor(least(greatest(
               (lon - CAST(-140 AS DOUBLE)) / CAST(35 AS DOUBLE),
               CAST(0 AS DOUBLE)), CAST(1 AS DOUBLE)) * 65535)
               AS BIGINT) AS qy
      FROM pts
    )
    SELECT c_custkey, CAST({_Z_INTERLEAVE} AS BIGINT) AS zkey
    FROM q
"""


@register("zorder_layout_key", oracle=_ZORDER_ORACLE)
def zorder_layout_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit-per-axis Morton key over synthesized station
    coordinates (fixed Yukon-ish bounds; out-of-range clamps)."""
    from .operators.vector import zorder_key

    c = _t(spark, sf_dir, "customer")
    lat = F.lit(50.0) + (F.col("c_custkey") % 2000) / F.lit(100.0)
    lon = F.lit(-140.0) + (F.col("c_custkey") % 3500) / F.lit(100.0)
    return c.select(
        "c_custkey",
        zorder_key(lat, lon, 50.0, 70.0, -140.0, -105.0, bits=16)
        .alias("zkey"))


# ---------------------------------------------------------------------------
# Crawl-frontier capstone: the web tier composed — RFC 9309 verdicts
# gate the URL corpus, host PageRank prices each host, and the
# frontier table carries per-host budgets (allowed/blocked counts,
# next allowed path). Every component is independently oracled
# (robots_url_filter, host_pagerank); this verifies the COMPOSITION.
# ---------------------------------------------------------------------------

_FRONTIER_ORACLE = (
    "WITH " + _ROBOTS_SQL + _ROBOTS_VERDICT_CTES + """
    , e AS (
      SELECT DISTINCT 'h' || CAST(o_custkey % 50 AS VARCHAR) AS src,
             'h' || CAST(o_orderkey % 50 AS VARCHAR) AS dst
      FROM orders
    ), """ + _pr_cte_chain(3) + """
    , agg AS (
      SELECT host,
             CAST(sum(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_allowed,
             CAST(sum(CASE WHEN allowed THEN 0 ELSE 1 END) AS BIGINT)
               AS n_disallowed,
             min(CASE WHEN allowed THEN path END) AS next_path
      FROM verdicts GROUP BY 1
    )
    SELECT a.host, CAST(coalesce(p.pr, 0) AS BIGINT) AS rank_units,
           a.n_allowed, a.n_disallowed, a.next_path
    FROM agg a LEFT JOIN pr3 p ON p.node = a.host
""")


@register("crawl_frontier_priority", oracle=_FRONTIER_ORACLE)
def crawl_frontier_priority_q(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Per-host crawl budget: robots-gated URL counts + link-graph
    priority (3-iteration integer PageRank) + next allowed path."""
    from .operators.graph import host_pagerank
    from .operators.web import parse_robots, robots_allowed

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 6 == 2)
    k = F.col("o_orderkey")
    path = (
        F.when(k % 8 == 0, F.concat(F.lit("/private/doc"),
                                    (k % 20).cast("string")))
        .when(k % 8 == 1, F.concat(F.lit("/private/ok/p"),
                                   (k % 20).cast("string")))
        .when(k % 8 == 2, F.concat(F.lit("/tmp"), (k % 10).cast("string"),
                                   F.lit("/x")))
        .when(k % 8 == 3, F.lit("/tmp/keep"))
        .when(k % 8 == 4, F.concat(F.lit("/blog/post"),
                                   (k % 30).cast("string")))
        .when(k % 8 == 5, F.concat(F.lit("/search/q"),
                                   (k % 9).cast("string")))
        .when(k % 8 == 6, F.concat(F.lit("/public/a"),
                                   (k % 40).cast("string")))
        .otherwise(F.lit("/tmp/keepx"))
    )
    urls = o.select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 50).cast("string"))
        .alias("host"),
        path.alias("path"),
        k.alias("doc_id"),
    )
    verdict = robots_allowed(
        urls, parse_robots(_robots_fixture(spark)), agent="aquabot")
    full = _t(spark, sf_dir, "orders")
    edges = full.select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 50).cast("string"))
        .alias("src"),
        F.concat(F.lit("h"), (F.col("o_orderkey") % 50).cast("string"))
        .alias("dst"),
    ).distinct()
    pr = host_pagerank(edges, iterations=3).select(
        F.col("node").alias("host"), "rank_units")
    agg = verdict.groupBy("host").agg(
        F.sum(F.col("allowed").cast("long")).alias("n_allowed"),
        F.sum((~F.col("allowed")).cast("long")).alias("n_disallowed"),
        F.min(F.when(F.col("allowed"), F.col("path"))).alias("next_path"),
    )
    return agg.join(pr, "host", "left").select(
        "host",
        F.coalesce("rank_units", F.lit(0)).cast("long")
        .alias("rank_units"),
        "n_allowed", "n_disallowed", "next_path")


# ---------------------------------------------------------------------------
# Interpolated bigram LM surprisal (operators/dedup.bigram_surprisal):
# the KenLM-lite quality axis — p(w|prev) = 0.75*c(prev,w)/c(prev)
# + 0.25*c(w)/N from the corpus itself, per-bigram micro-nat
# quantization, NULL mean for sub-2-token docs.
# ---------------------------------------------------------------------------

_BIGRAM_SURPRISAL_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks
      FROM documents
    ), tok AS (
      SELECT unnest(toks) AS w FROM base
    ), uni AS (
      SELECT w, count(*) AS cw FROM tok GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(cw) AS DOUBLE) AS total FROM uni
    ), pairs AS (
      SELECT doc_id, toks[i] AS p, toks[i + 1] AS w
      FROM base, unnest(generate_series(1, len(toks) - 1)) AS t(i)
    ), bgc AS (
      SELECT p, w, count(*) AS cb FROM pairs GROUP BY 1, 2
    ), score AS (
      SELECT bgc.p, bgc.w,
             CAST(floor(
               -ln(CAST(0.75 AS DOUBLE) * bgc.cb / up.cw
                   + CAST(0.25 AS DOUBLE) * uw.cw / tot.total)
               * 1000000.0 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
      FROM bgc
      JOIN uni up ON up.w = bgc.p
      JOIN uni uw ON uw.w = bgc.w
      CROSS JOIN tot
    ), per_doc AS (
      SELECT pairs.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             {R('sum(q) / 1000000.0 / count(*)', 6)} AS mean_surprisal
      FROM pairs JOIN score ON score.p = pairs.p AND score.w = pairs.w
      GROUP BY 1
    )
    SELECT b.doc_id,
           coalesce(d.n_bigrams, 0) AS n_bigrams,
           d.mean_surprisal
    FROM base b LEFT JOIN per_doc d ON d.doc_id = b.doc_id
"""


@register("bigram_surprisal", oracle=_BIGRAM_SURPRISAL_ORACLE)
def bigram_surprisal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM surprisal over the documents corpus."""
    from .operators.dedup import bigram_surprisal

    docs = _t(spark, sf_dir, "documents")
    out = bigram_surprisal(docs, lam=0.75)
    return _round(out, {"mean_surprisal": 6})


# PMI collocations: pointwise mutual information over adjacent token
# pairs — the classic corpus collocation extractor ("new york"-class
# multiword expressions). pmi = ln(c(a,b) * T / (c(a) * c(b))) with T
# = total bigram positions; min-count floor keeps the head of the
# distribution; micro-nat quantization makes ranking bit-stable.
_PMI_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks
      FROM documents
    ), tok AS (
      SELECT unnest(toks) AS w FROM base
    ), uni AS (
      SELECT w, count(*) AS cw FROM tok GROUP BY 1
    ), pairs AS (
      SELECT toks[i] AS a, toks[i + 1] AS b
      FROM base, unnest(generate_series(1, len(toks) - 1)) AS t(i)
    ), bgc AS (
      SELECT a, b, count(*) AS cb FROM pairs GROUP BY 1, 2
    ), tot AS (
      SELECT count(*) AS t FROM pairs
    ), scored AS (
      SELECT bgc.a, bgc.b, bgc.cb,
             CAST(floor(
               ln(CAST(bgc.cb AS DOUBLE) * tot.t
                  / (CAST(ua.cw AS DOUBLE) * ub.cw))
               * 1000000.0 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
      FROM bgc
      JOIN uni ua ON ua.w = bgc.a
      JOIN uni ub ON ub.w = bgc.b
      CROSS JOIN tot
      WHERE bgc.cb >= 5
    ), ranked AS (
      SELECT a, b, cb, q,
             row_number() OVER (ORDER BY q DESC, a ASC, b ASC) AS rank
      FROM scored
    )
    SELECT a, b, CAST(cb AS BIGINT) AS pair_count,
           q / 1000000.0 AS pmi, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 20
"""


@register("pmi_collocations", oracle=_PMI_ORACLE)
def pmi_collocations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-pair collocations by PMI (min pair count 5).

    Scale: one bigram aggregation (corpus-token shuffle class), uni
    dims joined on the token key (vocab-sized, AQE decides), total via
    agg + 1-row broadcast. The final global top-20 ranks a frame
    already cut to cb >= 5 collocation candidates — bigram-TYPE
    cardinality, not corpus cardinality; at web scale raise the floor
    (or rank per shard then merge) before the single-partition sort."""
    docs = _t(spark, sf_dir, "documents")
    from .functions.text import tokens
    from pyspark.sql import Window as W

    base = docs.select(tokens(F.lower(F.col("text"))).alias("__toks"))
    base = base.withColumn("__n", F.size("__toks"))
    toks = F.col("__toks")
    uni = (
        base.select(F.explode(toks).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    )
    pairs = base.select(
        F.explode(
            F.when(
                F.col("__n") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.col("__n") - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("a"),
                        F.element_at(toks, i + 1).alias("b")),
                ),
            )
        ).alias("bg"),
    ).select(F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))
    bgc = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cb"))
    tot = pairs.agg(F.count(F.lit(1)).alias("t"))
    scored = (
        bgc.where(F.col("cb") >= 5)
        .join(uni.select(F.col("w").alias("a"),
                         F.col("cw").alias("ca")), "a")
        .join(uni.select(F.col("w").alias("b"),
                         F.col("cw").alias("cb2")), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a", "b", "cb",
            F.floor(
                F.log(F.col("cb").cast("double") * F.col("t")
                      / (F.col("ca").cast("double") * F.col("cb2")))
                * 1e6 + F.lit(0.5)
            ).cast("long").alias("__q"),
        )
    )
    # distributed top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition heaps, k-row merge) — no single-partition window
    # over the candidate frame; the rank window then runs on 20 rows
    top = scored.orderBy(F.desc("__q"), F.asc("a"), F.asc("b")).limit(20)
    w = W.orderBy(F.desc("__q"), F.asc("a"), F.asc("b"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("a", "b", F.col("cb").alias("pair_count"),
                (F.col("__q") / F.lit(1e6)).alias("pmi"),
                F.col("rank").cast("long").alias("rank"))
    )


# Kneser-Ney: the continuation-count rung above deleted interpolation.
# The float expression shape (operand order, promotion points) is
# mirrored verbatim so both engines agree to the ulp.
_KN_BIGRAM_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks
      FROM documents
    ), pairs AS (
      SELECT doc_id, toks[i] AS p, toks[i + 1] AS w
      FROM base, unnest(generate_series(1, len(toks) - 1)) AS t(i)
    ), bgc AS (
      SELECT p, w, count(*) AS cb FROM pairs GROUP BY 1, 2
    ), lft AS (
      SELECT p, sum(cb) AS cu, count(*) AS n1u FROM bgc GROUP BY 1
    ), rgt AS (
      SELECT w, count(*) AS n1w FROM bgc GROUP BY 1
    ), tot AS (
      SELECT count(*) AS nbb FROM bgc
    ), score AS (
      SELECT bgc.p, bgc.w,
             CAST(floor(
               -ln((greatest(bgc.cb - CAST(0.75 AS DOUBLE),
                             CAST(0 AS DOUBLE))
                    + CAST(0.75 AS DOUBLE) * lft.n1u
                    * (rgt.n1w / tot.nbb))
                   / lft.cu)
               * 1000000.0 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
      FROM bgc JOIN lft ON lft.p = bgc.p JOIN rgt ON rgt.w = bgc.w
      CROSS JOIN tot
    ), per_doc AS (
      SELECT pairs.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             {R('sum(q) / 1000000.0 / count(*)', 6)} AS mean_surprisal
      FROM pairs JOIN score ON score.p = pairs.p AND score.w = pairs.w
      GROUP BY 1
    )
    SELECT b.doc_id,
           coalesce(d.n_bigrams, 0) AS n_bigrams,
           d.mean_surprisal
    FROM base b LEFT JOIN per_doc d ON d.doc_id = b.doc_id
"""


@register("kn_bigram_surprisal", oracle=_KN_BIGRAM_ORACLE)
def kn_bigram_surprisal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram surprisal (continuation counts:
    p_cont(w) = distinct histories of w / distinct bigram types)."""
    from .operators.dedup import kn_bigram_surprisal

    docs = _t(spark, sf_dir, "documents")
    out = kn_bigram_surprisal(docs, discount=0.75)
    return _round(out, {"mean_surprisal": 6})


# ---------------------------------------------------------------------------
# Provenance-aware curation capstone: robots.txt crawl permission x
# a minimal quality gate x exact-dedup canonicalization, composed in
# the standard order (provenance + quality first, dedup among
# survivors). Each component is independently oracled elsewhere
# (robots_url_filter, gopher_quality_gate/text_metrics, dedup_exact);
# this verifies the COMPOSITION.
# ---------------------------------------------------------------------------

_PROV_GATE_ORACLE = "WITH " + _ROBOTS_SQL + """
    , urls AS (
      SELECT doc_id, text,
             'h' || CAST(doc_id % 50 AS VARCHAR) AS host,
             CASE doc_id % 6
               WHEN 0 THEN '/private/p' || CAST(doc_id % 9 AS VARCHAR)
               WHEN 1 THEN '/private/ok/q' || CAST(doc_id % 9 AS VARCHAR)
               WHEN 2 THEN '/blog/b' || CAST(doc_id % 9 AS VARCHAR)
               WHEN 3 THEN '/search/s' || CAST(doc_id % 9 AS VARCHAR)
               WHEN 4 THEN '/tmp' || CAST(doc_id % 9 AS VARCHAR)
               ELSE '/page/' || CAST(doc_id % 40 AS VARCHAR) END AS path
      FROM documents
    ), exact AS (
      SELECT * FROM rules WHERE agent = 'aquabot'
    ), eff AS (
      SELECT * FROM exact
      UNION ALL
      SELECT * FROM rules r WHERE r.agent = '*'
        AND NOT EXISTS (SELECT 1 FROM exact e WHERE e.host = r.host)
    ), pats AS (
      SELECT host, rule, path, length(path) AS plen,
             CASE WHEN ends_with(esc, '$')
                  THEN replace(left(esc, length(esc) - 1), '*', '%')
                  ELSE replace(esc, '*', '%') || '%' END AS likepat
      FROM (SELECT host, rule, path,
                   replace(replace(replace(path, '\\', '\\\\'),
                                   '%', '\\%'), '_', '\\_') AS esc
            FROM eff)
    ), verdict AS (
      SELECT doc_id, allowed FROM (
        SELECT u.doc_id, coalesce(hit, FALSE) AS hitf, p.rule,
               row_number() OVER (
                 PARTITION BY u.doc_id
                 ORDER BY hit DESC, plen DESC, rule = 'allow' DESC,
                          p.path ASC) AS rn
        FROM urls u LEFT JOIN (
          SELECT host, rule, path, plen, likepat, TRUE AS pat_row
          FROM pats) p ON p.host = u.host
        CROSS JOIN LATERAL (SELECT p.pat_row IS NOT NULL
               AND u.path LIKE p.likepat ESCAPE '\\' AS hit)
      ), LATERAL (SELECT CASE WHEN hitf THEN rule = 'allow'
                              ELSE TRUE END AS allowed)
      WHERE rn = 1
    ), q AS (
      -- every 11th doc collapses to one boilerplate page: the exact-dup
      -- class web corpora are full of, so the dedup axis has real work
      SELECT doc_id,
             len(string_split(t2, ' ')) AS nw,
             (CASE WHEN list_contains(string_split(t2, ' '), 'the')
                   THEN 1 ELSE 0 END)
             + (CASE WHEN list_contains(string_split(t2, ' '), 'and')
                     THEN 1 ELSE 0 END)
             + (CASE WHEN list_contains(string_split(t2, ' '), 'of')
                     THEN 1 ELSE 0 END) AS hits,
             md5(regexp_replace(lower(t2), '\\s+', ' ', 'g')) AS fp
      FROM (SELECT doc_id,
                   CASE WHEN doc_id % 11 = 7
                        THEN 'the default page of this site and all of '
                             || 'the content is pending review the '
                             || 'webmaster of the site posted nothing '
                             || 'here yet and the page will update soon '
                             || 'with all of the new content of the '
                             || 'season'
                        ELSE text END AS t2
            FROM documents)
    ), gated AS (
      SELECT q.doc_id, v.allowed,
             q.nw >= 20 AND q.nw <= 100000 AND q.hits >= 1
               AS quality_keep,
             q.fp
      FROM q JOIN verdict v ON v.doc_id = q.doc_id
    ), canon AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) = doc_id
               AS canonical
      FROM gated WHERE allowed AND quality_keep
    )
    SELECT g.doc_id, g.allowed, g.quality_keep,
           coalesce(c.canonical, FALSE) AS canonical,
           g.allowed AND g.quality_keep
             AND coalesce(c.canonical, FALSE) AS kept
    FROM gated g LEFT JOIN canon c ON c.doc_id = g.doc_id
"""


@register("provenance_curation_gate", oracle=_PROV_GATE_ORACLE)
def provenance_curation_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone: robots permission AND minimal quality gate AND
    exact-dedup canonical (min doc id per fingerprint AMONG gate
    survivors) -> kept."""
    from pyspark.sql import Window as W

    from .functions.text import fingerprint, tokens
    from .operators.web import parse_robots, robots_allowed

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    path = (
        F.when(d % 6 == 0, F.concat(F.lit("/private/p"),
                                    (d % 9).cast("string")))
        .when(d % 6 == 1, F.concat(F.lit("/private/ok/q"),
                                   (d % 9).cast("string")))
        .when(d % 6 == 2, F.concat(F.lit("/blog/b"),
                                   (d % 9).cast("string")))
        .when(d % 6 == 3, F.concat(F.lit("/search/s"),
                                   (d % 9).cast("string")))
        .when(d % 6 == 4, F.concat(F.lit("/tmp"), (d % 9).cast("string")))
        .otherwise(F.concat(F.lit("/page/"), (d % 40).cast("string")))
    )
    urls = docs.select(
        "doc_id",
        F.concat(F.lit("h"), (d % 50).cast("string")).alias("host"),
        path.alias("path"),
    )
    rules = parse_robots(_robots_fixture(spark))
    verdict = robots_allowed(urls, rules, agent="aquabot") \
        .select("doc_id", "allowed")
    boiler = ("the default page of this site and all of the content is "
              "pending review the webmaster of the site posted nothing "
              "here yet and the page will update soon with all of the "
              "new content of the season")
    t2 = F.when(d % 11 == 7, F.lit(boiler)).otherwise(F.col("text"))
    toks = tokens(t2)
    nw = F.size(toks)
    hits = sum(
        F.array_contains(toks, w).cast("int") for w in ("the", "and", "of"))
    gated = (
        docs.select(
            "doc_id",
            ((nw >= 20) & (nw <= 100_000) & (hits >= 1))
            .alias("quality_keep"),
            fingerprint(t2).alias("__fp"),
        )
        .join(verdict, "doc_id")
    )
    surv = gated.where(F.col("allowed") & F.col("quality_keep")) \
        .withColumn(
            "canonical",
            F.min("doc_id").over(W.partitionBy("__fp")) == F.col("doc_id"),
        ).select("doc_id", "canonical")
    return (
        gated.join(surv, "doc_id", "left")
        .select(
            "doc_id", "allowed", "quality_keep",
            F.coalesce("canonical", F.lit(False)).alias("canonical"),
            (F.col("allowed") & F.col("quality_keep")
             & F.coalesce("canonical", F.lit(False))).alias("kept"),
        )
    )


# ---------------------------------------------------------------------------
# Document chunking (operators/packing.chunk_documents): the standard
# pre-tokenization windowing stage — max_tokens windows advancing by
# (max_tokens - overlap), last chunk short, <=max_tokens docs yield
# one chunk. Pure map-side; fixture uses 24/8 so the 10-100-token docs
# produce real multi-chunk splits.
# ---------------------------------------------------------------------------

_CHUNK_ORACLE = """
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), starts AS (
      SELECT doc_id, toks, n,
             unnest(generate_series(0,
               greatest(CAST(floor(CAST(n - 1 - 8 AS DOUBLE) / 16)
                             AS INT), 0))) AS i
      FROM base
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           array_to_string(toks[i * 16 + 1 : i * 16 + 24], ' ')
             AS chunk_text,
           CAST(least(n - i * 16, 24) AS BIGINT) AS n_tokens,
           CAST(i * 16 AS BIGINT) AS start_token
    FROM starts
"""


@register("document_chunking", oracle=_CHUNK_ORACLE)
def document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping training-window chunks (24-token windows, 8-token
    overlap) over the documents corpus."""
    from .operators.packing import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, max_tokens=24, overlap=8)


# ---------------------------------------------------------------------------
# Chunk-level cross-document near-dup: chunking x MinHash/LSH composed
# at sub-document granularity — catches partial overlap (quotation,
# boilerplate sections, plagiarized passages) that document-level
# signatures dilute away. Same-document pairs are excluded (adjacent
# chunks trivially share their overlap region).
# ---------------------------------------------------------------------------

_CHUNK_NEARDUP_ORACLE = """
    WITH cbase AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), chunks AS (
      SELECT doc_id * 1000 + i AS cid,
             array_to_string(toks[i * 16 + 1 : i * 16 + 24], ' ') AS ctext
      FROM cbase,
           unnest(generate_series(0,
             greatest(CAST(floor(CAST(n - 1 - 8 AS DOUBLE) / 16) AS INT),
                      0))) AS t(i)
    ), shingled AS (
      SELECT cid, toks, n,
             unnest(generate_series(0, greatest(n - 3, 0))) AS i
      FROM (SELECT cid, string_split(lower(ctext), ' ') AS toks,
                   len(string_split(lower(ctext), ' ')) AS n
            FROM chunks)
    ), shingles AS (
      SELECT DISTINCT cid,
             array_to_string(toks[i + 1 : i + 3], ' ') AS sh
      FROM shingled
    ), hashed AS (
      SELECT cid, CAST('0x' || substr(md5(sh), 1, 13) AS BIGINT) AS base
      FROM shingles
    ), sig AS (
      SELECT cid,
""" + ",\n".join(
    f"min(({2 * i + 3} * base + {(i + 1) * 2654435769}) % {_MINHASH_MOD})"
    f" AS h{i}"
    for i in range(8)
) + """
      FROM hashed GROUP BY cid
    ), banded AS (
      SELECT cid, band, key FROM (
        SELECT cid,
               unnest([0, 1, 2, 3]) AS band,
               unnest([CAST(h0 AS VARCHAR) || ',' || CAST(h1 AS VARCHAR),
                       CAST(h2 AS VARCHAR) || ',' || CAST(h3 AS VARCHAR),
                       CAST(h4 AS VARCHAR) || ',' || CAST(h5 AS VARCHAR),
                       CAST(h6 AS VARCHAR) || ',' || CAST(h7 AS VARCHAR)])
                 AS key
        FROM sig
      )
    ), pairs AS (
      SELECT DISTINCT a.cid AS id_a, b.cid AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.cid < b.cid
    )
    SELECT id_a // 1000 AS doc_a, id_a % 1000 AS chunk_a,
           id_b // 1000 AS doc_b, id_b % 1000 AS chunk_b
    FROM pairs
    WHERE id_a // 1000 <> id_b // 1000
"""


@register("chunk_cross_doc_near_dup", oracle=_CHUNK_NEARDUP_ORACLE)
def chunk_cross_doc_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document near-dup pairs: 24/8 chunking -> per-chunk MinHash
    -> LSH banding -> cross-document candidate pairs."""
    from .operators.dedup import lsh_candidate_pairs, minhash_signatures
    from .operators.packing import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    ch = chunk_documents(docs, max_tokens=24, overlap=8).select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("cid"),
        "chunk_text",
    )
    sig = minhash_signatures(ch, id_col="cid", text_col="chunk_text",
                             num_hashes=8, shingle_k=3)
    pairs = lsh_candidate_pairs(sig, id_col="cid", num_hashes=8, bands=4)
    da = F.expr("id_a div 1000")
    db = F.expr("id_b div 1000")
    return pairs.where(da != db).select(
        da.alias("doc_a"), (F.col("id_a") % 1000).alias("chunk_a"),
        db.alias("doc_b"), (F.col("id_b") % 1000).alias("chunk_b"),
    )


# ---------------------------------------------------------------------------
# Model-based quality scoring (functions/text.hashed_linear_score):
# the DCLM/FineWeb-Edu filtering shape — unigram+bigram feature
# hashing into 4096 buckets, tf-weighted dot product with a weight
# vector (deterministic stand-in here; broadcast a trained model in
# production), sigmoid squash. Pure codegen, map-only.
# ---------------------------------------------------------------------------

_MODEL_QUALITY_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks,
             len(string_split(lower(text), ' ')) AS n
      FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_concat(
               toks,
               CASE WHEN n >= 2
                    THEN list_transform(range(1, n),
                           i -> toks[i] || ' ' || toks[i + 1])
                    ELSE [] END)) AS gm
      FROM base
    ), feats AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(gm), 1, 13) AS BIGINT) % 4096 AS b
      FROM grams
    ), scored AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_features,
             sum(CAST(floor(
               ((b * 2654435761) % 2001 - 1000)
                 / CAST(1000 AS DOUBLE) * 1000000.0
                 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS q
      FROM feats GROUP BY 1
    )
    SELECT doc_id, n_features,
           {R('1 / (1 + exp(-(q / 1000000.0 / n_features)))', 6)}
             AS quality_prob
    FROM scored
"""


@register("model_quality_score", oracle=_MODEL_QUALITY_ORACLE)
def model_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear quality classifier over the documents corpus."""
    from .functions.text import hashed_linear_score, tokens

    docs = _t(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    n = F.size(toks)
    n_features = n + F.greatest(n - 1, F.lit(0))
    out = docs.select(
        "doc_id",
        n_features.cast("long").alias("n_features"),
        hashed_linear_score(F.col("text"), num_buckets=4096)
        .alias("quality_prob"),
    )
    return _round(out, {"quality_prob": 6})


# ---------------------------------------------------------------------------
# Document containment from chunk matches: per ordered (doc_a, doc_b),
# the fraction of A's chunks with at least one LSH match in B — the
# asymmetric overlap measure ("A is mostly contained in B") that
# symmetric document signatures cannot express.
# ---------------------------------------------------------------------------

_CONTAINMENT_ORACLE = _CHUNK_NEARDUP_ORACLE.replace(
    """    SELECT id_a // 1000 AS doc_a, id_a % 1000 AS chunk_a,
           id_b // 1000 AS doc_b, id_b % 1000 AS chunk_b
    FROM pairs
    WHERE id_a // 1000 <> id_b // 1000
""",
    """    , cross_pairs AS (
      SELECT id_a // 1000 AS doc_a, id_a % 1000 AS chunk_a,
             id_b // 1000 AS doc_b, id_b % 1000 AS chunk_b
      FROM pairs
      WHERE id_a // 1000 <> id_b // 1000
    ), directed AS (
      SELECT doc_a, chunk_a, doc_b FROM cross_pairs
      UNION
      SELECT doc_b AS doc_a, chunk_b AS chunk_a, doc_a AS doc_b
      FROM cross_pairs
    ), matched AS (
      SELECT doc_a, doc_b, count(DISTINCT chunk_a) AS m
      FROM directed GROUP BY 1, 2
    ), nchunks AS (
      SELECT doc_id,
             CAST(greatest(CAST(floor(CAST(n - 1 - 8 AS DOUBLE) / 16)
                                AS INT), 0) + 1 AS BIGINT) AS nc
      FROM cbase
    )
    SELECT m.doc_a, m.doc_b, m.m AS matched_chunks, c.nc AS total_chunks,
           CAST(floor(CAST(m.m AS DOUBLE) / c.nc * 1000000.0
                      + CAST(0.5 AS DOUBLE)) AS BIGINT)
             / 1000000.0 AS containment
    FROM matched m JOIN nchunks c ON c.doc_id = m.doc_a
""")


@register("doc_containment_scores", oracle=_CONTAINMENT_ORACLE)
def doc_containment_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric doc-overlap: fraction of A's chunks LSH-matching any
    chunk of B, per ordered (doc_a, doc_b)."""
    from .operators.dedup import lsh_candidate_pairs, minhash_signatures
    from .operators.packing import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    ch = chunk_documents(docs, max_tokens=24, overlap=8)
    cids = ch.select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("cid"),
        "chunk_text",
    )
    sig = minhash_signatures(cids, id_col="cid", text_col="chunk_text",
                             num_hashes=8, shingle_k=3)
    pairs = lsh_candidate_pairs(sig, id_col="cid", num_hashes=8, bands=4)
    cross = pairs.where(
        F.expr("id_a div 1000") != F.expr("id_b div 1000")).select(
        F.expr("id_a div 1000").alias("doc_a"),
        (F.col("id_a") % 1000).alias("chunk_a"),
        F.expr("id_b div 1000").alias("doc_b"),
        (F.col("id_b") % 1000).alias("chunk_b"),
    )
    directed = cross.select("doc_a", "chunk_a", "doc_b").unionByName(
        cross.select(F.col("doc_b").alias("doc_a"),
                     F.col("chunk_b").alias("chunk_a"),
                     F.col("doc_a").alias("doc_b"))).distinct()
    matched = directed.groupBy("doc_a", "doc_b").agg(
        F.countDistinct("chunk_a").alias("matched_chunks"))
    nchunks = ch.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("total_chunks"))
    out = matched.join(
        nchunks.select(F.col("doc_id").alias("doc_a"), "total_chunks"),
        "doc_a")
    cont = (F.floor(
        F.col("matched_chunks").cast("double") / F.col("total_chunks")
        * 1e6 + F.lit(0.5)) / 1e6)
    return out.select("doc_a", "doc_b", "matched_chunks", "total_chunks",
                      cont.alias("containment"))


# ---------------------------------------------------------------------------
# ANN metric parity (operators/similarity.knn_topk): exact top-k under
# inner product (MIPS) and squared-L2 next to the existing cosine —
# the three FAISS metric families.
# ---------------------------------------------------------------------------

_IP_TOPK_ORACLE = f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id % 40 = 7
    ), c AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings
    ), s AS (
      SELECT query_id, neighbor_id,
             list_dot_product(qv, cv) AS score
      FROM q, c WHERE query_id <> neighbor_id
    ), r AS (
      SELECT *, row_number() OVER (
               PARTITION BY query_id
               ORDER BY floor(score * 1000000000.0 + CAST(0.5 AS DOUBLE))
                          DESC,
                        neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, {R('score', 6)} AS score, rank
    FROM r WHERE rank <= 5
"""


@register("embedding_ip_topk", oracle=_IP_TOPK_ORACLE)
def embedding_ip_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import knn_topk

    emb = _t(spark, sf_dir, "embeddings")
    out = knn_topk(emb, emb.where(F.col("vec_id") % 40 == 7),
                   metric="ip", k=5)
    return _round(out, {"score": 6})


_L2_TOPK_ORACLE = f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id % 40 = 13
    ), c AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings
    ), s AS (
      SELECT query_id, neighbor_id,
             list_dot_product(qv, qv) - 2 * list_dot_product(qv, cv)
               + list_dot_product(cv, cv) AS score
      FROM q, c WHERE query_id <> neighbor_id
    ), r AS (
      SELECT *, row_number() OVER (
               PARTITION BY query_id
               ORDER BY floor(score * 1000000000.0 + CAST(0.5 AS DOUBLE))
                          ASC,
                        neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, {R('score', 6)} AS score, rank
    FROM r WHERE rank <= 5
"""


@register("embedding_l2_topk", oracle=_L2_TOPK_ORACLE)
def embedding_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import knn_topk

    emb = _t(spark, sf_dir, "embeddings")
    out = knn_topk(emb, emb.where(F.col("vec_id") % 40 == 13),
                   metric="l2", k=5)
    return _round(out, {"score": 6})


# ---------------------------------------------------------------------------
# Deleted-interpolation trigram LM surprisal (operators/dedup.
# trigram_surprisal): p(w|u,v) = 0.6*c(uvw)/c(uv) + 0.3*c(vw)/c(v)
# + 0.1*c(w)/N; micro-nat quantization; NULL mean under 3 tokens.
# ---------------------------------------------------------------------------

_TRIGRAM_SURPRISAL_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks,
             len(string_split(lower(text), ' ')) AS n
      FROM documents
    ), tok AS (
      SELECT unnest(toks) AS w FROM base
    ), uni AS (
      SELECT w, count(*) AS cw FROM tok GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(cw) AS DOUBLE) AS total FROM uni
    ), bg AS (
      SELECT toks[i] AS u, toks[i + 1] AS v
      FROM base, unnest(generate_series(1, n - 1)) AS t(i)
    ), bgc AS (
      SELECT u, v, count(*) AS cb FROM bg GROUP BY 1, 2
    ), tri AS (
      SELECT doc_id, toks[i] AS u, toks[i + 1] AS v, toks[i + 2] AS w
      FROM base, unnest(generate_series(1, n - 2)) AS t(i)
    ), tric AS (
      SELECT u, v, w, count(*) AS ct FROM tri GROUP BY 1, 2, 3
    ), score AS (
      SELECT t.u, t.v, t.w,
             CAST(floor(
               -ln(CAST(0.6 AS DOUBLE) * t.ct / buv.cb
                   + CAST(0.3 AS DOUBLE) * bvw.cb / uv2.cw
                   + (CAST(1.0 AS DOUBLE) - CAST(0.6 AS DOUBLE)
                      - CAST(0.3 AS DOUBLE)) * uw.cw / tot.total)
               * 1000000.0 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
      FROM tric t
      JOIN bgc buv ON buv.u = t.u AND buv.v = t.v
      JOIN bgc bvw ON bvw.u = t.v AND bvw.v = t.w
      JOIN uni uv2 ON uv2.w = t.v
      JOIN uni uw ON uw.w = t.w
      CROSS JOIN tot
    ), per_doc AS (
      SELECT tri.doc_id,
             CAST(count(*) AS BIGINT) AS n_trigrams,
             {R('sum(q) / 1000000.0 / count(*)', 6)} AS mean_surprisal
      FROM tri JOIN score
        ON score.u = tri.u AND score.v = tri.v AND score.w = tri.w
      GROUP BY 1
    )
    SELECT b.doc_id,
           coalesce(d.n_trigrams, 0) AS n_trigrams,
           d.mean_surprisal
    FROM base b LEFT JOIN per_doc d ON d.doc_id = b.doc_id
"""


@register("trigram_surprisal", oracle=_TRIGRAM_SURPRISAL_ORACLE)
def trigram_surprisal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deleted-interpolation trigram LM surprisal over the corpus."""
    from .operators.dedup import trigram_surprisal

    docs = _t(spark, sf_dir, "documents")
    out = trigram_surprisal(docs, l3=0.6, l2=0.3)
    return _round(out, {"mean_surprisal": 6})


# ---------------------------------------------------------------------------
# Unicode punctuation folding (functions/text.fold_text): curly
# quotes / dashes / ellipsis / NBSP / zero-width folding + whitespace
# collapse, with the exact-dedup consequence measured (smart-quote
# re-renderings collapse to one fingerprint).
# ---------------------------------------------------------------------------

def _fold_sql(expr: str) -> str:
    from .functions.text import FOLD_MAP

    out = expr
    for src_ch, dst in FOLD_MAP:
        d = dst.replace("'", "''")
        out = f"replace({out}, chr({ord(src_ch)}), '{d}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


_FOLD_ORACLE = f"""
    WITH noisy AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN chr(8220) || text || chr(8221) || chr(8230)
               WHEN 1 THEN replace(text, ' ', chr(160))
               WHEN 2 THEN chr(8203) || replace(text, ' ',
                           ' ' || chr(8212) || ' ')
               ELSE text END AS t
      FROM documents
    )
    SELECT doc_id, {_fold_sql('t')} AS folded,
           md5(regexp_replace(lower({_fold_sql('t')}), '\\s+', ' ', 'g'))
             AS fingerprint
    FROM noisy
"""


@register("unicode_fold_normalize", oracle=_FOLD_ORACLE)
def unicode_fold_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typographic-Unicode folding over a noisy re-rendering of the
    corpus (curly quotes + ellipsis, NBSP spacing, zero-width + em-dash
    injection), with the post-fold fingerprint."""
    from .functions.text import fingerprint, fold_text

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    t = (
        F.when(d % 4 == 0, F.concat(F.lit("“"), F.col("text"),
                                    F.lit("”"), F.lit("…")))
        .when(d % 4 == 1, F.replace(F.col("text"), F.lit(" "),
                                    F.lit(" ")))
        .when(d % 4 == 2, F.concat(F.lit("​"),
                                   F.replace(F.col("text"), F.lit(" "),
                                             F.lit(" — "))))
        .otherwise(F.col("text"))
    )
    folded = fold_text(t)
    return docs.select(
        "doc_id", folded.alias("folded"),
        fingerprint(folded).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# Audio spectral features (operators/multimodal.audio_spectral_
# features): whole-clip bin energies via the shared fixed-point
# integer DFT basis -> spectral centroid + 85% rolloff bin + total
# energy, all exact-integer until the final division.
# ---------------------------------------------------------------------------

def _audio_specfeat_oracle() -> str:
    from .operators.multimodal import _spec_basis

    bc, bs = _spec_basis()
    lc = ",".join(str(v) for row in bc for v in row)
    ls = ",".join(str(v) for row in bs for v in row)
    return f"""
    WITH ids AS (
      SELECT doc_id AS media_id, doc_id % 8 AS g, 1 + doc_id % 3 AS fac
      FROM documents WHERE doc_id % 4 = 0
    ), t AS (
      SELECT unnest(range(0, 4096)) AS k
    ), s AS (
      SELECT media_id, k // 256 AS f, (k % 256) // 4 AS j,
             fac * (((g * 37 + k * 101) % 4001) - 2000) AS v
      FROM ids, t
    ), ch AS (
      SELECT media_id, f, j, sum(v) AS cs FROM s GROUP BY 1, 2, 3
    ), bas AS (
      SELECT [{lc}] AS bc, [{ls}] AS bs
    ), bins AS (
      SELECT unnest(range(1, 17)) AS n
    ), sp AS (
      SELECT media_id, f, n,
             sum(cs * bc[(n - 1) * 64 + j + 1]) AS cr,
             sum(cs * bs[(n - 1) * 64 + j + 1]) AS ci
      FROM ch, bins, bas
      GROUP BY media_id, f, n
    ), eb AS (
      SELECT media_id, n, sum(cr * cr + ci * ci) AS e
      FROM sp GROUP BY 1, 2
    ), tot AS (
      SELECT media_id, sum(e) AS total FROM eb GROUP BY 1
    ), cum AS (
      SELECT media_id, n,
             sum(e) OVER (PARTITION BY media_id ORDER BY n) AS c
      FROM eb
    ), rol AS (
      SELECT cum.media_id, CAST(min(n) AS BIGINT) AS rolloff_bin
      FROM cum JOIN tot ON tot.media_id = cum.media_id
      WHERE 20 * c >= 17 * total GROUP BY 1
    )
    SELECT eb.media_id,
           {R('sum(eb.n * eb.e) / CAST(t.total AS DOUBLE)', 6)}
             AS spectral_centroid,
           r.rolloff_bin,
           CAST(t.total AS BIGINT) AS total_energy
    FROM eb
    JOIN tot t ON t.media_id = eb.media_id
    JOIN rol r ON r.media_id = eb.media_id
    GROUP BY eb.media_id, t.total, r.rolloff_bin
"""


_AUDIO_SPECFEAT_ORACLE = _audio_specfeat_oracle()


@register("audio_spectral_features", oracle=_AUDIO_SPECFEAT_ORACLE)
def audio_spectral_features_q(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Spectral centroid / rolloff / energy over decoded WAV clips."""
    from .operators.multimodal import (extract_audio_spectral_features,
                                       synthesize_tone_wavs)

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 4 == 0).select(
        F.col("doc_id").alias("media_id"))
    out = extract_audio_spectral_features(synthesize_tone_wavs(ids))
    return _round(out, {"spectral_centroid": 6})


# ---------------------------------------------------------------------------
# Image sharpness (operators/multimodal.image_sharpness): 4-neighbor
# integer Laplacian variance over interior pixels — the blur signal.
# Exact-integer sums; the oracle replays pixels -> Laplacian -> sums.
# ---------------------------------------------------------------------------

_SHARPNESS_ORACLE = f"""
    WITH ids AS (
      SELECT doc_id AS media_id, doc_id % 16 AS p
      FROM documents WHERE doc_id % 4 = 2
    ), grid AS (
      SELECT unnest(range(0, 32)) AS t
    ), px AS (
      SELECT i.media_id, yy.t AS y, xx.t AS x,
             least(CAST(255 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
               floor(128.0
                 + (40 + i.media_id % 3)
                   * cos((2*xx.t+1) * (i.p % 7 + 1) * pi() / 64.0)
                   * cos((2*yy.t+1) * (i.p % 5 + 1) * pi() / 64.0)
                 + 25 * cos((2*xx.t+1) * (i.p % 6 + 1) * pi() / 64.0)
                      * cos((2*yy.t+1) * (i.p % 4 + 2) * pi() / 64.0)
                 + 15 * cos((2*xx.t+1) * (i.p % 5 + 2) * pi() / 64.0)
                      * cos((2*yy.t+1) * (i.p % 3 + 3) * pi() / 64.0)
                 + 0.5))) AS v
      FROM ids i, grid xx, grid yy
    ), lap AS (
      SELECT c.media_id,
             4*c.v - u.v - d.v - l.v - r.v AS lv
      FROM px c
      JOIN px u ON u.media_id = c.media_id AND u.y = c.y - 1
               AND u.x = c.x
      JOIN px d ON d.media_id = c.media_id AND d.y = c.y + 1
               AND d.x = c.x
      JOIN px l ON l.media_id = c.media_id AND l.y = c.y
               AND l.x = c.x - 1
      JOIN px r ON r.media_id = c.media_id AND r.y = c.y
               AND r.x = c.x + 1
      WHERE c.y BETWEEN 1 AND 30 AND c.x BETWEEN 1 AND 30
    ), agg AS (
      SELECT media_id, count(*) AS n, sum(lv) AS s, sum(lv*lv) AS q
      FROM lap GROUP BY 1
    )
    SELECT media_id,
           CAST(n AS BIGINT) AS n_interior,
           CAST(s AS BIGINT) AS lap_sum,
           {R('(q * n - s * s) / (CAST(n AS DOUBLE) * n)', 6)} AS lap_var
    FROM agg
"""


@register("image_sharpness_metrics", oracle=_SHARPNESS_ORACLE)
def image_sharpness_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplacian-variance sharpness over decoded pattern BMPs."""
    from .operators.multimodal import (extract_image_sharpness,
                                       synthesize_pattern_bmps)

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 4 == 2).select(
        F.col("doc_id").alias("media_id"))
    out = extract_image_sharpness(synthesize_pattern_bmps(ids))
    return _round(out, {"lap_var": 6})


# ---------------------------------------------------------------------------
# Video scene-cut detection (operators/multimodal.scene_cuts): exact
# integer luma-sum deltas between adjacent decoded frames; a cut when
# the per-pixel mean jumps > tau grey levels. Shot islands via the
# cumulative-cut window. tau=16: the fixture's steady +11/frame drift
# stays within a shot; mod-200 block wraps exceed it.
# ---------------------------------------------------------------------------

_SCENE_CUT_ORACLE = """
    WITH ids AS (
      SELECT doc_id AS media_id, doc_id % 8 AS g,
             (doc_id % 3) * 4 AS off
      FROM documents WHERE doc_id % 9 = 1
    ), fr AS (
      SELECT unnest(range(0, 16)) AS f
    ), bl AS (
      SELECT unnest(range(0, 4)) AS b
    ), luma AS (
      SELECT media_id, f,
             sum(CAST(64 AS BIGINT)
                 * ((g * 7 + f * 11 + b * 37) % 200 + 28 + off)) AS s
      FROM ids, fr, bl GROUP BY 1, 2
    ), marked AS (
      SELECT media_id, f,
             CASE WHEN f = 0 THEN 0
                  WHEN abs(s - lag(s) OVER w) > 16 * 256 THEN 1
                  ELSE 0 END AS cut_before
      FROM luma WINDOW w AS (PARTITION BY media_id ORDER BY f)
    ), shots AS (
      SELECT media_id, f,
             sum(cut_before) OVER (PARTITION BY media_id ORDER BY f)
               AS shot_id
      FROM marked
    ), per_shot AS (
      SELECT media_id, shot_id, count(*) AS len FROM shots GROUP BY 1, 2
    )
    SELECT m.media_id,
           CAST(16 AS BIGINT) AS n_frames,
           CAST(sum(m.cut_before) AS BIGINT) AS n_cuts,
           CAST(sum(m.cut_before) + 1 AS BIGINT) AS shot_count,
           CAST(p.longest AS BIGINT) AS longest_shot
    FROM marked m
    JOIN (SELECT media_id, max(len) AS longest FROM per_shot GROUP BY 1) p
      ON p.media_id = m.media_id
    GROUP BY m.media_id, p.longest
"""


@register("video_scene_cuts", oracle=_SCENE_CUT_ORACLE)
def video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut / shot statistics over decoded MJPEG-AVI clips."""
    from .operators.multimodal import (extract_video_scene_cuts,
                                       synthesize_group_avis)

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 9 == 1).select(
        F.col("doc_id").alias("media_id"))
    return extract_video_scene_cuts(synthesize_group_avis(ids), tau=16)


# ---------------------------------------------------------------------------
# Shot-level video containment: per-shot brightness-offset-invariant
# delta signatures -> fraction of clip A's shots appearing in clip B
# (the video analog of doc_containment_scores — re-graded partial
# copies that clip-level fingerprints dilute away).
# ---------------------------------------------------------------------------

_SHOT_CONTAIN_ORACLE = """
    WITH ids AS (
      SELECT doc_id AS media_id, doc_id % 8 AS g,
             (doc_id % 3) * 4 AS off
      FROM documents WHERE doc_id % 24 = 2
    ), fr AS (
      SELECT unnest(range(0, 16)) AS f
    ), bl AS (
      SELECT unnest(range(0, 4)) AS b
    ), luma AS (
      SELECT media_id, f,
             sum(CAST(64 AS BIGINT)
                 * ((g * 7 + f * 11 + b * 37) % 200 + 28 + off)) AS s
      FROM ids, fr, bl GROUP BY 1, 2
    ), marked AS (
      SELECT media_id, f, s,
             s - lag(s) OVER w AS d,
             CASE WHEN f = 0 THEN 0
                  WHEN abs(s - lag(s) OVER w) > 16 * 256 THEN 1
                  ELSE 0 END AS cut_before
      FROM luma WINDOW w AS (PARTITION BY media_id ORDER BY f)
    ), shots AS (
      SELECT media_id, f, d, cut_before,
             sum(cut_before) OVER (PARTITION BY media_id ORDER BY f)
               AS shot_id
      FROM marked
    ), sigs AS (
      -- within-shot deltas exclude each shot's first frame (f=0 or a
      -- cut frame)
      SELECT media_id, shot_id,
             md5(coalesce(string_agg(CAST(d AS VARCHAR), ',' ORDER BY f)
                 FILTER (WHERE f > 0 AND cut_before = 0), '')) AS sig
      FROM shots GROUP BY 1, 2
    ), nshots AS (
      SELECT media_id, count(*) AS total_shots FROM sigs GROUP BY 1
    ), matched AS (
      SELECT a.media_id AS media_a, b.media_id AS media_b,
             count(DISTINCT a.shot_id) AS matched_shots
      FROM sigs a JOIN sigs b
        ON a.sig = b.sig AND a.media_id <> b.media_id
      GROUP BY 1, 2
    )
    SELECT m.media_a, m.media_b,
           CAST(m.matched_shots AS BIGINT) AS matched_shots,
           CAST(n.total_shots AS BIGINT) AS total_shots,
           CAST(floor(CAST(m.matched_shots AS DOUBLE) / n.total_shots
                      * 1000000.0 + CAST(0.5 AS DOUBLE)) AS BIGINT)
             / 1000000.0 AS containment
    FROM matched m JOIN nshots n ON n.media_id = m.media_a
"""


@register("video_shot_containment", oracle=_SHOT_CONTAIN_ORACLE)
def video_shot_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shot-overlap between clips via offset-invariant shot
    delta signatures (uncapped all-pairs regime — the group fixture
    has no boilerplate signature; the web-scale df-capped path is
    video_shot_containment_capped)."""
    from .operators.multimodal import (extract_video_shot_signatures,
                                       shot_containment_pairs,
                                       synthesize_group_avis)

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 24 == 2).select(
        F.col("doc_id").alias("media_id"))
    sigs = extract_video_shot_signatures(
        synthesize_group_avis(ids), tau=16)
    return shot_containment_pairs(sigs, max_sig_clips=None)


# Capped variant: the intro fixture gives EVERY clip a shared
# boilerplate intro shot (the m² hot-signature class); the df cap
# drops it from the join while group shots (runs of 4 twins) still
# match, and total_shots keeps counting the intro. Closed-form luma
# trace: frames 0-7 block value 40 + f*9 + b*20 + off; frames 8-15
# value 170 + prefix-sum of (3 + 2*bit_{j-1}(g)) + b*2 + off with
# g = ((doc_id-2)/24)//4 — no modular wraps, one cut at f=8.
_SHOT_CONTAIN_CAPPED_ORACLE = """
    WITH ids AS (
      SELECT doc_id AS media_id,
             ((doc_id - 2) // 24) // 4 AS g
      FROM documents
      WHERE doc_id % 24 = 2 AND (doc_id - 2) // 24 < 60
    ), fr AS (
      SELECT unnest(range(0, 16)) AS f
    ), pre AS (
      SELECT media_id, g, f,
             CASE WHEN f < 8 THEN 0 ELSE (
               SELECT coalesce(sum(3 + 2 * ((g // power(2, j - 1)::BIGINT)
                                            % 2)), 0)
               FROM unnest(generate_series(1, f - 8)) AS t(j))
             END AS p
      FROM ids, fr
    ), luma AS (
      -- per-frame luma sum over the four 8x8 blocks; the (i%3)*4
      -- regrade offset cancels in deltas, so it is omitted here and
      -- the absolute sums below are offset-free ONLY in the deltas
      -- the sigs consume
      SELECT media_id, f,
             CASE WHEN f < 8
                  THEN 64 * (4 * (40 + f * 9 + (media_id % 3) * 4)
                             + 20 * 6)
                  ELSE 64 * (4 * (170 + p + (media_id % 3) * 4) + 2 * 6)
             END AS s
      FROM pre
    ), marked AS (
      SELECT media_id, f, s,
             s - lag(s) OVER w AS d,
             CASE WHEN f = 0 THEN 0
                  WHEN abs(s - lag(s) OVER w) > 16 * 256 THEN 1
                  ELSE 0 END AS cut_before
      FROM luma WINDOW w AS (PARTITION BY media_id ORDER BY f)
    ), shots AS (
      SELECT media_id, f, d, cut_before,
             sum(cut_before) OVER (PARTITION BY media_id ORDER BY f)
               AS shot_id
      FROM marked
    ), sigs AS (
      SELECT media_id, shot_id,
             md5(coalesce(string_agg(CAST(d AS VARCHAR), ',' ORDER BY f)
                 FILTER (WHERE f > 0 AND cut_before = 0), '')) AS sig
      FROM shots GROUP BY 1, 2
    ), nshots AS (
      SELECT media_id, count(*) AS total_shots FROM sigs GROUP BY 1
    ), hot AS (
      SELECT sig FROM (SELECT sig, media_id FROM sigs GROUP BY 1, 2)
      GROUP BY sig HAVING count(*) > 10
    ), joinable AS (
      SELECT * FROM sigs WHERE sig NOT IN (SELECT sig FROM hot)
    ), matched AS (
      SELECT a.media_id AS media_a, b.media_id AS media_b,
             count(DISTINCT a.shot_id) AS matched_shots
      FROM joinable a JOIN joinable b
        ON a.sig = b.sig AND a.media_id <> b.media_id
      GROUP BY 1, 2
    )
    SELECT m.media_a, m.media_b,
           CAST(m.matched_shots AS BIGINT) AS matched_shots,
           CAST(n.total_shots AS BIGINT) AS total_shots,
           CAST(floor(CAST(m.matched_shots AS DOUBLE) / n.total_shots
                      * 1000000.0 + CAST(0.5 AS DOUBLE)) AS BIGINT)
             / 1000000.0 AS containment
    FROM matched m JOIN nshots n ON n.media_id = m.media_a
"""


# Sign-of-delta (quantized) signature regime on the jittered fixture:
# twins of opposite t-parity differ in every delta magnitude (the
# lossy re-encode stand-in) but never in delta sign, so sign sigs
# match all four group twins while exact sigs would split them 2/2.
# The boilerplate intro ('+++++++' for every clip) is the hot sig the
# cap drops.
_SHOT_CONTAIN_SIGN_ORACLE = """
    WITH ids AS (
      SELECT doc_id AS media_id,
             (doc_id - 2) // 24 AS t,
             ((doc_id - 2) // 24) // 4 AS g
      FROM documents
      WHERE doc_id % 24 = 2 AND (doc_id - 2) // 24 < 60
    ), fr AS (
      SELECT unnest(range(0, 16)) AS f
    ), pre AS (
      SELECT media_id, t, g, f,
             CASE WHEN f < 8 THEN 0 ELSE (
               SELECT coalesce(sum(CASE WHEN
                   (g // power(2, j - 1)::BIGINT) % 2 = 1
                   THEN 4 ELSE -4 END), 0)
               FROM unnest(generate_series(1, f - 8)) AS q(j))
             END AS p
      FROM ids, fr
    ), luma AS (
      SELECT media_id, f,
             CASE WHEN f < 8
                  THEN 64 * (4 * (40 + f * 9 + (media_id % 3) * 4)
                             + 20 * 6)
                  ELSE 64 * (4 * (190 + p + (media_id % 3) * 4
                                  + (t + f) % 2) + 2 * 6)
             END AS s
      FROM pre
    ), marked AS (
      SELECT media_id, f, s,
             s - lag(s) OVER w AS d,
             CASE WHEN f = 0 THEN 0
                  WHEN abs(s - lag(s) OVER w) > 16 * 256 THEN 1
                  ELSE 0 END AS cut_before
      FROM luma WINDOW w AS (PARTITION BY media_id ORDER BY f)
    ), shots AS (
      SELECT media_id, f, d, cut_before,
             sum(cut_before) OVER (PARTITION BY media_id ORDER BY f)
               AS shot_id
      FROM marked
    ), sigs AS (
      SELECT media_id, shot_id,
             md5(coalesce(string_agg(
                 CASE WHEN d > 0 THEN '+' WHEN d < 0 THEN '-'
                      ELSE '0' END, '' ORDER BY f)
                 FILTER (WHERE f > 0 AND cut_before = 0), '')) AS sig
      FROM shots GROUP BY 1, 2
    ), nshots AS (
      SELECT media_id, count(*) AS total_shots FROM sigs GROUP BY 1
    ), hot AS (
      SELECT sig FROM (SELECT sig, media_id FROM sigs GROUP BY 1, 2)
      GROUP BY sig HAVING count(*) > 10
    ), joinable AS (
      SELECT * FROM sigs WHERE sig NOT IN (SELECT sig FROM hot)
    ), matched AS (
      SELECT a.media_id AS media_a, b.media_id AS media_b,
             count(DISTINCT a.shot_id) AS matched_shots
      FROM joinable a JOIN joinable b
        ON a.sig = b.sig AND a.media_id <> b.media_id
      GROUP BY 1, 2
    )
    SELECT m.media_a, m.media_b,
           CAST(m.matched_shots AS BIGINT) AS matched_shots,
           CAST(n.total_shots AS BIGINT) AS total_shots,
           CAST(floor(CAST(m.matched_shots AS DOUBLE) / n.total_shots
                      * 1000000.0 + CAST(0.5 AS DOUBLE)) AS BIGINT)
             / 1000000.0 AS containment
    FROM matched m JOIN nshots n ON n.media_id = m.media_a
"""


@register("video_shot_containment_sign",
          oracle=_SHOT_CONTAIN_SIGN_ORACLE)
def video_shot_containment_sign(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Shot containment under the SIGN-quantized signature regime: the
    jittered fixture's re-encode twins differ in delta magnitudes but
    match on delta signs, so the sign tier recovers all four group
    twins where the exact tier splits them by dither parity; the
    boilerplate intro still drops under the df cap."""
    from .operators.multimodal import (extract_video_shot_signatures,
                                       shot_containment_pairs,
                                       synthesize_intro_avis)

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(
        (F.col("doc_id") % 24 == 2)
        & F.expr("(doc_id - 2) div 24 < 60")
    ).select(F.col("doc_id").alias("media_id"))
    sigs = extract_video_shot_signatures(
        synthesize_intro_avis(ids, jitter=True), tau=16, mode="sign")
    return shot_containment_pairs(sigs, max_sig_clips=10)


@register("video_shot_containment_capped",
          oracle=_SHOT_CONTAIN_CAPPED_ORACLE)
def video_shot_containment_capped(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Shot containment under the hot-signature df cap: every clip
    shares a boilerplate intro shot (> cap clips -> dropped before the
    equi-join), group shots still match, and total_shots keeps the
    full count so containment never inflates."""
    from .operators.multimodal import (extract_video_shot_signatures,
                                       shot_containment_pairs,
                                       synthesize_intro_avis)

    docs = _t(spark, sf_dir, "documents")
    # first 60 clips only: the cap/containment SEMANTICS are what this
    # variant verifies; codec throughput at full fixture scale is
    # already priced by video_shot_containment
    ids = docs.where(
        (F.col("doc_id") % 24 == 2)
        & F.expr("(doc_id - 2) div 24 < 60")
    ).select(F.col("doc_id").alias("media_id"))
    sigs = extract_video_shot_signatures(
        synthesize_intro_avis(ids), tau=16)
    return shot_containment_pairs(sigs, max_sig_clips=10)


# ---------------------------------------------------------------------------
# Corpus datacard (the dataset-documentation rollup): per source —
# doc/token counts (whitespace + BPE-ish), within-source exact-dup
# doc count, mean heuristic quality (per-doc micro-quantized then
# exact-summed), and English share via the EXACT integer form of the
# stopword threshold (20*hits >= n_tokens == ratio >= 0.05).
# ---------------------------------------------------------------------------

_DATACARD_ORACLE = f"""
    WITH base AS (
      SELECT doc_id,
             'src-' || CAST(doc_id % 5 AS VARCHAR) AS source,
             len(string_split(text, ' ')) AS ws_tokens,
             len(regexp_extract_all(text,
                 ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS bpe_tokens,
             md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp,
             CAST(floor(((least(length(text) / 200.0, 1.0)
               + least(CAST(len(list_filter(string_split(lower(text), ' '),
                   t -> t IN ('the','a','an','and','or','of','to','in','is',
                              'it','that','for','on','with','as','are','was',
                              'at','by','be'))) AS DOUBLE)
                 / greatest(len(string_split(lower(text), ' ')), 1)
                 * 5.0, 1.0)
               + (1.0 - least((length(text) - length(regexp_replace(
                   text, '[^a-zA-Z0-9 ]', '', 'g')))
                 / greatest(length(text), 1) * 4.0, 1.0))) / 3.0)
               * 1000000 + 0.5) AS BIGINT) AS ql,
             (20 * len(list_filter(string_split(lower(text), ' '),
                   t -> t IN ('the','a','an','and','or','of','to','in','is',
                              'it','that','for','on','with','as','are','was',
                              'at','by','be')))
              >= greatest(len(string_split(lower(text), ' ')), 1)) AS en
      FROM documents
    ), dup AS (
      SELECT source, fp, count(*) AS m FROM base GROUP BY 1, 2
    ), dupdocs AS (
      SELECT source, CAST(sum(CASE WHEN m > 1 THEN m ELSE 0 END)
                          AS BIGINT) AS n_dup_docs
      FROM dup GROUP BY 1
    )
    SELECT b.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(b.ws_tokens) AS BIGINT) AS total_ws_tokens,
           CAST(sum(b.bpe_tokens) AS BIGINT) AS total_bpe_tokens,
           d.n_dup_docs,
           {R('sum(b.ql) / 1000000.0 / count(*)', 6)} AS mean_quality,
           {R('CAST(sum(CASE WHEN b.en THEN 1 ELSE 0 END) AS DOUBLE)'
              ' / count(*)', 6)} AS en_share
    FROM base b JOIN dupdocs d ON d.source = b.source
    GROUP BY b.source, d.n_dup_docs
"""


@register("corpus_datacard", oracle=_DATACARD_ORACLE)
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset-documentation rollup."""
    from pyspark.sql import Window as W

    from .functions.text import (EN_STOPWORDS, bpe_token_count,
                                 fingerprint, quality_score, tokens)

    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    toks = tokens(F.lower(t))
    hits = F.size(F.filter(
        toks, lambda x: F.array_contains(
            F.array(*[F.lit(w) for w in EN_STOPWORDS]), x)))
    base = docs.select(
        F.concat(F.lit("src-"), (F.col("doc_id") % 5).cast("string"))
        .alias("source"),
        F.size(tokens(t)).cast("long").alias("ws_tokens"),
        bpe_token_count(t).cast("long").alias("bpe_tokens"),
        fingerprint(t).alias("fp"),
        F.floor(quality_score(t) * 1e6 + F.lit(0.5)).cast("long")
        .alias("ql"),
        (20 * hits >= F.greatest(F.size(toks), F.lit(1))).alias("en"),
    )
    base = base.withColumn(
        "__m", F.count(F.lit(1)).over(W.partitionBy("source", "fp")))
    out = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ws_tokens").alias("total_ws_tokens"),
        F.sum("bpe_tokens").alias("total_bpe_tokens"),
        F.sum(F.when(F.col("__m") > 1, 1).otherwise(0)).cast("long")
        .alias("n_dup_docs"),
        (F.sum("ql") / 1e6 / F.count(F.lit(1))).alias("mean_quality"),
        (F.sum(F.col("en").cast("int")).cast("double")
         / F.count(F.lit(1))).alias("en_share"),
    )
    return _round(out, {"mean_quality": 6, "en_share": 6})


# ---------------------------------------------------------------------------
# Bilingual denormalized metadata views (operators/metadata.py) — the
# reference's main human/catalog read surface:
# public.location_metadata_en/fr (patch_45.R:381-472) and
# continuous.timeseries_metadata_en/fr (patch_45.R:489-572), with units
# resolved through get_parameter_unit_name (patch_39.R:846, consumed at
# patch_51.R:2961). Catalog tables are synthesized identically in both
# engines from supplier/nation/region/part; m:n rollups are
# pre-aggregated per location and the view itself is a pure broadcast
# star join (the 100 TB story: catalogs are catalog-class, the view
# never touches measurement-cardinality data).
# ---------------------------------------------------------------------------

def _meta_fixture(spark: SparkSession, sf_dir: str) -> dict:
    """Synthetic reference catalog: locations/dims/bridges from the
    TPC-H tables (mirrored exactly by _META_CTES below)."""
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    part = _t(spark, sf_dir, "part")
    s = F.col("s_suppkey")
    n = F.col("n_nationkey")
    r = F.col("r_regionkey")
    p = F.col("p_partkey")

    locations = supp.select(
        s.alias("location_id"),
        F.col("s_name").alias("name"),
        F.concat(F.lit("fr "), F.col("s_name")).alias("name_fr"),
        F.when(s % 3 == 0,
               F.concat(F.lit("alias-"), s.cast("string"))).alias("alias"),
        F.concat(F.lit("LOC-"), s.cast("string")).alias("location_code"),
        (s % 5).alias("location_type"),
        (F.lit(50.0) + (s % 200).cast("double") / 4.0).alias("latitude"),
        (F.lit(-140.0) + (s % 500).cast("double") / 8.0).alias("longitude"),
        F.when(s % 4 == 0,
               F.concat(F.lit("note "), s.cast("string"))).alias("note"),
        F.col("s_nationkey").cast("long").alias("__natkey"),
    )
    location_types = reg.select(
        r.alias("type_id"),
        F.concat(F.lit("type "), F.col("r_name")).alias("type"),
        F.concat(F.lit("typefr "), F.col("r_name")).alias("type_fr"))
    projects = nat.select(
        n.cast("long").alias("project_id"),
        F.concat(F.lit("proj "), F.col("n_name")).alias("name"),
        F.concat(F.lit("projfr "), F.col("n_name")).alias("name_fr"))
    lp1 = locations.where(F.col("location_id") % 7 != 3).select(
        "location_id", F.col("__natkey").alias("project_id"))
    lp2 = locations.where((F.col("location_id") % 7 != 3)
                          & (F.col("location_id") % 2 == 0)).select(
        "location_id", ((F.col("__natkey") + 7) % 25).alias("project_id"))
    locations_projects = lp1.unionByName(lp2)
    networks = reg.select(
        r.cast("long").alias("network_id"),
        F.concat(F.lit("net "), F.col("r_name")).alias("name"),
        F.concat(F.lit("netfr "), F.col("r_name")).alias("name_fr"))
    ln1 = locations.where(F.col("location_id") % 6 != 1).select(
        "location_id", (F.col("location_id") % 5).alias("network_id"))
    ln2 = locations.where(F.col("location_id") % 3 == 0).select(
        "location_id",
        ((F.col("location_id") * 3 + 1) % 5).alias("network_id"))
    locations_networks = ln1.unionByName(ln2)
    # one current + one superseded conversion per covered location —
    # the view must keep only current=true
    dc_cur = locations.where(F.col("location_id") % 3 != 1).select(
        "location_id",
        (F.col("location_id") % 4).alias("datum_id_to"),
        ((F.col("location_id") % 97).cast("double") + 0.5)
        .alias("conversion_m"),
        F.lit(True).alias("current"))
    dc_old = locations.where(F.col("location_id") % 3 != 1).select(
        "location_id",
        ((F.col("location_id") + 1) % 4).alias("datum_id_to"),
        ((F.col("location_id") % 97).cast("double") + 100.5)
        .alias("conversion_m"),
        F.lit(False).alias("current"))
    datum_conversions = dc_cur.unionByName(dc_old)
    datum_list = reg.where(r < 4).select(
        r.cast("long").alias("datum_id"),
        F.concat(F.lit("datum "), F.col("r_name")).alias("datum_name_en"),
        F.concat(F.lit("datumfr "), F.col("r_name"))
        .alias("datum_name_fr"))
    languages = reg.where(r < 3).select(
        r.cast("long").alias("language_id"),
        F.concat(F.lit("lang "), F.col("r_name")).alias("language_name_en"),
        F.concat(F.lit("langfr "), F.col("r_name"))
        .alias("language_name_fr"))
    fn1 = locations.where(F.col("location_id") % 4 == 0).select(
        "location_id", (F.col("location_id") % 3).alias("language_id"),
        F.concat(F.lit("FN name "), F.col("location_id").cast("string"))
        .alias("name"))
    fn2 = locations.where(F.col("location_id") % 8 == 0).select(
        "location_id", ((F.col("location_id") + 1) % 3).alias("language_id"),
        F.concat(F.lit("FN alt "), F.col("location_id").cast("string"))
        .alias("name"))
    location_names = fn1.unionByName(fn2)

    parameters = nat.select(
        n.cast("long").alias("parameter_id"),
        F.concat(F.lit("param "), F.col("n_name")).alias("param_name"),
        F.concat(F.lit("paramfr "), F.col("n_name")).alias("param_name_fr"),
        F.when(n % 5 != 0, (n % 7).cast("long")).alias("units_liquid"),
        F.when(n % 4 != 0, ((n + 1) % 7).cast("long")).alias("units_solid"),
        F.when(n % 3 != 0, ((n + 2) % 7).cast("long")).alias("units_gas"))
    units = nat.where(n < 7).select(
        n.cast("long").alias("unit_id"),
        F.concat(F.lit("u-"), F.col("n_name")).alias("unit_name"))
    matrix_states = reg.where(r < 4).select(
        (r + 1).cast("long").alias("matrix_state_id"),
        F.when(r == 0, "liquid").when(r == 1, "solid")
        .when(r == 2, "gas").otherwise("plasma")
        .alias("matrix_state_code"))
    media_types = reg.where(r < 4).select(
        r.cast("long").alias("media_id"),
        F.concat(F.lit("media "), F.col("r_name")).alias("media_type"),
        F.concat(F.lit("mediafr "), F.col("r_name"))
        .alias("media_type_fr"))
    aggregation_types = reg.where(r < 3).select(
        r.cast("long").alias("aggregation_type_id"),
        F.concat(F.lit("agg "), F.col("r_name")).alias("aggregation_type"),
        F.concat(F.lit("aggfr "), F.col("r_name"))
        .alias("aggregation_type_fr"))
    locations_z = nat.where(n < 7).select(
        n.cast("long").alias("z_id"),
        (n.cast("double") * 1.5 - 3.0).alias("z_meters"))
    timeseries_types = reg.where(r < 2).select(
        (r + 1).cast("long").alias("timeseries_type"),
        F.concat(F.lit("tstype "), F.col("r_name"))
        .alias("timeseries_type_name"),
        F.concat(F.lit("tstypefr "), F.col("r_name"))
        .alias("timeseries_type_name_fr"),
        F.concat(F.lit("desc "), F.col("r_name")).alias("description"),
        F.concat(F.lit("descfr "), F.col("r_name")).alias("description_fr"))
    epoch = F.lit("2020-01-01").cast("date")
    timeseries = part.select(
        p.alias("timeseries_id"),
        (p % 10).alias("location_id"),
        (p % 25).alias("parameter_id"),
        (p % 4 + 1).alias("matrix_state_id"),
        (p % 4).alias("media_id"),
        (p % 3).alias("aggregation_type_id"),
        F.when(p % 5 == 0, p % 7).alias("z_id"),
        F.when(p % 3 == 0, "PT5M").when(p % 3 == 1, "PT1H")
        .otherwise("P1D").alias("record_rate"),
        (p % 3 + 1).alias("sensor_priority"),
        F.to_timestamp(F.date_add(epoch, (p % 1000).cast("int")))
        .alias("start_datetime"),
        F.to_timestamp(
            F.date_add(epoch, (p % 1000 + p % 300 + 10).cast("int")))
        .alias("end_datetime"),
        F.when(p % 6 == 0, F.concat(F.lit("ts note "), p.cast("string")))
        .alias("note"),
        (p % 2 + 1).alias("timeseries_type"),
        F.to_timestamp(
            F.date_add(epoch, (p % 1000 + p % 300 + 10).cast("int")))
        .alias("last_new_data"),
    )
    return {
        "locations": locations.drop("__natkey"),
        "location_types": location_types,
        "projects": projects, "locations_projects": locations_projects,
        "networks": networks, "locations_networks": locations_networks,
        "datum_conversions": datum_conversions, "datum_list": datum_list,
        "languages": languages, "location_names": location_names,
        "parameters": parameters, "units": units,
        "matrix_states": matrix_states, "media_types": media_types,
        "aggregation_types": aggregation_types,
        "locations_z": locations_z,
        "timeseries_types": timeseries_types, "timeseries": timeseries,
    }


_META_CTES = """
    locs AS (
      SELECT s_suppkey AS location_id,
             s_name AS name,
             'fr ' || s_name AS name_fr,
             CASE WHEN s_suppkey % 3 = 0
                  THEN 'alias-' || CAST(s_suppkey AS VARCHAR) END AS alias,
             'LOC-' || CAST(s_suppkey AS VARCHAR) AS location_code,
             s_suppkey % 5 AS location_type,
             CAST(50 AS DOUBLE)
               + CAST(s_suppkey % 200 AS DOUBLE) / CAST(4 AS DOUBLE)
               AS latitude,
             CAST(-140 AS DOUBLE)
               + CAST(s_suppkey % 500 AS DOUBLE) / CAST(8 AS DOUBLE)
               AS longitude,
             CASE WHEN s_suppkey % 4 = 0
                  THEN 'note ' || CAST(s_suppkey AS VARCHAR) END AS note,
             CAST(s_nationkey AS BIGINT) AS natkey
      FROM supplier
    ), ltypes AS (
      SELECT r_regionkey AS type_id, 'type ' || r_name AS type,
             'typefr ' || r_name AS type_fr FROM region
    ), projs AS (
      SELECT CAST(n_nationkey AS BIGINT) AS project_id,
             'proj ' || n_name AS pname, 'projfr ' || n_name AS pname_fr
      FROM nation
    ), loc_proj AS (
      SELECT location_id, natkey AS project_id FROM locs
      WHERE location_id % 7 != 3
      UNION ALL
      SELECT location_id, (natkey + 7) % 25 FROM locs
      WHERE location_id % 7 != 3 AND location_id % 2 = 0
    ), nets AS (
      SELECT CAST(r_regionkey AS BIGINT) AS network_id,
             'net ' || r_name AS nname, 'netfr ' || r_name AS nname_fr
      FROM region
    ), loc_net AS (
      SELECT location_id, location_id % 5 AS network_id FROM locs
      WHERE location_id % 6 != 1
      UNION ALL
      SELECT location_id, (location_id * 3 + 1) % 5 FROM locs
      WHERE location_id % 3 = 0
    ), dconv AS (
      SELECT location_id, location_id % 4 AS datum_id_to,
             CAST(location_id % 97 AS DOUBLE) + CAST(0.5 AS DOUBLE)
               AS conversion_m
      FROM locs WHERE location_id % 3 != 1
    ), dlist AS (
      SELECT CAST(r_regionkey AS BIGINT) AS datum_id,
             'datum ' || r_name AS datum_name_en,
             'datumfr ' || r_name AS datum_name_fr
      FROM region WHERE r_regionkey < 4
    ), langs AS (
      SELECT CAST(r_regionkey AS BIGINT) AS language_id,
             'lang ' || r_name AS language_name_en,
             'langfr ' || r_name AS language_name_fr
      FROM region WHERE r_regionkey < 3
    ), lnames AS (
      SELECT location_id, location_id % 3 AS language_id,
             'FN name ' || CAST(location_id AS VARCHAR) AS fname
      FROM locs WHERE location_id % 4 = 0
      UNION ALL
      SELECT location_id, (location_id + 1) % 3,
             'FN alt ' || CAST(location_id AS VARCHAR)
      FROM locs WHERE location_id % 8 = 0
    )"""

_META_TS_CTES = """
    , mstates AS (
      SELECT CAST(r_regionkey + 1 AS BIGINT) AS matrix_state_id,
             CASE r_regionkey WHEN 0 THEN 'liquid' WHEN 1 THEN 'solid'
                  WHEN 2 THEN 'gas' ELSE 'plasma' END AS matrix_state_code
      FROM region WHERE r_regionkey < 4
    ), params AS (
      SELECT CAST(n_nationkey AS BIGINT) AS parameter_id,
             'param ' || n_name AS param_name,
             'paramfr ' || n_name AS param_name_fr,
             CASE WHEN n_nationkey % 5 != 0
                  THEN CAST(n_nationkey % 7 AS BIGINT) END AS units_liquid,
             CASE WHEN n_nationkey % 4 != 0
                  THEN CAST((n_nationkey + 1) % 7 AS BIGINT)
             END AS units_solid,
             CASE WHEN n_nationkey % 3 != 0
                  THEN CAST((n_nationkey + 2) % 7 AS BIGINT)
             END AS units_gas
      FROM nation
    ), unitst AS (
      SELECT CAST(n_nationkey AS BIGINT) AS unit_id,
             'u-' || n_name AS unit_name
      FROM nation WHERE n_nationkey < 7
    ), unit_map AS (
      SELECT p.parameter_id, ms.matrix_state_id,
             CASE ms.matrix_state_code WHEN 'liquid' THEN p.units_liquid
                  WHEN 'solid' THEN p.units_solid
                  WHEN 'gas' THEN p.units_gas END AS unit_id
      FROM params p CROSS JOIN mstates ms
    ), mtypes AS (
      SELECT CAST(r_regionkey AS BIGINT) AS media_id,
             'media ' || r_name AS media_type,
             'mediafr ' || r_name AS media_type_fr
      FROM region WHERE r_regionkey < 4
    ), aggts AS (
      SELECT CAST(r_regionkey AS BIGINT) AS aggregation_type_id,
             'agg ' || r_name AS aggregation_type,
             'aggfr ' || r_name AS aggregation_type_fr
      FROM region WHERE r_regionkey < 3
    ), locz AS (
      SELECT CAST(n_nationkey AS BIGINT) AS z_id,
             CAST(n_nationkey AS DOUBLE) * CAST(1.5 AS DOUBLE)
               - CAST(3 AS DOUBLE) AS z_meters
      FROM nation WHERE n_nationkey < 7
    ), tstypes AS (
      SELECT CAST(r_regionkey + 1 AS BIGINT) AS timeseries_type,
             'tstype ' || r_name AS timeseries_type_name,
             'tstypefr ' || r_name AS timeseries_type_name_fr,
             'desc ' || r_name AS description,
             'descfr ' || r_name AS description_fr
      FROM region WHERE r_regionkey < 2
    ), ts AS (
      SELECT p_partkey AS timeseries_id,
             p_partkey % 10 AS location_id,
             p_partkey % 25 AS parameter_id,
             p_partkey % 4 + 1 AS matrix_state_id,
             p_partkey % 4 AS media_id,
             p_partkey % 3 AS aggregation_type_id,
             CASE WHEN p_partkey % 5 = 0 THEN p_partkey % 7 END AS z_id,
             CASE p_partkey % 3 WHEN 0 THEN 'PT5M' WHEN 1 THEN 'PT1H'
                  ELSE 'P1D' END AS record_rate,
             p_partkey % 3 + 1 AS sensor_priority,
             CAST(DATE '2020-01-01' + CAST(p_partkey % 1000 AS INTEGER)
                  AS TIMESTAMP) AS start_datetime,
             CAST(DATE '2020-01-01'
                  + CAST(p_partkey % 1000 + p_partkey % 300 + 10
                         AS INTEGER) AS TIMESTAMP) AS end_datetime,
             CASE WHEN p_partkey % 6 = 0
                  THEN 'ts note ' || CAST(p_partkey AS VARCHAR) END AS note,
             p_partkey % 2 + 1 AS timeseries_type
      FROM part
    )"""


def _meta_rollup_ctes(lang: str) -> str:
    """Per-location sorted-distinct rollups (projects, networks, First
    Nations names JSON) — the engine-portable array_agg(DISTINCT) /
    jsonb_agg(DISTINCT) analog, rendered as sorted CSV / JSON-array
    strings so the driver's value hash is order-insensitive."""
    pn = "pname" if lang == "en" else "pname_fr"
    nn = "nname" if lang == "en" else "nname_fr"
    if lang == "en":
        js = ("'{\"language_code\":' || CAST(ln.language_id AS VARCHAR)"
              " || ',\"language_name_en\":\"' || lg.language_name_en"
              " || '\",\"name\":\"' || ln.fname || '\"}'")
    else:
        js = ("'{\"language_id\":' || CAST(ln.language_id AS VARCHAR)"
              " || ',\"language_name_fr\":\"' || lg.language_name_fr"
              " || '\",\"name\":\"' || ln.fname || '\"}'")
    return f"""
    , proj_roll AS (
      SELECT location_id, string_agg({pn}, ',' ORDER BY {pn}) AS projects
      FROM (SELECT DISTINCT lp.location_id, p.{pn}
            FROM loc_proj lp JOIN projs p USING (project_id))
      GROUP BY 1
    ), net_roll AS (
      SELECT location_id, string_agg({nn}, ',' ORDER BY {nn}) AS networks
      FROM (SELECT DISTINCT lnk.location_id, n.{nn}
            FROM loc_net lnk JOIN nets n USING (network_id))
      GROUP BY 1
    ), fn_roll AS (
      SELECT location_id,
             '[' || string_agg(js, ',' ORDER BY js) || ']' AS fn_names
      FROM (SELECT DISTINCT ln.location_id, {js} AS js
            FROM lnames ln JOIN langs lg USING (language_id))
      GROUP BY 1
    )"""


_LOCMETA_EN_ORACLE = "WITH " + _META_CTES + _meta_rollup_ctes("en") + """
    SELECT l.location_id, l.name, l.alias, l.location_code,
           lt.type AS location_type, l.latitude, l.longitude,
           dc.conversion_m AS elevation, dl.datum_name_en AS datum,
           l.note,
           COALESCE(pr.projects, '') AS projects,
           COALESCE(nr.networks, '') AS networks,
           COALESCE(fr.fn_names, '[]') AS fn_names
    FROM locs l
    LEFT JOIN ltypes lt ON l.location_type = lt.type_id
    LEFT JOIN dconv dc USING (location_id)
    LEFT JOIN dlist dl ON dc.datum_id_to = dl.datum_id
    LEFT JOIN proj_roll pr USING (location_id)
    LEFT JOIN net_roll nr USING (location_id)
    LEFT JOIN fn_roll fr USING (location_id)
"""

_LOCMETA_FR_ORACLE = "WITH " + _META_CTES + _meta_rollup_ctes("fr") + """
    SELECT l.location_id, l.name_fr AS nom, l.alias,
           l.location_code AS code_de_site,
           lt.type_fr AS type_de_site, l.latitude, l.longitude,
           dc.conversion_m AS altitude, dl.datum_name_fr AS datum,
           l.note,
           COALESCE(pr.projects, '') AS projets,
           COALESCE(nr.networks, '') AS "réseaux",
           COALESCE(fr.fn_names, '[]') AS "noms_premières_nations"
    FROM locs l
    LEFT JOIN ltypes lt ON l.location_type = lt.type_id
    LEFT JOIN dconv dc USING (location_id)
    LEFT JOIN dlist dl ON dc.datum_id_to = dl.datum_id
    LEFT JOIN proj_roll pr USING (location_id)
    LEFT JOIN net_roll nr USING (location_id)
    LEFT JOIN fn_roll fr USING (location_id)
"""


def _loc_meta(spark: SparkSession, sf_dir: str, lang: str) -> DataFrame:
    from .operators.metadata import location_metadata

    fx = _meta_fixture(spark, sf_dir)
    return location_metadata(
        fx["locations"], fx["location_types"],
        fx["locations_projects"], fx["projects"],
        fx["locations_networks"], fx["networks"],
        fx["datum_conversions"], fx["datum_list"],
        fx["location_names"], fx["languages"], lang=lang)


@register("location_metadata_read", oracle=_LOCMETA_EN_ORACLE)
def location_metadata_read_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """public.location_metadata_en (patch_45.R:381-420): locations star
    with sorted project/network rollups, current-datum elevation, and
    the First Nations names JSON payload."""
    out = _loc_meta(spark, sf_dir, "en")
    return out.select(
        "location_id", "name", "alias", "location_code", "location_type",
        "latitude", "longitude", "elevation", "datum", "note",
        F.array_join("projects", ",").alias("projects"),
        F.array_join("networks", ",").alias("networks"),
        "fn_names")


@register("location_metadata_fr", oracle=_LOCMETA_FR_ORACLE)
def location_metadata_fr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """public.location_metadata_fr (patch_45.R:424-472): the French
    twin — name_fr/type_fr/datum_name_fr and the reference's accented
    column names."""
    out = _loc_meta(spark, sf_dir, "fr")
    return out.select(
        "location_id", "nom", "alias", "code_de_site", "type_de_site",
        "latitude", "longitude", "altitude", "datum", "note",
        F.array_join("projets", ",").alias("projets"),
        F.array_join("réseaux", ",").alias("réseaux"),
        "noms_premières_nations")


_TSMETA_EN_ORACLE = ("WITH " + _META_CTES + _META_TS_CTES
                     + _meta_rollup_ctes("en") + """
    SELECT t.timeseries_id, t.location_id,
           l.name AS location_name, lt.type AS location_type,
           l.alias AS alias_name, lz.z_meters AS depth_height_m,
           l.latitude, l.longitude,
           dc.conversion_m AS location_elevation,
           COALESCE(pr.projects, '') AS projects,
           COALESCE(nr.networks, '') AS networks,
           mt.media_type, pa.param_name AS parameter_name,
           u.unit_name AS units, ag.aggregation_type,
           t.record_rate AS recording_rate, t.sensor_priority,
           t.start_datetime, t.end_datetime, t.note,
           t.timeseries_type AS timeseries_type_code,
           tt.timeseries_type_name AS timeseries_type,
           tt.description AS timeseries_type_description,
           t.end_datetime AS last_new_data
    FROM ts t
    JOIN locs l USING (location_id)
    LEFT JOIN ltypes lt ON l.location_type = lt.type_id
    LEFT JOIN params pa USING (parameter_id)
    LEFT JOIN unit_map um USING (parameter_id, matrix_state_id)
    LEFT JOIN unitst u ON um.unit_id = u.unit_id
    LEFT JOIN mtypes mt USING (media_id)
    LEFT JOIN aggts ag USING (aggregation_type_id)
    LEFT JOIN locz lz USING (z_id)
    LEFT JOIN tstypes tt USING (timeseries_type)
    LEFT JOIN dconv dc USING (location_id)
    LEFT JOIN proj_roll pr USING (location_id)
    LEFT JOIN net_roll nr USING (location_id)
""")

_TSMETA_FR_ORACLE = ("WITH " + _META_CTES + _META_TS_CTES
                     + _meta_rollup_ctes("fr") + """
    SELECT t.timeseries_id, t.location_id,
           l.name_fr AS nom_endroit, lt.type_fr AS type_endroit,
           l.alias AS nom_alias, lz.z_meters AS profondeur_hauteur_m,
           l.latitude, l.longitude,
           dc.conversion_m AS "élévation_endroit",
           COALESCE(pr.projects, '') AS projets,
           COALESCE(nr.networks, '') AS "réseaux",
           mt.media_type_fr AS "type_de_média",
           pa.param_name_fr AS "nom_paramètre",
           u.unit_name AS "unités",
           ag.aggregation_type_fr AS "type_agrégation",
           t.record_rate AS "fréquence_enregistrement",
           t.sensor_priority AS "priorité_capteur",
           t.start_datetime AS "début", t.end_datetime AS fin, t.note,
           t.timeseries_type AS code_type_serie_temporelle,
           tt.timeseries_type_name_fr AS type_serie_temporelle,
           tt.description_fr AS description_type_serie_temporelle,
           t.end_datetime AS dernier_nouvelles_donnees
    FROM ts t
    JOIN locs l USING (location_id)
    LEFT JOIN ltypes lt ON l.location_type = lt.type_id
    LEFT JOIN params pa USING (parameter_id)
    LEFT JOIN unit_map um USING (parameter_id, matrix_state_id)
    LEFT JOIN unitst u ON um.unit_id = u.unit_id
    LEFT JOIN mtypes mt USING (media_id)
    LEFT JOIN aggts ag USING (aggregation_type_id)
    LEFT JOIN locz lz USING (z_id)
    LEFT JOIN tstypes tt USING (timeseries_type)
    LEFT JOIN dconv dc USING (location_id)
    LEFT JOIN proj_roll pr USING (location_id)
    LEFT JOIN net_roll nr USING (location_id)
""")


def _ts_meta(spark: SparkSession, sf_dir: str, lang: str) -> DataFrame:
    from .operators.metadata import timeseries_metadata

    fx = _meta_fixture(spark, sf_dir)
    return timeseries_metadata(
        fx["timeseries"], fx["locations"], fx["location_types"],
        fx["parameters"], fx["matrix_states"], fx["units"],
        fx["media_types"], fx["aggregation_types"], fx["locations_z"],
        fx["locations_projects"], fx["projects"],
        fx["locations_networks"], fx["networks"],
        fx["datum_conversions"], fx["datum_list"],
        fx["timeseries_types"], lang=lang)


@register("timeseries_metadata_read", oracle=_TSMETA_EN_ORACLE)
def timeseries_metadata_read_q(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """continuous.timeseries_metadata_en (patch_45.R:489-535): the
    12-dimension catalog star with get_parameter_unit_name-resolved
    units (patch_39.R:846)."""
    out = _ts_meta(spark, sf_dir, "en")
    return out.select(
        "timeseries_id", "location_id", "location_name", "location_type",
        "alias_name", "depth_height_m", "latitude", "longitude",
        "location_elevation",
        F.array_join("projects", ",").alias("projects"),
        F.array_join("networks", ",").alias("networks"),
        "media_type", "parameter_name", "units", "aggregation_type",
        "recording_rate", "sensor_priority", "start_datetime",
        "end_datetime", "note", "timeseries_type_code",
        "timeseries_type", "timeseries_type_description",
        "last_new_data")


@register("timeseries_metadata_fr", oracle=_TSMETA_FR_ORACLE)
def timeseries_metadata_fr_q(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """continuous.timeseries_metadata_fr (patch_45.R:538-572)."""
    out = _ts_meta(spark, sf_dir, "fr")
    return out.select(
        "timeseries_id", "location_id", "nom_endroit", "type_endroit",
        "nom_alias", "profondeur_hauteur_m", "latitude", "longitude",
        "élévation_endroit",
        F.array_join("projets", ",").alias("projets"),
        F.array_join("réseaux", ",").alias("réseaux"),
        "type_de_média", "nom_paramètre", "unités", "type_agrégation",
        "fréquence_enregistrement", "priorité_capteur", "début", "fin",
        "note", "code_type_serie_temporelle", "type_serie_temporelle",
        "description_type_serie_temporelle", "dernier_nouvelles_donnees")


# ---------------------------------------------------------------------------
# Discrete bilingual metadata views (operators/metadata.py):
# discrete.samples_metadata_en/fr (patch_43.R:171-418) and
# discrete.results_metadata_en/fr (patch_43.R:419-652), both preserved
# verbatim by patch_52.R:338-470. Samples fact from orders, results
# fact from lineitem; every dimension catalog-class and broadcast; the
# project/network rollups resolve COALESCE(name_fr, name) in the fr
# views and the LATERAL datum pick is ORDER BY conversion_id LIMIT 1
# (min_by, exercised by locations carrying TWO current=true rows).
# ---------------------------------------------------------------------------

def _dmeta_fixture(spark: SparkSession, sf_dir: str) -> dict:
    """Discrete catalog + facts on top of _meta_fixture (mirrored by
    _DMETA_CTES): dims from region/nation with PARTIAL French names
    (NULLs exercise the fr views' COALESCE), samples from orders,
    results from lineitem."""
    fx = _meta_fixture(spark, sf_dir)
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    n = F.col("n_nationkey")
    r = F.col("r_regionkey")
    epoch = F.lit("2020-01-01").cast("date")

    fx["parameters"] = fx["parameters"].withColumn(
        "cas_number",
        F.when(F.col("parameter_id") % 2 == 0,
               F.concat(F.lit("50-00-"),
                        F.col("parameter_id").cast("string"))))
    fx["matrix_states"] = fx["matrix_states"].withColumns({
        "matrix_state_name":
            F.concat(F.lit("mstate "), F.col("matrix_state_code")),
        "matrix_state_name_fr":
            F.when(F.col("matrix_state_id") != 2,
                   F.concat(F.lit("mstatefr "),
                            F.col("matrix_state_code")))})
    fx["sub_locations"] = nat.where(n < 7).select(
        n.cast("long").alias("sub_location_id"),
        F.concat(F.lit("sub "), F.col("n_name"))
        .alias("sub_location_name"),
        F.when(n % 2 != 0, F.concat(F.lit("subfr "), F.col("n_name")))
        .alias("sub_location_name_fr"),
        (F.lit(60.0) + n.cast("double") / 10.0).alias("latitude"),
        (F.lit(-130.0) - n.cast("double") / 10.0).alias("longitude"))
    fx["collection_methods"] = reg.where(r < 3).select(
        r.cast("long").alias("collection_method_id"),
        F.concat(F.lit("cm "), F.col("r_name")).alias("collection_method"))
    fx["sample_types"] = reg.where(r < 4).select(
        r.cast("long").alias("sample_type_id"),
        F.concat(F.lit("stype "), F.col("r_name")).alias("sample_type"),
        F.when(r != 1, F.concat(F.lit("stypefr "), F.col("r_name")))
        .alias("sample_type_fr"))
    fx["grade_types"] = reg.select(
        r.cast("long").alias("grade_type_id"),
        F.concat(F.lit("G"), r.cast("string")).alias("grade_type_code"),
        F.concat(F.lit("grade "), F.col("r_name"))
        .alias("grade_type_description"),
        F.concat(F.lit("gradefr "), F.col("r_name"))
        .alias("grade_type_description_fr"))
    fx["approval_types"] = reg.select(
        r.cast("long").alias("approval_type_id"),
        F.concat(F.lit("A"), r.cast("string")).alias("approval_type_code"),
        F.concat(F.lit("appr "), F.col("r_name"))
        .alias("approval_type_description"),
        F.concat(F.lit("apprfr "), F.col("r_name"))
        .alias("approval_type_description_fr"))
    fx["qualifier_types"] = reg.select(
        r.cast("long").alias("qualifier_type_id"),
        F.concat(F.lit("Q"), r.cast("string"))
        .alias("qualifier_type_code"),
        F.concat(F.lit("qual "), F.col("r_name"))
        .alias("qualifier_type_description"),
        F.concat(F.lit("qualfr "), F.col("r_name"))
        .alias("qualifier_type_description_fr"))
    fx["organizations"] = nat.select(
        n.cast("long").alias("organization_id"),
        F.concat(F.lit("org "), F.col("n_name")).alias("name"),
        F.when(n % 3 != 0, F.concat(F.lit("orgfr "), F.col("n_name")))
        .alias("name_fr"))
    # TWO current=true conversions for location_id % 6 == 0 — the
    # ORDER BY conversion_id LIMIT 1 pick must take the even id
    loc_ids = fx["locations"].select("location_id") \
        .where(F.col("location_id") % 3 != 1)
    li = F.col("location_id")
    dc1 = loc_ids.select(
        "location_id", (li * 2).alias("conversion_id"),
        ((li % 97).cast("double") + 0.5).alias("conversion_m"),
        F.lit(True).alias("current"))
    dc2 = loc_ids.select(
        "location_id", (li * 2 + 1).alias("conversion_id"),
        ((li % 97).cast("double") + 50.5).alias("conversion_m"),
        (li % 6 == 0).alias("current"))
    fx["datum_conversions_d"] = dc1.unionByName(dc2)

    fx["sample_fractions"] = reg.select(
        r.cast("long").alias("sample_fraction_id"),
        F.concat(F.lit("frac "), F.col("r_name")).alias("sample_fraction"))
    fx["result_types"] = reg.where(r < 4).select(
        r.cast("long").alias("result_type_id"),
        F.concat(F.lit("rtype "), F.col("r_name")).alias("result_type"))
    fx["result_conditions"] = reg.where(r < 3).select(
        r.cast("long").alias("result_condition_id"),
        F.concat(F.lit("rcond "), F.col("r_name"))
        .alias("result_condition"))
    fx["result_value_types"] = reg.where(r < 3).select(
        r.cast("long").alias("result_value_type_id"),
        F.concat(F.lit("rvt "), F.col("r_name"))
        .alias("result_value_type"))
    fx["result_speciations"] = reg.where(r < 4).select(
        r.cast("long").alias("result_speciation_id"),
        F.concat(F.lit("rspec "), F.col("r_name"))
        .alias("result_speciation"))
    fx["protocols_methods"] = nat.where(n < 6).select(
        n.cast("long").alias("protocol_id"),
        F.concat(F.lit("proto "), F.col("n_name")).alias("protocol_name"),
        F.concat(F.lit("protodesc "), F.col("n_name"))
        .alias("protocol_description"),
        F.concat(F.lit("https://example.org/p/"), n.cast("string"))
        .alias("url"))
    fx["laboratories"] = nat.where(n < 8).select(
        n.cast("long").alias("lab_id"),
        F.concat(F.lit("lab "), F.col("n_name")).alias("lab_name"))

    o = F.col("o_orderkey")
    fx["samples"] = _t(spark, sf_dir, "orders").select(
        o.alias("sample_id"),
        (o % 10).alias("location_id"),
        F.when(o % 3 == 0, o % 7).alias("sub_location_id"),
        (o % 4).alias("media_id"),
        ((o % 50).cast("double") / 10.0).alias("z"),
        F.to_timestamp(F.date_add(epoch, (o % 1000).cast("int")))
        .alias("datetime"),
        F.when(o % 5 == 0, F.to_timestamp(
            F.date_add(epoch, (o % 1000 + 1).cast("int"))))
        .alias("target_datetime"),
        (o % 3).alias("collection_method"),
        (o % 4).alias("sample_type"),
        F.when(o % 11 == 0, o + 1).alias("linked_with"),
        F.when(o % 2 == 0, (o % 90).cast("double") * 10.0)
        .alias("sample_volume_ml"),
        F.when(o % 3 == 1, (o % 17).cast("double") / 2.0)
        .alias("purge_volume_l"),
        F.when(o % 4 == 2, (o % 30).cast("double"))
        .alias("purge_time_min"),
        F.when(o % 5 == 3, (o % 12).cast("double") / 4.0)
        .alias("flow_rate_l_min"),
        F.when(o % 7 == 4, (o % 9).cast("double") / 10.0)
        .alias("wave_hgt_m"),
        (o % 5).alias("sample_grade"),
        ((o + 1) % 5).alias("sample_approval"),
        F.when(o % 6 != 0, (o + 2) % 5).alias("sample_qualifier"),
        (o % 25).alias("owner"),
        ((o + 3) % 25).alias("contributor"),
        F.when(o % 2 == 0, (o + 5) % 25).alias("comissioning_org"),
        ((o + 7) % 25).alias("sampling_org"),
        F.when(o % 6 == 0, o * 2).alias("field_visit_id"),
        F.when(o % 9 == 0, o % 5).alias("data_sharing_agreement_id"),
        F.when(o % 8 == 0, F.concat(F.lit("doc-"), o.cast("string")))
        .alias("documents"),
        F.when(o % 2 == 0, F.lit("EQWin")).alias("import_source"),
        F.when(o % 2 == 0, F.concat(F.lit("EQ-"), o.cast("string")))
        .alias("import_source_id"),
        (o % 13 == 0).alias("no_update"),
        F.when(o % 10 == 0, F.concat(F.lit("s note "), o.cast("string")))
        .alias("note"),
        F.when(o % 2 == 0, F.lit("public_reader"))
        .otherwise(F.lit("yg_reader")).alias("share_with"),
        F.when(o % 15 == 0, F.to_timestamp(F.date_add(epoch, 1200)))
        .alias("private_expiry"),
        F.to_timestamp(F.date_add(epoch, (o % 400).cast("int")))
        .alias("created"),
        F.concat(F.lit("user"), (o % 7).cast("string")).alias("created_by"),
        F.when(o % 4 == 0, F.to_timestamp(
            F.date_add(epoch, (o % 400 + 30).cast("int"))))
        .alias("modified"),
        F.when(o % 4 == 0, F.concat(F.lit("user"), (o % 5).cast("string")))
        .alias("modified_by"),
    )
    k = F.col("l_orderkey") * 8 + F.col("l_linenumber")
    fx["results"] = _t(spark, sf_dir, "lineitem").select(
        k.alias("result_id"),
        F.col("l_orderkey").alias("sample_id"),
        (F.col("l_partkey") % 25).alias("parameter_id"),
        (F.col("l_suppkey") % 4 + 1).alias("matrix_state_id"),
        F.when(k % 3 != 0, k % 5).alias("sample_fraction_id"),
        (k % 4).alias("result_type"),
        F.col("l_quantity").cast("double").alias("result"),
        F.when(k % 7 == 0, k % 3).alias("result_condition"),
        F.when(k % 7 == 0, (k % 50).cast("double") / 10.0)
        .alias("result_condition_value"),
        (k % 3).alias("result_value_type"),
        F.when(k % 5 == 0, k % 4).alias("result_speciation_id"),
        F.when(k % 4 != 2, k % 6).alias("protocol_method"),
        F.when(k % 4 != 1, k % 8).alias("laboratory"),
        F.to_timestamp(F.date_add(epoch, (k % 900).cast("int")))
        .alias("analysis_datetime"),
        (k % 17 == 0).alias("no_update"),
        F.when(k % 2 == 0, F.lit("public_reader"))
        .otherwise(F.lit("yg_reader")).alias("share_with"),
        F.when(k % 21 == 0,
               F.lit("2023-06-01 00:00:00").cast("timestamp"))
        .alias("private_expiry"),
        F.to_timestamp(F.date_add(epoch, (k % 500).cast("int")))
        .alias("created"),
        F.concat(F.lit("user"), (k % 7).cast("string")).alias("created_by"),
        F.when(k % 4 == 0, F.to_timestamp(
            F.date_add(epoch, (k % 500 + 30).cast("int"))))
        .alias("modified"),
        F.when(k % 4 == 0, F.concat(F.lit("user"), (k % 5).cast("string")))
        .alias("modified_by"),
    )
    return fx


_DMETA_CTES = """
    , params_d AS (
      SELECT *, CASE WHEN parameter_id % 2 = 0
                     THEN '50-00-' || CAST(parameter_id AS VARCHAR)
                END AS cas_number
      FROM params
    ), mstates_d AS (
      SELECT *, 'mstate ' || matrix_state_code AS matrix_state_name,
             CASE WHEN matrix_state_id != 2
                  THEN 'mstatefr ' || matrix_state_code
             END AS matrix_state_name_fr
      FROM mstates
    ), sublocs AS (
      SELECT CAST(n_nationkey AS BIGINT) AS sub_location_id,
             'sub ' || n_name AS sub_location_name,
             CASE WHEN n_nationkey % 2 != 0
                  THEN 'subfr ' || n_name END AS sub_location_name_fr,
             CAST(60 AS DOUBLE) + CAST(n_nationkey AS DOUBLE)
               / CAST(10 AS DOUBLE) AS sub_lat,
             CAST(-130 AS DOUBLE) - CAST(n_nationkey AS DOUBLE)
               / CAST(10 AS DOUBLE) AS sub_lon
      FROM nation WHERE n_nationkey < 7
    ), cmeths AS (
      SELECT CAST(r_regionkey AS BIGINT) AS collection_method_id,
             'cm ' || r_name AS collection_method
      FROM region WHERE r_regionkey < 3
    ), stypes AS (
      SELECT CAST(r_regionkey AS BIGINT) AS sample_type_id,
             'stype ' || r_name AS sample_type,
             CASE WHEN r_regionkey != 1
                  THEN 'stypefr ' || r_name END AS sample_type_fr
      FROM region WHERE r_regionkey < 4
    ), gtypes AS (
      SELECT CAST(r_regionkey AS BIGINT) AS grade_type_id,
             'G' || CAST(r_regionkey AS VARCHAR) AS grade_type_code,
             'grade ' || r_name AS grade_type_description,
             'gradefr ' || r_name AS grade_type_description_fr
      FROM region
    ), atypes AS (
      SELECT CAST(r_regionkey AS BIGINT) AS approval_type_id,
             'A' || CAST(r_regionkey AS VARCHAR) AS approval_type_code,
             'appr ' || r_name AS approval_type_description,
             'apprfr ' || r_name AS approval_type_description_fr
      FROM region
    ), qtypes AS (
      SELECT CAST(r_regionkey AS BIGINT) AS qualifier_type_id,
             'Q' || CAST(r_regionkey AS VARCHAR) AS qualifier_type_code,
             'qual ' || r_name AS qualifier_type_description,
             'qualfr ' || r_name AS qualifier_type_description_fr
      FROM region
    ), orgs AS (
      SELECT CAST(n_nationkey AS BIGINT) AS organization_id,
             'org ' || n_name AS oname,
             CASE WHEN n_nationkey % 3 != 0
                  THEN 'orgfr ' || n_name END AS oname_fr
      FROM nation
    ), dconv2 AS (
      SELECT location_id, location_id * 2 AS conversion_id,
             CAST(location_id % 97 AS DOUBLE) + CAST(0.5 AS DOUBLE)
               AS conversion_m, TRUE AS cur
      FROM locs WHERE location_id % 3 != 1
      UNION ALL
      SELECT location_id, location_id * 2 + 1,
             CAST(location_id % 97 AS DOUBLE) + CAST(50.5 AS DOUBLE),
             location_id % 6 = 0
      FROM locs WHERE location_id % 3 != 1
    ), dpick AS (
      SELECT location_id, arg_min(conversion_m, conversion_id)
               AS conversion_m
      FROM dconv2 WHERE cur GROUP BY 1
    ), fracs AS (
      SELECT CAST(r_regionkey AS BIGINT) AS sample_fraction_id,
             'frac ' || r_name AS sample_fraction FROM region
    ), rtypes AS (
      SELECT CAST(r_regionkey AS BIGINT) AS result_type_id,
             'rtype ' || r_name AS result_type
      FROM region WHERE r_regionkey < 4
    ), rconds AS (
      SELECT CAST(r_regionkey AS BIGINT) AS result_condition_id,
             'rcond ' || r_name AS result_condition
      FROM region WHERE r_regionkey < 3
    ), rvtypes AS (
      SELECT CAST(r_regionkey AS BIGINT) AS result_value_type_id,
             'rvt ' || r_name AS result_value_type
      FROM region WHERE r_regionkey < 3
    ), rspecs AS (
      SELECT CAST(r_regionkey AS BIGINT) AS result_speciation_id,
             'rspec ' || r_name AS result_speciation
      FROM region WHERE r_regionkey < 4
    ), protos AS (
      SELECT CAST(n_nationkey AS BIGINT) AS protocol_id,
             'proto ' || n_name AS protocol_name,
             'protodesc ' || n_name AS protocol_description,
             'https://example.org/p/' || CAST(n_nationkey AS VARCHAR)
               AS url
      FROM nation WHERE n_nationkey < 6
    ), labs AS (
      SELECT CAST(n_nationkey AS BIGINT) AS lab_id,
             'lab ' || n_name AS lab_name
      FROM nation WHERE n_nationkey < 8
    ), smp AS (
      SELECT o_orderkey AS sample_id,
             o_orderkey % 10 AS location_id,
             CASE WHEN o_orderkey % 3 = 0 THEN o_orderkey % 7 END
               AS sub_location_id,
             o_orderkey % 4 AS media_id,
             CAST(o_orderkey % 50 AS DOUBLE) / CAST(10 AS DOUBLE) AS z,
             CAST(DATE '2020-01-01'
                  + CAST(o_orderkey % 1000 AS INTEGER) AS TIMESTAMP)
               AS datetime,
             CASE WHEN o_orderkey % 5 = 0 THEN
               CAST(DATE '2020-01-01'
                    + CAST(o_orderkey % 1000 + 1 AS INTEGER) AS TIMESTAMP)
             END AS target_datetime,
             o_orderkey % 3 AS collection_method,
             o_orderkey % 4 AS sample_type,
             CASE WHEN o_orderkey % 11 = 0 THEN o_orderkey + 1 END
               AS linked_with,
             CASE WHEN o_orderkey % 2 = 0 THEN
               CAST(o_orderkey % 90 AS DOUBLE) * CAST(10 AS DOUBLE)
             END AS sample_volume_ml,
             CASE WHEN o_orderkey % 3 = 1 THEN
               CAST(o_orderkey % 17 AS DOUBLE) / CAST(2 AS DOUBLE)
             END AS purge_volume_l,
             CASE WHEN o_orderkey % 4 = 2 THEN
               CAST(o_orderkey % 30 AS DOUBLE)
             END AS purge_time_min,
             CASE WHEN o_orderkey % 5 = 3 THEN
               CAST(o_orderkey % 12 AS DOUBLE) / CAST(4 AS DOUBLE)
             END AS flow_rate_l_min,
             CASE WHEN o_orderkey % 7 = 4 THEN
               CAST(o_orderkey % 9 AS DOUBLE) / CAST(10 AS DOUBLE)
             END AS wave_hgt_m,
             o_orderkey % 5 AS sample_grade,
             (o_orderkey + 1) % 5 AS sample_approval,
             CASE WHEN o_orderkey % 6 != 0 THEN (o_orderkey + 2) % 5 END
               AS sample_qualifier,
             o_orderkey % 25 AS owner,
             (o_orderkey + 3) % 25 AS contributor,
             CASE WHEN o_orderkey % 2 = 0 THEN (o_orderkey + 5) % 25 END
               AS comissioning_org,
             (o_orderkey + 7) % 25 AS sampling_org,
             CASE WHEN o_orderkey % 6 = 0 THEN o_orderkey * 2 END
               AS field_visit_id,
             CASE WHEN o_orderkey % 9 = 0 THEN o_orderkey % 5 END
               AS data_sharing_agreement_id,
             CASE WHEN o_orderkey % 8 = 0
                  THEN 'doc-' || CAST(o_orderkey AS VARCHAR)
             END AS documents,
             CASE WHEN o_orderkey % 2 = 0 THEN 'EQWin' END
               AS import_source,
             CASE WHEN o_orderkey % 2 = 0
                  THEN 'EQ-' || CAST(o_orderkey AS VARCHAR)
             END AS import_source_id,
             o_orderkey % 13 = 0 AS no_update,
             CASE WHEN o_orderkey % 10 = 0
                  THEN 's note ' || CAST(o_orderkey AS VARCHAR)
             END AS note,
             CASE WHEN o_orderkey % 2 = 0 THEN 'public_reader'
                  ELSE 'yg_reader' END AS share_with,
             CASE WHEN o_orderkey % 15 = 0 THEN
               CAST(DATE '2020-01-01' + 1200 AS TIMESTAMP)
             END AS private_expiry,
             CAST(DATE '2020-01-01'
                  + CAST(o_orderkey % 400 AS INTEGER) AS TIMESTAMP)
               AS created,
             'user' || CAST(o_orderkey % 7 AS VARCHAR) AS created_by,
             CASE WHEN o_orderkey % 4 = 0 THEN
               CAST(DATE '2020-01-01'
                    + CAST(o_orderkey % 400 + 30 AS INTEGER) AS TIMESTAMP)
             END AS modified,
             CASE WHEN o_orderkey % 4 = 0
                  THEN 'user' || CAST(o_orderkey % 5 AS VARCHAR)
             END AS modified_by
      FROM orders
    ), res AS (
      SELECT l_orderkey * 8 + l_linenumber AS result_id,
             l_orderkey AS sample_id,
             l_partkey % 25 AS parameter_id,
             l_suppkey % 4 + 1 AS matrix_state_id,
             CASE WHEN k % 3 != 0 THEN k % 5 END AS sample_fraction_id,
             k % 4 AS result_type,
             CAST(l_quantity AS DOUBLE) AS result,
             CASE WHEN k % 7 = 0 THEN k % 3 END AS result_condition,
             CASE WHEN k % 7 = 0 THEN
               CAST(k % 50 AS DOUBLE) / CAST(10 AS DOUBLE)
             END AS result_condition_value,
             k % 3 AS result_value_type,
             CASE WHEN k % 5 = 0 THEN k % 4 END AS result_speciation_id,
             CASE WHEN k % 4 != 2 THEN k % 6 END AS protocol_method,
             CASE WHEN k % 4 != 1 THEN k % 8 END AS laboratory,
             CAST(DATE '2020-01-01' + CAST(k % 900 AS INTEGER)
                  AS TIMESTAMP) AS analysis_datetime,
             k % 17 = 0 AS no_update,
             CASE WHEN k % 2 = 0 THEN 'public_reader'
                  ELSE 'yg_reader' END AS share_with,
             CASE WHEN k % 21 = 0 THEN TIMESTAMP '2023-06-01 00:00:00'
             END AS private_expiry,
             CAST(DATE '2020-01-01' + CAST(k % 500 AS INTEGER)
                  AS TIMESTAMP) AS created,
             'user' || CAST(k % 7 AS VARCHAR) AS created_by,
             CASE WHEN k % 4 = 0 THEN
               CAST(DATE '2020-01-01' + CAST(k % 500 + 30 AS INTEGER)
                    AS TIMESTAMP)
             END AS modified,
             CASE WHEN k % 4 = 0
                  THEN 'user' || CAST(k % 5 AS VARCHAR)
             END AS modified_by
      FROM (SELECT *, l_orderkey * 8 + l_linenumber AS k FROM lineitem)
    )"""


def _dmeta_sample_cols(lang: str) -> str:
    """The samples_metadata_{en,fr} SELECT list (patch_43.R order)."""
    en = lang == "en"

    def co(fr, e):
        return e if en else f"COALESCE({fr}, {e})"

    q = '"'
    cols = [
        "s.sample_id", "s.location_id", "l.location_code",
        f"{co('l.name_fr', 'l.name')} AS "
        + ("location_name" if en else "nom_endroit"),
        "l.alias AS " + ("alias_name" if en else "nom_alias"),
        "l.latitude", "l.longitude",
        "dp.conversion_m AS "
        + ("location_elevation" if en else f'{q}élévation_endroit{q}'),
        "COALESCE(pr.projects, '') AS "
        + ("projects" if en else "projets"),
        "COALESCE(nr.networks, '') AS "
        + ("networks" if en else f"{q}réseaux{q}"),
        "s.sub_location_id",
        f"{co('sl.sub_location_name_fr', 'sl.sub_location_name')} AS "
        + ("sub_location_name" if en else "nom_sous_endroit"),
        "sl.sub_lat AS " + ("sub_location_latitude" if en
                            else "latitude_sous_endroit"),
        "sl.sub_lon AS " + ("sub_location_longitude" if en
                            else "longitude_sous_endroit"),
        "s.media_id",
        f"{co('mt.media_type_fr', 'mt.media_type')} AS "
        + ("media_type" if en else f"{q}type_de_média{q}"),
        "s.z AS " + ("depth_height_m" if en else "profondeur_hauteur_m"),
        "s.datetime",
        "s.target_datetime AS " + ("target_datetime" if en
                                   else "datetime_cible"),
        "s.collection_method AS collection_method_id",
        "cm.collection_method AS "
        + ("collection_method" if en else f"{q}méthode_collecte{q}"),
        "s.sample_type AS sample_type_id",
        f"{co('st.sample_type_fr', 'st.sample_type')} AS "
        + ("sample_type" if en else f"{q}type_échantillon{q}"),
        "s.linked_with AS linked_sample_id",
        "s.sample_volume_ml AS "
        + ("sample_volume_ml" if en else f"{q}volume_échantillon_ml{q}"),
        "s.purge_volume_l AS "
        + ("purge_volume_l" if en else "volume_purge_l"),
        "s.purge_time_min AS "
        + ("purge_time_min" if en else f"{q}durée_purge_min{q}"),
        "s.flow_rate_l_min AS "
        + ("flow_rate_l_min" if en else f"{q}débit_l_min{q}"),
        "s.wave_hgt_m AS " + ("wave_hgt_m" if en else "hauteur_vague_m"),
        "s.sample_grade AS sample_grade_id",
        "gt.grade_type_code AS "
        + ("sample_grade_code" if en else f"{q}code_grade_échantillon{q}"),
        ("gt.grade_type_description" if en
         else "gt.grade_type_description_fr") + " AS "
        + ("sample_grade_description" if en
           else f"{q}description_grade_échantillon{q}"),
        "s.sample_approval AS sample_approval_id",
        "at2.approval_type_code AS "
        + ("sample_approval_code" if en
           else f"{q}code_approbation_échantillon{q}"),
        ("at2.approval_type_description" if en
         else "at2.approval_type_description_fr") + " AS "
        + ("sample_approval_description" if en
           else f"{q}description_approbation_échantillon{q}"),
        "s.sample_qualifier AS sample_qualifier_id",
        "qt.qualifier_type_code AS "
        + ("sample_qualifier_code" if en
           else f"{q}code_qualificatif_échantillon{q}"),
        ("qt.qualifier_type_description" if en
         else "qt.qualifier_type_description_fr") + " AS "
        + ("sample_qualifier_description" if en
           else f"{q}description_qualificatif_échantillon{q}"),
        "s.owner AS owner_id",
        f"{co('o1.oname_fr', 'o1.oname')} AS "
        + ("owner_name" if en else f"{q}propriétaire{q}"),
        "s.contributor AS contributor_id",
        f"{co('o2.oname_fr', 'o2.oname')} AS "
        + ("contributor_name" if en else "contributeur"),
        "s.comissioning_org AS commissioning_org_id",
        f"{co('o3.oname_fr', 'o3.oname')} AS "
        + ("commissioning_org_name" if en else "organisme_mise_service"),
        "s.sampling_org AS sampling_org_id",
        f"{co('o4.oname_fr', 'o4.oname')} AS "
        + ("sampling_org_name" if en
           else f"{q}organisme_échantillonnage{q}"),
        "s.field_visit_id", "s.data_sharing_agreement_id", "s.documents",
        "s.import_source", "s.import_source_id", "s.no_update", "s.note",
        "s.share_with", "s.private_expiry", "s.created", "s.created_by",
        "s.modified", "s.modified_by",
    ]
    return ",\n           ".join(cols)


_DMETA_SAMPLE_JOINS = """
    FROM smp s
    JOIN locs l USING (location_id)
    LEFT JOIN sublocs sl USING (sub_location_id)
    LEFT JOIN mtypes mt USING (media_id)
    LEFT JOIN cmeths cm ON s.collection_method = cm.collection_method_id
    LEFT JOIN stypes st ON s.sample_type = st.sample_type_id
    LEFT JOIN gtypes gt ON s.sample_grade = gt.grade_type_id
    LEFT JOIN atypes at2 ON s.sample_approval = at2.approval_type_id
    LEFT JOIN qtypes qt ON s.sample_qualifier = qt.qualifier_type_id
    LEFT JOIN orgs o1 ON s.owner = o1.organization_id
    LEFT JOIN orgs o2 ON s.contributor = o2.organization_id
    LEFT JOIN orgs o3 ON s.comissioning_org = o3.organization_id
    LEFT JOIN orgs o4 ON s.sampling_org = o4.organization_id
    LEFT JOIN dpick dp USING (location_id)
    LEFT JOIN proj_roll pr USING (location_id)
    LEFT JOIN net_roll nr USING (location_id)
"""


def _dmeta_oracle_samples(lang: str) -> str:
    return ("WITH " + _META_CTES + _META_TS_CTES + _DMETA_CTES
            + _meta_rollup_ctes(lang)
            + "\n    SELECT " + _dmeta_sample_cols(lang)
            + _DMETA_SAMPLE_JOINS)


def _dmeta_oracle_results(lang: str) -> str:
    en = lang == "en"

    def co(fr, e):
        return e if en else f"COALESCE({fr}, {e})"

    q = '"'
    sm_pass = [
        "sm.location_id", "sm.location_code",
        "sm." + ("location_name" if en else "nom_endroit"),
        "sm." + ("alias_name" if en else "nom_alias"),
        "sm.latitude", "sm.longitude",
        "sm." + ("location_elevation" if en
                 else f"{q}élévation_endroit{q}"),
        "sm." + ("projects" if en else "projets"),
        "sm." + ("networks" if en else f"{q}réseaux{q}"),
        "sm.sub_location_id",
        "sm." + ("sub_location_name" if en else "nom_sous_endroit"),
        "sm." + ("sub_location_latitude" if en
                 else "latitude_sous_endroit"),
        "sm." + ("sub_location_longitude" if en
                 else "longitude_sous_endroit"),
        "sm.media_id",
        "sm." + ("media_type" if en else f"{q}type_de_média{q}"),
        "sm." + ("depth_height_m" if en else "profondeur_hauteur_m"),
        "sm.datetime",
        "sm." + ("target_datetime" if en else "datetime_cible"),
        "sm.collection_method_id",
        "sm." + ("collection_method" if en else f"{q}méthode_collecte{q}"),
        "sm.sample_type_id",
        "sm." + ("sample_type" if en else f"{q}type_échantillon{q}"),
        "sm.sample_grade_id",
        "sm." + ("sample_grade_code" if en
                 else f"{q}code_grade_échantillon{q}"),
        "sm." + ("sample_grade_description" if en
                 else f"{q}description_grade_échantillon{q}"),
        "sm.sample_approval_id",
        "sm." + ("sample_approval_code" if en
                 else f"{q}code_approbation_échantillon{q}"),
        "sm." + ("sample_approval_description" if en
                 else f"{q}description_approbation_échantillon{q}"),
        "sm.sample_qualifier_id",
        "sm." + ("sample_qualifier_code" if en
                 else f"{q}code_qualificatif_échantillon{q}"),
        "sm." + ("sample_qualifier_description" if en
                 else f"{q}description_qualificatif_échantillon{q}"),
        "sm.owner_id AS sample_owner_id",
        ("sm.owner_name AS sample_owner_name" if en
         else f"sm.{q}propriétaire{q} AS {q}propriétaire_échantillon{q}"),
        "sm.contributor_id AS sample_contributor_id",
        ("sm.contributor_name AS sample_contributor_name" if en
         else f"sm.contributeur AS {q}contributeur_échantillon{q}"),
        "sm.import_source AS " + ("sample_import_source" if en
                                  else
                                  f"{q}source_importation_échantillon{q}"),
        "sm.import_source_id AS "
        + ("sample_import_source_id" if en
           else f"{q}id_source_importation_échantillon{q}"),
        "sm.note AS " + ("sample_note" if en
                         else f"{q}note_échantillon{q}"),
    ]
    tail = [
        "r.parameter_id",
        f"{co('p.param_name_fr', 'p.param_name')} AS "
        + ("parameter_name" if en else f"{q}nom_paramètre{q}"),
        "p.cas_number",
        "r.matrix_state_id", "ms.matrix_state_code",
        f"{co('ms.matrix_state_name_fr', 'ms.matrix_state_name')} AS "
        + ("matrix_state_name" if en else f"{q}état_matrice{q}"),
        "u.unit_name AS " + ("units" if en else f"{q}unités{q}"),
        "r.sample_fraction_id",
        "sf.sample_fraction AS "
        + ("sample_fraction" if en else f"{q}fraction_échantillon{q}"),
        "r.result_type AS result_type_id",
        "rt.result_type AS " + ("result_type" if en
                                else f"{q}type_résultat{q}"),
        "r.result AS " + ("result" if en else f"{q}résultat{q}"),
        "r.result_condition AS result_condition_id",
        "rc.result_condition AS "
        + ("result_condition" if en else f"{q}condition_résultat{q}"),
        "r.result_condition_value AS "
        + ("result_condition_value" if en
           else f"{q}valeur_condition_résultat{q}"),
        "r.result_value_type AS result_value_type_id",
        "rvt.result_value_type AS "
        + ("result_value_type" if en else f"{q}type_valeur_résultat{q}"),
        "r.result_speciation_id",
        "rs.result_speciation AS "
        + ("result_speciation" if en else f"{q}spéciation_résultat{q}"),
        "r.protocol_method AS protocol_method_id",
        "pm.protocol_name AS "
        + ("protocol_method" if en else f"{q}méthode_protocole{q}"),
        "pm.protocol_description AS "
        + ("protocol_description" if en else f"{q}description_protocole{q}"),
        "pm.url AS " + ("protocol_url" if en else "url_protocole"),
        "r.laboratory AS lab_id",
        "lab.lab_name AS " + ("lab_name" if en else "nom_laboratoire"),
        "r.analysis_datetime AS "
        + ("analysis_datetime" if en else "datetime_analyse"),
        "sm.no_update AS " + ("sample_no_update" if en
                              else f"{q}no_update_échantillon{q}"),
        "r.no_update AS " + ("result_no_update" if en
                             else f"{q}no_update_résultat{q}"),
        "sm.share_with AS " + ("sample_share_with" if en
                               else f"{q}share_with_échantillon{q}"),
        "r.share_with AS " + ("result_share_with" if en
                              else f"{q}share_with_résultat{q}"),
        "sm.private_expiry AS "
        + ("sample_private_expiry" if en
           else f"{q}private_expiry_échantillon{q}"),
        "r.private_expiry AS "
        + ("result_private_expiry" if en
           else f"{q}private_expiry_résultat{q}"),
        "r.created", "r.created_by", "r.modified", "r.modified_by",
    ]
    return ("WITH " + _META_CTES + _META_TS_CTES + _DMETA_CTES
            + _meta_rollup_ctes(lang)
            + ", smeta AS (\n    SELECT " + _dmeta_sample_cols(lang)
            + _DMETA_SAMPLE_JOINS + ")"
            + "\n    SELECT r.result_id, r.sample_id,\n           "
            + ",\n           ".join(sm_pass + tail) + """
    FROM res r
    JOIN smeta sm USING (sample_id)
    LEFT JOIN params_d p USING (parameter_id)
    LEFT JOIN mstates_d ms USING (matrix_state_id)
    LEFT JOIN unit_map um USING (parameter_id, matrix_state_id)
    LEFT JOIN unitst u ON um.unit_id = u.unit_id
    LEFT JOIN fracs sf USING (sample_fraction_id)
    LEFT JOIN rtypes rt ON r.result_type = rt.result_type_id
    LEFT JOIN rconds rc ON r.result_condition = rc.result_condition_id
    LEFT JOIN rvtypes rvt
      ON r.result_value_type = rvt.result_value_type_id
    LEFT JOIN rspecs rs USING (result_speciation_id)
    LEFT JOIN protos pm ON r.protocol_method = pm.protocol_id
    LEFT JOIN labs lab ON r.laboratory = lab.lab_id
""")


def _samples_meta(spark: SparkSession, sf_dir: str, lang: str) -> DataFrame:
    from .operators.metadata import samples_metadata

    fx = _dmeta_fixture(spark, sf_dir)
    return samples_metadata(
        fx["samples"], fx["locations"], fx["sub_locations"],
        fx["media_types"], fx["collection_methods"], fx["sample_types"],
        fx["grade_types"], fx["approval_types"], fx["qualifier_types"],
        fx["organizations"], fx["datum_conversions_d"],
        fx["locations_projects"], fx["projects"],
        fx["locations_networks"], fx["networks"], lang=lang)


def _results_meta(spark: SparkSession, sf_dir: str, lang: str) -> DataFrame:
    from .operators.metadata import results_metadata

    fx = _dmeta_fixture(spark, sf_dir)
    sm = _samples_meta(spark, sf_dir, lang)
    return results_metadata(
        fx["results"], sm, fx["parameters"], fx["matrix_states"],
        fx["units"], fx["sample_fractions"], fx["result_types"],
        fx["result_conditions"], fx["result_value_types"],
        fx["result_speciations"], fx["protocols_methods"],
        fx["laboratories"], lang=lang)


def _join_arrays(df: DataFrame, cols: tuple) -> DataFrame:
    """Render the rollup arrays as sorted CSV strings (both engines
    sort, so the driver's value hash is order-insensitive)."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.array_join(F.col(f"`{c}`"), ","))
    return out


@register("samples_metadata_read", oracle=_dmeta_oracle_samples("en"))
def samples_metadata_read_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """discrete.samples_metadata_en (patch_43.R:171-293): the samples
    star with first-current datum elevation and project/network
    rollups."""
    return _join_arrays(_samples_meta(spark, sf_dir, "en"),
                        ("projects", "networks"))


@register("samples_metadata_fr", oracle=_dmeta_oracle_samples("fr"))
def samples_metadata_fr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """discrete.samples_metadata_fr (patch_43.R:294-418): the French
    twin — every bilingual dimension resolved COALESCE(x_fr, x), with
    NULL _fr fixture rows exercising the fallback."""
    return _join_arrays(_samples_meta(spark, sf_dir, "fr"),
                        ("projets", "réseaux"))


@register("results_metadata_read", oracle=_dmeta_oracle_results("en"))
def results_metadata_read_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """discrete.results_metadata_en (patch_43.R:419-528): results JOIN
    samples_metadata_en + result-side dims + get_parameter_unit_name
    units."""
    return _join_arrays(_results_meta(spark, sf_dir, "en"),
                        ("projects", "networks"))


@register("results_metadata_fr", oracle=_dmeta_oracle_results("fr"))
def results_metadata_fr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """discrete.results_metadata_fr (patch_43.R:529-652)."""
    return _join_arrays(_results_meta(spark, sf_dir, "fr"),
                        ("projets", "réseaux"))


# ---------------------------------------------------------------------------
# Real ranked-merge BPE tokenizer (functions/bpe.py): merge-table-exact
# token budgeting. JVM pre-tokenize + vocab-sized count, Arrow-batched
# encode of DISTINCT words only; the oracle replays the merge table as
# a chained replace over a pipe-separated symbol string (valid because
# the table is well-formed — see functions/bpe.py docstring).
# ---------------------------------------------------------------------------

def _bpe_oracle() -> str:
    from .functions.bpe import PRETOKEN_RE, oracle_replace_chain

    chain = oracle_replace_chain(
        "'|' || regexp_replace(w, '(.)', '\\1||', 'g')")
    return f"""
    WITH pre AS (
      SELECT unnest(regexp_extract_all(lower(text), '{PRETOKEN_RE}'))
               AS w
      FROM documents
    ), wc AS (
      SELECT w, count(*) AS cnt FROM pre GROUP BY 1
    ), enc AS (
      SELECT cnt, string_split(trim({chain}, '|'), '||') AS toks
      FROM wc
    )
    SELECT tok AS token, CAST(sum(cnt) AS BIGINT) AS n_occurrences
    FROM (SELECT cnt, unnest(toks) AS tok FROM enc)
    GROUP BY 1
"""


@register("bpe_tokenize_counts", oracle=_bpe_oracle())
def bpe_tokenize_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BPE token frequencies under the fixture merge table —
    the merge-table-exact replacement for text.bpe_token_count's
    regex estimate."""
    from .functions.bpe import bpe_token_frequencies

    docs = _t(spark, sf_dir, "documents")
    return bpe_token_frequencies(docs, "text")


# ---------------------------------------------------------------------------
# Per-language curation capstone (CCNet is per-language): language_id
# -> per-language unigram LMs (totals = keyed agg + broadcast, never a
# global window) -> own-language surprisal per doc -> a token-length
# quality gate -> per-language tercile buckets. Terciles come from a
# bounded 4096-bin histogram per language (the histogram_quantiles
# integer rank test: threshold bin = min bin with 3*cum >= k*n), NOT a
# per-language row_number window — the window here runs over <=4096
# bin rows per language regardless of corpus size, and the bucket
# assignment is a map-side broadcast join. Ties inside a bin stay in
# one bucket (CCNet buckets by perplexity VALUE thresholds, not rank).
# ---------------------------------------------------------------------------

_PER_LANG_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, toks,
             {_lang_filter_sql('de')} AS de,
             {_lang_filter_sql('en')} AS en,
             {_lang_filter_sql('es')} AS es,
             {_lang_filter_sql('fr')} AS fr
      FROM t
    ), langed AS (
      SELECT doc_id, toks,
             CASE
               WHEN greatest(de, en, es, fr) < 0.05 THEN 'und'
               WHEN de >= en AND de >= es AND de >= fr THEN 'de'
               WHEN en >= es AND en >= fr THEN 'en'
               WHEN es >= fr THEN 'es'
               ELSE 'fr'
             END AS lang
      FROM s
    ), ltok AS (
      SELECT doc_id, lang, unnest(toks) AS tok
      FROM langed WHERE lang != 'und'
    ), freq AS (
      SELECT lang, tok, count(*) AS cnt FROM ltok GROUP BY 1, 2
    ), tot AS (
      SELECT lang, sum(cnt) AS total FROM freq GROUP BY 1
    ), surp AS (
      SELECT lang, tok,
             CAST(floor(-ln(cnt / total) * 1000000 + 0.5) AS BIGINT) AS q
      FROM freq JOIN tot USING (lang)
    ), d AS (
      SELECT l.doc_id, l.lang, sum(q) AS sq, count(*) AS n
      FROM ltok l JOIN surp USING (lang, tok) GROUP BY 1, 2
    ), g AS (
      SELECT doc_id, lang,
             CAST(floor(sq / 1000000.0 / n * 1000000 + 0.5) AS BIGINT)
               AS mq
      FROM d WHERE n >= 5
    ), b AS (
      SELECT doc_id, lang, mq,
             least(mq * 4096 // 16000000, 4095) AS bin
      FROM g
    ), bc AS (
      SELECT lang, bin, count(*) AS c FROM b GROUP BY 1, 2
    ), cum AS (
      SELECT lang, bin,
             sum(c) OVER (PARTITION BY lang ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY lang) AS n
      FROM bc
    ), th AS (
      SELECT lang,
             min(CASE WHEN 3 * cum >= n THEN bin END) AS t1,
             min(CASE WHEN 3 * cum >= 2 * n THEN bin END) AS t2
      FROM cum GROUP BY 1
    )
    SELECT b.doc_id, b.lang, mq / 1000000.0 AS mean_surprisal,
           CASE WHEN bin <= t1 THEN 'head'
                WHEN bin <= t2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM b JOIN th USING (lang)
"""


@register("per_language_curation", oracle=_PER_LANG_ORACLE)
def per_language_curation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language CCNet-style curation: own-language LM surprisal,
    n_tokens >= 5 quality gate, per-language value-threshold terciles
    from a bounded histogram."""
    from .functions import text as X
    from .operators.dedup import per_language_unigram_surprisal

    docs = _t(spark, sf_dir, "documents")
    surp = per_language_unigram_surprisal(
        docs.where(X.lang_id_multi(F.col("text")) != "und"),
        X.lang_id_multi(F.col("text")))
    g = surp.where(F.col("n_tokens") >= 5).select(
        "doc_id", "lang",
        F.floor(F.col("mean_surprisal").cast("double") * 1e6 + F.lit(0.5))
        .cast("long").alias("mq"))
    b = g.withColumn(
        "bin", F.least(F.expr("mq * 4096 div 16000000"), F.lit(4095)))
    bc = b.groupBy("lang", "bin").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.partitionBy("lang").orderBy("bin") \
        .rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy("lang")
    cum = (bc.withColumn("cum", F.sum("c").over(wcum))
           .withColumn("n", F.sum("c").over(wn)))
    th = cum.groupBy("lang").agg(
        F.min(F.when(3 * F.col("cum") >= F.col("n"), F.col("bin")))
        .alias("t1"),
        F.min(F.when(3 * F.col("cum") >= 2 * F.col("n"), F.col("bin")))
        .alias("t2"))
    return (
        b.join(F.broadcast(th), "lang")
        .select(
            "doc_id", "lang",
            (F.col("mq") / F.lit(1e6)).alias("mean_surprisal"),
            F.when(F.col("bin") <= F.col("t1"), "head")
            .when(F.col("bin") <= F.col("t2"), "middle")
            .otherwise("tail").alias("bucket"),
        )
    )


# ---------------------------------------------------------------------------
# Distributed BPE TRAINING (functions/bpe.bpe_train): learn the merge
# table itself — per round one vocab-sized pair-count shuffle, a
# takeOrdered argmax (no single-partition exchange), a map-only
# literal replace, localCheckpoint lineage truncation. The oracle
# replays all rounds as chained CTEs (the kmeans-CTE idiom).
# ---------------------------------------------------------------------------

def _bpe_train_oracle(n: int) -> str:
    from .functions.bpe import PRETOKEN_RE, oracle_train_ctes

    return f"""
    WITH pre AS (
      SELECT unnest(regexp_extract_all(lower(text), '{PRETOKEN_RE}'))
               AS w
      FROM documents
    ), wc AS (
      SELECT w, count(*) AS cnt FROM pre GROUP BY 1
    ), {oracle_train_ctes(n)}
    SELECT CAST(rank AS INT) AS rank, a AS left_sym, b AS right_sym,
           a || b AS merged, CAST(c AS BIGINT) AS pair_count
    FROM merges
"""


_BPE_TRAIN_N = 8


@register("bpe_train_merges", oracle=_bpe_train_oracle(_BPE_TRAIN_N))
def bpe_train_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 8 learned BPE merges over the documents corpus
    (rank, pair, merged symbol, pair count at merge time)."""
    from .functions.bpe import bpe_train, word_counts

    docs = _t(spark, sf_dir, "documents")
    merges, _ = bpe_train(word_counts(docs), n_merges=_BPE_TRAIN_N)
    return spark.createDataFrame(
        [(r, a, b, a + b, c) for r, a, b, c in merges],
        "rank int, left_sym string, right_sym string, merged string,"
        " pair_count long")


def _bpe_vocab_oracle(n: int) -> str:
    from .functions.bpe import PRETOKEN_RE, oracle_train_ctes

    return f"""
    WITH pre AS (
      SELECT unnest(regexp_extract_all(lower(text), '{PRETOKEN_RE}'))
               AS w
      FROM documents
    ), wc AS (
      SELECT w, count(*) AS cnt FROM pre GROUP BY 1
    ), {oracle_train_ctes(n)}
    SELECT tok AS token, CAST(sum(cnt) AS BIGINT) AS n_occurrences
    FROM (SELECT cnt, unnest(string_split(trim(s, '|'), '||')) AS tok
          FROM w{n})
    GROUP BY 1
"""


@register("bpe_trained_vocab_tokens", oracle=_bpe_vocab_oracle(_BPE_TRAIN_N))
def bpe_trained_vocab_tokens_q(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Corpus token frequencies under the freshly TRAINED 8-merge
    table — the end-to-end train->encode pipeline (encodings fall out
    of the training loop's final symbol strings)."""
    from .functions.bpe import bpe_train, word_counts

    docs = _t(spark, sf_dir, "documents")
    _, final_words = bpe_train(word_counts(docs), n_merges=_BPE_TRAIN_N)
    syms = F.split(F.expr("trim(BOTH '|' FROM s)"), r"\|\|")
    return (
        final_words.select("cnt", F.explode(syms).alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").cast("long").alias("n_occurrences"))
    )


# ---------------------------------------------------------------------------
# URL canonicalization (operators/web.url_canonicalize): RFC 3986 §6.2
# syntax normalization as the crawl-frontier / dedup-key normalizer.
# Map-only codegen; the dot-segment removal is a higher-order string
# FOLD (F.aggregate <-> DuckDB list_reduce) — no UDF, no bounded-pass
# replace chains.
# ---------------------------------------------------------------------------

_URL_CANON_ORACLE = r"""
    WITH raw AS (
      SELECT c_custkey AS url_id,
             (CASE c_custkey % 3 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTP'
                   ELSE 'HttpS' END)
             || '://'
             || (CASE WHEN c_custkey % 11 = 0
                      THEN 'u' || CAST(c_custkey % 3 AS VARCHAR) || '@'
                      ELSE '' END)
             || 'Host' || CAST(c_custkey % 7 AS VARCHAR) || '.Example.COM'
             || (CASE c_custkey % 5 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
                      WHEN 2 THEN ':8080' WHEN 3 THEN '' ELSE ':80' END)
             || (CASE WHEN c_custkey % 13 = 0 THEN ''
                      ELSE CASE c_custkey % 6
                           WHEN 0 THEN '/a/./b/../c'
                           WHEN 1 THEN '/x/y/z/../../w'
                           WHEN 2 THEN '/../up'
                           WHEN 3 THEN '/a//b/.'
                           WHEN 4 THEN '/dots/..'
                           ELSE '/keep/me/' END END)
             || (CASE c_custkey % 4 WHEN 0 THEN '?b=2&a=1'
                      WHEN 1 THEN '' WHEN 2 THEN '?z=9&a=1&m=3'
                      ELSE '?single=1' END)
             || (CASE WHEN c_custkey % 2 = 0 THEN '#sec2' ELSE '' END)
               AS url
      FROM customer
    ), parsed AS (
      SELECT url_id, url,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
               AS scheme,
             regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1) AS auth,
             regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1)
               AS rawpath,
             regexp_extract(url, '\?([^#]*)', 1) AS query
      FROM raw
    ), comps AS (
      SELECT url_id, scheme, rawpath, query,
             regexp_extract(auth, '^([^@]*)@', 1) AS userinfo,
             lower(regexp_extract(regexp_replace(auth, '^[^@]*@', ''),
                                  '^([^:]*)', 1)) AS host,
             regexp_extract(regexp_replace(auth, '^[^@]*@', ''),
                            ':([0-9]+)$', 1) AS port
      FROM parsed
    ), norm AS (
      SELECT url_id, scheme, host, userinfo, query, rawpath,
             CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                       OR (scheme = 'https' AND port = '443')
                  THEN '' ELSE ':' || port END AS port_keep,
             list_reduce(
               string_split('/' || regexp_replace(rawpath, '^/', ''), '/'),
               (acc, x) -> CASE WHEN x = '' OR x = '.' THEN acc
                                WHEN x = '..'
                                  THEN regexp_replace(acc, '/[^/]*$', '')
                                ELSE acc || '/' || x END) AS folded,
             (regexp_matches(rawpath, '(/|/\.|/\.\.)$') OR rawpath = '')
               AS keep_slash,
             array_to_string(list_sort(string_split(query, '&')), '&')
               AS qsorted
      FROM comps
    )
    SELECT url_id, scheme, host, port_keep AS port,
           CASE WHEN folded = '' THEN '/'
                ELSE folded || CASE WHEN keep_slash THEN '/' ELSE '' END
           END AS path,
           qsorted AS query,
           scheme || '://'
           || CASE WHEN userinfo = '' THEN '' ELSE userinfo || '@' END
           || host || port_keep
           || CASE WHEN folded = '' THEN '/'
                   ELSE folded || CASE WHEN keep_slash THEN '/' ELSE '' END
              END
           || CASE WHEN qsorted = '' THEN '' ELSE '?' || qsorted END
             AS canonical_url
    FROM norm
"""


@register("url_canonicalization", oracle=_URL_CANON_ORACLE)
def url_canonicalization_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize deterministically-messy URLs (mixed-case schemes
    and hosts, default and non-default ports, userinfo, dot-segments,
    empty segments, trailing-slash cases, unsorted queries,
    fragments)."""
    from .operators.web import url_canonicalize

    k = F.col("c_custkey")
    url = F.concat(
        F.when(k % 3 == 0, "http").when(k % 3 == 1, "HTTP")
        .otherwise("HttpS"),
        F.lit("://"),
        F.when(k % 11 == 0,
               F.concat(F.lit("u"), (k % 3).cast("string"), F.lit("@")))
        .otherwise(""),
        F.lit("Host"), (k % 7).cast("string"), F.lit(".Example.COM"),
        F.when(k % 5 == 0, ":80").when(k % 5 == 1, ":443")
        .when(k % 5 == 2, ":8080").when(k % 5 == 3, "")
        .otherwise(":80"),
        F.when(k % 13 == 0, "").otherwise(
            F.when(k % 6 == 0, "/a/./b/../c")
            .when(k % 6 == 1, "/x/y/z/../../w")
            .when(k % 6 == 2, "/../up")
            .when(k % 6 == 3, "/a//b/.")
            .when(k % 6 == 4, "/dots/..")
            .otherwise("/keep/me/")),
        F.when(k % 4 == 0, "?b=2&a=1").when(k % 4 == 1, "")
        .when(k % 4 == 2, "?z=9&a=1&m=3").otherwise("?single=1"),
        F.when(k % 2 == 0, "#sec2").otherwise(""),
    )
    urls = _t(spark, sf_dir, "customer").select(
        k.alias("url_id"), url.alias("url"))
    out = url_canonicalize(urls, "url")
    return out.select("url_id", "scheme", "host", "port", "path",
                      "query", "canonical_url")


# ---------------------------------------------------------------------------
# Ordered funnel (operators/funnel.funnel_steps): first-match greedy
# view -> click -> purchase chain with a 72h per-step window — chained
# conditional min-aggregations on user_id, no per-user sort window.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
    WITH e AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), s1 AS (
      SELECT user_id, min(ts) AS t1 FROM e
      WHERE event_type = 'view' GROUP BY 1
    ), s2 AS (
      SELECT e.user_id, min(ts) AS t2 FROM e JOIN s1 USING (user_id)
      WHERE event_type = 'click' AND ts > t1
        AND ts <= t1 + INTERVAL 72 HOUR
      GROUP BY 1
    ), s3 AS (
      SELECT e.user_id, min(ts) AS t3 FROM e JOIN s2 USING (user_id)
      WHERE event_type = 'purchase' AND ts > t2
        AND ts <= t2 + INTERVAL 72 HOUR
      GROUP BY 1
    )
    SELECT s1.user_id, t1, t2, t3,
           CAST(1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS INT)
             AS steps_completed
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""


@register("event_funnel", oracle=_FUNNEL_ORACLE)
def event_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel, 72h conversion window per
    step, first-match greedy semantics."""
    from .operators.funnel import funnel_steps

    ev = _t(spark, sf_dir, "events")
    return funnel_steps(ev, ["view", "click", "purchase"],
                        max_gap_hours=72)


# ---------------------------------------------------------------------------
# Int8 scalar quantization (operators/similarity.int8_quantize_stats):
# the vector-DB storage codec — per-dim absmax scales (one partial-
# aggregable posexplode max, dim-row collect = the centroid idiom),
# then map-only quantize/reconstruct with exact pico-unit error sums.
# ---------------------------------------------------------------------------

_INT8_ORACLE = """
    WITH c AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), pos AS (
      SELECT unnest(generate_series(1, 64)) AS i
    ), sc AS (
      SELECT i, greatest(max(abs(v[i])), CAST(1e-12 AS DOUBLE)) AS s
      FROM c, pos GROUP BY i
    ), q AS (
      SELECT vec_id, i,
             floor(v[i] / s * 127 + CAST(0.5 AS DOUBLE)) AS raw,
             s, v[i] AS x
      FROM c, pos JOIN sc USING (i)
    ), coded AS (
      SELECT vec_id, i, s, x,
             least(greatest(raw, -127), 127) AS code,
             (raw > 127 OR raw < -127) AS clipped
      FROM q
    )
    SELECT vec_id,
           CAST(sum(CAST(code AS BIGINT) * i) AS BIGINT) AS code_psum,
           CAST(sum(CASE WHEN clipped THEN 1 ELSE 0 END) AS INT)
             AS n_clipped,
           sum(CAST(floor((x - code * s / 127)
                          * (x - code * s / 127) * 1e12
                          + CAST(0.5 AS DOUBLE)) AS BIGINT))
             / CAST(1e12 AS DOUBLE) / CAST(64 AS DOUBLE) AS mse
    FROM coded GROUP BY 1
"""


@register("embedding_int8_quantization", oracle=_INT8_ORACLE)
def embedding_int8_quantization_q(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Symmetric-absmax int8 quantization of the embeddings corpus:
    positional code checksum, clip count, exact reconstruction MSE."""
    from .operators.similarity import int8_quantize_stats, int8_scales

    emb = _t(spark, sf_dir, "embeddings")
    scales = int8_scales(emb, dim=64)
    return int8_quantize_stats(emb, scales)


# ---------------------------------------------------------------------------
# HLL set algebra (operators/sketch.hll_merge): union by register-wise
# max — the merge property — and intersection by inclusion-exclusion,
# WITHOUT rescanning either side. The distinct-token overlap between
# two sources from three bounded sketches.
# ---------------------------------------------------------------------------

def _hll_est_sql(tag: str, src_filter: str) -> str:
    a = _HLL_ALPHA
    return f"""
    tok_{tag} AS (
      SELECT unnest(string_split(lower(text), ' ')) AS tokk
      FROM documents WHERE {src_filter}
    ), regs_{tag} AS (
      SELECT hh % 256 AS idx,
             max(CASE WHEN hh // 256 > 0
                      THEN 52 - (length(bin(hh // 256)) - 1)
                      ELSE 53 END) AS m
      FROM (SELECT CAST('0x' || substr(md5(tokk), 1, 15) AS BIGINT) AS hh
            FROM tok_{tag})
      GROUP BY 1
    ), est_{tag} AS (
      SELECT CASE WHEN CAST({a!r} AS DOUBLE) * 256.0 * 256.0
                       * 9007199254740992.0 / s_units <= 640.0
                       AND zeros > 0
                  THEN 256.0 * ln(CAST(256 AS DOUBLE) / zeros)
                  ELSE CAST({a!r} AS DOUBLE) * 256.0 * 256.0
                       * 9007199254740992.0 / s_units END AS est
      FROM (SELECT 256 - count(*) AS zeros,
                   sum(CAST(1 AS BIGINT) << (53 - m))
                     + (256 - count(*)) * (CAST(1 AS BIGINT) << 53)
                     AS s_units
            FROM regs_{tag})
    )"""


_HLL_IX_ORACLE = f"""
    WITH {_hll_est_sql('a', "source = 'src0'")},
    {_hll_est_sql('b', "source = 'src1'")},
    {_hll_est_sql('u', "source IN ('src0', 'src1')")}
    SELECT {R('a.est', 6)} AS est_a, {R('b.est', 6)} AS est_b,
           {R('u.est', 6)} AS est_union,
           {R('a.est + b.est - u.est', 6)} AS est_intersection
    FROM est_a a, est_b b, est_u u
"""


@register("hll_token_intersection", oracle=_HLL_IX_ORACLE)
def hll_token_intersection_q(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Distinct-token overlap between src0 and src1 via HLL
    inclusion-exclusion; the union sketch is a register-wise MERGE of
    the two per-source sketches (never a rescan)."""
    from .functions.text import tokens
    from .operators.sketch import hll_finalize, hll_merge, hll_registers

    docs = _t(spark, sf_dir, "documents")

    def regs_of(src):
        tok = docs.where(F.col("source") == src).select(
            F.explode(tokens(F.lower(F.col("text")))).alias("tokk"))
        return hll_registers(tok, "tokk", [], 8)

    ra, rb = regs_of("src0"), regs_of("src1")
    ea = hll_finalize(ra, [], 8).select(F.col("estimate").alias("est_a"))
    eb = hll_finalize(rb, [], 8).select(F.col("estimate").alias("est_b"))
    eu = hll_finalize(hll_merge(ra, rb), [], 8).select(
        F.col("estimate").alias("est_union"))
    out = (
        ea.crossJoin(F.broadcast(eb)).crossJoin(F.broadcast(eu))
        .withColumn("est_intersection",
                    F.col("est_a") + F.col("est_b") - F.col("est_union"))
    )
    return _round(out, {"est_a": 6, "est_b": 6, "est_union": 6,
                        "est_intersection": 6})


# ---------------------------------------------------------------------------
# Temperature-scaled mixture sampling (operators/packing.
# temperature_mixture_sample): multilingual-LM rebalancing with
# alpha=0.5 (sqrt is IEEE-correctly-rounded on both engines; pow(x,
# 0.3) is not guaranteed to be) and an exact micro-unit normalizer.
# ---------------------------------------------------------------------------

_TEMP_MIX_ORACLE = f"""
    WITH docs AS (
      SELECT doc_id, source AS domain,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), tot AS (
      SELECT domain, sum(n_tokens) AS n,
             CAST(floor(sqrt(CAST(sum(n_tokens) AS DOUBLE))
                        * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS squ
      FROM docs GROUP BY 1
    ), norm AS (
      SELECT sum(squ) AS ssum, sum(n) AS grand FROM tot
    ), rates AS (
      SELECT domain,
             squ / CAST(ssum AS DOUBLE) AS q,
             least(CAST(1 AS DOUBLE),
                   squ / CAST(ssum AS DOUBLE)
                   * floor(CAST(0.5 AS DOUBLE) * grand)
                   / CAST(n AS DOUBLE)) AS keep_frac
      FROM tot, norm
    )
    SELECT d.doc_id, d.domain, d.n_tokens,
           {R('r.q', 6)} AS q, {R('r.keep_frac', 6)} AS keep_frac,
           (CAST('0x' || substr(md5('temp-v1|' || CAST(d.doc_id AS VARCHAR)),
                                1, 12) AS BIGINT)
            / CAST(281474976710656 AS DOUBLE)) < r.keep_frac AS kept
    FROM docs d JOIN rates r USING (domain)
"""


@register("temperature_mixture_sample", oracle=_TEMP_MIX_ORACLE)
def temperature_mixture_sample_q(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """sqrt-temperature rebalancing of the 20 document sources at a
    50% token budget — small sources up-weighted toward uniform."""
    from .operators.packing import temperature_mixture_sample

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("source").alias("domain"),
        F.size(F.split(F.col("text"), " ")).cast("long")
        .alias("n_tokens"))
    out = temperature_mixture_sample(docs, budget_frac=0.5)
    return _round(
        out.select("doc_id", "domain", "n_tokens", "q", "keep_frac",
                   "kept"),
        {"q": 6, "keep_frac": 6})


# ---------------------------------------------------------------------------
# Incremental PageRank (operators/graph.host_pagerank warm start): the
# change-feed maintenance story — after an edge delta, seed the power
# iteration from the previous ranks and run a SHORT refresh instead of
# a cold full count. Integer arithmetic keeps the warm trajectory
# bit-replayable; the oracle chains a 5-iteration base run and a
# 2-iteration warm run over the delta graph (new nodes seed PR_UNIT).
# ---------------------------------------------------------------------------

def _incr_pagerank_oracle() -> str:
    return f"""
    WITH e AS (
      SELECT DISTINCT o_custkey % 50 AS src, o_orderkey % 60 AS dst
      FROM orders
    ), {_pr_cte_chain(5)},
    e2 AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM e
        UNION ALL
        SELECT o_custkey % 45 + 5, o_orderkey % 71 FROM orders)
    ), {_pr_cte_chain(2, e="e2", pfx="w", init_join="pr5")}
    SELECT node, CAST(pr AS BIGINT) AS rank_units,
           CAST(pr AS BIGINT) / 1000000000.0 AS rank
    FROM prw2
"""


@register("incremental_pagerank", oracle=_incr_pagerank_oracle())
def incremental_pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warm-start PageRank refresh: 5 cold iterations on the base
    graph, then an edge delta (new links + 11 new nodes) absorbed
    with only 2 warm iterations."""
    from .operators.graph import host_pagerank

    o = _t(spark, sf_dir, "orders")
    e0 = o.select(
        (F.col("o_custkey") % 50).alias("src"),
        (F.col("o_orderkey") % 60).alias("dst"),
    ).distinct()
    delta = o.select(
        (F.col("o_custkey") % 45 + 5).alias("src"),
        (F.col("o_orderkey") % 71).alias("dst"),
    )
    e1 = e0.unionByName(delta).distinct()
    base = host_pagerank(e0, iterations=5)
    return host_pagerank(
        e1, iterations=2,
        initial_ranks=base.select("node", "rank_units"))


# ---------------------------------------------------------------------------
# Mann-Kendall trend + Sen's slope (operators/trend.mann_kendall): the
# standard hydrologic trend test over per-(priority, year) daily
# maxima. Pairwise self-join keyed per series-year — pair mass bounded
# at (days/year choose 2) per group by construction. Integer sign/tie
# arithmetic; Var/Z closed form and the interpolated slope median are
# the only float math.
# ---------------------------------------------------------------------------

_MK_ORACLE = """
    WITH daily AS (
      SELECT o_orderpriority AS series,
             CAST(year(o_orderdate) AS INT) AS yr,
             o_orderdate AS d,
             max(o_totalprice) AS v
      FROM orders GROUP BY 1, 2, 3
    ), q AS (
      SELECT series, yr,
             datediff('day', DATE '1970-01-01', d) AS t,
             CAST(floor(CAST(v AS DOUBLE) * 1000000
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS vq
      FROM daily
    ), pairs AS (
      SELECT a.series, a.yr,
             CASE WHEN b.vq > a.vq THEN 1
                  WHEN b.vq < a.vq THEN -1 ELSE 0 END AS sgn,
             CAST(b.vq - a.vq AS DOUBLE) / CAST(1e6 AS DOUBLE)
               / (b.t - a.t) AS slope
      FROM q a JOIN q b ON b.series = a.series AND b.yr = a.yr
                        AND b.t > a.t
    ), st AS (
      SELECT series, yr, CAST(sum(sgn) AS BIGINT) AS s_stat,
             quantile_cont(slope, 0.5) AS sen_slope
      FROM pairs GROUP BY 1, 2
    ), nd AS (
      SELECT series, yr, count(*) AS n FROM q GROUP BY 1, 2
    ), ties AS (
      SELECT series, yr,
             sum(c * (c - 1) * (2 * c + 5)) AS tiesum
      FROM (SELECT series, yr, vq, count(*) AS c
            FROM q GROUP BY 1, 2, 3)
      GROUP BY 1, 2
    ), fin AS (
      SELECT st.series, st.yr, nd.n, st.s_stat, st.sen_slope,
             CAST(nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tiesum
                  AS DOUBLE) / CAST(18 AS DOUBLE) AS var_s
      FROM st JOIN nd USING (series, yr) JOIN ties USING (series, yr)
      WHERE nd.n >= 2
    )
    SELECT series, yr, CAST(n AS BIGINT) AS n_days, s_stat,
           {vr} AS var_s,
           {zz} AS z,
           {sen} AS sen_slope
    FROM fin
""".format(
    vr=R("var_s", 6),
    zz=R("""CASE WHEN var_s > 0 THEN
              CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                   WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                   ELSE CAST(0 AS DOUBLE) END
            END""", 6),
    sen=R("sen_slope", 6),
)


@register("mann_kendall_trend", oracle=_MK_ORACLE)
def mann_kendall_trend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(order priority, year) Mann-Kendall S/Var/Z + Sen slope
    over daily maximum order totals."""
    from .operators.trend import mann_kendall

    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.col("o_orderdate").alias("date"),
    ).agg(F.max("o_totalprice").alias("value"))
    out = mann_kendall(daily, ["series", "yr"], "date", "value") \
        .select("series", "yr", "n_days", "s_stat", "var_s", "z",
                "sen_slope")
    return _round(out, {"var_s": 6, "z": 6, "sen_slope": 6})


# ---------------------------------------------------------------------------
# Quality-aware canonical selection: keep the HIGHEST-QUALITY member
# of each near-dup cluster (not the min-id one) — the curation upgrade
# over dedup_clusters' arbitrary representative. Rank key is the
# 1e-6-quantized composite quality (exact on both engines), doc_id
# tiebreak; the per-cluster window is bounded by the LSH cluster size.
# ---------------------------------------------------------------------------

_BEST_CLUSTER_ORACLE = _COMP_SQL + f"""
    , qm AS (
      SELECT doc_id,
             string_split(lower(text), ' ') AS ltoks,
             length(text) AS nch,
             length(text) - length(regexp_replace(text,
               '[^a-zA-Z0-9 ]', '', 'g')) AS np
      FROM documents
    ), qr AS (
      SELECT doc_id,
             CAST(np AS DOUBLE) / greatest(nch, 1) AS punct_ratio,
             CAST(len(list_filter(ltoks, t -> t IN
               ('the','a','an','and','or','of','to','in','is','it',
                'that','for','on','with','as','are','was','at','by','be')))
               AS DOUBLE) / greatest(len(ltoks), 1) AS stopword_ratio,
             nch
      FROM qm
    ), qual AS (
      SELECT doc_id,
             {R('(least(nch / 200.0, 1.0)'
                ' + least(stopword_ratio * 5.0, 1.0)'
                ' + (1.0 - least(punct_ratio * 4.0, 1.0))) / 3.0', 6)}
               AS quality
      FROM qr
    ), sized AS (
      SELECT node AS doc_id, cluster_rep,
             count(*) OVER (PARTITION BY cluster_rep) AS cluster_size
      FROM comp
    ), ranked AS (
      SELECT s.doc_id, s.cluster_rep, s.cluster_size, q.quality,
             row_number() OVER (PARTITION BY s.cluster_rep
                                ORDER BY q.quality DESC, s.doc_id ASC)
               AS rn
      FROM sized s JOIN qual q USING (doc_id)
    )
    SELECT doc_id, cluster_rep,
           CAST(cluster_size AS BIGINT) AS cluster_size, quality,
           (rn = 1) AS is_canonical
    FROM ranked
"""


@register("dedup_best_of_cluster", oracle=_BEST_CLUSTER_ORACLE)
def dedup_best_of_cluster_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters with the highest-quality member marked
    canonical (quality-aware representative selection)."""
    from .functions.text import quality_score
    from .operators.dedup import (
        duplicate_clusters,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, num_hashes=8, shingle_k=3)
    pairs = lsh_candidate_pairs(sig, num_hashes=8, bands=4)
    clusters = duplicate_clusters(pairs, docs.select("doc_id"))
    qual = docs.select(
        "doc_id",
        (F.floor(quality_score(F.col("text")) * 1e6 + F.lit(0.5)) / 1e6)
        .alias("quality"))
    w = Window.partitionBy("cluster_rep").orderBy(
        F.desc("quality"), F.asc("doc_id"))
    return (
        clusters.join(qual, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", "cluster_rep", "cluster_size", "quality",
                (F.col("rn") == 1).alias("is_canonical"))
    )


# ---------------------------------------------------------------------------
# Code-data quality filters (The Stack / StarCoder family): line-length
# profile, alphanumeric and alphabetic-token fractions, digit fraction,
# markup density, auto-generated-marker detection, and the composite
# keep gate. Map-only codegen; the fixture deterministically mutates a
# slice of the documents (injected newlines + hex dumps, markup, and
# AUTO-GENERATED headers) so every gate fires both ways.
# ---------------------------------------------------------------------------

_CODE_FILTERS_ORACLE = f"""
    WITH mut AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 11 = 0
                   THEN 'AUTO-GENERATED do not edit' || chr(10) ELSE ''
              END)
             || text
             || (CASE WHEN doc_id % 7 = 0
                      THEN chr(10) || '<div><span>'
                           || repeat('0xDEADBEEF4242 ', 40)
                      ELSE '' END) AS t
      FROM documents
    ), m AS (
      SELECT doc_id, t,
             string_split(t, chr(10)) AS lines,
             string_split(t, ' ') AS toks,
             length(t) AS nch
      FROM mut
    ), r AS (
      SELECT doc_id,
             list_max(list_transform(lines, l -> length(l)))
               AS max_line_len,
             CAST(list_sum(list_transform(lines, l -> length(l)))
                  AS DOUBLE) / len(lines) AS mean_line_len,
             CAST(length(regexp_replace(t, '[^A-Za-z0-9]', '', 'g'))
                  AS DOUBLE) / greatest(nch, 1) AS alnum_frac,
             CAST(len(list_filter(toks,
                                  x -> regexp_matches(x, '[A-Za-z]')))
                  AS DOUBLE) / greatest(len(toks), 1) AS alpha_tok_frac,
             CAST(length(regexp_replace(t, '[^0-9]', '', 'g'))
                  AS DOUBLE) / greatest(nch, 1) AS digit_frac,
             CAST(nch - length(replace(t, '<', '')) AS DOUBLE)
               / greatest(nch, 1) AS tag_density,
             (lower(t) LIKE '%auto-generated%'
              OR lower(t) LIKE '%do not edit%') AS autogen
      FROM m
    )
    SELECT doc_id, CAST(max_line_len AS BIGINT) AS max_line_len,
           {R('mean_line_len', 6)} AS mean_line_len,
           {R('alnum_frac', 6)} AS alnum_frac,
           {R('alpha_tok_frac', 6)} AS alpha_tok_frac,
           {R('digit_frac', 6)} AS digit_frac,
           {R('tag_density', 6)} AS tag_density,
           autogen,
           (max_line_len <= 600 AND alnum_frac >= 0.25
            AND alpha_tok_frac >= 0.25 AND digit_frac <= 0.3
            AND tag_density <= 0.01 AND NOT autogen) AS kept
    FROM r
"""


@register("code_quality_filters", oracle=_CODE_FILTERS_ORACLE)
def code_quality_filters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Stack-style source-file gates over deterministically
    mutated documents."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    t = F.concat(
        F.when(d % 11 == 0, "AUTO-GENERATED do not edit\n").otherwise(""),
        F.col("text"),
        F.when(d % 7 == 0,
               F.concat(F.lit("\n<div><span>"),
                        F.repeat(F.lit("0xDEADBEEF4242 "), 40)))
        .otherwise(""),
    )
    lines = F.split(t, "\n")
    toks = F.split(t, " ")
    nch = F.length(t)
    line_lens = F.transform(lines, lambda line: F.length(line))
    sum_lines = F.aggregate(line_lens, F.lit(0),
                            lambda acc, x: acc + x)
    out = docs.select(
        "doc_id",
        F.array_max(line_lens).cast("long").alias("max_line_len"),
        (sum_lines.cast("double") / F.size(lines)).alias("mean_line_len"),
        (F.length(F.regexp_replace(t, "[^A-Za-z0-9]", "")).cast("double")
         / F.greatest(nch, F.lit(1))).alias("alnum_frac"),
        (F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
         .cast("double") / F.greatest(F.size(toks), F.lit(1)))
        .alias("alpha_tok_frac"),
        (F.length(F.regexp_replace(t, "[^0-9]", "")).cast("double")
         / F.greatest(nch, F.lit(1))).alias("digit_frac"),
        ((nch - F.length(F.replace(t, F.lit("<"), F.lit(""))))
         .cast("double") / F.greatest(nch, F.lit(1)))
        .alias("tag_density"),
        (F.lower(t).contains("auto-generated")
         | F.lower(t).contains("do not edit")).alias("autogen"),
    )
    out = out.withColumn(
        "kept",
        (F.col("max_line_len") <= 600) & (F.col("alnum_frac") >= 0.25)
        & (F.col("alpha_tok_frac") >= 0.25) & (F.col("digit_frac") <= 0.3)
        & (F.col("tag_density") <= 0.01) & ~F.col("autogen"))
    return _round(out, {"mean_line_len": 6, "alnum_frac": 6,
                        "alpha_tok_frac": 6, "digit_frac": 6,
                        "tag_density": 6})


# ---------------------------------------------------------------------------
# Canonical-URL dedup: the reason canonicalization exists — URL
# aliases (case, default ports, dot-segments, query order, fragments)
# collapse to one canonical form; keep the lowest doc_id per form.
# Composes url_canonicalize with the exact-dedup keep rule.
# ---------------------------------------------------------------------------

_CANON_DEDUP_ORACLE = r"""
    WITH raw AS (
      SELECT o_orderkey AS doc_id,
             (CASE o_orderkey % 2 WHEN 0 THEN 'http' ELSE 'HTTP' END)
             || '://' ||
             (CASE o_orderkey % 3 WHEN 0 THEN 'site' ELSE 'SITE' END)
             || CAST(o_orderkey % 40 AS VARCHAR) || '.example.com'
             || (CASE o_orderkey % 4 WHEN 0 THEN ':80' ELSE '' END)
             || '/p/' || CAST(o_orderkey % 25 AS VARCHAR)
             || (CASE o_orderkey % 5 WHEN 0 THEN '/x/../' ELSE '/' END)
             || (CASE o_orderkey % 6 WHEN 0 THEN '?b=1&a=2'
                      WHEN 1 THEN '?a=2&b=1' ELSE '' END)
             || (CASE o_orderkey % 7 WHEN 0 THEN '#frag' ELSE '' END)
               AS url
      FROM orders
    ), parsed AS (
      SELECT doc_id,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
               AS scheme,
             lower(regexp_extract(
               regexp_replace(
                 regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1),
                 '^[^@]*@', ''), '^([^:]*)', 1)) AS host,
             regexp_extract(
               regexp_replace(
                 regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1),
                 '^[^@]*@', ''), ':([0-9]+)$', 1) AS port,
             regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1)
               AS rawpath,
             regexp_extract(url, '\?([^#]*)', 1) AS query
      FROM raw
    ), norm AS (
      SELECT doc_id, scheme, host,
             CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                       OR (scheme = 'https' AND port = '443')
                  THEN '' ELSE ':' || port END AS port_keep,
             list_reduce(
               string_split('/' || regexp_replace(rawpath, '^/', ''), '/'),
               (acc, x) -> CASE WHEN x = '' OR x = '.' THEN acc
                                WHEN x = '..'
                                  THEN regexp_replace(acc, '/[^/]*$', '')
                                ELSE acc || '/' || x END) AS folded,
             (regexp_matches(rawpath, '(/|/\.|/\.\.)$') OR rawpath = '')
               AS keep_slash,
             array_to_string(list_sort(string_split(query, '&')), '&')
               AS qsorted
      FROM parsed
    ), canon AS (
      SELECT doc_id,
             scheme || '://' || host || port_keep
             || CASE WHEN folded = '' THEN '/'
                     ELSE folded
                          || CASE WHEN keep_slash THEN '/' ELSE '' END
                END
             || CASE WHEN qsorted = '' THEN '' ELSE '?' || qsorted END
               AS canonical_url
      FROM norm
    )
    SELECT doc_id, canonical_url,
           (doc_id = min(doc_id) OVER (PARTITION BY canonical_url))
             AS is_canonical,
           count(*) OVER (PARTITION BY canonical_url) AS n_aliases
    FROM canon
"""


@register("canonical_url_dedup", oracle=_CANON_DEDUP_ORACLE)
def canonical_url_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias-heavy URL corpus deduplicated on the canonical form
    (lowest doc_id kept per form)."""
    from .operators.web import url_canonicalize

    k = F.col("o_orderkey")
    url = F.concat(
        F.when(k % 2 == 0, "http").otherwise("HTTP"), F.lit("://"),
        F.when(k % 3 == 0, "site").otherwise("SITE"),
        (k % 40).cast("string"), F.lit(".example.com"),
        F.when(k % 4 == 0, ":80").otherwise(""),
        F.lit("/p/"), (k % 25).cast("string"),
        F.when(k % 5 == 0, "/x/../").otherwise("/"),
        F.when(k % 6 == 0, "?b=1&a=2").when(k % 6 == 1, "?a=2&b=1")
        .otherwise(""),
        F.when(k % 7 == 0, "#frag").otherwise(""),
    )
    urls = _t(spark, sf_dir, "orders").select(
        k.alias("doc_id"), url.alias("url"))
    canon = url_canonicalize(urls, "url")
    w = Window.partitionBy("canonical_url")
    return canon.select(
        "doc_id", "canonical_url",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
        F.count(F.lit(1)).over(w).alias("n_aliases"),
    )


# ---------------------------------------------------------------------------
# Rating curves (operators/rating.apply_rating_curves): the
# continuous.rating_curves / _points / _shifts tables (patch_3.R:329,
# patch_11.R:126, patch_40.R:286-288) applied: version selection by
# validity period, period-scoped stage shifts, log-log interpolation
# between curve points. Catalog-sized dims broadcast; map-only array
# bracketing; ln/exp parity pinned by tests/test_rating.py.
# ---------------------------------------------------------------------------

_RATING_ORACLE = f"""
    WITH m AS (
      SELECT event_id, event_type AS series, CAST(ts AS TIMESTAMP) AS ts,
             value AS stage
      FROM events
    ), et AS (
      SELECT DISTINCT event_type AS series FROM events
    ), curves AS (
      SELECT series, ascii(series) * 2 + ver AS curve_id, ver,
             CASE ver WHEN 1 THEN TIMESTAMP '2024-01-05 00:00:00'
                  ELSE TIMESTAMP '2024-01-15 00:00:00' END AS c0,
             CASE ver WHEN 1 THEN TIMESTAMP '2024-01-15 00:00:00'
                  ELSE TIMESTAMP '2025-01-01 00:00:00' END AS c1
      FROM et CROSS JOIN (SELECT unnest([1, 2]) AS ver) v
    ), pts AS (
      SELECT curve_id, CAST(stage AS DOUBLE) AS stage,
             {R('CAST(ascii(series) % 7 + ver + 2 AS DOUBLE)'
                ' * CAST(stage AS DOUBLE) * sqrt(CAST(stage AS DOUBLE))',
                3)} AS discharge
      FROM curves CROSS JOIN (
        SELECT unnest([10, 25, 50, 100, 150, 250]) AS stage) s
    ), shifts AS (
      SELECT series, TIMESTAMP '2024-01-10 00:00:00' AS s0,
             TIMESTAMP '2024-01-20 00:00:00' AS s1,
             CAST(ascii(series) % 3 AS DOUBLE) * CAST(2.5 AS DOUBLE)
               AS shift
      FROM et
    ), sel AS (
      SELECT m.*, c.curve_id
      FROM m LEFT JOIN curves c
        ON c.series = m.series AND m.ts >= c.c0 AND m.ts < c.c1
    ), sh AS (
      SELECT sel.*,
             coalesce(s.shift, CAST(0 AS DOUBLE)) AS shift,
             sel.stage + coalesce(s.shift, CAST(0 AS DOUBLE)) AS adj
      FROM sel LEFT JOIN shifts s
        ON s.series = sel.series AND sel.ts >= s.s0 AND sel.ts < s.s1
    ), low AS (
      SELECT e.event_id, max(p.stage) AS s1, arg_max(p.discharge, p.stage)
               AS d1
      FROM sh e JOIN pts p ON p.curve_id = e.curve_id
                           AND p.stage <= e.adj
      GROUP BY 1
    ), up AS (
      SELECT e.event_id, min(p.stage) AS s2, arg_min(p.discharge, p.stage)
               AS d2
      FROM sh e JOIN pts p ON p.curve_id = e.curve_id AND p.stage > e.adj
      GROUP BY 1
    ), fin AS (
      SELECT sh.event_id, sh.series, sh.stage, sh.shift,
             sh.adj AS adjusted_stage, sh.curve_id,
             CASE WHEN sh.curve_id IS NULL THEN NULL
                  WHEN low.s1 = sh.adj THEN low.d1
                  WHEN low.s1 IS NOT NULL AND up.s2 IS NOT NULL THEN
                    exp(ln(low.d1)
                        + (ln(sh.adj) - ln(low.s1))
                          / (ln(up.s2) - ln(low.s1))
                          * (ln(up.d2) - ln(low.d1)))
             END AS discharge,
             (sh.curve_id IS NOT NULL
              AND ((low.s1 IS NOT NULL AND low.s1 = sh.adj)
                   OR (low.s1 IS NOT NULL AND up.s2 IS NOT NULL)))
               AS in_range
      FROM sh LEFT JOIN low USING (event_id) LEFT JOIN up USING (event_id)
    )
    SELECT event_id, series, stage, shift, adjusted_stage, curve_id,
           {R('discharge', 6)} AS discharge, in_range
    FROM fin
"""


@register("rating_curve_discharge", oracle=_RATING_ORACLE)
def rating_curve_discharge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage series converted to discharge through versioned rating
    curves with period shifts (exact-point, interpolated, below-range,
    and pre-curve rows all present in the fixture window)."""
    from .operators.rating import apply_rating_curves

    ev = _t(spark, sf_dir, "events")
    meas = ev.select("event_id", F.col("event_type").alias("series"),
                     "ts", F.col("value").alias("stage"))
    et = ev.select(F.col("event_type").alias("series")).distinct()
    a = F.ascii(F.col("series"))
    ver = F.col("ver")
    curves = et.crossJoin(
        _ldf(spark, [(1,), (2,)], "ver int")).select(
        "series", (a * 2 + ver).alias("curve_id"), "ver",
        F.when(ver == 1, "2024-01-05 00:00:00")
        .otherwise("2024-01-15 00:00:00").cast("timestamp")
        .alias("start_dt"),
        F.when(ver == 1, "2024-01-15 00:00:00")
        .otherwise("2025-01-01 00:00:00").cast("timestamp")
        .alias("end_dt"),
    )
    st = F.col("stage")
    points = curves.crossJoin(
        _ldf(spark, [(10,), (25,), (50,), (100,), (150,), (250,)],
             "stage int")).select(
        "curve_id",
        st.cast("double").alias("stage"),
        (F.floor((a % 7 + ver + 2).cast("double")
                 * st.cast("double") * F.sqrt(st.cast("double"))
                 * 1000 + F.lit(0.5)) / 1000).alias("discharge"),
    )
    shifts = et.select(
        "series",
        F.lit("2024-01-10 00:00:00").cast("timestamp").alias("start_dt"),
        F.lit("2024-01-20 00:00:00").cast("timestamp").alias("end_dt"),
        ((a % 3).cast("double") * 2.5).alias("shift"),
    )
    out = apply_rating_curves(
        meas, curves.select("series", "curve_id", "start_dt", "end_dt"),
        points, shifts)
    out = out.select("event_id", "series", "stage", "shift",
                     "adjusted_stage", "curve_id", "discharge",
                     "in_range")
    return _round(out, {"discharge": 6})


# ---------------------------------------------------------------------------
# GIF decode (functions/gif.py): the dictionary-compression codec
# family (variable-width LZW, 9->12 bits, CLEAR/EOI, 4096 reset,
# sub-blocks, global color table) — encoded through the real writer,
# decoded back; the oracle maps the closed-form palette indices
# without parsing a byte.
# ---------------------------------------------------------------------------

_GIF_ORACLE = f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id % 4 = 3
    ), grid AS (
      SELECT r, c
      FROM (SELECT unnest(range(0, 16)) AS r),
           (SELECT unnest(range(0, 16)) AS c)
    ), px AS (
      SELECT media_id,
             (media_id * 7 + r * 16 + c) % 256 AS idx
      FROM ids CROSS JOIN grid
    ), rgb AS (
      SELECT media_id,
             (idx * 3 + 13) % 256 AS pr,
             (idx * 5 + 29) % 256 AS pg,
             (idx * 7 + 43) % 256 AS pb
      FROM px
    )
    SELECT media_id, TRUE AS decoded,
           CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
           {R('avg(pr)', 6)} AS mean_r,
           {R('avg(pg)', 6)} AS mean_g,
           {R('avg(pb)', 6)} AS mean_b
    FROM rgb GROUP BY media_id
"""


@register("gif_decode_features", oracle=_GIF_ORACLE)
def gif_decode_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import extract_gif_features, synthesize_gifs

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") % 4 == 3).select(
        F.col("doc_id").alias("media_id"))
    gifs = synthesize_gifs(ids, width=16, height=16)
    out = extract_gif_features(gifs)
    return _round(
        out.select("media_id", "decoded", F.col("width").cast("int"),
                   F.col("height").cast("int"), "mean_r", "mean_g",
                   "mean_b"),
        {"mean_r": 6, "mean_g": 6, "mean_b": 6})


# ---------------------------------------------------------------------------
# Seasonal Mann-Kendall (Hirsch 1982): per-(priority, month) MK over
# monthly means across years, combined S' = sum S_m and Var' = sum
# Var_m — both summed as EXACT integers (S, 18*Var) so the combination
# is aggregation-order independent.
# ---------------------------------------------------------------------------

_SMK_ORACLE = """
    WITH monthly AS (
      SELECT o_orderpriority AS series,
             CAST(month(o_orderdate) AS INT) AS mon,
             CAST(year(o_orderdate) AS INT) AS yr,
             max(o_totalprice) AS v
      FROM orders GROUP BY 1, 2, 3
    ), q AS (
      SELECT series, mon, yr,
             CAST(floor(CAST(v AS DOUBLE) * 1000000
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS vq
      FROM monthly
    ), pairs AS (
      SELECT a.series, a.mon,
             CASE WHEN b.vq > a.vq THEN 1
                  WHEN b.vq < a.vq THEN -1 ELSE 0 END AS sgn
      FROM q a JOIN q b ON b.series = a.series AND b.mon = a.mon
                        AND b.yr > a.yr
    ), st AS (
      SELECT series, mon, CAST(sum(sgn) AS BIGINT) AS s FROM pairs
      GROUP BY 1, 2
    ), nd AS (
      SELECT series, mon, count(*) AS n FROM q GROUP BY 1, 2
    ), ties AS (
      SELECT series, mon, sum(c * (c - 1) * (2 * c + 5)) AS tiesum
      FROM (SELECT series, mon, vq, count(*) AS c FROM q
            GROUP BY 1, 2, 3)
      GROUP BY 1, 2
    ), per AS (
      SELECT st.series, st.mon, st.s,
             nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tiesum AS v18
      FROM st JOIN nd USING (series, mon) JOIN ties USING (series, mon)
      WHERE nd.n >= 2
    ), tot AS (
      SELECT series, CAST(count(*) AS BIGINT) AS n_seasons,
             CAST(sum(s) AS BIGINT) AS s_total,
             CAST(sum(v18) AS BIGINT) AS v18
      FROM per GROUP BY 1
    )
    SELECT series, n_seasons, s_total,
           {vt} AS var_total,
           {zz} AS z
    FROM tot
""".format(
    vt=R("CAST(v18 AS DOUBLE) / CAST(18 AS DOUBLE)", 6),
    zz=R("""CASE WHEN v18 > 0 THEN
              CASE WHEN s_total > 0 THEN (s_total - 1)
                     / sqrt(CAST(v18 AS DOUBLE) / CAST(18 AS DOUBLE))
                   WHEN s_total < 0 THEN (s_total + 1)
                     / sqrt(CAST(v18 AS DOUBLE) / CAST(18 AS DOUBLE))
                   ELSE CAST(0 AS DOUBLE) END
            END""", 6),
)


@register("seasonal_mann_kendall", oracle=_SMK_ORACLE)
def seasonal_mann_kendall_q(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Hirsch seasonal MK per order priority: monthly maxima compared
    within the same month across years."""
    from .operators.trend import seasonal_mann_kendall

    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.month("o_orderdate").cast("int").alias("mon"),
        F.year("o_orderdate").cast("int").alias("yr"),
    ).agg(F.max("o_totalprice").alias("value"))
    monthly = monthly.withColumn(
        "date", F.make_date(F.col("yr"), F.lit(1), F.lit(1)))
    out = seasonal_mann_kendall(
        monthly, ["series"], "mon", "date", "value")
    return _round(out, {"var_total": 6, "z": 6})


# ---------------------------------------------------------------------------
# Flow-duration curve: per-series exceedance table at Weibull plotting
# positions (Q_p = value at the smallest descending rank m with
# 100*m >= p*(n+1), a pure integer rank test). Window bounded by
# record length per station.
# ---------------------------------------------------------------------------

_FDC_ORACLE = """
    WITH daily AS (
      SELECT o_orderpriority AS series, o_orderdate AS d,
             max(o_totalprice) AS v
      FROM orders GROUP BY 1, 2
    ), ranked AS (
      SELECT series, v,
             row_number() OVER (PARTITION BY series
                                ORDER BY v DESC, d ASC) AS m,
             count(*) OVER (PARTITION BY series) AS n
      FROM daily
    )
    SELECT series, p.pct AS exceedance_pct, max(v) AS flow
    FROM ranked CROSS JOIN (
      SELECT CAST(unnest([5, 10, 25, 50, 75, 90, 95]) AS INT) AS pct) p
    WHERE 100 * m >= p.pct * (n + 1)
    GROUP BY 1, 2
"""


@register("flow_duration_curve", oracle=_FDC_ORACLE)
def flow_duration_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven-point exceedance table per order priority over daily
    maxima."""
    from .operators.trend import flow_duration_curve

    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.col("o_orderdate").alias("date"),
    ).agg(F.max("o_totalprice").alias("value"))
    return flow_duration_curve(
        daily, ["series"], [5, 10, 25, 50, 75, 90, 95])


# ---------------------------------------------------------------------------
# HTML main-content extraction (functions/html.py): scripts/styles/
# comments dropped with payloads, <p>-block selection, tag strip,
# entity decode, whitespace collapse — the pre-pipeline text
# extraction stage, all map-only codegen.
# ---------------------------------------------------------------------------

_HTML_CLEAN_SQL = (
    "trim(regexp_replace("
    "replace(replace(replace(replace(replace("
    "regexp_replace({src}, '<[^>]*>', ' ', 'g'),"
    " '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'),"
    " '&#39;', ''''), '&amp;', '&'),"
    " '\\s+', ' ', 'g'))"
)

_HTML_ORACLE = f"""
    WITH raw AS (
      SELECT doc_id,
             '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
             || ' &amp; friends</title>'
             || '<script type="text/javascript">var x = 1; //junk'
             || '</script><style>.a {{ color: red; }}</style></head>'
             || '<body><nav>Home | About | <a href="/x">Links</a></nav>'
             || '<!-- comment block -->'
             || '<p>' || substr(text, 1, 120) || '</p>'
             || (CASE WHEN doc_id % 3 = 0
                      THEN '<p>' || substr(text, 121, 100)
                           || ' &lt;tagged&gt;</p>'
                      ELSE '' END)
             || '<div class="ad">BUY NOW!!!</div>'
             || '<footer>(c) 2024 Example</footer></body></html>'
               AS html
      FROM documents
    ), noiseless AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(html,
               '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
               '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
               '(?s)<!--.*?-->', ' ', 'g') AS s
      FROM raw
    ), parts AS (
      SELECT doc_id,
             {_HTML_CLEAN_SQL.format(
                 src="regexp_extract(s, '(?s)<title[^>]*>(.*?)</title>', 1)")}
               AS title,
             array_to_string(list_transform(
               regexp_extract_all(s, '(?s)<p[^>]*>(.*?)</p>', 1),
               b -> {_HTML_CLEAN_SQL.format(src='b')}), ' ')
               AS main_text,
             CAST(len(regexp_extract_all(s, '(?s)<p[^>]*>(.*?)</p>', 1))
                  AS INT) AS n_blocks,
             CAST(length({_HTML_CLEAN_SQL.format(src='s')}) AS BIGINT)
               AS chars_total
      FROM noiseless
    )
    SELECT doc_id, title, main_text, n_blocks, chars_total,
           CAST(length(main_text) AS BIGINT) AS chars_kept,
           {R("CASE WHEN chars_total > 0 THEN"
              " CAST(chars_total - length(main_text) AS DOUBLE)"
              " / chars_total ELSE CAST(0 AS DOUBLE) END", 6)}
             AS boilerplate_ratio
    FROM parts
"""


def _doc_html(text_col) -> Column:
    """The boilerplate-wrapped document HTML fixture (title + nav +
    script/style/comment noise + 1-2 <p> blocks + ad + footer) —
    shared by html_main_text_extract and the WARC crawl capstone, and
    mirrored verbatim by their oracles' raw CTEs."""
    d = F.col("doc_id")
    return F.concat(
        F.lit("<html><head><title>Doc "), d.cast("string"),
        F.lit(" &amp; friends</title>"),
        F.lit('<script type="text/javascript">var x = 1; //junk'),
        F.lit("</script><style>.a { color: red; }</style></head>"),
        F.lit('<body><nav>Home | About | <a href="/x">Links</a></nav>'),
        F.lit("<!-- comment block -->"),
        F.lit("<p>"), F.substring(text_col, 1, 120), F.lit("</p>"),
        F.when(d % 3 == 0,
               F.concat(F.lit("<p>"), F.substring(text_col, 121, 100),
                        F.lit(" &lt;tagged&gt;</p>"))).otherwise(""),
        F.lit('<div class="ad">BUY NOW!!!</div>'),
        F.lit("<footer>(c) 2024 Example</footer></body></html>"),
    )


@register("html_main_text_extract", oracle=_HTML_ORACLE)
def html_main_text_extract_q(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Boilerplate-wrapped documents (nav/script/style/comments/ads/
    footer + entities) reduced to title + paragraph text."""
    from .functions.html import with_main_text

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _doc_html(F.col("text")).alias("html"))
    out = with_main_text(docs, "html")
    return _round(
        out.select("doc_id", "title", "main_text", "n_blocks",
                   "chars_total", "chars_kept", "boilerplate_ratio"),
        {"boilerplate_ratio": 6})


# ---------------------------------------------------------------------------
# WARC web-archive ingest (functions/warc.py + sources/warc.py): the
# web tier's real on-ramp. Fixtures are synthesized through the REAL
# writer (one gzip member per record, ISO 28500 framing) and parsed by
# the REAL reader; oracles recompute expected features closed-form
# from doc_id/text without touching bytes (the GIF policy). The
# capstone chains ingest -> HTML main-content extraction -> URL
# canonicalization: crawl archive to training corpus in one plan.
# ---------------------------------------------------------------------------

def _warc_fixture(spark: SparkSession, sf_dir: str,
                  html_payload: bool) -> DataFrame:
    """Synthesized .warc.gz files over documents: one response record
    per doc (+ request records for doc_id%7==0 and metadata records
    for doc_id%11==0, which ingest must classify and filters drop),
    ~40 docs per file."""
    from .sources.warc import synthesize_warc_files

    d = F.col("doc_id")
    date = F.date_format(
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_dt_interval(secs=(d % 86400).cast("double")),
        "yyyy-MM-dd'T'HH:mm:ss'Z'")
    if html_payload:
        payload = _doc_html(F.col("text"))
        uri = F.concat(F.lit("HTTPS://Example.org/a/./docs/../doc/"),
                       d.cast("string"), F.lit("?z=1&a=2"))
        ctype = F.lit("text/html; charset=UTF-8")
    else:
        payload = F.col("text")
        uri = F.concat(
            F.lit("https://example.org/doc/"), d.cast("string"),
            F.when(d % 4 == 0, F.lit("?utm=1&b=2&a=1")).otherwise(""))
        ctype = F.when(d % 5 == 0, F.lit("text/plain")) \
            .otherwise(F.lit("text/html"))
    docs = _t(spark, sf_dir, "documents")
    resp = docs.select(
        (d % 40).alias("file_id"), (d * 4).alias("seq"),
        F.lit("response").alias("warc_type"),
        F.concat(F.lit("urn:example:"), d.cast("string"))
        .alias("record_id"),
        uri.alias("target_uri"), date.alias("warc_date"),
        F.when(d % 9 == 0, 404).otherwise(200).alias("http_status"),
        ctype.alias("http_content_type"),
        payload.alias("payload"))
    req = docs.where(d % 7 == 0).select(
        (d % 40).alias("file_id"), (d * 4 + 1).alias("seq"),
        F.lit("request").alias("warc_type"),
        F.concat(F.lit("urn:example:req:"), d.cast("string"))
        .alias("record_id"),
        uri.alias("target_uri"), date.alias("warc_date"),
        F.lit(0).alias("http_status"),
        F.lit("").alias("http_content_type"),
        F.concat(F.lit("GET /doc/"), d.cast("string"),
                 F.lit(" HTTP/1.1")).alias("payload"))
    meta = docs.where(d % 11 == 0).select(
        (d % 40).alias("file_id"), (d * 4 + 2).alias("seq"),
        F.lit("metadata").alias("warc_type"),
        F.concat(F.lit("urn:example:meta:"), d.cast("string"))
        .alias("record_id"),
        uri.alias("target_uri"), date.alias("warc_date"),
        F.lit(0).alias("http_status"),
        F.lit("").alias("http_content_type"),
        F.concat(F.lit("meta "), d.cast("string")).alias("payload"))
    return synthesize_warc_files(
        resp.unionByName(req).unionByName(meta), order_col="seq")


_WARC_INGEST_ORACLE = """
    SELECT doc_id,
           doc_id % 40 AS file_id,
           'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
             || CASE WHEN doc_id % 4 = 0 THEN '?utm=1&b=2&a=1'
                     ELSE '' END AS target_uri,
           strftime(TIMESTAMP '2024-01-01 00:00:00'
                    + (doc_id % 86400) * INTERVAL 1 SECOND,
                    '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
           CAST(CASE WHEN doc_id % 9 = 0 THEN 404 ELSE 200 END AS INT)
             AS http_status,
           CASE WHEN doc_id % 5 = 0 THEN 'text/plain'
                ELSE 'text/html' END AS http_content_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
           md5(text) AS payload_md5
    FROM documents
"""


@register("warc_record_ingest", oracle=_WARC_INGEST_ORACLE)
def warc_record_ingest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round trip through genuine .warc.gz bytes: synthesized archive
    files (response + request + metadata records, one gzip member
    each) -> distributed record parse -> response-record projection.
    Every WARC header and the HTTP payload slice must survive."""
    from .sources.warc import warc_records

    files = _warc_fixture(spark, sf_dir, html_payload=False)
    recs = warc_records(files)
    out = recs.where(F.col("ok") & (F.col("warc_type") == "response"))
    return out.select(
        F.regexp_extract("record_id", r"^urn:example:(\d+)$", 1)
        .cast("long").alias("doc_id"),
        "file_id", "target_uri", "warc_date", "http_status",
        "http_content_type",
        F.length("payload").cast("long").alias("payload_len"),
        F.md5("payload").alias("payload_md5"))


_WARC_CORPUS_ORACLE = f"""
    WITH raw AS (
      SELECT doc_id,
             '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
             || ' &amp; friends</title>'
             || '<script type="text/javascript">var x = 1; //junk'
             || '</script><style>.a {{ color: red; }}</style></head>'
             || '<body><nav>Home | About | <a href="/x">Links</a></nav>'
             || '<!-- comment block -->'
             || '<p>' || substr(text, 1, 120) || '</p>'
             || (CASE WHEN doc_id % 3 = 0
                      THEN '<p>' || substr(text, 121, 100)
                           || ' &lt;tagged&gt;</p>'
                      ELSE '' END)
             || '<div class="ad">BUY NOW!!!</div>'
             || '<footer>(c) 2024 Example</footer></body></html>'
               AS html
      FROM documents
      WHERE doc_id % 9 != 0
    ), noiseless AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(html,
               '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
               '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
               '(?s)<!--.*?-->', ' ', 'g') AS s
      FROM raw
    ), parts AS (
      SELECT doc_id,
             {_HTML_CLEAN_SQL.format(
                 src="regexp_extract(s, '(?s)<title[^>]*>(.*?)</title>',"
                     " 1)")}
               AS title,
             array_to_string(list_transform(
               regexp_extract_all(s, '(?s)<p[^>]*>(.*?)</p>', 1),
               b -> {_HTML_CLEAN_SQL.format(src='b')}), ' ')
               AS main_text,
             CAST(len(regexp_extract_all(s, '(?s)<p[^>]*>(.*?)</p>', 1))
                  AS INT) AS n_blocks
      FROM noiseless
    )
    SELECT doc_id,
           'https://example.org/a/doc/' || CAST(doc_id AS VARCHAR)
             || '?a=2&z=1' AS canonical_url,
           'example.org' AS host,
           title, main_text, n_blocks,
           CAST(length(main_text) AS BIGINT) AS chars_kept
    FROM parts
"""


@register("warc_crawl_corpus", oracle=_WARC_CORPUS_ORACLE)
def warc_crawl_corpus_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-to-corpus capstone: .warc.gz ingest -> HTTP 200 text/html
    responses -> HTML main-content extraction -> RFC 3986 URL
    canonicalization (dot-segments resolved, host lowercased, query
    sorted). One declarative plan from archive bytes to corpus rows."""
    from .functions.html import with_main_text
    from .operators.web import url_canonicalize
    from .sources.warc import warc_records

    files = _warc_fixture(spark, sf_dir, html_payload=True)
    recs = warc_records(files)
    pages = recs.where(
        F.col("ok") & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("http_content_type").startswith("text/html")
    ).select(
        F.regexp_extract("record_id", r"^urn:example:(\d+)$", 1)
        .cast("long").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("payload").cast("string").alias("html"))
    text = with_main_text(pages, "html")
    canon = url_canonicalize(
        text.select("doc_id", "url", "title", "main_text", "n_blocks"),
        "url")
    return canon.select(
        "doc_id", "canonical_url", "host", "title", "main_text",
        F.col("n_blocks").cast("int").alias("n_blocks"),
        F.length("main_text").cast("long").alias("chars_kept"))


# ---------------------------------------------------------------------------
# Charset detection + UTF-8 transcoding (functions/charset.py): BOM /
# meta-prescan / header / UTF-8-validation / windows-1252-fallback
# detection with a mojibake footprint flag — the decode stage between
# WARC payload bytes and HTML extraction. Fixtures run REAL encoders
# per class (the GIF policy); the oracle recomputes every feature
# closed-form from doc_id/text without touching bytes.
# ---------------------------------------------------------------------------

_CHARSET_ORACLE = """
    WITH b AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 7 = 1 AND doc_id % 6 != 3
                          THEN ' cafÃ©' ELSE ' café' END AS base
      FROM documents
    ), e AS (
      SELECT doc_id, base,
             CASE WHEN doc_id % 6 = 4
                  THEN '<meta charset="windows-1252">' || base
                  ELSE base END AS expected
      FROM b
    )
    SELECT doc_id,
           CASE doc_id % 6 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16le'
                WHEN 2 THEN 'utf-16be' WHEN 3 THEN 'windows-1252'
                WHEN 4 THEN 'windows-1252' ELSE 'utf-8'
           END AS detected_encoding,
           CASE doc_id % 6 WHEN 0 THEN 'bom' WHEN 1 THEN 'bom'
                WHEN 2 THEN 'bom' WHEN 3 THEN 'fallback'
                WHEN 4 THEN 'meta' ELSE 'utf8-valid'
           END AS detection_source,
           doc_id % 6 IN (0, 1, 2) AS had_bom,
           (doc_id % 7 = 1 AND doc_id % 6 != 3) AS mojibake,
           CAST(0 AS INT) AS replacement_count,
           CAST(CASE doc_id % 6
                WHEN 0 THEN 3 + octet_length(encode(base))
                WHEN 1 THEN 2 + 2 * length(base)
                WHEN 2 THEN 2 + 2 * length(base)
                WHEN 3 THEN length(base)
                WHEN 4 THEN 29 + length(base)
                ELSE octet_length(encode(base)) END AS BIGINT) AS n_bytes,
           CAST(length(expected) AS BIGINT) AS n_chars,
           md5(expected) AS text_md5
    FROM e
"""


@register("charset_transcode_features", oracle=_CHARSET_ORACLE)
def charset_transcode_features_q(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Per-encoding golden round trip: documents encoded through real
    codecs (UTF-8/16 BOMs, bare windows-1252, meta-declared
    windows-1252, plain UTF-8, pre-mojibaked suffixes) -> sniff +
    transcode kernel -> detection, byte/char counts, text hash."""
    from .functions.charset import (synthesize_encoded_docs,
                                    transcode_to_utf8)

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = transcode_to_utf8(synthesize_encoded_docs(docs))
    return out.select(
        "doc_id", "detected_encoding", "detection_source", "had_bom",
        "mojibake", "replacement_count", "n_bytes",
        F.length("text").cast("long").alias("n_chars"),
        F.md5(F.col("text").cast("binary")).alias("text_md5"))


# ---------------------------------------------------------------------------
# Sitemap ingestion (operators/web.parse_sitemaps): sitemaps.org
# urlset XML -> per-URL rows with lastmod/changefreq/priority, ranked
# into a per-host fetch order (priority desc, loc asc). Map-only +
# one explode; the crawl-frontier feeder next to robots.txt.
# ---------------------------------------------------------------------------

_SITEMAP_ORACLE = """
    WITH hosts AS (
      SELECT 'h' || CAST(s_suppkey AS VARCHAR) AS host, s_suppkey AS hk
      FROM supplier
    ), xml AS (
      SELECT host,
             '<?xml version="1.0"?><urlset>'
             || array_to_string(list_transform(
                  generate_series(0, 9), k ->
                  '<url><loc>https://' || host || '.example.com/p/'
                  || CAST(k AS VARCHAR) || '</loc>'
                  || (CASE WHEN (hk + k) % 3 != 0
                           THEN '<lastmod>2024-01-'
                                || lpad(CAST((hk + k) % 28 + 1
                                             AS VARCHAR), 2, '0')
                                || '</lastmod>' ELSE '' END)
                  || (CASE WHEN (hk + k) % 4 = 0
                           THEN '<changefreq>daily</changefreq>'
                           ELSE '' END)
                  || (CASE WHEN (hk + k) % 5 != 2
                           THEN '<priority>0.'
                                || CAST((hk + k) % 9 + 1 AS VARCHAR)
                                || '</priority>' ELSE '' END)
                  || '</url>'), '')
             || '</urlset>' AS content
      FROM hosts
    ), blocks AS (
      SELECT host, unnest(regexp_extract_all(content,
               '(?s)<url>(.*?)</url>', 1)) AS b
      FROM xml
    ), parsed AS (
      SELECT host,
             regexp_extract(b, '<loc>(.*?)</loc>', 1) AS loc,
             CASE WHEN regexp_extract(b, '<lastmod>(.*?)</lastmod>', 1)
                       != ''
                  THEN CAST(regexp_extract(b,
                         '<lastmod>(.*?)</lastmod>', 1) AS DATE)
             END AS lastmod,
             CASE WHEN regexp_extract(b,
                         '<changefreq>(.*?)</changefreq>', 1) != ''
                  THEN regexp_extract(b,
                         '<changefreq>(.*?)</changefreq>', 1)
             END AS changefreq,
             CASE WHEN regexp_extract(b,
                         '<priority>(.*?)</priority>', 1) != ''
                  THEN CAST(regexp_extract(b,
                         '<priority>(.*?)</priority>', 1) AS DOUBLE)
             END AS priority
      FROM blocks
    )
    SELECT host, loc, lastmod, changefreq, priority,
           CAST(row_number() OVER (
             PARTITION BY host
             ORDER BY coalesce(priority, CAST(0.5 AS DOUBLE)) DESC,
                      loc ASC) AS BIGINT) AS fetch_rank
    FROM parsed WHERE loc != ''
"""


@register("sitemap_url_ingest", oracle=_SITEMAP_ORACLE)
def sitemap_url_ingest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized per-host sitemaps (optional lastmod/changefreq/
    priority fields) parsed and ranked into a fetch order (absent
    priority defaults to the sitemaps.org 0.5)."""
    from .operators.web import parse_sitemaps

    hk = F.col("s_suppkey")
    host = F.concat(F.lit("h"), hk.cast("string"))
    entry = lambda k: F.concat(  # noqa: E731
        F.lit("<url><loc>https://"), host, F.lit(".example.com/p/"),
        k.cast("string"), F.lit("</loc>"),
        F.when((hk + k) % 3 != 0,
               F.concat(F.lit("<lastmod>2024-01-"),
                        F.lpad(((hk + k) % 28 + 1).cast("string"),
                               2, "0"),
                        F.lit("</lastmod>"))).otherwise(""),
        F.when((hk + k) % 4 == 0,
               F.lit("<changefreq>daily</changefreq>")).otherwise(""),
        F.when((hk + k) % 5 != 2,
               F.concat(F.lit("<priority>0."),
                        ((hk + k) % 9 + 1).cast("string"),
                        F.lit("</priority>"))).otherwise(""),
        F.lit("</url>"),
    )
    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'),
        F.array_join(
            F.transform(F.sequence(F.lit(0), F.lit(9)),
                        lambda k: entry(k)), ""),
        F.lit("</urlset>"),
    )
    sm = _t(spark, sf_dir, "supplier").select(
        host.alias("host"), xml.alias("content"))
    parsed = parse_sitemaps(sm)
    w = Window.partitionBy("host").orderBy(
        F.desc(F.coalesce("priority", F.lit(0.5))), F.asc("loc"))
    return parsed.select(
        "host", "loc", "lastmod", "changefreq", "priority",
        F.row_number().over(w).cast("long").alias("fetch_rank"))


# ---------------------------------------------------------------------------
# Round-8 web capstone: sitemap -> canonicalize -> alias-dedup ->
# robots verdict -> ranked crawl candidates. Sitemap XML parsed by
# parse_sitemaps, messy locs (case, default ports, dot-segments,
# unsorted queries, fragments, one deliberate alias entry per host)
# collapsed by url_canonicalize, robots filtering against the shared
# 50-host RFC 9309 fixture, fetch order by (priority desc, url).
# ---------------------------------------------------------------------------

_SCC_ORACLE = "WITH " + _ROBOTS_SQL + """
    , sm AS (
      SELECT DISTINCT s_suppkey % 50 AS hk FROM supplier
    ), entries AS (
      SELECT hk, k, hk + k AS i
      FROM sm CROSS JOIN (SELECT unnest(generate_series(0, 10)) AS k) t
    ), locs AS (
      SELECT hk,
        CASE
          WHEN k = 10 THEN
            'HTTPS://H' || CAST(hk AS VARCHAR)
            || '.Example.COM:443/public/./a'
            || CAST((hk + 3) % 40 AS VARCHAR) || '?a=2&b=1'
          WHEN k % 5 = 0 THEN
            'HTTPS://H' || CAST(hk AS VARCHAR)
            || '.Example.COM/private/doc'
            || CAST(i % 20 AS VARCHAR) || '/x/../'
          WHEN k % 5 = 1 THEN
            'https://h' || CAST(hk AS VARCHAR)
            || '.example.com:443/search/q' || CAST(i % 9 AS VARCHAR)
          WHEN k % 5 = 2 THEN
            'https://h' || CAST(hk AS VARCHAR)
            || '.Example.com/tmp' || CAST(i % 10 AS VARCHAR) || '/./x'
          WHEN k % 5 = 3 THEN
            'https://h' || CAST(hk AS VARCHAR)
            || '.example.com/public/a' || CAST(i % 40 AS VARCHAR)
            || '?b=1&a=2#f'
          ELSE
            'https://h' || CAST(hk AS VARCHAR)
            || '.example.com/blog/./post' || CAST(i % 30 AS VARCHAR)
        END AS url,
        CAST('0.' || CAST(i % 9 + 1 AS VARCHAR) AS DOUBLE) AS priority
      FROM entries
    ), cparsed AS (
      SELECT hk, priority,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
               AS scheme,
             lower(regexp_extract(
               regexp_replace(
                 regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1),
                 '^[^@]*@', ''), '^([^:]*)', 1)) AS chost,
             regexp_extract(
               regexp_replace(
                 regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1),
                 '^[^@]*@', ''), ':([0-9]+)$', 1) AS port,
             regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1)
               AS rawpath,
             regexp_extract(url, '\\?([^#]*)', 1) AS query
      FROM locs
    ), cnorm AS (
      SELECT hk, priority, scheme, chost,
             CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                       OR (scheme = 'https' AND port = '443')
                  THEN '' ELSE ':' || port END AS port_keep,
             list_reduce(
               string_split('/' || regexp_replace(rawpath, '^/', ''), '/'),
               (acc, x) -> CASE WHEN x = '' OR x = '.' THEN acc
                                WHEN x = '..'
                                  THEN regexp_replace(acc, '/[^/]*$', '')
                                ELSE acc || '/' || x END) AS folded,
             (regexp_matches(rawpath, '(/|/\\.|/\\.\\.)$')
              OR rawpath = '') AS keep_slash,
             array_to_string(list_sort(string_split(query, '&')), '&')
               AS qsorted
      FROM cparsed
    ), canon AS (
      SELECT hk, priority,
             CASE WHEN folded = '' THEN '/'
                  ELSE folded
                       || CASE WHEN keep_slash THEN '/' ELSE '' END
             END AS cpath,
             scheme || '://' || chost || port_keep
             || CASE WHEN folded = '' THEN '/'
                     ELSE folded
                          || CASE WHEN keep_slash THEN '/' ELSE '' END
                END
             || CASE WHEN qsorted = '' THEN '' ELSE '?' || qsorted END
               AS canonical_url
      FROM cnorm
    ), dedup AS (
      SELECT 'h' || CAST(hk AS VARCHAR) AS host, canonical_url,
             min(cpath) AS cpath,
             CAST(count(*) AS BIGINT) AS n_aliases,
             max(priority) AS priority
      FROM canon GROUP BY 1, 2
    ), exact AS (
      SELECT * FROM rules WHERE agent = 'aquabot'
    ), eff AS (
      SELECT * FROM exact
      UNION ALL
      SELECT * FROM rules r WHERE r.agent = '*'
        AND NOT EXISTS (SELECT 1 FROM exact e WHERE e.host = r.host)
    ), pats AS (
      SELECT host, rule, path, length(path) AS plen,
             CASE WHEN ends_with(esc, '$')
                  THEN replace(left(esc, length(esc) - 1), '*', '%')
                  ELSE replace(esc, '*', '%') || '%' END AS likepat
      FROM (SELECT host, rule, path,
                   replace(replace(replace(path, '\\', '\\\\'),
                                   '%', '\\%'), '_', '\\_') AS esc
            FROM eff)
    ), joined AS (
      SELECT u.host, u.canonical_url, u.cpath, u.n_aliases, u.priority,
             p.rule, p.path, p.plen,
             p.likepat IS NOT NULL
               AND u.cpath LIKE p.likepat ESCAPE '\\' AS hit
      FROM dedup u LEFT JOIN pats p ON p.host = u.host
    ), ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY host, canonical_url
               ORDER BY hit DESC, plen DESC, rule = 'allow' DESC,
                        path ASC) AS rn
      FROM joined
    ), verdicts AS (
      SELECT host, canonical_url, n_aliases, priority,
             CASE WHEN coalesce(hit, FALSE) THEN rule = 'allow'
                  ELSE TRUE END AS allowed,
             CASE WHEN hit THEN rule END AS matched_rule
      FROM ranked WHERE rn = 1
    )
    SELECT host, canonical_url, n_aliases, priority, matched_rule,
           CAST(row_number() OVER (
             PARTITION BY host
             ORDER BY priority DESC, canonical_url ASC) AS BIGINT)
             AS fetch_rank
    FROM verdicts WHERE allowed
"""


@register("sitemap_crawl_candidates", oracle=_SCC_ORACLE)
def sitemap_crawl_candidates_q(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """End-to-end crawl candidate list: per-host sitemap XML ->
    canonical URLs (alias entries collapse) -> RFC 9309 verdicts ->
    allowed URLs in fetch order."""
    from .operators.web import (
        parse_robots,
        parse_sitemaps,
        robots_allowed,
        url_canonicalize,
    )

    sup = _t(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") % 50).alias("hk")).distinct()
    hk = F.col("hk")
    hks = hk.cast("string")

    def loc(k):
        i = hk + k
        return (
            F.when(k == 10, F.concat(
                F.lit("HTTPS://H"), hks,
                F.lit(".Example.COM:443/public/./a"),
                ((hk + 3) % 40).cast("string"), F.lit("?a=2&b=1")))
            .when(k % 5 == 0, F.concat(
                F.lit("HTTPS://H"), hks, F.lit(".Example.COM/private/doc"),
                (i % 20).cast("string"), F.lit("/x/../")))
            .when(k % 5 == 1, F.concat(
                F.lit("https://h"), hks,
                F.lit(".example.com:443/search/q"),
                (i % 9).cast("string")))
            .when(k % 5 == 2, F.concat(
                F.lit("https://h"), hks, F.lit(".Example.com/tmp"),
                (i % 10).cast("string"), F.lit("/./x")))
            .when(k % 5 == 3, F.concat(
                F.lit("https://h"), hks, F.lit(".example.com/public/a"),
                (i % 40).cast("string"), F.lit("?b=1&a=2#f")))
            .otherwise(F.concat(
                F.lit("https://h"), hks, F.lit(".example.com/blog/./post"),
                (i % 30).cast("string")))
        )

    def entry(k):
        i = hk + k
        return F.concat(
            F.lit("<url><loc>"), loc(k), F.lit("</loc><priority>0."),
            (i % 9 + 1).cast("string"), F.lit("</priority></url>"))

    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'),
        F.array_join(F.transform(F.sequence(F.lit(0), F.lit(10)),
                                 lambda k: entry(k)), ""),
        F.lit("</urlset>"),
    )
    sitemaps = sup.select(
        F.concat(F.lit("h"), hks).alias("site_host"),
        xml.alias("content"))
    parsed = parse_sitemaps(sitemaps, host_col="site_host")
    canon = url_canonicalize(
        parsed.select("host", F.col("loc").alias("url"), "priority")
        .withColumnRenamed("host", "site_host"), "url")
    dedup = (
        canon.groupBy("site_host", "canonical_url")
        .agg(F.min("path").alias("cpath"),
             F.count(F.lit(1)).cast("long").alias("n_aliases"),
             F.max("priority").alias("priority"))
    )
    rules = parse_robots(_robots_fixture(spark))
    verdicts = robots_allowed(
        dedup.select(F.col("site_host").alias("host"),
                     F.col("cpath").alias("path"),
                     "canonical_url", "n_aliases", "priority"),
        rules, agent="aquabot")
    w = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.asc("canonical_url"))
    return (
        verdicts.where(F.col("allowed"))
        .select("host", "canonical_url", "n_aliases", "priority",
                "matched_rule",
                F.row_number().over(w).cast("long").alias("fetch_rank"))
    )


# ---------------------------------------------------------------------------
# Per-language temperature rebalancing: language_id -> sqrt-temperature
# token budget per DETECTED LANGUAGE (the actual multilingual-LM use
# of temperature sampling; 'und' docs drop at the gate).
# ---------------------------------------------------------------------------

_LANG_TEMP_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), s AS (
      SELECT doc_id, n_tokens,
             {_lang_filter_sql('de')} AS de,
             {_lang_filter_sql('en')} AS en,
             {_lang_filter_sql('es')} AS es,
             {_lang_filter_sql('fr')} AS fr
      FROM t
    ), docs AS (
      SELECT doc_id, n_tokens,
             CASE
               WHEN greatest(de, en, es, fr) < 0.05 THEN 'und'
               WHEN de >= en AND de >= es AND de >= fr THEN 'de'
               WHEN en >= es AND en >= fr THEN 'en'
               WHEN es >= fr THEN 'es'
               ELSE 'fr'
             END AS lang
      FROM s
    ), kept_docs AS (
      SELECT * FROM docs WHERE lang != 'und'
    ), tot AS (
      SELECT lang, sum(n_tokens) AS n,
             CAST(floor(sqrt(CAST(sum(n_tokens) AS DOUBLE))
                        * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS squ
      FROM kept_docs GROUP BY 1
    ), norm AS (
      SELECT sum(squ) AS ssum, sum(n) AS grand FROM tot
    ), rates AS (
      SELECT lang,
             squ / CAST(ssum AS DOUBLE) AS q,
             least(CAST(1 AS DOUBLE),
                   squ / CAST(ssum AS DOUBLE)
                   * floor(CAST(0.5 AS DOUBLE) * grand)
                   / CAST(n AS DOUBLE)) AS keep_frac
      FROM tot, norm
    )
    SELECT d.doc_id, d.lang, d.n_tokens,
           {R('r.q', 6)} AS q, {R('r.keep_frac', 6)} AS keep_frac,
           (CAST('0x' || substr(md5('temp-v1|' || CAST(d.doc_id AS VARCHAR)),
                                1, 12) AS BIGINT)
            / CAST(281474976710656 AS DOUBLE)) < r.keep_frac AS kept
    FROM kept_docs d JOIN rates r USING (lang)
"""


@register("per_language_temperature_sample", oracle=_LANG_TEMP_ORACLE)
def per_language_temperature_sample_q(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Temperature rebalancing across DETECTED languages at a 50%
    token budget; 'und' excluded before the totals."""
    from .functions import text as X
    from .operators.packing import temperature_mixture_sample

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", X.lang_id_multi(F.col("text")).alias("lang"),
        F.size(F.split(F.col("text"), " ")).cast("long")
        .alias("n_tokens")).where(F.col("lang") != "und")
    out = temperature_mixture_sample(
        docs, budget_frac=0.5, domain_col="lang")
    return _round(
        out.select("doc_id", "lang", "n_tokens", "q", "keep_frac",
                   "kept"),
        {"q": 6, "keep_frac": 6})


# ---------------------------------------------------------------------------
# Matryoshka-style truncated retrieval: exact cosine top-k at a
# 16-dim PREFIX of the 64-dim embeddings (MRL serving: coarse search
# on the cheap prefix), each hit flagged for membership in the
# full-dimension top-k — the per-query recall readout.
# ---------------------------------------------------------------------------

_MRL_ORACLE = f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings
    ), st AS (
      SELECT query_id, neighbor_id,
             list_dot_product(qv[1:16], cv[1:16])
               / (sqrt(list_dot_product(qv[1:16], qv[1:16]))
                  * sqrt(list_dot_product(cv[1:16], cv[1:16])))
               AS cos16
      FROM q, c WHERE query_id <> neighbor_id
    ), rt AS (
      SELECT *, row_number() OVER (
               PARTITION BY query_id
               ORDER BY floor(cos16 * 1000000000.0 + 0.5) DESC,
                        neighbor_id) AS rank
      FROM st
    ), sf AS (
      SELECT query_id, neighbor_id,
             list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv))
                  * sqrt(list_dot_product(cv, cv))) AS cosf
      FROM q, c WHERE query_id <> neighbor_id
    ), rf AS (
      SELECT query_id, neighbor_id, row_number() OVER (
               PARTITION BY query_id
               ORDER BY floor(cosf * 1000000000.0 + 0.5) DESC,
                        neighbor_id) AS rank
      FROM sf
    )
    SELECT t.query_id, t.neighbor_id, {R('t.cos16', 6)} AS cosine16,
           CAST(t.rank AS BIGINT) AS rank,
           (f.neighbor_id IS NOT NULL) AS in_full_topk
    FROM rt t LEFT JOIN (SELECT query_id, neighbor_id FROM rf
                         WHERE rank <= 5) f
      ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
    WHERE t.rank <= 5
"""


@register("matryoshka_truncated_topk", oracle=_MRL_ORACLE)
def matryoshka_truncated_topk_q(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """16-dim-prefix cosine top-5 with full-dim-agreement flags."""
    from .operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    trunc = emb.select(
        "vec_id", F.slice(F.col("embedding"), 1, 16).alias("embedding"))
    queries16 = trunc.where(F.col("vec_id") < 10)
    t16 = cosine_topk(trunc, queries16, k=5).select(
        "query_id", "neighbor_id",
        F.col("cosine").alias("cosine16"), "rank")
    full = cosine_topk(emb, emb.where(F.col("vec_id") < 10), k=5) \
        .select("query_id", "neighbor_id")
    out = t16.join(
        full.withColumn("__f", F.lit(True)),
        ["query_id", "neighbor_id"], "left")
    return _round(
        out.select("query_id", "neighbor_id", "cosine16", "rank",
                   F.coalesce("__f", F.lit(False)).alias("in_full_topk")),
        {"cosine16": 6})


# ---------------------------------------------------------------------------
# Luhn checksum validation (ISO/IEC 7812): the PII-redaction upgrade —
# 16-digit sequences are only credit-card candidates if the check
# digit verifies, cutting false redactions. The checksum is a 16-term
# closed form (per-position digit doubling with the >9 fold-back),
# identical map-only codegen on both engines.
# ---------------------------------------------------------------------------

def _luhn_terms(col_sql: str, n: int = 16) -> str:
    """SQL sum of Luhn terms over an n-digit string column: position j
    (1-based from the left), doubling positions where (n - j) is odd
    counted from the right -> (n - j + 1) even."""
    terms = []
    for j in range(1, n + 1):
        d = f"CAST(substr({col_sql}, {j}, 1) AS INT)"
        if (n - j + 1) % 2 == 0:  # doubled position
            terms.append(f"(CASE WHEN {d} > 4 THEN 2 * {d} - 9"
                         f" ELSE 2 * {d} END)")
        else:
            terms.append(d)
    return " + ".join(terms)


_LUHN_ORACLE = f"""
    WITH cand AS (
      SELECT doc_id,
             lpad(CAST((doc_id * 7919 + 123456789) % 10000000000000000
                       AS VARCHAR), 16, '0') AS card_candidate
      FROM documents
    )
    SELECT doc_id, card_candidate,
           ({_luhn_terms('card_candidate')}) % 10 = 0 AS luhn_valid
    FROM cand
"""


@register("luhn_card_validation", oracle=_LUHN_ORACLE)
def luhn_card_validation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn checks over deterministic 16-digit candidates (~10% pass,
    exactly the true-checksum subset)."""
    d = F.col("doc_id")
    cand = F.lpad(
        ((d * 7919 + 123456789) % (10 ** 16)).cast("string"), 16, "0")
    digits = F.transform(
        F.sequence(F.lit(1), F.lit(16)),
        lambda j: F.substring(F.col("card_candidate"), 1, 16)
        .substr(j, F.lit(1)).cast("int"))
    # position j doubled when (16 - j + 1) is even; fold-back 2d-9
    terms = F.zip_with(
        digits, F.sequence(F.lit(1), F.lit(16)),
        lambda x, j: F.when(
            (17 - j) % 2 == 0,
            F.when(x > 4, 2 * x - 9).otherwise(2 * x)).otherwise(x))
    total = F.aggregate(terms, F.lit(0), lambda a, x: a + x)
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", cand.alias("card_candidate"))
        .withColumn("luhn_valid", total % 10 == 0)
    )


# ---------------------------------------------------------------------------
# Benford's-law screening: first-digit distribution of a value column
# vs the Benford expectation — the classic tampering/quality signal
# for measured data. Expected shares are INLINED literals (no
# cross-engine log10), counts exact, chi-square from exact counts.
# ---------------------------------------------------------------------------

_BENFORD_SHARES = {
    1: 0.3010299956639812, 2: 0.17609125905568124,
    3: 0.12493873660829992, 4: 0.09691001300805642,
    5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129,
    9: 0.04575749056067514,
}

_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN CAST({s!r} AS DOUBLE)"
    for d, s in _BENFORD_SHARES.items()) + " END"

_BENFORD_ORACLE = f"""
    WITH v AS (
      SELECT o_orderpriority AS series,
             CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ), counts AS (
      SELECT series, digit, CAST(count(*) AS BIGINT) AS n_obs
      FROM v GROUP BY 1, 2
    ), tot AS (
      SELECT series, sum(n_obs) AS n FROM counts GROUP BY 1
    ), ex AS (
      SELECT c.series, c.digit, c.n_obs,
             CAST(t.n AS DOUBLE) * ({_BENFORD_CASE}) AS expected
      FROM counts c JOIN tot t USING (series)
    ), chi AS (
      SELECT series,
             sum(CAST(floor((n_obs - expected) * (n_obs - expected)
                            / expected * 1000000
                            + CAST(0.5 AS DOUBLE)) AS BIGINT))
               / CAST(1e6 AS DOUBLE) AS chi2
      FROM ex GROUP BY 1
    )
    SELECT e.series, e.digit, e.n_obs, {R('e.expected', 6)} AS expected,
           {R('c.chi2', 4)} AS chi2
    FROM ex e JOIN chi c USING (series)
"""


@register("benford_digit_screen", oracle=_BENFORD_ORACLE)
def benford_digit_screen_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit counts of order totals per priority with Benford
    expectations and the per-series chi-square statistic."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"),
        1, 1).cast("int")
    counts = o.groupBy(
        F.col("o_orderpriority").alias("series"), digit.alias("digit")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    tot = counts.groupBy("series").agg(F.sum("n_obs").alias("n"))
    share = F.col("digit")
    share_expr = None
    for dgt, s in _BENFORD_SHARES.items():
        share_expr = (F.when(share == dgt, F.lit(s)) if share_expr is None
                      else share_expr.when(share == dgt, F.lit(s)))
    ex = counts.join(F.broadcast(tot), "series").withColumn(
        "expected", F.col("n").cast("double") * share_expr)
    # chi2 sums <= 9 doubles per series: quantize contributions to
    # exact micro-units first so the sum is order-independent
    contrib = F.floor(
        (F.col("n_obs") - F.col("expected"))
        * (F.col("n_obs") - F.col("expected")) / F.col("expected")
        * 1e6 + F.lit(0.5)).cast("long")
    chi = ex.withColumn("__c", contrib).groupBy("series").agg(
        (F.sum("__c") / 1e6).alias("chi2"))
    out = ex.join(F.broadcast(chi), "series").select(
        "series", "digit", "n_obs", "expected", "chi2")
    return _round(out, {"expected": 6, "chi2": 4})


# ---------------------------------------------------------------------------
# SCD Type-2 dimension build: turn an attribute change log into
# validity intervals (effective_from/effective_to, version, is_current)
# — the warehouse-standard history table the reference's time-bounded
# catalogs (owners, approvals, qualifiers) all follow. One per-key
# window (lead over change times), change-log-bounded.
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
    WITH changes AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             event_type AS attr_value
      FROM events WHERE event_id % 5 = 0
    ), dedup AS (
      -- one change per (key, instant): keep the max attr (stable rule)
      SELECT user_id, ts, max(attr_value) AS attr_value
      FROM changes GROUP BY 1, 2
    ), collapsed AS (
      -- drop no-op changes (same value as the previous row)
      SELECT * FROM (
        SELECT user_id, ts, attr_value,
               lag(attr_value) OVER (PARTITION BY user_id ORDER BY ts)
                 AS prev_value
        FROM dedup)
      WHERE prev_value IS NULL OR prev_value <> attr_value
    )
    SELECT user_id, attr_value,
           ts AS effective_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts)
             AS effective_to,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts)
                AS BIGINT) AS version,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             AS is_current
    FROM collapsed
"""


@register("scd2_dimension_build", oracle=_SCD2_ORACLE)
def scd2_dimension_build_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute change log (every 5th event: user's event_type as the
    tracked attribute) -> SCD2 validity intervals with no-op changes
    collapsed and per-instant duplicates resolved deterministically."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") % 5 == 0)
    changes = ev.groupBy(
        F.col("user_id"), F.col("ts")
    ).agg(F.max("event_type").alias("attr_value"))
    w = Window.partitionBy("user_id").orderBy("ts")
    collapsed = (
        changes.withColumn("__prev", F.lag("attr_value").over(w))
        .where(F.col("__prev").isNull()
               | (F.col("__prev") != F.col("attr_value")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts")
    return collapsed.select(
        "user_id", "attr_value",
        F.col("ts").alias("effective_from"),
        F.lead("ts").over(w2).alias("effective_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Retrieval evaluation metrics: MRR, precision@5, DCG@5 / NDCG@5 with
# graded relevance — the eval tier for the BM25/hybrid stack. DCG
# weights 1/log2(r+1) are INLINED literals (no cross-engine log2);
# each DCG term is micro-quantized before summing; the ideal ranking
# is a per-query window over the judged pool (judgment-count bounded).
# ---------------------------------------------------------------------------

_DCG_W = {1: 1.0, 2: 0.6309297535714575, 3: 0.5,
          4: 0.43067655807339306, 5: 0.38685280723454163}

_DCG_W_CASE = "CASE r " + " ".join(
    f"WHEN {r} THEN CAST({w!r} AS DOUBLE)" for r, w in _DCG_W.items()
) + " ELSE CAST(0 AS DOUBLE) END"

_REL_SQL = ("CASE WHEN (d * 7 + q) % 97 = 0 THEN 2 "
            "WHEN (d * 7 + q) % 11 = 0 THEN 1 ELSE 0 END")

_RANKMETRICS_ORACLE = f"""
    WITH queries AS (
      SELECT unnest(generate_series(0, 9)) AS q
    ), run AS (
      SELECT q, r, (q * 37 + r * 13) % 200 AS d
      FROM queries CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS r) t
    ), judged AS (
      SELECT q, r, d, {_REL_SQL} AS rel FROM run
    ), pool AS (
      SELECT q, d, {_REL_SQL} AS rel
      FROM queries CROSS JOIN (SELECT unnest(generate_series(0, 199)) AS d) t
    ), ideal AS (
      SELECT q, rel,
             row_number() OVER (PARTITION BY q
                                ORDER BY rel DESC, d ASC) AS r
      FROM pool
    ), idcg AS (
      SELECT q, sum(CAST(floor((power(2, rel) - 1) * ({_DCG_W_CASE})
                               * 1000000 + CAST(0.5 AS DOUBLE))
                         AS BIGINT)) AS iu
      FROM ideal WHERE r <= 5 GROUP BY 1
    ), agg AS (
      SELECT q,
             min(CASE WHEN rel > 0 THEN r END) AS first_rel,
             sum(CASE WHEN r <= 5 AND rel > 0 THEN 1 ELSE 0 END) AS hits5,
             sum(CASE WHEN r <= 5 THEN
                   CAST(floor((power(2, rel) - 1) * ({_DCG_W_CASE})
                              * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT)
                 ELSE 0 END) AS du
      FROM judged GROUP BY 1
    )
    SELECT a.q AS query_id,
           {R("coalesce(CAST(1 AS DOUBLE) / a.first_rel,"
              " CAST(0 AS DOUBLE))", 6)} AS mrr,
           {R("CAST(a.hits5 AS DOUBLE) / CAST(5 AS DOUBLE)", 6)}
             AS p_at_5,
           {R("a.du / CAST(1e6 AS DOUBLE)", 6)} AS dcg5,
           {R("i.iu / CAST(1e6 AS DOUBLE)", 6)} AS idcg5,
           {R("CASE WHEN i.iu > 0 THEN CAST(a.du AS DOUBLE) / i.iu"
              " ELSE CAST(0 AS DOUBLE) END", 6)} AS ndcg5
    FROM agg a JOIN idcg i ON i.q = a.q
"""


@register("retrieval_ranking_metrics", oracle=_RANKMETRICS_ORACLE)
def retrieval_ranking_metrics_q(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """MRR / P@5 / DCG@5 / NDCG@5 over a deterministic 10-query run
    with graded judgments (ideal ranking from the 200-doc judged
    pool)."""
    qd = F.col("q") * 37 + F.col("r") * 13
    run = _ldf(spark, [(q,) for q in range(10)], "q int").crossJoin(
        _ldf(spark, [(r,) for r in range(1, 11)], "r int")).select(
        "q", "r", (qd % 200).alias("d"))
    rel_of = (
        F.when((F.col("d") * 7 + F.col("q")) % 97 == 0, 2)
        .when((F.col("d") * 7 + F.col("q")) % 11 == 0, 1)
        .otherwise(0))
    judged = run.withColumn("rel", rel_of)
    w_case = None
    for r, wgt in _DCG_W.items():
        w_case = (F.when(F.col("r") == r, F.lit(wgt)) if w_case is None
                  else w_case.when(F.col("r") == r, F.lit(wgt)))
    w_case = w_case.otherwise(F.lit(0.0))
    term = F.floor((F.pow(F.lit(2.0), F.col("rel")) - 1) * w_case
                   * 1e6 + F.lit(0.5)).cast("long")
    agg = judged.groupBy("q").agg(
        F.min(F.when(F.col("rel") > 0, F.col("r"))).alias("first_rel"),
        F.sum(F.when((F.col("r") <= 5) & (F.col("rel") > 0), 1)
              .otherwise(0)).alias("hits5"),
        F.sum(F.when(F.col("r") <= 5, term).otherwise(0)).alias("du"),
    )
    pool = _ldf(spark, [(q,) for q in range(10)], "q int").crossJoin(
        _ldf(spark, [(d,) for d in range(200)], "d int")).withColumn(
        "rel", rel_of)
    wi = Window.partitionBy("q").orderBy(F.desc("rel"), F.asc("d"))
    ideal = pool.withColumn("r", F.row_number().over(wi)) \
        .where(F.col("r") <= 5)
    idcg = ideal.groupBy("q").agg(F.sum(term).alias("iu"))
    out = agg.join(idcg, "q").select(
        F.col("q").alias("query_id"),
        F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0))
        .alias("mrr"),
        (F.col("hits5").cast("double") / 5.0).alias("p_at_5"),
        (F.col("du") / F.lit(1e6)).alias("dcg5"),
        (F.col("iu") / F.lit(1e6)).alias("idcg5"),
        F.when(F.col("iu") > 0,
               F.col("du").cast("double") / F.col("iu"))
        .otherwise(F.lit(0.0)).alias("ndcg5"),
    )
    return _round(out, {"mrr": 6, "p_at_5": 6, "dcg5": 6, "idcg5": 6,
                        "ndcg5": 6})


# ---------------------------------------------------------------------------
# Bilinear raster sampling (operators/raster.bilinear_sample): gridded
# model values extracted at station coordinates — four corner keys per
# point map-side, one equi-join on the cell fact, fixed-order weighted
# sum (eighth/quarter fractional offsets keep every weight exactly
# representable).
# ---------------------------------------------------------------------------

_BILINEAR_ORACLE = f"""
    WITH cells AS ({_RASTER_CELLS_SQL}),
    pts AS (
      SELECT s_suppkey AS station_id,
             CAST(s_suppkey % 90 AS DOUBLE)
               + CAST(s_suppkey % 8 AS DOUBLE) / CAST(8 AS DOUBLE)
               AS px,
             CAST(s_suppkey % 12 AS DOUBLE)
               + CAST(s_suppkey % 4 AS DOUBLE) / CAST(4 AS DOUBLE)
               AS py
      FROM supplier
    ), corners AS (
      SELECT station_id, px, py, c.corner,
             CAST(floor(px) AS INT) + c.corner % 2 AS x,
             CAST(floor(py) AS INT) + c.corner // 2 AS y,
             CASE c.corner
               WHEN 0 THEN (1 - (px - floor(px))) * (1 - (py - floor(py)))
               WHEN 1 THEN (px - floor(px)) * (1 - (py - floor(py)))
               WHEN 2 THEN (1 - (px - floor(px))) * (py - floor(py))
               ELSE (px - floor(px)) * (py - floor(py))
             END AS w
      FROM pts CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS corner) c
    ), joined AS (
      SELECT k.station_id, k.px, k.py, k.corner,
             coalesce(k.w * cells.value,
                      CASE WHEN k.w = 0 THEN CAST(0 AS DOUBLE) END) AS t
      FROM corners k LEFT JOIN cells USING (x, y)
    ), piv AS (
      SELECT station_id, px, py,
             max(CASE WHEN corner = 0 THEN t END) AS t0,
             max(CASE WHEN corner = 1 THEN t END) AS t1,
             max(CASE WHEN corner = 2 THEN t END) AS t2,
             max(CASE WHEN corner = 3 THEN t END) AS t3
      FROM joined GROUP BY 1, 2, 3
    )
    SELECT station_id, px, py,
           {R("CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL"
              " AND t2 IS NOT NULL AND t3 IS NOT NULL"
              " THEN ((t0 + t1) + t2) + t3 END", 6)} AS value,
           (t0 IS NOT NULL AND t1 IS NOT NULL AND t2 IS NOT NULL
            AND t3 IS NOT NULL) AS complete
    FROM piv
"""


@register("raster_bilinear_sample", oracle=_BILINEAR_ORACLE)
def raster_bilinear_sample_q(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Station-point bilinear extraction from the events-backed cell
    grid (eighth/quarter fractional offsets; at sf0.001 the grid is
    100x10, so stations with py >= 9 exercise the incomplete
    branch)."""
    from .operators.raster import bilinear_sample

    cells = _t(spark, sf_dir, "events").select(
        (F.col("event_id") % 100).alias("x"),
        F.floor(F.col("event_id") / 100).cast("int").alias("y"),
        "value")
    s = F.col("s_suppkey")
    pts = _t(spark, sf_dir, "supplier").select(
        s.alias("station_id"),
        ((s % 90).cast("double") + (s % 8).cast("double") / 8.0)
        .alias("px"),
        ((s % 12).cast("double") + (s % 4).cast("double") / 4.0)
        .alias("py"))
    out = bilinear_sample(cells, pts)
    return _round(out, {"value": 6})


# ---------------------------------------------------------------------------
# Low-flow frequency (operators/trend.low_flow_frequency): 7-day
# moving-mean annual minima with Weibull return periods — the 7Q
# statistic. Daily values micro-quantized BEFORE the moving sum so the
# window means are exact under any window evaluation strategy.
# ---------------------------------------------------------------------------

_7Q_ORACLE = f"""
    WITH daily AS (
      SELECT o_orderpriority AS series,
             CAST(year(o_orderdate) AS INT) AS yr,
             o_orderdate AS d,
             min(o_totalprice) AS v
      FROM orders GROUP BY 1, 2, 3
    ), q AS (
      SELECT series, yr, d,
             CAST(floor(CAST(v AS DOUBLE) * 1000000
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS vq
      FROM daily
    ), rolled AS (
      SELECT series, yr,
             sum(vq) OVER (PARTITION BY series ORDER BY d
                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS s,
             count(*) OVER (PARTITION BY series ORDER BY d
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS c
      FROM q
    ), annual AS (
      SELECT series, yr, min(s) AS smin
      FROM rolled WHERE c = 7 GROUP BY 1, 2
    ), ranked AS (
      SELECT series, yr, smin,
             row_number() OVER (PARTITION BY series
                                ORDER BY smin ASC, yr ASC) AS rank,
             count(*) OVER (PARTITION BY series) AS n
      FROM annual
    )
    SELECT series, yr,
           {R("smin / CAST(1e6 AS DOUBLE) / CAST(7 AS DOUBLE)", 6)}
             AS qn_min,
           CAST(rank AS BIGINT) AS rank,
           {R("CAST(n + 1 AS DOUBLE) / rank", 6)} AS return_period
    FROM ranked
"""


@register("low_flow_frequency", oracle=_7Q_ORACLE)
def low_flow_frequency_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day low-flow annual minima + Weibull return periods per
    order priority over daily minimum totals."""
    from .operators.trend import low_flow_frequency

    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.col("o_orderdate").alias("date"),
    ).agg(F.min("o_totalprice").alias("value"))
    out = low_flow_frequency(daily, ["series"], "yr")
    return _round(out, {"qn_min": 6, "return_period": 6})


# ---------------------------------------------------------------------------
# Double-mass consistency screen: each station's annual totals against
# the mean of the OTHER stations (the WSC homogeneity check for gauge
# relocation / datum drift). All totals are exact micro-unit integers;
# the only floats are the final slope ratios; a year is flagged when
# its slope deviates more than 20% from the station's overall ratio.
# ---------------------------------------------------------------------------

_DMASS_ORACLE = f"""
    WITH daily AS (
      SELECT o_orderpriority AS series,
             CAST(year(o_orderdate) AS INT) AS yr,
             o_orderdate AS d,
             sum(CAST(floor(o_totalprice * 1000000
                            + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS vq
      FROM orders GROUP BY 1, 2, 3
    ), annual AS (
      SELECT series, yr, sum(vq) AS a FROM daily GROUP BY 1, 2
    ), totals AS (
      SELECT yr, sum(a) AS tot, count(*) AS k FROM annual GROUP BY 1
    ), joined AS (
      SELECT an.series, an.yr, an.a,
             (t.tot - an.a) AS ref_sum, t.k - 1 AS k1
      FROM annual an JOIN totals t USING (yr)
    ), overall AS (
      SELECT series, sum(a) AS sa, sum(ref_sum) AS sr,
             min(k1) AS k1 FROM joined GROUP BY 1
    ), r AS (
      SELECT j.series, j.yr,
             CAST(j.a AS DOUBLE) * j.k1 / j.ref_sum AS slope_ratio,
             CAST(o.sa AS DOUBLE) * o.k1 / o.sr AS overall_ratio
      FROM joined j JOIN overall o USING (series)
    )
    SELECT series, yr, {R('slope_ratio', 6)} AS slope_ratio,
           {R('overall_ratio', 6)} AS overall_ratio,
           (abs(slope_ratio - overall_ratio)
            > CAST(0.2 AS DOUBLE) * overall_ratio) AS flagged
    FROM r
"""


@register("double_mass_screen", oracle=_DMASS_ORACLE)
def double_mass_screen_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annual double-mass slope ratios per order priority vs the mean
    of the other priorities, with 20%-deviation flags."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.col("o_orderdate").alias("d"),
    ).agg(F.sum(F.floor(F.col("o_totalprice") * 1e6 + F.lit(0.5))
                .cast("long")).alias("vq"))
    annual = daily.groupBy("series", "yr").agg(F.sum("vq").alias("a"))
    totals = annual.groupBy("yr").agg(
        F.sum("a").alias("tot"), F.count(F.lit(1)).alias("k"))
    joined = annual.join(F.broadcast(totals), "yr").select(
        "series", "yr", "a",
        (F.col("tot") - F.col("a")).alias("ref_sum"),
        (F.col("k") - 1).alias("k1"))
    overall = joined.groupBy("series").agg(
        F.sum("a").alias("sa"), F.sum("ref_sum").alias("sr"),
        F.min("k1").alias("ok1"))
    r = joined.join(F.broadcast(overall), "series").select(
        "series", "yr",
        (F.col("a").cast("double") * F.col("k1") / F.col("ref_sum"))
        .alias("slope_ratio"),
        (F.col("sa").cast("double") * F.col("ok1") / F.col("sr"))
        .alias("overall_ratio"))
    out = r.withColumn(
        "flagged",
        F.abs(F.col("slope_ratio") - F.col("overall_ratio"))
        > 0.2 * F.col("overall_ratio"))
    return _round(out, {"slope_ratio": 6, "overall_ratio": 6})


# ---------------------------------------------------------------------------
# Corpus datacard v2: the per-source release card upgraded with the
# round-8 signals — merge-table-EXACT BPE token totals (distinct words
# encoded once, joined back against per-source counts) and the full
# multi-language mix, alongside dup rate and mean quality.
# ---------------------------------------------------------------------------

def _datacard_v2_oracle() -> str:
    from .functions.bpe import PRETOKEN_RE, oracle_replace_chain

    chain = oracle_replace_chain(
        "'|' || regexp_replace(w, '(.)', '\\1||', 'g')")
    return f"""
    WITH base AS (
      SELECT doc_id, source, text,
             string_split(lower(text), ' ') AS toks,
             len(string_split(text, ' ')) AS ws_tokens,
             md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
      FROM documents
    ), langed AS (
      SELECT doc_id, source, ws_tokens, fp,
             CASE
               WHEN greatest({_lang_filter_sql('de')},
                             {_lang_filter_sql('en')},
                             {_lang_filter_sql('es')},
                             {_lang_filter_sql('fr')}) < 0.05 THEN 'und'
               WHEN {_lang_filter_sql('de')} >= {_lang_filter_sql('en')}
                AND {_lang_filter_sql('de')} >= {_lang_filter_sql('es')}
                AND {_lang_filter_sql('de')} >= {_lang_filter_sql('fr')}
                 THEN 'de'
               WHEN {_lang_filter_sql('en')} >= {_lang_filter_sql('es')}
                AND {_lang_filter_sql('en')} >= {_lang_filter_sql('fr')}
                 THEN 'en'
               WHEN {_lang_filter_sql('es')} >= {_lang_filter_sql('fr')}
                 THEN 'es'
               ELSE 'fr'
             END AS lang
      FROM base
    ), wc AS (
      SELECT source, w, count(*) AS cnt FROM (
        SELECT source,
               unnest(regexp_extract_all(lower(text), '{PRETOKEN_RE}'))
                 AS w
        FROM documents)
      GROUP BY 1, 2
    ), enc AS (
      SELECT w,
             CAST(len(string_split(trim({chain}, '|'), '||')) AS BIGINT)
               AS n_bpe
      FROM (SELECT DISTINCT w FROM wc)
    ), bpe AS (
      SELECT source, sum(cnt * n_bpe) AS bpe_tokens
      FROM wc JOIN enc USING (w) GROUP BY 1
    ), dup AS (
      SELECT source, doc_id,
             count(*) OVER (PARTITION BY source, fp) AS m
      FROM base
    ), qual AS (
      SELECT doc_id,
             CAST(floor((least(length(text) / 200.0, 1.0)
               + least(CAST(len(list_filter(toks, t -> t IN
                   ('the','a','an','and','or','of','to','in','is','it',
                    'that','for','on','with','as','are','was','at','by',
                    'be'))) AS DOUBLE) / greatest(len(toks), 1) * 5.0,
                 1.0)
               + (1.0 - least((length(text) - length(regexp_replace(
                     text, '[^a-zA-Z0-9 ]', '', 'g')))
                   / CAST(greatest(length(text), 1) AS DOUBLE) * 4.0,
                   1.0))) / 3.0 * 1000000 + CAST(0.5 AS DOUBLE))
               AS BIGINT) AS ql
      FROM base
    ), agg AS (
      SELECT l.source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(l.ws_tokens) AS BIGINT) AS ws_tokens,
             CAST(sum(CASE WHEN d.m > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_docs,
             sum(q.ql) AS sql_,
             CAST(sum(CASE WHEN l.lang = 'en' THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) AS en_share,
             CAST(sum(CASE WHEN l.lang = 'fr' THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) AS fr_share,
             CAST(sum(CASE WHEN l.lang = 'und' THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) AS und_share
      FROM langed l JOIN dup d USING (source, doc_id)
      JOIN qual q ON q.doc_id = l.doc_id
      GROUP BY 1
    )
    SELECT a.source, a.n_docs, a.ws_tokens, b.bpe_tokens AS bpe_tokens,
           a.n_dup_docs,
           {R('a.sql_ / 1000000.0 / a.n_docs', 6)} AS mean_quality,
           {R('a.en_share', 6)} AS en_share,
           {R('a.fr_share', 6)} AS fr_share,
           {R('a.und_share', 6)} AS und_share
    FROM agg a JOIN bpe b USING (source)
"""


@register("corpus_datacard_v2", oracle=_datacard_v2_oracle())
def corpus_datacard_v2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source datacard with exact BPE totals and language mix."""
    from .functions import text as X
    from .functions.bpe import PRETOKEN_RE, word_token_counts
    from .functions.text import fingerprint, quality_score

    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source",
        F.size(F.split(F.col("text"), " ")).cast("long")
        .alias("ws_tokens"),
        fingerprint(F.col("text")).alias("fp"),
        X.lang_id_multi(F.col("text")).alias("lang"),
        F.floor(quality_score(F.col("text")) * 1e6 + F.lit(0.5))
        .cast("long").alias("ql"),
    )
    base = base.withColumn(
        "__m",
        F.count(F.lit(1)).over(Window.partitionBy("source", "fp")))
    wc = docs.select(
        "source",
        F.explode(F.expr(
            f"regexp_extract_all(lower(text), '{PRETOKEN_RE}', 0)"))
        .alias("w")).groupBy("source", "w").agg(
        F.count(F.lit(1)).alias("cnt"))
    enc = word_token_counts(wc)
    bpe = wc.join(enc, "w").groupBy("source").agg(
        F.sum(F.col("cnt") * F.col("n_bpe_tokens")).cast("long")
        .alias("bpe_tokens"))
    agg = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ws_tokens").alias("ws_tokens"),
        F.sum(F.when(F.col("__m") > 1, 1).otherwise(0)).cast("long")
        .alias("n_dup_docs"),
        (F.sum("ql") / 1e6 / F.count(F.lit(1))).alias("mean_quality"),
        (F.sum((F.col("lang") == "en").cast("int")).cast("double")
         / F.count(F.lit(1))).alias("en_share"),
        (F.sum((F.col("lang") == "fr").cast("int")).cast("double")
         / F.count(F.lit(1))).alias("fr_share"),
        (F.sum((F.col("lang") == "und").cast("int")).cast("double")
         / F.count(F.lit(1))).alias("und_share"),
    )
    out = agg.join(bpe, "source")
    return _round(
        out.select("source", "n_docs", "ws_tokens", "bpe_tokens",
                   "n_dup_docs", "mean_quality", "en_share", "fr_share",
                   "und_share"),
        {"mean_quality": 6, "en_share": 6, "fr_share": 6,
         "und_share": 6})


# ---------------------------------------------------------------------------
# Antecedent precipitation index: API_t = sum over the past 30 days of
# k^age * P. Decay weights are PYTHON-computed literals indexed by age
# (no cross-engine pow), values micro-quantized, the 30-day lookback a
# bounded self-join fan-out (30 rows per measurement) keyed per
# series. The soil-moisture proxy behind storm-response analysis.
# ---------------------------------------------------------------------------

_API_K = 0.9
_API_WINDOW = 30
_API_WEIGHTS = [(_API_K ** j) for j in range(_API_WINDOW)]

_API_W_CASE = "CASE age " + " ".join(
    f"WHEN {j} THEN CAST({w!r} AS DOUBLE)"
    for j, w in enumerate(_API_WEIGHTS)) + " END"

_API_ORACLE = f"""
    WITH daily AS (
      SELECT o_orderpriority AS series, o_orderdate AS d,
             sum(CAST(floor(o_totalprice * 1000
                            + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS pq
      FROM orders GROUP BY 1, 2
    ), bk AS (
      SELECT series, d, pq,
             datediff('day', DATE '1970-01-01', CAST(d AS DATE))
               // {_API_WINDOW} AS bucket
      FROM daily
    ), breg AS (
      -- banded join: each contributor registers in its own bucket and
      -- the next, so a target joins on an EQUI key and the per-pair
      -- filter sees only a bounded 2-bucket candidate set (never a
      -- per-series cross product)
      SELECT series, d, pq, bucket + r.o AS reg
      FROM bk CROSS JOIN (SELECT unnest([0, 1]) AS o) r
    ), pairs AS (
      SELECT a.series, a.d,
             datediff('day', b.d, a.d) AS age,
             b.pq
      FROM bk a JOIN breg b
        ON b.series = a.series AND b.reg = a.bucket
      WHERE datediff('day', b.d, a.d) BETWEEN 0 AND {_API_WINDOW - 1}
    ), terms AS (
      SELECT series, d,
             CAST(floor(pq * ({_API_W_CASE}) + CAST(0.5 AS DOUBLE))
                  AS BIGINT) AS tu
      FROM pairs
    )
    SELECT series, d AS date,
           {R('sum(tu) / CAST(1e3 AS DOUBLE)', 6)} AS api
    FROM terms GROUP BY 1, 2
"""


@register("antecedent_index", oracle=_API_ORACLE)
def antecedent_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day decayed antecedent index per priority over daily totals
    (k = 0.9, literal weights, exact milli-unit accumulation)."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.col("o_orderdate").alias("d"),
    ).agg(F.sum(F.floor(F.col("o_totalprice") * 1000 + F.lit(0.5))
                .cast("long")).alias("pq"))
    epoch = F.lit("1970-01-01").cast("date")
    bucket = F.floor(
        F.datediff(F.col("d").cast("date"), epoch) / _API_WINDOW)
    a = daily.select("series", F.col("d").alias("da"),
                     bucket.alias("__bk"))
    # banded join: contributors register in their bucket and the next
    b = daily.select("series", F.col("d").alias("db"), "pq",
                     bucket.alias("__b0")).select(
        "series", "db", "pq",
        F.explode(F.array(F.col("__b0"), F.col("__b0") + 1))
        .alias("__bk"))
    dd = F.datediff(F.col("da"), F.col("db"))
    pairs = a.join(b, ["series", "__bk"]).where(
        (dd >= 0) & (dd <= _API_WINDOW - 1))
    age = F.datediff(F.col("da"), F.col("db"))
    w_case = None
    for j, wgt in enumerate(_API_WEIGHTS):
        w_case = (F.when(age == j, F.lit(wgt)) if w_case is None
                  else w_case.when(age == j, F.lit(wgt)))
    tu = F.floor(F.col("pq") * w_case + F.lit(0.5)).cast("long")
    out = pairs.withColumn("__tu", tu).groupBy(
        "series", F.col("da").alias("date")).agg(
        (F.sum("__tu") / F.lit(1e3)).alias("api"))
    return _round(out, {"api": 6})


# ---------------------------------------------------------------------------
# Event co-occurrence lift: per ordered event-type pair, support,
# confidence, and lift over per-user presence sets — pair mass bounded
# at n_types^2 after a per-user distinct (the market-basket shape).
# ---------------------------------------------------------------------------

_LIFT_ORACLE = f"""
    WITH pres AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), nu AS (
      SELECT count(DISTINCT user_id) AS n FROM events
    ), singles AS (
      SELECT event_type, count(*) AS c FROM pres GROUP BY 1
    ), pairs AS (
      SELECT a.event_type AS lhs, b.event_type AS rhs, count(*) AS cb
      FROM pres a JOIN pres b
        ON b.user_id = a.user_id AND b.event_type != a.event_type
      GROUP BY 1, 2
    )
    SELECT p.lhs, p.rhs, CAST(p.cb AS BIGINT) AS n_both,
           {R('CAST(p.cb AS DOUBLE) / nu.n', 6)} AS support,
           {R('CAST(p.cb AS DOUBLE) / sl.c', 6)} AS confidence,
           {R('CAST(p.cb AS DOUBLE) * nu.n'
              ' / (CAST(sl.c AS BIGINT) * sr.c)', 6)} AS lift
    FROM pairs p
    JOIN singles sl ON sl.event_type = p.lhs
    JOIN singles sr ON sr.event_type = p.rhs
    CROSS JOIN nu
"""


@register("event_cooccurrence_lift", oracle=_LIFT_ORACLE)
def event_cooccurrence_lift_q(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Support / confidence / lift for ordered event-type pairs over
    per-user presence sets."""
    ev = _t(spark, sf_dir, "events")
    pres = ev.select("user_id", "event_type").distinct()
    nu = pres.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("n"))
    singles = pres.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("c"))
    a = pres.select("user_id", F.col("event_type").alias("lhs"))
    b = pres.select("user_id", F.col("event_type").alias("rhs"))
    pairs = a.join(b, "user_id").where(F.col("lhs") != F.col("rhs")) \
        .groupBy("lhs", "rhs").agg(F.count(F.lit(1)).alias("cb"))
    out = (
        pairs
        .join(F.broadcast(singles.select(
            F.col("event_type").alias("lhs"), F.col("c").alias("cl"))),
            "lhs")
        .join(F.broadcast(singles.select(
            F.col("event_type").alias("rhs"), F.col("c").alias("cr"))),
            "rhs")
        .crossJoin(F.broadcast(nu))
        .select(
            "lhs", "rhs", F.col("cb").cast("long").alias("n_both"),
            (F.col("cb").cast("double") / F.col("n")).alias("support"),
            (F.col("cb").cast("double") / F.col("cl"))
            .alias("confidence"),
            (F.col("cb").cast("double") * F.col("n")
             / (F.col("cl").cast("long") * F.col("cr"))).alias("lift"),
        )
    )
    return _round(out, {"support": 6, "confidence": 6, "lift": 6})


# ---------------------------------------------------------------------------
# Flood frequency (Gumbel / EV1 by method of moments over annual
# maxima): x_T = u + a*K_T with a = std*sqrt(6)/pi, u = mean -
# gamma*a, K_T = -ln(-ln(1 - 1/T)). Every transcendental constant is a
# PYTHON-inlined literal; moments come from exact centi-unit integer
# sums (annual maxima are few per series, so the squared sums stay in
# bigint range); sample variance via the integer identity
# n*Sxx - Sx^2.
# ---------------------------------------------------------------------------

_GUMBEL_A = 0.779696801233676       # sqrt(6)/pi
_GUMBEL_G = 0.5772156649015329      # Euler-Mascheroni
_GUMBEL_K = {2: 0.36651292058166435, 10: 2.2503673273124454,
             100: 4.600149226776579}

_FLOOD_ORACLE = f"""
    WITH daily AS (
      SELECT o_orderpriority AS series,
             CAST(year(o_orderdate) AS INT) AS yr,
             max(CAST(floor(o_totalprice * 100
                            + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS mq
      FROM orders GROUP BY 1, 2
    ), mom AS (
      SELECT series, CAST(count(*) AS BIGINT) AS n,
             sum(mq) AS sx, sum(mq * mq) AS sxx
      FROM daily GROUP BY 1
    ), fit AS (
      SELECT series, n,
             CAST(sx AS DOUBLE) / n / 100 AS mean,
             sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                  / (n * (n - 1))) / 100 AS std
      FROM mom WHERE n >= 2
    ), params AS (
      SELECT series, n, mean, std,
             std * CAST({_GUMBEL_A!r} AS DOUBLE) AS a,
             mean - CAST({_GUMBEL_G!r} AS DOUBLE)
               * (std * CAST({_GUMBEL_A!r} AS DOUBLE)) AS u
      FROM fit
    )
    SELECT series, n AS n_years, {R('mean', 6)} AS mean,
           {R('std', 6)} AS std,
           {R(f'u + a * CAST({_GUMBEL_K[2]!r} AS DOUBLE)', 6)} AS q2,
           {R(f'u + a * CAST({_GUMBEL_K[10]!r} AS DOUBLE)', 6)} AS q10,
           {R(f'u + a * CAST({_GUMBEL_K[100]!r} AS DOUBLE)', 6)}
             AS q100
    FROM params
"""


@register("flood_frequency_gumbel", oracle=_FLOOD_ORACLE)
def flood_frequency_gumbel_q(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Gumbel MoM flood quantiles (T = 2/10/100) per order priority
    from annual maxima."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.year("o_orderdate").cast("int").alias("yr"),
    ).agg(F.max(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                .cast("long")).alias("mq"))
    mom = daily.groupBy("series").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mq").alias("sx"),
        F.sum(F.col("mq") * F.col("mq")).alias("sxx"))
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    fit = mom.where(n >= 2).select(
        "series", n,
        (sx.cast("double") / n / 100).alias("mean"),
        (F.sqrt((n * sxx - sx * sx).cast("double") / (n * (n - 1)))
         / 100).alias("std"))
    a = F.col("std") * F.lit(_GUMBEL_A)
    u = F.col("mean") - F.lit(_GUMBEL_G) * a
    out = fit.select(
        "series", n.alias("n_years"), "mean", "std",
        (u + a * F.lit(_GUMBEL_K[2])).alias("q2"),
        (u + a * F.lit(_GUMBEL_K[10])).alias("q10"),
        (u + a * F.lit(_GUMBEL_K[100])).alias("q100"))
    return _round(out, {"mean": 6, "std": 6, "q2": 6, "q10": 6,
                        "q100": 6})


# ---------------------------------------------------------------------------
# Lyne-Hollick baseflow separation (operators/trend.baseflow_separation):
# the prefix-dependent forward filter as a per-series Arrow kernel; the
# oracle replays the recurrence row-by-row with a recursive CTE (same
# IEEE op order). One year of daily maxima keeps the recursion depth
# at ~365.
# ---------------------------------------------------------------------------

_BASEFLOW_ALPHA = 0.925
_BASEFLOW_K = (1 + _BASEFLOW_ALPHA) / 2

_BASEFLOW_ORACLE = f"""
    WITH RECURSIVE daily AS (
      SELECT o_orderpriority AS series, o_orderdate AS d,
             max(o_totalprice) AS v
      FROM orders WHERE year(o_orderdate) = 1994 GROUP BY 1, 2
    ), idx AS (
      SELECT series, d, v,
             row_number() OVER (PARTITION BY series ORDER BY d) AS rn
      FROM daily
    ), scan AS (
      SELECT series, rn, d, v, v AS f
      FROM idx WHERE rn = 1
      UNION ALL
      SELECT i.series, i.rn, i.d, i.v,
             CAST({_BASEFLOW_ALPHA!r} AS DOUBLE) * s.f
               + CAST({_BASEFLOW_K!r} AS DOUBLE) * (i.v - s.v) AS f
      FROM scan s JOIN idx i ON i.series = s.series AND i.rn = s.rn + 1
    )
    SELECT series, d AS date, v AS value,
           {R('f', 6)} AS quickflow,
           {R('least(greatest(v - greatest(f, CAST(0 AS DOUBLE)),'
              ' CAST(0 AS DOUBLE)), v)', 6)} AS baseflow
    FROM scan
"""


@register("baseflow_separation", oracle=_BASEFLOW_ORACLE)
def baseflow_separation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Lyne-Hollick filter over 1994 daily maxima per
    priority."""
    from .operators.trend import baseflow_separation

    o = _t(spark, sf_dir, "orders").where(
        F.year("o_orderdate") == 1994)
    daily = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.col("o_orderdate").alias("date"),
    ).agg(F.max("o_totalprice").alias("value"))
    out = baseflow_separation(daily, ["series"],
                              alpha=_BASEFLOW_ALPHA)
    return _round(out, {"quickflow": 6, "baseflow": 6})


# ---------------------------------------------------------------------------
# Record completeness report: per series, the span, present-day count,
# completeness ratio, gap count, and longest gap — the
# data-availability table of a hydrometric publication. All integer
# day arithmetic (lag over the per-series daily dates).
# ---------------------------------------------------------------------------

_COMPLETENESS_ORACLE = """
    WITH daily AS (
      SELECT DISTINCT o_orderpriority AS series, o_orderdate AS d
      FROM orders WHERE o_orderkey % 3 != 1
    ), gaps AS (
      SELECT series, d,
             datediff('day',
                      lag(d) OVER (PARTITION BY series ORDER BY d),
                      d) AS step
      FROM daily
    ), agg AS (
      SELECT series,
             CAST(min(d) AS DATE) AS first_day,
             CAST(max(d) AS DATE) AS last_day,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CASE WHEN step > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_gaps,
             CAST(coalesce(max(CASE WHEN step > 1 THEN step - 1 END), 0)
                  AS BIGINT) AS longest_gap_days,
             datediff('day', min(d), max(d)) + 1 AS span_days
      FROM gaps GROUP BY 1
    )
    SELECT series, first_day, last_day, n_days,
           CAST(span_days AS BIGINT) AS span_days, n_gaps,
           longest_gap_days,
           {c} AS completeness
    FROM agg
""".format(c=R("CAST(n_days AS DOUBLE) / span_days", 6))


@register("record_completeness", oracle=_COMPLETENESS_ORACLE)
def record_completeness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority availability report over a gappy daily record
    (every third order key dropped to create holes)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 3 != 1)
    daily = o.select(
        F.col("o_orderpriority").alias("series"),
        F.col("o_orderdate").alias("d")).distinct()
    w = Window.partitionBy("series").orderBy("d")
    gaps = daily.withColumn(
        "step", F.datediff(F.col("d"), F.lag("d").over(w)))
    agg = gaps.groupBy("series").agg(
        F.min("d").cast("date").alias("first_day"),
        F.max("d").cast("date").alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.when(F.col("step") > 1, 1).otherwise(0)).cast("long")
        .alias("n_gaps"),
        F.coalesce(
            F.max(F.when(F.col("step") > 1, F.col("step") - 1)),
            F.lit(0)).cast("long").alias("longest_gap_days"),
        (F.datediff(F.max("d"), F.min("d")) + 1).cast("long")
        .alias("span_days"),
    )
    out = agg.select(
        "series", "first_day", "last_day", "n_days", "span_days",
        "n_gaps", "longest_gap_days",
        (F.col("n_days").cast("double") / F.col("span_days"))
        .alias("completeness"))
    return _round(out, {"completeness": 6})


# ---------------------------------------------------------------------------
# Table profile: the per-column data-quality card (row/null counts,
# min/max, HLL distinct estimate, top value) in long form — distinct
# counts ride the bounded HLL sketch (exact COUNT DISTINCT of a
# web-scale column is the shuffle the sketch tier exists to avoid);
# the top-1 pass is exact with a deterministic tiebreak.
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["o_orderpriority", "o_orderstatus", "o_custkey"]


def _profile_col_sql(c: str) -> str:
    a = _HLL_ALPHA
    return f"""
    SELECT '{c}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(min(CAST({c} AS VARCHAR)) AS VARCHAR) AS min_value,
           CAST(max(CAST({c} AS VARCHAR)) AS VARCHAR) AS max_value,
           (SELECT {R(f'''CASE WHEN CAST({a!r} AS DOUBLE) * 256.0 * 256.0
                       * 9007199254740992.0 / s_units <= 640.0
                       AND zeros > 0
                  THEN 256.0 * ln(CAST(256 AS DOUBLE) / zeros)
                  ELSE CAST({a!r} AS DOUBLE) * 256.0 * 256.0
                       * 9007199254740992.0 / s_units END''', 2)}
            FROM (SELECT 256 - count(*) AS zeros,
                         sum(CAST(1 AS BIGINT) << (53 - m))
                           + (256 - count(*))
                             * (CAST(1 AS BIGINT) << 53) AS s_units
                  FROM (SELECT hh % 256 AS idx,
                               max(CASE WHEN hh // 256 > 0
                                        THEN 52 - (length(bin(hh // 256))
                                                   - 1)
                                        ELSE 53 END) AS m
                        FROM (SELECT CAST('0x' || substr(md5(
                                       CAST({c} AS VARCHAR)), 1, 15)
                                     AS BIGINT) AS hh
                              FROM orders WHERE {c} IS NOT NULL)
                        GROUP BY 1))) AS distinct_est,
           (SELECT CAST(v AS VARCHAR) FROM (
              SELECT CAST({c} AS VARCHAR) AS v, count(*) AS cnt
              FROM orders GROUP BY 1
              ORDER BY cnt DESC, v ASC LIMIT 1)) AS top_value
    FROM orders
"""


_PROFILE_ORACLE = " UNION ALL ".join(
    _profile_col_sql(c) for c in _PROFILE_COLS)


@register("table_profile", oracle=_PROFILE_ORACLE)
def table_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form profile of three orders columns."""
    from .operators.sketch import hll_distinct

    o = _t(spark, sf_dir, "orders")
    parts = []
    for c in _PROFILE_COLS:
        s = F.col(c).cast("string")
        base = o.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col(c).isNull().cast("int")).cast("long")
            .alias("n_nulls"),
            F.min(s).alias("min_value"),
            F.max(s).alias("max_value"),
        ).withColumn("column_name", F.lit(c))
        est = hll_distinct(o.select(s.alias("__k")), "__k", [], 8) \
            .select(F.col("estimate").alias("distinct_est"))
        top = (
            o.where(F.col(c).isNotNull())
            .groupBy(s.alias("v")).agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("v")).limit(1)
            .select(F.col("v").alias("top_value"))
        )
        parts.append(
            base.crossJoin(F.broadcast(est)).crossJoin(F.broadcast(top))
            .select("column_name", "n_rows", "n_nulls", "min_value",
                    "max_value", "distinct_est", "top_value"))
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return _round(out, {"distinct_est": 2})


# ---------------------------------------------------------------------------
# TFPW Mann-Kendall (Yue & Pilon 2002 trend-free prewhitening): serial
# correlation inflates MK's variance, so (1) estimate Sen's slope,
# (2) detrend, (3) estimate lag-1 autocorrelation r1 of the detrended
# series EXACTLY (centi-quantized values; the n^2-scaled covariance
# identity keeps every term an integer — Spark sums them as
# DECIMAL(38,0), DuckDB as HUGEINT), (4) prewhiten y_t = x'_t -
# r1*x'_{t-1}, (5) re-add the trend and run MK on the blend. The r1
# float appears only once per series-year, so the downstream 1e-6
# quantization inside MK keeps the whole chain hash-exact.
# ---------------------------------------------------------------------------

_TFPW_ORACLE = """
    WITH daily AS (
      SELECT o_orderpriority AS series,
             CAST(year(o_orderdate) AS INT) AS yr,
             o_orderdate AS d, max(o_totalprice) AS v
      FROM orders WHERE year(o_orderdate) IN (1993, 1994)
      GROUP BY 1, 2, 3
    ), q AS (
      SELECT series, yr,
             datediff('day', DATE '1970-01-01', CAST(d AS DATE)) AS t,
             CAST(floor(CAST(v AS DOUBLE) * 1000000
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS vq
      FROM daily
    ), beta AS (
      SELECT a.series AS series, a.yr AS yr,
             quantile_cont(CAST(b.vq - a.vq AS DOUBLE)
                           / CAST(1e6 AS DOUBLE) / (b.t - a.t), 0.5)
               AS beta
      FROM q a JOIN q b ON b.series = a.series AND b.yr = a.yr
                        AND b.t > a.t
      GROUP BY 1, 2
    ), detr AS (
      SELECT q.series, q.yr, q.t,
             CAST(floor((q.vq / CAST(1e6 AS DOUBLE)
                         - bb.beta * q.t) * 100
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS xq,
             bb.beta
      FROM q JOIN beta bb USING (series, yr)
    ), stats AS (
      SELECT series, yr, count(*) AS n, sum(xq) AS s
      FROM detr GROUP BY 1, 2
    ), lagged AS (
      SELECT d.series, d.yr, d.t, d.xq, d.beta,
             lag(d.xq) OVER (PARTITION BY d.series, d.yr
                             ORDER BY d.t) AS pxq
      FROM detr d
    ), r1 AS (
      SELECT l.series, l.yr,
             sum(CASE WHEN l.pxq IS NOT NULL THEN
                   CAST(st.n * l.pxq - st.s AS HUGEINT)
                   * CAST(st.n * l.xq - st.s AS HUGEINT) END) AS num,
             sum(CAST(st.n * l.xq - st.s AS HUGEINT)
                 * CAST(st.n * l.xq - st.s AS HUGEINT)) AS den
      FROM lagged l JOIN stats st USING (series, yr)
      GROUP BY 1, 2
    ), blended AS (
      SELECT l.series, l.yr, l.t,
             CAST(floor((CASE WHEN l.pxq IS NULL
                              THEN l.xq / CAST(100 AS DOUBLE)
                              ELSE l.xq / CAST(100 AS DOUBLE)
                                   - (CAST(r.num AS DOUBLE) / r.den)
                                     * (l.pxq / CAST(100 AS DOUBLE))
                         END + l.beta * l.t) * 1000000
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS zq,
             CAST(r.num AS DOUBLE) / r.den AS r1,
             l.beta
      FROM lagged l JOIN r1 r USING (series, yr)
    ), pairs AS (
      SELECT a.series AS series, a.yr AS yr,
             CASE WHEN b.zq > a.zq THEN 1
                  WHEN b.zq < a.zq THEN -1 ELSE 0 END AS sgn
      FROM blended a JOIN blended b
        ON b.series = a.series AND b.yr = a.yr AND b.t > a.t
    ), st2 AS (
      SELECT series, yr, CAST(sum(sgn) AS BIGINT) AS s_stat
      FROM pairs GROUP BY 1, 2
    ), nd AS (
      SELECT series, yr, count(*) AS n FROM blended GROUP BY 1, 2
    ), ties AS (
      SELECT series, yr, sum(c * (c - 1) * (2 * c + 5)) AS tiesum
      FROM (SELECT series, yr, zq, count(*) AS c FROM blended
            GROUP BY 1, 2, 3)
      GROUP BY 1, 2
    ), fin AS (
      SELECT s2.series, s2.yr, nd.n, s2.s_stat,
             CAST(nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tiesum
                  AS DOUBLE) / CAST(18 AS DOUBLE) AS var_s,
             (SELECT max(r1) FROM blended b
              WHERE b.series = s2.series AND b.yr = s2.yr) AS r1,
             (SELECT max(beta) FROM blended b
              WHERE b.series = s2.series AND b.yr = s2.yr) AS beta
      FROM st2 s2 JOIN nd USING (series, yr) JOIN ties USING (series, yr)
      WHERE nd.n >= 2
    )
    SELECT series, yr, CAST(n AS BIGINT) AS n_days, s_stat,
           {bt} AS beta, {rr} AS r1, {vr} AS var_s, {zz} AS z
    FROM fin
""".format(
    bt=R("beta", 6), rr=R("r1", 6), vr=R("var_s", 6),
    zz=R("""CASE WHEN var_s > 0 THEN
              CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                   WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                   ELSE CAST(0 AS DOUBLE) END
            END""", 6),
)


@register("tfpw_mann_kendall", oracle=_TFPW_ORACLE)
def tfpw_mann_kendall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend-free prewhitened MK per (priority, 1993/1994): Sen
    detrend, exact integer lag-1 autocorrelation, prewhiten, re-trend,
    MK on the blend."""
    o = _t(spark, sf_dir, "orders").where(
        F.year("o_orderdate").isin(1993, 1994))
    daily = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.col("o_orderdate").alias("d"),
    ).agg(F.max("o_totalprice").alias("v"))
    t = F.datediff(F.col("d").cast("date"),
                   F.lit("1970-01-01").cast("date"))
    vq = F.floor(F.col("v").cast("double") * 1e6 + F.lit(0.5)) \
        .cast("long")
    q = daily.select("series", "yr", t.alias("t"), vq.alias("vq"))
    a = q.select("series", "yr", F.col("t").alias("ta"),
                 F.col("vq").alias("va"))
    b = q.select("series", "yr", F.col("t").alias("tb"),
                 F.col("vq").alias("vb"))
    slope = ((F.col("vb") - F.col("va")).cast("double") / F.lit(1e6)
             / (F.col("tb") - F.col("ta")))
    beta = (a.join(b, ["series", "yr"])
            .where(F.col("tb") > F.col("ta"))
            .withColumn("__sl", slope)
            .groupBy("series", "yr")
            .agg(F.expr("percentile(__sl, 0.5)").alias("beta")))
    detr = q.join(beta, ["series", "yr"]).select(
        "series", "yr", "t", "beta",
        F.floor((F.col("vq") / F.lit(1e6) - F.col("beta") * F.col("t"))
                * 100 + F.lit(0.5)).cast("long").alias("xq"))
    stats = detr.groupBy("series", "yr").agg(
        F.count(F.lit(1)).alias("n"), F.sum("xq").alias("s"))
    wlag = Window.partitionBy("series", "yr").orderBy("t")
    lagged = detr.withColumn("pxq", F.lag("xq").over(wlag)) \
        .join(stats, ["series", "yr"])
    dec = "decimal(38,0)"
    cur = (F.col("n") * F.col("xq") - F.col("s")).cast(dec)
    prv = (F.col("n") * F.col("pxq") - F.col("s")).cast(dec)
    r1f = lagged.groupBy("series", "yr").agg(
        F.sum(F.when(F.col("pxq").isNotNull(), prv * cur)).alias("num"),
        F.sum(cur * cur).alias("den"))
    r1v = (F.col("num").cast("double") / F.col("den").cast("double"))
    blended = lagged.join(r1f, ["series", "yr"]).select(
        "series", "yr", "t", "beta",
        r1v.alias("r1"),
        F.floor((
            F.when(F.col("pxq").isNull(),
                   F.col("xq") / F.lit(100.0))
            .otherwise(F.col("xq") / F.lit(100.0)
                       - r1v * (F.col("pxq") / F.lit(100.0)))
            + F.col("beta") * F.col("t")) * 1e6 + F.lit(0.5))
        .cast("long").alias("zq"))
    za = blended.select("series", "yr", F.col("t").alias("ta"),
                        F.col("zq").alias("va"))
    zb = blended.select("series", "yr", F.col("t").alias("tb"),
                        F.col("zq").alias("vb"))
    sgn = (F.when(F.col("vb") > F.col("va"), 1)
           .when(F.col("vb") < F.col("va"), -1).otherwise(0))
    st2 = (za.join(zb, ["series", "yr"])
           .where(F.col("tb") > F.col("ta"))
           .withColumn("__sgn", sgn)
           .groupBy("series", "yr")
           .agg(F.sum("__sgn").cast("long").alias("s_stat")))
    nd = blended.groupBy("series", "yr").agg(
        F.count(F.lit(1)).alias("n"))
    ties = (blended.groupBy("series", "yr", "zq")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("series", "yr")
            .agg(F.sum(F.col("c") * (F.col("c") - 1)
                       * (2 * F.col("c") + 5)).alias("tiesum")))
    meta = blended.groupBy("series", "yr").agg(
        F.max("r1").alias("r1"), F.max("beta").alias("beta"))
    n = F.col("n")
    var_s = ((n * (n - 1) * (2 * n + 5) - F.col("tiesum"))
             .cast("double") / F.lit(18.0))
    s = F.col("s_stat")
    out = (st2.join(nd, ["series", "yr"]).join(ties, ["series", "yr"])
           .join(meta, ["series", "yr"])
           .withColumn("var_s", var_s)
           .where(n >= 2)
           .withColumn(
               "z",
               F.when(F.col("var_s") > 0,
                      F.when(s > 0, (s - 1) / F.sqrt(F.col("var_s")))
                      .when(s < 0, (s + 1) / F.sqrt(F.col("var_s")))
                      .otherwise(F.lit(0.0))))
           .select("series", "yr", n.cast("long").alias("n_days"),
                   "s_stat", "beta", "r1", "var_s", "z"))
    return _round(out, {"beta": 6, "r1": 6, "var_s": 6, "z": 6})


# ---------------------------------------------------------------------------
# Intensity-duration-frequency (IDF): annual maxima of 1/3/7-day
# rolling totals (micro-quantized before the window sums) fed through
# the Gumbel MoM fit -> the T=10 design intensity per duration. The
# depth-duration composition of the 7Q and flood-frequency machinery.
# ---------------------------------------------------------------------------

_IDF_DURS = [1, 3, 7]

_IDF_ROLL_SQL = " UNION ALL ".join(f"""
      SELECT series, yr, {dur} AS duration_days,
             sum(vq) OVER (PARTITION BY series ORDER BY d
                           ROWS BETWEEN {dur - 1} PRECEDING
                           AND CURRENT ROW) AS s,
             count(*) OVER (PARTITION BY series ORDER BY d
                            ROWS BETWEEN {dur - 1} PRECEDING
                            AND CURRENT ROW) AS c
      FROM q""" for dur in _IDF_DURS)

_IDF_ORACLE = f"""
    WITH daily AS (
      SELECT o_orderpriority AS series,
             CAST(year(o_orderdate) AS INT) AS yr, o_orderdate AS d,
             sum(CAST(floor(o_totalprice * 100
                            + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS vq
      FROM orders GROUP BY 1, 2, 3
    ), q AS (SELECT * FROM daily), rolls AS (
      {_IDF_ROLL_SQL}
    ), annual AS (
      SELECT series, duration_days, yr, max(s) AS mq
      FROM rolls WHERE c = duration_days GROUP BY 1, 2, 3
    ), mom AS (
      SELECT series, duration_days, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(mq AS HUGEINT)) AS sx,
             sum(CAST(mq AS HUGEINT) * mq) AS sxx
      FROM annual GROUP BY 1, 2
    ), fit AS (
      SELECT series, duration_days, n,
             CAST(sx AS DOUBLE) / n / 100 AS mean,
             sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                  / (n * (n - 1))) / 100 AS std
      FROM mom WHERE n >= 2
    )
    SELECT series, CAST(duration_days AS INT) AS duration_days,
           n AS n_years, {R('mean', 6)} AS mean_depth,
           {R(f'''mean - CAST({_GUMBEL_G!r} AS DOUBLE)
                  * (std * CAST({_GUMBEL_A!r} AS DOUBLE))
                + std * CAST({_GUMBEL_A!r} AS DOUBLE)
                  * CAST({_GUMBEL_K[10]!r} AS DOUBLE)''', 6)} AS q10_depth
    FROM fit
"""


@register("idf_design_depths", oracle=_IDF_ORACLE)
def idf_design_depths_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T=10 Gumbel design depths for 1/3/7-day durations per
    priority."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.col("o_orderdate").alias("d"),
    ).agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                .cast("long")).alias("vq"))
    parts = []
    for dur in _IDF_DURS:
        w = Window.partitionBy("series").orderBy("d") \
            .rowsBetween(-(dur - 1), 0)
        r = daily.select(
            "series", "yr", F.lit(dur).alias("duration_days"),
            F.sum("vq").over(w).alias("s"),
            F.count(F.lit(1)).over(w).alias("c"),
        ).where(F.col("c") == dur)
        parts.append(r)
    rolls = parts[0]
    for x in parts[1:]:
        rolls = rolls.unionByName(x)
    annual = rolls.groupBy("series", "duration_days", "yr").agg(
        F.max("s").alias("mq"))
    mqd = F.col("mq").cast("decimal(18,0)")
    mom = annual.groupBy("series", "duration_days").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(mqd).alias("sx"),
        F.sum(mqd * mqd).alias("sxx"))
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    fit = mom.where(n >= 2).select(
        "series", "duration_days", n,
        (sx.cast("double") / n / 100).alias("mean"),
        (F.sqrt((n * sxx - sx * sx).cast("double") / (n * (n - 1)))
         / 100).alias("std"))
    a = F.col("std") * F.lit(_GUMBEL_A)
    u = F.col("mean") - F.lit(_GUMBEL_G) * a
    out = fit.select(
        "series", F.col("duration_days").cast("int"),
        n.alias("n_years"), F.col("mean").alias("mean_depth"),
        (u + a * F.lit(_GUMBEL_K[10])).alias("q10_depth"))
    return _round(out, {"mean_depth": 6, "q10_depth": 6})


# ---------------------------------------------------------------------------
# Freshet timing: the day of year by which half the annual volume has
# passed (center-of-volume date) — the standard snowmelt-shift climate
# indicator. Pure integer rank test on exact cumulative sums.
# ---------------------------------------------------------------------------

_FRESHET_ORACLE = """
    WITH daily AS (
      SELECT o_orderpriority AS series,
             CAST(year(o_orderdate) AS INT) AS yr, o_orderdate AS d,
             sum(CAST(floor(o_totalprice * 100
                            + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS vq
      FROM orders GROUP BY 1, 2, 3
    ), cum AS (
      SELECT series, yr, d, vq,
             sum(vq) OVER (PARTITION BY series, yr ORDER BY d
                           ROWS UNBOUNDED PRECEDING) AS cs,
             sum(vq) OVER (PARTITION BY series, yr) AS tot
      FROM daily
    )
    SELECT series, yr,
           CAST(min(CASE WHEN 2 * cs >= tot
                         THEN dayofyear(d) END) AS BIGINT)
             AS half_volume_doy
    FROM cum GROUP BY 1, 2
"""


@register("freshet_timing", oracle=_FRESHET_ORACLE)
def freshet_timing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Center-of-volume day of year per (priority, year)."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.col("o_orderdate").alias("d"),
    ).agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                .cast("long")).alias("vq"))
    wc = Window.partitionBy("series", "yr").orderBy("d") \
        .rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy("series", "yr")
    cum = daily.withColumn("cs", F.sum("vq").over(wc)) \
        .withColumn("tot", F.sum("vq").over(wt))
    return cum.groupBy("series", "yr").agg(
        F.min(F.when(2 * F.col("cs") >= F.col("tot"),
                     F.dayofyear("d"))).cast("long")
        .alias("half_volume_doy"))


# ---------------------------------------------------------------------------
# IDW gridding (operators/raster.idw_interpolate): sparse station
# values interpolated to target coordinates with 1/(d^2+1) weights —
# the gauge-network gridding step. Weights/values quantize to integer
# units BEFORE the sums, so the weighted mean is an exact integer
# ratio under any station order; stations broadcast, targets map-only.
# ---------------------------------------------------------------------------

_IDW_ORACLE = f"""
    WITH st AS (
      SELECT CAST(s_suppkey % 90 AS DOUBLE)
               + CAST(s_suppkey % 8 AS DOUBLE) / CAST(8 AS DOUBLE)
               AS sx,
             CAST(s_suppkey % 50 AS DOUBLE)
               + CAST(s_suppkey % 4 AS DOUBLE) / CAST(4 AS DOUBLE)
               AS sy,
             CAST(floor(s_acctbal * 100 + CAST(0.5 AS DOUBLE))
                  AS BIGINT) AS vq
      FROM supplier
    ), tg AS (
      SELECT n_nationkey AS target_id,
             CAST(n_nationkey * 7 % 90 AS DOUBLE) AS tx,
             CAST(n_nationkey * 11 % 50 AS DOUBLE) AS ty
      FROM nation
    ), j AS (
      SELECT t.target_id, t.tx, t.ty, st.vq,
             CAST(floor(CAST(1e9 AS DOUBLE)
                        / ((t.tx - st.sx) * (t.tx - st.sx)
                           + (t.ty - st.sy) * (t.ty - st.sy)
                           + CAST(1 AS DOUBLE))
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS wq
      FROM tg t CROSS JOIN st
    )
    SELECT target_id, tx, ty,
           {R("CASE WHEN sum(wq) > 0 THEN"
              " CAST(sum(wq * vq) AS DOUBLE) / sum(wq)"
              " / CAST(100 AS DOUBLE) END", 6)} AS value,
           CAST(count(*) AS BIGINT) AS n_stations
    FROM j GROUP BY 1, 2, 3
"""


@register("idw_station_gridding", oracle=_IDW_ORACLE)
def idw_station_gridding_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """25 target points interpolated from the supplier station set."""
    from .operators.raster import idw_interpolate

    s = F.col("s_suppkey")
    pts = _t(spark, sf_dir, "supplier").select(
        ((s % 90).cast("double") + (s % 8).cast("double") / 8.0)
        .alias("px"),
        ((s % 50).cast("double") + (s % 4).cast("double") / 4.0)
        .alias("py"),
        F.col("s_acctbal").alias("value"))
    n = F.col("n_nationkey")
    tg = _t(spark, sf_dir, "nation").select(
        n.alias("target_id"),
        (n * 7 % 90).cast("double").alias("tx"),
        (n * 11 % 50).cast("double").alias("ty"))
    out = idw_interpolate(pts, tg)
    return _round(out, {"value": 6})


# ---------------------------------------------------------------------------
# Verified heavy hitters: the standard two-pass shape at scale —
# pass 1 probes EVERY distinct token against the broadcast count-min
# sketch (map-side) and keeps est >= threshold candidates (CMS is
# one-sided, so no true hitter is missed); pass 2 computes EXACT
# counts for the candidate set only (broadcast semi-restriction before
# the shuffle — the full-vocabulary exact count never happens).
# ---------------------------------------------------------------------------

_VHH_ORACLE = """
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS tokk
      FROM documents
    ), tot AS (
      SELECT count(*) AS n FROM tok
    ), cells AS (
      SELECT i,
             CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || tokk),
                                 1, 15) AS BIGINT) % 1024 AS cell
      FROM tok, (SELECT unnest(range(0, 4)) AS i)
    ), sk AS (
      SELECT i AS row, cell, count(*) AS cnt FROM cells GROUP BY 1, 2
    ), dist AS (
      SELECT DISTINCT tokk FROM tok
    ), pc AS (
      SELECT tokk, i AS row,
             CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || tokk),
                                 1, 15) AS BIGINT) % 1024 AS cell
      FROM dist, (SELECT unnest(range(0, 4)) AS i)
    ), probed AS (
      SELECT tokk, min(coalesce(cnt, 0)) AS est
      FROM pc LEFT JOIN sk USING (row, cell) GROUP BY 1
    ), cand AS (
      SELECT tokk, est FROM probed, tot WHERE est * 200 >= tot.n
    ), exact AS (
      SELECT t.tokk, count(*) AS exact
      FROM tok t JOIN cand USING (tokk) GROUP BY 1
    )
    SELECT c.tokk AS token, CAST(x.exact AS BIGINT) AS exact_count,
           CAST(c.est AS BIGINT) AS est_count
    FROM cand c JOIN exact x USING (tokk) CROSS JOIN tot
    WHERE x.exact * 200 >= tot.n
"""


@register("verified_heavy_hitters", oracle=_VHH_ORACLE)
def verified_heavy_hitters_q(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Tokens above 0.5% corpus frequency: CMS candidate pass, exact
    recheck restricted to candidates."""
    from .functions.text import tokens
    from .operators.sketch import countmin_build, countmin_estimate

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("tokk"))
    tot = tok.agg(F.count(F.lit(1)).alias("n"))
    sk = countmin_build(tok, "tokk", d=4, w=1024)
    dist = tok.select("tokk").distinct()
    probed = countmin_estimate(sk, dist, "tokk", d=4, w=1024)
    cand = probed.crossJoin(F.broadcast(tot)) \
        .where(F.col("est") * 200 >= F.col("n")) \
        .select("tokk", F.col("est").alias("est_count"))
    exact = (
        tok.join(F.broadcast(cand.select("tokk")), "tokk")
        .groupBy("tokk").agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return (
        cand.join(exact, "tokk").crossJoin(F.broadcast(tot))
        .where(F.col("exact_count") * 200 >= F.col("n"))
        .select(F.col("tokk").alias("token"),
                F.col("exact_count").cast("long"),
                F.col("est_count").cast("long"))
    )


# ---------------------------------------------------------------------------
# Flood frequency via L-MOMENTS (Hosking 1990) — the modern fit next
# to the MoM version: b0 and b1 are integer-weighted sums over ranked
# annual maxima (rank weights are exact ints, so both probability-
# weighted moments are exact integer ratios), alpha = lambda2/ln2 and
# u = lambda1 - gamma*alpha with inlined literals.
# ---------------------------------------------------------------------------

_INV_LN2 = 1.4426950408889634

_FLOOD_LM_ORACLE = f"""
    WITH annual AS (
      SELECT o_orderpriority AS series,
             CAST(year(o_orderdate) AS INT) AS yr,
             max(CAST(floor(o_totalprice * 100
                            + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS mq
      FROM orders GROUP BY 1, 2
    ), ranked AS (
      SELECT series, mq,
             row_number() OVER (PARTITION BY series
                                ORDER BY mq ASC, yr ASC) AS i
      FROM annual
    ), pwm AS (
      SELECT series, CAST(count(*) AS BIGINT) AS n,
             sum(mq) AS s0, sum((i - 1) * mq) AS s1
      FROM ranked GROUP BY 1
    ), lam AS (
      SELECT series, n,
             CAST(s0 AS DOUBLE) / n / 100 AS l1,
             (2 * CAST(s1 AS DOUBLE) / (n * (n - 1))
              - CAST(s0 AS DOUBLE) / n) / 100 AS l2
      FROM pwm WHERE n >= 2
    ), params AS (
      SELECT series, n, l1, l2,
             l2 * CAST({_INV_LN2!r} AS DOUBLE) AS a,
             l1 - CAST({_GUMBEL_G!r} AS DOUBLE)
               * (l2 * CAST({_INV_LN2!r} AS DOUBLE)) AS u
      FROM lam
    )
    SELECT series, n AS n_years, {R('l1', 6)} AS lambda1,
           {R('l2', 6)} AS lambda2,
           {R(f'u + a * CAST({_GUMBEL_K[10]!r} AS DOUBLE)', 6)} AS q10,
           {R(f'u + a * CAST({_GUMBEL_K[100]!r} AS DOUBLE)', 6)}
             AS q100
    FROM params
"""


@register("flood_frequency_lmoments", oracle=_FLOOD_LM_ORACLE)
def flood_frequency_lmoments_q(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Gumbel fit from sample L-moments (exact integer
    probability-weighted moments over ranked annual maxima)."""
    o = _t(spark, sf_dir, "orders")
    annual = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.year("o_orderdate").cast("int").alias("yr"),
    ).agg(F.max(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                .cast("long")).alias("mq"))
    w = Window.partitionBy("series").orderBy(F.asc("mq"), F.asc("yr"))
    ranked = annual.withColumn("i", F.row_number().over(w))
    pwm = ranked.groupBy("series").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mq").alias("s0"),
        F.sum((F.col("i") - 1) * F.col("mq")).alias("s1"))
    n, s0, s1 = F.col("n"), F.col("s0"), F.col("s1")
    lam = pwm.where(n >= 2).select(
        "series", n,
        (s0.cast("double") / n / 100).alias("l1"),
        ((2 * s1.cast("double") / (n * (n - 1))
          - s0.cast("double") / n) / 100).alias("l2"))
    a = F.col("l2") * F.lit(_INV_LN2)
    u = F.col("l1") - F.lit(_GUMBEL_G) * a
    out = lam.select(
        "series", n.alias("n_years"),
        F.col("l1").alias("lambda1"), F.col("l2").alias("lambda2"),
        (u + a * F.lit(_GUMBEL_K[10])).alias("q10"),
        (u + a * F.lit(_GUMBEL_K[100])).alias("q100"))
    return _round(out, {"lambda1": 6, "lambda2": 6, "q10": 6,
                        "q100": 6})


# ---------------------------------------------------------------------------
# Lagged cross-correlation between station pairs (flood-routing
# travel-time estimation): Pearson r at lags 0..3 days over matched
# dates. All five sums are exact (centi/micro-quantized values,
# DECIMAL products <-> HUGEINT); the moment combination happens in
# doubles AFTER identical integer->double casts, so r is bit-stable.
# Pair x lag mass is bounded at n_series^2 * n_lags equi-joins on the
# shifted date key (never a band filter).
# ---------------------------------------------------------------------------

_XCORR_LAGS = [0, 1, 2, 3]

_XCORR_ORACLE = f"""
    WITH daily AS (
      SELECT o_orderpriority AS series, CAST(o_orderdate AS DATE) AS d,
             sum(CAST(floor(o_totalprice * 100
                            + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS vq
      FROM orders GROUP BY 1, 2
    ), lags AS (
      SELECT unnest([{', '.join(str(lag) for lag in _XCORR_LAGS)}])
               AS lag
    ), j AS (
      SELECT a.series AS series_a, b.series AS series_b, l.lag,
             a.vq AS va, b.vq AS vb
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b
        ON b.series > a.series AND b.d = a.d + l.lag
    ), mom AS (
      SELECT series_a, series_b, lag,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(va AS HUGEINT)) AS sa,
             sum(CAST(vb AS HUGEINT)) AS sb,
             sum(CAST(va AS HUGEINT) * vb) AS sab,
             sum(CAST(va AS HUGEINT) * va) AS saa,
             sum(CAST(vb AS HUGEINT) * vb) AS sbb
      FROM j GROUP BY 1, 2, 3
    ), r AS (
      SELECT series_a, series_b, lag, n,
             (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
              - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                     - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                       - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
               AS r
      FROM mom WHERE n >= 2
    )
    SELECT series_a, series_b, CAST(lag AS INT) AS lag,
           n AS n_matched, {R('r', 6)} AS r,
           (row_number() OVER (
              PARTITION BY series_a, series_b
              ORDER BY floor(r * 1000000000.0 + CAST(0.5 AS DOUBLE))
                         DESC, lag ASC) = 1) AS is_best_lag
    FROM r
"""


@register("station_lag_correlation", oracle=_XCORR_ORACLE)
def station_lag_correlation_q(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Pearson r at 0-3 day lags for every ordered priority pair,
    best lag flagged."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                .cast("long")).alias("vq"))
    lags = _ldf(spark, [(lag,) for lag in _XCORR_LAGS], "lag int")
    a = daily.select(F.col("series").alias("series_a"),
                     F.col("d").alias("da"), F.col("vq").alias("va"))
    b = daily.select(F.col("series").alias("series_b"),
                     F.col("d").alias("db"), F.col("vq").alias("vb"))
    j = (a.crossJoin(F.broadcast(lags))
         .join(b, (F.col("series_b") > F.col("series_a"))
               & (F.col("db") == F.date_add(F.col("da"), F.col("lag")))))
    dec = "decimal(18,0)"
    va, vb = F.col("va").cast(dec), F.col("vb").cast(dec)
    mom = j.groupBy("series_a", "series_b", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(va).alias("sa"), F.sum(vb).alias("sb"),
        F.sum(va * vb).alias("sab"),
        F.sum(va * va).alias("saa"),
        F.sum(vb * vb).alias("sbb"))
    n = F.col("n").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    sab = F.col("sab").cast("double")
    saa, sbb = F.col("saa").cast("double"), F.col("sbb").cast("double")
    r = ((n * sab - sa * sb)
         / F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)))
    scored = mom.where(F.col("n") >= 2).withColumn("r", r)
    w = Window.partitionBy("series_a", "series_b").orderBy(
        F.desc(F.floor(F.col("r") * 1e9 + F.lit(0.5))), F.asc("lag"))
    out = scored.select(
        "series_a", "series_b", F.col("lag").cast("int"),
        F.col("n").alias("n_matched"), "r",
        (F.row_number().over(w) == 1).alias("is_best_lag"))
    return _round(out, {"r": 6})


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test: randomness screen on daily values around
# the series median (persistence / regime detection). Median from
# exact quantized ints (both engines interpolate midpoints
# identically); exact-median days drop (the standard rule); runs =
# 1 + sign changes via a lag window; mu/sigma closed form over exact
# integer counts.
# ---------------------------------------------------------------------------

_RUNS_ORACLE = """
    WITH daily AS (
      SELECT o_orderpriority AS series, CAST(o_orderdate AS DATE) AS d,
             sum(CAST(floor(o_totalprice * 100
                            + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS vq
      FROM orders GROUP BY 1, 2
    ), med AS (
      SELECT series, quantile_cont(vq, 0.5) AS m FROM daily GROUP BY 1
    ), signed AS (
      SELECT d.series, d.d,
             CASE WHEN d.vq > me.m THEN 1 ELSE -1 END AS s
      FROM daily d JOIN med me USING (series)
      WHERE CAST(d.vq AS DOUBLE) <> me.m
    ), flips AS (
      SELECT series, s,
             CASE WHEN lag(s) OVER (PARTITION BY series ORDER BY d)
                       IS DISTINCT FROM s THEN 1 ELSE 0 END AS flip
      FROM signed
    ), agg AS (
      SELECT series,
             CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2,
             CAST(sum(flip) AS BIGINT) AS runs
      FROM flips GROUP BY 1
    ), stat AS (
      SELECT series, n1, n2, runs,
             CAST(2 AS DOUBLE) * n1 * n2 / (n1 + n2) + 1 AS mu,
             sqrt(CAST(2 AS DOUBLE) * n1 * n2
                  * (CAST(2 AS DOUBLE) * n1 * n2 - n1 - n2)
                  / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                     * (n1 + n2 - 1))) AS sigma
      FROM agg WHERE n1 > 0 AND n2 > 0 AND n1 + n2 > 1
    )
    SELECT series, n1, n2, runs, {mu} AS mu_runs,
           {zz} AS z
    FROM stat
""".format(
    mu=R("mu", 6),
    zz=R("CASE WHEN sigma > 0 THEN (runs - mu) / sigma END", 6),
)


@register("runs_randomness_test", oracle=_RUNS_ORACLE)
def runs_randomness_test_q(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs z per priority over daily totals."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                .cast("long")).alias("vq"))
    med = daily.groupBy("series").agg(
        F.expr("percentile(vq, 0.5)").alias("m"))
    signed = (daily.join(med, "series")
              .where(F.col("vq").cast("double") != F.col("m"))
              .select("series", "d",
                      F.when(F.col("vq") > F.col("m"), 1)
                      .otherwise(-1).alias("s")))
    w = Window.partitionBy("series").orderBy("d")
    flips = signed.withColumn(
        "flip",
        (~F.lag("s").over(w).eqNullSafe(F.col("s"))).cast("int"))
    agg = flips.groupBy("series").agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).cast("long")
        .alias("n2"),
        F.sum("flip").cast("long").alias("runs"))
    n1, n2 = F.col("n1"), F.col("n2")
    mu = F.lit(2.0) * n1 * n2 / (n1 + n2) + 1
    sigma = F.sqrt(
        F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / ((n1 + n2).cast("double") * (n1 + n2) * (n1 + n2 - 1)))
    out = (agg.where((n1 > 0) & (n2 > 0) & (n1 + n2 > 1))
           .withColumn("mu_runs", mu).withColumn("__sig", sigma)
           .select("series", "n1", "n2", "runs", "mu_runs",
                   F.when(F.col("__sig") > 0,
                          (F.col("runs") - F.col("mu_runs"))
                          / F.col("__sig")).alias("z")))
    return _round(out, {"mu_runs": 6, "z": 6})
