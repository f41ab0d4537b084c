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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import catalog
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


def R(expr: str, n: int) -> str:
    """The same deterministic rounding idiom, as oracle SQL text."""
    return f"floor(({expr}) * {10**n} + 0.5) / {10**n}"


def DSUM(col: str, scale: int = 8) -> str:
    """Order-independent exact sum in DuckDB (matches operators/daily.py)."""
    return f"CAST(sum(CAST({col} AS DECIMAL(25,{scale}))) AS DOUBLE)"


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
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(25,8)"

    def dsum(col):
        return F.sum(col.cast(dec)).cast("double")

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
"""


@register("daily_rollup", oracle=_DAILY_ROLLUP_ORACLE)
def daily_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = daily_rollup(
        ev, keys=["event_type"], dt_col="ts", value_col="value", agg_type="mean"
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
    )
    SELECT event_id, event_type, ts, {R('v', 4)} AS corrected_value
    FROM c7
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
             sum(o_totalprice) AS value
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
             avg(h.value)                            AS hist_mean,
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
        .agg(F.sum("o_totalprice").alias("value"))
    )
    out = doy_stats(daily, keys=["priority"], date_col="date", value_col="value")
    return _round(
        out,
        {"value": 4, "hist_min": 4, "hist_max": 4, "hist_mean": 4,
         "q10": 4, "q25": 4, "q50": 4, "q75": 4, "q90": 4,
         "percent_historic_range": 4},
    )


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
    dec = "decimal(25,8)"
    out = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(F.col("o_totalprice").cast(dec)).cast("double").alias("revenue"),
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
    out = doy_stats(daily, keys=["event_type"], date_col="date", value_col="value")
    return _round(out, {"value": 4, "hist_min": 4, "hist_max": 4, "hist_mean": 4,
                        "q10": 4, "q25": 4, "q50": 4, "q75": 4, "q90": 4,
                        "percent_historic_range": 4})
