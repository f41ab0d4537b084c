"""Water-quality guideline (criteria) evaluation, set-wise.

Port of the reference's ``criteria`` schema functions
(inst/patches/patch_51.R): ``guideline_get_input_value``
(:2156-2590 — candidate result selection with result-type preference
ranking, condition-value fallback, single/avg/min/max aggregation,
calibrated-bounds reject/clamp), ``evaluate_guideline_rule``
(:2590-2830 — constant / narrative / linear / log-linear / dynamic
algorithms with output caps and rounding), ``evaluate_guideline`` /
``get_guideline_value`` (:2830-2930 — priority-ordered rule listing and
the upper>lower bound-preferring scalar), ``guideline_apply_rounding``
(:2112-2146) and ``get_sample_hardness`` (:1780-1905 — the
Ca/Mg-to-CaCO3 fallback ladder used by hardness-dependent metal
guidelines).

The reference evaluates one (guideline, sample) pair per call; here
every stage is a DataFrame over ALL (sample, rule) pairs at once: the
rule/input/coefficient tables are catalog-sized broadcasts, the results
fact is scanned once, and each status ladder is a when() chain — so a
whole monitoring network's samples screen against a whole guideline
book in one pass.

Divergence, documented: the reference's ``sql_scalar`` algorithm
EXECUTEs arbitrary SQL; here it is ``safe_expr`` — a numeric expression
over named per-sample scalar columns (e.g. ``hardness``) gated by the
same validator as compound expressions and drift equations
(plans/expr_safety.py), consistent with SURVEY §2.10.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.expr_safety import assert_safe_numeric_expression

def _bound_order() -> Column:
    return (F.when(F.col("bound_code") == "upper", 1)
            .when(F.col("bound_code") == "lower", 2).otherwise(4))


def apply_rounding(value: Column, digits: Column, method: Column) -> Column:
    """guideline_apply_rounding (patch_51.R:2112-2146): 'none'/NULL pass
    through; 'round' half-up at ``digits``; 'floor'/'ceiling' at the
    scaled digit. Half-up uses the engine-wide deterministic idiom."""
    d = F.coalesce(digits, F.lit(0))
    scale = F.pow(F.lit(10.0), d)
    return (
        F.when(value.isNull() | method.isNull() | (method == "none"), value)
        .when(method == "round", F.floor(value * scale + 0.5) / scale)
        .when(method == "floor", F.floor(value * scale) / scale)
        .when(method == "ceiling", F.ceil(value * scale) / scale)
    )


def sample_hardness(
    results: DataFrame,
    calcium_pid: int,
    magnesium_pid: int,
    hardness_pid: int,
    dissolved_fid: int,
    total_fid: int,
    caco3_sid: int,
) -> DataFrame:
    """Per-sample hardness (patch_51.R:1780-1905): dissolved Ca+Mg
    (2.497·Ca + 4.118·Mg) > dissolved hardness as CaCO3 > dissolved
    hardness any speciation > the same ladder on total fractions.
    One conditional-aggregate pass over the results fact."""
    def pick(pid, fid, sid=None) -> Column:
        cond = (F.col("parameter_id") == pid) & (F.col("sample_fraction_id") == fid)
        if sid is not None:
            cond = cond & (F.col("result_speciation_id") == sid)
        return F.max(F.when(cond, F.col("result")))

    v = results.groupBy("sample_id").agg(
        pick(calcium_pid, dissolved_fid).alias("ca_d"),
        pick(magnesium_pid, dissolved_fid).alias("mg_d"),
        pick(hardness_pid, dissolved_fid, caco3_sid).alias("h_d_caco3"),
        pick(hardness_pid, dissolved_fid).alias("h_d_any"),
        pick(calcium_pid, total_fid).alias("ca_t"),
        pick(magnesium_pid, total_fid).alias("mg_t"),
        pick(hardness_pid, total_fid, caco3_sid).alias("h_t_caco3"),
        pick(hardness_pid, total_fid).alias("h_t_any"),
    )
    ladder = (
        F.when((F.col("ca_d") > 0) & (F.col("mg_d") > 0),
               2.497 * F.col("ca_d") + 4.118 * F.col("mg_d"))
        .when(F.col("h_d_caco3") > 0, F.col("h_d_caco3"))
        .when(F.col("h_d_any") > 0, F.col("h_d_any"))
        .when((F.col("ca_t") > 0) & (F.col("mg_t") > 0),
              2.497 * F.col("ca_t") + 4.118 * F.col("mg_t"))
        .when(F.col("h_t_caco3") > 0, F.col("h_t_caco3"))
        .when(F.col("h_t_any") > 0, F.col("h_t_any"))
    )
    return v.select("sample_id", ladder.alias("hardness"))


def guideline_input_values(
    samples: DataFrame,
    results: DataFrame,
    rule_inputs: DataFrame,
) -> DataFrame:
    """Per (sample_id, input_id) input resolution
    (guideline_get_input_value, patch_51.R:2156-2590).

    ``rule_inputs`` columns: input_id, parameter_id, matrix_state_id,
    sample_fraction_id, result_speciation_id, result_type,
    result_type_preference (array<string>, NULL = any),
    allow_condition_value, aggregate_method ('single'|'avg'|'min'|'max'),
    lower_calibrated_bound, upper_calibrated_bound, bounds_action
    ('reject'|'clamp'|'warn').

    Output: sample_id, input_id, input_value, status ∈ {value,
    missing_input, missing_input_value, ambiguous_input,
    outside_calibrated_range}.
    """
    ins = F.broadcast(rule_inputs.select(
        "input_id",
        F.col("parameter_id").alias("__i_pid"),
        F.col("matrix_state_id").alias("__i_ms"),
        F.col("sample_fraction_id").alias("__i_sf"),
        F.col("result_speciation_id").alias("__i_sp"),
        F.col("result_type").alias("__i_rt"),
        F.col("result_type_preference").alias("__i_pref"),
        "allow_condition_value", "aggregate_method",
        "lower_calibrated_bound", "upper_calibrated_bound", "bounds_action",
    ))
    pref_empty = F.col("__i_pref").isNull() | (F.size("__i_pref") == 0)
    cand = results.join(
        ins,
        (F.col("parameter_id") == F.col("__i_pid"))
        & (F.col("__i_ms").isNull()
           | (F.col("matrix_state_id") == F.col("__i_ms")))
        & (F.col("__i_sf").isNull()
           | F.col("sample_fraction_id").eqNullSafe(F.col("__i_sf")))
        & (F.col("__i_sp").isNull()
           | F.col("result_speciation_id").eqNullSafe(F.col("__i_sp")))
        & (F.col("__i_rt").isNull()
           | F.col("result_type").eqNullSafe(F.col("__i_rt")))
        & (pref_empty | F.array_contains(
            F.col("__i_pref"), F.coalesce(F.col("result_type"), F.lit(""))
        )),
    )
    rank = F.when(pref_empty, 1).otherwise(
        F.array_position(F.col("__i_pref"), F.col("result_type"))
    )
    use_val = F.when(F.col("result").isNotNull(), F.col("result")).when(
        F.col("allow_condition_value"), F.col("result_condition_value")
    )
    cand = cand.select(
        "sample_id", "input_id", "result_id",
        rank.cast("int").alias("__rank"), use_val.alias("__v"),
    )
    # selected rank via a window, then ONE conditional aggregation on
    # the same keys — the window's exchange is reused by the groupBy,
    # so the candidate set is scanned once (a join-back against a
    # separate rank aggregate re-derived the whole candidate join)
    from pyspark.sql import Window

    w = Window.partitionBy("sample_id", "input_id")
    cand = cand.withColumn(
        "__sel_rank",
        F.min(F.when(F.col("__v").isNotNull(), F.col("__rank"))).over(w),
    )
    at_pref = F.col("__v").isNotNull() & (
        F.col("__rank") == F.col("__sel_rank"))
    agg = cand.groupBy("sample_id", "input_id").agg(
        F.count(F.lit(1)).alias("__matching"),
        F.count("__v").alias("__usable"),
        F.count(F.when(at_pref, F.lit(1))).alias("__n_pref"),
        # exact mean (order-independent): avg() of doubles varies in
        # the last ulp with partition order, which can flip the 1e-6
        # rounding boundary between runs/engines
        (F.sum(F.when(at_pref,
                      F.floor(F.col("__v") * 1000000.0 + 0.5).cast("long")))
         / 1000000.0
         / F.count(F.when(at_pref, F.lit(1)))).alias("__avg"),
        F.min(F.when(at_pref, F.col("__v"))).alias("__min"),
        F.max(F.when(at_pref, F.col("__v"))).alias("__max"),
    )

    # the (sample x input) grid so zero-candidate pairs surface as
    # missing_input (the per-call function's first exit)
    grid = samples.select("sample_id").crossJoin(
        F.broadcast(rule_inputs.select(
            "input_id", "aggregate_method", "lower_calibrated_bound",
            "upper_calibrated_bound", "bounds_action",
        ))
    )
    g = grid.join(agg, ["sample_id", "input_id"], "left")
    raw = (
        F.when(F.col("aggregate_method") == "avg", F.col("__avg"))
        .when(F.col("aggregate_method") == "max", F.col("__max"))
        .otherwise(F.col("__min"))  # 'min' and 'single' both take min
    )
    below = F.col("lower_calibrated_bound").isNotNull() & (
        raw < F.col("lower_calibrated_bound"))
    above = F.col("upper_calibrated_bound").isNotNull() & (
        raw > F.col("upper_calibrated_bound"))
    clamped = (
        F.when(below & (F.col("bounds_action") == "clamp"),
               F.col("lower_calibrated_bound"))
        .when(above & (F.col("bounds_action") == "clamp"),
              F.col("upper_calibrated_bound"))
        .otherwise(raw)
    )
    ambiguous = (F.col("aggregate_method") == "single") & (F.col("__n_pref") > 1)
    rejected = (below | above) & (F.col("bounds_action") == "reject")
    status = (
        F.when(F.col("__matching").isNull() | (F.col("__matching") == 0),
               "missing_input")
        .when(F.col("__usable") == 0, "missing_input_value")
        .when(ambiguous, "ambiguous_input")
        .when(rejected, "outside_calibrated_range")
        .otherwise("value")
    )
    return g.select(
        "sample_id", "input_id",
        F.when(status == "value", clamped).alias("input_value"),
        status.alias("status"),
    )


def evaluate_guideline_rules(
    rules: DataFrame,
    input_values: DataFrame,
    sample_scalars: Optional[DataFrame] = None,
    safe_expr_idents: Sequence[str] = ("hardness",),
) -> DataFrame:
    """Per (rule, sample) evaluation (evaluate_guideline_rule,
    patch_51.R:2590-2830).

    ``rules`` columns: rule_id, guideline_id, bound_code, rule_priority,
    algorithm_code ('constant'|'narrative'|'linear'|'log_linear'|
    'safe_expr'), fixed_value, input_id (linear/log_linear),
    intercept, slope (their coefficient rows, pre-pivoted),
    formula_expr (safe_expr), min_output_value, max_output_value,
    rounding_digits, rounding_method.

    ``sample_scalars``: per-sample columns the safe_expr algorithm may
    reference (e.g. the hardness ladder) — every expression is gated by
    the §2.10 validator before reaching Catalyst.

    Output grain: one row per (sample_id, rule_id) with guideline_value
    + output_status; input-status rows propagate (missing/ambiguous/
    out-of-range), log_linear of a non-positive input is
    'invalid_input_value' (patch_51.R:2746-2752).
    """
    for row in rules.select("algorithm_code", "formula_expr").collect():
        if row["algorithm_code"] == "safe_expr":
            assert_safe_numeric_expression(
                row["formula_expr"], allowed_idents=tuple(safe_expr_idents)
            )
    r = F.broadcast(rules)
    samples = input_values.select("sample_id").distinct()
    base = samples.crossJoin(r)
    base = base.join(
        input_values.withColumnRenamed("status", "__in_status"),
        ["sample_id", "input_id"], "left",
    )
    if sample_scalars is not None:
        base = base.join(F.broadcast(sample_scalars), "sample_id", "left")

    alg = F.col("algorithm_code")
    needs_input = alg.isin("linear", "log_linear")
    input_bad = needs_input & (F.col("__in_status") != "value")
    log_invalid = (
        (alg == "log_linear") & (F.col("__in_status") == "value")
        & (F.col("input_value") <= 0)
    )
    value = (
        F.when(alg == "constant", F.col("fixed_value"))
        .when(alg == "linear",
              F.col("intercept") + F.col("slope") * F.col("input_value"))
        .when(alg == "log_linear",
              F.exp(F.col("intercept")
                    + F.col("slope") * F.log(F.col("input_value"))))
    )
    if sample_scalars is not None:
        for row in rules.where(F.col("algorithm_code") == "safe_expr") \
                .select("rule_id", "formula_expr").collect():
            value = F.when(
                (alg == "safe_expr") & (F.col("rule_id") == row["rule_id"]),
                F.expr(row["formula_expr"]),
            ).otherwise(value)
    # sequential caps exactly as the reference (patch_51.R:2780-2800):
    # raise to the min cap, then lower to the max cap, each only when
    # that cap is set — a least/greatest-with-coalesce form silently
    # uses `value` as the missing cap's identity and cancels the other
    lo = F.when(
        F.col("min_output_value").isNotNull()
        & (value < F.col("min_output_value")),
        F.col("min_output_value"),
    ).otherwise(value)
    capped = F.when(
        F.col("max_output_value").isNotNull()
        & (lo > F.col("max_output_value")),
        F.col("max_output_value"),
    ).otherwise(lo)
    rounded = apply_rounding(
        capped, F.col("rounding_digits"), F.col("rounding_method"))
    status = (
        F.when(alg == "narrative", "narrative")
        .when(input_bad, F.col("__in_status"))
        .when(log_invalid, "invalid_input_value")
        .when(rounded.isNull(), "no_value")
        .otherwise("value")
    )
    return base.select(
        "sample_id", "rule_id", "guideline_id", "bound_code", "rule_priority",
        F.when(status == "value", rounded).alias("guideline_value"),
        status.alias("output_status"),
    )


def get_guideline_values(evaluated: DataFrame) -> DataFrame:
    """The scalar per (guideline, sample): the first 'value' row
    preferring upper > lower > other bounds, then rule_id
    (get_guideline_value, patch_51.R:2880-2930). Partial-aggregable
    min(struct) — no window sort."""
    v = evaluated.where(F.col("output_status") == "value")
    pick = F.min(F.struct(
        _bound_order().alias("o"), F.col("rule_id").alias("r"),
        F.col("guideline_value").alias("v"),
    ))
    return (
        v.groupBy("guideline_id", "sample_id")
        .agg(pick.alias("b"))
        .select("guideline_id", "sample_id",
                F.col("b.v").alias("guideline_value"))
    )
