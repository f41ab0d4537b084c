"""Stream cross-section hydraulics: the patch_54 computed-view chain.

Reference: inst/patches/patch_54.R — the discrete-schema hierarchy
``cross_sections`` (1) -> ``cross_section_verticals`` (N panels per
section) -> ``cross_section_points`` (N velocity readings per panel),
plus four views (patch_54.R:302-560):

1. ``cross_section_verticals_calculated``: per-panel hydraulics from
   point data — area = width x flowing depth (NULL unless both
   present), mean velocity = AVG(point velocities), discharge =
   area x mean velocity (NULL unless all three present);
2. ``cross_section_verticals_view``: manual-vs-calculated preference
   per panel — ``use_calculated_values`` picks which side COALESCE
   tries first;
3. ``cross_sections_calculated``: section rollup over the PREFERRED
   panel values (wetted width, net area, total area = net + ice +
   slush panel areas with the any-present/COALESCE-0 rule, mean
   depth/velocity, total discharge, ice/slush thickness + areas);
4. ``cross_sections_view``: the same preference ladder at section
   level.

Scale shape: two partial-aggregable groupBys (points -> panel,
panels -> section) keyed on the hierarchy ids — the natural shuffle
keys — and pure projections between them; no windows, no UDFs.
Sums/means of DERIVED (potentially non-dyadic) doubles go through the
repo-wide exact-sum idiom (operators/daily.exact_sum) so section
totals are partition-order-independent; the reference's ``numeric``
arbitrary precision is approximated at 1e-6 (documented divergence,
same contract as the daily rollups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .daily import exact_mean, exact_sum


def _prefer(use_calc, calc, manual):
    """patch_54's preference CASE: COALESCE(calc, manual) when
    use_calculated_values else COALESCE(manual, calc)."""
    return F.when(use_calc, F.coalesce(calc, manual)) \
        .otherwise(F.coalesce(manual, calc))


def verticals_calculated(
    verticals: DataFrame,
    points: DataFrame,
    vertical_id: str = "vertical_id",
) -> DataFrame:
    """View 1 (patch_54.R:316-348): per-panel calculated hydraulics.
    One partial-aggregable groupBy of the points on the panel key."""
    pv = points.groupBy(vertical_id).agg(
        exact_mean(F.col("velocity_m_s")).alias("__pt_vel"))
    v = verticals.join(pv, vertical_id, "left")
    area = F.when(
        F.col("panel_width_m").isNotNull()
        & F.col("panel_flowing_water_depth_m").isNotNull(),
        F.col("panel_width_m") * F.col("panel_flowing_water_depth_m"),
    )
    disch = F.when(
        F.col("panel_width_m").isNotNull()
        & F.col("panel_flowing_water_depth_m").isNotNull()
        & F.col("__pt_vel").isNotNull(),
        F.col("panel_width_m") * F.col("panel_flowing_water_depth_m")
        * F.col("__pt_vel"),
    )
    return v.select(
        vertical_id,
        area.alias("panel_area_calculated_m2"),
        F.col("__pt_vel").alias("panel_mean_velocity_calculated_m_s"),
        disch.alias("panel_discharge_calculated_m3_s"),
    )


def verticals_view(
    verticals: DataFrame,
    points: DataFrame,
    vertical_id: str = "vertical_id",
) -> DataFrame:
    """View 2 (patch_54.R:368-418): panel rows with the preferred
    (manual-vs-calculated) area / mean velocity / discharge."""
    calc = verticals_calculated(verticals, points, vertical_id)
    v = verticals.join(calc, vertical_id, "left")
    uc = F.col("use_calculated_values")
    return v.withColumns({
        "panel_area_m2": _prefer(
            uc, F.col("panel_area_calculated_m2"), F.col("panel_area_m2")),
        "panel_mean_velocity_m_s": _prefer(
            uc, F.col("panel_mean_velocity_calculated_m_s"),
            F.col("panel_mean_velocity_m_s")),
        "panel_discharge_m3_s": _prefer(
            uc, F.col("panel_discharge_calculated_m3_s"),
            F.col("panel_discharge_m3_s")),
    }).drop("panel_area_calculated_m2",
            "panel_mean_velocity_calculated_m_s",
            "panel_discharge_calculated_m3_s")


def cross_sections_calculated(
    cross_sections: DataFrame,
    verticals_preferred: DataFrame,
    xsection_id: str = "xsection_id",
) -> DataFrame:
    """View 3 (patch_54.R:430-478): section rollup over the PREFERRED
    panel values (the view chains — calculated values respect each
    panel's manual/calculated preference)."""
    v = verticals_preferred
    ice_area = F.col("panel_width_m") * F.col("ice_thickness_m")
    slush_area = F.col("panel_width_m") * F.col("slush_ice_thickness_m")
    agg = v.groupBy(xsection_id).agg(
        exact_sum(F.col("panel_width_m")).alias("wetted_width_calculated_m"),
        exact_sum(F.col("panel_area_m2")).alias("net_area_calculated_m2"),
        exact_mean(F.col("panel_flowing_water_depth_m"))
        .alias("avg_total_depth_calculated_m"),
        exact_mean(F.col("panel_mean_velocity_m_s"))
        .alias("avg_velocity_calculated_m_s"),
        exact_sum(F.col("panel_discharge_m3_s"))
        .alias("discharge_calculated_m3_s"),
        exact_mean(F.col("ice_thickness_m"))
        .alias("ice_avg_thickness_calculated_m"),
        exact_sum(ice_area).alias("ice_area_calculated_m2"),
        exact_mean(F.col("slush_ice_thickness_m"))
        .alias("slush_avg_thickness_calculated_m"),
        exact_sum(slush_area).alias("slush_area_calculated_m2"),
    )
    # total area: NULL unless at least one contributor is present,
    # else the COALESCE-0 sum of net + ice + slush (patch_54.R:446-456)
    total = F.when(
        F.col("net_area_calculated_m2").isNotNull()
        | F.col("ice_area_calculated_m2").isNotNull()
        | F.col("slush_area_calculated_m2").isNotNull(),
        F.coalesce(F.col("net_area_calculated_m2"), F.lit(0.0))
        + F.coalesce(F.col("ice_area_calculated_m2"), F.lit(0.0))
        + F.coalesce(F.col("slush_area_calculated_m2"), F.lit(0.0)),
    )
    agg = agg.withColumn("total_area_calculated_m2", total)
    return cross_sections.select(xsection_id).join(
        agg, xsection_id, "left")


_CS_PREFS = (
    ("wetted_width_m", "wetted_width_calculated_m"),
    ("total_area_m2", "total_area_calculated_m2"),
    ("net_area_m2", "net_area_calculated_m2"),
    ("avg_total_depth_m", "avg_total_depth_calculated_m"),
    ("avg_velocity_m_s", "avg_velocity_calculated_m_s"),
    ("discharge_m3_s", "discharge_calculated_m3_s"),
    ("ice_avg_thickness_m", "ice_avg_thickness_calculated_m"),
    ("ice_area_m2", "ice_area_calculated_m2"),
    ("slush_avg_thickness_m", "slush_avg_thickness_calculated_m"),
    ("slush_area_m2", "slush_area_calculated_m2"),
)


def cross_sections_view(
    cross_sections: DataFrame,
    verticals: DataFrame,
    points: DataFrame,
    xsection_id: str = "xsection_id",
    vertical_id: str = "vertical_id",
) -> DataFrame:
    """View 4 (patch_54.R:498-560): the user-facing section rows with
    every hydraulic field resolved through the preference ladder.
    End-to-end chain: points -> panel calc -> panel preferred ->
    section calc -> section preferred."""
    vv = verticals_view(verticals, points, vertical_id)
    calc = cross_sections_calculated(cross_sections, vv, xsection_id)
    cs = cross_sections.join(calc, xsection_id, "left")
    uc = F.col("use_calculated_values")
    out = cs
    for manual, calculated in _CS_PREFS:
        out = out.withColumn(
            manual, _prefer(uc, F.col(calculated), F.col(manual)))
    return out.drop(*[c for _, c in _CS_PREFS])
