"""Closed-form pins for the patch_54 cross-section view chain
(operators/cross_section.py): calculated-value NULL ladders, the
manual/calculated preference in both directions, the total-area
COALESCE-0 rule, and sections without verticals."""

from pyspark.sql import functions as F

from aquacache_spark.operators.cross_section import (
    cross_sections_view, verticals_calculated, verticals_view)

V_SCHEMA = (
    "vertical_id long, xsection_id long, panel_width_m double, "
    "panel_flowing_water_depth_m double, ice_thickness_m double, "
    "slush_ice_thickness_m double, panel_area_m2 double, "
    "panel_mean_velocity_m_s double, panel_discharge_m3_s double, "
    "use_calculated_values boolean"
)
CS_SCHEMA = (
    "xsection_id long, wetted_width_m double, total_area_m2 double, "
    "net_area_m2 double, avg_total_depth_m double, "
    "avg_velocity_m_s double, discharge_m3_s double, "
    "ice_avg_thickness_m double, ice_area_m2 double, "
    "slush_avg_thickness_m double, slush_area_m2 double, "
    "use_calculated_values boolean"
)


def test_verticals_calculated_null_ladder(spark):
    verticals = spark.createDataFrame([
        # width+depth+points -> all three calculated
        (1, 0, 2.0, 0.5, None, None, None, None, None, True),
        # no depth -> area and discharge NULL, velocity still avg
        (2, 0, 2.0, None, None, None, None, None, None, True),
        # no points -> velocity and discharge NULL, area present
        (3, 0, 4.0, 0.25, None, None, None, None, None, True),
    ], V_SCHEMA)
    points = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 3.0)],
        "vertical_id long, velocity_m_s double")
    got = {r["vertical_id"]: r for r in
           verticals_calculated(verticals, points).collect()}
    assert got[1]["panel_area_calculated_m2"] == 1.0
    assert got[1]["panel_mean_velocity_calculated_m_s"] == 1.5
    assert got[1]["panel_discharge_calculated_m3_s"] == 1.5
    assert got[2]["panel_area_calculated_m2"] is None
    assert got[2]["panel_mean_velocity_calculated_m_s"] == 3.0
    assert got[2]["panel_discharge_calculated_m3_s"] is None
    assert got[3]["panel_area_calculated_m2"] == 1.0
    assert got[3]["panel_mean_velocity_calculated_m_s"] is None
    assert got[3]["panel_discharge_calculated_m3_s"] is None


def test_preference_ladder_both_directions(spark):
    verticals = spark.createDataFrame([
        # calc available + manual set, prefer CALC
        (1, 0, 2.0, 0.5, None, None, 9.0, 9.0, 9.0, True),
        # calc available + manual set, prefer MANUAL
        (2, 0, 2.0, 0.5, None, None, 9.0, 9.0, 9.0, False),
        # prefer calc but calc NULL -> falls back to manual
        (3, 0, 2.0, None, None, None, 9.0, None, 9.0, True),
        # prefer manual but manual NULL -> falls back to calc
        (4, 0, 2.0, 0.5, None, None, None, None, None, False),
    ], V_SCHEMA)
    points = spark.createDataFrame(
        [(1, 2.0), (2, 2.0), (4, 2.0)],
        "vertical_id long, velocity_m_s double")
    got = {r["vertical_id"]: r for r in
           verticals_view(verticals, points).collect()}
    assert got[1]["panel_area_m2"] == 1.0          # calc wins
    assert got[1]["panel_discharge_m3_s"] == 2.0
    assert got[2]["panel_area_m2"] == 9.0          # manual wins
    assert got[2]["panel_discharge_m3_s"] == 9.0
    assert got[3]["panel_area_m2"] == 9.0          # calc null -> manual
    assert got[4]["panel_area_m2"] == 1.0          # manual null -> calc
    assert got[4]["panel_mean_velocity_m_s"] == 2.0


def test_section_rollup_total_area_and_empty_section(spark):
    verticals = spark.createDataFrame([
        # section 0: two panels, one with ice, no slush anywhere
        (1, 0, 2.0, 0.5, 0.25, None, None, None, None, True),
        (2, 0, 4.0, 0.5, None, None, None, None, None, True),
    ], V_SCHEMA)
    points = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "vertical_id long, velocity_m_s double")
    cs = spark.createDataFrame([
        (0, None, None, None, None, None, None, None, None, None, None,
         True),
        (9, 5.0, None, None, None, None, 7.0, None, None, None, None,
         True),  # no verticals: manual values survive, rest NULL
    ], CS_SCHEMA)
    got = {r["xsection_id"]: r for r in
           cross_sections_view(cs, verticals, points).collect()}
    s0 = got[0]
    assert s0["wetted_width_m"] == 6.0
    assert s0["net_area_m2"] == 3.0               # 1.0 + 2.0
    # total = net 3.0 + ice 2.0*0.25 + slush 0 (COALESCE-0 rule)
    assert s0["total_area_m2"] == 3.5
    assert s0["ice_area_m2"] == 0.5
    assert s0["slush_area_m2"] is None            # all-NULL sum stays NULL
    assert s0["avg_total_depth_m"] == 0.5
    assert s0["discharge_m3_s"] == 1.0 * 1.0 + 2.0 * 2.0
    s9 = got[9]
    assert s9["wetted_width_m"] == 5.0            # calc NULL -> manual
    assert s9["discharge_m3_s"] == 7.0
    assert s9["net_area_m2"] is None
