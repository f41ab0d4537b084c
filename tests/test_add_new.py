"""addNewContinuous overwrite semantics (R/addNewContinuous.R:16).

Closed-form fixture: two basic series + one compound, a 4-point
existing store, and a 4-point incoming batch overlapping 2 datetimes —
so every action class is reachable. The 'all'-mode range delete and
full defaults ladder are additionally oracle-checked at scale by the
`add_new_continuous_actions` registered query.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aquacache_spark.operators.add_new import add_new_continuous

T0 = dt.datetime(2024, 1, 1)


def ts(h):
    return T0 + dt.timedelta(hours=h)


@pytest.fixture(scope="module")
def frames(spark):
    catalog = spark.createDataFrame(
        [
            ("A", "basic", "mean", "org_a", 1),
            ("B", "basic", "instantaneous", None, None),
            ("C", "compound", "mean", "org_c", 3),
        ],
        "timeseries_id string, timeseries_type string, aggregation_type string,"
        " default_owner string, default_data_sharing_agreement_id long",
    )
    existing = spark.createDataFrame(
        [("A", ts(0)), ("A", ts(1)), ("A", ts(2)), ("B", ts(0))],
        "timeseries_id string, datetime timestamp",
    )
    incoming = spark.createDataFrame(
        [
            # conflicts with existing A@0, new A@5; NULL value dropped;
            # B@0 conflict on the instantaneous series; C rejected
            ("A", ts(0), 10.0, "alice"),
            ("A", ts(5), 11.0, None),
            ("A", ts(6), None, None),
            ("B", ts(0), 7.0, None),
            ("C", ts(0), 1.0, None),
        ],
        "timeseries_id string, datetime timestamp, value double, owner string",
    )
    return catalog, existing, incoming


def collect_actions(out):
    return {
        (r["timeseries_id"], r["datetime"], r["action"]): r
        for r in out.collect()
    }


def test_mode_no_drops_conflicts(spark, frames):
    catalog, existing, incoming = frames
    out = collect_actions(
        add_new_continuous(incoming, existing, catalog, overwrite="no")
    )
    assert out[("A", ts(0), "skip")]
    assert out[("A", ts(5), "insert")]
    assert out[("B", ts(0), "skip")]
    assert out[("C", ts(0), "reject")]
    # NULL-value row dropped entirely (R/addNewContinuous.R:66-73)
    assert not any(k[1] == ts(6) for k in out)
    assert len(out) == 4


def test_mode_conflict_upserts(spark, frames):
    catalog, existing, incoming = frames
    out = collect_actions(
        add_new_continuous(incoming, existing, catalog, overwrite="conflict")
    )
    assert out[("A", ts(0), "update")]
    assert out[("A", ts(5), "insert")]
    assert out[("B", ts(0), "update")]
    assert out[("C", ts(0), "reject")]


def test_mode_all_range_deletes(spark, frames):
    catalog, existing, incoming = frames
    out = collect_actions(
        add_new_continuous(incoming, existing, catalog, overwrite="all")
    )
    # A's incoming range is [0h, 5h]: existing A@1, A@2 were not re-sent
    assert out[("A", ts(1), "delete")]
    assert out[("A", ts(2), "delete")]
    assert out[("A", ts(0), "update")]
    assert out[("B", ts(0), "update")]
    # no deletes outside any series' incoming range, none for rejected C
    assert sum(1 for k in out if k[2] == "delete") == 2


def test_defaults_ladder(spark, frames):
    catalog, existing, incoming = frames
    out = collect_actions(
        add_new_continuous(incoming, existing, catalog, overwrite="conflict")
    )
    a0 = out[("A", ts(0), "update")]
    # supplied owner wins; UNS codes fill QC columns; catalog dsa fills
    assert a0["owner"] == "alice"
    assert (a0["grade"], a0["approval"], a0["qualifier"]) == ("UNS",) * 3
    assert a0["data_sharing_agreement_id"] == 1
    assert a0["imputed"] is False and a0["no_update"] is False
    # mean series: period left NULL for calculate_period downstream
    assert a0["period_seconds"] is None
    a5 = out[("A", ts(5), "insert")]
    assert a5["owner"] == "org_a"  # catalog default fills NULL owner
    b0 = out[("B", ts(0), "update")]
    assert b0["period_seconds"] == 0.0  # instantaneous => period 0
    assert b0["owner"] is None  # no default to fall back to


def test_bad_mode_rejected(spark, frames):
    catalog, existing, incoming = frames
    with pytest.raises(ValueError):
        add_new_continuous(incoming, existing, catalog, overwrite="replace")
