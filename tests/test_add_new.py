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


def test_add_new_discrete_validation_ladder(spark):
    from aquacache_spark.operators.add_new import add_new_discrete

    orgs = spark.createDataFrame(
        [("YG", 1), ("WSC", 2)], "name string, organization_id int")
    dims = {
        n: spark.createDataFrame([("A",), ("UNS",)], "code string")
        for n in ("approvals", "grades", "qualifiers")
    }
    samples = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 00:00:00", "YG", None, None, None, None),
            (2, 10, "2024-01-01 01:00:00", "Nobody", None, None, None,
             None),                                 # unknown owner
            (3, 11, "2024-01-01 00:00:00", "YG", "WSC", "A", "UNS",
             "A"),                                  # all dims valid
            (4, 12, "2024-01-01 00:00:00", "YG", None, "ZZZ", None,
             None),                                 # bad approval
        ],
        "batch_id bigint, location_id int, datetime string, "
        "owner string, contributor string, approval string, "
        "grade string, qualifier string",
    )
    results = spark.createDataFrame(
        [
            (1, 100, 5.0, None, None),      # plain insert
            (1, 101, None, None, None),     # NA, no condition -> drop
            (1, 102, None, 1, 0.05),        # below DL with value -> insert
            (1, 103, None, 1, None),        # condition 1, no value -> reject
            (2, 104, 5.0, None, None),      # sample rejected -> reject
        ],
        "batch_id bigint, result_id bigint, result double, "
        "result_condition int, result_condition_value double",
    )
    out = add_new_discrete(samples, results, orgs, dims["approvals"],
                           dims["grades"], dims["qualifiers"],
                           max_sample_id=500)
    rows = {(r["entity"], r["batch_id"], r["entity_id"]): r
            for r in out.collect()}
    # deterministic sequential ids in (location, datetime) order
    assert rows[("sample", 1, 10)]["action"] == "insert"
    assert rows[("sample", 1, 10)]["sample_id"] == 501
    assert rows[("sample", 3, 11)]["sample_id"] == 502
    assert rows[("sample", 4, 12)]["action"] == "reject_unknown_approval"
    assert rows[("sample", 2, 10)]["action"] == "reject_unknown_owner"
    assert rows[("result", 1, 100)]["action"] == "insert"
    assert rows[("result", 1, 100)]["sample_id"] == 501
    assert rows[("result", 1, 101)]["action"] == "drop_na_result"
    assert rows[("result", 1, 102)]["action"] == "insert"
    assert rows[("result", 1, 103)]["action"] == \
        "reject_condition_value_missing"
    assert rows[("result", 2, 104)]["action"] == "reject_unknown_owner"
