"""Property test: the bucketed distributed as-of join must agree with a
brute-force reference implementation on random inputs — guards the
bucket-boundary logic (a pair straddling a bucket edge must never be
lost) and the two-sided tie-breaking."""

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from aquacache_spark.operators.asof import asof_pairs

TOL = 300.0  # seconds

times = st.lists(
    st.integers(min_value=0, max_value=3600), min_size=1, max_size=15, unique=True
)


def brute_force(lefts, rights, tol):
    cand = [
        (abs(lt - rt), lid, rid)
        for lid, lt in lefts for rid, rt in rights
        if abs(lt - rt) <= tol
    ]
    best_l = {}
    for d, lid, rid in sorted(cand):
        best_l.setdefault(lid, (d, rid))
    best_r = {}
    for d, lid, rid in sorted(cand, key=lambda x: (x[0], x[2], x[1])):
        best_r.setdefault(rid, (d, lid))
    return {
        (lid, rid)
        for lid, (d, rid) in best_l.items()
        if best_r.get(rid, (None, None))[1] == lid
    }


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(lt=times, rt=times)
def test_asof_pairs_match_brute_force(spark, lt, rt):
    base = dt.datetime(2024, 1, 1)
    lefts = [(i, s) for i, s in enumerate(sorted(lt))]
    rights = [(1000 + i, s) for i, s in enumerate(sorted(rt))]
    ldf = spark.createDataFrame(
        pd.DataFrame({
            "k": 1,
            "lid": [i for i, _ in lefts],
            "ts": [base + dt.timedelta(seconds=s) for _, s in lefts],
        })
    )
    rdf = spark.createDataFrame(
        pd.DataFrame({
            "k": 1,
            "rid": [i for i, _ in rights],
            "ts": [base + dt.timedelta(seconds=s) for _, s in rights],
        })
    )
    got = {
        (r["lid"], r["match_rid"])
        for r in asof_pairs(
            ldf, rdf, keys=["k"], left_ts="ts", right_ts="ts",
            left_id="lid", right_id="rid", tolerance_seconds=TOL,
            one_to_one=True,
        ).collect()
    }
    expected = brute_force(lefts, rights, TOL)
    assert got == expected
