"""Warm/timed blind-spot guard (VERDICT r12 #7).

The bench times each query as warm noop + timed noop. Any frame a
query pins via ``persist``/``localCheckpoint`` *inside its plan*
materializes during the warm run and is reused by the timed run, so
its subtree's compute silently leaves the timed region. Today every
such frame is catalog-sized or batch-bounded (robots rules ~200 rows,
one aquarius fetch batch, the samples star, a daily batch's band
keys); this pin makes that a CHECKED property: building every
registered query at sf0.001 while recording each persisted /
checkpointed frame, every recorded frame must stay under a row bound.
A future "optimization" that checkpoints fact-scale work (the corpus
position stream, the pair mass) fails here instead of quietly gaming
the bench.

The bound is calibrated to sf0.001 (documents = 500 docs / ~28k
tokens, orders = 1.5k): catalog/batch frames measure <= ~2.5k rows
and the largest legitimate pins — the refresh ladder's
one-row-per-series-DAY materialized-view intermediates
(operators/refresh.py, bounded by catalog x date range, NOT by fact
row count) — measure ~8-12k; a corpus-scale token/gram/position
checkpoint is >= 24-28k even at this SF (measured: the exploded token
stream is 27.9k rows, and deliberately checkpointing it trips this
assertion). Transient persists released before the query returns are
exempt: the timed run recomputes them from lineage, so they cannot
hide compute from the bench.
"""

from __future__ import annotations

import os

import pytest
# the CONCRETE class: in Spark 4 the public pyspark.sql.DataFrame is
# an abstract base and classic sessions dispatch to the subclass's own
# persist/localCheckpoint/checkpoint — patching the base intercepts
# nothing (verified: a base-class patch recorded zero calls)
from pyspark.sql.classic.dataframe import DataFrame

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
ROW_BOUND = 15_000


@pytest.fixture()
def recorded_pins(monkeypatch):
    recorded: list[tuple[str, DataFrame]] = []
    orig_persist = DataFrame.persist
    orig_lc = DataFrame.localCheckpoint
    orig_cp = DataFrame.checkpoint

    def persist(self, *a, **kw):
        recorded.append(("persist", self))
        return orig_persist(self, *a, **kw)

    def local_checkpoint(self, *a, **kw):
        recorded.append(("localCheckpoint", self))
        return orig_lc(self, *a, **kw)

    def checkpoint(self, *a, **kw):
        recorded.append(("checkpoint", self))
        return orig_cp(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "persist", persist)
    monkeypatch.setattr(DataFrame, "localCheckpoint", local_checkpoint)
    monkeypatch.setattr(DataFrame, "checkpoint", checkpoint)
    return recorded


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="sf0.001 absent")
def test_no_fact_scale_pins_in_registered_queries(spark, recorded_pins):
    from pyspark import StorageLevel

    queries = entry_mod.queries()
    offenders = []
    n_checked = 0
    for name in sorted(queries):
        start = len(recorded_pins)
        try:
            queries[name](spark, SF_DIR)
        except Exception as exc:  # construction must not fail either
            offenders.append((name, f"construction failed: {exc!r}"))
            continue
        for kind, frame in recorded_pins[start:]:
            if kind == "persist" and frame.storageLevel == StorageLevel(
                    False, False, False, False, 1):
                # a persist RELEASED before the query returns is not a
                # warm/timed blind spot: the timed run recomputes it
                # from lineage (the owned-cache span family's
                # transient gram cache is this shape by design)
                continue
            n_checked += 1
            n = frame.count()
            if n > ROW_BOUND:
                offenders.append((name, f"{kind} frame of {n} rows"))
        spark.catalog.clearCache()
        for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
    assert n_checked > 0, "recorded no pins — the patch target is wrong"
    assert not offenders, (
        "fact-scale persisted/checkpointed frames pinned for the bench's "
        f"timed region (bound {ROW_BOUND} rows at sf0.001): {offenders}")
