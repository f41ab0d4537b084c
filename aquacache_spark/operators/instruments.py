"""Instrument metadata validation (inst/patches/patch_44.R).

The reference guards its instruments schema with PL/pgSQL triggers:
``assert_sensor_current_assignment_is_unique`` (patch_44.R:1290-1342,
with the 'BLANK' sensor exemption), the slot/event trigger shims
(:1342-1380), ``check_instrument_connection_signal_timeseries``
(:552-642), ``check_locations_metadata_instruments_acquisition_
dependents`` (:645-714) and the deferred
``check_locations_metadata_instrument_timeseries_overlap`` constraint
trigger (:716-755). Each trigger re-runs one EXISTS/aggregate probe per
mutated row; re-expressed here set-wise, each becomes ONE declarative
pass over the whole table — the same ladder/anti-join shape as
operators/catalog_admin.py, evaluated for every row at once instead of
row-at-a-time.

Scale: the instruments schema is catalog-sized (thousands of
deployments, not billions), so every join here broadcasts; the only
window is the DISTINCT ON replay keyed by (instrument_id, slot_number).
Nothing touches measurement-cardinality data except the semi-join
probes against ``timeseries``, which stay on the catalog key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the reference's 'infinity'::timestamptz in COALESCE(end, infinity)
# range arithmetic — a sentinel far beyond any real deployment
_INF_TS = "9999-01-01 00:00:00"


def _inf(col):
    return F.coalesce(col, F.lit(_INF_TS).cast("timestamp"))


def sensor_current_assignments(
    events: DataFrame,
    slots: DataFrame,
    sensors: DataFrame,
) -> DataFrame:
    """instruments.instrument_sensor_current (patch_44.R:1259-1283):
    the latest recorded sensor assignment per instrument slot —
    ``DISTINCT ON (instrument_id, slot_number) ... ORDER BY
    obs_datetime DESC, event_id DESC`` replayed as one row_number
    window over the event×slot join.

    Input schemas (patch_44.R:1048-1090): ``events`` (event_id,
    instrument_id, observer, obs_datetime), ``slots`` (event_id,
    slot_number, sensor_id, note), ``sensors`` (sensor_id,
    sensor_serial, sensor_type).
    """
    ev = events.select("event_id", "instrument_id", "observer",
                       "obs_datetime")
    j = ev.join(slots.select("event_id", "slot_number", "sensor_id",
                             "note"), "event_id")
    w = Window.partitionBy("instrument_id", "slot_number").orderBy(
        F.desc("obs_datetime"), F.desc("event_id"))
    cur = (
        j.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    return cur.join(
        F.broadcast(sensors.select("sensor_id", "sensor_serial",
                                   "sensor_type")),
        "sensor_id", "left",
    ).select("instrument_id", "slot_number", "sensor_id", "sensor_serial",
             "sensor_type", "note", "event_id", "observer", "obs_datetime")


def sensor_assignment_validation(
    events: DataFrame,
    slots: DataFrame,
    sensors: DataFrame,
) -> DataFrame:
    """assert_sensor_current_assignment_is_unique (patch_44.R:1290-1342)
    for EVERY sensor at once: a sensor (other than the 'BLANK'
    placeholder — ``upper(btrim(coalesce(serial,''))) = 'BLANK'`` is
    exempt, :1310) may hold at most one current instrument slot.

    Output: one row per currently-assigned sensor — (sensor_id,
    sensor_serial, n_assignments, assignment_summary, exempt,
    violation). ``assignment_summary`` is the trigger's
    ``string_agg(format('instrument %s slot %s', ...), ', ' ORDER BY
    instrument_id, slot_number)`` diagnostic verbatim, so a violation
    row carries the exact message the reference would RAISE (:1315-1336).
    """
    cur = sensor_current_assignments(events, slots, sensors)
    assigned = cur.where(F.col("sensor_id").isNotNull())
    exempt = (
        F.upper(F.trim(F.coalesce(F.col("sensor_serial"), F.lit(""))))
        == "BLANK"
    )
    agg = assigned.groupBy("sensor_id", "sensor_serial").agg(
        F.count(F.lit(1)).alias("n_assignments"),
        F.array_sort(
            F.collect_list(F.struct("instrument_id", "slot_number"))
        ).alias("__slots"),
    )
    summary = F.concat_ws(
        ", ",
        F.transform(
            F.col("__slots"),
            lambda s: F.concat(
                F.lit("instrument "), s["instrument_id"].cast("string"),
                F.lit(" slot "), s["slot_number"].cast("string"),
            ),
        ),
    )
    return agg.select(
        "sensor_id", "sensor_serial", "n_assignments",
        summary.alias("assignment_summary"),
        exempt.alias("exempt"),
        ((F.col("n_assignments") > 1) & ~exempt).alias("violation"),
    )


def connection_signal_validation(
    signals: DataFrame,
    connections: DataFrame,
    deployments: DataFrame,
    timeseries: DataFrame,
) -> DataFrame:
    """check_instrument_connection_signal_timeseries
    (patch_44.R:552-642), set-wise: every connection-signal row gets
    the FIRST failing check in the trigger's RAISE order as its
    ``reject_reason`` (NULL = accepted; a NULL ``timeseries_id`` is
    accepted outright — the trigger's early RETURN NEW).

    Ladder (reference line refs in patch order):
    1. unknown connection                      → 'unknown_connection'
    2. unknown instrument deployment           → 'unknown_deployment'
    3. unknown timeseries                      → 'unknown_timeseries'
    4. location / sub-location mismatch (IS DISTINCT FROM on the
       nullable sub_location)                  → 'location_mismatch'
    5. deployment z_id set and ts z_id differs → 'z_mismatch'
    6. signal parameter set and ts parameter
       differs (IS DISTINCT FROM)              → 'parameter_mismatch'
    7. timeseries already linked by ANOTHER signal whose connection
       period overlaps this one (half-open, end NULL = infinity)
                                               → 'timeseries_already_linked'

    Input schemas: ``signals`` (connection_signal_id, connection_id,
    timeseries_id, parameter_id), ``connections`` (connection_id,
    instrument_metadata_id, logger_metadata_id, start_datetime,
    end_datetime), ``deployments`` = locations_metadata_instruments
    (metadata_id, location_id, sub_location_id, z_id, start_datetime,
    end_datetime), ``timeseries`` (timeseries_id, parameter_id,
    location_id, sub_location_id, z_id).
    """
    con = connections.select(
        F.col("connection_id"),
        F.col("instrument_metadata_id"),
        F.col("start_datetime").alias("__c_s"),
        _inf(F.col("end_datetime")).alias("__c_e"),
    )
    dep = deployments.select(
        F.col("metadata_id"),
        F.col("location_id").alias("__d_loc"),
        F.col("sub_location_id").alias("__d_sub"),
        F.col("z_id").alias("__d_z"),
    )
    ts = timeseries.select(
        F.col("timeseries_id"),
        F.col("parameter_id").alias("__t_param"),
        F.col("location_id").alias("__t_loc"),
        F.col("sub_location_id").alias("__t_sub"),
        F.col("z_id").alias("__t_z"),
    )
    out = (
        signals
        .join(F.broadcast(con.withColumn("__con", F.lit(True))),
              "connection_id", "left")
        .join(F.broadcast(dep.withColumn("__dep", F.lit(True))),
              F.col("instrument_metadata_id") == F.col("metadata_id"),
              "left")
        .join(F.broadcast(ts.withColumn("__ts", F.lit(True))),
              "timeseries_id", "left")
    )
    # check 7: another signal on the same timeseries whose connection
    # period overlaps ours — the self-probe joins signal→connection
    # once, then equi-joins on timeseries_id (catalog-keyed)
    sc = signals.where(F.col("timeseries_id").isNotNull()).join(
        F.broadcast(con.select("connection_id", "__c_s", "__c_e")),
        "connection_id",
    ).select(
        F.col("connection_signal_id").alias("__o_id"),
        F.col("timeseries_id").alias("__o_tid"),
        F.col("__c_s").alias("__o_s"),
        F.col("__c_e").alias("__o_e"),
    )
    linked = (
        out.join(
            sc,
            (F.col("timeseries_id") == F.col("__o_tid"))
            & (F.col("connection_signal_id") != F.col("__o_id"))
            & (F.col("__c_s") < F.col("__o_e"))
            & (F.col("__c_e") > F.col("__o_s")),
            "left_semi",
        )
        .select("connection_signal_id")
        .withColumn("__linked", F.lit(True))
    )
    out = out.join(F.broadcast(linked), "connection_signal_id", "left")
    distinct = lambda a, b: ~F.col(a).eqNullSafe(F.col(b))  # noqa: E731
    reason = (
        F.when(F.col("timeseries_id").isNull(), F.lit(None).cast("string"))
        .when(F.col("__con").isNull(), "unknown_connection")
        .when(F.col("__dep").isNull(), "unknown_deployment")
        .when(F.col("__ts").isNull(), "unknown_timeseries")
        .when((F.col("__t_loc") != F.col("__d_loc"))
              | distinct("__t_sub", "__d_sub"), "location_mismatch")
        .when(F.col("__d_z").isNotNull() & distinct("__t_z", "__d_z"),
              "z_mismatch")
        .when(F.col("parameter_id").isNotNull()
              & distinct("__t_param", "parameter_id"), "parameter_mismatch")
        .when(F.coalesce(F.col("__linked"), F.lit(False)),
              "timeseries_already_linked")
    )
    return out.select(
        "connection_signal_id", "connection_id", "timeseries_id",
        "parameter_id", reason.alias("reject_reason"),
    )


def deployment_timeseries_overlap(
    links: DataFrame,
    deployments: DataFrame,
) -> DataFrame:
    """check_locations_metadata_instrument_timeseries_overlap
    (patch_44.R:716-755): a timeseries may not be associated with two
    instrument deployments whose [start, coalesce(end, infinity))
    periods overlap (the deferred tstzrange ``&&`` constraint trigger),
    replayed for the whole link table in one self-join.

    Input: ``links`` = locations_metadata_instrument_timeseries
    (metadata_id, timeseries_id), ``deployments`` (metadata_id,
    start_datetime, end_datetime). Output: the offending pairs —
    (timeseries_id, metadata_a, metadata_b) with metadata_a <
    metadata_b, one row per conflicting deployment pair.
    """
    d = deployments.select(
        "metadata_id",
        F.col("start_datetime").alias("__s"),
        _inf(F.col("end_datetime")).alias("__e"),
    )
    ld = links.join(F.broadcast(d), "metadata_id")
    a = ld.select(
        F.col("timeseries_id"),
        F.col("metadata_id").alias("metadata_a"),
        F.col("__s").alias("__sa"), F.col("__e").alias("__ea"),
    )
    b = ld.select(
        F.col("timeseries_id"),
        F.col("metadata_id").alias("metadata_b"),
        F.col("__s").alias("__sb"), F.col("__e").alias("__eb"),
    )
    return (
        a.join(b, "timeseries_id")
        .where(
            (F.col("metadata_a") < F.col("metadata_b"))
            & (F.col("__sa") < F.col("__eb"))
            & (F.col("__ea") > F.col("__sb"))
        )
        .select("timeseries_id", "metadata_a", "metadata_b")
        .distinct()
    )


def deployment_acquisition_validation(
    deployments: DataFrame,
    connections: DataFrame,
    instruments: DataFrame,
    protocols: DataFrame,
    signals: DataFrame,
    timeseries: DataFrame,
) -> DataFrame:
    """check_locations_metadata_instruments_acquisition_dependents
    (patch_44.R:645-714): would this deployment row invalidate its
    dependent connection metadata or signal→timeseries mappings?
    The trigger's two EXISTS probes, evaluated for every deployment.

    Probe 1 (→ ``invalid_connection_metadata``): any connection using
    the deployment as instrument OR logger where: either endpoint's
    instrument_id is NULL, the logger's instrument can_be_logger is
    not TRUE, an 'internal'-family protocol connects two DIFFERENT
    deployments (or a non-internal one connects a deployment to
    itself), the two deployments sit at different locations, or the
    connection period escapes either deployment period.

    Probe 2 (→ ``invalid_signal_mapping``): any signal of a connection
    whose instrument side is this deployment, where the linked
    timeseries disagrees on location / sub-location / (populated)
    z_id, or the signal's populated parameter differs from the
    timeseries parameter.

    Input: ``deployments`` (metadata_id, location_id, sub_location_id,
    z_id, instrument_id, start_datetime, end_datetime),
    ``connections`` (+protocol_id), ``instruments`` (instrument_id,
    can_be_logger), ``protocols`` (protocol_id, family_code),
    ``signals``, ``timeseries`` — schemas as in
    connection_signal_validation. Output: (metadata_id,
    invalid_connection_metadata, invalid_signal_mapping, valid).
    """
    dep = deployments.select(
        "metadata_id", "location_id", "sub_location_id", "z_id",
        "instrument_id",
        F.col("start_datetime").alias("__ds"),
        _inf(F.col("end_datetime")).alias("__de"),
    )
    i_side = dep.select(
        F.col("metadata_id").alias("__im"),
        F.col("instrument_id").alias("__i_inst"),
        F.col("location_id").alias("__i_loc"),
        F.col("__ds").alias("__is"), F.col("__de").alias("__ie"),
    )
    l_side = dep.select(
        F.col("metadata_id").alias("__lm"),
        F.col("instrument_id").alias("__l_inst"),
        F.col("location_id").alias("__l_loc"),
        F.col("__ds").alias("__ls"), F.col("__de").alias("__le"),
    )
    prot = protocols.select("protocol_id", "family_code")
    canlog = instruments.select(
        F.col("instrument_id").alias("__l_inst"),
        F.col("can_be_logger").alias("__can_log"),
    )
    conn = (
        connections
        .join(F.broadcast(i_side),
              F.col("instrument_metadata_id") == F.col("__im"), "left")
        .join(F.broadcast(l_side),
              F.col("logger_metadata_id") == F.col("__lm"), "left")
        .join(F.broadcast(prot), "protocol_id", "left")
        .join(F.broadcast(canlog), "__l_inst", "left")
        .withColumn("__cs", F.col("start_datetime"))
        .withColumn("__ce", _inf(F.col("end_datetime")))
    )
    bad_conn = conn.where(
        F.col("__i_inst").isNull()
        | F.col("__l_inst").isNull()
        | ~F.col("__can_log").eqNullSafe(F.lit(True))
        | ((F.col("family_code") == "internal")
           & (F.col("instrument_metadata_id")
              != F.col("logger_metadata_id")))
        | ((F.col("family_code") != "internal")
           & (F.col("instrument_metadata_id")
              == F.col("logger_metadata_id")))
        | (F.col("__i_loc") != F.col("__l_loc"))
        | (F.col("__cs") < F.col("__is"))
        | (F.col("__cs") < F.col("__ls"))
        | (F.col("__ce") > F.col("__ie"))
        | (F.col("__ce") > F.col("__le"))
    )
    flagged1 = (
        bad_conn.select(F.col("instrument_metadata_id").alias("metadata_id"))
        .unionByName(
            bad_conn.select(F.col("logger_metadata_id").alias("metadata_id")))
        .where(F.col("metadata_id").isNotNull())
        .distinct()
        .withColumn("__bad_conn", F.lit(True))
    )
    ts = timeseries.select(
        "timeseries_id",
        F.col("parameter_id").alias("__t_param"),
        F.col("location_id").alias("__t_loc"),
        F.col("sub_location_id").alias("__t_sub"),
        F.col("z_id").alias("__t_z"),
    )
    sig = (
        signals.where(F.col("timeseries_id").isNotNull())
        .join(F.broadcast(connections.select(
            "connection_id", "instrument_metadata_id")), "connection_id")
        .join(F.broadcast(ts), "timeseries_id")
        .join(F.broadcast(dep),
              F.col("instrument_metadata_id") == F.col("metadata_id"))
    )
    bad_sig = sig.where(
        (F.col("__t_loc") != F.col("location_id"))
        | ~F.col("__t_sub").eqNullSafe(F.col("sub_location_id"))
        | (F.col("z_id").isNotNull()
           & ~F.col("__t_z").eqNullSafe(F.col("z_id")))
        | (F.col("parameter_id").isNotNull()
           & ~F.col("__t_param").eqNullSafe(F.col("parameter_id")))
    )
    flagged2 = (
        bad_sig.select("metadata_id").distinct()
        .withColumn("__bad_sig", F.lit(True))
    )
    return (
        deployments.select("metadata_id")
        .join(F.broadcast(flagged1), "metadata_id", "left")
        .join(F.broadcast(flagged2), "metadata_id", "left")
        .select(
            "metadata_id",
            F.coalesce("__bad_conn", F.lit(False))
            .alias("invalid_connection_metadata"),
            F.coalesce("__bad_sig", F.lit(False))
            .alias("invalid_signal_mapping"),
            (~(F.coalesce("__bad_conn", F.lit(False))
               | F.coalesce("__bad_sig", F.lit(False)))).alias("valid"),
        )
    )
