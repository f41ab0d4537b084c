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


# ---------------------------------------------------------------------------
# patch_36/37 instrument transmission + connection validator family.
# patch_44 rebuilds the connection-*signal* and acquisition checks
# (above) but never drops these triggers, so they remain live reference
# surface: the deployment-meta overlap guard (patch_36.R:33), the
# connection bounds/overlap constraint triggers (patch_37.R:503,611),
# the logger-capability and protocol-dependents guards (:1106,1130),
# and the telemetry-setup family (:1699-2300). Each PL/pgSQL trigger
# re-runs lookups + EXISTS probes per mutated row; re-expressed here
# set-wise each becomes one broadcast-ladder pass over the whole
# catalog table, labelling every row with the FIRST failing check in
# the trigger's RAISE order (NULL = accepted).
# ---------------------------------------------------------------------------


def instrument_meta_overlap(deployments: DataFrame) -> DataFrame:
    """check_instrument_meta_overlap (patch_36.R:33-57): a deployment
    row conflicts when ANOTHER row shares its (location_id,
    sub_location_id, z_id, instrument_id) — the nullable keys compared
    IS NOT DISTINCT FROM — and its [start, coalesce(end, infinity))
    period overlaps. Replayed for every row at once via one
    self-equi-join with eqNullSafe (<=>) on the three nullable key
    parts — Catalyst plans <=> as an equi-join key, so NULLs co-bucket
    without sentinel encodings — not a theta-join: the join keys are
    exact, only the period test is an inequality.

    Input: ``deployments`` = locations_metadata_instruments
    (metadata_id, location_id, sub_location_id, z_id, instrument_id,
    start_datetime, end_datetime). Output: every input row +
    ``overlap_violation``.
    """
    d = deployments.select(
        "metadata_id", "location_id", "sub_location_id", "z_id",
        "instrument_id",
        F.col("start_datetime").alias("__s"),
        _inf(F.col("end_datetime")).alias("__e"),
    # location_id compares with plain `=` in the trigger (NULL never
    # matches — it is the NOT NULL anchor of the key), so NULL-location
    # rows cannot conflict and are excluded from the probe outright;
    # the three genuinely nullable parts compare IS NOT DISTINCT FROM
    ).where(F.col("location_id").isNotNull())
    # null-safe equi-join on the raw key parts: Catalyst plans <=> as
    # an equi (broadcast hash) join key, so NULLs co-bucket without a
    # sentinel encoding (a concat_ws('|', coalesce(..,'~')) key would
    # collide string-typed values equal to '~' or containing '|')
    b = d.select(
        F.col("location_id").alias("__o_loc"),
        F.col("sub_location_id").alias("__o_sub"),
        F.col("z_id").alias("__o_z"),
        F.col("instrument_id").alias("__o_inst"),
        F.col("metadata_id").alias("__o_m"),
        F.col("__s").alias("__o_s"),
        F.col("__e").alias("__o_e"),
    )
    hit = (
        d.join(F.broadcast(b),
               (F.col("location_id") == F.col("__o_loc"))
               & F.col("sub_location_id").eqNullSafe(F.col("__o_sub"))
               & F.col("z_id").eqNullSafe(F.col("__o_z"))
               & F.col("instrument_id").eqNullSafe(F.col("__o_inst"))
               & (F.col("metadata_id") != F.col("__o_m"))
               & (F.col("__s") < F.col("__o_e"))
               & (F.col("__e") > F.col("__o_s")),
               "left_semi")
        .select("metadata_id")
        .withColumn("__hit", F.lit(True))
    )
    return (
        deployments.select("metadata_id", "location_id",
                           "sub_location_id", "z_id", "instrument_id")
        .join(F.broadcast(hit), "metadata_id", "left")
        .select(
            "metadata_id", "location_id", "sub_location_id", "z_id",
            "instrument_id",
            F.coalesce("__hit", F.lit(False)).alias("overlap_violation"),
        )
    )


def connection_bounds_validation(
    connections: DataFrame,
    deployments: DataFrame,
    instruments: DataFrame,
    protocols: DataFrame,
) -> DataFrame:
    """check_instrument_connection_bounds (patch_37.R:503-608) +
    check_instrument_connection_overlap (:611-668), set-wise: every
    instrument/logger connection row gets the FIRST failing bounds
    check in the trigger's RAISE order as ``reject_reason`` (NULL =
    accepted), plus the two overlap-trigger probes as flags —
    ``duplicate_overlap`` (same instrument/logger/protocol/port/scope/
    address tuple, COALESCE('') on the nullable parts, overlapping
    period) and ``address_conflict`` (device_address reuse on the same
    logger/protocol/port/scope while active).

    Bounds ladder: unknown_instrument_deployment /
    unknown_logger_deployment / unknown_protocol /
    instrument_not_deployed / logger_not_deployed / logger_not_capable
    (can_be_logger IS DISTINCT FROM TRUE, missing instrument row
    included) / internal_protocol_split_deployment /
    shared_deployment_not_internal / location_mismatch /
    start_before_deployment / end_beyond_instrument /
    end_beyond_logger.

    Input: ``connections`` (connection_id, instrument_metadata_id,
    logger_metadata_id, protocol_id, logger_port, address_scope,
    device_address, start_datetime, end_datetime), ``deployments``
    (metadata_id, location_id, instrument_id, start_datetime,
    end_datetime), ``instruments`` (instrument_id, can_be_logger),
    ``protocols`` (protocol_id, family_code).
    """
    i_side = deployments.select(
        F.col("metadata_id").alias("__im"),
        F.col("instrument_id").alias("__i_inst"),
        F.col("location_id").alias("__i_loc"),
        F.col("start_datetime").alias("__is"),
        _inf(F.col("end_datetime")).alias("__ie"),
    )
    l_side = deployments.select(
        F.col("metadata_id").alias("__lm"),
        F.col("instrument_id").alias("__l_inst"),
        F.col("location_id").alias("__l_loc"),
        F.col("start_datetime").alias("__ls"),
        _inf(F.col("end_datetime")).alias("__le"),
    )
    canlog = instruments.select(
        F.col("instrument_id").alias("__l_inst"),
        F.col("can_be_logger").alias("__can_log"),
    )
    prot = protocols.select(
        "protocol_id", F.col("family_code").alias("__fam"))
    base = (
        connections
        .withColumn("__cs", F.col("start_datetime"))
        .withColumn("__ce", _inf(F.col("end_datetime")))
        .join(F.broadcast(i_side),
              F.col("instrument_metadata_id") == F.col("__im"), "left")
        .join(F.broadcast(l_side),
              F.col("logger_metadata_id") == F.col("__lm"), "left")
        .join(F.broadcast(prot), "protocol_id", "left")
        .join(F.broadcast(canlog), "__l_inst", "left")
    )
    # overlap trigger probes: both key off COALESCE('') tuples —
    # exact equi-joins, only the period test is an inequality
    blank = lambda c: F.coalesce(F.col(c), F.lit(""))  # noqa: E731
    probe = connections.select(
        F.col("connection_id").alias("__o_id"),
        F.col("instrument_metadata_id").alias("__o_im"),
        F.col("logger_metadata_id").alias("__o_lm"),
        F.col("protocol_id").alias("__o_p"),
        blank("logger_port").alias("__o_port"),
        blank("address_scope").alias("__o_scope"),
        blank("device_address").alias("__o_addr"),
        F.col("device_address").alias("__o_addr_raw"),
        F.col("start_datetime").alias("__o_s"),
        _inf(F.col("end_datetime")).alias("__o_e"),
    )
    me = connections.select(
        "connection_id",
        F.col("instrument_metadata_id").alias("__m_im"),
        F.col("logger_metadata_id").alias("__m_lm"),
        F.col("protocol_id").alias("__m_p"),
        blank("logger_port").alias("__m_port"),
        blank("address_scope").alias("__m_scope"),
        blank("device_address").alias("__m_addr"),
        F.col("device_address").alias("__m_addr_raw"),
        F.col("start_datetime").alias("__m_s"),
        _inf(F.col("end_datetime")).alias("__m_e"),
    )
    dup = (
        me.join(F.broadcast(probe),
                (F.col("__m_im") == F.col("__o_im"))
                & (F.col("__m_lm") == F.col("__o_lm"))
                & (F.col("__m_p") == F.col("__o_p"))
                & (F.col("__m_port") == F.col("__o_port"))
                & (F.col("__m_scope") == F.col("__o_scope"))
                & (F.col("__m_addr") == F.col("__o_addr"))
                & (F.col("connection_id") != F.col("__o_id"))
                & (F.col("__m_s") < F.col("__o_e"))
                & (F.col("__m_e") > F.col("__o_s")),
                "left_semi")
        .select("connection_id").withColumn("__dup", F.lit(True))
    )
    addr = (
        me.where(F.col("__m_addr_raw").isNotNull())
        .join(F.broadcast(probe),
              (F.col("__m_lm") == F.col("__o_lm"))
              & (F.col("__m_p") == F.col("__o_p"))
              & (F.col("__m_port") == F.col("__o_port"))
              & (F.col("__m_scope") == F.col("__o_scope"))
              & (F.col("__m_addr_raw") == F.col("__o_addr_raw"))
              & (F.col("connection_id") != F.col("__o_id"))
              & (F.col("__m_s") < F.col("__o_e"))
              & (F.col("__m_e") > F.col("__o_s")),
              "left_semi")
        .select("connection_id").withColumn("__addr", F.lit(True))
    )
    out = (
        base
        .join(F.broadcast(dup), "connection_id", "left")
        .join(F.broadcast(addr), "connection_id", "left")
    )
    reason = (
        F.when(F.col("__im").isNull(), "unknown_instrument_deployment")
        .when(F.col("__lm").isNull(), "unknown_logger_deployment")
        .when(F.col("__fam").isNull(), "unknown_protocol")
        .when(F.col("__i_inst").isNull(), "instrument_not_deployed")
        .when(F.col("__l_inst").isNull(), "logger_not_deployed")
        .when(~F.col("__can_log").eqNullSafe(F.lit(True)),
              "logger_not_capable")
        .when((F.col("__fam") == "internal")
              & (F.col("instrument_metadata_id")
                 != F.col("logger_metadata_id")),
              "internal_protocol_split_deployment")
        .when((F.col("__fam") != "internal")
              & (F.col("instrument_metadata_id")
                 == F.col("logger_metadata_id")),
              "shared_deployment_not_internal")
        .when(F.col("__i_loc") != F.col("__l_loc"), "location_mismatch")
        .when((F.col("__cs") < F.col("__is"))
              | (F.col("__cs") < F.col("__ls")),
              "start_before_deployment")
        .when(F.col("__ce") > F.col("__ie"), "end_beyond_instrument")
        .when(F.col("__ce") > F.col("__le"), "end_beyond_logger")
    )
    return out.select(
        "connection_id", "instrument_metadata_id", "logger_metadata_id",
        "protocol_id", reason.alias("reject_reason"),
        F.coalesce("__dup", F.lit(False)).alias("duplicate_overlap"),
        F.coalesce("__addr", F.lit(False)).alias("address_conflict"),
    )


def transmission_setup_validation(
    setups: DataFrame,
    components: DataFrame,
    deployments: DataFrame,
    instruments: DataFrame,
) -> DataFrame:
    """The three telemetry-setup triggers of patch_37 replayed for
    every locations_metadata_transmission_setups row at once:

    * check_transmission_setup_bounds (patch_37.R:1699-1750) — the
      ``reject_reason`` ladder: unknown_logger_deployment /
      logger_not_deployed / logger_not_capable (can_be_logger IS
      DISTINCT FROM TRUE, missing instruments row included) /
      start_before_logger / end_beyond_logger.
    * check_transmission_setup_overlap (:1753-1790) →
      ``duplicate_overlap``: another setup with the same
      (logger_metadata_id, transmission_method_id,
      coalesce(provider_name,''), coalesce(platform_identifier,''))
      and an overlapping [start, coalesce(end, infinity)) period.
    * check_transmission_setup_component_bounds (:2136-2210) →
      ``components_not_spanning``: EXISTS an attached component whose
      deployment is undeployed, lacks both telemetry capabilities
      (COALESCE(..., FALSE) like the trigger), sits at a different
      location than the logger, or does not span the setup period.
      The trigger dereferences the logger row before this probe, so
      the flag is only meaningful on rows whose ladder is NULL (a
      missing logger leaves the location test NULL → not flagged,
      matching the RAISE-first short-circuit).

    Input: ``setups`` (transmission_setup_id, logger_metadata_id,
    transmission_method_id, provider_name, platform_identifier,
    start_datetime, end_datetime), ``components``
    (transmission_component_id, transmission_setup_id,
    component_metadata_id), ``deployments`` (metadata_id, location_id,
    instrument_id, start_datetime, end_datetime), ``instruments``
    (instrument_id, can_be_logger, can_be_telemetry_component).
    """
    l_side = deployments.select(
        F.col("metadata_id").alias("__lm"),
        F.col("instrument_id").alias("__l_inst"),
        F.col("location_id").alias("__l_loc"),
        F.col("start_datetime").alias("__ls"),
        _inf(F.col("end_datetime")).alias("__le"),
    )
    caps = instruments.select(
        F.col("instrument_id").alias("__inst"),
        F.col("can_be_logger").alias("__can_log"),
        F.col("can_be_telemetry_component").alias("__can_comp"),
    )
    base = (
        setups
        .withColumn("__ss", F.col("start_datetime"))
        .withColumn("__se", _inf(F.col("end_datetime")))
        .join(F.broadcast(l_side),
              F.col("logger_metadata_id") == F.col("__lm"), "left")
        .join(F.broadcast(caps.select(F.col("__inst").alias("__l_inst"),
                                      "__can_log")),
              "__l_inst", "left")
    )
    blank = lambda c: F.coalesce(F.col(c), F.lit(""))  # noqa: E731
    probe = setups.select(
        F.col("transmission_setup_id").alias("__o_id"),
        F.col("logger_metadata_id").alias("__o_lm"),
        F.col("transmission_method_id").alias("__o_meth"),
        blank("provider_name").alias("__o_prov"),
        blank("platform_identifier").alias("__o_plat"),
        F.col("start_datetime").alias("__o_s"),
        _inf(F.col("end_datetime")).alias("__o_e"),
    )
    me = setups.select(
        "transmission_setup_id",
        F.col("logger_metadata_id").alias("__m_lm"),
        F.col("transmission_method_id").alias("__m_meth"),
        blank("provider_name").alias("__m_prov"),
        blank("platform_identifier").alias("__m_plat"),
        F.col("start_datetime").alias("__m_s"),
        _inf(F.col("end_datetime")).alias("__m_e"),
    )
    dup = (
        me.join(F.broadcast(probe),
                (F.col("__m_lm") == F.col("__o_lm"))
                & (F.col("__m_meth") == F.col("__o_meth"))
                & (F.col("__m_prov") == F.col("__o_prov"))
                & (F.col("__m_plat") == F.col("__o_plat"))
                & (F.col("transmission_setup_id") != F.col("__o_id"))
                & (F.col("__m_s") < F.col("__o_e"))
                & (F.col("__m_e") > F.col("__o_s")),
                "left_semi")
        .select("transmission_setup_id").withColumn("__dup", F.lit(True))
    )
    # component-span probe: component deployment joined once (INNER,
    # like the trigger's JOIN — an unknown component deployment is
    # the component-bounds trigger's problem, not this one's), the
    # setup period compared against it under the setup's own logger
    comp = (
        components.select("transmission_setup_id",
                          "component_metadata_id")
        .join(F.broadcast(deployments.select(
            F.col("metadata_id").alias("component_metadata_id"),
            F.col("instrument_id").alias("__c_inst"),
            F.col("location_id").alias("__c_loc"),
            F.col("start_datetime").alias("__c_s"),
            _inf(F.col("end_datetime")).alias("__c_e"))),
            "component_metadata_id")
        .join(F.broadcast(caps.select(F.col("__inst").alias("__c_inst"),
                                      "__can_comp",
                                      F.col("__can_log")
                                      .alias("__c_can_log"))),
              "__c_inst", "left")
    )
    bad_span = (
        base.select("transmission_setup_id",
                    F.col("__l_loc"), F.col("__ss"), F.col("__se"))
        .join(F.broadcast(comp), "transmission_setup_id")
        .where(
            F.col("__c_inst").isNull()
            | (~F.coalesce(F.col("__can_comp"), F.lit(False))
               .eqNullSafe(F.lit(True))
               & ~F.coalesce(F.col("__c_can_log"), F.lit(False))
               .eqNullSafe(F.lit(True)))
            | (F.col("__c_loc") != F.col("__l_loc"))
            | (F.col("__ss") < F.col("__c_s"))
            | (F.col("__se") > F.col("__c_e"))
        )
        .select("transmission_setup_id").distinct()
        .withColumn("__span", F.lit(True))
    )
    out = (
        base
        .join(F.broadcast(dup), "transmission_setup_id", "left")
        .join(F.broadcast(bad_span), "transmission_setup_id", "left")
    )
    reason = (
        F.when(F.col("__lm").isNull(), "unknown_logger_deployment")
        .when(F.col("__l_inst").isNull(), "logger_not_deployed")
        .when(~F.col("__can_log").eqNullSafe(F.lit(True)),
              "logger_not_capable")
        .when(F.col("__ss") < F.col("__ls"), "start_before_logger")
        .when(F.col("__se") > F.col("__le"), "end_beyond_logger")
    )
    return out.select(
        "transmission_setup_id", "logger_metadata_id",
        "transmission_method_id", reason.alias("reject_reason"),
        F.coalesce("__dup", F.lit(False)).alias("duplicate_overlap"),
        F.coalesce("__span", F.lit(False)).alias("components_not_spanning"),
    )


def transmission_component_validation(
    components: DataFrame,
    setups: DataFrame,
    deployments: DataFrame,
    instruments: DataFrame,
) -> DataFrame:
    """check_transmission_component_bounds (patch_37.R:2032-2133) for
    every locations_metadata_transmission_components row at once —
    the trigger's lookup-and-RAISE chain as a first-failure ladder:
    unknown_setup / unknown_logger_deployment / logger_not_deployed /
    logger_not_capable / unknown_component_deployment /
    component_not_deployed / component_not_capable (NOT
    (can_be_telemetry_component OR can_be_logger), missing instruments
    row included) / location_mismatch (component vs the setup's
    logger) / component_starts_late (setup starts before the component
    deployment) / component_ends_early (setup outlives it).

    Input schemas as transmission_setup_validation; output one row per
    component with ``reject_reason`` (NULL = accepted).
    """
    setup_side = setups.select(
        F.col("transmission_setup_id"),
        F.col("logger_metadata_id").alias("__lm_ref"),
        F.col("start_datetime").alias("__ss"),
        _inf(F.col("end_datetime")).alias("__se"),
        F.lit(True).alias("__has_setup"),
    )
    l_side = deployments.select(
        F.col("metadata_id").alias("__lm_ref"),
        F.col("instrument_id").alias("__l_inst"),
        F.col("location_id").alias("__l_loc"),
        F.lit(True).alias("__has_logger"),
    )
    c_side = deployments.select(
        F.col("metadata_id").alias("component_metadata_id"),
        F.col("instrument_id").alias("__c_inst"),
        F.col("location_id").alias("__c_loc"),
        F.col("start_datetime").alias("__cs"),
        _inf(F.col("end_datetime")).alias("__ce"),
        F.lit(True).alias("__has_comp"),
    )
    caps = instruments.select(
        F.col("instrument_id").alias("__inst"),
        F.col("can_be_logger").alias("__can_log"),
        F.col("can_be_telemetry_component").alias("__can_comp"),
    )
    out = (
        components
        .join(F.broadcast(setup_side), "transmission_setup_id", "left")
        .join(F.broadcast(l_side), "__lm_ref", "left")
        .join(F.broadcast(caps.select(F.col("__inst").alias("__l_inst"),
                                      "__can_log")),
              "__l_inst", "left")
        .join(F.broadcast(c_side), "component_metadata_id", "left")
        .join(F.broadcast(caps.select(F.col("__inst").alias("__c_inst"),
                                      "__can_comp",
                                      F.col("__can_log")
                                      .alias("__c_can_log"))),
              "__c_inst", "left")
    )
    comp_capable = (F.coalesce(F.col("__can_comp"), F.lit(False))
                    | F.coalesce(F.col("__c_can_log"), F.lit(False)))
    reason = (
        F.when(F.col("__has_setup").isNull(), "unknown_setup")
        .when(F.col("__has_logger").isNull(), "unknown_logger_deployment")
        .when(F.col("__l_inst").isNull(), "logger_not_deployed")
        .when(~F.col("__can_log").eqNullSafe(F.lit(True)),
              "logger_not_capable")
        .when(F.col("__has_comp").isNull(), "unknown_component_deployment")
        .when(F.col("__c_inst").isNull(), "component_not_deployed")
        .when(~comp_capable.eqNullSafe(F.lit(True)),
              "component_not_capable")
        .when(F.col("__c_loc") != F.col("__l_loc"), "location_mismatch")
        .when(F.col("__ss") < F.col("__cs"), "component_starts_late")
        .when(F.col("__se") > F.col("__ce"), "component_ends_early")
    )
    return out.select(
        "transmission_component_id", "transmission_setup_id",
        "component_metadata_id", reason.alias("reject_reason"),
    )


def transmission_capability_validation(
    instruments: DataFrame,
    deployments: DataFrame,
    connections: DataFrame,
    setups: DataFrame,
    components: DataFrame,
) -> DataFrame:
    """check_instrument_logger_capability (patch_37.R:1106-1128) and
    check_instrument_transmission_capabilities (:2300-2346) replayed
    for every instruments.instruments row: an instrument already in
    use as a connection logger or transmission-setup logger cannot
    drop ``can_be_logger``, and one in use as a transmission component
    cannot drop BOTH capabilities. Usage is resolved the trigger's way
    — deployment rows for the instrument semi-joined against the
    referencing catalog table — three semi-joins, all catalog-keyed
    and broadcast.

    Output: (instrument_id, can_be_logger, can_be_telemetry_component,
    used_as_connection_logger, used_as_transmission_logger,
    used_as_component, logger_capability_violation,
    component_capability_violation).
    """
    dep = deployments.select(
        F.col("metadata_id"), F.col("instrument_id"))
    use1 = (
        dep.join(F.broadcast(connections.select(
            F.col("logger_metadata_id").alias("metadata_id"))),
            "metadata_id", "left_semi")
        .select("instrument_id").distinct()
        .withColumn("__u_conn", F.lit(True))
    )
    use2 = (
        dep.join(F.broadcast(setups.select(
            F.col("logger_metadata_id").alias("metadata_id"))),
            "metadata_id", "left_semi")
        .select("instrument_id").distinct()
        .withColumn("__u_setup", F.lit(True))
    )
    use3 = (
        dep.join(F.broadcast(components.select(
            F.col("component_metadata_id").alias("metadata_id"))),
            "metadata_id", "left_semi")
        .select("instrument_id").distinct()
        .withColumn("__u_comp", F.lit(True))
    )
    out = (
        instruments.select("instrument_id", "can_be_logger",
                           "can_be_telemetry_component")
        .join(F.broadcast(use1), "instrument_id", "left")
        .join(F.broadcast(use2), "instrument_id", "left")
        .join(F.broadcast(use3), "instrument_id", "left")
    )
    not_logger = ~F.col("can_be_logger").eqNullSafe(F.lit(True))
    not_comp = ~F.col("can_be_telemetry_component").eqNullSafe(F.lit(True))
    u_conn = F.coalesce("__u_conn", F.lit(False))
    u_setup = F.coalesce("__u_setup", F.lit(False))
    u_comp = F.coalesce("__u_comp", F.lit(False))
    return out.select(
        "instrument_id", "can_be_logger", "can_be_telemetry_component",
        u_conn.alias("used_as_connection_logger"),
        u_setup.alias("used_as_transmission_logger"),
        u_comp.alias("used_as_component"),
        (not_logger & (u_conn | u_setup))
        .alias("logger_capability_violation"),
        (not_logger & not_comp & u_comp)
        .alias("component_capability_violation"),
    )


def protocol_dependents_validation(
    protocols: DataFrame,
    connections: DataFrame,
) -> DataFrame:
    """check_communication_protocol_dependents (patch_37.R:1130-1160):
    the trigger guards protocol-metadata updates with a GLOBAL probe —
    EXISTS any connection where an 'internal'-family protocol links
    two different deployments or a non-internal one links a deployment
    to itself. Re-expressed per protocol (the grain an admin acts on):
    each protocol row reports how many of ITS connections violate the
    invariant, plus the trigger's own any-violation flag.

    Output: (protocol_id, family_code, violating_connections,
    would_invalidate) — would_invalidate = violating_connections > 0.
    """
    j = (
        connections.select("protocol_id", "instrument_metadata_id",
                           "logger_metadata_id")
        .join(F.broadcast(protocols.select("protocol_id", "family_code")),
              "protocol_id")
    )
    viol = (
        ((F.col("family_code") == "internal")
         & (F.col("instrument_metadata_id")
            != F.col("logger_metadata_id")))
        | ((F.col("family_code") != "internal")
           & (F.col("instrument_metadata_id")
              == F.col("logger_metadata_id")))
    )
    per = j.groupBy("protocol_id").agg(
        F.sum(viol.cast("long")).alias("violating_connections"))
    return (
        protocols.select("protocol_id", "family_code")
        .join(F.broadcast(per), "protocol_id", "left")
        .select(
            "protocol_id", "family_code",
            F.coalesce("violating_connections", F.lit(0))
            .alias("violating_connections"),
            (F.coalesce("violating_connections", F.lit(0)) > 0)
            .alias("would_invalidate"),
        )
    )


def deployment_transmission_dependents(
    deployments: DataFrame,
    setups: DataFrame,
    components: DataFrame,
    instruments: DataFrame,
) -> DataFrame:
    """check_locations_metadata_instruments_transmission_dependents
    (patch_37.R:2230-2298): would updating this deployment row
    invalidate its dependent telemetry metadata? The trigger's two
    EXISTS probes evaluated for every deployment at once:

    * probe 1 (→ ``invalid_setup_metadata``): any transmission setup
      whose logger is this deployment where the logger is undeployed,
      not can_be_logger, or the setup period escapes the deployment
      period.
    * probe 2 (→ ``invalid_component_metadata``): any
      component×setup×logger×component-deployment row touching this
      deployment (as logger OR component) violating the full
      component-bounds conjunction (capabilities COALESCE(..., FALSE)
      like the trigger, location match, setup period within both
      deployment periods).

    Output: (metadata_id, invalid_setup_metadata,
    invalid_component_metadata, valid).
    """
    dep = deployments.select(
        "metadata_id",
        F.col("location_id").alias("__loc"),
        F.col("instrument_id").alias("__inst"),
        F.col("start_datetime").alias("__s"),
        _inf(F.col("end_datetime")).alias("__e"),
    )
    caps = instruments.select(
        F.col("instrument_id").alias("__inst"),
        F.col("can_be_logger").alias("__can_log"),
        F.col("can_be_telemetry_component").alias("__can_comp"),
    )
    sl = (
        setups.select(
            "transmission_setup_id",
            F.col("logger_metadata_id"),
            F.col("start_datetime").alias("__ss"),
            _inf(F.col("end_datetime")).alias("__se"))
        .join(F.broadcast(dep.select(
            F.col("metadata_id").alias("logger_metadata_id"),
            F.col("__loc").alias("__l_loc"),
            F.col("__inst").alias("__l_inst"),
            F.col("__s").alias("__ls"),
            F.col("__e").alias("__le"))), "logger_metadata_id")
        .join(F.broadcast(caps.select(
            F.col("__inst").alias("__l_inst"),
            F.col("__can_log"))), "__l_inst", "left")
    )
    bad1 = (
        sl.where(
            F.col("__l_inst").isNull()
            | ~F.col("__can_log").eqNullSafe(F.lit(True))
            | (F.col("__ss") < F.col("__ls"))
            | (F.col("__se") > F.col("__le"))
        )
        .select(F.col("logger_metadata_id").alias("metadata_id"))
        .distinct().withColumn("__bad1", F.lit(True))
    )
    cl = (
        components.select("transmission_setup_id",
                          "component_metadata_id")
        .join(F.broadcast(sl.select(
            "transmission_setup_id", "logger_metadata_id",
            "__l_loc", "__l_inst", "__ls", "__le", "__ss", "__se",
            "__can_log")), "transmission_setup_id")
        .join(F.broadcast(dep.select(
            F.col("metadata_id").alias("component_metadata_id"),
            F.col("__loc").alias("__c_loc"),
            F.col("__inst").alias("__c_inst"),
            F.col("__s").alias("__cs"),
            F.col("__e").alias("__ce"))), "component_metadata_id")
        .join(F.broadcast(caps.select(
            F.col("__inst").alias("__c_inst"),
            F.col("__can_comp"),
            F.col("__can_log").alias("__c_can_log"))),
            "__c_inst", "left")
    )
    bad_row = cl.where(
        F.col("__l_inst").isNull()
        | ~F.col("__can_log").eqNullSafe(F.lit(True))
        | F.col("__c_inst").isNull()
        | (~F.coalesce(F.col("__can_comp"), F.lit(False))
           .eqNullSafe(F.lit(True))
           & ~F.coalesce(F.col("__c_can_log"), F.lit(False))
           .eqNullSafe(F.lit(True)))
        | (F.col("__c_loc") != F.col("__l_loc"))
        | (F.col("__ss") < F.col("__ls"))
        | (F.col("__se") > F.col("__le"))
        | (F.col("__ss") < F.col("__cs"))
        | (F.col("__se") > F.col("__ce"))
    )
    bad2 = (
        bad_row.select(F.col("logger_metadata_id").alias("metadata_id"))
        .unionByName(bad_row.select(
            F.col("component_metadata_id").alias("metadata_id")))
        .distinct().withColumn("__bad2", F.lit(True))
    )
    return (
        deployments.select("metadata_id")
        .join(F.broadcast(bad1), "metadata_id", "left")
        .join(F.broadcast(bad2), "metadata_id", "left")
        .select(
            "metadata_id",
            F.coalesce("__bad1", F.lit(False))
            .alias("invalid_setup_metadata"),
            F.coalesce("__bad2", F.lit(False))
            .alias("invalid_component_metadata"),
            (~(F.coalesce("__bad1", F.lit(False))
               | F.coalesce("__bad2", F.lit(False)))).alias("valid"),
        )
    )


def timeseries_dependents_check(
    timeseries: DataFrame,
    signals: DataFrame,
    connections: DataFrame,
    deployments: DataFrame,
) -> DataFrame:
    """check_timeseries_dependents (patch_37.R:1072-1101, constraint
    trigger :1187-1192): the REVERSE-direction dependents guard — an
    update to a ``timeseries`` row must not invalidate existing
    instrument connection-signal metadata. The trigger's EXISTS probe
    walks signals → connections → deployments for the updated
    timeseries_id and fires when any linked deployment disagrees on
    location (plain ``<>``; both sides NOT NULL), sub-location
    (IS DISTINCT FROM), z (only when the DEPLOYMENT's z is set), or
    when a signal pins a parameter the timeseries no longer carries.

    Replayed set-wise for every timeseries row at once: the
    signals→connections→deployments ladder is assembled ONCE as a
    catalog-sized broadcast probe frame keyed by timeseries_id, then a
    single broadcast left-semi equi-join (timeseries_id is the key;
    the four mismatch tests are residual conditions) marks violating
    rows — the same first-failure-ladder shape as the other patch_36/
    37 validators, O(|catalog|) with zero shuffles on the fact side.

    Output: every timeseries row + ``dependents_violation`` (non-null
    boolean; TRUE = the trigger would RAISE on this update).
    """
    probe = (
        signals.where(F.col("timeseries_id").isNotNull())
        .select(
            "timeseries_id",
            F.col("connection_id"),
            F.col("parameter_id").alias("__s_param"),
        )
        .join(F.broadcast(connections.select(
            "connection_id",
            F.col("instrument_metadata_id").alias("metadata_id"))),
            "connection_id")
        .join(F.broadcast(deployments.select(
            "metadata_id",
            F.col("location_id").alias("__i_loc"),
            F.col("sub_location_id").alias("__i_sub"),
            F.col("z_id").alias("__i_z"))),
            "metadata_id")
        .select("timeseries_id", "__s_param", "__i_loc", "__i_sub",
                "__i_z")
    )
    ts = timeseries.select(
        "timeseries_id", "parameter_id", "location_id",
        "sub_location_id", "z_id")
    mismatch = (
        (F.col("location_id") != F.col("__i_loc"))
        | ~F.col("sub_location_id").eqNullSafe(F.col("__i_sub"))
        | (F.col("__i_z").isNotNull()
           & ~F.col("z_id").eqNullSafe(F.col("__i_z")))
        | (F.col("__s_param").isNotNull()
           & ~F.col("parameter_id").eqNullSafe(F.col("__s_param")))
    )
    hit = (
        ts.join(F.broadcast(probe),
                (ts["timeseries_id"] == probe["timeseries_id"])
                & mismatch,
                "left_semi")
        .select("timeseries_id")
        .withColumn("__hit", F.lit(True))
    )
    return (
        ts.join(F.broadcast(hit), "timeseries_id", "left")
        .select(
            "timeseries_id", "parameter_id", "location_id",
            "sub_location_id", "z_id",
            F.coalesce("__hit", F.lit(False))
            .alias("dependents_violation"),
        )
    )
