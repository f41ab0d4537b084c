"""EQWin water-quality normalization — the full downloadEQWin contract
(R/downloadEQWin.R:43-742) as set-wise Spark expressions, fetch (Access
ODBC) kept injectable.

The reference loops sample-by-sample / result-by-result on the driver;
here every kernel is a column expression or broadcast join so one pass
normalizes an arbitrary number of stations' exports:

- result parsing (R/downloadEQWin.R:661-709 ``eqwin_parse_result``):
  '<'/'>' prefixes become below/above-detection conditions, the numeric
  remainder is transformed ``value * conversion + result_offset`` (NULL
  conversion -> 1, NULL offset -> 0); detection-limited rows carry the
  transformed value in ``result_condition_value`` with ``result`` NULL;
  non-numeric remainders are rejected rows;
- sample-type ladder (R/downloadEQWin.R:626-659 ``eqwin_sample_type``):
  blank wording in SampleNo+SampleComments (trip > lab > field/any
  blank) overrides SampleClass D/I/XX, each falling back to the routine
  default when the specific type id is absent;
- station defaults (R/downloadEQWin.R:495-624
  ``eqwin_discrete_defaults``): StnType GW/GROUNDWATER -> groundwater
  media + Pump collection, else surface water + direct-fill bottle;
- datetime handling (R/downloadEQWin.R:478-489
  ``eqwin_collect_datetime_to_utc``): date-only or exact-midnight local
  stamps get the ``unknown_time_local`` time, then local -> UTC.  The
  reference converts via a named zone (default MST, fixed UTC-7); here
  the default is the equivalent explicit hour offset, and the ``tz``
  parameter opts into a named zone with real DST arithmetic
  (``to_utc_timestamp``) for zones that observe it;
- required-target drops (R/downloadEQWin.R:711-733): parameters flagged
  ``sample_fraction`` / ``result_speciation`` in ``public.parameters``
  reject results whose mapping lacks the corresponding id;
- note collapse (R/downloadEQWin.R:735-742 ``eqwin_collapse_note``):
  first-occurrence-ordered unique non-empty strings joined with '; ';
- samples whose results all fail mapping/parsing/requiredness are
  dropped entirely (R/downloadEQWin.R:243-246).

Scale shape: mapping/parameters/stations are catalog-sized broadcasts;
the results fact is touched in one map-side pass; the result<->sample
reconciliation is a pair of shuffle semi-joins co-partitioned on
sample_key (sample-cardinality — never broadcast).  No Python UDFs
anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# discrete.result_conditions ids resolved by label grep in the
# reference (R/downloadEQWin.R:296-320); fixed ids in our dims
BELOW_DETECTION_ID = 1
ABOVE_DETECTION_ID = 2


def resolve_type_ids(sample_types: dict[str, int]) -> dict[str, int | None]:
    """sample_types dim (label -> id) -> the ladder's type-id dict.

    Mirrors eqwin_discrete_defaults' lookup preferences
    (R/downloadEQWin.R:529-624): the replicate slot prefers
    'QC-sample-other' and falls back to 'QC-sample-field replicate';
    every other slot is a plain label lookup; a missing label leaves
    None (sample_type_expr then falls back to routine).
    """

    def g(*labels: str) -> int | None:
        for label in labels:
            if label in sample_types:
                return sample_types[label]
        return None

    return {
        "routine": sample_types["sample-routine"],
        "replicate": g("QC-sample-other", "QC-sample-field replicate"),
        "field_blank": g("QC-sample-field blank"),
        "trip_blank": g("QC-sample-trip blank"),
        "lab_blank": g("QC-sample-lab blank"),
        "other": g("sample-other"),
        "unknown": g("unknown"),
    }


def collapse_note(*cols: Column) -> Column:
    """Ordered-unique non-empty strings joined with '; '
    (R/downloadEQWin.R:735-742); NULL when nothing survives."""
    trimmed = [F.nullif(F.trim(c.cast("string")), F.lit("")) for c in cols]
    parts = []
    for i, c in enumerate(trimmed):
        if i == 0:
            parts.append(c)
        else:
            dup = F.lit(False)
            for prev in trimmed[:i]:
                dup = dup | c.eqNullSafe(prev)
            parts.append(F.when(~dup, c))
    joined = F.concat_ws("; ", *parts)
    return F.nullif(joined, F.lit(""))


def sample_type_expr(
    sample_class: Column,
    sample_no: Column,
    sample_comments: Column,
    type_ids: dict[str, int | None],
) -> Column:
    """The eqwin_sample_type ladder (R/downloadEQWin.R:626-659).

    ``type_ids``: label -> id with keys routine / replicate /
    field_blank / trip_blank / lab_blank / other / unknown; a None id
    falls back to routine (``eqwin_default_sample_type``).  The
    replicate ('QC-sample-other' else 'QC-sample-field replicate')
    preference ladder of :536-553 is resolved by the caller when it
    builds this dict from the sample_types dim.
    """
    routine = F.lit(type_ids["routine"])

    def tid(key: str) -> Column:
        v = type_ids.get(key)
        return F.lit(v) if v is not None else routine

    text = F.concat_ws(
        " ",
        F.lower(F.trim(sample_no.cast("string"))),
        F.lower(F.trim(sample_comments.cast("string"))),
    )
    cls = F.upper(F.trim(sample_class.cast("string")))
    return (
        F.when(text.rlike(r"\btrip\s+blank\b"), tid("trip_blank"))
        .when(text.rlike(r"\blab(oratory)?\s+blank\b|\blabblank\b"),
              tid("lab_blank"))
        .when(text.rlike(r"\bfield\s+blank\b|\bblank\b"), tid("field_blank"))
        .when(cls == "D", tid("replicate"))
        .when(cls == "I", tid("other"))
        .when(cls == "XX", tid("unknown"))
        .otherwise(routine)
    )


def station_defaults(
    stn_type: Column,
    media_ids: dict[str, int],
    collection_ids: dict[str, int],
) -> tuple[Column, Column]:
    """(media_id, collection_method) defaults from the EQWin station
    type (R/downloadEQWin.R:495-527): groundwater stations sample by
    Pump, surface stations by direct-fill water bottle."""
    is_gw = F.upper(F.trim(stn_type.cast("string"))).isin("GW", "GROUNDWATER")
    media = F.when(is_gw, F.lit(media_ids["groundwater"])).otherwise(
        F.lit(media_ids["surface water"])
    )
    method = F.when(is_gw, F.lit(collection_ids["Pump"])).otherwise(
        F.lit(collection_ids["Water Bottle (direct fill)"])
    )
    return media, method


def collect_datetime_to_utc(
    dt: Column,
    tz_offset_hours: int = -7,
    unknown_time_local: str = "12:00:00",
    tz: str | None = None,
) -> Column:
    """Local Access datetime text -> UTC timestamp
    (R/downloadEQWin.R:478-489): date-only values gain ' 00:00:00',
    exact-midnight values are rewritten to ``unknown_time_local``
    (collection time unknown), then local -> UTC. The reference
    converts via a named zone (default MST, fixed UTC-7); the default
    here is the equivalent explicit hour offset, and ``tz`` opts into
    a NAMED zone with real DST arithmetic (``to_utc_timestamp``
    through the JVM tz database) for deployments whose source zone
    observes it."""
    s = F.trim(dt.cast("string"))
    s = F.when(F.length(s) == 10, F.concat(s, F.lit(" 00:00:00"))).otherwise(s)
    s = F.regexp_replace(s, r" 00:00:00$", " " + unknown_time_local)
    local = F.to_timestamp(s)
    if tz is not None:
        return F.to_utc_timestamp(local, tz)
    return local - F.make_interval(hours=F.lit(tz_offset_hours))


def parse_results(
    results: DataFrame,
    mapping: DataFrame,
    parameters: DataFrame,
    result_col: str = "Result",
    below_detection: int = BELOW_DETECTION_ID,
    above_detection: int = ABOVE_DETECTION_ID,
) -> DataFrame:
    """eqdetail x eqparams rows -> canonical result rows.

    ``mapping`` (import_parameter_mappings subset): input_param,
    input_unit -> parameter_id, conversion, result_offset, result_type,
    sample_fraction_id, result_speciation_id, matrix_state_id.
    ``parameters``: parameter_id, sample_fraction, result_speciation
    booleans.  Unmapped, non-numeric, and incomplete-required-target
    rows are dropped (the reference warns and skips,
    R/downloadEQWin.R:200-246,711-733).
    """
    m = F.broadcast(
        mapping.select(
            F.col("input_param"), F.col("input_unit"),
            F.col("parameter_id").cast("long"),
            F.col("conversion").cast("double"),
            F.col("result_offset").cast("double"),
            F.col("result_type").cast("long"),
            F.col("sample_fraction_id").cast("long"),
            F.col("result_speciation_id").cast("long"),
            F.col("matrix_state_id").cast("long"),
        )
    )
    p = F.broadcast(
        parameters.select(
            F.col("parameter_id").cast("long").alias("__pid"),
            F.col("sample_fraction").cast("boolean").alias("__need_frac"),
            F.col("result_speciation").cast("boolean").alias("__need_spec"),
        )
    )

    raw = F.trim(F.col(result_col).cast("string"))
    is_below = raw.startswith("<")
    is_above = raw.startswith(">")
    stripped = F.regexp_replace(raw, r"^[<>]\s*", "")
    num = stripped.try_cast("double")
    value = (
        num * F.coalesce(F.col("conversion"), F.lit(1.0))
        + F.coalesce(F.col("result_offset"), F.lit(0.0))
    )
    condition = (
        F.when(is_below, F.lit(below_detection))
        .when(is_above, F.lit(above_detection))
        .cast("long")
    )

    # one select with fresh names: 'Result' (source) vs 'result'
    # (output) collide under Spark's case-insensitive resolution, so
    # every derived column is computed here before the rename
    out = (
        results.join(
            m,
            (F.col("ParamCode") == m["input_param"])
            & (F.col("Units") == m["input_unit"]),
            "inner",
        )
        .where(num.isNotNull())
        .select(
            F.col("SampleId").cast("long").alias("sample_key"),
            "parameter_id", "result_type",
            F.when(condition.isNull(), value).alias("result"),
            condition.alias("result_condition"),
            F.when(condition.isNotNull(), value)
            .alias("result_condition_value"),
            "sample_fraction_id", "result_speciation_id",
            "matrix_state_id",
            collapse_note(
                F.col("ResultCode"), F.col("ResultQuality"),
                F.col("DetailComment"),
            ).alias("note"),
        )
        .join(p, F.col("parameter_id") == F.col("__pid"), "left")
        .where(
            ~(
                F.coalesce(F.col("__need_frac"), F.lit(False))
                & F.col("sample_fraction_id").isNull()
            )
            & ~(
                F.coalesce(F.col("__need_spec"), F.lit(False))
                & F.col("result_speciation_id").isNull()
            )
        )
        .drop("__pid", "__need_frac", "__need_spec")
    )
    return out.select(
        "sample_key", "parameter_id", "result_type", "result",
        "result_condition", "result_condition_value",
        "sample_fraction_id", "result_speciation_id", "matrix_state_id",
        "note",
    )


def normalize_samples(
    samples: DataFrame,
    stations: DataFrame,
    type_ids: dict[str, int | None],
    media_ids: dict[str, int],
    collection_ids: dict[str, int],
    import_source: str = "EQWin",
    tz_offset_hours: int = -7,
    unknown_time_local: str = "12:00:00",
    tz: str | None = None,
) -> DataFrame:
    """eqsampls rows -> canonical sample rows (datetime UTC, sample
    type from the ladder, station defaults, collapsed note,
    import_source_id '<source>-<SampleId>',
    R/downloadEQWin.R:262-287)."""
    st = F.broadcast(
        stations.select(
            F.col("StnId").alias("__stn_id"), F.col("StnCode"),
            F.col("StnType"),
        )
    )
    media, method = station_defaults(F.col("StnType"), media_ids, collection_ids)
    return (
        samples.join(st, F.col("StnId") == F.col("__stn_id"), "inner")
        .select(
            F.col("SampleId").cast("long").alias("sample_key"),
            F.col("StnCode").alias("location_code"),
            collect_datetime_to_utc(
                F.col("CollectDateTime"), tz_offset_hours,
                unknown_time_local, tz,
            ).alias("datetime"),
            media.alias("media_id"),
            method.alias("collection_method"),
            sample_type_expr(
                F.col("SampleClass"), F.col("SampleNo"),
                F.col("SampleComments"), type_ids,
            ).alias("sample_type"),
            F.concat(
                F.lit(import_source + "-"), F.col("SampleId").cast("string")
            ).alias("import_source_id"),
            collapse_note(
                F.col("SampleNo"),
                F.concat(F.lit("EQWin SampleClass: "),
                         F.trim(F.col("SampleClass").cast("string"))),
                F.col("SampleComments"),
            ).alias("note"),
        )
    )


def normalize_eqwin(
    stations: DataFrame,
    samples: DataFrame,
    results: DataFrame,
    mapping: DataFrame,
    parameters: DataFrame,
    type_ids: dict[str, int | None],
    media_ids: dict[str, int],
    collection_ids: dict[str, int],
    import_source: str = "EQWin",
    tz_offset_hours: int = -7,
    unknown_time_local: str = "12:00:00",
    tz: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full connector composition: (samples, results) contract frames
    with result-less samples dropped (R/downloadEQWin.R:243-246,287).
    """
    res = parse_results(results, mapping, parameters)
    samp = normalize_samples(
        samples, stations, type_ids, media_ids, collection_ids,
        import_source, tz_offset_hours, unknown_time_local, tz,
    )
    # both semi-join filters are SAMPLE-cardinality (data, not
    # catalog) — plain shuffle semi-joins on the shared sample_key;
    # broadcasting a batch's worth of keys would not survive large
    # imports
    keep = res.select("sample_key").distinct()
    samp = samp.join(keep, "sample_key", "left_semi")
    res = res.join(samp.select("sample_key"), "sample_key", "left_semi")
    return samp, res
