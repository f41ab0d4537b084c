"""USGS NWIS instantaneous-values connector — RDB payload parsing,
metric unit conversions, and approval/qualifier extraction
(R/downloadNWIS.R:17-220), fetch injectable.

The reference fetches via dataRetrieval and keeps (datetime, value,
combined-code), then:

- converts to metric (:137-146): param 00011 °F->°C, 00060/00061
  ft³/s->m³/s (× 0.028316832), 00065/62610/62611/72150 ft->m (× 0.3048);
- approval = the leading A/P/R letter of the combined code, mapped
  A->A, P->N, R->A, else UNK (:148-171);
- qualifier = the remainder after that letter, trimmed, '' -> 'U',
  mapped e->EST, ice->ICE, 'Ice i'->ICE, '<'->EST, '>'->EST, else UNK
  (:173-207).

Payload format here is the public waterservices RDB (tab-separated,
'#' comment block, header line, then a column-width type row) — the
same content dataRetrieval normalizes. Parsing is split/posexplode
column expressions over ``(site, payload)`` blobs; per-payload header
mapping is catalog-sized and broadcast; everything stays map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# parameter code -> multiplier/affine metric conversion (R/downloadNWIS.R:137-146)
NWIS_FLOW_PARAMS = ("00060", "00061")
NWIS_LEVEL_PARAMS = ("00065", "62610", "62611", "72150")
CFS_TO_CMS = 0.028316832
FT_TO_M = 0.3048

NWIS_APPROVAL_MAP = {"A": "A", "P": "N", "R": "A"}
NWIS_QUALIFIER_MAP = {
    "e": "EST", "ice": "ICE", "Ice i": "ICE", "<": "EST", ">": "EST",
}


def convert_nwis_units(value, parameter: str):
    """Metric conversion column for one NWIS parameter code."""
    p = str(parameter).zfill(5)  # codes are zero-padded to 5 (R:30-34)
    if p == "00011":
        return (value - F.lit(32.0)) / F.lit(1.8)
    if p in NWIS_FLOW_PARAMS:
        return value * F.lit(CFS_TO_CMS)
    if p in NWIS_LEVEL_PARAMS:
        return value * F.lit(FT_TO_M)
    return value


def parse_nwis_rdb(payloads: DataFrame, parameter: str,
                   site_col: str = "site",
                   payload_col: str = "payload") -> DataFrame:
    """Parse RDB payload blobs for one parameter code.

    Finds the value column ``*_<param>`` and code column
    ``*_<param>_cd`` from each payload's header line (sensor prefixes
    differ per site), skips the '#' comment block and the type row.
    Output: (site, datetime, value, combined) with value unconverted.
    """
    p = str(parameter).zfill(5)
    lines = (
        payloads.select(
            F.col(site_col).alias("site"),
            F.posexplode(F.split(payload_col, r"\r?\n")).alias("pos", "line"),
        )
        .where((F.trim("line") != "") & ~F.col("line").startswith("#"))
    )
    # first non-comment line per payload is the header, second the
    # column-width type row ('5s', '15s', ...)
    from pyspark.sql import Window

    w = Window.partitionBy("site").orderBy("pos")
    seq = lines.withColumn("seq", F.row_number().over(w))
    header = (
        seq.where(F.col("seq") == 1)
        .select("site", F.split("line", "\t").alias("cols"))
        .select(
            "site",
            F.array_position("cols", "datetime").cast("int").alias("__idt"),
            F.array_position(
                F.transform(
                    "cols",
                    lambda c: c.endswith(f"_{p}") & ~c.endswith("_cd"),
                ),
                True,
            ).cast("int").alias("__iv"),
            F.array_position(
                F.transform("cols", lambda c: c.endswith(f"_{p}_cd")), True
            ).cast("int").alias("__ic"),
        )
    )
    data = (
        seq.where(F.col("seq") > 2)
        .join(F.broadcast(header), "site")
        .select("site", F.split("line", "\t").alias("f"),
                "__idt", "__iv", "__ic")
    )
    return data.select(
        "site",
        F.to_timestamp(F.element_at("f", F.col("__idt"))).alias("datetime"),
        # try_cast: empty/malformed cells coerce to NULL (NA semantics)
        F.element_at("f", F.col("__iv")).try_cast("double").alias("value"),
        F.element_at("f", F.col("__ic")).alias("combined"),
    )


def map_nwis_codes(
    parsed: DataFrame,
    approval_types: DataFrame,
    qualifier_types: DataFrame,
) -> DataFrame:
    """Approval/qualifier extraction from the combined NWIS code
    (R/downloadNWIS.R:148-207)."""
    lead_letter = F.regexp_extract("combined", r"^([APR])", 1)
    acode = F.lit("UNK")
    for raw, code in NWIS_APPROVAL_MAP.items():
        acode = F.when(lead_letter == raw, F.lit(code)).otherwise(acode)
    # remainder after the A/P/R letter, trimmed; '' -> 'U' which is not
    # in the mapping, so (faithfully) lands on UNK
    rest = F.trim(F.regexp_replace("combined", r"^[APR](.*)", r"$1"))
    rest = F.when(rest == "", F.lit("U")).otherwise(rest)
    qcode = F.lit("UNK")
    for raw, code in NWIS_QUALIFIER_MAP.items():
        qcode = F.when(rest == raw, F.lit(code)).otherwise(qcode)

    a = F.broadcast(
        approval_types.select(
            F.col("approval_type_code").alias("__ac"),
            F.col("approval_type_id").alias("approval"),
        )
    )
    q = F.broadcast(
        qualifier_types.select(
            F.col("qualifier_type_code").alias("__qc"),
            F.col("qualifier_type_id").alias("qualifier"),
        )
    )
    return (
        parsed.withColumn("__ac", acode)
        .withColumn("__qc", qcode)
        .join(a, "__ac", "left")
        .join(q, "__qc", "left")
        .select("site", "datetime", "value", "approval", "qualifier")
    )


def download_nwis(
    spark: SparkSession,
    location: str,
    parameter: str,
    start_datetime: str,
    end_datetime: str,
    approval_types: DataFrame,
    qualifier_types: DataFrame,
    payload: str | None = None,
    fetcher=None,
) -> DataFrame:
    """downloadNWIS (R/downloadNWIS.R:17): fetch (injectable) -> parse
    -> drop NA values (:135) -> metric conversion -> code mapping."""
    p = str(parameter).zfill(5)
    if payload is None:
        url = (
            "https://waterservices.usgs.gov/nwis/iv/?format=rdb"
            f"&sites={location}&parameterCd={p}"
            f"&startDT={start_datetime[:10]}T{start_datetime[11:16]}Z"
            f"&endDT={end_datetime[:10]}T{end_datetime[11:16]}Z"
        )
        if fetcher is None:
            raise NotImplementedError(
                "downloadNWIS: no network in this environment; pass "
                "payload= canned RDB text or fetcher=url->text "
                f"(would fetch {url})"
            )
        payload = fetcher(url)
    from ..session import local_df
    payloads = local_df(spark, [(location, payload)], ["site", "payload"])
    parsed = (
        parse_nwis_rdb(payloads, p)
        .where(F.col("value").isNotNull())  # R:135 drops NA before codes
        .withColumn("value", convert_nwis_units(F.col("value"), p))
    )
    return map_nwis_codes(parsed, approval_types, qualifier_types).drop("site")
