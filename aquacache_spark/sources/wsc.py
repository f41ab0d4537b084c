"""Water Survey of Canada realtime connector — payload parsing + code
mapping (R/downloadWSC.R:16-233), fetch injectable.

The reference pulls the wateroffice realtime inline CSV and selects five
columns by *name* (R/downloadWSC.R:107-118), then maps the WSC numeric
qualifier codes and bilingual approval labels onto the database's
qualifier/approval type ids via lookups (:120-199), stamps every row
with the UNS grade (:204-208) and the WSC organization as owner and
contributor (:210-231).

Spark-first shape: payloads arrive as a DataFrame of ``(location,
payload)`` text blobs — the natural landing format for a fetch fleet —
and parsing is pure column expressions: split to lines, per-payload
header map (catalog-sized, broadcast back), positional field extraction.
Code mapping is a compiled ``when()`` fold from raw code to type_code
plus one broadcast join per type dimension, exactly the shape that stays
map-only over a 100 TB payload corpus. No Python runs per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# WSC realtime CSV columns the reference selects (R/downloadWSC.R:107-118)
WSC_COLUMNS = {
    "Date": "datetime",
    "Value/Valeur": "value",
    "Grade/Classification": "grade_raw",
    "Approval/Approbation": "approval_raw",
    "Qualifiers/Qualificatifs": "qualifier_raw",
}

# numeric WSC qualifier code -> qualifier_type_code (R/downloadWSC.R:121-162)
WSC_QUALIFIER_MAP = {
    -1: "UNS", 10: "ICE", 20: "EST", 30: "UNK",
    40: "DRY", 50: "UNK", -2: "UNK", 0: "UNK",
}

# bilingual approval label -> approval_type_code (R/downloadWSC.R:164-194)
WSC_APPROVAL_MAP = {
    "Final/Finales": "A",
    "Approved/Approuvée": "A",
    "Provisional/Provisoire": "N",
    "Preliminary/Préliminaire": "N",
    "Checked/Verifiée": "R",
    "Unspecified/Non spécifié": "UNS",
    "Undefined/Non défini": "UNS",
}

# the reference hardcodes approval id 6 for unmapped labels
# (R/downloadWSC.R:196-199, literal "6")
WSC_UNMAPPED_APPROVAL_ID = 6


def wsc_url(location: str, parameter: int, start_datetime: str,
            end_datetime: str) -> str:
    """The reference's request URL (R/downloadWSC.R:84-105)."""
    return (
        "https://wateroffice.ec.gc.ca/services/real_time_data/csv/inline?"
        f"stations[]={location}&parameters[]={parameter}"
        f"&start_date={start_datetime[:10]}%20{start_datetime[11:19]}"
        f"&end_date={end_datetime[:10]}%20{end_datetime[11:19]}"
    )


def _unquote(col):
    return F.regexp_replace(col, r'^"|"$', "")


def parse_wsc_csv(payloads: DataFrame, location_col: str = "location",
                  payload_col: str = "payload") -> DataFrame:
    """Parse WSC realtime inline CSV payload blobs, selecting the five
    reference columns by header name (column order may differ between
    payloads; each payload's header is mapped independently).

    Output: (location, datetime, value, grade_raw, approval_raw,
    qualifier_raw) — raw codes, mapping applied by map_wsc_codes.
    """
    lines = (
        payloads.select(
            F.col(location_col).alias("location"),
            F.posexplode(F.split(payload_col, r"\r?\n")).alias("pos", "line"),
        )
        .where(F.trim("line") != "")
    )
    header = (
        lines.where(F.col("pos") == 0)
        .select("location", F.split("line", ",").alias("cols"))
        .select(
            "location",
            *[
                F.array_position(
                    F.transform("cols", lambda c: F.trim(_unquote(c))),
                    name,
                ).cast("int").alias(f"__i{i}")
                for i, name in enumerate(WSC_COLUMNS)
            ],
        )
    )
    data = (
        lines.where(F.col("pos") > 0)
        .join(F.broadcast(header), "location")
        .select(
            "location",
            F.split("line", ",").alias("f"),
            *[F.col(f"__i{i}") for i in range(len(WSC_COLUMNS))],
        )
    )
    picked = [
        _unquote(F.element_at("f", F.col(f"__i{i}"))).alias(out)
        for i, out in enumerate(WSC_COLUMNS.values())
    ]
    # try_cast: empty/malformed cells coerce to NULL (fread NA semantics)
    return data.select("location", *picked).select(
        "location",
        F.to_timestamp("datetime").alias("datetime"),
        F.col("value").try_cast("double").alias("value"),
        F.col("grade_raw").try_cast("int").alias("grade_raw"),
        "approval_raw",
        F.col("qualifier_raw").try_cast("int").alias("qualifier_raw"),
    )


def map_wsc_codes(
    parsed: DataFrame,
    qualifier_types: DataFrame,
    approval_types: DataFrame,
    grade_types: DataFrame,
    organization_id: int,
) -> DataFrame:
    """Raw WSC codes -> database type ids (R/downloadWSC.R:120-231).

    Type dims are catalog tables ``(x_type_id, x_type_code)``; the raw
    code -> type_code step is a compiled when() fold, the code -> id
    step a broadcast join. Unknown qualifiers map to UNK, unknown
    approvals to the reference's literal id 6, grade is always UNS, and
    owner/contributor are the WSC organization."""
    qcode = F.lit("UNK")
    for raw, code in WSC_QUALIFIER_MAP.items():
        qcode = F.when(F.col("qualifier_raw") == raw, F.lit(code)).otherwise(qcode)
    acode = F.lit(None).cast("string")
    for raw, code in WSC_APPROVAL_MAP.items():
        acode = F.when(F.col("approval_raw") == raw, F.lit(code)).otherwise(acode)

    q = F.broadcast(
        qualifier_types.select(
            F.col("qualifier_type_code").alias("__qc"),
            F.col("qualifier_type_id").alias("qualifier"),
        )
    )
    a = F.broadcast(
        approval_types.select(
            F.col("approval_type_code").alias("__ac"),
            F.col("approval_type_id").alias("__aid"),
        )
    )
    uns_grade = F.broadcast(
        grade_types.where(F.col("grade_type_code") == "UNS").select(
            F.col("grade_type_id").alias("grade")
        )
    )
    return (
        parsed.withColumn("__qc", qcode)
        .withColumn("__ac", acode)
        .join(q, "__qc", "left")
        .join(a, "__ac", "left")
        .crossJoin(uns_grade)
        .select(
            "location", "datetime", "value", "grade",
            F.coalesce("__aid", F.lit(WSC_UNMAPPED_APPROVAL_ID))
            .alias("approval"),
            "qualifier",
            F.lit(organization_id).alias("owner"),
            F.lit(organization_id).alias("contributor"),
        )
    )


def download_wsc(
    spark: SparkSession,
    location: str,
    parameter: int,
    start_datetime: str,
    end_datetime: str,
    qualifier_types: DataFrame,
    approval_types: DataFrame,
    grade_types: DataFrame,
    organization_id: int,
    payload: str | None = None,
    fetcher=None,
) -> DataFrame:
    """downloadWSC (R/downloadWSC.R:16): fetch (injectable) -> parse ->
    map. ``payload`` supplies canned CSV text directly; ``fetcher`` is
    ``url -> text``. Without either this raises — there is no network
    in this environment."""
    if payload is None:
        url = wsc_url(location, parameter, start_datetime, end_datetime)
        if fetcher is None:
            raise NotImplementedError(
                "downloadWSC: no network in this environment; pass "
                "payload= canned CSV text or fetcher=url->text "
                f"(would fetch {url})"
            )
        payload = fetcher(url)
    from ..session import local_df
    payloads = local_df(spark, [(location, payload)],
                        ["location", "payload"])
    # NA values are kept, like the reference — the connector contract
    # (registry.validate_contract) drops them at dispatch
    parsed = parse_wsc_csv(payloads)
    return map_wsc_codes(
        parsed, qualifier_types, approval_types, grade_types, organization_id
    ).drop("location")
