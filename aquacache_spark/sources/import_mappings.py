"""Import-mapping resolution — the reference's source-code -> canonical
target DSL (R/import_mappings.R) as a set-wise kernel.

A mapping row carries a ``source_match`` criteria map (the JSON the
reference stores, parsed at R/import_mappings.R:1236-1249): the mapping
matches a source record when EVERY criterion key's value equals the
record's value for that key, with NULL record values coerced to ''
(:1267-1272).  Among matches the best is picked by priority ASC, then
criteria-count DESC (most specific wins), then import_mapping_id ASC
(:1297-1303); a tie on (priority, size) at the top is ambiguous — the
reference raises (:1304-1311), we surface ``status = 'ambiguous'`` so
one bad record cannot abort a 100 TB batch (callers can assert the
count is zero for reference-exact behavior).

Scale shape: the mapping table is catalog-sized -> its exploded
criteria are broadcast; records are touched once (melt is a map-side
``explode``), the hit count groups on (record, mapping) so shuffle is
proportional to candidate matches, not records x mappings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STATUS_MATCHED = "matched"
STATUS_UNMAPPED = "unmapped"
STATUS_AMBIGUOUS = "ambiguous"


def resolve_mappings(
    records: DataFrame,
    mappings: DataFrame,
    record_id: str = "record_id",
    payload_cols: tuple[str, ...] = ("parameter_id",),
) -> DataFrame:
    """records (record_id + match-key fields) x mappings
    (import_mapping_id, priority, active, source_match map, payload)
    -> one row per record: payload of the winning mapping + status.
    """
    m = (
        mappings.where(F.col("active"))
        .select(
            "import_mapping_id", "priority", "source_match", *payload_cols
        )
        .withColumn("match_size", F.size("source_match"))
    )

    # key universe is data-driven but catalog-sized (:1236-1249); a
    # criterion key the records don't carry makes that mapping
    # unmatchable (:1277-1280) — it melts to nothing, so n_hit stays
    # below match_size
    keys = sorted(
        set(
            r["k"]
            for r in m.select(
                F.explode(F.map_keys("source_match")).alias("k")
            ).distinct().collect()
        )
        & set(records.columns)
    )

    if not keys:  # no active mapping can match anything
        out = records.withColumn("status", F.lit(STATUS_UNMAPPED))
        out = out.withColumn(
            "import_mapping_id", F.lit(None).cast("int")
        )
        for c in payload_cols:
            out = out.withColumn(c, F.lit(None).cast("int"))
        return out

    crit = F.broadcast(
        m.select(
            "import_mapping_id", "priority", "match_size",
            F.explode("source_match").alias("crit_key", "crit_value"),
        )
    )

    # melt each record's match fields; NULL -> '' (:1267-1272)
    melted = records.select(
        F.col(record_id),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("crit_key"),
                    F.coalesce(F.col(k).cast("string"), F.lit(""))
                    .alias("rec_value"),
                )
                for k in keys
            ])
        ).alias("kv"),
    ).select(record_id, "kv.crit_key", "kv.rec_value")

    hits = (
        melted.join(
            crit,
            (melted["crit_key"] == crit["crit_key"])
            & (melted["rec_value"] == crit["crit_value"]),
        )
        .groupBy(record_id, "import_mapping_id", "priority", "match_size")
        .agg(F.count("*").alias("n_hit"))
        .where(F.col("n_hit") == F.col("match_size"))
    )

    w = Window.partitionBy(record_id).orderBy(
        F.col("priority").asc(),
        F.col("match_size").desc(),
        F.col("import_mapping_id").asc(),
    )
    wt = Window.partitionBy(record_id, "priority", "match_size")
    best = (
        hits.withColumn("rk", F.row_number().over(w))
        .withColumn("n_tied", F.count("*").over(wt))
        .where(F.col("rk") == 1)
        .select(
            record_id,
            F.col("import_mapping_id").alias("__mid"),
            F.col("n_tied"),
        )
    )

    payload = m.select(
        F.col("import_mapping_id").alias("__mid"), *payload_cols
    )
    out = (
        # `best` is one row per MATCHED RECORD (data cardinality) — a
        # plain shuffle join, co-partitioned on record_id; broadcasting
        # it would OOM the driver at batch scale. Only the
        # catalog-sized mapping payload broadcasts.
        records.join(best, record_id, "left")
        .join(F.broadcast(payload), "__mid", "left")
        .withColumn(
            "status",
            F.when(F.col("__mid").isNull(), F.lit(STATUS_UNMAPPED))
            .when(F.col("n_tied") > 1, F.lit(STATUS_AMBIGUOUS))
            .otherwise(F.lit(STATUS_MATCHED)),
        )
        .withColumn(
            "import_mapping_id",
            F.when(F.col("status") == STATUS_MATCHED, F.col("__mid")),
        )
    )
    for c in payload_cols:
        out = out.withColumn(
            c, F.when(F.col("status") == STATUS_MATCHED, F.col(c))
        )
    return out.drop("__mid", "n_tied")
