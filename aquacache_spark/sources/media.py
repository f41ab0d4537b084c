"""Image / document / borehole binary stores.

Reference surface:

- ``insertACImage`` (R/insertACImage.R:32-148, INSERT at :~200): images
  land in ``files.images`` keyed by content hash — ``ON CONFLICT
  (file_hash) DO UPDATE`` with per-column rules: series/fetch_datetime/
  description/location coalesce to the existing value when the new row
  has none; datetime/share_with/lat/lon/format always take the new
  value.
- ``getNewImages`` (R/getNewImages.R:86-88): per-series incremental
  fetch from ``last_img + 1 second``.
- ``insertACDocument`` (R/insertACDocument.R:31-139): documents carry a
  type that must exist in the ``document_types`` dim, optional authors
  (array), publish_date, url, and a ``share_with`` group array;
  descriptions shorter than 5 chars are rejected.
- ``insertACBorehole`` (R/insertACBorehole.R:60-128): required lat/lon,
  numeric depths, optional link to an existing location.
- ``downloadNupointImages`` / ``downloadWSCImages``: HTTP image pulls —
  fetch injectable here, normalization real.

Spark-first: the binary is an opaque column; the hash is computed
JVM-side (``sha2``); upserts are relational merge classifications (one
broadcast-able join on the hash — no per-row DML); validation is a
filter returning (ok, rejects) so a 100 TB backfill reports every
violation in one pass instead of stopping at the first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# per-column merge rules for the image upsert (insertACImage.R ON
# CONFLICT clause): True -> COALESCE(new, old), False -> new wins
IMAGE_MERGE_COALESCE = {
    "img_series_id": True,
    "datetime": False,
    "fetch_datetime": True,
    "description": True,
    "share_with": False,
    "location_id": True,
    "latitude": False,
    "longitude": False,
    "format": False,
}


def file_hash(content: Column) -> Column:
    """Content address: sha256 hex of the binary (files.images.file_hash)."""
    return F.sha2(content, 256)


def image_upsert(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """ON CONFLICT (file_hash) DO UPDATE as a relational merge.

    Returns the post-merge image rows (action column added: insert /
    update), applying the reference's per-column coalesce rules.  One
    join keyed on the content hash; at scale the hash is the store's
    bucketing key so the merge is co-located."""
    cols = list(IMAGE_MERGE_COALESCE)
    ex = existing.select(
        "file_hash", *[F.col(c).alias(f"__old_{c}") for c in cols]
    )
    j = incoming.join(ex, "file_hash", "left")
    out = j.withColumn(
        "action",
        F.when(F.col("__old_datetime").isNull(), "insert").otherwise("update"),
    )
    for c, coal in IMAGE_MERGE_COALESCE.items():
        if coal:
            out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__old_{c}")))
    untouched = existing.join(incoming.select("file_hash"), "file_hash",
                              "left_anti").withColumn("action", F.lit("keep"))
    merged = out.select(*untouched.columns)
    return merged.unionByName(untouched)


def image_series_watermarks(images: DataFrame) -> DataFrame:
    """Per-series incremental fetch start (getNewImages.R:86-88):
    one second after the newest stored image."""
    return (
        images.where(F.col("img_series_id").isNotNull())
        .groupBy("img_series_id")
        .agg(F.max("datetime").alias("last_img"))
        .withColumn("next_fetch",
                    F.col("last_img") + F.expr("INTERVAL 1 SECOND"))
    )


def image_share_with_validation(
    images: DataFrame, images_index: DataFrame
) -> DataFrame:
    """files.enforce_share_with_restriction port (reference
    inst/patches/patch_26.R:137-160, first shipped patch_9.R:446-472):
    an image row attached to a RESTRICTIVELY shared series
    (images_index.share_with without 'public_reader') must not itself
    carry 'public_reader' — a child published wider than its parent
    would leak the series through RLS. Rows with NULL img_series_id
    skip the check (patch_26.R:143-145), as do rows whose series is
    absent from the index (the trigger's PERFORM finds nothing).

    Reference-divergence note: the PL/pgSQL body's literal guard is
    inverted relative to its own exception message — it runs the
    parent probe only when NEW.share_with does NOT contain
    public_reader (patch_26.R:148), so it fires on the benign
    restrictive-under-restrictive direction and never on the leak the
    message describes. This port follows the documented intent
    (trigger name + exception text): violation = parent restrictive
    AND child shared to public_reader.

    Shuffle shape: the series index is catalog-sized -> broadcast
    left join; the verdict is a map-side flag. Output: the image rows
    plus (parent_restrictive, violation, reject_reason)."""
    idx = images_index.select(
        F.col("img_series_id").alias("__sid"),
        (~F.array_contains(F.col("share_with"), "public_reader"))
        .alias("__parent_restrictive"),
    )
    j = images.join(
        F.broadcast(idx),
        images["img_series_id"] == idx["__sid"], "left").drop("__sid")
    child_public = F.array_contains(F.col("share_with"), "public_reader")
    viol = (
        F.col("img_series_id").isNotNull()
        & F.coalesce(F.col("__parent_restrictive"), F.lit(False))
        & child_public
    )
    return (
        j.withColumn("parent_restrictive",
                     F.coalesce(F.col("__parent_restrictive"),
                                F.lit(False)))
        .withColumn("violation", viol)
        .withColumn(
            "reject_reason",
            F.when(
                viol,
                F.concat(
                    F.lit("images_index entry for img_series_id "),
                    F.col("img_series_id").cast("string"),
                    F.lit(" has a restrictive share_with, "
                          "images.share_with cannot be {public_reader}"),
                ),
            ),
        )
        .drop("__parent_restrictive")
    )


def validate_documents(
    docs: DataFrame, document_types: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """insertACDocument validation (R/insertACDocument.R:66-133) as a
    single split pass: type must resolve in the dim, description >= 5
    chars, name required.

    Returns (ok rows with resolved type id, reject rows with reasons).
    The dim is catalog-sized -> broadcast; the document mass streams."""
    typed = docs.join(
        F.broadcast(document_types.select(
            F.col("document_type_en").alias("type"),
            "document_type_id",
        )),
        "type", "left",
    )
    reason = (
        F.when(F.col("document_type_id").isNull(),
               F.concat(F.lit("unknown document type: "), F.col("type")))
        .when(F.col("name").isNull() | (F.length("name") == 0),
              F.lit("name required"))
        .when(F.length(F.coalesce(F.col("description"), F.lit(""))) < 5,
              F.lit("description must be at least 5 characters"))
    )
    marked = typed.withColumn("__reject", reason)
    ok = marked.where(F.col("__reject").isNull()).drop("__reject")
    rejects = (
        marked.where(F.col("__reject").isNotNull())
        .withColumnRenamed("__reject", "reject_reason")
    )
    return ok, rejects


def validate_boreholes(bh: DataFrame) -> tuple[DataFrame, DataFrame]:
    """insertACBorehole validation (R/insertACBorehole.R:60-128):
    lat/lon required and in range, depths non-negative when present."""
    reason = (
        F.when(F.col("latitude").isNull() | F.col("longitude").isNull(),
               F.lit("latitude and longitude are required"))
        .when(~F.col("latitude").between(-90.0, 90.0)
              | ~F.col("longitude").between(-180.0, 180.0),
              F.lit("coordinates out of range"))
        .when(F.col("well_depth").isNotNull() & (F.col("well_depth") < 0),
              F.lit("well_depth must be non-negative"))
    )
    marked = bh.withColumn("__reject", reason)
    ok = marked.where(F.col("__reject").isNull()).drop("__reject")
    rejects = (
        marked.where(F.col("__reject").isNotNull())
        .withColumnRenamed("__reject", "reject_reason")
    )
    return ok, rejects


def download_wsc_images(
    spark: SparkSession, location: str, start_datetime: str,
    end_datetime: str, payload_dir: str | None = None,
) -> DataFrame:
    """WSC station image pull (R/downloadWSCImages.R) — fetch
    injectable: ``payload_dir`` holds the fetched binaries; Spark's
    binaryFile source supplies (path, modificationTime, content) and
    the filename carries the capture instant, as on the WSC server."""
    if payload_dir is None:
        raise NotImplementedError(
            "WSC image fetch requires network access; pass payload_dir "
            "with fetched image files named <location>_<yyyyMMddHHmmss>.jpg"
        )
    raw = spark.read.format("binaryFile").load(payload_dir)
    name = F.regexp_extract(F.col("path"), r"([^/]+)$", 1)
    dt = F.try_to_timestamp(
        F.regexp_extract(name, r"_(\d{14})\.", 1), F.lit("yyyyMMddHHmmss")
    )
    return (
        raw.select(
            F.lit(location).alias("location"),
            dt.alias("datetime"),
            F.col("content").alias("file"),
            F.lit("jpg").alias("format"),
        )
        .where(F.col("datetime").isNotNull())
        .where(
            (F.col("datetime") >= F.to_timestamp(F.lit(start_datetime)))
            & (F.col("datetime") <= F.to_timestamp(F.lit(end_datetime)))
        )
        .withColumn("file_hash", file_hash(F.col("file")))
    )
