"""Media stores: image hash upsert merge rules, series watermarks,
document/borehole validation splits, WSC image connector."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aquacache_spark.sources import media as M

IMG_SCHEMA = (
    "file_hash string, img_series_id int, datetime timestamp, "
    "fetch_datetime timestamp, description string, share_with string, "
    "location_id int, latitude double, longitude double, format string"
)


def _img(h, series, d, fetch=None, desc=None, share="public_reader",
         loc=None, lat=60.0, lon=-135.0, fmt="jpg"):
    return (h, series, dt.datetime.fromisoformat(d),
            dt.datetime.fromisoformat(fetch) if fetch else None,
            desc, share, loc, lat, lon, fmt)


def test_image_upsert_merge_rules(spark):
    existing = spark.createDataFrame(
        [_img("aa", 1, "2024-01-01T00:00:00", fetch="2024-01-01T01:00:00",
              desc="old desc", share="private", loc=7, lat=1.0, lon=2.0,
              fmt="png"),
         _img("bb", 2, "2024-01-02T00:00:00", desc="keep me")],
        IMG_SCHEMA,
    )
    incoming = spark.createDataFrame(
        [
            # conflicts with aa: no series/fetch/desc/loc -> coalesce to old;
            # datetime/share/lat/lon/format -> new wins
            (None, None, dt.datetime(2024, 3, 1), None, None,
             "public_reader", None, 3.0, 4.0, "jpg", "aa"),
            # brand new
            (None, 9, dt.datetime(2024, 3, 2), None, "new image",
             "public_reader", None, 5.0, 6.0, "jpg", "cc"),
        ],
        "x string, img_series_id int, datetime timestamp, "
        "fetch_datetime timestamp, description string, share_with string, "
        "location_id int, latitude double, longitude double, format string, "
        "file_hash string",
    ).drop("x")
    out = {r.file_hash: r for r in
           M.image_upsert(existing, incoming).collect()}
    aa = out["aa"]
    assert aa.action == "update"
    assert aa.img_series_id == 1 and aa.description == "old desc"
    assert aa.fetch_datetime == dt.datetime(2024, 1, 1, 1) and aa.location_id == 7
    assert aa.datetime == dt.datetime(2024, 3, 1)
    assert (aa.share_with, aa.latitude, aa.longitude, aa.format) == \
        ("public_reader", 3.0, 4.0, "jpg")
    assert out["cc"].action == "insert" and out["cc"].img_series_id == 9
    assert out["bb"].action == "keep" and out["bb"].description == "keep me"


def test_image_series_watermarks(spark):
    imgs = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1)), (1, dt.datetime(2024, 1, 5)),
         (2, dt.datetime(2024, 2, 1)), (None, dt.datetime(2024, 3, 1))],
        "img_series_id int, datetime timestamp",
    )
    out = {r.img_series_id: r.next_fetch
           for r in M.image_series_watermarks(imgs).collect()}
    assert out == {1: dt.datetime(2024, 1, 5, 0, 0, 1),
                   2: dt.datetime(2024, 2, 1, 0, 0, 1)}


def test_validate_documents_split(spark):
    dim = spark.createDataFrame(
        [("report", 1), ("map", 2)], "document_type_en string, document_type_id int")
    docs = spark.createDataFrame(
        [("d1", "report", "a fine report"),
         ("d2", "bogus", "whatever text"),
         ("d3", "map", "map"),
         (None, "report", "described enough")],
        "name string, type string, description string",
    )
    ok, rej = M.validate_documents(docs, dim)
    assert {r.name for r in ok.collect()} == {"d1"}
    reasons = {r.name: r.reject_reason for r in rej.collect()}
    assert reasons["d2"].startswith("unknown document type")
    assert "5 characters" in reasons["d3"]
    assert reasons[None] == "name required"


def test_validate_boreholes_split(spark):
    bh = spark.createDataFrame(
        [(1, 60.0, -135.0, 10.0), (2, None, -135.0, 5.0),
         (3, 95.0, -135.0, 5.0), (4, 60.0, -135.0, -2.0)],
        "bh_id int, latitude double, longitude double, well_depth double",
    )
    ok, rej = M.validate_boreholes(bh)
    assert {r.bh_id for r in ok.collect()} == {1}
    reasons = {r.bh_id: r.reject_reason for r in rej.collect()}
    assert "required" in reasons[2]
    assert "out of range" in reasons[3]
    assert "non-negative" in reasons[4]


def test_download_wsc_images(spark, tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "09EA004_20240301120000.jpg").write_bytes(b"\xff\xd8fakejpeg1")
    (d / "09EA004_20240302120000.jpg").write_bytes(b"\xff\xd8fakejpeg2")
    (d / "junk.txt").write_bytes(b"not an image")
    out = M.download_wsc_images(
        spark, "09EA004", "2024-03-01 00:00:00", "2024-03-01 23:59:59",
        payload_dir=str(d),
    )
    rows = out.collect()
    assert len(rows) == 1  # window keeps day 1 only; junk has no timestamp
    assert rows[0].datetime == dt.datetime(2024, 3, 1, 12)
    assert len(rows[0].file_hash) == 64
    with pytest.raises(NotImplementedError):
        M.download_wsc_images(spark, "x", "2024-01-01", "2024-01-02")


def test_image_share_with_restriction_directions(spark):
    """Both directions of the patch_26 trigger: a public child under a
    restrictive series violates; a restrictive child under the same
    series passes (the reference's literal inverted guard would flag
    exactly the opposite pair — this port follows the exception
    message's documented intent); NULL / index-absent series skip."""
    idx = spark.createDataFrame(
        [(1, ["yg_reader_group"]), (2, ["public_reader"])],
        "img_series_id int, share_with array<string>")
    images = spark.createDataFrame(
        [(10, 1, ["public_reader"]),        # leak: public under restrictive
         (11, 1, ["yg_reader"]),            # fine: restrictive under restrictive
         (12, 2, ["public_reader"]),        # fine: public under public
         (13, None, ["public_reader"]),     # fine: no series
         (14, 9, ["public_reader"])],       # fine: series absent from index
        "img_id int, img_series_id int, share_with array<string>")
    out = {r["img_id"]: r for r in
           M.image_share_with_validation(images, idx).collect()}
    assert [out[i]["violation"] for i in (10, 11, 12, 13, 14)] == \
        [True, False, False, False, False]
    assert out[10]["parent_restrictive"] is True
    assert "img_series_id 1" in out[10]["reject_reason"]
    assert all(out[i]["reject_reason"] is None for i in (11, 12, 13, 14))
