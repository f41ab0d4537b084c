"""SWOB-ML-style minute-weather XML connector.

Reference: ``downloadECCCwxMinute`` parses SWOB-ML observation XML into
``(datetime, value)`` per requested element
(R/downloadECCCwxMinute.R:35; fixtures
tests/testthat/fixtures/swob-minute-0000.xml).

Spark-first: the built-in XML data source (``spark.read.format("xml")``
with a rowTag) does the parsing distributed and schema-on-read; element
selection + unit-qualified value extraction are plain column ops. At
scale a directory of minute files parallelizes by file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register_source


@register_source("read_swob_xml")
def read_swob_xml(
    spark: SparkSession,
    path: str,
    element: str,
    row_tag: str = "observation",
    **_,
) -> DataFrame:
    """Parse observation XML; keep one element's value per observation.

    Expected row shape (simplified SWOB):
      <observation datetime="...">
        <element name="air_temp" value="1.5" uom="degC"/>
        ...
      </observation>
    """
    from pyspark.sql.types import ArrayType

    raw = spark.read.format("xml").option("rowTag", row_tag).load(path)
    # schema-on-read infers ARRAY<STRUCT> for repeated <element> children
    # but a bare STRUCT when every observation has exactly one — normalize
    elements = (
        F.col("element")
        if isinstance(raw.schema["element"].dataType, ArrayType)
        else F.array("element")
    )
    el = F.explode(elements).alias("el")
    out = (
        raw.select(F.col("_datetime").alias("datetime"), el)
        .where(F.col("el._name") == element)
        .select(
            F.col("datetime").cast("timestamp"),
            F.col("el._value").cast("double").alias("value"),
            F.col("el._uom").alias("uom"),
        )
    )
    return out
