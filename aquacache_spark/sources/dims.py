"""Default QC type dimensions (grade / approval / qualifier types).

The reference resolves type codes to ids from its seeded database
(``public.grade_types`` / ``approval_types`` / ``qualifier_types``;
seeded in R/create_test_DB.R). This engine's equivalent catalog is any
DataFrame with ``(x_type_id, x_type_code)``; these defaults provide a
deterministic seed for tests, queries, and dispatch when no catalog is
wired in. Ids are stable by construction (alphabetical seeding order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Seeding order is append-only: ids are positional (i+1), so new codes
# (the Aquarius vocabulary, R/downloadAquarius.R:265-455) go at the END
# to keep previously-issued ids stable.
GRADE_CODES = ["A", "B", "C", "D", "E", "N", "UNK", "UNS",
               "MISS", "HD", "HI"]
APPROVAL_CODES = ["A", "C", "N", "R", "UNK", "UNS"]
QUALIFIER_CODES = ["DRY", "EST", "ICE", "SUS", "UNK", "UNS",
                   "BW", "DD", "US-DISTURB", "INT", "HW-MISS", "ICE-EST",
                   "LW-MISS", "OOW", "PMMAX", "PMMIN", "PYMAX", "PYMIN",
                   "REL"]

# organizations the connectors stamp as owner/contributor
ORGANIZATIONS = [
    (1, "Water Survey of Canada"),
    (2, "Environment and Climate Change Canada"),
    (3, "U.S. Geological Survey"),
]


def _dim(spark: SparkSession, codes, id_col: str, code_col: str) -> DataFrame:
    from ..session import local_df

    return local_df(
        spark, [(i + 1, c) for i, c in enumerate(codes)], [id_col, code_col]
    )


def default_type_dims(spark: SparkSession) -> dict[str, DataFrame]:
    return {
        "grade_types": _dim(spark, GRADE_CODES, "grade_type_id",
                            "grade_type_code"),
        "approval_types": _dim(spark, APPROVAL_CODES, "approval_type_id",
                               "approval_type_code"),
        "qualifier_types": _dim(spark, QUALIFIER_CODES, "qualifier_type_id",
                                "qualifier_type_code"),
        "organizations": __import__("aquacache_spark.session", fromlist=["local_df"]).local_df(
            spark, ORGANIZATIONS, ["organization_id", "name"]
        ),
    }


def type_code_to_id(codes) -> dict[str, int]:
    return {c: i + 1 for i, c in enumerate(codes)}
