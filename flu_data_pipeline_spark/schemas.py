"""StructType registry for the reference's data model.

Mirrors the reference DDL (flu_data_airflow_v2.py:481-547) and its three raw
source feeds (FIXTURES.md). Spark does not enforce PK/FK constraints, so each
table entry also records its logical primary key; data-quality checks in
tests assert zero PK duplicates / zero FK orphans, which is what the
reference's constraints guaranteed.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# At-rest star schema (reference DDL flu_data_airflow_v2.py:486-547)
# ---------------------------------------------------------------------------

COUNTY_REGION = T.StructType(
    [
        T.StructField("county_id", T.IntegerType(), False),
        T.StructField("county_name", T.StringType(), False),
        T.StructField("ach_region", T.StringType(), True),
        T.StructField("population_density_2020", T.DoubleType(), True),
    ]
)

TEMPORAL = T.StructType(
    [
        T.StructField("epiweek_id", T.IntegerType(), False),
        T.StructField("week_start", T.DateType(), True),
        T.StructField("week_end", T.DateType(), True),
        T.StructField("season", T.StringType(), True),
    ]
)

ILLNESS = T.StructType(
    [
        T.StructField("epiweek_id", T.IntegerType(), False),
        T.StructField("county_id", T.IntegerType(), True),
        T.StructField("respiratory_illness_type", T.StringType(), True),
        T.StructField("care_type", T.StringType(), True),
        T.StructField("county_ili_percent", T.DoubleType(), True),
        T.StructField("state_ili_percent", T.DoubleType(), True),
        T.StructField("deviation_from_state_average", T.DoubleType(), True),
    ]
)

HEALTHCARE = T.StructType(
    [
        T.StructField("county_id", T.IntegerType(), False),
        T.StructField("population_density_2020", T.DoubleType(), True),
        T.StructField("hospitalization_percent", T.DoubleType(), True),
        T.StructField("er_visit_percent", T.DoubleType(), True),
        T.StructField("hospital_to_er_ratio", T.DoubleType(), True),
    ]
)

HISTORICS = T.StructType(
    [
        T.StructField("year", T.IntegerType(), False),
        T.StructField("decade_year", T.IntegerType(), True),
        T.StructField("peak_week_id", T.IntegerType(), True),
        T.StructField("peak_ili_percent", T.DoubleType(), True),
        T.StructField("average_wili_percent", T.DoubleType(), True),
        T.StructField("peak_vs_avg_diff", T.DoubleType(), True),
    ]
)

#: logical primary keys (validated, not enforced)
PRIMARY_KEYS: dict[str, tuple[str, ...]] = {
    "county_region": ("county_id",),
    "temporal": ("epiweek_id",),
    "illness": ("epiweek_id", "county_id", "respiratory_illness_type", "care_type"),
    "healthcare": ("county_id",),
    "historics": ("year",),
}

STAR_SCHEMA: dict[str, T.StructType] = {
    "county_region": COUNTY_REGION,
    "temporal": TEMPORAL,
    "illness": ILLNESS,
    "healthcare": HEALTHCARE,
    "historics": HISTORICS,
}

# ---------------------------------------------------------------------------
# Raw source feeds (FIXTURES.md §A; column names exact, incl. the trailing
# space in '1-Week Percent ' — flu_data_airflow_v2.py:154)
# ---------------------------------------------------------------------------

RHINO_RAW = T.StructType(
    [
        T.StructField("Season", T.StringType(), True),
        T.StructField("Week Start", T.StringType(), True),
        T.StructField("Week End", T.StringType(), True),
        T.StructField("Week", T.IntegerType(), True),
        T.StructField("Location", T.StringType(), True),
        T.StructField("Respiratory Illness Category", T.StringType(), True),
        T.StructField("Care Type", T.StringType(), True),
        T.StructField("Demographic Category", T.StringType(), True),
        T.StructField("1-Week Percent ", T.StringType(), True),
    ]
)

CENSUS_RAW = T.StructType(
    [
        T.StructField("County Name", T.StringType(), True),
        T.StructField("Population Density 2020", T.DoubleType(), True),
    ]
)

FLUVIEW_RAW = T.StructType(
    [
        T.StructField("region", T.StringType(), True),
        T.StructField("epiweek", T.IntegerType(), True),
        T.StructField("wili", T.DoubleType(), True),
        T.StructField("num_ili", T.IntegerType(), True),
        T.StructField("num_patients", T.IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Reference lookup data (flu_data_airflow_v2.py:49-69): ACH region → WA
# counties, and the official 39-county list. Small enough to broadcast.
# ---------------------------------------------------------------------------

ACH_TO_COUNTIES: dict[str, list[str]] = {
    "Better Health Together": ["Spokane", "Stevens", "Pend Oreille", "Ferry"],
    "Cascade Pacific Action Alliance": ["Thurston", "Mason", "Grays Harbor", "Pacific", "Lewis"],
    "Elevate Health": ["Yakima", "Kittitas"],
    "Greater Health Now": ["Spokane"],  # urban Spokane — dual-ACH with Better Health Together
    "Healthier Here": ["King"],
    "North Sound": ["Whatcom", "Skagit", "Snohomish", "San Juan", "Island"],
    "Olympic Community of Health": ["Clallam", "Jefferson", "Kitsap"],
    "Southwest Washington": ["Clark", "Skamania", "Klickitat", "Cowlitz", "Wahkiakum"],
    "Thriving Together NCW": ["Chelan", "Douglas", "Grant", "Okanogan"],
}

WA_COUNTIES: list[str] = [
    "Adams", "Asotin", "Benton", "Chelan", "Clallam", "Clark", "Columbia", "Cowlitz",
    "Douglas", "Ferry", "Franklin", "Garfield", "Grant", "Grays Harbor", "Island",
    "Jefferson", "King", "Kitsap", "Kittitas", "Klickitat", "Lewis", "Lincoln", "Mason",
    "Okanogan", "Pacific", "Pend Oreille", "Pierce", "San Juan", "Skagit", "Skamania",
    "Snohomish", "Spokane", "Stevens", "Thurston", "Wahkiakum", "Walla Walla", "Whatcom",
    "Whitman", "Yakima",
]
