"""Deterministic fixture data for the flu-pipeline parity queries.

The driver's testdata has no flu-schema tables, so the parity queries carry
their own inputs: module-level constants (no RNG — pure arithmetic
patterns), rendered to Spark DataFrames on one side and DuckDB ``VALUES``
CTEs on the other. Shapes follow FIXTURES.md §A:

- RHINO raw rows (pre-explode, Location grain) with the exact raw headers,
  including the trailing space in ``1-Week Percent ``; covers Statewide /
  Unassigned rows (filtered by the pipeline), an unmapped Location (null
  county after explode — the explode_outer path), year-flip weeks
  (epiweek > 202452 → no FluView match), empty / whitespace / junk percents.
- Census rows: all 39 WA counties, one null density (Garfield) to exercise
  the pandas groupby-dropna path in the healthcare build.
- FluView rows: multi-year span for historics, with a within-year tie on
  max wili (idxmax first-occurrence tie-break).

ACH→county map per the reference (flu_data_airflow_v2.py:49-59): note
Spokane appears in both "Better Health Together" and "Greater Health Now".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# ACH mapping (reference flu_data_airflow_v2.py:49-59; single source of
# truth in schemas.py) — exploded form with list position, so keep-first
# dedup order (row_id, pos) is reproducible.
# ---------------------------------------------------------------------------

from flu_data_pipeline_spark.schemas import ACH_TO_COUNTIES, WA_COUNTIES  # noqa: E402

ACH_MAP_ROWS: list[tuple[str, str, int]] = [
    (loc, county, pos)
    for loc, counties in ACH_TO_COUNTIES.items()
    for pos, county in enumerate(counties)
]

# ---------------------------------------------------------------------------
# RHINO raw fixture
# ---------------------------------------------------------------------------

_WEEKS = [  # (Week Start, Week End, Week) — year flip: weeks 3,4 → epiweek 2025xx
    ("2024-12-15", "2024-12-21", 51),
    ("2024-12-22", "2024-12-28", 52),
    ("2024-12-29", "2025-01-04", 1),
    ("2025-01-05", "2025-01-11", 2),
]
_LOCATIONS = [
    "Better Health Together",
    "Greater Health Now",
    "Healthier Here",
    "North Sound",
    "Elevate Health",
    "Pierce County ACH",  # unmapped → null county after explode (F2 outer path)
    "Statewide",  # filtered (P3)
    "Unassigned ACH Region",  # filtered (P3)
]
_ILLNESSES = ["Flu", "COVID-19"]
_CARE_TYPES = ["Hospitalizations", "Emergency Visits"]
_DEMOS = ["Overall", "Age 0-17"]


def _pct(i: int) -> str:
    """Deterministic percent-string pattern incl. blanks and junk."""
    if i % 11 == 3:
        return ""
    if i % 11 == 7:
        return "   "
    if i % 13 == 5:
        return "suppressed"
    return str(((i * 37) % 950) / 10 + 0.5)


def _rhino_rows() -> list[tuple]:
    rows = []
    i = 0
    for ws, we, wk in _WEEKS:
        for loc in _LOCATIONS:
            for ill in _ILLNESSES:
                for care in _CARE_TYPES:
                    for demo in _DEMOS:
                        rows.append(
                            (i, "2024-2025", ws, we, wk, loc, ill, care, demo, _pct(i))
                        )
                        i += 1
    return rows


RHINO_ROWS: list[tuple] = _rhino_rows()

RHINO_SCHEMA = T.StructType(
    [
        T.StructField("row_id", T.IntegerType(), False),
        T.StructField("Season", T.StringType(), False),
        T.StructField("Week Start", T.StringType(), False),
        T.StructField("Week End", T.StringType(), False),
        T.StructField("Week", T.IntegerType(), False),
        T.StructField("Location", T.StringType(), False),
        T.StructField("Respiratory Illness Category", T.StringType(), False),
        T.StructField("Care Type", T.StringType(), False),
        T.StructField("Demographic Category", T.StringType(), False),
        T.StructField("1-Week Percent ", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Census fixture: 39 counties, deterministic densities, Garfield null
# ---------------------------------------------------------------------------

CENSUS_ROWS: list[tuple] = [
    (name, None if name == "Garfield" else round(((i * 53) % 2300) / 2.0 + 8.5, 1))
    for i, name in enumerate(WA_COUNTIES)
]

CENSUS_SCHEMA = T.StructType(
    [
        T.StructField("County Name", T.StringType(), False),
        T.StructField("Population Density 2020", T.DoubleType(), True),
    ]
)

# ---------------------------------------------------------------------------
# FluView fixture: years 2020/2022/2024; 2022 has a tie on max wili
# (202204 and 202208 both 9.9 → idxmax keeps 202204, the first occurrence)
# ---------------------------------------------------------------------------


def _fluview_rows() -> list[tuple]:
    rows = []
    rid = 0
    for year, weeks in ((2020, range(1, 11)), (2022, range(1, 11)), (2024, range(40, 53))):
        for wk in weeks:
            epiweek = year * 100 + wk
            if year == 2022 and wk in (4, 8):
                wili = 9.9  # deliberate within-year tie on the max
            else:
                wili = ((epiweek * 29) % 120) / 10 + 0.3
            rows.append((rid, "wa", epiweek, round(wili, 2), (epiweek * 13) % 900 + 50,
                         (epiweek * 7) % 9000 + 1000))
            rid += 1
    return rows


FLUVIEW_ROWS: list[tuple] = _fluview_rows()

FLUVIEW_SCHEMA = T.StructType(
    [
        T.StructField("row_id", T.IntegerType(), False),
        T.StructField("region", T.StringType(), False),
        T.StructField("epiweek", T.IntegerType(), False),
        T.StructField("wili", T.DoubleType(), False),
        T.StructField("num_ili", T.IntegerType(), False),
        T.StructField("num_patients", T.IntegerType(), False),
    ]
)

ACH_MAP_SCHEMA = T.StructType(
    [
        T.StructField("location", T.StringType(), False),
        T.StructField("county", T.StringType(), False),
        T.StructField("pos", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Renderers
# ---------------------------------------------------------------------------


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def sql_values(rows: list[tuple], cols: list[str], casts: dict[str, str] | None = None) -> str:
    """Render rows as a DuckDB inline relation: (VALUES ...) t(cols)."""
    casts = casts or {}
    body = ", ".join("(" + ", ".join(_sql_literal(v) for v in row) + ")" for row in rows)
    colnames = ", ".join(f'"{c}"' for c in cols)
    sel = ", ".join(
        f'CAST("{c}" AS {casts[c]}) AS "{c}"' if c in casts else f'"{c}"' for c in cols
    )
    return f"(SELECT {sel} FROM (VALUES {body}) AS _v({colnames}))"


RHINO_COLS = [f.name for f in RHINO_SCHEMA.fields]
CENSUS_COLS = [f.name for f in CENSUS_SCHEMA.fields]
FLUVIEW_COLS = [f.name for f in FLUVIEW_SCHEMA.fields]
ACH_MAP_COLS = [f.name for f in ACH_MAP_SCHEMA.fields]

RHINO_SQL = sql_values(RHINO_ROWS, RHINO_COLS)
CENSUS_SQL = sql_values(CENSUS_ROWS, CENSUS_COLS, casts={"Population Density 2020": "DOUBLE"})
FLUVIEW_SQL = sql_values(FLUVIEW_ROWS, FLUVIEW_COLS, casts={"wili": "DOUBLE"})
ACH_MAP_SQL = sql_values(ACH_MAP_ROWS, ACH_MAP_COLS)


def rhino_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(RHINO_ROWS, RHINO_SCHEMA)


def census_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(CENSUS_ROWS, CENSUS_SCHEMA)


def fluview_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(FLUVIEW_ROWS, FLUVIEW_SCHEMA)


def ach_map_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ACH_MAP_ROWS, ACH_MAP_SCHEMA)
