"""Native-expression data cleaners.

Replaces the reference's row-at-a-time Python UDFs with codegen-friendly
Column expressions:

- ``clean_percent`` reproduces ``clean_percentage``
  (flu_data_airflow_v2.py:142-154): NaN/None → null, empty or whitespace
  string → null, parseable → double, unparseable → null. ``try_cast`` gives
  null-on-junk regardless of ``spark.sql.ansi.enabled`` — exactly the
  reference's try/except, and portable to any harness-built session.
- ``empty_to_null`` is the standalone empty-string → null normalizer used on
  ingest (reference cleans at :142-154 and regex-replaces blanks at :336).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def empty_to_null(col: Column | str) -> Column:
    """Empty/whitespace-only strings → null, otherwise unchanged."""
    c = _as_col(col)
    return F.when(F.trim(c) == "", F.lit(None)).otherwise(c)


def clean_percent(col: Column | str) -> Column:
    """String percent column → DoubleType with null for blank/junk values
    (e.g. ``'suppressed'``), independent of ANSI mode."""
    return empty_to_null(_as_col(col)).try_cast("double")
