"""Expression builders: cleaning, hashing, and text-analysis functions.

Everything here returns native Spark Column expressions (JVM-side,
whole-stage-codegen'd) — no Python UDFs. Each family also exposes the
equivalent ANSI-SQL fragment used by the DuckDB oracle so correctness is
checkable end to end.
"""

from flu_data_pipeline_spark.functions.cleaning import clean_percent, empty_to_null
from flu_data_pipeline_spark.functions.hashing import (
    HASH64_MOD,
    hash64,
    hash64_sql,
    minhash_value,
    minhash_value_sql,
)

__all__ = [
    "clean_percent",
    "empty_to_null",
    "hash64",
    "hash64_sql",
    "minhash_value",
    "minhash_value_sql",
    "HASH64_MOD",
]
