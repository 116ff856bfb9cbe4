"""Registry of oracle-checked queries.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with the equivalent ANSI SQL that DuckDB runs on the same parquet tables.
The driver hash-compares the two (row count + schema + order-insensitive
value hash), so:

- every computed column is aliased identically on both sides;
- result sets are deterministic (no unpinned LIMIT over ties, no
  nondeterministic "first" without an explicit ordering);
- float aggregates avoid projecting raw ns timestamps (Spark truncates
  parquet ns → µs; DuckDB keeps ns) — truncate to hour/day instead.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from flu_data_pipeline_spark.session import ensure_session_defaults

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[Builder], Builder]:
    """Decorator: add a builder to the registry under ``name``."""

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        # Session portability: builders are called by external harnesses
        # with sessions we didn't configure (ANSI on, host timezone, no
        # nanos-parquet handling). Apply the engine's runtime confs to
        # whatever session arrives, so semantics never depend on who
        # built it (CORRECTNESS_r01: 17/19 failures were this coupling).
        @functools.wraps(fn)
        def portable(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_defaults(spark)
            return fn(spark, sf_dir)

        REGISTRY[name] = QueryDef(
            name, portable, oracle, doc or (fn.__doc__ or ""), tags, bench
        )
        return portable

    return wrap
