"""Custom Python data source (Spark 4 DataSource API).

Demonstrates the engine's source extensibility beyond file formats: a
DataSource subclass registered once makes ``spark.read.format("synthevents")``
a first-class scan with its own partition planning — each InputPartition
becomes one Spark task, so a custom source parallelizes like any file scan.
This is the integration point for REST-paginated APIs (the reference's
FluView pull, flu_data_airflow_v2.py:263-278, would map here: one
InputPartition per epiweek range instead of a driver-side loop).

The reader below generates deterministic synthetic events (id-derived
fields, no RNG) so tests can assert exact contents.

NOTE: no ``from __future__ import annotations`` — the DataSource API
inspects evaluated annotations.
"""

from collections.abc import Iterable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

EVENT_TYPES = ("view", "click", "purchase")


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthevents").option("rows", n)`` source."""

    @classmethod
    def name(cls) -> str:
        return "synthevents"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_partitions = int(options.get("partitions", 4))
        # pushed-down bounds, tightened by pushFilters: [lo, hi) on
        # event_id, optional exact event_type
        self.id_lo = 0
        self.id_hi = self.n_rows
        self.etype = None

    def pushFilters(self, filters) -> Iterable[Filter]:
        """Source-side filter pushdown (Spark 4.1 Python DataSource API,
        planner-gated behind spark.sql.python.filterPushdown.enabled):
        event_id range predicates tighten the generation bounds — the
        rows are never produced, the analogue of parquet row-group
        pruning or a database WHERE — and an event_type equality is
        applied per row. Anything else is returned to Spark to evaluate
        as a post-scan Filter; accepted filters are REMOVED from the
        Spark plan, so correctness of the pushed semantics is
        load-bearing (asserted in tests against an unpushed twin)."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("event_type",):
                if self.etype is not None and self.etype != f.value:
                    # Two contradictory equalities: accepting both while
                    # keeping only one value would rely on the PLANNER
                    # collapsing them first (4.1.2 happens to, but it is
                    # not an API guarantee). Make the scan provably
                    # empty instead.
                    self.id_hi = self.id_lo
                    continue
                self.etype = f.value
            elif isinstance(f, LessThan) and f.attribute == ("event_id",):
                self.id_hi = min(self.id_hi, f.value)
            elif isinstance(f, LessThanOrEqual) and f.attribute == ("event_id",):
                self.id_hi = min(self.id_hi, f.value + 1)
            elif isinstance(f, GreaterThan) and f.attribute == ("event_id",):
                self.id_lo = max(self.id_lo, f.value + 1)
            elif isinstance(f, GreaterThanOrEqual) and f.attribute == ("event_id",):
                self.id_lo = max(self.id_lo, f.value)
            else:
                yield f  # unsupported → Spark keeps its own Filter

    def partitions(self) -> Sequence[InputPartition]:
        # one InputPartition per task: the custom source's unit of
        # parallelism, analogous to a file split
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        i = partition.value
        # smallest eid >= id_lo that belongs to this partition's residue
        start = self.id_lo + ((i - self.id_lo) % self.n_partitions)
        for eid in range(start, min(self.n_rows, self.id_hi), self.n_partitions):
            etype = EVENT_TYPES[eid % len(EVENT_TYPES)]
            if self.etype is not None and etype != self.etype:
                continue
            yield (
                eid,
                eid % 97,
                etype,
                (eid % 1000) / 10.0,
            )


def register_synthetic_source(spark) -> None:
    # the reader implements pushFilters; Spark 4.1 refuses to plan such a
    # source unless the pushdown gate is on, so flip it with registration
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
