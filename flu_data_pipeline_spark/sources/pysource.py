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

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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

    def partitions(self) -> Sequence[InputPartition]:
        # one InputPartition per task: the custom source's unit of
        # parallelism, analogous to a file split
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        i = partition.value
        for eid in range(i, self.n_rows, self.n_partitions):
            yield (
                eid,
                eid % 97,
                EVENT_TYPES[eid % len(EVENT_TYPES)],
                (eid % 1000) / 10.0,
            )


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
