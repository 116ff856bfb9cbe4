#!/usr/bin/env python
"""Benchmark harness: runs the headline queries (registry entries flagged
``bench=True``) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ...}

Timing = full query execution into Spark's ``noop`` sink — every output
column is materialized on the executors and discarded, nothing is
collected to the driver. (A bare ``count()`` would let Catalyst prune
unreferenced computed columns and under-report projection-heavy queries.)
A warmup pass per query amortizes first-touch JIT/IO so the numbers
reflect steady plan execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flu_data_pipeline_spark.plans import REGISTRY
from flu_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="flu_data_pipeline_spark-bench")

    bench_queries = {n: q for n, q in REGISTRY.items() if q.bench}
    timings: dict[str, float] = {}

    def run(qd) -> None:
        # noop sink: full evaluation of every output column, zero driver
        # transfer — count() would prune computed-but-unreferenced columns
        qd.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # warmup: trigger JVM/codegen/IO caches once
    for name, qd in bench_queries.items():
        run(qd)

    # best-of-3: single runs swing ±50% from JIT/GC noise at these sizes
    for name, qd in bench_queries.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(qd)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
