#!/usr/bin/env python
"""Job-count audit for one registry query:
`python scripts/job_audit.py name [sf_dir] [runs]`.

Runs the query warm (noop sink, same methodology as bench.py), then
reports per warm run: wall seconds and Spark job count via the JVM
statusTracker (jobs carry no job group in this session, so the
null-group id list is the complete job list). Job count under AQE =
materialized query stages + blocking driver actions, i.e. the thing
guide §2.6 says to cut. This is the r11 wave-3 barrier audit, packaged.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flu_data_pipeline_spark.plans import REGISTRY
from flu_data_pipeline_spark.session import get_spark


def _n_jobs(spark) -> int:
    return len(
        list(
            spark.sparkContext._jsc.sc()
            .statusTracker()
            .getJobIdsForGroup(None)
        )
    )


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="job-audit")
    qd = REGISTRY[name]

    def run() -> None:
        qd.builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    run()  # warmup
    for i in range(runs):
        before = _n_jobs(spark)
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        print(
            f"{name} run {i}: {dt:.3f}s  jobs={_n_jobs(spark) - before}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
