#!/usr/bin/env python
"""Time one registry query: `python scripts/time_query.py name [sf_dir] [n]`.

Same methodology as bench.py (noop sink, warmup, best-of-n) for quick
single-query iteration while optimizing a plan.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flu_data_pipeline_spark.plans import REGISTRY
from flu_data_pipeline_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark(app_name="time-query")
    qd = REGISTRY[name]

    def run() -> None:
        qd.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()

    run()  # warmup
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    print(f"{name}: best={min(times):.4f}s all={[round(t, 3) for t in times]}")
    spark.stop()


if __name__ == "__main__":
    main()
