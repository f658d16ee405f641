#!/usr/bin/env python3
"""Per-query wall-time audit of the whole registry (driver-gate view).

The round driver evaluates every registered query at sf0.01 with a
bounded overall budget — round 1's gate was cut off mid-registry — so
per-query cost is an operational constraint, not just a perf nicety.
This script times each query end-to-end (plan + execute + toPandas,
the same work the gate does) and prints the slowest first.

Usage: python bench/time_registry.py [sf_dir] [top_n]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movement_spark import queries as Q          # noqa: E402
from movement_spark.session import get_spark     # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    spark = get_spark(app_name="time_registry", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "32",
                                  "spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = Q.queries()
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.time()
        fn(spark, sf_dir).toPandas()
        timings[name] = round(time.time() - t0, 2)
    ordered = sorted(timings.items(), key=lambda kv: -kv[1])
    if top_n:
        ordered = ordered[:top_n]
    for name, sec in ordered:
        print(f"{sec:8.2f}  {name}")
    print(json.dumps({"total_sec": round(sum(timings.values()), 1),
                      "n_queries": len(timings)}))
    spark.stop()


if __name__ == "__main__":
    main()
