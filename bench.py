#!/usr/bin/env python
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing = full query execution into a noop sink (scan → compute → materialize
every row, no driver collect), after a one-query JVM warmup.

Each query is timed as best-of-2 over two full passes (the SCALING.md
methodology): a single shared-session pass lets heavy headliners inflate
their neighbors by 15-50% through GC/codegen-cache pressure (round-3 bench
showed q1 +44% / q3 +51% vs round 2 with zero code change); the second pass
re-measures every query against a session already perturbed by everything
else, and the min is the uncontended figure.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from stateflow_spark.queries import REGISTRY
from stateflow_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [name for name, qd in sorted(REGISTRY.items()) if "bench" in qd.tags]


def run_one(spark, name: str) -> float:
    fn = REGISTRY[name].fn
    t0 = time.perf_counter()
    df = fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(app_name="stateflow-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM/codegen/parquet-footer caches
    run_one(spark, "q6_forecast_revenue")

    times: dict[str, float] = {}
    for _pass in range(2):
        for name in BENCH_QUERIES:
            t = run_one(spark, name)
            if name not in times or t < times[name]:
                times[name] = t
    times = {name: round(t, 4) for name, t in times.items()}

    # streaming-path bench (BASELINE.md): YCSB A (update-heavy), B
    # (read-heavy) and T (cross-entity transfer flows) over the
    # distributed entity engine — 1000 Zipf(0.99) ops on 100 entities
    # (the reference's own workload harness); best-of-2 like the
    # relational queries
    from stateflow_spark import ycsb

    for mix in ("a", "b", "t"):
        key = f"ycsb_{mix}_superstep"
        times[key] = min(
            ycsb.run_superstep(spark, mix)["sec"] for _ in range(2)
        )

    total = round(sum(times.values()), 4)
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
