#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
       (no query args = the full bench set)

e.g. python tools/dump_plans.py r12 before
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stateflow_spark.queries import REGISTRY
from stateflow_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or [
        n for n, qd in sorted(REGISTRY.items()) if "bench" in qd.tags
    ]
    outdir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="stateflow-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record the failure in the file
            txt = f"ERROR building/explaining {name}: {type(e).__name__}: {e}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
