#!/usr/bin/env python
"""Per-query empirical profile (guide §1/§7): run named registry queries
into the noop sink on a UI-enabled session and report, per query:

  - plan_s   driver-side DataFrame construction time (fn call)
  - run1_s / run2_s  first and second noop-sink execution walls
  - per-job and per-stage breakdown from the UI REST API: task count,
    executor run time, input bytes, shuffle read/write bytes

Usage: python tools/profile_query.py q1_pricing_summary sim_ivf_topk ...
       (no args = the full bench set)

Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Not part of the
bench contract — a diagnosis tool; numbers here are single-shot walls.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stateflow_spark.queries import REGISTRY
from stateflow_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:] or [
        n for n, qd in sorted(REGISTRY.items()) if "bench" in qd.tags
    ]
    spark = get_spark(
        app_name="stateflow-profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = "http://localhost:4050/api/v1"
    app_id = spark.sparkContext.applicationId

    # warmup
    w = REGISTRY["q6_forecast_revenue"].fn(spark, SF_DIR)
    w.write.format("noop").mode("overwrite").save()

    out = []
    for name in names:
        fn = REGISTRY[name].fn
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        before_jobs = {j["jobId"] for j in rest(f"{base}/applications/{app_id}/jobs")}
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        # second, warm run (fresh plan to mimic bench)
        df2 = fn(spark, SF_DIR)
        t3 = time.perf_counter()
        df2.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        sc.setJobGroup(None, None)

        jobs = [
            j
            for j in rest(f"{base}/applications/{app_id}/jobs")
            if j["jobId"] not in before_jobs
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in rest(f"{base}/applications/{app_id}/stages/{sid}"):
                    stages.append(att)
            except Exception:
                pass
        stage_rows = [
            {
                "id": s["stageId"],
                "tasks": s["numCompleteTasks"],
                "run_ms": s.get("executorRunTime", 0),
                "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6),
                "gc_ms": s.get("jvmGcTime", 0),
                "in_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                "name": s["name"].split("\n")[0][:60],
            }
            for s in stages
            if s.get("status") == "COMPLETE"
        ]
        rec = {
            "query": name,
            "plan_s": round(t1 - t0, 3),
            "run1_s": round(t2 - t1, 3),
            "plan2_s": round(t3 - t2, 3),
            "run2_s": round(t4 - t3, 3),
            "n_jobs": len(jobs),
            "n_stages": len(stage_rows),
            "sum_task_run_s": round(sum(s["run_ms"] for s in stage_rows) / 1e3, 2),
            "stages": stage_rows,
        }
        out.append(rec)
        print(
            f"{name:42s} plan {rec['plan_s']:6.2f}  run1 {rec['run1_s']:6.2f}"
            f"  plan2 {rec['plan2_s']:6.2f}  run2 {rec['run2_s']:6.2f}"
            f"  jobs {rec['n_jobs']:3d} stages {rec['n_stages']:3d}"
            f"  task-run {rec['sum_task_run_s']:7.2f}s",
            flush=True,
        )
        for s in rec["stages"]:
            if s["run_ms"] >= 200 or s["tasks"] <= 2:
                print(
                    f"    stage {s['id']:4d} tasks {s['tasks']:4d} "
                    f"run {s['run_ms']/1e3:6.2f}s cpu {s['cpu_ms']/1e3:6.2f}s "
                    f"gc {s['gc_ms']/1e3:5.2f}s "
                    f"in {s['in_mb']:7.1f}MB shR {s['sh_r_mb']:7.2f} "
                    f"shW {s['sh_w_mb']:7.2f}  {s['name']}",
                    flush=True,
                )
    with open("/tmp/profile_queries.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
