#!/usr/bin/env python
"""Two-tree interleaved A/B (round-10 VERDICT #2): run the SAME queries
from the r9-close and r10-close source trees inside ONE Spark session on
an idle box, alternating arms per sweep. This is the adjudicator for the
~1.3x "environmental residual" between the r9 and r10 idle BENCH
artifacts — rows untouched since r8 moved 1.37-1.47x between those two
cross-session artifacts, which is impossible if the code is the cause.
Artifact-to-artifact idle comparisons have now misled two rounds running
(r9's minhash ghost, r10's uniform drift); within-session interleaving
is the only methodology that has held up.

Mechanics: the two trees are plain git worktrees; arms swap by purging
stateflow_spark* from sys.modules and re-pointing sys.path — the JVM,
codegen cache, and parquet footers are shared by construction, so any
wall difference is the Python-side plan the tree builds.

Usage: python tools/ab_trees.py /tmp/tree_r9 /tmp/tree_r10
"""

from __future__ import annotations

import json
import os
import sys
import time

# rows shared by the r9 and r10 bench sets whose CODE did not change
# between r8 and r10 (the VERDICT's drift witnesses) plus the heavier
# shared non-similarity rows; no r10-only rows (absent in the r9 tree)
ROWS = [
    "q9_product_type_profit",
    "q10_returned_items",
    "text_bpe_train_merges",
    "multimodal_phash_neardup",
    "dedup_minhash_lsh",
    "dedup_semantic_scaled",
    "join_market_basket_pairs",
    "events_markov_transitions",
]
SWEEPS = int(os.environ.get("AB_SWEEPS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tree(path: str):
    for m in list(sys.modules):
        if m.startswith("stateflow_spark"):
            del sys.modules[m]
    sys.path[:] = [
        p for p in sys.path
        if not (p.rstrip("/").endswith("tree_r9")
                or p.rstrip("/").endswith("tree_r10")
                or p.rstrip("/") == "/root/repo")
    ]
    sys.path.insert(0, path)
    from stateflow_spark.queries import REGISTRY  # noqa: PLC0415

    return REGISTRY


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    # bootstrap the session from tree_b (configs identical across trees)
    reg = load_tree(tree_b)
    from stateflow_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark(app_name="ab-trees")
    spark.sparkContext.setLogLevel("ERROR")
    load0 = os.getloadavg()[0]

    def run_one(registry, name):
        t0 = time.perf_counter()
        registry[name].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 4)

    # warm both arms once (JVM, codegen, footers, index/posting caches)
    for path in (tree_a, tree_b):
        reg = load_tree(path)
        for name in ROWS:
            run_one(reg, name)

    walls = {n: {tree_a: [], tree_b: []} for n in ROWS}
    for s in range(SWEEPS):
        arms = [tree_a, tree_b] if s % 2 == 0 else [tree_b, tree_a]
        for path in arms:
            reg = load_tree(path)
            for name in ROWS:
                walls[name][path].append(run_one(reg, name))

    out = {"sf_dir": SF_DIR, "loadavg_start": load0,
           "loadavg_end": os.getloadavg()[0], "sweeps": SWEEPS,
           "tree_a": tree_a, "tree_b": tree_b, "rows": {}}
    for name in ROWS:
        a, b = min(walls[name][tree_a]), min(walls[name][tree_b])
        out["rows"][name] = {
            "a_best": a, "b_best": b, "b_over_a": round(b / a, 3),
            "passes": {"a": walls[name][tree_a], "b": walls[name][tree_b]},
        }
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
