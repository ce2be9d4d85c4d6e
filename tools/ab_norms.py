#!/usr/bin/env python
"""Interleaved same-session A/B: stored-norm corpus layout (_norms_dir,
round 11) vs the r10 recompute-barrier form of _corpus_n2, on the
pure-scan cosine family at sf0.1. Round-10 VERDICT #1's done-gate:
stored ≈ pre-guard walls (the guard fold moves to the nightly layout
job), measured in ONE session with alternating arms — the only bench
methodology that has survived scrutiny (see MEMORY / SCALING.md)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from stateflow_spark.queries import REGISTRY
from stateflow_spark.queries import similarity as sim
from stateflow_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROWS = ["sim_cosine_topk", "sim_range_search", "sim_hyperplane_lsh",
        "sim_ivf_topk"]
SWEEPS = int(os.environ.get("AB_SWEEPS", "3"))

_stored_corpus_n2 = sim._corpus_n2


def _recompute_corpus_n2(spark, sf_dir, with_label=False):
    """The r10 form: fold per query behind the keyed-aggregate barrier."""
    c = sim._corpus(spark, sf_dir, with_label=with_label, fan_out=True)
    return sim._pin_n2(c, *(["label"] if with_label else []))


# --- pre-guard (r8) bodies: inline norm fold, NO zero-norm guard ----------
# timing baselines only — semantically wrong on zero-norm rows


def _pre_cosine(spark):
    from stateflow_spark.functions.similarity import dot_dec, norm2_dec

    q = sim._query_vec(spark, SF_DIR)
    c = sim._corpus(spark, SF_DIR, fan_out=True)
    return (
        c.filter(F.col("vec_id") != 0)
        .crossJoin(q)
        .select(
            "vec_id",
            (dot_dec("v", "qv")
             / (F.sqrt(norm2_dec("v")) * F.sqrt(F.col("qnorm2"))))
            .alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


def _pre_range(spark):
    from stateflow_spark.functions.similarity import dot_dec, norm2_dec

    q = F.broadcast(
        sim._corpus(spark, SF_DIR)
        .filter((F.col("vec_id") % 101 == 0) & (F.col("vec_id") < 1010))
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                norm2_dec("v").alias("qn2"))
    )
    c = sim._corpus(spark, SF_DIR, fan_out=True)
    cos = dot_dec("v", "qv") / (F.sqrt(norm2_dec("v")) * F.sqrt(F.col("qn2")))
    return (
        c.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= sim.RANGE_COSINE_THRESHOLD)
    )


def _pre_hyperplane(spark):
    from stateflow_spark.functions.similarity import dot_dec, norm2_dec

    corpus = sim._corpus(spark, SF_DIR, fan_out=True)
    qside = F.broadcast(
        corpus.filter(F.col("vec_id") == 0).select(
            F.col("v").alias("qv"), norm2_dec("v").alias("qnorm2"),
            *[sim._srp_band_sig(b).alias(f"qs{b}")
              for b in range(sim._SRP_BANDS)],
        )
    )
    sigged = corpus.filter(F.col("vec_id") != 0).select(
        "vec_id", "v",
        *[sim._srp_band_sig(b).alias(f"s{b}")
          for b in range(sim._SRP_BANDS)],
    )
    match_any = None
    for b in range(sim._SRP_BANDS):
        m = F.col(f"s{b}") == F.col(f"qs{b}")
        match_any = m if match_any is None else (match_any | m)
    return (
        sigged.crossJoin(qside)
        .filter(match_any)
        .select(
            "vec_id",
            (dot_dec("v", "qv")
             / (F.sqrt(norm2_dec("v")) * F.sqrt(F.col("qnorm2"))))
            .alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


def _pre_ivf(spark):
    from stateflow_spark.functions.similarity import dot_dec, norm2_dec

    cent = sim._centroids(spark, SF_DIR)
    q = sim._query_vec(spark, SF_DIR)
    probed_labels = (
        cent.crossJoin(q)
        .select("label", dot_dec("cv", "qv").alias("cdot"))
        .orderBy(F.col("cdot").desc(), F.col("label"))
        .limit(3)
        .select("label")
    )
    probed = (
        sim._corpus(spark, SF_DIR, with_label=True, fan_out=True)
        .join(F.broadcast(probed_labels), "label")
        .filter(F.col("vec_id") != 0)
    )
    return (
        probed.crossJoin(q)
        .select(
            "vec_id",
            (dot_dec("v", "qv")
             / (F.sqrt(norm2_dec("v")) * F.sqrt(F.col("qnorm2"))))
            .alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


PREGUARD = {"sim_cosine_topk": _pre_cosine, "sim_range_search": _pre_range,
            "sim_hyperplane_lsh": _pre_hyperplane, "sim_ivf_topk": _pre_ivf}


def run_one(spark, name):
    t0 = time.perf_counter()
    REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


def run_pre(spark, name):
    t0 = time.perf_counter()
    PREGUARD[name](spark).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main():
    spark = get_spark(app_name="ab-norms")
    spark.sparkContext.setLogLevel("ERROR")
    load0 = os.getloadavg()[0]
    # warm: JVM, parquet footers, and the stored layout build itself
    sim._norms_dir(spark, SF_DIR)
    for name in ROWS:
        run_one(spark, name)
    walls = {
        name: {"stored": [], "recompute": [], "preguard": []}
        for name in ROWS
    }
    for s in range(SWEEPS):
        # rotate which arm goes first each sweep
        arms = [("stored", _stored_corpus_n2),
                ("recompute", _recompute_corpus_n2),
                ("preguard", None)]
        arms = arms[s % 3:] + arms[: s % 3]
        for arm, fn in arms:
            if arm == "preguard":
                for name in ROWS:
                    walls[name][arm].append(round(run_pre(spark, name), 4))
                continue
            sim._corpus_n2 = fn
            for name in ROWS:
                walls[name][arm].append(round(run_one(spark, name), 4))
    sim._corpus_n2 = _stored_corpus_n2
    out = {"sf_dir": SF_DIR, "loadavg_start": load0,
           "loadavg_end": os.getloadavg()[0], "sweeps": SWEEPS, "rows": {}}
    for name in ROWS:
        st = min(walls[name]["stored"])
        rc = min(walls[name]["recompute"])
        pg = min(walls[name]["preguard"])
        out["rows"][name] = {
            "stored_best": st, "recompute_best": rc, "preguard_best": pg,
            "stored_vs_recompute": round(st / rc, 3),
            "stored_vs_preguard": round(st / pg, 3),
            "passes": walls[name],
        }
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
