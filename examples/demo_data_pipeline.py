"""Training-data curation pipeline on the engine's operator inventory.

The standard LLM-corpus preparation sweep — exact dedup, near-dup removal,
quality gating, token accounting, embedding ANN — each stage a registered,
oracle-checked operator from `stateflow_spark/queries/`. Everything is a
DataFrame plan: at 100 TB the same code runs with the parquet paths
pointed at the real corpus.

Run: python examples/demo_data_pipeline.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from stateflow_spark.catalog import load
from stateflow_spark.queries import REGISTRY
from stateflow_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="data-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    print(f"corpus: {n_docs} documents ({sf_dir})")

    # 1. exact dedup: canonical doc per content fingerprint
    exact = REGISTRY["dedup_exact"].fn(spark, sf_dir)
    n_unique = exact.count()
    print(f"1. exact dedup: {n_unique} unique contents "
          f"({n_docs - n_unique} exact copies dropped)")

    # 2. near-dup candidates via MinHash-LSH (banded, verified by exact
    #    Jaccard in-bucket — the scale path; see dedup_ngram_jaccard for
    #    the small-corpus exact variant)
    near = REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir)
    drop_b = near.select(F.col("doc_b").alias("doc_id")).distinct()
    print(f"2. minhash-LSH near-dup: {near.count()} verified pairs, "
          f"{drop_b.count()} docs marked as near-duplicates")

    # 3. quality gate: keep docs passing the composite score
    quality = REGISTRY["text_quality_score"].fn(spark, sf_dir)
    kept = quality.filter(F.col("quality_ok"))
    print(f"3. quality gate: {kept.count()}/{n_docs} pass")

    # 4. the surviving set: exact-canonical ∩ not-near-dup ∩ quality-pass
    survivors = (
        exact.select(F.col("canonical_doc_id").alias("doc_id"))
        .join(drop_b, "doc_id", "left_anti")
        .join(kept.select("doc_id"), "doc_id", "left_semi")
    )
    print(f"4. surviving corpus: {survivors.count()} docs")

    # 5. token accounting over survivors (BPE-ish regex pretokenizer)
    toks = REGISTRY["text_bpe_token_count"].fn(spark, sf_dir)
    total = (
        toks.join(survivors, "doc_id", "left_semi")
        .agg(F.sum("bpe_tokens").alias("total_tokens"))
        .collect()[0]
    )
    print(f"5. token budget: {total.total_tokens} BPE-ish tokens")

    # 6. embedding ANN: top-10 nearest to query vector 0 through the IVF
    #    probe path (cluster pruning ≈ partition pruning at scale)
    ann = REGISTRY["sim_ivf_topk"].fn(spark, sf_dir)
    print("6. ANN top-10 (IVF, nprobe=3):")
    for r in ann.collect():
        print(f"   vec {r.vec_id}: cosine {r.cosine:.4f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
