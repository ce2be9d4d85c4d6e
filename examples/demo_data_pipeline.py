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

    # 0. PII scrub — the pipeline's first pass (zero-shuffle codegen
    #    projection; kernels in functions/pii.py)
    pii = REGISTRY["text_pii_scrub"].fn(spark, sf_dir)
    pii_stats = pii.agg(
        F.sum("n_emails").alias("e"),
        F.sum("n_ips").alias("i"),
        F.sum("n_phones").alias("p"),
    ).collect()[0]
    print(f"0. PII scrub: redacted {pii_stats.e} emails, "
          f"{pii_stats.i} IPs, {pii_stats.p} phones")

    # 0b. repetition gate (Gopher rules, computed entirely in-array)
    rep = REGISTRY["text_repetition_filter"].fn(spark, sf_dir)
    rep_fail = rep.filter(~F.coalesce(F.col("repetition_ok"), F.lit(True)))
    print(f"0b. repetition gate: {rep_fail.count()} docs fail the "
          f"top-gram/dup-5-gram rules")

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

    # 2b. pairs → clusters → quality-aware keeper per cluster (longest
    #     doc wins, min-doc_id tiebreak): the curator's choice, not just
    #     the smallest id
    keepers = REGISTRY["dedup_cluster_keeper"].fn(spark, sf_dir)
    print(f"2b. {keepers.count()} dup clusters; keeper = longest member")

    # 3. quality gate: keep docs passing the composite score; the
    #    corpus-statistics signal (hapax density / mean token frequency)
    #    is the companion unigram-LM-style feature
    quality = REGISTRY["text_quality_score"].fn(spark, sf_dir)
    kept = quality.filter(F.col("quality_ok"))
    rare = REGISTRY["text_token_rarity"].fn(spark, sf_dir)
    extremes = rare.filter(
        (F.col("n_hapax") * 4 > F.col("n_tokens"))
    ).count()
    print(f"3. quality gate: {kept.count()}/{n_docs} pass; "
          f"{extremes} docs >25% hapax tokens (rarity signal)")

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

    # 6. benchmark-contamination gate: drop docs sharing >=50% of their
    #    shingles with the held-out benchmark set (broadcast predicate)
    contam = REGISTRY["curation_benchmark_contamination"].fn(spark, sf_dir)
    hot = contam.filter(F.col("contamination") >= 0.5).select("doc_id")
    survivors = survivors.join(hot, "doc_id", "left_anti")
    print(f"6. contamination gate: {survivors.count()} docs survive "
          f"(dropped >=50% benchmark-overlap docs)")

    # 7. mixture balancing: deterministic hash-threshold downsample toward
    #    the smallest language (no rand(), reproducible across retries)
    mix = REGISTRY["curation_balance_mixture"].fn(spark, sf_dir)
    print("7. language mixture after balancing:")
    for r in mix.orderBy("lang").collect():
        print(f"   {r.lang}: {r.n_kept}/{r.n_total} kept "
              f"(quota {r.quota}, realized {r.realized:.2f})")

    # 8. sequence packing: fixed 256-token training sequences via the
    #    distributed prefix sum
    packs = REGISTRY["curation_pack_sequences"].fn(spark, sf_dir)
    stats = packs.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.avg("fill_ratio").alias("avg_fill"),
    ).collect()[0]
    print(f"8. packing: {stats.n_packs} sequences of 256 tokens, "
          f"mean fill {stats.avg_fill:.2f}")

    # 9. embedding ANN: top-10 nearest to query vector 0 through the IVF
    #    probe path (cluster pruning ≈ partition pruning at scale); the
    #    label-free alternative is sim_hyperplane_lsh (banded sign-LSH)
    ann = REGISTRY["sim_ivf_topk"].fn(spark, sf_dir)
    print("9. ANN top-10 (IVF, nprobe=3):")
    for r in ann.collect():
        print(f"   vec {r.vec_id}: cosine {r.cosine:.4f}")
    rng = REGISTRY["sim_range_search"].fn(spark, sf_dir)
    print(f"9b. range search: {rng.count()} neighbors within "
          f"cosine >= 0.30 of the capped query block")

    # 10. steps 1-6 again, as ONE registered Catalyst plan with a single
    #     composed DuckDB oracle (curation_full_pipeline)
    pipe = REGISTRY["curation_full_pipeline"].fn(spark, sf_dir)
    print("10. the same sweep as one plan (curation_full_pipeline):")
    for r in pipe.orderBy("lang").collect():
        print(f"   {r.lang}: kept {r.n_kept}/{r.n_total} "
              f"({r.tokens_kept} tokens)")

    # 11. tomorrow's ingest: the delta classified against the corpus's
    #     stored fingerprint index — never re-pairing the old corpus
    inc = REGISTRY["dedup_incremental_index"].fn(spark, sf_dir)
    kinds = {r.dup_kind: r.n for r in
             inc.groupBy("dup_kind").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    print(f"11. incremental ingest: {kinds.get('unique', 0)} new, "
          f"{kinds.get('corpus', 0)} corpus dups, "
          f"{kinds.get('batch', 0)} within-batch dups")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
