"""Structural invariants of the curation operators — properties the
value-hash oracle implies but doesn't state, pinned explicitly so a
refactor that changes semantics (and oracle together) still has to
honor them."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from stateflow_spark.catalog import load
from stateflow_spark.queries import REGISTRY
from stateflow_spark.queries.curation import PACK_BUDGET, _STRATA_RATES
from tests.conftest import SF_DIR


def test_packing_conserves_tokens_and_partitions_docs(spark):
    packs = REGISTRY["curation_pack_sequences"].fn(spark, SF_DIR).collect()
    docs = load(spark, SF_DIR, "documents")
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).first().t
    n_docs = docs.count()
    # conservation: every token and every doc lands in exactly one pack
    assert sum(p.pack_tokens for p in packs) == total_tokens
    assert sum(p.n_docs for p in packs) == n_docs
    # packs are contiguous doc_id intervals in pack order
    by_id = sorted(packs, key=lambda p: p.pack_id)
    for a, b in zip(by_id, by_id[1:]):
        assert a.last_doc < b.first_doc
    # a doc belongs to the pack where it STARTS, so an individual pack can
    # be short (its range partly consumed by the previous pack's straddling
    # doc) or a pack_id can be skipped entirely (one doc spanning multiple
    # budgets). The invariant is on prefix sums: after any non-final pack
    # p, at least (p+1)·budget tokens have been laid down — the next doc
    # starts beyond pack p's range.
    prefix = 0
    for p in by_id[:-1]:
        prefix += p.pack_tokens
        assert prefix >= (p.pack_id + 1) * PACK_BUDGET, p


@pytest.mark.slow
def test_contamination_is_a_valid_ratio(spark):
    rows = REGISTRY["curation_benchmark_contamination"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_hit <= r.n_shingles
        assert 0.0 < r.contamination <= 1.0
        # benchmark docs themselves are never scored
        assert r.doc_id % 49 != 0


def test_sampling_quotas_and_bounds(spark):
    strat = {
        r.lang: r
        for r in REGISTRY["curation_stratified_sample"].fn(spark, SF_DIR).collect()
    }
    for lang, r in strat.items():
        assert 0 <= r.n_kept <= r.n_total
        assert r.target_pct == _STRATA_RATES.get(lang, 60)
    mix = REGISTRY["curation_balance_mixture"].fn(spark, SF_DIR).collect()
    n_min = min(r.n_total for r in mix)
    for r in mix:
        assert r.quota == n_min
        assert 0 <= r.n_kept <= r.n_total
    # the smallest stratum is never downsampled (keep-rule: bucket·total
    # < min·100 always holds when total == min, buckets being < 100)
    smallest = [r for r in mix if r.n_total == n_min][0]
    assert smallest.n_kept == smallest.n_total


def test_split_leakage_straddles_and_purges_nontrain(spark):
    rows = REGISTRY["curation_split_leakage"].fn(spark, SF_DIR).collect()
    assert rows  # the sf0.01 corpus has planted near-dups across splits
    from stateflow_spark.queries.curation import _split_col

    split_of = {
        r.doc_id: r.split
        for r in load(spark, SF_DIR, "documents")
        .select("doc_id", _split_col().alias("split"))
        .collect()
    }
    for r in rows:
        # every reported pair genuinely straddles a boundary
        assert r.split_a == split_of[r.doc_a]
        assert r.split_b == split_of[r.doc_b]
        assert r.split_a != r.split_b
        # the purged doc is never on the train side when an eval side exists
        assert split_of[r.purge_doc_id] != "train"
        assert r.purge_doc_id in (r.doc_a, r.doc_b)
        assert r.jaccard >= 0.10


def test_shuffle_shards_manifest_is_a_permutation(spark):
    rows = REGISTRY["curation_shuffle_shards"].fn(spark, SF_DIR).collect()
    docs = load(spark, SF_DIR, "documents")
    n_docs = docs.count()
    total_chars = docs.agg(F.sum("n_chars").alias("c")).first().c
    # conservation: every doc and byte lands in exactly one shard
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.total_chars for r in rows) == total_chars
    assert len(rows) == 16 and {r.shard_id for r in rows} == set(range(16))
    for r in rows:
        # order digest of a permutation of positions 1..n with positive
        # doc ids is bounded by n * max_doc_id; zero only if shard empty
        assert r.n_docs > 0 and r.order_digest > 0
        assert r.first_doc is not None
    # determinism: a second run reproduces the digests exactly
    again = {
        r.shard_id: r.order_digest
        for r in REGISTRY["curation_shuffle_shards"].fn(spark, SF_DIR).collect()
    }
    assert {r.shard_id: r.order_digest for r in rows} == again


def test_length_buckets_conserve_and_bound(spark):
    rows = REGISTRY["curation_length_buckets"].fn(spark, SF_DIR).collect()
    docs = load(spark, SF_DIR, "documents")
    n_docs = docs.count()
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).first().t
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.sum_tokens for r in rows) == total_tokens
    caps = sorted(r.bucket_cap for r in rows)
    assert caps == sorted(set(caps))  # one row per bucket
    for r in rows:
        # every doc fits its cap, and caps are never slack by more than 2x
        # (pow-2 ladder: the bucket below would not have held the longest doc)
        assert r.sum_tokens <= r.padded_tokens == r.n_docs * r.bucket_cap
        assert 0.0 <= r.waste_ratio < 1.0
        assert r.n_batches == (r.n_docs + 31) // 32
