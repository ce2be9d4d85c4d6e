"""Planted-duplicate recall: the oracle hash-gates pin ARITHMETIC; these
tests pin SEMANTICS — a corpus with known exact and near duplicates
planted must come back with exactly those pairs flagged, and unrelated
docs must not. Ground truth is constructed, not replayed."""

from __future__ import annotations

import random

import pytest

from stateflow_spark.queries import REGISTRY


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    """documents.parquet with: d1 base, d2 == d1 (exact dup), d3 = d1 with
    2 of 60 words changed (near dup), d4-d13 unrelated random texts.
    doc_ids start at 1 so none is a benchmark doc (doc_id % 49 == 0)."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(500)]
    base = [rng.choice(vocab) for _ in range(60)]
    near = list(base)
    near[10], near[40] = "changedA", "changedB"
    rows = [
        (1, " ".join(base)),
        (2, " ".join(base)),
        (3, " ".join(near)),
    ] + [
        (i, " ".join(rng.choice(vocab) for _ in range(60)))
        for i in range(4, 14)
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tmp_path_factory.mktemp("planted")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_exact_dedup_finds_planted_copy(spark, planted):
    groups = {
        r.canonical_doc_id: r.n_copies
        for r in REGISTRY["dedup_exact"].fn(spark, planted).collect()
    }
    assert groups[1] == 2  # d1+d2 collapse; d1 canonical
    assert all(n == 1 for c, n in groups.items() if c != 1)


def test_jaccard_finds_near_dup_and_nothing_else(spark, planted):
    pairs = _pairs(REGISTRY["dedup_ngram_jaccard"].fn(spark, planted))
    assert (1, 2) in pairs  # exact copy: jaccard 1.0
    assert (1, 3) in pairs and (2, 3) in pairs  # 2-of-60-word edit
    assert all(a in (1, 2, 3) and b in (1, 2, 3) for a, b in pairs), pairs


def test_minhash_lsh_recalls_planted_pairs(spark, planted):
    pairs = _pairs(REGISTRY["dedup_minhash_lsh"].fn(spark, planted))
    # identical docs share every signature -> always candidates; the
    # near-dup shares ~57/62 distinct shingles -> expected to band
    # together and pass the exact verify
    assert (1, 2) in pairs
    assert (1, 3) in pairs
    assert all(a in (1, 2, 3) and b in (1, 2, 3) for a, b in pairs), pairs


def test_simhash_banding_recalls_exact_copy(spark, planted):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["dedup_simhash_pairs"].fn(spark, planted).collect()
    }
    assert (1, 2) in pairs  # hamming 0
    # no unrelated doc may appear in any pair
    assert all(a in (1, 2, 3) and b in (1, 2, 3) for a, b in pairs), pairs


def test_connected_components_clusters_the_planted_trio(spark, planted):
    rows = REGISTRY["dedup_connected_components"].fn(spark, planted).collect()
    comp = {r.doc_id: r.comp_id for r in rows}
    assert comp[1] == comp[2] == comp[3] == 1  # keeper = min doc_id
    sizes = {r.doc_id: r.comp_size for r in rows}
    assert sizes[1] == 3
    assert not {d for d in comp if d not in (1, 2, 3)}, comp


def test_pagerank_ranks_the_cluster_center_highest(spark, planted):
    """In the planted trio, d1 connects to BOTH d2 and d3 while d2-d3 are
    also connected (all pairwise near-dups) — but d1 is the exact-copy
    hub; with a symmetric triangle all three ranks are equal, so assert
    the structural facts instead: ranks exist exactly for the trio, sum
    to ~1 (within the damping leak), and are strictly positive."""
    rows = REGISTRY["dedup_pagerank"].fn(spark, planted).collect()
    ranks = {r.doc_id: r.pagerank for r in rows}
    assert set(ranks) == {1, 2, 3}
    assert all(v > 0 for v in ranks.values())
    # symmetric triangle: uniform stationary distribution, preserved by
    # every iteration — ranks identical across the trio
    vals = sorted(ranks.values())
    assert abs(vals[0] - vals[-1]) < 1e-12
    assert abs(sum(vals) - 1.0) < 1e-9
