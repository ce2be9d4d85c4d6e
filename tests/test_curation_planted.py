"""Planted-semantics tests for the round-6 curation/text/dedup additions:
the oracle hash-gates pin cross-engine arithmetic; these pin MEANING —
constructed inputs with known-correct outcomes (which vector SemDeDup must
prune, which doc the adaptive gate must drop, which source pair the overlap
matrix must flag, which doc is OOV, which doc is repetitive)."""

from __future__ import annotations

import pytest

from stateflow_spark.queries import REGISTRY


# --------------------------------------------------------------------------
# dedup_semantic: cluster assignment + smaller-id-survives pruning
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sem_corpus(spark, tmp_path_factory):
    """8-dim corpus engineered around the fixed seeds (vec_id 1..4 = unit
    axes): vec 5 sits on seed 1's axis (cosine ≈ .995 to seed 1 → pruned by
    the seed), vec 6 = 2×vec 5 (cosine 1.0 to vec 5 → pruned), vec 7 lands
    in cluster 1 by distance but on a disjoint support axis (pairwise
    cosine < 0.09 to every cluster-mate → kept)."""
    e = lambda i: [1.0 if j == i else 0.0 for j in range(8)]
    v5 = [1.0, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    v6 = [2.0, 0.2, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    v7 = [0.4, 0.0, 0.0, 0.0, 5.0, 0.0, 0.0, 0.0]
    rows = [(1, e(0), 0), (2, e(1), 0), (3, e(2), 0), (4, e(3), 0),
            (5, v5, 0), (6, v6, 0), (7, v7, 0)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = tmp_path_factory.mktemp("sem-emb")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_semdedup_prunes_exactly_the_planted_near_dups(spark, sem_corpus):
    out = {r.vec_id: r for r in REGISTRY["dedup_semantic"].fn(spark, sem_corpus).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6, 7}
    # seeds are mutually orthogonal -> all kept
    assert all(out[i].kept for i in (1, 2, 3, 4))
    # 5 has seed 1 (smaller id, cos .995); 6 has 5 (cos 1.0) -> both pruned
    assert not out[5].kept and not out[6].kept
    # 7 shares cluster 1 but is near-orthogonal to every mate -> survives
    assert out[7].kept
    assert out[5].cid == out[6].cid == out[7].cid == 1


# --------------------------------------------------------------------------
# curation_adaptive_threshold: per-stratum top-3/4 with all-ties-in
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def strata_docs(spark, tmp_path_factory):
    """en: four docs with strictly ordered type/token scores (1.0 > .75 >
    .6 > .4) — exactly the lowest must fall (n_gt=3, 3·4 !< 3·4). fr: two
    docs — a 2-doc stratum keeps BOTH (the worse one has n_gt=1, 4 < 6),
    pinning the inclusive boundary."""
    rows = [
        (1, "a b c d", "en"),              # score 1.0
        (2, "a b c a", "en"),              # 3/4
        (3, "a b a b a", "en"),            # 2/5
        (4, "a b c a b", "en"),            # 3/5
        (5, "x y z", "fr"),                # 1.0
        (6, "x x x x", "fr"),              # 1/4
    ]
    df = spark.createDataFrame(
        [(i, t, lg, "src0", len(t)) for i, t, lg in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tmp_path_factory.mktemp("strata")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_adaptive_threshold_drops_exactly_the_stratum_tail(spark, strata_docs):
    out = {r.doc_id: r for r in
           REGISTRY["curation_adaptive_threshold"].fn(spark, strata_docs).collect()}
    assert {i: out[i].kept for i in (1, 2, 3, 4)} == {
        1: True, 2: True, 4: True, 3: False  # .4 is the en tail
    }
    # 2-doc stratum: both inside the inclusive 3/4 gate
    assert out[5].kept and out[6].kept
    assert out[3].n_gt == 3 and out[3].stratum_n == 4


# --------------------------------------------------------------------------
# curation_source_overlap: cross-source cells only, same-source excluded
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def overlap_docs(spark, tmp_path_factory):
    """d1 (src0) == d2 (srcA) exact dup; d3 (src0) = near dup of both.
    Cross-source near-dup pairs: (1,2) and (2,3) — the same-source (1,3)
    pair must NOT appear. d4-d9: unrelated srcB docs -> no cells."""
    import random

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(400)]
    base = [rng.choice(vocab) for _ in range(60)]
    near = list(base)
    near[5], near[50] = "edited1", "edited2"
    rows = [
        (1, " ".join(base), "src0"),
        (2, " ".join(base), "srcA"),
        (3, " ".join(near), "src0"),
    ] + [
        (i, " ".join(rng.choice(vocab) for _ in range(60)), "srcB")
        for i in range(4, 10)
    ]
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tmp_path_factory.mktemp("overlap")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_source_overlap_counts_only_cross_source_pairs(spark, overlap_docs):
    cells = {(r.source_a, r.source_b): r.n_pairs for r in
             REGISTRY["curation_source_overlap"].fn(spark, overlap_docs).collect()}
    assert cells == {("src0", "srcA"): 2}, cells


# --------------------------------------------------------------------------
# text_vocab_coverage: learned vocab membership drives the OOV rate
# --------------------------------------------------------------------------


def test_vocab_coverage_flags_the_oov_doc(spark, tmp_path):
    """21 distinct words: w00..w19 appear twice (the learned top-20), 'zz'
    once. The doc that is half 'zz' must fail the 34% OOV ceiling."""
    common = " ".join(f"w{i:02d}" for i in range(20))
    rows = [
        (1, common, "en"),
        (2, common, "en"),
        (3, "w00 zz", "en"),
    ]
    df = spark.createDataFrame(
        [(i, t, lg, "src0", len(t)) for i, t, lg in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r.doc_id: r for r in
           REGISTRY["text_vocab_coverage"].fn(spark, str(tmp_path)).collect()}
    assert out[1].vocab_covered and out[1].n_oov == 0
    assert out[2].vocab_covered
    assert not out[3].vocab_covered and out[3].n_oov == 1
    assert out[3].oov_rate == 0.5


# --------------------------------------------------------------------------
# text_repetition_filter: hand-computed gram fractions
# --------------------------------------------------------------------------


def test_repetition_filter_hand_computed_fractions(spark, tmp_path):
    """'a b a b a b a b': top word 4/8, top bigram 'a b' ×4 → 8/8, every
    5-gram duplicated → 1.0 — fails the gate. A 10-token all-distinct doc:
    top fractions 1/10, 2/10, 3/10... trigram frac 3/10 > .09 — the gate
    is strict even there, so assert the FRACTIONS, then the gate value."""
    rows = [
        (1, "a b a b a b a b"),
        (2, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r.doc_id: r for r in
           REGISTRY["text_repetition_filter"].fn(spark, str(tmp_path)).collect()}
    r1 = out[1]
    assert r1.n_tokens == 8
    assert r1.top_word_frac == 0.5
    assert r1.top_bigram_frac == 1.0  # 'a b' ×4 of 7 bigrams → 4·2/8
    assert r1.dup_5gram_frac == 1.0  # both distinct 5-grams repeat
    assert not r1.repetition_ok
    r2 = out[2]
    assert r2.n_tokens == 10
    assert r2.top_word_frac == 0.1 and r2.dup_5gram_frac == 0.0
    assert r2.top_bigram_frac == 0.2 and r2.top_trigram_frac == pytest.approx(0.3)


# --------------------------------------------------------------------------
# text_bm25_retrieval: ranking semantics (saturation + length norm)
# --------------------------------------------------------------------------


def test_bm25_ranks_multi_term_match_first(spark, tmp_path):
    """Same-length docs: covering all three query terms must outrank a
    single-term doc even when that doc repeats its term (tf saturation);
    and between two all-terms docs of equal tf, the shorter wins (length
    normalization)."""
    rows = [
        (1, "join hash scan pad1 pad2 pad3"),           # all terms, len 6
        (2, "join join join join join pad1"),           # one term, tf 5
        (3, "join hash scan pad1 pad2 pad3 pad4 pad5"), # all terms, len 8
        (4, "pad1 pad2 pad3 pad4 pad5 pad6"),           # no terms
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = [r.doc_id for r in
           REGISTRY["text_bm25_retrieval"].fn(spark, str(tmp_path)).collect()]
    assert out[0] == 1, out       # all-terms beats repeated single term
    assert out.index(1) < out.index(3) < out.index(2), out
    assert out[-1] == 4, out      # zero-match doc scores 0, ranks last


def test_semantic_dedup_k_knob_refines_blocking(spark, sem_corpus):
    """Raising k only REFINES the blocking (recall falls, pair volume
    falls, the kept/cid contract holds): at k=7 every planted vector is
    its own seed, so each sits alone in its own cluster (distance 0 to
    itself beats every other seed) and ALL survive — including the two
    vectors k=4 pruned."""
    from stateflow_spark.queries.dedup import semantic_dedup

    out = {r.vec_id: r for r in semantic_dedup(spark, sem_corpus, 7).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6, 7}
    assert all(r.kept for r in out.values())
    assert all(r.cid == r.vec_id for r in out.values())
