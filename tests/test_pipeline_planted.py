"""Planted end-to-end curation: a corpus where exactly one doc violates
each pipeline gate — exact duplicate, near duplicate, low quality,
benchmark-contaminated — and the composed pipeline must drop exactly
those and keep everything else.

The contaminated doc is the delicate construction: it borrows 8-word
runs from SIX different benchmark docs, so its total shingle overlap is
~0.58 (>= the 0.5 contamination threshold) while its pairwise Jaccard
with any single benchmark doc stays ~0.05 (< the 0.1 near-dup
threshold) — proving the contamination gate fires on aggregate overlap
that no pairwise dedup would catch."""

from __future__ import annotations

import random

import pytest

from stateflow_spark.queries import REGISTRY


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    rng = random.Random(23)
    vocab = [f"t{i}" for i in range(3000)]

    def fresh(n):
        return [rng.choice(vocab) for _ in range(n)]

    bench_ids = [49, 98, 147, 196, 245, 294]
    bench_texts = {i: fresh(60) for i in bench_ids}

    base = fresh(60)
    near = list(base)
    near[5], near[30] = "chg1", "chg2"

    # contaminated: 6 x 8-word borrowed runs + 16 fresh glue words = 64
    contam = []
    for i in bench_ids:
        contam += bench_texts[i][10:18]
    contam += fresh(16)

    rows = []
    clean_ids = []
    next_id = 1
    def add(text_words, doc_id=None):
        nonlocal next_id
        if doc_id is None:
            while next_id % 49 == 0:
                next_id += 1
            doc_id = next_id
            next_id += 1
        t = " ".join(text_words)
        rows.append((doc_id, t, "en", "src0", len(t)))
        return doc_id

    id_base = add(base)
    id_copy = add(list(base))          # exact dup -> non-canonical
    id_near = add(near)                # near dup -> doc_b
    id_lowq = add(fresh(5))            # quality fail (< 20 tokens)
    id_cont = add(contam)              # contaminated >= 0.5
    for i in bench_ids:
        add(bench_texts[i], doc_id=i)  # the benchmark docs themselves
    for _ in range(10):
        clean_ids.append(add(fresh(60)))

    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tmp_path_factory.mktemp("planted-pipe")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return {
        "dir": str(d),
        "drop": {id_copy, id_near, id_lowq, id_cont},
        "bench_ids": bench_ids,
        "n_docs": len(rows),
        "base": id_base,
    }


def test_contamination_gate_fires_without_near_dup_pair(spark, planted):
    contam = REGISTRY["curation_benchmark_contamination"].fn(
        spark, planted["dir"]
    ).collect()
    hot = {r.doc_id: r.contamination for r in contam if r.contamination >= 0.5}
    (cont_id,) = [i for i in planted["drop"] if i in hot]
    # ...and that doc is NOT a Jaccard near-dup of anything
    pairs = REGISTRY["dedup_ngram_jaccard"].fn(spark, planted["dir"]).collect()
    assert all(cont_id not in (p.doc_a, p.doc_b) for p in pairs)


def test_pipeline_drops_exactly_the_planted_violations(spark, planted):
    out = REGISTRY["curation_full_pipeline"].fn(spark, planted["dir"]).collect()
    (row,) = out  # single language
    assert row.n_total == planted["n_docs"]
    # dropped: the 4 planted violations AND the benchmark eval docs
    # themselves (doc_id % 49 == 0) — the held-out set must never end up
    # inside the training corpus (round-5 ADVICE)
    assert row.n_kept == (
        planted["n_docs"] - len(planted["drop"]) - len(planted["bench_ids"])
    )
