"""Edge-corpus oracle sweep: per-document kernels over DEGENERATE inputs.

The driver's testdata never contains empty / one-word / whitespace-edge
documents, so a kernel that silently diverges on them (the round-9 audit
found two: Spark's sequence(lo, hi) DESCENDS when hi < lo where DuckDB's
range is empty, and DuckDB's list_reduce raises on the empty list) stays
green until a future corpus triggers it. This sweep runs a cross-section
of per-doc kernels — one per expression family: hashing, tokenization,
binning, classification, FIM, chunking, bigram LM — over a planted
degenerate corpus and compares Spark against each query's OWN registered
oracle directly.
"""

from __future__ import annotations

import os

import pytest

from stateflow_spark.queries import REGISTRY

EDGE_ROWS = [
    (1, ""),  # empty document
    (2, "a"),  # single char
    (3, "one"),  # single word (no bigrams)
    (4, "two words"),
    (5, "x" * 200),  # one long token
    (6, "a b"),
    (7, " leading"),  # leading space → empty first token
    (8, "trailing "),
    (9, "double  space"),  # empty middle token
]

EDGE_QUERIES = [
    "text_fingerprint",
    "text_lang_id",
    "text_length_histogram",
    "text_token_stats",
    "text_quality_score",
    "text_quality_classifier",
    "text_rolling_fingerprint",  # all docs below the 8-token window: empty
    "text_bpe_token_count",
    "text_ngram_lm_score",  # one-word docs: the round-9 size(t)>=2 guard
    "text_chunking",
    "text_fim_split",
    "dedup_exact",
    "dedup_normalized",
    "dedup_simhash",
    "curation_length_buckets",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_corpus")
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in EDGE_ROWS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


@pytest.fixture(scope="module")
def edge_con(edge_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(edge_dir, 'documents.parquet')}/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_corpus_matches_oracle(spark, edge_dir, edge_con, name):
    qd = REGISTRY[name]
    sdf = qd.fn(spark, edge_dir)
    cols = sorted(sdf.columns)
    srows = sorted(tuple(str(r[c]) for c in cols) for r in sdf.collect())
    dr = edge_con.execute(qd.oracle).fetchall()
    dcols = [c[0] for c in edge_con.description]
    idx = [dcols.index(c) for c in cols]
    drows = sorted(tuple(str(r[i]) for i in idx) for r in dr)
    assert srows == drows, (name, srows[:3], drows[:3])


EDGE_EMB_QUERIES = [
    "dedup_embedding_cosine",
    "dedup_semantic",
    "dedup_semantic_scaled",
    "sim_knn_join",
    "sim_ivf_knn_join",
    "sim_hard_negatives",
    "sim_cosine_topk",
    "sim_centroid_distance",
    "sim_hyperplane_lsh",
    "sim_ivf_topk",
    "sim_ivfpq_topk",
    "sim_quantized_topk",
    "sim_pq_adc_topk",
    "sim_range_search",
    "sim_mmr_diverse_topk",
]


@pytest.fixture(scope="module")
def edge_emb_dir(spark, tmp_path_factory):
    """Embeddings with ZERO vectors (a failed encoder's all-zero rows),
    denormal norms, and exact-duplicate vectors: round 9 found one
    zero-norm row killed four cosine queries with ANSI DIVIDE_BY_ZERO
    (while DuckDB's NaN-compares-greatest would have called every
    zero-pair similar). Convention now: zero vectors are similar to
    nothing (cosine_ge_banded guard + `n2 > 0` in query and oracle)."""
    import random

    rng = random.Random(7)

    def vec():
        return [rng.uniform(-1, 1) for _ in range(64)]

    v1 = vec()
    rows = [
        (1, v1, "labA"), (2, list(v1), "labA"),  # exact duplicate pair
        (3, [0.0] * 64, "labB"), (4, [0.0] * 64, "labB"),  # zero vectors
        (5, [1e-300] * 64, "labC"),  # denormal norms
        (6, vec(), "labC"), (7, vec(), "labD"), (8, vec(), "labD"),
    ] + [(i, vec(), f"lab{i}") for i in range(9, 30)]
    d = tmp_path_factory.mktemp("edge_emb")
    spark.createDataFrame(
        [(i, v, lab) for i, v, lab in rows],
        "vec_id long, embedding array<double>, label string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


@pytest.fixture(scope="module")
def edge_emb_con(edge_emb_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{os.path.join(edge_emb_dir, 'embeddings.parquet')}/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", EDGE_EMB_QUERIES)
def test_edge_embeddings_match_oracle(spark, edge_emb_dir, edge_emb_con, name):
    qd = REGISTRY[name]
    sdf = qd.fn(spark, edge_emb_dir)
    cols = sorted(sdf.columns)
    srows = sorted(tuple(str(r[c]) for c in cols) for r in sdf.collect())
    dr = edge_emb_con.execute(qd.oracle).fetchall()
    dcols = [c[0] for c in edge_emb_con.description]
    idx = [dcols.index(c) for c in cols]
    drows = sorted(tuple(str(r[i]) for i in idx) for r in dr)
    assert srows == drows, (name, srows[:3], drows[:3])
    # the planted exact-duplicate pair must survive every similarity row
    if name == "dedup_embedding_cosine":
        assert ("1", "2") in {(r[1], r[2]) for r in srows} or any(
            r[1] == "1" and r[2] == "2" for r in srows
        )
