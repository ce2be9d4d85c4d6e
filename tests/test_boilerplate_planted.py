"""Planted boilerplate spans: the oracle hash-gate pins arithmetic;
this pins SEMANTICS — a corpus with one known 3-word span shared by
five documents (once twice back-to-back, exercising overlapping
coverage), one span shared by only two documents (below the document
threshold), and fully-unique filler everywhere else. Exactly the
shared-span tokens must be removed, nothing else."""

from __future__ import annotations

import hashlib

import pytest

from stateflow_spark.queries import REGISTRY

SPAN = ["aaa", "bbb", "ccc"]
PAIR_SPAN = ["ddd", "eee", "fff"]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    def filler(d, n, start=0):
        return [f"f{d}_{i}" for i in range(start, start + n)]

    texts = {
        # doc 1 carries the span TWICE back-to-back: two occurrences,
        # six covered tokens, and the self-overlap grams ("ccc aaa bbb")
        # stay unique to this doc so they must NOT become boilerplate
        1: filler(1, 4) + SPAN + SPAN + filler(1, 4, 10) + PAIR_SPAN,
        2: filler(2, 5) + SPAN + filler(2, 5, 10) + PAIR_SPAN,
        3: SPAN + filler(3, 8),
        4: filler(4, 8) + SPAN,
        5: filler(5, 3) + SPAN + filler(5, 6, 10),
        6: filler(6, 12),
        7: filler(7, 12),
        8: filler(8, 12),
    }
    df = spark.createDataFrame(
        [
            (i, " ".join(t), "en", "src0", len(" ".join(t)))
            for i, t in texts.items()
        ]
        # a NULL-text row: dropped by both engines (declared filter)
        + [(99, None, "en", "src0", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tmp_path_factory.mktemp("boiler")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d), texts


def test_boilerplate_spans_removes_exactly_the_shared_span(spark, planted):
    sf_dir, texts = planted
    rows = {
        r.doc_id: r
        for r in REGISTRY["text_boilerplate_spans"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == set(texts)

    span = set(SPAN)
    for doc_id, toks in texts.items():
        r = rows[doc_id]
        expect_clean = [w for w in toks if w not in span]
        if doc_id > 5:
            expect_clean = toks  # untouched
        assert r.n_tokens == len(toks)
        assert r.n_spans == len(toks) - 2
        assert r.cleaned_md5 == _md5(" ".join(expect_clean)), doc_id

    # occurrence + coverage accounting: doc 1 carries it twice
    assert rows[1].n_boiler_occ == 2 and rows[1].n_removed == 6
    for d in (2, 3, 4, 5):
        assert rows[d].n_boiler_occ == 1 and rows[d].n_removed == 3, d
    for d in (6, 7, 8):
        assert rows[d].n_boiler_occ == 0 and rows[d].n_removed == 0, d

    # the two-document span stays: its tokens survive in docs 1 and 2
    assert "ddd" in " ".join(
        w for w in texts[1] if w not in span
    )  # construction sanity


@pytest.fixture(scope="module")
def planted_delta(spark, tmp_path_factory):
    """OLD corpus (doc_id % 5 != 0): docs 1,2,3 share SPAN (>= 3 old
    docs -> stored-hot), docs 6,7 share PAIR_SPAN (2 old docs -> cool).
    DELTA (doc_id % 5 == 0): doc 5 carries SPAN (must be cleaned),
    doc 10 carries PAIR_SPAN (kept), docs 15 and 20 share a
    delta-internal span (kept — per-doc verdicts depend only on the
    STORED counts, the boundary-independent posture)."""
    def filler(d, n, start=0):
        return [f"g{d}_{i}" for i in range(start, start + n)]

    delta_span = ["xxx", "yyy", "zzz"]
    texts = {
        1: filler(1, 4) + SPAN + filler(1, 4, 10),
        2: filler(2, 5) + SPAN,
        3: SPAN + filler(3, 7),
        6: filler(6, 3) + PAIR_SPAN + filler(6, 3, 10),
        7: PAIR_SPAN + filler(7, 6),
        5: filler(5, 4) + SPAN + filler(5, 4, 10),
        10: filler(10, 4) + PAIR_SPAN + filler(10, 4, 10),
        15: filler(15, 4) + delta_span + filler(15, 4, 10),
        20: delta_span + filler(20, 8),
    }
    df = spark.createDataFrame(
        [
            (i, " ".join(t), "en", "src0", len(" ".join(t)))
            for i, t in texts.items()
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tmp_path_factory.mktemp("boiler_delta")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d), texts


def test_boilerplate_delta_classify_uses_stored_counts(
    spark, planted_delta
):
    sf_dir, texts = planted_delta
    rows = {
        r.doc_id: r
        for r in REGISTRY["text_boilerplate_delta_classify"]
        .fn(spark, sf_dir)
        .collect()
    }
    # delta docs only
    assert set(rows) == {5, 10, 15, 20}

    # doc 5: SPAN is stored-hot (3 old docs) -> removed
    assert rows[5].n_boiler_occ == 1 and rows[5].n_removed == 3
    assert rows[5].cleaned_md5 == _md5(
        " ".join(w for w in texts[5] if w not in set(SPAN))
    )
    # doc 10: PAIR_SPAN has only 2 stored docs -> kept
    assert rows[10].n_boiler_occ == 0 and rows[10].n_removed == 0
    assert rows[10].cleaned_md5 == _md5(" ".join(texts[10]))
    # docs 15/20: delta-internal span, zero stored docs -> kept
    for d in (15, 20):
        assert rows[d].n_boiler_occ == 0 and rows[d].n_removed == 0, d
        assert rows[d].cleaned_md5 == _md5(" ".join(texts[d])), d


def test_stream_boilerplate_classify_batch_boundary_independent(
    spark, tmp_path
):
    """stream_boilerplate_delta_classify's docstring claims per-doc
    verdicts depend only on the doc + the stored span counts. Force
    MANY micro-batches (5 source files, maxFilesPerTrigger=1) and pin
    that the union of per-batch outputs equals the single-batch run
    row-for-row — the boilerplate sibling of the minhash/ivf boundary
    tests."""
    import pyspark.sql.functions as F

    from stateflow_spark.catalog import load as cat_load
    from stateflow_spark.queries.text import (
        _boiler_classify_delta,
        _span_count_table,
    )

    sf_dir = "/root/testdata/sf0.001"
    tbl = _span_count_table(spark, sf_dir)
    delta_docs = cat_load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    src = str(tmp_path / "delta_src")
    delta_docs.repartition(5).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out_dir = str(tmp_path / "out")

    def classify(batch_df, _bid):
        _boiler_classify_delta(spark, batch_df, tbl).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(classify)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    streamed = {
        r.doc_id: (r.n_boiler_occ, r.n_removed, r.cleaned_md5)
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        r.doc_id: (r.n_boiler_occ, r.n_removed, r.cleaned_md5)
        for r in REGISTRY["text_boilerplate_delta_classify"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert streamed == batch
