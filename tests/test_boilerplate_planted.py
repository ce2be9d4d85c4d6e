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
