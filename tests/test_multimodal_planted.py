"""Planted-semantics tests for the round-8 multimodal rows: perceptual-
hash near-dup must recall exactly the planted near-identical payloads,
and cross-modal retrieval must rank a planted matching embedding first.
Ground truth is constructed, not replayed (the oracle gates pin the
arithmetic; these pin the SEMANTICS)."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F  # noqa: F401  (parity w/ siblings)

from stateflow_spark.queries import REGISTRY


def _write_documents(spark, path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(path / "documents.parquet")
    )


@pytest.fixture(scope="module")
def phash_planted(spark, tmp_path_factory):
    """d1 base payload, d2 == d1 (identical media), d3 = d1 with ONE
    visual word changed (flips ≤ 2 parity bits), d4 = d1 with THREE
    words changed (≤ 6 flips — outside hamming 3 unless buckets
    collide), d5-d12 unrelated payloads (~30/60 expected bit distance)."""
    rng = random.Random(21)
    vocab = [f"w{i}" for i in range(800)]
    base = [rng.choice(vocab) for _ in range(80)]
    one = list(base)
    one[7] = "edited-one"
    three = list(base)
    three[3], three[33], three[63] = "eA", "eB", "eC"
    rows = [
        (1, " ".join(base)),
        (2, " ".join(base)),
        (3, " ".join(one)),
        (4, " ".join(three)),
    ] + [
        (i, " ".join(rng.choice(vocab) for _ in range(80)))
        for i in range(5, 13)
    ]
    d = tmp_path_factory.mktemp("phash_planted")
    _write_documents(spark, d, rows)
    return str(d)


def test_phash_identical_payloads_hamming_zero(spark, phash_planted):
    ph = {
        r.doc_id: r.phash
        for r in REGISTRY["multimodal_phash"].fn(spark, phash_planted).collect()
    }
    assert ph[1] == ph[2]  # identical media → identical signature
    assert ph[1] != ph[5]


def test_phash_locality_bounds_bit_flips(spark, phash_planted):
    """One changed word occurrence = one removed + one added bucket hit →
    at most 2 parity flips; three changed words → at most 6."""
    ph = {
        r.doc_id: r.phash
        for r in REGISTRY["multimodal_phash"].fn(spark, phash_planted).collect()
    }
    assert bin(ph[1] ^ ph[3]).count("1") <= 2
    assert bin(ph[1] ^ ph[4]).count("1") <= 6


def test_phash_neardup_recall_and_precision(spark, phash_planted):
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in REGISTRY["multimodal_phash_neardup"]
        .fn(spark, phash_planted)
        .collect()
    }
    assert pairs[(1, 2)] == 0  # identical media
    assert (1, 3) in pairs and (2, 3) in pairs  # one-word edit in radius
    # precision: nothing pairs with the unrelated payloads
    assert all(a <= 4 and b <= 4 for a, b in pairs), pairs


def test_phash_banding_matches_bruteforce(spark, phash_planted):
    """The banded blocking must return EXACTLY the brute-force hamming ≤ 3
    set (pigeonhole recall 1) — checked on the planted corpus."""
    ph = {
        r.doc_id: r.phash
        for r in REGISTRY["multimodal_phash"].fn(spark, phash_planted).collect()
    }
    ids = sorted(ph)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(ph[a] ^ ph[b]).count("1") <= 3
    }
    banded = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["multimodal_phash_neardup"]
        .fn(spark, phash_planted)
        .collect()
    }
    assert banded == brute


def _stub_features(text: str) -> list[float]:
    """Replicates functions/multimodal.fake_decode_features on the utf-8
    payload of ``text`` — the caption-side stub the query runs."""
    digest = hashlib.md5(text.encode("utf-8")).digest()
    return [b / 256.0 for b in digest[:8]]


@pytest.mark.slow
def test_crossmodal_planted_match_ranks_first(spark, tmp_path_factory):
    """Plant ONE embedding whose first 8 dims are exactly 2× the caption's
    stub features (cosine exactly 1 up to decimal rounding) among decoys:
    retrieval must rank it 1 for that caption. Feature values k/256 and
    their doubles are exact in float32, so the plant survives the
    parquet float round-trip."""
    rng = random.Random(5)
    d = tmp_path_factory.mktemp("xmodal_planted")
    rows = [(1, "caption alpha bravo"), (2, "another caption entirely")]
    _write_documents(spark, d, rows)
    feats = _stub_features(rows[0][1])
    planted_vec = [2.0 * f for f in feats] + [0.0] * 56
    embs = [(100, planted_vec, 0)] + [
        (200 + i, [rng.uniform(-1, 1) for _ in range(64)], 1)
        for i in range(10)
    ]
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "embeddings.parquet")
    )
    out = (
        REGISTRY["multimodal_crossmodal_retrieval"].fn(spark, str(d)).collect()
    )
    top = {r.qid: r for r in out if r.rnk == 1}
    assert top[1].neighbor_id == 100
    assert abs(top[1].cosine - 1.0) < 1e-9


def test_audio_vad_planted_segments(spark, tmp_path_factory):
    """Plant a payload with KNOWN loud/silent regions: 32 loud bytes
    ('z' = 122 → frame energy 1952), 32 silent bytes (' ' = 32 → 512),
    32 loud — VAD must emit exactly two voiced segments (frames 0-1 and
    4-5) with exact energies, and an all-silent payload must emit none."""
    d = tmp_path_factory.mktemp("vad_planted")
    rows = [
        (1, "z" * 32 + " " * 32 + "z" * 32),
        (2, " " * 48),  # all silence → no segments
        (3, "z" * 16),  # single loud frame
    ]
    _write_documents(spark, d, rows)
    out = (
        REGISTRY["multimodal_audio_vad_segments"]
        .fn(spark, str(d))
        .collect()
    )
    segs = {
        (r.doc_id, r.start_frame, r.end_frame): (r.n_frames, r.seg_energy)
        for r in out
    }
    loud = 122 * 16  # 1952 per frame
    assert segs == {
        (1, 0, 1): (2, 2 * loud),
        (1, 4, 5): (2, 2 * loud),
        (3, 0, 0): (1, loud),
    }


@pytest.fixture(scope="module")
def afp_planted(spark, tmp_path_factory):
    """d1 base 'clip' (300 pseudo-random sample bytes), d2 == d1
    (identical clip), d3 = d1 with a MEAN-PRESERVING local amplitude
    edit (+1 on a byte in window ~5, -1 on a byte in window ~40: T
    unchanged, at most the two touched windows' bits flip), d4-d11
    unrelated clips (~30/60 expected bit distance)."""
    rng = random.Random(31)

    def clip():
        return "".join(chr(rng.randint(33, 126)) for _ in range(300))

    base = clip()
    edited = list(base)
    # window i covers positions i*300//60 .. (i+1)*300//60 (5 bytes each);
    # +1 in window 5 (pos 27), -1 in window 40 (pos 203) — mean-preserving
    edited[27] = chr(ord(edited[27]) + 1)
    edited[203] = chr(ord(edited[203]) - 1)
    rows = [(1, base), (2, base), (3, "".join(edited))] + [
        (i, clip()) for i in range(4, 12)
    ]
    d = tmp_path_factory.mktemp("afp_planted")
    _write_documents(spark, d, rows)
    return str(d)


def test_audio_fingerprint_identical_clips_hamming_zero(spark, afp_planted):
    fp = {
        r.doc_id: r.afp
        for r in REGISTRY["multimodal_audio_fingerprint"]
        .fn(spark, afp_planted)
        .collect()
    }
    assert fp[1] == fp[2]
    # mean-preserving 2-byte edit flips at most the 2 touched windows
    assert bin(fp[1] ^ fp[3]).count("1") <= 2
    # unrelated clips sit far outside the near-dup radius
    for i in range(4, 12):
        assert bin(fp[1] ^ fp[i]).count("1") > 10


def test_audio_fingerprint_neardup_recall_and_precision(spark, afp_planted):
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in REGISTRY["multimodal_audio_fingerprint_neardup"]
        .fn(spark, afp_planted)
        .collect()
    }
    assert pairs[(1, 2)] == 0  # identical clips recalled at hamming 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 2  # local edit recalled
    assert (2, 3) in pairs  # transitively, same signature distance
    # precision: nothing else within the radius
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}


def test_audio_fingerprint_nn_planted(spark, afp_planted):
    """The r10 driver-scale companion row: per-clip nearest banded
    candidate. The planted near-dup trio must be each other's nearest
    neighbors with the expected distances (1↔2 identical at hamming 0;
    3's nearest is 1 — the min-id tie-break over the equidistant 1/2)."""
    nn = {
        r.doc_id: (r.nn_doc, r.nn_hamming)
        for r in REGISTRY["multimodal_audio_fingerprint_nn"]
        .fn(spark, afp_planted)
        .collect()
    }
    assert nn[1] == (2, 0)
    assert nn[2] == (1, 0)
    assert nn[3][0] in (1, 2) and nn[3][1] <= 2
    # nearest-neighbor distance can never beat the thresholded pair set:
    # any clip with an nn_hamming <= 3 must appear in the neardup row
    neardup_ids = {
        x
        for r in REGISTRY["multimodal_audio_fingerprint_neardup"]
        .fn(spark, afp_planted)
        .collect()
        for x in (r.doc_a, r.doc_b)
    }
    close = {i for i, (_, h) in nn.items() if h <= 2}
    assert close <= neardup_ids


def test_audio_rows_edge_corpus_matches_oracle(spark, tmp_path_factory):
    """Degenerate payloads (empty / sub-frame / exactly-one-frame /
    window-boundary) through BOTH audio rows, Spark vs DuckDB directly:
    Spark's sequence(1, 0) DESCENDS ([1, 0]) where DuckDB's range is
    empty, so an unguarded kernel silently grows phantom frames/bytes on
    an empty clip (round-9 edge audit — the corpus never triggers this;
    this test is the net that keeps it true under future corpora)."""
    import duckdb

    rows = [
        (1, ""),  # empty clip
        (2, "a"),  # single byte
        (3, "short doc"),  # sub-frame
        (4, "x" * 15),  # one byte under the VAD frame
        (5, "y" * 16),  # exactly one frame
        (6, "z" * 61),  # one past the 60-window fingerprint width
    ]
    d = tmp_path_factory.mktemp("audio_edge")
    _write_documents(spark, d, rows)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    for name in (
        "multimodal_audio_fingerprint",
        "multimodal_audio_vad_segments",
    ):
        qd = REGISTRY[name]
        sdf = qd.fn(spark, str(d))
        cols = sorted(sdf.columns)
        srows = sorted(tuple(str(r[c]) for c in cols) for r in sdf.collect())
        dr = con.execute(qd.oracle).fetchall()
        dcols = [c[0] for c in con.description]
        idx = [dcols.index(c) for c in cols]
        drows = sorted(tuple(str(r[i]) for i in idx) for r in dr)
        assert srows == drows, (name, srows[:3], drows[:3])
    # the empty clip's fingerprint exists and is all-zero bits
    fp = {
        r.doc_id: r.afp
        for r in REGISTRY["multimodal_audio_fingerprint"]
        .fn(spark, str(d))
        .collect()
    }
    assert fp[1] == 0
