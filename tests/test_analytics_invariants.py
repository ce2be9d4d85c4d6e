"""Structural invariants for chunking and cohort retention — laws implied
by the definitions, pinned independently of the value-hash oracles."""

from __future__ import annotations

import pyspark.sql.functions as F

from stateflow_spark.catalog import load
from stateflow_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def test_chunking_covers_every_token_exactly(spark):
    chunks = REGISTRY["text_chunking"].fn(spark, SF_DIR).collect()
    docs = {
        r.doc_id: r.n
        for r in load(spark, SF_DIR, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    assert set(by_doc) == set(docs)
    for doc_id, cs in by_doc.items():
        n = docs[doc_id]
        cs.sort(key=lambda c: c.chunk_idx)
        # chunk_idx contiguous from 0; starts at stride spacing
        assert [c.chunk_idx for c in cs] == list(range(len(cs)))
        assert all(c.start_tok == c.chunk_idx * 32 for c in cs)
        # full coverage: the last chunk reaches the final token, and with
        # 64-wide windows at stride 32 consecutive chunks overlap, so no
        # token between chunks is ever skipped
        last = cs[-1]
        assert last.start_tok + last.n_tok == n
        for a, b in zip(cs, cs[1:]):
            assert b.start_tok < a.start_tok + a.n_tok  # overlap
        # every token counted once or twice, never more
        total = sum(c.n_tok for c in cs)
        assert n <= total <= 2 * n


def test_cohort_week_zero_equals_cohort_size(spark):
    """A user's signup event is itself activity in week 0, so week-0
    active counts must equal the cohort's distinct signup users."""
    rows = REGISTRY["events_retention_cohorts"].fn(spark, SF_DIR).collect()
    week0 = {r.cohort_week: r.n_active_users for r in rows if r.week_n == 0}
    cohorts = {
        r.cohort_week: r.n
        for r in load(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
        .groupBy(F.date_trunc("week", "t0").alias("cohort_week"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert week0 == cohorts
    # retention never exceeds the cohort and week numbers are sane
    for r in rows:
        assert 0 <= r.week_n
        assert r.n_active_users <= cohorts[r.cohort_week]
