"""Skew handling, demonstrated instead of documented (round-4 VERDICT
"Next round" #5): a deliberately hot shingle (shared boilerplate phrase
across many documents) makes the inverted-index pair expansion quadratic
in the posting length; the stop-shingle cap must bound it.

The corpus is synthetic: `hot_n` docs share one 3-word boilerplate prefix
(one hot shingle with a posting of length hot_n) plus unique tails;
control docs are fully unique. Expansion counts are exact combinatorics,
so the assertions are deterministic — no flaky wall-clock thresholds."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stateflow_spark.queries.dedup import _jaccard_pairs, _shingles_df

HOT_N = 40  # hot posting length → C(40,2) = 780 candidate pairs uncapped


@pytest.fixture(scope="module")
def hot_corpus_dir(spark, tmp_path_factory):
    """documents.parquet where docs 0..HOT_N-1 all start with the same
    3-word boilerplate ('terms of service') and then diverge into unique
    12-word tails; docs 1000..1019 are fully unique controls."""
    d = tmp_path_factory.mktemp("skew") / "sf-hot"
    os.makedirs(d, exist_ok=True)
    rows = []
    for i in range(HOT_N):
        tail = " ".join(f"u{i}w{j}" for j in range(12))
        rows.append((i, f"terms of service {tail}", "en", "synth", 60))
    for i in range(1000, 1020):
        rows.append(
            (i, " ".join(f"c{i}w{j}" for j in range(15)), "en", "synth", 60)
        )
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )
    return str(d)


def _posting_lengths(spark, sf_dir):
    sh = _shingles_df(spark, sf_dir)
    return (
        sh.select(F.explode("shingles").alias("s"))
        .groupBy("s")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )


def _candidate_pairs(spark, sf_dir, cap):
    """Distinct doc pairs sharing >= 1 kept shingle — the candidate set
    the expansion materializes BEFORE the jaccard threshold filter, i.e.
    the quantity hot-shingle skew actually inflates (the public query
    filters by threshold, which would hide the blowup)."""
    sh = _shingles_df(spark, sf_dir)
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    posting = ex.groupBy("s").agg(F.collect_list("doc_id").alias("ds"))
    keep = F.size("ds") > 1
    if cap is not None:
        keep = keep & (F.size("ds") <= cap)
    return (
        posting.filter(keep)
        .select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .count()
    )


def test_hot_shingle_posting_exists(spark, hot_corpus_dir):
    assert _posting_lengths(spark, hot_corpus_dir) == HOT_N


def test_uncapped_expansion_is_quadratic_in_hot_posting(spark, hot_corpus_dir):
    n = _candidate_pairs(spark, hot_corpus_dir, cap=None)
    assert n == HOT_N * (HOT_N - 1) // 2  # 780: every hot pair materialized


def test_stop_shingle_cap_bounds_expansion(spark, hot_corpus_dir):
    """With the cap, the hot posting is dropped whole: zero candidate
    pairs survive (tails are unique), so the worst task's expansion is
    bounded by cap^2/2 per shingle — the 100 TB skew guarantee."""
    assert _candidate_pairs(spark, hot_corpus_dir, cap=4) == 0


def test_capped_jaccard_still_finds_real_near_dups(spark, hot_corpus_dir):
    """The cap must not break recall for pairs whose overlap is NOT
    boilerplate: append two near-identical docs and check the capped run
    still pairs them while the hot posting stays dropped."""
    import tempfile

    d = tempfile.mkdtemp(prefix="skew-neardup-")
    base = " ".join(f"n{j}" for j in range(20))
    rows = [
        (5000, base, "en", "synth", 60),
        (5001, base + " extra", "en", "synth", 60),
    ]
    src = spark.read.parquet(os.path.join(hot_corpus_dir, "documents.parquet"))
    (
        src.union(
            spark.createDataFrame(
                rows,
                "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
            )
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "documents.parquet"))
    )
    out = _jaccard_pairs(spark, d, stop_shingle_cap=4).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}
    assert (5000, 5001) in pairs
    # and no boilerplate-only pair leaked through
    hot_pairs = {p for p in pairs if p[0] < 100 and p[1] < 100}
    assert hot_pairs == set()


def test_aqe_splits_skewed_relational_join(spark):
    """The relational-join skew path: one hot key carrying 30k of 31k fact
    rows. With AQE skew-join thresholds scaled to the test data, the final
    adaptive plan must mark the sort-merge join's skewed side as split
    (`skew=true`) — the runtime mitigation DEPLOY.md names for fact-fact
    joins, demonstrated rather than assumed. (Dedup-side skew is handled
    differently — posting caps, test above — because bucketed pair
    expansion never goes through an exchange AQE could split.)"""
    import pyspark.sql.functions as FF

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        fact = spark.range(60000).select(
            FF.when(FF.col("id") < 58000, FF.lit(7))
            .otherwise(FF.col("id"))
            .alias("k"),
            # payload survives the join (aggregated below), so the hot
            # partition's bytes reflect the skew after column pruning
            FF.concat(FF.lit("x" * 64), FF.col("id")).alias("payload"),
        )
        dim = spark.range(3000).select(
            FF.col("id").alias("k"), FF.lit("d").alias("dv")
        )
        # aggregate on a key DIFFERENT from the join key: a skew split
        # breaks the join output's hash partitioning, so AQE only applies
        # it when the parent doesn't require that partitioning (an
        # aggregate on k directly above the join legally suppresses the
        # split — the same reason skewed BUCKETS can't be split at all,
        # storage.py docstring)
        j = fact.join(dim, "k").groupBy("dv").agg(
            FF.count(FF.lit(1)).alias("n"), FF.max("payload").alias("p")
        )
        j.collect()  # AQE finalizes the plan at execution
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


HOT_RUN = 30  # boilerplate token run shared by the hot docs


@pytest.fixture(scope="module")
def hot_passage_dir(spark, tmp_path_factory):
    """documents.parquet where docs 0..HOT_N-1 all contain the same
    30-token boilerplate passage (every winnow fingerprint selected
    inside it is shared by all HOT_N docs → postings of length HOT_N)
    plus unique 20-token tails; controls are fully unique."""
    d = tmp_path_factory.mktemp("skew_winnow") / "sf-hotrun"
    os.makedirs(d, exist_ok=True)
    passage = " ".join(f"boiler{j}" for j in range(HOT_RUN))
    rows = []
    for i in range(HOT_N):
        tail = " ".join(f"wu{i}t{j}" for j in range(20))
        rows.append((i, f"{passage} {tail}", "en", "synth", 60))
    for i in range(1000, 1020):
        rows.append(
            (i, " ".join(f"wc{i}t{j}" for j in range(25)), "en", "synth", 60)
        )
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )
    return str(d)


def test_winnowing_uncapped_flags_all_hot_pairs(spark, hot_passage_dir):
    """Uncapped: the shared 30-token passage guarantees >= 2 shared
    fingerprints for EVERY hot pair → C(HOT_N, 2) pairs, the quadratic
    expansion a boilerplate passage inflicts."""
    from stateflow_spark.queries.dedup import _winnowing_pairs

    pairs = _winnowing_pairs(spark, hot_passage_dir).collect()
    hot = [p for p in pairs if p.doc_a < 1000 and p.doc_b < 1000]
    assert len(hot) == HOT_N * (HOT_N - 1) // 2
    assert not [p for p in pairs if p.doc_a >= 1000 or p.doc_b >= 1000]


def test_winnowing_posting_cap_bounds_expansion(spark, hot_passage_dir):
    """posting_cap < HOT_N drops the hot-passage postings before pair
    expansion: zero pairs survive (the docs share ONLY boilerplate), and
    the worst task is bounded at cap²/2 pairs per fingerprint."""
    from stateflow_spark.queries.dedup import _winnowing_pairs

    capped = _winnowing_pairs(
        spark, hot_passage_dir, posting_cap=HOT_N - 1
    ).collect()
    assert capped == []


MEGA_BASKET = 200  # one pathological order with 200 distinct parts


@pytest.fixture(scope="module")
def mega_basket_dir(spark, tmp_path_factory):
    """lineitem.parquet with one mega-basket (order 1: MEGA_BASKET
    distinct parts) plus 50 normal 3-item orders — the shape the
    market-basket cap exists for."""
    d = tmp_path_factory.mktemp("skew_basket") / "sf-basket"
    os.makedirs(d, exist_ok=True)
    rows = [(1, 10_000 + p) for p in range(MEGA_BASKET)]
    for o in range(2, 52):
        rows += [(o, 100 + o), (o, 101 + o), (o, 102 + o)]
    spark.createDataFrame(rows, "l_orderkey LONG, l_partkey LONG").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(str(d), "lineitem.parquet"))
    return str(d)


def _basket_pair_count(spark, sf_dir, cap):
    """Total within-basket pair volume BEFORE the support aggregate — the
    quantity a mega-basket inflates quadratically."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    xs = F.array_sort(F.collect_set("l_partkey"))
    if cap is not None:
        xs = F.slice(xs, 1, cap)
    baskets = li.groupBy("l_orderkey").agg(xs.alias("xs"))
    return baskets.select(
        (F.size("xs") * (F.size("xs") - 1) / 2).cast("bigint").alias("np")
    ).agg(F.sum("np")).collect()[0][0]


def test_uncapped_mega_basket_is_quadratic(spark, mega_basket_dir):
    n = _basket_pair_count(spark, mega_basket_dir, cap=None)
    assert n == MEGA_BASKET * (MEGA_BASKET - 1) // 2 + 50 * 3


def test_basket_cap_bounds_expansion(spark, mega_basket_dir):
    """With the cap, the mega-basket contributes at most cap²/2 pairs —
    the worst task's work is constant no matter how hot the hottest
    basket is (the 100 TB guarantee join_market_basket_pairs documents)."""
    from stateflow_spark.queries.joins import _BASKET_CAP

    n = _basket_pair_count(spark, mega_basket_dir, cap=_BASKET_CAP)
    assert n == _BASKET_CAP * (_BASKET_CAP - 1) // 2 + 50 * 3


def test_basket_cap_keeps_normal_baskets_intact(spark, mega_basket_dir):
    """Normal baskets (size ≤ cap) are untouched: their top-support pairs
    come through the capped plan verbatim."""
    from stateflow_spark.queries.joins import join_market_basket_pairs

    out = join_market_basket_pairs(spark, mega_basket_dir).collect()
    # every normal order o contributes pairs among {100+o, 101+o, 102+o};
    # consecutive orders overlap: pair (101+o, 102+o) == (100+(o+1), 101+(o+1))
    # appears in two orders -> support 2 rows exist and lead the top-20
    assert out, "capped plan must still mine normal baskets"
    top = out[0]
    assert top.support == 2


def test_basket_cap_keep_rule_parameterized(spark, tmp_path):
    """Cap SEMANTICS under a cap small enough to truncate (round-8
    ADVICE: the registered default of 100 only bites pathological
    baskets, so the deterministic lowest-part-keys keep-rule is pinned
    here via the parameterized cap instead). One 6-item basket, cap=3:
    the keep set is exactly the 3 LOWEST part keys {1,2,3} and the
    output is exactly their C(3,2) pairs — nothing from the truncated
    tail, and the keep-rule is ordered, not arbitrary."""
    from stateflow_spark.queries.joins import join_market_basket_pairs

    rows = [(1, p) for p in (6, 2, 4, 1, 5, 3)]  # shuffled insert order
    spark.createDataFrame(rows, "l_orderkey LONG, l_partkey LONG").coalesce(
        1
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )
    out = join_market_basket_pairs(spark, str(tmp_path), cap=3).collect()
    got = {(r.part_a, r.part_b, r.support) for r in out}
    assert got == {(1, 2, 1), (1, 3, 1), (2, 3, 1)}
