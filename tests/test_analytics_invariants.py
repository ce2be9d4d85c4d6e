"""Structural invariants for chunking and cohort retention — laws implied
by the definitions, pinned independently of the value-hash oracles."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from stateflow_spark.catalog import load
from stateflow_spark.queries import REGISTRY
from tests.conftest import SF_DIR


@pytest.mark.slow
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


def test_equidepth_histogram_is_balanced_and_ordered(spark):
    rows = sorted(
        REGISTRY["window_equidepth_histogram"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.bucket for r in rows] == list(range(1, 17))
    n_total = load(spark, SF_DIR, "orders").count()
    assert sum(r.n_orders for r in rows) == n_total
    depths = {r.n_orders for r in rows}
    assert max(depths) - min(depths) <= 1  # equi-depth up to NTILE remainder
    for a, b in zip(rows, rows[1:]):  # buckets are value-ordered
        assert a.hi <= b.lo
        assert a.lo <= a.hi


def test_state_runs_collapse_planted_islands(spark, tmp_path):
    """u1: A A A B A A → runs A×3, A×2 (B run of 1 is filtered);
    u2: B B → one run. Boundaries and lengths must be exact."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    ev = [
        (i + 1, t0 + dt.timedelta(minutes=i), uid, et, 1.0, "{}")
        for i, (uid, et) in enumerate(
            [(1, "A"), (1, "A"), (1, "A"), (1, "B"), (1, "A"), (1, "A"),
             (2, "B"), (2, "B")]
        )
    ]
    df = spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    rows = REGISTRY["events_state_runs"].fn(spark, str(tmp_path)).collect()
    got = {
        (r.user_id, r.event_type, r.first_event_id): (
            r.run_len, r.run_start.minute, r.run_end.minute
        )
        for r in rows
    }
    assert got == {
        (1, "A", 1): (3, 0, 2),
        (1, "A", 5): (2, 4, 5),
        (2, "B", 7): (2, 6, 7),
    }


def test_pareto_frontier_planted_dominance(spark, tmp_path):
    """Planted 2-D skyline: (price, size) with known dominance structure,
    including an equal-(price,size) pair that must BOTH survive (no
    strict inequality → no dominance) and an equal-price larger-size row
    that must not."""
    rows = [
        # key, price, size
        (1, 100.0, 5),   # frontier
        (2, 100.0, 5),   # identical twin of 1 → also frontier
        (3, 100.0, 9),   # same price as 1 but bigger → dominated
        (4, 90.0, 3),    # frontier (cheaper but smaller)
        (5, 90.0, 6),    # dominated by 1 (higher price, smaller size)
        (6, 80.0, 3),    # dominated by 4 (higher price, same size)
        (7, 70.0, 1),    # frontier (smallest size)
        (8, 110.0, 50),  # frontier (highest price)
    ]
    df = spark.createDataFrame(
        [(k, f"part{k}", "b", "t", s, p) for k, p, s in rows],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "part.parquet")
    )
    got = {
        r.p_partkey
        for r in REGISTRY["window_pareto_frontier"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {1, 2, 4, 7, 8}


def test_market_basket_planted_supports(spark, tmp_path):
    """Orders {1,2,3}, {1,2}, {1,2,4,4} → support(1,2)=3 top pair;
    repeated part within an order counts once."""
    li = [
        (100, 1), (100, 2), (100, 3),
        (200, 1), (200, 2),
        (300, 1), (300, 2), (300, 4), (300, 4),
    ]
    df = spark.createDataFrame(li, "l_orderkey long, l_partkey long")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    rows = [
        ((r.part_a, r.part_b), r.support)
        for r in REGISTRY["join_market_basket_pairs"]
        .fn(spark, str(tmp_path))
        .collect()
    ]
    assert rows[0] == ((1, 2), 3)
    assert dict(rows) == {
        (1, 2): 3, (1, 3): 1, (2, 3): 1, (1, 4): 1, (2, 4): 1,
    }


@pytest.mark.slow
@pytest.mark.parametrize("n", [15, 16, 17, 33, 100])
def test_equidepth_rank_arithmetic_equals_native_ntile(spark, tmp_path, n):
    """The distributed rank→bucket arithmetic must reproduce Spark's own
    NTILE(16) for awkward N (remainder 15, 0, 1, ...) — the remainder
    rule is the easy thing to get off by one."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(i, float(900 + 7 * i % 1000))
         for i in range(1, n + 1)],
        "o_orderkey long, o_totalprice double",
    )
    d = tmp_path / f"n{n}"
    d.mkdir()
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    mine = {
        r.bucket: r.n_orders
        for r in REGISTRY["window_equidepth_histogram"]
        .fn(spark, str(d))
        .collect()
    }
    native = {
        r.bucket: r.n
        for r in df.select(
            F.ntile(16)
            .over(Window.orderBy("o_totalprice", "o_orderkey"))
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert mine == native


def test_ols_trend_recovers_planted_line(spark, tmp_path):
    """Events lying exactly on y = 3.0 + 2.0·x_hours must come back with
    slope 2.0 and intercept 3.0 bit-exactly (zero residual → the
    closed-form solve is exact even in doubles)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    ev = [
        (i + 1, t0 + dt.timedelta(hours=h), 1, "lin", 3.0 + 2.0 * h, "{}")
        for i, h in enumerate([0, 1, 2, 5, 9, 17])
    ]
    df = spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    r = REGISTRY["agg_group_ols_trend"].fn(spark, str(tmp_path)).collect()
    assert len(r) == 1
    assert r[0].slope_per_hour == 2.0
    assert r[0].intercept == 3.0
    assert r[0].n == 6 and r[0].sx == 34


def test_series_correlation_recovers_planted_relationships(spark, tmp_path):
    """Three planted hourly series: b = 2a (r = +1 exactly), c = -a + 100
    (r = -1 exactly); the (a,b)/(a,c)/(b,c) pairs must come back ±1.0
    bit-exactly (perfectly linear data → the closed-form r is exact in
    doubles: numerator and the sqrt'd product are the same integers)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    a_vals = [3.0, 7.0, 4.0, 9.0, 1.0, 6.0]
    ev = []
    eid = 0
    for h, a in enumerate(a_vals):
        for etype, v in (("a", a), ("b", 2 * a), ("c", 100 - a)):
            eid += 1
            ev.append((eid, t0 + dt.timedelta(hours=h), 1, etype, v, "{}"))
    df = spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    r = {
        (x.type_a, x.type_b): x
        for x in REGISTRY["agg_series_correlation"].fn(spark, str(tmp_path))
        .collect()
    }
    assert set(r) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert all(x.n_hours == 6 for x in r.values())
    assert r[("a", "b")].pearson_r == 1.0
    assert r[("a", "c")].pearson_r == -1.0
    assert r[("b", "c")].pearson_r == -1.0


def test_ab_test_zscore_recovers_planted_effect(spark, tmp_path):
    """Planted experiment: 6 even users (variant A) of whom 4 convert
    (more purchases than errors), 6 odd users (B) of whom 1 converts.
    The z statistic must equal the hand-computed two-proportion value
    from the same four integers — and its sign must favor A."""
    import datetime as dt
    import math

    t0 = dt.datetime(2024, 1, 1)
    ev = []
    eid = 0

    def add(uid, etype, n):
        nonlocal eid
        for i in range(n):
            eid += 1
            ev.append((eid, t0 + dt.timedelta(minutes=eid), uid, etype, 1.0, "{}"))

    for uid in (0, 2, 4, 6):  # variant A converters
        add(uid, "purchase", 3), add(uid, "error", 1)
    for uid in (8, 10):  # variant A non-converters
        add(uid, "purchase", 1), add(uid, "error", 2)
    add(1, "purchase", 5)  # variant B converter
    for uid in (3, 5, 7, 9, 11):  # variant B non-converters
        add(uid, "error", 3)
    df = spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    r = REGISTRY["agg_ab_test_zscore"].fn(spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (6, 4, 6, 1)
    pa, pb, pp = 4 / 6, 1 / 6, 5 / 12
    want = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / 6 + 1 / 6))
    assert r.z_score == want and r.z_score > 0


def test_table_checksum_detects_single_row_mutation(spark, tmp_path):
    """The audit digest must (a) be invariant to partitioning/order and
    (b) change when exactly ONE row's quantity moves by one cent — the
    migration-verification property the operator exists for."""
    src = load(spark, SF_DIR, "lineitem")
    base = {
        r.l_returnflag: (r.n, r.xor_checksum, r.modsum_checksum)
        for r in REGISTRY["agg_table_checksum"].fn(spark, SF_DIR).collect()
    }

    # (a) rewrite the same rows into 7 shuffled partitions → same digests
    src.repartition(7).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    re_read = {
        r.l_returnflag: (r.n, r.xor_checksum, r.modsum_checksum)
        for r in REGISTRY["agg_table_checksum"].fn(spark, str(tmp_path)).collect()
    }
    assert re_read == base

    # (b) mutate the probe rows by one cent → exactly the flag groups
    # containing them change, all others stay bit-identical. (synthetic
    # lineitem does not keep (orderkey, linenumber) unique, so derive the
    # expected changed groups from the data)
    probe = src.select("l_orderkey", "l_linenumber").first()
    cond = (F.col("l_orderkey") == probe[0]) & (
        F.col("l_linenumber") == probe[1]
    )
    expect_changed = {
        r.l_returnflag for r in src.filter(cond).select("l_returnflag").collect()
    }
    mutated = src.withColumn(
        "l_quantity",
        F.when(cond, F.col("l_quantity") + 0.01).otherwise(F.col("l_quantity")),
    )
    d2 = str(tmp_path / "mut")
    mutated.write.mode("overwrite").parquet(d2 + "/lineitem.parquet")
    mut = {
        r.l_returnflag: (r.n, r.xor_checksum, r.modsum_checksum)
        for r in REGISTRY["agg_table_checksum"].fn(spark, d2).collect()
    }
    changed = {f for f in base if mut[f] != base[f]}
    assert changed == expect_changed and changed, (base, mut)
    for f in changed:
        assert mut[f][0] == base[f][0]  # same count — content diff, not loss
        assert mut[f][1] != base[f][1] and mut[f][2] != base[f][2]


def test_exact_percentiles_match_direct_computation(spark, tmp_path):
    """The lower-discrete-quantile definition against an independent
    ground truth: for a hand-built events table spanning awkward sizes
    (n = 1, 2, 7, 100 per type), each reported percentile must equal
    sorted(values)[ceil(q*n) - 1] computed directly in Python."""
    import datetime as dt
    import math
    import random

    rng = random.Random(13)
    t0 = dt.datetime(2024, 1, 1)
    sizes = {"one": 1, "two": 2, "seven": 7, "hundred": 100}
    ev, eid = [], 0
    vals = {}
    for etype, n in sizes.items():
        vals[etype] = [round(rng.uniform(0, 500), 2) for _ in range(n)]
        for v in vals[etype]:
            eid += 1
            ev.append((eid, t0 + dt.timedelta(minutes=eid), 1, etype, v, "{}"))
    spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r.event_type: r
        for r in REGISTRY["agg_exact_percentiles"].fn(spark, str(tmp_path))
        .collect()
    }
    assert set(got) == set(sizes)
    for etype, n in sizes.items():
        s = sorted(vals[etype])
        r = got[etype]
        assert r.n == n
        for q, col in ((0.50, "p50"), (0.90, "p90"), (0.99, "p99")):
            want = s[math.ceil(q * n) - 1]
            assert getattr(r, col) == want, (etype, col, getattr(r, col), want)


def test_source_drift_is_a_distance(spark):
    rows = REGISTRY["text_source_drift"].fn(spark, SF_DIR).collect()
    assert len(rows) == 20
    docs = load(spark, SF_DIR, "documents")
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).first().t
    assert sum(r.n_tokens for r in rows) == total_tokens
    for r in rows:
        # TV distance is a probability-mass difference: bounded [0, 1),
        # and the exact integer numerator reproduces the double ratio
        assert 0.0 <= r.tv_distance < 1.0
        assert r.tv_num >= 0
        denom = 2.0 * float(r.n_tokens) * float(total_tokens)
        assert abs(r.tv_distance - r.tv_num / denom) < 1e-15


def test_quality_classifier_replays_hash_math(spark, tmp_path):
    """The hashed-feature linear scorer is replayed in plain Python
    (hashlib.md5) on a tiny constructed corpus — pins bucket derivation,
    weight lookup, bigram construction and the keep/drop gate without
    DuckDB in the loop."""
    import hashlib

    docs = [
        (1, "alpha beta gamma", "en", "s", 16),
        (2, "solo", "en", "s", 4),
        (3, "x y x y x", "de", "s", 9),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )

    def w(feat: str) -> int:
        bucket = int(hashlib.md5(feat.encode()).hexdigest()[:3], 16)
        return int(hashlib.md5(f"w{bucket}".encode()).hexdigest()[:4], 16) % 2001 - 1000

    def expected(text: str):
        toks = text.split(" ")
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        score = sum(w(f) for f in feats)
        return len(feats), score

    out = {
        r.doc_id: r
        for r in REGISTRY["text_quality_classifier"].fn(spark, str(tmp_path)).collect()
    }
    for doc_id, text, *_ in docs:
        n, score = expected(text)
        r = out[doc_id]
        assert (r.n_features, r.score) == (n, score), (doc_id, r)
        assert r.mean_score == score / n
        assert r.label == ("keep" if score / n >= 0 else "drop")


def test_scd2_versions_form_contiguous_intervals(spark):
    """SCD-2 laws: per key, version numbers are 1..n, intervals chain
    (eff_to == next eff_from), exactly one open/current version, and no
    two consecutive versions carry the same attribute value (SCD-2 never
    writes a no-change row)."""
    rows = REGISTRY["scd2_dimension_versions"].fn(spark, SF_DIR).collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.custkey, []).append(r)
    assert by_key
    for key, vs in by_key.items():
        vs.sort(key=lambda r: r.version_nr)
        assert [v.version_nr for v in vs] == list(range(1, len(vs) + 1)), key
        for a, b in zip(vs, vs[1:]):
            assert a.eff_to == b.eff_from, (key, a, b)
            assert a.attr_value != b.attr_value, (key, a, b)
            assert not a.is_current
        assert vs[-1].is_current and vs[-1].eff_to is None, key


def _ref_bpe(words: list, steps: int):
    """Greedy reference BPE (Sennrich 2016 pseudocode, deterministic
    count-desc/pair-asc tiebreak) — the sequential ground truth for the
    distributed trainer, including overlapping-run merge semantics."""
    from collections import Counter

    vocab = Counter(words)
    syms = {w: list(w) for w in vocab}
    merges = []
    for _ in range(steps):
        pc = Counter()
        for w, f in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def test_bpe_training_matches_sequential_reference(spark, tmp_path):
    """The distributed trainer's positional odd-streak merge application
    must reproduce greedy sequential BPE exactly — stressed with
    single-char runs (aaaa...) where merge occurrences overlap and the
    parity rule is load-bearing."""
    import random

    rng = random.Random(7)
    words = ["a" * rng.randint(1, 7) for _ in range(40)] + [
        "".join(rng.choice("abc") for _ in range(rng.randint(1, 8)))
        for _ in range(200)
    ]
    docs = []
    idx = 0
    for doc_id in range(24):
        take = words[idx: idx + 10]
        idx += 10
        docs.append((doc_id, " ".join(take), "en", "s", len(" ".join(take))))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    expected = _ref_bpe([w for d in docs for w in d[1].split(" ")], 6)
    got = sorted(
        (r.step, r.sym_a, r.sym_b, r.pair_count)
        for r in REGISTRY["text_bpe_train_merges"].fn(spark, str(tmp_path)).collect()
    )
    assert got == [
        (k + 1, a, b, c) for k, (a, b, c) in enumerate(expected)
    ], (got, expected)


def test_bpe_compression_decreases_by_exactly_pair_counts(spark):
    """Each merge shrinks total symbol mass by exactly the merged pair's
    count — the law linking the compression curve to the merge table."""
    merges = {
        r.step: r.pair_count
        for r in REGISTRY["text_bpe_train_merges"].fn(spark, SF_DIR).collect()
    }
    curve = {
        r.step: r
        for r in REGISTRY["text_bpe_compression"].fn(spark, SF_DIR).collect()
    }
    assert set(curve) == set(range(0, len(merges) + 1))
    assert curve[0].total_symbols == curve[0].total_chars
    for k in sorted(merges):
        assert (
            curve[k].total_symbols
            == curve[k - 1].total_symbols - merges[k]
        ), (k, curve[k], merges[k])


def test_attribution_planted_touch_sequence(spark, tmp_path):
    """Constructed journey: touches inside/outside the 7-day window, a
    same-microsecond tie broken by event_id, and an organic conversion
    with no touch — each pinned by hand."""
    import datetime as dt

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    def us(**kw):
        return t0 + dt.timedelta(**kw)

    rows = [
        # user 1: click 8 days before (OUT of window), view 2 days
        # before (first touch), click 1 hour before (last touch)
        (100, us(days=-8), 1, "click", 0.0, "{}"),
        (101, us(days=-2), 1, "view", 0.0, "{}"),
        (102, us(hours=-1), 1, "click", 0.0, "{}"),
        (103, us(), 1, "purchase", 9.99, "{}"),
        # user 2: two touches at the SAME microsecond -> event_id breaks
        # the tie (14 < 15 for first; 15 > 14 for last)
        (14, us(minutes=-5), 2, "view", 0.0, "{}"),
        (15, us(minutes=-5), 2, "click", 0.0, "{}"),
        (16, us(), 2, "purchase", 1.0, "{}"),
        # user 3: organic (only a signup before) -> NULL attribution
        (30, us(days=-1), 3, "signup", 0.0, "{}"),
        (31, us(), 3, "purchase", 5.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.user_id: r
        for r in REGISTRY["events_attribution"].fn(spark, str(tmp_path)).collect()
    }
    assert out[1].first_touch_event_id == 101  # the -8d click is excluded
    assert out[1].first_touch_type == "view"
    assert out[1].last_touch_event_id == 102
    assert out[1].last_touch_type == "click"
    assert out[2].first_touch_event_id == 14
    assert out[2].last_touch_event_id == 15
    assert out[3].first_touch_event_id is None
    assert out[3].last_touch_type is None


def test_bpe_apply_consistent_with_compression_curve(spark):
    """Corpus-wide BPE token mass from the APPLY side must equal the
    final step of the training curve (train and apply share the vocab),
    and no document can gain tokens."""
    curve = {
        r.step: r.total_symbols
        for r in REGISTRY["text_bpe_compression"].fn(spark, SF_DIR).collect()
    }
    rows = REGISTRY["text_bpe_apply"].fn(spark, SF_DIR).collect()
    assert sum(r.n_tokens_bpe for r in rows) == curve[max(curve)]
    # law: every word keeps >= 1 symbol, so a doc's BPE token count is
    # bounded below by its whitespace token count
    assert all(r.n_tokens_bpe >= r.n_tokens_ws for r in rows)


def test_stream_scd2_collapses_repeats_across_batch_seams(spark, tmp_path):
    """A key observing the SAME value at the end of one micro-batch and
    the start of the next must NOT open a new version (the cross-batch
    collapse is where an incremental SCD-2 merge goes wrong); a changed
    value across the seam must. Dates span 90 days so the tercile files
    put the seam observations in different triggers."""
    import datetime as dt

    d0 = dt.date(2024, 1, 1)
    rows = [
        # key 1: URGENT in tercile 0 (days 0, 29) and again in tercile 1
        # (day 31) -> still ONE version; changes to LOW in tercile 2
        (101, 1, d0, "URGENT"),
        (102, 1, d0 + dt.timedelta(days=29), "URGENT"),
        (103, 1, d0 + dt.timedelta(days=31), "URGENT"),
        (104, 1, d0 + dt.timedelta(days=75), "LOW"),
        # key 2: changes exactly at the seam
        (201, 2, d0 + dt.timedelta(days=29), "HIGH"),
        (202, 2, d0 + dt.timedelta(days=31), "MEDIUM"),
        (203, 2, d0 + dt.timedelta(days=89), "MEDIUM"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate date,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = sorted(
        (
            (r.custkey, r.version_nr, r.attr_value, r.is_current)
            for r in REGISTRY["stream_scd2_merge"].fn(spark, str(tmp_path)).collect()
        )
    )
    assert out == [
        (1, 1, "URGENT", False),
        (1, 2, "LOW", True),
        (2, 1, "HIGH", False),
        (2, 2, "MEDIUM", True),
    ], out


def test_memorization_audit_finds_planted_quote(spark, tmp_path):
    """An 8-token passage quoted verbatim in 5 otherwise-unrelated docs
    must top the census with n_docs = 5; a passage REPEATED twice inside
    ONE doc counts once (distinct-doc semantics)."""
    quote = "alpha beta gamma delta epsilon zeta eta theta"
    docs = []
    for i in range(5):
        filler = " ".join(f"u{i}w{j}" for j in range(6))
        docs.append((i, f"{filler} {quote}", "en", "s", 1))
    # doc 10 repeats a different 8-gram twice -> still n_docs = 1
    rep = "one two three four five six seven eight"
    docs.append((10, f"{rep} {rep}", "en", "s", 1))
    for j in range(20, 40):
        docs.append((j, " ".join(f"z{j}x{k}" for k in range(12)), "en", "s", 1))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = REGISTRY["text_memorization_audit"].fn(spark, str(tmp_path)).collect()
    assert rows[0].gram == quote and rows[0].n_docs == 5
    by_gram = {r.gram: r.n_docs for r in rows}
    assert by_gram.get(rep, 1) == 1


def test_winsorized_mean_bounds_a_planted_outlier(spark, tmp_path):
    """One absurd outlier moves the plain mean but the winsorized mean
    stays at the bulk's level; both equal the direct computation."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    vals = [10.0] * 98 + [11.0, 100000.0]  # bulk at 10-11, one fat finger
    rows = [
        (i, t0 + dt.timedelta(seconds=i), 1, "purchase", v, "{}")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = REGISTRY["agg_winsorized_mean"].fn(spark, str(tmp_path)).collect()[0]
    assert r.n == 100
    assert r.p05 == 10.0 and r.p95 == 10.0
    # direct replay: clip to [10, 10] -> all 10
    assert r.mean_winsorized == 10.0
    assert r.mean_plain == sum(vals) / 100
    assert r.mean_plain > 1000 > r.mean_winsorized


def test_table_diff_partitions_keys_and_counts_each_class(spark):
    """Diff classes partition the key space; every class is nonzero on
    the synthesized mutation set, and the only mutated column is price."""
    r = REGISTRY["profile_table_diff"].fn(spark, SF_DIR).collect()[0]
    assert r.n_keys == r.n_added + r.n_removed + r.n_changed + r.n_identical
    assert min(r.n_added, r.n_removed, r.n_changed, r.n_identical) > 0
    assert r.n_price_changed == r.n_changed


def test_point_in_time_join_never_leaks_future_attributes(spark):
    """PIT law: every fact's attr_at_time equals the SCD-2 version whose
    [eff_from, eff_to) interval covers the fact date (replayed against
    the registered dimension build); no fact reads a version that opens
    after its date."""
    dim = REGISTRY["scd2_dimension_versions"].fn(spark, SF_DIR).collect()
    by_key: dict[int, list] = {}
    for v in dim:
        by_key.setdefault(v.custkey, []).append(v)
    facts = REGISTRY["join_point_in_time_scd2"].fn(spark, SF_DIR).collect()
    assert facts
    checked = 0
    for f in facts[:500]:
        vs = sorted(by_key[f.custkey], key=lambda v: v.version_nr)
        covering = [
            v for v in vs
            if v.eff_from <= f.asof_date
            and (v.eff_to is None or f.asof_date < v.eff_to)
        ]
        assert len(covering) == 1, (f, covering)
        assert f.attr_at_time == covering[0].attr_value, (f, covering[0])
        checked += 1
    assert checked == min(500, len(facts))


def test_bpe_degenerate_corpus_stops_cleanly(spark, tmp_path):
    """Round-6 ADVICE: a corpus of single-character words exhausts the
    pair space before step 1 — the trainer must stop (empty merge table)
    instead of crossJoining an empty winner and silently emptying the
    vocab; the APPLY side must still tokenize every word."""
    docs = [(i, "a b c a b", "en", "s", 9) for i in range(4)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    merges = REGISTRY["text_bpe_train_merges"].fn(spark, str(tmp_path)).collect()
    assert merges == []
    applied = REGISTRY["text_bpe_apply"].fn(spark, str(tmp_path)).collect()
    assert len(applied) == 4  # every doc still tokenizes


def test_band_neighbors_histogram_edge_cases(spark, tmp_path):
    """The histogram + range-frame rewrite of join_band_price_neighbors
    must reproduce the textbook pair semantics on engineered edges:
    exact ±50 boundary inclusion, self-cent exclusion with and without a
    twin at the same price, and zero-match parts dropped (inner-join
    semantics of the oracle)."""
    rows = [
        (1, 10.00),   # pc 1000; neighbors: 2 (twin), 3 (+50 boundary)
        (2, 10.00),   # twin of 1
        (3, 10.50),   # pc 1050: in range of 1/2 (+50) and 4 (+50)
        (4, 11.00),   # pc 1100: neighbor 3 only (1/2 are -100, out)
        (5, 99.99),   # pc 9999: isolated -> must NOT appear
    ]
    spark.createDataFrame(
        rows, "p_partkey long, p_retailprice double"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "part.parquet")
    )
    got = {
        r.p_partkey: (r.n_matches, r.band_min_cents, r.band_max_cents)
        for r in REGISTRY["join_band_price_neighbors"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {
        1: (2, 1000, 1050),  # twin at own cent + boundary neighbor
        2: (2, 1000, 1050),
        3: (3, 1000, 1100),  # both sides of the band
        4: (1, 1050, 1050),  # single neighbor, no twin at own cent
    }
