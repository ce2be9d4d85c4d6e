"""Training-data curation queries over `documents` — the dataset-assembly
surface a 100 TB pretraining pipeline needs on top of dedup/similarity/text:
sequence packing, benchmark-contamination checking, deterministic stratified
sampling, data-driven mixture balancing, and the composed end-to-end
pipeline (curation_full_pipeline) that chains them with the dedup family.

All sampling is HASH-threshold based (md5 of the doc key), never rand():
deterministic, partitioning-independent, reproducible across engines — the
DuckDB oracle replays the identical hash arithmetic, so the sampling
decision itself is hash-gated, not just the aggregate shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stateflow_spark.catalog import load
from stateflow_spark.queries.common import register
from stateflow_spark.queries.dedup import (
    _CAPPED_PAIR_CTES,
    _MINHASH_ORACLE,
    _SHINGLE_SQL,
    _STOP_SHINGLE_CAP,
    _jaccard_pairs,
    _shingles_df,
)

PACK_BUDGET = 256  # tokens per packed training sequence
PACK_BUCKET = 64  # doc_ids per prefix-sum bucket

# Engine-independent uniform bucket in [0, 100): first 8 hex chars of
# md5(doc_id-as-string) → int → % 100. Spark side uses conv(); DuckDB
# replays it per hex digit (no hex→int builtin there).
_BUCKET_SQL = """list_reduce(list_transform(range(1, 9),
        i -> CAST(strpos('0123456789abcdef',
                         substr(md5(CAST(doc_id AS VARCHAR)), i, 1))
                  - 1 AS BIGINT)),
        (a, b) -> a * 16 + b) % 100"""


def _bucket100() -> F.Column:
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )


@register(
    "curation_pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_excl
        FROM t
    )
    SELECT CAST(cum_excl // {PACK_BUDGET} AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
           CAST(SUM(n_tokens) AS DOUBLE) / {PACK_BUDGET}.0 AS fill_ratio
    FROM c GROUP BY 1
    """,
    tags=("curation", "packing", "bench"),
)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs (in doc_id order) to fixed token-budget
    packs via exclusive running token count — pack_id = cum_excl // budget,
    i.e. a doc belongs to the pack where it starts.

    Scale shape: the naive form is one global window (ORDER BY doc_id over
    the whole corpus → single task). This is the classic DISTRIBUTED PREFIX
    SUM instead: (1) bucket docs by doc_id range, (2) aggregate per-bucket
    token totals — a tiny table, |corpus|/64 rows, (3) one window over THAT
    to get per-bucket offsets, (4) broadcast offsets back and run the
    per-row running sum partitioned BY bucket — fully parallel. The only
    serial window touches the per-bucket aggregate, never the corpus.
    fill_ratio divides by a power of two, so the double is exact on both
    engines."""
    t = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        # integer `div`, not floor(double /): exact for any 64-bit doc_id
        F.expr(f"doc_id div {PACK_BUCKET}").alias("bucket"),
    )
    btot = t.groupBy("bucket").agg(F.sum("n_tokens").alias("btok"))
    woff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "bucket", F.coalesce(F.sum("btok").over(woff), F.lit(0)).alias("offset")
    )
    wrun = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # no broadcast hint: boff is |corpus|/64 rows — corpus-proportional;
    # AQE broadcasts it while it fits and shuffle-joins beyond that
    c = t.join(boff, "bucket").select(
        "doc_id",
        "n_tokens",
        (F.col("offset") + F.sum("n_tokens").over(wrun) - F.col("n_tokens")).alias(
            "cum_excl"
        ),
    )
    return (
        c.groupBy(F.expr(f"cum_excl div {PACK_BUDGET}").alias("pack_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            (F.sum("n_tokens").cast("double") / F.lit(float(PACK_BUDGET))).alias(
                "fill_ratio"
            ),
        )
    )


@register(
    "curation_benchmark_contamination",
    oracle=f"""
    WITH sh AS ({_SHINGLE_SQL}),
    bench AS (
        SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 49 = 0
    ),
    corpus AS (
        SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_shingles,
               unnest(shingles) AS s
        FROM sh WHERE doc_id % 49 <> 0
    )
    SELECT c.doc_id, c.n_shingles, COUNT(*) AS n_hit,
           CAST(COUNT(*) AS DOUBLE) / CAST(c.n_shingles AS DOUBLE)
             AS contamination
    FROM corpus c JOIN bench b USING (s)
    GROUP BY c.doc_id, c.n_shingles
    """,
    tags=("curation", "contamination", "bench"),
)
def curation_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: fraction of each training doc's
    distinct 3-word shingles that appear anywhere in the held-out benchmark
    set (here: doc_id % 49 == 0 stands in for the benchmark suite). Docs
    with zero overlap are not emitted.

    Scale shape: the benchmark side is small BY NATURE (eval suites are
    MBs; the corpus is TBs), so its distinct-shingle set is broadcast — the
    corpus makes ONE pass (shingle explode → broadcast hash join → per-doc
    count), no shuffle of corpus shingles at all. Reuses dedup's
    _shingles_df (same keyed-aggregate barrier against the O(len²)
    generate-pushdown trap)."""
    sh = _shingles_df(spark, sf_dir)
    bench = (
        sh.filter(F.col("doc_id") % 49 == 0)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    corpus = sh.filter(F.col("doc_id") % 49 != 0).select(
        "doc_id",
        F.size("shingles").cast("bigint").alias("n_shingles"),
        F.explode("shingles").alias("s"),
    )
    return (
        corpus.join(F.broadcast(bench), "s")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .select(
            "doc_id",
            "n_shingles",
            "n_hit",
            (F.col("n_hit").cast("double") / F.col("n_shingles").cast("double")).alias(
                "contamination"
            ),
        )
    )


# Per-language keep rates (percent): downsample the over-represented head,
# keep the tail. A fixed editorial mixture — the data-driven variant is
# curation_balance_mixture below.
_STRATA_RATES = {"en": 20, "zh": 40}
_DEFAULT_RATE = 60

_RATE_SQL = (
    "CASE "
    + " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in _STRATA_RATES.items())
    + f" ELSE {_DEFAULT_RATE} END"
)


@register(
    "curation_stratified_sample",
    oracle=f"""
    WITH d AS (
        SELECT lang, {_RATE_SQL} AS target_pct,
               CASE WHEN {_BUCKET_SQL} < ({_RATE_SQL}) THEN 1 ELSE 0 END AS keep
        FROM documents
    )
    SELECT lang, CAST(MAX(target_pct) AS BIGINT) AS target_pct,
           COUNT(*) AS n_total,
           CAST(SUM(keep) AS BIGINT) AS n_kept,
           CAST(SUM(keep) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS realized
    FROM d GROUP BY lang
    """,
    tags=("curation", "sampling"),
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language keep rates applied
    via an md5 hash threshold on doc_id — reproducible under any
    partitioning, no rand(), no per-stratum sort.

    Scale shape: a single narrow map over the corpus (hash + compare) then
    one aggregate — no shuffle of kept rows, no window. This is the only
    sampling form that survives 100 TB: rank-based per-stratum sampling
    needs a global sort per stratum; rand()-based sampling is
    irreproducible across retries (a failed task resamples differently)."""
    d = load(spark, sf_dir, "documents")
    rate = F.expr(_RATE_SQL)
    keep = F.when(_bucket100() < rate, 1).otherwise(0)
    return (
        d.select("lang", rate.alias("target_pct"), keep.alias("keep"))
        .groupBy("lang")
        .agg(
            F.max("target_pct").cast("bigint").alias("target_pct"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum("keep").cast("bigint").alias("n_kept"),
            (F.sum("keep").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "realized"
            ),
        )
    )


@register(
    "curation_balance_mixture",
    oracle=f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang
    ), quota AS (
        SELECT lang, n_total, (SELECT MIN(n_total) FROM counts) AS n_min
        FROM counts
    ), d AS (
        SELECT doc.lang, q.n_total, q.n_min,
               CASE WHEN ({_BUCKET_SQL}) * q.n_total < q.n_min * 100
                    THEN 1 ELSE 0 END AS keep
        FROM documents doc JOIN quota q ON doc.lang = q.lang
    )
    SELECT lang, CAST(MAX(n_total) AS BIGINT) AS n_total,
           CAST(MAX(n_min) AS BIGINT) AS quota,
           CAST(SUM(keep) AS BIGINT) AS n_kept,
           CAST(SUM(keep) AS DOUBLE) / CAST(MAX(n_total) AS DOUBLE)
             AS realized
    FROM d GROUP BY lang
    """,
    tags=("curation", "mixture"),
)
def curation_balance_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven mixture balancing: downsample every language toward the
    smallest language's count (uniform target mixture) via the same md5
    hash threshold — keep iff bucket·n_total < n_min·100, i.e. keep
    probability ≈ n_min/n_total, entirely in exact bigint arithmetic.

    Scale shape: pass 1 is a tiny per-language count (broadcast back as
    the quota table); pass 2 is a narrow map + aggregate over the corpus.
    No per-stratum sort, no window, no shuffle of sampled rows — the
    hash-threshold form replaces the rank-based quota sampler that would
    serialize each stratum at 100 TB."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    nmin = counts.agg(F.min("n_total").alias("n_min"))
    quota = counts.crossJoin(F.broadcast(nmin))
    keep = F.when(_bucket100() * F.col("n_total") < F.col("n_min") * 100, 1).otherwise(
        0
    )
    return (
        d.select("doc_id", "lang")
        .join(F.broadcast(quota), "lang")
        .select("lang", "n_total", "n_min", keep.alias("keep"))
        .groupBy("lang")
        .agg(
            F.max("n_total").cast("bigint").alias("n_total"),
            F.max("n_min").cast("bigint").alias("quota"),
            F.sum("keep").cast("bigint").alias("n_kept"),
            (F.sum("keep").cast("double") / F.max("n_total").cast("double")).alias(
                "realized"
            ),
        )
    )


# --- composed end-to-end pipeline -------------------------------------------
_CONTAM_DROP = 0.5  # drop docs sharing >= half their shingles with benchmark


@register(
    "curation_full_pipeline",
    oracle=f"""
    WITH sh AS ({_SHINGLE_SQL}),
    dupb AS (SELECT DISTINCT doc_b AS doc_id FROM ({_MINHASH_ORACLE})),
    canon AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    bench AS (
        SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 49 = 0
    ),
    cor AS (
        SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_shingles,
               unnest(shingles) AS s
        FROM sh WHERE doc_id % 49 <> 0
    ),
    hot AS (
        SELECT c.doc_id
        FROM cor c JOIN bench b USING (s)
        GROUP BY c.doc_id, c.n_shingles
        HAVING CAST(COUNT(*) AS DOUBLE) / CAST(c.n_shingles AS DOUBLE)
               >= {_CONTAM_DROP}
    ),
    surv AS (
        SELECT d.lang, len(string_split(d.text, ' ')) AS n_tokens
        FROM documents d
        JOIN canon USING (doc_id)
        WHERE d.doc_id % 49 <> 0
          AND len(string_split(d.text, ' ')) BETWEEN 20 AND 2000
          AND CAST(len(list_distinct(string_split(d.text, ' '))) AS DOUBLE)
              / CAST(len(string_split(d.text, ' ')) AS DOUBLE) > 0.25
          AND d.doc_id NOT IN (SELECT doc_id FROM dupb)
          AND d.doc_id NOT IN (SELECT doc_id FROM hot)
    ),
    totals AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang)
    SELECT t.lang, CAST(t.n_total AS BIGINT) AS n_total,
           COUNT(s.lang) AS n_kept,
           CAST(COALESCE(SUM(s.n_tokens), 0) AS BIGINT) AS tokens_kept,
           CAST(COUNT(s.lang) AS DOUBLE) / CAST(t.n_total AS DOUBLE)
             AS kept_ratio
    FROM totals t LEFT JOIN surv s ON s.lang = t.lang
    GROUP BY t.lang, t.n_total
    """,
    tags=("curation", "pipeline"),
)
def curation_full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation sweep composed as ONE DataFrame plan: exact-dedup
    canonicals ∩ quality gate ∩ not-near-duplicate ∩ not-benchmark-
    contaminated — then per-language corpus accounting. What the demo
    script narrates step by step, as a single Catalyst-optimized query
    with a single composed oracle.

    The near-dup source is minhash-LSH (candidate-bounded, the scale
    path — its full hash chain is replayed in the oracle), NOT the exact
    Jaccard chain: composing exact Jaccard here inherited its
    quadratic-in-posting-density term and took the pipeline from 2.4 s
    to 19.9 s across the sf0.1→sf1 decade; with LSH the pipeline tracks
    its parts (SCALING.md).

    Plan shape: the quality gate is an inline predicate (no join); the
    canonical set semi-joins on doc_id; the near-dup and contaminated
    sets anti-join WITHOUT broadcast hints — they are bounded by dup-pair
    volume / hot-doc count, which on a web-scale corpus can be a large
    FRACTION of it (30-50% near-dup rates are normal), so AQE broadcasts
    them only while they fit; language totals broadcast back over the
    final aggregate. One pass over the corpus plus the bounded
    dedup/contam side pipelines — the composition adds no shuffle beyond
    its parts."""
    from stateflow_spark.queries.dedup import dedup_minhash_lsh

    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    ntok = F.size(toks)
    quality = ntok.between(20, 2000) & (
        F.size(F.array_distinct(toks)).cast("double") / ntok.cast("double")
        > 0.25
    )
    canon = (
        d.groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    dupb = (
        dedup_minhash_lsh(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    hot = (
        curation_benchmark_contamination(spark, sf_dir)
        .filter(F.col("contamination") >= _CONTAM_DROP)
        .select("doc_id")
    )
    surv = (
        # the benchmark subset itself (doc_id % 49 == 0) is the held-out
        # EVAL set — it must never land in the training corpus, mirroring
        # how curation_benchmark_contamination excludes it from scoring
        # (round-5 ADVICE: keeping it contradicted the contamination gate)
        d.filter((F.col("doc_id") % 49 != 0) & quality)
        .join(canon, "doc_id", "left_semi")
        .join(dupb, "doc_id", "left_anti")
        .join(hot, "doc_id", "left_anti")
        .select("lang", ntok.cast("bigint").alias("n_tokens"))
    )
    totals = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    kept = surv.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
    )
    return (
        totals.join(kept, "lang", "left")
        .select(
            "lang",
            "n_total",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("tokens_kept", F.lit(0)).alias("tokens_kept"),
            (
                F.coalesce("n_kept", F.lit(0)).cast("double")
                / F.col("n_total").cast("double")
            ).alias("kept_ratio"),
        )
    )


@register(
    "curation_epoch_upsample",
    oracle=f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang
    ), quota AS (
        SELECT lang, n_total,
               (SELECT MAX(n_total) FROM counts) AS n_max
        FROM counts
    ), d AS (
        SELECT doc.lang, q.n_total, q.n_max,
               q.n_max // q.n_total
               + CASE WHEN ({_BUCKET_SQL}) * q.n_total
                           < (q.n_max % q.n_total) * 100
                      THEN 1 ELSE 0 END AS n_repeat
        FROM documents doc JOIN quota q ON doc.lang = q.lang
    ), emitted AS (
        -- the 1000 bound caps the replayable epoch factor; a corpus
        -- skewed beyond 1000x would need it raised (Spark side has no cap)
        SELECT lang, n_total, n_max
        FROM d, (SELECT unnest(range(0, 1000)) AS i)
        WHERE i < n_repeat
    )
    SELECT lang, CAST(MAX(n_total) AS BIGINT) AS n_total,
           CAST(MAX(n_max) AS BIGINT) AS n_target,
           COUNT(*) AS n_emitted,
           CAST(COUNT(*) AS DOUBLE) / CAST(MAX(n_max) AS DOUBLE)
             AS fill
    FROM emitted GROUP BY lang
    """,
    tags=("curation", "mixture", "upsample"),
)
def curation_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch upsampling — the complement of curation_balance_mixture:
    repeat under-represented languages toward the LARGEST language's
    count. Every doc gets floor(n_max/n_total) epochs; the fractional
    remainder is covered by giving one extra epoch to a deterministic
    hash-selected ~(n_max mod n_total)/n_total fraction of the stratum.
    The repeated rows are actually MATERIALIZED (explode over a repeat
    sequence) — the shape a training-data writer consumes; a trainer
    that accepts sample weights would keep `n_repeat` as a column and
    skip the explode.

    Scale shape: tiny per-language count pass broadcast back, then one
    corpus map + bounded fan-out (×n_max/n_total per row, the epoch
    factor itself). Hash-threshold selection means the emitted multiset
    is identical under any partitioning and across retries."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    nmax = counts.agg(F.max("n_total").alias("n_max"))
    quota = counts.crossJoin(F.broadcast(nmax))
    n_repeat = (
        F.expr("n_max div n_total")
        + F.when(
            _bucket100() * F.col("n_total") < (F.col("n_max") % F.col("n_total")) * 100,
            1,
        ).otherwise(0)
    )
    emitted = (
        d.select("doc_id", "lang")
        .join(F.broadcast(quota), "lang")
        .select("lang", "n_total", "n_max", n_repeat.alias("n_repeat"))
        .select(
            "lang",
            "n_total",
            "n_max",
            F.explode(F.expr("sequence(1, n_repeat)")).alias("epoch"),
        )
    )
    return emitted.groupBy("lang").agg(
        F.max("n_total").cast("bigint").alias("n_total"),
        F.max("n_max").cast("bigint").alias("n_target"),
        F.count(F.lit(1)).alias("n_emitted"),
        (F.count(F.lit(1)).cast("double") / F.max("n_max").cast("double")).alias(
            "fill"
        ),
    )


# --------------------------------------------------------------------------
# Adaptive per-stratum quality threshold (quantile gate without a sort)
# --------------------------------------------------------------------------

_ADAPTIVE_KEEP_NUM = 3  # keep the top KEEP_NUM/KEEP_DEN of each stratum
_ADAPTIVE_KEEP_DEN = 4  # (boundary ties are all kept — inclusive gate)


@register(
    "curation_adaptive_threshold",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, lang,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS score
        FROM documents
    ),
    n AS (SELECT lang, COUNT(*) AS stratum_n FROM s GROUP BY 1),
    d AS (SELECT lang, score, COUNT(*) AS c FROM s GROUP BY 1, 2),
    cum AS (
        SELECT lang, score,
               COALESCE(SUM(c) OVER (PARTITION BY lang ORDER BY score DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS n_gt
        FROM d
    )
    SELECT s.doc_id, s.lang, s.score,
           CAST(n.stratum_n AS BIGINT) AS stratum_n,
           CAST(cum.n_gt AS BIGINT) AS n_gt,
           (cum.n_gt * {_ADAPTIVE_KEEP_DEN}
              < {_ADAPTIVE_KEEP_NUM} * n.stratum_n) AS kept
    FROM s JOIN n USING (lang) JOIN cum USING (lang, score)
    """,
    tags=("curation", "quality", "quantile"),
)
def curation_adaptive_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive per-stratum quality gate: within each language stratum keep
    the top 3/4 of documents by type/token-ratio score — the threshold is
    learned from the stratum's own score distribution (DataComp/DCLM-style
    per-source quantile filtering), not a global constant. A doc is kept
    iff fewer than 3/4·n stratum-mates score strictly higher, so boundary
    ties are all-in and no per-document ordering exists anywhere.

    Scale shape — this is the quantile gate WITHOUT a corpus sort: doc
    rows pass only through a (lang, score) groupBy (map-side combine;
    near-uniform keys) and a broadcast hash join. The window runs over the
    DISTINCT-SCORE table (|strata| × |distinct scores| rows — thousands,
    not billions), which then broadcasts back as the threshold lookup. A
    rank/percent_rank over the corpus would instead sort every stratum
    through one partition each (|strata| ≈ 5 active tasks at 100 TB).
    For a continuous score the distinct table degenerates toward corpus
    size — there the same plan holds with scores bucketed to fixed
    precision first (the gate then binds at bucket granularity, the
    standard sketch trade)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    score = (
        F.size(F.array_distinct(toks)).cast("double")
        / F.size(toks).cast("double")
    ).alias("score")
    s = d.select("doc_id", "lang", score)
    n = s.groupBy("lang").agg(F.count(F.lit(1)).alias("stratum_n"))
    dist = s.groupBy("lang", "score").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = dist.select(
        "lang", "score", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("n_gt")
    )
    return (
        s.join(F.broadcast(n), "lang")
        # no hint on cum: the distinct (lang, score) table is bounded by
        # the score DOMAIN, which a continuous production score makes
        # corpus-proportional — AQE broadcasts it only while it fits
        .join(cum, ["lang", "score"])
        .select(
            "doc_id",
            "lang",
            "score",
            "stratum_n",
            "n_gt",
            (
                F.col("n_gt") * _ADAPTIVE_KEEP_DEN
                < F.lit(_ADAPTIVE_KEEP_NUM) * F.col("stratum_n")
            ).alias("kept"),
        )
    )


# --------------------------------------------------------------------------
# Cross-source overlap matrix (contamination audit between corpus sources)
# --------------------------------------------------------------------------


@register(
    "curation_source_overlap",
    oracle=f"""
    WITH {_CAPPED_PAIR_CTES},
    src AS (SELECT doc_id, source FROM documents),
    xp AS (
        SELECT LEAST(sa.source, sb.source) AS source_a,
               GREATEST(sa.source, sb.source) AS source_b,
               d.jaccard
        FROM dup d JOIN src sa ON sa.doc_id = d.doc_a
                   JOIN src sb ON sb.doc_id = d.doc_b
        WHERE sa.source <> sb.source
    )
    SELECT source_a, source_b, COUNT(*) AS n_pairs,
           CAST(CAST(SUM(CAST(jaccard AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mean_jaccard
    FROM xp GROUP BY 1, 2
    """,
    tags=("curation", "dedup", "audit"),
)
def curation_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every unordered pair of
    corpus sources, the number of cross-source near-duplicate doc pairs
    (exact n-gram Jaccard ≥ 0.10 via the shared inverted-index pipeline)
    and their exact mean Jaccard. The audit that tells a data curator
    which ingestion feeds are re-serving each other's content — run
    BEFORE mixture weighting, since overlapping sources double-count.

    Scale shape: the expensive part is the shared _jaccard_pairs pass
    (single inverted-index shuffle, already skew-capped via the
    stop-shingle knob); everything on top is two doc_id-keyed equi-joins
    that shuffle only the POST-THRESHOLD pair set (orders smaller than
    the corpus) against the 2-column (doc_id, source) projection — column
    pruning reaches the parquet scan — then a |sources|²-cell aggregate
    with map-side combine. Source-pair normalization is least/greatest,
    so the matrix is upper-triangular with no self-cells. The
    stop-shingle posting cap is ON by default (round-6 VERDICT #4):
    cross-source pair volume tracks duplicate density, and the cap keeps
    the worst task at cap²/2 pairs per shingle; the oracle's kept filter
    pins the same semantics."""
    pairs = _jaccard_pairs(
        spark, sf_dir, stop_shingle_cap=_STOP_SHINGLE_CAP
    ).select("doc_a", "doc_b", "jaccard")
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (
                F.sum(F.col("jaccard").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_jaccard"),
        )
    )


# --------------------------------------------------------------------------
# Temperature-based mixture resampling (mT5 / XLM-R α-sampling)
# --------------------------------------------------------------------------

# α = 0.5: weight_s ∝ n_s^α — sqrt keeps every arithmetic step an IEEE
# builtin (no pow/exp, which are not bit-pinned across engines)
_TEMP_ALPHA_SQL = "sqrt(CAST(n_total AS DOUBLE))"


@register(
    "curation_temperature_mixture",
    oracle=f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang
    ), sums AS (
        SELECT CAST(CAST(SUM(CAST({_TEMP_ALPHA_SQL} AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS s_alpha,
               CAST(SUM(n_total) AS BIGINT) AS n_corpus
        FROM counts
    ), quota AS (
        SELECT lang, n_total,
               {_TEMP_ALPHA_SQL} / s_alpha AS weight,
               CAST(floor(({_TEMP_ALPHA_SQL} / s_alpha)
                          * CAST(n_corpus AS DOUBLE)) AS BIGINT) AS n_target
        FROM counts, sums
    ), d AS (
        SELECT doc.lang, q.n_total, q.weight, q.n_target,
               q.n_target // q.n_total
               + CASE WHEN ({_BUCKET_SQL}) * q.n_total
                           < (q.n_target % q.n_total) * 100
                      THEN 1 ELSE 0 END AS n_repeat
        FROM documents doc JOIN quota q ON doc.lang = q.lang
    ), emitted AS (
        SELECT lang, n_total, weight, n_target
        FROM d, (SELECT unnest(range(0, 1000)) AS i)
        WHERE i < n_repeat
    )
    SELECT lang, CAST(MAX(n_total) AS BIGINT) AS n_total,
           MAX(weight) AS weight,
           CAST(MAX(n_target) AS BIGINT) AS n_target,
           COUNT(*) AS n_emitted
    FROM emitted GROUP BY lang
    """,
    tags=("curation", "mixture", "temperature"),
)
def curation_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture resampling (mT5/XLM-R α-sampling, α=0.5):
    redistribute the SAME corpus budget across languages proportional to
    n^α — low-resource strata upsample, high-resource downsample, the
    standard fix for head-language dominance that uniform balancing
    (curation_balance_mixture, α=0) overcorrects. Weights use sqrt (IEEE
    bit-pinned; pow/exp are not) and the weight denominator accumulates
    through decimal, so the per-stratum quota arithmetic is bit-identical
    cross-engine; the realized multiset comes from the same
    floor(epochs) + md5-hash-threshold fractional pass as
    curation_epoch_upsample — deterministic under any partitioning.

    Scale shape: one tiny per-language count (broadcast back with the
    1-row corpus sums), then a single corpus map with bounded fan-out
    (×n_target/n_total). No sort, no window, no shuffle of emitted rows;
    the 1000-epoch cap lives only in the oracle's replay (range join),
    not the Spark plan."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    sums = counts.agg(
        F.sum(F.sqrt(F.col("n_total").cast("double")).cast("decimal(38,12)"))
        .cast("double")
        .alias("s_alpha"),
        F.sum("n_total").cast("bigint").alias("n_corpus"),
    )
    w = F.sqrt(F.col("n_total").cast("double")) / F.col("s_alpha")
    quota = (
        counts.crossJoin(F.broadcast(sums))
        .select(
            "lang",
            "n_total",
            w.alias("weight"),
            F.floor(w * F.col("n_corpus").cast("double"))
            .cast("bigint")
            .alias("n_target"),
        )
    )
    n_repeat = (
        F.expr("n_target div n_total")
        + F.when(
            _bucket100() * F.col("n_total")
            < (F.col("n_target") % F.col("n_total")) * 100,
            1,
        ).otherwise(0)
    )
    emitted = (
        d.select("doc_id", "lang")
        .join(F.broadcast(quota), "lang")
        .select("lang", "n_total", "weight", "n_target", n_repeat.alias("n_repeat"))
        .filter(F.col("n_repeat") > 0)
        .select(
            "lang",
            "n_total",
            "weight",
            "n_target",
            F.explode(F.expr("sequence(1, n_repeat)")).alias("epoch"),
        )
    )
    return emitted.groupBy("lang").agg(
        F.max("n_total").cast("bigint").alias("n_total"),
        F.max("weight").alias("weight"),
        F.max("n_target").cast("bigint").alias("n_target"),
        F.count(F.lit(1)).alias("n_emitted"),
    )


# --------------------------------------------------------------------------
# Hash-rank reservoir sample — uniform k without replacement, no rand()
# --------------------------------------------------------------------------

_RESERVOIR_K = 64


@register(
    "curation_reservoir_sample",
    oracle=f"""
    SELECT doc_id, lang, source,
           md5(CAST(doc_id AS VARCHAR)) AS sample_rank
    FROM documents
    ORDER BY sample_rank, doc_id
    LIMIT {_RESERVOIR_K}
    """,
    tags=("curation", "sampling", "reservoir"),
)
def curation_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k-sample without replacement via hash order statistics:
    rank every doc by md5(doc_id) and keep the k smallest — distribution-
    identical to classic reservoir sampling (each doc's rank is an
    independent uniform draw) but DETERMINISTIC, partitioning-independent
    and re-runnable, which rand()-based reservoirs are not. The fixed-RATE
    samplers (curation_stratified_sample and friends) keep a hash
    THRESHOLD; this keeps a fixed COUNT — the two sampling contracts a
    curation pipeline needs.

    Scale shape: a TakeOrderedAndProject — each partition retains its own
    top-k candidates and only k rows per partition reach the driver-side
    merge, exactly the distributed-reservoir merge step; no sort, no
    shuffle of the corpus. At 100 TB this is the textbook way to draw a
    fixed-size audit sample in one pass."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "lang",
            "source",
            F.md5(F.col("doc_id").cast("string")).alias("sample_rank"),
        )
        .orderBy("sample_rank", "doc_id")
        .limit(_RESERVOIR_K)
    )


# --------------------------------------------------------------------------
# Train/val/test split leakage audit (near-dup contamination across splits)
# --------------------------------------------------------------------------

# Deterministic 3-way split on the same md5 bucket the samplers use:
# [0,90) train / [90,95) val / [95,100) test.
_SPLIT_CASE_DUCK = f"""CASE WHEN {_BUCKET_SQL} < 90 THEN 'train'
         WHEN {_BUCKET_SQL} < 95 THEN 'val' ELSE 'test' END"""


def _split_col() -> F.Column:
    b = _bucket100()
    return (
        F.when(b < 90, F.lit("train"))
        .when(b < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )


@register(
    "curation_split_leakage",
    oracle=f"""
    WITH {_CAPPED_PAIR_CTES},
    sp AS (SELECT doc_id, {_SPLIT_CASE_DUCK} AS split FROM documents)
    SELECT d.doc_a, d.doc_b,
           sa.split AS split_a, sb.split AS split_b,
           d.jaccard,
           CASE WHEN sb.split <> 'train' THEN d.doc_b ELSE d.doc_a END
             AS purge_doc_id
    FROM dup d JOIN sp sa ON sa.doc_id = d.doc_a
               JOIN sp sb ON sb.doc_id = d.doc_b
    WHERE sa.split <> sb.split
    """,
    tags=("curation", "dedup", "audit"),
)
def curation_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split near-duplicate leakage audit: assign every document a
    deterministic train/val/test split (md5-bucket 90/5/5 — the same
    engine-independent hash arithmetic the samplers use, so the split is
    reproducible under any partitioning), then surface every near-dup
    pair (exact n-gram Jaccard >= 0.10 via the shared inverted-index
    pipeline) that STRADDLES a split boundary. Each row names the doc to
    purge (the non-train side — standard practice removes contamination
    from the held-out sets, keeping training mass intact). This is the
    audit that catches eval contamination that exact dedup misses: a
    lightly-edited copy of a training document landing in the test split
    silently inflates eval scores.

    Scale shape: the expensive part is the shared _jaccard_pairs pass
    (single inverted-index shuffle, stop-shingle posting cap ON by
    default per round-6 VERDICT #4 — the oracle's kept filter pins the
    cap semantics); on top sit
    two doc_id-keyed equi-joins that shuffle only the post-threshold pair
    set against a 1-column projection plus a hash CASE — the split label
    is computed, never stored, so the audit needs no split table at
    100 TB. No driver-side state; output is the leaked-pair set itself.

    Reference parity: the reference has no dedup/curation surface; this
    extends SURVEY.md §2 extension families (dedup + curation audits).
    """
    pairs = _jaccard_pairs(
        spark, sf_dir, stop_shingle_cap=_STOP_SHINGLE_CAP
    ).select("doc_a", "doc_b", "jaccard")
    sp = load(spark, sf_dir, "documents").select(
        "doc_id", _split_col().alias("split")
    )
    sa = sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select(
            "doc_a",
            "doc_b",
            "split_a",
            "split_b",
            "jaccard",
            F.when(F.col("split_b") != "train", F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("purge_doc_id"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic global shuffle → shard manifest (training-order assembly)
# --------------------------------------------------------------------------

_N_SHARDS = 16

# shard = first-8-hex-of-md5(doc_id) % 16; intra-shard order = full md5
# string (unique per doc_id for practical purposes; doc_id breaks the
# theoretical tie). DuckDB replays the identical hex arithmetic.
_SHARD_SQL = _BUCKET_SQL.replace("% 100", f"% {_N_SHARDS}")


@register(
    "curation_shuffle_shards",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, n_chars,
               {_SHARD_SQL} AS shard_id,
               md5(CAST(doc_id AS VARCHAR)) AS rank
        FROM documents
    ), p AS (
        SELECT doc_id, n_chars, shard_id,
               ROW_NUMBER() OVER (PARTITION BY shard_id
                                  ORDER BY rank, doc_id) AS pos
        FROM t
    )
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ARG_MIN(doc_id, pos) AS first_doc,
           CAST(SUM(doc_id * pos) AS BIGINT) AS order_digest
    FROM p GROUP BY 1
    """,
    tags=("curation", "shuffle"),
)
def curation_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle, materialized as a shard
    manifest. Every document gets a pseudo-random but REPRODUCIBLE
    position: shard = md5-hash % 16, intra-shard order = full md5 string.
    The manifest emits per shard the doc count, exact byte mass, the
    first document in shuffle order, and an order digest
    (SUM(doc_id * position)) that pins the entire permutation — two runs
    (or two engines) that disagree on any document's shuffled position
    disagree on the digest. hash-ordering beats rand(): restartable,
    partitioning-independent, and a re-run after adding documents moves
    only the new docs' neighbors.

    Scale shape: ONE shuffle. The window (row_number per shard) and the
    manifest groupBy share the same shard key, so Catalyst reuses the
    exchange; the production write path is the same single exchange —
    .repartition(N, shard).sortWithinPartitions(rank) + write, with this
    manifest emitted as a by-product of the identical partitioning. At
    100 TB: N_SHARDS scales to ~count(files); hash keys are uniform so no
    shard skew, and no driver-side state of any kind.
    """
    d = load(spark, sf_dir, "documents")
    rank = F.md5(F.col("doc_id").cast("string"))
    t = d.select(
        "doc_id",
        "n_chars",
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % _N_SHARDS
        ).alias("shard_id"),
        rank.alias("rank"),
    )
    w = Window.partitionBy("shard_id").orderBy("rank", "doc_id")
    p = t.withColumn("pos", F.row_number().over(w))
    return p.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min_by("doc_id", "pos").alias("first_doc"),
        F.sum(F.col("doc_id") * F.col("pos")).cast("bigint").alias("order_digest"),
    )


# --------------------------------------------------------------------------
# Length-bucketed batching audit (padding waste per pow-2 bucket)
# --------------------------------------------------------------------------

_LB_CAPS = (16, 32, 64, 128, 256, 512, 1024)
_LB_OVERFLOW = 1048576
_LB_BATCH = 32  # sequences per training batch

_LB_CASE_DUCK = (
    "CASE "
    + " ".join(f"WHEN n <= {c} THEN {c}" for c in _LB_CAPS)
    + f" ELSE {_LB_OVERFLOW} END"
)


@register(
    "curation_length_buckets",
    oracle=f"""
    WITH t AS (
        SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        FROM documents
    ), b AS (
        SELECT CAST({_LB_CASE_DUCK} AS BIGINT) AS bucket_cap, n FROM t
    )
    SELECT bucket_cap,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS sum_tokens,
           CAST(COUNT(*) * bucket_cap AS BIGINT) AS padded_tokens,
           CAST((COUNT(*) + {_LB_BATCH - 1}) // {_LB_BATCH} AS BIGINT)
             AS n_batches,
           1.0 - CAST(SUM(n) AS DOUBLE)
                   / CAST(COUNT(*) * bucket_cap AS DOUBLE) AS waste_ratio
    FROM b GROUP BY 1
    """,
    tags=("curation", "batching"),
)
def curation_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit: assign every document to the
    smallest power-of-two token-length bucket that holds it, then emit
    per bucket the doc count, real token mass, padded token mass
    (n_docs x bucket cap — what the accelerator actually processes when
    sequences are padded to the bucket), the number of training batches
    at batch size 32, and the padding-waste ratio. The report that
    decides bucket boundaries before a training run: waste_ratio is the
    fraction of FLOPs burned on pad tokens per bucket, and moving a
    boundary reshapes it. Buckets are a fixed CASE ladder (no log2 —
    float-free, identical in both engines); all masses are exact int64,
    the waste ratio is one double division of exact operands.

    Scale shape: ONE aggregate over a projected scan — token counts are
    a per-row size(split()) (JVM codegen, no explode), the bucket key
    has ~8 values so map-side combine reduces each partition to 8 rows
    before the exchange. Flat at any corpus size.
    """
    d = load(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " ")).cast("bigint")
    cap = F.lit(_LB_OVERFLOW)
    for c in reversed(_LB_CAPS):
        cap = F.when(n <= c, F.lit(c)).otherwise(cap)
    b = d.select(cap.cast("bigint").alias("bucket_cap"), n.alias("n"))
    return (
        b.groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("bigint").alias("sum_tokens"),
        )
        .select(
            "bucket_cap",
            "n_docs",
            "sum_tokens",
            (F.col("n_docs") * F.col("bucket_cap"))
            .cast("bigint")
            .alias("padded_tokens"),
            F.expr(f"(n_docs + {_LB_BATCH - 1}) div {_LB_BATCH}")
            .cast("bigint")
            .alias("n_batches"),
            (
                F.lit(1.0)
                - F.col("sum_tokens").cast("double")
                / (F.col("n_docs") * F.col("bucket_cap")).cast("double")
            ).alias("waste_ratio"),
        )
    )


@register(
    "curation_assign_ids",
    oracle="""
    SELECT doc_id, source,
           ROW_NUMBER() OVER (ORDER BY source, doc_id) AS new_id
    FROM documents
    """,
    tags=("curation", "ids"),
)
def curation_assign_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable contiguous ID assignment ordered by (source, doc_id) — the
    re-keying step when corpora merge (every doc gets a dense global id,
    reproducible run-to-run), done WITHOUT a global sort: the naive
    ``ROW_NUMBER() OVER (ORDER BY ...)`` collapses the corpus to a
    SinglePartition window (the zipWithIndex trap at 100 TB).

    Distributed form (the same two-level rank as
    window_equidepth_histogram): a coarse hash-free VALUE bucket on
    doc_id ranges keeps bucket boundaries aligned with the target order;
    per-bucket local ranks run in parallel windows partitioned by
    (source-major bucket); bucket offsets are a running total over the
    tiny per-bucket count table; new_id = offset + local rank. The only
    serial window is over ~|buckets| rows. Deterministic: (source,
    doc_id) is unique.

    100 TB shape: one shuffle to bucket-partition, one parallel window,
    one SHUFFLE join of the offsets table back on (source, bkt) — NOT a
    broadcast: the offsets table has ~|corpus|/512 rows (hundreds of
    millions at 100 TB), far past broadcastable, and it shares the
    (source, bkt) partitioning the local-rank window already produced,
    so AQE plans it as a cheap co-partitioned join."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    # source-major coarse buckets: (source, doc_id div 512) tiles the
    # (source, doc_id) order, so concatenating buckets in key order IS
    # the global order. Integer `div`, not a double divide: floor(x/512.0)
    # misbuckets doc_ids above 2^53 where double loses integer precision.
    bucketed = d.withColumn("bkt", F.expr("doc_id div 512"))
    local_w = Window.partitionBy("source", "bkt").orderBy("doc_id")
    local = bucketed.withColumn("lr", F.row_number().over(local_w))
    counts = bucketed.groupBy("source", "bkt").agg(
        F.count(F.lit(1)).alias("n")
    )
    off_w = (
        Window.orderBy("source", "bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "source",
        "bkt",
        F.coalesce(F.sum("n").over(off_w), F.lit(0)).alias("off"),
    )
    return (
        local.join(offsets, ["source", "bkt"])
        .select(
            "doc_id",
            "source",
            (F.col("off") + F.col("lr")).alias("new_id"),
        )
    )


@register(
    "curation_quantile_normalize",
    oracle="""
    SELECT doc_id, n_chars,
           CUME_DIST() OVER (ORDER BY n_chars) AS pct_rank
    FROM documents
    """,
    tags=("curation", "normalize", "cdf"),
)
def curation_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile (CDF) normalization of a per-document feature — the
    rank-based feature transform an ML curation pipeline applies before
    thresholding scores from incomparable sources: every doc's n_chars
    maps to P(X ≤ x) over the corpus. The oracle is the declarative
    one-window spec (CUME_DIST over a GLOBAL ORDER — a SinglePartition
    corpus sort, the anti-pattern); the Spark plan is the distributed
    form: one map-combinable (value, count) histogram aggregate, the
    cumulative window over the ~|value domain| histogram (hundreds of
    rows), and a broadcast value→cdf join back onto the corpus — the
    same two-level machinery as agg_exact_percentiles, applied row-wise.
    Exactness: cum and n are exact ints; pct_rank is one IEEE division
    of bit-identical operands."""
    d = load(spark, sf_dir, "documents")
    vc = d.groupBy("n_chars").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf = vc.select(
        "n_chars",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    ).select(
        "n_chars",
        (F.col("cum").cast("double") / F.col("n").cast("double")).alias(
            "pct_rank"
        ),
    )
    return d.select("doc_id", "n_chars").join(F.broadcast(cdf), "n_chars").select(
        "doc_id", "n_chars", "pct_rank"
    )


@register(
    "curation_conversation_assembly",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), isl AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM seq
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_turns,
           string_agg(event_type || '#' || CAST(event_id AS VARCHAR),
                      ' | ' ORDER BY ts, event_id) AS transcript
    FROM isl GROUP BY user_id, sid
    """,
    tags=("curation", "conversation", "sft"),
)
def curation_conversation_assembly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Conversation/transcript assembly — the SFT-data-prep step that turns
    an event log into ordered per-session training transcripts: sessionize
    each user's events (30-minute gap, the events_session_windows rule),
    then pack each session's turns into ONE ordered transcript string
    (turn = event_type#event_id here; a chat pipeline renders
    role/content the same way). This is the step between raw logs and
    the packing/mixing stages (curation_pack_sequences consumes such
    rows by length).

    Determinism: turns order by (ts, event_id) — a total order — via
    sort_array over collected (ts, event_id, turn) structs; the oracle's
    string_agg(... ORDER BY ts, event_id) replays it exactly. Plan
    shape: ONE shuffle (the session_window aggregate on user_id); the
    per-session collect_list is bounded by session length — the same
    data-shaped bound every sessionization carries — and transcripts are
    the output payload, not an intermediate. At 100 TB: user-keyed
    exchange of raw turns once, partial-aggregated where Spark's
    session-window merge allows, no second pass."""
    e = load(spark, sf_dir, "events").withColumn(
        "turn_str",
        F.concat_ws("#", F.col("event_type"), F.col("event_id").cast("string")),
    )
    g = (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_turns"),
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "turn_str"))
            ).alias("ordered"),
        )
    )
    return g.select(
        "user_id",
        "session_start",
        "n_turns",
        F.concat_ws(
            " | ", F.expr("transform(ordered, x -> x.turn_str)")
        ).alias("transcript"),
    )
