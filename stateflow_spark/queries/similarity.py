"""Similarity search over the `embeddings` table (array<float> column).

Exactness: dot products and norms accumulate through DECIMAL(38,12) so both
engines compute bit-identical doubles before the (IEEE-deterministic) sqrt /
divide — see queries/common.py. The Spark plans explode (vec_id, pos, x) and
aggregate; the fast double-precision `zip_with` kernel (used by bench and the
ANN path) lives in stateflow_spark/functions/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stateflow_spark.catalog import load
from stateflow_spark.queries.common import register

_EX_SQL = """
        SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
"""


def _exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "x"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "x")


def _dec(col):
    return col.cast("decimal(38,12)")


@register(
    "sim_cosine_topk",
    oracle=f"""
    WITH ex AS ({_EX_SQL}),
    qx AS (SELECT pos, x AS qv FROM ex WHERE vec_id = 0),
    dots AS (
        SELECT ex.vec_id,
               CAST(SUM(CAST(ex.x * qx.qv AS DECIMAL(38,12))) AS DOUBLE) AS dot,
               CAST(SUM(CAST(ex.x * ex.x AS DECIMAL(38,12))) AS DOUBLE) AS norm2
        FROM ex JOIN qx USING (pos)
        GROUP BY ex.vec_id
    ),
    qn AS (SELECT CAST(SUM(CAST(qv * qv AS DECIMAL(38,12))) AS DOUBLE) AS qnorm2
           FROM qx)
    SELECT vec_id, dot / (sqrt(norm2) * sqrt(qnorm2)) AS cosine
    FROM dots, qn
    WHERE vec_id <> 0
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    tags=("similarity", "knn", "bench"),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against one query vector (vec_id 0) — the
    ANN baseline. Query side is a broadcast of 64 rows; corpus side is one
    scan + one partial/final aggregation, no shuffle of raw vectors."""
    ex = _exploded(spark, sf_dir)
    qx = F.broadcast(
        ex.filter(F.col("vec_id") == 0).select("pos", F.col("x").alias("qv"))
    )
    dots = (
        ex.join(qx, "pos")
        .groupBy("vec_id")
        .agg(
            F.sum(_dec(F.col("x") * F.col("qv"))).cast("double").alias("dot"),
            F.sum(_dec(F.col("x") * F.col("x"))).cast("double").alias("norm2"),
        )
    )
    qn = F.broadcast(
        ex.filter(F.col("vec_id") == 0).agg(
            F.sum(_dec(F.col("x") * F.col("x"))).cast("double").alias("qnorm2")
        )
    )
    return (
        dots.crossJoin(qn)
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            (F.col("dot") / (F.sqrt("norm2") * F.sqrt("qnorm2"))).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


@register(
    "sim_knn_join",
    oracle=f"""
    WITH ex AS ({_EX_SQL}),
    q AS (SELECT vec_id AS qid, pos, x AS qv FROM ex WHERE vec_id < 20),
    norms AS (
        SELECT vec_id, CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS n2
        FROM ex GROUP BY vec_id
    ),
    dots AS (
        SELECT q.qid, ex.vec_id,
               CAST(SUM(CAST(ex.x * q.qv AS DECIMAL(38,12))) AS DOUBLE) AS dot
        FROM ex JOIN q USING (pos)
        WHERE ex.vec_id <> q.qid
        GROUP BY q.qid, ex.vec_id
    ),
    scored AS (
        SELECT dots.qid AS qid, dots.vec_id AS vec_id,
               dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cosine
        FROM dots
        JOIN norms na ON na.vec_id = dots.qid
        JOIN norms nb ON nb.vec_id = dots.vec_id
    )
    SELECT qid, vec_id AS neighbor_id, cosine, rnk FROM (
        SELECT qid, vec_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, vec_id) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
    tags=("similarity", "knn-join"),
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN join: top-3 cosine neighbors for each of 20 query vectors.
    Query block is broadcast; per-query top-k via window row_number (no
    global sort). The IVF path (sim_ivf_topk) prunes the corpus side first."""
    ex = _exploded(spark, sf_dir)
    q = F.broadcast(
        ex.filter(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("qid"), "pos", F.col("x").alias("qv")
        )
    )
    norms = ex.groupBy("vec_id").agg(
        F.sum(_dec(F.col("x") * F.col("x"))).cast("double").alias("n2")
    )
    dots = (
        ex.join(q, "pos")
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum(_dec(F.col("x") * F.col("qv"))).cast("double").alias("dot"))
    )
    na = norms.select(F.col("vec_id").alias("qid"), F.col("n2").alias("na2"))
    nb = norms.select("vec_id", F.col("n2").alias("nb2"))
    scored = (
        dots.join(F.broadcast(na), "qid")
        .join(nb, "vec_id")
        .select(
            "qid",
            "vec_id",
            (F.col("dot") / (F.sqrt("na2") * F.sqrt("nb2"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("qid", F.col("vec_id").alias("neighbor_id"), "cosine", "rnk")
    )


@register(
    "sim_centroid_distance",
    oracle=f"""
    WITH ex AS ({_EX_SQL}),
    labeled AS (
        SELECT e.vec_id, emb.label, e.pos, e.x
        FROM ex e JOIN embeddings emb ON emb.vec_id = e.vec_id
    ),
    cent AS (
        SELECT label, pos,
               CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS c
        FROM labeled GROUP BY label, pos
    )
    SELECT l.vec_id, l.label,
           sqrt(CAST(SUM(CAST((l.x - c.c) * (l.x - c.c)
                AS DECIMAL(38,12))) AS DOUBLE)) AS dist_to_centroid
    FROM labeled l
    JOIN cent c ON c.label = l.label AND c.pos = l.pos
    GROUP BY l.vec_id, l.label
    """,
    tags=("similarity", "ivf", "centroid"),
)
def sim_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid + each vector's L2 distance to its own centroid —
    the assignment step of IVF partitioning (and a k-means iteration)."""
    e = load(spark, sf_dir, "embeddings")
    ex = _exploded(spark, sf_dir).join(
        e.select("vec_id", "label"), "vec_id"
    )
    cent = ex.groupBy("label", "pos").agg(
        (
            F.sum(_dec(F.col("x"))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("c")
    )
    diff = F.col("x") - F.col("c")
    return (
        ex.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sqrt(F.sum(_dec(diff * diff)).cast("double")).alias(
                "dist_to_centroid"
            )
        )
    )


@register(
    "sim_ivf_topk",
    oracle=f"""
    WITH ex AS ({_EX_SQL}),
    labeled AS (
        SELECT e.vec_id, emb.label, e.pos, e.x
        FROM ex e JOIN embeddings emb ON emb.vec_id = e.vec_id
    ),
    cent AS (
        SELECT label, pos,
               CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS c
        FROM labeled GROUP BY label, pos
    ),
    qx AS (SELECT pos, x AS qv FROM ex WHERE vec_id = 0),
    probe AS (
        SELECT label,
               CAST(SUM(CAST(c * qv AS DECIMAL(38,12))) AS DOUBLE) AS cdot
        FROM cent JOIN qx USING (pos)
        GROUP BY label
        ORDER BY cdot DESC, label
        LIMIT 3
    ),
    dots AS (
        SELECT l.vec_id,
               CAST(SUM(CAST(l.x * qx.qv AS DECIMAL(38,12))) AS DOUBLE) AS dot,
               CAST(SUM(CAST(l.x * l.x AS DECIMAL(38,12))) AS DOUBLE) AS norm2
        FROM labeled l
        JOIN probe USING (label)
        JOIN qx USING (pos)
        WHERE l.vec_id <> 0
        GROUP BY l.vec_id
    ),
    qn AS (SELECT CAST(SUM(CAST(qv * qv AS DECIMAL(38,12))) AS DOUBLE) AS qnorm2
           FROM qx)
    SELECT vec_id, dot / (sqrt(norm2) * sqrt(qnorm2)) AS cosine
    FROM dots, qn
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    tags=("similarity", "ivf", "ann", "bench"),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: use the `label` clusters as the inverted file, probe
    only the 3 clusters whose centroids are closest to the query, then exact
    cosine inside the probed clusters. At 100 TB: centroids are a broadcast
    table, cluster pruning is a partition-pruning predicate, and the exact
    pass scans ~nprobe/nlist of the corpus."""
    e = load(spark, sf_dir, "embeddings")
    ex = _exploded(spark, sf_dir)
    labeled = ex.join(e.select("vec_id", "label"), "vec_id")
    cent = labeled.groupBy("label", "pos").agg(
        (
            F.sum(_dec(F.col("x"))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("c")
    )
    qx = F.broadcast(
        ex.filter(F.col("vec_id") == 0).select("pos", F.col("x").alias("qv"))
    )
    # rank clusters by centroid·query (cosine order for normalized data)
    cdot = (
        cent.join(qx, "pos")
        .groupBy("label")
        .agg(F.sum(_dec(F.col("c") * F.col("qv"))).cast("double").alias("cdot"))
        .orderBy(F.col("cdot").desc(), F.col("label"))
        .limit(3)
        .select("label")
    )
    probed = labeled.join(F.broadcast(cdot), "label")
    dots = (
        probed.join(qx, "pos")
        .filter(F.col("vec_id") != 0)
        .groupBy("vec_id")
        .agg(
            F.sum(_dec(F.col("x") * F.col("qv"))).cast("double").alias("dot"),
            F.sum(_dec(F.col("x") * F.col("x"))).cast("double").alias("norm2"),
        )
    )
    qn = F.broadcast(
        ex.filter(F.col("vec_id") == 0).agg(
            F.sum(_dec(F.col("x") * F.col("x"))).cast("double").alias("qnorm2")
        )
    )
    return (
        dots.crossJoin(qn)
        .select(
            "vec_id",
            (F.col("dot") / (F.sqrt("norm2") * F.sqrt("qnorm2"))).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )
