"""Python UDTF surface (SURVEY.md §2.C row: UDF/UDAF/UDTF).

A UDTF is the table-function shape the reference has no analog for — its
whole compute model is scalar method invocation (wrappers/class_wrapper.py:
106-149). Spark's lateral-join UDTFs generalize that to one-row-in,
many-rows-out, which is the natural plumbing for tokenize/explode stages of
a training-data pipeline.

Scale notes: the UDTF runs per-partition in Python workers (Arrow-batched
transfer); the lateral join preserves the input partitioning, so no
shuffle is added before the downstream aggregation's own exchange. For
simple explodes prefer built-in ``explode``/``posexplode`` (JVM-side);
a UDTF earns its Python round trip only when the row-generation logic is
genuinely procedural."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from stateflow_spark.catalog import load
from stateflow_spark.queries.common import register


# useArrow: without it a Python UDTF plans as BatchEvalPythonUDTF —
# row-at-a-time pickle transfer. The module docstring's "Arrow-batched"
# claim was aspirational until the round-9 suite-wide BatchEvalPython
# plan gate caught the divergence (test_plans.py).
@udtf(returnType="doc_id: bigint, pos: int, ngram: string", useArrow=True)
class BigramUDTF:
    """Emit (doc_id, position, bigram) per whitespace-token bigram."""

    def eval(self, doc_id: int, text: str):  # noqa: D401
        words = (text or "").split()
        for i in range(len(words) - 1):
            yield doc_id, i, words[i] + " " + words[i + 1]


@register(
    "udtf_bigram_top20",
    oracle="""
    WITH grams AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(string_split(text, ' '))),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1])) AS ngram
        FROM documents
    )
    SELECT ngram, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM grams
    GROUP BY ngram
    ORDER BY n DESC, ngram
    LIMIT 20
    """,
    tags=("udtf", "text"),
)
def udtf_bigram_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams via a lateral-joined Python UDTF.

    The UDTF explodes each document into bigram rows; the aggregation on
    top is ordinary partial+final hash agg. Integer counts — engine-exact."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    spark.udtf.register("bigrams", BigramUDTF)
    return spark.sql(
        """
        SELECT g.ngram, COUNT(*) AS n, COUNT(DISTINCT g.doc_id) AS n_docs
        FROM udtf_docs, LATERAL bigrams(doc_id, text) g
        GROUP BY g.ngram
        ORDER BY n DESC, g.ngram
        LIMIT 20
        """
    )
