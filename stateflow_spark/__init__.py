"""stateflow_spark — a PySpark-native engine with the query/data-processing
capabilities of delftdata/stateflow (reference studied at /root/reference/),
re-expressed Spark-first.

Layout
------
- ``session``    : tuned SparkSession factory (AQE, Arrow, shuffle sizing).
- ``catalog``    : testdata table loading / temp-view registration.
- ``queries``    : the declared relational + analytics operator inventory
                   (SURVEY.md §2), each with a DuckDB oracle where SQL can
                   express it.
- ``entity``     : the stateful-entity model (descriptor extraction, wrapper
                   reflection, batch keyed ops) — reference ops #4-9.
- ``streaming``  : Structured Streaming keyed stateful operator + event-time
                   window/dedup helpers — reference ops #1-3, #10-22.
- ``functions``  : training-data-pipeline functions (text, dedup, similarity,
                   multimodal).
"""

__version__ = "0.1.0"

from stateflow_spark.session import get_spark  # noqa: F401
