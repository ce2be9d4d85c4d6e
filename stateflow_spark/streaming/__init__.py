"""Distributed execution of the entity engine on Spark.

- superstep.py: BSP batch-iterative runtime (state AND in-flight flow
  hops live as distributed DataFrames across supersteps; only replies
  reach the driver — the analog of the reference's `reply` Kafka topic,
  with hops looping cluster-side like its `internal` topic).
- windows.py / stateful.py: Structured Streaming faces (event-time windows,
  dedup, applyInPandasWithState operator).
"""
