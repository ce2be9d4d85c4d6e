"""Distributed execution of the entity engine on Spark.

- superstep.py: BSP batch-iterative runtime (state as a distributed
  DataFrame; flow hops loop through the driver like the reference's
  `internal` Kafka topic loops through the broker).
- windows.py / stateful.py: Structured Streaming faces (event-time windows,
  dedup, applyInPandasWithState operator).
"""
