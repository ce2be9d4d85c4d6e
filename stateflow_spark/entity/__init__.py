"""Stateful-entity engine: the Spark-first re-expression of the reference's
actor model (delftdata/stateflow).

A decorated Python class becomes a keyed stateful entity type: one state row
per key, methods invoked by events. Methods that touch *other* entities are
compiled to a serializable instruction list (``compiler.py``) and executed by
a resumable interpreter (``interpreter.py``) that hops between keys — the
Spark-native equivalent of the reference's EventFlowGraph
(stateflow/dataflow/event_flow.py), designed fresh for Arrow/DataFrame
execution rather than ported.

Public surface:
    @entity          — register a class (reference: @stateflow.stateflow,
                       stateflow/core.py:23-68)
    LocalRuntime     — in-process synchronous executor (reference:
                       stateflow/util/local_runtime.py)
    SuperstepRuntime — distributed batch-iterative executor on Spark
                       (stateflow_spark/streaming/superstep.py)
"""

from stateflow_spark.entity.registry import entity, get_registry, clear_registry  # noqa: F401
from stateflow_spark.entity.model import Event, EventType, EntityRef  # noqa: F401
from stateflow_spark.entity.local import LocalRuntime  # noqa: F401
