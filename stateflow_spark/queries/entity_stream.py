"""Driver-visible replay through the CONTINUOUS entity engine
(StreamingEntityEngine) — round-4 VERDICT "Next round" #7.

`entity_stateful_replay` measures the raw stateful operator
(applyInPandasWithState) at relational volume; `entity_ycsb_replay` is the
batch fold; the superstep engine has `entity_flow_golden`. This query
gives the continuous engine itself a hash-gated row: the events table is
replayed as per-event InvokeStateful calls across MULTIPLE micro-batches
of one long-running checkpointed query (state persists in the state store
between batches), and the final state is read back through GET_STATE
events — the engine's own API, not a side channel.

Exactness: the entity folds integer ten-thousandths (each event's value
quantized driver-side exactly like the oracle's CAST(value AS
DECIMAL(38,4))), so the fold is commutative/associative and immune to
micro-batch boundaries; the units→double conversion at the end replays
the oracle's decimal→double cast. Driver-side event construction is the
client role (the engine's send() IS the producer API) — bounded by burst
size, same accepted cost as the superstep client (superstep.py:12-13).

Scale shape: one groupBy(entity, key) shuffle per micro-batch into the
state store's partitions; per-key state is four scalars. Event volume per
batch is the client burst; state size tracks key cardinality only.
"""

from __future__ import annotations

import decimal
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from stateflow_spark.catalog import load
from stateflow_spark.entity.registry import entity, get_registry
from stateflow_spark.queries.common import register

_Q4 = decimal.Decimal("0.0001")


def _replay_class():
    reg = get_registry()
    if "ReplayAccount" in reg:
        return

    @entity
    class ReplayAccount:
        def __init__(self, acct: str):
            self.acct: str = acct
            self.units: int = 0
            self.n_reads: int = 0
            self.n_updates: int = 0

        def apply(self, delta_units: int, reads: int, updates: int):
            self.units += delta_units
            self.n_reads += reads
            self.n_updates += updates

        def __key__(self):
            return self.acct


def _units(v: float) -> int:
    # CAST(double AS DECIMAL(38,4)): shortest repr, HALF_UP to 4 places
    return int(
        decimal.Decimal(repr(float(v))).quantize(
            _Q4, rounding=decimal.ROUND_HALF_UP
        ).scaleb(4)
    )


@register(
    "entity_stream_replay",
    oracle="""
    SELECT user_id AS key,
           100.0 + CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
                                      WHEN event_type = 'error' THEN -value
                                      ELSE 0.0 END AS DECIMAL(38,4)))
                   AS DOUBLE) AS balance,
           COUNT(*) FILTER (event_type IN ('view', 'click')) AS n_reads,
           COUNT(*) FILTER (event_type IN ('purchase', 'error')) AS n_updates
    FROM events
    GROUP BY user_id
    """,
    tags=("entity", "streaming", "stateful"),
)
def entity_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event in the events table dispatched per-event through the
    continuous engine in 3 client bursts (≥3 micro-batches + init + read),
    final per-key state read back via GET_STATE; must equal the batch
    fold."""
    from stateflow_spark.entity import operator
    from stateflow_spark.entity.model import Event, EventType
    from stateflow_spark.streaming.stateful import StreamingEntityEngine

    _replay_class()
    rows = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type", "value")
        .collect()
    )
    keys = sorted({r.user_id for r in rows})

    eng = StreamingEntityEngine(
        spark,
        tempfile.mkdtemp(prefix="entity-stream-replay-"),
        shuffle_partitions=8,
    )
    try:
        eng.send(
            [operator.make_init_event("ReplayAccount", (str(k),)) for k in keys]
        )
        eng.start()
        eng.drain()

        def invoke(r):
            if r.event_type == "purchase":
                args = (_units(r.value), 0, 1)
            elif r.event_type == "error":
                args = (-_units(r.value), 0, 1)
            elif r.event_type in ("view", "click"):
                args = (0, 1, 0)
            else:
                args = (0, 0, 0)
            from stateflow_spark.entity.model import EntityRef

            return operator.make_invoke_event(
                EntityRef("ReplayAccount", str(r.user_id)), "apply", args
            )

        n = len(rows)
        for i in range(3):  # 3 bursts → ≥3 stateful micro-batches
            eng.send([invoke(r) for r in rows[i * n // 3 : (i + 1) * n // 3]])
            eng.drain()

        gets = {
            (k, attr): Event(
                str(uuid.uuid4()),
                "ReplayAccount",
                str(k),
                EventType.GET_STATE,
                {"attr": attr},
            )
            for k in keys
            for attr in ("units", "n_reads", "n_updates")
        }
        eng.send(list(gets.values()))
        eng.drain()
        replies = eng.replies()
    finally:
        eng.stop()

    def got(k, attr):
        return replies[gets[(k, attr)].event_id].payload["result"]

    out = []
    for k in keys:
        bal = 100.0 + float(decimal.Decimal(got(k, "units")).scaleb(-4))
        out.append((k, bal, got(k, "n_reads"), got(k, "n_updates")))
    return spark.createDataFrame(
        out, "key BIGINT, balance DOUBLE, n_reads BIGINT, n_updates BIGINT"
    )
