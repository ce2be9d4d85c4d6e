"""SuperstepRuntime: distributed BSP execution of the entity engine.

Spark cannot express a cyclic streaming dataflow, and the reference has the
same constraint — it loops flow hops through an external `internal` Kafka
topic (stateflow/runtime/beam_runtime.py:192-204, SURVEY.md §3.3). Here each
loop iteration is one Spark job (a superstep):

    events ⟗ state  (cogroup on (entity, key))
        → applyInPandas: per-key serial event handling (Arrow-batched)
        → state' rows + replies + hop events

State AND in-flight hop events stay distributed across all supersteps
(round 5: hops loop cluster-side straight into the next cogroup; the
round-4 form collected them). Only replies — the client-facing output,
the reference's reply topic — come to the driver, plus one count per
superstep as the loop condition. Per-key serial execution inside a group
gives the reference's single-writer-per-key consistency
(stateful_operator per-key handling; AWS variant's lock,
aws/abstract_lambda.py:80-99); cross-key flows keep its non-isolated
semantics.

Scale: groups are per entity key — Spark hash-partitions them; skewed hot
keys are bounded by per-key event counts, not data volume. State never
collects to the driver; a production deployment would persist `state_df`
between batches (parquet/Delta) instead of holding it cached.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from typing import Any, Iterable, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from stateflow_spark.entity import operator
from stateflow_spark.entity.interpreter import StateStore
from stateflow_spark.entity.model import EntityRef, Event, EventType
from stateflow_spark.storage import unpersist_local_checkpoint

EVENT_SCHEMA = "entity string, key string, seq long, blob binary"
STATE_SCHEMA = "entity string, key string, blob binary"
OUT_SCHEMA = "kind string, entity string, key string, seq long, blob binary"


class _SingleKeyStore(StateStore):
    """The store one cogroup activation sees: it owns exactly one key."""

    def __init__(self, entity: str, key: str, state: Optional[dict]):
        self.entity = entity
        self.key = key
        self.state = state

    def owns(self, ref: EntityRef) -> bool:
        return ref.entity == self.entity and ref.key == self.key

    def get(self, ref: EntityRef) -> Optional[dict]:
        assert self.owns(ref), f"store for {self.entity}({self.key}) asked for {ref}"
        return self.state

    def put(self, ref: EntityRef, state: dict) -> None:
        assert self.owns(ref)
        self.state = state


def _make_step_fn(registry_blob: bytes, serde=None):
    """Build the cogroup function; ships the linked+compiled registry to the
    python workers (the registry module is re-populated there, so entity
    classes defined in test/user modules need no importable path). The wire
    serde (Pickle default; Json/Proto/Cloudpickle per deployment) travels in
    the closure — it is a stateless object."""

    def step(keys, events_pdf: pd.DataFrame, state_pdf: pd.DataFrame):
        from stateflow_spark.entity import registry as reg_mod
        from stateflow_spark.serde import PickleSerde

        sd = serde or PickleSerde()
        reg_mod.install_worker_registry(registry_blob)

        entity_name, key = keys
        state = (
            pickle.loads(state_pdf["blob"].iloc[0]) if len(state_pdf) else None
        )
        store = _SingleKeyStore(entity_name, key, state)

        out: list[tuple] = []
        if len(events_pdf):
            for _, row in events_pdf.sort_values("seq").iterrows():
                ev: Event = sd.from_bytes(row["blob"])
                res = operator.handle(ev, store)
                for r in res.replies:
                    out.append(("reply", entity_name, key, r.seq, sd.to_bytes(r)))
                for h in res.hops:
                    out.append(("hop", h.entity, h.key, h.seq, sd.to_bytes(h)))
        if store.state is not None:
            out.append(("state", entity_name, key, 0, pickle.dumps(store.state)))
        return pd.DataFrame(
            out, columns=["kind", "entity", "key", "seq", "blob"]
        )

    return step


@dataclass
class RunResult:
    replies: dict[str, Event] = field(default_factory=dict)  # event_id → reply
    state_df: Optional[DataFrame] = None
    supersteps: int = 0

    def result_of(self, event: Event) -> Any:
        reply = self.replies[event.event_id]
        if reply.event_type == EventType.ERROR:
            raise RuntimeError(reply.payload["error"])
        if reply.event_type == EventType.KEY_NOT_FOUND:
            raise KeyError(f"{reply.entity}({reply.key}) not found")
        return reply.payload.get("result")

    def collect_state(self) -> dict[tuple[str, str], dict]:
        rows = self.state_df.collect()
        return {(r.entity, r.key): pickle.loads(bytes(r.blob)) for r in rows}


class SuperstepRuntime:
    def __init__(
        self,
        spark: SparkSession,
        max_supersteps: int = 200,
        serde=None,
        shuffle_partitions: Optional[int] = None,
    ):
        """serde: wire format for events on the shuffle/reply path
        (stateflow_spark.serde.{Pickle,Json,Proto,Cloudpickle}Serde;
        default Pickle — the reference's serializer choice knob).

        shuffle_partitions: partition count for the per-superstep cogroup
        shuffle, applied on a cloned session (caller conf untouched). Each
        superstep pays one task per partition; size it to the keyed-state
        cardinality, not to a session-wide analytics setting."""
        from stateflow_spark.serde import PickleSerde

        if shuffle_partitions is not None:
            spark = spark.newSession()
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        self.spark = spark
        self.max_supersteps = max_supersteps
        self.serde = serde or PickleSerde()

    # -- durable state ------------------------------------------------------
    @staticmethod
    def save_state(state_df: DataFrame, path: str) -> None:
        """Persist an entity-state snapshot (the production between-batches
        story: state lives in parquet/Delta, not driver memory)."""
        state_df.write.mode("overwrite").parquet(path)

    def load_state(self, path: str) -> DataFrame:
        return self.spark.read.parquet(path)

    def _events_df(self, events: Iterable[Event]) -> DataFrame:
        rows = [(e.entity, e.key, e.seq, self.serde.to_bytes(e)) for e in events]
        return self.spark.createDataFrame(rows, EVENT_SCHEMA)

    def run(
        self,
        events: list[Event],
        state_df: Optional[DataFrame] = None,
    ) -> RunResult:
        import sys

        import cloudpickle

        from stateflow_spark.entity.registry import get_registry

        # entity classes live in user/test modules the Python workers can't
        # necessarily import — embed their definitions in the blob instead of
        # referencing them by module path
        reg = dict(get_registry())
        mods = {
            et.cls.__module__: sys.modules[et.cls.__module__]
            for et in reg.values()
            if et.cls.__module__ in sys.modules
            and not et.cls.__module__.startswith("stateflow_spark")
        }
        by_value = []
        for mod in mods.values():
            cloudpickle.register_pickle_by_value(mod)
            by_value.append(mod)
        try:
            registry_blob = cloudpickle.dumps(reg)
        finally:
            for mod in by_value:
                cloudpickle.unregister_pickle_by_value(mod)
        step = _make_step_fn(registry_blob, self.serde)

        if state_df is None:
            state_df = self.spark.createDataFrame([], STATE_SCHEMA)

        result = RunResult()
        events_df = self._events_df(events)
        n_pending = len(events)
        # checkpoints created by THIS run's previous superstep — the only
        # ones safe to release. The caller's input state_df must survive
        # (it may be the base of several runs, e.g. branching from one
        # save_state snapshot), and a localCheckpoint'd RDD is
        # unrecoverable once its blocks are dropped (lineage truncated).
        own_ckpts: tuple = ()
        while n_pending:
            result.supersteps += 1
            if result.supersteps > self.max_supersteps:
                raise RuntimeError(
                    f"flows still in flight after {self.max_supersteps} supersteps"
                )
            out = (
                events_df.groupBy("entity", "key")
                .cogroup(state_df.groupBy("entity", "key"))
                .applyInPandas(step, OUT_SCHEMA)
                .persist()
            )
            # replies are the client-facing output (the reference's reply
            # topic) — the ONLY rows that reach the driver. Hop events loop
            # CLUSTER-SIDE: the out rows already carry EVENT_SCHEMA, so the
            # hop filter feeds the next superstep's cogroup directly —
            # in-flight flow payloads never round-trip through the driver
            # (the round-4 form collected them; only their count comes back
            # now, as the loop condition).
            for r in out.filter(out.kind == "reply").collect():
                ev = self.serde.from_bytes(bytes(r.blob))
                result.replies[ev.event_id] = ev
            # localCheckpoint truncates lineage — without it every superstep's
            # plan chains all previous ones (heap blow-up, replanning cost).
            # ONE combined checkpoint for state+hops (round 8): the reply
            # rows still skip checkpoint durability (checkpointing the whole
            # `out` measured ~30% slower on the YCSB T mix), but state and
            # hops share a single materialization job instead of two —
            # the per-superstep fixed cost drops ~9% on the T mix (2
            # supersteps) and run-to-run variance tightens; the downstream
            # kind-filters are cheap scans of the checkpointed blocks
            carry = out.filter(out.kind != "reply").localCheckpoint()
            state_df = carry.filter(carry.kind == "state").select(
                "entity", "key", "blob"
            )
            events_df = carry.filter(carry.kind == "hop").select(
                "entity", "key", "seq", "blob"
            )
            out.unpersist()
            # the new checkpoint has materialized — release the previous
            # superstep's (never the caller's input, never the returned
            # final state) instead of waiting for driver GC +
            # ContextCleaner, so executor storage stays O(1) in superstep
            # count rather than O(rounds) (round-5 ADVICE)
            for df in own_ckpts:
                unpersist_local_checkpoint(df)
            own_ckpts = (carry,)
            n_pending = events_df.count()

        result.state_df = state_df
        return result
