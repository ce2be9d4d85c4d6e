"""Client surface: entity proxies + futures (reference parity for ops
#24/#25 — stateflow/client/class_ref.py:17-259, client/future.py:31-124,
kafka transport client/kafka_client.py:17-249).

The reference intercepts class construction with a metaclass and turns
attribute access / method calls into events completed by a Kafka consumer
thread. Here the same surface sits over a pluggable ``Transport``:

- LocalTransport      — synchronous in-process execution (reference
                        LocalRuntime analog)
- SuperstepTransport  — batches events; a flush runs them as one
                        distributed SuperstepRuntime job (state persists
                        across flushes)
- StreamingTransport  — sends into a running StreamingEntityEngine; a
                        flush drains the continuous query

Futures complete at flush time (micro-batch semantics); ``Future.get()``
flushes implicitly, so sequential client code reads naturally while
batch-minded code can queue many calls and flush once — the 100 TB
pattern, since per-event round trips are the reference's defining cost
(SURVEY.md §3.3)."""

from __future__ import annotations

from typing import Any, Optional

from stateflow_spark.entity import operator
from stateflow_spark.entity.model import EntityRef, Event, EventType
from stateflow_spark.entity.registry import get_entity_type


class Future:
    """Completes when its reply arrives (reference StateflowFuture,
    client/future.py:31-124): ERROR → RuntimeError, KEY_NOT_FOUND →
    KeyError, else the unwrapped result."""

    def __init__(self, client: "Client", event: Event):
        self._client = client
        self._event = event
        self._reply: Optional[Event] = None

    @property
    def event_id(self) -> str:
        return self._event.event_id

    def complete(self, reply: Event) -> None:
        self._reply = reply

    @property
    def is_done(self) -> bool:
        return self._reply is not None

    def __await__(self):
        """Awaitable form (reference AsyncClassRef, client/class_ref.py):
        the blocking flush runs in a worker thread so an event loop can
        drive many outstanding futures concurrently."""
        import asyncio

        async def _aget():
            if self._reply is None:
                await asyncio.to_thread(self._client.flush)
            return self.get()

        return _aget().__await__()

    def get(self) -> Any:
        if self._reply is None:
            self._client.flush()
        reply = self._reply
        assert reply is not None, "flush did not complete this future"
        if reply.event_type == EventType.ERROR:
            raise RuntimeError(reply.payload["error"])
        if reply.event_type == EventType.KEY_NOT_FOUND:
            raise KeyError(f"{reply.entity}({reply.key}) not found")
        result = reply.payload.get("result")
        if isinstance(result, EntityRef):
            return EntityHandle(self._client, result)
        return result


class MethodRef:
    """A bound method on an entity handle; calling it sends an event and
    returns a Future (reference client/class_ref.py:37-58)."""

    def __init__(self, client: "Client", ref: EntityRef, method: str):
        self._client = client
        self._ref = ref
        self._method = method

    def __call__(self, *args: Any) -> Future:
        args = tuple(
            a._ref if isinstance(a, EntityHandle) else a for a in args
        )
        return self._client._submit(
            operator.make_invoke_event(self._ref, self._method, args)
        )


class EntityHandle:
    """Client-side pointer to one entity instance (reference ClassRef).

    - handle.method(args)   → Future (event round trip)
    - handle.attr           → synchronous GET_STATE read
    - handle.attr = value   → UPDATE_STATE (flushed immediately)
    """

    def __init__(self, client: "Client", ref: EntityRef):
        object.__setattr__(self, "_client", client)
        object.__setattr__(self, "_ref", ref)

    @property
    def ref(self) -> EntityRef:
        return self._ref

    def __getattr__(self, name: str) -> Any:
        et = get_entity_type(self._ref.entity)
        if name in et.desc.methods and not name.startswith("__"):
            return MethodRef(self._client, self._ref, name)
        ev = Event(
            event_id=_fresh_id(),
            entity=self._ref.entity,
            key=self._ref.key,
            event_type=EventType.GET_STATE,
            payload={"attr": name},
        )
        return self._client._submit(ev).get()

    def __setattr__(self, name: str, value: Any) -> None:
        ev = Event(
            event_id=_fresh_id(),
            entity=self._ref.entity,
            key=self._ref.key,
            event_type=EventType.UPDATE_STATE,
            payload={"attr": name, "value": value},
        )
        self._client._submit(ev).get()

    def __repr__(self) -> str:
        return f"EntityHandle({self._ref})"


def _fresh_id() -> str:
    import uuid

    return str(uuid.uuid4())


class ClassClient:
    """Per-entity-type factory: ``client.entity(User)("kyle")`` creates an
    instance (reference: calling the wrapped class itself, meta_wrapper
    interception)."""

    def __init__(self, client: "Client", cls_name: str):
        self._client = client
        self._cls_name = cls_name

    def __call__(self, *args: Any, **kwargs: Any) -> Future:
        ev = operator.make_init_event(self._cls_name, args, kwargs)
        return self._client._submit(ev)

    def by_key(self, key: str) -> EntityHandle:
        """Handle for an assumed-existing key (no round trip)."""
        return EntityHandle(self._client, EntityRef(self._cls_name, key))


class Client:
    def __init__(self, transport: "Transport"):
        import threading

        self._transport = transport
        self._pending: dict[str, Future] = {}
        # one flush at a time: concurrent awaiters (async futures) must not
        # interleave on the transport queue — the first flush settles all,
        # later ones see nothing pending and return
        self._flush_lock = threading.Lock()

    def entity(self, cls: type | str) -> ClassClient:
        name = cls if isinstance(cls, str) else cls.__name__
        get_entity_type(name)  # validate registration
        return ClassClient(self, name)

    def find(self, cls: type | str, key: str) -> Future:
        """FIND_CLASS (reference stateflow.find, op #9)."""
        name = cls if isinstance(cls, str) else cls.__name__
        ev = Event(
            event_id=_fresh_id(),
            entity=name,
            key=key,
            event_type=EventType.FIND_CLASS,
        )
        return self._submit(ev)

    def ping(self) -> bool:
        """Health check (reference op #27). PING short-circuits in the
        operator without touching state; any registered entity type works
        as the routing target."""
        from stateflow_spark.entity.registry import get_registry

        reg = get_registry()
        if not reg:
            raise RuntimeError("no entity types registered")
        name = next(iter(reg))
        ev = Event(
            event_id=_fresh_id(),
            entity=name,
            key="__ping__",
            event_type=EventType.PING,
        )
        reply = self._submit(ev)
        reply.get()  # PONG carries no result; errors raise
        return True

    def _submit(self, event: Event) -> Future:
        fut = Future(self, event)
        self._pending[event.event_id] = fut
        self._transport.send(event)
        return fut

    def flush(self) -> None:
        """Drive the transport until every pending future completes."""
        with self._flush_lock:
            self._flush_locked()

    def _flush_locked(self) -> None:
        if not self._pending:
            return
        replies = self._transport.flush()
        for eid, fut in list(self._pending.items()):
            if eid in replies:
                fut.complete(replies[eid])
                del self._pending[eid]
        still = [f._event for f in self._pending.values()]
        if still:
            raise RuntimeError(f"{len(still)} requests received no reply: {still[:3]}")


# -- transports -------------------------------------------------------------


class Transport:
    def send(self, event: Event) -> None:  # pragma: no cover - interface
        raise NotImplementedError

    def flush(self) -> dict[str, Event]:  # pragma: no cover - interface
        raise NotImplementedError


class LocalTransport(Transport):
    """Immediate in-process execution against a dict store."""

    def __init__(self):
        from stateflow_spark.entity.local import DictStore

        self.store = DictStore()
        self._replies: dict[str, Event] = {}

    def send(self, event: Event) -> None:
        for _ in range(100_000):
            res = operator.handle(event, self.store)
            if res.hops:
                event = res.hops[0]
                continue
            reply = res.replies[0]
            self._replies[reply.event_id] = reply
            return
        raise RuntimeError("flow did not terminate")

    def flush(self) -> dict[str, Event]:
        out, self._replies = self._replies, {}
        return out


class SuperstepTransport(Transport):
    """Queue events; flush runs them as one distributed superstep job.
    Entity state persists across flushes as a distributed DataFrame."""

    def __init__(self, spark):
        from stateflow_spark.streaming.superstep import SuperstepRuntime

        self._rt = SuperstepRuntime(spark)
        self._queue: list[Event] = []
        self._state_df = None

    def send(self, event: Event) -> None:
        self._queue.append(event)

    def flush(self) -> dict[str, Event]:
        if not self._queue:
            return {}
        batch, self._queue = self._queue, []
        res = self._rt.run(batch, state_df=self._state_df)
        self._state_df = res.state_df
        return res.replies


class StreamingTransport(Transport):
    """Send into a running StreamingEntityEngine; flush drains the
    continuous query and collects the reply sink."""

    def __init__(self, engine):
        self._engine = engine
        self._seen: set[str] = set()

    def send(self, event: Event) -> None:
        self._engine.send([event])

    def flush(self) -> dict[str, Event]:
        self._engine.drain()
        replies = self._engine.replies()
        fresh = {k: v for k, v in replies.items() if k not in self._seen}
        self._seen.update(fresh)
        return fresh


def kafka_record(event: Event) -> tuple[bytes, bytes]:
    """(key, value) producer record for an entity event — the client-side
    twin of streaming/kafka.py's encode_events column transform (same JSON
    key, same blob value), shared by KafkaTransport and tests."""
    import json

    key = json.dumps(
        {"entity": event.entity, "key": event.key, "seq": event.seq}
    ).encode()
    return key, event.to_bytes()


class KafkaTransport(Transport):
    """The reference's production client transport
    (stateflow/client/kafka_client.py:17-249): produce requests to the
    `{prefix}-request` topic, complete futures from `{prefix}-reply`.

    Pairs with streaming/kafka.py's KafkaEntityEngine. Needs the
    kafka-python client at runtime, OR any module exposing the same
    KafkaProducer/KafkaConsumer/TopicPartition surface via ``client_mod``
    — streaming/stub_broker.py is such a module, and tests/test_kafka.py
    runs this transport E2E against the stub-broker engine with it; a
    real broker exercises the default import path unmodified."""

    def __init__(
        self,
        brokers: str,
        prefix: str,
        timeout_s: float = 60.0,
        client_mod=None,
    ):
        if client_mod is None:
            try:
                import kafka as client_mod
            except ImportError as e:
                raise RuntimeError(
                    "KafkaTransport needs the kafka-python package"
                ) from e
        KafkaConsumer = client_mod.KafkaConsumer
        KafkaProducer = client_mod.KafkaProducer
        TopicPartition = client_mod.TopicPartition

        self._producer = KafkaProducer(bootstrap_servers=brokers)
        # Assign partitions EXPLICITLY and resolve end offsets NOW, before
        # any produce. A plain subscribe with auto_offset_reset='latest'
        # assigns lazily at first poll, so replies produced between send()
        # and that poll landed before the consumer's notion of "latest"
        # and were silently skipped → spurious TimeoutError in flush()
        # (round-4 ADVICE). seek_to_end fetches positions eagerly, so
        # everything produced after construction is visible.
        self._consumer = KafkaConsumer(
            bootstrap_servers=brokers,
            consumer_timeout_ms=int(timeout_s * 1000),
        )
        reply_topic = f"{prefix}-reply"
        parts = self._consumer.partitions_for_topic(reply_topic) or {0}
        tps = [TopicPartition(reply_topic, p) for p in sorted(parts)]
        self._consumer.assign(tps)
        self._consumer.seek_to_end(*tps)
        self._topic = f"{prefix}-request"
        self._pending: set[str] = set()

    def send(self, event: Event) -> None:
        key, value = kafka_record(event)
        self._pending.add(event.event_id)
        self._producer.send(self._topic, key=key, value=value)

    def flush(self) -> dict[str, Event]:  # pragma: no cover - needs broker
        self._producer.flush()
        out: dict[str, Event] = {}
        for msg in self._consumer:
            reply = Event.from_bytes(msg.value)
            if reply.event_id in self._pending:
                self._pending.discard(reply.event_id)
                out[reply.event_id] = reply
            if not self._pending:
                break
        if self._pending:
            raise TimeoutError(f"{len(self._pending)} events got no reply")
        return out
