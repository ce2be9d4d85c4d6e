"""Core event/address model.

Reference equivalents (cited for parity, not ported):
- Event:            stateflow/dataflow/event.py:65-98
- FunctionAddress:  stateflow/dataflow/address.py:61-99
- EventType:        stateflow/dataflow/event.py:9-62
- InternalClassRef wire form: stateflow/dataflow/event_flow.py:34-59
"""

from __future__ import annotations

import itertools
import pickle
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Optional


class EventType(str, Enum):
    # requests (reference Request.* — event.py:9-33)
    INIT_CLASS = "init_class"
    INVOKE_STATEFUL = "invoke_stateful"
    GET_STATE = "get_state"
    UPDATE_STATE = "update_state"
    FIND_CLASS = "find_class"
    FLOW = "event_flow"
    PING = "ping"
    # replies (reference Reply.* — event.py:36-62)
    OK = "ok"
    ERROR = "error"
    KEY_NOT_FOUND = "key_not_found"
    PONG = "pong"


@dataclass(frozen=True)
class EntityRef:
    """Serializable pointer to one entity instance: (entity_name, key).

    The reference tags these on the wire as {"_type": "InternalClassRef"}
    (event_flow.py:34-59); here the dataclass itself pickles cleanly into
    event payloads and state dicts.
    """

    entity: str
    key: str

    def __repr__(self) -> str:  # compact in logs
        return f"{self.entity}({self.key})"


_event_seq = itertools.count()


@dataclass
class Event:
    """One unit of work addressed to an entity key (or a reply).

    payload contents by type:
      INIT_CLASS:       {"args": tuple, "kwargs": dict}
      INVOKE_STATEFUL:  {"method": str, "args": tuple}
      GET_STATE:        {"attr": str}
      UPDATE_STATE:     {"attr": str, "value": Any}
      FLOW:             {"flow": FlowState}
      replies:          {"result": Any} | {"error": str}
    """

    event_id: str
    entity: str
    key: Optional[str]
    event_type: EventType
    payload: dict[str, Any] = field(default_factory=dict)
    # deterministic tiebreak for per-key ordering inside a superstep
    seq: int = field(default_factory=lambda: next(_event_seq))

    def reply(self, event_type: EventType, **payload: Any) -> "Event":
        return Event(
            event_id=self.event_id,
            entity=self.entity,
            key=self.key,
            event_type=event_type,
            payload=payload,
        )

    # -- wire form (pickle: state dicts hold arbitrary python values, like
    #    the reference's pickle serializer, stateflow/serialization/...) --
    def to_bytes(self) -> bytes:
        return pickle.dumps(self, protocol=pickle.HIGHEST_PROTOCOL)

    @staticmethod
    def from_bytes(b: bytes) -> "Event":
        return pickle.loads(b)
