"""Reflection wrapper: run real entity methods against a state dict
(reference: stateflow/wrappers/class_wrapper.py — init_class :58-81,
invoke :113-149, state diff :98-104)."""

from __future__ import annotations

from typing import Any

from stateflow_spark.entity.descriptors import ClassDesc
from stateflow_spark.entity.model import EntityRef


def init_instance(cls: type, desc: ClassDesc, args: tuple, kwargs: dict) -> tuple[str, dict]:
    """Run __init__ + __key__ → (key, initial state dict)."""
    obj = cls(*args, **kwargs)
    key = obj.__key__()
    if not isinstance(key, str):
        key = str(key)
    state = {a: obj.__dict__.get(a) for a in desc.state_hints}
    return key, state


def invoke(
    cls: type, desc: ClassDesc, state: dict, method: str, args: tuple
) -> tuple[Any, dict]:
    """Rehydrate (no __init__), call, and diff the state back out."""
    obj = cls.__new__(cls)
    obj.__dict__.update(state)
    result = getattr(obj, method)(*args)
    new_state = {a: obj.__dict__.get(a) for a in desc.state_hints}
    return result, new_state


def resolve_ref_args(args: tuple) -> tuple:
    """Entity-ref args stay as EntityRef inside state/payloads; plain values
    pass through. (Client-side binding; reference class_ref.py:93-115.)"""
    return tuple(a if not hasattr(a, "_ref") else a._ref for a in args)


def make_ref(entity: str, key: str) -> EntityRef:
    return EntityRef(entity=entity, key=key)
