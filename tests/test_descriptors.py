"""Descriptor-extraction rules (reference analog:
tests/analysis/extract_stateful_test.py:43-634 — schema merging,
conflicting-hint errors, param restrictions, read-only detection,
class linking)."""

from __future__ import annotations

import pytest

from stateflow_spark.entity.descriptors import extract_class_desc

# registered fixtures give linking context
from tests.test_entity_local import B, Item, User  # noqa: F401
from stateflow_spark.entity.registry import get_registry


class SchemaMerge:
    def __init__(self, name: str):
        self.name: str = name
        self.x = 0  # NoType here...

    def later(self):
        self.x: int = 1  # ...typed later — merges to int
        self.y = "a"

    def __key__(self):
        return self.name


def test_state_schema_merges_across_methods():
    desc = extract_class_desc(SchemaMerge)
    assert desc.state_hints == {"name": "str", "x": "int", "y": "NoType"}


def test_conflicting_hints_rejected():
    class Conflicted:
        def __init__(self, name: str):
            self.v: int = 0
            self.name = name

        def other(self):
            self.v: str = "x"

        def __key__(self):
            return self.name

    with pytest.raises(TypeError, match="conflicting type hints for self.v"):
        extract_class_desc(Conflicted)


def test_defaults_and_varargs_rejected():
    class Defaulted:
        def __init__(self, name: str):
            self.name = name

        def m(self, x: int = 3):
            return x

        def __key__(self):
            return self.name

    with pytest.raises(TypeError, match="defaults are not"):
        extract_class_desc(Defaulted)

    class VarArgs:
        def __init__(self, name: str):
            self.name = name

        def m(self, *xs):
            return xs

        def __key__(self):
            return self.name

    with pytest.raises(TypeError, match=r"\*args"):
        extract_class_desc(VarArgs)


def test_missing_key_rejected():
    from stateflow_spark.entity import entity

    class NoKey:
        def __init__(self, name: str):
            self.name = name

    with pytest.raises(TypeError, match="__key__"):
        entity(NoKey)


def test_read_only_and_write_set_detection():
    """Reference: methods without self-writes flagged read_only
    (extract_method_descriptor.py:37-38,190-232)."""
    reg = get_registry()
    item = reg["Item"].desc.methods
    assert item["update_stock"].read_only is False
    assert item["update_stock"].writes == {"stock"}
    b = reg["B"].desc.methods
    assert b["balance_equal_to"].read_only is True
    assert b["balance_equal_to"].writes == set()


def test_entity_param_linking():
    """Params typed as a registered entity (or List[entity]) mark the
    method linked → flow-compiled (method_descriptor.py:115-143)."""
    reg = get_registry()
    user = reg["User"].desc.methods
    buy = user["buy_item"]
    assert buy.linked
    assert [(p.name, p.entity, p.is_entity_list) for p in buy.params] == [
        ("amount", None, False),
        ("item", "Item", False),
    ]
    loops = user["simple_for_loops"]
    assert [(p.entity, p.is_entity_list) for p in loops.params] == [("User", True)]
    assert not user["update_balance"].linked
    assert "update_balance" not in reg["User"].flows  # unlinked → no flow
    assert "buy_item" in reg["User"].flows


def test_async_method_rejected():
    """async def entity methods fail loudly at extraction — silently
    skipping them would drop their state writes from the schema and leave
    the method uninvokable (round-3 fail-loudly sweep)."""

    class AsyncMethod:
        def __init__(self, name: str):
            self.name = name

        async def go(self, x: int):
            self.name = str(x)

        def __key__(self):
            return self.name

    with pytest.raises(TypeError, match="async entity methods"):
        extract_class_desc(AsyncMethod)
