"""Fail-loudly compiler boundaries: constructs whose split would silently
change evaluation count or placement are rejected at flow-compile time
(ADVICE round 1: hoisting out of comprehensions/lambdas/try blocks executed
calls the wrong number of times / outside the construct)."""

from __future__ import annotations

from contextlib import contextmanager

import pytest

from stateflow_spark.entity import LocalRuntime, entity
from stateflow_spark.entity import registry as _registry

# registers the shared fixture corpus (B has add_balance/set_balance)
from tests.test_entity_local import B  # noqa: F401


@contextmanager
def temp_entity(cls):
    """Register a class for one test, then drop it so a rejected flow does
    not poison the global registry for later tests."""
    name = cls.__name__
    try:
        yield entity(cls)
    finally:
        _registry._REGISTRY.pop(name, None)
        _registry._linked = False


def expect_reject(cls, method, *args, match):
    # flow compilation is lazy: the first registry use (here, create) links
    # and compiles every registered flow, so the rejection surfaces there
    with temp_entity(cls):
        rt = LocalRuntime()
        with pytest.raises(NotImplementedError, match=match):
            inst = rt.create(cls, "x1")
            sink = rt.create(B, f"sink-{cls.__name__}")
            rt.invoke(inst, method, *((sink,) + args))


def test_reject_call_in_list_comprehension():
    class CompCall:
        def __init__(self, name: str):
            self.name = name

        def go(self, other: B):
            return [other.add_balance(1) for _ in range(3)]

        def __key__(self):
            return self.name

    expect_reject(CompCall, "go", match="list comprehension")


def test_reject_call_in_generator():
    class GenCall:
        def __init__(self, name: str):
            self.name = name

        def go(self, other: B):
            return sum(other.add_balance(1) or 0 for _ in range(3))

        def __key__(self):
            return self.name

    expect_reject(GenCall, "go", match="generator expression")


def test_reject_call_in_lambda():
    class LambdaCall:
        def __init__(self, name: str):
            self.name = name

        def go(self, other: B):
            f = lambda: other.add_balance(1)  # noqa: E731
            return f()

        def __key__(self):
            return self.name

    expect_reject(LambdaCall, "go", match="lambda")


def test_reject_call_in_try():
    class TryCall:
        def __init__(self, name: str):
            self.name = name

        def go(self, other: B):
            try:
                other.add_balance(1)
            except ValueError:
                pass
            return 1

        def __key__(self):
            return self.name

    expect_reject(TryCall, "go", match="cannot be split")


def test_reject_call_in_try_star():
    """try/except* (3.11+) carries the same outside-protection hazard as
    plain try and must be rejected, not silently hoisted (round-2 ADVICE)."""

    class TryStarCall:
        def __init__(self, name: str):
            self.name = name

        def go(self, other: B):
            try:
                other.add_balance(1)
            except* ValueError:
                pass
            return 1

        def __key__(self):
            return self.name

    expect_reject(TryStarCall, "go", match="cannot be split")


def test_reject_call_in_match():
    """A match statement with external calls in case bodies would have every
    case's calls hoisted and run unconditionally (round-2 ADVICE: a 2-case
    match executed both add_balance calls) — reject loudly instead."""

    class MatchCall:
        def __init__(self, name: str):
            self.name = name

        def go(self, other: B, v: int):
            match v:
                case 1:
                    other.add_balance(10)
                case _:
                    other.add_balance(20)
            return v

        def __key__(self):
            return self.name

    expect_reject(MatchCall, "go", 1, match="cannot be split")


def test_reject_return_in_match_without_calls():
    """A match/try/with containing `return` (even with NO external calls)
    cannot be exec'd whole — it must be rejected at compile time, not
    crash with SyntaxError('return' outside function) at invoke time
    (round-3 review finding)."""

    class MatchReturn:
        def __init__(self, name: str):
            self.name = name

        def go(self, other: B, v: int):
            match v:
                case 1:
                    return "one"
            other.add_balance(v)
            return "other"

        def __key__(self):
            return self.name

    expect_reject(MatchReturn, "go", 1, match="cannot be split")


def test_match_without_external_call_still_compiles():
    class CleanMatch:
        def __init__(self, name: str):
            self.name = name
            self.tag: str = ""

        def go(self, other: B, v: int):
            match v:
                case 1:
                    self.tag = "one"
                case _:
                    self.tag = "other"
            other.add_balance(v)
            return self.tag

        def __key__(self):
            return self.name

    with temp_entity(CleanMatch):
        rt = LocalRuntime()
        c = rt.create(CleanMatch, "cm1")
        sink = rt.create(B, "cm-sink")
        assert rt.invoke(c, "go", sink, 1) == "one"
        assert rt.get_attr(sink, "balance") == 1


def test_reject_call_in_dict_comprehension():
    class DictCall:
        def __init__(self, name: str):
            self.name = name

        def go(self, other: B):
            return {i: other.add_balance(i) for i in range(2)}

        def __key__(self):
            return self.name

    expect_reject(DictCall, "go", match="dict comprehension")


def test_comprehension_without_external_call_still_compiles():
    class CleanComp:
        def __init__(self, name: str):
            self.name = name
            self.total: int = 0

        def go(self, other: B):
            vals = [i * 2 for i in range(4)]
            other.add_balance(sum(vals))
            self.total = max(v for v in vals)
            return self.total

        def __key__(self):
            return self.name

    with temp_entity(CleanComp):
        rt = LocalRuntime()
        c = rt.create(CleanComp, "cc1")
        sink = rt.create(B, "cc-sink")
        assert rt.invoke(c, "go", sink) == 6
        assert rt.get_attr(sink, "balance") == 12


def test_tuple_unpack_for_loop_flow():
    """`for a, b in pairs:` with an external call in the body — desugared to
    a temp target + unpacking assignment (round-1 VERDICT next-round #7)."""

    class PairLoop:
        def __init__(self, name: str):
            self.name = name
            self.acc: int = 0

        def go(self, other: B, pairs: list):
            for k, v in pairs:
                other.add_balance(v)
                self.acc += k
            return self.acc

        def __key__(self):
            return self.name

    with temp_entity(PairLoop):
        rt = LocalRuntime()
        p = rt.create(PairLoop, "pl1")
        sink = rt.create(B, "pl-sink")
        out = rt.invoke(p, "go", sink, [(1, 10), (2, 20), (3, 30)])
        assert out == 6
        assert rt.get_attr(sink, "balance") == 60
        assert rt.get_attr(p, "acc") == 6


def test_posonly_params_bind():
    """Positional-only params (`/`) must bind like plain positional params
    (round-1 ADVICE: they were silently dropped → misbound arguments)."""

    class PosOnly:
        def __init__(self, name: str):
            self.name = name
            self.v: int = 0

        def set_v(self, a: int, b: int, /, c: int) -> int:
            self.v = a * 100 + b * 10 + c
            return self.v

        def __key__(self):
            return self.name

    with temp_entity(PosOnly):
        rt = LocalRuntime()
        p = rt.create(PosOnly, "po1")
        assert rt.invoke(p, "set_v", 1, 2, 3) == 123
        assert rt.get_attr(p, "v") == 123
