"""Failure semantics: user-code exceptions become error replies — never a
crashed runtime/task (reference: class_wrapper.py:113-149 converts
invocation failures to FailedInvocation replies)."""

from __future__ import annotations

import pytest

from stateflow_spark.entity import LocalRuntime, entity, operator
from stateflow_spark.entity.model import EntityRef


@entity
class Fragile:
    def __init__(self, name: str):
        self.name: str = name
        self.n: int = 0

    def divide(self, x: int) -> float:
        return 10 / x

    def bump_then_fail(self, other: "Fragile"):
        self.n += 1
        other.poke(0)
        raise ValueError("after the call")

    def poke(self, x: int):
        self.n += x

    def __key__(self):
        return self.name


def test_local_invoke_error_reply():
    rt = LocalRuntime()
    f = rt.create(Fragile, "f1")
    with pytest.raises(RuntimeError, match="ZeroDivisionError"):
        rt.invoke(f, "divide", 0)
    # the runtime survives; state is untouched by the failed call
    assert rt.invoke(f, "divide", 2) == 5.0
    assert rt.get_attr(f, "n") == 0


def test_local_flow_error_mid_flow():
    """A raise after a cross-entity call: error reply, and the writes that
    already happened stay visible (non-isolated flow semantics, SURVEY §4)."""
    rt = LocalRuntime()
    a = rt.create(Fragile, "fa")
    b = rt.create(Fragile, "fb")
    with pytest.raises(RuntimeError, match="ValueError: after the call"):
        rt.invoke(a, "bump_then_fail", b)
    assert rt.get_attr(a, "n") == 1  # pre-call write persisted


def test_superstep_error_reply_keeps_engine_alive(spark):
    from stateflow_spark.streaming.superstep import SuperstepRuntime

    rt = SuperstepRuntime(spark)
    seeded = rt.run([operator.make_init_event("Fragile", ("sf1",))])
    ref = EntityRef("Fragile", "sf1")
    bad = operator.make_invoke_event(ref, "divide", (0,))
    good = operator.make_invoke_event(ref, "poke", (7,))
    res = rt.run([bad, good], state_df=seeded.state_df)
    with pytest.raises(RuntimeError, match="ZeroDivisionError"):
        res.result_of(bad)
    assert res.result_of(good) is None
    state = res.collect_state()
    assert state[("Fragile", "sf1")]["n"] == 7
