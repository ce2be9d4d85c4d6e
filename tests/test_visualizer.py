"""Visualizer + user-testing-fixture parity (reference
util/dataflow_visualizer.py and util/stateflow_test.py)."""

from __future__ import annotations

from stateflow_spark.entity.compiler import Branch, Call, Return
from stateflow_spark.entity.registry import get_registry
from stateflow_spark.entity.visualizer import program_dot, visualize
from stateflow_spark.testing import stateflow_test  # noqa: F401 — fixture

# ensure the fixture classes are registered
from tests.test_entity_local import Item, User  # noqa: F401


def _buy_item_program():
    reg = get_registry()
    return reg["User"].flows["buy_item"]


def test_program_dot_structure():
    prog = _buy_item_program()
    dot = program_dot(prog, code=True)
    assert dot.startswith("digraph dataflow {")
    assert "User.buy_item" in dot
    # one node per instruction
    for ip in range(len(prog.instrs)):
        assert f"n{ip} [" in dot
    # every Branch contributes a crimson F edge to its false_ip; every
    # Call node is highlighted; Return nodes are terminal (no out-edge)
    for ip, ins in enumerate(prog.instrs):
        if isinstance(ins, Branch):
            assert f'n{ip} -> n{ins.false_ip} [label="F"' in dot
        if isinstance(ins, Call):
            assert f'n{ip} [label="{ip}:' in dot
        if isinstance(ins, Return):
            assert f"\n  n{ip} ->" not in dot
    assert dot.rstrip().endswith("}")


def test_visualize_degrades_without_graphviz():
    out = visualize(_buy_item_program())
    # container has no graphviz package → DOT source comes back
    assert isinstance(out, str) and out.startswith("digraph")


def test_stateflow_test_fixture(stateflow_test):  # noqa: F811
    """The reference's user-facing test harness shape: create + invoke
    through the injected local client."""
    user = stateflow_test.entity(User)("viz-u1").get()
    user.update_balance(7).get()
    assert user.balance == 7
