"""Split-compiler structural golden tests.

The reference pins its compiler with exact block counts, dependency lists,
and flow-node sequences (tests/split/split_test.py:26-1380:
test_split_dependencies, test_if_statements, test_for_loop_items,
test_nested_execution). These tests pin our instruction IR the same way:
opcode sequences, jump/branch targets, and state-fetch `needs` — so a
compiler change that silently alters flow shape fails here before any
runtime test."""

from __future__ import annotations

import pytest

from stateflow_spark.entity.compiler import (
    Branch,
    Call,
    Exec,
    ForIter,
    Jump,
    Program,
    Return,
)
from stateflow_spark.entity.registry import get_registry

# registers User/Item/A/B/Nest fixtures
from tests.test_entity_local import A, B, Item, Nest, User  # noqa: F401


def flow(entity: str, method: str) -> Program:
    return get_registry()[entity].flows[method]


def ops(p: Program) -> list[type]:
    return [type(i) for i in p.instrs]


def test_buy_item_shape():
    """Early-return guard + hoisted external call + tail fragment
    (reference trace: SURVEY.md §3.3 step 5)."""
    p = flow("User", "buy_item")
    assert ops(p) == [Exec, Branch, Return, Call, Branch, Return, Exec, Return]
    # the price read fetches the item's state exactly once
    assert p.instrs[0].needs == ["item"]
    # balance-guard branch skips the early return
    assert p.instrs[1].false_ip == 3
    # the hoisted update_stock call targets the item with the negated amount
    call = p.instrs[3]
    assert (call.target_src, call.method, call.arg_srcs) == (
        "item", "update_stock", ["-amount"],
    )
    # its boolean result gates the second early return
    assert p.instrs[4].test_src == f"not {call.result_var}"


def test_complex_if_branch_wiring():
    """if/elif/else with external calls in body AND in the elif test; both
    true-paths jump over the remaining arms to the shared return."""
    p = flow("A", "complex_if")
    assert ops(p) == [
        Exec, Branch, Call, Exec, Jump, Call, Branch, Exec, Jump, Exec, Return,
    ]
    ret_ip = 10
    assert p.instrs[4].ip == ret_ip and p.instrs[8].ip == ret_ip
    # elif's test call is hoisted to run only when the first branch is false
    assert p.instrs[1].false_ip == 5
    assert p.instrs[5].method == "balance_equal_to"
    assert p.instrs[6].test_src == p.instrs[5].result_var


def test_for_loop_shape():
    """Data-dependent loop: materialize + ForIter head + back Jump; the
    body's pure if/else stays one verbatim Exec (no gratuitous split —
    the reference splits every if; we split only around external work)."""
    p = flow("A", "for_loops")
    assert ops(p) == [Exec, ForIter, Call, Exec, Jump, Return]
    head = 1
    assert p.instrs[4].ip == head  # loop back-edge
    assert p.instrs[head].end_ip == 5  # StopIteration → Return
    assert p.instrs[head].target == "y"
    assert "if x > 0:" in p.instrs[3].src  # unsplit inner conditional


def test_state_requests_fetch_and_invalidate():
    """The reference's REQUEST_STATE placement/invalidation analysis
    (split_analyze.py:666-781): each balance read between writes re-fetches;
    golden value 26 depends on exactly this sequence."""
    p = flow("A", "state_requests")
    assert ops(p) == [
        Exec, Exec, Call, Exec, Call, Exec, ForIter, Exec, Call, Exec,
        Jump, Exec, Branch, Call, Exec, Return,
    ]
    # every read of first_item.balance carries a fresh state need (the
    # interleaved set_balance writes invalidate any cached copy)
    reads = [i for i in p.instrs if isinstance(i, Exec) and "first_item.balance" in i.src]
    assert len(reads) == 4
    assert all(i.needs == ["first_item"] for i in reads)
    # loop-body reads need the loop variable's state
    body_reads = [i for i in p.instrs if isinstance(i, Exec) and "x.balance" in i.src]
    assert all(i.needs == ["x"] for i in body_reads)


def test_nested_call_flow():
    """nest_call → is_true → is_really_true: the callee is itself linked;
    the CALL's callee resolution happens at runtime (child FlowState),
    the reference instead inlines at compile time
    (execution_plan_merging.py:24-252) — same observable semantics,
    asserted by test_nested_flow_calls in test_entity_local.py."""
    p = flow("Nest", "nest_call")
    assert ops(p) == [Exec, Call, Exec, Return]
    assert p.instrs[1].method == "is_true"
    assert p.instrs[3].expr_src == "is_true"


def test_subscripted_call_targets():
    """lst[i].m() form (reference split_analyze.py:321-379): subscripted
    entity expressions are valid call targets and state needs."""
    p = flow("A", "work_with_list")
    calls = [i for i in p.instrs if isinstance(i, Call)]
    assert [c.target_src for c in calls] == ["other_one", "others[-1]", "other_one"]


def test_every_flow_terminates_with_return():
    reg = get_registry()
    for et in reg.values():
        for name, p in et.flows.items():
            assert isinstance(p.instrs[-1], Return), f"{et.desc.name}.{name}"


def test_branch_targets_in_range():
    reg = get_registry()
    for et in reg.values():
        for name, p in et.flows.items():
            n = len(p.instrs)
            for ins in p.instrs:
                if isinstance(ins, Branch):
                    assert 0 <= ins.false_ip <= n, f"{name}: {ins}"
                if isinstance(ins, Jump):
                    assert 0 <= ins.ip <= n, f"{name}: {ins}"
                if isinstance(ins, ForIter):
                    assert 0 <= ins.end_ip <= n, f"{name}: {ins}"


def test_recompilation_is_idempotent():
    """Registering a new entity after flows were compiled re-links and
    recompiles every flow; the compiler must not mutate descriptor ASTs
    (a mutated tree loses its call sites on the second pass — caught by
    the hypothesis equivalence test, pinned here)."""
    from stateflow_spark.entity import registry as reg

    first = {
        (e, m): p.pretty()
        for e, et in reg.get_registry().items()
        for m, p in et.flows.items()
    }
    reg._linked = False  # what any later entity() registration does
    second = {
        (e, m): p.pretty()
        for e, et in reg.get_registry().items()
        for m, p in et.flows.items()
    }
    assert first == second
