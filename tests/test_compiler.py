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


def test_attr_needs_narrowed_to_read_attributes():
    """REQUEST_STATE pruning (the reference's own acknowledged
    non-optimization, split_block.py:944-951 "!!Improve this!!"): the
    program records, per entity TYPE, exactly the attributes the flow ever
    reads — the fetch ships those instead of the full entity state."""
    # Item state is {item_name, price, stock}; buy_item reads only price
    assert flow("User", "buy_item").attr_needs == {"Item": ("price",)}
    # B state is {name, balance}; only balance is ever read
    assert flow("A", "state_requests").attr_needs == {"B": ("balance",)}
    # flows whose cross-entity interaction is all method CALLS (hoisted, no
    # attribute reads) carry an empty map — nothing is ever fetched for them
    assert flow("A", "complex_method").attr_needs == {}
    assert flow("Nest", "nest_call").attr_needs == {}


def test_tail_return_elision_flags():
    """Instructions whose expressions never touch `self` carry
    needs_self=False and may execute at whatever partition the flow is on
    — `return True` after a cross-key call completes at the callee
    (YCSB transfer measured 3 → 2 supersteps). Self-reading returns keep
    needs_self=True and still hop home."""
    buy = flow("User", "buy_item")
    *_, last = buy.instrs
    assert isinstance(last, Return) and last.needs_self is False
    # the early-return guard tests self.balance → its Branch needs self
    first_branch = next(i for i in buy.instrs if isinstance(i, Branch))
    assert first_branch.needs_self is True
    # a return that reads self keeps the flag
    ci = flow("A", "complex_if")
    *_, ci_last = ci.instrs
    assert isinstance(ci_last, Return) and ci_last.needs_self is True
    # calls whose target/args avoid self dispatch from wherever the flow
    # is (item.update_stock(-amount): target+arg are params)
    call = next(i for i in buy.instrs if isinstance(i, Call))
    assert call.needs_self is False
    # passing self into a call keeps phase 1 at the owner
    from stateflow_spark.entity.compiler import _references_self
    import ast as _ast

    assert _references_self(_ast.parse("other.m(self)", mode="eval"))


def test_fetch_snapshot_pruned_to_attr_needs():
    """The interpreter's REQUEST_STATE fetch stores only attr_needs
    attributes in the flow cache (the cache rides every hop event, so this
    is the hop-payload size at scale), and execution over the pruned
    snapshot still reads correct values."""
    from stateflow_spark.entity.interpreter import (
        Interpreter,
        StateStore,
        start_flow,
    )
    from stateflow_spark.entity.model import EntityRef

    full_item = {"item_name": "widget", "price": 5, "stock": 99}

    class Store(StateStore):
        def owns(self, ref):
            return True

        def get(self, ref):
            return dict(full_item)

        def put(self, ref, state):
            pass

    item_ref = EntityRef("Item", "i1")
    fs = start_flow(EntityRef("User", "u1"), "buy_item", (2, item_ref))
    interp = Interpreter(Store())
    hop = interp._ensure_needs(fs, ["item"], {"username": "u1", "balance": 100})
    assert hop is None
    assert fs.cache[("Item", "i1")] == {"price": 5}


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
