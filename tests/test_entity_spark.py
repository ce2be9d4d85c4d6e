"""Distributed entity execution on Spark (SuperstepRuntime) must agree with
LocalRuntime on the reference golden values — cross-key flows hop across
partitions here, so this exercises the real serialization + routing paths."""

from __future__ import annotations

import pytest

from stateflow_spark.entity import operator
from stateflow_spark.streaming.superstep import SuperstepRuntime

# reuse the registered fixture classes
from tests.test_entity_local import A, B, Item, User  # noqa: F401


def run_ops(spark, ops):
    """ops: list of (cls_name_or_ref, ...) client actions → replies list."""
    rt = SuperstepRuntime(spark)
    events = []
    for op in ops:
        events.append(op)
    res = rt.run(events)
    return res


def test_superstep_create_and_invoke(spark):
    e1 = operator.make_init_event("User", ("su1",))
    res = SuperstepRuntime(spark).run([e1])
    ref = res.result_of(e1)
    assert ref.key == "su1"

    e2 = operator.make_invoke_event(ref, "update_balance", (20,))
    res2 = SuperstepRuntime(spark).run([e2], state_df=res.state_df)
    assert res2.result_of(e2) is None
    state = res2.collect_state()
    assert state[("User", "su1")]["balance"] == 20
    assert res2.supersteps == 1  # non-split invoke: single round


def test_superstep_buy_item_golden(spark):
    """buy_item hops user→item→user: 3+ supersteps, reference golden values
    (balance 5 / stock 1)."""
    init_u = operator.make_init_event("User", ("su2",))
    init_i = operator.make_init_event("Item", ("sitem", 5))
    rt = SuperstepRuntime(spark)
    res = rt.run([init_u, init_i])
    uref = res.result_of(init_u)
    iref = res.result_of(init_i)

    setup = [
        operator.make_invoke_event(uref, "update_balance", (20,)),
        operator.make_invoke_event(iref, "update_stock", (4,)),
    ]
    res = rt.run(setup, state_df=res.state_df)

    buy = operator.make_invoke_event(uref, "buy_item", (3, iref))
    res = rt.run([buy], state_df=res.state_df)
    assert res.result_of(buy) is True
    assert res.supersteps >= 3  # user → item (stock) → user (balance)

    state = res.collect_state()
    assert state[("User", "su2")]["balance"] == 5
    assert state[("Item", "sitem")]["stock"] == 1


@pytest.mark.slow
def test_superstep_state_requests_golden(spark):
    """state_requests == 26 across partitions (fetch + invalidation hops)."""
    rt = SuperstepRuntime(spark)
    inits = [
        operator.make_init_event("A", ("sa1",)),
        operator.make_init_event("B", ("sb1",)),
        operator.make_init_event("B", ("sb2",)),
    ]
    res = rt.run(inits)
    aref, b1, b2 = (res.result_of(e) for e in inits)

    ev = operator.make_invoke_event(aref, "state_requests", ([b1, b2],))
    res = rt.run([ev], state_df=res.state_df)
    assert res.result_of(ev) == 26
    state = res.collect_state()
    assert state[("B", "sb1")]["balance"] == 1
    assert state[("B", "sb2")]["balance"] == 5


def test_superstep_concurrent_flows(spark):
    """Many independent flows in one batch resolve in parallel supersteps."""
    rt = SuperstepRuntime(spark)
    inits = [operator.make_init_event("User", (f"cu{i}",)) for i in range(8)]
    inits += [operator.make_init_event("Item", (f"ci{i}", 2)) for i in range(8)]
    res = rt.run(inits)
    users = [res.result_of(e) for e in inits[:8]]
    items = [res.result_of(e) for e in inits[8:]]

    setup = [operator.make_invoke_event(u, "update_balance", (10,)) for u in users]
    setup += [operator.make_invoke_event(i, "update_stock", (5,)) for i in items]
    res = rt.run(setup, state_df=res.state_df)

    buys = [
        operator.make_invoke_event(users[i], "buy_item", (2, items[i]))
        for i in range(8)
    ]
    res = rt.run(buys, state_df=res.state_df)
    for b in buys:
        assert res.result_of(b) is True
    state = res.collect_state()
    for i in range(8):
        assert state[("User", f"cu{i}")]["balance"] == 6  # 10 - 2*2
        assert state[("Item", f"ci{i}")]["stock"] == 3

    # all 8 flows advanced together: supersteps stay O(flow length), not O(flows)
    assert res.supersteps <= 6


def test_superstep_key_not_found(spark):
    from stateflow_spark.entity.model import EntityRef

    ev = operator.make_invoke_event(EntityRef("User", "ghost"), "update_balance", (1,))
    res = SuperstepRuntime(spark).run([ev])
    with pytest.raises(KeyError):
        res.result_of(ev)


def test_superstep_state_persistence(spark, tmp_path):
    """State snapshot round-trips through parquet: a fresh runtime resumes
    from the saved snapshot (the production between-batches pattern)."""
    from stateflow_spark.entity import operator
    from stateflow_spark.entity.model import EntityRef
    from stateflow_spark.streaming.superstep import SuperstepRuntime

    rt = SuperstepRuntime(spark)
    init = operator.make_init_event("User", ("persist-u1",))
    seeded = rt.run([init])
    ref = seeded.replies[init.event_id].payload["result"]
    res = rt.run(
        [operator.make_invoke_event(ref, "update_balance", (33,))],
        state_df=seeded.state_df,
    )
    path = str(tmp_path / "state_snapshot")
    SuperstepRuntime.save_state(res.state_df, path)

    rt2 = SuperstepRuntime(spark)
    restored = rt2.load_state(path)
    ev = operator.make_invoke_event(
        EntityRef("User", "persist-u1"), "update_balance", (7,)
    )
    res2 = rt2.run([ev], state_df=restored)
    state = res2.collect_state()
    assert state[("User", "persist-u1")]["balance"] == 40


def test_superstep_max_supersteps_guard(spark):
    """A flow still in flight past the bound must fail loudly, not spin —
    pinned against the round-5 cluster-resident hop loop (the guard now
    trips on the hop COUNT, the payloads never reach the driver)."""
    init_u = operator.make_init_event("User", ("sguard-u",))
    init_i = operator.make_init_event("Item", ("sguard-i", 5))
    rt = SuperstepRuntime(spark)
    res = rt.run([init_u, init_i])
    uref = res.result_of(init_u)
    iref = res.result_of(init_i)
    res = rt.run(
        [operator.make_invoke_event(uref, "update_balance", (20,)),
         operator.make_invoke_event(iref, "update_stock", (4,))],
        state_df=res.state_df,
    )
    buy = operator.make_invoke_event(uref, "buy_item", (3, iref))
    tight = SuperstepRuntime(spark, max_supersteps=1)
    with pytest.raises(RuntimeError, match="supersteps"):
        tight.run([buy], state_df=res.state_df)


@pytest.mark.slow
def test_superstep_releases_prior_checkpoints(spark):
    """Per-superstep localCheckpoints must be released as the loop
    advances — executor storage is O(1) in superstep count within a run
    (round-5 ADVICE) — while BOTH the caller's input state_df and the
    returned final state survive (a localCheckpoint'd RDD is
    unrecoverable once its blocks drop, so freeing live data would
    corrupt branch-from-snapshot callers)."""
    def n_persistent():
        return spark._jsc.sc().getPersistentRDDs().size()

    init_u = operator.make_init_event("User", ("ckpt-u",))
    init_i = operator.make_init_event("Item", ("ckpt-i", 9))
    rt = SuperstepRuntime(spark)
    base = rt.run([init_u, init_i])
    uref, iref = base.result_of(init_u), base.result_of(init_i)
    base = rt.run(
        [
            operator.make_invoke_event(uref, "update_balance", (50,)),
            operator.make_invoke_event(iref, "update_stock", (10,)),
        ],
        state_df=base.state_df,
    )
    before = n_persistent()
    buy = operator.make_invoke_event(uref, "buy_item", (1, iref))
    res = rt.run([buy], state_df=base.state_df)
    assert res.supersteps >= 3  # user → item (stock) → user (balance)
    # ≥3 supersteps created ≥3 checkpoint pairs; only the FINAL pair may
    # remain — every intermediate round's blocks must be gone
    assert n_persistent() <= before + 2, (before, n_persistent())
    # the caller's input snapshot is untouched: branch a second run off
    # the SAME base state and read both results
    res2 = rt.run(
        [operator.make_invoke_event(uref, "buy_item", (2, iref))],
        state_df=base.state_df,
    )
    # price 9/unit, base balance 50: buy 1 → 41, branch buy 2 → 32
    assert res.collect_state()[("User", "ckpt-u")]["balance"] == 41
    assert res2.collect_state()[("User", "ckpt-u")]["balance"] == 32
    assert base.collect_state()[("User", "ckpt-u")]["balance"] == 50


def test_superstep_stored_ref_flow(spark):
    """Round-8 stored-ref flows on the DISTRIBUTED runtime: the wallet and
    its backing account live at different keys, so pay_via_alias must hop
    wallet→backing→wallet and the read method must REQUEST_STATE across
    partitions — the serialization + routing paths LocalRuntime skips."""
    from tests.test_entity_local import Wallet  # registers the class

    init_b = operator.make_init_event("B", ("ss-wb1",))
    rt = SuperstepRuntime(spark)
    res = rt.run([init_b])
    bref = res.result_of(init_b)
    init_w = operator.make_init_event("Wallet", ("ss-w1", bref))
    res = rt.run([init_w], state_df=res.state_df)
    wref = res.result_of(init_w)

    res = rt.run(
        [operator.make_invoke_event(bref, "set_balance", (100,))],
        state_df=res.state_df,
    )
    pay = operator.make_invoke_event(wref, "pay_via_alias", (30,))
    res = rt.run([pay], state_df=res.state_df)
    assert res.result_of(pay) == 30
    assert res.supersteps >= 2  # the call hopped to the backing key

    read = operator.make_invoke_event(wref, "backing_balance_plus", (5,))
    res = rt.run([read], state_df=res.state_df)
    assert res.result_of(read) == 75  # 100 - 30 + 5

    state = res.collect_state()
    assert state[("B", "ss-wb1")]["balance"] == 70
    assert state[("Wallet", "ss-w1")]["spent"] == 30
