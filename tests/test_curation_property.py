"""Hypothesis property tests for the round-5 arithmetic — the algebraic
lemmas the SQL forms rely on, checked over adversarial inputs without a
Spark session (pure Python replicas of the exact integer arithmetic)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from stateflow_spark.queries.curation import PACK_BUDGET
from stateflow_spark.queries.joins import _RANGE_US

MICROS = st.integers(min_value=0, max_value=2**52)


@settings(max_examples=500)
@given(vts=MICROS, cts=MICROS)
def test_range_join_bin_cover_lemma(vts: int, cts: int):
    """The equi-join rewrite loses no pairs and admits no false bins:
    cts ∈ (vts, vts + W] implies bin(cts) is bin(vts) or bin(vts)+1 —
    duplicating the view side into those two bins covers every in-range
    click — and the two view-bins are distinct, so a click's single bin
    can match at most one of them (no dedup pass needed)."""
    bv, bc = vts // _RANGE_US, cts // _RANGE_US
    in_range = vts < cts <= vts + _RANGE_US
    if in_range:
        assert bc in (bv, bv + 1)
    # distinctness of the duplicated bins is unconditional
    assert bv != bv + 1


@settings(max_examples=200)
@given(
    tokens=st.lists(st.integers(min_value=1, max_value=4 * PACK_BUDGET),
                    min_size=1, max_size=200)
)
def test_packing_prefix_sum_law(tokens: list[int]):
    """Pure-Python replica of the cum_excl // budget assignment: packs
    partition the docs into contiguous runs, conserve tokens, and satisfy
    the prefix-sum budget law (after any non-final pack p, at least
    (p+1)·budget tokens are laid down) — the invariant
    test_curation_invariants checks on real data, here under adversarial
    length mixes including docs spanning multiple budgets."""
    cum = 0
    packs: dict[int, list[int]] = {}
    order: list[int] = []
    for n in tokens:
        pid = cum // PACK_BUDGET
        if pid not in packs:
            packs[pid] = []
            order.append(pid)
        packs[pid].append(n)
        cum += n
    # conservation + contiguity of assignment order
    assert sum(sum(v) for v in packs.values()) == sum(tokens)
    assert order == sorted(order)
    # prefix-sum law
    prefix = 0
    for pid in order[:-1]:
        prefix += sum(packs[pid])
        assert prefix >= (pid + 1) * PACK_BUDGET


@settings(max_examples=200)
@given(p=st.integers(min_value=0, max_value=11),
       d=st.integers(min_value=0, max_value=4095))
def test_srp_plane_sign_is_engine_neutral_arithmetic(p: int, d: int):
    """The Rademacher coefficient formula stays inside exact int64 for any
    plausible (plane, dimension) — no overflow, no negative operand to %
    (where Spark pmod and Python % would diverge from C-style rem)."""
    x = (p * 131 + d) * 2654435761
    assert 0 <= x < 2**63
    r = x % 4294967296
    assert 0 <= r < 2**32
