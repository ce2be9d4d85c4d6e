"""Flow interpreter: executes a compiled Program against keyed state,
hopping between entity keys.

Reference analog: EventFlowGraph.step + per-node-type step() methods
(stateflow/dataflow/event_flow.py:239-1159) and the same-key pipelining loop
in StatefulOperator._handle_event_flow (stateful_operator.py:249-275).

Execution model (designed for Spark partitioning):
- The interpreter runs inside a keyed operator activation that owns ONE
  partition's keys. It executes as many instructions as possible locally
  (same-key pipelining), then returns a *hop*: the flow event re-addressed
  to the key it needs next (reference loops these through the `internal`
  Kafka topic; our runtimes loop them through a queue / next superstep).
- EXEC runs at the flow owner's key; BRANCH/RETURN do too unless their
  expressions provably never touch `self` (compiler-marked
  needs_self=False), in which case they complete wherever the flow already
  is — tail elision, one hop saved per cross-key flow. CALL runs at the
  callee's key. Missing fetched-state runs at the owning key of the
  missing state.
- Nested flows: a CALL whose callee method is itself linked starts a child
  FlowState with a parent link (the reference instead inlines nested flows
  at compile time, execution_plan_merging.py:24-252 — dynamic nesting is
  this engine's equivalent).
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from typing import Any, Optional

from stateflow_spark.entity import wrapper
from stateflow_spark.entity.compiler import (
    Branch,
    Call,
    Exec,
    ForIter,
    Jump,
    Program,
    Return,
)
from stateflow_spark.entity.model import EntityRef
from stateflow_spark.entity.proxy import (
    EntityProxy,
    FlowError,
    RefListProxy,
    SelfProxy,
    unwrap,
    wrap,
)
from stateflow_spark.entity.registry import get_entity_type

from functools import lru_cache


@lru_cache(maxsize=8192)
def _code(src: str, mode: str, tag: str = "<flow>"):
    """Compile cache: flow programs are static, so each fragment's source
    compiles once per worker instead of once per execution (a transfer-mix
    superstep would otherwise recompile thousands of identical fragments)."""
    return compile(src, tag, mode)


@dataclass
class PendingCall:
    target: EntityRef
    method: str
    args: tuple
    result_var: Optional[str]


@dataclass
class FlowState:
    """Everything a flow event carries between partitions (picklable)."""

    flow_id: str
    entity: str
    method: str
    self_ref: EntityRef
    ip: int = 0
    ns: dict[str, Any] = field(default_factory=dict)
    cache: dict[tuple[str, str], dict] = field(default_factory=dict)
    pending: Optional[PendingCall] = None
    parent: Optional["FlowState"] = None
    parent_result_var: Optional[str] = None
    # entity keys this flow (incl. completed children) has written — used to
    # invalidate the parent's cached snapshots when a child flow returns
    # (reference invalidation semantics: split_analyze.py:666-781)
    written: set = field(default_factory=set)
    # need expression → ref, recorded at the partition that COULD evaluate
    # it (the flow owner) so a REQUEST_STATE hop partition can serve
    # `self.attr` needs without the owner's state (round-8 stored-ref
    # flows); refreshed on every owner-side resolution, so a flow that
    # reassigns the stored ref mid-run never reads a stale mapping
    resolved_needs: dict[str, EntityRef] = field(default_factory=dict)


@dataclass
class StepOutcome:
    """Result of running the interpreter at one partition."""

    hop_to: Optional[EntityRef] = None  # flow continues at this key
    done: bool = False
    result: Any = None
    error: Optional[str] = None
    flow: Optional[FlowState] = None


class StateStore:
    """Keyed state interface the interpreter sees. Runtimes implement access
    to the keys *local to the current activation*; `owns` says whether a key
    is local (LocalRuntime owns everything; Spark partitions own a subset)."""

    def owns(self, ref: EntityRef) -> bool:  # pragma: no cover - interface
        raise NotImplementedError

    def get(self, ref: EntityRef) -> Optional[dict]:  # pragma: no cover
        raise NotImplementedError

    def put(self, ref: EntityRef, state: dict) -> None:  # pragma: no cover
        raise NotImplementedError


def start_flow(ref: EntityRef, method: str, args: tuple) -> FlowState:
    et = get_entity_type(ref.entity)
    prog: Program = et.flows[method]
    ns = dict(zip(prog.params, [unwrap_arg(a) for a in args]))
    return FlowState(
        flow_id=str(uuid.uuid4()),
        entity=ref.entity,
        method=method,
        self_ref=ref,
        ns=ns,
    )


def unwrap_arg(a: Any) -> Any:
    if isinstance(a, list):
        return [unwrap_arg(x) for x in a]
    return unwrap(a)


def _methods_of(entity: str) -> set[str]:
    et = get_entity_type(entity)
    return {m for m in et.desc.methods if not m.startswith("__")}


@lru_cache(maxsize=256)
def _module_globals(entity: str) -> dict:
    """The defining module's globals for an entity class — flow fragments
    exec with these as their namespace BASE, so split methods can call
    module-level helpers and use module imports exactly like the
    un-split method could (round-8 review: fragments previously saw a
    synthetic namespace and NameError'd on any helper; the reference's
    split functions keep their module context the same way). Works on
    executors too: the engines cloudpickle the registry with the
    defining module registered by-value, so each method's __globals__
    travels with the class. Sourced from functions DEFINED IN the
    class's own module (a class attribute aliasing a foreign-module
    function must not donate the wrong globals). Cached per entity;
    registry.entity()/clear_registry() clear the cache on
    re-registration (a name may rebind to a class from another module)."""
    import inspect

    et = get_entity_type(entity)
    for v in vars(et.cls).values():
        if inspect.isfunction(v) and v.__module__ == et.cls.__module__:
            return v.__globals__
    return {}


class Interpreter:
    def __init__(self, store: StateStore):
        self.store = store

    # -- namespace plumbing -------------------------------------------------
    def _exec_ns(self, flow: FlowState, self_state: dict) -> dict:
        # module globals first (helpers/imports available to fragments),
        # flow variables overlay (shadowing a global with a local works
        # like plain Python). Only the names the METHOD references are
        # copied (Program.names) — copying the whole module dict per
        # fragment cost ~18% on the YCSB T mix (round-8 review #6)
        gbase = _module_globals(flow.entity)
        prog = get_entity_type(flow.entity).flows.get(flow.method)
        refs = getattr(prog, "names", None) if prog is not None else None
        if refs is None:
            ns: dict[str, Any] = dict(gbase)
        else:
            ns = {k: gbase[k] for k in refs if k in gbase}
        for k, v in flow.ns.items():
            ns[k] = wrap(v, flow.cache, _methods_of)
        ns["self"] = SelfProxy(
            self_state, _methods_of(flow.entity), flow.cache, _methods_of
        )
        return ns

    def _writeback(self, flow: FlowState, ns: dict) -> None:
        gbase = _module_globals(flow.entity)
        for k, v in ns.items():
            if k in gbase and v is gbase[k] and k not in flow.ns:
                # an untouched module global (incl. __name__/__doc__ and
                # friends) — keep it OUT of the flow's serialized
                # namespace. The `k not in flow.ns` guard matters: a
                # fragment reassigning a flow local that shadows a global
                # to a value IDENTITY-equal to the global (interned ints,
                # None, small strings) must still overwrite the stale
                # flow.ns entry, or later fragments would resurrect the
                # old shadow (round-8 review #1)
                continue
            if k == "self" or k.startswith("__"):
                if k.startswith("__") and not k.startswith("__builtins"):
                    flow.ns[k] = unwrap(v)
                continue
            flow.ns[k] = unwrap(v)

    def _resolve_need(self, flow: FlowState, need_src: str, self_state: dict) -> Optional[EntityRef]:
        """Evaluate a need expression to a ref; None if cached or if the
        expression isn't actually a ref at runtime (the compiler's needs
        analysis over-approximates — see _Types.prescan)."""
        ns = self._exec_ns(flow, self_state)
        try:
            val = eval(_code(need_src, "eval"), ns)  # noqa: S307 - compiler-generated source
        except NameError:
            return None  # name defined later in this fragment's own exec
        except AttributeError:
            # a `self.attr` need evaluated where self state is absent (a
            # partition that owns only the FETCHED side): fall back to the
            # ref the OWNER recorded when it resolved this need and hopped
            # here (round-8 stored-ref flows); genuine missing-attribute
            # errors still surface when the fragment itself executes
            val = flow.resolved_needs.get(need_src)
            if val is None:
                return None
        ref = unwrap(val)
        if not isinstance(ref, EntityRef):
            return None
        flow.resolved_needs[need_src] = ref
        if (ref.entity, ref.key) in flow.cache:
            return None
        return ref

    def _snapshot(self, flow: FlowState, ref: EntityRef, st: dict) -> dict:
        """Prune a fetched state to the attributes this flow can ever read
        from that entity TYPE (Program.attr_needs) — the flow cache travels
        inside every hop event, so at scale this is the difference between
        shipping two ints and shipping a whole entity row per REQUEST_STATE.
        The reference fetches full state and flags it itself ("!!Improve
        this!!", split_block.py:944-951). Type-keyed union over the whole
        program, so aliasing and later instructions can never miss an
        attribute; unknown types (or a program compiled without the map)
        fall back to the full dict.

        Known limitation (round-4 ADVICE): an attribute read through an
        alias the type tracker cannot see — e.g. an element of an
        unannotated list that happens to hold a fetched entity — reads a
        PRUNED cache entry and raises AttributeError at runtime, where the
        full snapshot previously served it by coincidence. The compiler
        only tracks reads through typed names/parameters (descriptors.py);
        untyped entity-valued containers were never supported API, so the
        pruning makes that unsupported path fail loudly instead of
        working by accident. If it must work, compile the program without
        an attr_needs entry for that type (full-dict fallback above)."""
        prog: Program = get_entity_type(flow.entity).flows[flow.method]
        attrs = getattr(prog, "attr_needs", {}).get(ref.entity)
        if attrs is None:
            return dict(st)
        return {a: st[a] for a in attrs if a in st}

    def _fetch_owned(self, flow: FlowState, needs: list[str]) -> None:
        """Load locally-owned missing states into the flow cache. Needs may
        reference `self` (stored-ref reads like self.backing.balance,
        round 8) — resolve them against the owned self state when this
        partition has it, else defer to the owner's _ensure_needs pass."""
        self_state: dict = {}
        if self.store.owns(flow.self_ref):
            st = self.store.get(flow.self_ref)
            if st is not None:
                self_state = wrapper.upgrade_state(
                    get_entity_type(flow.self_ref.entity).desc, st
                )
        for src in needs:
            ref = self._resolve_need(flow, src, self_state)
            if ref is not None and self.store.owns(ref):
                st = self.store.get(ref)
                if st is None:
                    raise FlowError(f"entity {ref} does not exist (state read)")
                st = wrapper.upgrade_state(get_entity_type(ref.entity).desc, st)
                flow.cache[(ref.entity, ref.key)] = self._snapshot(flow, ref, st)

    def _ensure_needs(
        self, flow: FlowState, needs: list[str], self_state: dict
    ) -> Optional[EntityRef]:
        """Fetch locally-owned missing states; return a ref to hop to if a
        remote state is missing (REQUEST_STATE hop — event_flow.py:1103-1159)."""
        for src in needs:
            ref = self._resolve_need(flow, src, self_state)
            if ref is None:
                continue
            if self.store.owns(ref):
                st = self.store.get(ref)
                if st is None:
                    raise FlowError(f"entity {ref} does not exist (state read)")
                st = wrapper.upgrade_state(get_entity_type(ref.entity).desc, st)
                flow.cache[(ref.entity, ref.key)] = self._snapshot(flow, ref, st)
            else:
                return ref
        return None

    # -- main loop ----------------------------------------------------------
    def run(self, flow: FlowState) -> StepOutcome:
        """Execute from flow.ip until a hop is required or the flow returns.
        The caller guarantees the store owns every key it reports as local."""
        try:
            return self._run(flow)
        except FlowError as ex:
            return StepOutcome(done=True, error=str(ex), flow=flow)
        except Exception as ex:  # user-code failure inside a fragment/call:
            # becomes an error reply, never a crashed task (the reference
            # converts invocation failures the same way,
            # wrappers/class_wrapper.py:113-149). Partial state writes
            # before the raise stay visible — non-isolated flow semantics.
            return StepOutcome(
                done=True,
                error=f"{type(ex).__name__}: {ex}",
                flow=flow,
            )

    def _run(self, flow: FlowState) -> StepOutcome:
        while True:
            et = get_entity_type(flow.entity)
            prog: Program = et.flows[flow.method]
            instr = prog.instrs[flow.ip]

            # a REQUEST_STATE hop lands here at the *state owner's*
            # partition: load whatever this partition owns into the flow
            # cache before dispatching (event_flow.py:1103-1159 attaches
            # state at the request key's operator the same way)
            needs = getattr(instr, "needs", None)
            if needs:
                self._fetch_owned(flow, needs)

            # CALL dispatches at the callee's partition; everything else at
            # the flow owner's partition.
            if isinstance(instr, Call):
                out = self._step_call(flow, instr)
            elif isinstance(instr, (Exec, Branch, Return, ForIter, Jump)):
                out = self._step_local(flow, instr)
            else:  # pragma: no cover
                raise FlowError(f"unknown instruction {instr!r}")

            if isinstance(out, FlowState):
                # a nested linked call started a child flow — execute it; its
                # RETURN resumes the parent below
                flow = out
                continue
            if out is not None:
                if out.done and flow.parent is not None and out.error is None:
                    # resume parent flow with the child's result; invalidate
                    # every cached snapshot the child (or its descendants)
                    # wrote so the parent re-fetches fresh state
                    parent = flow.parent
                    for key in flow.written:
                        parent.cache.pop(key, None)
                    parent.written |= flow.written
                    parent.ns[flow.parent_result_var] = out.result
                    flow = parent
                    continue
                return out

    # -- local instructions --------------------------------------------------
    def _step_local(self, flow: FlowState, instr) -> Optional[StepOutcome]:
        if isinstance(instr, Jump):
            flow.ip = instr.ip
            return None

        # Tail elision: an instruction whose expressions provably never
        # touch `self` (compiler-computed needs_self=False; ForIter reads
        # only the flow namespace) runs at WHATEVER partition the flow is
        # on — e.g. `return True` after a cross-key call completes at the
        # callee instead of hopping home, saving one superstep / loopback
        # micro-batch per flow. Sound because every self-state write is
        # persisted by the Exec that made it (Exec always requires the
        # owner), so there is nothing left to write at the tail.
        needs_self = (
            False
            if isinstance(instr, ForIter)
            else getattr(instr, "needs_self", True)
        )
        owns_self = self.store.owns(flow.self_ref)
        if needs_self and not owns_self:
            return StepOutcome(hop_to=flow.self_ref, flow=flow)

        if needs_self:
            self_state = self.store.get(flow.self_ref)
            if self_state is None:
                raise FlowError(f"flow owner {flow.self_ref} does not exist")
            self_state = wrapper.upgrade_state(
                get_entity_type(flow.self_ref.entity).desc, self_state
            )
        else:
            # any unexpected self.* access raises AttributeError → error
            # reply; the compiler guarantees none exists
            self_state = {}

        needs = getattr(instr, "needs", [])
        hop = self._ensure_needs(flow, needs, self_state)
        if hop is not None:
            return StepOutcome(hop_to=hop, flow=flow)

        if isinstance(instr, Exec):
            ns = self._exec_ns(flow, self_state)
            exec(_code(instr.src, "exec", f"<flow:{flow.entity}.{flow.method}>"), ns)  # noqa: S102
            self._writeback(flow, ns)
            self.store.put(flow.self_ref, self_state)
            flow.written.add((flow.self_ref.entity, flow.self_ref.key))
            flow.ip += 1
            return None

        if isinstance(instr, Branch):
            ns = self._exec_ns(flow, self_state)
            val = eval(_code(instr.test_src, "eval"), ns)  # noqa: S307
            flow.ip = flow.ip + 1 if val else instr.false_ip
            return None

        if isinstance(instr, ForIter):
            seq = flow.ns.get(instr.seq_var, [])
            idx = flow.ns.get(instr.idx_var, 0)
            if idx < len(seq):
                flow.ns[instr.target] = seq[idx]
                flow.ns[instr.idx_var] = idx + 1
                # iteration target may be an entity ref → update nothing;
                # wrapping happens per-exec
                flow.ip += 1
            else:
                flow.ip = instr.end_ip
            return None

        if isinstance(instr, Return):
            result = None
            if instr.expr_src is not None:
                ns = self._exec_ns(flow, self_state)
                result = unwrap(eval(_code(instr.expr_src, "eval"), ns))  # noqa: S307
            if needs_self:
                # historical belt-and-braces put; every actual write was
                # already persisted by its Exec. MUST be skipped in the
                # elided case — self_state is a placeholder there.
                self.store.put(flow.self_ref, self_state)
                flow.written.add((flow.self_ref.entity, flow.self_ref.key))
            return StepOutcome(done=True, result=result, flow=flow)

        raise FlowError(f"unhandled local instruction {instr!r}")

    # -- external call ---------------------------------------------------
    def _step_call(self, flow: FlowState, instr: Call) -> Optional[StepOutcome]:
        # phase 1: evaluate target + args — at the flow owner's partition
        # when they reference `self`, else wherever the flow already is
        # (tail elision: a.m(); b.m() hops owner→a→b, never bouncing home)
        if flow.pending is None:
            needs_self = getattr(instr, "needs_self", True)
            owns_self = self.store.owns(flow.self_ref)
            if needs_self and not owns_self:
                return StepOutcome(hop_to=flow.self_ref, flow=flow)
            self_state = self.store.get(flow.self_ref) if owns_self else None
            if needs_self and self_state is None:
                raise FlowError(f"flow owner {flow.self_ref} does not exist")
            if self_state is not None:
                # schema-evolution upgrade, same as Exec/Branch/Return's
                # path — Call target/arg expressions may read an
                # attribute the stored (older-version) state lacks
                self_state = wrapper.upgrade_state(
                    get_entity_type(flow.self_ref.entity).desc, self_state
                )
            self_state = self_state or {}
            hop = self._ensure_needs(flow, instr.needs, self_state)
            if hop is not None:
                return StepOutcome(hop_to=hop, flow=flow)
            ns = self._exec_ns(flow, self_state)
            raw_target = eval(_code(instr.target_src, "eval"), ns)  # noqa: S307
            target = unwrap(raw_target)
            args = tuple(unwrap(eval(_code(a, "eval"), ns)) for a in instr.arg_srcs)  # noqa: S307
            if not isinstance(target, EntityRef):
                # the compiler's entity-typedness tracking is flow-
                # insensitive and over-approximates: a name typed as an
                # entity may hold a plain value at runtime (x = item;
                # x = 5; x.bit_length()). Hoisting preserved evaluation
                # order, so executing the call EAGERLY here is exactly
                # the un-hoisted semantics — degrade to a plain Python
                # call instead of failing (round-8 review; previously a
                # loud FlowError, which turned working wrapper-path
                # methods into crashes once stored-ref gating widened
                # what flow-compiles). Call on the LIVE namespace value,
                # not the unwrapped copy — unwrap rebuilds containers, so
                # a mutating call (x.append(v)) on the copy was silently
                # discarded (round-9 ADVICE medium #2) — then write back
                # and persist exactly like an Exec fragment does.
                result = getattr(raw_target, instr.method)(*args)
                self._writeback(flow, ns)
                if needs_self:
                    self.store.put(flow.self_ref, self_state)
                    flow.written.add(
                        (flow.self_ref.entity, flow.self_ref.key)
                    )
                if instr.result_var is not None:
                    flow.ns[instr.result_var] = unwrap(result)
                flow.ip += 1
                return None
            flow.pending = PendingCall(target, instr.method, args, instr.result_var)

        # phase 2: execute at the callee's partition
        pc = flow.pending
        if not self.store.owns(pc.target):
            return StepOutcome(hop_to=pc.target, flow=flow)

        et = get_entity_type(pc.target.entity)
        mdesc = et.desc.methods[pc.method]

        if pc.method in et.flows:
            # nested linked method → child flow (dynamic nesting); the main
            # loop switches to the child and resumes us on its RETURN.
            # Drop our cached snapshot of the callee NOW — the child will
            # mutate it and a later `a.x` read must re-fetch (the plain-CALL
            # path at the bottom of this method does the same).
            flow.cache.pop((pc.target.entity, pc.target.key), None)
            child = start_flow(pc.target, pc.method, pc.args)
            child.parent = flow
            child.parent_result_var = pc.result_var
            flow.pending = None
            flow.ip += 1
            return child

        state = self.store.get(pc.target)
        if state is None:
            raise FlowError(f"callee {pc.target} does not exist")
        result, new_state = wrapper.invoke(
            et.cls, et.desc, state, pc.method, pc.args
        )
        if not mdesc.read_only:
            self.store.put(pc.target, new_state)
            # invalidate this entity's fetched snapshot: the next attribute
            # read re-fetches (reference invalidation: split_analyze.py:666-781)
            flow.cache.pop((pc.target.entity, pc.target.key), None)
            flow.written.add((pc.target.entity, pc.target.key))
        if pc.result_var is not None:
            flow.ns[pc.result_var] = result
        flow.pending = None
        flow.ip += 1
        return None
