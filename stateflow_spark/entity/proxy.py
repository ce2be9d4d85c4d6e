"""Runtime proxies that give flow fragments natural Python syntax over
distributed state.

Inside an EXEC fragment, entity-typed values are wrapped so that
``item.price`` reads from the flow's fetched-state cache and ``self.balance``
reads/writes the local state row. Method calls on proxies raise — the
compiler hoists every external call into a CALL instruction, so a call
reaching a proxy means a compiler gap (fail loudly, not wrongly)."""

from __future__ import annotations

from typing import Any

from stateflow_spark.entity.model import EntityRef


class FlowError(RuntimeError):
    pass


class StateNotFetched(FlowError):
    def __init__(self, ref: EntityRef, attr: str):
        super().__init__(f"state of {ref} not fetched (reading .{attr})")
        self.ref = ref


class UnhoistedCall(FlowError):
    pass


def _declares_state_attr(entity: str, attr: str) -> bool:
    """Does the entity class declare a state attribute named ``attr``?
    Lazy registry lookup (registry imports nothing from this module's
    consumers); unknown entity types answer False."""
    from stateflow_spark.entity.registry import _REGISTRY

    et = _REGISTRY.get(entity)
    return et is not None and attr in et.desc.state_hints


class EntityProxy:
    """Read-only view of another entity's fetched state."""

    __slots__ = ("_ref", "_cache", "_methods")

    def __init__(self, ref: EntityRef, cache: dict, methods: set[str]):
        object.__setattr__(self, "_ref", ref)
        object.__setattr__(self, "_cache", cache)
        object.__setattr__(self, "_methods", methods)

    def __getattr__(self, attr: str) -> Any:
        if attr in self._methods:
            raise UnhoistedCall(
                f"external call {self._ref}.{attr}() reached a proxy — "
                "flow compiler should have hoisted it"
            )
        st = self._cache.get((self._ref.entity, self._ref.key))
        if (
            attr in ("entity", "key")
            and (st is None or attr not in st)
            and not _declares_state_attr(self._ref.entity, attr)
        ):
            # ref IDENTITY, not state (EntityRef's own fields) — serve it
            # without a fetch. Guarded: a class that genuinely declares a
            # state attribute named `entity`/`key` keeps the LOUD
            # StateNotFetched path (round-8 review #5 — silently serving
            # the ref field would substitute wrong data)
            return getattr(self._ref, attr)
        if st is None:
            raise StateNotFetched(self._ref, attr)
        if attr not in st:
            raise AttributeError(f"{self._ref} has no state attribute {attr!r}")
        return st[attr]

    def __setattr__(self, attr: str, value: Any):
        raise FlowError(
            f"cannot write {self._ref}.{attr} from another entity's flow — "
            "call a method on it instead"
        )

    def __eq__(self, other):
        return unwrap(other) == self._ref

    def __hash__(self):
        return hash(self._ref)

    def __repr__(self):
        return f"proxy:{self._ref}"


class RefListProxy(list):
    """List of entity refs: indexing / iteration yields proxies."""

    def __init__(self, refs, cache, methods_of):
        super().__init__(refs)
        self._cache = cache
        self._methods_of = methods_of

    def _wrap(self, v):
        if isinstance(v, EntityRef):
            return EntityProxy(v, self._cache, self._methods_of(v.entity))
        return v

    def __getitem__(self, i):
        v = super().__getitem__(i)
        if isinstance(i, slice):
            return RefListProxy(v, self._cache, self._methods_of)
        return self._wrap(v)

    def __iter__(self):
        for v in super().__iter__():
            yield self._wrap(v)


class RefListView:
    """WRITE-THROUGH view of a list living inside the owner's state dict.

    SelfProxy must not hand out a RefListProxy for list state:
    RefListProxy is a list SUBCLASS, so constructing one copies the
    elements and an in-place mutation (`self.seen.append(x)`) would land
    on the copy and silently vanish from persisted state (round-8 review
    finding). This view aliases the backing list — reads wrap EntityRefs
    into cache-backed proxies, writes unwrap and mutate the backing list
    itself, so the state dict (and its write-through persistence) sees
    every mutation exactly as the pre-round-8 raw-list behavior did."""

    __slots__ = ("_backing", "_cache", "_methods_of")

    def __init__(self, backing: list, cache, methods_of):
        self._backing = backing
        self._cache = cache
        self._methods_of = methods_of

    def _wrap(self, v):
        if isinstance(v, EntityRef):
            return EntityProxy(v, self._cache, self._methods_of(v.entity))
        return v

    def __getitem__(self, i):
        v = self._backing[i]
        if isinstance(i, slice):
            return [self._wrap(x) for x in v]
        return self._wrap(v)

    def __setitem__(self, i, v):
        self._backing[i] = unwrap(v)

    def __delitem__(self, i):
        del self._backing[i]

    def __len__(self):
        return len(self._backing)

    def __iter__(self):
        for v in self._backing:
            yield self._wrap(v)

    def __contains__(self, v):
        return unwrap(v) in self._backing

    def __eq__(self, other):
        return self._backing == unwrap(other)

    def append(self, v):
        self._backing.append(unwrap(v))

    def extend(self, vs):
        self._backing.extend(unwrap(v) for v in vs)

    def insert(self, i, v):
        self._backing.insert(i, unwrap(v))

    def remove(self, v):
        self._backing.remove(unwrap(v))

    def pop(self, i=-1):
        return self._wrap(self._backing.pop(i))

    # the rest of the list surface a flow fragment may reasonably use on
    # own state (round-8 review #3 — the view must not narrow the API the
    # raw backing list offered)
    def sort(self, *, key=None, reverse=False):
        if key is None:
            self._backing.sort(reverse=reverse)
        else:
            # the user's key function sees WRAPPED elements, exactly like
            # iteration/indexing do (a raw EntityRef has no state attrs)
            self._backing.sort(
                key=lambda v: key(self._wrap(v)), reverse=reverse
            )

    def reverse(self):
        self._backing.reverse()

    def clear(self):
        self._backing.clear()

    def index(self, v, *args):
        return self._backing.index(unwrap(v), *args)

    def count(self, v):
        return self._backing.count(unwrap(v))

    # remaining list surface the raw backing list offered pre-round-8
    # (round-9 ADVICE low #3 — the view must not narrow the API): reads
    # wrap elements like indexing/iteration do; results are plain lists
    # (assigning one back to self-state unwraps, same as __add__)
    def copy(self):
        return [self._wrap(v) for v in self._backing]

    def __reversed__(self):
        for v in reversed(self._backing):
            yield self._wrap(v)

    def __mul__(self, n):
        return [self._wrap(v) for v in self._backing] * n

    def __rmul__(self, n):
        return self.__mul__(n)

    def __iadd__(self, vs):
        self.extend(vs)
        return self

    def __add__(self, other):
        # concatenation reads: elements wrap like indexing (review #3's
        # symmetry rule); assigning the result back to self-state unwraps
        return [self._wrap(v) for v in self._backing] + list(other)

    def __radd__(self, other):
        return list(other) + [self._wrap(v) for v in self._backing]

    def __bool__(self):
        return bool(self._backing)

    def __ne__(self, other):
        return not self.__eq__(other)

    def __repr__(self):
        return f"view:{self._backing!r}"


class SelfProxy:
    """Mutable view of the flow owner's own state dict (write-through).
    Entity-ref values (stored refs like self.backing) wrap into cache-
    backed EntityProxy on read, so `self.backing.balance` reads fetched
    state exactly like a parameter ref does (round-8 stored-ref support);
    list state wraps into the write-through RefListView (in-place
    mutations reach the state dict); without a cache/methods_of (legacy
    call form) values return raw."""

    __slots__ = ("_state", "_dirty", "_methods", "_cache", "_methods_of")

    def __init__(self, state: dict, methods: set[str], cache=None,
                 methods_of=None):
        object.__setattr__(self, "_state", state)
        object.__setattr__(self, "_dirty", False)
        object.__setattr__(self, "_methods", methods)
        object.__setattr__(self, "_cache", cache)
        object.__setattr__(self, "_methods_of", methods_of)

    def __getattr__(self, attr: str) -> Any:
        if attr in self._methods:
            raise UnhoistedCall(
                f"self.{attr}() inside a split method is not supported yet "
                "(call it as a separate invocation)"
            )
        if attr not in self._state:
            raise AttributeError(f"self has no state attribute {attr!r}")
        v = self._state[attr]
        if self._cache is not None:
            if isinstance(v, EntityRef):
                return EntityProxy(v, self._cache, self._methods_of(v.entity))
            if isinstance(v, list):
                # EVERY list wraps (O(1) — no content scan): the view is
                # what guarantees appends/inserts UNWRAP on the way in,
                # so a currently-ref-free list can never end up holding a
                # live EntityProxy after `self.seen.append(other)` inside
                # a flow (round-8 review-3 finding #1 — the raw backing
                # persisted the proxy verbatim). Mutations write through;
                # element reads wrap refs; ref-free lists behave like
                # plain lists through the full view API.
                return RefListView(v, self._cache, self._methods_of)
        return v

    def __setattr__(self, attr: str, value: Any):
        # unwrap: exec-namespace values may be (or contain) entity proxies;
        # persisted state must hold plain EntityRefs, never live proxies
        self._state[attr] = unwrap(value)
        object.__setattr__(self, "_dirty", True)


def wrap(value: Any, cache: dict, methods_of) -> Any:
    """ns value → exec-namespace value."""
    if isinstance(value, EntityRef):
        return EntityProxy(value, cache, methods_of(value.entity))
    if isinstance(value, list) and any(isinstance(v, EntityRef) for v in value):
        return RefListProxy(value, cache, methods_of)
    return value


def unwrap(value: Any) -> Any:
    """exec-namespace value → serializable ns value."""
    if isinstance(value, EntityProxy):
        return value._ref
    if isinstance(value, RefListView):
        # the backing list already holds plain values (writes unwrap on
        # the way in); copy so the ns value doesn't alias state
        return list(value._backing)
    if isinstance(value, RefListProxy):
        return [unwrap(v) for v in list.__iter__(value)]
    if isinstance(value, list):
        return [unwrap(v) for v in value]
    if isinstance(value, tuple):
        return tuple(unwrap(v) for v in value)
    return value
