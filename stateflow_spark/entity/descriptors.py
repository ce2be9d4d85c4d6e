"""AST extraction of entity descriptors (stdlib ``ast``; the reference uses
libcst visitors — stateflow/analysis/extract_class_descriptor.py:12-169 and
extract_method_descriptor.py:13-271. Same contract, new implementation):

- state schema: every ``self.x`` assignment anywhere in the class, merged;
  conflicting type hints raise (reference extract_class_descriptor.py:123-146)
- method descriptors: positional params with type hints; ``*args/**kwargs``
  and defaults rejected (extract_method_descriptor.py:118-146)
- read-only flag: no ``self.x`` writes (extract_method_descriptor.py:37-38)
- write set: which self attrs a method writes (used for state-cache
  invalidation, mirroring extract_method_descriptor.py:186-232)
- linked params: params typed as another registered entity or List[entity]
  (method_descriptor.py:115-143) → the method needs flow compilation
"""

from __future__ import annotations

import ast
import inspect
import textwrap
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_TYPE_MAP: dict[str, DataType] = {
    "str": StringType(),
    "int": LongType(),
    "float": DoubleType(),
    "bool": BooleanType(),
}


def _hint_str(node: ast.expr) -> str:
    """Stringify an annotation, stripping forward-ref quotes
    (reference ast_utils.extract_types strips quotes the same way)."""
    if isinstance(node, ast.Constant) and isinstance(node.value, str):
        return node.value
    return ast.unparse(node).replace("'", "").replace('"', "")


@dataclass
class ParamDesc:
    name: str
    hint: str  # "" if untyped
    entity: Optional[str] = None  # registered entity name if linked
    is_entity_list: bool = False


@dataclass
class MethodDesc:
    name: str
    params: list[ParamDesc]
    read_only: bool
    writes: set[str]  # self attrs written
    returns_hint: str
    node: ast.FunctionDef = field(repr=False)
    # the method INTERACTS with an entity-typed own-state attribute as an
    # entity — calls a method on it or reads one of its attributes,
    # directly (self.acc.add(x), self.acc.balance) or through an alias
    # (a = self.acc; a.add(x)) — set by link_descriptors; such methods
    # flow-compile even without entity-typed params (round-8 VERDICT #8).
    # Merely LOADING the ref (returning it, passing it to a helper,
    # comparing it) does NOT trigger flow compilation: those uses operate
    # on the plain EntityRef and run fine through wrapper.invoke, and
    # flow fragments execute in a synthetic namespace without the
    # method's module globals (a helper call would NameError).
    entity_attr_loads: bool = False

    @property
    def linked(self) -> bool:
        return any(p.entity for p in self.params) or self.entity_attr_loads


@dataclass
class ClassDesc:
    name: str
    state_hints: dict[str, str]  # attr -> hint ("NoType" if none)
    methods: dict[str, MethodDesc]
    tree: ast.ClassDef = field(repr=False)
    # class-body literal defaults (``tier: str = "basic"``) — the declared
    # per-attribute UPGRADE value used when rehydrating state persisted by
    # an older class version that lacked the attribute (round-8 schema
    # evolution; see wrapper.upgrade_state)
    state_defaults: dict[str, object] = field(default_factory=dict)

    def spark_state_schema(self) -> StructType:
        """StructType per state attribute; unmapped hints (lists, entity
        refs, NoType) encode as binary pickled values (reference serializes
        the whole per-key dict, state.py:26-32 — we keep a typed column per
        attribute and fall back per-column)."""
        from pyspark.sql.types import BinaryType

        fields = []
        for attr, hint in sorted(self.state_hints.items()):
            dt = _TYPE_MAP.get(hint, BinaryType())
            fields.append(StructField(attr, dt, True))
        return StructType(fields)


class _SelfWriteCollector(ast.NodeVisitor):
    """Collect self.<attr> stores + their hints within one scope."""

    def __init__(self):
        self.hints: dict[str, str] = {}
        self.writes: set[str] = set()

    def _record(self, attr: str, hint: str):
        prev = self.hints.get(attr)
        if prev is not None and prev != "NoType" and hint != "NoType" and prev != hint:
            raise TypeError(
                f"conflicting type hints for self.{attr}: {prev!r} vs {hint!r}"
            )
        if prev is None or prev == "NoType":
            self.hints[attr] = hint
        self.writes.add(attr)

    def visit_Assign(self, node: ast.Assign):
        for t in node.targets:
            for n in ast.walk(t):
                if (
                    isinstance(n, ast.Attribute)
                    and isinstance(n.value, ast.Name)
                    and n.value.id == "self"
                    and isinstance(n.ctx, ast.Store)
                ):
                    self._record(n.attr, "NoType")
        self.generic_visit(node)

    def visit_AnnAssign(self, node: ast.AnnAssign):
        t = node.target
        if (
            isinstance(t, ast.Attribute)
            and isinstance(t.value, ast.Name)
            and t.value.id == "self"
        ):
            self._record(t.attr, _hint_str(node.annotation))
        self.generic_visit(node)

    def visit_AugAssign(self, node: ast.AugAssign):
        t = node.target
        if (
            isinstance(t, ast.Attribute)
            and isinstance(t.value, ast.Name)
            and t.value.id == "self"
        ):
            self._record(t.attr, "NoType")
        self.generic_visit(node)


def _parse_param_hint(hint: str, registry_names: set[str]) -> tuple[Optional[str], bool]:
    """(entity_name, is_list) if the hint references a registered entity."""
    h = hint.strip()
    if h in registry_names:
        return h, False
    if h.startswith("List[") and h.endswith("]"):
        inner = h[5:-1].strip()
        if inner in registry_names:
            return inner, True
    if h.startswith("list[") and h.endswith("]"):
        inner = h[5:-1].strip()
        if inner in registry_names:
            return inner, True
    return None, False


def extract_class_desc(cls: type) -> ClassDesc:
    try:
        src = textwrap.dedent(inspect.getsource(cls))
    except OSError as ex:
        raise TypeError(
            f"@entity needs the source of {cls.__name__} (define it in a "
            ".py file, not a REPL/exec string) — descriptor extraction is "
            "AST-based, like the reference's libcst analysis"
        ) from ex
    mod = ast.parse(src)
    cdef = mod.body[0]
    # strip our decorator so re-parse of fragments stays clean
    assert isinstance(cdef, ast.ClassDef)

    hints: dict[str, str] = {}
    defaults: dict[str, object] = {}
    methods: dict[str, MethodDesc] = {}

    # class-body annotated literals declare state attributes WITH an
    # explicit default — the schema-evolution contract: state persisted
    # before the attribute existed rehydrates to this value (the reference
    # fixes schemas at decoration time, SURVEY §1.3, and has no upgrade
    # path; a Spark checkpoint must survive a class gaining an attribute)
    for item in cdef.body:
        if isinstance(item, ast.AnnAssign) and item.value is not None:
            if not isinstance(item.target, ast.Name):
                continue
            try:
                defaults[item.target.id] = ast.literal_eval(item.value)
            except ValueError as ex:
                raise TypeError(
                    f"{cls.__name__}.{item.target.id}: class-body defaults "
                    "must be literals — they are replayed on state upgrade"
                ) from ex
            hints[item.target.id] = _hint_str(item.annotation)

    for item in cdef.body:
        if isinstance(item, ast.AsyncFunctionDef):
            # silently skipping would drop its state writes from the schema
            # and leave the method invisible to clients — fail loudly (the
            # client side already offers async via awaitable Futures)
            raise TypeError(
                f"{cls.__name__}.{item.name}: async entity methods are not "
                "supported; methods run inside the engine — use the client's "
                "awaitable futures for async call sites"
            )
        if not isinstance(item, ast.FunctionDef):
            continue
        col = _SelfWriteCollector()
        col.visit(item)
        # merge state hints across methods (reference merges the same way)
        for attr, hint in col.hints.items():
            prev = hints.get(attr)
            if (
                prev is not None
                and prev != "NoType"
                and hint != "NoType"
                and prev != hint
            ):
                raise TypeError(
                    f"conflicting type hints for self.{attr}: {prev!r} vs {hint!r}"
                )
            if prev is None or prev == "NoType":
                hints[attr] = hint

        args = item.args
        if args.vararg or args.kwarg or args.defaults or args.kwonlyargs:
            raise TypeError(
                f"{cls.__name__}.{item.name}: *args/**kwargs/defaults are not "
                "supported for entity methods (matches reference restriction)"
            )
        # positional-only params (`/` marker) bind positionally like plain
        # params — include them rather than silently dropping them (which
        # would misbind every argument after the marker)
        params = [
            ParamDesc(a.arg, _hint_str(a.annotation) if a.annotation else "")
            for a in list(args.posonlyargs) + list(args.args)
            if a.arg != "self"
        ]
        methods[item.name] = MethodDesc(
            name=item.name,
            params=params,
            read_only=(len(col.writes) == 0),
            writes=col.writes,
            returns_hint=_hint_str(item.returns) if item.returns else "",
            node=item,
        )

    return ClassDesc(
        name=cls.__name__,
        state_hints=hints,
        methods=methods,
        tree=cdef,
        state_defaults=defaults,
    )


def _is_entity_self_attr(node: ast.expr, ent_attrs: set[str]) -> bool:
    return (
        isinstance(node, ast.Attribute)
        and isinstance(node.value, ast.Name)
        and node.value.id == "self"
        and node.attr in ent_attrs
    )


def _interacts_with_entity_attrs(
    fn: ast.FunctionDef, ent_attrs: set[str]
) -> bool:
    """True when the method treats an entity-typed own-state attribute AS
    an entity: an attribute access (method call or state read) through
    `self.<attr>` or through a name assigned from it — including
    annotated assignments and alias CHAINS (x = self.acc; y = x), to a
    flow-insensitive fixpoint, matching the compiler's own propagation
    (_Types.note_stmt). A bare load of the ref does not count — see
    MethodDesc.entity_attr_loads."""
    if not ent_attrs:
        return False

    def _alias_source(v: ast.expr, aliases: set[str]) -> bool:
        return _is_entity_self_attr(v, ent_attrs) or (
            isinstance(v, ast.Name) and v.id in aliases
        )

    aliases: set[str] = set()
    while True:  # fixpoint over alias chains; bounded by #names
        added = False
        for n in ast.walk(fn):
            t = None
            if isinstance(n, ast.Assign) and len(n.targets) == 1:
                t, v = n.targets[0], n.value
            elif isinstance(n, ast.AnnAssign) and n.value is not None:
                t, v = n.target, n.value
            else:
                continue
            if (
                isinstance(t, ast.Name)
                and t.id not in aliases
                and _alias_source(v, aliases)
            ):
                aliases.add(t.id)
                added = True
        if not added:
            break
    for n in ast.walk(fn):
        if isinstance(n, ast.Attribute) and isinstance(n.ctx, ast.Load):
            if _alias_source(n.value, aliases):
                return True
    return False


def link_descriptors(descs: dict[str, ClassDesc]) -> None:
    """Second pass once all classes are registered: mark entity-typed params
    (reference stateflow/core.py:112-118 + method_descriptor.py:125-143),
    and mark methods that LOAD an entity-typed own-state attribute (they
    flow-compile too — calls through stored refs and their aliases)."""
    names = set(descs)
    for d in descs.values():
        ent_attrs = {a for a, h in d.state_hints.items() if h in names}
        for mname, m in d.methods.items():
            for p in m.params:
                p.entity, p.is_entity_list = _parse_param_hint(p.hint, names)
            if mname.startswith("__"):
                continue  # __init__/__key__ run eagerly, never as flows
            m.entity_attr_loads = _interacts_with_entity_attrs(
                m.node, ent_attrs
            )
