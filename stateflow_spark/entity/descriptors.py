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

    @property
    def linked(self) -> bool:
        return any(p.entity for p in self.params)


@dataclass
class ClassDesc:
    name: str
    state_hints: dict[str, str]  # attr -> hint ("NoType" if none)
    methods: dict[str, MethodDesc]
    tree: ast.ClassDef = field(repr=False)

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
    methods: dict[str, MethodDesc] = {}

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

    return ClassDesc(name=cls.__name__, state_hints=hints, methods=methods, tree=cdef)


def link_descriptors(descs: dict[str, ClassDesc]) -> None:
    """Second pass once all classes are registered: mark entity-typed params
    (reference stateflow/core.py:112-118 + method_descriptor.py:125-143)."""
    names = set(descs)
    for d in descs.values():
        for m in d.methods.values():
            for p in m.params:
                p.entity, p.is_entity_list = _parse_param_hint(p.hint, names)
