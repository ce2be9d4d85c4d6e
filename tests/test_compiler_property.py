"""Property-based compiler equivalence: for randomly generated entity
methods (assignments, arithmetic, if/else, for-loops, cross-entity calls),
executing the compiled flow through LocalRuntime must produce exactly the
state and return value of running the same code as plain Python objects.

This is the correctness property the reference's hand-written split tests
sample; hypothesis walks the statement grammar instead."""

from __future__ import annotations

import textwrap

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stateflow_spark.entity import LocalRuntime
from stateflow_spark.entity import registry as _registry
from stateflow_spark.entity.registry import entity

# -- tiny statement grammar -------------------------------------------------
# locals: a, b (ints); self.x (state); other.y (other entity's state, via
# add_y / get_y methods); loop over a small literal range list.

_calls = st.sampled_from(
    [
        "other.add_y({v})",
        "r = other.add_y({v})",
        "r = other.get_y()",
    ]
)

_simple = st.sampled_from(
    [
        "a = a + {v}",
        "b = b * 2 + {v}",
        "self.x = self.x + a",
        "a = self.x + {v}",
        "b = a - b",
    ]
)


@st.composite
def statements(draw, depth=0):
    kind = draw(st.integers(0, 5 if depth < 1 else 3))
    v = draw(st.integers(-3, 7))
    if kind <= 1:
        return draw(_simple).format(v=v)
    if kind == 2:
        return draw(_calls).format(v=v)
    if kind == 3:
        return f"self.x = self.x + {v}"
    if kind == 4:  # if/else over nested blocks
        body = draw(st.lists(statements(depth=depth + 1), min_size=1, max_size=2))
        orelse = draw(st.lists(statements(depth=depth + 1), min_size=1, max_size=2))
        cond = draw(st.sampled_from(["a > b", "self.x > {v}", "b % 2 == 0"])).format(v=v)
        return (
            f"if {cond}:\n"
            + textwrap.indent("\n".join(body), "    ")
            + "\nelse:\n"
            + textwrap.indent("\n".join(orelse), "    ")
        )
    # bounded for-loop
    body = draw(st.lists(statements(depth=depth + 1), min_size=1, max_size=2))
    n = draw(st.integers(1, 3))
    return f"for i in range({n}):\n" + textwrap.indent(
        "\n".join(body + ["a = a + i"]), "    "
    )


def _build_classes(body_stmts: list[str]):
    """Build (registered entity classes, plain twin classes) from the same
    generated method body."""
    body = textwrap.indent("\n".join(body_stmts), "        ")
    src = f"""
class Gen:
    def __init__(self, name: str):
        self.name: str = name
        self.x: int = 1

    def run(self, a: int, b: int, other: 'Helper'):
{body}
        return a + b + self.x

    def __key__(self):
        return self.name


class Helper:
    def __init__(self, name: str):
        self.name: str = name
        self.y: int = 0

    def add_y(self, v: int) -> int:
        self.y += v
        return self.y

    def get_y(self) -> int:
        return self.y

    def __key__(self):
        return self.name
"""
    # @entity inspects class source, so the generated code needs a real
    # module file; one per example, imported under a unique name
    import importlib.util
    import os
    import tempfile
    import uuid

    ns_plain: dict = {}
    exec(src, ns_plain)  # noqa: S102

    modname = f"genflow_{uuid.uuid4().hex}"
    path = os.path.join(tempfile.gettempdir(), f"{modname}.py")
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    import sys

    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    ns_entity = {"Gen": mod.Gen, "Helper": mod.Helper}
    return ns_plain, ns_entity, src


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(statements(), min_size=1, max_size=4), st.integers(-5, 5), st.integers(-5, 5))
def test_flow_matches_plain_python(body, a0, b0):
    # snapshot the shared registry: generated Gen/Helper classes must not
    # leak into (or clobber) the fixture entities other modules registered
    saved = dict(_registry._REGISTRY)
    _registry._REGISTRY.clear()
    _registry._linked = False
    try:
        ns_plain, ns_entity, src = _build_classes(body)

        # plain-Python reference run
        plain_g = ns_plain["Gen"]("g")
        plain_h = ns_plain["Helper"]("h")
        try:
            expected = plain_g.run(a0, b0, plain_h)
            expected_err = None
        except Exception as ex:
            expected, expected_err = None, type(ex).__name__

        # entity-engine run (compiled flow, cross-entity calls hop)
        GenE = entity(ns_entity["Gen"])
        HelperE = entity(ns_entity["Helper"])
        rt = LocalRuntime()
        g = rt.create(GenE, "g")
        h = rt.create(HelperE, "h")
        if expected_err is not None:
            try:
                rt.invoke(g, "run", a0, b0, h)
                raise AssertionError(f"expected {expected_err}, flow succeeded")
            except RuntimeError as ex:
                assert expected_err in str(ex), src
        else:
            got = rt.invoke(g, "run", a0, b0, h)
            assert got == expected, src
            assert rt.get_attr(g, "x") == plain_g.x, src
            assert rt.get_attr(h, "y") == plain_h.y, src
    finally:
        _registry._REGISTRY.clear()
        _registry._REGISTRY.update(saved)
        _registry._linked = False
