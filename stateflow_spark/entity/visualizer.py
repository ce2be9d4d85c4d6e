"""Dataflow visualizer: render a compiled flow Program as Graphviz DOT.

Reference parity: stateflow/util/dataflow_visualizer.py renders the split
compiler's block graph (conditional blocks highlighted, T/F edges) via the
graphviz package. Our IR is a flat instruction list with explicit jump
targets, so the graph is built from ip arithmetic instead of node links:
fallthrough edges, Branch T/F edges, ForIter iterate/done edges, Jump
edges, and Call-result annotations.

The DOT text is generated dependency-free (`program_dot`); `visualize`
upgrades to a `graphviz.Digraph` when the package is importable (it is
not in this container) and otherwise returns the DOT source — callers
can pipe it to `dot -Tsvg` themselves.
"""

from __future__ import annotations

from stateflow_spark.entity.compiler import (
    Branch,
    Call,
    Exec,
    ForIter,
    Jump,
    Program,
    Return,
)


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\l")


def _label(ip: int, ins, code: bool) -> str:
    if not code:
        return f"{ip} - {type(ins).__name__}"
    if isinstance(ins, Exec):
        return f"{ip}: {ins.src}"
    if isinstance(ins, Branch):
        return f"{ip}: if {ins.test_src}"
    if isinstance(ins, ForIter):
        return f"{ip}: for {ins.target} in {ins.seq_var}"
    if isinstance(ins, Jump):
        return f"{ip}: jump {ins.ip}"
    if isinstance(ins, Call):
        res = f"{ins.result_var} = " if ins.result_var else ""
        return f"{ip}: {res}{ins.target_src}.{ins.method}(...)"
    if isinstance(ins, Return):
        return f"{ip}: return {ins.expr_src or ''}"
    return f"{ip}: {ins}"


def program_dot(program: Program, code: bool = True) -> str:
    """DOT source for the flow graph — no external dependencies."""
    lines = [
        "digraph dataflow {",
        f'  label="{_esc(program.entity)}.{_esc(program.method)}"; labelloc=t;',
        "  node [shape=rectangle];",
    ]
    for ip, ins in enumerate(program.instrs):
        attrs = f'label="{_esc(_label(ip, ins, code))}"'
        if isinstance(ins, Branch):
            # the reference fills conditional blocks lightskyblue
            attrs += ', fillcolor="lightskyblue", style="filled"'
        elif isinstance(ins, Call):
            attrs += ', fillcolor="palegreen", style="filled"'
        elif isinstance(ins, Return):
            attrs += ', fillcolor="lightgoldenrod", style="filled"'
        lines.append(f"  n{ip} [{attrs}];")
    for ip, ins in enumerate(program.instrs):
        nxt = ip + 1
        if isinstance(ins, Branch):
            if nxt < len(program.instrs):
                lines.append(
                    f'  n{ip} -> n{nxt} [label="T", color="darkgreen",'
                    ' style="dotted"];'
                )
            lines.append(
                f'  n{ip} -> n{ins.false_ip} [label="F", color="crimson",'
                ' style="dotted"];'
            )
        elif isinstance(ins, ForIter):
            if nxt < len(program.instrs):
                lines.append(f'  n{ip} -> n{nxt} [label="iter"];')
            lines.append(f'  n{ip} -> n{ins.end_ip} [label="done"];')
        elif isinstance(ins, Jump):
            lines.append(f"  n{ip} -> n{ins.ip};")
        elif isinstance(ins, Return):
            pass  # terminal
        elif nxt < len(program.instrs):
            lines.append(f"  n{ip} -> n{nxt};")
    lines.append("}")
    return "\n".join(lines)


def visualize(program: Program, code: bool = False):
    """graphviz.Digraph when the package exists; DOT source otherwise
    (reference visualize(blocks, code) analog)."""
    dot = program_dot(program, code=code)
    try:
        import graphviz  # noqa: PLC0415 — optional dependency

        return graphviz.Source(dot)
    except ImportError:
        return dot
