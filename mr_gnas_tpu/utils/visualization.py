"""Genotype DAG visualization (utils/visualization.py analog).

Renders a genotype as graphviz DOT (and optionally a PNG when graphviz
is installed) or as an ASCII summary — the reference's ``plot()``
(utils/visualization.py:28-69) requires the graphviz binary; the DOT/
ASCII forms here always work.
"""
from __future__ import annotations

from mr_gnas_tpu.cells.genotype import Genotype

_STAGE_COLORS = {
    "pre": "#ffd9b3",
    "f": "#cce5ff",
    "a": "#d5f5d5",
    "sf": "#f0d5f5",
}


def _color(op: str) -> str:
    for prefix, c in _STAGE_COLORS.items():
        if op.startswith(prefix + "_") or op.startswith(prefix):
            return c
    return "#eeeeee"


def to_dot(genotype: Genotype, name: str = "genotype") -> str:
    """Graphviz DOT source for a genotype DAG."""
    lines = [
        f"digraph {name} {{",
        "  rankdir=LR;",
        '  node [shape=box, style="rounded,filled", fontsize=10];',
        '  0 [label="input", fillcolor="#eeeeee"];',
    ]
    concat = set(genotype.concat_node)
    nodes = {0}
    for op, center, pre in genotype.alpha_cell:
        nodes.add(center)
        nodes.add(pre)
    for n in sorted(nodes - {0}):
        extra = ', peripheries=2' if n in concat else ""
        lines.append(f'  {n} [label="{n}", fillcolor="#ffffff"{extra}];')
    for op, center, pre in genotype.alpha_cell:
        lines.append(
            f'  {pre} -> {center} [label="{op}", fontsize=9, color="#555555"];'
        )
    if genotype.score_func:
        lines.append(
            f'  score [label="{genotype.score_func}", fillcolor="{_color("sf")}"];'
        )
        last = max(concat) if concat else max(nodes)
        lines.append(f"  {last} -> score;")
    lines.append("}")
    return "\n".join(lines)


def to_ascii(genotype: Genotype) -> str:
    """Compact one-genotype-per-line ASCII rendering."""
    parts = [f"{pre}--{op}-->{center}" for op, center, pre in genotype.alpha_cell]
    s = "  ".join(parts)
    s += f"  | concat{list(genotype.concat_node)}"
    if genotype.score_func:
        s += f" -> {genotype.score_func}"
    return s


def plot(genotype: Genotype, filename: str, fmt: str = "png") -> str | None:
    """Render via the graphviz binary if present; returns the output path
    or None (DOT source is always written to <filename>.dot)."""
    import shutil
    import subprocess

    dot_src = to_dot(genotype)
    dot_path = f"{filename}.dot"
    with open(dot_path, "w") as f:
        f.write(dot_src)
    if shutil.which("dot") is None:
        return None
    out = f"{filename}.{fmt}"
    subprocess.run(["dot", f"-T{fmt}", dot_path, "-o", out], check=True)
    return out
