"""Genotype schema, serialization, and alpha decoding.

The reference exchanges architectures as Python-literal strings through
``eval()`` (train/mr_lp_train.py:110, train/mr_nc_train.py:75) over the
``Genotype`` namedtuple (configs/genotypes.py:3). Here genotypes are a
frozen dataclass with JSON serialization; the reference string format is
also parsed (safely, via ``ast``) for interop with published genotypes.

``decode_genotype`` reproduces the discretization of
models/model_search.py:208-289 / model_search_lp.py:215-311 exactly:
argmax for zero/middle stages; for first/last stages pick the input edge
whose strongest non-``f_zero`` op weight is largest, then the best
non-``f_zero`` op on that edge; global node renumbering with the
published scheme.
"""
from __future__ import annotations

import ast
import dataclasses
import json
from typing import Sequence

import numpy as np

from mr_gnas_tpu.ops.registry import op_groups


@dataclasses.dataclass(frozen=True)
class Genotype:
    """One cell architecture: (op, center_node, pre_node) genes."""

    alpha_cell: tuple[tuple[str, int, int], ...]
    concat_node: tuple[int, ...]
    score_func: str | None = None

    def to_json(self) -> str:
        return json.dumps(
            {
                "alpha_cell": [list(g) for g in self.alpha_cell],
                "concat_node": list(self.concat_node),
                "score_func": self.score_func,
            }
        )

    @staticmethod
    def from_json(s: str | dict) -> "Genotype":
        d = json.loads(s) if isinstance(s, str) else s
        return Genotype(
            alpha_cell=tuple((g[0], int(g[1]), int(g[2])) for g in d["alpha_cell"]),
            concat_node=tuple(int(n) for n in d["concat_node"]),
            score_func=d.get("score_func"),
        )

    def to_reference_str(self) -> str:
        """Render in the reference's CLI string format (README.md:26)."""
        genes = ", ".join(f"({g[0]!r}, {g[1]}, {g[2]})" for g in self.alpha_cell)
        sf = "None" if self.score_func is None else repr(self.score_func)
        return (
            f"Genotype(alpha_cell=[{genes}], "
            f"concat_node={list(self.concat_node)}, score_func={sf})"
        )

    @property
    def num_nodes(self) -> int:
        return len({g[1] for g in self.alpha_cell})


def genotypes_to_json(genos: Sequence[Genotype]) -> str:
    return json.dumps([json.loads(g.to_json()) for g in genos])


def genotypes_from_json(s: str) -> list[Genotype]:
    return [Genotype.from_json(d) for d in json.loads(s)]


def parse_reference_genotypes(s: str) -> list[Genotype]:
    """Safely parse the reference's Python-literal genotype string.

    Accepts a single ``Genotype(...)`` call or a list of them — the format
    the reference feeds through ``eval()`` (train/mr_lp_train.py:380) —
    without executing code.
    """
    tree = ast.parse(s.strip(), mode="eval").body
    calls = tree.elts if isinstance(tree, ast.List) else [tree]
    out = []
    for call in calls:
        if not (isinstance(call, ast.Call) and getattr(call.func, "id", "") == "Genotype"):
            raise ValueError("expected Genotype(...) expressions")
        kw = {k.arg: ast.literal_eval(k.value) for k in call.keywords}
        out.append(
            Genotype(
                alpha_cell=tuple(tuple(g) for g in kw["alpha_cell"]),
                concat_node=tuple(kw.get("concat_node") or ()),
                score_func=kw.get("score_func"),
            )
        )
    return out


# ---------------------------------------------------------------------------
# cell topology spec + alphas
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CellSpec:
    """Static topology of the three-level supernet cell.

    Edge-count math mirrors models/model_search.py:70-74:
      zero_edges   = zero_nodes
      first_edges  = sum(zero_nodes + i for i in range(first_nodes))
      middle_edges = first_nodes
      last_edges   = sum(first_nodes + i for i in range(last_nodes))
    """

    task: str  # 'nc' | 'lp'
    zero_nodes: int = 1
    first_nodes: int = 2
    last_nodes: int = 2

    @property
    def groups(self) -> dict[str, list[str]]:
        return op_groups(self.task)

    @property
    def n_zero_edges(self) -> int:
        return self.zero_nodes

    @property
    def n_first_edges(self) -> int:
        return sum(self.zero_nodes + i for i in range(self.first_nodes))

    @property
    def n_middle_edges(self) -> int:
        return self.first_nodes

    @property
    def n_last_edges(self) -> int:
        return sum(self.first_nodes + i for i in range(self.last_nodes))

    def edge_counts(self) -> dict[str, int]:
        return {
            "zero": self.n_zero_edges,
            "first": self.n_first_edges,
            "middle": self.n_middle_edges,
            "last": self.n_last_edges,
        }


def init_alphas(key, spec: CellSpec, layers: int, with_final: bool = False):
    """Alpha tensors ~ 1e-3 * N(0,1), shape [stage_edges * layers, n_ops].

    Mirrors models/model_search.py:115-141; the LP stack adds a 5th tensor
    over score functions (model_search_lp.py:120-121).
    """
    import jax
    import jax.numpy as jnp

    from mr_gnas_tpu.ops.registry import SF_OPS

    alphas = {}
    keys = jax.random.split(key, 5)
    for i, (stage, n_edges) in enumerate(spec.edge_counts().items()):
        n_ops = len(spec.groups[stage])
        alphas[stage] = 1e-3 * jax.random.normal(
            keys[i], (n_edges * layers, n_ops), dtype=jnp.float32
        )
    if with_final:
        alphas["final"] = 1e-3 * jax.random.normal(
            keys[4], (1, len(SF_OPS)), dtype=jnp.float32
        )
    return alphas


def layer_weights(alphas: dict, spec: CellSpec, layer: int):
    """Softmaxed per-layer alpha slices (models/model_search.py:189-206)."""
    import jax

    w = {}
    for stage, n_edges in spec.edge_counts().items():
        sl = alphas[stage][layer * n_edges : (layer + 1) * n_edges]
        w[stage] = jax.nn.softmax(sl, axis=1)
    return w


def _best_edge_and_op(w_rows: np.ndarray, ops: list[str]) -> tuple[int, int]:
    """Pick (input_edge, op) excluding f_zero — the selection rule of
    model_search.py:232-241."""
    zero_idx = ops.index("f_zero")
    scores = [
        max(w_rows[x][k] for k in range(len(ops)) if k != zero_idx)
        for x in range(w_rows.shape[0])
    ]
    j = int(np.argmax(scores))
    k_best = None
    for k in range(len(ops)):
        if k == zero_idx:
            continue
        if k_best is None or w_rows[j][k] > w_rows[j][k_best]:
            k_best = k
    return j, k_best


def decode_genotype(
    weights: dict, spec: CellSpec, score_func: str | None = None
) -> Genotype:
    """Discretize one layer's softmaxed weights into a Genotype.

    Faithful port of the decode at models/model_search.py:208-289 including
    its node-renumbering scheme (middle nodes start at 2, which assumes
    zero_nodes == 1 — asserted here instead of silently miscounting).
    """
    assert spec.zero_nodes == 1, "reference decode scheme assumes zero_nodes == 1"
    groups = spec.groups
    w_zero = np.asarray(weights["zero"])
    w_first = np.asarray(weights["first"])
    w_middle = np.asarray(weights["middle"])
    w_last = np.asarray(weights["last"])

    gene: list[tuple[str, int, int]] = []

    # zero stage: plain argmax
    pre_nodes = list(range(spec.zero_nodes))
    for n in range(spec.zero_nodes):
        k = int(np.argmax(w_zero[n]))
        new_node = n + 1
        gene.append((groups["zero"][k], new_node, pre_nodes[n]))
        pre_nodes[n] = new_node

    # first stage: best input edge by strongest non-f_zero weight
    start = 0
    for n in range(1, spec.first_nodes + 1):
        end = start + n
        j, k_best = _best_edge_and_op(w_first[start:end], groups["first"])
        node_id = max(pre_nodes) + n
        pre_node_id = max(pre_nodes) + j
        gene.append((groups["first"][k_best], node_id, pre_node_id))
        start = end

    # middle stage: argmax per node
    concat_node: list[int] = []
    middle_nodes = list(range(2, 2 + spec.first_nodes))
    for n in range(spec.first_nodes):
        k = int(np.argmax(w_middle[n]))
        new_node = max(middle_nodes) + 1
        gene.append((groups["middle"][k], new_node, middle_nodes[n]))
        concat_node.append(new_node)
        middle_nodes[n] = new_node

    # last stage
    start = 0
    for n in range(spec.last_nodes):
        node_id = n + max(middle_nodes) + 1
        end = start + spec.first_nodes + n
        j, k_best = _best_edge_and_op(w_last[start:end], groups["last"])
        pre_node_id = (
            middle_nodes[j]
            if j < spec.first_nodes
            else j - spec.first_nodes + max(middle_nodes) + 1
        )
        gene.append((groups["last"][k_best], node_id, pre_node_id))
        concat_node.append(node_id)
        start = end

    return Genotype(
        alpha_cell=tuple(gene),
        concat_node=tuple(concat_node),
        score_func=score_func,
    )


def decode_genotypes(alphas: dict, spec: CellSpec, layers: int) -> list[Genotype]:
    """All layers' genotypes (models/model_search.py:291-292)."""
    return [
        decode_genotype(layer_weights(alphas, spec, i), spec) for i in range(layers)
    ]
