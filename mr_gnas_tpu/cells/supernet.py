"""Weight-sharing supernet cells with mixed operations.

Re-designs the reference's supernet cells (models/cell.py:11-146 for NC,
models/cell_lp.py:12-200 for LP) as a single task-parameterized flax
module. Architecture weights (softmaxed alphas) are *explicit call
arguments*, keeping the NAS state out of the module tree — the functional
analog of ``show_weights`` feeding ``Cell.forward``
(models/model_search.py:165-166).

Stage wiring (models/cell_lp.py:173-188):
  zero   : one MixedOp over PRE_OPS, composes src emb with rel emb -> h_in
  first  : densely connected DAG over FIRST_OPS (edge-row space)
  middle : one aggregator MixedOp per first-node — the edge->node boundary
  last   : dense DAG over LAST_OPS (node space)
  concat : Linear over concat of (first(middle-reduced) + last) states
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_gnas_tpu.cells.genotype import CellSpec
from mr_gnas_tpu.layers import MaskedBatchNorm
from mr_gnas_tpu.ops.message_ops import dense
from mr_gnas_tpu.ops.registry import OpArgs, make_op

AGGREGATOR_OPS = frozenset({"a_max", "a_mean", "a_sum", "a_std"})


def _masks(graph: Any):
    """(edge/row-space mask, node-space mask) for either graph type."""
    if hasattr(graph, "row_mask"):  # RelGraph
        return graph.row_mask, graph.node_mask
    return graph.edge_mask, graph.node_mask  # EdgeGraph


class MixedOp(nn.Module):
    """Softmax-weighted sum of candidate op pipelines.

    NC pipeline per op: [op, Linear(d,d), BN, ReLU] (models/cell.py:17-20);
    LP pipeline per op: [op, BN, ReLU] (models/cell_lp.py:20-22).
    """

    task: str
    op_names: tuple[str, ...]
    feature_dim: int
    out_space: str  # 'edge' (zero/first stages) | 'node' (middle/last stages)
    drop_aggr: float = 0.0
    with_linear: bool = False  # True for NC

    @nn.compact
    def __call__(self, graph, h, h_in, weights, training: bool):
        args = OpArgs(feature_dim=self.feature_dim, drop_aggr=self.drop_aggr)
        edge_mask, node_mask = _masks(graph)
        mask = node_mask if self.out_space == "node" else edge_mask
        out = None
        for i, name in enumerate(self.op_names):
            y = make_op(self.task, name, args)(graph, h, h_in, training)
            if self.with_linear:
                y = dense(self.feature_dim, name=f"lin_{name}")(y)
            y = MaskedBatchNorm(name=f"bn_{name}")(y, mask, training)
            y = jax.nn.relu(y)
            y = weights[i] * y
            out = y if out is None else out + y
        return out


class SupernetCell(nn.Module):
    """One supernet layer: zero -> first -> middle -> last -> concat.

    ``weights`` is a dict of per-stage softmaxed alpha slices with row
    counts given by :class:`CellSpec` (models/model_search.py:70-74).
    For NC the concat is followed by BN+ReLU+dropout inside the cell
    (models/cell.py:142-146); for LP only the Linear (models/cell_lp.py:186),
    with BN/ReLU applied by the network.
    """

    spec: CellSpec
    feature_dim: int
    drop_aggr: float = 0.0
    dropout: float = 0.0  # NC-cell output dropout (models/cell.py:119,145)

    def _mixed(self, stage: str, name: str) -> MixedOp:
        return MixedOp(
            task=self.spec.task,
            op_names=tuple(self.spec.groups[stage]),
            feature_dim=self.feature_dim,
            out_space="edge" if stage in ("zero", "first") else "node",
            drop_aggr=self.drop_aggr,
            with_linear=(self.spec.task == "nc"),
            name=name,
        )

    @nn.compact
    def __call__(self, graph, src_emb, hr, weights, training: bool):
        spec = self.spec
        w_zero, w_first = weights["zero"], weights["first"]
        w_middle, w_last = weights["middle"], weights["last"]

        # zero stage (models/cell_lp.py:53-68)
        h_in = self._mixed("zero", "zero_0")(graph, src_emb, hr, w_zero[0], training)

        # first stage: dense DAG (models/cell_lp.py:89-108)
        states = [h_in]
        offset = 0
        for i in range(spec.first_nodes):
            s = None
            for j, h in enumerate(states):
                y = self._mixed("first", f"first_{offset + j}")(
                    graph, h, h_in, w_first[offset + j], training
                )
                s = y if s is None else s + y
            offset += len(states)
            states.append(s)
        states = states[1:]

        # middle stage: aggregators, edge->node boundary (cell_lp.py:111-127)
        states = [
            self._mixed("middle", f"middle_{i}")(
                graph, states[i], h_in, w_middle[i], training
            )
            for i in range(spec.first_nodes)
        ]

        # last stage: dense DAG in node space (cell_lp.py:130-152)
        offset = 0
        for i in range(spec.last_nodes):
            s = None
            for j, h in enumerate(states):
                y = self._mixed("last", f"last_{offset + j}")(
                    graph, h, h_in, w_last[offset + j], training
                )
                s = y if s is None else s + y
            offset += len(states)
            states.append(s)

        h = dense(self.feature_dim, name="concat")(jnp.concatenate(states, axis=-1))
        if spec.task == "nc":
            _, node_mask = _masks(graph)
            h = MaskedBatchNorm(name="bn_out")(h, node_mask, training)
            h = jax.nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=not training)(h)
        return h
