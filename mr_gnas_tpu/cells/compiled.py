"""Fixed-genotype (retrain) cells.

Re-designs the reference's compiled cells (models/model.py:10-67 NC,
models/model_lp.py:13-74 LP). A genotype's (op, center, pre) genes are
compiled at module-construction time into discrete op pipelines; the
forward walks the DAG: ``states = [src_emb, zero_out]``, each node sums
its incoming ops with ``h_in = zero_out``, then concat(concat_node) ->
Linear -> BN -> ReLU (models/model.py:52-67).

Reference quirks reproduced deliberately (SURVEY.md §7 "hard parts" #6):
  * LP OpModule's condition ``op_name != 'pre_mult' and 'pre_add' and
    'pre_sub'`` (models/model_lp.py:31) short-circuits only for
    ``pre_mult`` — BN+ReLU *are* applied after pre_add/pre_sub. We
    reproduce exactly that (flag ``lp_bn_quirk``).
  * The LP OpModule's dropout result is discarded (models/model_lp.py:34,
    no assignment) — a no-op we simply omit.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_gnas_tpu.cells.genotype import Genotype
from mr_gnas_tpu.cells.supernet import AGGREGATOR_OPS, _masks
from mr_gnas_tpu.layers import MaskedBatchNorm
from mr_gnas_tpu.ops.message_ops import dense
from mr_gnas_tpu.ops.registry import OpArgs, make_op


class OpModule(nn.Module):
    """One discrete op + its task-specific post-pipeline.

    NC: op -> Linear(d,d) -> (BN if op_norm) -> ReLU (models/model.py:22-28)
    LP: op -> (BN -> ReLU unless op is pre_mult)     (models/model_lp.py:27-35)
    """

    task: str
    op_name: str
    feature_dim: int
    drop_aggr: float = 0.1
    op_norm: bool = True  # NC --op_norm flag (train/mr_nc_train.py)

    @nn.compact
    def __call__(self, graph, h, h_in, out_mask, training: bool):
        args = OpArgs(feature_dim=self.feature_dim, drop_aggr=self.drop_aggr)
        y = make_op(self.task, self.op_name, args)(graph, h, h_in, training)
        # sharded-local graphs (dist/spmd.py): BN statistics psum over the
        # mesh axis so sharded == single-device (EdgeGraph has no axis)
        axis = getattr(graph, "spmd_axis", None)
        if self.task == "nc":
            y = dense(self.feature_dim, name="linear")(y)
            if self.op_norm:
                y = MaskedBatchNorm(name="bn", axis_name=axis)(y, out_mask, training)
            y = jax.nn.relu(y)
        else:
            if self.op_name != "pre_mult":  # the model_lp.py:31 quirk
                y = MaskedBatchNorm(name="bn", axis_name=axis)(y, out_mask, training)
                y = jax.nn.relu(y)
        return y


def _node_spaces(genotype: Genotype) -> dict[int, str]:
    """Statically infer each DAG node's tensor space ('edge' or 'node').

    Node 0 is the per-edge-row src embedding; a node becomes node-space as
    soon as an aggregator feeds it (the middle boundary); node-space
    propagates through filters.
    """
    space = {0: "edge"}
    for op_name, center, pre in genotype.alpha_cell:
        if op_name in AGGREGATOR_OPS:
            space[center] = "node"
        else:
            space.setdefault(center, space.get(pre, "edge"))
    return space


class CompiledCell(nn.Module):
    """One fixed-architecture cell layer."""

    task: str
    genotype: Genotype
    feature_dim: int
    drop_aggr: float = 0.1
    op_norm: bool = True

    @nn.compact
    def __call__(self, graph, src_emb, hr, training: bool):
        geno = self.genotype
        nb_nodes = geno.num_nodes
        edge_mask, node_mask = _masks(graph)
        spaces = _node_spaces(geno)
        # incoming[center] = list of (pre, op_name)
        incoming: dict[int, list[tuple[int, str]]] = {}
        for op_name, center, pre in geno.alpha_cell:
            incoming.setdefault(center, []).append((pre, op_name))

        def op_module(center, pre, op_name):
            mask = node_mask if spaces[center] == "node" else edge_mask
            return (
                OpModule(
                    task=self.task,
                    op_name=op_name,
                    feature_dim=self.feature_dim,
                    drop_aggr=self.drop_aggr,
                    op_norm=self.op_norm,
                    name=f"op_{center}_{pre}",
                ),
                mask,
            )

        # node 1 = zero_out (models/model.py:52-54)
        (pre0, zero_name) = incoming[1][0]
        mod, mask = op_module(1, pre0, zero_name)
        zero_out = mod(graph, src_emb, hr, mask, training)
        states = [src_emb, zero_out]
        for n in range(2, nb_nodes + 1):
            hs = None
            for pre, op_name in incoming.get(n, []):
                mod, mask = op_module(n, pre, op_name)
                y = mod(graph, states[pre], zero_out, mask, training)
                hs = y if hs is None else hs + y
            states.append(hs)

        concat_node = (
            list(geno.concat_node)
            if geno.concat_node
            else list(range(1, 1 + nb_nodes))
        )
        h = dense(self.feature_dim, name="concat")(
            jnp.concatenate([states[i] for i in concat_node], axis=-1)
        )
        h = MaskedBatchNorm(
            name="bn_out", axis_name=getattr(graph, "spmd_axis", None)
        )(h, node_mask, training)
        h = jax.nn.relu(h)
        return h
