"""Node-classification networks: supernet and fixed-genotype retrain model.

Re-designs models/model_search.py:52-292 and models/model.py:107-199.
The reference's per-block forward gathers per-edge global src ids and
relation types from DGL blocks (model_search.py:143-156) and remaps next
block's src ids to previous dst positions with an O(N*E) python loop
(model_search.py:167-171); here the host-side block builder
(:mod:`mr_gnas_tpu.data.blocks`) precomputes ``src_pos`` index arrays so
the device program is pure gathers.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_gnas_tpu.cells.compiled import CompiledCell
from mr_gnas_tpu.cells.genotype import CellSpec, Genotype, layer_weights
from mr_gnas_tpu.cells.supernet import SupernetCell
from mr_gnas_tpu.graph.container import Block, as_edge_graph
from mr_gnas_tpu.kernels.table import take_small_table
from mr_gnas_tpu.layers import MLPClassifier, MaskedBatchNorm, xavier_relu_param
from mr_gnas_tpu.ops.message_ops import dense

normal_init = nn.initializers.normal(stddev=1.0)


class _NCEmbeddings(nn.Module):
    """Node/relation embeddings with basis decomposition + projections
    (model_search.py:75-82)."""

    num_nodes: int
    num_rels: int
    init_fea_dim: int
    feature_dim: int
    num_base_r: int

    @nn.compact
    def __call__(self, src_gid: jax.Array, etype: jax.Array):
        emb_h = self.param("embedding_h", normal_init, (self.num_nodes, self.init_fea_dim))
        emb_e = self.param("embedding_e", normal_init, (self.num_base_r, self.init_fea_dim))
        rel_wt = xavier_relu_param(self, "rel_wt", (self.num_rels, self.num_base_r))
        # per-edge src embedding: h_init(embedding_h[src]) (model_search.py:160)
        src_embed = dense(self.feature_dim, use_bias=False, name="h_init")(
            # mode="clip": block ids are in-bounds by construction; the
            # default fill mode adds a select pass to the gather + backward
            jnp.take(emb_h, src_gid, axis=0, mode="clip")
        )
        # per-edge rel embedding: e_init(rel_wt[etype] @ embedding_e)
        # (model_search.py:164). Regrouped as (rel_wt @ embedding_e)[etype]
        # — identical by linearity, but the basis matmul runs over
        # num_rels table rows instead of E edge rows, and the gather's
        # backward is the MXU one-hot contraction of kernels/table.py.
        rel_table = dense(self.feature_dim, use_bias=False, name="e_init")(
            jnp.dot(rel_wt, emb_e, preferred_element_type=jnp.float32)
        )
        edges_embed = take_small_table(rel_table, etype)
        return src_embed, edges_embed


class NCSupernet(nn.Module):
    """NC weight-sharing supernet (model_search.py:52-187).

    ``__call__(blocks, alphas, training)`` -> logits [n_seeds, num_classes].
    ``blocks`` is the outermost-first list of padded MFG layers.
    """

    num_nodes: int
    num_classes: int
    num_rels: int
    layers: int
    spec: CellSpec
    feature_dim: int
    init_fea_dim: int
    num_base_r: int
    dropout: float = 0.0
    fused: bool = True  # fused einsum cells (cells/fused.py), parity-
    # tested against the naive per-module path
    compute_dtype: object = jnp.float32

    @nn.compact
    def __call__(self, blocks: Sequence[Block], alphas: dict, training: bool = False):
        assert len(blocks) == self.layers
        # sharded-local blocks (dist/spmd.build_local_blocks): cells merge
        # aggregation partials and psum BN stats over `axis`; one
        # all-gather per layer rebuilds the dst-node table for the next
        # block's src_pos re-gather, and the final logits are gathered so
        # seed_pos indexing stays global
        axis = blocks[0].spmd_axis
        if axis is not None and not self.fused:
            raise ValueError("spmd sharded blocks require fused=True cells")
        emb = _NCEmbeddings(
            self.num_nodes,
            self.num_rels,
            self.init_fea_dim,
            self.feature_dim,
            self.num_base_r,
            name="emb",
        )
        node_embed = None
        src_embed = None
        for i, block in enumerate(blocks):
            g = as_edge_graph(block)
            layer_src, edges_embed = emb(block.src_gid, block.etype)
            if i == 0:
                src_embed = layer_src
            w = layer_weights(alphas, self.spec, i)
            if self.fused:
                from mr_gnas_tpu.cells.fused import FusedSupernetCellNC

                cell = FusedSupernetCellNC(
                    spec=self.spec,
                    feature_dim=self.feature_dim,
                    dropout=0.0,
                    compute_dtype=self.compute_dtype,
                    name=f"cell_{i}",
                )
            else:
                cell = SupernetCell(
                    spec=self.spec,
                    feature_dim=self.feature_dim,
                    dropout=0.0,
                    name=f"cell_{i}",
                )
            node_embed = cell(g, src_embed, edges_embed, w, training)
            if i + 1 < len(blocks):
                nxt = node_embed
                if axis is not None:
                    from mr_gnas_tpu.dist.spmd import all_gather_nodes

                    nxt = all_gather_nodes(node_embed, axis)
                # next layer's per-edge src rows, gathered by position
                src_embed = jnp.take(nxt, blocks[i + 1].src_pos, axis=0, mode="clip")

        h = MaskedBatchNorm(name="bn_h", axis_name=axis)(
            node_embed, blocks[-1].dst_mask, training
        )
        h = jax.nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not training)
        logits = MLPClassifier(self.feature_dim, self.num_classes, name="classifier")(h)
        if axis is not None:
            from mr_gnas_tpu.dist.spmd import all_gather_nodes

            logits = all_gather_nodes(logits, axis)
        return logits


class NCNetwork(nn.Module):
    """Fixed-genotype NC retrain network (model.py:107-189)."""

    genotypes: tuple[Genotype, ...]
    num_nodes: int
    num_classes: int
    num_rels: int
    feature_dim: int
    init_fea_dim: int
    num_base_r: int
    dropout: float = 0.0
    op_norm: bool = True

    @nn.compact
    def __call__(self, blocks: Sequence[Block], training: bool = False):
        # sharded-local blocks: same collective structure as NCSupernet
        axis = blocks[0].spmd_axis
        emb = _NCEmbeddings(
            self.num_nodes,
            self.num_rels,
            self.init_fea_dim,
            self.feature_dim,
            self.num_base_r,
            name="emb",
        )
        node_embed = None
        src_embed = None
        for i, (block, geno) in enumerate(zip(blocks, self.genotypes)):
            g = as_edge_graph(block)
            layer_src, edges_embed = emb(block.src_gid, block.etype)
            if i == 0:
                src_embed = layer_src
            cell = CompiledCell(
                task="nc",
                genotype=geno,
                feature_dim=self.feature_dim,
                op_norm=self.op_norm,
                name=f"cell_{i}",
            )
            node_embed = cell(g, src_embed, edges_embed, training)
            if i + 1 < len(blocks):
                nxt = node_embed
                if axis is not None:
                    from mr_gnas_tpu.dist.spmd import all_gather_nodes

                    nxt = all_gather_nodes(node_embed, axis)
                src_embed = jnp.take(nxt, blocks[i + 1].src_pos, axis=0, mode="clip")

        h = MaskedBatchNorm(name="bn_h", axis_name=axis)(
            node_embed, blocks[-1].dst_mask, training
        )
        h = jax.nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not training)
        logits = MLPClassifier(self.feature_dim, self.num_classes, name="classifier")(h)
        if axis is not None:
            from mr_gnas_tpu.dist.spmd import all_gather_nodes

            logits = all_gather_nodes(logits, axis)
        return logits


def nc_loss(logits, labels, mask):
    """Masked softmax cross entropy over seed nodes."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return -jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def nc_accuracy(logits, labels, mask):
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32) * mask
    return jnp.sum(correct) / jnp.maximum(jnp.sum(mask), 1.0)
