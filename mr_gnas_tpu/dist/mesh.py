"""Device mesh + sharding specs for multi-chip training.

The reference is strictly single-device (SURVEY.md §2.9: no NCCL/MPI
anywhere); this layer adds distribution the TPU way — a named
``jax.sharding.Mesh`` with sharding annotations, XLA inserting the
collectives (all-gather for replicated-table gathers, psum-style
reductions for cross-shard segment merges) over ICI.

Axis semantics for this model family (the graph-world analog of the
named strategies, SURVEY.md §2.9 table):
  * ``data``  — edge-row partition of the relation-sorted edge list (the
    SP/CP analog: scales graph size). Each device holds a contiguous,
    relation-local chunk, so per-relation parameters touch few shards
    (the EP analog falls out of the relation-sorted order).
  * ``model`` — entity-table / score-column partition (the TP analog:
    scales the 1-vs-N decoder's [B, num_ent] matmul and the embedding
    table).
Pipeline parallelism is not meaningful at 2-layer GNN scale and is
documented out of scope (SURVEY.md §2.9).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mr_gnas_tpu.graph.container import RelGraph


def make_mesh(
    shape: tuple[int, ...] | None = None,
    axes: tuple[str, ...] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a mesh; default puts all devices on the leading axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    if len(axes) > len(shape):  # e.g. shape (8,) with axes (data, model)
        axes = tuple(axes)[: len(shape)]
    elif len(axes) < len(shape):
        raise ValueError(f"mesh shape {shape} has more dims than axes {axes}")
    return Mesh(devices.reshape(shape), axes)


def shard_graph(graph: RelGraph, mesh: Mesh, data_axis: str = "data") -> RelGraph:
    """Commit a RelGraph's row arrays to the data axis; node-level arrays
    are replicated. Row count must divide the axis size (choose pads
    accordingly in build_rel_graph)."""
    n = mesh.shape[data_axis]
    if graph.n_rows % n:
        raise ValueError(
            f"graph rows {graph.n_rows} not divisible by data axis size {n}"
        )
    row = NamedSharding(mesh, P(data_axis))
    rep = NamedSharding(mesh, P())
    return graph.replace(
        src=jax.device_put(graph.src, row),
        dst=jax.device_put(graph.dst, row),
        etype=jax.device_put(graph.etype, row),
        norm=jax.device_put(graph.norm, row),
        row_mask=jax.device_put(graph.row_mask, row),
        global_ids=jax.device_put(graph.global_ids, rep),
        node_mask=jax.device_put(graph.node_mask, rep),
    )


def shard_blocks(blocks, mesh: Mesh, data_axis: str = "data"):
    """Commit NC message-flow-graph blocks to the data axis: per-edge
    arrays shard over edge rows (bucketed to powers of two, so any axis
    size up to the minimum bucket divides), dst-node arrays replicate."""
    row = NamedSharding(mesh, P(data_axis))
    rep = NamedSharding(mesh, P())
    n = mesh.shape[data_axis]
    out = []
    for b in blocks:
        if b.n_edges % n:
            raise ValueError(f"block edges {b.n_edges} not divisible by {n}")
        out.append(
            b.replace(
                src_gid=jax.device_put(b.src_gid, row),
                src_pos=jax.device_put(b.src_pos, row),
                dst_pos=jax.device_put(b.dst_pos, row),
                etype=jax.device_put(b.etype, row),
                edge_mask=jax.device_put(b.edge_mask, row),
                dst_gid=jax.device_put(b.dst_gid, rep),
                dst_mask=jax.device_put(b.dst_mask, rep),
            )
        )
    return out


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh (multihost-safe: every
    process holds the full host value — identical init seeds — and
    materializes its local devices' copies)."""
    from mr_gnas_tpu.dist.multihost import global_put

    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: global_put(x, rep), tree)


def shard_entity_table(params: dict, mesh: Mesh, axis: str = "model") -> dict:
    """Shard the entity embedding table's rows over the model axis (the
    TP-analog for large vocab tables); everything else replicated."""
    params = replicate(params, mesh)
    if "emb" in params and "embedding_h" in params["emb"]:
        params["emb"]["embedding_h"] = jax.device_put(
            params["emb"]["embedding_h"], NamedSharding(mesh, P(axis))
        )
    return params
