"""Narrow wire format for sampled LP search batches (round-5).

The axon-tunnel bandwidth (~20 MB/s measured round-5, NOTES) makes the
per-epoch host->device transfer the binding constraint of the search
driver: a 131k-edge sampled batch ships ~12 MB as plain int32/f32 —
roughly half of it redundant (the CSR's 8x sublane-replicated segment
ids, f32 masks that are prefix indicators, a per-row norm that is an
outer product of a tiny per-node table).

``batch_to_wire`` packs a :class:`~mr_gnas_tpu.data.sampling.SampledBatch`
into bound-narrowed dtypes (uint16 ids when the *static* config bounds
fit, uint8 labels, the CSR ``seg`` un-replicated at bias+1 uint16) and
``wire_to_batch`` reconstructs the exact original arrays inside the
jitted program. Reconstruction is LOSSLESS: integer widenings are exact,
masks are rebuilt from the real-count scalars (real rows are section
prefixes by construction, graph/build.py:100-120), and the edge norm is
rebuilt as the same f32 product ``node_norm[dst] * node_norm[src]`` the
host computes (graph/build.py:81-82) — bit-identical IEEE multiplies.

Dtype choices depend only on STATIC config bounds (padded node count,
relation vocabulary), never on per-batch data, so every epoch of a
config compiles to one program and stacked [K, ...] chunks are
homogeneous. Reference workload: the per-epoch sampled-graph transfer
feeding search/mr_lp_search.py:193-251's step.
"""
from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from mr_gnas_tpu.graph.container import RelGraph


def _id_dtype(bound: int):
    """Smallest unsigned numpy dtype holding values in [0, bound]."""
    return np.uint16 if bound <= np.iinfo(np.uint16).max else np.int32


@flax.struct.dataclass
class WireBatch:
    """One sampled batch in transfer-narrow dtypes (see module doc)."""

    # graph rows ([R] = 2*n_fwd + n_nodes)
    src: jax.Array
    dst: jax.Array
    etype: jax.Array
    node_norm: jax.Array  # [n_nodes] f32 (deg^-1/2, host-exact values)
    global_ids: jax.Array  # [n_nodes]
    n_real_e: jax.Array  # [] int32 real forward-edge count
    n_real_n: jax.Array  # [] int32 real node count
    # blocked CSR (None when the batch has no CSR attached)
    perm: jax.Array | None
    seg: jax.Array | None  # [n_chunks, rb] seg ids + 1 (0 = identity row)
    chunk_block: jax.Array | None
    chunk_row: jax.Array | None
    chunk_first: jax.Array | None
    counts: jax.Array | None  # [n_nodes] f32
    # supervision
    triplets: jax.Array  # [T, 3]
    labels: jax.Array | None  # [T] uint8 (flat mode)
    neg_heads: jax.Array | None  # [G, .] (grouped/chunked mode)
    neg_tails: jax.Array | None
    # statics
    n_fwd: int = flax.struct.field(pytree_node=False)
    n_nodes: int = flax.struct.field(pytree_node=False)
    num_rels: int = flax.struct.field(pytree_node=False)
    csr_bn: int = flax.struct.field(pytree_node=False)
    csr_rb: int = flax.struct.field(pytree_node=False)

    @property
    def nbytes(self) -> int:
        return sum(
            x.nbytes for x in jax.tree_util.tree_leaves(self)
            if hasattr(x, "nbytes")
        )


def batch_to_wire(batch) -> WireBatch:
    """Pack a host SampledBatch (numpy leaves) into the wire format."""
    g = batch.graph
    idt = _id_dtype(g.n_nodes)  # src/dst (dst dummy = n_nodes), negs, s/o
    edt = _id_dtype(2 * g.num_rels)  # etype (self rel = 2*num_rels)
    ne = g.n_edge_rows
    emask = np.asarray(g.row_mask[:ne])
    n_real_e = int(emask[: g.n_fwd].sum())
    n_real_n = int(np.asarray(g.node_mask).sum())
    # recover the per-node norm table from the self section (norm there
    # is 1.0 by construction) — from the edge rows it is deg^-1/2 of the
    # row's dst; counts (when present) already hold the real in-degree
    dst_e = np.asarray(g.dst[:ne])
    deg = np.bincount(dst_e[emask > 0], minlength=g.n_nodes + 1)[: g.n_nodes]
    with np.errstate(divide="ignore"):
        node_norm = deg.astype(np.float64) ** -0.5
    node_norm[np.isinf(node_norm)] = 0.0
    node_norm = node_norm.astype(np.float32)

    csr = g.csr
    tdt = _id_dtype(max(g.n_nodes, 2 * g.num_rels))
    trip = np.asarray(batch.triplets).astype(tdt)
    return WireBatch(
        src=np.asarray(g.src).astype(idt),
        dst=np.asarray(g.dst).astype(idt),
        etype=np.asarray(g.etype).astype(edt),
        node_norm=node_norm,
        global_ids=np.asarray(g.global_ids).astype(_id_dtype(g.n_nodes)),
        n_real_e=np.int32(n_real_e),
        n_real_n=np.int32(n_real_n),
        perm=None if csr is None else np.asarray(csr.perm),
        # seg3d is an 8x sublane replication of [n_chunks, rb] ids in
        # [-1, n_nodes); ship one copy at bias +1 (pallas_segment.py:296)
        seg=(
            None if csr is None
            else (np.asarray(csr.seg3d[:, 0, :]) + 1).astype(
                _id_dtype(g.n_nodes + 1)
            )
        ),
        chunk_block=None if csr is None else np.asarray(csr.chunk_block),
        chunk_row=None if csr is None else np.asarray(csr.chunk_row),
        chunk_first=None if csr is None else np.asarray(csr.chunk_first),
        counts=None if csr is None else np.asarray(csr.counts),
        triplets=trip,
        labels=(
            None if batch.labels is None or batch.neg_heads is not None
            else np.asarray(batch.labels).astype(np.uint8)
        ),
        neg_heads=(
            None if batch.neg_heads is None
            else np.asarray(batch.neg_heads).astype(idt)
        ),
        neg_tails=(
            None if batch.neg_tails is None
            else np.asarray(batch.neg_tails).astype(idt)
        ),
        n_fwd=g.n_fwd,
        n_nodes=g.n_nodes,
        num_rels=g.num_rels,
        csr_bn=0 if csr is None else csr.bn,
        csr_rb=0 if csr is None else csr.rb,
    )


def wire_to_batch(w: WireBatch):
    """Reconstruct (RelGraph, triplets, labels) inside the jitted program.

    Exact inverse of :func:`batch_to_wire` (see module doc for why each
    reconstruction is bit-identical to the host arrays).
    """
    src = w.src.astype(jnp.int32)
    dst = w.dst.astype(jnp.int32)
    etype = w.etype.astype(jnp.int32)
    nf, nn = w.n_fwd, w.n_nodes
    ne = 2 * nf
    # masks: real rows are section prefixes (graph/build.py:103-120)
    fwd_iota = jnp.arange(nf, dtype=jnp.int32)
    node_iota = jnp.arange(nn, dtype=jnp.int32)
    sec_mask = (fwd_iota < w.n_real_e).astype(jnp.float32)
    node_mask = (node_iota < w.n_real_n).astype(jnp.float32)
    row_mask = jnp.concatenate([sec_mask, sec_mask, node_mask])
    # norm: 1.0 off the real edge rows; the same f32 product the host
    # takes on real rows (symmetric, so one formula covers fwd + inv)
    nn_ext = jnp.concatenate([w.node_norm, jnp.ones((1,), jnp.float32)])
    edge_norm = nn_ext[dst[:ne]] * nn_ext[src[:ne]]
    emask = row_mask[:ne]
    norm = jnp.concatenate(
        [jnp.where(emask > 0, edge_norm, 1.0), jnp.ones((nn,), jnp.float32)]
    )
    csr = None
    if w.seg is not None:
        from mr_gnas_tpu.kernels.pallas_segment import CSRMeta

        seg2d = w.seg.astype(jnp.int32) - 1
        csr = CSRMeta(
            perm=w.perm,
            seg3d=jnp.repeat(seg2d[:, None, :], 8, axis=1),
            chunk_block=w.chunk_block,
            chunk_row=w.chunk_row,
            chunk_first=w.chunk_first,
            counts=w.counts,
            bn=w.csr_bn,
            rb=w.csr_rb,
            n_nodes=nn,
        )
    graph = RelGraph(
        src=src,
        dst=dst,
        etype=etype,
        norm=norm,
        row_mask=row_mask,
        global_ids=w.global_ids.astype(jnp.int32),
        node_mask=node_mask,
        n_fwd=nf,
        n_nodes=nn,
        num_rels=w.num_rels,
        csr=csr,
    )
    trip = w.triplets.astype(jnp.int32)
    if w.neg_heads is not None:
        lab = (w.neg_heads.astype(jnp.int32), w.neg_tails.astype(jnp.int32))
    else:
        lab = w.labels.astype(jnp.float32)
    return graph, trip, lab
