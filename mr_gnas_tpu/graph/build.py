"""Host-side (numpy) graph construction.

Re-implements, TPU-first, the graph builders of the reference:
  * utils/utils_rgcn.py:129-158 ``build_graph_from_triplets`` — reverse-edge
    augmentation, relation-sorted edge order, symmetric degree norms;
  * train/mr_lp_train.py:77-89 ``build_graph`` — full train graph with
    ``norm = deg_dst^-1/2 * deg_src^-1/2`` per edge;
  * search/mr_lp_search.py:30-36 ``node_norm_to_edge_norm``.

Everything here runs on host numpy and emits padded, statically shaped
arrays so that the jitted device program never recompiles across sampled
graphs.
"""
from __future__ import annotations

import numpy as np

from mr_gnas_tpu.graph.container import RelGraph


def round_up(n: int, multiple: int) -> int:
    """Round n up to a multiple (static-shape bucketing)."""
    if multiple <= 1:
        return n
    return ((n + multiple - 1) // multiple) * multiple


def compute_node_norm(num_nodes: int, dst: np.ndarray) -> np.ndarray:
    """In-degree^-1/2 per node, 0 where degree is 0.

    Mirrors ``comp_deg_norm`` (reference utils/utils_rgcn.py:120-127).
    """
    deg = np.bincount(dst, minlength=num_nodes).astype(np.float64)
    with np.errstate(divide="ignore"):
        norm = deg ** -0.5
    norm[np.isinf(norm)] = 0.0
    return norm.astype(np.float32)


def _rel_sort(src: np.ndarray, rel: np.ndarray, dst: np.ndarray):
    """Sort edges by (rel, dst, src) — the canonical relation-sorted layout
    (reference utils/utils_rgcn.py:151-152)."""
    order = np.lexsort((src, dst, rel))
    return src[order], rel[order], dst[order]


def build_rel_graph(
    triplets: np.ndarray,
    num_nodes: int,
    num_rels: int,
    n_fwd_pad: int | None = None,
    n_nodes_pad: int | None = None,
    global_ids: np.ndarray | None = None,
    pad_multiple: int = 1,
) -> RelGraph:
    """Build a padded :class:`RelGraph` from (s, r, o) triplets.

    Adds inverse edges with ``rel + num_rels`` and self-loop rows with
    relation id ``2*num_rels``, sorts each half by relation, computes the
    symmetric edge norm ``deg_dst^-1/2 * deg_src^-1/2`` over the
    *bidirectional* edge set, and pads edge rows / nodes to static sizes.

    Args:
      triplets: [E, 3] int array of (src, rel, dst) in *local* node ids.
      num_nodes: number of real (local) nodes.
      num_rels: number of forward relations.
      n_fwd_pad: static forward-edge row count; default: E rounded up.
      n_nodes_pad: static node count; default: num_nodes rounded up.
      global_ids: [num_nodes] local->global entity map (default identity).
      pad_multiple: bucket multiple for the default pads.
    """
    triplets = np.asarray(triplets, dtype=np.int64)
    e = triplets.shape[0]
    s, r, o = triplets[:, 0], triplets[:, 1], triplets[:, 2]

    fs, fr, fd = _rel_sort(s.copy(), r.copy(), o.copy())
    bs, br, bd = _rel_sort(o.copy(), r + num_rels, s.copy())

    all_dst = np.concatenate([fd, bd])
    all_src = np.concatenate([fs, bs])
    node_norm = compute_node_norm(num_nodes, all_dst)
    edge_norm = node_norm[all_dst] * node_norm[all_src]

    if n_fwd_pad is None:
        n_fwd_pad = round_up(e, pad_multiple)
    if n_nodes_pad is None:
        n_nodes_pad = round_up(num_nodes, pad_multiple)
    if n_fwd_pad < e:
        raise ValueError(f"n_fwd_pad={n_fwd_pad} < num edges {e}")
    if n_nodes_pad < num_nodes:
        raise ValueError(f"n_nodes_pad={n_nodes_pad} < num nodes {num_nodes}")

    self_rel = 2 * num_rels
    r_total = 2 * n_fwd_pad + n_nodes_pad
    src = np.zeros(r_total, dtype=np.int32)
    dst = np.full(r_total, n_nodes_pad, dtype=np.int32)
    etype = np.full(r_total, self_rel, dtype=np.int32)
    norm = np.ones(r_total, dtype=np.float32)
    row_mask = np.zeros(r_total, dtype=np.float32)

    # forward section
    src[:e] = fs
    dst[:e] = fd
    etype[:e] = fr
    norm[:e] = edge_norm[:e]
    row_mask[:e] = 1.0
    # inverse section
    off = n_fwd_pad
    src[off : off + e] = bs
    dst[off : off + e] = bd
    etype[off : off + e] = br
    norm[off : off + e] = edge_norm[e:]
    row_mask[off : off + e] = 1.0
    # self section
    off = 2 * n_fwd_pad
    src[off : off + num_nodes] = np.arange(num_nodes, dtype=np.int32)
    dst[off : off + num_nodes] = np.arange(num_nodes, dtype=np.int32)
    row_mask[off : off + num_nodes] = 1.0
    # padded self rows must not collide with real nodes in segment ops
    dst[off + num_nodes :] = n_nodes_pad

    if global_ids is None:
        gids = np.arange(n_nodes_pad, dtype=np.int32)
        gids[num_nodes:] = 0
    else:
        gids = np.zeros(n_nodes_pad, dtype=np.int32)
        gids[:num_nodes] = np.asarray(global_ids, dtype=np.int32)
    node_mask = np.zeros(n_nodes_pad, dtype=np.float32)
    node_mask[:num_nodes] = 1.0

    return RelGraph(
        src=src,
        dst=dst,
        etype=etype,
        norm=norm,
        row_mask=row_mask,
        global_ids=gids,
        node_mask=node_mask,
        n_fwd=int(n_fwd_pad),
        n_nodes=int(n_nodes_pad),
        num_rels=int(num_rels),
    )


def attach_csr(
    graph: RelGraph, bn: int = 128, rb: int | None = None,
    static_pad: bool = False,
) -> RelGraph:
    """Attach a blocked-CSR index over the edge rows so the LP aggregators
    run through the Pallas segment kernels (kernels/pallas_segment.py).

    Host-side (~3 ms at 64k-edge batches, native C++ builder), static per
    graph. ``static_pad=True`` pads the chunk list and row arrays to
    config-determined upper bounds (kernels/pallas_segment.pad_blocked_csr)
    so per-step sampled graphs of the same config all compile to ONE
    program — required for lp-search, where every step samples a fresh
    subgraph. Without it, use on fixed graphs only (lp-train).
    """
    import dataclasses as _dc

    import jax

    from mr_gnas_tpu.kernels.pallas_segment import (
        CSRMeta,
        build_blocked_csr,
        pad_blocked_csr,
    )

    ne = graph.n_edge_rows
    dst = np.asarray(jax.device_get(graph.dst))[:ne]
    mask = np.asarray(jax.device_get(graph.row_mask))[:ne]
    n_real = int(mask.sum())
    n_blocks = max(1, -(-graph.n_nodes // bn))
    if rb is None:
        # match the row-chunk size to the graph's density: sparse sampled
        # graphs (avg in-degree ~1) would pad every 128-node block to a
        # 512-row chunk otherwise (4x dead work). n_real is a per-config
        # constant (bs * split_size real edge rows), so rb is too.
        avg_rows = n_real / n_blocks
        rb = 64
        while rb < min(512, 2 * avg_rows):
            rb *= 2
    csr = build_blocked_csr(dst, graph.n_nodes, mask=mask, bn=bn, rb=rb)
    if static_pad:
        # upper bounds from static config dims: each block wastes < rb
        # rows and adds at most one partial chunk
        chunks_pad = n_blocks + -(-n_real // rb)
        rows_pad = n_real + n_blocks * rb + rb
        csr = pad_blocked_csr(csr, chunks_pad, rows_pad)
    return _dc.replace(graph, csr=CSRMeta.from_blocked(csr))


def index_csr(idx: np.ndarray, n_rows: int, bn: int = 128, rb: int = 512):
    """Blocked CSR of an index array (segments = target-table rows) for
    :func:`mr_gnas_tpu.kernels.pallas_segment.take_rows_csr` — the
    MXU-formulated gather backward. No mask: every cotangent row lands on
    ``table[idx[r]]``, exactly ``jnp.take``'s VJP."""
    from mr_gnas_tpu.kernels.pallas_segment import CSRMeta, build_blocked_csr

    return CSRMeta.from_blocked(
        build_blocked_csr(np.asarray(idx), n_rows, mask=None, bn=bn, rb=rb)
    )


def attach_gather_csr(graph: RelGraph, bn: int = 128, rb: int = 512) -> RelGraph:
    """Attach the blocked CSR of ``graph.src`` so the per-layer
    ``ent_emb[src]`` re-gathers (model_search_lp.py:153) backprop through
    the one-hot MXU sum instead of a scatter-add. Host-side, static per
    graph (same compilation caveat as :func:`attach_csr`)."""
    import dataclasses as _dc

    import jax

    src = np.asarray(jax.device_get(graph.src))
    return _dc.replace(graph, src_csr=index_csr(src, graph.n_nodes, bn=bn, rb=rb))
