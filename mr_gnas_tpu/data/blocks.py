"""Multi-hop message-flow-graph (block) construction for NC.

Host-side replacement for DGL's C++ ``MultiLayerFullNeighborSampler`` +
``NodeDataLoader`` (search/mr_nc_search.py:43-74): given a homogeneous
typed edge list and a set of seed nodes, extract per-hop bipartite blocks
(outermost first) with padded, statically-bucketed index arrays. The
position arrays precompute what the reference recomputes per step with an
O(N_dst * E) python loop (models/model_search.py:167-171).
"""
from __future__ import annotations

import numpy as np

from mr_gnas_tpu.graph.container import Block


def bucket(n: int, minimum: int = 8) -> int:
    """Next power of two >= n — bounds jit recompilations across batches."""
    b = minimum
    while b < n:
        b *= 2
    return b


class CSRGraph:
    """Pre-sorted in-edge index for fast per-dst edge lookup."""

    def __init__(self, src: np.ndarray, dst: np.ndarray, etype: np.ndarray, num_nodes: int):
        order = np.argsort(dst, kind="stable")
        self.src = np.asarray(src)[order]
        self.dst = np.asarray(dst)[order]
        self.etype = np.asarray(etype)[order]
        self.num_nodes = num_nodes
        self.indptr = np.searchsorted(self.dst, np.arange(num_nodes + 1))

    def in_edges(self, nodes: np.ndarray):
        """(src, dst, etype) of all in-edges of ``nodes``."""
        spans = [np.arange(self.indptr[v], self.indptr[v + 1]) for v in nodes]
        idx = np.concatenate(spans) if spans else np.zeros(0, dtype=np.int64)
        return self.src[idx], self.dst[idx], self.etype[idx]


def _expand(csr: "CSRGraph", needed: np.ndarray):
    """One-hop in-edges + next frontier (seeds-prefix convention).

    Uses the native C++ frontier expansion (csrc/sampler.cc) when
    available; numpy fallback below."""
    from mr_gnas_tpu import native

    out = native.in_edges_frontier_native(csr.indptr, csr.src, csr.etype, needed)
    if out is not None:
        e_src, e_dst_pos, e_et, frontier = out
        return (e_src, needed[e_dst_pos], e_et), frontier
    s, d, t = csr.in_edges(needed)
    extra = np.setdiff1d(np.unique(s), needed)
    return (s, d, t), np.concatenate([needed, extra])


def build_blocks(
    csr: CSRGraph,
    seeds: np.ndarray,
    layers: int,
    pad_fn=bucket,
) -> tuple[list[Block], np.ndarray]:
    """Extract ``layers`` full-neighbor blocks for ``seeds``.

    Returns ``(blocks, seed_pos)``: blocks in forward processing order
    (``blocks[0]`` is the hop farthest from the seeds, processed first;
    ``blocks[-1]``'s dst prefix holds the unique seeds — matching DGL
    NodeDataLoader semantics), and ``seed_pos[j]`` = row of ``seeds[j]``
    in the final block's dst array (handles duplicate/padded seeds).
    """
    seeds = np.asarray(seeds, dtype=np.int64)
    uniq, first_pos = np.unique(seeds, return_index=True)
    uniq = seeds[np.sort(first_pos)]  # stable first-occurrence order
    seed_pos_map = {int(v): p for p, v in enumerate(uniq)}
    seed_pos = np.fromiter(
        (seed_pos_map[int(v)] for v in seeds), dtype=np.int32, count=len(seeds)
    )
    # reverse construction: d[layers-1] = unique seeds
    dsts = [None] * layers
    raw = [None] * layers
    needed = uniq
    for i in range(layers - 1, -1, -1):
        dsts[i] = needed
        (s, d, t), needed = _expand(csr, needed)
        raw[i] = (s, d, t)

    blocks = []
    for i in range(layers):
        s, d, t = raw[i]
        d_nodes = dsts[i]
        prev_nodes = dsts[i - 1] if i > 0 else None

        n_e = pad_fn(max(len(s), 1))
        n_d = pad_fn(max(len(d_nodes), 1))

        dst_pos_map = {int(v): p for p, v in enumerate(d_nodes)}
        dst_pos = np.fromiter((dst_pos_map[int(v)] for v in d), dtype=np.int64, count=len(d))

        if prev_nodes is not None:
            prev_map = {int(v): p for p, v in enumerate(prev_nodes)}
            src_pos = np.fromiter(
                (prev_map[int(v)] for v in s), dtype=np.int64, count=len(s)
            )
        else:
            src_pos = np.zeros(len(s), dtype=np.int64)

        def pad(a, n, fill):
            out = np.full(n, fill, dtype=np.int32)
            out[: len(a)] = a
            return out

        edge_mask = np.zeros(n_e, np.float32)
        edge_mask[: len(s)] = 1.0
        dst_mask = np.zeros(n_d, np.float32)
        dst_mask[: len(d_nodes)] = 1.0

        blocks.append(
            Block(
                src_gid=pad(s, n_e, 0),
                src_pos=pad(src_pos, n_e, 0),
                dst_pos=pad(dst_pos, n_e, n_d),  # padded edges -> dummy segment
                etype=pad(t, n_e, 0),
                edge_mask=edge_mask,
                dst_gid=pad(d_nodes, n_d, 0),
                dst_mask=dst_mask,
                n_edges=int(n_e),
                n_dst=int(n_d),
            )
        )
    return blocks, seed_pos


def iterate_seed_batches(
    seeds: np.ndarray,
    batch_size: int,
    shuffle: bool = True,
    rng: np.random.Generator | None = None,
):
    """Yield (seed_batch, mask) padded to batch_size."""
    seeds = np.asarray(seeds)
    order = np.arange(len(seeds))
    if shuffle:
        (rng or np.random.default_rng()).shuffle(order)
    for start in range(0, len(seeds), batch_size):
        idx = order[start : start + batch_size]
        mask = np.ones(batch_size, np.float32)
        if len(idx) < batch_size:
            mask[len(idx) :] = 0.0
            idx = np.concatenate([idx, np.zeros(batch_size - len(idx), np.int64)])
        yield seeds[idx], mask
