"""Pallas TPU kernels for CSR segment reductions.

The edge->node boundary (reference: DGL's C++ ``update_all`` kernels,
models/operations_lp.py:233,248,262) as native TPU kernels over a
*blocked* dst-sorted CSR layout precomputed host-side by
:func:`build_blocked_csr`.

Layout: nodes are grouped into blocks of ``BN``; each block's in-edge
rows are laid out contiguously starting at an ``RB``-aligned offset
(dummy rows with ``seg == -1`` pad each block to a multiple of ``RB``).
The kernel grid is the host-flattened (block, chunk) list — one program
per RB-row chunk, so degree skew (FB15k-237 hubs) costs exactly its true
chunk count and every DMA is tile-aligned. Chunk inputs are delivered by
the Pallas pipeline (scalar-prefetched index maps -> automatic double
buffering); the output node-block is revisited across its chunks in the
standard accumulation pattern.

Reduction formulations chosen for the hardware:
  * ``sum`` — one-hot matmul: each [RB, D] chunk contributes
    ``one_hot(local_seg) @ chunk``, an MXU [BN, RB] x [RB, D] matmul
    (the FusedMM-style SpMM-as-GEMM formulation).
  * ``max`` — masked broadcast-max over [BN, RB, D] tiles (VPU), with
    the DGL empty-segment convention (0) applied outside the kernel via
    the host-known per-node counts.

The jnp scatter baselines in :mod:`mr_gnas_tpu.kernels.segment` remain
the reference implementations; parity is tested in
tests/test_pallas_kernels.py (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass(frozen=True)
class BlockedCSR:
    """Host-precomputed blocked CSR index (static per graph)."""

    perm: np.ndarray  # [E_pad] gather index into edge rows (0 for dummies)
    seg: np.ndarray  # [E_pad] dst id per padded row, -1 for dummies
    chunk_block: np.ndarray  # [n_total_chunks] node-block of each chunk
    chunk_row: np.ndarray  # [n_total_chunks] row offset of chunk, in RB units
    chunk_first: np.ndarray  # [n_total_chunks] 1 if first chunk of its block
    counts: np.ndarray  # [n_nodes] real in-edges per node
    n_nodes: int
    bn: int
    rb: int

    @property
    def e_pad(self) -> int:
        return len(self.perm)

    @property
    def n_blocks(self) -> int:
        return -(-self.n_nodes // self.bn)

    @property
    def n_total_chunks(self) -> int:
        return len(self.chunk_block)


def build_blocked_csr(
    dst: np.ndarray,
    n_nodes: int,
    mask: np.ndarray | None = None,
    bn: int = 128,
    rb: int = 512,
) -> BlockedCSR:
    """Sort edges by dst, group into node blocks of ``bn``, pad each
    block's rows to a multiple of ``rb``, flatten the chunk list.

    Uses the native C++ builder (csrc/sampler.cc) when available; the
    numpy path below is the fallback and parity oracle."""
    from mr_gnas_tpu import native

    nat = native.blocked_csr_native(np.asarray(dst), mask, n_nodes, bn, rb)
    if nat is not None:
        perm, seg, cb, cr, cf, counts = nat
        return BlockedCSR(
            perm=perm, seg=seg, chunk_block=cb, chunk_row=cr, chunk_first=cf,
            counts=counts, n_nodes=n_nodes, bn=bn, rb=rb,
        )
    dst = np.asarray(dst)
    e = len(dst)
    valid = np.ones(e, bool) if mask is None else np.asarray(mask) > 0
    key = np.where(valid, dst, n_nodes)
    order = np.argsort(key, kind="stable")
    sorted_key = key[order]
    n_real = int(valid.sum())
    order = order[:n_real]
    sorted_key = sorted_key[:n_real]

    n_blocks = -(-n_nodes // bn)
    node_off = np.searchsorted(sorted_key, np.arange(0, n_blocks * bn + 1, bn))
    rows_per_block = np.diff(node_off)
    padded = -(-np.maximum(rows_per_block, 1) // rb) * rb
    block_start = np.concatenate([[0], np.cumsum(padded)])[:-1].astype(np.int64)
    e_pad = int(padded.sum())

    perm = np.zeros(e_pad, np.int32)
    seg = np.full(e_pad, -1, np.int32)
    chunk_block, chunk_row, chunk_first = [], [], []
    for b in range(n_blocks):
        lo, hi = node_off[b], node_off[b + 1]
        s = block_start[b]
        perm[s : s + hi - lo] = order[lo:hi]
        seg[s : s + hi - lo] = sorted_key[lo:hi]
        nchunks = padded[b] // rb
        for c in range(nchunks):
            chunk_block.append(b)
            chunk_row.append(s // rb + c)
            chunk_first.append(1 if c == 0 else 0)
    counts = np.bincount(seg[seg >= 0], minlength=n_nodes).astype(np.float32)
    return BlockedCSR(
        perm=perm,
        seg=seg,
        chunk_block=np.asarray(chunk_block, np.int32),
        chunk_row=np.asarray(chunk_row, np.int32),
        chunk_first=np.asarray(chunk_first, np.int32),
        counts=counts,
        n_nodes=n_nodes,
        bn=bn,
        rb=rb,
    )


_NEG = -1e30


def _kernel(blk_ref, row_ref, first_ref, seg_ref, data_ref, out_ref, *, bn, rb, op):
    i = pl.program_id(0)
    local = seg_ref[0, 0, :] - blk_ref[i] * bn  # [RB]; dummies negative
    node_ids = jax.lax.broadcasted_iota(jnp.int32, (bn, rb), 0)
    sel = node_ids == local[None, :]

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[...] = (
            jnp.zeros_like(out_ref) if op == "sum" else jnp.full_like(out_ref, _NEG)
        )

    if op == "sum":
        one_hot = jnp.where(sel, 1.0, 0.0)
        # HIGHEST precision: the MXU's default bf16 passes truncate the
        # data mantissa (~0.05% per element) — unacceptable for a sum
        # kernel whose XLA baseline is exact f32
        out_ref[...] += jax.lax.dot_general(
            one_hot,
            data_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        # f32 select mask: Mosaic only supports minor-dim broadcast
        # insertion for 32-bit types (not i1)
        sel_f = jnp.where(sel, 1.0, 0.0)[:, :, None]
        contrib = sel_f * data_ref[...][None, :, :] + (1.0 - sel_f) * _NEG
        out_ref[...] = jnp.maximum(out_ref[...], jnp.max(contrib, axis=1))


def _segment_csr(data_sorted, csr: BlockedCSR, op: str, interpret: bool):
    e_pad, d = data_sorted.shape
    bn, rb = csr.bn, csr.rb
    # seg ids per chunk, replicated over 8 sublanes so the (1, 8, rb)
    # block satisfies the TPU (8, 128) tile rule (~seg is 1/8 the size of
    # a d=128 data chunk, so the duplication costs a few % of traffic)
    seg3d = jnp.asarray(
        np.repeat(csr.seg.reshape(-1, 1, rb), 8, axis=1)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # chunk_block, chunk_row, chunk_first
        grid=(csr.n_total_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, rb), lambda i, blk, row, first: (row[i], 0, 0)),
            pl.BlockSpec((rb, d), lambda i, blk, row, first: (row[i], 0)),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda i, blk, row, first: (blk[i], 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, bn=bn, rb=rb, op=op),
        out_shape=jax.ShapeDtypeStruct((csr.n_blocks * bn, d), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        jnp.asarray(csr.chunk_block),
        jnp.asarray(csr.chunk_row),
        jnp.asarray(csr.chunk_first),
        seg3d,
        data_sorted,
    )
    return out[: csr.n_nodes]


def segment_reduce_pallas(
    data: jax.Array,
    csr: BlockedCSR,
    op: str = "sum",
    interpret: bool = False,
) -> jax.Array:
    """Gather rows into the blocked-CSR order and reduce -> [n_nodes, D].

    ``data`` is the unsorted [E, D] edge-message tensor; the blocked-CSR
    permutation (host-precomputed, static per graph) is applied with an
    XLA gather, then the Pallas kernel reduces each node block. Empty
    segments yield 0 for both ops (DGL convention).
    """
    if op not in ("sum", "max"):
        raise ValueError(op)
    sorted_data = jnp.take(data, jnp.asarray(csr.perm), axis=0)
    out = _segment_csr(sorted_data, csr, op, interpret)
    if op == "max":
        counts = jnp.asarray(csr.counts)
        out = jnp.where(counts[:, None] > 0, out, 0.0)
    return out


def segment_mean_pallas(data, csr: BlockedCSR, interpret: bool = False):
    """Mean via Pallas sum / per-node counts."""
    s = segment_reduce_pallas(data, csr, "sum", interpret)
    counts = jnp.asarray(csr.counts)
    return jnp.where(counts[:, None] > 0, s / jnp.maximum(counts[:, None], 1.0), 0.0)
