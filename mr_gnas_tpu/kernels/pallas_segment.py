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

    def inverse_perm(self, n_rows: int) -> tuple[np.ndarray, np.ndarray]:
        """(inv [n_rows], has [n_rows]) — position of each original edge
        row in the sorted layout and whether it is present (masked-out
        rows get gradient 0). For the gather-formulated backward of the
        segment ops."""
        valid = self.seg >= 0
        inv = np.zeros(n_rows, np.int32)
        has = np.zeros(n_rows, np.float32)
        pos = np.nonzero(valid)[0].astype(np.int32)
        inv[self.perm[valid]] = pos
        has[self.perm[valid]] = 1.0
        return inv, has

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


def pad_blocked_csr(
    csr: BlockedCSR, chunks_pad: int, rows_pad: int | None = None
) -> BlockedCSR:
    """Pad a blocked CSR to STATIC shapes across sampled graphs so the
    Pallas kernels compile once per config instead of once per sample
    (the chunk count is otherwise data-dependent on the dst
    distribution).

    ``perm``/``seg`` grow to ``rows_pad`` (-1 segs = identity rows, the
    kernels' existing padding convention) with one shared all-dummy
    RB-row region at the end; the chunk list grows to ``chunks_pad``
    no-op chunks (``chunk_first=0``, pointing at the dummy region) that
    accumulate the identity element. The no-op chunks MUST target the
    LAST block: the Pallas output pipeline only supports accumulation
    across CONSECUTIVE grid steps with the same out index — a dummy
    chunk revisiting an earlier (already flushed) block reads a stale
    out buffer and clobbers it (observed as ±1e30 rows on TPU; interpret
    mode cannot catch this). Appended dummies extend the last real
    block's chunk run, which is consecutive by construction. Upper-bound
    budgets are cheap: a dead chunk costs one reused [RB, D] DMA + a
    zero matmul (~us each)."""
    rb = csr.rb
    need_rows = csr.e_pad + rb
    rows_pad = max(rows_pad or 0, need_rows)
    rows_pad = -(-rows_pad // rb) * rb
    n_extra = chunks_pad - csr.n_total_chunks
    if n_extra < 0:
        raise ValueError(
            f"chunks_pad {chunks_pad} < actual chunk count {csr.n_total_chunks}"
        )
    perm = np.zeros(rows_pad, np.int32)
    perm[: csr.e_pad] = csr.perm
    seg = np.full(rows_pad, -1, np.int32)
    seg[: csr.e_pad] = csr.seg
    dummy_row = (rows_pad - rb) // rb
    last_block = csr.n_blocks - 1
    cb = np.concatenate([csr.chunk_block, np.full(n_extra, last_block, np.int32)])
    cr = np.concatenate([csr.chunk_row, np.full(n_extra, dummy_row, np.int32)])
    cf = np.concatenate([csr.chunk_first, np.zeros(n_extra, np.int32)])
    return BlockedCSR(
        perm=perm, seg=seg, chunk_block=cb.astype(np.int32),
        chunk_row=cr.astype(np.int32), chunk_first=cf.astype(np.int32),
        counts=csr.counts, n_nodes=csr.n_nodes, bn=csr.bn, rb=csr.rb,
    )


_NEG = -1e30


def _roll1d(s, k):
    """1D roll composed from sub-128 steps — Mosaic cannot lower a lane
    rotate with shift >= 128 (one lane-tile) in this toolchain."""
    if k < 0:
        # negative shift: roll forward by len - |k|
        k = s.shape[0] + k
    while k > 0:
        step = min(k, 127)
        s = jnp.roll(s, step)
        k -= step
    return s


def _kernel(blk_ref, row_ref, first_ref, seg_ref, data_ref, out_ref, *, bn, rb, op):
    i = pl.program_id(0)
    seg = seg_ref[0, 0, :]  # [RB] global node ids, -1 for dummies
    local = seg - blk_ref[i] * bn  # dummies negative
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
        # segmented prefix-max along the sorted rows (log2(RB) shifted
        # maxes on the VPU), then extract each segment's last row with a
        # boundary one-hot MXU matmul — avoids the old [BN, RB, D]
        # broadcast-max slab (NOTES.md round-1 item 2: 2x slower than
        # scatter; this formulation does RB*D work instead of BN*RB*D).
        # Shifts are jnp.roll + iota masks (concatenate does not lower in
        # this Mosaic version).
        # (all row-mask broadcasts are f32 blends: Mosaic only supports
        # minor-dim broadcast insertion for 32-bit types, not i1)
        x = data_ref[...]  # [RB, D]
        real = jnp.where(seg >= 0, 1.0, 0.0)[:, None]
        x = x * real + (1.0 - real) * _NEG
        pos = jax.lax.broadcasted_iota(jnp.int32, (rb,), 0)
        k = 1
        while k < rb:
            shifted = jnp.roll(x, k, axis=0)
            seg_sh = _roll1d(seg, k)
            take = jnp.where((pos >= k) & (seg_sh == seg), 1.0, 0.0)[:, None]
            x = take * jnp.maximum(x, shifted) + (1.0 - take) * x
            k *= 2
        nxt = _roll1d(seg, -1)
        is_end = (seg >= 0) & ((nxt != seg) | (pos == rb - 1))
        end_f = jnp.where(is_end, 1.0, 0.0)
        one_hot = jnp.where(sel, 1.0, 0.0) * end_f[None, :]
        extracted = jax.lax.dot_general(
            one_hot,
            x * end_f[:, None],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        present = jnp.where(jnp.sum(one_hot, axis=1) > 0, 1.0, 0.0)
        out_ref[...] = jnp.maximum(
            out_ref[...], present[:, None] * extracted + (1.0 - present[:, None]) * _NEG
        )


import flax.struct


@flax.struct.dataclass
class CSRMeta:
    """Device-resident blocked-CSR index, attachable to a RelGraph.

    The jit-traceable twin of :class:`BlockedCSR` (arrays are pytree
    leaves; tile sizes static)."""

    perm: jax.Array  # [E_pad]
    seg3d: jax.Array  # [n_chunks, 8, rb] sublane-replicated seg ids
    chunk_block: jax.Array
    chunk_row: jax.Array
    chunk_first: jax.Array
    counts: jax.Array  # [n_nodes] f32
    bn: int = flax.struct.field(pytree_node=False)
    rb: int = flax.struct.field(pytree_node=False)
    n_nodes: int = flax.struct.field(pytree_node=False)

    @staticmethod
    def from_blocked(csr: BlockedCSR) -> "CSRMeta":
        return CSRMeta(
            perm=jnp.asarray(csr.perm),
            seg3d=jnp.asarray(np.repeat(csr.seg.reshape(-1, 1, csr.rb), 8, axis=1)),
            chunk_block=jnp.asarray(csr.chunk_block),
            chunk_row=jnp.asarray(csr.chunk_row),
            chunk_first=jnp.asarray(csr.chunk_first),
            counts=jnp.asarray(csr.counts),
            bn=csr.bn,
            rb=csr.rb,
            n_nodes=csr.n_nodes,
        )


def _segment_csr_meta(data_sorted, meta: CSRMeta, op: str, interpret: bool):
    e_pad, d = data_sorted.shape
    bn, rb = meta.bn, meta.rb
    n_chunks = meta.chunk_block.shape[0]
    n_blocks = -(-meta.n_nodes // bn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # chunk_block, chunk_row, chunk_first
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, rb), lambda i, blk, row, first: (row[i], 0, 0)),
            pl.BlockSpec((rb, d), lambda i, blk, row, first: (row[i], 0)),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda i, blk, row, first: (blk[i], 0)),
    )
    from mr_gnas_tpu.kernels.common import out_struct

    out = pl.pallas_call(
        functools.partial(_kernel, bn=bn, rb=rb, op=op),
        out_shape=out_struct(
            (n_blocks * bn, d), jnp.float32, data_sorted, meta.chunk_block
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        meta.chunk_block,
        meta.chunk_row,
        meta.chunk_first,
        meta.seg3d,
        data_sorted,
    )
    return out[: meta.n_nodes]


def _segment_csr(data_sorted, csr: BlockedCSR, op: str, interpret: bool):
    return _segment_csr_meta(data_sorted, CSRMeta.from_blocked(csr), op, interpret)


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


# ---------------------------------------------------------------------------
# differentiable CSR segment ops (the load-bearing model path)
# ---------------------------------------------------------------------------


def _interpret_default() -> bool:
    from mr_gnas_tpu.kernels.common import pallas_interpret_default

    return pallas_interpret_default()


def _zero_cot(x):
    """Zero cotangent for a possibly-integer primal (float0 for ints)."""
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _seg_csr(op: str, interpret: bool, data, meta: CSRMeta, dst, mask):
    """Differentiable Pallas segment reduce with a gather-formulated VJP.

    The backward is a plain gather ``g[dst] * mask`` (sum) or the
    max-equality variant — no scatter anywhere in forward or backward.
    """
    sorted_data = jnp.take(data, meta.perm, axis=0)
    out = _segment_csr_meta(sorted_data, meta, op, interpret)
    if op == "max":
        out = jnp.where(meta.counts[:, None] > 0, out, 0.0)
    return out


def _seg_csr_fwd(op, interpret, data, meta, dst, mask):
    out = _seg_csr(op, interpret, data, meta, dst, mask)
    res = (data if op == "max" else None, out if op == "max" else None, meta, dst, mask)
    return out, res


def _seg_csr_bwd(op, interpret, res, g):
    data, out, meta, dst, mask = res
    dst_c = jnp.minimum(dst, meta.n_nodes - 1)
    if op == "max":
        eq = (data == jnp.take(out, dst_c, axis=0)).astype(g.dtype)
        gd = eq * jnp.take(g, dst_c, axis=0)
    else:
        gd = jnp.take(g, dst_c, axis=0)
    return (
        gd * mask[:, None],
        jax.tree.map(_zero_cot, meta),
        _zero_cot(dst),
        _zero_cot(mask),
    )


_seg_csr.defvjp(_seg_csr_fwd, _seg_csr_bwd)


def segment_sum_csr(data, meta: CSRMeta, dst, mask, interpret: bool | None = None):
    """Differentiable CSR segment sum (drop-in for kernels.segment_sum
    when the graph carries a CSRMeta). Data is computed in f32 inside the
    kernel; the cast sits outside the custom_vjp so bf16 cotangents
    flow back correctly."""
    if interpret is None:
        interpret = _interpret_default()
    return _seg_csr("sum", interpret, data.astype(jnp.float32), meta, dst, mask)


def segment_max_csr(data, meta: CSRMeta, dst, mask, interpret: bool | None = None):
    if interpret is None:
        interpret = _interpret_default()
    return _seg_csr("max", interpret, data.astype(jnp.float32), meta, dst, mask)


def segment_mean_csr(data, meta: CSRMeta, dst, mask, interpret: bool | None = None):
    s = segment_sum_csr(data, meta, dst, mask, interpret)
    c = meta.counts
    return jnp.where(c[:, None] > 0, s / jnp.maximum(c[:, None], 1.0), 0.0)


# ---------------------------------------------------------------------------
# CSR-backed row gather: jnp.take whose backward is the one-hot MXU sum
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _take_csr(interpret: bool, x, idx, meta: CSRMeta):
    return jnp.take(x, idx, axis=0)


def _take_csr_fwd(interpret, x, idx, meta):
    # zero-size dtype witness: residuals must be jax types, not dtypes
    return jnp.take(x, idx, axis=0), (meta, idx, jnp.zeros((0,), x.dtype))


def _take_csr_bwd(interpret, res, g):
    meta, idx, x_proto = res
    sorted_g = jnp.take(g.astype(jnp.float32), meta.perm, axis=0)
    dx = _segment_csr_meta(sorted_g, meta, "sum", interpret)
    return (dx.astype(x_proto.dtype), _zero_cot(idx), jax.tree.map(_zero_cot, meta))


_take_csr.defvjp(_take_csr_fwd, _take_csr_bwd)


def take_rows_csr(x, idx, meta: CSRMeta, interpret: bool | None = None):
    """``jnp.take(x, idx, axis=0)`` whose backward replaces the XLA
    scatter-add with the blocked-CSR one-hot MXU reduction.

    For the big embedding-table gathers on the training hot path (the
    triplet (s, o) rows and the per-layer ``ent_emb[graph.src]`` re-gather
    — reference sites model_search_lp.py:153,171), whose gradient
    scatters dominate the scatter category of the measured roofline.
    ``meta`` must be the blocked CSR of ``idx`` with ``n_nodes ==
    x.shape[0]`` and no mask (every cotangent row lands on ``x[idx[r]]``,
    exactly ``jnp.take``'s VJP). Not differentiable w.r.t. ``idx``.
    """
    if interpret is None:
        interpret = _interpret_default()
    assert meta.n_nodes == x.shape[0], (meta.n_nodes, x.shape)
    from mr_gnas_tpu.kernels.common import match_vma

    # under shard_map: pvary a replicated x so its cotangent psums back
    # to replicated through the pvary transpose (common.match_vma)
    x = match_vma(x, idx)
    return _take_csr(bool(interpret), x, idx, meta)
