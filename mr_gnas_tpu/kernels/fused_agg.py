"""Fused E->N middle-stage aggregation: gather + compose + reduce in ONE
Pallas pass (SURVEY.md §7.2's headline fusion target).

The supernet middle stage (cells/fused.py) computes, per first-state
``x = SE[m]`` of [E, D] edge rows:

    a_max    = segment_max(relu(x @ w_max  + b_max))      # AMaxLP pre-linear
    a_sum    = segment_sum(x)
    mean_num = segment_sum(relu(x @ w_mean + b_mean))     # AMeanLP pre-linear

(reference: the aggregator pipelines models/operations_lp.py:224-266 —
DGL ``update_all(copy_e, max/sum/mean)`` preceded by per-op Linears).
The composite XLA path materializes the two relu'd [E, D] lin slabs in
HBM and runs three separate gather->reduce passes. This kernel streams
each blocked-CSR chunk ONCE: the [RB, D] rows are gathered by the
pipeline, both [D, D] pre-linears run on the MXU in VMEM, and all three
reductions accumulate into the chunk's revisited [BN, D] node blocks —
no lin slab, one gather instead of three.

The backward is scatter-free XLA (custom VJP): cotangents route back as
``g[dst] * mask`` gathers; the lin pre-activations are *recomputed* from
``x`` (two [E, D] x [D, D] MXU matmuls) instead of storing the slabs;
``a_max`` uses the segment-max tie convention of
:func:`pallas_segment._seg_csr_bwd` (every row equal to the segment max
receives the cotangent).

Layout/quirk notes shared with pallas_segment.py: seg ids are delivered
sublane-replicated ([1, 8, RB] blocks); Mosaic cannot lower
``concatenate`` or >=128-lane 1D rolls; row-mask broadcasts must be f32
blends.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mr_gnas_tpu.kernels.pallas_segment import _NEG, CSRMeta, _roll1d


def _segmax_chunk(x, seg, rb):
    """Segmented prefix-max of an [RB, D] chunk along dst-sorted rows ->
    (is_end one-hot extraction inputs). Returns (x_maxed, end_f)."""
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
    return x, jnp.where(is_end, 1.0, 0.0)


def _fused_kernel(
    blk_ref, row_ref, first_ref, seg_ref, x_ref,
    wmax_ref, bmax_ref, wmean_ref, bmean_ref,
    max_ref, sum_ref, mean_ref, *, bn, rb,
):
    i = pl.program_id(0)
    seg = seg_ref[0, 0, :]  # [RB]
    local = seg - blk_ref[i] * bn
    node_ids = jax.lax.broadcasted_iota(jnp.int32, (bn, rb), 0)
    sel = node_ids == local[None, :]
    one_hot = jnp.where(sel, 1.0, 0.0)

    @pl.when(first_ref[i] == 1)
    def _():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        mean_ref[...] = jnp.zeros_like(mean_ref)
        max_ref[...] = jnp.full_like(max_ref, _NEG)

    x = x_ref[...]  # compute dtype (rows of dummies hold row 0 — excluded
    # from every reduction by one_hot/seg masks below)
    xf = x.astype(jnp.float32)

    # a_sum: exact f32 accumulation (one-hot side is exact either way)
    sum_ref[...] += jax.lax.dot_general(
        one_hot, xf,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    # a_mean numerator: relu(x @ w_mean + b_mean) — the [D, D] transform
    # runs at the model's compute precision (same contract as the XLA
    # einsum it replaces), the reduction at HIGHEST
    lin_mean = jnp.maximum(
        jax.lax.dot_general(
            x, wmean_ref[...].astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bmean_ref[0, :].astype(jnp.float32)[None, :],
        0.0,
    )
    mean_ref[...] += jax.lax.dot_general(
        one_hot, lin_mean,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    # a_max: relu-lin then segmented prefix-max + boundary extraction
    lin_max = jnp.maximum(
        jax.lax.dot_general(
            x, wmax_ref[...].astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bmax_ref[0, :].astype(jnp.float32)[None, :],
        0.0,
    )
    xm, end_f = _segmax_chunk(lin_max, seg, rb)
    oh_end = one_hot * end_f[None, :]
    extracted = jax.lax.dot_general(
        oh_end, xm * end_f[:, None],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    present = jnp.where(jnp.sum(oh_end, axis=1) > 0, 1.0, 0.0)
    max_ref[...] = jnp.maximum(
        max_ref[...], present[:, None] * extracted + (1.0 - present[:, None]) * _NEG
    )


def _fused_fwd_impl(x, w_max, b_max, w_mean, b_mean, meta: CSRMeta, interpret):
    e, d = x.shape
    bn, rb = meta.bn, meta.rb
    n_chunks = meta.chunk_block.shape[0]
    n_blocks = -(-meta.n_nodes // bn)
    x_sorted = jnp.take(x, meta.perm, axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, rb), lambda i, blk, row, first: (row[i], 0, 0)),
            pl.BlockSpec((rb, d), lambda i, blk, row, first: (row[i], 0)),
            pl.BlockSpec((d, d), lambda i, blk, row, first: (0, 0)),
            pl.BlockSpec((1, d), lambda i, blk, row, first: (0, 0)),
            pl.BlockSpec((d, d), lambda i, blk, row, first: (0, 0)),
            pl.BlockSpec((1, d), lambda i, blk, row, first: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bn, d), lambda i, blk, row, first: (blk[i], 0)),
            pl.BlockSpec((bn, d), lambda i, blk, row, first: (blk[i], 0)),
            pl.BlockSpec((bn, d), lambda i, blk, row, first: (blk[i], 0)),
        ),
    )
    from mr_gnas_tpu.kernels.common import out_struct

    shp = out_struct((n_blocks * bn, d), jnp.float32, x_sorted, meta.chunk_block)
    out_max, out_sum, out_mean = pl.pallas_call(
        functools.partial(_fused_kernel, bn=bn, rb=rb),
        out_shape=(shp, shp, shp),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        meta.chunk_block, meta.chunk_row, meta.chunk_first, meta.seg3d,
        x_sorted,
        w_max, b_max.reshape(1, d), w_mean, b_mean.reshape(1, d),
    )
    n = meta.n_nodes
    out_max = jnp.where(meta.counts[:, None] > 0, out_max[:n], 0.0)
    return out_max, out_sum[:n], out_mean[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_agg(interpret: bool, x, w_max, b_max, w_mean, b_mean, meta, dst, mask):
    return _fused_fwd_impl(x, w_max, b_max, w_mean, b_mean, meta, interpret)


def _fused_agg_fwd(interpret, x, w_max, b_max, w_mean, b_mean, meta, dst, mask):
    out = _fused_fwd_impl(x, w_max, b_max, w_mean, b_mean, meta, interpret)
    return out, (x, w_max, b_max, w_mean, b_mean, out[0], meta, dst, mask)


def _zero_cot(v):
    if jnp.issubdtype(v.dtype, jnp.floating):
        return jnp.zeros_like(v)
    return np.zeros(v.shape, jax.dtypes.float0)


def _fused_agg_bwd(interpret, res, cots):
    x, w_max, b_max, w_mean, b_mean, out_max, meta, dst, mask = res
    g_max, g_sum, g_mean = cots
    dst_c = jnp.minimum(dst, meta.n_nodes - 1)
    m2 = mask[:, None]
    gs = jnp.take(g_sum, dst_c, axis=0) * m2
    gm = jnp.take(g_mean, dst_c, axis=0) * m2
    gx = jnp.take(g_max, dst_c, axis=0) * m2

    xc = x  # compute dtype, matching the in-kernel matmul precision
    pre_mean = (
        jax.lax.dot_general(
            xc, w_mean.astype(xc.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_mean.astype(jnp.float32)[None, :]
    )
    pre_max = (
        jax.lax.dot_general(
            xc, w_max.astype(xc.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_max.astype(jnp.float32)[None, :]
    )
    dy_mean = jnp.where(pre_mean > 0, gm, 0.0)
    # segment-max tie convention: every row whose relu'd value equals the
    # segment max receives the cotangent (pallas_segment._seg_csr_bwd)
    eq = (jnp.maximum(pre_max, 0.0) == jnp.take(out_max, dst_c, axis=0)).astype(
        jnp.float32
    )
    dy_max = jnp.where(pre_max > 0, eq * gx, 0.0)

    dx = (
        gs
        + jax.lax.dot_general(
            dy_mean, w_mean.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            dy_max, w_max.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ).astype(x.dtype)
    xf32 = x.astype(jnp.float32)
    dw_mean = jax.lax.dot_general(
        xf32, dy_mean,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w_mean.dtype)
    dw_max = jax.lax.dot_general(
        xf32, dy_max,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w_max.dtype)
    db_mean = jnp.sum(dy_mean, axis=0).astype(b_mean.dtype)
    db_max = jnp.sum(dy_max, axis=0).astype(b_max.dtype)
    return (
        dx, dw_max, db_max, dw_mean, db_mean,
        jax.tree.map(_zero_cot, meta), _zero_cot(dst), _zero_cot(mask),
    )


_fused_agg.defvjp(_fused_agg_fwd, _fused_agg_bwd)


def fused_middle_agg(
    x, w_max, b_max, w_mean, b_mean, meta: CSRMeta, dst, mask,
    interpret: bool | None = None,
):
    """(a_max, a_sum_raw, mean_num) for one first-state, each [N, D] f32.

    ``x``: [E, D] edge rows (compute dtype); ``w_*``/``b_*``: the
    aggregator pre-linears ([D, D], [D]); ``meta``: the graph's blocked
    CSR; ``dst``/``mask``: original-order edge dst ids + validity (used
    only by the backward). Matches the composite
    ``segment_{max,sum,mean-num}`` + XLA-lin path within matmul
    reassociation tolerance; differentiable in x/w/b with no scatter in
    either direction.
    """
    if interpret is None:
        from mr_gnas_tpu.kernels.common import pallas_interpret_default

        interpret = pallas_interpret_default()
    from mr_gnas_tpu.kernels.common import match_vma

    # under shard_map: pvary the replicated pre-linear params so their
    # cotangents psum back to replicated through the pvary transpose
    # (custom_vjp blocks the automatic insertion — see common.match_vma)
    w_max, b_max, w_mean, b_mean = (
        match_vma(v, x) for v in (w_max, b_max, w_mean, b_mean)
    )
    return _fused_agg(bool(interpret), x, w_max, b_max, w_mean, b_mean, meta, dst, mask)
