"""The stage mega-kernel: op-stack -> per-(pair,op) BatchNorm -> ReLU ->
alpha-weighted mix, as Pallas TPU kernels that never materialize the
``[pairs, ops, rows, D]`` slab in HBM.

Background (NOTES.md round-2 roofline): the fused supernet cell
(cells/fused.py) evaluates each DAG level by materializing a
``[p, K, R, D]`` candidate-op slab, batch-norming it per (pair, op)
slice, ReLU-ing, and contracting with the softmaxed alphas. At
FB15k-237 search scale those slabs dominate the step: ~34% of device
time in elementwise fusions over the slabs plus ~21% in layout copies
around them. The reference's equivalent is the per-op module loop
models/cell_lp.py:24 (torch materializes every op output too).

This module computes the same function with four row-blocked passes
that each stream only the op *precursors* (the DAG states and the
pre-activation gate tensors, ~3-4 row-slabs instead of K+BN slabs):

  fwd-stats  : masked per-(p,op) sum / sum-of-squares  -> batch stats
  fwd-apply  : y = (op - mean)*inv*gamma + beta; out = sum w*relu(y)
  bwd-reduce : S1 = sum dy, S2 = sum dy*xhat, RS = sum g*relu(y)
  bwd-apply  : exact masked-BN input cotangents + gate chain rule

Candidate ops are *recomputed* from the precursors inside each pass
(VPU work on VMEM-resident tiles — cheaper than one HBM round-trip of
the slab). The backward implements the textbook batch-norm gradient
with the mask semantics of cells/fused.py's ``_bn_apply``: statistics
(and their gradient corrections) are taken over masked rows only, while
every row is normalized and contributes to S1/S2 — exactly what
``jax.grad`` of the slab formulation produces.

Stages (static kernel variants — see ``_emit_ops``):
  ``zero``  : ops = [src*hr, src-hr, src+hr]            (pre_mult/sub/add)
  ``first`` : ops = [pairs, sig(zd)*psds, sig(u)*psds, zc_sc]
              (f_identity, f_dense_comp, f_sparse_comp, f_comp over the
              [fwd|inv|self] sections — the 1/3 + norm scaling arrives
              pre-applied in ``psds``/``zc_sc``; f_zero is analytic and
              stays outside, cells/fused.py ``_mix_const_op0``)
  ``last``  : ops = [pairs, sig(zd)*pairs, sig(u)*pairs]
              (f_identity, f_dense_last, f_sparse_last)
  ``pre``   : ops = the input slabs themselves (precomputed aggregates —
              used for the middle stage's BN+ReLU+mix)

Reference sites replaced at the kernel level: the MixedOp pipelines
models/cell_lp.py:12-33 (op + BatchNorm1d + ReLU, alpha-weighted sum).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sig(x):
    return jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# op emission (shared by all four passes)
# ---------------------------------------------------------------------------


def _emit_ops(stage: str, p: int, slab_refs, u_ref):
    """Return the list of (pp, kk, op_tile) for one row block, f32.

    ``slab_refs`` are [p, RB, D] (or [RB, D] for zero) refs; ``u_ref`` is
    the [p, RB, 1] per-row sparse-gate pre-activation (None for stages
    without a sparse gate).
    """
    ops = []
    if stage == "zero":
        src = slab_refs[0][...].astype(jnp.float32)
        hr = slab_refs[1][...].astype(jnp.float32)
        ops = [(0, 0, src * hr), (0, 1, src - hr), (0, 2, src + hr)]
    elif stage == "first":
        for pp in range(p):
            pairs = slab_refs[0][pp].astype(jnp.float32)
            psds = slab_refs[1][pp].astype(jnp.float32)
            zd = slab_refs[2][pp].astype(jnp.float32)
            zc = slab_refs[3][pp].astype(jnp.float32)
            u = u_ref[pp].astype(jnp.float32)  # [RB, 1]
            ops += [
                (pp, 0, pairs),
                (pp, 1, _sig(zd) * psds),
                (pp, 2, _sig(u) * psds),
                (pp, 3, zc),
            ]
    elif stage == "last":
        for pp in range(p):
            pairs = slab_refs[0][pp].astype(jnp.float32)
            zd = slab_refs[1][pp].astype(jnp.float32)
            u = u_ref[pp].astype(jnp.float32)
            ops += [
                (pp, 0, pairs),
                (pp, 1, _sig(zd) * pairs),
                (pp, 2, _sig(u) * pairs),
            ]
    elif stage == "pre":
        for kk, ref in enumerate(slab_refs):
            ops.append((0, kk, ref[...].astype(jnp.float32)))
    else:  # pragma: no cover
        raise ValueError(stage)
    return ops


def _stage_k(stage: str, n_slabs: int) -> int:
    return {"zero": 3, "first": 4, "last": 3, "pre": n_slabs}[stage]


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _stats_kernel(*refs, stage, p, k):
    *slab_refs, u_ref, mask_ref, sums_ref, sumsq_ref = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)
        sumsq_ref[...] = jnp.zeros_like(sumsq_ref)

    m = mask_ref[...].astype(jnp.float32)  # [RB, 1]
    for pp, kk, op in _emit_ops(stage, p, slab_refs, u_ref):
        om = op * m
        sums_ref[pp * k + kk, :] += jnp.sum(om, axis=0)
        sumsq_ref[pp * k + kk, :] += jnp.sum(om * op, axis=0)


def _apply_kernel(*refs, stage, p, k):
    *slab_refs, u_ref, a_ref, b_ref, w_ref, out_ref = refs
    acc = None
    for pp, kk, op in _emit_ops(stage, p, slab_refs, u_ref):
        row = pp * k + kk
        y = op * a_ref[row, :] + b_ref[row, :]
        term = w_ref[pp, kk] * jnp.maximum(y, 0.0)
        acc = term if acc is None else acc + term
    out_ref[...] = acc.astype(out_ref.dtype)


def _bwd_reduce_kernel(*refs, stage, p, k):
    (*slab_refs, u_ref, g_ref, a_ref, b_ref, mu_ref, inv_ref, w_ref,
     s1_ref, s2_ref, rs_ref) = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)
        rs_ref[...] = jnp.zeros_like(rs_ref)

    g = g_ref[...].astype(jnp.float32)
    for pp, kk, op in _emit_ops(stage, p, slab_refs, u_ref):
        row = pp * k + kk
        y = op * a_ref[row, :] + b_ref[row, :]
        relu_mask = jnp.where(y > 0.0, 1.0, 0.0)
        dy = w_ref[pp, kk] * g * relu_mask
        xhat = (op - mu_ref[row, :]) * inv_ref[row, :]
        s1_ref[row, :] += jnp.sum(dy, axis=0)
        s2_ref[row, :] += jnp.sum(dy * xhat, axis=0)
        rs_ref[row, :] += jnp.sum(g * jnp.maximum(y, 0.0), axis=0)


def _bwd_apply_kernel(*refs, stage, p, k, n_slabs):
    n_in = n_slabs + 1  # slabs + u (u slot always present, possibly None)
    slab_refs = refs[:n_slabs]
    u_ref = refs[n_slabs]
    g_ref, a_ref, b_ref, mu_ref, inv_ref, gi_ref, w_ref, s1n_ref, s2n_ref, mask_ref = refs[
        n_in : n_in + 10
    ]
    out_refs = refs[n_in + 10 :]
    dslab_refs = out_refs[:n_slabs]
    du_ref = out_refs[n_slabs] if len(out_refs) > n_slabs else None

    g = g_ref[...].astype(jnp.float32)
    m = mask_ref[...].astype(jnp.float32)  # [RB, 1]
    dops = {}
    for pp, kk, op in _emit_ops(stage, p, slab_refs, u_ref):
        row = pp * k + kk
        y = op * a_ref[row, :] + b_ref[row, :]
        relu_mask = jnp.where(y > 0.0, 1.0, 0.0)
        dy = w_ref[pp, kk] * g * relu_mask
        xhat = (op - mu_ref[row, :]) * inv_ref[row, :]
        dops[(pp, kk)] = gi_ref[row, :] * (
            dy - m * (s1n_ref[row, :] + xhat * s2n_ref[row, :])
        )

    if stage == "zero":
        src = slab_refs[0][...].astype(jnp.float32)
        hr = slab_refs[1][...].astype(jnp.float32)
        d0, d1, d2 = dops[(0, 0)], dops[(0, 1)], dops[(0, 2)]
        dslab_refs[0][...] = (d0 * hr + d1 + d2).astype(dslab_refs[0].dtype)
        dslab_refs[1][...] = (d0 * src - d1 + d2).astype(dslab_refs[1].dtype)
    elif stage == "first":
        for pp in range(p):
            psds = slab_refs[1][pp].astype(jnp.float32)
            zd = slab_refs[2][pp].astype(jnp.float32)
            u = u_ref[pp].astype(jnp.float32)
            sd, su = _sig(zd), _sig(u)
            d_id, d_dense, d_sparse, d_comp = (
                dops[(pp, 0)], dops[(pp, 1)], dops[(pp, 2)], dops[(pp, 3)]
            )
            dslab_refs[0][pp] = d_id.astype(dslab_refs[0].dtype)
            dslab_refs[1][pp] = (d_dense * sd + d_sparse * su).astype(
                dslab_refs[1].dtype
            )
            dslab_refs[2][pp] = (d_dense * psds * sd * (1.0 - sd)).astype(
                dslab_refs[2].dtype
            )
            dslab_refs[3][pp] = d_comp.astype(dslab_refs[3].dtype)
            du_ref[pp] = jnp.sum(
                d_sparse * psds * su * (1.0 - su), axis=1, keepdims=True
            ).astype(du_ref.dtype)
    elif stage == "last":
        for pp in range(p):
            pairs = slab_refs[0][pp].astype(jnp.float32)
            zd = slab_refs[1][pp].astype(jnp.float32)
            u = u_ref[pp].astype(jnp.float32)
            sd, su = _sig(zd), _sig(u)
            d_id, d_dense, d_sparse = dops[(pp, 0)], dops[(pp, 1)], dops[(pp, 2)]
            dslab_refs[0][pp] = (d_id + d_dense * sd + d_sparse * su).astype(
                dslab_refs[0].dtype
            )
            dslab_refs[1][pp] = (d_dense * pairs * sd * (1.0 - sd)).astype(
                dslab_refs[1].dtype
            )
            du_ref[pp] = jnp.sum(
                d_sparse * pairs * su * (1.0 - su), axis=1, keepdims=True
            ).astype(du_ref.dtype)
    else:  # pre
        for kk in range(len(slab_refs)):
            dslab_refs[kk][...] = dops[(0, kk)].astype(dslab_refs[kk].dtype)


# ---------------------------------------------------------------------------
# pallas_call drivers
# ---------------------------------------------------------------------------

_RB = 512
_VMEM_BUDGET = 7 * 1024 * 1024  # stay well under Mosaic's 16M scoped limit


def _auto_rb(stage, slabs, n_io_slabs, has_u_io, extra_rows_d=0):
    """Largest row-block size whose double-buffered VMEM footprint fits.

    ``n_io_slabs``: number of [*, R, D] blocks moved per grid step
    (inputs + outputs). ``has_u_io``: count of [*, R, 1] blocks (their
    lane dim pads to 128 in VMEM). ``extra_rows_d``: extra [R, D] blocks
    (g / out). The [R, 1] mask block is always counted.
    """
    p = 1 if stage in ("zero", "pre") else slabs[0].shape[0]
    d_eff = _round_up(slabs[0].shape[-1], 128)
    per_row = (
        n_io_slabs * (p if stage not in ("zero", "pre") else 1) * d_eff * 4
        + has_u_io * p * 128 * 4
        + extra_rows_d * d_eff * 4
        + 128 * 4
    )
    rb = _RB
    while rb > 64 and 2 * rb * per_row > _VMEM_BUDGET:
        rb //= 2
    return rb


def _row_count(stage, slabs):
    return slabs[0].shape[0] if stage == "zero" or stage == "pre" else slabs[0].shape[1]


def _pad_rows(stage, arrs, r, rb):
    """Pad the row dim of every tensor to a multiple of rb.

    Row-axis convention: 3D tensors are [p, R, ...] (row axis 1); 2D
    tensors are [R, ...] (row axis 0) — this holds across all stages
    (mask/g are always [R, .] even when slabs carry a leading p).
    """
    r_pad = _round_up(max(r, rb), rb)
    if r_pad == r:
        return arrs, r_pad
    pad = r_pad - r

    def _p(x):
        if x is None:
            return None
        axis = 1 if x.ndim == 3 else 0
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, pad)
        return jnp.pad(x, cfg)

    return [_p(x) for x in arrs], r_pad


def _slab_spec(stage, shape, rb):
    if stage in ("zero", "pre"):  # [R, D]
        return pl.BlockSpec((rb, shape[-1]), lambda i: (i, 0))
    p = shape[0]  # [p, R, D]
    return pl.BlockSpec((p, rb, shape[-1]), lambda i: (0, i, 0))


def _col_spec(stage, shape, rb):
    if stage in ("zero", "pre"):  # [R, 1]
        return pl.BlockSpec((rb, 1), lambda i: (i, 0))
    p = shape[0]
    return pl.BlockSpec((p, rb, 1), lambda i: (0, i, 0))


def _full_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd)


def _smem_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.SMEM)


def bn_mix_stats(stage, slabs, u, mask, interpret=False, rb=None):
    """Masked per-(p,op) sums and sums-of-squares -> ([pK, D], [pK, D])."""
    if rb is None:
        rb = _auto_rb(stage, slabs, len(slabs), 1 if u is not None else 0)
    p = 1 if stage in ("zero", "pre") else slabs[0].shape[0]
    k = _stage_k(stage, len(slabs))
    d = slabs[0].shape[-1]
    r = _row_count(stage, slabs)
    arrs, r_pad = _pad_rows(stage, list(slabs) + [u, mask], r, rb)
    *slabs_p, u_p, mask_p = arrs
    inputs = list(slabs_p) + ([u_p] if u is not None else []) + [mask_p]
    in_specs = [_slab_spec(stage, x.shape, rb) for x in slabs_p]
    if u is not None:
        in_specs.append(_col_spec(stage, u_p.shape, rb))
    in_specs.append(_col_spec("zero", mask_p.shape, rb))

    def kernel(*refs):
        if u is None:
            *s_refs, m_ref, sums_ref, sumsq_ref = refs
            _stats_kernel(*s_refs, None, m_ref, sums_ref, sumsq_ref,
                          stage=stage, p=p, k=k)
        else:
            _stats_kernel(*refs, stage=stage, p=p, k=k)

    from mr_gnas_tpu.kernels.common import out_struct

    shp = out_struct((p * k, d), jnp.float32, *inputs)
    sums, sumsq = pl.pallas_call(
        kernel,
        out_shape=(shp, shp),
        grid=(r_pad // rb,),
        in_specs=in_specs,
        out_specs=(_full_spec((p * k, d)), _full_spec((p * k, d))),
        interpret=interpret,
    )(*inputs)
    return sums, sumsq


def bn_mix_apply(stage, slabs, u, a, b, w, out_dtype, interpret=False, rb=None):
    """out[R, D] = sum_{p,k} w[p,k] * relu(op * a + b)."""
    if rb is None:
        rb = _auto_rb(stage, slabs, len(slabs), 1 if u is not None else 0, 1)
    p = 1 if stage in ("zero", "pre") else slabs[0].shape[0]
    k = _stage_k(stage, len(slabs))
    d = slabs[0].shape[-1]
    r = _row_count(stage, slabs)
    arrs, r_pad = _pad_rows(stage, list(slabs) + [u], r, rb)
    *slabs_p, u_p = arrs
    inputs = list(slabs_p) + ([u_p] if u is not None else []) + [a, b, w]
    in_specs = [_slab_spec(stage, x.shape, rb) for x in slabs_p]
    if u is not None:
        in_specs.append(_col_spec(stage, u_p.shape, rb))
    in_specs += [_full_spec(a.shape), _full_spec(b.shape), _smem_spec(w.shape)]

    def kernel(*refs):
        if u is None:
            *s_refs, a_ref, b_ref, w_ref, out_ref = refs
            _apply_kernel(*s_refs, None, a_ref, b_ref, w_ref, out_ref,
                          stage=stage, p=p, k=k)
        else:
            _apply_kernel(*refs, stage=stage, p=p, k=k)

    from mr_gnas_tpu.kernels.common import out_struct

    out = pl.pallas_call(
        kernel,
        out_shape=out_struct((r_pad, d), out_dtype, *inputs),
        grid=(r_pad // rb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, d), lambda i: (i, 0)),
        interpret=interpret,
    )(*inputs)
    return out[:r]


def bn_mix_bwd_reduce(stage, slabs, u, g, a, b, mu, inv, w, interpret=False, rb=None):
    """(S1, S2, RS) each [pK, D]: sum dy / sum dy*xhat / sum g*relu(y)."""
    if rb is None:
        rb = _auto_rb(stage, slabs, len(slabs), 1 if u is not None else 0, 1)
    p = 1 if stage in ("zero", "pre") else slabs[0].shape[0]
    k = _stage_k(stage, len(slabs))
    d = slabs[0].shape[-1]
    r = _row_count(stage, slabs)
    arrs, r_pad = _pad_rows(stage, list(slabs) + [u, g], r, rb)
    *slabs_p, u_p, g_p = arrs
    inputs = list(slabs_p) + ([u_p] if u is not None else []) + [g_p, a, b, mu, inv, w]
    in_specs = [_slab_spec(stage, x.shape, rb) for x in slabs_p]
    if u is not None:
        in_specs.append(_col_spec(stage, u_p.shape, rb))
    in_specs += [
        pl.BlockSpec((rb, d), lambda i: (i, 0)),
        _full_spec(a.shape), _full_spec(b.shape),
        _full_spec(mu.shape), _full_spec(inv.shape), _smem_spec(w.shape),
    ]

    def kernel(*refs):
        if u is None:
            (*s_refs, g_ref, a_ref, b_ref, mu_ref, inv_ref, w_ref,
             s1_ref, s2_ref, rs_ref) = refs
            _bwd_reduce_kernel(
                *s_refs, None, g_ref, a_ref, b_ref, mu_ref, inv_ref, w_ref,
                s1_ref, s2_ref, rs_ref, stage=stage, p=p, k=k,
            )
        else:
            _bwd_reduce_kernel(*refs, stage=stage, p=p, k=k)

    from mr_gnas_tpu.kernels.common import out_struct

    shp = out_struct((p * k, d), jnp.float32, *inputs)
    s1, s2, rs = pl.pallas_call(
        kernel,
        out_shape=(shp, shp, shp),
        grid=(r_pad // rb,),
        in_specs=in_specs,
        out_specs=(_full_spec((p * k, d)),) * 3,
        interpret=interpret,
    )(*inputs)
    return s1, s2, rs


def bn_mix_bwd_apply(
    stage, slabs, u, g, a, b, mu, inv, gi, w, s1n, s2n, mask,
    interpret=False, rb=None,
):
    """Input cotangents: (dslabs..., du)."""
    if rb is None:
        rb = _auto_rb(stage, slabs, 2 * len(slabs), 2 if u is not None else 0, 1)
    p = 1 if stage in ("zero", "pre") else slabs[0].shape[0]
    k = _stage_k(stage, len(slabs))
    d = slabs[0].shape[-1]
    r = _row_count(stage, slabs)
    n_slabs = len(slabs)
    arrs, r_pad = _pad_rows(stage, list(slabs) + [u, g, mask], r, rb)
    *slabs_p, u_p, g_p, mask_p = arrs
    inputs = (
        list(slabs_p)
        + ([u_p] if u is not None else [])
        + [g_p, a, b, mu, inv, gi, w, s1n, s2n, mask_p]
    )
    in_specs = [_slab_spec(stage, x.shape, rb) for x in slabs_p]
    if u is not None:
        in_specs.append(_col_spec(stage, u_p.shape, rb))
    in_specs += [
        pl.BlockSpec((rb, d), lambda i: (i, 0)),
        _full_spec(a.shape), _full_spec(b.shape), _full_spec(mu.shape),
        _full_spec(inv.shape), _full_spec(gi.shape), _smem_spec(w.shape),
        _full_spec(s1n.shape), _full_spec(s2n.shape),
        _col_spec("zero", mask_p.shape, rb),
    ]

    # cotangent outputs: every slab + u (when present); dzc for 'first'
    # uses slab dtype; du uses u dtype
    from mr_gnas_tpu.kernels.common import out_struct

    out_shapes = [
        out_struct(x.shape, x.dtype, *inputs) for x in slabs_p
    ]
    out_specs = [_slab_spec(stage, x.shape, rb) for x in slabs_p]
    if u is not None:
        out_shapes.append(out_struct(u_p.shape, u_p.dtype, *inputs))
        out_specs.append(_col_spec(stage, u_p.shape, rb))

    def kernel(*refs):
        n_in = n_slabs + (1 if u is not None else 0) + 10
        ins, outs = refs[:n_in], refs[n_in:]
        if u is None:
            s_refs = ins[:n_slabs]
            rest = ins[n_slabs:]
            _bwd_apply_kernel(
                *s_refs, None, *rest, *outs, None,
                stage=stage, p=p, k=k, n_slabs=n_slabs,
            )
        else:
            _bwd_apply_kernel(*ins, *outs, stage=stage, p=p, k=k, n_slabs=n_slabs)

    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=(r_pad // rb,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*inputs)
    outs = outs if isinstance(outs, (tuple, list)) else (outs,)

    def _unpad(x, axis):
        if x.shape[axis] == r:
            return x
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, r)
        return x[tuple(sl)]

    axis = 0 if stage in ("zero", "pre") else 1
    dslabs = tuple(_unpad(x, axis) for x in outs[:n_slabs])
    du = _unpad(outs[n_slabs], axis) if u is not None else None
    return dslabs, du


# ---------------------------------------------------------------------------
# the differentiable composite
# ---------------------------------------------------------------------------


def _zero_cot(x):
    if x is None:
        return None
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


def _psum_if(x, axis):
    return jax.lax.psum(x, axis) if axis is not None else x


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def bn_mix(stage, interpret, out_dtype, axis, slabs, u, gamma, beta, w, mask, cnt):
    """Training-mode BN-mix over a stage's candidate ops.

    Args:
      stage: 'zero' | 'first' | 'last' | 'pre' (static).
      axis: mesh axis name when the rows are sharded (dist/spmd.py, None
        otherwise): the per-shard stat sums (fwd) and the BN-backward
        S1/S2/dw reductions psum over it, so the sharded megakernel
        computes the exact single-device batch norm and its exact
        gradient. ``cnt`` must then be the GLOBAL masked row count and
        the returned gamma/beta/w cotangents come out psum'd (invariant),
        as the vma checker requires for replicated params.
      slabs: tuple of op-precursor tensors (see module docstring).
      u: [p, R, 1] sparse-gate pre-activation or None.
      gamma/beta: [pK, D] BN affine (the (pair, op)-stacked slices).
      w: [p, K] softmaxed alpha weights.
      mask: [R, 1] f32 row mask (stats rows).
      cnt: [] f32 masked row count (>= 1; global under ``axis``).

    Returns (out [R, D] (out_dtype), mean [pK, D] f32, var_biased [pK, D] f32).
    The mean/var outputs feed the running-stat side channel and are
    treated as stop_gradient (their cotangents are ignored — flax
    batch_stats are non-differentiable state).
    """
    sums, sumsq = bn_mix_stats(stage, slabs, u, mask, interpret)
    sums, sumsq = _psum_if(sums, axis), _psum_if(sumsq, axis)
    mean = sums / cnt
    var = jnp.maximum(sumsq / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + _EPS)
    a = inv * gamma
    b = beta - mean * a
    out = bn_mix_apply(stage, slabs, u, a, b, w, out_dtype, interpret)
    return out, mean, var


def _bn_mix_fwd(stage, interpret, out_dtype, axis, slabs, u, gamma, beta, w, mask, cnt):
    sums, sumsq = bn_mix_stats(stage, slabs, u, mask, interpret)
    sums, sumsq = _psum_if(sums, axis), _psum_if(sumsq, axis)
    mean = sums / cnt
    var = jnp.maximum(sumsq / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + _EPS)
    a = inv * gamma
    b = beta - mean * a
    out = bn_mix_apply(stage, slabs, u, a, b, w, out_dtype, interpret)
    return (out, mean, var), (slabs, u, gamma, a, b, mean, inv, w, mask, cnt)


def _bn_mix_bwd(stage, interpret, out_dtype, axis, res, cots):
    g, _g_mean, _g_var = cots  # stat cotangents ignored (side channel)
    slabs, u, gamma, a, b, mean, inv, w, mask, cnt = res
    s1, s2, rs = bn_mix_bwd_reduce(
        stage, slabs, u, g, a, b, mean, inv, w, interpret
    )
    # global BN-backward reductions; the explicit psums also make the
    # replicated-param cotangents provably invariant under shard_map
    s1, s2 = _psum_if(s1, axis), _psum_if(s2, axis)
    p, k = w.shape
    dgamma = s2
    dbeta = s1
    dw = _psum_if(jnp.sum(rs.reshape(p, k, -1), axis=-1), axis)
    gi = gamma * inv
    dslabs, du = bn_mix_bwd_apply(
        stage, slabs, u, g, a, b, mean, inv, gi, w, s1 / cnt, s2 / cnt, mask,
        interpret,
    )
    # dcnt / dmask: stats-path cotangents for graph constants — zero by
    # contract (mask/cnt come from the static graph, never trained)
    return (dslabs, du, dgamma, dbeta, dw, _zero_cot(mask), _zero_cot(cnt))


bn_mix.defvjp(_bn_mix_fwd, _bn_mix_bwd)
