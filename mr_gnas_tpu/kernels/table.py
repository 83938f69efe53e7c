"""Small-table row gather whose backward runs on the MXU.

``jnp.take(table, idx, axis=0)`` differentiates to an XLA scatter-add of
the cotangent rows into the table — measured at 0.5-2 ms/step for the
relation tables (NOTES.md round-2 roofline: "rel-emb grad 0.48 ms,
45k -> 475 rows"; reference sites: the per-edge relation embedding
gather model_search_lp.py:140 and the triplet-score relation gather
model_search_lp.py:171). For a table of a few hundred rows the same
contraction is a one-hot matmul ``one_hot(idx, n).T @ g`` — an
[n, R] x [R, D] MXU contraction at ~10 GFLOP, i.e. tens of
microseconds instead of a serialized scatter.

The Pallas kernel never materializes the [R, n] one-hot in HBM: each
grid step builds a [n_pad, RB] one-hot block in VMEM from an iota
comparison and accumulates ``one_hot @ g_chunk`` into the [n_pad, D]
output block (same revisited-output pattern as pallas_segment).

Semantics are EXACTLY ``jnp.take``'s VJP (whatever idx contains, each
cotangent row lands on table row idx[r]), so this is a drop-in: no
masking contract is imposed on callers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _onehot_grad_kernel(idx_ref, g_ref, out_ref, *, n_pad, rb):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    idx = idx_ref[0, 0, :]  # [rb] (sublane-replicated delivery)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, rb), 0)
    one_hot = jnp.where(rows == idx[None, :], 1.0, 0.0)
    out_ref[...] += jax.lax.dot_general(
        one_hot,
        g_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _onehot_table_grad(g, idx, n_rows: int, interpret: bool, rb: int = 512):
    """[R, D] cotangent rows + [R] int32 idx -> [n_rows, D] summed rows."""
    r, d = g.shape
    n_pad = _round_up(max(n_rows, 8), 128)
    r_pad = _round_up(max(r, rb), rb)
    gf = g.astype(jnp.float32)
    if r_pad != r:
        gf = jnp.pad(gf, ((0, r_pad - r), (0, 0)))
        # out-of-range idx rows match no iota row -> contribute nothing
        idx = jnp.pad(idx, (0, r_pad - r), constant_values=n_pad)
    n_chunks = r_pad // rb
    idx3d = jnp.broadcast_to(
        idx.reshape(n_chunks, 1, rb), (n_chunks, 8, rb)
    ).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, rb), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, d), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((n_pad, d), lambda i: (0, 0)),
    )
    from mr_gnas_tpu.kernels.common import out_struct

    out = pl.pallas_call(
        functools.partial(_onehot_grad_kernel, n_pad=n_pad, rb=rb),
        # vma inherited from the inputs so the kernel traces inside
        # shard_map (check_vma) as well as standalone
        out_shape=out_struct((n_pad, d), jnp.float32, idx3d, gf),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx3d, gf)
    return out[:n_rows].astype(g.dtype)


def _interpret_default() -> bool:
    from mr_gnas_tpu.kernels.common import pallas_interpret_default

    return pallas_interpret_default()


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _take_mxu(interpret: bool, n_rows: int, table, idx):
    return jnp.take(table, idx, axis=0, mode="clip")


def _take_mxu_fwd(interpret, n_rows, table, idx):
    return jnp.take(table, idx, axis=0, mode="clip"), idx


def _take_mxu_bwd(interpret, n_rows, idx, g):
    dtable = _onehot_table_grad(
        g.reshape(-1, g.shape[-1]), idx.reshape(-1), n_rows, interpret
    )
    return (dtable, np.zeros(idx.shape, jax.dtypes.float0))


_take_mxu.defvjp(_take_mxu_fwd, _take_mxu_bwd)


def take_small_table(table, idx, interpret: bool | None = None):
    """``jnp.take(table, idx, axis=0)`` with an MXU one-hot backward.

    Intended for tables of O(hundreds) of rows (relation tables:
    2*num_rels+1 rows). Off-TPU (and when ``interpret`` is None) it
    falls back to plain ``jnp.take`` — the function computed is
    identical either way. Not differentiable w.r.t. ``idx`` (ints).
    """
    if interpret is None:
        if _interpret_default():
            return jnp.take(table, idx, axis=0, mode="clip")
        interpret = False
    from mr_gnas_tpu.kernels.common import match_vma

    # under shard_map: pvary a replicated table so its cotangent psums
    # back to replicated through the pvary transpose (common.match_vma)
    table = match_vma(table, idx)
    return _take_mxu(bool(interpret), table.shape[0], table, idx)
