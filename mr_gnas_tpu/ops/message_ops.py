"""The message-passing operation search space, as flax modules.

Re-designs the reference's op library (models/operations.py and
models/operations_lp.py) as pure-functional TPU ops over the padded
edge-row layout of :class:`~mr_gnas_tpu.graph.container.RelGraph`:

  * composition ops ``pre_{mult,sub,add,corr}`` — CompGCN-style
    phi(h_src, h_rel) per edge row (operations.py:55-79);
  * feature filters ``f_*`` — vector/scalar gates, optionally
    direction-typed over the [fwd | inv | self] row sections
    (operations_lp.py:266-416);
  * aggregators ``a_{max,mean,sum,std}`` — the edge->node segment
    reductions (operations.py:109-190, operations_lp.py:223-264), built on
    the kernels in :mod:`mr_gnas_tpu.kernels`.

All ops share one call signature ``op(graph, h, h_in, training)`` where
``h``/``h_in`` are [rows, D]. NC aggregators return [n_nodes, D]; the LP
variants additionally add the self-loop rows as a residual
(operations_lp.py:234).

Weight init matches the reference's ``weights_init`` (utils/utils.py:121-126):
xavier-normal kernels, zero biases.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_gnas_tpu.graph.container import EdgeGraph, RelGraph
from mr_gnas_tpu.kernels import segment_max, segment_mean, segment_std, segment_sum

xavier = nn.initializers.glorot_normal()


def dense(features: int, use_bias: bool = True, name: str | None = None) -> nn.Dense:
    """nn.Dense with the reference's init (xavier-normal W, zero b)."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=xavier,
        bias_init=nn.initializers.zeros_init(),
        name=name,
    )


# ---------------------------------------------------------------------------
# composition ops (zero cell): phi(h_src, h_rel) per edge row
# ---------------------------------------------------------------------------


class PreMult(nn.Module):
    """h * hr (operations.py:55-61)."""

    def __call__(self, graph: Any, h: jax.Array, hr: jax.Array, training: bool = False):
        return h * hr


class PreSub(nn.Module):
    """h - hr (operations.py:64-70)."""

    def __call__(self, graph: Any, h: jax.Array, hr: jax.Array, training: bool = False):
        return h - hr


class PreAdd(nn.Module):
    """h + hr (operations.py:73-79)."""

    def __call__(self, graph: Any, h: jax.Array, hr: jax.Array, training: bool = False):
        return h + hr


class PreCorr(nn.Module):
    """Circular correlation ccorr(h, hr) via rFFT.

    The reference's version (operations.py:34-53) targets the removed
    ``torch.rfft`` API and is dead in practice; here it is a live op using
    ``jnp.fft``: irfft(conj(rfft(a)) * rfft(b)).
    """

    def __call__(self, graph: Any, h: jax.Array, hr: jax.Array, training: bool = False):
        d = h.shape[-1]
        fa = jnp.fft.rfft(h, axis=-1)
        fb = jnp.fft.rfft(hr, axis=-1)
        return jnp.fft.irfft(jnp.conj(fa) * fb, n=d, axis=-1)


# ---------------------------------------------------------------------------
# feature filters
# ---------------------------------------------------------------------------


class FZero(nn.Module):
    """0 * h (operations.py:96-102) — the DARTS `none` analog."""

    def __call__(self, graph: Any, h: jax.Array, h_in: jax.Array, training: bool = False):
        return jnp.zeros_like(h)


class FIdentity(nn.Module):
    """h (operations.py:87-93) — the DARTS `skip` analog."""

    def __call__(self, graph: Any, h: jax.Array, h_in: jax.Array, training: bool = False):
        return h


class FDense(nn.Module):
    """sigmoid(W [h; h_in]) * h, W: 2d->d (operations.py:193-202)."""

    feature_dim: int

    @nn.compact
    def __call__(self, graph: Any, h: jax.Array, h_in: jax.Array, training: bool = False):
        gates = dense(self.feature_dim)(jnp.concatenate([h, h_in], axis=-1))
        return jax.nn.sigmoid(gates) * h


class FSparse(nn.Module):
    """sigmoid(a(W [h; h_in])) * h — scalar gate (operations.py:205-216)."""

    feature_dim: int

    @nn.compact
    def __call__(self, graph: Any, h: jax.Array, h_in: jax.Array, training: bool = False):
        gates = dense(self.feature_dim, name="W")(jnp.concatenate([h, h_in], axis=-1))
        gates = dense(1, use_bias=False, name="a")(gates)
        return jax.nn.sigmoid(gates) * h


class FDenseLast(nn.Module):
    """sigmoid(W h) * h — gate on h alone (operations.py:219-228)."""

    feature_dim: int

    @nn.compact
    def __call__(self, graph: Any, h: jax.Array, h_in: jax.Array, training: bool = False):
        gates = dense(self.feature_dim)(h)
        return jax.nn.sigmoid(gates) * h


class FSparseLast(nn.Module):
    """sigmoid(a(W h)) * h (operations.py:231-242)."""

    feature_dim: int

    @nn.compact
    def __call__(self, graph: Any, h: jax.Array, h_in: jax.Array, training: bool = False):
        gates = dense(self.feature_dim, name="W")(h)
        gates = dense(1, use_bias=False, name="a")(gates)
        return jax.nn.sigmoid(gates) * h


# ---------------------------------------------------------------------------
# direction-typed (CompGCN-style) filters over the [fwd | inv | self] layout
# ---------------------------------------------------------------------------


def _split_rows(graph: RelGraph, x: jax.Array):
    """Static slices of the [fwd | inv | self] sections (§2.8 layout)."""
    nf, ne = graph.n_fwd, graph.n_edge_rows
    return x[:nf], x[nf:ne], x[ne:]


class FComp(nn.Module):
    """Direction-typed transform W_{in,out,self} [h; h_in] (LP only).

    1/3 scaling + edge norm on the in/out sections, *unscaled* self section
    — faithfully mirroring operations_lp.py:266-288 (where m_self is not
    multiplied by 1/3, unlike the gated variants).
    """

    feature_dim: int

    @nn.compact
    def __call__(self, graph: RelGraph, h: jax.Array, h_in: jax.Array, training: bool = False):
        hi, ho, hs = _split_rows(graph, h)
        gi, go, gs = _split_rows(graph, h_in)
        m_in = dense(self.feature_dim, use_bias=False, name="W_in")(
            jnp.concatenate([hi, gi], axis=-1)
        )
        m_out = dense(self.feature_dim, use_bias=False, name="W_out")(
            jnp.concatenate([ho, go], axis=-1)
        )
        m_self = dense(self.feature_dim, use_bias=False, name="W_self")(
            jnp.concatenate([hs, gs], axis=-1)
        )
        norm_e = graph.norm[: graph.n_edge_rows, None]
        m_in_out = jnp.concatenate([m_in / 3.0, m_out / 3.0], axis=0) * norm_e
        return jnp.concatenate([m_in_out, m_self], axis=0)


class _FGateComp(nn.Module):
    """Shared body of the direction-typed gated filters.

    scalar_gate=True  -> f_sparse_comp (operations_lp.py:304-343)
    scalar_gate=False -> f_dense_comp  (operations_lp.py:356-390)
    All three sections are scaled by 1/3; in/out additionally by the edge
    norm.
    """

    feature_dim: int
    scalar_gate: bool

    @nn.compact
    def __call__(self, graph: RelGraph, h: jax.Array, h_in: jax.Array, training: bool = False):
        hi, ho, hs = _split_rows(graph, h)
        gi, go, gs = _split_rows(graph, h_in)

        def gate(x, g, tag):
            z = dense(self.feature_dim, name=f"W_{tag}")(
                jnp.concatenate([x, g], axis=-1)
            )
            if self.scalar_gate:
                z = dense(1, use_bias=False, name=f"a_{tag}")(z)
            return jax.nn.sigmoid(z) * x

        out_in = gate(hi, gi, "in")
        out_o = gate(ho, go, "out")
        out_self = gate(hs, gs, "self")
        norm_e = graph.norm[: graph.n_edge_rows, None]
        m_in_out = jnp.concatenate([out_in / 3.0, out_o / 3.0], axis=0) * norm_e
        return jnp.concatenate([m_in_out, out_self / 3.0], axis=0)


class FSparseComp(nn.Module):
    """Direction-typed scalar-gated filter — the op in the published best
    genotype (reference README.md:26)."""

    feature_dim: int

    @nn.compact
    def __call__(self, graph, h, h_in, training: bool = False):
        return _FGateComp(self.feature_dim, scalar_gate=True, name="g")(
            graph, h, h_in, training
        )


class FDenseComp(nn.Module):
    """Direction-typed vector-gated filter."""

    feature_dim: int

    @nn.compact
    def __call__(self, graph, h, h_in, training: bool = False):
        return _FGateComp(self.feature_dim, scalar_gate=False, name="g")(
            graph, h, h_in, training
        )


# ---------------------------------------------------------------------------
# aggregators: edge-space -> node-space segment reductions
# ---------------------------------------------------------------------------


def _nc_reduce(graph: EdgeGraph, msg: jax.Array, op: str) -> jax.Array:
    """NC edge->dst segment reduce, sharded-local aware.

    Under ``graph.spmd_axis`` (dist/spmd.py) the local edge shard
    reduces into [N_glob, D] partials merged across the axis
    (reduce-scatter sums / all-to-all max — exact for the relu'd >= 0
    max messages), returning this device's dst-node block."""
    n_agg = graph.agg_nodes
    spmd = graph.spmd_axis is not None
    if not spmd:
        fn = {"sum": segment_sum, "max": segment_max, "mean": segment_mean,
              "std": segment_std}[op]
        return fn(msg, graph.dst, n_agg, graph.edge_mask)
    from mr_gnas_tpu.dist.spmd import (
        max_merge_nodes,
        scatter_sum_nodes,
        scatter_sum_vec,
    )
    from mr_gnas_tpu.kernels.segment import segment_count

    ax = graph.spmd_axis
    n_dev = graph.n_nodes_global // graph.n_nodes
    if op == "max":
        return max_merge_nodes(
            ax, n_dev, segment_max(msg, graph.dst, n_agg, graph.edge_mask)
        )
    if op == "sum":
        return scatter_sum_nodes(
            segment_sum(msg, graph.dst, n_agg, graph.edge_mask), ax
        )
    cnt = scatter_sum_vec(segment_count(graph.dst, n_agg, graph.edge_mask), ax)
    if op == "mean":
        s = scatter_sum_nodes(segment_sum(msg, graph.dst, n_agg, graph.edge_mask), ax)
        return jnp.where(cnt[:, None] > 0, s / jnp.maximum(cnt[:, None], 1.0), 0.0)
    # std: sqrt(relu(E[x^2] - E[x]^2) + eps), merged moments (EPS matches
    # segment_std's)
    d = msg.shape[-1]
    s = scatter_sum_nodes(
        segment_sum(jnp.concatenate([msg, msg * msg], axis=-1),
                    graph.dst, n_agg, graph.edge_mask),
        ax,
    )
    denom = jnp.maximum(cnt[:, None], 1.0)
    mean = jnp.where(cnt[:, None] > 0, s[:, :d] / denom, 0.0)
    mean_sq = jnp.where(cnt[:, None] > 0, s[:, d:] / denom, 0.0)
    return jnp.sqrt(jax.nn.relu(mean_sq - mean * mean) + 1e-5)


class AMaxNC(nn.Module):
    """relu(Linear(msg)) -> segment-max to dst (operations.py:109-121)."""

    feature_dim: int

    @nn.compact
    def __call__(self, graph: EdgeGraph, h: jax.Array, h_in: jax.Array, training: bool = False):
        msg = jax.nn.relu(dense(self.feature_dim)(h))
        return _nc_reduce(graph, msg, "max")


class AMeanNC(nn.Module):
    """relu(Linear(msg)) -> segment-mean to dst (operations.py:128-145)."""

    feature_dim: int

    @nn.compact
    def __call__(self, graph: EdgeGraph, h: jax.Array, h_in: jax.Array, training: bool = False):
        msg = jax.nn.relu(dense(self.feature_dim)(h))
        return _nc_reduce(graph, msg, "mean")


class ASumNC(nn.Module):
    """segment-sum to dst, no transform (operations.py:152-164)."""

    @nn.compact
    def __call__(self, graph: EdgeGraph, h: jax.Array, h_in: jax.Array, training: bool = False):
        return _nc_reduce(graph, h, "sum")


class AStdNC(nn.Module):
    """sqrt(var + eps) segment reduce (operations.py:178-190; not searched)."""

    @nn.compact
    def __call__(self, graph: EdgeGraph, h: jax.Array, h_in: jax.Array, training: bool = False):
        return _nc_reduce(graph, h, "std")


class _ALPBase(nn.Module):
    """LP aggregators reduce the E edge rows and add the self rows
    (rows E..E+N) as a per-node residual (operations_lp.py:230-235)."""

    def _edges_and_self(self, graph: RelGraph, h: jax.Array):
        ne = graph.n_edge_rows
        return h[:ne], h[ne:]

    def _reduce(self, graph: RelGraph, msg: jax.Array, op: str) -> jax.Array:
        """Edge->node segment reduce; routes through the Pallas CSR
        kernels when the graph carries a CSRMeta (graph/build.attach_csr),
        else the XLA scatter baselines.

        Sharded-local graphs (``graph.spmd_axis``, dist/spmd.py) reduce
        this device's edge shard into [N_glob, D] partials and merge
        across the mesh axis — reduce-scatter for sum / mean numerator
        and counts, all-to-all for max (exact for zero-filled partials
        because every max message is relu'd >= 0) — returning this
        device's node slice [N_loc, D]."""
        ne = graph.n_edge_rows
        n_agg = graph.agg_nodes
        spmd = graph.spmd_axis is not None
        if graph.csr is not None:
            from mr_gnas_tpu.kernels.pallas_segment import (
                segment_max_csr,
                segment_mean_csr,
                segment_sum_csr,
            )

            if spmd and op == "mean":
                # cross-shard mean needs (numerator, count), not local means
                agg = segment_sum_csr(msg, graph.csr, graph.dst[:ne], graph.edge_mask)
                cnt = graph.csr.counts
            else:
                fn = {
                    "sum": segment_sum_csr,
                    "max": segment_max_csr,
                    "mean": segment_mean_csr,
                }[op]
                agg = fn(msg, graph.csr, graph.dst[:ne], graph.edge_mask)
                cnt = graph.csr.counts
        else:
            if spmd and op == "mean":
                agg = segment_sum(msg, graph.dst[:ne], n_agg, graph.edge_mask)
            else:
                fn = {"sum": segment_sum, "max": segment_max, "mean": segment_mean}[op]
                agg = fn(msg, graph.dst[:ne], n_agg, graph.edge_mask)
            cnt = None
        if not spmd:
            return agg
        from mr_gnas_tpu.kernels.segment import segment_count
        from mr_gnas_tpu.dist.spmd import (
            max_merge_nodes,
            scatter_sum_nodes,
            scatter_sum_vec,
        )

        ax = graph.spmd_axis
        n_dev = graph.n_nodes_global // graph.n_nodes
        if op == "max":
            return max_merge_nodes(ax, n_dev, agg)
        if op == "sum":
            return scatter_sum_nodes(agg, ax)
        # mean: merge numerator and counts, then divide locally
        if cnt is None:
            cnt = segment_count(graph.dst[:ne], n_agg, graph.edge_mask)
        num = scatter_sum_nodes(agg, ax)
        cnt = scatter_sum_vec(cnt, ax)
        return jnp.where(cnt[:, None] > 0, num / jnp.maximum(cnt[:, None], 1.0), 0.0)


class AMaxLP(_ALPBase):
    """relu(Linear(h[:E])) -> segment-max + self residual
    (operations_lp.py:223-235)."""

    feature_dim: int

    @nn.compact
    def __call__(self, graph: RelGraph, h: jax.Array, h_in: jax.Array, training: bool = False):
        he, hs = self._edges_and_self(graph, h)
        msg = jax.nn.relu(dense(self.feature_dim)(he))
        return self._reduce(graph, msg, "max") + hs


class AMeanLP(_ALPBase):
    """relu(Linear(h[:E])) -> segment-mean + self residual
    (operations_lp.py:238-250)."""

    feature_dim: int

    @nn.compact
    def __call__(self, graph: RelGraph, h: jax.Array, h_in: jax.Array, training: bool = False):
        he, hs = self._edges_and_self(graph, h)
        msg = jax.nn.relu(dense(self.feature_dim)(he))
        return self._reduce(graph, msg, "mean") + hs


class ASumLP(_ALPBase):
    """segment-sum -> dropout(drop_aggr) + self residual
    (operations_lp.py:252-264)."""

    drop_aggr: float = 0.1

    @nn.compact
    def __call__(self, graph: RelGraph, h: jax.Array, h_in: jax.Array, training: bool = False):
        he, hs = self._edges_and_self(graph, h)
        agg = self._reduce(graph, he, "sum")
        agg = nn.Dropout(self.drop_aggr, deterministic=not training)(agg)
        return agg + hs
