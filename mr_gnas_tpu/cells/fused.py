"""Fused supernet cell: the mixed-op search space as batched einsums.

The naive :class:`~mr_gnas_tpu.cells.supernet.SupernetCell` evaluates
~44 op pipelines per cell as separate small flax modules (mirroring the
reference's structure, models/cell_lp.py:12-33). That is slow to trace
(hundreds of nested modules) and bandwidth-bound at runtime (dozens of
small kernels re-reading the same [R, D] rows).

This module computes the *same function* (parity-tested in
tests/test_fused.py via ``convert_naive_params``) with stage-level
fusion:

  * each DAG level's candidate-op gate transforms run as ONE batched
    einsum per row section, with the per-op weight matrices stacked
    column-wise ([pairs, 2D, 3D]: dense | sparse | comp blocks);
  * all (pair, op) batch-norms of a stage share stacked parameters and
    are applied as a single vectorized masked BN over a
    [pairs, ops, R, D] stack (statistics per (pair, op) slice — same
    semantics as one nn.BatchNorm1d per op);
  * the alpha-weighted op mixture + the DAG-node summation collapse into
    one einsum contraction.

Both task families are fused (:class:`FusedSupernetCellLP` and
:class:`FusedSupernetCellNC`); the naive per-module cell remains as the
parity oracle. Under sharded-local graphs (dist/spmd.py) the cells psum
their batch-norm statistics and merge middle-stage aggregation partials
across the mesh axis.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_gnas_tpu.cells.genotype import CellSpec
from mr_gnas_tpu.graph.container import RelGraph
from mr_gnas_tpu.kernels import segment_max, segment_sum
from mr_gnas_tpu.ops.message_ops import dense


def blocked_xavier(n_blocks: int):
    """Glorot-normal applied per column block, so each stacked [in, out]
    sub-matrix matches the naive per-op Dense init scale."""

    def init(key, shape, dtype=jnp.float32):
        *lead, fan_in, total_out = shape
        out = total_out // n_blocks
        std = (2.0 / (fan_in + out)) ** 0.5
        return std * jax.random.normal(key, shape, dtype)

    return init


class FusedSupernetCellLP(nn.Module):
    """Fused LP supernet cell — same function as SupernetCell(task='lp').

    Stage math (faithful to models/operations_lp.py):
      zero   : {pre_mult, pre_sub, pre_add} composition stack
      first  : {f_zero, f_identity, f_dense_comp, f_sparse_comp, f_comp}
               direction-typed over [fwd | inv | self] sections with the
               1/3 + edge-norm scaling (f_comp's self section unscaled,
               operations_lp.py:287)
      middle : {a_max, a_sum, a_mean} segment aggregators + self residual
      last   : {f_zero, f_identity, f_dense_last, f_sparse_last}
      concat : Linear over (first + last) node states (cell_lp.py:186)
    """

    spec: CellSpec
    feature_dim: int
    drop_aggr: float = 0.1
    momentum: float = 0.9
    epsilon: float = 1e-5
    compute_dtype: object = jnp.float32  # bf16 halves HBM traffic of the
    # op stacks; BN statistics stay f32
    megakernel: bool = False  # training-mode stages via the Pallas BN-mix
    # mega-kernel (kernels/bn_mix.py): no [p, K, R, D] slab ever touches
    # HBM. Eval mode and megakernel=False use the XLA slab path below.

    # ---- stage-wide BN with sliced application --------------------------

    def _bn_decl(self, name: str, lead: tuple[int, ...]):
        d = self.feature_dim
        shape = (*lead, d)
        scale = self.param(f"{name}_scale", nn.initializers.ones_init(), shape)
        bias = self.param(f"{name}_bias", nn.initializers.zeros_init(), shape)
        rm = self.variable("batch_stats", f"{name}_mean", lambda: jnp.zeros(shape, jnp.float32))
        rv = self.variable("batch_stats", f"{name}_var", lambda: jnp.ones(shape, jnp.float32))
        return (scale, bias, rm, rv)

    def _bn_apply(
        self, bn, sl, x, mask, training: bool, op_sl=slice(None), axis=None
    ):
        """x: [p, K', R, D]; sl: slice into the stage's pair dim; op_sl:
        slice into the op dim (for stacks that omit ops handled
        analytically). Statistics in f32 regardless of compute dtype.
        ``axis``: mesh axis name when rows are sharded (dist/spmd.py) —
        statistics are psum'd so the sharded program computes the exact
        single-device batch norm."""
        scale, bias, rm, rv = bn
        xf = x.astype(jnp.float32)
        if training:
            m = mask[:, None]
            # one-pass stats: sum and sumsq share the slab read (the
            # two-pass (x-mean)^2 form costs a second [p, K, R, D] HBM
            # pass; f32 accumulation keeps E[x^2]-m^2 accurate at these
            # row counts)
            xm = xf * m
            s1 = jnp.sum(xm, axis=-2)
            s2 = jnp.sum(xm * xf, axis=-2)
            cnt = jnp.sum(mask)
            if axis is not None:
                s1 = jax.lax.psum(s1, axis)
                s2 = jax.lax.psum(s2, axis)
                cnt = jax.lax.psum(cnt, axis)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                rm.value = rm.value.at[sl, op_sl].set(
                    self.momentum * rm.value[sl, op_sl] + (1 - self.momentum) * mean
                )
                rv.value = rv.value.at[sl, op_sl].set(
                    self.momentum * rv.value[sl, op_sl] + (1 - self.momentum) * unbiased
                )
        else:
            mean, var = rm.value[sl, op_sl], rv.value[sl, op_sl]
        y = (x - mean[..., None, :].astype(x.dtype)) * jax.lax.rsqrt(
            var[..., None, :] + self.epsilon
        ).astype(x.dtype)
        return (
            y * scale[sl, op_sl][..., None, :].astype(x.dtype)
            + bias[sl, op_sl][..., None, :].astype(x.dtype)
        )

    def _mix(self, bn, sl, stack, mask, w, training, axis=None):
        """BN + ReLU + alpha-mix over ops + sum over pairs -> [R, D]."""
        y = jax.nn.relu(self._bn_apply(bn, sl, stack, mask, training, axis=axis))
        return jnp.einsum("pkrd,pk->rd", y, w.astype(y.dtype))

    def _mix_const_op0(self, bn, sl, stack_rest, mask, w, training, c0, axis=None):
        """Mix where op 0's BN input is constant over rows (f_zero: the op
        output is 0, or, for NC, the post-linear bias) — computed
        analytically instead of materializing a [p, R, D] slab.

        BN of constant rows c: training -> bias (mean = c, var = 0);
        eval -> (c - rm) * rsqrt(rv + eps) * scale + bias. Running stats
        still update (mean toward c, var toward 0) for checkpoint parity.
        ``stack_rest``: [p, K-1, R, D] of the remaining ops.
        """
        scale, bias, rm, rv = bn
        y = jax.nn.relu(
            self._bn_apply(
                bn, sl, stack_rest, mask, training, op_sl=slice(1, None), axis=axis
            )
        )
        mixed = jnp.einsum("pkrd,pk->rd", y, w[:, 1:].astype(y.dtype))
        c0 = c0.astype(jnp.float32)  # [p, D]
        if training:
            out0 = jnp.broadcast_to(bias[sl, 0], c0.shape)
            if not self.is_initializing():
                rm.value = rm.value.at[sl, 0].set(
                    self.momentum * rm.value[sl, 0] + (1 - self.momentum) * c0
                )
                rv.value = rv.value.at[sl, 0].set(self.momentum * rv.value[sl, 0])
        else:
            out0 = (c0 - rm.value[sl, 0]) * jax.lax.rsqrt(
                rv.value[sl, 0] + self.epsilon
            ) * scale[sl, 0] + bias[sl, 0]
        zero_term = jnp.einsum("pd,p->d", jax.nn.relu(out0), w[:, 0])
        return mixed + zero_term[None, :].astype(mixed.dtype)

    # ---- middle-stage aggregation (shared by slab + mega paths) ---------

    def _middle_aggregates(self, graph: RelGraph, SE, SSelf, w_mid, b_mid, dst_e):
        """(agg_max, sum_raw, mean_num, cnt): the three aggregator
        reductions per first-state, each [M, N, D], self-residuals NOT
        yet applied and a_sum's dropout NOT yet applied.

        CSR graphs use the fused gather+compose+reduce kernel
        (kernels/fused_agg.py) — the pre-linear relu slabs never touch
        HBM; otherwise the composite XLA path (batched einsum + scatter
        segment ops).

        Sharded-local graphs (``graph.spmd_axis``, dist/spmd.py) reduce
        their edge shard into [M, N_glob, D] partials, then merge across
        the mesh axis — reduce-scatter for sum/mean-numerator/counts and
        an all-to-all max exchange — returning only this device's node
        slice [M, N_loc, D]. The max merge of zero-filled partials is
        exact because every aggregator pre-activation is relu'd (>= 0)
        and DGL's empty-segment fill is 0."""
        ne = graph.n_edge_rows
        edge_mask = graph.edge_mask
        n_agg = graph.agg_nodes
        d = SE.shape[-1]
        if graph.csr is not None:
            from mr_gnas_tpu.kernels.fused_agg import fused_middle_agg

            outs = [
                fused_middle_agg(
                    SE[m], w_mid[m, 0], b_mid[m, 0], w_mid[m, 1], b_mid[m, 1],
                    graph.csr, dst_e, edge_mask,
                )
                for m in range(SE.shape[0])
            ]
            agg_max = jnp.stack([o[0] for o in outs])
            sum_raw = jnp.stack([o[1] for o in outs])
            mean_num = jnp.stack([o[2] for o in outs])
            cnt = graph.csr.counts
        else:
            lin = jax.nn.relu(
                jnp.einsum(
                    "med,mkdf->mkef", SE, w_mid.astype(SE.dtype),
                    preferred_element_type=jnp.float32,
                ).astype(SE.dtype)
                + b_mid[..., None, :].astype(SE.dtype)
            )
            # padded edge rows already route to the dummy segment by the
            # RelGraph dst contract (graph/container.py:40, build.py:96), so
            # the segment ops need no [M, E, D] mask slabs — mask=None skips
            # the where/mul passes in BOTH directions (the profiled step spent
            # ~4 ms/step on them, NOTES.md roofline)
            vmax = jax.vmap(lambda x: segment_max(x, dst_e, n_agg, None))
            vsum = jax.vmap(lambda x: segment_sum(x, dst_e, n_agg, None))
            from mr_gnas_tpu.kernels.segment import segment_count

            cnt = segment_count(dst_e, n_agg, None)
            agg_max = vmax(lin[:, 0])
            # one scatter pass for a_sum's input and a_mean's numerator
            summed = vsum(jnp.concatenate([SE, lin[:, 1]], axis=-1))
            sum_raw, mean_num = summed[..., :d], summed[..., d:]
        if graph.spmd_axis is not None:
            from mr_gnas_tpu.dist.spmd import (
                max_merge_nodes,
                scatter_sum_nodes,
                scatter_sum_vec,
            )

            ax = graph.spmd_axis
            n_dev = graph.n_nodes_global // graph.n_nodes
            agg_max = max_merge_nodes(ax, n_dev, agg_max)
            merged = scatter_sum_nodes(
                jnp.concatenate([sum_raw, mean_num], axis=-1), ax
            )
            sum_raw, mean_num = merged[..., :d], merged[..., d:]
            cnt = scatter_sum_vec(cnt, ax)
        return agg_max, sum_raw, mean_num, cnt

    # ---- mega-kernel path helpers ---------------------------------------

    def _mega_update_stats(self, bn, sl, op_sl, mean, var, cnt):
        """Running-stat update from kernel-computed batch stats (same
        semantics as ``_bn_apply``'s training branch)."""
        _, _, rm, rv = bn
        if not self.is_initializing():
            unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
            rm.value = rm.value.at[sl, op_sl].set(
                self.momentum * rm.value[sl, op_sl] + (1 - self.momentum) * mean
            )
            rv.value = rv.value.at[sl, op_sl].set(
                self.momentum * rv.value[sl, op_sl] + (1 - self.momentum) * unbiased
            )

    def _mega_zero_term(self, bn, sl, w0, p_i):
        """Training-mode analytic f_zero pipeline (op 0): BN of all-zero
        rows is the bias row; running stats decay toward (0, 0). Mirrors
        ``_mix_const_op0``'s op-0 branch with c0 = 0."""
        _, bias, rm, rv = bn
        d = self.feature_dim
        out0 = jnp.broadcast_to(bias[sl, 0], (p_i, d))
        if not self.is_initializing():
            rm.value = rm.value.at[sl, 0].set(self.momentum * rm.value[sl, 0])
            rv.value = rv.value.at[sl, 0].set(self.momentum * rv.value[sl, 0])
        return jnp.einsum("pd,p->d", jax.nn.relu(out0), w0)

    def _call_mega(self, graph: RelGraph, src_emb, hr, weights, training: bool):
        """Training forward through kernels/bn_mix.py — numerically the
        same function as the slab path (stats/normalize in f32; parity
        tested in tests/test_bn_mix.py). Sharded-local graphs: the
        kernel's stat sums psum over ``axis`` (bn_mix's axis arg) and
        the row counts below are global, so the sharded megakernel ==
        the single-device one."""
        import jax as _jax

        from mr_gnas_tpu.kernels.bn_mix import bn_mix

        axis = graph.spmd_axis
        spec, d = self.spec, self.feature_dim
        p1, p2 = spec.n_first_edges, spec.n_last_edges
        m_nodes = spec.first_nodes
        nf, ne = graph.n_fwd, graph.n_edge_rows
        cdt = self.compute_dtype
        from mr_gnas_tpu.kernels.common import pallas_interpret_default

        interp = pallas_interpret_default()
        src_emb = src_emb.astype(cdt)
        hr = hr.astype(cdt)
        r_rows = src_emb.shape[0]
        n_self = r_rows - ne
        dst_e = graph.dst[:ne]

        rmask2 = graph.row_mask[:, None].astype(jnp.float32)
        nmask2 = graph.node_mask[:, None].astype(jnp.float32)
        rcnt = jnp.sum(graph.row_mask)
        ncnt = jnp.sum(graph.node_mask)
        if axis is not None:
            rcnt = jax.lax.psum(rcnt, axis)
            ncnt = jax.lax.psum(ncnt, axis)
        rcnt = jnp.maximum(rcnt, 1.0)
        ncnt = jnp.maximum(ncnt, 1.0)

        # section scale vectors ([fwd|inv] edge rows carry norm/3; the
        # self section carries 1/3 for the gated ops and 1 for f_comp —
        # operations_lp.py:287's unscaled-self quirk)
        norm_e = graph.norm[:ne].astype(cdt)
        third = jnp.full((n_self,), 1.0 / 3.0, cdt)
        s_ds = jnp.concatenate([norm_e / 3.0, third])[None, :, None]
        s_c = jnp.concatenate([norm_e / 3.0, jnp.ones((n_self,), cdt)])[None, :, None]

        # ---------------- zero stage ----------------
        bn_zero = self._bn_decl("bn_zero", (1, 3))
        scale_z, bias_z = bn_zero[0], bn_zero[1]
        w_z = weights["zero"][:1].astype(jnp.float32)
        h_in, mean, var = bn_mix(
            "zero", interp, cdt, axis, (src_emb, hr), None,
            scale_z.reshape(3, d), bias_z.reshape(3, d), w_z, rmask2, rcnt,
        )
        self._mega_update_stats(
            bn_zero, slice(0, 1), slice(None), mean.reshape(1, 3, d),
            var.reshape(1, 3, d), rcnt,
        )

        # ---------------- first stage ----------------
        w_sec = {
            s: self.param(f"first_w_{s}", blocked_xavier(3), (p1, 2 * d, 3 * d))
            for s in ("in", "out", "self")
        }
        b_sec = {
            s: self.param(f"first_b_{s}", nn.initializers.zeros_init(), (p1, 2, d))
            for s in ("in", "out", "self")
        }
        a_sec = {
            s: self.param(f"first_a_{s}", blocked_xavier(1), (p1, d, 1))
            for s in ("in", "out", "self")
        }
        bn_first = self._bn_decl("bn_first", (p1, 5))
        scale_f, bias_f = bn_first[0], bn_first[1]

        def level_precursors(pairs, sl):
            """Per-section gate matmuls -> full-row zd, zc, u. The sparse
            gate never materializes: its [D, D] transform is collapsed
            into the [D, 1] matvec W_s @ a (associativity of the linear
            gate pre-activation)."""
            zd_parts, zc_parts, u_parts = [], [], []
            for s, lo, hi in (("in", 0, nf), ("out", nf, ne), ("self", ne, r_rows)):
                w = w_sec[s][sl]  # [p, 2d, 3d]
                b = b_sec[s][sl]
                a = a_sec[s][sl]
                ps, hs = pairs[:, lo:hi], h_in[lo:hi]
                w_dc = jnp.concatenate([w[:, :, :d], w[:, :, 2 * d :]], axis=-1)
                z = jnp.einsum(
                    "prc,pck->prk", ps, w_dc[:, :d].astype(cdt),
                    preferred_element_type=jnp.float32,
                ).astype(cdt)
                z = z + jnp.einsum(
                    "rc,pck->prk", hs, w_dc[:, d:].astype(cdt),
                    preferred_element_type=jnp.float32,
                ).astype(cdt)
                zd_parts.append(z[..., :d] + b[:, 0][:, None, :].astype(cdt))
                zc_parts.append(z[..., d:])
                wa = jnp.einsum(
                    "pck,pko->pco", w[:, :, d : 2 * d], a,
                    preferred_element_type=jnp.float32,
                )
                u = jnp.einsum(
                    "prc,pco->pro", ps, wa[:, :d].astype(cdt),
                    preferred_element_type=jnp.float32,
                ).astype(cdt)
                u = u + jnp.einsum(
                    "rc,pco->pro", hs, wa[:, d:].astype(cdt),
                    preferred_element_type=jnp.float32,
                ).astype(cdt)
                u = u + jnp.einsum("pd,pdo->po", b[:, 1], a).astype(cdt)[:, None, :]
                u_parts.append(u)
            return (
                jnp.concatenate(zd_parts, axis=1),
                jnp.concatenate(zc_parts, axis=1),
                jnp.concatenate(u_parts, axis=1),
            )

        states = [h_in]
        done = 0
        for _ in range(spec.first_nodes):
            p_i = len(states)
            sl = slice(done, done + p_i)
            pairs = jnp.stack(states)
            zd, zc, u = level_precursors(pairs, sl)
            out, mean, var = bn_mix(
                "first", interp, cdt, axis,
                (pairs, pairs * s_ds, zd, zc * s_c), u,
                scale_f[sl, 1:].reshape(p_i * 4, d),
                bias_f[sl, 1:].reshape(p_i * 4, d),
                weights["first"][sl][:, 1:].astype(jnp.float32),
                rmask2, rcnt,
            )
            self._mega_update_stats(
                bn_first, sl, slice(1, None), mean.reshape(p_i, 4, d),
                var.reshape(p_i, 4, d), rcnt,
            )
            zt = self._mega_zero_term(bn_first, sl, weights["first"][sl][:, 0], p_i)
            states.append(out + zt[None, :].astype(out.dtype))
            done += p_i
        first_states = states[1:]

        # ---------------- middle stage (aggregators as in the slab path,
        # BN+ReLU+mix via the 'pre' kernel) ----------------
        w_mid = self.param("middle_w", blocked_xavier(1), (m_nodes, 2, d, d))
        b_mid = self.param("middle_b", nn.initializers.zeros_init(), (m_nodes, 2, d))
        bn_mid = self._bn_decl("bn_middle", (m_nodes, 3))
        scale_m, bias_m = bn_mid[0], bn_mid[1]
        S = jnp.stack(first_states)
        SE, SSelf = S[:, :ne], S[:, ne:]
        agg_max, sum_raw, mean_num, cnt_seg = self._middle_aggregates(
            graph, SE, SSelf, w_mid, b_mid, dst_e
        )
        agg_max = agg_max + SSelf
        sum_raw = nn.Dropout(self.drop_aggr, name="drop_sum")(
            sum_raw, deterministic=not training
        )
        agg_sum = sum_raw + SSelf
        agg_mean = (
            jnp.where(
                cnt_seg[:, None] > 0,
                mean_num / jnp.maximum(cnt_seg[:, None], 1.0).astype(mean_num.dtype),
                0.0,
            ).astype(mean_num.dtype)
            + SSelf
        )
        node_states = []
        for m in range(m_nodes):
            out_m, mean, var = bn_mix(
                "pre", interp, cdt, axis,
                (agg_max[m].astype(cdt), agg_sum[m].astype(cdt), agg_mean[m].astype(cdt)),
                None,
                scale_m[m], bias_m[m],
                weights["middle"][m : m + 1].astype(jnp.float32),
                nmask2, ncnt,
            )
            self._mega_update_stats(
                bn_mid, slice(m, m + 1), slice(None), mean.reshape(1, 3, d),
                var.reshape(1, 3, d), ncnt,
            )
            node_states.append(out_m)

        # ---------------- last stage ----------------
        w_last = self.param("last_w", blocked_xavier(1), (p2, 2, d, d))
        b_last = self.param("last_b", nn.initializers.zeros_init(), (p2, 2, d))
        a_last = self.param("last_a", blocked_xavier(1), (p2, d, 1))
        bn_last = self._bn_decl("bn_last", (p2, 4))
        scale_l, bias_l = bn_last[0], bn_last[1]
        done = 0
        for _ in range(spec.last_nodes):
            p_i = len(node_states)
            sl = slice(done, done + p_i)
            pairs = jnp.stack(node_states)
            zd = jnp.einsum(
                "pnd,pdf->pnf", pairs, w_last[sl][:, 0].astype(cdt),
                preferred_element_type=jnp.float32,
            ).astype(cdt) + b_last[sl][:, 0][:, None, :].astype(cdt)
            wa = jnp.einsum(
                "pdf,pfo->pdo", w_last[sl][:, 1], a_last[sl],
                preferred_element_type=jnp.float32,
            )
            u = jnp.einsum(
                "pnd,pdo->pno", pairs, wa.astype(cdt),
                preferred_element_type=jnp.float32,
            ).astype(cdt)
            u = u + jnp.einsum(
                "pd,pdo->po", b_last[sl][:, 1], a_last[sl]
            ).astype(cdt)[:, None, :]
            out, mean, var = bn_mix(
                "last", interp, cdt, axis, (pairs, zd), u,
                scale_l[sl, 1:].reshape(p_i * 3, d),
                bias_l[sl, 1:].reshape(p_i * 3, d),
                weights["last"][sl][:, 1:].astype(jnp.float32),
                nmask2, ncnt,
            )
            self._mega_update_stats(
                bn_last, sl, slice(1, None), mean.reshape(p_i, 3, d),
                var.reshape(p_i, 3, d), ncnt,
            )
            zt = self._mega_zero_term(bn_last, sl, weights["last"][sl][:, 0], p_i)
            node_states.append(out + zt[None, :].astype(out.dtype))
            done += p_i

        h = dense(d, name="concat")(
            jnp.concatenate(node_states, axis=-1).astype(jnp.float32)
        )
        return h

    # ---- forward --------------------------------------------------------

    @nn.compact
    def __call__(self, graph: RelGraph, src_emb, hr, weights, training: bool):
        use_mega = self.megakernel and training
        if use_mega and graph.spmd_axis is not None:
            # the megakernel's stat/apply boundary hosts the cross-shard
            # psum (bn_mix's axis arg), so it runs under the mesh too —
            # except in interpret mode, which cannot trace inside
            # shard_map (CPU meshes fall back to the slab path)
            from mr_gnas_tpu.kernels.common import pallas_interpret_default

            use_mega = not pallas_interpret_default()
        if use_mega:
            return self._call_mega(graph, src_emb, hr, weights, training)
        spec, d = self.spec, self.feature_dim
        assert spec.task == "lp"
        axis = graph.spmd_axis
        p1, p2 = spec.n_first_edges, spec.n_last_edges
        m_nodes = spec.first_nodes
        nf, ne = graph.n_fwd, graph.n_edge_rows
        row_mask, node_mask = graph.row_mask, graph.node_mask
        edge_mask = graph.edge_mask
        cdt = self.compute_dtype
        src_emb = src_emb.astype(cdt)
        hr = hr.astype(cdt)
        norm_e = graph.norm[:ne][None, :, None].astype(cdt)
        dst_e = graph.dst[:ne]

        # ---------------- zero stage ----------------
        z_stack = jnp.stack([src_emb * hr, src_emb - hr, src_emb + hr])[None]
        bn_zero = self._bn_decl("bn_zero", (1, 3))
        h_in = self._mix(
            bn_zero, slice(0, 1), z_stack, row_mask, weights["zero"][:1], training,
            axis=axis,
        )

        # ---------------- first stage ----------------
        w_sec = {
            s: self.param(f"first_w_{s}", blocked_xavier(3), (p1, 2 * d, 3 * d))
            for s in ("in", "out", "self")
        }
        b_sec = {
            s: self.param(f"first_b_{s}", nn.initializers.zeros_init(), (p1, 2, d))
            for s in ("in", "out", "self")
        }
        a_sec = {
            s: self.param(f"first_a_{s}", blocked_xavier(1), (p1, d, 1))
            for s in ("in", "out", "self")
        }
        bn_first = self._bn_decl("bn_first", (p1, 5))

        def gate_section(pairs_s, h_in_s, w, b, a):
            # the [h; h_in] concat matmul split in two: the h_in half is
            # shared across all DAG pairs of the level (h_in is the same
            # tensor), so it is computed once and broadcast — saves both
            # the [p, R, 2D] concat materialization and p-fold redundant
            # FLOPs on the h_in half
            cdt = pairs_s.dtype
            z = jnp.einsum(
                "prc,pck->prk", pairs_s, w[:, :pairs_s.shape[-1]].astype(cdt),
                preferred_element_type=jnp.float32,
            ).astype(cdt)
            z = z + jnp.einsum(
                "rc,pck->prk", h_in_s, w[:, pairs_s.shape[-1]:].astype(cdt),
                preferred_element_type=jnp.float32,
            ).astype(cdt)
            zd, zs, zc = jnp.split(z, 3, axis=-1)
            zd = zd + b[:, 0][:, None, :].astype(zd.dtype)
            zs = zs + b[:, 1][:, None, :].astype(zs.dtype)
            out_d = jax.nn.sigmoid(zd) * pairs_s
            gate = jax.nn.sigmoid(jnp.einsum("prd,pdo->pro", zs, a.astype(zs.dtype)))
            return out_d, gate * pairs_s, zc

        states = [h_in]
        done = 0
        for _ in range(spec.first_nodes):
            p_i = len(states)
            sl = slice(done, done + p_i)
            pairs = jnp.stack(states)  # [p_i, R, D]
            d_i, s_i, c_i = gate_section(
                pairs[:, :nf], h_in[:nf], w_sec["in"][sl], b_sec["in"][sl], a_sec["in"][sl]
            )
            d_o, s_o, c_o = gate_section(
                pairs[:, nf:ne], h_in[nf:ne], w_sec["out"][sl], b_sec["out"][sl], a_sec["out"][sl]
            )
            d_s, s_s, c_s = gate_section(
                pairs[:, ne:], h_in[ne:], w_sec["self"][sl], b_sec["self"][sl], a_sec["self"][sl]
            )
            f_dense = jnp.concatenate(
                [jnp.concatenate([d_i / 3, d_o / 3], 1) * norm_e, d_s / 3], 1
            )
            f_sparse = jnp.concatenate(
                [jnp.concatenate([s_i / 3, s_o / 3], 1) * norm_e, s_s / 3], 1
            )
            f_comp = jnp.concatenate(
                [jnp.concatenate([c_i / 3, c_o / 3], 1) * norm_e, c_s], 1
            )
            # FIRST_OPS order: f_zero handled analytically (op 0)
            stack = jnp.stack([pairs, f_dense, f_sparse, f_comp], axis=1)
            states.append(
                self._mix_const_op0(
                    bn_first, sl, stack, row_mask, weights["first"][sl], training,
                    jnp.zeros((p_i, d), jnp.float32), axis=axis,
                )
            )
            done += p_i
        first_states = states[1:]

        # ---------------- middle stage ----------------
        w_mid = self.param("middle_w", blocked_xavier(1), (m_nodes, 2, d, d))
        b_mid = self.param("middle_b", nn.initializers.zeros_init(), (m_nodes, 2, d))
        bn_mid = self._bn_decl("bn_middle", (m_nodes, 3))
        S = jnp.stack(first_states)  # [M, R, D]
        SE, SSelf = S[:, :ne], S[:, ne:]
        agg_max, sum_raw, mean_num, cnt = self._middle_aggregates(
            graph, SE, SSelf, w_mid, b_mid, dst_e
        )
        agg_max = agg_max + SSelf
        sum_raw = nn.Dropout(self.drop_aggr, name="drop_sum")(
            sum_raw, deterministic=not training
        )
        agg_sum = sum_raw + SSelf
        agg_mean = (
            jnp.where(
                cnt[:, None] > 0,
                mean_num / jnp.maximum(cnt[:, None], 1.0).astype(mean_num.dtype),
                0.0,
            ).astype(mean_num.dtype)
            + SSelf
        )
        mid_stack = jnp.stack([agg_max, agg_sum, agg_mean], axis=1)  # MIDDLE_OPS order
        y = jax.nn.relu(
            self._bn_apply(
                bn_mid, slice(0, m_nodes), mid_stack, node_mask, training, axis=axis
            )
        )
        node_states = list(jnp.einsum("mknd,mk->mnd", y, weights["middle"]))

        # ---------------- last stage ----------------
        w_last = self.param("last_w", blocked_xavier(1), (p2, 2, d, d))
        b_last = self.param("last_b", nn.initializers.zeros_init(), (p2, 2, d))
        a_last = self.param("last_a", blocked_xavier(1), (p2, d, 1))
        bn_last = self._bn_decl("bn_last", (p2, 4))
        done = 0
        for _ in range(spec.last_nodes):
            p_i = len(node_states)
            sl = slice(done, done + p_i)
            pairs = jnp.stack(node_states)  # [p_i, N, D]
            z = jnp.einsum(
                "pnd,pkdf->pknf", pairs, w_last[sl].astype(pairs.dtype),
                preferred_element_type=jnp.float32,
            ).astype(pairs.dtype) + b_last[sl][..., None, :].astype(pairs.dtype)
            zd, zs = z[:, 0], z[:, 1]
            f_dense = jax.nn.sigmoid(zd) * pairs
            gate = jax.nn.sigmoid(
                jnp.einsum("pnd,pdo->pno", zs, a_last[sl].astype(zs.dtype))
            )
            f_sparse = gate * pairs
            # LAST_OPS order: f_zero handled analytically (op 0)
            stack = jnp.stack([pairs, f_dense, f_sparse], axis=1)
            node_states.append(
                self._mix_const_op0(
                    bn_last, sl, stack, node_mask, weights["last"][sl], training,
                    jnp.zeros((p_i, d), jnp.float32), axis=axis,
                )
            )
            done += p_i

        h = dense(d, name="concat")(
            jnp.concatenate(node_states, axis=-1).astype(jnp.float32)
        )
        return h


class FusedSupernetCellNC(nn.Module):
    """Fused NC supernet cell — same function as SupernetCell(task='nc').

    NC differences from LP (models/cell.py:11-146 vs cell_lp.py):
      * gates are plain ``[h; h_in]`` filters (no direction sections, no
        norm scaling);
      * every candidate-op pipeline has an extra Linear(d, d) after the
        op (cell.py:17-20) — fused as one [pairs, ops, D, D] einsum per
        stage;
      * aggregators reduce over ALL edges with no self residual
        (operations.py:109-164), a_sum has no dropout;
      * the cell output gets BN + ReLU + dropout (cell.py:142-146).
    Operates on :class:`EdgeGraph` (block view) tensors.
    """

    spec: CellSpec
    feature_dim: int
    dropout: float = 0.0
    momentum: float = 0.9
    epsilon: float = 1e-5
    compute_dtype: object = jnp.float32

    _bn_decl = FusedSupernetCellLP._bn_decl
    _bn_apply = FusedSupernetCellLP._bn_apply
    _mix = FusedSupernetCellLP._mix
    _mix_const_op0 = FusedSupernetCellLP._mix_const_op0

    @nn.compact
    def __call__(self, graph, src_emb, hr, weights, training: bool):
        spec, d = self.spec, self.feature_dim
        assert spec.task == "nc"
        # sharded-local blocks (dist/spmd.py): BN stats psum over `axis`,
        # the middle-stage partials merge across it (see the LP cell)
        axis = graph.spmd_axis
        p1, p2, m_nodes = spec.n_first_edges, spec.n_last_edges, spec.first_nodes
        edge_mask, node_mask = graph.edge_mask, graph.node_mask
        cdt = self.compute_dtype
        src_emb = src_emb.astype(cdt)
        hr = hr.astype(cdt)

        def post_linear(stack, w, b):
            """Per-(pair, op) Linear(d, d): [p, K, R, D] x [p, K, D, D]."""
            return jnp.einsum(
                "pkrd,pkdf->pkrf", stack, w.astype(stack.dtype),
                preferred_element_type=jnp.float32,
            ).astype(stack.dtype) + b[..., None, :].astype(stack.dtype)

        # ---------------- zero stage ----------------
        z_stack = jnp.stack([src_emb * hr, src_emb - hr, src_emb + hr])[None]
        zw = self.param("zero_post_w", blocked_xavier(1), (1, 3, d, d))
        zb = self.param("zero_post_b", nn.initializers.zeros_init(), (1, 3, d))
        bn_zero = self._bn_decl("bn_zero", (1, 3))
        h_in = self._mix(
            bn_zero, slice(0, 1), post_linear(z_stack, zw, zb),
            edge_mask, weights["zero"][:1], training, axis=axis,
        )

        # ---------------- first stage ----------------
        gw = self.param("first_gate_w", blocked_xavier(2), (p1, 2 * d, 2 * d))
        gb = self.param("first_gate_b", nn.initializers.zeros_init(), (p1, 2, d))
        ga = self.param("first_gate_a", blocked_xavier(1), (p1, d, 1))
        pw = self.param("first_post_w", blocked_xavier(1), (p1, 4, d, d))
        pb = self.param("first_post_b", nn.initializers.zeros_init(), (p1, 4, d))
        bn_first = self._bn_decl("bn_first", (p1, 4))

        def gates(pairs, h_in_s, w, b, a):
            # split [h; h_in] matmul; the h_in half is shared across pairs
            cdt_ = pairs.dtype
            z = jnp.einsum(
                "prc,pck->prk", pairs, w[:, : pairs.shape[-1]].astype(cdt_),
                preferred_element_type=jnp.float32,
            ).astype(cdt_)
            z = z + jnp.einsum(
                "rc,pck->prk", h_in_s, w[:, pairs.shape[-1] :].astype(cdt_),
                preferred_element_type=jnp.float32,
            ).astype(cdt_)
            zd, zs = jnp.split(z, 2, axis=-1)
            zd = zd + b[:, 0][:, None, :].astype(zd.dtype)
            zs = zs + b[:, 1][:, None, :].astype(zs.dtype)
            f_dense = jax.nn.sigmoid(zd) * pairs
            gate = jax.nn.sigmoid(jnp.einsum("prd,pdo->pro", zs, a.astype(zs.dtype)))
            return f_dense, gate * pairs

        states = [h_in]
        done = 0
        for _ in range(spec.first_nodes):
            p_i = len(states)
            sl = slice(done, done + p_i)
            pairs = jnp.stack(states)
            f_dense, f_sparse = gates(pairs, h_in, gw[sl], gb[sl], ga[sl])
            # NC_FIRST_OPS order: f_zero's pipeline output is the constant
            # post-linear bias row — handled analytically (op 0)
            stack = jnp.stack([pairs, f_dense, f_sparse], axis=1)
            stack = post_linear(stack, pw[sl][:, 1:], pb[sl][:, 1:])
            states.append(
                self._mix_const_op0(
                    bn_first, sl, stack, edge_mask, weights["first"][sl], training,
                    pb[sl][:, 0], axis=axis,
                )
            )
            done += p_i
        first_states = states[1:]

        # ---------------- middle stage ----------------
        aw = self.param("middle_pre_w", blocked_xavier(1), (m_nodes, 2, d, d))
        ab = self.param("middle_pre_b", nn.initializers.zeros_init(), (m_nodes, 2, d))
        mw = self.param("middle_post_w", blocked_xavier(1), (m_nodes, 3, d, d))
        mb = self.param("middle_post_b", nn.initializers.zeros_init(), (m_nodes, 3, d))
        bn_mid = self._bn_decl("bn_middle", (m_nodes, 3))
        S = jnp.stack(first_states)  # [M, E, D]
        lin = jax.nn.relu(
            jnp.einsum(
                "med,mkdf->mkef", S, aw.astype(S.dtype),
                preferred_element_type=jnp.float32,
            ).astype(S.dtype)
            + ab[..., None, :].astype(S.dtype)
        )
        # padded block edges route to the dummy segment (blocks.py:123),
        # so no [M, E, D] mask slabs are needed (see the LP middle stage)
        n_agg = graph.agg_nodes
        vmax = jax.vmap(lambda x: segment_max(x, graph.dst, n_agg, None))
        vsum = jax.vmap(lambda x: segment_sum(x, graph.dst, n_agg, None))
        from mr_gnas_tpu.kernels.segment import segment_count

        # one scatter pass for a_sum's input and a_mean's numerator (see
        # the LP cell's middle stage)
        summed = vsum(jnp.concatenate([S, lin[:, 1]], axis=-1))
        a_sum, mean_num = summed[..., :d], summed[..., d:]
        cnt = segment_count(graph.dst, n_agg, None)
        agg_max = vmax(lin[:, 0])
        if axis is not None:
            # merge per-shard partials -> this device's dst-node block
            # (reduce-scatter sums/counts; all-to-all max — exact, the
            # max messages are relu'd >= 0)
            from mr_gnas_tpu.dist.spmd import (
                max_merge_nodes,
                scatter_sum_nodes,
                scatter_sum_vec,
            )

            n_dev = graph.n_nodes_global // graph.n_nodes
            agg_max = max_merge_nodes(axis, n_dev, agg_max)
            merged = scatter_sum_nodes(
                jnp.concatenate([a_sum, mean_num], axis=-1), axis
            )
            a_sum, mean_num = merged[..., :d], merged[..., d:]
            cnt = scatter_sum_vec(cnt, axis)
        a_mean = jnp.where(
            cnt[:, None] > 0,
            mean_num / jnp.maximum(cnt[:, None], 1.0).astype(mean_num.dtype),
            0.0,
        ).astype(mean_num.dtype)
        mid_stack = jnp.stack(
            [agg_max, a_sum, a_mean], axis=1
        )  # NC_MIDDLE_OPS order (a_max, a_sum, a_mean)
        mid_stack = post_linear(mid_stack.astype(cdt), mw, mb)
        y = jax.nn.relu(
            self._bn_apply(
                bn_mid, slice(0, m_nodes), mid_stack, node_mask, training, axis=axis
            )
        )
        node_states = list(jnp.einsum("mknd,mk->mnd", y, weights["middle"].astype(y.dtype)))

        # ---------------- last stage ----------------
        lw = self.param("last_gate_w", blocked_xavier(1), (p2, 2, d, d))
        lb = self.param("last_gate_b", nn.initializers.zeros_init(), (p2, 2, d))
        la = self.param("last_gate_a", blocked_xavier(1), (p2, d, 1))
        qw = self.param("last_post_w", blocked_xavier(1), (p2, 4, d, d))
        qb = self.param("last_post_b", nn.initializers.zeros_init(), (p2, 4, d))
        bn_last = self._bn_decl("bn_last", (p2, 4))
        done = 0
        for _ in range(spec.last_nodes):
            p_i = len(node_states)
            sl = slice(done, done + p_i)
            pairs = jnp.stack(node_states)
            z = jnp.einsum(
                "pnd,pkdf->pknf", pairs, lw[sl].astype(pairs.dtype),
                preferred_element_type=jnp.float32,
            ).astype(pairs.dtype) + lb[sl][..., None, :].astype(pairs.dtype)
            zd, zs = z[:, 0], z[:, 1]
            f_dense = jax.nn.sigmoid(zd) * pairs
            gate = jax.nn.sigmoid(
                jnp.einsum("pnd,pdo->pno", zs, la[sl].astype(zs.dtype))
            )
            f_sparse = gate * pairs
            # f_zero pipeline == constant post-linear bias (op 0)
            stack = jnp.stack([pairs, f_dense, f_sparse], axis=1)
            stack = post_linear(stack, qw[sl][:, 1:], qb[sl][:, 1:])
            node_states.append(
                self._mix_const_op0(
                    bn_last, sl, stack, node_mask, weights["last"][sl], training,
                    qb[sl][:, 0], axis=axis,
                )
            )
            done += p_i

        h = dense(d, name="concat")(
            jnp.concatenate(node_states, axis=-1).astype(jnp.float32)
        )
        from mr_gnas_tpu.layers import MaskedBatchNorm

        h = MaskedBatchNorm(name="bn_out", axis_name=axis)(h, node_mask, training)
        h = jax.nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not training)
        return h


# ---------------------------------------------------------------------------
# naive <-> fused parameter conversion (parity tests, checkpoint migration)
# ---------------------------------------------------------------------------

LP_FIRST_BN_ORDER = ["f_zero", "f_identity", "f_dense_comp", "f_sparse_comp", "f_comp"]
LP_MID_BN_ORDER = ["a_max", "a_sum", "a_mean"]
LP_LAST_BN_ORDER = ["f_zero", "f_identity", "f_dense_last", "f_sparse_last"]
LP_ZERO_BN_ORDER = ["pre_mult", "pre_sub", "pre_add"]


def convert_naive_params(naive_vars: dict, spec: CellSpec) -> dict:
    """Map a naive SupernetCell(task='lp') variables dict to the fused
    cell's layout. Returns {'params': ..., 'batch_stats': ...}."""
    import numpy as np

    p = naive_vars["params"]
    bs = naive_vars.get("batch_stats", {})
    p1, p2, m = spec.n_first_edges, spec.n_last_edges, spec.first_nodes
    out_p: dict = {}
    out_bs: dict = {}

    def bn_stack(tag, n, scope_fmt, order, stats=False):
        src = bs if stats else p
        a_key, b_key = ("mean", "var") if stats else ("scale", "bias")
        A = np.stack(
            [
                np.stack([np.asarray(src[scope_fmt.format(i)][f"bn_{o}"][a_key]) for o in order])
                for i in range(n)
            ]
        )
        B = np.stack(
            [
                np.stack([np.asarray(src[scope_fmt.format(i)][f"bn_{o}"][b_key]) for o in order])
                for i in range(n)
            ]
        )
        d = out_bs if stats else out_p
        d[f"{tag}_{a_key}"] = A
        d[f"{tag}_{b_key}"] = B

    bn_stack("bn_zero", 1, "zero_0", LP_ZERO_BN_ORDER)
    bn_stack("bn_first", p1, "first_{}", LP_FIRST_BN_ORDER)
    bn_stack("bn_middle", m, "middle_{}", LP_MID_BN_ORDER)
    bn_stack("bn_last", p2, "last_{}", LP_LAST_BN_ORDER)
    if bs:
        bn_stack("bn_zero", 1, "zero_0", LP_ZERO_BN_ORDER, stats=True)
        bn_stack("bn_first", p1, "first_{}", LP_FIRST_BN_ORDER, stats=True)
        bn_stack("bn_middle", m, "middle_{}", LP_MID_BN_ORDER, stats=True)
        bn_stack("bn_last", p2, "last_{}", LP_LAST_BN_ORDER, stats=True)

    for s in ("in", "out", "self"):
        out_p[f"first_w_{s}"] = np.stack(
            [
                np.concatenate(
                    [
                        np.asarray(p[f"first_{i}"]["FDenseComp_0"]["g"][f"W_{s}"]["kernel"]),
                        np.asarray(p[f"first_{i}"]["FSparseComp_0"]["g"][f"W_{s}"]["kernel"]),
                        np.asarray(p[f"first_{i}"]["FComp_0"][f"W_{s}"]["kernel"]),
                    ],
                    axis=-1,
                )
                for i in range(p1)
            ]
        )
        out_p[f"first_b_{s}"] = np.stack(
            [
                np.stack(
                    [
                        np.asarray(p[f"first_{i}"]["FDenseComp_0"]["g"][f"W_{s}"]["bias"]),
                        np.asarray(p[f"first_{i}"]["FSparseComp_0"]["g"][f"W_{s}"]["bias"]),
                    ]
                )
                for i in range(p1)
            ]
        )
        out_p[f"first_a_{s}"] = np.stack(
            [
                np.asarray(p[f"first_{i}"]["FSparseComp_0"]["g"][f"a_{s}"]["kernel"])
                for i in range(p1)
            ]
        )

    out_p["middle_w"] = np.stack(
        [
            np.stack(
                [
                    np.asarray(p[f"middle_{i}"]["AMaxLP_0"]["Dense_0"]["kernel"]),
                    np.asarray(p[f"middle_{i}"]["AMeanLP_0"]["Dense_0"]["kernel"]),
                ]
            )
            for i in range(m)
        ]
    )
    out_p["middle_b"] = np.stack(
        [
            np.stack(
                [
                    np.asarray(p[f"middle_{i}"]["AMaxLP_0"]["Dense_0"]["bias"]),
                    np.asarray(p[f"middle_{i}"]["AMeanLP_0"]["Dense_0"]["bias"]),
                ]
            )
            for i in range(m)
        ]
    )
    out_p["last_w"] = np.stack(
        [
            np.stack(
                [
                    np.asarray(p[f"last_{i}"]["FDenseLast_0"]["Dense_0"]["kernel"]),
                    np.asarray(p[f"last_{i}"]["FSparseLast_0"]["W"]["kernel"]),
                ]
            )
            for i in range(p2)
        ]
    )
    out_p["last_b"] = np.stack(
        [
            np.stack(
                [
                    np.asarray(p[f"last_{i}"]["FDenseLast_0"]["Dense_0"]["bias"]),
                    np.asarray(p[f"last_{i}"]["FSparseLast_0"]["W"]["bias"]),
                ]
            )
            for i in range(p2)
        ]
    )
    out_p["last_a"] = np.stack(
        [np.asarray(p[f"last_{i}"]["FSparseLast_0"]["a"]["kernel"]) for i in range(p2)]
    )
    out_p["concat"] = p["concat"]
    return {"params": out_p, "batch_stats": out_bs}


NC_FIRST_BN_ORDER = ["f_zero", "f_identity", "f_dense", "f_sparse"]
NC_ZERO_BN_ORDER = ["pre_mult", "pre_sub", "pre_add"]
NC_MID_BN_ORDER = ["a_max", "a_sum", "a_mean"]
NC_LAST_BN_ORDER = ["f_zero", "f_identity", "f_dense_last", "f_sparse_last"]


def convert_naive_params_nc(naive_vars: dict, spec: CellSpec) -> dict:
    """Map a naive SupernetCell(task='nc') variables dict to the fused NC
    cell's layout."""
    import numpy as np

    p = naive_vars["params"]
    bs = naive_vars.get("batch_stats", {})
    p1, p2, m = spec.n_first_edges, spec.n_last_edges, spec.first_nodes
    out_p: dict = {}
    out_bs: dict = {}

    def bn_stack(tag, n, scope_fmt, order, stats=False):
        src = bs if stats else p
        a_key, b_key = ("mean", "var") if stats else ("scale", "bias")
        d = out_bs if stats else out_p
        d[f"{tag}_{a_key}"] = np.stack(
            [
                np.stack([np.asarray(src[scope_fmt.format(i)][f"bn_{o}"][a_key]) for o in order])
                for i in range(n)
            ]
        )
        d[f"{tag}_{b_key}"] = np.stack(
            [
                np.stack([np.asarray(src[scope_fmt.format(i)][f"bn_{o}"][b_key]) for o in order])
                for i in range(n)
            ]
        )

    def post_stack(tag, n, scope_fmt, order):
        out_p[f"{tag}_w"] = np.stack(
            [
                np.stack([np.asarray(p[scope_fmt.format(i)][f"lin_{o}"]["kernel"]) for o in order])
                for i in range(n)
            ]
        )
        out_p[f"{tag}_b"] = np.stack(
            [
                np.stack([np.asarray(p[scope_fmt.format(i)][f"lin_{o}"]["bias"]) for o in order])
                for i in range(n)
            ]
        )

    bn_stack("bn_zero", 1, "zero_0", NC_ZERO_BN_ORDER)
    bn_stack("bn_first", p1, "first_{}", NC_FIRST_BN_ORDER)
    bn_stack("bn_middle", m, "middle_{}", NC_MID_BN_ORDER)
    bn_stack("bn_last", p2, "last_{}", NC_LAST_BN_ORDER)
    if bs:
        bn_stack("bn_zero", 1, "zero_0", NC_ZERO_BN_ORDER, stats=True)
        bn_stack("bn_first", p1, "first_{}", NC_FIRST_BN_ORDER, stats=True)
        bn_stack("bn_middle", m, "middle_{}", NC_MID_BN_ORDER, stats=True)
        bn_stack("bn_last", p2, "last_{}", NC_LAST_BN_ORDER, stats=True)
        out_bs["bn_out"] = bs["bn_out"]

    post_stack("zero_post", 1, "zero_0", NC_ZERO_BN_ORDER)
    post_stack("first_post", p1, "first_{}", NC_FIRST_BN_ORDER)
    post_stack("middle_post", m, "middle_{}", NC_MID_BN_ORDER)
    post_stack("last_post", p2, "last_{}", NC_LAST_BN_ORDER)

    out_p["first_gate_w"] = np.stack(
        [
            np.concatenate(
                [
                    np.asarray(p[f"first_{i}"]["FDense_0"]["Dense_0"]["kernel"]),
                    np.asarray(p[f"first_{i}"]["FSparse_0"]["W"]["kernel"]),
                ],
                axis=-1,
            )
            for i in range(p1)
        ]
    )
    out_p["first_gate_b"] = np.stack(
        [
            np.stack(
                [
                    np.asarray(p[f"first_{i}"]["FDense_0"]["Dense_0"]["bias"]),
                    np.asarray(p[f"first_{i}"]["FSparse_0"]["W"]["bias"]),
                ]
            )
            for i in range(p1)
        ]
    )
    out_p["first_gate_a"] = np.stack(
        [np.asarray(p[f"first_{i}"]["FSparse_0"]["a"]["kernel"]) for i in range(p1)]
    )
    out_p["middle_pre_w"] = np.stack(
        [
            np.stack(
                [
                    np.asarray(p[f"middle_{i}"]["AMaxNC_0"]["Dense_0"]["kernel"]),
                    np.asarray(p[f"middle_{i}"]["AMeanNC_0"]["Dense_0"]["kernel"]),
                ]
            )
            for i in range(m)
        ]
    )
    out_p["middle_pre_b"] = np.stack(
        [
            np.stack(
                [
                    np.asarray(p[f"middle_{i}"]["AMaxNC_0"]["Dense_0"]["bias"]),
                    np.asarray(p[f"middle_{i}"]["AMeanNC_0"]["Dense_0"]["bias"]),
                ]
            )
            for i in range(m)
        ]
    )
    out_p["last_gate_w"] = np.stack(
        [
            np.stack(
                [
                    np.asarray(p[f"last_{i}"]["FDenseLast_0"]["Dense_0"]["kernel"]),
                    np.asarray(p[f"last_{i}"]["FSparseLast_0"]["W"]["kernel"]),
                ]
            )
            for i in range(p2)
        ]
    )
    out_p["last_gate_b"] = np.stack(
        [
            np.stack(
                [
                    np.asarray(p[f"last_{i}"]["FDenseLast_0"]["Dense_0"]["bias"]),
                    np.asarray(p[f"last_{i}"]["FSparseLast_0"]["W"]["bias"]),
                ]
            )
            for i in range(p2)
        ]
    )
    out_p["last_gate_a"] = np.stack(
        [np.asarray(p[f"last_{i}"]["FSparseLast_0"]["a"]["kernel"]) for i in range(p2)]
    )
    out_p["concat"] = p["concat"]
    out_p["bn_out"] = p["bn_out"]
    return {"params": out_p, "batch_stats": out_bs}
