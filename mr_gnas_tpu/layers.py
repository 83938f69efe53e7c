"""Shared neural layers: masked batch norm, MLP classifier, embeddings.

Masked batch norm is required because our graphs are padded to static
shapes: batch statistics must be computed over *real* rows only, or the
padding fraction would skew them relative to the reference's
``nn.BatchNorm1d`` over exact-size tensors (models/cell_lp.py:21).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

xavier = nn.initializers.glorot_normal()


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d with row masking, torch-compatible semantics.

    Training: normalize by the masked batch mean / biased variance; update
    running stats with the *unbiased* variance (torch convention).
    Eval: normalize by running stats. ``momentum=0.9`` in the flax
    convention equals torch's default momentum 0.1.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    # manual-SPMD: name of the mesh axis the batch rows are sharded over
    # (dist/spmd.py); statistics are psum'd so sharded == single-device
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None, training: bool):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (d,))
        bias = self.param("bias", nn.initializers.zeros_init(), (d,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((d,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((d,), jnp.float32)
        )
        if training:
            # two-pass (mean, then (x-mean)^2) on purpose: this BN is the
            # torch-parity anchor for the retrain networks; the fused
            # supernet cells use the one-pass (sum, sumsq) form instead
            # (cells/fused.py _bn_apply) where the [p, K, R, D] slab read
            # dominates and the reassociation stays inside test tolerance
            def _psum(v):
                return jax.lax.psum(v, self.axis_name) if self.axis_name else v

            if mask is None:
                cnt = _psum(jnp.asarray(x.shape[0], jnp.float32))
                mean = _psum(jnp.sum(x, axis=0)) / cnt
                var = _psum(jnp.sum((x - mean) ** 2, axis=0)) / cnt
            else:
                m = mask[:, None]
                cnt = jnp.maximum(_psum(jnp.sum(mask)), 1.0)
                mean = _psum(jnp.sum(x * m, axis=0)) / cnt
                var = _psum(jnp.sum(((x - mean) ** 2) * m, axis=0)) / cnt
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class MLPClassifier(nn.Module):
    """Halving-width 2-hidden-layer MLP head for NC
    (models/model.py:70-85)."""

    input_dim: int
    output_dim: int
    n_hidden: int = 2

    @nn.compact
    def __call__(self, x: jax.Array):
        y = x
        for l in range(self.n_hidden):
            y = nn.Dense(
                self.input_dim // 2 ** (l + 1),
                kernel_init=xavier,
                bias_init=nn.initializers.zeros_init(),
            )(y)
            y = jax.nn.relu(y)
        return nn.Dense(
            self.output_dim,
            kernel_init=xavier,
            bias_init=nn.initializers.zeros_init(),
        )(y)


def xavier_relu_param(module: nn.Module, name: str, shape: tuple[int, ...]):
    """Free parameter with xavier-normal(gain=sqrt(2)) init, matching the
    reference's ``get_param`` (models/model_search_lp.py:87-90)."""
    return module.param(
        name, nn.initializers.variance_scaling(2.0, "fan_avg", "normal"), shape
    )
