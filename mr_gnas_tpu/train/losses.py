"""Auxiliary losses and metrics (utils/utils.py analogs)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_accuracy(logits, labels, topk=(1,), mask=None):
    """Top-k accuracy percentages (utils/utils.py:20-34)."""
    if mask is None:
        mask = jnp.ones(labels.shape[0], jnp.float32)
    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)  # [B, maxk]
    correct = (pred == labels[:, None]).astype(jnp.float32) * mask[:, None]
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return [100.0 * jnp.sum(correct[:, :k]) / denom for k in topk]


def weighted_ce(logits, labels, num_classes: int, mask=None):
    """Class-balanced cross entropy (utils/utils.py:162-179): per-batch
    class weight ``(V - count_c) / V``, zero for absent classes."""
    if mask is None:
        mask = jnp.ones(labels.shape[0], jnp.float32)
    v = jnp.maximum(jnp.sum(mask), 1.0)
    one_hot = jax.nn.one_hot(labels, num_classes) * mask[:, None]
    cluster_sizes = jnp.sum(one_hot, axis=0)  # [C]
    weight = (v - cluster_sizes) / v * (cluster_sizes > 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_row_w = jnp.take(weight, labels)
    ll = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    num = -jnp.sum(ll * per_row_w * mask)
    den = jnp.maximum(jnp.sum(per_row_w * mask), 1e-8)
    return num / den
