"""Relation-typed sparse primitives: masked segment reductions.

These are the TPU-native replacement for the DGL C++/CUDA kernels the
reference delegates to via ``update_all(copy_edge, max/mean/sum)``
(reference models/operations.py:84,119,138,159,185 and
models/operations_lp.py:233,248,262).

Baseline implementations use XLA scatter/segment ops (``jax.ops.segment_*``)
with an extra dummy segment for padded rows; the Pallas relation-batched
kernels in :mod:`mr_gnas_tpu.kernels.pallas_segment` are drop-in, parity
tested replacements for the hot path.

Empty-segment semantics match DGL's builtin reducers: nodes with no
incoming message get 0 (for sum, mean AND max).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_LARGE = -1e30


def gather_rows(node_feat: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather per-row features from a node table: node_feat[idx].

    The ``copy_edge``/edge-materialization half of a relation-typed SpMM.
    mode="clip" skips jnp.take's fill-select pass (indices are in-bounds
    by the RelGraph/Block contracts).
    """
    return jnp.take(node_feat, idx, axis=0, mode="clip")


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Masked segment sum of [E, D] rows into [num_segments, D].

    ``segment_ids`` may contain ``num_segments`` to route padded rows into a
    dummy segment, which is dropped.
    """
    if mask is not None:
        data = data * mask[:, None]
    out = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_count(
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Per-segment row count [num_segments]."""
    ones = jnp.ones(segment_ids.shape, dtype=jnp.float32)
    if mask is not None:
        ones = ones * mask
    cnt = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments + 1)
    return cnt[:num_segments]


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Masked segment mean; empty segments yield 0 (DGL fn.mean semantics)."""
    s = segment_sum(data, segment_ids, num_segments, mask)
    c = segment_count(segment_ids, num_segments, mask)
    return jnp.where(c[:, None] > 0, s / jnp.maximum(c[:, None], 1.0), 0.0)


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Masked segment max; empty segments yield 0 (DGL fn.max semantics)."""
    if mask is not None:
        data = jnp.where(mask[:, None] > 0, data, _NEG_LARGE)
    out = jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments + 1
    )[:num_segments]
    c = segment_count(segment_ids, num_segments, mask)
    return jnp.where(c[:, None] > 0, out, 0.0)


def segment_std(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
    eps: float = 1e-5,
) -> jax.Array:
    """sqrt(relu(E[x^2] - E[x]^2) + eps) per segment.

    Mirrors the reference's (unused-in-search) std aggregator
    (models/operations.py:167-176), including its EPS=1e-5.
    Empty segments yield sqrt(eps).
    """
    mean = segment_mean(data, segment_ids, num_segments, mask)
    mean_sq = segment_mean(data * data, segment_ids, num_segments, mask)
    var = jax.nn.relu(mean_sq - mean * mean)
    return jnp.sqrt(var + eps)


def segment_softmax(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Masked per-segment softmax of [E, D] rows along the segment axis —
    the attention-aggregator primitive (beyond the reference, whose op
    space has no attention aggregator; provided so GAT-style a_* ops can
    slot into the registry). Numerically stabilized with the segment max;
    masked rows get weight 0; empty segments produce all-zero weights.
    """
    seg_max = segment_max(data, segment_ids, num_segments, mask)
    shifted = data - jnp.take(seg_max, jnp.minimum(segment_ids, num_segments - 1), axis=0)
    e = jnp.exp(shifted)
    if mask is not None:
        e = e * mask[:, None]
    denom = segment_sum(e, segment_ids, num_segments, None)
    denom_rows = jnp.take(
        denom, jnp.minimum(segment_ids, num_segments - 1), axis=0
    )
    return jnp.where(denom_rows > 0, e / jnp.maximum(denom_rows, 1e-30), 0.0)
