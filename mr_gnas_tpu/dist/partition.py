"""Edge-partitioned aggregation primitives (library layer).

The PRODUCTION sharded path is the manual-SPMD formulation in
:mod:`mr_gnas_tpu.dist.spmd` (per-device local graphs, reduce-scatter /
all-to-all merges, one all-gather per layer) — it is what every driver
uses under ``--mesh-shape``. This module keeps the two earlier
formulations as library pieces and numerical cross-checks:

1. **Annotation path** — commit inputs with
   :func:`mr_gnas_tpu.dist.mesh.shard_graph` / ``replicate`` and jit the
   ordinary train step; XLA's SPMD partitioner inserts the collectives
   (the pjit recipe). Simple and correct, but its middle-stage merges
   all-reduce full replicated [N, D] tensors.

2. **Explicit shard_map reducers** — per-device full-[N, D] partials
   merged with ``psum``/``pmax``, the ring-overlap variant
   (:func:`ring_segment_sum_overlapped`), and the column-sharded
   filtered ranker (:func:`sharded_scores_rank`, the TP-analog piece for
   entity tables too large to replicate).

Correctness notes (SURVEY.md §7 hard-part 5): sum/mean/max are all
associative over edge shards; mean is computed as (psum of sums) /
(psum of counts); max as pmax of local maxes with empty-segment masking
deferred until after the merge.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mr_gnas_tpu.kernels.segment import _NEG_LARGE


def edge_partitioned_segment_reduce(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array,
    mesh: Mesh,
    op: str = "sum",
    data_axis: str = "data",
):
    """shard_map segment reduce: local partials + psum/pmax merge.

    ``data``/``segment_ids``/``mask`` are sharded over ``data_axis``;
    the [num_segments, D] result is replicated.
    """

    def local(data, seg, mask):
        if op == "sum":
            part = jax.ops.segment_sum(
                data * mask[:, None], seg, num_segments=num_segments + 1
            )[:num_segments]
            return jax.lax.psum(part, data_axis)
        if op == "mean":
            s = jax.ops.segment_sum(
                data * mask[:, None], seg, num_segments=num_segments + 1
            )[:num_segments]
            c = jax.ops.segment_sum(mask, seg, num_segments=num_segments + 1)[
                :num_segments
            ]
            s = jax.lax.psum(s, data_axis)
            c = jax.lax.psum(c, data_axis)
            return jnp.where(c[:, None] > 0, s / jnp.maximum(c[:, None], 1.0), 0.0)
        if op == "max":
            masked = jnp.where(mask[:, None] > 0, data, _NEG_LARGE)
            part = jax.ops.segment_max(masked, seg, num_segments=num_segments + 1)[
                :num_segments
            ]
            part = jax.lax.pmax(part, data_axis)
            c = jax.lax.psum(
                jax.ops.segment_sum(mask, seg, num_segments=num_segments + 1)[
                    :num_segments
                ],
                data_axis,
            )
            return jnp.where(c[:, None] > 0, part, 0.0)
        raise ValueError(op)

    spec_rows = P(data_axis)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_rows, spec_rows, spec_rows),
        out_specs=P(),
    )(data, segment_ids, mask)


def ring_segment_sum_overlapped(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array,
    mesh: Mesh,
    data_axis: str = "data",
):
    """Edge-partitioned segment sum with ring-overlapped merging.

    The compute/comm-overlap formulation of the psum merge (NOTES.md
    round-1 item 3; the graph analog of ring attention's partial
    exchange): instead of one blocking psum over full [N, D] partials,
    each device reduces its edge shard into a *node-sharded* accumulator
    slice and `ppermute`s the accumulator around the ring, adding its
    local contribution for the arriving slice at each step — XLA can
    overlap each hop's DMA with the next slice's local segment reduce.
    Result: [N, D] with rows sharded over ``data_axis`` (all-gather at
    the caller if a replicated result is needed).
    """
    n_dev = mesh.shape[data_axis]
    if num_segments % n_dev:
        raise ValueError(f"num_segments {num_segments} % devices {n_dev} != 0")
    rows = num_segments // n_dev

    def local(data, seg, mask):
        idx = jax.lax.axis_index(data_axis)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def slice_partial(slice_owner):
            """This device's contribution to rows [owner*rows, ...)."""
            local_seg = seg - slice_owner * rows
            valid = (local_seg >= 0) & (local_seg < rows) & (mask > 0)
            capped = jnp.where(valid, local_seg, rows)
            return jax.ops.segment_sum(
                data * valid[:, None], capped, num_segments=rows + 1
            )[:rows]

        # start with the contribution to slice (idx-1) and ring the
        # accumulator; after n_dev-1 hops each slice has passed every
        # device exactly once and slice idx lands on device idx
        owner = (idx + n_dev - 1) % n_dev
        acc = slice_partial(owner)
        for _ in range(n_dev - 1):
            acc = jax.lax.ppermute(acc, data_axis, perm)
            owner = (owner - 1) % n_dev
            acc = acc + slice_partial(owner)
        return acc

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(data_axis), P(data_axis), P(data_axis)),
        out_specs=P(data_axis),
    )(data, segment_ids, mask)


def sharded_scores_rank(
    scores: jax.Array,
    labels: jax.Array,
    obj: jax.Array,
    col_mask: jax.Array,
    mesh: Mesh,
    model_axis: str = "model",
):
    """Filtered rank with entity columns sharded over the model axis.

    Rank-by-count is a per-shard count + psum — no global argsort, no
    gather of the full score row (SURVEY.md §7 hard-part 4).
    """

    def local(scores, labels, col_mask, obj, target):
        clamped = jnp.where(labels > 0.5, -1e7, scores)
        clamped = jnp.where(col_mask[None, :] > 0, clamped, -1e30)
        # obj's own column stays clamped to -1e7 here, so ties counts
        # only *other* entities tied with the target (mid-tie rank,
        # matching train/eval.py:filtered_ranks)
        greater = jnp.sum(clamped > target[:, None], axis=1)
        ties = jnp.sum(clamped == target[:, None], axis=1)
        cnt = greater + 0.5 * ties
        return jax.lax.psum(cnt, model_axis)

    # target score: gather before sharding (obj column lives on one shard)
    b = scores.shape[0]
    target = scores[jnp.arange(b), obj]
    cols = P(None, model_axis)
    ranks = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(cols, cols, P(model_axis), P(), P()),
        out_specs=P(),
    )(scores, labels, col_mask, obj, target)
    return (1 + ranks).astype(jnp.float32)
