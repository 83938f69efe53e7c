"""Manual-SPMD sharded training: per-device local graphs inside shard_map.

Round-2's annotation path (dist/partition.py) proved the mesh wiring
correct but slow: every middle-stage segment reduce produced a REPLICATED
[N, D] tensor via a full all-reduce, all node-space compute ran
replicated on every device, and the Pallas kernels auto-disabled under a
mesh. This module is the fast formulation (SURVEY §2.9's edge-partitioned
aggregation design; the graph analog of sequence parallelism):

  * device k owns contiguous slices of the relation-sorted forward and
    inverse edge sections plus node slice k (its self rows) — the whole
    row space of the cell is device-local, so the zero/first gate stages
    and the BN-mix / fused-agg Pallas kernels run per shard unchanged;
  * the edge->node boundary merges LOCAL [N, D] partials with
    reduce-scatter (sum/mean numerators, counts) and an all-to-all max
    exchange — each device keeps only its node slice, so the middle BN,
    last stage, concat linear and the shared output BN all run on N/n
    rows instead of replicated N rows;
  * ONE all-gather per layer rebuilds the replicated [N, D] node table
    for the next layer's ``ent_emb[src]`` re-gather (and the final score
    gathers) — the only full-table collective left;
  * batch-norm statistics are psum'd (sums + counts), so the math is
    IDENTICAL to the single-device program (tests/test_spmd.py asserts
    loss and grads match to fp-reassociation tolerance).

Per-layer collective inventory (vs the annotation path's 3M full [N, D]
all-reduces + fully replicated node compute): M x reduce-scatter([N, 2D])
+ M x all-to-all([N, D]) + 1 x all-gather([N, D]) + O(K*D) stat psums.

Autodiff: everything runs under ``jax.shard_map`` with the default
replication (vma) checking, whose transpose rules make grads of
replicated params come out exact (validated: psum/psum_scatter/
all_gather/all_to_all and custom_vjp Pallas kernels — compiled Mosaic on
TPU; interpret-mode Pallas cannot trace under shard_map, so CPU meshes
use the XLA composite aggregation, which shares all merge code here).

Cross-device max-tie convention: :func:`max_merge_nodes` routes the
cotangent to EVERY device whose partial equals the global max (matching
the Pallas kernels' every-tied-row convention); within a device the
local op's own convention applies. Exact grad equality with a single
device therefore requires no duplicate (src, rel, dst) edge rows with
positive pre-activations — ties at relu zeros get zero gradient either
way.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mr_gnas_tpu.graph.container import RelGraph

_NEG = -1e30


# ---------------------------------------------------------------------------
# merge collectives (used by cells/fused.py under graph.spmd_axis)
# ---------------------------------------------------------------------------


def scatter_sum_nodes(x: jax.Array, axis: str) -> jax.Array:
    """Reduce-scatter a [..., N_glob, D] partial over its node axis ->
    [..., N_glob/n, D], device k keeping node block k."""
    return jax.lax.psum_scatter(x, axis, scatter_dimension=x.ndim - 2, tiled=True)


def scatter_sum_vec(x: jax.Array, axis: str) -> jax.Array:
    """Reduce-scatter a [N_glob] vector (per-node counts)."""
    return jax.lax.psum_scatter(x, axis, scatter_dimension=x.ndim - 1, tiled=True)


def _a2a_nodes(x: jax.Array, axis: str, n_dev: int) -> jax.Array:
    *lead, n_glob, d = x.shape
    xr = x.reshape(*lead, n_dev, n_glob // n_dev, d)
    k = len(lead)
    return jax.lax.all_to_all(xr, axis, split_axis=k, concat_axis=k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def max_merge_nodes(axis: str, n_dev: int, x: jax.Array) -> jax.Array:
    """Merge [..., N_glob, D] per-device max partials (``_NEG``-filled for
    locally-empty segments) into this device's node slice
    [..., N_glob/n, D] via one all-to-all + local max.

    Backward: the cotangent routes to EVERY device whose partial equals
    the merged max (the all-tied-rows convention of the Pallas segment
    kernels), via the transposed all-to-all.
    """
    r = _a2a_nodes(x, axis, n_dev)
    return jnp.max(r, axis=-3)


def _max_merge_fwd(axis, n_dev, x):
    r = _a2a_nodes(x, axis, n_dev)
    out = jnp.max(r, axis=-3)
    return out, (r, out)


def _max_merge_bwd(axis, n_dev, res, g):
    r, out = res
    dr = jnp.where(r == out[..., None, :, :], g[..., None, :, :], 0.0)
    k = r.ndim - 3
    back = jax.lax.all_to_all(dr, axis, split_axis=k, concat_axis=k)
    *lead, n_dev_, n_loc, d = back.shape
    return (back.reshape(*lead, n_dev_ * n_loc, d),)


max_merge_nodes.defvjp(_max_merge_fwd, _max_merge_bwd)


def all_gather_nodes(x: jax.Array, axis: str) -> jax.Array:
    """[N_loc, D] node slice -> replicated-content [N_glob, D]."""
    return jax.lax.all_gather(x, axis, axis=0, tiled=True)


# ---------------------------------------------------------------------------
# host-side local graph / batch construction
# ---------------------------------------------------------------------------


def build_local_graph(
    graph: RelGraph,
    n_dev: int,
    axis: str = "data",
    pallas_csr: bool = False,
    bn: int = 128,
    rb: int | None = None,
) -> RelGraph:
    """Split a padded RelGraph into ``n_dev`` per-device local graphs,
    stacked on a leading device axis (shard with :func:`shard_local_tree`,
    consume inside shard_map via :func:`local_view`).

    Device k's rows: fwd slice k | inv slice k | self rows of node block
    k. ``src``/``dst`` keep GLOBAL node ids; ``src_gid`` carries the
    per-row entity ids so layer 0 needs no global_ids array. When
    ``pallas_csr``, each shard gets its own blocked CSR over its edge
    rows (targets: ALL global nodes), statically padded to shared bounds
    so every shard (and every sampled graph of the config) compiles to
    one program.
    """
    nf, nn = graph.n_fwd, graph.n_nodes
    if nf % n_dev or nn % n_dev:
        raise ValueError(
            f"n_fwd {nf} and n_nodes {nn} must divide the data axis {n_dev}"
        )
    nf_l, nn_l = nf // n_dev, nn // n_dev
    get = lambda a: np.asarray(jax.device_get(a))
    src, dst = get(graph.src), get(graph.dst)
    etype, norm = get(graph.etype), get(graph.norm)
    row_mask, node_mask = get(graph.row_mask), get(graph.node_mask)
    gids = get(graph.global_ids)
    # per-row entity ids; self rows map to their own node's entity
    src_gid = gids[np.minimum(src, nn - 1)]

    def shard_rows(a):
        out = []
        for k in range(n_dev):
            fwd = a[k * nf_l : (k + 1) * nf_l]
            inv = a[nf + k * nf_l : nf + (k + 1) * nf_l]
            own = a[2 * nf + k * nn_l : 2 * nf + (k + 1) * nn_l]
            out.append(np.concatenate([fwd, inv, own]))
        return np.stack(out)

    l_src = shard_rows(src)
    l_dst = shard_rows(dst)
    l_etype = shard_rows(etype)
    l_norm = shard_rows(norm)
    l_mask = shard_rows(row_mask)
    l_gid = shard_rows(src_gid)
    l_nmask = np.stack(
        [node_mask[k * nn_l : (k + 1) * nn_l] for k in range(n_dev)]
    )

    csr = None
    if pallas_csr:
        from mr_gnas_tpu.kernels.pallas_segment import (
            CSRMeta,
            build_blocked_csr,
            pad_blocked_csr,
        )

        e_l = 2 * nf_l
        n_blocks = max(1, -(-nn // bn))
        if rb is None:
            # deterministic across shards and samples (static dims only)
            avg_rows = e_l / n_blocks
            rb = 64
            while rb < min(512, 2 * avg_rows):
                rb *= 2
        chunks_pad = n_blocks + -(-e_l // rb)
        rows_pad = e_l + n_blocks * rb + rb
        metas = []
        for k in range(n_dev):
            c = build_blocked_csr(
                l_dst[k, :e_l], nn, mask=l_mask[k, :e_l], bn=bn, rb=rb
            )
            metas.append(
                CSRMeta.from_blocked(pad_blocked_csr(c, chunks_pad, rows_pad))
            )
        csr = jax.tree.map(lambda *xs: jnp.stack(xs), *metas)

    return RelGraph(
        src=jnp.asarray(l_src),
        dst=jnp.asarray(l_dst),
        etype=jnp.asarray(l_etype),
        norm=jnp.asarray(l_norm),
        row_mask=jnp.asarray(l_mask),
        global_ids=jnp.zeros((n_dev, 1), jnp.int32),  # unused in local view
        node_mask=jnp.asarray(l_nmask),
        n_fwd=nf_l,
        n_nodes=nn_l,
        num_rels=graph.num_rels,
        csr=csr,
        src_csr=None,
        spmd_axis=axis,
        n_nodes_global=nn,
        src_gid=jnp.asarray(l_gid),
    )


def shard_local_tree(tree, mesh: Mesh, axis: str = "data"):
    """Put every array leaf with its leading device axis sharded over
    ``axis`` (leaves of a stacked local graph / batch). Multihost-safe:
    each process materializes only the shards its devices own
    (dist/multihost.global_put) — the sampler is identically seeded
    across hosts, so every host can build the full stacked tree."""
    from mr_gnas_tpu.dist.multihost import global_put

    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: global_put(x, sh), tree)


def pspec_tree(tree, axis: str = "data"):
    """Matching in_specs: P(axis) on the leading device axis of every leaf."""
    return jax.tree.map(lambda _: P(axis), tree)


def local_view(tree):
    """Inside shard_map: strip each leaf's leading (now size-1) device axis."""
    return jax.tree.map(lambda x: jnp.squeeze(x, axis=0), tree)


def build_local_blocks(blocks, n_dev: int, axis: str = "data"):
    """NC MFG blocks -> per-device local Blocks stacked on a leading
    device axis (the NC analog of :func:`build_local_graph`).

    Per block: edge rows re-pad to a multiple of ``n_dev`` and shard
    contiguously; dst nodes re-pad and split into contiguous node
    blocks. ``dst_pos`` keeps GLOBAL positions (padded edges route to
    the global dummy segment n_dst_pad); ``src_pos`` keeps global
    positions into the PREVIOUS block's dst space (consumed against the
    per-layer all-gathered node table, models/nc.py). BN masks stay
    exact, so sharded == single-device on all real rows."""
    from mr_gnas_tpu.graph.container import Block

    def round_up(x, m):
        return -(-x // m) * m

    out = []
    for blk in blocks:
        ne, nd = blk.n_edges, blk.n_dst
        ne_p, nd_p = round_up(ne, n_dev), round_up(nd, n_dev)
        ne_l, nd_l = ne_p // n_dev, nd_p // n_dev

        def pad_rows(a, n, fill):
            a = np.asarray(jax.device_get(a))
            x = np.full((n, *a.shape[1:]), fill, a.dtype)
            x[: len(a)] = a
            return x

        dst_pos = pad_rows(blk.dst_pos, ne_p, nd_p)
        # existing padded edges pointed at the OLD dummy segment n_dst
        dst_pos[dst_pos == nd] = nd_p
        e_arrs = {
            "src_gid": pad_rows(blk.src_gid, ne_p, 0),
            "src_pos": pad_rows(blk.src_pos, ne_p, 0),
            "dst_pos": dst_pos,
            "etype": pad_rows(blk.etype, ne_p, 0),
            "edge_mask": pad_rows(blk.edge_mask, ne_p, 0.0),
        }
        d_arrs = {
            "dst_gid": pad_rows(blk.dst_gid, nd_p, 0),
            "dst_mask": pad_rows(blk.dst_mask, nd_p, 0.0),
        }
        out.append(
            Block(
                **{
                    k: jnp.asarray(v.reshape(n_dev, ne_l, *v.shape[1:]))
                    for k, v in e_arrs.items()
                },
                **{
                    k: jnp.asarray(v.reshape(n_dev, nd_l, *v.shape[1:]))
                    for k, v in d_arrs.items()
                },
                n_edges=ne_l,
                n_dst=nd_l,
                spmd_axis=axis,
                n_dst_global=nd_p,
            )
        )
    return out


def make_spmd_loss_nc(mesh: Mesh, local_loss_fn, axis: str = "data"):
    """NC analog of :func:`make_spmd_loss`: wrap a ``(params, bstats,
    alphas, blocks, seed_pos, labels, mask, dkey) -> (loss, bstats)``
    loss into its shard_map'd form. Blocks arrive stacked
    (:func:`build_local_blocks` + :func:`shard_local_tree`); seed
    tensors are replicated (the final logits are all-gathered inside
    the model, so seed_pos indexes the global dst table)."""
    from jax.sharding import PartitionSpec as P

    def loss_fn(params, bstats, alphas, blocks, seed_pos, labels, mask, dkey):
        bspec = jax.tree.map(lambda _: P(axis), blocks)

        def f(params, bstats, alphas, bstack, seed_pos, labels, mask, dkey):
            blks = local_view(bstack)
            dk = jax.random.fold_in(dkey, jax.lax.axis_index(axis))
            loss, bs = local_loss_fn(
                params, bstats, alphas, blks, seed_pos, labels, mask, dk
            )
            # the loss is computed from all-gathered logits — identical
            # on every device; pmean makes that provable to the vma check
            return jax.lax.pmean(loss, axis), bs

        return jax.shard_map(
            f, mesh=mesh,
            in_specs=(P(), P(), P(), bspec, P(), P(), P(), P()),
            out_specs=(P(), P()),
        )(params, bstats, alphas, blocks, seed_pos, labels, mask, dkey)

    return loss_fn


def make_spmd_loss(mesh: Mesh, local_loss_fn, axis: str = "data"):
    """Wrap a ``(params, bstats, alphas, graph, trip, lab, dkey, training)
    -> (loss, bstats)`` loss into its shard_map'd manual-SPMD equivalent.

    Inputs: replicated model state + a :class:`LocalBatch`'s stacked
    local graph / triplet / negative trees (leading device axis sharded
    over ``axis``). Inside the map each device squeezes its shard, folds
    the mesh position into the dropout key (de-correlating masks across
    shards), and runs the UNCHANGED local loss — the sharded-local graph
    (``graph.spmd_axis``) makes the cells psum BN statistics and merge
    aggregation partials, so the pmean'd loss equals the single-device
    loss to fp-reassociation tolerance (tests/test_spmd.py). The returned
    batch_stats are device-invariant (psum'd stats), and grads of the
    replicated state auto-psum through the shard_map transpose. Mesh axes
    other than ``axis`` (e.g. 'model') see replicated inputs and stay
    replicated in the TRAIN step; the 'model' axis is consumed by the
    TP-analog eval/serving paths (lp_train's column-sharded 1-vs-N
    decode via ``LPNetwork.logits_cols`` + ``filtered_ranks_cols``, and
    ``serve.Predictor(mesh=...)``'s row-sharded entity table).
    """
    from jax.sharding import PartitionSpec as P

    def loss_fn(params, bstats, alphas, graph, trip, lab, dkey, training=True):
        gspec = jax.tree.map(lambda _: P(axis), graph)
        lspec = jax.tree.map(lambda _: P(axis), lab)

        def f(params, bstats, alphas, gstack, trip_s, lab_s, dkey):
            g = local_view(gstack)
            t = jnp.squeeze(trip_s, 0)
            l = jax.tree.map(lambda x: jnp.squeeze(x, 0), lab_s)
            dk = jax.random.fold_in(dkey, jax.lax.axis_index(axis))
            loss, bs = local_loss_fn(params, bstats, alphas, g, t, l, dk, training)
            return jax.lax.pmean(loss, axis), bs

        return jax.shard_map(
            f, mesh=mesh,
            in_specs=(P(), P(), P(), gspec, P(axis), lspec, P()),
            out_specs=(P(), P()),
        )(params, bstats, alphas, graph, trip, lab, dkey)

    return loss_fn


@dataclasses.dataclass
class LocalBatch:
    """A SampledBatch resharded for the manual-SPMD step: the stacked
    local graph plus row-sharded triplets/negatives (the DP analog riding
    the same data axis — each device scores its triplet slice)."""

    graph: RelGraph
    triplets: jax.Array  # [n_dev, T/n, 3]
    labels: jax.Array | None
    neg_heads: jax.Array | None
    neg_tails: jax.Array | None
    denom: float  # global mean denominator for the sharded loss


def _shard_leading(a, n_dev, what):
    a = np.asarray(a)
    if a.shape[0] % n_dev:
        raise ValueError(
            f"{what} count {a.shape[0]} must be divisible by the data axis "
            f"{n_dev} under --mesh-shape (pick a divisible batch size)"
        )
    return jnp.asarray(a.reshape(n_dev, a.shape[0] // n_dev, *a.shape[1:]))


def build_local_batch(
    batch, mesh: Mesh, axis: str = "data", pallas_csr: bool = False
) -> LocalBatch:
    """SampledBatch -> LocalBatch (host-side split + device_put)."""
    n_dev = mesh.shape[axis]
    graph = build_local_graph(batch.graph, n_dev, axis, pallas_csr=pallas_csr)
    trip = _shard_leading(batch.triplets, n_dev, "triplets")
    p_total = int(np.asarray(batch.triplets).shape[0])
    if batch.neg_heads is not None:
        nh = _shard_leading(batch.neg_heads, n_dev, "negative groups")
        nt = _shard_leading(batch.neg_tails, n_dev, "negative groups")
        n_neg = batch.neg_heads.shape[1] + batch.neg_tails.shape[1]
        denom = float(p_total * (1 + n_neg))
        lab = None
    else:
        nh = nt = None
        lab = _shard_leading(batch.labels, n_dev, "labels")
        denom = float(p_total)
    out = LocalBatch(
        graph=graph, triplets=trip, labels=lab, neg_heads=nh, neg_tails=nt,
        denom=denom,
    )
    sharded = shard_local_tree(
        {"graph": out.graph, "trip": out.triplets, "lab": out.labels,
         "nh": out.neg_heads, "nt": out.neg_tails},
        mesh, axis,
    )
    return LocalBatch(
        graph=sharded["graph"], triplets=sharded["trip"], labels=sharded["lab"],
        neg_heads=sharded["nh"], neg_tails=sharded["nt"], denom=denom,
    )
