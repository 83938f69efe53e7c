"""Manual-SPMD sharded training (dist/spmd.py): the shard_map'd loss,
grads, and BN statistics must equal the single-device program to fp
reassociation tolerance (SURVEY.md §2.9 edge-partitioned aggregation)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_gnas_tpu.cells import CellSpec, init_alphas
from mr_gnas_tpu.data import (
    generate_sampled_graph_and_labels,
    get_adj_and_degrees,
    synthetic_kg,
)
from mr_gnas_tpu.dist import make_mesh, replicate
from mr_gnas_tpu.dist.spmd import (
    build_local_batch,
    build_local_graph,
    make_spmd_loss,
)
from mr_gnas_tpu.models import LPSupernet
from mr_gnas_tpu.models.lp import lp_search_loss, lp_search_loss_grouped

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _batch(grouped: bool, rng_seed: int = 0, neg: int = 4):
    kg = synthetic_kg(num_ent=64, num_rels=4, n_train=300)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    batch = generate_sampled_graph_and_labels(
        kg.train, 32, 0.5, kg.num_rels, adj, deg, neg, "uniform",
        np.random.default_rng(rng_seed), n_nodes_pad=64, n_fwd_pad=16,
        grouped=grouped,
    )
    return kg, batch


def _model(kg, layers: int):
    spec = CellSpec(task="lp")
    return spec, LPSupernet(
        num_ent=kg.num_ent, num_rels=kg.num_rels, layers=layers, spec=spec,
        feature_dim=16, init_fea_dim=8, num_base_r=4,
        dropout_cell=0.0, drop_aggr=0.0,  # sharded dropout masks are
        # intentionally de-correlated (make_spmd_loss folds the mesh
        # position into the key), so exact-equality tests run dropout-free
    )


def test_build_local_graph_reassembles_rows():
    """Device shards' fwd/inv/self sections concatenate back to the global
    row layout, and src_gid carries the per-row entity ids."""
    _, batch = _batch(grouped=True)
    g = batch.graph
    n_dev = 4
    lg = build_local_graph(g, n_dev)
    assert lg.spmd_axis == "data"
    assert lg.n_nodes_global == g.n_nodes
    assert lg.n_fwd == g.n_fwd // n_dev and lg.n_nodes == g.n_nodes // n_dev
    nf_l, nn_l = lg.n_fwd, lg.n_nodes
    src = np.asarray(g.src)
    got_fwd = np.concatenate([np.asarray(lg.src)[k, :nf_l] for k in range(n_dev)])
    got_inv = np.concatenate(
        [np.asarray(lg.src)[k, nf_l : 2 * nf_l] for k in range(n_dev)]
    )
    got_self = np.concatenate(
        [np.asarray(lg.src)[k, 2 * nf_l :] for k in range(n_dev)]
    )
    np.testing.assert_array_equal(got_fwd, src[: g.n_fwd])
    np.testing.assert_array_equal(got_inv, src[g.n_fwd : 2 * g.n_fwd])
    np.testing.assert_array_equal(got_self, src[2 * g.n_fwd :])
    gids = np.asarray(g.global_ids)
    want_gid = gids[np.minimum(src, g.n_nodes - 1)]
    # per-shard gid rows must match the global mapping
    for k in range(n_dev):
        np.testing.assert_array_equal(
            np.asarray(lg.src_gid)[k, :nf_l],
            want_gid[k * nf_l : (k + 1) * nf_l],
        )
        np.testing.assert_array_equal(
            np.asarray(lg.src_gid)[k, 2 * nf_l :],
            want_gid[2 * g.n_fwd + k * nn_l : 2 * g.n_fwd + (k + 1) * nn_l],
        )


@pytest.mark.parametrize("layers", [1, 2])
@pytest.mark.slow
def test_spmd_loss_grads_stats_match_single_device(layers):
    """The headline contract: shard_map'd grouped-loss training step ==
    single-device (loss, param/alpha grads, updated BN stats)."""
    kg, batch = _batch(grouped=True)
    spec, model = _model(kg, layers)
    alphas = init_alphas(jax.random.key(0), spec, layers, with_final=True)
    variables = model.init(jax.random.key(1), batch.graph, alphas, False)
    params, bstats = variables["params"], variables["batch_stats"]
    key = jax.random.key(7)
    trip = jnp.asarray(batch.triplets)
    lab = (jnp.asarray(batch.neg_heads), jnp.asarray(batch.neg_tails))

    def local_loss_fn(p, bs, a, graph, t, l, dkey, training=True):
        out = model.apply(
            {"params": p, "batch_stats": bs}, graph, a, training,
            mutable=["batch_stats"] if training else [],
            rngs={"dropout": dkey},
        )
        if training:
            (e, r), mut = out
            new_bs = mut["batch_stats"]
        else:
            (e, r), new_bs = out, bs
        nh, nt = l
        return lp_search_loss_grouped(e, r, t, nh, nt), new_bs

    def lf1(p, a):
        return local_loss_fn(p, bstats, a, batch.graph, trip, lab, key, True)

    (l1, bs1), g1 = jax.jit(
        jax.value_and_grad(lf1, argnums=(0, 1), has_aux=True)
    )(params, alphas)

    mesh = make_mesh((8,), ("data",))
    lb = build_local_batch(batch, mesh)
    sl = make_spmd_loss(mesh, local_loss_fn)
    p_rep, a_rep, bs_rep = replicate((params, alphas, bstats), mesh)

    def lf8(p, a):
        return sl(
            p, bs_rep, a, lb.graph, lb.triplets,
            (lb.neg_heads, lb.neg_tails), key, True,
        )

    (l8, bs8), g8 = jax.jit(
        jax.value_and_grad(lf8, argnums=(0, 1), has_aux=True)
    )(p_rep, a_rep)

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(bs1), jax.tree.leaves(bs8)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_spmd_eval_forward_matches_single_device():
    """Eval-mode (running-stat BN) sharded forward == single-device."""
    kg, batch = _batch(grouped=False)
    spec, model = _model(kg, 1)
    alphas = init_alphas(jax.random.key(0), spec, 1, with_final=True)
    variables = model.init(jax.random.key(1), batch.graph, alphas, False)
    params, bstats = variables["params"], variables["batch_stats"]
    key = jax.random.key(3)
    trip = jnp.asarray(batch.triplets)
    lab = jnp.asarray(batch.labels)

    def local_loss_fn(p, bs, a, graph, t, l, dkey, training=True):
        e, r = model.apply(
            {"params": p, "batch_stats": bs}, graph, a, False,
            rngs={"dropout": dkey},
        )
        return lp_search_loss(e, r, t, l), bs

    l1, _ = local_loss_fn(params, bstats, alphas, batch.graph, trip, lab, key)

    mesh = make_mesh((8,), ("data",))
    lb = build_local_batch(batch, mesh)
    sl = make_spmd_loss(mesh, local_loss_fn)
    p_rep, a_rep, bs_rep = replicate((params, alphas, bstats), mesh)
    l8, _ = jax.jit(
        lambda p, a: sl(p, bs_rep, a, lb.graph, lb.triplets, lb.labels, key, False)
    )(p_rep, a_rep)
    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)


@pytest.mark.slow
def test_spmd_retrain_step_matches_single_device():
    """Compiled-genotype (retrain) path: the shard_map'd full-graph
    forward + 1-vs-N BCE step equals single-device — loss, grads, and
    row-sharded filtered ranks (models/lp.LPNetwork + cells/compiled.py
    under graph.spmd_axis)."""
    from jax.sharding import PartitionSpec as P

    from mr_gnas_tpu.cells.genotype import parse_reference_genotypes
    from mr_gnas_tpu.dist.spmd import build_local_graph, local_view, shard_local_tree
    from mr_gnas_tpu.graph import build_rel_graph
    from mr_gnas_tpu.models import LPNetwork, bce_probs_loss
    from mr_gnas_tpu.train.eval import filtered_ranks

    kg = synthetic_kg(num_ent=64, num_rels=4, n_train=300)
    graph = build_rel_graph(kg.train, kg.num_ent, kg.num_rels, pad_multiple=8)
    geno = parse_reference_genotypes(
        "[Genotype(alpha_cell=[('pre_sub', 1, 0), ('f_sparse_comp', 2, 1), "
        "('f_sparse_comp', 3, 2), ('a_max', 4, 2), ('a_mean', 5, 3), "
        "('f_sparse_last', 6, 5), ('f_sparse_last', 7, 5)], "
        "concat_node=[4, 5, 6, 7], score_func='sf_DisMult')]"
    )
    model = LPNetwork(
        genotypes=tuple(geno), num_ent=kg.num_ent, num_rels=kg.num_rels,
        feature_dim=16, init_fea_dim=8, num_base_r=4,
        dropout_cell=0.0, drop_aggr=0.0,
    )
    b = 16
    subj = jnp.asarray(kg.train[:b, 0])
    rel = jnp.asarray(kg.train[:b, 1])
    obj = jnp.asarray(kg.train[:b, 2])
    labels = jnp.zeros((b, graph.n_nodes)).at[jnp.arange(b), obj].set(1.0)
    row_mask = jnp.ones((b,))
    cmask = graph.node_mask
    variables = model.init(jax.random.key(0), graph, subj, rel, False)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    key = jax.random.key(3)

    def loss1(p):
        probs, mut = model.apply(
            {"params": p, "batch_stats": bstats}, graph, subj, rel, True,
            mutable=["batch_stats"], rngs={"dropout": key},
        )
        return bce_probs_loss(probs, labels, row_mask, cmask), mut["batch_stats"]

    (l1, bs1), g1 = jax.jit(
        jax.value_and_grad(loss1, has_aux=True)
    )(params)
    probs1 = model.apply(
        {"params": params, "batch_stats": bstats}, graph, subj, rel, False
    )
    ranks1 = filtered_ranks(probs1, labels, obj, cmask)

    mesh = make_mesh((8,), ("data",))
    gstack = shard_local_tree(build_local_graph(graph, 8), mesh)
    p_rep, bs_rep = replicate((params, bstats), mesh)
    gspec = jax.tree.map(lambda _: P("data"), gstack)

    def loss8(p):
        def f(p, bs, gstack, subj, rel, labels, row_mask, cmask):
            g = local_view(gstack)
            probs, mut = model.apply(
                {"params": p, "batch_stats": bs}, g, subj, rel, True,
                mutable=["batch_stats"], rngs={"dropout": key},
            )
            l = bce_probs_loss(probs, labels, row_mask, cmask, axis="data")
            return l, mut["batch_stats"]

        return jax.shard_map(
            f, mesh=mesh,
            in_specs=(P(), P(), gspec, P("data"), P("data"), P("data"),
                      P("data"), P()),
            out_specs=(P(), P()),
        )(p, bs_rep, gstack, subj, rel, labels, row_mask, cmask)

    (l8, bs8), g8 = jax.jit(jax.value_and_grad(loss8, has_aux=True))(p_rep)

    def ranks8_fn(p):
        def f(p, bs, gstack, subj, rel, obj, labels, cmask):
            g = local_view(gstack)
            probs = model.apply(
                {"params": p, "batch_stats": bs}, g, subj, rel, False
            )
            return filtered_ranks(probs, labels, obj, cmask)

        return jax.shard_map(
            f, mesh=mesh,
            in_specs=(P(), P(), gspec, P("data"), P("data"), P("data"),
                      P("data"), P()),
            out_specs=P("data"),
        )(p, bs_rep, gstack, subj, rel, obj, labels, cmask)

    ranks8 = jax.jit(ranks8_fn)(p_rep)

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ranks1), np.asarray(ranks8))
    for a, b_ in zip(jax.tree.leaves(bs1), jax.tree.leaves(bs8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5)
    for a, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=3e-5)


@pytest.mark.slow
def test_spmd_nc_retrain_step_matches_single_device():
    """NC compiled-genotype path under SPMD blocks
    (dist/spmd.build_local_blocks): loss / BN stats match single-device
    tightly; grads match at the LP path's exact tolerances
    (rtol=2e-4, atol=3e-5 elementwise — the atol absorbs the near-zero
    directions: OpModule linear biases and the last cell's bn_out scale
    have |grad| ~ 1e-7, pure float noise under any reduction order).
    The fixture dedupes (src, etype, dst) rows so the cross-device
    max-merge's all-tied-devices cotangent convention (dist/spmd.py
    docstring) cannot smear a_max gradients vs single-device."""
    from jax.sharding import PartitionSpec as P

    from mr_gnas_tpu.cells.genotype import parse_reference_genotypes
    from mr_gnas_tpu.data import CSRGraph, build_blocks
    from mr_gnas_tpu.data.rdf import synthetic_nc
    from mr_gnas_tpu.dist.spmd import (
        build_local_blocks,
        make_spmd_loss_nc,
        shard_local_tree,
    )
    from mr_gnas_tpu.models import NCNetwork, nc_loss

    ds = synthetic_nc()
    tri = np.unique(np.stack([ds.src, ds.etype, ds.dst], 1), axis=0)
    csr = CSRGraph(tri[:, 0], tri[:, 2], tri[:, 1], ds.num_nodes)
    seeds = ds.target_ids[:16]
    blocks, sp = build_blocks(csr, seeds, 2)
    geno = parse_reference_genotypes(
        "[Genotype(alpha_cell=[('pre_sub', 1, 0), ('f_sparse', 2, 1), "
        "('f_dense', 3, 2), ('a_max', 4, 2), ('a_mean', 5, 3), "
        "('f_sparse_last', 6, 5), ('f_identity', 7, 4)], "
        "concat_node=[4, 5, 6, 7], score_func=None)]"
    )
    model = NCNetwork(
        genotypes=tuple(geno * 2), num_nodes=ds.num_nodes,
        num_classes=ds.num_classes, num_rels=ds.num_rels,
        feature_dim=16, init_fea_dim=8, num_base_r=4, dropout=0.0,
    )
    variables = model.init(jax.random.key(0), blocks, False)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    labels = jnp.asarray(ds.labels[:16])
    mask = jnp.ones((16,))
    spj = jnp.asarray(sp)
    key = jax.random.key(3)

    def local_loss(p, bs, _a, blks, sp_, lab, m, dk):
        logits, mut = model.apply(
            {"params": p, "batch_stats": bs}, blks, True,
            mutable=["batch_stats"], rngs={"dropout": dk},
        )
        return nc_loss(logits[sp_], lab, m), mut["batch_stats"]

    (l1, bs1), g1 = jax.jit(
        jax.value_and_grad(
            lambda p: local_loss(p, bstats, None, blocks, spj, labels, mask, key),
            has_aux=True,
        )
    )(params)

    mesh = make_mesh((8,), ("data",))
    bstack = shard_local_tree(build_local_blocks(blocks, 8), mesh)
    sl = make_spmd_loss_nc(mesh, local_loss)
    p_rep, bs_rep = replicate((params, bstats), mesh)
    (l8, bs8), g8 = jax.jit(
        jax.value_and_grad(
            lambda p: sl(p, bs_rep, None, bstack, spj, labels, mask, key),
            has_aux=True,
        )
    )(p_rep)

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(bs1), jax.tree.leaves(bs8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g8),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=3e-5,
            err_msg=jax.tree_util.keystr(k),
        )


def test_local_batch_divisibility_error():
    kg, batch = _batch(grouped=True)
    batch = dataclasses.replace(batch, triplets=batch.triplets[:30])
    mesh = make_mesh((8,), ("data",))
    with pytest.raises(ValueError, match="divisible"):
        build_local_batch(batch, mesh)
