"""Full-model per-layer parity vs the torch oracle of the reference.

The oracle (tests/oracle_torch.py) replicates the reference's networks
line-by-line in torch with DGL's segment reductions replaced by scatter
ops; identical weights are transplanted from our flax models and the
per-layer activations are asserted allclose — the BASELINE.md north-star
"numerical parity" row, measured.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mr_gnas_tpu.cells.genotype import Genotype, parse_reference_genotypes
from mr_gnas_tpu.graph import build_rel_graph
from mr_gnas_tpu.models import LPNetwork

import oracle_torch as oracle

PUBLISHED = (
    "Genotype(alpha_cell=[('pre_sub', 1, 0), ('f_sparse_comp', 2, 1), "
    "('f_sparse_comp', 3, 2), ('a_max', 4, 2), ('a_max', 5, 3), "
    "('f_sparse_last', 6, 5), ('f_sparse_last', 7, 5)], "
    "concat_node=[4, 5, 6, 7], score_func='sf_DisMult')"
)
# exercises the remaining LP ops: pre_mult (BN-skip quirk), f_comp,
# f_dense_comp, a_mean, a_sum, f_dense_last, f_identity
ALT = (
    "Genotype(alpha_cell=[('pre_mult', 1, 0), ('f_comp', 2, 1), "
    "('f_dense_comp', 3, 2), ('a_mean', 4, 2), ('a_sum', 5, 3), "
    "('f_dense_last', 6, 4), ('f_identity', 7, 6)], "
    "concat_node=[4, 5, 6, 7], score_func='sf_DisMult')"
)

N_ENT, N_RELS, N_TRIP = 29, 4, 55
D, INIT_D, N_BASE = 16, 12, 5


def _toy_kg(rng):
    # leave some entities untouched so zero-in-degree semantics are hit
    trip = np.stack(
        [
            rng.integers(0, N_ENT - 4, N_TRIP),
            rng.integers(0, N_RELS, N_TRIP),
            rng.integers(0, N_ENT - 4, N_TRIP),
        ],
        axis=1,
    )
    return trip


def _build_pair(rng, genotype_str, layers=2, pad_multiple=8):
    genos = parse_reference_genotypes(genotype_str) * layers
    trip = _toy_kg(rng)
    graph = build_rel_graph(trip, N_ENT, N_RELS, pad_multiple=pad_multiple)
    model = LPNetwork(
        genotypes=tuple(genos),
        num_ent=N_ENT,
        num_rels=N_RELS,
        feature_dim=D,
        init_fea_dim=INIT_D,
        num_base_r=N_BASE,
        dropout_cell=0.0,
        drop_aggr=0.0,
    )
    z = jnp.zeros((4,), jnp.int32)
    variables = model.init(jax.random.key(7), graph, z, z, False)

    tg = oracle.LPGraph(trip, N_ENT, N_RELS)
    torch.manual_seed(0)
    onet = oracle.LPNetworkOracle(genos, N_ENT, N_RELS, D, INIT_D, N_BASE)
    oracle.load_lp_network_from_flax(onet, jax.device_get(variables), genos)
    return model, variables, graph, onet, tg, genos


@pytest.mark.parametrize("geno_str", [PUBLISHED, ALT], ids=["published", "alt-ops"])
def test_lp_retrain_per_layer_parity_eval(rng, geno_str):
    """Per-layer activations + final 1-vs-N scores allclose in eval mode."""
    model, variables, graph, onet, tg, genos = _build_pair(rng, geno_str)

    _, _, trace = model.apply(
        variables, graph, False, method=LPNetwork.encode_trace
    )
    onet.eval()
    with torch.no_grad():
        _, _, otrace = onet.encode(tg)

    assert len(trace) == len(otrace) == 2
    for i, ((ent_j, rel_j), (ent_t, rel_t)) in enumerate(zip(trace, otrace)):
        np.testing.assert_allclose(
            np.asarray(ent_j)[:N_ENT],
            ent_t.numpy(),
            rtol=1e-4,
            atol=1e-5,
            err_msg=f"layer {i} entity embeddings",
        )
        np.testing.assert_allclose(
            np.asarray(rel_j), rel_t.numpy(), rtol=1e-4, atol=1e-5,
            err_msg=f"layer {i} relation embeddings",
        )

    subj = np.asarray(rng.integers(0, N_ENT, 8), np.int32)
    relq = np.asarray(rng.integers(0, 2 * N_RELS, 8), np.int32)
    scores = model.apply(
        variables, graph, jnp.asarray(subj), jnp.asarray(relq), False
    )
    with torch.no_grad():
        oscores = onet(tg, torch.tensor(subj.astype(np.int64)), torch.tensor(relq.astype(np.int64)))
    np.testing.assert_allclose(
        np.asarray(scores)[:, :N_ENT], oscores.numpy(), rtol=1e-4, atol=1e-5
    )


NC_DEFAULT = (
    "[Genotype(alpha_cell=[('pre_sub', 1, 0), ('f_dense', 2, 1), "
    "('f_sparse', 3, 2), ('f_identity', 4, 3), ('a_sum', 5, 2), "
    "('a_sum', 6, 3), ('a_mean', 7, 4), ('f_dense_last', 8, 7), "
    "('f_sparse_last', 9, 7), ('f_sparse_last', 10, 5)], "
    "concat_node=[5, 6, 7, 8, 9, 10]), "
    "Genotype(alpha_cell=[('pre_sub', 1, 0), ('f_sparse', 2, 1), "
    "('f_identity', 3, 2), ('f_identity', 4, 1), ('a_max', 5, 2), "
    "('a_mean', 6, 3), ('a_mean', 7, 4), ('f_sparse_last', 8, 7), "
    "('f_sparse_last', 9, 8), ('f_identity', 10, 9)], "
    "concat_node=[5, 6, 7, 8, 9, 10])]"
)


@pytest.mark.slow
def test_nc_retrain_per_layer_parity(rng):
    """NC fixed-genotype network over real 2-hop blocks matches the torch
    oracle of models/model.py per layer (reference default AIFB genotype),
    eval and train mode."""
    from mr_gnas_tpu.data.blocks import CSRGraph, build_blocks
    from mr_gnas_tpu.models import NCNetwork

    n_nodes, n_rels, n_edges, n_classes = 26, 4, 70, 3
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    etype = rng.integers(0, n_rels, n_edges)
    seeds = np.unique(rng.integers(0, n_nodes, 7))

    genos = parse_reference_genotypes(NC_DEFAULT)
    csr = CSRGraph(src, dst, etype, n_nodes)
    blocks, seed_pos = build_blocks(csr, seeds, layers=2)
    oblocks = oracle.build_nc_blocks(src, dst, etype, seeds, layers=2)

    model = NCNetwork(
        genotypes=tuple(genos),
        num_nodes=n_nodes,
        num_classes=n_classes,
        num_rels=n_rels,
        feature_dim=D,
        init_fea_dim=INIT_D,
        num_base_r=N_BASE,
    )
    variables = model.init(jax.random.key(5), blocks, False)
    torch.manual_seed(0)
    onet = oracle.NCNetworkOracle(
        genos, n_nodes, n_classes, n_rels, D, INIT_D, N_BASE
    )
    oracle.load_nc_network_from_flax(onet, jax.device_get(variables), genos)

    for training in (False, True):
        kw = dict(capture_intermediates=lambda mdl, name: name == "__call__")
        if training:
            kw.update(mutable=["batch_stats", "intermediates"], rngs={"dropout": jax.random.key(0)})
        else:
            kw.update(mutable=["intermediates"])
        logits, mut = model.apply(variables, blocks, training, **kw)
        onet.train(training)
        with torch.no_grad():
            ologits, otrace = onet(oblocks)

        inter = mut["intermediates"]
        for i in range(2):
            mine = np.asarray(inter[f"cell_{i}"]["__call__"][0])
            want = otrace[i].numpy()
            # align by global dst node id (frontier orders may differ)
            mine_gid = np.asarray(blocks[i].dst_gid)
            order = {int(g): p for p, g in enumerate(mine_gid)}
            idx = [order[int(g)] for g in oblocks[i].dst_nodes]
            np.testing.assert_allclose(
                mine[idx], want, rtol=2e-4, atol=1e-5,
                err_msg=f"NC layer {i} (training={training})",
            )
        # final logits at the seed rows
        mine_gid = np.asarray(blocks[-1].dst_gid)
        order = {int(g): p for p, g in enumerate(mine_gid)}
        idx = [order[int(g)] for g in oblocks[-1].dst_nodes]
        np.testing.assert_allclose(
            np.asarray(logits)[idx], ologits.numpy(), rtol=2e-4, atol=1e-5,
            err_msg=f"NC logits (training={training})",
        )


def test_lp_supernet_per_layer_parity(rng):
    """The weight-sharing supernet forward (all 44 mixed-op pipelines/cell)
    matches the torch oracle of model_search_lp.py per layer, eval and
    train mode, with identical alphas."""
    from mr_gnas_tpu.cells.genotype import CellSpec, init_alphas, layer_weights
    from mr_gnas_tpu.models import LPSupernet

    trip = _toy_kg(rng)
    graph = build_rel_graph(trip, N_ENT, N_RELS, pad_multiple=8)
    spec = CellSpec(task="lp", zero_nodes=1, first_nodes=2, last_nodes=2)
    layers = 2
    model = LPSupernet(
        num_ent=N_ENT,
        num_rels=N_RELS,
        layers=layers,
        spec=spec,
        feature_dim=D,
        init_fea_dim=INIT_D,
        num_base_r=N_BASE,
        dropout_cell=0.0,
        drop_aggr=0.0,
        fused=False,
    )
    alphas = init_alphas(jax.random.key(3), spec, layers)
    variables = model.init(jax.random.key(11), graph, alphas, False)

    tg = oracle.LPGraph(trip, N_ENT, N_RELS)
    onet = oracle.LPSupernetOracle(N_ENT, N_RELS, layers, 2, 2, D, INIT_D, N_BASE)
    oracle.load_lp_supernet_from_flax(onet, jax.device_get(variables))

    lw = []
    for i in range(layers):
        w = layer_weights(alphas, spec, i)
        lw.append(
            tuple(
                torch.tensor(np.asarray(w[s])) for s in ("zero", "first", "middle", "last")
            )
        )

    for training in (False, True):
        kw = (
            dict(mutable=["batch_stats"], rngs={"dropout": jax.random.key(0)})
            if training
            else {}
        )
        out = model.apply(variables, graph, alphas, training, **kw)
        ent_j, rel_j = out[0] if training else out
        onet.train(training)
        with torch.no_grad():
            ent_t, rel_t, _ = onet(tg, lw)
        np.testing.assert_allclose(
            np.asarray(ent_j)[:N_ENT], ent_t.numpy(), rtol=2e-4, atol=1e-5,
            err_msg=f"supernet output (training={training})",
        )
        np.testing.assert_allclose(
            np.asarray(rel_j), rel_t.numpy(), rtol=1e-4, atol=1e-5,
        )


def test_nc_supernet_parity(rng):
    """The NC weight-sharing supernet over real 2-hop blocks matches the
    torch oracle of model_search.py (eval + train mode, same alphas)."""
    from mr_gnas_tpu.cells.genotype import CellSpec, init_alphas, layer_weights
    from mr_gnas_tpu.data.blocks import CSRGraph, build_blocks
    from mr_gnas_tpu.models import NCSupernet

    n_nodes, n_rels, n_edges, n_classes, layers = 26, 4, 70, 3, 2
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    etype = rng.integers(0, n_rels, n_edges)
    seeds = np.unique(rng.integers(0, n_nodes, 7))
    csr = CSRGraph(src, dst, etype, n_nodes)
    blocks, _ = build_blocks(csr, seeds, layers=layers)
    oblocks = oracle.build_nc_blocks(src, dst, etype, seeds, layers=layers)

    spec = CellSpec(task="nc", zero_nodes=1, first_nodes=2, last_nodes=2)
    model = NCSupernet(
        num_nodes=n_nodes,
        num_classes=n_classes,
        num_rels=n_rels,
        layers=layers,
        spec=spec,
        feature_dim=D,
        init_fea_dim=INIT_D,
        num_base_r=N_BASE,
        dropout=0.0,
        fused=False,
    )
    alphas = init_alphas(jax.random.key(2), spec, layers)
    variables = model.init(jax.random.key(9), blocks, alphas, False)
    onet = oracle.NCSupernetOracle(
        n_nodes, n_classes, n_rels, layers, 2, 2, D, INIT_D, N_BASE
    )
    oracle.load_nc_supernet_from_flax(onet, jax.device_get(variables))

    lw = []
    for i in range(layers):
        w = layer_weights(alphas, spec, i)
        lw.append(tuple(
            torch.tensor(np.asarray(w[s])) for s in ("zero", "first", "middle", "last")
        ))

    for training in (False, True):
        kw = (
            dict(mutable=["batch_stats"], rngs={"dropout": jax.random.key(0)})
            if training
            else {}
        )
        out = model.apply(variables, blocks, alphas, training, **kw)
        logits = out[0] if training else out
        onet.train(training)
        with torch.no_grad():
            ologits = onet(oblocks, lw)
        mine_gid = np.asarray(blocks[-1].dst_gid)
        order = {int(g): p for p, g in enumerate(mine_gid)}
        idx = [order[int(g)] for g in oblocks[-1].dst_nodes]
        np.testing.assert_allclose(
            np.asarray(logits)[idx], ologits.numpy(), rtol=3e-4, atol=1e-5,
            err_msg=f"NC supernet logits (training={training})",
        )


def test_lp_retrain_train_step_bn_stats_parity(rng):
    """One training-mode forward: outputs AND the mutated BN running stats
    match torch (incl. masked-BN over padded rows == torch BN)."""
    model, variables, graph, onet, tg, genos = _build_pair(rng, PUBLISHED, layers=2)

    (_, _, trace), mutated = model.apply(
        variables,
        graph,
        True,
        method=LPNetwork.encode_trace,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(0)},
    )
    onet.train()
    with torch.no_grad():
        _, _, otrace = onet.encode(tg)

    for i, ((ent_j, _), (ent_t, _)) in enumerate(zip(trace, otrace)):
        np.testing.assert_allclose(
            np.asarray(ent_j)[:N_ENT], ent_t.numpy(), rtol=1e-4, atol=1e-5,
            err_msg=f"layer {i} train-mode entity embeddings",
        )

    # BN running stats after the step, cell by cell
    import flax.traverse_util as tu

    stats = tu.flatten_dict(mutated["batch_stats"], sep="/")
    for i, geno in enumerate(genos):
        cell = onet.cells[i]
        for op_name, center, pre in geno.alpha_cell:
            if op_name == "pre_mult":
                continue
            mod = cell._ops[center - 1][pre][0]
            pfx = f"cell_{i}/op_{center}_{pre}/bn"
            np.testing.assert_allclose(
                np.asarray(stats[f"{pfx}/mean"]),
                mod.batchnorm_h.running_mean.numpy(),
                rtol=1e-4, atol=1e-6, err_msg=f"{pfx} running mean",
            )
            np.testing.assert_allclose(
                np.asarray(stats[f"{pfx}/var"]),
                mod.batchnorm_h.running_var.numpy(),
                rtol=1e-4, atol=1e-6, err_msg=f"{pfx} running var",
            )
        np.testing.assert_allclose(
            np.asarray(stats[f"cell_{i}/bn_out/mean"]),
            cell.batchnorm_h.running_mean.numpy(), rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(stats[f"cell_{i}/bn_out/var"]),
            cell.batchnorm_h.running_var.numpy(), rtol=1e-4, atol=1e-6,
        )
