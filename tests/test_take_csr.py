"""take_rows_csr: jnp.take with the one-hot MXU backward must equal
jnp.take's scatter-add VJP exactly (interpret mode on CPU), including
through the full supernet loss with src/so CSRs attached."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_gnas_tpu.graph.build import attach_gather_csr, index_csr
from mr_gnas_tpu.kernels.pallas_segment import take_rows_csr


def test_take_rows_csr_matches_take_vjp(rng):
    n, r, d = 300, 2000, 64
    # repeated + skewed indices (hub entities), incl. untouched rows
    idx = np.minimum((rng.pareto(1.1, size=r) * 20).astype(np.int32), n - 1)
    meta = index_csr(idx, n, rb=256)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    idxj = jnp.asarray(idx)
    g_out = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))

    got_y = take_rows_csr(x, idxj, meta, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_y), np.asarray(jnp.take(x, idxj, axis=0)))

    got = jax.grad(lambda t: jnp.sum(take_rows_csr(t, idxj, meta, interpret=True) * g_out))(x)
    want = jax.grad(lambda t: jnp.sum(jnp.take(t, idxj, axis=0) * g_out))(x)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_supernet_loss_with_gather_csrs_matches(rng):
    """Full LP supernet step with src_csr + so_csr == plain path: loss and
    every parameter gradient."""
    import dataclasses

    from mr_gnas_tpu.cells import CellSpec, init_alphas
    from mr_gnas_tpu.data import (
        generate_sampled_graph_and_labels,
        get_adj_and_degrees,
        synthetic_kg,
    )
    from mr_gnas_tpu.graph.build import round_up
    from mr_gnas_tpu.models import LPSupernet, lp_search_loss

    kg = synthetic_kg(num_ent=200, num_rels=7, n_train=400, seed=0)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    batch = generate_sampled_graph_and_labels(
        kg.train, 64, 0.5, kg.num_rels, adj, deg, 4, "uniform", rng,
        n_nodes_pad=round_up(min(128, kg.num_ent), 128),
    )
    g_plain = batch.graph
    g_csr = attach_gather_csr(g_plain, rb=128)
    so_idx = np.concatenate([batch.triplets[:, 0], batch.triplets[:, 2]])
    so_csr = index_csr(so_idx, g_plain.n_nodes, rb=128)
    spec = CellSpec(task="lp")
    model = LPSupernet(
        num_ent=kg.num_ent, num_rels=kg.num_rels, layers=2, spec=spec,
        feature_dim=32, init_fea_dim=16, num_base_r=15,
        dropout_cell=0.0, drop_aggr=0.0,
    )
    alphas = init_alphas(jax.random.key(0), spec, 2, with_final=True)
    v = model.init(jax.random.key(1), g_plain, alphas, False)
    trip, lab = jnp.asarray(batch.triplets), jnp.asarray(batch.labels)

    def loss_fn(p, graph, so):
        (ent, rel), _ = model.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, graph, alphas, True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.key(5)},
        )
        return lp_search_loss(ent, rel, trip, lab, so)

    l0, g0 = jax.value_and_grad(loss_fn)(v["params"], g_plain, None)
    l1, g1 = jax.value_and_grad(loss_fn)(v["params"], g_csr, so_csr)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    for (k0, v0), (k1, v1) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g0), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g1), key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(
            v0, v1, rtol=5e-5, atol=1e-6, err_msg=jax.tree_util.keystr(k0)
        )
