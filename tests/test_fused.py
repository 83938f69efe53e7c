"""FusedSupernetCellLP must compute the same function as the naive
SupernetCell given converted parameters — eval AND training mode
(including batch-stat updates)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_gnas_tpu.cells import CellSpec, SupernetCell, init_alphas, layer_weights
from mr_gnas_tpu.cells.fused import FusedSupernetCellLP, convert_naive_params
from mr_gnas_tpu.graph import build_rel_graph

D = 8


def _setup(rng):
    t = np.array(
        [[0, 0, 1], [1, 0, 2], [2, 1, 3], [3, 1, 0], [0, 1, 2]], dtype=np.int64
    )
    g = build_rel_graph(t, 4, 2, n_fwd_pad=7, n_nodes_pad=6)
    spec = CellSpec(task="lp")
    naive = SupernetCell(spec=spec, feature_dim=D, drop_aggr=0.0)
    fused = FusedSupernetCellLP(spec=spec, feature_dim=D, drop_aggr=0.0)
    alphas = init_alphas(jax.random.key(3), spec, 1)
    w = layer_weights(alphas, spec, 0)
    h = jnp.asarray(rng.normal(size=(g.n_rows, D)).astype(np.float32))
    hr = jnp.asarray(rng.normal(size=(g.n_rows, D)).astype(np.float32))
    nv = naive.init(jax.random.key(1), g, h, hr, w, False)
    fv_conv = convert_naive_params(nv, spec)
    return g, spec, naive, fused, nv, fv_conv, w, h, hr


@pytest.mark.slow
def test_fused_param_shapes_match_own_init(rng):
    g, spec, naive, fused, nv, fv_conv, w, h, hr = _setup(rng)
    fv_own = fused.init(jax.random.key(0), g, h, hr, w, False)
    for col in ("params", "batch_stats"):
        own = jax.tree.map(np.shape, fv_own[col])
        conv = jax.tree.map(np.shape, jax.tree.map(jnp.asarray, fv_conv[col]))
        assert own == conv, (own, conv)


def test_fused_matches_naive_eval(rng):
    g, spec, naive, fused, nv, fv_conv, w, h, hr = _setup(rng)
    out_naive = naive.apply(nv, g, h, hr, w, False)
    out_fused = fused.apply(
        jax.tree.map(jnp.asarray, fv_conv), g, h, hr, w, False
    )
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_naive), rtol=2e-4, atol=2e-5
    )


def test_fused_matches_naive_training_and_stats(rng):
    g, spec, naive, fused, nv, fv_conv, w, h, hr = _setup(rng)
    out_n, mut_n = naive.apply(
        nv, g, h, hr, w, True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(9)},
    )
    out_f, mut_f = fused.apply(
        jax.tree.map(jnp.asarray, fv_conv), g, h, hr, w, True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.key(9)},
    )
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_n), rtol=3e-4, atol=3e-5
    )
    # updated running stats agree (stack the naive per-op stats)
    conv_stats = convert_naive_params(
        {"params": nv["params"], "batch_stats": mut_n["batch_stats"]}, spec
    )["batch_stats"]
    for k in conv_stats:
        np.testing.assert_allclose(
            np.asarray(mut_f["batch_stats"][k]),
            conv_stats[k],
            rtol=2e-4, atol=1e-5,
            err_msg=k,
        )


@pytest.mark.slow
def test_fused_gradients_flow(rng):
    g, spec, naive, fused, nv, fv_conv, w, h, hr = _setup(rng)
    variables = jax.tree.map(jnp.asarray, fv_conv)

    def loss(params, w):
        y = fused.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            g, h, hr, w, False,
        )
        return jnp.sum(y**2)

    gp, gw = jax.grad(loss, argnums=(0, 1))(variables["params"], w)
    assert float(jnp.abs(gp["first_w_in"]).sum()) > 0
    assert float(jnp.abs(gw["middle"]).sum()) > 0
