"""FusedSupernetCellNC parity vs the naive NC SupernetCell."""
import jax
import jax.numpy as jnp
import numpy as np

from mr_gnas_tpu.cells import CellSpec, SupernetCell, init_alphas, layer_weights
from mr_gnas_tpu.cells.fused import FusedSupernetCellNC, convert_naive_params_nc
from mr_gnas_tpu.graph import EdgeGraph
import pytest

D = 8


def _setup(rng):
    e, n = 14, 5
    dst = np.array([0, 0, 1, 2, 2, 3, 4, 4, 1, 0, 5, 5, 3, 2], dtype=np.int32)
    mask = (dst < n).astype(np.float32)
    g = EdgeGraph(
        dst=jnp.asarray(dst),
        edge_mask=jnp.asarray(mask),
        node_mask=jnp.ones(n, np.float32),
        n_edges=e,
        n_nodes=n,
    )
    spec = CellSpec(task="nc")
    naive = SupernetCell(spec=spec, feature_dim=D, dropout=0.0)
    fused = FusedSupernetCellNC(spec=spec, feature_dim=D, dropout=0.0)
    alphas = init_alphas(jax.random.key(3), spec, 1)
    w = layer_weights(alphas, spec, 0)
    h = jnp.asarray(rng.normal(size=(e, D)).astype(np.float32))
    hr = jnp.asarray(rng.normal(size=(e, D)).astype(np.float32))
    nv = naive.init(jax.random.key(1), g, h, hr, w, False)
    fv = convert_naive_params_nc(nv, spec)
    return g, spec, naive, fused, nv, fv, w, h, hr


@pytest.mark.slow
def test_nc_fused_param_shapes(rng):
    g, spec, naive, fused, nv, fv, w, h, hr = _setup(rng)
    own = fused.init(jax.random.key(0), g, h, hr, w, False)
    for col in ("params", "batch_stats"):
        a = jax.tree.map(np.shape, own[col])
        b = jax.tree.map(np.shape, jax.tree.map(jnp.asarray, fv[col]))
        assert a == b, (a, b)


def test_nc_fused_matches_naive_eval(rng):
    g, spec, naive, fused, nv, fv, w, h, hr = _setup(rng)
    out_n = naive.apply(nv, g, h, hr, w, False)
    out_f = fused.apply(jax.tree.map(jnp.asarray, fv), g, h, hr, w, False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n), rtol=3e-4, atol=3e-5)


def test_nc_fused_matches_naive_training(rng):
    g, spec, naive, fused, nv, fv, w, h, hr = _setup(rng)
    out_n, mut_n = naive.apply(
        nv, g, h, hr, w, True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(5)},
    )
    out_f, mut_f = fused.apply(
        jax.tree.map(jnp.asarray, fv), g, h, hr, w, True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.key(5)},
    )
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n), rtol=5e-4, atol=5e-5)
    conv_stats = convert_naive_params_nc(
        {"params": nv["params"], "batch_stats": mut_n["batch_stats"]}, spec
    )["batch_stats"]
    for k in conv_stats:
        a = np.asarray(jax.tree_util.tree_leaves(mut_f["batch_stats"][k])[0]) \
            if isinstance(conv_stats[k], dict) else np.asarray(mut_f["batch_stats"][k])
        b = jax.tree_util.tree_leaves(conv_stats[k])[0] if isinstance(conv_stats[k], dict) else conv_stats[k]
        np.testing.assert_allclose(a, np.asarray(b), rtol=3e-4, atol=1e-5, err_msg=k)
