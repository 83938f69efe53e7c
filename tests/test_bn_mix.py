"""kernels/bn_mix.py: the BN-mix mega-kernel must compute exactly the
slab formulation of cells/fused.py (MixedOp pipelines cell_lp.py:12-33).

Two layers of checks (interpret mode on CPU):
  * per-stage fwd/bwd vs a jnp slab reference (all four stage variants);
  * whole-supernet: LPSupernet(megakernel=True) == (False) for loss,
    all parameter grads, and the mutated batch_stats.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_gnas_tpu.kernels.bn_mix import _EPS, bn_mix


def _ref_bn_mix(stage, slabs, u, gamma, beta, w, mask, cnt):
    if stage == "first":
        pairs, psds, zd, zc = slabs
        ops = jnp.stack(
            [pairs, jax.nn.sigmoid(zd) * psds, jax.nn.sigmoid(u) * psds, zc],
            axis=1,
        )
    elif stage == "last":
        pairs, zd = slabs
        ops = jnp.stack(
            [pairs, jax.nn.sigmoid(zd) * pairs, jax.nn.sigmoid(u) * pairs], axis=1
        )
    elif stage == "zero":
        src, hr = slabs
        ops = jnp.stack([src * hr, src - hr, src + hr])[None]
    else:  # pre
        ops = jnp.stack(slabs)[None]
    p, k, _, d = ops.shape
    mean = jnp.sum(ops * mask, axis=2) / cnt
    var = jnp.sum(((ops - mean[:, :, None, :]) ** 2) * mask, axis=2) / cnt
    gam, bet = gamma.reshape(p, k, d), beta.reshape(p, k, d)
    y = (ops - mean[:, :, None, :]) * jax.lax.rsqrt(
        var[:, :, None, :] + _EPS
    ) * gam[:, :, None, :] + bet[:, :, None, :]
    out = jnp.einsum("pkrd,pk->rd", jax.nn.relu(y), w)
    return out, mean.reshape(p * k, d), var.reshape(p * k, d)


@pytest.mark.parametrize(
    "stage,p,r", [("zero", 1, 300), ("first", 1, 300), ("first", 2, 700),
                  ("last", 2, 300), ("last", 5, 200), ("pre", 1, 300)]
)
def test_stage_fwd_bwd_vs_slab(rng, stage, p, r):
    d = 64
    if stage == "first":
        slabs = tuple(
            jnp.asarray(rng.normal(size=(p, r, d)).astype(np.float32))
            for _ in range(4)
        )
        u = jnp.asarray(rng.normal(size=(p, r, 1)).astype(np.float32))
        k = 4
    elif stage == "last":
        slabs = tuple(
            jnp.asarray(rng.normal(size=(p, r, d)).astype(np.float32))
            for _ in range(2)
        )
        u = jnp.asarray(rng.normal(size=(p, r, 1)).astype(np.float32))
        k = 3
    else:
        slabs = tuple(
            jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))
            for _ in range(2 if stage == "zero" else 3)
        )
        u, k, p = None, 3, 1
    gamma = jnp.asarray(rng.normal(size=(p * k, d)).astype(np.float32) * 0.5 + 1)
    beta = jnp.asarray(rng.normal(size=(p * k, d)).astype(np.float32) * 0.1)
    w = jnp.asarray(jax.nn.softmax(rng.normal(size=(p, k)).astype(np.float32)))
    maskv = (rng.random(r) > 0.2).astype(np.float32)
    maskv[:4] = 1
    mask = jnp.asarray(maskv[:, None])
    cnt = jnp.asarray(maskv.sum(), jnp.float32)
    g_out = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))

    def loss(fn, slabs, u, gamma, beta, w):
        out, mean, var = fn(slabs, u, gamma, beta, w)
        return jnp.sum(out * g_out), (out, mean, var)

    new_fn = lambda *a: bn_mix(stage, True, jnp.float32, None, *a, mask, cnt)
    ref_fn = lambda *a: _ref_bn_mix(stage, *a, mask, cnt)
    (ln, auxn), gn = jax.value_and_grad(
        lambda *a: loss(new_fn, *a), argnums=(0, 1, 2, 3, 4), has_aux=True
    )(slabs, u, gamma, beta, w)
    (lr, auxr), gr = jax.value_and_grad(
        lambda *a: loss(ref_fn, *a), argnums=(0, 1, 2, 3, 4), has_aux=True
    )(slabs, u, gamma, beta, w)
    for xn, xr in zip(auxn, auxr):
        np.testing.assert_allclose(xn, xr, rtol=1e-4, atol=1e-5)
    for xn, xr in zip(jax.tree.leaves(gn), jax.tree.leaves(gr)):
        np.testing.assert_allclose(xn, xr, rtol=5e-4, atol=5e-4)


def _named(tree):
    return sorted(
        (
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(tree)
        ),
        key=lambda x: x[0],
    )


@pytest.mark.slow
def test_lp_supernet_megakernel_parity(rng):
    """LPSupernet(megakernel=True) == (False): loss, grads, batch_stats."""
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
    spec = CellSpec(task="lp")

    def build(mega):
        return LPSupernet(
            num_ent=kg.num_ent, num_rels=kg.num_rels, layers=1, spec=spec,
            feature_dim=32, init_fea_dim=16, num_base_r=15,
            dropout_cell=0.0, drop_aggr=0.0, megakernel=mega,
        )

    alphas = init_alphas(jax.random.key(0), spec, 1, with_final=True)
    v = build(False).init(jax.random.key(1), batch.graph, alphas, False)
    params, bstats = v["params"], v["batch_stats"]
    trip, lab = jnp.asarray(batch.triplets), jnp.asarray(batch.labels)

    def loss_fn(model, p):
        (ent, rel), mut = model.apply(
            {"params": p, "batch_stats": bstats}, batch.graph, alphas, True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.key(5)},
        )
        return lp_search_loss(ent, rel, trip, lab), mut["batch_stats"]

    (l0, bs0), g0 = jax.value_and_grad(
        lambda p: loss_fn(build(False), p), has_aux=True
    )(params)
    (l1, bs1), g1 = jax.value_and_grad(
        lambda p: loss_fn(build(True), p), has_aux=True
    )(params)
    np.testing.assert_allclose(l0, l1, rtol=2e-5)
    for (k0, v0), (k1, v1) in zip(_named(bs0), _named(bs1)):
        assert k0 == k1
        np.testing.assert_allclose(v0, v1, rtol=2e-4, atol=1e-5, err_msg=k0)
    for (k0, v0), (k1, v1) in zip(_named(g0), _named(g1)):
        assert k0 == k1
        np.testing.assert_allclose(v0, v1, rtol=2e-3, atol=2e-4, err_msg=k0)
