"""Supernet and compiled cell forward passes on tiny graphs."""
import jax
import jax.numpy as jnp
import numpy as np

from mr_gnas_tpu.cells import (
    CellSpec,
    CompiledCell,
    SupernetCell,
    init_alphas,
    layer_weights,
    parse_reference_genotypes,
)
from mr_gnas_tpu.graph import build_rel_graph
import pytest

D = 8
REF_STR = (
    "Genotype(alpha_cell=[('pre_sub', 1, 0), ('f_sparse_comp', 2, 1), "
    "('f_sparse_comp', 3, 2), ('a_max', 4, 2), ('a_max', 5, 3), "
    "('f_sparse_last', 6, 5), ('f_sparse_last', 7, 5)], "
    "concat_node=[4, 5, 6, 7], score_func='sf_DisMult')"
)


def _graph():
    t = np.array(
        [[0, 0, 1], [1, 0, 2], [2, 1, 3], [3, 1, 0], [0, 1, 2]], dtype=np.int64
    )
    return build_rel_graph(t, num_nodes=4, num_rels=2, n_fwd_pad=8, n_nodes_pad=6)


@pytest.mark.slow
def test_supernet_cell_lp_forward(rng):
    g = _graph()
    spec = CellSpec(task="lp")
    cell = SupernetCell(spec=spec, feature_dim=D, drop_aggr=0.0)
    alphas = init_alphas(jax.random.key(0), spec, layers=1)
    w = layer_weights(alphas, spec, 0)
    h = jnp.asarray(rng.normal(size=(g.n_rows, D)).astype(np.float32))
    hr = jnp.asarray(rng.normal(size=(g.n_rows, D)).astype(np.float32))
    variables = cell.init(jax.random.key(1), g, h, hr, w, False)
    out = cell.apply(variables, g, h, hr, w, False)
    assert out.shape == (g.n_nodes, D)
    assert np.all(np.isfinite(np.asarray(out)))
    # training mode updates batch stats
    out2, mutated = cell.apply(
        variables, g, h, hr, w, True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.key(2)},
    )
    assert "batch_stats" in mutated
    # gradients flow to alphas
    def loss(alphas):
        w = layer_weights(alphas, spec, 0)
        y = cell.apply(variables, g, h, hr, w, False)
        return jnp.sum(y**2)
    grads = jax.grad(loss)(alphas)
    assert float(jnp.abs(grads["first"]).sum()) > 0
    assert float(jnp.abs(grads["middle"]).sum()) > 0


def test_supernet_cell_nc_forward(rng):
    from mr_gnas_tpu.graph import EdgeGraph

    e, n = 12, 5
    dst = np.array([0, 0, 1, 2, 2, 3, 4, 4, 1, 0, 5, 5], dtype=np.int32)
    mask = (dst < n).astype(np.float32)
    g = EdgeGraph(
        dst=jnp.asarray(dst),
        edge_mask=jnp.asarray(mask),
        node_mask=jnp.ones(n, np.float32),
        n_edges=e,
        n_nodes=n,
    )
    spec = CellSpec(task="nc")
    cell = SupernetCell(spec=spec, feature_dim=D)
    alphas = init_alphas(jax.random.key(0), spec, layers=1)
    w = layer_weights(alphas, spec, 0)
    h = jnp.asarray(rng.normal(size=(e, D)).astype(np.float32))
    hr = jnp.asarray(rng.normal(size=(e, D)).astype(np.float32))
    variables = cell.init(jax.random.key(1), g, h, hr, w, False)
    out = cell.apply(variables, g, h, hr, w, False)
    assert out.shape == (n, D)
    assert np.all(np.isfinite(np.asarray(out)))


def test_compiled_cell_lp_forward(rng):
    g = _graph()
    geno = parse_reference_genotypes(REF_STR)[0]
    cell = CompiledCell(task="lp", genotype=geno, feature_dim=D, drop_aggr=0.0)
    h = jnp.asarray(rng.normal(size=(g.n_rows, D)).astype(np.float32))
    hr = jnp.asarray(rng.normal(size=(g.n_rows, D)).astype(np.float32))
    variables = cell.init(jax.random.key(0), g, h, hr, False)
    out = cell.apply(variables, g, h, hr, False)
    assert out.shape == (g.n_nodes, D)
    assert np.all(np.isfinite(np.asarray(out)))
    # params exist only for genes present in the genotype
    names = set(variables["params"].keys())
    assert "op_1_0" in names and "concat" in names


def test_compiled_cell_padding_invariance(rng):
    """Same real graph, different padding -> identical outputs on real nodes."""
    t = np.array(
        [[0, 0, 1], [1, 0, 2], [2, 1, 3], [3, 1, 0], [0, 1, 2]], dtype=np.int64
    )
    g1 = build_rel_graph(t, 4, 2, n_fwd_pad=5, n_nodes_pad=4)
    g2 = build_rel_graph(t, 4, 2, n_fwd_pad=9, n_nodes_pad=7)
    geno = parse_reference_genotypes(REF_STR)[0]
    cell = CompiledCell(task="lp", genotype=geno, feature_dim=D, drop_aggr=0.0)

    def run(g):
        # deterministic per-row features from (src node, etype) so both
        # paddings see identical real rows
        feat = np.random.default_rng(7).normal(size=(8, D)).astype(np.float32)
        rfeat = np.random.default_rng(8).normal(size=(8, D)).astype(np.float32)
        h = feat[np.asarray(g.src) % 8] * np.asarray(g.row_mask)[:, None]
        hr = rfeat[np.asarray(g.etype) % 8] * np.asarray(g.row_mask)[:, None]
        variables = cell.init(jax.random.key(0), g, jnp.asarray(h), jnp.asarray(hr), False)
        return variables, np.asarray(
            cell.apply(variables, g, jnp.asarray(h), jnp.asarray(hr), False)
        )

    v1, o1 = run(g1)
    v2, o2 = run(g2)
    # identical params (same init key and structure)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
        v1["params"], v2["params"],
    )
    np.testing.assert_allclose(o1[:4], o2[:4], rtol=2e-4, atol=1e-5)
