"""Each search-space op vs a dense numpy oracle on tiny graphs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_gnas_tpu.graph import EdgeGraph, build_rel_graph
from mr_gnas_tpu.ops import OpArgs, make_op, make_score_fn

D = 6


def _lp_graph():
    t = np.array(
        [[0, 0, 1], [1, 0, 2], [2, 1, 3], [3, 1, 0], [0, 1, 2]], dtype=np.int64
    )
    return build_rel_graph(t, num_nodes=4, num_rels=2, n_fwd_pad=7, n_nodes_pad=5)


def _apply(task, name, graph, h, h_in, **extra):
    op = make_op(task, name, OpArgs(feature_dim=D, drop_aggr=0.0, **extra))
    variables = op.init(jax.random.key(0), graph, h, h_in, False)
    out = op.apply(variables, graph, h, h_in, False)
    return np.asarray(out), variables


def _linear(variables, path, x):
    p = variables["params"]
    for k in path:
        p = p[k]
    y = x @ np.asarray(p["kernel"])
    if "bias" in p:
        y = y + np.asarray(p["bias"])
    return y


def test_pre_ops(rng):
    g = _lp_graph()
    h = rng.normal(size=(g.n_rows, D)).astype(np.float32)
    hr = rng.normal(size=(g.n_rows, D)).astype(np.float32)
    for name, fn in [
        ("pre_mult", lambda a, b: a * b),
        ("pre_sub", lambda a, b: a - b),
        ("pre_add", lambda a, b: a + b),
    ]:
        out, _ = _apply("lp", name, g, jnp.asarray(h), jnp.asarray(hr))
        np.testing.assert_allclose(out, fn(h, hr), rtol=1e-6)


def test_pre_corr_matches_naive_circular_correlation(rng):
    g = _lp_graph()
    h = rng.normal(size=(g.n_rows, D)).astype(np.float32)
    hr = rng.normal(size=(g.n_rows, D)).astype(np.float32)
    out, _ = _apply("lp", "pre_corr", g, jnp.asarray(h), jnp.asarray(hr))
    # ccorr(a,b)[k] = sum_i a[i] * b[(i+k) % d]
    want = np.zeros_like(h)
    for k in range(D):
        want[:, k] = np.sum(h * np.roll(hr, -k, axis=1), axis=1)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_zero_identity(rng):
    g = _lp_graph()
    h = rng.normal(size=(g.n_rows, D)).astype(np.float32)
    out, _ = _apply("lp", "f_zero", g, jnp.asarray(h), jnp.asarray(h))
    assert np.all(out == 0)
    out, _ = _apply("lp", "f_identity", g, jnp.asarray(h), jnp.asarray(h))
    np.testing.assert_allclose(out, h)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_f_dense_and_sparse(rng):
    g = _lp_graph()
    h = rng.normal(size=(g.n_rows, D)).astype(np.float32)
    h_in = rng.normal(size=(g.n_rows, D)).astype(np.float32)
    cat = np.concatenate([h, h_in], axis=1)

    out, v = _apply("lp", "f_dense", g, jnp.asarray(h), jnp.asarray(h_in))
    want = _sigmoid(_linear(v, ["Dense_0"], cat)) * h
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)

    out, v = _apply("lp", "f_sparse", g, jnp.asarray(h), jnp.asarray(h_in))
    want = _sigmoid(_linear(v, ["a"], _linear(v, ["W"], cat))) * h
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_f_last_filters(rng):
    g = _lp_graph()
    h = rng.normal(size=(g.n_rows, D)).astype(np.float32)
    out, v = _apply("lp", "f_dense_last", g, jnp.asarray(h), jnp.asarray(h))
    want = _sigmoid(_linear(v, ["Dense_0"], h)) * h
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)
    out, v = _apply("lp", "f_sparse_last", g, jnp.asarray(h), jnp.asarray(h))
    want = _sigmoid(_linear(v, ["a"], _linear(v, ["W"], h))) * h
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_f_comp_direction_typed(rng):
    g = _lp_graph()
    h = rng.normal(size=(g.n_rows, D)).astype(np.float32)
    h_in = rng.normal(size=(g.n_rows, D)).astype(np.float32)
    out, v = _apply("lp", "f_comp", g, jnp.asarray(h), jnp.asarray(h_in))
    nf, ne = g.n_fwd, g.n_edge_rows
    cat = np.concatenate([h, h_in], axis=1)
    m_in = _linear(v, ["W_in"], cat[:nf])
    m_out = _linear(v, ["W_out"], cat[nf:ne])
    m_self = _linear(v, ["W_self"], cat[ne:])
    norm = np.asarray(g.norm[:ne])[:, None]
    want = np.concatenate(
        [np.concatenate([m_in / 3, m_out / 3], axis=0) * norm, m_self], axis=0
    )
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", ["f_sparse_comp", "f_dense_comp"])
def test_f_gated_comp(rng, name):
    g = _lp_graph()
    h = rng.normal(size=(g.n_rows, D)).astype(np.float32)
    h_in = rng.normal(size=(g.n_rows, D)).astype(np.float32)
    out, v = _apply("lp", name, g, jnp.asarray(h), jnp.asarray(h_in))
    nf, ne = g.n_fwd, g.n_edge_rows
    cat = np.concatenate([h, h_in], axis=1)

    def gated(tag, lo, hi):
        z = _linear(v, ["g", f"W_{tag}"], cat[lo:hi])
        if name == "f_sparse_comp":
            z = _linear(v, ["g", f"a_{tag}"], z)
        return _sigmoid(z) * h[lo:hi]

    o_in, o_out = gated("in", 0, nf), gated("out", nf, ne)
    o_self = gated("self", ne, g.n_rows)
    norm = np.asarray(g.norm[:ne])[:, None]
    want = np.concatenate(
        [np.concatenate([o_in / 3, o_out / 3], axis=0) * norm, o_self / 3], axis=0
    )
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", ["a_max", "a_mean", "a_sum"])
def test_lp_aggregators(rng, name):
    g = _lp_graph()
    h = rng.normal(size=(g.n_rows, D)).astype(np.float32)
    out, v = _apply("lp", name, g, jnp.asarray(h), jnp.asarray(h))
    ne = g.n_edge_rows
    msg = h[:ne]
    if name in ("a_max", "a_mean"):
        msg = np.maximum(_linear(v, ["Dense_0"], msg), 0)
    dst = np.asarray(g.dst[:ne])
    mask = np.asarray(g.edge_mask)
    agg = np.zeros((g.n_nodes, D), dtype=np.float64)
    for node in range(g.n_nodes):
        rows = msg[(dst == node) & (mask > 0)]
        if len(rows) == 0:
            continue
        if name == "a_max":
            agg[node] = rows.max(0)
        elif name == "a_mean":
            agg[node] = rows.mean(0)
        else:
            agg[node] = rows.sum(0)
    want = agg + h[ne:]
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("name", ["a_max", "a_mean", "a_sum", "a_std"])
def test_nc_aggregators(rng, name):
    e, n = 9, 4
    dst = np.array([0, 0, 1, 2, 2, 2, 3, 4, 4], dtype=np.int32)  # 4 = padding seg
    mask = (dst < n).astype(np.float32)
    g = EdgeGraph(
        dst=jnp.asarray(dst),
        edge_mask=jnp.asarray(mask),
        node_mask=jnp.ones(n, dtype=jnp.float32),
        n_edges=e,
        n_nodes=n,
    )
    h = rng.normal(size=(e, D)).astype(np.float32)
    out, v = _apply("nc", name, g, jnp.asarray(h), jnp.asarray(h))
    msg = h
    if name in ("a_max", "a_mean"):
        msg = np.maximum(_linear(v, ["Dense_0"], h), 0)
    for node in range(n):
        rows = msg[(dst == node) & (mask > 0)]
        if name == "a_std":
            if len(rows) == 0:
                want = np.full(D, np.sqrt(1e-5))
            else:
                var = np.maximum((rows**2).mean(0) - rows.mean(0) ** 2, 0)
                want = np.sqrt(var + 1e-5)
        elif len(rows) == 0:
            want = np.zeros(D)
        elif name == "a_max":
            want = rows.max(0)
        elif name == "a_mean":
            want = rows.mean(0)
        else:
            want = rows.sum(0)
        np.testing.assert_allclose(out[node], want, rtol=1e-5, atol=1e-5)


def test_score_distmult(rng):
    n, b = 10, 4
    all_ent = rng.normal(size=(n, D)).astype(np.float32)
    s = rng.normal(size=(b, D)).astype(np.float32)
    r = rng.normal(size=(b, D)).astype(np.float32)
    op = make_score_fn("sf_DisMult", OpArgs())
    v = op.init(jax.random.key(0), all_ent, s, r, False)
    out = np.asarray(op.apply(v, all_ent, s, r, False))
    want = _sigmoid((s * r) @ all_ent.T)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_score_transe(rng):
    n, b = 10, 5
    all_ent = rng.normal(size=(n, D)).astype(np.float32)
    s = rng.normal(size=(b, D)).astype(np.float32)
    r = rng.normal(size=(b, D)).astype(np.float32)
    op = make_score_fn("sf_TransE", OpArgs(gamma=40.0))
    v = op.init(jax.random.key(0), all_ent, s, r, False)
    out = np.asarray(op.apply(v, all_ent, s, r, False))
    want = _sigmoid(
        40.0 - np.abs((s + r)[:, None, :] - all_ent[None, :, :]).sum(-1)
    )
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_score_conve_shapes(rng):
    n, b, d = 10, 4, 32
    all_ent = rng.normal(size=(n, d)).astype(np.float32)
    s = rng.normal(size=(b, d)).astype(np.float32)
    r = rng.normal(size=(b, d)).astype(np.float32)
    op = make_score_fn(
        "sf_ConvE", OpArgs(embed_dim=d, num_filt=8, ker_sz=3, k_w=4, k_h=8)
    )
    v = op.init(jax.random.key(0), all_ent, s, r, False)
    out = np.asarray(op.apply(v, all_ent, s, r, False))
    assert out.shape == (b, n)
    assert np.all((out >= 0) & (out <= 1))
