"""CompGCN baseline, visualization, losses, profiling utilities."""
import jax
import jax.numpy as jnp
import numpy as np

from mr_gnas_tpu.cells import parse_reference_genotypes
from mr_gnas_tpu.data import synthetic_kg
from mr_gnas_tpu.graph import build_rel_graph
from mr_gnas_tpu.models.compgcn import CompGCN, CompGCNConvE
from mr_gnas_tpu.train.losses import topk_accuracy, weighted_ce
from mr_gnas_tpu.utils import to_ascii, to_dot
import pytest

GENO = (
    "Genotype(alpha_cell=[('pre_sub', 1, 0), ('f_sparse_comp', 2, 1), "
    "('f_sparse_comp', 3, 2), ('a_max', 4, 2), ('a_max', 5, 3), "
    "('f_sparse_last', 6, 5), ('f_sparse_last', 7, 5)], "
    "concat_node=[4, 5, 6, 7], score_func='sf_DisMult')"
)


@pytest.mark.slow
def test_compgcn_encoder_forward(rng):
    kg = synthetic_kg(num_ent=40, num_rels=3, n_train=120)
    g = build_rel_graph(kg.train, kg.num_ent, kg.num_rels)
    model = CompGCN(
        num_ent=kg.num_ent, num_rel=2 * kg.num_rels, num_bases=4,
        in_dim=16, layer_size=(16, 16), layer_dropout=(0.0, 0.0), dropout=0.0,
    )
    v = model.init(jax.random.key(0), g, False)
    n, r = model.apply(v, g, False)
    assert n.shape == (kg.num_ent, 16)
    assert r.shape == (2 * kg.num_rels, 16)
    assert np.all(np.isfinite(np.asarray(n)))
    # tanh keeps activations bounded
    assert float(jnp.abs(n).max()) <= 1.0 + 1e-6


@pytest.mark.slow
def test_compgcn_conve_scores(rng):
    kg = synthetic_kg(num_ent=30, num_rels=3, n_train=90)
    g = build_rel_graph(kg.train, kg.num_ent, kg.num_rels)
    model = CompGCNConvE(
        num_ent=kg.num_ent, num_rel=2 * kg.num_rels, num_bases=4,
        in_dim=16, layer_size=(16,), layer_dropout=(0.0,), dropout=0.0,
        num_filt=4, ker_sz=3, k_w=4, k_h=4,
    )
    sub = jnp.asarray([0, 1, 2])
    rel = jnp.asarray([0, 1, 4])
    v = model.init(jax.random.key(0), g, sub, rel, False)
    probs = model.apply(v, g, sub, rel, False)
    assert probs.shape == (3, kg.num_ent)
    assert np.all((np.asarray(probs) > 0) & (np.asarray(probs) < 1))
    # grads flow to the per-entity bias
    def loss(params):
        p = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, g, sub, rel, False
        )
        return jnp.sum(p)
    grads = jax.grad(loss)(v["params"])
    assert float(jnp.abs(grads["bias"]).sum()) > 0


def test_visualization_dot_and_ascii():
    geno = parse_reference_genotypes("[" + GENO + "]")[0]
    dot = to_dot(geno)
    assert "digraph" in dot and "a_max" in dot and "sf_DisMult" in dot
    assert dot.count("->") >= len(geno.alpha_cell)
    txt = to_ascii(geno)
    assert "pre_sub" in txt and "concat[4, 5, 6, 7]" in txt


def test_topk_accuracy():
    logits = jnp.asarray([[5.0, 2, 1], [0, 5, 1], [0, 1, 5], [5, 1, 0]])
    labels = jnp.asarray([0, 1, 0, 1])
    top1, top2 = topk_accuracy(logits, labels, topk=(1, 2))
    assert float(top1) == 50.0
    assert float(top2) == 75.0


def test_weighted_ce_balances_classes():
    # highly unbalanced batch: majority class gets lower weight
    logits = jnp.zeros((10, 2))
    labels = jnp.asarray([0] * 9 + [1])
    l_w = weighted_ce(logits, labels, 2)
    assert np.isfinite(float(l_w))
    # perfect prediction on minority must reduce the loss more than on
    # one majority sample
    confident_min = jnp.zeros((10, 2)).at[9, 1].set(10.0)
    confident_maj = jnp.zeros((10, 2)).at[0, 0].set(10.0)
    assert float(weighted_ce(confident_min, labels, 2)) < float(
        weighted_ce(confident_maj, labels, 2)
    )
