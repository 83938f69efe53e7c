"""Rematerialization option: identical loss/grads, lower live memory."""
import jax
import jax.numpy as jnp
import numpy as np

from mr_gnas_tpu.cells import CellSpec, init_alphas
from mr_gnas_tpu.data import (
    generate_sampled_graph_and_labels,
    get_adj_and_degrees,
    synthetic_kg,
)
from mr_gnas_tpu.models import LPSupernet, lp_search_loss
import pytest

pytestmark = pytest.mark.slow


def test_remat_grads_match(rng):
    kg = synthetic_kg(num_ent=60, num_rels=4, n_train=200)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    b = generate_sampled_graph_and_labels(
        kg.train, 40, 0.5, kg.num_rels, adj, deg, 2, "uniform",
        np.random.default_rng(0), n_nodes_pad=96,
    )
    spec = CellSpec(task="lp")
    alphas = init_alphas(jax.random.key(0), spec, 2, with_final=True)
    trip, lab = jnp.asarray(b.triplets), jnp.asarray(b.labels)
    outs = {}
    for remat in (False, True):
        m = LPSupernet(
            num_ent=kg.num_ent, num_rels=kg.num_rels, layers=2, spec=spec,
            feature_dim=16, init_fea_dim=8, num_base_r=4,
            dropout_cell=0.0, drop_aggr=0.0, remat=remat,
        )
        v = m.init(jax.random.key(1), b.graph, alphas, False)

        def loss(p):
            e, r = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, b.graph, alphas, False
            )
            return lp_search_loss(e, r, trip, lab)

        outs[remat] = jax.value_and_grad(loss)(v["params"])
    assert abs(float(outs[False][0]) - float(outs[True][0])) < 1e-6
    for a, c in zip(
        jax.tree_util.tree_leaves(outs[False][1]),
        jax.tree_util.tree_leaves(outs[True][1]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6)
