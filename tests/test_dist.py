"""Distributed sharding on the virtual 8-device CPU mesh:
sharded results must equal single-device results (SURVEY.md §4 item 4)."""
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
from mr_gnas_tpu.dist import (
    edge_partitioned_segment_reduce,
    make_mesh,
    replicate,
    shard_graph,
    sharded_scores_rank,
)
from mr_gnas_tpu.kernels import segment_max, segment_mean, segment_sum
from mr_gnas_tpu.models import LPSupernet, lp_search_loss
from mr_gnas_tpu.train.eval import filtered_ranks

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.mark.parametrize("op", ["sum", "mean", "max"])
def test_edge_partitioned_segment_reduce_matches_local(rng, op):
    e, n, d = 64, 10, 8  # e divisible by 8
    data = rng.normal(size=(e, d)).astype(np.float32)
    seg = rng.integers(0, n + 1, size=e).astype(np.int32)
    mask = (seg < n).astype(np.float32)
    mesh = make_mesh((8, 1))
    got = edge_partitioned_segment_reduce(
        jnp.asarray(data), jnp.asarray(seg), n, jnp.asarray(mask), mesh, op
    )
    ref_fn = {"sum": segment_sum, "mean": segment_mean, "max": segment_max}[op]
    want = ref_fn(jnp.asarray(data), jnp.asarray(seg), n, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_sharded_rank_matches_local(rng):
    b, n = 8, 64  # n divisible by 8
    mesh = make_mesh((1, 8), ("data", "model"))
    pred = rng.normal(size=(b, n)).astype(np.float32)
    obj = rng.integers(0, n, size=b)
    labels = (rng.uniform(size=(b, n)) < 0.1).astype(np.float32)
    labels[np.arange(b), obj] = 1.0
    col_mask = np.ones(n, np.float32)
    got = sharded_scores_rank(
        jnp.asarray(pred), jnp.asarray(labels), jnp.asarray(obj),
        jnp.asarray(col_mask), mesh,
    )
    want = filtered_ranks(
        jnp.asarray(pred), jnp.asarray(labels), jnp.asarray(obj), jnp.asarray(col_mask)
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_sharded_lp_supernet_step_matches_single_device(rng):
    """Full supernet loss+grad step: edge rows sharded over 8 devices vs
    unsharded — identical numerics (modulo fp reduction order)."""
    kg = synthetic_kg(num_ent=64, num_rels=4, n_train=300)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    # choose pads so total rows divide 8: n_fwd=40 -> 80 edge rows; nodes 96
    batch = generate_sampled_graph_and_labels(
        kg.train, 80, 0.5, kg.num_rels, adj, deg, 2, "uniform",
        np.random.default_rng(0), n_nodes_pad=96,
    )
    g = batch.graph
    assert g.n_rows % 8 == 0

    spec = CellSpec(task="lp")
    model = LPSupernet(
        num_ent=kg.num_ent, num_rels=kg.num_rels, layers=1, spec=spec,
        feature_dim=16, init_fea_dim=8, num_base_r=4,
        dropout_cell=0.0, drop_aggr=0.0,
    )
    alphas = init_alphas(jax.random.key(0), spec, 1, with_final=True)
    variables = model.init(jax.random.key(1), g, alphas, False)
    params, bstats = variables["params"], variables["batch_stats"]
    trip = jnp.asarray(batch.triplets)
    lab = jnp.asarray(batch.labels)

    def loss_fn(p, graph):
        e, r = model.apply({"params": p, "batch_stats": bstats}, graph, alphas, False)
        return lp_search_loss(e, r, trip, lab)

    l_single, g_single = jax.value_and_grad(loss_fn)(params, g)

    mesh = make_mesh((8, 1))
    g_sharded = shard_graph(g, mesh)
    p_rep = replicate(params, mesh)
    l_shard, g_shard = jax.jit(jax.value_and_grad(loss_fn))(p_rep, g_sharded)

    np.testing.assert_allclose(float(l_single), float(l_shard), rtol=1e-5)
    flat_a = jax.tree_util.tree_leaves(g_single)
    flat_b = jax.tree_util.tree_leaves(g_shard)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_ring_segment_sum_overlapped_equals_local(rng):
    """Ring-overlapped edge-partitioned segment sum == plain segment sum
    (the compute/comm-overlap merge; result node-sharded over the ring)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mr_gnas_tpu.dist.mesh import make_mesh
    from mr_gnas_tpu.dist.partition import ring_segment_sum_overlapped
    from mr_gnas_tpu.kernels.segment import segment_sum

    mesh = make_mesh((8,), ("data",))
    e, n, d = 256, 64, 16
    data = rng.normal(size=(e, d)).astype(np.float32)
    seg = rng.integers(0, n, e).astype(np.int32)
    mask = (rng.uniform(size=e) > 0.25).astype(np.float32)
    row = NamedSharding(mesh, P("data"))
    dj = jax.device_put(jnp.asarray(data), row)
    sj = jax.device_put(jnp.asarray(seg), row)
    mj = jax.device_put(jnp.asarray(mask), row)

    out = jax.jit(
        lambda a, b, c: ring_segment_sum_overlapped(a, b, n, c, mesh)
    )(dj, sj, mj)
    want = segment_sum(jnp.asarray(data), jnp.asarray(seg), n, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5)
