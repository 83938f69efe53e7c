"""TP-analog (entity-table / score-column sharding) equality tests.

The 1-vs-N decoder's [B, num_ent] score matmul (reference:
models/model_lp.py:135) is the tensor whose columns shard over the
'model' mesh axis (SURVEY §2.9 TP row). Consumers under test:

  * ``LPNetwork.logits_cols`` — per-shard column block of the decode,
    sliced from the encoded entity table inside shard_map;
  * ``train.eval.filtered_ranks_cols`` — rank-by-count with two psums,
    no full score row on any device (wired into lp-train eval when
    mesh has model > 1);
  * ``serve.Predictor(mesh=...)`` — row-sharded precomputed entity
    table via GSPMD for serving.

All assert exact rank / allclose score equality against the unsharded
path; the WN18RR-scale test uses the real 40,943-entity table size
(the config where replicating the table stops being free).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mr_gnas_tpu.cells.genotype import parse_reference_genotypes
from mr_gnas_tpu.data import synthetic_kg
from mr_gnas_tpu.dist import make_mesh, replicate
from mr_gnas_tpu.dist.spmd import build_local_graph, local_view, shard_local_tree
from mr_gnas_tpu.graph import build_rel_graph
from mr_gnas_tpu.models import LPNetwork, bce_logits_loss
from mr_gnas_tpu.train.eval import filtered_ranks, filtered_ranks_cols

GENO_FMT = (
    "[Genotype(alpha_cell=[('pre_sub', 1, 0), ('f_sparse_comp', 2, 1), "
    "('f_sparse_comp', 3, 2), ('a_max', 4, 2), ('a_max', 5, 3), "
    "('f_sparse_last', 6, 5), ('f_sparse_last', 7, 5)], "
    "concat_node=[4, 5, 6, 7], score_func='{sf}')]"
)


def _setup(num_ent, n_train, score_func, feature_dim=16, score_args=None):
    kg = synthetic_kg(num_ent=num_ent, num_rels=11, n_train=n_train, seed=0)
    graph = build_rel_graph(kg.train, kg.num_ent, kg.num_rels, pad_multiple=8)
    geno = parse_reference_genotypes(GENO_FMT.format(sf=score_func))
    model = LPNetwork(
        genotypes=tuple(geno), num_ent=kg.num_ent, num_rels=kg.num_rels,
        feature_dim=feature_dim, init_fea_dim=feature_dim, num_base_r=4,
        dropout_cell=0.0, drop_aggr=0.0, score_args=score_args,
    )
    rng = np.random.default_rng(0)
    b = 16
    subj = jnp.asarray(rng.integers(kg.num_ent, size=b).astype(np.int32))
    rel = jnp.asarray(rng.integers(kg.num_rels, size=b).astype(np.int32))
    obj = jnp.asarray(rng.integers(kg.num_ent, size=b).astype(np.int32))
    labels = (rng.random((b, graph.n_nodes)) < 0.01).astype(np.float32)
    labels[np.arange(b), np.asarray(obj)] = 1.0  # obj is a known positive
    labels[:, kg.num_ent:] = 0.0
    variables = model.init(jax.random.key(0), graph, subj, rel, False)
    return kg, graph, model, variables, subj, rel, obj, jnp.asarray(labels)


@pytest.mark.parametrize(
    "score_func,score_args",
    [
        ("sf_DisMult", None),
        ("sf_TransE", None),
        (
            "sf_ConvE",
            {"embed_dim": 16, "k_w": 4, "k_h": 4, "num_filt": 8, "ker_sz": 3,
             "feat_drop": 0.0, "conve_hid_drop": 0.0},
        ),
    ],
)
def test_logits_cols_match_full(score_func, score_args):
    """Concatenated per-shard column logits == the full [B, N] decode,
    for every score function (the ConvE case exercises the conv + BN
    head against a sliced table)."""
    kg, graph, model, variables, subj, rel, obj, labels = _setup(
        200, 1024, score_func,
        feature_dim=16 if score_func != "sf_ConvE" else 16,
        score_args=score_args,
    )
    full = model.apply(variables, graph, subj, rel, False, method="logits")

    mesh = make_mesh((1, 8), ("data", "model"))
    gstack = shard_local_tree(build_local_graph(graph, 1), mesh)
    gspec = jax.tree.map(lambda _: P("data"), gstack)
    n_cols = graph.n_nodes // 8
    v_rep = replicate(variables, mesh)

    def f(v, gstack, subj, rel):
        g = local_view(gstack)
        out = model.apply(v, g, subj, rel, n_cols, "model", False,
                          method="logits_cols")
        # data axis has size 1 here: psum is the identity, and it marks
        # the value replicated over 'data' for the out_specs vma check
        return jax.lax.psum(out, "data")

    cols = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(), gspec, P(), P()),
        out_specs=P(None, "model"),
    )(v_rep, gstack, subj, rel)
    np.testing.assert_allclose(np.asarray(cols), np.asarray(full), rtol=2e-5, atol=2e-5)


def test_logits_cols_rejects_out_bias():
    score_args = {"embed_dim": 16, "k_w": 4, "k_h": 4, "num_filt": 8,
                  "ker_sz": 3, "conve_out_bias": True}
    kg, graph, model, variables, subj, rel, obj, labels = _setup(
        200, 1024, "sf_ConvE", score_args=score_args
    )
    mesh = make_mesh((1, 8), ("data", "model"))
    gstack = shard_local_tree(build_local_graph(graph, 1), mesh)
    gspec = jax.tree.map(lambda _: P("data"), gstack)
    with pytest.raises(ValueError, match="out_bias"):
        jax.shard_map(
            lambda v, gs, s, r: jax.lax.psum(model.apply(
                v, local_view(gs), s, r, graph.n_nodes // 8, "model", False,
                method="logits_cols",
            ), "data"),
            mesh=mesh, in_specs=(P(), gspec, P(), P()),
            out_specs=P(None, "model"),
        )(replicate(variables, mesh), gstack, subj, rel)


@pytest.mark.slow
def test_tp_rank_equality_wn_scale():
    """(data=4, model=2) mesh at WN18RR's real entity count (40,943):
    edge rows + query rows shard over 'data', the decode's entity
    columns + filtered ranking shard over 'model' (lp-train's eval
    wiring) — ranks match single-device EXACTLY and the eval loss
    matches to fp tolerance, with the column shards actually holding
    N/2 entity rows each."""
    kg, graph, model, variables, subj, rel, obj, labels = _setup(
        40943, 4096, "sf_DisMult"
    )
    params, bstats = variables["params"], variables.get("batch_stats", {})
    col_mask = graph.node_mask

    logits1 = model.apply(variables, graph, subj, rel, False, method="logits")
    ranks1 = filtered_ranks(logits1, labels, obj, col_mask)
    loss1 = bce_logits_loss(logits1, labels, None, col_mask)

    mesh = make_mesh((4, 2), ("data", "model"))
    data_n, model_n = 4, 2
    gstack = shard_local_tree(build_local_graph(graph, data_n), mesh)
    gspec = jax.tree.map(lambda _: P("data"), gstack)
    n_cols = graph.n_nodes // model_n
    p_rep, bs_rep = replicate((params, bstats), mesh)

    def f(params, bstats, gstack, subj, rel, obj, labels, cmask):
        g = local_view(gstack)
        logits = model.apply(
            {"params": params, "batch_stats": bstats},
            g, subj, rel, n_cols, "model", False, method="logits_cols",
        )
        assert logits.shape[1] == n_cols  # the shard really is N/2 columns
        loss = bce_logits_loss(
            logits, labels, None, cmask, axis="data", col_axis="model"
        )
        ranks = filtered_ranks_cols(logits, labels, obj, cmask, "model")
        return ranks, loss

    ranks8, loss8 = jax.jit(
        lambda *a: jax.shard_map(
            f, mesh=mesh,
            in_specs=(P(), P(), gspec, P("data"), P("data"), P("data"),
                      P("data", "model"), P("model")),
            out_specs=(P("data"), P()),
        )(*a)
    )(p_rep, bs_rep, gstack, subj, rel, obj, labels, col_mask)

    np.testing.assert_array_equal(np.asarray(ranks8), np.asarray(ranks1))
    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)


def test_serve_predictor_sharded_table():
    """Predictor(mesh=...) really shards the precomputed entity table
    over 'model' and serves identical scores / top-k to the unsharded
    Predictor."""
    from mr_gnas_tpu.serve import Predictor

    kg, graph, model, variables, subj, rel, obj, labels = _setup(
        200, 1024, "sf_DisMult"
    )
    p1 = Predictor(model, variables, graph)
    mesh = make_mesh((8,), ("model",))
    p8 = Predictor(model, variables, graph, mesh=mesh)

    shard_shapes = {s.data.shape for s in p8.ent_emb.addressable_shards}
    assert shard_shapes == {(graph.n_nodes // 8, p8.ent_emb.shape[1])}

    s1 = np.asarray(p1.scores(subj, rel))
    s8 = np.asarray(p8.scores(subj, rel))
    np.testing.assert_allclose(s8, s1, rtol=2e-5, atol=2e-6)
    v1, i1 = p1.topk(subj, rel, k=5)
    v8, i8 = p8.topk(subj, rel, k=5)
    np.testing.assert_array_equal(i8, i1)
    np.testing.assert_allclose(v8, v1, rtol=2e-5, atol=2e-6)
    assert int(i8.max()) < kg.num_ent  # padded columns never rank
