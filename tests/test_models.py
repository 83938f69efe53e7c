"""End-to-end forward/backward through LP and NC networks (tiny configs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_gnas_tpu.cells import CellSpec, init_alphas, parse_reference_genotypes
from mr_gnas_tpu.data import (
    CSRGraph,
    build_blocks,
    get_adj_and_degrees,
    generate_sampled_graph_and_labels,
    synthetic_kg,
    synthetic_nc,
)
from mr_gnas_tpu.graph import build_rel_graph
from mr_gnas_tpu.models import (
    LPNetwork,
    LPSupernet,
    NCNetwork,
    NCSupernet,
    bce_probs_loss,
    lp_search_loss,
    nc_loss,
)

D = 16
REF_GENO = (
    "[Genotype(alpha_cell=[('pre_sub', 1, 0), ('f_sparse_comp', 2, 1), "
    "('f_sparse_comp', 3, 2), ('a_max', 4, 2), ('a_max', 5, 3), "
    "('f_sparse_last', 6, 5), ('f_sparse_last', 7, 5)], "
    "concat_node=[4, 5, 6, 7], score_func='sf_DisMult')]"
)


@pytest.mark.slow
def test_lp_supernet_forward_and_alpha_grads(rng):
    kg = synthetic_kg(num_ent=60, num_rels=4, n_train=200)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    batch = generate_sampled_graph_and_labels(
        kg.train, 40, 0.5, kg.num_rels, adj, deg, 3, "uniform", rng, n_nodes_pad=96
    )
    spec = CellSpec(task="lp")
    model = LPSupernet(
        num_ent=kg.num_ent,
        num_rels=kg.num_rels,
        layers=2,
        spec=spec,
        feature_dim=D,
        init_fea_dim=8,
        num_base_r=5,
        dropout_cell=0.0,
        drop_aggr=0.0,
    )
    alphas = init_alphas(jax.random.key(0), spec, layers=2, with_final=True)
    variables = model.init(jax.random.key(1), batch.graph, alphas, False)
    ent, rel = model.apply(variables, batch.graph, alphas, False)
    assert ent.shape == (batch.graph.n_nodes, D)
    assert rel.shape == (2 * kg.num_rels + 1, D)
    assert np.all(np.isfinite(np.asarray(ent)))

    trip = jnp.asarray(batch.triplets)
    lab = jnp.asarray(batch.labels)

    def loss_fn(params, alphas):
        (e, r), mut = model.apply(
            {**variables, "params": params},
            batch.graph,
            alphas,
            True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(2)},
        )
        return lp_search_loss(e, r, trip, lab)

    gw, ga = jax.grad(loss_fn, argnums=(0, 1))(variables["params"], alphas)
    total_alpha_grad = sum(float(jnp.abs(v).sum()) for v in ga.values())
    assert total_alpha_grad > 0
    emb_grad = gw["emb"]["embedding_h"]
    assert float(jnp.abs(emb_grad).sum()) > 0


@pytest.mark.slow
def test_lp_network_retrain_forward(rng):
    kg = synthetic_kg(num_ent=50, num_rels=3, n_train=150)
    g = build_rel_graph(kg.train, kg.num_ent, kg.num_rels)
    genos = parse_reference_genotypes(REF_GENO)
    model = LPNetwork(
        genotypes=tuple(genos),
        num_ent=kg.num_ent,
        num_rels=kg.num_rels,
        feature_dim=D,
        init_fea_dim=8,
        num_base_r=4,
        dropout_cell=0.0,
        drop_aggr=0.0,
        score_args={"embed_dim": D},
    )
    subj = jnp.asarray([0, 1, 2, 3])
    rel = jnp.asarray([0, 1, 3, 4])  # incl. inverse rels
    variables = model.init(jax.random.key(0), g, subj, rel, False)
    probs = model.apply(variables, g, subj, rel, False)
    assert probs.shape == (4, g.n_nodes)
    assert np.all((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1))

    labels = jnp.zeros((4, g.n_nodes)).at[:, 1].set(1.0)

    def loss_fn(params):
        p, _ = model.apply(
            {**variables, "params": params},
            g, subj, rel, True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)},
        )
        return bce_probs_loss(p, labels)

    grads = jax.grad(loss_fn)(variables["params"])
    assert float(jnp.abs(grads["emb"]["embedding_h"]).sum()) > 0


def test_lp_network_logits_from_matches_logits(rng):
    # the encode-once eval path (encode + logits_from) must reproduce
    # the fused per-batch decode exactly — same gather+score arithmetic
    kg = synthetic_kg(num_ent=50, num_rels=3, n_train=150)
    g = build_rel_graph(kg.train, kg.num_ent, kg.num_rels)
    genos = parse_reference_genotypes(REF_GENO)
    model = LPNetwork(
        genotypes=tuple(genos),
        num_ent=kg.num_ent,
        num_rels=kg.num_rels,
        feature_dim=D,
        init_fea_dim=8,
        num_base_r=4,
        dropout_cell=0.0,
        drop_aggr=0.0,
        score_args={"embed_dim": D},
    )
    subj = jnp.asarray([0, 1, 2, 3])
    rel = jnp.asarray([0, 1, 3, 4])
    variables = model.init(jax.random.key(0), g, subj, rel, False)
    fused = model.apply(variables, g, subj, rel, False, method="logits")
    ent_emb, rel_embed = model.apply(variables, g, False, method="encode")
    hoisted = model.apply(
        variables, ent_emb, rel_embed, subj, rel, False, method="logits_from"
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(hoisted), rtol=1e-6, atol=1e-6
    )


@pytest.mark.slow
def test_lp_network_conve_head(rng):
    kg = synthetic_kg(num_ent=30, num_rels=3, n_train=100)
    g = build_rel_graph(kg.train, kg.num_ent, kg.num_rels)
    genos = parse_reference_genotypes(REF_GENO)
    genos = [
        type(genos[0])(
            alpha_cell=genos[0].alpha_cell,
            concat_node=genos[0].concat_node,
            score_func="sf_ConvE",
        )
    ]
    model = LPNetwork(
        genotypes=tuple(genos),
        num_ent=kg.num_ent,
        num_rels=kg.num_rels,
        feature_dim=D,
        init_fea_dim=8,
        num_base_r=4,
        score_args={"embed_dim": D, "num_filt": 4, "ker_sz": 3, "k_w": 4, "k_h": 4},
    )
    subj = jnp.asarray([0, 1])
    rel = jnp.asarray([0, 1])
    variables = model.init(jax.random.key(0), g, subj, rel, False)
    probs = model.apply(variables, g, subj, rel, False)
    assert probs.shape == (2, g.n_nodes)


def _nc_setup(rng, layers=2):
    ds = synthetic_nc(num_nodes=80, num_rels=4, num_classes=3, n_target=12)
    csr = CSRGraph(ds.src, ds.dst, ds.etype, ds.num_nodes)
    seeds = ds.target_ids[:5]
    blocks, seed_pos = build_blocks(csr, seeds, layers=layers)
    return ds, blocks, seed_pos, seeds


@pytest.mark.slow
def test_nc_supernet_forward(rng):
    ds, blocks, seed_pos, seeds = _nc_setup(rng)
    spec = CellSpec(task="nc")
    model = NCSupernet(
        num_nodes=ds.num_nodes,
        num_classes=ds.num_classes,
        num_rels=ds.num_rels,
        layers=2,
        spec=spec,
        feature_dim=D,
        init_fea_dim=8,
        num_base_r=4,
    )
    alphas = init_alphas(jax.random.key(0), spec, layers=2)
    variables = model.init(jax.random.key(1), blocks, alphas, False)
    logits = model.apply(variables, blocks, alphas, False)
    assert logits.shape == (blocks[-1].n_dst, ds.num_classes)

    labels = jnp.asarray(ds.labels[:5])
    mask = jnp.ones(5)

    def loss_fn(params, alphas):
        out, _ = model.apply(
            {**variables, "params": params}, blocks, alphas, True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.key(2)},
        )
        return nc_loss(out[jnp.asarray(seed_pos)], labels, mask)

    gw, ga = jax.grad(loss_fn, argnums=(0, 1))(variables["params"], alphas)
    assert sum(float(jnp.abs(v).sum()) for v in ga.values()) > 0


@pytest.mark.slow
def test_nc_network_retrain_learns_synthetic(rng):
    """A compiled NC net should fit the synthetic majority-relation task."""
    import optax

    ds = synthetic_nc(num_nodes=80, num_rels=4, num_classes=3, n_target=30, seed=3)
    csr = CSRGraph(ds.src, ds.dst, ds.etype, ds.num_nodes)
    seeds = ds.target_ids  # full batch
    blocks, seed_pos = build_blocks(csr, seeds, layers=1)
    geno = parse_reference_genotypes(
        "[Genotype(alpha_cell=[('pre_mult', 1, 0), ('f_dense', 2, 1), "
        "('f_identity', 3, 2), ('a_max', 4, 2), ('a_sum', 5, 3), "
        "('f_identity', 6, 5), ('f_dense_last', 7, 5)], "
        "concat_node=[4, 5, 6, 7], score_func=None)]"
    )
    model = NCNetwork(
        genotypes=tuple(geno),
        num_nodes=ds.num_nodes,
        num_classes=ds.num_classes,
        num_rels=ds.num_rels,
        feature_dim=D,
        init_fea_dim=8,
        num_base_r=4,
    )
    variables = model.init(jax.random.key(0), blocks, False)
    params, bstats = variables["params"], variables["batch_stats"]
    labels = jnp.asarray(ds.labels)
    mask = jnp.ones(len(seeds))
    sp = jnp.asarray(seed_pos)
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bstats, opt_state):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bstats}, blocks, True,
                mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)},
            )
            return nc_loss(out[sp], labels, mask), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    loss0 = None
    for i in range(60):
        params, bstats, opt_state, loss = step(params, bstats, opt_state)
        if i == 0:
            loss0 = float(loss)
    assert float(loss) < loss0 * 0.5, (loss0, float(loss))


def test_conve_dim_mismatch_raises_clearly(rng):
    """sf_ConvE with embed_dim != feature_dim must raise an actionable
    ValueError at setup, not an opaque reshape failure (found driving the
    CLI with the default ConvE genotype at feature-dim 32)."""
    import pytest as _pytest

    from mr_gnas_tpu.cells.genotype import Genotype
    from mr_gnas_tpu.models import LPNetwork

    geno = Genotype(
        alpha_cell=[("pre_sub", 1, 0), ("a_sum", 2, 1)],
        concat_node=[2],
        score_func="sf_ConvE",
    )
    net = LPNetwork(
        genotypes=(geno,), num_ent=50, num_rels=3, feature_dim=32,
        init_fea_dim=16, num_base_r=7,
        score_args={"embed_dim": 128, "k_w": 8, "k_h": 16},
    )
    from mr_gnas_tpu.data import synthetic_kg
    from mr_gnas_tpu.graph.build import build_rel_graph

    kg = synthetic_kg(num_ent=50, num_rels=3, n_train=60, seed=0)
    g = build_rel_graph(kg.train, 50, 3)
    with _pytest.raises(ValueError, match="sf_ConvE needs"):
        net.init(
            jax.random.key(0), g, jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32)
        )


def test_search_loss_bf16_path_matches_f32(rng):
    """dtype=bf16 in the triplet score path (half-byte gather/products/
    grad-scatter, models/lp._gather_sro) must track the f32 loss closely
    and produce finite grads; dtype=None must be bitwise-identical to the
    original formulation."""
    import numpy as np

    from mr_gnas_tpu.models.lp import lp_search_loss, lp_search_loss_sf

    k = jax.random.key(0)
    ent = jax.random.normal(k, (64, 32))
    rel = jax.random.normal(jax.random.key(1), (11, 32))
    trip = jnp.stack(
        [
            jax.random.randint(jax.random.key(2), (200,), 0, 64),
            jax.random.randint(jax.random.key(3), (200,), 0, 11),
            jax.random.randint(jax.random.key(4), (200,), 0, 64),
        ],
        axis=1,
    )
    lab = (jax.random.uniform(jax.random.key(5), (200,)) < 0.5).astype(jnp.float32)

    f32 = lp_search_loss(ent, rel, trip, lab)
    bf = lp_search_loss(ent, rel, trip, lab, dtype=jnp.bfloat16)
    assert bf.dtype == jnp.float32
    np.testing.assert_allclose(float(f32), float(bf), rtol=2e-2)

    g = jax.grad(lambda e: lp_search_loss(e, rel, trip, lab, dtype=jnp.bfloat16))(ent)
    assert g.dtype == ent.dtype  # cast-bwd restores the table dtype
    assert bool(jnp.all(jnp.isfinite(g)))
    g32 = jax.grad(lambda e: lp_search_loss(e, rel, trip, lab))(ent)
    # bf16 grad accumulation stays within ~1% of f32 on this scale
    rel_err = float(jnp.linalg.norm(g - g32) / jnp.linalg.norm(g32))
    assert rel_err < 2e-2

    sf_w = jnp.array([0.3, 0.7])
    s32 = lp_search_loss_sf(ent, rel, trip, lab, sf_w)
    sbf = lp_search_loss_sf(ent, rel, trip, lab, sf_w, dtype=jnp.bfloat16)
    np.testing.assert_allclose(float(s32), float(sbf), rtol=2e-2)


def test_grouped_search_loss_equals_flat(rng):
    """lp_search_loss_grouped on the grouped layout must equal
    lp_search_loss on the equivalent flat (tiled) triplet layout —
    same objective, restructured for shared (s*r)/(r*o) rows."""
    import numpy as np

    from mr_gnas_tpu.models.lp import lp_search_loss, lp_search_loss_grouped

    nprng = np.random.default_rng(0)
    P, nh, nt, ne, nr, d = 50, 2, 3, 40, 7, 16
    pos = np.stack(
        [
            nprng.integers(ne, size=P),
            nprng.integers(nr, size=P),
            nprng.integers(ne, size=P),
        ],
        axis=1,
    ).astype(np.int32)
    neg_heads = nprng.integers(ne, size=(P, nh)).astype(np.int32)
    neg_tails = nprng.integers(ne, size=(P, nt)).astype(np.int32)

    # equivalent flat layout: positives then per-group corrupted copies
    flats = [pos]
    for j in range(nt):
        t = pos.copy()
        t[:, 2] = neg_tails[:, j]
        flats.append(t)
    for j in range(nh):
        t = pos.copy()
        t[:, 0] = neg_heads[:, j]
        flats.append(t)
    flat = np.concatenate(flats)
    labels = np.zeros(len(flat), dtype=np.float32)
    labels[:P] = 1

    ent = jax.random.normal(jax.random.key(0), (ne, d))
    rel = jax.random.normal(jax.random.key(1), (nr, d))

    lf = lp_search_loss(ent, rel, jnp.asarray(flat), jnp.asarray(labels))
    lg = lp_search_loss_grouped(
        ent, rel, jnp.asarray(pos), jnp.asarray(neg_heads), jnp.asarray(neg_tails)
    )
    np.testing.assert_allclose(float(lf), float(lg), rtol=1e-5)

    gf = jax.grad(lambda e: lp_search_loss(e, rel, jnp.asarray(flat), jnp.asarray(labels)))(ent)
    gg = jax.grad(
        lambda e: lp_search_loss_grouped(
            e, rel, jnp.asarray(pos), jnp.asarray(neg_heads), jnp.asarray(neg_tails)
        )
    )(ent)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gg), rtol=1e-4, atol=1e-6)


def test_sampler_grouped_mode(rng):
    """grouped=True emits positives-only triplets plus per-positive
    negative-group arrays with in-range local entity ids."""
    import numpy as np

    from mr_gnas_tpu.data import (
        generate_sampled_graph_and_labels,
        get_adj_and_degrees,
        synthetic_kg,
    )

    kg = synthetic_kg(num_ent=100, num_rels=5, n_train=400, seed=0)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    b = generate_sampled_graph_and_labels(
        kg.train, 64, 0.5, kg.num_rels, adj, deg, 5, "uniform",
        np.random.default_rng(0), grouped=True,
    )
    assert b.triplets.shape == (64, 3)
    assert b.neg_heads.shape == (64, 2) and b.neg_tails.shape == (64, 3)
    n_local = b.graph.n_nodes
    assert b.neg_heads.max() < n_local and b.neg_tails.max() < n_local
    assert b.labels.shape == (64,)


def test_grouped_sf_mixture_equals_flat(rng):
    """The grouped score-function mixture (sf_weights path of
    lp_search_loss_grouped) must equal lp_search_loss_sf on the
    equivalent flat layout."""
    import numpy as np

    from mr_gnas_tpu.models.lp import lp_search_loss_grouped, lp_search_loss_sf

    nprng = np.random.default_rng(1)
    P, nh, nt, ne, nr, d = 40, 3, 2, 30, 5, 12
    pos = np.stack(
        [
            nprng.integers(ne, size=P),
            nprng.integers(nr, size=P),
            nprng.integers(ne, size=P),
        ],
        axis=1,
    ).astype(np.int32)
    neg_heads = nprng.integers(ne, size=(P, nh)).astype(np.int32)
    neg_tails = nprng.integers(ne, size=(P, nt)).astype(np.int32)
    flats = [pos]
    for j in range(nt):
        t = pos.copy()
        t[:, 2] = neg_tails[:, j]
        flats.append(t)
    for j in range(nh):
        t = pos.copy()
        t[:, 0] = neg_heads[:, j]
        flats.append(t)
    flat = np.concatenate(flats)
    labels = np.zeros(len(flat), dtype=np.float32)
    labels[:P] = 1

    ent = jax.random.normal(jax.random.key(7), (ne, d))
    rel = jax.random.normal(jax.random.key(8), (nr, d))
    sf_w = jnp.array([0.4, 0.6])

    lf = lp_search_loss_sf(ent, rel, jnp.asarray(flat), jnp.asarray(labels), sf_w, gamma=12.0)
    lg = lp_search_loss_grouped(
        ent, rel, jnp.asarray(pos), jnp.asarray(neg_heads), jnp.asarray(neg_tails),
        sf_weights=sf_w, gamma=12.0,
    )
    np.testing.assert_allclose(float(lf), float(lg), rtol=1e-5)


def test_chunked_loss_chunk1_equals_grouped(rng):
    """lp_search_loss_chunked at G == P (chunk size 1) computes the
    grouped layout's function on the same negative arrays."""
    import numpy as np

    from mr_gnas_tpu.models.lp import lp_search_loss_chunked, lp_search_loss_grouped

    nprng = np.random.default_rng(1)
    P, nh, nt, ne, nr, d = 24, 2, 3, 40, 7, 16
    pos = np.stack(
        [nprng.integers(ne, size=P), nprng.integers(nr, size=P), nprng.integers(ne, size=P)],
        axis=1,
    ).astype(np.int32)
    neg_heads = nprng.integers(ne, size=(P, nh)).astype(np.int32)
    neg_tails = nprng.integers(ne, size=(P, nt)).astype(np.int32)
    ent = jax.random.normal(jax.random.key(2), (ne, d))
    rel = jax.random.normal(jax.random.key(3), (nr, d))
    lg = lp_search_loss_grouped(
        ent, rel, jnp.asarray(pos), jnp.asarray(neg_heads), jnp.asarray(neg_tails)
    )
    lc = lp_search_loss_chunked(
        ent, rel, jnp.asarray(pos), jnp.asarray(neg_heads), jnp.asarray(neg_tails)
    )
    np.testing.assert_allclose(float(lg), float(lc), rtol=1e-6)
    sfw = jnp.asarray([0.3, 0.7])
    lg = lp_search_loss_grouped(
        ent, rel, jnp.asarray(pos), jnp.asarray(neg_heads), jnp.asarray(neg_tails),
        sf_weights=sfw, gamma=12.0,
    )
    lc = lp_search_loss_chunked(
        ent, rel, jnp.asarray(pos), jnp.asarray(neg_heads), jnp.asarray(neg_tails),
        sf_weights=sfw, gamma=12.0,
    )
    np.testing.assert_allclose(float(lg), float(lc), rtol=1e-6)


def test_chunked_loss_equals_flat_expansion(rng):
    """Chunk-shared negatives expanded to the flat per-row layout give
    the same loss and entity-table gradient as lp_search_loss."""
    import numpy as np

    from mr_gnas_tpu.models.lp import lp_search_loss, lp_search_loss_chunked

    nprng = np.random.default_rng(4)
    P, G, nh, nt, ne, nr, d = 48, 4, 2, 3, 40, 7, 16
    C = P // G
    pos = np.stack(
        [nprng.integers(ne, size=P), nprng.integers(nr, size=P), nprng.integers(ne, size=P)],
        axis=1,
    ).astype(np.int32)
    neg_heads = nprng.integers(ne, size=(G, nh)).astype(np.int32)
    neg_tails = nprng.integers(ne, size=(G, nt)).astype(np.int32)

    flats = [pos]
    for g in range(G):
        rows = pos[g * C : (g + 1) * C]
        for j in range(nt):
            t = rows.copy()
            t[:, 2] = neg_tails[g, j]
            flats.append(t)
        for j in range(nh):
            t = rows.copy()
            t[:, 0] = neg_heads[g, j]
            flats.append(t)
    flat = np.concatenate(flats)
    labels = np.zeros(len(flat), dtype=np.float32)
    labels[:P] = 1

    ent = jax.random.normal(jax.random.key(5), (ne, d))
    rel = jax.random.normal(jax.random.key(6), (nr, d))
    lf = lp_search_loss(ent, rel, jnp.asarray(flat), jnp.asarray(labels))
    lc = lp_search_loss_chunked(
        ent, rel, jnp.asarray(pos), jnp.asarray(neg_heads), jnp.asarray(neg_tails)
    )
    np.testing.assert_allclose(float(lf), float(lc), rtol=1e-5)

    gf = jax.grad(lambda e: lp_search_loss(e, rel, jnp.asarray(flat), jnp.asarray(labels)))(ent)
    gc = jax.grad(
        lambda e: lp_search_loss_chunked(
            e, rel, jnp.asarray(pos), jnp.asarray(neg_heads), jnp.asarray(neg_tails)
        )
    )(ent)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gc), rtol=1e-4, atol=1e-6)


def test_sampler_chunked_mode(rng):
    """neg_chunk emits [G, .] shared-negative arrays with G dividing P."""
    import numpy as np

    from mr_gnas_tpu.data import (
        generate_sampled_graph_and_labels,
        get_adj_and_degrees,
        synthetic_kg,
    )

    kg = synthetic_kg(num_ent=100, num_rels=5, n_train=400, seed=0)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    b = generate_sampled_graph_and_labels(
        kg.train, 64, 0.5, kg.num_rels, adj, deg, 5, "uniform",
        np.random.default_rng(0), grouped=True, neg_chunk=16,
    )
    assert b.triplets.shape == (64, 3)
    assert b.neg_heads.shape == (4, 2) and b.neg_tails.shape == (4, 3)
    n_local = b.graph.n_nodes
    assert b.neg_heads.max() < n_local and b.neg_tails.max() < n_local
    # chunk larger than P -> one shared group
    b1 = generate_sampled_graph_and_labels(
        kg.train, 64, 0.5, kg.num_rels, adj, deg, 5, "uniform",
        np.random.default_rng(0), grouped=True, neg_chunk=1000,
    )
    assert b1.neg_heads.shape == (1, 2)
