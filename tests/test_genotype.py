"""Genotype schema, decode-from-alphas, and serialization round-trips."""
import jax
import numpy as np

from mr_gnas_tpu.cells import (
    CellSpec,
    Genotype,
    decode_genotype,
    decode_genotypes,
    genotypes_from_json,
    genotypes_to_json,
    init_alphas,
    layer_weights,
    parse_reference_genotypes,
)

REF_STR = (
    "[Genotype(alpha_cell=[('pre_sub', 1, 0), ('f_sparse_comp', 2, 1), "
    "('f_sparse_comp', 3, 2), ('a_max', 4, 2), ('a_max', 5, 3), "
    "('f_sparse_last', 6, 5), ('f_sparse_last', 7, 5)], "
    "concat_node=[4, 5, 6, 7], score_func='sf_DisMult')]"
)


def test_parse_reference_string():
    genos = parse_reference_genotypes(REF_STR)
    assert len(genos) == 1
    g = genos[0]
    assert g.alpha_cell[0] == ("pre_sub", 1, 0)
    assert g.alpha_cell[-1] == ("f_sparse_last", 7, 5)
    assert g.concat_node == (4, 5, 6, 7)
    assert g.score_func == "sf_DisMult"
    assert g.num_nodes == 7


def test_json_roundtrip():
    g = parse_reference_genotypes(REF_STR)[0]
    g2 = Genotype.from_json(g.to_json())
    assert g == g2
    lst = genotypes_from_json(genotypes_to_json([g, g2]))
    assert lst == [g, g2]


def test_reference_str_roundtrip():
    g = parse_reference_genotypes(REF_STR)[0]
    again = parse_reference_genotypes("[" + g.to_reference_str() + "]")[0]
    assert g == again


def test_cellspec_edge_counts():
    # FB15k-237 search defaults (search/mr_lp_search.py:288-290)
    spec = CellSpec(task="lp", zero_nodes=1, first_nodes=2, last_nodes=2)
    assert spec.n_zero_edges == 1
    assert spec.n_first_edges == 3  # 1 + 2
    assert spec.n_middle_edges == 2
    assert spec.n_last_edges == 5  # 2 + 3


def test_decode_recovers_published_genotype():
    """Craft alphas whose argmax/best-edge decode yields the published
    FB15k-237 genotype (reference README.md:26)."""
    spec = CellSpec(task="lp", zero_nodes=1, first_nodes=2, last_nodes=2)
    groups = spec.groups
    z = np.zeros((1, len(groups["zero"])), np.float32)
    z[0, groups["zero"].index("pre_sub")] = 5.0
    first = np.zeros((3, len(groups["first"])), np.float32)
    # node 2 <- edge 0 (from node 1): f_sparse_comp
    first[0, groups["first"].index("f_sparse_comp")] = 5.0
    # node 3: inputs are edges 1 (from h_in) and 2 (from node 2) -> pick edge 2
    first[1, groups["first"].index("f_comp")] = 1.0
    first[2, groups["first"].index("f_sparse_comp")] = 5.0
    middle = np.zeros((2, len(groups["middle"])), np.float32)
    middle[0, groups["middle"].index("a_max")] = 5.0
    middle[1, groups["middle"].index("a_max")] = 5.0
    last = np.zeros((5, len(groups["last"])), np.float32)
    # node 6: inputs edges 0 (node 4), 1 (node 5) -> pick 5, f_sparse_last
    last[1, groups["last"].index("f_sparse_last")] = 5.0
    # node 7: inputs edges 2 (node 4), 3 (node 5), 4 (node 6) -> pick 5
    last[3, groups["last"].index("f_sparse_last")] = 5.0

    weights = {
        "zero": jax.nn.softmax(z, axis=1),
        "first": jax.nn.softmax(first, axis=1),
        "middle": jax.nn.softmax(middle, axis=1),
        "last": jax.nn.softmax(last, axis=1),
    }
    got = decode_genotype(weights, spec, score_func="sf_DisMult")
    want = parse_reference_genotypes(REF_STR)[0]
    assert got == want


def test_init_alphas_shapes_and_decode_all_layers():
    spec = CellSpec(task="lp")
    alphas = init_alphas(jax.random.key(0), spec, layers=2, with_final=True)
    assert alphas["zero"].shape == (2, 3)
    assert alphas["first"].shape == (6, 5)
    assert alphas["middle"].shape == (4, 3)
    assert alphas["last"].shape == (10, 4)
    assert alphas["final"].shape == (1, 2)
    assert float(np.abs(np.asarray(alphas["first"])).max()) < 0.02
    genos = decode_genotypes(alphas, spec, layers=2)
    assert len(genos) == 2
    for g in genos:
        assert g.num_nodes == 7
        # f_zero never decodes into a genotype (model_search.py:232-241)
        assert all(op != "f_zero" for op, _, _ in g.alpha_cell)


def test_layer_weights_softmaxed():
    spec = CellSpec(task="nc")
    alphas = init_alphas(jax.random.key(1), spec, layers=2)
    w = layer_weights(alphas, spec, 1)
    for stage, n in spec.edge_counts().items():
        assert w[stage].shape[0] == n
        np.testing.assert_allclose(np.asarray(w[stage]).sum(1), 1.0, rtol=1e-5)
