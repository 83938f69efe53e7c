"""Data pipeline: samplers, negative sampling, 1-vs-N labels, blocks."""
import numpy as np

from mr_gnas_tpu.data import (
    CSRGraph,
    build_blocks,
    generate_sampled_graph_and_labels,
    get_adj_and_degrees,
    iterate_batches,
    multi_hot,
    negative_sampling,
    process,
    synthetic_kg,
    synthetic_nc,
)


def test_minikg_structure_and_determinism():
    from mr_gnas_tpu.data import load_dataset

    kg = load_dataset("minikg-small")
    kg2 = load_dataset("minikg-small")
    assert (kg.train == kg2.train).all() and (kg.test == kg2.test).all()
    assert kg.num_rels == 2 + 3 * 4
    # held-out splits contain only composed relations (answerable via the
    # member_of + hub-map edges that remain in train)
    assert (kg.valid[:, 1] >= 2 + 4).all()
    assert (kg.test[:, 1] >= 2 + 4).all()
    # both hub-valued and leaf-valued answers present (degree-bias guard)
    n_hubs = 16
    assert (kg.test[:, 2] < n_hubs).any() and (kg.test[:, 2] >= n_hubs).any()
    # no test triple appears in train
    tr = {tuple(t) for t in kg.train.tolist()}
    assert not any(tuple(t) in tr for t in kg.test.tolist())


def test_negative_sampling_counts(rng):
    pos = np.array([[0, 0, 1], [1, 1, 2], [2, 0, 3]])
    samples, labels = negative_sampling(pos, num_entity=4, negative_rate=5, rng=rng)
    assert samples.shape == (3 * 6, 3)
    assert labels[:3].sum() == 3 and labels[3:].sum() == 0
    # negatives corrupt exactly one of head/tail, keep relation
    for i, neg in enumerate(samples[3:]):
        orig = pos[i % 3]
        assert neg[1] == orig[1]
        assert (neg[0] == orig[0]) or (neg[2] == orig[2])


def test_generate_sampled_graph_static_shapes(rng):
    kg = synthetic_kg(num_ent=100, num_rels=5, n_train=400)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    batches = [
        generate_sampled_graph_and_labels(
            kg.train, 60, 0.5, kg.num_rels, adj, deg, 4, "uniform", rng,
            n_nodes_pad=128,
        )
        for _ in range(3)
    ]
    shapes = {(b.graph.n_fwd, b.graph.n_nodes, b.triplets.shape, b.labels.shape) for b in batches}
    assert len(shapes) == 1  # static across samples
    b = batches[0]
    assert b.graph.n_fwd == 30  # split_size * sample_size
    assert b.triplets.shape == (60 * 5, 3)
    # triplet entity ids are valid local node ids
    n_real = int(np.asarray(b.graph.node_mask).sum())
    assert b.triplets[:, [0, 2]].max() < n_real
    # global ids round-trip to original entities
    gids = np.asarray(b.graph.global_ids)[:n_real]
    assert np.all(gids < kg.num_ent)


def test_neighbor_sampler_connected(rng):
    kg = synthetic_kg(num_ent=50, num_rels=4, n_train=200)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    b = generate_sampled_graph_and_labels(
        kg.train, 40, 0.5, kg.num_rels, adj, deg, 2, "neighbor", rng
    )
    assert b.graph.n_fwd == 20


def test_process_labels():
    data = {
        "train": np.array([[0, 0, 1], [0, 0, 2], [1, 1, 0]]),
        "valid": np.array([[0, 0, 3]]),
        "test": np.array([[2, 1, 0]]),
    }
    t = process(data, num_rels=2)
    # train: distinct (s,r) pairs incl. inverse queries
    keys = {tuple(x[:2]) for x in t["train"].triples}
    assert (0, 0) in keys and (1, 2) in keys and (2, 2) in keys
    # the (0,0) train query has labels {1,2} (train only)
    i = [j for j, x in enumerate(t["train"].triples) if tuple(x[:2]) == (0, 0)][0]
    assert set(t["train"].labels[i]) == {1, 2}
    # valid_tail label for (0,0,3) includes all-splits objects {1,2,3}
    assert set(t["valid_tail"].labels[0]) == {1, 2, 3}
    # head query uses rel + num_rels
    assert t["valid_head"].triples[0][1] == 2


def test_multi_hot_smoothing():
    # (1-eps)*y + 1/num_ent (data_set.py:22): 0 -> 0.25, 1 -> 1.15
    y = multi_hot([np.array([1, 3])], num_ent=4, smooth=0.1)
    np.testing.assert_allclose(y[0], [0.25, 1.15, 0.25, 1.15], rtol=1e-6)


def test_iterate_batches_padding():
    data = {
        "train": np.array([[0, 0, 1], [1, 0, 2], [2, 1, 0]]),
        "valid": np.zeros((0, 3), dtype=np.int64),
        "test": np.zeros((0, 3), dtype=np.int64),
    }
    t = process(data, num_rels=2)
    batches = list(iterate_batches(t["train"], num_ent=3, batch_size=4))
    assert len(batches) == 2
    tr, lab, mask = batches[-1]
    assert tr.shape == (4, 3) and lab.shape == (4, 3)
    assert mask.sum() < 4


def test_build_blocks_two_layers():
    ds = synthetic_nc(num_nodes=60, num_rels=4, n_target=10, seed=1)
    csr = CSRGraph(ds.src, ds.dst, ds.etype, ds.num_nodes)
    seeds = ds.target_ids[:4]
    blocks, seed_pos = build_blocks(csr, seeds, layers=2)
    assert len(blocks) == 2
    b0, b1 = blocks
    # final block's dst prefix is the seeds
    assert np.all(np.asarray(b1.dst_gid[: len(seeds)]) == seeds)
    assert np.all(seed_pos == np.arange(len(seeds)))
    # every edge in b1 has src present in b0's dst set at position src_pos
    m1 = np.asarray(b1.edge_mask) > 0
    src_pos = np.asarray(b1.src_pos)[m1]
    src_gid = np.asarray(b1.src_gid)[m1]
    assert np.all(np.asarray(b0.dst_gid)[src_pos] == src_gid)
    # edges really exist in the graph with right etype
    edges = {
        (int(s), int(d), int(t))
        for s, d, t in zip(ds.src, ds.dst, ds.etype)
    }
    m0 = np.asarray(b0.edge_mask) > 0
    for s, dp, t in zip(
        np.asarray(b0.src_gid)[m0],
        np.asarray(b0.dst_pos)[m0],
        np.asarray(b0.etype)[m0],
    ):
        d = int(np.asarray(b0.dst_gid)[dp])
        assert (int(s), d, int(t)) in edges


def test_build_blocks_duplicate_seeds():
    ds = synthetic_nc(num_nodes=40, num_rels=3, n_target=6, seed=2)
    csr = CSRGraph(ds.src, ds.dst, ds.etype, ds.num_nodes)
    seeds = np.array([ds.target_ids[0], ds.target_ids[1], ds.target_ids[0]])
    blocks, seed_pos = build_blocks(csr, seeds, layers=1)
    assert seed_pos[0] == seed_pos[2]
    assert np.asarray(blocks[-1].dst_gid)[seed_pos[1]] == seeds[1]


def test_kg_directory_loader_end_to_end(tmp_path):
    """The plain-file KG path (the real FB15k-237/WN18RR format:
    train/valid/test.txt + entities/relations.dict) loads and trains."""
    from mr_gnas_tpu.data import load_dataset
    from mr_gnas_tpu.train import LPTrainConfig, run_lp_train

    kg = load_dataset("tests/fixtures/mini_kgdir")
    assert kg.num_ent == 60 and kg.num_rels == 6
    assert len(kg.train) == 320 and len(kg.test) == 40
    # frozen vocab: ids come from the dict files
    kg2 = load_dataset("tests/fixtures/mini_kgdir")
    assert (kg.train == kg2.train).all()

    cfg = LPTrainConfig(
        dataset="tests/fixtures/mini_kgdir",
        save_dir=str(tmp_path),
        feature_dim=8,
        init_fea_dim=8,
        num_base_r=4,
        batch_size=32,
        epochs=1,
        genotype=(
            "[Genotype(alpha_cell=[('pre_sub', 1, 0), ('f_identity', 2, 1), "
            "('f_identity', 3, 2), ('a_sum', 4, 2), ('a_sum', 5, 3), "
            "('f_identity', 6, 4), ('f_identity', 7, 5)], "
            "concat_node=[4, 5, 6, 7], score_func='sf_DisMult')]"
        ),
    )
    out = run_lp_train(cfg)
    assert 0.0 <= out["test"]["mrr"] <= 1.0


def _write(p, lines):
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_kgdir_matches_dgl_contrib_conventions(tmp_path):
    """Byte-level format compat with dgl.contrib.data.load_data (the
    reference's FB15k-237 loader, search/mr_lp_search.py:51): dict ids
    come from the FIRST column, not line order; triples resolve names
    through the dicts. The oracle below reimplements dgl 0.5's
    knowledge_graph parsing (_read_dictionary: d[line[1]] = int(line[0]);
    _read_triplets_as_list: [ent[h], rel[r], ent[t]]). The dict files are
    deliberately OUT of line order so a line-number-based id assignment
    fails loudly."""
    from mr_gnas_tpu.data import load_dataset

    d = tmp_path / "FB15k-237"
    d.mkdir()
    _write(d / "entities.dict", ["2\t/m/a", "0\t/m/b", "1\t/m/c", "3\t/m/d"])
    _write(d / "relations.dict", ["1\t/loc/contains", "0\t/people/born"])
    triples = {
        "train": ["/m/a\t/people/born\t/m/b", "/m/c\t/loc/contains\t/m/d",
                  "/m/d\t/people/born\t/m/a"],
        "valid": ["/m/b\t/loc/contains\t/m/c"],
        "test": ["/m/a\t/loc/contains\t/m/d"],
    }
    for split, lines in triples.items():
        _write(d / f"{split}.txt", lines)

    # oracle: dgl.contrib.data.knowledge_graph parsing rules
    def read_dict(path):
        out = {}
        for line in open(path):
            idx, name = line.strip().split("\t")
            out[name] = int(idx)
        return out

    ent, rel = read_dict(d / "entities.dict"), read_dict(d / "relations.dict")

    def read_trip(path):
        return np.asarray(
            [
                [ent[h], rel[r], ent[t]]
                for h, r, t in (l.strip().split("\t") for l in open(path))
            ],
            dtype=np.int64,
        )

    kg = load_dataset(str(d))
    assert kg.num_ent == 4 and kg.num_rels == 2
    np.testing.assert_array_equal(kg.train, read_trip(d / "train.txt"))
    np.testing.assert_array_equal(kg.valid, read_trip(d / "valid.txt"))
    np.testing.assert_array_equal(kg.test, read_trip(d / "test.txt"))
    # spot-check the id convention directly: /m/a -> 2 (first column)
    assert kg.train[0, 0] == 2 and kg.train[0, 2] == 0


def test_known_dataset_validation_rejects_wrong_mount(tmp_path):
    """Loading by the benchmark NAME validates published statistics
    (DATA.md contract) — a tiny impostor directory must be refused."""
    import pytest

    from mr_gnas_tpu.data import load_dataset

    d = tmp_path / "FB15k-237"
    d.mkdir()
    _write(d / "entities.dict", ["0\ta", "1\tb"])
    _write(d / "relations.dict", ["0\tr"])
    for split in ("train", "valid", "test"):
        _write(d / f"{split}.txt", ["a\tr\tb"])
    with pytest.raises(ValueError, match="published"):
        load_dataset("fb15k-237", data_root=str(tmp_path))
    with pytest.raises(ValueError, match="published"):
        load_dataset("FB15k-237", data_root=str(tmp_path))
    # explicit-path loads skip validation (custom KGs stay usable)
    kg = load_dataset(str(d))
    assert kg.num_ent == 2


def test_unmounted_known_dataset_error_points_at_contract(tmp_path):
    import pytest

    from mr_gnas_tpu.data import load_dataset

    with pytest.raises(FileNotFoundError, match="DATA.md"):
        load_dataset("wn18rr", data_root=str(tmp_path))


def test_raw_u8_batches_and_device_smoothing_match_multi_hot():
    """iterate_batches(raw_u8=True) + smooth_labels == the host-smoothed
    multi_hot path (the lp-train transfer optimization), including the
    reference's constant-1/num_ent smoothing quirk."""
    import jax.numpy as jnp

    from mr_gnas_tpu.data import process
    from mr_gnas_tpu.data.labels import iterate_batches, smooth_labels

    trips = np.array(
        [[0, 0, 1], [0, 0, 2], [1, 1, 2], [2, 0, 0], [1, 0, 0]], np.int64
    )
    t = process({"train": trips, "valid": trips[:1], "test": trips[:1]}, 2)
    for smooth in (0.0, 0.1):
        ref = list(
            iterate_batches(t["train"], num_ent=3, batch_size=4, smooth=smooth)
        )
        raw = list(
            iterate_batches(t["train"], num_ent=3, batch_size=4, raw_u8=True)
        )
        assert len(ref) == len(raw)
        for (rt, rl, rm), (ut, ul, um) in zip(ref, raw):
            assert ul.dtype == np.uint8
            np.testing.assert_array_equal(rt, ut)
            np.testing.assert_array_equal(rm, um)
            got = np.asarray(smooth_labels(jnp.asarray(ul), smooth, 3))
            np.testing.assert_allclose(got, rl, rtol=0, atol=1e-7)
