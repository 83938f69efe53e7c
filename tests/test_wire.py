"""Wire-format roundtrip: batch_to_wire o wire_to_batch must be exact.

The narrow transfer encoding (train/wire.py) claims LOSSLESS
reconstruction — every RelGraph array (including the rebuilt masks,
norms and the re-replicated CSR seg3d), the triplets and the labels /
negative groups must come back bit-identical to the host originals.
"""
import dataclasses

import jax
import numpy as np
import pytest

from mr_gnas_tpu.data import (
    generate_sampled_graph_and_labels,
    get_adj_and_degrees,
    load_dataset,
)
from mr_gnas_tpu.graph.build import attach_csr, round_up
from mr_gnas_tpu.train.wire import batch_to_wire, wire_to_batch


def test_sparse_labels_exact():
    """pack_label_ids o labels_from_ids == multi_hot, bit-exact, incl.
    padded entity columns (zeros) and the column-sharded variant."""
    import jax.numpy as jnp

    from mr_gnas_tpu.data import load_dataset, process
    from mr_gnas_tpu.data.labels import (
        iterate_batches,
        labels_from_ids,
        labels_from_ids_cols,
        multi_hot,
    )

    kg = load_dataset("synthetic", "data")
    qs = process(
        {"train": kg.train, "valid": kg.valid, "test": kg.test}, kg.num_rels
    )["train"]
    n_cols = kg.num_ent + 8  # padded entity columns
    for trip, obj_ids, mask in iterate_batches(
        qs, kg.num_ent, 32, sparse_pad_id=n_cols
    ):
        dense = jax.jit(lambda x: labels_from_ids(x, n_cols))(obj_ids)
        # reference: the ragged lists this batch drew, via multi_hot
        want = np.zeros((32, n_cols), np.float32)
        ids = np.asarray(obj_ids, np.int64)
        for i in range(32):
            want[i, ids[i][ids[i] < n_cols]] = 1.0
        np.testing.assert_array_equal(np.asarray(dense), want)
        # column shards concatenate back to the full multi-hot
        half = n_cols // 2
        lo = jax.jit(lambda x: labels_from_ids_cols(x, half, 0))(obj_ids)
        hi = jax.jit(lambda x: labels_from_ids_cols(x, n_cols - half, half))(
            obj_ids
        )
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(lo), np.asarray(hi)], axis=1), want
        )
        break
    # multi_hot agreement on the raw ragged lists
    got = np.asarray(labels_from_ids(
        jnp.asarray(np.asarray(obj_ids)), n_cols
    ))
    mh = multi_hot([qs.labels[i] for i in range(32)], n_cols)
    # first batch is unshuffled -> same queries
    np.testing.assert_array_equal(got, mh)


@pytest.mark.parametrize("grouped,neg_chunk,csr", [
    (True, 8, True),
    (True, 0, False),
    (False, 0, True),
])
def test_wire_roundtrip_exact(grouped, neg_chunk, csr):
    kg = load_dataset("synthetic", "data")
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    rng = np.random.default_rng(3)
    pad = round_up(min(2 * 64, kg.num_ent), 16)
    for trial in range(3):  # several fresh samples -> one wire structure
        b = generate_sampled_graph_and_labels(
            kg.train, 64, 0.5, kg.num_rels, adj, deg, 4, "uniform", rng,
            n_nodes_pad=pad, n_fwd_pad=32, grouped=grouped,
            neg_chunk=neg_chunk,
        )
        if csr:
            b = dataclasses.replace(
                b, graph=attach_csr(b.graph, static_pad=True)
            )
        w = batch_to_wire(b)
        # the narrow encoding must actually be narrow
        orig_graph_bytes = sum(
            x.nbytes for x in jax.tree_util.tree_leaves(b.graph)
        )
        assert w.nbytes < 0.7 * (orig_graph_bytes + b.triplets.nbytes)
        g2, trip2, lab2 = jax.jit(wire_to_batch)(w)
        g1 = b.graph
        for name in ("src", "dst", "etype", "norm", "row_mask",
                     "global_ids", "node_mask"):
            np.testing.assert_array_equal(
                np.asarray(getattr(g2, name)), np.asarray(getattr(g1, name)),
                err_msg=name,
            )
        assert (g2.n_fwd, g2.n_nodes, g2.num_rels) == (
            g1.n_fwd, g1.n_nodes, g1.num_rels
        )
        if csr:
            for name in ("perm", "seg3d", "chunk_block", "chunk_row",
                         "chunk_first", "counts"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(g2.csr, name)),
                    np.asarray(getattr(g1.csr, name)), err_msg=name,
                )
            assert (g2.csr.bn, g2.csr.rb, g2.csr.n_nodes) == (
                g1.csr.bn, g1.csr.rb, g1.csr.n_nodes
            )
        else:
            assert g2.csr is None
        np.testing.assert_array_equal(np.asarray(trip2), b.triplets)
        if grouped:
            np.testing.assert_array_equal(np.asarray(lab2[0]), b.neg_heads)
            np.testing.assert_array_equal(np.asarray(lab2[1]), b.neg_tails)
        else:
            np.testing.assert_array_equal(np.asarray(lab2), b.labels)
