"""Native C++ host kernels vs the numpy implementations."""
import numpy as np
import pytest

from mr_gnas_tpu import native
from mr_gnas_tpu.data import get_adj_and_degrees, synthetic_kg, synthetic_nc
from mr_gnas_tpu.data.blocks import CSRGraph
from mr_gnas_tpu.kernels.pallas_segment import build_blocked_csr

needs_native = pytest.mark.skipif(native.lib() is None, reason="native lib unavailable")


@needs_native
def test_native_neighborhood_sampler_validity():
    kg = synthetic_kg(num_ent=80, num_rels=4, n_train=300)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    flat, off = native.flatten_adj(adj)
    edges = native.sample_edge_neighborhood_native(flat, off, len(kg.train), 50, seed=1)
    assert edges is not None
    # valid, unique edge ids
    assert len(set(edges.tolist())) == 50
    assert edges.min() >= 0 and edges.max() < len(kg.train)
    # connectivity property: sampled edges touch a connected-ish set
    nodes = set()
    for e in edges:
        s, _, o = kg.train[e]
        nodes.add(int(s)); nodes.add(int(o))
    assert len(nodes) <= 2 * 50


@needs_native
def test_native_frontier_matches_python():
    ds = synthetic_nc(num_nodes=60, num_rels=4, n_target=10, seed=1)
    csr = CSRGraph(ds.src, ds.dst, ds.etype, ds.num_nodes)
    seeds = np.unique(ds.target_ids[:5])
    out = native.in_edges_frontier_native(csr.indptr, csr.src, csr.etype, seeds)
    assert out is not None
    e_src, e_dst_pos, e_et, frontier = out
    # python oracle
    py_src, py_dst, py_et = csr.in_edges(seeds)
    assert len(e_src) == len(py_src)
    # same multiset of (src, dst, etype)
    got = sorted(zip(e_src.tolist(), seeds[e_dst_pos].tolist(), e_et.tolist()))
    want = sorted(zip(py_src.tolist(), py_dst.tolist(), py_et.tolist()))
    assert got == want
    # frontier: seeds prefix + unique new srcs
    assert np.array_equal(frontier[: len(seeds)], seeds)
    assert len(set(frontier.tolist())) == len(frontier)
    assert set(frontier.tolist()) == set(seeds.tolist()) | set(py_src.tolist())


@needs_native
def test_native_blocked_csr_matches_python(rng):
    e, n = 700, 150
    dst = rng.integers(0, n, size=e).astype(np.int32)
    mask = (rng.uniform(size=e) > 0.2).astype(np.float32)
    py = build_blocked_csr(dst, n, mask, bn=32, rb=64)
    out = native.blocked_csr_native(dst, mask, n, 32, 64)
    assert out is not None
    perm, seg, cb, cr, cf, counts = out
    np.testing.assert_array_equal(seg, py.seg)
    np.testing.assert_array_equal(perm, py.perm)
    np.testing.assert_array_equal(cb, py.chunk_block)
    np.testing.assert_array_equal(cr, py.chunk_row)
    np.testing.assert_array_equal(cf, py.chunk_first)
    np.testing.assert_allclose(counts, py.counts)
