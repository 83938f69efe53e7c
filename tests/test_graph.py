"""RelGraph construction invariants (the §2.8 layout contract)."""
import numpy as np

from mr_gnas_tpu.graph import build_rel_graph


def _toy_triplets():
    # 4 nodes, 2 relations, 5 edges
    return np.array(
        [[0, 0, 1], [1, 0, 2], [2, 1, 3], [3, 1, 0], [0, 1, 2]], dtype=np.int64
    )


def test_layout_sections():
    t = _toy_triplets()
    g = build_rel_graph(t, num_nodes=4, num_rels=2, n_fwd_pad=8, n_nodes_pad=6)
    assert g.n_fwd == 8 and g.n_nodes == 6
    assert g.src.shape == (2 * 8 + 6,)
    # forward section: etypes < num_rels, sorted ascending
    fwd_et = np.asarray(g.etype[:5])
    assert np.all(fwd_et < 2)
    assert np.all(np.diff(fwd_et) >= 0)
    # inverse section: etypes in [num_rels, 2*num_rels)
    inv_et = np.asarray(g.etype[8 : 8 + 5])
    assert np.all((inv_et >= 2) & (inv_et < 4))
    # self section: etype == 2*num_rels, src == dst == node id
    off = 16
    assert np.all(np.asarray(g.etype[off : off + 4]) == 4)
    assert np.all(np.asarray(g.src[off : off + 4]) == np.arange(4))
    assert np.all(np.asarray(g.dst[off : off + 4]) == np.arange(4))
    # masks
    assert np.asarray(g.row_mask).sum() == 5 + 5 + 4
    assert np.asarray(g.node_mask).sum() == 4
    # padded edge rows route to dummy segment
    assert np.all(np.asarray(g.dst[5:8]) == 6)


def test_inverse_edges_mirror_forward():
    t = _toy_triplets()
    g = build_rel_graph(t, num_nodes=4, num_rels=2)
    fwd = {
        (int(s), int(r), int(d))
        for s, r, d in zip(g.src[:5], g.etype[:5], g.dst[:5])
    }
    inv = {
        (int(s), int(r) - 2, int(d))
        for s, r, d in zip(
            g.src[g.n_fwd : g.n_fwd + 5],
            g.etype[g.n_fwd : g.n_fwd + 5],
            g.dst[g.n_fwd : g.n_fwd + 5],
        )
    }
    assert {(s, r, d) for (d, r, s) in inv} == fwd


def test_norms_match_symmetric_degree():
    t = _toy_triplets()
    g = build_rel_graph(t, num_nodes=4, num_rels=2)
    # recompute in-degree over the bidirectional edge set
    dst_all = np.concatenate([g.dst[:5], g.dst[g.n_fwd : g.n_fwd + 5]])
    src_all = np.concatenate([g.src[:5], g.src[g.n_fwd : g.n_fwd + 5]])
    deg = np.bincount(dst_all, minlength=4).astype(np.float64)
    nn = deg**-0.5
    nn[np.isinf(nn)] = 0
    want = nn[dst_all] * nn[src_all]
    got = np.concatenate([g.norm[:5], g.norm[g.n_fwd : g.n_fwd + 5]])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # self rows norm 1
    assert np.all(np.asarray(g.norm[2 * g.n_fwd :]) == 1.0)
