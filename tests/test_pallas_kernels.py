"""Pallas blocked-CSR segment kernels vs the jnp scatter baselines
(interpret mode on CPU; the same code compiles on TPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mr_gnas_tpu.kernels import segment_max, segment_mean, segment_sum
from mr_gnas_tpu.kernels.pallas_segment import (
    build_blocked_csr,
    segment_mean_pallas,
    segment_reduce_pallas,
)


def _case(rng, e, n, d, with_mask=True, skew=False):
    data = rng.normal(size=(e, d)).astype(np.float32)
    if skew:
        dst = (n * rng.power(4.0, size=e)).astype(np.int32) % n
    else:
        dst = rng.integers(0, n, size=e).astype(np.int32)
    mask = np.ones(e, np.float32)
    if with_mask:
        mask[rng.uniform(size=e) < 0.2] = 0.0
    return data, dst, mask


@pytest.mark.parametrize("op", ["sum", "max"])
@pytest.mark.parametrize("skew", [False, True])
def test_pallas_segment_matches_baseline(rng, op, skew):
    e, n, d = 700, 150, 128
    data, dst, mask = _case(rng, e, n, d, skew=skew)
    csr = build_blocked_csr(dst, n, mask, bn=32, rb=64)
    got = segment_reduce_pallas(jnp.asarray(data), csr, op=op, interpret=True)
    base = {"sum": segment_sum, "max": segment_max}[op]
    want = base(jnp.asarray(data), jnp.asarray(dst), n, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pallas_mean_matches_baseline(rng):
    e, n, d = 400, 90, 128
    data, dst, mask = _case(rng, e, n, d)
    csr = build_blocked_csr(dst, n, mask, bn=32, rb=64)
    got = segment_mean_pallas(jnp.asarray(data), csr, interpret=True)
    want = segment_mean(jnp.asarray(data), jnp.asarray(dst), n, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_blocked_csr_layout():
    dst = np.array([3, 1, 1, 0, 2, 5], np.int32)
    mask = np.array([1, 1, 0, 1, 1, 1], np.float32)
    csr = build_blocked_csr(dst, 6, mask, bn=2, rb=4)
    # masked row excluded
    assert (csr.seg >= 0).sum() == 5
    # every chunk's real segs fall inside its block's node range
    for i in range(csr.n_total_chunks):
        b = csr.chunk_block[i]
        segs = csr.seg[csr.chunk_row[i] * csr.rb : (csr.chunk_row[i] + 1) * csr.rb]
        real = segs[segs >= 0]
        assert np.all((real >= b * csr.bn) & (real < (b + 1) * csr.bn))
    # first-chunk flags: one per block
    assert csr.chunk_first.sum() == csr.n_blocks


def test_empty_segments_zero(rng):
    e, n, d = 64, 32, 128
    data = rng.normal(size=(e, d)).astype(np.float32)
    dst = np.full(e, 5, np.int32)
    csr = build_blocked_csr(dst, n, None, bn=8, rb=16)
    got = np.asarray(
        segment_reduce_pallas(jnp.asarray(data), csr, op="max", interpret=True)
    )
    np.testing.assert_allclose(got[5], data.max(0), rtol=1e-6)
    assert np.all(got[:5] == 0) and np.all(got[6:] == 0)


def test_csr_ops_values_and_grads_match_xla(rng):
    """The differentiable CSR segment ops (the load-bearing model path)
    match the XLA scatter baselines in value AND gradient."""
    import jax

    from mr_gnas_tpu.kernels.pallas_segment import (
        CSRMeta,
        segment_max_csr,
        segment_mean_csr,
        segment_sum_csr,
    )
    from mr_gnas_tpu.kernels.segment import segment_max, segment_mean, segment_sum

    e, n, d = 96, 40, 16
    data = rng.normal(size=(e, d)).astype(np.float32)
    dst = rng.integers(0, n, e).astype(np.int32)
    mask = (rng.uniform(size=e) > 0.2).astype(np.float32)
    dst_m = np.where(mask > 0, dst, n).astype(np.int32)  # XLA dummy segment
    csr = build_blocked_csr(dst, n, mask, bn=8, rb=16)
    meta = CSRMeta.from_blocked(csr)
    dj, dstj, mj = jnp.asarray(data), jnp.asarray(dst_m), jnp.asarray(mask)
    cot = rng.normal(size=(n, d)).astype(np.float32)

    pairs = [
        (lambda x: segment_sum_csr(x, meta, dstj, mj, interpret=True),
         lambda x: segment_sum(x, dstj, n, mj)),
        (lambda x: segment_max_csr(x, meta, dstj, mj, interpret=True),
         lambda x: segment_max(x, dstj, n, mj)),
        (lambda x: segment_mean_csr(x, meta, dstj, mj, interpret=True),
         lambda x: segment_mean(x, dstj, n, mj)),
    ]
    for f_csr, f_xla in pairs:
        np.testing.assert_allclose(
            np.asarray(f_csr(dj)), np.asarray(f_xla(dj)), rtol=1e-5, atol=1e-5
        )
        g_csr = jax.grad(lambda x: jnp.sum(f_csr(x) * cot))(dj)
        g_xla = jax.grad(lambda x: jnp.sum(f_xla(x) * cot))(dj)
        np.testing.assert_allclose(
            np.asarray(g_csr), np.asarray(g_xla), rtol=1e-5, atol=1e-5
        )


def test_lp_network_with_attached_csr_matches(rng):
    """LPNetwork forward over a CSR-attached graph == plain graph
    (the pallas_agg flag path end to end, interpret mode)."""
    import jax

    from mr_gnas_tpu.cells.genotype import parse_reference_genotypes
    from mr_gnas_tpu.graph import build_rel_graph
    from mr_gnas_tpu.graph.build import attach_csr
    from mr_gnas_tpu.models import LPNetwork

    geno = parse_reference_genotypes(
        "[Genotype(alpha_cell=[('pre_sub', 1, 0), ('f_sparse_comp', 2, 1), "
        "('f_sparse_comp', 3, 2), ('a_max', 4, 2), ('a_sum', 5, 3), "
        "('f_sparse_last', 6, 5), ('f_sparse_last', 7, 5)], "
        "concat_node=[4, 5, 6, 7], score_func='sf_DisMult')]"
    )
    n_ent, n_rels = 24, 3
    trip = np.stack([rng.integers(0, n_ent, 40), rng.integers(0, n_rels, 40),
                     rng.integers(0, n_ent, 40)], axis=1)
    g = build_rel_graph(trip, n_ent, n_rels, pad_multiple=8)
    g_csr = attach_csr(g, bn=8, rb=16)
    model = LPNetwork(
        genotypes=tuple(geno), num_ent=n_ent, num_rels=n_rels,
        feature_dim=16, init_fea_dim=8, num_base_r=4,
        dropout_cell=0.0, drop_aggr=0.0,
    )
    z = jnp.zeros((4,), jnp.int32)
    v = model.init(jax.random.key(0), g, z, z, False)
    out_plain = model.apply(v, g, z, z, False)
    out_csr = model.apply(v, g_csr, z, z, False)
    np.testing.assert_allclose(
        np.asarray(out_csr), np.asarray(out_plain), rtol=1e-5, atol=1e-6
    )
