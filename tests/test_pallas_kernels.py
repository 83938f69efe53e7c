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
