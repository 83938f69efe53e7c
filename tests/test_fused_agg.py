"""kernels/fused_agg.py: the fused gather+compose+reduce kernel must
equal the composite path (XLA pre-linears + segment reductions) in both
values and gradients (interpret mode on CPU; compiled on TPU via
scripts/tpu_kernel_check.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_gnas_tpu.kernels.fused_agg import fused_middle_agg
from mr_gnas_tpu.kernels.pallas_segment import CSRMeta, build_blocked_csr
from mr_gnas_tpu.kernels.segment import segment_max, segment_sum


def _composite(x, w_max, b_max, w_mean, b_mean, dst, n, mask):
    lin_max = jax.nn.relu(
        jax.lax.dot_general(
            x, w_max.astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_max.astype(jnp.float32)[None, :]
    )
    lin_mean = jax.nn.relu(
        jax.lax.dot_general(
            x, w_mean.astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_mean.astype(jnp.float32)[None, :]
    )
    return (
        segment_max(lin_max, dst, n, mask),
        segment_sum(x.astype(jnp.float32), dst, n, mask),
        segment_sum(lin_mean, dst, n, mask),
    )


@pytest.mark.parametrize("skew", ["uniform", "hub"])
def test_fused_agg_values_and_grads(rng, skew):
    e, n, d = 900, 300, 64
    if skew == "hub":
        dst = np.minimum((rng.pareto(1.1, size=e) * 10).astype(np.int32), n - 1)
    else:
        dst = rng.integers(0, n, size=e).astype(np.int32)
    maskv = (rng.random(e) > 0.15).astype(np.float32)
    maskv[:3] = 1
    x = rng.normal(size=(e, d)).astype(np.float32)
    w_max = rng.normal(size=(d, d)).astype(np.float32) * 0.2
    w_mean = rng.normal(size=(d, d)).astype(np.float32) * 0.2
    b_max = rng.normal(size=(d,)).astype(np.float32) * 0.1
    b_mean = rng.normal(size=(d,)).astype(np.float32) * 0.1
    meta = CSRMeta.from_blocked(build_blocked_csr(dst, n, maskv, bn=128, rb=256))
    dstj, mj = jnp.asarray(dst), jnp.asarray(maskv)
    args = tuple(jnp.asarray(a) for a in (x, w_max, b_max, w_mean, b_mean))
    g_outs = tuple(
        jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)) for _ in range(3)
    )

    def loss(fn, *a):
        outs = fn(*a)
        return sum(jnp.sum(o * g) for o, g in zip(outs, g_outs)), outs

    fused = lambda *a: fused_middle_agg(*a, meta, dstj, mj, interpret=True)
    comp = lambda *a: _composite(*a, dstj, n, mj)
    (lf, of), gf = jax.value_and_grad(
        lambda *a: loss(fused, *a), argnums=tuple(range(5)), has_aux=True
    )(*args)
    (lc, oc), gc = jax.value_and_grad(
        lambda *a: loss(comp, *a), argnums=tuple(range(5)), has_aux=True
    )(*args)
    for name, a, b in zip(("max", "sum", "mean_num"), of, oc):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5, err_msg=name)
    for name, a, b in zip(("dx", "dw_max", "db_max", "dw_mean", "db_mean"), gf, gc):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=name)


def test_fused_agg_empty_segments(rng):
    """Nodes with no in-edges: a_max must be 0 (DGL convention), sums 0."""
    e, n, d = 64, 256, 32
    dst = np.concatenate([np.zeros(e - 4, np.int32), np.full(4, 5, np.int32)])
    mask = np.ones(e, np.float32)
    x = rng.normal(size=(e, d)).astype(np.float32)
    w = np.eye(d, dtype=np.float32)
    b = np.zeros(d, np.float32)
    meta = CSRMeta.from_blocked(build_blocked_csr(dst, n, mask, bn=128, rb=256))
    amax, asum, amean = fused_middle_agg(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), jnp.asarray(w),
        jnp.asarray(b), meta, jnp.asarray(dst), jnp.asarray(mask),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(amax[1]), np.zeros(d))
    np.testing.assert_array_equal(np.asarray(asum[7]), np.zeros(d))
    np.testing.assert_array_equal(np.asarray(amean[200]), np.zeros(d))
    want_max = segment_max(jax.nn.relu(jnp.asarray(x)), jnp.asarray(dst), n, jnp.asarray(mask))
    np.testing.assert_allclose(amax, want_max, rtol=1e-6)


def test_fused_agg_static_padded_csr(rng):
    """pad_blocked_csr's no-op chunks and dummy rows must not change
    fused_middle_agg values, and two different samples of the same
    config must produce identical CSR shapes (one compilation)."""
    from mr_gnas_tpu.kernels.pallas_segment import pad_blocked_csr

    e, n, d = 700, 256, 32
    x = rng.normal(size=(e, d)).astype(np.float32)
    w_max = rng.normal(size=(d, d)).astype(np.float32) * 0.2
    w_mean = rng.normal(size=(d, d)).astype(np.float32) * 0.2
    b_max = rng.normal(size=(d,)).astype(np.float32) * 0.1
    b_mean = rng.normal(size=(d,)).astype(np.float32) * 0.1
    maskv = np.ones(e, np.float32)
    args = tuple(jnp.asarray(a) for a in (x, w_max, b_max, w_mean, b_mean))

    shapes = []
    outs = []
    for seed in (0, 1):
        r2 = np.random.default_rng(seed)
        dst = r2.integers(0, n, size=e).astype(np.int32)
        base = build_blocked_csr(dst, n, maskv, bn=128, rb=128)
        n_blocks = -(-n // 128)
        padded = pad_blocked_csr(base, n_blocks + -(-e // 128), e + n_blocks * 128 + 128)
        mb = CSRMeta.from_blocked(base)
        mp = CSRMeta.from_blocked(padded)
        shapes.append((mp.perm.shape, mp.chunk_block.shape))
        ob = fused_middle_agg(*args[:1], args[1], args[2], args[3], args[4], mb, jnp.asarray(dst), jnp.asarray(maskv))
        op = fused_middle_agg(*args[:1], args[1], args[2], args[3], args[4], mp, jnp.asarray(dst), jnp.asarray(maskv))
        for a, b in zip(ob, op):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
        outs.append(op)
    assert shapes[0] == shapes[1], "static pad must yield sample-independent shapes"
