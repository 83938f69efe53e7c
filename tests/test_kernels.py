"""Segment-reduction kernels vs brute-force numpy oracles."""
import jax.numpy as jnp
import numpy as np
import pytest

from mr_gnas_tpu.kernels import (
    segment_max,
    segment_mean,
    segment_std,
    segment_sum,
)


def _oracle(op, data, seg, n, mask):
    out = np.zeros((n, data.shape[1]), dtype=np.float64)
    for s in range(n):
        rows = data[(seg == s) & (mask > 0)]
        if len(rows) == 0:
            if op == "std":
                out[s] = np.sqrt(1e-5)
            continue
        if op == "sum":
            out[s] = rows.sum(0)
        elif op == "mean":
            out[s] = rows.mean(0)
        elif op == "max":
            out[s] = rows.max(0)
        elif op == "std":
            var = np.maximum((rows**2).mean(0) - rows.mean(0) ** 2, 0)
            out[s] = np.sqrt(var + 1e-5)
    return out


@pytest.mark.parametrize("op", ["sum", "mean", "max", "std"])
def test_segment_ops_vs_oracle(rng, op):
    e, n, d = 57, 11, 5
    data = rng.normal(size=(e, d)).astype(np.float32)
    seg = rng.integers(0, n + 1, size=e).astype(np.int32)  # some padded
    mask = (seg < n).astype(np.float32)
    mask[rng.integers(0, e, size=5)] = 0.0  # extra masked-out real rows
    fn = {
        "sum": segment_sum,
        "mean": segment_mean,
        "max": segment_max,
        "std": segment_std,
    }[op]
    got = np.asarray(fn(jnp.asarray(data), jnp.asarray(seg), n, jnp.asarray(mask)))
    want = _oracle(op, data, seg, n, mask)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_empty_segments_yield_zero(rng):
    data = rng.normal(size=(4, 3)).astype(np.float32)
    seg = np.array([5, 5, 5, 5], dtype=np.int32)  # only segment 5 populated
    for fn in (segment_sum, segment_mean, segment_max):
        out = np.asarray(fn(jnp.asarray(data), jnp.asarray(seg), 6, None))
        assert np.all(out[:5] == 0.0)


def test_mask_none_equals_full_mask(rng):
    e, n, d = 33, 7, 4
    data = rng.normal(size=(e, d)).astype(np.float32)
    seg = rng.integers(0, n, size=e).astype(np.int32)
    full = np.ones(e, dtype=np.float32)
    for fn in (segment_sum, segment_mean, segment_max, segment_std):
        a = np.asarray(fn(jnp.asarray(data), jnp.asarray(seg), n, None))
        b = np.asarray(fn(jnp.asarray(data), jnp.asarray(seg), n, jnp.asarray(full)))
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_segment_softmax_oracle(rng):
    """Masked segment softmax vs a per-segment numpy oracle."""
    import numpy as np
    import jax.numpy as jnp

    from mr_gnas_tpu.kernels import segment_softmax

    e, n, d = 40, 6, 8
    data = rng.normal(size=(e, d)).astype(np.float32)
    seg = rng.integers(0, n, size=e).astype(np.int32)
    mask = (rng.uniform(size=e) < 0.8).astype(np.float32)
    seg = np.where(mask > 0, seg, n)  # padded rows -> dummy segment

    got = np.asarray(
        segment_softmax(jnp.asarray(data), jnp.asarray(seg), n, jnp.asarray(mask))
    )
    want = np.zeros_like(data)
    for s in range(n):
        rows = np.where((seg == s) & (mask > 0))[0]
        if len(rows) == 0:
            continue
        x = data[rows]
        ex = np.exp(x - x.max(axis=0))
        want[rows] = ex / ex.sum(axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # masked rows get zero weight; per-segment columns sum to 1
    assert np.all(got[mask == 0] == 0)
