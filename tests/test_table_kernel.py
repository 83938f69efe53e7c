"""kernels/table.py: the MXU one-hot backward must equal jnp.take's VJP.

The contract is exact drop-in semantics (whatever idx contains, cotangent
row r lands on table row idx[r]) — reference gather sites:
model_search_lp.py:140 (per-edge relation rows), :171 (triplet rel rows).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_gnas_tpu.kernels.table import take_small_table


@pytest.mark.parametrize("n_rows,n_idx", [(475, 1000), (11, 37), (475, 512)])
def test_vjp_matches_take(rng, n_rows, n_idx):
    table = jnp.asarray(rng.normal(size=(n_rows, 200)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n_rows, size=n_idx).astype(np.int32))
    cot = jnp.asarray(rng.normal(size=(n_idx, 200)).astype(np.float32))

    fwd_ref = jnp.take(table, idx, axis=0)
    fwd_new = take_small_table(table, idx, interpret=True)
    np.testing.assert_array_equal(fwd_ref, fwd_new)

    g_ref = jax.grad(lambda t: jnp.sum(jnp.take(t, idx, axis=0) * cot))(table)
    g_new = jax.jit(
        jax.grad(lambda t: jnp.sum(take_small_table(t, idx, interpret=True) * cot))
    )(table)
    np.testing.assert_allclose(g_ref, g_new, rtol=1e-5, atol=1e-5)


def test_vjp_2d_idx(rng):
    table = jnp.asarray(rng.normal(size=(51, 64)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 51, size=(7, 13)).astype(np.int32))
    cot = jnp.asarray(rng.normal(size=(7, 13, 64)).astype(np.float32))
    g_ref = jax.grad(lambda t: jnp.sum(jnp.take(t, idx, axis=0) * cot))(table)
    g_new = jax.grad(
        lambda t: jnp.sum(take_small_table(t, idx, interpret=True) * cot)
    )(table)
    np.testing.assert_allclose(g_ref, g_new, rtol=1e-5, atol=1e-5)


def test_duplicate_and_missing_rows(rng):
    """Rows hit many times accumulate; rows never hit get zero grad."""
    table = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
    idx = jnp.asarray(np.full(600, 3, np.int32))
    cot = jnp.asarray(rng.normal(size=(600, 128)).astype(np.float32))
    g = jax.grad(
        lambda t: jnp.sum(take_small_table(t, idx, interpret=True) * cot)
    )(table)
    np.testing.assert_allclose(g[3], np.asarray(cot).sum(0), rtol=2e-5, atol=2e-5)
    assert float(jnp.abs(g[:3]).max()) == 0.0
    assert float(jnp.abs(g[4:]).max()) == 0.0


def test_cpu_fallback_is_plain_take(rng):
    """With interpret=None off-TPU the function must be plain jnp.take."""
    table = jnp.asarray(rng.normal(size=(9, 32)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 9, size=20).astype(np.int32))
    np.testing.assert_array_equal(
        take_small_table(table, idx), jnp.take(table, idx, axis=0)
    )
