"""Bi-level architect: 1st/2nd-order alpha updates on a quadratic toy
problem with a known analytic solution direction."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mr_gnas_tpu.nas import (
    first_order_step,
    make_arch_optimizer,
    sgd_momentum_buffer,
    unrolled_step,
)


def _toy():
    # train loss: (w - a)^2 ; val loss: (w - 2)^2 + 0.1*(a - 1)^2
    def train_loss(params, alphas):
        return jnp.sum((params["w"] - alphas["a"]) ** 2)

    def val_loss(params, alphas):
        return jnp.sum((params["w"] - 2.0) ** 2) + 0.1 * jnp.sum((alphas["a"] - 1.0) ** 2)

    params = {"w": jnp.array([0.5])}
    alphas = {"a": jnp.array([0.0])}
    return train_loss, val_loss, params, alphas


def test_first_order_step_moves_alphas_down_val_grad():
    train_loss, val_loss, params, alphas = _toy()
    tx = make_arch_optimizer(1e-2, 0.0)
    opt_state = tx.init(alphas)
    a2, _, loss = first_order_step(tx, opt_state, alphas, params, val_loss)
    # direct val grad wrt a is 0.2*(a-1) = -0.2 -> a should increase
    assert float(a2["a"][0]) > 0.0
    assert float(loss) > 0


def test_unrolled_fd_and_exact_agree():
    train_loss, val_loss, params, alphas = _toy()
    tx = make_arch_optimizer(1e-2, 0.0)
    outs = {}
    for mode in ("fd", "exact"):
        opt_state = tx.init(alphas)
        a2, _, _ = unrolled_step(
            tx, opt_state, alphas, params, train_loss, val_loss,
            eta=0.1, network_momentum=0.0, network_weight_decay=0.0, mode=mode,
        )
        outs[mode] = float(a2["a"][0])
    np.testing.assert_allclose(outs["fd"], outs["exact"], rtol=1e-3)


def test_unrolled_uses_implicit_gradient():
    """The unrolled step must differ from 1st-order: here val loss depends
    on alphas only through the unrolled weights' train-loss coupling."""

    def train_loss(params, alphas):
        return jnp.sum((params["w"] - alphas["a"]) ** 2)

    def val_loss(params, alphas):
        return jnp.sum((params["w"] - 2.0) ** 2)  # no direct alpha term

    params = {"w": jnp.array([0.5])}
    alphas = {"a": jnp.array([0.0])}
    tx = make_arch_optimizer(1e-2, 0.0)
    opt_state = tx.init(alphas)
    a_first, _, _ = first_order_step(tx, opt_state, alphas, params, val_loss)
    # 1st-order: zero alpha grad -> alphas unchanged
    np.testing.assert_allclose(np.asarray(a_first["a"]), np.asarray(alphas["a"]), atol=1e-8)
    a_unrolled, _, _ = unrolled_step(
        tx, tx.init(alphas), alphas, params, train_loss, val_loss,
        eta=0.1, network_momentum=0.0, mode="exact",
    )
    # unrolled: w' = w - eta*2*(w - a) moves toward a; val wants w' -> 2,
    # so alphas must increase
    assert float(a_unrolled["a"][0]) > 0.0


def test_sgd_momentum_buffer_extraction():
    params = {"w": jnp.ones(3)}
    tx = optax.sgd(1e-2, momentum=0.9)
    state = tx.init(params)
    buf = sgd_momentum_buffer(state)
    assert buf is not None
    np.testing.assert_allclose(np.asarray(buf["w"]), 0.0)
    tx2 = optax.adam(1e-3)
    assert sgd_momentum_buffer(tx2.init(params)) is None
