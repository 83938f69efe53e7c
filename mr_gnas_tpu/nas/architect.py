"""Bi-level DARTS architect: alpha updates on validation loss.

Functional re-design of models/architect.py:10-99 / architect_lp.py:13-103.
The reference mutates a cloned torch model for the unrolled step (via a
broken ``new()``, §2.3 of SURVEY.md); in JAX the unrolled weight step is
just a pytree expression, so 2nd-order works for both tasks.

Optimizer parity: torch ``Adam(lr, betas=(0.5, 0.999), weight_decay=wd)``
(architect.py:17-19) applies L2 *inside* the gradient, i.e.
``add_decayed_weights`` before the Adam moments — not decoupled AdamW.

Two second-order modes:
  * ``fd``     — the reference's finite-difference Hessian-vector product
                 with ``R = r / ||v||`` (architect.py:84-99);
  * ``exact``  — forward-over-reverse ``jvp`` of the alpha-gradient, the
                 TPU-friendly exact HVP (no extra loss-scale hyperparam).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

# loss(params, alphas) -> scalar, closed over the step's batch
LossFn = Callable[[dict, dict], jax.Array]


def make_arch_optimizer(
    arch_learning_rate: float = 3e-4, arch_weight_decay: float = 1e-3
) -> optax.GradientTransformation:
    """Adam(betas=(0.5, 0.999)) with torch-style L2 (architect.py:17-19)."""
    return optax.chain(
        optax.add_decayed_weights(arch_weight_decay),
        optax.scale_by_adam(b1=0.5, b2=0.999),
        optax.scale(-arch_learning_rate),
    )


def first_order_step(
    tx: optax.GradientTransformation,
    opt_state,
    alphas: dict,
    params: dict,
    val_loss_fn: LossFn,
):
    """1st-order DARTS: alpha grad of the validation loss at current
    weights (architect.py:44-46)."""
    loss, grads = jax.value_and_grad(lambda a: val_loss_fn(params, a))(alphas)
    updates, opt_state = tx.update(grads, opt_state, alphas)
    alphas = optax.apply_updates(alphas, updates)
    return alphas, opt_state, loss


def _tree_axpy(a, x, y):
    """y + a * x over pytrees."""
    return jax.tree.map(lambda xi, yi: yi + a * xi, x, y)


def unrolled_step(
    tx: optax.GradientTransformation,
    opt_state,
    alphas: dict,
    params: dict,
    train_loss_fn: LossFn,
    val_loss_fn: LossFn,
    eta: float,
    network_momentum: float = 0.9,
    network_weight_decay: float = 0.0,
    momentum_buf=None,
    r: float = 1e-2,
    mode: str = "fd",
):
    """2nd-order DARTS step (architect.py:23-99).

    theta' = theta - eta * (momentum * buf + grad_theta L_train + wd * theta)
    dalpha = grad_alpha L_val(theta') - eta * (d/dalpha d/dtheta L_train) @
             grad_theta' L_val(theta')
    """
    gw = jax.grad(lambda p: train_loss_fn(p, alphas))(params)
    if momentum_buf is None:
        momentum_buf = jax.tree.map(jnp.zeros_like, params)
    theta2 = jax.tree.map(
        lambda p, g, b: p
        - eta * (network_momentum * b + g + network_weight_decay * p),
        params,
        gw,
        momentum_buf,
    )
    loss, (dalpha, vector) = jax.value_and_grad(
        lambda a, p: val_loss_fn(p, a), argnums=(0, 1)
    )(alphas, theta2)

    if mode == "exact":
        # forward-over-reverse HVP: d/dtheta (grad_alpha L_train) . vector
        _, implicit = jax.jvp(
            lambda p: jax.grad(lambda a: train_loss_fn(p, a))(alphas),
            (params,),
            (vector,),
        )
    else:
        vnorm = optax.global_norm(vector)
        R = r / jnp.maximum(vnorm, 1e-12)
        p_plus = _tree_axpy(R, vector, params)
        p_minus = _tree_axpy(-R, vector, params)
        g_plus = jax.grad(lambda a: train_loss_fn(p_plus, a))(alphas)
        g_minus = jax.grad(lambda a: train_loss_fn(p_minus, a))(alphas)
        implicit = jax.tree.map(lambda gp, gn: (gp - gn) / (2.0 * R), g_plus, g_minus)

    dalpha = jax.tree.map(lambda d, i: d - eta * i, dalpha, implicit)
    updates, opt_state = tx.update(dalpha, opt_state, alphas)
    alphas = optax.apply_updates(alphas, updates)
    return alphas, opt_state, loss


def sgd_momentum_buffer(opt_state):
    """Extract the momentum trace from an optax.sgd(momentum=...) state —
    the analog of reading torch SGD's ``momentum_buffer``
    (architect.py:27)."""
    for s in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, optax.TraceState)
    ):
        if isinstance(s, optax.TraceState):
            return s.trace
    return None
