"""Hyperparameter optimization: maximize the log marginal likelihood.

The reference demonstrates this with Flux over `parameters`/`similar`
(test/optimization.jl). Here the kernel is a pytree, so optax optimizes
its leaves directly (in log-space for positivity) with gradients through
the whole lazy-operator stack.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .regression import log_marginal_likelihood


def fit_kernel(kernel, x, y, noise: float = 1e-4, steps: int = 100,
               lr: float = 0.05, log_space: bool = True):
    """Gradient-ascent on log p(y | x, theta). Returns (kernel, history).

    log_space=True optimizes log-leaves (all positive hyperparameters);
    set False for kernels with sign-free parameters."""
    y = jnp.asarray(y)

    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    if not leaves:
        return kernel, jnp.zeros((0,))
    params = [jnp.log(jnp.asarray(l, dtype=jnp.result_type(float))) for l in leaves] \
        if log_space else [jnp.asarray(l, dtype=jnp.result_type(float)) for l in leaves]

    def rebuild(ps):
        ls = [jnp.exp(p) for p in ps] if log_space else list(ps)
        return jax.tree_util.tree_unflatten(treedef, ls)

    def loss(ps):
        return -log_marginal_likelihood(rebuild(ps), x, y, noise=noise)

    opt = optax.adam(lr)
    state = opt.init(params)
    grad_fn = jax.jit(jax.value_and_grad(loss))

    hist = []
    for _ in range(steps):
        v, g = grad_fn(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
        hist.append(float(v))
    return rebuild(params), jnp.asarray(hist)
