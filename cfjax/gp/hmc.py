"""HMC over GP hyperparameters (north-star demo layer, SURVEY.md §7.7).

Plain leapfrog HMC with dual-averaging step-size adaptation, written as
jit-compiled lax.scan chains. The log-density gradient flows through the
whole lazy-operator stack (gramian -> Cholesky/CG) by JAX AD.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def hmc_sample(
    logdensity,
    theta0,
    key,
    num_samples: int = 500,
    num_warmup: int = 200,
    num_leapfrog: int = 16,
    init_step: float = 0.1,
    target_accept: float = 0.8,
):
    """Sample from logdensity(theta) (theta: flat vector). Returns
    (samples (num_samples, dim), accept_rate)."""
    theta0 = jnp.asarray(theta0)
    dim = theta0.shape[0]
    grad_ld = jax.grad(logdensity)

    def leapfrog(theta, p, eps):
        p = p + 0.5 * eps * grad_ld(theta)

        def body(_, carry):
            th, pp = carry
            th = th + eps * pp
            pp = pp + eps * grad_ld(th)
            return th, pp

        theta, p = lax.fori_loop(0, num_leapfrog - 1, body, (theta + 0.0, p))
        theta = theta + eps * p
        p = p + 0.5 * eps * grad_ld(theta)
        return theta, p

    def kernel(carry, key_i):
        theta, eps, h_bar, log_eps_bar, i = carry
        k1, k2 = jax.random.split(key_i)
        p0 = jax.random.normal(k1, (dim,))
        ld0 = logdensity(theta)
        theta_new, p_new = leapfrog(theta, p0, eps)
        ld1 = logdensity(theta_new)
        log_accept = (ld1 - 0.5 * jnp.sum(p_new**2)) - (ld0 - 0.5 * jnp.sum(p0**2))
        log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
        accept_prob = jnp.minimum(1.0, jnp.exp(log_accept))
        u = jax.random.uniform(k2)
        accept = u < accept_prob
        theta = jnp.where(accept, theta_new, theta)

        # dual averaging during warmup
        in_warmup = i < num_warmup
        t = i + 1.0
        kappa, gamma, t0, mu = 0.75, 0.05, 10.0, jnp.log(10.0 * init_step)
        h_bar = jnp.where(
            in_warmup,
            (1 - 1 / (t + t0)) * h_bar + (target_accept - accept_prob) / (t + t0),
            h_bar,
        )
        log_eps = mu - jnp.sqrt(t) / gamma * h_bar
        log_eps_bar = jnp.where(
            in_warmup,
            t ** (-kappa) * log_eps + (1 - t ** (-kappa)) * log_eps_bar,
            log_eps_bar,
        )
        eps = jnp.where(in_warmup, jnp.exp(log_eps), jnp.exp(log_eps_bar))
        return (theta, eps, h_bar, log_eps_bar, i + 1), (theta, accept_prob)

    total = num_warmup + num_samples
    keys = jax.random.split(key, total)
    init = (theta0, jnp.asarray(init_step), jnp.zeros(()), jnp.log(init_step), 0.0)
    (_, _, _, _, _), (thetas, aprobs) = lax.scan(kernel, init, keys)
    return thetas[num_warmup:], jnp.mean(aprobs[num_warmup:])
