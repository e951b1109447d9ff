"""AD-able modified Bessel K for real order, as x^nu * K_nu(x).

Replaces the reference's BesselK.jl dependency (`adbesselkxv`, used at
reference src/stationary.jl:112 for real-smoothness Matern kernels).

Implementation: double-exponential (exp-sinh) quadrature of the integral
representation  K_nu(x) = int_0^inf exp(-x cosh t) cosh(nu t) dt,
evaluated fully in log-space for stability across x in [1e-12, 1e3] and
nu in (0, ~25]. Fixed node count keeps it jit/vmap/grad-compatible; JAX
autodiff through the quadrature gives smooth derivatives in both x and nu.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import logsumexp

_N_NODES = 400
_S_MAX = 4.0


def besselkxv(nu, x):
    """x^nu * K_nu(x) for x > 0 (elementwise; broadcasts nu against x)."""
    x = jnp.asarray(x)
    nu = jnp.asarray(nu)
    dt = jnp.result_type(x, nu, float)
    x = x.astype(dt)
    nu = nu.astype(dt)

    s = jnp.linspace(-_S_MAX, _S_MAX, _N_NODES, dtype=dt)
    h = s[1] - s[0]
    c = jnp.pi / 2
    sinh_s = jnp.sinh(s)
    t = jnp.exp(c * sinh_s)                       # exp-sinh map (0, inf)
    logw = jnp.log(c) + jnp.log(jnp.cosh(s)) + c * sinh_s  # log dt/ds

    x, nu = jnp.broadcast_arrays(x, nu)
    xb = x[..., None]
    nub = nu[..., None]
    # clamp the deep-underflow tail to keep every node's exponent finite:
    # grad-of-logsumexp then gets an exact 0 weight there instead of
    # 0 * inf = nan (the softmax weight of arg ~ -1e20 is exactly 0.0)
    t = jnp.minimum(t, 1e8)
    cosh_t = jnp.minimum(jnp.cosh(t), 1e30)
    log_cosh_nut = jnp.logaddexp(nub * t, -nub * t) - jnp.log(2.0)
    arg = nub * jnp.log(xb) - xb * cosh_t + log_cosh_nut
    return jnp.exp(logsumexp(arg + logw, axis=-1)) * h


def besselk(nu, x):
    """K_nu(x) for x > 0."""
    return besselkxv(nu, x) * jnp.exp(-jnp.asarray(nu) * jnp.log(jnp.asarray(x)))
