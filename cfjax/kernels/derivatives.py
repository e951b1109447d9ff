"""Scalar derivative engine for kernel profiles.

Replaces the reference's ForwardDiff/TaylorSeries scalar machinery
(src/derivatives.jl, src/gradient.jl:584-600 `derivative_laplacian` /
`value_derivative`): all derivative stacks of a profile f at s are built
by composing `jax.grad`, then vmapped elementwise over tiles by the
operator layer. Everything jits; the profiles are written (Taylor-guarded
`where`s) so derivatives are finite at r^2 = 0.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp


def derivative_fns(profile, order: int):
    """[f, f', f'', ..., f^(order)] as scalar functions."""
    fns = [profile]
    for _ in range(order):
        fns.append(jax.grad(fns[-1]))
    return fns


def elementwise_derivatives(profile, s, order: int):
    """Evaluate (f(s), f'(s), ..., f^(order)(s)) elementwise on array s.

    Returns a tuple of arrays with the same shape as s."""
    s = jnp.asarray(s)
    fns = derivative_fns(profile, order)
    flat = s.reshape(-1)
    outs = []
    for fn in fns:
        outs.append(jax.vmap(fn)(flat).reshape(s.shape))
    return tuple(outs)


def value_derivative(profile, s):
    """(f, f') — reference `value_derivative` (src/gradient.jl:584-588)."""
    return elementwise_derivatives(profile, s, 1)


def derivative_laplacian(profile, s):
    """(f', f'') — reference `derivative_laplacian` (src/gradient.jl:589-600)."""
    _, d1, d2 = elementwise_derivatives(profile, s, 2)
    return d1, d2
