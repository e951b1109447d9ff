"""Gradient-kernel fast paths for per-dimension separable kernels.

Rebuild of reference src/gradient_algebra.jl:93-145:

SeparableSum K(x,y) = sum_d k_d(x_d, y_d): the gradient block is
diagonal, Block_ij = diag_d( d2/dx dy k_d(x_id, y_jd) ), so the MVM is d
independent (n x m) 1-D derivative-matrix products.

SeparableProduct K(x,y) = prod_d k_d(x_d, y_d): the block is
    Block = diag_d( loo_d * h_d ) + cross terms gx_d gy_e (d != e)
(loo = leave-one-out products). With P = prod_d v_d and ratios
h~ = h/v, g~ = g/v the action is
    b_id = sum_j P_ij [ h~_d A_jd + g~x_d ( s_ij - g~y_d A_jd ) ],
    s_ij = sum_e g~y_e(ij) A_je
— all (B, m) elementwise tiles + row reductions (the reference builds a
per-pair Woodbury with a rank-d correction instead). Ratios follow the
reference's division by k_i(x_i, y_i) (gradient_algebra.jl:119-122), so
kernels must be nonzero at the evaluated pairs (true for EQ/RQ/Matern...).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _dim_fns(kd):
    """Scalar 1-D functions (value, dk/dx, dk/dy, d2k/dxdy) for one
    per-dimension kernel."""
    f = lambda xi, yj: kd(xi, yj)
    gx = jax.grad(f, argnums=0)
    gy = jax.grad(f, argnums=1)
    h = jax.grad(gx, argnums=1)
    return f, gx, gy, h


def _cdiv(a, b):
    return -(-a // b)


def _pad_rows(x, block):
    n = x.shape[0]
    nb = _cdiv(n, block)
    pad = nb * block - n
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x.reshape(nb, block, x.shape[1])


@partial(jax.jit, static_argnames=("block",))
def grad_matvec_separable_sum(k, x, y, A, block=256):
    """Gradient-gramian MVM of a SeparableSum kernel."""
    d = x.shape[1]

    def body(xb):
        outs = []
        for i, kd in enumerate(k.args):
            _, _, _, h = _dim_fns(kd)
            H = jax.vmap(lambda xi: jax.vmap(lambda yj: h(xi, yj))(y[:, i]))(xb[:, i])
            outs.append(H @ A[:, i])
        return jnp.stack(outs, axis=1)

    out = lax.map(body, _pad_rows(x, block))
    return out.reshape(-1, d)[: x.shape[0]]


@partial(jax.jit, static_argnames=("block",))
def grad_matvec_separable_prod(k, x, y, A, block=256):
    """Gradient-gramian MVM of a SeparableProduct kernel."""
    d = x.shape[1]

    def body(xb):
        B = xb.shape[0]
        m = y.shape[0]
        V, Gx, Gy, H = [], [], [], []
        for i, kd in enumerate(k.args):
            f, gx, gy, h = _dim_fns(kd)
            pair = lambda fn, i=i: jax.vmap(
                lambda xi: jax.vmap(lambda yj: fn(xi, yj))(y[:, i])
            )(xb[:, i])
            V.append(pair(f))
            Gx.append(pair(gx))
            Gy.append(pair(gy))
            H.append(pair(h))
        P = V[0]
        for v in V[1:]:
            P = P * v
        s = jnp.zeros((B, m), dtype=P.dtype)
        gty = []
        for i in range(d):
            g = Gy[i] / V[i]
            gty.append(g)
            s = s + g * A[:, i][None, :]  # sum_e g~y_e(ij) A_je
        outs = []
        for i in range(d):
            ht = H[i] / V[i]
            gtx = Gx[i] / V[i]
            term = (P * ht) @ A[:, i]
            term = term + jnp.sum(P * gtx * s, axis=1)
            term = term - (P * gtx * gty[i]) @ A[:, i]
            outs.append(term)
        return jnp.stack(outs, axis=1)

    out = lax.map(body, _pad_rows(x, block))
    return out.reshape(-1, d)[: x.shape[0]]
