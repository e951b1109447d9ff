"""Accuracy-controlled distance / inner-product tiles.

TPU MXU matmuls ingest f32 inputs at bf16 by default. For kernel
matrices this is not a benign speed knob (measured on v5e, round 3):
the ||x||^2 + ||y||^2 - 2 x.y expansion CANCELS, so bf16 input rounding
puts ~1e-2 absolute error on the squared-distance tile and ~7e-3
relative error on dense-MVM outputs — enough to break the PSD-ness that
Cholesky-based logML needs (NaN gradients on the real chip).

Two remedies, both here:
  * small d (<= config.direct_sqdist_max_d): evaluate the difference
    form sum_i (x_i - y_i)^2 directly on the VPU, unrolled over the
    static d — EXACT in f32 (no cancellation: subtract first), and
    cheaper than a 128-padded matmul below d ~ 16.
  * larger d: keep the MXU expansion but at a configurable input
    precision (default "highest" = bf16_6x ~ f32: rel err 2.8e-6 vs
    7e-3; "high" = bf16_3x: 4.2e-5 at half the cost; "default" for
    speed-of-light runs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config as _config

_PREC = {"default": jax.lax.Precision.DEFAULT,
         "high": jax.lax.Precision.HIGH,
         "highest": jax.lax.Precision.HIGHEST}


def resolve_precision(precision=None):
    p = _config.DEFAULT.matmul_precision if precision is None else precision
    return _PREC.get(p, p)


def matmul_p(a, b, precision=None):
    """a @ b at the configured MXU input precision. Output-side
    contractions (k1 @ A, W @ y, ...) have no cancellation, but bf16
    input rounding still leaves ~2e-3 relative error on gradient-MVM
    outputs (measured r3) — the reference's README touts machine
    precision, so accuracy is the default here too."""
    return jnp.matmul(a, b, precision=resolve_precision(precision))


def inner_tile(xb, y, precision=None):
    """(B, m) inner-product tile x_i . y_j at controlled MXU precision."""
    return jax.lax.dot_general(
        xb, y, (((1,), (1,)), ((), ())), precision=resolve_precision(precision)
    )


def sqdist_tile(xb, y, precision=None, direct_max_d=None):
    """(B, m) squared-distance tile ||x_i - y_j||^2, exact at small d
    (unrolled difference form), MXU expansion otherwise."""
    d = xb.shape[1]
    dmax = _config.DEFAULT.direct_sqdist_max_d if direct_max_d is None else direct_max_d
    if d <= dmax:
        D = None
        for i in range(d):
            t = xb[:, i, None] - y[None, :, i]
            t = t * t
            D = t if D is None else D + t
        return D
    S = inner_tile(xb, y, precision)
    D = (jnp.sum(xb * xb, axis=1)[:, None]
         + jnp.sum(y * y, axis=1)[None, :] - 2.0 * S)
    return jnp.maximum(D, 0.0)
