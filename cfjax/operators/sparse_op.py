"""Sparsification of lazy Gramians.

Rebuild of reference src/sparse.jl: entries below a tolerance are
dropped using *analytic* kernel decay radii (closed forms per kernel,
src/sparse.jl:25-38), and the surviving pattern becomes a BCOO sparse
matrix (jax.experimental.sparse) whose MVM runs on-device.

The reference finds neighbors with a ball tree (NearestNeighbors.jl);
the TPU-native build computes distances in row blocks on the device
(batched matmul tiles — the same kernel-tile machinery as the MVM) and
assembles the sparse pattern on host, once, at construction.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT
from ..kernels.algebra import Power, Product, Sum
from ..kernels.base import InputTrait, input_trait
from ..kernels.stationary import (
    Cauchy,
    Constant,
    EQ,
    Exp,
    GammaExp,
    InverseMultiQuadratic,
    Matern,
    MaternP,
    RQ,
)
from ..kernels.transforms import Lengthscale


def decay_radius(k, tol: float):
    """Radius r beyond which |k(r^2)| < tol (reference src/sparse.jl:25-38).
    Closed forms where known; None -> numeric bisection on the profile."""
    if tol >= 1:
        return 0.0
    if isinstance(k, EQ):
        return math.sqrt(-2 * math.log(tol))
    if isinstance(k, Exp):
        return -math.log(tol)
    if isinstance(k, GammaExp):
        return (-2 * math.log(tol)) ** (1.0 / k.gamma)
    if isinstance(k, Cauchy):
        return math.sqrt(max(1.0 / tol - 1.0, 0.0))
    if isinstance(k, RQ):
        a = float(np.asarray(k.alpha))
        return math.sqrt(max(2 * a * (tol ** (-1.0 / a) - 1.0), 0.0))
    if isinstance(k, InverseMultiQuadratic):
        c = float(np.asarray(k.c))
        return math.sqrt(max(1.0 / tol**2 - c * c, 0.0))
    if isinstance(k, Lengthscale):
        return float(np.asarray(k.l)) * decay_radius(k.k, tol)
    if isinstance(k, (Matern, MaternP)):
        return _bisect_radius(k, tol)
    if isinstance(k, Power):
        return decay_radius(k.k, tol ** (1.0 / k.p))
    if isinstance(k, Product):
        # |prod| < tol once any decaying factor is below tol / prod(max of others);
        # conservative: use the min radius at tol (each factor <= 1 at 0 not
        # guaranteed, so fall back to bisection)
        return _bisect_radius(k, tol)
    if isinstance(k, Sum):
        rads = [decay_radius(a, tol / len(k.args)) for a in k.args if not isinstance(a, Constant)]
        if any(r is None for r in rads):
            return None
        return max(rads) if rads else None
    if input_trait(k) == InputTrait.ISOTROPIC:
        return _bisect_radius(k, tol)
    return None


def _bisect_radius(k, tol: float, r_max: float = 1e6):
    """Numeric decay radius for monotone-decaying isotropic profiles."""
    f = lambda r: float(k.profile(jnp.asarray(r * r)))
    if f(r_max) > tol:
        return None
    lo, hi = 0.0, r_max
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if f(mid) > tol:
            lo = mid
        else:
            hi = mid
    return hi


def sparse_gramian(k, x, y=None, tol: float = None, block: int = 2048):
    """BCOO sparse approximation of gramian(k, x, y): keeps entries within
    the analytic decay radius (reference `SparseArrays.sparse(G, tol)`,
    src/sparse.jl:5-22). Returns (bcoo, nnz_ratio)."""
    from jax.experimental import sparse as jsparse

    from ..utils.grids import as_points

    tol = DEFAULT.default_tol if tol is None else tol
    xp = as_points(x)
    yp = xp if y is None else as_points(y)
    r = decay_radius(k, tol)
    if r is None:
        raise ValueError(
            f"no decay radius available for {type(k).__name__}; "
            "sparsification needs an isotropic decaying kernel"
        )
    r2 = r * r
    n, m = xp.shape[0], yp.shape[0]

    y2 = jnp.sum(yp * yp, axis=1)

    @jax.jit
    def block_vals(xb):
        D = jnp.maximum(
            jnp.sum(xb * xb, 1)[:, None] + y2[None, :] - 2 * (xb @ yp.T), 0.0
        )
        mask = D <= r2
        vals = k.profile(D)
        return mask, vals

    rows_l, cols_l, vals_l = [], [], []
    for i0 in range(0, n, block):
        xb = xp[i0 : i0 + block]
        mask, vals = block_vals(xb)
        mask_np = np.asarray(mask)
        ridx, cidx = np.nonzero(mask_np)
        rows_l.append(ridx + i0)
        cols_l.append(cidx)
        vals_l.append(np.asarray(vals)[ridx, cidx])

    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    vals = np.concatenate(vals_l)
    indices = jnp.asarray(np.stack([rows, cols], axis=1))
    data = jnp.asarray(vals)
    mat = jsparse.BCOO((data, indices), shape=(n, m))
    return mat, len(vals) / (n * m)
