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
from functools import partial

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


class EllSparseOperator:
    """ELLPACK sparse matrix: per-row padded column indices + values.

    The TPU-native sparse format: rows of a radius-sparsified kernel
    matrix have bounded nnz, so (n, width) index/value arrays make the
    MVM a dense gather + rowwise reduction — regular memory traffic
    instead of BCOO scatter/gather."""

    def __init__(self, cols, vals, m, nnz):
        self.cols = cols          # (n, width) int32, fill = m (points at pad slot)
        self.vals = vals          # (n, width)
        self.shape = (cols.shape[0], m)
        self.width = cols.shape[1]
        self.nnz = nnz
        self.dtype = vals.dtype

    @property
    def is_symmetric(self):
        return False  # storage is row-wise; values may be symmetric

    def __matmul__(self, a):
        return ell_matvec(self.cols, self.vals, jnp.asarray(a))

    def todense(self):
        n, m = self.shape
        out = jnp.zeros((n, m + 1), dtype=self.vals.dtype)
        rows = jnp.broadcast_to(jnp.arange(n)[:, None], self.cols.shape)
        out = out.at[rows, self.cols].add(self.vals)
        return out[:, :m]


@jax.jit
def ell_matvec(cols, vals, a):
    ap = jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], dtype=a.dtype)])
    gathered = ap[cols]  # (n, width[, r])
    if a.ndim == 1:
        return jnp.sum(vals * gathered, axis=1)
    return jnp.sum(vals[..., None] * gathered, axis=1)


@jax.jit
def _ell_counts(xb3, yp, r2):
    y2 = jnp.sum(yp * yp, axis=1)

    def one(xb):
        D = jnp.maximum(
            jnp.sum(xb * xb, 1)[:, None] + y2[None, :] - 2 * (xb @ yp.T), 0.0
        )
        return jnp.sum(D <= r2, axis=1)

    return jax.lax.map(one, xb3)


@partial(jax.jit, static_argnames=("w",))
def _ell_build(k, xb3, yp, r2, w):
    m = yp.shape[0]
    y2 = jnp.sum(yp * yp, axis=1)

    def one(xb):
        D = jnp.maximum(
            jnp.sum(xb * xb, 1)[:, None] + y2[None, :] - 2 * (xb @ yp.T), 0.0
        )
        mask = D <= r2
        vals_full = jnp.where(mask, k.profile(D), 0.0)

        def row(mask_row, vals_row):
            (idx,) = jnp.nonzero(mask_row, size=w, fill_value=m)
            v = jnp.where(idx < m, vals_row[jnp.minimum(idx, m - 1)], 0.0)
            return idx.astype(jnp.int32), v

        return jax.vmap(row)(mask, vals_full)

    return jax.lax.map(one, xb3)


def sparse_gramian(k, x, y=None, tol: float = None, block: int = 2048,
                   format: str = "tile"):
    """Sparse approximation of gramian(k, x, y): keeps entries within the
    analytic decay radius (reference `SparseArrays.sparse(G, tol)`,
    src/sparse.jl:5-22). Built entirely on device in row blocks; returns
    (operator, nnz_ratio). format: "tile" (TPU-native TileELL, default),
    "ell" (plain ELLPACK) or "bcoo"."""
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
    nb = -(-n // block)
    # pad rows far away (finite: 1e15^2 stays inside float32 range, so no
    # inf-inf NaNs in the distance expansion); padded rows match nothing
    xpad = jnp.pad(xp, ((0, nb * block - n), (0, 0)), constant_values=1e15)

    # pass 1: per-row neighbor counts — ONE dispatch (lax.map over row
    # blocks; per-block eager dispatches each cost a tunnel round trip)
    counts = np.asarray(
        _ell_counts(xpad.reshape(nb, block, -1), yp, r2)
    ).reshape(-1)[:n]
    # multiple-of-8 width: tight storage/gather traffic (pow2 rounding
    # inflated the MVM by width/max); distinct widths compile separately
    # but land in the persistent compile cache
    width = max(8, -(-int(counts.max()) // 8) * 8)

    # pass 2: column indices + kernel values, ONE dispatch
    cols, vals = _ell_build(k, xpad.reshape(nb, block, -1), yp, r2, width)
    cols = cols.reshape(nb * block, width)[:n]
    vals = vals.reshape(nb * block, width)[:n]
    nnz = int(counts.sum())
    ratio = nnz / (n * m)

    if format == "ell":
        return EllSparseOperator(cols, vals, m, nnz), ratio
    if format == "tile":
        from .tile_ell import build_tile_ell_device

        return build_tile_ell_device(cols, vals, counts, n, m), ratio
    # host COO for BCOO export
    cols_np = np.asarray(cols)
    vals_np = np.asarray(vals)
    rows_np = np.broadcast_to(np.arange(n)[:, None], cols_np.shape)
    keep = cols_np < m
    from jax.experimental import sparse as jsparse

    indices = jnp.asarray(
        np.stack([rows_np[keep], cols_np[keep]], axis=1), dtype=jnp.int32
    )
    mat = jsparse.BCOO((jnp.asarray(vals_np[keep]), indices), shape=(n, m))
    return mat, ratio
