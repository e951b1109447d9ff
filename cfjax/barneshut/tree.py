"""Balanced spatial tree in fixed-depth arrays.

TPU-native replacement for the reference's pointer-based BallTree
(NearestNeighbors.jl, used at src/barneshut.jl:25-36): a *complete*
binary tree built by recursive median splits along the widest dimension,
stored as a permutation of the points plus per-level center/radius
arrays. Every node at level l covers a contiguous slice of the permuted
points — so node reductions (weight sums, centers of mass, dipole
moments) are plain reshape-sums on device, and the traversal is a
level-synchronous masked sweep (no recursion, no pointers).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class BalancedTree:
    perm: np.ndarray          # (P,) permutation into padded points
    points: jnp.ndarray       # (P, d) permuted (padded) points
    pad: int                  # number of padded duplicate points at play
    leafsize: int
    levels: int               # L: number of internal levels; leaves = 2^L
    centers: list             # per level l: (2^l, d) geometric centers
    radii: list               # per level l: (2^l,) covering radii
    centers_np: list = None   # numpy mirrors for host-side probes
    radii_np: list = None

    @property
    def n_leaves(self):
        return 2 ** self.levels


def build_tree(y, leafsize: int = 16) -> BalancedTree:
    """Build the complete balanced tree (host, numpy). Points are padded
    to 2^L * ls by duplicating the last point (padded weights are zero at
    matvec time, so results are exact; only node radii are mildly
    affected)."""
    y = np.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    m, d = y.shape
    L = max(0, math.ceil(math.log2(max(1, m / leafsize))))
    nleaf = 2**L
    ls = math.ceil(m / nleaf)
    P = nleaf * ls
    pad = P - m
    yp = np.concatenate([y, np.repeat(y[-1:], pad, axis=0)], axis=0) if pad else y

    perm = np.arange(P)
    # iterative median splits, fully vectorized: at level l all 2^l
    # segments are sorted at once along their own widest dimension (one
    # batched argsort per level instead of 2^l separate sorts)
    for l in range(L):
        nl = 1 << l
        seg = P // nl
        pts = yp[perm].reshape(nl, seg, d)
        dims = np.argmax(pts.max(axis=1) - pts.min(axis=1), axis=1)  # (nl,)
        coords = np.take_along_axis(
            pts, dims[:, None, None], axis=2
        )[:, :, 0]  # (nl, seg)
        order = np.argsort(coords, axis=1, kind="stable")
        perm = np.take_along_axis(perm.reshape(nl, seg), order, axis=1).reshape(P)
    points = yp[perm]

    centers, radii = [], []
    centers_np, radii_np = [], []
    for l in range(L + 1):
        nl = 2**l
        seg = P // nl
        pts = points.reshape(nl, seg, d)
        lo = pts.min(axis=1)
        hi = pts.max(axis=1)
        c = 0.5 * (lo + hi)
        r = np.sqrt(((pts - c[:, None, :]) ** 2).sum(-1)).max(axis=1)
        centers.append(jnp.asarray(c))
        radii.append(jnp.asarray(r))
        centers_np.append(c)
        radii_np.append(r)

    return BalancedTree(
        perm=perm,
        points=jnp.asarray(points),
        pad=pad,
        leafsize=ls,
        levels=L,
        centers=centers,
        radii=radii,
        centers_np=centers_np,
        radii_np=radii_np,
    )
