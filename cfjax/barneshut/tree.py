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
    points_np: np.ndarray = None  # numpy mirror of `points` (free on host
                                  # builds; saves a tunnel D2H per consumer)

    @property
    def n_leaves(self):
        return 2 ** self.levels


def build_tree(y, leafsize: int = 16, method: str = "auto") -> BalancedTree:
    """Build the complete balanced tree (host, numpy). Points are padded
    to 2^L * ls by duplicating the last point (padded weights are zero at
    matvec time, so results are exact; only node radii are mildly
    affected).

    method: "median" — per-level median splits along the widest dimension
    (adaptive boxes, O(n) argpartition per level); "morton" — one Morton
    (Z-order) sort, equal-count leaves sliced from the curve, boxes
    computed bottom-up (ONE gather + one sort total — ~4x faster at
    n = 10^6, slightly looser boxes); "auto" — morton for big low-d
    inputs, median otherwise."""
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

    if method == "auto":
        method = "morton" if (P >= (1 << 19) and d <= 8) else "median"
    if method == "morton" and d <= 16 and L > 0:
        return _build_tree_morton(yp, m, d, L, ls, P, pad)

    perm = np.arange(P)
    pts_run = yp.copy()
    centers_np, radii_np = [], []
    # iterative median splits, fully vectorized: at level l all 2^l
    # segments partition at once along their own widest dimension. A
    # median split only needs argpartition (O(n) per level, not a full
    # sort), and each level's min/max pass doubles as that level's
    # bounding-box center — one O(nd) sweep per level total (the
    # reference's BallTree build is O(n log n), src/barneshut.jl:28).
    for l in range(L + 1):
        nl = 1 << l
        seg = P // nl
        pts = pts_run.reshape(nl, seg, d)
        lo = pts.min(axis=1)
        hi = pts.max(axis=1)
        centers_np.append(0.5 * (lo + hi))
        radii_np.append(0.5 * np.sqrt(((hi - lo) ** 2).sum(-1)))
        if l == L:
            break
        dims = np.argmax(hi - lo, axis=1)  # (nl,) widest dimension
        coords = np.take_along_axis(
            pts, dims[:, None, None], axis=2
        )[:, :, 0]  # (nl, seg)
        order = np.argpartition(coords, seg // 2, axis=1)
        perm = np.take_along_axis(perm.reshape(nl, seg), order, axis=1).reshape(P)
        pts_run = np.take_along_axis(
            pts, order[:, :, None], axis=1
        ).reshape(P, d)
    points = pts_run

    # radii: exact max-distance at the leaves (one O(nd) pass), then
    # tighten every internal level with the triangle bound
    # r_parent <= max_child (r_child + ||c_child - c_parent||) against the
    # bbox half-diagonal — valid covering radii everywhere, without the
    # per-level O(nd) exact pass (which dominated the 10^6-point build)
    cL = centers_np[L]
    leaf_r2 = ((points.reshape(2**L, -1, d) - cL[:, None, :]) ** 2).sum(-1)
    radii_np[L] = np.sqrt(leaf_r2.max(axis=1))
    for l in range(L - 1, -1, -1):
        cc = centers_np[l + 1].reshape(2**l, 2, d)
        rc = radii_np[l + 1].reshape(2**l, 2)
        off = np.sqrt(((cc - centers_np[l][:, None, :]) ** 2).sum(-1))
        radii_np[l] = np.minimum(radii_np[l], (rc + off).max(axis=1))

    centers = [jnp.asarray(c) for c in centers_np]
    radii = [jnp.asarray(r) for r in radii_np]

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
        points_np=points,
    )


def _hilbert_transpose(q, bits, d):
    """Skilling's axes->transposed-Hilbert transform, vectorized over
    points (q: (P, d) uint64, each coordinate `bits` bits). A Hilbert
    curve is CONTINUOUS: consecutive curve positions are spatially
    adjacent, so equal-count slices never straddle the domain (Z-order's
    jumps produced leaves with radius ~ the whole cloud, which exploded
    the Barnes-Hut frontier)."""
    dt = q.dtype
    X = [q[:, j].copy() for j in range(d)]
    one = dt.type(1)
    M = dt.type(one << dt.type(bits - 1))
    Q = M
    while Q > one:
        p = dt.type(Q - one)
        for i in range(d):
            # branch-free: mask = all-ones where bit Q of X[i] is set
            mask = dt.type(0) - ((X[i] & Q) >> dt.type(int(Q).bit_length() - 1))
            t = (X[0] ^ X[i]) & p & ~mask
            X[0] ^= (p & mask) | t
            X[i] ^= t
        Q = dt.type(Q >> one)
    for i in range(1, d):
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    Q = M
    while Q > one:
        mask = dt.type(0) - ((X[d - 1] & Q) >> dt.type(int(Q).bit_length() - 1))
        t ^= dt.type(Q - one) & mask
        Q = dt.type(Q >> one)
    for i in range(d):
        X[i] ^= t
    return X


def _build_tree_morton(yp, m, d, L, ls, P, pad) -> BalancedTree:
    """Space-filling-curve build: quantize coordinates, Hilbert-transform,
    interleave bits, ONE argsort; equal-count leaves = contiguous slices
    of the curve; leaf bounding boxes in one pass, internal boxes
    bottom-up; exact leaf radii + triangle-bound internal radii (same
    bound family as the median build)."""
    # enough cells that leaves resolve: 2^(bits*d) >> P; 32-bit codes when
    # they fit (halves the bandwidth of the bit-twiddling passes)
    bits = min(62 // d, 12 if d >= 2 else 16)
    while (1 << (bits * d)) < 16 * P and bits * d <= 60:
        bits += 1
    dt = np.uint32 if bits * d <= 30 else np.uint64
    lo = yp.min(axis=0)
    hi = yp.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    q = ((yp - lo) / span * ((1 << bits) - 1)).astype(dt)
    X = _hilbert_transpose(q, bits, d)
    code = np.zeros(P, dtype=dt)
    # transposed-code bit i of axis j -> global bit (i*d + (d-1-j)):
    # axis 0 carries the MOST significant interleaved bits
    for b in range(bits):
        for j in range(d):
            code |= ((X[j] >> dt(b)) & dt(1)) << dt(b * d + (d - 1 - j))
    perm = np.argsort(code, kind="stable")
    points = yp[perm]

    # leaf boxes: one pass; internal boxes: pairwise min/max bottom-up
    los = [None] * (L + 1)
    his = [None] * (L + 1)
    pts = points.reshape(2**L, ls, d)
    los[L] = pts.min(axis=1)
    his[L] = pts.max(axis=1)
    for l in range(L - 1, -1, -1):
        los[l] = np.minimum(los[l + 1][0::2], los[l + 1][1::2])
        his[l] = np.maximum(his[l + 1][0::2], his[l + 1][1::2])
    centers_np = [0.5 * (los[l] + his[l]) for l in range(L + 1)]
    radii_np = [0.5 * np.sqrt(((his[l] - los[l]) ** 2).sum(-1))
                for l in range(L + 1)]
    leaf_r2 = ((pts - centers_np[L][:, None, :]) ** 2).sum(-1)
    radii_np[L] = np.sqrt(leaf_r2.max(axis=1))
    for l in range(L - 1, -1, -1):
        cc = centers_np[l + 1].reshape(2**l, 2, d)
        rc = radii_np[l + 1].reshape(2**l, 2)
        off = np.sqrt(((cc - centers_np[l][:, None, :]) ** 2).sum(-1))
        radii_np[l] = np.minimum(radii_np[l], (rc + off).max(axis=1))

    return BalancedTree(
        perm=perm,
        points=jnp.asarray(points),
        pad=pad,
        leafsize=ls,
        levels=L,
        centers=[jnp.asarray(c) for c in centers_np],
        radii=[jnp.asarray(r) for r in radii_np],
        centers_np=centers_np,
        radii_np=radii_np,
        points_np=points,
    )
