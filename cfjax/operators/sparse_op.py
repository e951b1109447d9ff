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

from .. import config as _config
from .linop import LinearOperator
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


class EllSparseOperator(LinearOperator):
    """ELLPACK sparse matrix: per-row padded column indices + values.

    The TPU-native sparse format: rows of a radius-sparsified kernel
    matrix have bounded nnz, so (n, width) index/value arrays make the
    MVM a dense gather + rowwise reduction — regular memory traffic
    instead of BCOO scatter/gather.

    A full LinearOperator (VERDICT r3 #7): `.solve`, `.T`, `add_diagonal`
    compose, closing the reference's sparsify-then-`\\` workflow
    (src/sparse.jl -> SparseMatrixCSC -> `\\`)."""

    def __init__(self, cols, vals, m, nnz, symmetric=False):
        self.cols = cols          # (n, width) int32, fill = m (points at pad slot)
        self.vals = vals          # (n, width)
        self.shape = (cols.shape[0], m)
        self.width = cols.shape[1]
        self.nnz = nnz
        self.dtype = vals.dtype
        self._sym = symmetric and cols.shape[0] == m

    @property
    def is_symmetric(self):
        return self._sym

    def _matvec(self, a):
        return ell_matvec(self.cols, self.vals, a)

    _matmat = _matvec

    def _rmatvec(self, a):
        if self._sym:
            return self._matvec(a)
        return ell_rmatvec(self.cols, self.vals, a, self.shape[1])

    def diagonal(self):
        n, m = self.shape
        hit = self.cols == jnp.arange(n)[:, None]
        return jnp.sum(jnp.where(hit, self.vals, 0.0), axis=1)

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


@partial(jax.jit, static_argnames=("m",))
def ell_rmatvec(cols, vals, a, m):
    """Transpose MVM: out[c] += val * a[row] — one scatter-add (pad
    column m is cropped)."""
    contrib = vals * a[:, None]
    out = jnp.zeros((m + 1,), dtype=contrib.dtype)
    return out.at[cols].add(contrib)[:m]


@jax.jit
def _ell_counts(xb3, yp, r2):
    from ..ops.tiles import sqdist_tile

    def one(xb):
        # direct difference form out to d = 64: EXACT values near the
        # radius cut (the bf16 matmul expansion loses ~1e-2 absolute on
        # D) and the VPU cost is negligible vs the 6-pass HIGHEST matmul
        D = sqdist_tile(xb, yp, direct_max_d=64)
        return jnp.sum(D <= r2, axis=1)

    return jax.lax.map(one, xb3)


@partial(jax.jit, static_argnames=("w",))
def _ell_build_topk(k, xb3, yp, r2, w):
    """Per-row neighbor extraction WITHOUT per-row nonzero: the key
    `-col where in-range` makes lax.top_k return the in-range column ids
    in ascending order (TPU's top_k is a fused vectorized reduction; the
    vmap-of-nonzero this replaces was scatter-bound at 43 ns/element over
    the full n*m mask — VERDICT r3 #2). Returns (cols (B, w) int32 sorted
    per row with pad = m, vals (B, w))."""
    from ..ops.tiles import sqdist_tile

    m = yp.shape[0]
    neg_inf = jnp.iinfo(jnp.int32).min

    def one(xb):
        D = sqdist_tile(xb, yp, direct_max_d=64)
        mask = D <= r2
        key = jnp.where(mask, -jnp.arange(m, dtype=jnp.int32)[None, :],
                        neg_inf)
        kv, idx = jax.lax.top_k(key, w)
        valid = kv > neg_inf
        vals_full = jnp.where(mask, k.profile_value(D), 0.0)
        v = jnp.where(valid, jnp.take_along_axis(vals_full, idx, axis=1), 0.0)
        c = jnp.where(valid, idx, m).astype(jnp.int32)
        return c, v

    return jax.lax.map(one, xb3)


# quantized shape menus: every device computation in the build is keyed
# on (block-count, width) static shapes; rounding both to a sparse menu
# makes "warm" builds on NEW data hit the jit cache instead of
# recompiling (measured: per-dataset tier shapes cost 20-30 s/build in
# tunnel compiles)
_SHAPE_MENU = np.array(
    [1, 2, 3, 4, 6, 8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512,
     768, 1024, 1536, 2048, 3072, 4096, 6144, 8192, 12288, 16384, 24576,
     32768])


def _menu_roundup(v, lo=8):
    v = max(int(v), lo)
    idx = np.searchsorted(_SHAPE_MENU, v)
    if idx >= len(_SHAPE_MENU):
        return -(-v // 8192) * 8192
    return int(_SHAPE_MENU[idx])


def _width_tiers(counts_sorted, n, align, max_tiers=4):
    """Partition the count-SORTED rows into <= max_tiers contiguous tiers,
    each padded to its own menu-quantized width; boundaries are multiples
    of `align` rows. Greedy split minimizing total slot count — the
    single-width ELL paid max(count) on EVERY row (one dense row = 40x
    padding)."""
    n_pad = -(-n // align) * align
    cs = np.concatenate(
        [np.asarray(counts_sorted), np.zeros(n_pad - n, dtype=np.int64)])
    w_of = _menu_roundup
    bounds = [0, n_pad]
    for _ in range(max_tiers - 1):
        best = None
        for s in range(len(bounds) - 1):
            lo, hi = bounds[s], bounds[s + 1]
            if hi - lo < 2 * align:
                continue
            base = w_of(cs[lo]) * (hi - lo)
            for cut in range(lo + align, hi, align):
                cost = (w_of(cs[lo]) * (cut - lo)
                        + w_of(cs[cut]) * (hi - cut))
                gain = base - cost
                if best is None or gain > best[0]:
                    best = (gain, cut)
        if best is None or best[0] <= 0:
            break
        bounds.append(best[1])
        bounds.sort()
    return [(bounds[i], bounds[i + 1], w_of(cs[bounds[i]]))
            for i in range(len(bounds) - 1)]


@partial(jax.jit, static_argnames=("w",))
def _ell_build(k, xb3, yp, r2, w):
    from ..ops.tiles import sqdist_tile

    m = yp.shape[0]

    def one(xb):
        D = sqdist_tile(xb, yp, direct_max_d=64)
        mask = D <= r2
        vals_full = jnp.where(mask, k.profile_value(D), 0.0)

        def row(mask_row, vals_row):
            (idx,) = jnp.nonzero(mask_row, size=w, fill_value=m)
            v = jnp.where(idx < m, vals_row[jnp.minimum(idx, m - 1)], 0.0)
            return idx.astype(jnp.int32), v

        return jax.vmap(row)(mask, vals_full)

    return jax.lax.map(one, xb3)


@partial(jax.jit, static_argnames=("chunk",))
def _tree_counts(xg3, ygath3, vmask3, ycolvalid3, r2, chunk=8):
    """Per-row neighbor counts over candidate tiles.
    xg3: (G, lsx, d); ygath3: (G, C, d) candidate source points;
    vmask3/ycolvalid3: (G, C) bool — candidate-leaf valid x column valid."""

    from ..ops.tiles import sqdist_tile

    def one(args):
        xg, yg, ok = args
        D = sqdist_tile(xg, yg)
        return jnp.sum((D <= r2) & ok[None, :], axis=1)

    return jax.lax.map(one, (xg3, ygath3, vmask3 & ycolvalid3),
                       batch_size=chunk)


@partial(jax.jit, static_argnames=("w", "chunk"))
def _tree_build(k, xg3, ygath3, gcols3, okmask3, r2, w, chunk=8):
    """Pass 2: per-row (col, val) ELL rows of width w, columns in ORIGINAL
    y numbering (gcols3: (G, C) int32 global column of each candidate
    slot, m at invalid slots)."""
    m_sentinel = jnp.iinfo(jnp.int32).max

    from ..ops.tiles import sqdist_tile

    def one(args):
        xg, yg, gc, ok = args
        D = sqdist_tile(xg, yg)
        mask = (D <= r2) & ok[None, :]
        vals_full = jnp.where(mask, k.profile_value(D), 0.0)

        def row(mask_row, vals_row):
            (idx,) = jnp.nonzero(mask_row, size=w, fill_value=-1)
            valid = idx >= 0
            safe = jnp.maximum(idx, 0)
            v = jnp.where(valid, vals_row[safe], 0.0)
            c = jnp.where(valid, gc[safe], m_sentinel)
            return c, v

        return jax.vmap(row)(mask, vals_full)

    return jax.lax.map(one, (xg3, ygath3, gcols3, okmask3), batch_size=chunk)


class TreeSparseOperator(LinearOperator):
    """Lazy radius-sparsified gramian in leaf-tile block-sparse form.

    The ball-tree range search (reference src/sparse.jl:5-22) yields, for
    every x-leaf, its candidate y-leaves; instead of materializing an
    (n, width) ELL array (whose device->host transfer dominates build time
    at n >= 10^5 on a remote-tunnel TPU), this operator keeps only the
    candidate slot indices on device and RECOMPUTES kernel tiles inside
    every MVM — the same lazy philosophy as the dense Gramian, with the
    distance tiles riding the MXU. Memory: O(n * avg_candidates) int32."""

    def __init__(self, k, r2, tree_pts_x3, ptsy, dsts, slots, masks,
                 n, m, perm_y, nnz, symmetric=False):
        self.k = k
        self.r2 = r2
        self._x3 = tree_pts_x3      # list[(G, lsx, d)]
        self._ptsy = ptsy           # (Py, d) permuted padded sources
        self._dsts = dsts           # list[(G*lsx,)] target rows (n = pad dump)
        self._slots = slots         # list[(G, C)] indices into permuted y
        self._masks = masks         # list[(G, C)] valid-slot masks
        self._perm_y = perm_y       # (Py,) permuted slot -> original col
        self.shape = (n, m)
        self.nnz = nnz
        self.dtype = jnp.result_type(ptsy.dtype, float)
        self._sym = symmetric and n == m

    @property
    def is_symmetric(self):
        # for x === y the pruned pattern and values are symmetric even
        # though the leaf-tile STORAGE is row-wise
        return self._sym

    def _matvec(self, a):
        n, m = self.shape
        Py = self._ptsy.shape[0]
        ap = jnp.concatenate([a, jnp.zeros((Py - m,) if Py > m else (0,),
                                           dtype=a.dtype)])
        w = ap[self._perm_y]
        out = jnp.zeros((n + 1,), dtype=self.dtype)
        for xg, dst, slot, ok in zip(self._x3, self._dsts, self._slots,
                                     self._masks):
            og = _tree_tile_contract(self.k, self.r2, xg, self._ptsy,
                                     slot, ok, w)
            out = out.at[dst].add(og)
        return out[:n]

    def todense(self):
        n, m = self.shape
        I = jnp.eye(m, dtype=self.dtype)
        return jax.vmap(self._matvec, in_axes=1, out_axes=1)(I)


@jax.jit
def _tree_tile_contract(k, r2, xg, ptsy, slot, ok, w):
    yg = ptsy[slot]                        # (G, C, d)
    wg = w[slot] * ok                      # (G, C)
    # exact unrolled difference form (tree path is low-d by construction;
    # the bf16 matmul expansion loses ~1e-2 absolute on D, ops/tiles.py)
    d = xg.shape[2]
    D = None
    for i in range(d):
        t = xg[:, :, None, i] - yg[:, None, :, i]
        t = t * t
        D = t if D is None else D + t
    val = jnp.where((D <= r2) & ok[:, None, :], k.profile_value(D), 0.0)
    from ..ops.tiles import resolve_precision
    return jnp.einsum("gxc,gc->gx", val, wg,
                      precision=resolve_precision(None)).reshape(-1)


def _tree_candidates(xp, yp, same, r, leafsize=None):
    """Ball-tree leaf-pair range search (reference src/sparse.jl:42-54
    in_range_neighbors): balanced trees over targets and sources; leaf
    pairs whose center distance exceeds r + rx + ry are pruned. Returns
    the bucketed candidate structure (few distinct shapes — each distinct
    (G, C) shape is a separate remote compile on the TPU tunnel), or None
    when pruning won't pay (high-d: leaf radii swamp the decay radius —
    the dense scan is then the faster MXU-friendly path)."""
    from ..barneshut.tree import build_tree

    n, m, d = xp.shape[0], yp.shape[0], xp.shape[1]
    leafsize = leafsize or max(32, min(256, int(math.sqrt(max(n, 1))) // 2 * 2))
    tx = build_tree(np.asarray(xp), leafsize)
    ty = tx if same else build_tree(np.asarray(yp), leafsize)
    Lx, Ly = tx.levels, ty.levels
    cx, rx = tx.centers_np[Lx], tx.radii_np[Lx]
    cy, ry = ty.centers_np[Ly], ty.radii_np[Ly]
    lsx, lsy = tx.leafsize, ty.leafsize
    Gx, Gy = tx.n_leaves, ty.n_leaves

    dist = np.sqrt(
        np.maximum(
            (cx * cx).sum(1)[:, None] + (cy * cy).sum(1)[None, :]
            - 2 * cx @ cy.T,
            0.0,
        )
    )
    cand = dist <= r + rx[:, None] + ry[None, :]
    kcnt = cand.sum(1)
    # pruning payoff test: candidate fraction of all source leaves
    if kcnt.mean() > 0.5 * Gy:
        return None

    perm_x = np.asarray(tx.perm)
    perm_y = np.asarray(ty.perm)
    ycol_of_slot = perm_y  # permuted slot -> original column (>= m: pad)

    # bucket x-leaves by padded candidate count (pow2)
    Kpad = np.maximum(1, 1 << np.ceil(np.log2(np.maximum(kcnt, 1))).astype(int))
    xg_all = tx.points_np.reshape(Gx, lsx, d)
    lsy_ar = np.arange(lsy)
    buckets = []
    for Kb in np.unique(Kpad):
        sel = np.nonzero(Kpad == Kb)[0]
        G = sel.shape[0]
        # vectorized candidate-list packing: nonzero is ordered by group
        gi_idx, leaf_idx = np.nonzero(cand[sel])
        cnt_g = kcnt[sel]
        pos = np.arange(gi_idx.shape[0]) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt_g)[:-1]]), cnt_g
        )
        # group count menu-quantized: every distinct (G, C) shape is a
        # separate remote compile of _tree_counts/_tree_build, and G is
        # data-dependent — pad with dummy groups (sel = -1, all-invalid
        # masks) so the shapes recur across datasets
        Gq = _menu_roundup(G, lo=1)
        ids = np.zeros((Gq, Kb), dtype=np.int64)
        vmask = np.zeros((Gq, Kb), dtype=bool)
        ids[gi_idx, pos] = leaf_idx
        vmask[gi_idx, pos] = True
        slot = (ids[:, :, None] * lsy + lsy_ar[None, None, :]).reshape(Gq, Kb * lsy)
        gcols = ycol_of_slot[slot]  # (G, C) original column ids (>=m: pad)
        okmask = np.repeat(vmask, lsy, axis=1) & (gcols < m)
        sel_q = np.concatenate([sel, np.full(Gq - G, -1, dtype=sel.dtype)])
        buckets.append((sel_q, slot, gcols, okmask))
    return dict(tx=tx, ty=ty, buckets=buckets, xg_all=xg_all,
                perm_x=perm_x, perm_y=perm_y, lsx=lsx, Gx=Gx)


def _tree_lazy_operator(k, xp, yp, same, r, cd):
    """Build the lazy TreeSparseOperator from the candidate structure.
    Device memory: slot/mask arrays only; zero ELL materialization and
    zero device->host value traffic. Returns (operator, nnz)."""
    n, m = xp.shape[0], yp.shape[0]
    r2 = r * r
    lsx, Gx = cd["lsx"], cd["Gx"]
    perm_x = cd["perm_x"]
    pts_y = cd["ty"].points          # device copy, owned by the operator
    pts_y_np = cd["ty"].points_np    # host mirror for slot gathers
    rowvalid = perm_x < n

    x3s, dsts, slots, masks = [], [], [], []
    counts_t = np.zeros((Gx, lsx), dtype=np.int64)
    for sel, slot, gcols, okmask in cd["buckets"]:
        vg = sel >= 0                       # dummy shape-padding groups
        sel_s = np.maximum(sel, 0)
        xg = jnp.asarray(cd["xg_all"][sel_s])
        ygath = jnp.asarray(pts_y_np[slot])
        okj = jnp.asarray(okmask)
        cnt = np.asarray(_tree_counts(xg, ygath, okj, okj, r2))
        counts_t[sel[vg]] = cnt[vg]
        rows_t = (sel_s[:, None] * lsx + np.arange(lsx)[None, :]).reshape(-1)
        ok_row = np.repeat(vg, lsx) & rowvalid[rows_t]
        dst = np.where(ok_row, perm_x[rows_t], n).astype(np.int32)
        x3s.append(xg)
        dsts.append(jnp.asarray(dst))
        slots.append(jnp.asarray(slot.astype(np.int32)))
        masks.append(okj)
    nnz = int(counts_t.reshape(-1)[rowvalid].sum())
    op = TreeSparseOperator(k, r2, x3s, pts_y, dsts, slots, masks, n, m,
                            jnp.asarray(cd["perm_y"]), nnz, symmetric=same)
    return op, nnz


def _tree_neighbor_lists(k, xp, yp, same, r, leafsize=None, cd=None):
    """Materialized (cols, vals, counts, width) ELL rows via the tree
    candidate structure, cols in original y numbering (fill m). Returns
    None when pruning won't pay."""
    n, m = xp.shape[0], yp.shape[0]
    if cd is None:
        cd = _tree_candidates(xp, yp, same, r, leafsize)
    if cd is None:
        return None
    lsx, Gx = cd["lsx"], cd["Gx"]
    perm_x = cd["perm_x"]
    pts_y_np = cd["ty"].points_np
    bucket_data = [
        (sel, jnp.asarray(cd["xg_all"][np.maximum(sel, 0)]),
         jnp.asarray(pts_y_np[slot]),
         jnp.asarray(gcols.astype(np.int32)), jnp.asarray(okmask))
        for sel, slot, gcols, okmask in cd["buckets"]
    ]

    r2 = r * r
    # pass 1: global max row count -> shared ELL width
    counts_t = np.zeros((Gx, lsx), dtype=np.int64)
    for sel, xg, ygath, gcols, okmask in bucket_data:
        vg = sel >= 0                       # dummy shape-padding groups
        cnt = np.asarray(_tree_counts(xg, ygath, okmask, okmask, r2))
        counts_t[sel[vg]] = cnt[vg]
    counts_t = counts_t.reshape(-1)
    width = max(8, -(-int(counts_t.max()) // 8) * 8)

    out_cols = np.full((n, width), m, dtype=np.int32)
    out_vals = np.zeros((n, width), dtype=np.asarray(xp).dtype)
    rowvalid = perm_x < n
    sentinel = np.iinfo(np.int32).max
    for sel, xg, ygath, gcols, okmask in bucket_data:
        cols_b, vals_b = _tree_build(k, xg, ygath, gcols, okmask, r2, width)
        cols_b = np.asarray(cols_b).reshape(-1, width)  # (G*lsx, width)
        vals_b = np.asarray(vals_b).reshape(-1, width)
        vg = sel >= 0
        rows_t = (np.maximum(sel, 0)[:, None] * lsx
                  + np.arange(lsx)[None, :]).reshape(-1)
        ok = np.repeat(vg, lsx) & rowvalid[rows_t]
        dst = perm_x[rows_t[ok]]
        c = cols_b[ok]
        out_cols[dst] = np.where(c == sentinel, m, c)
        out_vals[dst] = vals_b[ok]

    counts = np.zeros(n, dtype=np.int64)
    counts[perm_x[rowvalid]] = counts_t[rowvalid]
    # sort each row by column id (pad col = m lands last): the TileELL
    # packer's run-length collision logic requires sorted ELL rows, and
    # sorted rows gather more coherently in the plain-ELL MVM too
    order = np.argsort(out_cols, axis=1, kind="stable")
    out_cols = np.take_along_axis(out_cols, order, axis=1)
    out_vals = np.take_along_axis(out_vals, order, axis=1)
    return jnp.asarray(out_cols), jnp.asarray(out_vals), counts, width


def sparse_gramian(k, x, y=None, tol: float = None, block: int = 2048,
                   format: str = "tile", method: str = "auto",
                   leafsize: int = None):
    """Sparse approximation of gramian(k, x, y): keeps entries within the
    analytic decay radius (reference `SparseArrays.sparse(G, tol)`,
    src/sparse.jl:5-22). Returns (operator, nnz_ratio).
    format: "tile" (TPU-native TileELL, default), "ell" or "bcoo".
    method: "tree" (ball-tree leaf-pair pruned range search, reference
    src/sparse.jl:42-54), "scan" (blocked dense distance scan on the MXU),
    or "auto" — tree when the leaf test predicts real pruning (low-d,
    local neighborhoods), else scan."""
    from ..utils.grids import as_points

    tol = _config.DEFAULT.default_tol if tol is None else tol
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

    # the quadratic scan materializes one (block, m) f32 distance tile per
    # lax.map step; cap it at ~2^27 entries (~512 MB) by shrinking the
    # block for very wide m (asymmetric cross-gramians, e.g. n=2048
    # against m=10^6, would otherwise build an ~8 GB tile — ADVICE r3)
    max_tile = 1 << 27
    if block * m > max_tile:
        block = max(128, 1 << max(0, (max_tile // max(m, 1)).bit_length() - 1))

    # the tree range search pays only when the quadratic scan is genuinely
    # big: the tiered top_k scan handles n*m ~ 2^31 in ~1 s on the MXU/VPU,
    # while a doomed tree attempt (high-d: leaf radii >= decay radius, so
    # nothing prunes) costs seconds of host work before bailing
    if format == "lazy" or method == "tree" or (
            method == "auto" and n * m > (1 << 31)):
        cd = _tree_candidates(xp, yp, y is None, r, leafsize)
        if cd is not None:
            # at large n the materialized ELL arrays cost O(n*width) HBM
            # and (on a remote tunnel) a device->host round trip that
            # dwarfs the math — the lazy leaf-tile operator keeps only
            # O(n * avg_candidates) int32 slots on device
            if format == "lazy" or (format == "tile" and n * m > (1 << 31)):
                op, nnz = _tree_lazy_operator(k, xp, yp, y is None, r, cd)
                return op, nnz / (n * m)
            res = _tree_neighbor_lists(k, xp, yp, y is None, r, leafsize, cd=cd)
            cols, vals, counts, width = res
            nnz = int(counts.sum())
            ratio = nnz / (n * m)
            return _pack_sparse(cols, vals, counts, n, m, nnz, format,
                                symmetric=y is None), ratio
        if method == "tree" or format == "lazy":
            raise ValueError(
                "tree sparsification prunes nothing here (leaf radii >= "
                "decay radius, e.g. high-d data); use method='scan'"
            )
    nb = -(-n // block)
    # pad rows far away (finite: 1e15^2 stays inside float32 range, so no
    # inf-inf NaNs in the distance expansion); padded rows match nothing
    xpad = jnp.pad(xp, ((0, nb * block - n), (0, 0)), constant_values=1e15)

    # pass 1: per-row neighbor counts — ONE dispatch (lax.map over row
    # blocks; per-block eager dispatches each cost a tunnel round trip)
    counts = np.asarray(
        _ell_counts(xpad.reshape(nb, block, -1), yp, r2)
    ).reshape(-1)[:n]
    nnz = int(counts.sum())
    ratio = nnz / (n * m)

    if format == "tile" and -(-m // 128) <= 256:
        # count-sorted width-tiered build: rows sorted by neighbor count
        # (the order TileELL wants anyway), tiers sized so one dense row
        # doesn't inflate every row's padded width
        from .tile_ell import build_tile_ell_from_sorted

        perm = np.argsort(-counts, kind="stable")
        # tier boundaries must be multiples of both the scan block and the
        # TileELL group granularity (128 lanes x 8 pallas row-blocks)
        align = 1024 * block // math.gcd(1024, block)
        tiers = _width_tiers(counts[perm], n, align=align)
        xs = xp[jnp.asarray(perm)]
        buckets = []
        for lo, hi, w in tiers:
            w = min(w, m)  # top_k requires k <= m
            hi_r = min(hi, n)
            if hi_r <= lo:
                continue
            # block count quantized to the menu: pad rows with far-away
            # points (match nothing) so the jitted shape recurs across
            # datasets; crop to the real rows afterwards
            nbb = _menu_roundup(-(-(hi_r - lo) // block), lo=1)
            xt = jax.lax.dynamic_slice_in_dim(
                jnp.pad(xs, ((0, max(0, lo + nbb * block - n)), (0, 0)),
                        constant_values=1e15), lo, nbb * block)
            cols_b, vals_b = _ell_build_topk(
                k, xt.reshape(nbb, block, -1), yp, r2, w)
            buckets.append((lo, cols_b.reshape(-1, w),
                            vals_b.reshape(-1, w), hi_r - lo))
        return build_tile_ell_from_sorted(buckets, perm, nnz, n, m,
                                          symmetric=y is None), ratio

    # multiple-of-8 width: tight storage/gather traffic (pow2 rounding
    # inflated the MVM by width/max); distinct widths compile separately
    # but land in the persistent compile cache
    width = max(8, -(-int(counts.max()) // 8) * 8)

    # pass 2: column indices + kernel values, ONE dispatch
    cols, vals = _ell_build(k, xpad.reshape(nb, block, -1), yp, r2, width)
    cols = cols.reshape(nb * block, width)[:n]
    vals = vals.reshape(nb * block, width)[:n]
    return _pack_sparse(cols, vals, counts, n, m, nnz, format,
                        symmetric=y is None), ratio


def _pack_sparse(cols, vals, counts, n, m, nnz, format, symmetric=False):
    if format == "tile" and -(-m // 128) > 256:
        # TileELL slabs are dense over column tiles: HBM ~ n*m*K/16 B and
        # the per-grid-step VMEM block ~ 8*nt*128*8 B both scale with m.
        # Beyond nt=256 (m > 32768) the format stops paying — plain ELL
        # keeps memory at O(nnz).
        format = "ell"
    if format == "ell":
        return EllSparseOperator(cols, vals, m, nnz, symmetric=symmetric)
    if format == "tile":
        from .tile_ell import build_tile_ell_device

        return build_tile_ell_device(cols, vals, counts, n, m,
                                     symmetric=symmetric)
    # host COO for BCOO export
    cols_np = np.asarray(cols)
    vals_np = np.asarray(vals)
    rows_np = np.broadcast_to(np.arange(n)[:, None], cols_np.shape)
    keep = cols_np < m
    from jax.experimental import sparse as jsparse

    indices = jnp.asarray(
        np.stack([rows_np[keep], cols_np[keep]], axis=1), dtype=jnp.int32
    )
    return jsparse.BCOO((jnp.asarray(vals_np[keep]), indices), shape=(n, m))
