"""Barnes-Hut O(n log n) approximate Gramian MVM.

TPU-native rebuild of reference src/barneshut.jl + src/taylor.jl. The
reference recurses per target point with threads (src/barneshut.jl:76-97,
123-143); here the traversal is *level-synchronous and branch-free*:

  - per level l, a (targets x 2^l) acceptance mask:
        dist(x, node_center) > node_radius / theta   (theta=0: never)
  - accepted & parent-open nodes contribute their far-field term;
    rejected open nodes open their two children (a `repeat` on the mask);
  - leaves surviving open get exact dense evaluation through a fixed-size
    gather (jnp.nonzero(size=max_open)) of their contiguous point slices.

Far field uses the dipole-corrected 1st-order expansion of src/taylor.jl
(:7-57) for *all* weight signs:  f(d2) * S  -  2 f'(d2) <x - c, mu>,
with S = sum w_j, mu = sum w_j (y_j - c). This is branch-free (the
reference switches between center-of-mass and taylor paths at runtime,
src/barneshut.jl:45-52, which would be a traced branch under jit) and at
least as accurate: the dipole term cancels exactly where the reference's
center-of-mass trick would.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT
from ..kernels.base import InputTrait, input_trait
from ..operators.linop import LinearOperator
from .tree import BalancedTree, build_tree


def _sqd(xb, c):
    return jnp.maximum(
        jnp.sum(xb * xb, 1)[:, None] + jnp.sum(c * c, 1)[None, :] - 2 * (xb @ c.T),
        0.0,
    )


@partial(jax.jit, static_argnames=("levels", "leafsize", "max_open", "block"))
def bh_matvec(
    k,
    x,
    tree_points,
    centers,
    radii,
    w,
    theta: float,
    levels: int,
    leafsize: int,
    max_open: int,
    block: int = 128,
):
    """Approximate b_i = sum_j k(x_i, y_j) w_j. w is already permuted+padded.

    centers/radii: tuples of per-level arrays (levels+1 entries, leaf level
    last). Returns (b, overflow) where overflow is the worst number of
    open leaves encountered minus max_open (<= 0 means exact gather)."""
    n = x.shape[0]
    d = x.shape[1]
    P = tree_points.shape[0]
    nleaf = 2**levels

    # per-level node weight sums, |w|-centers-of-mass (the Taylor expansion
    # centers — reference compute_centers_of_mass with abs weights,
    # src/barneshut.jl:157-163, taylor.jl use_com=true) and dipole moments
    # about them (exactly zero for non-negative w -> the compressed term
    # reduces to the reference's center-of-mass evaluation)
    S_l, com_l, mu_l = [], [], []
    aw = jnp.abs(w)
    eps = jnp.finfo(w.dtype).eps
    for l in range(levels + 1):
        nl = 2**l
        wl = w.reshape(nl, P // nl)
        awl = aw.reshape(nl, P // nl)
        S = jnp.sum(wl, axis=1)
        pts = tree_points.reshape(nl, P // nl, d)
        com = jnp.sum(awl[:, :, None] * pts, axis=1) / (
            jnp.sum(awl, axis=1)[:, None] + eps
        )
        mu = jnp.sum(wl[:, :, None] * (pts - com[:, None, :]), axis=1)
        S_l.append(S)
        com_l.append(com)
        mu_l.append(mu)

    theta2 = theta * theta
    leaf_pts = tree_points.reshape(nleaf, leafsize, d)
    leaf_w = w.reshape(nleaf, leafsize)

    def profile_d2(D2):
        return k.profile(D2)

    def body(xb):
        B = xb.shape[0]
        acc = jnp.zeros((B,), dtype=xb.dtype)
        opened = jnp.ones((B, 1), dtype=bool)
        for l in range(levels + 1):
            C, R, S, com, mu = centers[l], radii[l], S_l[l], com_l[l], mu_l[l]
            # acceptance on the static geometric sphere (conservative);
            # evaluation/expansion at the |w|-center of mass
            D2c = _sqd(xb, C)
            far = theta2 * D2c > (R * R)[None, :]
            accepted = far & opened
            D2 = _sqd(xb, com)
            f0 = profile_d2(D2)
            # f' via one forward derivative, elementwise on the tile
            f1 = jax.vmap(jax.vmap(jax.grad(lambda s: k.profile(s))))(D2)
            rdotmu = xb @ mu.T - jnp.sum(com * mu, axis=1)[None, :]
            contrib = f0 * S[None, :] - 2.0 * f1 * rdotmu
            acc = acc + jnp.sum(jnp.where(accepted, contrib, 0.0), axis=1)
            if l < levels:
                opened = jnp.repeat(~far & opened, 2, axis=1)
            else:
                opened = ~far & opened  # leaves needing dense evaluation

        # dense leaf evaluation through fixed-size gather
        counts = jnp.sum(opened, axis=1)
        overflow = jnp.max(counts) - max_open

        def leaf_eval(xi, open_row):
            cnt = jnp.sum(open_row)
            (idx,) = jnp.nonzero(open_row, size=max_open, fill_value=0)
            # mask by position (fill slots alias leaf 0 — must not be counted)
            valid = jnp.arange(max_open) < cnt
            pts = leaf_pts[idx]          # (max_open, ls, d)
            wts = leaf_w[idx]            # (max_open, ls)
            D2 = jnp.sum((pts - xi[None, None, :]) ** 2, axis=-1)
            kv = profile_d2(D2)
            return jnp.sum(jnp.where(valid[:, None], kv * wts, 0.0))

        acc = acc + jax.vmap(leaf_eval)(xb, opened)
        return acc, overflow

    nb = -(-n // block)
    pad = nb * block - n
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    outs, overflows = jax.lax.map(body, xp.reshape(nb, block, d))
    return outs.reshape(-1)[:n], jnp.max(overflows)


class BarnesHutFactorization(LinearOperator):
    """Approximate lazy Gramian with O(n log n) MVM (reference
    BarnesHutFactorization, src/barneshut.jl:8-43; defaults leafsize 16,
    theta 1/4 from src/barneshut.jl:3-4). Solves via MINRES
    (src/barneshut.jl:64-72)."""

    def __init__(
        self,
        k,
        x,
        y=None,
        theta: float = None,
        leafsize: int = None,
        max_open: int = None,
        block: int = 128,
    ):
        from ..utils.grids import as_points

        if input_trait(k) != InputTrait.ISOTROPIC:
            raise ValueError("Barnes-Hut requires an isotropic kernel")
        self.k = k
        self.x = as_points(x)
        yp = self.x if y is None else as_points(y)
        self._same = y is None
        self.theta = DEFAULT.barneshut_theta if theta is None else theta
        leafsize = DEFAULT.barneshut_leafsize if leafsize is None else leafsize
        self.tree = build_tree(np.asarray(yp), leafsize)
        self.m = yp.shape[0]
        self.shape = (self.x.shape[0], self.m)
        self.dtype = jnp.result_type(self.x.dtype, float)
        self.block = block
        if max_open is None:
            max_open = self._estimate_max_open()
        self.max_open = max_open

    def _estimate_max_open(self, probe_block: int = 4096):
        """Probe the acceptance masks once (blocked) to size the leaf gather."""
        t = self.tree
        theta2 = self.theta**2

        @jax.jit
        def count_block(xb):
            opened = jnp.ones((xb.shape[0], 1), dtype=bool)
            for l in range(t.levels + 1):
                D2 = _sqd(xb, t.centers[l])
                far = theta2 * D2 > (t.radii[l] ** 2)[None, :]
                if l < t.levels:
                    opened = jnp.repeat(~far & opened, 2, axis=1)
                else:
                    opened = ~far & opened
            return jnp.max(jnp.sum(opened, axis=1))

        mo = 0
        n = self.x.shape[0]
        for i0 in range(0, n, probe_block):
            mo = max(mo, int(count_block(self.x[i0 : i0 + probe_block])))
        return max(8, int(np.ceil(mo / 8)) * 8)

    @property
    def is_symmetric(self):
        return self._same

    def _permuted_weights(self, v):
        t = self.tree
        P = t.points.shape[0]
        vp = jnp.concatenate([v, jnp.zeros((P - self.m,), dtype=v.dtype)])
        return vp[jnp.asarray(t.perm)]

    def _matvec(self, v):
        t = self.tree
        out, overflow = bh_matvec(
            self.k,
            self.x,
            t.points,
            tuple(t.centers),
            tuple(t.radii),
            self._permuted_weights(v),
            self.theta,
            t.levels,
            t.leafsize,
            self.max_open,
            self.block,
        )
        return out

    def solve(self, b, tol: float = 1e-8, maxiter: int = 500, **kw):
        from ..operators.solvers import minres

        x, _ = minres(self._matvec, jnp.asarray(b), tol=tol, maxiter=maxiter)
        return x
