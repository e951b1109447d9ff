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
        vg = jax.vmap(jax.vmap(jax.value_and_grad(lambda s: k.profile(s))))
        for l in range(levels + 1):
            C, R, S, com, mu = centers[l], radii[l], S_l[l], com_l[l], mu_l[l]
            # one distance per level: acceptance AND evaluation at the
            # |w|-center of mass (exactly the reference's criterion,
            # src/barneshut.jl:135 / taylor.jl:44, with the hypersphere
            # radius); value+derivative fused in one pass
            D2 = _sqd(xb, com)
            far = theta2 * D2 > (R * R)[None, :]
            accepted = far & opened
            f0, f1 = vg(D2)
            rdotmu = xb @ mu.T - jnp.sum(com * mu, axis=1)[None, :]
            contrib = f0 * S[None, :] - 2.0 * f1 * rdotmu
            acc = acc + jnp.sum(jnp.where(accepted, contrib, 0.0), axis=1)
            if l < levels:
                opened = jnp.repeat(~far & opened, 2, axis=1)
            else:
                opened = ~far & opened  # leaves needing dense evaluation

        # dense leaf evaluation through a fixed-size gather; open-leaf
        # indices come from ONE fused top_k over the whole block (a
        # vmapped per-row nonzero lowers to serialized per-row sorts on
        # TPU and dominated the MVM)
        counts = jnp.sum(opened, axis=1)
        overflow = jnp.max(counts) - max_open
        vals_k, idx_k = jax.lax.top_k(opened.astype(jnp.int32), max_open)
        valid = vals_k > 0  # (B, max_open)

        pts = leaf_pts[idx_k]            # (B, max_open, ls, d)
        wts = leaf_w[idx_k]              # (B, max_open, ls)
        D2l = jnp.sum((pts - xb[:, None, None, :]) ** 2, axis=-1)
        kvl = profile_d2(D2l)
        acc = acc + jnp.sum(
            jnp.where(valid[:, :, None], kvl * wts, 0.0), axis=(1, 2)
        )
        return acc, overflow

    nb = -(-n // block)
    pad = nb * block - n
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    outs, overflows = jax.lax.map(body, xp.reshape(nb, block, d))
    return outs.reshape(-1)[:n], jnp.max(overflows)


@partial(jax.jit, static_argnames=("levels",))
def _count_open_leaves(xb, centers, radii, theta, levels):
    """Max open-leaf count for a target block (module-level so the compile
    is cached across BarnesHutFactorization instances).

    The sweep's acceptance uses distances to |w|-centers of mass, which
    move within the node sphere; probing with the geometric centers and
    radius inflated to R(1+theta) yields a superset of the possible open
    sets (dist_com >= dist_geo - R), so max_open never under-counts."""
    theta2 = theta * theta
    opened = jnp.ones((xb.shape[0], 1), dtype=bool)
    for l in range(levels + 1):
        D2 = _sqd(xb, centers[l])
        r_infl = radii[l] * (1.0 + theta)
        far = theta2 * D2 > (r_infl * r_infl)[None, :]
        if l < levels:
            opened = jnp.repeat(~far & opened, 2, axis=1)
        else:
            opened = ~far & opened
    return jnp.max(jnp.sum(opened, axis=1))


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
        block: int = None,
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
        if block is None:
            # keep the per-block (block x n_leaves) mask around ~8M entries:
            # large blocks amortize dispatch latency, small ones bound memory
            block = int(np.clip(8_000_000 // max(self.tree.n_leaves, 1), 128, 4096))
        self.block = block
        if max_open is None:
            max_open = self._estimate_max_open()
        self.max_open = max_open

    def _estimate_max_open(self, probe_block: int = 4096):
        """Probe the acceptance masks once (blocked) to size the leaf gather."""
        t = self.tree
        mo = 0
        n = self.x.shape[0]
        for i0 in range(0, n, probe_block):
            mo = max(
                mo,
                int(
                    _count_open_leaves(
                        self.x[i0 : i0 + probe_block],
                        tuple(t.centers),
                        tuple(t.radii),
                        self.theta,
                        t.levels,
                    )
                ),
            )
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
        from ..operators.solvers import cached_jit, minres

        f = cached_jit(
            self,
            ("minres", tol, maxiter),
            lambda: (lambda bb: minres(self._matvec, bb, tol=tol, maxiter=maxiter)[0]),
        )
        return f(jnp.asarray(b))
