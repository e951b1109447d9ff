"""Gradient kernels: cov(grad f(x), grad f(y)) — the flagship O(n^2 d) path.

TPU-native rebuild of reference src/gradient.jl. The reference evaluates
one lazy O(d)-storage block per pair and runs a threaded block loop
(src/gramian.jl:241-257); here the *entire* block MVM is reorganized into
a few dense matmuls per row-block (MXU-shaped, no per-pair work at all):

isotropic trait (src/gradient.jl:86-92: block = -2 f' I - 4 f'' r r^T):
    b_i = sum_j [-2 K1_ij A_j - 4 K2_ij r_ij <r_ij, A_j>]
with r_ij = x_i - y_j expanded so that only
    K1 @ A,  X A^T,  W @ Y,  rowsum(W) * X      (W = K2 * (X A^T - t))
appear — four n x m x d matmuls, O(n m d) total like the reference's
closed form, but saturating the MXU instead of scalar SIMD loops.

dot-product trait (src/gradient.jl:109-115: block = f' I + f'' y x^T):
    b = K1 @ A + (K2 * (X A^T)) @ Y

stationary-linear-functional (src/gradient.jl:129-136: block = -f'' c c^T):
    b = -(K2 @ (A c)) outer c

The scalar derivative stacks come from jax.grad of the (possibly
composite) profile — which is why Sum/Product/Power/Chained composites of
one trait need no special-casing here (cf. src/gradient_algebra.jl).
Heterogeneous-trait Sums are operator sums of per-term plans
(src/gradient_algebra.jl:31-36); everything else falls back to a
vmap-of-jacobian generic path (src/gradient.jl:27-42).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .. import config as _config
from ..kernels.base import InputTrait, Kernel, MultiKernel, input_trait
from ..kernels.derivatives import elementwise_derivatives
from ..operators.gramian import slf_vector
from ..operators.linop import LinearOperator, SumOperator, ZeroOperator


def _cdiv(a, b):
    return -(-a // b)


def _pad_rows(x, block):
    n = x.shape[0]
    nb = _cdiv(n, block)
    pad = nb * block - n
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x.reshape(nb, block, x.shape[1])


from ..ops.tiles import inner_tile as _inner_tile
from ..ops.tiles import matmul_p as _mm
from ..ops.tiles import sqdist_tile as _sqdist_tile


# --------------------------------------------------------------------------
# trait-specialized full-gramian block MVMs
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("block",))
def grad_matvec_iso(k, x, y, A, block=256):
    """(n d) x (m d) gradient-gramian MVM, isotropic trait. A: (m, d)."""
    t = jnp.sum(y * A, axis=1)  # <y_j, A_j>

    def body(xb):
        D = _sqdist_tile(xb, y)
        _, k1, k2 = elementwise_derivatives(k.profile, D, 2)
        P = _inner_tile(xb, A)  # <x_i, A_j>
        W = k2 * (P - t[None, :])
        return -2.0 * _mm(k1, A) - 4.0 * (jnp.sum(W, 1)[:, None] * xb - _mm(W, y))

    out = lax.map(body, _pad_rows(x, block))
    return out.reshape(-1, x.shape[1])[: x.shape[0]]


@partial(jax.jit, static_argnames=("block",))
def grad_matvec_dot(k, x, y, A, block=256):
    def body(xb):
        S = _inner_tile(xb, y)
        _, k1, k2 = elementwise_derivatives(k.profile, S, 2)
        W = k2 * _inner_tile(xb, A)
        return _mm(k1, A) + _mm(W, y)

    out = lax.map(body, _pad_rows(x, block))
    return out.reshape(-1, x.shape[1])[: x.shape[0]]


@partial(jax.jit, static_argnames=("block",))
def grad_matvec_slf(k, x, y, A, block=512):
    c = slf_vector(k)
    u = A @ c  # <c, A_j>
    tx = x @ c
    ty = y @ c

    def body(tb):
        T = tb[:, None] - ty[None, :]
        _, _, k2 = elementwise_derivatives(k.profile, T, 2)
        return -_mm(k2, u)

    tb = tx
    nb = _cdiv(tb.shape[0], block)
    pad = nb * block - tb.shape[0]
    tbp = jnp.pad(tb, (0, pad)).reshape(nb, block)
    w = lax.map(body, tbp).reshape(-1)[: x.shape[0]]
    return w[:, None] * c[None, :]


def _pair_block_apply(k):
    """Generic per-pair (grad_x grad_y^T k) @ a (src/gradient.jl:27-42
    fallback, via forward-over-reverse)."""

    def f(xi, yj, aj):
        gx = lambda y_: jax.grad(lambda x_: k(x_, y_))(xi)
        _, jvp_val = jax.jvp(gx, (yj,), (aj,))
        return jvp_val

    return f


@partial(jax.jit, static_argnames=("block",))
def grad_matvec_generic(k, x, y, A, block=32):
    pair = _pair_block_apply(k)

    def body(xb):
        def one_row(xi):
            contribs = jax.vmap(lambda yj, aj: pair(xi, yj, aj))(y, A)
            return jnp.sum(contribs, axis=0)

        return jax.vmap(one_row)(xb)

    out = lax.map(body, _pad_rows(x, block))
    return out.reshape(-1, x.shape[1])[: x.shape[0]]


# --------------------------------------------------------------------------
# value+gradient (d+1 blocks) MVMs
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("block",))
def valgrad_matvec_iso(k, x, y, a0, A, block=256):
    """(1+d)-block MVM, isotropic: K = [[f, (grad_y f)^T], [grad_x f, GG]]
    with grad_x k = 2 f' r, grad_y k = -2 f' r (reference
    value_gradient_covariance!, src/gradient.jl:480-544)."""
    t = jnp.sum(y * A, axis=1)

    def body(xb):
        D = _sqdist_tile(xb, y)
        k0, k1, k2 = elementwise_derivatives(k.profile, D, 2)
        P = _inner_tile(xb, A)
        R = P - t[None, :]  # <r_ij, A_j>
        b0 = k0 @ a0 - 2.0 * jnp.sum(k1 * R, axis=1)
        Wa = k1 * a0[None, :]
        W = k2 * R
        b1 = (
            2.0 * (jnp.sum(Wa, 1)[:, None] * xb - _mm(Wa, y))
            - 2.0 * _mm(k1, A)
            - 4.0 * (jnp.sum(W, 1)[:, None] * xb - _mm(W, y))
        )
        return jnp.concatenate([b0[:, None], b1], axis=1)

    out = lax.map(body, _pad_rows(x, block))
    return out.reshape(-1, 1 + x.shape[1])[: x.shape[0]]


@partial(jax.jit, static_argnames=("block",))
def valgrad_matvec_dot(k, x, y, a0, A, block=256):
    """(1+d)-block MVM, dot trait: grad_x k = f' y, grad_y k = f' x."""

    def body(xb):
        S = _inner_tile(xb, y)
        k0, k1, k2 = elementwise_derivatives(k.profile, S, 2)
        P = _inner_tile(xb, A)
        b0 = k0 @ a0 + jnp.sum(k1 * P, axis=1)
        b1 = _mm(k1 * a0[None, :], y) + _mm(k1, A) + _mm(k2 * P, y)
        return jnp.concatenate([b0[:, None], b1], axis=1)

    out = lax.map(body, _pad_rows(x, block))
    return out.reshape(-1, 1 + x.shape[1])[: x.shape[0]]


@partial(jax.jit, static_argnames=("block",))
def valgrad_matvec_generic(k, x, y, a0, A, block=32):
    def pair(xi, yj, a0j, aj):
        kv = k(xi, yj)
        gy = jax.grad(lambda y_: k(xi, y_))(yj)
        gx_fn = lambda y_: jax.grad(lambda x_: k(x_, y_))(xi)
        gx = gx_fn(yj)
        _, blk_a = jax.jvp(gx_fn, (yj,), (aj,))
        b0 = kv * a0j + jnp.dot(gy, aj)
        b1 = gx * a0j + blk_a
        return b0, b1

    def body(xb):
        def one_row(xi):
            b0s, b1s = jax.vmap(lambda yj, a0j, aj: pair(xi, yj, a0j, aj))(y, a0, A)
            return jnp.concatenate([jnp.sum(b0s)[None], jnp.sum(b1s, 0)])

        return jax.vmap(one_row)(xb)

    out = lax.map(body, _pad_rows(x, block))
    return out.reshape(-1, 1 + x.shape[1])[: x.shape[0]]


# --------------------------------------------------------------------------
# operators + kernel wrappers
# --------------------------------------------------------------------------


class GradientGramian(LinearOperator):
    """Flat (n d) x (m d) lazy operator over d x d gradient blocks.

    Flat vector layout is point-major: v[j*d + l] = A[j, l] (the analogue
    of the reference's BlockFactorization flattening, src/gramian.jl:120-130)."""

    def __init__(self, k, x, y=None, block=None):
        from ..utils.grids import as_points

        self.k = k
        self.x = as_points(x)
        self.y = self.x if y is None else as_points(y)
        self._same = y is None
        self.d = self.x.shape[1]
        self.shape = (self.x.shape[0] * self.d, self.y.shape[0] * self.d)
        self.dtype = jnp.result_type(self.x.dtype, float)
        self.mode = _grad_mode(k)
        self.block = block

    @property
    def is_symmetric(self):
        return self._same

    @property
    def is_psd(self):
        # PSD holds for the derivative gramian of a genuine Mercer kernel
        # (cov of derivatives); don't claim it from symmetry alone
        return self._same and getattr(self.k, "is_mercer", False)

    def _pallas_ok(self):
        from ..ops.pallas_mvm import pallas_supported

        return (
            self.mode in ("iso", "dot")
            and self.shape[0] >= 1024 * self.d
            and pallas_supported(self.k, self.mode, self.x, self.y)
        )

    def _apply(self, A):
        kws = {} if self.block is None else dict(block=self.block)
        if self.mode in ("iso", "dot") and self._pallas_ok():
            from ..ops.pallas_mvm import pallas_grad_matvec

            return pallas_grad_matvec(self.k, self.x, self.y, A, self.mode)
        if self.mode == "iso":
            return grad_matvec_iso(self.k, self.x, self.y, A, **kws)
        if self.mode == "dot":
            return grad_matvec_dot(self.k, self.x, self.y, A, **kws)
        if self.mode == "slf":
            return grad_matvec_slf(self.k, self.x, self.y, A, **kws)
        if self.mode == "pair":
            from .pair import grad_matvec_pair

            return grad_matvec_pair(self.k, self.x, self.y, A, **kws)
        return grad_matvec_generic(self.k, self.x, self.y, A, **kws)

    def _matvec(self, v):
        A = v.reshape(self.y.shape[0], self.d)
        return self._apply(A).reshape(-1)


def _grad_mode(k) -> str:
    from .pair import pair_family_available

    t = input_trait(k)
    if t == InputTrait.ISOTROPIC:
        return "iso"
    if t == InputTrait.DOT:
        return "dot"
    if t == InputTrait.STATIONARY_LINEAR_FUNCTIONAL:
        try:
            slf_vector(k)
            return "slf"
        except ValueError:
            return "generic"
    if pair_family_available(k):
        return "pair"  # NN kernel + heterogeneous iso/dot/NN composites
    return "generic"


@dataclasses.dataclass(frozen=True)
class GradientKernel(MultiKernel):
    """d x d matrix-valued kernel cov(grad f(x), grad f(y))
    (reference GradientKernel, src/gradient.jl:7-24)."""

    k: Kernel

    def block_shape(self, d):
        return (d, d)

    def __call__(self, x, y):
        x = jnp.atleast_1d(jnp.asarray(x))
        y = jnp.atleast_1d(jnp.asarray(y))
        return jax.jacfwd(lambda y_: jax.grad(lambda x_: self.k(x_, y_))(x))(y)

    def gramian(self, x, y=None, **opts):
        from ..kernels.algebra import Sum
        from ..kernels.stationary import Constant
        from ..kernels.transforms import ScaledInputKernel, Warped

        from ..kernels.algebra import SeparableProduct, SeparableSum

        k = self.k
        # per-dimension separable kernels (src/gradient_algebra.jl:93-145)
        if isinstance(k, (SeparableProduct, SeparableSum)):
            return SeparableGradientGramian(k, x, y, **opts)
        # input-transform chain rule: J^T Block J conjugation
        # (src/gradient_algebra.jl:149-163)
        if isinstance(k, Warped):
            return JacobianConjugatedGradientGramian(k.k, k.u, x, y, **opts)
        if isinstance(k, ScaledInputKernel):
            U = jnp.asarray(k.U)
            return JacobianConjugatedGradientGramian(
                k.k, lambda z: U @ z, x, y, **opts
            )
        # f(x) h f(y): one value+gradient MVM of h (rank-2 Woodbury
        # analogue, src/gradient_algebra.jl:177-202)
        from ..kernels.transforms import Chained, VerticalRescaling

        if isinstance(k, VerticalRescaling):
            return VerticalRescalingGradientGramian(k.k, k.f, x, y, **opts)
        # Chained of a trait-less kernel: diag(f') H + rank-1 f''
        # correction (src/gradient_algebra.jl:207-227); trait-carrying
        # Chained stays on the composed-profile fast paths
        if isinstance(k, Chained) and _grad_mode(k) == "generic":
            return ChainedGradientGramian(k, x, y, **opts)
        if isinstance(k, Constant):
            from ..utils.grids import as_points

            xp = as_points(x)
            d = xp.shape[1]
            m = xp.shape[0] if y is None else as_points(y).shape[0]
            return ZeroOperator((xp.shape[0] * d, m * d))
        # heterogeneous-trait sum -> operator sum of per-term plans
        # (src/gradient_algebra.jl:31-36)
        if isinstance(k, Sum) and _grad_mode(k) == "generic":
            terms = []
            for a in k.args:
                if isinstance(a, Constant):
                    continue  # constants have zero gradient blocks
                terms.append(GradientKernel(a).gramian(x, y, **opts))
            if not terms:
                from ..utils.grids import as_points

                xp = as_points(x)
                d = xp.shape[1]
                return ZeroOperator((xp.shape[0] * d,) * 2)
            return terms[0] if len(terms) == 1 else SumOperator(tuple(terms))
        return GradientGramian(k, x, y, **opts)


@dataclasses.dataclass(frozen=True)
class ValueGradientKernel(MultiKernel):
    """(1+d) x (1+d) matrix-valued kernel of (f, grad f) observations
    (reference ValueGradientKernel, src/gradient.jl:400-474)."""

    k: Kernel

    def block_shape(self, d):
        return (d + 1, d + 1)

    def __call__(self, x, y):
        x = jnp.atleast_1d(jnp.asarray(x))
        y = jnp.atleast_1d(jnp.asarray(y))
        kv = self.k(x, y)
        gx = jax.grad(lambda x_: self.k(x_, y))(x)
        gy = jax.grad(lambda y_: self.k(x, y_))(y)
        blk = jax.jacfwd(lambda y_: jax.grad(lambda x_: self.k(x_, y_))(x))(y)
        top = jnp.concatenate([kv[None], gy])[None, :]
        bottom = jnp.concatenate([gx[:, None], blk], axis=1)
        return jnp.concatenate([top, bottom], axis=0)

    def gramian(self, x, y=None, **opts):
        """Combinator-routed (1+d)-block gramian (reference
        value_gradient_covariance! Sum/Product recursion,
        src/gradient.jl:480-544, and the gradient_algebra.jl transform
        rules lifted to the value row — VERDICT r3 #5)."""
        from ..kernels.algebra import Sum
        from ..kernels.stationary import Constant
        from ..kernels.transforms import (
            ScaledInputKernel,
            VerticalRescaling,
            Warped,
        )

        k = self.k
        if isinstance(k, Warped):
            return JacobianConjugatedValueGradientGramian(k.k, k.u, x, y, **opts)
        if isinstance(k, ScaledInputKernel):
            U = jnp.asarray(k.U)
            return JacobianConjugatedValueGradientGramian(
                k.k, lambda z: U @ z, x, y, **opts
            )
        if isinstance(k, VerticalRescaling):
            return VerticalRescalingValueGradientGramian(k.k, k.f, x, y, **opts)
        if isinstance(k, Constant):
            return ConstantValueGradientGramian(k.c, x, y)
        if isinstance(k, Sum) and _grad_mode(k) == "generic":
            terms = []
            for a in k.args:
                terms.append(ValueGradientKernel(a).gramian(x, y, **opts))
            return terms[0] if len(terms) == 1 else SumOperator(tuple(terms))
        return ValueGradientGramian(self.k, x, y, **opts)


class ValueGradientGramian(LinearOperator):
    """Flat (n (1+d)) x (m (1+d)) operator; layout per point: [value, grad...]."""

    def __init__(self, k, x, y=None, block=None):
        from ..utils.grids import as_points

        self.k = k
        self.x = as_points(x)
        self.y = self.x if y is None else as_points(y)
        self._same = y is None
        self.d = self.x.shape[1]
        D = self.d + 1
        self.shape = (self.x.shape[0] * D, self.y.shape[0] * D)
        self.dtype = jnp.result_type(self.x.dtype, float)
        self.mode = _grad_mode(k)
        self.block = block

    @property
    def is_symmetric(self):
        return self._same

    @property
    def is_psd(self):
        # PSD holds for the derivative gramian of a genuine Mercer kernel
        # (cov of derivatives); don't claim it from symmetry alone
        return self._same and getattr(self.k, "is_mercer", False)

    def _matvec(self, v):
        D = self.d + 1
        V = v.reshape(self.y.shape[0], D)
        a0, A = V[:, 0], V[:, 1:]
        kws = {} if self.block is None else dict(block=self.block)
        if self.mode == "iso":
            out = valgrad_matvec_iso(self.k, self.x, self.y, a0, A, **kws)
        elif self.mode == "dot":
            out = valgrad_matvec_dot(self.k, self.x, self.y, a0, A, **kws)
        elif self.mode == "pair":
            from .pair import valgrad_matvec_pair

            out = valgrad_matvec_pair(self.k, self.x, self.y, a0, A, **kws)
        else:
            out = valgrad_matvec_generic(self.k, self.x, self.y, a0, A, **kws)
        return out.reshape(-1)


class ConstantValueGradientGramian(LinearOperator):
    """(1+d)-block gramian of a Constant kernel: value block = c fill,
    all derivative blocks zero (reference value_gradient_covariance! on
    Constant terms; cf. src/gradient.jl:158-168 for the gradient case)."""

    def __init__(self, c, x, y=None, **_):
        from ..utils.grids import as_points

        xp = as_points(x)
        yp = xp if y is None else as_points(y)
        self._same = y is None
        self.c = jnp.asarray(c)
        self.d = xp.shape[1]
        self.n, self.m = xp.shape[0], yp.shape[0]
        D = self.d + 1
        self.shape = (self.n * D, self.m * D)
        self.dtype = jnp.result_type(xp.dtype, float)

    @property
    def is_symmetric(self):
        return self._same

    @property
    def is_psd(self):
        return self._same

    def _matvec(self, v):
        D = self.d + 1
        a0 = v.reshape(self.m, D)[:, 0]
        out = jnp.zeros((self.n, D), dtype=jnp.result_type(v.dtype, self.c))
        out = out.at[:, 0].set(self.c * jnp.sum(a0))
        return out.reshape(-1)


class JacobianConjugatedValueGradientGramian(LinearOperator):
    """(1+d)-block gramian of k(u(x), u(y)): the value row is untouched,
    the gradient rows are conjugated by the per-point Jacobians — i.e.
    blockdiag(1, J_x)^T [VG of k at u-points] blockdiag(1, J_y)
    (reference src/gradient_algebra.jl:149-163 lifted to the value row,
    src/gradient.jl:480-544)."""

    def __init__(self, inner_kernel, u, x, y=None, block=None):
        from ..utils.grids import as_points

        xp = as_points(x)
        yp = xp if y is None else as_points(y)
        self._same = y is None
        ux = jax.vmap(u)(xp)
        ux = ux[:, None] if ux.ndim == 1 else ux
        uy = ux if y is None else jax.vmap(u)(yp)
        uy = uy[:, None] if uy.ndim == 1 else uy
        self.Jx = jax.vmap(jax.jacfwd(u))(xp)
        if self.Jx.ndim == 2:
            self.Jx = self.Jx[:, None, :]
        self.Jy = self.Jx if y is None else jax.vmap(jax.jacfwd(u))(yp)
        if self.Jy.ndim == 2:
            self.Jy = self.Jy[:, None, :]
        self.inner = ValueGradientGramian(inner_kernel, ux, uy, block=block)
        self.d = xp.shape[1]
        self.d_out = ux.shape[1]
        self.shape = (xp.shape[0] * (self.d + 1), yp.shape[0] * (self.d + 1))
        self.dtype = self.inner.dtype

    @property
    def is_symmetric(self):
        return self._same

    @property
    def is_psd(self):
        return self._same and getattr(self.inner.k, "is_mercer", False)

    def _matvec(self, v):
        m = self.shape[1] // (self.d + 1)
        V = v.reshape(m, self.d + 1)
        a0, A = V[:, 0], V[:, 1:]
        A_up = jnp.einsum("moi,mi->mo", self.Jy, A)
        Vin = jnp.concatenate([a0[:, None], A_up], axis=1)
        out_up = (self.inner @ Vin.reshape(-1)).reshape(-1, self.d_out + 1)
        b0 = out_up[:, 0]
        B = jnp.einsum("noi,no->ni", self.Jx, out_up[:, 1:])
        return jnp.concatenate([b0[:, None], B], axis=1).reshape(-1)


class VerticalRescalingValueGradientGramian(LinearOperator):
    """(1+d)-block gramian of k(x,y) = f(x) h(x,y) f(y). Rides ONE inner
    value+gradient MVM of h (same trick as the gradient-only case below):
    with alpha_j = f_j a0_j + <grad f_j, A_j> and beta_j = f_j A_j,
        out0_i = f_i * vg0_i
        outg_i = grad f_i * vg0_i + f_i * vg1_i
    where (vg0, vg1) = VG(h) @ (alpha, beta). Derivation: expand
    grad_x grad_y^T [f(x) h f(y)] and regroup (reference
    src/gradient_algebra.jl:177-202 + src/gradient.jl:480-544)."""

    def __init__(self, h, f, x, y=None, block=None):
        from ..utils.grids import as_points

        self.f = f
        xp = as_points(x)
        yp = xp if y is None else as_points(y)
        self._same = y is None
        self.d = xp.shape[1]
        self.fx = jax.vmap(f)(xp)
        self.gfx = jax.vmap(jax.grad(f))(xp)
        self.fy = self.fx if y is None else jax.vmap(f)(yp)
        self.gfy = self.gfx if y is None else jax.vmap(jax.grad(f))(yp)
        self.inner = ValueGradientGramian(h, xp, yp, block=block)
        D = self.d + 1
        self.shape = (xp.shape[0] * D, yp.shape[0] * D)
        self.dtype = self.inner.dtype

    @property
    def is_symmetric(self):
        return self._same

    @property
    def is_psd(self):
        return self._same and getattr(self.inner.k, "is_mercer", False)

    def _matvec(self, v):
        m = self.shape[1] // (self.d + 1)
        V = v.reshape(m, self.d + 1)
        a0, A = V[:, 0], V[:, 1:]
        alpha = self.fy * a0 + jnp.sum(self.gfy * A, axis=1)
        Vin = jnp.concatenate([alpha[:, None], self.fy[:, None] * A], axis=1)
        vg = (self.inner @ Vin.reshape(-1)).reshape(-1, self.d + 1)
        out0 = self.fx * vg[:, 0]
        outg = self.gfx * vg[:, :1] + self.fx[:, None] * vg[:, 1:]
        return jnp.concatenate([out0[:, None], outg], axis=1).reshape(-1)


# --------------------------------------------------------------------------
# input-transform chain rule: U^T Block U conjugation
# --------------------------------------------------------------------------


class JacobianConjugatedGradientGramian(LinearOperator):
    """Gradient gramian of k(u(x), u(y)): per-pair block J_u(x)^T B J_u(y)
    (reference src/gradient_algebra.jl:149-163: Warped/ScaledInput gramians
    factored as U^T G U with block-diagonal Jacobians). Realized as
    per-point Jacobian contraction around the inner fast-path MVM."""

    def __init__(self, inner_kernel, u, x, y=None, block=None):
        from ..utils.grids import as_points

        self.u = u
        xp = as_points(x)
        yp = xp if y is None else as_points(y)
        self._same = y is None
        ux = jax.vmap(u)(xp)
        ux = ux[:, None] if ux.ndim == 1 else ux
        uy = ux if y is None else jax.vmap(u)(yp)
        uy = uy[:, None] if uy.ndim == 1 else uy
        self.Jx = jax.vmap(jax.jacfwd(u))(xp)  # (n, d_out, d_in)
        if self.Jx.ndim == 2:
            self.Jx = self.Jx[:, None, :]
        self.Jy = self.Jx if y is None else jax.vmap(jax.jacfwd(u))(yp)
        if self.Jy.ndim == 2:
            self.Jy = self.Jy[:, None, :]
        self.inner = GradientGramian(inner_kernel, ux, uy, block=block)
        d_in = xp.shape[1]
        self.d = d_in
        self.shape = (xp.shape[0] * d_in, yp.shape[0] * d_in)
        self.dtype = self.inner.dtype

    @property
    def is_symmetric(self):
        return self._same

    @property
    def is_psd(self):
        # PSD holds for the derivative gramian of a genuine Mercer kernel
        # (cov of derivatives); don't claim it from symmetry alone
        return self._same and getattr(self.inner.k, "is_mercer", False)

    def _matvec(self, v):
        m = self.shape[1] // self.d
        A = v.reshape(m, self.d)
        A_up = jnp.einsum("moi,mi->mo", self.Jy, A)  # J_y a_j
        B_up = self.inner._apply(A_up)
        B = jnp.einsum("noi,no->ni", self.Jx, B_up)  # J_x^T b_i
        return B.reshape(-1)


class VerticalRescalingGradientGramian(LinearOperator):
    """Gradient gramian of k(x,y) = f(x) h(x,y) f(y) (reference
    src/gradient_algebra.jl:177-202: per-block Woodbury rank-2 correction
    of D_f H D_f). TPU-native whole-gramian form — the MVM collapses to
    ONE value+gradient block MVM of the inner kernel h:

        Block_ij = grad f_i (f_j grad_y h + h grad f_j)^T
                 + f_i (H_ij f_j + grad_x h grad f_j^T)
        out_i    = grad f(x_i) * vg0_i + f(x_i) * vg1_i,
        (vg0, vg1) = ValueGradient(h) @ [c_j, f(y_j) a_j],
        c_j = <grad f(y_j), a_j>

    so every trait fast path of h (iso/dot/pair/generic) is reused, and
    the rank-2 structure costs nothing extra — it rides the value/cross
    rows of the (1+d)-block MVM."""

    def __init__(self, h, f, x, y=None, block=None):
        from ..utils.grids import as_points

        self.f = f
        xp = as_points(x)
        yp = xp if y is None else as_points(y)
        self._same = y is None
        self.d = xp.shape[1]
        self.fx = jax.vmap(f)(xp)
        self.gfx = jax.vmap(jax.grad(f))(xp)
        self.fy = self.fx if y is None else jax.vmap(f)(yp)
        self.gfy = self.gfx if y is None else jax.vmap(jax.grad(f))(yp)
        self.inner = ValueGradientGramian(h, xp, yp, block=block)
        self.shape = (xp.shape[0] * self.d, yp.shape[0] * self.d)
        self.dtype = self.inner.dtype

    @property
    def is_symmetric(self):
        return self._same

    @property
    def is_psd(self):
        return self._same and getattr(self.inner.k, "is_mercer", False)

    def _matvec(self, v):
        m = self.shape[1] // self.d
        A = v.reshape(m, self.d)
        c = jnp.sum(self.gfy * A, axis=1)                  # <grad f(y_j), a_j>
        Vin = jnp.concatenate([c[:, None], self.fy[:, None] * A], axis=1)
        vg = (self.inner @ Vin.reshape(-1)).reshape(-1, self.d + 1)
        out = self.gfx * vg[:, :1] + self.fx[:, None] * vg[:, 1:]
        return out.reshape(-1)


@partial(jax.jit, static_argnames=("block",))
def chained_grad_matvec(k, x, y, A, block=32):
    """Gradient-block MVM of f(h(x,y)) for generic h (reference
    src/gradient_algebra.jl:207-227: diag(f') H + rank-1 f'' correction).
    Per pair: f'(h) (H_ij a_j) + f''(h) <grad_y h, a_j> grad_x h, with
    H_ij a_j via forward-over-reverse on h alone — O(n^2 d) total, and f
    is differentiated only as a scalar."""
    from ..utils.linalg import nth_derivatives

    f, h = k.f, k.k

    def pair(xi, yj, aj):
        gx_fn = lambda y_: jax.grad(lambda x_: h(x_, y_))(xi)
        gx = gx_fn(yj)
        hv, Ha = jax.jvp(lambda y_: h(xi, y_), (yj,), (aj,))
        _, blk_a = jax.jvp(gx_fn, (yj,), (aj,))   # H_ij a_j
        gy_dot_a = Ha
        _, f1, f2 = nth_derivatives(f, hv, 2)
        return f1 * blk_a + f2 * gy_dot_a * gx

    def body(xb):
        def one_row(xi):
            contribs = jax.vmap(lambda yj, aj: pair(xi, yj, aj))(y, A)
            return jnp.sum(contribs, axis=0)

        return jax.vmap(one_row)(xb)

    out = lax.map(body, _pad_rows(x, block))
    return out.reshape(-1, x.shape[1])[: x.shape[0]]


class ChainedGradientGramian(LinearOperator):
    """Gradient gramian of Chained(f, h) with generic-trait h
    (src/gradient_algebra.jl:207-227). Trait-carrying h never lands here —
    Chained preserves iso/dot/pair traits via profile composition."""

    def __init__(self, k, x, y=None, block=None):
        from ..utils.grids import as_points

        self.k = k
        self.x = as_points(x)
        self.y = self.x if y is None else as_points(y)
        self._same = y is None
        self.d = self.x.shape[1]
        self.shape = (self.x.shape[0] * self.d, self.y.shape[0] * self.d)
        self.dtype = jnp.result_type(self.x.dtype, float)
        self.block = block

    @property
    def is_symmetric(self):
        return self._same

    @property
    def is_psd(self):
        return self._same and getattr(self.k, "is_mercer", False)

    def _matvec(self, v):
        A = v.reshape(self.y.shape[0], self.d)
        kws = {} if self.block is None else dict(block=self.block)
        return chained_grad_matvec(self.k, self.x, self.y, A, **kws).reshape(-1)


class DerivativeKernel:
    """1-D derivative kernel cov(f'(x), f'(y)) (reference src/gradient.jl:549-560):
    the d=1 GradientKernel on scalar inputs."""

    def __init__(self, k):
        self.k = GradientKernel(k)

    def __call__(self, x, y):
        return self.k(jnp.atleast_1d(x), jnp.atleast_1d(y))[0, 0]

    def gramian(self, x, y=None, **opts):
        return self.k.gramian(x, y, **opts)


class ValueDerivativeKernel:
    """1-D value+derivative kernel (reference src/gradient.jl:561-579):
    the d=1 ValueGradientKernel on scalar inputs."""

    def __init__(self, k):
        self.k = ValueGradientKernel(k)

    def __call__(self, x, y):
        return self.k(jnp.atleast_1d(x), jnp.atleast_1d(y))

    def gramian(self, x, y=None, **opts):
        return self.k.gramian(x, y, **opts)


class SeparableGradientGramian(LinearOperator):
    """Gradient gramian of SeparableProduct/SeparableSum kernels
    (reference src/gradient_algebra.jl:93-145)."""

    def __init__(self, k, x, y=None, block=None):
        from ..kernels.algebra import SeparableProduct
        from ..utils.grids import as_points

        self.k = k
        self.x = as_points(x)
        self.y = self.x if y is None else as_points(y)
        self._same = y is None
        self.d = self.x.shape[1]
        if len(k.args) != self.d:
            raise ValueError(
                f"separable kernel has {len(k.args)} factors for d={self.d}"
            )
        self.shape = (self.x.shape[0] * self.d, self.y.shape[0] * self.d)
        self.dtype = jnp.result_type(self.x.dtype, float)
        self._prod = isinstance(k, SeparableProduct)
        self.block = block

    @property
    def is_symmetric(self):
        return self._same

    @property
    def is_psd(self):
        # PSD holds for the derivative gramian of a genuine Mercer kernel
        # (cov of derivatives); don't claim it from symmetry alone
        return self._same and getattr(self.k, "is_mercer", False)

    def _matvec(self, v):
        from .separable_grad import (
            grad_matvec_separable_prod,
            grad_matvec_separable_sum,
        )

        A = v.reshape(self.y.shape[0], self.d)
        kws = {} if self.block is None else dict(block=self.block)
        fn = grad_matvec_separable_prod if self._prod else grad_matvec_separable_sum
        return fn(self.k, self.x, self.y, A, **kws).reshape(-1)
