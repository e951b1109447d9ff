"""Stationary / isotropic kernel zoo.

TPU-native rebuild of reference src/stationary.jl. Every kernel is a
pytree dataclass whose `profile(r2)` is a pure jnp scalar function,
differentiable to the order the math allows (the derivative-kernel layer
takes jax.grad of these profiles — replacing the reference's
ForwardDiff/TaylorSeries machinery).

MaternP's Taylor-at-zero derivative table (reference src/stationary.jl:172-191
computes it with SymEngine at construction) is computed here *exactly* with
`fractions.Fraction` power-series arithmetic at construction time — no
symbolic dependency, and the coefficients are embedded as static floats.
"""

from __future__ import annotations

import math
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from .base import (
    InputTrait,
    IsotropicKernel,
    Kernel,
    StationaryKernel,
    check,
    kernel_pytree,
)


@kernel_pytree
class Constant(IsotropicKernel):
    """Constant covariance c (reference src/stationary.jl:15-34).

    The gramian of a Constant is a lazy rank-1 fill — handled by the
    operator-layer dispatcher."""

    c: float = 1.0

    def __post_init__(self):
        check(lambda v: v >= 0, self.c, "Constant must be PSD (c >= 0)")

    def profile(self, s):
        return jnp.asarray(self.c) * jnp.ones_like(jnp.asarray(s, dtype=jnp.result_type(float)))

    def __call__(self, x, y):
        return jnp.asarray(self.c, dtype=jnp.result_type(float))


@kernel_pytree
class EQ(IsotropicKernel):
    """Exponentiated quadratic, exp(-r^2/2) (reference src/stationary.jl:37-42)."""

    def profile(self, s):
        return jnp.exp(-s / 2)


@kernel_pytree
class RQ(IsotropicKernel):
    """Rational quadratic (1 + r^2/(2 alpha))^-alpha (src/stationary.jl:45-53)."""

    alpha: float = 1.0

    def __post_init__(self):
        check(lambda v: v > 0, self.alpha, "RQ alpha must be positive")

    def profile(self, s):
        a = jnp.asarray(self.alpha)
        return (1.0 + s / (2 * a)) ** (-a)


@kernel_pytree
class Exp(IsotropicKernel):
    """Exponential kernel exp(-r) (src/stationary.jl:56-60).

    Not differentiable at r=0; profile uses a sqrt-guard so values are
    finite everywhere (first derivative at 0 is unbounded, as in math)."""

    def profile(self, s):
        return jnp.exp(-jnp.sqrt(s))

    def profile_value(self, s):
        # rsqrt is ~4 VPU slots cheaper than sqrt on v5e (measured in the
        # fused-MVM microbench, benchmarks/calibrate_vpu.py); the max
        # clamp keeps jax.grad finite at s = 0 (value shift ~1e-9 at 0).
        # Clamp must stay >= ~2e-26: rsqrt's VJP is -x^{-3/2}/2, which
        # overflows f32 (-> inf, then inf*0 = NaN) for smaller clamps.
        sc = jnp.maximum(s, 1e-18)
        return jnp.exp(-sc * jax.lax.rsqrt(sc))


@kernel_pytree(static=("gamma",))
class GammaExp(IsotropicKernel):
    """gamma-exponential exp(-r^gamma / 2), 0 <= gamma <= 2 (src/stationary.jl:63-71).

    gamma is static so the power is compile-time constant."""

    gamma: float = 1.0

    def __post_init__(self):
        check(lambda v: 0 <= v <= 2, self.gamma, "gamma must be in [0, 2]")

    def profile(self, s):
        return jnp.exp(-(s ** (self.gamma / 2)) / 2)


@kernel_pytree
class Delta(IsotropicKernel):
    """White-noise kernel: 1 iff x == y (src/stationary.jl:74-83)."""

    def profile(self, s):
        return jnp.where(s == 0, 1.0, 0.0).astype(jnp.result_type(float))

    def __call__(self, x, y):
        same = jnp.all(jnp.asarray(x) == jnp.asarray(y))
        return jnp.where(same, 1.0, 0.0).astype(jnp.result_type(float))


# --------------------------------------------------------------------------
# Matern family
# --------------------------------------------------------------------------


def _maternp_tables(p: int):
    """Exact rational tables for the half-integer Matern kernel (nu = p + 1/2).

    Closed form (r = sqrt((2p+1) r^2)):
        k = exp(-r) * p!/(2p)! * sum_{i=0}^p  (p+i)!/(i!(p-i)!) * (2r)^(p-i)

    Taylor derivatives of k w.r.t. r^2 at zero: expand exp(-r) * P(2r) as a
    power series in r with exact Fractions; even coefficients a_{2i} give
    d_i = i! * a_{2i} * (2p+1)^i  (odd coefficients vanish for orders <= p,
    which is why k is p-times differentiable in r^2 — same guarantee as the
    reference, src/stationary.jl:119-131, 172-191).
    """
    norm = Fraction(math.factorial(p), math.factorial(2 * p))
    # polynomial P(u) = sum_i c_{p-i} u^{p-i} with u = 2r
    poly = [Fraction(0)] * (p + 1)  # poly[j] = coeff of u^j
    for i in range(p + 1):
        j = p - i
        poly[j] = Fraction(
            math.factorial(p + i), math.factorial(i) * math.factorial(p - i)
        )
    # series of exp(-r) * P(2r) in powers of r, up to order 2p
    max_ord = 2 * p
    series = [Fraction(0)] * (max_ord + 1)
    for j in range(p + 1):  # P term: poly[j] * (2r)^j
        cj = poly[j] * (2 ** j)
        for m in range(0, max_ord + 1 - j):  # exp(-r) term: (-1)^m r^m / m!
            series[j + m] += cj * Fraction((-1) ** m, math.factorial(m))
    series = [norm * a for a in series]
    # d_i = i! * a_{2i} * (2p+1)^i, i = 1..p
    derivs = [
        float(math.factorial(i) * series[2 * i] * (2 * p + 1) ** i)
        for i in range(1, p + 1)
    ]
    poly_coeffs = [float(norm * c) for c in poly]  # coeff of (2r)^j, j=0..p
    return tuple(derivs), tuple(poly_coeffs)


@kernel_pytree(static=("p", "_derivs", "_poly"))
class MaternP(IsotropicKernel):
    """Matern kernel with half-integer smoothness nu = p + 1/2
    (reference src/stationary.jl:117-191). p is static; the rational
    Taylor/derivative tables are precomputed at construction."""

    p: int = 2
    _derivs: tuple = None
    _poly: tuple = None

    def __post_init__(self):
        if self.p < 0:
            raise ValueError(f"p must be >= 0, got {self.p}")
        if self._derivs is None:
            d, c = _maternp_tables(self.p)
            object.__setattr__(self, "_derivs", d)
            object.__setattr__(self, "_poly", c)

    def profile(self, s):
        s = jnp.asarray(s)
        p = self.p
        if p == 0:
            return jnp.exp(-jnp.sqrt((2 * p + 1) * s))
        eps = jnp.finfo(jnp.result_type(s, float)).eps
        bound = eps ** (1.0 / p)
        use_taylor = s < bound
        # Taylor branch: 1 + sum_i d_i s^i / i!   (polynomial, AD-safe at 0)
        taylor = jnp.ones_like(s, dtype=jnp.result_type(s, float))
        si = s
        for i in range(1, p + 1):
            taylor = taylor + self._derivs[i - 1] * si / math.factorial(i)
            si = si * s
        # closed-form branch with masked-safe sqrt input
        s_safe = jnp.where(use_taylor, jnp.ones_like(s), s)
        r = jnp.sqrt((2 * p + 1) * s_safe)
        u = 2 * r
        val = jnp.full_like(u, self._poly[p])
        for j in range(p - 1, -1, -1):  # Horner: sum_j poly[j] u^j
            val = val * u + self._poly[j]
        val = val * jnp.exp(-r)
        return jnp.where(use_taylor, taylor, val)

    def profile_value(self, s):
        """Guard-free value path: r via s*rsqrt(s) (no Taylor branch, no
        wheres — ~1.3x on the d=3 dense MVM, measured). Values match
        `profile` to f32 roundoff at every s >= 0; the derivative in s is
        clamped to 0 near 0 (see Kernel.profile_value contract; the 1e-18
        clamp keeps rsqrt's x^{-3/2} VJP inside f32 range)."""
        sc = jnp.maximum(jnp.asarray(s) * (2 * self.p + 1), 1e-18)
        r = sc * jax.lax.rsqrt(sc)
        u = 2 * r
        val = jnp.full_like(u, self._poly[self.p])
        for j in range(self.p - 1, -1, -1):
            val = val * u + self._poly[j]
        return val * jnp.exp(-r)


@kernel_pytree
class Matern(IsotropicKernel):
    """Matern kernel with real smoothness nu (src/stationary.jl:87-114).

    Uses an AD-able r^nu * K_nu(r) (cfjax.utils.besselk) away from zero and
    a second-order Taylor guard near zero, selected with nan-safe wheres."""

    nu: float = 1.5

    def __post_init__(self):
        check(lambda v: v > 0, self.nu, "nu must be positive")

    def profile(self, s):
        from ..utils.besselk import besselkxv

        s = jnp.asarray(s)
        nu = jnp.asarray(self.nu)
        dt = jnp.result_type(s, nu, float)
        eps = jnp.finfo(dt).eps
        bound = jnp.where(nu > 2, jnp.sqrt(eps), jnp.where(nu > 1, eps, 0.0))
        use_taylor = s < bound
        one = jnp.ones_like(s, dtype=dt)
        t1 = jnp.where(nu > 1, nu / (2 * (1 - nu)) * s, 0.0)
        t2 = jnp.where(nu > 2, nu**2 / (8 * (2 - 3 * nu + nu**2)) * s**2, 0.0)
        taylor = one + t1 + t2
        s_safe = jnp.where(use_taylor, jnp.ones_like(s), s)
        r = jnp.sqrt(2 * nu * s_safe)
        closed = (2 ** (1 - nu)) / jnp.exp(jax_gammaln(nu)) * besselkxv(nu, r)
        return jnp.where(use_taylor, taylor, closed)


def jax_gammaln(x):
    from jax.scipy.special import gammaln

    return gammaln(x)


@kernel_pytree
class Cosine(StationaryKernel):
    """cos(2 pi <c, x-y>) — the one stationary non-isotropic kernel
    (src/stationary.jl:197-211). Admits negative covariances."""

    c: jnp.ndarray = 1.0

    @property
    def trait(self) -> InputTrait:
        return InputTrait.STATIONARY_LINEAR_FUNCTIONAL

    def profile(self, t):
        return jnp.cos(2 * jnp.pi * t)

    def tau_call(self, tau):
        return self.profile(jnp.sum(jnp.asarray(self.c) * jnp.asarray(tau)))


@kernel_pytree
class Cauchy(IsotropicKernel):
    """1 / (1 + r^2) (src/stationary.jl:221-224)."""

    def profile(self, s):
        return 1.0 / (1.0 + s)


@kernel_pytree
class InverseMultiQuadratic(IsotropicKernel):
    """1 / sqrt(r^2 + c^2) (src/stationary.jl:231-235)."""

    c: float = 1.0

    def profile(self, s):
        c = jnp.asarray(self.c)
        return 1.0 / jnp.sqrt(s + c * c)


IMQ = InverseMultiQuadratic


def PseudoVoigt(alpha) -> Kernel:
    """alpha * EQ + (1 - alpha) * Cauchy (src/stationary.jl:227)."""
    return alpha * EQ() + (1.0 - alpha) * Cauchy()


def Spectral(w, mu, l) -> Kernel:
    """Single spectral component: w * Cosine(mu) * ARD(EQ, l)
    (src/stationary.jl:215-216)."""
    from .transforms import ARD

    return Constant(w) * Cosine(jnp.asarray(mu)) * ARD(EQ(), l)


def SpectralMixture(w, mu, l) -> Kernel:
    """Sum of spectral components (src/stationary.jl:217). w: (q,),
    mu/l: sequences of q center/lengthscale vectors."""
    from .algebra import Sum

    w = np.asarray(w)
    comps = [Spectral(w[i], mu[i], l[i]) for i in range(len(w))]
    return Sum(tuple(comps))


SM = SpectralMixture
