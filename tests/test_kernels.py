"""Kernel zoo unit tests.

Follows the reference's test strategy (SURVEY.md §4): evaluation
identities, mathematical property checks (PSD gramians, stationarity),
trait propagation with Constant transparency, and MaternP-vs-Matern and
derivative agreement near zero (reference test/stationary.jl:60-82,
test/algebra.jl:27-51, test/properties.jl:8-33)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special

import cfjax
from cfjax.kernels import (
    ARD,
    EQ,
    IMQ,
    NN,
    RQ,
    Brownian,
    Cauchy,
    Chained,
    Constant,
    Cosine,
    Delta,
    Dot,
    Exp,
    ExponentialDot,
    FiniteBasis,
    GammaExp,
    InputTrait,
    Lengthscale,
    Matern,
    MaternP,
    Periodic,
    Polynomial,
    Power,
    Product,
    SpectralMixture,
    Sum,
    VerticalRescaling,
    input_trait,
    normalize,
    nparameters,
    parameters,
    similar,
)
from cfjax.kernels.derivatives import elementwise_derivatives
from cfjax.utils.besselk import besselk


def all_test_kernels():
    return [
        EQ(),
        RQ(1.5),
        Exp(),
        GammaExp(1.5),
        Matern(2.3),
        MaternP(2),
        Cauchy(),
        IMQ(0.7),
        Lengthscale(EQ(), 0.5),
        Dot(),
        ExponentialDot(),
        NN(0.1),
        EQ() + RQ(0.5),
        2.0 * EQ(),
        EQ() * RQ(2.0),
        Power(EQ(), 3),
    ]


def test_eval_conventions(rng):
    x = jnp.asarray(rng.standard_normal(3))
    y = jnp.asarray(rng.standard_normal(3))
    r2 = float(jnp.sum((x - y) ** 2))
    assert np.isclose(float(EQ()(x, y)), np.exp(-r2 / 2))
    assert np.isclose(float(Exp()(x, y)), np.exp(-np.sqrt(r2)))
    assert np.isclose(float(Cauchy()(x, y)), 1 / (1 + r2))
    s = float(jnp.sum(x * y))
    assert np.isclose(float(Dot()(x, y)), s)
    assert np.isclose(float(ExponentialDot()(x, y)), np.exp(s))
    a = 1.7
    assert np.isclose(float(RQ(a)(x, y)), (1 + r2 / (2 * a)) ** -a)
    l = 0.6
    assert np.isclose(float(Lengthscale(EQ(), l)(x, y)), np.exp(-r2 / l**2 / 2))


def test_algebra_identities(rng):
    x = jnp.asarray(rng.standard_normal(4))
    y = jnp.asarray(rng.standard_normal(4))
    k1, k2 = EQ(), RQ(1.2)
    assert np.isclose(float((k1 + k2)(x, y)), float(k1(x, y)) + float(k2(x, y)))
    assert np.isclose(float((k1 * k2)(x, y)), float(k1(x, y)) * float(k2(x, y)))
    assert np.isclose(float((k1 ** 3)(x, y)), float(k1(x, y)) ** 3)
    assert np.isclose(float((3.0 * k1)(x, y)), 3 * float(k1(x, y)))
    assert np.isclose(float((k1 + 0.5)(x, y)), float(k1(x, y)) + 0.5)
    # polynomial kernel
    d = 3
    sig = 0.4
    assert np.isclose(
        float(Polynomial(d, sig)(x, y)), (float(jnp.sum(x * y)) + sig) ** d
    )


def test_trait_propagation():
    assert input_trait(EQ()) == InputTrait.ISOTROPIC
    assert input_trait(Dot()) == InputTrait.DOT
    assert input_trait(Cosine(jnp.ones(2))) == InputTrait.STATIONARY_LINEAR_FUNCTIONAL
    # Constant transparency (reference src/properties.jl:47-63)
    assert input_trait(EQ() + 1.0) == InputTrait.ISOTROPIC
    assert input_trait(2.0 * EQ() * RQ(1.0)) == InputTrait.ISOTROPIC
    assert input_trait(Constant(1.0) + Constant(2.0)) == InputTrait.ISOTROPIC
    # heterogeneous -> generic
    assert input_trait(EQ() + Dot()) == InputTrait.GENERIC
    assert input_trait(EQ() * Dot()) == InputTrait.GENERIC
    assert input_trait(Power(Dot(), 2)) == InputTrait.DOT
    assert input_trait(Chained(jnp.exp, EQ())) == InputTrait.ISOTROPIC


from cfjax.utils.testing import pairwise as _pw


def pairwise(k, x, y):
    return np.asarray(_pw(k, jnp.asarray(x), jnp.asarray(y)))


def test_psd_gramians(rng):
    x = rng.standard_normal((20, 3))
    for k in all_test_kernels():
        K = pairwise(k, x, x)
        assert np.allclose(K, K.T, atol=1e-10), type(k).__name__
        ev = np.linalg.eigvalsh(K)
        assert ev.min() > -1e-8, f"{type(k).__name__}: min eig {ev.min()}"


def test_maternp_vs_closed_forms(rng):
    # p=0 -> exp(-r); p=1 -> (1+sqrt(3)r)exp(-sqrt(3)r); p=2 known form
    r2 = jnp.asarray(rng.uniform(0.01, 9.0, 50))
    r = np.sqrt(np.asarray(r2))
    np.testing.assert_allclose(
        np.asarray(MaternP(0).profile(r2)), np.exp(-r), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(MaternP(1).profile(r2)),
        (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(MaternP(2).profile(r2)),
        (1 + np.sqrt(5) * r + 5 * r**2 / 3) * np.exp(-np.sqrt(5) * r),
        rtol=1e-12,
    )


def test_maternp_matches_matern(rng):
    """MaternP(p) == Matern(p + 1/2) (reference test/stationary.jl:60-82)."""
    r2 = jnp.asarray(rng.uniform(0.001, 4.0, 20))
    for p in [1, 2, 3]:
        a = np.asarray(MaternP(p).profile(r2))
        b = np.asarray(Matern(p + 0.5).profile(r2))
        np.testing.assert_allclose(a, b, rtol=1e-7)


def test_maternp_derivatives_at_zero():
    """Profile derivatives near 0 match finite differences of the closed
    form away from 0 (derivative-continuity, test/stationary.jl:70-82)."""
    for p in [2, 3, 4]:
        k = MaternP(p)
        fns_at = elementwise_derivatives(k.profile, jnp.asarray([0.0, 1e-12]), 2)
        # derivative at zero equals the exact rational table entry
        assert np.isclose(float(fns_at[1][0]), k._derivs[0], rtol=1e-12)
        assert np.isfinite(float(fns_at[2][0]))
        # continuity across the taylor boundary: taylor and closed-form
        # branches agree to truncation error at the switch point
        bound = np.finfo(np.float64).eps ** (1 / p)
        s_lo, s_hi = bound * (1 - 1e-9), bound * (1 + 1e-9)
        v = elementwise_derivatives(k.profile, jnp.asarray([s_lo, s_hi]), 1)
        np.testing.assert_allclose(float(v[0][0]), float(v[0][1]), rtol=1e-10)
        np.testing.assert_allclose(float(v[1][0]), float(v[1][1]), rtol=1e-4)


def test_besselk_vs_scipy(rng):
    x = rng.uniform(0.01, 30.0, 40)
    for nu in [0.3, 1.0, 1.5, 2.7, 5.5]:
        ours = np.asarray(besselk(nu, jnp.asarray(x)))
        ref = scipy.special.kv(nu, x)
        np.testing.assert_allclose(ours, ref, rtol=1e-8)


def test_delta_and_constant(rng):
    x = jnp.asarray(rng.standard_normal(3))
    y = jnp.asarray(rng.standard_normal(3))
    assert float(Delta()(x, x)) == 1.0
    assert float(Delta()(x, y)) == 0.0
    assert float(Constant(2.5)(x, y)) == 2.5


def test_brownian():
    assert float(Brownian()(1.0, 2.0)) == 1.0
    assert float(Brownian()(3.0, 2.0)) == 2.0


def test_finite_basis(rng):
    basis = (lambda x: jnp.ones(()), lambda x: jnp.sum(x), lambda x: jnp.sum(x**2))
    k = FiniteBasis(basis)
    x = jnp.asarray(rng.standard_normal(3))
    y = jnp.asarray(rng.standard_normal(3))
    expect = sum(float(b(x)) * float(b(y)) for b in basis)
    assert np.isclose(float(k(x, y)), expect)


def test_periodic():
    k = Periodic(EQ())
    # 1-periodic
    assert np.isclose(float(k(0.3, 1.3)), 1.0, atol=1e-10)
    assert np.isclose(float(k(0.1, 0.4)), float(k(1.1, 0.4)), atol=1e-10)


def test_spectral_mixture(rng):
    w = [0.5, 0.5]
    mu = [jnp.asarray([0.3, 0.1]), jnp.asarray([1.0, 2.0])]
    l = [jnp.asarray([1.0, 1.5]), jnp.asarray([0.7, 0.9])]
    k = SpectralMixture(w, mu, l)
    x = jnp.asarray(rng.standard_normal(2))
    # at x == y the SM kernel equals sum of weights
    assert np.isclose(float(k(x, x)), sum(w), atol=1e-10)


def test_vertical_rescaling_normalize(rng):
    k = normalize(RQ(1.0) + 0.5)
    x = jnp.asarray(rng.standard_normal(3))
    assert np.isclose(float(k(x, x)), 1.0, atol=1e-10)


def test_parameters_similar():
    k = Lengthscale(RQ(1.5), 0.5) + Constant(2.0)
    theta = parameters(k)
    assert nparameters(k) == theta.size == 3
    k2 = similar(k, theta * 2)
    theta2 = parameters(k2)
    np.testing.assert_allclose(np.asarray(theta2), 2 * np.asarray(theta))


def test_kernels_jit_and_grad(rng):
    """Every kernel evaluates under jit and has finite parameter grads."""
    x = jnp.asarray(rng.standard_normal(3))
    y = jnp.asarray(rng.standard_normal(3))
    for k in all_test_kernels():
        f = jax.jit(lambda k_, x_, y_: k_(x_, y_))
        v = f(k, x, y)
        assert np.isfinite(float(v)), type(k).__name__
        if nparameters(k) > 0:
            g = jax.grad(lambda kk: kk(x, y))(k)
            leaves = jax.tree_util.tree_leaves(g)
            assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_ard(rng):
    l = jnp.asarray([0.5, 1.0, 2.0])
    k = ARD(EQ(), l)
    x = jnp.asarray(rng.standard_normal(3))
    y = jnp.asarray(rng.standard_normal(3))
    r2 = float(jnp.sum(((x - y) / l) ** 2))
    assert np.isclose(float(k(x, y)), np.exp(-r2 / 2))
    # scalar -> Lengthscale
    assert isinstance(ARD(EQ(), 0.5), Lengthscale)


def test_normed_symmetric_chained(rng):
    """Normed custom-norm, SymmetricKernel symmetrization, Chained f∘k
    (reference src/transformation.jl:25-39, 126-137, 141-150)."""
    from cfjax.kernels import Normed, SymmetricKernel

    x = jnp.asarray(rng.standard_normal((5, 3)))
    y = jnp.asarray(rng.standard_normal((5, 3)))
    w = jnp.asarray([1.0, 2.0, 0.5])
    kn = Normed(EQ(), lambda t: jnp.sum(w * t * t))
    for i in range(5):
        tau = x[i] - y[i]
        expect = jnp.exp(-jnp.sum(w * tau * tau) / 2)
        np.testing.assert_allclose(float(kn(x[i], y[i])), float(expect), rtol=1e-12)

    ks = SymmetricKernel(EQ(), z=0.5)
    a, b = 1.3, -0.2
    expect = (EQ()(a - 0.5, b - 0.5) + EQ()(-(a - 0.5), b - 0.5)) / 2
    np.testing.assert_allclose(float(ks(a, b)), float(expect), rtol=1e-12)
    # symmetry about z: k(z+t, y) == k(z-t, y)
    np.testing.assert_allclose(float(ks(0.5 + 0.7, b)), float(ks(0.5 - 0.7, b)), rtol=1e-12)

    kc = Chained(lambda v: v**3, RQ(1.5))
    np.testing.assert_allclose(float(kc(a, b)), float(RQ(1.5)(a, b)) ** 3, rtol=1e-12)


def test_mercer_propagation():
    """is_mercer defaults False, True on zoo kernels, propagates all(...)
    through combinators (reference src/properties.jl:2-3,19-20)."""
    from cfjax.operators import LambdaKernel
    from cfjax.kernels.transforms import Warped, ScaledInputKernel

    lam = LambdaKernel(lambda x, y: jnp.sum(x * y))
    assert not lam.is_mercer
    for k in all_test_kernels():
        assert k.is_mercer, f"{type(k).__name__} should be Mercer"
    assert (EQ() + Dot()).is_mercer
    assert (EQ() * Dot()).is_mercer
    assert (EQ() ** 3).is_mercer
    assert not (EQ() + lam).is_mercer
    assert not (EQ() * lam).is_mercer
    assert not Power(lam, 2).is_mercer
    assert Lengthscale(EQ(), 0.5).is_mercer
    assert not Lengthscale(lam, 0.5).is_mercer
    assert Warped(EQ(), lambda z: jnp.sin(z)).is_mercer
    assert not Warped(lam, lambda z: z).is_mercer
    assert ScaledInputKernel(EQ(), jnp.eye(2)).is_mercer
    assert VerticalRescaling(EQ(), lambda x: 1.0 + jnp.sum(x * x)).is_mercer
    # f(k) is generally not PSD -> stays False (Chained <: AbstractKernel)
    assert not Chained(jnp.sin, EQ()).is_mercer
