"""Derivative-kernel tests.

Reference patterns (SURVEY.md §4): generic-fallback-as-oracle (closure
erases traits -> dense AD path; assert the structured fast path matches,
test/gradient.jl:38-45), dense-materialization oracle (test/gradient.jl:47-52),
PSD checks (test/gradient.jl:32-34), and solver round-trips
(test/gradient.jl:55-63, test/hessian.jl:131-139)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfjax.kernels import EQ, NN, RQ, Cauchy, Cosine, Dot, Lengthscale, MaternP
from cfjax.derivative import (
    GradientKernel,
    HessianKernel,
    SeparableKernel,
    ValueGradientHessianKernel,
    ValueGradientKernel,
)
from cfjax.operators import gramian, solve
from cfjax.operators.linop import SumOperator


def rand_pts(rng, n, d):
    return jnp.asarray(rng.standard_normal((n, d)))


def dense_gradient_oracle(k, x, y):
    """Dense (n d, m d) gradient-kernel matrix via per-pair AD."""
    def blk(xi, yj):
        return jax.jacfwd(lambda y_: jax.grad(lambda x_: k(x_, y_))(xi))(yj)

    B = jax.vmap(lambda xi: jax.vmap(lambda yj: blk(xi, yj))(y))(x)  # (n,m,d,d)
    n, m, d, _ = B.shape
    return np.asarray(jnp.transpose(B, (0, 2, 1, 3)).reshape(n * d, m * d))


@pytest.mark.parametrize(
    "k",
    [
        EQ(),
        MaternP(2),
        RQ(1.3),
        Cauchy(),
        Lengthscale(EQ(), 0.7),
        EQ() * RQ(2.0) + 0.5,  # composite, still isotropic
        Dot() ** 2,
        Cosine(jnp.asarray([0.4, 1.1, 0.3])),
    ],
    ids=lambda k: type(k).__name__,
)
def test_gradient_fast_path_matches_oracle(k, rng):
    n, m, d = 9, 7, 3
    x, y = rand_pts(rng, n, d), rand_pts(rng, m, d)
    G = GradientKernel(k).gramian(x, y)
    Kd = dense_gradient_oracle(k, x, y)
    v = rng.standard_normal(m * d)
    np.testing.assert_allclose(
        np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-7, atol=1e-9
    )


def test_gradient_generic_matches_oracle(rng):
    k = EQ()
    wrapped = lambda x, y: k(x, y)  # erase trait
    n, d = 8, 3
    x = rand_pts(rng, n, d)
    from cfjax.operators.dispatch import LambdaKernel

    G = GradientKernel(LambdaKernel(wrapped)).gramian(x)
    assert G.mode == "generic"
    Kd = dense_gradient_oracle(k, x, x)
    v = rng.standard_normal(n * d)
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-7)


def test_gradient_heterogeneous_sum(rng):
    """Matern + Dot^2 sum -> operator sum of per-term fast plans
    (reference src/gradient_algebra.jl:31-36)."""
    k = MaternP(2) + Dot() ** 2
    n, d = 8, 3
    x = rand_pts(rng, n, d)
    G = GradientKernel(k).gramian(x)
    # the pair family now covers iso+dot sums in one pass; SLF-containing
    # sums still split into an operator sum
    from cfjax.kernels import Cosine
    G2 = GradientKernel(MaternP(2) + Cosine(jnp.ones(d))).gramian(x)
    assert isinstance(G2, SumOperator)
    Kd = dense_gradient_oracle(k, x, x)
    v = rng.standard_normal(n * d)
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-7)


def test_gradient_psd_and_solve(rng):
    n, d = 12, 3
    x = rand_pts(rng, n, d)
    G = GradientKernel(MaternP(2)).gramian(x)
    Kd = dense_gradient_oracle(MaternP(2), x, x)
    ev = np.linalg.eigvalsh((Kd + Kd.T) / 2)
    assert ev.min() > -1e-8
    # round trip with jitter
    op = G.add_diagonal(1e-4)
    a = jnp.asarray(rng.standard_normal(n * d))
    b = op @ a
    a_rec = solve(op, b, tol=1e-13, maxiter=2000)
    np.testing.assert_allclose(np.asarray(a_rec), np.asarray(a), rtol=1e-5, atol=1e-7)


def test_gradient_via_gramian_dispatch(rng):
    x = rand_pts(rng, 6, 2)
    G = gramian(GradientKernel(EQ()), x)
    assert G.shape == (12, 12)


def dense_valgrad_oracle(k, x, y):
    def blk(xi, yj):
        kv = k(xi, yj)
        gx = jax.grad(lambda x_: k(x_, yj))(xi)
        gy = jax.grad(lambda y_: k(xi, y_))(yj)
        B = jax.jacfwd(lambda y_: jax.grad(lambda x_: k(x_, y_))(xi))(yj)
        top = jnp.concatenate([kv[None], gy])[None, :]
        bot = jnp.concatenate([gx[:, None], B], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    B = jax.vmap(lambda xi: jax.vmap(lambda yj: blk(xi, yj))(y))(x)
    n, m, D, _ = B.shape
    return np.asarray(jnp.transpose(B, (0, 2, 1, 3)).reshape(n * D, m * D))


@pytest.mark.parametrize("k", [EQ(), MaternP(3), Dot() ** 2], ids=lambda k: type(k).__name__)
def test_valuegradient_matches_oracle(k, rng):
    n, m, d = 7, 6, 3
    x, y = rand_pts(rng, n, d), rand_pts(rng, m, d)
    G = ValueGradientKernel(k).gramian(x, y)
    Kd = dense_valgrad_oracle(k, x, y)
    v = rng.standard_normal(m * (d + 1))
    np.testing.assert_allclose(
        np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-7, atol=1e-9
    )


def dense_hessian_oracle(k, x, y):
    def blk(xi, yj):
        d = xi.shape[0]
        T = jax.jacfwd(jax.jacfwd(lambda y_: jax.hessian(lambda x_: k(x_, y_))(xi)))(yj)
        return T.reshape(d * d, d * d)

    B = jax.vmap(lambda xi: jax.vmap(lambda yj: blk(xi, yj))(y))(x)
    n, m, D, _ = B.shape
    return np.asarray(jnp.transpose(B, (0, 2, 1, 3)).reshape(n * D, m * D))


@pytest.mark.parametrize("k", [EQ(), RQ(2.0), Dot() ** 3], ids=lambda k: type(k).__name__)
def test_hessian_matches_oracle(k, rng):
    n, m, d = 4, 3, 2
    x, y = rand_pts(rng, n, d), rand_pts(rng, m, d)
    G = HessianKernel(k).gramian(x, y)
    Kd = dense_hessian_oracle(k, x, y)
    v = rng.standard_normal(m * d * d)
    np.testing.assert_allclose(
        np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-6, atol=1e-8
    )


def test_hessian_generic_matches(rng):
    from cfjax.operators.dispatch import LambdaKernel

    k = EQ()
    wrapped = LambdaKernel(lambda x, y: k(x, y))
    n, d = 3, 2
    x = rand_pts(rng, n, d)
    G = HessianKernel(wrapped).gramian(x)
    assert G.mode == "generic"
    Kd = dense_hessian_oracle(k, x, x)
    v = rng.standard_normal(n * d * d)
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-6)


def dense_vgh_oracle(k, x, y):
    def blk(xi, yj):
        d = xi.shape[0]
        kv = k(xi, yj)
        gx = jax.grad(lambda x_: k(x_, yj))(xi)
        gy = jax.grad(lambda y_: k(xi, y_))(yj)
        GG = jax.jacfwd(lambda y_: jax.grad(lambda x_: k(x_, y_))(xi))(yj)
        HV = jax.hessian(lambda x_: k(x_, yj))(xi).reshape(d * d)
        VH = jax.hessian(lambda y_: k(xi, y_))(yj).reshape(d * d)
        GH = jax.jacfwd(jax.jacfwd(lambda y_: jax.grad(lambda x_: k(x_, y_))(xi)))(yj).reshape(d, d * d)
        HG = jax.jacfwd(lambda y_: jax.hessian(lambda x_: k(x_, y_))(xi))(yj).reshape(d * d, d)
        HH = jax.jacfwd(jax.jacfwd(lambda y_: jax.hessian(lambda x_: k(x_, y_))(xi)))(yj).reshape(d * d, d * d)
        D = 1 + d + d * d
        M = jnp.zeros((D, D))
        M = M.at[0, 0].set(kv)
        M = M.at[0, 1 : 1 + d].set(gy)
        M = M.at[0, 1 + d :].set(VH)
        M = M.at[1 : 1 + d, 0].set(gx)
        M = M.at[1 : 1 + d, 1 : 1 + d].set(GG)
        M = M.at[1 : 1 + d, 1 + d :].set(GH)
        M = M.at[1 + d :, 0].set(HV)
        M = M.at[1 + d :, 1 : 1 + d].set(HG)
        M = M.at[1 + d :, 1 + d :].set(HH)
        return M

    B = jax.vmap(lambda xi: jax.vmap(lambda yj: blk(xi, yj))(y))(x)
    n, m, D, _ = B.shape
    return np.asarray(jnp.transpose(B, (0, 2, 1, 3)).reshape(n * D, m * D))


def test_valuegradienthessian_matches_oracle(rng):
    k = EQ()
    n, m, d = 3, 3, 2
    x, y = rand_pts(rng, n, d), rand_pts(rng, m, d)
    G = ValueGradientHessianKernel(k).gramian(x, y)
    Kd = dense_vgh_oracle(k, x, y)
    D = 1 + d + d * d
    v = rng.standard_normal(m * D)
    np.testing.assert_allclose(
        np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-6, atol=1e-8
    )


def test_separable_kernel(rng):
    B = np.array([[2.0, 0.5], [0.5, 1.0]])
    k = SeparableKernel(EQ(), jnp.asarray(B))
    n, d = 6, 3
    x = rand_pts(rng, n, d)
    G = gramian(k, x)
    from cfjax.utils.testing import pairwise

    K = np.kron(np.asarray(pairwise(EQ(), x, x)), B)
    v = rng.standard_normal(n * 2)
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(v)), K @ v, rtol=1e-9)


def test_gradient_pair_family_nn(rng):
    """NN-kernel gradient fast path (reference hand-derives a Woodbury
    block, src/gradient.jl:173-211; here the universal pair form covers it)."""
    k = NN(0.3)
    n, d = 8, 3
    x = rand_pts(rng, n, d)
    G = GradientKernel(k).gramian(x)
    assert G.mode == "pair"
    Kd = dense_gradient_oracle(k, x, x)
    v = rng.standard_normal(n * d)
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-7)


def test_gradient_heterogeneous_product(rng):
    """Mixed iso*dot product — reference needs Woodbury product rules
    (src/gradient_algebra.jl:47-89); the pair path handles it in one pass."""
    k = MaternP(2) * (Dot() ** 2 + 0.5)
    n, d = 8, 3
    x = rand_pts(rng, n, d)
    G = GradientKernel(k).gramian(x)
    assert G.mode == "pair"
    Kd = dense_gradient_oracle(k, x, x)
    v = rng.standard_normal(n * d)
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-7)


def test_gradient_readme_composite(rng):
    """The reference README composite demo kernel: Matern + quadratic + NN
    (README.md:298-303)."""
    from cfjax.kernels import Line

    k = MaternP(2) + Line(1.0) ** 2 + NN(0.1)
    n, d = 7, 4
    x = rand_pts(rng, n, d)
    G = GradientKernel(k).gramian(x)
    Kd = dense_gradient_oracle(k, x, x)
    v = rng.standard_normal(n * d)
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-7)


def test_valuegradient_pair(rng):
    k = NN(0.2) + MaternP(2)
    n, d = 6, 3
    x = rand_pts(rng, n, d)
    G = ValueGradientKernel(k).gramian(x)
    assert G.mode == "pair"
    Kd = dense_valgrad_oracle(k, x, x)
    v = rng.standard_normal(n * (d + 1))
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-7)


def test_gradient_separable_kernels(rng):
    """SeparableProduct/Sum gradient fast paths vs dense AD oracle
    (reference src/gradient_algebra.jl:93-145)."""
    from cfjax.kernels import SeparableProduct, SeparableSum, EQ, RQ, Cauchy
    from cfjax.derivative.gradient import SeparableGradientGramian

    n, d = 7, 3
    x = rand_pts(rng, n, d)
    for k in [
        SeparableProduct((EQ(), RQ(1.5), Cauchy())),
        SeparableSum((EQ(), RQ(1.5), Cauchy())),
    ]:
        G = GradientKernel(k).gramian(x)
        assert isinstance(G, SeparableGradientGramian)
        Kd = dense_gradient_oracle(k, x, x)
        v = rng.standard_normal(n * d)
        np.testing.assert_allclose(
            np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-7, atol=1e-9
        )


def test_gradient_vertical_rescaling_matches_oracle(rng):
    # f(x) h f(y): fast path = ONE value+gradient MVM of h
    # (reference rank-2 Woodbury, src/gradient_algebra.jl:177-202)
    from cfjax.kernels.transforms import VerticalRescaling
    from cfjax.derivative.gradient import VerticalRescalingGradientGramian

    n, m, d = 8, 6, 3
    x, y = rand_pts(rng, n, d), rand_pts(rng, m, d)
    f = lambda z: 1.0 + 0.3 * jnp.sum(jnp.tanh(z))
    k = VerticalRescaling(MaternP(2), f)
    G = GradientKernel(k).gramian(x, y)
    assert isinstance(G, VerticalRescalingGradientGramian)
    Kd = dense_gradient_oracle(k, x, y)
    v = rng.standard_normal(m * d)
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-7)
    # symmetric case + normalize() constructor
    from cfjax.kernels.transforms import normalize

    kn = normalize(RQ(1.5) + 0.2)
    Gs = GradientKernel(kn).gramian(x)
    Kds = dense_gradient_oracle(kn, x, x)
    vs = rng.standard_normal(n * d)
    np.testing.assert_allclose(np.asarray(Gs @ jnp.asarray(vs)), Kds @ vs, rtol=1e-7)


def test_gradient_chained_generic_matches_oracle(rng):
    # Chained f(h) with a trait-less h: diag(f') H + rank-1 f'' path
    # (src/gradient_algebra.jl:207-227)
    from cfjax.kernels.transforms import Chained, Warped
    from cfjax.derivative.gradient import ChainedGradientGramian, _grad_mode

    n, d = 8, 3
    x = rand_pts(rng, n, d)
    h = Warped(EQ(), lambda z: jnp.tanh(z) + 0.1 * z)  # generic trait
    k = Chained(f=lambda s: jnp.exp(s) - 0.5 * s, k=h)
    assert _grad_mode(k) == "generic"
    G = GradientKernel(k).gramian(x)
    assert isinstance(G, ChainedGradientGramian)
    Kd = dense_gradient_oracle(k, x, x)
    v = rng.standard_normal(n * d)
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-7)


def test_gradient_chained_iso_stays_fast(rng):
    # Chained of an isotropic kernel composes profiles -> iso fast path
    from cfjax.kernels.transforms import Chained
    from cfjax.derivative.gradient import GradientGramian

    n, d = 8, 3
    x = rand_pts(rng, n, d)
    k = Chained(f=lambda s: s**2 + s, k=EQ())
    G = GradientKernel(k).gramian(x)
    assert isinstance(G, GradientGramian) and G.mode == "iso"
    Kd = dense_gradient_oracle(k, x, x)
    v = rng.standard_normal(n * d)
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-7)


def test_valuegradient_combinator_routing(rng):
    """VG gramians of Warped/ScaledInput/VerticalRescaling/heterogeneous
    sums route through structured operators matching the nested-AD dense
    oracle (VERDICT r3 #5; reference src/gradient.jl:480-544,
    src/gradient_algebra.jl:149-202)."""
    from cfjax.kernels import Constant, ScaledInputKernel, VerticalRescaling, Warped
    from cfjax.derivative.gradient import (
        ConstantValueGradientGramian,
        JacobianConjugatedValueGradientGramian,
        VerticalRescalingValueGradientGramian,
    )
    from cfjax.operators import SumOperator

    n, d = 6, 3
    x = rand_pts(rng, n, d)

    cases = [
        (Warped(EQ(), lambda z: jnp.sin(z) + 0.1 * z),
         JacobianConjugatedValueGradientGramian),
        (ScaledInputKernel(EQ(), jnp.asarray(rng.standard_normal((d, d)))),
         JacobianConjugatedValueGradientGramian),
        (VerticalRescaling(EQ(), lambda z: 1.0 + jnp.sum(z * z)),
         VerticalRescalingValueGradientGramian),
        # heterogeneous sum with a generic-trait term -> operator split
        # (iso+dot sums stay on the pair-family fast path instead)
        (EQ() + Warped(Dot(), lambda z: jnp.tanh(z)), SumOperator),
        (Constant(0.7), ConstantValueGradientGramian),
    ]
    for k, cls in cases:
        G = ValueGradientKernel(k).gramian(x)
        assert isinstance(G, cls), (type(k).__name__, type(G).__name__)
        Kd = dense_valgrad_oracle(k, x, x)
        v = rng.standard_normal(n * (d + 1))
        np.testing.assert_allclose(
            np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-6, atol=1e-8,
            err_msg=type(k).__name__,
        )
    # iso+dot sum: the (1+d)-block pair family covers it in one pass
    k = EQ() + Dot()
    G = ValueGradientKernel(k).gramian(x)
    assert G.mode == "pair"
    Kd = dense_valgrad_oracle(k, x, x)
    v = rng.standard_normal(n * (d + 1))
    np.testing.assert_allclose(
        np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-6, atol=1e-8)
