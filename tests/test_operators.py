"""Operator layer tests: dense-materialization oracles, structure
detection assertions, and solver round-trips (reference test/gramian.jl,
test/toeplitz.jl, test/algebra.jl patterns — SURVEY.md §4.2/4.4/4.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfjax.kernels import (
    EQ,
    RQ,
    Cosine,
    Constant,
    Delta,
    Dot,
    Exp,
    FiniteBasis,
    Lengthscale,
    MaternP,
    Periodic,
    SeparableProduct,
)
from cfjax.operators import (
    CirculantOperator,
    DiagonalOperator,
    FillOperator,
    Gramian,
    KroneckerOperator,
    LowRankOperator,
    SumOperator,
    ToeplitzOperator,
    WoodburyOperator,
    cg,
    durbin,
    factorize,
    gramian,
    levinson,
    minres,
    solve,
    trench,
)
from cfjax.utils.grids import LazyGrid, UniformGrid
from cfjax.utils.testing import pairwise


def rand_pts(rng, n, d):
    return jnp.asarray(rng.standard_normal((n, d)))


# -------------------- dense MVM oracle --------------------


@pytest.mark.parametrize(
    "k",
    [EQ(), RQ(1.3), Exp(), MaternP(2), Dot(), Cosine(jnp.asarray([0.5, 1.0, 0.2]))],
    ids=lambda k: type(k).__name__,
)
def test_gramian_matvec_matches_dense(k, rng):
    x = rand_pts(rng, 37, 3)
    y = rand_pts(rng, 29, 3)
    G = Gramian(k, x, y, block=16)
    K = np.asarray(pairwise(k, x, y))
    a = rng.standard_normal(29)
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(a)), K @ a, rtol=1e-9, atol=1e-10)
    # matmat
    A = rng.standard_normal((29, 4))
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(A)), K @ A, rtol=1e-9, atol=1e-10)
    # todense
    np.testing.assert_allclose(np.asarray(G.todense()), K, rtol=1e-9, atol=1e-12)


def test_gramian_generic_mode_matches(rng):
    # trait-erased closure takes the generic path (oracle pattern §4.1)
    k = EQ()
    wrapped = lambda x, y: k(x, y)
    x = rand_pts(rng, 23, 2)
    G = gramian(wrapped, x)
    assert G.mode == "generic"
    K = np.asarray(pairwise(k, x, x))
    a = rng.standard_normal(23)
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(a)), K @ a, rtol=1e-9)


# -------------------- structure detection --------------------


def test_dispatch_structures(rng):
    x = rand_pts(rng, 12, 2)
    assert isinstance(gramian(Constant(2.0), x), FillOperator)
    basis = (lambda z: jnp.sum(z), lambda z: jnp.sum(z**2))
    assert isinstance(gramian(FiniteBasis(basis), x), LowRankOperator)
    # small n <= rank stays dense
    assert isinstance(gramian(FiniteBasis(basis), x[:2]), Gramian)
    g = UniformGrid(0.0, 0.1, 32)
    assert isinstance(gramian(EQ(), g), ToeplitzOperator)
    # raw uniform array is auto-detected
    arr = np.linspace(0.0, 3.0, 64)
    assert isinstance(gramian(EQ(), arr), ToeplitzOperator)
    # non-uniform falls back
    assert isinstance(gramian(EQ(), np.cumsum(rng.uniform(0.1, 1, 32))), Gramian)
    # separable product on grid -> kronecker
    grid = LazyGrid((np.linspace(0, 1, 4), np.linspace(0, 1, 5)))
    K = gramian(SeparableProduct((EQ(), EQ())), grid)
    assert isinstance(K, KroneckerOperator)
    # periodic on unit-spanning grid -> circulant
    gp = UniformGrid(0.0, 1 / 16, 16)
    assert isinstance(gramian(Periodic(EQ()), gp), CirculantOperator)
    # delta split
    noisy = EQ() + 0.5 * Delta()
    op = gramian(noisy, x)
    assert isinstance(op, SumOperator)


def test_fill_and_lowrank_match_dense(rng):
    x = rand_pts(rng, 10, 2)
    a = jnp.asarray(rng.standard_normal(10))
    F = gramian(Constant(1.7), x)
    np.testing.assert_allclose(np.asarray(F @ a), 1.7 * float(jnp.sum(a)) * np.ones(10), rtol=1e-12)
    basis = (lambda z: jnp.sum(z), lambda z: jnp.cos(jnp.sum(z)))
    k = FiniteBasis(basis)
    G = gramian(k, x)
    K = np.asarray(pairwise(k, x, x))
    np.testing.assert_allclose(np.asarray(G @ a), K @ np.asarray(a), rtol=1e-9)


def test_delta_split_exact(rng):
    x = rand_pts(rng, 15, 3)
    sigma2 = 0.3
    k = MaternP(1) + sigma2 * Delta()
    op = gramian(k, x)
    K = np.asarray(pairwise(MaternP(1), x, x)) + sigma2 * np.eye(15)
    a = rng.standard_normal(15)
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(a)), K @ a, rtol=1e-9)


def test_pretransform_paths(rng):
    from cfjax.kernels import ARD, Energetic, ScaledInputKernel, Warped, VerticalRescaling, normalize

    x = rand_pts(rng, 14, 3)
    a = jnp.asarray(rng.standard_normal(14))
    # ARD
    l = jnp.asarray([0.5, 1.0, 2.0])
    k = ARD(EQ(), l)
    np.testing.assert_allclose(
        np.asarray(gramian(k, x) @ a), np.asarray(pairwise(k, x, x)) @ np.asarray(a), rtol=1e-9
    )
    # Energetic
    M = rng.standard_normal((3, 3))
    A = jnp.asarray(M @ M.T + 3 * np.eye(3))
    k = Energetic(EQ(), A)
    np.testing.assert_allclose(
        np.asarray(gramian(k, x) @ a), np.asarray(pairwise(k, x, x)) @ np.asarray(a), rtol=1e-9
    )
    # ScaledInput
    U = jnp.asarray(rng.standard_normal((3, 3)))
    k = ScaledInputKernel(EQ(), U)
    np.testing.assert_allclose(
        np.asarray(gramian(k, x) @ a), np.asarray(pairwise(k, x, x)) @ np.asarray(a), rtol=1e-9
    )
    # Warped
    k = Warped(EQ(), lambda z: jnp.tanh(z))
    np.testing.assert_allclose(
        np.asarray(gramian(k, x) @ a), np.asarray(pairwise(k, x, x)) @ np.asarray(a), rtol=1e-9
    )
    # VerticalRescaling / normalize
    k = normalize(RQ(1.0) + 0.2)
    np.testing.assert_allclose(
        np.asarray(gramian(k, x) @ a), np.asarray(pairwise(k, x, x)) @ np.asarray(a), rtol=1e-9
    )


def test_periodic_embedding_matches(rng):
    k = Periodic(EQ())
    x = jnp.asarray(rng.uniform(0, 3, 17))
    G = gramian(k, x)
    K = np.asarray(pairwise(k, x[:, None], x[:, None]))
    a = rng.standard_normal(17)
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(a)), K @ a, rtol=1e-9)


# -------------------- Toeplitz --------------------


def test_toeplitz_mvm_and_dense(rng):
    k = Exp()
    g = UniformGrid(0.0, 0.05, 40)
    T = gramian(k, g)
    assert isinstance(T, ToeplitzOperator)
    K = np.asarray(pairwise(k, g.points()[:, None], g.points()[:, None]))
    np.testing.assert_allclose(np.asarray(T.todense()), K, rtol=1e-9, atol=1e-12)
    a = rng.standard_normal(40)
    np.testing.assert_allclose(np.asarray(T @ jnp.asarray(a)), K @ a, rtol=1e-9)


def test_nonsymmetric_toeplitz(rng):
    k = Exp()
    gx = UniformGrid(0.0, 0.1, 24)
    gy = UniformGrid(0.5, 0.1, 24)
    T = gramian(k, gx, gy)
    assert isinstance(T, ToeplitzOperator)
    K = np.asarray(pairwise(k, gx.points()[:, None], gy.points()[:, None]))
    a = rng.standard_normal(24)
    np.testing.assert_allclose(np.asarray(T @ jnp.asarray(a)), K @ a, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(T.todense()), K, rtol=1e-8)


def _dd_toeplitz_col(rng, n):
    """diagonally dominant SPD toeplitz first column."""
    col = np.exp(-np.arange(n) * 0.8)
    return jnp.asarray(col)


def test_levinson_durbin_trench(rng):
    n = 30
    col = _dd_toeplitz_col(rng, n)
    i, j = np.arange(n)[:, None], np.arange(n)[None, :]
    T = np.asarray(col)[np.abs(i - j)]
    b = rng.standard_normal(n)
    # levinson vs dense solve (reference test/toeplitz.jl:8-43)
    x = levinson(col, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(T, b), rtol=1e-7)
    # durbin: solve T_{n-1} y = -r
    r = np.asarray(col)[1:] / float(col[0])
    y = durbin(jnp.asarray(r))
    Tn = np.asarray(col)[np.abs(i - j)][: n - 1, : n - 1] / float(col[0])
    np.testing.assert_allclose(np.asarray(y), np.linalg.solve(Tn, -r), rtol=1e-7, atol=1e-12)
    # trench inverse
    B = trench(col)
    np.testing.assert_allclose(np.asarray(B), np.linalg.inv(T), rtol=1e-6, atol=1e-9)


def test_toeplitz_cg_solve(rng):
    n = 64
    col = _dd_toeplitz_col(rng, n)
    T = ToeplitzOperator(col)
    b = jnp.asarray(rng.standard_normal(n))
    x = T.solve(b, method="cg", tol=1e-12)
    xd = np.linalg.solve(np.asarray(T.todense()), np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), xd, rtol=1e-6)


def test_circulant(rng):
    c = jnp.asarray(np.r_[2.0, 0.5, 0.1, 0.05, 0.1, 0.5])
    C = CirculantOperator(c)
    K = np.asarray(C.todense())
    a = rng.standard_normal(6)
    np.testing.assert_allclose(np.asarray(C @ jnp.asarray(a)), K @ a, rtol=1e-10)
    x = C.solve(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(K, a), rtol=1e-10)
    ld = float(C.logdet())
    np.testing.assert_allclose(ld, np.linalg.slogdet(K)[1], rtol=1e-10)


# -------------------- Kronecker --------------------


def test_kronecker_mvm_solve(rng):
    grid = LazyGrid(
        (np.linspace(0, 3, 5), np.linspace(0, 3, 4), np.linspace(0, 3, 3))
    )
    k = SeparableProduct((EQ(), EQ(), EQ()))
    K = gramian(k, grid)
    assert isinstance(K, KroneckerOperator)
    n = len(grid)
    assert K.shape == (n, n)
    Kd = np.asarray(K.todense())
    # oracle: direct pairwise eval on materialized grid points
    P = grid.points()
    Ko = np.asarray(pairwise(k, P, P))
    np.testing.assert_allclose(Kd, Ko, rtol=1e-9, atol=1e-12)
    a = rng.standard_normal(n)
    np.testing.assert_allclose(np.asarray(K @ jnp.asarray(a)), Kd @ a, rtol=1e-9)
    # per-factor cholesky solve
    x = K.solve(jnp.asarray(a))
    # residual-based check (K is moderately ill-conditioned)
    np.testing.assert_allclose(Kd @ np.asarray(x), a, rtol=1e-6, atol=1e-8)
    # logdet
    F = K.cholesky()
    np.testing.assert_allclose(float(F.logdet()), np.linalg.slogdet(Kd)[1], rtol=1e-6)


# -------------------- solvers --------------------


def test_cg_solves_spd(rng):
    n = 40
    M = rng.standard_normal((n, n))
    A = jnp.asarray(M @ M.T + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))
    x, (iters, res) = cg(lambda v: A @ v, b, tol=1e-12)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(np.asarray(A), np.asarray(b)), rtol=1e-8)


def test_minres_indefinite(rng):
    n = 30
    M = rng.standard_normal((n, n))
    A = jnp.asarray((M + M.T) / 2 + np.diag(np.linspace(-2, 5, n)))
    b = jnp.asarray(rng.standard_normal(n))
    x, (iters, res) = minres(lambda v: A @ v, b, tol=1e-12, maxiter=400)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(np.asarray(A), np.asarray(b)), rtol=1e-5, atol=1e-7)


def test_gramian_solve_roundtrip(rng):
    """K \\ (K a) == a (reference test/gradient.jl:55-63 pattern)."""
    x = rand_pts(rng, 50, 2)
    k = MaternP(2) + 0.1 * Delta()
    K = gramian(k, x)
    a = jnp.asarray(rng.standard_normal(50))
    b = K @ a
    a_rec = solve(K, b, tol=1e-12)
    np.testing.assert_allclose(np.asarray(a_rec), np.asarray(a), rtol=1e-5, atol=1e-7)


def test_factorize_policy(rng):
    from cfjax.operators.solvers import CholeskyFactorization

    x = rand_pts(rng, 20, 2)
    K = gramian(EQ(), x)
    F = factorize(K)
    assert isinstance(F, CholeskyFactorization)
    F2 = factorize(K, max_cholesky_size=8)
    assert F2 is K


def test_woodbury(rng):
    n, r = 20, 3
    d = jnp.asarray(rng.uniform(1, 2, n))
    U = jnp.asarray(rng.standard_normal((n, r)))
    C = jnp.asarray(np.eye(r))
    W = WoodburyOperator(DiagonalOperator(d), U, C)
    A = np.diag(np.asarray(d)) + np.asarray(U) @ np.asarray(U).T
    v = rng.standard_normal(n)
    np.testing.assert_allclose(np.asarray(W @ jnp.asarray(v)), A @ v, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(W.solve(jnp.asarray(v))), np.linalg.solve(A, v), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(W.diagonal()), np.diagonal(A), rtol=1e-10)


def test_lazy_diagonal_add(rng):
    x = rand_pts(rng, 16, 2)
    K = gramian(EQ(), x)
    op = K.add_diagonal(0.5)
    Kd = np.asarray(K.todense()) + 0.5 * np.eye(16)
    a = rng.standard_normal(16)
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(a)), Kd @ a, rtol=1e-9)


def test_indefinite_toeplitz_routes_to_minres(rng):
    # a Cosine-kernel symmetric Toeplitz is indefinite: is_psd must be
    # False (symmetry alone is not PSD) and solve(auto) must use MINRES
    # and still converge (VERDICT round-1 weak #4)
    n = 64
    col_np = np.zeros(n)
    col_np[1] = 1.0  # zero diagonal, unit off-diagonals: eigs 2cos(k pi/(n+1))
    col = jnp.asarray(col_np)
    T = ToeplitzOperator(col)
    assert T.is_symmetric
    assert not T.is_psd
    evs = np.linalg.eigvalsh(np.asarray(T.todense()))
    assert evs.min() < -1e-6  # genuinely indefinite
    x_true = jnp.asarray(rng.standard_normal(n))
    b = T @ x_true
    from cfjax.operators.solvers import solve

    x = solve(T, b, tol=1e-12, maxiter=2000, method="auto")
    np.testing.assert_allclose(np.asarray(T @ x), np.asarray(b), atol=1e-7)


def test_psd_toeplitz_symbol_check():
    # EQ-kernel Toeplitz on a uniform grid IS PSD; the circulant-embedding
    # symbol check must recognize it
    t = np.linspace(0, 3, 32)
    col = jnp.asarray(np.exp(-0.5 * t**2))
    T = ToeplitzOperator(col)
    assert T.is_psd


def test_rectangular_lowrank_cgnr_roundtrip(rng):
    # non-symmetric/rectangular solve falls back to normal equations
    # (reference solves any LazyFactorization, src/lazy_linear_algebra.jl:135-144)
    from cfjax.operators.linop import LowRankOperator
    from cfjax.operators.solvers import solve

    n, m, r = 24, 10, 10
    U = jnp.asarray(rng.standard_normal((n, r)))
    V = jnp.asarray(rng.standard_normal((r, m)))
    A = LowRankOperator(U, V)
    x_true = jnp.asarray(rng.standard_normal(m))
    b = A @ x_true
    x = solve(A, b, tol=1e-14, maxiter=500)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), atol=1e-8)


def test_lambda_kernel_not_claimed_psd_routes_minres(rng):
    """A generic-callable kernel must not be claimed PSD: solve(auto)
    routes it to MINRES, not Cholesky/CG (VERDICT r2 weak #3 — the
    reference defaults ismercer false, src/properties.jl:2)."""
    from cfjax.operators import LambdaKernel

    x = rand_pts(rng, 40, 2)
    # a symmetric, full-rank, indefinite "kernel": EQ minus half a Delta
    lam = LambdaKernel(
        lambda a, b: jnp.exp(-jnp.sum((a - b) ** 2) / 2)
        - 0.5 * jnp.all(a == b)
    )
    G = gramian(lam, x)
    assert G.is_symmetric and not G.is_psd
    A = np.asarray(G.todense())
    w = np.linalg.eigvalsh(A)
    assert w.min() < -1e-3 < 1e-3 < w.max()  # genuinely indefinite
    b = jnp.asarray(rng.standard_normal(40))
    got = solve(G, b, tol=1e-9)  # auto -> MINRES; Cholesky would NaN
    assert np.allclose(np.asarray(A @ np.asarray(got)), np.asarray(b), atol=1e-4)
    # and a Mercer kernel still claims PSD
    assert gramian(EQ(), x).is_psd


def test_float32_grid_dispatches_toeplitz(rng):
    """float32 uniform grids (diffs wobble in the 7th digit) must still
    hit the Toeplitz fast path (VERDICT r2 weak #6)."""
    n = 512
    pts = (0.3 + 0.01 * np.arange(n, dtype=np.float64)).astype(np.float32)
    op = gramian(EQ(), jnp.asarray(pts))
    assert isinstance(op, ToeplitzOperator)
    # oracle: matches the dense gramian on the same float32 points
    K = pairwise(EQ(), jnp.asarray(pts)[:, None])
    a = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    assert np.allclose(np.asarray(op @ a), np.asarray(K @ a), rtol=2e-4, atol=2e-4)


def test_explain_reports_pallas_state(rng):
    from cfjax.operators.dispatch import explain

    x = rand_pts(rng, 64, 3)
    s = explain(EQ(), x)
    assert "pallas" in s
    # array-valued hyperparameter -> unhashable -> declined with a reason
    s2 = explain(Lengthscale(EQ(), jnp.asarray(0.5)), x)
    assert "declined" in s2


def test_nonsymmetric_toeplitz_solve_roundtrip(rng):
    """Non-symmetric Toeplitz solve falls back to CGNR (VERDICT r3 #7;
    reference solves any lazy factorization,
    src/lazy_linear_algebra.jl:135-144)."""
    n = 128
    col = jnp.asarray(0.5 ** jnp.arange(n) + 1e-3 * rng.standard_normal(n))
    row = jnp.asarray(0.3 ** jnp.arange(n) + 1e-3 * rng.standard_normal(n))
    row = row.at[0].set(col[0])
    T = ToeplitzOperator(col, row)
    T = T.__class__(col + 2.0 * (jnp.arange(n) == 0), row + 2.0 * (jnp.arange(n) == 0))
    assert not T.is_symmetric
    a = jnp.asarray(rng.standard_normal(n))
    b = T @ a
    got = T.solve(b, tol=1e-12, maxiter=2000)
    assert np.allclose(np.asarray(T @ got), np.asarray(b), atol=1e-6)


def test_gmres_nonsymmetric(rng):
    """GMRES solves a genuinely non-symmetric system (CG/MINRES cannot)."""
    from cfjax.operators import gmres

    n = 200
    A = np.eye(n) * 4.0 + (2.0 / np.sqrt(n)) * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    x, (it, res) = gmres(lambda v: Aj @ v, jnp.asarray(b), tol=1e-10,
                         maxiter=400, restart=40)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=1e-6, atol=1e-8)


def test_nystrom_pcg_accelerates(rng):
    """Nystrom-preconditioned CG reaches tolerance in far fewer
    iterations than plain CG on a smooth-kernel system."""
    from cfjax.kernels import EQ, Lengthscale
    from cfjax.operators import cg, nystrom_preconditioner
    from cfjax.utils.testing import pairwise

    n = 2048
    x = jnp.asarray(rng.uniform(-5, 5, (n, 2)))
    k = Lengthscale(EQ(), 1.5)
    K = pairwise(k, x, x)
    s2 = 1e-2
    mv = lambda v: K @ v + s2 * v
    y = jnp.sin(x[:, 0])
    M = nystrom_preconditioner(k, x, s2, rank=256)
    x_p, (it_p, res_p) = cg(mv, y, tol=1e-8, maxiter=600, M=M)
    x_c, (it_c, res_c) = cg(mv, y, tol=1e-8, maxiter=600)
    expect = np.linalg.solve(np.asarray(K) + s2 * np.eye(n), np.asarray(y))
    np.testing.assert_allclose(np.asarray(x_p), expect, rtol=1e-4, atol=1e-6)
    assert int(it_p) < int(it_c) / 3, (int(it_p), int(it_c))


def test_nystrom_precond_spd_under_overshoot(rng):
    """When the sketch spectrum overshoots the f32-apply cap
    (s_max >> s_cap = noise/16eps), the Woodbury denominator is SCALED,
    not the spectrum min-capped: min-capping makes the apply indefinite
    ((1 - s/(s_cap+noise))/noise < 0 on overshooting modes) and PCG
    diverges (ADVICE r4 high). The scaled denominator keeps M SPD and
    PCG convergent."""
    from cfjax.kernels import EQ, Lengthscale
    from cfjax.operators import cg, nystrom_preconditioner
    from cfjax.utils.testing import pairwise

    n = 512
    # long lengthscale => lambda_max(K) ~ n; tiny noise => s_cap ~ 5e-3
    # => overshoot ratio s_max/s_cap ~ 1e5, far past the ADVICE repro
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)), dtype=jnp.float32)
    k = Lengthscale(EQ(), 3.0)
    s2 = 1e-5
    M = nystrom_preconditioner(k, x, s2, rank=128)
    # the apply matrix must be SPD: symmetrize and check min eigenvalue
    Mmat = jax.vmap(M, in_axes=1, out_axes=1)(jnp.eye(n, dtype=jnp.float32))
    w = np.linalg.eigvalsh(0.5 * np.asarray(Mmat + Mmat.T, dtype=np.float64))
    assert w.min() > 0.0, f"indefinite preconditioner: min eig {w.min():.3e}"
    K = pairwise(k, x, x).astype(jnp.float32)
    y = jnp.sin(x[:, 0])
    x_p, (it_p, res_p) = cg(lambda v: K @ v + s2 * v, y, tol=1e-4,
                            maxiter=400, M=M)
    rel = float(res_p) / float(jnp.linalg.norm(y))
    assert rel < 1e-3, (rel, int(it_p))


def test_refined_solve_beats_f32_cg(rng):
    """Mixed-precision iterative refinement (f32 Nystrom-PCG inner, f64
    residuals) reaches f64-quality residuals on a GP system whose
    condition number exceeds 1/eps_f32 (plain f32 PCG stalls — the
    n >= 1e5 GP regime measured on chip)."""
    from cfjax.kernels import EQ, Lengthscale
    from cfjax.operators import nystrom_preconditioner
    from cfjax.operators.solvers import cg, refined_solve
    from cfjax.utils.testing import pairwise

    n = 1024
    x = jnp.asarray(rng.uniform(-5, 5, (n, 2)))
    k = Lengthscale(EQ(), 1.5)
    s2 = 1e-3   # kappa ~ 1e6: f32 PCG noise-floors, IR contracts ~eps32*kappa/step
    K64 = pairwise(k, x, x) + s2 * jnp.eye(n)
    K32 = K64.astype(jnp.float32)
    b = K64 @ jnp.asarray(rng.standard_normal(n))
    M = nystrom_preconditioner(k, x.astype(jnp.float32), s2, rank=256)

    x32, (it32, res32) = cg(lambda v: K32 @ v, b.astype(jnp.float32),
                            tol=1e-10, maxiter=500, M=M)
    # the f32 recurrence's own residual estimate LIES at this kappa:
    # measure the true f64 residual of the f32 solution
    rel32 = float(jnp.linalg.norm(b - K64 @ x32.astype(jnp.float64))
                  ) / float(jnp.linalg.norm(b))
    xr, (outer, res) = refined_solve(
        lambda v: K64 @ v, lambda v: K32 @ v, b, M=M,
        tol=1e-9, inner_tol=1e-3, inner_maxiter=100, refinements=8)
    rel = float(res) / float(jnp.linalg.norm(b))
    assert rel < 1e-9, rel
    assert rel < rel32 / 100, (rel, rel32)


def test_approx_refined_solve_inexact_inner(rng):
    """approx_refined_solve: Krylov work against a perturbed (even
    non-symmetric, ~1%-error) operator, residuals against the exact one
    — converges to the exact system's tolerance with a handful of exact
    MVMs (the config-5 BH-inner composition, VERDICT r4 #3)."""
    from cfjax.kernels import EQ, Lengthscale
    from cfjax.operators import nystrom_preconditioner
    from cfjax.operators.solvers import approx_refined_solve
    from cfjax.utils.testing import pairwise

    n = 768
    x = jnp.asarray(rng.uniform(-5, 5, (n, 2)), dtype=jnp.float32)
    k = Lengthscale(EQ(), 1.0)
    s2 = 1e-2
    K = pairwise(k, x, x).astype(jnp.float32)
    A = K + s2 * jnp.eye(n, dtype=jnp.float32)
    # approximate operator: non-symmetric perturbation at 0.2 sigma^2
    # SPECTRAL norm. The refinement contraction factor is ~||A^-1 E||_2
    # <= ||E||_2 / sigma^2, so ||E||_2 must sit below sigma^2 — a
    # perturbation above it (e.g. 1% of ||A||_F here ~ 3 sigma^2)
    # genuinely diverges, which is the r4 measurement that a raw
    # theta=0.5 BH inner at GP noise levels cannot be refined against.
    E = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float32)
    spec = float(np.linalg.norm(np.asarray(E), 2))
    Aap = A + (0.2 * s2 / spec) * E
    b = A @ jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    M = nystrom_preconditioner(k, x, s2, rank=128)
    xr, (outer, res) = approx_refined_solve(
        lambda v: A @ v, lambda v: Aap @ v, b, M=M, tol=1e-4,
        inner_tol=3e-2, inner_maxiter=30, refinements=8)
    rel = float(res) / float(jnp.linalg.norm(b))
    assert rel < 1e-4, (rel, int(outer))
    assert int(outer) <= 6, int(outer)  # ~2-decades-per-step contraction
    # the residual is measured against the EXACT operator
    true_rel = float(jnp.linalg.norm(b - A @ xr) / jnp.linalg.norm(b))
    assert true_rel < 1.5e-4, true_rel


def test_factorize_rank_deficient_duplicated_points(rng):
    """Duplicated points make the Gramian numerically rank-deficient:
    factorize must detect it and return a rank-revealing low-rank
    factorization that solves and logdets at the true numerical rank
    (reference pivoted-Cholesky semantics, src/gramian.jl:193-199) —
    not silently jitter-regularize."""
    from cfjax.operators.solvers import LowRankFactorization

    x0 = rand_pts(rng, 25, 2)
    x = jnp.concatenate([x0, x0], axis=0)
    K = gramian(EQ(), x)
    F = factorize(K)
    assert isinstance(F, LowRankFactorization)
    assert F.rank < 25
    A = np.asarray(K.todense())
    w = np.linalg.eigvalsh(A)
    assert F.rank == int((w > 1e-6 * w.max()).sum())
    # pseudo-solve: for b in range(A), A (A^+ b) == b
    b = A @ rng.standard_normal(50)
    np.testing.assert_allclose(
        A @ np.asarray(F.solve(jnp.asarray(b))), b, rtol=1e-4, atol=1e-6)
    # pseudo-logdet over retained eigenvalues
    np.testing.assert_allclose(
        float(F.logdet()), float(np.sum(np.log(w[w > 1e-6 * w.max()]))),
        rtol=1e-6)


def test_factorize_rank_deficient_under_jit(rng):
    """Rank-revealing factorization must exist UNDER JIT (VERDICT r4
    missing #1): a traced rank-deficient Gramian routes through the
    lax.cond eigh branch at runtime and solves with the pseudo-inverse /
    pseudo-det — not silent jitter regularization. A traced full-rank
    Gramian takes the Cholesky branch and matches the eager solve."""
    from cfjax.operators.solvers import factorize

    x0 = rand_pts(rng, 25, 2)
    xdup = jnp.concatenate([x0, x0], axis=0)
    A = np.asarray(gramian(EQ(), xdup).todense())
    b = jnp.asarray(A @ rng.standard_normal(50))

    @jax.jit
    def jsolve(Amat, bb):
        F = factorize(Amat)
        return F.solve(bb), F.logdet()

    xs, ld = jsolve(jnp.asarray(A), b)
    # pseudo-solve: for b in range(A), A (A^+ b) == b
    np.testing.assert_allclose(A @ np.asarray(xs), np.asarray(b),
                               rtol=1e-4, atol=1e-6)
    w = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(
        float(ld), float(np.sum(np.log(w[w > 1e-6 * w.max()]))), rtol=1e-5)
    # full-rank traced path: Cholesky branch, matches eager
    xfull = rand_pts(rng, 40, 2)
    Kf = gramian(EQ(), xfull).todense() + 1e-4 * jnp.eye(40)
    bf = jnp.asarray(rng.standard_normal(40))
    xs2, ld2 = jsolve(Kf, bf)
    np.testing.assert_allclose(np.asarray(xs2),
                               np.linalg.solve(np.asarray(Kf), np.asarray(bf)),
                               rtol=1e-4, atol=1e-6)
    sign, ld_np = np.linalg.slogdet(np.asarray(Kf))
    np.testing.assert_allclose(float(ld2), ld_np, rtol=1e-5)


def test_factorize_finite_basis_low_rank(rng):
    """FiniteBasis with n >> rank: the low-rank gramian factorizes via the
    r x r Gram matrix (O(n r^2), never densified) into a rank-<=r object
    whose solve is the minimum-norm pseudo-inverse."""
    from cfjax.operators.solvers import LowRankFactorization

    basis = (lambda x: x[0], lambda x: x[1], lambda x: x[0] * x[1])
    k = FiniteBasis(basis)
    x = rand_pts(rng, 60, 2)
    K = gramian(k, x)
    assert isinstance(K, LowRankOperator)
    F = factorize(K)
    assert isinstance(F, LowRankFactorization)
    assert F.rank <= 3
    A = np.asarray(K.todense())
    b = A @ rng.standard_normal(60)
    np.testing.assert_allclose(
        A @ np.asarray(F.solve(jnp.asarray(b))), b, rtol=1e-6, atol=1e-8)


def test_jitted_solve_compiles_single_cholesky(rng):
    """A traced CholeskyFactorization must place exactly one Cholesky on
    the common path (the failure-retry factorization lives inside a
    lax.cond branch that only executes at runtime on NaN) — the previous
    `where` over two unconditional factorizations doubled every jitted
    logpost/solve (VERDICT r3)."""
    from cfjax.operators.solvers import CholeskyFactorization

    x = rand_pts(rng, 16, 2)
    K = gramian(EQ(), x).add_diagonal(0.1)

    def f(b):
        return CholeskyFactorization(K).solve(b)

    jaxpr = jax.make_jaxpr(f)(jnp.ones(16))
    # count unconditional cholesky eqns (nested inside jit call eqns); the
    # retry factorization sits inside the cond's branch jaxpr and only
    # executes at runtime
    top = sum(1 for e in jaxpr.jaxpr.eqns
              if e.primitive.name != "cond" and "cholesky" in str(e))
    assert top == 1, top
    conds = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "cond"]
    assert len(conds) == 1
    assert "cholesky" in str(conds[0])


def test_gp_condition_heteroscedastic_noise_vector(rng):
    """Per-observation noise vectors must route around the Nystrom
    preconditioner (its Woodbury capacitance needs scalar sigma^2) and
    still solve correctly through the plain CG path (ADVICE r3)."""
    from cfjax import config as _cfg
    from cfjax.gp import gp_condition
    from cfjax.utils.testing import pairwise

    n = 64
    x = jnp.asarray(rng.uniform(-3, 3, (n, 2)))
    k = EQ()
    noise = jnp.asarray(rng.uniform(0.05, 0.2, n))
    y = jnp.asarray(rng.standard_normal(n))
    old = _cfg.DEFAULT.max_cholesky_size
    _cfg.set_config(max_cholesky_size=16)  # force the "large-n" branch
    try:
        post = gp_condition(k, x, y, noise=noise, tol=1e-10, maxiter=2000)
    finally:
        _cfg.set_config(max_cholesky_size=old)
    A = np.asarray(pairwise(k, x, x)) + np.diag(np.asarray(noise))
    np.testing.assert_allclose(
        np.asarray(post.alpha), np.linalg.solve(A, np.asarray(y)),
        rtol=1e-4, atol=1e-6)


def test_solve_gmres_method_and_refined(rng):
    """solve(method="gmres") and solve(method="refined") are reachable
    public surface (VERDICT r3 housekeeping)."""
    x = rand_pts(rng, 40, 2)
    K = gramian(MaternP(1), x).add_diagonal(0.3)
    A = np.asarray(K.todense())
    b = jnp.asarray(rng.standard_normal(40))
    expect = np.linalg.solve(A, np.asarray(b))
    xg = solve(K, b, method="gmres", tol=1e-10)
    np.testing.assert_allclose(np.asarray(xg), expect, rtol=1e-5, atol=1e-7)
    xr = solve(K, b, method="refined")
    np.testing.assert_allclose(np.asarray(xr), expect, rtol=1e-6, atol=1e-8)


def test_gmres_preconditioned_true_residual(rng):
    """With a strong preconditioner the GMRES stopping test measures the
    TRUE residual ||b - A x||, not the preconditioned one (ADVICE r3)."""
    from cfjax.operators.solvers import gmres

    n = 48
    A = np.diag(rng.uniform(1.0, 2.0, n)) + 0.01 * rng.standard_normal((n, n))
    Aj = jnp.asarray(A)
    b = jnp.asarray(rng.standard_normal(n))
    # a deliberately misscaled preconditioner: M = 1e-3 * A^-1 (shrinks the
    # preconditioned residual 1000x below the true one)
    Ainv = jnp.asarray(np.linalg.inv(A))
    M = lambda v: 1e-3 * (Ainv @ v)
    x, (it, res) = gmres(lambda v: Aj @ v, b, tol=1e-8, maxiter=400, M=M)
    true_res = float(jnp.linalg.norm(b - Aj @ x))
    bnorm = float(jnp.linalg.norm(b))
    assert abs(float(res) - true_res) <= 1e-6 * bnorm
    assert true_res <= 1e-7 * bnorm


def test_grid_gramian_construction_is_lazy(rng, monkeypatch):
    """gramian() on uniform grids must not evaluate ANY kernel column at
    construction (reference constructs its Kronecker-of-grid gramians in
    23 us because nothing evaluates until use, src/algebra.jl:91-95);
    the column thunk fires on first MVM/solve use only."""
    import cfjax.operators.dispatch as dispatch
    from cfjax.kernels import EQ, Exp, separable
    from cfjax.operators.kronecker import KroneckerOperator
    from cfjax.operators.toeplitz import ToeplitzOperator
    from cfjax.utils.grids import LazyGrid, UniformGrid

    calls = []
    real = dispatch._grid_col
    monkeypatch.setattr(dispatch, "_grid_col",
                        lambda *a, **k: (calls.append(1), real(*a, **k))[1])
    g = UniformGrid(0.0, 1.0 / 256, 256)
    T = gramian(Exp(), g)
    assert isinstance(T, ToeplitzOperator)
    grid = LazyGrid(tuple(UniformGrid(0.0, 1.0 / 16, 16) for _ in range(3)))
    K = gramian(separable("^", EQ(), d=3), grid)
    assert isinstance(K, KroneckerOperator)
    assert calls == []   # construction evaluated nothing
    a = jnp.asarray(rng.standard_normal(256))
    _ = T @ a
    assert len(calls) == 1   # first use evaluates exactly one column


def test_cg_host_chunked_matches_monolithic(rng):
    """Host-chunked CG (large eager solves run the while_loop in
    host-driven segments — a single 60+ s device program trips remote
    runtimes' RPC deadlines, observed at n=1e6 on chip) must return the
    same solution and iteration count as the monolithic loop."""
    import cfjax.config as cfg
    from cfjax.operators.solvers import cg

    n = 512
    A = rng.standard_normal((n, n))
    A = jnp.asarray(A @ A.T + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))
    mv = lambda v: A @ v
    x_mono, (it_mono, res_mono) = cg(mv, b, tol=1e-10, maxiter=400)
    old = cfg.DEFAULT
    try:
        cfg.set_config(cg_chunk_min_n=1, cg_chunk_iters=7)
        x_chunk, (it_chunk, res_chunk) = cg(mv, b, tol=1e-10, maxiter=400)
    finally:
        cfg.set_config(**{f.name: getattr(old, f.name)
                          for f in __import__("dataclasses").fields(old)})
    assert int(it_chunk) == int(it_mono)
    np.testing.assert_allclose(np.asarray(x_chunk), np.asarray(x_mono),
                               rtol=1e-10, atol=1e-12)
