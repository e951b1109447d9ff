"""Sharding + GP layer tests.

Beyond the reference's coverage (it has no distributed tests — nothing
distributed exists there, SURVEY.md §4): tolerance comparison of sharded
vs single-device MVM on the fake 8-device mesh, sharded CG solves, GP
conditioning round-trips, hyperparameter optimization through logML
(reference test/optimization.jl analogue), and HMC smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfjax.gp import gp_condition, hmc_sample, log_marginal_likelihood
from cfjax.kernels import EQ, Lengthscale, MaternP, parameters, similar
from cfjax.operators import Gramian, gramian
from cfjax.parallel import ShardedGramian, default_mesh, sharded_gramian_matvec
from cfjax.utils.testing import pairwise


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_mvm_matches_single(rng):
    x = jnp.asarray(rng.standard_normal((100, 3)))
    a = jnp.asarray(rng.standard_normal(100))
    k = MaternP(2)
    mesh = default_mesh()
    G = ShardedGramian(k, x, mesh=mesh, block=16)
    b_sharded = np.asarray(G @ a)
    b_single = np.asarray(Gramian(k, x, block=16) @ a)
    np.testing.assert_allclose(b_sharded, b_single, rtol=1e-12)


def test_sharded_solve(rng):
    x = jnp.asarray(rng.standard_normal((96, 2)))
    k = EQ()
    mesh = default_mesh()
    G = ShardedGramian(k, x, mesh=mesh, block=16)
    a = jnp.asarray(rng.standard_normal(96))
    K = np.asarray(pairwise(k, x, x)) + 1e-4 * np.eye(96)
    op = G.add_diagonal(1e-4)
    from cfjax.parallel import sharded_cg

    xs, _ = sharded_cg(op._matvec, a, tol=1e-12, maxiter=500)
    np.testing.assert_allclose(np.asarray(xs), np.linalg.solve(K, np.asarray(a)), rtol=1e-6)


def test_sharded_matvec_uneven_rows(rng):
    # n not divisible by device count
    x = jnp.asarray(rng.standard_normal((101, 3)))
    a = jnp.asarray(rng.standard_normal(101))
    k = EQ()
    mesh = default_mesh()
    b = sharded_gramian_matvec(k, x, x, a, "iso", mesh, block=16)
    b_ref = np.asarray(pairwise(k, x, x)) @ np.asarray(a)
    np.testing.assert_allclose(np.asarray(b), b_ref, rtol=1e-10)


def test_gp_condition_roundtrip(rng):
    x = jnp.asarray(rng.uniform(-2, 2, (80, 1)))
    y = jnp.sin(2 * x[:, 0])
    post = gp_condition(MaternP(2), x, y, noise=1e-8)
    mean_at_train = post.mean(x)
    np.testing.assert_allclose(np.asarray(mean_at_train), np.asarray(y), atol=1e-3)
    # variance at training points ~ 0
    var = post.variance(x[:5], tol=1e-10, maxiter=500)
    assert np.all(np.asarray(var) < 1e-4)


def test_hyperparameter_optimization(rng):
    """Gradient ascent on logML recovers a reasonable lengthscale
    (reference test/optimization.jl:12-18 uses Flux on the same objective)."""
    true_l = 0.5
    noise = 1e-2
    x = jnp.asarray(rng.uniform(-2, 2, (60, 1)))
    K = np.asarray(pairwise(Lengthscale(EQ(), true_l), x, x)) + noise * np.eye(60)
    L = np.linalg.cholesky(K)
    y = jnp.asarray(L @ rng.standard_normal(60))

    def loss(log_l):
        k = Lengthscale(EQ(), jnp.exp(log_l))
        return -log_marginal_likelihood(k, x, y, noise=noise)

    g = jax.grad(loss)
    log_l = jnp.log(2.0)  # start far away
    for _ in range(80):
        gv = g(log_l)
        log_l = log_l - 0.05 * gv / (jnp.abs(gv) + 1.0)  # normalized step
    assert abs(float(jnp.exp(log_l)) - true_l) < 0.25, float(jnp.exp(log_l))


def test_parameters_similar_roundtrip_optimization():
    k = Lengthscale(EQ(), 0.7) + 0.3
    theta = parameters(k)
    k2 = similar(k, theta)
    assert np.allclose(np.asarray(parameters(k2)), np.asarray(theta))


def test_hmc_smoke(rng):
    """HMC on a 2-D Gaussian target: means/variances roughly correct."""
    cov = jnp.asarray([[1.0, 0.5], [0.5, 2.0]])
    prec = jnp.linalg.inv(cov)

    def logp(th):
        return -0.5 * th @ (prec @ th)

    samples, acc = hmc_sample(
        logp,
        jnp.zeros(2),
        jax.random.PRNGKey(0),
        num_samples=3000,
        num_warmup=500,
        num_leapfrog=16,
    )
    assert float(acc) > 0.5
    emp = np.cov(np.asarray(samples).T)
    assert np.all(np.abs(np.asarray(samples).mean(0)) < 0.3)
    np.testing.assert_allclose(np.diag(emp), np.diag(np.asarray(cov)), rtol=0.4)


def test_derivative_1d_kernels(rng):
    from cfjax.derivative import DerivativeKernel, ValueDerivativeKernel

    k = DerivativeKernel(EQ())
    x = jnp.asarray(rng.standard_normal((10, 1)))
    G = k.gramian(x)
    assert G.shape == (10, 10)
    # oracle: d2/dx dy exp(-(x-y)^2/2)
    def blk(xi, yj):
        return jax.jacfwd(lambda y_: jax.grad(lambda x_: EQ()(x_, y_))(xi))(yj)[0, 0]

    Kd = np.asarray(jax.vmap(lambda xi: jax.vmap(lambda yj: blk(xi, yj))(x))(x))
    v = rng.standard_normal(10)
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-8)
    vk = ValueDerivativeKernel(EQ())
    assert vk.gramian(x).shape == (20, 20)


def test_warped_gradient_conjugation(rng):
    """GradientKernel of Warped/ScaledInput: J^T B J chain rule."""
    from cfjax.derivative import GradientKernel
    from cfjax.kernels import ScaledInputKernel, Warped

    n, d = 7, 3
    x = jnp.asarray(rng.standard_normal((n, d)))
    U = jnp.asarray(rng.standard_normal((d, d)))
    k = ScaledInputKernel(EQ(), U)
    G = GradientKernel(k).gramian(x)

    def blk(xi, yj):
        return jax.jacfwd(lambda y_: jax.grad(lambda x_: k(x_, y_))(xi))(yj)

    B = jax.vmap(lambda xi: jax.vmap(lambda yj: blk(xi, yj))(x))(x)
    Kd = np.asarray(jnp.transpose(B, (0, 2, 1, 3)).reshape(n * d, n * d))
    v = rng.standard_normal(n * d)
    np.testing.assert_allclose(np.asarray(G @ jnp.asarray(v)), Kd @ v, rtol=1e-7)
    # nonlinear warp
    kw = Warped(EQ(), lambda z: jnp.tanh(z))
    Gw = GradientKernel(kw).gramian(x)
    Bw = jax.vmap(
        lambda xi: jax.vmap(
            lambda yj: jax.jacfwd(lambda y_: jax.grad(lambda x_: kw(x_, y_))(xi))(yj)
        )(x)
    )(x)
    Kw = np.asarray(jnp.transpose(Bw, (0, 2, 1, 3)).reshape(n * d, n * d))
    np.testing.assert_allclose(np.asarray(Gw @ jnp.asarray(v)), Kw @ v, rtol=1e-7)


def test_fit_kernel_optax(rng):
    """optax-based logML fit recovers lengthscale (Flux-equivalent of
    reference test/optimization.jl)."""
    from cfjax.gp import fit_kernel

    true_l = 0.6
    noise = 1e-2
    x = jnp.asarray(rng.uniform(-2, 2, (64, 1)))
    K = np.asarray(pairwise(Lengthscale(EQ(), true_l), x, x)) + noise * np.eye(64)
    y = jnp.asarray(np.linalg.cholesky(K) @ rng.standard_normal(64))
    k0 = Lengthscale(EQ(), 1.5)
    k_fit, hist = fit_kernel(k0, x, y, noise=noise, steps=120, lr=0.05)
    assert hist[-1] < hist[0]  # loss decreased
    assert abs(float(k_fit.l) - true_l) < 0.3, float(k_fit.l)


def test_logml_kronecker_structure_aware(rng):
    # Kronecker 16^3 gramian: exact per-factor eigendecomposition logML
    # matches the dense Cholesky oracle, without materializing K
    from cfjax.kernels import separable
    from cfjax.utils.grids import LazyGrid, UniformGrid

    axes = [UniformGrid(0.0, 0.37, 16)] * 3
    grid = LazyGrid(axes)
    k = separable("*", EQ(), EQ(), EQ())
    y = jnp.asarray(rng.standard_normal(16**3))
    lm = log_marginal_likelihood(k, grid, y, noise=1e-2)
    # dense oracle on the small 4096-point case
    from cfjax.operators import gramian

    K = gramian(k, grid)
    A = np.asarray(K.todense()) + 1e-2 * np.eye(16**3)
    L = np.linalg.cholesky(A)
    z = np.linalg.solve(L, np.asarray(y))
    ref = -0.5 * (z @ z + 2 * np.log(np.diag(L)).sum()
                  + 16**3 * np.log(2 * np.pi))
    np.testing.assert_allclose(float(lm), ref, rtol=1e-8)


def test_logml_circulant_structure_aware(rng):
    from cfjax.kernels.transforms import Periodic
    from cfjax.utils.grids import UniformGrid
    from cfjax.operators import gramian
    from cfjax.operators.toeplitz import CirculantOperator

    n = 256
    grid = UniformGrid(0.0, 1.0 / n, n)
    k = Periodic(EQ())
    K = gramian(k, grid)
    assert isinstance(K, CirculantOperator)
    y = jnp.asarray(rng.standard_normal(n))
    lm = log_marginal_likelihood(k, grid, y, noise=1e-3)
    A = np.asarray(K.todense()) + 1e-3 * np.eye(n)
    L = np.linalg.cholesky(A)
    z = np.linalg.solve(L, np.asarray(y))
    ref = -0.5 * (z @ z + 2 * np.log(np.diag(L)).sum() + n * np.log(2 * np.pi))
    np.testing.assert_allclose(float(lm), ref, rtol=1e-8)


def test_logml_slq_lazy_regime(rng):
    # SLQ + CG logML on a lazy gramian: close to the Cholesky value, and
    # jax.grad works through the custom VJPs
    n = 300
    x = jnp.asarray(rng.standard_normal((n, 2)))
    y = jnp.sin(x[:, 0]) + 0.1 * jnp.asarray(rng.standard_normal(n))
    k = Lengthscale(EQ(), 0.9)
    exact = log_marginal_likelihood(k, x, y, noise=1e-2, method="cholesky")
    est = log_marginal_likelihood(
        k, x, y, noise=1e-2, method="slq", probes=32, lanczos_iters=40,
        key=jax.random.PRNGKey(3),
    )
    assert abs(float(est) - float(exact)) / abs(float(exact)) < 0.02

    def nll(log_l):
        kk = Lengthscale(EQ(), jnp.exp(log_l))
        return -log_marginal_likelihood(
            kk, x, y, noise=1e-2, method="slq", probes=16, lanczos_iters=30,
            key=jax.random.PRNGKey(0),
        )

    g = jax.grad(nll)(jnp.asarray(0.0))
    def nll_exact(log_l):
        kk = Lengthscale(EQ(), jnp.exp(log_l))
        return -log_marginal_likelihood(kk, x, y, noise=1e-2, method="cholesky")

    g_exact = jax.grad(nll_exact)(jnp.asarray(0.0))
    assert np.isfinite(float(g))
    # Hutchinson gradient: stochastic, but should agree in sign and rough scale
    assert abs(float(g) - float(g_exact)) < 0.15 * max(1.0, abs(float(g_exact)))


def test_nuts_gaussian(rng):
    """NUTS on a correlated 2-D Gaussian: mean/cov within MC tolerance and
    healthy acceptance statistic (BASELINE config 5 requires NUTS, not
    plain HMC)."""
    from cfjax.gp import nuts_sample

    cov = jnp.asarray([[1.0, 0.8], [0.8, 2.0]])
    prec = jnp.linalg.inv(cov)

    def logp(th):
        return -0.5 * th @ (prec @ th)

    samples, astat = nuts_sample(
        logp,
        jnp.zeros(2),
        jax.random.PRNGKey(3),
        num_samples=4000,
        num_warmup=600,
        max_tree_depth=8,
    )
    assert 0.5 < float(astat) <= 1.0
    s = np.asarray(samples)
    assert np.all(np.abs(s.mean(0)) < 0.25)
    emp = np.cov(s.T)
    np.testing.assert_allclose(emp, np.asarray(cov), rtol=0.35, atol=0.15)


def test_nuts_through_logml(rng):
    """NUTS gradient flows through the lazy logML stack (Cholesky path)."""
    from cfjax.gp import nuts_sample

    n = 48
    x = jnp.asarray(rng.standard_normal((n, 2)))
    k_true = Lengthscale(EQ(), 0.7)
    K = np.asarray(pairwise(k_true, x, x)) + 0.01 * np.eye(n)
    y = jnp.asarray(np.linalg.cholesky(K) @ rng.standard_normal(n))

    def logpost(theta):
        k = Lengthscale(EQ(), jnp.exp(theta[0]))
        return log_marginal_likelihood(k, x, y, noise=0.01) - 0.5 * theta[0] ** 2

    samples, astat = nuts_sample(
        logpost, jnp.zeros(1), jax.random.PRNGKey(0),
        num_samples=40, num_warmup=40, max_tree_depth=5)
    assert np.isfinite(np.asarray(samples)).all()
    assert float(astat) > 0.3
    # posterior should concentrate within a factor ~2 of the true scale
    l_hat = float(jnp.exp(jnp.median(samples[:, 0])))
    assert 0.2 < l_hat < 2.5


def test_slq_probe_chunking_matches_full(rng):
    """Chunked Lanczos sweeps (the n=10^6 memory fix: probes run
    sequentially so the reorthogonalization basis stays bounded) must
    give the same estimate as one full-batch sweep for the same probes."""
    from cfjax.operators import slq as slq_mod

    n = 256
    x = jnp.asarray(rng.standard_normal((n, 2)))
    K = pairwise(Lengthscale(EQ(), 0.8), x, x) + 0.1 * jnp.eye(n)
    mv = lambda params, V: K @ V
    key = jax.random.PRNGKey(7)
    full, _ = slq_mod._slq_fwd(mv, n, 8, 24, 1e-6, 200, None, key)
    orig = slq_mod._probe_chunk
    try:
        slq_mod._probe_chunk = lambda n_, p_, it_: 2   # force 4 chunks
        chunked, _ = slq_mod._slq_fwd(mv, n, 8, 24, 1e-6, 200, None, key)
    finally:
        slq_mod._probe_chunk = orig
    np.testing.assert_allclose(float(chunked), float(full), rtol=1e-8)
    ref = float(jnp.linalg.slogdet(K)[1])
    assert abs(float(full) - ref) / abs(ref) < 0.05


def test_gp_condition_preconditioned_large_n(rng):
    """Above max_cholesky_size gp_condition auto-builds the Nystrom
    preconditioner; the posterior must match the dense solve."""
    from cfjax import config as cfg

    n = 600
    x = jnp.asarray(rng.uniform(-4, 4, (n, 2)))
    k = Lengthscale(EQ(), 1.0)
    y = jnp.sin(x[:, 0]) + 0.05 * jnp.asarray(rng.standard_normal(n))
    old = cfg.DEFAULT.max_cholesky_size
    try:
        cfg.set_config(max_cholesky_size=256)   # force the lazy-PCG branch
        post = gp_condition(k, x, y, noise=1e-2, tol=1e-10, maxiter=400)
    finally:
        cfg.set_config(max_cholesky_size=old)
    from cfjax.utils.testing import pairwise

    K = np.asarray(pairwise(k, x, x)) + 1e-2 * np.eye(n)
    alpha = np.linalg.solve(K, np.asarray(y))
    np.testing.assert_allclose(np.asarray(post.alpha), alpha,
                               rtol=1e-4, atol=1e-6)


def test_sharded_pcg_matches_single_device(rng):
    """Config-5 solve shape on the fake 8-device mesh: Nystrom-PCG with
    the 2-D-mesh sharded exact MVM must match the single-device solve."""
    from jax.sharding import Mesh

    from cfjax.operators import cg, nystrom_preconditioner
    from cfjax.parallel.mesh import sharded_gramian_matvec_2d

    n = 512
    x = jnp.asarray(rng.uniform(-4, 4, (n, 2)))
    k = Lengthscale(EQ(), 1.0)
    y = jnp.sin(x[:, 0])
    s2 = 1e-2
    M = nystrom_preconditioner(k, x, s2, rank=64)
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("rows", "cols"))
    mv_sh = lambda v: sharded_gramian_matvec_2d(k, x, x, v, "iso", mesh,
                                                block=64) + s2 * v
    G = gramian(k, x)
    mv_1 = lambda v: G._matvec(v) + s2 * v
    a_sh, (it_sh, _) = cg(mv_sh, y, tol=1e-10, maxiter=200, M=M)
    a_1, (it_1, _) = cg(mv_1, y, tol=1e-10, maxiter=200, M=M)
    np.testing.assert_allclose(np.asarray(a_sh), np.asarray(a_1),
                               rtol=1e-7, atol=1e-9)
    # reduction-order ulps can shift the stopping point by an iteration
    assert abs(int(it_sh) - int(it_1)) <= 3 and int(it_sh) < 150


def test_nuts_host_matches_jitted_moments(rng):
    """Host-loop NUTS (one device program PER leapfrog — for likelihoods
    whose single evaluation is minutes of device time, e.g. full-n SLQ
    logML in the config-5 demo) targets the same distribution as the
    jitted sampler: moments agree on a correlated Gaussian."""
    from cfjax.gp.hmc import nuts_sample_host

    cov = jnp.asarray([[1.0, 0.7], [0.7, 2.0]])
    prec = jnp.linalg.inv(cov)
    logp = lambda th: -0.5 * th @ (prec @ th)
    s, astat = nuts_sample_host(
        logp, jnp.zeros(2), jax.random.PRNGKey(0),
        num_samples=1500, num_warmup=400, max_tree_depth=6)
    assert 0.5 < float(astat) <= 1.0
    s = np.asarray(s)
    assert np.all(np.abs(s.mean(0)) < 0.25)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(cov),
                               rtol=0.35, atol=0.15)
