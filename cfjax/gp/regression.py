"""GP regression on top of the lazy operator layer.

The reference is a covariance library; GP inference appears in its README
demos (CG solves against lazy gramians). Here it is first-class: posterior
conditioning via the structure-dispatched `gramian` + `solve` (Cholesky
small-n / CG large-n — the factorize policy of src/gramian.jl:201-213),
and a Cholesky log-marginal-likelihood for hyperparameter inference
(HMC/NUTS in cfjax.gp.hmc; gradients flow through CG/Cholesky by JAX AD).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..operators.dispatch import gramian
from ..operators.solvers import CholeskyFactorization, cg


@dataclasses.dataclass
class GPPosterior:
    kernel: object
    x_train: jnp.ndarray
    alpha: jnp.ndarray  # (K + noise I)^{-1} y
    noise: float

    def mean(self, x_test):
        Ks = gramian(self.kernel, x_test, self.x_train)
        return Ks @ self.alpha

    def variance(self, x_test, tol: float = 1e-6, maxiter: int = 200):
        """Posterior variance diag(K_ss) - diag(K_s K^-1 K_s^T) via one CG
        solve per test point (exact; use few test points or small n)."""
        from ..utils.grids import as_points

        xt = as_points(x_test)
        K = gramian(self.kernel, self.x_train).add_diagonal(self.noise)
        Ks = gramian(self.kernel, xt, self.x_train)
        KsT = Ks.T if hasattr(Ks, "T") else None

        def one(i_row):
            v, _ = cg(K._matvec, i_row, tol=tol, maxiter=maxiter)
            return jnp.dot(i_row, v)

        Ksd = Ks.todense()
        quad = jax.vmap(lambda r: one(r))(Ksd)
        prior = jax.vmap(lambda xi: self.kernel(xi, xi))(xt)
        return prior - quad


def gp_condition(kernel, x, y, noise: float = 1e-6, **solve_opts) -> GPPosterior:
    """Condition a GP prior on observations (y may be values, or stacked
    value/gradient blocks when kernel is a derivative kernel)."""
    from ..utils.grids import as_points

    K = gramian(kernel, x).add_diagonal(noise)
    alpha = K.solve(jnp.asarray(y), **solve_opts)
    return GPPosterior(kernel, x, alpha, noise)


def log_marginal_likelihood(kernel, x, y, noise: float = 1e-6):
    """Exact Cholesky log p(y | x, theta) — differentiable in the kernel
    pytree for hyperparameter optimization / HMC."""
    y = jnp.asarray(y)
    n = y.shape[0]
    K = gramian(kernel, x).add_diagonal(noise)
    A = K.todense()
    L = jnp.linalg.cholesky(A)
    z = jax.scipy.linalg.solve_triangular(L, y, lower=True)
    quad = jnp.sum(z * z)
    logdet = 2 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return -0.5 * (quad + logdet + n * jnp.log(2 * jnp.pi))
