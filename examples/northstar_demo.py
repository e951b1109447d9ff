"""North-star demo (BASELINE.json config 5): large-n isotropic GP
regression with Barnes-Hut MVMs feeding CG, plus HMC over
lengthscale/variance hyperparameters.

Pipeline:
  1. synthesize n up to 1e6 2-D points + noisy targets from a GP-ish field
  2. Barnes-Hut factorization of the EQ Gramian (O(n log n) MVM)
  3. CG solve (K + sigma^2 I) alpha = y with the BH matvec
  4. HMC over (log lengthscale, log variance) on an exact-subset logML
  5. posterior mean on a probe set, compared against an exact-subset GP

Usage: python examples/northstar_demo.py [n]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main(n: int = 200_000):
    from cfjax.barneshut import BarnesHutFactorization
    from cfjax.gp import hmc_sample, log_marginal_likelihood
    from cfjax.kernels import EQ, Lengthscale
    from cfjax.operators import cg

    rng = np.random.default_rng(0)
    dtype = jnp.float32
    x = jnp.asarray(rng.uniform(-10, 10, (n, 2)), dtype=dtype)
    f_true = lambda p: jnp.sin(p[:, 0]) * jnp.cos(0.5 * p[:, 1])
    noise = 0.1
    y = f_true(x) + noise * jnp.asarray(rng.standard_normal(n), dtype=dtype)

    # --- hyperparameter inference (HMC) on an exact subset -----------------
    sub = jnp.asarray(rng.choice(n, 1024, replace=False))
    xs, ys = x[sub], y[sub]

    def logpost(theta):
        log_l, log_v = theta
        k = jnp.exp(log_v) * Lengthscale(EQ(), jnp.exp(log_l))
        lp = log_marginal_likelihood(k, xs, ys, noise=noise**2)
        prior = -0.5 * (log_l**2 + log_v**2)
        return lp + prior

    t0 = time.time()
    samples, acc = hmc_sample(
        logpost,
        jnp.asarray([0.0, 0.0]),
        jax.random.PRNGKey(1),
        num_samples=200,
        num_warmup=100,
        num_leapfrog=8,
    )
    l_hat = float(jnp.exp(jnp.mean(samples[:, 0])))
    v_hat = float(jnp.exp(jnp.mean(samples[:, 1])))
    print(
        f"HMC ({time.time()-t0:.1f}s): accept={float(acc):.2f}, "
        f"lengthscale={l_hat:.3f}, variance={v_hat:.3f}"
    )

    # --- large-n posterior mean via Barnes-Hut + CG ------------------------
    k = Lengthscale(EQ(), l_hat)
    t0 = time.time()
    F = BarnesHutFactorization(k, x, theta=0.5)
    print(f"BH build: {time.time()-t0:.1f}s (levels={F.tree.levels}, max_open={F.max_open})")

    def Kmv(v):
        return v_hat * (F @ v) + (noise**2) * v

    t0 = time.time()
    alpha, (iters, res) = cg(Kmv, y, tol=1e-4, maxiter=200)
    jax.block_until_ready(alpha)
    print(
        f"CG: {time.time()-t0:.1f}s, {int(iters)} iters, rel res "
        f"{float(res)/float(jnp.linalg.norm(y)):.2e}"
    )

    # posterior mean at training points (one more BH MVM)
    t0 = time.time()
    mean = v_hat * (F @ alpha)
    jax.block_until_ready(mean)
    print(f"posterior-mean MVM: {time.time()-t0:.2f}s")
    probe = jnp.asarray(rng.choice(n, 4096, replace=False))
    rmse = float(jnp.sqrt(jnp.mean((mean[probe] - f_true(x)[probe]) ** 2)))
    print(f"posterior mean RMSE vs true field (n={n}): {rmse:.4f} (noise={noise})")
    return rmse


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    main(n)
