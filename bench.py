"""Benchmark harness: reference README headline config.

Runs the lazy Gramian MVM (MaternP(2), d=3, n=16384 — reference
README.md:30-43, BASELINE.md: 0.585 s on the reference's CPU) on the
TPU chip and prints ONE JSON line with the speedup vs that baseline.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cfjax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cfjax.kernels import MaternP
    from cfjax.operators import Gramian

    n, d = 16384, 3
    ref_seconds = 0.585  # BASELINE.md lazy dense MVM

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    a = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    k = MaternP(2)

    G = Gramian(k, x)
    # warmup / compile
    b = G @ a
    b.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        b = G @ a
    b.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    # consistency guard (don't report garbage): compare one row block
    K_row = jax.vmap(lambda yj: k(x[0], yj))(x[:1024])
    err = float(jnp.abs(jnp.dot(K_row, a[:1024]) - _partial_row(G, a, 1024)))
    rel = err / (float(jnp.abs(b[0])) + 1e-30)

    out = {
        "metric": "maternp2_n16384_d3_lazy_mvm_seconds",
        "value": dt,
        "unit": "s",
        "vs_baseline": ref_seconds / dt,
        "row_check_rel_err": rel,
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


def _partial_row(G, a, m):
    import jax.numpy as jnp

    from cfjax.operators.gramian import kernel_tile

    K = kernel_tile(G.k, G.x[:1], G.y[:m], G.mode)
    return (K @ a[:m])[0]


if __name__ == "__main__":
    main()
