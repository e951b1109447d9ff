"""Benchmark harness: reference README headline config.

Runs the lazy Gramian MVM (MaternP(2), d=3, n=16384 — reference
README.md:30-43, BASELINE.md: 0.585 s on the reference's CPU) on the
TPU chip and prints ONE JSON line with the speedup vs that baseline.

Timing is TRUE wall clock: the axon tunnel's async dispatch lies to
`block_until_ready` until the first device->host transfer, so we force
synchronous dispatch and time data-chained iterations inside one jit
dispatch (cfjax.utils.timing).
"""

from __future__ import annotations

import json

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cfjax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cfjax.kernels import MaternP
    from cfjax.operators import Gramian
    from cfjax.utils.timing import force_sync_dispatch, time_chained

    n, d = 16384, 3
    ref_seconds = 0.585  # BASELINE.md lazy dense MVM

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    a = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    k = MaternP(2)

    force_sync_dispatch()
    G = Gramian(k, x)
    dt = time_chained(G._matvec, a)

    # consistency guard (don't report garbage): compare one row block
    b = G @ a
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
    from cfjax.operators.gramian import kernel_tile

    K = kernel_tile(G.k, G.x[:1], G.y[:m], G.mode)
    return (K @ a[:m])[0]


if __name__ == "__main__":
    main()
