"""True-wall-clock TPU timing helpers.

Measured pathology of this environment (TPU behind the experimental
"axon" tunnel): dispatch is asynchronous AND `block_until_ready` returns
before the device finishes — an 11-TFLOP `fori_loop` "times" at 0.3 ms.
The first device->host transfer of any array flips the client into
synchronous dispatch, after which wall-clock times are real but carry a
~1.4 ms per-dispatch round trip.

All cfjax benchmarks therefore
  1. call `force_sync_dispatch()` once up front, and
  2. time K data-chained iterations of the op inside ONE jit dispatch
     (`time_chained`), so the round trip amortizes to noise,
giving honest per-op seconds.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_synced = False


def force_sync_dispatch():
    """Flip the TPU client into synchronous dispatch (idempotent)."""
    global _synced
    if not _synced:
        np.asarray(jax.device_put(jnp.zeros(1)))
        _synced = True


def dispatch_overhead(iters: int = 30) -> float:
    """Seconds per no-op jitted dispatch (the tunnel round trip)."""
    force_sync_dispatch()
    f = jax.jit(lambda v: v + 1.0)
    v = jnp.zeros(8)
    v = f(v)
    jax.block_until_ready(v)
    t0 = time.perf_counter()
    for _ in range(iters):
        v = f(v)
    jax.block_until_ready(v)
    return (time.perf_counter() - t0) / iters


def time_chained(step, v0, iters: int = 16, normalize: bool = True,
                 repeats: int = 3) -> float:
    """Average true seconds per application of `step` (v -> same-shape v).

    Chains `iters` applications inside one jit dispatch via fori_loop so
    per-dispatch overhead amortizes. `normalize` rescales between
    iterations (one cheap reduction) so repeated operator application
    can't over/underflow."""
    force_sync_dispatch()

    @jax.jit
    def run(v):
        def body(_, v):
            w = step(v)
            if normalize:
                w = w / (jnp.linalg.norm(jnp.ravel(w)) + 1e-30)
            return w

        return lax.fori_loop(0, iters, body, v)

    r = run(v0)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = run(v0)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def time_dispatch(fn, *args, iters: int = 5, repeats: int = 2) -> float:
    """True seconds per call for ops that can't be chained (construction,
    factorization). Includes the ~1.4 ms tunnel round trip per dispatch —
    fine for multi-ms operations; use time_chained for sub-ms ones."""
    force_sync_dispatch()
    r = fn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
