"""True-wall-clock TPU timing helpers.

Measured pathologies of this environment (TPU behind the experimental
"axon" tunnel):

1. Dispatch is asynchronous AND `block_until_ready` returns before the
   device finishes — an 11-TFLOP `fori_loop` "times" at 0.3 ms. The
   first device->host transfer of any array flips the client into
   synchronous dispatch, after which wall-clock times are real.
2. In synchronous mode every dispatch carries a LARGE, TIME-VARYING
   round trip (measured 1.4 ms .. 30 ms within one session), identical
   for a no-op and for a 256-step unrolled program.

Any absolute per-dispatch wall clock is therefore meaningless. All cfjax
benchmarks use SLOPE timing: run the op chained N_lo and N_hi times
inside the same executable (dynamic fori_loop trip count) and report
(T(N_hi) - T(N_lo)) / (N_hi - N_lo), which cancels the per-dispatch
round trip exactly. Medians over repeats absorb tunnel jitter.
"""

from __future__ import annotations

import statistics
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


def dispatch_overhead(iters: int = 20) -> float:
    """Median seconds per no-op jitted dispatch (the tunnel round trip).
    Informational only — it drifts over a session."""
    force_sync_dispatch()
    f = jax.jit(lambda v: v + 1.0)
    v = jnp.zeros(8)
    jax.block_until_ready(f(v))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(f(v))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def time_chained(step, v0, iters=(4, 36), normalize: bool = True,
                 repeats: int = 5, consts=None) -> float:
    """True seconds per application of `step` (v -> same-shape v) via
    slope timing: one executable with a dynamic trip count, timed at two
    trip counts; the difference cancels the per-dispatch round trip.

    `normalize` rescales between iterations (one cheap reduction) so
    repeated operator application can't over/underflow.

    Arrays captured by `step`'s closure must become runtime parameters,
    not HLO constants (a multi-MB compile payload overflows the tunnel's
    remote-compile request limit): float captures are hoisted by
    jax.closure_convert; if `step` captures LARGE INTEGER arrays (which
    closure_convert leaves baked in), pass them via `consts` and accept
    them as step(v, *consts)."""
    force_sync_dispatch()

    if consts is None:
        step, consts = jax.closure_convert(step, v0)

    @jax.jit
    def run(n, v, consts):
        def body(_, v):
            w = step(v, *consts)
            if normalize:
                w = w / (jnp.linalg.norm(jnp.ravel(w)) + 1e-30)
            return w

        return lax.fori_loop(0, n, body, v)

    lo, hi = iters
    lo_j, hi_j = jnp.int32(lo), jnp.int32(hi)
    jax.block_until_ready(run(hi_j, v0, consts))  # compile + warm
    ts_lo, ts_hi = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(lo_j, v0, consts))
        ts_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(run(hi_j, v0, consts))
        ts_hi.append(time.perf_counter() - t0)
    return max(statistics.median(ts_hi) - statistics.median(ts_lo), 0.0) \
        / (hi - lo)


def time_dispatch(fn, *args, iters: int = 5, repeats: int = 2) -> float:
    """Median true seconds per call for ops that can't be chained
    (construction, factorization pipelines with host logic). The
    time-varying tunnel round trip is measured right before and
    subtracted; treat results as approximate above ~1 ms."""
    force_sync_dispatch()
    floor = dispatch_overhead(8)
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(max(iters, repeats)):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(statistics.median(ts) - floor, 0.0)
