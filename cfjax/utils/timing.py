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


class MeasurementError(RuntimeError):
    """Raised when slope timing cannot separate the op's cost from the
    tunnel's per-dispatch jitter within the time budget. Carries an
    upper bound on the per-iteration cost in `.upper_bound` (seconds)."""

    def __init__(self, msg, upper_bound=None):
        super().__init__(msg)
        self.upper_bound = upper_bound


def _spread(ts):
    """Robust spread estimate of a sample list: interquartile-ish range
    (for <=5 samples: max-min excluding the single worst outlier)."""
    s = sorted(ts)
    if len(s) >= 7:
        q = len(s) // 4
        return s[-1 - q] - s[q]
    if len(s) >= 3:
        return s[-2] - s[0]
    return s[-1] - s[0]


def time_chained(step, v0, iters=(4, 36), normalize: bool = True,
                 repeats: int = 5, consts=None, delta_ratio: float = 8.0,
                 time_budget: float = 20.0) -> float:
    """True seconds per application of `step` (v -> same-shape v) via
    slope timing: one executable with a dynamic trip count, timed at two
    trip counts; the difference cancels the per-dispatch round trip.

    ADAPTIVE + SELF-CHECKING (round-2 fix, ADVICE.md): the trip-count
    delta is doubled until the measured time difference exceeds
    `delta_ratio`x the robust spread (jitter) of the samples, so a
    result is only returned when the op's cost dominates tunnel noise.
    A slope that never escapes the noise raises MeasurementError (with
    an upper bound) instead of silently clamping to 0 — the round-1
    harness published 0.001 ms for an 8.6-GFLOP MVM that way.

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

    def fetch(out):
        # TRUE sync: a device->host transfer of one element cannot
        # return before the computation finishes. block_until_ready is
        # NOT enough here — on the axon tunnel a freshly compiled
        # executable can slip back into async dispatch, in which case
        # slope timing sees ~0 s at ANY trip count, doubles hi
        # unboundedly, and queues hours of garbage on the worker
        # (observed r5: hi reached 1.2e9 trips and wedged the chip).
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jnp.ravel(leaf)[:1])

    def sample(n, reps):
        nj = jnp.int32(n)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(run(nj, v0, consts))
            ts.append(time.perf_counter() - t0)
        return ts

    lo, hi = iters
    fetch(run(jnp.int32(hi), v0, consts))  # compile + warm
    t_start = time.perf_counter()
    while True:
        ts_lo, ts_hi = [], []
        for _ in range(repeats):  # interleave lo/hi to ride jitter drift
            ts_lo += sample(lo, 1)
            ts_hi += sample(hi, 1)
        delta = statistics.median(ts_hi) - statistics.median(ts_lo)
        jitter = max(_spread(ts_lo), _spread(ts_hi), 100e-6)
        if delta > delta_ratio * jitter:
            return delta / (hi - lo)
        elapsed = time.perf_counter() - t_start
        budget_left = time_budget - elapsed
        # next round costs ~repeats * T(2*hi) ≈ 2 * repeats * median(ts_hi)
        # hi cap: a slope still flat at 4096 chained trips is below
        # jitter/4096 per application — bail with the upper bound
        # instead of queueing ever-larger programs on the worker
        if hi > 4096 or 2 * repeats * statistics.median(ts_hi) > budget_left:
            ub = max(delta, delta_ratio * jitter) / (hi - lo)
            raise MeasurementError(
                f"slope {max(delta, 0.0) / (hi - lo):.3e}s/iter not separable "
                f"from jitter {jitter * 1e3:.2f}ms at hi={hi} "
                f"(upper bound {ub:.3e}s)", upper_bound=ub)
        hi *= 2


def time_dispatch(fn, *args, iters: int = 5, repeats: int = 2):
    """Median true seconds per call for ops that can't be chained
    (construction, factorization pipelines with host logic).

    The tunnel round trip drifts within a session (1.4..30 ms), so a
    no-op floor dispatch is INTERLEAVED with every timed sample and
    subtracted pairwise (ADVICE.md round-1 fix). Returns
    (seconds, noise_floor_spread): any result below the spread is
    dominated by drift, not the op — callers must annotate/reject it."""
    force_sync_dispatch()
    noop = jax.jit(lambda v: v + 1.0)
    vz = jnp.zeros(8)
    jax.block_until_ready(noop(vz))
    jax.block_until_ready(fn(*args))
    ts, floors = [], []
    for _ in range(max(iters, repeats)):
        t0 = time.perf_counter()
        jax.block_until_ready(noop(vz))
        f0 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        t = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(noop(vz))
        f1 = time.perf_counter() - t0
        ts.append(t - 0.5 * (f0 + f1))
        floors += [f0, f1]
    return max(statistics.median(ts), 0.0), _spread(floors)
