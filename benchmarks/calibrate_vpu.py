"""VPU slot-cost calibration by differential fused-MVM timing.

Standalone elementwise microbenchmarks are HBM-bound on TPU (an exp over
2.7e8 elements times identically to a mul — both ~1.8x the HBM r+w
floor), so per-op costs must be measured *in fused context*: time a
blocked n² kernel-tile MVM whose profile contains the op, subtract the
identity-profile baseline, divide by n². The resulting slot costs (at
VPU_SLOTS = 6.1e12 lane-ops/s) feed cfjax.utils.roofline.SLOT and the
calibrated `Work.vpu_slots` accounting used by run_baseline.py.

Run on the real chip:  python benchmarks/calibrate_vpu.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cfjax.utils.roofline import VPU_SLOTS
from cfjax.utils.timing import MeasurementError, time_chained


def main():
    from cfjax.kernels.stationary import EQ, MaternP

    n, d = 16384, 3
    X = jax.random.normal(jax.random.PRNGKey(1), (n, d), jnp.float32)
    a0 = jax.random.normal(jax.random.PRNGKey(2), (n,), jnp.float32)

    def mvm_fn(profile, block=512):
        def f(a):
            def body(xb):
                S = xb @ X.T
                D = jnp.maximum(
                    jnp.sum(xb * xb, 1)[:, None]
                    + jnp.sum(X * X, 1)[None, :] - 2 * S, 0.0)
                return profile(D) @ a
            return jax.lax.map(body, X.reshape(n // block, block, d)).reshape(-1)
        return f

    mp = MaternP(2)
    cases = [
        ("identity (base)", lambda D: D),
        ("+1 mul", lambda D: D * 1.0001),
        ("+exp", lambda D: jnp.exp(-D)),
        ("+sqrt", lambda D: jnp.sqrt(D) * 1.0001),
        ("+rsqrt*D", lambda D: jax.lax.rsqrt(D + 1.0) * D),
        ("+exp(sqrt)", lambda D: jnp.exp(-jnp.sqrt(D))),
        ("EQ profile", EQ().profile),
        ("MaternP2 guarded", mp.profile),
        ("MaternP2 value (rsqrt)", mp.profile_value),
    ]
    import subprocess
    import time as _time

    base = None
    out = []

    def emit(line):
        print(line)
        out.append(line)

    try:
        sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__)))).stdout.strip()
    except Exception:
        sha = "unknown"
    emit(f"# VPU slot-cost calibration — measured on chip "
         f"{_time.strftime('%Y-%m-%d %H:%M UTC', _time.gmtime())}, "
         f"git {sha}")
    emit(f"n={n} d={d}; slots/elem at {VPU_SLOTS:.2e} lane-ops/s")
    for name, prof in cases:
        try:
            sec = time_chained(mvm_fn(prof), a0, iters=(2, 10), repeats=3)
        except MeasurementError as e:
            emit(f"{name:24s} UNMEASURABLE ({e})")
            continue
        slots = sec * VPU_SLOTS / (n * n)
        if base is None:
            base = slots
        emit(f"{name:24s} {sec*1e3:8.4f} ms  {slots:6.2f} slots/elem "
             f"(+{slots - base:5.2f} over base)")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "calibration.txt"), "w") as f:
        f.write("\n".join(out) + "\n")


if __name__ == "__main__":
    main()
