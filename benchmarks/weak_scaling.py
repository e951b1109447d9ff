"""Weak-scaling evidence on the fake 8-device CPU mesh (VERDICT r3 #6).

The >= 80% 1 -> N-host MVM scaling target (BASELINE.md) cannot be
measured in this environment (one real chip); what CAN be pinned down
here is (a) the correctness half — the sharded MVM/CG path executes and
matches the single-device answer bit-for-bit within tolerance while
holding rows-per-device fixed — and (b) the analytic communication
volume per CG iteration, from which the expected ICI scaling follows
(README "Scaling" section derives it).

Measured wall-clock ratios below share ONE host's cores across all 8
fake devices, so they are a lower bound sanity check (the sharded
program must not be pathologically slower than 8x the work), not a
hardware scaling claim.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python benchmarks/weak_scaling.py
(the script forces both itself when run directly).

Writes benchmarks/weak_scaling.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

if __name__ == "__main__":
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=5):
    jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def comm_model(n: int, R: int, C: int, dtype_bytes: int = 4):
    """Analytic per-CG-iteration communication for the 2-D mesh MVM
    (`sharded_gramian_matvec_2d`): the psum over the column axis moves
    2 (C-1)/C * (n/R) * dtype_bytes bytes per device (bidirectional ring
    all-reduce), plus 2 scalar psums for the CG dot products (latency
    only). Compute per device is n^2/(R C) kernel entries, so the
    comm:compute byte:flop ratio falls as 1/n — the basis of the
    weak-scaling claim in README."""
    psum_bytes = 2 * (C - 1) / C * (n / R) * dtype_bytes
    tile_entries = n * n / (R * C)
    return {
        "per_device_psum_bytes_per_iter": psum_bytes,
        "per_device_tile_entries": tile_entries,
        "bytes_per_entry": psum_bytes / tile_entries,
    }


def main():
    from cfjax.kernels import EQ
    from cfjax.operators import gramian
    from cfjax.parallel.mesh import (
        ShardedGramian,
        default_mesh,
        sharded_cg,
        sharded_gramian_matvec_2d,
    )
    from jax.sharding import Mesh

    assert len(jax.devices()) >= 8, "need the 8-device fake mesh"
    rng = np.random.default_rng(0)
    rows = []

    r, d = 2048, 3  # rows per device, held FIXED across device counts
    # NOTE on normalization: with 1-D ROW sharding each device owns
    # (n/N rows) x (full n cols), so per-device work grows linearly in N
    # even at fixed rows/device — ideal T(N) is N * T(1). The published
    # efficiency is work-normalized: eff = N * T1 / TN (1.0 = ideal).
    # The 2-D mesh below is the true tile-fixed weak-scaling shape.
    for ndev in (1, 2, 4, 8):
        n = r * ndev
        x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
        a = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
        mesh = default_mesh(ndev)
        G = ShardedGramian(EQ(), x, mesh=mesh)
        t = _time(jax.jit(G._matvec), a)
        # single-device oracle on the same points
        G1 = gramian(EQ(), x)
        ref = np.asarray(G1 @ a)
        got = np.asarray(G._matvec(a))
        err = float(np.abs(got - ref).max() / np.abs(ref).max())
        rows.append({
            "config": f"weak_scaling_mvm_rowsharded_{ndev}dev_rows{r}",
            "n": n, "devices": ndev, "seconds": t,
            "rel_err_vs_single": err,
            "note": "rows/device fixed (per-device work grows as N: row "
                    "shards span all n columns); fake CPU mesh shares one "
                    "host's cores",
        })
        print(json.dumps(rows[-1]), flush=True)
    t1 = rows[0]["seconds"]
    for row in rows[1:]:
        row["work_normalized_efficiency"] = (
            row["devices"] * t1 / row["seconds"])
    print(json.dumps({
        "config": "weak_scaling_rowsharded_summary",
        "work_normalized_efficiency": {
            row["devices"]: round(row["work_normalized_efficiency"], 3)
            for row in rows[1:]},
        "note": "1.0 = ideal; sub-1 here reflects 8 fake devices fighting "
                "for one host's cores, not collective cost (psum volume "
                "is in comm_model below)",
    }), flush=True)

    # true weak scaling: 2-D mesh, per-device TILE fixed at tr x tc
    tr = tc = 2048
    tile_rows = []
    for (R, C) in ((1, 1), (2, 2), (2, 4)):
        ndev = R * C
        n, m = R * tr, C * tc
        x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
        y = jnp.asarray(rng.standard_normal((m, d)), dtype=jnp.float32)
        a = jnp.asarray(rng.standard_normal(m), dtype=jnp.float32)
        mesh2 = Mesh(np.asarray(jax.devices()[:ndev]).reshape(R, C),
                     ("rows", "cols"))
        fn = jax.jit(lambda v, x=x, y=y, mesh2=mesh2: sharded_gramian_matvec_2d(
            EQ(), x, y, v, "auto", mesh2))
        t = _time(fn, a)
        got = np.asarray(fn(a))
        G1 = gramian(EQ(), x, y)
        ref = np.asarray(G1 @ a)
        err = float(np.abs(got - ref).max() / np.abs(ref).max())
        tile_rows.append({
            "config": f"weak_scaling_mvm_2dmesh_{R}x{C}_tile{tr}",
            "n": n, "m": m, "devices": ndev, "seconds": t,
            "rel_err_vs_single": err,
        })
        print(json.dumps(tile_rows[-1]), flush=True)
    t1t = tile_rows[0]["seconds"]
    print(json.dumps({
        "config": "weak_scaling_2dmesh_summary",
        "tile_fixed_efficiency": {
            row["devices"]: round(t1t / row["seconds"], 3)
            for row in tile_rows[1:]},
        "note": "per-device tile fixed: ideal = 1.0 on real hardware; "
                "fake mesh shares one host's cores",
    }), flush=True)
    rows.extend(tile_rows)

    # 2-D mesh: 4x2, sharded CG on the GP system; matches single-device.
    # The system must CONVERGE within maxiter so the sharded-vs-single
    # agreement is demonstrated at solver tolerance, not at whatever
    # residual maxiter leaves (VERDICT r4 weak #4: the r4 row ran 400
    # iters unconverged and agreed only to 1.2e-3). noise = 0.5 puts
    # cond(K + noise I) ~ 1e3-1e4: CG reaches 1e-6 well under maxiter,
    # and ||(K+nI)^-1|| <= 2 bounds the solution difference of two
    # tol-1e-6 solves by ~4e-6.
    n = 8192
    noise2d = 0.5
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    yv = jnp.sin(x[:, 0])
    mesh2 = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("rows", "cols"))
    mv2 = lambda v: sharded_gramian_matvec_2d(
        EQ(), x, x, v, "auto", mesh2) + noise2d * v
    xs, (iters, res) = sharded_cg(mv2, yv, tol=1e-6, maxiter=400)
    G1 = gramian(EQ(), x)
    ref, (iters1, res1) = __import__(
        "cfjax.operators.solvers", fromlist=["cg"]).cg(
        lambda v: G1 @ v + noise2d * v, yv, tol=1e-6, maxiter=400)
    bnorm = float(jnp.linalg.norm(yv))
    err2d = float(jnp.abs(xs - ref).max() / jnp.abs(ref).max())
    row = {
        "config": "gp_cg_2dmesh_4x2_n8192",
        "noise": noise2d,
        "iters_sharded": int(iters), "relres_sharded": float(res) / bnorm,
        "iters_single": int(iters1), "relres_single": float(res1) / bnorm,
        "rel_err_vs_single_cg": err2d,
        "converged": bool(int(iters) < 400 and int(iters1) < 400),
    }
    assert row["converged"], row
    assert err2d < 1e-5, row
    rows.append(row)
    print(json.dumps(rows[-1]), flush=True)

    # analytic comm volume at config-5 scale on a v5e-16 (4x4 mesh)
    model = comm_model(1 << 20, 4, 4)
    model["config"] = "comm_model_cg_iter_n2pow20_mesh4x4"
    model["note"] = ("per-device psum bytes per CG iteration vs per-device "
                     "tile entries; ICI at ~45 GB/s/link moves this in "
                     f"~{model['per_device_psum_bytes_per_iter']/45e9*1e6:.1f}"
                     " us — three orders below the tile compute time")
    rows.append(model)
    print(json.dumps(model), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "weak_scaling.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
