"""Full BASELINE benchmark table: every published reference number
(BASELINE.md) reproduced on the TPU chip.

Prints one JSON line per config plus a markdown table, and writes
BENCHMARKS.md at the repo root. The reference numbers are @time
transcripts from its README on an unspecified CPU (BASELINE.md).

All timings are TRUE device wall clock (cfjax.utils.timing): the axon
tunnel's async dispatch returns from block_until_ready before the device
finishes, so we force synchronous dispatch up front; and because the
sync-mode per-dispatch round trip is large and drifts (1.4..30 ms), all
repeatable ops use SLOPE timing (chained fori_loop at two trip counts)
which cancels it exactly. One-shot construction/factorize numbers
subtract the measured round trip and are approximate below ~1 ms.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cfjax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cfjax.utils.timing import force_sync_dispatch, time_chained, time_dispatch

RESULTS = []


def record(name, seconds, ref_seconds, note=""):
    row = {
        "config": name,
        "tpu_seconds": seconds,
        "ref_seconds": ref_seconds,
        "speedup": ref_seconds / seconds if seconds > 0 else float("inf"),
        "note": note,
    }
    RESULTS.append(row)
    print(json.dumps(row), flush=True)


def bench_dense_mvm():
    from cfjax.kernels import MaternP
    from cfjax.operators import Gramian

    rng = np.random.default_rng(0)
    n, d = 16384, 3
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    a = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    G = Gramian(MaternP(2), x)
    record("dense_mvm_maternp2_n16384_d3", time_chained(G._matvec, a), 0.585)
    Gx = Gramian(MaternP(2), x, use_pallas="never")
    record("dense_mvm_maternp2_n16384_d3_xla", time_chained(Gx._matvec, a),
           0.585, "XLA path (no pallas)")


def bench_toeplitz():
    from cfjax.kernels import Exp
    from cfjax.operators import gramian, levinson
    from cfjax.utils.grids import UniformGrid

    rng = np.random.default_rng(0)
    n = 65536
    g = UniformGrid(0.0, 1.0 / n, n)
    T = gramian(Exp(), g)  # warm (compiles the column eval)
    jax.block_until_ready(T.col)
    dt = time_dispatch(lambda: gramian(Exp(), g).col)
    record("toeplitz_construct_exp_n65536", dt, 0.572e-3 * 4,
           "ref number scaled from n=16384")
    a = jnp.asarray(rng.standard_normal(n), dtype=T.col.dtype)
    record("toeplitz_fft_mvm_n65536", time_chained(T._matvec, a), 1.068e-3 * 4,
           "ref scaled from n=16384")
    # GP-regression solve: noisy system, Strang-PCG (the scalable path)
    from cfjax.operators import cg as _cg

    Tn = T.add_diagonal(1e-2)
    b = Tn @ a
    Minv = T.strang_preconditioner()
    solve_jit = jax.jit(lambda bb: _cg(Tn._matvec, bb, tol=1e-5, maxiter=600, M=Minv))
    dt = time_dispatch(solve_jit, b, iters=2)
    x_cg, info = solve_jit(b)
    err = float(jnp.linalg.norm(Tn @ x_cg - b) / jnp.linalg.norm(b))
    record("toeplitz_solve_pcg_noisy_n65536", dt, 0.173 * 16,
           f"rel res {err:.1e}, {int(info[0])} iters; ref levinson scaled from n=16384")
    # direct levinson at the reference size
    n2 = 16384
    g2 = UniformGrid(0.0, 1.0 / n2, n2)
    T2 = gramian(Exp(), g2)
    b2 = T2 @ jnp.asarray(rng.standard_normal(n2), dtype=T2.col.dtype)
    dt = time_dispatch(lambda: levinson(T2.col, b2), iters=2)
    record("toeplitz_levinson_n16384", dt, 0.173, "sequential O(n) scan depth")


def bench_kronecker():
    from cfjax.kernels import EQ, separable
    from cfjax.operators import gramian
    from cfjax.utils.grids import LazyGrid, UniformGrid

    rng = np.random.default_rng(0)
    m = 128
    grid = LazyGrid(tuple(UniformGrid(0.0, 1.0 / m, m) for _ in range(3)))
    k = separable("^", EQ(), d=3)
    K = gramian(k, grid)  # warm compile
    jax.block_until_ready(K.factors[0].col)
    dt = time_dispatch(lambda: gramian(k, grid).factors[0].col)
    record("kronecker_construct_eq3_128cubed", dt, 23e-6)
    n = len(grid)
    a = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    record("kronecker_mvm_eq3_128cubed", time_chained(K._matvec, a, iters=(2, 18)), 22.6e-3)
    F = K.cholesky()  # warm
    jax.block_until_ready(F.Ls[0])
    dt = time_dispatch(lambda: K.cholesky().Ls[0])
    record("kronecker_cholesky_eq3_128cubed", dt, 3.13e-3)
    record("kronecker_solve_eq3_128cubed",
           time_chained(F.solve, a, iters=(2, 18)), 62.5e-3)


def bench_gradient():
    from cfjax.derivative import GradientKernel
    from cfjax.kernels import EQ, Line, MaternP, NN
    from cfjax.operators import gramian, solve

    rng = np.random.default_rng(0)
    # README config: MaternP(2), n = d = 1024 (10^6 x 10^6 operator)
    n, d = 1024, 1024
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    G = gramian(GradientKernel(MaternP(2)), x)
    v = jnp.asarray(rng.standard_normal(n * d), dtype=jnp.float32)
    record("gradient_mvm_maternp2_n1024_d1024", time_chained(G._matvec, v, iters=(2, 18)), 0.394)
    op = G.add_diagonal(1e-3)
    dt = time_dispatch(lambda: solve(op, v, tol=1e-6, maxiter=200), iters=1, repeats=1)
    record("gradient_solve_maternp2_n1024_d1024", dt, 0.817, "CG tol 1e-6")
    # driver config: EQ gradient, n=4096 d=16
    n, d = 4096, 16
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    G = gramian(GradientKernel(EQ()), x)
    v = jnp.asarray(rng.standard_normal(n * d), dtype=jnp.float32)
    record("gradient_mvm_eq_n4096_d16", time_chained(G._matvec, v, iters=(2, 18)),
           float("nan"), "driver config")
    # composite README demo: Matern + quadratic + NN, n = d = 1024
    n, d = 1024, 1024
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    k = MaternP(2) + Line(1.0) ** 2 + NN(0.1)
    G = gramian(GradientKernel(k), x)
    v = jnp.asarray(rng.standard_normal(n * d), dtype=jnp.float32)
    record("gradient_mvm_composite_n1024_d1024", time_chained(G._matvec, v, iters=(2, 18)), 3.14)


def bench_hessian():
    from cfjax.derivative import HessianKernel
    from cfjax.kernels import EQ

    rng = np.random.default_rng(0)
    n, d = 128, 16
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    G = HessianKernel(EQ()).gramian(x)
    v = jnp.asarray(rng.standard_normal(n * d * d), dtype=jnp.float32)
    record("hessian_mvm_eq_n128_d16", time_chained(G._matvec, v, iters=(2, 18)), 0.077)


def bench_barneshut():
    from cfjax.barneshut import BarnesHutFactorization
    from cfjax.kernels import EQ

    rng = np.random.default_rng(0)
    n, d = 65536, 2
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, n), dtype=jnp.float32)
    t0 = time.perf_counter()
    F = BarnesHutFactorization(EQ(), x, theta=0.5)
    record("barneshut_build_n65536_d2", time.perf_counter() - t0, 0.077)
    dt = time_chained(F._matvec, w, iters=(2, 18))
    b = F @ w
    # spot-check error on 256 rows
    idx = rng.integers(0, n, 256)
    xs = x[jnp.asarray(idx)]
    rows = jnp.exp(-(
        jnp.sum(xs * xs, 1)[:, None] + jnp.sum(x * x, 1)[None, :] - 2 * xs @ x.T
    ) / 2)
    exact = rows @ w
    err = float(jnp.linalg.norm(b[jnp.asarray(idx)] - exact) / jnp.linalg.norm(exact))
    record("barneshut_mvm_theta0.5_n65536", dt, 0.083, f"rel err {err:.2e} (ref 1.2e-2)")
    F2 = BarnesHutFactorization(EQ(), x, theta=0.25)
    dt = time_chained(F2._matvec, w, iters=(2, 18))
    b2 = F2 @ w
    err2 = float(jnp.linalg.norm(b2[jnp.asarray(idx)] - exact) / jnp.linalg.norm(exact))
    record("barneshut_mvm_theta0.25_n65536", dt, 0.223, f"rel err {err2:.2e} (ref 4.3e-3)")


def tile_ell_chained(S, a):
    """Slope-time the TileELL MVM, passing its integer index arrays as
    explicit consts (closure_convert leaves int captures baked into the
    HLO, which overflows the tunnel's compile-request size limit)."""
    from cfjax.operators.tile_ell import _tile_ell_matvec_impl

    go = tuple(g[2] for g in S.groups)
    gv = tuple(g[3] for g in S.groups)
    n = S.shape[0]
    step = lambda v, *c: _tile_ell_matvec_impl(c[0], c[1], c[2], v, S.nt, True)[:n]
    return time_chained(step, a, consts=(go, gv, S.perm))


def bench_sparse():
    from cfjax.kernels import EQ
    from cfjax.operators.sparse_op import sparse_gramian

    rng = np.random.default_rng(0)
    n, d = 16384, 32
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    t0 = time.perf_counter()
    S, ratio = sparse_gramian(EQ(), x, tol=1e-6)
    record("sparsify_build_eq_n16384_d32", time.perf_counter() - t0, 7.21,
           f"nnz ratio {ratio:.4f} (ref 0.0022)")
    a = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    record("sparse_mvm_eq_n16384_d32",
           tile_ell_chained(S, a), 0.45e-3)


def main():
    which = sys.argv[1:] if len(sys.argv) > 1 else [
        "dense_mvm", "toeplitz", "kronecker", "gradient", "hessian",
        "barneshut", "sparse",
    ]
    force_sync_dispatch()
    t_all = time.time()
    for name in which:
        fn = globals()[f"bench_{name}"]
        try:
            fn()
        except Exception as e:
            print(json.dumps({"config": name, "error": repr(e)}), flush=True)
    # write table
    lines = [
        "# BENCHMARKS — cfjax on TPU v5e (1 chip) vs reference CPU numbers",
        "",
        "True device wall clock (sync dispatch + chained-iteration timing,",
        "see cfjax/utils/timing.py).",
        "",
        "| config | cfjax TPU | reference | speedup | note |",
        "|---|---|---|---|---|",
    ]
    for r in RESULTS:
        lines.append(
            f"| {r['config']} | {r['tpu_seconds']*1e3:.3f} ms | "
            f"{r['ref_seconds']*1e3:.3f} ms | {r['speedup']:.1f}x | {r['note']} |"
        )
    out = "\n".join(lines) + "\n"
    if len(sys.argv) <= 1:
        with open(os.path.join(os.path.dirname(__file__), "..", "BENCHMARKS.md"), "w") as f:
            f.write(out)
    print(out)
    print(f"total wall: {time.time()-t_all:.1f}s")


if __name__ == "__main__":
    main()
