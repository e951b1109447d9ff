"""Nyström preconditioner for large-n kernel CG solves.

The reference solves lazy systems with UNpreconditioned CG
(src/gramian.jl:229-238); for smooth kernels at n ~ 10^6 the spectrum of
K + sigma^2 I has thousands of eigenvalues above sigma^2 and plain CG
stalls. The standard scalable-GP remedy (GPyTorch's pivoted-Cholesky
preconditioner, Frangella-Tropp-Udell's randomized Nystrom) maps
perfectly onto the TPU: a rank-r Nystrom sketch

    K ~= U U^T,  U = K[:, Z] V diag(w)^{-1/2},  (w, V) = eigh(K[Z, Z])

and the preconditioner solve is a Woodbury identity — two (n, r) matmuls
per CG iteration, entirely fast-path work:

    P = U U^T + sigma^2 I
    P^-1 v = (v - U E diag(1/(s+sigma^2)) E^T U^T v) / sigma^2,
    (s, E) = eigh(U^T U).

PRECISION (all measured on the v5e chip, round 3): the BUILD must run in
f64. The columns of U for small Nystrom eigenvalues come from strongly
cancelling products amplified by 1/sqrt(w); with f32 panels (or the
bf16-6-pass MXU 'highest' matmul, rel err 2.8e-6) every mode below
~3e-6 * lambda_max is junk — and exactly those modes (down to
sigma^2/lambda_max ~ 1e-7) are what the preconditioner exists to damp.
Device-f32-built M stalled PCG at relres 2.5e-2 (n=32768) and diverged
at n=1e5; the SAME solve with a host-f64-built M converges in 3-4
iterations. The APPLY is fine in f32 (validated by the same bisect).

The build therefore runs on the CPU backend under
jax.enable_x64 — the kernel's own jnp profile evaluates in
f64 on host, row-chunked so memory stays bounded — and only the final
f32 U panel ships to the accelerator.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _kernel_panel(k, xp, Z, block=8192):
    """(n, r) kernel panel in bounded row blocks (one lax.map dispatch)."""
    from ..utils.testing import pairwise_xy

    n, d = xp.shape
    nb = -(-n // block)
    xpad = jnp.pad(xp, ((0, nb * block - n), (0, 0)))
    out = jax.lax.map(lambda xb: pairwise_xy(k, xb, Z),
                      xpad.reshape(nb, block, d))
    return out.reshape(nb * block, -1)[:n]


def _build_nystrom_hostf64(k, x_np, noise, rank, seed):
    """f64 build on the CPU backend; returns host arrays (U32, E, s)."""
    from ..utils.testing import pairwise_xy

    n = x_np.shape[0]
    rng = np.random.default_rng(seed)
    idx = rng.choice(n, rank, replace=False)

    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(True), jax.default_device(cpu):
        xh = jnp.asarray(x_np, dtype=jnp.float64)
        Z = xh[jnp.asarray(idx)]
        Kzz = np.asarray(pairwise_xy(k, Z, Z), dtype=np.float64)
        w, V = np.linalg.eigh(Kzz)
        floor = max(float(w[-1]), 0.0) * 1e-12
        inv_sqrt = np.where(w > floor, 1.0 / np.sqrt(np.maximum(w, floor)), 0.0)
        Vis = jnp.asarray(V * inv_sqrt[None, :])
        U32 = np.empty((n, rank), dtype=np.float32)
        B = np.zeros((rank, rank), dtype=np.float64)
        blk = 65536
        for i in range(0, n, blk):
            panel = pairwise_xy(k, xh[i:i + blk], Z)      # (b, r) f64
            Ub = panel @ Vis
            B += np.asarray(Ub.T @ Ub, dtype=np.float64)
            U32[i:i + blk] = np.asarray(Ub, dtype=np.float32)
        s, E = np.linalg.eigh(B)
        s = np.maximum(s, 0.0)
    return U32, E.astype(np.float32), s.astype(np.float32)


def nystrom_preconditioner(k, x, noise, rank: int = 256, key=None):
    """Returns apply(v) ~= (K + noise I)^-1 v for use as CG's `M`.

    `noise` is the variance added to the diagonal (sigma^2). The sketch
    uses `rank` uniformly-sampled landmark rows; memory is one (n, rank)
    f32 panel on device. SPD by construction (the capacitance is applied
    through its eigendecomposition with s >= 0), so always a valid CG
    preconditioner regardless of build accuracy."""
    from ..utils.grids import as_points

    seed = 0 if key is None else int(jax.random.randint(key, (), 0, 2**31 - 1))
    xp = as_points(x)
    x_np = np.asarray(xp)
    U32, E, s = _build_nystrom_hostf64(k, x_np, float(noise), rank, seed)
    U = jnp.asarray(U32)
    E = jnp.asarray(E)
    s = jnp.asarray(s)
    noise = jnp.asarray(noise, U.dtype)

    def apply(v):
        t = E.T @ (U.T @ v)
        t = E @ (t / (s + noise))
        return (v - U @ t) / noise

    return apply
