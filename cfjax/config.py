"""Global configuration constants.

Mirrors the reference's module-level constants (see reference
src/CovarianceFunctions.jl:37 `default_tol`, src/gramian.jl:201-202
`DEFAULT_MAX_CHOLESKY_SIZE`/`DEFAULT_TOL`, src/barneshut.jl:3-4,
src/sparse.jl:3) as a frozen dataclass so it can be threaded through
jitted code as static metadata.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Config:
    # numerical tolerance for factorization / PSD checks
    default_tol: float = 1e-6
    # below this size, `factorize` returns a dense Cholesky; above, stays lazy (CG)
    max_cholesky_size: int = 2**14
    # Barnes-Hut defaults
    barneshut_leafsize: int = 16
    barneshut_theta: float = 0.25
    # sparsification
    sparse_leafsize: int = 16
    # default row-block size for blocked lazy MVMs (tuned for VMEM residency)
    mvm_block_rows: int = 512
    # iterative solver defaults
    cg_maxiter: int = 1000
    cg_tol: float = 1e-8
    # For LARGE eager solves (b.size >= cg_chunk_min_n, not under jit),
    # cg runs its while_loop in host-driven segments of this many
    # iterations: one monolithic 60+ s device program is fragile on
    # remote-execution runtimes (RPC deadline -> device error, observed
    # on the v5e tunnel at n = 10^6 x 60 CG iters) and no faster.
    # Under jit (tracer inputs) chunking is ignored. 8 iterations keeps a
    # segment under ~30 s at n = 10^6 (the axon worker kills executions
    # somewhere in the 60-85 s range — 8-iter segments pass, 24-iter
    # segments crash the worker; measured r4).
    cg_chunk_iters: int = 8
    cg_chunk_min_n: int = 1 << 18
    # MXU input precision for distance/inner-product tiles. TPU matmuls
    # ingest f32 at bf16 by default, which puts ~7e-3 relative error on
    # dense-MVM outputs and can break the PSD-ness Cholesky needs
    # (measured, scratch r3). "highest" (bf16_6x) restores ~f32 accuracy
    # at 6x the MXU cost of "default" — the right default for a GP
    # library; flip per-operator (precision=...) for speed-of-light runs.
    matmul_precision: str = "highest"
    # at d <= this, isotropic distance tiles skip the MXU entirely and
    # use the exact unrolled difference form (no cancellation, no
    # padded-matmul cost; crossover vs 6-pass matmul measured at d~16)
    direct_sqdist_max_d: int = 16


DEFAULT = Config()


def set_config(**kwargs):
    """Replace global config fields (e.g. set_config(matmul_precision=
    "default") for speed-of-light bf16 MXU runs). Clears jax's jit caches:
    jitted kernels read DEFAULT at trace time, so cached executables
    would otherwise keep the old values."""
    global DEFAULT
    import dataclasses as _dc

    import jax as _jax

    DEFAULT = _dc.replace(DEFAULT, **kwargs)
    _jax.clear_caches()
    return DEFAULT
