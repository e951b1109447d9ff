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


DEFAULT = Config()
