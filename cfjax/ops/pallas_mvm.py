"""Pallas fused kernel-tile MVM (TPU hot path).

Replaces the reference's threaded per-element dense MVM
(src/gramian.jl:78-99): tiles of the kernel matrix are recomputed in VMEM
from the points (distance tile via MXU matmul, scalar profile on the VPU)
and contracted against the vector without ever touching HBM with O(n^2)
data.

Implemented for isotropic and dot-product trait kernels whose profiles
are pure elementwise jnp functions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..kernels.base import InputTrait


def pallas_supported(k, mode: str, x, y) -> bool:
    """Whether the fused Pallas path applies (TPU backend + iso/dot trait +
    concrete hashable kernel hyperparameters, so the profile closure bakes
    them as compile-time constants inside the Mosaic kernel)."""
    if mode not in ("iso", "dot"):
        return False
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    if backend not in ("tpu", "axon"):
        return False
    if any(
        isinstance(l, jax.core.Tracer) for l in jax.tree_util.tree_leaves((k, x, y))
    ):
        return False
    try:
        hash(k)
    except TypeError:
        return False
    return True


def _mvm_kernel(x_ref, y_ref, x2_ref, y2_ref, a_ref, o_ref, acc_ref, *, profile, mode, n_j):
    """Grid: (i, j) over row/col tiles; accumulate over j into acc."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xt = x_ref[:]          # (TM, d)
    yt = y_ref[:]          # (TN, d)
    S = jax.lax.dot_general(
        xt, yt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                      # (TM, TN)
    if mode == "iso":
        D = x2_ref[:] + y2_ref[:].reshape(1, -1) - 2.0 * S
        K = profile(jnp.maximum(D, 0.0))
    else:
        K = profile(S)
    acc_ref[:] += jnp.dot(K, a_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == n_j - 1)
    def _():
        o_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=("k", "mode", "tm", "tn", "interpret"))
def pallas_gramian_matvec(k, x, y, a, mode: str = "iso", tm: int = 256, tn: int = 512,
                          interpret: bool = False):
    """b = K a with K_ij = k(x_i, y_j), fused in VMEM.

    Points are zero-padded to tile multiples; padded columns are masked by
    zero-padding `a` (so garbage kernel values multiply zero weights), and
    padded rows are sliced off the output.

    NOTE on padding correctness: zero-padded x/y rows produce *finite*
    kernel values for all shipped profiles (profile(0)=finite), so no
    NaN/Inf can leak into the accumulator through zero weights.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    m = y.shape[0]
    single = a.ndim == 1
    a2 = a[:, None] if single else a
    r = a2.shape[1]

    f32 = jnp.float32
    xp = jnp.pad(x, ((0, -n % tm), (0, -d % 128))).astype(f32)
    yp = jnp.pad(y, ((0, -m % tn), (0, -d % 128))).astype(f32)
    ap = jnp.pad(a2, ((0, -m % tn), (0, -r % 128))).astype(f32)
    x2 = jnp.sum(xp * xp, axis=1, keepdims=True)  # (Np, 1)
    y2 = jnp.sum(yp * yp, axis=1, keepdims=True)
    Np, dp = xp.shape
    Mp = yp.shape[0]
    rp = ap.shape[1]
    n_i, n_j = Np // tm, Mp // tn

    profile = lambda s: k.profile(s)

    out = pl.pallas_call(
        partial(_mvm_kernel, profile=profile, mode=mode, n_j=n_j),
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((tm, dp), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, dp), lambda i, j: (j, 0)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((tn, rp), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((tm, rp), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, rp), f32),
        scratch_shapes=[pltpu.VMEM((tm, rp), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, yp, x2, y2, ap)

    out = out[:n, :r].astype(jnp.result_type(x.dtype, a.dtype))
    return out[:, 0] if single else out


def _tile_d2(profile, S):
    """(f'(S), f''(S)) elementwise on a 2-D tile via nested jvp — array-level
    ops only (no vmap/reshape), which Mosaic lowers cleanly."""
    ones = jnp.ones_like(S)
    f1 = lambda s: jax.jvp(profile, (s,), (jnp.ones_like(s),))[1]
    k1 = f1(S)
    _, k2 = jax.jvp(f1, (S,), (ones,))
    return k1, k2


def _grad_mvm_kernel(x_ref, y_ref, x2_ref, y2_ref, A_ref, t_ref, o_ref,
                     acc_ref, *, profile, mode, n_j):
    """Fused gradient-block MVM tile (the reference's headline O(n^2 d)
    MVM, src/gramian.jl:241-257 + src/gradient.jl:86-92): per (i, j) tile,
    recompute the distance tile (MXU), the profile's first two derivatives
    (VPU), and contract the closed-form block action —
      iso: out_i += -2 k1 A_j - 4 [rowsum(W) x_i - W y_j],
           W = k2 (P - t),  P = x A^T,  t_j = <y_j, A_j>
      dot: out_i += k1 A_j + (k2 * P) y_j
    — four MXU matmuls per tile, zero O(n^2) HBM traffic."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xt = x_ref[:]          # (TM, dp)
    yt = y_ref[:]          # (TN, dp)
    At = A_ref[:]          # (TN, dp)
    S = jax.lax.dot_general(
        xt, yt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    P = jax.lax.dot_general(
        xt, At, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if mode == "iso":
        D = jnp.maximum(x2_ref[:] + y2_ref[:].reshape(1, -1) - 2.0 * S, 0.0)
        k1, k2 = _tile_d2(profile, D)
        W = k2 * (P - t_ref[:].reshape(1, -1))
        contrib = (
            -2.0 * jnp.dot(k1, At, preferred_element_type=jnp.float32)
            - 4.0 * (
                jnp.sum(W, axis=1, keepdims=True) * xt
                - jnp.dot(W, yt, preferred_element_type=jnp.float32)
            )
        )
    else:  # dot
        k1, k2 = _tile_d2(profile, S)
        contrib = jnp.dot(k1, At, preferred_element_type=jnp.float32) + jnp.dot(
            k2 * P, yt, preferred_element_type=jnp.float32
        )
    acc_ref[:] += contrib

    @pl.when(j == n_j - 1)
    def _():
        o_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=("k", "mode", "tm", "tn", "interpret"))
def pallas_grad_matvec(k, x, y, A, mode: str = "iso", tm: int = 256,
                       tn: int = 256, interpret: bool = False):
    """Gradient-gramian block MVM (n, d) <- blocks @ (m, d), fused in VMEM.
    Same tiling/padding contract as pallas_gramian_matvec; A's padded rows
    are zero so padded columns contribute nothing."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    m = y.shape[0]
    f32 = jnp.float32
    xp = jnp.pad(x, ((0, -n % tm), (0, -d % 128))).astype(f32)
    yp = jnp.pad(y, ((0, -m % tn), (0, -d % 128))).astype(f32)
    Ap = jnp.pad(A, ((0, -m % tn), (0, -d % 128))).astype(f32)
    x2 = jnp.sum(xp * xp, axis=1, keepdims=True)
    y2 = jnp.sum(yp * yp, axis=1, keepdims=True)
    t = jnp.sum(yp * Ap, axis=1, keepdims=True)  # (Mp, 1)
    Np, dp = xp.shape
    Mp = yp.shape[0]
    n_i, n_j = Np // tm, Mp // tn

    profile = lambda s: k.profile(s)

    out = pl.pallas_call(
        partial(_grad_mvm_kernel, profile=profile, mode=mode, n_j=n_j),
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((tm, dp), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, dp), lambda i, j: (j, 0)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((tn, dp), lambda i, j: (j, 0)),
            pl.BlockSpec((tn, 1), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((tm, dp), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, dp), f32),
        scratch_shapes=[pltpu.VMEM((tm, dp), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, yp, x2, y2, Ap, t)

    return out[:n, :d].astype(jnp.result_type(x.dtype, A.dtype))
