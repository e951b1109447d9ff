"""Pallas fused-kernel math validated on CPU via interpret mode.

The real Mosaic lowering only runs on TPU (the driver's bench exercises
it); interpret mode checks the kernel MATH — tiling, padding, masking,
accumulation, in-kernel derivative computation — against the XLA
matmul-expansion oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfjax.kernels import EQ, Dot, MaternP
from cfjax.derivative.gradient import grad_matvec_dot, grad_matvec_iso
from cfjax.operators.gramian import gramian_matvec
from cfjax.ops.pallas_mvm import pallas_grad_matvec, pallas_gramian_matvec


@pytest.mark.parametrize("k,mode", [(MaternP(2), "iso"), (Dot() ** 2, "dot")])
def test_pallas_scalar_mvm_interpret(k, mode, rng):
    n, m, d = 300, 270, 3  # non-multiples of the tile sizes
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal((m, d)), dtype=jnp.float32)
    a = jnp.asarray(rng.standard_normal(m), dtype=jnp.float32)
    out = pallas_gramian_matvec(k, x, y, a, mode, tm=128, tn=128, interpret=True)
    ref = gramian_matvec(k, x, y, a, mode, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5)


@pytest.mark.parametrize("prec", ["default", "high", "highest"])
def test_pallas_scalar_mvm_precisions_interpret(prec, rng):
    """Every precision tier lowers and computes correctly through the
    kernel, including the MANUAL bf16_3x split for HIGH (Mosaic's
    dot_general supports only DEFAULT/HIGHEST natively — _dot_nt). On
    CPU interpret all tiers are exact f32, so this checks structure,
    not rounding; the rounding ladder is measured on chip in
    BENCHMARKS.md."""
    n, m, d = 300, 270, 40
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal((m, d)), dtype=jnp.float32)
    a = jnp.asarray(rng.standard_normal(m), dtype=jnp.float32)
    out = pallas_gramian_matvec(EQ(), x, y, a, "iso", tm=128, tn=128,
                                interpret=True, precision=prec)
    ref = gramian_matvec(EQ(), x, y, a, "iso", 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("k,mode", [(EQ(), "iso"), (MaternP(2), "iso"), (Dot() ** 2, "dot")])
def test_pallas_grad_mvm_interpret(k, mode, rng):
    n, m, d = 200, 170, 5
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal((m, d)), dtype=jnp.float32)
    A = jnp.asarray(rng.standard_normal((m, d)), dtype=jnp.float32)
    out = pallas_grad_matvec(k, x, y, A, mode, tm=128, tn=128, interpret=True)
    fast = grad_matvec_iso if mode == "iso" else grad_matvec_dot
    ref = fast(k, x, y, A, block=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=3e-5)
