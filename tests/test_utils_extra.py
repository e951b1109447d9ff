"""Utility parity tests (reference src/util.jl, src/givens.jl,
src/derivatives.jl equivalents)."""

import jax
import jax.numpy as jnp
import numpy as np

from cfjax.utils.linalg import (
    exchange_matrix,
    givens_rotation,
    jet_derivatives,
    leave_one_out_products,
    nth_derivatives,
    perfect_shuffle,
    perfect_shuffle_indices,
)
from cfjax.utils.testing import isisotropic_probe, isstationary_probe


def test_perfect_shuffle(rng):
    X = rng.standard_normal((3, 5))
    v = jnp.asarray(X.reshape(-1))
    out = perfect_shuffle(v, 3, 5)
    np.testing.assert_allclose(np.asarray(out), X.T.reshape(-1))
    p = perfect_shuffle_indices(3, 5)
    np.testing.assert_allclose(X.reshape(-1)[p], X.T.reshape(-1))


def test_exchange_and_loo(rng):
    J = np.asarray(exchange_matrix(4))
    v = rng.standard_normal(4)
    np.testing.assert_allclose(J @ v, v[::-1])
    x = rng.uniform(0.5, 2, 6)
    loo = np.asarray(leave_one_out_products(jnp.asarray(x)))
    expect = np.array([np.prod(np.delete(x, i)) for i in range(6)])
    np.testing.assert_allclose(loo, expect, rtol=1e-12)


def test_givens_differentiable():
    c, s, r = givens_rotation(3.0, 4.0)
    np.testing.assert_allclose([float(c), float(s), float(r)], [0.6, 0.8, 5.0])
    # rotation annihilates second entry
    assert abs(float(-s * 3.0 + c * 4.0)) < 1e-12
    g = jax.grad(lambda f: givens_rotation(f, 4.0)[2])(3.0)
    np.testing.assert_allclose(float(g), 0.6, rtol=1e-12)


def test_nth_derivatives():
    f = lambda x: jnp.sin(x)
    d = nth_derivatives(f, 0.7, 4)
    x = 0.7
    expect = [np.sin(x), np.cos(x), -np.sin(x), -np.cos(x), np.sin(x)]
    np.testing.assert_allclose([float(v) for v in d], expect, rtol=1e-10)
    dj = jet_derivatives(f, 0.7, 4)
    np.testing.assert_allclose([float(v) for v in dj], expect, rtol=1e-10)


def test_property_probes():
    from cfjax.kernels import EQ, Cosine, Dot

    assert isstationary_probe(EQ())
    assert isisotropic_probe(EQ())
    assert isstationary_probe(Cosine(jnp.ones(3)))
    assert not isisotropic_probe(Cosine(jnp.asarray([1.0, 2.0, 0.5])))
    assert not isstationary_probe(Dot())


def test_explain_and_matrixkernel(rng):
    from cfjax.kernels import EQ, MatrixKernel
    from cfjax.operators.dispatch import explain, gramian
    from cfjax.utils.grids import UniformGrid

    s = explain(EQ(), UniformGrid(0.0, 0.1, 16))
    assert "Toeplitz" in s
    s2 = explain(EQ(), rng.standard_normal((10, 2)))
    assert "mvm mode = iso" in s2
    A = rng.standard_normal((6, 6))
    A = A @ A.T
    k = MatrixKernel(jnp.asarray(A), (6, 6))
    G = gramian(k, np.asarray([0, 2, 4]), np.asarray([1, 3]))
    np.testing.assert_allclose(np.asarray(G.todense()), A[[0, 2, 4]][:, [1, 3]])


def test_slope_timing_rejects_noise():
    """A slope that cannot dominate jitter raises MeasurementError with
    an upper bound instead of clamping to 0 (ADVICE.md round 1)."""
    import pytest

    from cfjax.utils.timing import MeasurementError, time_chained

    step = lambda v: v + 1.0
    v0 = jnp.zeros(8)
    with pytest.raises(MeasurementError) as ei:
        # delta_ratio impossible to satisfy -> must fail, never return 0
        time_chained(step, v0, repeats=2, delta_ratio=1e12, time_budget=0.5)
    assert ei.value.upper_bound is not None and ei.value.upper_bound > 0


def test_slope_timing_measures_real_op():
    from cfjax.utils.timing import time_chained

    A = jnp.asarray(np.random.default_rng(0).standard_normal((256, 256)),
                    dtype=jnp.float32)
    dt = time_chained(lambda v: A @ v, jnp.ones(256), repeats=3,
                      time_budget=30.0)
    assert dt > 0


def test_roofline_accounting():
    from cfjax.utils.roofline import Work, summarize

    w = Work(mxu=8.6e9, vpu=1e7, hbm_bytes=1e7)
    ok = summarize(w, 1e-3)       # ~8.6 TFLOP/s: plausible
    assert ok["valid"] and ok["bound"] == "MXU"
    bad = summarize(w, 1e-6)      # implies 8600 TFLOP/s: impossible
    assert not bad["valid"]
