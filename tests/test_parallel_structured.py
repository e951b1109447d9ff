"""Sharded STRUCTURED fast paths vs single-device oracles (VERDICT item 2).

The reference threads every hot loop (gradient blockmul src/gramian.jl:242-251,
per-target Barnes-Hut src/barneshut.jl:88); these tests assert the mesh
versions (cfjax.parallel.structured) match the single-device operators to
tight tolerance on the fake 8-device CPU mesh, including uneven row counts
and 2-D row x col meshes with psum reduction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cfjax.barneshut import BarnesHutFactorization
from cfjax.derivative.gradient import (
    GradientGramian,
    ValueGradientGramian,
)
from cfjax.derivative.hessian import HessianGramian
from cfjax.kernels import EQ, Dot, MaternP, RQ
from cfjax.operators.kronecker import KroneckerOperator
from cfjax.operators.toeplitz import ToeplitzOperator
from cfjax.parallel import (
    ShardedGradientGramian,
    ShardedHessianGramian,
    ShardedValueGradientGramian,
    default_mesh,
    sharded_bh_matvec,
    sharded_kronecker_matvec,
    sharded_toeplitz_matmat,
)


def mesh2d():
    return Mesh(np.array(jax.devices()).reshape(4, 2), ("rows", "cols"))


@pytest.mark.parametrize("k", [MaternP(2), Dot() ** 2])
def test_sharded_gradient_matches_single(rng, k):
    n, d = 36, 5  # n not divisible by 8
    x = jnp.asarray(rng.standard_normal((n, d)))
    v = jnp.asarray(rng.standard_normal(n * d))
    mesh = default_mesh()
    G = ShardedGradientGramian(k, x, mesh=mesh, block=8)
    ref = GradientGramian(k, x, block=8) @ v
    np.testing.assert_allclose(np.asarray(G @ v), np.asarray(ref), rtol=1e-10)


def test_sharded_gradient_2d_mesh_psum(rng):
    n, d = 37, 3
    k = EQ()
    x = jnp.asarray(rng.standard_normal((n, d)))
    v = jnp.asarray(rng.standard_normal(n * d))
    G = ShardedGradientGramian(k, x, mesh=mesh2d(), row_axis="rows",
                               col_axis="cols", block=8)
    ref = GradientGramian(k, x, block=8) @ v
    np.testing.assert_allclose(np.asarray(G @ v), np.asarray(ref), rtol=1e-10)


def test_sharded_valuegradient_matches_single(rng):
    n, d = 20, 4
    k = RQ(1.5)
    x = jnp.asarray(rng.standard_normal((n, d)))
    v = jnp.asarray(rng.standard_normal(n * (d + 1)))
    G = ShardedValueGradientGramian(k, x, mesh=default_mesh(), block=8)
    ref = ValueGradientGramian(k, x, block=8) @ v
    np.testing.assert_allclose(np.asarray(G @ v), np.asarray(ref), rtol=1e-10)


def test_sharded_hessian_matches_single(rng):
    n, d = 12, 3
    k = EQ()
    x = jnp.asarray(rng.standard_normal((n, d)))
    v = jnp.asarray(rng.standard_normal(n * d * d))
    G = ShardedHessianGramian(k, x, mesh=default_mesh(), block=4)
    ref = HessianGramian(k, x, block=4) @ v
    np.testing.assert_allclose(np.asarray(G @ v), np.asarray(ref), rtol=1e-10)


def test_sharded_barneshut_matches_single(rng):
    n = 600
    x = jnp.asarray(rng.standard_normal((n, 2)))
    w = jnp.asarray(rng.random(n))
    F = BarnesHutFactorization(EQ(), x, theta=0.25, group_size=16)
    mesh = default_mesh()
    b_sharded = sharded_bh_matvec(F, w, mesh)
    b_single = F @ w
    np.testing.assert_allclose(np.asarray(b_sharded), np.asarray(b_single),
                               rtol=1e-12, atol=1e-12)


def test_sharded_kronecker_matches_single(rng):
    dims = (13, 6, 5)  # leading mode not divisible by 8
    mats = [jnp.asarray(rng.standard_normal((m, m))) for m in dims]
    K = KroneckerOperator(mats)
    a = jnp.asarray(rng.standard_normal(int(np.prod(dims))))
    out = sharded_kronecker_matvec(K, a, default_mesh())
    np.testing.assert_allclose(np.asarray(out), np.asarray(K @ a), rtol=1e-10)


def test_sharded_toeplitz_matmat(rng):
    n, r = 64, 11  # r not divisible by 8
    col = jnp.asarray(rng.standard_normal(n))
    row = col.at[0].get() * jnp.ones(()) + 0  # symmetric case via col
    T = ToeplitzOperator(col)
    V = jnp.asarray(rng.standard_normal((n, r)))
    out = sharded_toeplitz_matmat(T, V, default_mesh())
    ref = np.asarray(T.todense()) @ np.asarray(V)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-10)


def test_init_distributed_single_process():
    from cfjax.parallel import init_distributed

    mesh = init_distributed()  # no coordinator -> no-op init, global mesh
    assert int(np.prod(mesh.devices.shape)) == len(jax.devices())
    assert len(mesh.axis_names) == len(mesh.devices.shape)
