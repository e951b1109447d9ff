"""Micro-benchmark: ELLPACK sparse MVM gather strategies on TPU.

The sparsified-Gramian MVM (cfjax/operators/sparse_op.py) is a per-row
scalar gather of the input vector; TPU gathers of scalars from a 1-D
array waste the (8,128) vreg granularity. This probes alternatives.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cfjax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

n, m, w = 16384, 16384, 64
rng = np.random.default_rng(0)
cols_np = np.sort(rng.integers(0, m, size=(n, w)), axis=1).astype(np.int32)
cols = jnp.asarray(cols_np)
vals = jnp.asarray(rng.standard_normal((n, w)), dtype=jnp.float32)
a = jnp.asarray(rng.standard_normal(m), dtype=jnp.float32)


def timeit(f, *args, iters=10):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


@jax.jit
def v_current(cols, vals, a):
    ap = jnp.concatenate([a, jnp.zeros((1,), a.dtype)])
    return jnp.sum(vals * ap[cols], axis=1)


@jax.jit
def v_atget(cols, vals, a):
    g = a.at[cols].get(mode="fill", fill_value=0.0)
    return jnp.sum(vals * g, axis=1)


@jax.jit
def v_sorted_flag(cols, vals, a):
    g = a.at[cols].get(mode="fill", fill_value=0.0, indices_are_sorted=False,
                       unique_indices=False)
    return jnp.sum(vals * g, axis=1)


@jax.jit
def v_tile8(cols, vals, a):
    # gather 8-wide tiles then select within tile by one-hot
    ap = jnp.concatenate([a, jnp.zeros((8,), a.dtype)])
    a2 = ap[: (m // 8 + 1) * 8].reshape(-1, 8)
    t = cols // 8
    o = cols % 8
    tiles = a2[t]                       # (n, w, 8)
    sel = jax.nn.one_hot(o, 8, dtype=a.dtype)
    return jnp.sum(vals * jnp.sum(tiles * sel, -1), axis=1)


@jax.jit
def v_take(cols, vals, a):
    g = jnp.take(a, cols, mode="clip")
    return jnp.sum(vals * g, axis=1)


@jax.jit
def v_scan_w(cols, vals, a):
    ap = jnp.concatenate([a, jnp.zeros((1,), a.dtype)])
    def body(acc, cw):
        c, v = cw
        return acc + v * ap[c], None
    out, _ = jax.lax.scan(body, jnp.zeros((n,), a.dtype),
                          (cols.T, vals.T))
    return out


@jax.jit
def v_dense_onehot_chunk(cols, vals, a):
    # per chunk of rows: one_hot(cols_chunk) @ a on MXU
    C = 2048
    ap = jnp.concatenate([a, jnp.zeros((1,), a.dtype)])
    def body(i, out):
        cc = jax.lax.dynamic_slice(cols, (i * C, 0), (C, w))
        vv = jax.lax.dynamic_slice(vals, (i * C, 0), (C, w))
        oh = jax.nn.one_hot(cc.reshape(-1), m + 1, dtype=jnp.bfloat16)
        g = (oh @ ap.astype(jnp.bfloat16)).astype(a.dtype).reshape(C, w)
        return jax.lax.dynamic_update_slice(out, jnp.sum(vv * g, 1), (i * C,))
    return jax.lax.fori_loop(0, n // C, body, jnp.zeros((n,), a.dtype))


for name, f in [("current", v_current), ("atget", v_atget),
                ("sorted_flag", v_sorted_flag), ("take_clip", v_take),
                ("tile8_onehot", v_tile8), ("scan_w", v_scan_w),
                ("onehot_mxu", v_dense_onehot_chunk)]:
    try:
        ms = timeit(f, cols, vals, a)
        ok = np.allclose(np.asarray(f(cols, vals, a)),
                         np.asarray(v_current(cols, vals, a)), atol=1e-2)
        print(f"{name:16s} {ms:9.3f} ms   ok={ok}", flush=True)
    except Exception as e:
        print(f"{name:16s} FAILED: {type(e).__name__}: {e}", flush=True)
