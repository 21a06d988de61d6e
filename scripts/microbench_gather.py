"""Microbenchmarks for the decode-path primitives on the real TPU.

Probes (each timed steady-state, compile excluded):
  1. XLA minor-dim take_along_axis gather rate (the current bottleneck)
  2. XLA row (sublane) gather rate
  3. Pallas: minimal kernel compiles at all on this toolchain
  4. Pallas: in-kernel one-hot gather (per-lane table read) rate
  5. Pallas: factored one-hot (hi/lo split) shared-table gather rate
  6. Pallas: per-lane dynamic pl.ds load on the minor dim (compile check)
  7. Pallas: fori_loop step overhead (empty-ish loop)
  8. Pallas: VMEM->VMEM DMA issue rate with dynamic offsets

Run: python scripts/microbench_gather.py [probe ...]
"""

import sys

sys.path.insert(0, "/root/repo")
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zstd_tpu.utils.platform import enable_compile_cache

enable_compile_cache()


def timeit(fn, *args, runs=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(runs):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / runs


def probe_xla_gather():
    B, L = 256, 131072
    x = jnp.arange(B * L, dtype=jnp.int32).reshape(B, L)
    idx = jnp.asarray(np.random.randint(0, L, size=(B, L)), jnp.int32)

    @jax.jit
    def f(x, idx):
        return jnp.take_along_axis(x, idx, axis=1)

    dt = timeit(f, x, idx)
    print(f"xla_take_along_axis minor: {B*L/dt/1e6:.1f} M elem/s ({dt*1e3:.1f} ms)")


def probe_xla_row_gather():
    R, C = 65536, 128
    x = jnp.arange(R * C, dtype=jnp.int32).reshape(R, C)
    idx = jnp.asarray(np.random.randint(0, R, size=(R,)), jnp.int32)

    @jax.jit
    def f(x, idx):
        return x[idx]

    dt = timeit(f, x, idx)
    print(f"xla_row_gather sublane: {R*C/dt/1e6:.1f} M elem/s, {R/dt/1e6:.2f} M rows/s ({dt*1e3:.1f} ms)")


def probe_pallas_minimal():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2

    x = jnp.ones((256, 128), jnp.int32)
    f = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))
    dt = timeit(jax.jit(f), x)
    print(f"pallas_minimal: OK ({dt*1e6:.0f} us)")


def probe_pallas_onehot_gather(B=256, W=2048, steps=256):
    """Per-lane table read y[l] = T[l, idx[l]] via one-hot mul+reduce, in a loop
    with a dependent chain (idx evolves from y) — models the scan."""
    def kernel(t_ref, i_ref, o_ref):
        T = t_ref[:]                       # (B, W) i32
        col = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

        def body(k, idx):
            oh = (col == idx[:, None]).astype(jnp.int32)
            y = jnp.sum(T * oh, axis=1)    # (B,)
            return (idx + y) % W

        idx = jax.lax.fori_loop(0, steps, body, i_ref[:, 0])
        o_ref[:, 0] = idx

    t = jnp.asarray(np.random.randint(0, 7, size=(B, W)), jnp.int32)
    i0 = jnp.asarray(np.random.randint(0, W, size=(B, 1)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32)))
    dt = timeit(f, t, i0)
    print(f"pallas_onehot per-lane table (B={B},W={W}): "
          f"{B*steps/dt/1e6:.1f} M lookups/s ({dt/steps*1e6:.2f} us/step)")


def probe_pallas_factored_shared(B=256, W1=64, W2=32, steps=256):
    """Shared-table factored gather: y[l] = T[hi_l, lo_l] via onehot matmul."""
    def kernel(t_ref, i_ref, o_ref):
        T = t_ref[:].astype(jnp.float32)   # (W1, W2)
        r1 = jax.lax.broadcasted_iota(jnp.int32, (B, W1), 1)
        r2 = jax.lax.broadcasted_iota(jnp.int32, (B, W2), 1)

        def body(k, idx):
            hi, lo = idx // W2, idx % W2
            ohh = (r1 == hi[:, None]).astype(jnp.float32)
            rows = jnp.dot(ohh, T, preferred_element_type=jnp.float32)  # (B, W2)
            ohl = (r2 == lo[:, None]).astype(jnp.float32)
            y = jnp.sum(rows * ohl, axis=1).astype(jnp.int32)
            return (idx + y + 1) % (W1 * W2)

        idx = jax.lax.fori_loop(0, steps, body, i_ref[:, 0])
        o_ref[:, 0] = idx

    t = jnp.asarray(np.random.randint(0, 7, size=(W1, W2)), jnp.int32)
    i0 = jnp.asarray(np.random.randint(0, W1 * W2, size=(B, 1)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32)))
    dt = timeit(f, t, i0)
    print(f"pallas_factored shared table (B={B},{W1}x{W2}): "
          f"{B*steps/dt/1e6:.1f} M lookups/s ({dt/steps*1e6:.2f} us/step)")


def probe_pallas_dyn_ds():
    """Per-lane dynamic minor-dim load — expected to fail or be slow."""
    B, L = 8, 4096

    def kernel(x_ref, i_ref, o_ref):
        def body(l, acc):
            v = x_ref[l, pl.ds(i_ref[l, 0], 1)]
            return acc + jnp.sum(v)
        acc = jax.lax.fori_loop(0, B, body, jnp.int32(0))
        o_ref[0, 0] = acc

    x = jnp.ones((B, L), jnp.int32)
    i0 = jnp.zeros((B, 1), jnp.int32)
    try:
        f = jax.jit(pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32)))
        dt = timeit(f, x, i0)
        print(f"pallas_dyn_ds minor: OK ({dt*1e6:.0f} us)")
    except Exception as e:
        print(f"pallas_dyn_ds minor: FAIL {type(e).__name__}: {str(e)[:200]}")


def probe_pallas_loop_overhead(B=256, steps=4096):
    def kernel(x_ref, o_ref):
        def body(k, v):
            return v * 3 + 1
        o_ref[:] = jax.lax.fori_loop(0, steps, body, x_ref[:])

    x = jnp.ones((B, 128), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32)))
    dt = timeit(f, x)
    print(f"pallas_fori_loop overhead: {dt/steps*1e9:.1f} ns/step ({dt*1e3:.2f} ms total)")


def probe_pallas_dma(B=8, L=65536, n_copies=1024, chunk=128):
    """VMEM->VMEM DMA with dynamic sublane offsets, serial issue+wait."""
    def kernel(x_ref, s_ref, o_ref):
        def inner(sem):
            def body(k, _):
                src = s_ref[k % 64, 0]
                cp = pltpu.make_async_copy(
                    x_ref.at[pl.ds(src, chunk // 128), :],
                    o_ref.at[pl.ds((k * (chunk // 128)) % (L // 128), chunk // 128), :],
                    sem)
                cp.start()
                cp.wait()
                return 0
            jax.lax.fori_loop(0, n_copies, body, 0)
        pl.run_scoped(inner, pltpu.SemaphoreType.DMA)

    x = jnp.ones((L // 128, 128), jnp.uint8)
    s = jnp.asarray(np.random.randint(0, L // 128 - 2, size=(64, 1)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L // 128, 128), jnp.uint8),
        compiler_params=pltpu.CompilerParams(has_side_effects=True)))
    try:
        dt = timeit(f, x, s)
        print(f"pallas_dma {chunk}B copies: {n_copies/dt/1e6:.2f} M copies/s "
              f"({dt/n_copies*1e9:.0f} ns/copy)")
    except Exception as e:
        print(f"pallas_dma: FAIL {type(e).__name__}: {str(e)[:200]}")


PROBES = {
    "xla_gather": probe_xla_gather,
    "xla_row": probe_xla_row_gather,
    "pallas_min": probe_pallas_minimal,
    "onehot": probe_pallas_onehot_gather,
    "factored": probe_pallas_factored_shared,
    "dyn_ds": probe_pallas_dyn_ds,
    "loop": probe_pallas_loop_overhead,
    "dma": probe_pallas_dma,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        try:
            PROBES[n]()
        except Exception as e:
            print(f"{n}: FAIL {type(e).__name__}: {str(e)[:300]}")
