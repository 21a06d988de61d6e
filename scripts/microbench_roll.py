"""Probe pltpu.roll cost: dynamic vs static shift, by row count.

The exec kernel's fused path spends ~45 ns per dynamic (4,128) roll
(ZSTD_TPU_EXEC_ABLATE=roll delta at 128 MiB). This measures whether the
cost scales with rows and how static shifts compare, to size the packed
exec rewrite.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zstd_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

N = 20000


def make(rows, mode):
    def kernel(x_ref, s_ref, o_ref):
        def body(i, acc):
            sh = (s_ref[0, 0] + i) & 127
            if mode == "dyn":
                r = pltpu.roll(acc, sh, axis=1)
            elif mode == "static":
                r = pltpu.roll(acc, 17, axis=1)
            elif mode == "none":
                r = acc + 1
            return r

        o_ref[...] = jax.lax.fori_loop(0, N, body, x_ref[...])

    @jax.jit
    def run(x, s):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        )(x, s)

    return run


def main():
    s = jnp.ones((1, 1), jnp.int32)
    for rows in (1, 2, 4, 8):
        for mode in ("none", "static", "dyn"):
            x = jnp.ones((rows, 128), jnp.int32)
            run = make(rows, mode)
            r = run(x, s)
            int(jnp.sum(r))
            t0 = time.time()
            for _ in range(4):
                r = run(x, s)
            int(jnp.sum(r))
            dt = (time.time() - t0) / 4 / N
            print(f"rows={rows} {mode:7s}: {dt*1e9:7.2f} ns/iter")


if __name__ == "__main__":
    main()
