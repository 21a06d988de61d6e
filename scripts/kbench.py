"""Kernel microbench: huffman/sequence Pallas kernels at configurable lane
counts over real bench-corpus lanes.

Usage: python scripts/kbench.py [huff|seq|both] [B ...]
Builds one bucket of B lanes (real streams cycled to fill), times the kernel
amortized over repeat calls, prints M sym/s / M seq/s per B.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from zstd_tpu.utils.platform import enable_compile_cache
from zstd_tpu.models.framer import Framer

enable_compile_cache()

from bench import make_corpus  # noqa: E402


def build(mb=8):
    payloads = make_corpus(mb)
    import zstandard

    comp = zstandard.ZstdCompressor(level=3, write_checksum=False)
    frames = [comp.compress(p) for p in payloads]
    framer = Framer()
    for i, f in enumerate(frames):
        framer.add_frame(f, i)
    return framer.build()


def cyc(idx, B):
    return [idx[i % len(idx)] for i in range(B)]


def bench_call(fn, sync, reps=6):
    fn()
    # block_until_ready does not reliably wait on this backend (PERF.md):
    # force a scalar readback so warmup compile never leaks into the timing
    int(jnp.sum(sync()))
    t0 = time.time()
    for _ in range(reps):
        fn()
    s = int(jnp.sum(sync()))  # force real completion (see PERF.md)
    dt = (time.time() - t0) / reps
    return dt, s


def bench_huff(b, Bs):
    from zstd_tpu.ops.pallas_huffman import decode_huffman_lanes_pallas

    live = [i for i in range(b.huff_streams.shape[0] - 1)
            if b.huff_nsym[i] > 0]
    for B in Bs:
        lanes = cyc(live, B)
        width = -(-int(max(b.huff_len[i] for i in lanes)) // 4) * 4
        msym = int(max(b.huff_nsym[i] for i in lanes))
        msym = -(-msym // 512) * 512
        streams = jnp.asarray(b.huff_streams[lanes][:, :width])
        pos = jnp.asarray(b.huff_pos[lanes])
        tid = b.huff_tid[lanes]
        args = (streams, pos, jnp.asarray(b.huff_bnd[tid]),
                jnp.asarray(b.huff_syms[tid]),
                jnp.asarray(b.huff_maxbits[tid]),
                jnp.asarray(b.huff_nsym[lanes]))
        out = {}

        def fn():
            out["r"] = decode_huffman_lanes_pallas(*args, max_symbols=msym)

        dt, _ = bench_call(fn, lambda: out["r"][0])
        tot = int(np.sum(b.huff_nsym[lanes]))
        print(f"huff B={B:5d} w={width:6d} S={msym:5d}: {dt*1e3:7.2f} ms "
              f"{tot/dt/1e6:7.1f} M sym/s")


def bench_seq(b, Bs):
    from zstd_tpu.ops.pallas_sequence import decode_sequence_lanes_pallas

    live = [i for i in range(b.seq_streams.shape[0] - 1) if b.seq_n[i] > 0]
    for B in Bs:
        lanes = cyc(live, B)
        width = -(-int(max(b.seq_len[i] for i in lanes)) // 4) * 4
        mseq = int(max(b.seq_n[i] for i in lanes))
        mseq = -(-mseq // 512) * 512
        streams = jnp.asarray(b.seq_streams[lanes][:, :width])
        pos = jnp.asarray(b.seq_pos[lanes])
        n = jnp.asarray(b.seq_n[lanes])
        ll_tid, of_tid, ml_tid = (b.ll_tid[lanes], b.of_tid[lanes],
                                  b.ml_tid[lanes])
        args = (streams, pos, n, jnp.asarray(b.ll_tables[ll_tid]),
                jnp.asarray(b.of_tables[of_tid]),
                jnp.asarray(b.ml_tables[ml_tid]),
                jnp.asarray(b.ll_logs[ll_tid]),
                jnp.asarray(b.of_logs[of_tid]),
                jnp.asarray(b.ml_logs[ml_tid]))
        out = {}

        def fn():
            out["r"] = decode_sequence_lanes_pallas(*args, max_seqs=mseq)

        dt, _ = bench_call(fn, lambda: out["r"][0])
        tot = int(np.sum(b.seq_n[lanes]))
        print(f"seq  B={B:5d} w={width:6d} S={mseq:5d}: {dt*1e3:7.2f} ms "
              f"{tot/dt/1e6:7.1f} M seq/s")


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    Bs = [int(x) for x in sys.argv[2:]] or [256, 512, 1024]
    b = build()
    if what in ("huff", "both"):
        bench_huff(b, Bs)
    if what in ("seq", "both"):
        bench_seq(b, Bs)


if __name__ == "__main__":
    main()
