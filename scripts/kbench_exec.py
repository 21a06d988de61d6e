"""Exec-kernel microbench replaying captured production buckets.

1. Capture real exec-bucket inputs (entropy stages run on device first):
     mkdir -p /tmp/exec_cap
     ZSTD_TPU_CAPTURE_EXEC=/tmp/exec_cap python scripts/kbench_exec.py capture [mb]
2. Replay the kernel in isolation, A/B-ing env knobs:
     ZSTD_TPU_EXEC_MASKED_STORE=1 python scripts/kbench_exec.py /tmp/exec_cap
     ZSTD_TPU_EXEC_ABLATE=roll|load|fused|slow|body ... (cost attribution)
"""

import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from zstd_tpu.utils.platform import enable_compile_cache

enable_compile_cache()


def capture(mb: int):
    import zstandard

    from bench import make_corpus
    from zstd_tpu.models.batch_decoder import BatchDecoder

    payloads = make_corpus(mb)
    comp = zstandard.ZstdCompressor(level=3, write_checksum=False)
    frames = [comp.compress(p) for p in payloads]
    dec = BatchDecoder(verify_checksums=False)
    batch = dec.prepare(frames)
    outputs, out_len, ok = dec.run_device(batch)
    assert all(outputs[i][:len(p)].tobytes() == p
               for i, p in enumerate(payloads[:4]))
    print("captured", len(glob.glob(
        os.path.join(os.environ["ZSTD_TPU_CAPTURE_EXEC"], "*.npz"))),
        "buckets")


def replay(cap_dir: str):
    import jax.numpy as jnp

    from zstd_tpu.models.batch_decoder import _exec_bucket_pallas

    files = sorted(glob.glob(os.path.join(cap_dir, "exec_bucket_*.npz")))
    if not files:
        print("no captures in", cap_dir)
        return
    knobs = {k: os.environ.get(k, "") for k in
             ("ZSTD_TPU_EXEC_MASKED_STORE", "ZSTD_TPU_EXEC_ABLATE",
              "ZSTD_TPU_EXEC_L", "ZSTD_TPU_EXEC_FR", "ZSTD_TPU_EXEC_PRE",
              "ZSTD_TPU_EXEC_SPLIT", "ZSTD_TPU_EXEC_PHASED")}
    print("knobs:", {k: v for k, v in knobs.items() if v})
    total_dt = total_b = total_seq = 0.0
    for f in files:
        z = np.load(f)
        ll, ml, off = (jnp.asarray(z[k]) for k in ("ll", "ml", "off"))
        lit = jnp.asarray(z["lit"])
        olen = jnp.asarray(z["out_len"])
        idx = jnp.arange(ll.shape[0], dtype=jnp.int32)
        w, lw = int(z["w"]), int(z["lw"])
        out, okk = _exec_bucket_pallas(ll, ml, off, lit, olen, idx,
                                       out_width=w, lit_width=lw)
        int(jnp.sum(out.astype(jnp.int32)))  # force (block_until unreliable)
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            out, okk = _exec_bucket_pallas(ll, ml, off, lit, olen, idx,
                                           out_width=w, lit_width=lw)
        int(jnp.sum(out.astype(jnp.int32)))
        dt = (time.time() - t0) / reps
        nb = int(jnp.sum(olen))
        ns = int(jnp.sum(jnp.sum((ll & 0xFFFFFF) + ml > 0, axis=1)))
        total_dt += dt
        total_b += nb
        total_seq += ns
        print(f"{os.path.basename(f)}: B={ll.shape[0]} w={w}: "
              f"{dt*1e3:.1f} ms, {nb/dt/1e9:.3f} GB/s, "
              f"{dt/max(ns,1)*1e9:.0f} ns/seq, ok={int(jnp.sum(okk))}")
    print(f"TOTAL: {total_dt*1e3:.1f} ms, {total_b/total_dt/1e9:.3f} GB/s, "
          f"{total_dt/max(total_seq,1)*1e9:.0f} ns/seq")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "capture":
        assert os.environ.get("ZSTD_TPU_CAPTURE_EXEC"), \
            "set ZSTD_TPU_CAPTURE_EXEC=<dir>"
        capture(int(sys.argv[2]) if len(sys.argv) > 2 else 32)
    else:
        replay(sys.argv[1] if len(sys.argv) > 1 else "/tmp/exec_cap")
