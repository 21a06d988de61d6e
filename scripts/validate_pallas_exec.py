"""Validate the Pallas LZ77 executor against the XLA executor + numpy oracle.

Builds random sequence lists covering every copy regime (off<128 incl 1,
128..1023, >=1024, pure literals, trailing runs, empty and malformed lanes),
executes with both backends, and byte-compares.
"""

import sys

sys.path.insert(0, "/root/repo")

import time

import numpy as np
import jax
import jax.numpy as jnp

from zstd_tpu.utils.platform import enable_compile_cache
from zstd_tpu.ops.execute import execute_sequences_lanes
from zstd_tpu.ops.pallas_execute import execute_sequences_pallas

enable_compile_cache()


def ref_execute(ll, ml, off, lit):
    out = bytearray()
    lp = 0
    for l, m, o in zip(ll, ml, off):
        out += lit[lp:lp + l]
        lp += l
        for _ in range(m):
            out.append(out[len(out) - o])
    return bytes(out)


def make_lane(rng, n_seqs, out_target, mode):
    ll, ml, off = [], [], []
    produced = 0
    lit_used = 0
    while len(ll) < n_seqs and produced < out_target - 64:
        l = int(rng.integers(0, 40))
        if mode == "small_off":
            o_choices = [1, 2, 3, 5, 17, 64, 127]
        elif mode == "mid_off":
            o_choices = [128, 129, 255, 512, 1023]
        elif mode == "big_off":
            o_choices = [1024, 1025, 4096, 8191]
        else:
            o_choices = [1, 7, 127, 128, 1000, 1024, 5000]
        m = int(rng.integers(3, 80))
        produced += l
        lit_used += l
        pos = produced
        cand = [o for o in o_choices if o <= pos]
        if not cand or m == 0:
            ll.append(l); ml.append(0); off.append(0)
            continue
        o = int(rng.choice(cand))
        ll.append(l); ml.append(m); off.append(o)
        produced += m
    # trailing literals
    t = int(rng.integers(0, 50))
    ll.append(t); ml.append(0); off.append(0)
    lit_used += t
    return ll, ml, off, lit_used


def main():
    rng = np.random.default_rng(0)
    B, S = 8, 256
    out_w = 16384
    lit_w = 8192
    modes = ["small_off", "mid_off", "big_off", "mixed",
             "small_off", "mixed", "empty", "bad"]

    LL = np.zeros((B, S), np.int32)
    ML = np.zeros((B, S), np.int32)
    OF = np.zeros((B, S), np.int32)
    LIT = rng.integers(0, 256, (B, lit_w)).astype(np.uint8)
    out_len = np.zeros(B, np.int32)
    expect = [b""] * B
    expect_ok = [True] * B

    for b, mode in enumerate(modes):
        if mode == "empty":
            continue
        if mode == "bad":
            LL[b, 0], ML[b, 0], OF[b, 0] = 4, 10, 100  # offset beyond output
            out_len[b] = 14
            expect_ok[b] = False
            continue
        ll, ml, off, lu = make_lane(rng, S - 1, out_w - 256, mode)
        n = len(ll)
        LL[b, :n], ML[b, :n], OF[b, :n] = ll, ml, off
        expect[b] = ref_execute(ll, ml, off, LIT[b].tobytes())
        out_len[b] = len(expect[b])

    args = (jnp.asarray(LL), jnp.asarray(ML), jnp.asarray(OF),
            jnp.asarray(LIT), jnp.asarray(out_len))

    t0 = time.time()
    out_p, ok_p = execute_sequences_pallas(*args, out_width=out_w)
    out_p = np.asarray(out_p); ok_p = np.asarray(ok_p)
    print(f"pallas compile+run: {time.time()-t0:.1f}s")

    out_x, ok_x = execute_sequences_lanes(*args, out_width=out_w)
    out_x = np.asarray(out_x); ok_x = np.asarray(ok_x)

    fails = 0
    for b in range(B):
        if not expect_ok[b]:
            status = "ok" if not ok_p[b] else "FAIL (should flag bad)"
            if ok_p[b]: fails += 1
            print(f"lane {b} ({modes[b]}): flagged={not ok_p[b]} -> {status}")
            continue
        got = out_p[b, :out_len[b]].tobytes()
        ok = got == expect[b] and ok_p[b]
        if not ok:
            fails += 1
            mism = next((i for i in range(len(expect[b]))
                         if got[i] != expect[b][i]), -1)
            print(f"lane {b} ({modes[b]}): MISMATCH at byte {mism} "
                  f"(len {out_len[b]}), ok_flag={ok_p[b]}")
        else:
            print(f"lane {b} ({modes[b]}): OK ({out_len[b]} bytes)")
        # XLA executor agreement too
        assert out_x[b, :out_len[b]].tobytes() == expect[b], f"XLA mismatch {b}"

    print("PASS" if fails == 0 else f"{fails} FAILURES")


if __name__ == "__main__":
    main()
