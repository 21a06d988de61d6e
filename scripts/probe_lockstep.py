"""Bisect the r3 lockstep windowed-exec corruption on device.

Round 3 probed: multi-lane windowed exec corrupts past ~18 MB total
out-block (Li=2 @ 25.2 MB loses every store past a fixed offset while ok
stays true; Li=2 @ 17.8 MB and Li=1 @ 16.8 MB/lane are exact). This script
generates synthetic fused-path records with numpy-checkable output and
sweeps (Li, W, out_width) to find the exact boundary and its unit (rows vs
bytes vs per-lane vs total), plus structural variants:

  ZSTD_TPU_WEXEC_NOALIAS=1   explicit init copy instead of io-aliasing
                             (tests the input-DMA-race hypothesis)
  ZSTD_TPU_WEXEC_NOCLAMP=1   bypass execute_window_pallas's Li clamp so
                             oversized configs actually run multi-lane

Usage: python scripts/probe_lockstep.py <W_kib> <out_kib> <Li> [slow]
Prints per-lane first-mismatch byte offset (-1 = exact).
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from zstd_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp  # noqa: E402

from zstd_tpu.ops import pallas_execute as PE  # noqa: E402


def make_lane(W, out_w, seed, slow=False):
    rng = np.random.RandomState(seed)
    win = (rng.randint(0, 256, W)).astype(np.uint8)
    if slow:
        # 1024 big records -> n_chunks == 1, slow chunked-copy path
        n = out_w // 4096
        ll = np.full(n, 0, np.int32)
        ml = np.full(n, 4096, np.int32)
        off = W // 2 + 128 * (np.arange(n) % 5)
        lits = np.zeros(0, np.uint8)
    else:
        n = out_w // 128
        ll = np.full(n, 64, np.int32)
        ml = np.full(n, 64, np.int32)
        off = 128 + (np.arange(n) * 997) % (W // 2)
        lits = (rng.randint(0, 256, 64 * n)).astype(np.uint8)

    # numpy oracle
    buf = np.zeros(W + out_w, np.uint8)
    buf[:W] = win
    pos = W
    lp = 0
    for k in range(n):
        l_, m_, o_ = int(ll[k]), int(ml[k]), int(off[k])
        buf[pos:pos + l_] = lits[lp:lp + l_]
        lp += l_
        pos += l_
        s = pos - o_
        if o_ >= m_:
            buf[pos:pos + m_] = buf[s:s + m_]
        else:
            for t in range(m_):
                buf[pos + t] = buf[s + t]
        pos += m_
    return ll, ml, off.astype(np.int32), lits, win, buf[W:]


def main():
    W = int(sys.argv[1]) << 10
    out_w = int(sys.argv[2]) << 10
    Li = int(sys.argv[3])
    slow = len(sys.argv) > 4 and sys.argv[4] == "slow"

    lanes = [make_lane(W, out_w, 7 + j, slow) for j in range(Li)]
    S = max(len(x[0]) for x in lanes)
    lw = max((len(x[3]) for x in lanes), default=0)
    lw = max(lw, 128)
    ll = np.zeros((Li, S), np.int32)
    ml = np.zeros((Li, S), np.int32)
    off = np.zeros((Li, S), np.int32)
    lits = np.zeros((Li, lw), np.uint8)
    win = np.zeros((Li, W), np.uint8)
    for j, (l_, m_, o_, li_, w_, _) in enumerate(lanes):
        ll[j, :len(l_)] = l_
        ml[j, :len(m_)] = m_
        off[j, :len(o_)] = o_
        lits[j, :len(li_)] = li_
        win[j] = w_
    out_len = np.full(Li, out_w, np.int32)
    hist = np.full(Li, W, np.int32)

    rows = PE.window_out_rows(W, out_w)
    print(f"W={W>>10}K out={out_w>>10}K Li={Li} slow={slow} "
          f"block/lane={rows*512>>20}.{(rows*512>>10)%1024}MB "
          f"total={Li*rows*512>>20}MB nseq={S}", flush=True)

    out, ok = PE.execute_window_pallas(
        jnp.asarray(ll), jnp.asarray(ml), jnp.asarray(off),
        jnp.asarray(lits), jnp.asarray(out_len), jnp.asarray(win),
        jnp.asarray(hist), out_width=out_w, window=W, lanes_per_step=Li)
    out_h = np.asarray(out)
    ok_h = np.asarray(ok)
    for j in range(Li):
        exp = lanes[j][5]
        got = out_h[j, :out_w]
        bad = np.nonzero(got != exp)[0]
        first = int(bad[0]) if len(bad) else -1
        print(f"lane {j}: ok={bool(ok_h[j])} first_bad={first} "
              f"nbad={len(bad)}", flush=True)


if __name__ == "__main__":
    main()
