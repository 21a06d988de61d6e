"""Focused single-sequence cases for the Pallas executor."""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from zstd_tpu.utils.platform import enable_compile_cache
from zstd_tpu.ops.pallas_execute import execute_sequences_pallas

enable_compile_cache()

rng = np.random.default_rng(1)
B, S, out_w, lit_w = 8, 16, 16384, 8192

cases = [
    ("lit200", [(200, 0, 0)]),
    ("lit5_match_off1", [(5, 50, 1)]),
    ("lit5_match_off3", [(5, 50, 3)]),
    ("lit130_match_off128", [(130, 300, 128)]),
    ("lit2000_match_off1024", [(2000, 3000, 1024)]),
    ("lit300_match_off129_trail7", [(300, 500, 129), (7, 0, 0)]),
    ("two_seqs", [(10, 20, 7), (33, 40, 30), (5, 0, 0)]),
    ("lit_offset_misaligned", [(1, 0, 0), (301, 0, 0), (77, 100, 127)]),
]

LL = np.zeros((B, S), np.int32)
ML = np.zeros((B, S), np.int32)
OF = np.zeros((B, S), np.int32)
LIT = rng.integers(0, 256, (B, lit_w)).astype(np.uint8)
out_len = np.zeros(B, np.int32)
expect = []

for b, (name, seqs) in enumerate(cases):
    out = bytearray()
    lp = 0
    for i, (l, m, o) in enumerate(seqs):
        LL[b, i], ML[b, i], OF[b, i] = l, m, o
        out += LIT[b].tobytes()[lp:lp + l]
        lp += l
        for _ in range(m):
            out.append(out[len(out) - o])
    expect.append(bytes(out))
    out_len[b] = len(out)

out_p, ok_p = execute_sequences_pallas(
    jnp.asarray(LL), jnp.asarray(ML), jnp.asarray(OF), jnp.asarray(LIT),
    jnp.asarray(out_len), out_width=out_w)
out_p = np.asarray(out_p)
ok_p = np.asarray(ok_p)

for b, (name, _) in enumerate(cases):
    got = out_p[b, :out_len[b]].tobytes()
    if got == expect[b] and ok_p[b]:
        print(f"{name}: OK ({out_len[b]} B)")
    else:
        mism = next((i for i in range(len(expect[b])) if got[i] != expect[b][i]), -1)
        ctx = (mism, expect[b][max(0,mism-2):mism+6].hex(), got[max(0,mism-2):mism+6].hex())
        print(f"{name}: MISMATCH at {ctx[0]} exp={ctx[1]} got={ctx[2]} ok={ok_p[b]}")
