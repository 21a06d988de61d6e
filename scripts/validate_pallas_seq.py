"""Validate the Pallas sequence-decode kernel against the XLA scan on real
zstd frames (bench corpus, libzstd-encoded)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from zstd_tpu.utils.platform import enable_compile_cache
from zstd_tpu.models.framer import Framer
from zstd_tpu.ops.sequence import decode_sequence_lanes
from zstd_tpu.ops.pallas_sequence import decode_sequence_lanes_pallas

enable_compile_cache()

sys.path.insert(0, "/root/repo")
from bench import make_corpus  # noqa: E402


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    payloads = make_corpus(mb)
    import zstandard
    comp = zstandard.ZstdCompressor(level=3, write_checksum=False)
    frames = [comp.compress(p) for p in payloads]

    framer = Framer()
    for i, f in enumerate(frames):
        framer.add_frame(f, i)
    b = framer.build()

    live = [i for i in range(b.seq_streams.shape[0] - 1) if b.seq_n[i] > 0]
    # one bucket: pad lanes to 128, common width
    B = 128
    lanes = live[:B]
    if len(lanes) < B:
        lanes += [b.seq_streams.shape[0] - 1] * (B - len(lanes))
    width = int(max(b.seq_len[i] for i in lanes))
    width = -(-width // 4) * 4
    max_seqs = int(max(b.seq_n[i] for i in lanes))
    print(f"{len(live)} seq lanes; bucket B={B} width={width} max_seqs={max_seqs}")

    streams = jnp.asarray(b.seq_streams[lanes][:, :width])
    pos = jnp.asarray(b.seq_pos[lanes])
    n = jnp.asarray(b.seq_n[lanes])
    ll_tid = b.ll_tid[lanes]
    of_tid = b.of_tid[lanes]
    ml_tid = b.ml_tid[lanes]

    args_x = (streams, pos, n, jnp.asarray(ll_tid), jnp.asarray(of_tid),
              jnp.asarray(ml_tid), jnp.asarray(b.ll_tables),
              jnp.asarray(b.of_tables), jnp.asarray(b.ml_tables),
              jnp.asarray(b.ll_logs), jnp.asarray(b.of_logs),
              jnp.asarray(b.ml_logs))
    t0 = time.time()
    ll_x, ml_x, of_x, ok_x = decode_sequence_lanes(*args_x, max_seqs=max_seqs)
    jax.block_until_ready(ll_x)
    t_x_compile = time.time() - t0
    t0 = time.time()
    ll_x, ml_x, of_x, ok_x = decode_sequence_lanes(*args_x, max_seqs=max_seqs)
    jax.block_until_ready(ll_x)
    t_x = time.time() - t0

    args_p = (streams, pos, n,
              jnp.asarray(b.ll_tables[ll_tid]), jnp.asarray(b.of_tables[of_tid]),
              jnp.asarray(b.ml_tables[ml_tid]), jnp.asarray(b.ll_logs[ll_tid]),
              jnp.asarray(b.of_logs[of_tid]), jnp.asarray(b.ml_logs[ml_tid]))
    t0 = time.time()
    ll_p, ml_p, of_p, ok_p = decode_sequence_lanes_pallas(
        *args_p, max_seqs=max_seqs)
    jax.block_until_ready(ll_p)
    t_p_compile = time.time() - t0
    t0 = time.time()
    ll_p, ml_p, of_p, ok_p = decode_sequence_lanes_pallas(
        *args_p, max_seqs=max_seqs)
    jax.block_until_ready(ll_p)
    t_p = time.time() - t0

    nn = np.asarray(n)
    act = np.arange(max_seqs)[None, :] < nn[:, None]
    fails = 0
    for name, a, bq in (("ll", ll_x, ll_p), ("ml", ml_x, ml_p),
                        ("of", of_x, of_p)):
        an, bn = np.asarray(a), np.asarray(bq)
        bad = (an != bn) & act
        if bad.any():
            fails += 1
            lane, i = np.argwhere(bad)[0]
            print(f"{name} MISMATCH lane {lane} seq {i}: xla={an[lane, i]} "
                  f"pallas={bn[lane, i]} (nseq={nn[lane]})")
    okx, okp = np.asarray(ok_x), np.asarray(ok_p)
    if not np.array_equal(okx, okp):
        fails += 1
        print("ok MISMATCH:", np.argwhere(okx != okp)[:5].ravel(),
              okx.sum(), okp.sum())
    tot_seqs = int(nn.sum())
    print(f"xla:    {t_x*1e3:7.1f} ms ({tot_seqs/t_x/1e6:6.2f} M seq/s) "
          f"[compile {t_x_compile:.0f}s]")
    print(f"pallas: {t_p*1e3:7.1f} ms ({tot_seqs/t_p/1e6:6.2f} M seq/s) "
          f"[compile {t_p_compile:.0f}s]")
    print("PASS" if fails == 0 else "FAIL")


if __name__ == "__main__":
    main()
