"""Validate the device match finder: parse -> reconstruct -> byte-compare.

CPU (interpret mode): python scripts/validate_match_finder.py
TPU:                   add --tpu
"""

import sys
import time

import numpy as np


def main():
    interpret = "--tpu" not in sys.argv
    if interpret:
        from zstd_tpu.utils.platform import force_cpu
        force_cpu(1)
    import jax.numpy as jnp

    from zstd_tpu.utils.platform import enable_compile_cache
    from zstd_tpu.ops.match_finder import parse_blocks, MIN_MATCH

    enable_compile_cache()
    sys.path.insert(0, "/root/repo")
    from bench import make_corpus

    mb = 8 if "--tpu" in sys.argv else 1
    payloads = make_corpus(mb, frame_kb=32 if interpret else 128)
    L = max(len(p) for p in payloads)
    L = -(-L // 128) * 128
    B = len(payloads)
    data = np.zeros((B, L), np.uint8)
    n_valid = np.zeros(B, np.int32)
    for i, p in enumerate(payloads):
        data[i, :len(p)] = np.frombuffer(p, np.uint8)
        n_valid[i] = len(p)

    t0 = time.time()
    ll, ml, of, nseq, anchor = parse_blocks(
        jnp.asarray(data), jnp.asarray(n_valid), interpret=interpret)
    ll, ml, of = map(np.asarray, (ll, ml, of))
    nseq, anchor = np.asarray(nseq), np.asarray(anchor)
    dt = time.time() - t0
    total = int(n_valid.sum())
    print(f"parse {total/1e6:.1f} MB in {dt:.2f}s (incl compile) "
          f"-> {nseq.sum()} seqs")

    fails = 0
    lit_bytes = 0
    matched = 0
    for b in range(B):
        out = bytearray()
        src = data[b].tobytes()
        pos = 0
        for k in range(int(nseq[b])):
            l, m, o = int(ll[b, k]), int(ml[b, k]), int(of[b, k])
            out += src[pos:pos + l]
            pos += l + m
            lit_bytes += l
            matched += m
            if o <= 0 or o > len(out) or m < MIN_MATCH:
                print(f"lane {b} seq {k}: bad (ll={l} ml={m} off={o})")
                fails += 1
                break
            for _ in range(m):
                out.append(out[len(out) - o])
        out += src[int(anchor[b]):int(n_valid[b])]
        lit_bytes += int(n_valid[b]) - int(anchor[b])
        if bytes(out) != payloads[b]:
            mism = next((i for i in range(min(len(out), len(payloads[b])))
                         if out[i] != payloads[b][i]), len(out))
            print(f"lane {b}: MISMATCH at {mism} (got {len(out)} exp "
                  f"{len(payloads[b])})")
            fails += 1
    print(f"literals {lit_bytes/total*100:.1f}%  matched {matched/total*100:.1f}%")
    # steady-state timing
    if "--tpu" in sys.argv:
        import jax
        t0 = time.time()
        for _ in range(3):
            r = parse_blocks(jnp.asarray(data), jnp.asarray(n_valid))
        s = int(jnp.sum(r[3]))
        print(f"steady: {total * 3 / (time.time()-t0) / 1e6:.0f} MB/s")
    print("PASS" if fails == 0 else f"{fails} FAILURES")


if __name__ == "__main__":
    main()
