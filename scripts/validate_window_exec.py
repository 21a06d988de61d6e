"""Device gate for the chained/windowed exec path at realistic window sizes.

Round 2's driver bench OOMed scoped VMEM in execute_window_pallas (4 MiB
window, lanes_per_step=2, double-buffered in+out blocks). This gate decodes
multi-MiB frames through BatchDecoder's lockstep chained path on the real
chip — exactly the bench longframe shapes — and checks bit-exactness plus
that no lane fell back to the host.

Round 5 adds the FAR arm: big-window frames (window_log 24-26, real window
past STREAM_WINDOW_CAP) whose matches cross the VMEM-prefix boundary, so the
HBM far-match gather path (pallas_execute far_bytes plumbing) runs on real
Mosaic — the class of kernel that historically only broke on device.

    python scripts/validate_window_exec.py [mb_per_frame] [n_frames]
"""

import sys
import time


def far_arm(dec, bench) -> int:
    """Big-window frames with matches reaching past the VMEM prefix."""
    import zstandard

    from zstd_tpu.models.framer import STREAM_WINDOW_CAP

    fails = 0
    for wlog, mb in ((24, 12), (25, 14)):
        head = b"".join(bench.make_corpus(mb - 3, seed=70 + wlog))
        # re-quote early content from well past the VMEM prefix so real far
        # matches exist, plus a fresh tail so near matches keep flowing
        body = (head + head[: 1 << 20]
                + b"".join(bench.make_corpus(1, seed=80 + wlog))
                + head[(2 << 20):(3 << 20)])
        params = zstandard.ZstdCompressionParameters(
            window_log=wlog, compression_level=3, write_checksum=1)
        cobj = zstandard.ZstdCompressor(
            compression_params=params).compressobj()
        z = cobj.compress(body) + cobj.flush()

        t0 = time.time()
        batch = dec.prepare([z])
        outputs, out_len, ok = dec.run_device(batch)
        dt = time.time() - t0
        m = batch.metas[0]
        r0 = m.rows[0] if m.rows else 0
        good = (bool(ok[r0]) and len(m.rows) > 1 and not m.fallback
                and m.window > STREAM_WINDOW_CAP
                and outputs[r0][: len(body)].tobytes() == body)
        if good:
            print(f"far wlog={wlog} OK ({len(body)} bytes, "
                  f"{len(m.rows)} groups, window={m.window}, {dt:.1f}s)")
        else:
            fails += 1
            print(f"far wlog={wlog} ok={bool(ok[r0])} groups={len(m.rows)} "
                  f"fallback={m.fallback} window={m.window} MISMATCH")
    return fails


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    nf = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import zstandard

    sys.path.insert(0, "/root/repo")
    import bench
    from zstd_tpu.models.batch_decoder import BatchDecoder
    from zstd_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    comp = zstandard.ZstdCompressor(level=3, write_checksum=False)
    datas = [b"".join(bench.make_corpus(mb, seed=100 + i)) for i in range(nf)]
    frames = [comp.compress(d) for d in datas]

    dec = BatchDecoder(verify_checksums=False)
    t0 = time.time()
    batch = dec.prepare(frames)
    outputs, out_len, ok = dec.run_device(batch)
    dt = time.time() - t0

    fails = 0
    for m, d in zip(batch.metas, datas):
        r0 = m.rows[0]
        good = (bool(ok[r0]) and len(m.rows) > 1 and not m.fallback
                and outputs[r0][: len(d)].tobytes() == d)
        if not good:
            fails += 1
            print(f"frame rows={m.rows[:3]}... ok={bool(ok[r0])} "
                  f"groups={len(m.rows)} fallback={m.fallback} MISMATCH")
        else:
            print(f"frame OK ({len(d)} bytes, {len(m.rows)} groups)")
    print(f"{nf}x{mb} MiB in {dt:.1f}s (incl. compile)")
    fails += far_arm(dec, bench)
    print("PASS (0 failures)" if fails == 0 else f"{fails} FAILURES")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
