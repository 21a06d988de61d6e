"""Slow-lane gate: decode the full reference corpus through the device
pipeline and compare bit-exact. Run manually / per round:

    python scripts/corpus_device.py          # CPU backend
    python scripts/corpus_device.py --tpu    # default (axon) backend

Last full run: 101 files -> 101 frames, 101/101 device-ok (Pallas kernels,
no fallbacks), 0 failures; dict corpus 207/207 on-device (see test_device_dict).
"""

import glob
import sys

sys.path.insert(0, "/root/repo")
import time


def main():
    if "--tpu" not in sys.argv:
        from zstd_tpu.utils.platform import force_cpu
        force_cpu()
    import numpy as np

    from zstd_tpu.models.batch_decoder import BatchDecoder
    from zstd_tpu.models.splitter import split_frames

    d = "/root/reference/ruzstd/decodecorpus_files"
    zfiles = sorted(glob.glob(d + "/*.zst"))
    all_frames, file_spans, expected = [], [], []
    for zf in zfiles:
        frames = split_frames(open(zf, "rb").read())
        file_spans.append((len(all_frames), len(frames)))
        all_frames.extend(frames)
        expected.append(open(zf[:-4], "rb").read())

    dec = BatchDecoder()
    t0 = time.time()
    res = dec.decode_frames(all_frames)
    print(f"{len(all_frames)} frames decoded in {time.time() - t0:.1f}s")

    batch = dec.prepare(all_frames)
    _, _, ok = dec.run_device(batch)
    # ok is per batch ROW; a chained frame is ok iff its first row is
    n_ok = sum(1 for m in batch.metas
               if m.rows and bool(ok[m.rows[0]]))
    n_chained = sum(1 for m in batch.metas if len(m.rows) > 1)
    print(f"device-ok: {n_ok} / {len(all_frames)} "
          f"({n_chained} chained)")

    fails = 0
    for fi, (start, n) in enumerate(file_spans):
        parts = res[start:start + n]
        got = b"".join(parts) if all(r is not None for r in parts) else b"<FAIL>"
        if got != expected[fi]:
            fails += 1
            print("FILE MISMATCH", zfiles[fi])
    print(f"{len(zfiles)} files: {fails} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
