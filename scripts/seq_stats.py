"""Sequence-shape statistics over the bench corpus (CPU, no TPU needed).

Sizes the exec-kernel redesign: distribution of spans (ll+ml), fraction of
sequences eligible for the branchless fused path at various window sizes,
and eligibility of K=4 consecutive-sequence tiles (shared store + shared
literal window, all match sources below the tile start).

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/.axon_site \
     python scripts/seq_stats.py [MiB]
"""

import io
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_corpus  # noqa: E402


def collect_sequences(frames):
    """Per-frame RESOLVED (ll, ml, off) lists via the Python oracle."""
    import os

    os.environ["ZT_NO_NATIVE"] = "1"  # force the Python seq path
    import zstd_tpu.oracle.sequences as smod
    from zstd_tpu.oracle.decoder import FrameDecoder
    from zstd_tpu.oracle.sequences import resolve_offset

    all_seqs = []
    dec = FrameDecoder()
    orig = smod.execute_sequences

    for fr in frames:
        seqs = []

        def capture(seq_list, literals, buffer, offset_hist):
            for s in seq_list:
                # resolve_offset mutates the history — call it for EVERY
                # sequence exactly like execute_sequences does
                off = resolve_offset(s.of, s.ll, offset_hist)
                seqs.append((s.ll, s.ml, off if s.ml else 0))
            # replay through the real executor for buffer correctness is
            # unnecessary here; just push bytes so decode continues. But
            # offsets/history were already mutated above, so do a raw push.
            lit_pos = 0
            for (l, m, o) in seqs[-len(seq_list):]:
                if l:
                    buffer.push(literals[lit_pos:lit_pos + l])
                    lit_pos += l
                if m:
                    buffer.repeat(o, m)
            if lit_pos < len(literals):
                buffer.push(literals[lit_pos:])

        smod.execute_sequences = capture
        import zstd_tpu.oracle.decoder as dmod
        dmod.sequences_mod.execute_sequences = capture
        try:
            src = io.BytesIO(fr)
            dec.reset(src)
            dec.decode_blocks(src)
            dec.collect()
        finally:
            smod.execute_sequences = orig
            dmod.sequences_mod.execute_sequences = orig
        all_seqs.append(seqs)
    return all_seqs


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import zstandard

    payloads = make_corpus(mb)
    comp = zstandard.ZstdCompressor(level=3, write_checksum=False)
    frames = [comp.compress(p) for p in payloads]
    per_frame = collect_sequences(frames)

    # NOTE: oracle offsets here are raw pre-repcode values; approximate
    # resolved offsets are fine for shape stats (repcodes resolve to recent
    # offsets of similar magnitude).
    ll = np.array([s[0] for f in per_frame for s in f], np.int64)
    ml = np.array([s[1] for f in per_frame for s in f], np.int64)
    off = np.array([s[2] for f in per_frame for s in f], np.int64)
    run = ll + ml
    n = len(run)
    print(f"sequences: {n}  (frames {len(frames)}, {mb} MiB)")
    print(f"ll   mean {ll.mean():.1f}  p50 {np.percentile(ll,50):.0f}  "
          f"p90 {np.percentile(ll,90):.0f}  p99 {np.percentile(ll,99):.0f}  "
          f"max {ll.max()}")
    print(f"ml   mean {ml.mean():.1f}  p50 {np.percentile(ml,50):.0f}  "
          f"p90 {np.percentile(ml,90):.0f}  p99 {np.percentile(ml,99):.0f}  "
          f"max {ml.max()}")
    print(f"off  mean {off.mean():.1f}  p50 {np.percentile(off,50):.0f}  "
          f"p90 {np.percentile(off,90):.0f}  max {off.max()}  "
          f"<128: {(off[ml>0]<128).mean()*100:.1f}%  "
          f"<32: {(off[ml>0]<32).mean()*100:.1f}%")
    print(f"run  mean {run.mean():.1f}  p50 {np.percentile(run,50):.0f}  "
          f"p90 {np.percentile(run,90):.0f}  p99 {np.percentile(run,99):.0f}")

    # fused eligibility per sequence at various FR (span_max = 128*(FR-1))
    # using per-frame cursor prefix sums
    for FR in (3, 4, 5):
        span_max = 128 * (FR - 1)
        elig = 0
        tile_elig = 0
        tiles = 0
        tile8_elig = [0, 0]
        for f in per_frame:
            if not f:
                continue
            a = np.asarray(f, np.int64)
            fll, fml, foff = a[:, 0], a[:, 1], a[:, 2]
            frun = fll + fml
            op = np.concatenate([[0], np.cumsum(frun)[:-1]])
            fits = ((op & 127) + frun) <= span_max
            disjoint = (fml == 0) | (foff >= frun)
            e = fits & disjoint
            elig += int(e.sum())
            # K-tiles: combined span from op[t0] fits, and every member's
            # match source lies below the tile start
            for ki, K in enumerate((4, 8)):
                nt = len(fll) // K
                if nt:
                    opt = op[: nt * K].reshape(nt, K)
                    runt = frun[: nt * K].reshape(nt, K)
                    offt = foff[: nt * K].reshape(nt, K)
                    mlt = fml[: nt * K].reshape(nt, K)
                    end = opt + runt
                    t0 = opt[:, :1]
                    tfits = ((t0 & 127) + (end[:, -1:] - t0)) <= span_max
                    tdisj = (mlt == 0) | (offt >= (end - t0))
                    te = tfits[:, 0] & tdisj.all(axis=1)
                    if ki == 0:
                        tile_elig += int(te.sum())
                        tiles += nt
                    else:
                        tile8_elig[0] += int(te.sum())
                        tile8_elig[1] += nt
        print(f"FR={FR} span<={span_max}: fused-eligible "
              f"{elig/n*100:.1f}%  | K=4 tiles "
              f"{tile_elig/max(tiles,1)*100:.1f}% of {tiles}"
              f"  | K=8 tiles "
              f"{tile8_elig[0]/max(tile8_elig[1],1)*100:.1f}%")


if __name__ == "__main__":
    main()
