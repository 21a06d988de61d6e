"""Pallas kernel logic tests (interpreter mode — no TPU required).

The real-TPU gates are scripts/validate_pallas_exec.py,
scripts/validate_pallas_seq.py and scripts/corpus_device.py --tpu; these
tests run the same kernels through the Pallas interpreter on tiny shapes so
CPU CI covers the kernel logic (bit reads, table lookups, copy regimes).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zstd_tpu.models.framer import Framer
from zstd_tpu.encoding.frame_enc import compress_to_vec
from zstd_tpu.common.config import CompressionLevel


def _interpret_works():
    try:
        from zstd_tpu.ops.pallas_execute import execute_sequences_pallas

        ll = jnp.asarray(np.array([[3, 2]], np.int32))
        ml = jnp.asarray(np.array([[4, 0]], np.int32))
        of = jnp.asarray(np.array([[2, 0]], np.int32))
        lit = jnp.asarray(np.arange(256, dtype=np.uint8)[None, :])
        out, ok = execute_sequences_pallas(
            ll, ml, of, lit, jnp.asarray(np.array([9], np.int32)),
            out_width=1024, interpret=True)
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _interpret_works(),
    reason="pallas interpreter unavailable on this backend")


def test_pallas_execute_regimes():
    from zstd_tpu.ops.pallas_execute import execute_sequences_pallas

    rng = np.random.default_rng(7)
    cases = [
        [(5, 50, 1)],                      # RLE-ish periodic
        [(10, 30, 7), (3, 40, 13)],        # small offsets
        [(140, 200, 130)],                 # K=1 row chunks
        [(300, 400, 260), (5, 0, 0)],      # mid offset + trailing run
        [(64, 0, 0)],                      # literals only
    ]
    B, S, out_w, lit_w = len(cases), 8, 2048, 1024
    LL = np.zeros((B, S), np.int32)
    ML = np.zeros((B, S), np.int32)
    OF = np.zeros((B, S), np.int32)
    LIT = rng.integers(0, 256, (B, lit_w)).astype(np.uint8)
    out_len = np.zeros(B, np.int32)
    expect = []
    for b, seqs in enumerate(cases):
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

    out, ok = execute_sequences_pallas(
        jnp.asarray(LL), jnp.asarray(ML), jnp.asarray(OF), jnp.asarray(LIT),
        jnp.asarray(out_len), out_width=out_w, interpret=True)
    out = np.asarray(out)
    assert np.asarray(ok).all()
    for b in range(B):
        assert out[b, :out_len[b]].tobytes() == expect[b], f"lane {b}"


def _framed_batch():
    rng = np.random.default_rng(3)
    words = [b"entropy", b"stream", b"zstandard", b"huffman", b"table",
             b"frame", b"block", b"decode", b"offset", b"sequence"]
    payloads = []
    for i in range(4):
        idx = rng.integers(0, len(words), size=3000)
        payloads.append(b" ".join(words[j] for j in idx) + bytes([i]))
    try:
        import zstandard

        comp = zstandard.ZstdCompressor(level=3, write_checksum=False)
        frames = [comp.compress(p) for p in payloads]
    except ImportError:
        frames = [compress_to_vec(p, CompressionLevel.FASTEST)
                  for p in payloads]
    framer = Framer()
    for i, f in enumerate(frames):
        framer.add_frame(f, i)
    return framer.build()


def test_pallas_sequence_matches_xla():
    from zstd_tpu.ops.sequence import decode_sequence_lanes
    from zstd_tpu.ops.pallas_sequence import decode_sequence_lanes_pallas

    b = _framed_batch()
    live = [i for i in range(b.seq_streams.shape[0] - 1) if b.seq_n[i] > 0]
    if not live:
        pytest.skip("no compressed sequence lanes in fixture")
    lanes = (live + [b.seq_streams.shape[0] - 1] * 8)[:8]
    width = -(-int(max(b.seq_len[i] for i in lanes)) // 4) * 4
    max_seqs = int(max(b.seq_n[i] for i in lanes))
    streams = jnp.asarray(b.seq_streams[lanes][:, :width])
    pos = jnp.asarray(b.seq_pos[lanes])
    n = jnp.asarray(b.seq_n[lanes])
    lt, ot, mt = b.ll_tid[lanes], b.of_tid[lanes], b.ml_tid[lanes]

    ll_x, ml_x, of_x, ok_x = decode_sequence_lanes(
        streams, pos, n, jnp.asarray(lt), jnp.asarray(ot), jnp.asarray(mt),
        jnp.asarray(b.ll_tables), jnp.asarray(b.of_tables),
        jnp.asarray(b.ml_tables), jnp.asarray(b.ll_logs),
        jnp.asarray(b.of_logs), jnp.asarray(b.ml_logs), max_seqs)
    ll_p, ml_p, of_p, ok_p = decode_sequence_lanes_pallas(
        streams, pos, n, jnp.asarray(b.ll_tables[lt]),
        jnp.asarray(b.of_tables[ot]), jnp.asarray(b.ml_tables[mt]),
        jnp.asarray(b.ll_logs[lt]), jnp.asarray(b.of_logs[ot]),
        jnp.asarray(b.ml_logs[mt]), max_seqs, interpret=True)

    act = np.arange(max_seqs)[None, :] < np.asarray(n)[:, None]
    for a, c in ((ll_x, ll_p), (ml_x, ml_p), (of_x, of_p)):
        assert (np.asarray(a) == np.asarray(c))[act].all()
    assert np.array_equal(np.asarray(ok_x), np.asarray(ok_p))


def test_pallas_huffman_matches_xla():
    from zstd_tpu.ops.huffman import decode_huffman_lanes
    from zstd_tpu.ops.pallas_huffman import decode_huffman_lanes_pallas

    b = _framed_batch()
    live = [i for i in range(b.huff_streams.shape[0] - 1)
            if b.huff_nsym[i] > 0]
    if not live:
        pytest.skip("no huffman lanes in fixture")
    lanes = (live + [b.huff_streams.shape[0] - 1] * 8)[:8]
    width = -(-int(max(b.huff_len[i] for i in lanes)) // 4) * 4
    max_symbols = int(max(b.huff_nsym[i] for i in lanes))
    streams = jnp.asarray(b.huff_streams[lanes][:, :width])
    pos = jnp.asarray(b.huff_pos[lanes])
    nsym = jnp.asarray(b.huff_nsym[lanes])
    tid = b.huff_tid[lanes]

    lits_x, ok_x = decode_huffman_lanes(
        streams, pos, jnp.asarray(tid), jnp.asarray(b.huff_tables),
        jnp.asarray(b.huff_maxbits), nsym, max_symbols)
    lits_p, ok_p = decode_huffman_lanes_pallas(
        streams, pos, jnp.asarray(b.huff_bnd[tid]),
        jnp.asarray(b.huff_syms[tid]),
        jnp.asarray(b.huff_maxbits[tid]), nsym, max_symbols, interpret=True)

    act = np.arange(max_symbols)[None, :] < np.asarray(nsym)[:, None]
    assert (np.asarray(lits_x) == np.asarray(lits_p))[act].all()
    assert np.array_equal(np.asarray(ok_x), np.asarray(ok_p))


def test_pallas_execute_fused_boundaries():
    """Randomized differential test aimed at the v2 fused-path boundaries:
    off == ll + ml exactly (source touching this sequence's own writes),
    spans at the 3-row store-window edge, off == opm with multi-row literal
    runs (match window below row 0), and off < ll + ml (slow path)."""
    from zstd_tpu.ops.pallas_execute import execute_sequences_pallas

    rng = np.random.default_rng(11)
    B, S, out_w, lit_w = 8, 24, 4096, 2048
    LL = np.zeros((B, S), np.int32)
    ML = np.zeros((B, S), np.int32)
    OF = np.zeros((B, S), np.int32)
    LIT = rng.integers(0, 256, (B, lit_w)).astype(np.uint8)
    out_len = np.zeros(B, np.int32)
    expect = []
    for b in range(B):
        out = bytearray()
        lp = 0
        for i in range(S):
            if rng.random() < 0.2 and lp < lit_w - 300:
                l = int(rng.integers(120, 300))  # multi-row literal run
            else:
                l = int(rng.integers(0, 40))
            l = min(l, lit_w - lp)
            m = int(rng.integers(0, 48)) if (len(out) + l) else 0
            if m:
                hi = len(out) + l
                choice = rng.random()
                if choice < 0.25:
                    o = l + m          # exact fused/slow boundary
                elif choice < 0.45:
                    o = hi             # off == opm (window below row 0)
                elif choice < 0.65:
                    o = int(rng.integers(1, max(2, min(l + m, hi))))  # slow
                else:
                    o = int(rng.integers(1, hi + 1))
                o = min(o, hi)
                if o == 0:
                    m = 0
                    o = 0
            else:
                o = 0
            LL[b, i], ML[b, i], OF[b, i] = l, m, o
            out += LIT[b].tobytes()[lp:lp + l]
            lp += l
            for _ in range(m):
                out.append(out[len(out) - o])
        expect.append(bytes(out))
        out_len[b] = len(out)

    out, ok = execute_sequences_pallas(
        jnp.asarray(LL), jnp.asarray(ML), jnp.asarray(OF), jnp.asarray(LIT),
        jnp.asarray(out_len), out_width=out_w, interpret=True)
    out = np.asarray(out)
    assert np.asarray(ok).all()
    for b in range(B):
        assert out[b, :out_len[b]].tobytes() == expect[b], f"lane {b}"
