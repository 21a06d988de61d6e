"""Device match finder gates (CPU backend / interpreter mode).

Parity target: the reference's matcher contract (sequences reconstruct the
block exactly, offsets within the window, min match length respected) —
match_generator.rs:400-619's reconstruction tests transposed to ours.
The TPU-speed gate runs in scripts/validate_match_finder.py --tpu.
"""

import numpy as np
import pytest
import zstandard

import jax.numpy as jnp

from zstd_tpu.ops.match_finder import MIN_MATCH, find_candidates


def test_find_candidates_basic():
    data = (b"abcdefgh" * 4 + b"XYZ" + b"abcdefgh" * 4).ljust(128, b".")
    arr = jnp.asarray(np.frombuffer(data, np.uint8)[None, :])
    cand, lcp = find_candidates(arr, jnp.asarray(np.array([len(data)],
                                                          np.int32)))
    cand, lcp = np.asarray(cand)[0], np.asarray(lcp)[0]
    # position of the second "abcdefgh..." run must point at an earlier copy
    second = 8 * 4 + 3
    assert cand[second] >= 0 and lcp[second] >= MIN_MATCH
    assert data[cand[second]:cand[second] + 5] == data[second:second + 5]


def _interpret_ok():
    try:
        from zstd_tpu.ops.match_finder import parse_blocks

        d = jnp.asarray(np.zeros((1, 1024), np.uint8))
        parse_blocks(d, jnp.asarray(np.array([64], np.int32)),
                     interpret=True)
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _interpret_ok(),
                    reason="pallas interpreter unavailable")
def test_parse_reconstructs():
    from zstd_tpu.ops.match_finder import parse_blocks

    rng = np.random.default_rng(11)
    words = [b"alpha", b"beta", b"gamma", b"delta", b"epsilon"]
    payloads = [
        b" ".join(words[i] for i in rng.integers(0, 5, 400)),
        bytes(rng.integers(0, 256, 1500).astype(np.uint8)),  # incompressible
        b"\x07" * 2000,                                      # RLE-ish
        b"ab" * 1000,
    ]
    L = -(-max(len(p) for p in payloads) // 128) * 128
    B = len(payloads)
    data = np.zeros((B, L), np.uint8)
    nv = np.zeros(B, np.int32)
    for i, p in enumerate(payloads):
        data[i, :len(p)] = np.frombuffer(p, np.uint8)
        nv[i] = len(p)
    ll, ml, of, nseq, anchor = parse_blocks(
        jnp.asarray(data), jnp.asarray(nv), interpret=True)
    ll, ml, of = map(np.asarray, (ll, ml, of))
    nseq, anchor = np.asarray(nseq), np.asarray(anchor)
    for b, p in enumerate(payloads):
        out = bytearray()
        pos = 0
        for k in range(int(nseq[b])):
            l, m, o = int(ll[b, k]), int(ml[b, k]), int(of[b, k])
            assert m >= MIN_MATCH and 0 < o <= pos + l
            out += p[pos:pos + l]
            pos += l + m
            for _ in range(m):
                out.append(out[len(out) - o])
        out += p[int(anchor[b]):]
        assert bytes(out) == p, f"lane {b}"


@pytest.mark.skipif(not _interpret_ok(),
                    reason="pallas interpreter unavailable")
def test_device_matched_encode_interop():
    from zstd_tpu.encoding.device_matcher import DeviceMatcher
    from zstd_tpu.models.batch_encoder import BatchEncoder
    from zstd_tpu.oracle import decode_all

    rng = np.random.default_rng(12)
    words = [b"the", b"of", b"compression", b"entropy", b"frame"]
    payloads = [
        b" ".join(words[i] for i in rng.integers(0, 5, 2000)),
        bytes(rng.integers(0, 256, 4096).astype(np.uint8)),
        b"",
        b"xy",
    ]
    enc = BatchEncoder(matcher=DeviceMatcher(interpret=True))
    frames = enc.compress_frames(payloads)
    dec = zstandard.ZstdDecompressor()
    for f, p in zip(frames, payloads):
        assert decode_all(f) == p
        assert dec.decompress(f, max_output_size=len(p) * 2 + 64) == p
    # size sanity: compressible text must actually compress
    assert len(frames[0]) < len(payloads[0]) // 2
