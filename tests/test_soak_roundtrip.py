"""Randomized multi-frame round-trip soak: mixed payload kinds, levels
1-19, explicit window logs, checksums on/off, interleaved skippable frames
— through the host oracle and the batched device pipeline, bit-exact."""

import random

import pytest
import zstandard

from zstd_tpu.models.splitter import decode_all_device
from zstd_tpu.oracle import decode_all

WORDS = ["alpha", "beta", "gamma", "delta", "window", "stream", "entropy"]


def _payload(rng, n, mode):
    if mode == 0:
        return bytes(rng.getrandbits(8) for _ in range(n))
    if mode == 1:
        return (" ".join(rng.choice(WORDS) for _ in range(n // 6))
                ).encode()[:n]
    if mode == 2:
        return (WORDS[0] * max(1, n // 5)).encode()[:n]
    return b"\x00" * n


def _stream(rng):
    parts, pays = [], []
    for _ in range(rng.randint(1, 6)):
        p = _payload(rng, rng.randint(0, 150000), rng.randrange(4))
        pays.append(p)
        wlog = rng.choice([0, 0, 10, 14, 18])
        if wlog:
            params = zstandard.ZstdCompressionParameters.from_level(
                rng.choice([1, 3, 6, 12, 19]), window_log=wlog)
            comp = zstandard.ZstdCompressor(compression_params=params)
        else:
            comp = zstandard.ZstdCompressor(
                level=rng.choice([1, 3, 6, 12, 19]),
                write_checksum=rng.random() < 0.5)
        parts.append(comp.compress(p))
        if rng.random() < 0.3:
            magic = 0x184D2A50 + rng.randrange(16)
            junk = bytes(rng.getrandbits(8)
                         for _ in range(rng.randint(0, 64)))
            parts.append(magic.to_bytes(4, "little")
                         + len(junk).to_bytes(4, "little") + junk)
    return b"".join(parts), b"".join(pays)


def test_soak_host():
    rng = random.Random(31)
    for _ in range(12):
        z, want = _stream(rng)
        assert decode_all(z) == want


@pytest.mark.slow
def test_soak_device():
    rng = random.Random(32)
    for _ in range(8):
        z, want = _stream(rng)
        assert decode_all_device(z) == want


@pytest.mark.slow
def test_soak_encoder_multiblock():
    """OUR encoder's cross-block matcher window under randomized
    multi-block payloads (incl. RLE blocks interleaved between compressed
    ones — the rolling window must advance past them): both directions
    cross-checked against libzstd."""
    from zstd_tpu.common.config import CodecConfig
    from zstd_tpu.encoding.frame_enc import compress_to_vec

    rng = random.Random(33)
    dctx = zstandard.ZstdDecompressor()
    for it in range(8):
        parts = []
        for _ in range(rng.randint(1, 5)):
            mode = rng.randrange(5)
            n = rng.randint(0, 400_000)
            if mode == 4:  # uniform run sized to dominate whole blocks
                parts.append(bytes([rng.getrandbits(8)]) * n)
            else:
                parts.append(_payload(rng, n, mode))
        data = b"".join(parts)
        cfg = CodecConfig(write_checksum=rng.random() < 0.5,
                          write_content_size=rng.random() < 0.5)
        z = bytes(compress_to_vec(data, config=cfg))
        assert dctx.decompress(z, max_output_size=len(data) + 64) == data, it
        assert decode_all(z) == data, it
        if it < 3:  # device pipeline on a few (interpret mode is slow)
            assert decode_all_device(z) == data, it
