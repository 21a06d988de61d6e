"""xxHash64 vectors + agreement with libzstd's frame checksums."""

import random

import zstandard

from zstd_tpu.oracle import decode_all
from zstd_tpu.utils.xxhash64 import Xxh64, xxhash64


def test_known_vectors():
    # Canonical xxh64 (seed 0) vectors.
    assert xxhash64(b"") == 0xEF46DB3751D8E999
    assert xxhash64(b"\x00") == 0xE934A84ADB052768


def test_streaming_matches_oneshot():
    rng = random.Random(11)
    data = bytes(rng.randrange(256) for _ in range(100_001))
    for chunks in ([data], [data[:1], data[1:]], [data[i:i + 977] for i in range(0, len(data), 977)]):
        h = Xxh64()
        for c in chunks:
            h.update(c)
        assert h.digest() == xxhash64(data)


def test_matches_libzstd_frame_checksum():
    # The checksum verification inside decode_all is the assertion: libzstd
    # wrote the frame checksum with its own xxh64.
    rng = random.Random(12)
    for n in (0, 1, 3, 31, 32, 33, 1000, 65537):
        data = bytes(rng.randrange(256) for _ in range(n))
        z = zstandard.ZstdCompressor(write_checksum=True).compress(data)
        assert decode_all(z) == data  # raises ChecksumMismatch if xxh64 differs
