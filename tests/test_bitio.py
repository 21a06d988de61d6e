"""Bit IO unit tests — semi-random access patterns against an integer ground
truth, mirroring the reference's bit-reader tests
(/root/reference/ruzstd/src/tests/bit_reader.rs)."""

import random

import pytest

from zstd_tpu.common.errors import BitstreamError
from zstd_tpu.utils.bitio import BitReader, BitWriter, ReverseBitReader


def test_forward_reader_ground_truth():
    rng = random.Random(42)
    data = bytes(rng.randrange(256) for _ in range(64))
    truth = int.from_bytes(data, "little")
    r = BitReader(data)
    pos = 0
    while pos < 64 * 8:
        n = min(rng.randrange(1, 25), 64 * 8 - pos)
        v = r.get_bits(n)
        assert v == (truth >> pos) & ((1 << n) - 1)
        pos += n
        if rng.random() < 0.2 and pos >= 3:
            r.return_bits(3)
            pos -= 3


def test_reverse_reader_ground_truth():
    rng = random.Random(7)
    data = bytearray(rng.randrange(256) for _ in range(32))
    data[-1] |= 0x80  # padding sentinel at the very top
    truth = int.from_bytes(bytes(data), "little")
    r = ReverseBitReader(bytes(data))
    pos = 32 * 8 - 1  # sentinel consumed
    assert r.bits_remaining() == pos
    while pos > 0:
        n = min(rng.randrange(1, 30), pos)
        v = r.get_bits(n)
        pos -= n
        assert v == (truth >> pos) & ((1 << n) - 1)
    # Phantom zeros past the end, negative bits_remaining
    assert r.get_bits(10) == 0
    assert r.bits_remaining() == -10


def test_reverse_reader_phantom_partial():
    # 1 byte with value 0b1000_0101: sentinel at bit 7 → 7 real bits (0b0000101)
    r = ReverseBitReader(bytes([0x85]))
    assert r.bits_remaining() == 7
    v = r.get_bits(10)  # 7 real bits + 3 phantom zero low bits
    assert v == 0b0000101 << 3
    assert r.bits_remaining() == -3


def test_reverse_reader_rejects_zero_padding():
    with pytest.raises(BitstreamError):
        ReverseBitReader(bytes([0x12, 0x00]))
    with pytest.raises(BitstreamError):
        ReverseBitReader(b"")


def test_bit_writer_roundtrip():
    rng = random.Random(3)
    w = BitWriter()
    writes = []
    for _ in range(200):
        n = rng.randrange(1, 24)
        v = rng.randrange(1 << n)
        writes.append((v, n))
        w.write_bits(v, n)
    pad = (8 - w.index() % 8) % 8
    w.write_bits(0, pad)
    data = w.dump()
    r = BitReader(data)
    for v, n in writes:
        assert r.get_bits(n) == v


def test_bit_writer_change_bits():
    w = BitWriter()
    w.write_bits(0, 16)      # reserve
    w.write_bits(0xAB, 8)
    w.change_bits(0, 0x1234, 16)
    data = w.dump()
    assert data == bytes([0x34, 0x12, 0xAB])
