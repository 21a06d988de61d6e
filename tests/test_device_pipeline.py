"""Device-pipeline gates on the CPU backend (8 virtual devices).

The full corpus runs in the slow lane (scripts/corpus_device.py — 101/101
bit-exact); here a representative matrix keeps CI fast: every literal mode
(raw/rle/1-stream/4-stream/treeless), every sequence mode (predefined, FSE,
RLE, repeat), RLE/raw blocks, multi-block frames, and fault isolation.
"""

import random

import numpy as np
import pytest
import zstandard

from zstd_tpu.models.batch_decoder import BatchDecoder
from zstd_tpu.models.splitter import decode_all_device, split_frames


def make_payloads():
    rng = random.Random(42)
    return [
        b"",
        b"\x55" * 4000,                                    # RLE block
        b"short",
        (b"the quick brown fox %d " % 7) * 300,            # compressed
        bytes(rng.randrange(256) for _ in range(2000)),    # raw-ish
        b"".join(b"%d,%d\n" % (j, j * 31 % 97) for j in range(3000)),
        (b"x" * 64 + bytes(rng.randrange(256) for _ in range(64))) * 40,
        b"ab" * 10000,                                     # tiny alphabet
    ]


PAYLOADS = make_payloads()


@pytest.fixture(scope="module")
def decoder():
    return BatchDecoder()


@pytest.mark.parametrize("level", [1, 3, 12])
def test_device_decode_matrix(decoder, level):
    comp = zstandard.ZstdCompressor(level=level, write_checksum=True)
    frames = [comp.compress(p) for p in PAYLOADS]
    batch = decoder.prepare(frames)
    outputs, out_len, ok = decoder.run_device(batch)
    for i, p in enumerate(PAYLOADS):
        assert bool(ok[i]), f"lane {i} flagged at level {level}"
        assert int(out_len[i]) == len(p)
        assert outputs[i][:len(p)].tobytes() == p


def test_multiblock_frame_on_device(decoder):
    # >128 KiB forces multiple blocks; repeat/treeless modes appear
    rng = random.Random(1)
    data = b"".join(
        (b"block pattern %d " % (i % 13)) * rng.randrange(5, 30)
        for i in range(3000))
    assert len(data) > 300_000
    z = zstandard.ZstdCompressor(level=6).compress(data)
    got = decode_all_device(z)
    assert got == data


def test_fault_isolation(decoder):
    comp = zstandard.ZstdCompressor(level=3, write_checksum=True)
    frames = [comp.compress(p) for p in PAYLOADS[3:6]]
    corrupt = bytearray(frames[1])
    corrupt[len(corrupt) // 2] ^= 0xA5
    frames[1] = bytes(corrupt)
    results = decoder.decode_frames(frames)
    assert results[0] == PAYLOADS[3]
    assert results[2] == PAYLOADS[5]
    # the corrupted frame either decodes to None or fails checksum -> None
    assert results[1] is None or results[1] != PAYLOADS[4]


def test_multiframe_split_and_decode(decoder):
    comp = zstandard.ZstdCompressor(level=3)
    blob = comp.compress(b"alpha " * 500) + comp.compress(b"beta " * 700)
    skippable = (0x184D2A53).to_bytes(4, "little") + (3).to_bytes(4, "little") + b"xyz"
    blob = blob + skippable + comp.compress(b"gamma " * 900)
    frames = split_frames(blob)
    assert len(frames) == 3
    got = decode_all_device(blob, decoder)
    assert got == b"alpha " * 500 + b"beta " * 700 + b"gamma " * 900


def test_our_encoder_frames_on_device(decoder):
    from zstd_tpu.common.config import CompressionLevel
    from zstd_tpu.encoding.frame_enc import compress_to_vec

    for p in PAYLOADS:
        z = compress_to_vec(p, CompressionLevel.FASTEST)
        assert decode_all_device(z, decoder) == p


@pytest.mark.slow
def test_sharded_dryrun_4dev():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


def test_zero_length_rle_block(decoder):
    """RLE block with size 0 emits nothing (its byte is still consumed).

    Regression: the framer used to push the RLE byte into the literal
    stream with a (ll=1, ml=-1) retraction record, which both executors
    mis-handled (decodecorpus z000001/13/36/63/64/76/77).
    """
    frame = bytes.fromhex(
        "28b52ffd"   # magic
        "00"         # frame header descriptor: no flags
        "00"         # window descriptor
        "020000" "41"  # RLE block, size 0, not last; RLE byte 0x41
        "110000" + b"hi".hex()  # raw last block "hi"
    )
    from zstd_tpu.oracle import decode_all

    assert decode_all(frame) == b"hi"
    batch = decoder.prepare([frame])
    outs, out_len, ok = decoder.run_device(batch)
    assert bool(ok[0]) and outs[0][:out_len[0]].tobytes() == b"hi"


def test_decode_frames_pipelined_matches_sequential(decoder):
    """The pipelined serving loop (prepare k+1 overlapping device k) yields
    exactly the sequential results, including fallback lanes, across
    batches of different shapes."""
    import zstandard

    comp = zstandard.ZstdCompressor(level=3, write_checksum=True)
    batches = [
        [comp.compress(b"batch0 frame %d " % i * (20 + i)) for i in range(7)],
        [comp.compress(b"x" * 5000), b"\x00bad frame\xff" * 3,
         comp.compress(b"batch1 " * 999)],
        [comp.compress(bytes(range(256)) * 300)],
    ]
    want = [decoder.decode_frames(fs) for fs in batches]
    got = list(decoder.decode_frames_pipelined(iter(batches)))
    assert got == want
    assert got[1][1] is None  # the malformed lane stays poisoned
