"""Serving-mode (pull_outputs=False) device-side checksum verification.

Before round 4, run_device(pull_outputs=False) skipped checksum
verification entirely (only _postprocess hashed pulled bytes) — the
reference hashes on every drain (decode_buffer.rs:241-314). These pin the
device xxh64 fold-into-ok behavior.
"""

import numpy as np
import pytest

zstandard = pytest.importorskip("zstandard")

from zstd_tpu.models.batch_decoder import BatchDecoder


def _frames(n=6, kb=16, checksum=True):
    rng = np.random.RandomState(42)
    payloads = [(b"serving mode %d " % i) * (kb * 64) +
                rng.randint(0, 256, 64).astype(np.uint8).tobytes()
                for i in range(n)]
    comp = zstandard.ZstdCompressor(level=3, write_checksum=checksum)
    return payloads, [comp.compress(p) for p in payloads]


def test_device_checksum_ok():
    payloads, frames = _frames()
    dec = BatchDecoder(verify_checksums=True)
    batch = dec.prepare(frames)
    outputs, out_len, ok = dec.run_device(batch, pull_outputs=False)
    assert all(bool(ok[m.rows[0]]) for m in batch.metas)


def test_device_checksum_detects_corruption():
    payloads, frames = _frames()
    # flip a bit in frame 2's stored checksum (the last 4 bytes): content
    # still decodes, the hash no longer matches
    bad = bytearray(frames[2])
    bad[-2] ^= 0x40
    frames = list(frames)
    frames[2] = bytes(bad)
    dec = BatchDecoder(verify_checksums=True)
    batch = dec.prepare(frames)
    outputs, out_len, ok = dec.run_device(batch, pull_outputs=False)
    flags = [bool(ok[m.rows[0]]) for m in batch.metas]
    assert flags[2] is False
    assert all(f for i, f in enumerate(flags) if i != 2)


def test_device_checksum_skipped_when_disabled():
    payloads, frames = _frames()
    bad = bytearray(frames[1])
    bad[-1] ^= 0x01
    frames = list(frames)
    frames[1] = bytes(bad)
    dec = BatchDecoder(verify_checksums=False)
    batch = dec.prepare(frames)
    outputs, out_len, ok = dec.run_device(batch, pull_outputs=False)
    assert all(bool(ok[m.rows[0]]) for m in batch.metas)
