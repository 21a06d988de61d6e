"""Mutation fuzzing beyond the checked-in artifacts: random corruptions of
valid frames must decode correctly, return None (poisoned lane), or raise a
typed ZstdError — never an untyped exception — on the host oracle, the
native hot path, and the batched device pipeline (Readme.md:127-147
philosophy; fuzz_targets/decode.rs analog)."""

import random

import pytest
import zstandard

from zstd_tpu.common.errors import ZstdError
from zstd_tpu.oracle import decode_all


def _mutants(rng, n_frames=6, n_mut=40):
    words = ["frame", "entropy", "zstandard", "mutation", "window", "block"]
    frames = []
    for i in range(n_frames):
        data = (" ".join(rng.choice(words) for _ in range(2000 + i * 500))
                ).encode()
        lvl = rng.choice([1, 3, 6, 19])
        frames.append(zstandard.ZstdCompressor(
            level=lvl, write_checksum=bool(i % 2)).compress(data))
    out = []
    for _ in range(n_mut):
        z = bytearray(rng.choice(frames))
        kind = rng.random()
        if kind < 0.4:      # byte flips
            for _ in range(rng.randint(1, 8)):
                z[rng.randrange(len(z))] ^= rng.randrange(1, 256)
        elif kind < 0.6:    # truncation
            z = z[:rng.randrange(1, len(z))]
        elif kind < 0.8:    # random insertion
            at = rng.randrange(len(z))
            z[at:at] = bytes(rng.randrange(256)
                             for _ in range(rng.randint(1, 16)))
        else:               # splice two frames
            other = rng.choice(frames)
            cut = rng.randrange(1, len(z))
            z = z[:cut] + other[rng.randrange(len(other)):]
        out.append(bytes(z))
    return out


def test_mutation_fuzz_host(monkeypatch):
    rng = random.Random(1234)
    for z in _mutants(rng):
        for env in (None, "1"):
            if env is None:
                monkeypatch.delenv("ZT_NO_NATIVE", raising=False)
            else:
                monkeypatch.setenv("ZT_NO_NATIVE", env)
            try:
                decode_all(z)
            except ZstdError:
                pass


def test_mutation_fuzz_native_matches_python(monkeypatch):
    """Both host paths must agree: same bytes out, or both reject."""
    rng = random.Random(77)
    for z in _mutants(rng, n_mut=25):
        monkeypatch.delenv("ZT_NO_NATIVE", raising=False)
        try:
            a = decode_all(z)
        except ZstdError:
            a = ZstdError
        monkeypatch.setenv("ZT_NO_NATIVE", "1")
        try:
            b = decode_all(z)
        except ZstdError:
            b = ZstdError
        if a is ZstdError or b is ZstdError:
            assert a is b, "one path rejected, the other accepted"
        else:
            assert a == b


def test_mutation_fuzz_device_pipeline():
    from zstd_tpu.models.batch_decoder import BatchDecoder

    rng = random.Random(99)
    frames = _mutants(rng, n_mut=24)
    results = BatchDecoder().decode_frames(frames)
    # every result is bytes or None; cross-check each against the oracle
    for z, got in zip(frames, results):
        try:
            want = decode_all(z)
        except ZstdError:
            want = None
        assert got == want
