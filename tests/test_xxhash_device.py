"""Device-side vectorized xxhash64 vs the native host implementation.

The serving-mode integrity check (run_device(pull_outputs=False) +
verify_checksums) hashes outputs on device; this pins its digests to the
host xxh64 used everywhere else (native.cpp zt_xxh64, spec parity with
decode_buffer.rs:241-314's drain-time hashing).
"""

import numpy as np
import pytest

from zstd_tpu.ops.xxhash64 import xxh64_lanes, xxh64_low32_lanes
from zstd_tpu.runtime import xxh64 as _native_xxh64


def _host_xxh64(data: bytes) -> int:
    h = _native_xxh64(data)
    if h is not None:
        return h
    try:
        import xxhash

        return xxhash.xxh64(data).intdigest()
    except ImportError:
        pytest.skip("no host xxh64 oracle available")


def test_xxh64_lanes_matches_host():
    rng = np.random.RandomState(0)
    lengths = [0, 1, 3, 4, 7, 8, 15, 31, 32, 33, 63, 64, 100, 255, 256,
               1000, 4096, 5000]
    W = 5120  # multiple of 32 covering the longest lane
    B = len(lengths)
    data = rng.randint(0, 256, (B, W)).astype(np.uint8)
    got = np.asarray(xxh64_lanes(data, np.array(lengths, np.int32)))
    lo = np.asarray(xxh64_low32_lanes(data, np.array(lengths, np.int32)))
    for i, n in enumerate(lengths):
        exp = _host_xxh64(data[i, :n].tobytes())
        assert int(got[i]) == exp, (i, n, hex(int(got[i])), hex(exp))
        assert int(lo[i]) == exp & 0xFFFFFFFF


def test_xxh64_ignores_padding():
    rng = np.random.RandomState(1)
    a = rng.randint(0, 256, (1, 64)).astype(np.uint8)
    b = a.copy()
    b[0, 40:] = 0  # differ only past length
    n = np.array([40], np.int32)
    assert int(np.asarray(xxh64_lanes(a, n))[0]) == \
        int(np.asarray(xxh64_lanes(b, n))[0])
