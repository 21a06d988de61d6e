"""Compression-ratio harness (parity with
/root/reference/ruzstd/examples/compression_ratio.rs): CSV of input size,
compressed size, and average encode time over the zeros / repeated-text /
xorshift fixtures at CompressionLevel.FASTEST.

    python examples/compression_ratio.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zstd_tpu.common.config import CompressionLevel
from zstd_tpu.encoding.frame_enc import compress_to_vec


def xorshift_bytes(n: int) -> bytes:
    x = 0x9E3779B97F4A7C15
    out = bytearray()
    while len(out) < n:
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        out.extend(x.to_bytes(8, "little"))
    return bytes(out[:n])


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    fixtures = {
        "zeros": b"\x00" * 100_000,
        "repeated_text": b"the quick brown fox jumps over the lazy dog. " * 2000,
        "xorshift": xorshift_bytes(100_000),
    }
    print("name,input_bytes,compressed_bytes,ratio,avg_ns")
    for name, data in fixtures.items():
        t0 = time.perf_counter_ns()
        for _ in range(iters):
            z = compress_to_vec(data, CompressionLevel.FASTEST)
        avg = (time.perf_counter_ns() - t0) // iters
        print(f"{name},{len(data)},{len(z)},{len(z) / len(data):.4f},{avg}")


if __name__ == "__main__":
    main()
