"""Native whole-frame/block compressor parity.

The C compressor (runtime/native.cpp zt_compress_frame / zt_compress_block2)
must be byte-identical to the Python frame path (frame_enc.py), which is
itself pinned against the pure-Python path by test_native_parity.py.
Reference behavior: frame_compressor.rs:38-276, blocks/compressed.rs:26-377.
"""

import io
import os
import random

import pytest

from zstd_tpu.common.config import CodecConfig, CompressionLevel
from zstd_tpu.encoding import frame_enc
from zstd_tpu.oracle.decoder import decode_all_to_vec
from zstd_tpu.runtime import compress_frame, get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")


def _python_frame(data: bytes, level, cfg) -> bytes:
    """The frame built by the Python block loop (native subroutines allowed
    — they are parity-pinned separately)."""
    fc = frame_enc.FrameCompressor(
        CodecConfig(**{**cfg.__dict__, "level": level}))
    fc.set_source(io.BytesIO(data))
    out = io.BytesIO()
    fc.set_drain(out)
    os.environ["ZT_NO_NATIVE"] = "1"  # forces the Python _write_block branch
    try:
        fc.compress()
    finally:
        del os.environ["ZT_NO_NATIVE"]
    return out.getvalue()


def _samples():
    rng = random.Random(7)
    yield b""
    yield b"x"
    yield b"ab" * 9
    yield bytes([rng.randrange(256) for _ in range(200)])
    yield b"the quick brown fox " * 4000          # compressible, 1 block
    yield open("/root/repo/SURVEY.md", "rb").read() * 10   # multi-block text
    yield bytes(rng.randrange(256) for _ in range(200_000))  # incompressible
    yield b"\x00" * 150_000                        # RLE blocks
    data = open("/root/repo/README.md", "rb").read()
    yield (data + bytes(rng.randrange(256) for _ in range(1000))) * 60


@pytest.mark.parametrize("level", [CompressionLevel.UNCOMPRESSED,
                                   CompressionLevel.FASTEST])
def test_frame_parity_and_roundtrip(level):
    cfg = CodecConfig()
    lvl = 1 if level == CompressionLevel.FASTEST else 0
    for data in _samples():
        py = _python_frame(data, level, cfg)
        nat = compress_frame(data, cfg.window_log, cfg.write_checksum, lvl)
        assert nat == py, f"native/python frame mismatch len={len(data)}"
        assert decode_all_to_vec(nat) == data


def test_streaming_block_path_matches_oneshot():
    data = open("/root/repo/VERDICT.md", "rb").read() * 40
    # the one-shot path shrinks the advertised window to the (known)
    # content size; hand the streaming side the same effective config so
    # the comparison pins the block path, not the size knowledge
    base = CodecConfig()
    cfg = CodecConfig(**{**base.__dict__, "window_log":
                         frame_enc.effective_window_log(
                             len(data), base.window_log)})
    out = io.BytesIO()
    frame_enc.compress(io.BytesIO(data), out, CompressionLevel.FASTEST, cfg)
    oneshot = frame_enc.compress_to_vec(data, CompressionLevel.FASTEST, cfg)
    assert out.getvalue() == oneshot


def test_compress_to_vec_uses_native_and_matches_python():
    cfg = CodecConfig()
    data = open("/root/repo/ROADMAP.md", "rb").read() * 30
    nat = frame_enc.compress_to_vec(data, CompressionLevel.FASTEST, cfg)
    os.environ["ZT_NO_NATIVE"] = "1"
    try:
        py = frame_enc.compress_to_vec(data, CompressionLevel.FASTEST, cfg)
    finally:
        del os.environ["ZT_NO_NATIVE"]
    assert nat == py
