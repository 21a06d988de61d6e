"""Encoder gates, mirroring the reference's encode-corpus strategy
(/root/reference/ruzstd/src/tests/encode_corpus.rs): compress every corpus
original at Fastest/Uncompressed and verify by decoding with (a) our own
decoder and (b) the real C zstd (`zstandard` binding) — cross-implementation
interop is ground truth. Plus no-expansion property tests on incompressible
data (levels/fastest_tests.rs parity)."""

import glob
import os
import random

import pytest
import zstandard

from tests.conftest import REFERENCE_ROOT, requires_reference
from zstd_tpu.common.config import CompressionLevel
from zstd_tpu.encoding.frame_enc import compress_to_vec
from zstd_tpu.oracle import decode_all

DCTX = zstandard.ZstdDecompressor()


def both_decoders_agree(z: bytes, expected: bytes) -> None:
    assert decode_all(z) == expected
    assert DCTX.decompress(z, max_output_size=max(1, len(expected))) == expected


def test_empty_input():
    z = compress_to_vec(b"", CompressionLevel.FASTEST)
    both_decoders_agree(z, b"")


def test_rle_block():
    data = b"\x07" * 200000  # spans two blocks
    z = compress_to_vec(data, CompressionLevel.FASTEST)
    assert len(z) < 30
    both_decoders_agree(z, data)


def test_no_expansion_on_incompressible():
    # xorshift-style incompressible data (fastest_tests.rs:5-27)
    x = 0x9E3779B97F4A7C15
    out = bytearray()
    for _ in range(50000):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        out.extend(x.to_bytes(8, "little"))
    data = bytes(out)
    z = compress_to_vec(data, CompressionLevel.FASTEST)
    # frame header (6) + per-block header (3 per 128 KiB) + checksum (4)
    overhead = 6 + 3 * ((len(data) + 128 * 1024 - 1) // (128 * 1024)) + 4
    assert len(z) <= len(data) + overhead
    both_decoders_agree(z, data)


@pytest.mark.parametrize("level", [CompressionLevel.UNCOMPRESSED, CompressionLevel.FASTEST])
def test_multiblock_roundtrip(level):
    rng = random.Random(8)
    # 300 KiB of moderately compressible data -> 3 blocks
    data = b"".join(
        bytes([rng.randrange(64) + 32]) * rng.randrange(1, 30)
        for _ in range(30000))
    z = compress_to_vec(data, level)
    both_decoders_agree(z, data)


def test_compresses_structured_data():
    data = b"".join(b"%d,%d,name-%d\n" % (i, i * 31 % 997, i % 100)
                    for i in range(30000))
    z = compress_to_vec(data, CompressionLevel.FASTEST)
    assert len(z) < len(data) // 2
    both_decoders_agree(z, data)


@requires_reference
def test_encode_corpus_roundtrip_fastest():
    files = sorted(glob.glob(os.path.join(
        REFERENCE_ROOT, "decodecorpus_files", "z??????")))
    assert len(files) > 90
    for path in files:
        with open(path, "rb") as f:
            data = f.read()
        z = compress_to_vec(data, CompressionLevel.FASTEST)
        both_decoders_agree(z, data)


@requires_reference
def test_encode_corpus_roundtrip_uncompressed():
    files = sorted(glob.glob(os.path.join(
        REFERENCE_ROOT, "decodecorpus_files", "z??????")))
    for path in files[::5]:
        with open(path, "rb") as f:
            data = f.read()
        z = compress_to_vec(data, CompressionLevel.UNCOMPRESSED)
        both_decoders_agree(z, data)


@pytest.mark.parametrize("n", [0, 1, 255, 256, 65791, 65792, 300_000])
def test_fcs_emission_roundtrip(n):
    """write_content_size emits a minified FCS (RFC 8878 §3.1.1.1.4) that
    libzstd reports back exactly; both native and Python paths agree
    byte-for-byte. An extension over the reference (its compressor never
    writes FCS — frame_compressor.rs:144-151)."""
    import os as _os

    from zstd_tpu.common.config import CodecConfig

    rng = random.Random(n)
    data = bytes(rng.randrange(48, 64) for _ in range(n))
    cfg = CodecConfig(write_content_size=True)
    z = compress_to_vec(data, CompressionLevel.FASTEST, cfg)
    # header carries the exact content size
    assert zstandard.get_frame_parameters(z).content_size == n
    both_decoders_agree(z, data)
    # native and pure-Python emitters byte-identical
    _os.environ["ZT_NO_NATIVE"] = "1"
    try:
        z_py = compress_to_vec(data, CompressionLevel.FASTEST, cfg)
    finally:
        del _os.environ["ZT_NO_NATIVE"]
    assert z_py == z


def test_fcs_streaming_pledge_mismatch_raises():
    import io

    from zstd_tpu.common.errors import EncodeError
    from zstd_tpu.encoding.frame_enc import compress

    with pytest.raises(EncodeError):
        compress(io.BytesIO(b"x" * 100), io.BytesIO(),
                 CompressionLevel.FASTEST, content_size=99)


def test_cross_block_window_matches():
    """Matches reach across 128 KiB block boundaries up to the advertised
    window (beyond the reference's per-slice reach): a second block that
    repeats first-block content must compress to almost nothing, on the
    native one-shot, the streaming, and the batched paths identically."""
    import io
    import random

    import zstandard

    from zstd_tpu.common.config import CodecConfig
    from zstd_tpu.encoding import frame_enc
    from zstd_tpu.models.batch_encoder import BatchEncoder
    from zstd_tpu.oracle import decode_all

    rng = random.Random(11)
    first = bytes(rng.randrange(256) for _ in range(131072))
    data = first + first[:40000]  # block 2 = a copy of block 1's head
    cfg = CodecConfig()

    z = frame_enc.compress_to_vec(data, config=cfg)
    # without cross-block reach block 2 is incompressible (random bytes);
    # with it the copy costs a handful of sequence records
    assert len(z) < 140000, len(z)
    assert zstandard.ZstdDecompressor().decompress(
        bytes(z), max_output_size=len(data)) == data
    assert decode_all(bytes(z)) == data

    # the advertised window shrinks to the content size (<= 256 KiB here)
    wdesc = z[5]
    assert (10 + (wdesc >> 3)) == 18, wdesc

    out = io.BytesIO()
    eff = CodecConfig(**{**cfg.__dict__, "window_log":
                         frame_enc.effective_window_log(
                             len(data), cfg.window_log)})
    frame_enc.compress(io.BytesIO(data), out,
                       frame_enc.CompressionLevel.FASTEST, eff)
    assert out.getvalue() == bytes(z)
    (zb,) = BatchEncoder(cfg).compress_frames([data])
    assert bytes(zb) == bytes(z)
