"""Batch (device-entropy) encoder gates: byte-identical to the host
FrameCompressor at Fastest, and decodable by libzstd + our decoders."""

import random

import zstandard

from zstd_tpu.common.config import CompressionLevel
from zstd_tpu.encoding.frame_enc import compress_to_vec
from zstd_tpu.models.batch_encoder import BatchEncoder


def payload_matrix():
    rng = random.Random(4)
    return [
        b"", b"ab", b"z" * 50000,
        (b"the quick brown fox %d " % 3) * 2000,
        bytes(rng.randrange(256) for _ in range(30000)),
        b"".join(b"%d,%d\n" % (j, j * 31 % 97) for j in range(20000)),
        (b"x" * 64 + bytes(rng.randrange(256) for _ in range(64))) * 600,
    ]


def test_identical_to_host_encoder():
    payloads = payload_matrix()
    outs = BatchEncoder().compress_frames(payloads)
    for i, (p, z) in enumerate(zip(payloads, outs)):
        assert z == compress_to_vec(p, CompressionLevel.FASTEST), f"case {i}"


def test_libzstd_decodes_batch_output():
    payloads = payload_matrix()
    outs = BatchEncoder().compress_frames(payloads)
    dctx = zstandard.ZstdDecompressor()
    for p, z in zip(payloads, outs):
        assert dctx.decompress(z, max_output_size=max(1, len(p))) == p


def test_device_decoder_roundtrip():
    from zstd_tpu.models.splitter import decode_all_device

    payloads = payload_matrix()
    outs = BatchEncoder().compress_frames(payloads)
    for p, z in zip(payloads, outs):
        assert decode_all_device(z) == p
