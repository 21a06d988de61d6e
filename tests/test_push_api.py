"""Push-style decode_from_to gates (frame_decoder.rs:436-526 parity):
incremental feeding with arbitrary chunk splits, split checksums, and
re-presented short headers must all resume exactly."""

import random

import zstandard

from zstd_tpu.oracle.decoder import FrameDecoder, decode_from_to


def roundtrip_chunked(data: bytes, chunks) -> bytes:
    z = zstandard.ZstdCompressor(level=6, write_checksum=True).compress(data)
    dec = FrameDecoder()
    out = bytearray(len(data) + 1)
    buf = b""
    pos = 0
    written = 0
    ci = 0
    while pos < len(z) or buf:
        take = chunks[ci % len(chunks)]
        ci += 1
        buf += z[pos:pos + take]
        pos += take
        r, w = decode_from_to(dec, buf, memoryview(out)[written:])
        buf = buf[r:]
        written += w
        if pos >= len(z) and r == 0 and w == 0:
            break
    assert written == len(data)
    return bytes(out[:written])


def test_byte_dribble():
    data = b"push me around " * 400
    assert roundtrip_chunked(data, [1]) == data


def test_awkward_chunks():
    rng = random.Random(3)
    data = bytes(rng.randrange(64, 91) for _ in range(60000)) * 2
    assert roundtrip_chunked(data, [1, 2, 5, 9, 100, 7, 3000, 11]) == data


def test_custom_matcher_roundtrip():
    import io

    from zstd_tpu.encoding.frame_enc import FrameCompressor
    from zstd_tpu.encoding.matcher import Matcher, RawSequence

    class NoMatch(Matcher):
        def find(self, block):
            return [RawSequence(block, 0, 0)]

    data = b"custom matcher " * 1000
    fc = FrameCompressor()
    fc.replace_matcher(NoMatch())
    src, dst = io.BytesIO(data), io.BytesIO()
    fc.set_source(src)
    fc.set_drain(dst)
    fc.compress()
    got = zstandard.ZstdDecompressor().decompress(
        dst.getvalue(), max_output_size=len(data))
    assert got == data
