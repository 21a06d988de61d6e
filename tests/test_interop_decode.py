"""Cross-implementation interop: libzstd (via the `zstandard` binding) is the
encode-side ground truth — everything it produces must decode bit-exact,
across levels, window logs, checksums, multi-frame concatenation, skippable
frames, and streaming. Mirrors the reference's use of the C zstd crate as dev
dependency (/root/reference/ruzstd/src/tests/encode_corpus.rs)."""

import io
import os
import random

import pytest
import zstandard

from zstd_tpu.common.errors import ChecksumMismatch, ZstdError
from zstd_tpu.oracle import StreamingDecoder, decode_all, decode_frame


def make_cases():
    rng = random.Random(1234)
    cases = {
        "empty": b"",
        "tiny": b"abc",
        "rle": b"\x42" * 70000,
        "text": b"the quick brown fox jumps over the lazy dog. " * 4000,
        "random": bytes(rng.randrange(256) for _ in range(65536)),
        "structured": b"".join(
            b"%d,%d,name-%d\n" % (i, i * 31 % 997, i % 100) for i in range(20000)),
        "binaryish": bytes((i * 7 + (i >> 8)) % 256 for i in range(300000)),
    }
    return cases


CASES = make_cases()


@pytest.mark.parametrize("level", [1, 3, 9, 19])
@pytest.mark.parametrize("name", list(CASES))
def test_libzstd_decode_bit_exact(level, name):
    data = CASES[name]
    z = zstandard.ZstdCompressor(level=level, write_checksum=True).compress(data)
    assert decode_all(z) == data


def test_multiframe_and_skippable():
    c = zstandard.ZstdCompressor(level=3, write_checksum=True)
    z1 = c.compress(b"first frame")
    z2 = c.compress(b" second frame")
    skippable = (0x184D2A50).to_bytes(4, "little") + (7).to_bytes(4, "little") + b"ignored"
    assert decode_all(z1 + skippable + z2) == b"first frame second frame"


def test_streaming_decoder_chunked_reads():
    data = CASES["text"]
    z = zstandard.ZstdCompressor(level=5, write_checksum=True).compress(data)
    dec = StreamingDecoder(io.BytesIO(z))
    out = bytearray()
    while True:
        chunk = dec.read(777)
        if not chunk:
            break
        out.extend(chunk)
    assert bytes(out) == data


def test_checksum_mismatch_detected():
    z = bytearray(zstandard.ZstdCompressor(write_checksum=True).compress(b"payload data here"))
    z[-1] ^= 0xFF  # corrupt the stored checksum
    with pytest.raises(ChecksumMismatch):
        decode_all(bytes(z))


def test_truncated_input_rejected():
    z = zstandard.ZstdCompressor(level=3).compress(CASES["text"])
    for cut in (3, 5, 10, len(z) // 2, len(z) - 1):
        with pytest.raises(ZstdError):
            decode_all(z[:cut])


def test_garbage_rejected():
    rng = random.Random(99)
    for n in (1, 4, 16, 1024):
        blob = bytes(rng.randrange(256) for _ in range(n))
        try:
            decode_all(blob)
        except ZstdError:
            pass


def test_window_limit_enforced():
    from zstd_tpu.common.config import CodecConfig
    from zstd_tpu.common.errors import WindowSizeError

    data = os.urandom(1024)
    z = zstandard.ZstdCompressor(level=3).compress(data)
    cfg = CodecConfig(max_window_size=16)
    with pytest.raises((WindowSizeError, ZstdError)):
        # single-segment frames carry no window descriptor; force one via params
        params = zstandard.ZstdCompressionParameters(window_log=22, force_max_window=True)
        z2 = zstandard.ZstdCompressor(compression_params=params).compress(data)
        decode_frame(z2, cfg)


def test_long_distance_matching_frame():
    # windowed multi-block frame with matches spanning blocks
    base = os.urandom(200000)
    data = base + b"X" * 1000 + base  # long-range duplicate
    params = zstandard.ZstdCompressionParameters.from_level(19, enable_ldm=True)
    z = zstandard.ZstdCompressor(compression_params=params).compress(data)
    assert decode_all(z) == data


def test_dictionary_trained_by_libzstd():
    rng = random.Random(5)
    samples = [
        (b"{'user': %d, 'name': 'u%d', 'tags': ['a','b']}" % (i, i)) * 3
        for i in range(200)
    ]
    d = zstandard.train_dictionary(4096, samples)
    from zstd_tpu.oracle.dictionary import Dictionary

    our_dict = Dictionary.decode_dict(d.as_bytes())
    assert our_dict.dict_id == d.dict_id()
    c = zstandard.ZstdCompressor(level=3, dict_data=d)
    for s in samples[:20]:
        z = c.compress(s)
        assert decode_all(z, dicts=[our_dict]) == s
