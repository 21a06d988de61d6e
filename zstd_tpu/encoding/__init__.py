"""Encoding pipeline (oracle/host implementation).

Capability parity with /root/reference/ruzstd/src/encoding/: frame compressor
with level dispatch (Uncompressed, Fastest), compressed-block assembly
(Huffman literals, FSE sequences), hash-table match generation, RLE/raw
fallbacks with the no-expansion guarantee, and xxhash64 content checksums.
The batched TPU encode pipeline in zstd_tpu/models reuses these components'
table builders.

Public surface mirrors encoding::{compress, compress_to_vec, FrameCompressor,
CompressionLevel, Matcher, ...} (/root/reference/ruzstd/src/encoding/mod.rs:9-17).
"""

from zstd_tpu.common.config import CompressionLevel
from zstd_tpu.encoding.frame_enc import FrameCompressor, compress, compress_to_vec
from zstd_tpu.encoding.match_gen import RawSequence, find_sequences
from zstd_tpu.encoding.matcher import GreedyMatcher, Matcher

__all__ = [
    "CompressionLevel",
    "FrameCompressor",
    "compress",
    "compress_to_vec",
    "Matcher",
    "GreedyMatcher",
    "RawSequence",
    "find_sequences",
]
