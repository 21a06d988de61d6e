"""Spec-core oracle: a pure-Python/NumPy RFC 8878 codec.

This layer is the bit-exact ground truth every TPU kernel diffs against
(SURVEY.md §7 build order step 1). It is deliberately simple and typed-error
strict; throughput comes from the device pipelines in zstd_tpu/models.
"""

from zstd_tpu.common.constants import DEFAULT_MAX_WINDOW_SIZE
from zstd_tpu.oracle.decoder import (
    FrameDecoder,
    StreamingDecoder,
    BlockDecodingStrategy,
    decode_all,
    decode_all_to_vec,
    decode_from_to,
    decode_frame,
)
from zstd_tpu.oracle.dictionary import Dictionary

__all__ = [
    "FrameDecoder",
    "StreamingDecoder",
    "BlockDecodingStrategy",
    "decode_all",
    "decode_all_to_vec",
    "decode_from_to",
    "decode_frame",
    "Dictionary",
    "DEFAULT_MAX_WINDOW_SIZE",
]
