"""tpu-zstd: a TPU-native Zstandard (RFC 8878) codec built on JAX/XLA/Pallas.

Capability parity target: KillingSpark/zstd-rs (`ruzstd`) — see SURVEY.md.
Public API mirrors the reference's surface (ruzstd/src/lib.rs:55-67):

  - decoding: FrameDecoder, StreamingDecoder, BlockDecodingStrategy, Dictionary,
    decode_all, DEFAULT_MAX_WINDOW_SIZE, typed error taxonomy
  - encoding: compress, compress_to_vec, FrameCompressor, CompressionLevel
  - dictionary: create_raw_dict_from_source / create_raw_dict_from_dir (trainer)
  - models: batched TPU codec pipelines (the compute path)
"""

from zstd_tpu.common import constants
from zstd_tpu.common import errors

__version__ = "0.1.0"

__all__ = ["constants", "errors", "__version__"]
