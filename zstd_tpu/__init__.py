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
from zstd_tpu.common.config import CompressionLevel
from zstd_tpu.oracle import (
    DEFAULT_MAX_WINDOW_SIZE,
    BlockDecodingStrategy,
    Dictionary,
    FrameDecoder,
    StreamingDecoder,
    decode_all,
    decode_all_to_vec,
    decode_frame,
)

__version__ = "0.1.0"

__all__ = [
    "constants", "errors", "__version__",
    # decoding (ruzstd/src/lib.rs:55-60 surface)
    "FrameDecoder", "StreamingDecoder", "BlockDecodingStrategy",
    "Dictionary", "DEFAULT_MAX_WINDOW_SIZE",
    "decode_all", "decode_all_to_vec", "decode_frame",
    # encoding (lib.rs:61-63 surface)
    "CompressionLevel", "compress", "compress_to_vec", "FrameCompressor",
    # device pipelines (jax-importing; loaded lazily)
    "BatchDecoder", "BatchEncoder", "decode_all_device",
    "create_raw_dict_from_source", "create_raw_dict_from_dir",
]

_LAZY = {
    "compress": ("zstd_tpu.encoding", "compress"),
    "compress_to_vec": ("zstd_tpu.encoding", "compress_to_vec"),
    "FrameCompressor": ("zstd_tpu.encoding", "FrameCompressor"),
    "BatchDecoder": ("zstd_tpu.models.batch_decoder", "BatchDecoder"),
    "BatchEncoder": ("zstd_tpu.models.batch_encoder", "BatchEncoder"),
    "decode_all_device": ("zstd_tpu.models.splitter", "decode_all_device"),
    "create_raw_dict_from_source": ("zstd_tpu.models.dict_trainer",
                                    "create_raw_dict_from_source"),
    "create_raw_dict_from_dir": ("zstd_tpu.models.dict_trainer",
                                 "create_raw_dict_from_dir"),
}


def __getattr__(name):
    """Lazy heavy imports: the encode path and the jax device pipelines load
    on first use so `import zstd_tpu` stays light."""
    target = _LAZY.get(name)
    if target is None:
        raise AttributeError(f"module 'zstd_tpu' has no attribute {name!r}")
    import importlib

    value = getattr(importlib.import_module(target[0]), target[1])
    globals()[name] = value
    return value
