from zstd_tpu.common import constants, errors
from zstd_tpu.common.config import CodecConfig

__all__ = ["constants", "errors", "CodecConfig"]
