from zstd_tpu.utils.bitio import BitReader, ReverseBitReader, BitWriter
from zstd_tpu.utils.xxhash64 import xxhash64

__all__ = ["BitReader", "ReverseBitReader", "BitWriter", "xxhash64"]
