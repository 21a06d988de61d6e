"""Frozen codec configuration threaded as a static argument into jitted code.

The reference's knobs (Cargo features, set_max_window_size, CompressionLevel,
DictParams — SURVEY.md §5 'Config / flag system') become one immutable
dataclass here so every TPU pipeline is shape-static under jit.
"""

import dataclasses
import enum

from zstd_tpu.common import constants


class CompressionLevel(enum.IntEnum):
    """Mirrors ruzstd's CompressionLevel (encoding/mod.rs:46-67)."""

    UNCOMPRESSED = 0
    FASTEST = 1
    DEFAULT = 3
    BETTER = 7
    BEST = 11


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    # Decode caps
    max_window_size: int = constants.DEFAULT_MAX_WINDOW_SIZE
    verify_checksums: bool = True

    # Batched TPU pipeline shapes (all static under jit)
    batch_size: int = 64               # independent frames/blocks per device step
    max_block_bytes: int = constants.MAX_BLOCK_SIZE
    max_sequences: int = 16 * 1024     # per-block sequence cap for scan length
    max_literals: int = constants.MAX_BLOCK_SIZE

    # Encode
    level: CompressionLevel = CompressionLevel.FASTEST
    write_checksum: bool = True
    window_log: int = 23               # MAX matcher window (8 MiB); the
    # effective window shrinks to the content size when it is known at
    # compress time (frame_enc.effective_window_log), so small frames never
    # advertise oversized decoder allocations. The reference's window is one
    # 128 KiB slice (match_generator.rs); cross-block reach at 8 MiB beats
    # libzstd-1's output size on the bench corpus.
    # Emit the frame content size in the header (minified per RFC 8878
    # §3.1.1.1.4). Off by default: the reference's compressor never writes
    # FCS (frame_compressor.rs:144-151), and the ratio gates pin that form.
    write_content_size: bool = False

    def clamp_window(self, requested: int) -> int:
        return min(requested, constants.MAX_WINDOW_SIZE)
