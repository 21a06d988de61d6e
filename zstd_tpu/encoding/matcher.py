"""Pluggable match-generation interface.

Parity with the reference's user-extensible `Matcher` trait
(encoding/mod.rs:84-119) and `MatchGeneratorDriver`: a Matcher turns a block
of bytes into RawSequence(literals, offset, match_len) records; the frame
compressor accepts any implementation via replace_matcher. The default is
the greedy hash-table generator (match_gen.py); a device-batched matcher can
slot in without touching the pipeline.
"""

import abc

from zstd_tpu.common.config import CompressionLevel
from zstd_tpu.encoding.match_gen import RawSequence, find_sequences


class Matcher(abc.ABC):
    """Produces LZ77 sequences for one block at a time."""

    @abc.abstractmethod
    def find(self, block: bytes) -> list:
        """Returns RawSequence records covering `block` exactly."""

    def reset(self, level: CompressionLevel) -> None:
        """Called once per frame before the block loop."""

    def window_size(self) -> int:
        """Window advertised in the frame header (bytes)."""
        return 1 << 17


class GreedyMatcher(Matcher):
    """Default: single-probe hash table, greedy extension (match_gen.py;
    the Fastest-level equivalent of the reference's MatchGenerator)."""

    def find(self, block: bytes) -> list:
        return find_sequences(block)


__all__ = ["Matcher", "GreedyMatcher", "RawSequence"]
