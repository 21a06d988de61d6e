"""Block, literals-section, and sequences-section headers (RFC 8878 §3.1.1.2-3).

Parity: /root/reference/ruzstd/src/blocks/block.rs:5-43 (block header),
literals_section.rs:54-236 (1-5 byte literals header, size formats),
sequence_section.rs:98-168 (num_sequences varint + compression-modes byte).
"""

import dataclasses

from zstd_tpu.common import constants
from zstd_tpu.common.errors import (
    BlockHeaderError,
    LiteralsSectionError,
    NotEnoughBytes,
    SequencesHeaderError,
)


@dataclasses.dataclass
class BlockHeader:
    last_block: bool
    block_type: int  # BLOCK_RAW / BLOCK_RLE / BLOCK_COMPRESSED
    block_size: int  # compressed payload size (RLE: 1 byte on wire, size = regenerated)


def parse_block_header(data) -> BlockHeader:
    if len(data) < 3:
        raise NotEnoughBytes(3, len(data), "block header")
    v = int.from_bytes(data[0:3], "little")
    last = bool(v & 1)
    btype = (v >> 1) & 3
    size = v >> 3
    if btype == constants.BLOCK_RESERVED:
        raise BlockHeaderError("reserved block type")
    return BlockHeader(last_block=last, block_type=btype, block_size=size)


@dataclasses.dataclass
class LiteralsSection:
    lit_type: int            # LIT_RAW / LIT_RLE / LIT_COMPRESSED / LIT_TREELESS
    regenerated_size: int
    compressed_size: int | None  # None for Raw/RLE
    num_streams: int             # 1 or 4 (Compressed/Treeless only)
    header_size: int


def parse_literals_section(data) -> LiteralsSection:
    if len(data) < 1:
        raise NotEnoughBytes(1, 0, "literals header")
    b0 = data[0]
    lit_type = b0 & 3
    size_format = (b0 >> 2) & 3

    if lit_type in (constants.LIT_RAW, constants.LIT_RLE):
        if size_format in (0, 2):
            # single byte, 5-bit size (size_format low bit 0)
            return LiteralsSection(lit_type, b0 >> 3, None, 1, 1)
        if size_format == 1:
            if len(data) < 2:
                raise NotEnoughBytes(2, len(data), "literals header")
            regen = (b0 >> 4) | (data[1] << 4)
            return LiteralsSection(lit_type, regen, None, 1, 2)
        # size_format == 3
        if len(data) < 3:
            raise NotEnoughBytes(3, len(data), "literals header")
        regen = (b0 >> 4) | (data[1] << 4) | (data[2] << 12)
        return LiteralsSection(lit_type, regen, None, 1, 3)

    # Compressed / Treeless
    if size_format == 0:
        num_streams, regen_bits, hdr = 1, 10, 3
    elif size_format == 1:
        num_streams, regen_bits, hdr = 4, 10, 3
    elif size_format == 2:
        num_streams, regen_bits, hdr = 4, 14, 4
    else:
        num_streams, regen_bits, hdr = 4, 18, 5
    if len(data) < hdr:
        raise NotEnoughBytes(hdr, len(data), "literals header")
    v = int.from_bytes(data[0:hdr], "little") >> 4  # skip type+size_format bits
    mask = (1 << regen_bits) - 1
    regen = v & mask
    comp = (v >> regen_bits) & mask
    if comp == 0:
        raise LiteralsSectionError("compressed literals size of zero")
    return LiteralsSection(lit_type, regen, comp, num_streams, hdr)


@dataclasses.dataclass
class SequencesHeader:
    num_sequences: int
    ll_mode: int | None
    of_mode: int | None
    ml_mode: int | None
    header_size: int


def parse_sequences_header(data) -> SequencesHeader:
    if len(data) < 1:
        raise NotEnoughBytes(1, 0, "sequences header")
    b0 = data[0]
    if b0 == 0:
        return SequencesHeader(0, None, None, None, 1)
    if b0 < 128:
        num, pos = b0, 1
    elif b0 < 255:
        if len(data) < 2:
            raise NotEnoughBytes(2, len(data), "sequences header")
        num, pos = ((b0 - 128) << 8) + data[1], 2
    else:
        if len(data) < 3:
            raise NotEnoughBytes(3, len(data), "sequences header")
        num, pos = data[1] + (data[2] << 8) + 0x7F00, 3
    if len(data) < pos + 1:
        raise NotEnoughBytes(pos + 1, len(data), "compression modes byte")
    modes = data[pos]
    if modes & 3:
        raise SequencesHeaderError("reserved bits set in compression-modes byte")
    return SequencesHeader(
        num_sequences=num,
        ll_mode=(modes >> 6) & 3,
        of_mode=(modes >> 4) & 3,
        ml_mode=(modes >> 2) & 3,
        header_size=pos + 1,
    )
