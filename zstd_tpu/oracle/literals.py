"""Literals-section decoding: Raw copy, RLE fill, Huffman (1 or 4 streams),
Treeless table reuse.

Parity with /root/reference/ruzstd/src/decoding/literals_section_decoder.rs:12-158:
the 4-stream mode reads a 6-byte jump table then decodes 4 independent
reversed bitstreams; regenerated sizes are ceil(regen/4) for streams 1-3 and
the remainder for stream 4; Treeless reuses the previous block's (or the
dictionary's) Huffman table and errors if none exists.
"""

from zstd_tpu.common import constants
from zstd_tpu.common.errors import LiteralsSectionError, NotEnoughBytes
from zstd_tpu.oracle import huff0


def decode_literals(section, data, scratch) -> tuple[bytes, int]:
    """Decode one literals section.

    `data` starts right after the literals header. Returns
    (literals, bytes_consumed). `scratch.huffman_table` is updated for
    Compressed sections and consulted for Treeless ones.
    """
    t = section.lit_type
    if t == constants.LIT_RAW:
        n = section.regenerated_size
        if len(data) < n:
            raise NotEnoughBytes(n, len(data), "raw literals")
        return bytes(data[:n]), n
    if t == constants.LIT_RLE:
        if len(data) < 1:
            raise NotEnoughBytes(1, 0, "rle literal byte")
        return bytes([data[0]]) * section.regenerated_size, 1

    # Compressed / Treeless
    comp = section.compressed_size
    if len(data) < comp:
        raise NotEnoughBytes(comp, len(data), "compressed literals")
    payload = bytes(data[:comp])
    pos = 0
    if t == constants.LIT_COMPRESSED:
        table, consumed = huff0.parse_huffman_table(payload)
        scratch.huffman_table = table
        pos = consumed
    else:
        table = scratch.huffman_table
        if table is None:
            raise LiteralsSectionError(
                "treeless literals before any huffman table was defined")

    regen = section.regenerated_size
    if section.num_streams == 1:
        out = huff0.decode_stream(table, payload[pos:], regen)
        return out, comp

    # 4 streams: 6-byte jump table with the sizes of streams 1-3.
    if len(payload) - pos < 6:
        raise NotEnoughBytes(6, len(payload) - pos, "literals jump table")
    s1 = int.from_bytes(payload[pos:pos + 2], "little")
    s2 = int.from_bytes(payload[pos + 2:pos + 4], "little")
    s3 = int.from_bytes(payload[pos + 4:pos + 6], "little")
    pos += 6
    total = len(payload) - pos
    s4 = total - s1 - s2 - s3
    if s4 <= 0:
        raise LiteralsSectionError("four-stream jump table exceeds payload")

    r123 = (regen + 3) // 4
    r4 = regen - 3 * r123
    if r4 < 0:
        raise LiteralsSectionError(
            f"regenerated size {regen} too small for four streams")

    out = bytearray()
    sizes = (s1, s2, s3, s4)
    regs = (r123, r123, r123, r4)
    for size, r in zip(sizes, regs):
        stream = payload[pos:pos + size]
        if len(stream) < size:
            raise NotEnoughBytes(size, len(stream), "literal stream")
        out.extend(huff0.decode_stream(table, stream, r))
        pos += size
    return bytes(out), comp
