"""Huffman (huff0) decoding: weight parsing and canonical table build.

Capability parity with /root/reference/ruzstd/src/huff0/huff0_decoder.rs:9-401:
  - direct 4-bit-nibble weights (header byte >= 128) or FSE-compressed
    weights via two interleaved FSE states sharing one table (header < 128,
    weight-table accuracy cap 6)
  - the last weight is implied by completing the weight-power sum to the
    next power of two
  - canonical LUT build: symbols ordered by ascending weight (longest codes
    at the lowest table indices), 1 << max_bits entries, max 11 bits
  - stateful decode: symbol = table[state], shift in num_bits new bits

Table arrays are NumPy so the device pipeline reuses them directly.
"""

import dataclasses

import numpy as np

from zstd_tpu.common.constants import HUF_MAX_BITS, WEIGHTS_MAX_LOG
from zstd_tpu.common.errors import HuffmanTableError, NotEnoughBytes
from zstd_tpu.oracle import fse
from zstd_tpu.utils.bitio import BitReader, ReverseBitReader


@dataclasses.dataclass
class HuffmanTable:
    max_bits: int
    symbol: np.ndarray    # u8[1 << max_bits]
    num_bits: np.ndarray  # u8[1 << max_bits]


def read_weights(data) -> tuple[list[int], int]:
    """Parse the weights of a Huffman table description.

    Returns (weights, bytes_consumed). `weights` excludes nothing — the
    implied last weight is appended by build_table_from_weights.
    """
    if len(data) < 1:
        raise NotEnoughBytes(1, 0, "huffman weights header")
    header = data[0]
    if header >= 128:
        # Direct representation: header-127 weights, 4 bits each.
        n = header - 127
        nbytes = (n + 1) // 2
        if len(data) < 1 + nbytes:
            raise NotEnoughBytes(1 + nbytes, len(data), "direct huffman weights")
        weights = []
        for i in range(n):
            b = data[1 + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return weights, 1 + nbytes

    # FSE-compressed weights: header = compressed size; one shared table,
    # two interleaved states, alternating, until the stream is exhausted.
    comp_size = header
    if len(data) < 1 + comp_size:
        raise NotEnoughBytes(1 + comp_size, len(data), "fse huffman weights")
    payload = bytes(data[1:1 + comp_size])
    fwd = BitReader(payload)
    table = fse.parse_fse_table(fwd, WEIGHTS_MAX_LOG)
    consumed_bytes = fwd.bits_read() // 8
    bitstream = payload[consumed_bytes:]
    rev = ReverseBitReader(bitstream)

    dec1 = fse.FSEDecoder(table)
    dec2 = fse.FSEDecoder(table)
    dec1.init_state(rev)
    dec2.init_state(rev)

    weights: list[int] = []
    # Alternate states: emit, update (which may overdraw into phantom zeros),
    # and when the update overdrew (bits_remaining < 0) flush the *other*
    # state's pending symbol and stop.
    while True:
        weights.append(dec1.decode_symbol())
        dec1.update_state(rev)
        if rev.bits_remaining() < 0:
            weights.append(dec2.decode_symbol())
            break
        weights.append(dec2.decode_symbol())
        dec2.update_state(rev)
        if rev.bits_remaining() < 0:
            weights.append(dec1.decode_symbol())
            break
        if len(weights) > 255:
            raise HuffmanTableError("too many huffman weights")
    if len(weights) > 255:
        raise HuffmanTableError("too many huffman weights")
    return weights, 1 + comp_size


def build_table_from_weights(weights: list[int]) -> HuffmanTable:
    """Complete the implied last weight and build the canonical decode LUT."""
    weights = list(weights)
    wsum = 0
    for w in weights:
        if w > HUF_MAX_BITS:
            raise HuffmanTableError(f"weight {w} exceeds max {HUF_MAX_BITS}")
        if w > 0:
            wsum += 1 << (w - 1)
    if wsum == 0:
        raise HuffmanTableError("all-zero huffman weights")
    max_bits = wsum.bit_length()  # log2(next power of two above wsum)
    if max_bits > HUF_MAX_BITS:
        raise HuffmanTableError(f"implied max_bits {max_bits} exceeds {HUF_MAX_BITS}")
    left_over = (1 << max_bits) - wsum
    # left_over must itself be a power of two — it is the last symbol's share.
    if left_over & (left_over - 1):
        raise HuffmanTableError("weights do not complete to a power of two")
    last_weight = left_over.bit_length()  # log2(left_over) + 1
    weights.append(last_weight)

    size = 1 << max_bits
    symbol = np.zeros(size, dtype=np.uint8)
    num_bits = np.zeros(size, dtype=np.uint8)

    # rank_idx[w] = first table index for symbols of weight w; lowest weights
    # (longest codes) occupy the lowest indices.
    rank_count = [0] * (max_bits + 2)
    for w in weights:
        rank_count[w] += 1
    rank_idx = [0] * (max_bits + 2)
    next_idx = 0
    for w in range(1, max_bits + 1):
        rank_idx[w] = next_idx
        next_idx += rank_count[w] * (1 << (w - 1))
    if next_idx != size:
        raise HuffmanTableError("weight ranks do not tile the decode table")

    for s, w in enumerate(weights):
        if w == 0:
            continue
        span = 1 << (w - 1)
        start = rank_idx[w]
        symbol[start:start + span] = s
        num_bits[start:start + span] = max_bits + 1 - w
        rank_idx[w] += span

    return HuffmanTable(max_bits=max_bits, symbol=symbol, num_bits=num_bits)


def parse_huffman_table(data) -> tuple[HuffmanTable, int]:
    """Parse a full Huffman table description; returns (table, bytes_consumed)."""
    weights, consumed = read_weights(data)
    return build_table_from_weights(weights), consumed


class HuffmanDecoder:
    """Stateful canonical decoder over a reverse bitstream."""

    __slots__ = ("table", "state")

    def __init__(self, table: HuffmanTable):
        self.table = table
        self.state = 0

    def init_state(self, bits: ReverseBitReader) -> None:
        self.state = bits.get_bits(self.table.max_bits)

    def decode_symbol(self) -> int:
        return int(self.table.symbol[self.state])

    def next_state(self, bits: ReverseBitReader) -> None:
        nb = int(self.table.num_bits[self.state])
        mask = (1 << self.table.max_bits) - 1
        self.state = ((self.state << nb) & mask) | bits.get_bits(nb)


def decode_stream(table: HuffmanTable, data, expected: int) -> bytes:
    """Decode one reversed Huffman bitstream to exactly `expected` symbols."""
    from zstd_tpu.common.errors import BitstreamError, HuffmanDecodeError
    from zstd_tpu.oracle.sequences import _native_runtime

    rt = _native_runtime()
    if rt is not None:
        res = rt.huff_decode(bytes(data), table, expected)
        if res is not None:
            if isinstance(res, int):
                if res == -1:
                    raise BitstreamError(
                        "empty or zero-padded reverse bitstream")
                if res == -2:
                    raise HuffmanDecodeError(
                        f"stream produced more than the expected "
                        f"{expected} literals")
                raise HuffmanDecodeError(
                    f"stream produced a wrong literal count, expected "
                    f"{expected}")
            return res

    rev = ReverseBitReader(data)
    dec = HuffmanDecoder(table)
    dec.init_state(rev)
    out = bytearray()
    limit = -table.max_bits
    while rev.bits_remaining() > limit:
        out.append(dec.decode_symbol())
        if len(out) > expected:
            raise HuffmanDecodeError(
                f"stream produced more than the expected {expected} literals")
        dec.next_state(rev)
    if len(out) != expected:
        raise HuffmanDecodeError(
            f"stream produced {len(out)} literals, expected {expected}")
    return bytes(out)
