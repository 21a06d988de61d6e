"""Host-side bit IO.

Zstd bitstreams are little-endian, LSB-first. Forward reads serve table
descriptions and headers; FSE/Huffman payloads are written back-to-front and
read in reverse. Capability parity with the reference's bit_io layer
(/root/reference/ruzstd/src/bit_io/): forward BitReader with return_bits,
ReverseBitReader that yields phantom zero bits past the end with a negative
bits_remaining as terminator, and an append-only BitWriter with bit patching
(change_bits) and byte-aligned rollback (reset_to).

These are the *oracle/host* implementations; the device equivalents live in
zstd_tpu/ops as vectorized gathers over u8/u32 arrays.
"""

from zstd_tpu.common.errors import BitstreamError, NotEnoughBytes


class BitReader:
    """Forward LSB-first bit reader over a bytes-like buffer."""

    __slots__ = ("data", "pos", "total")

    def __init__(self, data):
        self.data = data
        self.pos = 0                 # next unread bit index
        self.total = len(data) * 8

    def bits_read(self) -> int:
        return self.pos

    def bits_left(self) -> int:
        return self.total - self.pos

    def get_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.total:
            raise NotEnoughBytes((self.pos + n + 7) // 8, self.total // 8, "bitstream")
        lo_byte = self.pos >> 3
        hi_byte = (self.pos + n + 7) >> 3
        window = int.from_bytes(self.data[lo_byte:hi_byte], "little")
        val = (window >> (self.pos & 7)) & ((1 << n) - 1)
        self.pos += n
        return val

    def peek_bits(self, n: int) -> int:
        p = self.pos
        v = self.get_bits(n)
        self.pos = p
        return v

    def return_bits(self, n: int) -> None:
        if n > self.pos:
            raise BitstreamError("cannot return more bits than were read")
        self.pos -= n


class ReverseBitReader:
    """Back-to-front reader for FSE/Huffman payloads.

    Bit i of the stream is ``(data[i//8] >> (i%8)) & 1``; a read of n bits
    consumes bit indices [pos-n, pos) with ascending significance, i.e. the
    highest unread bits. Construction skips the padding: zero or more 0 bits
    then a single mandatory 1 bit at the very top (at most 8 total, else the
    stream is malformed). Reads past the start return phantom zero bits and
    drive bits_remaining negative — the loop-termination idiom of the format
    (reference: bit_io/bit_reader_reverse.rs:6-163).
    """

    __slots__ = ("data", "pos")

    def __init__(self, data):
        if len(data) == 0:
            raise BitstreamError("empty reverse bitstream")
        last = data[-1]
        if last == 0:
            raise BitstreamError("reverse bitstream padding byte is zero")
        self.data = data
        # Top of stream: position just below the mandatory 1 bit.
        self.pos = (len(data) - 1) * 8 + last.bit_length() - 1

    def bits_remaining(self) -> int:
        return self.pos

    def get_bits(self, n: int) -> int:
        if n == 0:
            return 0
        self.pos -= n
        start = self.pos
        if start >= 0:
            lo_byte = start >> 3
            hi_byte = (start + n + 7) >> 3
            window = int.from_bytes(self.data[lo_byte:hi_byte], "little")
            return (window >> (start & 7)) & ((1 << n) - 1)
        # Partially or fully below the start: phantom zeros in the low bits.
        avail = start + n  # number of real bits available (may be <= 0)
        if avail <= 0:
            return 0
        hi_byte = (avail + 7) >> 3
        window = int.from_bytes(self.data[0:hi_byte], "little")
        real = window & ((1 << avail) - 1)
        return real << (-start)  # missing low bits (indices < 0) are zero

    def peek_bits(self, n: int) -> int:
        p = self.pos
        v = self.get_bits(n)
        self.pos = p
        return v


class BitWriter:
    """Append-only LSB-first bit sink.

    Parity surface with bit_io/bit_writer.rs:7-367: write_bits, index (bit
    position), change_bits (patch previously written fields such as jump
    tables), reset_to (byte-aligned rollback when compression did not pay),
    append_bytes, misaligned, dump.
    """

    __slots__ = ("buf", "partial", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.partial = 0   # up to 7 pending bits
        self.nbits = 0

    def index(self) -> int:
        return len(self.buf) * 8 + self.nbits

    def misaligned(self) -> int:
        return self.nbits & 7

    def write_bits(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.partial |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.partial & 0xFF)
            self.partial >>= 8
            self.nbits -= 8

    def append_bytes(self, data) -> None:
        if self.nbits != 0:
            raise BitstreamError("append_bytes on a misaligned BitWriter")
        self.buf.extend(data)

    def change_bits(self, bit_index: int, value: int, n: int) -> None:
        """Patch n bits at an absolute bit position already written."""
        if bit_index + n > len(self.buf) * 8:
            raise BitstreamError("change_bits reaches into the partial byte")
        lo = bit_index >> 3
        hi = (bit_index + n + 7) >> 3
        window = int.from_bytes(self.buf[lo:hi], "little")
        shift = bit_index & 7
        mask = ((1 << n) - 1) << shift
        window = (window & ~mask) | ((value & ((1 << n) - 1)) << shift)
        self.buf[lo:hi] = window.to_bytes(hi - lo, "little")

    def reset_to(self, bit_index: int) -> None:
        if bit_index % 8 != 0:
            raise BitstreamError("reset_to requires a byte-aligned position")
        del self.buf[bit_index // 8:]
        self.partial = 0
        self.nbits = 0

    def dump(self) -> bytes:
        if self.nbits != 0:
            raise BitstreamError("dump on a misaligned BitWriter")
        return bytes(self.buf)
