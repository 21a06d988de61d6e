"""FSE (tANS) decoding: table description parsing, table spread, stream decode.

Capability parity with /root/reference/ruzstd/src/fse/fse_decoder.rs:5-366:
  - variable-width probability parsing with the low-threshold trick and the
    2-bit zero-run escape (fse_decoder.rs:224-307)
  - table spread via next_position = p + (ts>>1)+(ts>>3)+3 mod ts with
    -1-probability symbols pinned at the top (fse_decoder.rs:141-219)
  - per-entry baseline/num_bits from the per-symbol state counter
    (fse_decoder.rs:340-366)

The table is represented as three NumPy arrays (symbol/base_line/num_bits) so
it ships to the device unchanged.
"""

import dataclasses

import numpy as np

from zstd_tpu.common.errors import FSETableError
from zstd_tpu.utils.bitio import BitReader, ReverseBitReader


@dataclasses.dataclass
class FSETable:
    acc_log: int
    symbol: np.ndarray     # u8[size]
    base_line: np.ndarray  # u16[size]
    num_bits: np.ndarray   # u8[size]

    @property
    def size(self) -> int:
        return 1 << self.acc_log


def read_probabilities(reader: BitReader, max_log: int):
    """Parse an FSE table description. Returns (probabilities, acc_log).

    `reader` must be positioned at the start of the description; on return it
    is positioned at the next byte boundary (the description occupies whole
    bytes).
    """
    acc_log = reader.get_bits(4) + 5
    if acc_log > max_log:
        raise FSETableError(f"accuracy log {acc_log} exceeds maximum {max_log}")
    size = 1 << acc_log

    probs = []
    remaining = size
    while remaining > 0:
        bits_to_read = (remaining + 1).bit_length()  # highbit(remaining+1)+1
        val = reader.get_bits(bits_to_read)
        lower_mask = (1 << (bits_to_read - 1)) - 1
        threshold = (1 << bits_to_read) - 1 - (remaining + 1)
        if (val & lower_mask) < threshold:
            reader.return_bits(1)
            val = val & lower_mask
        elif val > lower_mask:
            val = val - threshold
        prob = val - 1
        remaining -= -prob if prob < 0 else prob
        probs.append(prob)
        if prob == 0:
            # zero-run escape: 2-bit repeat counts, 3 chains
            repeat = reader.get_bits(2)
            probs.extend([0] * repeat)
            while repeat == 3:
                repeat = reader.get_bits(2)
                probs.extend([0] * repeat)
        if len(probs) > 256:
            raise FSETableError("too many symbols in FSE table description")
    if remaining < 0:
        raise FSETableError("FSE probabilities exceed table size")
    # Description consumes whole bytes: skip to boundary.
    pad = (8 - (reader.bits_read() & 7)) & 7
    reader.get_bits(pad)
    return probs, acc_log


def build_table_from_probabilities(probs, acc_log: int) -> FSETable:
    """Spread symbols over the table and derive per-state baseline/num_bits."""
    from zstd_tpu.oracle.sequences import _native_runtime

    rt = _native_runtime()
    if rt is not None:
        res = rt.fse_build_table(probs, acc_log)
        if res is not None:
            if isinstance(res, int):
                if res == -1:
                    raise FSETableError("too many less-than-one probabilities")
                raise FSETableError("table spread did not return to position 0")
            sym, base, nb = res
            return FSETable(acc_log=acc_log, symbol=sym, base_line=base,
                            num_bits=nb)

    size = 1 << acc_log
    symbols = np.zeros(size, dtype=np.uint8)
    base_line = np.zeros(size, dtype=np.uint16)
    num_bits = np.zeros(size, dtype=np.uint8)

    # state_desc[s] counts states assigned so far; -1-prob symbols start at
    # "virtual count 1" occupying a single top cell with full-reread states.
    state_desc = np.zeros(256, dtype=np.int64)

    high_threshold = size
    for s, p in enumerate(probs):
        if p == -1:
            high_threshold -= 1
            if high_threshold < 0:
                raise FSETableError("too many less-than-one probabilities")
            symbols[high_threshold] = s
            state_desc[s] = 1

    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        state_desc[s] = p
        for _ in range(p):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos >= high_threshold:
                pos = (pos + step) & mask
    if pos != 0:
        raise FSETableError("table spread did not return to position 0")

    for i in range(size):
        s = symbols[i]
        cnt = int(state_desc[s])
        state_desc[s] = cnt + 1
        nb = acc_log - (cnt.bit_length() - 1)
        num_bits[i] = nb
        base_line[i] = (cnt << nb) - size

    return FSETable(acc_log=acc_log, symbol=symbols, base_line=base_line, num_bits=num_bits)


def build_table_from_rle(symbol: int) -> FSETable:
    """A degenerate 1-entry table that always yields `symbol` with 0 bits.

    Models the RLE sequence-compression mode (one byte names the symbol);
    the reference stores an Option<u8> instead, this keeps the decode loop
    uniform.
    """
    return FSETable(
        acc_log=0,
        symbol=np.array([symbol], dtype=np.uint8),
        base_line=np.zeros(1, dtype=np.uint16),
        num_bits=np.zeros(1, dtype=np.uint8),
    )


def parse_fse_table(reader: BitReader, max_log: int) -> FSETable:
    probs, acc_log = read_probabilities(reader, max_log)
    return build_table_from_probabilities(probs, acc_log)


class FSEDecoder:
    """Single tANS decode state over a reverse bitstream."""

    __slots__ = ("table", "state")

    def __init__(self, table: FSETable):
        self.table = table
        self.state = 0

    def init_state(self, bits: ReverseBitReader) -> None:
        self.state = bits.get_bits(self.table.acc_log)

    def decode_symbol(self) -> int:
        return int(self.table.symbol[self.state])

    def update_state(self, bits: ReverseBitReader) -> None:
        nb = int(self.table.num_bits[self.state])
        self.state = int(self.table.base_line[self.state]) + bits.get_bits(nb)
