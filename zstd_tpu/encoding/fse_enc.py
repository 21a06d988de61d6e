"""FSE (tANS) encoding: count normalization, encode-table build, table
description serialization, and single/interleaved stream encoding.

Capability parity with /root/reference/ruzstd/src/fse/fse_encoder.rs:4-445
(build_table_from_data/counts with power-of-two normalization, write_table,
encode + encode_interleaved). The construction here is the classic ANS
formulation (deltaNbBits / deltaFindState per symbol + a next-state table)
rather than the reference's per-symbol sorted state lists — identical output
format, better fit for later vectorization.
"""

import dataclasses

import numpy as np

from zstd_tpu.common.errors import EncodeError
from zstd_tpu.utils.bitio import BitWriter


@dataclasses.dataclass
class FSEEncodeTable:
    table_log: int
    probs: list[int]              # normalized probabilities (may contain -1)
    next_state: np.ndarray        # u16[table_size]: packed state -> next state value
    delta_nb_bits: np.ndarray     # u32[256]
    delta_find_state: np.ndarray  # i32[256]

    @property
    def table_size(self) -> int:
        return 1 << self.table_log


def optimal_table_log(max_log: int, total: int, num_symbols: int) -> int:
    """zstd-style heuristic: enough resolution for the data, capped."""
    if total <= 1:
        return 5
    bits_src = max((total - 1).bit_length() - 3, 1)
    bits_sym = (max(num_symbols - 1, 1)).bit_length() + 1
    log = max(min(bits_src, max_log), bits_sym, 5)
    return min(log, max_log)


def normalize_counts(counts, table_log: int, total: int) -> list[int]:
    """Scale raw counts to probabilities summing to exactly 1 << table_log.

    Symbols with tiny-but-nonzero counts get -1 ("less than one"), matching
    the format's special value; the largest symbol absorbs rounding error.
    """
    size = 1 << table_log
    if total <= 0:
        raise EncodeError("cannot normalize an empty histogram")
    counts = [int(c) for c in counts]
    total = int(total)
    probs = [0] * len(counts)
    low_threshold = total >> table_log
    assigned = 0
    largest, largest_p = -1, 0
    for s, c in enumerate(counts):
        if c == 0:
            continue
        if c <= low_threshold:
            probs[s] = -1
            assigned += 1
        else:
            p = int((c * size) // total)
            if p == 0:
                p = 1
            probs[s] = p
            assigned += p
            if p > largest_p:
                largest, largest_p = s, p
    if largest < 0:
        # every symbol was low-probability: force the first present one up
        for s, c in enumerate(counts):
            if c:
                probs[s] = 1
                assigned += 1 - 1  # was -1 counted as 1 already
                largest, largest_p = s, 1
                break
    diff = size - assigned
    probs[largest] += diff
    if probs[largest] <= 0:
        # redistribute: pull everything to a flat-ish correction
        return _normalize_slow(counts, table_log, total)
    return probs


def _normalize_slow(counts, table_log: int, total: int) -> list[int]:
    """Fallback normalization that always produces a valid distribution."""
    size = 1 << table_log
    present = [s for s, c in enumerate(counts) if c]
    if len(present) > size:
        raise EncodeError("more symbols than table slots")
    probs = [0] * len(counts)
    remaining = size - len(present)
    for s in present:
        probs[s] = 1
    # distribute remaining by count share, largest first
    order = sorted(present, key=lambda s: -counts[s])
    i = 0
    while remaining > 0:
        probs[order[i % len(order)]] += 1
        remaining -= 1
        i += 1
    return probs


def build_encode_table(probs, table_log: int) -> FSEEncodeTable:
    """Build the ANS encode table mirroring the decoder's spread function."""
    from zstd_tpu.oracle.sequences import _native_runtime

    rt = _native_runtime()
    if rt is not None:
        res = rt.fse_enc_build(list(probs), table_log)
        if isinstance(res, tuple):
            next_state, dnb, dfs = res
            return FSEEncodeTable(table_log=table_log, probs=list(probs),
                                  next_state=next_state, delta_nb_bits=dnb,
                                  delta_find_state=dfs)
    size = 1 << table_log
    mask = size - 1
    step = (size >> 1) + (size >> 3) + 3

    cumul = np.zeros(len(probs) + 1, dtype=np.int64)
    high_threshold = size - 1
    table_symbol = np.zeros(size, dtype=np.int64)
    for s, p in enumerate(probs):
        if p == -1:
            cumul[s + 1] = cumul[s] + 1
            table_symbol[high_threshold] = s
            high_threshold -= 1
        else:
            cumul[s + 1] = cumul[s] + p

    pos = 0
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        for _ in range(p):
            table_symbol[pos] = s
            pos = (pos + step) & mask
            while pos > high_threshold:
                pos = (pos + step) & mask
    if pos != 0:
        raise EncodeError("encode table spread did not close")

    # next_state[cumul[s]++] = size + u  (state values live in [size, 2*size))
    next_state = np.zeros(size, dtype=np.uint16)
    cc = cumul.copy()
    for u in range(size):
        s = table_symbol[u]
        next_state[cc[s]] = size + u
        cc[s] += 1

    delta_nb_bits = np.zeros(256, dtype=np.uint32)
    delta_find_state = np.zeros(256, dtype=np.int32)
    total = 0
    for s, p in enumerate(int(x) for x in probs):
        if p == 0:
            delta_nb_bits[s] = ((table_log + 1) << 16) - (1 << table_log)
        elif p in (-1, 1):
            delta_nb_bits[s] = (table_log << 16) - (1 << table_log)
            delta_find_state[s] = total - 1
            total += 1
        else:
            max_bits_out = table_log - (p - 1).bit_length() + 1
            min_state_plus = p << max_bits_out
            delta_nb_bits[s] = (max_bits_out << 16) - min_state_plus
            delta_find_state[s] = total - p
            total += p
    return FSEEncodeTable(
        table_log=table_log, probs=list(probs), next_state=next_state,
        delta_nb_bits=delta_nb_bits, delta_find_state=delta_find_state)


class FSEEncoder:
    """One encode state; symbols are fed in reverse stream order."""

    __slots__ = ("table", "state")

    def __init__(self, table: FSEEncodeTable):
        self.table = table
        self.state = 0

    def init_state(self, symbol: int) -> None:
        """First (i.e. last-in-stream) symbol: sets state, emits no bits."""
        t = self.table
        nb = (int(t.delta_nb_bits[symbol]) + (1 << 15)) >> 16
        value = (nb << 16) - int(t.delta_nb_bits[symbol])
        self.state = int(t.next_state[(value >> nb) + int(t.delta_find_state[symbol])])

    def encode_symbol(self, symbol: int, writer: BitWriter) -> None:
        t = self.table
        nb = (self.state + int(t.delta_nb_bits[symbol])) >> 16
        writer.write_bits(self.state, nb)
        self.state = int(t.next_state[(self.state >> nb) + int(t.delta_find_state[symbol])])

    def flush(self, writer: BitWriter) -> None:
        writer.write_bits(self.state, self.table.table_log)


def write_table_description(probs, table_log: int, writer: BitWriter) -> None:
    """Serialize the variable-width probability description
    (fse_encoder.rs:147-188; inverse of oracle.fse.read_probabilities)."""
    writer.write_bits(table_log - 5, 4)
    size = 1 << table_log
    remaining = size
    i = 0
    while remaining > 0 and i < len(probs):
        p = probs[i]
        bits_to_read = (remaining + 1).bit_length()
        lower_mask = (1 << (bits_to_read - 1)) - 1
        threshold = (1 << bits_to_read) - 1 - (remaining + 1)
        val = p + 1
        if val < threshold:
            writer.write_bits(val, bits_to_read - 1)
        else:
            # values whose low bits would collide with the short form get
            # the full width, offset by threshold when above the mask
            if val > lower_mask:
                writer.write_bits(val + threshold, bits_to_read)
            else:
                writer.write_bits(val, bits_to_read)
        remaining -= -p if p < 0 else p
        i += 1
        if p == 0:
            # emit zero-run counts for the following zeros
            run = 0
            while i < len(probs) and probs[i] == 0 and remaining > 0:
                run += 1
                i += 1
            while run >= 3:
                writer.write_bits(3, 2)
                run -= 3
            writer.write_bits(run, 2)
    if remaining != 0:
        raise EncodeError("table description probabilities do not sum to size")
    pad = (8 - writer.misaligned()) & 7 if writer.misaligned() else 0
    writer.write_bits(0, pad)
