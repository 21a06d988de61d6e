"""Huffman (huff0) encoding: optimal length-limited code construction
(package-merge, 11-bit cap), canonical code assignment consistent with the
decoder's table build, table-description serialization (direct nibbles or
FSE-compressed weights), and 1-stream / 4-stream payload encoding.

Capability parity with /root/reference/ruzstd/src/huff0/huff0_encoder.rs:9-483.
The reference derives weights with a sort-based heuristic
(distribute_weights/redistribute_weights); package-merge is used here instead
— it is optimal under the same length cap, so compressed sizes are <= the
reference's for every block.
"""

import dataclasses

import numpy as np

from zstd_tpu.common.constants import HUF_MAX_BITS
from zstd_tpu.common.errors import EncodeError
from zstd_tpu.encoding import fse_enc
from zstd_tpu.oracle.huff0 import build_table_from_weights
from zstd_tpu.utils.bitio import BitWriter


@dataclasses.dataclass
class HuffmanEncodeTable:
    weights: list[int]   # per symbol 0..last_symbol (all, incl. implied last)
    codes: np.ndarray    # u16[n]
    lengths: np.ndarray  # u8[n]
    max_bits: int

    def can_encode(self, present_symbols) -> bool:
        return all(self.lengths[s] > 0 for s in present_symbols
                   if s < len(self.lengths))


def _package_merge(counts: dict[int, int], limit: int) -> dict[int, int]:
    """Optimal length-limited prefix-code lengths (package-merge)."""
    if len(counts) == 1:
        s = next(iter(counts))
        return {s: 1}
    if len(counts) > (1 << limit):
        raise EncodeError("alphabet too large for the length limit")
    syms = sorted(counts, key=lambda s: (counts[s], s))
    n = len(syms)
    base = [(counts[s], (s,)) for s in syms]
    pool: list[tuple[int, tuple]] = []
    for _ in range(limit - 1):
        merged = sorted(base + pool, key=lambda x: x[0])
        pool = [
            (merged[i][0] + merged[i + 1][0], merged[i][1] + merged[i + 1][1])
            for i in range(0, len(merged) - 1, 2)
        ]
    final = sorted(base + pool, key=lambda x: x[0])[: 2 * n - 2]
    lengths = {s: 0 for s in syms}
    for _, group in final:
        for s in group:
            lengths[s] += 1
    return lengths


def build_from_counts(counts: np.ndarray) -> HuffmanEncodeTable:
    """Build a canonical zstd Huffman table from byte counts (len 256)."""
    present = {s: int(c) for s, c in enumerate(counts) if c > 0}
    if len(present) < 2:
        raise EncodeError("huffman needs at least two distinct symbols")
    from zstd_tpu.oracle.sequences import _native_runtime

    rt = _native_runtime()
    if rt is not None:
        res = rt.huff_enc_build(counts)
        if isinstance(res, tuple):
            weights, codes, lens, max_bits = res
            return HuffmanEncodeTable(weights=weights, codes=codes,
                                      lengths=lens, max_bits=max_bits)
    lengths = _package_merge(present, HUF_MAX_BITS)
    max_len = max(lengths.values())
    # weights: w = max_len + 1 - nb for coded symbols, 0 otherwise
    last_symbol = max(present)
    weights = [0] * (last_symbol + 1)
    for s, nb in lengths.items():
        weights[s] = max_len + 1 - nb

    # Canonical codes must match the decoder's LUT layout: build the decode
    # table and read each symbol's span start (huff0_decoder parity by
    # construction).
    dtable = build_table_from_weights(weights[:-1])  # last weight is implied
    if dtable.max_bits != max_len:
        raise EncodeError("internal: weight completion mismatch")
    codes = np.zeros(last_symbol + 1, dtype=np.uint16)
    lens = np.zeros(last_symbol + 1, dtype=np.uint8)
    # span starts: first index where each symbol appears
    size = 1 << dtable.max_bits
    seen = set()
    for i in range(size):
        s = int(dtable.symbol[i])
        if s in seen:
            continue
        seen.add(s)
        nb = int(dtable.num_bits[i])
        codes[s] = i >> (dtable.max_bits - nb)
        lens[s] = nb
    return HuffmanEncodeTable(weights=weights, codes=codes, lengths=lens,
                              max_bits=max_len)


def write_table_description(table: HuffmanEncodeTable, writer: BitWriter) -> None:
    """Serialize weights: FSE-compressed when it pays, else direct nibbles.

    Mirrors huff0_encoder.rs:119-153 (size-byte patching for the FSE path).
    """
    weights = table.weights[:-1]  # last weight implied
    n = len(weights)
    direct_size = 1 + (n + 1) // 2

    fse_bytes = None
    if n > 16:
        fse_bytes = _fse_compress_weights(weights)
        if fse_bytes is not None and len(fse_bytes) + 1 >= direct_size:
            fse_bytes = None
    if fse_bytes is not None:
        writer.write_bits(len(fse_bytes), 8)
        writer.append_bytes(fse_bytes)
        return

    if n > 127:
        raise EncodeError("cannot direct-encode more than 127 weights")
    writer.write_bits(127 + n, 8)
    for i in range(0, n - 1, 2):
        writer.write_bits((weights[i] << 4) | weights[i + 1], 8)
    if n % 2:
        writer.write_bits(weights[-1] << 4, 8)


def _fse_compress_weights(weights) -> bytes | None:
    """Two interleaved FSE states over the weight list (huff0 format)."""
    counts = np.bincount(np.asarray(weights, dtype=np.int64), minlength=1)
    total = len(weights)
    num_symbols = int(np.max(np.nonzero(counts)[0])) + 1 if counts.any() else 0
    if num_symbols < 2 or total < 2:
        return None
    table_log = fse_enc.optimal_table_log(6, total, num_symbols)
    try:
        probs = fse_enc.normalize_counts(list(counts[:num_symbols]), table_log, total)
        enc_table = fse_enc.build_encode_table(probs, table_log)
    except EncodeError:
        return None

    w = BitWriter()
    fse_enc.write_table_description(probs, table_log, w)

    # Interleaved 2-state encode, reverse order. The decoder alternates
    # state1, state2 on the forward weight list; the encoder therefore seeds
    # with the last two weights and alternates backwards.
    even = weights[0::2]
    odd = weights[1::2]
    s1 = fse_enc.FSEEncoder(enc_table)  # decodes even indices
    s2 = fse_enc.FSEEncoder(enc_table)  # decodes odd indices
    if len(weights) % 2 == 0:
        # last decoded: s2 flushes... decoder order: w0(s1) w1(s2) w2(s1)...
        # last weight w[n-1] is odd index -> state2 decodes it last.
        s2.init_state(weights[-1])
        s1.init_state(weights[-2])
        rest = weights[:-2]
    else:
        s1.init_state(weights[-1])
        s2.init_state(weights[-2])
        rest = weights[:-2]
    # walk the remaining weights backwards, feeding the state that decodes
    # each index: even index -> s1, odd -> s2.
    for i in range(len(rest) - 1, -1, -1):
        enc = s1 if i % 2 == 0 else s2
        enc.encode_symbol(weights[i], w)
    # flush order: the decoder reads init states as (state1, state2) from the
    # top of the stream, so state2 flushes first, then state1 on top... no:
    # top-of-stream bits are written LAST. Decoder reads state1 first (top),
    # so state1 is flushed last.
    s2.flush(w)
    s1.flush(w)
    w.write_bits(1, 1)  # padding sentinel
    pad = (8 - w.index() % 8) % 8
    w.write_bits(0, pad)
    blob = w.dump()

    # The interleaved-2-state termination rule (decode until the bitstream
    # overdraws) can mis-terminate when a state transition consumes zero
    # bits; verify by decoding with the oracle and fall back to the direct
    # representation on any mismatch.
    from zstd_tpu.oracle.huff0 import read_weights

    try:
        got, _ = read_weights(bytes([len(blob)]) + blob)
    except Exception:
        return None
    if got != list(weights):
        return None
    return blob


def encode_1stream(table: HuffmanEncodeTable, data) -> bytes:
    w = BitWriter()
    _encode_stream(table, data, w)
    return w.dump()


def encode_4stream(table: HuffmanEncodeTable, data) -> bytes:
    """Split ceil(n/4) and emit the 6-byte jump table + 4 streams
    (huff0_encoder.rs:39-84)."""
    n = len(data)
    split = (n + 3) // 4
    parts = [data[0:split], data[split:2 * split], data[2 * split:3 * split],
             data[3 * split:]]
    blobs = [b"" for _ in range(4)]
    for i, p in enumerate(parts):
        w = BitWriter()
        _encode_stream(table, p, w)
        blobs[i] = w.dump()
    for b in blobs[:3]:
        if len(b) > 0xFFFF:
            raise EncodeError("stream exceeds jump-table range")
    out = bytearray()
    for b in blobs[:3]:
        out.extend(len(b).to_bytes(2, "little"))
    for b in blobs:
        out.extend(b)
    return bytes(out)


def _encode_stream(table: HuffmanEncodeTable, data, w: BitWriter) -> None:
    from zstd_tpu.oracle.sequences import _native_runtime

    rt = _native_runtime()
    if rt is not None and w.index() % 8 == 0:
        blob = rt.huff_encode_stream(bytes(data), table.codes, table.lengths)
        if blob is not None:
            w.append_bytes(blob)
            return
    codes = table.codes
    lens = table.lengths
    for b in reversed(data):
        nb = int(lens[b])
        if nb == 0:
            raise EncodeError(f"symbol {b} has no code")
        w.write_bits(int(codes[b]), nb)
    w.write_bits(1, 1)  # sentinel
    pad = (8 - w.index() % 8) % 8
    w.write_bits(0, pad)
