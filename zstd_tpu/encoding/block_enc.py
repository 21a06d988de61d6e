"""Compressed-block assembly: literals section + sequences section.

Capability parity with /root/reference/ruzstd/src/encoding/blocks/compressed.rs:
drains matcher sequences into literals + (ll, ml, of=offset+3) triples
(repcodes unexploited, like the reference), Huffman-or-raw literals with a
rollback when compression does not pay, seqnum varint + mode byte + FSE table
writes, and the reverse interleaved 3-state FSE sequence encoding with final
state flushes and padding.
"""

import bisect

import numpy as np

from zstd_tpu.common import constants as C
from zstd_tpu.common.errors import EncodeError
from zstd_tpu.encoding import fse_enc, huff0_enc
from zstd_tpu.encoding.match_gen import RawSequence, find_sequences
from zstd_tpu.utils.bitio import BitWriter


def ll_code(v: int) -> int:
    c = bisect.bisect_right(C.LL_CODE_BASELINE, v) - 1
    return c


def ml_code(v: int) -> int:
    return bisect.bisect_right(C.ML_CODE_BASELINE, v) - 1


def of_code_of(of_value: int) -> int:
    return of_value.bit_length() - 1


def encode_literals_section(lits: bytes, writer_out: bytearray) -> None:
    """Append the literals section (header + payload), choosing the smallest
    of Raw / RLE / Huffman-compressed representations."""
    n = len(lits)
    if n == 0:
        writer_out.append(_lit_header_byte(C.LIT_RAW, 0))
        return
    if lits.count(lits[0]) == n:
        writer_out.extend(_lit_header(C.LIT_RLE, n))
        writer_out.append(lits[0])
        return

    best = None
    if n > 63:
        counts = np.bincount(np.frombuffer(lits, np.uint8), minlength=256)
        try:
            table = huff0_enc.build_from_counts(counts)
            tw = BitWriter()
            huff0_enc.write_table_description(table, tw)
            desc = tw.dump()
            four = n >= 256
            payload = (huff0_enc.encode_4stream(table, lits) if four
                       else huff0_enc.encode_1stream(table, lits))
            comp_size = len(desc) + len(payload)
            header = _lit_header_compressed(C.LIT_COMPRESSED, n, comp_size, four)
            if header is not None and len(header) + comp_size < 1 + _raw_header_len(n) + n:
                best = header + desc + payload
        except EncodeError:
            best = None
    if best is not None:
        writer_out.extend(best)
        return
    writer_out.extend(_lit_header(C.LIT_RAW, n))
    writer_out.extend(lits)


def _raw_header_len(n: int) -> int:
    return 1 if n <= 31 else (2 if n <= 4095 else 3)


def _lit_header_byte(lit_type: int, regen: int) -> int:
    return lit_type | (regen << 3)  # size_format 0 (bit2 = 0), 5-bit size


def _lit_header(lit_type: int, regen: int) -> bytes:
    if regen <= 31:
        return bytes([_lit_header_byte(lit_type, regen)])
    if regen <= 4095:
        v = lit_type | (1 << 2) | (regen << 4)
        return v.to_bytes(2, "little")
    if regen >= (1 << 20):
        raise EncodeError("literals section too large")
    v = lit_type | (3 << 2) | (regen << 4)
    return v.to_bytes(3, "little")


def _lit_header_compressed(lit_type: int, regen: int, comp: int,
                           four_streams: bool) -> bytes | None:
    if not four_streams:
        if regen > 1023 or comp > 1023:
            return None
        v = lit_type | (0 << 2) | (regen << 4) | (comp << 14)
        return v.to_bytes(3, "little")
    if regen <= 1023 and comp <= 1023:
        v = lit_type | (1 << 2) | (regen << 4) | (comp << 14)
        return v.to_bytes(3, "little")
    if regen <= (1 << 14) - 1 and comp <= (1 << 14) - 1:
        v = lit_type | (2 << 2) | (regen << 4) | (comp << 18)
        return v.to_bytes(4, "little")
    if regen <= (1 << 18) - 1 and comp <= (1 << 18) - 1:
        v = lit_type | (3 << 2) | (regen << 4) | (comp << 22)
        return v.to_bytes(5, "little")
    return None


def _seqnum_varint(n: int) -> bytes:
    if n < 128:
        return bytes([n])
    if n < 0x7F00:
        return bytes([(n >> 8) + 128, n & 0xFF])
    if n - 0x7F00 > 0xFFFF:
        raise EncodeError("too many sequences")
    return bytes([255]) + (n - 0x7F00).to_bytes(2, "little")


def _mode_and_table(codes, max_log: int, writer: BitWriter):
    """Choose RLE or FSE_Compressed per code stream; write table bytes.

    Returns (mode, encode_table_or_rle_symbol).
    """
    first = codes[0]
    if all(c == first for c in codes):
        writer.append_bytes(bytes([first]))
        return C.MODE_RLE, first
    counts = np.bincount(np.asarray(codes, dtype=np.int64))
    table_log = fse_enc.optimal_table_log(max_log, len(codes), int(np.count_nonzero(counts)))
    probs = fse_enc.normalize_counts(list(counts), table_log, len(codes))
    while probs and probs[-1] == 0:
        probs.pop()
    table = fse_enc.build_encode_table(probs, table_log)
    fse_enc.write_table_description(probs, table_log, writer)
    return C.MODE_FSE, table


def encode_sequences_section(seqs: list[RawSequence], out: bytearray) -> None:
    """Append the sequences section: varint, mode byte, tables, bitstream."""
    triples = [(len(s.literals), s.match_len, s.offset + 3)
               for s in seqs if s.match_len > 0]
    n = len(triples)
    out.extend(_seqnum_varint(n))
    if n == 0:
        return

    ll_codes = [ll_code(ll) for ll, _, _ in triples]
    ml_codes = [ml_code(ml) for _, ml, _ in triples]
    of_codes = [of_code_of(of) for _, _, of in triples]

    tw = BitWriter()
    ll_mode, ll_t = _mode_and_table(ll_codes, C.LL_MAX_LOG, tw)
    of_mode, of_t = _mode_and_table(of_codes, C.OF_MAX_LOG, tw)
    ml_mode, ml_t = _mode_and_table(ml_codes, C.ML_MAX_LOG, tw)
    out.append((ll_mode << 6) | (of_mode << 4) | (ml_mode << 2))
    out.extend(tw.dump())

    w = BitWriter()
    ll_enc = _make_state(ll_t, ll_mode)
    of_enc = _make_state(of_t, of_mode)
    ml_enc = _make_state(ml_t, ml_mode)

    last = n - 1
    if ml_enc:
        ml_enc.init_state(ml_codes[last])
    if of_enc:
        of_enc.init_state(of_codes[last])
    if ll_enc:
        ll_enc.init_state(ll_codes[last])
    _add_extra_bits(w, triples[last], ll_codes[last], ml_codes[last], of_codes[last])

    for i in range(n - 2, -1, -1):
        if of_enc:
            of_enc.encode_symbol(of_codes[i], w)
        if ml_enc:
            ml_enc.encode_symbol(ml_codes[i], w)
        if ll_enc:
            ll_enc.encode_symbol(ll_codes[i], w)
        _add_extra_bits(w, triples[i], ll_codes[i], ml_codes[i], of_codes[i])

    if ml_enc:
        ml_enc.flush(w)
    if of_enc:
        of_enc.flush(w)
    if ll_enc:
        ll_enc.flush(w)
    w.write_bits(1, 1)
    w.write_bits(0, (8 - w.index() % 8) % 8)
    out.extend(w.dump())


def _make_state(table_or_sym, mode):
    if mode == C.MODE_RLE:
        return None  # zero-bit states: nothing on the wire
    return fse_enc.FSEEncoder(table_or_sym)


def _add_extra_bits(w: BitWriter, triple, llc: int, mlc: int, ofc: int) -> None:
    ll, ml, of = triple
    w.write_bits(ll - C.LL_CODE_BASELINE[llc], C.LL_CODE_EXTRA_BITS[llc])
    w.write_bits(ml - C.ML_CODE_BASELINE[mlc], C.ML_CODE_EXTRA_BITS[mlc])
    w.write_bits(of - (1 << ofc), ofc)


def compress_block(block: bytes, matcher=None) -> bytes | None:
    """Produce compressed-block content, or None when it does not pay
    (caller falls back to a Raw block — levels/fastest.rs:49-57)."""
    seqs = matcher.find(block) if matcher is not None else find_sequences(block)
    lits = b"".join(s.literals for s in seqs)
    out = bytearray()
    encode_literals_section(lits, out)
    encode_sequences_section(seqs, out)
    if len(out) >= len(block):
        return None
    return bytes(out)
