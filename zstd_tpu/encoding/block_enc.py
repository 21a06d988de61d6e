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


def choose_offset_value(offset: int, ll: int, hist: list[int]) -> int:
    """Pick the cheapest of_value for `offset` given the repeat-offset
    history, mutating `hist` exactly like the decoder's resolve_offset.

    Repcodes cost of_code 0-1 (0-1 extra bits) vs log2(offset) bits for a
    literal offset — the reference leaves this on the table
    (blocks/compressed.rs:27 TODO), so exploiting it strictly improves size.
    """
    if ll != 0:
        candidates = ((1, hist[0]), (2, hist[1]), (3, hist[2]))
    else:
        candidates = ((1, hist[1]), (2, hist[2]), (3, hist[0] - 1))
    of_value = offset + 3
    for ov, cand in candidates:
        if cand == offset and cand > 0:
            of_value = ov
            break
    # replay the decoder's history update
    if of_value > 3:
        hist[2] = hist[1]
        hist[1] = hist[0]
        hist[0] = offset
    else:
        idx = of_value + 1 if ll == 0 else of_value
        if idx == 2:
            hist[1] = hist[0]
            hist[0] = offset
        elif idx in (3, 4):
            hist[2] = hist[1]
            hist[1] = hist[0]
            hist[0] = offset
    return of_value


def ll_code(v: int) -> int:
    c = bisect.bisect_right(C.LL_CODE_BASELINE, v) - 1
    return c


def ml_code(v: int) -> int:
    return bisect.bisect_right(C.ML_CODE_BASELINE, v) - 1


def of_code_of(of_value: int) -> int:
    return of_value.bit_length() - 1


def _stream_payload_bytes(table, arr: np.ndarray, four: bool) -> int:
    """Exact encoded payload size (bytes) of `arr` under `table`: per stream
    sum of code lengths + 1 terminator bit, byte-padded; 6-byte jump table
    when four streams (huff0_encoder.rs:39-104 framing)."""
    lens = table.lengths[arr].astype(np.int64)
    if not four:
        return (int(lens.sum()) + 1 + 7) // 8
    split = -(-len(arr) // 4)
    total = 6
    for s in range(0, len(arr), split):
        total += (int(lens[s:s + split].sum()) + 1 + 7) // 8
    return total


def encode_literals_section(lits: bytes, writer_out: bytearray,
                            prev_table=None):
    """Append the literals section (header + payload), choosing the smallest
    of Raw / RLE / Huffman-compressed / Treeless representations.

    `prev_table` is the frame's previous Huffman table (cross-block state,
    compressed.rs:314-377); Treeless (type 3) is emitted when reusing it
    beats writing a fresh table description. Returns the table that is
    current after this section (raw/RLE sections leave it untouched)."""
    n = len(lits)
    if n == 0:
        writer_out.append(_lit_header_byte(C.LIT_RAW, 0))
        return prev_table
    if lits.count(lits[0]) == n:
        writer_out.extend(_lit_header(C.LIT_RLE, n))
        writer_out.append(lits[0])
        return prev_table

    best = None
    out_table = prev_table
    if n > 63:
        arr = np.frombuffer(lits, np.uint8)
        counts = np.bincount(arr, minlength=256)
        four = n >= 256
        new_table = None
        desc = b""
        cost_new = 1 << 62
        try:
            new_table = huff0_enc.build_from_counts(counts)
            tw = BitWriter()
            huff0_enc.write_table_description(new_table, tw)
            desc = tw.dump()
            cost_new = len(desc) + _stream_payload_bytes(new_table, arr, four)
        except EncodeError:
            new_table = None
        cost_reuse = 1 << 62
        if (prev_table is not None
                and len(prev_table.lengths) > int(arr.max())
                and np.all(prev_table.lengths[arr] > 0)):
            cost_reuse = _stream_payload_bytes(prev_table, arr, four)
        table, lit_type = (
            (prev_table, C.LIT_TREELESS) if cost_reuse < cost_new
            else (new_table, C.LIT_COMPRESSED))
        comp_size = min(cost_reuse, cost_new)
        if table is not None:
            payload = (huff0_enc.encode_4stream(table, lits) if four
                       else huff0_enc.encode_1stream(table, lits))
            if lit_type == C.LIT_COMPRESSED:
                payload = desc + payload
            assert len(payload) == comp_size, "payload cost model mismatch"
            header = _lit_header_compressed(lit_type, n, comp_size, four)
            if (header is not None
                    and len(header) + comp_size < 1 + _raw_header_len(n) + n):
                best = header + payload
                out_table = table
    if best is not None:
        writer_out.extend(best)
        return out_table
    writer_out.extend(_lit_header(C.LIT_RAW, n))
    writer_out.extend(lits)
    return prev_table


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


_PREDEF_ENC = {}


def _predefined_encode_table(kind: str):
    if kind not in _PREDEF_ENC:
        dist, log = {
            "ll": (C.LL_DEFAULT_DIST, C.LL_DEFAULT_ACC_LOG),
            "of": (C.OF_DEFAULT_DIST, C.OF_DEFAULT_ACC_LOG),
            "ml": (C.ML_DEFAULT_DIST, C.ML_DEFAULT_ACC_LOG),
        }[kind]
        _PREDEF_ENC[kind] = fse_enc.build_encode_table(list(dist), log)
    return _PREDEF_ENC[kind]


def _sim_bits(table, codes) -> int:
    """Exact bit cost of one code stream under `table` (init emits nothing,
    each later symbol emits state bits, flush emits table_log)."""
    enc = fse_enc.FSEEncoder(table)
    enc.init_state(codes[-1])
    state = enc.state
    try:
        from zstd_tpu.runtime import fse_sim_bits

        r = fse_sim_bits(codes, table.delta_nb_bits, table.delta_find_state,
                         table.next_state, state, table.table_log)
        if r is not None:
            return r
    except Exception:
        pass
    bits = 0
    nbt = table.delta_nb_bits
    fst = table.delta_find_state
    ns = table.next_state
    for c in reversed(codes[:-1]):
        nb = (state + int(nbt[c])) >> 16
        bits += nb
        state = int(ns[(state >> nb) + int(fst[c])])
    return bits + table.table_log


def _mode_and_table(codes, max_log: int, writer: BitWriter, kind: str = None):
    """Choose RLE / Predefined / FSE_Compressed by exact encoded size and
    write the table bytes. Returns (mode, encode_table_or_rle_symbol).

    The reference always writes fresh tables (choose_table scaffolding at
    blocks/compressed.rs:119-135); picking the cheapest of the three modes
    is a strict size improvement.
    """
    codes = np.asarray(codes, dtype=np.int64)
    first = int(codes[0])
    if np.all(codes == first):
        writer.append_bytes(bytes([first]))
        return C.MODE_RLE, first
    counts = np.bincount(codes)
    table_log = fse_enc.optimal_table_log(max_log, len(codes), int(np.count_nonzero(counts)))
    probs = fse_enc.normalize_counts(list(counts), table_log, len(codes))
    while probs and probs[-1] == 0:
        probs.pop()
    table = fse_enc.build_encode_table(probs, table_log)
    dw = BitWriter()
    fse_enc.write_table_description(probs, table_log, dw)
    desc = dw.dump()

    if kind is not None:
        pre = _predefined_encode_table(kind)
        max_code = len(pre.probs) - 1
        if max(codes) <= max_code:
            cost_custom = len(desc) * 8 + _sim_bits(table, codes)
            cost_pre = _sim_bits(pre, codes)
            if cost_pre <= cost_custom:
                return C.MODE_PREDEFINED, pre
    writer.append_bytes(desc)
    return C.MODE_FSE, table


def make_triples(seqs: list[RawSequence], offset_hist: list[int] | None) -> list:
    """(ll, ml, of_value) triples with repeat-offset exploitation when a
    history list is provided (mutated in place, frame-scoped)."""
    triples = []
    for s in seqs:
        if s.match_len <= 0:
            continue
        ll = len(s.literals)
        if offset_hist is not None:
            ofv = choose_offset_value(s.offset, ll, offset_hist)
        else:
            ofv = s.offset + 3
        triples.append((ll, s.match_len, ofv))
    return triples


def encode_sequences_section(seqs: list[RawSequence], out: bytearray,
                             offset_hist: list[int] | None = None) -> None:
    """Append the sequences section: varint, mode byte, tables, bitstream."""
    triples = make_triples(seqs, offset_hist)
    n = len(triples)
    out.extend(_seqnum_varint(n))
    if n == 0:
        return

    ll_codes = [ll_code(ll) for ll, _, _ in triples]
    ml_codes = [ml_code(ml) for _, ml, _ in triples]
    of_codes = [of_code_of(of) for _, _, of in triples]

    tw = BitWriter()
    ll_mode, ll_t = _mode_and_table(ll_codes, C.LL_MAX_LOG, tw, "ll")
    of_mode, of_t = _mode_and_table(of_codes, C.OF_MAX_LOG, tw, "of")
    ml_mode, ml_t = _mode_and_table(ml_codes, C.ML_MAX_LOG, tw, "ml")
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


def _seq_codes(llv, mlv, ofv):
    """Vectorized spec code mapping for (ll, ml, of_value) arrays."""
    llc = np.searchsorted(np.asarray(C.LL_CODE_BASELINE), llv, "right") - 1
    mlc = np.searchsorted(np.asarray(C.ML_CODE_BASELINE), mlv, "right") - 1
    ofc = np.frexp(ofv.astype(np.float64))[1] - 1  # floor(log2), exact < 2^53
    return llc.astype(np.int64), mlc.astype(np.int64), ofc.astype(np.int64)


def encode_sequences_section_arrays(lit_lens, offsets, match_lens, out,
                                    offset_hist=None, rt=None) -> bool:
    """Native-array twin of encode_sequences_section; returns False when
    the native runtime cannot serve it (caller uses the Python path)."""
    from zstd_tpu.oracle.sequences import _native_runtime

    rt = rt or _native_runtime()
    if rt is None:
        return False
    llv, mlv, ofv = rt.make_triples(lit_lens, offsets, match_lens,
                                    offset_hist)
    n = len(llv)
    out.extend(_seqnum_varint(n))
    if n == 0:
        return True
    llc, mlc, ofc = _seq_codes(llv, mlv, ofv)
    tw = BitWriter()
    ll_mode, ll_t = _mode_and_table(llc, C.LL_MAX_LOG, tw, "ll")
    of_mode, of_t = _mode_and_table(ofc, C.OF_MAX_LOG, tw, "of")
    ml_mode, ml_t = _mode_and_table(mlc, C.ML_MAX_LOG, tw, "ml")
    out.append((ll_mode << 6) | (of_mode << 4) | (ml_mode << 2))
    out.extend(tw.dump())
    kinds = {"ll": None if ll_mode == C.MODE_RLE else ll_t,
             "of": None if of_mode == C.MODE_RLE else of_t,
             "ml": None if ml_mode == C.MODE_RLE else ml_t}
    blob = rt.encode_seq_stream(llv, mlv, ofv, kinds)
    if blob is None:
        raise EncodeError("native sequence stream encode failed")
    out.extend(blob)
    return True


def compress_block(block: bytes, matcher=None,
                   offset_hist: list[int] | None = None,
                   huff_cell: list | None = None,
                   fctx=None) -> bytes | None:
    """Produce compressed-block content, or None when it does not pay
    (caller falls back to a Raw block — levels/fastest.rs:49-57).

    `offset_hist` is the frame's repeat-offset history and `huff_cell` a
    one-element cell holding the frame's previous Huffman table (Treeless
    reuse state); the caller commits both only when the compressed form is
    actually emitted. `fctx` (match_gen.FrameMatchCtx view already pushed:
    a (buf, base, lo, hi) tuple plus the ctx) enables cross-block match
    sources; without it the block matches standalone.
    """
    from zstd_tpu.oracle.sequences import _native_runtime

    prev_huff = huff_cell[0] if huff_cell else None
    rt = _native_runtime()
    if matcher is None and rt is not None:
        if fctx is not None:
            ctx, (buf, base, lo, hi) = fctx
            # snapshot: if this hybrid attempt fails mid-way, the Python
            # finder below must rescan against the PRE-attempt table or the
            # output diverges from the pure-Python (ZT_NO_NATIVE) path
            table_snap = ctx.table.copy()
            arrs = rt.find_sequences_arrays_ctx(buf, base, lo, hi,
                                                ctx.table, ctx.max_off)
        else:
            arrs = rt.find_sequences_arrays(block)
        if arrs is not None:
            lit_lens, offsets, match_lens = arrs
            # literals = the non-matched spans, in order (vectorized
            # segment gather: position of literal byte j of record i is
            # rec_start[i] + j, packed densely at out_off[i] + j)
            ll64 = lit_lens.astype(np.int64)
            spans = ll64 + match_lens
            rec_start = np.cumsum(spans) - spans
            out_off = np.cumsum(ll64) - ll64
            total = int(ll64.sum())
            idx = (np.repeat(rec_start - out_off, ll64)
                   + np.arange(total, dtype=np.int64))
            lits = np.frombuffer(block, np.uint8)[idx].tobytes()
            out = bytearray()
            cur = encode_literals_section(lits, out, prev_huff)
            if encode_sequences_section_arrays(lit_lens, offsets,
                                               match_lens, out,
                                               offset_hist, rt):
                if len(out) >= len(block):
                    return None
                if huff_cell is not None:
                    huff_cell[0] = cur
                return bytes(out)

    if matcher is not None:
        seqs = matcher.find(block)
    elif fctx is not None:
        from zstd_tpu.encoding.match_gen import find_sequences_ctx

        ctx, (buf, base, lo, hi) = fctx
        if rt is not None:
            np.copyto(ctx.table, table_snap)  # undo the failed attempt
        seqs = find_sequences_ctx(buf, base, lo, hi, ctx.table, ctx.max_off)
    else:
        seqs = find_sequences(block)
    lits = b"".join(s.literals for s in seqs)
    out = bytearray()
    cur = encode_literals_section(lits, out, prev_huff)
    encode_sequences_section(seqs, out, offset_hist)
    if len(out) >= len(block):
        return None
    if huff_cell is not None:
        huff_cell[0] = cur
    return bytes(out)
