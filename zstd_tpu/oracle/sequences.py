"""Sequence-section decoding: per-mode table setup and the interleaved
3-state tANS loop; plus sequence execution (LZ77 with repeat offsets).

Parity:
  - table setup per compression mode (Predefined/RLE/FSE/Repeat) with max
    accuracy logs LL=9/ML=9/OF=8 —
    /root/reference/ruzstd/src/decoding/sequence_section_decoder.rs:294-410
  - the hot 3-state loop: decode of/ml/ll codes, spec value tables, fused
    extra-bit reads (OF then ML then LL), state updates LL→ML→OF skipped for
    the final sequence, strict bits_remaining()==0 end check —
    sequence_section_decoder.rs:154-221
  - repeat-offset history resolution (ll==0 shift, repcode1-1 case) —
    sequence_execution.rs:59-115
"""

import dataclasses

from zstd_tpu.common import constants
from zstd_tpu.common.errors import (
    NotEnoughBytes,
    SequenceDecodeError,
    SequenceExecutionError,
)
from zstd_tpu.oracle import fse
from zstd_tpu.utils.bitio import BitReader, ReverseBitReader


@dataclasses.dataclass
class Sequence:
    ll: int
    ml: int
    of: int  # raw offset_value (pre repeat-offset resolution)


def update_fse_table(mode: int, data, prev: "fse.FSETable | None",
                     default_dist, default_acc_log: int, max_log: int,
                     what: str):
    """Returns (table, bytes_consumed). `prev` is the last-used table."""
    if mode == constants.MODE_PREDEFINED:
        return fse.build_table_from_probabilities(list(default_dist), default_acc_log), 0
    if mode == constants.MODE_RLE:
        if len(data) < 1:
            raise NotEnoughBytes(1, 0, f"{what} RLE byte")
        return fse.build_table_from_rle(data[0]), 1
    if mode == constants.MODE_FSE:
        rdr = BitReader(data)
        table = fse.parse_fse_table(rdr, max_log)
        return table, rdr.bits_read() // 8
    # MODE_REPEAT
    if prev is None:
        raise SequenceDecodeError(
            f"{what} repeat mode without a previous table or dictionary")
    return prev, 0


def _setup_tables(header, data, scratch) -> int:
    """Per-mode LL/OF/ML table updates on `scratch`; returns bytes consumed."""
    pos = 0
    scratch.ll_table, used = update_fse_table(
        header.ll_mode, data[pos:], scratch.ll_table,
        constants.LL_DEFAULT_DIST, constants.LL_DEFAULT_ACC_LOG,
        constants.LL_MAX_LOG, "literals-length")
    pos += used
    scratch.of_table, used = update_fse_table(
        header.of_mode, data[pos:], scratch.of_table,
        constants.OF_DEFAULT_DIST, constants.OF_DEFAULT_ACC_LOG,
        constants.OF_MAX_LOG, "offset")
    pos += used
    scratch.ml_table, used = update_fse_table(
        header.ml_mode, data[pos:], scratch.ml_table,
        constants.ML_DEFAULT_DIST, constants.ML_DEFAULT_ACC_LOG,
        constants.ML_MAX_LOG, "match-length")
    return pos + used


def decode_sequences(header, data, scratch) -> list[Sequence]:
    """Decode `header.num_sequences` from the sequences-section payload.

    `scratch` carries the cross-block entropy state (DecoderScratch); its
    ll/of/ml tables are updated in place per the mode byte.
    """
    pos = _setup_tables(header, data, scratch)

    bitstream = data[pos:]
    if len(bitstream) == 0:
        raise NotEnoughBytes(1, 0, "sequences bitstream")
    rev = ReverseBitReader(bitstream)

    ll_dec = fse.FSEDecoder(scratch.ll_table)
    of_dec = fse.FSEDecoder(scratch.of_table)
    ml_dec = fse.FSEDecoder(scratch.ml_table)
    ll_dec.init_state(rev)
    of_dec.init_state(rev)
    ml_dec.init_state(rev)

    ll_base = constants.LL_CODE_BASELINE
    ll_extra = constants.LL_CODE_EXTRA_BITS
    ml_base = constants.ML_CODE_BASELINE
    ml_extra = constants.ML_CODE_EXTRA_BITS

    n = header.num_sequences
    seqs: list[Sequence] = []
    for i in range(n):
        of_code = of_dec.decode_symbol()
        ml_code = ml_dec.decode_symbol()
        ll_code = ll_dec.decode_symbol()
        if of_code > 31:
            raise SequenceDecodeError(f"offset code {of_code} out of range")
        if ml_code > constants.ML_MAX_CODE:
            raise SequenceDecodeError(f"match-length code {ml_code} out of range")
        if ll_code > constants.LL_MAX_CODE:
            raise SequenceDecodeError(f"literals-length code {ll_code} out of range")

        # Extra bits are read OF → ML → LL (highest bits to OF).
        of_value = (1 << of_code) + rev.get_bits(of_code)
        ml = ml_base[ml_code] + rev.get_bits(ml_extra[ml_code])
        ll = ll_base[ll_code] + rev.get_bits(ll_extra[ll_code])
        seqs.append(Sequence(ll=ll, ml=ml, of=of_value))

        if i != n - 1:
            # State updates LL → ML → OF.
            ll_dec.update_state(rev)
            ml_dec.update_state(rev)
            of_dec.update_state(rev)
        if rev.bits_remaining() < 0:
            raise SequenceDecodeError("sequences bitstream exhausted early")

    if rev.bits_remaining() != 0:
        if rev.bits_remaining() > 0:
            raise SequenceDecodeError(
                f"{rev.bits_remaining()} extra bits left after the final sequence")
        raise SequenceDecodeError("sequences bitstream exhausted early")
    return seqs


_RT = None


def _native_runtime():
    """The native host runtime, or None (ZT_NO_NATIVE=1 forces Python).

    The module handle is memoized (this sits on the per-block framer path —
    a repeated importlib round-trip is measurable), but the env gate stays
    live so tests can toggle ZT_NO_NATIVE mid-process."""
    import os

    if os.environ.get("ZT_NO_NATIVE"):
        return None
    global _RT
    if _RT is None:
        try:
            from zstd_tpu import runtime

            if runtime.get_lib() is None:
                return None
            _RT = runtime
        except Exception:
            return None
    return _RT


def decode_and_execute(header, data, scratch, literals) -> bool:
    """Native fast path: tANS decode + repcode resolution + LZ77 execution
    straight into the scratch buffer (the reference's three hot loops in one
    C pass). Returns False when the native runtime is unavailable — callers
    then run decode_sequences + execute_sequences in Python. Raises the same
    typed errors as the Python path on malformed input."""
    rt = _native_runtime()
    if rt is None:
        return False

    pos = _setup_tables(header, data, scratch)
    bitstream = data[pos:]
    if len(bitstream) == 0:
        raise NotEnoughBytes(1, 0, "sequences bitstream")
    res = rt.decode_sequences(bitstream, header.num_sequences,
                              scratch.ll_table, scratch.of_table,
                              scratch.ml_table, scratch.offset_hist)
    if res is None:
        return False
    if isinstance(res, int):
        if res == -2:
            raise SequenceDecodeError("extra bits left after the final sequence")
        if res == -3:
            raise SequenceDecodeError("offset code out of range")
        if res == -4:
            raise SequenceDecodeError("match-length code out of range")
        if res == -5:
            raise SequenceDecodeError("literals-length code out of range")
        if res == -6:
            raise SequenceExecutionError("repeat offset decremented to zero")
        if res == -7:
            from zstd_tpu.common.errors import BitstreamError

            raise BitstreamError("reverse bitstream padding byte is zero")
        raise SequenceDecodeError("sequences bitstream exhausted early")
    ll, ml, off = res

    buffer = scratch.buffer
    base = len(buffer.buffer)
    total_add = len(literals) + int(ml.sum())
    buffer.buffer.extend(bytes(total_add))
    n = rt.execute_append(buffer.buffer, base, ll, ml, off, literals,
                          buffer.dict_content)
    if n is None or n != base + total_add:
        del buffer.buffer[base:]
        raise SequenceExecutionError(
            "sequence execution out of bounds (literals or match offset)")
    buffer.total_output += total_add
    return True


def resolve_offset(of_value: int, ll: int, hist: list[int]) -> int:
    """Repeat-offset resolution; mutates `hist` ([rep1, rep2, rep3])."""
    if of_value > 3:
        offset = of_value - 3
        hist[2] = hist[1]
        hist[1] = hist[0]
        hist[0] = offset
        return offset
    idx = of_value + 1 if ll == 0 else of_value
    if idx == 1:
        return hist[0]
    if idx == 2:
        offset = hist[1]
        hist[1] = hist[0]
        hist[0] = offset
        return offset
    if idx == 3:
        offset = hist[2]
        hist[2] = hist[1]
        hist[1] = hist[0]
        hist[0] = offset
        return offset
    # idx == 4: repcode1 - 1
    offset = hist[0] - 1
    if offset == 0:
        raise SequenceExecutionError("repeat offset decremented to zero")
    hist[2] = hist[1]
    hist[1] = hist[0]
    hist[0] = offset
    return offset


def execute_sequences(seqs, literals, buffer, offset_hist: list[int]) -> None:
    """Apply decoded sequences to the decode buffer; trailing literals appended."""
    lit_pos = 0
    for seq in seqs:
        if seq.ll:
            if lit_pos + seq.ll > len(literals):
                raise SequenceExecutionError(
                    f"sequence needs {seq.ll} literals, only "
                    f"{len(literals) - lit_pos} remain")
            buffer.push(literals[lit_pos:lit_pos + seq.ll])
            lit_pos += seq.ll
        offset = resolve_offset(seq.of, seq.ll, offset_hist)
        if seq.ml:
            buffer.repeat(offset, seq.ml)
    if lit_pos < len(literals):
        buffer.push(literals[lit_pos:])
