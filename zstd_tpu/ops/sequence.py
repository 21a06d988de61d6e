"""Batched interleaved 3-state tANS sequence decoding on device.

Parity with the hot loop of sequence_section_decoder.rs:154-221: per lane
(= one compressed block) a `lax.scan` step decodes one sequence — three
packed-table gathers (of/ml/ll), the fused extra-bit reads in OF→ML→LL order,
and the LL→ML→OF state updates (skipped on the final sequence). Offsets above
2^25 are read as two windows so u32 gathers suffice.

Also provides the repeat-offset resolution scan (sequence_execution.rs:59-115
semantics) vectorized across frame lanes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zstd_tpu.common import constants as C
from zstd_tpu.ops.bitstream import build_windows_u32, read_bits_u32

# code -> (baseline, extra bits) LUTs as device constants
LL_BASE = np.array(C.LL_CODE_BASELINE, dtype=np.int32)
LL_XTRA = np.array(C.LL_CODE_EXTRA_BITS, dtype=np.int32)
ML_BASE = np.array(C.ML_CODE_BASELINE, dtype=np.int32)
ML_XTRA = np.array(C.ML_CODE_EXTRA_BITS, dtype=np.int32)


def pack_fse_table(table, width: int) -> np.ndarray:
    """Oracle FSETable -> u32[width] rows: symbol | num_bits<<8 | baseline<<16."""
    out = np.zeros(width, dtype=np.uint32)
    sz = table.size
    out[:sz] = (table.symbol.astype(np.uint32)
                | (table.num_bits.astype(np.uint32) << 8)
                | (table.base_line.astype(np.uint32) << 16))
    return out


@functools.partial(jax.jit, static_argnames=("max_seqs",))
def decode_sequence_lanes(streams_u8,   # (B, L) u8
                          init_pos,     # (B,) i32, -1 invalid
                          nseq,         # (B,) i32
                          ll_tid, of_tid, ml_tid,       # (B,) i32
                          ll_tables, of_tables, ml_tables,  # (T, 512/256/512) u32
                          ll_logs, of_logs, ml_logs,    # (T,) i32 acc logs
                          max_seqs: int):
    """Returns (ll, ml, ofv) i32 (B, max_seqs) + ok (B,) bool."""
    windows = build_windows_u32(streams_u8)
    B = streams_u8.shape[0]
    lane = jnp.arange(B, dtype=jnp.int32)

    ll_log = ll_logs[ll_tid]
    of_log = of_logs[of_tid]
    ml_log = ml_logs[ml_tid]

    # init order: LL, OF, ML (RFC 8878 §3.1.1.3.2.1.2)
    s_ll, pos = read_bits_u32(windows, lane, init_pos, ll_log)
    s_of, pos = read_bits_u32(windows, lane, pos, of_log)
    s_ml, pos = read_bits_u32(windows, lane, pos, ml_log)
    ok0 = (init_pos >= 0) & (pos >= 0)

    ll_base = jnp.asarray(LL_BASE)
    ll_xtra = jnp.asarray(LL_XTRA)
    ml_base = jnp.asarray(ML_BASE)
    ml_xtra = jnp.asarray(ML_XTRA)

    def step(carry, i):
        s_ll, s_of, s_ml, pos, ok = carry
        active = i < nseq
        not_last = i < nseq - 1

        e_of = of_tables[of_tid, s_of.astype(jnp.int32)]
        e_ml = ml_tables[ml_tid, s_ml.astype(jnp.int32)]
        e_ll = ll_tables[ll_tid, s_ll.astype(jnp.int32)]
        code_ok = (((e_of & 0xFF) <= 31) & ((e_ml & 0xFF) <= 52)
                   & ((e_ll & 0xFF) <= 35))
        of_code = jnp.minimum((e_of & 0xFF).astype(jnp.int32), 31)
        ml_code = jnp.minimum((e_ml & 0xFF).astype(jnp.int32), 52)
        ll_code = jnp.minimum((e_ll & 0xFF).astype(jnp.int32), 35)

        # extra bits: OF first (two-part read for >25 bits), then ML, then LL
        n_hi = jnp.maximum(of_code - 16, 0)
        n_lo = of_code - n_hi
        zero = jnp.zeros_like(pos)
        r_hi, pos1 = read_bits_u32(windows, lane, pos, jnp.where(active, n_hi, zero))
        r_lo, pos2 = read_bits_u32(windows, lane, pos1, jnp.where(active, n_lo, zero))
        ofv = (jnp.int32(1) << of_code) + ((r_hi.astype(jnp.int32) << n_lo) | r_lo.astype(jnp.int32))

        mlb = jnp.where(active, ml_xtra[ml_code], 0)
        r_ml, pos3 = read_bits_u32(windows, lane, pos2, mlb)
        ml = ml_base[ml_code] + r_ml.astype(jnp.int32)

        llb = jnp.where(active, ll_xtra[ll_code], 0)
        r_llx, pos4 = read_bits_u32(windows, lane, pos3, llb)
        ll = ll_base[ll_code] + r_llx.astype(jnp.int32)

        # state updates LL -> ML -> OF, skipped after the final sequence
        nb_ll = jnp.where(not_last, ((e_ll >> 8) & 0xFF).astype(jnp.int32), 0)
        b_ll, pos5 = read_bits_u32(windows, lane, pos4, nb_ll)
        s_ll2 = (e_ll >> 16).astype(jnp.int32) + b_ll.astype(jnp.int32)

        nb_ml = jnp.where(not_last, ((e_ml >> 8) & 0xFF).astype(jnp.int32), 0)
        b_ml, pos6 = read_bits_u32(windows, lane, pos5, nb_ml)
        s_ml2 = (e_ml >> 16).astype(jnp.int32) + b_ml.astype(jnp.int32)

        nb_of = jnp.where(not_last, ((e_of >> 8) & 0xFF).astype(jnp.int32), 0)
        b_of, pos7 = read_bits_u32(windows, lane, pos6, nb_of)
        s_of2 = (e_of >> 16).astype(jnp.int32) + b_of.astype(jnp.int32)

        new_ok = jnp.where(active, ok & (pos7 >= 0) & code_ok, ok)
        s_ll = jnp.where(active, s_ll2, s_ll)
        s_ml = jnp.where(active, s_ml2, s_ml)
        s_of = jnp.where(active, s_of2, s_of)
        new_pos = jnp.where(active, pos7, pos)
        outs = (jnp.where(active, ll, 0), jnp.where(active, ml, 0),
                jnp.where(active, ofv, 0))
        return (s_ll, s_of, s_ml, new_pos, new_ok), outs

    init = (s_ll.astype(jnp.int32), s_of.astype(jnp.int32),
            s_ml.astype(jnp.int32), pos, ok0)
    (_, _, _, pos_f, ok), (ll, ml, ofv) = jax.lax.scan(
        step, init, jnp.arange(max_seqs, dtype=jnp.int32))
    # strict end condition: bits exactly exhausted (bits_remaining == 0)
    ok = ok & (pos_f == 0)
    ok = jnp.where(nseq > 0, ok, True)
    return ll.T, ml.T, ofv.T, ok


@functools.partial(jax.jit, static_argnames=())
def resolve_offsets(ll,        # (B, S) i32 literal lengths per sequence
                    ofv,       # (B, S) i32 raw offset values (of_value)
                    is_real,   # (B, S) bool: real sequence (repcode rules)
                    init_hist,  # (B, 3) i32 initial repeat offsets
                    ):
    """Vectorized repeat-offset history scan across frame lanes.

    Synthetic sequences (is_real False — RLE blocks, raw blocks, trailing
    literal runs) carry pre-resolved offsets in `ofv` and do not touch the
    history. Returns (offsets (B, S) i32, ok (B, S) bool).
    """
    def step(hist, xs):
        llv, of_value, real = xs
        r1, r2, r3 = hist[:, 0], hist[:, 1], hist[:, 2]
        idx = jnp.where(llv == 0, of_value + 1, of_value)
        rep_offset = jnp.where(idx == 1, r1,
                       jnp.where(idx == 2, r2,
                         jnp.where(idx == 3, r3, jnp.maximum(r1 - 1, 0))))
        new_off = jnp.where(of_value > 3, of_value - 3, rep_offset)
        ok = ~real | (new_off > 0)
        # history update
        shift2 = (of_value > 3) | (idx >= 3)   # full shift: [new, r1, r2]
        shift1 = idx == 2                      # swap: [r2, r1, r3]
        n1 = jnp.where(real & (shift2 | shift1), new_off, r1)
        n2 = jnp.where(real & (shift2 | shift1), r1, r2)
        n3 = jnp.where(real & shift2, r2, r3)
        new_hist = jnp.stack([n1, n2, n3], axis=1)
        return new_hist, (jnp.where(real, new_off, of_value), ok)

    _, (offsets, ok) = jax.lax.scan(
        step, init_hist, (ll.T, ofv.T, is_real.T))
    return offsets.T, jnp.all(ok, axis=0)


@functools.partial(jax.jit, static_argnames=())
def resolve_offsets_symbolic(ll,       # (B, S) i32
                             ofv,      # (B, S) i32
                             is_real,  # (B, S) bool
                             ):
    """Repeat-offset resolution with a SYMBOLIC initial history.

    For chained block groups (streamed big-frame decode) the repcode
    history threads sequentially through all groups, but each resolved
    offset is always either a constant or `init_hist[tag] - delta` of the
    group's incoming history — the transition family {const, pick-and-
    decrement, permute} is closed under composition. So every group scans
    independently here, and the cheap per-chain composition + fixup happens
    in apply_hist/compose_hist. Matches resolve_offsets semantics except
    the r1-1 zero-clamp (sequence_execution.rs:90): a clamped offset is 0,
    which fixup flags invalid anyway, so lanes only diverge after they are
    already poisoned.

    Returns (tag (B,S) i32 0..2 = init slot | 3 = const,
             val (B,S) i32 (delta for slots, value for consts),
             trans_tag (B,3), trans_val (B,3): the group's final history as
             a function of its incoming history).
    """
    def step(hist, xs):
        llv, of_value, real = xs
        t1, t2, t3 = hist[:, 0], hist[:, 1], hist[:, 2]
        v1, v2, v3 = hist[:, 3], hist[:, 4], hist[:, 5]
        idx = jnp.where(llv == 0, of_value + 1, of_value)
        sel_t = jnp.where(idx == 2, t2, jnp.where(idx == 3, t3, t1))
        # "repcode1 - 1": slot deltas grow (+1), const values shrink (-1)
        dec1 = jnp.where(t1 == 3, v1 - 1, v1 + 1)
        sel_v = jnp.where(idx == 2, v2,
                          jnp.where(idx == 3, v3,
                                    jnp.where(idx >= 4, dec1, v1)))
        is_lit = of_value > 3
        out_t = jnp.where(real & ~is_lit, sel_t, 3)
        out_v = jnp.where(real, jnp.where(is_lit, of_value - 3, sel_v),
                          of_value)
        shift = real & (is_lit | (idx >= 2))
        shift2 = real & (is_lit | (idx >= 3))
        n1t = jnp.where(shift, out_t, t1)
        n1v = jnp.where(shift, out_v, v1)
        n2t = jnp.where(shift, t1, t2)
        n2v = jnp.where(shift, v1, v2)
        n3t = jnp.where(shift2, t2, t3)
        n3v = jnp.where(shift2, v2, v3)
        new_hist = jnp.stack([n1t, n2t, n3t, n1v, n2v, n3v], axis=1)
        return new_hist, (out_t, out_v)

    B = ll.shape[0]
    init = jnp.tile(jnp.array([0, 1, 2, 0, 0, 0], jnp.int32), (B, 1))
    fin, (tag, val) = jax.lax.scan(
        step, init, (ll.T, ofv.T, is_real.T))
    return (tag.T, val.T, fin[:, 0:3], fin[:, 3:6])


def apply_hist(tag, val, hist):
    """Concrete values for symbolic (tag, val) rows given the incoming
    history `hist` (..., 3): hist[tag] - val, or val when tag == 3."""
    picked = jnp.take_along_axis(hist, jnp.minimum(tag, 2), axis=-1)
    return jnp.where(tag == 3, val, picked - val)


def compose_hist(trans_tag, trans_val, hist):
    """The outgoing history of a group given its incoming history."""
    return apply_hist(trans_tag, trans_val, hist)
