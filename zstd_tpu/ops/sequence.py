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


def _rec_symbols(ll, ofv, is_real):
    """Per-record symbolic output + history transition — DATA-PARALLEL.

    Every record's effect is expressible relative to its own incoming
    repcode history as a symbol (t, v): value = hist[t] - v for t in 0..2,
    or the constant v at t == 3; and its history transition as three such
    symbols (the new slot contents). No scan carry is needed to build
    them, which is what makes the chunked prefix composition below work.

    Returns (o_t, o_v) (B,S) record outputs and (tt, tv) (B,S,3) slot
    transitions.
    """
    idx = jnp.where(ll == 0, ofv + 1, ofv)
    is_lit = ofv > 3
    o_t = jnp.where(~is_real | is_lit, 3,
                    jnp.where(idx == 2, 1, jnp.where(idx == 3, 2, 0)))
    o_v = jnp.where(~is_real, ofv,
                    jnp.where(is_lit, ofv - 3,
                              jnp.where(idx >= 4, 1, 0)))
    shift = is_real & (is_lit | (idx >= 2))
    shift2 = is_real & (is_lit | (idx >= 3))
    zero = jnp.zeros_like(o_t)
    t1 = jnp.where(shift, o_t, zero)
    v1 = jnp.where(shift, o_v, zero)
    t2 = jnp.where(shift, zero, zero + 1)
    t3 = jnp.where(shift2, zero + 1, zero + 2)
    # slots stay SEPARATE arrays: a trailing size-3 axis pads its vreg
    # minor dim 3->128 on TPU (~42x memory/compute bloat — measured as a
    # 27x batched-decode regression when these rode a (..., 3) layout)
    return o_t, o_v, (t1, t2, t3, v1, zero, zero)


def _sel3(x0, x1, x2, tag):
    """Pick among three same-shape arrays by per-element tag (0..2)."""
    return jnp.where(tag == 0, x0, jnp.where(tag == 1, x1, x2))


def _compose_sym(a, b):
    """Compose history transforms: (a then b). Each transform is a 6-tuple
    (t1, t2, t3, v1, v2, v3) of same-shape arrays; slot s means
    hist_out[s] = hist_in[t_s] - v_s for t_s in 0..2, const v_s at 3."""
    at1, at2, at3, av1, av2, av3 = a
    out = []
    for bt, bv in zip(b[0:3], b[3:6]):
        bc = jnp.clip(bt, 0, 2)
        ts = _sel3(at1, at2, at3, bc)
        vs = _sel3(av1, av2, av3, bc)
        ct = jnp.where(bt == 3, 3, ts)
        cv = jnp.where(bt == 3, bv, jnp.where(ts == 3, vs - bv, vs + bv))
        out.append((ct, cv))
    return (out[0][0], out[1][0], out[2][0],
            out[0][1], out[1][1], out[2][1])


def _prefix_compose(ll, ofv, is_real):
    """Chunked symbolic prefix composition over the sequence-slot axis.

    The old formulation was one lax.scan over all S slots (~1 us/step of
    XLA dispatch: 30+ ms at S = 32K — the whole 'resolve' stage budget,
    r5 measured). Transitions compose associatively, so: an inner K-step
    scan runs VECTORIZED across all S/K chunks at once, a short cross-
    chunk scan composes chunk totals, and each record's full prefix is
    one extra compose — K + S/K sequential steps instead of S.

    Returns per-record (tag, val) RELATIVE TO THE ROW START (B, S) and
    the row-total transition (B, 3) x2.
    """
    B, S = ll.shape
    # C (chunk count) is the minor dim after chunking — keep it >= 128 so
    # vregs stay full (a minor dim below 128 pads away compute); K (steps
    # per chunk) grows with S past 16K so sequential steps stay ~K + C
    C = 128
    while C * C < S:
        C *= 2
    K = max(1, -(-S // C))
    pad = K * C - S
    if pad:
        # identity padding: is_real False, ofv 0 records do not touch the
        # history and emit const symbols that nothing reads
        ll = jnp.pad(ll, ((0, 0), (0, pad)))
        ofv = jnp.pad(ofv, ((0, 0), (0, pad)))
        is_real = jnp.pad(is_real, ((0, 0), (0, pad)))
    Sp = S + pad
    o_t, o_v, trans = _rec_symbols(ll, ofv, is_real)

    def ckq(x):  # (B, Sp) -> (K, B, C): chunk the slot axis, K leading
        return x.reshape(B, C, K).transpose(2, 0, 1)

    xs = tuple(ckq(t) for t in trans)
    zero = jnp.zeros((B, C), jnp.int32)
    ident = (zero, zero + 1, zero + 2, zero, zero, zero)

    def step(carry, x):
        return _compose_sym(carry, x), carry  # emit prefix BEFORE record

    tot, pfx = jax.lax.scan(step, ident, xs)

    ztot = jnp.zeros((B,), jnp.int32)
    ident_r = (ztot, ztot + 1, ztot + 2, ztot, ztot, ztot)

    row_tot, cpfx = jax.lax.scan(
        step, ident_r, tuple(t.transpose(1, 0) for t in tot))
    # full prefix before record = (chunk prefix) then (in-chunk prefix)
    cpfx_b = tuple(t.transpose(1, 0)[None] for t in cpfx)  # (1, B, C)
    ft1, ft2, ft3, fv1, fv2, fv3 = _compose_sym(cpfx_b, pfx)
    # record output relative to row start: prefix applied to its symbol
    oc = jnp.clip(ckq(o_t), 0, 2)
    ots = _sel3(ft1, ft2, ft3, oc)
    ovs = _sel3(fv1, fv2, fv3, oc)
    o_tr = ckq(o_t)
    o_vr = ckq(o_v)
    tag = jnp.where((o_tr == 3) | (ots == 3), 3, ots)
    val = jnp.where(o_tr == 3, o_vr,
                    jnp.where(ots == 3, ovs - o_vr, ovs + o_vr))
    tag = tag.transpose(1, 2, 0).reshape(B, Sp)[:, :S]
    val = val.transpose(1, 2, 0).reshape(B, Sp)[:, :S]
    row_t = jnp.stack(row_tot[0:3], axis=-1)
    row_v = jnp.stack(row_tot[3:6], axis=-1)
    return tag, val, row_t, row_v


@functools.partial(jax.jit, static_argnames=())
def resolve_offsets(ll,        # (B, S) i32 literal lengths per sequence
                    ofv,       # (B, S) i32 raw offset values (of_value)
                    is_real,   # (B, S) bool: real sequence (repcode rules)
                    init_hist,  # (B, 3) i32 initial repeat offsets
                    ):
    """Vectorized repeat-offset resolution across frame lanes.

    Synthetic sequences (is_real False — RLE blocks, raw blocks, trailing
    literal runs) carry pre-resolved offsets in `ofv` and do not touch the
    history. Returns (offsets (B, S) i32, ok (B,) bool).

    Note (parity): the reference's "repcode1 - 1" zero-clamp
    (sequence_execution.rs:90) is not applied — a clamped offset is 0,
    which the ok check flags invalid either way, so lanes only diverge
    after they are already poisoned.
    """
    tag, val, _, _ = _prefix_compose(ll, ofv, is_real)
    offsets = apply_hist(tag, val, init_hist)
    ok = ~is_real | (offsets > 0)
    return offsets, jnp.all(ok, axis=1)


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
    decrement, permute} is closed under composition. So every group
    resolves independently here (chunked prefix composition — see
    _prefix_compose), and the cheap per-chain composition + fixup happens
    in apply_hist/compose_hist.

    Returns (tag (B,S) i32 0..2 = init slot | 3 = const,
             val (B,S) i32 (delta for slots, value for consts),
             trans_tag (B,3), trans_val (B,3): the group's final history as
             a function of its incoming history).
    """
    return _prefix_compose(ll, ofv, is_real)


def apply_hist(tag, val, hist):
    """Concrete values for symbolic (tag, val) rows given the incoming
    history `hist` (..., 3): hist[tag] - val, or val when tag == 3.
    Where-selects, not take_along_axis: minor-dim gathers run at
    ~68 M elem/s on TPU (PERF.md) while selects vectorize fully."""
    picked = jnp.where(tag == 0, hist[..., 0:1],
                       jnp.where(tag == 1, hist[..., 1:2], hist[..., 2:3]))
    return jnp.where(tag == 3, val, picked - val)


def compose_hist(trans_tag, trans_val, hist):
    """The outgoing history of a group given its incoming history."""
    return apply_hist(trans_tag, trans_val, hist)
