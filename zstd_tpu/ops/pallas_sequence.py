"""Pallas TPU kernel for interleaved 3-state tANS sequence decoding.

Replaces the lax.scan in ops/sequence.py::decode_sequence_lanes on real TPUs.
The XLA scan pays ~40 us per step (per-op dispatch + minor-dim gathers at
~70 M elem/s); here one kernel keeps all lane state in VMEM and does every
dynamic read as a one-hot select + sublane reduction (measured ~1.5 G
lookups/s on v5e, scripts/microbench_gather.py).

Layout: everything is transposed to (entries, lanes) so that
  - the bitstream is a (Nw, B) u32 word array; a bit read is two one-hot
    compares + masked sublane reductions (words w and w+1)
  - FSE tables are (width, B) per-lane stacks
  - per-step outputs are single dynamic-sublane row stores into (S, B)
    blocks, streamed to HBM by a chunked grid (VMEM holds one chunk)
  - decode state lives in VMEM scratch, persisting across grid steps

Semantics parity with sequence_section_decoder.rs:154-221 (decode order
OF->ML->LL extras, state updates LL->ML->OF skipped on the final sequence,
strict bits_remaining()==0 end check) via the same read_bits convention as
ops/bitstream.py (phantom zeros below bit 0).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zstd_tpu.common import constants as C

# dev-only ablation switch for on-TPU cost attribution (never set in
# production): "lookup" | "fetch" | "store" skips that stage entirely;
# "cachehaz" keeps every op but redirects the per-step cache/st_ref LOADS
# to a never-stored scratch clone — same op structure, no store->load
# ordering pair on any ref (timing-only: results are wrong). This is the
# sink/litload-style hazard probe the exec kernel used to find that 53% of
# its time was memory-ordering stalls (PERF.md r3).
_ABLATE = os.environ.get("ZSTD_TPU_SEQ_ABLATE", "")

SEQ_CHUNK = 512  # sequences per grid step (output block rows)

_LL_BASE = np.array(C.LL_CODE_BASELINE, dtype=np.int32)
_LL_XTRA = np.array(C.LL_CODE_EXTRA_BITS, dtype=np.int32)
_ML_BASE = np.array(C.ML_CODE_BASELINE, dtype=np.int32)
_ML_XTRA = np.array(C.ML_CODE_EXTRA_BITS, dtype=np.int32)


def _lut_rows(arr, rows=64):
    out = np.zeros((rows, 1), np.int32)
    out[:len(arr), 0] = arr
    return out


def _fetch(w_ref, pos, n):
    """Read n (<=32) bits ending at bit `pos` per lane (phantom-zero rule).

    w_ref: (Nw, B) word ref (i32 bit patterns). pos/n: (1, B) i32. Returns
    (val (1,B) u32, new_pos (1,B) i32). Two one-hot compares + reductions.
    Everything full-size (the ref read and the iota) is built INSIDE this
    helper: values that live across the step loop get materialized on the
    Mosaic stack (OOM for wide streams), inline chains fuse into the
    reduction loops at no memory cost.
    """
    W = w_ref[:]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, W.shape, 0)
    new_pos = pos - n
    start = jnp.maximum(new_pos, 0)
    widx = start >> 5
    # Mosaic can't reduce unsigned ints: reduce as i32, bitcast-wrap to u32
    oh = rows_iota == widx  # (Nw, B)
    w0 = jnp.sum(jnp.where(oh, W, 0), axis=0, keepdims=True).astype(jnp.uint32)
    oh1 = rows_iota == widx + 1
    w1 = jnp.sum(jnp.where(oh1, W, 0), axis=0, keepdims=True).astype(jnp.uint32)
    boff = (start & 31).astype(jnp.uint32)
    lo = w0 >> boff
    hi = jnp.where(boff == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - boff))
    n_u = n.astype(jnp.uint32)
    mask = jnp.where(n >= 32, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << n_u) - 1)
    val = (lo | hi) & mask
    # reads fully below bit 0 (e.g. 64-bit container prefill on a tiny
    # stream) have phantom >= 32: the hardware shift would wrap, so force 0.
    # n == 0 yields 0 via the mask — no extra select needed.
    phantom = start - new_pos
    ph_u = jnp.minimum(phantom, 31).astype(jnp.uint32)
    val = jnp.where(phantom >= 32, jnp.uint32(0), (val << ph_u) & mask)
    return val, new_pos


def _lookup(tab_ref, state):
    """tab_ref (width, B) i32 ref, state (1, B) -> entry (1, B) i32."""
    tab = tab_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, tab.shape, 0)
    return jnp.sum(jnp.where(rows == state, tab, 0), axis=0, keepdims=True)


def _lut(lut_col, code):
    """lut_col (rows, 1) i32, code (1, *lanes) -> (1, *lanes) i32."""
    nd = code.ndim
    shape = (lut_col.shape[0],) + (1,) * (nd - 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    oh = rows == code  # (rows, *lanes) via broadcast
    return jnp.sum(jnp.where(oh, lut_col.reshape(shape), 0), axis=0,
                   keepdims=True)


# Sliding word-window cache: a full (Nw, B) fetch scan would cost a
# pass over the WHOLE stream per step (per-step cost grows with stream
# width, the wide-bucket wall). Consumption is monotonically downward, so
# a (2*_CW, B) scratch cache covering the words at/below the cursor serves
# _CACHE_R steps of fetches; only the refill (every _CACHE_R steps) scans
# the full array. Guaranteed safe: a refill leaves >= _CW*32 - 31 = 993
# bits below the cursor and one step consumes <= 89 bits, so _CACHE_R = 8
# never underflows on a valid stream (malformed overconsumption is caught
# by the final pos == 0 check as before).
#
# The refill lives in an OUTER loop (SEQ_CHUNK/_CACHE_R iterations), the
# decode steps in an inner fori that never stores to cache_ref: a
# conditional per-step refill (@pl.when(k % R == 0)) puts a (predicated)
# store ahead of every step's cache loads, and Mosaic orders any load
# against earlier stores to the same ref — measured r4 (cachehaz ablation)
# at 48% of the whole kernel. _CACHE_R must divide SEQ_CHUNK.
_CW = 32
_CACHE_R = 8


def _refill_cache(w_ref, cache_ref, pos, nblk: int):
    """Load the two _CW-word blocks covering bit pos-1 downward into
    cache_ref rows [0, 2*_CW); returns t0 (1,B), the word index of row 0."""
    hi_w = jnp.maximum(pos - 1, 0) >> 5
    b0 = jnp.maximum((hi_w >> 5) - 1, 0)  # _CW = 32 = 1 << 5
    zero = jnp.zeros((_CW,) + pos.shape[1:], jnp.int32)
    # static unrolled block sweep: dynamic sublane slices in a fori are
    # an order of magnitude slower than static slices on this toolchain
    a0, a1 = zero, zero
    for b in range(nblk):
        blk = w_ref[b * _CW:(b + 1) * _CW]
        a0 = jnp.where(b0 == b, blk, a0)
        a1 = jnp.where(b0 + 1 == b, blk, a1)
    cache_ref[0:_CW] = a0
    cache_ref[_CW:2 * _CW] = a1
    return b0 * _CW


def _fetch_cached(cache_ref, t0, pos, n):
    """_fetch against the sliding cache (same contract: n bits ending at
    bit `pos` per lane, phantom zeros below bit 0)."""
    C = cache_ref[:]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, C.shape, 0)
    new_pos = pos - n
    start = jnp.maximum(new_pos, 0)
    widx = (start >> 5) - t0
    w0 = jnp.sum(jnp.where(rows_iota == widx, C, 0), axis=0,
                 keepdims=True).astype(jnp.uint32)
    w1 = jnp.sum(jnp.where(rows_iota == widx + 1, C, 0), axis=0,
                 keepdims=True).astype(jnp.uint32)
    boff = (start & 31).astype(jnp.uint32)
    lo = w0 >> boff
    hi = jnp.where(boff == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - boff))
    n_u = n.astype(jnp.uint32)
    mask = jnp.where(n >= 32, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << n_u) - 1)
    val = (lo | hi) & mask
    phantom = start - new_pos
    ph_u = jnp.minimum(phantom, 31).astype(jnp.uint32)
    val = jnp.where(phantom >= 32, jnp.uint32(0), (val << ph_u) & mask)
    return val, new_pos


def _fetch_window_cached(cache_ref, t0, base):
    """_fetch_window against the cache: words [base, base+4) are cache rows
    [base-t0, base-t0+4). Words above the cached top only ever hold already
    -consumed bits (base <= hi_w), and rows below 0 cannot occur on a valid
    stream within _CACHE_R steps — both read as 0 harmlessly."""
    C = cache_ref[:]
    d = jax.lax.broadcasted_iota(jnp.int32, C.shape, 0) - (base - t0)
    v = []
    for k in range(4):
        v.append(jnp.sum(jnp.where(d == k, C, 0), axis=0,
                         keepdims=True).astype(jnp.uint32))
    return v


def _extract(v, o, n):
    """Bits [o, o+n) (n <= 32) of the 128-bit window v (list of 4 u32).

    o is a per-lane (1, B) bit offset within the window (0..95); the double
    shift realizes the n- and o-dependent shifts branchlessly.
    """
    e = o >> 5
    b = (o & 31).astype(jnp.uint32)
    lo = jnp.where(e == 0, v[0], jnp.where(e == 1, v[1], v[2]))
    hi = jnp.where(e == 0, v[1], jnp.where(e == 1, v[2], v[3]))
    val = (lo >> b) | jnp.where(b == 0, jnp.uint32(0),
                                hi << (jnp.uint32(32) - b))
    n_u = n.astype(jnp.uint32)
    mask = jnp.where(n >= 32, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << n_u) - 1)
    return (val & mask).astype(jnp.int32)


def _seq_kernel(words_ref, init_ref, nseq_ref, lltab_ref, oftab_ref,
                mltab_ref, lllog_ref, oflog_ref, mllog_ref, luts_ref,
                ll_out, ml_out, of_out, okpos_ref,
                st_ref, cache_ref, *xtra, Nw: int, B: int, n_chunks: int,
                G: int = 0):
    pid = pl.program_id(0)
    nblk = (Nw + _CW - 1) // _CW
    ll_pack = luts_ref[:, 0:1]   # base | xtra << 24
    ml_pack = luts_ref[:, 1:2]

    @pl.when(pid == 0)
    def _():
        # init order LL, OF, ML (RFC 8878); state rows: 0..2 = ll/of/ml
        # states, 3 = pos, 4 = ok mask
        pos0 = init_ref[0:1]
        lll = lllog_ref[0:1]
        ofl = oflog_ref[0:1]
        mll = mllog_ref[0:1]
        v, pos3 = _fetch(words_ref, pos0, lll + ofl + mll)
        v = v.astype(jnp.int32)
        st_ref[0:1] = v >> (ofl + mll)
        st_ref[1:2] = (v >> mll) & ((jnp.int32(1) << ofl) - 1)
        st_ref[2:3] = v & ((jnp.int32(1) << mll) - 1)
        st_ref[3:4] = pos3
        st_ref[4:5] = ((pos0 >= 0) & (pos3 >= 0)).astype(jnp.int32)

    nseq = nseq_ref[0:1]

    def step(k, carry):
        s_ll, s_of, s_ml, pos, ok, t0 = carry

        if _ABLATE == "cachehaz":
            # hazard probe: identical op structure, but the per-step loads
            # hit a never-stored clone (and t0 is a constant) so no load in
            # the loop is ordered against a store
            t0 = jnp.zeros_like(pos)
            fetch_ref = xtra[0]
        else:
            fetch_ref = cache_ref
        i = pid * SEQ_CHUNK + k
        active = (i < nseq).astype(jnp.int32)
        not_last = i < nseq - 1

        if _ABLATE == "lookup":
            e_of, e_ml, e_ll = s_of & 31, s_ml & 31, s_ll & 31
        else:
            e_of = _lookup(oftab_ref, s_of)
            e_ml = _lookup(mltab_ref, s_ml)
            e_ll = _lookup(lltab_ref, s_ll)
        of_code = e_of & 0xFF
        ml_code = e_ml & 0xFF
        ll_code = e_ll & 0xFF
        code_ok = (of_code <= 31) & (ml_code <= 52) & (ll_code <= 35)
        of_code = jnp.minimum(of_code, 31)
        ml_code = jnp.minimum(ml_code, 52)
        ll_code = jnp.minimum(ll_code, 35)

        # all of the step's bit reads come from ONE 4-word window fetch:
        # [from top] OF extras | ML extras | LL extras | LL/ML/OF state bits
        lv = _lut(ll_pack, ll_code)
        mv = _lut(ml_pack, ml_code)
        nb_ofx = of_code * active
        nb_mlx = (mv >> 24) * active
        nb_llx = (lv >> 24) * active
        nb2 = nb_mlx + nb_llx
        upd = jnp.where(not_last, active, 0)
        nb_ll = ((e_ll >> 8) & 0xFF) * upd
        nb_ml = ((e_ml >> 8) & 0xFF) * upd
        nb_of = ((e_of >> 8) & 0xFF) * upd
        nbs = nb_ll + nb_ml + nb_of

        new_pos = pos - (nb_ofx + nb2 + nbs)
        start = jnp.maximum(new_pos, 0)
        base = start >> 5
        if _ABLATE == "fetch":
            v = [jnp.zeros_like(pos).astype(jnp.uint32) for _ in range(4)]
        else:
            v = _fetch_window_cached(fetch_ref, t0, base)
        o3 = start - (base << 5)
        o2 = o3 + nbs
        o1 = o2 + nb2

        r_of = _extract(v, o1, nb_ofx)
        ofv = (jnp.int32(1) << of_code) + r_of

        r2 = _extract(v, o2, nb2)
        ml = (mv & 0xFFFFFF) + ((r2 >> nb_llx) &
                                ((jnp.int32(1) << nb_mlx) - 1))
        ll = (lv & 0xFFFFFF) + (r2 & ((jnp.int32(1) << nb_llx) - 1))

        r3 = _extract(v, o3, nbs)
        b_of = r3 & ((jnp.int32(1) << nb_of) - 1)
        b_ml = (r3 >> nb_of) & ((jnp.int32(1) << nb_ml) - 1)
        b_ll = r3 >> (nb_of + nb_ml)
        s_ll2 = (e_ll >> 16) + b_ll
        s_ml2 = (e_ml >> 16) + b_ml
        s_of2 = (e_of >> 16) + b_of
        pos = jnp.where(active == 1, new_pos, pos)

        # pos is monotonic, so the final pos == 0 test subsumes per-step
        # pos >= 0 checks; garbage outputs past nseq are dropped by the
        # caller's masked scatter (no need to zero them here)
        ok = ok & (code_ok.astype(jnp.int32) | (1 - active))
        s_ll = jnp.where(active == 1, s_ll2, s_ll)
        s_ml = jnp.where(active == 1, s_ml2, s_ml)
        s_of = jnp.where(active == 1, s_of2, s_of)

        if _ABLATE != "store":
            if G:
                # outputs are (S*G, 128) 2D (3D pallas results trip XLA's
                # scoped-vmem placement); (1,G,128)->(G,128) is free
                ll_out[pl.ds(k * G, G), :] = ll.reshape(G, 128)
                ml_out[pl.ds(k * G, G), :] = ml.reshape(G, 128)
                of_out[pl.ds(k * G, G), :] = ofv.reshape(G, 128)
            else:
                ll_out[pl.ds(k, 1)] = ll
                ml_out[pl.ds(k, 1)] = ml
                of_out[pl.ds(k, 1)] = ofv
        return s_ll, s_of, s_ml, pos, ok, t0

    def outer(r, carry):
        # refill ONCE per _CACHE_R steps, outside the step loop: the inner
        # fori never stores to cache_ref, so its per-step loads carry no
        # store->load ordering boundary (measured r4: the conditional
        # in-loop refill cost 48% of the kernel in stalls); t0 rides the
        # carry instead of bouncing through st_ref
        s_ll, s_of, s_ml, pos, ok = carry
        t0 = _refill_cache(words_ref, cache_ref, pos, nblk)

        def inner(k2, c):
            return step(r * _CACHE_R + k2, c)

        out = jax.lax.fori_loop(0, _CACHE_R, inner,
                                (s_ll, s_of, s_ml, pos, ok, t0))
        return out[:5]

    carry = (st_ref[0:1], st_ref[1:2], st_ref[2:3],
             st_ref[3:4], st_ref[4:5])
    assert SEQ_CHUNK % _CACHE_R == 0
    s_ll, s_of, s_ml, pos, ok = jax.lax.fori_loop(
        0, SEQ_CHUNK // _CACHE_R, outer, carry)
    st_ref[0:1] = s_ll
    st_ref[1:2] = s_of
    st_ref[2:3] = s_ml
    st_ref[3:4] = pos
    st_ref[4:5] = ok

    @pl.when(pid == n_chunks - 1)
    def _():
        # strict end: bits exactly exhausted (bits_remaining == 0)
        final_ok = (ok == 1) & (pos == 0)
        final_ok = final_ok | (nseq <= 0)
        if G:
            okpos_ref[0:G, :] = final_ok.astype(jnp.int32).reshape(G, 128)
        else:
            okpos_ref[0:1] = final_ok.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_seqs", "interpret"))
def decode_sequence_lanes_pallas(streams_u8,   # (B, L) u8
                                 init_pos,     # (B,) i32, -1 invalid
                                 nseq,         # (B,) i32
                                 ll_tab, of_tab, ml_tab,  # (B, 512/256/512) u32
                                 ll_log, of_log, ml_log,  # (B,) i32
                                 max_seqs: int,
                                 interpret: bool = False):
    """Pallas drop-in for decode_sequence_lanes (per-lane tables pre-gathered).

    Returns (ll, ml, ofv) i32 (B, max_seqs) + ok (B,) bool.
    """
    B0, L = streams_u8.shape
    # lanes >= 256 are packed (G, 128) across sublanes x minor so the
    # per-step tiny ops use whole vregs instead of 1/8 of each sublane
    # tile; small batches keep the flat minor layout (a (X, 1, 128) shape
    # triggers XLA scoped-vmem result placement and wins nothing).
    packed = B0 > 128
    if packed and B0 % 128:
        pad_b = 128 - B0 % 128
        streams_u8 = jnp.pad(streams_u8, ((0, pad_b), (0, 0)))
        init_pos = jnp.pad(init_pos, (0, pad_b), constant_values=-1)
        nseq = jnp.pad(nseq, (0, pad_b))
        ll_tab = jnp.pad(ll_tab, ((0, pad_b), (0, 0)))
        of_tab = jnp.pad(of_tab, ((0, pad_b), (0, 0)))
        ml_tab = jnp.pad(ml_tab, ((0, pad_b), (0, 0)))
        ll_log = jnp.pad(ll_log, (0, pad_b))
        of_log = jnp.pad(of_log, (0, pad_b))
        ml_log = jnp.pad(ml_log, (0, pad_b))
    B = streams_u8.shape[0]
    ldims = (B // 128, 128) if packed else (B,)
    Nw = (L + 3) // 4 + 2  # >=2 zero pad words (fetch reads word w+1)
    Nw = (Nw + _CW - 1) // _CW * _CW  # whole cache blocks (refill slices)
    pad = Nw * 4 - L
    by = jnp.pad(streams_u8, ((0, 0), (0, pad))).astype(jnp.uint32)
    by = by.reshape(B, Nw, 4)
    words = (by[:, :, 0] | (by[:, :, 1] << 8) | (by[:, :, 2] << 16)
             | (by[:, :, 3] << 24)).astype(jnp.int32)
    words_t = words.T.reshape((Nw,) + ldims)

    n_chunks = max(1, (max_seqs + SEQ_CHUNK - 1) // SEQ_CHUNK)
    S = n_chunks * SEQ_CHUNK

    G = B // 128 if packed else 0
    row = lambda x: x.astype(jnp.int32).reshape((1,) + ldims)
    tab3 = lambda t: t.astype(jnp.int32).T.reshape((t.shape[1],) + ldims)
    oblk = (SEQ_CHUNK * G, 128) if packed else (SEQ_CHUNK, B)
    out_spec = pl.BlockSpec(oblk, lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    # constant index map -> single-buffer (the default pipeliner would
    # double-buffer the full-size words array and blow the 16 MB VMEM budget
    # for wide streams)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      pipeline_mode=pl.Buffered(1),
                                      memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        functools.partial(_seq_kernel, Nw=Nw, B=B, n_chunks=n_chunks,
                          G=G),
        grid=(n_chunks,),
        in_specs=[full((Nw,) + ldims), full((1,) + ldims),
                  full((1,) + ldims),
                  full((ll_tab.shape[1],) + ldims),
                  full((of_tab.shape[1],) + ldims),
                  full((ml_tab.shape[1],) + ldims),
                  full((1,) + ldims), full((1,) + ldims),
                  full((1,) + ldims),
                  pl.BlockSpec((64, 2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec, out_spec, out_spec,
                   full((max(G, 1), 128) if packed else (1, B))),
        out_shape=(
            jax.ShapeDtypeStruct((S * max(G, 1),) + ((128,) if packed
                                                     else (B,)), jnp.int32),
            jax.ShapeDtypeStruct((S * max(G, 1),) + ((128,) if packed
                                                     else (B,)), jnp.int32),
            jax.ShapeDtypeStruct((S * max(G, 1),) + ((128,) if packed
                                                     else (B,)), jnp.int32),
            jax.ShapeDtypeStruct((max(G, 1), 128) if packed else (1, B),
                                 jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((8,) + ldims, jnp.int32),
                        pltpu.VMEM((2 * _CW,) + ldims, jnp.int32)]
        + ([pltpu.VMEM((2 * _CW,) + ldims, jnp.int32)]
           if _ABLATE == "cachehaz" else []),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )
    luts = jnp.asarray(np.concatenate(
        [_lut_rows(_LL_BASE) | (_lut_rows(_LL_XTRA) << 24),
         _lut_rows(_ML_BASE) | (_lut_rows(_ML_XTRA) << 24)], axis=1))
    ll_o, ml_o, of_o, okv = call(
        words_t, row(init_pos), row(nseq),
        tab3(ll_tab), tab3(of_tab), tab3(ml_tab),
        row(ll_log), row(of_log), row(ml_log), luts)

    def unpack(x):
        return x.reshape(S, B)[:max_seqs, :B0].T

    ok = ((okv.reshape(B)[:B0] == 1) & (init_pos[:B0] >= 0)
          | (nseq[:B0] <= 0))
    return unpack(ll_o), unpack(ml_o), unpack(of_o), ok
