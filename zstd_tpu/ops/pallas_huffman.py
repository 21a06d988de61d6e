"""Pallas TPU kernel for batched Huffman literal decoding.

Replaces the lax.scan in ops/huffman.py::decode_huffman_lanes on real TPUs
(same layout as ops/pallas_sequence.py: transposed (entries, lanes) arrays,
one-hot sublane reductions for every dynamic read, outputs streamed through
a chunked grid, decode state in VMEM scratch).

v2 cost structure (v1's two full-width scans per symbol dominated):
  - a per-lane 64-bit bit container (two u32 registers, valid bits
    top-aligned) replaces per-symbol window fetches: ONE <=22-bit refill
    fetch per TWO symbols tops the container back up (2 x 11-bit worst-case
    consumption), so the expensive (Nw, B) scan runs once per two symbols
  - the canonical table is packed two 16-bit entries (sym | nb<<8) per i32
    row, halving the table-lookup scan width

Semantics parity with the per-stream loop of
literals_section_decoder.rs:88-147: state = sliding max_bits-wide bit
window, per step emit table[state].symbol and shift in table[state].num_bits
new bits (phantom zeros below bit 0 — _fetch supplies them on refill),
stream valid iff it ends exactly at -max_bits after n_symbols steps. The
container only changes WHEN bits are fetched, not which bits a symbol sees;
validity uses a virtual position identical to the XLA path's.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zstd_tpu.ops.pallas_sequence import (
    _CW,
    _fetch,
    _fetch_cached,
    _refill_cache,
)

# refill cadence: a refill leaves >= _CW*32 - 31 = 993 cached bits below
# the fill cursor and one 2-symbol group consumes <= 22 bits, so 32 groups
# between refills can never underflow.
_CACHE_R = 32

# dev-only ablation switch (see pallas_sequence.py; "cachehaz" is the
# store->load hazard probe — timing-only, wrong results)
_ABLATE = os.environ.get("ZSTD_TPU_HUFF_ABLATE", "")

LIT_CHUNK = 512  # symbols per grid step (must be even: 2-symbol groups)

_U32 = jnp.uint32


def _consume(hi, lo, n_u):
    """Drop the top n (0..31) bits of the (hi, lo) container, per lane.

    Branchless: the double shift (x >> 1 >> (31-n)) realizes >> (32-n)
    without the n==0 hazard (it yields 0 there), saving where-selects —
    small-op count dominates the kernels' per-step cost.
    """
    hi2 = (hi << n_u) | ((lo >> 1) >> (_U32(31) - n_u))
    lo2 = lo << n_u
    return hi2, lo2


def _top_bits(hi, n_u):
    """Value of the top n (0..31) bits of the container (0 for n=0)."""
    return (hi >> 1) >> (_U32(31) - n_u)


def _huff_kernel(words_ref, init_ref, nsym_ref, bnd_ref, syms_ref, mb_ref,
                 lit_out, ok_ref, st_ref, cache_ref, *xtra, Nw: int,
                 n_chunks: int, G: int = 0):
    pid = pl.program_id(0)
    nblk = (Nw + _CW - 1) // _CW
    ld1 = (1,) * (bnd_ref.ndim - 1)  # (1,) flat, (1, 1) packed
    rows16 = jax.lax.broadcasted_iota(jnp.int32, (16,) + ld1, 0)
    rows_sym = jax.lax.broadcasted_iota(
        jnp.int32, (syms_ref.shape[0],) + ld1, 0)
    TH = bnd_ref[:]        # (16, *lanes): lo | rank_base << 16, sentinels
    lo_all = TH & 0xFFFF   # hoisted: loop-invariant, small enough to live
    mb = mb_ref[0:1]
    mb_u = mb.astype(_U32)
    tmask = (jnp.int32(1) << mb) - 1
    nsym = nsym_ref[0:1]

    @pl.when(pid == 0)
    def _():
        # scratch rows: 0=state 1=vpos 2=ok 3=cont_hi 4=cont_lo 5=fill_pos
        # 6=used (bits consumed since last refill)
        pos0 = init_ref[0:1]
        v_hi, fp = _fetch(words_ref, pos0, jnp.full_like(pos0, 32))
        v_lo, fp = _fetch(words_ref, fp, jnp.full_like(pos0, 32))
        state0 = _top_bits(v_hi, mb_u).astype(jnp.int32) & tmask
        hi, lo = _consume(v_hi, v_lo, mb_u)
        st_ref[0:1] = state0
        st_ref[1:2] = pos0 - mb
        st_ref[2:3] = (pos0 >= 0).astype(jnp.int32)
        st_ref[3:4] = hi.astype(jnp.int32)
        st_ref[4:5] = lo.astype(jnp.int32)
        st_ref[5:6] = fp
        st_ref[6:7] = mb  # init consumed mb bits

    def sym_step(i, st):
        # Ungated except bit consumption: inactive lanes consume 0 bits so
        # their state/container/vpos freeze; garbage symbols past nsym are
        # dropped by the caller's masked scatter. Per-step validity checks
        # are unnecessary: vpos is monotonic, so the final vpos == -mb test
        # subsumes every intermediate bound.
        #
        # Canonical boundary decode (no LUT scan): weight class w from 11
        # threshold compares, symbol from the 64-row packed rank list —
        # ~10x less scan traffic than the (1 << max_bits)-entry LUT.
        state, vpos, hi, lo, used = st
        if _ABLATE == "lookup":
            sym = state & 0xFF
            nb = (state & 7) * ((i < nsym).astype(jnp.int32))
            nb_u = nb.astype(_U32)
            bits = _top_bits(hi, nb_u).astype(jnp.int32)
            state = ((state << nb) & tmask) | bits
            hi, lo = _consume(hi, lo, nb_u)
            return sym, (state, vpos - nb, hi, lo, used + nb)
        w = jnp.sum((lo_all <= state).astype(jnp.int32), axis=0,
                    keepdims=True)
        packed = jnp.sum(jnp.where(rows16 == w, TH, 0), axis=0,
                         keepdims=True)
        lo_w = packed & 0xFFFF
        rank = (packed >> 16) + ((state - lo_w) >> (w - 1))
        srow = jnp.sum(jnp.where(rows_sym == (rank >> 2), syms_ref[:], 0),
                       axis=0, keepdims=True)
        sym = (srow >> ((rank & 3) * 8)) & 0xFF
        nb = (mb + 1 - w) * ((i < nsym).astype(jnp.int32))
        nb_u = nb.astype(_U32)
        bits = _top_bits(hi, nb_u).astype(jnp.int32)
        state = ((state << nb) & tmask) | bits
        hi, lo = _consume(hi, lo, nb_u)
        return sym, (state, vpos - nb, hi, lo, used + nb)

    def group(g, carry):
        state, vpos, ok, hi, lo, fp, used, t0 = carry

        # refill first: `used` <= 22 bits are free at the container bottom
        if _ABLATE == "fetch":
            newbits = jnp.zeros_like(used).astype(_U32)
            fp = fp - used
        elif _ABLATE == "cachehaz":
            # hazard probe (see pallas_sequence.py): same ops, loads hit a
            # never-stored clone, t0 constant — no store->load pair
            newbits, fp = _fetch_cached(xtra[0], jnp.zeros_like(fp), fp,
                                        used)
        else:
            newbits, fp = _fetch_cached(cache_ref, t0, fp, used)
        lo = lo | newbits
        used = jnp.zeros_like(used)

        k = g * 2
        i = pid * LIT_CHUNK + k
        out0, st = sym_step(i, (state, vpos, hi, lo, used))
        out1, st = sym_step(i + 1, st)
        state, vpos, hi, lo, used = st
        if _ABLATE != "store":
            if G:
                # outputs are (S*G, 128) 2D (3D pallas results trip XLA's
                # scoped-vmem placement); (1,G,128)->(G,128) is free
                lit_out[pl.ds(k * G, G), :] = out0.reshape(G, 128)
                lit_out[pl.ds((k + 1) * G, G), :] = out1.reshape(G, 128)
            else:
                lit_out[pl.ds(k, 1), :] = out0
                lit_out[pl.ds(k + 1, 1), :] = out1
        return state, vpos, ok, hi, lo, fp, used, t0

    def outer(r, carry):
        # refill once per _CACHE_R groups in the outer loop so the inner
        # fori never stores to cache_ref — the conditional in-loop refill
        # put a predicated store ahead of every group's cache loads and
        # Mosaic's store->load ordering charged the boundary every group
        # (see pallas_sequence.py, measured r4)
        fp = carry[5]
        t0 = _refill_cache(words_ref, cache_ref, fp, nblk)

        def inner(g2, c):
            return group(r * _CACHE_R + g2, c)

        out = jax.lax.fori_loop(0, _CACHE_R, inner, carry + (t0,))
        return out[:7]

    carry = (st_ref[0:1], st_ref[1:2], st_ref[2:3],
             st_ref[3:4].astype(_U32), st_ref[4:5].astype(_U32),
             st_ref[5:6], st_ref[6:7])
    assert (LIT_CHUNK // 2) % _CACHE_R == 0
    state, vpos, ok, hi, lo, fp, used = jax.lax.fori_loop(
        0, (LIT_CHUNK // 2) // _CACHE_R, outer, carry)
    st_ref[0:1] = state
    st_ref[1:2] = vpos
    st_ref[2:3] = ok
    st_ref[3:4] = hi.astype(jnp.int32)
    st_ref[4:5] = lo.astype(jnp.int32)
    st_ref[5:6] = fp
    st_ref[6:7] = used
    # valid stream: bits exactly exhausted (vpos lands on -max_bits)
    final_ok = ((ok == 1) & (vpos == -mb) | (nsym <= 0)).astype(jnp.int32)
    if G:
        ok_ref[0:G, :] = final_ok.reshape(G, 128)
    else:
        ok_ref[0:1] = final_ok


@functools.partial(jax.jit, static_argnames=("max_symbols", "interpret"))
def decode_huffman_lanes_pallas(streams_u8,   # (B, L) u8
                                init_pos,     # (B,) i32 (-1 invalid)
                                bnd,          # (B, 16) i32 boundary rows
                                syms,         # (B, SR) i32 packed rank list
                                max_bits,     # (B,) i32
                                n_symbols,    # (B,) i32
                                max_symbols: int,
                                interpret: bool = False):
    """Pallas drop-in for decode_huffman_lanes (boundary tables
    pre-gathered per lane — ops/huffman.py::huff_boundary_rows).

    Returns (literals (B, max_symbols) u8, ok (B,) bool)."""
    B0, L = streams_u8.shape
    # lanes >= 256 are packed (G, 128) across sublanes x minor so the
    # per-step tiny ops use whole vregs instead of 1/8 of each sublane
    # tile (see pallas_sequence.py)
    packed = B0 > 128
    if packed and B0 % 128:
        pad_b = 128 - B0 % 128
        streams_u8 = jnp.pad(streams_u8, ((0, pad_b), (0, 0)))
        init_pos = jnp.pad(init_pos, (0, pad_b), constant_values=-1)
        bnd = jnp.pad(bnd, ((0, pad_b), (0, 0)))
        syms = jnp.pad(syms, ((0, pad_b), (0, 0)))
        max_bits = jnp.pad(max_bits, (0, pad_b), constant_values=1)
        n_symbols = jnp.pad(n_symbols, (0, pad_b))
    B = streams_u8.shape[0]
    ldims = (B // 128, 128) if packed else (B,)
    G = B // 128 if packed else 0
    Nw = (L + 3) // 4 + 2
    Nw = (Nw + _CW - 1) // _CW * _CW  # whole cache blocks (refill slices)
    pad = Nw * 4 - L
    by = jnp.pad(streams_u8, ((0, 0), (0, pad))).astype(jnp.uint32)
    by = by.reshape(B, Nw, 4)
    words = (by[:, :, 0] | (by[:, :, 1] << 8) | (by[:, :, 2] << 16)
             | (by[:, :, 3] << 24)).astype(jnp.int32)

    n_chunks = max(1, (max_symbols + LIT_CHUNK - 1) // LIT_CHUNK)
    S = n_chunks * LIT_CHUNK

    row = lambda x: x.astype(jnp.int32).reshape((1,) + ldims)
    tab3 = lambda t: t.astype(jnp.int32).T.reshape((t.shape[1],) + ldims)
    # constant index map -> single-buffer (see pallas_sequence.py)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      pipeline_mode=pl.Buffered(1),
                                      memory_space=pltpu.VMEM)
    oblk = (LIT_CHUNK * G, 128) if packed else (LIT_CHUNK, B)
    lit_o, okv = pl.pallas_call(
        functools.partial(_huff_kernel, Nw=Nw, n_chunks=n_chunks, G=G),
        grid=(n_chunks,),
        in_specs=[full((Nw,) + ldims), full((1,) + ldims),
                  full((1,) + ldims), full((16,) + ldims),
                  full((syms.shape[1],) + ldims), full((1,) + ldims)],
        out_specs=(pl.BlockSpec(oblk, lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   full((max(G, 1), 128) if packed else (1, B))),
        out_shape=(jax.ShapeDtypeStruct((S * max(G, 1),) + ((128,) if packed
                                                            else (B,)),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((max(G, 1), 128) if packed
                                        else (1, B), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((8,) + ldims, jnp.int32),
                        pltpu.VMEM((2 * _CW,) + ldims, jnp.int32)]
        + ([pltpu.VMEM((2 * _CW,) + ldims, jnp.int32)]
           if _ABLATE == "cachehaz" else []),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(words.T.reshape((Nw,) + ldims), row(init_pos), row(n_symbols),
      tab3(bnd), tab3(syms), row(max_bits))

    ok = ((okv.reshape(B)[:B0] == 1) & (init_pos[:B0] >= 0)
          | (n_symbols[:B0] <= 0))
    lits = lit_o.reshape(S, B)[:max_symbols, :B0].T.astype(jnp.uint8)
    return lits, ok
