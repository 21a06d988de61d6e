"""Batched Huffman literal decoding on device.

One lane per (block, stream): the format's 4 independent literal streams per
block × many blocks per batch are the SIMD hooks (SURVEY.md §2, parity with
the per-stream loop of literals_section_decoder.rs:88-147). A `lax.scan` over
symbol steps decodes one literal per lane per step; the canonical table is a
(lanes-shared) dense LUT gathered at the current 11-bit state.

Inputs are produced by the host framer (zstd_tpu/models/framer.py).
"""

import functools

import jax
import jax.numpy as jnp

from zstd_tpu.ops.bitstream import build_windows_u32, read_bits_u32


def huff_boundary_rows(table):
    """Canonical boundary representation of a Huffman decode LUT.

    The Pallas kernel decodes by weight-class search instead of scanning a
    (1 << max_bits)-entry LUT: state -> weight w via 11 threshold compares,
    nb = max_bits + 1 - w, symbol via a 256-rank list (the LUT groups
    symbols by ascending weight, huff0_decoder.rs:284-377 semantics).

    Returns (bnd (16,) i32: rows w=1..12 hold lo[w] | rank_base[w] << 16,
             syms (64,) i32: rank list packed 4 bytes/row,
             nranks: number of distinct symbols in the rank list)."""
    import numpy as np

    mb = table.max_bits
    sz = 1 << mb
    nbs = table.num_bits[:sz].astype(np.int64)
    symbols = table.symbol[:sz].astype(np.int64)
    w = mb + 1 - nbs  # weight of each state's symbol
    # rows outside w=1..12 carry a lo sentinel above any state so the
    # kernel's weight count can sum (lo <= state) over all 16 rows with no
    # range mask (w = #{rows 1..12: lo <= state}; row 1 always counts)
    bnd = np.full(16, 0xFFFF, np.int64)
    syms = []
    idx = 0
    for wt in range(1, 13):
        bnd[wt] = idx | (len(syms) << 16)
        span = 1 << (wt - 1)
        while idx < sz and w[idx] == wt:
            syms.append(int(symbols[idx]))
            idx += span
    if idx != sz:
        raise ValueError("huffman LUT is not weight-grouped")
    packed = np.zeros(64, np.int64)
    for r, s in enumerate(syms):
        packed[r >> 2] |= s << ((r & 3) * 8)
    return bnd.astype(np.int32), packed.astype(np.int32), len(syms)


@functools.partial(jax.jit, static_argnames=("max_symbols",))
def decode_huffman_lanes(streams_u8: jnp.ndarray,     # (B, L) u8
                         init_pos: jnp.ndarray,        # (B,) i32 (-1 invalid)
                         table_id: jnp.ndarray,        # (B,) i32 into tables
                         tables: jnp.ndarray,          # (T, 2048) u16: sym | nb<<8
                         max_bits: jnp.ndarray,        # (T,) i32
                         n_symbols: jnp.ndarray,       # (B,) i32 expected
                         max_symbols: int):
    """Returns (literals (B, max_symbols) u8, ok (B,) bool)."""
    windows = build_windows_u32(streams_u8)
    B = streams_u8.shape[0]
    lane_idx = jnp.arange(B, dtype=jnp.int32)
    mb = max_bits[table_id]                      # (B,)
    tmask = ((jnp.uint32(1) << mb.astype(jnp.uint32)) - 1)

    # init state: read max_bits bits from the top (phantom-zero tail rules)
    state_bits, pos0 = read_bits_u32(windows, lane_idx, init_pos, mb)
    state0 = state_bits.astype(jnp.int32)
    valid0 = init_pos >= 0

    def step(carry, i):
        state, pos = carry
        entry = tables[table_id, state]                       # (B,) u16
        sym = (entry & 0xFF).astype(jnp.uint8)
        nb = (entry >> 8).astype(jnp.int32)
        active = i < n_symbols
        nb = jnp.where(active, nb, 0)
        bits, new_pos = read_bits_u32(windows, lane_idx, pos, nb)
        new_state = (((state.astype(jnp.uint32) << nb.astype(jnp.uint32))
                      & tmask) | bits).astype(jnp.int32)
        out = jnp.where(active, sym, jnp.uint8(0))
        # validity: every emitted symbol must start from pos > -max_bits
        ok_step = jnp.where(active, pos > -mb, True)
        return (new_state, new_pos), (out, ok_step)

    (state_f, pos_f), (lits, ok_steps) = jax.lax.scan(
        step, (state0, pos0), jnp.arange(max_symbols, dtype=jnp.int32))
    lits = lits.T  # (B, max_symbols)
    ok = valid0 & jnp.all(ok_steps, axis=0)
    # A valid stream's bits are exactly exhausted: total bits = sum of code
    # lengths, so after the n-th shift the position lands on -max_bits.
    ok = ok & (pos_f == -mb)
    ok = jnp.where(n_symbols > 0, ok, True)
    return lits, ok
