"""Pallas TPU kernel for batched Huffman literal decoding.

Replaces the lax.scan in ops/huffman.py::decode_huffman_lanes on real TPUs
(same motivation and layout as ops/pallas_sequence.py: state in VMEM,
bitstream as a transposed (Nw, B) u32 word array read by one-hot sublane
reductions, canonical tables as per-lane (2048, B) stacks, outputs streamed
out row-by-row through a chunked grid).

Semantics parity with the per-stream loop of
literals_section_decoder.rs:88-147: state = top max_bits of the reversed
stream, per step emit table[state].symbol and shift in table[state].num_bits
new bits (phantom zeros below bit 0), stream valid iff it ends exactly at
-max_bits after n_symbols steps.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zstd_tpu.ops.pallas_sequence import _fetch, _lookup

LIT_CHUNK = 512  # symbols per grid step


def _huff_kernel(words_ref, init_ref, nsym_ref, tab_ref, mb_ref,
                 lit_out, ok_ref, st_ref, Nw: int, B: int, TW: int,
                 n_chunks: int):
    pid = pl.program_id(0)
    mb = mb_ref[0:1, :]
    tmask = (jnp.int32(1) << mb) - 1
    nsym = nsym_ref[0:1, :]

    @pl.when(pid == 0)
    def _():
        pos0 = init_ref[0:1, :]
        state0, pos1 = _fetch(words_ref, pos0, mb)
        st_ref[0:1, :] = state0.astype(jnp.int32)
        st_ref[1:2, :] = pos1
        st_ref[2:3, :] = (pos0 >= 0).astype(jnp.int32)

    def step(k, carry):
        state, pos, ok = carry
        i = pid * LIT_CHUNK + k
        active = (i < nsym).astype(jnp.int32)

        entry = _lookup(tab_ref, state)
        sym = entry & 0xFF
        nb = (entry >> 8) * active
        bits, new_pos = _fetch(words_ref, pos, nb)
        new_state = (((state << nb) & tmask)
                     | bits.astype(jnp.int32))
        # every emitted symbol must start from pos > -max_bits
        ok = jnp.where(active == 1, ok & (pos > -mb).astype(jnp.int32), ok)
        lit_out[pl.ds(k, 1), :] = sym * active
        state = jnp.where(active == 1, new_state, state)
        return state, new_pos, ok

    carry = (st_ref[0:1, :], st_ref[1:2, :], st_ref[2:3, :])
    state, pos, ok = jax.lax.fori_loop(0, LIT_CHUNK, step, carry)
    st_ref[0:1, :] = state
    st_ref[1:2, :] = pos
    st_ref[2:3, :] = ok
    # valid stream: bits exactly exhausted (pos lands on -max_bits)
    ok_ref[0:1, :] = ((ok == 1) & (pos == -mb) | (nsym <= 0)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_symbols", "interpret"))
def decode_huffman_lanes_pallas(streams_u8,   # (B, L) u8
                                init_pos,     # (B,) i32 (-1 invalid)
                                tables,       # (B, TW) u16: sym | nb<<8
                                max_bits,     # (B,) i32
                                n_symbols,    # (B,) i32
                                max_symbols: int,
                                interpret: bool = False):
    """Pallas drop-in for decode_huffman_lanes (tables pre-gathered per lane).

    Returns (literals (B, max_symbols) u8, ok (B,) bool)."""
    B, L = streams_u8.shape
    TW = tables.shape[1]
    Nw = (L + 3) // 4 + 2
    pad = Nw * 4 - L
    by = jnp.pad(streams_u8, ((0, 0), (0, pad))).astype(jnp.uint32)
    by = by.reshape(B, Nw, 4)
    words = (by[:, :, 0] | (by[:, :, 1] << 8) | (by[:, :, 2] << 16)
             | (by[:, :, 3] << 24)).astype(jnp.int32)

    n_chunks = max(1, (max_symbols + LIT_CHUNK - 1) // LIT_CHUNK)
    S = n_chunks * LIT_CHUNK

    row = lambda x: x.astype(jnp.int32)[None, :]
    # constant index map -> single-buffer (see pallas_sequence.py)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      pipeline_mode=pl.Buffered(1),
                                      memory_space=pltpu.VMEM)
    lit_o, okv = pl.pallas_call(
        functools.partial(_huff_kernel, Nw=Nw, B=B, TW=TW,
                          n_chunks=n_chunks),
        grid=(n_chunks,),
        in_specs=[full((Nw, B)), full((1, B)), full((1, B)),
                  full((TW, B)), full((1, B))],
        out_specs=(pl.BlockSpec((LIT_CHUNK, B), lambda i: (i, 0),
                                memory_space=pltpu.VMEM), full((1, B))),
        out_shape=(jax.ShapeDtypeStruct((S, B), jnp.int32),
                   jax.ShapeDtypeStruct((1, B), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((8, B), jnp.int32)],
        interpret=interpret,
    )(words.T, row(init_pos), row(n_symbols),
      tables.astype(jnp.int32).T, row(max_bits))

    ok = (okv[0] == 1) & (init_pos >= 0) | (n_symbols <= 0)
    lits = lit_o[:max_symbols].T.astype(jnp.uint8)
    return lits, ok
