"""Batched bit-packing on device — the encoder's mirror of bitstream.py.

Huffman encoding has no sequential state: every symbol's (code, nbits) is a
table lookup, bit positions are an exclusive cumsum, and the pack is two
scatter-adds into a u32 word array (a code crossing a word boundary splits).
One lane per output stream; reverse symbol order and the trailing sentinel
bit are handled by index arithmetic, not loops (huff0_encoder.rs:87-104
parity, fully data-parallel).
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_words",))
def pack_bits_lanes(values,   # (B, N) u32 bit payloads (LSB-first)
                    nbits,    # (B, N) i32 payload widths (0 = skip)
                    out_words: int):
    """Pack per-lane bit runs in order; returns (words (B, out_words) u32,
    total_bits (B,) i32). values[i] occupies bits [cum_i, cum_i + nbits_i)."""
    nb = nbits.astype(jnp.int32)
    cum = jnp.cumsum(nb, axis=1) - nb          # exclusive prefix sum
    total = cum[:, -1] + nb[:, -1]

    word = cum >> 5
    shift = (cum & 31).astype(jnp.uint32)
    v = values.astype(jnp.uint32) & ((jnp.uint32(1) << nb.astype(jnp.uint32)) - 1)
    lo = (v << shift).astype(jnp.uint32)
    # high part when the run crosses the word boundary (shift+nb > 32)
    hi = jnp.where(shift > 0, v >> (jnp.uint32(32) - shift), 0).astype(jnp.uint32)

    B = values.shape[0]
    lane = jnp.arange(B, dtype=jnp.int32)[:, None]
    words = jnp.zeros((B, out_words), dtype=jnp.uint32)
    w1 = jnp.where(nb > 0, word, out_words)
    words = words.at[lane, w1].add(lo, mode="drop")
    w2 = jnp.where((nb > 0) & (hi > 0), word + 1, out_words)
    words = words.at[lane, w2].add(hi, mode="drop")
    return words, total


def finalize_streams(words, total_bits):
    """Host-side: append the sentinel 1-bit and cut to padded byte length.

    Returns list of bytes per lane.
    """
    import numpy as np

    words = np.asarray(words)
    total_bits = np.asarray(total_bits)
    out = []
    for i in range(words.shape[0]):
        t = int(total_bits[i])
        raw = words[i].tobytes()[: (t + 7) // 8 + 1]
        buf = bytearray(raw[: (t // 8) + 1])
        # clear above t, set sentinel at bit t
        bit = t & 7
        buf[-1] &= (1 << bit) - 1
        buf[-1] |= 1 << bit
        out.append(bytes(buf))
    return out
