"""Batched LZ77 sequence execution on device — no per-byte loop.

The reference executes sequences byte-serially through a ring buffer
(sequence_execution.rs + decode_buffer.rs). On TPU the whole execution is
reformulated as data-parallel array ops (SURVEY.md §7 'hard parts' #3):

  1. per-sequence output spans via prefix sums over (ll, ml)
  2. per-position source map: literal positions point at themselves, match
     positions point `offset` bytes back (segmented scatter + cummax fill)
  3. pointer doubling (log2 L passes of src = src[src]) — every byte's
     transitive origin is a literal position, because every emitted byte
     ultimately derives from some literal; overlapping matches (offset < ml)
     converge the same way
  4. one gather of the literal stream through the resolved origin map

This turns the only truly serial part of the format into O(log L) gathers.
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_width",))
def execute_sequences_lanes(ll,        # (B, S) i32
                            ml,        # (B, S) i32
                            offset,    # (B, S) i32 resolved offsets
                            literals,  # (B, Lit) u8
                            out_len,   # (B,) i32
                            out_width: int):
    """Returns (out (B, out_width) u8, ok (B,) bool)."""
    B, S = ll.shape
    L = out_width
    lane = jnp.arange(B, dtype=jnp.int32)[:, None]

    run = ll + ml
    prev = jnp.cumsum(run, axis=1) - run          # exclusive prefix sum
    lit_start = prev
    match_start = prev + ll
    has_match = ml > 0

    # --- literal mask via +1/-1 delta scatter, then inclusive scan ---------
    delta = jnp.zeros((B, L + 1), dtype=jnp.int32)
    delta = delta.at[lane, jnp.minimum(lit_start, L)].add(1, mode="drop")
    delta = delta.at[lane, jnp.minimum(match_start, L)].add(-1, mode="drop")
    is_lit = jnp.cumsum(delta[:, :L], axis=1) > 0

    # --- per-position offset via governing-match-start cummax fill ---------
    start_sentinel = jnp.where(has_match, match_start, L)
    starts_arr = jnp.full((B, L), -1, dtype=jnp.int32)
    starts_arr = starts_arr.at[lane, jnp.minimum(start_sentinel, L - 1)].max(
        jnp.where(has_match, match_start, -1), mode="drop")
    governing = jax.lax.cummax(starts_arr, axis=1)

    offs_arr = jnp.zeros((B, L), dtype=jnp.int32)
    offs_arr = offs_arr.at[lane, jnp.minimum(start_sentinel, L - 1)].max(
        jnp.where(has_match, offset, 0), mode="drop")
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    off_at = jnp.take_along_axis(offs_arr, jnp.maximum(governing, 0), axis=1)

    in_range = pos < out_len[:, None]
    # Periodic-fill rewrite: a position whose naive source (p - offset) still
    # lies inside its own match run resolves in closed form — the run copies
    # a period-`offset` pattern, so the origin is
    #   run_start - offset + ((p - run_start) mod offset).
    # This removes every intra-match chain (RLE-style fills would otherwise
    # need log2(run_length) doubling passes).
    start_at = jnp.maximum(governing, 0)  # match-run start per position
    naive = pos - off_at
    periodic = start_at - off_at + ((pos - start_at) % jnp.maximum(off_at, 1))
    src = jnp.where(naive >= start_at, periodic, naive)
    src = jnp.where(is_lit | ~in_range, pos, src)
    ok = jnp.all((src >= 0) | ~in_range, axis=1)
    src = jnp.maximum(src, 0)

    # --- pointer doubling with early exit -----------------------------------
    # Intra-match chains are gone; remaining depth is the cross-match
    # reference depth, typically small. Iterate src = src[src] until a
    # fixpoint, bounded by log2(L).
    passes = max(1, (L - 1).bit_length())

    def cond(state):
        i, src, done = state
        return (i < passes) & ~done

    def body(state):
        i, src, _ = state
        nxt = jnp.take_along_axis(src, src, axis=1)
        done = jnp.all(nxt == src)
        return i + 1, nxt, done

    _, src, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), src, False))

    # --- origin must be a literal position; gather the byte ----------------
    lit_idx = jnp.cumsum(is_lit.astype(jnp.int32), axis=1) - 1
    final_idx = jnp.take_along_axis(lit_idx, src, axis=1)
    final_idx = jnp.clip(final_idx, 0, literals.shape[1] - 1)
    out = jnp.take_along_axis(literals, final_idx, axis=1)
    resolved = jnp.take_along_axis(is_lit, src, axis=1)
    ok = ok & jnp.all(resolved | ~in_range, axis=1)
    out = jnp.where(in_range, out, 0).astype(jnp.uint8)
    return out, ok
