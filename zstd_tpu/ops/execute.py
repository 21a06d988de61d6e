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


def execute_window_xla(ll,         # (L, S) i32 group records
                       ml,         # (L, S) i32
                       offset,     # (L, S) i32 resolved offsets
                       literals,   # (L, Llit) u8 group literals
                       out_len,    # (L,) i32 exact group lengths
                       hist_avail,  # (L,) i32 real history bytes usable
                       out_width: int, window: int,
                       win=None,   # (L, window) u8 trailing history (near)
                       acc=None,   # (L, A) u8 full accumulator (far mode)
                       written=None):  # (L,) i32 acc cursor (far mode)
    """Windowed group execution as pure XLA — the CPU-mesh formulation of
    ops/pallas_execute.execute_window_pallas (same contract, same ok
    semantics). The window history rides as ONE synthetic leading literal
    run (ll=window bytes of `win`, ml=0), so match offsets reaching across
    the group boundary resolve through the ordinary pointer-doubling
    executor with no special casing — the same trick the framer uses for
    single-row dict frames (decode_buffer.rs:143-179 analog).

    Near mode (win): combined stream = [win | group]; offsets reach at most
    pos + window by the caller's avail cap. Far mode (acc + written): the
    synthetic run is the ENTIRE accumulator prefix [0, written), so
    big-window offsets (real window > the pallas VMEM prefix) reach any
    history byte directly — no far-stream pre-gather needed; returns the
    whole advanced accumulator instead of the group slice.

    Returns (group bytes (L, out_width) u8, ok) in near mode,
    (new acc (L, A) u8, ok) in far mode.
    """
    L, S = ll.shape
    run = ll + ml
    endpos = jnp.cumsum(run, axis=1)
    pos_before_match = endpos - ml
    reach = pos_before_match + hist_avail[:, None]
    off_ok = (ml == 0) | ((offset > 0) & (offset <= reach))
    lit_need = jnp.cumsum(ll, axis=1)
    ok = (jnp.all(off_ok, axis=1) & (endpos[:, -1] == out_len)
          & (out_len <= out_width) & (lit_need[:, -1] <= literals.shape[1]))

    zcol = jnp.zeros((L, 1), jnp.int32)
    if acc is None:
        base = jnp.full((L,), window, jnp.int32)
        lit2 = jnp.concatenate([win.astype(jnp.uint8), literals], axis=1)
        ow2 = window + out_width
    else:
        base = written
        A = acc.shape[1]
        lit2 = jnp.concatenate(
            [acc.astype(jnp.uint8),
             jnp.zeros((L, literals.shape[1]), jnp.uint8)], axis=1)
        for i in range(L):
            lit2 = jax.lax.dynamic_update_slice(
                lit2, literals[i][None, :], (i, written[i]))
        ow2 = A
    ll2 = jnp.concatenate([base[:, None], ll], axis=1)
    ml2 = jnp.concatenate([zcol, ml], axis=1)
    of2 = jnp.concatenate([zcol, offset], axis=1)
    out2, ok2 = execute_sequences_lanes(ll2, ml2, of2, lit2,
                                        base + out_len, ow2)
    ok = ok & ok2
    if acc is None:
        return out2[:, window:], ok
    return out2, ok
