"""Device match finding for the Fastest encode level.

The reference spends >60% of encode time in suffix matching
(match_generator.rs, Readme.md:121). Its matcher is a sequential
hash-probe-insert loop; the TPU formulation splits the work:

  XLA (vectorized, batched over block lanes):
    1. hash every 5-byte window (multiplicative hash, HASH_BITS buckets)
    2. candidate[i] = most recent previous position with the same hash —
       the "previous equal element" problem, solved with one stable sort
       over (hash, position) pairs per lane
    3. lcp8[i] = length of the common prefix of data[i:] / data[cand:]
       capped at 8 (two u32-window gathers + XOR + count-trailing-zeros)

  Pallas (per-lane serial, grid over lanes x position chunks):
    4. greedy parse: walk positions left to right; take a match when
       lcp >= MIN_MATCH (extending 8-capped matches by comparing 128-byte
       rows in-kernel), else advance with the reference's literal-run
       skip acceleration. Emits (ll, ml, offset) records per lane.

The parse semantics are ours (not a byte-for-byte clone of the reference
matcher): output streams are validated by round-trip + libzstd interop and
a compressed-size gate instead of stream equality.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_MATCH = 5
HASH_BITS = 16
_PRIME = jnp.uint32(2654435761)

POS_CHUNK = 8192   # positions per parse grid step (SMEM blocks)
MAX_SEQS = 32768   # emitted records cap per lane (<= L/4 at MIN_MATCH=5... 4)


@functools.partial(jax.jit, static_argnames=())
def find_candidates(data_u8, n_valid):
    """data (B, L) u8, n_valid (B,) i32 -> (cand (B, L) i32, lcp8 (B, L) i32).

    cand[i] = latest j < i with hash5(j) == hash5(i) (-1 if none);
    lcp8[i] = common-prefix length of data[i:]/data[cand[i]:], capped at 8;
    both 0/-1 beyond n_valid - MIN_MATCH.
    """
    B, L = data_u8.shape
    b = data_u8.astype(jnp.uint32)
    pad = jnp.zeros((B, 8), jnp.uint32)
    bp = jnp.concatenate([b, pad], axis=1)
    w4 = (bp[:, :L] | (bp[:, 1:L + 1] << 8) | (bp[:, 2:L + 2] << 16)
          | (bp[:, 3:L + 3] << 24))
    b5 = bp[:, 4:L + 4]
    h = ((w4 * _PRIME) ^ (b5 * jnp.uint32(0x9E3779B1)))
    h = (h >> (32 - HASH_BITS)).astype(jnp.int32)          # (B, L)

    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = pos <= (n_valid[:, None] - MIN_MATCH)
    key = jnp.where(valid, h, jnp.int32(1 << HASH_BITS))   # invalid sorts last

    # previous same-hash position: stable sort by hash, neighbor lookup
    order = jnp.argsort(key, axis=1, stable=True)          # (B, L)
    key_s = jnp.take_along_axis(key, order, axis=1)
    prev_pos = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), order[:, :-1]], axis=1)
    same = jnp.concatenate(
        [jnp.zeros((B, 1), bool), key_s[:, 1:] == key_s[:, :-1]], axis=1)
    cand_sorted = jnp.where(same, prev_pos, -1)
    cand = jnp.zeros((B, L), jnp.int32).at[
        jnp.arange(B, dtype=jnp.int32)[:, None], order].set(cand_sorted)
    cand = jnp.where(valid, cand, -1)

    # lcp capped at 8 via two u32 windows at i and cand
    w4b = (bp[:, 4:L + 4] | (bp[:, 5:L + 5] << 8) | (bp[:, 6:L + 6] << 16)
           | (bp[:, 7:L + 7] << 24))
    safe = jnp.maximum(cand, 0)
    c4 = jnp.take_along_axis(w4, safe, axis=1)
    c4b = jnp.take_along_axis(w4b, safe, axis=1)
    x0 = w4 ^ c4
    x1 = w4b ^ c4b
    # count trailing equal bytes: 4 if x0==0 else ctz(x0)//8, then extend
    def tz_bytes(x):
        b0 = (x & 0xFF) == 0
        b1 = (x & 0xFFFF) == 0
        b2 = (x & 0xFFFFFF) == 0
        return (b0.astype(jnp.int32) + b1.astype(jnp.int32)
                + b2.astype(jnp.int32) + (x == 0).astype(jnp.int32))
    l0 = tz_bytes(x0)
    lcp = jnp.where(x0 == 0, 4 + tz_bytes(x1), l0)
    lcp = jnp.where(cand >= 0, lcp, 0)
    # matches may not run past the valid end
    lcp = jnp.minimum(lcp, jnp.maximum(n_valid[:, None] - pos, 0))
    return cand, lcp.astype(jnp.int32)


def _parse_kernel(cand_ref, lcp_ref, nv_ref, data_ref, seq_ref,
                  nseq_ref, st_ref, data_rows: int, n_chunks: int):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        st_ref[0] = 0   # i (position)
        st_ref[1] = 0   # anchor (literal run start)
        st_ref[2] = 0   # emitted sequence count

    n_valid = nv_ref[0, 0, 0]
    chunk_end = jnp.minimum((c + 1) * POS_CHUNK, n_valid)

    def extend(i, m, off):
        """Extend a match beyond the 8-cap by 128-byte row compares."""
        def cond(s):
            i2, m2, go = s
            return go

        def body(s):
            i2, m2, _ = s
            p = i2 + m2
            rot_d = _row_bytes(data_ref, p, data_rows)
            rot_s = _row_bytes(data_ref, p - off, data_rows)
            eq = rot_d == rot_s
            jjj = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            lim = jnp.minimum(n_valid - p, 128)
            neq = jnp.where(eq, 128, jjj)
            neq = jnp.where(jjj < lim, neq, jjj)
            adv = jnp.min(neq)
            adv = jnp.minimum(adv, lim)
            return i2, m2 + adv, (adv >= 128) & (m2 + adv < (1 << 20))

        _, m, _ = jax.lax.while_loop(cond, body, (i, m, m == 8))
        return m

    def step(s):
        i, anchor, ns = s
        lc = lcp_ref[0, 0, i & (POS_CHUNK - 1)]
        cd = cand_ref[0, 0, i & (POS_CHUNK - 1)]

        def take(_):
            off = i - cd
            m = extend(i, lc, off)
            slot = jnp.minimum(ns, MAX_SEQS - 1)
            seq_ref[0, 0, slot] = i - anchor
            seq_ref[0, 1, slot] = m
            seq_ref[0, 2, slot] = off
            return i + m, i + m, ns + 1

        def skip(_):
            # literal-run acceleration a la the reference skip_matching
            stepn = 1 + ((i - anchor) >> 8)
            return i + stepn, anchor, ns

        return jax.lax.cond((lc >= MIN_MATCH) & (cd >= 0), take, skip, 0)

    def cond(s):
        i, anchor, ns = s
        return (i < chunk_end) & (ns < MAX_SEQS)

    i, anchor, ns = jax.lax.while_loop(
        cond, step, (st_ref[0], st_ref[1], st_ref[2]))
    st_ref[0] = i
    st_ref[1] = anchor
    st_ref[2] = ns
    nseq_ref[0, 0, 0] = ns
    nseq_ref[0, 0, 1] = anchor  # trailing literals = n_valid - anchor


def _row_bytes(data_ref, byte_pos, rows: int):
    """128 bytes starting at byte_pos as a (1,128) i32 row (rolled load)."""
    r = byte_pos >> 7
    m = byte_pos & 127
    blk = data_ref[0, pl.ds(jnp.clip(r, 0, rows - 2), 2), :]
    rot = pltpu.roll(blk, (128 - m) & 127, axis=1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    return jnp.where(jj < 128 - m, rot[0:1], rot[1:2])


@functools.partial(jax.jit, static_argnames=("interpret",))
def parse_blocks(data_u8, n_valid, interpret: bool = False):
    """Greedy-parse B block lanes. Returns (ll, ml, off) (B, MAX_SEQS) i32,
    nseq (B,) i32, trailing_anchor (B,) i32 (literals from anchor to
    n_valid are the trailing run)."""
    B, L = data_u8.shape
    cand, lcp = find_candidates(data_u8, n_valid)

    rows = (L + 127) // 128 + 2
    pad = rows * 128 - L
    data_i32 = jnp.pad(data_u8, ((0, 0), (0, pad))).astype(
        jnp.int32).reshape(B, rows, 128)
    n_chunks = max(1, (L + POS_CHUNK - 1) // POS_CHUNK)
    Lp = n_chunks * POS_CHUNK
    if Lp > L:
        cand = jnp.pad(cand, ((0, 0), (0, Lp - L)), constant_values=-1)
        lcp = jnp.pad(lcp, ((0, 0), (0, Lp - L)))

    # SMEM totals only 1 MB: single-buffer the big constant-index blocks
    # (the 3xMAX_SEQS output alone is 384 KB).
    smem = lambda w: pl.BlockSpec((1, 1, w), lambda l, c: (l, 0, c),
                                  memory_space=pltpu.SMEM)
    seqs, meta = pl.pallas_call(
        functools.partial(_parse_kernel, data_rows=rows, n_chunks=n_chunks),
        grid=(B, n_chunks),
        in_specs=[smem(POS_CHUNK), smem(POS_CHUNK),
                  pl.BlockSpec((1, 1, 1), lambda l, c: (l, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, rows, 128), lambda l, c: (l, 0, 0),
                               pipeline_mode=pl.Buffered(1),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 3, MAX_SEQS), lambda l, c: (l, 0, 0),
                                pipeline_mode=pl.Buffered(1),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec((1, 1, 2), lambda l, c: (l, 0, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, 3, MAX_SEQS), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1, 2), jnp.int32)),
        scratch_shapes=[pltpu.SMEM((4,), jnp.int32)],
        interpret=interpret,
    )(cand[:, None, :], lcp[:, None, :], n_valid[:, None, None], data_i32)
    return (seqs[:, 0], seqs[:, 1], seqs[:, 2], meta[:, 0, 0], meta[:, 0, 1])
