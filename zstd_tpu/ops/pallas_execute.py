"""Pallas TPU kernel for LZ77 sequence execution.

Replaces the XLA pointer-doubling executor (zstd_tpu/ops/execute.py) on real
TPUs. The doubling formulation is bottlenecked by XLA's random-gather
throughput (~70 M elem/s measured on v5e); this kernel instead walks each
lane's sequence list serially (grid = one step per frame lane, inputs
double-buffered by the Pallas pipeline) and moves bytes with wide VPU ops:

  - literal runs / matches with offset >= 128: chunked copies — two
    dynamically-offset sublane loads + lane rotations + masked store per
    128-byte x K rows chunk (the classic unaligned-copy two-source trick)
  - matches with offset < 128 (RLE-ish fills): closed-form periodic fill —
    the pattern row is fetched once, then each chunk is built with a
    (K,128,128) one-hot against the phase map, no serial byte chain
  - overlap safety: chunk span <= offset for self-referential copies, so a
    chunk never reads bytes it writes

Semantics parity: sequence_execution.rs:5-115 (literal copy, offset-resolved
match copy, trailing run as a final ml=0 record). Offsets must already be
repcode-resolved (ops/sequence.py::resolve_offsets).

Mosaic constraints honoured (probed on this toolchain, scripts/
microbench_gather.py): i32 only in VMEM (u8 vector ops crash the remote
compiler), no dynamic minor-dim indexing, sequence records in SMEM (dynamic
scalar indexing is supported there), dynamic sublane slices + pltpu.roll +
masked read-modify-write stores for byte movement.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Sequence-record SMEM capacity (ll/ml/off rows + meta; probed good to
# 32768 on v5e — scripts/microbench_gather.py). Frames with more sequences
# (a 128 KiB frame can hold up to ~43K three-byte matches) take the XLA
# executor instead.
MAX_SMEM_SEQS = 32768
_K = 8  # rows per copy chunk (1 KiB)


def _copy_chunked(src_ref, out_ref, sb, db, n, rows_k: int, src_rows: int):
    """Copy n bytes from src_ref byte sb to out_ref byte db.

    rows_k rows (128 bytes each) per iteration. Caller guarantees either
    src_ref is not out_ref, or (db - sb) >= 128 * rows_k (no chunk reads its
    own writes). Partial head/tail rows are handled by the store mask.
    """
    delta = sb - db
    q = delta >> 7
    m = delta & 127
    sh = (128 - m) & 127
    rd0 = db >> 7
    iters = ((db + n - 1) >> 7) - rd0 + 1
    iters = (iters + rows_k - 1) // rows_k
    rmax = src_rows - rows_k - 1
    jj = jax.lax.broadcasted_iota(jnp.int32, (rows_k, 128), 1)
    rr = jax.lax.broadcasted_iota(jnp.int32, (rows_k, 128), 0)

    def body(c, _):
        rd = rd0 + c * rows_k
        rs = rd + q
        # one (rows_k+1, 128) load + one roll serve both source row-sets.
        # rs can be -1 on the first chunk (src bytes below 0 are masked
        # off); a plain clamp would shift the whole window, so roll the
        # rows down by one instead — garbage lands in a masked row.
        blk = src_ref[0, pl.ds(jnp.clip(rs, 0, rmax), rows_k + 1), :]
        blk = jnp.where(rs < 0, pltpu.roll(blk, 1, axis=0), blk)
        rot = pltpu.roll(blk, sh, axis=1)
        val = jnp.where(jj < 128 - m, rot[0:rows_k], rot[1:rows_k + 1])
        d = 128 * rd + 128 * rr + jj
        mask = (d >= db) & (d < db + n)
        cur = out_ref[0, pl.ds(rd, rows_k), :]
        out_ref[0, pl.ds(rd, rows_k), :] = jnp.where(mask, val, cur)
        return 0

    jax.lax.fori_loop(0, iters, body, 0)


def _fill_periodic(out_ref, db, off, n):
    """Match copy with off < 128: out[d] = pattern[(d - db) % off].

    The pattern is the off bytes before db (already written). Each chunk is
    synthesized with a one-hot select over the 128-wide pattern row — the
    serial byte chain of an overlapping match becomes closed-form.
    """
    pb = db - off
    rowp = jnp.maximum(pb >> 7, 0)
    mp = pb & 127
    shp = (128 - mp) & 127
    rot = pltpu.roll(out_ref[0, pl.ds(rowp, 2), :], shp, axis=1)
    jrow = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    pat = jnp.where(jrow < 128 - mp, rot[0:1], rot[1:2])  # [j] valid j < off

    rd0 = db >> 7
    iters = ((db + n - 1) >> 7) - rd0 + 1
    iters = (iters + _K - 1) // _K
    jj = jax.lax.broadcasted_iota(jnp.int32, (_K, 128), 1)
    rr = jax.lax.broadcasted_iota(jnp.int32, (_K, 128), 0)
    p3 = jax.lax.broadcasted_iota(jnp.int32, (_K, 128, 128), 2)
    # keep mod operands nonnegative: add a multiple of off larger than any
    # (db - chunk start) distance (out width < 2^21 bytes => < off << 21)
    bias = off << 14

    def body(c, _):
        rd = rd0 + c * _K
        d = 128 * rd + 128 * rr + jj
        ph = (d - db + bias) % off
        oh = p3 == ph[:, :, None]
        val = jnp.sum(jnp.where(oh, pat.reshape(1, 1, 128), 0), axis=2)
        mask = (d >= db) & (d < db + n)
        cur = out_ref[0, pl.ds(rd, _K), :]
        out_ref[0, pl.ds(rd, _K), :] = jnp.where(mask, val, cur)
        return 0

    jax.lax.fori_loop(0, iters, body, 0)


SEQ_CHUNK = 4096  # records per grid step; larger SMEM blocks measurably
                  # slow the dynamic scalar reads that pace the seq loop


def _copy_short(src_ref, out_ref, sb, db, n, src_rows: int, consts):
    """Single-chunk copy for runs spanning <= 2 dst rows (n <= 129 worst
    case; callers bound n <= 128). Same two-source roll trick as
    _copy_chunked but without the loop — short runs dominate real data and
    the per-copy fixed cost is what paces the kernel."""
    jj, d2, _ = consts
    delta = sb - db
    q = delta >> 7
    m = delta & 127
    sh = (128 - m) & 127
    rd = db >> 7
    rs = rd + q
    # one (3,128) load + one roll serve both source row-pairs: A = rows
    # 0..1, B = rows 1..2 of the rolled block. rs = -1 is handled by a
    # sublane roll (garbage lands in a masked row).
    blk = src_ref[0, pl.ds(jnp.clip(rs, 0, src_rows - 3), 3), :]
    blk = jnp.where(rs < 0, pltpu.roll(blk, 1, axis=0), blk)
    rot = pltpu.roll(blk, sh, axis=1)
    val = jnp.where(jj < 128 - m, rot[0:2], rot[1:3])
    d = 128 * rd + d2
    mask = (d >= db) & (d < db + n)
    cur = out_ref[0, pl.ds(rd, 2), :]
    out_ref[0, pl.ds(rd, 2), :] = jnp.where(mask, val, cur)


def _fill_periodic_short(out_ref, db, off, n, consts):
    """Periodic fill for matches spanning <= 2 dst rows: one (2,128,128)
    one-hot instead of the K-row loop's (8,128,128) per chunk."""
    jrow, d2, p3 = consts
    pb = db - off
    rowp = jnp.maximum(pb >> 7, 0)
    mp = pb & 127
    shp = (128 - mp) & 127
    rot = pltpu.roll(out_ref[0, pl.ds(rowp, 2), :], shp, axis=1)
    pat = jnp.where(jrow[0:1] < 128 - mp, rot[0:1], rot[1:2])
    rd = db >> 7
    d = 128 * rd + d2
    ph = (d - db + (off << 14)) % off
    oh = p3 == ph[:, :, None]
    val = jnp.sum(jnp.where(oh, pat.reshape(1, 1, 128), 0), axis=2)
    mask = (d >= db) & (d < db + n)
    cur = out_ref[0, pl.ds(rd, 2), :]
    out_ref[0, pl.ds(rd, 2), :] = jnp.where(mask, val, cur)


def _exec_kernel(ll_ref, ml_ref, of_ref, ns_ref, lit_ref, out_ref, ok_ref,
                 cur_ref, lit_rows: int, out_rows: int):
    c = pl.program_id(1)
    nseq = ns_ref[0, 0, 0]

    @pl.when(c == 0)
    def _():
        cur_ref[0] = 0  # out cursor
        cur_ref[1] = 0  # literal cursor

    base = c * SEQ_CHUNK
    count = jnp.clip(nseq - base, 0, SEQ_CHUNK)

    # loop-invariant iotas for the short-run fast paths (the (2,128,128)
    # one-hot iota is ~32 vregs — rebuilding it per sequence is pure waste)
    jj2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    rr2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0)
    consts = (jj2, 128 * rr2 + jj2,
              jax.lax.broadcasted_iota(jnp.int32, (2, 128, 128), 2))

    def seq_body(i, carry):
        op, lp = carry
        ll = ll_ref[0, 0, i]
        ml = ml_ref[0, 0, i]
        off = of_ref[0, 0, i]

        # a run spans <= 2 dst rows iff (dst&127) + n <= 256
        @pl.when((ll > 0) & ((op & 127) + ll <= 256))
        def _():
            _copy_short(lit_ref, out_ref, lp, op, ll, lit_rows, consts)

        @pl.when((op & 127) + ll > 256)
        def _():
            _copy_chunked(lit_ref, out_ref, lp, op, ll, _K, lit_rows)

        opm = op + ll
        short_m = (opm & 127) + ml <= 256

        @pl.when((ml > 0) & (off >= 128) & short_m & (off >= ml))
        def _():
            _copy_short(out_ref, out_ref, opm - off, opm, ml, out_rows,
                        consts)

        @pl.when((ml > 0) & (off >= 128 * _K)
                 & ~(short_m & (off >= ml)))
        def _():
            _copy_chunked(out_ref, out_ref, opm - off, opm, ml, _K, out_rows)

        @pl.when((ml > 0) & (off >= 128) & (off < 128 * _K)
                 & ~(short_m & (off >= ml)))
        def _():
            _copy_chunked(out_ref, out_ref, opm - off, opm, ml, 1, out_rows)

        @pl.when((ml > 0) & (off < 128) & short_m)
        def _():
            _fill_periodic_short(out_ref, opm, off, ml, consts)

        @pl.when((ml > 0) & (off < 128) & ~short_m)
        def _():
            _fill_periodic(out_ref, opm, off, ml)

        return opm + ml, lp + ll

    op, lp = jax.lax.fori_loop(0, count, seq_body,
                               (cur_ref[0], cur_ref[1]))
    cur_ref[0] = op
    cur_ref[1] = lp
    ok_ref[0, 0, 0] = op


@functools.partial(jax.jit, static_argnames=("out_width", "interpret"))
def execute_sequences_pallas(ll, ml, offset, literals, out_len,
                             out_width: int, interpret: bool = False):
    """Drop-in for execute_sequences_lanes on TPU. Returns (out u8, ok bool).

    Lanes that the kernel cannot prove well-formed (offset beyond written
    output, length overflow, too many sequences for SMEM) are flagged not-ok
    and left to the caller's fallback path.
    """
    B, S = ll.shape
    lit_w = literals.shape[1]
    out_rows = (out_width + 127) // 128 + _K + 2
    lit_rows = (lit_w + 127) // 128 + _K + 2

    # --- XLA-side validation (cheap vector ops) ---------------------------
    run = ll + ml
    endpos = jnp.cumsum(run, axis=1)
    pos_before_match = endpos - ml
    off_ok = (ml == 0) | ((offset > 0) & (offset <= pos_before_match))
    lit_need = jnp.cumsum(ll, axis=1)
    ok = (jnp.all(off_ok, axis=1)
          & (endpos[:, -1] == out_len)
          & (out_len <= out_width)
          & (lit_need[:, -1] <= lit_w))

    # nseq = index of last active record + 1, zeroed for bad lanes
    act = run > 0
    nseq = jnp.max(jnp.where(act, jnp.arange(S, dtype=jnp.int32)[None, :] + 1,
                             0), axis=1)
    ok = ok & (nseq <= MAX_SMEM_SEQS)
    nseq = jnp.where(ok, nseq, 0)

    n_chunks = max(1, -(-min(S, MAX_SMEM_SEQS) // SEQ_CHUNK))
    s_pad = n_chunks * SEQ_CHUNK

    def rec3(x):
        x = x[:, :s_pad]
        if s_pad > x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1])))
        return x[:, None, :]  # (B, 1, s_pad)

    lit_pad = lit_rows * 128 - lit_w
    lit_i32 = jnp.pad(literals, ((0, 0), (0, lit_pad))).astype(
        jnp.int32).reshape(B, lit_rows, 128)

    smem_rec = pl.BlockSpec((1, 1, SEQ_CHUNK), lambda l, c: (l, 0, c),
                            memory_space=pltpu.SMEM)
    out_i32, endp = pl.pallas_call(
        functools.partial(_exec_kernel, lit_rows=lit_rows, out_rows=out_rows),
        grid=(B, n_chunks),
        in_specs=[
            smem_rec, smem_rec, smem_rec,
            pl.BlockSpec((1, 1, 1), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, lit_rows, 128), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, out_rows, 128), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, out_rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(rec3(ll), rec3(ml), rec3(offset), nseq[:, None, None], lit_i32)

    ok = ok & (endp[:, 0, 0] == out_len)
    flat = out_i32.reshape(B, out_rows * 128)[:, :out_width]
    pos = jnp.arange(out_width, dtype=jnp.int32)[None, :]
    out = jnp.where(pos < out_len[:, None], flat, 0).astype(jnp.uint8)
    return out, ok
