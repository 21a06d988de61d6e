"""Pallas TPU kernel for LZ77 sequence execution.

Replaces the XLA pointer-doubling executor (zstd_tpu/ops/execute.py) on real
TPUs. The doubling formulation is bottlenecked by XLA's random-gather
throughput (~70 M elem/s measured on v5e); this kernel instead walks each
lane's sequence list serially and moves bytes with wide VPU ops.

v2 structure (v1 at ~180 ns/sequence was latency-stall-bound: one lane's
dependent chain of SMEM reads -> dynamic loads -> rolls -> store left the
issue pipeline idle):
  - FOUR lanes per grid step, their per-sequence chains interleaved in one
    fori body — independent chains fill each other's stalls
  - the dominant case (short literal run + short match, source disjoint
    from this sequence's own writes: off >= ll + ml) is handled by an
    always-executed BRANCHLESS fused copy: both sources loaded with the
    two-source roll trick, one 4-row masked store covers literals + match
  - rare cases (long runs, overlapping/periodic matches off < ll + ml)
    take the v1 branched paths under a single pl.when

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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
# masked VMEM stores (32-bit) skip the read-modify-write of partial-row
# writes; not re-exported publicly in this jax version
from jax._src.pallas.primitives import store as _masked_store

# EXPERIMENT (opt-in, ZSTD_TPU_EXEC_MASKED_STORE=1): native masked stores
# instead of the read-modify-write select. Saves one (rows,128) load + one
# select per store — NOT yet validated on real TPU (run
# scripts/validate_pallas_exec.py + corpus_device.py before flipping the
# default). Interpret mode (CPU tests) executes masked stores pathologically
# slowly, so it always takes the RMW form. Toggled per pallas_call trace via
# the _RMW global — `interpret` is a static argname, so each variant traces
# separately and the flag is read synchronously during tracing.
_MASKED_ST = os.environ.get("ZSTD_TPU_EXEC_MASKED_STORE", "") == "1"
_RMW = True


def _st(ref, lane, rd, rows: int, val, mask):
    """Masked partial-row store: read-modify-write by default, native
    masked store under the opt-in experiment flag."""
    if _RMW or not _MASKED_ST:
        cur = ref[lane, pl.ds(rd, rows), :]
        ref[lane, pl.ds(rd, rows), :] = jnp.where(mask, val, cur)
    else:
        _masked_store(ref, (lane, pl.ds(rd, rows), slice(None)), val,
                      mask=mask)

# Sequence-record cap per lane. Records stream through SMEM in SEQ_CHUNK
# blocks via the grid (per-step SMEM use is constant), so this only bounds
# the grid length / record-array width. The framer splits groups at 24K
# records but a single jumbo block (up to ~43K three-byte matches in
# 128 KiB) is atomic — 128K covers any group with wide margin. Lanes
# beyond it take the host/XLA fallback.
MAX_SMEM_SEQS = 131072

# Windowed exec: widest window the kernel holds IN VMEM. Frames with larger
# real windows (zstd --long, window_log 23-27) still decode on device: the
# VMEM window serves offsets <= pos + WINDOW_VMEM_CAP, and FAR matches
# (off > pos + cap — their source lies entirely below the VMEM window,
# since max match length 128 KiB << cap) are pre-gathered from the HBM
# accumulator into a compact per-lane far stream that the kernel copies
# from like a second literal buffer (decode_buffer.rs:182-218 semantics
# with the window in HBM instead of falling back to the host).
WINDOW_VMEM_CAP = int(os.environ.get("ZSTD_TPU_WINDOW_VMEM_CAP", 1 << 22))

# ROOT CAUSE FOUND (r4, scripts/probe_lockstep.py): the r3 "multi-lane
# lockstep corruption past ~18 MB" was an input_output_aliasing DMA race —
# the aliased init block's prefill races the kernel at large block sizes
# (Li=1 @ 31.5-36.6 MB corrupted ~257 KiB of match copies from byte 64 with
# ok=true; the SAME shape with an explicit init copy is bit-exact, and r3's
# own corrupting shape Li=2 @ 12.6 MB/lane no longer reproduces). The
# windowed kernel now defaults to the explicit-copy form (no aliasing, the
# init block holds only the window rows), so the cap is the VMEM budget
# scaled per lane, not a corruption bound. Kept only for the dev-probe
# aliased mode (ZSTD_TPU_WEXEC_NOALIAS=0).
LOCKSTEP_BLOCK_CAP = 18 << 20


def window_out_rows(window: int, out_width: int) -> int:
    """Sublane rows of the windowed exec kernel's out block (per lane)."""
    return _FR + window // 128 + (out_width + 127) // 128 + _K + 2

# dev-only ablation switch (see pallas_sequence.py): "fused" | "slow" |
# "body" skips that part of the per-sequence work; "sink" redirects the
# fused store to a scratch ref and "litload" sources the match window from
# lit_ref — both break the store(out_ref)->load(out_ref) ordering pair to
# attribute how much of the per-sequence cost is memory-hazard stalls
# (timing-only: results are wrong under either)
_ABLATE = os.environ.get("ZSTD_TPU_EXEC_ABLATE", "")
# EXPERIMENT (opt-in, ZSTD_TPU_EXEC_PRE=1): scalar offload — XLA
# precomputes the per-record address math (store row, window rows/shifts,
# mask bounds, slow flag) into six extra SMEM words so the kernel's fused
# path does ~6 scalar reads + ~6 ALU ops instead of 5 reads + ~18 ALU ops.
# PERF.md: "one packed read beats five ALU ops" — scalar issue paces the
# per-sequence loop. Validate on device before flipping the default.
_PRE = os.environ.get("ZSTD_TPU_EXEC_PRE", "") == "1"
# EXPERIMENT (opt-in, ZSTD_TPU_EXEC_SPLIT=1): split the fused store into a
# match-only store (always) plus a conditional literal store — ll == 0 for
# ~50% of corpus sequences (seq_stats.py p50), and skipping the literal
# window gather there drops ~6 of the ~16 fused-path vector ops at the
# price of a per-record scalar branch and a second (2,128) store when
# literals ARE present. Net is modeled ~1.15x; measure on device.
_SPLIT = os.environ.get("ZSTD_TPU_EXEC_SPLIT", "") == "1"
# DEFAULT ON (ZSTD_TPU_EXEC_PHASED=0 reverts): issue all L lanes' window
# loads before any lane's store each iteration (see _fused_loads) — breaks
# L-1 of the L per-iteration store->load ordering stalls on out_ref.
# Measured r3: 32 MiB exec replay 164 -> 76 ms (86 -> 40 ns/seq), matching
# the sink/litload hazard-ablation floor; device-validated bit-exact
# (validate_pallas_exec, corpus_device 101/101, validate_window_exec).
_PHASED = os.environ.get("ZSTD_TPU_EXEC_PHASED", "1") == "1"
# Windowed-kernel round width: each grid iteration processes G consecutive
# records per lane (round-barrier eligibility keeps the phased load hoist
# correct — see _exec_kernel). -1 = auto: max(1, 8 // lanes_per_step), so a
# single chained frame (Li=1) gets 8 records in flight like the batched
# kernel's L=8 lanes. 1 disables rounds (pre-r4 behavior).
_WG = int(os.environ.get("ZSTD_TPU_WEXEC_G", "-1"))
# DEFAULT ON (r4): the windowed kernel takes the window prefix as a plain
# (non-aliased) input block and copies it into the out block at grid step
# 0. The io-aliased form (ZSTD_TPU_WEXEC_NOALIAS=0, dev probe only)
# CORRUPTS at large blocks: the aliased input's prefill races the kernel
# (probed r4 — Li=1 @ 31.5 MB loses ~257 KiB of match reads from byte 64
# while ok stays true; explicit copy is bit-exact at the same shape).
# The explicit form also halves per-lane VMEM: the init block holds only
# the (PAD + window) rows instead of the whole out block.
_NOALIAS = os.environ.get("ZSTD_TPU_WEXEC_NOALIAS", "1") == "1"
_K = 8    # rows per copy chunk (1 KiB) in the slow chunked path
# lanes per grid step. L=8 re-validated r4 on device (replay 63.1 ms vs
# 76.1 ms at L=4, stable across runs; validate_pallas_exec PASS) — more
# in-flight window loads amortize the remaining store->load boundary under
# the phased regime. L=16 spills vregs (r3: 68 ms).
_L = int(os.environ.get("ZSTD_TPU_EXEC_L", "8"))
# fused-path store window rows (span <= 128*(_FR-1) incl. the alignment
# row); the lead pad must be _FR rows for the rd-anchored match window
# (see _fused_short). _FR=5 measured NEUTRAL vs 3 at 128 MiB (r2) — the
# wider fused coverage is cancelled by the bigger per-op shapes.
_FR = int(__import__("os").environ.get("ZSTD_TPU_EXEC_FR", "3"))


def _copy_chunked(src_ref, out_ref, lane, sb, db, n, rows_k: int,
                  src_rows: int):
    """Copy n bytes from src_ref byte sb to out_ref byte db (lane `lane`).

    rows_k rows (128 bytes each) per iteration. Caller guarantees either
    src_ref is not out_ref, or (db - sb) >= 128 * rows_k (no chunk reads its
    own writes). Partial head/tail rows are handled by the store mask.
    All cursors carry the PAD_ROWS lead-row shift, so every source row
    index is >= 0 for active records (no roll-down fixup needed).
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
        # one (rows_k+1, 128) load + one roll serve both source row-sets
        blk = src_ref[lane, pl.ds(jnp.clip(rs, 0, rmax), rows_k + 1), :]
        rot = pltpu.roll(blk, sh, axis=1)
        val = jnp.where(jj < 128 - m, rot[0:rows_k], rot[1:rows_k + 1])
        d = 128 * rd + 128 * rr + jj
        mask = (d >= db) & (d < db + n)
        _st(out_ref, lane, rd, rows_k, val, mask)
        return 0

    jax.lax.fori_loop(0, iters, body, 0)


def _fill_periodic(out_ref, lane, db, off, n):
    """Match copy with off < 128: out[d] = pattern[(d - db) % off].

    The pattern is the off bytes before db (already written). Each chunk is
    synthesized with a one-hot select over the 128-wide pattern row — the
    serial byte chain of an overlapping match becomes closed-form.
    """
    pb = db - off
    rowp = jnp.maximum(pb >> 7, 0)
    mp = pb & 127
    shp = (128 - mp) & 127
    rot = pltpu.roll(out_ref[lane, pl.ds(rowp, 2), :], shp, axis=1)
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
        _st(out_ref, lane, rd, _K, val, mask)
        return 0

    jax.lax.fori_loop(0, iters, body, 0)


SEQ_CHUNK = 1024  # records per grid step; larger SMEM blocks measurably
                  # slow the dynamic scalar reads that pace the seq loop
                  # (and 4 lanes x 5 record arrays must fit SMEM)


def _fill_periodic_short(out_ref, lane, db, off, n, consts):
    """Periodic fill for matches spanning <= 2 dst rows: one (2,128,128)
    one-hot instead of the K-row loop's (8,128,128) per chunk."""
    jrow, d2, p3 = consts
    pb = db - off
    rowp = jnp.maximum(pb >> 7, 0)
    mp = pb & 127
    shp = (128 - mp) & 127
    rot = pltpu.roll(out_ref[lane, pl.ds(rowp, 2), :], shp, axis=1)
    pat = jnp.where(jrow[0:1] < 128 - mp, rot[0:1], rot[1:2])
    rd = db >> 7
    d = 128 * rd + d2
    ph = (d - db + (off << 14)) % off
    oh = p3 == ph[:, :, None]
    val = jnp.sum(jnp.where(oh, pat.reshape(1, 1, 128), 0), axis=2)
    mask = (d >= db) & (d < db + n)
    _st(out_ref, lane, rd, 2, val, mask)


def _window(ref, lane, row, sh, rows: int, max_rows: int):
    """(rows,128) byte window of `ref` starting at row `row` (>= 0 for every
    active record thanks to the PAD_ROWS lead shift), rotated left by sh
    within rows — the two-source-roll gather used by every copy. Returns
    the rolled (rows+1, 128) block; caller selects rot[0:rows] vs
    rot[1:rows+1] by column. The clip only matters for inactive/garbage
    records whose stores are masked off anyway."""
    blk = ref[lane, pl.ds(jnp.clip(row, 0, max_rows - rows - 1), rows + 1), :]
    if _ABLATE == "roll":  # dev-only: measure the dynamic lane-roll cost
        return blk
    if _ABLATE == "load":  # dev-only: measure the window load cost
        return pltpu.roll(ref[lane, pl.ds(0, rows + 1), :], sh, axis=1)
    return pltpu.roll(blk, sh, axis=1)


def _fused_loads(lit_ref, out_ref, lane, lp, op, off,
                 lit_rows: int, out_rows: int):
    """Load phase of the fused copy: just the two (_FR+1,128) window
    fetches, no rolls/selects/stores. The phased kernel issues ALL lanes'
    loads before ANY lane's store each iteration: loads and stores on
    out_ref are the ordering hazard that costs ~45 ns per store->load
    boundary (measured via the sink/litload ablations — 164 -> 77 ms on
    the 32 MiB replay), and lanes write disjoint rows, so hoisting the
    loads across the other lanes' stores is correct by construction and
    cuts the boundaries per iteration from L to 1."""
    rd = op >> 7
    dl = lp - op
    lblk = lit_ref[lane, pl.ds(jnp.clip(rd + (dl >> 7), 0,
                                        lit_rows - _FR - 2), _FR + 1), :]
    mref, mrows = ((lit_ref, lit_rows) if _ABLATE == "litload"
                   else (out_ref, out_rows))
    mblk = mref[lane, pl.ds(jnp.clip(rd + ((-off) >> 7), 0,
                                     mrows - _FR - 2), _FR + 1), :]
    return lblk, mblk


def _fused_finish(out_ref, lane, lblk, mblk, lp, op, ll, ml, off, ok,
                  consts4, sink_ref=None):
    """Compute + store phase of the fused copy (see _fused_loads)."""
    jj5, rr, d4 = consts4
    jj = jj5[:_FR]
    rd = op >> 7
    opa = op & 127
    opma = opa + ll
    enda = jnp.where(ok, opma + ml, opa)

    ml_ = (lp - op) & 127
    lrot = lblk if _ABLATE == "roll" else pltpu.roll(lblk, (128 - ml_) & 127,
                                                     axis=1)
    lval = jnp.where(jj < 128 - ml_, lrot[0:_FR], lrot[1:_FR + 1])
    mm = (-off) & 127
    mrot = mblk if _ABLATE == "roll" else pltpu.roll(mblk, (128 - mm) & 127,
                                                     axis=1)
    mval = jnp.where(jj < 128 - mm, mrot[0:_FR], mrot[1:_FR + 1])

    val = jnp.where(d4 < opma, lval, mval)
    mask = (d4 >= opa) & (d4 < enda)
    if _ABLATE == "sink" and sink_ref is not None:
        _st(sink_ref, lane, rd & 7, _FR, val, mask)
    else:
        _st(out_ref, lane, rd, _FR, val, mask)


def _fused_short(lit_ref, out_ref, lane, lp, op, ll, ml, off, ok,
                 lit_rows: int, out_rows: int, consts4, sink_ref=None):
    """Branchless fused literal+match copy for one sequence, masked by `ok`.

    Covers spans (op&127) + ll + ml <= 128*(_FR-1) with match source fully
    below op (off >= ll + ml). One load each from literals and output
    history, one masked (_FR,128) read-modify-write store. Both source
    windows anchor directly at the store row rd: the PAD_ROWS lead shift
    guarantees their start rows are >= 0 (lit: lp >= 256 so
    lp - (op&127) >= 129; match: opm - off >= 256 when disjoint, so
    128*rd - off >= opm - 255 - off >= 1).
    """
    jj5, rr, d4 = consts4
    jj = jj5[:_FR]
    rd = op >> 7
    opa = op & 127        # all bounds rebased to the store window (d4 axis):
    opma = opa + ll       # d = 128*rd + d4, so compares against op/opm/end
    enda = opma + ml      # become scalar-broadcast compares against d4 —
    # no (FR,128) d materialization. span <= 128*(_FR-1) keeps them in range.
    # fold `ok` into the bounds (scalar select beats a vector and): an
    # inactive record degenerates to the empty interval [opa, opa).
    enda = jnp.where(ok, enda, opa)

    # literal source window aligned to dst rows
    dl = lp - op
    ml_ = dl & 127
    lrot = _window(lit_ref, lane, rd + (dl >> 7), (128 - ml_) & 127, _FR,
                   lit_rows)
    lval = jnp.where(jj < 128 - ml_, lrot[0:_FR], lrot[1:_FR + 1])

    # match source window (src = d - off for d >= opm), anchored at rd
    mm = (-off) & 127
    mref, mrows = ((lit_ref, lit_rows) if _ABLATE == "litload"
                   else (out_ref, out_rows))
    mrot = _window(mref, lane, rd + ((-off) >> 7), (128 - mm) & 127, _FR,
                   mrows)
    mval = jnp.where(jj < 128 - mm, mrot[0:_FR], mrot[1:_FR + 1])

    val = jnp.where(d4 < opma, lval, mval)
    mask = (d4 >= opa) & (d4 < enda)
    if _ABLATE == "sink" and sink_ref is not None:
        _st(sink_ref, lane, rd & 7, _FR, val, mask)
    else:
        _st(out_ref, lane, rd, _FR, val, mask)


def _fused_split(lit_ref, out_ref, lane, lp, op, ll, ml, off, ok,
                 lit_rows: int, out_rows: int, consts4):
    """ZSTD_TPU_EXEC_SPLIT variant of _fused_short: an unconditional
    match-only store plus a pl.when-guarded literal store. Sequences with
    ll == 0 (~half the corpus) skip the literal window gather entirely;
    sequences with literals pay one extra (_FR,128) store."""
    jj5, rr, d4 = consts4
    jj = jj5[:_FR]
    rd = op >> 7
    opa = op & 127
    opma = opa + ll
    enda = jnp.where(ok, opma + ml, opma)

    mm = (-off) & 127
    mrot = _window(out_ref, lane, rd + ((-off) >> 7), (128 - mm) & 127, _FR,
                   out_rows)
    mval = jnp.where(jj < 128 - mm, mrot[0:_FR], mrot[1:_FR + 1])
    _st(out_ref, lane, rd, _FR, mval, (d4 >= opma) & (d4 < enda))

    @pl.when(ok & (ll > 0))
    def _():
        dl = lp - op
        ml_ = dl & 127
        lrot = _window(lit_ref, lane, rd + (dl >> 7), (128 - ml_) & 127, _FR,
                       lit_rows)
        lval = jnp.where(jj < 128 - ml_, lrot[0:_FR], lrot[1:_FR + 1])
        _st(out_ref, lane, rd, _FR, lval, (d4 >= opa) & (d4 < opma))


def _nullgate():
    """Identity decorator standing in for pl.when when no gate applies."""
    def deco(fn):
        fn()
        return fn
    return deco


def _iota_consts():
    """Loop-invariant iotas (the (2,128,128) one-hot iota is ~32 vregs —
    rebuilding it per sequence is pure waste)."""
    jj2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    rr2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0)
    consts = (jj2, 128 * rr2 + jj2,
              jax.lax.broadcasted_iota(jnp.int32, (2, 128, 128), 2))
    jj4 = jax.lax.broadcasted_iota(jnp.int32, (_FR + 1, 128), 1)
    rr4 = jax.lax.broadcasted_iota(jnp.int32, (_FR, 128), 0)
    consts4 = (jj4, rr4, 128 * rr4 + jj4[:_FR])
    return consts, consts4


def _make_slow_seq(lit_ref, out_ref, consts, lit_rows: int, out_rows: int,
                   far_ref=None, far_rows: int = 0):
    """v1 branched dispatch — long runs and overlapping matches. With
    far_ref (windowed kernel only): records whose match source lies below
    the VMEM window (fsb >= 0) copy from the pre-gathered far stream."""

    def slow_seq(j, op, lp, ll, ml, off, fsb=None):  # noqa: C901
        @pl.when((ll > 0) & ((op & 127) + ll <= 256))
        def _():
            dl = lp - op
            q = dl >> 7
            m = dl & 127
            rot = _window(lit_ref, j, (op >> 7) + q, (128 - m) & 127, 2,
                          lit_rows)
            val = jnp.where(consts[0] < 128 - m, rot[0:2], rot[1:3])
            rd = op >> 7
            d = 128 * rd + consts[1]
            mask = (d >= op) & (d < op + ll)
            _st(out_ref, j, rd, 2, val, mask)

        @pl.when((op & 127) + ll > 256)
        def _():
            _copy_chunked(lit_ref, out_ref, j, lp, op, ll, _K, lit_rows)

        opm = op + ll
        if far_ref is not None:
            not_far = fsb < 0
            # far source bytes are CONTIGUOUS in the pre-gathered far_ref
            # stream (128-byte lead pad keeps row math >= 0) — short spans
            # take the same 2-row windowed copy as short literal runs
            # instead of the us-class chunked loop (far-heavy bigwindow
            # calls were dominated by it, r5)
            short_f = (opm & 127) + ml <= 256

            @pl.when((ml > 0) & ~not_far & short_f)
            def _():
                dm = (fsb + 128) - opm
                q = dm >> 7
                m = dm & 127
                rot = _window(far_ref, j, (opm >> 7) + q, (128 - m) & 127,
                              2, far_rows)
                val = jnp.where(consts[0] < 128 - m, rot[0:2], rot[1:3])
                rd = opm >> 7
                d = 128 * rd + consts[1]
                mask = (d >= opm) & (d < opm + ml)
                _st(out_ref, j, rd, 2, val, mask)

            @pl.when((ml > 0) & ~not_far & ~short_f)
            def _():
                _copy_chunked(far_ref, out_ref, j, fsb + 128, opm, ml, _K,
                              far_rows)

            def nf(c):
                return c & not_far
        else:
            def nf(c):  # no far stream: trace unchanged
                return c
        short_m = (opm & 127) + ml <= 256

        @pl.when(nf((ml > 0) & (off >= 128) & short_m & (off >= ml)))
        def _():
            dm = -off
            q = dm >> 7
            m = dm & 127
            rot = _window(out_ref, j, (opm >> 7) + q, (128 - m) & 127, 2,
                          out_rows)
            val = jnp.where(consts[0] < 128 - m, rot[0:2], rot[1:3])
            rd = opm >> 7
            d = 128 * rd + consts[1]
            mask = (d >= opm) & (d < opm + ml)
            _st(out_ref, j, rd, 2, val, mask)

        @pl.when(nf((ml > 0) & (off >= 128 * _K) & ~(short_m & (off >= ml))))
        def _():
            _copy_chunked(out_ref, out_ref, j, opm - off, opm, ml, _K,
                          out_rows)

        @pl.when(nf((ml > 0) & (off >= 128) & (off < 128 * _K)
                    & ~(short_m & (off >= ml))))
        def _():
            _copy_chunked(out_ref, out_ref, j, opm - off, opm, ml, 1,
                          out_rows)

        @pl.when(nf((ml > 0) & (off < 128) & short_m))
        def _():
            _fill_periodic_short(out_ref, j, opm, off, ml, consts)

        @pl.when(nf((ml > 0) & (off < 128) & ~short_m))
        def _():
            _fill_periodic(out_ref, j, opm, off, ml)

    return slow_seq


def _fused_pre(lit_ref, out_ref, j, rd, lrow, sh, mrow, oa, enda, consts4):
    """Scalar-offloaded fused copy: all address math arrives precomputed
    (see the ZSTD_TPU_EXEC_PRE precompute in execute_sequences_pallas).
    6 scalar words in, ~8 ALU ops, same vector chain as _fused_short."""
    jj5, rr, d4 = consts4
    jj = jj5[:_FR]
    lb = sh & 0xFFFF          # 128 - (lit delta & 127), in [1, 128]
    mb = sh >> 16             # 128 - ((-off) & 127), in [1, 128]
    opa = oa & 1023
    opma = (oa >> 10) & 1023

    lrow = 0 if _ABLATE == "load" else lrow
    mrow = 0 if _ABLATE == "load" else mrow
    lblk = lit_ref[j, pl.ds(lrow, _FR + 1), :]
    lrot = lblk if _ABLATE == "roll" else pltpu.roll(lblk, lb & 127, axis=1)
    lval = jnp.where(jj < lb, lrot[0:_FR], lrot[1:_FR + 1])

    mblk = out_ref[j, pl.ds(mrow, _FR + 1), :]
    mrot = mblk if _ABLATE == "roll" else pltpu.roll(mblk, mb & 127, axis=1)
    mval = jnp.where(jj < mb, mrot[0:_FR], mrot[1:_FR + 1])

    val = jnp.where(d4 < opma, lval, mval)
    mask = (d4 >= opa) & (d4 < enda)
    _st(out_ref, j, rd, _FR, val, mask)


def _exec_kernel_pre(ll_ref, ml_ref, of_ref, op_ref, lp_ref,
                     rd_ref, lr_ref, sh_ref, mr_ref, oa_ref, en_ref,
                     ns_ref, lit_ref, out_ref,
                     lit_rows: int, out_rows: int, L: int = _L):
    """ZSTD_TPU_EXEC_PRE variant of _exec_kernel: per-record scalar math
    precomputed in XLA; fused path = 6 SMEM reads + ~8 ALU per sequence."""
    c = pl.program_id(1)
    base = c * SEQ_CHUNK
    count = jnp.clip(ns_ref[0, 0, 0] - base, 0, SEQ_CHUNK)
    for j in range(1, L):
        count = jnp.maximum(count,
                            jnp.clip(ns_ref[j, 0, 0] - base, 0, SEQ_CHUNK))

    consts, consts4 = _iota_consts()
    slow_seq = _make_slow_seq(lit_ref, out_ref, consts, lit_rows, out_rows)

    def seq_body(i, carry):
        recs = []
        for j in range(L):
            recs.append((j, rd_ref[j, 0, i], lr_ref[j, 0, i],
                         sh_ref[j, 0, i], mr_ref[j, 0, i],
                         oa_ref[j, 0, i], en_ref[j, 0, i]))

        if _ABLATE == "body":
            return carry

        if _ABLATE != "fused":
            for j, rd, lrow, sh, mrow, oa, enda in recs:
                _fused_pre(lit_ref, out_ref, j, rd, lrow, sh, mrow, oa,
                           enda, consts4)

        if _ABLATE != "slow":
            any_slow = recs[0][5] >> 20
            for r in recs[1:]:
                any_slow = any_slow | (r[5] >> 20)

            @pl.when(any_slow > 0)
            def _():
                for j, rd, lrow, sh, mrow, oa, enda in recs:
                    @pl.when((oa >> 20) > 0)
                    def _(j=j):
                        op = op_ref[j, 0, i]
                        lp = lp_ref[j, 0, i]
                        ll = ll_ref[j, 0, i] & 0xFFFFFF
                        ml = ml_ref[j, 0, i]
                        off = of_ref[j, 0, i]
                        slow_seq(j, op, lp, ll, ml, off)

        return carry

    jax.lax.fori_loop(0, count, seq_body, 0)


def _pre_words(ll, ml, offset, opv, lpv, common, slow,
               lit_rows: int, out_rows: int):
    """XLA-side scalar offload for _exec_kernel_pre: per-record store row,
    clipped window rows, packed roll boundaries, packed mask bounds + slow
    flag. Rows for non-fused records are clipped (their fused store is
    empty, but the loads still execute and must stay in bounds)."""
    rd = opv >> 7
    opa = opv & 127
    opma = jnp.where(common, opa + ll, opa)
    enda = jnp.where(common, opa + ll + ml, opa)

    dl = lpv - opv
    lb = 128 - (dl & 127)                      # column boundary, [1, 128]
    lrow = jnp.clip(rd + (dl >> 7), 0, max(lit_rows - _FR - 2, 0))
    mm = (-offset) & 127
    mb = 128 - mm
    mrow = jnp.clip(rd + ((-offset) >> 7), 0, max(out_rows - _FR - 2, 0))

    w_sh = lb | (mb << 16)
    w_oa = opa | (opma << 10) | (slow.astype(jnp.int32) << 20)
    return rd, lrow, w_sh, mrow, w_oa, enda


def _exec_kernel(ll_ref, ml_ref, of_ref, op_ref, lp_ref, ns_ref, lit_ref,
                 out_ref, *scratch, lit_rows: int, out_rows: int, L: int = _L,
                 fsb_ref=None, far_ref=None, far_rows: int = 0, G: int = 1,
                 skip_inert: bool = False):
    """G > 1 (windowed kernel): each iteration is a ROUND of G consecutive
    records per lane — intra-lane ILP for low lane counts (a single chained
    frame runs Li=1; without rounds its dependent chain leaves the issue
    pipeline idle). Correctness: a record joins the phased fused path only
    if its match source lies below the ROUND's first output position
    (round-barrier eligibility, precomputed into ll bit 24 by the wrapper),
    so hoisting its loads across the round's other stores cannot observe
    them; everything else takes the in-order slow path."""
    sink_ref = scratch[0] if scratch else None
    c = pl.program_id(1)
    base = c * SEQ_CHUNK
    counts = [jnp.clip(ns_ref[j, 0, 0] - base, 0, SEQ_CHUNK)
              for j in range(L)]
    count = counts[0]
    for j in range(1, L):
        count = jnp.maximum(count, counts[j])

    consts, consts4 = _iota_consts()
    slow_seq = _make_slow_seq(lit_ref, out_ref, consts, lit_rows, out_rows,
                              far_ref=far_ref, far_rows=far_rows)

    def seq_body(i, carry):
        # cursors are precomputed prefix sums (XLA side): no serial carry —
        # every lane-iteration is fully independent, maximizing ILP. The
        # fused-path eligibility (fits-in-window & disjoint-source [& below
        # the round barrier when G > 1]) is also precomputed in XLA and
        # packed into bit 24 of the ll record.
        recs = []
        for j in range(L):
            for g in range(G):
                ii = i * G + g if G > 1 else i
                op = op_ref[j, 0, ii]
                lp = lp_ref[j, 0, ii]
                llp = ll_ref[j, 0, ii]
                ll = llp & 0xFFFFFF
                ml = ml_ref[j, 0, ii]
                off = of_ref[j, 0, ii]
                active = ii < counts[j]
                # bit 24 = phased-fused eligible; bit 25 (G>1 only) =
                # fused-but-in-order (failed only the round barrier). The
                # G==1 kernels never set bit 25, so the single-compare
                # form stays — the exact bit test cost the batched replay
                # 63.1 -> 70.0 ms (measured r5; scalar ops per record are
                # not free at 1.9M records).
                if G > 1:
                    common = active & (((llp >> 24) & 1) == 1)
                else:
                    common = active & (llp >= (1 << 24))
                recs.append((j, op, lp, ll, ml, off, active, common, ii,
                             llp))

        if _ABLATE == "body":
            return carry

        # whole-phase skip (windowed kernel only): interior inert slot runs
        # (the framer's 128-aligned block spans pad between blocks BELOW
        # the last active slot, so the fori count bound does not exclude
        # them — measured r5 at ~1.5x slot inflation on chained frames).
        # One scalar OR + branch skips the entire vector body when every
        # round member is inactive; same stores either way, so no new
        # hazard pairs. MEASURED r5: LOSES everywhere — batched -9%
        # (L=8 phases are never all-inactive), windowed -15% (the per-
        # phase branch disrupts Mosaic's issue pipelining more than the
        # skipped inert work saves). Default OFF; ZSTD_TPU_WEXEC_SKIP=1
        # re-enables for probes.
        if skip_inert:
            any_act = recs[0][6]
            for r in recs[1:]:
                any_act = any_act | r[6]
            gate = pl.when(any_act)
        else:
            gate = _nullgate()

        @gate
        def _():
            # branchless fused path for all lanes/round members first
            # (their chains are independent — interleaved issue hides load
            # latency)
            if _ABLATE != "fused":
                if _PHASED and not _SPLIT:
                    blks = [_fused_loads(lit_ref, out_ref, j, lp, op, off,
                                         lit_rows, out_rows)
                            for j, op, lp, ll, ml, off, active, common, ii,
                            llp in recs]
                    for (j, op, lp, ll, ml, off, active, common, ii,
                         llp), (lb, mb) in zip(recs, blks):
                        _fused_finish(out_ref, j, lb, mb, lp, op, ll, ml,
                                      off, common, consts4,
                                      sink_ref=sink_ref)
                else:
                    for (j, op, lp, ll, ml, off, active, common, ii,
                         llp) in recs:
                        if _SPLIT:
                            _fused_split(lit_ref, out_ref, j, lp, op, ll,
                                         ml, off, common, lit_rows,
                                         out_rows, consts4)
                        else:
                            _fused_short(lit_ref, out_ref, j, lp, op, ll,
                                         ml, off, common, lit_rows,
                                         out_rows, consts4,
                                         sink_ref=sink_ref)

            if _ABLATE != "slow":
                # slow records are ~0.2% of the corpus at G=1
                # (seq_stats.py) — hoist the per-lane dispatch behind one
                # any-lane-slow scalar branch so the common all-fused step
                # pays a single OR + branch instead of L conditional
                # regions. At G>1, bit-25 records (failed only the round
                # barrier) run the ordinary fused copy IN ORDER here —
                # NOT the us-class chunked slow path.
                any_slow = recs[0][6] & ~recs[0][7]
                for (j, op, lp, ll, ml, off, active, common, ii,
                     llp) in recs[1:]:
                    any_slow = any_slow | (active & ~common)

                @pl.when(any_slow)
                def _():
                    for (j, op, lp, ll, ml, off, active, common, ii,
                         llp) in recs:
                        slow_cond = active & ~common
                        if G > 1:
                            # bit 25 exists only in windowed (G>1) calls;
                            # tracing the branch at G==1 perturbed the
                            # batched kernel's schedule for nothing
                            nearf = (((llp >> 25) & 1) == 1)

                            @pl.when(slow_cond & nearf)
                            def _(j=j, op=op, lp=lp, ll=ll, ml=ml,
                                  off=off):
                                _fused_short(lit_ref, out_ref, j, lp, op,
                                             ll, ml, off, op >= 0,
                                             lit_rows, out_rows, consts4,
                                             sink_ref=sink_ref)
                            slow_cond = slow_cond & ~nearf

                        @pl.when(slow_cond)
                        def _(j=j, op=op, lp=lp, ll=ll, ml=ml, off=off,
                              ii=ii):
                            fsb = (fsb_ref[j, 0, ii] if fsb_ref is not None
                                   else None)
                            slow_seq(j, op, lp, ll, ml, off, fsb)

        return carry

    jax.lax.fori_loop(0, (count + G - 1) // G if G > 1 else count,
                      seq_body, 0)


@functools.partial(jax.jit, static_argnames=("out_width", "interpret"))
def execute_sequences_pallas(ll, ml, offset, literals, out_len,
                             out_width: int, interpret: bool = False):
    """Drop-in for execute_sequences_lanes on TPU. Returns (out u8, ok bool).

    Lanes that the kernel cannot prove well-formed (offset beyond written
    output, length overflow, too many sequences for SMEM) are flagged not-ok
    and left to the caller's fallback path.
    """
    global _RMW
    _RMW = bool(interpret)
    B0, S = ll.shape
    if B0 % _L:
        pad = _L - B0 % _L
        ll = jnp.pad(ll, ((0, pad), (0, 0)))
        ml = jnp.pad(ml, ((0, pad), (0, 0)))
        offset = jnp.pad(offset, ((0, pad), (0, 0)))
        literals = jnp.pad(literals, ((0, pad), (0, 0)))
        out_len = jnp.pad(out_len, (0, pad))
    B = ll.shape[0]
    lit_w = literals.shape[1]
    # _FR lead pad rows shift every cursor so all source-window row
    # indices stay >= 0 inside the kernel (no roll-down fixups, and the
    # fused match window anchors directly at the store row: 128*PAD_rows
    # >= span_max + 127 covers ll up to the fused span)
    PAD = _FR * 128
    out_rows = _FR + (out_width + 127) // 128 + _K + 2
    lit_rows = _FR + (lit_w + 127) // 128 + _K + 2

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

    lit_i32 = jnp.pad(literals, ((0, 0), (PAD, lit_rows * 128 - lit_w - PAD))
                      ).astype(jnp.int32).reshape(B, lit_rows, 128)

    # exclusive prefix cursors (out position / literal position per record),
    # shifted by the lead pad: computing them here removes the kernel's
    # serial carry chain
    opv = endpos - run + PAD
    lpv = lit_need - ll + PAD
    # fused-path eligibility per record, packed into ll bit 24 (scalar SMEM
    # reads pace the kernel loop — one packed read beats five ALU ops)
    span_max = 128 * (_FR - 1)
    fits = ((opv & 127) + run) <= span_max
    disjoint = (ml == 0) | (offset >= run)
    common = fits & disjoint
    if _PRE:
        active = (jnp.arange(ll.shape[1], dtype=jnp.int32)[None, :]
                  < nseq[:, None])
        slow = active & ~common
        words = _pre_words(ll, ml, offset, opv, lpv, common, slow,
                           lit_rows, out_rows)
    ll = ll | jnp.where(common, 1 << 24, 0)

    smem_rec = pl.BlockSpec((_L, 1, SEQ_CHUNK), lambda l, c: (l, 0, c),
                            memory_space=pltpu.SMEM)
    n_words = 6 if _PRE else 0
    kern = _exec_kernel_pre if _PRE else _exec_kernel
    extra = tuple(rec3(w) for w in words) if _PRE else ()
    out_i32 = pl.pallas_call(
        functools.partial(kern, lit_rows=lit_rows, out_rows=out_rows),
        grid=(B // _L, n_chunks),
        in_specs=[smem_rec] * (5 + n_words) + [
            pl.BlockSpec((_L, 1, 1), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_L, lit_rows, 128), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_L, out_rows, 128), lambda l, c: (l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, 128), jnp.int32),
        # dev-only "sink" probe: fused stores land in this scratch block so
        # no load in the loop ever follows a store to the same ref
        scratch_shapes=([pltpu.VMEM((_L, 8 + _FR, 128), jnp.int32)]
                        if _ABLATE == "sink" and not _PRE else []),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(rec3(ll), rec3(ml), rec3(offset), rec3(opv), rec3(lpv),
      *extra, nseq[:, None, None], lit_i32)

    flat = out_i32.reshape(B, out_rows * 128)[:, PAD:PAD + out_width]
    pos = jnp.arange(out_width, dtype=jnp.int32)[None, :]
    out = jnp.where(pos < out_len[:, None], flat, 0).astype(jnp.uint8)
    return out[:B0], ok[:B0]


@functools.partial(jax.jit,
                   static_argnames=("out_width", "window", "lanes_per_step",
                                    "interpret"))
def execute_window_pallas(ll, ml, offset,   # (L, S) i32 group records
                          literals,          # (L, Llit) u8 group literals
                          out_len,           # (L,) i32 exact group lengths
                          win,               # (L, window) u8 trailing history
                          hist_avail,        # (L,) i32 real bytes preceding
                          out_width: int, window: int,
                          lanes_per_step: int = 1,
                          interpret: bool = False,
                          far_bytes=None,    # (L, Fw) u8 pre-gathered far src
                          fsb=None,          # (L, S) i32 far cursor, -1=near
                          lit_seg=None):     # (L, S) i32 literal-cursor addend
    """Execute one block group each of L chained (streamed) frames.

    Each lane is one frame's next block group: the previous output's
    trailing `window` bytes are prefilled ahead of the group via
    input_output_aliasing, so match offsets reach across group boundaries
    exactly like the reference's window-retaining drain
    (decode_buffer.rs:182-218). Offsets are valid up to pos + hist_avail
    (the caller caps hist_avail at the frame's REAL window). Independent
    chains advance in LOCKSTEP — `lanes_per_step` lanes share each grid
    step so their per-sequence chains interleave (the same ILP story as the
    batched kernel's _L=4).

    Big real windows (> `window`, the VMEM prefix width): far matches
    (off > pos + window — source entirely below the VMEM window) read from
    `far_bytes`, a compact stream the caller pre-gathered from its HBM
    accumulator; `fsb` holds each record's byte cursor into it (-1 for
    near records). See WINDOW_VMEM_CAP.

    lit_seg (super-group calls): when one call executes SEVERAL
    consecutive block groups whose literal blocks are concatenated at
    static per-group offsets, `lit_seg[r]` holds the addend mapping
    record r's plain cumsum literal cursor to its group's segment base
    (batch_decoder._chain_super_step builds it). Output positions need no
    such addend — group outputs are contiguous by construction.
    Returns (group bytes (L, out_width) u8, ok (L,) bool).
    """
    global _RMW
    _RMW = bool(interpret)
    assert window % 128 == 0
    L0, S = ll.shape
    Li = max(1, lanes_per_step)
    # Clamp Li to what the scoped-VMEM budget actually fits. Default
    # (explicit-init) mode: out block + window-rows init block + literal
    # block per lane. Aliased dev-probe mode: the window block is
    # materialized TWICE (aliased input + output — HBM aliasing does not
    # merge the VMEM copies).
    _PADr = _FR * 128
    _orows = window_out_rows(window, out_width)
    _wrows = _FR + window // 128
    _lrows = _FR + (literals.shape[1] + 127) // 128 + _K + 2
    _frows = (1 + far_bytes.shape[1] // 128 + _K + 2
              if far_bytes is not None else 0)
    per_lane_vmem = ((_orows + _wrows if _NOALIAS else 2 * _orows)
                     + _lrows + _frows) * 128 * 4
    # scoped-VMEM budget; the aliased probe mode additionally keeps the r3
    # corruption clamp (the aliasing DMA race corrupts at large blocks).
    # ZSTD_TPU_WEXEC_NOCLAMP=1 is a dev-only bypass for
    # scripts/probe_lockstep.py.
    _noclamp = os.environ.get("ZSTD_TPU_WEXEC_NOCLAMP", "") == "1"
    while Li > 1 and (Li * per_lane_vmem > (88 << 20)
                      or (not _noclamp and not _NOALIAS
                          and Li * _orows * 512 > LOCKSTEP_BLOCK_CAP)):
        Li //= 2
    if L0 % Li:
        pad = Li - L0 % Li
        ll = jnp.pad(ll, ((0, pad), (0, 0)))
        ml = jnp.pad(ml, ((0, pad), (0, 0)))
        offset = jnp.pad(offset, ((0, pad), (0, 0)))
        literals = jnp.pad(literals, ((0, pad), (0, 0)))
        out_len = jnp.pad(out_len, (0, pad))
        win = jnp.pad(win, ((0, pad), (0, 0)))
        hist_avail = jnp.pad(hist_avail, (0, pad))
        if far_bytes is not None:
            far_bytes = jnp.pad(far_bytes, ((0, pad), (0, 0)))
            fsb = jnp.pad(fsb, ((0, pad), (0, 0)), constant_values=-1)
        if lit_seg is not None:
            lit_seg = jnp.pad(lit_seg, ((0, pad), (0, 0)))
    L = ll.shape[0]
    lit_w = literals.shape[1]
    PAD = _FR * 128
    wrows = window // 128
    out_rows = _FR + wrows + (out_width + 127) // 128 + _K + 2
    lit_rows = _FR + (lit_w + 127) // 128 + _K + 2

    run = ll + ml
    endpos = jnp.cumsum(run, axis=1)
    pos_before_match = endpos - ml
    if far_bytes is None:
        avail = jnp.minimum(hist_avail, window)
    else:
        # far mode: the caller caps hist_avail at the frame's REAL window
        # (which exceeds the VMEM prefix width `window`)
        avail = hist_avail
    reach = pos_before_match + avail[:, None]
    off_ok = (ml == 0) | ((offset > 0) & (offset <= reach))
    if far_bytes is not None:
        # far cursors must land their ml bytes inside the gathered stream
        off_ok = off_ok & ((fsb < 0)
                           | (fsb + ml <= far_bytes.shape[1]))
    lit_need = jnp.cumsum(ll, axis=1)
    ok = (jnp.all(off_ok, axis=1) & (endpos[:, -1] == out_len)
          & (out_len <= out_width) & (lit_need[:, -1] <= lit_w))
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
        return x[:, None, :]  # (L, 1, s_pad)

    lit_i32 = jnp.pad(literals, ((0, 0), (PAD, lit_rows * 128 - lit_w - PAD))
                      ).astype(jnp.int32).reshape(L, lit_rows, 128)

    # cursors shifted past the lead pad AND the window prefix
    base = PAD + window
    opv = endpos - run + base
    lpv = lit_need - ll + PAD
    if lit_seg is not None:
        lpv = lpv + lit_seg
    span_max = 128 * (_FR - 1)
    fits = ((opv & 127) + run) <= span_max
    disjoint = (ml == 0) | (offset >= run)
    common = fits & disjoint
    if far_bytes is not None:
        common = common & (fsb < 0)  # far records take the far slow branch
    Gr = _WG if _WG > 0 else max(1, 8 // Li)
    while SEQ_CHUNK % Gr:
        Gr -= 1
    if Gr > 1:
        # round-barrier eligibility: the fused path's phased load hoist is
        # only correct when the match source ENDS below the ROUND's first
        # output position (all round members' stores land above it). At
        # G=1 this degenerates to the plain disjoint check (off >= run).
        #
        # Records that fail ONLY the round barrier (near matches — their
        # source overlaps the round's span) still run the fused copy, just
        # IN ORDER at the slow-dispatch point (bit 25): by then the
        # round's earlier stores have executed, and later hoisted loads
        # are round-barrier-eligible so they cannot read this record's
        # store. Without this tier the round barrier sent ~1/3 of chained
        # text records to the us-class chunked slow path (measured r5:
        # 22 of 65 ms).
        ridx = (jnp.arange(S, dtype=jnp.int32) // Gr) * Gr
        rs = jnp.take(opv, ridx, axis=1)
        near_ok = common
        common = common & ((ml == 0) | (offset >= (opv + ll + ml) - rs))
        ll = ll | jnp.where(near_ok & ~common, 1 << 25, 0)
    ll = ll | jnp.where(common, 1 << 24, 0)

    w_in_rows = _FR + window // 128
    if _NOALIAS:
        # initial out content = [PAD zeros | window]: only the window rows
        # travel as a (small) plain input block, copied into the out block
        # at grid step 0. Rows past the window need no init — every byte
        # <= out_len is stored by some record, bytes past out_len are
        # masked off on the XLA side, and loads from uninitialized rows
        # only feed masked-off store lanes.
        init = jnp.pad(win, ((0, 0), (PAD, 0))
                       ).astype(jnp.int32).reshape(L, w_in_rows, 128)
    else:
        # dev-probe aliased mode (full block; corrupts at large sizes)
        init = jnp.pad(win, ((0, 0), (PAD, out_rows * 128 - window - PAD))
                       ).astype(jnp.int32).reshape(L, out_rows, 128)

    smem_rec = pl.BlockSpec((Li, 1, SEQ_CHUNK), lambda l, c: (0, 0, c),
                            memory_space=pltpu.SMEM)
    # big blocks are single-buffered: their index map never changes inside
    # a call, so double-buffering would cost 2x VMEM on the window for no
    # overlap (interpret mode: pipeline_mode unsupported)
    one_buf = None if interpret else pl.Buffered(buffer_count=1)
    out_spec = pl.BlockSpec((Li, out_rows, 128), lambda l, c: (0, 0, 0),
                            memory_space=pltpu.VMEM, pipeline_mode=one_buf)
    init_spec = pl.BlockSpec(
        (Li, w_in_rows if _NOALIAS else out_rows, 128),
        lambda l, c: (0, 0, 0),
        memory_space=pltpu.VMEM, pipeline_mode=one_buf)

    far_rows_blk = 0
    if far_bytes is not None:
        Fw = far_bytes.shape[1]
        far_rows_blk = 1 + Fw // 128 + _K + 2
        far_i32 = jnp.pad(far_bytes,
                          ((0, 0), (128, far_rows_blk * 128 - Fw - 128))
                          ).astype(jnp.int32).reshape(L, far_rows_blk, 128)

    def kernel(*refs):
        # ref order: 5 record SMEM recs [+ fsb rec], ns, lit, [far,] init,
        # out. Default: init_r holds the (PAD + window) rows, copied into
        # the out block before any record executes. Aliased probe mode
        # (ZSTD_TPU_WEXEC_NOALIAS=0): init_r is the full aliased block and
        # the kernel reads/writes it through out_r directly.
        if far_bytes is not None:
            (ll_r, ml_r, of_r, op_r, lp_r, fsb_r, ns_r, lit_r, far_r,
             init_r, out_r) = refs
        else:
            ll_r, ml_r, of_r, op_r, lp_r, ns_r, lit_r, init_r, out_r = refs
            fsb_r = far_r = None
        if _NOALIAS:
            @pl.when(pl.program_id(1) == 0)
            def _():
                for j in range(Li):
                    out_r[j, 0:w_in_rows, :] = init_r[j, :, :]
        _exec_kernel(ll_r, ml_r, of_r, op_r, lp_r, ns_r, lit_r, out_r,
                     lit_rows=lit_rows, out_rows=out_rows, L=Li,
                     fsb_ref=fsb_r, far_ref=far_r, far_rows=far_rows_blk,
                     G=Gr,
                     skip_inert=os.environ.get(
                         "ZSTD_TPU_WEXEC_SKIP", "0") == "1")

    # DEVICE CONSTRAINT (measured, r3): the grid must not advance across
    # lane groups within one pallas_call — the single-buffered window
    # block loses stores at the block transition on Mosaic (multi-frame
    # lockstep corrupted everything past ~350 KiB while the
    # grid=(1, n_chunks) shape is bit-exact). One call per Li-lane group,
    # all lanes inside the single block, grid (1, n_chunks) per call.
    parts = []
    for g in range(0, L, Li):
        sl = slice(g, g + Li)
        specs = [smem_rec, smem_rec, smem_rec, smem_rec, smem_rec]
        ins = [rec3(ll[sl]), rec3(ml[sl]), rec3(offset[sl]), rec3(opv[sl]),
               rec3(lpv[sl])]
        if far_bytes is not None:
            specs.append(smem_rec)
            ins.append(rec3(fsb[sl]))
        specs += [
            pl.BlockSpec((Li, 1, 1), lambda l, c: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Li, lit_rows, 128), lambda l, c: (0, 0, 0),
                         memory_space=pltpu.VMEM, pipeline_mode=one_buf),
        ]
        ins += [nseq[sl, None, None], lit_i32[sl]]
        if far_bytes is not None:
            specs.append(pl.BlockSpec((Li, far_rows_blk, 128),
                                      lambda l, c: (0, 0, 0),
                                      memory_space=pltpu.VMEM,
                                      pipeline_mode=one_buf))
            ins.append(far_i32[sl])
        specs.append(init_spec)
        ins.append(init[sl])
        alias_in = len(specs) - 1
        parts.append(pl.pallas_call(
            kernel,
            grid=(1, n_chunks),
            in_specs=specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Li, out_rows, 128), jnp.int32),
            input_output_aliases=({} if _NOALIAS else {alias_in: 0}),
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20),
            interpret=interpret,
        )(*ins))
    out_i32 = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)

    flat_all = out_i32.reshape(L, out_rows * 128)
    # DEVICE CANARY (r4): the kernel never stores into the window prefix,
    # so any init-copy/lost-store failure (the r3/r4 corruption class
    # surfaced with ok=true) shows up as a window-region mismatch — fold
    # it into ok so windowed-exec corruption can never again hide.
    win_back = (flat_all[:, PAD:PAD + window].astype(jnp.uint8)
                == win.astype(jnp.uint8))
    ok = ok & jnp.all(win_back, axis=1)
    flat = flat_all[:, base:base + out_width]
    pos = jnp.arange(out_width, dtype=jnp.int32)[None, :]
    out = jnp.where(pos < out_len[:, None], flat, 0).astype(jnp.uint8)
    return out[:L0], ok[:L0]
