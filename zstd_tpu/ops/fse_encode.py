"""Batched FSE (tANS) sequence encoding on device.

Mirror of the decode-side sequence kernel: one lane per block, a `lax.scan`
over sequences in reverse stream order evolving the three interleaved states
(ML/OF/LL), emitting per-step bit runs that ops/bitpack.py lays out with a
prefix-sum — the encoder-side counterpart of compressed.rs:160-221.

Wire layout per lane (write order):
  [ll_extra, ml_extra, of_extra] of the LAST sequence            (3 runs)
  for i = n-2 .. 0: [of_state, ml_state, ll_state,
                     ll_extra, ml_extra, of_extra] of sequence i (6 runs)
  [ml_flush, of_flush, ll_flush]                                 (3 runs)

RLE / zero-bit modes just produce 0-width state runs (table log 0).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zstd_tpu.common import constants as C

LL_BASE = np.array(C.LL_CODE_BASELINE, dtype=np.int32)
LL_XTRA = np.array(C.LL_CODE_EXTRA_BITS, dtype=np.int32)
ML_BASE = np.array(C.ML_CODE_BASELINE, dtype=np.int32)
ML_XTRA = np.array(C.ML_CODE_EXTRA_BITS, dtype=np.int32)

# LL/ML code classification on device: code = largest c with baseline <= v.
# Baselines are sorted; use searchsorted.
_LL_BASE_J = None


def pack_encode_table(table, state_width: int):
    """fse_enc.FSEEncodeTable -> (next_state u16[state_width],
    nb_delta u32[256], find_state i32[256])."""
    ns = np.zeros(state_width, np.uint16)
    ns[:table.table_size] = table.next_state
    return ns, table.delta_nb_bits.astype(np.uint32), \
        table.delta_find_state.astype(np.int32)


@functools.partial(jax.jit, static_argnames=("max_seqs",))
def encode_sequence_lanes(ll, ml, ofv,          # (B, S) i32 raw values
                          nseq,                 # (B,) i32
                          ll_ns, ml_ns, of_ns,  # (T, 512/512/256) u16 next-state
                          ll_nb, ml_nb, of_nb,  # (T, 256) u32 deltaNbBits
                          ll_fs, ml_fs, of_fs,  # (T, 256) i32 deltaFindState
                          ll_tid, ml_tid, of_tid,   # (B,) i32
                          ll_log, ml_log, of_log,   # (B,) i32 table logs
                          max_seqs: int):
    """Returns (values (B, 6*S+6) u32, nbits (B, 6*S+6) i32) bit runs."""
    B, S = ll.shape
    lane = jnp.arange(B, dtype=jnp.int32)

    ll_base = jnp.asarray(LL_BASE)
    ll_xtra = jnp.asarray(LL_XTRA)
    ml_base = jnp.asarray(ML_BASE)
    ml_xtra = jnp.asarray(ML_XTRA)

    def codes_of(i):
        llv = ll[lane, i]
        mlv = ml[lane, i]
        ofvv = ofv[lane, i]
        ll_code = jnp.searchsorted(ll_base, llv, side="right") - 1
        ml_code = jnp.searchsorted(ml_base, mlv, side="right") - 1
        # of_code = floor(log2(of_value)): 31 - clz
        of_code = 31 - jnp.clip(
            jax.lax.clz(jnp.maximum(ofvv, 1).astype(jnp.uint32)), 0, 31
        ).astype(jnp.int32)
        return llv, mlv, ofvv, ll_code.astype(jnp.int32), ml_code.astype(jnp.int32), of_code

    def init_state(nbt, fst, tid, ns, code):
        nb_delta = nbt[tid, code].astype(jnp.uint32)
        find = fst[tid, code]
        nb = ((nb_delta + (1 << 15)) >> 16).astype(jnp.int32)
        value = (nb << 16) - nb_delta.astype(jnp.int32)
        return ns[tid, (value >> nb) + find].astype(jnp.int32)

    def enc_step(nbt, fst, tid, ns, state, code):
        # (state + deltaNbBits) >> 16 in u32 wraparound gives the bit count
        nb_delta = nbt[tid, code].astype(jnp.uint32)
        find = fst[tid, code]
        nb = ((state.astype(jnp.uint32) + nb_delta) >> 16).astype(jnp.int32)
        bits = state.astype(jnp.uint32) & ((jnp.uint32(1) << nb.astype(jnp.uint32)) - 1)
        new_state = ns[tid, (state >> nb) + find].astype(jnp.int32)
        return new_state, bits, nb

    # seed from each lane's LAST sequence
    last = jnp.maximum(nseq - 1, 0)
    llv, mlv, ofvv, llc, mlc, ofc = codes_of(last)
    s_ml = init_state(ml_nb, ml_fs, ml_tid, ml_ns, mlc)
    s_of = init_state(of_nb, of_fs, of_tid, of_ns, ofc)
    s_ll = init_state(ll_nb, ll_fs, ll_tid, ll_ns, llc)

    n_runs = 6 * max_seqs + 6
    values0 = jnp.zeros((B, n_runs), jnp.uint32)
    nbits0 = jnp.zeros((B, n_runs), jnp.int32)
    # initial extras of the last sequence: ll, ml, of
    values0 = values0.at[:, 0].set((llv - ll_base[llc]).astype(jnp.uint32))
    nbits0 = nbits0.at[:, 0].set(jnp.where(nseq > 0, ll_xtra[llc], 0))
    values0 = values0.at[:, 1].set((mlv - ml_base[mlc]).astype(jnp.uint32))
    nbits0 = nbits0.at[:, 1].set(jnp.where(nseq > 0, ml_xtra[mlc], 0))
    values0 = values0.at[:, 2].set(
        (ofvv - (jnp.int32(1) << ofc)).astype(jnp.uint32))
    nbits0 = nbits0.at[:, 2].set(jnp.where(nseq > 0, ofc, 0))

    def step(carry, k):
        s_ll, s_of, s_ml = carry
        i = nseq - 2 - k           # sequence index this step encodes
        active = i >= 0
        idx = jnp.maximum(i, 0)
        llv, mlv, ofvv, llc, mlc, ofc = codes_of(idx)

        s_of2, of_bits, of_w = enc_step(of_nb, of_fs, of_tid, of_ns, s_of, ofc)
        s_ml2, ml_bits, ml_w = enc_step(ml_nb, ml_fs, ml_tid, ml_ns, s_ml, mlc)
        s_ll2, ll_bits, ll_w = enc_step(ll_nb, ll_fs, ll_tid, ll_ns, s_ll, llc)

        runs_v = jnp.stack([
            of_bits, ml_bits, ll_bits,
            (llv - ll_base[llc]).astype(jnp.uint32),
            (mlv - ml_base[mlc]).astype(jnp.uint32),
            (ofvv - (jnp.int32(1) << ofc)).astype(jnp.uint32)], axis=1)
        runs_n = jnp.stack([
            of_w, ml_w, ll_w, ll_xtra[llc], ml_xtra[mlc], ofc], axis=1)
        runs_n = jnp.where(active[:, None], runs_n, 0)

        s_ll = jnp.where(active, s_ll2, s_ll)
        s_of = jnp.where(active, s_of2, s_of)
        s_ml = jnp.where(active, s_ml2, s_ml)
        return (s_ll, s_of, s_ml), (runs_v, runs_n)

    (s_ll, s_of, s_ml), (rv, rn) = jax.lax.scan(
        step, (s_ll, s_of, s_ml), jnp.arange(max_seqs, dtype=jnp.int32))
    # rv: (S, B, 6) -> place at columns 3 + 6*k
    rv = jnp.moveaxis(rv, 0, 1).reshape(B, 6 * max_seqs)
    rn = jnp.moveaxis(rn, 0, 1).reshape(B, 6 * max_seqs)
    values = values0.at[:, 3:3 + 6 * max_seqs].set(rv)
    nbits = nbits0.at[:, 3:3 + 6 * max_seqs].set(rn)

    # flushes: ml, of, ll at the tail columns
    t = 3 + 6 * max_seqs
    has = nseq > 0
    values = values.at[:, t].set(s_ml.astype(jnp.uint32))
    nbits = nbits.at[:, t].set(jnp.where(has, ml_log, 0))
    values = values.at[:, t + 1].set(s_of.astype(jnp.uint32))
    nbits = nbits.at[:, t + 1].set(jnp.where(has, of_log, 0))
    values = values.at[:, t + 2].set(s_ll.astype(jnp.uint32))
    nbits = nbits.at[:, t + 2].set(jnp.where(has, ll_log, 0))
    return values, nbits
