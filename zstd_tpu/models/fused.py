"""Single-jit fused decode step over fixed shapes.

This is the shape-static composition of the whole device pipeline (huffman →
sequence tANS → offset resolution → LZ77 execution → per-batch metrics) used
for multi-chip execution: every lane array carries a leading batch dimension
that shards over the data-parallel mesh axis, metrics reduce with a psum-style
all-reduce. The production path (models/batch_decoder.py) runs the same
kernels bucketed; this fused form is what `__graft_entry__` compiles.
"""

import functools

import jax
import jax.numpy as jnp

from zstd_tpu.ops.execute import execute_sequences_lanes
from zstd_tpu.ops.huffman import decode_huffman_lanes
from zstd_tpu.ops.sequence import decode_sequence_lanes, resolve_offsets


@functools.partial(jax.jit, static_argnames=("max_huff_symbols", "max_seqs",
                                             "out_width"))
def fused_decode_step(huff_streams, huff_pos, huff_tid, huff_tables,
                      huff_maxbits, huff_nsym, huff_dst_frame, huff_dst_off,
                      seq_streams, seq_pos, seq_n, ll_tid, of_tid, ml_tid,
                      ll_tables, of_tables, ml_tables, ll_logs, of_logs,
                      ml_logs, seq_dst_frame, seq_dst_off, seq_lit_total,
                      seq_trail_slot, lit_base, ll_base, ml_base, of_base,
                      is_real, init_hist,
                      max_huff_symbols: int, max_seqs: int, out_width: int):
    Bf, lit_w = lit_base.shape
    seq_w = ll_base.shape[1]

    lits, huff_ok = decode_huffman_lanes(
        huff_streams, huff_pos, huff_tid, huff_tables, huff_maxbits,
        huff_nsym, max_huff_symbols)
    j = jnp.arange(max_huff_symbols, dtype=jnp.int32)[None, :]
    dst_col = jnp.where(j < huff_nsym[:, None], huff_dst_off[:, None] + j, lit_w)
    lit_full = lit_base.at[huff_dst_frame[:, None], dst_col].set(lits, mode="drop")
    frame_ok = jnp.ones(Bf, bool).at[huff_dst_frame].min(huff_ok)

    ll_l, ml_l, of_l, seq_ok = decode_sequence_lanes(
        seq_streams, seq_pos, seq_n, ll_tid, of_tid, ml_tid,
        ll_tables, of_tables, ml_tables, ll_logs, of_logs, ml_logs, max_seqs)
    k = jnp.arange(max_seqs, dtype=jnp.int32)[None, :]
    col = jnp.where(k < seq_n[:, None], seq_dst_off[:, None] + k, seq_w)
    ll_full = ll_base.at[seq_dst_frame[:, None], col].set(ll_l, mode="drop")
    ml_full = ml_base.at[seq_dst_frame[:, None], col].set(ml_l, mode="drop")
    of_full = of_base.at[seq_dst_frame[:, None], col].set(of_l, mode="drop")
    used = jnp.sum(jnp.where(k < seq_n[:, None], ll_l, 0), axis=1)
    trailing = seq_lit_total - used
    ll_full = ll_full.at[seq_dst_frame, seq_trail_slot].set(
        jnp.maximum(trailing, 0), mode="drop")
    frame_ok = frame_ok.at[seq_dst_frame].min(seq_ok & (trailing >= 0))

    offsets, res_ok = resolve_offsets(ll_full, of_full, is_real, init_hist)
    out_len = jnp.sum(ll_full + ml_full, axis=1)
    out, exec_ok = execute_sequences_lanes(
        ll_full, ml_full, offsets, lit_full, out_len, out_width)
    ok = frame_ok & res_ok & exec_ok

    # per-batch observability counters (SURVEY.md §5 metrics parity) — under
    # a sharded mesh these reduce across devices (all-reduce / psum)
    metrics = {
        "bytes_out": jnp.sum(jnp.where(ok, out_len, 0)),
        "frames_ok": jnp.sum(ok.astype(jnp.int32)),
        "frames_bad": jnp.sum((~ok).astype(jnp.int32)),
    }
    return out, out_len, ok, metrics


def example_batch(n_frames: int = 8, seed: int = 0):
    """Build a small real batch (via libzstd if available, else our encoder)
    and return (kwargs, static_kwargs) for fused_decode_step."""
    import numpy as np

    from zstd_tpu.models.batch_decoder import BatchDecoder

    rng = np.random.RandomState(seed)
    frames = []
    payloads = []
    for i in range(n_frames):
        base = bytes(rng.randint(32, 96, size=rng.randint(200, 2000), dtype=np.uint8))
        payload = base * rng.randint(2, 6)
        payloads.append(payload)
    try:
        import zstandard

        comp = zstandard.ZstdCompressor(level=3, write_checksum=True)
        frames = [comp.compress(p) for p in payloads]
    except ImportError:
        from zstd_tpu.common.config import CompressionLevel
        from zstd_tpu.encoding.frame_enc import compress_to_vec

        frames = [compress_to_vec(p, CompressionLevel.FASTEST) for p in payloads]

    dec = BatchDecoder()
    b = dec.prepare(frames)
    init_hist = np.tile(np.array([1, 4, 8], np.int32), (b.lit_base.shape[0], 1))
    out_w = max(16, 1 << (max(len(p) for p in payloads) - 1).bit_length())
    kwargs = dict(
        huff_streams=b.huff_streams, huff_pos=b.huff_pos, huff_tid=b.huff_tid,
        huff_tables=b.huff_tables, huff_maxbits=b.huff_maxbits,
        huff_nsym=b.huff_nsym, huff_dst_frame=b.huff_dst_frame,
        huff_dst_off=b.huff_dst_off, seq_streams=b.seq_streams,
        seq_pos=b.seq_pos, seq_n=b.seq_n, ll_tid=b.ll_tid, of_tid=b.of_tid,
        ml_tid=b.ml_tid, ll_tables=b.ll_tables, of_tables=b.of_tables,
        ml_tables=b.ml_tables, ll_logs=b.ll_logs, of_logs=b.of_logs,
        ml_logs=b.ml_logs, seq_dst_frame=b.seq_dst_frame,
        seq_dst_off=b.seq_dst_off, seq_lit_total=b.seq_lit_total,
        seq_trail_slot=b.seq_trail_slot, lit_base=b.lit_base,
        ll_base=b.ll_base, ml_base=b.ml_base, of_base=b.of_base,
        is_real=b.is_real, init_hist=init_hist)
    static = dict(max_huff_symbols=b.max_huff_symbols, max_seqs=b.max_seqs,
                  out_width=out_w)
    return kwargs, static, payloads
