"""Batched TPU frame decoder — the flagship pipeline.

decode_frames(list_of_frames) runs the device pipeline in bucketed stages so
no lane pays for the batch maximum (variable-length handling, SURVEY.md §7
hard part #2):

  stage 1a: Huffman literal lanes, bucketed by (stream width, symbol count),
            each bucket one jitted call scattering into the frame literal
            arrays
  stage 1b: tANS sequence lanes, bucketed by (stream width, sequence count),
            scattering into the frame sequence arrays + trailing-run fill
  stage 2:  repeat-offset resolution scan over frames
  stage 3:  LZ77 execution, bucketed by actual output size (known exactly
            after stage 1b)

Frames the device path does not cover (external dictionaries) or whose lane
flags tripped fall back to the host oracle — a bad frame poisons only its own
lane (SURVEY.md §5 failure-detection parity; BASELINE.json config 5).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zstd_tpu.common.errors import ZstdError
from zstd_tpu.models.framer import DeviceBatch, Framer
from zstd_tpu.ops.execute import execute_sequences_lanes
from zstd_tpu.ops.huffman import decode_huffman_lanes
from zstd_tpu.ops.sequence import decode_sequence_lanes, resolve_offsets
from zstd_tpu.utils.xxhash64 import xxhash64 as _py_xxh64


def _fast_xxh64(data: bytes) -> int:
    try:
        from zstd_tpu.runtime import xxh64

        h = xxh64(data)
        if h is not None:
            return h
    except Exception:
        pass
    return _py_xxh64(data)


def _pow2(n: int, lo: int = 16) -> int:
    return max(lo, 1 << max(int(n) - 1, 0).bit_length())


def _buckets(widths, counts, max_area: int):
    """Group lane indices by (pow2 width, pow2 count), splitting at max_area."""
    keys = [(_pow2(w), _pow2(c, lo=4)) for w, c in zip(widths, counts)]
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    out = []
    cur, cur_key = [], None
    for i in order:
        if keys[i] != cur_key or (len(cur) + 1) * keys[i][0] > max_area:
            if cur:
                out.append((cur_key, cur))
            cur, cur_key = [], keys[i]
        cur.append(i)
    if cur:
        out.append((cur_key, cur))
    return out


@functools.partial(jax.jit, static_argnames=("max_symbols",))
def _huff_bucket(streams, pos, tid, tables, maxbits, nsym, dst_frame,
                 dst_off, lit_full, frame_ok, max_symbols: int):
    lits, ok = decode_huffman_lanes(streams, pos, tid, tables, maxbits,
                                    nsym, max_symbols)
    lit_w = lit_full.shape[1]
    j = jnp.arange(max_symbols, dtype=jnp.int32)[None, :]
    dst_col = dst_off[:, None] + j
    dst_col = jnp.where(j < nsym[:, None], dst_col, lit_w)
    lit_full = lit_full.at[dst_frame[:, None], dst_col].set(lits, mode="drop")
    frame_ok = frame_ok.at[dst_frame].min(ok)
    return lit_full, frame_ok


@functools.partial(jax.jit, static_argnames=("max_seqs",))
def _seq_bucket(streams, pos, n, ll_tid, of_tid, ml_tid, ll_tables,
                of_tables, ml_tables, ll_logs, of_logs, ml_logs,
                dst_frame, dst_off, lit_total, trail_slot,
                ll_full, ml_full, of_full, frame_ok, max_seqs: int):
    ll_l, ml_l, of_l, ok = decode_sequence_lanes(
        streams, pos, n, ll_tid, of_tid, ml_tid, ll_tables, of_tables,
        ml_tables, ll_logs, of_logs, ml_logs, max_seqs)
    seq_w = ll_full.shape[1]
    k = jnp.arange(max_seqs, dtype=jnp.int32)[None, :]
    col = dst_off[:, None] + k
    col = jnp.where(k < n[:, None], col, seq_w)
    ll_full = ll_full.at[dst_frame[:, None], col].set(ll_l, mode="drop")
    ml_full = ml_full.at[dst_frame[:, None], col].set(ml_l, mode="drop")
    of_full = of_full.at[dst_frame[:, None], col].set(of_l, mode="drop")
    used = jnp.sum(jnp.where(k < n[:, None], ll_l, 0), axis=1)
    trailing = lit_total - used
    ok = ok & (trailing >= 0)
    ll_full = ll_full.at[dst_frame, trail_slot].set(
        jnp.maximum(trailing, 0), mode="drop")
    frame_ok = frame_ok.at[dst_frame].min(ok)
    return ll_full, ml_full, of_full, frame_ok


@jax.jit
def _resolve(ll_full, ml_full, of_full, is_real, init_hist):
    offsets, ok = resolve_offsets(ll_full, of_full, is_real, init_hist)
    out_len = jnp.sum(ll_full + ml_full, axis=1)
    return offsets, out_len, ok


class BatchDecoder:
    """Decode many independent frames data-parallel on the device."""

    def __init__(self, verify_checksums: bool = True,
                 max_bucket_elems: int = 1 << 27):
        self.verify_checksums = verify_checksums
        self.max_bucket_elems = max_bucket_elems

    def prepare(self, frames: list) -> DeviceBatch:
        framer = Framer()
        for i, f in enumerate(frames):
            framer.add_frame(bytes(f), i)
        return framer.build()

    def run_device(self, batch: DeviceBatch):
        """Full device decode. Returns (list of np.uint8 rows, out_len, ok)."""
        Bf = batch.lit_base.shape[0]
        lit_full = jnp.asarray(batch.lit_base)
        frame_ok = jnp.ones(Bf, bool)
        huff_tables = jnp.asarray(batch.huff_tables)
        huff_maxbits = jnp.asarray(batch.huff_maxbits)

        # --- stage 1a: huffman lanes, bucketed -------------------------------
        live = [i for i in range(batch.huff_streams.shape[0])
                if batch.huff_nsym[i] > 0]
        widths = [int(batch.huff_len[i]) for i in live]
        counts = [int(batch.huff_nsym[i]) for i in live]
        for (w, c), rows in _buckets(widths, counts, self.max_bucket_elems):
            idx = np.asarray([live[r] for r in rows], np.int32)
            lit_full, frame_ok = _huff_bucket(
                jnp.asarray(batch.huff_streams[idx, :w]),
                jnp.asarray(batch.huff_pos[idx]),
                jnp.asarray(batch.huff_tid[idx]),
                huff_tables, huff_maxbits,
                jnp.asarray(batch.huff_nsym[idx]),
                jnp.asarray(batch.huff_dst_frame[idx]),
                jnp.asarray(batch.huff_dst_off[idx]),
                lit_full, frame_ok, max_symbols=c)

        # --- stage 1b: sequence lanes, bucketed -------------------------------
        ll_full = jnp.asarray(batch.ll_base)
        ml_full = jnp.asarray(batch.ml_base)
        of_full = jnp.asarray(batch.of_base)
        lt = [jnp.asarray(batch.ll_tables), jnp.asarray(batch.of_tables),
              jnp.asarray(batch.ml_tables), jnp.asarray(batch.ll_logs),
              jnp.asarray(batch.of_logs), jnp.asarray(batch.ml_logs)]
        live = [i for i in range(batch.seq_streams.shape[0])
                if batch.seq_n[i] > 0]
        widths = [int(batch.seq_len[i]) for i in live]
        counts = [int(batch.seq_n[i]) for i in live]
        for (w, c), rows in _buckets(widths, counts, self.max_bucket_elems):
            idx = np.asarray([live[r] for r in rows], np.int32)
            ll_full, ml_full, of_full, frame_ok = _seq_bucket(
                jnp.asarray(batch.seq_streams[idx, :w]),
                jnp.asarray(batch.seq_pos[idx]),
                jnp.asarray(batch.seq_n[idx]),
                jnp.asarray(batch.ll_tid[idx]), jnp.asarray(batch.of_tid[idx]),
                jnp.asarray(batch.ml_tid[idx]), *lt,
                jnp.asarray(batch.seq_dst_frame[idx]),
                jnp.asarray(batch.seq_dst_off[idx]),
                jnp.asarray(batch.seq_lit_total[idx]),
                jnp.asarray(batch.seq_trail_slot[idx]),
                ll_full, ml_full, of_full, frame_ok, max_seqs=c)

        # --- stage 2: offsets + exact lengths ---------------------------------
        init_hist = np.tile(np.array([1, 4, 8], np.int32), (Bf, 1))
        offsets, out_len, res_ok = _resolve(
            ll_full, ml_full, of_full, jnp.asarray(batch.is_real),
            jnp.asarray(init_hist))
        out_len_h = np.asarray(out_len)
        ok_h = np.asarray(frame_ok & res_ok).copy()

        # --- stage 3: execution, bucketed by real output size -----------------
        outputs = [None] * Bf
        for (w, _), rows in _buckets(
                [max(int(x), 1) for x in out_len_h], [1] * Bf,
                self.max_bucket_elems):
            idx = jnp.asarray(np.asarray(rows, np.int32))
            out_b, exec_ok = execute_sequences_lanes(
                ll_full[idx], ml_full[idx], offsets[idx], lit_full[idx],
                out_len[idx], w)
            out_b = np.asarray(out_b)
            exec_ok = np.asarray(exec_ok)
            for r, row in enumerate(rows):
                outputs[row] = out_b[r]
                ok_h[row] &= exec_ok[r]
        return outputs, out_len_h, ok_h

    def decode_frames(self, frames: list) -> list:
        """Returns decoded bytes per frame (device path, host oracle fallback)."""
        batch = self.prepare(frames)
        outputs, out_len, ok = self.run_device(batch)

        results = []
        for i, meta in enumerate(batch.metas):
            good = (meta.ok and not meta.fallback and bool(ok[i]))
            if good and meta.out_len >= 0 and meta.out_len != int(out_len[i]):
                good = False
            data = None
            if good:
                data = outputs[i][:int(out_len[i])].tobytes()
                if self.verify_checksums and meta.checksum is not None:
                    if (_fast_xxh64(data) & 0xFFFFFFFF) != meta.checksum:
                        good = False
            if not good:
                data = self._host_fallback(frames[i])
            results.append(data)
        return results

    @staticmethod
    def _host_fallback(frame_bytes: bytes):
        from zstd_tpu.oracle import decode_frame

        try:
            return decode_frame(bytes(frame_bytes))
        except ZstdError:
            return None  # malformed frame: poisoned lane, reported as None
