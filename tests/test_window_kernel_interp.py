"""Interpret-mode coverage of the PALLAS windowed exec kernel.

The CPU chained path now defaults to the XLA formulation
(ops/execute.execute_window_xla), so without this file the windowed Pallas
kernel's logic (near window reads, far-stream copies, dict prefill) would
only ever run on real TPU. ZSTD_TPU_CHAIN_INTERP=1 forces the interpret
kernel through the full BatchDecoder chained driver; tiny caps
(zstd_tpu.utils.caps) keep interpret shapes to seconds. Production-size
device validation stays in scripts/validate_window_exec.py (real-TPU gate).
"""

import numpy as np
import pytest
import zstandard

from zstd_tpu.utils.caps import tiny_caps


def _decode_interp(frames):
    from zstd_tpu.models.batch_decoder import BatchDecoder

    dec = BatchDecoder()
    batch = dec.prepare(frames)
    outputs, out_len, ok = dec.run_device(batch)
    return batch, outputs, out_len, ok


def _text(n, seed):
    rng = np.random.RandomState(seed)
    words = [b"tok%03d " % i for i in range(257)]
    return b"".join(words[i] for i in rng.randint(0, 257, n * 2))[:n]


def test_interp_window_kernel_near(monkeypatch):
    """Chained near-mode: small window (8 KiB blocks), several groups."""
    monkeypatch.setenv("ZSTD_TPU_CHAIN_INTERP", "1")
    with tiny_caps():
        data = _text(120 << 10, seed=7)
        params = zstandard.ZstdCompressionParameters(
            window_log=13, compression_level=3)
        z = zstandard.ZstdCompressor(compression_params=params).compress(data)
        batch, outputs, out_len, ok = _decode_interp([z])
        m = batch.metas[0]
        assert not m.fallback and len(m.rows) > 1
        assert bool(ok[m.rows[0]])
        got = outputs[m.rows[0]][:int(out_len[m.rows[0]])].tobytes()
        assert got == data


def test_interp_window_kernel_far(monkeypatch):
    """Far-mode: real window (128 KiB) exceeds the tiny STREAM_WINDOW_CAP
    (64 KiB), the VMEM prefix is 16 KiB, and the tail re-quotes content
    from beyond it — far matches stream through the pre-gathered far
    buffer inside the interpret kernel."""
    monkeypatch.setenv("ZSTD_TPU_CHAIN_INTERP", "1")
    with tiny_caps():
        from zstd_tpu.models.framer import STREAM_WINDOW_CAP

        head = _text(120 << 10, seed=9)
        body = head + head[: 40 << 10] + _text(8 << 10, seed=10) \
            + head[(30 << 10):(70 << 10)]
        params = zstandard.ZstdCompressionParameters(
            window_log=17, compression_level=6)
        cobj = zstandard.ZstdCompressor(
            compression_params=params).compressobj()
        z = cobj.compress(body) + cobj.flush()
        batch, outputs, out_len, ok = _decode_interp([z])
        m = batch.metas[0]
        assert m.window > STREAM_WINDOW_CAP, "fixture must be far-mode"
        assert not m.fallback and len(m.rows) > 1
        assert bool(ok[m.rows[0]])
        got = outputs[m.rows[0]][:int(out_len[m.rows[0]])].tobytes()
        assert got == body


def test_tiny_caps_xla_matches_interp(monkeypatch):
    """The XLA chained formulation and the interpret Pallas kernel agree
    bit-for-bit on the same chained frame (same caps, same batch)."""
    data = _text(90 << 10, seed=11)
    params = zstandard.ZstdCompressionParameters(
        window_log=13, compression_level=3)
    z = zstandard.ZstdCompressor(compression_params=params).compress(data)
    with tiny_caps():
        monkeypatch.setenv("ZSTD_TPU_CHAIN_INTERP", "1")
        _, o1, l1, ok1 = _decode_interp([z])
        monkeypatch.delenv("ZSTD_TPU_CHAIN_INTERP")
        b2, o2, l2, ok2 = _decode_interp([z])
        r = b2.metas[0].rows[0]
        assert bool(ok1[r]) and bool(ok2[r])
        assert int(l1[r]) == int(l2[r])
        assert (o1[r][:int(l1[r])].tobytes()
                == o2[r][:int(l2[r])].tobytes() == data)
