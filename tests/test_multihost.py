"""Multi-host codec scaffolding (single-process degenerate run + shard
bookkeeping), BASELINE config 5's ordered-gather semantics."""

import zstandard

from zstd_tpu.parallel.multihost import (
    decode_frames_multihost,
    scaling_report,
    shard_indices,
)


def test_shard_indices_cover_and_disjoint():
    n, nproc = 101, 4
    all_idx = []
    for p in range(nproc):
        all_idx.extend(shard_indices(n, p, nproc))
    assert sorted(all_idx) == list(range(n))


def test_ordered_results_single_process():
    comp = zstandard.ZstdCompressor(level=3, write_checksum=True)
    payloads = [b"frame %d " % i * (10 + i * 7) for i in range(17)]
    frames = [comp.compress(p) for p in payloads]
    results = decode_frames_multihost(frames)
    assert results == payloads


def test_scaling_report_shape():
    comp = zstandard.ZstdCompressor(level=1)
    frames = [comp.compress(b"x" * 1000)]
    rep = scaling_report(frames)
    assert rep["processes"] == 1 and rep["bytes"] == 1000 and rep["gbps"] >= 0


def _run_simulated_processes(frames, nproc, monkeypatch):
    """Run decode_frames_multihost once per simulated process, in lockstep
    threads, with process_allgather replaced by a barrier-gather. This
    exercises the REAL allgather/reassembly code (multihost.py) — the
    degenerate nproc==1 early-return never fires."""
    import threading

    import numpy as np
    from jax.experimental import multihost_utils

    from zstd_tpu.parallel import multihost

    tls = threading.local()
    barrier = threading.Barrier(nproc)
    deposits = {}
    lock = threading.Lock()

    def fake_process_info():
        return tls.pid, nproc

    def fake_allgather(arr):
        # every process calls allgather the same number of times in the
        # same order; key deposits by per-thread call index
        call = tls.calls
        tls.calls += 1
        with lock:
            deposits.setdefault(call, {})[tls.pid] = np.asarray(arr).copy()
        barrier.wait()
        stacked = np.stack([deposits[call][p] for p in range(nproc)])
        barrier.wait()  # everyone read before the dict mutates further
        return stacked

    monkeypatch.setattr(multihost, "process_info", fake_process_info)
    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)

    results = [None] * nproc
    errors = []

    def run(pid):
        tls.pid = pid
        tls.calls = 0
        try:
            results[pid] = multihost.decode_frames_multihost(frames)
        except Exception as e:  # surface thread failures to pytest
            errors.append(e)
            try:
                barrier.abort()
            except Exception:
                pass

    threads = [threading.Thread(target=run, args=(p,)) for p in range(nproc)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    return results


def test_multiprocess_allgather_reassembly(monkeypatch):
    comp = zstandard.ZstdCompressor(level=3, write_checksum=True)
    payloads = [b"frame %d " % i * (10 + i * 13) for i in range(11)]
    frames = [comp.compress(p) for p in payloads]
    # one malformed frame: poisons only its own lane, reported as None
    bad = bytearray(frames[4])
    bad[10] ^= 0xFF
    bad_frames = list(frames)
    bad_frames[4] = bytes(bad)
    expected = list(payloads)
    try:
        import zstandard as zstd_check

        zstd_check.ZstdDecompressor().decompress(
            bytes(bad), max_output_size=1 << 20)
    except Exception:
        expected[4] = None  # genuinely malformed (almost surely)

    per_proc = _run_simulated_processes(bad_frames, nproc=3,
                                        monkeypatch=monkeypatch)
    for res in per_proc:
        assert len(res) == len(frames)
        for got, want in zip(res, expected):
            assert got == want


def test_multiprocess_more_processes_than_frames(monkeypatch):
    comp = zstandard.ZstdCompressor(level=1)
    payloads = [b"alpha" * 40, b"beta" * 77]
    frames = [comp.compress(p) for p in payloads]
    per_proc = _run_simulated_processes(frames, nproc=3,
                                        monkeypatch=monkeypatch)
    for res in per_proc:
        assert res == payloads
