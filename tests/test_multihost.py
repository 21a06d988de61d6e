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
