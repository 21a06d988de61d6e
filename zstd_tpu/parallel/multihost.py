"""Multi-host batch codec (BASELINE.json config 5; SURVEY.md §5 'distributed
communication backend').

Design: the unit of parallelism is the independent frame. Frames are assigned
round-robin by global index; each process frames+decodes its local shard on
its own chips (all heavy traffic chip-local), and outputs are gathered **in
frame order** across hosts — only metadata (lengths, ok flags) and final
bytes cross DCN, via `jax.experimental.multihost_utils.process_allgather`.
Dictionaries/predefined tables replicate by construction (every process
builds them from the same bytes — broadcast once at the data layer).

This module is written to run unchanged on a single process (the gather
degenerates to identity), which is how CI exercises it; a real pod slice
initializes with `jax.distributed.initialize()` first.
"""

import numpy as np

import jax


def process_info():
    try:
        return jax.process_index(), jax.process_count()
    except RuntimeError:
        return 0, 1


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """jax.distributed.initialize wrapper (no-op when single-process)."""
    if num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator, num_processes, process_id)


def shard_indices(n_frames: int, pid: int, nproc: int) -> list:
    """Round-robin assignment keeps shards balanced for heterogeneous
    frame sizes."""
    return list(range(pid, n_frames, nproc))


def decode_frames_multihost(frames: list, decoder=None) -> list:
    """Decode `frames` across all processes; every process returns the full
    ordered result list (byte-exact, frame order preserved)."""
    from zstd_tpu.models.batch_decoder import BatchDecoder

    pid, nproc = process_info()
    mine = shard_indices(len(frames), pid, nproc)
    dec = decoder or BatchDecoder()
    local = dec.decode_frames([frames[i] for i in mine]) if mine else []

    if nproc == 1:
        return local

    from jax.experimental import multihost_utils

    # Exchange lengths first, then the padded payload matrix: ordered
    # reassembly is by global frame index, never by process arrival order.
    max_local = (len(frames) + nproc - 1) // nproc
    lens = np.full(max_local, -1, np.int64)
    for j, r in enumerate(local):
        lens[j] = -2 if r is None else len(r)
    all_lens = np.asarray(multihost_utils.process_allgather(lens))
    width = max(1, int(all_lens.max()))
    payload = np.zeros((max_local, width), np.uint8)
    for j, r in enumerate(local):
        if r is not None:
            payload[j, :len(r)] = np.frombuffer(r, np.uint8)
    all_payload = np.asarray(multihost_utils.process_allgather(payload))

    results: list = [None] * len(frames)
    for p in range(nproc):
        idxs = shard_indices(len(frames), p, nproc)
        for j, gi in enumerate(idxs):
            n = int(all_lens[p, j])
            if n == -2:
                results[gi] = None
            else:
                results[gi] = all_payload[p, j, :n].tobytes()
    return results


def scaling_report(frames: list, repeats: int = 1) -> dict:
    """Per-process decode throughput + aggregated metrics (psum-style),
    the measurement harness for the >=85% scaling-efficiency gate."""
    import time

    pid, nproc = process_info()
    t0 = time.time()
    out = None
    for _ in range(repeats):
        out = decode_frames_multihost(frames)
    dt = (time.time() - t0) / repeats
    total = sum(len(r) for r in out if r is not None)
    return {
        "process": pid,
        "processes": nproc,
        "frames": len(frames),
        "bytes": total,
        "seconds": dt,
        "gbps": total / dt / 1e9 if dt else 0.0,
    }
