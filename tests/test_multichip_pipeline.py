"""The PRODUCTION bucketed pipeline under mesh sharding (virtual 8-device
CPU mesh — conftest sets xla_force_host_platform_device_count), and the
multi-process reassembly branch of decode_frames_multihost with a mocked
process_allgather."""

import numpy as np
import pytest
import zstandard

import jax


def _payloads(n=16, seed=9):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        base = (b"mesh shard frame %d " % i) * rng.randint(30, 80)
        out.append(base + rng.bytes(rng.randint(32, 300)))
    return out


def test_production_pipeline_sharded_bit_exact():
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    from zstd_tpu.models.batch_decoder import BatchDecoder
    from zstd_tpu.parallel.mesh import make_mesh

    payloads = _payloads()
    comp = zstandard.ZstdCompressor(level=3)
    frames = [comp.compress(p) for p in payloads]
    dec = BatchDecoder()
    batch = dec.prepare(frames)
    staged = dec.stage(batch, mesh=make_mesh(8))
    outputs, out_len, ok = dec.run_device(batch, staged)
    for i, p in enumerate(payloads):
        assert bool(ok[i])
        assert int(out_len[i]) == len(p)
        assert outputs[i][:len(p)].tobytes() == p


def test_multihost_gather_reassembles_in_frame_order(monkeypatch):
    """Drive the nproc>1 branch: simulate 3 processes' local decodes and
    check the allgather-based ordered reassembly (multihost.py:57-82)."""
    from zstd_tpu.parallel import multihost

    payloads = _payloads(11, seed=4)
    comp = zstandard.ZstdCompressor(level=1)
    frames = [comp.compress(p) for p in payloads]
    nproc = 3

    # run each simulated process's local phase with the real decoder
    from zstd_tpu.models.batch_decoder import BatchDecoder

    results_per_proc = []
    for pid in range(nproc):
        mine = multihost.shard_indices(len(frames), pid, nproc)
        local = BatchDecoder().decode_frames([frames[i] for i in mine])
        results_per_proc.append((pid, mine, local))

    # build the global gather matrices exactly as each process would
    max_local = (len(frames) + nproc - 1) // nproc
    all_lens = np.full((nproc, max_local), -1, np.int64)
    for pid, mine, local in results_per_proc:
        for j, r in enumerate(local):
            all_lens[pid, j] = -2 if r is None else len(r)
    width = max(1, int(all_lens.max()))
    all_payload = np.zeros((nproc, max_local, width), np.uint8)
    for pid, mine, local in results_per_proc:
        for j, r in enumerate(local):
            if r is not None:
                all_payload[pid, j, :len(r)] = np.frombuffer(r, np.uint8)

    calls = {"n": 0}

    def fake_allgather(x):
        calls["n"] += 1
        return all_lens if x.ndim == 1 else all_payload

    import jax.experimental.multihost_utils as mh

    monkeypatch.setattr(mh, "process_allgather", fake_allgather)
    monkeypatch.setattr(multihost, "process_info", lambda: (1, nproc))
    results = multihost.decode_frames_multihost(frames)
    assert calls["n"] == 2  # lens + payload exchange
    assert [r for r in results] == payloads
