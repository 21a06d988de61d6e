"""Process-parallel frame compression.

Frames are compression-independent (the format's own parallelism unit, like
the decode side's frame batching), and the host encoder's Python glue holds
the GIL between its native hot loops — so scale-out uses processes. Workers
import only the numpy+native encoder stack (no device runtime), keeping
spawn cost low.
"""

import os

from zstd_tpu.common.config import CompressionLevel

_POOL = None
_POOL_WORKERS = 0


def _compress_one(args):
    data, level_val, checksum = args
    from zstd_tpu.common.config import CodecConfig, CompressionLevel
    from zstd_tpu.encoding.frame_enc import compress_to_vec

    cfg = CodecConfig(level=CompressionLevel(level_val),
                      write_checksum=checksum)
    return compress_to_vec(data, cfg.level, cfg)


def _get_pool(workers: int):
    global _POOL, _POOL_WORKERS
    if _POOL is not None and _POOL_WORKERS == workers:
        return _POOL
    if _POOL is not None:
        _POOL.shutdown(wait=False)
    import concurrent.futures as cf

    _POOL = cf.ProcessPoolExecutor(max_workers=workers)
    _POOL_WORKERS = workers
    return _POOL


def compress_frames_parallel(payloads: list,
                             level: CompressionLevel = CompressionLevel.FASTEST,
                             write_checksum: bool = True,
                             workers: int | None = None) -> list:
    """Compress each payload into its own frame, fanned out over worker
    processes; falls back to in-process encoding for tiny batches."""
    workers = workers or min(os.cpu_count() or 4, 16)
    total = sum(len(p) for p in payloads)
    if len(payloads) < 2 or total < (1 << 20) or workers < 2:
        from zstd_tpu.common.config import CodecConfig
        from zstd_tpu.encoding.frame_enc import compress_to_vec

        cfg = CodecConfig(level=level, write_checksum=write_checksum)
        return [compress_to_vec(p, level, cfg) for p in payloads]
    pool = _get_pool(workers)
    return list(pool.map(
        _compress_one,
        [(bytes(p), int(level.value), write_checksum) for p in payloads],
        chunksize=max(1, len(payloads) // (workers * 4))))
