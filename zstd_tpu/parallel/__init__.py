"""Multi-chip / multi-host scaling (SURVEY.md §2 'parallelism components').

The unit of parallelism is the independent frame (the format guarantees
decode independence across frames); scaling is data-parallel sharding of the
lane batch over a `jax.sharding.Mesh`, with entropy tables replicated
(broadcast once) and metrics reduced with all-reduce. Multi-host runs keep
each host's frames local (process-local framing + decode) and gather outputs
in frame order — only metadata and final bytes cross DCN.
"""

from zstd_tpu.parallel.mesh import (
    make_mesh,
    shard_fused_kwargs,
    sharded_decode,
)

__all__ = ["make_mesh", "shard_fused_kwargs", "sharded_decode"]
