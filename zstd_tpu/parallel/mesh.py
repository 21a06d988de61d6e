"""Mesh sharding of the fused decode step.

Every lane-batch array (leading dim = huffman lanes / sequence lanes /
frames) shards over the 'dp' mesh axis; table arrays and LUTs replicate.
Cross-shard scatters (a lane whose destination frame lives on another
device) lower to XLA collectives automatically — the production framer
avoids them by partitioning frames per device, but correctness never
depends on that.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zstd_tpu.models.fused import fused_decode_step

# kwargs whose leading dim is a lane/frame batch -> shard over dp
_BATCH_KEYS = (
    "huff_streams", "huff_pos", "huff_tid", "huff_nsym", "huff_dst_frame",
    "huff_dst_off", "seq_streams", "seq_pos", "seq_n", "ll_tid", "of_tid",
    "ml_tid", "seq_dst_frame", "seq_dst_off", "seq_lit_total",
    "seq_trail_slot", "lit_base", "ll_base", "ml_base", "of_base",
    "is_real", "init_hist",
)
# replicated entropy tables / LUTs (broadcast once — BASELINE.json config 4)
_REPLICATED_KEYS = (
    "huff_tables", "huff_maxbits", "ll_tables", "of_tables", "ml_tables",
    "ll_logs", "of_logs", "ml_logs",
)


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _pad_rows(arr: np.ndarray, mult: int, fill=0) -> np.ndarray:
    n = arr.shape[0]
    rem = (-n) % mult
    if rem == 0:
        return arr
    pad = np.full((rem,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def shard_fused_kwargs(kwargs: dict, mesh: Mesh, axis: str = "dp") -> dict:
    """Pad batch dims to the mesh size and place arrays with shardings.

    Padded lanes are inert: nsym/n of 0 makes a lane a no-op with ok=True,
    and its scatters drop (sentinel destinations).
    """
    n = mesh.shape[axis]
    out = {}
    for k, v in kwargs.items():
        v = np.asarray(v)
        if k in _BATCH_KEYS:
            fill = -1 if k in ("huff_pos", "seq_pos") else 0
            if k == "seq_trail_slot":
                fill = 1 << 30
            v = _pad_rows(v, n, fill)
            sharding = NamedSharding(mesh, P(axis, *([None] * (v.ndim - 1))))
        else:
            sharding = NamedSharding(mesh, P(*([None] * v.ndim)))
        out[k] = jax.device_put(v, sharding)
    return out


def sharded_decode(kwargs: dict, static: dict, mesh: Mesh, axis: str = "dp"):
    """Run the fused decode step over the mesh; returns host numpy results
    trimmed of padding rows."""
    placed = shard_fused_kwargs(kwargs, mesh, axis)
    out, out_len, ok, metrics = fused_decode_step(**placed, **static)
    return (np.asarray(out), np.asarray(out_len), np.asarray(ok),
            {k: np.asarray(v) for k, v in metrics.items()})
