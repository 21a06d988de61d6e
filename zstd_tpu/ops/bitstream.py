"""Batched reverse-bitstream reads on device.

The reverse bitstream convention (see zstd_tpu/utils/bitio.py): bit i of a
stream is (data[i//8] >> (i%8)) & 1; a read of n bits consumes [pos-n, pos)
and returns them LSB-at-(pos-n). On device a read is one gather of a 32/64-bit
little-endian window at byte (pos-n)>>3 plus shift/mask — no per-bit work.
"""

import jax.numpy as jnp


def build_windows_u32(streams_u8: jnp.ndarray) -> jnp.ndarray:
    """(B, L) u8 -> (B, L) u32 where w[k] = LE32 load at byte k (zero padded).

    Supports bit reads of up to 32 - 7 = 25 bits at arbitrary bit offsets.
    """
    b = streams_u8.astype(jnp.uint32)
    pad = jnp.zeros((b.shape[0], 3), dtype=jnp.uint32)
    b = jnp.concatenate([b, pad], axis=1)
    return (b[:, :-3] | (b[:, 1:-2] << 8) | (b[:, 2:-1] << 16)
            | (b[:, 3:] << 24))


def read_bits_u32(windows: jnp.ndarray, lane_idx: jnp.ndarray,
                  pos: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Read n (<=25) bits ending at bit position `pos` per lane.

    Returns (values, new_pos). Reads reaching below bit 0 return phantom
    zeros in the low bit positions — exactly the ReverseBitReader semantics
    (bits below the stream start are zero), which the tail of every valid
    Huffman stream relies on.
    """
    n = n.astype(jnp.int32) if hasattr(n, "astype") else jnp.int32(n)
    new_pos = pos - n
    start = jnp.maximum(new_pos, 0)
    byte = jnp.clip(start >> 3, 0, windows.shape[1] - 1)
    w = windows[lane_idx, byte]
    mask = (jnp.uint32(1) << n.astype(jnp.uint32)) - 1
    val = (w >> (start & 7).astype(jnp.uint32)) & mask
    phantom = (start - new_pos).astype(jnp.uint32)  # = max(0, -new_pos)
    val = (val << phantom) & mask
    return val, new_pos


def host_initial_position(stream: bytes) -> int:
    """Top-of-stream bit position after the padding sentinel (host framer).

    Returns -1 for a malformed stream (empty or zero padding byte) — the
    lane is then flagged invalid instead of raising, so one bad lane never
    faults the batch (SURVEY.md §5 failure-detection parity).
    """
    if not stream or stream[-1] == 0:
        return -1
    return (len(stream) - 1) * 8 + stream[-1].bit_length() - 1
