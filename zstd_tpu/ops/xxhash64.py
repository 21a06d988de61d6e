"""Vectorized xxhash64 over batched lanes (XLA, device-side).

Closes the serving-mode integrity gap: `BatchDecoder.run_device(...,
pull_outputs=False)` returns device-resident handles, and before this the
frame checksum was only ever verified in `_postprocess` on pulled bytes —
the reference hashes on every drain (decode_buffer.rs:241-314). Here the
whole (B, W) output bucket is hashed on device in one jit and the low-32
digests compared against the frame headers' xxh32-of-xxh64 fields without
any host pull.

Formulation notes (TPU): the stripe recurrence is sequential per lane, so
the scan runs over the stripe axis while every lane advances in parallel —
(B, 4) u64 accumulators, one fori step per 32-byte stripe. 64-bit ints are
emulated 2x32 on TPU; the loop is bandwidth-trivial and the mults are
(B,4)-wide, so the emulation cost is fine for 128 KiB-class lanes. u64
dtypes need x64 tracing, enabled locally via jax.enable_x64
(does not disturb the rest of the pipeline: only this trace sees it).

Spec parity: XXH64 as in native.cpp (zt_xxh64) and RFC-style reference;
the frame checksum is the LOW 32 bits of XXH64(content, seed=0)
(frame_decoder.rs checksum path).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)


def _rotl(x, r):
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _round(acc, inp):
    return _rotl(acc + inp * _P2, 31) * _P1


def _merge(h, acc):
    h = h ^ _round(jnp.zeros_like(acc), acc)
    return h * _P1 + _P4


@functools.partial(jax.jit, static_argnames=("width",))
def _xxh64_impl(data, length, width: int):
    B = data.shape[0]
    S = width // 32  # whole stripes available in the padded buffer

    # (B, S, 4) little-endian u64 words per stripe
    d = data.astype(jnp.uint64)
    b = d.reshape(B, width // 8, 8)
    words = (b[..., 0] | (b[..., 1] << np.uint64(8))
             | (b[..., 2] << np.uint64(16)) | (b[..., 3] << np.uint64(24))
             | (b[..., 4] << np.uint64(32)) | (b[..., 5] << np.uint64(40))
             | (b[..., 6] << np.uint64(48)) | (b[..., 7] << np.uint64(56)))
    stripes = words.reshape(B, S, 4)

    n_stripes = (length // 32).astype(jnp.int32)  # per-lane full stripes

    seeds = jnp.array([np.uint64((int(_P1) + int(_P2)) & (2**64 - 1)),
                       _P2, np.uint64(0),
                       np.uint64((-int(_P1)) & (2**64 - 1))],
                      dtype=jnp.uint64)
    acc0 = jnp.broadcast_to(seeds[None, :], (B, 4))

    def body(s, acc):
        w = jax.lax.dynamic_slice_in_dim(stripes, s, 1, axis=1)[:, 0, :]
        upd = _round(acc, w)
        return jnp.where((s < n_stripes)[:, None], upd, acc)

    acc = jax.lax.fori_loop(0, S, body, acc0)

    h_big = (_rotl(acc[:, 0], 1) + _rotl(acc[:, 1], 7)
             + _rotl(acc[:, 2], 12) + _rotl(acc[:, 3], 18))
    for i in range(4):
        h_big = _merge(h_big, acc[:, i])
    h = jnp.where(length >= 32, h_big,
                  jnp.full((B,), np.uint64(0) + _P5, jnp.uint64))
    h = h + length.astype(jnp.uint64)

    # tail: up to 31 bytes at offset length - (length % 32), gathered per
    # lane into a fixed (B, 32) window (element gather, B*32 elems)
    tail_len = (length & 31).astype(jnp.int32)
    tail_off = (length - tail_len).astype(jnp.int32)
    cols = tail_off[:, None] + jnp.arange(32, dtype=jnp.int32)[None, :]
    cols = jnp.minimum(cols, width - 1)
    tail = jnp.take_along_axis(data, cols, axis=1).astype(jnp.uint64)

    tb = tail.reshape(B, 4, 8)
    tw = (tb[..., 0] | (tb[..., 1] << np.uint64(8))
          | (tb[..., 2] << np.uint64(16)) | (tb[..., 3] << np.uint64(24))
          | (tb[..., 4] << np.uint64(32)) | (tb[..., 5] << np.uint64(40))
          | (tb[..., 6] << np.uint64(48)) | (tb[..., 7] << np.uint64(56)))
    for k in range(3):  # up to three whole 8-byte words in a 31-byte tail
        upd = _rotl(h ^ _round(jnp.zeros_like(h), tw[:, k]), 27) * _P1 + _P4
        h = jnp.where(tail_len >= 8 * (k + 1), upd, h)

    # optional 4-byte word after the 8-byte words
    w8 = (tail_len >> 3).astype(jnp.int32)  # number of 8-byte words consumed
    pos4 = w8 * 8
    has4 = (tail_len & 4) > 0
    b4 = jnp.take_along_axis(
        tail, (pos4[:, None] + jnp.arange(4, dtype=jnp.int32)[None, :]) % 32,
        axis=1)
    v4 = (b4[:, 0] | (b4[:, 1] << np.uint64(8)) | (b4[:, 2] << np.uint64(16))
          | (b4[:, 3] << np.uint64(24)))
    upd = _rotl(h ^ (v4 * _P1), 23) * _P2 + _P3
    h = jnp.where(has4, upd, h)

    # trailing 0-3 single bytes
    pos1 = pos4 + jnp.where(has4, 4, 0)
    for j in range(3):
        bj = jnp.take_along_axis(tail, ((pos1 + j) % 32)[:, None],
                                 axis=1)[:, 0]
        upd = _rotl(h ^ (bj * _P5), 11) * _P1
        h = jnp.where((tail_len & 3) > j, upd, h)

    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def xxh64_lanes(data, length):
    """XXH64(seed=0) of data[i, :length[i]] for every lane.

    data: (B, W) u8 array (device or host); length: (B,) i32.
    Returns (B,) u64 digests (as a jax array under x64 tracing).
    Bytes at/after `length` are ignored; W must be a multiple of 32.
    """
    assert data.shape[1] % 32 == 0, "pad width to a 32-byte multiple"
    with jax.enable_x64():
        return _xxh64_impl(jnp.asarray(data),
                           jnp.asarray(length, jnp.int32).astype(jnp.int64),
                           width=data.shape[1])


def xxh64_low32_lanes(data, length):
    """Low 32 bits of xxh64 per lane (the zstd frame-checksum field),
    returned as (B,) uint32 castable without x64 on the caller side."""
    h = xxh64_lanes(data, length)
    with jax.enable_x64():
        lo = (h & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    return lo
