"""Fast-level match generation: vectorized hashing + a greedy scan.

Capability parity with /root/reference/ruzstd/src/encoding/match_generator.rs:
direct-mapped hash table of 5-byte-window hashes (last-writer-wins, the same
multiplicative-hash construction), MIN_MATCH_LEN=5, greedy left-to-right
resolution. Instead of probing multiple window entries and picking
longest-then-closest, this generator keeps one candidate per bucket inside
the block (the libzstd-fast strategy) — simpler, and combined with the
optimal Huffman coder it compresses at least as small in practice. The hash
precomputation is NumPy-vectorized so the same arrays feed the TPU encoder
kernels (zstd_tpu/ops).
"""

import dataclasses

import numpy as np

MIN_MATCH = 5
HASH_LOG = 16
HASH_POLY = 0x00CF3BCCDCAB  # multiplicative constant (5-byte Karp-Rabin style)


@dataclasses.dataclass
class RawSequence:
    """literals run followed by a match (offset in absolute bytes)."""

    literals: bytes
    offset: int       # 0 means "trailing literals, no match"
    match_len: int


def hash5_all(data: np.ndarray) -> np.ndarray:
    """Hash every 5-byte window of `data` (u8 array) to HASH_LOG bits."""
    n = len(data)
    if n < MIN_MATCH:
        return np.zeros(0, dtype=np.uint64)
    d = data.astype(np.uint64)
    # pack 5 bytes little-endian into a u64 per position
    v = (d[:-4] | (d[1:-3] << 8) | (d[2:-2] << 16) | (d[3:-1] << 24)
         | (d[4:] << 32))
    with np.errstate(over="ignore"):
        h = (v * np.uint64(HASH_POLY)) >> np.uint64(64 - HASH_LOG)
    return h & np.uint64((1 << HASH_LOG) - 1)


def find_sequences(block: bytes) -> list[RawSequence]:
    """Greedy single-probe match finding within one standalone block."""
    import os

    dtype = np.int64 if os.environ.get("ZT_NO_NATIVE") else np.int32
    table = np.full(1 << HASH_LOG, -1, dtype=dtype)
    return find_sequences_ctx(block, 0, 0, len(block), table, 1 << 62)


def find_sequences_ctx(buf, base: int, lo: int, hi: int, table,
                       max_off: int) -> list[RawSequence]:
    """Greedy match finding over block [lo, hi) of a frame.

    `buf` holds the frame bytes from absolute position `base` onward (the
    caller retains >= max_off + 8 history bytes before lo); `table` is the
    frame-lifetime candidate table (absolute positions, -1 init once per
    frame), so match sources reach up to `max_off` bytes back ACROSS block
    boundaries — beyond the reference's per-slice window
    (match_generator.rs). Byte-identical to the native zt_find_sequences,
    which serves as the fast path when the table layout allows it (the
    byte-level Python scan below is the oracle; ZT_NO_NATIVE=1 forces it).
    """
    import os

    if (not os.environ.get("ZT_NO_NATIVE")
            and getattr(table, "dtype", None) == np.int32):
        from zstd_tpu.runtime import find_sequences_arrays_ctx

        r = find_sequences_arrays_ctx(buf, base, lo, hi, table, max_off)
        if r is not None:
            ll_a, off_a, ml_a = r
            mv0 = memoryview(buf)
            seqs = []
            pos = lo
            for i in range(len(ll_a)):
                l = int(ll_a[i])
                seqs.append(RawSequence(
                    bytes(mv0[pos - base:pos - base + l]),
                    int(off_a[i]), int(ml_a[i])))
                pos += l + int(ml_a[i])
            return seqs
    n = hi - lo
    mv = memoryview(buf)
    if n < MIN_MATCH + 3:
        return [RawSequence(bytes(mv[lo - base:hi - base]), 0, 0)] if n else []
    data = np.frombuffer(mv, dtype=np.uint8)
    hashes = hash5_all(data[lo - base:hi - base])  # index by pos - lo

    def at(p: int) -> int:
        return mv[p - base]

    seqs: list[RawSequence] = []
    anchor = lo
    pos = lo
    limit = hi - MIN_MATCH  # last position where a 5-byte window fits
    while pos <= limit:
        h = int(hashes[pos - lo])
        cand = int(table[h])
        table[h] = pos
        if (0 <= cand < pos and pos - cand <= max_off
                and mv[cand - base:cand - base + MIN_MATCH]
                == mv[pos - base:pos - base + MIN_MATCH]):
            # extend forwards
            ml = MIN_MATCH
            max_ml = hi - pos
            while ml < max_ml and at(cand + ml) == at(pos + ml):
                ml += 1
            # extend backwards into pending literals
            while pos > anchor and cand > 0 and at(cand - 1) == at(pos - 1):
                pos -= 1
                cand -= 1
                ml += 1
            seqs.append(RawSequence(bytes(mv[anchor - base:pos - base]),
                                    pos - cand, ml))
            pos += ml
            anchor = pos
            # register a couple of positions inside the match for future hits
            if pos - 2 > 0 and pos - 2 <= limit:
                table[int(hashes[pos - 2 - lo])] = pos - 2
        else:
            pos += 1
    if anchor < hi:
        seqs.append(RawSequence(bytes(mv[anchor - base:hi - base]), 0, 0))
    return seqs


class FrameMatchCtx:
    """Cross-block matcher state for one frame: the frame-lifetime
    candidate table plus a rolling history window of max_off + 8 bytes
    (bounded-memory streaming). push(block) returns the (buf, base, lo,
    hi) view for this block's scan and retains the window for the next."""

    __slots__ = ("table", "max_off", "_hist", "_cur")

    def __init__(self, max_off: int):
        # int32 so the native finder shares it directly (absolute positions
        # — frames beyond 2 GiB would overflow; out of scope for Fastest)
        self.table = np.full(1 << HASH_LOG, -1, dtype=np.int32)
        self.max_off = max_off
        self._hist = b""
        self._cur = 0

    def push(self, block: bytes):
        buf = self._hist + block
        lo = self._cur
        hi = lo + len(block)
        base = lo - len(self._hist)
        keep = self.max_off + 8
        self._hist = buf[-keep:] if len(buf) > keep else buf
        self._cur = hi
        return buf, base, lo, hi

    def skip(self, block: bytes) -> None:
        """Advance past a block emitted without the matcher (RLE/empty):
        its bytes stay in the rolling window as future match sources."""
        self.push(block)
