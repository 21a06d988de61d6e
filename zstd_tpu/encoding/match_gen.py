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
    """Greedy single-probe match finding within one block (<=128 KiB)."""
    n = len(block)
    if n < MIN_MATCH + 3:
        return [RawSequence(block, 0, 0)] if n else []
    data = np.frombuffer(block, dtype=np.uint8)
    hashes = hash5_all(data)
    table = np.full(1 << HASH_LOG, -1, dtype=np.int64)

    seqs: list[RawSequence] = []
    anchor = 0
    pos = 0
    limit = n - MIN_MATCH  # last position where a 5-byte window fits
    mv = memoryview(block)
    while pos <= limit:
        h = int(hashes[pos])
        cand = int(table[h])
        table[h] = pos
        if cand >= 0 and mv[cand:cand + MIN_MATCH] == mv[pos:pos + MIN_MATCH]:
            # extend forwards
            ml = MIN_MATCH
            max_ml = n - pos
            while ml < max_ml and block[cand + ml] == block[pos + ml]:
                ml += 1
            # extend backwards into pending literals
            while pos > anchor and cand > 0 and block[cand - 1] == block[pos - 1]:
                pos -= 1
                cand -= 1
                ml += 1
            seqs.append(RawSequence(block[anchor:pos], pos - cand, ml))
            pos += ml
            anchor = pos
            # register a couple of positions inside the match for future hits
            if pos - 2 > 0 and pos - 2 <= limit:
                table[int(hashes[pos - 2])] = pos - 2
        else:
            pos += 1
    if anchor < n:
        seqs.append(RawSequence(block[anchor:], 0, 0))
    return seqs
