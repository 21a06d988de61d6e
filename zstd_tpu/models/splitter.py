"""Host frame splitter: scan a byte stream into individual frames.

Walks frame/block headers only (no payload decode) to find boundaries, so a
multi-frame file or a 100k-frame shard feeds straight into the batch decoder.
Skippable frames are skipped (frame_decoder.rs:538-574 parity).
"""

from zstd_tpu.common import constants as C
from zstd_tpu.common.errors import NotEnoughBytes, ZstdError
from zstd_tpu.oracle import blocks as blocks_mod
from zstd_tpu.oracle import frame as frame_mod
from zstd_tpu.common.errors import SkipFrame


def frame_length(data, offset: int = 0) -> int:
    """Byte length of the frame starting at `offset` (header walk only)."""
    view = memoryview(data)[offset:]
    header = frame_mod.parse_frame_header(view)
    pos = header.header_size
    while True:
        bh = blocks_mod.parse_block_header(view[pos:pos + 3])
        pos += 3
        if bh.block_type == C.BLOCK_RLE:
            pos += 1
        else:
            pos += bh.block_size
        if pos > len(view):
            raise NotEnoughBytes(pos, len(view), "frame body")
        if bh.last_block:
            break
    if header.content_checksum:
        pos += 4
    if pos > len(view):
        raise NotEnoughBytes(pos, len(view), "frame checksum")
    return pos


def split_frames(data) -> list:
    """Split a stream into frame byte strings, dropping skippable frames."""
    data = bytes(data)
    spans = _native_scan(data)
    if spans is not None:
        return [data[o:o + n] for o, n, kind in spans if kind == 0]
    out = []
    pos = 0
    while pos < len(data):
        try:
            n = frame_length(data, pos)
            out.append(data[pos:pos + n])
            pos += n
        except SkipFrame as sf:
            skip = 8 + sf.length
            if pos + skip > len(data):
                raise NotEnoughBytes(skip, len(data) - pos, "skippable frame")
            pos += skip
    return out


def _native_scan(data: bytes):
    """C++ frame scanner (zt_scan_frames); None -> python fallback."""
    try:
        from zstd_tpu.runtime import scan_frames
    except Exception:
        return None
    spans = scan_frames(data)
    if spans is None:
        return None
    covered = sum(n for _, n, _ in spans)
    if covered != len(data):
        raise ZstdError("malformed stream: frame scan stopped early")
    return spans


def decode_all_device(data, decoder=None) -> bytes:
    """Batch-decoder equivalent of oracle.decode_all."""
    from zstd_tpu.models.batch_decoder import BatchDecoder

    frames = split_frames(data)
    dec = decoder or BatchDecoder()
    parts = dec.decode_frames(frames)
    if any(p is None for p in parts):
        raise ZstdError("a frame failed to decode")
    return b"".join(parts)
