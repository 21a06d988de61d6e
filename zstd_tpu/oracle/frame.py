"""Frame header parsing (RFC 8878 §3.1.1.1).

Parity with /root/reference/ruzstd/src/decoding/frame.rs:6-241: magic number,
skippable-frame detection (raised as SkipFrame carrying the content length),
descriptor bits, the window-size formula windowBase + (windowBase/8)*mantissa,
and min/max window validation.
"""

import dataclasses

from zstd_tpu.common import constants
from zstd_tpu.common.errors import FrameHeaderError, NotEnoughBytes, SkipFrame


@dataclasses.dataclass
class FrameHeader:
    window_size: int
    frame_content_size: int | None
    dictionary_id: int | None
    content_checksum: bool
    single_segment: bool
    header_size: int  # total bytes consumed incl. magic


def parse_frame_header(data) -> FrameHeader:
    """Parse magic + frame header from the start of `data`."""
    if len(data) < 4:
        raise NotEnoughBytes(4, len(data), "frame magic")
    magic = int.from_bytes(data[0:4], "little")
    if constants.SKIPPABLE_MAGIC_MIN <= magic <= constants.SKIPPABLE_MAGIC_MAX:
        if len(data) < 8:
            raise NotEnoughBytes(8, len(data), "skippable frame header")
        length = int.from_bytes(data[4:8], "little")
        raise SkipFrame(magic, length)
    if magic != constants.MAGIC_NUM:
        raise FrameHeaderError(f"bad magic number 0x{magic:08X}")

    if len(data) < 5:
        raise NotEnoughBytes(5, len(data), "frame descriptor")
    desc = data[4]
    fcs_flag = desc >> 6
    single_segment = bool(desc & 0x20)
    if desc & 0x08:
        raise FrameHeaderError("reserved frame-descriptor bit set")
    checksum = bool(desc & 0x04)
    did_flag = desc & 0x03

    pos = 5
    window_size = None
    if not single_segment:
        if len(data) < pos + 1:
            raise NotEnoughBytes(pos + 1, len(data), "window descriptor")
        wd = data[pos]
        pos += 1
        exponent = wd >> 3
        mantissa = wd & 7
        window_log = 10 + exponent
        window_base = 1 << window_log
        window_size = window_base + (window_base // 8) * mantissa

    did_size = (0, 1, 2, 4)[did_flag]
    dictionary_id = None
    if did_size:
        if len(data) < pos + did_size:
            raise NotEnoughBytes(pos + did_size, len(data), "dictionary id")
        dictionary_id = int.from_bytes(data[pos:pos + did_size], "little")
        if dictionary_id == 0:
            dictionary_id = None
        pos += did_size

    fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    frame_content_size = None
    if fcs_size:
        if len(data) < pos + fcs_size:
            raise NotEnoughBytes(pos + fcs_size, len(data), "frame content size")
        frame_content_size = int.from_bytes(data[pos:pos + fcs_size], "little")
        if fcs_size == 2:
            frame_content_size += 256
        pos += fcs_size

    if single_segment:
        window_size = frame_content_size if frame_content_size is not None else 0

    if not single_segment:
        if window_size < constants.MIN_WINDOW_SIZE:
            raise FrameHeaderError(f"window size {window_size} below minimum")
        if window_size > constants.MAX_WINDOW_SIZE:
            raise FrameHeaderError(f"window size {window_size} above spec maximum")

    return FrameHeader(
        window_size=window_size,
        frame_content_size=frame_content_size,
        dictionary_id=dictionary_id,
        content_checksum=checksum,
        single_segment=single_segment,
        header_size=pos,
    )
