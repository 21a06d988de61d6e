"""Windowed decode output buffer.

Parity with /root/reference/ruzstd/src/decoding/decode_buffer.rs:9-463 and the
ring buffer beneath it (ringbuffer.rs): push literals, `repeat` match copies
(overlap handled by offset-sized chunking), matches reaching into dictionary
content, and drain APIs that always retain `window_size` bytes mid-frame so
streaming decode runs in bounded memory. The running xxhash64 is updated on
drain. A Python bytearray replaces the unsafe Rust ring buffer — same
semantics, no unsafe.
"""

from zstd_tpu.common.errors import DecodeBufferError
from zstd_tpu.utils.xxhash64 import Xxh64


class DecodeBuffer:
    __slots__ = ("buffer", "window_size", "dict_content", "total_output", "hash")

    def __init__(self, window_size: int):
        self.buffer = bytearray()
        self.window_size = window_size
        self.dict_content = b""
        self.total_output = 0
        self.hash = Xxh64()

    def reset(self, window_size: int) -> None:
        self.buffer = bytearray()
        self.window_size = window_size
        self.dict_content = b""
        self.total_output = 0
        self.hash = Xxh64()

    def len(self) -> int:
        return len(self.buffer)

    def push(self, data) -> None:
        self.buffer.extend(data)
        self.total_output += len(data)

    def repeat(self, offset: int, match_length: int) -> None:
        """Copy `match_length` bytes from `offset` back in decode history."""
        if offset == 0:
            raise DecodeBufferError("match offset of zero")
        buf = self.buffer
        ml = match_length
        if offset > len(buf):
            # The match starts inside dictionary content.
            gap = offset - len(buf)
            if gap > len(self.dict_content):
                raise DecodeBufferError(
                    f"offset {offset} reaches beyond decoded output "
                    f"({len(buf)}) + dictionary ({len(self.dict_content)})")
            take = min(ml, gap)
            start = len(self.dict_content) - gap
            buf.extend(self.dict_content[start:start + take])
            ml -= take
            # Any remainder now starts at the first decoded byte (offset ==
            # len(buf) after the dict part grew the buffer by `take`).
        while ml > 0:
            start = len(buf) - offset
            take = min(ml, offset)  # overlap-safe: never read past old end
            buf.extend(buf[start:start + take])
            ml -= take
        self.total_output += match_length

    # --- drain APIs ---------------------------------------------------------

    def can_drain_to_window_size(self) -> int:
        return max(0, len(self.buffer) - self.window_size)

    def drain_to_window_size(self) -> bytes:
        n = self.can_drain_to_window_size()
        return self.drain(n)

    def drain(self, n: int | None = None) -> bytes:
        if n is None or n > len(self.buffer):
            n = len(self.buffer)
        out = bytes(self.buffer[:n])
        del self.buffer[:n]
        self.hash.update(out)
        return out

    def drain_all(self) -> bytes:
        return self.drain(len(self.buffer))
