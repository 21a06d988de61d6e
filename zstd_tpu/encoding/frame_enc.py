"""Frame compression: header serialization, per-block level dispatch,
no-expansion guarantees, and content checksums.

Capability parity with /root/reference/ruzstd/src/encoding/frame_compressor.rs
and frame_header.rs: magic + descriptor byte + window descriptor (plus an
optional minified FCS — an extension; the reference never emits one),
128 KiB block loop, level dispatch (Uncompressed → raw blocks;
Fastest → RLE/compressed/raw per block, emitting Compressed only when strictly
smaller), empty-input zero-size raw last block, and the 4-byte xxhash64-low-32
content checksum.
"""

import io
import os

from zstd_tpu.common import constants as C
from zstd_tpu.common.config import CodecConfig, CompressionLevel
from zstd_tpu.common.errors import EncodeError
from zstd_tpu.encoding.block_enc import compress_block
from zstd_tpu.utils.xxhash64 import FastXxh64 as Xxh64

BLOCK_SIZE = C.MAX_BLOCK_SIZE  # 128 KiB spaces, like the reference matcher


def _window_descriptor(window_log: int) -> int:
    if window_log < 10 or window_log > 41:
        raise EncodeError(f"window log {window_log} out of range")
    return (window_log - 10) << 3  # mantissa 0


def _frame_header(window_log: int, checksum: bool,
                  content_size: int | None = None) -> bytes:
    """Magic + descriptor (+ window descriptor) (+ minified FCS).

    The reference never emits FCS (frame_header.rs writes fcs only when
    set, and frame_compressor.rs:144-151 never sets it); emitting it is an
    extension — the minimal-width rules are RFC 8878 §3.1.1.1.1-.4
    (util.rs `find_min_size`/`minify_val` analog): content < 256 uses the
    single-segment 1-byte form (window = FCS, no window descriptor),
    256..65791 the 2-byte form storing size-256, then 4/8 bytes.
    """
    out = bytearray(C.MAGIC_NUM.to_bytes(4, "little"))
    descriptor = 0
    if checksum:
        descriptor |= 0x04
    if content_size is None:
        out.append(descriptor)
        out.append(_window_descriptor(window_log))
    elif content_size < 256:
        out.append(descriptor | 0x20)  # single-segment
        out.append(content_size)
    else:
        if content_size <= 0xFFFF + 256:
            flag, nb, val = 0x40, 2, content_size - 256
        elif content_size <= 0xFFFFFFFF:
            flag, nb, val = 0x80, 4, content_size
        else:
            flag, nb, val = 0xC0, 8, content_size
        out.append(descriptor | flag)
        out.append(_window_descriptor(window_log))
        out += val.to_bytes(nb, "little")
    return bytes(out)


def _block_header(last: bool, btype: int, size: int) -> bytes:
    v = (1 if last else 0) | (btype << 1) | (size << 3)
    return v.to_bytes(3, "little")


def effective_window_log(n: int, window_log: int) -> int:
    """Window actually advertised (and reached by the matcher) for a frame
    whose content size `n` is known: the configured log is a MAXIMUM, the
    content size the binding bound — a 4 KiB frame never advertises an
    8 MiB decoder window. Unknown-size streaming uses the configured log
    as-is (the caller passes no n)."""
    if n <= 1:
        return 10
    return max(10, min(window_log, (n - 1).bit_length()))


class FrameCompressor:
    """Streaming frame compressor over file-like source/drain
    (frame_compressor.rs:38-276)."""

    def __init__(self, config: CodecConfig | None = None):
        self.config = config or CodecConfig()
        self.source = None
        self.drain = None
        self.matcher = None  # pluggable Matcher (encoding/mod.rs:84-119 parity)

    def set_source(self, source) -> None:
        self.source = source

    def set_drain(self, drain) -> None:
        self.drain = drain

    def replace_matcher(self, matcher) -> None:
        self.matcher = matcher

    def set_compression_level(self, level: CompressionLevel) -> None:
        self.config = CodecConfig(**{**self.config.__dict__, "level": level})

    def compress(self, content_size: int | None = None) -> None:
        """content_size: known total source length; when given (or when
        cfg.write_content_size demands it) the frame header carries a
        minified FCS field and the actual byte count is verified against
        it at the end."""
        if self.source is None or self.drain is None:
            raise EncodeError("source and drain must be set before compress()")
        if content_size is None and self.config.write_content_size:
            raise EncodeError(
                "write_content_size=True needs compress(content_size=...) "
                "on the streaming API (FCS is in the header)")
        cfg = self.config
        level = cfg.level
        if level not in (CompressionLevel.UNCOMPRESSED, CompressionLevel.FASTEST):
            raise NotImplementedError(
                f"compression level {level.name} not implemented "
                "(reference parity: frame_compressor.rs:200-204)")
        if self.matcher is not None:
            self.matcher.reset(level)
        self._offset_hist = list(C.INITIAL_REPEAT_OFFSETS)
        self._huff_table = None  # cross-block Treeless reuse state
        # Native per-block fast path (byte-identical to the Python path —
        # tests/test_encoder_native.py pins it; ZT_NO_NATIVE=1 forces Python)
        self._native = None
        if (self.matcher is None and level == CompressionLevel.FASTEST
                and not os.environ.get("ZT_NO_NATIVE")):
            try:
                from zstd_tpu.runtime import BlockCompressor

                self._native = BlockCompressor()
            except Exception:
                self._native = None
        hasher = Xxh64() if cfg.write_checksum else None
        if self.matcher is not None:
            window_log = self.matcher.window_size().bit_length() - 1
        elif content_size is not None:
            window_log = effective_window_log(content_size, cfg.window_log)
        else:
            window_log = cfg.window_log
        self.drain.write(_frame_header(window_log, cfg.write_checksum,
                                       content_size))
        # cross-block matcher window: the frame-lifetime candidate table
        # plus a rolling max_off-byte history (the advertised window) —
        # match sources reach across block boundaries, unlike the
        # reference's per-slice window. The native BlockCompressor carries
        # its own table; this ctx serves the Python path (and both advance
        # the rolling view identically).
        self._mctx = None
        if (self.matcher is None
                and level == CompressionLevel.FASTEST):
            from zstd_tpu.encoding.match_gen import FrameMatchCtx

            self._mctx = FrameMatchCtx(1 << window_log)

        first = True
        written = 0
        while True:
            block = self.source.read(BLOCK_SIZE)
            if not block and not first:
                break
            # peek one byte ahead to know whether this is the last block
            nxt = self.source.read(1)
            last = len(nxt) == 0
            if hasher is not None:
                hasher.update(block)
            self._write_block(block, last, level)
            written += len(block)
            first = False
            if last:
                break
            # push the peeked byte back by chaining it before further reads
            self.source = _Chain(nxt, self.source)

        if content_size is not None and written != content_size:
            raise EncodeError(
                f"source produced {written} bytes, header pledged "
                f"{content_size} (frame is corrupt)")

        if hasher is not None:
            self.drain.write((hasher.digest() & 0xFFFFFFFF).to_bytes(4, "little"))

    def _write_block(self, block: bytes, last: bool, level: CompressionLevel) -> None:
        drain = self.drain
        if len(block) == 0:
            drain.write(_block_header(True, C.BLOCK_RAW, 0))
            return
        if level == CompressionLevel.UNCOMPRESSED:
            drain.write(_block_header(last, C.BLOCK_RAW, len(block)))
            drain.write(block)
            return
        # Fastest: RLE when uniform, else compressed-unless-it-expands
        if block.count(block[0]) == len(block):
            if self._mctx is not None:
                self._mctx.skip(block)  # window advances; no table entries
            drain.write(_block_header(last, C.BLOCK_RLE, len(block)))
            drain.write(block[0:1])
            return
        view = self._mctx.push(block) if self._mctx is not None else None
        if self._native is not None:
            buf, base, lo, hi = view
            compressed = self._native.compress_block(
                buf, base, lo, hi, self._mctx.max_off)
            if compressed is not None:
                drain.write(_block_header(last, C.BLOCK_COMPRESSED,
                                          len(compressed)))
                drain.write(compressed)
                self._native.commit()  # commit only when the block is emitted
            else:
                drain.write(_block_header(last, C.BLOCK_RAW, len(block)))
                drain.write(block)
            return
        hist = list(self._offset_hist)
        huff_cell = [self._huff_table]
        compressed = compress_block(
            block, self.matcher, hist, huff_cell,
            fctx=(self._mctx, view) if view is not None else None)
        if compressed is not None and len(compressed) < len(block):
            drain.write(_block_header(last, C.BLOCK_COMPRESSED, len(compressed)))
            drain.write(compressed)
            self._offset_hist = hist  # commit only when the block is emitted
            self._huff_table = huff_cell[0]
        else:
            drain.write(_block_header(last, C.BLOCK_RAW, len(block)))
            drain.write(block)


class _Chain:
    """Read adapter that yields `head` bytes before delegating to `tail`."""

    def __init__(self, head: bytes, tail):
        self.head = head
        self.tail = tail

    def read(self, n: int) -> bytes:
        if self.head:
            take, self.head = self.head[:n], self.head[n:]
            if len(take) < n:
                take += self.tail.read(n - len(take))
            return take
        return self.tail.read(n)


def compress(source, drain, level: CompressionLevel = CompressionLevel.FASTEST,
             config: CodecConfig | None = None,
             content_size: int | None = None) -> None:
    """Mirror of ruzstd's encoding::compress (encoding/mod.rs:24-29)."""
    cfg = config or CodecConfig()
    cfg = CodecConfig(**{**cfg.__dict__, "level": level})
    fc = FrameCompressor(cfg)
    fc.set_source(source)
    fc.set_drain(drain)
    fc.compress(content_size)


def compress_to_vec(data, level: CompressionLevel = CompressionLevel.FASTEST,
                    config: CodecConfig | None = None) -> bytes:
    data = bytes(data)
    cfg = config or CodecConfig()
    fcs = len(data) if cfg.write_content_size else None
    # the content size is known here: shrink the advertised window (and the
    # matcher reach) to it, identically on the native and streaming paths
    wlog = effective_window_log(len(data), cfg.window_log)
    if (level in (CompressionLevel.UNCOMPRESSED, CompressionLevel.FASTEST)
            and not os.environ.get("ZT_NO_NATIVE")):
        # One-shot native frame build (no per-block Python/ctypes round
        # trips); byte-identical to the streaming path by construction —
        # the ratio-gate and parity tests pin it.
        if 10 <= wlog <= 41:
            try:
                from zstd_tpu.runtime import compress_frame as _native_frame

                out = _native_frame(
                    data, wlog, cfg.write_checksum,
                    1 if level == CompressionLevel.FASTEST else 0,
                    write_fcs=fcs is not None)
            except Exception:
                out = None
            if out is not None:
                return out
    cfg_eff = CodecConfig(**{**cfg.__dict__, "window_log": wlog})
    out = io.BytesIO()
    compress(io.BytesIO(data), out, level, cfg_eff, content_size=fcs)
    return out.getvalue()
