"""Frame decoding: scratch state, block dispatch, and the public decoder APIs.

Parity targets:
  - DecoderScratch — /root/reference/ruzstd/src/decoding/scratch.rs:15-134
  - BlockDecoder dispatch (Raw/RLE/Compressed/Reserved, 128 KiB cap) —
    block_decoder.rs:18-284
  - FrameDecoder pull API with BlockDecodingStrategy, window cap (default
    100 MB), dict registry, checksum verification, counters —
    frame_decoder.rs:77-624
  - StreamingDecoder io.Read-style adapter — streaming_decoder.rs:45-156
  - decode_all / decode_all_to_vec one-shot multi-frame path with
    skippable-frame skipping — frame_decoder.rs:538-607
"""

import enum
import io

from zstd_tpu.common import constants
from zstd_tpu.common.config import CodecConfig
from zstd_tpu.common.errors import (
    BlockHeaderError,
    BlockSizeError,
    ChecksumMismatch,
    DictNotProvided,
    NotEnoughBytes,
    SkipFrame,
    WindowSizeError,
    ZstdError,
)
from zstd_tpu.oracle import blocks as blocks_mod
from zstd_tpu.oracle import frame as frame_mod
from zstd_tpu.oracle import literals as literals_mod
from zstd_tpu.oracle import sequences as sequences_mod
from zstd_tpu.oracle.decode_buffer import DecodeBuffer
from zstd_tpu.oracle.dictionary import Dictionary


class DecoderScratch:
    """Per-frame reusable entropy/window state (scratch.rs:15-134)."""

    __slots__ = ("huffman_table", "ll_table", "of_table", "ml_table",
                 "buffer", "offset_hist")

    def __init__(self, window_size: int):
        self.huffman_table = None
        self.ll_table = None
        self.of_table = None
        self.ml_table = None
        self.buffer = DecodeBuffer(window_size)
        self.offset_hist = list(constants.INITIAL_REPEAT_OFFSETS)

    def reset(self, window_size: int) -> None:
        self.huffman_table = None
        self.ll_table = None
        self.of_table = None
        self.ml_table = None
        self.buffer.reset(window_size)
        self.offset_hist = list(constants.INITIAL_REPEAT_OFFSETS)

    def init_from_dict(self, d: Dictionary) -> None:
        self.huffman_table = d.huffman_table
        self.ll_table = d.ll_table
        self.of_table = d.of_table
        self.ml_table = d.ml_table
        self.offset_hist = list(d.offset_hist)
        self.buffer.dict_content = d.content


def _read_exact(source, n: int, what: str) -> bytes:
    data = source.read(n)
    if data is None:
        data = b""
    if len(data) < n:
        raise NotEnoughBytes(n, len(data), what)
    return data


def decode_block_content(header, source, scratch, block_size_cap: int) -> None:
    """Read one block's payload from `source` and decode it into the scratch
    buffer (block_decoder.rs:39-197)."""
    btype = header.block_type
    if btype == constants.BLOCK_RLE:
        if header.block_size > block_size_cap:
            raise BlockSizeError(
                f"RLE block regenerates {header.block_size} > cap {block_size_cap}")
        byte = _read_exact(source, 1, "rle block byte")
        scratch.buffer.push(byte * header.block_size)
        return
    if btype == constants.BLOCK_RAW:
        if header.block_size > block_size_cap:
            raise BlockSizeError(
                f"raw block of {header.block_size} > cap {block_size_cap}")
        scratch.buffer.push(_read_exact(source, header.block_size, "raw block"))
        return

    # Compressed
    if header.block_size > block_size_cap:
        raise BlockSizeError(
            f"compressed block of {header.block_size} > cap {block_size_cap}")
    content = _read_exact(source, header.block_size, "compressed block")

    section = blocks_mod.parse_literals_section(content)
    pos = section.header_size
    lits, consumed = literals_mod.decode_literals(section, content[pos:], scratch)
    pos += consumed

    seq_header = blocks_mod.parse_sequences_header(content[pos:])
    pos += seq_header.header_size
    if seq_header.num_sequences == 0:
        scratch.buffer.push(lits)
        return
    if sequences_mod.decode_and_execute(seq_header, content[pos:], scratch, lits):
        return
    seqs = sequences_mod.decode_sequences(seq_header, content[pos:], scratch)
    sequences_mod.execute_sequences(seqs, lits, scratch.buffer, scratch.offset_hist)


class BlockDecodingStrategy(enum.Enum):
    """How many blocks decode_blocks consumes before returning."""

    ALL = "all"
    UPTO_BLOCKS = "blocks"
    UPTO_BYTES = "bytes"


class FrameDecoder:
    """Low-level pull decoder over a file-like source.

    Usage: init(source) → decode_blocks(source, ...) until is_finished() →
    collect()/read(). Counters and checksum accessors mirror the reference
    (frame_decoder.rs:242-300).
    """

    def __init__(self, config: CodecConfig | None = None):
        self.config = config or CodecConfig()
        self.scratch = DecoderScratch(0)
        self.header = None
        self.dicts: dict[int, Dictionary] = {}
        self._forced_dict = None
        self._finished = False
        self._block_counter = 0
        self._bytes_read = 0
        self._checksum_from_data = None

    # --- configuration ------------------------------------------------------

    def set_max_window_size(self, size: int) -> None:
        self.config = CodecConfig(
            **{**self.config.__dict__,
               "max_window_size": min(size, constants.MAX_WINDOW_SIZE)})

    def add_dict(self, d: Dictionary) -> None:
        if d.dict_id is None:
            raise ZstdError("cannot register a dictionary without an id")
        self.dicts[d.dict_id] = d

    def force_dict(self, d: Dictionary | None) -> None:
        self._forced_dict = d

    # --- lifecycle -----------------------------------------------------------

    def init(self, source) -> None:
        self.reset(source)

    def reset(self, source) -> None:
        head = source.read(4)
        if head is None or len(head) < 4:
            raise NotEnoughBytes(4, len(head or b""), "frame magic")
        magic = int.from_bytes(head, "little")
        if constants.SKIPPABLE_MAGIC_MIN <= magic <= constants.SKIPPABLE_MAGIC_MAX:
            length = int.from_bytes(_read_exact(source, 4, "skippable length"), "little")
            raise SkipFrame(magic, length)
        # Frame headers are at most 14 bytes beyond the magic; read lazily.
        buf = bytearray(head)
        while True:
            try:
                header = frame_mod.parse_frame_header(bytes(buf))
                break
            except NotEnoughBytes as e:
                more = source.read(e.need - len(buf))
                if not more:
                    raise
                buf.extend(more)
        self._bytes_read = header.header_size
        self.header = header

        if header.window_size > self.config.max_window_size:
            raise WindowSizeError(header.window_size, self.config.max_window_size)

        self.scratch.reset(header.window_size)
        self._finished = False
        self._block_counter = 0
        self._checksum_from_data = None

        d = self._forced_dict
        if d is None and header.dictionary_id is not None:
            d = self.dicts.get(header.dictionary_id)
            if d is None:
                raise DictNotProvided(header.dictionary_id)
        if d is not None:
            self.scratch.init_from_dict(d)

    # --- decoding ------------------------------------------------------------

    def decode_blocks(self, source, strategy: BlockDecodingStrategy = BlockDecodingStrategy.ALL,
                      amount: int = 0) -> bool:
        """Decode blocks per `strategy`; returns True once the frame is done."""
        if self.header is None:
            raise ZstdError("decode_blocks before init()")
        block_cap = min(self.header.window_size or constants.MAX_BLOCK_SIZE,
                        constants.MAX_BLOCK_SIZE)
        blocks_done = 0
        while not self._finished:
            hdr_bytes = _read_exact(source, 3, "block header")
            header = blocks_mod.parse_block_header(hdr_bytes)
            self._bytes_read += 3
            pre = source.tell() if hasattr(source, "tell") else None
            decode_block_content(header, source, self.scratch, block_cap)
            if pre is not None:
                self._bytes_read += source.tell() - pre
            else:
                self._bytes_read += (1 if header.block_type == constants.BLOCK_RLE
                                     else header.block_size)
            self._block_counter += 1
            blocks_done += 1

            if header.last_block:
                self._finished = True
                if self.header.content_checksum:
                    cs = _read_exact(source, 4, "content checksum")
                    self._checksum_from_data = int.from_bytes(cs, "little")
                    self._bytes_read += 4
                break
            if strategy is BlockDecodingStrategy.UPTO_BLOCKS and blocks_done >= amount:
                break
            if strategy is BlockDecodingStrategy.UPTO_BYTES and \
                    self.scratch.buffer.can_drain_to_window_size() >= amount:
                break
        return self._finished

    # --- draining ------------------------------------------------------------

    def can_collect(self) -> int:
        if self._finished:
            return self.scratch.buffer.len()
        return self.scratch.buffer.can_drain_to_window_size()

    def collect(self) -> bytes:
        if self._finished:
            out = self.scratch.buffer.drain_all()
            self._verify_checksum()
            return out
        return self.scratch.buffer.drain_to_window_size()

    def read(self, n: int) -> bytes:
        avail = self.can_collect()
        take = min(n, avail)
        out = self.scratch.buffer.drain(take)
        if self._finished and self.scratch.buffer.len() == 0:
            self._verify_checksum()
        return out

    def _verify_checksum(self) -> None:
        if (self._checksum_from_data is not None and self.config.verify_checksums):
            got = self.scratch.buffer.hash.digest() & 0xFFFFFFFF
            if got != self._checksum_from_data:
                raise ChecksumMismatch(self._checksum_from_data, got)

    # --- accessors (frame_decoder.rs:242-300) --------------------------------

    def is_finished(self) -> bool:
        return self._finished and self.scratch.buffer.len() == 0

    def blocks_decoded(self) -> int:
        return self._block_counter

    def bytes_read_from_source(self) -> int:
        return self._bytes_read

    def content_size(self) -> int | None:
        return self.header.frame_content_size if self.header else None

    def get_checksum_from_data(self) -> int | None:
        return self._checksum_from_data

    def get_calculated_checksum(self) -> int:
        return self.scratch.buffer.hash.digest() & 0xFFFFFFFF


class StreamingDecoder(io.RawIOBase):
    """io.RawIOBase adapter over FrameDecoder (streaming_decoder.rs:45-156).

    Single-frame: the caller handles SkipFrame / frame concatenation
    (decode_all does both).
    """

    def __init__(self, source, decoder: FrameDecoder | None = None,
                 max_window_size: int | None = None):
        self.source = source
        self.decoder = decoder or FrameDecoder()
        if max_window_size is not None:
            self.decoder.set_max_window_size(max_window_size)
        self.decoder.init(source)

    def readable(self) -> bool:
        return True

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            chunks = []
            while True:
                c = self.read(1 << 20)
                if not c:
                    return b"".join(chunks)
                chunks.append(c)
        dec = self.decoder
        while dec.can_collect() < n and not dec._finished:
            dec.decode_blocks(self.source, BlockDecodingStrategy.UPTO_BYTES,
                              amount=n - dec.can_collect())
        return dec.read(n)

    def into_inner(self):
        return self.source

    def get_ref(self):
        return self.decoder


def decode_from_to(decoder: "FrameDecoder", source: bytes,
                   target: bytearray | memoryview) -> tuple:
    """Push-style decode (frame_decoder.rs:436-526 parity, C-API shaped):
    consume as much of `source` as fits complete decode units, write decoded
    bytes into `target`, and return (bytes_read, bytes_written). Partial
    headers/blocks/checksums are never consumed — the caller re-presents the
    unread suffix on the next call, exactly like the reference's re-read
    gating (frame_decoder.rs:476-489, split-checksum handling :462-512)."""
    buf = bytes(source)
    pos = 0
    written = 0
    tv = memoryview(target)

    if decoder.header is None or decoder.is_finished():
        try:
            src = io.BytesIO(buf)
            decoder.init(src)
            pos = src.tell()
        except NotEnoughBytes:
            return 0, 0

    while not decoder._finished:
        if pos + 3 > len(buf):
            break
        bh = blocks_mod.parse_block_header(buf[pos:pos + 3])
        need = 3 + (1 if bh.block_type == constants.BLOCK_RLE else bh.block_size)
        if bh.last_block and decoder.header.content_checksum:
            need += 4
        if pos + need > len(buf):
            break
        src = io.BytesIO(buf[pos:pos + need])
        decoder.decode_blocks(src, BlockDecodingStrategy.UPTO_BLOCKS, amount=1)
        pos += src.tell()
        chunk = decoder.read(len(tv) - written)
        tv[written:written + len(chunk)] = chunk
        written += len(chunk)
    if decoder._finished:
        chunk = decoder.read(len(tv) - written)
        tv[written:written + len(chunk)] = chunk
        written += len(chunk)
    return pos, written


def decode_all_to_vec(data, config: CodecConfig | None = None,
                      dicts: "list[Dictionary] | None" = None) -> bytes:
    """Alias of decode_all returning a fresh buffer
    (frame_decoder.rs:588-607)."""
    return decode_all(data, config, dicts)


def decode_frame(data, config: CodecConfig | None = None,
                 dictionary: Dictionary | None = None) -> bytes:
    """One-shot decode of a single frame from bytes; returns decoded content."""
    src = io.BytesIO(bytes(data))
    dec = FrameDecoder(config)
    if dictionary is not None:
        dec.force_dict(dictionary)
    dec.init(src)
    dec.decode_blocks(src, BlockDecodingStrategy.ALL)
    return dec.collect()


def decode_all(data, config: CodecConfig | None = None,
               dicts: "list[Dictionary] | None" = None) -> bytes:
    """Decode every frame in `data`, skipping skippable frames
    (frame_decoder.rs:538-574)."""
    data = bytes(data)
    src = io.BytesIO(data)
    dec = FrameDecoder(config)
    for d in dicts or []:
        dec.add_dict(d)
    out = bytearray()
    while src.tell() < len(data):
        try:
            dec.init(src)
        except SkipFrame as sf:
            target = src.tell() + sf.length
            if target > len(data):
                raise NotEnoughBytes(sf.length, len(data) - src.tell(),
                                     "skippable frame content")
            src.seek(target)
            continue
        while not dec._finished:
            dec.decode_blocks(src, BlockDecodingStrategy.UPTO_BYTES, amount=1 << 20)
            out.extend(dec.scratch.buffer.drain_to_window_size()
                       if not dec._finished else b"")
        out.extend(dec.collect())
    return bytes(out)
