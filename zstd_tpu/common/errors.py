"""Typed error taxonomy.

Every malformed-input condition raises a typed exception, never an assertion
or an unstructured crash — this is the fuzz-hardened surface. Parity with the
20 error enums of the reference (/root/reference/ruzstd/src/decoding/errors.rs:14-1154),
collapsed into one exception tree with one class per failure domain.
"""


class ZstdError(Exception):
    """Base of every codec error."""


# --- decode-side domains -----------------------------------------------------

class FrameHeaderError(ZstdError):
    """Bad magic number, reserved descriptor bits, window-size violations."""


class SkipFrame(ZstdError):
    """A skippable frame was encountered; `length` is its content size.

    Mirrors FrameDecoderError::SkipFrame / ReadFrameHeaderError::SkipFrame —
    the caller decides whether to skip (decode_all does) or surface it.
    """

    def __init__(self, magic: int, length: int):
        super().__init__(f"skippable frame magic=0x{magic:08X} length={length}")
        self.magic = magic
        self.length = length


class WindowSizeError(FrameHeaderError):
    """Requested window exceeds the decoder's configured maximum."""

    def __init__(self, requested: int, maximum: int):
        super().__init__(f"window size {requested} exceeds max {maximum}")
        self.requested = requested
        self.maximum = maximum


class BlockHeaderError(ZstdError):
    """Reserved block type, block size above the 128 KiB cap, truncation."""


class BlockSizeError(BlockHeaderError):
    pass


class LiteralsSectionError(ZstdError):
    """Malformed literals-section header or payload."""


class HuffmanTableError(ZstdError):
    """Bad weight stream: too many weights, non-power-of-two completion,
    missing symbols, oversized code lengths."""


class HuffmanDecodeError(ZstdError):
    """Literal bitstream did not produce exactly the regenerated size."""


class FSETableError(ZstdError):
    """Bad table description: accuracy log over the cap, probabilities that
    do not sum to the table size, too many symbols."""


class SequencesHeaderError(ZstdError):
    """Malformed sequences-section header (varint forms, mode byte)."""


class SequenceDecodeError(ZstdError):
    """Interleaved tANS loop failure: missing RLE byte, repeat mode without a
    previous table, bitstream over/underrun (ExtraBits / NotEnoughBytes)."""


class SequenceExecutionError(ZstdError):
    """Match offset reaches beyond window/dictionary, zero offset,
    literals exhausted."""


class DecodeBufferError(ZstdError):
    """Window buffer misuse (offset 0 or beyond buffered history)."""


class DictionaryError(ZstdError):
    """Bad dictionary blob or dictionary id not registered."""


class DictNotProvided(DictionaryError):
    def __init__(self, dict_id: int):
        super().__init__(f"frame requires dictionary id={dict_id} which was not provided")
        self.dict_id = dict_id


class ChecksumMismatch(ZstdError):
    def __init__(self, expected: int, got: int):
        super().__init__(f"content checksum mismatch: frame says 0x{expected:08X}, computed 0x{got:08X}")
        self.expected = expected
        self.got = got


class TargetTooSmall(ZstdError):
    """decode_all output buffer cannot hold the decoded bytes."""


class NotEnoughBytes(ZstdError):
    """Input ended before a complete header/payload could be read."""

    def __init__(self, need: int, have: int, what: str = "input"):
        super().__init__(f"need {need} bytes of {what}, have {have}")
        self.need = need
        self.have = have


class BitstreamError(ZstdError):
    """Reverse-bitstream framing violations: all-zero padding byte, more
    than 8 padding bits, stream exhausted with bits still owed."""


# --- encode-side domains -----------------------------------------------------

class EncodeError(ZstdError):
    pass


class MatchGeneratorError(EncodeError):
    pass
