"""Format constants of Zstandard (RFC 8878).

Parity: /root/reference/ruzstd/src/common/mod.rs:6-21 defines the same set
(MAGIC_NUM, MIN/MAX_WINDOW_SIZE, MAX_BLOCK_SIZE).
"""

# Frame magic number, little-endian u32 at the start of every zstd frame.
MAGIC_NUM = 0xFD2FB528

# Skippable frames: magic in [SKIPPABLE_MAGIC_MIN, SKIPPABLE_MAGIC_MAX].
SKIPPABLE_MAGIC_MIN = 0x184D2A50
SKIPPABLE_MAGIC_MAX = 0x184D2A5F

# Window size bounds from the spec.
MIN_WINDOW_SIZE = 1024
MAX_WINDOW_SIZE = (1 << 41) + 7 * (1 << 38)  # 3.75 TB

# A single block may never exceed 128 KiB (and never the window size).
MAX_BLOCK_SIZE = 128 * 1024

# Default cap a decoder enforces on the window to bound hostile allocations
# (reference: frame_decoder.rs:17-22 uses 100 MB).
DEFAULT_MAX_WINDOW_SIZE = 1024 * 1024 * 100

# Dictionary magic number (decoding/dictionary.rs:12).
DICT_MAGIC_NUM = 0xEC30A437

# FSE accuracy-log ceilings per stream type (sequence_section_decoder.rs:11-13,
# huff0_decoder.rs weight-table limit from the spec).
LL_MAX_LOG = 9
ML_MAX_LOG = 9
OF_MAX_LOG = 8
WEIGHTS_MAX_LOG = 6  # Huffman weights FSE table accuracy cap (RFC 8878 §4.2.1.2)

# Absolute FSE table ceiling used for buffer sizing: 1 << 9 entries.
FSE_MAX_TABLE_LOG = 9
FSE_MAX_TABLE_SIZE = 1 << FSE_MAX_TABLE_LOG

# Huffman: max code length 11 bits, up to 256 symbols (255 weights + implied).
HUF_MAX_BITS = 11
HUF_MAX_SYMBOLS = 256

# Initial repeat-offset history of every frame (RFC 8878 §3.1.1.5).
INITIAL_REPEAT_OFFSETS = (1, 4, 8)

# Block type tags (2-bit field in the 3-byte block header).
BLOCK_RAW = 0
BLOCK_RLE = 1
BLOCK_COMPRESSED = 2
BLOCK_RESERVED = 3

# Literals section type tags (2-bit field of the literals header).
LIT_RAW = 0
LIT_RLE = 1
LIT_COMPRESSED = 2
LIT_TREELESS = 3

# Sequence-section symbol compression modes (2-bit fields of the mode byte).
MODE_PREDEFINED = 0
MODE_RLE = 1
MODE_FSE = 2
MODE_REPEAT = 3

# --- Predefined FSE distributions (RFC 8878 §3.1.1.3.2.2) ------------------
# Reference keeps these at sequence_section_decoder.rs:418-442.

LL_DEFAULT_ACC_LOG = 6
LL_DEFAULT_DIST = (
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1,
)

ML_DEFAULT_ACC_LOG = 6
ML_DEFAULT_DIST = (
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1,
)

OF_DEFAULT_ACC_LOG = 5
OF_DEFAULT_DIST = (
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1,
)

# --- Literals-length and match-length code tables (RFC 8878 §3.1.1.3.2.1.1) -
# value baseline and number of extra bits per code.
# Codes 0..15 for LL are (code, 0 bits); 0..31 for ML are (code+3, 0 bits).

_LL_EXTRA = (
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3), (40, 3),
    (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10), (2048, 11),
    (4096, 12), (8192, 13), (16384, 14), (32768, 15), (65536, 16),
)
LL_CODE_BASELINE = tuple(i for i in range(16)) + tuple(b for b, _ in _LL_EXTRA)
LL_CODE_EXTRA_BITS = tuple(0 for _ in range(16)) + tuple(n for _, n in _LL_EXTRA)
LL_MAX_CODE = 35

_ML_EXTRA = (
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3), (59, 3),
    (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9), (1027, 10),
    (2051, 11), (4099, 12), (8195, 13), (16387, 14), (32771, 15), (65539, 16),
)
ML_CODE_BASELINE = tuple(i + 3 for i in range(32)) + tuple(b for b, _ in _ML_EXTRA)
ML_CODE_EXTRA_BITS = tuple(0 for _ in range(32)) + tuple(n for _, n in _ML_EXTRA)
ML_MAX_CODE = 52
