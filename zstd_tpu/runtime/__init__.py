"""Native host runtime bindings (ctypes over a g++-built shared library).

Builds zstd_tpu/runtime/native.cpp on first import (cached .so next to the
source); every entry point has a pure-Python fallback so the framework works
without a compiler.
"""

import ctypes
import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native.cpp")
_SO = os.path.join(_HERE, "_native.so")

_lib = None


def _build() -> bool:
    try:
        src_mtime = os.path.getmtime(_SRC)
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= src_mtime:
            return True
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-o", _SO, _SRC]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Returns the loaded ctypes library, or None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.zt_xxh64.restype = ctypes.c_uint64
    lib.zt_xxh64.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.zt_execute_sequences.restype = ctypes.c_int64
    lib.zt_execute_sequences.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64]
    lib.zt_scan_frames.restype = ctypes.c_int64
    lib.zt_scan_frames.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64]
    lib.zt_fse_sim_bits.restype = ctypes.c_int64
    lib.zt_fse_sim_bits.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
    lib.zt_xxh64_init.restype = None
    lib.zt_xxh64_init.argtypes = [ctypes.c_void_p]
    lib.zt_xxh64_update.restype = None
    lib.zt_xxh64_update.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_uint64]
    lib.zt_xxh64_digest.restype = ctypes.c_uint64
    lib.zt_xxh64_digest.argtypes = [ctypes.c_void_p]
    lib.zt_decode_sequences.restype = ctypes.c_int64
    lib.zt_decode_sequences.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.zt_fse_build_table.restype = ctypes.c_int64
    lib.zt_fse_build_table.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.zt_huff_decode.restype = ctypes.c_int64
    lib.zt_huff_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64]
    lib.zt_execute_append.restype = ctypes.c_int64
    lib.zt_execute_append.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
    lib.zt_find_sequences.restype = ctypes.c_int64
    lib.zt_find_sequences.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64]
    lib.zt_make_triples.restype = ctypes.c_int64
    lib.zt_make_triples.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.zt_encode_seq_stream.restype = ctypes.c_int64
    lib.zt_encode_seq_stream.argtypes = (
        [ctypes.c_void_p] * 3 + [ctypes.c_int64]
        + [ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p] * 2
        + [ctypes.c_int32] + [ctypes.c_void_p] * 3 + [ctypes.c_int32]
        + [ctypes.c_int32] + [ctypes.c_void_p] * 3 + [ctypes.c_int32]
        + [ctypes.c_int32] + [ctypes.c_void_p] * 3 + [ctypes.c_int32]
        + [ctypes.c_void_p, ctypes.c_int64])
    lib.zt_huff_encode_stream.restype = ctypes.c_int64
    lib.zt_huff_encode_stream.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64]
    lib.zt_fse_parse_packed.restype = ctypes.c_int64
    lib.zt_fse_parse_packed.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.zt_huff_parse.restype = ctypes.c_int64
    lib.zt_huff_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.zt_huff_enc_build.restype = ctypes.c_int64
    lib.zt_huff_enc_build.argtypes = [ctypes.c_void_p] * 5
    lib.zt_fse_enc_build.restype = ctypes.c_int64
    lib.zt_fse_enc_build.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.zt_compress_block2.restype = ctypes.c_int64
    lib.zt_compress_block2.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64]
    lib.zt_compress_frame.restype = ctypes.c_int64
    lib.zt_compress_frame.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64]
    lib.zt_enc_prof_read.restype = None
    lib.zt_enc_prof_read.argtypes = [ctypes.c_void_p]
    lib.zt_walk_frame.restype = ctypes.c_int64
    lib.zt_walk_frame.argtypes = (
        [ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p]
        + [ctypes.c_void_p, ctypes.c_int64] * 4
        + [ctypes.c_void_p] * 4 + [ctypes.c_int64]
        + [ctypes.c_void_p] * 4 + [ctypes.c_int64])
    _lib = lib
    return _lib


class Xxh64Native:
    """Streaming xxHash64 over the native state (seed 0).

    Interface-compatible with utils.xxhash64.Xxh64; only instantiate when
    get_lib() is non-None."""

    __slots__ = ("_lib", "_state")

    def __init__(self):
        self._lib = get_lib()
        self._state = ctypes.create_string_buffer(128)  # >= sizeof state
        self._lib.zt_xxh64_init(self._state)

    def update(self, data) -> None:
        data = bytes(data)
        self._lib.zt_xxh64_update(self._state, data, len(data))

    def digest(self) -> int:
        return int(self._lib.zt_xxh64_digest(self._state))


def xxh64(data: bytes) -> int | None:
    lib = get_lib()
    if lib is None:
        return None
    return int(lib.zt_xxh64(bytes(data), len(data)))


def execute_sequences(ll, ml, offset, literals: bytes, dict_content: bytes,
                      out_cap: int) -> bytes | None:
    """Host LZ77 executor; arrays are int32 numpy arrays."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    ll = np.ascontiguousarray(ll, np.int32)
    ml = np.ascontiguousarray(ml, np.int32)
    offset = np.ascontiguousarray(offset, np.int32)
    out = np.zeros(out_cap, np.uint8)
    n = lib.zt_execute_sequences(
        ll.ctypes.data, ml.ctypes.data, offset.ctypes.data, len(ll),
        bytes(literals), len(literals), bytes(dict_content),
        len(dict_content), out.ctypes.data, out_cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def scan_frames(data: bytes, max_frames: int | None = None):
    """Returns list of (offset, length, kind) or None; kind 1 = skippable."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    if max_frames is None:
        max_frames = len(data) // 8 + 8  # smallest frame/skippable >= 8 bytes
    offs = np.zeros(max_frames, np.int64)
    lens = np.zeros(max_frames, np.int64)
    kinds = np.zeros(max_frames, np.int32)
    n = lib.zt_scan_frames(bytes(data), len(data), offs.ctypes.data,
                           lens.ctypes.data, kinds.ctypes.data, max_frames)
    if n < 0:
        return None
    return [(int(offs[i]), int(lens[i]), int(kinds[i])) for i in range(n)]


_SEQ_CODE_TABLES = None


def _seq_code_tables():
    """The spec LL/ML code->(baseline, extra bits) tables as i32 arrays."""
    global _SEQ_CODE_TABLES
    if _SEQ_CODE_TABLES is None:
        import numpy as np

        from zstd_tpu.common import constants as C

        _SEQ_CODE_TABLES = (
            np.asarray(C.LL_CODE_BASELINE, np.int32),
            np.asarray(C.LL_CODE_EXTRA_BITS, np.int32),
            np.asarray(C.ML_CODE_BASELINE, np.int32),
            np.asarray(C.ML_CODE_EXTRA_BITS, np.int32),
        )
    return _SEQ_CODE_TABLES


def decode_sequences(stream: bytes, nseq: int, ll_table, of_table, ml_table,
                     hist: list):
    """Native interleaved tANS sequence decode with repcode resolution.

    Tables are oracle FSETable instances. Returns (ll, ml, offset) int32
    arrays (offsets fully resolved, `hist` updated in place), an int error
    code on malformed input, or None when the library is unavailable."""
    import numpy as np

    from zstd_tpu.common import constants as C

    lib = get_lib()
    if lib is None:
        return None
    ll_cb, ll_eb, ml_cb, ml_eb = _seq_code_tables()
    out_ll = np.empty(nseq, np.int32)
    out_ml = np.empty(nseq, np.int32)
    out_of = np.empty(nseq, np.int32)
    h = np.asarray(hist, np.int64)
    n = lib.zt_decode_sequences(
        bytes(stream), len(stream), nseq,
        ll_table.symbol.ctypes.data, ll_table.base_line.ctypes.data,
        ll_table.num_bits.ctypes.data, ll_table.acc_log,
        of_table.symbol.ctypes.data, of_table.base_line.ctypes.data,
        of_table.num_bits.ctypes.data, of_table.acc_log,
        ml_table.symbol.ctypes.data, ml_table.base_line.ctypes.data,
        ml_table.num_bits.ctypes.data, ml_table.acc_log,
        ll_cb.ctypes.data, ll_eb.ctypes.data, C.LL_MAX_CODE,
        ml_cb.ctypes.data, ml_eb.ctypes.data, C.ML_MAX_CODE,
        out_ll.ctypes.data, out_ml.ctypes.data, out_of.ctypes.data,
        h.ctypes.data)
    if n < 0:
        return int(n)
    hist[:] = [int(h[0]), int(h[1]), int(h[2])]
    return out_ll, out_ml, out_of


def fse_build_table(probs, acc_log: int):
    """Native FSE decode-table build. Returns (symbol, base_line, num_bits)
    arrays, an int error code, or None when the library is unavailable."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(probs, np.int32)
    size = 1 << acc_log
    sym = np.zeros(size, np.uint8)
    base = np.zeros(size, np.uint16)
    nb = np.zeros(size, np.uint8)
    r = lib.zt_fse_build_table(p.ctypes.data, len(p), acc_log,
                               sym.ctypes.data, base.ctypes.data,
                               nb.ctypes.data)
    if r < 0:
        return int(r)
    return sym, base, nb


def huff_decode(stream: bytes, table, expected: int):
    """Native Huffman stream decode. Returns bytes, an int error code on
    malformed input, or None when the library is unavailable."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(max(expected, 1), np.uint8)
    n = lib.zt_huff_decode(
        bytes(stream), len(stream), table.symbol.ctypes.data,
        table.num_bits.ctypes.data, table.max_bits, out.ctypes.data, expected)
    if n < 0:
        return int(n)
    return out[:expected].tobytes()


def execute_append(buf: bytearray, base: int, ll, ml, offset,
                   literals: bytes, dict_content: bytes):
    """Native LZ77 execution appending into `buf` (which already holds
    `base` bytes of window history; caller pre-extends to capacity).
    Returns the new total length, -1 on bounds violation, or None when the
    library is unavailable."""
    import ctypes as _ct

    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    ll = np.ascontiguousarray(ll, np.int32)
    ml = np.ascontiguousarray(ml, np.int32)
    offset = np.ascontiguousarray(offset, np.int32)
    view = (_ct.c_ubyte * len(buf)).from_buffer(buf)
    try:
        n = lib.zt_execute_append(
            ll.ctypes.data, ml.ctypes.data, offset.ctypes.data, len(ll),
            bytes(literals), len(literals), bytes(dict_content),
            len(dict_content), _ct.addressof(view), base, len(buf))
    finally:
        del view  # release the buffer export so the bytearray can resize
    return int(n)


_FIND_TABLE = None


def find_sequences_arrays(block: bytes):
    """Native greedy match finder over a standalone block. Returns
    (lit_len, offset, match_len) int32 arrays (trailing-literals record has
    offset == match_len == 0), or None when the library is unavailable."""
    global _FIND_TABLE
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    if _FIND_TABLE is None:
        _FIND_TABLE = np.empty(1 << 16, np.int32)
    _FIND_TABLE.fill(-1)
    return find_sequences_arrays_ctx(bytes(block), 0, 0, len(block),
                                     _FIND_TABLE, 1 << 62)


def find_sequences_arrays_ctx(buf, base: int, lo: int, hi: int,
                              table, max_off: int):
    """Native match finder over block [lo, hi) of a frame whose bytes from
    absolute position `base` are in `buf`. `table` (int32[1<<16], -1 init
    once per frame) carries candidates across blocks, so matches reach up
    to max_off bytes back across block boundaries."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    n = hi - lo
    cap = n // 3 + 4  # a match consumes >= 5 bytes; literals-only is 1 rec
    ll = np.empty(cap, np.int32)
    off = np.empty(cap, np.int32)
    ml = np.empty(cap, np.int32)
    m = lib.zt_find_sequences(bytes(buf), base, lo, hi, ll.ctypes.data,
                              off.ctypes.data, ml.ctypes.data, cap,
                              table.ctypes.data, max_off)
    if m < 0:
        return None
    return ll[:m], off[:m], ml[:m]


def make_triples(lit_len, offset, match_len, hist):
    """Native repcode-exploiting triple builder (hist mutated in place when
    given). Returns (ll, ml, of_value) int32 arrays or None."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    ll = np.ascontiguousarray(lit_len, np.int32)
    off = np.ascontiguousarray(offset, np.int32)
    ml = np.ascontiguousarray(match_len, np.int32)
    n = len(ll)
    o_ll = np.empty(n, np.int32)
    o_ml = np.empty(n, np.int32)
    o_of = np.empty(n, np.int32)
    h = np.asarray(hist if hist is not None else [0, 0, 0], np.int64)
    m = lib.zt_make_triples(ll.ctypes.data, off.ctypes.data, ml.ctypes.data,
                            n, h.ctypes.data, 0 if hist is None else 1,
                            o_ll.ctypes.data, o_ml.ctypes.data,
                            o_of.ctypes.data)
    if hist is not None:
        hist[:] = [int(h[0]), int(h[1]), int(h[2])]
    return o_ll[:m], o_ml[:m], o_of[:m]


def encode_seq_stream(ll, ml, ofv, kinds) -> bytes | None:
    """Native interleaved FSE sequence bitstream. `kinds` is a dict
    {"ll"|"of"|"ml": None (RLE mode) or FSEEncodeTable}. Returns the
    stream bytes or None when unavailable."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    ll = np.ascontiguousarray(ll, np.int32)
    ml = np.ascontiguousarray(ml, np.int32)
    ofv = np.ascontiguousarray(ofv, np.int32)
    n = len(ll)
    ll_cb, ll_eb, ml_cb, ml_eb = _seq_code_tables()
    zero = np.zeros(1, np.int32)

    def args_for(t):
        if t is None:
            return [0, zero.ctypes.data, zero.ctypes.data,
                    zero.ctypes.data, 0]
        dnb = np.ascontiguousarray(t.delta_nb_bits, np.int32)
        dfs = np.ascontiguousarray(t.delta_find_state, np.int32)
        ns = np.ascontiguousarray(t.next_state, np.int32)
        # keep alive until the call
        keep.extend((dnb, dfs, ns))
        return [1, dnb.ctypes.data, dfs.ctypes.data, ns.ctypes.data,
                t.table_log]

    keep = []
    cap = n * 16 + 64  # worst case ~ (9*3 + 16+16+31) bits < 16 bytes/seq
    out = np.empty(cap, np.uint8)
    r = lib.zt_encode_seq_stream(
        ll.ctypes.data, ml.ctypes.data, ofv.ctypes.data, n,
        ll_cb.ctypes.data, len(ll_cb), ll_eb.ctypes.data,
        ml_cb.ctypes.data, len(ml_cb), ml_eb.ctypes.data,
        *args_for(kinds["ll"]), *args_for(kinds["of"]),
        *args_for(kinds["ml"]),
        out.ctypes.data, cap)
    if r < 0:
        return None
    return out[:r].tobytes()


def huff_encode_stream(data: bytes, codes, lens) -> bytes | None:
    """Native Huffman stream packer (reverse order + sentinel + pad)."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    c = np.ascontiguousarray(codes, np.uint32)
    ln = np.ascontiguousarray(lens, np.uint8)
    cap = len(data) * 2 + 16
    out = np.empty(max(cap, 16), np.uint8)
    r = lib.zt_huff_encode_stream(bytes(data), len(data), c.ctypes.data,
                                  ln.ctypes.data, out.ctypes.data, cap)
    if r < 0:
        return None
    return out[:r].tobytes()


def fse_sim_bits(codes, delta_nb_bits, delta_find_state, next_state,
                 init_state: int, table_log: int) -> int | None:
    """Exact FSE bit cost of a code stream (None -> caller's Python path)."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    c = np.ascontiguousarray(codes, np.int32)
    nb = np.ascontiguousarray(delta_nb_bits, np.int32)
    fs = np.ascontiguousarray(delta_find_state, np.int32)
    ns = np.ascontiguousarray(next_state, np.int32)
    return int(lib.zt_fse_sim_bits(
        c.ctypes.data, len(c), nb.ctypes.data, fs.ctypes.data,
        ns.ctypes.data, init_state, table_log))


def fse_parse_packed(data: bytes, max_log: int, width: int):
    """Parse an FSE table description straight into the packed device row.

    Returns (row u32[width], acc_log, bytes_consumed), a negative int on
    malformed input (caller re-parses on the Python path for the typed
    error), or None when the library is unavailable."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    row = np.empty(width, np.uint32)
    meta = np.empty(3, np.int32)
    r = lib.zt_fse_parse_packed(bytes(data), len(data), max_log, width,
                                row.ctypes.data, meta.ctypes.data)
    if r < 0:
        return int(r)
    return row, int(meta[0]), int(meta[1])


def huff_parse(data: bytes):
    """Parse a full Huffman table description into the device-ready forms.

    Returns (lut u16[2048], bnd i32[16], syms i32[64], max_bits, nranks,
    bytes_consumed), a negative int on malformed input, or None when the
    library is unavailable."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    lut = np.empty(2048, np.uint16)
    bnd = np.empty(16, np.int32)
    syms = np.empty(64, np.int32)
    meta = np.empty(3, np.int32)
    r = lib.zt_huff_parse(bytes(data), len(data), lut.ctypes.data,
                          bnd.ctypes.data, syms.ctypes.data,
                          meta.ctypes.data)
    if r < 0:
        return int(r)
    return lut, bnd, syms, int(meta[0]), int(meta[1]), int(meta[2])


def huff_enc_build(counts):
    """Native package-merge + canonical Huffman codes (encoder side).

    Returns (weights list, codes u16, lens u8, max_bits) or None/negative
    (caller's Python path handles the error parity)."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    c = np.ascontiguousarray(counts, np.int64)
    codes = np.empty(256, np.uint32)
    lens = np.empty(256, np.uint8)
    weights = np.empty(256, np.int32)
    meta = np.empty(2, np.int32)
    r = lib.zt_huff_enc_build(c.ctypes.data, codes.ctypes.data,
                              lens.ctypes.data, weights.ctypes.data,
                              meta.ctypes.data)
    if r < 0:
        return int(r)
    n = int(meta[1]) + 1
    return (list(weights[:n]), codes[:n].astype(np.uint16), lens[:n].copy(),
            int(meta[0]))


class BlockCompressor:
    """Streaming per-block native compressor (frame_enc.py::_write_block
    fast path). Holds the frame's repeat-offset history and cross-block
    Huffman (Treeless reuse) state; `compress_block` mirrors
    block_enc.py::compress_block with commit-on-emit semantics owned by
    the caller via `commit()`."""

    __slots__ = ("_lib", "_hist", "_huff", "_hist_c", "_huff_c", "_out",
                 "_table")

    def __init__(self):
        import numpy as np

        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._hist = np.array([1, 4, 8], np.int64)
        self._huff = np.zeros(771, np.int32)
        self._hist_c = np.empty(3, np.int64)
        self._huff_c = np.empty(771, np.int32)
        self._out = None
        # frame-lifetime matcher table (one BlockCompressor per frame):
        # carries candidates across blocks like the one-shot zt_compress_frame
        self._table = np.full(1 << 16, -1, np.int32)

    def compress_block(self, buf, base: int = 0, lo: int = 0,
                       hi: int | None = None,
                       max_off: int = 1 << 62) -> bytes | None:
        """Compress block [lo, hi) of a frame whose bytes from absolute
        position `base` are in `buf` (a bare block is `compress_block(b)`).
        Returns compressed content strictly smaller than the block, or
        None when compression does not pay / native path errored (the
        caller emits Raw or falls back to Python)."""
        import numpy as np

        if hi is None:
            hi = len(buf)
        n = hi - lo
        cap = 2 * n + 4096
        if self._out is None or len(self._out) < cap:
            self._out = np.empty(cap, np.uint8)
        np.copyto(self._hist_c, self._hist)
        np.copyto(self._huff_c, self._huff)
        r = self._lib.zt_compress_block2(
            bytes(buf), base, lo, hi, self._table.ctypes.data, max_off,
            self._hist_c.ctypes.data,
            self._huff_c.ctypes.data, self._out.ctypes.data, cap)
        if r <= 0:
            return None
        return self._out[:r].tobytes()

    def commit(self) -> None:
        """Adopt the state mutations of the last compress_block call
        (called only when the compressed block is actually emitted)."""
        import numpy as np

        np.copyto(self._hist, self._hist_c)
        np.copyto(self._huff, self._huff_c)


def compress_frame(data: bytes, window_log: int, checksum: bool,
                   level: int, write_fcs: bool = False) -> bytes | None:
    """One-shot native frame compressor (frame_enc.py::compress with no
    matcher). level: 0 = UNCOMPRESSED, 1 = FASTEST. Returns the frame or
    None when the library is unavailable / errored (caller's Python path
    is the fallback and the parity oracle)."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    data = bytes(data)
    cap = len(data) + (len(data) >> 6) + 4096
    out = np.empty(cap, np.uint8)
    r = lib.zt_compress_frame(data, len(data), window_log,
                              1 if checksum else 0, level,
                              1 if write_fcs else 0,
                              out.ctypes.data, cap)
    if r < 0:
        return None
    return out[:r].tobytes()


def enc_prof_read():
    """Read+reset the native encode stage profile (dev-only): ns spent in
    {find_sequences, literal gather, lit_section, triples+seq_section}
    since the last read."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros(4, np.int64)
    lib.zt_enc_prof_read(out.ctypes.data)
    return {"find_ns": int(out[0]), "litgather_ns": int(out[1]),
            "lit_section_ns": int(out[2]), "seq_section_ns": int(out[3])}


def fse_enc_build(probs, table_log: int):
    """Native ANS encode-table build (fse_enc.py::build_encode_table)."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(probs, np.int32)
    size = 1 << table_log
    next_state = np.empty(size, np.uint16)
    dnb = np.empty(256, np.uint32)
    dfs = np.empty(256, np.int32)
    r = lib.zt_fse_enc_build(p.ctypes.data, len(p), table_log,
                             next_state.ctypes.data, dnb.ctypes.data,
                             dfs.ctypes.data)
    if r < 0:
        return int(r)
    return next_state, dnb, dfs


class FrameWalker:
    """One-call-per-frame native frame walk (models/framer.py fast path).

    Owns reusable descriptor buffers; walk() returns a dict of array views
    valid until the next call, None when the native path cannot handle the
    frame (dictionary frames, frames that would chain into block groups,
    malformed input — the Python walk is the fallback and the error
    oracle)."""

    def __init__(self):
        import numpy as np

        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._np = np
        self._fm = np.zeros(24, np.int64)
        self._alloc(1024, 64, 64)

    def _alloc(self, nops: int, nht: int, nfse: int):
        np = self._np
        self._nops, self._nht, self._nfse = nops, nht, nfse
        self._litops = np.empty((nops, 4), np.int32)
        self._syn = np.empty((nops, 4), np.int32)
        self._hl = np.empty((4 * nops, 6), np.int32)
        self._sl = np.empty((nops, 14), np.int32)
        self._hluts = np.empty((nht, 2048), np.uint16)
        self._hbnd = np.empty((nht, 16), np.int32)
        self._hsyms = np.empty((nht, 64), np.int32)
        self._hmeta = np.empty((nht, 3), np.int32)
        self._lltab = np.empty((nfse, 512), np.uint32)
        self._oftab = np.empty((nfse, 256), np.uint32)
        self._mltab = np.empty((nfse, 512), np.uint32)
        self._logs = np.empty(3 * nfse, np.int32)

    def walk(self, data: bytes):
        fm = self._fm
        while True:
            r = self._lib.zt_walk_frame(
                data, len(data), fm.ctypes.data,
                self._litops.ctypes.data, self._nops,
                self._syn.ctypes.data, self._nops,
                self._hl.ctypes.data, 4 * self._nops,
                self._sl.ctypes.data, self._nops,
                self._hluts.ctypes.data, self._hbnd.ctypes.data,
                self._hsyms.ctypes.data, self._hmeta.ctypes.data, self._nht,
                self._lltab.ctypes.data, self._oftab.ctypes.data,
                self._mltab.ctypes.data, self._logs.ctypes.data, self._nfse)
            if r == -101:  # capacity — grow and retry (bounded)
                if self._nops > len(data) + 1024:
                    return None
                self._alloc(4 * self._nops, 4 * self._nht, 4 * self._nfse)
                continue
            if r != 0:
                return None
            return {
                "fm": fm,
                "litops": self._litops[:fm[6]],
                "syn": self._syn[:fm[7]],
                "hl": self._hl[:fm[8]],
                "sl": self._sl[:fm[9]],
                "hluts": self._hluts, "hbnd": self._hbnd,
                "hsyms": self._hsyms, "hmeta": self._hmeta,
                "lltab": self._lltab, "oftab": self._oftab,
                "mltab": self._mltab, "logs": self._logs,
                "nfse": self._nfse,
            }
