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
    _lib = lib
    return _lib


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
