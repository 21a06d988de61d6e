"""The native C++ decode hot path must be bit-identical to the pure-Python
oracle (which is the line-by-line parity reference for
/root/reference/ruzstd). Runs the whole decode corpus through both paths in
one process: ZT_NO_NATIVE=1 flips every native gate at call time, and the
import-time xxhash selection is exercised separately."""

import glob
import os
import subprocess
import sys

import pytest

from tests.conftest import REFERENCE_ROOT, requires_reference
from zstd_tpu.common.errors import ZstdError

CORPUS = os.path.join(REFERENCE_ROOT, "decodecorpus_files")
FUZZ_DIR = os.path.join(REFERENCE_ROOT, "fuzz", "artifacts")


@requires_reference
def test_native_vs_python_corpus(monkeypatch):
    from zstd_tpu.oracle import decode_all

    files = sorted(glob.glob(CORPUS + "/*.zst"))
    assert files
    for zfile in files:
        with open(zfile, "rb") as f:
            data = f.read()
        monkeypatch.delenv("ZT_NO_NATIVE", raising=False)
        native = decode_all(data)
        monkeypatch.setenv("ZT_NO_NATIVE", "1")
        python = decode_all(data)
        assert native == python, zfile


@requires_reference
def test_native_rejects_fuzz_artifacts_like_python(monkeypatch):
    """Both paths must reject every fuzz artifact with a typed error."""
    from zstd_tpu.oracle import decode_all

    files = sorted(glob.glob(FUZZ_DIR + "/decode/*"))
    assert files
    for path in files:
        with open(path, "rb") as f:
            data = f.read()
        for env in (None, "1"):
            if env is None:
                monkeypatch.delenv("ZT_NO_NATIVE", raising=False)
            else:
                monkeypatch.setenv("ZT_NO_NATIVE", env)
            try:
                decode_all(data)
            except ZstdError:
                pass  # typed rejection is the contract; success is also
                # allowed (some artifacts are valid frames that once crashed)


def test_python_xxh64_matches_native():
    """Import-time hasher selection: the pure-Python class must agree with
    the native streaming state on split updates."""
    from zstd_tpu.runtime import get_lib
    from zstd_tpu.utils.xxhash64 import PyXxh64

    if get_lib() is None:
        pytest.skip("native runtime unavailable")
    from zstd_tpu.runtime import Xxh64Native

    data = bytes(range(256)) * 41
    for splits in ((), (1,), (31, 32, 33), (7, 200, 1000)):
        a, b = PyXxh64(), Xxh64Native()
        pos = 0
        for s in splits:
            a.update(data[pos:pos + s])
            b.update(data[pos:pos + s])
            pos += s
        a.update(data[pos:])
        b.update(data[pos:])
        assert a.digest() == b.digest()


def test_decode_works_without_native(tmp_path):
    """ZT_NO_NATIVE=1 from process start (import-time selection included)."""
    code = (
        "import zstandard, io\n"
        "from zstd_tpu.oracle import decode_all\n"
        "data = bytes(range(256)) * 1000\n"
        "z = zstandard.ZstdCompressor(level=3).compress(data)\n"
        "assert decode_all(z) == data\n"
        "print('ok')\n"
    )
    env = dict(os.environ, ZT_NO_NATIVE="1", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], cwd="/root/repo",
                         env=env, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0 and "ok" in out.stdout, out.stderr


def test_native_encoder_byte_identical(monkeypatch):
    """The native encode hot path (match finder, repcode triples, FSE
    sequence stream, Huffman stream packer) must produce byte-identical
    frames to the pure-Python encoder."""
    import random

    import zstandard

    from zstd_tpu.encoding.frame_enc import compress_to_vec
    from zstd_tpu.runtime import get_lib

    if get_lib() is None:
        pytest.skip("native runtime unavailable")
    rng = random.Random(5)
    words = ["the", "of", "compression", "entropy", "frame", "offset"]
    payloads = [
        b"",
        b"a" * 50000,
        bytes(rng.getrandbits(8) for _ in range(30000)),
        (" ".join(rng.choice(words) for _ in range(50000))).encode(),
    ]
    for p in payloads:
        monkeypatch.delenv("ZT_NO_NATIVE", raising=False)
        zn = compress_to_vec(p)
        monkeypatch.setenv("ZT_NO_NATIVE", "1")
        zp = compress_to_vec(p)
        assert zn == zp, f"payload len {len(p)}"
        assert zstandard.ZstdDecompressor().decompress(
            zn, max_output_size=len(p) + 64) == p


def test_walk_matches_python_framer():
    """The one-call native frame walk (zt_walk_frame) must produce a
    DeviceBatch byte-identical to the pure-Python walk, across zstd levels,
    checksums, the reference corpus, and our own multi-block output."""
    import dataclasses
    import glob
    import os

    import numpy as np
    import zstandard

    from bench import make_corpus
    from zstd_tpu.encoding.frame_enc import compress_to_vec
    from zstd_tpu.models.framer import Framer
    from zstd_tpu.models.splitter import split_frames

    def build(frames):
        fr = Framer()
        for i, z in enumerate(frames):
            fr.add_frame(bytes(z), i)
        return fr.build()

    def check(frames, label):
        bn = build(frames)
        os.environ["ZT_NO_NATIVE"] = "1"
        try:
            bp = build(frames)
        finally:
            del os.environ["ZT_NO_NATIVE"]
        for f in dataclasses.fields(bn):
            va, vb = getattr(bn, f.name), getattr(bp, f.name)
            if f.name == "metas":
                for ma, mb in zip(va, vb):
                    assert dataclasses.asdict(ma) == dataclasses.asdict(mb), \
                        (label, ma, mb)
            elif isinstance(va, np.ndarray):
                assert va.shape == vb.shape and (va == vb).all(), \
                    (label, f.name)
            else:
                assert va == vb, (label, f.name)

    pay = make_corpus(2)
    for lvl in (1, 3, 19):
        comp = zstandard.ZstdCompressor(level=lvl, write_checksum=(lvl != 3))
        check([comp.compress(p) for p in pay], f"level{lvl}")
    frames = []
    for f in sorted(glob.glob(
            "/root/reference/ruzstd/decodecorpus_files/*.zst")):
        frames.extend(split_frames(open(f, "rb").read()))
    if frames:
        check(frames, "decodecorpus")
    check([compress_to_vec(b"".join(make_corpus(1, seed=5)))], "own")
