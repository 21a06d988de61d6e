"""CLI streaming compress/decompress (cli/src/main.rs + progress.rs parity):
file->file in bounded memory, multi-frame + skippable handling, interop."""

import io
import os

import numpy as np
import zstandard

from zstd_tpu.cli import ProgressReader, main


def _data(n=1 << 20, seed=2):
    rng = np.random.RandomState(seed)
    parts = []
    size = 0
    while size < n:
        p = (b"stream cli %d " % rng.randint(999)) * rng.randint(5, 40)
        parts.append(p)
        size += len(p)
    return b"".join(parts)[:n]


def test_cli_compress_decompress_roundtrip(tmp_path):
    data = _data()
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    z = tmp_path / "in.bin.zst"
    out = tmp_path / "out.bin"
    assert main(["compress", str(src), str(z), "-l", "1"]) == 0
    # cross-implementation check of the emitted file
    blob = z.read_bytes()
    assert zstandard.ZstdDecompressor().decompress(
        blob, max_output_size=len(data) + 64) == data
    assert main(["decompress", str(z), str(out)]) == 0
    assert out.read_bytes() == data


def test_cli_decompress_multiframe_and_skippable(tmp_path):
    data = _data(3 << 20, seed=7)
    c = zstandard.ZstdCompressor(level=19, write_checksum=True)
    skip = (0x184D2A50).to_bytes(4, "little") + (5).to_bytes(4, "little") + b"abcde"
    blob = (c.compress(data[:1 << 20]) + skip
            + c.compress(data[1 << 20:]))
    z = tmp_path / "mf.zst"
    z.write_bytes(blob)
    out = tmp_path / "mf.out"
    assert main(["decompress", str(z), str(out)]) == 0
    assert out.read_bytes() == data


def test_progress_reader_counts_and_reports():
    buf = io.BytesIO(b"x" * 100000)
    sink = io.StringIO()
    sink.isatty = lambda: True
    pr = ProgressReader(buf, 100000, "t", stream=sink)
    pr._last = -10  # force a report on first read
    while pr.read(8192):
        pass
    pr.finish()
    assert pr.done == 100000
    assert "MB/s" in sink.getvalue()


def test_cli_compress_content_size(tmp_path):
    data = _data(300_000, seed=5)
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    z = tmp_path / "in.bin.zst"
    assert main(["compress", str(src), str(z), "-l", "1", "-C"]) == 0
    blob = z.read_bytes()
    assert zstandard.get_frame_parameters(blob).content_size == len(data)
    assert zstandard.ZstdDecompressor().decompress(blob) == data
