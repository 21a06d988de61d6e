"""Compression-ratio regression gates (BASELINE.md targets).

1. Fastest-level total over the reference decodecorpus originals must stay
   at or below the measured round-1 total AND below libzstd level-1's total
   (the reference's own bar: "size <= ruzstd at Fastest",
   /root/reference/Readme.md:42-57).
2. The dictionary trainer must land within 5% of a libzstd-trained dict on
   the same collection (reference achieves 0.2%,
   /root/reference/Readme.md:46-54).
3. Treeless literal reuse must fire on multi-block frames and never lose
   to the always-fresh-table encoding.
"""

import glob
import os

import pytest
import zstandard

from zstd_tpu.common import constants as C
from zstd_tpu.common.config import CompressionLevel
from zstd_tpu.encoding.frame_enc import compress_to_vec
from zstd_tpu.oracle import blocks as blocks_mod
from zstd_tpu.oracle import frame as frame_mod

CORPUS = "/root/reference/ruzstd/decodecorpus_files"

# measured with this harness at the round-1 snapshot (34673df); VERDICT's
# 5,227,598 came from a slightly different harness. Creeping above the
# current number by >0.1% flags an unintended size regression.
ROUND1_TOTAL = 5_227_637
# round 2: cross-block matcher window + content-bounded window_log
CURRENT_TOTAL = 4_989_862


def _originals():
    files = [f for f in sorted(glob.glob(os.path.join(CORPUS, "*")))
             if not f.endswith(".zst")]
    assert len(files) > 50
    return files


def test_corpus_fastest_total_vs_baselines():
    ours = 0
    libz = 0
    z1 = zstandard.ZstdCompressor(level=1, write_checksum=False)
    for f in _originals():
        with open(f, "rb") as fh:
            data = fh.read()
        ours += len(compress_to_vec(data, CompressionLevel.FASTEST))
        libz += len(z1.compress(data))
    assert ours <= ROUND1_TOTAL, f"ratio regression vs round 1: {ours}"
    assert ours <= libz, f"worse than libzstd-1: {ours} vs {libz}"
    assert ours <= CURRENT_TOTAL * 1.001, f"creeping regression: {ours}"


def _collection():
    docs = []
    for i in range(150):
        docs.append((
            b"[Unit]\nDescription=Service %d\nAfter=network.target\n"
            b"[Service]\nExecStart=/usr/bin/daemon --id %d --mode %s\n"
            b"Restart=on-failure\nUser=svc%d\n[Install]\n"
            b"WantedBy=multi-user.target\n"
            % (i, i * 7, [b"fast", b"safe", b"debug"][i % 3], i % 10)))
    return docs


def test_dict_quality_within_5pct_of_libzstd():
    from zstd_tpu.models.dict_trainer import (DictParams,
                                              create_raw_dict_from_source)

    docs = _collection()
    ours = create_raw_dict_from_source(docs, DictParams(dict_size=8 * 1024))
    try:
        theirs = zstandard.train_dictionary(8 * 1024, docs).as_bytes()
    except zstandard.ZstdError:
        pytest.skip("libzstd trainer rejected the collection")

    def total_with(dict_bytes, dict_type):
        zd = zstandard.ZstdCompressionDict(dict_bytes, dict_type=dict_type)
        comp = zstandard.ZstdCompressor(level=3, dict_data=zd)
        return sum(len(comp.compress(x)) for x in docs)

    t_ours = total_with(ours, zstandard.DICT_TYPE_RAWCONTENT)
    t_libz = total_with(theirs, zstandard.DICT_TYPE_AUTO)
    # reference's own quality bar is 0.2% (Readme.md:46-54); gate at 5%
    assert t_ours <= t_libz * 1.05, (t_ours, t_libz)


def _lit_types(blob):
    h = frame_mod.parse_frame_header(blob)
    pos = h.header_size
    types = []
    while True:
        bh = blocks_mod.parse_block_header(blob[pos:pos + 3])
        pos += 3
        if bh.block_type == C.BLOCK_COMPRESSED:
            sec = blocks_mod.parse_literals_section(blob[pos:pos + bh.block_size])
            types.append(sec.lit_type)
        pos += bh.block_size if bh.block_type != C.BLOCK_RLE else 1
        if bh.last_block:
            break
    return types


def test_treeless_fires_and_interops():
    import numpy as np

    # broad-alphabet skewed data: the table description is large (hundreds
    # of weights) and the distribution is stable across blocks, so later
    # blocks should reuse the first block's table (huff0_encoder.rs:255-267).
    # Low match rate keeps the literal sections big.
    rng = np.random.RandomState(3)
    sym = np.minimum(rng.geometric(0.02, size=400_000) - 1, 255)
    data = sym.astype(np.uint8).tobytes()
    blob = compress_to_vec(data, CompressionLevel.FASTEST)
    types = _lit_types(blob)
    assert C.LIT_TREELESS in types, types
    # interop: libzstd must accept the Treeless frames
    out = zstandard.ZstdDecompressor().decompress(
        blob, max_output_size=len(data) + 16)
    assert out == data
    # and our own oracle
    from zstd_tpu.oracle import decode_frame

    assert decode_frame(blob) == data
