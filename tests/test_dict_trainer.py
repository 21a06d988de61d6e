"""Dictionary trainer gates (dictionary/mod.rs parity): a trained
raw-content dict must substantially shrink compression of the training
domain, and libzstd must accept it (interop)."""

import random

import zstandard

from zstd_tpu.models.dict_trainer import DictParams, create_raw_dict_from_source


def make_collection():
    rng = random.Random(17)
    docs = []
    for i in range(150):
        docs.append((
            b"[Unit]\nDescription=Service %d\nAfter=network.target\n"
            b"[Service]\nExecStart=/usr/bin/daemon --id %d --mode %s\n"
            b"Restart=on-failure\nUser=svc%d\n[Install]\n"
            b"WantedBy=multi-user.target\n"
            % (i, i * 7, [b"fast", b"safe", b"debug"][i % 3], i % 10)))
    return docs


def test_trained_dict_improves_ratio():
    docs = make_collection()
    d = create_raw_dict_from_source(docs, DictParams(dict_size=8 * 1024))
    assert 0 < len(d) <= 8 * 1024

    base = zstandard.ZstdCompressor(level=3)
    zd = zstandard.ZstdCompressionDict(d, dict_type=zstandard.DICT_TYPE_RAWCONTENT)
    with_dict = zstandard.ZstdCompressor(level=3, dict_data=zd)
    no_dict_size = sum(len(base.compress(x)) for x in docs)
    dict_size = sum(len(with_dict.compress(x)) for x in docs)
    assert dict_size < 0.7 * no_dict_size  # substantial win on templated data

    # decode interop: libzstd round-trip with the dict, and our oracle
    from zstd_tpu.oracle import decode_frame
    from zstd_tpu.oracle.dictionary import Dictionary

    our_dict = Dictionary.decode_dict(d)  # raw-content path
    dctx = zstandard.ZstdDecompressor(dict_data=zd)
    for x in docs[:5]:
        z = with_dict.compress(x)
        assert dctx.decompress(z, max_output_size=len(x)) == x
        assert decode_frame(z, dictionary=our_dict) == x


def test_dict_quality_vs_libzstd():
    """Reference bar: ruzstd's trained dict compresses within 0.2% of a
    libzstd-trained dict on the github-users set (Readme.md:46-54). Gate
    ours within 5% of libzstd's on the synthetic collection (measured
    2026-08: 7% BETTER — 4075 vs 4372 bytes total)."""
    docs = make_collection()
    ours = create_raw_dict_from_source(docs, DictParams(dict_size=8 * 1024))
    lib = zstandard.train_dictionary(8 * 1024, docs, level=3)

    def total(cctx):
        return sum(len(cctx.compress(x)) for x in docs)

    t_ours = total(zstandard.ZstdCompressor(
        level=3, dict_data=zstandard.ZstdCompressionDict(
            ours, dict_type=zstandard.DICT_TYPE_RAWCONTENT)))
    t_lib = total(zstandard.ZstdCompressor(level=3, dict_data=lib))
    assert t_ours <= 1.05 * t_lib, (t_ours, t_lib)


def test_empty_and_tiny_sources():
    assert create_raw_dict_from_source([], DictParams()) == b""
    assert create_raw_dict_from_source([b"abc"], DictParams()) == b""
