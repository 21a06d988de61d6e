"""Golden-corpus round-trip gates — the reference's own test corpus, read
in-place from /root/reference (never copied): 101 decodecorpus pairs, 207
dictionary-compressed files, and 49 fuzz artifacts that must be rejected
with typed errors. Mirrors the strategy of
/root/reference/ruzstd/src/tests/decode_corpus.rs and fuzz_regressions.rs."""

import glob
import os

import pytest

from tests.conftest import REFERENCE_ROOT, requires_reference
from zstd_tpu.common.errors import ZstdError
from zstd_tpu.oracle import decode_all
from zstd_tpu.oracle.dictionary import Dictionary

CORPUS = os.path.join(REFERENCE_ROOT, "decodecorpus_files")
DICT_DIR = os.path.join(REFERENCE_ROOT, "dict_tests")
FUZZ_DIR = os.path.join(REFERENCE_ROOT, "fuzz", "artifacts")


def corpus_pairs():
    if not os.path.isdir(CORPUS):
        return []
    return sorted(glob.glob(CORPUS + "/*.zst"))


@requires_reference
@pytest.mark.parametrize("zfile", corpus_pairs(), ids=os.path.basename)
def test_decodecorpus_bit_exact(zfile):
    with open(zfile, "rb") as f:
        compressed = f.read()
    with open(zfile[:-4], "rb") as f:
        expected = f.read()
    assert decode_all(compressed) == expected


@requires_reference
def test_dict_corpus_bit_exact():
    with open(os.path.join(DICT_DIR, "dictionary"), "rb") as f:
        d = Dictionary.decode_dict(f.read())
    assert d.dict_id is not None
    files = sorted(glob.glob(os.path.join(DICT_DIR, "files", "*.zst")))
    assert len(files) > 100
    for zf in files:
        with open(zf, "rb") as f:
            compressed = f.read()
        with open(zf[:-4], "rb") as f:
            expected = f.read()
        assert decode_all(compressed, dicts=[d]) == expected, zf


@requires_reference
def test_fuzz_artifacts_never_crash():
    artifacts = sorted(
        p for p in glob.glob(os.path.join(FUZZ_DIR, "*", "*"))
        if os.path.isfile(p))
    assert len(artifacts) >= 45
    for art in artifacts:
        with open(art, "rb") as f:
            data = f.read()
        target = os.path.basename(os.path.dirname(art))
        try:
            if target == "decode_dict":
                Dictionary.decode_dict(data)
            else:
                decode_all(data)
        except ZstdError:
            pass  # typed rejection is the expected outcome
        # Anything else (untyped exception, crash, hang) fails the test.


@requires_reference
def test_fuzz_artifacts_through_device_pipeline():
    """The batched device pipeline must also survive fuzzer garbage: each
    artifact either decodes (if it is a valid frame), returns None, or is
    rejected at framing — never an untyped exception, and one poisoned lane
    never takes down the batch (SURVEY.md §5 failure isolation)."""
    from zstd_tpu.models.batch_decoder import BatchDecoder
    from zstd_tpu.models.splitter import split_frames

    artifacts = sorted(
        p for p in glob.glob(os.path.join(FUZZ_DIR, "decode", "*"))
        if os.path.isfile(p))
    assert artifacts
    frames = []
    for art in artifacts:
        with open(art, "rb") as f:
            data = f.read()
        try:
            frames.extend(split_frames(data))
        except ZstdError:
            frames.append(data)  # unsplittable garbage: one lane as-is
    # a healthy frame rides along to prove the batch survives
    healthy = b"healthy payload " * 200
    from zstd_tpu.encoding.frame_enc import compress_to_vec
    from zstd_tpu.common.config import CompressionLevel

    frames.append(compress_to_vec(healthy, CompressionLevel.FASTEST))
    results = BatchDecoder().decode_frames(frames)
    assert results[-1] == healthy
    assert len(results) == len(frames)
