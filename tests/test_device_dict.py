"""Device decode of dictionary frames (parity: frame_decoder.rs:209-216 +
scratch.rs:70-78 — dict entropy tables, offset history, window prefill).

The framer registers the dictionary's tables, seeds the repeat-offset
history, and prepends the content as a leading literal run that the decoder
slices off; frames must decode on device without host fallback.
"""

import glob
import os

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference/ruzstd"
DICT_DIR = os.path.join(REFERENCE_ROOT, "dict_tests")


@pytest.mark.skipif(not os.path.isdir(DICT_DIR),
                    reason="reference dict corpus not mounted")
def test_dict_corpus_on_device_pipeline():
    from zstd_tpu.models.batch_decoder import BatchDecoder

    dec = BatchDecoder()
    with open(os.path.join(DICT_DIR, "dictionary"), "rb") as f:
        dec.add_dict(f.read())

    zfiles = sorted(glob.glob(os.path.join(DICT_DIR, "files", "*.zst")))
    assert zfiles
    frames, expected = [], []
    for zf in zfiles:
        with open(zf, "rb") as f:
            frames.append(f.read())
        with open(zf[:-4], "rb") as f:
            expected.append(f.read())

    batch = dec.prepare(frames)
    assert not any(m.fallback for m in batch.metas), \
        "dict frames must take the device path"
    bad = [(m.index, m.error) for m in batch.metas if not m.ok]
    assert not bad, f"dict frames failed host parse: {bad[:3]}"
    results = dec.decode_frames(frames)
    for zf, got, exp in zip(zfiles, results, expected):
        assert got == exp, os.path.basename(zf)

    # device ok flags (no silent fallback masking)
    outputs, out_len, ok = dec.run_device(batch)
    assert np.asarray(ok).all()


@pytest.mark.skipif(not os.path.isdir(DICT_DIR),
                    reason="reference dict corpus not mounted")
def test_unregistered_dict_falls_back():
    from zstd_tpu.models.batch_decoder import BatchDecoder

    zf = sorted(glob.glob(os.path.join(DICT_DIR, "files", "*.zst")))[0]
    with open(zf, "rb") as f:
        frame = f.read()
    dec = BatchDecoder()  # no add_dict
    batch = dec.prepare([frame])
    assert batch.metas[0].fallback
    # host fallback has no dict either -> lane reports None, batch survives
    assert dec.decode_frames([frame]) == [None]
