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
def test_big_dict_frame_chains_on_device():
    """A multi-MiB dict-compressed frame must take the CHAINED device path
    with the dict content seeding the exec window (decode_buffer.rs:143-179
    repeat_from_dict), not the host fallback."""
    import zstandard

    from zstd_tpu.models.batch_decoder import BatchDecoder

    with open(os.path.join(DICT_DIR, "dictionary"), "rb") as f:
        dict_bytes = f.read()
    # payload that matches into the dict content early (first matches hit
    # the window prefill) and into itself later
    rng = np.random.RandomState(11)
    chunks = []
    tail = dict_bytes[-4096:]
    for i in range(800):
        chunks.append(tail[rng.randint(0, 2048):][:2048])
        chunks.append(rng.randint(0, 256, 1024).astype(np.uint8).tobytes())
    data = b"".join(chunks)  # ~2.3 MiB
    comp = zstandard.ZstdCompressor(
        level=3, dict_data=zstandard.ZstdCompressionDict(dict_bytes),
        write_checksum=True)
    frame = comp.compress(data)

    dec = BatchDecoder()
    dec.add_dict(dict_bytes)
    batch = dec.prepare([frame])
    m = batch.metas[0]
    assert m.ok, m.error
    assert not m.fallback, "big dict frame must stay on the device path"
    assert len(m.rows) > 1, "frame this size must chain"
    assert m.dict_prefill, "chained dict frame must carry the prefill"
    assert m.dict_skip == 0
    outputs, out_len, ok = dec.run_device(batch)
    assert bool(np.asarray(ok)[m.rows[0]]), "device chain must self-validate"
    assert dec.decode_frames([frame]) == [data]


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


@pytest.mark.skipif(not os.path.isdir(DICT_DIR),
                    reason="reference dict corpus not mounted")
def test_no_fcs_dict_frame_chains_on_device():
    """A dict frame WITHOUT a frame content size (write_content_size=False)
    cannot predict whether it chains at header time — it must take the
    dict-prefill windowed path (decode_buffer.rs:143-179 serves dict
    matches at any size; VERDICT r4 missing #5), not the host fallback."""
    import zstandard

    from zstd_tpu.models.batch_decoder import BatchDecoder

    with open(os.path.join(DICT_DIR, "dictionary"), "rb") as f:
        dict_bytes = f.read()
    rng = np.random.RandomState(13)
    tail = dict_bytes[-4096:]
    chunks = []
    for i in range(900):
        chunks.append(tail[rng.randint(0, 2048):][:2048])
        chunks.append(rng.randint(0, 256, 1024).astype(np.uint8).tobytes())
    data = b"".join(chunks)  # > 2 MiB
    comp = zstandard.ZstdCompressor(
        level=3, dict_data=zstandard.ZstdCompressionDict(dict_bytes),
        write_checksum=True, write_content_size=False)
    frame = comp.compress(data)

    dec = BatchDecoder()
    dec.add_dict(dict_bytes)
    batch = dec.prepare([frame])
    m = batch.metas[0]
    assert m.ok, m.error
    assert not m.fallback, "no-FCS dict frame must stay on the device path"
    assert m.dict_prefill and m.dict_skip == 0
    assert len(m.rows) > 1, "frame this size must chain"
    outputs, out_len, ok = dec.run_device(batch)
    assert bool(np.asarray(ok)[m.rows[0]])
    assert dec.decode_frames([frame]) == [data]


@pytest.mark.skipif(not os.path.isdir(DICT_DIR),
                    reason="reference dict corpus not mounted")
def test_no_fcs_small_dict_frame_single_group_prefill():
    """A SMALL no-FCS dict frame ends up a one-group 'chain': the windowed
    driver still seeds the prefill (there is no synthetic-run fallback for
    unknown sizes), and the decode stays on device."""
    import zstandard

    from zstd_tpu.models.batch_decoder import BatchDecoder

    with open(os.path.join(DICT_DIR, "dictionary"), "rb") as f:
        dict_bytes = f.read()
    data = dict_bytes[-1500:] + b"small payload quoting the dictionary " * 40
    comp = zstandard.ZstdCompressor(
        level=3, dict_data=zstandard.ZstdCompressionDict(dict_bytes),
        write_checksum=True, write_content_size=False)
    frame = comp.compress(data)

    dec = BatchDecoder()
    dec.add_dict(dict_bytes)
    batch = dec.prepare([frame])
    m = batch.metas[0]
    assert m.ok, m.error
    assert not m.fallback
    assert m.dict_prefill and len(m.rows) == 1
    outputs, out_len, ok = dec.run_device(batch)
    assert bool(np.asarray(ok)[m.rows[0]])
    assert dec.decode_frames([frame]) == [data]
