"""Window-limit behaviors against the reference's own fixtures
(/root/reference/ruzstd/test_fixtures/window_{8,128}mib.zst), mirroring
tests/mod.rs:595-738: frames above the configured cap are rejected, raising
the cap admits them, and the default 100 MB cap admits 8 MiB but not 128 MiB
windows... (the 128 MiB fixture exceeds the default)."""

import os

import pytest

from tests.conftest import REFERENCE_ROOT, requires_reference
from zstd_tpu.common.config import CodecConfig
from zstd_tpu.common.errors import WindowSizeError
from zstd_tpu.oracle import decode_all

FIX = os.path.join(REFERENCE_ROOT, "test_fixtures")


def _read(name):
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


@requires_reference
def test_8mib_window_admitted_by_default():
    decode_all(_read("window_8mib.zst"))  # must not raise


@requires_reference
def test_128mib_window_rejected_by_default():
    with pytest.raises(WindowSizeError):
        decode_all(_read("window_128mib.zst"))


@requires_reference
def test_128mib_window_admitted_when_raised():
    cfg = CodecConfig(max_window_size=256 * 1024 * 1024)
    decode_all(_read("window_128mib.zst"), cfg)


@requires_reference
def test_8mib_window_rejected_when_lowered():
    cfg = CodecConfig(max_window_size=1024 * 1024)
    with pytest.raises(WindowSizeError):
        decode_all(_read("window_8mib.zst"), cfg)


@requires_reference
def test_abc_fixture():
    assert decode_all(_read("abc.txt.zst")) == b"abcdefghijklmnopqrstuvwxyz"
