"""Debug/integrity mode tests (flo_tpu.debug)."""

import numpy as np
import pytest

import flo_tpu
from flo_tpu import debug


def test_enable_disable():
    assert not debug.debug_enabled()
    debug.enable_debug_mode(True)
    try:
        assert debug.debug_enabled()
    finally:
        debug.enable_debug_mode(False)
    assert not debug.debug_enabled()


def test_context_manager():
    with debug.debug_mode():
        assert debug.debug_enabled()
    assert not debug.debug_enabled()


def test_check_crc():
    s = (0.4 * np.sin(np.arange(2000) * 0.1)).astype(np.float32)
    data = flo_tpu.encode(s, 1000, 1, analyze=False)
    debug.check_crc(data)  # valid: no raise
    bad = bytearray(data)
    bad[len(bad) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        debug.check_crc(bytes(bad))


def test_codec_still_works_in_debug_mode():
    s = (0.4 * np.sin(np.arange(3000) * 0.05)).astype(np.float32)
    with debug.debug_mode():
        data = flo_tpu.encode(s, 1500, 1, analyze=False)
        out = flo_tpu.decode(data)
    assert np.abs(out - s).max() <= 1 / 32768 + 1e-6
