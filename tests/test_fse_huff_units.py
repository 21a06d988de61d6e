"""Entropy-coder unit tests: predefined-table spot checks against hand-traced
spec values, table-build invariants, and Huffman canonical properties."""

import numpy as np
import pytest

from zstd_tpu.common import constants as C
from zstd_tpu.common.errors import FSETableError, HuffmanTableError
from zstd_tpu.oracle import fse, huff0


def test_predefined_ll_table_invariants():
    t = fse.build_table_from_probabilities(list(C.LL_DEFAULT_DIST), C.LL_DEFAULT_ACC_LOG)
    assert t.size == 64
    # every state's baseline+2^num_bits stays within the table
    for i in range(t.size):
        assert int(t.base_line[i]) + (1 << int(t.num_bits[i])) <= t.size
    # symbol histogram matches |probability|
    counts = np.bincount(t.symbol, minlength=36)
    for s, p in enumerate(C.LL_DEFAULT_DIST):
        assert counts[s] == abs(p)


def test_predefined_ml_table_hand_traced_state():
    # Hand-traced from a libzstd level-1 frame of b'a'*100000 (see
    # tests/test_interop_decode.py): the predefined ML table must map state
    # 57 -> symbol 52 (match-length code 52, 16 extra bits, baseline 65539).
    t = fse.build_table_from_probabilities(list(C.ML_DEFAULT_DIST), C.ML_DEFAULT_ACC_LOG)
    assert int(t.symbol[57]) == 52
    assert int(t.num_bits[57]) == 6  # -1 probability: full state reread


def test_predefined_of_table_low_state():
    t = fse.build_table_from_probabilities(list(C.OF_DEFAULT_DIST), C.OF_DEFAULT_ACC_LOG)
    assert t.size == 32
    assert int(t.symbol[0]) == 0


def test_fse_rejects_overflow_probs():
    with pytest.raises(FSETableError):
        fse.build_table_from_probabilities([100] * 10, 5)


def test_huffman_table_from_weights_canonical():
    # weights 1,1,2 -> sum 1+1+2=4, max_bits such that implied weight closes
    weights = [2, 2, 2]  # sum 6 -> next pow2 8 -> last weight log2(2)+1 = 2
    t = huff0.build_table_from_weights(weights)
    assert t.max_bits == 3
    counts = np.bincount(t.symbol, minlength=4)
    # all four symbols weight 2 -> each spans 2 entries of the 8-entry table
    assert list(counts[:4]) == [2, 2, 2, 2]
    assert all(int(b) == 2 for b in t.num_bits)


def test_huffman_rejects_bad_weights():
    with pytest.raises(HuffmanTableError):
        huff0.build_table_from_weights([0, 0, 0])
    with pytest.raises(HuffmanTableError):
        huff0.build_table_from_weights([12, 1])  # weight over 11


def test_huffman_prefix_free_decode_table():
    # A skewed weight set; the decode LUT must tile exactly and be
    # consistent: each symbol's span is contiguous with one num_bits.
    weights = [4, 4, 3, 2, 2]  # sum = 8+8+4+2+2 = 24 -> implied last weight 4
    t = huff0.build_table_from_weights(weights)
    assert t.max_bits == 5
    spans = {}
    for i in range(1 << t.max_bits):
        s = int(t.symbol[i])
        spans.setdefault(s, []).append(i)
    for s, idxs in spans.items():
        assert idxs == list(range(idxs[0], idxs[0] + len(idxs)))
        assert len(idxs) == 1 << (5 - int(t.num_bits[idxs[0]]))
