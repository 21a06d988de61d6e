"""Zstd dictionary parsing (RFC 8878 §5).

Parity with /root/reference/ruzstd/src/decoding/dictionary.rs:12-127: magic
0xEC30A437, dict id, Huffman table, then OF/ML/LL FSE tables (in that order),
three repeat-offset u32 values, and the remainder as raw content. Raw-content
dictionaries (no magic) are also accepted, matching libzstd behavior and the
trainer's output format.
"""

import dataclasses

import numpy as np

from zstd_tpu.common import constants
from zstd_tpu.common.errors import DictionaryError, NotEnoughBytes
from zstd_tpu.oracle import fse, huff0
from zstd_tpu.utils.bitio import BitReader


@dataclasses.dataclass
class Dictionary:
    dict_id: int | None
    huffman_table: "huff0.HuffmanTable | None"
    of_table: "fse.FSETable | None"
    ml_table: "fse.FSETable | None"
    ll_table: "fse.FSETable | None"
    offset_hist: tuple[int, int, int]
    content: bytes

    @staticmethod
    def decode_dict(raw) -> "Dictionary":
        raw = bytes(raw)
        if len(raw) < 4 or int.from_bytes(raw[0:4], "little") != constants.DICT_MAGIC_NUM:
            # Raw-content dictionary: every byte is window prefill.
            return Dictionary(
                dict_id=None, huffman_table=None, of_table=None,
                ml_table=None, ll_table=None,
                offset_hist=constants.INITIAL_REPEAT_OFFSETS, content=raw,
            )
        if len(raw) < 8:
            raise NotEnoughBytes(8, len(raw), "dictionary header")
        dict_id = int.from_bytes(raw[4:8], "little")
        pos = 8

        huffman_table, consumed = huff0.parse_huffman_table(raw[pos:])
        pos += consumed

        tables = []
        for max_log in (constants.OF_MAX_LOG, constants.ML_MAX_LOG, constants.LL_MAX_LOG):
            rdr = BitReader(raw[pos:])
            tables.append(fse.parse_fse_table(rdr, max_log))
            pos += rdr.bits_read() // 8
        of_table, ml_table, ll_table = tables

        if len(raw) < pos + 12:
            raise NotEnoughBytes(pos + 12, len(raw), "dictionary offset history")
        hist = tuple(int.from_bytes(raw[pos + 4 * i: pos + 4 * i + 4], "little") for i in range(3))
        pos += 12
        for h in hist:
            if h == 0:
                raise DictionaryError("zero repeat offset in dictionary")

        return Dictionary(
            dict_id=dict_id,
            huffman_table=huffman_table,
            of_table=of_table,
            ml_table=ml_table,
            ll_table=ll_table,
            offset_hist=hist,
            content=raw[pos:],
        )
