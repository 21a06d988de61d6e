"""Host framer: split frames into device-ready lane batches.

The irregular ~1% of the format (headers, table descriptions) is parsed on
host using the oracle's parsers; 100% of payload decoding (Huffman literal
streams, the tANS sequence bitstreams, LZ77 execution) runs on device. The
framer emits:

  - Huffman lanes: one per (compressed-literals block, stream), with a
    destination (frame, offset) in the frame's literal stream
  - Sequence lanes: one per compressed block with sequences, with a
    destination (frame, slot) range in the frame's sequence arrays and a
    reserved trailing-literals slot (its length — block literals minus the
    sum of decoded ll — is only known on device)
  - Frame-level base arrays host-prefilled with everything already plain:
    raw/RLE block bytes, raw/RLE literal sections, synthetic sequences

Frames that need features the device path does not cover yet (external
dictionary content) are flagged for the host oracle fallback.
"""

import dataclasses
import os

import numpy as np

from zstd_tpu.common import constants as C
from zstd_tpu.common.errors import ZstdError
from zstd_tpu.oracle import blocks as blocks_mod
from zstd_tpu.oracle import frame as frame_mod
from zstd_tpu.oracle import fse, huff0
from zstd_tpu.ops.bitstream import host_initial_position
from zstd_tpu.ops.sequence import pack_fse_table
from zstd_tpu.utils.bitio import BitReader


def _round_pow2(n: int, lo: int = 16) -> int:
    return max(lo, 1 << (max(n, 1) - 1).bit_length())


# Frames whose decoded size (or literal volume) exceeds this split into a
# CHAIN of block groups, each its own batch row: entropy stages stay fully
# batched (they are frame-size independent), repeat offsets resolve
# symbolically per group (ops/sequence.py::resolve_offsets_symbolic), and
# execution streams group by group carrying a window in HBM — the device
# analog of the reference's window-retaining drain
# (decode_buffer.rs:182-218, SURVEY.md §5 long-context analog).
DEVICE_FRAME_CAP = 1 << 20
# All four caps are env-overridable so the CPU-mesh dryrun / fast tests can
# exercise the chained + far paths at tiny shapes (interpret-mode Pallas is
# minutes-per-MiB; the real-TPU defaults would blow any time budget there).
# Non-default caps force the Python walk (the native walker hardcodes the
# production caps — see _walk_native).
# per-group caps: output upper bound and 128-aligned sequence slots (the
# group's records must fit the exec kernel's SMEM chunking).
# OUT_CAP leaves MAX_BLOCK_SIZE headroom below 2 MiB so a closed group's
# bound (<= CAP - 1 + MAX_BLOCK) still pow2-quantizes to 2 MiB — the r3
# value (1 << 21) overshot to a 4 MiB kernel out width for nothing.
# SEQ_CAP 80K (r3: 24K) makes chains split by OUTPUT size, not sequence
# count (~5x fewer windowed group dispatches per long frame); worst-case
# group records (CAP - 1 + one 43K-record jumbo block) stay under the exec
# kernel's MAX_SMEM_SEQS = 128K.
_DEFAULT_GROUP_OUT_CAP = (1 << 21) - (1 << 17)
_DEFAULT_GROUP_SEQ_CAP = 80 * 1024
GROUP_OUT_CAP = int(os.environ.get("ZSTD_TPU_GROUP_OUT_CAP",
                                   _DEFAULT_GROUP_OUT_CAP))
GROUP_SEQ_CAP = int(os.environ.get("ZSTD_TPU_GROUP_SEQ_CAP",
                                   _DEFAULT_GROUP_SEQ_CAP))
# widest window the chained exec path keeps ENTIRELY in VMEM. Bigger real
# windows (zstd --long, window_log 24+) still decode on device: the driver
# switches to a 4 MiB VMEM prefix + HBM-resident history with far matches
# pre-gathered per group (pallas_execute.WINDOW_VMEM_CAP) — no host
# fallback (frame_decoder.rs:163-178 parity at any window size).
STREAM_WINDOW_CAP = int(os.environ.get("ZSTD_TPU_STREAM_WINDOW_CAP",
                                       1 << 23))


@dataclasses.dataclass
class FrameMeta:
    index: int
    out_len: int
    lit_len: int
    checksum: int | None
    ok: bool                 # host-side parse success
    fallback: bool = False   # needs oracle path (unregistered dict etc.)
    error: str = ""
    dict_skip: int = 0       # leading window-prefill bytes to drop
    rows: list = dataclasses.field(default_factory=list)  # batch row ids
    window: int = 0          # window size (chained exec prefill width)
    dict_prefill: bytes = b""  # chained frames: dict content seeding the
    #                            exec window (decode_buffer.rs:143-179)


@dataclasses.dataclass
class DeviceBatch:
    # huffman lanes
    huff_streams: np.ndarray   # (Bs, Ls) u8
    huff_pos: np.ndarray       # (Bs,) i32
    huff_tid: np.ndarray       # (Bs,) i32
    huff_nsym: np.ndarray      # (Bs,) i32
    huff_tables: np.ndarray    # (Th, 2048) u16
    huff_maxbits: np.ndarray   # (Th,) i32
    huff_bnd: np.ndarray       # (Th, 16) i32 boundary rows (pallas decode)
    huff_syms: np.ndarray      # (Th, 64) i32 rank list packed 4 bytes/row
    huff_nranks: np.ndarray    # (Th,) i32 distinct symbols per table
    huff_dst_frame: np.ndarray  # (Bs,) i32
    huff_dst_off: np.ndarray    # (Bs,) i32
    huff_len: np.ndarray        # (Bs,) i32 true stream byte length
    # sequence lanes
    seq_streams: np.ndarray    # (Bb, Lb) u8
    seq_pos: np.ndarray        # (Bb,) i32
    seq_n: np.ndarray          # (Bb,) i32
    ll_tid: np.ndarray
    of_tid: np.ndarray
    ml_tid: np.ndarray
    ll_tables: np.ndarray      # (Tl, 512) u32
    of_tables: np.ndarray      # (To, 256) u32
    ml_tables: np.ndarray      # (Tm, 512) u32
    ll_logs: np.ndarray
    of_logs: np.ndarray
    ml_logs: np.ndarray
    seq_dst_frame: np.ndarray  # (Bb,) i32
    seq_dst_off: np.ndarray    # (Bb,) i32
    seq_lit_total: np.ndarray  # (Bb,) i32 block literal count (for trailing)
    seq_trail_slot: np.ndarray  # (Bb,) i32 frame slot for the trailing run
    seq_len: np.ndarray        # (Bb,) i32 true stream byte length
    # frame bases
    lit_base: np.ndarray       # (Bf, Lit) u8
    ll_base: np.ndarray        # (Bf, S) i32
    ml_base: np.ndarray        # (Bf, S) i32
    of_base: np.ndarray        # (Bf, S) i32
    is_real: np.ndarray        # (Bf, S) bool
    out_len: np.ndarray        # (Bf,) i32 (FCS or upper bound per row)
    frame_nseq: np.ndarray     # (Bf,) i32 sequence slots used per row
    frame_hist: np.ndarray     # (Bf, 3) i32 initial repeat offsets
    row_lit_len: np.ndarray    # (Bf,) i32 literal bytes per row
    row_meta: np.ndarray       # (Bf,) i32 meta index per row (-1 inert)
    metas: list  # FrameMeta per frame (meta.rows = its chain of row ids)
    out_width: int
    max_huff_symbols: int
    max_seqs: int


class _TableCache:
    """Dedupe device table rows (predefined/treeless/repeat sharing)."""

    def __init__(self, width):
        self.width = width
        self.rows = []

    def add(self, packed_row) -> int:
        self.rows.append(packed_row)
        return len(self.rows) - 1

    def stack(self, dtype):
        if not self.rows:
            return np.zeros((1, self.width), dtype=dtype)
        return np.stack(self.rows).astype(dtype)


_PREDEFINED = {}
_PREDEF_PACKED = {}  # kind -> packed device row of the predefined table


def _predefined_table(kind: str):
    if kind not in _PREDEFINED:
        dist, log = {
            "ll": (C.LL_DEFAULT_DIST, C.LL_DEFAULT_ACC_LOG),
            "of": (C.OF_DEFAULT_DIST, C.OF_DEFAULT_ACC_LOG),
            "ml": (C.ML_DEFAULT_DIST, C.ML_DEFAULT_ACC_LOG),
        }[kind]
        _PREDEFINED[kind] = fse.build_table_from_probabilities(list(dist), log)
    return _PREDEFINED[kind]


class Framer:
    def __init__(self, dicts=None):
        """dicts: optional {dict_id: oracle.Dictionary} registry — frames
        referencing a registered dictionary decode fully on device (entropy
        tables pre-registered, offset history seeded, dictionary content
        prepended as a leading literal run whose bytes are sliced off the
        output). Unregistered dictionary ids fall back to the host oracle
        (which raises DictNotProvided, matching frame_decoder.rs:209-216).
        """
        self.dicts = dicts or {}
        self._dict_tids = {}   # dict_id -> (huff_tid, ll, of, ml tids)
        self._std_tids = {}    # predefined/RLE table tid memo
        self._block_cap = C.MAX_BLOCK_SIZE  # per-frame: min(window, 128K)
        self._walker = None    # native one-call frame walk (lazy)
        self._walker_failed = False
        self.huff_lanes = []   # (stream_bytes, pos, tid, nsym, frame, dst_off)
        self.seq_lanes = []    # (stream_bytes, pos, n, ll/of/ml tid, frame, dst, lit_total, trail_slot)
        self.huff_tabs = _TableCache(2048)
        self.huff_bnd = []
        self.huff_syms = []
        self.huff_nranks = []
        self.ll_tabs = _TableCache(512)
        self.of_tabs = _TableCache(256)
        self.ml_tabs = _TableCache(512)
        self.huff_maxbits = []
        self.ll_logs, self.of_logs, self.ml_logs = [], [], []
        self.frames = []       # per-frame dict: lit chunks, seq slots, ...
        self.metas = []

    # ---- per-frame state ----------------------------------------------------

    @staticmethod
    def _new_group() -> dict:
        return {"lit_parts": [], "lit_cursor": 0, "seqs": [],
                "seq_cursor": 0, "out_bound": 0, "fcs": None}

    def add_frame(self, data: bytes, index: int) -> None:
        """Parse one frame's structure; raises nothing — failures flag the lane.

        A frame becomes one batch row, or — when its decoded size exceeds
        the group caps — a CHAIN of rows (block groups) executed windowed
        (meta.rows holds the chain in order)."""
        marks = (len(self.huff_lanes), len(self.seq_lanes),
                 len(self.huff_tabs.rows), len(self.huff_maxbits),
                 len(self.ll_tabs.rows), len(self.of_tabs.rows),
                 len(self.ml_tabs.rows), len(self.ll_logs),
                 len(self.of_logs), len(self.ml_logs),
                 len(self.huff_bnd), len(self.frames))
        meta = FrameMeta(index=index, out_len=0, lit_len=0, checksum=None,
                         ok=True)
        self._cur = self._new_group()
        self._chain_rows = []
        try:
            walked = self._walk_native(data, meta)
            if not walked:
                self._parse_frame(data, meta)
        except ZstdError as e:
            meta.ok = False
            meta.error = f"{type(e).__name__}: {e}"
        except Exception as e:  # framer must never crash the batch
            meta.ok = False
            meta.error = f"internal {type(e).__name__}: {e}"
        self._close_group(final=True)
        chained = len(self._chain_rows) > 1
        too_big = (self._chain_rows and
                   (self.frames[self._chain_rows[-1]]["out_bound"]
                    > GROUP_OUT_CAP + C.MAX_BLOCK_SIZE))
        if (chained and meta.dict_skip) or too_big:
            # dict_skip only arises with a KNOWN-small FCS; a frame that
            # chained anyway carries a lying FCS (corrupt per spec) — the
            # host oracle raises the exact typed error
            meta.fallback = True
        if meta.dict_prefill and meta.window > STREAM_WINDOW_CAP:
            from zstd_tpu.ops.pallas_execute import WINDOW_VMEM_CAP

            if min(len(meta.dict_prefill), meta.window) > WINDOW_VMEM_CAP:
                # big-window chains use a VMEM prefix of WINDOW_VMEM_CAP
                # bytes; a dict prefill larger than it cannot seed the
                # accumulator preamble
                meta.fallback = True
        elif (meta.dict_prefill
              and len(meta.dict_prefill) > STREAM_WINDOW_CAP):
            # the whole dict is addressable regardless of the window
            # (decode_buffer.rs:143-179) but the VMEM window prefix caps at
            # STREAM_WINDOW_CAP — exotic >8 MiB dicts go to the host oracle
            meta.fallback = True
        if not meta.ok or meta.fallback:
            # strip this frame's lanes/tables/rows so a fallback frame does
            # not inflate the whole batch's widths
            self._dict_tids.clear()  # stripped table rows invalidate ids
            self._std_tids.clear()
            (self.huff_lanes[marks[0]:], self.seq_lanes[marks[1]:],
             self.huff_tabs.rows[marks[2]:], self.huff_maxbits[marks[3]:],
             self.ll_tabs.rows[marks[4]:], self.of_tabs.rows[marks[5]:],
             self.ml_tabs.rows[marks[6]:], self.ll_logs[marks[7]:],
             self.of_logs[marks[8]:], self.ml_logs[marks[9]:],
             self.huff_bnd[marks[10]:], self.huff_syms[marks[10]:],
             self.huff_nranks[marks[10]:], self.frames[marks[11]:]) = (
                [], [], [], [], [], [], [], [], [], [], [], [], [], [])
            self._chain_rows = []
        meta.rows = list(self._chain_rows)
        meta.lit_len = max((self.frames[r]["lit_cursor"]
                            for r in meta.rows), default=0)
        self.metas.append(meta)
        self._cur = None
        self._chain_rows = []

    def _walk_native(self, data: bytes, meta: FrameMeta) -> bool:
        """One-call native walk for simple frames (zt_walk_frame): the
        per-block section parsing, table parsing, and slot bookkeeping run
        in C; this just registers tables/lanes from the flat descriptor
        arrays. Returns False when the frame needs the Python walk
        (dictionaries, would-chain, malformed — Python is the error
        oracle). Batches are byte-identical to the Python walk
        (tests/test_native_parity.py::test_walk_matches_python)."""
        if os.environ.get("ZT_NO_NATIVE"):
            return False
        if (GROUP_OUT_CAP != _DEFAULT_GROUP_OUT_CAP
                or GROUP_SEQ_CAP != _DEFAULT_GROUP_SEQ_CAP):
            # the native walker hardcodes the production group caps (its
            # would-chain bailout at native.cpp zt_walk_frame) — with
            # overridden caps the Python walk must drive the split
            return False
        if self._walker is None:
            if self._walker_failed:
                return False
            try:
                from zstd_tpu.runtime import FrameWalker

                self._walker = FrameWalker()
            except Exception:
                self._walker_failed = True
                return False
        res = self._walker.walk(bytes(data))
        if res is None:
            return False
        fm = res["fm"]
        mv = memoryview(data)
        fr = self._cur
        fcs = int(fm[1])
        fr["fcs"] = fcs if fcs >= 0 else None
        fr["lit_cursor"] = int(fm[14])
        fr["seq_cursor"] = int(fm[15])
        fr["out_bound"] = int(fm[16])
        meta.window = int(fm[4])
        meta.out_len = fcs if fcs >= 0 else -1
        if fm[2]:
            meta.checksum = int(fm[3])

        parts = fr["lit_parts"]
        for dst, kind, src, ln in res["litops"].tolist():
            parts.append((dst, bytes([src]) * ln if kind
                          else mv[src:src + ln]))
        fr["seqs"] = res["syn"].tolist()

        hmap = []
        hmeta = res["hmeta"]
        for t in range(int(fm[10])):
            hmap.append(self.huff_tabs.add(res["hluts"][t].copy()))
            self.huff_maxbits.append(int(hmeta[t, 0]))
            self.huff_bnd.append(res["hbnd"][t].copy())
            self.huff_syms.append(res["hsyms"][t].copy())
            self.huff_nranks.append(int(hmeta[t, 1]))
        fidx = len(self.frames)
        for src, ln, tid, nsym, dst, pos in res["hl"].tolist():
            self.huff_lanes.append(dict(
                stream=mv[src:src + ln], pos=pos, tid=hmap[tid],
                nsym=nsym, frame=fidx, dst=dst))

        # FSE table registration replays in block order, kinds in the
        # Python walk's ll -> of -> ml order, so tids match exactly
        logs = res["logs"]
        nfse = res["nfse"]
        kt = {"ll": res["lltab"], "of": res["oftab"], "ml": res["mltab"]}
        caches = {"ll": self.ll_tabs, "of": self.of_tabs, "ml": self.ml_tabs}
        klogs = {"ll": self.ll_logs, "of": self.of_logs, "ml": self.ml_logs}
        cur = {"ll": None, "of": None, "ml": None}
        for row in res["sl"].tolist():
            (src, ln, n, llm, llv, ofm, ofv, mlm, mlv,
             dst, lit_total, trail, pos, _pad) = row
            for kind, mode, val, off in (("ll", llm, llv, 0),
                                         ("of", ofm, ofv, nfse),
                                         ("ml", mlm, mlv, 2 * nfse)):
                if mode == 0:
                    cur[kind], _ = self._setup_fse(C.MODE_PREDEFINED, b"",
                                                   cur[kind], kind)
                elif mode == 1:
                    cur[kind], _ = self._setup_fse(C.MODE_RLE,
                                                   bytes([val]), cur[kind],
                                                   kind)
                elif mode == 2:
                    cur[kind] = caches[kind].add(kt[kind][val].copy())
                    klogs[kind].append(int(logs[off + val]))
                # mode 3 (repeat): cur[kind] unchanged
            self.seq_lanes.append(dict(
                stream=mv[src:src + ln], pos=pos, n=n, ll=cur["ll"],
                of=cur["of"], ml=cur["ml"], frame=fidx, dst=dst,
                lit_total=lit_total, trail=trail))
        return True

    def _close_group(self, final: bool = False) -> None:
        """Append the current group as a batch row; open a fresh one unless
        this is the end of the frame (empty non-first groups are dropped)."""
        cur = self._cur
        if cur is None:
            return
        if (cur["out_bound"] > 0 or cur["seq_cursor"] > 0
                or not self._chain_rows):
            self._chain_rows.append(len(self.frames))
            self.frames.append(cur)
        self._cur = None if final else self._new_group()

    def _maybe_split_group(self) -> None:
        cur = self._cur
        if (cur["out_bound"] >= GROUP_OUT_CAP
                or cur["seq_cursor"] >= GROUP_SEQ_CAP):
            self._close_group()

    def _parse_frame(self, data: bytes, meta: FrameMeta) -> None:
        header = frame_mod.parse_frame_header(data)
        meta.window = header.window_size or 0
        cur_huff = None   # tid (cross-block entropy state, table ids)
        cur_ll = cur_of = cur_ml = None
        if header.dictionary_id is not None:
            d = self.dicts.get(header.dictionary_id)
            if d is None:
                meta.fallback = True
                return
            cur_huff, cur_ll, cur_of, cur_ml = self._register_dict(d)
            self._cur["hist"] = list(d.offset_hist)
            if d.content:
                fcs = header.frame_content_size
                if fcs is None or fcs > GROUP_OUT_CAP:
                    # this frame WILL chain (out_bound >= fcs splits it)
                    # or its size is UNKNOWN (no FCS — it may chain, and
                    # the synthetic-run trick below cannot be undone once
                    # groups split): the chain driver seeds the windowed
                    # exec kernel's window prefix with the dict content
                    # directly (decode_buffer.rs:143-179 repeat_from_dict
                    # analog) — no output inflation, no dict_skip slice.
                    # Single-group prefill frames ride the windowed driver
                    # too (batch_decoder treats them as 1-length chains).
                    meta.dict_prefill = bytes(d.content)
                else:
                    # single-row frames: emit the content as a leading
                    # literal run and slice it off the decoded output
                    # (meta.dict_skip) — the batched exec kernel has no
                    # window input
                    fr = self._cur
                    self._add_literal_bytes(fr, d.content)
                    self._add_synthetic(fr, ll=len(d.content), ml=0, of=0)
                    fr["out_bound"] += len(d.content)
                    meta.dict_skip = len(d.content)
        self._cur["fcs"] = header.frame_content_size
        meta.out_len = (header.frame_content_size
                        if header.frame_content_size is not None else -1)
        pos = header.header_size
        # zero-copy block walk: all section/payload slicing below works on
        # memoryviews (the mv keeps `data` alive for lanes that store
        # sub-views until build()); at 128 MiB batches the bytes-slice tail
        # copies this replaces were ~40% of prepare()
        mv = memoryview(data)

        # Block_Maximum_Size = min(window, 128 KiB) (RFC 8878 §3.1.1.2.3) —
        # also the tight decoded-size bound for compressed blocks, so
        # small-window frames get small out_bounds (and small kernel widths)
        self._block_cap = min(header.window_size or C.MAX_BLOCK_SIZE,
                              C.MAX_BLOCK_SIZE)
        while True:
            bh = blocks_mod.parse_block_header(data[pos:pos + 3])
            pos += 3
            cap = self._block_cap
            if bh.block_size > cap:
                raise ZstdError(f"block size {bh.block_size} over cap")
            fr = self._cur
            if bh.block_type == C.BLOCK_RLE:
                byte = data[pos:pos + 1]
                if len(byte) < 1:
                    raise ZstdError("truncated RLE block")
                pos += 1
                n = bh.block_size
                if n > 0:  # zero-length RLE emits nothing (byte still read)
                    self._add_literal_bytes(fr, byte)
                    self._add_synthetic(fr, ll=1, ml=n - 1,
                                        of=1 if n > 1 else 0)
                fr["out_bound"] += n
            elif bh.block_type == C.BLOCK_RAW:
                chunk = mv[pos:pos + bh.block_size]
                if len(chunk) < bh.block_size:
                    raise ZstdError("truncated raw block")
                pos += bh.block_size
                self._add_literal_bytes(fr, chunk)
                self._add_synthetic(fr, ll=len(chunk), ml=0, of=0)
                fr["out_bound"] += len(chunk)
            else:
                content = mv[pos:pos + bh.block_size]
                if len(content) < bh.block_size:
                    raise ZstdError("truncated compressed block")
                pos += bh.block_size
                fidx = len(self.frames)  # row id of the current group
                cur_huff, cur_ll, cur_of, cur_ml = self._parse_compressed_block(
                    content, fr, fidx, cur_huff, cur_ll, cur_of, cur_ml)
            if bh.last_block:
                break
            self._maybe_split_group()
        if header.content_checksum:
            cs = data[pos:pos + 4]
            if len(cs) < 4:
                raise ZstdError("truncated checksum")
            meta.checksum = int.from_bytes(cs, "little")
            pos += 4
        if pos != len(data):
            raise ZstdError(f"{len(data) - pos} trailing bytes after frame")

    def _add_literal_bytes(self, fr: dict, chunk: bytes) -> None:
        fr["lit_parts"].append((fr["lit_cursor"], chunk))
        fr["lit_cursor"] += len(chunk)

    def _add_synthetic(self, fr: dict, ll: int, ml: int, of: int) -> int:
        slot = fr["seq_cursor"]
        fr["seqs"].append((slot, ll, ml, of))
        fr["seq_cursor"] += 1
        return slot

    def _parse_compressed_block(self, content: bytes, fr: dict, fidx: int,
                                cur_huff, cur_ll, cur_of, cur_ml):
        section = blocks_mod.parse_literals_section(content)
        p = section.header_size
        lit_start = fr["lit_cursor"]
        regen = section.regenerated_size

        if section.lit_type == C.LIT_RAW:
            if p + regen > len(content):
                raise ZstdError("truncated raw literals")
            self._add_literal_bytes(fr, content[p:p + regen])
            p += regen
        elif section.lit_type == C.LIT_RLE:
            if p + 1 > len(content):
                raise ZstdError("truncated rle literals")
            self._add_literal_bytes(fr, bytes(content[p:p + 1]) * regen)
            p += 1
        else:
            comp = section.compressed_size
            payload = content[p:p + comp]
            if len(payload) < comp:
                raise ZstdError("truncated compressed literals")
            p += comp
            q = 0
            if section.lit_type == C.LIT_COMPRESSED:
                cur_huff, q = self._parse_huff(payload)
            else:
                if cur_huff is None:
                    raise ZstdError("treeless literals without a table")
            if section.num_streams == 1:
                self._add_huff_lane(payload[q:], cur_huff, regen, fidx, lit_start)
            else:
                if len(payload) - q < 6:
                    raise ZstdError("truncated jump table")
                s1 = int.from_bytes(payload[q:q + 2], "little")
                s2 = int.from_bytes(payload[q + 2:q + 4], "little")
                s3 = int.from_bytes(payload[q + 4:q + 6], "little")
                q += 6
                total = len(payload) - q
                s4 = total - s1 - s2 - s3
                if s4 <= 0:
                    raise ZstdError("jump table exceeds payload")
                r123 = (regen + 3) // 4
                r4 = regen - 3 * r123
                if r4 < 0:
                    raise ZstdError("regen too small for 4 streams")
                off = lit_start
                for sz_s, r in zip((s1, s2, s3, s4), (r123, r123, r123, r4)):
                    self._add_huff_lane(payload[q:q + sz_s], cur_huff, r, fidx, off)
                    q += sz_s
                    off += r
            fr["lit_cursor"] += regen

        block_lits = fr["lit_cursor"] - lit_start

        sh = blocks_mod.parse_sequences_header(content[p:])
        p += sh.header_size
        if sh.num_sequences == 0:
            if block_lits:
                self._add_synthetic(fr, ll=block_lits, ml=0, of=0)
            fr["out_bound"] += block_lits
            return cur_huff, cur_ll, cur_of, cur_ml

        rest = content[p:]
        rp = 0
        cur_ll, used = self._setup_fse(sh.ll_mode, rest[rp:], cur_ll, "ll")
        rp += used
        cur_of, used = self._setup_fse(sh.of_mode, rest[rp:], cur_of, "of")
        rp += used
        cur_ml, used = self._setup_fse(sh.ml_mode, rest[rp:], cur_ml, "ml")
        rp += used
        bitstream = rest[rp:]
        if not bitstream:
            raise ZstdError("empty sequences bitstream")

        # 128-align device-scattered slot ranges: the decoder then scatters
        # whole 128-slot rows (40x faster than element scatters on TPU).
        # The scatter zero-fills its full row span, so nothing else may live
        # inside [dst, dst + roundup128(n)) except the trail slot (written
        # after the scatter); the cursor jumps past the span afterwards.
        dst = (fr["seq_cursor"] + 127) & ~127
        fr["seq_cursor"] = dst + sh.num_sequences
        trail_slot = self._add_synthetic(fr, ll=0, ml=0, of=0)  # device fills ll
        span_end = dst + ((sh.num_sequences + 127) & ~127)
        fr["seq_cursor"] = max(fr["seq_cursor"], span_end)
        self.seq_lanes.append(dict(
            stream=bitstream, pos=host_initial_position(bitstream),
            n=sh.num_sequences, ll=cur_ll, of=cur_of, ml=cur_ml,
            frame=fidx, dst=dst, lit_total=block_lits, trail=trail_slot))
        # this block's decoded size (sum of ll+ml) is only known on device;
        # the format caps it at Block_Maximum_Size = min(window, 128 KiB)
        fr["out_bound"] += self._block_cap
        return cur_huff, cur_ll, cur_of, cur_ml

    def _parse_huff(self, payload: bytes) -> tuple:
        """Parse a Huffman table description into the table caches.

        The native parser emits the packed LUT row and boundary forms
        directly (zt_huff_parse — the framer's profiled hot spot); on a
        negative code or missing library the Python oracle path runs and
        raises the exact typed error.
        """
        from zstd_tpu.oracle.sequences import _native_runtime

        # a Huffman table description is <= 128 bytes by construction
        # (direct: <= 128 weights / 2 per byte; FSE-compressed: header
        # byte < 128 bounds the payload) — bound the bytes() copy
        payload = bytes(payload[:144])
        rt = _native_runtime()
        if rt is not None:
            res = rt.huff_parse(payload)
            if isinstance(res, tuple):
                lut, bnd, syms, max_bits, nranks, consumed = res
                tid = self.huff_tabs.add(lut)
                self.huff_maxbits.append(max_bits)
                self.huff_bnd.append(bnd)
                self.huff_syms.append(syms)
                self.huff_nranks.append(nranks)
                return tid, consumed
        table, consumed = huff0.parse_huffman_table(payload)
        return self._add_huff_table(table), consumed

    def _add_huff_table(self, table) -> int:
        """Register a Huffman LUT + its boundary form; returns the tid."""
        from zstd_tpu.ops.huffman import huff_boundary_rows

        row = np.zeros(2048, dtype=np.uint16)
        sz = 1 << table.max_bits
        row[:sz] = (table.symbol.astype(np.uint16)
                    | (table.num_bits.astype(np.uint16) << 8))
        tid = self.huff_tabs.add(row)
        self.huff_maxbits.append(table.max_bits)
        bnd, syms, nranks = huff_boundary_rows(table)
        self.huff_bnd.append(bnd)
        self.huff_syms.append(syms)
        self.huff_nranks.append(nranks)
        return tid

    def _add_huff_lane(self, stream, tid: int, nsym: int,
                       fidx: int, dst_off: int) -> None:
        # stream may be a memoryview into the frame bytes (zero-copy walk);
        # build() copies it into the batch array via np.frombuffer
        self.huff_lanes.append(dict(
            stream=stream, pos=host_initial_position(stream),
            tid=tid, nsym=nsym, frame=fidx, dst=dst_off))

    def _register_dict(self, d):
        """Device table ids for a dictionary's entropy state (cached by id).

        The tables become the frame's initial cross-block state, so Treeless
        literals and Repeat sequence modes work from block 1 (parity with
        DecoderScratch::init_from_dict, scratch.rs:70-78)."""
        key = d.dict_id
        if key in self._dict_tids:
            return self._dict_tids[key]
        caches = {"ll": self.ll_tabs, "of": self.of_tabs, "ml": self.ml_tabs}
        logs = {"ll": self.ll_logs, "of": self.of_logs, "ml": self.ml_logs}
        widths = {"ll": 512, "of": 256, "ml": 512}
        cur_huff = None
        if d.huffman_table is not None:
            cur_huff = self._add_huff_table(d.huffman_table)
        tids = {}
        for kind, tab in (("ll", d.ll_table), ("of", d.of_table),
                          ("ml", d.ml_table)):
            if tab is None:
                tids[kind] = None
            else:
                tids[kind] = caches[kind].add(
                    pack_fse_table(tab, widths[kind]))
                logs[kind].append(tab.acc_log)
        out = (cur_huff, tids["ll"], tids["of"], tids["ml"])
        self._dict_tids[key] = out
        return out

    _FSE_WIDTHS = {"ll": 512, "of": 256, "ml": 512}
    _FSE_MAX_LOGS = {"ll": C.LL_MAX_LOG, "of": C.OF_MAX_LOG,
                     "ml": C.ML_MAX_LOG}

    def _setup_fse(self, mode, data, cur, kind):
        caches = {"ll": self.ll_tabs, "of": self.of_tabs, "ml": self.ml_tabs}
        logs = {"ll": self.ll_logs, "of": self.of_logs, "ml": self.ml_logs}
        widths = self._FSE_WIDTHS
        max_logs = self._FSE_MAX_LOGS
        if mode == C.MODE_PREDEFINED:
            # packing + re-hashing the constant predefined row per block was
            # ~45% of the 128 MiB walk — memoize the registered tid (cleared
            # with _dict_tids on fallback-frame rollback: stripped rows
            # invalidate ids)
            memo = self._std_tids.get(("pred", kind))
            if memo is not None:
                return memo[0], 0  # logs[tid] already registered
            t = _predefined_table(kind)
            row = _PREDEF_PACKED.get(kind)
            if row is None:
                row = _PREDEF_PACKED[kind] = pack_fse_table(t, widths[kind])
            tid = caches[kind].add(row)
            logs[kind].append(t.acc_log)
            self._std_tids[("pred", kind)] = (tid, t.acc_log)
            return tid, 0
        if mode == C.MODE_RLE:
            if len(data) < 1:
                raise ZstdError("missing RLE byte")
            memo = self._std_tids.get(("rle", kind, data[0]))
            if memo is not None:
                return memo[0], 1  # logs[tid] already registered
            t = fse.build_table_from_rle(data[0])
            tid = caches[kind].add(pack_fse_table(t, widths[kind]))
            logs[kind].append(0)
            self._std_tids[("rle", kind, data[0])] = (tid, 0)
            return tid, 1
        if mode == C.MODE_FSE:
            from zstd_tpu.oracle.sequences import _native_runtime

            # an FSE table description is < 512 bytes by construction
            # (<= 53 symbols x <= 11 bits + repeat flags at acc_log <= 9);
            # slicing bounds the bytes() copy the parsers take, instead of
            # copying the whole remaining block tail per setup
            desc = bytes(data[:512])
            rt = _native_runtime()
            if rt is not None:
                res = rt.fse_parse_packed(desc, max_logs[kind],
                                          widths[kind])
                if isinstance(res, tuple):
                    row, acc_log, consumed = res
                    tid = caches[kind].add(row)
                    logs[kind].append(acc_log)
                    return tid, consumed
            rdr = BitReader(desc)
            t = fse.parse_fse_table(rdr, max_logs[kind])
            tid = caches[kind].add(pack_fse_table(t, widths[kind]))
            logs[kind].append(t.acc_log)
            return tid, rdr.bits_read() // 8
        if cur is None:
            raise ZstdError(f"{kind} repeat mode without previous table")
        return cur, 0

    # ---- batch assembly ------------------------------------------------------

    def build(self) -> DeviceBatch:
        # +1 inert frame row: execution-bucket padding gathers point at it
        Bf = len(self.frames) + 1
        lit_w = _round_pow2(max((f["lit_cursor"] for f in self.frames), default=1))
        # sequence-slot width paces the offset-resolution scan linearly:
        # quantize to whole 1024-slot chunks, not powers of two (up to 2x
        # wasted scan steps); must stay 128-aligned for the row scatters
        max_sc = max((f["seq_cursor"] for f in self.frames), default=1)
        seq_w = max(128, -(-max_sc // 1024) * 1024) if max_sc > 128 \
            else _round_pow2(max_sc, lo=128)
        bounds = [f["fcs"] if f["fcs"] is not None else f["out_bound"]
                  for f in self.frames] or [1]
        out_w = _round_pow2(max(bounds))

        lit_base = np.zeros((Bf, lit_w), np.uint8)
        ll_base = np.zeros((Bf, seq_w), np.int32)
        ml_base = np.zeros((Bf, seq_w), np.int32)
        of_base = np.zeros((Bf, seq_w), np.int32)
        is_real = np.zeros((Bf, seq_w), bool)
        out_len = np.zeros(Bf, np.int32)
        frame_nseq = np.zeros(Bf, np.int32)
        frame_hist = np.tile(np.array(C.INITIAL_REPEAT_OFFSETS, np.int32),
                             (Bf, 1))
        row_lit_len = np.zeros(Bf, np.int32)
        row_meta = np.full(Bf, -1, np.int32)
        for mi, m in enumerate(self.metas):
            for r in m.rows:
                row_meta[r] = mi
        for i, f in enumerate(self.frames):
            if "hist" in f:
                frame_hist[i] = f["hist"]
            for off, chunk in f["lit_parts"]:
                lit_base[i, off:off + len(chunk)] = np.frombuffer(chunk, np.uint8)
            for slot, ll, ml, of in f["seqs"]:
                ll_base[i, slot] = ll
                ml_base[i, slot] = ml
                of_base[i, slot] = of
            m = self.metas[row_meta[i]]
            # FCS bounds only single-row frames; chained rows use the group
            # bound (exact lengths come from the device resolve)
            out_len[i] = (f["fcs"] + m.dict_skip
                          if f["fcs"] is not None and len(m.rows) == 1
                          else f["out_bound"])
            frame_nseq[i] = f["seq_cursor"]
            row_lit_len[i] = f["lit_cursor"]

        # huffman lanes (+1 inert row: bucket padding gathers point at it)
        Bs = len(self.huff_lanes) + 1
        hs_w = _round_pow2(max((len(h["stream"]) for h in self.huff_lanes), default=1))
        max_sym = _round_pow2(max((h["nsym"] for h in self.huff_lanes), default=1))
        huff_streams = np.zeros((Bs, hs_w), np.uint8)
        huff_pos = np.full(Bs, -1, np.int32)
        huff_tid = np.zeros(Bs, np.int32)
        huff_nsym = np.zeros(Bs, np.int32)
        huff_dst_frame = np.zeros(Bs, np.int32)
        huff_dst_off = np.zeros(Bs, np.int32)
        huff_len = np.zeros(Bs, np.int32)
        for i, h in enumerate(self.huff_lanes):
            huff_len[i] = len(h["stream"])
            huff_streams[i, :len(h["stream"])] = np.frombuffer(h["stream"], np.uint8)
            huff_pos[i] = h["pos"]
            huff_tid[i] = h["tid"]
            huff_nsym[i] = h["nsym"]
            huff_dst_frame[i] = h["frame"]
            huff_dst_off[i] = h["dst"]

        # sequence lanes (+1 inert row for bucket padding)
        Bb = len(self.seq_lanes) + 1
        ss_w = _round_pow2(max((len(s["stream"]) for s in self.seq_lanes), default=1))
        max_seqs = _round_pow2(max((s["n"] for s in self.seq_lanes), default=1), lo=4)
        seq_streams = np.zeros((Bb, ss_w), np.uint8)
        seq_pos = np.full(Bb, -1, np.int32)
        seq_n = np.zeros(Bb, np.int32)
        ll_tid = np.zeros(Bb, np.int32)
        of_tid = np.zeros(Bb, np.int32)
        ml_tid = np.zeros(Bb, np.int32)
        seq_dst_frame = np.zeros(Bb, np.int32)
        seq_dst_off = np.zeros(Bb, np.int32)
        seq_lit_total = np.zeros(Bb, np.int32)
        # dummy/padded lanes must scatter their trailing run out of bounds
        seq_trail_slot = np.full(Bb, 1 << 30, np.int32)
        seq_len = np.zeros(Bb, np.int32)
        for i, s in enumerate(self.seq_lanes):
            seq_len[i] = len(s["stream"])
            seq_streams[i, :len(s["stream"])] = np.frombuffer(s["stream"], np.uint8)
            seq_pos[i] = s["pos"]
            seq_n[i] = s["n"]
            ll_tid[i] = s["ll"]
            of_tid[i] = s["of"]
            ml_tid[i] = s["ml"]
            seq_dst_frame[i] = s["frame"]
            seq_dst_off[i] = s["dst"]
            seq_lit_total[i] = s["lit_total"]
            seq_trail_slot[i] = s["trail"]
            is_real[s["frame"], s["dst"]:s["dst"] + s["n"]] = True

        return DeviceBatch(
            huff_streams=huff_streams, huff_pos=huff_pos, huff_tid=huff_tid,
            huff_nsym=huff_nsym,
            huff_tables=self.huff_tabs.stack(np.uint16),
            huff_maxbits=np.asarray(self.huff_maxbits or [1], np.int32),
            huff_bnd=(np.stack(self.huff_bnd).astype(np.int32)
                      if self.huff_bnd else np.zeros((1, 16), np.int32)),
            huff_syms=(np.stack(self.huff_syms).astype(np.int32)
                       if self.huff_syms else np.zeros((1, 64), np.int32)),
            huff_nranks=np.asarray(self.huff_nranks or [1], np.int32),
            huff_dst_frame=huff_dst_frame, huff_dst_off=huff_dst_off,
            huff_len=huff_len,
            seq_streams=seq_streams, seq_pos=seq_pos, seq_n=seq_n,
            ll_tid=ll_tid, of_tid=of_tid, ml_tid=ml_tid,
            ll_tables=self.ll_tabs.stack(np.uint32),
            of_tables=self.of_tabs.stack(np.uint32),
            ml_tables=self.ml_tabs.stack(np.uint32),
            ll_logs=np.asarray(self.ll_logs or [0], np.int32),
            of_logs=np.asarray(self.of_logs or [0], np.int32),
            ml_logs=np.asarray(self.ml_logs or [0], np.int32),
            seq_dst_frame=seq_dst_frame, seq_dst_off=seq_dst_off,
            seq_lit_total=seq_lit_total, seq_trail_slot=seq_trail_slot,
            seq_len=seq_len,
            lit_base=lit_base, ll_base=ll_base, ml_base=ml_base,
            of_base=of_base, is_real=is_real, out_len=out_len,
            frame_nseq=frame_nseq, frame_hist=frame_hist,
            row_lit_len=row_lit_len, row_meta=row_meta,
            metas=self.metas, out_width=out_w,
            max_huff_symbols=max_sym, max_seqs=max_seqs)
