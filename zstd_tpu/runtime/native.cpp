// Native host runtime for tpu-zstd.
//
// The reference implements its entire runtime in native code (Rust); here
// the host-side hot paths that surround the TPU compute graph are C++:
//   - xxhash64 (content checksums at memory speed; the NumPy/Python
//     streaming fallback is ~100x slower)
//   - LZ77 sequence execution (the host decode path / streaming drain),
//     overlap-safe like decode_buffer.rs repeat()
//   - frame boundary scanning (block-header walk for the batch splitter)
//
// Built as a plain shared library; Python binds via ctypes (no pybind11 in
// the image). Exposed functions use only C types.

#include <cstdint>
#include <cstring>
#include <cstddef>
#include <algorithm>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// xxhash64 (seed 0)
// ---------------------------------------------------------------------------

static const uint64_t P1 = 0x9E3779B185EBCA87ULL;
static const uint64_t P2 = 0xC2B2AE3D27D4EB4FULL;
static const uint64_t P3 = 0x165667B19E3779F9ULL;
static const uint64_t P4 = 0x85EBCA77C2B2AE63ULL;
static const uint64_t P5 = 0x27D4EB2F165667C5ULL;

static inline uint64_t rotl(uint64_t x, int r) {
    return (x << r) | (x >> (64 - r));
}

static inline uint64_t rd64(const uint8_t* p) {
    uint64_t v;
    memcpy(&v, p, 8);
    return v;  // little-endian hosts only (x86/arm)
}

static inline uint64_t rd32(const uint8_t* p) {
    uint32_t v;
    memcpy(&v, p, 4);
    return v;
}

static inline uint64_t xxh_round(uint64_t acc, uint64_t lane) {
    acc += lane * P2;
    return rotl(acc, 31) * P1;
}

static inline uint64_t merge_round(uint64_t acc, uint64_t val) {
    acc ^= xxh_round(0, val);
    return acc * P1 + P4;
}

uint64_t zt_xxh64(const uint8_t* data, uint64_t len) {
    const uint8_t* p = data;
    const uint8_t* end = data + len;
    uint64_t h;
    if (len >= 32) {
        uint64_t v1 = P1 + P2, v2 = P2, v3 = 0, v4 = (uint64_t)0 - P1;
        const uint8_t* limit = end - 32;
        do {
            v1 = xxh_round(v1, rd64(p));
            v2 = xxh_round(v2, rd64(p + 8));
            v3 = xxh_round(v3, rd64(p + 16));
            v4 = xxh_round(v4, rd64(p + 24));
            p += 32;
        } while (p <= limit);
        h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
        h = merge_round(h, v1);
        h = merge_round(h, v2);
        h = merge_round(h, v3);
        h = merge_round(h, v4);
    } else {
        h = P5;
    }
    h += len;
    while (p + 8 <= end) {
        h ^= xxh_round(0, rd64(p));
        h = rotl(h, 27) * P1 + P4;
        p += 8;
    }
    if (p + 4 <= end) {
        h ^= rd32(p) * P1;
        h = rotl(h, 23) * P2 + P3;
        p += 4;
    }
    while (p < end) {
        h ^= (*p) * P5;
        h = rotl(h, 11) * P1;
        p++;
    }
    h ^= h >> 33;
    h *= P2;
    h ^= h >> 29;
    h *= P3;
    h ^= h >> 32;
    return h;
}

// Streaming state for the drain path.
struct ZtXxh64State {
    uint64_t v1, v2, v3, v4;
    uint64_t total;
    uint8_t tail[32];
    uint32_t tail_len;
};

void zt_xxh64_init(ZtXxh64State* s) {
    s->v1 = P1 + P2;
    s->v2 = P2;
    s->v3 = 0;
    s->v4 = (uint64_t)0 - P1;
    s->total = 0;
    s->tail_len = 0;
}

void zt_xxh64_update(ZtXxh64State* s, const uint8_t* data, uint64_t len) {
    s->total += len;
    if (s->tail_len) {
        uint32_t need = 32 - s->tail_len;
        uint32_t take = len < need ? (uint32_t)len : need;
        memcpy(s->tail + s->tail_len, data, take);
        s->tail_len += take;
        data += take;
        len -= take;
        if (s->tail_len < 32) return;
        s->v1 = xxh_round(s->v1, rd64(s->tail));
        s->v2 = xxh_round(s->v2, rd64(s->tail + 8));
        s->v3 = xxh_round(s->v3, rd64(s->tail + 16));
        s->v4 = xxh_round(s->v4, rd64(s->tail + 24));
        s->tail_len = 0;
    }
    while (len >= 32) {
        s->v1 = xxh_round(s->v1, rd64(data));
        s->v2 = xxh_round(s->v2, rd64(data + 8));
        s->v3 = xxh_round(s->v3, rd64(data + 16));
        s->v4 = xxh_round(s->v4, rd64(data + 24));
        data += 32;
        len -= 32;
    }
    if (len) {
        memcpy(s->tail, data, len);
        s->tail_len = (uint32_t)len;
    }
}

uint64_t zt_xxh64_digest(const ZtXxh64State* s) {
    uint64_t h;
    if (s->total >= 32) {
        h = rotl(s->v1, 1) + rotl(s->v2, 7) + rotl(s->v3, 12) + rotl(s->v4, 18);
        h = merge_round(h, s->v1);
        h = merge_round(h, s->v2);
        h = merge_round(h, s->v3);
        h = merge_round(h, s->v4);
    } else {
        h = P5;
    }
    h += s->total;
    const uint8_t* p = s->tail;
    const uint8_t* end = s->tail + s->tail_len;
    while (p + 8 <= end) {
        h ^= xxh_round(0, rd64(p));
        h = rotl(h, 27) * P1 + P4;
        p += 8;
    }
    if (p + 4 <= end) {
        h ^= rd32(p) * P1;
        h = rotl(h, 23) * P2 + P3;
        p += 4;
    }
    while (p < end) {
        h ^= (*p) * P5;
        h = rotl(h, 11) * P1;
        p++;
    }
    h ^= h >> 33;
    h *= P2;
    h ^= h >> 29;
    h *= P3;
    h ^= h >> 32;
    return h;
}

// ---------------------------------------------------------------------------
// LZ77 sequence execution (host path)
// ---------------------------------------------------------------------------
// Executes sequences into `out` (caller-allocated, capacity out_cap).
// Arrays ll/ml/offset have n entries; offsets are fully resolved (no
// repcodes). dict/dict_len serve matches reaching before the frame start.
// Returns bytes written, or -1 on any bounds violation.

int64_t zt_execute_sequences(const int32_t* ll, const int32_t* ml,
                             const int32_t* offset, int64_t n,
                             const uint8_t* literals, int64_t lit_len,
                             const uint8_t* dict, int64_t dict_len,
                             uint8_t* out, int64_t out_cap) {
    int64_t op = 0;   // output cursor
    int64_t lp = 0;   // literal cursor
    for (int64_t i = 0; i < n; i++) {
        int64_t l = ll[i], m = ml[i];
        int64_t off = offset[i];
        if (l < 0 || m < 0 || lp + l > lit_len || op + l + m > out_cap)
            return -1;
        memcpy(out + op, literals + lp, (size_t)l);
        op += l;
        lp += l;
        if (m == 0) continue;
        if (off <= 0) return -1;
        int64_t src = op - off;
        if (src < 0) {
            // serve from dictionary content
            int64_t gap = -src;
            if (gap > dict_len) return -1;
            int64_t take = gap < m ? gap : m;
            memcpy(out + op, dict + dict_len - gap, (size_t)take);
            op += take;
            m -= take;
            src = 0;
        }
        // overlap-safe chunked copy (offset-periodic fill)
        while (m > 0) {
            int64_t chunk = off < m ? off : m;
            memcpy(out + op, out + op - off, (size_t)chunk);
            op += chunk;
            m -= chunk;
        }
    }
    if (lp < lit_len) {
        if (op + (lit_len - lp) > out_cap) return -1;
        memcpy(out + op, literals + lp, (size_t)(lit_len - lp));
        op += lit_len - lp;
    }
    return op;
}

// ---------------------------------------------------------------------------
// Frame boundary scan (batch splitter hot path)
// ---------------------------------------------------------------------------
// Writes up to max_frames (offset, length, kind) triples; kind 0 = zstd
// frame, 1 = skippable. Returns count, or -(errpos+1) on malformed input.

int64_t zt_scan_frames(const uint8_t* data, int64_t len,
                       int64_t* offsets, int64_t* lengths, int32_t* kinds,
                       int64_t max_frames) {
    int64_t pos = 0;
    int64_t count = 0;
    while (pos < len && count < max_frames) {
        if (len - pos < 4) return -(pos + 1);
        uint32_t magic = (uint32_t)rd32(data + pos);
        int64_t start = pos;
        if ((magic & 0xFFFFFFF0u) == 0x184D2A50u) {
            if (len - pos < 8) return -(pos + 1);
            uint32_t sz = (uint32_t)rd32(data + pos + 4);
            pos += 8 + sz;
            if (pos > len) return -(start + 1);
            offsets[count] = start;
            lengths[count] = pos - start;
            kinds[count] = 1;
            count++;
            continue;
        }
        if (magic != 0xFD2FB528u) return -(pos + 1);
        pos += 4;
        if (pos >= len) return -(start + 1);
        uint8_t desc = data[pos++];
        int fcs_flag = desc >> 6;
        int single = (desc >> 5) & 1;
        int checksum = (desc >> 2) & 1;
        int did = desc & 3;
        if (!single) pos += 1;  // window descriptor
        static const int did_len[4] = {0, 1, 2, 4};
        pos += did_len[did];
        static const int fcs_len[4] = {0, 2, 4, 8};
        pos += single && fcs_flag == 0 ? 1 : fcs_len[fcs_flag];
        // walk blocks
        for (;;) {
            if (pos + 3 > len) return -(start + 1);
            uint32_t bh = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16);
            pos += 3;
            int last = bh & 1;
            int btype = (bh >> 1) & 3;
            uint32_t bsize = bh >> 3;
            if (btype == 3) return -(start + 1);
            pos += (btype == 1) ? 1 : bsize;
            if (pos > len) return -(start + 1);
            if (last) break;
        }
        if (checksum) pos += 4;
        if (pos > len) return -(start + 1);
        offsets[count] = start;
        lengths[count] = pos - start;
        kinds[count] = 0;
        count++;
    }
    return count;
}

// Exact bit cost of one FSE code stream (the tANS state chain is serial;
// the Python loop dominated encode planning). Mirrors
// encoding/block_enc.py::_sim_bits: init from the LAST symbol emits
// nothing, each earlier symbol (reverse order) emits (state + delta_nb) >>
// 16 bits, flush emits table_log.
int64_t zt_fse_sim_bits(const int32_t* codes, int64_t n,
                        const int32_t* delta_nb_bits,
                        const int32_t* delta_find_state,
                        const int32_t* next_state,
                        int32_t init_state, int32_t table_log) {
    if (n <= 0) return table_log;
    int64_t bits = 0;
    int32_t state = init_state;
    for (int64_t i = n - 2; i >= 0; --i) {
        int32_t c = codes[i];
        int32_t nb = (state + delta_nb_bits[c]) >> 16;
        bits += nb;
        state = next_state[(state >> nb) + delta_find_state[c]];
    }
    return bits + table_log;
}

// ---------------------------------------------------------------------------
// Reverse bit reader (host decode hot loops)
// ---------------------------------------------------------------------------
// Mirrors utils/bitio.py ReverseBitReader: bit i of the stream is
// (data[i/8] >> (i%8)) & 1; reads consume the highest unread bits; reads
// past the start return phantom zero bits and drive `pos` negative (the
// format's loop-termination idiom, bit_reader_reverse.rs:6-163).

struct RevBits {
    const uint8_t* data;
    int64_t len;
    int64_t pos;  // bits remaining
};

static inline int rev_init(RevBits* r, const uint8_t* data, int64_t len) {
    if (len <= 0) return -1;
    uint8_t last = data[len - 1];
    if (last == 0) return -1;  // padding byte must carry the sentinel 1 bit
    int hb = 31 - __builtin_clz((uint32_t)last);
    r->data = data;
    r->len = len;
    r->pos = (len - 1) * 8 + hb;
    return 0;
}

static inline uint64_t rev_get(RevBits* r, int n) {
    if (n == 0) return 0;
    r->pos -= n;
    int64_t start = r->pos;
    uint64_t mask = (n >= 64) ? ~0ULL : ((1ULL << n) - 1);
    if (start >= 0) {
        int64_t lo = start >> 3;
        uint64_t window = 0;
        int64_t avail = r->len - lo;
        memcpy(&window, r->data + lo, avail > 8 ? 8 : (size_t)avail);
        return (window >> (start & 7)) & mask;
    }
    int64_t avail_bits = start + n;  // real bits available (may be <= 0)
    if (avail_bits <= 0) return 0;
    uint64_t window = 0;
    int64_t nb = (avail_bits + 7) >> 3;
    memcpy(&window, r->data, nb > 8 ? 8 : (size_t)nb);
    uint64_t real = window & ((1ULL << avail_bits) - 1);
    return real << (-start);
}

// ---------------------------------------------------------------------------
// Interleaved 3-state tANS sequence decode + repcode resolution
// ---------------------------------------------------------------------------
// The host-path mirror of oracle/sequences.py::decode_sequences +
// resolve_offset (reference hot loop 2, sequence_section_decoder.rs:154-221
// and sequence_execution.rs:59-115). Tables are the oracle's FSETable
// arrays; (ll|ml)_cb_base/bits are the spec code->value tables passed from
// constants.py. hist[3] is the repeat-offset history, updated in place.
// Writes n resolved (ll, ml, offset) triples. Returns n, or:
//   -1 exhausted early   -2 extra bits left at end
//   -3 of code > 31   -4 ml code out of range    -5 ll code out of range
//   -6 repeat offset decremented to zero   -7 bitstream init failed

int64_t zt_decode_sequences(
    const uint8_t* stream, int64_t len, int64_t nseq,
    const uint8_t* ll_sym, const uint16_t* ll_base, const uint8_t* ll_nb,
    int32_t ll_log,
    const uint8_t* of_sym, const uint16_t* of_base, const uint8_t* of_nb,
    int32_t of_log,
    const uint8_t* ml_sym, const uint16_t* ml_base, const uint8_t* ml_nb,
    int32_t ml_log,
    const int32_t* ll_cb_base, const int32_t* ll_cb_bits, int32_t ll_max_code,
    const int32_t* ml_cb_base, const int32_t* ml_cb_bits, int32_t ml_max_code,
    int32_t* out_ll, int32_t* out_ml, int32_t* out_of, int64_t* hist) {
    RevBits r;
    if (rev_init(&r, stream, len) != 0) return -7;
    uint32_t ll_state = (uint32_t)rev_get(&r, ll_log);
    uint32_t of_state = (uint32_t)rev_get(&r, of_log);
    uint32_t ml_state = (uint32_t)rev_get(&r, ml_log);
    int64_t h0 = hist[0], h1 = hist[1], h2 = hist[2];
    for (int64_t i = 0; i < nseq; i++) {
        uint32_t of_code = of_sym[of_state];
        uint32_t ml_code = ml_sym[ml_state];
        uint32_t ll_code = ll_sym[ll_state];
        if (of_code > 31) return -3;
        if ((int32_t)ml_code > ml_max_code) return -4;
        if ((int32_t)ll_code > ll_max_code) return -5;
        // extra bits OF -> ML -> LL (highest bits to OF)
        int64_t of_value = ((int64_t)1 << of_code) + (int64_t)rev_get(&r, of_code);
        int64_t ml = ml_cb_base[ml_code] + (int64_t)rev_get(&r, ml_cb_bits[ml_code]);
        int64_t ll = ll_cb_base[ll_code] + (int64_t)rev_get(&r, ll_cb_bits[ll_code]);
        // repeat-offset resolution (mutating history)
        int64_t offset;
        if (of_value > 3) {
            offset = of_value - 3;
            h2 = h1; h1 = h0; h0 = offset;
        } else {
            int64_t idx = (ll == 0) ? of_value + 1 : of_value;
            if (idx == 1) {
                offset = h0;
            } else if (idx == 2) {
                offset = h1; h1 = h0; h0 = offset;
            } else if (idx == 3) {
                offset = h2; h2 = h1; h1 = h0; h0 = offset;
            } else {  // idx == 4: repcode1 - 1
                offset = h0 - 1;
                if (offset == 0) return -6;
                h2 = h1; h1 = h0; h0 = offset;
            }
        }
        out_ll[i] = (int32_t)ll;
        out_ml[i] = (int32_t)ml;
        out_of[i] = (int32_t)offset;
        if (i != nseq - 1) {
            // state updates LL -> ML -> OF
            int nb = ll_nb[ll_state];
            ll_state = ll_base[ll_state] + (uint32_t)rev_get(&r, nb);
            nb = ml_nb[ml_state];
            ml_state = ml_base[ml_state] + (uint32_t)rev_get(&r, nb);
            nb = of_nb[of_state];
            of_state = of_base[of_state] + (uint32_t)rev_get(&r, nb);
        }
        if (r.pos < 0) return -1;
    }
    if (r.pos != 0) return r.pos > 0 ? -2 : -1;
    hist[0] = h0; hist[1] = h1; hist[2] = h2;
    return nseq;
}

// ---------------------------------------------------------------------------
// FSE decode-table build (table spread + per-state baseline/num_bits)
// ---------------------------------------------------------------------------
// oracle/fse.py::build_table_from_probabilities mirror
// (fse_decoder.rs:141-219, 340-366). probs are -1..=prob values; acc_log
// <= 9 so the table is <= 512 entries. Returns 0, or:
//   -1 too many -1 probabilities   -2 spread did not return to position 0

int64_t zt_fse_build_table(const int32_t* probs, int64_t nprobs,
                           int32_t acc_log, uint8_t* symbols,
                           uint16_t* base_line, uint8_t* num_bits) {
    int64_t size = (int64_t)1 << acc_log;
    int64_t state_desc[256] = {0};
    int64_t high_threshold = size;
    for (int64_t s = 0; s < nprobs; s++) {
        if (probs[s] == -1) {
            high_threshold--;
            if (high_threshold < 0) return -1;
            symbols[high_threshold] = (uint8_t)s;
            state_desc[s] = 1;
        }
    }
    int64_t step = (size >> 1) + (size >> 3) + 3;
    int64_t mask = size - 1;
    int64_t pos = 0;
    for (int64_t s = 0; s < nprobs; s++) {
        int32_t p = probs[s];
        if (p <= 0) continue;
        state_desc[s] = p;
        for (int32_t k = 0; k < p; k++) {
            symbols[pos] = (uint8_t)s;
            pos = (pos + step) & mask;
            while (pos >= high_threshold) pos = (pos + step) & mask;
        }
    }
    if (pos != 0) return -2;
    for (int64_t i = 0; i < size; i++) {
        uint8_t s = symbols[i];
        int64_t cnt = state_desc[s];
        state_desc[s] = cnt + 1;
        int hb = 63 - __builtin_clzll((uint64_t)cnt);  // bit_length - 1
        int nb = acc_log - hb;
        num_bits[i] = (uint8_t)nb;
        base_line[i] = (uint16_t)((cnt << nb) - size);
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Huffman stream decode (host path)
// ---------------------------------------------------------------------------
// oracle/huff0.py::decode_stream mirror (reference hot loop 1,
// literals_section_decoder.rs:88-147): canonical LUT decode until exactly
// -max_bits bits remain. Returns symbols written, or:
//   -1 bitstream init failed   -2 produced more than `expected`
//   -3 produced a different count than `expected`

int64_t zt_huff_decode(const uint8_t* stream, int64_t len,
                       const uint8_t* sym, const uint8_t* nb,
                       int32_t max_bits, uint8_t* out, int64_t expected) {
    RevBits r;
    if (rev_init(&r, stream, len) != 0) return -1;
    uint32_t state = (uint32_t)rev_get(&r, max_bits);
    uint32_t mask = (1u << max_bits) - 1;
    int64_t count = 0;
    int64_t limit = -(int64_t)max_bits;
    while (r.pos > limit) {
        if (count >= expected) return -2;
        out[count++] = sym[state];
        int n = nb[state];
        state = ((state << n) & mask) | (uint32_t)rev_get(&r, n);
    }
    if (count != expected) return -3;
    return count;
}

// ---------------------------------------------------------------------------
// LZ77 execution appending into an existing buffer
// ---------------------------------------------------------------------------
// Like zt_execute_sequences but `buf` already holds `base` bytes of decode
// history (the window) — matches read straight from it, so streaming block
// decode pays no window copy. Returns the new total length, or -1 on any
// bounds violation (buffer is then in an undefined state; caller rolls back).

int64_t zt_execute_append(const int32_t* ll, const int32_t* ml,
                          const int32_t* offset, int64_t n,
                          const uint8_t* literals, int64_t lit_len,
                          const uint8_t* dict, int64_t dict_len,
                          uint8_t* buf, int64_t base, int64_t cap) {
    int64_t op = base;
    int64_t lp = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t l = ll[i], m = ml[i];
        int64_t off = offset[i];
        if (l < 0 || m < 0 || lp + l > lit_len || op + l + m > cap)
            return -1;
        memcpy(buf + op, literals + lp, (size_t)l);
        op += l;
        lp += l;
        if (m == 0) continue;
        if (off <= 0) return -1;
        int64_t src = op - off;
        if (src < 0) {
            int64_t gap = -src;
            if (gap > dict_len) return -1;
            int64_t take = gap < m ? gap : m;
            memcpy(buf + op, dict + dict_len - gap, (size_t)take);
            op += take;
            m -= take;
        }
        while (m > 0) {
            int64_t chunk = off < m ? off : m;
            memcpy(buf + op, buf + op - off, (size_t)chunk);
            op += chunk;
            m -= chunk;
        }
    }
    if (lp < lit_len) {
        if (op + (lit_len - lp) > cap) return -1;
        memcpy(buf + op, literals + lp, (size_t)(lit_len - lp));
        op += lit_len - lp;
    }
    return op;
}

// ---------------------------------------------------------------------------
// Encode-side hot loops (host path)
// ---------------------------------------------------------------------------

// Greedy single-probe match finder — exact port of
// encoding/match_gen.py::find_sequences (direct-mapped 5-byte-hash table,
// last-writer-wins, forward+backward extension, one in-match re-register).
// Emits (lit_len, offset, match_len) records; a trailing-literals record
// has offset == match_len == 0. Returns record count, or -1 if out_cap is
// too small.

int64_t zt_find_sequences(const uint8_t* data, int64_t n,
                          int32_t* out_ll, int32_t* out_off, int32_t* out_ml,
                          int64_t out_cap, int32_t* table /* 1<<16, -1 init */) {
    const int64_t MIN_MATCH = 5, HASH_LOG = 16;
    const uint64_t POLY = 0x00CF3BCCDCABULL;
    int64_t count = 0;
    if (n < MIN_MATCH + 3) {
        if (n > 0) {
            if (out_cap < 1) return -1;
            out_ll[0] = (int32_t)n; out_off[0] = 0; out_ml[0] = 0;
            count = 1;
        }
        return count;
    }
    for (int64_t i = 0; i < (1 << HASH_LOG); i++) table[i] = -1;
    int64_t anchor = 0, pos = 0;
    int64_t limit = n - MIN_MATCH;
    auto hash5 = [&](int64_t p) -> uint32_t {
        uint64_t v = (uint64_t)data[p] | ((uint64_t)data[p + 1] << 8)
                   | ((uint64_t)data[p + 2] << 16)
                   | ((uint64_t)data[p + 3] << 24)
                   | ((uint64_t)data[p + 4] << 32);
        return (uint32_t)((v * POLY) >> (64 - HASH_LOG));
    };
    while (pos <= limit) {
        uint32_t h = hash5(pos);
        int64_t cand = table[h];
        table[h] = (int32_t)pos;
        if (cand >= 0 && memcmp(data + cand, data + pos, MIN_MATCH) == 0) {
            int64_t ml = MIN_MATCH;
            int64_t max_ml = n - pos;
            while (ml < max_ml && data[cand + ml] == data[pos + ml]) ml++;
            while (pos > anchor && cand > 0 && data[cand - 1] == data[pos - 1]) {
                pos--; cand--; ml++;
            }
            if (count >= out_cap) return -1;
            out_ll[count] = (int32_t)(pos - anchor);
            out_off[count] = (int32_t)(pos - cand);
            out_ml[count] = (int32_t)ml;
            count++;
            pos += ml;
            anchor = pos;
            if (pos - 2 > 0 && pos - 2 <= limit)
                table[hash5(pos - 2)] = (int32_t)(pos - 2);
        } else {
            pos++;
        }
    }
    if (anchor < n) {
        if (count >= out_cap) return -1;
        out_ll[count] = (int32_t)(n - anchor);
        out_off[count] = 0; out_ml[count] = 0;
        count++;
    }
    return count;
}

// Repeat-offset exploitation — exact port of
// encoding/block_enc.py::choose_offset_value applied over make_triples.
// Records with ml <= 0 are dropped. hist[3] mutated in place. use_hist=0
// reproduces the no-history path (of_value = offset + 3).

int64_t zt_make_triples(const int32_t* lit_len, const int32_t* offset,
                        const int32_t* match_len, int64_t n,
                        int64_t* hist, int32_t use_hist,
                        int32_t* out_ll, int32_t* out_ml, int32_t* out_ofv) {
    int64_t m = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t ml = match_len[i];
        if (ml <= 0) continue;
        int64_t ll = lit_len[i];
        int64_t off = offset[i];
        int64_t ofv = off + 3;
        if (use_hist) {
            int64_t c1, c2, c3;
            if (ll != 0) { c1 = hist[0]; c2 = hist[1]; c3 = hist[2]; }
            else { c1 = hist[1]; c2 = hist[2]; c3 = hist[0] - 1; }
            if (c1 == off && c1 > 0) ofv = 1;
            else if (c2 == off && c2 > 0) ofv = 2;
            else if (c3 == off && c3 > 0) ofv = 3;
            if (ofv > 3) {
                hist[2] = hist[1]; hist[1] = hist[0]; hist[0] = off;
            } else {
                int64_t idx = (ll == 0) ? ofv + 1 : ofv;
                if (idx == 2) { hist[1] = hist[0]; hist[0] = off; }
                else if (idx == 3 || idx == 4) {
                    hist[2] = hist[1]; hist[1] = hist[0]; hist[0] = off;
                }
            }
        }
        out_ll[m] = (int32_t)ll;
        out_ml[m] = (int32_t)ml;
        out_ofv[m] = (int32_t)ofv;
        m++;
    }
    return m;
}

struct ZtBitW {
    uint8_t* out;
    int64_t cap, len;
    uint64_t acc;
    int nbits;
};

static inline int bw_put(ZtBitW* w, uint64_t v, int n) {
    if (n == 0) return 0;
    w->acc |= (v & ((1ULL << n) - 1)) << w->nbits;
    w->nbits += n;
    while (w->nbits >= 8) {
        if (w->len >= w->cap) return -1;
        w->out[w->len++] = (uint8_t)(w->acc & 0xFF);
        w->acc >>= 8;
        w->nbits -= 8;
    }
    return 0;
}

// Interleaved 3-state FSE sequence-stream encode — exact port of
// encoding/block_enc.py::encode_sequences_section's bitstream half
// (reverse order, states updated OF/ML/LL, extras LL/ML/OF per record,
// flush ML/OF/LL, sentinel bit, byte padding). Code mapping from the spec
// tables passed in. A kind with mode RLE has en_*=0 and contributes no
// state bits. Returns bytes written or -1 (capacity).

int64_t zt_encode_seq_stream(
    const int32_t* ll, const int32_t* mlv, const int32_t* ofv, int64_t n,
    const int32_t* ll_cb_base, int32_t ll_ncodes,
    const int32_t* ll_cb_bits,
    const int32_t* ml_cb_base, int32_t ml_ncodes,
    const int32_t* ml_cb_bits,
    int32_t en_ll, const int32_t* ll_dnb, const int32_t* ll_dfs,
    const int32_t* ll_ns, int32_t ll_log,
    int32_t en_of, const int32_t* of_dnb, const int32_t* of_dfs,
    const int32_t* of_ns, int32_t of_log,
    int32_t en_ml, const int32_t* ml_dnb, const int32_t* ml_dfs,
    const int32_t* ml_ns, int32_t ml_log,
    uint8_t* out, int64_t cap) {
    if (n <= 0) return 0;
    ZtBitW w = {out, cap, 0, 0, 0};
    auto code_of = [](int64_t v) -> int { return 63 - __builtin_clzll((uint64_t)v); };
    auto code_in = [](const int32_t* base, int32_t ncodes, int64_t v) -> int {
        int lo = 0, hi = ncodes;  // upper_bound - 1
        while (lo < hi) { int mid = (lo + hi) >> 1;
            if (base[mid] <= v) lo = mid + 1; else hi = mid; }
        return lo - 1;
    };
    int32_t s_ll = 0, s_of = 0, s_ml = 0;
    auto init_state = [](int32_t* st, const int32_t* dnb, const int32_t* dfs,
                         const int32_t* ns, int c) {
        int nb = (dnb[c] + (1 << 15)) >> 16;
        int64_t value = ((int64_t)nb << 16) - dnb[c];
        *st = ns[(value >> nb) + dfs[c]];
    };
    auto enc = [&w](int32_t* st, const int32_t* dnb, const int32_t* dfs,
                    const int32_t* ns, int c) -> int {
        int nb = (*st + dnb[c]) >> 16;
        if (bw_put(&w, (uint64_t)(uint32_t)*st, nb) < 0) return -1;
        *st = ns[(*st >> nb) + dfs[c]];
        return 0;
    };
    int64_t last = n - 1;
    int llc = code_in(ll_cb_base, ll_ncodes, ll[last]);
    int mlc = code_in(ml_cb_base, ml_ncodes, mlv[last]);
    int ofc = code_of(ofv[last]);
    if (en_ml) init_state(&s_ml, ml_dnb, ml_dfs, ml_ns, mlc);
    if (en_of) init_state(&s_of, of_dnb, of_dfs, of_ns, ofc);
    if (en_ll) init_state(&s_ll, ll_dnb, ll_dfs, ll_ns, llc);
    if (bw_put(&w, (uint64_t)(ll[last] - ll_cb_base[llc]), ll_cb_bits[llc]) < 0 ||
        bw_put(&w, (uint64_t)(mlv[last] - ml_cb_base[mlc]), ml_cb_bits[mlc]) < 0 ||
        bw_put(&w, (uint64_t)(ofv[last] - (1LL << ofc)), ofc) < 0)
        return -1;
    for (int64_t i = n - 2; i >= 0; i--) {
        llc = code_in(ll_cb_base, ll_ncodes, ll[i]);
        mlc = code_in(ml_cb_base, ml_ncodes, mlv[i]);
        ofc = code_of(ofv[i]);
        if (en_of && enc(&s_of, of_dnb, of_dfs, of_ns, ofc) < 0) return -1;
        if (en_ml && enc(&s_ml, ml_dnb, ml_dfs, ml_ns, mlc) < 0) return -1;
        if (en_ll && enc(&s_ll, ll_dnb, ll_dfs, ll_ns, llc) < 0) return -1;
        if (bw_put(&w, (uint64_t)(ll[i] - ll_cb_base[llc]), ll_cb_bits[llc]) < 0 ||
            bw_put(&w, (uint64_t)(mlv[i] - ml_cb_base[mlc]), ml_cb_bits[mlc]) < 0 ||
            bw_put(&w, (uint64_t)(ofv[i] - (1LL << ofc)), ofc) < 0)
            return -1;
    }
    if (en_ml && bw_put(&w, (uint64_t)(uint32_t)s_ml, ml_log) < 0) return -1;
    if (en_of && bw_put(&w, (uint64_t)(uint32_t)s_of, of_log) < 0) return -1;
    if (en_ll && bw_put(&w, (uint64_t)(uint32_t)s_ll, ll_log) < 0) return -1;
    if (bw_put(&w, 1, 1) < 0) return -1;
    int pad = (8 - ((w.len * 8 + w.nbits) % 8)) % 8;
    if (bw_put(&w, 0, pad) < 0) return -1;
    return w.len;
}

// Huffman literal-stream encode — exact port of
// encoding/huff0_enc.py::_encode_stream (reverse symbol order, sentinel 1
// bit, byte padding). Returns bytes written, -1 on capacity, -2 when a
// symbol has no code.

int64_t zt_huff_encode_stream(const uint8_t* data, int64_t n,
                              const uint32_t* codes, const uint8_t* lens,
                              uint8_t* out, int64_t cap) {
    ZtBitW w = {out, cap, 0, 0, 0};
    for (int64_t i = n - 1; i >= 0; i--) {
        uint8_t b = data[i];
        int nb = lens[b];
        if (nb == 0) return -2;
        if (bw_put(&w, codes[b], nb) < 0) return -1;
    }
    if (bw_put(&w, 1, 1) < 0) return -1;
    int pad = (8 - ((w.len * 8 + w.nbits) % 8)) % 8;
    if (bw_put(&w, 0, pad) < 0) return -1;
    return w.len;
}

// ---------------------------------------------------------------------------
// Framer hot-path parsers (host block walk)
// ---------------------------------------------------------------------------
// The batch framer spends most of its host time parsing entropy-table
// descriptions (oracle/fse.py::read_probabilities, oracle/huff0.py::
// read_weights + build_table_from_weights + ops/huffman.py::
// huff_boundary_rows — profiled at ~75% of prepare()). These mirrors emit
// the device-ready packed rows directly. Any malformed input returns a
// negative code and the caller re-parses on the exact-typed-error Python
// path, so error taxonomy parity is preserved.

struct FwdBits {
    const uint8_t* data;
    int64_t len;
    int64_t pos;  // bits consumed
};

static inline int64_t fwd_get(FwdBits* f, int n) {
    // LSB-first forward read (utils/bitio.py BitReader). Reads beyond the
    // end return zeros; callers check f->pos <= len*8 afterwards.
    if (n == 0) return 0;
    int64_t start = f->pos;
    f->pos += n;
    int64_t lo = start >> 3;
    uint64_t window = 0;
    if (lo < f->len) {
        int64_t avail = f->len - lo;
        memcpy(&window, f->data + lo, avail > 8 ? 8 : (size_t)avail);
    }
    return (int64_t)((window >> (start & 7)) & ((1ULL << n) - 1));
}

// Parse an FSE table description (oracle/fse.py::read_probabilities:
// low-threshold trick + 2-bit zero-run escape, fse_decoder.rs:224-307).
// probs must hold >= 300 entries. meta out: {acc_log, nprobs,
// bytes_consumed}. Returns 0 or a negative error.
static int64_t fse_read_probs(const uint8_t* data, int64_t len,
                              int32_t max_log, int32_t* probs,
                              int32_t* meta) {
    FwdBits f = {data, len, 0};
    int acc_log = (int)fwd_get(&f, 4) + 5;
    if (acc_log > max_log) return -1;
    int64_t remaining = (int64_t)1 << acc_log;
    int n = 0;
    while (remaining > 0) {
        int bits = 64 - __builtin_clzll((uint64_t)(remaining + 1));
        int64_t val = fwd_get(&f, bits);
        int64_t lower_mask = ((int64_t)1 << (bits - 1)) - 1;
        int64_t threshold = ((int64_t)1 << bits) - 1 - (remaining + 1);
        if ((val & lower_mask) < threshold) {
            f.pos -= 1;
            val &= lower_mask;
        } else if (val > lower_mask) {
            val -= threshold;
        }
        int64_t prob = val - 1;
        remaining -= prob < 0 ? -prob : prob;
        probs[n++] = (int32_t)prob;
        if (prob == 0) {
            int64_t rep = fwd_get(&f, 2);
            for (;;) {
                if (n + rep > 290) return -2;
                for (int64_t k = 0; k < rep; k++) probs[n++] = 0;
                if (rep != 3) break;
                rep = fwd_get(&f, 2);
            }
        }
        if (n > 256) return -2;
    }
    if (remaining < 0) return -3;
    f.pos += (8 - (f.pos & 7)) & 7;  // descriptions occupy whole bytes
    if (f.pos > len * 8) return -4;  // overread (NotEnoughBytes on re-parse)
    meta[0] = acc_log;
    meta[1] = n;
    meta[2] = (int32_t)(f.pos >> 3);
    return 0;
}

// Parse an FSE table description and emit the packed device row
// (symbol | num_bits << 8 | baseline << 16 per entry, ops/sequence.py::
// pack_fse_table layout). row must hold `width` u32 (zeroed here).
// meta out: {acc_log, bytes_consumed}.

int64_t zt_fse_parse_packed(const uint8_t* data, int64_t len,
                            int32_t max_log, int32_t width, uint32_t* row,
                            int32_t* meta) {
    int32_t probs[300];
    int32_t m[3];
    int64_t r = fse_read_probs(data, len, max_log, probs, m);
    if (r < 0) return r;
    int32_t acc_log = m[0];
    int64_t size = (int64_t)1 << acc_log;
    if (size > width) return -5;
    uint8_t sym[512];
    uint16_t base[512];
    uint8_t nb[512];
    r = zt_fse_build_table(probs, m[1], acc_log, sym, base, nb);
    if (r < 0) return -6;
    memset(row, 0, (size_t)width * 4);
    for (int64_t i = 0; i < size; i++)
        row[i] = (uint32_t)sym[i] | ((uint32_t)nb[i] << 8)
               | ((uint32_t)base[i] << 16);
    meta[0] = acc_log;
    meta[1] = m[2];
    return 0;
}

// Full Huffman table-description parse: weights (direct nibbles or
// FSE-interleaved two-state decode, huff0_decoder.rs:132-278), canonical
// LUT build (:284-377), and the Pallas boundary rows (ops/huffman.py::
// huff_boundary_rows). Outputs: lut 2048 u16 (symbol | num_bits << 8),
// bnd 16 i32, syms 64 i32, meta {max_bits, nranks, bytes_consumed}.

int64_t zt_huff_parse(const uint8_t* data, int64_t len, uint16_t* lut,
                      int32_t* bnd, int32_t* syms, int32_t* meta) {
    if (len < 1) return -1;
    int32_t weights[300];
    int nw = 0;
    int64_t consumed;
    int header = data[0];
    if (header >= 128) {
        int n = header - 127;
        int64_t nbytes = (n + 1) / 2;
        if (len < 1 + nbytes) return -1;
        for (int i = 0; i < n; i++) {
            uint8_t b = data[1 + i / 2];
            weights[nw++] = (i % 2 == 0) ? (b >> 4) : (b & 0xF);
        }
        consumed = 1 + nbytes;
    } else {
        int64_t comp = header;
        if (len < 1 + comp) return -1;
        const uint8_t* payload = data + 1;
        int32_t probs[300];
        int32_t m[3];
        int64_t r = fse_read_probs(payload, comp, 6, probs, m);
        if (r < 0) return -2;
        uint8_t sym[64];
        uint16_t base[64];
        uint8_t nb[64];
        if (zt_fse_build_table(probs, m[1], m[0], sym, base, nb) < 0)
            return -2;
        RevBits rb;
        if (rev_init(&rb, payload + m[2], comp - m[2]) != 0) return -2;
        int acc = m[0];
        uint32_t s1 = (uint32_t)rev_get(&rb, acc);
        uint32_t s2 = (uint32_t)rev_get(&rb, acc);
        for (;;) {
            weights[nw++] = sym[s1];
            s1 = base[s1] + (uint32_t)rev_get(&rb, nb[s1]);
            if (rb.pos < 0) { weights[nw++] = sym[s2]; break; }
            weights[nw++] = sym[s2];
            s2 = base[s2] + (uint32_t)rev_get(&rb, nb[s2]);
            if (rb.pos < 0) { weights[nw++] = sym[s1]; break; }
            if (nw > 255) return -3;
        }
        if (nw > 255) return -3;
        consumed = 1 + comp;
    }

    // build_table_from_weights (oracle/huff0.py:93-140)
    int64_t wsum = 0;
    for (int i = 0; i < nw; i++) {
        if (weights[i] > 11) return -4;
        if (weights[i] > 0) wsum += (int64_t)1 << (weights[i] - 1);
    }
    if (wsum == 0) return -4;
    int max_bits = 64 - __builtin_clzll((uint64_t)wsum);  // bit_length
    if (max_bits > 11) return -4;
    int64_t left_over = ((int64_t)1 << max_bits) - wsum;
    if (left_over & (left_over - 1)) return -4;
    int last_weight = 64 - __builtin_clzll((uint64_t)left_over);
    weights[nw++] = last_weight;

    int64_t size = (int64_t)1 << max_bits;
    int64_t rank_count[14] = {0};
    for (int i = 0; i < nw; i++) rank_count[weights[i]]++;
    int64_t rank_idx[14] = {0};
    int64_t next_idx = 0;
    for (int w = 1; w <= max_bits; w++) {
        rank_idx[w] = next_idx;
        next_idx += rank_count[w] * ((int64_t)1 << (w - 1));
    }
    if (next_idx != size) return -4;
    memset(lut, 0, 2048 * 2);
    for (int s = 0; s < nw; s++) {
        int w = weights[s];
        if (w == 0) continue;
        int64_t span = (int64_t)1 << (w - 1);
        int64_t start = rank_idx[w];
        uint16_t v = (uint16_t)s | ((uint16_t)(max_bits + 1 - w) << 8);
        for (int64_t k = 0; k < span; k++) lut[start + k] = v;
        rank_idx[w] += span;
    }

    // boundary rows (ops/huffman.py::huff_boundary_rows)
    for (int i = 0; i < 16; i++) bnd[i] = 0xFFFF;
    memset(syms, 0, 64 * 4);
    int64_t idx = 0;
    int nranks = 0;
    for (int wt = 1; wt <= 12; wt++) {
        bnd[wt] = (int32_t)(idx | ((int64_t)nranks << 16));
        int64_t span = (int64_t)1 << (wt - 1);
        while (idx < size && (lut[idx] >> 8) == (uint16_t)(max_bits + 1 - wt)) {
            if (nranks >= 256) return -4;
            syms[nranks >> 2] |= (int32_t)(lut[idx] & 0xFF)
                                 << ((nranks & 3) * 8);
            nranks++;
            idx += span;
        }
    }
    if (idx != size) return -4;
    meta[0] = max_bits;
    meta[1] = nranks;
    meta[2] = (int32_t)consumed;
    return 0;
}

// ---------------------------------------------------------------------------
// Encoder table builds (host compress hot spots)
// ---------------------------------------------------------------------------
// Mirrors encoding/huff0_enc.py::_package_merge + build_from_counts and
// encoding/fse_enc.py::build_encode_table byte-for-byte (the Python paths
// remain the parity oracle; ZT_NO_NATIVE=1 forces them).

int64_t zt_huff_enc_build(const int64_t* counts,  // [256]
                          uint32_t* codes,        // [256] out
                          uint8_t* lens,          // [256] out
                          int32_t* weights_out,   // [256] out
                          int32_t* meta) {        // {max_bits, last_symbol}
    struct Item {
        int64_t count;
        std::vector<int> syms;
    };
    std::vector<Item> base, pool;
    int present[256], np_ = 0;
    for (int s = 0; s < 256; s++)
        if (counts[s] > 0) present[np_++] = s;
    if (np_ < 2) return -1;
    const int LIMIT = 11;
    // syms sorted by (count, symbol) — stable sort over ascending symbols
    std::vector<int> order(present, present + np_);
    std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
        return counts[a] < counts[b];
    });
    int64_t lengths[256] = {0};
    if (np_ == 1) {
        lengths[order[0]] = 1;
    } else {
        for (int s : order) base.push_back({counts[s], {s}});
        for (int r = 0; r < LIMIT - 1; r++) {
            std::vector<Item> merged = base;
            for (auto& it : pool) merged.push_back(it);
            std::stable_sort(merged.begin(), merged.end(),
                             [](const Item& a, const Item& b) {
                                 return a.count < b.count;
                             });
            pool.clear();
            for (size_t i = 0; i + 1 < merged.size(); i += 2) {
                Item m;
                m.count = merged[i].count + merged[i + 1].count;
                m.syms = merged[i].syms;
                m.syms.insert(m.syms.end(), merged[i + 1].syms.begin(),
                              merged[i + 1].syms.end());
                pool.push_back(std::move(m));
            }
        }
        std::vector<Item> fin = base;
        for (auto& it : pool) fin.push_back(it);
        std::stable_sort(fin.begin(), fin.end(),
                         [](const Item& a, const Item& b) {
                             return a.count < b.count;
                         });
        size_t take = 2 * (size_t)np_ - 2;
        for (size_t i = 0; i < take && i < fin.size(); i++)
            for (int s : fin[i].syms) lengths[s]++;
    }
    int max_len = 0;
    for (int s = 0; s < 256; s++)
        if (lengths[s] > max_len) max_len = (int)lengths[s];
    if (max_len > LIMIT || max_len == 0) return -2;
    int last_symbol = present[np_ - 1];
    int32_t weights[257];
    for (int s = 0; s <= last_symbol; s++)
        weights[s] = lengths[s] ? (int32_t)(max_len + 1 - lengths[s]) : 0;

    // build_table_from_weights on weights[:-1] with the implied last weight
    // (oracle/huff0.py:93-140); parity check: implied max_bits == max_len
    int64_t wsum = 0;
    for (int s = 0; s < last_symbol; s++)
        if (weights[s] > 0) wsum += (int64_t)1 << (weights[s] - 1);
    if (wsum == 0) return -2;
    int max_bits = 64 - __builtin_clzll((uint64_t)wsum);
    if (max_bits != max_len) return -3;
    int64_t left_over = ((int64_t)1 << max_bits) - wsum;
    if (left_over & (left_over - 1)) return -3;
    int last_weight = 64 - __builtin_clzll((uint64_t)left_over);
    if (last_weight != weights[last_symbol]) return -3;

    int64_t rank_count[14] = {0};
    for (int s = 0; s <= last_symbol; s++) rank_count[weights[s]]++;
    int64_t rank_idx[14] = {0};
    int64_t next_idx = 0;
    for (int w = 1; w <= max_bits; w++) {
        rank_idx[w] = next_idx;
        next_idx += rank_count[w] * ((int64_t)1 << (w - 1));
    }
    if (next_idx != ((int64_t)1 << max_bits)) return -3;
    memset(codes, 0, 256 * 4);
    memset(lens, 0, 256);
    for (int s = 0; s <= last_symbol; s++) {
        int w = weights[s];
        if (w == 0) continue;
        int nb = max_bits + 1 - w;
        codes[s] = (uint32_t)(rank_idx[w] >> (w - 1));
        lens[s] = (uint8_t)nb;
        rank_idx[w] += (int64_t)1 << (w - 1);
    }
    for (int s = 0; s <= last_symbol; s++) weights_out[s] = weights[s];
    meta[0] = max_bits;
    meta[1] = last_symbol;
    return 0;
}

int64_t zt_fse_enc_build(const int32_t* probs, int64_t nprobs,
                         int32_t table_log,
                         uint16_t* next_state,       // [size] out
                         uint32_t* delta_nb_bits,    // [256] out
                         int32_t* delta_find_state)  // [256] out
{
    int64_t size = (int64_t)1 << table_log;
    int64_t mask = size - 1;
    int64_t step = (size >> 1) + (size >> 3) + 3;
    int64_t cumul[258] = {0};
    int64_t high_threshold = size - 1;
    std::vector<int> table_symbol((size_t)size, 0);
    for (int64_t s = 0; s < nprobs; s++) {
        if (probs[s] == -1) {
            cumul[s + 1] = cumul[s] + 1;
            table_symbol[(size_t)high_threshold--] = (int)s;
        } else {
            cumul[s + 1] = cumul[s] + probs[s];
        }
    }
    int64_t pos = 0;
    for (int64_t s = 0; s < nprobs; s++) {
        int32_t p = probs[s];
        if (p <= 0) continue;
        for (int32_t k = 0; k < p; k++) {
            table_symbol[(size_t)pos] = (int)s;
            pos = (pos + step) & mask;
            while (pos > high_threshold) pos = (pos + step) & mask;
        }
    }
    if (pos != 0) return -1;
    int64_t cc[258];
    memcpy(cc, cumul, sizeof(cc));
    for (int64_t u = 0; u < size; u++) {
        int s = table_symbol[(size_t)u];
        next_state[cc[s]++] = (uint16_t)(size + u);
    }
    memset(delta_nb_bits, 0, 256 * 4);
    memset(delta_find_state, 0, 256 * 4);
    int64_t total = 0;
    for (int64_t s = 0; s < nprobs; s++) {
        int64_t p = probs[s];
        if (p == 0) {
            delta_nb_bits[s] = (uint32_t)(((table_log + 1) << 16) - size);
        } else if (p == -1 || p == 1) {
            delta_nb_bits[s] = (uint32_t)((table_log << 16) - size);
            delta_find_state[s] = (int32_t)(total - 1);
            total += 1;
        } else {
            int hb = 64 - __builtin_clzll((uint64_t)(p - 1));  // bit_length
            int max_bits_out = table_log - hb + 1;
            int64_t min_state_plus = p << max_bits_out;
            delta_nb_bits[s] = (uint32_t)((max_bits_out << 16)
                                          - min_state_plus);
            delta_find_state[s] = (int32_t)(total - p);
            total += p;
        }
    }
    return 0;
}

}  // extern "C"
