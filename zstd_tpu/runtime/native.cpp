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
#include <cstdlib>
#include <ctime>
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

// Greedy single-probe match finder over one block [lo, hi) of a frame.
// `buf` holds the frame bytes from absolute position `base` onward (the
// caller keeps >= max_off + 8 bytes of history before lo, or everything
// when base == 0). `table` is the FRAME-lifetime candidate table (int32
// absolute positions, -1 empty) — the CALLER initializes it once per
// frame, so match sources reach up to max_off bytes back ACROSS earlier
// blocks (the advertised window), unlike the reference's per-slice
// window (match_generator.rs — its window also spans one slice).
int64_t zt_find_sequences(const uint8_t* buf, int64_t base,
                          int64_t lo, int64_t hi,
                          int32_t* out_ll, int32_t* out_off, int32_t* out_ml,
                          int64_t out_cap, int32_t* table, int64_t max_off) {
    const int64_t MIN_MATCH = 5, HASH_LOG = 16;
    const uint64_t POLY = 0x00CF3BCCDCABULL;
    const uint8_t* data = buf - base;  // data[p] = byte at absolute pos p
    int64_t n = hi - lo;
    int64_t count = 0;
    if (n < MIN_MATCH + 3) {
        if (n > 0) {
            if (out_cap < 1) return -1;
            out_ll[0] = (int32_t)n; out_off[0] = 0; out_ml[0] = 0;
            count = 1;
        }
        return count;
    }
    int64_t anchor = lo, pos = lo;
    int64_t limit = hi - MIN_MATCH;
    // 5-byte fetch: one unaligned word load when 8 bytes are in bounds
    // (all but the last 3 eligible positions), byte assembly otherwise
    auto rd40 = [&](int64_t p) -> uint64_t {
        if (p + 8 <= hi) return rd64(data + p) & 0xFFFFFFFFFFULL;
        uint64_t v = 0;
        for (int k = 0; k < 5; k++) v |= (uint64_t)data[p + k] << (8 * k);
        return v;
    };
    auto hash5 = [&](int64_t p) -> uint32_t {
        return (uint32_t)((rd40(p) * POLY) >> (64 - HASH_LOG));
    };
    while (pos <= limit) {
        uint64_t v40 = rd40(pos);
        uint32_t h = (uint32_t)((v40 * POLY) >> (64 - HASH_LOG));
        int64_t cand = table[h];
        table[h] = (int32_t)pos;
        if (cand >= 0 && cand < pos && pos - cand <= max_off
            && rd40(cand) == v40) {
            int64_t ml = MIN_MATCH;
            int64_t max_ml = hi - pos;
            // word-at-a-time extension (cand < pos keeps loads in bounds)
            while (ml + 8 <= max_ml) {
                uint64_t x = rd64(data + cand + ml) ^ rd64(data + pos + ml);
                if (x) { ml += __builtin_ctzll(x) >> 3; break; }
                ml += 8;
            }
            if (ml + 8 > max_ml)
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
    if (anchor < hi) {
        if (count >= out_cap) return -1;
        out_ll[count] = (int32_t)(hi - anchor);
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
    // n <= 56 per call (codes <= 11 bits, states <= 9, extras <= 31,
    // byte copies 8); nbits stays < 8 between calls so acc never overflows.
    if (n == 0) return 0;
    w->acc |= (v & ((1ULL << n) - 1)) << w->nbits;
    w->nbits += n;
    if (w->nbits >= 8) {
        int bytes = w->nbits >> 3;
        if (w->len + 8 <= w->cap) {
            // one unaligned little-endian word store covers every whole
            // byte in the accumulator (tail bytes are scratch and get
            // overwritten by the next flush)
            memcpy(w->out + w->len, &w->acc, 8);
            w->len += bytes;
            w->acc >>= (bytes << 3);
            w->nbits &= 7;
        } else {
            while (w->nbits >= 8) {
                if (w->len >= w->cap) return -1;
                w->out[w->len++] = (uint8_t)(w->acc & 0xFF);
                w->acc >>= 8;
                w->nbits -= 8;
            }
        }
    }
    return 0;
}

// Interleaved 3-state FSE sequence-stream encode — exact port of
// encoding/block_enc.py::encode_sequences_section's bitstream half
// (reverse order, states updated OF/ML/LL, extras LL/ML/OF per record,
// flush ML/OF/LL, sentinel bit, byte padding). Code mapping from the spec
// tables passed in. A kind with mode RLE has en_*=0 and contributes no
// state bits. Returns bytes written or -1 (capacity).

// Core with caller-precomputed code arrays (seq_section already has them
// for mode selection — recomputing the binary searches here was ~15% of
// the whole encode).
static int64_t encode_seq_stream_codes(
    const int32_t* ll, const int32_t* mlv, const int32_t* ofv,
    const int32_t* llc_a, const int32_t* mlc_a, const int32_t* ofc_a,
    int64_t n,
    const int32_t* ll_cb_base, const int32_t* ll_cb_bits,
    const int32_t* ml_cb_base, const int32_t* ml_cb_bits,
    int32_t en_ll, const int32_t* ll_dnb, const int32_t* ll_dfs,
    const int32_t* ll_ns, int32_t ll_log,
    int32_t en_of, const int32_t* of_dnb, const int32_t* of_dfs,
    const int32_t* of_ns, int32_t of_log,
    int32_t en_ml, const int32_t* ml_dnb, const int32_t* ml_dfs,
    const int32_t* ml_ns, int32_t ml_log,
    uint8_t* out, int64_t cap) {
    if (n <= 0) return 0;
    ZtBitW w = {out, cap, 0, 0, 0};
    int32_t s_ll = 0, s_of = 0, s_ml = 0;
    auto init_state = [](int32_t* st, const int32_t* dnb, const int32_t* dfs,
                         const int32_t* ns, int c) {
        int nb = (dnb[c] + (1 << 15)) >> 16;
        int64_t value = ((int64_t)nb << 16) - dnb[c];
        *st = ns[(value >> nb) + dfs[c]];
    };
    int64_t last = n - 1;
    int llc = llc_a[last], mlc = mlc_a[last], ofc = ofc_a[last];
    if (en_ml) init_state(&s_ml, ml_dnb, ml_dfs, ml_ns, mlc);
    if (en_of) init_state(&s_of, of_dnb, of_dfs, of_ns, ofc);
    if (en_ll) init_state(&s_ll, ll_dnb, ll_dfs, ll_ns, llc);
    if (bw_put(&w, (uint64_t)(ll[last] - ll_cb_base[llc]), ll_cb_bits[llc]) < 0 ||
        bw_put(&w, (uint64_t)(mlv[last] - ml_cb_base[mlc]), ml_cb_bits[mlc]) < 0 ||
        bw_put(&w, (uint64_t)(ofv[last] - (1LL << ofc)), ofc) < 0)
        return -1;
    // Batched bit pushes: LSB-first concatenation makes
    // bw_put(a,na); bw_put(b,nb) == bw_put(a | b<<na, na+nb) exactly, so
    // the three state pushes (<= 27 bits) fuse into one put and the LL+ML
    // extras (<= 32 bits) into another — 6 puts/record -> 3 (the stream
    // encode was the bulk of seq_section's 25.7 ms at 16 MiB, r5).
    for (int64_t i = n - 2; i >= 0; i--) {
        llc = llc_a[i]; mlc = mlc_a[i]; ofc = ofc_a[i];
        uint64_t sv = 0;
        int sn = 0;
        if (en_of) {
            int nb = (s_of + of_dnb[ofc]) >> 16;
            sv |= ((uint64_t)(uint32_t)s_of & (((uint64_t)1 << nb) - 1));
            sn = nb;
            s_of = of_ns[(s_of >> nb) + of_dfs[ofc]];
        }
        if (en_ml) {
            int nb = (s_ml + ml_dnb[mlc]) >> 16;
            sv |= ((uint64_t)(uint32_t)s_ml & (((uint64_t)1 << nb) - 1))
                  << sn;
            sn += nb;
            s_ml = ml_ns[(s_ml >> nb) + ml_dfs[mlc]];
        }
        if (en_ll) {
            int nb = (s_ll + ll_dnb[llc]) >> 16;
            sv |= ((uint64_t)(uint32_t)s_ll & (((uint64_t)1 << nb) - 1))
                  << sn;
            sn += nb;
            s_ll = ll_ns[(s_ll >> nb) + ll_dfs[llc]];
        }
        if (bw_put(&w, sv, sn) < 0) return -1;
        int lb = ll_cb_bits[llc], mb = ml_cb_bits[mlc];
        uint64_t ev =
            ((uint64_t)(uint32_t)(ll[i] - ll_cb_base[llc])
             & (((uint64_t)1 << lb) - 1))
            | (((uint64_t)(uint32_t)(mlv[i] - ml_cb_base[mlc])
                & (((uint64_t)1 << mb) - 1)) << lb);
        if (bw_put(&w, ev, lb + mb) < 0) return -1;
        if (bw_put(&w, (uint64_t)(ofv[i] - (1LL << ofc)), ofc) < 0)
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

static inline int seq_code_in(const int32_t* base, int32_t ncodes,
                              int64_t v) {
    int lo = 0, hi = ncodes;  // upper_bound - 1
    while (lo < hi) { int mid = (lo + hi) >> 1;
        if (base[mid] <= v) lo = mid + 1; else hi = mid; }
    return lo - 1;
}

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
    int32_t* codes = (int32_t*)malloc((size_t)(3 * n) * 4);
    if (!codes) return -1;
    for (int64_t i = 0; i < n; i++) {
        codes[i] = seq_code_in(ll_cb_base, ll_ncodes, ll[i]);
        codes[n + i] = seq_code_in(ml_cb_base, ml_ncodes, mlv[i]);
        codes[2 * n + i] = 63 - __builtin_clzll((uint64_t)ofv[i]);
    }
    int64_t r = encode_seq_stream_codes(
        ll, mlv, ofv, codes, codes + n, codes + 2 * n, n,
        ll_cb_base, ll_cb_bits, ml_cb_base, ml_cb_bits,
        en_ll, ll_dnb, ll_dfs, ll_ns, ll_log,
        en_of, of_dnb, of_dfs, of_ns, of_log,
        en_ml, ml_dnb, ml_dfs, ml_ns, ml_log, out, cap);
    free(codes);
    return r;
}

// Huffman literal-stream encode — exact port of
// encoding/huff0_enc.py::_encode_stream (reverse symbol order, sentinel 1
// bit, byte padding). Returns bytes written, -1 on capacity, -2 when a
// symbol has no code.

int64_t zt_huff_encode_stream(const uint8_t* data, int64_t n,
                              const uint32_t* codes, const uint8_t* lens,
                              uint8_t* out, int64_t cap) {
    ZtBitW w = {out, cap, 0, 0, 0};
    int64_t i = n - 1;
    // 4 symbols per flush: codes are <= 11 bits so 4 fit in one put
    for (; i >= 3; i -= 4) {
        uint8_t b0 = data[i], b1 = data[i - 1];
        uint8_t b2 = data[i - 2], b3 = data[i - 3];
        int n0 = lens[b0], n1 = lens[b1], n2 = lens[b2], n3 = lens[b3];
        if (!n0 || !n1 || !n2 || !n3) return -2;
        uint64_t v = codes[b0] & ((1u << n0) - 1);
        v |= (uint64_t)(codes[b1] & ((1u << n1) - 1)) << n0;
        v |= (uint64_t)(codes[b2] & ((1u << n2) - 1)) << (n0 + n1);
        v |= (uint64_t)(codes[b3] & ((1u << n3) - 1)) << (n0 + n1 + n2);
        if (bw_put(&w, v, n0 + n1 + n2 + n3) < 0) return -1;
    }
    for (; i >= 0; i--) {
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
    // Package-merge over an index arena. The old form carried a
    // std::vector<int> symbol multiset per item and re-stable_sorted the
    // whole item list every round — 494 us/call, x128 blocks = the entire
    // lit_section encode budget (54% of frame encode, r5 profile). Both
    // the base list and the pool are already sorted by count (pairwise
    // package sums of a sorted list are nondecreasing), so each round is
    // one LINEAR merge; symbol membership becomes a child-pointer DFS at
    // the end. Tie-breaking preserved exactly: stable_sort of
    // [base..., pool...] keeps equal-count base items (in base order)
    // ahead of pool items (in creation order) — a merge that prefers the
    // base list on equal counts reproduces that, so codes stay
    // byte-identical (tests/test_encoder_native.py pins it).
    int present[256], np_ = 0;
    for (int s = 0; s < 256; s++)
        if (counts[s] > 0) present[np_++] = s;
    if (np_ < 2) return -1;
    const int LIMIT = 11;
    int order[256];
    for (int i = 0; i < np_; i++) order[i] = present[i];
    std::stable_sort(order, order + np_, [&](int a, int b) {
        return counts[a] < counts[b];
    });
    int64_t lengths[256] = {0};
    {
        struct Node { int64_t count; int l, r, sym; };
        Node nodes[4096];
        int nn = 0;
        int base_ids[256];
        for (int i = 0; i < np_; i++) {
            nodes[nn] = {counts[order[i]], -1, -1, order[i]};
            base_ids[i] = nn++;
        }
        int pool[512], npool = 0;
        int merged[1024];
        int nm = 0;
        auto do_merge = [&]() {
            int i = 0, j = 0;
            nm = 0;
            while (i < np_ || j < npool) {
                if (j >= npool
                    || (i < np_ && nodes[base_ids[i]].count
                                   <= nodes[pool[j]].count))
                    merged[nm++] = base_ids[i++];
                else
                    merged[nm++] = pool[j++];
            }
        };
        for (int r = 0; r < LIMIT - 1; r++) {
            do_merge();
            npool = 0;
            for (int k = 0; k + 1 < nm; k += 2) {
                nodes[nn] = {nodes[merged[k]].count
                             + nodes[merged[k + 1]].count,
                             merged[k], merged[k + 1], -1};
                pool[npool++] = nn++;
            }
        }
        do_merge();
        int take = 2 * np_ - 2;
        int stack[64];
        for (int t = 0; t < take && t < nm; t++) {
            int sp = 0;
            stack[sp++] = merged[t];
            while (sp) {
                const Node& nd = nodes[stack[--sp]];
                if (nd.sym >= 0) lengths[nd.sym]++;
                else { stack[sp++] = nd.l; stack[sp++] = nd.r; }
            }
        }
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

// ===========================================================================
// Full native block/frame compressor (host encode end-to-end).
//
// Byte-for-byte port of encoding/frame_enc.py (compress / _write_block),
// block_enc.py (compress_block, encode_literals_section, _mode_and_table,
// encode_sequences_section_arrays), huff0_enc.py (write_table_description,
// _fse_compress_weights) and fse_enc.py (optimal_table_log,
// normalize_counts, write_table_description). The Python path remains the
// parity oracle (ZT_NO_NATIVE=1 forces it); tests pin frame equality.
// Reference behavior parity: frame_compressor.rs:38-276,
// blocks/compressed.rs:26-377, huff0_encoder.rs:119-153,
// fse_encoder.rs:147-188.
// ===========================================================================

// --- spec tables (RFC 8878 §3.1.1.3.2; common/constants.py) ----------------

static const int32_t ZT_LL_BASE[36] = {
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536};
static const int32_t ZT_LL_BITS[36] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11,
    12, 13, 14, 15, 16};
static const int32_t ZT_ML_BASE[53] = {
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
    19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539};
static const int32_t ZT_ML_BITS[53] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10,
    11, 12, 13, 14, 15, 16};
static const int32_t ZT_LL_DEF[36] = {
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1};
static const int32_t ZT_ML_DEF[53] = {
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1};
static const int32_t ZT_OF_DEF[29] = {
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1};
static const int ZT_LL_MAX_LOG = 9, ZT_ML_MAX_LOG = 9, ZT_OF_MAX_LOG = 8;
static const int ZT_LL_DEF_LOG = 6, ZT_ML_DEF_LOG = 6, ZT_OF_DEF_LOG = 5;

// --- small growable-less output buffer -------------------------------------

struct ZtOutBuf {
    uint8_t* buf;
    int64_t cap, len;
};
static inline int ob_put(ZtOutBuf* o, const void* p, int64_t n) {
    if (o->len + n > o->cap) return -1;
    memcpy(o->buf + o->len, p, (size_t)n);
    o->len += n;
    return 0;
}
static inline int ob_byte(ZtOutBuf* o, uint8_t b) { return ob_put(o, &b, 1); }

static inline int64_t bw_bitpos(const ZtBitW* w) {
    return w->len * 8 + w->nbits;
}
static inline int bw_pad_byte(ZtBitW* w) {
    int mis = (int)(bw_bitpos(w) & 7);
    return mis ? bw_put(w, 0, 8 - mis) : 0;
}

// --- FSE encode tables (fse_enc.py::build_encode_table via
//     zt_fse_enc_build, widened to the int32 layout the stream encoder
//     consumes) ---------------------------------------------------------------

struct FseEncT {
    int32_t table_log;
    int32_t nprobs;
    int32_t probs[64];
    int32_t ns[512];
    int32_t dnb[64];
    int32_t dfs[64];
};

static int fse_enc_make(const int32_t* probs, int nprobs, int table_log,
                        FseEncT* t) {
    if (nprobs > 64 || table_log > 9) return -1;
    uint16_t ns16[512];
    uint32_t dnb32[256];
    int32_t dfs32[256];
    if (zt_fse_enc_build(probs, nprobs, table_log, ns16, dnb32, dfs32) < 0)
        return -1;
    t->table_log = table_log;
    t->nprobs = nprobs;
    int64_t size = (int64_t)1 << table_log;
    for (int i = 0; i < nprobs; i++) t->probs[i] = probs[i];
    for (int64_t i = 0; i < size; i++) t->ns[i] = (int32_t)ns16[i];
    for (int i = 0; i < nprobs; i++) {
        t->dnb[i] = (int32_t)dnb32[i];
        t->dfs[i] = dfs32[i];
    }
    return 0;
}

static inline int32_t fse_init_state(const FseEncT* t, int c) {
    int nb = (t->dnb[c] + (1 << 15)) >> 16;
    int64_t value = ((int64_t)nb << 16) - t->dnb[c];
    return t->ns[(value >> nb) + t->dfs[c]];
}

static inline int fse_enc_sym(const FseEncT* t, int32_t* st, int c,
                              ZtBitW* w) {
    int nb = (*st + t->dnb[c]) >> 16;
    if (bw_put(w, (uint64_t)(uint32_t)*st, nb) < 0) return -1;
    *st = t->ns[(*st >> nb) + t->dfs[c]];
    return 0;
}

// exact stream bit cost (block_enc.py::_sim_bits: init emits nothing,
// flush emits table_log)
static int64_t fse_sim_cost(const FseEncT* t, const int32_t* codes,
                            int64_t n) {
    if (n <= 0) return t->table_log;
    int32_t st = fse_init_state(t, codes[n - 1]);
    int64_t bits = 0;
    for (int64_t i = n - 2; i >= 0; i--) {
        int c = codes[i];
        int nb = (st + t->dnb[c]) >> 16;
        bits += nb;
        st = t->ns[(st >> nb) + t->dfs[c]];
    }
    return bits + t->table_log;
}

// both candidate tables simulated in one pass over the codes
static void fse_sim_cost2(const FseEncT* a, const FseEncT* b,
                          const int32_t* codes, int64_t n,
                          int64_t* cost_a, int64_t* cost_b) {
    if (n <= 0) { *cost_a = a->table_log; *cost_b = b->table_log; return; }
    int32_t sa = fse_init_state(a, codes[n - 1]);
    int32_t sb = fse_init_state(b, codes[n - 1]);
    int64_t ba = 0, bb = 0;
    for (int64_t i = n - 2; i >= 0; i--) {
        int c = codes[i];
        int na = (sa + a->dnb[c]) >> 16;
        ba += na;
        sa = a->ns[(sa >> na) + a->dfs[c]];
        int nb = (sb + b->dnb[c]) >> 16;
        bb += nb;
        sb = b->ns[(sb >> nb) + b->dfs[c]];
    }
    *cost_a = ba + a->table_log;
    *cost_b = bb + b->table_log;
}

// fse_enc.py::optimal_table_log
static int fse_optimal_log(int max_log, int64_t total, int num_symbols) {
    if (total <= 1) return 5;
    auto bitlen = [](int64_t v) -> int {
        return v <= 0 ? 0 : 64 - __builtin_clzll((uint64_t)v);
    };
    int bits_src = bitlen(total - 1) - 3;
    if (bits_src < 1) bits_src = 1;
    int ns = num_symbols - 1;
    if (ns < 1) ns = 1;
    int bits_sym = bitlen(ns) + 1;
    int log = bits_src < max_log ? bits_src : max_log;
    if (bits_sym > log) log = bits_sym;
    if (log < 5) log = 5;
    return log < max_log ? log : max_log;
}

// fse_enc.py::normalize_counts (+ _normalize_slow). probs length ==
// ncounts on success; returns 0 or -1.
static int fse_normalize(const int64_t* counts, int ncounts, int table_log,
                         int64_t total, int32_t* probs) {
    int64_t size = (int64_t)1 << table_log;
    if (total <= 0) return -1;
    for (int i = 0; i < ncounts; i++) probs[i] = 0;
    int64_t low_threshold = total >> table_log;
    int64_t assigned = 0;
    int largest = -1;
    int64_t largest_p = 0;
    for (int s = 0; s < ncounts; s++) {
        int64_t c = counts[s];
        if (c == 0) continue;
        if (c <= low_threshold) {
            probs[s] = -1;
            assigned += 1;
        } else {
            int64_t p = (c * size) / total;
            if (p == 0) p = 1;
            probs[s] = (int32_t)p;
            assigned += p;
            if (p > largest_p) {
                largest = s;
                largest_p = p;
            }
        }
    }
    if (largest < 0) {
        for (int s = 0; s < ncounts; s++) {
            if (counts[s]) {
                probs[s] = 1;  // was -1; assigned already counted it as 1
                largest = s;
                largest_p = 1;
                break;
            }
        }
        if (largest < 0) return -1;
    }
    int64_t diff = size - assigned;
    if (probs[largest] + diff > 0) {
        probs[largest] += (int32_t)diff;
        return 0;
    }
    // _normalize_slow: 1 each, distribute remainder by count share
    int present[64];
    int np_ = 0;
    for (int s = 0; s < ncounts; s++)
        if (counts[s]) present[np_++] = s;
    if (np_ > size) return -1;
    for (int i = 0; i < ncounts; i++) probs[i] = 0;
    for (int i = 0; i < np_; i++) probs[present[i]] = 1;
    int64_t remaining = size - np_;
    int order[64];
    memcpy(order, present, sizeof(int) * np_);
    std::stable_sort(order, order + np_, [&](int a, int b) {
        return counts[a] > counts[b];
    });
    int64_t i = 0;
    while (remaining > 0) {
        probs[order[i % np_]] += 1;
        remaining--;
        i++;
    }
    return 0;
}

// fse_enc.py::write_table_description (fse_encoder.rs:147-188)
static int fse_write_desc(ZtBitW* w, const int32_t* probs, int nprobs,
                          int table_log) {
    if (bw_put(w, (uint64_t)(table_log - 5), 4) < 0) return -1;
    int64_t remaining = (int64_t)1 << table_log;
    int i = 0;
    while (remaining > 0 && i < nprobs) {
        int32_t p = probs[i];
        int bits_to_read = 64 - __builtin_clzll((uint64_t)(remaining + 1));
        int64_t lower_mask = ((int64_t)1 << (bits_to_read - 1)) - 1;
        int64_t threshold = ((int64_t)1 << bits_to_read) - 1 - (remaining + 1);
        int64_t val = p + 1;
        if (val < threshold) {
            if (bw_put(w, (uint64_t)val, bits_to_read - 1) < 0) return -1;
        } else if (val > lower_mask) {
            if (bw_put(w, (uint64_t)(val + threshold), bits_to_read) < 0)
                return -1;
        } else {
            if (bw_put(w, (uint64_t)val, bits_to_read) < 0) return -1;
        }
        remaining -= p < 0 ? -p : p;
        i++;
        if (p == 0) {
            int run = 0;
            while (i < nprobs && probs[i] == 0 && remaining > 0) {
                run++;
                i++;
            }
            while (run >= 3) {
                if (bw_put(w, 3, 2) < 0) return -1;
                run -= 3;
            }
            if (bw_put(w, (uint64_t)run, 2) < 0) return -1;
        }
    }
    if (remaining != 0) return -1;
    return bw_pad_byte(w);
}

// --- sequence-section mode selection (block_enc.py::_mode_and_table) -------

static FseEncT g_predef[3];   // ll, of, ml
static int g_predef_ready = 0;

static int predef_tables_init() {
    if (g_predef_ready) return 0;
    if (fse_enc_make(ZT_LL_DEF, 36, ZT_LL_DEF_LOG, &g_predef[0]) < 0 ||
        fse_enc_make(ZT_OF_DEF, 29, ZT_OF_DEF_LOG, &g_predef[1]) < 0 ||
        fse_enc_make(ZT_ML_DEF, 53, ZT_ML_DEF_LOG, &g_predef[2]) < 0)
        return -1;
    g_predef_ready = 1;
    return 0;
}

// Returns mode (0 predef / 1 rle / 2 fse) or -1. Fills `t` for modes 0/2,
// `rle_sym` for mode 1, and appends table bytes to `tw` for modes 1/2.
// `counts` is the caller-built histogram of `codes` (one shared fill pass
// in seq_section instead of two scans per kind here).
static int mode_and_table(const int32_t* codes, int64_t n,
                          const int64_t* counts, int max_log,
                          int predef_idx, ZtBitW* tw, FseEncT* t,
                          int* rle_sym) {
    int32_t first = codes[0];
    int32_t maxc = 0;
    for (int s = 63; s >= 0; s--)
        if (counts[s]) { maxc = s; break; }
    if (counts[first] == n) {
        if (bw_put(tw, (uint64_t)(uint32_t)first, 8) < 0) return -1;
        *rle_sym = first;
        return 1;  // MODE_RLE
    }
    int ncounts = maxc + 1;
    int nonzero = 0;
    for (int s = 0; s < ncounts; s++)
        if (counts[s]) nonzero++;
    int table_log = fse_optimal_log(max_log, n, nonzero);
    int32_t probs[64];
    if (fse_normalize(counts, ncounts, table_log, n, probs) < 0) return -1;
    int nprobs = ncounts;
    while (nprobs > 0 && probs[nprobs - 1] == 0) nprobs--;
    if (fse_enc_make(probs, nprobs, table_log, t) < 0) return -1;
    uint8_t dbuf[256];
    ZtBitW dw = {dbuf, 256, 0, 0, 0};
    if (fse_write_desc(&dw, probs, nprobs, table_log) < 0) return -1;
    if (predef_tables_init() == 0) {
        const FseEncT* pre = &g_predef[predef_idx];
        if (maxc <= pre->nprobs - 1) {
            int64_t sim_custom, cost_pre;
            fse_sim_cost2(t, pre, codes, n, &sim_custom, &cost_pre);
            int64_t cost_custom = dw.len * 8 + sim_custom;
            if (cost_pre <= cost_custom) {
                *t = *pre;
                return 0;  // MODE_PREDEFINED
            }
        }
    }
    // append desc bytes (dw is byte-aligned)
    for (int64_t i = 0; i < dw.len; i++)
        if (bw_put(tw, dbuf[i], 8) < 0) return -1;
    return 2;  // MODE_FSE
}

// --- Huffman table description (huff0_enc.py) ------------------------------

struct HuffEncT {
    int32_t valid;        // 1 when a table is held
    int32_t nlens;        // last_symbol + 1
    int32_t max_bits;
    uint8_t lens[256];
    uint32_t codes[256];
    int32_t weights[256];  // incl. implied last
};

// decode the FSE-compressed weight blob (oracle/huff0.py::read_weights FSE
// branch; mirrors zt_huff_parse) — used to VERIFY the 2-state encode.
static int huff_weights_decode_fse(const uint8_t* payload, int64_t comp,
                                   int32_t* w_out) {
    int32_t probs[300];
    int32_t m[3];
    if (fse_read_probs(payload, comp, 6, probs, m) < 0) return -1;
    uint8_t sym[64];
    uint16_t base[64];
    uint8_t nb[64];
    if (zt_fse_build_table(probs, m[1], m[0], sym, base, nb) < 0) return -1;
    RevBits rb;
    if (rev_init(&rb, payload + m[2], comp - m[2]) != 0) return -1;
    int acc = m[0];
    uint32_t s1 = (uint32_t)rev_get(&rb, acc);
    uint32_t s2 = (uint32_t)rev_get(&rb, acc);
    int nw = 0;
    for (;;) {
        w_out[nw++] = sym[s1];
        s1 = base[s1] + (uint32_t)rev_get(&rb, nb[s1]);
        if (rb.pos < 0) {
            w_out[nw++] = sym[s2];
            break;
        }
        w_out[nw++] = sym[s2];
        s2 = base[s2] + (uint32_t)rev_get(&rb, nb[s2]);
        if (rb.pos < 0) {
            w_out[nw++] = sym[s1];
            break;
        }
        if (nw > 255) return -1;
    }
    if (nw > 255) return -1;
    return nw;
}

// huff0_enc.py::_fse_compress_weights: two interleaved FSE states over the
// weight list, verified by decode. Returns blob length or -1 (caller uses
// the direct representation).
static int64_t huff_fse_weights(const int32_t* weights, int n, uint8_t* out,
                                int64_t cap) {
    int64_t counts[64] = {0};
    int maxw = 0;
    for (int i = 0; i < n; i++) {
        if (weights[i] > 12) return -1;
        counts[weights[i]]++;
        if (weights[i] > maxw) maxw = weights[i];
    }
    int num_symbols = maxw + 1;
    if (num_symbols < 2 || n < 2) return -1;
    int table_log = fse_optimal_log(6, n, num_symbols);
    int32_t probs[64];
    if (fse_normalize(counts, num_symbols, table_log, n, probs) < 0)
        return -1;
    FseEncT t;
    if (fse_enc_make(probs, num_symbols, table_log, &t) < 0) return -1;
    ZtBitW w = {out, cap, 0, 0, 0};
    if (fse_write_desc(&w, probs, num_symbols, table_log) < 0) return -1;
    int32_t st1, st2;
    if (n % 2 == 0) {
        st2 = fse_init_state(&t, weights[n - 1]);
        st1 = fse_init_state(&t, weights[n - 2]);
    } else {
        st1 = fse_init_state(&t, weights[n - 1]);
        st2 = fse_init_state(&t, weights[n - 2]);
    }
    for (int i = n - 3; i >= 0; i--) {
        int32_t* st = (i % 2 == 0) ? &st1 : &st2;
        if (fse_enc_sym(&t, st, weights[i], &w) < 0) return -1;
    }
    if (bw_put(&w, (uint64_t)(uint32_t)st2, table_log) < 0) return -1;
    if (bw_put(&w, (uint64_t)(uint32_t)st1, table_log) < 0) return -1;
    if (bw_put(&w, 1, 1) < 0) return -1;
    if (bw_pad_byte(&w) < 0) return -1;
    // verify by decoding (2-state termination can mis-terminate when a
    // transition consumes zero bits)
    int32_t got[300];
    int nw = huff_weights_decode_fse(out, w.len, got);
    if (nw != n) return -1;
    for (int i = 0; i < n; i++)
        if (got[i] != weights[i]) return -1;
    return w.len;
}

// huff0_enc.py::write_table_description. Appends to `o`; returns 0/-1.
static int huff_write_desc(const HuffEncT* t, ZtOutBuf* o) {
    int n = t->nlens - 1;  // weights[:-1], last implied
    int64_t direct_size = 1 + (n + 1) / 2;
    if (n > 16) {
        uint8_t fbuf[512];
        int64_t flen = huff_fse_weights(t->weights, n, fbuf, 512);
        if (flen >= 0 && flen + 1 < direct_size) {
            if (ob_byte(o, (uint8_t)flen) < 0) return -1;
            return ob_put(o, fbuf, flen);
        }
    }
    if (n > 127) return -1;
    if (ob_byte(o, (uint8_t)(127 + n)) < 0) return -1;
    for (int i = 0; i + 1 < n; i += 2)
        if (ob_byte(o, (uint8_t)((t->weights[i] << 4) | t->weights[i + 1])) < 0)
            return -1;
    if (n % 2)
        if (ob_byte(o, (uint8_t)(t->weights[n - 1] << 4)) < 0) return -1;
    return 0;
}

static int64_t huff_desc_size(const HuffEncT* t) {
    uint8_t tmp[600];
    ZtOutBuf o = {tmp, 600, 0};
    if (huff_write_desc(t, &o) < 0) return -1;
    return o.len;
}

// block_enc.py::_stream_payload_bytes, from per-quarter histograms (the
// stream split is the same ceil(n/4) as the payload builder, so per-stream
// byte rounding matches exactly; dot products replace whole-block passes)
static int64_t huff_payload_bytes_counts(const HuffEncT* t,
                                         const int64_t counts4[4][256],
                                         bool four) {
    if (!four) {
        int64_t bits = 0;
        for (int s = 0; s < 256; s++)
            bits += (counts4[0][s] + counts4[1][s] + counts4[2][s]
                     + counts4[3][s]) * t->lens[s];
        return (bits + 1 + 7) / 8;
    }
    int64_t total = 6;
    for (int q = 0; q < 4; q++) {
        int64_t bits = 0;
        for (int s = 0; s < 256; s++) bits += counts4[q][s] * t->lens[s];
        total += (bits + 1 + 7) / 8;
    }
    return total;
}

// block_enc.py::_lit_header / _lit_header_byte / _lit_header_compressed /
// _raw_header_len
static int64_t raw_header_len(int64_t n) {
    return n <= 31 ? 1 : (n <= 4095 ? 2 : 3);
}
static int lit_header(ZtOutBuf* o, int lit_type, int64_t regen) {
    if (regen <= 31) return ob_byte(o, (uint8_t)(lit_type | (regen << 3)));
    if (regen <= 4095) {
        uint32_t v = (uint32_t)(lit_type | (1 << 2) | (regen << 4));
        uint8_t b[2] = {(uint8_t)v, (uint8_t)(v >> 8)};
        return ob_put(o, b, 2);
    }
    if (regen >= ((int64_t)1 << 20)) return -1;
    uint32_t v = (uint32_t)(lit_type | (3 << 2) | (regen << 4));
    uint8_t b[3] = {(uint8_t)v, (uint8_t)(v >> 8), (uint8_t)(v >> 16)};
    return ob_put(o, b, 3);
}
static int lit_header_compressed(uint8_t* out, int lit_type, int64_t regen,
                                 int64_t comp, bool four) {
    // returns header length or -1 when unrepresentable
    if (!four) {
        if (regen > 1023 || comp > 1023) return -1;
        uint32_t v = (uint32_t)(lit_type | (0 << 2) | (regen << 4)
                                | (comp << 14));
        out[0] = (uint8_t)v; out[1] = (uint8_t)(v >> 8);
        out[2] = (uint8_t)(v >> 16);
        return 3;
    }
    if (regen <= 1023 && comp <= 1023) {
        uint32_t v = (uint32_t)(lit_type | (1 << 2) | (regen << 4)
                                | (comp << 14));
        out[0] = (uint8_t)v; out[1] = (uint8_t)(v >> 8);
        out[2] = (uint8_t)(v >> 16);
        return 3;
    }
    if (regen <= (1 << 14) - 1 && comp <= (1 << 14) - 1) {
        uint32_t v = (uint32_t)(lit_type | (2 << 2) | (regen << 4)
                                | (comp << 18));
        out[0] = (uint8_t)v; out[1] = (uint8_t)(v >> 8);
        out[2] = (uint8_t)(v >> 16); out[3] = (uint8_t)(v >> 24);
        return 4;
    }
    if (regen <= (1 << 18) - 1 && comp <= (1 << 18) - 1) {
        uint64_t v = (uint64_t)lit_type | (3 << 2)
                     | ((uint64_t)regen << 4) | ((uint64_t)comp << 22);
        for (int i = 0; i < 5; i++) out[i] = (uint8_t)(v >> (8 * i));
        return 5;
    }
    return -1;
}

// encode one huffman stream via zt_huff_encode_stream into o
static int64_t huff_stream_into(const HuffEncT* t, const uint8_t* data,
                                int64_t n, ZtOutBuf* o) {
    int64_t r = zt_huff_encode_stream(data, n, t->codes, t->lens,
                                      o->buf + o->len, o->cap - o->len);
    if (r < 0) return -1;
    o->len += r;
    return r;
}

// block_enc.py::encode_literals_section. `prev` is the frame's Treeless
// state (mutated to the section's out_table). Returns 0 / -1 (capacity) /
// -99 (internal cost-model mismatch; caller falls back to Python).
static int lit_section(const uint8_t* lits, int64_t n, ZtOutBuf* o,
                       HuffEncT* prev, uint8_t* scratch, int64_t scratch_cap) {
    const int LIT_RAW = 0, LIT_RLE = 1, LIT_COMPRESSED = 2, LIT_TREELESS = 3;
    if (n == 0)
        return ob_byte(o, (uint8_t)LIT_RAW);
    bool rle = true;
    for (int64_t i = 1; i < n; i++)
        if (lits[i] != lits[0]) { rle = false; break; }
    if (rle) {
        if (lit_header(o, LIT_RLE, n) < 0) return -1;
        return ob_byte(o, lits[0]);
    }
    if (n > 63) {
        bool four = n >= 256;
        // histogram per 4-stream quarter (same ceil(n/4) split as the
        // payload builder) so candidate-table costs are dot products
        int64_t counts4[4][256] = {{0}};
        int maxb = 0;
        int64_t split = four ? (n + 3) / 4 : n;
        for (int q = 0; q < 4; q++) {
            int64_t s = q * split;
            int64_t e = s + split < n ? s + split : n;
            if (s >= n) break;
            int64_t* cq = counts4[q];
            for (int64_t i = s; i < e; i++) {
                cq[lits[i]]++;
                if (lits[i] > maxb) maxb = lits[i];
            }
        }
        int64_t counts[256];
        for (int s = 0; s < 256; s++)
            counts[s] = counts4[0][s] + counts4[1][s] + counts4[2][s]
                        + counts4[3][s];
        HuffEncT newt;
        newt.valid = 0;
        int64_t cost_new = (int64_t)1 << 62;
        int64_t desc_len = -1;
        {
            int32_t meta[2];
            uint8_t lens8[256];
            uint32_t codes32[256];
            int32_t weights[256];
            if (zt_huff_enc_build(counts, codes32, lens8, weights, meta) == 0) {
                newt.valid = 1;
                newt.max_bits = meta[0];
                newt.nlens = meta[1] + 1;
                memcpy(newt.lens, lens8, 256);
                memcpy(newt.codes, codes32, 256 * 4);
                memcpy(newt.weights, weights, 256 * 4);
                desc_len = huff_desc_size(&newt);
                if (desc_len >= 0)
                    cost_new = desc_len
                               + huff_payload_bytes_counts(&newt, counts4,
                                                           four);
                else
                    newt.valid = 0;
            }
        }
        int64_t cost_reuse = (int64_t)1 << 62;
        if (prev->valid && maxb < prev->nlens) {
            bool ok = true;
            for (int b = 0; b <= maxb && ok; b++)
                if (counts[b] && prev->lens[b] == 0) ok = false;
            if (ok)
                cost_reuse = huff_payload_bytes_counts(prev, counts4, four);
        }
        const HuffEncT* table = nullptr;
        int lit_type = LIT_COMPRESSED;
        if (cost_reuse < cost_new) {
            table = prev;
            lit_type = LIT_TREELESS;
        } else if (newt.valid) {
            table = &newt;
            lit_type = LIT_COMPRESSED;
        }
        int64_t comp = cost_reuse < cost_new ? cost_reuse : cost_new;
        if (table != nullptr) {
            // build payload into scratch: [desc?] + streams
            ZtOutBuf p = {scratch, scratch_cap, 0};
            if (lit_type == LIT_COMPRESSED) {
                if (huff_write_desc(table, &p) < 0) return -1;
            }
            if (!four) {
                if (huff_stream_into(table, lits, n, &p) < 0) return -1;
            } else {
                int64_t split = (n + 3) / 4;
                int64_t jump_at = p.len;
                uint8_t zeros[6] = {0};
                if (ob_put(&p, zeros, 6) < 0) return -1;
                int64_t lens3[3];
                for (int part = 0; part < 4; part++) {
                    int64_t s = part * split;
                    int64_t e = s + split < n ? s + split : n;
                    if (s > n) s = n;
                    if (e < s) e = s;
                    int64_t r = huff_stream_into(table, lits + s, e - s, &p);
                    if (r < 0) return -1;
                    if (part < 3) {
                        if (r > 0xFFFF) return -1;
                        lens3[part] = r;
                    }
                }
                for (int part = 0; part < 3; part++) {
                    p.buf[jump_at + 2 * part] = (uint8_t)lens3[part];
                    p.buf[jump_at + 2 * part + 1] = (uint8_t)(lens3[part] >> 8);
                }
            }
            if (p.len != comp) return -99;  // cost model mismatch
            uint8_t hdr[5];
            int hl = lit_header_compressed(hdr, lit_type, n, comp, four);
            if (hl > 0 && hl + comp < 1 + raw_header_len(n) + n) {
                if (ob_put(o, hdr, hl) < 0) return -1;
                if (ob_put(o, p.buf, p.len) < 0) return -1;
                if (lit_type == LIT_COMPRESSED) *prev = newt;
                return 0;
            }
        }
    }
    if (lit_header(o, LIT_RAW, n) < 0) return -1;
    return ob_put(o, lits, n);
}

// block_enc.py::_seqnum_varint
static int seqnum_varint(ZtOutBuf* o, int64_t n) {
    if (n < 128) return ob_byte(o, (uint8_t)n);
    if (n < 0x7F00) {
        uint8_t b[2] = {(uint8_t)((n >> 8) + 128), (uint8_t)(n & 0xFF)};
        return ob_put(o, b, 2);
    }
    if (n - 0x7F00 > 0xFFFF) return -1;
    int64_t v = n - 0x7F00;
    uint8_t b[3] = {255, (uint8_t)(v & 0xFF), (uint8_t)(v >> 8)};
    return ob_put(o, b, 3);
}

// block_enc.py::encode_sequences_section_arrays (triples already made)
static int seq_section(const int32_t* llv, const int32_t* mlv,
                       const int32_t* ofv, int64_t m, ZtOutBuf* o,
                       int32_t* cscratch /* >= 3*m */) {
    const int MODE_RLE = 1;
    if (seqnum_varint(o, m) < 0) return -1;
    if (m == 0) return 0;
    int32_t* llc = cscratch;
    int32_t* mlc = cscratch + m;
    int32_t* ofc = cscratch + 2 * m;
    // small-value code LUTs (LL < 64, ML-3 < 128 cover nearly every
    // sequence); binary search only for the rare large values
    static int32_t ll_lut[64], ml_lut[128];
    static int luts_ready = 0;
    if (!luts_ready) {
        for (int v = 0; v < 64; v++)
            ll_lut[v] = seq_code_in(ZT_LL_BASE, 36, v);
        for (int v = 0; v < 128; v++)
            ml_lut[v] = seq_code_in(ZT_ML_BASE, 53, v + 3);
        luts_ready = 1;
    }
    int64_t cll[64] = {0}, cml[64] = {0}, cof[64] = {0};
    for (int64_t i = 0; i < m; i++) {
        int32_t lv = llv[i], mv = mlv[i];
        int lc = (uint32_t)lv < 64 ? ll_lut[lv]
                                   : seq_code_in(ZT_LL_BASE, 36, lv);
        int mc = (uint32_t)(mv - 3) < 128 ? ml_lut[mv - 3]
                                          : seq_code_in(ZT_ML_BASE, 53, mv);
        int oc = 63 - __builtin_clzll((uint64_t)ofv[i]);
        if (oc >= 64) return -2;
        llc[i] = lc; mlc[i] = mc; ofc[i] = oc;
        cll[lc]++; cml[mc]++; cof[oc]++;
    }
    uint8_t tbuf[1024];
    ZtBitW tw = {tbuf, 1024, 0, 0, 0};
    FseEncT ll_t = {}, of_t = {}, ml_t = {};
    int ll_rle = 0, of_rle = 0, ml_rle = 0;
    int ll_mode = mode_and_table(llc, m, cll, ZT_LL_MAX_LOG, 0, &tw, &ll_t,
                                 &ll_rle);
    if (ll_mode < 0) return -2;
    int of_mode = mode_and_table(ofc, m, cof, ZT_OF_MAX_LOG, 1, &tw, &of_t,
                                 &of_rle);
    if (of_mode < 0) return -2;
    int ml_mode = mode_and_table(mlc, m, cml, ZT_ML_MAX_LOG, 2, &tw, &ml_t,
                                 &ml_rle);
    if (ml_mode < 0) return -2;
    if (tw.nbits != 0) return -2;  // descriptions are byte-aligned
    // wire modes: 0 predef, 1 rle, 2 fse (constants.py MODE_*)
    if (ob_byte(o, (uint8_t)((ll_mode << 6) | (of_mode << 4)
                             | (ml_mode << 2))) < 0) return -1;
    if (ob_put(o, tbuf, tw.len) < 0) return -1;
    int en_ll = ll_mode != MODE_RLE, en_of = of_mode != MODE_RLE,
        en_ml = ml_mode != MODE_RLE;
    int64_t r = encode_seq_stream_codes(
        llv, mlv, ofv, llc, mlc, ofc, m,
        ZT_LL_BASE, ZT_LL_BITS, ZT_ML_BASE, ZT_ML_BITS,
        en_ll, ll_t.dnb, ll_t.dfs, ll_t.ns, ll_t.table_log,
        en_of, of_t.dnb, of_t.dfs, of_t.ns, of_t.table_log,
        en_ml, ml_t.dnb, ml_t.dfs, ml_t.ns, ml_t.table_log,
        o->buf + o->len, o->cap - o->len);
    if (r < 0) return -1;
    o->len += r;
    return 0;
}

// --- whole-block compressor ------------------------------------------------

struct ZtEncWs {
    int32_t* hash;     // 1 << 16
    int32_t* recs;     // 6 * rec_cap (ll, off, ml, tll, tml, tofv)
    int32_t* cscratch; // 3 * rec_cap
    uint8_t* lits;
    uint8_t* scratch;  // literal payload build
    uint8_t* blockout;
    int64_t rec_cap, lit_cap, scratch_cap, block_cap;
};

static int enc_ws_init(ZtEncWs* ws, int64_t block_size) {
    ws->rec_cap = block_size / 5 + 16;
    ws->lit_cap = block_size + 16;
    ws->scratch_cap = block_size + (block_size >> 1) + 4096;
    ws->block_cap = 2 * block_size + 4096;
    ws->hash = (int32_t*)malloc((size_t)(1 << 16) * 4);
    ws->recs = (int32_t*)malloc((size_t)(6 * ws->rec_cap) * 4);
    ws->cscratch = (int32_t*)malloc((size_t)(3 * ws->rec_cap) * 4);
    ws->lits = (uint8_t*)malloc((size_t)ws->lit_cap);
    ws->scratch = (uint8_t*)malloc((size_t)ws->scratch_cap);
    ws->blockout = (uint8_t*)malloc((size_t)ws->block_cap);
    if (!ws->hash || !ws->recs || !ws->cscratch || !ws->lits || !ws->scratch
        || !ws->blockout)
        return -1;
    return 0;
}

static void enc_ws_free(ZtEncWs* ws) {
    free(ws->hash); free(ws->recs); free(ws->cscratch);
    free(ws->lits); free(ws->scratch); free(ws->blockout);
}

// block_enc.py::compress_block (native-arrays branch). Emits the block
// CONTENT into ws->blockout; returns its length, 0 when compression does
// not pay (caller emits Raw), or <0 on internal error (caller falls back
// to the Python path). hist/huff are mutated; the caller owns commit
// semantics (frame_enc.py::_write_block copies, commits on emit).
// Encode-stage profile accumulators (ns), read+reset via zt_enc_prof_read.
// Two clock_gettime calls per stage per 128 KiB block — noise-level cost.
static int64_t g_enc_prof[4];

static inline int64_t enc_now_ns() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return (int64_t)ts.tv_sec * 1000000000LL + ts.tv_nsec;
}

void zt_enc_prof_read(int64_t* out4) {
    for (int i = 0; i < 4; i++) { out4[i] = g_enc_prof[i]; g_enc_prof[i] = 0; }
}

static int64_t compress_block_c(const uint8_t* buf, int64_t base,
                                int64_t lo, int64_t hi,
                                int32_t* table, int64_t max_off,
                                int64_t* hist, HuffEncT* huff, ZtEncWs* ws) {
    const int64_t n = hi - lo;
    int32_t* ll = ws->recs;
    int32_t* off = ws->recs + ws->rec_cap;
    int32_t* ml = ws->recs + 2 * ws->rec_cap;
    int64_t t0 = enc_now_ns();
    int64_t nrec = zt_find_sequences(buf, base, lo, hi, ll, off, ml,
                                     ws->rec_cap, table, max_off);
    if (nrec < 0) return -2;
    int64_t t1 = enc_now_ns();
    // literals: the non-matched spans in order
    const uint8_t* block = buf + (lo - base);
    int64_t lp = 0, pos = 0;
    for (int64_t i = 0; i < nrec; i++) {
        memcpy(ws->lits + lp, block + pos, (size_t)ll[i]);
        lp += ll[i];
        pos += ll[i] + ml[i];
    }
    int64_t t2 = enc_now_ns();
    ZtOutBuf o = {ws->blockout, ws->block_cap, 0};
    if (lit_section(ws->lits, lp, &o, huff, ws->scratch, ws->scratch_cap) < 0)
        return -3;
    int64_t t3 = enc_now_ns();
    int32_t* tll = ws->recs + 3 * ws->rec_cap;
    int32_t* tml = ws->recs + 4 * ws->rec_cap;
    int32_t* tofv = ws->recs + 5 * ws->rec_cap;
    int64_t m = zt_make_triples(ll, off, ml, nrec, hist, 1, tll, tml, tofv);
    if (seq_section(tll, tml, tofv, m, &o, ws->cscratch) < 0) return -4;
    int64_t t4 = enc_now_ns();
    g_enc_prof[0] += t1 - t0;
    g_enc_prof[1] += t2 - t1;
    g_enc_prof[2] += t3 - t2;
    g_enc_prof[3] += t4 - t3;
    if (o.len >= n) return 0;  // does not pay; Raw block
    return o.len;
}

// Streaming per-block entry (frame_enc.py::_write_block fast path).
// huff_state: int32[771] = {valid, nlens, max_bits, lens[256], codes[256],
// weights[256]} (codes stored bit-identical in int32 slots). Mutated in
// place; the caller owns commit semantics.
int64_t zt_compress_block2(const uint8_t* buf, int64_t base,
                           int64_t lo, int64_t hi,
                           int32_t* table, int64_t max_off,
                           int64_t* hist, int32_t* huff_state,
                           uint8_t* out, int64_t cap) {
    ZtEncWs ws;
    if (enc_ws_init(&ws, hi - lo) < 0) { enc_ws_free(&ws); return -1; }
    HuffEncT huff;
    huff.valid = huff_state[0];
    huff.nlens = huff_state[1];
    huff.max_bits = huff_state[2];
    for (int i = 0; i < 256; i++) {
        huff.lens[i] = (uint8_t)huff_state[3 + i];
        huff.codes[i] = (uint32_t)huff_state[259 + i];
        huff.weights[i] = huff_state[515 + i];
    }
    int64_t r = compress_block_c(buf, base, lo, hi, table, max_off,
                                 hist, &huff, &ws);
    if (r > 0) {
        if (r > cap) { enc_ws_free(&ws); return -1; }
        memcpy(out, ws.blockout, (size_t)r);
    }
    huff_state[0] = huff.valid;
    huff_state[1] = huff.nlens;
    huff_state[2] = huff.max_bits;
    for (int i = 0; i < 256; i++) {
        huff_state[3 + i] = huff.lens[i];
        huff_state[259 + i] = (int32_t)huff.codes[i];
        huff_state[515 + i] = huff.weights[i];
    }
    enc_ws_free(&ws);
    return r;
}

// Whole-frame compressor (frame_enc.py::compress with matcher None).
// level: 0 = UNCOMPRESSED, 1 = FASTEST. write_fcs != 0 emits the frame
// content size with the minimal field width (RFC 8878 §3.1.1.1.1-.4:
// n < 256 -> single-segment 1-byte FCS without a window descriptor,
// 256..65791 -> 2-byte FCS storing n-256, else 4- or 8-byte FCS).
// Returns frame length or <0.
int64_t zt_compress_frame(const uint8_t* data, int64_t n,
                          int32_t window_log, int32_t checksum,
                          int32_t level, int32_t write_fcs,
                          uint8_t* out, int64_t cap) {
    const int64_t BLOCK = 128 * 1024;
    const int BLOCK_RAW = 0, BLOCK_RLE = 1, BLOCK_COMPRESSED = 2;
    if (window_log < 10 || window_log > 41) return -1;
    ZtOutBuf o = {out, cap, 0};
    uint8_t hdr[4] = {0x28, 0xB5, 0x2F, 0xFD};
    if (ob_put(&o, hdr, 4) < 0) return -1;
    uint8_t descriptor = checksum ? 0x04 : 0x00;
    if (!write_fcs) {
        uint8_t rest[2] = {descriptor, (uint8_t)((window_log - 10) << 3)};
        if (ob_put(&o, rest, 2) < 0) return -1;
    } else if (n < 256) {
        descriptor |= 0x20;  // single-segment: window = FCS, no window byte
        uint8_t rest[2] = {descriptor, (uint8_t)n};
        if (ob_put(&o, rest, 2) < 0) return -1;
    } else {
        int fcs_bytes;
        uint64_t fcs_val = (uint64_t)n;
        if (n <= 0xFFFF + 256) {
            descriptor |= 0x40; fcs_bytes = 2; fcs_val = (uint64_t)(n - 256);
        } else if (n <= 0xFFFFFFFFLL) {
            descriptor |= 0x80; fcs_bytes = 4;
        } else {
            descriptor |= 0xC0; fcs_bytes = 8;
        }
        uint8_t rest[10] = {descriptor, (uint8_t)((window_log - 10) << 3)};
        for (int i = 0; i < fcs_bytes; i++)
            rest[2 + i] = (uint8_t)(fcs_val >> (8 * i));
        if (ob_put(&o, rest, 2 + fcs_bytes) < 0) return -1;
    }

    ZtEncWs ws;
    if (enc_ws_init(&ws, BLOCK < n ? BLOCK : (n > 0 ? n : 1)) < 0) {
        enc_ws_free(&ws);
        return -1;
    }
    int64_t hist[3] = {1, 4, 8};
    // frame-lifetime matcher table: matches reach up to the advertised
    // window across block boundaries (raw-emitted blocks keep their table
    // entries too — their bytes are in the decoded output either way)
    memset(ws.hash, 0xFF, (size_t)(1 << 16) * 4);
    const int64_t max_off = 1LL << window_log;
    HuffEncT huff;
    huff.valid = 0;
    huff.nlens = 0;
    huff.max_bits = 0;
    int rc = 0;
    int64_t offp = 0;
    bool first = true;
    while (first || offp < n) {
        int64_t bn = n - offp < BLOCK ? n - offp : BLOCK;
        const uint8_t* block = data + offp;
        bool last = offp + bn >= n;
        first = false;
        if (bn == 0) {
            uint32_t v = 1 | (BLOCK_RAW << 1);
            uint8_t b[3] = {(uint8_t)v, (uint8_t)(v >> 8), (uint8_t)(v >> 16)};
            if (ob_put(&o, b, 3) < 0) { rc = -1; break; }
            offp += bn;
            continue;
        }
        if (level == 0) {
            uint32_t v = (uint32_t)((last ? 1 : 0) | (BLOCK_RAW << 1)
                                    | (bn << 3));
            uint8_t b[3] = {(uint8_t)v, (uint8_t)(v >> 8), (uint8_t)(v >> 16)};
            if (ob_put(&o, b, 3) < 0 || ob_put(&o, block, bn) < 0) {
                rc = -1;
                break;
            }
            offp += bn;
            continue;
        }
        bool rle = true;
        for (int64_t i = 1; i < bn; i++)
            if (block[i] != block[0]) { rle = false; break; }
        if (rle) {
            uint32_t v = (uint32_t)((last ? 1 : 0) | (BLOCK_RLE << 1)
                                    | (bn << 3));
            uint8_t b[3] = {(uint8_t)v, (uint8_t)(v >> 8), (uint8_t)(v >> 16)};
            if (ob_put(&o, b, 3) < 0 || ob_byte(&o, block[0]) < 0) {
                rc = -1;
                break;
            }
            offp += bn;
            continue;
        }
        int64_t hist_c[3] = {hist[0], hist[1], hist[2]};
        HuffEncT huff_c = huff;
        int64_t r = compress_block_c(data, 0, offp, offp + bn, ws.hash,
                                     max_off, hist_c, &huff_c, &ws);
        if (r < 0) { rc = (int)r; break; }
        if (r > 0 && r < bn) {
            uint32_t v = (uint32_t)((last ? 1 : 0) | (BLOCK_COMPRESSED << 1)
                                    | (r << 3));
            uint8_t b[3] = {(uint8_t)v, (uint8_t)(v >> 8), (uint8_t)(v >> 16)};
            if (ob_put(&o, b, 3) < 0 || ob_put(&o, ws.blockout, r) < 0) {
                rc = -1;
                break;
            }
            hist[0] = hist_c[0]; hist[1] = hist_c[1]; hist[2] = hist_c[2];
            huff = huff_c;
        } else {
            uint32_t v = (uint32_t)((last ? 1 : 0) | (BLOCK_RAW << 1)
                                    | (bn << 3));
            uint8_t b[3] = {(uint8_t)v, (uint8_t)(v >> 8), (uint8_t)(v >> 16)};
            if (ob_put(&o, b, 3) < 0 || ob_put(&o, block, bn) < 0) {
                rc = -1;
                break;
            }
        }
        offp += bn;
    }
    enc_ws_free(&ws);
    if (rc < 0) return rc;
    if (checksum) {
        uint64_t h = zt_xxh64(data, (uint64_t)n);
        uint8_t b[4] = {(uint8_t)h, (uint8_t)(h >> 8), (uint8_t)(h >> 16),
                        (uint8_t)(h >> 24)};
        if (ob_put(&o, b, 4) < 0) return -1;
    }
    return o.len;
}

// ---------------------------------------------------------------------------
// Whole-frame walk for the device framer (models/framer.py::_parse_frame).
//
// Walks one SIMPLE frame (no dictionary id, single block group) in a single
// call, emitting flat descriptor arrays the Python framer turns into its
// lane/batch state — the per-block Python byte-fiddling and the per-table
// ctypes round trips collapse into one call per frame. Anything outside
// scope returns -100 (caller uses the Python walk: dictionaries, frames
// that would chain into block groups); any malformed input returns another
// negative (caller re-parses on the Python path for the typed error), so
// Python remains the single source of truth for errors.
//
// Outputs (capacities supplied; -101 on overflow -> Python walk):
//   fm[24] (int64):
//     0 header_size, 1 fcs (-1 none), 2 checksum_flag, 3 checksum_value,
//     4 window_size, 5 end_pos, 6 n_litops, 7 n_syn, 8 n_hlanes,
//     9 n_slanes, 10 n_htabs, 11 n_ll, 12 n_of, 13 n_ml, 14 lit_cursor,
//     15 seq_cursor, 16 out_bound, 17 single_segment
//   litops: 4 x i32 per op  {dst, kind(0 slice | 1 rle), src_off|byte, len}
//   syn:    4 x i32 per op  {slot, ll, ml, of}
//   hl:     6 x i32 per lane {src_off, src_len, local_tid, nsym, dst, pos}
//   sl:    14 x i32 per lane {src_off, src_len, n, ll_mode, ll_v, of_mode,
//                             of_v, ml_mode, ml_v, dst, lit_total, trail,
//                             pos, 0}  (mode 0 pred / 1 rle: v=byte /
//                             2 fse: v=local tid / 3 repeat)
//   huffman tables (local tid t): hluts + t*2048, hbnd + t*16,
//     hsyms + t*64, hmeta + t*3 {max_bits, nranks, consumed}
//   FSE tables: lltab + i*512, oftab + i*256, mltab + i*512 (u32 rows),
//     logs in fse_logs: ll at [0..], of at [256..], ml at [512..]

static int64_t stream_pos(const uint8_t* s, int64_t n) {
    if (n <= 0 || s[n - 1] == 0) return -1;
    int bl = 32 - __builtin_clz((uint32_t)s[n - 1]);
    return (n - 1) * 8 + bl - 1;
}

int64_t zt_walk_frame(const uint8_t* data, int64_t len,
                      int64_t* fm,
                      int32_t* litops, int64_t litops_cap,
                      int32_t* syn, int64_t syn_cap,
                      int32_t* hl, int64_t hl_cap,
                      int32_t* sl, int64_t sl_cap,
                      uint16_t* hluts, int32_t* hbnd, int32_t* hsyms,
                      int32_t* hmeta, int64_t htab_cap,
                      uint32_t* lltab, uint32_t* oftab, uint32_t* mltab,
                      int32_t* fse_logs, int64_t fse_cap) {
    const int64_t MAX_BLOCK = 128 * 1024;
    // MUST match zstd_tpu/models/framer.py (the walker bails to the Python
    // walk exactly when the framer would split into a chained group)
    const int64_t GROUP_OUT_CAP = ((int64_t)1 << 21) - ((int64_t)1 << 17);
    const int64_t GROUP_SEQ_CAP = 80 * 1024;
    if (len < 4) return -1;
    uint32_t magic = (uint32_t)rd32(data);
    if (magic != 0xFD2FB528u) return -1;  // skippable/garbage -> Python
    if (len < 5) return -1;
    uint8_t desc = data[4];
    int fcs_flag = desc >> 6;
    int single = (desc >> 5) & 1;
    if (desc & 0x08) return -1;           // reserved bit
    int checksum = (desc >> 2) & 1;
    int did_flag = desc & 3;
    if (did_flag) return -100;            // dictionary frames -> Python
    int64_t pos = 5;
    int64_t window = 0;
    if (!single) {
        if (len < pos + 1) return -1;
        uint8_t wd = data[pos++];
        int64_t wbase = (int64_t)1 << (10 + (wd >> 3));
        window = wbase + (wbase / 8) * (wd & 7);
    }
    static const int fcs_len[4] = {0, 2, 4, 8};
    int nfcs = single && fcs_flag == 0 ? 1 : fcs_len[fcs_flag];
    int64_t fcs = -1;
    if (nfcs) {
        if (len < pos + nfcs) return -1;
        fcs = 0;
        for (int i = 0; i < nfcs; i++) fcs |= (int64_t)data[pos + i] << (8 * i);
        if (nfcs == 2) fcs += 256;
        pos += nfcs;
    }
    if (single) window = fcs >= 0 ? fcs : 0;
    if (!single && (window < 1024 || window > ((int64_t)1 << 41) + 7 * ((int64_t)1 << 38)))
        return -1;
    fm[0] = pos; fm[1] = fcs; fm[2] = checksum; fm[17] = single;
    fm[4] = window;

    int64_t n_lit = 0, n_syn = 0, n_hl = 0, n_sl = 0, n_ht = 0;
    int64_t n_ll = 0, n_of = 0, n_ml = 0;
    int64_t lit_cursor = 0, seq_cursor = 0, out_bound = 0;
    int cur_huff = -1;
    int have_ll = 0, have_of = 0, have_ml = 0;  // repeat-mode needs a prior
    int64_t cap = window && window < MAX_BLOCK ? window : MAX_BLOCK;

    for (;;) {
        if (pos + 3 > len) return -2;
        uint32_t bh = data[pos] | ((uint32_t)data[pos + 1] << 8)
                    | ((uint32_t)data[pos + 2] << 16);
        pos += 3;
        int last = bh & 1;
        int btype = (bh >> 1) & 3;
        int64_t bsize = bh >> 3;
        if (btype == 3) return -2;
        if (bsize > cap) return -2;
        if (btype == 1) {  // RLE
            if (pos + 1 > len) return -2;
            uint8_t b = data[pos++];
            if (bsize > 0) {
                if (n_lit >= litops_cap || n_syn >= syn_cap) return -101;
                int32_t* L = litops + 4 * n_lit++;
                L[0] = (int32_t)lit_cursor; L[1] = 1; L[2] = b; L[3] = 1;
                lit_cursor += 1;
                int32_t* S = syn + 4 * n_syn++;
                S[0] = (int32_t)seq_cursor++; S[1] = 1;
                S[2] = (int32_t)(bsize - 1); S[3] = bsize > 1 ? 1 : 0;
            }
            out_bound += bsize;
        } else if (btype == 0) {  // RAW (always emits, even when empty —
                                  // the Python walk consumes a slot too)
            if (pos + bsize > len) return -2;
            if (n_lit >= litops_cap || n_syn >= syn_cap) return -101;
            int32_t* L = litops + 4 * n_lit++;
            L[0] = (int32_t)lit_cursor; L[1] = 0;
            L[2] = (int32_t)pos; L[3] = (int32_t)bsize;
            lit_cursor += bsize;
            int32_t* S = syn + 4 * n_syn++;
            S[0] = (int32_t)seq_cursor++; S[1] = (int32_t)bsize;
            S[2] = 0; S[3] = 0;
            pos += bsize;
            out_bound += bsize;
        } else {  // compressed
            const uint8_t* c = data + pos;
            int64_t cn = bsize;
            if (pos + bsize > len) return -2;
            pos += bsize;
            // ---- literals section -------------------------------------
            if (cn < 1) return -3;
            int lit_type = c[0] & 3;
            int size_format = (c[0] >> 2) & 3;
            int64_t p = 0, regen = 0, comp = -1;
            int nstreams = 1;
            if (lit_type == 0 || lit_type == 1) {  // RAW / RLE literals
                if (size_format == 0 || size_format == 2) {
                    regen = c[0] >> 3; p = 1;
                } else if (size_format == 1) {
                    if (cn < 2) return -3;
                    regen = (c[0] >> 4) | ((int64_t)c[1] << 4); p = 2;
                } else {
                    if (cn < 3) return -3;
                    regen = (c[0] >> 4) | ((int64_t)c[1] << 4)
                          | ((int64_t)c[2] << 12); p = 3;
                }
            } else {
                int hdr, regen_bits;
                if (size_format == 0) { nstreams = 1; regen_bits = 10; hdr = 3; }
                else if (size_format == 1) { nstreams = 4; regen_bits = 10; hdr = 3; }
                else if (size_format == 2) { nstreams = 4; regen_bits = 14; hdr = 4; }
                else { nstreams = 4; regen_bits = 18; hdr = 5; }
                if (cn < hdr) return -3;
                uint64_t v = 0;
                for (int i = 0; i < hdr; i++) v |= (uint64_t)c[i] << (8 * i);
                v >>= 4;
                uint64_t mask = ((uint64_t)1 << regen_bits) - 1;
                regen = (int64_t)(v & mask);
                comp = (int64_t)((v >> regen_bits) & mask);
                if (comp == 0) return -3;
                p = hdr;
            }
            int64_t lit_start = lit_cursor;
            if (lit_type == 0) {          // raw literals
                if (p + regen > cn) return -3;
                if (regen > 0) {
                    if (n_lit >= litops_cap) return -101;
                    int32_t* L = litops + 4 * n_lit++;
                    L[0] = (int32_t)lit_cursor; L[1] = 0;
                    L[2] = (int32_t)(pos - bsize + p); L[3] = (int32_t)regen;
                }
                lit_cursor += regen;
                p += regen;
            } else if (lit_type == 1) {   // rle literals
                if (p + 1 > cn) return -3;
                if (regen > 0) {
                    if (n_lit >= litops_cap) return -101;
                    int32_t* L = litops + 4 * n_lit++;
                    L[0] = (int32_t)lit_cursor; L[1] = 1;
                    L[2] = c[p]; L[3] = (int32_t)regen;
                }
                lit_cursor += regen;
                p += 1;
            } else {                      // compressed / treeless
                if (p + comp > cn) return -3;
                const uint8_t* pay = c + p;
                int64_t pay_off = (pos - bsize) + p;  // abs offset of payload
                int64_t q = 0;
                if (lit_type == 2) {      // new table
                    if (n_ht >= htab_cap) return -101;
                    int64_t r = zt_huff_parse(pay, comp,
                                              hluts + n_ht * 2048,
                                              hbnd + n_ht * 16,
                                              hsyms + n_ht * 64,
                                              hmeta + n_ht * 3);
                    if (r < 0) return -4;
                    q = hmeta[n_ht * 3 + 2];
                    cur_huff = (int)n_ht++;
                } else if (cur_huff < 0) {
                    return -4;            // treeless without a table
                }
                if (nstreams == 1) {
                    if (n_hl >= hl_cap) return -101;
                    int32_t* H = hl + 6 * n_hl++;
                    H[0] = (int32_t)(pay_off + q);
                    H[1] = (int32_t)(comp - q);
                    H[2] = cur_huff; H[3] = (int32_t)regen;
                    H[4] = (int32_t)lit_start;
                    H[5] = (int32_t)stream_pos(pay + q, comp - q);
                } else {
                    if (comp - q < 6) return -4;
                    int64_t s1 = pay[q] | ((int64_t)pay[q + 1] << 8);
                    int64_t s2 = pay[q + 2] | ((int64_t)pay[q + 3] << 8);
                    int64_t s3 = pay[q + 4] | ((int64_t)pay[q + 5] << 8);
                    q += 6;
                    int64_t total = comp - q;
                    int64_t s4 = total - s1 - s2 - s3;
                    if (s4 <= 0) return -4;
                    int64_t r123 = (regen + 3) / 4;
                    int64_t r4 = regen - 3 * r123;
                    if (r4 < 0) return -4;
                    int64_t szs[4] = {s1, s2, s3, s4};
                    int64_t rs[4] = {r123, r123, r123, r4};
                    int64_t off = lit_start;
                    for (int k = 0; k < 4; k++) {
                        if (n_hl >= hl_cap) return -101;
                        int32_t* H = hl + 6 * n_hl++;
                        H[0] = (int32_t)(pay_off + q);
                        H[1] = (int32_t)szs[k];
                        H[2] = cur_huff; H[3] = (int32_t)rs[k];
                        H[4] = (int32_t)off;
                        H[5] = (int32_t)stream_pos(pay + q, szs[k]);
                        q += szs[k];
                        off += rs[k];
                    }
                }
                lit_cursor += regen;
                p += comp;
            }
            int64_t block_lits = lit_cursor - lit_start;
            // ---- sequences header -------------------------------------
            if (p >= cn) return -5;
            int64_t nseq, sp;
            uint8_t b0 = c[p];
            if (b0 == 0) { nseq = 0; sp = 1; }
            else if (b0 < 128) { nseq = b0; sp = 1; }
            else if (b0 < 255) {
                if (p + 2 > cn) return -5;
                nseq = ((int64_t)(b0 - 128) << 8) + c[p + 1]; sp = 2;
            } else {
                if (p + 3 > cn) return -5;
                nseq = c[p + 1] + ((int64_t)c[p + 2] << 8) + 0x7F00; sp = 3;
            }
            if (nseq == 0) {
                p += sp;
                if (block_lits) {
                    if (n_syn >= syn_cap) return -101;
                    int32_t* S = syn + 4 * n_syn++;
                    S[0] = (int32_t)seq_cursor++;
                    S[1] = (int32_t)block_lits; S[2] = 0; S[3] = 0;
                }
                out_bound += block_lits;
            } else {
                if (p + sp + 1 > cn) return -5;
                int modes = c[p + sp];
                if (modes & 3) return -5;
                p += sp + 1;
                int mode3[3] = {(modes >> 6) & 3, (modes >> 4) & 3,
                                (modes >> 2) & 3};
                int32_t mv[3], mm[3];
                struct { uint32_t* tab; int w; int64_t* n; int* have;
                         int64_t logoff; int maxlog; } K[3] = {
                    {lltab, 512, &n_ll, &have_ll, 0, 9},
                    {oftab, 256, &n_of, &have_of, fse_cap, 8},
                    {mltab, 512, &n_ml, &have_ml, 2 * fse_cap, 9},
                };
                for (int k = 0; k < 3; k++) {
                    int mode = mode3[k];
                    mm[k] = mode;
                    if (mode == 0) {          // predefined
                        mv[k] = 0;
                        *K[k].have = 1;
                    } else if (mode == 1) {   // RLE
                        if (p + 1 > cn) return -6;
                        mv[k] = c[p]; p += 1;
                        *K[k].have = 1;
                    } else if (mode == 2) {   // FSE-described
                        if (*K[k].n >= fse_cap) return -101;
                        int32_t meta2[3];
                        int64_t r = zt_fse_parse_packed(
                            c + p, cn - p > 512 ? 512 : cn - p, K[k].maxlog,
                            K[k].w, K[k].tab + *K[k].n * K[k].w, meta2);
                        if (r < 0) return -6;
                        fse_logs[K[k].logoff + *K[k].n] = meta2[0];
                        mv[k] = (int32_t)(*K[k].n)++;
                        p += meta2[1];
                        *K[k].have = 1;
                    } else {                  // repeat
                        if (!*K[k].have) return -6;
                        mv[k] = -1;
                    }
                }
                if (p >= cn) return -6;       // empty bitstream
                // 128-aligned slot span + trailing-literals slot
                int64_t dst = (seq_cursor + 127) & ~(int64_t)127;
                seq_cursor = dst + nseq;
                int64_t trail = seq_cursor;
                if (n_syn >= syn_cap) return -101;
                int32_t* S = syn + 4 * n_syn++;
                S[0] = (int32_t)trail; S[1] = 0; S[2] = 0; S[3] = 0;
                seq_cursor += 1;
                int64_t span_end = dst + ((nseq + 127) & ~(int64_t)127);
                if (span_end > seq_cursor) seq_cursor = span_end;
                if (n_sl >= sl_cap) return -101;
                int32_t* Q = sl + 14 * n_sl++;
                int64_t bs_off = (pos - bsize) + p;
                Q[0] = (int32_t)bs_off; Q[1] = (int32_t)(cn - p);
                Q[2] = (int32_t)nseq;
                Q[3] = mm[0]; Q[4] = mv[0];
                Q[5] = mm[1]; Q[6] = mv[1];
                Q[7] = mm[2]; Q[8] = mv[2];
                Q[9] = (int32_t)dst; Q[10] = (int32_t)block_lits;
                Q[11] = (int32_t)trail;
                Q[12] = (int32_t)stream_pos(c + p, cn - p); Q[13] = 0;
                out_bound += cap;  // Block_Maximum_Size = min(window, 128K)
            }
        }
        if (last) break;
        // would split into a chained block group -> Python walk
        if (out_bound >= GROUP_OUT_CAP || seq_cursor >= GROUP_SEQ_CAP)
            return -100;
    }
    if (checksum) {
        if (pos + 4 > len) return -7;
        fm[3] = (int64_t)(uint32_t)rd32(data + pos);
        pos += 4;
    } else {
        fm[3] = 0;
    }
    if (pos != len) return -7;  // trailing bytes after frame
    fm[5] = pos;
    fm[6] = n_lit; fm[7] = n_syn; fm[8] = n_hl; fm[9] = n_sl;
    fm[10] = n_ht; fm[11] = n_ll; fm[12] = n_of; fm[13] = n_ml;
    fm[14] = lit_cursor; fm[15] = seq_cursor; fm[16] = out_bound;
    return 0;
}

}  // extern "C"
