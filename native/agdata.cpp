// Native dataset-format codec: the byte-exact v100/v200/v201 game-record
// serializer/parser as a C library, loaded by data/formats.py via ctypes.
//
// The runtime counterpart of the reference's C++ dataset storage
// (reference: src/dataset/SearchDataStorage.cpp per-move records,
// src/dataset/GameDataStorage.cpp:27-100 game framing,
// include/alphagomoku/utils/low_precision.hpp the LowFP quantizers).
// data/formats.py remains the executable spec: tests assert this codec is
// BYTE-IDENTICAL to the Python writer and value-identical on parse
// (tests/test_formats.py::test_native_codec_*).
//
// Build: make -C native  (produces native/libagdata.so)

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

struct LowFP {
    int S, E, M, B;
    int max_exponent() const { return (1 << E) - 1 + B; }
    int min_exponent() const { return B; }
    int max_mantissa() const { return (1 << M) - 1; }

    // float32 arithmetic throughout (low_precision.hpp:111-120)
    int to_lowp(float x) const {
        uint32_t bits;
        std::memcpy(&bits, &x, 4);
        const int bitsize = S + E + M;
        const int sign = S ? static_cast<int>((bits & 0x80000000u) >> (32 - bitsize)) : 0;
        int exponent = static_cast<int>((bits & 0x7F800000u) >> 23) - 127;
        exponent = std::max(min_exponent(), std::min(max_exponent(), exponent));
        const int is_subnormal = (exponent == min_exponent()) ? 1 : 0;
        const float mag = sign ? -x : x;
        const float base =
            mag * std::ldexp(1.0f, -(exponent + is_subnormal)) +
            static_cast<float>(is_subnormal - 1);
        const int mantissa = std::min(
            max_mantissa(), static_cast<int>(base * (1 << M) + 0.5f));
        return sign | ((exponent - B) << M) | mantissa;
    }

    double to_fp32(int x) const {
        const int sign_mask = S ? (1 << (E + M)) : 0;
        const int exponent = ((x >> M) & ((1 << E) - 1)) + B;
        const double base = static_cast<double>(x & max_mantissa()) / (1 << M);
        const int is_subnormal = (exponent == min_exponent()) ? 1 : 0;
        const double val =
            (1 - is_subnormal + base) * std::ldexp(1.0, exponent + is_subnormal);
        return (S && (x & sign_mask)) ? -val : val;
    }

    double maxval() const {
        const int bitsize = S + E + M;
        const int top = (S == 0) ? ((1 << bitsize) - 1) : ((1 << (bitsize - 1)) - 1);
        return to_fp32(top);
    }
};

const LowFP FP16{0, 5, 11, -16};
const LowFP VISIT{0, 3, 5, -8};
const LowFP POLICY{0, 4, 4, -16};
const LowFP VALUE{0, 4, 4, -16};
const LowFP SCORE6{1, 3, 2, -8};

constexpr int PV_UNKNOWN = 2, PV_WIN = 3, PV_LOSS = 0, PV_DRAW = 1;

int score_to_int8(int s) {  // SearchDataStorage.cpp:24-31
    const int pv = (s >> 13) & 7;
    const int ev = (s & 0x1FFF) - 4000;
    if (pv != PV_UNKNOWN) {
        const int dist = (pv == PV_WIN) ? -ev : ev;
        return (pv << 6) | std::max(0, std::min(63, dist));
    }
    return (pv << 6) | SCORE6.to_lowp(static_cast<float>(ev) / 1000.0f);
}

int score_u16(int pv, int eval_or_dist) {
    if (pv == PV_WIN) return (pv << 13) | (4000 - eval_or_dist);
    return (pv << 13) | (4000 + eval_or_dist);
}

int int8_to_score(int x) {  // SearchDataStorage.cpp:32-49
    const int pv = (x >> 6) & 3;
    const int low = x & 63;
    if (pv == PV_WIN) return score_u16(PV_WIN, low);
    if (pv == PV_LOSS || pv == PV_DRAW) return score_u16(pv, low);
    return score_u16(
        PV_UNKNOWN, static_cast<int>(1000.0 * SCORE6.to_fp32(low) + 0.5));
}

void put_u16(std::vector<uint8_t>& out, uint16_t v) {
    out.push_back(v & 0xFF);
    out.push_back(v >> 8);
}
void put_u32(std::vector<uint8_t>& out, uint32_t v) {
    for (int i = 0; i < 4; i++) out.push_back((v >> (8 * i)) & 0xFF);
}
void put_i32(std::vector<uint8_t>& out, int32_t v) {
    put_u32(out, static_cast<uint32_t>(v));
}

struct RecView {
    const int32_t* visit;
    const float* policy;
    const float* win;
    const float* draw;
    const uint16_t* scores;
    uint16_t minimax, move_number, flags;
};

// v201 record (SearchDataStorage_v201::serialize); v200 = header minus flags
void serialize_record_v20x(const RecView& r, int hw, bool v201,
                           std::vector<uint8_t>& out) {
    std::vector<uint8_t> proven(hw);
    for (int i = 0; i < hw; i++)
        proven[i] = (((r.scores[i] >> 13) & 7) != PV_UNKNOWN);
    float policy_scale = 0.0f, value_scale = 0.0f;
    float visit_max = 1.0f;
    for (int i = 0; i < hw; i++) {
        policy_scale = std::max(policy_scale, r.policy[i]);
        value_scale = std::max(value_scale, std::max(r.win[i], r.draw[i]));
        visit_max = std::max(visit_max, static_cast<float>(r.visit[i]));
    }
    policy_scale = (policy_scale == 0.0f)
        ? 1.0f : policy_scale / static_cast<float>(POLICY.maxval());
    value_scale = (value_scale == 0.0f)
        ? 1.0f : value_scale / static_cast<float>(POLICY.maxval());
    const float visit_scale = visit_max / static_cast<float>(VISIT.maxval());

    struct Entry { uint8_t d, v, p, s, wr, dr; };
    std::vector<Entry> entries;
    int last = 0;
    for (int i = 0; i < hw; i++) {
        if (r.visit[i] > 0 || proven[i] || (i - last) >= 255) {
            entries.push_back(Entry{
                static_cast<uint8_t>(i - last),
                static_cast<uint8_t>(VISIT.to_lowp(
                    static_cast<float>(r.visit[i]) / visit_scale)),
                static_cast<uint8_t>(POLICY.to_lowp(r.policy[i] / policy_scale)),
                static_cast<uint8_t>(score_to_int8(r.scores[i])),
                static_cast<uint8_t>(VALUE.to_lowp(r.win[i] / value_scale)),
                static_cast<uint8_t>(VALUE.to_lowp(r.draw[i] / value_scale)),
            });
            last = i;
        }
    }
    put_u16(out, FP16.to_lowp(value_scale));
    put_u16(out, FP16.to_lowp(policy_scale));
    put_u16(out, FP16.to_lowp(visit_scale));
    put_u16(out, r.minimax);
    put_u16(out, r.move_number);
    if (v201) put_u16(out, r.flags);
    put_u32(out, entries.size());
    for (const auto& e : entries) {
        out.push_back(e.d); out.push_back(e.v); out.push_back(e.p);
        out.push_back(e.s); out.push_back(e.wr); out.push_back(e.dr);
    }
}

// v100 record (SearchDataStorage::serialize, :79-140)
void serialize_record_v1(const RecView& r, int hw, int cols,
                         std::vector<uint8_t>& out) {
    std::vector<int> entries;
    for (int i = 0; i < hw; i++)
        if (r.visit[i] > 0 || (((r.scores[i] >> 13) & 7) != PV_UNKNOWN))
            entries.push_back(i);
    put_u16(out, r.minimax);
    put_u16(out, r.move_number);
    put_u32(out, entries.size());
    for (int i : entries) {
        out.push_back(static_cast<uint8_t>(i / cols));
        out.push_back(static_cast<uint8_t>(i % cols));
        put_u16(out, static_cast<uint16_t>(
            std::min<int64_t>(0xFFFF, r.visit[i])));
        // NumPy-2 scalar promotion keeps python-float * float32 in
        // FLOAT32 — match the spec's arithmetic exactly
        put_u16(out, static_cast<uint16_t>(
            65535.0f * std::min(1.0f, r.policy[i])));
        put_u16(out, r.scores[i]);
        put_u16(out, static_cast<uint16_t>(
            65535.0f * std::min(1.0f, r.win[i])));
        put_u16(out, static_cast<uint16_t>(
            65535.0f * std::min(1.0f, r.draw[i])));
    }
}

uint16_t get_u16(const uint8_t* buf, size_t& off) {
    uint16_t v = buf[off] | (buf[off + 1] << 8);
    off += 2;
    return v;
}
uint32_t get_u32(const uint8_t* buf, size_t& off) {
    uint32_t v = 0;
    for (int i = 0; i < 4; i++) v |= static_cast<uint32_t>(buf[off + i]) << (8 * i);
    off += 4;
    return v;
}

}  // namespace

extern "C" {

// Serialize one game into a malloc'd blob.  Per-record arrays are
// concatenated [n_records, hw]; moves are uint16 toShort codes.
// Returns the blob via *out/*out_len (caller frees with ag_free).
int ag_serialize_game(
    int fmt, int n_records, int hw, int cols,
    const int32_t* visit, const float* policy, const float* win,
    const float* draw, const uint16_t* scores, const uint16_t* minimax,
    const uint16_t* move_number, const uint16_t* flags,
    const uint16_t* moves, int n_moves, int outcome, int rows_, int cols_,
    uint8_t** out, int64_t* out_len) {
    std::vector<uint8_t> blob;
    blob.reserve(static_cast<size_t>(n_records) * (12 + 6 * 64));
    put_u32(blob, n_records);
    for (int n = 0; n < n_records; n++) {
        RecView r{visit + static_cast<size_t>(n) * hw,
                  policy + static_cast<size_t>(n) * hw,
                  win + static_cast<size_t>(n) * hw,
                  draw + static_cast<size_t>(n) * hw,
                  scores + static_cast<size_t>(n) * hw,
                  minimax[n], move_number[n], flags[n]};
        if (fmt == 201) serialize_record_v20x(r, hw, true, blob);
        else if (fmt == 200) serialize_record_v20x(r, hw, false, blob);
        else if (fmt == 100) serialize_record_v1(r, hw, cols, blob);
        else return -1;
    }
    put_u32(blob, n_moves);
    if (fmt == 100) {
        // alignas(4) Move {int32 sign; int8 row; int8 col; pad[2]}
        for (int k = 0; k < n_moves; k++) {
            put_i32(blob, 1 + (k % 2));
            blob.push_back(moves[k] & 0xFF);
            blob.push_back((moves[k] >> 8) & 0xFF);
            blob.push_back(0);
            blob.push_back(0);
        }
    } else {
        for (int k = 0; k < n_moves; k++) put_u16(blob, moves[k]);
    }
    put_i32(blob, outcome);
    put_i32(blob, rows_);
    put_i32(blob, cols_);

    *out_len = static_cast<int64_t>(blob.size());
    *out = static_cast<uint8_t*>(std::malloc(blob.size()));
    if (*out == nullptr) return -2;
    std::memcpy(*out, blob.data(), blob.size());
    return 0;
}

// Parse one game starting at `off`.  Outputs are malloc'd; the caller
// copies and frees each with ag_free.  Returns the new offset, or <0.
//
// Hardened against corrupted/truncated buffers (advisor r4 finding): the
// on-disk record/move counts are validated against the remaining buffer
// length BEFORE any allocation sized by them, every allocation is
// NULL-checked, per-entry cell indices are bounds-checked against hw, and
// every error path frees all outputs (the ctypes caller only frees on
// success).
int64_t ag_parse_game(
    int fmt, const uint8_t* buf, int64_t buf_len, int64_t off0, int hw,
    int32_t* n_records_out,
    int32_t** visit, float** policy, float** win, float** draw,
    uint16_t** scores, uint16_t** minimax, uint16_t** move_number,
    uint16_t** flags,
    uint16_t** moves, int32_t* n_moves_out,
    int32_t* outcome, int32_t* rows_out, int32_t* cols_out) {
    size_t off = static_cast<size_t>(off0);
    const size_t end = static_cast<size_t>(buf_len);
    *visit = nullptr; *policy = nullptr; *win = nullptr; *draw = nullptr;
    *scores = nullptr; *minimax = nullptr; *move_number = nullptr;
    *flags = nullptr; *moves = nullptr;
    auto fail = [&](int64_t code) -> int64_t {
        std::free(*visit);  std::free(*policy); std::free(*win);
        std::free(*draw);   std::free(*scores); std::free(*minimax);
        std::free(*move_number); std::free(*flags); std::free(*moves);
        *visit = nullptr; *policy = nullptr; *win = nullptr; *draw = nullptr;
        *scores = nullptr; *minimax = nullptr; *move_number = nullptr;
        *flags = nullptr; *moves = nullptr;
        return code;
    };
    if (off + 4 > end || hw <= 0) return fail(-1);
    const uint32_t n = get_u32(buf, off);
    const int cols_guess = static_cast<int>(std::lround(std::sqrt(hw)));
    // every record needs at least its fixed header (v201: 12+4, v200:
    // 10+4, v100: 4+4 bytes) — bound n by the bytes actually present
    const size_t min_rec = (fmt == 201) ? 16 : (fmt == 200) ? 14 : 8;
    if (static_cast<size_t>(n) > (end - off) / min_rec) return fail(-1);

    *visit = static_cast<int32_t*>(std::calloc(static_cast<size_t>(n) * hw + 1, 4));
    *policy = static_cast<float*>(std::calloc(static_cast<size_t>(n) * hw + 1, 4));
    *win = static_cast<float*>(std::calloc(static_cast<size_t>(n) * hw + 1, 4));
    *draw = static_cast<float*>(std::calloc(static_cast<size_t>(n) * hw + 1, 4));
    *scores = static_cast<uint16_t*>(std::malloc(static_cast<size_t>(n) * hw * 2 + 2));
    *minimax = static_cast<uint16_t*>(std::malloc(static_cast<size_t>(n) * 2 + 2));
    *move_number = static_cast<uint16_t*>(std::malloc(static_cast<size_t>(n) * 2 + 2));
    *flags = static_cast<uint16_t*>(std::calloc(n + 1, 2));
    if (!*visit || !*policy || !*win || !*draw || !*scores || !*minimax ||
        !*move_number || !*flags)
        return fail(-8);
    const uint16_t unk = static_cast<uint16_t>((PV_UNKNOWN << 13) | 4000);
    for (size_t i = 0; i < static_cast<size_t>(n) * hw; i++) (*scores)[i] = unk;

    for (uint32_t rec = 0; rec < n; rec++) {
        int32_t* vi = *visit + static_cast<size_t>(rec) * hw;
        float* po = *policy + static_cast<size_t>(rec) * hw;
        float* wi = *win + static_cast<size_t>(rec) * hw;
        float* dr = *draw + static_cast<size_t>(rec) * hw;
        uint16_t* sc = *scores + static_cast<size_t>(rec) * hw;
        if (fmt == 201 || fmt == 200) {
            if (off + (fmt == 201 ? 12u : 10u) + 4u > end) return fail(-2);
            const double value_scale = FP16.to_fp32(get_u16(buf, off));
            const double policy_scale = FP16.to_fp32(get_u16(buf, off));
            const double visit_scale = FP16.to_fp32(get_u16(buf, off));
            (*minimax)[rec] = get_u16(buf, off);
            (*move_number)[rec] = get_u16(buf, off);
            (*flags)[rec] = (fmt == 201) ? get_u16(buf, off) : 0;
            const uint32_t count = get_u32(buf, off);
            if (off + 6ull * count > end) return fail(-3);
            int idx = 0;
            for (uint32_t k = 0; k < count; k++) {
                idx += buf[off];
                if (idx >= hw) return fail(-3);
                vi[idx] = static_cast<int32_t>(
                    VISIT.to_fp32(buf[off + 1]) * visit_scale + 0.5);
                po[idx] = static_cast<float>(
                    POLICY.to_fp32(buf[off + 2]) * policy_scale);
                sc[idx] = static_cast<uint16_t>(int8_to_score(buf[off + 3]));
                wi[idx] = static_cast<float>(
                    VALUE.to_fp32(buf[off + 4]) * value_scale);
                dr[idx] = static_cast<float>(
                    VALUE.to_fp32(buf[off + 5]) * value_scale);
                off += 6;
            }
        } else if (fmt == 100) {
            if (off + 8 > end) return fail(-2);
            (*minimax)[rec] = get_u16(buf, off);
            (*move_number)[rec] = get_u16(buf, off);
            (*flags)[rec] = 0;
            const uint32_t count = get_u32(buf, off);
            if (off + 12ull * count > end) return fail(-3);
            for (uint32_t k = 0; k < count; k++) {
                const int r = buf[off];
                const int c = buf[off + 1];
                off += 2;
                const int i = r * cols_guess + c;
                if (i < 0 || i >= hw) return fail(-3);
                vi[i] = get_u16(buf, off);
                po[i] = static_cast<float>(get_u16(buf, off)) / 65535.0f;
                sc[i] = get_u16(buf, off);
                wi[i] = static_cast<float>(get_u16(buf, off)) / 65535.0f;
                dr[i] = static_cast<float>(get_u16(buf, off)) / 65535.0f;
            }
        } else {
            return fail(-4);
        }
    }
    if (off + 4 > end) return fail(-5);
    const uint32_t n_moves = get_u32(buf, off);
    // validate the move count against the remaining bytes BEFORE allocating
    if (static_cast<size_t>(n_moves) >
        (end - off) / (fmt == 100 ? 8u : 2u))
        return fail(-6);
    *moves = static_cast<uint16_t*>(std::malloc(
        static_cast<size_t>(n_moves) * 2 + 2));
    if (!*moves) return fail(-8);
    if (fmt == 100) {
        if (off + 8ull * n_moves > end) return fail(-6);
        for (uint32_t k = 0; k < n_moves; k++) {
            off += 4;  // int32 sign (implicit from parity)
            const int row = buf[off];
            const int col = buf[off + 1];
            off += 4;  // row, col, 2 pad
            (*moves)[k] = static_cast<uint16_t>((col << 8) | row);
        }
    } else {
        if (off + 2ull * n_moves > end) return fail(-6);
        for (uint32_t k = 0; k < n_moves; k++) (*moves)[k] = get_u16(buf, off);
    }
    if (off + 12 > end) return fail(-7);
    *outcome = static_cast<int32_t>(get_u32(buf, off));
    *rows_out = static_cast<int32_t>(get_u32(buf, off));
    *cols_out = static_cast<int32_t>(get_u32(buf, off));
    *n_records_out = static_cast<int32_t>(n);
    *n_moves_out = static_cast<int32_t>(n_moves);
    return static_cast<int64_t>(off);
}

void ag_free(void* p) { std::free(p); }

// ABI stamp: data/formats.py refuses a stale libagdata.so whose version
// does not match (advisor r4 finding — calling an old binary through new
// ctypes signatures is undefined behavior).  Bump when signatures change.
int ag_abi_version() { return 2; }

}  // extern "C"
