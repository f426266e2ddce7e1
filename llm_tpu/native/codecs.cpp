// Native block-quant transcoder: GGML block bytes -> packed K-major planes.
//
// The TPU-native analog of the reference's vendored C codecs (ggml.c
// dequantize_row_* and k_quants.c, captured via the bindgen surface at
// /root/reference/crates/ggml/sys/src/lib.rs:2779-3516). Where ggml decodes
// rows on the fly inside every mat-vec, this library runs ONCE at load time,
// turning each tensor into the packed device layout of llm_tpu/ops/packing.py:
//
//   lo     uint32 [Kp/pw_lo, Rp]   (int8 [Kp, Rp] for 8-bit formats)
//   hi     uint32 [Kp/pw_hi, Rp]   optional high bits
//   scale  f32    [Kp/g,    Rp]
//   bias   f32    [Kp/g,    Rp]    optional
//
// Single pass, no multi-GB int32 intermediates (the numpy fallback needs
// 4 bytes/element of scratch; a 7B load would otherwise eat ~26 GB of RAM).
// Parallel over output rows with OpenMP; rows write disjoint plane columns
// so the loop is embarrassingly parallel.
//
// Canonical decoding contract (must bit-match llm_tpu/ggml/quant.py):
//   value[e] = (q[e] - zero) * scale[e/g] + bias[e/g]

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline float half_to_float(const uint8_t* p) {
    uint16_t h = (uint16_t)(p[0] | (p[1] << 8));
    uint32_t sign = (uint32_t)(h >> 15) << 31;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t f;
    if (exp == 0) {
        if (man == 0) {
            f = sign;
        } else {  // subnormal
            exp = 127 - 15 + 1;
            while ((man & 0x400) == 0) { man <<= 1; exp--; }
            man &= 0x3FF;
            f = sign | (exp << 23) | (man << 13);
        }
    } else if (exp == 0x1F) {
        f = sign | 0x7F800000u | (man << 13);
    } else {
        f = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float out;
    std::memcpy(&out, &f, 4);
    return out;
}

// per-block decoders ---------------------------------------------------------

constexpr int QK = 32;
constexpr int QK_K = 256;

void dec_q4_0(const uint8_t* b, int* q, float* sc, float*) {
    sc[0] = half_to_float(b);
    const uint8_t* qs = b + 2;
    for (int i = 0; i < 16; i++) { q[i] = qs[i] & 0xF; q[i + 16] = qs[i] >> 4; }
}

void dec_q4_1(const uint8_t* b, int* q, float* sc, float* bi) {
    sc[0] = half_to_float(b);
    bi[0] = half_to_float(b + 2);
    const uint8_t* qs = b + 4;
    for (int i = 0; i < 16; i++) { q[i] = qs[i] & 0xF; q[i + 16] = qs[i] >> 4; }
}

void dec_q5_0(const uint8_t* b, int* q, float* sc, float*) {
    sc[0] = half_to_float(b);
    uint32_t qh; std::memcpy(&qh, b + 2, 4);
    const uint8_t* qs = b + 6;
    for (int i = 0; i < 16; i++) { q[i] = qs[i] & 0xF; q[i + 16] = qs[i] >> 4; }
    for (int i = 0; i < 32; i++) q[i] |= (int)((qh >> i) & 1) << 4;
}

void dec_q5_1(const uint8_t* b, int* q, float* sc, float* bi) {
    sc[0] = half_to_float(b);
    bi[0] = half_to_float(b + 2);
    uint32_t qh; std::memcpy(&qh, b + 4, 4);
    const uint8_t* qs = b + 8;
    for (int i = 0; i < 16; i++) { q[i] = qs[i] & 0xF; q[i + 16] = qs[i] >> 4; }
    for (int i = 0; i < 32; i++) q[i] |= (int)((qh >> i) & 1) << 4;
}

void dec_q8_0(const uint8_t* b, int* q, float* sc, float*) {
    sc[0] = half_to_float(b);
    const int8_t* qs = (const int8_t*)(b + 2);
    for (int i = 0; i < 32; i++) q[i] = qs[i];
}

void dec_q2_k(const uint8_t* b, int* q, float* sc, float* bi) {
    const uint8_t* scales = b;
    const uint8_t* qs = b + 16;
    float d = half_to_float(b + 80);
    float dmin = half_to_float(b + 82);
    for (int half = 0; half < 2; half++)
        for (int shift = 0; shift < 4; shift++)
            for (int byte = 0; byte < 32; byte++)
                q[half * 128 + shift * 32 + byte] =
                    (qs[half * 32 + byte] >> (2 * shift)) & 3;
    for (int g = 0; g < 16; g++) {
        sc[g] = d * (scales[g] & 0xF);
        bi[g] = -dmin * (scales[g] >> 4);
    }
}

void dec_q3_k(const uint8_t* b, int* q, float* sc, float*) {
    const uint8_t* hmask = b;
    const uint8_t* qs = b + 32;
    const uint8_t* sb = b + 96;
    float d = half_to_float(b + 108);
    int s6[16];
    for (int i = 0; i < 4; i++) {
        s6[i]      = (sb[i] & 0xF)      | ((sb[8 + i] & 3) << 4);
        s6[4 + i]  = (sb[4 + i] & 0xF)  | (((sb[8 + i] >> 2) & 3) << 4);
        s6[8 + i]  = (sb[i] >> 4)       | (((sb[8 + i] >> 4) & 3) << 4);
        s6[12 + i] = (sb[4 + i] >> 4)   | (((sb[8 + i] >> 6) & 3) << 4);
    }
    for (int half = 0; half < 2; half++)
        for (int shift = 0; shift < 4; shift++)
            for (int byte = 0; byte < 32; byte++) {
                int low2 = (qs[half * 32 + byte] >> (2 * shift)) & 3;
                int hbit = (hmask[byte] >> (half * 4 + shift)) & 1;
                q[half * 128 + shift * 32 + byte] = low2 | (hbit << 2);
            }
    for (int g = 0; g < 16; g++) sc[g] = d * (s6[g] - 32);
}

void scale_min_k4(const uint8_t* sb, int* s, int* m) {
    for (int i = 0; i < 4; i++) {
        s[i] = sb[i] & 63;
        m[i] = sb[4 + i] & 63;
        s[4 + i] = (sb[8 + i] & 0xF) | ((sb[i] >> 6) << 4);
        m[4 + i] = (sb[8 + i] >> 4) | ((sb[4 + i] >> 6) << 4);
    }
}

void dec_q4_k(const uint8_t* b, int* q, float* sc, float* bi) {
    float d = half_to_float(b);
    float dmin = half_to_float(b + 2);
    int s[8], m[8];
    scale_min_k4(b + 4, s, m);
    const uint8_t* qs = b + 16;
    for (int chunk = 0; chunk < 4; chunk++)
        for (int byte = 0; byte < 32; byte++) {
            uint8_t v = qs[chunk * 32 + byte];
            q[chunk * 64 + byte] = v & 0xF;
            q[chunk * 64 + 32 + byte] = v >> 4;
        }
    for (int g = 0; g < 8; g++) {
        sc[g] = d * s[g];
        bi[g] = -dmin * m[g];
    }
}

void dec_q5_k(const uint8_t* b, int* q, float* sc, float* bi) {
    float d = half_to_float(b);
    float dmin = half_to_float(b + 2);
    int s[8], m[8];
    scale_min_k4(b + 4, s, m);
    const uint8_t* qh = b + 16;
    const uint8_t* qs = b + 48;
    for (int chunk = 0; chunk < 4; chunk++)
        for (int sub = 0; sub < 2; sub++)
            for (int byte = 0; byte < 32; byte++) {
                uint8_t v = qs[chunk * 32 + byte];
                int lo4 = sub == 0 ? (v & 0xF) : (v >> 4);
                int hbit = (qh[byte] >> (2 * chunk + sub)) & 1;
                q[chunk * 64 + sub * 32 + byte] = lo4 | (hbit << 4);
            }
    for (int g = 0; g < 8; g++) {
        sc[g] = d * s[g];
        bi[g] = -dmin * m[g];
    }
}

void dec_q6_k(const uint8_t* b, int* q, float* sc, float*) {
    const uint8_t* ql = b;
    const uint8_t* qh = b + 128;
    const int8_t* s8 = (const int8_t*)(b + 192);
    float d = half_to_float(b + 208);
    for (int half = 0; half < 2; half++) {
        const uint8_t* l = ql + half * 64;
        const uint8_t* h = qh + half * 32;
        int* qq = q + half * 128;
        for (int byte = 0; byte < 32; byte++) {
            int l32 = l[byte], h32 = l[32 + byte], hq = h[byte];
            qq[byte]      = (l32 & 0xF) | (((hq >> 0) & 3) << 4);
            qq[32 + byte] = (h32 & 0xF) | (((hq >> 2) & 3) << 4);
            qq[64 + byte] = (l32 >> 4)  | (((hq >> 4) & 3) << 4);
            qq[96 + byte] = (h32 >> 4)  | (((hq >> 6) & 3) << 4);
        }
    }
    for (int half = 0; half < 2; half++)
        for (int row = 0; row < 4; row++)
            for (int sub = 0; sub < 2; sub++)
                sc[half * 8 + row * 2 + sub] = d * s8[half * 8 + row * 2 + sub];
}

struct FormatInfo {
    int block_size;
    int type_size;
    int lo_bits;
    int hi_bits;
    int gsize;
    bool has_bias;
    void (*decode)(const uint8_t*, int*, float*, float*);
};

// ggml type ids (sys/src/lib.rs:51-68)
bool format_info(int t, FormatInfo* out) {
    switch (t) {
        case 2:  *out = {QK, 18, 4, 0, 32, false, dec_q4_0}; return true;   // Q4_0
        case 3:  *out = {QK, 20, 4, 0, 32, true,  dec_q4_1}; return true;   // Q4_1
        case 6:  *out = {QK, 22, 4, 1, 32, false, dec_q5_0}; return true;   // Q5_0
        case 7:  *out = {QK, 24, 4, 1, 32, true,  dec_q5_1}; return true;   // Q5_1
        case 8:  *out = {QK, 34, 8, 0, 32, false, dec_q8_0}; return true;   // Q8_0
        case 10: *out = {QK_K, 84, 2, 0, 16, true,  dec_q2_k}; return true; // Q2_K
        case 11: *out = {QK_K, 110, 2, 1, 16, false, dec_q3_k}; return true;// Q3_K
        case 12: *out = {QK_K, 144, 4, 0, 32, true,  dec_q4_k}; return true;// Q4_K
        case 13: *out = {QK_K, 176, 4, 1, 32, true,  dec_q5_k}; return true;// Q5_K
        case 14: *out = {QK_K, 210, 4, 2, 16, false, dec_q6_k}; return true;// Q6_K
        default: return false;
    }
}

}  // namespace

extern "C" {

// Transcode `n_rows` selected rows of a quantized tensor (row length K,
// quant blocks along K) into zero-initialized packed planes.
// Returns 0 on success, nonzero on unsupported type / bad geometry.
int llm_transcode(
    int ggml_type,
    const uint8_t* data,
    int64_t K,
    int64_t n_rows,
    const int64_t* rows,       // may be null (identity)
    uint32_t* lo,              // uint32 plane, or int8 plane when lo_bits==8
    uint32_t* hi,              // may be null when hi_bits==0
    float* scale,
    float* bias,               // may be null when !has_bias
    int64_t Rp) {
    FormatInfo f;
    if (!format_info(ggml_type, &f)) return 1;
    if (K % f.block_size != 0) return 2;
    if (f.has_bias && bias == nullptr) return 3;
    if (f.hi_bits > 0 && hi == nullptr) return 4;

    const int64_t blocks_per_row = K / f.block_size;
    const int lo_mask = (1 << f.lo_bits) - 1;
    const int pw_lo = f.lo_bits < 8 ? 32 / f.lo_bits : 0;
    const int pw_hi = f.hi_bits ? 32 / f.hi_bits : 0;

#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < n_rows; r++) {
        const int64_t src_row = rows ? rows[r] : r;
        const uint8_t* row_ptr = data + src_row * blocks_per_row * f.type_size;
        int q[QK_K];
        float sc[QK_K / 16];
        float bi[QK_K / 16];
        for (int64_t blk = 0; blk < blocks_per_row; blk++) {
            f.decode(row_ptr + blk * f.type_size, q, sc, bi);
            const int64_t k0 = blk * f.block_size;
            if (f.lo_bits == 8) {
                int8_t* lo8 = (int8_t*)lo;
                for (int e = 0; e < f.block_size; e++)
                    lo8[(k0 + e) * Rp + r] = (int8_t)q[e];
            } else {
                for (int e = 0; e < f.block_size; e++) {
                    const int64_t k = k0 + e;
                    lo[(k / pw_lo) * Rp + r] |=
                        (uint32_t)(q[e] & lo_mask) << ((k % pw_lo) * f.lo_bits);
                }
            }
            if (f.hi_bits) {
                for (int e = 0; e < f.block_size; e++) {
                    const int64_t k = k0 + e;
                    hi[(k / pw_hi) * Rp + r] |=
                        (uint32_t)(q[e] >> f.lo_bits) << ((k % pw_hi) * f.hi_bits);
                }
            }
            const int ngroups = f.block_size / f.gsize;
            for (int g = 0; g < ngroups; g++) {
                const int64_t grow = k0 / f.gsize + g;
                scale[grow * Rp + r] = sc[g];
                if (f.has_bias) bias[grow * Rp + r] = bi[g];
            }
        }
    }
    return 0;
}

// Dequantize a run of blocks to f32 (ggml dequantize_row_* analog).
int llm_dequantize(int ggml_type, const uint8_t* data, int64_t n_elements,
                   float* out) {
    FormatInfo f;
    if (!format_info(ggml_type, &f)) return 1;
    if (n_elements % f.block_size != 0) return 2;
    const int64_t nb = n_elements / f.block_size;

#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nb; b++) {
        int q[QK_K];
        float sc[QK_K / 16];
        float bi[QK_K / 16] = {0};
        f.decode(data + b * f.type_size, q, sc, bi);
        float* o = out + b * f.block_size;
        const int zero = [&] {
            switch (ggml_type) {
                case 2: return 8;    // Q4_0
                case 6: return 16;   // Q5_0
                case 11: return 4;   // Q3_K
                case 14: return 32;  // Q6_K
                default: return 0;
            }
        }();
        for (int e = 0; e < f.block_size; e++) {
            const int g = e / f.gsize;
            o[e] = (q[e] - zero) * sc[g] + (f.has_bias ? bi[g] : 0.0f);
        }
    }
    return 0;
}

int llm_codecs_version() { return 1; }

}  // extern "C"
