// Fixed-width block-packed integer wire transport (host half).
//
// The host<->device transport for bulk PCM / residual tensors. Rice coding
// on the wire proved host-hostile in this environment (single CPU core, and
// spiky real content defeats per-lane escape hatches — a Rice quotient can
// legitimately run to 255, rice.rs:29-69); fixed-width blocks have NO escape
// cases and unpack on the device with pure gather/shift/mask (no sequential
// scan), at ~10-15% more bytes than Rice.
//
// Format, per lane (mode in {0: values, 1..4: k-th difference — the full
// fixed-predictor family, matching the codec's fixed orders; measured on
// the reference corpus's tonal content orders 3/4 cut the PCM wire from
// ~7.0 to ~4.6 bits/sample, and noise still picks mode 0},
// transform applied with int32 wrap, then zigzag u = (v<<1)^(v>>31)):
//   codes are grouped in blocks of BLK=256; block b stores its 256 codes at
//   widths[lane][b] bits each as w BIT-PLANES: plane p (0..w-1) is 8
//   little-endian u32 words, and bit i of plane word q is bit p of zigzag
//   code 32q+i. Block size is exactly 32*w bytes (same as sequential
//   packing), but the DEVICE unpacks planes with pure slice/shift/add
//   arithmetic — no per-code indexed ops (see ops/blockpack.unpack_rows).
//   Codes past nvalid are zero. widths/modes/lane offsets travel as
//   separate (tiny) arrays.
//
// All functions are single-pass per lane; OpenMP if available (this image
// runs them on one core — keep the inner loops tight).

#include <cmath>
#include <cstdint>
#include <cstring>

// AVX-512 fast paths (this image's single Xeon core has F/DQ/BW/VL): the
// 32x32 bit transpose becomes one vpmovd2m (pack) / vpmovm2d-style masked
// OR (unpack) per plane per 16 codes, and the difference transforms use
// direct k-th-difference formulas (d_k[j] = sum binom terms of r[j-i],
// zero-extended) instead of the scalar loop-carried chain, so the whole
// transform+zigzag vectorizes. The scalar bodies below stay as the
// fallback for hosts without AVX-512 (the numpy fallback in
// ops/blockpack.py remains the cross-check reference either way).
#if defined(__AVX512F__) && defined(__AVX512DQ__) && defined(__AVX512BW__)
#include <immintrin.h>
#define FLO_BP_AVX512 1
#endif

namespace {

constexpr int64_t BLK = 256;

inline uint32_t zigzag32(int32_t v) {
    return (static_cast<uint32_t>(v) << 1) ^ static_cast<uint32_t>(v >> 31);
}

inline int width_of(uint32_t maxu) {
    return maxu == 0 ? 0 : 32 - __builtin_clz(maxu);
}

// 32x32 bit-matrix transpose (Hacker's Delight fig. 7-3, public-domain
// algorithm). Orientation as implemented: bit p of input row i lands at
// output row 31-p, bit 31-i. Callers load rows reversed so that
// out[31-p] bit i == bit p of code i.
inline void transpose32(uint32_t A[32]) {
    uint32_t m = 0x0000FFFFu, t;
    for (int j = 16; j != 0; j >>= 1, m ^= (m << j)) {
        for (int k = 0; k < 32; k = (k + j + 1) & ~j) {
            t = (A[k] ^ (A[k + j] >> j)) & m;
            A[k] ^= t;
            A[k + j] ^= (t << j);
        }
    }
}

inline void store_le32(uint8_t* dst, uint32_t v) {
    dst[0] = static_cast<uint8_t>(v);
    dst[1] = static_cast<uint8_t>(v >> 8);
    dst[2] = static_cast<uint8_t>(v >> 16);
    dst[3] = static_cast<uint8_t>(v >> 24);
}

inline uint32_t load_le32(const uint8_t* src) {
    return static_cast<uint32_t>(src[0]) | (static_cast<uint32_t>(src[1]) << 8)
         | (static_cast<uint32_t>(src[2]) << 16)
         | (static_cast<uint32_t>(src[3]) << 24);
}

#ifdef FLO_BP_AVX512

inline __m512i zzv(__m512i v) {  // zigzag: (v << 1) ^ (v >> 31)
    return _mm512_xor_si512(_mm512_slli_epi32(v, 1), _mm512_srai_epi32(v, 31));
}

inline __m512i unzzv(__m512i z) {  // inverse: (z >> 1) ^ -(z & 1)
    const __m512i s = _mm512_sub_epi32(
        _mm512_setzero_si512(), _mm512_and_si512(z, _mm512_set1_epi32(1)));
    return _mm512_xor_si512(_mm512_srli_epi32(z, 1), s);
}

// In-register Hillis–Steele inclusive prefix sum over 16 i32 lanes.
inline __m512i prefix16(__m512i v) {
    const __m512i zero = _mm512_setzero_si512();
    v = _mm512_add_epi32(v, _mm512_alignr_epi32(v, zero, 15));
    v = _mm512_add_epi32(v, _mm512_alignr_epi32(v, zero, 14));
    v = _mm512_add_epi32(v, _mm512_alignr_epi32(v, zero, 12));
    v = _mm512_add_epi32(v, _mm512_alignr_epi32(v, zero, 8));
    return v;
}

inline __m512i bcast15(__m512i v) {  // broadcast lane 15 to all lanes
    return _mm512_permutexvar_epi32(_mm512_set1_epi32(15), v);
}

// Per-block zigzag-code OR-maxes for all 5 candidate transforms (the OR of
// a set has the same bit width as its max), written to m[5]. Lanes j < k of
// the first vector load r[j-k] with a shifted mask — the maskz zeroing IS
// the k-th difference's zero-extension at the lane start, and the masked
// lanes never touch r[-k] (AVX-512 masked loads suppress their faults).
inline void analyze_lane_avx(const int32_t* r, int64_t n, int64_t nblk,
                             uint8_t* w5 /* [5][nblk] scratch */,
                             int64_t bytes[5]) {
    for (int64_t b = 0; b < nblk; ++b) {
        const int64_t j0 = b * BLK;
        const int64_t j1 = j0 + BLK < n ? j0 + BLK : n;
        uint32_t m[5] = {0, 0, 0, 0, 0};
        __m512i a0 = _mm512_setzero_si512(), a1 = a0, a2 = a0, a3 = a0,
                a4 = a0;
        for (int64_t j = j0; j < j1; j += 16) {
            const int64_t rem = j1 - j;
            const __mmask16 mk = rem >= 16
                ? static_cast<__mmask16>(0xFFFF)
                : static_cast<__mmask16>((1u << rem) - 1);
            const bool head = (j == 0);
            const __m512i v  = _mm512_maskz_loadu_epi32(mk, r + j);
            const __m512i v1 = _mm512_maskz_loadu_epi32(
                head ? (mk & static_cast<__mmask16>(0xFFFE)) : mk, r + j - 1);
            const __m512i v2 = _mm512_maskz_loadu_epi32(
                head ? (mk & static_cast<__mmask16>(0xFFFC)) : mk, r + j - 2);
            const __m512i v3 = _mm512_maskz_loadu_epi32(
                head ? (mk & static_cast<__mmask16>(0xFFF8)) : mk, r + j - 3);
            const __m512i v4 = _mm512_maskz_loadu_epi32(
                head ? (mk & static_cast<__mmask16>(0xFFF0)) : mk, r + j - 4);
            const __m512i e0 = _mm512_sub_epi32(v, v1);
            const __m512i e1 = _mm512_sub_epi32(v1, v2);
            const __m512i e2 = _mm512_sub_epi32(v2, v3);
            const __m512i e3 = _mm512_sub_epi32(v3, v4);
            const __m512i f0 = _mm512_sub_epi32(e0, e1);
            const __m512i f1 = _mm512_sub_epi32(e1, e2);
            const __m512i f2 = _mm512_sub_epi32(e2, e3);
            const __m512i g0 = _mm512_sub_epi32(f0, f1);
            const __m512i g1 = _mm512_sub_epi32(f1, f2);
            a0 = _mm512_or_si512(a0, zzv(v));
            a1 = _mm512_or_si512(a1, zzv(e0));
            a2 = _mm512_or_si512(a2, zzv(f0));
            a3 = _mm512_or_si512(a3, zzv(g0));
            a4 = _mm512_or_si512(a4, zzv(_mm512_sub_epi32(g0, g1)));
        }
        m[0] |= static_cast<uint32_t>(_mm512_reduce_or_epi32(a0));
        m[1] |= static_cast<uint32_t>(_mm512_reduce_or_epi32(a1));
        m[2] |= static_cast<uint32_t>(_mm512_reduce_or_epi32(a2));
        m[3] |= static_cast<uint32_t>(_mm512_reduce_or_epi32(a3));
        m[4] |= static_cast<uint32_t>(_mm512_reduce_or_epi32(a4));
        for (int c = 0; c < 5; ++c) {
            const int w = width_of(m[c]);
            w5[c * nblk + b] = static_cast<uint8_t>(w);
            bytes[c] += 32 * w;
        }
    }
}

// Pack one lane: build the chosen mode's zigzag codes per block, then emit
// bit-planes with vpmovd2m (sign bit of codes << (31-p) == plane p).
inline void pack_lane_avx(const int32_t* r, int64_t n, int64_t nblk, int mode,
                          const uint8_t* wl, uint8_t* dst) {
    alignas(64) uint32_t z[BLK];
    for (int64_t b = 0; b < nblk; ++b) {
        const int w = wl[b];
        if (!w) continue;  // all-zero block (or fully past nvalid)
        const int64_t j0 = b * BLK;
        int64_t j1 = j0 + BLK < n ? j0 + BLK : n;
        if (j1 < j0) j1 = j0;
        for (int64_t j = j0; j < j0 + BLK; j += 16) {
            const int64_t rem = j1 - j;
            const __mmask16 mk = rem <= 0
                ? static_cast<__mmask16>(0)
                : (rem >= 16 ? static_cast<__mmask16>(0xFFFF)
                             : static_cast<__mmask16>((1u << rem) - 1));
            const bool head = (j == 0);
            const __m512i v = _mm512_maskz_loadu_epi32(mk, r + j);
            __m512i t = v;
            if (mode >= 1) {
                const __m512i v1 = _mm512_maskz_loadu_epi32(
                    head ? (mk & static_cast<__mmask16>(0xFFFE)) : mk,
                    r + j - 1);
                const __m512i e0 = _mm512_sub_epi32(v, v1);
                t = e0;
                if (mode >= 2) {
                    const __m512i v2 = _mm512_maskz_loadu_epi32(
                        head ? (mk & static_cast<__mmask16>(0xFFFC)) : mk,
                        r + j - 2);
                    const __m512i e1 = _mm512_sub_epi32(v1, v2);
                    const __m512i f0 = _mm512_sub_epi32(e0, e1);
                    t = f0;
                    if (mode >= 3) {
                        const __m512i v3 = _mm512_maskz_loadu_epi32(
                            head ? (mk & static_cast<__mmask16>(0xFFF8)) : mk,
                            r + j - 3);
                        const __m512i e2 = _mm512_sub_epi32(v2, v3);
                        const __m512i f1 = _mm512_sub_epi32(e1, e2);
                        const __m512i g0 = _mm512_sub_epi32(f0, f1);
                        t = g0;
                        if (mode >= 4) {
                            const __m512i v4 = _mm512_maskz_loadu_epi32(
                                head ? (mk & static_cast<__mmask16>(0xFFF0))
                                     : mk,
                                r + j - 4);
                            const __m512i e3 = _mm512_sub_epi32(v3, v4);
                            const __m512i f2 = _mm512_sub_epi32(e2, e3);
                            const __m512i g1 = _mm512_sub_epi32(f1, f2);
                            t = _mm512_sub_epi32(g0, g1);
                        }
                    }
                }
            }
            _mm512_store_si512(reinterpret_cast<__m512i*>(z + (j - j0)),
                               zzv(t));
        }
        for (int p = 0; p < w; ++p) {
            for (int g = 0; g < 8; ++g) {
                const __m512i lo = _mm512_load_si512(
                    reinterpret_cast<const __m512i*>(z + 32 * g));
                const __m512i hi = _mm512_load_si512(
                    reinterpret_cast<const __m512i*>(z + 32 * g + 16));
                const uint32_t wlo = _cvtmask16_u32(
                    _mm512_movepi32_mask(_mm512_slli_epi32(lo, 31 - p)));
                const uint32_t whi = _cvtmask16_u32(
                    _mm512_movepi32_mask(_mm512_slli_epi32(hi, 31 - p)));
                store_le32(dst, wlo | (whi << 16));
                dst += 4;
            }
        }
    }
}

// Unpack one lane's codes and hand each 16-code vector of decoded i32
// values (mode-fold running sums applied) to Store(j, values, mask).
template <typename Store>
inline void unpack_lane_avx(const uint8_t* src, int64_t n, int64_t nblk,
                            int mode, const uint8_t* wl, Store&& store) {
    if (mode > 4) mode = 4;
    __m512i carry[4] = {_mm512_setzero_si512(), _mm512_setzero_si512(),
                        _mm512_setzero_si512(), _mm512_setzero_si512()};
    for (int64_t b = 0; b < nblk && b * BLK < n; ++b) {
        const int w = wl[b];
        const int64_t j0 = b * BLK;
        for (int g = 0; g < 8; ++g) {
            __m512i zA = _mm512_setzero_si512(), zB = zA;
            for (int p = 0; p < w; ++p) {
                const uint32_t word = load_le32(src + 4 * (8 * p + g));
                const __m512i pb = _mm512_set1_epi32(1 << p);
                zA = _mm512_mask_or_epi32(
                    zA, static_cast<__mmask16>(word & 0xFFFFu), zA, pb);
                zB = _mm512_mask_or_epi32(
                    zB, static_cast<__mmask16>(word >> 16), zB, pb);
            }
            __m512i vA = unzzv(zA), vB = unzzv(zB);
            for (int t = 0; t < mode; ++t) {
                vA = _mm512_add_epi32(prefix16(vA), carry[t]);
                carry[t] = bcast15(vA);
                vB = _mm512_add_epi32(prefix16(vB), carry[t]);
                carry[t] = bcast15(vB);
            }
            const int64_t jA = j0 + 32 * g;
            store(jA, vA,
                  jA + 16 <= n ? static_cast<__mmask16>(0xFFFF)
                  : jA >= n    ? static_cast<__mmask16>(0)
                               : static_cast<__mmask16>((1u << (n - jA)) - 1));
            const int64_t jB = jA + 16;
            store(jB, vB,
                  jB + 16 <= n ? static_cast<__mmask16>(0xFFFF)
                  : jB >= n    ? static_cast<__mmask16>(0)
                               : static_cast<__mmask16>((1u << (n - jB)) - 1));
        }
        src += 32 * w;
    }
}

#endif  // FLO_BP_AVX512

}  // namespace

extern "C" {

// Pass 1: per lane pick the cheapest transform and record per-block widths
// and the lane's packed byte size.
void blockpack_analyze(const int32_t* rows, int64_t L, int64_t stride,
                       const int64_t* nvalid, int64_t nblk,
                       uint8_t* modes, uint8_t* widths, int64_t* lane_bytes) {
#pragma omp parallel for schedule(dynamic, 1)
    for (int64_t l = 0; l < L; ++l) {
        const int32_t* r = rows + l * stride;
        const int64_t n = nvalid[l];
        int64_t bytes[5] = {0, 0, 0, 0, 0};
        uint8_t* wl = widths + l * nblk;
        // Per-block widths for each candidate transform, streamed.
        uint8_t* w0s = new uint8_t[5 * nblk];
#ifdef FLO_BP_AVX512
        analyze_lane_avx(r, n, nblk, w0s, bytes);
#else
        uint32_t p0 = 0, p1 = 0, p2 = 0, p3 = 0;  // prev v, d1, d2, d3
        for (int64_t b = 0; b < nblk; ++b) {
            uint32_t m[5] = {0, 0, 0, 0, 0};
            const int64_t j0 = b * BLK;
            const int64_t j1 = j0 + BLK < n ? j0 + BLK : n;
            for (int64_t j = j0; j < j1; ++j) {
                const uint32_t v = static_cast<uint32_t>(r[j]);
                const uint32_t d1 = v - p0;
                const uint32_t d2 = d1 - p1;
                const uint32_t d3 = d2 - p2;
                const uint32_t d4 = d3 - p3;
                p0 = v; p1 = d1; p2 = d2; p3 = d3;
                uint32_t z;
                z = zigzag32(static_cast<int32_t>(v));  if (z > m[0]) m[0] = z;
                z = zigzag32(static_cast<int32_t>(d1)); if (z > m[1]) m[1] = z;
                z = zigzag32(static_cast<int32_t>(d2)); if (z > m[2]) m[2] = z;
                z = zigzag32(static_cast<int32_t>(d3)); if (z > m[3]) m[3] = z;
                z = zigzag32(static_cast<int32_t>(d4)); if (z > m[4]) m[4] = z;
            }
            for (int c = 0; c < 5; ++c) {
                const int w = width_of(m[c]);
                w0s[c * nblk + b] = static_cast<uint8_t>(w);
                bytes[c] += 32 * w;
            }
        }
#endif  // FLO_BP_AVX512
        int mode = 0;
        for (int c = 1; c < 5; ++c)
            if (bytes[c] < bytes[mode]) mode = c;
        modes[l] = static_cast<uint8_t>(mode);
        lane_bytes[l] = bytes[mode];
        std::memcpy(wl, w0s + mode * nblk, nblk);
        delete[] w0s;
    }
}

// Pass 2: pack each lane at its byte offset.
void blockpack_pack(const int32_t* rows, int64_t L, int64_t stride,
                    const int64_t* nvalid, int64_t nblk,
                    const uint8_t* modes, const uint8_t* widths,
                    const int64_t* lane_off, uint8_t* out) {
#pragma omp parallel for schedule(dynamic, 1)
    for (int64_t l = 0; l < L; ++l) {
        const int32_t* r = rows + l * stride;
        const int64_t n = nvalid[l];
        const int mode = modes[l];
        const uint8_t* wl = widths + l * nblk;
        uint8_t* dst = out + lane_off[l];
#ifdef FLO_BP_AVX512
        pack_lane_avx(r, n, nblk, mode, wl, dst);
        continue;
#else
        uint32_t p0 = 0, p1 = 0, p2 = 0, p3 = 0;  // prev v, d1, d2, d3
        uint32_t z[BLK];
        uint32_t planes[8][32];  // [group][transposed rows]
        for (int64_t b = 0; b < nblk; ++b) {
            const int w = wl[b];
            const int64_t j0 = b * BLK;
            int64_t j1 = j0 + BLK < n ? j0 + BLK : n;
            if (j1 < j0) j1 = j0;  // block fully past nvalid
            for (int64_t j = j0; j < j1; ++j) {
                const uint32_t v = static_cast<uint32_t>(r[j]);
                const uint32_t d1 = v - p0;
                const uint32_t d2 = d1 - p1;
                const uint32_t d3 = d2 - p2;
                const uint32_t d4 = d3 - p3;
                const uint32_t t = mode == 0 ? v
                    : mode == 1 ? d1 : mode == 2 ? d2
                    : mode == 3 ? d3 : d4;
                p0 = v; p1 = d1; p2 = d2; p3 = d3;
                z[j - j0] = zigzag32(static_cast<int32_t>(t));
            }
            for (int64_t j = j1; j < j0 + BLK; ++j) z[j - j0] = 0;
            if (!w) continue;
            for (int g = 0; g < 8; ++g) {
                uint32_t* A = planes[g];
                const uint32_t* zg = z + 32 * g;
                for (int k = 0; k < 32; ++k) A[k] = zg[31 - k];  // reversed
                transpose32(A);  // A[31-p] bit i == bit p of code 32g+i
            }
            // Plane-major emission: plane p = 8 LE words (groups 0..7).
            for (int p = 0; p < w; ++p)
                for (int g = 0; g < 8; ++g, dst += 4)
                    store_le32(dst, planes[g][31 - p]);
        }
#endif  // FLO_BP_AVX512
    }
}

// Inverse of blockpack_pack: decode each lane into out rows (zeros past
// nvalid).
void blockpack_unpack(const uint8_t* buf, const int64_t* lane_off,
                      const uint8_t* modes, const uint8_t* widths,
                      int64_t L, int64_t nblk, const int64_t* nvalid,
                      int64_t out_stride, int32_t* out) {
#pragma omp parallel for schedule(dynamic, 1)
    for (int64_t l = 0; l < L; ++l) {
        const int64_t n = nvalid[l];
        const int mode = modes[l];
        const uint8_t* wl = widths + l * nblk;
        const uint8_t* src = buf + lane_off[l];
        int32_t* dst = out + l * out_stride;
#ifdef FLO_BP_AVX512
        unpack_lane_avx(src, n, nblk, mode, wl,
                        [dst](int64_t j, __m512i v, __mmask16 mk) {
                            _mm512_mask_storeu_epi32(dst + j, mk, v);
                        });
        if (n < out_stride)
            std::memset(dst + n, 0, (out_stride - n) * sizeof(int32_t));
        continue;
#else
        uint32_t c1 = 0, c2 = 0, c3 = 0, c4 = 0;
        uint32_t A[32];
        for (int64_t b = 0; b < nblk && b * BLK < n; ++b) {
            const int w = wl[b];
            const int64_t j0 = b * BLK;
            for (int g = 0; g < 8; ++g) {
                // Rebuild group g: A[31-p] = plane p word g (zeros past w),
                // transpose back (involution), code i = A[31-i].
                for (int p = 0; p < w; ++p)
                    A[31 - p] = load_le32(src + 4 * (8 * p + g));
                for (int p = w; p < 32; ++p) A[31 - p] = 0;
                transpose32(A);
                for (int i = 0; i < 32; ++i) {
                    const uint32_t z = A[31 - i];
                    const uint32_t v = (z >> 1)
                        ^ static_cast<uint32_t>(-static_cast<int32_t>(z & 1u));
                    c1 += v;    // mode m: value = m-fold running sum
                    c2 += c1;
                    c3 += c2;
                    c4 += c3;
                    const int64_t j = j0 + 32 * g + i;
                    if (j < n)
                        dst[j] = static_cast<int32_t>(
                            mode == 0 ? v : mode == 1 ? c1 : mode == 2 ? c2
                            : mode == 3 ? c3 : c4);
                }
            }
            src += 32 * w;
        }
        if (n < out_stride)
            std::memset(dst + n, 0, (out_stride - n) * sizeof(int32_t));
#endif  // FLO_BP_AVX512
    }
}

// Fused decode finalizer for the bit-plane stream: blockpack_unpack +
// i32->f32 scale + channel interleave in ONE pass over the payload. Lane
// l's sample j lands at out[out_base[l] + j*out_step] (out_step = channel
// count, out_base encodes file/frame/channel position); out_base[l] < 0
// skips the lane entirely (pre-roll frames, mesh-padding lanes) — its
// bytes are never parsed.
void blockpack_unpack_f32(const uint8_t* buf, const int64_t* lane_off,
                          const uint8_t* modes, const uint8_t* widths,
                          int64_t L, int64_t nblk, const int64_t* nvalid,
                          const int64_t* out_base, int64_t out_step,
                          float scale, float* out) {
#pragma omp parallel for schedule(dynamic, 1)
    for (int64_t l = 0; l < L; ++l) {
        if (out_base[l] < 0) continue;
        const int64_t n = nvalid[l];
        const int mode = modes[l];
        const uint8_t* wl = widths + l * nblk;
        const uint8_t* src = buf + lane_off[l];
        float* dst = out + out_base[l];
#ifdef FLO_BP_AVX512
        const __m512 sc = _mm512_set1_ps(scale);
        if (out_step == 1) {
            unpack_lane_avx(
                src, n, nblk, mode, wl,
                [dst, sc](int64_t j, __m512i v, __mmask16 mk) {
                    _mm512_mask_storeu_ps(
                        dst + j, mk,
                        _mm512_mul_ps(_mm512_cvtepi32_ps(v), sc));
                });
        } else {
            const __m512i sidx = _mm512_mullo_epi32(
                _mm512_set_epi32(15, 14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3,
                                 2, 1, 0),
                _mm512_set1_epi32(static_cast<int>(out_step)));
            const int64_t step = out_step;
            unpack_lane_avx(
                src, n, nblk, mode, wl,
                [dst, sc, sidx, step](int64_t j, __m512i v, __mmask16 mk) {
                    _mm512_mask_i32scatter_ps(
                        dst + j * step, mk, sidx,
                        _mm512_mul_ps(_mm512_cvtepi32_ps(v), sc), 4);
                });
        }
        continue;
#else
        uint32_t c1 = 0, c2 = 0, c3 = 0, c4 = 0;
        uint32_t A[32];
        for (int64_t b = 0; b < nblk && b * BLK < n; ++b) {
            const int w = wl[b];
            const int64_t j0 = b * BLK;
            for (int g = 0; g < 8; ++g) {
                for (int p = 0; p < w; ++p)
                    A[31 - p] = load_le32(src + 4 * (8 * p + g));
                for (int p = w; p < 32; ++p) A[31 - p] = 0;
                transpose32(A);
                for (int i = 0; i < 32; ++i) {
                    const uint32_t z = A[31 - i];
                    const uint32_t v = (z >> 1)
                        ^ static_cast<uint32_t>(-static_cast<int32_t>(z & 1u));
                    c1 += v;
                    c2 += c1;
                    c3 += c2;
                    c4 += c3;
                    const int64_t j = j0 + 32 * g + i;
                    if (j < n)
                        dst[j * out_step] =
                            static_cast<float>(static_cast<int32_t>(
                                mode == 0 ? v : mode == 1 ? c1 : mode == 2 ? c2
                                : mode == 3 ? c3 : c4)) * scale;
                }
            }
            src += 32 * w;
        }
#endif  // FLO_BP_AVX512
    }
}

// Single-file decode finalizer: mid/side undo + channel interleave +
// i32->f32 scale in one pass over reconstructed rows [F*C, S] (frame-major,
// channel rows contiguous). Frame f contributes frame_lengths[f] samples;
// outputs concatenate. Mid/side (C==2 only, decoder.rs:75-89) uses Rust's
// truncating `/ 2` — C++ integer division truncates toward zero, in i64 to
// survive the i32+i32 sum.
void midside_interleave_f32(const int32_t* rows, int64_t F, int64_t C,
                            int64_t S, const uint8_t* mid_side,
                            const int64_t* frame_lengths, float scale,
                            float* out) {
    int64_t base = 0;
    for (int64_t f = 0; f < F; ++f) {
        const int64_t n = frame_lengths[f];
        const int32_t* r0 = rows + f * C * S;
        if (C == 2 && mid_side[f]) {
            const int32_t* rm = r0;
            const int32_t* rs = r0 + S;
            for (int64_t j = 0; j < n; ++j) {
                const int64_t m = rm[j], s = rs[j];
                out[base + 2 * j] = static_cast<float>(
                    static_cast<int32_t>((m + s) / 2)) * scale;
                out[base + 2 * j + 1] = static_cast<float>(
                    static_cast<int32_t>((m - s) / 2)) * scale;
            }
        } else {
            for (int64_t c = 0; c < C; ++c) {
                const int32_t* rc = r0 + c * S;
                for (int64_t j = 0; j < n; ++j)
                    out[base + j * C + c] = static_cast<float>(rc[j]) * scale;
            }
        }
        base += n * C;
    }
}

// Bulk-encode marshal: interleaved f32 -> compacted lane-major i32 frames
// in ONE pass, with silence detection folded in. Frame fi covers samples
// [fi*spf, min((fi+1)*spf, total)) of `flat` ([total, C] interleaved);
// a frame whose every |sample| < thresh is silent (strict <, matching
// numpy's np.abs(x) < t) and is skipped. Non-silent frames are written
// compactly: the s-th active frame's channel c becomes lanes row s*C + c
// ([spf] samples, zero-padded past the frame tail), and active_idx[s]
// records fi. Conversion is the format's f32_to_i32 contract
// (core/convert.py / audio_constants.rs): y = x * 32767.0f clamped to
// [-32768, 32767] in f32, then truncated toward zero (C cast semantics ==
// Rust `as i32` for in-range values). Returns the active frame count.
// Replaces astype+pad, |x| silence pass, f32->i32 (3 temporaries),
// np.stack, and the lane moveaxis copy (~6 host passes over the full PCM).
int64_t encode_marshal_f32(const float* flat, int64_t total, int64_t C,
                           int64_t spf, int64_t F, float thresh, float scale,
                           uint8_t* silent, int64_t* active_idx,
                           int32_t* lanes) {
    int64_t s = 0;
    for (int64_t fi = 0; fi < F; ++fi) {
        const int64_t j0 = fi * spf;
        const int64_t n = (j0 + spf < total ? spf : total - j0);
        const float* src = flat + j0 * C;
        bool is_silent = true;
        for (int64_t t = 0; t < n * C && is_silent; ++t)
            is_silent = (src[t] < thresh) & (src[t] > -thresh);
        silent[fi] = is_silent;
        if (is_silent) continue;
        active_idx[s] = fi;
        int32_t* dst0 = lanes + s * C * spf;
        for (int64_t c = 0; c < C; ++c) {
            int32_t* dst = dst0 + c * spf;
            for (int64_t j = 0; j < n; ++j) {
                float y = src[j * C + c] * scale;
                y = y > 32767.0f ? 32767.0f : (y < -32768.0f ? -32768.0f : y);
                dst[j] = static_cast<int32_t>(y);
            }
            if (n < spf)
                std::memset(dst + n, 0, (spf - n) * sizeof(int32_t));
        }
        ++s;
    }
    return s;
}

// Lossy-encode marshal: one file's interleaved f32 -> pre-rolled i32
// channel rows in ONE pass. Sample j of channel c lands at
// rows[c*stride + hop + j] as clamp(rintf(x*scale)) (rintf == np.rint:
// round-half-to-even under the default FP environment); rows must be
// pre-zeroed (np.zeros' calloc pages are free until touched). Replaces
// the per-file deinterleave copy + batch rint/clip/astype (~4 host passes).
void lossy_marshal_f32(const float* flat, int64_t n, int64_t C, int64_t hop,
                       int64_t stride, float scale, int32_t* rows) {
    for (int64_t c = 0; c < C; ++c) {
        int32_t* dst = rows + c * stride + hop;
        for (int64_t j = 0; j < n; ++j) {
            float y = rintf(flat[j * C + c] * scale);
            y = y > 32767.0f ? 32767.0f : (y < -32768.0f ? -32768.0f : y);
            dst[j] = static_cast<int32_t>(y);
        }
    }
}

}  // extern "C"
