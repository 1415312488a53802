// Fixed-width block-packed integer wire transport (host half).
//
// The host<->device transport for bulk PCM / residual tensors. Rice coding
// on the wire proved host-hostile in this environment (single CPU core, and
// spiky real content defeats per-lane escape hatches — a Rice quotient can
// legitimately run to 255, rice.rs:29-69); fixed-width blocks have NO escape
// cases and unpack on the device with pure gather/shift/mask (no sequential
// scan), at ~10-15% more bytes than Rice.
//
// Format, per lane (mode in {0: values, 1: first delta, 2: second delta},
// transform applied with int32 wrap, then zigzag u = (v<<1)^(v>>31)):
//   codes are grouped in blocks of BLK=256; block b stores its 256 codes at
//   widths[lane][b] bits each, LSB-first in little-endian bytes; block size
//   is exactly 32*w bytes (BLK/8 * w), so blocks are byte-aligned with zero
//   padding. Codes past nvalid are zero. widths/modes/lane offsets travel as
//   separate (tiny) arrays.
//
// All functions are single-pass per lane; OpenMP if available (this image
// runs them on one core — keep the inner loops tight).

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr int64_t BLK = 256;

inline uint32_t zigzag32(int32_t v) {
    return (static_cast<uint32_t>(v) << 1) ^ static_cast<uint32_t>(v >> 31);
}

inline int width_of(uint32_t maxu) {
    return maxu == 0 ? 0 : 32 - __builtin_clz(maxu);
}

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
        int64_t bytes[3] = {0, 0, 0};
        uint8_t* wl = widths + l * nblk;
        // Per-block widths for each candidate transform, streamed.
        uint8_t* w0s = new uint8_t[3 * nblk];
        uint32_t prev = 0, prevd = 0;
        for (int64_t b = 0; b < nblk; ++b) {
            uint32_t m0 = 0, m1 = 0, m2 = 0;
            const int64_t j0 = b * BLK;
            const int64_t j1 = j0 + BLK < n ? j0 + BLK : n;
            for (int64_t j = j0; j < j1; ++j) {
                const uint32_t v = static_cast<uint32_t>(r[j]);
                const uint32_t d1 = v - prev;
                const uint32_t d2 = d1 - prevd;
                prev = v;
                prevd = d1;
                uint32_t z;
                z = zigzag32(static_cast<int32_t>(v));  if (z > m0) m0 = z;
                z = zigzag32(static_cast<int32_t>(d1)); if (z > m1) m1 = z;
                z = zigzag32(static_cast<int32_t>(d2)); if (z > m2) m2 = z;
            }
            const int w0 = width_of(m0), w1 = width_of(m1), w2 = width_of(m2);
            w0s[b] = static_cast<uint8_t>(w0);
            w0s[nblk + b] = static_cast<uint8_t>(w1);
            w0s[2 * nblk + b] = static_cast<uint8_t>(w2);
            bytes[0] += 32 * w0;
            bytes[1] += 32 * w1;
            bytes[2] += 32 * w2;
        }
        int mode = 0;
        if (bytes[1] < bytes[mode]) mode = 1;
        if (bytes[2] < bytes[mode]) mode = 2;
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
        uint64_t acc = 0;
        int nbits = 0;
        uint32_t prev = 0, prevd = 0;
        for (int64_t b = 0; b < nblk; ++b) {
            const int w = wl[b];
            const int64_t j0 = b * BLK;
            const int64_t j1 = j0 + BLK < n ? j0 + BLK : n;
            for (int64_t j = j0; j < j0 + BLK; ++j) {
                uint32_t z = 0;
                if (j < j1) {
                    const uint32_t v = static_cast<uint32_t>(r[j]);
                    const uint32_t d1 = v - prev;
                    const uint32_t d2 = d1 - prevd;
                    prev = v;
                    prevd = d1;
                    const uint32_t t = mode == 0 ? v : (mode == 1 ? d1 : d2);
                    z = zigzag32(static_cast<int32_t>(t));
                }
                if (w) {
                    acc |= static_cast<uint64_t>(z) << nbits;  // LSB-first
                    nbits += w;
                    while (nbits >= 8) {
                        *dst++ = static_cast<uint8_t>(acc);
                        acc >>= 8;
                        nbits -= 8;
                    }
                }
            }
            // 256 codes * w bits is a whole number of bytes: nbits == 0 here.
        }
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
        uint64_t acc = 0;
        int nbits = 0;
        uint32_t c1 = 0, c2 = 0;
        for (int64_t b = 0; b < nblk && b * BLK < n; ++b) {
            const int w = wl[b];
            const uint32_t mask =
                w >= 32 ? 0xFFFFFFFFu : ((1u << w) - 1u);
            const int64_t j0 = b * BLK;
            for (int64_t j = j0; j < j0 + BLK; ++j) {
                uint32_t z = 0;
                if (w) {
                    while (nbits < w) {
                        acc |= static_cast<uint64_t>(*src++) << nbits;
                        nbits += 8;
                    }
                    z = static_cast<uint32_t>(acc) & mask;
                    acc >>= w;
                    nbits -= w;
                }
                const uint32_t v =
                    (z >> 1) ^ static_cast<uint32_t>(-static_cast<int32_t>(z & 1u));
                c1 += v;        // mode 1: value = cumsum(delta)
                c2 += c1;       // mode 2: value = cumsum(cumsum(delta2))
                if (j < n)
                    dst[j] = static_cast<int32_t>(
                        mode == 0 ? v : (mode == 1 ? c1 : c2));
            }
        }
        if (n < out_stride)
            std::memset(dst + n, 0, (out_stride - n) * sizeof(int32_t));
    }
}

// MSB-first variant: the device-side block-spread packer
// (ops/blockspread.pack_fixed_stage1) emits big-endian bit order with
// word-aligned lane offsets; same mode/width/zigzag semantics as above.
void blockpack_unpack_msb(const uint8_t* buf, const int64_t* lane_off,
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
        uint64_t acc = 0;  // bits accumulate at the high end, MSB-first
        int nbits = 0;
        uint32_t c1 = 0, c2 = 0;
        for (int64_t b = 0; b < nblk && b * BLK < n; ++b) {
            const int w = wl[b];
            const uint32_t mask = w >= 32 ? 0xFFFFFFFFu : ((1u << w) - 1u);
            const int64_t j0 = b * BLK;
            for (int64_t j = j0; j < j0 + BLK; ++j) {
                uint32_t z = 0;
                if (w) {
                    while (nbits < w) {
                        acc |= static_cast<uint64_t>(*src++) << (56 - nbits);
                        nbits += 8;
                    }
                    z = static_cast<uint32_t>(acc >> (64 - w)) & mask;
                    acc <<= w;
                    nbits -= w;
                }
                const uint32_t v =
                    (z >> 1) ^ static_cast<uint32_t>(-static_cast<int32_t>(z & 1u));
                c1 += v;
                c2 += c1;
                if (j < n)
                    dst[j] = static_cast<int32_t>(
                        mode == 0 ? v : (mode == 1 ? c1 : c2));
            }
        }
        if (n < out_stride)
            std::memset(dst + n, 0, (out_stride - n) * sizeof(int32_t));
    }
}

// Fused decode finalizer: blockpack_unpack_msb + i32->f32 scale +
// channel interleave in ONE pass over the payload. Lane l's sample j lands
// at out[out_base[l] + j*out_step] (out_step = channel count, out_base
// encodes file/frame/channel position); out_base[l] < 0 skips the lane
// entirely (pre-roll frames, mesh-padding files) — its bytes are never
// parsed. Replaces the host chain concatenate -> per-frame transposed
// slices -> astype(f32) -> multiply (~4 strided passes over the full PCM
// on this single-core host).
void blockpack_unpack_msb_f32(const uint8_t* buf, const int64_t* lane_off,
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
        uint64_t acc = 0;
        int nbits = 0;
        uint32_t c1 = 0, c2 = 0;
        for (int64_t b = 0; b < nblk && b * BLK < n; ++b) {
            const int w = wl[b];
            const uint32_t mask = w >= 32 ? 0xFFFFFFFFu : ((1u << w) - 1u);
            const int64_t j0 = b * BLK;
            for (int64_t j = j0; j < j0 + BLK; ++j) {
                uint32_t z = 0;
                if (w) {
                    while (nbits < w) {
                        acc |= static_cast<uint64_t>(*src++) << (56 - nbits);
                        nbits += 8;
                    }
                    z = static_cast<uint32_t>(acc >> (64 - w)) & mask;
                    acc <<= w;
                    nbits -= w;
                }
                const uint32_t v =
                    (z >> 1) ^ static_cast<uint32_t>(-static_cast<int32_t>(z & 1u));
                c1 += v;
                c2 += c1;
                if (j < n)
                    dst[j * out_step] =
                        static_cast<float>(static_cast<int32_t>(
                            mode == 0 ? v : (mode == 1 ? c1 : c2))) * scale;
            }
        }
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
