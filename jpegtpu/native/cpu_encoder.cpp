// Native CPU reference encoder — the analog of the reference's sequential
// C++ pipeline (JpegEncoderHost, src/OpenCLProject_JpegEncoder.cpp:28-250):
// CSC, subsampling, mirror padding, 8x8 DCT, quantization, zigzag, RLE,
// Huffman and bitstream packing, all scalar C++. It serves as
//   * the framework's CPU oracle/birthplace-parity tier (the reference used
//     its CPU path as the de-facto oracle for the GPU path, SURVEY §4.5);
//   * the denominator of the CPU-vs-TPU per-stage speedup table
//     (jpegtpu.bench.stages), mirroring the reference's printout.
//
// All constant tables (quant, Huffman codes, zigzag) are PASSED IN from
// Python so the two tiers can never disagree on parameters. Output is the
// complete stuffed entropy scan including RST markers; Python wraps the
// JFIF headers.

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BitWriter {
    std::vector<uint8_t>& out;
    uint32_t acc = 0;
    int nbits = 0;

    explicit BitWriter(std::vector<uint8_t>& o) : out(o) {}

    void put(uint32_t code, int len) {
        // MSB-first append; stuff 0x00 after emitted 0xFF (T.81 F.1.2.3).
        acc = (acc << len) | (code & ((len == 32 ? 0xFFFFFFFFu
                                                 : (1u << len) - 1)));
        nbits += len;
        while (nbits >= 8) {
            uint8_t b = (uint8_t)(acc >> (nbits - 8));
            out.push_back(b);
            if (b == 0xFF) out.push_back(0x00);
            nbits -= 8;
        }
    }

    void pad_to_byte() {
        if (nbits > 0) put((1u << (8 - nbits)) - 1, 8 - nbits);
    }
};

inline int size_category(int v) {
    int a = v < 0 ? -v : v, s = 0;
    while (a) { ++s; a >>= 1; }
    return s;
}

// Forward 8x8 DCT-II (orthonormal): the textbook formulation the
// reference loops through (src/utils.cpp:314-348), minus its in-place
// aliasing bug.
void dct8x8(const double* block, double* coef) {
    static double ctab[8][8];
    static bool init = false;
    if (!init) {
        for (int u = 0; u < 8; ++u)
            for (int x = 0; x < 8; ++x)
                ctab[u][x] = 0.5 * (u == 0 ? 1.0 / std::sqrt(2.0) : 1.0) *
                             std::cos((2 * x + 1) * u * M_PI / 16.0);
        init = true;
    }
    double tmp[8][8];
    for (int u = 0; u < 8; ++u)
        for (int x = 0; x < 8; ++x) {
            double s = 0;
            for (int y = 0; y < 8; ++y) s += ctab[u][y] * block[y * 8 + x];
            tmp[u][x] = s;
        }
    for (int u = 0; u < 8; ++u)
        for (int v = 0; v < 8; ++v) {
            double s = 0;
            for (int x = 0; x < 8; ++x) s += tmp[u][x] * ctab[v][x];
            coef[u * 8 + v] = s;
        }
}

// Quantize + zigzag with std::round semantics (matches core/ops.py).
void quant_zigzag(const double* coef, const uint16_t* qtab_zz,
                  const int32_t* zigzag, int32_t* out_zz) {
    for (int z = 0; z < 64; ++z) {
        double q = coef[zigzag[z]] / (double)qtab_zz[z];
        out_zz[z] = (int32_t)(q < 0 ? -std::floor(-q + 0.5)
                                    : std::floor(q + 0.5));
    }
}

void dct_quant_zigzag(const double* block, const uint16_t* qtab_zz,
                      const int32_t* zigzag, int32_t* out_zz) {
    double coef[64];
    dct8x8(block, coef);
    quant_zigzag(coef, qtab_zz, zigzag, out_zz);
}

struct HuffTables {
    const uint32_t* dc_codes;  // [2][16]
    const int32_t* dc_lens;
    const uint32_t* ac_codes;  // [2][256]
    const int32_t* ac_lens;
};

void encode_block(BitWriter& bw, const int32_t* zz, int cls, int& pred,
                  const HuffTables& h) {
    int diff = zz[0] - pred;
    pred = zz[0];
    int s = size_category(diff);
    bw.put(h.dc_codes[cls * 16 + s], h.dc_lens[cls * 16 + s]);
    if (s) {
        int m = diff < 0 ? diff + (1 << s) - 1 : diff;
        bw.put((uint32_t)m & ((1u << s) - 1), s);
    }
    int last = 0;
    for (int k = 63; k >= 1; --k)
        if (zz[k] != 0) { last = k; break; }
    int run = 0;
    for (int k = 1; k <= last; ++k) {
        if (zz[k] == 0) { ++run; continue; }
        while (run > 15) {
            bw.put(h.ac_codes[cls * 256 + 0xF0], h.ac_lens[cls * 256 + 0xF0]);
            run -= 16;
        }
        int sz = size_category(zz[k]);
        int sym = (run << 4) | sz;
        bw.put(h.ac_codes[cls * 256 + sym], h.ac_lens[cls * 256 + sym]);
        int m = zz[k] < 0 ? zz[k] + (1 << sz) - 1 : zz[k];
        bw.put((uint32_t)m & ((1u << sz) - 1), sz);
        run = 0;
    }
    if (last < 63)
        bw.put(h.ac_codes[cls * 256 + 0x00], h.ac_lens[cls * 256 + 0x00]);
}

// Mirror-padded plane fetch (symmetric reflection, matching
// jpegtpu.core.ops.pad_to_multiple / addReversedPadding semantics).
inline int reflect(int i, int n) {
    if (i < n) return i;
    int r = 2 * n - 1 - i;
    return r < 0 ? 0 : r;
}

}  // namespace

extern "C" {

// rgb: [h, w, 3] u8 interleaved (or [h, w] if mode==3/gray).
// mode: 0 = 4:4:4, 1 = 4:2:2, 2 = 4:2:0, 3 = gray.
// qtab_zz: [2][64] zigzag-order quant tables (luma, chroma).
// zigzag: [64] zigzag->row-major index map.
// restart: interval in MCUs (0 = none).
// out: caller buffer; returns scan byte count or -1 on overflow.
long long cpu_encode_scan(const uint8_t* rgb, int h, int w, int mode,
                          const uint16_t* qtab_zz, const int32_t* zigzag,
                          const uint32_t* dc_codes, const int32_t* dc_lens,
                          const uint32_t* ac_codes, const int32_t* ac_lens,
                          int restart, uint8_t* out, long long out_cap) {
    const int mh = (mode == 2) ? 16 : 8;
    const int mw = (mode == 0 || mode == 3) ? 8 : 16;
    const int my = (h + mh - 1) / mh, mx = (w + mw - 1) / mw;
    HuffTables ht{dc_codes, dc_lens, ac_codes, ac_lens};

    std::vector<uint8_t> scan;
    scan.reserve((size_t)my * mx * 64);
    BitWriter bw(scan);

    int pred[3] = {0, 0, 0};
    int seg = 0, mcu_in_seg = 0;

    // Per-MCU working buffers.
    double ycc[3][16 * 16];
    double cplane[2][8 * 8];
    double blk[64];
    int32_t zz[64];

    for (int myi = 0; myi < my; ++myi) {
        for (int mxi = 0; mxi < mx; ++mxi) {
            // Gather + CSC for this MCU (mirror padding at edges).
            for (int y = 0; y < mh; ++y) {
                int sy = reflect(myi * mh + y, h);
                for (int x = 0; x < mw; ++x) {
                    int sx = reflect(mxi * mw + x, w);
                    int i = y * mw + x;
                    if (mode == 3) {
                        ycc[0][i] = (double)rgb[sy * w + sx];
                    } else {
                        const uint8_t* p = rgb + ((size_t)sy * w + sx) * 3;
                        double r = p[0], g = p[1], b = p[2];
                        ycc[0][i] = 0.299 * r + 0.587 * g + 0.114 * b;
                        ycc[1][i] = 128.0 - 0.168736 * r - 0.331264 * g +
                                    0.5 * b;
                        ycc[2][i] = 128.0 + 0.5 * r - 0.418688 * g -
                                    0.081312 * b;
                    }
                }
            }
            // Luma blocks in raster order within the MCU.
            const int lby = mh / 8, lbx = mw / 8;
            for (int by = 0; by < lby; ++by)
                for (int bx = 0; bx < lbx; ++bx) {
                    for (int y = 0; y < 8; ++y)
                        for (int x = 0; x < 8; ++x)
                            blk[y * 8 + x] =
                                ycc[0][(by * 8 + y) * mw + bx * 8 + x] -
                                128.0;
                    dct_quant_zigzag(blk, qtab_zz, zigzag, zz);
                    encode_block(bw, zz, 0, pred[0], ht);
                }
            if (mode != 3) {
                // Chroma: subsample into one 8x8 block per component.
                for (int c = 0; c < 2; ++c) {
                    for (int y = 0; y < 8; ++y)
                        for (int x = 0; x < 8; ++x) {
                            double v;
                            if (mode == 2) {        // 420: 2x2 mean
                                v = (ycc[c + 1][(2 * y) * mw + 2 * x] +
                                     ycc[c + 1][(2 * y) * mw + 2 * x + 1] +
                                     ycc[c + 1][(2 * y + 1) * mw + 2 * x] +
                                     ycc[c + 1][(2 * y + 1) * mw + 2 * x + 1]
                                     ) * 0.25;
                            } else if (mode == 1) { // 422: 2x1 mean
                                v = (ycc[c + 1][y * mw + 2 * x] +
                                     ycc[c + 1][y * mw + 2 * x + 1]) * 0.5;
                            } else {                // 444
                                v = ycc[c + 1][y * mw + x];
                            }
                            cplane[c][y * 8 + x] = v - 128.0;
                        }
                    dct_quant_zigzag(cplane[c], qtab_zz + 64, zigzag, zz);
                    encode_block(bw, zz, 1, pred[c + 1], ht);
                }
            }
            // Restart marker handling.
            if (restart > 0 && ++mcu_in_seg == restart &&
                !(myi == my - 1 && mxi == mx - 1)) {
                bw.pad_to_byte();
                scan.push_back(0xFF);
                scan.push_back((uint8_t)(0xD0 + (seg & 7)));
                ++seg;
                mcu_in_seg = 0;
                pred[0] = pred[1] = pred[2] = 0;
            }
        }
    }
    bw.pad_to_byte();

    if ((long long)scan.size() > out_cap) return -1;
    std::memcpy(out, scan.data(), scan.size());
    return (long long)scan.size();
}

// Stage-timed variant of cpu_encode_scan: the same pipeline restructured
// as whole-image stage passes (the reference's CPU structure — it times
// each full-image stage separately, src/OpenCLProject_JpegEncoder.cpp:
// 62-247) so each stage gets a clean wall-clock bracket. Output is
// byte-identical to cpu_encode_scan (asserted in tests).
// stage_secs: [6] doubles — pad, csc, subsample, dct, quant+zigzag,
// entropy (RLE+Huffman+stuffing+restart markers).
long long cpu_encode_scan_staged(
        const uint8_t* rgb, int h, int w, int mode,
        const uint16_t* qtab_zz, const int32_t* zigzag,
        const uint32_t* dc_codes, const int32_t* dc_lens,
        const uint32_t* ac_codes, const int32_t* ac_lens,
        int restart, uint8_t* out, long long out_cap, double* stage_secs) {
    using clk = std::chrono::steady_clock;
    auto secs = [](clk::time_point a, clk::time_point b) {
        return std::chrono::duration<double>(b - a).count();
    };
    const int mh = (mode == 2) ? 16 : 8;
    const int mw = (mode == 0 || mode == 3) ? 8 : 16;
    const int my = (h + mh - 1) / mh, mx = (w + mw - 1) / mw;
    const int ph = my * mh, pw = mx * mw;
    const int nc = (mode == 3) ? 1 : 3;

    // Stage 1: mirror padding to MCU multiples (the reference's copy/
    // padding stage, addReversedPadding).
    auto t0 = clk::now();
    std::vector<uint8_t> prgb((size_t)ph * pw * nc);
    for (int y = 0; y < ph; ++y) {
        int sy = reflect(y, h);
        for (int x = 0; x < pw; ++x) {
            int sx = reflect(x, w);
            for (int c = 0; c < nc; ++c)
                prgb[((size_t)y * pw + x) * nc + c] =
                    rgb[((size_t)sy * w + sx) * nc + c];
        }
    }
    auto t1 = clk::now();
    stage_secs[0] = secs(t0, t1);

    // Stage 2: CSC (exact BT.601, same expressions as cpu_encode_scan).
    std::vector<double> Y((size_t)ph * pw), Cb, Cr;
    if (mode != 3) {
        Cb.resize((size_t)ph * pw);
        Cr.resize((size_t)ph * pw);
    }
    for (size_t i = 0; i < (size_t)ph * pw; ++i) {
        if (mode == 3) {
            Y[i] = (double)prgb[i];
            continue;
        }
        double r = prgb[i * 3], g = prgb[i * 3 + 1], b = prgb[i * 3 + 2];
        Y[i] = 0.299 * r + 0.587 * g + 0.114 * b;
        Cb[i] = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b;
        Cr[i] = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b;
    }
    auto t2 = clk::now();
    stage_secs[1] = secs(t1, t2);

    // Stage 3: chroma downsample (addition order matches the monolithic
    // per-MCU code exactly for double parity).
    int ch_ = ph, cw_ = pw;
    if (mode == 2) { ch_ = ph / 2; cw_ = pw / 2; }
    else if (mode == 1) { cw_ = pw / 2; }
    std::vector<double> sCb, sCr;
    if (mode == 1 || mode == 2) {
        sCb.resize((size_t)ch_ * cw_);
        sCr.resize((size_t)ch_ * cw_);
        for (int y = 0; y < ch_; ++y)
            for (int x = 0; x < cw_; ++x) {
                size_t o = (size_t)y * cw_ + x;
                if (mode == 2) {
                    size_t p = (size_t)(2 * y) * pw + 2 * x;
                    sCb[o] = (Cb[p] + Cb[p + 1] +
                              Cb[p + pw] + Cb[p + pw + 1]) * 0.25;
                    sCr[o] = (Cr[p] + Cr[p + 1] +
                              Cr[p + pw] + Cr[p + pw + 1]) * 0.25;
                } else {
                    size_t p = (size_t)y * pw + 2 * x;
                    sCb[o] = (Cb[p] + Cb[p + 1]) * 0.5;
                    sCr[o] = (Cr[p] + Cr[p + 1]) * 0.5;
                }
            }
    }
    auto t3 = clk::now();
    stage_secs[2] = secs(t2, t3);

    // Stage 4: level shift + forward DCT for every block in scan order
    // (MCU raster; luma blocks then Cb, Cr — same order as the entropy
    // walk below and cpu_encode_scan).
    const int lby = mh / 8, lbx = mw / 8;
    const int bpm = lby * lbx + (mode == 3 ? 0 : 2);
    const size_t nblocks = (size_t)my * mx * bpm;
    std::vector<double> coefs(nblocks * 64);
    double blk[64];
    size_t bi = 0;
    for (int myi = 0; myi < my; ++myi)
        for (int mxi = 0; mxi < mx; ++mxi) {
            for (int by = 0; by < lby; ++by)
                for (int bx = 0; bx < lbx; ++bx) {
                    for (int y = 0; y < 8; ++y)
                        for (int x = 0; x < 8; ++x)
                            blk[y * 8 + x] =
                                Y[(size_t)(myi * mh + by * 8 + y) * pw +
                                  mxi * mw + bx * 8 + x] - 128.0;
                    dct8x8(blk, &coefs[bi++ * 64]);
                }
            if (mode != 3) {
                const std::vector<double>* cp[2] = {
                    (mode == 0) ? &Cb : &sCb, (mode == 0) ? &Cr : &sCr};
                for (int c = 0; c < 2; ++c) {
                    for (int y = 0; y < 8; ++y)
                        for (int x = 0; x < 8; ++x)
                            blk[y * 8 + x] =
                                (*cp[c])[(size_t)(myi * 8 + y) * cw_ +
                                         mxi * 8 + x] - 128.0;
                    dct8x8(blk, &coefs[bi++ * 64]);
                }
            }
        }
    auto t4 = clk::now();
    stage_secs[3] = secs(t3, t4);

    // Stage 5: quantization + zigzag.
    std::vector<int32_t> zzbuf(nblocks * 64);
    for (size_t i = 0; i < nblocks; ++i) {
        bool chroma = (mode != 3) && ((int)(i % bpm) >= lby * lbx);
        quant_zigzag(&coefs[i * 64], chroma ? qtab_zz + 64 : qtab_zz,
                     zigzag, &zzbuf[i * 64]);
    }
    auto t5 = clk::now();
    stage_secs[4] = secs(t4, t5);

    // Stage 6: entropy — RLE, Huffman, bit pack, stuffing, RST markers.
    HuffTables ht{dc_codes, dc_lens, ac_codes, ac_lens};
    std::vector<uint8_t> scan;
    scan.reserve((size_t)my * mx * 64);
    BitWriter bw(scan);
    int pred[3] = {0, 0, 0};
    int seg = 0, mcu_in_seg = 0;
    const size_t n_mcu = (size_t)my * mx;
    for (size_t m = 0; m < n_mcu; ++m) {
        const int32_t* mzz = &zzbuf[m * bpm * 64];
        for (int bq = 0; bq < lby * lbx; ++bq)
            encode_block(bw, mzz + (size_t)bq * 64, 0, pred[0], ht);
        if (mode != 3)
            for (int c = 0; c < 2; ++c)
                encode_block(bw, mzz + (size_t)(lby * lbx + c) * 64, 1,
                             pred[c + 1], ht);
        if (restart > 0 && ++mcu_in_seg == restart && m != n_mcu - 1) {
            bw.pad_to_byte();
            scan.push_back(0xFF);
            scan.push_back((uint8_t)(0xD0 + (seg & 7)));
            ++seg;
            mcu_in_seg = 0;
            pred[0] = pred[1] = pred[2] = 0;
        }
    }
    bw.pad_to_byte();
    auto t6 = clk::now();
    stage_secs[5] = secs(t5, t6);

    if ((long long)scan.size() > out_cap) return -1;
    std::memcpy(out, scan.data(), scan.size());
    return (long long)scan.size();
}

}  // extern "C"
