// jpegtpu native runtime helpers (C++), loaded via ctypes.
//
// The reference implements its host runtime in C++ (driver, PPM I/O, timing —
// src/OpenCLProject_JpegEncoder.cpp, src/utils.cpp:11-82, lib/Core/). This
// module is the TPU framework's native equivalent for the host-side hot
// paths that sit outside XLA:
//   * byte-stuffing + restart-marker splicing of device-packed entropy
//     segments into the final scan (memcpy-speed, replaces a Python loop)
//   * P6/P5 PNM header parsing and bulk pixel I/O
//
// Build: make -C jpegtpu/native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>

extern "C" {

// Stuff 0x00 after every 0xFF and splice RSTn markers between segments.
// segs:    [n_seg, cap] row-major unstuffed segment bytes (already 1-padded
//          to byte boundaries on device)
// nbytes:  [n_seg] valid byte count per segment
// restart: nonzero -> emit RST(s % 8) after every segment but the last
// out:     caller-allocated; worst case sum(nbytes)*2 + (n_seg-1)*2
// returns total bytes written, or -1 if out_cap would overflow.
long long stuff_assemble(const uint8_t* segs, const int32_t* nbytes,
                         int n_seg, long long cap, int restart,
                         uint8_t* out, long long out_cap) {
    long long o = 0;
    for (int s = 0; s < n_seg; ++s) {
        const uint8_t* p = segs + (long long)s * cap;
        const int32_t n = nbytes[s];
        if (o + 2LL * n + 2 > out_cap) return -1;
        for (int32_t i = 0; i < n; ++i) {
            const uint8_t b = p[i];
            out[o++] = b;
            if (b == 0xFF) out[o++] = 0x00;
        }
        if (restart && s != n_seg - 1) {
            out[o++] = 0xFF;
            out[o++] = (uint8_t)(0xD0 + (s & 7));
        }
    }
    return o;
}

// Same as stuff_assemble but for segments laid out back-to-back in one
// contiguous buffer (device-compacted stream; offsets are the running sum
// of nbytes).
long long stuff_assemble_contig(const uint8_t* stream, const int32_t* nbytes,
                                int n_seg, int restart, uint8_t* out,
                                long long out_cap) {
    long long o = 0;
    const uint8_t* p = stream;
    for (int s = 0; s < n_seg; ++s) {
        const int32_t n = nbytes[s];
        if (o + 2LL * n + 2 > out_cap) return -1;
        for (int32_t i = 0; i < n; ++i) {
            const uint8_t b = p[i];
            out[o++] = b;
            if (b == 0xFF) out[o++] = 0x00;
        }
        p += n;
        if (restart && s != n_seg - 1) {
            out[o++] = 0xFF;
            out[o++] = (uint8_t)(0xD0 + (s & 7));
        }
    }
    return o;
}

// Merge N raw (unpadded) bitstreams at bit granularity, 1-pad the final
// byte, and emit with 0xFF00 stuffing — the host half of the no-restart
// sharded mode (shards produce bit-exact partial streams; DC predictors
// were exchanged on device over ICI).
// streams: [n, cap] row-major big-endian byte streams; bitlens: [n].
// Returns stuffed byte count, or -1 on overflow.
long long merge_bitstreams_stuff(const uint8_t* streams,
                                 const long long* bitlens, int n,
                                 long long cap, uint8_t* out,
                                 long long out_cap) {
    long long total_bits = 0;
    for (int i = 0; i < n; ++i) total_bits += bitlens[i];
    const long long nbytes = (total_bits + 7) / 8;
    uint8_t* merged = new uint8_t[nbytes + 2]();
    long long off = 0;  // bit cursor
    for (int i = 0; i < n; ++i) {
        const uint8_t* src = streams + (long long)i * cap;
        const long long nb = bitlens[i];
        const int shift = (int)(off & 7);
        long long ob = off >> 3;
        if (shift == 0) {
            std::memcpy(merged + ob, src, (size_t)((nb + 7) / 8));
        } else {
            const long long srcbytes = (nb + 7) / 8;
            for (long long j = 0; j < srcbytes; ++j) {
                merged[ob + j] |= (uint8_t)(src[j] >> shift);
                merged[ob + j + 1] |= (uint8_t)(src[j] << (8 - shift));
            }
        }
        off += nb;
        // bits past nb in the source are zero by construction (pack_words
        // zero-fills), so no cleanup is needed after the OR-copy
    }
    // 1-pad the final partial byte (T.81 F.1.2.3).
    if (total_bits & 7)
        merged[total_bits >> 3] |=
            (uint8_t)((1u << (8 - (total_bits & 7))) - 1);
    long long o = 0;
    for (long long j = 0; j < nbytes; ++j) {
        if (o + 2 > out_cap) { delete[] merged; return -1; }
        out[o++] = merged[j];
        if (merged[j] == 0xFF) out[o++] = 0x00;
    }
    delete[] merged;
    return o;
}

// Parse a P6/P5 PNM header. Returns 0 on success; fills width/height/
// channels and the pixel-data offset. maxval must be 255 (matching the
// reference reader, src/utils.cpp:38).
int parse_pnm_header(const uint8_t* data, long long n, int* width,
                     int* height, int* channels, long long* pix_offset) {
    if (n < 2 || data[0] != 'P' || (data[1] != '6' && data[1] != '5'))
        return -1;
    *channels = data[1] == '6' ? 3 : 1;
    long long i = 2;
    int vals[3];
    for (int v = 0; v < 3; ++v) {
        // skip whitespace and comments
        for (;;) {
            while (i < n && (data[i] == ' ' || data[i] == '\t' ||
                             data[i] == '\n' || data[i] == '\r')) ++i;
            if (i < n && data[i] == '#') {
                while (i < n && data[i] != '\n') ++i;
            } else {
                break;
            }
        }
        if (i >= n) return -2;
        long long x = 0;
        bool any = false;
        while (i < n && data[i] >= '0' && data[i] <= '9') {
            x = x * 10 + (data[i] - '0');
            ++i;
            any = true;
            if (x > 1000000000LL) return -3;
        }
        if (!any) return -2;
        vals[v] = (int)x;
    }
    if (i >= n) return -2;
    ++i;  // single whitespace after maxval
    if (vals[2] != 255) return -4;
    *width = vals[0];
    *height = vals[1];
    *pix_offset = i;
    return 0;
}

}  // extern "C"
