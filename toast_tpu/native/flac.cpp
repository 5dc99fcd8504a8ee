// Native FLAC stream codec (subset sufficient for detector-data interop).
//
// The reference compresses HDF5 detector data with libFLAC through the
// `flacarray` package (ref:src/toast/io/observation_hdf_save.py:186,379).
// This is an independent implementation of the FLAC bitstream format
// (decoder: full subset used for integer TOD — CONSTANT / VERBATIM /
// FIXED / LPC subframes, Rice and Rice2 residual partitions, escape
// codes, wasted bits, stereo decorrelation; encoder: FIXED predictors
// with Rice partitions, enough to produce spec-compliant streams) so
// reference observations written with FLAC-compressed detdata can be
// read without libFLAC, and round-trip fixtures can be generated.
//
// Build: g++ -O3 -shared -fPIC (see native/__init__.py).

#include <cstdint>
#include <cstring>
#include <cstddef>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// CRC tables (FLAC uses CRC-8 poly 0x07 for frame headers, CRC-16 poly
// 0x8005 for whole frames)
// ---------------------------------------------------------------------------

struct CrcTables {
    uint8_t crc8[256];
    uint16_t crc16[256];
    CrcTables() {
        for (int i = 0; i < 256; ++i) {
            uint8_t c8 = (uint8_t)i;
            for (int b = 0; b < 8; ++b)
                c8 = (uint8_t)((c8 << 1) ^ ((c8 & 0x80) ? 0x07 : 0));
            crc8[i] = c8;
            uint16_t c16 = (uint16_t)(i << 8);
            for (int b = 0; b < 8; ++b)
                c16 = (uint16_t)((c16 << 1) ^ ((c16 & 0x8000) ? 0x8005 : 0));
            crc16[i] = c16;
        }
    }
};
static const CrcTables kCrc;

// ---------------------------------------------------------------------------
// MSB-first bit reader
// ---------------------------------------------------------------------------

struct BitReader {
    const uint8_t* data;
    size_t nbytes;
    size_t pos = 0;   // byte position
    int bit = 0;      // bits consumed in current byte (0..7)
    bool error = false;

    BitReader(const uint8_t* d, size_t n) : data(d), nbytes(n) {}

    bool eof() const { return pos >= nbytes; }

    inline uint32_t read_bit() {
        if (pos >= nbytes) { error = true; return 0; }
        uint32_t v = (data[pos] >> (7 - bit)) & 1u;
        if (++bit == 8) { bit = 0; ++pos; }
        return v;
    }

    inline uint64_t read_bits(int n) {
        uint64_t v = 0;
        while (n > 0) {
            if (pos >= nbytes) { error = true; return 0; }
            int avail = 8 - bit;
            int take = n < avail ? n : avail;
            uint32_t chunk =
                (data[pos] >> (avail - take)) & ((1u << take) - 1u);
            v = (v << take) | chunk;
            bit += take;
            if (bit == 8) { bit = 0; ++pos; }
            n -= take;
        }
        return v;
    }

    inline int64_t read_signed(int n) {
        uint64_t v = read_bits(n);
        if (n > 0 && (v >> (n - 1)) & 1u)
            v |= ~((uint64_t(1) << n) - 1);  // sign extend
        return (int64_t)v;
    }

    inline uint32_t read_unary() {
        uint32_t q = 0;
        // byte-at-a-time scan for the terminating 1 bit
        while (true) {
            if (pos >= nbytes) { error = true; return 0; }
            uint8_t cur = (uint8_t)(data[pos] << bit);
            if (cur == 0) {
                q += 8 - bit;
                ++pos; bit = 0;
                continue;
            }
            int lead = __builtin_clz((uint32_t)cur << 24);
            q += lead;
            bit += lead + 1;
            if (bit >= 8) { bit -= 8; ++pos; }
            return q;
        }
    }

    void align() { if (bit) { bit = 0; ++pos; } }
};

// UTF-8-style coded number (frame/sample index), up to 36 bits
static int64_t read_utf8(BitReader& br) {
    uint32_t b0 = (uint32_t)br.read_bits(8);
    if (!(b0 & 0x80)) return b0;
    int n = 0;
    uint32_t mask = 0x40;
    while (b0 & mask) { ++n; mask >>= 1; }
    if (n < 1 || n > 6) { br.error = true; return -1; }
    int64_t v = b0 & (mask - 1);
    for (int i = 0; i < n; ++i) {
        uint32_t b = (uint32_t)br.read_bits(8);
        if ((b & 0xC0) != 0x80) { br.error = true; return -1; }
        v = (v << 6) | (b & 0x3F);
    }
    return v;
}

// ---------------------------------------------------------------------------
// decoder
// ---------------------------------------------------------------------------

struct StreamInfo {
    int channels = 0;
    int bps = 0;
    int64_t total_samples = 0;
};

static bool parse_streaminfo(const uint8_t* data, size_t nbytes,
                             StreamInfo* info, size_t* frames_at) {
    if (nbytes < 4 + 4 + 34 || memcmp(data, "fLaC", 4) != 0) return false;
    size_t p = 4;
    bool have_si = false;
    while (p + 4 <= nbytes) {
        uint8_t hdr = data[p];
        bool last = (hdr & 0x80) != 0;
        int type = hdr & 0x7F;
        uint32_t len = ((uint32_t)data[p + 1] << 16) |
                       ((uint32_t)data[p + 2] << 8) | data[p + 3];
        p += 4;
        if (p + len > nbytes) return false;
        if (type == 0 && len >= 34) {
            const uint8_t* s = data + p;
            // skip min/max blocksize (4B) + min/max framesize (6B)
            uint32_t sr = ((uint32_t)s[10] << 12) | ((uint32_t)s[11] << 4) |
                          (s[12] >> 4);
            (void)sr;
            info->channels = ((s[12] >> 1) & 0x7) + 1;
            info->bps = (((s[12] & 1) << 4) | (s[13] >> 4)) + 1;
            info->total_samples =
                ((int64_t)(s[13] & 0x0F) << 32) | ((int64_t)s[14] << 24) |
                ((int64_t)s[15] << 16) | ((int64_t)s[16] << 8) | s[17];
            have_si = true;
        }
        p += len;
        if (last) break;
    }
    *frames_at = p;
    return have_si;
}

// residual for one subframe (into out[order..blocksize))
static bool read_residual(BitReader& br, int blocksize, int order,
                          int64_t* out) {
    uint32_t method = (uint32_t)br.read_bits(2);
    if (method > 1) return false;
    int plen = method == 0 ? 4 : 5;
    uint32_t escape = method == 0 ? 0xF : 0x1F;
    uint32_t po = (uint32_t)br.read_bits(4);
    uint32_t nparts = 1u << po;
    if ((blocksize >> po) < order || (blocksize % nparts) != 0) return false;
    int idx = order;
    for (uint32_t part = 0; part < nparts; ++part) {
        int count = (blocksize >> po) - (part == 0 ? order : 0);
        uint32_t param = (uint32_t)br.read_bits(plen);
        if (param == escape) {
            uint32_t raw = (uint32_t)br.read_bits(5);
            for (int i = 0; i < count; ++i)
                out[idx++] = raw ? br.read_signed((int)raw) : 0;
        } else {
            for (int i = 0; i < count; ++i) {
                uint32_t q = br.read_unary();
                uint64_t u = ((uint64_t)q << param) |
                             (param ? br.read_bits((int)param) : 0);
                out[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
            }
        }
        if (br.error) return false;
    }
    return true;
}

static const int kFixedOrderMax = 4;

static bool read_subframe(BitReader& br, int blocksize, int bps,
                          int64_t* out) {
    if (br.read_bit() != 0) return false;  // padding bit
    uint32_t type = (uint32_t)br.read_bits(6);
    int wasted = 0;
    if (br.read_bit()) wasted = (int)br.read_unary() + 1;
    int sbits = bps - wasted;
    if (sbits <= 0 || sbits > 33) return false;

    if (type == 0) {  // CONSTANT
        int64_t v = br.read_signed(sbits);
        for (int i = 0; i < blocksize; ++i) out[i] = v;
    } else if (type == 1) {  // VERBATIM
        for (int i = 0; i < blocksize; ++i) out[i] = br.read_signed(sbits);
    } else if ((type & 0x38) == 0x08 && (type & 0x07) <= kFixedOrderMax) {
        int order = type & 0x07;
        for (int i = 0; i < order; ++i) out[i] = br.read_signed(sbits);
        if (!read_residual(br, blocksize, order, out)) return false;
        // fixed predictors (orders 0-4)
        switch (order) {
        case 0: break;
        case 1:
            for (int i = 1; i < blocksize; ++i) out[i] += out[i - 1];
            break;
        case 2:
            for (int i = 2; i < blocksize; ++i)
                out[i] += 2 * out[i - 1] - out[i - 2];
            break;
        case 3:
            for (int i = 3; i < blocksize; ++i)
                out[i] += 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3];
            break;
        case 4:
            for (int i = 4; i < blocksize; ++i)
                out[i] += 4 * out[i - 1] - 6 * out[i - 2] +
                          4 * out[i - 3] - out[i - 4];
            break;
        }
    } else if (type >= 0x20) {  // LPC
        int order = (int)(type & 0x1F) + 1;
        for (int i = 0; i < order; ++i) out[i] = br.read_signed(sbits);
        int precision = (int)br.read_bits(4) + 1;
        if (precision == 16) return false;  // 0b1111 invalid
        int shift = (int)br.read_signed(5);
        if (shift < 0) return false;
        int32_t coef[32];
        for (int i = 0; i < order; ++i)
            coef[i] = (int32_t)br.read_signed(precision);
        if (!read_residual(br, blocksize, order, out)) return false;
        for (int i = order; i < blocksize; ++i) {
            int64_t acc = 0;
            for (int j = 0; j < order; ++j)
                acc += (int64_t)coef[j] * out[i - 1 - j];
            out[i] += acc >> shift;
        }
    } else {
        return false;
    }
    if (wasted)
        for (int i = 0; i < blocksize; ++i)
            out[i] = (int64_t)((uint64_t)out[i] << wasted);
    return !br.error;
}

// Decode all frames.  out is interleaved (sample-major) int32,
// capacity in per-channel samples.  Returns decoded per-channel samples
// or -1 on error.
static int64_t decode_frames(BitReader& br, const StreamInfo& si,
                             int32_t* out, int64_t capacity) {
    static const int kBlockSizes[16] = {0, 192, 576, 1152, 2304, 4608,
                                        -8, -16, 256, 512, 1024, 2048,
                                        4096, 8192, 16384, 32768};
    int64_t total = 0;
    std::vector<int64_t> ch[8];
    while (true) {
        // skip any zero padding then find sync
        br.align();
        while (br.pos < br.nbytes && br.data[br.pos] == 0) ++br.pos;
        if (br.pos >= br.nbytes) break;
        uint32_t sync = (uint32_t)br.read_bits(14);
        if (br.error) break;
        if (sync != 0x3FFE) return -1;
        br.read_bit();             // reserved
        br.read_bit();             // blocking strategy
        uint32_t bs_code = (uint32_t)br.read_bits(4);
        uint32_t sr_code = (uint32_t)br.read_bits(4);
        uint32_t ch_asgn = (uint32_t)br.read_bits(4);
        uint32_t ss_code = (uint32_t)br.read_bits(3);
        br.read_bit();             // reserved
        if (read_utf8(br) < 0) return -1;
        int blocksize;
        int code = kBlockSizes[bs_code];
        if (code > 0) blocksize = code;
        else if (code == -8) blocksize = (int)br.read_bits(8) + 1;
        else if (code == -16) blocksize = (int)br.read_bits(16) + 1;
        else return -1;
        if (sr_code == 12) br.read_bits(8);
        else if (sr_code == 13 || sr_code == 14) br.read_bits(16);
        else if (sr_code == 15) return -1;
        br.read_bits(8);           // header CRC-8 (not re-verified)
        int bps;
        switch (ss_code) {
        case 0: bps = si.bps; break;
        case 1: bps = 8; break;
        case 2: bps = 12; break;
        case 4: bps = 16; break;
        case 5: bps = 20; break;
        case 6: bps = 24; break;
        case 7: bps = 32; break;
        default: return -1;
        }
        int nch;
        if (ch_asgn < 8) nch = (int)ch_asgn + 1;
        else if (ch_asgn <= 10) nch = 2;
        else return -1;
        if (nch != si.channels) return -1;
        if (total + blocksize > capacity) return -1;
        for (int c = 0; c < nch; ++c) {
            int cbps = bps;
            if ((ch_asgn == 8 && c == 1) || (ch_asgn == 9 && c == 0) ||
                (ch_asgn == 10 && c == 1))
                cbps += 1;  // side channel carries one extra bit
            ch[c].assign((size_t)blocksize, 0);
            if (!read_subframe(br, blocksize, cbps, ch[c].data()))
                return -1;
        }
        // undo stereo decorrelation
        if (ch_asgn == 8) {        // left/side
            for (int i = 0; i < blocksize; ++i) ch[1][i] = ch[0][i] - ch[1][i];
        } else if (ch_asgn == 9) { // right/side: ch0=side, ch1=right
            for (int i = 0; i < blocksize; ++i) ch[0][i] = ch[0][i] + ch[1][i];
        } else if (ch_asgn == 10) {// mid/side
            for (int i = 0; i < blocksize; ++i) {
                int64_t mid = ch[0][i], side = ch[1][i];
                mid = (mid << 1) | (side & 1);
                ch[0][i] = (mid + side) >> 1;
                ch[1][i] = (mid - side) >> 1;
            }
        }
        br.align();
        br.read_bits(16);          // frame CRC-16 (not re-verified)
        if (br.error) return -1;
        for (int i = 0; i < blocksize; ++i)
            for (int c = 0; c < nch; ++c)
                out[(total + i) * nch + c] = (int32_t)ch[c][i];
        total += blocksize;
        if (si.total_samples > 0 && total >= si.total_samples) break;
    }
    return total;
}

// ---------------------------------------------------------------------------
// encoder (FIXED predictors + Rice, independent channels)
// ---------------------------------------------------------------------------

struct BitWriter {
    std::vector<uint8_t> buf;
    uint64_t acc = 0;
    int nbits = 0;
    size_t frame_start = 0;

    void put_bits(uint64_t v, int n) {
        acc = (acc << n) | (v & ((n >= 64) ? ~0ULL : ((1ULL << n) - 1)));
        nbits += n;
        while (nbits >= 8) {
            nbits -= 8;
            buf.push_back((uint8_t)(acc >> nbits));
        }
    }
    void put_unary(uint32_t q) {
        while (q >= 32) { put_bits(0, 32); q -= 32; }
        put_bits(1, (int)q + 1);
    }
    void align() { if (nbits) put_bits(0, 8 - nbits); }
};

static void write_utf8(BitWriter& bw, uint64_t v) {
    if (v < 0x80) { bw.put_bits(v, 8); return; }
    // n continuation bytes: lead byte carries 6-n payload bits, so the
    // total payload is 6 + 5n bits
    int n = 1;
    while (n < 6 && v >= (1ULL << (6 + 5 * n))) ++n;
    uint32_t lead = (uint32_t)(((1u << (n + 2)) - 2u) << (6 - n));
    bw.put_bits(lead | (uint32_t)(v >> (6 * n)), 8);
    for (int i = n - 1; i >= 0; --i)
        bw.put_bits(0x80 | ((v >> (6 * i)) & 0x3F), 8);
}

static int best_rice_param(const int64_t* res, int n, uint64_t* cost_out) {
    uint64_t sum = 0;
    for (int i = 0; i < n; ++i) {
        int64_t r = res[i];
        sum += (uint64_t)((r << 1) ^ (r >> 63));
    }
    int best = 0;
    uint64_t best_cost = ~0ULL;
    for (int p = 0; p < 30; ++p) {
        // cost = n*(p+1) + sum(zigzag >> p); estimate via mean
        uint64_t cost = (uint64_t)n * (uint64_t)(p + 1) + (sum >> p);
        if (cost < best_cost) { best_cost = cost; best = p; }
    }
    *cost_out = best_cost;
    return best;
}

static void write_residual(BitWriter& bw, const int64_t* res, int n,
                           int param) {
    bw.put_bits(1, 2);   // Rice2 (5-bit params) always
    bw.put_bits(0, 4);   // partition order 0
    bw.put_bits((uint32_t)param, 5);
    for (int i = 0; i < n; ++i) {
        uint64_t u = (uint64_t)((res[i] << 1) ^ (res[i] >> 63));
        bw.put_unary((uint32_t)(u >> param));
        if (param) bw.put_bits(u & ((1ULL << param) - 1), param);
    }
}

static void encode_subframe(BitWriter& bw, const int32_t* x, int n,
                            int bps) {
    // choose among FIXED orders 0..2 and VERBATIM
    std::vector<int64_t> res[3];
    uint64_t cost[3];
    int param[3];
    for (int order = 0; order <= 2 && order < n; ++order) {
        res[order].resize(n - order);
        for (int i = order; i < n; ++i) {
            int64_t v;
            if (order == 0) v = x[i];
            else if (order == 1) v = (int64_t)x[i] - x[i - 1];
            else v = (int64_t)x[i] - 2 * (int64_t)x[i - 1] + x[i - 2];
            res[order][i - order] = v;
        }
        uint64_t c;
        param[order] = best_rice_param(res[order].data(), n - order, &c);
        cost[order] = c + (uint64_t)order * bps;
    }
    int best = 0;
    for (int o = 1; o <= 2 && o < n; ++o)
        if (cost[o] < cost[best]) best = o;
    uint64_t verbatim_cost = (uint64_t)n * bps;
    if (verbatim_cost + 64 < cost[best]) {
        bw.put_bits(0, 1);
        bw.put_bits(1, 6);      // VERBATIM
        bw.put_bits(0, 1);      // no wasted bits
        for (int i = 0; i < n; ++i) bw.put_bits((uint64_t)(uint32_t)x[i] |
            ((x[i] < 0 && bps > 32) ? (~0ULL << 32) : 0), bps);
        return;
    }
    bw.put_bits(0, 1);
    bw.put_bits(0x08 | best, 6);  // FIXED, order `best`
    bw.put_bits(0, 1);            // no wasted bits
    for (int i = 0; i < best; ++i)
        bw.put_bits((uint64_t)(uint32_t)x[i], bps);
    write_residual(bw, res[best].data(), n - best, param[best]);
}

static void crc_patch_frame(std::vector<uint8_t>& buf, size_t start,
                            size_t hdr_crc_pos) {
    uint8_t c8 = 0;
    for (size_t i = start; i < hdr_crc_pos; ++i)
        c8 = kCrc.crc8[c8 ^ buf[i]];
    buf[hdr_crc_pos] = c8;
    uint16_t c16 = 0;
    for (size_t i = start; i < buf.size(); ++i)
        c16 = (uint16_t)((c16 << 8) ^ kCrc.crc16[(c16 >> 8) ^ buf[i]]);
    buf.push_back((uint8_t)(c16 >> 8));
    buf.push_back((uint8_t)c16);
}

static int64_t encode_stream(const int32_t* data, int64_t n_samples,
                             int n_channels, int bps,
                             std::vector<uint8_t>& out) {
    const int kBlock = 4096;
    BitWriter bw;
    // fLaC + STREAMINFO (last-metadata flag set)
    bw.put_bits('f', 8); bw.put_bits('L', 8);
    bw.put_bits('a', 8); bw.put_bits('C', 8);
    bw.put_bits(0x80, 8);          // last block, type 0
    bw.put_bits(34, 24);           // length
    int last_block = (int)(n_samples % kBlock);
    int minb = n_samples > kBlock ? kBlock : (int)n_samples;
    if (last_block && last_block < minb) minb = last_block;
    bw.put_bits((uint32_t)(minb < 16 ? 16 : minb), 16);
    bw.put_bits(kBlock, 16);
    bw.put_bits(0, 24); bw.put_bits(0, 24);   // min/max frame size unknown
    bw.put_bits(44100, 20);        // nominal sample rate (unused)
    bw.put_bits((uint32_t)(n_channels - 1), 3);
    bw.put_bits((uint32_t)(bps - 1), 5);
    bw.put_bits((uint64_t)n_samples & 0xFFFFFFFFFULL, 36);
    for (int i = 0; i < 16; ++i) bw.put_bits(0, 8);  // md5 unset
    // frames
    int64_t pos = 0;
    uint64_t frame_no = 0;
    std::vector<int32_t> chan;
    while (pos < n_samples) {
        int blocksize = (int)((n_samples - pos) < kBlock
                              ? (n_samples - pos) : kBlock);
        size_t start = bw.buf.size();
        bw.put_bits(0x3FFE, 14);
        bw.put_bits(0, 1);         // reserved
        bw.put_bits(0, 1);         // fixed blocksize strategy
        bw.put_bits(7, 4);         // blocksize: 16-bit at end of header
        bw.put_bits(9, 4);         // sample rate code 9 (44.1k; irrelevant)
        bw.put_bits((uint32_t)(n_channels - 1), 4);  // independent
        uint32_t ss;
        switch (bps) {
        case 8: ss = 1; break;
        case 12: ss = 2; break;
        case 16: ss = 4; break;
        case 20: ss = 5; break;
        case 24: ss = 6; break;
        case 32: ss = 7; break;
        default: ss = 0; break;    // from STREAMINFO
        }
        bw.put_bits(ss, 3);
        bw.put_bits(0, 1);         // reserved
        write_utf8(bw, frame_no++);
        bw.put_bits((uint32_t)(blocksize - 1), 16);
        size_t crc8_pos = bw.buf.size();
        bw.put_bits(0, 8);         // CRC-8 placeholder
        for (int c = 0; c < n_channels; ++c) {
            chan.resize(blocksize);
            for (int i = 0; i < blocksize; ++i)
                chan[i] = data[(pos + i) * n_channels + c];
            encode_subframe(bw, chan.data(), blocksize, bps);
        }
        bw.align();
        crc_patch_frame(bw.buf, start, crc8_pos);
        pos += blocksize;
    }
    out = std::move(bw.buf);
    return (int64_t)out.size();
}

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

extern "C" {

// Parse STREAMINFO.  Returns 0 on success.
int tt_flac_info(const uint8_t* bytes, int64_t nbytes, int32_t* channels,
                 int32_t* bps, int64_t* total_samples) {
    StreamInfo si;
    size_t fp;
    if (!parse_streaminfo(bytes, (size_t)nbytes, &si, &fp)) return 1;
    *channels = si.channels;
    *bps = si.bps;
    *total_samples = si.total_samples;
    return 0;
}

// Decode a complete stream into interleaved int32.  capacity is in
// per-channel samples.  Returns per-channel samples decoded, or -1.
int64_t tt_flac_decode(const uint8_t* bytes, int64_t nbytes, int32_t* out,
                       int64_t capacity) {
    StreamInfo si;
    size_t fp;
    if (!parse_streaminfo(bytes, (size_t)nbytes, &si, &fp)) return -1;
    if (si.channels < 1 || si.channels > 8) return -1;
    BitReader br(bytes, (size_t)nbytes);
    br.pos = fp;
    return decode_frames(br, si, out, capacity);
}

// Encode interleaved int32 -> FLAC stream.  Returns bytes written, or
// -1 if out_capacity is insufficient (call again with a larger buffer).
int64_t tt_flac_encode(const int32_t* data, int64_t n_samples,
                       int32_t n_channels, int32_t bps, uint8_t* out,
                       int64_t out_capacity) {
    if (n_channels < 1 || n_channels > 8 || bps < 4 || bps > 32) return -1;
    std::vector<uint8_t> buf;
    int64_t n = encode_stream(data, n_samples, (int)n_channels, (int)bps,
                              buf);
    if (n > out_capacity) return -1;
    memcpy(out, buf.data(), (size_t)n);
    return n;
}

}  // extern "C"
