// toast_tpu native codec: lossless float32 TOD compression.
//
// Native-runtime equivalent of the reference's FLAC-compressed detector
// data (src/toast/io/observation_hdf_save.py:186, which delegates to
// libFLAC).  FLAC is unavailable here, so this implements the same idea
// directly: per-block delta/linear prediction of quantized samples followed
// by Rice (Golomb power-of-two) coding of the residuals — the core of what
// FLAC does for TOD-like streams.
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (toast_tpu/native/__init__.py); built with `python -m toast_tpu.native.build`
// or on first use.
//
// Format (little endian):
//   header: uint32 magic 'TTC1', uint32 n_samples, float32 scale,
//           float32 offset, uint8 predictor (0=verbatim,1=delta,2=linear)
//   per block of 4096 samples: uint8 k (rice parameter, 255 = raw int32),
//           followed by the bitstream.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

namespace {

constexpr uint32_t MAGIC = 0x31435454u;  // "TTC1"
constexpr int BLOCK = 4096;

struct BitWriter {
    std::vector<uint8_t> &buf;
    uint64_t acc = 0;
    int nbits = 0;
    explicit BitWriter(std::vector<uint8_t> &b) : buf(b) {}
    inline void put(uint64_t bits, int n) {
        acc |= bits << nbits;
        nbits += n;
        while (nbits >= 8) {
            buf.push_back(static_cast<uint8_t>(acc & 0xff));
            acc >>= 8;
            nbits -= 8;
        }
    }
    void flush() {
        if (nbits > 0) {
            buf.push_back(static_cast<uint8_t>(acc & 0xff));
            acc = 0;
            nbits = 0;
        }
    }
};

struct BitReader {
    const uint8_t *p;
    const uint8_t *end;
    uint64_t acc = 0;
    int nbits = 0;
    BitReader(const uint8_t *data, size_t n) : p(data), end(data + n) {}
    inline uint64_t get(int n) {
        while (nbits < n) {
            acc |= static_cast<uint64_t>(p < end ? *p++ : 0) << nbits;
            nbits += 8;
        }
        uint64_t out = acc & ((1ull << n) - 1);
        acc >>= n;
        nbits -= n;
        return out;
    }
    inline uint32_t get_unary() {
        uint32_t q = 0;
        while (get(1) == 0) {
            ++q;
            if (q > 1u << 24) return q;  // corrupt stream guard
        }
        return q;
    }
};

inline uint32_t zigzag(int32_t v) {
    return (static_cast<uint32_t>(v) << 1) ^ static_cast<uint32_t>(v >> 31);
}
inline int32_t unzigzag(uint32_t v) {
    return static_cast<int32_t>(v >> 1) ^ -static_cast<int32_t>(v & 1);
}

int best_rice_k(const int32_t *res, int n) {
    uint64_t sum = 0;
    for (int i = 0; i < n; ++i) sum += zigzag(res[i]);
    if (n == 0) return 0;
    double mean = static_cast<double>(sum) / n;
    int k = 0;
    while ((1u << (k + 1)) < mean && k < 30) ++k;
    return k;
}

}  // namespace

extern "C" {

// Compress n float32 samples quantized to `quanta` (absolute step).
// Returns compressed size, or -1 if out_cap too small / unquantizable.
long long ttc_compress(const float *data, long long n, float quanta,
                       uint8_t *out, long long out_cap) {
    if (n <= 0 || quanta <= 0) return -1;
    // the header stores the sample count as uint32; larger inputs would
    // silently truncate and decompress to the wrong length
    if (n > static_cast<long long>(UINT32_MAX)) return -1;
    // quantize
    std::vector<int32_t> q(n);
    for (long long i = 0; i < n; ++i) {
        double v = static_cast<double>(data[i]) / quanta;
        if (std::fabs(v) > 2.0e9) return -1;  // overflow: caller stores raw
        q[i] = static_cast<int32_t>(std::llround(v));
    }
    // choose predictor on a sample of blocks: order 2 (linear) usually wins
    std::vector<uint8_t> buf;
    buf.reserve(static_cast<size_t>(n) * 2 + 64);
    auto push32 = [&buf](uint32_t v) {
        for (int b = 0; b < 4; ++b) buf.push_back((v >> (8 * b)) & 0xff);
    };
    push32(MAGIC);
    push32(static_cast<uint32_t>(n));
    float scale = quanta;
    uint32_t scale_bits;
    std::memcpy(&scale_bits, &scale, 4);
    push32(scale_bits);
    push32(0);  // offset reserved
    const uint8_t predictor = 2;
    buf.push_back(predictor);

    std::vector<int32_t> res(BLOCK);
    for (long long start = 0; start < n; start += BLOCK) {
        int len = static_cast<int>(std::min<long long>(BLOCK, n - start));
        for (int i = 0; i < len; ++i) {
            long long t = start + i;
            int32_t pred = 0;
            if (t >= 2) pred = 2 * q[t - 1] - q[t - 2];
            else if (t == 1) pred = q[0];
            res[i] = q[t] - pred;
        }
        int k = best_rice_k(res.data(), len);
        // escape to raw if rice would blow up
        uint64_t est = 0;
        for (int i = 0; i < len; ++i) est += (zigzag(res[i]) >> k) + 1 + k;
        if (est > static_cast<uint64_t>(len) * 34) {
            buf.push_back(255);
            for (int i = 0; i < len; ++i) push32(zigzag(res[i]));
            continue;
        }
        buf.push_back(static_cast<uint8_t>(k));
        BitWriter bw(buf);
        for (int i = 0; i < len; ++i) {
            uint32_t u = zigzag(res[i]);
            uint32_t quot = u >> k;
            for (uint32_t j = 0; j < quot; ++j) bw.put(0, 1);
            bw.put(1, 1);
            if (k > 0) bw.put(u & ((1u << k) - 1), k);
        }
        bw.flush();
    }
    if (static_cast<long long>(buf.size()) > out_cap) return -1;
    std::memcpy(out, buf.data(), buf.size());
    return static_cast<long long>(buf.size());
}

// Decompress into out (must hold n_samples floats). Returns n_samples or -1.
long long ttc_decompress(const uint8_t *data, long long nbytes, float *out,
                         long long out_cap) {
    if (nbytes < 17) return -1;
    auto read32 = [&data](long long off) {
        uint32_t v;
        std::memcpy(&v, data + off, 4);
        return v;
    };
    if (read32(0) != MAGIC) return -1;
    long long n = read32(4);
    if (n > out_cap) return -1;
    float quanta;
    uint32_t sb = read32(8);
    std::memcpy(&quanta, &sb, 4);
    // uint8 predictor at byte 16 (assumed 2)
    long long off = 17;
    std::vector<int32_t> q(n);
    long long t = 0;
    while (t < n) {
        int len = static_cast<int>(std::min<long long>(BLOCK, n - t));
        uint8_t k = data[off++];
        if (k == 255) {
            for (int i = 0; i < len; ++i) {
                int32_t r = unzigzag(read32(off));
                off += 4;
                int32_t pred = 0;
                if (t >= 2) pred = 2 * q[t - 1] - q[t - 2];
                else if (t == 1) pred = q[0];
                q[t] = pred + r;
                ++t;
            }
            continue;
        }
        // find the byte length of this rice block by decoding
        BitReader br(data + off, nbytes - off);
        for (int i = 0; i < len; ++i) {
            uint32_t quot = br.get_unary();
            uint32_t rem = (k > 0) ? static_cast<uint32_t>(br.get(k)) : 0;
            int32_t r = unzigzag((quot << k) | rem);
            int32_t pred = 0;
            if (t >= 2) pred = 2 * q[t - 1] - q[t - 2];
            else if (t == 1) pred = q[0];
            q[t] = pred + r;
            ++t;
        }
        off += (br.p - (data + off));
        // rewind partially-consumed byte accounting: br consumed whole bytes
        off -= br.nbits / 8;
    }
    for (long long i = 0; i < n; ++i) {
        out[i] = static_cast<float>(q[i]) * quanta;
    }
    return n;
}

}  // extern "C"
