// Reference-equivalent CPU kernel benchmark.
//
// Measures, on this host, the throughput of C++ implementations of the
// reference framework's hot destriping-pipeline kernels, using the same
// algorithms the reference's libtoast uses:
//
//   * pointing expansion: boresight x focalplane quaternion multiply and
//     z/x-axis rotations (ref: src/libtoast/src/toast_math_qarray.cpp:406,168)
//   * HEALPix nested pixelization via bit-interleave lookup
//     (ref: src/toast/_libtoast/ops_pixels_healpix.cpp:42-430)
//   * IQU Stokes weights from the orientation angle
//     (ref: src/toast/_libtoast/ops_stokes_weights.cpp)
//   * noise-weighted map + inverse-covariance accumulation (scatter-add)
//     (ref: src/libtoast/src/toast_map_cov.cpp:14-203)
//   * Threefry2x64 counter RNG + Box-Muller gaussian
//     (ref: src/libtoast/src/toast_math_rng.cpp, vendored Random123)
//   * PCG iteration ops: offset-template expand, map scan-subtract,
//     noise weight, baseline projection
//     (ref: src/libtoast/src/toast_template_offset.cpp:12-40,
//      src/toast/_libtoast/ops_scan_map.cpp)
//
// Compiled -O3 -march=native and run by
// toast_tpu/scripts/measure_baseline.py, which combines these per-stage
// timings (plus a numpy-FFT noise-synthesis timing) into a measured
// samples/node-second for "reference-like CPU code on this host".
//
// Output: one line per stage, "<name> <ns_per_det_sample>".

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

using std::uint64_t;

static double now() {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

// ---------------------------------------------------------------- threefry
static inline void threefry2x64(uint64_t k0, uint64_t k1, uint64_t c0,
                                uint64_t c1, uint64_t out[2]) {
    static const int R[8] = {16, 42, 12, 31, 16, 32, 24, 21};
    uint64_t ks2 = 0x1BD11BDAA9FC1A22ULL ^ k0 ^ k1;
    uint64_t x0 = c0 + k0, x1 = c1 + k1;
    const uint64_t ks[3] = {k0, k1, ks2};
    for (int round = 0; round < 20; ++round) {
        int r = R[round % 8];
        x0 += x1;
        x1 = (x1 << r) | (x1 >> (64 - r));
        x1 ^= x0;
        if ((round + 1) % 4 == 0) {
            int s = (round + 1) / 4;
            x0 += ks[s % 3];
            x1 += ks[(s + 1) % 3] + (uint64_t)s;
        }
    }
    out[0] = x0;
    out[1] = x1;
}

// ------------------------------------------------------------------ qarray
static inline void qmult(const double *p, const double *q, double *r) {
    r[0] = p[0] * q[3] + p[1] * q[2] - p[2] * q[1] + p[3] * q[0];
    r[1] = -p[0] * q[2] + p[1] * q[3] + p[2] * q[0] + p[3] * q[1];
    r[2] = p[0] * q[1] - p[1] * q[0] + p[2] * q[3] + p[3] * q[2];
    r[3] = -p[0] * q[0] - p[1] * q[1] - p[2] * q[2] + p[3] * q[3];
}

static inline void qrot_z(const double *q, double *v) {
    // rotate (0,0,1) by quaternion q
    double x = q[0], y = q[1], z = q[2], w = q[3];
    v[0] = 2.0 * (x * z + w * y);
    v[1] = 2.0 * (y * z - w * x);
    v[2] = 1.0 - 2.0 * (x * x + y * y);
}

static inline void qrot_x(const double *q, double *v) {
    double x = q[0], y = q[1], z = q[2], w = q[3];
    v[0] = 1.0 - 2.0 * (y * y + z * z);
    v[1] = 2.0 * (x * y + w * z);
    v[2] = 2.0 * (x * z - w * y);
}

// ----------------------------------------------------------------- healpix
static uint64_t utab[256];
static void hpix_init() {
    for (int m = 0; m < 256; ++m) {
        utab[m] = (m & 0x1) | ((m & 0x2) << 1) | ((m & 0x4) << 2) |
                  ((m & 0x8) << 3) | ((m & 0x10) << 4) | ((m & 0x20) << 5) |
                  ((m & 0x40) << 6) | ((m & 0x80) << 7);
    }
}

static inline int64_t hpix_xy2pix(int64_t x, int64_t y) {
    return utab[x & 0xff] | (utab[(x >> 8) & 0xff] << 16) |
           (utab[(x >> 16) & 0xff] << 32) | (utab[(x >> 24) & 0xff] << 48) |
           (utab[y & 0xff] << 1) | (utab[(y >> 8) & 0xff] << 17) |
           (utab[(y >> 16) & 0xff] << 33) | (utab[(y >> 24) & 0xff] << 49);
}

static inline int64_t vec2nest(int64_t nside, double vx, double vy, double vz) {
    static const double TWOINVPI = 2.0 / M_PI;
    double za = std::fabs(vz);
    double phi = std::atan2(vy, vx);
    if (phi < 0) phi += 2.0 * M_PI;
    double tt = phi * TWOINVPI;
    int64_t pix;
    if (za <= 2.0 / 3.0) {
        double temp1 = nside * (0.5 + tt);
        double temp2 = nside * 0.75 * vz;
        int64_t jp = (int64_t)(temp1 - temp2);
        int64_t jm = (int64_t)(temp1 + temp2);
        int64_t ifp = jp >> 63 ? 0 : jp / nside;
        int64_t ifm = jm / nside;
        int64_t face;
        if (ifp == ifm) face = (ifp & 3) + 4;
        else if (ifp < ifm) face = ifp & 3;
        else face = (ifm & 3) + 8;
        int64_t x = jm & (nside - 1);
        int64_t y = nside - (jp & (nside - 1)) - 1;
        pix = hpix_xy2pix(x, y) + face * nside * nside;
    } else {
        double tp = tt - std::floor(tt);
        double tmp = nside * std::sqrt(3.0 * (1.0 - za));
        int64_t jp = (int64_t)(tp * tmp);
        int64_t jm = (int64_t)((1.0 - tp) * tmp);
        if (jp >= nside) jp = nside - 1;
        if (jm >= nside) jm = nside - 1;
        int64_t face, x, y;
        if (vz >= 0) {
            face = (int64_t)tt & 3;
            x = nside - jm - 1;
            y = nside - jp - 1;
        } else {
            face = 8 + ((int64_t)tt & 3);
            x = jm;
            y = jp;
        }
        pix = hpix_xy2pix(x, y) + face * nside * nside;
    }
    return pix;
}

int main(int argc, char **argv) {
    int n_det = argc > 1 ? std::atoi(argv[1]) : 64;
    int64_t n_samp = argc > 2 ? std::atoll(argv[2]) : 262144;
    int64_t nside = argc > 3 ? std::atoll(argv[3]) : 512;
    int iters = argc > 4 ? std::atoi(argv[4]) : 10;
    int step_length = 6000;
    hpix_init();

    int64_t n_pix = 12 * nside * nside;
    int64_t nds = (int64_t)n_det * n_samp;

    // boresight quaternions (precomputed, like the reference's shared data)
    std::vector<double> bore(4 * n_samp);
    for (int64_t i = 0; i < n_samp; ++i) {
        double ang = 1e-4 * (double)i;
        bore[4 * i + 0] = 0.3 * std::sin(0.5 * ang);
        bore[4 * i + 1] = 0.3 * std::cos(0.5 * ang);
        bore[4 * i + 2] = 0.9 * std::sin(ang);
        bore[4 * i + 3] = 0.9 * std::cos(ang);
        double n = 0.0;
        for (int k = 0; k < 4; ++k) n += bore[4 * i + k] * bore[4 * i + k];
        n = 1.0 / std::sqrt(n);
        for (int k = 0; k < 4; ++k) bore[4 * i + k] *= n;
    }
    std::vector<double> fp(4 * n_det);
    for (int d = 0; d < n_det; ++d) {
        fp[4 * d + 0] = 0.01 * d;
        fp[4 * d + 1] = 0.005 * d;
        fp[4 * d + 2] = 0.0;
        fp[4 * d + 3] = 1.0;
        double n = 0.0;
        for (int k = 0; k < 4; ++k) n += fp[4 * d + k] * fp[4 * d + k];
        n = 1.0 / std::sqrt(n);
        for (int k = 0; k < 4; ++k) fp[4 * d + k] *= n;
    }

    std::vector<double> quats(4 * nds);
    std::vector<int64_t> pix(nds);
    std::vector<double> wts(3 * nds);
    std::vector<double> tod(nds);

    // ---- stage: RNG gaussian TOD (threefry + box-muller), ref rng.cpp
    double t0 = now();
    for (int d = 0; d < n_det; ++d) {
        uint64_t key0 = 0x1234, key1 = (uint64_t)d;
        for (int64_t i = 0; i < n_samp; i += 2) {
            uint64_t out[2];
            threefry2x64(key0, key1, (uint64_t)i, 0, out);
            double u1 = (out[0] >> 11) * (1.0 / 9007199254740992.0);
            double u2 = (out[1] >> 11) * (1.0 / 9007199254740992.0);
            double r = std::sqrt(-2.0 * std::log(u1 + 1e-300));
            tod[(int64_t)d * n_samp + i] = r * std::cos(2 * M_PI * u2);
            if (i + 1 < n_samp)
                tod[(int64_t)d * n_samp + i + 1] = r * std::sin(2 * M_PI * u2);
        }
    }
    double t_rng = now() - t0;

    // ---- stage: pointing expansion (quat mult), ref qarray.cpp:406
    t0 = now();
    for (int d = 0; d < n_det; ++d) {
        const double *fq = &fp[4 * d];
        for (int64_t i = 0; i < n_samp; ++i) {
            qmult(&bore[4 * i], fq, &quats[4 * ((int64_t)d * n_samp + i)]);
        }
    }
    double t_point = now() - t0;

    // ---- stage: healpix pixels + IQU weights, ref ops_pixels_healpix.cpp
    t0 = now();
    for (int d = 0; d < n_det; ++d) {
        for (int64_t i = 0; i < n_samp; ++i) {
            int64_t off = (int64_t)d * n_samp + i;
            const double *q = &quats[4 * off];
            double vd[3], vo[3];
            qrot_z(q, vd);
            qrot_x(q, vo);
            pix[off] = vec2nest(nside, vd[0], vd[1], vd[2]);
            double dir_ang = std::atan2(vd[1], vd[0]);
            double vm_z = -std::sqrt(1.0 - vd[2] * vd[2]);
            double vm_x = vd[2] * std::cos(dir_ang);
            double vm_y = vd[2] * std::sin(dir_ang);
            double ay = vd[0] * (vm_y * vo[2] - vm_z * vo[1]) -
                        vd[1] * (vm_x * vo[2] - vm_z * vo[0]) +
                        vd[2] * (vm_x * vo[1] - vm_y * vo[0]);
            double ax = vm_x * vo[0] + vm_y * vo[1] + vm_z * vo[2];
            double ang = 2.0 * std::atan2(ay, ax);
            wts[3 * off + 0] = 1.0;
            wts[3 * off + 1] = std::cos(ang);
            wts[3 * off + 2] = -std::sin(ang);
        }
    }
    double t_pixwts = now() - t0;

    // ---- stage: zmap + invnpp accumulation, ref toast_map_cov.cpp:97
    std::vector<double> zmap(3 * n_pix, 0.0);
    std::vector<double> invnpp(6 * n_pix, 0.0);
    std::vector<int64_t> hits(n_pix, 0);
    t0 = now();
    for (int d = 0; d < n_det; ++d) {
        for (int64_t i = 0; i < n_samp; ++i) {
            int64_t off = (int64_t)d * n_samp + i;
            int64_t p = pix[off];
            const double *w = &wts[3 * off];
            double v = tod[off];
            zmap[3 * p + 0] += w[0] * v;
            zmap[3 * p + 1] += w[1] * v;
            zmap[3 * p + 2] += w[2] * v;
            double *c = &invnpp[6 * p];
            c[0] += w[0] * w[0];
            c[1] += w[0] * w[1];
            c[2] += w[0] * w[2];
            c[3] += w[1] * w[1];
            c[4] += w[1] * w[2];
            c[5] += w[2] * w[2];
            hits[p] += 1;
        }
    }
    double t_accum = now() - t0;

    // ---- stage: one PCG iteration's TOD ops, ref template_offset.cpp +
    //      ops_scan_map.cpp: expand amplitudes, scan-subtract binned map,
    //      noise weight, project back onto baselines.
    int64_t n_base = (n_samp + step_length - 1) / step_length;
    std::vector<double> amps(n_det * n_base, 0.01);
    std::vector<double> proj(n_det * n_base, 0.0);
    std::vector<double> resid(n_samp);
    t0 = now();
    for (int it = 0; it < iters; ++it) {
        for (int d = 0; d < n_det; ++d) {
            double *pr = &proj[(int64_t)d * n_base];
            const double *am = &amps[(int64_t)d * n_base];
            for (int64_t b = 0; b < n_base; ++b) pr[b] = 0.0;
            for (int64_t i = 0; i < n_samp; ++i) {
                int64_t off = (int64_t)d * n_samp + i;
                int64_t p = pix[off];
                const double *w = &wts[3 * off];
                // template expand + scan-subtract + noise weight
                double r = am[i / step_length] -
                           (w[0] * zmap[3 * p + 0] + w[1] * zmap[3 * p + 1] +
                            w[2] * zmap[3 * p + 2]);
                r *= 0.25;  // det weight
                pr[i / step_length] += r;
            }
        }
    }
    double t_solve = now() - t0;

    double per = 1.0e9 / (double)nds;
    std::printf("rng %.3f\n", t_rng * per);
    std::printf("pointing %.3f\n", t_point * per);
    std::printf("pixweights %.3f\n", t_pixwts * per);
    std::printf("accum %.3f\n", t_accum * per);
    std::printf("solve_per_iter %.3f\n", t_solve * per / iters);
    std::printf("iters %d\n", iters);
    // prevent dead-code elimination
    double sink = zmap[0] + invnpp[0] + proj[0] + (double)hits[0];
    if (sink == 42.12345) std::printf("# %f\n", sink);
    return 0;
}
