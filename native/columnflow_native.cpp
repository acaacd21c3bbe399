// columnflow native host engine.
//
// The TPU owns the compute path (JAX/XLA/Pallas); this library owns the
// host-side work that should overlap with device execution: dataset
// generation (the Wong-Wang decision-model simulator, the reference's
// host hot loop: src/ww_model.py:91-125) and counter-based Brownian
// sampling (the role torchsde delegates to its C++ _brownian_lib).
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libcolumnflow_native.so \
//            columnflow_native.cpp

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// Philox4x32-10 counter-based RNG: noise as a pure function of (key, counter),
// matching the reproducibility contract of the JAX (threefry) path.
// ---------------------------------------------------------------------------

static inline void philox_round(uint32_t* ctr, const uint32_t* key) {
    const uint64_t M0 = 0xD2511F53ull, M1 = 0xCD9E8D57ull;
    uint64_t p0 = M0 * ctr[0];
    uint64_t p1 = M1 * ctr[2];
    uint32_t c0 = (uint32_t)(p1 >> 32) ^ ctr[1] ^ key[0];
    uint32_t c1 = (uint32_t)p1;
    uint32_t c2 = (uint32_t)(p0 >> 32) ^ ctr[3] ^ key[1];
    uint32_t c3 = (uint32_t)p0;
    ctr[0] = c0; ctr[1] = c1; ctr[2] = c2; ctr[3] = c3;
}

static inline void philox10(uint32_t* ctr, uint32_t k0, uint32_t k1) {
    uint32_t key[2] = {k0, k1};
    const uint32_t W0 = 0x9E3779B9u, W1 = 0xBB67AE85u;
    for (int i = 0; i < 10; ++i) {
        philox_round(ctr, key);
        key[0] += W0; key[1] += W1;
    }
}

// Two standard normals from four uniform words (Box-Muller).
static inline void box_muller(const uint32_t* w, double* z) {
    const double TWO_PI = 6.283185307179586;
    double u1 = ((double)w[0] + 0.5) * (1.0 / 4294967296.0);
    double u2 = ((double)w[1] + 0.5) * (1.0 / 4294967296.0);
    double r = std::sqrt(-2.0 * std::log(u1));
    z[0] = r * std::cos(TWO_PI * u2);
    z[1] = r * std::sin(TWO_PI * u2);
}

// Fill out[0..n) with N(0,1), keyed by (key, counter offset). Pure function.
void cf_normal_fill(double* out, int64_t n, uint64_t key, uint64_t offset) {
    for (int64_t i = 0; i < n; i += 2) {
        uint64_t c = offset + (uint64_t)(i / 2);
        uint32_t ctr[4] = {(uint32_t)c, (uint32_t)(c >> 32), 0u, 0u};
        philox10(ctr, (uint32_t)key, (uint32_t)(key >> 32));
        double z[2];
        box_muller(ctr, z);
        out[i] = z[0];
        if (i + 1 < n) out[i + 1] = z[1];
    }
}

// Brownian increments dW_i ~ N(0, dt), one path of n steps.
void cf_brownian_increments(double* out, int64_t n, double dt, uint64_t key) {
    cf_normal_fill(out, n, key, 0);
    double s = std::sqrt(dt);
    for (int64_t i = 0; i < n; ++i) out[i] *= s;
}

// ---------------------------------------------------------------------------
// Wong-Wang (2006) two-pool decision model, plain-Euler update exactly as the
// reference executes it (src/ww_model.py:91-101; the exponential-Euler
// factors it constructs are never used).
// ---------------------------------------------------------------------------

static inline double ww_f(double x) {
    double num = 270.0 * x - 108.0;
    double den = 1.0 - std::exp(-0.154 * num);
    if (std::fabs(den) < 1e-12) return 1.0 / 0.154;
    return num / den;
}

// Simulate one sample through three phases (pre / stim / post), recording
// rates after each update. out: (3 * steps_per_phase, 2) row-major.
void cf_ww_three_phase(double* out, int64_t steps_per_phase, double mu_a,
                       double mu_b, double dt, double sigma_noise,
                       uint64_t key) {
    const double gamma = 0.641, tau_s = 0.1, tau_ampa = 0.002;
    const double Jw = 0.2609, Jb = 0.0497, Jext = 5.2e-4, I0 = 0.3255;
    double s0 = 0.1, s1 = 0.1;
    double n0 = 0.0, n1 = 0.0;
    double dsig = std::sqrt(dt / tau_ampa) * sigma_noise;

    int64_t total = 3 * steps_per_phase;
    // Noise buffer (cheap even when sigma == 0 keeps paths key-stable).
    double* noise = nullptr;
    double zbuf[2] = {0.0, 0.0};
    int64_t idx = 0;
    for (int64_t t = 0; t < total; ++t) {
        int phase = (int)(t / steps_per_phase);
        double ma = (phase == 1) ? mu_a : 0.0;
        double mb = (phase == 1) ? mu_b : 0.0;
        double xi0 = 0.0, xi1 = 0.0;
        if (sigma_noise != 0.0) {
            uint32_t ctr[4] = {(uint32_t)t, (uint32_t)(t >> 32), 0u, 1u};
            philox10(ctr, (uint32_t)key, (uint32_t)(key >> 32));
            box_muller(ctr, zbuf);
            xi0 = dsig * zbuf[0];
            xi1 = dsig * zbuf[1];
        }
        double i_rec0 = Jw * s0 - Jb * s1;
        double i_rec1 = -Jb * s0 + Jw * s1;
        n0 += dt * (I0 - n0) / tau_ampa + xi0;
        n1 += dt * (I0 - n1) / tau_ampa + xi1;
        double r0 = ww_f(i_rec0 + Jext * ma + n0);
        double r1 = ww_f(i_rec1 + Jext * mb + n1);
        s0 += dt * (-s0 / tau_s + (1.0 - s0) * gamma * r0);
        s1 += dt * (-s1 / tau_s + (1.0 - s1) * gamma * r1);
        out[idx++] = r0;
        out[idx++] = r1;
    }
    (void)noise;
}

// Batched dataset generation with x10 downsampling and truncation, exactly
// the reference's pipeline (scripts/wta_ode.py:84-90): per sample, simulate
// three phases, take every 10th step, keep time_steps rows.
// out: (n_samples, time_steps, 2) row-major; mu: (n_samples, 2).
void cf_ww_dataset(double* out, const double* mu, int64_t n_samples,
                   int64_t steps_per_phase, int64_t time_steps, double dt,
                   double sigma_noise, uint64_t key) {
    int64_t total = 3 * steps_per_phase;
    double* buf = new double[total * 2];
    for (int64_t s = 0; s < n_samples; ++s) {
        cf_ww_three_phase(buf, steps_per_phase, mu[2 * s], mu[2 * s + 1], dt,
                          sigma_noise, key + (uint64_t)s);
        for (int64_t i = 0; i < time_steps; ++i) {
            out[(s * time_steps + i) * 2 + 0] = buf[(i * 10) * 2 + 0];
            out[(s * time_steps + i) * 2 + 1] = buf[(i * 10) * 2 + 1];
        }
    }
    delete[] buf;
}

}  // extern "C"
