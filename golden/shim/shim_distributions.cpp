// Traced deterministic RNG backing the golden-parity harness.
//
// Every draw the reference sampler makes is (a) generated from a
// deterministic splittable stream (std::mt19937_64, seed = GRAFT_SEED env,
// default 1), and (b) appended to the GRAFT_TRACE file as
//   <tag> <args...> <value(s)...>      (all %.17g)
// so the Python tape-mirror can assert the reference's distribution ARGS
// against its own and replay the exact same VALUES (tests/golden_cpp.py).
//
// The laws only need to be plausible (both sides consume the recorded
// value); the scale/rate conventions follow the reference's
// distributions.cpp:12-64 so the chains behave like real runs.
#include <cstdio>
#include <cstdlib>
#include <random>

#include "graft_shim.h"

namespace {

std::mt19937_64& rng() {
  static std::mt19937_64 g = [] {
    const char* s = std::getenv("GRAFT_SEED");
    return std::mt19937_64(s ? std::strtoull(s, nullptr, 10) : 1ull);
  }();
  return g;
}

std::FILE* trace() {
  static std::FILE* f = [] {
    const char* p = std::getenv("GRAFT_TRACE");
    return p ? std::fopen(p, "w") : nullptr;
  }();
  return f;
}

void log1(const char* tag, double a, double b, double v) {
  if (std::FILE* f = trace())
    std::fprintf(f, "%s %.17g %.17g %.17g\n", tag, a, b, v);
}

double gamma_draw(double shape, double scale) {
  std::gamma_distribution<double> g(shape, scale);
  return g(rng());
}

}  // namespace

uint64_t graft_next_u64() { return rng()(); }

void graft_trace_perm(const int* begin, long n) {
  if (std::FILE* f = trace()) {
    std::fprintf(f, "perm %ld", n);
    for (long i = 0; i < n; ++i) std::fprintf(f, " %d", begin[i]);
    std::fprintf(f, "\n");
  }
}

double norm_rng(double mu, double sigma2) {
  std::normal_distribution<double> d(0.0, 1.0);
  double v = mu + std::sqrt(sigma2) * d(rng());
  log1("norm", mu, sigma2, v);
  return v;
}

double beta_rng(double a, double b) {
  double x = gamma_draw(a, 1.0), y = gamma_draw(b, 1.0);
  double v = x / (x + y);
  log1("beta", a, b, v);
  return v;
}

double inv_gamma_rng(double shape, double scale) {
  double v = scale / gamma_draw(shape, 1.0);
  log1("ig", shape, scale, v);
  return v;
}

double gamma_rng(double shape, double scale) {
  double v = gamma_draw(shape, scale);
  log1("gam", shape, scale, v);
  return v;
}

double inv_gamma_rate_rng(double shape, double rate) {
  double v = rate / gamma_draw(shape, 1.0);
  log1("igr", shape, rate, v);
  return v;
}

double gamma_rate_rng(double shape, double rate) {
  double v = gamma_draw(shape, 1.0 / rate);
  log1("gamr", shape, rate, v);
  return v;
}

double inv_scaled_chisq_rng(double dof, double scale) {
  // reference convention: invGamma(0.5*dof, 0.5*dof*scale)
  // (src/distributions.cpp:34-36)
  double v = (0.5 * dof * scale) / gamma_draw(0.5 * dof, 1.0);
  log1("isc", dof, scale, v);
  return v;
}

double exp_rng(double a) {
  std::exponential_distribution<double> d(a);
  double v = d(rng());
  log1("exp", a, 0.0, v);
  return v;
}

double component_probs(double, Eigen::VectorXd) { return 0.0; }  // dead code
double categorical(Eigen::VectorXd) { return 0.0; }              // dead code

Eigen::VectorXd dirichilet_rng(Eigen::VectorXd alpha) {
  long K = alpha.size();
  Eigen::VectorXd out(K, 1);
  double tot = 0.0;
  for (long k = 0; k < K; ++k) {
    out[k] = gamma_draw(alpha[k], 1.0);
    tot += out[k];
  }
  for (long k = 0; k < K; ++k) out[k] /= tot;
  if (std::FILE* f = trace()) {
    std::fprintf(f, "dir %ld", K);
    for (long k = 0; k < K; ++k) std::fprintf(f, " %.17g", alpha[k]);
    for (long k = 0; k < K; ++k) std::fprintf(f, " %.17g", out[k]);
    std::fprintf(f, "\n");
  }
  return out;
}

namespace R {
double runif(double lo, double hi) {
  std::uniform_real_distribution<double> d(lo, hi);
  double v = d(rng());
  log1("runif", lo, hi, v);
  return v;
}
}  // namespace R
