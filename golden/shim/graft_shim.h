// Pre-included (g++ -include) ahead of every reference translation unit.
//
// Purpose: compile the UNMODIFIED reference samplers
// (/root/reference/src/*.cpp) standalone, with every random draw routed
// through a deterministic, TRACED stream (SURVEY.md "hard part (b)"):
//
// - defines the reference's own include guard `distributions_H` so its
//   distributions.h / distributions.cpp are never used; the declarations
//   below match it and the implementations (shim_distributions.cpp) log
//   every call's (tag, args, value) to the GRAFT_TRACE file;
// - rewrites std::random_shuffle (removed in C++17 and RNG-unspecified
//   anyway) to a traced Fisher-Yates whose resulting permutation is logged,
//   so the Python tape-mirror replays the exact marker order
//   (src/BayesRv2.cpp:182).
#pragma once
#define distributions_H 1

#include <Eigen/Core>
#include <cstdint>

Eigen::VectorXd dirichilet_rng(Eigen::VectorXd alpha);
double inv_gamma_rng(double shape, double scale);
double gamma_rng(double shape, double scale);
double inv_gamma_rate_rng(double shape, double rate);
double gamma_rate_rng(double shape, double rate);
double inv_scaled_chisq_rng(double dof, double scale);
double norm_rng(double mu, double sigma2);
double component_probs(double b, Eigen::VectorXd pi);
double categorical(Eigen::VectorXd probs);
double beta_rng(double a, double b);
double exp_rng(double a);

// traced-shuffle plumbing (shim_distributions.cpp)
uint64_t graft_next_u64();
void graft_trace_perm(const int* begin, long n);

#define random_shuffle graft_random_shuffle
namespace std {
// injected shuffle: deterministic Fisher-Yates + permutation trace.
// (Injecting into std is formally UB but is the only way to intercept the
// reference's qualified std::random_shuffle call without editing it.)
template <class It>
inline void graft_random_shuffle(It first, It last) {
  long n = (long)(last - first);
  for (long i = n - 1; i > 0; --i) {
    long j = (long)(graft_next_u64() % (uint64_t)(i + 1));
    auto tmp = first[i];
    first[i] = first[j];
    first[j] = tmp;
  }
  graft_trace_perm(n ? &first[0] : (const int*)nullptr, n);
}
}  // namespace std
