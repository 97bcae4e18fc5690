// Standalone driver for the UNMODIFIED reference BayesRSamplerV2
// (/root/reference/src/BayesRv2.cpp, included verbatim below -- never
// copied into this repo).  Compiled WITHOUT OpenMP so the sampler's
// non-OpenMP inline-writer path runs (no producer/consumer tail-drop,
// src/BayesRv2.cpp:279-289).
//
// argv: input.bin output.csv max_iter burn_in thinning sigma0 v0E s02E v0G s02G
// input.bin: i64 N, i64 M, i64 K-1, X (N*M f64 col-major), Y (N), cva (K-1)
#include GRAFT_REF_SAMPLER

#include "driver_io.h"

int main(int argc, char** argv) {
  if (argc != 11) { std::fprintf(stderr, "bad argv\n"); return 1; }
  BinReader in(argv[1]);
  long N = in.i64(), M = in.i64(), Km1 = in.i64();
  Eigen::MatrixXd X = in.mat(N, M);
  Eigen::VectorXd Y = in.vec(N);
  Eigen::VectorXd cva = in.vec(Km1);
  BayesRSamplerV2(argv[2], 0, atoi(argv[3]), atoi(argv[4]), atoi(argv[5]),
                  X, Y, atof(argv[6]), atof(argv[7]), atof(argv[8]),
                  atof(argv[9]), atof(argv[10]), cva);
  return 0;
}
