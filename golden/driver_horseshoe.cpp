// Standalone driver for the UNMODIFIED reference HorseshoeR
// (/root/reference/src/HorseshoeR.cpp).  Compiled with -fopenmp (see
// driver_groups.cpp).
//
// argv: input.bin output.csv max_iter burn_in thinning A v0E s02E vL vT c2 vC sC
// input.bin: i64 N, M, X (N*M), Y (N)
#include GRAFT_REF_SAMPLER

#include "driver_io.h"

int main(int argc, char** argv) {
  if (argc != 14) { std::fprintf(stderr, "bad argv\n"); return 1; }
  BinReader in(argv[1]);
  long N = in.i64(), M = in.i64();
  Eigen::MatrixXd X = in.mat(N, M);
  Eigen::VectorXd Y = in.vec(N);
  HorseshoeR(argv[2], 0, atoi(argv[3]), atoi(argv[4]), atoi(argv[5]),
             X, Y, atof(argv[6]), atof(argv[7]), atof(argv[8]),
             atof(argv[9]), atof(argv[10]), atof(argv[11]), atof(argv[12]),
             atof(argv[13]));
  return 0;
}
