// Standalone driver for the UNMODIFIED reference BRV2Grstart
// (/root/reference/src/BRv2Grstart.cpp).  Compiled WITHOUT OpenMP so the
// inline-writer branch runs (see driver_groups.cpp).
//
// argv: input.bin output.csv max_iter burn_in thinning sigma0 v0E s02E v0G s02G
// input.bin: i64 N, M, G, Km1, mu (1), beta (M), sigmaE (1), sigmaGG (G),
//            X (N*M), epsilon (N), components (M), cva (G*Km1),
//            gAssign (M, f64)
#include GRAFT_REF_SAMPLER

#include "driver_io.h"

int main(int argc, char** argv) {
  if (argc != 11) { std::fprintf(stderr, "bad argv\n"); return 1; }
  BinReader in(argv[1]);
  long N = in.i64(), M = in.i64(), G = in.i64(), Km1 = in.i64();
  double mu;
  in.doubles(&mu, 1);
  Eigen::MatrixXd beta = in.mat(M, 1);
  double sigmaE;
  in.doubles(&sigmaE, 1);
  Eigen::VectorXd sigmaGG = in.vec(G);
  Eigen::MatrixXd X = in.mat(N, M);
  Eigen::VectorXd epsilon = in.vec(N);
  Eigen::VectorXd components = in.vec(M);
  Eigen::MatrixXd cva = in.mat(G, Km1);
  Eigen::VectorXi gAssign = in.ivec(M);
  BRV2Grstart(argv[2], 0, atoi(argv[3]), atoi(argv[4]), atoi(argv[5]),
              mu, beta, sigmaE, sigmaGG, X, epsilon, components,
              atof(argv[6]), atof(argv[7]), atof(argv[8]), atof(argv[9]),
              atof(argv[10]), cva, (int)G, gAssign);
  return 0;
}
