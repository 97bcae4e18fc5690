// Standalone driver for the UNMODIFIED reference BayesRSamplerV2Groups
// (/root/reference/src/BayesRv2Groups.cpp).  Compiled WITHOUT OpenMP so
// the sampler's `#else` inline-writer branch runs (enqueue + immediate
// dequeue + write, src/BayesRv2Groups.cpp:322-329): single-threaded,
// deterministic, no consumer tail-drop race (src/BayesRv2Groups.cpp:340-355).
//
// argv: input.bin output.csv max_iter burn_in thinning sigma0 v0E s02E v0G s02G
// input.bin: i64 N, M, G, Km1, F, X (N*M), Y (N), cva (G*Km1 col-major),
//            gAssign (M, f64), fixed (N*F)
#include GRAFT_REF_SAMPLER

#include "driver_io.h"

int main(int argc, char** argv) {
  if (argc != 11) { std::fprintf(stderr, "bad argv\n"); return 1; }
  BinReader in(argv[1]);
  long N = in.i64(), M = in.i64(), G = in.i64(), Km1 = in.i64(), F = in.i64();
  Eigen::MatrixXd X = in.mat(N, M);
  Eigen::VectorXd Y = in.vec(N);
  Eigen::MatrixXd cva = in.mat(G, Km1);
  Eigen::VectorXi gAssign = in.ivec(M);
  Eigen::MatrixXd fixed = in.mat(N, F);
  BayesRSamplerV2Groups(argv[2], 0, atoi(argv[3]), atoi(argv[4]),
                        atoi(argv[5]), X, Y, atof(argv[6]), atof(argv[7]),
                        atof(argv[8]), atof(argv[9]), atof(argv[10]),
                        cva, (int)G, gAssign, fixed);
  return 0;
}
