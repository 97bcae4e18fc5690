// Tiny binary input reader shared by the golden drivers: the Python side
// (tests/golden_cpp.py) writes little-endian int64 dims + f64 arrays in a
// fixed per-driver order.
#pragma once
#include <Eigen/Core>
#include <cstdint>
#include <cstdio>
#include <cstdlib>

struct BinReader {
  std::FILE* f;
  explicit BinReader(const char* path) : f(std::fopen(path, "rb")) {
    if (!f) { std::fprintf(stderr, "cannot open %s\n", path); std::exit(2); }
  }
  ~BinReader() { if (f) std::fclose(f); }
  int64_t i64() {
    int64_t v = 0;
    if (std::fread(&v, sizeof v, 1, f) != 1) std::exit(3);
    return v;
  }
  void doubles(double* dst, long n) {
    if (n && std::fread(dst, sizeof(double), (size_t)n, f) != (size_t)n)
      std::exit(3);
  }
  Eigen::MatrixXd mat(long r, long c) {  // column-major f64
    Eigen::MatrixXd m(r, c);
    doubles(&m.d[0], r * c);
    return m;
  }
  Eigen::VectorXd vec(long n) { return mat(n, 1); }
  Eigen::VectorXi ivec(long n) {  // stored as f64 on disk
    Eigen::VectorXd v = vec(n);
    Eigen::VectorXi out(n);
    for (long i = 0; i < n; ++i) out(i) = (int)v[i];
    return out;
  }
};
