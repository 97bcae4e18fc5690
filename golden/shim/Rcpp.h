// Rcpp shim for the golden-parity harness: just enough for the reference
// samplers to compile standalone (no R).  Rcout/Rcerr map to std streams;
// R::runif draws from the traced deterministic stream (graft_shim.h).
#pragma once
// transitive includes the samplers rely on Rcpp.h providing
#include <algorithm>
#include <chrono>
#include <cmath>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

namespace Rcpp {
using std::endl;
static std::ostream& Rcout = std::cout;
static std::ostream& Rcerr = std::cerr;
}  // namespace Rcpp

namespace R {
double runif(double lo, double hi);  // traced; defined in shim_distributions.cpp
}
