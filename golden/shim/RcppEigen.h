// RcppEigen shim for the golden-parity harness (see golden/README.md).
#pragma once
#include <Eigen/Core>

namespace RcppEigen {}
