"""Build the golden-parity reference binaries.

Compiles the UNMODIFIED reference translation units from
``$GRAFT_REF/src`` (default /root/reference/src) against the shim layer
(golden/shim: mini-Eigen, Rcpp stubs, traced deterministic RNG).  Nothing
from the reference tree is ever copied into this repository -- the drivers
``#include`` the reference sources by absolute path at compile time.

Usage: python golden/build.py [outdir]   (default golden/build, gitignored)
Importable: build_all(outdir) -> {name: binary_path} or None if the
reference tree / toolchain is unavailable (tests skip).
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REF = os.environ.get("GRAFT_REF", "/root/reference")

DRIVERS = {
    # name -> (driver file, reference TU, needs_openmp)
    #
    # bayesr/groups/grstart compile WITHOUT -fopenmp: their emission sites
    # carry an `#ifdef _OPENMP / #else` inline-writer branch (enqueue +
    # immediate try_dequeue + write, e.g. src/BayesRv2Groups.cpp:322-329)
    # that is single-threaded and drops nothing -- the OpenMP
    # producer/consumer split instead races (the consumer exits as soon as
    # flag==1 WITHOUT draining, src/BayesRv2Groups.cpp:340-355, and on a
    # small box can drop every row).  HorseshoeR has no inline-writer
    # branch (its consumer section alone opens the file and writes the
    # header, src/HorseshoeR.cpp:271-297), so it must keep OpenMP and the
    # test runs a long-enough chain that the consumer wakes while the
    # producer still runs.
    "bayesr": ("driver_bayesr.cpp", "BayesRv2.cpp", False),
    "groups": ("driver_groups.cpp", "BayesRv2Groups.cpp", False),
    "grstart": ("driver_grstart.cpp", "BRv2Grstart.cpp", False),
    "horseshoe": ("driver_horseshoe.cpp", "HorseshoeR.cpp", True),
}


def build_all(outdir: str | None = None, verbose: bool = False,
              opt: bool = False):
    """``opt=True`` builds TIMING binaries (-O3 -march=native, separate
    outdir): same unmodified reference TUs, used by bench.py to measure the
    actual reference per-SNP-update rate (BASELINE.md configs 1-3) instead
    of a NumPy proxy."""
    outdir = outdir or os.path.join(HERE, "build_opt" if opt else "build")
    gxx = shutil.which("g++")
    ref_src = os.path.join(REF, "src")
    if gxx is None or not os.path.isdir(ref_src):
        return None
    os.makedirs(outdir, exist_ok=True)
    shim = os.path.join(HERE, "shim")
    out = {}
    stamp = os.path.join(outdir, "stamp")
    srcs = [os.path.join(shim, f) for f in
            ("graft_shim.h", "shim_distributions.cpp", "Rcpp.h",
             "RcppEigen.h", "driver_io.h", "Eigen/Core")]
    srcs += [os.path.join(HERE, d[0]) for d in DRIVERS.values()]
    newest = max(os.path.getmtime(p) for p in srcs)
    # exclusive build lock: parallel pytest-xdist workers may call
    # build_all concurrently; without it two compilers race on the same
    # -o binary.  Freshness is re-checked after acquisition.
    import fcntl
    lockf = open(os.path.join(outdir, ".lock"), "w")
    fcntl.flock(lockf, fcntl.LOCK_EX)
    try:
        return _build_locked(outdir, shim, out, stamp, newest, opt, verbose)
    finally:
        fcntl.flock(lockf, fcntl.LOCK_UN)
        lockf.close()


def _build_locked(outdir, shim, out, stamp, newest, opt, verbose):
    gxx = shutil.which("g++")
    ref_src = os.path.join(REF, "src")
    fresh = os.path.exists(stamp) and os.path.getmtime(stamp) >= newest
    opt_flags = (["-O3", "-march=native", "-DNDEBUG"] if opt else ["-O1"])
    for name, (driver, ref_tu, omp) in DRIVERS.items():
        binary = os.path.join(outdir, f"ref_{name}")
        out[name] = binary
        if fresh and os.path.exists(binary):
            continue
        cmd = [
            gxx, *opt_flags, "-std=c++14", "-w",
            "-I", shim, "-include", os.path.join(shim, "graft_shim.h"),
            f"-DGRAFT_REF_SAMPLER=\"{os.path.join(ref_src, ref_tu)}\"",
            os.path.join(HERE, driver),
            os.path.join(shim, "shim_distributions.cpp"),
            "-o", binary,
        ]
        if omp:
            cmd.insert(1, "-fopenmp")
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            if verbose:
                sys.stderr.write(r.stderr)
            raise RuntimeError(
                f"golden build failed for {name}:\n{r.stderr[-4000:]}")
    with open(stamp, "w") as f:
        f.write("ok\n")
    return out


if __name__ == "__main__":
    res = build_all(sys.argv[1] if len(sys.argv) > 1 else None, verbose=True)
    print(res)
