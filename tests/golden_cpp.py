"""Golden-parity harness against the COMPILED reference samplers.

Closes SURVEY.md "hard part (b)": the unmodified reference translation
units (/root/reference/src/*.cpp) are compiled standalone (golden/build.py;
mini-Eigen + traced deterministic RNG shim) and run on inputs written from
here.  Every random draw the C++ makes is logged as (tag, args, value); the
tape mirrors below re-derive each call's distribution ARGUMENTS from their
own state (asserting they match the C++'s to reassociation tolerance) and
replay the recorded VALUES, so both chains stay locked together and any
control-flow or formula divergence explodes immediately as a tag/args
mismatch.

Chain of evidence for parity: C++ reference == tape mirror (this module)
and numpy mirror == JAX backends (tests/test_golden_mirror.py); the tape
mirrors use the same reference-literal formulas as tests/numpy_mirror.py.
"""
from __future__ import annotations

import os
import struct
import subprocess
from typing import List, NamedTuple

import numpy as np


# ---------------------------------------------------------------- build/run

def build_binaries():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "golden"))
    from build import build_all  # golden/build.py

    return build_all()


def _write_bin(path, dims, arrays):
    with open(path, "wb") as f:
        for d in dims:
            f.write(struct.pack("<q", int(d)))
        for a in arrays:
            f.write(np.asarray(a, np.float64).tobytes(order="F"))


def run_ref(binary, inp, workdir, args, seed=1):
    csv = os.path.join(workdir, "out.csv")
    trace = os.path.join(workdir, "trace.txt")
    env = dict(os.environ, GRAFT_TRACE=trace, GRAFT_SEED=str(seed),
               OMP_NUM_THREADS="2")
    r = subprocess.run([binary, inp, csv] + [str(a) for a in args],
                       env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"reference binary failed:\n{r.stdout}\n{r.stderr}"
    return csv, trace


def read_csv_rows(path):
    """Parse the reference CSV into {iteration: np.ndarray(values)} --
    matching rows by iteration tolerates the reference's tail-drop race
    (src/BayesRv2.cpp:279-289)."""
    rows = {}
    with open(path) as f:
        header = f.readline()
        for line in f:
            line = line.strip()
            if not line:
                continue
            vals = np.array(line.split(","), np.float64)
            rows[int(vals[0])] = vals
    return header, rows


# --------------------------------------------------------------------- tape

class Rec(NamedTuple):
    tag: str
    args: tuple
    vals: tuple


def parse_trace(path) -> List[Rec]:
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            tag = parts[0]
            if tag == "perm":
                n = int(parts[1])
                out.append(Rec("perm", (n,), tuple(int(x) for x in parts[2:])))
            elif tag == "dir":
                k = int(parts[1])
                nums = [float(x) for x in parts[2:]]
                out.append(Rec("dir", tuple(nums[:k]), tuple(nums[k:])))
            else:
                nums = [float(x) for x in parts[1:]]
                out.append(Rec(tag, tuple(nums[:-1]), (nums[-1],)))
    return out


class Tape:
    """Sequential reader with argument cross-checking."""

    def __init__(self, records, rtol=1e-8, atol=1e-12):
        self.rec = records
        self.i = 0
        self.rtol = rtol
        self.atol = atol  # floor for exact-cancellation sums (e.g. eps.sum())
        self.max_arg_err = 0.0

    def take(self, tag, *args):
        r = self.rec[self.i]
        assert r.tag == tag, (f"draw #{self.i}: C++ made a {r.tag!r} draw, "
                              f"mirror expected {tag!r} {args}")
        self.i += 1
        for a_mine, a_cpp in zip(args, r.args):
            if np.isnan(a_cpp):
                assert np.isnan(a_mine), f"draw #{self.i-1} {tag}: nan mismatch"
                continue
            tol = self.rtol * max(abs(a_cpp), abs(a_mine)) + self.atol
            err = abs(a_mine - a_cpp)
            self.max_arg_err = max(self.max_arg_err,
                                   err / max(abs(a_cpp), self.atol))
            assert err <= tol, (
                f"draw #{self.i-1} {tag}: arg mismatch mirror={a_mine!r} "
                f"cpp={a_cpp!r} diff={err:.3g}")
        return r.vals[0] if len(r.vals) == 1 else np.array(r.vals)

    def take_perm(self, n):
        r = self.rec[self.i]
        assert r.tag == "perm" and r.args[0] == n, f"draw #{self.i}: {r.tag}"
        self.i += 1
        return np.array(r.vals, np.int64)

    def take_dir(self, alpha):
        r = self.rec[self.i]
        assert r.tag == "dir", f"draw #{self.i}: {r.tag}, expected dir"
        self.i += 1
        np.testing.assert_allclose(np.asarray(alpha), np.array(r.args),
                                   rtol=self.rtol)
        return np.array(r.vals)

    def done(self):
        assert self.i == len(self.rec), \
            f"{len(self.rec) - self.i} unconsumed C++ draws"


# ----------------------------------------------------- shared marker update

def _marker_update(X, xsq, eps, beta, comp, j, pi_g, cva_g, sigmaE, sigmaG,
                   tape, p_tag):
    """Reference-literal per-marker update (src/BayesRv2.cpp:186-245),
    shared by the C1/C2/C3 tape mirrors.  Returns (eps, slab_beta_sq,
    k_selected or None)."""
    K = len(pi_g)
    xj = X[:, j]
    y_tilde = eps + xj * beta[j]
    num = float(xj @ y_tilde)
    denom = xsq[j] + (sigmaE / sigmaG) / cva_g
    muk = np.concatenate([[0.0], num / denom])
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        logL = np.log(pi_g)  # exact C++ std::log semantics (0 -> -inf, NaN)
        logL[1:] += (-0.5 * np.log((sigmaG / sigmaE) * xsq[j] * cva_g + 1.0)
                     + 0.5 * muk[1:] * num / sigmaE)
        p = tape.take(*p_tag)
        if np.any(np.abs(logL[1:] - logL[0]) > 700):
            acum = 0.0
        else:
            acum = 1.0 / np.exp(logL - logL[0]).sum()
        selected = None
        bsq = 0.0
        for k in range(K):
            if p <= acum:
                selected = k
                if k == 0:
                    beta[j] = 0.0
                else:
                    beta[j] = tape.take("norm", muk[k], sigmaE / denom[k - 1])
                    bsq = beta[j] ** 2
                comp[j] = k
                break
            if k + 1 == K:
                # the reference reads logL[K] out of bounds here
                # (src/BayesRv2.cpp:235 at k==K-1); the resulting acum
                # update is dead (loop exits), so skip it
                break
            if np.any(np.abs(logL[1:] - logL[k + 1]) > 700):
                acum += 0.0
            else:
                acum += 1.0 / np.exp(logL - logL[k + 1]).sum()
    eps = y_tilde - xj * beta[j]
    return eps, bsq, selected


# ------------------------------------------------------------ tape mirrors

def mirror_bayesr(X, Y, cva, hyps, max_iter, burn_in, thinning, tape):
    """Tape mirror of BayesRSamplerV2 (src/BayesRv2.cpp:60-280).
    Returns {iteration: row} in the reference CSV layout."""
    v0E, s02E, v0G, s02G = hyps
    N, M = X.shape
    K = len(cva) + 1
    xsq = np.array([float(X[:, j] @ X[:, j]) for j in range(M)])
    # priorPi is computed from cVa BEFORE cVa is assigned
    # (src/BayesRv2.cpp:150); with the shim's zero-init + padded reads that
    # is deterministically 0.5 * 0 / 0 = NaN on the slab entries
    pi = np.full(K, np.nan)
    pi[0] = 0.5
    beta = np.zeros(M)
    comp = np.zeros(M)
    mu = 0.0
    sigmaG = tape.take("beta", 1.0, 1.0)
    eps = Y - mu
    sigmaE = float(eps @ eps) / N * 0.5

    rows = {}
    for it in range(max_iter):
        eps = eps + mu
        mu = tape.take("norm", eps.sum() / N, sigmaE / N)
        eps = eps - mu
        order = tape.take_perm(M)
        v = np.zeros(K)
        for j in order:
            eps, _, sel = _marker_update(X, xsq, eps, beta, comp, j, pi, cva,
                                         sigmaE, sigmaG, tape,
                                         ("beta", 1.0, 1.0))
            if sel is not None:
                v[sel] += 1.0
        m0 = M - v[0]
        sigmaG = tape.take("isc", v0G + m0,
                           (float(beta @ beta) * m0 + v0G * s02G) / (v0G + m0))
        sigmaE = tape.take("isc", v0E + N,
                           (float(eps @ eps) + v0E * s02E) / (v0E + N))
        pi = tape.take_dir(v + 1.0)
        if it >= burn_in and it % thinning == 0:
            rows[it] = np.concatenate([[it, mu], beta, [sigmaE, sigmaG],
                                       comp, eps])
    return rows


def mirror_groups(X, Y, cva2, g_assign, fixed, hyps, max_iter, burn_in,
                  thinning, tape):
    """Tape mirror of BayesRSamplerV2Groups (src/BayesRv2Groups.cpp:75-357)."""
    v0E, s02E, v0G, s02G = hyps
    N, M = X.shape
    G, Km1 = cva2.shape
    K = Km1 + 1
    F = fixed.shape[1]
    xsq = np.array([float(X[:, j] @ X[:, j]) for j in range(M)])
    pi = np.full((G, K), 0.5 / K)
    pi[:, 0] = 0.5                       # src/BayesRv2Groups.cpp:170-175
    beta = np.zeros(M)
    alpha = np.zeros(F)
    comp = np.zeros(M)
    mu = 0.0
    sigmaGG = np.array([tape.take("beta", 1.0, 1.0) for _ in range(G)])
    sigmaF = tape.take("runif", 0.0, 1.0)
    eps = Y - mu                         # beta=0 (src/BayesRv2Groups.cpp:202)
    sigmaE = float(eps @ eps) / N * 0.5

    rows = {}
    for it in range(max_iter):
        eps = eps + mu
        mu = tape.take("norm", eps.sum() / N, sigmaE / N)
        eps = eps - mu
        # fixed-effect sweep (src/BayesRv2Groups.cpp:216-225); the C++
        # shuffles (and traces) fixedI even when F == 0
        forder = tape.take_perm(F)
        for c in forder:
            fc = fixed[:, c]
            y_t = eps + fc * alpha[c]
            denom_f = (N - 1) + sigmaE / sigmaF
            num_f = float(fc @ y_t)
            alpha[c] = tape.take("norm", num_f / denom_f, sigmaE / denom_f)
            eps = y_t - fc * alpha[c]
        order = tape.take_perm(M)
        v = np.zeros((G, K))
        bacc = np.zeros(G)
        for j in order:
            g = g_assign[j]
            eps, bsq, sel = _marker_update(
                X, xsq, eps, beta, comp, j, pi[g], cva2[g], sigmaE,
                sigmaGG[g], tape, ("runif", 0.0, 1.0))
            if sel is not None:
                v[g, sel] += 1.0
                bacc[g] += bsq
        sigmaF = tape.take("isc", v0E + F,
                           (float(alpha @ alpha) + v0E * s02E) / (v0E + F))
        sigmaE = tape.take("isc", v0E + N,
                           (float(eps @ eps) + v0E * s02E) / (v0E + N))
        for g in range(G):
            m0 = v[g].sum() - v[g, 0]
            sigmaGG[g] = tape.take(
                "isc", v0G + m0, (bacc[g] * m0 + v0G * s02G) / (v0G + m0))
            pi[g] = tape.take_dir(v[g] + 1.0)
        if it >= burn_in and it % thinning == 0:
            rows[it] = np.concatenate([[it, mu], beta, [sigmaE], comp,
                                       sigmaGG, eps, alpha, [sigmaF]])
    return rows


def mirror_grstart(X, start, cva2, g_assign, hyps, max_iter, burn_in,
                   thinning, tape):
    """Tape mirror of BRV2Grstart (src/BRv2Grstart.cpp:77-300): resumes a
    grouped chain from {mu, beta, sigmaE, sigmaGG, epsilon, components}."""
    v0E, s02E, v0G, s02G = hyps
    N, M = X.shape
    G, Km1 = cva2.shape
    K = Km1 + 1
    xsq = np.array([float(X[:, j] @ X[:, j]) for j in range(M)])
    mu = float(start["mu"])
    beta = np.array(start["beta"], float).copy()
    sigmaE = float(start["sigmaE"])
    sigmaGG = np.array(start["sigmaGG"], float).copy()
    eps = np.array(start["epsilon"], float).copy()
    comp = np.array(start["components"], float).copy()
    # pi re-drawn from the supplied component counts (src/BRv2Grstart.cpp:157-165)
    v = np.zeros((G, K))
    for i in range(M):
        v[g_assign[i], int(comp[i])] += 1.0
    pi = np.stack([tape.take_dir(v[g] + 1.0) for g in range(G)])

    rows = {}
    for it in range(max_iter):
        eps = eps + mu
        mu = tape.take("norm", eps.sum() / N, sigmaE / N)
        eps = eps - mu
        order = tape.take_perm(M)
        v = np.zeros((G, K))
        bacc = np.zeros(G)
        for j in order:
            g = g_assign[j]
            eps, bsq, sel = _marker_update(
                X, xsq, eps, beta, comp, j, pi[g], cva2[g], sigmaE,
                sigmaGG[g], tape, ("beta", 1.0, 1.0))
            if sel is not None:
                v[g, sel] += 1.0
                bacc[g] += bsq
        sigmaE = tape.take("isc", v0E + N,
                           (float(eps @ eps) + v0E * s02E) / (v0E + N))
        for g in range(G):
            m0 = v[g].sum() - v[g, 0]
            sigmaGG[g] = tape.take(
                "isc", v0G + m0, (bacc[g] * m0 + v0G * s02G) / (v0G + m0))
            pi[g] = tape.take_dir(v[g] + 1.0)
        if it >= burn_in and it % thinning == 0:
            rows[it] = np.concatenate([[it, mu], beta, [sigmaE], comp,
                                       sigmaGG, eps])
    return rows


def mirror_horseshoe(X, Y, params, max_iter, burn_in, thinning, tape):
    """Tape mirror of HorseshoeR (src/HorseshoeR.cpp:109-300).  Unlike
    C1-C3, beta is NOT tape-pinned (the C++ records norm(0,1) and combines
    it itself, src/HorseshoeR.cpp:234), so beta/eps drift at reassociation
    level between the two implementations."""
    A, v0E, s02E, vL, vT, c2, vC, sC = params
    N, M = X.shape
    beta = np.zeros(M)
    mu = 0.0
    _ = tape.take("beta", 1.0, 1.0)      # tau draw, overwritten at :192
    # v init: M igr draws, consumed then discarded by setOnes (:176-180)
    for _i in range(M):
        tape.take("igr", 0.5, 1.0)
    for _i in range(M):
        tape.take("igr", 0.5 * vL, vL * 1.0)
    v = np.ones(M)
    lam = np.ones(M)
    eps = Y - mu - X @ beta
    sigmaE = float(eps @ eps) / N * 0.5
    eta = tape.take("igr", 0.5, 1.0 / (sigmaE * A ** 2))
    tau = (1.0 / eta) * tape.take("igr", 0.5 * vT, vT)

    rows = {}
    for it in range(max_iter):
        eps = eps + mu
        mu = tape.take("norm", eps.sum() / N, sigmaE / N)
        eps = eps - mu
        order = tape.take_perm(M)
        eta = tape.take("igr", 0.5 + 0.5 * vT,
                        1.0 / (sigmaE * A * A) + vT / tau)
        v = np.array([tape.take("igr", 0.5 + 0.5 * vL, vL / lam[i] + 1.0)
                      for i in range(M)])
        for j in order:
            xj = X[:, j]
            y_t = eps + xj * beta[j]
            xsq_j = float(xj @ xj)       # recomputed per marker (:230,234)
            s_j = tau * c2 * lam[j] / (tau * lam[j] + c2)
            denom = xsq_j + sigmaE / s_j
            z = tape.take("norm", 0.0, 1.0)
            beta[j] = float(xj @ y_t) / denom + np.sqrt(sigmaE / denom) * z
            eps = y_t - xj * beta[j]
        lam = np.array([
            tape.take("igr", 0.5 + 0.5 * vL,
                      vL / v[i] + 0.5 * beta[i] * beta[i] * (1.0 / tau))
            for i in range(M)])
        tau = tape.take("igr", 0.5 * (M + vT),
                        vT / eta + 0.5 * float((beta ** 2 / lam).sum()))
        c2 = tape.take("igr", 0.5 * vC + 0.5 * M,
                       vC * sC * 0.5 + 0.5 * float(beta @ beta))
        sigmaE = tape.take("isc", v0E + N,
                           (float(eps @ eps) + v0E * s02E) / (v0E + N))
        if it >= burn_in and it % thinning == 0:
            rows[it] = np.concatenate([[it, mu], beta, [sigmaE, tau],
                                       lam, eps])
    return rows


# ----------------------------------------------------------- input writers

def write_bayesr_input(path, X, Y, cva):
    _write_bin(path, [X.shape[0], X.shape[1], len(cva)], [X, Y, cva])


def write_groups_input(path, X, Y, cva2, g_assign, fixed):
    _write_bin(path,
               [X.shape[0], X.shape[1], cva2.shape[0], cva2.shape[1],
                fixed.shape[1]],
               [X, Y, cva2, np.asarray(g_assign, float), fixed])


def write_grstart_input(path, X, start, cva2, g_assign):
    _write_bin(path, [X.shape[0], X.shape[1], cva2.shape[0], cva2.shape[1]],
               [[start["mu"]], start["beta"], [start["sigmaE"]],
                start["sigmaGG"], X, start["epsilon"], start["components"],
                cva2, np.asarray(g_assign, float)])


def write_horseshoe_input(path, X, Y):
    _write_bin(path, [X.shape[0], X.shape[1]], [X, Y])
