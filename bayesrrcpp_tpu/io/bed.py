"""PLINK .bed/.bim/.fam genotype reader.

The reference takes a dense R matrix and therefore tops out at RAM scale
(SURVEY.md section 5: a dense f64 biobank X is ~400 GB); real genotype data
ships in PLINK's 2-bit packed .bed format.  This reader decodes SNP-major
.bed files to additive dosages with optional mean-imputation of missing
calls and per-marker standardization (the reference expects centered/scaled
columns, vignettes/BayesRR.Rmd:81,92).

No external deps: pure NumPy bit-twiddling.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional

import numpy as np

_MAGIC = bytes([0x6C, 0x1B])
_SNP_MAJOR = 0x01

# 2-bit PLINK codes -> additive dosage of the A1 allele:
# 00 -> 2 (hom A1), 10 -> 1 (het), 11 -> 0 (hom A2), 01 -> missing
_DOSAGE = np.array([2.0, np.nan, 1.0, 0.0], np.float32)


class BedData(NamedTuple):
    X: np.ndarray            # (N, M) float32 dosages (standardized if asked)
    snp_ids: np.ndarray      # (M,) from .bim
    sample_ids: np.ndarray   # (N,) from .fam
    means: np.ndarray        # (M,) pre-standardization dosage means
    sds: np.ndarray          # (M,) pre-standardization dosage sds


def read_bed(prefix: str, *, standardize: bool = True,
             impute_missing: bool = True, dtype=np.float32) -> BedData:
    """Read `{prefix}.bed/.bim/.fam` into an (N, M) dosage matrix."""
    bim = _read_tsv_col(prefix + ".bim", 1)
    fam = _read_tsv_col(prefix + ".fam", 1)
    M, N = len(bim), len(fam)
    with open(prefix + ".bed", "rb") as f:
        header = f.read(3)
        if header[:2] != _MAGIC:
            raise ValueError(f"{prefix}.bed: bad magic bytes")
        if header[2] != _SNP_MAJOR:
            raise ValueError(f"{prefix}.bed: only SNP-major layout supported")
        raw = np.frombuffer(f.read(), np.uint8)
    bpm = (N + 3) // 4  # bytes per marker
    if raw.size != M * bpm:
        raise ValueError(
            f"{prefix}.bed: expected {M * bpm} genotype bytes, got {raw.size}")
    raw = raw.reshape(M, bpm)
    # unpack 2-bit codes, little-endian within each byte
    codes = np.empty((M, bpm * 4), np.uint8)
    for shift in range(4):
        codes[:, shift::4] = (raw >> (2 * shift)) & 0b11
    codes = codes[:, :N]
    X = _DOSAGE[codes]  # (M, N) float32 with NaN for missing

    means = np.nanmean(X, axis=1)
    if impute_missing:
        nan_mask = np.isnan(X)
        X[nan_mask] = np.take(means, np.nonzero(nan_mask)[0])
    sds = np.nanstd(X, axis=1, ddof=1)
    if standardize:
        safe = np.where(sds > 0, sds, 1.0)
        X = (X - means[:, None]) / safe[:, None]
    return BedData(np.ascontiguousarray(X.T, dtype), np.asarray(bim),
                   np.asarray(fam), means, sds)


def write_bed(prefix: str, X_dosage: np.ndarray, snp_ids=None, sample_ids=None):
    """Write integer dosages (N, M) in {0,1,2, nan} to .bed/.bim/.fam
    (testing / export utility)."""
    N, M = X_dosage.shape
    snp_ids = snp_ids if snp_ids is not None else [f"snp{i}" for i in range(M)]
    sample_ids = (sample_ids if sample_ids is not None
                  else [f"iid{i}" for i in range(N)])
    inv = {2.0: 0b00, 1.0: 0b10, 0.0: 0b11}
    bpm = (N + 3) // 4
    out = np.zeros((M, bpm), np.uint8)
    for j in range(M):
        for i in range(N):
            v = X_dosage[i, j]
            code = 0b01 if np.isnan(v) else inv[float(v)]
            out[j, i // 4] |= code << (2 * (i % 4))
    with open(prefix + ".bed", "wb") as f:
        f.write(_MAGIC + bytes([_SNP_MAJOR]))
        f.write(out.tobytes())
    with open(prefix + ".bim", "w") as f:
        for s in snp_ids:
            f.write(f"1\t{s}\t0\t0\tA\tC\n")
    with open(prefix + ".fam", "w") as f:
        for s in sample_ids:
            f.write(f"{s}\t{s}\t0\t0\t0\t-9\n")


def read_phenotype(path: str, column: int = -1) -> np.ndarray:
    """Read a phenotype vector from a whitespace-delimited file (.fam-style:
    last column, or a single-column file)."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if parts:
                rows.append(float(parts[column]))
    return np.asarray(rows)


def _read_tsv_col(path: str, col: int):
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if parts:
                out.append(parts[col])
    return out
