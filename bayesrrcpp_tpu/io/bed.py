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


class PackedBed(NamedTuple):
    words: np.ndarray      # (M, Npad//16) int32, the sampler's 2-bit word
                           # layout (16 codes/word, code j at bits 2j);
                           # Npad = ceil(N/2048)*2048, pad lanes coded 0
                           # (no missing anywhere) or 3 (missing present)
    means: np.ndarray      # (M,) missing-aware dosage means
    sds: np.ndarray        # (M,) missing-aware ddof-1 dosage sds
    n: int                 # true individual count
    snp_ids: np.ndarray
    sample_ids: np.ndarray
    has_missing: bool


def read_bed_packed(prefix: str, *, n_threads: int = 0,
                    marker_range: Optional[tuple] = None,
                    mpad=None) -> PackedBed:
    """Read `{prefix}.bed/.bim/.fam` straight into the sampler's packed
    2-bit word layout — 0.25 bytes/genotype on the host, no dense X ever
    (the reference cannot do this at all: it needs a dense f64 R matrix,
    src/BayesRv2.cpp:60).  Feed the result to ``SpikeSlabSampler`` as::

        pb = read_bed_packed(prefix)
        s = SpikeSlabSampler(jnp.asarray(pb.words), Y, cva, cfg,
                             x_dtype="2bit", transposed=True,
                             x_stats=(pb.means, pb.sds),
                             n_individuals=pb.n)

    ``marker_range=(m0, m1)`` reads only markers [m0, m1) — .bed is
    SNP-major, so this is one contiguous byte-range read.  Multi-host runs
    use it so each host loads only its own marker slab
    (parallel.distributed.process_marker_range; the sharded samplers take
    the slab with ``x_process_shard=True``).

    ``mpad`` pads the MARKER axis on the host with all-missing rows
    before any device transfer: pass ``"auto"`` (the default sampler's
    padded count, ops.pallas_jacobi.planned_mpad) or an explicit count.
    A device-resident packed array cannot be padded later without a
    second near-HBM-sized buffer (input + output both live during the
    copy), so at biobank scale the pad MUST happen here.

    Uses the threaded C++ decoder (native/bedreader.cpp) when built,
    otherwise a vectorized NumPy byte-LUT fallback.
    """
    bim = _read_tsv_col(prefix + ".bim", 1)
    fam = _read_tsv_col(prefix + ".fam", 1)
    M_total, N = len(bim), len(fam)
    bpm = (N + 3) // 4
    m0, m1 = (0, M_total) if marker_range is None else marker_range
    if not (0 <= m0 <= m1 <= M_total):
        raise ValueError(f"marker_range {marker_range} outside [0, {M_total}]")
    M = m1 - m0
    with open(prefix + ".bed", "rb") as f:
        header = f.read(3)
        if header[:2] != _MAGIC:
            raise ValueError(f"{prefix}.bed: bad magic bytes")
        if header[2] != _SNP_MAJOR:
            raise ValueError(f"{prefix}.bed: only SNP-major layout supported")
        f.seek(0, os.SEEK_END)
        nbytes = f.tell() - 3
        if nbytes != M_total * bpm:
            raise ValueError(f"{prefix}.bed: expected {M_total * bpm} "
                             f"genotype bytes, got {nbytes}")
        f.seek(3 + m0 * bpm)
        raw = np.frombuffer(f.read(M * bpm), np.uint8)
    bim = bim[m0:m1]
    npad = -(-N // 2048) * 2048
    wpad = npad // 16

    from .native import get_native_bed

    dec = get_native_bed()
    if dec is not None:
        words, means, sds, _, total = dec.decode(raw, M, N, wpad, n_threads)
        has_missing = total > 0
    else:
        words, means, sds, has_missing = _decode_packed_numpy(
            raw.reshape(M, bpm), N, wpad)

    if has_missing:
        # the in-kernel decode zeroes MISSING_CODE lanes, so pad individuals
        # must carry code 3 when the non-fold kernel runs (the no-missing
        # fold kernel instead wants code 0 + the row_valid lane mask; see
        # ops/pallas_sweep.py::bayesr_sweep_pallas)
        by = words.view(np.uint8).reshape(M, wpad * 4)
        vb, rem = divmod(N, 4)
        if rem:
            keep = np.uint8((1 << (2 * rem)) - 1)
            by[:, vb] = (by[:, vb] & keep) | np.uint8(0xFF & ~keep)
            vb += 1
        if vb < by.shape[1]:
            by[:, vb:] = 0xFF
    if mpad is not None:
        if mpad == "auto":
            from ..ops.pallas_jacobi import planned_mpad
            mpad = planned_mpad(M)
        if mpad < M:
            raise ValueError(f"mpad={mpad} < {M} markers read")
        if mpad > M:
            # pad markers are all-missing words (-1): zero stats, masked
            # out by the samplers' valid vector
            words = np.concatenate(
                [words, np.full((mpad - M, wpad), -1, np.int32)], axis=0)
            means = np.concatenate([means, np.zeros(mpad - M)])
            sds = np.concatenate([sds, np.zeros(mpad - M)])
    return PackedBed(words, means, sds, N, np.asarray(bim), np.asarray(fam),
                     bool(has_missing))


# per-byte LUTs over PLINK codes (00->2, 01->missing, 10->1, 11->0)
def _byte_luts():
    plink = np.arange(256, dtype=np.uint16)
    codes = np.stack([(plink >> (2 * j)) & 3 for j in range(4)], 1)  # (256,4)
    dose = np.array([2, 4, 1, 0], np.uint16)[codes]  # 4 == missing sentinel
    miss = (dose == 4)
    d = np.where(miss, 0, dose)
    lut_map = np.zeros(256, np.uint8)
    for j in range(4):
        lut_map |= (np.where(miss[:, j], 3, dose[:, j]).astype(np.uint8)
                    << np.uint8(2 * j))
    return (lut_map, d.sum(1).astype(np.int64), (d * d).sum(1).astype(np.int64),
            miss.sum(1).astype(np.int64))


def _decode_packed_numpy(raw, N, wpad):
    """NumPy fallback of native/bedreader.cpp: byte-LUT remap + stats."""
    lut_map, lut_sum, lut_sq, lut_miss = _byte_luts()
    M, bpm = raw.shape
    vb, rem = divmod(N, 4)
    body = raw if rem == 0 else raw[:, :vb]
    s = lut_sum[body].sum(1)
    q = lut_sq[body].sum(1)
    mi = lut_miss[body].sum(1)
    out = np.zeros((M, wpad * 4), np.uint8)
    out[:, :bpm] = lut_map[raw]
    if rem:
        # PLINK pads the trailing byte's unused slots with 00 (dosage 2):
        # force them to missing for the stats, zero them in the words
        keep = np.uint8((1 << (2 * rem)) - 1)
        pad_missing = np.uint8(sum(1 << (2 * j) for j in range(rem, 4)))
        bb = (raw[:, vb] & keep) | pad_missing
        s += lut_sum[bb]
        q += lut_sq[bb]
        mi += lut_miss[bb] - (4 - rem)
        out[:, vb] = lut_map[raw[:, vb]] & keep
    cnt = N - mi
    safe = np.maximum(cnt, 1)
    means = s / safe
    var = np.where(cnt > 1, (q - cnt * means * means) / np.maximum(cnt - 1, 1),
                   0.0)
    sds = np.sqrt(np.maximum(var, 0.0))
    return (np.ascontiguousarray(out).view(np.int32).reshape(M, wpad),
            means, sds, bool(mi.sum() > 0))


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
