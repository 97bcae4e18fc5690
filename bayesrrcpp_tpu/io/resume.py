"""Resume a chain from a sample CSV's last row.

The reference's resume workflow is exactly this: the user extracts the
final CSV row of a previous run and passes mu/beta/sigmaE/sigmaGG/epsilon/
components back to BRV2Grstart (reference: src/BRv2Grstart.cpp:55-77,
vignette workflow).  This module automates the "CSV archaeology": it parses
any of the four reference schemas (written by io.sink.CSVSink, SURVEY.md
section 3.5) and returns the state fields for ``SpikeSlabSampler.init_from``.

Prefer framework checkpoints (io/checkpoint.py) for exact resume -- a CSV
row has no PRNG key and (if written with emit_epsilon=False) no residuals;
``epsilon`` is reconstructed from (X, Y) in that case.
"""
from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

_VEC = re.compile(r"^([a-zA-Z]+)\[(\d+)\]$")


def parse_last_row(path: str) -> Dict[str, np.ndarray]:
    """Parse the header + last data row of a sample CSV into named arrays.

    Vector fields (``beta[1..M]``, ``comp``, ``sigmaG``, ``epsilon``,
    ``alpha``, ``lambda``) come back as 1-D arrays in index order; scalar
    fields (``iteration``, ``mu``, ``sigmaE``, ``sigmaF``, ``tau``) as 0-D.
    """
    with open(path, "rb") as f:
        header = f.readline().decode().strip()
        # stream to the last non-empty line without loading the whole file
        last = b""
        for line in f:
            if line.strip():
                last = line
    if not last:
        raise ValueError(f"{path}: no sample rows to resume from")
    names = [c.strip() for c in header.split(",") if c.strip()]
    values = [float(v) for v in last.decode().strip().split(",")]
    if len(values) != len(names):
        raise ValueError(f"{path}: row has {len(values)} fields, header "
                         f"names {len(names)} columns")
    scalars: Dict[str, float] = {}
    vectors: Dict[str, Dict[int, float]] = {}
    for name, v in zip(names, values):
        m = _VEC.match(name)
        if m:
            vectors.setdefault(m.group(1), {})[int(m.group(2))] = v
        else:
            scalars[name] = v
    out: Dict[str, np.ndarray] = {k: np.asarray(v) for k, v in scalars.items()}
    for k, d in vectors.items():
        arr = np.empty(max(d) if d else 0)
        for i, v in d.items():
            arr[i - 1] = v  # reference headers are 1-indexed
        out[k] = arr
    return out


def state_kwargs_from_csv(path: str, *, X=None, Y=None,
                          fixed=None) -> Dict[str, np.ndarray]:
    """Turn a CSV last row into ``SpikeSlabSampler.init_from`` kwargs.

    If the CSV was written without residuals (emit_epsilon=False), epsilon
    is reconstructed as ``Y - mu - X beta [- fixed alpha]`` from the
    provided standardized X and Y.
    """
    row = parse_last_row(path)
    if "comp" not in row or "beta" not in row:
        raise ValueError(f"{path}: not a mixture-sampler CSV (no comp/beta "
                         "columns); horseshoe chains resume via checkpoints")
    sigmaGG = row.get("sigmaG", np.asarray([np.nan]))
    kwargs = dict(
        mu=row["mu"],
        beta=row["beta"],
        sigmaE=row["sigmaE"],
        sigmaGG=np.atleast_1d(sigmaGG),
        components=row["comp"].astype(np.int32),
    )
    if "alpha" in row and row["alpha"].size:
        kwargs["alpha"] = row["alpha"]
    if "sigmaF" in row:
        kwargs["sigmaF"] = row["sigmaF"]
    eps: Optional[np.ndarray] = row.get("epsilon")
    if eps is None or eps.size == 0:
        if X is None or Y is None:
            raise ValueError(
                f"{path} has no epsilon columns; pass X and Y so the "
                "residuals can be reconstructed")
        eps = (np.asarray(Y, np.float64)
               - float(kwargs["mu"])
               - np.asarray(X, np.float64) @ kwargs["beta"])
        if "alpha" in kwargs and fixed is not None:
            eps = eps - np.asarray(fixed, np.float64) @ kwargs["alpha"]
    kwargs["epsilon"] = eps
    return kwargs
