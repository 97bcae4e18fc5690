"""Checkpoint / resume of full sampler state pytrees.

The reference's only resume mechanism is BRV2Grstart: the user fishes the
last CSV row out of a previous run and passes mu/beta/sigmaE/sigmaGG/epsilon/
components back as arguments, losing the RNG state entirely
(reference: src/BRv2Grstart.cpp:55-77; SURVEY.md section 5).  Here a
checkpoint is the complete state pytree *including the jax.random key*, so a
resumed chain is bitwise identical to an uninterrupted one
(tests/test_bayesr.py::test_checkpoint_resume_bitwise).

Format: a single ``.npz`` with one array per state field plus a tiny JSON
manifest recording the state class, so checkpoints are portable, inspectable
with plain NumPy, and independent of any framework version pinning.
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from ..models.state import HorseshoeState, SpikeSlabState

_STATE_TYPES = {
    "SpikeSlabState": SpikeSlabState,
    "HorseshoeState": HorseshoeState,
}


def _is_typed_key(x) -> bool:
    try:
        return jnp.issubdtype(x.dtype, jax.dtypes.prng_key)
    except Exception:
        return False


def save_checkpoint(path: str, state) -> None:
    """Write the full sampler state (incl. PRNG key) to ``path`` (.npz)."""
    cls = type(state).__name__
    if cls not in _STATE_TYPES:
        raise TypeError(f"unknown state type {cls}")
    typed_key = _is_typed_key(state.key)
    arrays = {}
    for f in state._fields:
        v = getattr(state, f)
        if f == "key" and typed_key:
            arrays[f] = np.asarray(jax.random.key_data(v))
        else:
            arrays[f] = np.asarray(v)
    arrays["__manifest__"] = np.frombuffer(
        json.dumps({"state_class": cls, "fields": list(state._fields),
                    "typed_key": typed_key, "format_version": 1}).encode(),
        dtype=np.uint8)
    np.savez(path, **arrays)


def load_checkpoint(path: str):
    """Load a checkpoint written by :func:`save_checkpoint`.

    Returns the reconstructed state pytree (on the default device).  The PRNG
    key is restored exactly, so stepping the returned state reproduces the
    original chain bit-for-bit.
    """
    with np.load(path) as z:
        manifest = json.loads(bytes(z["__manifest__"].tobytes()).decode())
        cls = _STATE_TYPES[manifest["state_class"]]
        values = []
        for f in manifest["fields"]:
            arr = z[f]
            if f == "key" and manifest.get("typed_key"):
                values.append(jax.random.wrap_key_data(jnp.asarray(arr)))
            else:
                values.append(jnp.asarray(arr))
    return cls(*values)
