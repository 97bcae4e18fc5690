"""Shared chain driver: burn-in / thinned-emission scheduling.

One implementation of the reference's emission predicate
(``iteration >= burn_in and iteration % thinning == 0``,
reference: src/BayesRv2.cpp:257-272) used by every sampler class.  The host
streams finished emission chunks to the sink while the device computes the
next chunk (JAX async dispatch provides the overlap the reference built from
OpenMP threads + a lock-free queue, src/BayesRv2.cpp:102-108).
"""
from __future__ import annotations

import jax
import numpy as np


def run_chain(state, chain, *, steps_fn, emit_fn, postprocess=None,
              sink=None, collect=True, emit_chunk=32, start_iteration=0,
              progress=None, on_chunk=None, refresh_fn=None):
    """Drive a full chain.

    steps_fn(state, n)           -- advance n iterations (n static).
    emit_fn(state, n, thinning)  -- n emissions of `thinning` steps each;
                                    returns (state, rows dict).
    postprocess(rows)            -- optional host-side row fix-up (slicing
                                    padding, un-permuting), applied after
                                    device_get.
    progress(done, total)        -- optional callback per delivered chunk.
    on_chunk(state, done)        -- optional callback per delivered chunk
                                    with the CURRENT device state (periodic
                                    checkpointing; the reference has no
                                    mid-chain recovery at all, SURVEY.md
                                    section 5).
    refresh_fn(state)            -- optional exact-residual recompute,
                                    applied every chain.eps_refresh_every
                                    iterations at the nearest chunk
                                    boundary (f32 drift bound; the f64
                                    reference needs no analog).
    """
    emits = list(chain.emit_iterations())
    collected = [] if collect else None
    total = len(emits)

    every = getattr(chain, "eps_refresh_every", None)
    last_refresh = [start_iteration]

    def maybe_refresh(state, it_now):
        if refresh_fn is None or not every:
            return state
        if it_now - last_refresh[0] >= every:
            last_refresh[0] = it_now
            return refresh_fn(state)
        return state

    def deliver(rows, done, state):
        if collected is not None or sink is not None:
            rows = jax.tree.map(np.asarray, rows)   # device -> host
            if postprocess is not None:
                rows = postprocess(rows)
        if collected is not None:
            collected.append(rows)
        if sink is not None:
            sink.write(rows)
        if progress is not None:
            progress(done, total)
        if on_chunk is not None:
            on_chunk(state, done)

    if not emits:
        state = steps_fn(state, chain.max_iterations - start_iteration)
    else:
        pre = emits[0] + 1 - start_iteration
        if pre > 0:
            state = steps_fn(state, pre)
        state = maybe_refresh(state, emits[0] + 1)
        state, first = emit_fn(state, 1, 0)
        # one chunk stays IN FLIGHT: the next chunk is dispatched (async)
        # before the previous one's rows are fetched/written, so the
        # device computes chunk k+1 while the host transfers, formats and
        # writes chunk k (the overlap the reference built from OpenMP
        # threads + a lock-free queue, src/BayesRv2.cpp:102-108)
        # (pending rows are delivered with the NEWEST state -- the state
        # captured at chunk time is donated by the next dispatch, and
        # on_chunk checkpoints want the latest state anyway)
        pending = (first, 1)
        done = 1
        while done - 1 < total - 1:
            state = maybe_refresh(state, emits[done - 1] + 1)
            n = min(emit_chunk, total - done)
            state, rows = emit_fn(state, n, chain.thinning)
            done += n
            deliver(pending[0], pending[1], state)
            pending = (rows, done)
        deliver(pending[0], pending[1], state)
        tail = chain.max_iterations - (emits[-1] + 1)
        if tail > 0:
            state = steps_fn(state, tail)
    if sink is not None:
        sink.flush()
    out = None
    if collect:
        out = ({k: np.concatenate([c[k] for c in collected], axis=0)
                for k in collected[0]} if collected else {})
    return state, out
