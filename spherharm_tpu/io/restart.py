"""Binary checkpoint / restart of the full simulation state.

Equivalent of the reference's WriteRestart/ReadRestart (SURVEY.md
section 3.4 / 5.4): the whole State pytree IS the checkpoint, and —
the subtle part the survey flags — per-pair contact history
(tangential springs + their tag keys) rides along, so friction forces
are bit-identical after resume.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from spherharm_tpu.core.state import NeighborState, SimParams, State


import dataclasses


def _fields(cls):
    return tuple(f.name for f in dataclasses.fields(cls))


_STATE_FIELDS = _fields(State)
_NEIGH_FIELDS = _fields(NeighborState)
_PARAM_FIELDS = _fields(SimParams)


def write_restart(path, state: State, neigh: NeighborState,
                  params: SimParams, extra: dict | None = None):
    """Serialize (state, neighbors+history, params) to one .npz file.

    ``neigh=None`` writes a state-only checkpoint (the sharded
    gather_restart flow carries its tag-keyed history via ``extra``).
    """
    blob = {}
    for f in _STATE_FIELDS:
        blob[f"state.{f}"] = np.asarray(getattr(state, f))
    for f in _NEIGH_FIELDS if neigh is not None else ():
        blob[f"neigh.{f}"] = np.asarray(getattr(neigh, f))
    for f in _PARAM_FIELDS:
        blob[f"params.{f}"] = np.asarray(getattr(params, f))
    for k, v in (extra or {}).items():
        blob[f"extra.{k}"] = np.asarray(v)
    np.savez_compressed(path, **blob)


def read_restart(path):
    """Load (state, neigh, params, extra) back as device pytrees."""
    import os

    # np.savez appends ".npz" when missing; accept the bare name too.
    if not os.path.exists(path) and os.path.exists(f"{path}.npz"):
        path = f"{path}.npz"
    z = np.load(path)
    state = State(**{f: jnp.asarray(z[f"state.{f}"]) for f in _STATE_FIELDS})
    neigh = None
    if f"neigh.{_NEIGH_FIELDS[0]}" in z.files:
        nvals = {f: jnp.asarray(z[f"neigh.{f}"]) for f in _NEIGH_FIELDS
                 if f"neigh.{f}" in z.files}
        # Fields added after a file was written get structural defaults
        # (restart written before the prefilter: identity orientation
        # reference, zero budgets — the first rebuild refreshes both).
        cap = nvals["x_build"].shape[0]
        dt = nvals["x_build"].dtype
        if "q_build" not in nvals:
            nvals["q_build"] = jnp.zeros((cap, 4), dt).at[:, 0].set(1.0)
        if "budget" not in nvals:
            nvals["budget"] = jnp.zeros((cap,), dt)
        neigh = NeighborState(**nvals)
    pvals = {f: jnp.asarray(z[f"params.{f}"]) for f in _PARAM_FIELDS
             if f"params.{f}" in z.files}
    if "pair_tab" not in pvals:
        # Restart written before per-type-pair tables existed: rebuild
        # the scalar-broadcast default.
        pvals["pair_tab"] = jnp.stack(
            [pvals["kn"], pvals["kt"], pvals["gamma_n"], pvals["gamma_t"],
             pvals["mu"], pvals["k_roll"], pvals["gamma_roll"],
             pvals["mu_roll"]]
        ).reshape(1, 1, 8)
    params = SimParams(**pvals)
    extra = {
        k[len("extra."):]: z[k] for k in z.files if k.startswith("extra.")
    }
    return state, neigh, params, extra
