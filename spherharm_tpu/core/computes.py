"""Diagnostic computes: the reference's Compute styles re-done functionally.

SURVEY.md section 2 B.5: "per-step diagnostics: KE, rotational KE,
stress/pressure tensor, packing fraction via per-atom volume". KE and
stress live in Simulation.thermo; here are the scenario-level observables
used by the acceptance configs (packing fraction for config 2, bed/flow
statistics for config 4).
"""

from __future__ import annotations

import jax.numpy as jnp

from spherharm_tpu.ops.rotation import omega_from_angmom


def particle_volumes(state, shapes):
    return jnp.where(
        state.active, shapes.vol[state.shtype] * state.scale**3, 0.0
    )


def packing_fraction_box(state, shapes, z_quantile: float = 0.95):
    """Solid fraction of a settled bed in a box (config 2, BASELINE.json:8).

    Bed volume = box footprint x bed height, with the height estimated as
    the z_quantile of particle top heights (robust to single bouncers).
    """
    vols = particle_volumes(state, shapes)
    rmax_i = shapes.rmax[state.shtype] * state.scale
    tops = jnp.where(state.active, state.x[:, 2] + rmax_i, 0.0)
    n = jnp.maximum(jnp.sum(state.active), 1)
    # quantile over active slots: sort with inactive pushed to the bottom.
    tops_sorted = jnp.sort(tops)
    cap = tops.shape[0]
    rank = jnp.clip(
        cap - n + (z_quantile * n).astype(jnp.int32), 0, cap - 1
    )
    bed_h = tops_sorted[rank] - 0.0  # box floor at z = box_lo[2]
    bed_h = jnp.maximum(bed_h - state.box_lo[2], 1e-9)
    footprint = (state.box_hi[0] - state.box_lo[0]) * (
        state.box_hi[1] - state.box_lo[1]
    )
    return jnp.sum(vols) / (footprint * bed_h)


def mean_kinetic_energy(state, shapes):
    """Per-particle translational KE (settling convergence monitor)."""
    m = shapes.mass_of(state.shtype, state.scale)
    ke = jnp.where(
        state.active, 0.5 * m * jnp.sum(state.v**2, axis=-1), 0.0
    )
    return jnp.sum(ke) / jnp.maximum(jnp.sum(state.active), 1)


def angular_speed(state, shapes):
    """|omega| per particle (rotation-fidelity diagnostics, config 3)."""
    inertia = shapes.inertia_of(state.shtype, state.scale)
    om = omega_from_angmom(state.q, state.angmom, inertia)
    return jnp.where(state.active, jnp.linalg.norm(om, axis=-1), 0.0)
