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


def packing_fraction_box(state, shapes):
    """Solid fraction of a settled bed in a box (config 2, BASELINE.json:8).

    Bed volume = box footprint x bed height. For a (near-)uniform bed on
    the floor, the volume-weighted mean particle height satisfies
    z_mean = h/2, so h = 2 * z_mean — an estimator that is exact for a
    uniform slab and robust to a few stray bouncers (unlike max/quantile
    of particle tops).
    """
    vols = particle_volumes(state, shapes)
    z_rel = jnp.where(state.active, state.x[:, 2] - state.box_lo[2], 0.0)
    z_mean = jnp.sum(vols * z_rel) / jnp.maximum(jnp.sum(vols), 1e-30)
    bed_h = jnp.maximum(2.0 * z_mean, 1e-9)
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
