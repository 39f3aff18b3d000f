"""Diagnostic computes: the reference's Compute styles re-done functionally.

SURVEY.md section 2 B.5: "per-step diagnostics: KE, rotational KE,
stress/pressure tensor, packing fraction via per-atom volume". KE and
stress live in Simulation.thermo; here are the scenario-level observables
used by the acceptance configs (packing fraction for config 2, bed/flow
statistics for config 4).
"""

from __future__ import annotations

import jax
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


def per_atom_ke(state, shapes):
    """Translational KE per particle (LAMMPS compute ke/atom)."""
    m = shapes.mass_of(state.shtype, state.scale)
    return jnp.where(
        state.active, 0.5 * m * jnp.sum(state.v**2, axis=-1), 0.0
    )


def per_atom_stress(sim, state, neigh):
    """Per-atom virial stress tensor [cap, 3, 3] (compute stress/atom).

    LAMMPS convention (stress * volume; negative of the pressure-like
    tensor, so -sum_i trace(S_i) / 3V is the pressure and
    sum_i S_i == -(thermo "stress" * V)):
    S_i = -(m_i v_i (x) v_i) - 1/2 sum_pairs (r1 (x) F1 + r2 (x) F2)
        = -(m_i v_i (x) v_i) + 1/2 sum_pairs d (x) f_i,
    each pair contributing half to each member. Re-evaluates the narrow
    phase over the stable pair list at diagnostic cadence — per-atom
    tallies deliberately stay OFF the hot path (SURVEY.md 2 B.5; the
    reference also pays for Compute styles only when invoked).
    """
    from spherharm_tpu.ops import contact

    N = state.cap
    rows = contact.particle_rows(state, sim.shapes)
    pi, pj = neigh.pair_i, neigh.pair_j
    ri, rj = rows[pi], rows[pj]
    msk = (
        neigh.pair_valid
        & (ri[:, contact._RACT] > 0.5)
        & (rj[:, contact._RACT] > 0.5)
    )
    tilt = state.tilt if sim.triclinic else None
    force, _, _, _, _, _, d = contact.pair_contact_rows(
        ri, rj, state.shtype[pi], state.shtype[pj],
        neigh.pair_hist, msk,
        state.box_lo, state.box_hi, sim.shapes, sim.params,
        exact=sim.exact_eval, periodic=sim.periodic, tilt=tilt,
    )
    w_pair = 0.5 * d[:, :, None] * force[:, None, :]  # [P, 3, 3]
    s = jax.ops.segment_sum(w_pair, pi, num_segments=N,
                            indices_are_sorted=True)
    w_j = (msk & neigh.pair_both).astype(force.dtype)[:, None, None]
    perm = neigh.pair_jsort
    # The reaction pair (-d, -f) has the same outer product.
    s = s + jax.ops.segment_sum(
        (w_pair * w_j)[perm], pj[perm], num_segments=N,
        indices_are_sorted=True,
    )
    m = sim.shapes.mass_of(state.shtype, state.scale)
    kin = -m[:, None, None] * state.v[:, :, None] * state.v[:, None, :]
    s = s + jnp.where(state.active[:, None, None], kin, 0.0)
    return jnp.where(state.active[:, None, None], s, 0.0)


def coordination(sim, state, neigh):
    """Bounding-sphere coordination number per atom (compute coord/atom):
    neighbors with center distance < rb_i + rb_j (the touching-possible
    criterion; LAMMPS coord/atom with its cutoff).

    Counts over the FULL [N, K] Verlet tensor, not the stable pair
    list — the rebuild-cadence prefilter culls surface-separated pairs
    from the latter, which would silently undercount aspherical
    coordination (the Verlet list keeps every bounding-sphere
    candidate)."""
    from spherharm_tpu.ops import contact

    idx, mask = neigh.idx[: state.cap], neigh.mask[: state.cap]
    rb = sim.shapes.rmax[state.shtype] * state.scale
    tilt = state.tilt if sim.triclinic else None
    d = contact.minimum_image(
        state.x[idx] - state.x[:, None, :],
        state.box_lo, state.box_hi, sim.periodic, tilt,
    )
    dist2 = jnp.sum(d * d, axis=-1)
    rsum = rb[:, None] + rb[idx]
    hit = mask & (dist2 < rsum * rsum)
    return jnp.where(state.active, jnp.sum(hit.astype(jnp.int32), axis=1),
                     0)


def contacts_per_atom(sim, state, neigh):
    """True contact count per atom (compute contact/atom): re-runs the
    narrow phase over the stable pair list at diagnostic cadence, like
    stress/atom."""
    from spherharm_tpu.ops import contact

    N = state.cap
    rows = contact.particle_rows(state, sim.shapes)
    pi, pj = neigh.pair_i, neigh.pair_j
    ri, rj = rows[pi], rows[pj]
    msk = (
        neigh.pair_valid
        & (ri[:, contact._RACT] > 0.5)
        & (rj[:, contact._RACT] > 0.5)
    )
    tilt = state.tilt if sim.triclinic else None
    _, _, _, _, _, inc, _ = contact.pair_contact_rows(
        ri, rj, state.shtype[pi], state.shtype[pj],
        neigh.pair_hist, msk,
        state.box_lo, state.box_hi, sim.shapes, sim.params,
        exact=sim.exact_eval, periodic=sim.periodic, tilt=tilt,
    )
    w = inc.astype(jnp.int32)
    c = jax.ops.segment_sum(w, pi, num_segments=N,
                            indices_are_sorted=True)
    wj = (inc & neigh.pair_both).astype(jnp.int32)
    perm = neigh.pair_jsort
    c = c + jax.ops.segment_sum(wj[perm], pj[perm], num_segments=N,
                                indices_are_sorted=True)
    return jnp.where(state.active, c, 0)


def temperature(state, shapes):
    """Granular temperature: mean translational KE per dof (compute temp)."""
    n = jnp.maximum(jnp.sum(state.active), 1)
    m = shapes.mass_of(state.shtype, state.scale)
    ke = jnp.sum(jnp.where(
        state.active, 0.5 * m * jnp.sum(state.v**2, axis=-1), 0.0
    ))
    return 2.0 * ke / (3.0 * n)


# -- compute registry (the reference's Modify/Compute lookup) -------------
#
# Scalar computes: fn(sim, state, neigh) -> scalar.
# Per-atom computes: fn(sim, state, neigh) -> [cap, ...].
SCALAR_COMPUTES = {
    "temp": lambda sim, st, ng: temperature(st, sim.shapes),
    "ke": lambda sim, st, ng: mean_kinetic_energy(st, sim.shapes)
    * jnp.maximum(jnp.sum(st.active), 1),
    "pressure": lambda sim, st, ng: -jnp.trace(
        jnp.sum(per_atom_stress(sim, st, ng), axis=0)
    ) / (3.0 * jnp.prod(st.box_hi - st.box_lo)),
    "packing": lambda sim, st, ng: packing_fraction_box(st, sim.shapes),
}
PERATOM_COMPUTES = {
    "ke/atom": lambda sim, st, ng: per_atom_ke(st, sim.shapes),
    "stress/atom": per_atom_stress,
    "omega/atom": lambda sim, st, ng: angular_speed(st, sim.shapes),
    "coord/atom": coordination,
    "contact/atom": contacts_per_atom,
}


def compute(style: str, sim, state, neigh):
    """Evaluate a registered compute style by name."""
    if style in SCALAR_COMPUTES:
        return SCALAR_COMPUTES[style](sim, state, neigh)
    if style in PERATOM_COMPUTES:
        return PERATOM_COMPUTES[style](sim, state, neigh)
    raise KeyError(
        f"unknown compute style {style!r}; "
        f"known: {sorted(SCALAR_COMPUTES) + sorted(PERATOM_COMPUTES)}"
    )
