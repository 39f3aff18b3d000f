"""Single-collision energy-error probe: geometric force law vs exact
autodiff gradient of the sampled overlap energy.

The Lmax=8 NVE drift measurement (scripts/drift_lmax8.py) shows a
secular energy LOSS of ~3%/1M steps that is weakly dependent on
quadrature order and dt — the signature of a non-conservative force
construction (force direction / application point / depth are each
geometrically constructed rather than derived from one potential).

This probe runs ONE deterministic head-on collision of two Lmax=8
blobs (undamped, frictionless) and compares the energy error across
the bounce for:
  geometric: the production pair law (contact.pair_contact_rows)
  autodiff:  F = -dU/dx, tau = -dU/dtheta via jax.grad of the SAME
             sampled elastic PE (conservative by construction up to
             integrator error)

Usage: python scripts/conservative_probe.py [n_steps] [dt]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from spherharm_tpu.core.state import SimParams
from spherharm_tpu.models import scenarios, shapes_library
from spherharm_tpu.ops import contact, integrate
from spherharm_tpu.ops.rotation import quat_multiply


def build(dt, kn=1e5, lmax=8, v0=0.5):
    coeffs = [
        shapes_library.blob_coeffs(lmax, seed=s, mean_radius=0.5,
                                   roughness=0.12)
        for s in (3, 5)
    ]
    shapes = shapes_library.build_shapes(coeffs, lmax,
                                         contact_quad=(10, 20))
    params = SimParams.create(
        dt=dt, kn=kn, gamma_n=0.0, mu=0.0,
        skin=0.2, cutoff=1.4,
    )
    rng = np.random.default_rng(2)
    q = rng.normal(size=(2, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    state = scenarios.make_state(
        [[-0.75, 0.02, -0.03], [0.75, 0.0, 0.0]],
        [-4, -4, -4], [4, 4, 4], q=q,
        v=[[v0, 0.0, 0.0], [-v0, 0.0, 0.0]],
        shtype=[0, 1],
    )
    return shapes, params, state


def make_force_fns(shapes, params):
    box_lo = jnp.asarray([-4.0, -4.0, -4.0])
    box_hi = jnp.asarray([4.0, 4.0, 4.0])

    def pack_row(x, q):
        row = jnp.zeros((contact.ROW_W,))
        row = row.at[contact._RX].set(x)
        row = row.at[contact._RQ].set(q)
        return row

    def pe_of(xi, xj, qi, qj, ri_meta, rj_meta):
        """Elastic PE of the sampled overlap (velocity-free rows)."""
        rows_i = (pack_row(xi, qi) + ri_meta)[None, :]
        rows_j = (pack_row(xj, qj) + rj_meta)[None, :]
        out = contact.pair_contact_rows(
            rows_i, rows_j,
            jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32),
            jnp.zeros((1, 6)), jnp.asarray([True]),
            box_lo, box_hi, shapes, params,
            exact=True, periodic=(False, False, False),
        )
        return out[4].sum()   # pe

    grad_pe = jax.jit(jax.grad(pe_of, argnums=(0, 1, 2, 3)))

    def meta_row(state, i):
        """The static row slots (mass, radii, scale, active)."""
        rows = contact.particle_rows(state, shapes)
        row = rows[i]
        row = row.at[contact._RX].set(0.0)
        row = row.at[contact._RQ].set(0.0)
        row = row.at[contact._RV].set(0.0)
        row = row.at[contact._ROM].set(0.0)
        return row

    def tau_from_qgrad(q, gq):
        """tau_k = -0.5 * <dU/dq, e_k x q> (world-frame rotation)."""
        taus = []
        for k in range(3):
            e = jnp.zeros((4,)).at[k + 1].set(1.0)
            taus.append(-0.5 * jnp.dot(gq, quat_multiply(e, q)))
        return jnp.stack(taus)

    def forces_auto(state, meta_i, meta_j):
        gxi, gxj, gqi, gqj = grad_pe(
            state.x[0], state.x[1], state.q[0], state.q[1],
            meta_i, meta_j,
        )
        f = jnp.stack([-gxi, -gxj])
        tau = jnp.stack([
            tau_from_qgrad(state.q[0], gqi),
            tau_from_qgrad(state.q[1], gqj),
        ])
        # Dead branches NaN the grad OUT of contact, where the true
        # force is exactly zero — mask rather than re-derive every
        # guard for this experiment (the production implementation
        # would double-where inside).
        f = jnp.where(jnp.isfinite(f), f, 0.0)
        tau = jnp.where(jnp.isfinite(tau), tau, 0.0)
        return f, tau

    def forces_geom(state):
        rows = contact.particle_rows(state, shapes)
        out = contact.pair_contact_rows(
            rows[0:1], rows[1:2],
            jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32),
            jnp.zeros((1, 6)), jnp.asarray([True]),
            box_lo, box_hi, shapes, params,
            exact=True, periodic=(False, False, False),
        )
        force, tq_i, tq_j = out[0][0], out[1][0], out[2][0]
        f = jnp.stack([force, -force])
        tau = jnp.stack([tq_i, tq_j])
        return f, tau

    return forces_auto, forces_geom, pe_of, meta_row


def run(mode: str, n_steps: int, dt: float):
    shapes, params, state = build(dt)
    forces_auto, forces_geom, pe_of, meta_row = make_force_fns(
        shapes, params
    )
    meta_i = meta_row(state, 0)
    meta_j = meta_row(state, 1)

    @jax.jit
    def step(state):
        state = integrate.initial_integrate(state, shapes, params)
        if mode == "auto":
            f, tau = forces_auto(state, meta_i, meta_j)
        else:
            f, tau = forces_geom(state)
        pad = jnp.zeros((state.cap - 2, 3))
        state = state.replace(
            f=jnp.concatenate([f, pad]), tau=jnp.concatenate([tau, pad])
        )
        return integrate.final_integrate(state, shapes, params)

    def energy(state):
        ke_t, ke_r = integrate.kinetic_energy(state, shapes)
        pe = pe_of(state.x[0], state.x[1], state.q[0], state.q[1],
                   meta_i, meta_j)
        return float(ke_t + ke_r + pe), float(pe)

    e0, _ = energy(state)
    min_gap = 1e9
    for i in range(n_steps):
        state = step(state)
        if i % 50 == 0:
            gap = float(jnp.linalg.norm(state.x[1] - state.x[0]))
            min_gap = min(min_gap, gap)
    e1, pe1 = energy(state)
    gap = float(jnp.linalg.norm(state.x[1] - state.x[0]))
    print(f"{mode:5s}: e0 {e0:.8g} -> e1 {e1:.8g}  "
          f"dE/E {(e1 - e0) / e0:+.3e}  (min gap {min_gap:.3f}, "
          f"final gap {gap:.3f}, pe1 {pe1:.2e})", flush=True)
    return (e1 - e0) / e0


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    dt = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
    err_g = run("geom", n_steps, dt)
    err_a = run("auto", n_steps, dt)
    print(f"# improvement factor: {abs(err_g) / max(abs(err_a), 1e-15):.1f}x")


if __name__ == "__main__":
    main()
